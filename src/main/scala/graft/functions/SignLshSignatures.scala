package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native sign-LSH: all `tables` b-bit hyperplane signatures of an
  * array<float> embedding in one fused primitive loop.
  *
  * The composable form (per table × per bit:
  * `when(aggregate(zip_with(emb, plane, _ * _), 0.0, _ + _) > 0, 1L << p)`)
  * evaluates tables × bits interpreted lambdas per row, re-casting the
  * embedding each time — at 32 tables × 8 bits × 64 dims that is ~16k
  * interpreted element visits per row. This expression emits one
  * generated loop nest over (table, bit, dim) with the hyperplane
  * weights computed inline from the splitmix64 mix — no plane
  * materialization, no allocation beyond the output array.
  *
  * Bit p of table t is set iff the dot product of the embedding with
  * pseudo-random hyperplane t*bits+p is strictly positive; weights and
  * accumulation order are IDENTICAL to the HOF form in
  * graft.operators.Similarity (asserted in SimilaritySpec), so persisted
  * indexes built either way probe interchangeably.
  */
case class SignLshSignatures(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if bits > 0 && bits <= 63 && tables > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, 0 < bits <= 63, tables > 0")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_signatures"

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < bits) {
        val plane = t * bits + p
        var dot = 0.0
        var d = 0
        while (d < n) {
          dot += emb.getFloat(d).toDouble *
            SignLshSignatures.planeWeight(plane, d)
          d += 1
        }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val sig = ctx.freshName("sig")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      val cls = "graft.functions.SignLshSignatures"
      s"""
        int $n = $x.numElements();
        long[] $sigs = new long[$tables];
        for (int $t = 0; $t < $tables; $t++) {
          long $sig = 0L;
          for (int $p = 0; $p < $bits; $p++) {
            int $plane = $t * $bits + $p;
            double $dot = 0.0;
            for (int $d = 0; $d < $n; $d++) {
              $dot += ((double) $x.getFloat($d))
                * $cls.planeWeight($plane, $d);
            }
            if ($dot > 0) $sig |= (1L << $p);
          }
          $sigs[$t] = $sig;
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignLshSignatures = copy(child = newChild)
}

object SignLshSignatures {
  /** Deterministic pseudo-random hyperplane weight in (-1, 1) for
    * (plane, dim) — splitmix64 finalizer over the packed coordinates.
    * Public so both the interpreted path, the generated code, and the
    * HOF reference implementation share ONE definition.
    */
  def planeWeight(p: Int, d: Int): Double = {
    var z = (p.toLong << 32 | d.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Column-API entry point. */
  def apply(emb: Column, bits: Int, tables: Int): Column =
    bridge.column(SignLshSignatures(bridge.expression(emb), bits, tables))
}
