package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash of a token set: each token's bytes hashed once
  * (XXH64 seed 42), per-bit ±1 sums accumulated in a primitive array,
  * bit i of the sketch set iff strictly more than half the tokens have
  * bit i set — one fused loop in whole-stage codegen, replacing 64
  * interpreted `filter` passes over the hash array.
  *
  * Empty input → 0L (same as the composable form).
  */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      var i = 0
      while (i < 64) { counts(i) += ((h >>> i) & 1L).toInt; i += 1 }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (2 * counts(i) > n) sig |= (1L << i); i += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val xxh = classOf[XXH64].getName
      s"""
        int $n = $a.numElements();
        int[] $counts = new int[64];
        for (int $j = 0; $j < $n; $j++) {
          org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
          long $h = $xxh.hashUnsafeBytes($s.getBaseObject(),
            $s.getBaseOffset(), $s.numBytes(), 42L);
          for (int $i = 0; $i < 64; $i++) {
            $counts[$i] += (int) (($h >>> $i) & 1L);
          }
        }
        long $sig = 0L;
        for (int $i = 0; $i < 64; $i++) {
          if (2 * $counts[$i] > $n) $sig |= (1L << $i);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashSignature = copy(child = newChild)
}

object SimHashSignature {
  def apply(tokens: Column): Column =
    bridge.column(SimHashSignature(bridge.expression(tokens)))
}
