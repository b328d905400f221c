package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Native nearest-candidate search: the squared distance to — and index
  * of — the closest of a fixed set of candidate vectors, for an
  * array<float> embedding column, in one fused primitive loop nest.
  *
  * This is THE inner loop of every centroid-shaped operator (k-means
  * assignment, farthest-point and k-means|| seeding, IVF cell probing):
  * per row, |cands| × dim multiply-adds. The composable forms — a
  * per-candidate `struct(aggregate(zip_with(...)))` array or a 2-D
  * literal folded with `aggregate(sequence(...))` — evaluate interpreted
  * lambdas with a per-candidate array allocation per row; measured at
  * k=256 over the 20× stress corpus, the k-means|| weight pass spent
  * tens of minutes there. This expression compiles to two nested loops
  * over a plan-referenced double[][] (shipped once per task via the
  * codegen reference table, not as literal source), with the embedding
  * staged into a primitive array once per row.
  *
  * Arithmetic is IDENTICAL to the HOF forms in
  * graft.operators.Similarity — (x−y)² accumulated in ascending dim
  * order in doubles, strict `<` keeps the LOWEST candidate index on
  * exact ties — asserted bit-for-bit in SimilaritySpec, so plans built
  * either way (and the q95 oracle's SQL replay) agree exactly.
  *
  * Returns struct(d2: double, idx: int); null input row → null.
  */
case class NearestCandidate(child: Expression, cands: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cands.nonEmpty, "NearestCandidate requires at least one candidate")
  require(cands.forall(_.length == cands.head.length),
    "NearestCandidate: candidates must share one dimension, got " +
      cands.map(_.length).distinct.mkString(","))

  @transient private lazy val candArr: Array[Array[Double]] =
    cands.map(_.toArray).toArray

  private val candDim: Int = cands.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got " +
        child.dataType.catalogString)
  }
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("idx", IntegerType, nullable = false)))
  override def prettyName: String = "nearest_candidate"

  // a mismatched embedding would otherwise yield a plausible-but-wrong
  // prefix distance (silent misassignment — the failure the LSH family's
  // checkedDim guards against), and an all-NaN row would leave idx = -1
  // to crash a downstream array index: both fail loudly instead
  private def badRow(n: Int): Nothing = throw new IllegalArgumentException(
    s"nearest_candidate: embedding has $n components, candidates have " +
      s"$candDim — or the embedding contains NaN; refusing a silent " +
      "prefix/garbage assignment")

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    if (n != candDim) badRow(n)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = emb.getFloat(i).toDouble; i += 1 }
    var best = Double.MaxValue
    var bi = -1
    var j = 0
    while (j < candArr.length) {
      val cj = candArr(j)
      var s = 0.0
      var d = 0
      while (d < n) { val t = v(d) - cj(d); s += t * t; d += 1 }
      if (s < best) { best = s; bi = j }
      j += 1
    }
    if (bi < 0) badRow(n) // every distance NaN
    new GenericInternalRow(Array[Any](best, bi))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val c = ctx.addReferenceObj("cands", candArr, "double[][]")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val cj = ctx.freshName("cj")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      s"""
        int $n = $x.numElements();
        if ($n != $candDim) {
          throw new IllegalArgumentException(
            "nearest_candidate: embedding has " + $n +
            " components, candidates have " + $candDim +
            " - refusing a silent prefix assignment");
        }
        double[] $v = new double[$n];
        for (int $i = 0; $i < $n; $i++) {
          $v[$i] = (double) $x.getFloat($i);
        }
        double $best = Double.MAX_VALUE;
        int $bi = -1;
        for (int $j = 0; $j < $c.length; $j++) {
          double[] $cj = $c[$j];
          double $s = 0.0;
          for (int $d = 0; $d < $n; $d++) {
            double $t = $v[$d] - $cj[$d];
            $s += $t * $t;
          }
          if ($s < $best) { $best = $s; $bi = $j; }
        }
        if ($bi < 0) {
          throw new IllegalArgumentException(
            "nearest_candidate: every candidate distance is NaN " +
            "(embedding contains NaN)");
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            new Object[] {
              (Object) java.lang.Double.valueOf($best),
              (Object) java.lang.Integer.valueOf($bi) });
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCandidate = copy(child = newChild)
}

object NearestCandidate {
  /** Column-API entry point: struct(d2, idx) of the nearest of `cands`. */
  def apply(emb: Column, cands: Array[Array[Double]]): Column =
    bridge.column(NearestCandidate(bridge.expression(emb),
      cands.map(_.toSeq).toSeq))
}
