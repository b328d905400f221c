package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** Session extensions for the graft engine — the
  * `SparkSessionExtensions` registration point. Activate with either
  *   `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * on a builder, or `.withExtensions(new GraftExtensions)`.
  *
  * Currently injects the native [[CosineSimilarity]] expression as the
  * SQL function `cosine_similarity(array<float>, array<float>)`, so the
  * pure-SQL surface gets the same fused codegen loop as the Column API
  * (engine-complete: `spark.sql` and DataFrame are one engine).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
  }
}
