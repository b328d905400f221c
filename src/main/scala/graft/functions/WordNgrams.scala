package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a token array, space-joined, in one pass.
  *
  * The composable form (`array_distinct(transform(sequence(1, cnt),
  * i => array_join(slice(toks, i, n), ' ')))`) walks four interpreted
  * HOF layers and re-slices per position; this expression emits each
  * gram once via `UTF8String.concatWs` into an insertion-ordered set.
  * CodegenFallback is deliberate: the body is object-building (strings,
  * a hash set), which Java codegen cannot meaningfully improve.
  *
  * Fewer than n tokens → empty array (same as the guarded HOF form).
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and n > 0, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements() - (n - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < toks.length) { toks(i) = arr.getUTF8String(i); i += 1 }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, i, parts, 0, n)
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}

object WordNgrams {
  def apply(tokens: Column, n: Int): Column =
    bridge.column(WordNgrams(bridge.expression(tokens), n))
}
