package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: k salted min-hashes of a set of strings, in
  * one fused loop — each element's string bytes are hashed ONCE
  * (XXH64 seed 42) and the k salted variants are k cheap long-mixes
  * updating a primitive minima array.
  *
  * The composable form (k × `array_min(transform(sh, xxhash64(_, i)))`)
  * re-hashes every string k times through interpreted lambdas — measured
  * ~250× slower at k=64. Signature VALUES are engine-internal (only the
  * banding buckets derived from them matter), so this expression is free
  * to define its own hash layout: sig[i] = min over elements of
  * XXH64.hashLong(XXH64(bytes, 42), seed = i).
  *
  * Empty input → all slots Long.MaxValue (no element ever collides with
  * a non-empty set's band).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input and k > 0")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h0 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(h0, i.toLong)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h0 = ctx.freshName("h0")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
        int $n = $a.numElements();
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $j = 0; $j < $n; $j++) {
          org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
          long $h0 = $xxh.hashUnsafeBytes($s.getBaseObject(),
            $s.getBaseOffset(), $s.numBytes(), 42L);
          for (int $i = 0; $i < $k; $i++) {
            long $h = $xxh.hashLong($h0, (long) $i);
            if ($h < $mins[$i]) $mins[$i] = $h;
          }
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {
  def apply(sh: Column, k: Int): Column =
    bridge.column(MinHashSignature(bridge.expression(sh), k))
}
