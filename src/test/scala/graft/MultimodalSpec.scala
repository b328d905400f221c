package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private lazy val tiny = Seq(
    (1L, "hello world", "en", "s", 11L),
    (2L, "", "en", "s", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("attachBinary carries payload bytes + typed metadata") {
    val r = Multimodal.attachBinary(tiny).orderBy("doc_id").collect()(0)
    new String(r.getAs[Array[Byte]]("payload"), "UTF-8") shouldBe "hello world"
    val meta = r.getStruct(r.fieldIndex("media_meta"))
    meta.getAs[String]("mime") shouldBe "application/octet-stream"
    meta.getAs[Long]("n_bytes") shouldBe 11L
  }

  test("mediaFeatures md5 matches an independent JVM digest") {
    val expected = MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val r = Multimodal.mediaFeatures(spark, tiny).orderBy("doc_id").collect()
    r(0).getAs[String]("content_md5") shouldBe expected
    r(0).getAs[Long]("n_bytes") shouldBe 11L
    // empty payload handled without dividing by zero
    r(1).getAs[Double]("mean_byte") shouldBe 0.0
  }

  test("mediaFeatures introduces no shuffle of its own") {
    val df = Multimodal.mediaFeatures(spark, tables.documents)
    plan(df) should not include "Exchange"
    df.count() shouldBe tables.documents.count()
  }

  test("sampleFrames keeps every stride-th fixed-size frame") {
    val frames = Multimodal.sampleFrames(
      Multimodal.attachBinary(tiny.filter(col("doc_id") === 1)),
      frameBytes = 4, stride = 2).orderBy("frame_idx").collect()
    // "hello world" = 11 bytes -> frames 0..2; stride 2 keeps 0 and 2
    frames.map(_.getAs[Int]("frame_idx")).toSeq shouldBe Seq(0, 2)
    new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8") shouldBe "hell"
    new String(frames(1).getAs[Array[Byte]]("frame"), "UTF-8") shouldBe "rld"
  }
}
