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

  /** A real PNG, generated with JDK-only imaging: `w`×`h` solid-color. */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("codec seam: ImageIoDecoder really decodes pixels through mediaFeatures") {
    // the same operator, a REAL codec: two solid-color PNGs whose mean
    // BT.601 luminance is known exactly (gray 100 -> 100.0; pure red
    // -> 0.299 * 255 = 76.245)
    val gray = pngBytes(3, 2, 0x646464) // r=g=b=100
    val red = pngBytes(2, 2, 0xFF0000)
    val docs = Seq((1L, gray), (2L, red)).toDF("doc_id", "payload")
    val r = Multimodal.extractFeatures(spark, docs,
        Multimodal.ImageIoDecoder)
      .toDF().orderBy("doc_id").collect()
    r(0).getAs[Double]("mean_byte") shouldBe 100.0
    r(1).getAs[Double]("mean_byte") shouldBe 76.245
    r(0).getAs[Int]("frame_count") shouldBe 1
    r(0).getAs[Long]("n_bytes") shouldBe gray.length.toLong
    r(0).getAs[String]("content_md5") shouldBe MessageDigest
      .getInstance("MD5").digest(gray).map(b => f"$b%02x").mkString
    // and the DEFAULT stub path over the same payloads still answers
    // with byte statistics — two decoders, one operator
    val stub = Multimodal.extractFeatures(spark, docs).toDF()
      .orderBy("doc_id").collect()
    stub(0).getAs[Long]("n_bytes") shouldBe gray.length.toLong
    stub(0).getAs[Double]("mean_byte") should not be 100.0
    // an undecodable payload fails loudly with the doc id, never a
    // silent feature row
    val bad = Seq((9L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val e = intercept[Exception] {
      Multimodal.extractFeatures(spark, bad,
        Multimodal.ImageIoDecoder).toDF().collect()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n") should include("doc 9")
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
