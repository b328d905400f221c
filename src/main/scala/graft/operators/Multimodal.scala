package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a decode / feature-extract
  * stage running as imperative per-partition JVM code (the seam where a
  * real codec — JPEG decode, audio resample, video frame-sample — plugs
  * in).
  *
  * The container has no media libraries, so the decode step is a
  * clearly-marked DETERMINISTIC FAKE (md5 + byte statistics standing in
  * for pixels); everything around it — schema, binary encoding,
  * partition-preserving mapPartitions, batch shape — is real and tested.
  * At scale this stage is embarrassingly parallel: no shuffle is
  * introduced, partitioning of the input is preserved.
  */
object Multimodal {

  /** Feature row produced by the fake decoder. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      content_md5: String,
      mean_byte: Double,
      frame_count: Int)

  /** Attach a binary payload column (here: utf-8 bytes of the text — the
    * stand-in for reading image/audio bytes) plus typed metadata, the
    * schema a multimodal lakehouse table would carry.
    */
  def attachBinary(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("media_meta"))

  /** Decode / feature-extract over the binary column via mapPartitions —
    * imperative per-partition batch processing, the Spark-side shape of a
    * Pandas-UDF/Arrow decode stage. The md5/mean/frame logic below is the
    * deterministic FAKE decoder; swap `decodeOne` for a real codec.
    */
  def extractFeatures(spark: SparkSession, withBinary: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withBinary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one digest instance per partition, reused across the batch —
        // the pattern that amortizes per-record codec setup cost
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => decodeOne(md, id, bytes) }
      }
  }

  /** FAKE decode: byte stats in place of pixels. Deterministic. */
  private def decodeOne(
      md: java.security.MessageDigest,
      id: Long,
      bytes: Array[Byte]): MediaFeatures = {
    md.reset()
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xFF; i += 1 }
    val mean = if (bytes.length > 0) s.toDouble / bytes.length else 0.0
    // "frame count": pretend a frame every 64 bytes — a video would report
    // its real frame count here
    MediaFeatures(id, bytes.length.toLong, hex,
      math.round(mean * 10000).toDouble / 10000, bytes.length / 64 + 1)
  }

  /** End-to-end: documents → binary payload → decoded features, as a
    * DataFrame for the driver contract.
    */
  def mediaFeatures(spark: SparkSession, documents: DataFrame): DataFrame =
    extractFeatures(spark, attachBinary(documents)).toDF()

  /** Frame sampling stub: split the payload into fixed-size "frames" and
    * keep every `stride`-th one — the plumbing (explode of variable-length
    * binary chunks, ordinal metadata) of a real video frame-sampler.
    */
  def sampleFrames(withBinary: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("int")
    withBinary
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => substring(col("payload"), (i * frameBytes) + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0 && length(col("frame")) > 0)
  }
}
