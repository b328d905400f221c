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

  /** The codec seam: one implementation per media family, plugged into
    * [[extractFeatures]] without touching the operator. Instances ship
    * to executors (hence Serializable); `forPartition()` runs once per
    * partition and returns the per-record decode closing over any
    * per-partition codec state (digest instances, decoder contexts,
    * native handles) — the setup-amortization pattern every real codec
    * needs.
    */
  trait MediaDecoder extends Serializable {
    def forPartition(): (Long, Array[Byte]) => MediaFeatures
  }

  /** The deterministic byte-math STUB decoder (md5 + mean byte +
    * len/64 frames standing in for pixels) — the default, and the
    * oracle-gated family: DuckDB replays it exactly (q40).
    */
  object ByteMathDecoder extends MediaDecoder {
    def forPartition(): (Long, Array[Byte]) => MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (id, bytes) => {
        md.reset()
        val hex = md.digest(bytes).map(b => f"$b%02x").mkString
        var s = 0L
        var i = 0
        while (i < bytes.length) { s += bytes(i) & 0xFF; i += 1 }
        val mean = if (bytes.length > 0) s.toDouble / bytes.length else 0.0
        // "frame count": pretend a frame every 64 bytes — a video would
        // report its real frame count here
        MediaFeatures(id, bytes.length.toLong, hex,
          math.round(mean * 10000).toDouble / 10000, bytes.length / 64 + 1)
      }
    }
  }

  /** A REAL codec through the same seam: `javax.imageio` ships with the
    * JDK (PNG/JPEG/BMP/GIF readers, no external library), so this
    * implementation genuinely decodes pixels — `mean_byte` becomes the
    * mean 0–255 luminance (ITU-R BT.601 weights) of the decoded image
    * and `frame_count` is 1 (still image). A payload that does not
    * decode throws with the doc id — a production pipeline wraps the
    * decode stage with its own failure routing (quarantine column,
    * side output); swallowing undecodable media silently is the one
    * behavior a training pipeline must not default to.
    */
  object ImageIoDecoder extends MediaDecoder {
    def forPartition(): (Long, Array[Byte]) => MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (id, bytes) => {
        md.reset()
        val hex = md.digest(bytes).map(b => f"$b%02x").mkString
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"doc $id: payload is not a decodable image")
        var lum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            lum += 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        val mean = if (n > 0) lum / n else 0.0
        MediaFeatures(id, bytes.length.toLong, hex,
          math.round(mean * 10000).toDouble / 10000, 1)
      }
    }
  }

  /** Decode / feature-extract over the binary column via mapPartitions —
    * imperative per-partition batch processing, the Spark-side shape of a
    * Pandas-UDF/Arrow decode stage. The decoder is the pluggable seam:
    * [[ByteMathDecoder]] (deterministic stub, oracle-gated) by default,
    * [[ImageIoDecoder]] or any [[MediaDecoder]] for real media.
    */
  def extractFeatures(spark: SparkSession, withBinary: DataFrame,
      decoder: MediaDecoder = ByteMathDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    withBinary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = decoder.forPartition()
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** End-to-end: documents → binary payload → decoded features, as a
    * DataFrame for the driver contract.
    */
  def mediaFeatures(spark: SparkSession, documents: DataFrame,
      decoder: MediaDecoder = ByteMathDecoder): DataFrame =
    extractFeatures(spark, attachBinary(documents), decoder).toDF()

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
