package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame

/** S14 analogue: the reference's test-data producer replays a DSV file
  * into Kafka at a fixed rate (`304-streaming/kafka/src/main/java/
  * IKafkaConstants.java:6-7`, 1000 msgs / 1000 ms). With no broker in
  * this environment, the portable equivalent feeds the FILE stream
  * source: rows are written as text files into a watched directory in
  * fixed-size batches at a fixed cadence — each dropped file becomes one
  * micro-batch upstream, giving streaming tests a deterministic,
  * replayable producer.
  */
object Replay {

  /** Replay the single string column of `df` into `dir` as `batches`
    * files of `batchSize` lines, sleeping `intervalMs` between drops.
    * Runs on the driver (it is a test harness, not a pipeline operator);
    * returns the number of lines written.
    */
  def replayLines(
      df: DataFrame,
      dir: String,
      batchSize: Int = 1000,
      intervalMs: Long = 1000,
      batches: Int = Int.MaxValue): Long = {
    require(df.schema.fields.length == 1 &&
      df.schema.fields(0).dataType.typeName == "string",
      "replayLines expects a single string column")
    Files.createDirectories(Paths.get(dir))
    val it = df.toLocalIterator() // streams partitions; no full collect
    var written = 0L
    var batch = 0
    val buf = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    def flush(): Unit = if (buf.nonEmpty) {
      // write to a temp name, then atomic-move: the file stream source
      // must never observe a half-written file
      val tmp = Paths.get(dir, s".batch_$batch.tmp")
      val fin = Paths.get(dir, f"batch_$batch%05d.txt")
      Files.write(tmp, buf.mkString("\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, fin,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      written += buf.length
      buf.clear()
      batch += 1
      if (batch < batches && it.hasNext) Thread.sleep(intervalMs)
    }
    while (it.hasNext && batch < batches) {
      buf += it.next().getString(0)
      if (buf.length >= batchSize) flush()
    }
    if (batch < batches) flush()
    written
  }
}
