package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming equivalents for the reference's batch dataflow
  * (SURVEY.md §2.7): arriving dataset files become a file-source stream;
  * per-dataset builds are stateless maps; global merges run incrementally.
  * The reference itself has no streaming — this is the scale-path
  * extension: new CODEX datasets (or event/log shards) land continuously
  * and the product updates without recomputing the world.
  */
object Streams {

  /** File-arrival stream over a parquet directory. `maxFilesPerTrigger`
    * bounds per-batch work — the knob that keeps batch latency flat as the
    * directory grows to millions of files.
    */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Watermarked tumbling-window counts over an event-time column — the
    * monitoring aggregation from SURVEY.md §2.7. State is bounded by the
    * watermark: late rows beyond `lateness` are dropped and their window
    * state evicted.
    */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String,
                     lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming exact dedup: drop duplicate keys within the watermark
    * horizon — the incremental form of the batch digest-dedup. State is one
    * (key, timestamp) entry per distinct key inside the horizon; the
    * watermark evicts it, so state size is bounded by arrival rate ×
    * horizon, not by stream length.
    */
  def streamingDedup(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                     lateness: String): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Run a streaming aggregation to completion against a static directory
    * (memory sink, complete mode) and return the result — used by tests and
    * by the `queries` registry to exercise the streaming path on the batch
    * harness data.
    */
  def runToMemory(agg: DataFrame, name: String): DataFrame = {
    val spark = agg.sparkSession
    val q = agg.writeStream
      .format("memory").queryName(name).outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
