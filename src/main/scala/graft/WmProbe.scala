package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary diagnostic main (deleted before commit)
object WmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = 1767225600L
    val tmp = java.nio.file.Files.createTempDirectory("wmshards").toFile
    def shard(i: Int, rows: Seq[(Long, Long)]): Unit = {
      val stage = new java.io.File(tmp, s"stage$i")
      rows.toDF("sec", "v")
        .select($"v", timestamp_seconds($"sec").as("ts"))
        .coalesce(1).write.parquet(stage.getAbsolutePath)
      val data = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val tgt = new java.io.File(tmp, s"shard$i.parquet")
      java.nio.file.Files.move(data.toPath, tgt.toPath)
      graft.queries.Scratch.rmTree(stage)
      tgt.setLastModified(1000000000000L + i * 10000L); ()
    }
    def m(x: Long) = base + x * 60
    shard(0, Seq((m(0), 1L), (m(9), 2L)))
    shard(1, Seq((m(30), 10L)))       // advances wm (for batch AFTER next?)
    shard(2, Seq((m(30), 11L)))       // extra advancer — wm already 25 planned
    shard(3, Seq((m(12), 100L), (m(2), 200L), (m(31), 20L))) // late batch
    shard(4, Seq((m(50), 1000L)))
    val schema = spark.read.parquet(tmp.getAbsolutePath).schema
    val df = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp.getAbsolutePath)
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .select(unix_seconds($"window.start").as("ws"), $"n", $"sum_v")
    val q = df.writeStream.format("memory").queryName("wmp")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("wmp").toString)
      .start()
    q.processAllAvailable()
    q.recentProgress.foreach(p => println(
      s"batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${Option(p.eventTime).map(_.get("watermark")).orNull} " +
        s"dropped=${p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(",")}"))
    spark.table("wmp").orderBy("ws").show(false)
    q.stop(); spark.stop()
  }
}
