package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r19): print plan-stat sizeInBytes and the resulting
  * Width.scaled values for the frames feeding each explicit-width
  * repartition site, at a given SF — calibration evidence for the
  * per-site targetBytesPerTask constants. Not part of the bench or
  * driver contract. Usage: runMain graft.StatsProbe [sfDir]
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def stat(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val b = df.queryExecution.optimizedPlan.stats.sizeInBytes
      println(f"$name%-40s bytes=$b")
    }
    stat("documents(doc_id,text)",
      Tables.documents(spark, sfDir).select($"doc_id", $"text"))
    stat("embeddings", Tables.embeddings(spark, sfDir))
    stat("embeddings.batchA",
      Tables.embeddings(spark, sfDir).filter($"vec_id" % 10 =!= 0))
    val fpsRaw = queries.Round13Queries.winnowFingerprints(
      Tables.documents(spark, sfDir).select($"doc_id", $"text"))
      .select($"doc_id", expr("fp div 4096").as("fp")).distinct()
    stat("winnow fps (pre-checkpoint)", fpsRaw)
    stat("winnow fps (localCheckpoint)", fpsRaw.localCheckpoint())
    stat("events", Tables.events(spark, sfDir))
    // spread decisions on the real frames
    val docs2 = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val sp = graft.ops.TextClassifier.spread(docs2, $"doc_id")
    println(s"spread(docs) partitions=${sp.rdd.getNumPartitions} " +
      s"scaled=${graft.ops.Width.scaled(docs2, 32L << 10)}")
    spark.stop()
  }
}
