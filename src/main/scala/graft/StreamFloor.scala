package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Dev evidence tool: per-stream-query FIXED-MACHINERY FLOOR — the time a
  * stream_* query costs with ZERO input rows (schema-preserving empty
  * copies of every table). Structured Streaming's run-to-completion
  * machinery (checkpoint WAL, state-store commits, micro-batch planning)
  * is a fixed cost independent of data volume, and it is exactly the
  * part that inflates under host load; with the floor recorded,
  * round-over-round bench comparisons can separate "machinery got
  * slower on a loaded host" from "the data path regressed" — the
  * recurring stream_* bench-flag ambiguity (r8: 3 flags, r9: 4, all of
  * which later recovered quiet-host).
  *
  * Usage: sbt "runMain graft.StreamFloor [sfDir]" → STREAM_FLOOR.json
  * (min-of-3 floor seconds per query + the loadavg they ran under).
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // schema-preserving 0-row copies: limit(0) of each table, written
    // once per run (parquet schema survives; every query sees its
    // expected columns and zero data)
    val empty = java.nio.file.Files
      .createTempDirectory("graft-streamfloor-").toFile
    sys.addShutdownHook(graft.queries.Scratch.rmTree(empty))
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"${empty.getAbsolutePath}/$t.parquet")
    }
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val streams = SparkEntry.queries.keys.filter(_.startsWith("stream_"))
      .toSeq.sorted
    val results = streams.map { name =>
      def once: Double = {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, empty.getAbsolutePath).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[floor] $name failed on empty input: " +
            e.getMessage.take(160))
          -1.0
        }
      }
      val runs = Seq.fill(3)(once)
      val floor = if (runs.exists(_ < 0)) -1.0 else runs.min
      System.err.println(f"[floor] $name $floor%.2fs")
      (name, floor, loadAvg)
    }
    val json = results.map { case (n, f, la) =>
      f""""$n":{"floor_sec":$f%.3f,"load":$la%.1f}"""
    }.mkString(
      s"""{"note":"fixed machinery floor: stream_* with 0-row tables; """ +
        """-1 = query needs data by design (fixture schema inference """ +
        """or centroid training) and has no empty-input floor",""" +
        s""""sf_schema_from":"$sfDir","queries":{""", ",\n", "}}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAM_FLOOR.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
