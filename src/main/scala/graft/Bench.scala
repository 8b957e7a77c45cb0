package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}. A short
  * warmup action runs first so steady-state query time is measured, not
  * first-job JIT/codegen infrastructure spin-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scan + shuffle + codegen paths once
    try {
      SparkEntry.queries("q1_agg")(spark, sfDir).count()
      SparkEntry.queries("j1_patient_join")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=name1,name2 restricts the run (local profiling aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name $dt%.2fs")
        (name, dt, ok)
    }
    // a crashed query reports -1, never its (tiny) elapsed time — a crash
    // must not read as a fast run, and the failed list makes it explicit
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v else -1) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
