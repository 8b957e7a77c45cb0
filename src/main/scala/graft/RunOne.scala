package graft

import org.apache.spark.sql.SparkSession

/** Dev runner: execute one named query (or `explain:<name>` for its
  * physical plan) against a sf dir. Usage:
  *   runMain graft.RunOne <queryName|explain:queryName> [sfDir] [nShow]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val nShow = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (explain, qname) =
      if (name.startsWith("explain:")) (true, name.stripPrefix("explain:"))
      else (false, name)
    val df = SparkEntry.queries(qname)(spark, sfDir)
    if (explain) df.explain("formatted")
    else {
      val t0 = System.nanoTime()
      df.show(nShow, truncate = false)
      println(f"[runone] $qname rows=${df.count()} " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
