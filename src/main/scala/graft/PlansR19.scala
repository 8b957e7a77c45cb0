package graft

import org.apache.spark.sql.SparkSession

/** Round-19 optimization evidence: dump `.explain("formatted")` for a
  * list of queries into plans/r19/<name>_<suffix>.txt (the judge
  * checks plan-shape claims against these files). Unlike PlansR18,
  * a query that fails to plan makes the run EXIT NON-ZERO (r18
  * advice: silent failure let a before/after comparison quietly read
  * a stale file). Usage:
  *   runMain graft.PlansR19 <suffix> <name1,name2,...> [sfDir]
  */
object PlansR19 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File("plans/r19")
    dir.mkdirs()
    var failed = false
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r19/${name}_$suffix.txt"), plan)
        System.err.println(s"[plans] $name -> ${name}_$suffix.txt")
      } catch { case e: Throwable =>
        failed = true
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
