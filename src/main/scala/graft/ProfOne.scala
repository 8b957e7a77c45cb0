package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler (round-18 optimization aid, not part of the driver
  * contract): run one named query under the bench's session shape and
  * print every Spark JOB with its wall time and call site, so the
  * expensive phase of a multi-action operator is attributable without
  * the UI. Usage: runMain graft.ProfOne <queryName> [sfDir] [reps]
  */
object ProfOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          rows.add((j.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dt = (for { a <- i.completionTime; b <- i.submissionTime }
          yield (a - b) / 1e3).getOrElse(-1.0)
        stages.add((i.stageId, dt, i.numTasks, i.name.take(90)))
      }
    })
    // warmup like the bench
    try {
      SparkEntry.queries("q1_agg")(spark, sfDir).count()
      SparkEntry.queries("j1_patient_join")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    for (name <- names; r <- 1 to reps) {
      rows.clear(); stages.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(_._1)
      println(f"== rep $r: $name rows=$n total=$dt%.2fs jobs=${all.size}")
      all.foreach { case (id, sec, site) =>
        if (sec >= 0.02) println(f"  job $id%4d $sec%7.3fs  $site")
      }
      val bySite = all.groupBy(_._3).map { case (s, g) =>
        (g.map(_._2).sum, g.size, s) }.toSeq.sortBy(-_._1)
      println("  -- by call site --")
      bySite.take(25).foreach { case (sum, cnt, s) =>
        println(f"  $sum%7.3fs  n=$cnt%-4d $s") }
      println("  -- slow stages --")
      stages.asScala.toSeq.sortBy(-_._2).take(20).foreach {
        case (id, sec, nt, nm) =>
          println(f"  stage $id%4d $sec%7.3fs tasks=$nt%-4d $nm") }
    }
    spark.stop()
  }
}
