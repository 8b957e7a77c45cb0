package graft

import graft.ops.Width
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-scaled exchange widths (r19): the width must follow the
  * frame's plan-stat size — saturating at the session conf for big
  * inputs, shrinking toward 1 for tiny ones, and respecting the
  * key-cardinality cap — and computing it must never run a job
  * (driver-only plan statistics).
  */
class WidthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scaled clamps to [1, session width] and honors maxWidth") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-width-").toFile
    dir.deleteOnExit()
    val p = s"${dir.getAbsolutePath}/t"
    (0L until 2000L).map(i => (i, s"doc $i " + ("x" * 100)))
      .toDF("id", "text").coalesce(1).write.parquet(p)
    val df = spark.read.parquet(p)
    val session = spark.sessionState.conf.numShufflePartitions
    // huge target → 1 task; tiny target → saturates the session conf
    assert(Width.scaled(df, Long.MaxValue / 2) === 1)
    assert(Width.scaled(df, 1L) === session)
    // maxWidth (key cardinality) caps below the session conf
    assert(Width.scaled(df, 1L, maxWidth = 3) === 3)
    // monotone in the target: halving the target never shrinks width
    val w1 = Width.scaled(df, 64L << 10)
    val w2 = Width.scaled(df, 32L << 10)
    assert(w2 >= w1)
  }

  test("scaled is driver-only: no Spark job runs to compute it") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = (0L until 100L).toDF("id")
        .select(col("id"), (col("id") * 2).as("v"))
      Width.scaled(df, 1024L)
      Thread.sleep(300) // listener bus is async
      assert(jobs.get() === 0)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("stats survive localCheckpoint (the winnowOverlap fps frame)") {
    val fps = (0L until 500L).map(i => (i % 50, i))
      .toDF("doc_id", "fp").localCheckpoint()
    // origin stats propagate: a 500-row checkpoint must not read as
    // unknown-size (which would always saturate the session width)
    val w = Width.scaled(fps, Long.MaxValue / 2)
    assert(w === 1)
  }
}
