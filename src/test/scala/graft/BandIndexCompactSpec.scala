package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** compactBandIndex must be invisible to readers: same row multiset
  * (minus retention-expired rows), same probe results, fewer files. */
class BandIndexCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def buildIndex(p: String): Unit = {
    val docs = Tables.documents(spark, TestSpark.sf)
    def buckets(f: org.apache.spark.sql.DataFrame, day: Int) =
      Dedup.minhashBucketsPortable(f, "doc_id", "text",
        shingleN = 5, bands = 8, rowsPerBand = 2)
        .withColumn("day", lit(day.toLong))
    buckets(docs.filter($"doc_id" % 10 =!= 0), 0)
      .write.partitionBy("band").parquet(p)
    buckets(docs.filter($"doc_id" % 20 === 0), 1)
      .write.mode("append").partitionBy("band").parquet(p)
  }

  private def multiset(p: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(p)
      .select($"id", $"band".cast("long"), $"band_hash", $"day")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted

  private def filesIn(dir: String): Int = {
    val fs = new java.io.File(dir).listFiles()
    if (fs == null) 0 else fs.count(_.getName.endsWith(".parquet"))
  }

  test("no-retention compaction preserves the exact row multiset " +
    "and leaves one file per band partition") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-bidx-").toFile
    try {
      val p = s"${tmp.getAbsolutePath}/idx"
      buildIndex(p)
      val before = multiset(p)
      assert(filesIn(s"$p/band=0") >= 2) // two appended generations
      Dedup.compactBandIndex(spark, p)
      assert(multiset(p) == before)
      (0 until 8).foreach(b => assert(filesIn(s"$p/band=$b") == 1))
    } finally graft.queries.Scratch.rmTree(tmp)
  }

  test("retention drops exactly the expired generation") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-bidx-").toFile
    try {
      val p = s"${tmp.getAbsolutePath}/idx"
      buildIndex(p)
      val live = multiset(p).filter(_._4 >= 1L)
      Dedup.compactBandIndex(spark, p, retain = col("day") >= 1L)
      assert(multiset(p) == live)
    } finally graft.queries.Scratch.rmTree(tmp)
  }

  test("swap crash windows: every intermediate state recovers intact") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-bidx-").toFile
    try {
      val p = s"${tmp.getAbsolutePath}/idx"
      buildIndex(p)
      val before = multiset(p)
      // crash AFTER the aside-rename, BEFORE the swap: live dir missing,
      // .old holds the last intact index
      assert(new java.io.File(p).renameTo(new java.io.File(p + ".old")))
      Dedup.recoverBandIndex(p)
      assert(!new java.io.File(p + ".old").exists())
      assert(multiset(p) == before, "recovery must restore the aside copy")
      // crash AFTER the swap, BEFORE .old cleanup: both dirs exist —
      // recovery must keep the (newer) live dir and drop .old
      val stale = new java.io.File(p + ".old"); stale.mkdirs()
      new java.io.File(stale, "junk.parquet").createNewFile()
      Dedup.recoverBandIndex(p)
      assert(!stale.exists() && multiset(p) == before)
      // a compaction entered on a crashed state (stale .compacting AND
      // .old) still completes and is reader-invisible
      assert(new java.io.File(p + ".compacting").mkdirs())
      Dedup.compactBandIndex(spark, p)
      assert(multiset(p) == before)
      assert(!new java.io.File(p + ".old").exists())
      assert(!new java.io.File(p + ".compacting").exists())
      (0 until 8).foreach(b => assert(filesIn(s"$p/band=$b") == 1))
    } finally graft.queries.Scratch.rmTree(tmp)
  }
}
