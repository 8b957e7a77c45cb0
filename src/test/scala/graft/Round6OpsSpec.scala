package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-level checks for the round-6 operators, beyond the oracle
  * gate: split-assignment invariance, compaction row preservation,
  * band-probe novelty semantics, CMS one-sidedness.
  */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def splitOf(df: org.apache.spark.sql.DataFrame) = df
    .select($"doc_id",
      (($"doc_id" % 1000003L) * 2654435761L % 100L).as("h"))
    .withColumn("split",
      when($"h" < 80, "train").when($"h" < 90, "val").otherwise("test"))
    .select($"doc_id", $"split")

  test("split assignment is invariant under repartition and row order") {
    val docs = (1L to 500L).toDF("doc_id")
    val a = splitOf(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = splitOf(docs.repartition(7).orderBy(rand(42)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // and the 80/10/10 shape is roughly held (hash, not quota)
    val frac = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(frac("train") > 300 && frac("test") < 100)
  }

  test("compaction rewrite preserves every row exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-r6c")
    val src = (1L to 10000L).map(i => (i, i % 97, s"p$i"))
      .toDF("id", "k", "payload")
    src.repartition(32).write.parquet(s"$tmp/frag")
    assert(new java.io.File(s"$tmp/frag").listFiles()
      .count(_.getName.endsWith(".parquet")) == 32)
    spark.read.parquet(s"$tmp/frag")
      .repartitionByRange(2, $"k").sortWithinPartitions($"k")
      .write.parquet(s"$tmp/compact")
    assert(new java.io.File(s"$tmp/compact").listFiles()
      .count(_.getName.endsWith(".parquet")) <= 2)
    val back = spark.read.parquet(s"$tmp/compact")
    assert(back.count() == 10000L)
    // exact multiset equality, not just count
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    graft.queries.Scratch.rmTree(tmp.toFile)
  }

  test("band probe: exact duplicate collides in every band, novel in none") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val b = Dedup.minhashBucketsPortable(docs, "doc_id", "text",
      shingleN = 5, bands = 8, rowsPerBand = 2)
    val probe = b.filter($"id" === 10L).as("n")
      .join(b.filter($"id" =!= 10L).as("i"),
        $"n.band" === $"i.band" && $"n.band_hash" === $"i.band_hash")
      .groupBy($"i.id").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probe.getOrElse(11L, 0L) == 8L) // identical text: all 8 bands
    assert(!probe.contains(12L))           // disjoint text: none
  }

  test("count-min estimate is one-sided: never below the exact count") {
    val df = (1L to 2000L).map(i => s"k${i % 37}").toDF("k")
    val sk = df.agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sk))
    val exact = df.groupBy($"k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (k, n) =>
      assert(cms.estimateCount(k) >= n, s"underestimate for $k") }
  }
}
