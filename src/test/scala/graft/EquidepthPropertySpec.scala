package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the two-pass equi-depth quartile rewrite
  * (`agg_equidepth_hist`, r6): for random and adversarial price
  * distributions, the distributed coarse-bucket + refine pipeline must
  * reproduce PERCENTILE_DISC semantics exactly — quartile q = the
  * smallest value whose cumulative count × 4 ≥ n × q — as computed by
  * a direct sorted-array oracle. Exercises the seams the sf oracle
  * cannot: all-equal domains, two-point domains, heavy ties at the
  * thresholds, tiny n, and value ranges forcing empty coarse buckets.
  */
class EquidepthPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def expected(cents: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    val sorted = cents.sorted
    val n = sorted.size.toLong
    def quart(mult: Long): Long = {
      var c = 0L
      sorted.distinct
        .find { v => c += sorted.count(_ == v); c * 4 >= n * mult }
        .getOrElse(sorted.last)
    }
    val (q1, q2, q3) = (quart(1), quart(2), quart(3))
    def bucketOf(v: Long): Long =
      if (v <= q1) 0L else if (v <= q2) 1L else if (v <= q3) 2L else 3L
    sorted.groupBy(bucketOf).toSeq.sortBy(_._1).map { case (b, vs) =>
      (b, vs.size.toLong, vs.min, vs.max)
    }
  }

  private def run(cents: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-eqd")
    try {
      cents.map(c => c.toDouble / 100.0).toDF("o_totalprice")
        .write.parquet(s"$tmp/orders.parquet")
      SparkEntry.queries("agg_equidepth_hist")(spark, tmp.toString)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    } finally graft.queries.Scratch.rmTree(tmp.toFile)
  }

  test("two-pass quartiles == sorted-array PERCENTILE_DISC oracle") {
    val rng = new scala.util.Random(42)
    val cases: Seq[Seq[Long]] = Seq(
      Seq(100L),                          // n = 1
      Seq(100L, 100L, 100L, 100L),        // all equal
      Seq(1L, 2L),                        // two-point
      (1L to 4L),                         // exact quartile boundaries
      Seq.fill(50)(7L) ++ Seq.fill(50)(9L), // heavy two-point ties
      (1L to 1000L),                      // uniform distinct
      Seq.tabulate(500)(i => (i % 10).toLong), // small domain, many ties
      Seq.tabulate(300)(_ => rng.between(0L, 1000000L)), // wide sparse
      Seq.tabulate(257)(_ => rng.between(0L, 3L)), // domain < bucket count
      (1L to 200L).map(i => i * i)        // convex spacing → empty buckets
    ) ++ (1 to 10).map { s =>
      val r = new scala.util.Random(s)
      Seq.tabulate(40 + s * 13)(_ => r.between(0L, s * 100L + 3))
    }
    cases.zipWithIndex.foreach { case (cents, i) =>
      assert(run(cents) == expected(cents), s"case $i: $cents")
    }
  }
}
