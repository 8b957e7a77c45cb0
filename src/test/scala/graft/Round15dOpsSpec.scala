package graft

import graft.ops.{Graph, RobustStats}
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 fourth wave: robust statistics (median/MAD outliers,
  * nearest-rank winsorization) and personalized PageRank — planted
  * fixtures pinning the exact-integer statistics and the seed-restart
  * semantics.
  */
class Round15dOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("madOutliers: hand-computed median/MAD on odd and even groups, " +
    "one wild value flagged, MAD = 0 degenerate case") {
    // odd group: {1,2,3,4,100} → med 3 (med2 6), devs {2,1,0,1,97} →
    // sorted {0,1,1,2,97} MAD 1 (mad4 4); outlier iff 2·dev2 > 3·mad4
    // ⟺ dev2 > 6 ⟺ |v−3| > 3 → only 100
    val odd = Seq(1L, 2L, 3L, 4L, 100L).zipWithIndex
      .map { case (v, i) => ("odd", i.toLong, v) }
    // even group: {1,2,3,4} → med2 = 2+3 = 5, dev2 = {3,1,1,3} →
    // sorted {1,1,3,3} mad4 = 1+3 = 4; 2·dev2 > 12 never → 0 outliers
    val even = Seq(1L, 2L, 3L, 4L).zipWithIndex
      .map { case (v, i) => ("even", i.toLong, v) }
    // degenerate: {5,5,5,9} → med2 = 10, dev2 = {0,0,0,8} → mad4 = 0;
    // the single off-median value is flagged (2·8 > 0)
    val flat = Seq(5L, 5L, 5L, 9L).zipWithIndex
      .map { case (v, i) => ("flat", i.toLong, v) }
    val out = RobustStats.madOutliers(
      (odd ++ even ++ flat).toDF("g", "id", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("odd") == ((5L, 6L, 4L, 1L)))
    assert(out("even") == ((4L, 5L, 4L, 0L)))
    assert(out("flat") == ((4L, 10L, 0L, 1L)))
  }

  test("winsorize: nearest-rank p05/p95 on 1..100, clamp counts and " +
    "clamped sum exact") {
    // values 1..100: p05 rank = ceil(100/20) = 5 → value 5; p95 rank =
    // (19·100+19)//20 = 95 → value 95. Clamped sum = 4·5 (for 1..4)
    // + Σ5..95 (unchanged) + 5·95 (for 96..100) = 20 + 4550 + 475 =
    // 5045; n_lo = 4 (1..4), n_hi = 5 (96..100)
    val df = (1L to 100L).map(v => ("g", v, v)).toDF("g", "id", "v")
    val r = RobustStats.winsorize(df, "g", "v", 1L, 19L, 20L)
      .collect()(0)
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("p_lo") == 5L)
    assert(r.getAs[Long]("p_hi") == 95L)
    assert(r.getAs[Long]("raw_sum") == 5050L)
    assert(r.getAs[Long]("clamped_sum") == 5045L)
    assert(r.getAs[Long]("n_lo") == 4L)
    assert(r.getAs[Long]("n_hi") == 5L)
  }

  test("pprSeeds: teleport restarts ONLY at seeds — a node reachable " +
    "from the seed outranks an equally-shaped node that is not") {
    // path graph: 17 - 1 - 2   and a disconnected pair 3 - 4.
    // Seed (mod 17) = node 17 only. Node 1 (adjacent to the seed)
    // must outrank node 3 (same degree, no seed anywhere near);
    // nodes 3,4 earn ZERO rank (no teleport, no seed-side inflow).
    val und = Seq((1L, 17L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val r = Graph.pprSeeds(und, seedMod = 17L, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(17L) > 0L)
    assert(r(1L) > 0L)
    assert(r(2L) > 0L)
    assert(r(1L) > r(2L)) // one hop from seed beats two hops
    assert(r(3L) == 0L && r(4L) == 0L) // unreachable from seeds
  }

  test("pprSeeds: all nodes seeded degenerates to uniform-teleport " +
    "pagerank shape (every node gets the same teleport term)") {
    // mod 1 → every node is a seed; on a symmetric 4-cycle all ranks
    // are equal and positive
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("a", "b")
    val r = Graph.pprSeeds(und, seedMod = 1L, iters = 3)
      .collect().map(x => x.getLong(1)).toSet
    assert(r.size == 1 && r.head > 0L)
  }

  test("pprSeeds: a seedless NON-empty graph fails the eager require; " +
    "an empty graph returns the empty vector") {
    val noSeeds = Seq((1L, 2L)).toDF("a", "b") // no node % 5 == 0
    val e = intercept[IllegalArgumentException] {
      Graph.pprSeeds(noSeeds, seedMod = 5L, iters = 1)
    }
    assert(e.getMessage.contains("no seeds"))
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.pprSeeds(empty, seedMod = 5L, iters = 1).count() == 0L)
  }

  test("robust_stats_collapse observe: planted ALL-DISTINCT column " +
    "reports distinct_rows == total_rows (the degenerate domain made " +
    "visible); a duplicated domain reports the collapse") {
    def collapseRow(df: => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.Row = {
      val captured = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.Row]()
      val listener =
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              d: Long): Unit =
            qe.observedMetrics.get("robust_stats_collapse")
              .foreach(captured.add)
          override def onFailure(fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              e: Exception): Unit = ()
        }
      spark.listenerManager.register(listener)
      try {
        df.count()
        val deadline = System.currentTimeMillis() + 20000
        while (captured.isEmpty &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(!captured.isEmpty,
          "observe 'robust_stats_collapse' never arrived")
        captured.peek()
      } finally spark.listenerManager.unregister(listener)
    }
    // adversarial: 1000 all-distinct values — the count-collapse buys
    // nothing and the observe must SAY so (distinct == total)
    val distinct = collapseRow(RobustStats.madOutliers(
      (1L to 1000L).map(v => ("g", v, v)).toDF("g", "id", "v"),
      "g", "v"))
    assert(distinct.getAs[Long]("distinct_rows") == 1000L)
    assert(distinct.getAs[Long]("total_rows") == 1000L)
    // natural: 1000 rows over a 10-value domain — the exchange carries
    // 10 rows, and the observe records the 100x reduction
    val collapsed = collapseRow(RobustStats.winsorize(
      (1L to 1000L).map(v => ("g", v, v % 10L)).toDF("g", "id", "v"),
      "g", "v", 1L, 19L, 20L))
    assert(collapsed.getAs[Long]("distinct_rows") == 10L)
    assert(collapsed.getAs[Long]("total_rows") == 1000L)
  }

  test("skyline2d rejects fractional axis columns loudly") {
    val df = Seq((1.5, 2L), (2.5, 1L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Relational.skyline2d(df, "x", "y", bucketWidth = 10L)
    }
    assert(e.getMessage.contains("INTEGER axes"))
  }

  test("RobustStats rejects fractional value columns loudly") {
    val df = Seq(("g", 1.5), ("g", 2.5)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      RobustStats.winsorize(df, "g", "v", 1L, 19L, 20L)
    }
    assert(e.getMessage.contains("INTEGER order statistics"))
  }
}
