package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14: the co-activity hot-bucket guard (planted flash-crowd
  * minute dropped, under-cap buckets untouched, breach observable),
  * norm-augmented MIPS through the IVF serving path, cross-doc
  * winnowing overlap pairs, and the interval-join width derivation.
  */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:30")
  private val t1 = java.sql.Timestamp.valueOf("2024-03-01 13:10:30")
  private val t2 = java.sql.Timestamp.valueOf("2024-03-01 14:20:30")

  /** Synthetic events: `hot` users in ONE (click, 12:00) minute plus
    * two 2-user control buckets. act rows = hot + 4; the derived cap
    * bottoms out at 64 for any corpus under 2^8 rows. */
  private def eventsWithHotMinute(hot: Int) = {
    val hotRows = (0 until hot).map(u => (u.toLong, "click", t0))
    val normal = Seq((100L, "view", t1), (101L, "view", t1),
      (102L, "view", t2), (103L, "view", t2))
    (hotRows ++ normal).toDF("user_id", "event_type", "ts")
  }

  test("coactivity hot-bucket guard: a flash-crowd minute over the " +
      "derived cap emits ZERO edges; under-cap buckets are untouched") {
    // 70 hot users, act = 74 rows -> cap = max(64, 8*bitlen(75)) = 64:
    // the hot bucket (70 > 64) is dropped, controls survive
    val edges = graft.queries.Coactivity
      .undFromEvents(spark, eventsWithHotMinute(70))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((100L, 101L), (102L, 103L)),
      s"hot-minute edges must be dropped, controls kept: $edges")
    // 40 hot users, act = 44 -> cap = 64: under the cap, the same
    // bucket emits its full clique — the guard is a cap, not a filter
    val under = graft.queries.Coactivity
      .undFromEvents(spark, eventsWithHotMinute(40))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(under.size == 40 * 39 / 2 + 2,
      s"under-cap bucket must keep its clique: ${under.size}")
  }

  test("coactivity guard is observable: coactivity_cap metrics " +
      "(max_bucket, over_cap_rows) arrive via the standard listener") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.get("coactivity_cap").foreach { row =>
          captured.add((row.getAs[Long]("max_bucket"),
            row.getAs[Long]("over_cap_rows")))
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.queries.Coactivity
        .undFromEvents(spark, eventsWithHotMinute(70)).count()
      def found: Boolean = {
        var ok = false
        captured.forEach { case (maxBucket, overCap) =>
          if (maxBucket == 70L && overCap == 70L) ok = true
        }
        ok
      }
      val deadline = System.currentTimeMillis() + 20000
      while (!found && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(found, s"expected (max_bucket=70, over_cap_rows=70), " +
        s"got $captured")
    } finally spark.listenerManager.unregister(listener)
  }

  test("mipsIvfTopK at nProbe = nCells degenerates to EXACT brute-MIPS " +
      "ranks (the augmentation preserves dot order end-to-end)") {
    import graft.similarity.Knn
    // well-separated magnitudes and angles — no float near-ties
    val corpus = (0 until 12).map { i =>
      (i.toLong, Array((i + 1).toFloat, (i % 3).toFloat * 2f,
        ((i * 7) % 5).toFloat, 1f))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
    def ranks(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1))
      .toMap
    val brute = ranks(Knn.mipsTopK(corpus, queries, "vec_id",
      "embedding", 5))
    val served = ranks(Knn.mipsIvfTopK(corpus, queries, "vec_id",
      "embedding", 5, nCells = 4, nProbe = 4))
    assert(served == brute,
      s"all-probe augmented IVF must equal brute MIPS: $served vs $brute")
  }

  test("mipsIvfTopK recall vs brute MIPS on sf0.001 embeddings: " +
      ">= 0.45 at the registered nProbe=4, rising with the probe knob") {
    import graft.similarity.Knn
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter($"vec_id" < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Knn.mipsTopK(emb, queries, "vec_id",
      "embedding", 10))
    def recallAt(nProbe: Int) = {
      val served = pairs(Knn.mipsIvfTopK(emb, queries, "vec_id",
        "embedding", 10, nCells = 16, nProbe = nProbe))
      (brute intersect served).size.toDouble / brute.size
    }
    // the augmentation buys MIPS serving at a ROUTING cost: every
    // short vector gains a large appended component, pulling it
    // toward the augmentation axis and blurring cell geometry (the
    // documented penalty that motivates dedicated MIPS quantizers in
    // production ANN systems). Measured here: 0.42/0.50/0.62 at
    // nProbe 3/4/8 vs ~0.7+ for plain cosine IVF — the floor pins
    // the registered operating point, the second assertion pins that
    // the standard probe knob recovers recall.
    val atRegistered = recallAt(4)
    assert(atRegistered >= 0.45,
      s"augmented-IVF MIPS recall $atRegistered at nProbe=4")
    val atWide = recallAt(8)
    assert(atWide >= atRegistered && atWide >= 0.6,
      s"probe knob must recover recall: $atWide at nProbe=8")
  }

  test("winnowOverlap: two docs sharing one >= 11-char run (and " +
      "nothing else) pair; a disjoint doc does not") {
    val shared = "zqxjkvwpyg mbtfh" // 16 normalized chars
    val docs = Seq(
      (0L, s"aaaa bbbb $shared cccc dddd"),
      (1L, s"eeee ffff gggg $shared hhhh"),
      (2L, "totally disjoint content with no overlap at all here"))
      .toDF("doc_id", "text")
    val out = graft.queries.Round14Queries
      .winnowOverlap(docs, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out.keySet == Set((0L, 1L)),
      s"exactly the planted pair must surface: $out")
    assert(out((0L, 1L)) >= 1L)
  }

  test("winnowOverlap boilerplate cap: a fingerprint carried by more " +
      "docs than the derived cap forms NO pairs; private overlap " +
      "within the same docs still surfaces") {
    // docs 2..69 are IDENTICAL pure boilerplate — every hash one of
    // them selects is selected by all 68 (identical docs make
    // identical selections), so df ∈ {68, 70} > cap 64 and the
    // would-be 68-doc clique (2278 pairs) must vanish entirely.
    // Docs 0 and 1 are boilerplate + a private tail: their
    // boiler-interior hashes ride the same over-cap df, and the
    // tail-region hashes have df = 2 — kept, pairing exactly (0, 1).
    val boiler = "this exact boilerplate sentence rides along in " +
      "every single document of the cohort and carries no pairwise " +
      "signal whatsoever between any two of its carriers"
    val priv = "zqxjkvwpyg mbtfh"
    val docs = (0 until 70).map { i =>
      val extra = if (i <= 1) s" $priv" else ""
      (i.toLong, s"$boiler$extra")
    }.toDF("doc_id", "text")
    val out = graft.queries.Round14Queries
      .winnowOverlap(docs, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L)),
      s"boilerplate fps must be dropped, private overlap kept: " +
        s"${out.size} pairs")
  }

  test("intervalJoin auto-width overload: pair-identical to the naive " +
      "non-equi predicate on the randomized fixture (sub-second " +
      "overhangs, empty intervals, span outliers), and still an equi " +
      "join in the plan") {
    val rnd = new scala.util.Random(14)
    // the r13 fixture shape + one 50×-span OUTLIER interval: under the
    // derived width (= max span) every interval replicates to ≤ 2
    // buckets; under a caller-guessed narrow width the outlier would
    // have replicated ~50-fold
    val ivRows = (0L until 80L).map { i =>
      val st = if (i % 4 == 0) rnd.nextLong(50L) * 100L
               else rnd.nextLong(5000L)
      val len =
        if (i == 7L) 5000L * 100L // the span outlier
        else rnd.nextLong(7L) * 100L * (if (i % 5 == 0) 0L else 1L)
      val overhangMs = if (i % 3 == 0) rnd.nextLong(1000L) else 0L
      (i, st * 1000L, (st + len) * 1000L +
        (if (len == 0L) 0L else overhangMs))
    }
    val intervals = ivRows.map { case (i, sMs, eMs) =>
      (i, new java.sql.Timestamp(sMs), new java.sql.Timestamp(eMs))
    }.toDF("iv_id", "iv_start", "iv_end")
    val witnesses = ivRows.zipWithIndex.flatMap {
      case ((_, _, eMs), j) => Seq(
        (1000L + 2 * j, new java.sql.Timestamp(eMs - 1L)),
        (1001L + 2 * j, new java.sql.Timestamp(eMs)))
    }
    val points = ((0L until 300L).map(i =>
      (i, new java.sql.Timestamp(
        rnd.nextLong(5000L) * 1000L + rnd.nextLong(1000L)))) ++
      witnesses)
      .toDF("p_id", "p_ts")
    val auto = graft.ops.Relational.intervalJoin(
      points, intervals, "p_ts", "iv_start", "iv_end")
    val got = auto.select($"p_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        $"p_ts" >= $"iv_start" && $"p_ts" < $"iv_end")
      .select($"p_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && naive.nonEmpty)
    val plan = auto.queryExecution.executedPlan.toString
    // the 1-row width scalar rides a broadcast cross join onto EACH
    // side (≤ 2 BNLJ nodes, both over a single-row build); the
    // POINT-INTERVAL join itself must be a hash/merge EQUI join
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 2, s"only the width-scalar cross joins may " +
      s"nest-loop (found $bnlj):\n$plan")
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"),
      s"the point-interval join must be an equi join:\n$plan")
  }

  test("composing two same-label capped generators in ONE plan fails " +
      "FAST at analysis (duplicate CollectMetrics name), and distinct " +
      "capLabels compose cleanly — the documented contract") {
    import graft.dedup.Dedup
    def docs(tag: String) = (0L until 12L).map(i =>
      (i, s"$tag doc $i " + (0 to 6).map(j => s"$tag${i}_$j")
        .mkString(" "))).toDF("doc_id", "text")
    // different corpora -> the two observe nodes are NOT sameResult,
    // so the default shared label must be rejected at analysis, not
    // discovered as a mystery failure mid-job
    val a = Dedup.minhashCandidates(docs("aa"), "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 2, maxBucket = 0)
    val b = Dedup.minhashCandidates(docs("bb"), "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 2, maxBucket = 0)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      a.unionByName(b).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("observ") ||
      ex.getMessage.toLowerCase.contains("metrics"),
      s"expected the duplicate-metrics analysis error, got: " +
        s"${ex.getMessage.take(200)}")
    // the workaround the Scaladoc prescribes: distinct labels
    val b2 = Dedup.minhashCandidates(docs("bb"), "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 2, maxBucket = 0,
      capLabel = "minhash_b")
    assert(a.unionByName(b2).collect() != null)
  }

  test("coactivity guard: a pair sharing BOTH a hot and an under-cap " +
      "bucket still surfaces (multi-band semantics, no lost signal)") {
    // users 0 and 1 are in the 70-user hot minute AND a private bucket
    val ev = eventsWithHotMinute(70)
      .unionByName(Seq((0L, "purchase", t1), (1L, "purchase", t1))
        .toDF("user_id", "event_type", "ts"))
    val edges = graft.queries.Coactivity.undFromEvents(spark, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((0L, 1L)),
      s"pair with an under-cap co-occurrence must survive: $edges")
    assert(!edges.contains((2L, 3L)),
      "hot-only pairs must stay dropped")
  }
}
