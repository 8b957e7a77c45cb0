package graft

import graft.dedup.Dedup
import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the beyond-reference as-of join and duplicate-cluster
  * (connected components) operators.
  */
class AsofClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin: latest strictly-earlier right row per key; outer nulls") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u2", 50L),
      (4L, "u3", 10L) // u3 has no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", 90L, "a"), ("u1", 100L, "b"), // 100 NOT eligible for t=100
      ("u1", 150L, "c"), ("u2", 60L, "d")  // 60 after u2's only left row
    ).toDF("k", "rt", "v")
    val out = Relational.asofJoin(left, right, Seq("k"),
        leftTs = "t", rightTs = "rt", valueCols = Seq("v"), strict = true)
      .orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[String]("v"))).toSeq ==
      Seq(Some("a"), Some("c"), None, None))
  }

  test("asofJoin: latest right row propagates ATOMICALLY — a NULL value " +
    "on the latest match is returned, not an older row's value") {
    val left = Seq((1L, "u1", 200L)).toDF("id", "k", "t")
    val right = Seq(
      ("u1", 90L, "old", "x"),
      ("u1", 150L, null.asInstanceOf[String], "y") // latest match: v IS NULL
    ).toDF("k", "rt", "v", "w")
    val out = Relational.asofJoin(left, right, Seq("k"),
        "t", "rt", Seq("v", "w"), strict = true).collect().head
    // merge_asof/ASOF JOIN semantics: the t=150 row wins wholesale —
    // v = NULL rides with w = "y"; per-column last(ignoreNulls) would have
    // stitched ("old" from t=90, "y" from t=150)
    assert(out.getAs[String]("v") == null)
    assert(out.getAs[String]("w") == "y")
  }

  test("asofJoin non-strict: same-timestamp right row IS eligible") {
    val left = Seq((1L, "u1", 100L)).toDF("id", "k", "t")
    val right = Seq(("u1", 100L, "eq"), ("u1", 90L, "lt"))
      .toDF("k", "rt", "v")
    val out = Relational.asofJoin(left, right, Seq("k"),
        "t", "rt", Seq("v"), strict = false).collect()
    assert(out.head.getAs[String]("v") == "eq")
  }

  test("asofJoin matches a naive per-row scan on random data") {
    val rng = new scala.util.Random(7)
    (0 until 3).foreach { _ =>
      val keys = Seq("k1", "k2", "k3")
      val left = Seq.tabulate(30)(i =>
        (i.toLong, keys(rng.nextInt(3)), rng.nextInt(50).toLong))
      val right = Seq.tabulate(40)(i =>
        (keys(rng.nextInt(3)), rng.nextInt(50).toLong, s"v$i"))
      // naive oracle: max-ts strictly-earlier right row per left row, ties
      // on (rt, v) resolved by the operator's (ts, tiebreak) ordering —
      // last in ascending (rt, v) order wins
      val expect = left.map { case (id, k, t) =>
        val cands = right.filter(r => r._1 == k && r._2 < t)
        id -> (if (cands.isEmpty) null
               else cands.maxBy(r => (r._2, r._3))._3)
      }.toMap
      val got = Relational.asofJoin(
          left.toDF("id", "k", "t"), right.toDF("k", "rt", "v"),
          Seq("k"), "t", "rt", Seq("v"), strict = true,
          rightTieBreak = Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getAs[String]("v")).toMap
      assert(got == expect)
    }
  }

  test("bandJoin: exact range pairs, no duplicates across bands") {
    val left = Seq((1L, 10L, 100L), (1L, 11L, 250L), (2L, 12L, 100L))
      .toDF("k", "lid", "lt")
    // gaps: 50 (in), 300 (in, boundary), 301 (out), wrong key (out)
    val right = Seq((1L, 20L, 150L), (1L, 21L, 400L), (1L, 22L, 551L),
      (3L, 23L, 150L)).toDF("k", "rid", "rt")
    val out = graft.ops.Relational.bandJoin(left, right, Seq("k"),
        "lt", "rt", maxGapUs = 300L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (10,20) gap 50; (10,21) gap 300 boundary-inclusive; (11,21) gap 150;
    // (11,22) gap 301 excluded; rt=150 for key 2 has no 'click' before it
    assert(out == Set((10L, 20L), (10L, 21L), (11L, 21L)))
  }

  test("chunkTokens: overlap, short docs, empty docs") {
    import graft.text.TextOps
    val docs = Seq((1L, "a b c d e f g"), (2L, "x"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextOps.chunkTokens(docs, "doc_id", "text",
        window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 0L, "a b c d"), (1L, 1L, "d e f g"),
      (1L, 2L, "g"), (2L, 0L, "x")))
  }

  test("duplicateClusters: components over chained edges") {
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {5,6}; singleton {9}
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(nodes, edges, "doc_id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 5L), (6L, 5L), (9L, 9L)))
  }

  test("duplicateClusters: cluster count matches distinct components") {
    // two triangles bridged by one edge → one component
    val nodes = (1L to 6L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(nodes, edges, "doc_id").collect()
    assert(out.map(_.getLong(1)).toSet == Set(1L))
  }

  test("duplicateClusters: star rounds resolve a 40-chain in few rounds") {
    // worst case for plain min-propagation: a path graph — O(diameter)
    // rounds naively, O(log) with large-star/small-star. maxIter = 10
    // would fail a naive propagation loop on a 40-chain.
    val n = 40L
    val nodes = (1L to n).toDF("doc_id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(nodes, edges, "doc_id", maxIter = 10)
      .collect()
    assert(out.length == 40 && out.map(_.getLong(1)).toSet == Set(1L))
  }

  test("duplicateClusters matches union-find on random graphs") {
    // driver-side union-find as an independent oracle
    def components(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min id per component root
      val byRoot = (1 to n).groupBy(find)
      (1 to n).map(i => i.toLong -> byRoot(find(i)).min.toLong).toMap
    }
    val rng = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val n = 20 + rng.nextInt(20)
      val edges = Seq.fill(rng.nextInt(25))(
        (1L + rng.nextInt(n), 1L + rng.nextInt(n)))
        .filter { case (a, b) => a != b }
      val nodes = (1L to n.toLong).toDF("doc_id")
      val got = Dedup.duplicateClusters(nodes,
          edges.toDF("a_id", "b_id"), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == components(n, edges))
    }
  }

  test("star rounds: potential strictly decreases and a double-round " +
      "fixpoint implies a single-round fixpoint (the r19 fused-loop " +
      "stop condition)") {
    // driver-side reference of EXACTLY the Spark round (large-star
    // then small-star over the directed hi>lo edge set)
    def largeStar(E: Set[(Long, Long)]): Set[(Long, Long)] = {
      val sym = E.flatMap { case (h, l) => Seq(h -> l, l -> h) }
      val nbrMin = sym.groupBy(_._1).map { case (u, vs) =>
        u -> math.min(u, vs.map(_._2).min) }
      sym.collect { case (u, v) if v > u && v != nbrMin(u) =>
        (v, nbrMin(u)) }.toSet
    }
    def smallStar(E: Set[(Long, Long)]): Set[(Long, Long)] =
      E.groupBy(_._1).flatMap { case (hi, es) =>
        val los = es.map(_._2)
        val m = los.min
        los.filter(_ != m).map(l => (l, m)) ++ Seq((hi, m))
      }.toSet
    def round(E: Set[(Long, Long)]) = smallStar(largeStar(E))
    def phi(E: Set[(Long, Long)]): Long =
      E.iterator.map { case (h, l) => h + l + 1 }.sum
    val rng = new scala.util.Random(1719)
    (0 until 50).foreach { _ =>
      val n = 5 + rng.nextInt(40)
      var e = Seq.fill(rng.nextInt(60))(
          (1L + rng.nextInt(n), 1L + rng.nextInt(n)))
        .collect { case (a, b) if a != b =>
          (math.max(a, b), math.min(a, b)) }.toSet
      var guard = 0
      var r = round(e)
      while (r != e && guard < 64) {
        // strict decrease under any non-identity round — the reason
        // round∘round(E) = E forces round(E) = E (no 2-cycles), which
        // is what lets the fused loop stop on the double-round diff
        assert(phi(r) < phi(e), s"potential did not decrease: $e -> $r")
        e = r; r = round(e); guard += 1
      }
      assert(guard < 64, "reference loop did not converge")
      // at the fixpoint the set is a star forest rooted at component
      // minima: every non-root appears exactly once as hi, and no
      // root ever appears as hi — the postcondition the mapping
      // extraction in duplicateClusters relies on
      val his = e.toSeq.map(_._1)
      assert(his.distinct.size == his.size)
      assert(his.toSet.intersect(e.map(_._2)).isEmpty)
    }
  }

  test("autoLoopWidth scales with the edge count (floor 8, cap 20k)") {
    // tiny candidate sets stay at the overhead-minimizing floor
    assert(Dedup.autoLoopWidth(0L) == 8)
    assert(Dedup.autoLoopWidth(1000000L) == 8)
    // corpus-scale edge lists widen ∝ rows (2M rows/partition)
    assert(Dedup.autoLoopWidth(100000000L) == 50)
    assert(Dedup.autoLoopWidth(10000000000L) == 5000)
    // monotone, and capped for HashPartitioner sanity
    assert(Dedup.autoLoopWidth(Long.MaxValue / 2) == 20000)
    val pts = Seq(1L, 1000000L, 50000000L, 1000000000L, 100000000000L)
      .map(Dedup.autoLoopWidth(_))
    assert(pts == pts.sorted)
  }
}
