package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 second wave: the mergeable KMV distinct sketch (merge
  * theorem, estimate accuracy, exact-below-k branch) and
  * reciprocal-rank fusion (hand-checked RRF math on a planted
  * geometry, single-list presence semantics, genuine divergence from
  * both input rankings).
  */
class Round14bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kmvRows(df: org.apache.spark.sql.DataFrame) =
    graft.queries.Round14bQueries.kmvSketch(df)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
      .sortBy(_._1)

  test("KMV merge theorem: the 8-shard merged sketch equals the " +
      "global sketch EXACTLY, for groups above and below k") {
    // group "big": 2000 distinct users (sketch branch, k=64 engages);
    // group "tiny": 30 distinct users (exact branch)
    val ev = ((0L until 2000L).map(u => ("big", u)) ++
      (0L until 30L).map(u => ("tiny", 1000000L + u)))
      .toDF("event_type", "user_id")
    val rows = kmvRows(ev)
    assert(rows.map(_._1).toSeq == Seq("big", "tiny"))
    rows.foreach { case (g, _, est, estMerged) =>
      assert(est == estMerged,
        s"group $g: merged sketch must equal the global sketch " +
          s"bit-for-bit ($est vs $estMerged)")
    }
  }

  test("KMV exact branch: below k distinct values the 'estimate' IS " +
      "the exact count") {
    val ev = (0L until 30L).map(u => ("tiny", u))
      .toDF("event_type", "user_id")
    val Seq((_, nd, est, estM)) = kmvRows(ev).toSeq
    assert(nd == 30L && est == 30.0 && estM == 30.0)
  }

  test("KMV estimate accuracy: within 3 standard errors of the true " +
      "distinct count on a 2000-value corpus (sigma ~ 1/sqrt(k-2))") {
    val ev = (0L until 2000L).map(u => ("big", u))
      .toDF("event_type", "user_id")
    val Seq((_, nd, est, _)) = kmvRows(ev).toSeq
    assert(nd == 2000L)
    val relErr = math.abs(est / 2000.0 - 1.0)
    val threeSigma = 3.0 / math.sqrt(64.0 - 2.0)
    assert(relErr < threeSigma,
      s"KMV estimate $est for 2000 distinct: rel err $relErr " +
        s"exceeds 3 sigma $threeSigma")
  }

  test("KMV k-th minimum via the bounded TopKAgg buffer equals the " +
      "sort-based k-th smallest distinct hash") {
    val users = (0L until 500L)
    val ev = users.map(u => ("g", u)).toDF("event_type", "user_id")
    val hashes = ev
      .select(expr("CAST(conv(substring(md5(cast(user_id AS string))" +
        ", 1, 15), 16, 10) AS BIGINT)").as("h"))
      .distinct().orderBy("h").as[Long].collect()
    val hk = hashes(63) // 64th smallest, 0-based
    val expected = 63.0 * 1152921504606846976L.toDouble / hk.toDouble
    val Seq((_, _, est, _)) = kmvRows(ev).toSeq
    assert(est == expected,
      s"sketch estimate $est != sort-derived $expected")
  }

  // ---------------- BM25 ----------------

  test("BM25 quantized idf: bitlen(2(N+1) div (2df+1)) equals " +
      "floor(log2((N+1)/(df+0.5))) + 1 across the (N, df) grid") {
    for (n <- Seq(1L, 2L, 10L, 500L, 5000L, 1000000L);
         df <- 1L to math.min(n, 50L)) {
      val ratio = (2 * (n + 1)) / (2 * df + 1)
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(ratio)
      val expected =
        math.floor(math.log((n + 1.0) / (df + 0.5)) / math.log(2.0))
          .toLong + 1
      assert(bitlen == expected,
        s"N=$n df=$df: bitlen $bitlen != floor-log2 ${expected}")
    }
  }

  test("BM25 score matches a driver-side replay of the quantized-idf " +
      "formula on a hand-built corpus") {
    // doc 10: 'dup' twice among 4 tokens; doc 11: 'dup' once among 8;
    // doc 12: no query terms (must not be scored)
    val docs = Seq(
      (10L, "dup dup x y"),
      (11L, "dup a b c d e f g"),
      (12L, "nothing here at all")).toDF("doc_id", "text")
    val got = graft.queries.Round14bQueries
      .bm25TopK(spark, docs, Seq((1L, 1, "dup")), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(_._2)
    // N=3, S=16, df=2: idf = bitlen((2*4)/(5)) = bitlen(1) = 1
    def c(tf: Long, dl: Long): Double =
      1.0.toLong.toDouble * ((44L * 16L * tf).toDouble /
        (20L * 16L * tf + 6L * 16L + 18L * 3L * dl).toDouble)
    val s10 = c(2, 4)  // tf=2, dl=4
    val s11 = c(1, 8)
    assert(s10 > s11, "higher tf + shorter doc must outrank")
    assert(got.toSeq == Seq((1L, 1L, 10L, s10), (1L, 2L, 11L, s11)),
      s"got ${got.toSeq}, expected scores ($s10, $s11)")
  }

  test("BM25 length normalization: same tf, longer doc scores " +
      "strictly lower; absent slot contributes exactly 0.0") {
    val docs = Seq(
      (1L, "dup spark a b"),
      (2L, "dup spark a b c d e f g h i j k l m n o p q r s t u v w")
    ).toDF("doc_id", "text")
    val got = graft.queries.Round14bQueries
      .bm25TopK(spark, docs,
        Seq((1L, 1, "dup"), (1L, 2, "spark"), (1L, 3, "zzznotpresent")),
        k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) > got(2L),
      s"short doc must outrank long at equal tf: $got")
    // the missing third term must not shift scores: recompute with
    // only the two real slots — identical
    val got2 = graft.queries.Round14bQueries
      .bm25TopK(spark, docs,
        Seq((1L, 1, "dup"), (1L, 2, "spark")), k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(got == got2, "an absent term's slot must contribute 0.0")
  }

  // ---------------- label propagation ----------------

  test("LPA separates two cliques joined by a bridge edge — where " +
      "connected components (min-label propagation) merges them") {
    val edges = (for {
      s <- Seq(Seq(1L, 2L, 3L, 4L), Seq(11L, 12L, 13L, 14L))
      a <- s; b <- s if a < b
    } yield (a, b)) :+ ((4L, 11L))
    val und = edges.toDF("a", "b")
    val got = graft.queries.Round14bQueries
      .labelProp(spark, und, rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 4L, 1L), (11L, 4L, 11L)),
      s"expected the two 4-cliques as separate communities: $got")
    // contrast: CC merges everything through the bridge
    val nodes = und.select($"a".as("id"))
      .unionByName(und.select($"b".as("id"))).distinct()
    val cc = graft.dedup.Dedup
      .duplicateClusters(nodes,
        und.select($"a".as("a_id"), $"b".as("b_id")), "id")
      .select("cluster_id").distinct().count()
    assert(cc == 1L, "CC must see one component through the bridge")
  }

  test("LPA deterministic tie-break: a triangle converges to the " +
      "minimum node's label; a single edge is the known synchronous " +
      "2-cycle (back to self-labels after an even round count)") {
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val gotTri = graft.queries.Round14bQueries
      .labelProp(spark, tri, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotTri == Set((1L, 3L)),
      s"triangle must converge to community 1 of size 3: $gotTri")
    val edge = Seq((7L, 9L)).toDF("a", "b")
    val gotEdge = graft.queries.Round14bQueries
      .labelProp(spark, edge, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotEdge == Set((7L, 1L), (9L, 1L)),
      "single edge: synchronous LPA oscillates with period 2, so an " +
        s"even round count returns self-labels: $gotEdge")
  }

  // ---------------- modularity ----------------

  test("modularity of the bridged 4-cliques pins the textbook value " +
      "Q = 286/676, with exact per-community integer numerators") {
    val edges = (for {
      s <- Seq(Seq(1L, 2L, 3L, 4L), Seq(11L, 12L, 13L, 14L))
      a <- s; b <- s if a < b
    } yield (a, b)) :+ ((4L, 11L))
    val got = graft.queries.Round14bQueries
      .modularity(spark, edges.toDF("a", "b"), rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1)
    // m = 13; each clique: e_in = 6, d_tot = 3+3+3+4 = 13,
    // q_num = 4*13*6 - 169 = 143; Q = 286 / (4*169)
    val q = 286.0 / 676.0
    assert(got.toSeq == Seq((1L, 4L, 6L, 13L, 143L, q),
      (11L, 4L, 6L, 13L, 143L, q)), s"got ${got.toSeq}")
  }

  test("modularity of a single all-in-one community is exactly 0 " +
      "(the classic whole-graph-as-one-cluster property)") {
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val got = graft.queries.Round14bQueries
      .modularity(spark, tri, rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4),
        r.getDouble(5)))
    // LPA converges the triangle to one community (label 1):
    // m = 3, e_in = 3, d_tot = 6 -> q_num = 36 - 36 = 0, Q = 0.0
    assert(got.toSeq == Seq((1L, 3L, 0L, 0.0)), s"got ${got.toSeq}")
  }

  // ---------------- KMV set operations ----------------

  test("KMV set ops: the union estimate from two TRUNCATED sketches " +
      "EQUALS the sketch estimate of the raw union (sketch-of-union " +
      "theorem), and both estimates land within 3 sigma of truth") {
    // A = 0..999, B = 500..1499: |A u B| = 1500, |A n B| = 500
    val ev = ((0L until 1000L).map(u => ("A", u)) ++
      (500L until 1500L).map(u => ("B", u)))
      .toDF("event_type", "user_id")
    val ops = graft.queries.Round14bQueries.kmvSetOps(ev)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3)))
    assert(ops.length == 1)
    val (_, _, unionEst, intEst) = ops.head
    // the raw union sketched directly (every user under ONE group)
    val merged = graft.queries.Round14bQueries
      .kmvSketch(ev.select(lit("U").as("event_type"), $"user_id"))
      .collect().map(r => r.getDouble(2)).head
    assert(unionEst == merged,
      s"union-of-sketches $unionEst != sketch-of-union $merged")
    val sigma = 1500.0 / math.sqrt(64.0 - 2.0)
    assert(math.abs(unionEst - 1500.0) < 3 * sigma,
      s"union est $unionEst vs 1500")
    // inclusion-exclusion compounds three estimates' errors
    assert(math.abs(intEst - 500.0) < 5 * sigma,
      s"intersect est $intEst vs 500")
  }

  test("KMV set ops exact branch: two complete (sub-k) sketches give " +
      "EXACT union and intersection cardinalities") {
    // A = 0..19 (20 users), B = 10..39 (30 users): union 40, int 10
    val ev = ((0L until 20L).map(u => ("A", u)) ++
      (10L until 40L).map(u => ("B", u)))
      .toDF("event_type", "user_id")
    val Seq((_, _, u, i)) = graft.queries.Round14bQueries
      .kmvSetOps(ev)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    assert(u == 40.0 && i == 10.0,
      s"sub-k sketches are complete sets — expected exact (40, 10), " +
        s"got ($u, $i)")
  }

  // ---------------- alignment-free duplicated-run scrub ----------------

  private def scrubRows(docs: org.apache.spark.sql.DataFrame) =
    graft.queries.Round14bQueries.overlapScrub(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  private def sigOf(s: String): Long =
    Seq(Tuple1(s)).toDF("x")
      .select(graft.queries.Digest.strSig(col("x"))).as[Long].head()

  test("overlap scrub: a 10-token run shared at DIFFERENT offsets is " +
      "removed from both docs as one island each, and the rebuilt " +
      "text drops exactly that run") {
    val run = (0 until 10).map(i => s"run$i").mkString(" ")
    val d1 = s"$run a1 a2 a3 a4 a5"          // run at offset 0
    val d2 = s"b1 b2 b3 b4 $run b5 b6"       // run at offset 4
    val rows = scrubRows(Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"))
    assert(rows(1L) == ((15L, 1L, 10L, 5L, sigOf("a1 a2 a3 a4 a5"))),
      s"doc1: ${rows(1L)}")
    assert(rows(2L) == ((16L, 1L, 10L, 6L, sigOf("b1 b2 b3 b4 b5 b6"))),
      s"doc2: ${rows(2L)}")
  }

  test("overlap scrub catches a chunk-straddling duplicated run that " +
      "the chunk-aligned spanScrub cannot see") {
    // 8-token run at positions 4..11 in both docs: straddles the
    // 0-7 / 8-15 chunk boundary; surroundings unique per doc so no
    // aligned 8-token chunk is shared
    val run = (0 until 8).map(i => s"shared$i").mkString(" ")
    val d1 = s"u1 u2 u3 u4 $run u5 u6 u7 u8"
    val d2 = s"v1 v2 v3 v4 $run v5 v6 v7 v8"
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val rows = scrubRows(docs)
    assert(rows(1L)._3 == 8L && rows(2L)._3 == 8L,
      s"sliding scrub must mark the straddling run: $rows")
    val aligned = graft.dedup.Dedup
      .spanScrub(docs, "doc_id", "text", spanTokens = 8, minDocs = 2)
      .agg(sum($"n_removed")).as[Long].head()
    assert(aligned == 0L,
      "chunk-aligned scrub must MISS the straddling run — that gap " +
        "is this operator's reason to exist")
  }

  test("overlap scrub islands: runs at gap 8 (adjacent) merge into " +
      "one island; gap 9 stays two islands") {
    def doc(gap: Int, tag: String) = {
      val r1 = (0 until 8).map(i => s"x$i").mkString(" ")
      val r2 = (0 until 8).map(i => s"y$i").mkString(" ")
      val fill = (0 until (gap - 8)).map(i => s"$tag$i").mkString(" ")
      if (gap == 8) s"$r1 $r2" else s"$r1 $fill $r2"
    }
    // two docs sharing both runs; fillers differ so only the runs dup
    val adj = scrubRows(Seq((1L, doc(8, "p") + " ptail1 ptail2"),
      (2L, doc(8, "q") + " qtail1 qtail2")).toDF("doc_id", "text"))
    assert(adj(1L)._2 == 1L && adj(1L)._3 == 16L,
      s"adjacent runs must merge into one island: ${adj(1L)}")
    val far = scrubRows(Seq((1L, doc(9, "p")), (2L, doc(9, "q")))
      .toDF("doc_id", "text"))
    assert(far(1L)._2 == 2L && far(1L)._3 == 16L,
      s"gap-9 runs must stay two islands: ${far(1L)}")
  }

  test("overlap scrub NULL-vs-empty parity: a fully-duplicated doc " +
      "keeps zero tokens and signs the EMPTY string") {
    val txt = (0 until 12).map(i => s"t$i").mkString(" ")
    val rows = scrubRows(Seq((1L, txt), (2L, txt)).toDF("doc_id", "text"))
    assert(rows(1L) == ((12L, 1L, 12L, 0L, sigOf(""))),
      s"fully-duplicated doc: ${rows(1L)}")
  }

  // ---------------- streaming KMV ----------------

  test("kmvInsert fold is order-insensitive and equals " +
      "sorted-distinct-take-k — the theorem the streaming sketch " +
      "rides (randomized)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val xs = Vector.fill(300)(rnd.nextLong(1000L))
      val expected = xs.distinct.sorted.take(64)
      val folded = xs.foldLeft(Vector.empty[Long])(
        graft.streaming.Streams.kmvInsert(_, _, 64))
      val foldedRev = xs.reverse.foldLeft(Vector.empty[Long])(
        graft.streaming.Streams.kmvInsert(_, _, 64))
      assert(folded == expected && foldedRev == expected,
        s"fold ${folded.take(5)}... != sorted-take-k")
      assert(folded.size <= 64)
    }
  }

  test("streaming KMV over the static corpus reproduces the BATCH " +
      "sketch row for row (including the estimate's exact bits)") {
    val d = "/root/testdata/sf0.01"
    val batch = graft.queries.Round14bQueries
      .kmvSketch(Tables.events(spark, d)
        .select($"event_type", $"user_id"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    val schema = Tables.eventsRaw(spark, d).schema
    val streamed = graft.streaming.Streams.runToMemoryAppend(spark,
        s"spec_stream_kmv_${System.nanoTime()}") { scoped =>
      val stream = graft.streaming.Streams.fileStream(scoped,
        s"$d/events.*", schema, maxFilesPerTrigger = Int.MaxValue)
      graft.streaming.Streams.streamingKmv(stream, 64,
        1152921504606846976L)
    }.collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(streamed == batch,
      s"streamed $streamed != batch $batch")
  }

  // ---------------- interval overlap join ----------------

  private def randIntervals(seed: Int, n: Int, idCol: String,
      sCol: String, eCol: String) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val s = 1700000000000000L + rnd.nextLong(3600L * 1000000L)
      // sub-second spans up to minutes, plus a 50x outlier
      val span = if (i == 7) 50L * 60L * 1000000L
        else 1000L + rnd.nextLong(90L * 1000000L)
      (i.toLong, new java.sql.Timestamp(s / 1000L),
        new java.sql.Timestamp((s + span) / 1000L))
    }.toDF(idCol, sCol, eCol)
  }

  test("intervalOverlapJoin equals the naive theta join pair for " +
      "pair on a randomized fixture with a 50x span outlier — and " +
      "each pair appears EXACTLY once (no hidden dedup)") {
    val a = randIntervals(1, 60, "a_id", "a_start", "a_end")
    val b = randIntervals(2, 60, "b_id", "b_start", "b_end")
    val got = graft.ops.Relational
      .intervalOverlapJoin(a, b, "a_start", "a_end", "b_start", "b_end")
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = a.join(b,
        $"a_start" < $"b_end" && $"b_start" < $"a_end")
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == naive.sorted,
      s"${got.size} pairs vs naive ${naive.size}")
    assert(got.size == got.distinct.size,
      "a pair must survive in exactly one bucket — duplicates mean " +
        "the later-start dedup rule broke")
  }

  test("intervalOverlapJoin half-open semantics: touching intervals " +
      "(a_end == b_start) do NOT pair; 1-millisecond overlap does") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    val t0 = 1700000000000000L
    val a = Seq((1L, ts(t0), ts(t0 + 5000000L)))
      .toDF("a_id", "a_start", "a_end")
    val touching = Seq((1L, ts(t0 + 5000000L), ts(t0 + 9000000L)))
      .toDF("b_id", "b_start", "b_end")
    val overlap1us = Seq((2L, ts(t0 + 4999000L), ts(t0 + 9000000L)))
      .toDF("b_id", "b_start", "b_end")
    assert(graft.ops.Relational.intervalOverlapJoin(a, touching,
      "a_start", "a_end", "b_start", "b_end").count() == 0L)
    assert(graft.ops.Relational.intervalOverlapJoin(a, overlap1us,
      "a_start", "a_end", "b_start", "b_end").count() == 1L)
  }

  test("intervalOverlapJoin plans as an equi join — no " +
      "BroadcastNestedLoopJoin (the naive predicate's plan)") {
    val a = randIntervals(3, 20, "a_id", "a_start", "a_end")
    val b = randIntervals(4, 20, "b_id", "b_start", "b_end")
    val plan = graft.ops.Relational
      .intervalOverlapJoin(a, b, "a_start", "a_end", "b_start", "b_end")
      .queryExecution.executedPlan.toString
    // the 1-row width scalar rides broadcast CROSS joins (the scalar
    // onto each side + the wl×wr combine, ≤ 4 nodes, all single-row
    // builds); the PAIR join itself must be a hash/merge EQUI join,
    // and no INNER nest-loop (the naive predicate's plan) may appear
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 4, s"only the width-scalar cross joins may " +
      s"nest-loop (found $bnlj):\n$plan")
    plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
        assert(l.contains("Cross"),
          s"non-Cross nest-loop join found: $l")
      }
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"),
      s"the interval-overlap join must be an equi join:\n$plan")
  }

  // ---------------- filtered IVF ----------------

  test("filtered IVF at nProbe = nCells equals brute force over the " +
      "filtered subset exactly — and the index is SHARED (centroids " +
      "come from the full corpus, not the predicate's subset)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val cents = graft.similarity.Knn
      .md5Centroids(emb, "vec_id", "embedding", nCells = 16)
    val centLabels = emb.filter($"vec_id".isin(
        cents.map(_._1).toSeq: _*))
      .select($"label").as[Int].collect().toSet
    assert(centLabels.exists(_ != 3),
      "centroids must sample the FULL corpus — an all-label-3 " +
        "centroid set means the index was built per predicate")
    val filtered = emb.filter($"label" === 3)
    val qs = emb.filter($"vec_id" < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exhaustive = rows(graft.similarity.Knn.ivfTopKWithCentroids(
      filtered, qs, "vec_id", "embedding", 5, cents.toSeq,
      nProbe = 16))
    val brute = rows(graft.similarity.Knn.bruteForceTopK(
      filtered, qs, "vec_id", "embedding", 5))
    assert(exhaustive == brute,
      "probing every cell must degenerate to exact filtered brute")
  }

  // ---------------- grid radius join ----------------

  test("gridNeighborJoin equals the naive quadratic radius join pair " +
      "for pair on random points — each pair exactly once — and the " +
      "boundary (dist == eps) and cell-straddling pairs are kept") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 150).map(i =>
      (i.toLong, rnd.nextDouble() * 0.4 - 0.2,
        rnd.nextDouble() * 0.4 - 0.2))
    // planted: exact-eps pair (ids 900, 901) and a cell-straddling
    // pair hugging a multiple-of-eps boundary (ids 902, 903)
    val eps = 0.05
    // x1 = 0.0 so dx is the LITERAL double 0.05 and dx*dx equals
    // eps*eps bit for bit (0.3+eps would carry rounding past eps)
    val planted = Seq((900L, 0.0, 0.3), (901L, eps, 0.3),
      (902L, 0.0999, 0.0), (903L, 0.1001, 0.0))
    val pts = (base ++ planted).toDF("id", "x", "y")
    val got = graft.ops.Relational
      .gridNeighborJoin(pts, "id", "x", "y", eps)
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = pts.as("a").join(pts.as("b"),
        col("a.id") < col("b.id") &&
          (col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
          (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))
          <= lit(eps * eps))
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == naive.sorted,
      s"grid ${got.size} pairs vs naive ${naive.size}")
    assert(got.size == got.distinct.size,
      "3x3-probe x single-cell-target must yield each pair once")
    assert(got.contains((900L, 901L)),
      "a pair at EXACTLY eps distance must be kept (<=)")
    assert(got.contains((902L, 903L)),
      "a pair straddling a cell boundary must be found by the " +
        "neighborhood probe")
  }

  // ---------------- Gopher rules ----------------

  test("Gopher rules: each rule trips on its planted violator and " +
      "ONLY that rule trips (attribution), and the conjunction " +
      "keeps the clean doc") {
    val clean = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the of and"  // 63 words, all alpha, 3 stop words
    val docs = Seq(
      (1L, clean),
      (2L, (1 to 10).map(i => s"w$i").mkString(" ")),   // too short
      (3L, clean.replace("word", "superduperlongword")), // mean len > 10
      (4L, (1 to 60).map(_ => "1234").mkString(" ") + " the of and"),
      (5L, (1 to 60).map(_ => "#").mkString(" ") + " the of and"),
      (6L, (1 to 63).map(i => s"word$i").mkString(" ")) // no stops
    ).toDF("doc_id", "text")
    // drive the registered fn by writing the fixture as a parquet dir
    val tmp = java.nio.file.Files
      .createTempDirectory("gopher_fixture").toFile
    docs.write.mode("overwrite")
      .parquet(s"${tmp.getAbsolutePath}/documents.parquet")
    val rows = graft.SparkEntry
      .queries("curate_gopher_rules")(spark, tmp.getAbsolutePath)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7)))).toMap
    // (wc, mean_len, alpha, symbol, stopword, keep)
    assert(rows(1L) == ((true, true, true, true, true, true)))
    assert(rows(2L)._1 == false && rows(2L)._6 == false)
    assert(rows(3L)._2 == false && rows(3L)._1,
      s"doc3 must fail ONLY mean-length: ${rows(3L)}")
    assert(rows(4L)._3 == false && rows(4L)._1 && rows(4L)._2,
      s"doc4 (all-numeric words) must fail ONLY alpha: ${rows(4L)}")
    assert(rows(5L)._4 == false,
      s"doc5 (hash soup) must fail the symbol ratio: ${rows(5L)}")
    assert(rows(6L)._5 == false && rows(6L)._1,
      s"doc6 must fail ONLY stop-words: ${rows(6L)}")
  }

  // ---------------- collocations ----------------

  test("collocation lift: rows come back lift-descending and the top " +
      "bigram's lift equals an independent driver-side replay from " +
      "raw unigram/bigram counts") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("t_collocations")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 15)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq,
      "rows must come back lift-descending")
    // independent replay of the top row's lift from raw counts
    val (bigram, nAb, lift) = rows.head
    val Array(w1, w2) = bigram.split(" ")
    val toks = Tables.documents(spark, d)
      .select($"doc_id", posexplode(split(trim($"text"), "\\s+"))
        .as(Seq("p", "tok")))
    val nUni = toks.count()
    val nA = toks.filter($"tok" === w1).count()
    val nB = toks.filter($"tok" === w2).count()
    val nBi = toks.groupBy($"doc_id").agg(count(lit(1)).as("c"))
      .agg(sum($"c" - 1L)).as[Long].head()
    val expected = (nAb * nUni * nUni).toDouble /
      (nA * nB * nBi).toDouble
    assert(lift == expected,
      s"top bigram '$bigram': lift $lift != replayed $expected")
  }

  // ---------------- count-min sketch ----------------

  test("CMS never undercounts: est >= true for every queried key on " +
      "natural data, with equality exactly when the key's 4 cells " +
      "are collision-free") {
    val rows = graft.SparkEntry
      .queries("agg_cms_topk")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, t, e) =>
      assert(e >= t, s"CMS undercounted key $k: est $e < true $t — " +
        "impossible for a min-of-sums sketch; the hash derivation " +
        "must have diverged between build and query")
    }
  }

  /** 2-D fixture where cosine (angle) and MIPS (magnitude) genuinely
    * disagree: queries near the x-axis; corpus has a long vector at
    * 45 degrees (dot winner) and short vectors hugging the x-axis
    * (cosine winners).
    */
  private def rrfFixture = Seq(
    (0L, Array(10.0f, 0.1f)),   // query
    (1L, Array(1.0f, 0.0f)),    // cosine winner, tiny dot
    (2L, Array(100.0f, 100.0f)), // dot winner, mediocre cosine
    (3L, Array(2.0f, 0.1f)),    // strong on both
    (4L, Array(0.0f, 1.0f))     // orthogonal: bottom of both lists
  ).toDF("vec_id", "embedding")

  test("RRF fuses the two rankings with the hand-checked 1/(60+r) " +
      "math — an item strong on BOTH lists beats single-list winners") {
    val emb = rrfFixture
    val got = graft.queries.Round14bQueries
      .hybridRrf(emb, emb.filter($"vec_id" === 0L), "vec_id",
        "embedding", kEach = 2, kOut = 4)
      .collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
      .sortBy(_._2)
    // cosine ranks (angle to ~x-axis): 1st id=1, 2nd id=3
    // dot ranks (magnitude * alignment): 1st id=2, 2nd id=3
    // fused: id3 = 1/62+1/62; id1 = 1/61; id2 = 1/61 (tie -> id asc)
    val id3 = 1.0 / 62.0 + 1.0 / 62.0
    val id1 = 1.0 / 61.0
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((3L, 1L), (1L, 2L), (2L, 3L)),
      s"fused order wrong: ${got.toSeq}")
    assert(got(0)._3 == id3 && got(1)._3 == id1 && got(2)._3 == id1)
  }

  test("RRF single-list presence: an item in only one ranker's " +
      "top-k still surfaces, with the absent rank contributing " +
      "exactly zero") {
    val emb = rrfFixture
    val got = graft.queries.Round14bQueries
      .hybridRrf(emb, emb.filter($"vec_id" === 0L), "vec_id",
        "embedding", kEach = 2, kOut = 4)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    // id=1 is cosine-only (dot list = {2, 3}), id=2 is dot-only
    assert(got(1L) == 1.0 / 61.0 && got(2L) == 1.0 / 61.0)
    assert(!got.contains(4L), "orthogonal vector must miss both lists")
  }

  test("RRF end-to-end consistency on the natural corpus: every " +
      "fused score is EXACTLY the 1/(60+r) sum recomputed from the " +
      "two input rank lists (an independent driver-side replay)") {
    // NOTE the synthetic natural embeddings have near-constant norms,
    // so the dot and cosine orders mostly agree there and fusion can
    // coincide with one input list — the planted-fixture test above
    // is the reordering proof; this one pins the fusion ARITHMETIC
    // against a driver-side replay over natural data
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.filter($"vec_id" < 10)
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val cos = ranks(graft.similarity.Knn
      .bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"rank"))
    val dot = ranks(graft.similarity.Knn
      .mipsTopK(emb, qs, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"rank"))
    val fused = graft.queries.Round14bQueries
      .hybridRrf(emb, qs, "vec_id", "embedding", 10, 5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    assert(fused.length == 50)
    fused.foreach { case (key, score) =>
      val expected =
        cos.get(key).map(r => 1.0 / (60.0 + r.toDouble)).getOrElse(0.0) +
        dot.get(key).map(r => 1.0 / (60.0 + r.toDouble)).getOrElse(0.0)
      assert(score == expected,
        s"$key: fused $score != replayed $expected")
      assert(cos.contains(key) || dot.contains(key),
        s"$key surfaced without appearing in either input list")
    }
  }
}
