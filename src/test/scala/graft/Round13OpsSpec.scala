package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13: the cap-off clique fast path (no Window/observe plumbing on
  * the verified-pair default), large-star/small-star connected
  * components (O(log n) rounds on adversarial chains), the
  * full-width band-mask fix, and stable observe names.
  */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("cap-off fast path: maxBucket = Int.MaxValue plans NO Window and " +
      "NO CollectMetrics; the capped path plans both") {
    val docs = docsOf((0L until 20L).map(i => (i, s"doc $i body " +
      (0 to 6).map(j => s"t${i}_$j").mkString(" "))))
    val fast = Dedup.minhashCandidatesPortable(docs, "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 4, maxBucket = Int.MaxValue)
    val fastPlan = fast.queryExecution.optimizedPlan.toString
    assert(!fastPlan.contains("Window") &&
      !fastPlan.contains("CollectMetrics"),
      s"uncapped path must carry zero cap plumbing:\n$fastPlan")
    val capped = Dedup.minhashCandidatesPortable(docs, "doc_id", "text",
      shingleN = 3, bands = 4, rowsPerBand = 4, maxBucket = 0)
    val cappedPlan = capped.queryExecution.optimizedPlan.toString
    assert(cappedPlan.contains("Window") &&
      cappedPlan.contains("CollectMetrics"),
      s"capped path lost its count/observe machinery:\n$cappedPlan")
  }

  test("cap-off fast path produces the identical pair set as the " +
      "explicit huge-cap clique") {
    // families of exact dups => same buckets in every band; a huge
    // FINITE cap (old shape, cap never engages) must equal the
    // Int.MaxValue fast path bit-for-bit
    val docs = docsOf((0L until 24L).map { i =>
      (i, s"family${i % 4} alpha bravo charlie delta echo foxtrot " +
        "golf hotel india juliet")
    })
    def pairs(maxBucket: Int) =
      Dedup.minhashCandidatesPortable(docs, "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2, maxBucket = maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaFast = pairs(Int.MaxValue)
    val viaHugeCap = pairs(1000000)
    assert(viaFast == viaHugeCap && viaFast.nonEmpty)
  }

  test("observe metric name is the stable per-generator label") {
    val captured = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.keys.filter(_.startsWith("lsh_cap_"))
          .foreach(captured.add)
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val spam = docsOf((0L until 300L).map(i => (i, "identical spam wall")))
      Dedup.minhashCandidates(spam, "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 2).count()
      val deadline = System.currentTimeMillis() + 20000
      while (!captured.contains("lsh_cap_minhash") &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(captured.contains("lsh_cap_minhash"),
        s"expected the stable observe name, got $captured")
    } finally spark.listenerManager.unregister(listener)
  }

  test("phashBandMasks: maxHamming = 0 at full 64-bit width yields the " +
      "single all-ones mask, never an all-zero band") {
    for (n <- Seq(2L, 1000L, 10000000L, 1L << 40)) {
      val masks = Dedup.phashBandMasks(n, maxHamming = 0, hashBits = 64)
      assert(masks.forall(_ != 0L),
        s"n=$n produced an all-zero band mask: $masks")
      // t = 0 means exact equality: every returned band must cover all
      // 64 bits, so two sigs collide iff they are identical
      assert(masks.forall(_ == -1L), s"n=$n masks $masks")
    }
    // the 60-bit variant was never at risk (shift < 64) — pin it anyway
    val m60 = Dedup.phashBandMasks(1000000L, maxHamming = 0, hashBits = 60)
    assert(m60.forall(_ == (1L << 60) - 1L))
  }

  test("simhashCandidates(maxHamming = 0) = exact-signature groups " +
      "(the path the 64-bit mask bug would have exploded)") {
    val docs = docsOf(Seq(
      (0L, "alpha bravo charlie delta"), (1L, "alpha bravo charlie delta"),
      (2L, "totally different text body here"),
      (3L, "yet another unrelated document")))
    val pairs = Dedup.simhashCandidates(docs, "doc_id", "text",
        maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("duplicateClusters: 200-deep chain converges within 2*log2(n) " +
      "star rounds with exact components") {
    val n = 200L
    val nodes = (1L to n).toDF("doc_id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // 2*ceil(log2(200)) = 16: plain min-propagation would need ~200
    // rounds; large-star/small-star must land far inside this budget
    val out = Dedup.duplicateClusters(nodes, edges, "doc_id", maxIter = 16)
      .collect()
    assert(out.length == 200 && out.map(_.getLong(1)).toSet == Set(1L))
  }

  // (random-graph equivalence vs a driver union-find is already pinned
  // by AsofClusterSpec "duplicateClusters matches union-find on random
  // graphs" — the star rewrite runs under that same property)

  test("semDedupHierarchical: no vector dropped, twins co-assigned and " +
      "pruned, cells are sub-centroid ids") {
    // 4 well-separated direction families × 60 vectors + exact twins:
    // big enough that k = ceil(240/128) = 2 sub-cells and 2 supers, so
    // the two-level routing genuinely routes
    val dim = 8
    val vecs = (0L until 240L).map { i =>
      val fam = (i % 4).toInt
      val v = Array.tabulate(dim)(j =>
        if (j == fam * 2) 1.0f
        else if (j == fam * 2 + 1) (0.1f * ((i % 7) + 1))
        else 0.001f * ((i + j) % 5))
      (i, v)
    }
    // plant an exact twin pair inside family 0 (ids 1000, 1001 copy id 0)
    val all = vecs ++ Seq((1000L, vecs.head._2.clone()),
      (1001L, vecs.head._2.clone()))
    val df = all.toDF("vec_id", "embedding")
    val out = Dedup.semDedupHierarchical(df, "vec_id", "embedding",
        threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // no vector dropped by the routing — one output row per input
    assert(out.length == all.length &&
      out.map(_._1).toSet == all.map(_._1).toSet)
    // identical vectors route identically (any deterministic argmax) and
    // the lower id is kept, the twins dropped
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(0L)._2 == byId(1000L)._2 && byId(0L)._2 == byId(1001L)._2)
    assert(byId(0L)._3 && !byId(1000L)._3 && !byId(1001L)._3)
  }

  test("Graph.kcore: cascading peel isolates the K4, extra rounds are " +
      "no-ops, and convergence fits the oracle's 6-round unroll") {
    // P² path on 10..17 (each vertex tied to the next two): ends have
    // degree 2 and drop in round 1, which pushes their neighbors below
    // 3 — a genuine multi-round cascade that annihilates the whole
    // path. The disjoint K4 on 1..4 is 3-regular and immune.
    val path = (10L to 16L).map(i => (i, i + 1)) ++
      (10L to 15L).map(i => (i, i + 2))
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val und = (path ++ k4).toDF("a", "b")
    val core = graft.ops.Graph.kcore(und, k = 3, maxRounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // fixed-round unroll ≡ fixpoint: more rounds change nothing (the
    // property that makes the DuckDB 6-round oracle exact even though
    // the Spark loop early-exits)
    val more = graft.ops.Graph.kcore(und, k = 3, maxRounds = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == core)
    // under-provisioned rounds = the partial peel, NOT an error: after
    // 1 round only the two path ends (10, 17) are gone
    val r1 = graft.ops.Graph.kcore(und, k = 3, maxRounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(r1 == ((11L to 16L).toSet ++ Set(1L, 2L, 3L, 4L)))
  }

  test("Graph.commonNeighbors: scores non-adjacent pairs only, honors " +
      "minCommon, and hub suppression drops wedges through fat mids") {
    // 1 and 2 both tie to mids 3 and 4 (common = 2, non-adjacent);
    // 5 ties only to 3 (so (1,5) and (2,5) have common = 1); 3-4 edge
    // makes (3, 4) adjacent even though they share neighbors 1 and 2
    val und = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 5L),
      (3L, 4L)).toDF("a", "b")
    def scores(maxMid: Int, minCommon: Long) =
      graft.ops.Graph.commonNeighbors(und, maxMid, minCommon)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
    val s2 = scores(64, 2L)
    assert(s2 == Map((1L, 2L) -> 2L),
      s"adjacent (3,4) and sub-threshold pairs must be excluded: $s2")
    // minCommon = 1 also surfaces the single-wedge pairs — including
    // (4, 5) through mid 3 — but never an adjacent pair
    val s1 = scores(64, 1L)
    assert(s1((1L, 2L)) == 2L && s1((1L, 5L)) == 1L &&
      s1((2L, 5L)) == 1L && s1((4L, 5L)) == 1L &&
      !s1.contains((3L, 4L)) && !s1.contains((1L, 3L)))
    // hub cap 3: mid 3 has degree 4 (1, 2, 4, 5) and is suppressed, so
    // every remaining wedge routes through 4 (degree 3) — (1, 2) keeps
    // one wedge, the 5-pairs vanish with their only mid
    val capped = scores(3, 1L)
    assert(capped == Map((1L, 2L) -> 1L),
      s"fat mid 3 must be suppressed: $capped")
  }

  test("Relational.intervalJoin: pair-identical to the naive non-equi " +
      "predicate on a randomized fixture, incl. boundary and empty " +
      "intervals") {
    val rnd = new scala.util.Random(13)
    val W = 100L // bucketSeconds
    // SUB-SECOND millis everywhere: whole-second bucket arithmetic
    // would close an interval ending at hh:mm:ss.500 one bucket early
    // and silently drop its tail's matches (the bug class this spec
    // guards — points keep sub-second parts too so boundary compares
    // exercise microsecond resolution)
    // interval lengths 0..6 buckets, including empty (len = 0),
    // exact-boundary (start/end on a bucket edge), and sub-second
    // overhang (end = edge + fractional second) cases; every 4th
    // interval is bucket-ALIGNED so aligned-end + overhang (the exact
    // configuration whole-second arithmetic gets wrong) is guaranteed
    // present, not left to chance
    val ivRows = (0L until 80L).map { i =>
      val st = if (i % 4 == 0) rnd.nextLong(50L) * 100L
               else rnd.nextLong(5000L)
      val len = rnd.nextLong(7L) * 100L * (if (i % 5 == 0) 0L else 1L)
      val overhangMs = if (i % 3 == 0) rnd.nextLong(1000L) else 0L
      (i, st * 1000L, (st + len) * 1000L +
        (if (len == 0L) 0L else overhangMs))
    }
    val intervals = ivRows.map { case (i, sMs, eMs) =>
      (i, new java.sql.Timestamp(sMs), new java.sql.Timestamp(eMs))
    }.toDF("iv_id", "iv_start", "iv_end")
    // adversarial witnesses per interval: one point just INSIDE the
    // end (in the sub-second tail when an overhang exists — under
    // whole-second bucketing that tail's bucket is never generated)
    // and one exactly AT the end (outside, must never match)
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
    val bucketized = graft.ops.Relational.intervalJoin(
        points, intervals, "p_ts", "iv_start", "iv_end", W)
      .select($"p_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        $"p_ts" >= $"iv_start" && $"p_ts" < $"iv_end")
      .select($"p_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketized == naive && naive.nonEmpty)
  }

  test("Relational.intervalJoin plans an equi join — never the " +
      "BroadcastNestedLoopJoin the bare range predicate produces") {
    val points = (0L until 10L).map(i =>
      (i, new java.sql.Timestamp(i * 1000L))).toDF("p_id", "p_ts")
    val intervals = Seq((0L,
      new java.sql.Timestamp(0L), new java.sql.Timestamp(5000L)))
      .toDF("iv_id", "iv_start", "iv_end")
    val bucketized = graft.ops.Relational.intervalJoin(
      points, intervals, "p_ts", "iv_start", "iv_end", 100L)
    val plan = bucketized.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucketized interval join must be an equi join:\n$plan")
    val naivePlan = points.join(intervals,
        $"p_ts" >= $"iv_start" && $"p_ts" < $"iv_end")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      "control: the bare range predicate is expected to plan as BNLJ " +
        s"(if Spark ever learns better, drop this control):\n$naivePlan")
  }

  test("curate_line_dedup: corpus-wide vs cohort vs unique lines, " +
      "incl. the all-boilerplate null-md5 path") {
    // docs 1 and 8 share a body AND a footer cohort (both % 7 == 1):
    // every one of their lines is boilerplate -> null clean_md5;
    // doc 0 keeps body + footer (both unique), loses only the promo
    val tmp = java.nio.file.Files
      .createTempDirectory("linededup").toFile
    try {
      Seq((0L, "unique body zero"), (1L, "twin body"), (8L, "twin body"))
        .toDF("doc_id", "text")
        .write.parquet(s"${tmp.getAbsolutePath}/documents.parquet")
      val out = SparkEntry.queries("curate_line_dedup")(
          spark, tmp.getAbsolutePath)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
      val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest("unique body zero\ncopyright footer 0".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(out(0L) == ((2L, 1L, Some(expectedMd5))))
      assert(out(1L) == ((0L, 3L, None)) && out(8L) == ((0L, 3L, None)))
    } finally graft.queries.Scratch.rmTree(tmp)
  }

  test("winnowFingerprints: the MOSS guarantee — docs sharing >= " +
      "k+w-1 = 11 normalized chars share a fingerprint; disjoint " +
      "docs don't; density respects the winnowing bound") {
    val shared = "zqxjkvwpyg mbtfh"  // 16 chars, well over the bound
    val docs = Seq(
      (0L, s"aaaa bbbb $shared cccc dddd"),
      (1L, s"eeee ffff gggg $shared hhhh"),
      (2L, "totally disjoint content with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = graft.queries.Round13Queries.winnowFingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view
      // decode: position rides the low 12 bits, the HASH is the
      // comparable part across docs
      .mapValues(_.map(_._2 / 4096L).toSet).toMap
    assert((byDoc(0L) & byDoc(1L)).nonEmpty,
      "planted 16-char shared run must yield a shared fingerprint")
    assert((byDoc(0L) & byDoc(2L)).isEmpty &&
      (byDoc(1L) & byDoc(2L)).isEmpty,
      "disjoint docs must not collide at 40-bit hashes on this fixture")
    // winnowing selects >= 1 fingerprint per window and at most one
    // new per position: count is within [windows/w, windows] per doc
    val t0 = "aaaa bbbb zqxjkvwpyg mbtfh cccc dddd"
    val nWindows = t0.length - 8 - 3 + 1
    val n0 = fps.count(_._1 == 0L)
    assert(n0 >= nWindows / 4 && n0 <= nWindows,
      s"density out of winnowing bounds: $n0 of $nWindows windows")
  }

  test("mipsTopK: magnitude wins MIPS but not cosine, and the norm " +
      "augmentation reduces MIPS to cosine ANN exactly") {
    import graft.similarity.Knn
    // corpus: b points the same direction as the query but SHORT;
    // c points 45 degrees off but LONG — cosine prefers b, MIPS c
    val q = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array(0.1f, 0.0f, 0.0f, 0.0f)),       // aligned, short
      (1L, Array(3.0f, 3.0f, 0.0f, 0.0f)),       // off-angle, long
      (2L, Array(0.05f, 0.02f, 0.0f, 0.0f)))     // filler
      .toDF("vec_id", "embedding")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    val mips = ranks(Knn.mipsTopK(corpus, q, "vec_id", "embedding", 3))
    val cos = ranks(
      Knn.bruteForceTopK(corpus, q, "vec_id", "embedding", 3))
    assert(mips(1) == 1L && cos(1) == 0L,
      s"MIPS must rank the long vector first, cosine the aligned one:" +
        s" mips=$mips cos=$cos")
    // norm augmentation: x' = [x, sqrt(M^2 - |x|^2)], q' = [q, 0] —
    // cosine ranking over the augmented space == MIPS ranking (the
    // reduction that lets the IVF/LSH serving paths answer MIPS)
    def aug(rows: Seq[(Long, Array[Float])], qSide: Boolean) = {
      val m2 = rows.map(_._2.map(x => x * x.toDouble).sum).max
      rows.map { case (id, v) =>
        val extra =
          if (qSide) 0.0f
          else math.sqrt(m2 - v.map(x => x * x.toDouble).sum).toFloat
        (id, v :+ extra)
      }
    }
    val corpusRows = Seq(
      0L -> Array(0.1f, 0.0f, 0.0f, 0.0f),
      1L -> Array(3.0f, 3.0f, 0.0f, 0.0f),
      2L -> Array(0.05f, 0.02f, 0.0f, 0.0f))
    val qRows = Seq(100L -> Array(1.0f, 0.0f, 0.0f, 0.0f))
    val augCos = ranks(Knn.bruteForceTopK(
      aug(corpusRows, qSide = false).toDF("vec_id", "embedding"),
      aug(qRows, qSide = true).toDF("vec_id", "embedding"),
      "vec_id", "embedding", 3))
    assert(augCos == mips,
      s"augmented-cosine ranking must equal MIPS: $augCos vs $mips")
  }

  test("d_minhash_nfc negative control: composed/decomposed twins are " +
      "verified near-dups ONLY under the NFC projection") {
    // the d_minhash_nfc fixture shape in miniature: every 'e' spelled
    // precomposed vs decomposed + a distinct tag token per variant
    val base = "the quick template delivers test sentences every week " +
      "near the red fence"
    val variants = Seq(
      (0L, base.replace("e", "\u00e9") + " veven"),
      (1L, base.replace("e", "e\u0301") + " vodd")).toDF("vid", "raw")
    def dups(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashDuplicatesPortable(df, "vid", "text",
          threshold = 0.3, shingleN = 3, bands = 4, rowsPerBand = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = dups(variants.select($"vid", $"raw".as("text")))
    assert(!raw.contains((0L, 1L)),
      "byte-level minhash must NOT pair the spelling twins")
    val nfc = dups(variants.select($"vid",
      graft.functions.text.unicode_normalize($"raw", "NFC").as("text")))
    assert(nfc == Set((0L, 1L)),
      s"NFC-projected minhash must verify the twin pair, got $nfc")
  }
}
