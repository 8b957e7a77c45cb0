package graft

import graft.dedup.Dedup
import graft.functions.TextKernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-12: the LSH hot-bucket cap (bound a spam bucket's O(k²) pair
  * output, preserve cluster structure exactly) and NFC normalization
  * composed into dedup keys. Non-ASCII fixtures use \\u escapes so the
  * composed/decomposed distinction survives editor normalization.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketCap: integer-exact, monotone, floored at 64") {
    assert(Dedup.bucketCap(0L) == 64)
    assert(Dedup.bucketCap(500L) == 72) // bitlen(501)=9
    assert(Dedup.bucketCap(620L) == 80) // bitlen(621)=10
    assert(Dedup.bucketCap(5120L) == 104) // bitlen(5121)=13
    assert(Dedup.bucketCap(1L << 40) == 8 * 41)
    // monotone, and logarithmic: 10^12 docs still caps near 320
    val caps = Seq(10L, 1000L, 100000L, 10000000L, 1000000000L,
      1000000000000L).map(Dedup.bucketCap(_))
    assert(caps == caps.sorted && caps.last == 8 * 40)
  }

  test("planted 1000-doc spam bucket: pair output bounded, " +
      "clusters preserved exactly") {
    // 1000 identical spam docs + 20 distinct docs. Uncapped, the spam
    // bucket alone emits 1000*999/2 = 499500 pairs; the derived cap
    // (bucketCap(1020) = 8*10 = 80 < 1000) star-reduces it to 999.
    val spam = (0L until 1000L).map(i =>
      (i, "wall of identical spam text repeated across the campaign " +
        "always the same tokens every time"))
    val real = (2000L until 2020L).map(i =>
      (i, s"genuine document $i " +
        (0 to 12).map(j => s"tok${i}_$j").mkString(" ")))
    val df = (spam ++ real).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(df, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 2).localCheckpoint()
    val n = cands.count()
    // star edges for the spam bucket (999) + whatever tiny natural
    // cliques the real docs form — orders of magnitude under 499500
    assert(n >= 999L && n < 5000L,
      s"capped candidate count $n — cap failed to bound the spam bucket")
    // hub star shape: spam hub 0 pairs with all 999 other spam docs
    assert(cands.filter($"a_id" === 0L && $"b_id" < 1000L)
      .count() == 999L)
    // the recall contract that makes star-reduction safe: connected
    // components over the CAPPED edges still put all 1000 spam docs in
    // ONE cluster (clique and star have the same components)
    val clusters = Dedup.duplicateClusters(
      df.select($"doc_id"), cands, "doc_id")
    val spamClusters = clusters.filter($"id" < 1000L)
      .select($"cluster_id").distinct().collect()
    assert(spamClusters.length == 1 && spamClusters.head.getLong(0) == 0L)
  }

  test("capped vs uncapped candidates: identical connected components " +
      "even when the cap engages") {
    // 3 planted families (exact dups => same buckets in every band)
    // with an explicit cap LOW enough (2) to star-reduce family buckets
    val docs = (0L until 18L).map { i =>
      (i, s"family${i % 3} shared run alpha bravo charlie delta echo " +
        "foxtrot golf hotel india")
    }.toDF("doc_id", "text")
    val capped = Dedup.minhashCandidatesPortable(docs, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 2, maxBucket = 2)
    val uncapped = Dedup.minhashCandidatesPortable(docs, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 2, maxBucket = 1000000)
    assert(capped.count() < uncapped.count(),
      "cap=2 must actually reduce the 6-doc family cliques")
    def comp(edges: org.apache.spark.sql.DataFrame) =
      Dedup.duplicateClusters(docs.select($"doc_id"), edges, "doc_id")
        .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq
    assert(comp(capped) == comp(uncapped),
      "star-reduction changed the component structure")
  }

  test("derived cap never engages on the natural test corpus — every " +
      "registered LSH config, smallest and largest verify SF") {
    // regression guard for the d_* oracles: every natural bucket must
    // sit FAR below the corpus-derived cap for ALL three registered
    // configs (d_minhash_lsh 3/8/2, d_minhash_verify 3/4/4, leakproof
    // 5/8/2) at both ends of the verify-SF range — corpus growth or
    // fixture regeneration that pushes a natural bucket near the cap
    // trips HERE with a named cause, not as an opaque oracle mismatch
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, sf)
      val cap = Dedup.bucketCap(docs.count())
      for ((sh, bands, rpb) <- Seq((3, 8, 2), (3, 4, 4), (5, 8, 2))) {
        val maxBucket = Dedup.minhashBucketsPortable(docs, "doc_id",
            "text", sh, bands, rpb)
          .groupBy($"band", $"band_hash").count()
          .agg(max($"count")).head().getLong(0)
        assert(maxBucket * 4 <= cap,
          s"natural max bucket $maxBucket too close to cap $cap " +
            s"($sf, config $sh/$bands/$rpb) — derived cap would " +
            "distort oracle-gated results")
      }
    }
  }

  test("adaptive simhash banding: legacy 4x16 layout at small n, " +
      "wider composite bands past the key space, pigeonhole recall") {
    // tiny corpus (n <= 256, where 16-bit keys hold n^2/2^16 < 0.5
    // expected random collisions per band): the derivation lands on the
    // legacy 4 single-block bands (16 bits each, disjoint, covering all
    // 64 bits)
    val small = Dedup.phashBandMasks(200L, maxHamming = 3, hashBits = 64)
    assert(small.toSet == Set(0xFFFFL, 0xFFFF0000L, 0xFFFF00000000L,
      0xFFFF000000000000L))
    assert(small.reduce(_ | _) == -1L) // covers all 64 bits
    // large corpus: bands widen (composite masks), count grows C(m, m-t)
    val big = Dedup.phashBandMasks(10000000L, maxHamming = 3,
      hashBits = 64)
    assert(big.size > 4, "layout must widen past the 16-bit key space")
    assert(big.forall(m => java.lang.Long.bitCount(m) >= 32),
      "every wide band must carry >= log2(n)+8 bits")
    // pigeonhole: any <=3 differing bits leave >=1 band untouched, at
    // BOTH layouts, for adversarial bit positions
    for (masks <- Seq(small, big); bits <- Seq(Seq(0, 21, 63),
        Seq(15, 16, 17), Seq(62, 63), Seq(5))) {
      val diff = bits.map(1L << _).reduce(_ | _)
      assert(masks.exists(m => (m & diff) == 0L),
        s"no clean band for differing bits $bits")
    }
  }

  test("simhashCandidates pairs planted near-dups under the adaptive " +
      "layout and the capping premise holds on wide bands") {
    val base = (0 to 40).map(j => s"tok$j").mkString(" ")
    val docs = Seq(
      (0L, base), (1L, base + " extraword"), // near-dup pair
      (2L, (100 to 140).map(j => s"other$j").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("capping is observable: the star branch emits named metrics " +
      "through the standard observed-metrics channel") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("lsh_cap_"))
            captured.add((name, row.getAs[Long]("star_edges"),
              row.getAs[Long]("max_bucket")))
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val spam = (0L until 300L).map(i => (i, "identical spam wall"))
        .toDF("doc_id", "text")
      // 300 identical docs, cap = max(64, 8*bitlen(301)) = 72: ONE hot
      // bucket per band (8 bands), each star-reduced to 299 edges
      Dedup.minhashCandidates(spam, "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 2).count()
      // listener delivery is async; poll briefly
      def found: Boolean = {
        var ok = false
        captured.forEach { case (_, starEdges, maxBucket) =>
          if (starEdges == 8L * 299L && maxBucket == 300L) ok = true
        }
        ok
      }
      val deadline = System.currentTimeMillis() + 20000
      while (!found && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(found,
        s"expected a (star_edges=${8 * 299}, max_bucket=300) " +
          s"observation, got ${captured}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("in-plan cap scalar equals bucketCap across corpus sizes " +
      "(incl. the 64-floor and power-of-two boundaries)") {
    for (n <- Seq(0L, 1L, 63L, 64L, 255L, 256L, 500L, 5120L, 100000L)) {
      val got = Dedup.inPlanCap(spark.range(n).toDF("id"))
        .head().getLong(0)
      assert(got == Dedup.bucketCap(n).toLong,
        s"in-plan cap $got != bucketCap(${n}) = ${Dedup.bucketCap(n)}")
    }
  }

  test("simhashCandidatesFromSigs equals the text-level wrapper") {
    val docs = (0L until 30L).map { i =>
      (i, if (i % 3 == 0) "shared family text alpha bravo charlie"
      else s"unique $i " + (0 to 8).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaText = pairs(Dedup.simhashCandidates(docs, "doc_id", "text",
      maxHamming = 3, tokenHash = "md5"))
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text", "md5")
    val viaSigs = pairs(Dedup.simhashCandidatesFromSigs(sigs,
      nDocs = 30L, maxHamming = 3, hashBits = 60))
    assert(viaText == viaSigs && viaText.nonEmpty)
  }

  test("lshBucketStats reports capped buckets — no silent truncation") {
    val docs = (0L until 10L).map(i => (i, "same text every doc"))
      .toDF("doc_id", "text")
    val buckets = Dedup.minhashBucketsPortable(docs, "doc_id", "text",
      3, 8, 2)
    val stats = Dedup.lshBucketStats(buckets, cap = 4)
    // all 10 docs share every band bucket: 8 buckets of 10, all capped
    val rows = stats.collect()
    assert(rows.length == 8 &&
      rows.forall(r => r.getLong(2) == 10L && r.getBoolean(4)))
    assert(stats.filter($"hub" === 0L).count() == 8L)
  }

  private val eAcute = "\u00e9" // precomposed
  private val eCombining = "e\u0301" // decomposed

  test("exactNormalized collapses composed/decomposed twins that " +
      "byte-level exact dedup splits") {
    val twins = Seq(
      (0L, s"caf$eAcute au lait"), (1L, s"caf$eCombining au lait"),
      (2L, "plain ascii doc"), (3L, "plain ascii doc"),
      (4L, s"r${eAcute}sum${eAcute} unique")).toDF("doc_id", "text")
    val raw = Dedup.exact(twins, "text", "doc_id")
      .orderBy($"keep_id").collect()
    // byte-level: the spelling twins do NOT group (4 groups, only the
    // ascii pair collapses)
    assert(raw.length == 4)
    val norm = Dedup.exactNormalized(twins, "text", "doc_id")
      .orderBy($"keep_id").collect()
    assert(norm.length == 3)
    assert(norm.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L), (2L, 2L), (4L, 1L)))
  }

  test("normalize-then-minhash: spelling twins share ALL buckets only " +
      "after an NFC projection") {
    // every token carries the accent, so the two spellings share ZERO
    // shingles pre-normalization; NFC composes upstream of the hash as
    // a plain projection — no tokenizer flag needed, the expression
    // composes at the DataFrame level
    def doc(e: String) = s"r${e}sum$e caf$e entr${e}e d${e}j$e " +
      s"expos$e clich$e touch$e"
    val twins = Seq((0L, doc(eAcute)), (1L, doc(eCombining)))
      .toDF("doc_id", "text")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignaturesPortable(df, "doc_id", "text", k = 16,
          shingleN = 3)
        .orderBy($"id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    val raw = sigs(twins)
    assert(raw(0) != raw(1),
      "byte-level minhash must split the spelling twins")
    val normed = sigs(twins.withColumn("text",
      graft.functions.text.unicode_normalize($"text", "NFC")))
    assert(normed(0) == normed(1),
      "NFC-projected minhash must give the twins identical signatures")
  }

  test("TextKernels ASCII fast path: same buffer, every form, no copy") {
    val ascii = UTF8String.fromString(
      "a long plain ascii document body that must not allocate " * 4)
    for (form <- Seq(TextKernels.NFC, TextKernels.NFD, TextKernels.NFKC,
        TextKernels.NFKD))
      assert(TextKernels.normalize(ascii, form) eq ascii,
        s"ASCII fast path must return the input buffer (form $form)")
    // the fast path must not swallow real work: non-ASCII decomposed
    // input still normalizes
    val dec = UTF8String.fromString("caf" + eCombining)
    assert(TextKernels.normalize(dec, TextKernels.NFC).toString ==
      "caf" + eAcute)
  }
}
