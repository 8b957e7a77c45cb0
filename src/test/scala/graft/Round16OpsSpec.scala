package graft

import graft.ops.{RobustStats, Sampling, TextClassifier, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 first wave: learned quality-classifier inference (hashed
  * n-gram features, fixed-point linear scoring) and nearest-rank
  * quantile thresholds — planted fixtures pinning the feature stream,
  * the integer decision rule, and the rank arithmetic.
  */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ngramFeatures: unigrams + adjacent bigrams in order, single " +
    "token yields no bigram, duplicate tokens preserved") {
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "x x")).toDF("doc_id", "text")
    val got = TextClassifier.ngramFeatures(docs, "doc_id", "text")
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    assert(got(1L) == Seq("a", "b", "c", "a b", "b c"))
    assert(got(2L) == Seq("solo"))
    assert(got(3L) == Seq("x", "x", "x x")) // dup unigrams both count
  }

  test("featureHash: deterministic, in [0, dim), and equal to the " +
    "60-bit md5 prefix mod dim") {
    val feats = Seq("the", "quick fox", "", "the").toDF("feat")
    val rows = feats.select(col("feat"),
      TextClassifier.featureHash(col("feat"), 64).as("fid"),
      (conv(substring(md5(col("feat")), 1, 15), 16, 10)
        .cast("long") % 64L).as("ref"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (f, fid, ref) =>
      assert(fid == ref && fid >= 0L && fid < 64L, s"feat=$f")
    }
    // same input → same id (the two "the" rows)
    val byFeat = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byFeat("the").size == 1)
  }

  test("scoreDocs: dot is the exact weighted feature-count sum and " +
    "keep is the cross-multiplied integer rule (negative dot exact)") {
    val dim = 8
    // planted model: w[fid] = 10*fid - 30 (negative weights exist)
    val w = spark.range(0, dim.toLong)
      .select(col("id").as("fid"), (col("id") * 10L - 30L).as("wgt"))
    val docs = Seq((1L, "a b c"), (2L, "z")).toDF("doc_id", "text")
    // expected dot from the SAME feature stream + hash (pins the
    // join+agg plumbing against an independently assembled sum)
    val expected = TextClassifier
      .ngramFeatures(docs, "doc_id", "text")
      .select(col("doc_id"),
        (TextClassifier.featureHash(col("feat"), dim) * 10L - 30L)
          .as("wgt"))
      .groupBy("doc_id").agg(sum("wgt").as("dot"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val got = TextClassifier.scoreDocs(docs, "doc_id", "text", w, dim,
        thrNum = -3L, thrDen = 2L)
      .select(col("doc_id"), col("n_feats"), col("dot"), col("keep"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.length == 2)
    got.foreach { case (id, n, dot, keep) =>
      assert((dot, n) == expected(id))
      // keep ⟺ dot/n >= -3/2 ⟺ 2*dot >= -3*n
      assert(keep == (2L * dot >= -3L * n), s"doc $id dot=$dot n=$n")
    }
  }

  test("scoreDocs: score column is the single IEEE division dot/n") {
    val w = TextClassifier.standInWeights(spark, 32)
    val docs = Seq((7L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = TextClassifier
      .scoreDocs(docs, "doc_id", "text", w, 32, 0L, 1L).collect()(0)
    assert(r.getAs[Double]("score") ==
      r.getAs[Long]("dot").toDouble / r.getAs[Long]("n_feats").toDouble)
  }

  test("standInWeights: dim rows, weights in [-1000, 1000], " +
    "deterministic across builds") {
    val w1 = TextClassifier.standInWeights(spark, 256)
      .as[(Long, Long)].collect().sortBy(_._1)
    val w2 = TextClassifier.standInWeights(spark, 256)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(w1.length == 256 && w1.sameElements(w2))
    assert(w1.forall { case (_, wg) => wg >= -1000L && wg <= 1000L })
    // not degenerate: both signs present
    assert(w1.exists(_._2 > 0L) && w1.exists(_._2 < 0L))
  }

  test("quantiles: nearest-rank terciles and median on 1..100, " +
    "duplicates collapse to the same thresholds") {
    val df = (1L to 100L).map(v => ("g", v)).toDF("g", "v")
    val t = RobustStats.quantiles(df, "g", "v", Seq(1L, 2L), 3L)
      .collect()(0)
    assert(t.getAs[Long]("n") == 100L)
    assert(t.getAs[Long]("q0") == 34L) // ceil(100/3) = 34
    assert(t.getAs[Long]("q1") == 67L) // ceil(200/3) = 67
    val med = RobustStats.quantiles(df, "g", "v", Seq(1L), 2L)
      .collect()(0)
    assert(med.getAs[Long]("q0") == 50L) // ceil(100/2) = 50
    // every value duplicated 5×: same thresholds (rank scales with n)
    val dup = (1L to 100L).flatMap(v => Seq.fill(5)(("g", v)))
      .toDF("g", "v")
    val t5 = RobustStats.quantiles(dup, "g", "v", Seq(1L, 2L), 3L)
      .collect()(0)
    assert(t5.getAs[Long]("n") == 500L)
    assert(t5.getAs[Long]("q0") == 34L && t5.getAs[Long]("q1") == 67L)
  }

  test("repetitionStats: hand-computed dup/rep counts — the all-one-" +
    "token doc, a clean doc, and the sub-n-token degenerates") {
    val docs = Seq(
      (1L, "a a a a"),   // 4×"a": dup 3; "a a"×3 len3 → rep2 9;
                         // "a a a"×2 len5 → rep3 10
      (2L, "w x y z"),   // all distinct, every gram unique:
                         // rep2 = 1·3 = 3, rep3 = 1·5 = 5
      (3L, "solo"),      // 1 token: no grams at all
      (4L, "p q")        // 2 tokens: rep3 = 0, rep2 = 1·3 = 3
    ).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((4L, 3L, 9L, 10L)))
    assert(got(2L) == ((4L, 0L, 3L, 5L)))
    assert(got(3L) == ((1L, 0L, 0L, 0L)))
    assert(got(4L) == ((2L, 0L, 3L, 0L)))
  }

  test("repetitionStats: rep_n is the MAX coverage, not the most " +
    "frequent gram's (longer gram at same count wins)") {
    // "ab ab cd cd cd": "ab ab"×1 len5, "ab cd"×1, "cd cd"×2 len5=10
    val docs = Seq((1L, "ab ab cd cd cd")).toDF("doc_id", "text")
    val r = TextStats.repetitionStats(docs, "doc_id", "text")
      .collect()(0)
    assert(r.getAs[Long]("rep2_chars") == 10L)
  }

  test("largestRemainderAllocate: floors + largest remainders, " +
    "key-ascending tie break, sums to the budget exactly") {
    // budget 10, weights 4/4/3 (T=11): floors 3/3/2 (sum 8),
    // remainders 7/7/8 → c first, then the a-b tie breaks to a
    val df = Seq(("a", 4L), ("b", 4L), ("c", 3L)).toDF("k", "w")
    val got = Sampling.largestRemainderAllocate(df, "k", "w", 10L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 4L, 4L), ("b", 4L, 3L), ("c", 3L, 3L)))
    assert(got.map(_._3).sum == 10L)
  }

  test("largestRemainderAllocate: raw rows reduce per key first; " +
    "zero budget allocates zero everywhere") {
    val raw = Seq(("a", 2L), ("a", 2L), ("b", 4L), ("c", 3L))
      .toDF("k", "w")
    val got = Sampling.largestRemainderAllocate(raw, "k", "w", 10L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 4L, 4L), ("b", 4L, 3L), ("c", 3L, 3L)))
    val zero = Sampling.largestRemainderAllocate(raw, "k", "w", 0L)
      .as[(String, Long, Long)].collect().toSeq
    assert(zero.forall(_._3 == 0L))
    intercept[IllegalArgumentException] {
      Sampling.largestRemainderAllocate(raw, "k", "w", -1L)
    }
  }

  test("largestRemainderAllocate: exact-proportion weights need no " +
    "remainder units (every quota integral)") {
    val df = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "w")
    val got = Sampling.largestRemainderAllocate(df, "k", "w", 10L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 5L, 5L), ("b", 3L, 3L), ("c", 2L, 2L)))
  }

  test("piiScrub: counts each pattern independently on the original " +
    "text and redacts email -> ip -> phone in the pinned order") {
    val docs = Seq(
      (1L, "mail a.b-c%d@sub.example.org now"),
      (2L, "call 555-0199 or 555-1234 twice"),
      (3L, "host 10.0.200.7 and 192.168.1.1"),
      (4L, "mixed u1@example.com via 10.0.0.1 call 555-0000"),
      (5L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val got = TextStats.piiScrub(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, 0L, 0L,
      "mail <EMAIL> now")))
    assert(got(2L) == ((2L, 0L, 2L, 0L,
      "call <PHONE> or <PHONE> twice")))
    assert(got(3L) == ((3L, 0L, 0L, 2L,
      "host <IP> and <IP>")))
    assert(got(4L) == ((4L, 1L, 1L, 1L,
      "mixed <EMAIL> via <IP> call <PHONE>")))
    assert(got(5L) == ((5L, 0L, 0L, 0L,
      "clean text with no pii at all")))
  }

  test("piiScrub: a phone-shaped digit run inside an email is counted " +
    "by BOTH patterns but redacts as the email (email replaced first)") {
    val docs = Seq((1L, "u555-0123@example.com")).toDF("doc_id", "text")
    val r = TextStats.piiScrub(docs, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_phone") == 1L) // independent count
    assert(r.getAs[String]("scrubbed") == "<EMAIL>")
  }

  test("scoreDocsInline ≡ scoreDocs row-for-row (the zero-state " +
    "streaming shape equals the explode+join batch plan), including " +
    "the single-token and duplicate-feature edges") {
    val dim = 64
    val w = TextClassifier.standInWeights(spark, dim)
    val wmap = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "x x"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, null.asInstanceOf[String])) // both paths must DROP it
      .toDF("doc_id", "text")
    val batch = TextClassifier
      .scoreDocs(docs, "doc_id", "text", w, dim, 5L, 1000L)
      .orderBy("doc_id").collect().toSeq
    val inline = TextClassifier
      .scoreDocsInline(docs, "doc_id", "text", wmap, dim, 5L, 1000L)
      .orderBy("doc_id").collect().toSeq
    assert(inline == batch)
  }

  test("scoreDocsInline: rejects an incomplete weight map loudly") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextClassifier.scoreDocsInline(docs, "doc_id", "text",
        Map(0L -> 1L), dim = 4, thrNum = 0L, thrDen = 1L)
    }
  }

  test("hits: hand-computed 2-round hubs/authorities on a directed " +
    "fan-in graph (1->3, 2->3, 3->4), empty graph yields empty") {
    // round 1: auth raw {3: 2e6, 4: 1e6}, tot 3e6, denom 3 →
    //   a1 = {3: 666666, 4: 333333}; hub raw {1: 666666, 2: 666666,
    //   3: 333333}, tot 1666665, denom 1 → h1 unchanged.
    // round 2: auth raw {3: 1333332, 4: 333333}, tot 1666665,
    //   denom 1 → a2 = raw; hub raw {1: 1333332, 2: 1333332,
    //   3: 333333}, tot 2999997, denom 2 → h2 = {1: 666666,
    //   2: 666666, 3: 166666, 4: 0}.
    val und = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = graft.ops.Graph.hits(und, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) == ((666666L, 0L)))
    assert(got(2L) == ((666666L, 0L)))
    assert(got(3L) == ((166666L, 1333332L)))
    assert(got(4L) == ((0L, 333333L)))
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.ops.Graph.hits(empty, iters = 1).count() == 0L)
  }

  test("bottomKSample: the k smallest-hash ids per group, ties by id " +
    "desc, invariant under repartition, and equal to a rank-window " +
    "replay of the same hashes") {
    val df = (1L to 40L).map(i => (if (i % 2 == 0) "even" else "odd", i))
      .toDF("g", "id")
    // independent replay: full rank window over the SAME hash expr
    val expected = df.select(col("g"), col("id"),
        conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, -r._2))
        .take(5).map(_._2).toSeq).toMap
    for (parts <- Seq(1, 7)) {
      val got = graft.ops.Sampling.bottomKSample(
          df.repartition(parts), "g", "id", k = 5)
        .orderBy(col("g"), col("rn"))
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
        .toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("p_mix_sample_pack: the packed bins hold the full 200-doc " +
    "budget on this corpus (every sf0.001 source holds more docs " +
    "than its alloc — the undersized-source case would legally " +
    "yield fewer, both engines agreeing), bins start at 0 and " +
    "ascend per source") {
    val rows = graft.SparkEntry.queries("p_mix_sample_pack")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 200L)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      val bins = rs.map(_.getAs[Long]("bin")).sorted.toSeq
      // first bin is always 0 (cum − toks = 0 at rn 1) and bins
      // ascend; a doc longer than the 512-token budget may legally
      // SKIP an id, so density is not asserted (none in this corpus,
      // where docs max out near ~100 tokens)
      assert(bins.head == 0L && bins == bins.distinct.sorted,
        s"source $src: ${bins.mkString(",")}")
    }
  }

  test("quantiles: rejects invalid fractions and fractional columns") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      RobustStats.quantiles(df, "g", "v", Seq(4L), 3L)
    }
    intercept[IllegalArgumentException] {
      RobustStats.quantiles(Seq(("g", 1.5)).toDF("g", "v"),
        "g", "v", Seq(1L), 2L)
    }
  }
}
