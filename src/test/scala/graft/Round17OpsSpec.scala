package graft

import graft.ops.{Sampling, TextClassifier, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 first wave: the ADVICE closures made testable — scoreDocs'
  * full-coverage model guard, largestRemainderAllocate's NULL-weight
  * loud failure, and the \x0B tokenization cure (normalizeVt) for the
  * corpus invariant documented on ngramFeatures.
  */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scoreDocs: rejects a sparse weight table loudly (a trained " +
    "export missing fids would otherwise silently change scores)") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // 3 of 4 fids covered — must fail at construction, not score
    val sparse = spark.range(0, 3L)
      .select(col("id").as("fid"), lit(1L).as("wgt"))
    val e = intercept[IllegalArgumentException] {
      TextClassifier.scoreDocs(docs, "doc_id", "text", sparse,
        dim = 4, thrNum = 0L, thrDen = 1L)
    }
    assert(e.getMessage.contains("EXACTLY one row per fid"))
    // duplicate fids cannot fake coverage: 4 rows, 2 distinct
    val dup = Seq((0L, 1L), (0L, 2L), (1L, 1L), (1L, 2L))
      .toDF("fid", "wgt")
    intercept[IllegalArgumentException] {
      TextClassifier.scoreDocs(docs, "doc_id", "text", dup,
        dim = 4, thrNum = 0L, thrDen = 1L)
    }
    // FULL coverage + one duplicated row (5 rows, 4 distinct) must
    // also fail — the dup would silently double-count its features
    val covDup = Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L),
      (0L, 9L)).toDF("fid", "wgt")
    intercept[IllegalArgumentException] {
      TextClassifier.scoreDocs(docs, "doc_id", "text", covDup,
        dim = 4, thrNum = 0L, thrDen = 1L)
    }
    // the fused pass enforces the SAME precondition (its left join
    // would otherwise drop sparse features from dot but not n_feats)
    intercept[IllegalArgumentException] {
      TextStats.curationStats(docs, "doc_id", "text", sparse, 4)
    }
  }

  test("embedDocs: rejects sparse, out-of-range, and duplicated " +
    "weight cells loudly; embedVectors raises on a component the " +
    "float cast would round") {
    import graft.similarity.EmbedInference
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // missing one (fid, j) cell of the 4x2 matrix
    val sparse = spark.range(0, 7L).select(
      (col("id") / 2).cast("long").as("fid"),
      (col("id") % 2).cast("long").as("j"), lit(1L).as("wgt"))
    intercept[IllegalArgumentException] {
      EmbedInference.embedDocs(docs, "doc_id", "text", sparse, 4, 2)
    }
    // full coverage + one duplicated cell
    val dup = spark.range(0, 8L).select(
        (col("id") / 2).cast("long").as("fid"),
        (col("id") % 2).cast("long").as("j"), lit(1L).as("wgt"))
      .unionByName(Seq((0L, 0L, 5L)).toDF("fid", "j", "wgt"))
    intercept[IllegalArgumentException] {
      EmbedInference.embedDocs(docs, "doc_id", "text", dup, 4, 2)
    }
    // overflow guard: a planted e at 2^24 raises instead of rounding
    val rows = Seq((1L, 0L, 16777216L), (1L, 1L, 3L))
      .toDF("doc_id", "j", "e")
    val e = intercept[Exception] {
      EmbedInference.embedVectors(rows, "doc_id").collect()
    }
    assert(e.getMessage.contains("2^24"))
    val ok = Seq((1L, 0L, 16777215L), (1L, 1L, -16777215L))
      .toDF("doc_id", "j", "e")
    val v = EmbedInference.embedVectors(ok, "doc_id")
      .as[(Long, Seq[Float])].collect()
    assert(v.head._2 == Seq(16777215f, -16777215f))
  }

  test("scoreDocs: still accepts a full-coverage table (guard does " +
    "not reject the standInWeights model)") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val w = TextClassifier.standInWeights(spark, 8)
    val out = TextClassifier.scoreDocs(docs, "doc_id", "text", w,
      dim = 8, thrNum = 0L, thrDen = 1L).collect()
    assert(out.length == 1)
  }

  test("largestRemainderAllocate: NULL weight total raises in-plan " +
    "instead of silently redistributing the key's share") {
    val df = Seq(("a", Some(10L)), ("b", None))
      .toDF("source", "n_chars")
    val e = intercept[Exception] {
      Sampling.largestRemainderAllocate(df, "source", "n_chars",
        budget = 5L).collect()
    }
    assert(e.getMessage.contains("NULL or negative"))
  }

  test("largestRemainderAllocate: a NULL weight among non-NULLs for " +
    "the SAME key does not raise (sum ignores NULL rows) but an " +
    "all-NULL key does") {
    val ok = Seq(("a", Some(10L)), ("a", None), ("b", Some(30L)))
      .toDF("source", "n_chars")
    val got = Sampling.largestRemainderAllocate(ok, "source",
      "n_chars", budget = 4L).as[(String, Long, Long)].collect()
    assert(got.map(_._3).sum == 4L)
  }

  test("curationStats (the fused rule pass) ≡ composing the three " +
    "stand-alone operators: classifier dot/n_feats from scoreDocs, " +
    "repetition stats from repetitionStats, gopher word-shape stats " +
    "from an independent per-token aggregation") {
    val dim = 64
    val w = TextClassifier.standInWeights(spark, dim)
    val docs = Seq(
      (1L, "the cat sat on the mat with a #tag and more..."),
      (2L, "go go go go go go stop"), // heavy repetition
      (3L, "solo"),
      (4L, "alpha beta alpha beta alpha beta gamma delta epsilon"),
      (5L, null.asInstanceOf[String])) // must vanish on both paths
      .toDF("doc_id", "text")
    val fused = TextStats.curationStats(docs, "doc_id", "text", w, dim)
      .orderBy("doc_id").collect()
    // classifier leg
    val clf = TextClassifier
      .scoreDocs(docs, "doc_id", "text", w, dim, 0L, 1L)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // repetition leg
    val rep = TextStats.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // gopher leg, independently assembled from a plain token explode
    val gop = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("tok")).cast("long")).as("word_chars"),
        sum(when(col("tok").rlike("[a-zA-Z]"), 1L).otherwise(0L))
          .as("n_alpha"),
        sum(when(col("tok").isin("the", "be", "to", "of", "and",
          "that", "have", "with"), 1L).otherwise(0L)).as("n_stop"),
        sum(expr("(length(tok) - length(replace(tok, '#', ''))) + " +
          "((length(tok) - length(replace(tok, '...', ''))) div 3)")
          .cast("long")).as("n_sym"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(fused.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    fused.foreach { r =>
      val id = r.getLong(0)
      assert((r.getAs[Long]("n_feats"), r.getAs[Long]("dot"))
        == clf(id), s"classifier leg, doc $id")
      assert((r.getAs[Long]("n_words"), r.getAs[Long]("dup_toks"),
        r.getAs[Long]("rep2_chars"), r.getAs[Long]("rep3_chars"))
        == rep(id), s"repetition leg, doc $id")
      assert((r.getAs[Long]("n_words"), r.getAs[Long]("word_chars"),
        r.getAs[Long]("n_alpha"), r.getAs[Long]("n_stop"),
        r.getAs[Long]("n_sym")) == gop(id), s"gopher leg, doc $id")
    }
    // the doc-2 fixture actually exercises the repetition max
    val d2 = fused.find(_.getLong(0) == 2L).get
    assert(d2.getAs[Long]("rep2_chars") == 25L) // "go go" x5 * len 5
    assert(d2.getAs[Long]("dup_toks") == 5L)
  }

  test("embedDocs: e_j equals the independently assembled " +
    "per-occurrence sum over hashed features, NULL-text docs vanish, " +
    "and embedVectors restores j-ordered exact float vectors") {
    import graft.similarity.EmbedInference
    val dim = 32; val outDim = 4
    val w = EmbedInference.standInProjection(spark, dim, outDim)
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "x x"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = EmbedInference
      .embedDocs(docs, "doc_id", "text", w, dim, outDim)
      .orderBy("doc_id", "j").as[(Long, Long, Long)].collect().toSeq
    // independent replay: per-occurrence explode joined to the raw
    // (fid, j, wgt) rows — the naive shape the pivoted plan must equal
    val expected = TextClassifier.ngramFeatures(docs, "doc_id", "text")
      .select(col("doc_id"),
        TextClassifier.featureHash(col("feat"), dim).as("fid"))
      .join(w, Seq("fid"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("wgt")).as("e"))
      .orderBy("doc_id", "j").as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._1).distinct == Seq(1L, 2L, 3L)) // doc 4 dropped
    assert(got.count(_._1 == 1L) == outDim)
    val vecs = EmbedInference.embedVectors(
        EmbedInference.embedDocs(docs, "doc_id", "text", w, dim,
          outDim), "doc_id")
      .orderBy("doc_id").as[(Long, Seq[Float])].collect()
    vecs.foreach { case (id, v) =>
      val byJ = got.filter(_._1 == id).sortBy(_._2).map(_._3.toFloat)
      assert(v == byJ.toSeq, s"doc $id vector order")
    }
  }

  test("Multimodal.embedBytes: the byte-histogram projection replays " +
    "in closed form from standInProjection's weights (the JVM table " +
    "and the Spark expression are the same model)") {
    import graft.multimodal.Multimodal
    // W restricted to byte fids: dim=256, outDim=8
    val w = graft.similarity.EmbedInference
      .standInProjection(spark, 256, 8)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val payload = Array[Byte](0, 1, 1, 65, -1) // hist: 0->1,1->2,65->1,255->1
    val (wd, ht, feats) = Multimodal.embedBytes(payload)
    assert(wd == -1 && ht == -1 && feats.length == 8)
    (0 until 8).foreach { j =>
      val exp = (w((0L, j.toLong)) + 2L * w((1L, j.toLong)) +
        w((65L, j.toLong)) + w((255L, j.toLong))).toDouble / 1000.0
      assert(feats(j) == exp, s"dim $j")
    }
    // empty payload: all-zero histogram -> the zero vector
    val (_, _, z) = Multimodal.embedBytes(Array.empty[Byte])
    assert(z.toSeq == Seq.fill(8)(0.0))
  }

  test("kmvAdaptiveEquiJoin: the estimate DECISION binds physically " +
    "— a reducing dim executes as BroadcastHashJoin, an exploding " +
    "dim as SortMergeJoin — and both branches join value-identically") {
    // fact: 400 rows over 20 keys; selective dim: 2 keys (est ~40 <
    // 400 -> broadcast); exploding dim: 20 keys x 30 dup rows each
    // (est ~12000 > 400 -> shuffle-merge)
    val fact = spark.range(0, 400L)
      .select((col("id") % 20L).as("k"), col("id").as("payload"))
    val dimSmall = Seq(3L, 7L).toDF("k")
    val dimBig = spark.range(0, 600L).select((col("id") % 20L).as("k"))
    val small = Sampling.kmvAdaptiveEquiJoin(fact, dimSmall, "k", 16)
    val big = Sampling.kmvAdaptiveEquiJoin(fact, dimBig, "k", 16)
    assert(small.select("join_strategy").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("broadcast"))
    assert(big.select("join_strategy").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("shuffle"))
    val smallPlan = small.queryExecution.executedPlan.toString
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin"),
      s"broadcast branch must bind physically:\n$smallPlan")
    assert(bigPlan.contains("SortMergeJoin"),
      s"shuffle branch must bind physically:\n$bigPlan")
    // value identity: strategy changes the plan, never the rows
    assert(small.count() == 40L) // 400/20 rows per key x 2 keys
    assert(big.count() == 12000L) // 400 fact rows x 30 dim dups/key
  }

  test("piiScrubV2: Luhn separates valid from shaped-but-invalid " +
    "cards, SSN/intl/card counts are independent, and redaction is " +
    "conservative (every SHAPED card redacts) in the pinned order") {
    val docs = Seq(
      (1L, "pay 4111-1111-1111-1111 now"), // Luhn-valid
      (2L, "pay 4111 1111 1111 1112 now"), // shaped, Luhn-INVALID
      (3L, "id 123-45-6789 card 5500-0000-0000-0004 tel +44 7000123"),
      (4L, "no pii here"),
      (5L, "raw 4111111111111111 run")) // bare 16 digits, valid
      .toDF("doc_id", "text")
    val r = TextStats.piiScrubV2(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = r(i)
    assert(row(0).getAs[Long]("n_card") == 1L &&
      row(0).getAs[Long]("n_card_luhn") == 1L)
    assert(row(1).getAs[Long]("n_card") == 1L &&
      row(1).getAs[Long]("n_card_luhn") == 0L) // checksum does work
    assert(row(1).getAs[String]("scrubbed") == "pay <CARD> now",
      "invalid-checksum cards still redact (conservative posture)")
    assert(row(2).getAs[Long]("n_ssn") == 1L &&
      row(2).getAs[Long]("n_card") == 1L &&
      row(2).getAs[Long]("n_card_luhn") == 1L && // 5500...0004 valid
      row(2).getAs[Long]("n_intl") == 1L)
    assert(row(2).getAs[String]("scrubbed") ==
      "id <SSN> card <CARD> tel <INTL>")
    assert(row(3).getAs[Long]("n_ssn") == 0L &&
      row(3).getAs[Long]("n_card") == 0L &&
      row(3).getAs[Long]("n_intl") == 0L &&
      row(3).getAs[String]("scrubbed") == "no pii here")
    assert(row(4).getAs[Long]("n_card") == 1L &&
      row(4).getAs[Long]("n_card_luhn") == 1L)
  }

  test("luhnOk16 property: 300 seeded-random 16-digit strings agree " +
    "with an independent JVM Luhn implementation, and flipping any " +
    "single digit of a valid number breaks it") {
    def luhnRef(d: String): Boolean = {
      // standard right-to-left doubling, written independently of
      // the Column expression's fixed-length-16 left-parity form
      val sum = d.reverse.zipWithIndex.map { case (c, i) =>
        val v = c - '0'
        if (i % 2 == 1) { val x = v * 2; if (x > 9) x - 9 else x }
        else v
      }.sum
      sum % 10 == 0
    }
    val rnd = new scala.util.Random(17L)
    val cands = Seq.fill(300)(
      (1 to 16).map(_ => rnd.nextInt(10)).mkString)
    val df = cands.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "d")
    val got = df.select(col("id"),
        TextStats.luhnOk16(col("d")).as("ok"))
      .orderBy("id").as[(Long, Boolean)].collect()
    got.foreach { case (i, ok) =>
      assert(ok == luhnRef(cands(i.toInt)), s"candidate ${cands(i.toInt)}")
    }
    // single-digit sensitivity on a known-valid number
    val valid = "4111111111111111"
    assert(luhnRef(valid))
    val flipped = (0 until 16).map { p =>
      val c = valid.charAt(p) - '0'
      valid.updated(p, (((c + 1) % 10) + '0').toChar)
    }
    val fdf = flipped.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "d")
    val fGot = fdf.select(TextStats.luhnOk16(col("d")).as("ok"))
      .as[Boolean].collect()
    assert(fGot.forall(!_), "every single-digit flip must invalidate")
  }

  test("normalizeVt: a \\x0B document tokenizes identically to its " +
    "space-normalized form (the documented cross-engine cure), and " +
    "WITHOUT the cure Java's \\s splits where RE2 would not") {
    val vt = "alpha\u000Bbeta gamma"
    val docs = Seq((1L, vt)).toDF("doc_id", "text")
    // the hazard, pinned: Java regex \s treats \x0B as whitespace
    val rawFeats = TextClassifier
      .ngramFeatures(docs, "doc_id", "text")
      .as[(Long, String)].collect().map(_._2).toSeq
    assert(rawFeats == Seq("alpha", "beta", "gamma",
      "alpha beta", "beta gamma"))
    // RE2/DuckDB \s+ would yield tokens ("alpha\x0Bbeta", "gamma") —
    // a DIFFERENT stream. The cure maps \x0B → ' ' so both engines
    // see one whitespace alphabet; after it, Spark's stream equals
    // the stream over the hand-normalized text.
    val cured = docs.select(col("doc_id"),
      TextClassifier.normalizeVt(col("text")).as("text"))
    val curedFeats = TextClassifier
      .ngramFeatures(cured, "doc_id", "text")
      .as[(Long, String)].collect().map(_._2).toSeq
    val handNorm = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val handFeats = TextClassifier
      .ngramFeatures(handNorm, "doc_id", "text")
      .as[(Long, String)].collect().map(_._2).toSeq
    assert(curedFeats == handFeats)
    // and the full scorer agrees end-to-end on the cured text
    val w = TextClassifier.standInWeights(spark, 32)
    val a = TextClassifier.scoreDocs(cured, "doc_id", "text", w,
      32, 5L, 1000L).collect().toSeq
    val b = TextClassifier.scoreDocs(handNorm, "doc_id", "text", w,
      32, 5L, 1000L).collect().toSeq
    assert(a == b)
  }
}
