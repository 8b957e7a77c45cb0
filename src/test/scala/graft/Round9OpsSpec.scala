package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators: the cross-document span scrub action. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spanScrub removes cross-doc duplicated spans from ALL docs, " +
    "keeps within-doc repeats and unique spans") {
    // spanTokens=2: docs 1 and 2 share the chunk "x y"; doc 3 repeats
    // "r r" twice WITHIN itself only — cross-doc rule must not fire
    val docs = Seq(
      (1L, "x y a b"),   // chunks: "x y" (hot), "a b"
      (2L, "x y c d"),   // chunks: "x y" (hot), "c d"
      (3L, "r r r r")    // chunks: "r r", "r r" — same doc only
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs, "doc_id", "text",
        spanTokens = 2, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, "a b"),
      (2L, 2L, 1L, "c d"),
      (3L, 2L, 0L, "r r r r")))
  }

  test("spanScrub: fully-duplicated doc scrubs to empty, counts intact") {
    val docs = Seq(
      (1L, "p q"), (2L, "p q"), (3L, "p q z w")
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs, "doc_id", "text",
        spanTokens = 2, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, ""), (2L, 1L, 1L, ""), (3L, 2L, 1L, "z w")))
  }

  test("property: spanScrub == naive reference on random corpora") {
    // naive Scala reference: same chunking, hot set = chunks in ≥2
    // distinct docs, rebuild from surviving chunks in order
    def naive(docs: Seq[(Long, String)], span: Int)
        : Seq[(Long, Long, Long, String)] = {
      def chunksOf(text: String): Seq[String] = {
        val toks = text.split(" ", -1).toSeq
        val n = math.max(math.ceil(toks.size / span.toDouble).toInt, 1)
        (0 until n).map(j => toks.slice(j * span, j * span + span)
          .mkString(" "))
      }
      val perDoc = docs.map { case (id, t) => id -> chunksOf(t) }
      val hot = perDoc.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
        .groupBy(_._1).collect { case (c, xs) if xs.size >= 2 => c }.toSet
      perDoc.map { case (id, cs) =>
        val kept = cs.filterNot(hot)
        (id, cs.size.toLong, (cs.size - kept.size).toLong,
          kept.mkString(" "))
      }
    }
    val rnd = new scala.util.Random(17)
    val words = Seq("a", "b", "c", "d", "e")
    for (trial <- 1 to 4) {
      val span = 1 + rnd.nextInt(3)
      val docs = (1L to 25L).map(i => i ->
        Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
          .mkString(" "))
      val got = Dedup.spanScrub(docs.toDF("doc_id", "text"),
          "doc_id", "text", spanTokens = span, minDocs = 2)
        .orderBy($"doc_id")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got == naive(docs, span), s"trial=$trial span=$span")
    }
  }

  test("atRestProbeTopK with nProbe=nCells recovers the full ranking") {
    // probing EVERY cell must equal scoring the whole corpus — the
    // pruning is recall-lossless when nothing is pruned
    val emb = Tables.embeddings(spark, TestSpark.sf).limit(80)
    val cents = graft.similarity.Knn.kmeansCentroids(
      emb, "vec_id", "embedding", k = 4)
    def cellScores(vec: org.apache.spark.sql.Column) =
      cents.map { case (cid, cvec) =>
        struct(graft.similarity.Knn.cosine(vec, typedLit(cvec))
          .as("sim"), lit(cid).as("cid"))
      }
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-atrest-").toFile
    try {
      val p = s"${tmp.getAbsolutePath}/idx"
      emb.select($"vec_id", $"embedding",
          greatest(cellScores($"embedding"): _*).getField("cid")
            .as("cell"))
        .write.partitionBy("cell").parquet(p)
      val queries = emb.filter($"vec_id" < 5)
      val got = graft.similarity.Knn.atRestProbeTopK(spark, p, cents,
          queries, "vec_id", "embedding", k = 5, nProbe = cents.length)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Long)].collect().toSeq
      val want = graft.similarity.Knn.bruteForceTopK(emb, queries,
          "vec_id", "embedding", k = 5)
        .select($"query_id", $"neighbor_id", $"rank".cast("long"))
        .orderBy($"query_id", $"rank")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == want)
    } finally graft.queries.Scratch.rmTree(tmp)
  }

  test("vec_argmax_cosine == greatest-over-structs expansion, incl. ties") {
    import graft.functions.vector.{vec_argmax_cosine, vec_cosine}
    val rnd = new scala.util.Random(23)
    val dim = 16
    def v() = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    // duplicate centroid vectors under different ids plant exact
    // cosine ties — the struct comparison resolves to the larger cid,
    // and the kernel must match bit-for-bit
    val shared = v()
    val cents: Seq[(Long, Array[Float])] =
      Seq(3L -> shared, 7L -> shared) ++
        (10L to 40L by 3).map(_ -> v())
    val rows = (1L to 200L).map(i => (i, v().toSeq)) :+
      (500L, shared.toSeq) // exact match on the duplicated centroid
    val df = rows.toDF("id", "vec")
    val scores = cents.map { case (cl, cvec) =>
      struct(vec_cosine($"vec", typedLit(cvec)).as("sim"),
        lit(cl).as("cid"))
    }
    val got = df.select($"id",
        vec_argmax_cosine($"vec", cents).as("cell"))
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    val want = df.select($"id",
        greatest(scores: _*).getField("cid").as("cell"))
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(got == want)
    // the planted tie resolves to the larger id on both paths
    assert(got.last == (500L, 7L))
  }

  test("spanScrub: short docs (< spanTokens) form one chunk") {
    val docs = Seq((1L, "solo"), (2L, "solo"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs, "doc_id", "text",
        spanTokens = 8, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, ""), (2L, 1L, 1L, ""), (3L, 1L, 0L, "other")))
  }
}
