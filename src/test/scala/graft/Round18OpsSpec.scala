package graft

import graft.ops.{ModelIo, TextClassifier}
import graft.similarity.{EmbedInference, IntIvf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 first wave: the model-artifact lifecycle (parquet
  * export/load round-trips exactly; sparse or duplicated ON-DISK
  * exports fail loudly at serve time through the existing coverage
  * guards) and the integer-domain IVF kernel (exhaustive probing is
  * provably identical to brute force; partial probing is a subset).
  */
class Round18OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ModelIo: classifier export round-trips bit-for-bit and " +
    "serves identically; sparse / duplicated on-disk exports fail " +
    "loudly at load-and-serve") {
    val dim = 64
    val w = TextClassifier.standInWeights(spark, dim)
    val path = ModelIo.tmpModelDir("spec_clf_w64")
    ModelIo.exportModel(w, path)
    val back = ModelIo.loadModel(spark, path)
    assert(back.count() == dim.toLong)
    assert(back.join(w.withColumnRenamed("wgt", "w0"), "fid")
      .filter($"wgt" =!= $"w0").count() == 0)

    val docs = Seq((1L, "a b c a"), (2L, "x y"), (3L, "q"))
      .toDF("doc_id", "text")
    def rows(weights: org.apache.spark.sql.DataFrame) =
      TextClassifier.scoreDocs(docs, "doc_id", "text", weights, dim,
        thrNum = 0L, thrDen = 1L).orderBy($"doc_id").collect().toSeq
    assert(rows(back) == rows(w))

    // a sparse export (one fid dropped) must raise at serve, not
    // silently change every doc's n_feats and dot
    val sparsePath = ModelIo.tmpModelDir("spec_clf_sparse")
    ModelIo.exportModel(w.filter($"fid" =!= 7L), sparsePath)
    val e = intercept[IllegalArgumentException] {
      TextClassifier.scoreDocs(docs, "doc_id", "text",
        ModelIo.loadModel(spark, sparsePath), dim, 0L, 1L)
    }
    assert(e.getMessage.contains("EXACTLY one row per fid"))

    // a duplicated-row export must raise too (silent double-count)
    val dupPath = ModelIo.tmpModelDir("spec_clf_dup")
    ModelIo.exportModel(w.union(w.limit(1)), dupPath)
    intercept[IllegalArgumentException] {
      TextClassifier.scoreDocs(docs, "doc_id", "text",
        ModelIo.loadModel(spark, dupPath), dim, 0L, 1L)
    }
  }

  test("ModelIo: projection export round-trips exactly through " +
    "embedDocs; a sparse on-disk projection fails loudly") {
    val (dim, outDim) = (32, 4)
    val p = EmbedInference.standInProjection(spark, dim, outDim)
    val path = ModelIo.tmpModelDir("spec_proj_32x4")
    ModelIo.exportModel(p, path)
    val docs = Seq((1L, "a b c"), (2L, "b c d e")).toDF("doc_id", "text")
    def rows(weights: org.apache.spark.sql.DataFrame) =
      EmbedInference.embedDocs(docs, "doc_id", "text", weights, dim,
        outDim).orderBy($"doc_id", $"j").collect().toSeq
    assert(rows(ModelIo.loadModel(spark, path)) == rows(p))

    val sparsePath = ModelIo.tmpModelDir("spec_proj_sparse")
    ModelIo.exportModel(
      p.filter(!($"fid" === 3L && $"j" === 1L)), sparsePath)
    intercept[IllegalArgumentException] {
      EmbedInference.embedDocs(docs, "doc_id", "text",
        ModelIo.loadModel(spark, sparsePath), dim, outDim)
    }
  }

  test("IntIvf: exhaustive probing (nProbe = nCells) is identical " +
    "to brute-force exact MIPS; dotL is an exact BIGINT kernel") {
    // dotL: signed, large-magnitude exactness
    val d = Seq((1L, Seq(1000000L, -2000000L, 3L),
        Seq(4000000L, 5000000L, -6L)))
      .toDF("id", "a", "b")
      .select(IntIvf.dotL($"a", $"b").as("dot")).head().getLong(0)
    assert(d == 1000000L * 4000000L - 2000000L * 5000000L - 18L)

    // 40 docs, 3-dim integer vectors with collisions and negatives
    val vecs = spark.range(0, 40)
      .select($"id".as("doc_id"),
        array(($"id" % 7) - 3L, ($"id" % 5) * 2L - 4L, $"id" % 3)
          .as("vec"))
      .localCheckpoint()
    val qs = vecs.filter($"doc_id" % 9 === 0)
    val cents = IntIvf.md5Centroids(vecs, "doc_id", 4).toSeq
    assert(cents.length == 4)

    val ivfAll = IntIvf
      .ivfMipsTopK(vecs, qs, "doc_id", k = 3, cents, nProbe = 4)
      .orderBy($"query_id", $"rank").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"dot".desc, $"neighbor_id")
    val brute = vecs
      .select($"doc_id".as("neighbor_id"), $"vec".as("c_vec"))
      .crossJoin(broadcast(qs.select($"doc_id".as("query_id"),
        $"vec".as("q_vec"))))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("dot", IntIvf.dotL($"q_vec", $"c_vec"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id", $"dot",
        $"rank".cast("long").as("rank"))
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(ivfAll == brute)

    // partial probing returns k rows per query from probed cells
    // only — a subset of the brute candidate set, ranks contiguous
    val ivf1 = IntIvf
      .ivfMipsTopK(vecs, qs, "doc_id", k = 3, cents, nProbe = 2)
      .collect()
    val perQ = ivf1.groupBy(_.getLong(0))
    assert(perQ.values.forall(rs =>
      rs.map(_.getLong(3)).sorted.sameElements(1L to rs.length)))
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    // probed-cell candidates score with the SAME exact dot kernel
    val bd = brute.map(r => ((r.getLong(0), r.getLong(1)),
      r.getLong(2))).toMap
    assert(ivf1.forall(r => bd.get((r.getLong(0), r.getLong(1)))
      .forall(_ == r.getLong(2))))
    assert(bruteSet.nonEmpty)
  }

  test("curationStatsInline ≡ curationStats row for row (incl. " +
    "repetition-heavy, stopword-free, single-token, symbol-laden " +
    "and NULL-text docs) and rejects a sparse weight map") {
    import graft.ops.TextStats
    val dim = 32
    val wdf = TextClassifier.standInWeights(spark, dim)
    val wmap = wdf.collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val docs = Seq(
      (1L, "the cat sat on the mat with the hat of doom"),
      (2L, "spam spam spam spam spam spam spam spam"),
      (3L, "a b a b a b a b a b a b"),
      (4L, "one"),
      (5L, "### ... ....... #a#b# x...y...z"),
      (6L, "  padded   whitespace\tand tabs  "),
      (7L, null.asInstanceOf[String]),
      (8L, "")).toDF("doc_id", "text")
    val batch = TextStats.curationStats(docs, "doc_id", "text",
      wdf, dim).orderBy($"doc_id").collect().toSeq
    val inline = TextStats.curationStatsInline(docs, "doc_id",
      "text", wmap, dim).orderBy($"doc_id").collect().toSeq
    assert(inline == batch)
    // the inline plan is a pure map: no exchange anywhere
    val plan = TextStats.curationStatsInline(docs, "doc_id", "text",
      wmap, dim).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException] {
      TextStats.curationStatsInline(docs, "doc_id", "text",
        wmap - 3L, dim)
    }
  }

  test("IntIvf.denseVectors: j-ordered exact longs; NULL-text docs " +
    "absent upstream stay absent") {
    val emb = Seq((1L, 2L, 30L), (1L, 0L, 10L), (1L, 1L, -20L),
      (2L, 0L, 5L), (2L, 1L, 6L), (2L, 2L, 7L))
      .toDF("doc_id", "j", "e")
    val v = IntIvf.denseVectors(emb, "doc_id").orderBy($"doc_id")
      .collect()
    assert(v(0).getSeq[Long](1) == Seq(10L, -20L, 30L))
    assert(v(1).getSeq[Long](1) == Seq(5L, 6L, 7L))
  }
}
