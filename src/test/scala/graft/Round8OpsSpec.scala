package graft

import graft.dedup.Dedup
import graft.similarity.Knn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operators: product-quantization ANN, SemDeDup-style semantic
  * dedup, deterministic stratified sampling.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pqCodebooks: m subspaces of ksub codewords, dim/m floats each") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val cbs = Knn.pqCodebooks(emb, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 0)
    assert(cbs.length == 8)
    assert(cbs.forall(_.length == 16))
    assert(cbs.forall(_.forall(_.length == 8)))
    // at iters=0 the subspaces are slices of the SAME sample vectors: the
    // concatenation of codeword j across subspaces is a corpus vector
    val full = (0 until 8).flatMap(mi => cbs(mi)(0).toSeq)
    val corpus = emb.select($"embedding").collect()
      .map(_.getSeq[Float](0).toSeq).toSet
    assert(corpus.contains(full))
  }

  test("Lloyd refinement reduces total quantization distortion") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val init = Knn.pqCodebooks(emb, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 0)
    val refined = Knn.pqCodebooks(emb, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 1)
    val vecs = emb.select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    def distortion(cbs: Seq[Seq[Array[Float]]]): Double = {
      val sub = cbs.head.head.length
      vecs.map { v =>
        cbs.indices.map { mi =>
          val s = v.slice(mi * sub, (mi + 1) * sub)
          cbs(mi).map(w => s.zip(w)
            .map { case (a, b) => (a - b).toDouble * (a - b) }.sum).min
        }.sum
      }.sum
    }
    val d0 = distortion(init); val d1 = distortion(refined)
    assert(d1 < d0, s"refined distortion $d1 not below init $d0")
  }

  test("pq top-k recall vs exact inner-product beats random by 15x") {
    // ADC approximates the INNER-PRODUCT ranking (the sum of subspace
    // dots), so recall is measured against the exact-dot top-k — the
    // cosine-correct serving path is the rerank variant below
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter($"vec_id" < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = broadcast(queries.select($"vec_id".as("query_id"),
      $"embedding".as("q_vec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id")
      .orderBy($"dot".desc, $"neighbor_id")
    val exactDot = pairs(emb
      .select($"vec_id".as("neighbor_id"), $"embedding".as("c_vec"))
      .join(q, $"query_id" =!= $"neighbor_id")
      .withColumn("dot", Knn.dot($"q_vec", $"c_vec"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10))
    val pq = pairs(Knn.pqTopK(emb, queries, "vec_id", "embedding", 10))
    val recall = (exactDot intersect pq).size.toDouble / exactDot.size
    // the harness embeddings are i.i.d. unit vectors — PQ's hardest
    // case (nothing to quantize toward); random top-10-of-500 overlap
    // is ~0.02, so 0.3 demonstrates genuine signal preservation
    assert(recall >= 0.3, s"pq recall $recall")
  }

  test("pq rerank: exact-cosine stage lifts recall over raw ADC") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter($"vec_id" < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Knn.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 5))
    val adc = pairs(Knn.pqTopK(emb, queries, "vec_id", "embedding", 5))
    val rr = pairs(Knn.pqRerankTopK(emb, queries, "vec_id", "embedding",
      k = 5, candidates = 25))
    val recallAdc = (brute intersect adc).size.toDouble / brute.size
    val recallRr = (brute intersect rr).size.toDouble / brute.size
    assert(recallRr >= recallAdc,
      s"rerank recall $recallRr < adc recall $recallAdc")
  }

  test("pq encoding is deterministic across repartitioning") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" < 3)
    def res(c: org.apache.spark.sql.DataFrame) =
      Knn.pqTopK(c, q, "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
    assert(res(emb) == res(emb.repartition(7)))
  }

  test("ivfPqTopK: equi probe join (no nested loop), deterministic") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" < 3)
    val out = Knn.ivfPqTopK(emb, q, "vec_id", "embedding", k = 5,
      nCells = 8, nProbe = 2, m = 8, ksub = 16)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the probe is an equi join on cell — the partition-pruned shape;
    // a nested loop here would mean the cell key was lost
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    def res(c: org.apache.spark.sql.DataFrame) =
      Knn.ivfPqTopK(c, q, "vec_id", "embedding", 5, 8, 2, 8, 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq
    assert(res(emb) == res(emb.repartition(7)))
  }

  test("ivfPqTopK: nProbe=nCells recovers full-scan pqTopK ranking") {
    // with every cell probed, IVF pruning is a no-op and the composition
    // must reduce to plain ADC ranking over the same codebooks
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
    val full = rows(Knn.ivfPqTopK(emb, q, "vec_id", "embedding", k = 5,
      nCells = 4, nProbe = 4, m = 8, ksub = 16))
    val pq = rows(Knn.pqTopK(emb, q, "vec_id", "embedding", k = 5,
      m = 8, ksub = 16))
    assert(full == pq)
  }

  test("semDedup removes the planted duplicate, keeps the min-id copy") {
    val emb = Tables.embeddings(spark, TestSpark.sf).limit(30)
      .select($"vec_id", $"embedding")
    // vector 1000 duplicates vector 7 exactly: same cell (identical
    // centroid cosines, deterministic argmax), in-cell cosine = 1
    val dupVec = emb.filter($"vec_id" === 7).select($"embedding")
      .collect().head.getSeq[Float](0)
    val df = emb.union(Seq((1000L, dupVec)).toDF("vec_id", "embedding"))
    val out = Dedup.semDedup(df, "vec_id", "embedding",
      nClusters = 4, threshold = 0.999999)
    val kept = out.filter($"kept").select($"vec_id")
      .as[Long].collect().toSet
    assert(kept.contains(7L) && !kept.contains(1000L),
      "min-id copy must survive, duplicate must be removed")
    assert(out.count() == 31, "one row per input vector")
  }

  test("semDedup: all-distinct corpus survives intact") {
    val emb = Tables.embeddings(spark, TestSpark.sf).limit(30)
    val out = Dedup.semDedup(emb, "vec_id", "embedding",
      nClusters = 4, threshold = 0.999999)
    assert(out.filter(!$"kept").count() == 0)
  }

  test("degenerate corpora: pq/ivfpq/semDedup survive 0-1 row inputs") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val one = Seq((7L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    // empty corpus: pqCodebooks' sample is empty → brute-force fallback
    // returns an empty result instead of throwing
    assert(Knn.pqTopK(empty, empty, "vec_id", "embedding",
      k = 3, m = 2, ksub = 4).count() == 0)
    // 1-row corpus: <2 k-means centroids → brute-force fallback; the
    // only (query, neighbor) pair is the self-pair, which is excluded
    assert(Knn.ivfPqTopK(one, one, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 2, m = 2, ksub = 4).count() == 0)
    // semDedup on 0-1 rows: single-cell assignment, trivial pairwise
    val sd = Dedup.semDedup(one, "vec_id", "embedding",
      nClusters = 4, threshold = 0.9)
    assert(sd.count() == 1 && sd.filter($"kept").count() == 1)
    assert(Dedup.semDedup(empty, "vec_id", "embedding",
      nClusters = 4, threshold = 0.9).count() == 0)
  }

  test("PqEncode/PqQueryTable equality is content-based, not array-ref") {
    import graft.functions.{PqEncode, PqQueryTable}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val child = BoundReference(0, ArrayType(FloatType), nullable = true)
    // identical codebooks built as SEPARATE arrays: reference equality
    // would report unequal and defeat semanticEquals-driven plan reuse
    def flat() = Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f, 8.0f)
    val e1 = PqEncode(child, flat(), 2, 2, 2)
    val e2 = PqEncode(child, flat(), 2, 2, 2)
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
    val q1 = PqQueryTable(child, flat(), 2, 2, 2)
    val q2 = PqQueryTable(child, flat(), 2, 2, 2)
    assert(q1 == q2 && q1.semanticEquals(q2))
    // different content must still compare unequal; and the two classes
    // must never compare equal to each other despite identical fields
    assert(e1 != PqEncode(child, flat().map(_ + 1.0f), 2, 2, 2))
    assert(!e1.equals(q1) && !q1.equals(e1))
  }

  test("semDedup degenerate: lone surviving centroid keeps its own id") {
    // identical vectors: every seed is equal, the argmax tiebreak sends
    // all members to the HIGHEST seed id, the other seeds lose all
    // members and drop out — the lone survivor has a NONZERO id (2 for
    // 3 rows), and the cell label must be that id, exactly as the
    // oracle's cells CTE would label it (not a hardcoded 0)
    val v = Seq.fill(8)(0.5f)
    val df = Seq((10L, v), (11L, v), (12L, v)).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding",
      nClusters = 4, threshold = 0.9)
    assert(out.select($"cell").distinct().as[Long].collect().toSeq ==
      Seq(2L))
    assert(out.filter($"kept").select($"vec_id").as[Long]
      .collect().toSeq == Seq(10L), "min-id copy survives")
  }

  test("autoSemDedupClusters: monotone, clamped, occupancy-targeted") {
    import graft.dedup.Dedup.autoSemDedupClusters
    assert(autoSemDedupClusters(0) == 2 && autoSemDedupClusters(1) == 2)
    assert(autoSemDedupClusters(500) == 4) // ceil(500/128)
    assert(autoSemDedupClusters(128L * 70000) == 65536) // broadcast cap
    val xs = Seq(10L, 1000L, 100000L, 10000000L)
      .map(autoSemDedupClusters(_))
    assert(xs == xs.sorted, "cell count must grow with the corpus")
  }

  test("semDedupAuto == semDedup at the derived cluster count") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val auto = Dedup.semDedupAuto(emb, "vec_id", "embedding",
      threshold = 0.5)
    val pinned = Dedup.semDedup(emb, "vec_id", "embedding",
      Dedup.autoSemDedupClusters(emb.count()), threshold = 0.5)
    assert(auto.orderBy($"vec_id").collect().toSeq ==
      pinned.orderBy($"vec_id").collect().toSeq)
  }

  test("stratified md5 sampling is repartition-stable (unlike sample())") {
    val docs = Tables.documents(spark, TestSpark.sf)
    def sampleIds(df: org.apache.spark.sql.DataFrame): Set[Long] = df
      .withColumn("u", md5($"doc_id".cast("string")))
      .filter($"u" < lit("8"))
      .select($"doc_id").as[Long].collect().toSet
    val a = sampleIds(docs)
    val b = sampleIds(docs.repartition(13))
    assert(a == b, "hash-threshold sample must not depend on layout")
    assert(a.nonEmpty && a.size < docs.count())
  }
}
