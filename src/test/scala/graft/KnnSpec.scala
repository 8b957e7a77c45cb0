package graft

import graft.functions.vector._
import graft.similarity.Knn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vec_dot / vec_l2 / vec_cosine match hand computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(vec_dot($"a", $"b"), vec_l2($"a"),
      vec_cosine($"a", $"a")).collect().head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("vector expressions work on array<double> too") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    assert(df.select(vec_cosine($"a", $"b")).as[Double].collect().head
      == 0.0)
  }

  test("vec_sq8: codes span ±127, maxabs element hits 127, zeros stay 0") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), // maxabs 1.0 → codes (64, -127, 32)
      (2L, Seq(0.0f, 0.0f, 0.0f))    // all-zero → all-zero codes
    ).toDF("id", "v")
    val got = df.orderBy($"id").select(vec_sq8($"v")).collect()
      .map(_.getSeq[Int](0).toSeq)
    assert(got(0) == Seq(64, -127, 32))
    assert(got(1) == Seq(0, 0, 0))
  }

  test("vec_i8_dot: exact integer dot of code vectors") {
    val df = Seq((Seq(127, -3, 2), Seq(1, 10, -2))).toDF("a", "b")
    assert(df.select(vec_i8_dot($"a", $"b")).as[Long].collect().head ==
      127L - 30L - 4L)
  }

  test("sq8 top-k recall vs brute force ≥ 0.7 on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter($"vec_id" < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Knn.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 10))
    val sq8 = pairs(Knn.sq8TopK(emb, queries, "vec_id", "embedding", 10))
    val recall = (brute intersect sq8).size.toDouble / brute.size
    assert(recall >= 0.7, s"sq8 recall $recall")
  }

  test("brute-force top-1 finds the planted nearest neighbor") {
    val q = Array.tabulate(8)(_.toFloat + 1)
    val near = q.map(_ * 2.0f) // same direction → cosine 1
    val others = (1 to 20).map(i =>
      (100L + i, Array.tabulate(8)(j =>
        math.sin(i * 8 + j).toFloat).toSeq))
    val corpus = (Seq((1L, q.toSeq), (2L, near.toSeq)) ++ others)
      .toDF("vec_id", "embedding")
    val top = Knn.bruteForceTopK(corpus,
        corpus.filter($"vec_id" === 1), "vec_id", "embedding", 1)
      .collect().head
    assert(top.getLong(1) == 2L)
  }

  test("LSH top-k recall vs brute force ≥ 0.5 on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter($"vec_id" < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Knn.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 10))
    val lsh = pairs(Knn.lshTopK(emb, queries, "vec_id", "embedding", 10,
      nPlanes = 3, multiProbe = 1))
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("sq8 rerank with corpus-wide candidates equals brute force") {
    // candidates = |corpus| makes stage 1 a no-op filter, so the exact
    // re-rank must reproduce the brute-force ranking verbatim
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter($"vec_id" < 5)
    val n = emb.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"rank")
        .orderBy($"query_id", $"rank")
        .as[(Long, Long, Int)].collect().toSeq
    val brute = rows(Knn.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 5))
    val rerank = rows(Knn.sq8RerankTopK(emb, queries, "vec_id",
      "embedding", k = 5, candidates = n))
    assert(rerank == brute)
    // and a tight candidate list still recalls most of the true top-k
    val tight = rows(Knn.sq8RerankTopK(emb, queries, "vec_id",
      "embedding", k = 5, candidates = 20)).map(t => (t._1, t._2)).toSet
    val bSet = brute.map(t => (t._1, t._2)).toSet
    assert((bSet & tight).size.toDouble / bSet.size >= 0.7)
  }

  test("PQ scoring routes are bit-identical: qtab-column (pq_qtab + " +
      "pq_adc, the distributed-query-set API), literal-table " +
      "(pq_adc_lit) and fused (pq_score_all, the pqTopK serving path)") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val cbs = Knn.pqCodebooks(emb, "vec_id", "embedding", m = 8, ksub = 8)
    val qdf = emb.filter($"vec_id" < 5)
    val qrows = qdf.select($"vec_id".cast("long"),
      $"embedding".cast("array<float>")).collect()
    val tabs = pq_tabs_flat(
      qrows.map(_.getSeq[Float](1).toArray).toSeq, cbs)
    val qids = qrows.map(_.getLong(0))
    // route 1: qtab as a broadcast join column
    val viaColumn = emb
      .select($"vec_id".as("nid"), pq_encode($"embedding", cbs).as("codes"))
      .join(broadcast(qdf.select($"vec_id".as("qid"),
        pq_qtab($"embedding", cbs).as("qtab"))), lit(true))
      .select($"qid", $"nid",
        pq_adc($"qtab", $"codes", cbs.head.length).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // route 2: literal tables + query index
    val idToIdx = qids.zipWithIndex.toMap
    val viaLit = emb
      .select($"vec_id".as("nid"), pq_encode($"embedding", cbs).as("codes"))
      .join(broadcast(qdf.select($"vec_id".as("qid"))), lit(true))
      .select($"qid", $"nid",
        pq_adc_lit($"codes",
          element_at(typedLit(idToIdx), $"qid".cast("long")),
          tabs, cbs.head.length).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // route 3: fused encode-once-score-all
    val viaFused = emb
      .select($"vec_id".as("nid"),
        posexplode(pq_score_all($"embedding", cbs, tabs))
          .as(Seq("qidx", "s")))
      .select(element_at(typedLit(qids), $"qidx" + 1).as("qid"),
        $"nid", $"s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(viaColumn.nonEmpty && viaColumn.keySet == viaLit.keySet &&
      viaColumn.keySet == viaFused.keySet)
    viaColumn.foreach { case (k, s) =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToRawLongBits(s) ==
        java.lang.Double.doubleToRawLongBits(viaLit(k)), s"lit route $k")
      assert(java.lang.Double.doubleToRawLongBits(s) ==
        java.lang.Double.doubleToRawLongBits(viaFused(k)), s"fused route $k")
    }
  }

  test("null array elements propagate NULL, never read as 0.0") {
    val df = Seq(
      (1L, Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 1.0f, 1.0f)),
      (2L, Seq[java.lang.Float](1.0f, 2.0f, 3.0f), Seq[java.lang.Float](1.0f, 1.0f, 1.0f))
    ).toDF("id", "a", "b")
    val out = df.select($"id", vec_dot($"a", $"b").as("d"),
        vec_cosine($"a", $"b").as("c"), vec_l2($"a").as("n"),
        lsh_bucket($"a", 4).as("bk"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2) &&
      out(0).isNullAt(3) && out(0).isNullAt(4))
    assert(out(1).getDouble(1) == 6.0) // clean rows unaffected
  }

  test("kmeans-seeded IVF cells are tighter-spread than md5-init cells") {
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf)
    val nCells = 16
    def occupancy(cents: Seq[(Long, Array[Float])]): Seq[Long] = {
      val scores = cents.map { case (cid, cvec) =>
        struct(vec_cosine($"embedding", typedLit(cvec)).as("sim"),
          lit(cid).as("cid"))
      }
      emb.withColumn("cell", greatest(scores: _*).getField("cid"))
        .groupBy($"cell").count().as[(Long, Long)].collect()
        .map(_._2).toSeq
    }
    def spread(occ: Seq[Long]): Double = {
      // relative std dev over ALL nCells slots (empty cells count as 0)
      val full = occ.padTo(nCells, 0L).map(_.toDouble)
      val m = full.sum / full.size
      math.sqrt(full.map(x => (x - m) * (x - m)).sum / full.size) / m
    }
    val md5Init = emb
      .select($"vec_id".cast("long").as("cid"),
        $"embedding".cast("array<float>").as("cvec"))
      .orderBy(md5($"cid".cast("string")), $"cid").limit(nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq
    val km = Knn.kmeansCentroids(emb, "vec_id", "embedding", nCells)
    val (sMd5, sKm) = (spread(occupancy(md5Init)), spread(occupancy(km)))
    info(f"occupancy rel-stddev md5=$sMd5%.3f kmeans=$sKm%.3f")
    assert(sKm < sMd5,
      f"kmeans seeding should balance cells: md5=$sMd5%.3f kmeans=$sKm%.3f")
  }

  test("lsh_bucket is deterministic and in range") {
    val emb = Tables.embeddings(spark, TestSpark.sf).limit(50)
    val b1 = emb.select($"vec_id", lsh_bucket($"embedding", 6).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val b2 = emb.select($"vec_id", lsh_bucket($"embedding", 6).as("b"))
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(b1 == b2)
    assert(b1.forall { case (_, b) => b >= 0 && b < 64 })
  }
}
