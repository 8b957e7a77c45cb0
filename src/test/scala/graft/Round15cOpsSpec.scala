package graft

import graft.ops.{Relational, Sampling}
import graft.similarity.Knn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 third wave: priority sampling (weighted, mergeable), KMV
  * join-cardinality estimation, the distributed 2-D skyline, and MMR
  * diversification — planted fixtures pinning the semantics the
  * registry oracles exercise only on natural data.
  */
class Round15cOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------- sampling

  test("prioritySample: matches a naive reimplementation of the " +
    "scaled-priority formula, and small strata emit everything " +
    "with est = w") {
    val rows = (1L to 100L).map(id => ("big", id, 10L + id % 37L))
    val df = rows.toDF("src", "id", "w")
    // naive oracle: same 44-bit hashes (fetched through the engine's
    // own hash44), exact BigInt floor division, (pk desc, id desc)
    val u = df.select($"id", Sampling.hash44($"id").as("u"))
      .as[(Long, Long)].collect().toMap
    val scale = BigInt(Sampling.PriorityScale)
    val pk = rows.map { case (_, id, w) =>
      id -> (BigInt(w) * scale / BigInt(u(id))) }.toMap
    val ranked = rows.map(_._2)
      .sortBy(id => (-pk(id), -id)) // pk desc, id desc
    val expected = ranked.take(16)
    val tau = (pk(ranked(16)).toDouble /
      Sampling.PriorityScale.toDouble)
    val out = Sampling.prioritySample(df, "src", "id", "w", k = 16)
      .collect()
    assert(out.length == 16)
    assert(out.map(_.getLong(1)).toSeq == (1L to 16L)) // rn exact 1..16
    assert(out.map(_.getLong(2)).toSeq == expected)
    // ŵ = max(w, τ) with τ from the 17th priority
    out.foreach { r =>
      assert(r.getDouble(4) == math.max(r.getLong(3).toDouble, tau))
    }

    val small = (1L to 5L).map(id => ("s", id, id * 7L))
      .toDF("src", "id", "w")
    val allIn = Sampling.prioritySample(small, "src", "id", "w", k = 16)
      .collect()
    assert(allIn.length == 5)
    // τ = 0 path: everything included, ŵ degenerates to w exactly
    allIn.foreach(r => assert(r.getDouble(4) == r.getLong(3).toDouble))
  }

  test("prioritySample: ids repeating ACROSS strata keep their own " +
    "stratum's weight in the join-back (no cross-stratum bleed)") {
    // same id in two strata with different weights: the sample row for
    // each stratum must carry THAT stratum's weight, and row counts
    // must not inflate (the join-back is keyed on (stratum, id))
    val df = Seq(("A", 1L, 10L), ("B", 1L, 99L), ("A", 2L, 5L),
      ("B", 3L, 7L)).toDF("src", "id", "w")
    val out = Sampling.prioritySample(df, "src", "id", "w", k = 4)
      .collect()
    assert(out.length == 4) // every row sampled once, none duplicated
    val wByStratumId = out.map(r =>
      (r.getString(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(wByStratumId(("A", 1L)) == 10L)
    assert(wByStratumId(("B", 1L)) == 99L)
  }

  test("prioritySample: merge-invariant — identical sample under any " +
    "partitioning (the bounded-buffer mergeability contract)") {
    val df = (1L to 500L).map(id => ("s", id, 1L + id % 17L))
      .toDF("src", "id", "w")
    def run(parts: Int) =
      Sampling.prioritySample(df.repartition(parts), "src", "id", "w",
        k = 8).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSeq
    assert(run(1) == run(7))
  }

  test("kmvJoinSize: fewer than k distinct keys degrades to the exact " +
    "size; at exactly k the k-th hash becomes a real threshold") {
    val a = Seq((1L, "x"), (1L, "x"), (2L, "x"), (3L, "x"))
      .toDF("key", "pad")
    val b = Seq((1L, "y"), (2L, "y"), (2L, "y"), (4L, "y"))
      .toDF("key", "pad")
    val r = Sampling.kmvJoinSize(a, b, "key", k = 64).collect()(0)
    // exact = fA(1)·fB(1) + fA(2)·fB(2) = 2·1 + 1·2 = 4
    assert(r.getAs[Long]("exact") == 4L)
    assert(r.getAs[Double]("est") == 4.0) // τ = 2^44 ⇒ est = S = exact
    assert(r.getAs[Double]("ratio") == 1.0)
    // boundary: EXACTLY k = 4 distinct union keys — the 4th-smallest
    // hash is now a genuine threshold (τ < 2^44), the sum covers the
    // k−1 keys below it, and the output is an estimate, not exact
    val rb = Sampling.kmvJoinSize(a, b, "key", k = 4).collect()(0)
    assert(rb.getAs[Long]("sampled_keys") == 3L)
    assert(rb.getAs[Long]("tau_scaled") < Sampling.PriorityScale)
    assert(rb.getAs[Double]("est") > 0.0)
  }

  test("kmvJoinSize: estimate tracks the exact size within 3x on a " +
    "300-key natural-skew join sampled at k = 32") {
    val a = (1L to 3000L).map(i => (i % 300L, 1)).toDF("key", "v")
    val b = (1L to 6000L).map(i => (i % 300L, 1)).toDF("key", "v")
    val r = Sampling.kmvJoinSize(a, b, "key", k = 32).collect()(0)
    val ratio = r.getAs[Double]("ratio")
    assert(ratio > 1.0 / 3 && ratio < 3.0,
      s"estimate off by more than 3x: ratio=$ratio")
  }

  // ----------------------------------------------------------- skyline

  test("skyline2d: strict-dominance frontier with duplicates, same-x " +
    "columns, and a cross-bucket dominator") {
    // bucketWidth 10: (95,5) lives in a LATER bucket than (12,4) and
    // dominates it cross-bucket; (12,9) survives as the y-champion;
    // duplicates (95,5)x2 both survive (neither strictly dominates);
    // (95,3) dies to its same-x sibling; (50,9) dies to (12,9)? NO —
    // x=50 > 12, y=9 = 9 ⇒ (50,9) dominates (12,9)!
    val pts = Seq(
      (1L, 12L, 9L), // dominated by (50,9): x 50>12, y equal
      (2L, 12L, 4L), // dominated by (95,5) cross-bucket
      (3L, 50L, 9L), // skyline (nothing has x>50 with y>=9)
      (4L, 95L, 5L), // skyline (duplicate pair)
      (5L, 95L, 5L), // skyline (duplicate pair)
      (6L, 95L, 3L), // dominated by same-x (95,5)
      (7L, 96L, 2L)  // skyline (max x)
    ).toDF("id", "x", "y")
    val sky = Relational.skyline2d(pts, "x", "y", bucketWidth = 10L)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(sky == Seq(3L, 4L, 5L, 7L))
  }

  test("skyline2d: agrees with the quadratic definition on random data " +
    "for every bucket width") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(60).toLong))
    val df = pts.toDF("id", "x", "y")
    val naive = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).sorted
    for (bw <- Seq(1L, 7L, 100L, 1000000L)) {
      val sky = Relational.skyline2d(df, "x", "y", bw)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(sky == naive, s"bucketWidth=$bw")
    }
  }

  // --------------------------------------------------------------- MMR

  test("mmrDiversify: picks the diverse candidate over a near-duplicate " +
    "when redundancy outweighs relevance") {
    // q=[1,1]: a and b are exact duplicates (rel = 1, sim(a,b) = 1);
    // c=[1,0] has rel ≈ 0.707. λ = 0.3: after selecting a,
    // mmr(b) = 0.3·1 − 0.7·1 = −0.4 < mmr(c) = 0.3·0.707 − 0.7·0.707
    // ≈ −0.283 ⇒ step 2 must pick c, not the duplicate b.
    val emb = Seq(
      (100L, Array(1f, 1f)), // the query
      (1L, Array(1f, 1f)),   // a (dup)
      (2L, Array(1f, 1f)),   // b (dup)
      (3L, Array(1f, 0f))    // c (diverse)
    ).toDF("vec_id", "embedding")
    val out = Knn.mmrDiversify(emb, emb.filter($"vec_id" === 100L),
        "vec_id", "embedding", kCand = 3, kSel = 3,
        mmrLambda = 0.3, oneMinusLambda = 0.7)
      .select($"step", $"selected_id").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out.map(_._2) == Seq(1L, 3L, 2L),
      s"expected dup deferred to step 3, got $out")
  }

  test("mmrDiversify: step 1 is the pure-relevance top hit and the " +
    "selection is distinct with exactly kSel steps per query") {
    val sf = TestSpark.sf
    val emb = Tables.embeddings(spark, sf)
    val out = Knn.mmrDiversify(emb, emb.filter($"vec_id" < 4),
        "vec_id", "embedding", kCand = 10, kSel = 4,
        mmrLambda = 0.7, oneMinusLambda = 0.3)
      .collect()
    assert(out.length == 16) // 4 queries × 4 steps
    val byQ = out.groupBy(_.getLong(0))
    val brute = Knn.bruteForceTopK(emb, emb.filter($"vec_id" < 4),
        "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().toMap
    byQ.foreach { case (q, rows) =>
      val ids = rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(ids.distinct == ids, s"query $q re-selected a candidate")
      assert(ids.head == brute(q),
        s"query $q step 1 must equal the relevance top-1")
    }
  }
}
