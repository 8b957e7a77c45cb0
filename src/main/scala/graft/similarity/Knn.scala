package graft.similarity

import graft.functions.vector._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), two tiers:
  *
  *  - brute-force cosine top-k: the correctness baseline. Queries are
  *    broadcast (a query set is small by definition); the corpus streams —
  *    one pass, no corpus shuffle; per-query top-k via a partitioned
  *    window over the scored pairs.
  *  - LSH-bucketed ANN: corpus bucketed by deterministic random-hyperplane
  *    signs; a query probes only its bucket, turning the O(N) scan into
  *    O(N / 2^planes) with recall controlled by the plane count. At 100 TB
  *    the corpus is written `bucketBy(bucket)` so the probe is a
  *    partition-pruned scan; the bucket equi-join here has the same plan
  *    shape.
  *
  * All vector math is codegen'd native expressions (graft.functions) — a
  * fused primitive loop per pair, no boxing, inside whole-stage codegen.
  */
object Knn {

  private val occupancyLogged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def dot(a: Column, b: Column): Column = vec_dot(a, b)
  def l2norm(a: Column): Column = vec_l2(a)
  def cosine(a: Column, b: Column): Column = vec_cosine(a, b)

  /** Brute-force per-query cosine top-k. `queries` must be small (it is
    * broadcast); `corpus` scales. Ties broken by corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"))
    // rank on the UNROUNDED cosine (rounding first would manufacture ties
    // the oracle does not have); round only the displayed column
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_raw", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_raw"), 6).as("cosine"))
  }

  /** IVF-style ANN: a small deterministic centroid sample partitions the
    * corpus into data-adaptive cells (unlike LSH's data-oblivious planes);
    * each query probes the `nProbe` nearest cells.
    *
    * Scale path: centroid selection is a tiny deterministic sample
    * (hash-ordered take(k) — metadata-sized, broadcast as literals);
    * assignment is one scan with the codegen'd cosine kernel; at rest the
    * corpus is written partitioned/bucketed by `cell` so probes prune
    * partitions. Queries explode ×nProbe on the broadcast side only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16,
              nProbe: Int = 2, logOccupancy: Boolean = false): DataFrame = {
    // deterministic centroid sample: smallest md5(id-as-string) wins — a
    // cheap, seedless, reproducible spread (kmeans init would go here) that
    // any md5-capable engine reproduces, making the whole operator
    // verifiable against an independent oracle. The centroid set is
    // metadata-sized, so it is collected once and inlined as literals: cell
    // assignment becomes a PURE MAP over the corpus (greatest over nCells
    // scored structs — no join, no shuffle; at rest the corpus is written
    // partitioned by this `cell` column).
    val centroids: Array[(Long, Array[Float])] = corpus
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<float>").as("cvec"))
      .orderBy(md5(col("cid").cast("string")), col("cid"))
      .limit(nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // degenerate corpora: 0 centroids -> brute force is the only sensible
    // answer; 1 centroid -> everything lands in that single cell
    if (centroids.length < 2)
      return bruteForceTopK(corpus, queries, idCol, vecCol, k)
    ivfTopKWithCentroids(corpus, queries, idCol, vecCol, k,
      centroids.toSeq, nProbe, logOccupancy)
  }

  /** IVF probe/score stage against a GIVEN centroid set — the seam that
    * lets better inits (e.g. the 2-iteration Lloyd k-means centroids of
    * e_kmeans_lloyd) feed the same cell assignment, probe explosion and
    * ranked scoring as the md5-sample init. Centroids are metadata-sized
    * and inlined as literals: assignment stays a pure map. */
  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int,
                           centroids: Seq[(Long, Array[Float])],
                           nProbe: Int = 2,
                           logOccupancy: Boolean = false): DataFrame = {
    def cellScores(vec: Column): Seq[Column] = centroids.map {
      case (cid, cvec) =>
        struct(cosine(vec, typedLit(cvec)).as("sim"), lit(cid).as("cid"))
    }
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("cell",
        greatest(cellScores(col("c_vec")): _*).getField("cid"))
    if (logOccupancy) {
      // probe-cost evidence: per-cell candidate counts (≤nCells rows).
      // ONCE per (corpus plan, params) per JVM — this is an eager
      // diagnostic job, and repeated bench runs / plan dumps of the
      // same query must not re-pay a corpus scan for a histogram that
      // cannot have changed
      val memoKey = s"${centroids.length}:$nProbe:" +
        s"${centroids.map(_._1).hashCode()}:" +
        s"${corpus.queryExecution.logical.semanticHash()}"
      if (occupancyLogged.add(memoKey)) {
        val occ = c.groupBy(col("cell")).count().orderBy(col("cell"))
          .collect()
        System.err.println(s"[ivf] nCells=${centroids.length} " +
          s"nProbe=$nProbe occupancy: " +
          occ.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
      }
    }
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("__probe",
        explode(slice(sort_array(array(cellScores(col("q_vec")): _*),
          asc = false), 1, nProbe)))
      .withColumn("cell", col("__probe.cid"))
      .drop("__probe"))
    val scored = c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_raw", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_raw"), 6).as("cosine"))
  }

  /** Deterministic 2-pass Lloyd k-means centroids (the e_kmeans_lloyd
    * recipe as a reusable init for the IVF tier): md5-ordered seed set,
    * one argmax-cosine assignment (pure map over centroid literals), one
    * per-(cluster, dim) mean update ROUNDED to 6 dp — the rounding kills
    * last-ulp summation-order divergence so any engine reproduces the
    * centroids bit-for-bit. Driver traffic is k×dim rows; each pass is
    * one corpus scan + one fixed-size aggregation. Clusters that lose
    * every member in the assignment pass drop out of the result
    * (occupancy-0 cells would never be probed anyway).
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int): Seq[(Long, Array[Float])] = {
    val cent0: Seq[(Long, Array[Float])] = corpus
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<float>").as("cvec"))
      .orderBy(md5(col("cid").cast("string")), col("cid"))
      .limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](1).toArray) }
      .toSeq
    if (cent0.length < 2) return cent0 // greatest() needs ≥2 cells
    val dim = cent0.head._2.length
    val scores = cent0.map { case (cl, cvec) =>
      struct(cosine(col("v"), typedLit(cvec)).as("sim"),
        lit(cl).as("cid"))
    }
    corpus.select(col(vecCol).as("v"))
      .withColumn("cl", greatest(scores: _*).getField("cid"))
      .select(col("cl"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cl"), col("dim"))
      .agg(round(avg(col("x").cast("double")), 6).as("m"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (cl, rows) =>
        val vec = new Array[Float](dim)
        rows.foreach(r => vec(r.getInt(1)) = r.getDouble(2).toFloat)
        (cl, vec)
      }.toSeq.sortBy(_._1)
  }

  /** Scalar-quantized (int8) ANN top-k — the memory-bandwidth tier: each
    * vector is quantized ONCE at scan time to int8 codes (symmetric
    * per-vector scale, `vec_sq8`), and candidate scoring is the EXACT
    * integer dot product of code vectors (`vec_i8_dot`). 4× less data
    * through the scoring join than float32, integer ALU instead of FP,
    * and — because integer addition is associative — a ranking that is
    * bit-reproducible on any engine, so the whole approximate tier
    * stays under the oracle gate. At rest the codes column is what
    * ships/persists; the float column is only needed for an optional
    * exact re-rank of the short candidate list.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      vec_sq8(col(vecCol)).as("q_codes")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      vec_sq8(col(vecCol)).as("c_codes"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", vec_i8_dot(col("q_codes"), col("c_codes")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("qdot"))
  }

  /** Two-stage ANN serving shape: int8 CANDIDATE GENERATION then exact
    * float RE-RANK of the short list — the standard production retrieval
    * pattern. Stage 1 is [[sq8TopK]]'s integer-dot scoring over code
    * vectors only (4× less data through the corpus-wide join, bit-
    * reproducible candidate set); stage 2 joins the ≤`candidates`-per-
    * query id list BACK to the corpus to fetch float vectors — full-
    * precision cosines are computed for candidates only, so the float
    * column never rides the wide join. Both stages are deterministic,
    * so the composition stays under the exact oracle gate.
    */
  def sq8RerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, candidates: Int): DataFrame = {
    require(candidates >= k, "candidate list must be at least k")
    val q8 = broadcast(queries.select(col(idCol).as("query_id"),
      vec_sq8(col(vecCol)).as("q_codes")))
    val c8 = corpus.select(col(idCol).as("neighbor_id"),
      vec_sq8(col(vecCol)).as("c_codes"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("neighbor_id"))
    val cand = c8.join(q8, col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", vec_i8_dot(col("q_codes"), col("c_codes")))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= candidates)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id"))
    cand
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("c_vec")), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("cosine_raw", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_raw"), 6).as("cosine"))
  }

  /** Bucketed ANN top-k with multi-probe: each query probes its own bucket
    * plus (radius-1) every bucket one sign-flip away — the standard recall
    * lever that costs `nPlanes` extra probes per QUERY (the small side)
    * while the corpus is still touched once per bucket.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 6,
              multiProbe: Int = 1): DataFrame = {
    val qb = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"),
      lsh_bucket(col(vecCol), nPlanes).as("bucket0"))
    require(multiProbe >= 0 && multiProbe <= 2,
      "multiProbe is the probe Hamming radius; 0, 1 and 2 are supported")
    val radius1 = (0 until nPlanes).map(p => 1L << p)
    val masks: Seq[Long] = (Seq(0L) ++
      (if (multiProbe >= 1) radius1 else Nil) ++
      (if (multiProbe >= 2)
        for { i <- 0 until nPlanes; j <- (i + 1) until nPlanes }
          yield (1L << i) | (1L << j)
      else Nil)).distinct
    val probeCols = masks.map(m => col("bucket0").bitwiseXOR(lit(m)))
    val q = broadcast(qb
      .withColumn("bucket", explode(array(probeCols: _*)))
      .drop("bucket0"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      lsh_bucket(col(vecCol), nPlanes).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_raw", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_raw"), 6).as("cosine"))
  }
}
