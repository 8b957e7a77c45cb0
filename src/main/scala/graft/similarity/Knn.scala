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

  /** Training-artifact cache: codebooks / centroids are INDEX-BUILD
    * products — built once per (corpus, params) and then served from,
    * like the at-rest layouts. [[kmeansCentroids]] and [[pqCodebooks]]
    * route through here, so the two-stage shapes (ivfPqTopK trains both
    * structures; pqRerankTopK's candidate stage re-enters pqTopK) pay
    * the build once per (corpus, params) per JVM instead of per call.
    * Keyed by the corpus plan's semantic hash + params; the stored
    * canonicalized plan is re-checked with `sameResult` on every hit, so
    * a hash collision degrades to a recompute, never to wrong artifacts.
    * Entries are k×dim / m×ksub×(dim/m) floats — metadata-sized; the map
    * is cleared past 64 entries (crude but sufficient: a JVM serving
    * more than 64 distinct (corpus, params) index builds is rebuilding
    * indexes anyway, and clear() only costs a retrain).
    */
  private val trainedCache = new java.util.concurrent.ConcurrentHashMap[
    String,
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, AnyRef)]()

  private def cached[T <: AnyRef](corpus: DataFrame, key: String)
                                 (train: => T): T = {
    val plan = corpus.queryExecution.analyzed
    val k = s"${plan.semanticHash()}:$key"
    trainedCache.get(k) match {
      case (p, v) if p.sameResult(plan) => v.asInstanceOf[T]
      case _ =>
        val v = train
        if (trainedCache.size > 64) trainedCache.clear()
        trainedCache.put(k, (plan, v))
        v
    }
  }

  /** Bounded deterministic training set for the learned index structures
    * (the IVF k-means mean pass, PQ Lloyd refinement): the md5-ordered
    * first [[TrainSampleN]] corpus vectors — the same seedless sampling
    * recipe as the centroid/codebook seeds, so any md5-capable engine
    * replays it. 16384 ≈ 256×ksub at the default ksub=64, far above the
    * statistical need of the k×dim / m×ksub×(dim/m) cell means being
    * estimated, and it makes EVERY training pass a fixed-row-count job:
    * at 100 TB the index build reads the corpus once to take the sample
    * (TakeOrderedAndProject — per-partition top-N + merge, no full-sort
    * shuffle) and never again until the single encode/assignment pass
    * that IS the index. The oracle SQL replays the same ORDER BY md5
    * LIMIT bound (OracleGen.kmeansCellsCtes / pqChainCtes), so sampled
    * training stays under the exact-hash gate at any scale factor.
    */
  val TrainSampleN: Int = 16384

  /** (cid, cvec) rows of the training sample, ready for both the seed
    * take(k) and the mean/refinement passes. */
  private def trainSet(corpus: DataFrame, idCol: String,
                       vecCol: String): DataFrame =
    corpus.select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<float>").as("cvec"))
      .orderBy(md5(col("cid").cast("string")), col("cid"))
      .limit(TrainSampleN)

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

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998): from each query's `kCand` nearest candidates, greedily
    * select `kSel` results balancing relevance against redundancy —
    * step 1 takes the most relevant candidate, and each later step takes
    * argmax of `mmrLambda·rel − (1−mmrLambda)·max_{s∈selected} sim(c,s)`.
    * The standard answer-diversification layer over an ANN retriever
    * (near-duplicate corpus hits otherwise fill the whole top-k).
    *
    * Scale: the expensive stage is the initial top-`kCand`, which is
    * exactly the serving path (brute here as the exact baseline; the
    * IVF/LSH tiers slot in unchanged). Everything after is bounded by
    * the CANDIDATE set, not the corpus: the candidate frame and its
    * kCand·(kCand−1) pairwise sims are localCheckpoint'd once
    * (|Q|·kCand² rows), and each greedy step is a join/agg over those
    * bounded frames — cost independent of corpus size, `kSel` plan-fixed
    * steps, each step's result checkpointed so plans don't nest.
    *
    * Cross-engine exactness: rel and sim are the codegen'd fused cosine
    * (bit-identical to the oracle's expansion); the MMR score is the
    * fixed IEEE chain `λ·rel − (1−λ)·maxsim` with both coefficients as
    * LITERALS on both sides (1−0.7 in doubles is 0.30000000000000004 —
    * the caller passes λ and oneMinusLambda explicitly so both engines
    * use the same two constants); ranks tie-break on candidate id.
    */
  def mmrDiversify(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, kCand: Int, kSel: Int,
                   mmrLambda: Double, oneMinusLambda: Double): DataFrame = {
    require(kCand >= kSel && kSel >= 1,
      s"need kCand >= kSel >= 1, got kCand=$kCand kSel=$kSel")
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("c_vec"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cid"))
    val cand = c.join(q, col("query_id") =!= col("cid"))
      .withColumn("rel", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rn", row_number().over(wRel))
      .filter(col("rn") <= kCand)
      .select(col("query_id"), col("cid"), col("rel"), col("c_vec"))
    mmrRerank(cand, kSel, mmrLambda, oneMinusLambda)
  }

  /** MMR over the IVF serving path — the candidate stage IS the tier
    * swap the [[mmrDiversify]] scaladoc promises: the SAME greedy
    * rerank runs over `ivfTopK`'s probe/score stage (md5 centroids,
    * argmax cells, nProbe routing) instead of the brute scan. Proof by
    * construction that diversification composes with any ranked
    * retriever that can hand back (query, candidate, raw rel, vector).
    */
  def mmrDiversifyIvf(corpus: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, kCand: Int,
                      kSel: Int, mmrLambda: Double,
                      oneMinusLambda: Double, nCells: Int,
                      nProbe: Int): DataFrame = {
    require(kCand >= kSel && kSel >= 1,
      s"need kCand >= kSel >= 1, got kCand=$kCand kSel=$kSel")
    val centroids = md5Centroids(corpus, idCol, vecCol, nCells)
    require(centroids.length >= 2,
      s"IVF needs >= 2 centroids, corpus yielded ${centroids.length}")
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id"))
    val cand = ivfScored(corpus, queries, idCol, vecCol,
        centroids.toSeq, nProbe)
      .withColumn("rn", row_number().over(wRel))
      .filter(col("rn") <= kCand)
      .select(col("query_id"), col("neighbor_id").as("cid"),
        col("cosine_raw").as("rel"), col("c_vec"))
    mmrRerank(cand, kSel, mmrLambda, oneMinusLambda)
  }

  /** The greedy MMR selection stage over a PRE-RANKED candidate frame
    * `(query_id, cid, rel, c_vec)` — bounded by the candidate set, so
    * any retriever tier (brute, IVF, LSH, at-rest) feeds it unchanged.
    * Checkpoints the candidates and their pairwise sims once.
    *
    * Runs Spark actions at CONSTRUCTION time by design (the kcore/CC/
    * Lloyd contract): each of the kSel greedy steps localCheckpoints
    * the growing selection, so building the frame executes kSel
    * candidate-bounded jobs — cost is |Q|·kCand² work independent of
    * corpus size, never a data-sized driver collect. */
  def mmrRerank(candIn: DataFrame, kSel: Int, mmrLambda: Double,
                oneMinusLambda: Double): DataFrame = {
    val cand = candIn.localCheckpoint()
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cid"))
    val sims = cand.select(col("query_id"), col("cid").as("a_id"),
        col("c_vec").as("a_vec"))
      .join(cand.select(col("query_id"), col("cid").as("b_id"),
        col("c_vec").as("b_vec")), Seq("query_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        cosine(col("a_vec"), col("b_vec")).as("sim"))
      .localCheckpoint()
    val candLite = cand.select(col("query_id"), col("cid"), col("rel"))
    var sel = candLite
      .withColumn("rn", row_number().over(wRel))
      .filter(col("rn") === 1)
      .select(col("query_id"), lit(1L).as("step"),
        col("cid").as("selected_id"), col("rel").as("score"))
      .localCheckpoint()
    for (t <- 2 to kSel) {
      val selKeys = sel.select(col("query_id").as("sq"),
        col("selected_id").as("sid"))
      val maxsim = sims
        .join(selKeys, col("query_id") === col("sq") &&
          col("b_id") === col("sid"))
        .groupBy(col("query_id"), col("a_id"))
        .agg(max(col("sim")).as("maxsim"))
        .select(col("query_id").as("mq"), col("a_id"), col("maxsim"))
      val wMmr = Window.partitionBy(col("query_id"))
        .orderBy(col("mmr").desc, col("cid"))
      val pick = candLite
        .join(selKeys, col("query_id") === col("sq") &&
          col("cid") === col("sid"), "left_anti")
        .join(maxsim, col("query_id") === col("mq") &&
          col("cid") === col("a_id"))
        .select(col("query_id"), col("cid"),
          (lit(mmrLambda) * col("rel") -
            lit(oneMinusLambda) * col("maxsim")).as("mmr"))
        .withColumn("rn", row_number().over(wMmr))
        .filter(col("rn") === 1)
        .select(col("query_id"), lit(t.toLong).as("step"),
          col("cid").as("selected_id"), col("mmr").as("score"))
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.orderBy(col("query_id"), col("step"))
  }

  /** Brute-force MAX-INNER-PRODUCT top-k (MIPS) — the retrieval
    * semantics of recommendation / reranking scores, where vector
    * MAGNITUDE is signal: unlike cosine, a longer vector can dominate
    * every query. Same execution shape as [[bruteForceTopK]]
    * (broadcast queries, corpus streams, codegen'd `vec_dot`, one
    * window per query). MIPS reduces to cosine ANN via the standard
    * norm augmentation x' = [x, sqrt(M² − ‖x‖²)], q' = [q, 0]
    * (spec-pinned property), so the IVF/LSH/PQ serving paths apply
    * unchanged at scale; this operator is their exact baseline.
    */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot_raw", dot(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot_raw").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("dot_raw"), 6).as("dot"))
  }

  /** MIPS SERVED through the IVF path via the norm-augmentation
    * reduction — the registered proof that the approximate serving
    * tier answers max-inner-product, not just cosine: corpus vectors
    * become x' = [x, √(M² − ‖x‖²)] with M² = max corpus norm²
    * (derived IN-PLAN as a broadcast 1-row aggregate — no
    * construction-time job beyond the centroid take the IVF build
    * already runs), queries become q' = [q, 0]. Every augmented
    * corpus vector has norm M, so augmented-cosine order ≡ dot order
    * and [[ivfTopK]]'s cell routing, probe explosion, and ranked
    * scoring apply UNCHANGED (the spec additionally pins
    * nProbe = nCells ⇒ ranks identical to [[mipsTopK]] brute).
    * ‖x‖² is the same codegen'd `vec_dot` the brute path scores with,
    * so M² − ‖x‖² is exactly 0 (not epsilon-negative) for the longest
    * vector, and the oracle replays the augmentation bit-for-bit.
    */
  def mipsIvfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, nCells: Int = 16,
                  nProbe: Int = 2): DataFrame = {
    val m2 = corpus.agg(
      max(dot(col(vecCol), col(vecCol))).as("__m2"))
    val augC = corpus.crossJoin(broadcast(m2))
      .select(col(idCol),
        concat(col(vecCol).cast("array<float>"),
          array(sqrt(col("__m2") - dot(col(vecCol), col(vecCol)))
            .cast("float"))).as(vecCol))
    val augQ = queries.select(col(idCol),
      concat(col(vecCol).cast("array<float>"),
        array(lit(0.0f))).as(vecCol))
    ivfTopK(augC, augQ, idCol, vecCol, k, nCells, nProbe)
  }

  /** The md5-ordered deterministic centroid sample [[ivfTopK]] trains
    * on — public so compositions (e.g. FILTERED search over a SHARED
    * index) can take centroids from the FULL corpus and serve a
    * predicate-restricted subset through [[ivfTopKWithCentroids]]:
    * the index is built once, not per predicate. */
  def md5Centroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nCells: Int): Array[(Long, Array[Float])] = corpus
    .select(col(idCol).cast("long").as("cid"),
      col(vecCol).cast("array<float>").as("cvec"))
    .orderBy(md5(col("cid").cast("string")), col("cid"))
    .limit(nCells)
    .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

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
    val centroids = md5Centroids(corpus, idCol, vecCol, nCells)
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
    val scored = ivfScored(corpus, queries, idCol, vecCol, centroids,
      nProbe, logOccupancy)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine_raw"), 6).as("cosine"))
  }

  /** The IVF probe/score stage BEFORE ranking — every (query,
    * candidate) pair the probed cells yield, with the raw cosine and
    * the candidate vector. The seam that feeds both the ranked top-k
    * above and candidate-consuming rerankers ([[mmrDiversifyIvf]]). */
  def ivfScored(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String,
                centroids: Seq[(Long, Array[Float])], nProbe: Int,
                logOccupancy: Boolean = false): DataFrame = {
    def cellScores(vec: Column): Seq[Column] = centroids.map {
      case (cid, cvec) =>
        struct(cosine(vec, typedLit(cvec)).as("sim"), lit(cid).as("cid"))
    }
    // corpus-side assignment through the fused argmax kernel (the
    // greatest-over-structs expansion breaks codegen past k ≈ a few
    // hundred cells); the query-side nProbe selection keeps the struct
    // array — it needs the top-nProbe cells, not the argmax, and runs
    // on the broadcast-small side only
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("cell", vec_argmax_cosine(col("c_vec"), centroids))
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
    c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_raw", cosine(col("q_vec"), col("c_vec")))
  }

  /** Probe/score/rank stage over an AT-REST cell-partitioned corpus dir
    * (columns: idCol, vecCol, `cell`): each query's nProbe best cells by
    * the given centroids become a partition-pruned scan — the isin
    * predicate is asserted INSIDE the executed plan's PartitionFilters,
    * so the pruning claim is load-bearing, not aspirational. Shared by
    * the at-rest layout query and the append-maintenance query (the
    * only difference between the two is how the layout was built).
    */
  def atRestProbeTopK(spark: org.apache.spark.sql.SparkSession,
                      path: String, centroids: Seq[(Long, Array[Float])],
                      queries: DataFrame, idCol: String, vecCol: String,
                      k: Int, nProbe: Int): DataFrame = {
    def cellScores(vec: Column): Seq[Column] = centroids.map {
      case (cid, cvec) =>
        struct(cosine(vec, typedLit(cvec)).as("sim"), lit(cid).as("cid"))
    }
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("__probe", explode(slice(sort_array(
        array(cellScores(col("q_vec")): _*), asc = false), 1, nProbe)))
      .withColumn("cell", col("__probe.cid")).drop("__probe")
    // probed cells are metadata-sized (nQueries × nProbe)
    val probeCells = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val corpus = spark.read.parquet(path)
      .filter(col("cell").isin(probeCells: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        col("cell"))
    val scored = corpus.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_raw", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_raw").desc, col("neighbor_id"))
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the isin predicate must appear INSIDE the PartitionFilters
    // bracket — `PartitionFilters: [` alone also matches an empty list,
    // and `cell#` appears in join attributes regardless. A 1-element
    // probed-cell set is rewritten by OptimizeIn to an equality
    // predicate, so accept `= <lit>` as well as `IN`.
    require(raw"PartitionFilters: \[[^\]]*cell#\d+L? (IN|= \d)".r
      .findFirstIn(plan).isDefined,
      "expected the cell isin/equality predicate in PartitionFilters; got:\n" +
        plan.take(3000))
    out
  }

  /** Occupancy summary of an at-rest cell-partitioned index dir —
    * the DRIFT metric for frozen-centroid maintenance
    * ([[recenterIvfIndex]]): `skew` = max cell occupancy / mean cell
    * occupancy (1.0 = perfectly balanced). Append-only batches assigned
    * against frozen centroids ([[atRestProbeTopK]]'s append path) pile
    * drifted data into whichever cells happen to be nearest, so skew
    * climbs round over round — and a hot cell is exactly the one every
    * probe ends up scanning, eroding the partition-pruning win. One
    * counts-only scan; ≤nCells rows reach the driver.
    */
  case class IvfOccupancy(nRows: Long, nCells: Long, maxOccupancy: Long,
                          skew: Double)

  def ivfOccupancyStats(spark: org.apache.spark.sql.SparkSession,
                        path: String): IvfOccupancy = {
    val r = spark.read.parquet(path)
      .groupBy(col("cell")).count()
      .agg(coalesce(sum(col("count")), lit(0L)).as("rows"),
        count(lit(1)).as("cells"),
        coalesce(max(col("count")), lit(0L)).as("mx"))
      .head()
    val (rows, cells, mx) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val skew = if (rows == 0L || cells == 0L) 1.0
      else mx.toDouble * cells / rows
    IvfOccupancy(rows, cells, mx, skew)
  }

  /** Recenter/compact an at-rest IVF index whose frozen centroids have
    * drifted — the ANN analogue of the band-index compaction
    * (`Dedup.compactBandIndex`), committing through the same crash-safe
    * [[graft.ops.AtomicSwap]] rename-aside swap: retrain centroids on
    * the LIVE index contents (sample-bounded [[kmeansCentroids]] —
    * training cost independent of index size), reassign every row with
    * the fused argmax kernel (one map-only scan), and rewrite the
    * layout partitioned by the NEW cells with one file per cell
    * (`repartition(cell)` — the compaction half: per-batch appends
    * accumulate a file per cell per batch forever). Returns the new
    * centroid set — the probe side must use it (probes against the old
    * centroids would consult cells that no longer exist). Cost is one
    * scan + one write of live rows, like every maintenance op here;
    * run it when [[ivfOccupancyStats]] skew crosses a policy threshold.
    */
  def recenterIvfIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, idCol: String, vecCol: String,
                       nCells: Int): Seq[(Long, Array[Float])] = {
    val live = spark.read.parquet(path)
      .select(col(idCol), col(vecCol).cast("array<float>").as(vecCol))
    val cents = kmeansCentroids(live, idCol, vecCol, nCells)
    require(cents.nonEmpty, s"recenter of an empty index at $path")
    graft.ops.AtomicSwap.rewrite(path) { tmp =>
      // explicit width: a bare repartition(col) is AQE-coalescible,
      // and a small index folds the whole reassign+rewrite into ONE
      // task (r18 measured); keyed by cell either way, so the
      // one-file-per-cell layout is unchanged. Width is DATA-SCALED
      // (r19, guide §2.2/§2.5) and capped at the CELL count: a keyed
      // repartition can never fill more partitions than the key has
      // distinct values, so width > nCells is pure empty-task
      // overhead. 128 KB of vectors per task bounds the per-task
      // argmax+write work; at scale the byte count saturates first.
      live.withColumn("cell", vec_argmax_cosine(col(vecCol), cents))
        .repartition(
          graft.ops.Width.scaled(live, 128L << 10, cents.length),
          col("cell"))
        .write.partitionBy("cell").parquet(tmp)
    }
    cents
  }

  /** Deterministic 2-pass Lloyd k-means centroids (the e_kmeans_lloyd
    * recipe as a reusable init for the IVF tier): md5-ordered seed set,
    * one argmax-cosine assignment of the BOUNDED training sample
    * ([[TrainSampleN]] md5-ordered rows — training cost is independent
    * of corpus size; only the downstream cell-assignment/encode pass,
    * which IS the index, touches the full corpus), one per-(cluster,
    * dim) mean update ROUNDED to 6 dp — the rounding kills last-ulp
    * summation-order divergence so any engine reproduces the centroids
    * bit-for-bit. Driver traffic is k×dim rows; each pass is one sample
    * scan + one fixed-size aggregation, served from [[trainedCache]] on
    * repeat builds. Clusters that lose every member in the assignment
    * pass drop out of the result (occupancy-0 cells would never be
    * probed anyway).
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int): Seq[(Long, Array[Float])] =
    cached(corpus, s"kmeans:$idCol:$vecCol:$k") {
      val train = trainSet(corpus, idCol, vecCol)
      // the seed take(k) is the k-prefix of the training sample (both are
      // the same md5 order), so one TakeOrderedAndProject feeds both
      val cent0: Seq[(Long, Array[Float])] = train.limit(k)
        .collect().zipWithIndex
        .map { case (r, i) => (i.toLong, r.getSeq[Float](1).toArray) }
        .toSeq
      if (cent0.length < 2) cent0 // degenerate: ≤1 seed
      else {
        val dim = cent0.head._2.length
        // mean update over the BOUNDED sample, not the corpus: training
        // cost is independent of corpus size (the full corpus is only
        // ever touched by the assignment/encode pass that IS the index).
        // Assignment is the fused native argmax kernel — the greatest-
        // over-structs expansion breaks codegen past k ≈ a few hundred
        train.select(col("cvec").as("v"))
          .withColumn("cl", vec_argmax_cosine(col("v"), cent0))
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

  /** Deterministic product-quantization codebooks: the md5-ordered first
    * `ksub` corpus vectors sliced into `m` contiguous subspaces (the same
    * seedless, engine-reproducible sampling recipe as the IVF centroid
    * init, applied per subspace), then `iters` Lloyd refinement passes —
    * per subspace, every TRAINING-SAMPLE subvector ([[TrainSampleN]]
    * md5-ordered rows, so refinement cost is independent of corpus size)
    * is assigned to its argmin-L2 codeword and codewords move to the
    * 6-dp-rounded member mean (the rounding kills summation-order ulp
    * divergence, exactly like [[kmeansCentroids]], so any engine replays
    * the refined codebooks bit-for-bit). Each pass is ONE sample scan +
    * one fixed-size aggregation (m × ksub × dim/m cells); codebooks are
    * metadata (≈16 KB at 64-dim/ksub=64), collected once — served from
    * [[trainedCache]] on repeat builds — and inlined as literals
    * everywhere they are used. Codewords that lose every member keep
    * their previous value.
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int, ksub: Int, iters: Int = 1)
      : Seq[Seq[Array[Float]]] =
    cached(corpus, s"pq:$idCol:$vecCol:$m:$ksub:$iters") {
      val train = trainSet(corpus, idCol, vecCol)
      // the seed take(ksub) is the ksub-prefix of the training sample
      val sample: Seq[Array[Float]] = train.limit(ksub)
        .collect().map(_.getSeq[Float](1).toArray).toSeq
      // empty corpus → no codebooks; callers fall back to bruteForceTopK
      // (which returns an empty result) instead of throwing here
      if (sample.isEmpty) Seq.empty
      else {
        val dim = sample.head.length
        require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
        val sub = dim / m
        var cbs: Seq[Seq[Array[Float]]] = (0 until m)
          .map(mi => sample.map(v => v.slice(mi * sub, (mi + 1) * sub)))
        if (cbs.head.length >= 2)
          for (_ <- 0 until iters)
            // refine over the BOUNDED sample: per-pass cost is fixed, so
            // codebook training is independent of corpus size
            cbs = lloydRefine(train.select(col("cvec")), "cvec", cbs, sub)
        cbs
      }
    }

  /** One Lloyd pass over ALL subspaces in a single scan of the training
    * sample: the codegen'd [[graft.functions.PqEncode]] kernel computes
    * every subspace code in one call, the vector is position-exploded
    * once, and the per-(subspace, code, position) means aggregate in one
    * fixed-size groupBy.
    */
  private def lloydRefine(corpus: DataFrame, vecCol: String,
                          cbs: Seq[Seq[Array[Float]]],
                          sub: Int): Seq[Seq[Array[Float]]] = {
    val m = cbs.length
    val rows = corpus
      .select(pq_encode(col(vecCol), cbs).as("codes"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("m", (col("dim") / lit(sub)).cast("int"))
      .withColumn("i", col("dim") % lit(sub))
      .withColumn("code", element_at(col("codes"), col("m") + 1))
      .groupBy(col("m"), col("code"), col("i"))
      .agg(round(avg(col("x").cast("double")), 6).as("v"))
      .collect()
    val upd: Map[(Int, Int), Array[Float]] = rows
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case ((mi, code), rs) =>
        val w = new Array[Float](sub)
        rs.foreach(r => w(r.getInt(2)) = r.getDouble(3).toFloat)
        ((mi, code), w)
      }
    (0 until m).map(mi => cbs(mi).indices
      .map(j => upd.getOrElse((mi, j), cbs(mi)(j))))
  }

  /** Product-quantization ANN top-k — the compressed-domain tier between
    * sq8 (4× compression, exact int ranking) and IVF (partition pruning):
    * each corpus vector is encoded ONCE into `m` one-byte codes (argmin-L2
    * subspace assignment against the codebooks), a 32× compression at
    * 64-dim float32 / m=8, and candidate scoring is asymmetric distance
    * computation (ADC): the query precomputes one `ksub`-entry dot table
    * per subspace on the broadcast side, and the approximate score of a
    * corpus vector is `m` table lookups + adds — the float vectors never
    * ride the corpus-wide join at all.
    *
    * Determinism (the property that keeps an approximate index under the
    * exact oracle gate): codebooks are the md5-ordered sample; encoding
    * argmin is expanded as `greatest` over (score, code) structs with ties
    * to the larger code; all arithmetic is the codegen'd sequential-double
    * `vec_dot` kernel, which DuckDB's left-associated CAST-chain replays
    * bit-for-bit. Encode argmin-L2 is computed as argmax of
    * `2·dot(sub, cb) − dot(cb, cb)` — the ‖sub‖² term is constant per
    * (vector, subspace) and cancels out of the argmin.
    *
    * At rest the `m` code columns are what persists/ships (the standard
    * PQ-compressed index layout); the float column is only needed by the
    * optional exact re-rank of the short list ([[pqRerankTopK]]).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8,
             ksub: Int = 64): DataFrame = {
    val cbs = pqCodebooks(corpus, idCol, vecCol, m, ksub)
    if (cbs.isEmpty || cbs.head.length < 2) // degenerate: ≤1 codeword
      return bruteForceTopK(corpus, queries, idCol, vecCol, k)
    // Queries are metadata-sized BY CONTRACT (this operator broadcasts
    // them in spirit), so their ADC dot tables are precomputed once
    // driver-side — by the SAME pqTable kernel the old broadcast side
    // ran, so scores stay bit-identical — and the whole scoring stage
    // becomes a MAP-ONLY corpus scan: one fused PqScoreAll call per
    // corpus row (encode once, m lookups per query), posexplode, rank.
    // The broadcast-join shape this replaces had a measured 5 µs/pair
    // pathology: whole-stage codegen DEFERS the streamed side's encode
    // projection into the per-pair loop (only join-condition vars are
    // forced before it), so the 4096-flop encode ran once per (corpus ×
    // query) pair — the e_knn_pq 8× scale-probe flag. No join, no
    // shuffle of the corpus, nothing re-evaluated.
    val qrows = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<float>").as("qv")).collect()
    val tabs = graft.functions.vector.pq_tabs_flat(
      qrows.map(_.getSeq[Float](1).toArray).toSeq, cbs)
    val qids: Array[Long] = qrows.map(_.getLong(0))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"),
        posexplode(pq_score_all(col(vecCol), cbs, tabs))
          .as(Seq("qidx", "approx_raw")))
      .withColumn("query_id", element_at(typedLit(qids), col("qidx") + 1))
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_raw").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("approx_raw"), 6).as("approx_dot"))
  }

  /** IVF-PQ — the production ANN index layout (coarse quantizer +
    * compressed-domain scoring, the FAISS `IVFx,PQy` shape without
    * residual encoding): k-means cells prune the corpus to `nProbe`
    * partitions per query, and WITHIN the probed cells candidates are
    * scored by PQ asymmetric distance — so the scan is cell-pruned AND
    * the scanned payload is the 32×-compressed code column, never the
    * float vectors. At rest the corpus persists partitioned by `cell`
    * carrying `(id, codes)`: probes become partition-pruned scans of
    * compressed data (compare [[ivfTopKWithCentroids]], which ships
    * float vectors through the probe join, and [[pqTopK]], which scans
    * every cell).
    *
    * Unlike classic IVF-PQ the codes quantize raw vectors, not
    * per-cell residuals: residual encoding would couple the codebooks
    * to the coarse quantizer and the composition would no longer replay
    * exactly on an independent engine. Both stages are individually
    * deterministic, so the whole operator stays under the exact oracle
    * gate.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 3,
                m: Int = 8, ksub: Int = 64): DataFrame = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, nCells)
    val cbs = pqCodebooks(corpus, idCol, vecCol, m, ksub)
    if (cents.length < 2 || cbs.isEmpty || cbs.head.length < 2)
      return bruteForceTopK(corpus, queries, idCol, vecCol, k)
    def cellScores(vec: Column): Seq[Column] = cents.map {
      case (cid, cvec) =>
        struct(cosine(vec, typedLit(cvec)).as("sim"), lit(cid).as("cid"))
    }
    // literal ADC tables, same rationale and same-kernel guarantee as
    // [[pqTopK]]: the probe join carries (query_id, cell, qidx), never
    // the 4 KB table
    val qrows = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<float>").as("qv")).collect()
    val tabs = graft.functions.vector.pq_tabs_flat(
      qrows.map(_.getSeq[Float](1).toArray).toSeq, cbs)
    val idToIdx: Map[Long, Int] =
      qrows.zipWithIndex.map { case (r, i) => r.getLong(0) -> i }.toMap
    // repartition-by-cell MATERIALIZES (cell, codes) through the
    // exchange — this is exactly the at-rest IVF-PQ layout build (codes
    // persisted partitioned by cell), and it pins the encode to once
    // per corpus row: without a materialization point, whole-stage
    // codegen defers the codes projection into the probe join's
    // per-pair loop and the 4096-flop encode runs once per candidate
    // pair (the pqTopK pathology). The exchange carries (id, cell, 8
    // int codes) — ~40 B/row, 7× less than the float vectors.
    val c = corpus.select(col(idCol).as("neighbor_id"),
      vec_argmax_cosine(col(vecCol), cents).as("cell"),
      pq_encode(col(vecCol), cbs).as("codes"))
      .repartition(col("cell"))
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("__probe",
        explode(slice(sort_array(array(cellScores(col("q_vec")): _*),
          asc = false), 1, nProbe)))
      .select(col("query_id"), col("__probe.cid").as("cell"),
        element_at(typedLit(idToIdx), col("query_id").cast("long"))
          .as("qidx")))
    val scored = c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx_raw",
        pq_adc_lit(col("codes"), col("qidx"), tabs, ksub))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_raw").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("approx_raw"), 6).as("approx_dot"))
  }

  /** PQ candidate generation + exact float re-rank — the two-stage serving
    * shape of [[sq8RerankTopK]] with the 32×-compressed ADC tier as stage
    * 1: only the ≤`candidates`-per-query short list ever touches the float
    * vectors. Both stages deterministic ⇒ oracle-exact.
    */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, candidates: Int, m: Int = 8,
                   ksub: Int = 64): DataFrame = {
    require(candidates >= k, "candidate list must be at least k")
    val cand = pqTopK(corpus, queries, idCol, vecCol, candidates, m, ksub)
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
