package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INTEGER-domain IVF for maximum-inner-product retrieval over the
  * engine's inferred embeddings — the scale path that retires the
  * brute O(|docs|·|queries|) pair aggregation of `e_knn_embed_infer`
  * as the only serving plan over real inference products.
  *
  * Why a twin instead of reusing [[Knn.ivfTopK]]: the float IVF tier
  * serves the synthetic `embeddings` table (float vectors, cosine
  * ranked at 6 dp); [[EmbedInference.embedDocs]] emits EXACT BIGINT
  * components, and the engine's retrieval chain over them
  * (`e_knn_embed_infer`) ranks by the exact integer dot product. An
  * IVF tier for that chain must speak the same arithmetic — every
  * cell assignment, probe choice and score below is a BIGINT sum, so
  * ANY engine replays the whole index bit-for-bit (no float
  * tolerance anywhere), and the approximate tier's output is
  * comparable 1:1 against the brute tier's exact dots.
  *
  * Index recipe mirrors [[Knn.ivfTopK]] (IVF after Sivic & Zisserman
  * 2003 / the FAISS IndexIVFFlat layout): a deterministic md5-ordered
  * corpus sample is the centroid set (metadata-sized, collected once,
  * inlined as literals); corpus cell assignment is a PURE MAP — the
  * argmax over nCells integer dots via one greatest-over-structs
  * kernel, no join, no shuffle; queries explode ×nProbe on the
  * broadcast side only; scoring touches ONLY the probed cells'
  * candidates. At rest the corpus is written partitioned by `cell`
  * so probes prune partitions (the `e_knn_ivf_at_rest` layout).
  *
  * Overflow headroom: components are bounded by
  * |e| ≤ n_feats · max|wgt| (1000 integer millis for the engine's
  * quantized exports), so a 100k-word doc stays under 2^31 per
  * component and a 16-dim dot under 2^63 with ~2 decimal orders to
  * spare; larger (outDim × corpus) domains rescale the export, the
  * same contract [[EmbedInference.embedVectors]] documents for its
  * float cast.
  */
object IntIvf {

  /** Exact BIGINT dot product of two array<long> columns. */
  def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
      (acc, x) => acc + x)

  /** (id, vec array<long>) dense vectors from the (id, j, e)
    * long-form embed rows — j-ordered, exact longs (no float cast,
    * so no magnitude guard needed; contrast
    * [[EmbedInference.embedVectors]]). One exchange; the array is
    * outDim longs per doc. */
  def denseVectors(embRows: DataFrame, idCol: String): DataFrame =
    embRows.groupBy(col(idCol))
      .agg(expr("transform(array_sort(collect_list(struct(j, e))), " +
        "x -> x.e)").as("vec"))

  /** Deterministic md5-ordered centroid sample over integer vectors —
    * the [[Knn.md5Centroids]] recipe (smallest md5(id-as-string)
    * wins; seedless, reproducible, metadata-sized). */
  def md5Centroids(vecs: DataFrame, idCol: String,
                   nCells: Int): Array[(Long, Array[Long])] = vecs
    .select(col(idCol).cast("long").as("cid"), col("vec").as("cvec"))
    .orderBy(md5(col("cid").cast("string")), col("cid"))
    .limit(nCells)
    .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))

  /** Every (query, candidate, dot) pair the probed cells yield — the
    * pre-ranking seam (the [[Knn.ivfScored]] shape). `vecs` and
    * `queries` are (id, vec array<long>) frames; centroids are
    * inlined literals so corpus cell assignment is a pure map (cell =
    * argmax over nCells exact dots, ties to the LARGER centroid id —
    * the greatest-over-structs order both engines replay as
    * `ORDER BY dot DESC, cid DESC`); queries pick their nProbe best
    * cells by the same exact dot on the broadcast side. */
  def ivfScored(vecs: DataFrame, queries: DataFrame, idCol: String,
                centroids: Seq[(Long, Array[Long])],
                nProbe: Int): DataFrame = {
    def cellScores(vec: Column): Seq[Column] = centroids.map {
      case (cid, cvec) =>
        struct(dotL(vec, typedLit(cvec)).as("d"), lit(cid).as("cid"))
    }
    val c = vecs
      .select(col(idCol).as("neighbor_id"), col("vec").as("c_vec"))
      .withColumn("cell",
        greatest(cellScores(col("c_vec")): _*).getField("cid"))
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col("vec").as("q_vec"))
      .withColumn("__probe",
        explode(slice(sort_array(array(cellScores(col("q_vec")): _*),
          asc = false), 1, nProbe)))
      .withColumn("cell", col("__probe.cid"))
      .drop("__probe"))
    c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotL(col("q_vec"), col("c_vec")))
  }

  /** IVF-MIPS top-k: probed-cell candidates ranked by the exact
    * BIGINT dot (ties → smaller neighbor id), the integer twin of
    * [[Knn.ivfTopKWithCentroids]]. Output matches the brute tier's
    * (query_id, neighbor_id, dot, rank) so recall joins 1:1. */
  def ivfMipsTopK(vecs: DataFrame, queries: DataFrame, idCol: String,
                  k: Int, centroids: Seq[(Long, Array[Long])],
                  nProbe: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    ivfScored(vecs, queries, idCol, centroids, nProbe)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot"),
        col("rank").cast("long").as("rank"))
  }
}
