package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), two tiers:
  *
  *  - brute-force cosine top-k: the correctness baseline. Queries are
  *    broadcast (a query set is small by definition); the corpus streams —
  *    one pass, no corpus shuffle, per-partition top-k heaps via
  *    window-free `TakeOrderedAndProject` when k is global, or a
  *    partitioned window for per-query top-k.
  *  - IVF-style bucketed ANN: corpus pre-bucketed by random-hyperplane LSH
  *    (deterministic seeded planes); a query probes only its bucket(s),
  *    turning the O(N) scan into O(N / 2^planes) with recall controlled by
  *    multi-probe.
  *
  * All vector math is `zip_with` + `aggregate` expression code over array
  * columns — no UDF, no driver collect of the corpus.
  */
object Knn {

  /** Dot product of two array<numeric> columns (cast to double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) =>
      acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force per-query cosine top-k. `queries` must be small (it is
    * broadcast); `corpus` scales. Ties broken by corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic random-hyperplane bucket id from `nPlanes` sign bits.
    * Plane p's component for dimension i is ±1 by xxhash64(i, p) parity —
    * no stored centroids, identical on every executor, and cheap enough to
    * recompute at query time.
    */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            when(xxhash64(i, lit(p)) % 2 === 0, 1.0d).otherwise(-1.0d)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }.reduce(_ + _)

  /** Bucketed ANN top-k: probe only the query's LSH bucket. At 100 TB the
    * corpus would be written bucketed-by(`bucket`) so the probe is a
    * partition-pruned scan; here the bucket equi-join achieves the same
    * plan shape (hash-partition both sides on bucket).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 6): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), nPlanes).as("bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
