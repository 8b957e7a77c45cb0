package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model-artifact lifecycle: the engine's learned-inference operators
  * (TextClassifier, EmbedInference) take their weights as a
  * DataFrame precisely so a TRAINED export drops in as a parquet
  * read — this is the write/read pair that closes the loop, proving
  * the claim end-to-end instead of asserting it in comments.
  *
  * Format: plain parquet, one file. A model frame is metadata-sized
  * by construction (dim rows for a classifier, dim·outDim for a
  * projection — the broadcastability invariant every inference plan
  * relies on), so `coalesce(1)` costs nothing and keeps the artifact
  * a single self-describing file any engine (DuckDB, pandas, a
  * trainer) writes or reads directly. Quantized integer weights
  * (BIGINT millis — the engine-wide fixed-point discipline) survive
  * parquet bit-for-bit, so inference from the loaded frame is
  * hash-identical to inference from the in-memory one.
  *
  * Validation stays where it always was: [[TextClassifier.scoreDocs]]
  * and `EmbedInference.embedDocs` enforce exact full coverage at
  * construction (one action on the metadata-sized frame), so a
  * sparse, duplicated, or out-of-range on-disk export fails LOUDLY
  * at load-and-serve time rather than silently mis-scoring — the
  * load path deliberately adds no second, weaker check.
  */
object ModelIo {

  /** Write a metadata-sized model frame as one parquet file
    * (overwrite — model dirs are versioned by path, not by append). */
  def exportModel(model: DataFrame, path: String): Unit =
    model.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a model artifact for serving. Schema comes from the file;
    * the inference operators' coverage guards validate content. */
  def loadModel(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Deterministic scratch path for a named model artifact (the
    * round-trip queries write-then-serve under the JVM tmpdir; a
    * production deployment passes its own model store path). */
  def tmpModelDir(name: String): String =
    new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_models"),
      name).getAbsolutePath
}
