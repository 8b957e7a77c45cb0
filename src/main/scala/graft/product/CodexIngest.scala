package graft.product

import graft.product.CodexProduct.DatasetInputs
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level ingest: turn a data directory laid out like the reference's
  * (`{root}/{dataset_uuid}/<files>`, FIXTURES.md §A2) into the
  * DataFrame-level `DatasetInputs` the product pipeline consumes — the
  * Spark-native replacement for `make_directory.py` staging + the per-
  * dataset load loop (`bin/concatenate.py:358-406`).
  *
  * Discovery is one metadata glob per file kind (S-11); per-dataset reads
  * are unioned with the `dataset` key attached — the keyed join replaces
  * the reference's fragile positional zip (J-6, SURVEY §2.3). The HDF5
  * expression matrix arrives as its post-ingest long-parquet form
  * (`x_long/` under each dataset dir — S-5's converter contract).
  */
object CodexIngest {

  val kinds: Map[String, String] = Map(
    "x_long" -> "*/x_long",
    "centers" -> "*/*cell_centers.csv",
    "adjacency" -> "*/*AdjacencyMatrix.mtx",
    "labels" -> "*/*AdjacencyMatrixRowColLabels.txt",
    "antibodies" -> "*/*antibodies.tsv")

  /** Per-kind file lists from one discovery pass. */
  def discover(spark: SparkSession, root: String): DataFrame =
    Sources.fileManifest(spark, root, kinds)

  private def paths(manifest: DataFrame, kind: String): Seq[String] = {
    // metadata-only collect: file PATHS, bounded by the dataset count
    val ps = manifest.filter(col("kind") === kind)
      .select("path").collect().map(_.getString(0)).toSeq
    require(ps.nonEmpty,
      s"no '$kind' inputs discovered — check the data directory layout")
    ps
  }

  // dataset = parent directory name of the scanned file, recovered from
  // input_file_name() so a single multi-path scan serves every dataset
  private val parentDirAsDataset: org.apache.spark.sql.Column =
    regexp_extract(input_file_name(), "/([^/]+)/[^/]*$", 1)

  // x_long files live one level deeper ({ds}/x_long/part-*.parquet)
  private val grandParentDirAsDataset: org.apache.spark.sql.Column =
    regexp_extract(input_file_name(), "/([^/]+)/[^/]+/[^/]*$", 1)

  /** Read every per-dataset input under `root` with ONE scan per file
    * kind: multi-path reads keyed by `input_file_name()` for the
    * schema-explicit formats, and the indexed-text scan for the two
    * line-position-sensitive ones (MatrixMarket, labels). At the
    * reference's own 10k-dataset cap each kind is still a single scan
    * node with many splits — the logical plan size is O(1) in the
    * dataset count, not O(datasets) union legs.
    */
  def readDatasetDirs(spark: SparkSession, root: String): DatasetInputs = {
    val mf = discover(spark, root)
    DatasetInputs(
      xLong = spark.read.parquet(paths(mf, "x_long"): _*)
        .withColumn("dataset", grandParentDirAsDataset),
      centers = Sources.centersCsv(spark, paths(mf, "centers"): _*)
        .withColumn("dataset", parentDirAsDataset),
      edges = Sources.matrixMarketAll(spark, paths(mf, "adjacency")),
      labels = Sources.labelsAll(spark, paths(mf, "labels")),
      antibodies = Sources.antibodiesTsv(spark,
          paths(mf, "antibodies"): _*)
        .withColumn("dataset", parentDirAsDataset))
  }
}
