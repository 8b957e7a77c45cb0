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

  private def perDataset(spark: SparkSession, manifest: DataFrame,
                         kind: String, read: String => DataFrame): DataFrame = {
    val files = manifest.filter(col("kind") === kind)
      .select("dataset", "path").collect()
      .map(r => (r.getString(0), r.getString(1)))
    require(files.nonEmpty,
      s"no '$kind' inputs discovered — check the data directory layout")
    files.map { case (ds, path) =>
      read(path).withColumn("dataset", lit(ds))
    }.reduceLeft(_.unionByName(_))
  }

  /** Read every per-dataset input under `root`. The driver-side loop here
    * touches only file PATHS (metadata); each read is a lazy scan and the
    * unions are shuffle-free, so the full plan stays distributed.
    */
  def readDatasetDirs(spark: SparkSession, root: String): DatasetInputs = {
    val mf = discover(spark, root)
    DatasetInputs(
      xLong = perDataset(spark, mf, "x_long",
        p => spark.read.parquet(p)),
      centers = perDataset(spark, mf, "centers",
        p => Sources.centersCsv(spark, p)),
      edges = perDataset(spark, mf, "adjacency",
        p => Sources.matrixMarket(spark, p)),
      labels = perDataset(spark, mf, "labels",
        p => Sources.labels(spark, p)),
      antibodies = perDataset(spark, mf, "antibodies",
        p => Sources.antibodiesTsv(spark, p)))
  }
}
