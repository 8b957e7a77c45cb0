package graft.product

import graft.sources.Hdf5Reader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S-5 made real: the HDF5 → long-parquet converter for the reference's
  * `out.hdf5` expression stores (`bin/concatenate.py:239-264`).
  *
  * Semantics preserved from the reference:
  *  - the TWO store-key conventions are tried in order — the stitched
  *    `…/expressions.ome.tiff/stitched/reg1` key first, the
  *    `…/expr.ome.tiff/reg001` key as fallback — for both the `total`
  *    and the `meanAll` layer (`bin/concatenate.py:240-241,256-264`);
  *  - the matrix index becomes `original_obs_id` (string), matching
  *    `adata.obs["original_obs_id"] = adata.obs.index`;
  *  - the column axis is the channel universe; total and mean matrices
  *    are column-aligned (same store shape by construction upstream).
  *
  * Scale shape: one `out.hdf5` is ONE dataset's cells × channels matrix
  * (bounded); the fleet of datasets is the big axis. The converter
  * parallelizes ACROSS files — each task parses its own store with the
  * pure-JVM reader and emits long rows — so 10k datasets are 10k
  * parallel tasks, no driver-side matrix ever materializes.
  */
object Hdf5Ingest {

  /** (total key, mean key) conventions, tried in order. */
  val storeKeys: Seq[(String, String)] = Seq(
    ("total/channel/cell/expressions.ome.tiff/stitched/reg1",
      "meanAll/channel/cell/expressions.ome.tiff/stitched/reg1"),
    ("total/channel/cell/expr.ome.tiff/reg001",
      "meanAll/channel/cell/expr.ome.tiff/reg001"))

  /** Parse one store's bytes → (original_obs_id, channel, total, mean)
    * long rows. Fails with a clear message when neither key convention
    * is present (mirroring the reference, whose unguarded `matrix`
    * reference would NameError — here it is an explicit contract error).
    */
  def parseStore(bytes: Array[Byte]): Iterator[(String, String, Double, Double)] = {
    val r = new Hdf5Reader(bytes)
    val keys = storeKeys.find { case (t, _) => r.exists(t) }
      .getOrElse(sys.error(
        "no expression matrix under either store key convention " +
          s"(${storeKeys.map(_._1).mkString(" | ")})"))
    val (totalGroup, meanGroup) = keys
    def leaf(group: String, name: String): Long =
      r.resolve(s"$group/$name").getOrElse(
        sys.error(s"pandas fixed-format store missing $group/$name"))
    val channels = r.readStringVector(leaf(totalGroup, "axis0"))
    val obsIds = r.readStringVector(leaf(totalGroup, "axis1"))
    val total = r.readDoubleMatrix(leaf(totalGroup, "block0_values"))
    val mean = r.readDoubleMatrix(leaf(meanGroup, "block0_values"))
    require(total.length == obsIds.length &&
      total.headOption.forall(_.length == channels.length),
      s"total matrix shape ${total.length}×" +
        s"${total.headOption.fold(0)(_.length)} does not match " +
        s"${obsIds.length} obs × ${channels.length} channels")
    require(mean.length == total.length &&
      mean.headOption.forall(_.length == channels.length),
      "mean layer shape does not match the total matrix")
    for {
      i <- obsIds.indices.iterator
      j <- channels.indices.iterator
    } yield (obsIds(i), channels(j), total(i)(j), mean(i)(j))
  }

  /** Distributed conversion: every `{root}/{dataset}/out.hdf5` under
    * `root` → one long DataFrame (dataset, original_obs_id, channel,
    * total, mean). Discovery is a metadata glob; each file parses in its
    * own task.
    */
  def convert(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    // binaryFiles: one record per store, file bytes stream to the task
    // that parses them — the driver only ever sees paths
    spark.sparkContext.binaryFiles(s"$root/*/out.hdf5")
      .flatMap { case (path, stream) =>
        val dataset = new org.apache.hadoop.fs.Path(path)
          .getParent.getName
        parseStore(stream.toArray()).map { case (obs, ch, t, m) =>
          (dataset, obs, ch, t, m)
        }
      }
      .toDF("dataset", "original_obs_id", "channel", "total", "mean")
  }

  /** Standalone tool: `Hdf5Ingest <dataRoot> <outDir>` converts every
    * dataset store under `dataRoot` and writes the long-parquet contract
    * partitioned by dataset (one directory per dataset, prunable).
    */
  def main(args: Array[String]): Unit = {
    val Array(root, outDir) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try convert(spark, root)
      .repartition(col("dataset"))
      .write.mode("overwrite").partitionBy("dataset").parquet(outDir)
    finally spark.stop()
  }
}
