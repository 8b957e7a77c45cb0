package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout scale posture: at 100 TB the dominant cost is the scan,
  * and the two levers that cut it are (a) static partition pruning — a
  * literal predicate on the partition column must prune directories at
  * planning time, reading zero bytes of the other partitions — and (b)
  * dynamic partition pruning — a selective dim-side filter must prune fact
  * partitions at runtime through the join. Both are plan-level properties;
  * these specs pin them so a refactor can't silently regress the scan.
  */
class PruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val partedDir: String = {
    val dir = Files.createTempDirectory("graft_parted").toString
    Tables.orders(spark, TestSpark.sf)
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(dir)
    dir
  }

  // AQE wraps executed subtrees in QueryStageExec nodes whose children are
  // Nil, so plain collect() never reaches the scan — recurse explicitly
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allScans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(allScans)
  }

  private def fileScan(df: org.apache.spark.sql.DataFrame)
      : FileSourceScanExec = {
    val executed = df.queryExecution.executedPlan
    val scans = allScans(executed)
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$executed")
    scans.head
  }

  test("static partition pruning: literal predicate reads one partition") {
    val q = spark.read.parquet(partedDir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey")
    val expected = Tables.orders(spark, TestSpark.sf)
      .filter($"o_orderstatus" === "F").count()
    // collect() (not count()) so the metrics land on THIS QueryExecution
    assert(q.collect().length == expected)
    val scan = fileScan(q)
    // the filter must land in PartitionFilters (directory-level skip),
    // and the post-execution metric must show only F-partition files read
    assert(scan.metadata("PartitionFilters").contains("o_orderstatus"))
    val fFiles = new java.io.File(s"$partedDir/o_orderstatus=F")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == fFiles,
      s"read ${scan.metrics("numFiles").value} files, F partition has $fFiles")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions " +
    "through the join") {
    val fact = spark.read.parquet(partedDir)
    // the dim must be file-backed: a filter over a LocalRelation is
    // constant-folded away before the PartitionPruning batch runs, and DPP
    // only fires on a surviving selective dim-side Filter
    val dimDir = Files.createTempDirectory("graft_dim").toString
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
      .filter($"label" === "finished") // selective dim predicate → DPP
    val joined = fact.join(dim, fact("o_orderstatus") === dim("status"))
      .groupBy($"label").agg(count(lit(1)).as("n"))
    val expected = Tables.orders(spark, TestSpark.sf)
      .filter($"o_orderstatus" === "F").count()
    val got = joined.collect()
    assert(got.length == 1 && got(0).getLong(1) == expected)
    val scan = fileScan(joined)
    assert(scan.metadata("PartitionFilters").contains("dynamicpruning"),
      s"no dynamic pruning in scan: ${scan.metadata("PartitionFilters")}")
    val fFiles = new java.io.File(s"$partedDir/o_orderstatus=F")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == fFiles,
      s"read ${scan.metrics("numFiles").value} files, F partition has $fFiles")
  }

  test("agg_corr power-sum formula agrees with the corr() builtin") {
    val ours = graft.SparkEntry.queries("agg_corr")(spark, TestSpark.sf)
      .select($"l_returnflag", $"corr_qln")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = Tables.lineitem(spark, TestSpark.sf)
      .groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_linenumber").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-9, s"flag $k: $v vs ${builtin(k)}")
    }
  }
}
