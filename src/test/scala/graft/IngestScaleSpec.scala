package graft

import graft.ops.Relational
import graft.product.{CodexIngest, CodexProduct}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

class IngestScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Build an on-disk reference-layout data directory (FIXTURES.md §A2). */
  def makeDataDir(): Path = {
    val root = Files.createTempDirectory("graft-ingest")
    def w(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    // ds1
    Seq(("ds1", "1", "CD45", 5.0, 2.5), ("ds1", "1", "DAPI", 1.0, 0.5),
      ("ds1", "2", "CD45", 6.0, 3.0), ("ds1", "2", "DAPI", 2.0, 1.0))
      .toDF("dataset", "original_obs_id", "channel", "total", "mean")
      .drop("dataset")
      .write.parquet(root.resolve("ds1/x_long").toString)
    w("ds1/reg1_cell_centers.csv", "ID,x,y\n1,10.0,11.0\n2,20.0,21.0\n")
    w("ds1/reg1_AdjacencyMatrix.mtx",
      "%%MatrixMarket matrix coordinate real general\n2 2 1\n1 2 1.0\n")
    w("ds1/reg1_AdjacencyMatrixRowColLabels.txt", "1\n2\n")
    w("ds1/x_antibodies.tsv",
      "antibody_name\tuniprot_accession_number\trr_id\tchannel_id\n" +
        "CD45\tP08575\tAB_1\tcyc001_ch001\n")
    // ds2
    Seq(("2", "CD45", 7.0, 3.5), ("2", "ECAD", 3.0, 1.5))
      .toDF("original_obs_id", "channel", "total", "mean")
      .write.parquet(root.resolve("ds2/x_long").toString)
    w("ds2/reg1_cell_centers.csv", "ID,x,y\n2,30.0,31.0\n")
    w("ds2/reg1_AdjacencyMatrix.mtx",
      "%%MatrixMarket matrix coordinate real general\n1 1 1\n1 1 0.5\n")
    w("ds2/reg1_AdjacencyMatrixRowColLabels.txt", "2\n")
    w("ds2/y_antibodies.tsv",
      "antibody_name\tuniprot_accession_number\trr_id\tchannel_id\n" +
        "ECAD\tP12830\tAB_2\tcyc001_ch002\n")
    root
  }

  test("file-level ingest: discovery + keyed per-dataset reads → product") {
    val root = makeDataDir()
    val inputs = CodexIngest.readDatasetDirs(spark, root.toString)
    assert(inputs.xLong.select("dataset").distinct().count() == 2)
    assert(inputs.edges.count() == 2)
    assert(inputs.labels.count() == 3)
    val manifest = Seq(
      ("ds1", "HBM1", "p", null, "50", "F", null, null, null, null, null),
      ("ds2", "HBM2", "p", null, "60", "M", null, null, null, null, null))
      .toDF("uuid", "hubmap_id", "immediate_ancestor_ids",
        "immediate_descendant_ids", "age", "sex", "height", "weight",
        "bmi", "cause_of_death", "race")
    val bundle = CodexProduct.build(spark, manifest, inputs,
      "Kidney", "prod-ingest", "2026-01-01 00:00:00")
    assert(bundle.obs.count() == 3)
    assert(bundle.varDf.as[String].collect().toSet ==
      Set("CD45", "DAPI", "ECAD"))
    // global edges: ds1 (1,2)→(1,2); ds2 (1,1) offset 2 →(3,3)
    val edges = bundle.obspEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(edges == Set((1L, 2L, 1.0), (3L, 3L, 0.5)))
  }

  test("single-scan ingest: 1000 datasets, O(1) plan size per kind") {
    val root = Files.createTempDirectory("graft-ingest1k")
    // one real parquet file cloned 1000× — writing 1000 parquet dirs via
    // Spark would be 1000 jobs; identical bytes are fine for the scan
    val stage = root.resolve("_stage")
    Seq(("1", "CD45", 1.0, 0.5), ("2", "DAPI", 2.0, 1.0))
      .toDF("original_obs_id", "channel", "total", "mean")
      .coalesce(1).write.parquet(stage.toString)
    val part = new java.io.File(stage.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    (1 to 1000).foreach { i =>
      val ds = root.resolve(f"ds$i%04d")
      Files.createDirectories(ds.resolve("x_long"))
      Files.copy(part, ds.resolve("x_long/part-00000.parquet"))
      Files.writeString(ds.resolve("reg1_cell_centers.csv"),
        "ID,x,y\n1,1.0,2.0\n2,3.0,4.0\n")
      Files.writeString(ds.resolve("reg1_AdjacencyMatrix.mtx"),
        "%%MatrixMarket matrix coordinate real general\n2 2 1\n1 2 1.5\n")
      Files.writeString(ds.resolve("reg1_AdjacencyMatrixRowColLabels.txt"),
        "1\n2\n")
      Files.writeString(ds.resolve("x_antibodies.tsv"),
        "antibody_name\tuniprot_accession_number\trr_id\tchannel_id\n" +
          "CD45\tP1\tAB\tc1\n")
    }
    val inputs = CodexIngest.readDatasetDirs(spark, root.toString)
    // plan-size sanity: one multi-split scan per kind, zero union legs —
    // the logical plan must not grow with the dataset count
    import org.apache.spark.sql.catalyst.plans.logical.Union
    Seq(inputs.xLong, inputs.centers, inputs.edges, inputs.labels,
      inputs.antibodies).foreach { df =>
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case u: Union => u }.isEmpty,
        s"union legs in ingest plan:\n$plan")
    }
    assert(inputs.xLong.select("dataset").distinct().count() == 1000)
    assert(inputs.edges.count() == 1000)
    // per-file line indexing survived the multi-file scan: every
    // dataset's labels are exactly idx {1, 2}
    assert(inputs.labels.count() == 2000)
    assert(inputs.labels.groupBy("dataset")
      .agg(max($"idx").as("m"), count(lit(1)).as("n"))
      .filter($"m" =!= 2 || $"n" =!= 2).count() == 0)
  }

  test("saltedJoin equals plain join on skewed data") {
    val left = spark.range(2000)
      .select(when($"id" < 1800, lit("hot")).otherwise(concat(lit("k"),
        $"id")).as("k"), $"id".as("v"))
    val right = Seq(("hot", 1), ("k1900", 2), ("absent", 3))
      .toDF("k", "w")
    val plain = left.join(right, Seq("k")).agg(
      count(lit(1)), sum($"v"), sum($"w")).collect().head
    val salted = Relational.saltedJoin(left, right, "k", 8).agg(
      count(lit(1)), sum($"v"), sum($"w")).collect().head
    assert(plain == salted)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.range(0, 1000).select($"id", ($"id" % 7).as("a"))
        .write.bucketBy(4, "id").sortBy("id")
        .mode("overwrite").saveAsTable("bk_left")
      spark.range(0, 1000).select($"id", ($"id" % 3).as("b"))
        .write.bucketBy(4, "id").sortBy("id")
        .mode("overwrite").saveAsTable("bk_right")
      val joined = spark.table("bk_left").join(spark.table("bk_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
