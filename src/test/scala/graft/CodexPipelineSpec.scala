package graft

import graft.product.CodexProduct
import graft.product.CodexProduct.DatasetInputs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test of the CODEX product pipeline over FIXTURES.md-
  * shaped synthetic inputs: 2 leaf datasets (different channel sets, one
  * with a filtered `Channel:n:n` + `blank` channel), 1 parent (antibodies
  * only), a null-donor row, labels absent from the expression matrix, and
  * centers for unknown cells.
  */
class CodexPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // manifest: ds1/ds2 leaves, parent p1 has descendants (excluded)
  def manifest = Seq(
    ("ds1", "HBM1", "p1", null, "61", "Male", "180", "80", "24.7", "NaturalCauses", "White"),
    ("ds2", "HBM2", "p1", null, null, "Female", null, null, null, null, null),
    ("p1", "HBMP", "raw1", "['ds1','ds2']", "61", "Male", "180", "80", "24.7", "NaturalCauses", "White")
  ).toDF("uuid", "hubmap_id", "immediate_ancestor_ids",
    "immediate_descendant_ids", "age", "sex", "height", "weight", "bmi",
    "cause_of_death", "race")

  // x_long: ds1 has cells 1,2 with channels CD45/DAPI/Channel:2:3;
  // ds2 has cells 1,3 with channels CD45/blank-ch/ECAD
  def xLong = Seq(
    ("ds1", "1", "CD45", 5.0, 2.5), ("ds1", "1", "DAPI", 1.0, 0.5),
    ("ds1", "1", "Channel:2:3", 9.0, 4.5),
    ("ds1", "2", "CD45", 6.0, 3.0), ("ds1", "2", "DAPI", 2.0, 1.0),
    ("ds1", "2", "Channel:2:3", 8.0, 4.0),
    ("ds2", "1", "CD45", 7.0, 3.5), ("ds2", "1", "my blank stain", 1.0, 0.5),
    ("ds2", "1", "ECAD", 3.0, 1.5),
    ("ds2", "3", "CD45", 8.0, 4.0), ("ds2", "3", "my blank stain", 2.0, 1.0),
    ("ds2", "3", "ECAD", 4.0, 2.0),
    ("p1", "9", "CD45", 1.0, 1.0) // non-leaf dataset must be excluded
  ).toDF("dataset", "original_obs_id", "channel", "total", "mean")

  def centers = Seq(
    ("ds1", 1L, 10.0, 11.0), ("ds1", 2L, 20.0, 21.0),
    ("ds1", 99L, 0.0, 0.0), // unknown cell — must be filtered (O-5)
    ("ds2", 1L, 30.0, 31.0), ("ds2", 3L, 40.0, 41.0)
  ).toDF("dataset", "ID", "x", "y")

  // adjacency: ds1 labels file lists cells 1,7,2 (7 not in matrix → dropped,
  // kept cells re-index to 1→1, 2→2); edge (1,3) references label idx 3=cell 2
  def labels = Seq(
    ("ds1", 1L, 1L), ("ds1", 2L, 7L), ("ds1", 3L, 2L),
    ("ds2", 1L, 3L), ("ds2", 2L, 1L)
  ).toDF("dataset", "idx", "cell_id")

  def edges = Seq(
    ("ds1", 1L, 3L, 1.0), // cell1–cell2 via label positions 1,3
    ("ds1", 1L, 2L, 9.0), // references dropped label 7 → must vanish
    ("ds2", 1L, 2L, 2.0)  // ds2 cell3–cell1, offset by ds1 block size (2)
  ).toDF("dataset", "row", "col", "value")

  def antibodies = Seq(
    ("ds1", "CD45", "P08575", "AB_1", "cyc001_ch001"),
    ("ds1", "DAPI", null, null, "cyc001_ch002"),
    ("ds2", "CD45", "P08575", "AB_2", "cyc002_ch001")
  ).toDF("dataset", "antibody_name", "uniprot_accession_number", "rr_id",
    "channel_id")

  lazy val bundle = CodexProduct.build(spark, manifest,
    DatasetInputs(xLong, centers, edges, labels, antibodies),
    tissue = "Kidney", productUuid = "prod-1",
    creationTime = "2026-01-01 00:00:00")

  test("obs: leaf cells only, composite keys, donor join, EPIC constants") {
    val obs = bundle.obs.collect()
    val ids = obs.map(_.getAs[String]("cell_id")).toSet
    assert(ids == Set("ds1-1", "ds1-2", "ds2-1", "ds2-3"))
    val r = bundle.obs.filter($"cell_id" === "ds1-1").collect().head
    assert(r.getAs[Double]("age") == 61.0 &&
      r.getAs[String]("object_type") == "ftu" &&
      r.getAs[String]("analyte_class") == "Protein" &&
      r.getAs[String]("tissue") == "Kidney")
    // null donor fields survive as nulls (no pandas 'nan' strings)
    val r2 = bundle.obs.filter($"cell_id" === "ds2-1").collect().head
    assert(r2.isNullAt(r2.fieldIndex("age")))
  }

  test("var: union of channel sets minus Channel:n:n and blanks (O-7)") {
    assert(bundle.varDf.as[String].collect().toSet ==
      Set("CD45", "DAPI", "ECAD"))
  }

  test("x_long: filtered channels removed, keys composite") {
    val x = bundle.xLong
    assert(x.count() == 8)
    assert(x.filter($"channel" === "Channel:2:3").count() == 0)
    assert(x.filter($"cell_id" === "ds2-3" && $"channel" === "CD45")
      .select("total").as[Double].collect().head == 8.0)
  }

  test("obsm centers: semi-joined to obs cells only") {
    val got = bundle.obsmCenters.collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got == Set(("ds1-1", 10.0), ("ds1-2", 20.0), ("ds2-1", 30.0),
      ("ds2-3", 40.0)))
  }

  test("varm: per-dataset annotations aligned to final var, nulls filled") {
    val varm = bundle.varm
    val cd45 = varm.filter($"channel" === "CD45")
      .select("dataset", "uniprot_accession_number").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(cd45 == Set(("ds1", "P08575"), ("ds2", "P08575")))
    // ECAD has no antibody row anywhere → one null-annotation row (O-23)
    val ecad = varm.filter($"channel" === "ECAD").collect()
    assert(ecad.length == 1 && ecad.head.isNullAt(1))
  }

  test("obsp: dropped labels vanish, block-diag offsets applied (O-22/J-5)") {
    val got = bundle.obspEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ds1: kept labels cell1→1, cell2→2 (label idx 3 → dense 2);
    //      edge (1,3)→(1,2); edge (1,2) hit dropped label → gone
    // ds2: labels cell3→1, cell1→2, offset 2 → edge (1,2)→(3,4)
    assert(got == Set((1L, 2L, 1.0), (3L, 4L, 2.0)))
  }

  test("uns: product scalars incl. total cell count (O-26)") {
    val r = bundle.uns.collect().head
    assert(r.getAs[String]("uuid") == "prod-1")
    assert(r.getAs[Long]("total_cell_count") == 4L)
    // datasets = HuBMAP IDs (concatenate.py:437); uuids ride separately
    assert(r.getAs[String]("datasets") == "HBM1,HBM2")
    assert(r.getAs[String]("dataset_uuids") == "ds1,ds2")
  }

  test("K-1 sink writes the component-table bundle") {
    val out = java.nio.file.Files.createTempDirectory("graft-prod")
    CodexProduct.write(bundle, out.toString)
    val obs = spark.read.parquet(s"$out/obs")
    assert(obs.count() == 4)
    val uns = spark.read.json(s"$out/uns")
    assert(uns.select("uuid").as[String].collect().head == "prod-1")
  }

  test("K-1 h5mu sink: native artifact round-trips through Hdf5Reader") {
    val out = java.nio.file.Files.createTempDirectory("graft-h5mu")
    CodexProduct.writeH5mu(bundle, out.toString)
    val bytes = java.nio.file.Files.readAllBytes(
      out.resolve("Kidney_raw.h5mu"))
    val h5 = new graft.sources.Hdf5Reader(bytes)
    val m = "mod/prod-1_raw"
    // obs/var indices: sorted cell_id / channel order
    assert(h5.readStringVector(h5.resolve(s"$m/obs/_index").get) ==
      Seq("ds1-1", "ds1-2", "ds2-1", "ds2-3"))
    assert(h5.readStringVector(h5.resolve(s"$m/var/_index").get) ==
      Seq("CD45", "DAPI", "ECAD"))
    // X = total, layers/mean_expression = mean; absent entries NaN
    val x = h5.readDoubleMatrix(h5.resolve(s"$m/X").get)
    assert(x.length == 4 && x(0).length == 3)
    assert(x(0)(0) == 5.0 && x(0)(1) == 1.0 && x(0)(2).isNaN)
    assert(x(3)(0) == 8.0 && x(3)(1).isNaN && x(3)(2) == 4.0)
    val mean = h5.readDoubleMatrix(
      h5.resolve(s"$m/layers/mean_expression").get)
    assert(mean(0)(0) == 2.5 && mean(2)(2) == 1.5)
    // obs columns ride as typed vectors (double age with NaN null)
    val age = h5.readDoubleVector(h5.resolve(s"$m/obs/age").get)
    assert(age(0) == 61.0 && age(2).isNaN)
    // spatial centers aligned to obs order
    val sp = h5.readDoubleMatrix(h5.resolve(s"$m/obsm/X_spatial").get)
    assert(sp(0).toSeq == Seq(10.0, 11.0) && sp(3).toSeq == Seq(40.0, 41.0))
    // adjacency COO in O-22 global indices
    assert(h5.readLongVector(h5.resolve(s"$m/obsp/adjacency/src").get)
      .toSeq == Seq(1L, 3L))
    assert(h5.readLongVector(h5.resolve(s"$m/obsp/adjacency/dst").get)
      .toSeq == Seq(2L, 4L))
    assert(h5.readDoubleVector(h5.resolve(s"$m/obsp/adjacency/weight").get)
      .toSeq == Seq(1.0, 2.0))
    // varm long-form annotations present for both CD45 datasets
    assert(h5.readStringVector(
      h5.resolve(s"$m/varm/antibodies/channel").get)
      .count(_ == "CD45") == 2)
    // uns scalars + EPIC tags (concatenate.py:451-456)
    assert(h5.readStringVector(h5.resolve(s"$m/uns/tissue").get) ==
      Seq("Kidney"))
    assert(h5.readLongVector(
      h5.resolve(s"$m/uns/total_cell_count").get).toSeq == Seq(4L))
    assert(h5.readStringVector(h5.resolve("uns/epic_type").get) ==
      Seq("analyses"))
    graft.queries.Scratch.rmTree(out.toFile)
  }

  test("h5mu sink: empty-edge and missing-center edges write cleanly") {
    val noEdges = CodexProduct.build(spark, manifest,
      DatasetInputs(xLong,
        centers.filter($"dataset" === "ds1"), // ds2 cells lack centers
        edges.filter(lit(false)),             // zero edges survive
        labels, antibodies),
      tissue = "Kidney", productUuid = "prod-2",
      creationTime = "2026-01-01 00:00:00")
    val out = java.nio.file.Files.createTempDirectory("graft-h5mu2")
    CodexProduct.writeH5mu(noEdges, out.toString)
    val h5 = new graft.sources.Hdf5Reader(
      java.nio.file.Files.readAllBytes(out.resolve("Kidney_raw.h5mu")))
    val m = "mod/prod-2_raw"
    assert(h5.readLongVector(
      h5.resolve(s"$m/obsp/adjacency/src").get).isEmpty)
    assert(h5.readDoubleVector(
      h5.resolve(s"$m/obsp/adjacency/weight").get).isEmpty)
    val sp = h5.readDoubleMatrix(h5.resolve(s"$m/obsm/X_spatial").get)
    assert(sp(0)(0) == 10.0 && sp(2)(0).isNaN) // ds2-1 center missing
    graft.queries.Scratch.rmTree(out.toFile)
  }

  test("F-1 analyte strip + channel normalization") {
    val df = Seq("Anti-CD45", "E-CAD antibody", "panCK").toDF("channel")
    val aliases = Seq(("e-cad", "ECAD")).toDF("alias_lower", "canonical")
    val got = CodexProduct.normalizeChannels(df, "channel", aliases)
      .as[String].collect().toSet
    assert(got == Set("CD45", "ECAD", "panCK"))
  }
}
