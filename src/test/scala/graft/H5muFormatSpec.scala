package graft

import graft.product.CodexProduct
import graft.sources.{Hdf5Reader, Hdf5Writer}
import org.apache.spark.sql.functions.{format_string, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 h5mu format hardening: anndata/mudata encoding attributes
  * (real HDF5 v1 attribute messages), iterator-fed dataset nodes
  * producing byte-identical files to the eager nodes, and the pandas
  * nullable-long → float64+NaN promotion.
  */
class H5muFormatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Hdf5Writer._

  test("stream nodes are byte-identical to eager nodes") {
    val vals = Array.tabulate(12)(i => i * 1.5 - 3)
    val longs = Seq(5L, -1L, 7L)
    val eager = write(Group(Seq(
      "m" -> DoubleMatrix(3, 4, vals),
      "v" -> DoubleVector(vals.take(5)),
      "l" -> LongVector(longs))))
    val streamed = write(Group(Seq(
      "m" -> DoubleMatrixStream(3, 4, () => vals.iterator),
      "v" -> DoubleVectorStream(5, () => vals.take(5).iterator),
      "l" -> LongVectorStream(3, () => longs.iterator))))
    assert(java.util.Arrays.equals(eager, streamed))
  }

  test("stream node with wrong element count fails loudly") {
    intercept[IllegalArgumentException] {
      write(Group(Seq(
        "m" -> DoubleMatrixStream(2, 2, () => Iterator(1.0, 2.0)))))
    }
  }

  test("attribute messages round-trip and do not break dataset reads") {
    val bytes = writeAttributed(
      Group(Seq(
        "x" -> Attributed(DoubleVector(Array(1.0, 2.0)), Seq(
          "encoding-type" -> StrAttr("array"),
          "encoding-version" -> StrAttr("0.2.0"))),
        "g" -> Attributed(Group(Seq(
          "i" -> StringVector(Seq("a", "bb")))), Seq(
          "encoding-type" -> StrAttr("dataframe"),
          "column-order" -> StrArrayAttr(Seq("c1", "c2")),
          "empty-order" -> StrArrayAttr(Nil))))),
      Seq("encoding-type" -> StrAttr("MuData"),
        "encoding-version" -> StrAttr("0.1.0")))
    val h5 = new Hdf5Reader(bytes)
    // root attrs live on the root group's object header
    val rootAddr = h5.resolve("").get
    assert(h5.readAttributes(rootAddr) ==
      Map("encoding-type" -> "MuData", "encoding-version" -> "0.1.0"))
    val xAddr = h5.resolve("x").get
    assert(h5.readAttributes(xAddr)("encoding-type") == "array")
    assert(h5.readDoubleVector(xAddr).toSeq == Seq(1.0, 2.0))
    val gAttrs = h5.readAttributes(h5.resolve("g").get)
    assert(gAttrs("encoding-type") == "dataframe")
    assert(gAttrs("column-order") == Seq("c1", "c2"))
    assert(gAttrs("empty-order") == Seq.empty[String])
    assert(h5.readStringVector(h5.resolve("g/i").get) == Seq("a", "bb"))
  }

  test("writeH5mu carries anndata/mudata encoding attributes") {
    val bundle = smallBundle()
    val out = java.nio.file.Files.createTempDirectory("graft-h5mu-attrs")
    CodexProduct.writeH5mu(bundle, out.toString)
    val h5 = new Hdf5Reader(java.nio.file.Files.readAllBytes(
      out.resolve("T_raw.h5mu")))
    val root = h5.readAttributes(h5.resolve("").get)
    assert(root("encoding-type") == "MuData" &&
      root("encoding-version") == "0.1.0")
    val mod = h5.readAttributes(h5.resolve("mod").get)
    assert(mod("mod-order") == Seq("u1_raw"))
    assert(h5.readAttributes(h5.resolve("mod/u1_raw").get)
      ("encoding-type") == "anndata")
    assert(h5.readAttributes(h5.resolve("mod/u1_raw/X").get)
      ("encoding-type") == "array")
    val obs = h5.readAttributes(h5.resolve("mod/u1_raw/obs").get)
    assert(obs("encoding-type") == "dataframe")
    assert(obs("_index") == "_index")
    assert(obs("column-order") == Seq("n_reads", "rank"))
    assert(h5.readAttributes(h5.resolve("mod/u1_raw/obs/_index").get)
      ("encoding-type") == "string-array")
    assert(h5.readAttributes(h5.resolve("mod/u1_raw/layers").get)
      ("encoding-type") == "dict")
    graft.queries.Scratch.rmTree(out.toFile)
  }

  test("nullable long obs column promotes to float64 + NaN (pandas)") {
    val bundle = smallBundle()
    val out = java.nio.file.Files.createTempDirectory("graft-h5mu-nl")
    CodexProduct.writeH5mu(bundle, out.toString)
    val h5 = new Hdf5Reader(java.nio.file.Files.readAllBytes(
      out.resolve("T_raw.h5mu")))
    // n_reads has a null → float64 vector with NaN, not int64 with 0
    val nr = h5.readDoubleVector(h5.resolve("mod/u1_raw/obs/n_reads").get)
    assert(nr(0) == 10.0 && nr(1).isNaN)
    // all-non-null long column stays int64
    val rk = h5.readLongVector(h5.resolve("mod/u1_raw/obs/rank").get)
    assert(rk.toSeq == Seq(1L, 2L))
    graft.queries.Scratch.rmTree(out.toFile)
  }

  test("matrix streaming: 200x200 product with Row footprint > matrix") {
    // 40k long-form entries (~4-8 MB as JVM Rows) against a 320 KB
    // dense matrix — the size class where the old collect()-of-Rows
    // path paid ~10-25x the matrix in driver heap. The streamed writer
    // consumes them through one sorted pass per matrix; verify exact
    // cell placement including gaps on a deterministic sparse pattern.
    val n = 200
    val obs = spark.range(n).select(
      format_string("c%03d", $"id").as("cell_id"), $"id".as("rank"))
    val varDf = spark.range(n)
      .select(format_string("v%03d", $"id").as("channel"))
    // entry (i,j) present iff (i+j) % 2 == 0; total = i*1000 + j
    val xLong = spark.range(n.toLong * n)
      .select(($"id" / n).cast("long").as("i"), ($"id" % n).as("j"))
      .filter(($"i" + $"j") % 2 === 0)
      .select(format_string("c%03d", $"i").as("cell_id"),
        format_string("v%03d", $"j").as("channel"),
        ($"i" * 1000 + $"j").cast("double").as("total"),
        lit(0.5).as("mean"))
    val centers = spark.range(0).select(lit("x").as("cell_id"),
      lit(0.0).as("x"), lit(0.0).as("y"))
    val varm = Seq(("v000", "d1", "P1", "AB_1", "ch1"))
      .toDF("channel", "dataset", "uniprot_accession_number", "rr_id",
        "channel_id")
    val edges = spark.range(0).select($"id".as("src"), $"id".as("dst"),
      lit(0.0).as("weight"))
    val uns = Seq(("u9", "Big", "2026-01-01", "HBM", "d1", n.toLong))
      .toDF("uuid", "tissue", "creation_time", "datasets",
        "dataset_uuids", "total_cell_count")
    val bundle = CodexProduct.Bundle(obs, varDf, xLong, centers, varm,
      edges, uns)
    val out = java.nio.file.Files.createTempDirectory("graft-h5mu-big")
    CodexProduct.writeH5mu(bundle, out.toString)
    val h5 = new Hdf5Reader(java.nio.file.Files.readAllBytes(
      out.resolve("Big_raw.h5mu")))
    val x = h5.readDoubleMatrix(h5.resolve("mod/u9_raw/X").get)
    assert(x.length == n && x(0).length == n)
    var checked = 0
    (0 until n by 7).foreach { i =>
      (0 until n by 11).foreach { j =>
        if ((i + j) % 2 == 0) assert(x(i)(j) == i * 1000.0 + j)
        else assert(x(i)(j).isNaN)
        checked += 1
      }
    }
    assert(checked > 500)
    graft.queries.Scratch.rmTree(out.toFile)
  }

  /** Hand-built bundle (Bundle is a plain case class of frames): two
    * cells, two channels, one nullable long obs column. */
  private def smallBundle(): CodexProduct.Bundle = {
    val obs = Seq(
      ("c1", Some(10L), 1L), ("c2", None, 2L)
    ).toDF("cell_id", "n_reads", "rank")
    val varDf = Seq("A", "B").toDF("channel")
    val xLong = Seq(
      ("c1", "A", 1.0, 0.5), ("c1", "B", 2.0, 1.0),
      ("c2", "A", 3.0, 1.5)
    ).toDF("cell_id", "channel", "total", "mean")
    val centers = Seq(("c1", 1.0, 2.0)).toDF("cell_id", "x", "y")
    val varm = Seq(("A", "d1", "P1", "AB_1", "ch1"))
      .toDF("channel", "dataset", "uniprot_accession_number", "rr_id",
        "channel_id")
    val edges = Seq((1L, 2L, 0.5)).toDF("src", "dst", "weight")
    val uns = Seq(("u1", "T", "2026-01-01", "HBM1", "d1", 2L))
      .toDF("uuid", "tissue", "creation_time", "datasets",
        "dataset_uuids", "total_cell_count")
    CodexProduct.Bundle(obs, varDf, xLong, centers, varm, edges, uns)
  }
}
