package graft

import graft.sources.Sources
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def tmpFile(name: String, content: String): Path = {
    val dir = Files.createTempDirectory("graft-src")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p
  }

  test("S-6 MatrixMarket reader skips banner/comments/dims, parses triples") {
    val p = tmpFile("adj.mtx",
      """%%MatrixMarket matrix coordinate real general
        |% a comment line
        |3 3 4
        |1 2 0.5
        |2 1 0.5
        |2 3 1.5
        |3 3 2.0
        |""".stripMargin)
    val df = Sources.matrixMarket(spark, p.toString)
    val rows = df.orderBy("row", "col").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, 2L, 0.5), (2L, 1L, 0.5), (2L, 3L, 1.5),
      (3L, 3L, 2.0)))
  }

  test("S-6 MatrixMarket pattern (no value) defaults weight to 1.0") {
    val p = tmpFile("pat.mtx",
      "%%MatrixMarket matrix coordinate pattern general\n2 2 1\n1 2\n")
    val rows = Sources.matrixMarket(spark, p.toString).collect()
    assert(rows.length == 1 && rows(0).getDouble(2) == 1.0)
  }

  test("S-7 label reader: line order = 1-based index") {
    val p = tmpFile("labels.txt", "101\n205\n3\n")
    val rows = Sources.labels(spark, p.toString)
      .orderBy("idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 101L), (2L, 205L), (3L, 3L)))
  }

  test("S-7 label reader: blank lines don't shift indices (pandas parity)") {
    // pandas read_csv skips blank lines, so the 1-based matrix index counts
    // PARSED rows — an interior blank line must not create a gap
    val p = tmpFile("labels_blank.txt", "101\n\n205\n   \n3\n")
    val rows = Sources.labels(spark, p.toString)
      .orderBy("idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 101L), (2L, 205L), (3L, 3L)))
  }

  test("S-1 manifest TSV: all-string schema, header respected") {
    val p = tmpFile("uuids.tsv",
      "uuid\thubmap_id\timmediate_ancestor_ids\timmediate_descendant_ids" +
        "\tage\tsex\theight\tweight\tbmi\tcause_of_death\trace\n" +
        "u1\tHBM1\tp1\t\t61\tMale\t180\t80\t24.7\tX\tWhite\n")
    val df = Sources.manifestTsv(spark, p.toString)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val r = df.collect().head
    assert(r.getAs[String]("uuid") == "u1" &&
      r.getAs[String]("age") == "61")
  }

  test("S-8 organ YAML lookup parses flat 2-level map") {
    val m = Sources.organLookup(
      """AO:
        |  description: Aorta
        |LK:
        |  description: Kidney (Left)
        |""".stripMargin)
    assert(m == Map("AO" -> "Aorta", "LK" -> "Kidney (Left)"))
  }

  test("alias table flattens str→list dict to (alias_lower, canonical)") {
    val df = Sources.aliasTable(spark,
      Map("CD45" -> Seq("cd45", "CD-45 "), "DAPI" -> Seq("dapi")))
    val pairs = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("cd45", "CD45"), ("cd-45", "CD45"),
      ("dapi", "DAPI")))
  }

  test("S-11 file manifest discovers files by kind glob") {
    val dir = Files.createTempDirectory("graft-disc")
    Files.createDirectories(dir.resolve("ds1"))
    Files.createDirectories(dir.resolve("ds2"))
    Files.writeString(dir.resolve("ds1/out.hdf5"), "x")
    Files.writeString(dir.resolve("ds2/out.hdf5"), "x")
    Files.writeString(dir.resolve("ds1/a_antibodies.tsv"), "x")
    val mf = Sources.fileManifest(spark, dir.toString,
      Map("hdf5" -> "*/out.hdf5", "antibodies" -> "*/*antibodies.tsv"))
    val got = mf.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("ds1", "hdf5"), ("ds2", "hdf5"),
      ("ds1", "antibodies")))
  }
}
