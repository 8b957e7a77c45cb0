package graft

import graft.product.{CodexProduct, Hdf5Ingest}
import graft.product.CodexProduct.DatasetInputs
import graft.sources.Hdf5Reader
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** S-5 converter coverage: the pure-JVM HDF5 reader over pandas-fixed-
  * format-shaped stores, BOTH store-key conventions of
  * `bin/concatenate.py:240-241` (stitched reg1 and reg001 fallback), the
  * distributed across-files conversion, and the converted output feeding
  * the product pipeline.
  */
class Hdf5IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  import graft.sources.Hdf5Writer._

  val key1Path = Seq("channel", "cell", "expressions.ome.tiff",
    "stitched", "reg1")
  val key2Path = Seq("channel", "cell", "expr.ome.tiff", "reg001")

  /** One out.hdf5: total + meanAll trees under the given key layout. */
  def store(path: Seq[String], channels: Seq[String], obs: Seq[Long],
            total: Array[Double], mean: Array[Double]): Array[Byte] =
    write(Group(Seq(
      "total" -> nest(path, pandasLeaf(channels, obs, total)),
      "meanAll" -> nest(path, pandasLeaf(channels, obs, mean)))))

  test("reader: groups navigate, matrices/vectors round-trip exactly") {
    val bytes = store(key1Path, Seq("CD45", "DAPI"), Seq(0L, 1L),
      Array(1.0, 2.0, 3.0, 4.0), Array(0.5, 1.0, 1.5, 2.0))
    val r = new Hdf5Reader(bytes)
    val totalKey = "total/channel/cell/expressions.ome.tiff/stitched/reg1"
    assert(r.exists(totalKey) && !r.exists("total/zzz"))
    val leaf = r.resolve(s"$totalKey/block0_values").get
    assert(r.readDoubleMatrix(leaf).map(_.toSeq).toSeq ==
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    assert(r.readStringVector(r.resolve(s"$totalKey/axis0").get) ==
      Seq("CD45", "DAPI"))
    assert(r.readStringVector(r.resolve(s"$totalKey/axis1").get) ==
      Seq("0", "1"))
  }

  test("reader/writer property round-trip: random shapes, names, values") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val gen = for {
      rows <- Gen.choose(1, 17)
      cols <- Gen.choose(1, 9)
      names <- Gen.listOfN(cols,
        Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
        .map(_.zipWithIndex.map { case (n, i) => s"${n}_$i" }) // unique
      values <- Gen.listOfN(rows * cols,
        Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v) / 4))
      depth <- Gen.choose(1, 5)
      path <- Gen.listOfN(depth,
        Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
        .map(_.zipWithIndex.map { case (n, i) => s"${n}_$i" })
    } yield (rows, cols, names, values.toArray, path)
    (1 to 25).foreach { seed =>
      val (rows, cols, names, values, path) = sample(gen, seed.toLong)
      val bytes = write(Group(Seq("g" ->
        nest(path, pandasLeaf(names, (0L until rows.toLong), values)))))
      val r = new Hdf5Reader(bytes)
      val leafPath = ("g" +: path).mkString("/")
      assert(r.exists(leafPath), s"seed $seed: path missing")
      assert(r.readStringVector(
        r.resolve(s"$leafPath/axis0").get) == names, s"seed $seed")
      val m = r.readDoubleMatrix(r.resolve(s"$leafPath/block0_values").get)
      assert(m.flatten.toSeq == values.toSeq, s"seed $seed")
    }
  }

  test("writer: 1-D double/long vectors round-trip (h5mu COO nodes)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val gen = for {
      n <- Gen.choose(0, 33)
      ds <- Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-1e12, 1e12),
        Gen.const(Double.NaN), Gen.const(0.0),
        Gen.const(Double.MinPositiveValue)))
      ls <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield (ds.toArray, ls)
    (1 to 25).foreach { seed =>
      val (ds, ls) = sample(gen, seed.toLong)
      val bytes = write(Group(Seq(
        "w" -> DoubleVector(ds), "i" -> LongVector(ls))))
      val r = new Hdf5Reader(bytes)
      val gotD = r.readDoubleVector(r.resolve("w").get)
      // NaN-safe bit-level compare (== would fail on NaN slots)
      assert(gotD.length == ds.length &&
        gotD.zip(ds).forall { case (a, b) =>
          java.lang.Double.doubleToLongBits(a) ==
            java.lang.Double.doubleToLongBits(b) }, s"seed $seed")
      assert(r.readLongVector(r.resolve("i").get).toSeq == ls,
        s"seed $seed")
    }
  }


  test("chunked+DEFLATE round-trip: random shapes, chunk sizes and " +
    "levels (incl. edge chunks, level 0, single-chunk, chunk==rows); " +
    "converter reads a chunked store unchanged") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val gen = for {
      rows <- Gen.choose(1, 40)
      cols <- Gen.choose(1, 7)
      chunkRows <- Gen.choose(1, 40).map(c => math.min(c, rows))
      level <- Gen.choose(0, 9)
      values <- Gen.listOfN(rows * cols,
        Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v) / 4))
    } yield (rows, cols, chunkRows, level, values.toArray)
    (1 to 25).foreach { seed =>
      val (rows, cols, chunkRows, level, values) = sample(gen, seed.toLong)
      val bytes = write(Group(Seq("d" ->
        ChunkedDoubleMatrix(rows, cols, chunkRows, values, level))))
      val r = new Hdf5Reader(bytes)
      val m = r.readDoubleMatrix(r.resolve("d").get)
      assert(m.flatten.toSeq == values.toSeq,
        s"seed $seed rows=$rows chunkRows=$chunkRows level=$level")
      // compression actually happened for repetitive data at level>0:
      // not asserted per-seed (random data may not shrink), checked
      // once below
    }
    // a repetitive matrix must genuinely shrink under deflate
    val rep = Array.fill(64 * 8)(1.25)
    val packed = write(Group(Seq("d" ->
      ChunkedDoubleMatrix(64, 8, 16, rep, level = 6))))
    val plain = write(Group(Seq("d" -> DoubleMatrix(64, 8, rep))))
    assert(packed.length < plain.length / 4,
      s"deflate did not compress: ${packed.length} vs ${plain.length}")
    val rrep = new Hdf5Reader(packed)
    assert(rrep.readDoubleMatrix(rrep.resolve("d").get)
      .flatten.forall(_ == 1.25))

    // the S-5 ingest path reads a CHUNKED pandas-style store with the
    // converter unchanged: same leaf shape, block0_values chunked
    val chunkedLeaf = Group(Seq(
      "axis0" -> StringVector(Seq("CD45", "DAPI")),
      "axis1" -> LongVector(Seq(0L, 1L)),
      "block0_items" -> StringVector(Seq("CD45", "DAPI")),
      "block0_values" -> ChunkedDoubleMatrix(2, 2, 1,
        Array(1.0, 2.0, 3.0, 4.0), level = 6)))
    val storeBytes = write(Group(Seq(
      "total" -> nest(key1Path, chunkedLeaf),
      "meanAll" -> nest(key1Path, Group(Seq(
        "axis0" -> StringVector(Seq("CD45", "DAPI")),
        "axis1" -> LongVector(Seq(0L, 1L)),
        "block0_items" -> StringVector(Seq("CD45", "DAPI")),
        "block0_values" -> ChunkedDoubleMatrix(2, 2, 2,
          Array(0.5, 1.0, 1.5, 2.0), level = 1)))))))
    val root = java.nio.file.Files.createTempDirectory("h5chunked")
    val d = root.resolve("dsc"); java.nio.file.Files.createDirectory(d)
    java.nio.file.Files.write(d.resolve("out.hdf5"), storeBytes)
    val got = Hdf5Ingest.convert(spark, root.toString)
      .as[(String, String, String, Double, Double)].collect().toSet
    assert(got == Set(
      ("dsc", "0", "CD45", 1.0, 0.5), ("dsc", "0", "DAPI", 2.0, 1.0),
      ("dsc", "1", "CD45", 3.0, 1.5), ("dsc", "1", "DAPI", 4.0, 2.0)))
  }

  test("reader rejects non-deflate filters and malformed chunk trees " +
    "with clear errors") {
    // hand-corrupt the filter id in a valid chunked file: id 2 =
    // shuffle, which the reader must refuse by name, not garble
    val bytes = write(Group(Seq("d" ->
      ChunkedDoubleMatrix(4, 2, 2, Array.tabulate(8)(_.toDouble)))))
    // the filter message body starts with version=1, nfilters=1 and the
    // id u16 sits at offset 8 — locate it via the unique byte pattern
    val r0 = new Hdf5Reader(bytes)
    assert(r0.readDoubleMatrix(r0.resolve("d").get)
      .flatten.toSeq == (0 until 8).map(_.toDouble))
    var patched = 0
    (0 until bytes.length - 24).foreach { p =>
      // msg header: type=0x000B size + the v1 body (1,1,0,0,0,0,0,0)
      if (patched == 0 && bytes(p) == 0x0B && bytes(p + 1) == 0 &&
        bytes(p + 8) == 1 && bytes(p + 9) == 1 &&
        bytes(p + 16) == 1 && bytes(p + 17) == 0) {
        bytes(p + 16) = 2 // deflate -> shuffle
        patched += 1
      }
    }
    assert(patched == 1, "filter message not found to patch")
    val ex = intercept[IllegalArgumentException] {
      val r = new Hdf5Reader(bytes)
      r.readDoubleMatrix(r.resolve("d").get)
    }
    assert(ex.getMessage.contains("unsupported filter id 2"))
  }

  test("parseStore: stitched reg1 key convention") {
    val rows = Hdf5Ingest.parseStore(store(key1Path, Seq("CD45", "DAPI"),
      Seq(0L, 1L), Array(1.0, 2.0, 3.0, 4.0),
      Array(0.5, 1.0, 1.5, 2.0))).toSet
    assert(rows == Set(
      ("0", "CD45", 1.0, 0.5), ("0", "DAPI", 2.0, 1.0),
      ("1", "CD45", 3.0, 1.5), ("1", "DAPI", 4.0, 2.0)))
  }

  test("parseStore: reg001 fallback key convention") {
    val rows = Hdf5Ingest.parseStore(store(key2Path, Seq("ECAD"),
      Seq(7L), Array(9.0), Array(4.5))).toSet
    assert(rows == Set(("7", "ECAD", 9.0, 4.5)))
  }

  test("reader rejects malformed input with clear errors, never garbage") {
    val good = store(key1Path, Seq("X"), Seq(0L), Array(1.0), Array(0.5))
    // bad signature
    val badSig = good.clone(); badSig(0) = 'Z'
    assert(intercept[IllegalArgumentException](new Hdf5Reader(badSig))
      .getMessage.contains("signature"))
    // unsupported superblock version
    val badVer = good.clone(); badVer(8) = 3
    assert(intercept[IllegalArgumentException](new Hdf5Reader(badVer))
      .getMessage.contains("superblock version"))
    // truncated to less than a superblock
    assert(intercept[IllegalArgumentException](
      new Hdf5Reader(good.take(40))).getMessage.contains("signature"))
  }

  test("parseStore: neither key convention → clear contract error") {
    val bytes = write(Group(Seq("total" ->
      nest(Seq("other"), pandasLeaf(Seq("X"), Seq(0L), Array(1.0))))))
    val e = intercept[RuntimeException](Hdf5Ingest.parseStore(bytes))
    assert(e.getMessage.contains("store key convention"))
  }

  def makeRoot(): Path = {
    val root = Files.createTempDirectory("graft-h5")
    Files.createDirectories(root.resolve("ds1"))
    Files.createDirectories(root.resolve("ds2"))
    Files.write(root.resolve("ds1/out.hdf5"),
      store(key1Path, Seq("CD45", "DAPI"), Seq(0L, 1L),
        Array(1.0, 2.0, 3.0, 4.0), Array(0.5, 1.0, 1.5, 2.0)))
    Files.write(root.resolve("ds2/out.hdf5"),
      store(key2Path, Seq("CD45"), Seq(5L), Array(7.0), Array(3.5)))
    root
  }

  test("convert: mixed-convention fleet → one long DataFrame") {
    val got = Hdf5Ingest.convert(spark, makeRoot().toString)
      .as[(String, String, String, Double, Double)].collect().toSet
    assert(got == Set(
      ("ds1", "0", "CD45", 1.0, 0.5), ("ds1", "0", "DAPI", 2.0, 1.0),
      ("ds1", "1", "CD45", 3.0, 1.5), ("ds1", "1", "DAPI", 4.0, 2.0),
      ("ds2", "5", "CD45", 7.0, 3.5)))
  }

  test("converted x_long feeds the product pipeline end to end") {
    val xLong = Hdf5Ingest.convert(spark, makeRoot().toString)
    val manifest = Seq(
      ("ds1", "HBM1", "p", null, "50", "F", null, null, null, null, null),
      ("ds2", "HBM2", "p", null, "60", "M", null, null, null, null, null))
      .toDF("uuid", "hubmap_id", "immediate_ancestor_ids",
        "immediate_descendant_ids", "age", "sex", "height", "weight",
        "bmi", "cause_of_death", "race")
    val centers = Seq(("ds1", 0L, 1.0, 2.0), ("ds1", 1L, 3.0, 4.0),
      ("ds2", 5L, 5.0, 6.0)).toDF("dataset", "ID", "x", "y")
    val labels = Seq(("ds1", 1L, 0L), ("ds1", 2L, 1L), ("ds2", 1L, 5L))
      .toDF("dataset", "idx", "cell_id")
    val edges = Seq(("ds1", 1L, 2L, 1.0), ("ds2", 1L, 1L, 0.5))
      .toDF("dataset", "row", "col", "value")
    val antibodies = Seq(("ds1", "CD45", "P08575", "AB_1", "c1"))
      .toDF("dataset", "antibody_name", "uniprot_accession_number",
        "rr_id", "channel_id")
    val bundle = CodexProduct.build(spark, manifest,
      DatasetInputs(xLong, centers, edges, labels, antibodies),
      "Kidney", "prod-h5", "2026-01-01 00:00:00")
    assert(bundle.obs.select("cell_id").as[String].collect().toSet ==
      Set("ds1-0", "ds1-1", "ds2-5"))
    assert(bundle.xLong.filter($"cell_id" === "ds1-1" &&
      $"channel" === "DAPI").select("total").as[Double]
      .collect().head == 4.0)
    // global edges: ds1 (0,1)→(1,2); ds2 single cell offset 2 →(3,3)
    assert(bundle.obspEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      Set((1L, 2L, 1.0), (3L, 3L, 0.5)))
  }
}
