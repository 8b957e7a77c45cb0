package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("O-22 blockOffsets: offset = prefix sum of preceding block sizes") {
    val sizes = Seq(("a", 3L), ("b", 5L), ("c", 2L)).toDF("k", "n")
    val got = Relational.blockOffsets(sizes, "k", "n", col("k"), "off")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 0L), ("b", 3L), ("c", 8L)))
  }

  test("O-20 outerConcat: row count = Σ inputs, missing cols → null") {
    val a = Seq((1, "x")).toDF("id", "s")
    val b = Seq((2, 9.5)).toDF("id", "d")
    val u = Relational.outerConcat(Seq(a, b))
    assert(u.count() == 2)
    assert(u.columns.toSet == Set("id", "s", "d"))
    assert(u.filter($"id" === 2).select("s").collect().head.isNullAt(0))
  }

  test("J-4 firstMatchPerKey is deterministic under reordering") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30))
      .toDF("k", "v", "o")
    val got = Relational.firstMatchPerKey(df, Seq("k"),
        Seq(col("o"), col("v")))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (2, "c")))
    val shuffled = Relational.firstMatchPerKey(df.orderBy(rand(7)),
        Seq("k"), Seq(col("o"), col("v")))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(shuffled.toSeq == got.toSeq)
  }

  test("J-5 denseIndex: dense 1..n per partition key") {
    val df = Seq(("a", 10L), ("a", 5L), ("b", 7L)).toDF("k", "v")
    val got = Relational.denseIndex(df, "idx", Seq(col("v")),
        Seq(col("k")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got == Set(("a", 5L, 1), ("a", 10L, 2), ("b", 7L, 1)))
  }

  test("J-3 aliasNormalize: case/trim-insensitive with identity fallback") {
    val df = Seq("  CD45 ", "dapi", "Unknown1").toDF("name")
    val aliases = Seq(("cd45", "PTPRC"), ("dapi", "DAPI"))
      .toDF("alias_lower", "canonical")
    val got = Relational.aliasNormalize(df, "name", aliases, "canon")
      .select("canon").as[String].collect().toSet
    assert(got == Set("PTPRC", "DAPI", "Unknown1"))
  }

  test("J-3 aliasNormalize is idempotent on canonical names") {
    val aliases = Seq(("cd45", "CD45")).toDF("alias_lower", "canonical")
    val once = Relational.aliasNormalize(Seq("CD45").toDF("name"), "name",
      aliases, "name")
    val twice = Relational.aliasNormalize(once, "name", aliases, "name")
    assert(twice.as[String].collect().toSeq == Seq("CD45"))
  }

  test("O-23 reindexFill never drops universe rows") {
    val universe = Seq("a", "b", "c").toDF("k")
    val ann = Seq(("a", 1)).toDF("k", "v")
    val got = Relational.reindexFill(universe, ann, Seq("k"))
    assert(got.count() == 3)
    assert(got.filter($"v".isNull).count() == 2)
  }

  test("topK with unique tiebreak is deterministic") {
    val df = Seq((1, 5.0), (2, 5.0), (3, 1.0)).toDF("id", "v")
    val got = Relational.topK(df, 2, Seq($"v".desc, $"id"))
      .select("id").as[Int].collect().toSeq
    assert(got == Seq(1, 2))
  }
}
