package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("J-2 strictLookup: unique keys resolve, ambiguous keys raise") {
    val left = Seq(("d1"), ("d2"), ("d3")).toDF("uuid")
    val ok = Seq(("d1", "p1"), ("d2", "p2")).toDF("uuid", "parent")
    val got = Relational.strictLookup(left, ok, "uuid", "parent")
      .orderBy("uuid").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(got == Seq("d1" -> Some("p1"), "d2" -> Some("p2"),
      "d3" -> None))
    val dup = Seq(("d1", "p1"), ("d1", "pX")).toDF("uuid", "parent")
    val ex = intercept[Exception] {
      Relational.strictLookup(left, dup, "uuid", "parent").collect()
    }
    assert(ex.getMessage.contains("multiple"))
  }

  test("F-8 strictCast: null passes, garbage raises with the value") {
    val df = Seq(("61"), (null.asInstanceOf[String])).toDF("age")
    val ok = df.select(Relational.strictCast($"age", "double").as("a"))
      .orderBy($"a".asc_nulls_last).collect()
    assert(ok(0).getDouble(0) == 61.0 && ok(1).isNullAt(0))
    val ex = intercept[Exception] {
      Seq(("sixty-one")).toDF("age")
        .select(Relational.strictCast($"age", "double")).collect()
    }
    assert(ex.getMessage.contains("sixty-one"))
  }

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
