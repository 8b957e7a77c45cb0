package graft

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for the library-surface text/dedup operators not already
  * exercised through the query registry (fingerprint, char shingles,
  * BPE-ish tokens, quality features, simhash candidates).
  */
class TextOpsApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val df = Seq("Hello   World", "hello world", "hello worlds").toDF("t")
    val fps = df.select(TextOps.fingerprint($"t")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("charShingles: n-grams of normalized text, distinct") {
    val got = Seq("ABCA BC").toDF("t")
      .select(TextOps.charShingles($"t", 3)).as[Seq[String]]
      .collect().head
    assert(got.toSet == Set("abc", "bca", "ca ", "a b", " bc"))
  }

  test("tokenCountBpeIsh: words + punctuation runs; >= whitespace count") {
    val df = Seq(("no punct here", 3L), ("with, punct! here.", 6L))
      .toDF("t", "expected")
    val got = df.select(TextOps.tokenCountBpeIsh($"t"), $"expected")
      .as[(Long, Long)].collect()
    got.foreach { case (g, e) => assert(g == e) }
  }

  test("qualityFeatures: documented feature columns with sane ranges") {
    val out = TextOps.qualityFeatures(
      Seq((1L, "The quick brown fox, it jumps!")).toDF("id", "text"),
      "text")
    val r = out.collect().head
    assert(out.columns.toSet.intersect(Set("n_chars_m", "n_tokens",
      "mean_word_len", "punct_ratio", "alpha_ratio", "stop_distinct"))
      .size == 6)
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("stop_distinct") == 2L) // the, it
    val punct = r.getAs[Double]("punct_ratio")
    val alpha = r.getAs[Double]("alpha_ratio")
    assert(punct > 0 && punct < 0.2)
    assert(alpha > 0.7 && alpha < 1.0)
  }

  test("simhashCandidates pairs near-identical docs, not disjoint ones") {
    val a = (1 to 60).map(i => s"w$i").mkString(" ")
    val b = (1 to 58).map(i => s"w$i").mkString(" ") + " x y"
    val c = (1 to 60).map(i => s"q$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t")
    val pairs = Dedup.simhashCandidates(df, "id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}
