package graft

import graft.dedup.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators: the cross-document span scrub action. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spanScrub removes cross-doc duplicated spans from ALL docs, " +
    "keeps within-doc repeats and unique spans") {
    // spanTokens=2: docs 1 and 2 share the chunk "x y"; doc 3 repeats
    // "r r" twice WITHIN itself only — cross-doc rule must not fire
    val docs = Seq(
      (1L, "x y a b"),   // chunks: "x y" (hot), "a b"
      (2L, "x y c d"),   // chunks: "x y" (hot), "c d"
      (3L, "r r r r")    // chunks: "r r", "r r" — same doc only
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs, "doc_id", "text",
        spanTokens = 2, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, "a b"),
      (2L, 2L, 1L, "c d"),
      (3L, 2L, 0L, "r r r r")))
  }

  test("spanScrub: fully-duplicated doc scrubs to empty, counts intact") {
    val docs = Seq(
      (1L, "p q"), (2L, "p q"), (3L, "p q z w")
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs, "doc_id", "text",
        spanTokens = 2, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, ""), (2L, 1L, 1L, ""), (3L, 2L, 1L, "z w")))
  }

  test("spanScrub: short docs (< spanTokens) form one chunk") {
    val docs = Seq((1L, "solo"), (2L, "solo"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs, "doc_id", "text",
        spanTokens = 8, minDocs = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, ""), (2L, 1L, 1L, ""), (3L, 1L, 0L, "other")))
  }
}
