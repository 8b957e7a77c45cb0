package graft

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenCount: blanks are 0, whitespace runs collapse") {
    val df = Seq("a b  c", "", "   ", "one").toDF("t")
    val got = df.select(TextOps.tokenCount($"t")).as[Long].collect().toSeq
    assert(got == Seq(3L, 0L, 0L, 1L))
  }

  test("langId picks marker-heavy language, und on no hits") {
    val df = Seq(
      "the cat and the dog of it is in that house",
      "el perro y la casa de los vecinos en madrid",
      "zz qq xx").toDF("t")
    val got = df.select(TextOps.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("langId agrees with generator labels on en documents (sf0.001)") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val en = docs.filter($"lang" === "en")
    val agree = en.filter(TextOps.langId($"text") === "en").count()
    // the corpus is synthetic token soup whose lang labels are only weakly
    // realized in the text ('the' presence); ~3/4 is the corpus ceiling
    assert(agree.toDouble / en.count() > 0.7)
  }

  test("jaccard: identical = 1, disjoint = 0") {
    val df = Seq(("a b c", "a b c"), ("a b", "x y")).toDF("s", "t")
    val got = df.select(TextOps.jaccard(
      array_distinct(split($"s", " ")),
      array_distinct(split($"t", " ")))).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("wordShingles produce n-grams; short docs get one shingle") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(TextOps.wordShingles($"t", 3)).as[Seq[String]]
      .collect()
    assert(got(0).toSet == Set("a b c", "b c d"))
    assert(got(1).toSet == Set("a b"))
  }

  test("exact dedup groups identical texts, keeps min id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
      .orderBy("keep_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds a high-jaccard near-dup pair") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"tok$i").mkString(" ") + " x y z"
    val noise = (1 to 40)
      .map(i => (100L + i, (1 to 60).map(j => s"n${i}_$j").mkString(" ")))
    val df = (Seq((1L, base), (2L, nearDup)) ++ noise)
      .toDF("doc_id", "text")
    val dups = Dedup.minhashDuplicates(df, "doc_id", "text",
      threshold = 0.5, shingleN = 3, bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.contains((1L, 2L)))
    assert(dups.length < 5) // no random-pair explosion
  }

  test("simhash: near-identical docs differ in few bits, random docs many") {
    val a = (1 to 50).map(i => s"w$i").mkString(" ")
    val b = (1 to 48).map(i => s"w$i").mkString(" ") + " q1 q2"
    val c = (1 to 50).map(i => s"z$i").mkString(" ")
    val sigs = Dedup.simhashSignatures(
      Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t"), "id", "t")
      .orderBy("id").as[(Long, Long)].collect().map(_._2)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sigs(0), sigs(1)) < ham(sigs(0), sigs(2)))
    assert(ham(sigs(0), sigs(1)) <= 10)
  }

  test("embedding near-dup finds duplicated vector, honors threshold") {
    val vec = Array.tabulate(16)(i => (i + 1).toFloat)
    val near = vec.clone(); near(0) = near(0) + 0.01f
    val far = Array.tabulate(16)(i => ((i % 3) - 1).toFloat)
    val df = Seq((1L, vec.toSeq), (2L, near.toSeq), (3L, far.toSeq))
      .toDF("id", "vec")
    val got = Dedup.embeddingNearDup(df, "id", "vec", threshold = 0.99,
      nPlanes = 2).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }
}
