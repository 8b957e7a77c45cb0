package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Round-18 second wave: the true BPE tokenizer is pinned to a LITERAL
  * min-rank iterative reference (the textbook inference algorithm), not
  * to its own rank-order-pass construction — a 400-word seeded property
  * harness plus hand chosen rank-sensitivity cases, and the table
  * invariant that makes the two algorithms provably equal is itself
  * enforced and tested.
  */
class Round18bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Literal min-rank iterative BPE (Sennrich 2016 inference): find the
    * present pair with the lowest rank, merge ALL its occurrences greedy
    * left-to-right, repeat until no pair is in the table. Independent of
    * the engine's rank-order-pass construction. */
  private def refEncode(word: String): Vector[String] = {
    val rank = Bpe.merges.zipWithIndex.toMap
    var toks = word.map(_.toString).toVector
    var done = false
    while (!done && toks.length > 1) {
      val best = toks.zip(toks.tail).flatMap(p => rank.get(p).map(_ -> p))
        .sortBy(_._1).headOption
      best match {
        case None => done = true
        case Some((_, (x, y))) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
              out += (x + y); i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
      }
    }
    toks
  }

  test("Bpe.encodeWord ≡ literal min-rank reference on 400 seeded " +
    "random words (biased alphabet hitting every chain) plus " +
    "rank-sensitivity and overlap edge cases") {
    // biased toward table letters so multi-level chains actually fire
    val alpha = "theandingoresticompwhu" + "abcdefghijklmnopqrstuvwxyz"
    val rnd = new Random(181818L)
    val rand = Vector.fill(400)(
      (0 until rnd.nextInt(19)).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString)
    val edge = Vector(
      "there",    // th→the→(the,re) needs re formed by the later rule 9
      "thethe", "rere", "aaa", "ababab", "estest",
      "compound", "outstanding", "anding", "thisisatest",
      "a", "zz", "qqq", "")
    val words = (rand ++ edge).filter(_.nonEmpty).distinct
    val got = words.toDF("w")
      .select($"w", Bpe.encodeWord($"w").as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector)
      .toMap
    words.foreach { w =>
      assert(got(w) == refEncode(w), s"word '$w'")
      assert(got(w).mkString == w, s"tokens must respell '$w'")
    }
    // a case where application ORDER matters: (t,h) before (i,n) etc.
    assert(got("there") == Vector("there"))
    assert(got("aaa") == Vector("a", "a", "a")) // no (a,a) rule
  }

  test("Bpe.tokenCount: whitespace pre-tokenization, [a-z]+ words " +
    "BPE-encoded, fallback words count 1; NULL → NULL, blank → 0; " +
    "plan is a pure map (no exchange)") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "There THE the123 the"),   // 2 fallbacks + 1 bpe word
      (3L, "  padded\tthere  "),
      (4L, ""),
      (5L, "   "),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = docs.select($"doc_id", Bpe.tokenCount($"text").as("n"))
      .orderBy($"doc_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    def cnt(ws: String*) = ws.map(w =>
      if (w.matches("^[a-z]+$")) refEncode(w).length.toLong else 1L).sum
    assert(got(1L) == cnt("the", "cat", "sat"))
    assert(got(2L) == cnt("There", "THE", "the123", "the"))
    assert(got(3L) == cnt("padded", "there"))
    assert(got(4L) == 0L)
    assert(got(5L) == 0L)
    assert(got(6L) == -1L)
    val plan = docs.select(Bpe.tokenCount($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("Bpe.validateTable rejects tables that would break rank-order " +
    "exactness; the pinned table passes") {
    Bpe.validateTable(Bpe.merges)
    // forward reference: compound constituent produced LATER
    intercept[IllegalArgumentException] {
      Bpe.validateTable(Seq(("ab", "c"), ("a", "b")))
    }
    // duplicate output via different decompositions: (a,bc) and (ab,c)
    intercept[IllegalArgumentException] {
      Bpe.validateTable(Seq(("b", "c"), ("a", "b"),
        ("a", "bc"), ("ab", "c")))
    }
    intercept[IllegalArgumentException] {
      Bpe.validateTable(Seq(("a", "b"), ("a", "b")))
    }
    intercept[IllegalArgumentException] {
      Bpe.validateTable(Seq(("A", "b")))
    }
  }
}
