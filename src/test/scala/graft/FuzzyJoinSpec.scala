package graft

import graft.ops.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The blocked fuzzy join must reproduce the naive theta join's result
  * EXACTLY (recall proofs: q-gram count bound for long strings, the
  * length-difference bound for the short residue) while planning only
  * equi joins. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(names: Seq[String], k: Int): Set[(String, String, Long)] =
    (for {
      a <- names; b <- names if a < b
      d = levenshteinDist(a, b) if d <= k
    } yield (a, b, d.toLong)).toSet

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("selfJoin == naive theta join on a mixed-length corpus (k=2)") {
    // short strings (< q(k+1) = 6) land on the length-window path,
    // long ones on the gram path; pairs straddling both must not drop
    val names = Seq(
      "cat", "cot", "coat", "goat", "gloat", "float", "flat",
      "anodized tin", "anodised tin", "anodized ton", "polished tin",
      "ab", "ba", "abc", "", "x",
      "standard brushed steel", "standard brushed steal")
    val out = FuzzyJoin.selfJoin(names.toDF("n"), "n", k = 2)
      .as[(String, String, Long)].collect().toSet
    assert(out == naive(names, 2))
  }

  test("selfJoin == naive on nation-like keys at k=5 (short residue heavy)") {
    val names = Seq("PERU", "IRAN", "IRAQ", "CUBA", "CHINA", "INDIA",
      "INDONESIA", "ARGENTINA", "UNITED STATES", "UNITED KINGDOM",
      "MOZAMBIQUE", "JAPAN", "KENYA", "CANADA", "ROMANIA", "GERMANY")
    val out = FuzzyJoin.selfJoin(names.toDF("n"), "n", k = 5)
      .as[(String, String, Long)].collect().toSet
    assert(out == naive(names, 5))
  }

  test("selfJoin plans no BroadcastNestedLoopJoin") {
    val df = FuzzyJoin.selfJoin(
      Seq("alpha", "alphb", "beta", "betta", "gamma delta epsilon")
        .toDF("n"), "n", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("property: random corpora never miss a pair (recall exactness)") {
    val rnd = new scala.util.Random(8)
    val alphabet = "abcde"
    for (trial <- 1 to 5) {
      val names = Seq.fill(40)(
        (0 until (1 + rnd.nextInt(14)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .distinct
      val k = 1 + rnd.nextInt(3)
      val out = FuzzyJoin.selfJoin(names.toDF("n"), "n", k)
        .as[(String, String, Long)].collect().toSet
      assert(out == naive(names, k), s"trial=$trial k=$k")
    }
  }
}
