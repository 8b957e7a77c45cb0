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

  test("planted hot gram stays out of prefixes when rarer grams exist") {
    // 30 long strings all share the hot gram "zz"; each also carries a
    // unique rare tail. With k=1/q=2 the prefix is the k·q+1 = 3 rarest
    // grams per string — the df=30 "zz" must lose to the df=1 tail
    // grams, so the hot bucket generates NO candidates from these
    // strings and the stop-gram blowup (30² pairs through one bucket)
    // cannot happen.
    val tails = ('a' to 'z').take(26).combinations(3).take(30)
      .map(_.mkString).toSeq
    val names = tails.map(t => s"zz$t$t") // len 8 ≥ q(k+1)=4 → gram path
    val n = names.toDF("n")
      .select(col("n").as("name")).withColumn("len", length(col("name")))
    val pg = FuzzyJoin.prefixGrams(n, k = 1, q = 2)
    assert(pg.filter(col("gram") === "zz").count() == 0,
      "hot gram must not enter any prefix when 3 rarer grams exist")
    // per-string prefix is exactly k·q+1 = 3 grams
    val sizes = pg.groupBy(col("name")).count()
      .select(col("count")).as[Long].collect()
    assert(sizes.forall(_ == 3))
    // and the join over these prefixes is still recall-exact
    val out = FuzzyJoin.selfJoin(names.toDF("n"), "n", k = 1)
      .as[(String, String, Long)].collect().toSet
    assert(out == naive(names, 1))
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
