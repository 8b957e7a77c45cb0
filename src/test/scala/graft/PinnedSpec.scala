package graft

import graft.functions.{text => gtext}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r19 duplicated-evaluation fixes (guide §4.4): `pinned` must be
  * a value-identity that BLOCKS filter alias-substitution below the
  * projection that defines an expensive column, and the power-of-two
  * `featureHash` bitmask must be bit-equal to the `%` form it
  * replaced (every classifier/embed oracle still replays `%`).
  */
class PinnedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pinned is a value identity (incl. NULL passthrough)") {
    val df = Seq(("a", 1L), (null, 2L), ("ccc", 3L)).toDF("s", "id")
    val got = df.select($"id",
        gtext.pinned(length($"s")).as("p"), length($"s").as("l"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
    got.foreach { case (_, n1, n2, v1, v2) =>
      assert(n1 == n2 && v1 == v2)
    }
  }

  test("pinned projected field blocks filter substitution below the " +
      "projection (single evaluation of the defining chain)") {
    // parquet-backed: a LocalRelation would be folded whole by
    // ConvertToLocalRelation and show zero split sites either way
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pinned-").toFile
    dir.deleteOnExit()
    Seq((1L, "a b c"), (2L, "x")).toDF("id", "text")
      .write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
    def nSplits(plan: org.apache.spark.sql.DataFrame): Int =
      plan.queryExecution.optimizedPlan.toString
        .sliding("split(".length).count(_ == "split(")
    val unpinned = df
      .select($"id", split($"text", " ").as("tk"))
      .filter(size($"tk") >= 2)
    val pinned = df
      .select($"id", gtext.pinned(split($"text", " ")).as("tk"))
      .filter(size($"tk") >= 2)
    // unpinned: the filter is alias-substituted below the project →
    // two split sites in the optimized plan; pinned: one
    assert(nSplits(unpinned) == 2)
    assert(nSplits(pinned) == 1)
    // and the results are identical
    assert(pinned.select($"id").collect().map(_.getLong(0)).sorted
      .sameElements(
        unpinned.select($"id").collect().map(_.getLong(0)).sorted))
  }

  test("featureHash power-of-two bitmask == the % form, and is " +
      "non-nullable over non-null input") {
    val rng = new scala.util.Random(7)
    val corpus = (0 until 300).map(i =>
      (i.toLong, rng.alphanumeric.take(rng.nextInt(20)).mkString))
      .toDF("id", "s")
    Seq(2, 64, 1024, 4096).foreach { dim =>
      val bad = corpus.select(
          graft.ops.TextClassifier.featureHash($"s", dim).as("a"),
          (gtext.md5_prefix64($"s", 15) % dim.toLong).as("b"))
        .filter($"a" =!= $"b")
        .count()
      assert(bad == 0L, s"bitmask != % at dim=$dim")
    }
    // non-power-of-two dims keep the % form (value check only)
    val odd = corpus.select(
        graft.ops.TextClassifier.featureHash($"s", 2001).as("a"),
        (gtext.md5_prefix64($"s", 15) % 2001L).as("b"))
      .filter($"a" =!= $"b").count()
    assert(odd == 0L)
  }
}
