package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact fuzzy self-join behind n-gram blocking — the scale path promised
  * by j9's scaladoc (edit-distance alias matching, the generalization of
  * the reference's J-3 normalization at `bin/concatenate.py:74-81`).
  *
  * A naive `levenshtein(a, b) <= k` theta join plans as a broadcast
  * nested loop: O(n²) DP kernels — fine for a 25-row dimension, fatal for
  * a 100 TB key column. This operator produces the IDENTICAL result with
  * equi joins only (no nested loop anywhere), using two recall-exact
  * candidate generators:
  *
  *  - **q-gram blocking** for strings of length ≥ q·(k+1): one edit
  *    destroys at most q of a string's q-grams, so two strings within
  *    edit distance k share ≥ min(|a|,|b|) − (q−1) − k·q ≥ 1 common
  *    grams — an equi join on the exploded distinct grams has perfect
  *    recall. Quadratic work is confined inside gram buckets.
  *  - **length-window join** for the residue (strings shorter than
  *    q·(k+1), where the gram bound is vacuous): edit distance ≥ length
  *    difference, so a short anchor s can only match strings of length
  *    ∈ [|s|, |s|+k] — an equi join on an exploded k+1-wide length key.
  *    Recall is exact because for any qualifying pair the shorter member
  *    is itself short and anchors it. At corpus scale short keys are a
  *    bounded set; the bare-length key can be salted if skewed.
  *
  * Candidates from both paths are deduplicated and only then hit the
  * exact `levenshtein` recheck — the DP kernel runs on candidate pairs
  * only. `LevenshteinPrune` additionally guards the recheck with the
  * free length-difference bound.
  */
object FuzzyJoin {

  /** All unordered pairs (name_a < name_b) of distinct values of `c`
    * within Levenshtein distance `k`, with the distance. Equi-join-only
    * plan (assert: no BroadcastNestedLoopJoin). */
  def selfJoin(names: DataFrame, c: String, k: Int, q: Int = 2): DataFrame = {
    val lmin = q * (k + 1)
    val n = names.select(col(c).cast("string").as("name"))
      .filter(col("name").isNotNull).distinct()
      .withColumn("len", length(col("name")))

    // blocked path: distinct q-grams of every long string, equi join on
    // the gram, length-difference guard before dedup
    val grams = n.filter(col("len") >= lmin)
      .select(col("name"), col("len"),
        explode(array_distinct(expr(
          s"transform(sequence(1, len - ${q - 1}), i -> substring(name, i, $q))")))
          .as("gram"))
    val longPairs = grams.select(col("name").as("name_a"),
        col("len").as("len_a"), col("gram"))
      .join(grams.select(col("name").as("name_b"),
        col("len").as("len_b"), col("gram")), Seq("gram"))
      .filter(col("name_a") < col("name_b") &&
        abs(col("len_a") - col("len_b")) <= k)
      .select(col("name_a"), col("name_b"))

    // residue path: short anchors × exact-length window
    val shortPairs = n.filter(col("len") < lmin)
      .select(col("name").as("s_name"),
        explode(sequence(col("len"), col("len") + k)).as("t_len"))
      .join(n.select(col("name").as("t_name"), col("len").as("t_len")),
        Seq("t_len"))
      .filter(col("s_name") =!= col("t_name"))
      .select(least(col("s_name"), col("t_name")).as("name_a"),
        greatest(col("s_name"), col("t_name")).as("name_b"))

    longPairs.union(shortPairs).distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= k)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
  }
}
