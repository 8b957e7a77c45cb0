package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  *  - **prefix-filtered q-gram blocking** for strings of length ≥
  *    q·(k+1): one edit destroys at most q of a string's positional
  *    q-grams, hence at most q of its DISTINCT gram values, so two
  *    strings within edit distance k share ≥ max(1, |D(a)|−k·q,
  *    |D(b)|−k·q) distinct grams (the ≥1 floor comes from the positional
  *    count bound: len ≥ q·(k+1) ⇒ positional grams ≥ k·q+1 > k·q
  *    destroyed). By the standard prefix-filtering lemma (ED-Join, Xiao
  *    et al. 2008, VLDB), under ANY global total order on grams a
  *    qualifying pair must then share a gram within each string's first
  *    |D|−t+1 ≤ k·q+1 grams — so the equi join runs on each string's
  *    k·q+1 RAREST grams (global document-frequency order, rarest
  *    first) with perfect recall. A stop-gram ("th", "an") enters a
  *    string's prefix only when the string has no k·q+1 rarer grams,
  *    so hot-gram buckets cannot go quadratic at corpus scale. The
  *    gram-frequency table is bounded by |Σ|^q distinct grams
  *    (metadata-sized at q=2) and broadcasts.
  *  - **length-window join** for the residue (strings shorter than
  *    q·(k+1), where the gram bound is vacuous): edit distance ≥ length
  *    difference, so a short anchor s can only match strings of length
  *    ∈ [|s|, |s|+k] — an equi join on an exploded k+1-wide length key.
  *    Recall is exact because for any qualifying pair the shorter member
  *    is itself short and anchors it. At corpus scale short keys are a
  *    bounded set; the bare-length key can be salted if skewed.
  *
  * Candidates from both paths are deduplicated and only then hit the
  * exact `levenshtein` recheck — the DP kernel runs ONCE per candidate
  * pair (computed into a column, filtered, projected), and
  * `LevenshteinPrune` additionally guards the recheck with the free
  * length-difference bound.
  */
object FuzzyJoin {

  /** Distinct q-grams of every length-≥-q·(k+1) string, cut to each
    * string's k·q+1 globally-rarest grams (document-frequency asc, gram
    * asc — any total order preserves recall; rarest-first minimizes
    * bucket sizes). Exposed for the skew spec: a planted hot gram must
    * not appear in the prefix of strings that have enough rarer grams.
    */
  private[graft] def prefixGrams(n: DataFrame, k: Int,
                                 q: Int): DataFrame = {
    val lmin = q * (k + 1)
    val grams = n.filter(col("len") >= lmin)
      .select(col("name"), col("len"),
        explode(array_distinct(expr(
          s"transform(sequence(1, len - ${q - 1}), i -> substring(name, i, $q))")))
          .as("gram"))
    // document frequency over the long-string set; ≤ |Σ|^q rows → the
    // gram→df join broadcasts
    val freq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("name"))
      .orderBy(col("df"), col("gram"))
    grams.join(broadcast(freq), Seq("gram"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k * q + 1)
      .select(col("name"), col("len"), col("gram"))
  }

  /** All unordered pairs (name_a < name_b) of distinct values of `c`
    * within Levenshtein distance `k`, with the distance. Equi-join-only
    * plan (assert: no BroadcastNestedLoopJoin). */
  def selfJoin(names: DataFrame, c: String, k: Int, q: Int = 2): DataFrame = {
    val lmin = q * (k + 1)
    val n = names.select(col(c).cast("string").as("name"))
      .filter(col("name").isNotNull).distinct()
      .withColumn("len", length(col("name")))

    // blocked path: equi join on the prefix grams, length-difference
    // guard before dedup
    val pg = prefixGrams(n, k, q)
    val longPairs = pg.select(col("name").as("name_a"),
        col("len").as("len_a"), col("gram"))
      .join(pg.select(col("name").as("name_b"),
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
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= k)
      .select(col("name_a"), col("name_b"), col("dist"))
  }
}
