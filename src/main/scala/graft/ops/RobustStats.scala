package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics in EXACT rank-based integer arithmetic —
  * no interpolated quantiles, no float medians. The two-middle-sum
  * trick keeps every statistic a BIGINT: for a sorted group of n
  * values, `lo = (n+1) div 2` and `hi = n div 2 + 1` index the two
  * middle positions (the SAME position for odd n), so the values at
  * those ranks sum to exactly twice the median.
  *
  * Scale shape — COUNT-COLLAPSED order statistics, never a full
  * per-group sort: the input first reduces to (group, value, count)
  * via a partial-agg groupBy (map-side combine shrinks a billion-row
  * group to its distinct values before the exchange), cumulative
  * counts over the DISTINCT-VALUE frame locate any rank
  * (`the k-th order statistic = min value whose cumulative count ≥ k`
  * — cum is monotone in value), and every output aggregate is a
  * weighted sum over that reduced frame. A window partitioned by a
  * low-cardinality group column therefore sorts distinct VALUES, not
  * rows — the single-task giant-group sort a naive rank window would
  * pay (the o_skyline_pareto lesson applied to order statistics).
  * Group keys and values must be NON-NULL.
  *
  * The reduction's effectiveness is the value domain's boundedness:
  * integral units (cents, counts, lengths) quantize naturally, so a
  * billion-row group collapses to at most |domain| rows. An
  * (adversarial) all-distinct value column degenerates cumCounts to
  * ~one row per input row — the naive shape with an extra groupBy. If
  * such a column ever needs robust statistics at scale, quantize it
  * first (the clamp/median of a pre-rounded column is the clamp/median
  * of the column at the rounding resolution — same trade the rest of
  * the engine makes for cross-engine exactness anyway).
  */
object RobustStats {

  /** (group, v, c, cum, n) — distinct values with counts, cumulative
    * counts (ordered by value), and group totals. `obsName` must be
    * UNIQUE per registered query: the bench merges observed metrics
    * per NAME with field-wise max across the whole run, so two
    * queries sharing one name would mix their distinct/total counters
    * and could mask exactly the degradation the observe exists to
    * reveal (the Dedup lsh_cap_$label convention). */
  private def cumCounts(df: DataFrame, groupCol: String,
                        valueCol: String, obsName: String): DataFrame = {
    val vt = df.schema(valueCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(vt.typeName),
      s"$valueCol is ${vt.typeName} — RobustStats is exact INTEGER " +
        "order statistics; a fractional column would be silently " +
        "truncated. Round/scale to an integral unit (e.g. cents) " +
        "first.")
    val byG = Window.partitionBy(col(groupCol))
    val byV = byG.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__c"))
      // the degenerate domain made OBSERVABLE (r15 verdict): when the
      // value column is near-all-distinct, the count-collapse buys
      // nothing and the exchange carries ~one row per input row — the
      // naive shape with an extra groupBy. distinct_rows ≈ total_rows
      // in the bench's observed section is that degradation, visible
      // in committed evidence instead of only in this comment;
      // the fix stays the documented one (quantize the column first).
      .observe(obsName,
        count(lit(1)).as("distinct_rows"),
        sum(col("__c")).cast("long").as("total_rows"))
      .withColumn("__cum", sum(col("__c")).over(byV))
      .withColumn("__n", sum(col("__c")).over(byG))
      // DELIBERATELY not checkpointed although 2-3 consumers re-derive
      // it: the groupBy exchange is reused across consumers
      // (ReusedExchange) and only the cheap post-shuffle windows
      // recompute, while a localCheckpoint materializes an extra job
      // per call — measured 0.69 s -> 2.03 s on w_mad_outliers at
      // sf0.1 with checkpoints here and on the deviation frame (the
      // bm25TopK/overlapScrub precedent: checkpoint exactly the
      // multi-traversed EXPENSIVE subtree, and these are not)
  }

  /** Median/MAD outlier summary per group: med2 = 2·median,
    * mad4 = 4·MAD (median absolute deviation), and the classic robust
    * rule |v − median| > 3·MAD counted as the BIGINT comparison
    * `2·dev2 > 3·mad4` where dev2 = |2v − med2| = 2·|v − median|.
    * Output: (group, n, med2, mad4, n_outliers) ordered by group.
    * MAD = 0 (at least half the group identical) flags EVERY value off
    * the median — the documented degenerate case of the MAD rule. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  obsName: String = "robust_stats_collapse"): DataFrame = {
    val cc = cumCounts(df, groupCol, valueCol, obsName)
    val med = cc.groupBy(col(groupCol))
      .agg((min(when(col("__cum") >= expr("(__n + 1) div 2"),
        col("__v"))) +
        min(when(col("__cum") >= expr("__n div 2 + 1"), col("__v"))))
        .as("med2"))
    // deviations on the REDUCED frame: distinct dev2 values weighted
    // by the original counts, then the same rank extraction for MAD
    val dev = cc.join(med, groupCol)
      .select(col(groupCol), abs(col("__v") * 2L - col("med2"))
        .as("__d"), col("__c"))
      .groupBy(col(groupCol), col("__d"))
      .agg(sum(col("__c")).as("__c"))
    val byG = Window.partitionBy(col(groupCol))
    val byD = byG.orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val devCum = dev
      .withColumn("__cum", sum(col("__c")).over(byD))
      .withColumn("__n", sum(col("__c")).over(byG))
    val mad = devCum.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"),
        (min(when(col("__cum") >= expr("(__n + 1) div 2"),
          col("__d"))) +
          min(when(col("__cum") >= expr("__n div 2 + 1"), col("__d"))))
          .as("mad4"))
    devCum.join(mad, groupCol)
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        max(col("mad4")).as("mad4"),
        sum(when(col("__d") * 2L > col("mad4") * 3L, col("__c"))
          .otherwise(0L)).as("n_outliers"))
      .join(med, groupCol)
      .select(col(groupCol), col("n"), col("med2"), col("mad4"),
        col("n_outliers"))
      .orderBy(col(groupCol))
  }

  /** Nearest-rank quantile thresholds per group: for each numerator in
    * `nums` (shared denominator `den`), the value at rank
    * ceil(n·num/den) — the k-th order statistic located on the
    * count-collapsed frame, never interpolated, so every threshold is
    * a real value picked identically on every engine. Output:
    * (group, n, q0..q{m-1}) ordered by group, one column per
    * requested quantile. */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
                nums: Seq[Long], den: Long,
                obsName: String = "robust_stats_collapse"): DataFrame = {
    require(den > 0 && nums.nonEmpty &&
      nums.forall(n => n >= 0 && n <= den),
      s"need 0 <= num <= den for every num, got $nums / $den")
    val cc = cumCounts(df, groupCol, valueCol, obsName)
    val qCols = nums.zipWithIndex.map { case (num, i) =>
      min(when(col("__cum") >=
        expr(s"($num * __n + ${den - 1}) div $den"), col("__v")))
        .as(s"q$i")
    }
    cc.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), qCols: _*)
      .orderBy(col(groupCol))
  }

  /** Nearest-rank percentile winsorization per group: values below the
    * (loNum/den)-percentile / above the (hiNum/den)-percentile are
    * clamped to those percentiles (p_lo at rank ceil(n·loNum/den),
    * p_hi at rank ceil(n·hiNum/den) — real values picked identically
    * on every engine, never interpolated). Output per group:
    * (group, n, p_lo, p_hi, raw_sum, clamped_sum, n_lo, n_hi). */
  def winsorize(df: DataFrame, groupCol: String,
                valueCol: String, loNum: Long, hiNum: Long, den: Long,
                obsName: String = "robust_stats_collapse"): DataFrame = {
    require(den > 0 && loNum >= 0 && hiNum <= den && loNum <= hiNum,
      s"need 0 <= loNum <= hiNum <= den, got $loNum/$hiNum/$den")
    val cc = cumCounts(df, groupCol, valueCol, obsName)
    val pct = cc.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"),
        min(when(col("__cum") >=
          expr(s"($loNum * __n + ${den - 1}) div $den"), col("__v")))
          .as("p_lo"),
        min(when(col("__cum") >=
          expr(s"($hiNum * __n + ${den - 1}) div $den"), col("__v")))
          .as("p_hi"))
    cc.join(pct, groupCol)
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        max(col("p_lo")).as("p_lo"), max(col("p_hi")).as("p_hi"),
        sum(col("__v") * col("__c")).as("raw_sum"),
        sum(least(greatest(col("__v"), col("p_lo")), col("p_hi")) *
          col("__c")).as("clamped_sum"),
        sum(when(col("__v") < col("p_lo"), col("__c")).otherwise(0L))
          .as("n_lo"),
        sum(when(col("__v") > col("p_hi"), col("__c")).otherwise(0L))
          .as("n_hi"))
      .orderBy(col(groupCol))
  }
}
