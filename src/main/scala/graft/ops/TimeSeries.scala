package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators: per-key calendar spines, LOCF
  * forward fill, and linear interpolation — the gap-repair pass a metrics
  * or sensor pipeline runs before joining series with different sampling.
  * Everything is windows + one generate over a per-key date `sequence`; at
  * scale the whole pipeline is one shuffle on the key (the daily rollup)
  * plus one on (key, day) for the spine join, both AQE-coalesced.
  */
object TimeSeries {

  /** Daily gap fill with LOCF + linear interpolation.
    *
    * Rolls `df` up to one observation per (`keyCol`, day) — the LAST event
    * of the day by (`ts`, `tie`) — then explodes each key's
    * [min day, max day] spine and fills the gap days two ways:
    *
    *  - `locf_cents`: last observed value carried forward (NULL before the
    *    first observation);
    *  - `interp`: linear interpolation between the surrounding
    *    observations, `prev + (next - prev) · (day - prev_day)/(next_day -
    *    prev_day)`, clamped to the nearer endpoint when only one side
    *    exists; exactly the observation on observed days.
    *
    * Values travel as integer cents (`cents` must be a long column); the
    * interpolation is the only double arithmetic and its expression tree is
    * fixed, so results reproduce bit-for-bit across engines. `day` must be
    * a date expression; `ord` orders observations within a day (pass an
    * integer-microsecond column so cross-engine timestamp precision can't
    * reorder ties).
    */
  def gapFillInterpolate(df: DataFrame, keyCol: String, day: Column,
                         ord: Column, cents: Column,
                         tie: Column): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), day.as("day"))
      .agg(max_by(cents, struct(ord, tie)).as("obs_cents"))
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("day"))
    val wPrev = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(0, Window.unboundedFollowing)
    val obsDay = when(col("obs_cents").isNotNull, col("day"))
    spine.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("prev_cents",
        last(col("obs_cents"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_day", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("next_cents",
        first(col("obs_cents"), ignoreNulls = true).over(wNext))
      .withColumn("next_day", first(obsDay, ignoreNulls = true).over(wNext))
      .withColumn("locf_cents", col("prev_cents"))
      .withColumn("interp", round(
        when(col("obs_cents").isNotNull, col("obs_cents").cast("double"))
          .when(col("prev_cents").isNull, col("next_cents").cast("double"))
          .when(col("next_cents").isNull, col("prev_cents").cast("double"))
          .otherwise(col("prev_cents").cast("double") +
            (col("next_cents") - col("prev_cents")).cast("double") *
              (datediff(col("day"), col("prev_day")).cast("double") /
                datediff(col("next_day"), col("prev_day")).cast("double"))),
        4))
      .select(col(keyCol), col("day"), col("obs_cents"), col("locf_cents"),
        col("interp"))
  }
}
