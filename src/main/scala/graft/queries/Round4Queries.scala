package graft.queries

import graft.Tables
import graft.functions.ZOrder
import graft.ops.{Relational, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-4 additions: change-history (SCD2), runtime Bloom-filter join
  * pruning, cohort retention, funnel analysis, time-series gap fill with
  * interpolation, and Z-order clustering for data-skipping layouts — the
  * warehouse/pipeline operations layered on the same star schema.
  * Every query is DuckDB-oracle-exact.
  */
object Round4Queries {

  def all: Seq[Q] = Seq(

    Q("o38_scd2_intervals",
      "SCD2 history build (`Relational.scd2`): each customer's order " +
        "stream becomes validity intervals [valid_from, valid_to) via one " +
        "per-key lead() window — the batch-rebuild form of an incremental " +
        "MERGE; (o_orderdate, o_orderkey) makes the per-key order total.",
      (s, d) => {
        import s.implicits._
        Relational.scd2(
            Tables.table(s, d, "orders").select($"o_custkey", $"o_orderkey",
              round($"o_totalprice" * 100).cast("long").as("price_cents"),
              $"o_orderdate"),
            Seq("o_custkey"), col("o_orderdate"), col("o_orderkey"))
          .select($"o_custkey", $"o_orderkey", $"price_cents",
            $"valid_from", $"valid_to", $"is_current")
          .orderBy($"o_custkey", $"valid_from", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
             |  o_orderdate AS valid_from,
             |  lead(o_orderdate) OVER w AS valid_to,
             |  lead(o_orderdate) OVER w IS NULL AS is_current
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |  ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin)),

    Q("agg_cohort_retention",
      "Cohort retention: customers bucketed by first-order month, counted " +
        "distinct per (cohort, months-since-cohort) — two key-partitioned " +
        "aggregations, all-integer month arithmetic (year·12+month), no " +
        "date-diff rounding ambiguity.",
      (s, d) => {
        import s.implicits._
        val ord = Tables.table(s, d, "orders").select($"o_custkey",
          (year($"o_orderdate") * 12 + month($"o_orderdate")).as("ym"))
        val coh = ord.groupBy($"o_custkey").agg(min($"ym").as("cym"))
        ord.join(coh, Seq("o_custkey"))
          .groupBy($"cym", ($"ym" - $"cym").as("month_offset"))
          .agg(countDistinct($"o_custkey").as("n_customers"))
          .select(
            expr("CAST(((cym - 1) div 12) * 100 + ((cym - 1) % 12) + 1" +
              " AS BIGINT)").as("cohort_ym"),
            $"month_offset".cast("long").as("month_offset"),
            $"n_customers")
          .orderBy($"cohort_ym", $"month_offset")
      },
      Some("""WITH ord AS (
             |  SELECT o_custkey,
             |    year(o_orderdate) * 12 + month(o_orderdate) AS ym
             |  FROM orders),
             |coh AS (
             |  SELECT o_custkey, min(ym) AS cym FROM ord GROUP BY o_custkey)
             |SELECT
             |  CAST(((cym - 1) // 12) * 100 + ((cym - 1) % 12) + 1
             |    AS BIGINT) AS cohort_ym,
             |  CAST(ym - cym AS BIGINT) AS month_offset,
             |  CAST(count(DISTINCT ord.o_custkey) AS BIGINT) AS n_customers
             |FROM ord JOIN coh USING (o_custkey)
             |GROUP BY cym, ym - cym
             |ORDER BY cohort_ym, month_offset""".stripMargin)),

    Q("w_funnel_stages",
      "Funnel analysis: per user the earliest click, the earliest view " +
        "AFTER that click, the earliest purchase AFTER that view — three " +
        "ordered stages as chained min-aggregations (each a key-partitioned " +
        "agg + broadcastable join back), timestamps compared in integer " +
        "microseconds on both engines.",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
        val t1 = ev.filter($"event_type" === "click")
          .groupBy($"user_id").agg(min($"ts_us").as("t1_us"))
        val t2 = ev.filter($"event_type" === "view").join(t1, Seq("user_id"))
          .filter($"ts_us" > $"t1_us")
          .groupBy($"user_id").agg(min($"ts_us").as("t2_us"))
        val t3 = ev.filter($"event_type" === "purchase")
          .join(t2, Seq("user_id"))
          .filter($"ts_us" > $"t2_us")
          .groupBy($"user_id").agg(min($"ts_us").as("t3_us"))
        ev.select($"user_id").distinct()
          .join(t1, Seq("user_id"), "left")
          .join(t2, Seq("user_id"), "left")
          .join(t3, Seq("user_id"), "left")
          .select($"user_id", $"t1_us", $"t2_us", $"t3_us",
            when($"t3_us".isNotNull, 3).when($"t2_us".isNotNull, 2)
              .when($"t1_us".isNotNull, 1).otherwise(0).cast("long")
              .as("stage"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type,
             |    epoch_ns(ts) // 1000 AS ts_us FROM events),
             |t1 AS (SELECT user_id, min(ts_us) AS t1_us FROM ev
             |       WHERE event_type = 'click' GROUP BY user_id),
             |t2 AS (SELECT e.user_id, min(e.ts_us) AS t2_us
             |       FROM ev e JOIN t1 USING (user_id)
             |       WHERE e.event_type = 'view' AND e.ts_us > t1.t1_us
             |       GROUP BY e.user_id),
             |t3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us
             |       FROM ev e JOIN t2 USING (user_id)
             |       WHERE e.event_type = 'purchase' AND e.ts_us > t2.t2_us
             |       GROUP BY e.user_id),
             |u AS (SELECT DISTINCT user_id FROM ev)
             |SELECT u.user_id, t1.t1_us, t2.t2_us, t3.t3_us,
             |  CAST(CASE WHEN t3.t3_us IS NOT NULL THEN 3
             |    WHEN t2.t2_us IS NOT NULL THEN 2
             |    WHEN t1.t1_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             |    AS stage
             |FROM u LEFT JOIN t1 USING (user_id)
             |  LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
             |ORDER BY u.user_id""".stripMargin)),

    Q("w_gap_fill_interp",
      "Time-series gap fill (`TimeSeries.gapFillInterpolate`): per-user " +
        "daily spine (sequence+explode), LOCF forward fill, and linear " +
        "interpolation between surrounding observations — values as " +
        "integer cents, one fixed double expression for the interpolation " +
        "so both engines agree bit-for-bit.",
      (s, d) => {
        import s.implicits._
        TimeSeries.gapFillInterpolate(
            Tables.events(s, d)
              .select($"user_id", $"ts", $"event_id",
                round($"value" * 100).cast("long").as("cents"),
                unix_micros($"ts").as("ts_us")),
            "user_id", to_date(col("ts")), col("ts_us"), col("cents"),
            col("event_id"))
          .orderBy($"user_id", $"day")
      },
      Some("""WITH daily AS (
             |  SELECT user_id, day, obs_cents FROM (
             |    SELECT user_id, CAST(ts AS DATE) AS day,
             |      CAST(round(value * 100, 0) AS BIGINT) AS obs_cents,
             |      ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
             |        ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC)
             |        AS rn
             |    FROM events) t WHERE rn = 1),
             |spine AS (
             |  SELECT user_id,
             |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
             |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
             |        FROM daily GROUP BY user_id)),
             |filled AS (
             |  SELECT s.user_id, s.day, d.obs_cents,
             |    last_value(d.obs_cents IGNORE NULLS) OVER wp AS prev_cents,
             |    last_value(CASE WHEN d.obs_cents IS NOT NULL THEN s.day END
             |      IGNORE NULLS) OVER wp AS prev_day,
             |    first_value(d.obs_cents IGNORE NULLS) OVER wn
             |      AS next_cents,
             |    first_value(CASE WHEN d.obs_cents IS NOT NULL THEN s.day
             |      END IGNORE NULLS) OVER wn AS next_day
             |  FROM spine s LEFT JOIN daily d USING (user_id, day)
             |  WINDOW wp AS (PARTITION BY s.user_id ORDER BY s.day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wn AS (PARTITION BY s.user_id ORDER BY s.day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, day, obs_cents, prev_cents AS locf_cents,
             |  round(CASE
             |    WHEN obs_cents IS NOT NULL THEN CAST(obs_cents AS DOUBLE)
             |    WHEN prev_cents IS NULL THEN CAST(next_cents AS DOUBLE)
             |    WHEN next_cents IS NULL THEN CAST(prev_cents AS DOUBLE)
             |    ELSE CAST(prev_cents AS DOUBLE)
             |      + CAST(next_cents - prev_cents AS DOUBLE)
             |        * (CAST(day - prev_day AS DOUBLE)
             |           / CAST(next_day - prev_day AS DOUBLE))
             |    END, 4) AS interp
             |FROM filled ORDER BY user_id, day""".stripMargin)),

    Q("o39_zorder_cluster",
      "Z-order clustering (`ZOrder.interleave`): Morton-interleave the " +
        "(partkey, suppkey) grid coords and bucket by the code's high " +
        "bits — per-bucket min/max extents stay tight in BOTH dimensions, " +
        "the property file-level data skipping needs. Pure codegen'd " +
        "shift/mask chain, identical unrolled expression on the oracle.",
      (s, d) => {
        import s.implicits._
        val px = pmod($"l_partkey", lit(256L))
        val py = pmod($"l_suppkey", lit(256L))
        Tables.table(s, d, "lineitem")
          .select(ZOrder.interleave(px, py, 8).as("z"),
            px.as("px"), py.as("py"))
          .groupBy(shiftright($"z", 8).as("z_bucket"))
          .agg(count(lit(1)).as("n"),
            min($"px").as("min_px"), max($"px").as("max_px"),
            min($"py").as("min_py"), max($"py").as("max_py"))
          .orderBy($"z_bucket")
      },
      Some {
        val z = OracleGen.zorderExpr("(l_partkey % 256)",
          "(l_suppkey % 256)", 8)
        s"""WITH g AS (
           |  SELECT $z AS z, l_partkey % 256 AS px, l_suppkey % 256 AS py
           |  FROM lineitem)
           |SELECT z >> 8 AS z_bucket, count(*) AS n,
           |  min(px) AS min_px, max(px) AS max_px,
           |  min(py) AS min_py, max(py) AS max_py
           |FROM g GROUP BY z >> 8 ORDER BY z_bucket""".stripMargin
      }),

    Q("j10_bloom_join",
      "Runtime Bloom-filter join pruning (`Relational.bloomPrunedJoin`): " +
        "a 64 Kbit / 3-hash filter over the urgent orders' keys prunes " +
        "~80% of lineitem BEFORE the shuffle; the exact join then removes " +
        "false positives, so the result equals the plain join — the " +
        "explicit form of Spark's InjectRuntimeFilter.",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.table(s, d, "orders")
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey")
        Relational.bloomPrunedJoin(
            Tables.table(s, d, "lineitem")
              .select($"l_orderkey",
                round($"l_quantity").cast("long").as("qty")),
            urgent, "l_orderkey", "o_orderkey")
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n_items"), sum($"qty").as("sum_qty"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, count(*) AS n_items,
             |  CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
             |    AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin))
  )
}
