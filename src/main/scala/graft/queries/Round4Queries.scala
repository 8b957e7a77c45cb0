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

  import Scratch.withTempDir

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
          // Digest (r8): interval endpoints are pinned per-row by
          // key-weighted epoch sums — a lead() off by one row changes
          // sig_from/sig_to; n_current pins the open-interval tail.
          .groupBy(($"o_custkey" % 16).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"o_orderkey").cast("long").as("sum_key"),
            sum($"price_cents").cast("long").as("sum_cents"),
            sum($"is_current".cast("long")).cast("long").as("n_current"),
            // NTZ → LTZ cast is a pure reinterpretation under the UTC
            // session TZ, matching DuckDB's epoch of a naive timestamp
            sum((unix_millis($"valid_from".cast("timestamp")) /
              lit(1000L)).cast("long") *
              ($"o_orderkey" % 97)).cast("long").as("sig_from"),
            count($"valid_to").as("n_to"),
            sum((unix_millis($"valid_to".cast("timestamp")) /
              lit(1000L)).cast("long") *
              ($"o_orderkey" % 97)).cast("long").as("sig_to"))
          .orderBy($"bucket")
      },
      Some("""WITH scd AS (
             |  SELECT o_custkey, o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
             |    o_orderdate AS valid_from,
             |    lead(o_orderdate) OVER w AS valid_to,
             |    lead(o_orderdate) OVER w IS NULL AS is_current
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey))
             |SELECT CAST(o_custkey % 16 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
             |  CAST(sum(price_cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_current,
             |  CAST(sum((epoch_ms(valid_from) // 1000) * (o_orderkey % 97))
             |    AS BIGINT) AS sig_from,
             |  count(valid_to) AS n_to,
             |  CAST(sum((epoch_ms(valid_to) // 1000) * (o_orderkey % 97))
             |    AS BIGINT) AS sig_to
             |FROM scd GROUP BY bucket ORDER BY bucket""".stripMargin)),

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
          // Digest (r8): interp at each spine day is pinned by a
          // day-offset-weighted fixed-point sum — filling the wrong day
          // or interpolating the wrong slope flips sig_interp.
          .groupBy(($"user_id" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            count($"obs_cents").as("n_obs"),
            sum($"obs_cents").cast("long").as("sum_obs"),
            count($"locf_cents").as("n_locf"),
            sum($"locf_cents").cast("long").as("sum_locf"),
            sum(Digest.numSig($"interp", 10000L) *
              pmod(datediff($"day", lit("1970-01-01")), lit(1000L)))
              .cast("long").as("sig_interp"))
          .orderBy($"bucket")
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
             |, res AS (
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
             |FROM filled)
             |SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  count(obs_cents) AS n_obs,
             |  CAST(sum(obs_cents) AS BIGINT) AS sum_obs,
             |  count(locf_cents) AS n_locf,
             |  CAST(sum(locf_cents) AS BIGINT) AS sum_locf,
             |  CAST(sum(CAST(round(interp * 10000, 0) AS BIGINT) *
             |    ((day - DATE '1970-01-01') % 1000)) AS BIGINT)
             |    AS sig_interp
             |FROM res GROUP BY bucket ORDER BY bucket""".stripMargin)),

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
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    Q("j11_salted_join",
      "Skew-salted equi join (`Relational.saltedJoin`): the fact side's " +
        "key is salted into 8 sub-keys and the dim side replicated once " +
        "per salt, so a single hot key spreads over 8 reducers — the " +
        "manual fallback for single-key hot spots AQE's skew split can't " +
        "break up. Result equals the plain join by construction (the " +
        "oracle IS the plain join).",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.table(s, d, "orders")
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey".as("l_orderkey"), $"o_custkey")
        Relational.saltedJoin(
            Tables.table(s, d, "lineitem")
              .select($"l_orderkey",
                round($"l_quantity").cast("long").as("qty")),
            urgent, "l_orderkey", saltBuckets = 8)
          .groupBy(pmod($"o_custkey", lit(10L)).as("cust_bucket"))
          .agg(count(lit(1)).as("n_items"), sum($"qty").as("sum_qty"))
          .orderBy($"cust_bucket")
      },
      Some("""SELECT o_custkey % 10 AS cust_bucket,
             |  count(*) AS n_items,
             |  CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
             |    AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY o_custkey % 10 ORDER BY cust_bucket""".stripMargin)),

    Q("o40_delta_detect",
      "CDC snapshot diff (`Relational.deltaDetect`): two snapshots of " +
        "orders (old = pre-1999, new = post-1996 with a deterministic " +
        "price bump on keys ≡ 0 mod 7) full-outer joined on the key and " +
        "every row classified insert / delete / update / unchanged — the " +
        "change-data-capture derivation when no change feed exists.",
      (s, d) => {
        import s.implicits._
        val cents = round($"o_totalprice" * 100).cast("long")
        val old = Tables.table(s, d, "orders")
          .filter($"o_orderdate" < lit("1999-01-01 00:00:00"))
          .select($"o_orderkey", cents.as("cents"))
        val neu = Tables.table(s, d, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01 00:00:00"))
          .select($"o_orderkey",
            (cents + when($"o_orderkey" % 7 === 0, 100L).otherwise(0L))
              .as("cents"))
        Relational.deltaDetect(old, neu, Seq("o_orderkey"), Seq("cents"))
          // Digest (r8): grouping by change_type pins every row's
          // classification — a misclassified key moves its sum_key mass
          // between groups; the cents sums pin both snapshot values.
          .groupBy($"change_type")
          .agg(count(lit(1)).as("n"),
            sum($"o_orderkey").cast("long").as("sum_key"),
            count($"old_cents").as("n_old"),
            sum($"old_cents").cast("long").as("sum_old"),
            count($"new_cents").as("n_new"),
            sum($"new_cents").cast("long").as("sum_new"))
          .orderBy($"change_type")
      },
      Some("""WITH old AS (
             |  SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'),
             |new AS (
             |  SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |      + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END
             |      AS cents
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
             |delta AS (
             |  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
             |    old.cents AS old_cents, new.cents AS new_cents,
             |    CASE WHEN old.o_orderkey IS NULL THEN 'insert'
             |      WHEN new.o_orderkey IS NULL THEN 'delete'
             |      WHEN old.cents <> new.cents THEN 'update'
             |      ELSE 'unchanged' END AS change_type
             |  FROM old FULL OUTER JOIN new
             |    ON old.o_orderkey = new.o_orderkey)
             |SELECT change_type, count(*) AS n,
             |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
             |  count(old_cents) AS n_old,
             |  CAST(sum(old_cents) AS BIGINT) AS sum_old,
             |  count(new_cents) AS n_new,
             |  CAST(sum(new_cents) AS BIGINT) AS sum_new
             |FROM delta GROUP BY change_type ORDER BY change_type""".stripMargin)),

    Q("o41_merge_upsert",
      "Batch MERGE/upsert (`Relational.upsert`): an updates snapshot " +
        "(every 5th order, price bumped) replaces matching base rows and " +
        "appends the rest — anti-join + union, one shuffle on the key; " +
        "the batch-rebuild form of a storage-level Delta/Iceberg MERGE.",
      (s, d) => {
        import s.implicits._
        val cents = round($"o_totalprice" * 100).cast("long")
        val base = Tables.table(s, d, "orders")
          .filter($"o_orderdate" < lit("1999-01-01 00:00:00"))
          .select($"o_orderkey", cents.as("cents"))
        val updates = Tables.table(s, d, "orders")
          .filter($"o_orderkey" % 5 === 0)
          .select($"o_orderkey", (cents + 777L).as("cents"))
        Relational.upsert(base, updates, Seq("o_orderkey"))
          // Digest (r8): key-weighted cents sum pins each surviving
          // row's (key, cents) pair — an un-replaced base row or a
          // doubly-kept key flips sig_kc in its bucket.
          .groupBy(($"o_orderkey" % 16).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"o_orderkey").cast("long").as("sum_key"),
            sum($"cents").cast("long").as("sum_cents"),
            sum(($"o_orderkey" % 1000) * $"cents").cast("long")
              .as("sig_kc"))
          .orderBy($"bucket")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'),
             |updates AS (
             |  SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) + 777
             |      AS cents
             |  FROM orders WHERE o_orderkey % 5 = 0),
             |merged AS (
             |  SELECT * FROM updates
             |  UNION ALL
             |  SELECT * FROM base
             |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates))
             |SELECT CAST(o_orderkey % 16 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(sum((o_orderkey % 1000) * cents) AS BIGINT) AS sig_kc
             |FROM merged GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("agg_histogram",
      "Fixed-width histogram: integer-cents bucketing (exact — no double " +
        "division at bucket edges) of order totals, count + mass per " +
        "bucket. Map-side partial aggregation; at scale this is the " +
        "1-shuffle profile query run before choosing partition bounds.",
      (s, d) => {
        import s.implicits._
        Tables.table(s, d, "orders")
          .select((round($"o_totalprice" * 100).cast("long") / 5000000L)
            .cast("long").as("bucket"),
            round($"o_totalprice" * 100).cast("long").as("cents"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
          .orderBy($"bucket")
      },
      Some("""SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |    // 5000000 AS bucket,
             |  count(*) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |    AS BIGINT) AS sum_cents
             |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("w_event_transitions",
      "Event-transition (Markov) counts: per user, each event paired with " +
        "the NEXT event via lead() over (ts, event_id), then the " +
        "from→to matrix counted — one window + one agg, both partitioned " +
        "on the same key so the window's shuffle is reused.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
        Tables.events(s, d)
          .select($"user_id", $"event_type", $"ts", $"event_id")
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"next_type".isNotNull)
          .groupBy($"event_type".as("from_type"),
            $"next_type".as("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"from_type", $"to_type")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_ns(ts) // 1000, event_id) AS next_type
             |  FROM events)
             |SELECT event_type AS from_type, next_type AS to_type,
             |  count(*) AS n
             |FROM seq WHERE next_type IS NOT NULL
             |GROUP BY event_type, next_type
             |ORDER BY from_type, to_type""".stripMargin)),

    Q("agg_bitmap_distinct",
      "Bitmap-rollup distinct count: user ids packed into 64-bit words " +
        "(`bit_or(1 << id%63)` per (group, id div 63); 63-bit words keep the shift in signed-64 range on every engine), then " +
        "`sum(bit_count(word))` — EXACT distinct, mergeable across " +
        "partitions and re-aggregable across rollup levels, the classic " +
        "alternative to count(distinct)'s expand-shuffle at scale.",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"event_type", expr("user_id div 63").as("w"))
          .agg(expr("bit_or(shiftleft(1L, CAST(user_id % 63 AS INT)))")
            .as("word"))
          .groupBy($"event_type")
          .agg(sum(expr("bit_count(word)")).cast("long").as("n_users"))
          .orderBy($"event_type")
      },
      Some("""WITH words AS (
             |  SELECT event_type, user_id // 63 AS w,
             |    bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS word
             |  FROM events GROUP BY event_type, user_id // 63)
             |SELECT event_type,
             |  CAST(sum(bit_count(word)) AS BIGINT) AS n_users
             |FROM words GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("w_seq_pattern",
      "Event-sequence pattern match (MATCH_RECOGNIZE-style): per user the " +
        "time-ordered event-initial string (one agg — array_sort over " +
        "(ts, id, initial) structs, no window pre-sort shuffle), then a " +
        "regex over the path detects the click→…→view→…→purchase shape. " +
        "The distributed form of sessionized funnel-pattern detection: " +
        "path build and match are one shuffle on user_id.",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
            substring($"event_type", 1, 1).as("ini"))
          .groupBy($"user_id")
          .agg(array_sort(collect_list(struct($"ts_us", $"event_id",
            $"ini"))).as("arr"))
          .select($"user_id",
            expr("array_join(transform(arr, x -> x.ini), '')").as("path"))
          .withColumn("has_cvp", $"path".rlike("c.*v.*p"))
          .select($"user_id", length($"path").cast("long").as("path_len"),
            substring($"path", 1, 20).as("path_head"), $"has_cvp")
          .orderBy($"user_id")
      },
      Some("""WITH paths AS (
             |  SELECT user_id,
             |    string_agg(substr(event_type, 1, 1), ''
             |      ORDER BY epoch_ns(ts) // 1000, event_id) AS path
             |  FROM events GROUP BY user_id)
             |SELECT user_id, CAST(length(path) AS BIGINT) AS path_len,
             |  substr(path, 1, 20) AS path_head,
             |  regexp_matches(path, 'c.*v.*p') AS has_cvp
             |FROM paths ORDER BY user_id""".stripMargin)),

    Q("agg_bool_suite",
      "Conditional/boolean aggregates: count_if, bool_and, bool_or per " +
        "order priority — predicate pushdown into partial aggregation, " +
        "the idiom that replaces three self-joins with one scan.",
      (s, d) => {
        import s.implicits._
        Tables.table(s, d, "orders")
          .groupBy($"o_orderpriority")
          .agg(
            count_if($"o_totalprice" > 200000.0).as("n_big"),
            bool_and($"o_totalprice" > 0.0).as("all_positive"),
            bool_or($"o_orderstatus" === "F").as("any_final"),
            count(lit(1)).as("n"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
             |  bool_and(o_totalprice > 0.0) AS all_positive,
             |  bool_or(o_orderstatus = 'F') AS any_final,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    Q("o43_right_outer",
      "RIGHT OUTER join: every customer survives, orderless customers " +
        "carry NULL order columns — closes the join-type matrix (inner / " +
        "left / right / full / semi / anti / cross / as-of / range / " +
        "fuzzy / salted / bloom-pruned). Same hash exchange as the inner " +
        "join; only the row-retention rule differs.",
      (s, d) => {
        import s.implicits._
        Tables.table(s, d, "orders")
          .select($"o_custkey", $"o_orderkey")
          .join(Tables.table(s, d, "customer")
            .select($"c_custkey", $"c_name"),
            $"o_custkey" === $"c_custkey", "right_outer")
          .groupBy($"c_custkey", $"c_name")
          .agg(count($"o_orderkey").as("n_orders"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY c_custkey""".stripMargin)),

    Q("agg_equidepth_hist",
      "Equi-depth histogram: discrete quartile bounds — actual data " +
        "values, exact BIGINT compares, no interpolation ambiguity — " +
        "cross-joined back as a 1-row broadcast, rows bucketed and " +
        "counted. The two-pass profile query behind range-partition " +
        "boundary selection. NOT percentile_disc: Spark's exact " +
        "percentile buffers every row value in one aggregation buffer " +
        "(a 100 TB OOM); here the table first compacts to (value, " +
        "count) via a hash aggregate (bounded by the VALUE DOMAIN, not " +
        "the row count), then a domain-sized cumsum window + integer " +
        "cross-multiplied cume_dist thresholds (cum·4 ≥ N ⇔ " +
        "cume_dist ≥ 0.25) reproduce PERCENTILE_DISC semantics " +
        "exactly in distributable pieces. Two-pass bucket refinement " +
        "(r6): pass 1 range-counts 1024 coarse buckets (hash agg, " +
        "bounded by BUCKET count; cumulated via a broadcast triangular " +
        "join so no SinglePartition exchange appears anywhere); pass 2 " +
        "refines ONLY inside the ≤3 buckets that straddle a quartile " +
        "threshold, with the cumsum window partitioned per-quartile — " +
        "each window holds ~domain/1024 values, never the full domain. " +
        "Same PERCENTILE_DISC semantics, provably: the global cumsum at " +
        "any value = preceding-bucket offset + within-bucket cumsum.",
      (s, d) => {
        import s.implicits._
        val B = 1024
        val o = Tables.table(s, d, "orders")
          .select(round($"o_totalprice" * 100).cast("long").as("cents"))
        val stats = o.agg(min($"cents").as("mn"), max($"cents").as("mx"),
          count(lit(1)).as("n"))
        // monotone integer bucketing of the value domain (div, not
        // double division — exact at any magnitude)
        val ob = o.crossJoin(broadcast(stats))
          .withColumn("cb",
            expr(s"(cents - mn) * $B div (mx - mn + 1)"))
        val coarse = ob.groupBy($"cb", $"n").agg(count(lit(1)).as("cnt"))
        // coarse cumsum: triangular broadcast join over ≤B rows
        // (≤B² = 1M pairs, metadata-sized) — no global-sort exchange
        val coarseCum = coarse.as("a")
          .join(broadcast(coarse.as("b")), col("b.cb") <= col("a.cb"))
          .groupBy(col("a.cb").as("cb"), col("a.n").as("n"))
          .agg(sum(col("b.cnt")).as("ccum"))
        // per quartile q (thresholds cum*4 >= n*q): the coarse bucket
        // holding the quartile value, plus the cum offset entering it
        val qb = coarseCum
          .crossJoin(broadcast(Seq(1L, 2L, 3L).toDF("mult")))
          .groupBy($"mult", $"n")
          .agg(min(when($"ccum" * 4 >= $"n" * $"mult", $"cb")).as("qcb"),
            coalesce(max(when($"ccum" * 4 < $"n" * $"mult", $"ccum")),
              lit(0L)).as("off"))
        // refine inside the straddling buckets only: window partitioned
        // per quartile, each holding one coarse bucket's value domain
        val wIn = org.apache.spark.sql.expressions.Window
          .partitionBy($"mult").orderBy($"cents")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val bounds = ob.select($"cents", $"cb")
          .join(broadcast(qb), $"cb" === $"qcb")
          .groupBy($"mult", $"n", $"off", $"cents")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", $"off" + sum($"cnt").over(wIn))
          .agg(
            min(when($"mult" === 1 && $"cum" * 4 >= $"n", $"cents"))
              .as("q1"),
            min(when($"mult" === 2 && $"cum" * 4 >= $"n" * 2, $"cents"))
              .as("q2"),
            min(when($"mult" === 3 && $"cum" * 4 >= $"n" * 3, $"cents"))
              .as("q3"))
        o.crossJoin(bounds)
          .select(when($"cents" <= $"q1", 0L).when($"cents" <= $"q2", 1L)
            .when($"cents" <= $"q3", 2L).otherwise(3L).as("bucket"),
            $"cents")
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"), min($"cents").as("min_cents"),
            max($"cents").as("max_cents"))
          .orderBy($"bucket")
      },
      Some("""WITH o AS (
             |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |b AS (
             |  SELECT quantile_disc(cents, 0.25) AS q1,
             |    quantile_disc(cents, 0.50) AS q2,
             |    quantile_disc(cents, 0.75) AS q3 FROM o)
             |SELECT CAST(CASE WHEN cents <= q1 THEN 0
             |    WHEN cents <= q2 THEN 1 WHEN cents <= q3 THEN 2
             |    ELSE 3 END AS BIGINT) AS bucket,
             |  count(*) AS n, min(cents) AS min_cents,
             |  max(cents) AS max_cents
             |FROM o, b GROUP BY 1 ORDER BY bucket""".stripMargin)),

    Q("stream_cdc_apply",
      "Multi-micro-batch CDC apply: the events table split into 4 parquet " +
        "shards, streamed with maxFilesPerTrigger=1 (4 real micro-batches), " +
        "each batch's per-user latest row merged into a user-bucket-" +
        "partitioned parquet target via foreachBatch + dynamic partition " +
        "overwrite — per-batch read AND rewrite cost is proportional to " +
        "the buckets the batch touches, never O(target), so the pattern " +
        "holds as the target grows. The merge is a (ts, id)-max CRDT — " +
        "idempotent and batch-order-independent — so the final target " +
        "equals the batch argmax exactly.",
      (s, d) => {
        import s.implicits._
        withTempDir("graft-cdc-") { tmp =>
          val tgt = s"${tmp.getAbsolutePath}/tgt"
          val ev = Tables.events(s, d)
            .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
              $"event_type", round($"value" * 100).cast("long").as("cents"))
          // 4 shards written EXPLICITLY, one file each → exactly 4
          // micro-batches under maxFilesPerTrigger=1 by construction
          // (no reliance on RangePartitioner sampling landing one
          // partition per distinct shard value). The shard fixture is
          // deterministic in d — built once per JVM (r8: rebuilding it
          // each invocation was ~half the query's bench cost).
          val src = Scratch.cachedDir(s"cdc-src-$d") { fix =>
            (0L until 4L).foreach { i =>
              ev.filter(pmod($"event_id", lit(4L)) === i).coalesce(1)
                .write.mode("append").parquet(s"$fix/src")
            }
          }.getAbsolutePath + "/src"
          val schema = ev.schema
          val bucketOf = pmod(col("user_id"), lit(16L)).cast("int")
          def latest(df: org.apache.spark.sql.DataFrame) =
            df.groupBy(col("user_id"))
              .agg(max(struct(col("ts_us"), col("event_id"),
                col("event_type"), col("cents"))).as("m"))
              .select(col("user_id"), col("m.ts_us"), col("m.event_id"),
                col("m.event_type"), col("m.cents"))
          // explicit target schema: an all-empty day leaves tgt as an
          // empty dir (dynamic overwrite of zero partitions), and every
          // later read — mid-stream or final — must not depend on
          // schema inference from files that do not exist (found by the
          // StreamFloor 0-row sweep)
          val tgtSchema = latest(ev.limit(0))
            .withColumn("bucket", bucketOf).schema
          val scoped = graft.streaming.Streams.runForeachBatch(s) { sc =>
            sc.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
          } { (batch, _) =>
            val sc = batch.sparkSession
            sc.conf.set("spark.sql.sources.partitionOverwriteMode",
              "dynamic")
            // micro-batch jobs here are 4-partition fixed-width; AQE's
            // per-stage re-planning only adds scheduler latency ×4 batches
            sc.conf.set("spark.sql.adaptive.enabled", "false")
            val dbg = sys.env.contains("SPARK_GRAFT_CDC_DEBUG")
            var t0 = System.nanoTime()
            def lap(tag: String): Unit = if (dbg) {
              System.err.println(
                f"[cdc] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
              t0 = System.nanoTime()
            }
            // buckets this batch touches: ≤ 16 values, metadata-sized
            // (measured r8: folding this into a pre-aggregated checkpoint
            // of the batch costs MORE than the extra source scan — the
            // per-job scheduler overhead dominates at micro-batch size)
            val touched = batch.select(bucketOf.as("bucket"))
              .distinct().collect().map(_.getInt(0))
            lap("touched")
            // partition-pruned read: only the touched bucket dirs open
            val existing =
              if (Scratch.pathExists(sc, tgt))
                sc.read.schema(tgtSchema).parquet(tgt)
                  .filter(col("bucket").isin(touched.toSeq: _*))
                  .drop("bucket")
              else batch.limit(0)
            // materialize the merge BEFORE overwriting the dirs it reads;
            // repartition by bucket first so each bucket dir gets ONE
            // file per batch (user-hash partitions each held all 16
            // buckets → 64 tiny files per batch, 4× the file churn)
            val merged = latest(existing.unionByName(batch))
              .withColumn("bucket", bucketOf)
              .repartition(col("bucket"))
              .localCheckpoint()
            lap("merge+ckpt")
            // dynamic overwrite rewrites ONLY the buckets present in
            // `merged` (= the touched set); untouched dirs are untouched
            merged.write.mode("overwrite").partitionBy("bucket")
              .parquet(tgt)
            lap("write")
          }
          Scratch.mkdirs(scoped, tgt) // zero batches never create it
          scoped.read.schema(tgtSchema).parquet(tgt)
            .select($"user_id", $"ts_us", $"event_id", $"event_type",
              $"cents")
            .orderBy($"user_id")
        }
      },
      Some("""SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
             |  event_type,
             |  CAST(round(value * 100, 0) AS BIGINT) AS cents
             |FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id
             |  ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) = 1
             |ORDER BY user_id""".stripMargin)),

    Q("m_frame_sample",
      "Multimodal frame sampling, oracle-checked end to end: document " +
        "text as an opaque binary payload, `Multimodal.sampleFrames` " +
        "keeps every 2nd 64-byte frame (the video-keyframe / audio-window " +
        "shape — one typed pass, frames carry their index), outputs " +
        "md5 + length per frame. The corpus is ASCII so the byte-frame " +
        "oracle is expressible with substr on the oracle side.",
      (s, d) => {
        import s.implicits._
        val assets = Tables.documents(s, d)
          .select($"doc_id".as("asset_id"),
            $"text".cast("binary").as("payload"))
        graft.multimodal.Multimodal.sampleFrames(assets, 64, 2).toDF()
          .select($"asset_id", $"frame_idx",
            md5($"frame").as("frame_md5"),
            octet_length($"frame").cast("long").as("frame_len"))
          .orderBy($"asset_id", $"frame_idx")
      },
      Some("""WITH idx AS (
             |  SELECT doc_id AS asset_id, text,
             |    unnest(range(0, (length(text) + 63) // 64, 2))
             |      AS frame_idx
             |  FROM documents)
             |SELECT asset_id, frame_idx,
             |  md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64))
             |    AS frame_md5,
             |  CAST(length(substr(text, CAST(frame_idx * 64 + 1 AS INT),
             |    64)) AS BIGINT) AS frame_len
             |FROM idx ORDER BY asset_id, frame_idx""".stripMargin)),

    Q("g_triangle_count",
      "Graph analytics — exact triangle count over the " +
        "co-activity graph (users linked when they share a " +
        "(event_type, minute) bucket): edges derived by a self-join on the " +
        "bucket, oriented u1<u2 + distinct to kill multiplicity, then " +
        "the two-hop closure join counts triangles — all-integer, " +
        "shuffle-on-key shapes; at scale the bucket join is the blocked " +
        "form (never all-pairs) and degree-ordered orientation bounds " +
        "the closure fan-out.",
      (s, d) => {
        import s.implicits._
        // the closure references edges 3x — materialize once (11k rows),
        // or the whole bucket-join + distinct subtree runs 3 times
        val edges = Coactivity.und(s, d).localCheckpoint()
        val e2 = edges.select($"a".as("b2"), $"b".as("c"))
        val e3 = edges.select($"a".as("a3"), $"b".as("c3"))
        val tri = edges.join(e2, $"b" === $"b2")
          .join(e3, $"a" === $"a3" && $"c" === $"c3")
          .select($"a", $"b", $"c")
        tri.agg(count(lit(1)).as("n_triangles"))
      },
      Some(s"""WITH ${Coactivity.sqlUnd}
             |SELECT count(*) AS n_triangles
             |FROM und e1
             |JOIN und e2 ON e1.b = e2.a
             |JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b""".stripMargin)),

    Q("o44_dq_audit",
      "Data-quality audit suite (dbt-test style): key uniqueness, " +
        "not-null, referential integrity (anti join), accepted values, " +
        "and range checks — five independent violation counts unioned " +
        "into one report. Each check is a scan+agg or anti join the " +
        "optimizer runs in parallel; at scale this is the post-load " +
        "gate before a partition is published.",
      (s, d) => {
        import s.implicits._
        val orders = Tables.table(s, d, "orders")
        val li = Tables.table(s, d, "lineitem")
        def check(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_violations"))
            .select(lit(name).as("check_name"), $"n_violations")
        check("duplicate_orderkey",
            orders.groupBy($"o_orderkey").agg(count(lit(1)).as("c"))
              .filter($"c" > 1))
          .unionByName(check("null_custkey",
            orders.filter($"o_custkey".isNull)))
          .unionByName(check("orphan_lineitem",
            li.select($"l_orderkey").join(orders.select($"o_orderkey"),
              $"l_orderkey" === $"o_orderkey", "left_anti")))
          .unionByName(check("bad_priority",
            orders.filter(!$"o_orderpriority".isin(
              "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"))))
          .unionByName(check("negative_price",
            orders.filter($"o_totalprice" < 0.0)))
          .orderBy($"check_name")
      },
      Some("""SELECT * FROM (
             |  SELECT 'duplicate_orderkey' AS check_name,
             |    count(*) AS n_violations FROM (
             |    SELECT o_orderkey FROM orders GROUP BY o_orderkey
             |    HAVING count(*) > 1)
             |  UNION ALL
             |  SELECT 'null_custkey', count(*) FROM orders
             |  WHERE o_custkey IS NULL
             |  UNION ALL
             |  SELECT 'orphan_lineitem', count(*) FROM lineitem
             |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
             |  UNION ALL
             |  SELECT 'bad_priority', count(*) FROM orders
             |  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
             |    '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
             |  UNION ALL
             |  SELECT 'negative_price', count(*) FROM orders
             |  WHERE o_totalprice < 0.0)
             |ORDER BY check_name""".stripMargin)),

    Q("w_period_over_period",
      "Period-over-period: monthly revenue with the previous month's " +
        "value and exact integer-cents delta via lag() — the standard " +
        "reporting window after one small aggregation; no division, so " +
        "every column is engine-exact.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"ym")
        Tables.table(s, d, "orders")
          .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate"))
            .cast("long").as("ym"))
          .agg(sum(round($"o_totalprice" * 100).cast("long"))
            .as("cents"))
          .withColumn("prev_cents", lag($"cents", 1).over(w))
          .withColumn("delta_cents", $"cents" - $"prev_cents")
          .orderBy($"ym")
      },
      Some("""WITH m AS (
             |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
             |      AS BIGINT) AS ym,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS cents
             |  FROM orders GROUP BY 1)
             |SELECT ym, cents,
             |  lag(cents) OVER (ORDER BY ym) AS prev_cents,
             |  cents - lag(cents) OVER (ORDER BY ym) AS delta_cents
             |FROM m ORDER BY ym""".stripMargin)),

    Q("s2_schema_evolution",
      "Schema-evolution read: two parquet batches with different " +
        "schemas (the second adds a column) land in one directory; " +
        "`mergeSchema` resolves the union schema and back-fills NULL — " +
        "the file-level form of O-20's outer alignment, and what a " +
        "long-lived 100 TB table does every time a producer adds a field.",
      (s, d) => {
        import s.implicits._
        withTempDir("graft-evo-") { tmp =>
          val dir = s"${tmp.getAbsolutePath}/t"
          val cents = round($"o_totalprice" * 100).cast("long").as("cents")
          val orders = Tables.table(s, d, "orders")
          orders.filter($"o_orderkey" % 2 === 0)
            .select($"o_orderkey", cents)
            .write.mode("append").parquet(dir)
          orders.filter($"o_orderkey" % 2 === 1)
            .select($"o_orderkey", cents, $"o_orderpriority")
            .write.mode("append").parquet(dir)
          // Digest (r8): the union schema's NULL back-fill is pinned by
          // n_prio (only odd keys carry the added column) and the value
          // signatures cover every merged row.
          s.read.option("mergeSchema", "true").parquet(dir)
            .groupBy(($"o_orderkey" % 8).cast("long").as("bucket"))
            .agg(count(lit(1)).as("n"),
              sum($"o_orderkey").cast("long").as("sum_key"),
              sum($"cents").cast("long").as("sum_cents"),
              count($"o_orderpriority").as("n_prio"),
              sum(Digest.strSig($"o_orderpriority")).as("sig_prio"))
            .orderBy($"bucket")
        }
      },
      Some(s"""WITH evo AS (
             |  SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             |    CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
             |      AS o_orderpriority
             |  FROM orders)
             |SELECT CAST(o_orderkey % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  count(o_orderpriority) AS n_prio,
             |  CAST(sum(${Digest.strSigSql("o_orderpriority")})
             |    AS BIGINT) AS sig_prio
             |FROM evo GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("s3_tsv_roundtrip",
      "TSV sink + scan round-trip (S-1/K-3, the reference's native " +
        "format): orders written tab-separated with header, read back " +
        "with an explicit schema (no inference job) — values survive " +
        "exactly because every column is BIGINT/string on the wire.",
      (s, d) => {
        import s.implicits._
        withTempDir("graft-tsv-") { tmp =>
          val dir = s"${tmp.getAbsolutePath}/t"
          Tables.table(s, d, "orders")
            .select($"o_orderkey",
              round($"o_totalprice" * 100).cast("long").as("cents"),
              $"o_orderstatus", $"o_orderpriority")
            .write.option("sep", "\t").option("header", "true").csv(dir)
          // Digest (r8): every value that crossed the TSV wire is in a
          // signature — a single mis-quoted/mis-parsed cell flips it.
          s.read.option("sep", "\t").option("header", "true")
            .schema("o_orderkey BIGINT, cents BIGINT, " +
              "o_orderstatus STRING, o_orderpriority STRING")
            .csv(dir)
            .groupBy(($"o_orderkey" % 8).cast("long").as("bucket"))
            .agg(count(lit(1)).as("n"),
              sum($"o_orderkey").cast("long").as("sum_key"),
              sum($"cents").cast("long").as("sum_cents"),
              sum(Digest.strSig($"o_orderstatus")).as("sig_status"),
              sum(Digest.strSig($"o_orderpriority")).as("sig_prio"))
            .orderBy($"bucket")
        }
      },
      Some(s"""WITH t AS (
             |  SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             |    o_orderstatus, o_orderpriority
             |  FROM orders)
             |SELECT CAST(o_orderkey % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(${Digest.strSigSql("o_orderstatus")})
             |    AS BIGINT) AS sig_status,
             |  CAST(sum(${Digest.strSigSql("o_orderpriority")})
             |    AS BIGINT) AS sig_prio
             |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("s4_jsonl_roundtrip",
      "JSON-lines sink + scan round-trip (the ES-hit wire shape of " +
        "S-10/F-14): nested struct rows written as json lines, read back " +
        "with an explicit schema and the struct fields re-projected.",
      (s, d) => {
        import s.implicits._
        withTempDir("graft-jsonl-") { tmp =>
          val dir = s"${tmp.getAbsolutePath}/t"
          Tables.table(s, d, "customer")
            .select($"c_custkey",
              struct($"c_name".as("name"), $"c_nationkey".as("nation"))
                .as("meta"))
            .write.json(dir)
          s.read
            .schema("c_custkey BIGINT, meta STRUCT<name: STRING, " +
              "nation: BIGINT>")
            .json(dir)
            .select($"c_custkey", $"meta.name".as("name"),
              $"meta.nation".as("nation"))
            .orderBy($"c_custkey")
        }
      },
      Some("""SELECT c_custkey, c_name AS name, c_nationkey AS nation
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("f26_regexp_extract_all",
      "regexp_extract_all + lateral re-aggregation: every 4+-letter " +
        "word starting with a vowel per document, exploded and counted " +
        "per (doc, word) — the tokenizer-as-regex shape.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            explode(expr(
              "regexp_extract_all(text, '\\\\b[aeiou][a-z]{3,}', 0)"))
              .as("word"))
          .groupBy($"doc_id", $"word")
          .agg(count(lit(1)).as("n"))
          .orderBy($"doc_id", $"word")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, unnest(
             |    regexp_extract_all(text, '\b[aeiou][a-z]{3,}')) AS word
             |  FROM documents)
             |SELECT doc_id, word, count(*) AS n
             |FROM w GROUP BY doc_id, word
             |ORDER BY doc_id, word""".stripMargin)),

    Q("d_substring_spans",
      "Repeated-span detection (exact substring dedup, the " +
        "train-data-dedup op behind 'dedup repeated 50-token spans'): " +
        "every positional 8-token shingle, distinct per doc, shingles " +
        "occurring in >1 doc flagged, per-doc count of shared spans. " +
        "Shuffle carries shingle strings once (at 100 TB: xxhash64 the " +
        "shingle first so the exchange moves 8-byte keys, same plan).",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select($"doc_id", split($"text", " ").as("toks"))
        val sh = docs.select($"doc_id", explode(expr(
            "transform(sequence(1, greatest(size(toks) - 7, 1)), " +
              "i -> array_join(slice(toks, i, 8), ' '))")).as("shingle"))
          .distinct()
        val hot = sh.groupBy($"shingle").agg(count(lit(1)).as("c"))
          .filter($"c" > 1).select($"shingle")
        val shared = sh.join(hot, Seq("shingle"))
          .groupBy($"doc_id").agg(count(lit(1)).as("n"))
        docs.select($"doc_id").join(shared, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"n", lit(0L)).as("n_shared_spans"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |    array_to_string(toks[i:i+7], ' ') AS shingle
             |  FROM t, unnest(range(1, greatest(len(toks) - 7, 1) + 1))
             |    AS u(i)),
             |hot AS (
             |  SELECT shingle FROM sh GROUP BY shingle
             |  HAVING count(*) > 1),
             |shared AS (
             |  SELECT doc_id, count(*) AS n FROM sh
             |  JOIN hot USING (shingle) GROUP BY doc_id)
             |SELECT t.doc_id,
             |  CAST(COALESCE(shared.n, 0) AS BIGINT) AS n_shared_spans
             |FROM t LEFT JOIN shared ON t.doc_id = shared.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    Q("g_pagerank",
      "Graph analytics — PageRank, 3 iterations in EXACT integer " +
        "arithmetic (ranks scaled ×1e6, truncating div for the " +
        "contribution and damping steps) so every engine agrees " +
        "bit-for-bit — the standard iterative-join shape: per round one " +
        "shuffle on dst for the contribution sum, ranks co-partitioned " +
        "with the (checkpointed) edge list; at scale the same loop runs " +
        "with edge-set-width partitioning like the CC operator.",
      (s, d) => {
        import s.implicits._
        val und = Coactivity.und(s, d).localCheckpoint()
        val bi = und.select($"a".as("src"), $"b".as("dst"))
          .unionByName(und.select($"b".as("src"), $"a".as("dst")))
          .localCheckpoint()
        val deg = bi.groupBy($"src").agg(count(lit(1)).as("deg"))
          .localCheckpoint()
        var rank = deg.select($"src".as("node"),
          lit(1000000L).as("rank"))
        for (_ <- 1 to 3) {
          val contrib = rank.join(deg, rank("node") === deg("src"))
            .select($"node", expr("rank div deg").as("c"))
          val inc = bi.join(contrib, $"src" === $"node")
            .groupBy($"dst").agg(sum($"c").as("inc"))
          rank = deg.select($"src".as("node"))
            .join(inc, $"node" === $"dst", "left")
            .select($"node",
              (lit(150000L) +
                expr("(85 * coalesce(inc, 0L)) div 100")).as("rank"))
        }
        rank.select($"node".as("user_id"), $"rank").orderBy($"user_id")
      },
      Some {
        def round(i: Int) =
          s"""c$i AS (
             |  SELECT bi.dst AS node, sum(r${i - 1}.rank // deg.deg) AS inc
             |  FROM bi JOIN r${i - 1} ON bi.src = r${i - 1}.node
             |  JOIN deg ON bi.src = deg.src GROUP BY bi.dst),
             |r$i AS (
             |  SELECT deg.src AS node,
             |    150000 + (85 * COALESCE(c$i.inc, 0)) // 100 AS rank
             |  FROM deg LEFT JOIN c$i ON deg.src = c$i.node)"""
        s"""WITH ${Coactivity.sqlUnd},
           |${Coactivity.sqlBi},
           |deg AS (SELECT src, count(*) AS deg FROM bi GROUP BY src),
           |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank
           |  FROM deg),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT node AS user_id, CAST(rank AS BIGINT) AS rank
           |FROM r3 ORDER BY user_id""".stripMargin
      }),

    Q("o45_asof_snapshot",
      "Point-in-time reconstruction over the SCD2 history (time travel " +
        "without a table format): filter the o38 intervals to the one " +
        "containing the as-of date — per key exactly the version active " +
        "then; empty [d,d) tie intervals drop out by construction.",
      (s, d) => {
        import s.implicits._
        val asOf = lit("1998-06-15 00:00:00")
        Relational.scd2(
            Tables.table(s, d, "orders").select($"o_custkey", $"o_orderkey",
              round($"o_totalprice" * 100).cast("long").as("price_cents"),
              $"o_orderdate"),
            Seq("o_custkey"), col("o_orderdate"), col("o_orderkey"))
          .filter($"valid_from" <= asOf &&
            ($"valid_to".isNull || $"valid_to" > asOf))
          .select($"o_custkey", $"o_orderkey", $"price_cents",
            $"valid_from")
          .orderBy($"o_custkey")
      },
      Some("""WITH hist AS (
             |  SELECT o_custkey, o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |      AS price_cents,
             |    o_orderdate AS valid_from,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS valid_to
             |  FROM orders)
             |SELECT o_custkey, o_orderkey, price_cents, valid_from
             |FROM hist
             |WHERE valid_from <= TIMESTAMP '1998-06-15'
             |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '1998-06-15')
             |ORDER BY o_custkey""".stripMargin)),

    Q("agg_skew_kurtosis",
      "Skewness + excess kurtosis, engine-portable like agg_corr: exact " +
        "BIGINT power sums (q..q⁴ of the small-domain quantity — no " +
        "overflow) in one partial-aggregated pass, then fixed-shape IEEE " +
        "expressions using only +,-,*,/ and sqrt (every op correctly " +
        "rounded — no pow(), whose libm varies across engines).",
      (s, d) => {
        import s.implicits._
        val q = round($"l_quantity").cast("long")
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), sum(q).as("s1"),
            sum(q * q).as("s2"), sum(q * q * q).as("s3"),
            sum(q * q * q * q).as("s4"))
          .select($"l_returnflag", $"n",
            {
              val nd = $"n".cast("double")
              val a = $"s1".cast("double"); val b = $"s2".cast("double")
              val c = $"s3".cast("double"); val e = $"s4".cast("double")
              val m2n = nd * b - a * a
              val m3n = nd * nd * c - lit(3.0) * nd * a * b +
                lit(2.0) * a * a * a
              val m4n = nd * nd * nd * e -
                lit(4.0) * nd * nd * a * c +
                lit(6.0) * nd * a * a * b - lit(3.0) * a * a * a * a
              struct(
                (sqrt(nd) * m3n / (m2n * sqrt(m2n))).as("skewness"),
                (nd * m4n / (m2n * m2n) - lit(3.0)).as("kurtosis"))
            }.as("m"))
          .select($"l_returnflag", $"n", $"m.skewness", $"m.kurtosis")
          .orderBy($"l_returnflag")
      },
      Some("""WITH sums AS (
             |  SELECT l_returnflag, count(*) AS n,
             |    sum(CAST(round(l_quantity, 0) AS BIGINT)) AS s1,
             |    sum(CAST(round(l_quantity, 0) AS BIGINT)
             |      * CAST(round(l_quantity, 0) AS BIGINT)) AS s2,
             |    sum(CAST(round(l_quantity, 0) AS BIGINT)
             |      * CAST(round(l_quantity, 0) AS BIGINT)
             |      * CAST(round(l_quantity, 0) AS BIGINT)) AS s3,
             |    sum(CAST(round(l_quantity, 0) AS BIGINT)
             |      * CAST(round(l_quantity, 0) AS BIGINT)
             |      * CAST(round(l_quantity, 0) AS BIGINT)
             |      * CAST(round(l_quantity, 0) AS BIGINT)) AS s4
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n,
             |  ((sqrt(CAST(n AS DOUBLE)) *
             |    (((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             |        * CAST(s3 AS DOUBLE)
             |      - ((3.0 * CAST(n AS DOUBLE)) * CAST(s1 AS DOUBLE))
             |        * CAST(s2 AS DOUBLE))
             |      + ((2.0 * CAST(s1 AS DOUBLE)) * CAST(s1 AS DOUBLE))
             |        * CAST(s1 AS DOUBLE)))
             |   / ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |      * sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))))
             |    AS skewness,
             |  ((CAST(n AS DOUBLE) *
             |    ((((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             |        * CAST(n AS DOUBLE)) * CAST(s4 AS DOUBLE)
             |      - (((4.0 * CAST(n AS DOUBLE)) * CAST(n AS DOUBLE))
             |        * CAST(s1 AS DOUBLE)) * CAST(s3 AS DOUBLE))
             |     + (((6.0 * CAST(n AS DOUBLE)) * CAST(s1 AS DOUBLE))
             |        * CAST(s1 AS DOUBLE)) * CAST(s2 AS DOUBLE)
             |     - (((3.0 * CAST(s1 AS DOUBLE)) * CAST(s1 AS DOUBLE))
             |        * CAST(s1 AS DOUBLE)) * CAST(s1 AS DOUBLE)))
             |   / ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |      * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
             |   - 3.0) AS kurtosis
             |FROM sums ORDER BY l_returnflag""".stripMargin)),

    Q("s5_orc_roundtrip",
      "ORC sink + scan round-trip: the second columnar format (predicate " +
        "pushdown verified in FormatsSpec) in the oracle sweep — " +
        "BIGINT/string columns written and read back exactly, with a " +
        "pushed filter on the read side.",
      (s, d) => {
        import s.implicits._
        withTempDir("graft-orc-") { tmp =>
          val dir = s"${tmp.getAbsolutePath}/t"
          Tables.table(s, d, "customer")
            .select($"c_custkey", $"c_name", $"c_nationkey")
            .write.orc(dir)
          s.read.orc(dir)
            .filter($"c_nationkey" < 10)
            .orderBy($"c_custkey")
        }
      },
      Some("""SELECT c_custkey, c_name, c_nationkey
             |FROM customer WHERE c_nationkey < 10
             |ORDER BY c_custkey""".stripMargin)),

    Q("s6_partitioned_pruning",
      "Hive-partitioned write + pruned read in the oracle sweep " +
        "(PruningSpec asserts the numFiles metrics): events written " +
        "partitioned by event_type, one partition read back by literal " +
        "predicate — the scan lists ONE directory, the other four are " +
        "never opened.",
      (s, d) => {
        import s.implicits._
        withTempDir("graft-part-") { tmp =>
          val dir = s"${tmp.getAbsolutePath}/t"
          Tables.events(s, d)
            .select($"event_id", $"user_id", $"event_type",
              round($"value" * 100).cast("long").as("cents"))
            .write.partitionBy("event_type").parquet(dir)
          s.read.parquet(dir)
            .filter($"event_type" === "purchase")
            .groupBy($"user_id")
            .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
            .orderBy($"user_id")
        }
      },
      Some("""SELECT user_id, count(*) AS n,
             |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("w_cume_uniques",
      "New-vs-cumulative uniques: each user's first-seen day (one " +
        "key-partitioned min), new users per day, and the running total " +
        "of distinct users ever seen — the standard growth query; " +
        "cumulative window over the tiny per-day aggregate, exact ints.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        Tables.events(s, d)
          .groupBy($"user_id").agg(min(to_date($"ts")).as("day"))
          .groupBy($"day").agg(count(lit(1)).as("new_users"))
          .withColumn("cume_users", sum($"new_users").over(w))
          .orderBy($"day")
      },
      Some("""WITH firstday AS (
             |  SELECT user_id, min(CAST(ts AS DATE)) AS day
             |  FROM events GROUP BY user_id),
             |daily AS (
             |  SELECT day, count(*) AS new_users FROM firstday
             |  GROUP BY day)
             |SELECT day, new_users,
             |  CAST(sum(new_users) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cume_users
             |FROM daily ORDER BY day""".stripMargin)),

    Q("o46_pivot_multi_agg",
      "Pivot with MULTIPLE aggregates per pivot value (count + exact " +
        "cents sum per order priority, one row per nation) — explicit " +
        "pivot-value list keeps the schema static, no distinct-collect " +
        "pre-job; the oracle is the FILTER-per-column expansion every " +
        "engine without PIVOT uses.",
      (s, d) => {
        import s.implicits._
        val cents = round($"o_totalprice" * 100).cast("long")
        Tables.table(s, d, "orders")
          .join(Tables.table(s, d, "customer"),
            $"o_custkey" === $"c_custkey")
          .select(($"c_nationkey" % 5).as("ngrp"),
            $"o_orderpriority".substr(1, 1).as("pri"), cents.as("cents"))
          .groupBy($"ngrp")
          .pivot("pri", Seq("1", "2", "3"))
          .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
          .orderBy($"ngrp")
      },
      Some("""SELECT c_nationkey % 5 AS ngrp,
             |  count(*) FILTER (WHERE substr(o_orderpriority, 1, 1) = '1')
             |    AS "1_n",
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |    FILTER (WHERE substr(o_orderpriority, 1, 1) = '1') AS BIGINT)
             |    AS "1_cents",
             |  count(*) FILTER (WHERE substr(o_orderpriority, 1, 1) = '2')
             |    AS "2_n",
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |    FILTER (WHERE substr(o_orderpriority, 1, 1) = '2') AS BIGINT)
             |    AS "2_cents",
             |  count(*) FILTER (WHERE substr(o_orderpriority, 1, 1) = '3')
             |    AS "3_n",
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |    FILTER (WHERE substr(o_orderpriority, 1, 1) = '3') AS BIGINT)
             |    AS "3_cents"
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY ngrp""".stripMargin)),

    Q("p_pack_sequences",
      "Training-example packing: documents greedily packed into 2048-" +
        "token context windows — whitespace token counts, running total " +
        "in (doc_id) order WITHIN a deterministic shard (doc_id div " +
        "256), bin = (cumsum - tokens) div budget, per-(shard, bin) doc " +
        "count + token total in exact ints. Bins never need to span " +
        "shards, so the cumsum window is hash-partitioned on shard — " +
        "every task packs its own slice of the corpus and the plan has " +
        "no SinglePartition exchange; shard count grows with the " +
        "corpus, so the same plan holds at 100 TB.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"shard").orderBy($"doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        Tables.documents(s, d)
          .select($"doc_id",
            size(split($"text", "\\s+")).cast("long").as("toks"))
          .withColumn("shard", expr("doc_id div 256"))
          .withColumn("cum", sum($"toks").over(w))
          .select($"shard", $"toks",
            expr("(cum - toks) div 2048").as("bin"))
          .groupBy($"shard", $"bin")
          .agg(count(lit(1)).as("n_docs"), sum($"toks").as("sum_toks"))
          .orderBy($"shard", $"bin")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id // 256 AS shard,
             |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
             |      AS toks
             |  FROM documents),
             |c AS (
             |  SELECT shard, toks,
             |    CAST((sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      - toks) // 2048 AS BIGINT) AS bin
             |  FROM t)
             |SELECT shard, bin, count(*) AS n_docs,
             |  CAST(sum(toks) AS BIGINT) AS sum_toks
             |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin)),

    Q("agg_weighted_median",
      "Weighted median (an op neither engine has natively): per return " +
        "flag, the smallest quantity whose running weight (quantity-" +
        "weighted by line count... here weight = extended price cents) " +
        "reaches half the group total — one sort-window cumsum over the " +
        "compacted (group, value, weight) aggregate, exact ints " +
        "throughout.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"l_returnflag").orderBy($"qty")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val grouped = Tables.lineitem(s, d)
          .select($"l_returnflag", round($"l_quantity").cast("long")
            .as("qty"),
            round($"l_extendedprice" * 100).cast("long").as("wt"))
          .groupBy($"l_returnflag", $"qty")
          .agg(sum($"wt").as("wt"))
        val tot = grouped.groupBy($"l_returnflag")
          .agg(sum($"wt").as("total_wt"))
        grouped.withColumn("cum", sum($"wt").over(w))
          .join(tot, Seq("l_returnflag"))
          .filter($"cum" * 2 >= $"total_wt")
          .groupBy($"l_returnflag")
          .agg(min($"qty").as("weighted_median_qty"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH g AS (
             |  SELECT l_returnflag, CAST(round(l_quantity, 0) AS BIGINT)
             |      AS qty,
             |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
             |      AS wt
             |  FROM lineitem GROUP BY 1, 2),
             |c AS (
             |  SELECT l_returnflag, qty, wt,
             |    sum(wt) OVER (PARTITION BY l_returnflag ORDER BY qty
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    sum(wt) OVER (PARTITION BY l_returnflag) AS total_wt
             |  FROM g)
             |SELECT l_returnflag, min(qty) AS weighted_median_qty
             |FROM c WHERE cum * 2 >= total_wt
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("agg_mode",
      "Deterministic mode: most frequent order priority per nation " +
        "bucket, ties broken by the lexicographically LARGER value — " +
        "count agg + one row_number window, never the engines' " +
        "tie-arbitrary mode() builtins.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"ngrp").orderBy($"c".desc, $"o_orderpriority".desc)
        Tables.table(s, d, "orders")
          .join(Tables.table(s, d, "customer"),
            $"o_custkey" === $"c_custkey")
          .groupBy(($"c_nationkey" % 5).as("ngrp"), $"o_orderpriority")
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"ngrp", $"o_orderpriority".as("mode_priority"),
            $"c".as("n"))
          .orderBy($"ngrp")
      },
      Some("""WITH g AS (
             |  SELECT c_nationkey % 5 AS ngrp, o_orderpriority,
             |    count(*) AS c
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |r AS (
             |  SELECT ngrp, o_orderpriority, c,
             |    row_number() OVER (PARTITION BY ngrp
             |      ORDER BY c DESC, o_orderpriority DESC) AS rn
             |  FROM g)
             |SELECT ngrp, o_orderpriority AS mode_priority, c AS n
             |FROM r WHERE rn = 1 ORDER BY ngrp""".stripMargin)),

    Q("w_zscore",
      "Per-group z-score standardization (the ML feature-prep " +
        "transform): group mean/std from exact BIGINT sums joined back " +
        "to every row, the standardized value computed by one fixed " +
        "IEEE expression (+,-,*,/ and sqrt only) — bit-identical " +
        "cross-engine, no running-moment accumulation order.",
      (s, d) => {
        import s.implicits._
        val q = round($"l_quantity").cast("long")
        val stats = Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), sum(q).as("s1"),
            sum(q * q).as("s2"))
        Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
            q.as("qty"))
          .join(stats, Seq("l_returnflag"))
          .select($"l_orderkey", $"l_linenumber".cast("long")
            .as("l_linenumber"), $"l_returnflag",
            (($"n".cast("double") * $"qty".cast("double") -
              $"s1".cast("double")) /
              sqrt($"n".cast("double") * $"s2".cast("double") -
                $"s1".cast("double") * $"s1".cast("double")))
              .as("zscore"))
          // Digest (r8): the per-row standardized double (bit-identical
          // cross-engine — one fixed IEEE expression) is fixed at 1e-6
          // and key-weighted, pinning each row's z to its key.
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(Digest.numSig($"zscore", 1000000L)).as("sum_z"),
            sum(Digest.numSig($"zscore", 1000000L) *
              ($"l_orderkey" % 97)).cast("long").as("sig_z"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH stats AS (
             |  SELECT l_returnflag, count(*) AS n,
             |    sum(CAST(round(l_quantity, 0) AS BIGINT)) AS s1,
             |    sum(CAST(round(l_quantity, 0) AS BIGINT)
             |      * CAST(round(l_quantity, 0) AS BIGINT)) AS s2
             |  FROM lineitem GROUP BY 1),
             |z AS (
             |  SELECT l_orderkey, l_returnflag,
             |    ((CAST(n AS DOUBLE)
             |        * CAST(CAST(round(l_quantity, 0) AS BIGINT) AS DOUBLE)
             |      - CAST(s1 AS DOUBLE))
             |     / sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))) AS zscore
             |  FROM lineitem JOIN stats USING (l_returnflag))
             |SELECT l_returnflag, count(*) AS n,
             |  CAST(sum(CAST(round(zscore * 1000000, 0) AS BIGINT))
             |    AS BIGINT) AS sum_z,
             |  CAST(sum(CAST(round(zscore * 1000000, 0) AS BIGINT)
             |    * (l_orderkey % 97)) AS BIGINT) AS sig_z
             |FROM z GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    Q("f29_try_cast",
      "try_cast error-handling semantics: garbage-tolerant casts yield " +
        "NULL instead of failing the job (the ingestion-time counterpart " +
        "of `Relational.strictCast`'s raise-on-garbage) — numeric, and " +
        "numeric-with-junk-suffix inputs over derived strings.",
      (s, d) => {
        import s.implicits._
        Tables.table(s, d, "orders")
          .select($"o_orderkey",
            concat($"o_orderkey".cast("string"),
              when($"o_orderkey" % 3 === 0, lit("x")).otherwise(lit("")))
              .as("s"))
          .select($"o_orderkey",
            expr("try_cast(s AS BIGINT)").as("as_int"),
            expr("try_cast(s AS DOUBLE)").as("as_double"),
            expr("try_cast(s AS BIGINT) IS NULL").as("rejected"))
          // Digest (r8): null counts pin which rows were rejected
          // (every key ≡ 0 mod 3); value sums pin the parsed numbers.
          .groupBy(($"o_orderkey" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            count($"as_int").as("n_int"),
            sum($"as_int").cast("long").as("sum_int"),
            sum($"as_double".cast("long")).cast("long").as("sum_dbl"),
            sum($"rejected".cast("long")).cast("long").as("n_rejected"))
          .orderBy($"bucket")
      },
      Some("""WITH t AS (
             |  SELECT o_orderkey,
             |    CAST(o_orderkey AS VARCHAR)
             |      || CASE WHEN o_orderkey % 3 = 0 THEN 'x' ELSE '' END
             |      AS s
             |  FROM orders),
             |c AS (
             |  SELECT o_orderkey, TRY_CAST(s AS BIGINT) AS as_int,
             |    TRY_CAST(s AS DOUBLE) AS as_double,
             |    TRY_CAST(s AS BIGINT) IS NULL AS rejected
             |  FROM t)
             |SELECT CAST(o_orderkey % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  count(as_int) AS n_int,
             |  CAST(sum(as_int) AS BIGINT) AS sum_int,
             |  CAST(sum(CAST(as_double AS BIGINT)) AS BIGINT) AS sum_dbl,
             |  CAST(sum(CASE WHEN rejected THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_rejected
             |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("f30_binary_codecs",
      "Binary codec functions: utf8 bytes → base64 / hex / sha256 — " +
        "the content-addressing toolkit (digests for dedup keys, " +
        "base64 for JSON-safe payload transport); ASCII corpus keeps " +
        "byte semantics engine-identical.",
      (s, d) => {
        import s.implicits._
        Tables.table(s, d, "customer")
          .select($"c_custkey",
            base64($"c_name".cast("binary")).as("b64"),
            lower(hex($"c_name".cast("binary"))).as("hexed"),
            sha2($"c_name".cast("binary"), 256).as("sha"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  to_base64(CAST(c_name AS BLOB)) AS b64,
             |  lower(hex(CAST(c_name AS BLOB))) AS hexed,
             |  sha256(c_name) AS sha
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("w_share_of_total",
      "Share-of-total analytics: each priority's exact cents within its " +
        "nation bucket plus its share of the bucket — group total via an " +
        "unframed window over the small aggregate, one IEEE division for " +
        "the ratio.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"ngrp")
        Tables.table(s, d, "orders")
          .join(Tables.table(s, d, "customer"),
            $"o_custkey" === $"c_custkey")
          .groupBy(($"c_nationkey" % 5).as("ngrp"), $"o_orderpriority")
          .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
          .withColumn("grp_cents", sum($"cents").over(w))
          .select($"ngrp", $"o_orderpriority", $"cents",
            ($"cents".cast("double") / $"grp_cents".cast("double"))
              .as("share"))
          .orderBy($"ngrp", $"o_orderpriority")
      },
      Some("""WITH g AS (
             |  SELECT c_nationkey % 5 AS ngrp, o_orderpriority,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2)
             |SELECT ngrp, o_orderpriority, cents,
             |  (CAST(cents AS DOUBLE)
             |   / CAST(sum(cents) OVER (PARTITION BY ngrp) AS DOUBLE))
             |    AS share
             |FROM g ORDER BY ngrp, o_orderpriority""".stripMargin)),

    Q("o47_lateral_topn",
      "SQL LATERAL join (correlated subquery in FROM, decorrelated by " +
        "Catalyst): per nation the top-2 customers by account balance — " +
        "the per-row-subquery surface; the engine rewrites it to the " +
        "same WindowGroupLimit shape as the window form.",
      (s, d) => {
        Seq("nation", "customer").foreach { t =>
          Tables.table(s, d, t).createOrReplaceTempView(s"v_$t")
        }
        s.sql("""
          SELECT n.n_nationkey, n.n_name, t.c_custkey,
            CAST(round(t.c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM v_nation n
          JOIN LATERAL (
            SELECT c_custkey, c_acctbal FROM v_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
          ) t
          ORDER BY n.n_nationkey, bal_cents DESC, t.c_custkey""")
      },
      Some("""SELECT n.n_nationkey, n.n_name, t.c_custkey,
             |  CAST(round(t.c_acctbal * 100, 0) AS BIGINT) AS bal_cents
             |FROM nation n
             |JOIN LATERAL (
             |  SELECT c_custkey, c_acctbal FROM customer c
             |  WHERE c.c_nationkey = n.n_nationkey
             |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
             |) t ON true
             |ORDER BY n.n_nationkey, bal_cents DESC, t.c_custkey"""
        .stripMargin)),

    Q("agg_gini",
      "Gini coefficient per market segment over account-balance cents: " +
        "rank-weighted sum formula G = 2·Σ(i·x)/(n·Σx) − (n+1)/n with " +
        "the rank window ordered (cents, custkey) — Σ(i·x) is exact " +
        "BIGINT (tie blocks contribute identically under any tie " +
        "order), one fixed IEEE expression at the end.",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"c_mktsegment").orderBy($"cents", $"c_custkey")
        Tables.table(s, d, "customer")
          .select($"c_mktsegment", $"c_custkey",
            round($"c_acctbal" * 100).cast("long").as("cents"))
          .withColumn("i", row_number().over(w).cast("long"))
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
            sum($"i" * $"cents").as("ix"))
          .select($"c_mktsegment", $"n",
            ((lit(2.0) * $"ix".cast("double")) /
              ($"n".cast("double") * $"s".cast("double")) -
              (($"n".cast("double") + lit(1.0)) / $"n".cast("double")))
              .as("gini"))
          .orderBy($"c_mktsegment")
      },
      Some("""WITH r AS (
             |  SELECT c_mktsegment, c_custkey,
             |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents,
             |    CAST(row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY CAST(round(c_acctbal * 100, 0) AS BIGINT),
             |        c_custkey) AS BIGINT) AS i
             |  FROM customer),
             |g AS (
             |  SELECT c_mktsegment, count(*) AS n, sum(cents) AS s,
             |    sum(i * cents) AS ix
             |  FROM r GROUP BY 1)
             |SELECT c_mktsegment, n,
             |  ((2.0 * CAST(ix AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
             |   - ((CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)))
             |    AS gini
             |FROM g ORDER BY c_mktsegment""".stripMargin)),

    Q("o48_recursive_cte",
      "Recursive CTE (WITH RECURSIVE, new SQL surface in Spark 4): " +
        "transitive ancestry over the implicit halving hierarchy " +
        "(parent(k) = k div 2) — per start key the full chain to the " +
        "root with depth, the fixed-point iteration the engine runs as " +
        "repeated joins; DuckDB executes the identical text.",
      (s, d) => {
        Tables.table(s, d, "nation").createOrReplaceTempView("v_nation")
        s.sql("""
          WITH RECURSIVE chain (start, node, depth) AS (
            SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
              CAST(0 AS BIGINT) FROM v_nation
            UNION ALL
            SELECT start, node DIV 2, depth + 1 FROM chain WHERE node > 0
          )
          SELECT CAST(start AS BIGINT) AS start,
            CAST(node AS BIGINT) AS node,
            CAST(depth AS BIGINT) AS depth
          FROM chain ORDER BY start, depth""")
      },
      Some("""WITH RECURSIVE chain (start, node, depth) AS (
             |  SELECT n_nationkey, n_nationkey, 0 FROM nation
             |  UNION ALL
             |  SELECT start, node // 2, depth + 1 FROM chain WHERE node > 0
             |)
             |SELECT CAST(start AS BIGINT) AS start,
             |  CAST(node AS BIGINT) AS node,
             |  CAST(depth AS BIGINT) AS depth
             |FROM chain ORDER BY start, depth""".stripMargin)),

    Q("f32_variant",
      "VARIANT semi-structured type (Spark 4's native JSON path, " +
        "binary-encoded + shredding-ready, vs F-8's string " +
        "get_json_object): parse the props JSON once to VARIANT, typed " +
        "variant_get extraction, aggregated per extracted key bucket.",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_id",
            expr("variant_get(parse_json(props), '$.k', 'bigint')")
              .as("k"))
          .groupBy(($"k" % 10).as("kmod"))
          .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
          .orderBy($"kmod")
      },
      Some("""SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10
             |    AS kmod,
             |  count(*) AS n,
             |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
             |    AS BIGINT) AS sum_k
             |FROM events GROUP BY 1 ORDER BY kmod""".stripMargin)),

    Q("j15_nullsafe_join",
      "Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL " +
        "keys MATCH each other instead of vanishing — the semantics " +
        "snapshot-diff and dedup joins need when the key itself is " +
        "nullable; planned as a hash join on the null-safe key, not a " +
        "cartesian.",
      (s, d) => {
        import s.implicits._
        def side(name: String) = Tables.table(s, d, "orders")
          .select($"o_orderkey",
            when($"o_orderkey" % 11 === 0, lit(null))
              .otherwise($"o_orderkey" % 97).as(name))
        side("ka").as("l").join(side("kb").as("r"),
            col("l.ka") <=> col("r.kb") &&
              col("l.o_orderkey") === col("r.o_orderkey"))
          .groupBy(coalesce(col("l.ka"), lit(-1L)).as("key_grp"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"key_grp")
      },
      Some("""WITH l AS (
             |  SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0
             |    THEN NULL ELSE o_orderkey % 97 END AS ka FROM orders),
             |r AS (
             |  SELECT o_orderkey, CASE WHEN o_orderkey % 11 = 0
             |    THEN NULL ELSE o_orderkey % 97 END AS kb FROM orders)
             |SELECT COALESCE(l.ka, -1) AS key_grp, count(*) AS n
             |FROM l JOIN r ON l.ka IS NOT DISTINCT FROM r.kb
             |  AND l.o_orderkey = r.o_orderkey
             |GROUP BY 1 ORDER BY key_grp""".stripMargin)),

    Q("j16_asof_forward",
      "FORWARD as-of join (next-touch attribution shape): each click " +
        "paired with the EARLIEST purchase at-or-after it — the same " +
        "merge-shape `Relational.asofJoin`, run on negated timestamps " +
        "(forward as-of IS backward as-of under time reversal); right " +
        "side pre-deduped per (user, instant) so the match is " +
        "tie-free. Oracle: DuckDB's native forward ASOF (`l.ts <= " +
        "r.ts`) — an independent algorithm.",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", $"event_id",
            unix_micros($"ts").as("ts_us"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id", $"ts_us",
            (-$"ts_us").as("neg_ts"))
        val purchases = ev.filter($"event_type" === "purchase")
          .groupBy($"user_id", $"ts_us")
          .agg(min($"event_id").as("p_event_id"))
          .select($"user_id", $"ts_us".as("p_ts_us"),
            (-$"ts_us").as("neg_ts"), $"p_event_id")
        Relational.asofJoin(clicks, purchases, Seq("user_id"),
            "neg_ts", "neg_ts", Seq("p_ts_us", "p_event_id"),
            strict = false)
          .select($"user_id", $"event_id", $"ts_us", $"p_ts_us",
            $"p_event_id")
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, event_id,
             |    epoch_ns(ts) // 1000 AS ts_us FROM events),
             |clicks AS (
             |  SELECT user_id, event_id, ts_us FROM ev
             |  WHERE event_type = 'click'),
             |purchases AS (
             |  SELECT user_id, ts_us AS p_ts_us,
             |    min(event_id) AS p_event_id
             |  FROM ev WHERE event_type = 'purchase'
             |  GROUP BY user_id, ts_us)
             |SELECT c.user_id, c.event_id, c.ts_us, p.p_ts_us,
             |  p.p_event_id
             |FROM clicks c ASOF LEFT JOIN purchases p
             |  ON c.user_id = p.user_id AND c.ts_us <= p.p_ts_us
             |ORDER BY c.user_id, c.event_id""".stripMargin)),

    Q("j17_asof_tolerance",
      "As-of join with a staleness tolerance (merge_asof's `tolerance`): " +
        "latest prior purchase per click, but matches older than 6 " +
        "hours are nulled out — the matched right timestamp rides the " +
        "atomic value struct, so the tolerance check is a plain filter " +
        "after the join.",
      (s, d) => {
        import s.implicits._
        val tolUs = 6L * 3600 * 1000000
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", $"event_id",
            unix_micros($"ts").as("ts_us"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id", $"ts_us")
        val purchases = ev.filter($"event_type" === "purchase")
          .groupBy($"user_id", ($"ts_us").as("p_ts_us"))
          .agg(max($"event_id").as("p_event_id"))
        val joined = Relational.asofJoin(clicks, purchases,
          Seq("user_id"), "ts_us", "p_ts_us",
          Seq("p_ts_us", "p_event_id"), strict = false)
        joined.select($"user_id", $"event_id", $"ts_us",
            when($"ts_us" - $"p_ts_us" <= tolUs, $"p_ts_us")
              .as("p_ts_us"),
            when($"ts_us" - $"p_ts_us" <= tolUs, $"p_event_id")
              .as("p_event_id"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, event_id,
             |    epoch_ns(ts) // 1000 AS ts_us FROM events),
             |clicks AS (
             |  SELECT user_id, event_id, ts_us FROM ev
             |  WHERE event_type = 'click'),
             |purchases AS (
             |  SELECT user_id, ts_us AS p_ts_us,
             |    max(event_id) AS p_event_id
             |  FROM ev WHERE event_type = 'purchase'
             |  GROUP BY user_id, ts_us),
             |j AS (
             |  SELECT c.user_id, c.event_id, c.ts_us, p.p_ts_us,
             |    p.p_event_id
             |  FROM clicks c ASOF LEFT JOIN purchases p
             |    ON c.user_id = p.user_id AND c.ts_us >= p.p_ts_us)
             |SELECT user_id, event_id, ts_us,
             |  CASE WHEN ts_us - p_ts_us <= 21600000000
             |    THEN p_ts_us END AS p_ts_us,
             |  CASE WHEN ts_us - p_ts_us <= 21600000000
             |    THEN p_event_id END AS p_event_id
             |FROM j ORDER BY user_id, event_id""".stripMargin)),

    Q("stream_sliding_window",
      "SLIDING (overlapping) streaming windows — 10-minute windows " +
        "every 5 minutes, so each event lands in exactly two window " +
        "instances (vs stream_windowed_counts' tumbling): the state " +
        "store carries both open instances per (window, type) key; " +
        "oracle expands each event to its two window starts by " +
        "arithmetic.",
      (s, d) => {
        import s.implicits._
        val schema = Tables.eventsRaw(s, d).schema
        graft.streaming.Streams.runToMemory(s,
            s"stream_slide_${System.nanoTime()}") { scoped =>
            val stream = Tables.normalizeEventsTs(
              graft.streaming.Streams.fileStream(scoped, s"$d/events.*",
                schema, maxFilesPerTrigger = Int.MaxValue))
            stream
              .withWatermark("ts", "1 minute")
              .groupBy(window($"ts", "10 minutes", "5 minutes"),
                $"event_type")
              .agg(count(lit(1)).as("n"))
          }
          .select(unix_micros($"window.start").as("wstart_us"),
            $"event_type", $"n")
          // Digest (r8): each (window, type) count is pinned by a
          // window-start-weighted sum — a count landing in the wrong
          // window instance flips sig_w for its type.
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_windows"),
            sum($"n").cast("long").as("sum_n"),
            sum(($"wstart_us" / lit(1000000L)).cast("long") % 100000L *
              $"n").cast("long").as("sig_w"))
          .orderBy($"event_type")
      },
      Some("""WITH e AS (
             |  SELECT event_type,
             |    epoch_ns(ts) // 1000
             |      - (epoch_ns(ts) // 1000) % 300000000 AS t5
             |  FROM events),
             |x AS (
             |  SELECT event_type,
             |    unnest([t5, t5 - 300000000]) AS wstart_us
             |  FROM e),
             |w AS (
             |  SELECT wstart_us, event_type, count(*) AS n
             |  FROM x GROUP BY 1, 2)
             |SELECT event_type, count(*) AS n_windows,
             |  CAST(sum(n) AS BIGINT) AS sum_n,
             |  CAST(sum((wstart_us // 1000000) % 100000 * n) AS BIGINT)
             |    AS sig_w
             |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("curate_pack_pipeline",
      "The downstream tail of the curation pipeline (curate_corpus's " +
        "sibling): quality gate → exact dedup (min doc per digest) → " +
        "drop boilerplate-heavy docs (>10 corpus-shared 8-token spans, " +
        "the d_substring_spans signal) → pack survivors into 2048-token " +
        "training windows — four verified operators composed into one " +
        "lazy plan with one digest shuffle, one shingle shuffle, and " +
        "one packing window. The packing cumsum is partitioned by a " +
        "deterministic shard key (doc_id div 256) — bins never span " +
        "shards, so no SinglePartition window and the plan scales with " +
        "the corpus.",
      (s, d) => {
        import s.implicits._
        val toks = size(split($"text", "\\s+")).cast("long")
        val quality = Tables.documents(s, d)
          // toks' defining split is PINNED (r19, guide §4.4):
          // unpinned, the token-count filter is alias-substituted
          // below this projection and the split runs twice per doc
          .select($"doc_id", $"text",
            graft.functions.text.pinned(toks).as("toks"))
          .filter($"toks" >= 20 && length($"text") >= 100)
        val kept = quality
          .groupBy(md5($"text").as("h"))
          .agg(min_by(struct($"doc_id", $"text", $"toks"), $"doc_id")
            .as("r"))
          .select($"r.doc_id", $"r.text", $"r.toks")
        // tokenize once per doc (projected before the lambda — an
        // inline split re-evaluates per shingle slice)
        val sh = kept
          .select($"doc_id", split($"text", "\\s+").as("tk"))
          .select($"doc_id", explode(expr(
            "transform(sequence(1, greatest(size(tk) - 7, 1)), " +
              "i -> array_join(slice(tk, i, 8), ' '))")).as("shingle"))
          .distinct()
        val hot = sh.groupBy($"shingle").agg(count(lit(1)).as("c"))
          .filter($"c" > 1).select($"shingle")
        val heavy = sh.join(hot, Seq("shingle"))
          .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
          .filter($"n_shared" > 10)
          .select($"doc_id")
        val clean = kept.join(heavy, Seq("doc_id"), "left_anti")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"shard").orderBy($"doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        clean.withColumn("shard", expr("doc_id div 256"))
          .withColumn("cum", sum($"toks").over(w))
          .select($"shard", $"doc_id", $"toks",
            expr("(cum - toks) div 2048").as("bin"))
          .groupBy($"shard", $"bin")
          .agg(count(lit(1)).as("n_docs"), sum($"toks").as("sum_toks"),
            min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
          .orderBy($"shard", $"bin")
      },
      Some("""WITH q AS (
             |  SELECT doc_id, text,
             |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
             |      AS toks
             |  FROM documents
             |  WHERE len(string_split_regex(text, '\s+')) >= 20
             |    AND length(text) >= 100),
             |kept AS (
             |  SELECT doc_id, text, toks FROM (
             |    SELECT doc_id, text, toks, row_number() OVER (
             |      PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |    FROM q) t WHERE rn = 1),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |    array_to_string(
             |      string_split_regex(text, '\s+')[i:i+7], ' ') AS shingle
             |  FROM kept, unnest(range(1,
             |    greatest(len(string_split_regex(text, '\s+')) - 7, 1)
             |      + 1)) AS u(i)),
             |hot AS (
             |  SELECT shingle FROM sh GROUP BY shingle
             |  HAVING count(*) > 1),
             |heavy AS (
             |  SELECT doc_id FROM sh JOIN hot USING (shingle)
             |  GROUP BY doc_id HAVING count(*) > 10),
             |clean AS (
             |  SELECT k.doc_id, k.doc_id // 256 AS shard, k.toks
             |  FROM kept k
             |  WHERE k.doc_id NOT IN (SELECT doc_id FROM heavy)),
             |c AS (
             |  SELECT shard, doc_id, toks,
             |    CAST((sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      - toks) // 2048 AS BIGINT) AS bin
             |  FROM clean)
             |SELECT shard, bin, count(*) AS n_docs,
             |  CAST(sum(toks) AS BIGINT) AS sum_toks,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin))
  )
}
