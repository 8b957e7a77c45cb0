package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 surface widening: grouping sets, the full rank-function family,
  * array/date/interval functions, unpivot (melt), date-spine reindexing,
  * fuzzy (edit-distance) joins, SQL subquery forms, argmax aggregates,
  * regex scrubbing, repetition/TF-IDF text signals, and two more streaming
  * shapes (stream-static broadcast enrichment, built-in session_window).
  * Everything is oracle-exact: integer/cents arithmetic, explicit
  * tiebreaks, and engine-portable expressions throughout.
  */
object ExtendedQueries {

  def all: Seq[Q] = Seq(

    Q("agg_grouping_sets",
      "Explicit GROUPING SETS ((p,s),(p),()) with grouping() markers — " +
        "the general form behind ROLLUP/CUBE, one shuffle, partial aggs.",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq($"o_orderpriority", $"o_orderstatus"),
              Seq($"o_orderpriority"), Seq()),
            $"o_orderpriority", $"o_orderstatus")
          .agg(count(lit(1)).as("n"),
            grouping($"o_orderpriority").cast("long").as("g_p"),
            grouping($"o_orderstatus").cast("long").as("g_s"))
          .orderBy($"g_p", $"g_s", $"o_orderpriority", $"o_orderstatus")
      },
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
             |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
             |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
             |  (o_orderpriority), ())
             |ORDER BY g_p, g_s, o_orderpriority, o_orderstatus"""
        .stripMargin)),

    Q("w_rank_suite",
      "The full rank-function family over one (user, time) window: ntile, " +
        "percent_rank, cume_dist, lead/lag, first_value — unique sort key " +
        "(ts, event_id) makes every value engine-portable; percent_rank/" +
        "cume_dist are single IEEE divisions of exact integers.",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
        Tables.events(s, d)
          .select($"event_id", $"user_id",
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            lag($"event_id", 1).over(w).as("prev_ev"),
            lead($"event_id", 1).over(w).as("next_ev"),
            first($"event_id").over(w).as("first_ev"))
          // Digest (r8): every rank value is key-weighted so a rank
          // assigned to the wrong row flips its bucket's signature;
          // pct_rank/cume are exact dyadic doubles fixed at 1e-9
          // (DuckDB and Spark both round half away from zero).
          .groupBy(($"user_id" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"quartile" * ($"event_id" % 97)).cast("long")
              .as("sig_quart"),
            sum(Digest.numSig($"pct_rank", 1000000000L)).as("sig_pct"),
            sum(Digest.numSig($"cume", 1000000000L)).as("sig_cume"),
            count($"prev_ev").as("n_prev"),
            sum($"prev_ev").cast("long").as("sum_prev"),
            sum($"next_ev").cast("long").as("sum_next"),
            sum($"first_ev" * ($"event_id" % 97)).cast("long")
              .as("sig_first"))
          .orderBy($"bucket")
      },
      Some("""WITH r AS (
             |  SELECT event_id, user_id,
             |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |    percent_rank() OVER w AS pct_rank,
             |    cume_dist() OVER w AS cume,
             |    lag(event_id, 1) OVER w AS prev_ev,
             |    lead(event_id, 1) OVER w AS next_ev,
             |    first_value(event_id) OVER w AS first_ev
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY epoch_ns(ts) // 1000, event_id))
             |SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(quartile * (event_id % 97)) AS BIGINT)
             |    AS sig_quart,
             |  CAST(sum(CAST(round(pct_rank * 1000000000, 0) AS BIGINT))
             |    AS BIGINT) AS sig_pct,
             |  CAST(sum(CAST(round(cume * 1000000000, 0) AS BIGINT))
             |    AS BIGINT) AS sig_cume,
             |  count(prev_ev) AS n_prev,
             |  CAST(sum(prev_ev) AS BIGINT) AS sum_prev,
             |  CAST(sum(next_ev) AS BIGINT) AS sum_next,
             |  CAST(sum(first_ev * (event_id % 97)) AS BIGINT)
             |    AS sig_first
             |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("f16_array_ops",
      "Array-function surface: distinct/sort/slice/join, membership, " +
        "1-based position — all codegen'd builtins over split tokens.",
      (s, d) => {
        import s.implicits._
        val toks = split($"text", " ")
        Tables.documents(s, d)
          .select($"doc_id",
            size(toks).cast("long").as("n_toks"),
            array_join(slice(sort_array(array_distinct(toks)), 1, 3), " ")
              .as("first3"),
            array_contains(toks, "spark").as("has_spark"),
            array_position(toks, "the").cast("long").as("pos_the"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             |  array_to_string(
             |    list_sort(list_distinct(string_split(text, ' ')))[1:3],
             |    ' ') AS first3,
             |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
             |  CAST(coalesce(list_position(string_split(text, ' '), 'the'),
             |    0) AS BIGINT) AS pos_the
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("f17_date_arith",
      "Date-function surface: add, diff, last_day, month-trunc, " +
        "day-of-week — engine conventions aligned explicitly (DuckDB dow " +
        "is 0-based Sunday, Spark 1-based).",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("d")).distinct()
          .select($"d",
            date_add($"d", 30).as("d30"),
            datediff($"d", lit("1995-01-01").cast("date")).cast("long")
              .as("days_since"),
            last_day($"d").as("ld"),
            trunc($"d", "month").as("m0"),
            dayofweek($"d").cast("long").as("dow"))
          .orderBy($"d")
      },
      Some("""SELECT d, d + 30 AS d30,
             |  date_diff('day', DATE '1995-01-01', d) AS days_since,
             |  last_day(d) AS ld,
             |  CAST(date_trunc('month', d) AS DATE) AS m0,
             |  CAST(dayofweek(d) + 1 AS BIGINT) AS dow
             |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
             |      FROM orders)
             |ORDER BY d""".stripMargin)),

    Q("o32_date_spine",
      "Time-series reindex: generated date spine (sequence + explode) " +
        "left-joined to daily order counts, gaps zero-filled — the " +
        "temporal form of O-23 reindex-with-fill.",
      (s, d) => {
        import s.implicits._
        val spine = s.range(1).select(explode(sequence(
          lit(java.sql.Date.valueOf("1995-01-01")),
          lit(java.sql.Date.valueOf("1995-03-31")))).as("d"))
        val daily = Tables.orders(s, d)
          .select(to_date($"o_orderdate").as("d"))
          .groupBy($"d").agg(count(lit(1)).as("n_orders"))
        spine.join(daily, Seq("d"), "left")
          .na.fill(0L, Seq("n_orders"))
          .orderBy($"d")
      },
      Some("""SELECT CAST(t.d AS DATE) AS d,
             |  coalesce(n.n_orders, 0) AS n_orders
             |FROM generate_series(DATE '1995-01-01', DATE '1995-03-31',
             |  INTERVAL 1 DAY) t(d)
             |LEFT JOIN (SELECT CAST(o_orderdate AS DATE) AS d,
             |    count(*) AS n_orders FROM orders GROUP BY 1) n
             |  ON CAST(t.d AS DATE) = n.d
             |ORDER BY d""".stripMargin)),

    Q("o33_unpivot",
      "Unpivot (melt): the wide per-segment count matrix back to long " +
        "(nation, segment, n) — the inverse of O-21's horizontal pivot, " +
        "null cells dropped like a long-form groupBy never makes them.",
      (s, d) => {
        import s.implicits._
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
          "MACHINERY")
        Tables.customer(s, d)
          .groupBy($"c_nationkey").pivot("c_mktsegment", segs)
          .agg(count(lit(1)))
          .unpivot(Array(col("c_nationkey")), segs.map(col).toArray,
            "segment", "n")
          .filter($"n".isNotNull)
          .orderBy($"c_nationkey", $"segment")
      },
      Some("""SELECT c_nationkey, c_mktsegment AS segment,
             |  count(*) AS n
             |FROM customer GROUP BY c_nationkey, c_mktsegment
             |ORDER BY c_nationkey, segment""".stripMargin)),

    Q("j9_fuzzy_join",
      "Fuzzy join: nation-name pairs within Levenshtein distance 5 — the " +
        "edit-distance form of J-3 alias matching for keys with typos. " +
        "Tiny dimension ⇒ broadcast nested loop; at scale the same " +
        "operator runs behind an n-gram-blocking equi join.",
      (s, d) => {
        import s.implicits._
        val a = Tables.nation(s, d).select($"n_name".as("name_a"))
        val b = Tables.nation(s, d).select($"n_name".as("name_b"))
        a.join(b, $"name_a" < $"name_b" &&
            levenshtein($"name_a", $"name_b") <= 5)
          .select($"name_a", $"name_b",
            levenshtein($"name_a", $"name_b").cast("long").as("dist"))
          .orderBy($"name_a", $"name_b")
      },
      Some("""SELECT a.n_name AS name_a, b.n_name AS name_b,
             |  CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
             |FROM nation a JOIN nation b
             |  ON a.n_name < b.n_name
             |  AND levenshtein(a.n_name, b.n_name) <= 5
             |ORDER BY name_a, name_b""".stripMargin)),

    Q("o34_subqueries",
      "SQL subquery surface through spark.sql: correlated EXISTS, " +
        "uncorrelated IN, and a scalar subquery in one predicate — " +
        "Catalyst decorrelates to joins; all-integer semantics.",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
        s.sql("""
          SELECT o_orderkey, o_orderstatus
          FROM graft_orders o
          WHERE EXISTS (SELECT 1 FROM graft_lineitem l
                        WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_quantity >= 49)
            AND o_orderkey IN (SELECT l_orderkey FROM graft_lineitem
                               WHERE l_quantity <= 2)
            AND o_orderkey > (SELECT min(o_orderkey) FROM graft_orders)
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_orderstatus
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_quantity >= 49)
             |  AND o_orderkey IN (SELECT l_orderkey FROM lineitem
             |                     WHERE l_quantity <= 2)
             |  AND o_orderkey > (SELECT min(o_orderkey) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("agg_argmax",
      "Argmax/argmin aggregates: per-nation top/bottom customer by " +
        "(acctbal, custkey) via max_by/min_by over structs — one " +
        "aggregation instead of a window+filter pass; oracle = an " +
        "INDEPENDENT row_number algorithm agreeing on every tiebreak.",
      (s, d) => {
        import s.implicits._
        val byNation = Tables.customer(s, d)
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_cust"),
            max_by($"c_name", struct($"c_acctbal", $"c_custkey"))
              .as("top_cust"),
            min_by($"c_name", struct($"c_acctbal", $"c_custkey"))
              .as("bottom_cust"))
        byNation
          .join(broadcast(Tables.nation(s, d)),
            $"c_nationkey" === $"n_nationkey")
          .select($"n_name", $"n_cust", $"top_cust", $"bottom_cust")
          .orderBy($"n_name")
      },
      Some("""WITH ranked AS (
             |  SELECT c_nationkey, c_name,
             |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
             |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rt,
             |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
             |      ORDER BY c_acctbal ASC, c_custkey ASC) AS rb
             |  FROM customer)
             |SELECT n.n_name,
             |  (SELECT count(*) FROM customer c
             |   WHERE c.c_nationkey = r.c_nationkey) AS n_cust,
             |  max(CASE WHEN rt = 1 THEN c_name END) AS top_cust,
             |  max(CASE WHEN rb = 1 THEN c_name END) AS bottom_cust
             |FROM ranked r JOIN nation n ON r.c_nationkey = n.n_nationkey
             |GROUP BY n.n_name, r.c_nationkey
             |ORDER BY n_name""".stripMargin)),

    Q("t_scrub_redact",
      "Redaction pass (PII-shaped regex scrub): count pattern hits and " +
        "fingerprint the scrubbed text — replace-all + regexp_count, " +
        "single projection, no shuffle.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            regexp_count($"text", lit("\\ba[a-z]*")).cast("long")
              .as("n_hits"),
            md5(regexp_replace($"text", "\\ba[a-z]*", "[TOK]")).as("fp"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '\ba[a-z]*')) AS BIGINT)
             |    AS n_hits,
             |  md5(regexp_replace(text, '\ba[a-z]*', '[TOK]', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("t_repetition",
      "Gopher-style repetition signals: total/distinct token counts and " +
        "the most-repeated token's frequency per doc — duplicate-heavy " +
        "docs are low-quality training data; all exact integers.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", explode(split(trim($"text"), "\\s+"))
            .as("tok"))
          .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(sum($"c").cast("long").as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max($"c").cast("long").as("top_n"))
          .orderBy($"doc_id")
      },
      Some("""WITH per AS (
             |  SELECT doc_id, tok, count(*) AS c
             |  FROM (SELECT doc_id,
             |          unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY doc_id, tok)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |  count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_n
             |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("t_tfidf_top",
      "TF-IDF-shaped signal: each doc's top term by (tf desc, term asc) " +
        "with its corpus document frequency — two aggregations + one " +
        "window first-match + a broadcast df join, integers only (float " +
        "idf ranks are engine-order traps; the integer pair is the same " +
        "order).",
      (s, d) => {
        import s.implicits._
        // fused typed pass (r8): per-doc term frequencies AND the
        // per-doc top term (tf desc, tok asc) computed in one local
        // sweep — the explode + groupBy(doc, tok) + doc-window form
        // shuffled every raw token row twice before the df join; this
        // shuffles only the per-doc-distinct term table, once, for df.
        val tf = Tables.documents(s, d)
          .select($"doc_id", $"text").as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, text) =>
            val toks = text.trim.split("\\s+", -1)
            val m = scala.collection.mutable.HashMap.empty[String, Long]
            toks.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
            val top = m.minBy { case (t, c) => (-c, t) }._1
            m.iterator.map { case (t, c) => (id, t, c, t == top) }
          }).toDF("doc_id", "tok", "tf", "is_top")
        val dfreq = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
        // no broadcast hint: dfreq is vocabulary-sized, which grows with
        // the corpus — at 100 TB it must shuffle-join; AQE still picks a
        // broadcast join at runtime when the vocab is actually small
        tf.filter($"is_top")
          .join(dfreq, Seq("tok"))
          .select($"doc_id", $"tok".as("top_tok"),
            $"tf".cast("long").as("tf"), $"df".cast("long").as("df"))
          .orderBy($"doc_id")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, tok, count(*) AS tf
             |  FROM (SELECT doc_id,
             |          unnest(string_split_regex(trim(text), '\s+')) AS tok
             |        FROM documents)
             |  GROUP BY doc_id, tok),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
             |top AS (SELECT doc_id, tok, tf,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY tf DESC, tok ASC) AS rn
             |  FROM tf)
             |SELECT t.doc_id, t.tok AS top_tok,
             |  CAST(t.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df
             |FROM top t JOIN dfreq d USING (tok)
             |WHERE t.rn = 1 ORDER BY t.doc_id""".stripMargin)),

    Q("agg_topk_udaf",
      "Typed Aggregator (UDAF) surface: exact per-group top-3 via a " +
        "bounded map-side heap — partial buffers cap at k entries per " +
        "group before the exchange, so huge groups shuffle k rows, not " +
        "all; oracle = an independent window row_number algorithm.",
      (s, d) => {
        import s.implicits._
        val topk = graft.functions.TopKAgg.topK(3)
        Tables.events(s, d)
          .select($"event_type",
            round($"value" * 100).cast("long").as("cents"), $"event_id")
          .groupBy($"event_type")
          .agg(topk($"cents", $"event_id").as("top"))
          .select($"event_type", posexplode($"top"))
          .select($"event_type", ($"pos" + 1).cast("long").as("rank"),
            $"col.v".as("cents"), $"col.id".as("event_id"))
          .orderBy($"event_type", $"rank")
      },
      Some("""SELECT event_type, CAST(rn AS BIGINT) AS rank, cents, event_id
             |FROM (SELECT event_type,
             |        CAST(round(value * 100, 0) AS BIGINT) AS cents,
             |        event_id,
             |        ROW_NUMBER() OVER (PARTITION BY event_type
             |          ORDER BY CAST(round(value * 100, 0) AS BIGINT) DESC,
             |            event_id DESC) AS rn
             |      FROM events) t
             |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin)),

    Q("d_bow_dedup",
      "Dedup: bag-of-words fingerprint — md5 over the sorted distinct " +
        "token set, so reordered/duplicated-word copies collapse to one " +
        "group (the cheap order-insensitive tier between exact-hash and " +
        "MinHash). Shuffles 16-byte digests only.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", md5(array_join(sort_array(array_distinct(
            split(trim($"text"), "\\s+"))), " ")).as("bow_fp"))
          .groupBy($"bow_fp")
          .agg(min($"doc_id").as("keep_id"),
            count(lit(1)).as("n_copies"))
          .orderBy($"bow_fp")
      },
      Some("""SELECT md5(array_to_string(list_sort(list_distinct(
             |    string_split_regex(trim(text), '\s+'))), ' ')) AS bow_fp,
             |  min(doc_id) AS keep_id,
             |  CAST(count(*) AS BIGINT) AS n_copies
             |FROM documents
             |GROUP BY 1 ORDER BY bow_fp""".stripMargin)),

    Q("stream_enrich",
      "Stream-static enrichment: the file stream broadcast-joined to a " +
        "static tier dimension (the streaming form of J-1's broadcast " +
        "manifest join), aggregated per tier in integer cents.",
      (s, d) => {
        import s.implicits._
        val schema = Tables.eventsRaw(s, d).schema
        Streams.runToMemory(s,
            s"stream_enrich_${System.nanoTime()}") { scoped =>
            val stream = Tables.normalizeEventsTs(
              Streams.fileStream(scoped, s"$d/events.*", schema,
                maxFilesPerTrigger = Int.MaxValue))
            val dim = scoped.createDataFrame(Seq(
              ("click", "engage"), ("view", "engage"),
              ("purchase", "convert"), ("signup", "convert"),
              ("error", "ops"))).toDF("event_type", "tier")
            // left join + coalesce mirrors the oracle CASE's ELSE 'ops':
            // unknown event types fall through instead of being dropped.
            stream.join(broadcast(dim), Seq("event_type"), "left")
              .withColumn("tier", coalesce(col("tier"), lit("ops")))
              .groupBy(col("tier"))
              .agg(count(lit(1)).as("n"),
                sum(round(col("value") * 100).cast("long"))
                  .as("total_cents"))
          }
          .orderBy($"tier")
      },
      Some("""SELECT CASE event_type
             |    WHEN 'click' THEN 'engage' WHEN 'view' THEN 'engage'
             |    WHEN 'purchase' THEN 'convert' WHEN 'signup' THEN 'convert'
             |    ELSE 'ops' END AS tier,
             |  count(*) AS n,
             |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS total_cents
             |FROM events GROUP BY tier ORDER BY tier""".stripMargin)),

    Q("w_range_frame",
      "Value-RANGE window frames (vs w_rolling_window's ROWS frames): " +
        "trailing-hour sums per user over event-time microseconds — ties " +
        "in the order key all join the frame, so the result is " +
        "deterministic without a unique sort key; plus last-non-null over " +
        "a ROWS frame (IGNORE NULLS semantics).",
      (s, d) => {
        import s.implicits._
        val cents = round($"value" * 100).cast("long")
        val wRange = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"))
          .rangeBetween(-3600000000L, 0)
        val wRows = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, d)
          .select($"event_id", $"user_id",
            sum(cents).over(wRange).as("hr_cents"),
            count(lit(1)).over(wRange).cast("long").as("hr_n"),
            last(nullif($"event_type", lit("view")), ignoreNulls = true)
              .over(wRows).as("last_nonview"))
          // Digest (r8): key-weighted frame sums — a RANGE frame that
          // includes/excludes one tie wrongly shifts sig_frame.
          .groupBy(($"user_id" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"hr_cents").cast("long").as("sum_cents"),
            sum($"hr_n").cast("long").as("sum_n"),
            sum($"hr_cents" * ($"event_id" % 97)).cast("long")
              .as("sig_frame"),
            count($"last_nonview").as("n_lnv"),
            sum(Digest.strSig($"last_nonview") % 100000L *
              ($"event_id" % 97)).cast("long").as("sig_lnv"))
          .orderBy($"bucket")
      },
      Some(s"""WITH w AS (
             |  SELECT event_id, user_id,
             |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER wr
             |      AS BIGINT) AS hr_cents,
             |    CAST(COUNT(*) OVER wr AS BIGINT) AS hr_n,
             |    last_value(nullif(event_type, 'view') IGNORE NULLS)
             |      OVER wo AS last_nonview
             |  FROM events
             |  WINDOW wr AS (PARTITION BY user_id
             |      ORDER BY epoch_ns(ts) // 1000
             |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
             |    wo AS (PARTITION BY user_id
             |      ORDER BY epoch_ns(ts) // 1000, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(hr_cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(hr_n) AS BIGINT) AS sum_n,
             |  CAST(sum(hr_cents * (event_id % 97)) AS BIGINT)
             |    AS sig_frame,
             |  count(last_nonview) AS n_lnv,
             |  CAST(sum(${Digest.strSigSql("last_nonview")} % 100000
             |    * (event_id % 97)) AS BIGINT) AS sig_lnv
             |FROM w GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("agg_approx_quantile",
      "Approximate-quantile sketch (KLL-style percentile_approx): p50/p90 " +
        "of value per event_type — mergeable sketch, one pass, bounded " +
        "memory at any scale. The sketch value is engine-specific, so the " +
        "query exports the sketch's own guarantee as an oracle-checkable " +
        "RANK envelope: the fraction of values ≤ each estimate must sit " +
        "within ±0.02 of the target quantile (accuracy 10000 ⇒ rank " +
        "error ~1e-4; the slack absorbs value discreteness at tiny SF) — " +
        "the oracle expects TRUE.",
      (s, d) => {
        import s.implicits._
        val ap = Tables.events(s, d)
          .groupBy($"event_type")
          .agg(percentile_approx($"value", array(lit(0.5), lit(0.9)),
            lit(10000)).as("p"))
          .select($"event_type", $"p".getItem(0).as("a50"),
            $"p".getItem(1).as("a90"))
        Tables.events(s, d)
          .join(broadcast(ap), Seq("event_type"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            (sum(when($"value" <= $"a50", 1L).otherwise(0L))
              / count(lit(1))).as("r50"),
            (sum(when($"value" <= $"a90", 1L).otherwise(0L))
              / count(lit(1))).as("r90"))
          .select($"event_type", $"n",
            ($"r50" >= 0.48 && $"r50" <= 0.52).as("p50_rank_ok"),
            ($"r90" >= 0.88 && $"r90" <= 0.92).as("p90_rank_ok"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
             |FROM events GROUP BY 1
             |ORDER BY event_type""".stripMargin)),

    Q("o35_bag_setops",
      "Bag (multiset) set ops: INTERSECT ALL / EXCEPT ALL keep " +
        "multiplicities (min/difference of per-value counts) — the ALL " +
        "variants Spark plans as aggregated joins, no row explosion.",
      (s, d) => {
        import s.implicits._
        val open = Tables.orders(s, d)
          .filter($"o_orderstatus" === "O").select($"o_custkey")
        val urgent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        val inter = open.intersectAll(urgent)
          .groupBy($"o_custkey").agg(count(lit(1)).as("n_inter"))
        val exc = open.exceptAll(urgent)
          .groupBy($"o_custkey").agg(count(lit(1)).as("n_except"))
        inter.join(exc, Seq("o_custkey"), "full_outer")
          .na.fill(0L, Seq("n_inter", "n_except"))
          // Digest (r8): per-key multiplicities are key-weighted — one
          // wrong bag count moves mass inside exactly one bucket.
          .groupBy(($"o_custkey" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"o_custkey").cast("long").as("sum_key"),
            sum($"n_inter").cast("long").as("sum_inter"),
            sum($"n_except").cast("long").as("sum_except"),
            sum(($"o_custkey" % 97) * ($"n_inter" * 1000 + $"n_except"))
              .cast("long").as("sig_bag"))
          .orderBy($"bucket")
      },
      Some("""WITH i AS (
             |  SELECT o_custkey, count(*) AS n_inter FROM (
             |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |    INTERSECT ALL
             |    SELECT o_custkey FROM orders
             |    WHERE o_orderpriority = '1-URGENT')
             |  GROUP BY o_custkey),
             |e AS (
             |  SELECT o_custkey, count(*) AS n_except FROM (
             |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |    EXCEPT ALL
             |    SELECT o_custkey FROM orders
             |    WHERE o_orderpriority = '1-URGENT')
             |  GROUP BY o_custkey),
             |bag AS (
             |  SELECT coalesce(i.o_custkey, e.o_custkey) AS o_custkey,
             |    coalesce(i.n_inter, 0) AS n_inter,
             |    coalesce(e.n_except, 0) AS n_except
             |  FROM i FULL OUTER JOIN e ON i.o_custkey = e.o_custkey)
             |SELECT CAST(o_custkey % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(o_custkey) AS BIGINT) AS sum_key,
             |  CAST(sum(n_inter) AS BIGINT) AS sum_inter,
             |  CAST(sum(n_except) AS BIGINT) AS sum_except,
             |  CAST(sum((o_custkey % 97) * (n_inter * 1000 + n_except))
             |    AS BIGINT) AS sig_bag
             |FROM bag GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("f22_null_suite",
      "Null-handling functions: nullif / coalesce / null-safe equality " +
        "(<=> ≡ IS NOT DISTINCT FROM) / nvl2-style routing — the NULL " +
        "algebra every pandas fillna/isna migration leans on (F-9).",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderkey",
            nullif($"o_orderstatus", lit("O")).as("status_nz"),
            coalesce(nullif($"o_orderstatus", lit("O")), lit("open"))
              .as("status_fill"),
            ($"o_orderstatus" <=> "O").as("is_open_nsafe"),
            when(nullif($"o_orderstatus", lit("O")).isNull, "open-route")
              .otherwise("other-route").as("nvl2_route"))
          // Digest (r8): the null count pins nullif, the string
          // signatures pin every produced value, the bool sum pins the
          // null-safe comparison — per key bucket.
          .groupBy(($"o_orderkey" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            count($"status_nz").as("n_nz"),
            sum(Digest.strSig($"status_nz")).as("sig_nz"),
            sum(Digest.strSig($"status_fill")).as("sig_fill"),
            sum($"is_open_nsafe".cast("long")).cast("long").as("n_open"),
            sum(Digest.strSig($"nvl2_route")).as("sig_route"))
          .orderBy($"bucket")
      },
      Some(s"""WITH t AS (
             |  SELECT o_orderkey,
             |    nullif(o_orderstatus, 'O') AS status_nz,
             |    coalesce(nullif(o_orderstatus, 'O'), 'open')
             |      AS status_fill,
             |    o_orderstatus IS NOT DISTINCT FROM 'O' AS is_open_nsafe,
             |    CASE WHEN nullif(o_orderstatus, 'O') IS NULL
             |      THEN 'open-route' ELSE 'other-route' END AS nvl2_route
             |  FROM orders)
             |SELECT CAST(o_orderkey % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  count(status_nz) AS n_nz,
             |  CAST(sum(${Digest.strSigSql("status_nz")}) AS BIGINT)
             |    AS sig_nz,
             |  CAST(sum(${Digest.strSigSql("status_fill")}) AS BIGINT)
             |    AS sig_fill,
             |  CAST(sum(CASE WHEN is_open_nsafe THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_open,
             |  CAST(sum(${Digest.strSigSql("nvl2_route")}) AS BIGINT)
             |    AS sig_route
             |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("d_simhash_hamming",
      "Dedup: SimHash → Hamming candidate pairs — bit_count(xor) over the " +
        "md5-portable 60-bit signatures, blocked by source group. " +
        "Completes the SimHash pipeline (signatures → candidates); the " +
        "oracle recomputes signatures in SQL from the same hash, so every " +
        "pair and distance matches bit-for-bit.",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter($"doc_id" < 200)
        val sigs = graft.dedup.Dedup
          .simhashSignatures(docs, "doc_id", "text", tokenHash = "md5")
          .withColumnRenamed("id", "doc_id")
          .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
          // exchange before the self-join so the mapPartitions signature
          // pass runs once per side-independent stage, not inside the join
          .repartition($"source")
        val a = sigs.select($"doc_id".as("a_id"), $"source",
          $"simhash".as("sig_a"))
        val b = sigs.select($"doc_id".as("b_id"), $"source",
          $"simhash".as("sig_b"))
        a.join(b, Seq("source")).filter($"a_id" < $"b_id")
          .withColumn("hamming",
            bit_count($"sig_a".bitwiseXOR($"sig_b")).cast("long"))
          .filter($"hamming" <= 20)
          .select($"a_id", $"b_id", $"hamming")
          .orderBy($"a_id", $"b_id")
      },
      Some(OracleGen.simhashHammingSql(maxDocId = 200, maxHamming = 20))),

    Q("f19_string_suite",
      "String-function surface: pad/reverse/repeat/translate/split_part/" +
        "regexp_extract — one codegen'd projection, cross-engine-identical " +
        "for ASCII.",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .select($"c_custkey",
            lpad($"c_name", 22, "*").as("padded_l"),
            rpad($"c_name", 22, "*").as("padded_r"),
            reverse($"c_name").as("rev"),
            repeat($"c_mktsegment", 2).as("seg2"),
            translate($"c_name", "#", "-").as("dashed"),
            split_part($"c_name", lit("#"), lit(2)).as("cust_num"),
            regexp_extract($"c_name", "(\\d+)", 1).as("digits"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  lpad(c_name, 22, '*') AS padded_l,
             |  rpad(c_name, 22, '*') AS padded_r,
             |  reverse(c_name) AS rev,
             |  repeat(c_mktsegment, 2) AS seg2,
             |  translate(c_name, '#', '-') AS dashed,
             |  split_part(c_name, '#', 2) AS cust_num,
             |  regexp_extract(c_name, '(\d+)', 1) AS digits
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("f18_map_ops",
      "Map-function surface: map_from_arrays/str_to_map construction, " +
        "element_at lookup, map_keys enumeration — MapType stays inside " +
        "the engine; the projection emits scalars so the oracle needs no " +
        "MAP type at all.",
      (s, d) => {
        import s.implicits._
        val m = map_from_arrays(array(lit("t"), lit("u")),
          array($"event_type", $"user_id".cast("string")))
        val cfg = str_to_map(lit("retries:3,region:eu"), lit(","), lit(":"))
        Tables.events(s, d)
          .select($"event_id",
            element_at(m, "t").as("type_val"),
            element_at(m, "u").as("uid_val"),
            size(m).cast("long").as("n_keys"),
            array_join(map_keys(m), ",").as("keys"),
            element_at(cfg, "retries").as("retries"))
          // Digest (r8): lookups are key-weighted string signatures;
          // constants (n_keys/keys/retries) collapse to exact sums.
          .groupBy(($"event_id" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(Digest.strSig($"type_val") % 100000L *
              ($"event_id" % 97)).cast("long").as("sig_type"),
            sum(Digest.strSig($"uid_val")).as("sig_uid"),
            sum($"n_keys").cast("long").as("sum_keys"),
            sum(Digest.strSig($"keys")).as("sig_keynames"),
            sum(Digest.strSig($"retries")).as("sig_retries"))
          .orderBy($"bucket")
      },
      Some(s"""WITH t AS (
             |  SELECT event_id, event_type AS type_val,
             |    CAST(user_id AS VARCHAR) AS uid_val,
             |    CAST(2 AS BIGINT) AS n_keys, 't,u' AS keys,
             |    '3' AS retries
             |  FROM events)
             |SELECT CAST(event_id % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(${Digest.strSigSql("type_val")} % 100000
             |    * (event_id % 97)) AS BIGINT) AS sig_type,
             |  CAST(sum(${Digest.strSigSql("uid_val")}) AS BIGINT)
             |    AS sig_uid,
             |  CAST(sum(n_keys) AS BIGINT) AS sum_keys,
             |  CAST(sum(${Digest.strSigSql("keys")}) AS BIGINT)
             |    AS sig_keynames,
             |  CAST(sum(${Digest.strSigSql("retries")}) AS BIGINT)
             |    AS sig_retries
             |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("f21_hof",
      "Higher-order-function surface: transform/filter/aggregate lambdas " +
        "over token arrays — exact integer outputs. (Interpreted, not " +
        "codegen'd: fine for array-per-row shapes; hot kernels use typed " +
        "passes or native expressions instead — see SCALE.md.)",
      (s, d) => {
        import s.implicits._
        val toks = split($"text", " ")
        Tables.documents(s, d)
          .select($"doc_id",
            aggregate(transform(toks, t => length(t)), lit(0),
              (acc, x) => acc + x).cast("long").as("sum_len"),
            size(filter(toks, t => length(t) > 4)).cast("long")
              .as("n_long"),
            array_max(transform(toks, t => length(t))).cast("long")
              .as("max_len"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(list_sum(list_transform(string_split(text, ' '),
             |    t -> length(t))) AS BIGINT) AS sum_len,
             |  CAST(len(list_filter(string_split(text, ' '),
             |    t -> length(t) > 4)) AS BIGINT) AS n_long,
             |  CAST(list_max(list_transform(string_split(text, ' '),
             |    t -> length(t))) AS BIGINT) AS max_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("stream_stream_join",
      "Stream-stream inner join: clicks ⋈ purchases within 5 minutes, " +
        "both sides watermarked file streams — the streaming form of the " +
        "banded interval join (same oracle as j8_range_join). Like the " +
        "batch `bandJoin`, the equi-key is (user_id, 5-min band) with the " +
        "click emitted at its band and the next: the symmetric hash join " +
        "probes only the 1-2 rows in the matching band instead of scanning " +
        "every buffered row for the user (a few-distinct-users stream " +
        "otherwise degenerates to an O(n²) per-key scan), and the exact " +
        "range predicate keeps the result identical — a (c,p) pair can " +
        "match at most one of the two bands.",
      (s, d) => {
        import s.implicits._
        val schema = Tables.eventsRaw(s, d).schema
        Streams.runToMemoryAppend(s,
            s"stream_ssj_${System.nanoTime()}") { scoped =>
            val ev = Tables.normalizeEventsTs(
              Streams.fileStream(scoped, s"$d/events.*", schema,
                maxFilesPerTrigger = Int.MaxValue))
            val bandUs = 300000000L // 5 minutes in microseconds
            val clicks = ev.filter(col("event_type") === "click")
              .select(col("user_id").as("c_uid"),
                col("event_id").as("click_id"), col("ts").as("c_ts"))
              .withColumn("band", explode(array(
                expr(s"unix_micros(c_ts) div $bandUs"),
                expr(s"unix_micros(c_ts) div $bandUs") + 1)))
              .withWatermark("c_ts", "1 hour")
            val purchases = ev.filter(col("event_type") === "purchase")
              .select(col("user_id").as("p_uid"),
                col("event_id").as("purchase_id"), col("ts").as("p_ts"))
              .withColumn("band", expr(s"unix_micros(p_ts) div $bandUs"))
              .withWatermark("p_ts", "1 hour")
            clicks.join(purchases,
              col("c_uid") === col("p_uid") &&
                clicks("band") === purchases("band") &&
                col("p_ts") > col("c_ts") &&
                col("p_ts") <= col("c_ts") + expr("interval 5 minutes"))
          }
          .select($"click_id", $"purchase_id",
            (unix_micros($"p_ts") - unix_micros($"c_ts")).as("gap_us"))
          .orderBy($"click_id", $"purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |  epoch_ns(p.ts) // 1000 - epoch_ns(c.ts) // 1000 AS gap_us
             |FROM events c JOIN events p
             |  ON c.user_id = p.user_id
             |  AND c.event_type = 'click' AND p.event_type = 'purchase'
             |  AND epoch_ns(p.ts) // 1000 > epoch_ns(c.ts) // 1000
             |  AND epoch_ns(p.ts) // 1000 - epoch_ns(c.ts) // 1000
             |      <= 300000000
             |ORDER BY click_id, purchase_id""".stripMargin)),

    Q("stream_session_window",
      "Streaming built-in session windows: session_window(ts, 6h) " +
        "aggregation (complete mode) — the declarative sibling of the " +
        "flatMapGroupsWithState sessionizer; per-user session/event " +
        "counts. Oracle uses session_window's merge rule (a gap of " +
        "EXACTLY 6h starts a new session: next < prev + gap merges).",
      (s, d) => {
        import s.implicits._
        val schema = Tables.eventsRaw(s, d).schema
        Streams.runToMemory(s,
            s"stream_sesswin_${System.nanoTime()}") { scoped =>
            val stream = Tables.normalizeEventsTs(
              Streams.fileStream(scoped, s"$d/events.*", schema,
                maxFilesPerTrigger = Int.MaxValue))
            stream.groupBy(col("user_id"),
                session_window(col("ts"), "6 hours"))
              .agg(count(lit(1)).as("n"))
          }
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum($"n").cast("long").as("n_events"))
          .orderBy($"user_id")
      },
      Some("""WITH marked AS (
             |  SELECT user_id,
             |    CASE WHEN prev_ts IS NULL
             |      OR epoch_us(ts) - epoch_us(prev_ts) >= 21600000000
             |      THEN 1 ELSE 0 END AS new_session
             |  FROM (SELECT user_id, ts,
             |          lag(ts) OVER (PARTITION BY user_id
             |            ORDER BY ts) AS prev_ts
             |        FROM events) t)
             |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             |  count(*) AS n_events
             |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("o36_explode",
      "Array explode with ordinal position (posexplode / UNNEST): one row " +
        "per token, 0-based position — generate-once flatten, fully " +
        "codegen'd (Generate node), no shuffle before the final sort.",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .filter($"doc_id" % 10 === 0)
          .select($"doc_id", posexplode(split($"text", " ")))
          .select($"doc_id", $"pos".cast("long").as("pos"),
            $"col".as("tok"))
          .orderBy($"doc_id", $"pos")
      },
      Some("""SELECT doc_id,
             |  CAST(generate_subscripts(string_split(text, ' '), 1) - 1
             |    AS BIGINT) AS pos,
             |  unnest(string_split(text, ' ')) AS tok
             |FROM documents WHERE doc_id % 10 = 0
             |ORDER BY doc_id, pos""".stripMargin)),

    Q("agg_corr",
      "Pearson correlation, engine-portable: NOT the corr() builtin " +
        "(whose running-moment accumulation order varies with partitioning" +
        ") — exact BIGINT power sums in one partial-aggregated pass, then " +
        "a single fixed-shape IEEE expression (cast/mul/sqrt/div) that is " +
        "bit-identical on any engine and any cluster size.",
      (s, d) => {
        import s.implicits._
        val x = $"l_quantity".cast("long")
        val y = $"l_linenumber".cast("long")
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x * y).as("sxy"), sum(x).as("sx"), sum(y).as("sy"),
            sum(x * x).as("sxx"), sum(y * y).as("syy"))
          .select($"l_returnflag", $"n",
            (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
                ($"n" * $"syy" - $"sy" * $"sy").cast("double")))
              .as("corr_qln"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH sums AS (
             |  SELECT l_returnflag, count(*) AS n,
             |    sum(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS
             |      BIGINT)) AS sxy,
             |    sum(CAST(l_quantity AS BIGINT)) AS sx,
             |    sum(CAST(l_linenumber AS BIGINT)) AS sy,
             |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS
             |      BIGINT)) AS sxx,
             |    sum(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS
             |      BIGINT)) AS syy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n,
             |  CAST(n * sxy - sx * sy AS DOUBLE) /
             |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
             |         CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qln
             |FROM sums ORDER BY l_returnflag""".stripMargin)),

    Q("o37_cross_join",
      "Explicit cartesian scaffold (CROSS JOIN): every region × every " +
        "order status — the dimension-scaffold shape (calendar × category)" +
        "; both sides tiny so the plan is a broadcast nested loop, never " +
        "a shuffled cartesian.",
      (s, d) => {
        import s.implicits._
        Tables.region(s, d).select($"r_name")
          .crossJoin(Tables.orders(s, d).select($"o_orderstatus").distinct())
          .orderBy($"r_name", $"o_orderstatus")
      },
      Some("""SELECT r_name, o_orderstatus
             |FROM region CROSS JOIN
             |  (SELECT DISTINCT o_orderstatus FROM orders)
             |ORDER BY r_name, o_orderstatus""".stripMargin))
  )
}
