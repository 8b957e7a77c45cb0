package graft.queries

import graft.Tables
import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A registered query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. Column
  * names and types are aligned on both sides (the driver compare sorts
  * columns by name and hashes values).
  */
final case class Q(name: String, doc: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

/** Star-schema phrasings of the reference's relational operator inventory
  * (SURVEY.md §2) — one named query per operator, each oracle-checked
  * against DuckDB. Determinism rules used throughout:
  *  - every query ends in an explicit ORDER BY on a unique key;
  *  - integer aggregates are cast to BIGINT on both sides;
  *  - double aggregates are rounded at the grid resolution of their exact
  *    value (2 decimals for sums of 2-decimal money, 4 for sums of
  *    price×discount products), which makes the Spark and DuckDB doubles
  *    bit-identical despite different summation orders.
  */
object StarQueries {

  def all: Seq[Q] = Seq(

    Q("q1_agg",
      "Flagship TPC-H Q1-style scan+agg: map-side partial aggregation, " +
        "filter pushed to parquet (ref dataflow: bin/concatenate.py:345-468 " +
        "global stats).",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          // string literal: analyzer casts it to the scan's timestamp type
          // (NTZ or LTZ), avoiding a hard-coded timestamp flavor
          .filter($"l_shipdate" <= lit("2000-12-01 00:00:00"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
             |  count(*) AS n_lines
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("s1_scan_pushdown",
      "S-1 (bin/concatenate.py:347): schema-explicit scan with projection " +
        "pruning + predicate pushdown to the parquet reader.",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity",
            $"l_returnflag")
          .filter($"l_quantity" <= 3)
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem WHERE l_quantity <= 3
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("o1_manifest_predicate",
      "O-1 (make_uuids_tsv.py:15-34): the ES bool-query as conjunctive " +
        "Spark filters (must / must / not-exists-null).",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderstatus" === "O" &&
            $"o_orderpriority" === "1-URGENT" && $"o_totalprice".isNotNull)
          .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
             |WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
             |  AND o_totalprice IS NOT NULL
             |ORDER BY o_orderkey""".stripMargin)),

    Q("o2_null_drop",
      "O-2 (make_directory.py:113): na.drop on a nullable joined key.",
      (s, d) => {
        import s.implicits._
        val urgent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey").distinct()
        Tables.customer(s, d)
          .join(urgent, $"c_custkey" === $"o_custkey", "left")
          .na.drop("any", Seq("o_custkey"))
          .select($"c_custkey", $"c_name", $"o_custkey")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, o_custkey
             |FROM customer LEFT JOIN
             |  (SELECT DISTINCT o_custkey FROM orders
             |   WHERE o_orderpriority = '1-URGENT') u
             |  ON c_custkey = o_custkey
             |WHERE o_custkey IS NOT NULL
             |ORDER BY c_custkey""".stripMargin)),

    Q("o3_leaf_filter_anti",
      "O-3 (bin/concatenate.py:339-342): leaf-dataset filter generalized " +
        "to an anti join (customers with no orders).",
      (s, d) => {
        import s.implicits._
        Relational.antiJoin(Tables.customer(s, d),
            Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT"),
            col("c_custkey") === col("o_custkey"))
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    Q("o4_column_prune",
      "O-4/O-8 (bin/concatenate.py:180-184,303): column removal — pruning " +
        "reaches the scan (ReadSchema shows 3 of 6 columns).",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d).drop("p_retailprice", "p_size", "p_type")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_name, p_brand FROM part
             |ORDER BY p_partkey""".stripMargin)),

    Q("o5_semi_isin",
      "O-5 (bin/concatenate.py:284-286): membership (isin) filter as a " +
        "left-semi join, then partial-aggregated.",
      (s, d) => {
        import s.implicits._
        Relational.semiJoin(Tables.lineitem(s, d),
            Tables.part(s, d).filter($"p_size" < 5),
            col("l_partkey") === col("p_partkey"))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 5)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("o6_membership_semi",
      "O-6 (bin/concatenate.py:318-320): label-membership semi join " +
        "(suppliers that appear in lineitem), counted per nation.",
      (s, d) => {
        import s.implicits._
        Relational.semiJoin(Tables.supplier(s, d), Tables.lineitem(s, d),
            col("s_suppkey") === col("l_suppkey"))
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n_suppliers"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n_suppliers FROM supplier
             |WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    Q("o7_channel_regex_filter",
      "O-7/F-5 (bin/concatenate.py:443-450): negated regex + negated " +
        "case-insensitive contains filter.",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .filter(!$"p_name".rlike("^(red|blue)") &&
            !lower($"p_name").contains("small"))
          .select($"p_partkey", $"p_name")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT regexp_matches(p_name, '^(red|blue)')
             |  AND lower(p_name) NOT LIKE '%small%'
             |ORDER BY p_partkey""".stripMargin)),

    Q("o20_outer_union",
      "O-20 (bin/concatenate.py:412): outer-aligned union — schema = union " +
        "of schemas, missing columns null-filled; shuffle-free. Output is " +
        "a per-bucket digest of the ~10k aligned rows (see Digest): " +
        "null counts pin the fill pattern, signatures pin every value.",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
        Relational.outerConcat(Seq(
          o.filter($"o_orderstatus" === "F")
            .select($"o_orderkey", $"o_totalprice"),
          o.filter($"o_orderstatus" === "O")
            .select($"o_orderkey", $"o_orderpriority")))
          .groupBy(($"o_orderkey" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"o_orderkey").cast("long").as("sum_key"),
            count($"o_totalprice").as("n_price"),
            sum(Digest.numSig($"o_totalprice", 100L)).as("sig_price"),
            count($"o_orderpriority").as("n_prio"),
            sum(Digest.strSig($"o_orderpriority")).as("sig_prio"))
          .orderBy($"bucket")
      },
      Some(s"""WITH u AS (
             |  SELECT o_orderkey, o_totalprice,
             |         CAST(NULL AS VARCHAR) AS o_orderpriority
             |  FROM orders WHERE o_orderstatus = 'F'
             |  UNION ALL
             |  SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
             |  FROM orders WHERE o_orderstatus = 'O')
             |SELECT CAST(o_orderkey % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
             |  count(o_totalprice) AS n_price,
             |  CAST(sum(${Digest.numSigSql("o_totalprice", 100L)})
             |    AS BIGINT) AS sig_price,
             |  count(o_orderpriority) AS n_prio,
             |  CAST(sum(${Digest.strSigSql("o_orderpriority")})
             |    AS BIGINT) AS sig_prio
             |FROM u GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("o22_block_diag_offsets",
      "O-22 (bin/concatenate.py:333-336,413-416): block-diagonal index " +
        "offsets — cumulative sum over tiny per-block sizes, then applied " +
        "per row (global id = block offset + dense in-block index).",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val sizes = cust.groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n"))
        val offsets = Relational.blockOffsets(sizes, "c_nationkey", "n",
          col("c_nationkey"), "off").select($"c_nationkey", $"off")
        val ranked = Relational.denseIndex(cust.select($"c_custkey",
            $"c_nationkey"), "rn", Seq(col("c_custkey")),
          Seq(col("c_nationkey")))
        ranked.join(offsets, Seq("c_nationkey"))
          .select($"c_custkey",
            ($"off" + $"rn").cast("long").as("global_idx"))
          .orderBy($"c_custkey")
      },
      Some("""WITH sz AS (SELECT c_nationkey, count(*) AS n FROM customer
             |            GROUP BY c_nationkey),
             |off AS (SELECT c_nationkey,
             |  COALESCE(SUM(n) OVER (ORDER BY c_nationkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
             |  FROM sz)
             |SELECT c_custkey,
             |  CAST(o + ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
             |    ORDER BY c_custkey) AS BIGINT) AS global_idx
             |FROM customer c JOIN off ON c.c_nationkey = off.c_nationkey
             |ORDER BY c_custkey""".stripMargin)),

    Q("o23_reindex_fill",
      "O-23 (bin/concatenate.py:419-421): reindex-with-fill — align an " +
        "annotation table to the full key universe, missing rows → NULL.",
      (s, d) => {
        import s.implicits._
        val ann = Tables.lineitem(s, d).filter($"l_quantity" >= 49)
          .groupBy($"l_partkey").agg(count(lit(1)).as("n_hits"))
        Relational.reindexFill(
            Tables.part(s, d).select($"p_partkey"),
            ann.withColumnRenamed("l_partkey", "p_partkey"),
            Seq("p_partkey"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, n_hits FROM part LEFT JOIN
             |  (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_hits
             |   FROM lineitem WHERE l_quantity >= 49 GROUP BY l_partkey) a
             |  ON p_partkey = l_partkey
             |ORDER BY p_partkey""".stripMargin)),

    Q("o24_intersect",
      "O-24 (bin/concatenate.py:250-254): set intersection of two " +
        "projections (distinct semantics).",
      (s, d) => {
        import s.implicits._
        val p = Tables.part(s, d)
        p.filter($"p_size" < 10).select($"p_brand")
          .intersect(p.filter($"p_size" > 35).select($"p_brand"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand FROM part WHERE p_size < 10
             |INTERSECT
             |SELECT p_brand FROM part WHERE p_size > 35
             |ORDER BY p_brand""".stripMargin)),

    Q("o24b_except",
      "Set difference (complement of O-24): distinct brands present among " +
        "small parts but absent among large ones.",
      (s, d) => {
        import s.implicits._
        val p = Tables.part(s, d)
        p.filter($"p_size" < 10).select($"p_brand")
          .except(p.filter($"p_size" > 35).select($"p_brand"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand FROM part WHERE p_size < 10
             |EXCEPT
             |SELECT p_brand FROM part WHERE p_size > 35
             |ORDER BY p_brand""".stripMargin)),

    Q("agg_rollup",
      "Beyond-reference agg surface: ROLLUP hierarchy — per (flag, " +
        "status), per flag, and grand total in one pass.",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
          .orderBy($"l_returnflag".asc_nulls_first,
            $"l_linestatus".asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST,
             |  l_linestatus NULLS FIRST""".stripMargin)),

    Q("q5_region_revenue",
      "Deep join chain (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem): " +
        "dimension tables broadcast, the fact table shuffles once. " +
        "Revenue accumulates in exact integer cents×basis-points (a " +
        "120k-term double sum differs across engines in the last decimal " +
        "— accumulation order), divided once at the end.",
      (s, d) => {
        import s.implicits._
        val dims = broadcast(Tables.region(s, d)
          .join(Tables.nation(s, d), $"r_regionkey" === $"n_regionkey"))
        val cust = Tables.customer(s, d)
          .join(dims, $"c_nationkey" === $"n_nationkey")
        val revScaled = round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .groupBy($"r_name")
          .agg((sum(revScaled) / 10000.0).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name,
             |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
             |    (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
             |    AS BIGINT) / 10000.0 AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    Q("agg_percentile",
      "Beyond-reference agg surface: exact interpolated percentiles — " +
        "quartile fractions over integer-grid values are exactly " +
        "representable, so the interpolation is bit-identical across " +
        "engines (arbitrary p would not be).",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_quantity, 0.25)").as("p25_qty"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.25) AS p25_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    Q("agg_cube",
      "Beyond-reference agg surface: CUBE over (flag, status) with " +
        "GROUPING indicators — all four grouping sets in one pass " +
        "(partial aggregation expands grouping sets map-side, one " +
        "shuffle).",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"),
            grouping($"l_returnflag").cast("long").as("g_flag"),
            grouping($"l_linestatus").cast("long").as("g_status"))
          .orderBy($"l_returnflag".asc_nulls_first,
            $"l_linestatus".asc_nulls_first, $"g_flag", $"g_status")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  sum(l_quantity) AS sum_qty,
             |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
             |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST,
             |  l_linestatus NULLS FIRST, g_flag, g_status""".stripMargin)),

    Q("o31_full_outer",
      "Join-type surface: FULL OUTER alignment of two per-nation " +
        "aggregates — the two-sided generalization of O-23's " +
        "reindex-with-fill (either side may be missing → NULL).",
      (s, d) => {
        import s.implicits._
        val supp = Tables.supplier(s, d).filter($"s_acctbal" > 5000)
          .groupBy($"s_nationkey".as("nationkey"))
          .agg(count(lit(1)).as("n_rich_supp"))
        val cust = Tables.customer(s, d)
          .filter($"c_mktsegment" === "BUILDING")
          .groupBy($"c_nationkey".as("nationkey"))
          .agg(count(lit(1)).as("n_building_cust"))
        supp.join(cust, Seq("nationkey"), "full_outer")
          .orderBy($"nationkey")
      },
      Some("""SELECT coalesce(s.sk, c.ck) AS nationkey,
             |  n_rich_supp, n_building_cust
             |FROM (SELECT s_nationkey AS sk, count(*) AS n_rich_supp
             |      FROM supplier WHERE s_acctbal > 5000
             |      GROUP BY s_nationkey) s
             |FULL OUTER JOIN
             |     (SELECT c_nationkey AS ck, count(*) AS n_building_cust
             |      FROM customer WHERE c_mktsegment = 'BUILDING'
             |      GROUP BY c_nationkey) c
             |ON s.sk = c.ck
             |ORDER BY nationkey""".stripMargin)),

    Q("o30_stratified_sample",
      "Beyond-reference sampling: deterministic per-stratum hash sample — " +
        "md5-derived [0,100) bucket per row, per-returnflag rate " +
        "(A:5%, N:10%, else 20%). Reproducible on any engine and any " +
        "cluster size (no RNG state), a pure scan-side filter at 100 TB.",
      (s, d) => {
        import s.implicits._
        val bucket = graft.functions.text.md5_prefix64(
          concat_ws("-", $"l_orderkey", $"l_linenumber"), 15) % 100
        val rate = when($"l_returnflag" === "A", 5)
          .when($"l_returnflag" === "N", 10).otherwise(20)
        Tables.lineitem(s, d)
          .filter(bucket < rate)
          // Digest (r8): exact sampled-set membership per stratum — the
          // weighted key sum flips if any row is wrongly in/out.
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum($"l_orderkey" * 8 + $"l_linenumber").cast("long")
              .as("sig_keys"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(sum(l_orderkey * 8 + l_linenumber) AS BIGINT)
             |    AS sig_keys
             |FROM lineitem
             |WHERE CAST(concat('0x', substr(md5(
             |    CAST(l_orderkey AS VARCHAR) || '-' ||
             |    CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
             |  % 100 <
             |  CASE l_returnflag WHEN 'A' THEN 5 WHEN 'N' THEN 10
             |    ELSE 20 END
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("o25_collect_list",
      "O-25 (bin/concatenate.py:251,342): column-to-list collect per " +
        "group, deterministically sorted, joined to a string.",
      (s, d) => {
        import s.implicits._
        Tables.nation(s, d).join(Tables.region(s, d),
            $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(concat_ws(",", sort_array(collect_list($"n_name")))
            .as("nations"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name,
             |  string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    Q("o26_row_count",
      "O-26 (bin/concatenate.py:435): global row count.",
      (s, _d) => {
        Tables.lineitem(s, _d).agg(count(lit(1)).as("n_rows"))
      },
      Some("SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem")),

    Q("j1_patient_join",
      "J-1 (bin/concatenate.py:300-307): inner equi join against the tiny " +
        "manifest — explicitly broadcast, then aggregated per segment.",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            round(sum($"o_totalprice"), 2).as("revenue"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("j3_alias_normalize",
      "J-3 (bin/concatenate.py:74-81): case/trim-insensitive alias lookup " +
        "with identity fallback (coalesce over a broadcast alias table).",
      (s, d) => {
        import s.implicits._
        val aliases = Seq(("america", "AMER"), ("europe", "EUR"))
          .toDF("alias_lower", "canonical")
        Relational.aliasNormalize(Tables.region(s, d), "r_name", aliases,
            "r_code")
          .select($"r_regionkey", $"r_name", $"r_code")
          .orderBy($"r_regionkey")
      },
      Some("""SELECT r_regionkey, r_name,
             |  COALESCE(canonical, r_name) AS r_code
             |FROM region LEFT JOIN
             |  (VALUES ('america','AMER'), ('europe','EUR'))
             |    AS a(alias_lower, canonical)
             |  ON lower(trim(r_name)) = alias_lower
             |ORDER BY r_regionkey""".stripMargin)),

    Q("j4_first_match",
      "J-4 (bin/concatenate.py:195-221): first-match annotation join — " +
        "pandas .values[0] made deterministic with a per-key window; one " +
        "window pass replaces the reference's quadratic per-key loc scan.",
      (s, d) => {
        import s.implicits._
        Relational.firstMatchPerKey(Tables.lineitem(s, d), Seq("l_partkey"),
            Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
          .select($"l_partkey", $"l_orderkey", $"l_linenumber",
            $"l_shipdate".cast("date").as("first_ship"))
          .orderBy($"l_partkey")
      },
      Some("""SELECT l_partkey, l_orderkey, l_linenumber,
             |  CAST(l_shipdate AS DATE) AS first_ship
             |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
             |        ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
             |      FROM lineitem) t
             |WHERE rn = 1 ORDER BY l_partkey""".stripMargin)),

    Q("j5_positional_index",
      "J-5 (bin/concatenate.py:322-329): positional index join — explicit " +
        "row_number index replacing pandas positional order, joined to " +
        "per-key counts.",
      (s, d) => {
        import s.implicits._
        val idx = Relational.denseIndex(
            Tables.supplier(s, d).select($"s_suppkey"), "idx",
            Seq(col("s_suppkey")))
          .withColumn("idx", $"idx".cast("long"))
        val counts = Tables.lineitem(s, d).groupBy($"l_suppkey")
          .agg(count(lit(1)).as("n_items"))
        idx.join(counts, $"s_suppkey" === $"l_suppkey")
          .select($"idx", $"s_suppkey", $"n_items")
          .orderBy($"idx")
      },
      Some("""SELECT idx, s_suppkey, n_items FROM
             |  (SELECT CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) AS BIGINT)
             |     AS idx, s_suppkey FROM supplier) s
             |JOIN (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items
             |      FROM lineitem GROUP BY l_suppkey) l
             |  ON s_suppkey = l_suppkey
             |ORDER BY idx""".stripMargin)),

    Q("f1_regex_strip",
      "F-1 (bin/concatenate.py:63-71): chained regexp_replace " +
        "normalization (prefix/suffix strip).",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select($"p_partkey",
            regexp_replace(
              regexp_replace($"p_name", "^(red|blue|green|hot|small) ", ""),
              "(bolt|gear)$", "part").as("clean_name"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  regexp_replace(
             |    regexp_replace(p_name, '^(red|blue|green|hot|small) ',
             |                   '', 'g'),
             |    '(bolt|gear)$', 'part', 'g') AS clean_name
             |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("f2_norm_key",
      "F-2 (bin/concatenate.py:74-81): lower(trim()) key normalization + " +
        "distinct.",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select(lower(trim($"p_type")).as("type_norm")).distinct()
          .orderBy($"type_norm")
      },
      Some("""SELECT DISTINCT lower(trim(p_type)) AS type_norm FROM part
             |ORDER BY type_norm""".stripMargin)),

    Q("f4_concat_key",
      "F-4 (bin/concatenate.py:273-275): composite key via concat_ws. " +
        "Output digests the 60k generated key strings per partkey bucket " +
        "— sig_key is a sum over md5 signatures of every exact key " +
        "string, so a single malformed key flips the digest.",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select(concat_ws("-", $"l_orderkey", $"l_linenumber")
            .as("line_key"), $"l_partkey")
          .groupBy(($"l_partkey" % 16).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(Digest.strSig($"line_key")).as("sig_key"),
            countDistinct($"line_key").as("n_keys"))
          .orderBy($"bucket")
      },
      Some(s"""SELECT CAST(l_partkey % 16 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(${Digest.strSigSql(
                  "concat_ws('-', l_orderkey, l_linenumber)")})
             |    AS BIGINT) AS sig_key,
             |  count(DISTINCT concat_ws('-', l_orderkey, l_linenumber))
             |    AS n_keys
             |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("f7_cast_string",
      "F-7 (bin/concatenate.py:409,439-440): whole-column cast to string " +
        "(NULL-preserving, unlike pandas's 'nan' stringification — " +
        "documented divergence).",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select($"p_partkey", $"p_partkey".cast("string").as("key_str"),
            $"p_size".cast("string").as("size_str"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, CAST(p_partkey AS VARCHAR) AS key_str,
             |  CAST(p_size AS VARCHAR) AS size_str
             |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("f8_json_extract_cast",
      "F-8/F-14 (make_uuids_tsv.py:77-94; bin/concatenate.py:305): nested " +
        "JSON field extraction + string→numeric cast.",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_id",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy(($"event_id" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"), count($"k").as("n_k"),
            sum($"k").cast("long").as("sum_k"),
            sum($"event_id" * $"k").cast("long").as("sum_idk"))
          .orderBy($"bucket")
      },
      Some("""SELECT CAST(event_id % 8 AS BIGINT) AS bucket,
             |  count(*) AS n, count(k) AS n_k,
             |  CAST(sum(k) AS BIGINT) AS sum_k,
             |  CAST(sum(event_id * k) AS BIGINT) AS sum_idk
             |FROM (SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM events) GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("f11_time_trunc",
      "F-11 (bin/concatenate.py:433): timestamp handling — per-day " +
        "truncation + aggregation.",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(date_trunc("day", $"ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
          .orderBy($"day")
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             |  count(*) AS n, round(sum(value), 2) AS total
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("f13_donor_pivot",
      "F-13 (make_uuids_tsv.py:105-156): long→wide pivot with a fixed " +
        "pivot-value list (static schema, no distinct-collect job).",
      (s, d) => {
        import s.implicits._
        val types = Seq("click", "view", "purchase", "signup", "error")
        Relational.pivotCount(Tables.events(s, d), "user_id", "event_type",
            types)
          .na.fill(0L, types)
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
             |  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS click,
             |  CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS view,
             |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS purchase,
             |  CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS signup,
             |  CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS error
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("f15_dict_lookup",
      "F-15 (make_uuids_tsv.py:160-163): broadcast map lookup " +
        "(organ code → description analog).",
      (s, d) => {
        import s.implicits._
        val m = map(
          lit("AFRICA"), lit("AF"), lit("AMERICA"), lit("AM"),
          lit("ASIA"), lit("AS"), lit("EUROPE"), lit("EU"),
          lit("MIDDLE EAST"), lit("ME"))
        Tables.region(s, d)
          .select($"r_regionkey", $"r_name",
            element_at(m, $"r_name").as("code"))
          .orderBy($"r_regionkey")
      },
      Some("""SELECT r_regionkey, r_name,
             |  CASE r_name WHEN 'AFRICA' THEN 'AF' WHEN 'AMERICA' THEN 'AM'
             |    WHEN 'ASIA' THEN 'AS' WHEN 'EUROPE' THEN 'EU'
             |    WHEN 'MIDDLE EAST' THEN 'ME' END AS code
             |FROM region ORDER BY r_regionkey""".stripMargin)),

    Q("lim_topk",
      "§2.6 limits: deterministic top-k (TakeOrderedAndProject — " +
        "per-partition heaps, no global sort).",
      (s, d) => {
        import s.implicits._
        Relational.topK(Tables.orders(s, d), 10,
            Seq(col("o_totalprice").desc, col("o_orderkey")))
          .select($"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 10""".stripMargin)),

    Q("agg_stats",
      "§2.4 note: the wider agg surface the engine exposes beyond the " +
        "reference's count/first (min/max/distinct-count/sum).",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(min($"l_quantity").as("min_qty"),
            max($"l_extendedprice").as("max_price"),
            countDistinct($"l_orderkey").as("n_orders"),
            round(sum($"l_discount"), 2).as("sum_disc"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, min(l_quantity) AS min_qty,
             |  max(l_extendedprice) AS max_price,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
             |  round(sum(l_discount), 2) AS sum_disc
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    Q("o21_horizontal_pivot",
      "O-21 (bin/concatenate.py:407-408): horizontal concat as a wide " +
        "pivot — one scalar per (row, pivot-value); min() as the " +
        "deterministic first()-analog.",
      (s, d) => {
        import s.implicits._
        val types = Seq("click", "view", "purchase", "signup", "error")
        Tables.events(s, d)
          .groupBy($"user_id")
          .pivot("event_type", types)
          .agg(min($"value"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
             |  min(CASE WHEN event_type='click' THEN value END) AS click,
             |  min(CASE WHEN event_type='view' THEN value END) AS view,
             |  min(CASE WHEN event_type='purchase' THEN value END)
             |    AS purchase,
             |  min(CASE WHEN event_type='signup' THEN value END) AS signup,
             |  min(CASE WHEN event_type='error' THEN value END) AS error
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("f12_json_construct",
      "F-12 (bin/concatenate.py:163-177): metadata dict/JSON construction " +
        "as named_struct → to_json.",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderkey",
            to_json(struct($"o_orderkey", $"o_orderstatus")).as("meta"))
          .groupBy(($"o_orderkey" % 8).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(Digest.strSig($"meta")).as("sig_meta"))
          .orderBy($"bucket")
      },
      Some(s"""SELECT CAST(o_orderkey % 8 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(${Digest.strSigSql(
                  """to_json(struct_pack(o_orderkey := o_orderkey,
                    |    o_orderstatus := o_orderstatus))""".stripMargin)})
             |    AS BIGINT) AS sig_meta
             |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("w_running_sum",
      "§2.5 window analogue (bin/concatenate.py:327-336): running " +
        "per-partition cumulative sum with a fully deterministic frame.",
      (s, d) => {
        import s.implicits._
        // (shipdate, orderkey, linenumber) is NOT unique in the generated
        // data (175 duplicate triples at sf0.1) — a running sum over a
        // non-total order is engine-order-dependent. Adding l_quantity
        // makes any remaining ties interchangeable for the prefix sum, so
        // the result is deterministic on every engine.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_quantity")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        Tables.lineitem(s, d)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            sum($"l_quantity").over(w).as("running_qty"))
          // Digest (r8): the prefix sum at EVERY row is pinned by an
          // order-insensitive integer sum — any mis-ordered window frame
          // changes some prefix and flips sig_run for its bucket.
          .groupBy(($"l_suppkey" % 16).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"l_orderkey").cast("long").as("sum_key"),
            sum(Digest.numSig($"running_qty", 100L)).as("sig_run"))
          .orderBy($"bucket")
      },
      Some(s"""WITH w AS (
             |  SELECT l_suppkey, l_orderkey,
             |    SUM(l_quantity) OVER (PARTITION BY l_suppkey
             |      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS running_qty
             |  FROM lineitem)
             |SELECT CAST(l_suppkey % 16 AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  CAST(sum(l_orderkey) AS BIGINT) AS sum_key,
             |  CAST(sum(${Digest.numSigSql("running_qty", 100L)})
             |    AS BIGINT) AS sig_run
             |FROM w GROUP BY bucket ORDER BY bucket""".stripMargin)),

    Q("agg_approx_distinct",
      "Scale-path sketch aggregation: approx_count_distinct (HLL++) — the " +
        "100 TB substitute for exact distinct counts. The sketch estimate " +
        "is engine-specific, so the query exports an ERROR ENVELOPE the " +
        "oracle can check exactly: the exact distinct counts plus a " +
        "boolean per sketch asserting |estimate − exact| ≤ 10% · exact " +
        "(2× the default 5% rsd) — the oracle expects TRUE.",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_partkey").as("ap"),
            countDistinct($"l_partkey").as("exact_parts"),
            approx_count_distinct($"l_orderkey").as("ao"),
            countDistinct($"l_orderkey").as("exact_orders"))
          .select($"l_returnflag", $"exact_parts", $"exact_orders",
            (abs($"ap" - $"exact_parts") <= $"exact_parts" * 0.10)
              .as("parts_within_10pct"),
            (abs($"ao" - $"exact_orders") <= $"exact_orders" * 0.10)
              .as("orders_within_10pct"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             |  TRUE AS parts_within_10pct,
             |  TRUE AS orders_within_10pct
             |FROM lineitem GROUP BY 1
             |ORDER BY l_returnflag""".stripMargin)),

    Q("q3_top_orders",
      "Headline 3-way join: broadcast dim ⋈ fact ⋈ fact with grouped " +
        "revenue and deterministic top-k.",
      (s, d) => {
        import s.implicits._
        val bldg = Tables.customer(s, d)
          .filter($"c_mktsegment" === "BUILDING")
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(bldg), $"o_custkey" === $"c_custkey")
          .groupBy($"o_orderkey")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
            .as("revenue"))
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 4)
             |    AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey
             |ORDER BY revenue DESC, o_orderkey
             |LIMIT 10""".stripMargin))
  )
}
