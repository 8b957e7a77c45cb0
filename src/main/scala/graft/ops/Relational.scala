package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators from the reference inventory (SURVEY.md §2),
  * each a pure DataFrame transformer. These are scale-first re-expressions:
  * broadcast the provably-small side, keep aggregation partial (map-side
  * combine comes free from Catalyst HashAggregate), and make every implicit
  * pandas row-order explicit with window `row_number` (SURVEY.md §2.6).
  */
object Relational {

  /** O-3 analog (`bin/concatenate.py:339-342`): keep left rows with no match
    * in `right` — the "leaf dataset" filter generalized to an anti join.
    * At scale: Catalyst plans a broadcast anti join when `right` is small.
    */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** O-5/O-6 (`bin/concatenate.py:284-286,318-320`): membership (isin)
    * filter expressed as a left-semi join — never a driver-side collected
    * list, so it scales to membership sets of any size.
    */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** J-3 (`bin/concatenate.py:74-81`): alias normalization — map a dirty key
    * through a (alias_lower → canonical) table, identity when absent.
    * `aliases` must have columns (alias_lower, canonical); it is broadcast
    * (alias dictionaries are tiny by construction).
    */
  def aliasNormalize(df: DataFrame, keyCol: String, aliases: DataFrame,
                     outCol: String): DataFrame = {
    // fresh internal names so repeated application (or a self-join of two
    // normalized frames) never trips ambiguous-attribute detection
    val a = aliases.select(lower(trim(col("alias_lower")))
      .as("__gr_alias"), col("canonical").as("__gr_canon"))
    df.join(broadcast(a), lower(trim(col(keyCol))) === col("__gr_alias"),
        "left")
      .withColumn(outCol, coalesce(col("__gr_canon"), col(keyCol)))
      .drop("__gr_alias", "__gr_canon")
  }

  /** J-4 (`bin/concatenate.py:195-221`): first-match annotation join. The
    * reference takes `.values[0]` of all matches; Spark DataFrames are
    * unordered so "first" is made deterministic by `orderCols`. One window
    * partitioned by the join key replaces the reference's O(n) loc-scan per
    * key (quadratic in channels).
    */
  def firstMatchPerKey(df: DataFrame, keyCols: Seq[String],
                       orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** J-5 (`bin/concatenate.py:322-329`): positional index assignment — the
    * explicit replacement for pandas's free positional order. Assigns a
    * dense 1-based index over `orderCols`. A global window (no partition)
    * serializes through one task, so callers partition first when the frame
    * is large; for per-dataset label files partition by the dataset key.
    */
  def denseIndex(df: DataFrame, idxCol: String, orderCols: Seq[Column],
                 partitionCols: Seq[Column] = Nil): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(orderCols: _*)
      else Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(idxCol, row_number().over(w))
  }

  /** O-20 (`bin/concatenate.py:412`): outer-aligned union — rows appended,
    * schema = union of schemas, missing columns null-filled. Shuffle-free.
    */
  def outerConcat(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** O-22 (`bin/concatenate.py:333-336,413-416`): block-diagonal offsets.
    * Given per-block sizes (blockKey, n), computes each block's starting
    * offset = cumulative sum of preceding block sizes (block order =
    * `orderCol`). The sizes table is tiny (one row per block/dataset) so the
    * window sort is negligible and the result is broadcast back to edges.
    */
  def blockOffsets(sizes: DataFrame, blockKey: String, nCol: String,
                   orderCol: Column, offsetCol: String): DataFrame = {
    val w = Window.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    sizes.withColumn(offsetCol,
      coalesce(sum(col(nCol)).over(w), lit(0L)).cast("long"))
  }

  /** O-23 (`bin/concatenate.py:419-421`): reindex-with-fill — align an
    * annotation table to a final key universe; missing rows become NULL.
    */
  def reindexFill(universe: DataFrame, annotations: DataFrame,
                  keys: Seq[String]): DataFrame =
    universe.join(annotations, keys, "left")

  /** F-13 (`make_uuids_tsv.py:105-156`): long → wide pivot with a fixed,
    * explicitly-provided pivot-value list. Passing the values avoids the
    * extra distinct-collect job Spark otherwise runs, and keeps the output
    * schema static (a requirement for streaming and for plan caching).
    */
  def pivotCount(df: DataFrame, rowKey: String, pivotCol: String,
                 values: Seq[String]): DataFrame =
    df.groupBy(col(rowKey)).pivot(pivotCol, values).agg(count(lit(1)))

  /** Skew-safe equi join: salt the skewed (left) side's key into
    * `saltBuckets` sub-keys and explode the build (right) side once per
    * salt, so one hot key spreads over `saltBuckets` reducers. AQE's
    * skew-join split handles most cases at runtime; explicit salting is
    * for the pathological keys AQE can't split (single-key hot spots in
    * a sort-merge join) and for engines/pipelines with AQE off.
    * `right` must be the smaller side (it is replicated ×saltBuckets).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** §2.6: deterministic top-k — ORDER BY + LIMIT with a unique tiebreak
    * column so results are stable across engines and runs. Spark executes
    * this as TakeOrderedAndProject: per-partition heaps, no full sort.
    */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** As-of join (beyond-reference operator): for every left row, attach the
    * `valueCols` of the LATEST right row with the same `keys` whose
    * `rightTs` is before (`strict = true`) or at-or-before the left row's
    * `leftTs`. Left rows with no eligible right row keep NULLs (left-outer
    * as-of).
    *
    * Spark-first design: instead of a range join (which explodes to
    * O(left × right) per key before filtering), both sides are UNIONED and
    * processed with ONE window over (keys) ordered by (ts, side):
    * `last(value, ignoreNulls)` over the strictly-preceding frame is
    * exactly "most recent earlier right row". Cost = one shuffle on `keys`
    * + one sort per partition — the merge-join shape an as-of join should
    * have at 100 TB. Equal timestamps: with `strict` the left row sorts
    * BEFORE same-ts right rows (they are invisible); non-strict sorts them
    * after. `rightTieBreak` makes the pick among equal-ts right rows
    * deterministic.
    */
  /** J-2 (`bin/concatenate.py:233-235`): scalar lookup with the
    * reference's `.item()` contract — a key matching MORE than one lookup
    * row is a data error and must fail loudly, not silently pick one.
    * Executed distributed: per-key counts ride the broadcast lookup and a
    * codegen'd `raise_error` fires on the first ambiguous key touched.
    * Missing keys stay NULL (left outer), as `.loc[...]` before `.item()`
    * would raise separately on emptiness — callers decide null policy.
    */
  def strictLookup(left: DataFrame, lookup: DataFrame, key: String,
                   valueCol: String): DataFrame = {
    val counted = lookup.groupBy(col(key))
      .agg(first(col(valueCol)).as(valueCol), count(lit(1)).as("__n"))
    left.join(broadcast(counted), Seq(key), "left")
      .withColumn(valueCol,
        when(col("__n") > 1, raise_error(concat(
          lit("strictLookup: key "), col(key).cast("string"),
          lit(s" has multiple '$valueCol' matches"))))
          .otherwise(col(valueCol)))
      .drop("__n")
  }

  /** F-8 (`bin/concatenate.py:305`): the reference's `pd.to_numeric`
    * RAISES on unparseable input where Spark's cast silently yields NULL —
    * this cast keeps the raise semantics: null stays null, garbage fails
    * the job with the offending value in the message.
    */
  def strictCast(c: Column, to: String): Column =
    when(c.isNotNull && c.cast(to).isNull,
      raise_error(concat(lit(s"strictCast($to) failed for value: "), c)))
      .otherwise(c.cast(to))

  /** Banded interval join (beyond-reference): pairs (l, r) with the same
    * `keys` and 0 < r.ts − l.ts ≤ maxGap. A naive theta join explodes to
    * O(|l|×|r|) per key before filtering; bucketing both sides into
    * `maxGap`-wide time bands turns it into an equi join — the left side
    * is replicated to its band and the next (a qualifying right row lands
    * in exactly one of the two), then the exact range predicate filters
    * within the ~2-band candidate set. One shuffle on (keys, band); no
    * duplicate pairs by construction (each right row has one band).
    */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTsUs: String, rightTsUs: String,
               maxGapUs: Long): DataFrame = {
    val l = left.withColumn("__band",
      explode(array(expr(s"$leftTsUs div $maxGapUs"),
        expr(s"$leftTsUs div $maxGapUs") + 1)))
    val r = right.withColumn("__band", expr(s"$rightTsUs div $maxGapUs"))
    l.join(r, keys :+ "__band")
      .filter(col(rightTsUs) > col(leftTsUs) &&
        col(rightTsUs) - col(leftTsUs) <= maxGapUs)
      .drop("__band")
  }

  /** Interval-containment join (beyond-reference): each point row paired
    * with every interval row whose `[startTs, endTs)` window contains its
    * `pointTs` — NO equi key. Spark plans a bare non-equi join as
    * BroadcastNestedLoopJoin (O(|points|·|intervals|) comparisons and a
    * whole-side broadcast — both fatal at scale); bucketizing turns it
    * into an equi join: each point lands in exactly ONE
    * `bucketSeconds`-wide bucket, each interval replicates to every
    * bucket its span overlaps (`sequence` over the bucket range —
    * `bandJoin`'s fixed two-band trick generalized to variable-length
    * intervals), and the exact range predicate filters the per-bucket
    * candidates. One shuffle on the bucket; no duplicate pairs by
    * construction (a point has one bucket, an interval covers it once).
    * Interval replication is `len/bucketSeconds + 1` rows — pick the
    * bucket near the TYPICAL interval length so replication stays O(1)
    * per interval while per-bucket candidate sets stay small. Empty
    * (`endTs` ≤ `startTs`) intervals and NULL endpoints drop out, exactly
    * as they would under the naive predicate.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointTs: String, startTs: String, endTs: String,
                   bucketSeconds: Long): DataFrame =
    intervalJoinImpl(points, intervals, pointTs, startTs, endTs,
      bucketSeconds)

  /** Internal working-column names injected (and dropped) by the
    * interval/grid joins. Caller frames must not already use them —
    * a collision would be silently clobbered/dropped, so the joins
    * reject it up front (the explicit-failure style of the rest of
    * this file). */
  private val reservedCols =
    Seq("__iw", "__ibkt", "__tier", "__tiers", "__ltier", "__rtier",
      "__occ", "__skx", "__sky", "__skb", "__skxn", "__my", "__gy",
      "__by", "__laty")

  private def requireNoReserved(df: DataFrame, side: String): Unit = {
    val hit = df.columns.intersect(reservedCols)
    require(hit.isEmpty,
      s"$side contains reserved internal column(s) ${hit.mkString(",")}" +
        " — rename before calling the interval/grid joins")
  }

  // Bucket arithmetic runs at FULL microsecond precision (Spark's
  // timestamp resolution): a whole-second truncation would compute
  // an interval ending at hh:00:00.500 as closing in the PREVIOUS
  // bucket and silently drop its sub-second tail from the candidate
  // set. unix_micros needs TIMESTAMP — the hop from NTZ (the parquet
  // default) is exact and monotone under the pinned UTC session
  // zone, and bucketing only needs a monotone epoch map consistent
  // across the columns (the exact predicate always compares the
  // ORIGINAL columns).
  private def usOf(c: String): Column =
    unix_micros(col(c).cast("timestamp"))

  /** Home tier of a span: the smallest t ≥ 20 with span ≤ 2^t µs
    * (tier 20 ≈ 1.05 s is the width floor). Pure per-row integer
    * arithmetic — length(bin(x)) is bitlen(x) for x ≥ 1, and
    * bitlen(span−1) is exactly ⌈log2 span⌉ for span ≥ 2. */
  private def tierOf(spanUs: Column): Column =
    greatest(lit(20), length(bin(spanUs - 1L))).cast("int")

  /** Bucket index of epoch-µs x in tier t: floor(x / 2^t) as an
    * ARITHMETIC right shift — exact floor division at any magnitude,
    * negative (pre-1970) epochs included. */
  private def bktOf(x: Column, tier: Column): Column =
    call_function("shiftright", x, tier)

  /** [[intervalJoin]] with the bucket layout DERIVED IN-PLAN from the
    * interval-span distribution — SPAN-TIERED power-of-two bucketing
    * (the multi-resolution grid form of the classic interval-tree /
    * segment-tree decomposition): every interval lands in its HOME
    * tier t = ⌈log2 span⌉ (clamped ≥ 20, i.e. a ~1 s width floor),
    * where its span covers at most 2 buckets of width 2^t µs BY
    * CONSTRUCTION; points replicate to every DISTINCT home tier
    * present (a broadcast 1-row collect_set — at most 44 tiers
    * mathematically, 1-3 on real data) and meet each interval in
    * exactly one (tier, bucket) key. Unlike the previous max-span
    * single width, ONE year-long outlier among hour-long intervals
    * now occupies its own coarse tier instead of inflating every
    * bucket toward cartesian candidate volume: a tier's intervals
    * have spans within 2× of its bucket width, so per-bucket interval
    * occupancy tracks LOCAL density, never the global max span.
    * Degradation is observable: the bucketized interval branch
    * carries an `interval_occupancy` observe (max intervals per
    * bucket + replicated rows + max tier) surfaced through the
    * standard QueryExecutionListener channel (Bench aggregates it
    * into BENCH_FULL.json). The join result is layout-INVARIANT;
    * only the plan shape moves — the IEJoin oracle pins that.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointTs: String, startTs: String,
                   endTs: String): DataFrame =
    tieredContainmentJoin(points, intervals, pointTs, startTs, endTs,
      "interval_occupancy")

  private def tieredContainmentJoin(points: DataFrame,
                                    intervals: DataFrame,
                                    pointTs: String, startTs: String,
                                    endTs: String,
                                    obsName: String): DataFrame = {
    require(points.columns.intersect(intervals.columns).isEmpty,
      "points/intervals column names must be disjoint")
    requireNoReserved(points, "points")
    requireNoReserved(intervals, "intervals")
    val live = intervals.filter(col(endTs) > col(startTs))
    val ivT = live.withColumn("__tier",
      tierOf(usOf(endTs) - usOf(startTs)))
    // in-plan tier universe (the inPlanCap pattern): a broadcast 1-row
    // aggregate — no construction-time job. NOTE the intervals subtree
    // is evaluated twice in the final plan (tier-set agg + join side);
    // the interval side is the small side of this join by contract
    // (pass the big side as `points`).
    val tiersDf = broadcast(ivT.agg(
      sort_array(collect_set(col("__tier"))).as("__tiers")))
    val p = points.crossJoin(tiersDf)
      .withColumn("__tier", explode(col("__tiers"))).drop("__tiers")
      .withColumn("__ibkt", bktOf(usOf(pointTs), col("__tier")))
    // per-bucket occupancy Window: partitionBy = the join keys, so the
    // window's exchange IS the join's interval-side exchange (no extra
    // shuffle); the observe rides the branch once.
    val w = Window.partitionBy(col("__tier"), col("__ibkt"))
    val iv = ivT
      .withColumn("__ibkt", explode(sequence(
        bktOf(usOf(startTs), col("__tier")),
        // [startTs, endTs): the last contained microsecond is endTs − 1µs
        bktOf(usOf(endTs) - 1L, col("__tier")))))
      .withColumn("__occ", count(lit(1)).over(w))
      .observe(obsName,
        max(col("__occ")).as("max_bucket_intervals"),
        count(lit(1)).as("bucket_rows"),
        max(col("__tier")).cast("long").as("max_tier"))
      .drop("__occ")
    p.join(iv, Seq("__tier", "__ibkt"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__tier", "__ibkt")
  }

  private def intervalJoinImpl(points: DataFrame, intervals: DataFrame,
                               pointTs: String, startTs: String,
                               endTs: String,
                               bucketSeconds: Long): DataFrame = {
    require(points.columns.intersect(intervals.columns).isEmpty,
      "points/intervals column names must be disjoint")
    requireNoReserved(points, "points")
    requireNoReserved(intervals, "intervals")
    def us(c: String) = usOf(c)
    // exact integer FLOOR division: x − pmod(x, w) is the largest
    // multiple of w ≤ x (pmod ≥ 0 even for negative epochs), and `div`
    // on the exact multiple is exact at any magnitude (`floor(x / w)`
    // would route through DOUBLE and shift buckets past 2^53 µs).
    def fdiv(x: Column, w: Column): Column =
      call_function("div", x - pmod(x, w), w)
    val live = intervals.filter(col(endTs) > col(startTs))
    val w = lit(bucketSeconds * 1000000L)
    val p = points.withColumn("__ibkt", fdiv(us(pointTs), w))
    val iv = live.withColumn("__ibkt", explode(sequence(
        fdiv(us(startTs), w),
        // [startTs, endTs): the last contained microsecond is endTs − 1µs
        fdiv(us(endTs) - 1L, w))))
    p.join(iv, "__ibkt")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__ibkt")
  }

  /** Keyless interval × interval OVERLAP join — pairs where
    * [lStart, lEnd) ∩ [rStart, rEnd) ≠ ∅, i.e. lStart < rEnd &&
    * rStart < lEnd — decomposed into TWO span-tiered point-in-interval
    * joins (the classic stabbing decomposition): two half-open
    * intervals overlap exactly when the LATER start lies inside the
    * other interval, so
    *   (1) pairs with rStart ≥ lStart  =  right-STARTS stabbing left
    *       intervals (rStart ∈ [lStart, lEnd)), and
    *   (2) pairs with rStart < lStart  =  left-STARTS stabbing right
    *       intervals (lStart ∈ [rStart, rEnd)), ties excluded — they
    *       are already in (1)
    * partition the overlap set, so the union is exact with NO distinct
    * and no pair-dedup rule. Each leg is [[intervalJoin]]'s tiered
    * equi join, where only the POINT side (a start column — one row
    * per distinct home tier) replicates across tiers and every
    * interval stays in its ≤ 2 home-tier buckets. This is what makes
    * the op span-outlier-robust: an upward-replication scheme (both
    * sides meeting in the coarser home tier) would pull EVERY fine
    * interval into the outlier's tier-wide buckets and re-create the
    * cartesian collapse this round removed — measured on the planted
    * 1000× outlier fixture: ~400 intervals per bucket upward vs ≤ a
    * handful here. Per-leg bucket occupancy is observable via the
    * `interval_overlap_occupancy_l` / `_r` observes (the
    * [[intervalJoin]] metric, one per leg).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String): DataFrame = {
    require(left.columns.intersect(right.columns).isEmpty,
      "left/right column names must be disjoint")
    requireNoReserved(left, "left")
    requireNoReserved(right, "right")
    // dead (empty) intervals must not act as stabbing POINTS either:
    // the naive predicate pairs nothing with an empty interval
    val l0 = left.filter(col(lEnd) > col(lStart))
    val r0 = right.filter(col(rEnd) > col(rStart))
    val later = tieredContainmentJoin(r0, l0, rStart, lStart, lEnd,
      "interval_overlap_occupancy_l")
    val earlier = tieredContainmentJoin(l0, r0, lStart, rStart, rEnd,
      "interval_overlap_occupancy_r")
      .filter(col(lStart) > col(rStart))
    later.unionByName(earlier.select(later.columns.map(col): _*))
  }

  /** Keyless 2-D radius self-join (all pairs within `eps` Euclidean
    * distance) via GRID bucketing — the spatial analogue of the
    * interval joins: each point lands in cell (⌊x/eps⌋, ⌊y/eps⌋); the
    * LEFT side additionally probes its 3×3 cell neighborhood (9
    * replicated rows), the right side stays single-cell, so every
    * candidate pair meets exactly once (the right cell is unique and
    * the orientation filter keeps one direction) — no distinct, no
    * double-count. The exact predicate dx²+dy² ≤ eps² filters
    * candidates; a true pair's cells differ by ≤ 1 in each axis BY
    * construction (|dx| ≤ eps spans at most one cell boundary), so
    * the 3×3 probe is lossless. The naive predicate is a cross join;
    * this plans as one equi join on the cell key, shuffle ∝ 9×|points|.
    *
    * CAP-EXEMPT under the verified-pair contract (the
    * `minhashDuplicates` precedent, r12): a dense cell — a spatial
    * flash crowd — makes the cell equi join O(k²) per cell, but every
    * in-radius pair is a TRUE answer the caller asked for, so a
    * drop-cap or star-reduction would change the result, not just the
    * plan (star-reduction preserves connected components, not pair
    * sets — consumers that only need components, like
    * [[graft.dedup.Dedup.duplicateClusters]]-style clustering, should
    * cap upstream of THIS op on their own density model). A k-point
    * dense cluster inherently has Θ(k²) in-radius pairs; the honest
    * scale levers are a smaller `eps` or a pre-aggregation to
    * per-cell counts. Density is OBSERVABLE: the single-cell target
    * branch carries a `grid_cell_occupancy` observe (max points per
    * cell + total cells rows) through the standard
    * QueryExecutionListener channel — the window's partitioning is
    * the join key, so its exchange IS the target side's join
    * exchange (no extra shuffle).
    */
  def gridNeighborJoin(points: DataFrame, idCol: String, xCol: String,
                       yCol: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    requireNoReserved(points, "points")
    def cellOf(c: Column) = floor(c.cast("double") / lit(eps))
    val base = points.select(col(idCol).as("__gid"),
      col(xCol).cast("double").as("__gx"),
      col(yCol).cast("double").as("__gy"))
    val nbr9 = (for (dx <- -1 to 1; dy <- -1 to 1)
      yield s"array(${dx}L, ${dy}L)").mkString("array(", ", ", ")")
    val probe = base
      .withColumn("__dxy", explode(expr(nbr9)))
      .select(col("__gid").as("a_id"), col("__gx").as("ax"),
        col("__gy").as("ay"),
        (cellOf(col("__gx")) + col("__dxy")(0)).as("cx"),
        (cellOf(col("__gy")) + col("__dxy")(1)).as("cy"))
    val wCell = Window.partitionBy(col("cx2"), col("cy2"))
    val target = base.select(col("__gid").as("b_id"),
      col("__gx").as("bx"), col("__gy").as("by"),
      cellOf(col("__gx")).as("cx2"), cellOf(col("__gy")).as("cy2"))
      .withColumn("__occ", count(lit(1)).over(wCell))
      .observe("grid_cell_occupancy",
        max(col("__occ")).as("max_cell_points"),
        count(lit(1)).as("cell_rows"))
      .drop("__occ")
    probe.join(target,
        col("cx") === col("cx2") && col("cy") === col("cy2") &&
          col("a_id") < col("b_id"))
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <=
        lit(eps * eps))
      .select(col("a_id"), col("b_id"), col("ax"), col("ay"),
        col("bx"), col("by"))
  }

  /** Distributed 2-D skyline (Pareto frontier, maximize both axes):
    * keep the rows not STRICTLY dominated — p dominates q iff
    * p.x ≥ q.x ∧ p.y ≥ q.y ∧ (p.x > q.x ∨ p.y > q.y). Duplicate
    * (x,y) points do not dominate each other and all survive.
    *
    * Two-level plan (the scale point — a single global-ORDER-BY window
    * would funnel every row through ONE task): rows hash into x-range
    * buckets of width `bucketWidth`; within a bucket, two windows
    * decide local domination exactly — `max(y) PARTITION BY x` kills
    * same-x lower rows, and a running `max(y)` over strictly-greater
    * x (RANGE frame on the negated x, so ASC everywhere — no
    * engine-specific DESC-range semantics) kills in-bucket dominated
    * rows. Cross-bucket domination only needs each bucket's max-y
    * (|buckets| rows, aggregated then broadcast): every x in a later
    * bucket is strictly greater than every x here, so a local
    * survivor dies iff some later bucket's max-y ≥ its y. Work is one
    * hash exchange + per-bucket sorts + a broadcast of |buckets|
    * rows — no join, no global sort.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    requireNoReserved(df, "df")
    // same integral-type guard as RobustStats.cumCounts: dominance is
    // decided on the CAST values, so a fractional axis would be
    // truncated before comparison and could wrongly kill points
    // ((1.9, 4) treated as same-x as (1.2, 5)) while the untruncated
    // columns are returned. Pre-quantize fractional axes (the
    // registered query rounds to cents).
    Seq(xCol, yCol).foreach { c =>
      val t = df.schema(c).dataType.typeName
      require(Seq("byte", "short", "integer", "long").contains(t),
        s"$c is $t — skyline2d compares exact INTEGER axes; " +
          "round/scale fractional axes to an integral unit first.")
    }
    val base = df
      .withColumn("__skx", col(xCol).cast("long"))
      .withColumn("__sky", col(yCol).cast("long"))
      .withColumn("__skb", expr(s"__skx div ${bucketWidth}L"))
      .withColumn("__skxn", negate(col("__skx")))
    // ONE exchange + ONE sort for the big side: both in-bucket checks
    // share the (bucket, -x) window spec — same-x max is the PEER
    // frame (RANGE CURRENT ROW..CURRENT ROW), strictly-greater-x max
    // is the frame up to (-x)-1 — so they evaluate in a single
    // WindowExec pass
    val w = Window.partitionBy(col("__skb")).orderBy(col("__skxn"))
    val local = base
      .withColumn("__my",
        max(col("__sky")).over(w.rangeBetween(Window.currentRow,
          Window.currentRow)))
      .withColumn("__gy",
        max(col("__sky")).over(w.rangeBetween(Window.unboundedPreceding,
          -1)))
      .filter(col("__my") <= col("__sky") &&
        (col("__gy").isNull || col("__gy") < col("__sky")))
    // per-bucket max-y from the LOCAL SURVIVORS (the greatest-x row
    // attaining a bucket's max y always survives both in-bucket
    // checks, so the survivor max equals the bucket max), then for
    // each bucket the max over STRICTLY later buckets (tiny:
    // |buckets| rows — window + broadcast)
    val wLater = Window.orderBy(negate(col("__skb")))
      .rangeBetween(Window.unboundedPreceding, -1)
    val bucketMax = local.groupBy(col("__skb"))
      .agg(max(col("__sky")).as("__by"))
      .withColumn("__laty", max(col("__by")).over(wLater))
      .select(col("__skb"), col("__laty"))
    local.join(broadcast(bucketMax), Seq("__skb"))
      .filter(col("__laty").isNull || col("__laty") < col("__sky"))
      .drop("__skb", "__skx", "__sky", "__skxn", "__my", "__gy", "__laty")
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, valueCols: Seq[String],
               strict: Boolean = true,
               rightTieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"valueCols ${valueCols.intersect(leftCols).mkString(",")} collide " +
        "with left columns — rename on the right side first")
    val rOrd = if (strict) 1 else -1
    val l = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_ord", lit(0))
    // a tiebreak column may also be a value/key column — select it once
    val extraTies = rightTieBreak
      .filterNot(c => valueCols.contains(c) || keys.contains(c))
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__asof_ts") :+
        lit(rOrd).as("__asof_ord")) ++
        valueCols.map(col) ++ extraTies.map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc +: col("__asof_ord").asc +:
        rightTieBreak.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // Propagate the latest right row ATOMICALLY: valueCols ride one struct
    // that is non-null exactly for right-side rows, so a NULL inside a value
    // column still travels with its own row. Per-column last(ignoreNulls)
    // would skip that NULL and stitch values from DIFFERENT right rows —
    // diverging from merge_asof/ASOF JOIN, which take the latest eligible
    // row wholesale.
    val matched = unioned
      .withColumn("__asof_row",
        when(col("__asof_ord") =!= 0, struct(valueCols.map(col): _*)))
      .withColumn("__asof_m",
        last(col("__asof_row"), ignoreNulls = true).over(w))
    matched.filter(col("__asof_ord") === 0)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"__asof_m.$v").as(v)): _*)
  }

  /** SCD2 (slowly-changing-dimension type 2) history build: each row of a
    * keyed change stream becomes a validity interval
    * `[valid_from, valid_to)` with `valid_to` = the next change's
    * timestamp (NULL ⇒ current). One window per key — the incremental
    * MERGE pattern expressed as a batch rebuild; at scale the same window
    * runs per key-partition after one shuffle on `keyCols`, no driver
    * involvement. `tieBreak` must make the per-key order total (a change
    * feed can carry several updates at one timestamp).
    */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCol: Column,
           tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCol +: tieBreak: _*)
    df.withColumn("valid_from", orderCol)
      .withColumn("valid_to", lead(orderCol, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** CDC snapshot diff: classify every key of two snapshots of the same
    * table as `insert` (new only), `delete` (old only), `update` (both,
    * compared columns differ) or `unchanged`. One full-outer sort-merge
    * join on `keys` — the standard change-data-capture derivation when no
    * change feed exists, and the verification step after a migration or
    * backfill. Comparison is null-safe (`<=>` on a packed struct), so a
    * NULL→value transition counts as an update, not a match.
    * Output: keys ++ old_/new_-prefixed compare columns + `change_type`.
    */
  def deltaDetect(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                  compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(true).as("__in_old"): _*)
    val n = newDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(true).as("__in_new"): _*)
    val oldSide = struct(compareCols.map(c => col(s"old_$c")): _*)
    val newSide = struct(compareCols.map(c => col(s"new_$c")): _*)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(!(oldSide <=> newSide), "update")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }

  /** Batch MERGE/upsert: rows of `updates` replace base rows with the same
    * `keys`; unmatched update rows are appended. Expressed as
    * anti-join + union — both sides shuffle once on `keys` (or the anti
    * join broadcasts when `updates` is small), which is the cheapest
    * batch-rebuild form; storage-level MERGE (Delta/Iceberg) does the
    * same logically with file-level pruning. `updates` must be unique per
    * key (enforce upstream with firstMatchPerKey) and share the base
    * schema.
    */
  def upsert(base: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame =
    base.join(updates, keys, "left_anti").unionByName(updates)

  /** Runtime Bloom-filter join pruning: build a compact bitmap over the
    * build side's join keys (`nHashes` positions per key from seeded
    * xxhash64), ship it to every probe task as a literal word array, and
    * filter the probe side BEFORE its exchange — only rows that might
    * match pay the shuffle; the exact join afterwards removes false
    * positives, so the result is identical to the plain join by
    * construction. The bitmap build collects ≤ `bits` distinct positions
    * (a fixed few KB, independent of build-side row count) — the same
    * driver round-trip a broadcast join performs. Spark's own
    * `InjectRuntimeFilter` does this automatically for some shuffle-join
    * shapes; this operator is the explicit form for when the build side
    * is a computed frame or the probe filter must sit below a
    * non-join-adjacent exchange. All probe-side checks are codegen'd
    * column expressions (array literal lookups + shifts), no UDF.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                      buildKey: String, bits: Int = 1 << 16,
                      nHashes: Int = 3): DataFrame = {
    require(bits >= 64 && Integer.bitCount(bits) == 1,
      s"bits must be a power of two >= 64, got $bits")
    def positions(key: Column): Seq[Column] =
      (0 until nHashes).map(j =>
        pmod(xxhash64(key, lit(j)), lit(bits.toLong)))
    val words = new Array[Long](bits / 64)
    build.select(explode(array(positions(col(buildKey)): _*)).as("pos"))
      .distinct().collect()
      .foreach { r =>
        val p = r.getLong(0).toInt
        words(p >> 6) |= 1L << (p & 63)
      }
    val wordsLit = typedLit(words)
    val keep = positions(col(probeKey)).map { p =>
      call_function("shiftright",
        element_at(wordsLit, (p.cast("int") / lit(64)).cast("int") + 1),
        pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    probe.filter(keep).join(build, col(probeKey) === col(buildKey))
  }

  /** The 100 TB tier of [[bloomPrunedJoin]]: the fixed 64 Kbit literal
    * bitmap saturates around ~10^4 build keys (past that every probe row
    * passes and the prune is a no-op), so this variant sizes the filter
    * from the BUILD SIDE ITSELF — Spark's native `BloomFilter` sketch is
    * built with a distributed `treeAggregate` (`df.stat.bloomFilter`,
    * mergeable partials, driver sees only the final sketch bytes — never
    * key rows), and the probe side filters through the codegen-planned
    * `BloomFilterMightContain` Catalyst expression (the same predicate
    * Spark's own `InjectRuntimeFilter` injects, here available for
    * computed build frames and non-join-adjacent probe exchanges).
    * False positives are removed by the exact join, so the result equals
    * the plain join by construction at ANY build-side cardinality; the
    * `expectedKeys` knob controls the sketch's size/FPR trade — omitted,
    * the sketch is sized by a fixed 2^24-bit budget in a SINGLE pass
    * over the build side (no count() pre-job: on the computed build
    * frames this operator exists for, a second evaluation is the
    * expensive part; past ~10^6 keys the fpp degrades gracefully — the
    * prune weakens, correctness never does).
    */
  def bloomPrunedJoinAuto(probe: DataFrame, build: DataFrame,
                          probeKey: String, buildKey: String,
                          fpp: Double = 0.01,
                          expectedKeys: Long = -1L): DataFrame = {
    val bytes = buildBloom(build, buildKey, fpp, expectedKeys)
    probe.filter(bloomMightContain(bytes, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey))
  }

  /** Serialized Spark-native BloomFilter over `build`'s `key` column,
    * built by the Catalyst `BloomFilterAggregate` (the same mergeable
    * partial-aggregate Spark's runtime filters use — the sketch must be
    * built over xxhash64(key) because `BloomFilterMightContain` probes
    * with xxhash64(key); `df.stat.bloomFilter` inserts RAW keys under a
    * different hash family and would false-negative on every probe).
    * With `expectedKeys` the bits are sized exactly
    * (m = ⌈−n·ln(fpp)/ln²2⌉); without it NO counting pre-job runs —
    * the sketch takes a fixed 2^24-bit (2 MB) budget, ~3·10^-4 fpp at
    * 10^6 keys, degrading gracefully beyond — so the build side is
    * evaluated exactly ONCE here either way.
    */
  def buildBloom(build: DataFrame, key: String, fpp: Double = 0.01,
                 expectedKeys: Long = -1L): Array[Byte] = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.
      BloomFilterAggregate
    val (n, numBits) =
      if (expectedKeys > 0)
        (expectedKeys, math.max(64L, math.ceil(-expectedKeys *
          math.log(fpp) / (math.log(2) * math.log(2))).toLong))
      else {
        val bits = 1L << 24
        (bits / 14, bits) // n estimate tunes k ≈ ln2·m/n for ~1% fpp
      }
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnBridge.expression(col(key)))),
      Literal(n), Literal(numBits)).toAggregateExpression()
    build.select(GraftColumnBridge.column(agg)).head()
      .getAs[Array[Byte]](0)
  }

  /** Codegen-friendly membership predicate over a serialized native
    * BloomFilter (the deserialized sketch is cached per task by the
    * expression itself). */
  def bloomMightContain(bloomBytes: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{
      BloomFilterMightContain, Literal, XxHash64}
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(GraftColumnBridge.expression(key)))))
  }
}
