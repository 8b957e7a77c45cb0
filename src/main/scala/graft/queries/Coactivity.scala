package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE co-activity graph — the single derivation every `g_*` query
  * (triangle count, PageRank, k-core, link prediction) builds on:
  * users joined when they share an (event_type, minute) bucket,
  * oriented a < b, distinct to kill bucket multiplicity. One Scala
  * builder + one SQL prefix so the graph definition cannot silently
  * fork between queries: each engine is self-consistent per query, so
  * a divergence here would KEEP every per-query oracle green while
  * the "co-activity graph" quietly meant different graphs — exactly
  * the failure mode sharing removes.
  *
  * HOT-BUCKET GUARD: the bucket self-join emits O(k²) edges for a
  * k-user bucket, and a flash-crowd minute (an outage page, a viral
  * drop) is quadratic at ANY bucket granularity — the same skewed-key
  * class the LSH candidate generators cap
  * ([[graft.dedup.Dedup.bucketCap]]). Buckets whose occupancy exceeds
  * the corpus-derived cap (`greatest(64, 8·bitlen(n_act+1))`, the
  * shared formula, derived IN-PLAN from the activity count) are
  * EXCLUDED from edge formation: a flash-crowd bucket carries no
  * pairwise co-activity signal — membership is driven by the external
  * event, not by any relationship between the members — exactly like
  * a stop-word in shingling, and star-reduction does NOT apply here
  * because triangles/degrees are not star-preserved (unlike connected
  * components). Filtering ONE side of the self-join suffices: a pair
  * needs its left row in an under-cap bucket and the right row shares
  * that bucket by the join condition — so the hot bucket's O(k²)
  * output AND its O(k²) join work are both gone, while a pair that
  * ALSO co-occurs in any under-cap bucket still surfaces (multi-band
  * LSH semantics). The guard is OBSERVABLE: a `coactivity_cap`
  * observe (max_bucket + over_cap_rows) rides the guarded branch —
  * it appears once in the plan — through the standard
  * QueryExecutionListener observed-metrics channel. The cap never
  * engages on natural data at any measured SF (max natural bucket 6
  * at sf0.1 vs derived cap 136); the DuckDB prefix replays the
  * identical occupancy window + cap formula, so the guard itself is
  * under every `g_*` oracle.
  */
private[graft] object Coactivity {

  /** Undirected edge list `(a, b)`, a < b, distinct, hot buckets
    * dropped. NOT checkpointed — consumers that traverse it more than
    * once materialize it themselves (or via ops that do). */
  def und(s: SparkSession, d: String): DataFrame =
    undFromEvents(s, Tables.events(s, d))

  /** [[und]] over a caller-supplied events frame (user_id, event_type,
    * ts ...) — the seam the planted hot-minute spec and the
    * flash-crowd scale probe drive.
    *
    * Plan shape (r19 — guide §2.4 "two operations keyed the same way
    * share one exchange", measured 1.35× over the r18 shape and ~1.1×
    * over r17 in an alternating same-JVM A/B with edge-set-identical
    * output, graft.CoactAB): ONE events scan, then ONE explicit
    * act-scale exchange keyed (event_type, hr) up front. Because the
    * partitioning expressions are a subset of every downstream
    * clustering, the activity distinct (user, event_type, hr), the
    * per-bucket occupancy counts, the under-cap join-back AND the
    * per-bucket collect_set group-by ALL satisfy their required
    * distributions from that one exchange — the only other act-scale
    * exchange left in the derivation is the final pair distinct (the
    * r18 shape paid the distinct's 3-column exchange plus a second
    * act-scale exchange to re-key the join; r17 additionally scanned
    * events twice). Skew note: keying by bucket alone means a
    * flash-crowd bucket's rows land in one partition for the distinct
    * — LINEAR per-bucket work in a spillable hash aggregate, which is
    * the acceptable cost of removing a whole extra full-data exchange;
    * the quadratic part stays impossible because occupancy is computed
    * from plain counts (never a materialized set — the r18 self-review
    * invariant) and only under-cap buckets reach the set builder, so
    * every collect_set array is ≤ bkt_cap entries by construction.
    * The edge SET is identical to the r13 shape: occupancy = distinct
    * activity rows per bucket (NULL user rows included, matching the
    * oracle's window count(*)), under-cap buckets emit their full
    * clique (sorted array ⇒ a < b; NULLs drop from the set exactly as
    * the former `user_id < u2` join dropped them), over-cap buckets
    * emit nothing, cross-bucket multiplicity dies in the same final
    * distinct. The cap is the same broadcast 1-row scalar
    * ([[graft.dedup.Dedup.capCol]] over n_act = Σ occ ≡ the activity
    * row count), and the `coactivity_cap` observe reports the
    * identical values. */
  def undFromEvents(s: SparkSession, events: DataFrame): DataFrame = {
    import s.implicits._
    val act = events
      .select($"user_id", $"event_type",
        date_trunc("minute", $"ts").as("hr"))
      // explicit width (AQE would coalesce the tiny-byte exchange
      // under the expensive pair fan-out — the r18 lesson), scaled
      // to the events input (guide §2.2)
      .repartition(graft.ops.Width.scaled(events, 64L << 10),
        $"event_type", $"hr")
      .dropDuplicates("user_id", "event_type", "hr")
    val occ = act.groupBy($"event_type", $"hr")
      .agg(count(lit(1)).as("occ"))
    // the shared bucketCap formula over n_act = Σ occ ≡ the activity
    // row count (coalesce: an EMPTY corpus sums to NULL)
    val cap = occ.agg(coalesce(sum($"occ"), lit(0L)).as("n"))
      .select(graft.dedup.Dedup.capCol($"n").as("bkt_cap"))
    val counted = occ.crossJoin(broadcast(cap))
      .observe("coactivity_cap",
        max($"occ").as("max_bucket"),
        sum(when($"occ" > $"bkt_cap", $"occ").otherwise(0L))
          .as("over_cap_rows"))
    val kept = counted.filter($"occ" <= $"bkt_cap")
      .select($"event_type", $"hr")
    // ONLY under-cap buckets reach the set builder, so every
    // collect_set array is ≤ bkt_cap entries BY CONSTRUCTION; the
    // (event_type, hr) join partitioning serves the groupBy with no
    // further exchange, and the sorted array (NULLs dropped, as the
    // former `user_id < u2` join condition dropped them) emits the
    // in-bucket clique as one array expression — a < b by sort order
    act.join(kept, Seq("event_type", "hr"))
      .groupBy($"event_type", $"hr")
      .agg(sort_array(collect_set($"user_id")).as("us"))
      .select(explode(expr(
        """flatten(transform(us, (x, i) ->
          |  transform(slice(us, i + 2, size(us) - i - 1),
          |    y -> named_struct('a', x, 'b', y))))""".stripMargin))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b")).distinct()
  }

  /** DuckDB CTE prefix replaying [[und]]: `act` + the occupancy-
    * guarded `und` (identical cap formula — `greatest(64,
    * 8·length(bin(n+1)))` over the activity count — and the same
    * one-sided filter). `und` is MATERIALIZED — every consumer
    * references it at least twice, and DuckDB's CTE inlining would
    * otherwise re-derive the bucket self-join per reference. */
  val sqlUnd: String =
    """act AS (
      |  SELECT DISTINCT user_id, event_type,
      |    date_trunc('minute', ts) AS hr
      |  FROM events),
      |ccap AS (
      |  SELECT greatest(64, 8 * length(bin(count(*) + 1))) AS bkt_cap
      |  FROM act),
      |actg AS (
      |  SELECT user_id, event_type, hr FROM (
      |    SELECT user_id, event_type, hr,
      |      count(*) OVER (PARTITION BY event_type, hr) AS occ
      |    FROM act)
      |  WHERE occ <= (SELECT bkt_cap FROM ccap)),
      |und AS MATERIALIZED (
      |  SELECT DISTINCT l.user_id AS a, r.user_id AS b
      |  FROM actg l JOIN act r
      |    ON l.event_type = r.event_type AND l.hr = r.hr
      |      AND l.user_id < r.user_id)""".stripMargin

  /** The bidirectional form as an additional CTE (append after
    * [[sqlUnd]]): each undirected edge as two directed rows. */
  val sqlBi: String =
    """bi AS MATERIALIZED (
      |  SELECT a AS src, b AS dst FROM und
      |  UNION ALL SELECT b, a FROM und)""".stripMargin
}
