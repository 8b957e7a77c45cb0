package graft.ops

import graft.functions.TopKAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted / sketch-based sampling primitives for corpus curation at
  * 100 TB: priority sampling (weighted without replacement, mergeable)
  * and KMV-based join-cardinality estimation. Both are built on the
  * bounded [[TopKAgg]] buffer, so the exchange moves at most
  * k × partitions rows per group no matter how large the input —
  * the same scale argument as `p_bottomk_sample`.
  *
  * Determinism/cross-engine contract (the repo-wide rule): randomness
  * is an md5 hash of the row key, priorities are computed by EXACT
  * integer floor division (`div`) in a 44-bit fixed-point domain, and
  * the only floating-point steps are single IEEE operations on
  * exactly-representable operands — bit-identical in any engine.
  */
object Sampling {

  /** 2^44 — the fixed-point scale of the priority domain. 44 hash bits
    * keep `weight * SCALE` inside BIGINT for weights up to ~2^19 and
    * make `SCALE.toDouble` (and any `h/SCALE`) exact. */
  val PriorityScale: Long = 1L << 44

  /** 44-bit uniform hash of `key` in [1, 2^44] (11 md5 hex chars + 1;
    * the +1 avoids a zero divisor and keeps the domain exactly
    * representable as a double). */
  def hash44(key: Column): Column =
    graft.functions.text.md5_prefix64(key.cast("string"), 11) + lit(1L)

  /** Priority sampling (Duffield, Lund, Thorup — "Priority sampling
    * for estimation of arbitrary subset sums", JACM 2007): each item
    * draws u ~ Uniform(0,1] from its key hash and gets priority
    * q = w/u; the k highest-priority items per stratum are the sample,
    * and with τ = the (k+1)-th priority, ŵ = max(w, τ) is an unbiased
    * per-item estimator of w for ANY subset sum — the weighted
    * counterpart of the bottom-k uniform sampler.
    *
    * Exactness: q is ranked in 44-bit fixed point as
    * `(w * 2^44) div (h+1)` — BIGINT floor division, no float rank
    * anywhere (two unequal rationals can floor to the same key; the
    * deterministic (key, id) DESC tie order makes the sample
    * well-defined and engine-independent). The reported τ and ŵ are
    * each ONE IEEE step per engine: τ = τ_scaled / 2^44. The
    * power-of-two DIVISION never rounds, but τ_scaled itself can
    * exceed 2^53 (w near 2^19 over a small hash draw pushes
    * (w·2^44) div u toward 2^63), and there the long→double cast
    * rounds — identically on both engines (same IEEE
    * round-to-nearest-even conversion), so results stay bit-equal
    * cross-engine even though the full chain is not exact.
    * ŵ = max(w, τ).
    *
    * Scale: the per-stratum top-(k+1) runs through the bounded
    * [[TopKAgg]] buffer — map-side partials cap at k+1 entries per
    * stratum, so a billion-row stratum shuffles k+1 rows per
    * partition, never the stratum. The weight join-back touches only
    * the ≤(k+1)·|strata| sampled ids (broadcast build side).
    *
    * Output: (stratum, rn, id, w, est) — the sample rank-ordered by
    * priority; `est` is ŵ. Strata with ≤ k items emit every item with
    * ŵ = w (τ = 0), matching the estimator's all-included case.
    *
    * Weight domain: w ≤ ~2^19 (per-document lengths/counts — any
    * doc-level weight). Larger weights overflow the BIGINT fixed-point
    * product and fail LOUDLY under ANSI arithmetic (the engine-wide
    * explicit-failure posture); pre-scale such weights before sampling.
    * Preconditions: stratum/id/weight must be NON-NULL (a NULL id or
    * weight propagates a NULL priority into the non-nullable TopKAgg
    * buffer and the job fails loudly mid-run — filter dirty rows
    * first); ids need only be unique within a stratum.
    */
  def prioritySample(df: DataFrame, stratumCol: String, idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val keyed = df.select(
      col(stratumCol).as("stratum"), col(idCol).as("id"),
      col(weightCol).cast("long").as("w"),
      hash44(col(idCol)).as("u"))
      .withColumn("pk", expr(s"(w * ${PriorityScale}L) div u"))
    val topk = TopKAgg.topK(k + 1)
    val sample = keyed
      .groupBy(col("stratum"))
      .agg(topk(col("pk"), col("id")).as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col("stratum"), (col("pos") + 1L).cast("long").as("rn"),
        col("kv.v").as("pk"), col("kv.id").as("id"))
    val wTau = Window.partitionBy(col("stratum"))
    val withTau = sample
      .withColumn("tau_scaled", coalesce(
        max(when(col("rn") === (k + 1), col("pk"))).over(wTau), lit(0L)))
      .filter(col("rn") <= k)
    // weight join-back: the sample is ≤ (k+1)·|strata| rows — broadcast
    // it as the build side against the (arbitrarily large) input. Keyed
    // on (stratum, id): ids need only be unique WITHIN a stratum — an
    // id repeating across strata must not cross-match samples
    val weights = df.select(col(stratumCol).as("stratum"),
      col(idCol).as("id"), col(weightCol).cast("long").as("w"))
    weights.join(broadcast(withTau), Seq("stratum", "id"))
      .select(col("stratum"), col("rn"), col("id"), col("w"),
        greatest(col("w").cast("double"),
          col("tau_scaled").cast("double") / lit(PriorityScale.toDouble))
          .as("est"))
      .orderBy(col("stratum"), col("rn"))
  }

  /** KMV-sketch equi-join cardinality estimate: |A ⋈ B| = Σ_v fA(v)·fB(v)
    * estimated from a bottom-k sample of the DISTINCT key union
    * (Beyer et al. "On synopses for distinct-value estimation under
    * multiset operations", SIGMOD 2007 — the threshold estimator
    * Σ̂ = Σ_{sampled} g(v) / τ with τ = the k-th smallest normalized
    * hash). The point at 100 TB: join size is known BEFORE running the
    * join, from two count-aggregations and a k-row sketch.
    *
    * Exactness: the sample is the k smallest 44-bit hashes of the
    * distinct union keys (bounded [[TopKAgg]] on the negated hash —
    * mergeable, k rows per partition on the exchange); per-key
    * fA·fB products and their sum S are BIGINT; the estimate is the
    * two-step IEEE chain `(S * 2^44) / τ` written identically in both
    * engines. Inputs with FEWER than k distinct keys degrade to the
    * exact sum (no k-th hash ⇒ τ = 2^44 ⇒ estimate = S = Σ); at
    * EXACTLY k keys the k-th hash becomes a real threshold and the
    * output is an estimate over the k−1 keys below it. Keys must be
    * NON-NULL (a NULL key propagates a NULL hash into the
    * non-nullable TopKAgg buffer and fails loudly — filter first).
    *
    * Output: one row (k, tau_scaled, sampled_keys, exact, est, ratio)
    * — `exact` computed alongside for evaluation-harness use (itself a
    * scalable count-join, but the sketch path is the scale story).
    */
  /** The estimate side of [[kmvJoinSize]] WITHOUT the exact join —
    * the form a planner hook actually consumes (running the exact
    * join to decide how to run the join would defeat the point):
    * (k, tau_scaled, sampled_keys, est). Cost: one distinct-union
    * sketch pass + two count-aggs joined to the 64-row sketch. */
  def kmvJoinEstimate(a: DataFrame, b: DataFrame, keyCol: String,
                      k: Int,
                      precomputed: Option[(DataFrame, DataFrame)] = None)
      : DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    // callers that already hold the (key, fa)/(key, fb) frequency
    // frames (kmvJoinSize builds them for its exact column) pass
    // them in, so the plan carries each aggregation subtree ONCE
    // instead of relying on exchange reuse to deduplicate copies
    val (fa, fb) = precomputed.getOrElse((
      a.groupBy(col(keyCol).as("key"))
        .agg(count(lit(1)).as("fa")),
      b.groupBy(col(keyCol).as("key"))
        .agg(count(lit(1)).as("fb"))))
    // bottom-k of the distinct key union: negate the hash so the
    // descending TopKAgg buffer holds the k SMALLEST
    val keys = a.select(col(keyCol).as("key"))
      .unionByName(b.select(col(keyCol).as("key")))
      .distinct()
      .select(col("key"), hash44(col("key")).as("h"))
    val topk = TopKAgg.topK(k)
    val sketch = keys
      .agg(topk(negate(col("h")), col("key")).as("mins"))
      .select(posexplode(col("mins")).as(Seq("pos", "kv")))
      .select((col("pos") + 1L).as("rn"), negate(col("kv.v")).as("h"),
        col("kv.id").as("key"))
    val tau = sketch.agg(
      coalesce(max(when(col("rn") === k, col("h"))),
        lit(PriorityScale)).as("tau_scaled"))
    val s = sketch.filter(col("rn") < k)
      .join(fa, Seq("key"), "left")
      .join(fb, Seq("key"), "left")
      .agg(coalesce(sum(coalesce(col("fa"), lit(0L)) *
        coalesce(col("fb"), lit(0L))), lit(0L)).as("s"),
        count(lit(1)).as("sampled_keys"))
    s.crossJoin(tau)
      .select(lit(k.toLong).as("k"), col("tau_scaled"),
        col("sampled_keys"),
        ((col("s").cast("double") * lit(PriorityScale.toDouble)) /
          col("tau_scaled").cast("double")).as("est"))
  }

  def kmvJoinSize(a: DataFrame, b: DataFrame, keyCol: String,
                  k: Int): DataFrame = {
    val fa = a.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("fa"))
    val fb = b.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("fb"))
    val exact = fa.join(fb, Seq("key"))
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("exact"))
    kmvJoinEstimate(a, b, keyCol, k, precomputed = Some((fa, fb)))
      .crossJoin(exact)
      .select(col("k"), col("tau_scaled"), col("sampled_keys"),
        col("exact"), col("est"))
      .withColumn("ratio", col("est") / col("exact").cast("double"))
  }

  /** The KMV estimate as a WORKING PLANNER HOOK (the r15 verdict's
    * carried 'planner-input BRANCH demo'): estimate |fact ⋈ dim|
    * with [[kmvJoinEstimate]], compare against the fact row count
    * (a join that REDUCES the fact — selective dim — broadcasts;
    * one that preserves or explodes it takes the shuffle-merge
    * path), and BIND the choice physically via broadcast()/
    * hint("merge") so the decision is visible in the executed plan
    * (spec-pinned: BroadcastHashJoin vs SortMergeJoin). Two
    * metadata-sized Spark actions run at construction — the
    * estimate job and the fact count — exactly the stats pass a
    * cost-based planner performs before physical planning. The
    * estimate, threshold, and decision ride the output row
    * (join_strategy, join_est, fact_rows) so an oracle replays the
    * WHOLE decision chain, not just the join result; both branches
    * are value-identical by construction (the hint changes the
    * physical plan, never the semantics). */
  /** The decision record of [[kmvAdaptiveEquiJoin]]: the chosen
    * strategy, the estimate and threshold that chose it, and the
    * physically-bound joined frame. Exposed so a caller aggregating
    * the join can still report the decision when the join is EMPTY
    * (constant columns on an empty frame vanish under a global agg —
    * the oracle's scalar aggregate always emits its count-0 row). */
  final case class KmvAdaptivePlan(strategy: String, est: Double,
                                   factRows: Long, joined: DataFrame)

  def kmvAdaptivePlan(fact: DataFrame, dim: DataFrame,
                      keyCol: String, k: Int): KmvAdaptivePlan = {
    // the fact row count RIDES the estimate job (r19): factRows ≡
    // Σ fa by definition, and the whole fa frame flows through the
    // estimate plan's sketch join, so an observe on it captures the
    // count in the same action — the former separate fact.count()
    // was a second full fact pass per planned join, purely to read
    // one number a stats pass already had
    val obs = org.apache.spark.sql.Observation()
    val fa = fact.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("fa"))
      .observe(obs, coalesce(sum(col("fa")), lit(0L)).as("fact_rows"))
    val fb = dim.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("fb"))
    val est = kmvJoinEstimate(fact, dim, keyCol, k,
        precomputed = Some((fa, fb)))
      .select(col("est")).head().getDouble(0)
    val factRows = obs.get("fact_rows").asInstanceOf[Long]
    val broadcastIt = est < factRows.toDouble
    val joined =
      if (broadcastIt) fact.join(broadcast(dim), Seq(keyCol))
      else fact.join(dim.hint("merge"), Seq(keyCol))
    KmvAdaptivePlan(if (broadcastIt) "broadcast" else "shuffle",
      est, factRows, joined)
  }

  def kmvAdaptiveEquiJoin(fact: DataFrame, dim: DataFrame,
                          keyCol: String, k: Int): DataFrame = {
    val p = kmvAdaptivePlan(fact, dim, keyCol, k)
    p.joined
      .withColumn("join_strategy", lit(p.strategy))
      .withColumn("join_est", lit(p.est))
      .withColumn("fact_rows", lit(p.factRows))
  }

  /** Bottom-k (exact-size, mergeable) uniform sample per group: the k
    * ids with the smallest 60-bit md5 hashes per group ARE a uniform
    * without-replacement sample (the bottom-k sketch applied to row
    * sampling; Spark's native sample() is seed-per-partition and
    * changes under repartition — this replays on any md5-capable
    * engine). The bounded [[TopKAgg]] buffer caps map-side partials
    * at k entries per group, so a billion-row group shuffles k rows
    * per partition, never the group. Ties (equal hashes) break by id
    * DESC, matching the oracle's `ORDER BY h, id DESC`. Output:
    * (group, rn, id) rank-ordered by hash, rn in [1, k]. Shared by
    * `p_bottomk_sample` and the `p_mix_sample_pack` pipeline (which
    * sizes k to the GLOBAL budget and filters rn <= per-group alloc —
    * legal because every alloc <= budget by construction). */
  def bottomKSample(df: DataFrame, groupCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val topk = TopKAgg.topK(k)
    df.select(col(groupCol), col(idCol),
        graft.functions.text
          .md5_prefix64(col(idCol).cast("string"), 15).as("__h"))
      .groupBy(col(groupCol))
      // v = −h ⇒ the descending TopKAgg buffer holds the k SMALLEST
      // hashes; id carries the sampled id
      .agg(topk(negate(col("__h")), col(idCol)).as("__mins"))
      .select(col(groupCol),
        posexplode(col("__mins.id")).as(Seq("__pos", idCol)))
      .select(col(groupCol),
        (col("__pos") + 1L).cast("long").as("rn"), col(idCol))
  }

  /** Largest-remainder (Hamilton) apportionment of an integer sample
    * budget across domains — the deterministic allocation step of a
    * data-mixing pipeline (given per-source weights, how many samples
    * each source contributes to a fixed-size training mix; the static
    * counterpart of DoReMi-style reweighting). Exact by construction:
    * quota_s = budget·w_s / Σw splits into the BIGINT floor
    * (budget·w_s) div Σw and remainder (budget·w_s) % Σw; the
    * leftover budget − Σfloor units (< |domains| of them) go to the
    * largest remainders, ties broken by domain key ascending. The
    * result sums to the budget EXACTLY — no float quota ever exists.
    *
    * Scale: raw rows reduce per-domain via one partial-agg groupBy;
    * everything after (total, remainder rank, top-up) runs on the
    * |domains|-row frame — metadata-sized, so the single global
    * row_number window is |domains| rows in one task by design.
    * budget·w_s is ANSI BIGINT arithmetic: an overflowing product
    * fails loudly (pre-scale the weights), never wraps.
    * Weights must be non-negative with a POSITIVE total; a zero
    * total would divide by zero (loud under ANSI).
    *
    * Output: (key, weight, alloc) ordered by key, Σalloc = budget. */
  def largestRemainderAllocate(df: DataFrame, keyCol: String,
                               weightCol: String,
                               budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    // same integral-type guard as RobustStats/skyline2d: the weight
    // cast below would silently truncate a fractional column before
    // quotas are decided — pre-scale fractional weights instead
    val wt = df.schema(weightCol).dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(wt),
      s"$weightCol is $wt — apportionment is exact INTEGER " +
        "arithmetic; round/scale fractional weights first.")
    val perKey = df
      .select(col(keyCol), col(weightCol).cast("long").as("__w"))
      .groupBy(col(keyCol)).agg(sum(col("__w")).as("weight"))
      // non-negativity AND non-NULL enforced IN-PLAN on the
      // |domains|-row frame (cheap), not just documented: a negative
      // per-key total makes Spark's toward-zero div truncate quotas
      // UP, sum(floor) can exceed the budget, and the allocation
      // silently stops summing to the budget (and can go negative);
      // an all-NULL key's summed weight is NULL, which would sail
      // past a bare `< 0` check and flow through with a NULL alloc
      // while its share silently redistributes via the top-up —
      // the loud-failure posture the budget/integral guards take
      .select(col(keyCol), when(col("weight").isNull ||
            col("weight") < 0L,
          raise_error(concat(lit("largestRemainderAllocate: NULL or " +
            "negative weight total for key "),
            col(keyCol).cast("string"))))
        .otherwise(col("weight")).as("weight"))
    val tot = perKey.agg(sum(col("weight")).as("__t"))
    val quotas = perKey.crossJoin(broadcast(tot))
      .select(col(keyCol), col("weight"),
        expr(s"($budget * weight) div __t").as("__fl"),
        expr(s"($budget * weight) % __t").as("__rem"))
    val leftover = quotas.agg((lit(budget) - sum(col("__fl")))
      .as("__k"))
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(keyCol).asc)
    quotas.crossJoin(broadcast(leftover))
      .withColumn("__rn", row_number().over(wRem))
      .select(col(keyCol), col("weight"),
        (col("__fl") + when(col("__rn") <= col("__k"), 1L)
          .otherwise(0L)).as("alloc"))
      .orderBy(col(keyCol))
  }
}
