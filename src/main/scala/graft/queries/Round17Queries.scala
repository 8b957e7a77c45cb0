package graft.queries

import graft.Tables
import graft.ops.{Sampling, TextClassifier}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 queries: the FULL-CHAIN curation composite — the
  * RefinedWeb/CCNet-shape pipeline (Penedo et al. 2023 §3; Wenzek et
  * al. 2020; Rae et al. 2021 App. A) run as ONE oracle-gated plan:
  * word-shape rules → repetition rules → learned classifier gate →
  * line-level boilerplate dedup → MinHash near-dup canonical select →
  * eval-set decontamination → leakage-proof split → token packing →
  * shard accounting. Every stage is an individually-proven engine
  * operator; this query pins their COMPOSITION (the plan a curation
  * team actually runs) under one hash-exact DuckDB replay.
  */
object Round17Queries {

  private val Promo = "follow us on example social"
  /** The 8-token contamination canary: planted as a per-doc-unique
    * extra LINE on doc_id % 53 == 7 training docs (unique tail ⇒ the
    * line survives line-dedup into the cleaned text) and appended to
    * every eval doc, so its 8-token shingle is the deterministic
    * train/eval overlap the decontamination stage must catch — the
    * stage is observably non-degenerate at every SF instead of
    * relying on accidental cross-doc 8-token runs. */
  private val Canary = "the benchmark answer is alpha beta gamma delta"

  /** Oracle cap shared with curate_leakproof_split: the recursive-CTE
    * connected-components replay stays tractable; a no-op at
    * sf0.001/sf0.01 (500 docs), caps sf0.1's 5000. */
  private val MaxDocId = 1500L

  /** The LINEAR prefix of the e2e oracle replay — base/evald/aug, the
    * shared gate CTEs, survivors, line dedup, cleaned text — ONE
    * definition spliced by both the capped `curate_e2e_pipeline`
    * replay and the uncapped `curate_e2e_uncapped` audit, so the two
    * cannot drift. Emits `base` … `cleand`; everything here is
    * non-recursive (the recursive CC replay stays with the capped
    * query only). Lines never START with `||` — the caller's outer
    * stripMargin would eat the first pipe. */
  private[queries] def e2ePrefixSql(cap: Option[Long]): String = {
    val capAnd = cap.fold("")(m => s" AND doc_id < $m")
    s"""base AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % 97 <> 0$capAnd),
       |evald AS (
       |  SELECT doc_id,
       |    text || ' $Canary' AS text
       |  FROM documents
       |  WHERE doc_id % 97 = 0$capAnd),
       |aug AS MATERIALIZED (
       |  SELECT doc_id,
       |    '$Promo' || chr(10) || text || chr(10) ||
       |      'copyright footer ' || CAST(doc_id % 7 AS VARCHAR) ||
       |      CASE WHEN doc_id % 53 = 7 THEN chr(10) ||
       |        '$Canary leak' ||
       |        CAST(doc_id AS VARCHAR) ELSE '' END AS text
       |  FROM base),
       |${OracleGen.curationGateCtes("aug", 1024)},
       |surv AS MATERIALIZED (
       |  SELECT b.doc_id, b.text FROM base b
       |  JOIN gkeep USING (doc_id) JOIN rkeep USING (doc_id)
       |  JOIN ckeep USING (doc_id)),
       |lines AS (
       |  SELECT doc_id, 0 AS line_no,
       |    '$Promo' AS line FROM surv
       |  UNION ALL SELECT doc_id, 1, text FROM surv
       |  UNION ALL SELECT doc_id, 2,
       |    'copyright footer ' || CAST(doc_id % 7 AS VARCHAR)
       |  FROM surv
       |  UNION ALL SELECT doc_id, 3,
       |    '$Canary leak' || CAST(doc_id AS VARCHAR)
       |  FROM surv WHERE doc_id % 53 = 7),
       |lf AS (
       |  SELECT line, count(DISTINCT doc_id) AS df
       |  FROM lines GROUP BY line),
       |cleand AS MATERIALIZED (
       |  SELECT doc_id,
       |    string_agg(CASE WHEN df < 2 THEN line END, chr(10)
       |      ORDER BY line_no) AS text
       |  FROM lines l JOIN lf USING (line)
       |  GROUP BY doc_id
       |  HAVING sum(CASE WHEN df < 2 THEN 1 ELSE 0 END) > 0)"""
      .stripMargin
  }

  /** Every intermediate frame of the e2e curation chain — the
    * `curate_e2e_uncapped` audit counts stages and checks invariants
    * without re-deriving any of them. `edges` are the near-dup
    * candidate pairs (endpoint union = every doc sharing a band
    * bucket with another doc, however the pair set is thinned). */
  private[graft] final case class E2eStages(
      base: DataFrame, evalD: DataFrame, keep: DataFrame,
      cleanD: DataFrame, edges: DataFrame, canon: DataFrame,
      fin: DataFrame, packed: DataFrame)

  /** The `curate_e2e_pipeline` body over an arbitrary (doc_id, text)
    * corpus, optionally doc-id-capped (the registered query caps for
    * the recursive-CTE oracle replay; the `probe_e2e_uncapped` scale
    * probe and the `curate_e2e_uncapped` audit drive THIS helper
    * uncapped over the full corpus so the production shape is both
    * scale-measured and oracle-gated — the probe_leakproof_uncapped
    * convention).
    */
  private[graft] def e2ePipeline(
      s: org.apache.spark.sql.SparkSession,
      docsIn: DataFrame,
      maxDocId: Option[Long]): DataFrame =
    e2eStages(s, docsIn, maxDocId).packed

  private[graft] def e2eStages(
      s: org.apache.spark.sql.SparkSession,
      docsIn: DataFrame,
      maxDocId: Option[Long]): E2eStages = {
    import s.implicits._
    val dim = 1024
    val docsAll = maxDocId.fold(docsIn)(m =>
      docsIn.filter($"doc_id" < m))
    val base = docsAll.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", $"text")
    val evalD = docsAll.filter($"doc_id" % 97 === 0)
      .select($"doc_id",
        concat($"text", lit(" " + Canary)).as("text"))
    // the planted boilerplate as ONE per-doc line array, consumed
    // by BOTH the fused rule pass (joined with \n into aug text)
    // and the line-dedup stage (posexploded) — a single definition
    // so the dedup corpus cannot drift from the filtered corpus.
    // NULL text must stay NULL in aug (array_join SKIPS null
    // elements, which would resurrect NULL-text docs as
    // boilerplate-only texts), hence the isNotNull gate.
    val augLineArr = concat(
      array(lit(Promo), $"text",
        concat(lit("copyright footer "),
          ($"doc_id" % 7).cast("string"))),
      when($"doc_id" % 53 === 7,
        array(concat(lit(Canary + " leak"),
          $"doc_id".cast("string"))))
        .otherwise(array().cast("array<string>")))
    val aug = base.select($"doc_id",
      when($"text".isNotNull, array_join(augLineArr, "\n"))
        .as("text"))

    // ---- stages 1-3 fused (TextStats.curationStats): one
    // tokenize, one tagged explode, one (doc,n,gram) collapse,
    // one broadcast weight join, one per-doc agg — spec-pinned
    // equal to composing the three stand-alone operators
    // keep is doc_ids only (metadata-thin) and feeds cleanD's join
    // AND the uncapped audit's gate-survivor count — without the
    // checkpoint the audit re-runs the whole fused gate chain
    // (tokenize + tagged explode + gram agg, ~1.9 s at sf0.1
    // uncapped) a second time for one count (r18 measured)
    val keep = graft.ops.TextStats.curationStats(aug, "doc_id",
        "text", TextClassifier.standInWeights(s, dim), dim)
      .filter(graft.ops.TextStats.curationGate)
      .select($"doc_id")
      .localCheckpoint()

    // ---- stage 4: line dedup over survivors (lines rebuilt
    // from the RAW text + planted boilerplate, as lineDedup)
    val lines = base.join(keep, Seq("doc_id"))
      .select($"doc_id", posexplode(augLineArr))
      .toDF("doc_id", "line_no", "line")
    val lf = lines.groupBy($"line")
      .agg(countDistinct($"doc_id").as("df"))
    // cleanD feeds FOUR consumers (minhash buckets, CC nodes,
    // canonical rank, decontamination shingles) and CC's loop
    // runs actions at construction — checkpoint the survivor
    // corpus ONCE so the whole upstream rule chain is not
    // re-evaluated per consumer (survivors are the post-filter
    // corpus: data-sized but a fraction of the input)
    val cleanD = lines.join(lf, Seq("line"))
      .groupBy($"doc_id")
      .agg(sum(when($"df" < 2, 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when($"df" < 2,
          struct($"line_no", $"line")))).as("arr"))
      .filter($"n_kept" > 0L)
      .select($"doc_id", concat_ws("\n",
        expr("transform(arr, x -> x.line)")).as("text"))
      .localCheckpoint()

    // ---- stage 5: near-dup clusters -> canonical member
    // edges checkpointed HERE (not only inside duplicateClusters,
    // which checkpoints its own directed copy): the uncapped audit's
    // band-singleton count re-traverses the candidate-pair frame, and
    // without this it re-runs the whole shingle+minhash derivation
    // (r18 measured; duplicateClusters' internal checkpoint then
    // reads this one cheaply)
    val edges = graft.dedup.Dedup.minhashCandidatesPortable(
      cleanD, "doc_id", "text",
      shingleN = 5, bands = 8, rowsPerBand = 2)
      .localCheckpoint()
    val clusters = graft.dedup.Dedup
      .duplicateClusters(cleanD.select($"doc_id"), edges, "doc_id")
      .withColumnRenamed("id", "doc_id")
    val wRk = Window.partitionBy($"cluster_id")
      .orderBy(length($"text").desc, $"doc_id")
    val canon = clusters.join(cleanD, Seq("doc_id"))
      .withColumn("rk", row_number().over(wRk))
      .filter($"rk" === 1)
      .select($"doc_id", $"cluster_id", $"text")
      // canon feeds TWO consumers (the decontamination shingles
      // and the final anti join) — without this the cluster join
      // + canonical window re-run per consumer. MEASURED at
      // sf0.1: 2.0-2.3 s -> 1.4-1.7 s over 3 runs each (the
      // r15/r16 checkpoint discipline: adopt only on a measured
      // win)
      .localCheckpoint()

    // ---- stage 6: decontamination (8-token shingles vs the
    // broadcast eval set — curate_decontaminate's shape)
    def shingles8(df: DataFrame) = df
      .select($"doc_id", split($"text", "\\s+").as("tk"))
      .select($"doc_id", explode(expr(
        "transform(sequence(1, greatest(size(tk) - 7, 1)), " +
          "i -> array_join(slice(tk, i, 8), ' '))")).as("shingle"))
    val esh = shingles8(evalD).select($"shingle").distinct()
    val cont = shingles8(canon).distinct()
      .join(broadcast(esh), Seq("shingle"))
      .select($"doc_id").distinct()
    // fin feeds packing AND (in the uncapped audit) the finalist
    // count + the token-conservation invariant — three traversals of
    // the decontamination join without this checkpoint (r18 measured)
    val fin = canon.join(cont, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // ---- stages 7-9: whole-cluster split, 512-token pack,
    // shard rollup (token counts computed ONLY for finalists)
    val sp = fin.select($"doc_id",
      when(($"cluster_id" % 1000003L) * 2654435761L % 100L < 80L,
        "train")
        .when(($"cluster_id" % 1000003L) * 2654435761L % 100L
          < 90L, "val")
        .otherwise("test").as("split"),
      expr("doc_id div 256").as("shard"),
      size(split($"text", "\\s+")).cast("long").as("toks"))
    val wPack = Window.partitionBy($"split", $"shard")
      .orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val packed = sp.withColumn("cum", sum($"toks").over(wPack))
      .select($"split", $"shard",
        expr("(cum - toks) div 512").as("bin"),
        $"doc_id", $"toks")
      .groupBy($"split", $"shard", $"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"toks").as("sum_toks"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"split", $"shard", $"bin")
    E2eStages(base, evalD, keep, cleanD, edges, canon, fin, packed)
  }

  def all: Seq[Q] = Seq(

    Q("curate_e2e_pipeline",
      "The FULL curation chain as ONE plan (RefinedWeb/CCNet shape): " +
        "(1) Gopher word-shape rules + (2) repetition rules + (3) " +
        "learned classifier gate evaluated in ONE fused pass — one " +
        "tokenize, one tagged uni/bi/tri-gram explode, one " +
        "(doc,n,gram) partial-agg exchange, one broadcast weight " +
        "join, one per-doc agg; no rule stage re-tokenizes the " +
        "corpus (dot = sum over DISTINCT grams of cnt*w[h(gram)] is " +
        "algebraically the per-occurrence sum, so the classifier " +
        "rides the same collapsed gram counts as the repetition " +
        "max). (4) line-level boilerplate dedup over survivors " +
        "(corpus-frequency >= 2 lines drop; cleaned text rebuilt in " +
        "line order), (5) MinHash near-dup clusters (portable " +
        "bands, large-star/small-star CC) reduced to one canonical " +
        "doc each, (6) 8-token-shingle decontamination against the " +
        "eval set (doc_id % 97 == 0, broadcast), (7) whole-cluster " +
        "80/10/10 split (the curate_split_assign permutation keyed " +
        "by cluster), (8) 512-token packing per (split, shard) " +
        "window, (9) shard rollup. Tokenize-after-join discipline: " +
        "packing token counts are computed only for final " +
        "survivors. A planted 8-token canary (unique-tailed line on " +
        "doc_id % 53 == 7 + appended to eval docs) keeps the " +
        "decontamination stage non-degenerate at every SF. Corpus " +
        "capped at doc_id < 1500 for the recursive-CTE oracle " +
        "replay (same cap as curate_leakproof_split).",
      (s, d) => e2ePipeline(s, Tables.documents(s, d),
        Some(MaxDocId)),
      Some(s"""WITH RECURSIVE
         |${e2ePrefixSql(Some(MaxDocId))},
         |${OracleGen.minhashBucketsCte(5, 8, 2, source = "cleand")},
         |ee AS (SELECT a_id AS a, b_id AS b FROM mh_cand
         |  UNION SELECT b_id, a_id FROM mh_cand),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS lab FROM cleand
         |  UNION
         |  SELECT ee.b, reach.lab FROM reach
         |  JOIN ee ON ee.a = reach.id),
         |cl AS MATERIALIZED (
         |  SELECT id AS doc_id, min(lab) AS cluster_id
         |  FROM reach GROUP BY id),
         |rk AS (
         |  SELECT cl.cluster_id, cl.doc_id,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY length(c.text) DESC, cl.doc_id) AS rk
         |  FROM cl JOIN cleand c ON c.doc_id = cl.doc_id),
         |canon AS MATERIALIZED (
         |  SELECT doc_id, cluster_id FROM rk WHERE rk = 1),
         |esh AS MATERIALIZED (
         |  SELECT DISTINCT array_to_string(
         |      string_split_regex(text, '\\s+')[i:i+7], ' ')
         |    AS shingle
         |  FROM evald, unnest(range(1,
         |    greatest(len(string_split_regex(text, '\\s+')) - 7, 1)
         |      + 1)) AS u(i)),
         |csh AS MATERIALIZED (
         |  SELECT DISTINCT c.doc_id, array_to_string(
         |      string_split_regex(cd.text, '\\s+')[i:i+7], ' ')
         |    AS shingle
         |  FROM canon c JOIN cleand cd USING (doc_id),
         |    unnest(range(1,
         |      greatest(len(string_split_regex(cd.text, '\\s+'))
         |        - 7, 1) + 1)) AS u(i)),
         |cont AS (
         |  SELECT DISTINCT doc_id FROM csh JOIN esh USING (shingle)),
         |fin AS (
         |  SELECT c.doc_id, c.cluster_id, cd.text
         |  FROM canon c JOIN cleand cd USING (doc_id)
         |  WHERE c.doc_id NOT IN (SELECT doc_id FROM cont)),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN ((cluster_id % 1000003) * 2654435761) % 100
         |        < 80 THEN 'train'
         |      WHEN ((cluster_id % 1000003) * 2654435761) % 100
         |        < 90 THEN 'val' ELSE 'test' END AS split,
         |    doc_id // 256 AS shard,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
         |      AS toks
         |  FROM fin),
         |c2 AS (
         |  SELECT split, shard, doc_id, toks,
         |    CAST((sum(toks) OVER (PARTITION BY split, shard
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      - toks) // 512 AS BIGINT) AS bin
         |  FROM sp)
         |SELECT split, CAST(shard AS BIGINT) AS shard, bin,
         |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_toks,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c2 GROUP BY split, shard, bin
         |ORDER BY split, shard, bin""".stripMargin)),

    Q("j_kmv_adaptive_join",
      "The KMV join-size sketch as a WORKING PLANNER HOOK (the r15 " +
        "verdict's carried demo): TWO fact-dim joins over events, " +
        "each planned by Sampling.kmvAdaptiveEquiJoin — estimate " +
        "|fact JOIN dim| from the 64-minimum sketch (Beyer et al. " +
        "2007), compare against the fact row count, and BIND the " +
        "decision physically (broadcast() vs hint('merge'); the " +
        "executed-plan split is spec-pinned). Case 'selective_dim' " +
        "(distinct user_id % 37 == 0 users) REDUCES the fact -> " +
        "estimate under the threshold -> broadcast; case " +
        "'exploding_dim' (raw view events, multiplicity kept) blows " +
        "past it -> shuffle-merge. The estimate, threshold, decision " +
        "AND join aggregates all ride the output row, so the oracle " +
        "replays the complete decision chain — est is the proven " +
        "cross-engine IEEE chain (s * 2^44) / tau from " +
        "agg_kmv_joinsize, and both branches are value-identical by " +
        "construction (a hint changes the physical plan, never the " +
        "semantics).",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val fact = ev.select($"user_id", $"event_id")
        // GLOBAL agg + driver-side decision constants (not a groupBy
        // on the constant columns): an EMPTY join must still emit
        // its one count-0 row, matching the oracle's scalar
        // aggregate — a grouped agg on constants emits zero rows
        // for an empty join and hash-diverges on degenerate corpora
        def run(name: String, dim: DataFrame): DataFrame = {
          val p = Sampling.kmvAdaptivePlan(fact, dim, "user_id",
            k = 64)
          p.joined
            .agg(count(lit(1)).as("join_rows"),
              countDistinct($"user_id").as("n_users"))
            .select(lit(name).as("jcase"),
              lit(p.strategy).as("join_strategy"),
              lit(p.est).as("join_est"),
              lit(p.factRows).as("fact_rows"),
              $"join_rows", $"n_users")
        }
        val selective = ev.filter($"user_id" % 37 === 0)
          .select($"user_id").distinct()
        val exploding = ev.filter($"event_type" === "view")
          .select($"user_id")
        run("exploding_dim", exploding)
          .unionByName(run("selective_dim", selective))
          .orderBy($"jcase")
      },
      Some(s"""WITH fa AS (
         |  SELECT user_id, count(*) AS fa FROM events
         |  GROUP BY user_id),
         |frows AS (SELECT count(*) AS fact_rows FROM events),
         |dima AS (SELECT DISTINCT user_id FROM events
         |  WHERE user_id % 37 = 0),
         |fba AS (SELECT user_id, 1 AS fb FROM dima),
         |dimb AS (SELECT user_id FROM events
         |  WHERE event_type = 'view'),
         |fbb AS (SELECT user_id, count(*) AS fb FROM dimb
         |  GROUP BY user_id),
         |ha AS (
         |  SELECT user_id,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
         |      1, 11)) AS BIGINT) + 1 AS h
         |  FROM (SELECT DISTINCT user_id FROM (
         |    SELECT user_id FROM events
         |    UNION ALL SELECT user_id FROM dima) u)),
         |ra AS (SELECT user_id, h,
         |    ROW_NUMBER() OVER (ORDER BY h, user_id DESC) AS rn
         |  FROM ha),
         |ta AS (SELECT coalesce(max(CASE WHEN rn = 64 THEN h END),
         |    ${Sampling.PriorityScale}) AS tau FROM ra),
         |sa AS (SELECT CAST(coalesce(sum(coalesce(fa.fa, 0) *
         |      coalesce(fba.fb, 0)), 0) AS BIGINT) AS s
         |  FROM ra LEFT JOIN fa USING (user_id)
         |    LEFT JOIN fba USING (user_id)
         |  WHERE ra.rn < 64),
         |esta AS (SELECT (CAST(sa.s AS DOUBLE) *
         |    ${Sampling.PriorityScale}.0)
         |    / CAST(ta.tau AS DOUBLE) AS est FROM sa, ta),
         |hb AS (
         |  SELECT user_id,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
         |      1, 11)) AS BIGINT) + 1 AS h
         |  FROM (SELECT DISTINCT user_id FROM (
         |    SELECT user_id FROM events
         |    UNION ALL SELECT user_id FROM dimb) u)),
         |rb AS (SELECT user_id, h,
         |    ROW_NUMBER() OVER (ORDER BY h, user_id DESC) AS rn
         |  FROM hb),
         |tb AS (SELECT coalesce(max(CASE WHEN rn = 64 THEN h END),
         |    ${Sampling.PriorityScale}) AS tau FROM rb),
         |sb AS (SELECT CAST(coalesce(sum(coalesce(fa.fa, 0) *
         |      coalesce(fbb.fb, 0)), 0) AS BIGINT) AS s
         |  FROM rb LEFT JOIN fa USING (user_id)
         |    LEFT JOIN fbb USING (user_id)
         |  WHERE rb.rn < 64),
         |estb AS (SELECT (CAST(sb.s AS DOUBLE) *
         |    ${Sampling.PriorityScale}.0)
         |    / CAST(tb.tau AS DOUBLE) AS est FROM sb, tb),
         |ja AS (SELECT count(*) AS join_rows,
         |    count(DISTINCT e.user_id) AS n_users
         |  FROM events e JOIN dima USING (user_id)),
         |jb AS (SELECT count(*) AS join_rows,
         |    count(DISTINCT e.user_id) AS n_users
         |  FROM events e JOIN dimb d ON e.user_id = d.user_id)
         |SELECT * FROM (
         |  SELECT 'exploding_dim' AS jcase,
         |    CASE WHEN estb.est < CAST(frows.fact_rows AS DOUBLE)
         |      THEN 'broadcast' ELSE 'shuffle' END AS join_strategy,
         |    estb.est AS join_est,
         |    CAST(frows.fact_rows AS BIGINT) AS fact_rows,
         |    CAST(jb.join_rows AS BIGINT) AS join_rows,
         |    CAST(jb.n_users AS BIGINT) AS n_users
         |  FROM estb, frows, jb
         |  UNION ALL
         |  SELECT 'selective_dim',
         |    CASE WHEN esta.est < CAST(frows.fact_rows AS DOUBLE)
         |      THEN 'broadcast' ELSE 'shuffle' END,
         |    esta.est, CAST(frows.fact_rows AS BIGINT),
         |    CAST(ja.join_rows AS BIGINT), CAST(ja.n_users AS BIGINT)
         |  FROM esta, frows, ja)
         |ORDER BY jcase""".stripMargin)),

    Q("curate_pii_scrub_v2",
      "Widened PII detection + redaction (r16 verdict item: the v1 " +
        "email/NANP/IPv4 set was minimal): SSN-shaped, 16-digit " +
        "card-shaped with an IN-PLAN Luhn re-verification (a pure " +
        "integer expression — fixed-length-16 doubling rule, " +
        "9-wrapped doubles, sum % 10 — no UDF, inside whole-stage " +
        "codegen), and international '+CC' phone cores, all in the " +
        "Java-regex/RE2 common subset. The corpus is augmented " +
        "deterministically so every pattern's counts are " +
        "non-degenerate BY CONSTRUCTION: ~2/11 of docs carry a card " +
        "(one Luhn-VALID class, one Luhn-INVALID class — the " +
        "checksum filter is observably doing work, n_card_luhn < " +
        "n_card), ~1/17 an SSN tail, ~1/13 an intl number; v1's " +
        "email tail rides along so the full 6-pattern redaction " +
        "chain is exercised in one scrubbed string. Redaction is " +
        "conservative (every SHAPED card redacts; the Luhn verdict " +
        "is reported, not used to skip redaction — a scrubber must " +
        "not leak a number because a checksum cleared it). Pure " +
        "per-row map, no shuffle, codegen at corpus scale.",
      (s, d) => {
        import s.implicits._
        val aug = Tables.documents(s, d).select($"doc_id",
          concat($"text",
            when($"doc_id" % 3 === 0,
              concat(lit(" contact user"), $"doc_id".cast("string"),
                lit("@example.com"))).otherwise(lit("")),
            when($"doc_id" % 11 === 3,
              lit(" card 4111-1111-1111-1111 on file"))
              .when($"doc_id" % 11 === 7,
                lit(" card 4111 1111 1111 1112 on file"))
              .otherwise(lit("")),
            when($"doc_id" % 17 === 5,
              concat(lit(" ssn 123-45-"),
                lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
              .otherwise(lit("")),
            when($"doc_id" % 13 === 2,
              concat(lit(" call +44 7"),
                lpad(($"doc_id" % 100000).cast("string"), 5, "0")))
              .otherwise(lit(""))).as("text"))
        graft.ops.TextStats.piiScrubV2(aug, "doc_id", "text")
          .orderBy($"doc_id")
      },
      Some(s"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 3
         |        THEN ' card 4111-1111-1111-1111 on file'
         |      WHEN doc_id % 11 = 7
         |        THEN ' card 4111 1111 1111 1112 on file'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 17 = 5 THEN ' ssn 123-45-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 2 THEN ' call +44 7' ||
         |      lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0')
         |      ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '${graft.ops.TextStats.SsnPattern}')) AS BIGINT)
         |    AS n_ssn,
         |  CAST(len(regexp_extract_all(text,
         |    '${graft.ops.TextStats.CardPattern}')) AS BIGINT)
         |    AS n_card,
         |  CAST(len(list_filter(
         |    list_transform(regexp_extract_all(text,
         |      '${graft.ops.TextStats.CardPattern}'),
         |      c -> translate(c, '- ', '')),
         |    d -> ${graft.ops.TextStats.luhnOk16Sql("d")}))
         |    AS BIGINT) AS n_card_luhn,
         |  CAST(len(regexp_extract_all(text,
         |    '${graft.ops.TextStats.IntlPhonePattern}')) AS BIGINT)
         |    AS n_intl,
         |  regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |    '${graft.ops.TextStats.EmailPattern}', '<EMAIL>', 'g'),
         |    '${graft.ops.TextStats.CardPattern}', '<CARD>', 'g'),
         |    '${graft.ops.TextStats.SsnPattern}', '<SSN>', 'g'),
         |    '${graft.ops.TextStats.IntlPhonePattern}', '<INTL>',
         |      'g'),
         |    '${graft.ops.TextStats.Ipv4Pattern}', '<IP>', 'g'),
         |    '${graft.ops.TextStats.PhonePattern}', '<PHONE>', 'g')
         |    AS scrubbed
         |FROM aug ORDER BY doc_id""".stripMargin)),

    Q("m_embed_infer",
      "Learned EMBEDDING inference (hashing-trick projection, " +
        "Weinberger et al. 2009; fastText sentence-vector shape, " +
        "Joulin et al. 2016 §2) — the encoder that retires the " +
        "engine's last modeled stand-in: e_j = sum over hashed " +
        "uni+bigram features of w[h(f), j], a dim=1024 x outDim=16 " +
        "FIXED-POINT integer matrix product per doc, every e_j an " +
        "exact BIGINT. Plan: ONE feature explode (the classifier's " +
        "shared ngramFeatures), the 16384-cell weight matrix " +
        "PIVOTED to a 1024-row x 16-col broadcast frame so the " +
        "feature stream joins WITHOUT fanning x16 — the 16 " +
        "accumulators ride ONE per-doc hash-agg codegen stage and " +
        "the only exchange carries |docs| partial rows; one " +
        "posexplode restores the (doc, j, e) long form. " +
        "Weights are the deterministic stand-in export; a trained " +
        "encoder drops in as a parquet read of its quantized export " +
        "with the identical plan. Output (doc_id, j, e) sampled to " +
        "doc_id % 5 == 0 to keep the dump row count proportionate " +
        "(the compute runs over the FULL corpus; the filter is on " +
        "the output side so the exchange is measured honestly).",
      (s, d) => {
        import s.implicits._
        val emb = graft.similarity.EmbedInference.embedDocs(
          Tables.documents(s, d), "doc_id", "text",
          graft.similarity.EmbedInference.standInProjection(s,
            1024, 16), 1024, 16)
        emb.filter($"doc_id" % 5 === 0)
          .select($"doc_id", $"j", $"e")
          .orderBy($"doc_id", $"j")
      },
      Some(s"""WITH toks AS (
         |  SELECT doc_id, u.p AS p, toks[u.p + 1] AS tok
         |  FROM (SELECT doc_id,
         |          string_split_regex(trim(text), '\\s+') AS toks
         |        FROM documents) t,
         |    unnest(range(0, len(toks))) AS u(p)),
         |feats AS (
         |  SELECT doc_id, tok AS feat FROM toks
         |  UNION ALL
         |  SELECT doc_id, feat FROM (
         |    SELECT doc_id, tok || ' ' || lead(tok) OVER
         |        (PARTITION BY doc_id ORDER BY p) AS feat
         |    FROM toks) b
         |  WHERE feat IS NOT NULL),
         |w AS (${graft.similarity.EmbedInference
             .standInProjectionSql(1024, 16)}),
         |h AS (
         |  SELECT doc_id,
         |    ${TextClassifier.featureHashSql("feat", 1024)} AS fid
         |  FROM feats)
         |SELECT doc_id, j, CAST(sum(wgt) AS BIGINT) AS e
         |FROM h JOIN w USING (fid)
         |WHERE doc_id % 5 = 0
         |GROUP BY doc_id, j
         |ORDER BY doc_id, j""".stripMargin)),

    Q("e_knn_embed_infer",
      "End-to-end text -> embedding -> retrieval: brute-force " +
        "max-inner-product top-5 over the m_embed_infer vectors, " +
        "scored as the EXACT BIGINT dot sum(e_q[j] * e_c[j]) — the " +
        "whole retrieval chain (tokenize, hash, project, score, " +
        "rank) in integer arithmetic with no float anywhere, so the " +
        "ANN tier's input is now a REAL inference product instead " +
        "of synthetic vectors. Queries = doc_id % 101 == 0 " +
        "(broadcast); candidates = the full corpus; ties broken by " +
        "neighbor id. Plan: the (id, j, e) rows join queries on j " +
        "(16-row fan per doc), one (query, candidate) partial-agg " +
        "exchange, one per-query WindowGroupLimit top-5.",
      (s, d) => {
        import s.implicits._
        val emb = graft.similarity.EmbedInference.embedDocs(
          Tables.documents(s, d), "doc_id", "text",
          graft.similarity.EmbedInference.standInProjection(s,
            1024, 16), 1024, 16)
          // emb feeds query side + candidate side; the checkpoint
          // stops the whole embed plan re-running per side (the
          // r15/r16 measured-checkpoint discipline: embed is the
          // expensive subtree, the checkpoint is |docs|*16 longs)
          .localCheckpoint()
        val q = emb.filter($"doc_id" % 101 === 0)
          .select($"doc_id".as("query_id"), $"j", $"e".as("qe"))
        val scored = emb
          .select($"doc_id".as("neighbor_id"), $"j", $"e")
          .join(broadcast(q), Seq("j"))
          .groupBy($"query_id", $"neighbor_id")
          .agg(sum($"qe" * $"e").as("dot"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"query_id")
          .orderBy($"dot".desc, $"neighbor_id")
        scored.withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"query_id", $"neighbor_id", $"dot",
            $"rank".cast("long").as("rank"))
          .orderBy($"query_id", $"rank")
      },
      Some(s"""WITH toks AS (
         |  SELECT doc_id, u.p AS p, toks[u.p + 1] AS tok
         |  FROM (SELECT doc_id,
         |          string_split_regex(trim(text), '\\s+') AS toks
         |        FROM documents) t,
         |    unnest(range(0, len(toks))) AS u(p)),
         |feats AS (
         |  SELECT doc_id, tok AS feat FROM toks
         |  UNION ALL
         |  SELECT doc_id, feat FROM (
         |    SELECT doc_id, tok || ' ' || lead(tok) OVER
         |        (PARTITION BY doc_id ORDER BY p) AS feat
         |    FROM toks) b
         |  WHERE feat IS NOT NULL),
         |w AS (${graft.similarity.EmbedInference
             .standInProjectionSql(1024, 16)}),
         |emb AS MATERIALIZED (
         |  SELECT doc_id, j, CAST(sum(wgt) AS BIGINT) AS e
         |  FROM (SELECT doc_id,
         |      ${TextClassifier.featureHashSql("feat", 1024)} AS fid
         |    FROM feats) h
         |  JOIN w USING (fid)
         |  GROUP BY doc_id, j),
         |qs AS (SELECT doc_id AS query_id, j, e AS qe FROM emb
         |  WHERE doc_id % 101 = 0),
         |sc AS (
         |  SELECT q.query_id, c.doc_id AS neighbor_id,
         |    CAST(sum(q.qe * c.e) AS BIGINT) AS dot
         |  FROM qs q JOIN emb c USING (j)
         |  GROUP BY q.query_id, c.doc_id),
         |rk AS (
         |  SELECT query_id, neighbor_id, dot,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY dot DESC, neighbor_id) AS rank
         |  FROM sc)
         |SELECT query_id, neighbor_id, dot, CAST(rank AS BIGINT)
         |    AS rank
         |FROM rk WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin)),
  )
}
