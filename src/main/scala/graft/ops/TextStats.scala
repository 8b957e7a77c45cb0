package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition statistics for corpus curation (Rae et al. 2021 App. A
  * "repetitious text" family): how much of a document is one n-gram
  * repeated over and over. Gopher thresholds the fraction of
  * characters in the most frequent 2-/3-gram; this operator computes
  * the char-coverage variant `rep_n = max over n-grams of
  * (count · n-gram length)` — the most characters attributable to a
  * single repeated n-gram. One max over integers: no
  * most-frequent-tie to break, deterministic on every engine, and
  * monotone-related to Gopher's metric (the most frequent gram's
  * coverage is always ≤ rep_n).
  *
  * Exactness: every output is a BIGINT (counts, char totals, products
  * of the two); threshold decisions are left to the caller as
  * cross-multiplied comparisons — no division exists here.
  *
  * Scale: the uni/bi/tri-gram streams are TAGGED and fused into ONE
  * explode feeding ONE (doc, n, gram) partial-agg groupBy (map-side
  * combine collapses the repeats that make a doc flaggable — the
  * worst-case doc shrinks the MOST), then one per-doc conditional
  * agg. Two exchanges total, no windows, no joins.
  */
object TextStats {

  /** Per-doc repetition summary: (id, n_toks, dup_toks, rep2_chars,
    * rep3_chars) where dup_toks = n_toks − distinct tokens,
    * rep{2,3}_chars = max(count · length(gram)) over adjacent token
    * {2,3}-grams (space-joined, so gram length = covered chars +
    * separators — the window the repeated text occupies). Docs with
    * fewer than n tokens report rep_n = 0. */
  def repetitionStats(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    // spread the under-split scan BEFORE the 3-gram-size explode +
    // partial agg (r19: ProfOne showed this stage running as ONE
    // 1.4 s task at sf0.1/32c — the scan is a single parquet file,
    // and everything up to the groupBy exchange inherits its
    // parallelism; the same under-split-scan fix every other
    // tokenizing path got in r18). Results are unchanged: the
    // per-doc aggregation is keyed by id and the exchange is keyed
    // the same way.
    val toks = TextClassifier.spread(docs, col(idCol))
      .select(col(idCol),
        split(trim(col(textCol)), "\\s+").as("__toks"))
    // adjacent n-grams from the token ARRAY (narrow, no per-doc
    // window sort); the size guard exists because Spark's
    // sequence(a, b) DESCENDS when a > b instead of returning empty
    def grams(n: Int) =
      s"CASE WHEN size(__toks) < $n THEN array() " +
        s"ELSE transform(sequence(0, size(__toks) - $n), " +
        s"i -> named_struct('n', $n, 'gram', " +
        s"array_join(slice(__toks, i + 1, $n), ' '))) END"
    toks.select(col(idCol), explode(concat(
        expr(grams(1)), expr(grams(2)), expr(grams(3)))).as("g"))
      .select(col(idCol), col("g.n").as("n"), col("g.gram").as("gram"))
      .groupBy(col(idCol), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("n") === 1, col("cnt")).otherwise(0L))
          .as("n_toks"),
        (sum(when(col("n") === 1, col("cnt")).otherwise(0L)) -
          sum(when(col("n") === 1, 1L).otherwise(0L))).as("dup_toks"),
        coalesce(max(when(col("n") === 2,
          col("cnt") * length(col("gram")).cast("long"))), lit(0L))
          .as("rep2_chars"),
        coalesce(max(when(col("n") === 3,
          col("cnt") * length(col("gram")).cast("long"))), lit(0L))
          .as("rep3_chars"))
  }

  /** The FUSED curation-rule pass: Gopher word-shape stats (Rae et
    * al. 2021 App. A), repetition stats ([[repetitionStats]]) and the
    * learned-classifier dot product (graft.ops.TextClassifier) in ONE
    * tokenize → ONE tagged uni/bi/tri-gram explode → ONE (doc,n,gram)
    * partial-agg exchange → ONE broadcast weight join → ONE per-doc
    * agg. Correctness hinges on one algebraic fact, spec-pinned
    * against the three stand-alone operators: the classifier's
    * per-occurrence sum Σ_f w[h(f)] equals the per-DISTINCT-gram sum
    * Σ_g cnt_g·w[h(g)] over n ≤ 2 grams, so the classifier rides the
    * same collapsed gram counts the repetition max needs anyway —
    * three rule stages, zero extra corpus passes.
    *
    * Output per doc: (id, n_chars, n_words, word_chars, n_alpha,
    * n_stop, n_sym, dup_toks, rep2_chars, rep3_chars, n_feats, dot).
    * Threshold decisions stay with the caller as cross-multiplied
    * BIGINT comparisons. `weights` must be EXACTLY one (fid, wgt)
    * row per fid in [0, dim) — enforced by the SAME
    * TextClassifier.requireFullCoverage guard as scoreDocs (the
    * left join below pads n=3 grams with NULL wgt by design, so a
    * sparse export would otherwise silently drop classifier
    * features from dot while still counting them in n_feats —
    * diverging from the spec-pinned scoreDocs equivalence with no
    * error). NULL-text docs vanish (explode of a NULL array),
    * matching the scoreDocs/oracle convention. */
  def curationStats(docs: DataFrame, idCol: String, textCol: String,
                    weights: DataFrame, dim: Int): DataFrame = {
    TextClassifier.requireFullCoverage(weights, dim)
    val stop = Seq("the", "be", "to", "of", "and", "that",
      "have", "with")
    val tokArr = TextClassifier.spread(docs, col(idCol))
      .select(col(idCol),
        length(trim(col(textCol))).cast("long").as("n_chars"),
        split(trim(col(textCol)), "\\s+").as("__toks"))
    def grams(n: Int) =
      s"CASE WHEN size(__toks) < $n THEN array() " +
        s"ELSE transform(sequence(0, size(__toks) - $n), " +
        s"i -> named_struct('n', $n, 'gram', " +
        s"array_join(slice(__toks, i + 1, $n), ' '))) END"
    val gc = tokArr
      .select(col(idCol), col("n_chars"), explode(concat(
        expr(grams(1)), expr(grams(2)), expr(grams(3)))).as("g"))
      .select(col(idCol), col("n_chars"),
        col("g.n").as("n"), col("g.gram").as("gram"))
      .groupBy(col(idCol), col("n"), col("gram"))
      .agg(max(col("n_chars")).as("n_chars"), count(lit(1)).as("cnt"))
      .withColumn("fid", when(col("n") <= 2,
        TextClassifier.featureHash(col("gram"), dim)))
    val symCount = expr(
      "(length(gram) - length(replace(gram, '#', ''))) + " +
        "((length(gram) - length(replace(gram, '...', ''))) " +
        "div 3)").cast("long")
    gc.join(broadcast(weights), Seq("fid"), "left")
      .groupBy(col(idCol))
      .agg(max(col("n_chars")).as("n_chars"),
        sum(when(col("n") === 1, col("cnt")).otherwise(0L))
          .as("n_words"),
        sum(when(col("n") === 1,
          col("cnt") * length(col("gram")).cast("long"))
          .otherwise(0L)).as("word_chars"),
        sum(when(col("n") === 1 && col("gram").rlike("[a-zA-Z]"),
          col("cnt")).otherwise(0L)).as("n_alpha"),
        sum(when(col("n") === 1 && col("gram").isin(stop: _*),
          col("cnt")).otherwise(0L)).as("n_stop"),
        sum(when(col("n") === 1, col("cnt") * symCount)
          .otherwise(0L)).as("n_sym"),
        (sum(when(col("n") === 1, col("cnt")).otherwise(0L)) -
          sum(when(col("n") === 1, 1L).otherwise(0L)))
          .as("dup_toks"),
        coalesce(max(when(col("n") === 2,
          col("cnt") * length(col("gram")).cast("long"))), lit(0L))
          .as("rep2_chars"),
        coalesce(max(when(col("n") === 3,
          col("cnt") * length(col("gram")).cast("long"))), lit(0L))
          .as("rep3_chars"),
        sum(when(col("n") <= 2, col("cnt")).otherwise(0L))
          .as("n_feats"),
        sum(when(col("n") <= 2, col("cnt") * col("wgt"))
          .otherwise(0L)).as("dot"))
  }

  /** [[curationStats]] as a PURE PER-ROW MAP — the scoreDocsInline
    * treatment applied to the WHOLE fused rule pass: no explode, no
    * join, no aggregation, so a streaming gate built on it has ZERO
    * stateful operators (per-arrival cost is one row's expressions)
    * and a batch gate adds no exchange. The weight table ships as a
    * literal map (dim entries — the model-as-artifact pattern).
    * Identical output to [[curationStats]] row for row (spec-pinned):
    * word-shape stats are per-token folds; dup_toks is
    * size − size(array_distinct); the repetition maxima are computed
    * by a run-length fold over the SORTED n-gram array (equal grams
    * are adjacent after sorting, so max(run·len) ≡ the batch path's
    * max over distinct grams of cnt·len) — O(n log n) per doc, still
    * inside one codegen'd projection; the classifier dot is the
    * per-occurrence fold over hashed uni+bigram features. Prefer
    * [[curationStats]] when the corpus is at rest: its collapsed
    * (doc, n, gram) exchange shrinks repetition-heavy docs before
    * the per-doc agg, where this shape carries each doc whole. */
  def curationStatsInline(docs: DataFrame, idCol: String,
                          textCol: String, weights: Map[Long, Long],
                          dim: Int,
                          keep: Seq[String] = Nil): DataFrame = {
    require(weights.size == dim && (0 until dim).forall(i =>
      weights.contains(i.toLong)),
      s"weights must cover every fid in [0, $dim)")
    val stop = Seq("the", "be", "to", "of", "and", "that",
      "have", "with")
    // array-indexed weights, not a literal map — element_at on a
    // literal map linear-scans all dim entries per token (see
    // TextClassifier.scoreDocsInline); coverage of [0, dim) is
    // enforced by the require above
    val wmap = typedLit((0 until dim).map(i => weights(i.toLong)))
    def gramsArr(n: Int) =
      s"CASE WHEN size(__toks) < $n THEN array() " +
        s"ELSE transform(sequence(0, size(__toks) - $n), " +
        s"i -> array_join(slice(__toks, i + 1, $n), ' ')) END"
    // max over distinct grams of count·length, as a run-length fold
    // over the sorted gram array (the first gram sees prev = NULL,
    // so x = acc.prev is NULL and the CASE starts the run at 1)
    def repBest(n: Int) = expr(
      s"""aggregate(array_sort(${gramsArr(n)}),
         |  named_struct('prev', CAST(NULL AS STRING),
         |    'run', 0L, 'best', 0L),
         |  (acc, x) -> named_struct(
         |    'prev', x,
         |    'run', CASE WHEN x = acc.prev THEN acc.run + 1L
         |      ELSE 1L END,
         |    'best', greatest(acc.best,
         |      (CASE WHEN x = acc.prev THEN acc.run + 1L
         |        ELSE 1L END) * CAST(length(x) AS BIGINT))),
         |  acc -> acc.best)""".stripMargin)
    docs
      .filter(col(textCol).isNotNull)
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select((col(idCol) +: keep.map(col)) ++ Seq(
        length(trim(col(textCol))).cast("long").as("n_chars"),
        size(col("__toks")).cast("long").as("n_words"),
        expr("aggregate(__toks, 0L, " +
          "(a, t) -> a + CAST(length(t) AS BIGINT))").as("word_chars"),
        expr("CAST(size(filter(__toks, " +
          "t -> t rlike '[a-zA-Z]')) AS BIGINT)").as("n_alpha"),
        size(filter(col("__toks"),
          t => array_contains(typedLit(stop), t))).cast("long")
          .as("n_stop"),
        expr("aggregate(__toks, 0L, (a, t) -> a + CAST(" +
          "(length(t) - length(replace(t, '#', ''))) + " +
          "((length(t) - length(replace(t, '...', ''))) div 3) " +
          "AS BIGINT))").as("n_sym"),
        (size(col("__toks")) - size(array_distinct(col("__toks"))))
          .cast("long").as("dup_toks"),
        repBest(2).as("rep2_chars"),
        repBest(3).as("rep3_chars"),
        (size(col("__toks")).cast("long") +
          when(size(col("__toks")) < 2, 0L)
            .otherwise(size(col("__toks")).cast("long") - 1L))
          .as("n_feats"),
        aggregate(
          transform(expr(TextClassifier.featsExpr),
            f => TextClassifier.featureHash(f, dim)),
          lit(0L), (acc, fid) => acc +
            element_at(wmap, (fid + 1L).cast("int")))
          .as("dot")): _*)
  }

  /** The 11-predicate curation gate shared by the batch composite
    * (`curate_e2e_pipeline` stages 1-3) and its streaming twin
    * (`stream_curate_pipeline`) — ONE definition so the two plans
    * cannot drift from each other or from the shared oracle CTEs
    * ([[graft.queries.OracleGen.curationGateCtes]]). All thresholds
    * are cross-multiplied BIGINT comparisons over [[curationStats]] /
    * [[curationStatsInline]] columns: Gopher word-shape bounds, the
    * repetition caps, and the classifier score 1000·dot ≥ 5·n_feats.
    */
  def curationGate: Column =
    col("n_words") >= 50L && col("n_words") <= 100000L &&
      lit(3L) * col("n_words") <= col("word_chars") &&
      col("word_chars") <= lit(10L) * col("n_words") &&
      lit(5L) * col("n_alpha") >= lit(4L) * col("n_words") &&
      lit(10L) * col("n_sym") <= col("n_words") &&
      col("n_stop") >= 2L &&
      lit(5L) * col("rep2_chars") <= col("n_chars") &&
      lit(50L) * col("rep3_chars") <= lit(9L) * col("n_chars") &&
      lit(4L) * col("dup_toks") <= lit(3L) * col("n_words") &&
      lit(1000L) * col("dot") >= lit(5L) * col("n_feats")

  /** PII patterns shared by [[piiScrub]] and its oracle — restricted
    * to the regex subset where Java regex (Spark) and RE2 (DuckDB)
    * agree: explicit char classes and counted repetition only — no
    * \s (vertical-tab divergence), no \b, no backrefs, no lookaround
    * (RE2 has none). Email is the standard liberal matcher; phone is
    * the NANP 7-digit core; IPv4 is the syntactic dotted quad. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII detection + redaction per doc: (id, n_email, n_phone, n_ip,
    * scrubbed) — counts are non-overlapping leftmost matches on the
    * ORIGINAL text (each pattern counted independently, so a count
    * never depends on another pattern's redaction), and `scrubbed`
    * replaces email → ip → phone in that fixed order (emails can
    * contain dotted/digit runs, so they must leave the text before
    * the narrower patterns scan; an IPv4 quad contains no '-', so ip
    * vs phone order is inert but pinned anyway). Both engines scan
    * leftmost-non-overlapping, so counts and redactions replay
    * exactly. Pure per-row map work: no shuffle, no explode — the
    * shape that runs at corpus scale inside whole-stage codegen. */
  def piiScrub(docs: DataFrame, idCol: String,
               textCol: String): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long")
        .as("n_email"),
      regexp_count(col(textCol), lit(PhonePattern)).cast("long")
        .as("n_phone"),
      regexp_count(col(textCol), lit(Ipv4Pattern)).cast("long")
        .as("n_ip"),
      regexp_replace(regexp_replace(regexp_replace(col(textCol),
        EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>").as("scrubbed"))

  /** The r17 PII widening (same RE2-common-subset discipline as the
    * three patterns above): SSN-shaped, 16-digit-card-shaped with
    * optional per-group '-'/' ' separators, and international phone
    * cores ('+' country code + 6-12 digits). */
  val SsnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val CardPattern =
    "[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}"
  val IntlPhonePattern = "\\+[0-9]{1,3}[- ]?[0-9]{6,12}"

  /** In-plan Luhn check over an EXACTLY-16-digit string — a pure
    * integer expression (no UDF): with fixed length 16 the
    * from-the-right doubling rule lands on odd LEFT indices, each
    * digit contributes itself or the 9-wrapped double, and the total
    * must divide by 10. Runs inside whole-stage codegen per
    * candidate; both engines evaluate the identical arithmetic. */
  def luhnOk16(d: Column): Column = {
    val idx = sequence(lit(1), lit(16))
    val digits = transform(idx, i => substr(d, i, lit(1)).cast("int"))
    val contrib = zip_with(digits, idx, (dig, i) =>
      when(i % 2 === 1,
        when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2))
        .otherwise(dig))
    aggregate(contrib, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** [[luhnOk16]] as DuckDB SQL over a 16-digit expression. */
  def luhnOk16Sql(dExpr: String): String =
    s"""list_sum(list_transform(range(1, 17), i ->
       |  CASE WHEN i % 2 = 1 THEN
       |    CASE WHEN 2 * CAST(substr($dExpr, CAST(i AS INT), 1)
       |        AS INT) > 9
       |      THEN 2 * CAST(substr($dExpr, CAST(i AS INT), 1)
       |        AS INT) - 9
       |      ELSE 2 * CAST(substr($dExpr, CAST(i AS INT), 1)
       |        AS INT) END
       |    ELSE CAST(substr($dExpr, CAST(i AS INT), 1) AS INT)
       |  END)) % 10 = 0""".stripMargin

  /** Widened PII detection + redaction: (id, n_ssn, n_card,
    * n_card_luhn, n_intl, scrubbed). `n_card` counts card-SHAPED
    * matches; `n_card_luhn` re-verifies each candidate with the
    * in-plan [[luhnOk16]] integer check over its separator-stripped
    * digits — the standard false-positive filter real scrubbers
    * apply (a random 16-digit run passes shape but fails Luhn 90% of
    * the time). Redaction is conservative by design: every SHAPED
    * card redacts (a scrubber must not leak a number because a
    * checksum said it was probably not a card), in the pinned order
    * email → card → ssn → intl → ip → phone (cards/SSNs contain
    * phone-shaped runs, so the wider patterns leave the text first;
    * counts stay independent — each pattern counted on the ORIGINAL
    * text, the v1 convention). Because counts are independent, the
    * per-pattern counts are NOT disjoint: one digit run can count in
    * several columns (e.g. '+1 4111111111111111' counts in n_intl —
    * [[IntlPhonePattern]] matches its first 12 digits — AND in
    * n_card, which matches all 16). Deterministic and identical in
    * both engines, but do not sum the columns expecting a partition
    * of the matches. Pure per-row map work, no shuffle. */
  def piiScrubV2(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(SsnPattern)).cast("long")
        .as("n_ssn"),
      regexp_count(col(textCol), lit(CardPattern)).cast("long")
        .as("n_card"),
      size(filter(regexp_extract_all(col(textCol), lit(CardPattern),
          lit(0)),
        c => luhnOk16(translate(c, "- ", "")))).cast("long")
        .as("n_card_luhn"),
      regexp_count(col(textCol), lit(IntlPhonePattern)).cast("long")
        .as("n_intl"),
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(col(textCol),
          EmailPattern, "<EMAIL>"),
          CardPattern, "<CARD>"),
          SsnPattern, "<SSN>"),
          IntlPhonePattern, "<INTL>"),
          Ipv4Pattern, "<IP>"),
          PhonePattern, "<PHONE>").as("scrubbed"))
}
