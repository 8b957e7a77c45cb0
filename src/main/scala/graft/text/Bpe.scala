package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A REAL byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * arXiv:1508.07909) over a pinned merge table — not the punctuation-run
  * estimate of [[TextOps.tokenCountBpeIsh]]. Replaces nothing: `t_token_bpe`
  * keeps the cheap estimate; `t_bpe_real` serves exact subword counts.
  *
  * == Algorithm and why one pass per rule is exact ==
  * Inference-time BPE repeatedly finds the present pair with the LOWEST
  * merge rank and merges all its occurrences left-to-right, until no pair
  * is in the table (the min-rank iteration — the JVM reference in
  * Round18bOpsSpec implements it literally). This engine instead applies
  * the rules IN RANK ORDER, each as ONE greedy left-to-right
  * non-overlapping pass. The two are identical when the table satisfies
  * the invariant enforced by [[validateTable]]:
  *
  *   (a) every compound constituent of rule r is the output of a rule
  *       with rank < r (true of any learned table — a pair can only be
  *       counted after its parts exist), and
  *   (b) no two rules produce the same output string.
  *
  * Proof sketch: merging two adjacent symbols into one never makes two
  * other symbols adjacent (the merged symbol stands between them), so a
  * NEW occurrence of pair (x_r, y_r) after pass r would need a new x_r or
  * y_r symbol to be created; by (b) the only rule producing x_r is its
  * unique producer, which by (a) has rank < r and has already run its
  * exhaustive pass — and single-character symbols are never created. So
  * after pass r the pair (x_r, y_r) can never reappear, which is exactly
  * the state min-rank iteration leaves that pair in. The spec backs the
  * argument with a 400-word seeded property harness vs the literal
  * min-rank reference.
  *
  * == Cross-engine exactness ==
  * One greedy LTR pass for pair (x, y) is ONE literal (non-regex) string
  * `replace` on a sentinel-wrapped token string: the token sequence
  * [t1, t2, ...] is encoded as `,,t1,,t2,,` (every boundary is a DOUBLE
  * comma; symbols are [a-z]-only so the sentinel cannot occur inside a
  * token), and the pass is
  *
  *   replace(s, ",x,,y,", ",xy,")
  *
  * — the single-comma pattern edges each consume one comma of the
  * adjacent double boundary and the replacement restores it, so a chain
  * like x,y,x,y merges BOTH pairs in one pass (a single-comma encoding
  * would eat the shared boundary and silently skip the second pair), and
  * an overlapping run like a,a,a under rule (a,a) merges only the first
  * two — exactly greedy non-overlapping LTR. Spark's `replace`
  * (UTF8String.replace), DuckDB's `replace`, and java.lang.String
  * .replace all scan left-to-right and resume AFTER the replacement —
  * the same semantics — so [[tokenCount]] and [[countSql]] are generated
  * from the SAME [[merges]] table and agree exactly, which is what the
  * driver's hash gate checks.
  *
  * == Scale ==
  * The whole tokenizer is a per-row expression chain (R=32 nested
  * replaces inside a `transform` lambda): no shuffle, no UDF, no state —
  * whole-stage codegen keeps it at parquet-scan speed, and on a
  * 1000-executor cluster it is embarrassingly parallel. Cost is
  * O(R × word length) per word with small constants; the merge table
  * ships inside the serialized expression tree (the model-as-literal
  * pattern used by the classifier), so there is no side lookup at all.
  *
  * Reference scope note: the reference pipeline (hubmapconsortium/
  * codex-data-products) has no subword tokenizer; this is part of the
  * training-data-pipeline extension surface (token counting family,
  * SURVEY.md §2 extensions).
  */
object Bpe {

  /** Pinned merge table, rank order = application order. English-digram
    * flavored, with multi-level chains (t+h→th→the→there, i+n→in→ing,
    * a+n→an→and, e+s→es→est, c+o→co→com→comp, e+r→er→ers, o+u→ou→out) so
    * rank-order sensitivity is actually exercised. */
  val merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "s"), ("o", "r"), ("e", "n"), ("s", "t"), ("es", "t"),
    ("o", "u"), ("ou", "t"), ("a", "l"), ("e", "d"), ("i", "s"),
    ("i", "t"), ("o", "f"), ("a", "s"), ("h", "e"), ("t", "o"),
    ("l", "e"), ("c", "o"), ("co", "m"), ("com", "p"), ("the", "re"),
    ("w", "h"), ("er", "s"))

  /** Enforces the exactness invariant (see class doc): distinct pairs,
    * distinct outputs, and every compound constituent produced by a
    * strictly earlier rule. Raises on violation — a table that fails this
    * would make the rank-order pass diverge from true min-rank BPE. */
  def validateTable(table: Seq[(String, String)]): Unit = {
    require(table.distinct.size == table.size, "duplicate merge pair")
    val outs = table.map { case (x, y) => x + y }
    require(outs.distinct.size == outs.size, "duplicate merge output")
    table.zipWithIndex.foreach { case ((x, y), r) =>
      Seq(x, y).foreach { s =>
        require(s.nonEmpty && s.forall(c => c >= 'a' && c <= 'z'),
          s"rule $r: symbol '$s' outside [a-z]+")
        require(s.length == 1 || outs.take(r).contains(s),
          s"rule $r: compound constituent '$s' not produced by an " +
            "earlier rule — rank-order application would not be exact")
      }
    }
  }
  validateTable(merges)

  /** `word` ([a-z]+ column) → sentinel-wrapped single-char symbol string
    * `,,c1,,c2,,`. */
  private def wrap(word: Column): Column =
    concat(lit(",,"), regexp_replace(word, "(.)", "$1,,"))

  /** The R merge passes, loop-unrolled over the pinned table (the
    * documented loop-unroll discipline: the bound is the table length, a
    * compile-time constant, so no iterative fixpoint is needed). */
  private def applyMerges(s: Column): Column =
    merges.foldLeft(s) { case (c, (x, y)) =>
      replace(c, lit(s",$x,,$y,"), lit(s",$x$y,"))
    }

  /** Subword tokens of one lowercase word, as an array column (spec /
    * inspection surface; [[tokenCount]] inlines the count instead). */
  def encodeWord(word: Column): Column =
    filter(split(applyMerges(wrap(word)), ",,"), t => length(t) > 0)

  /** Exact BPE token count for a document: whitespace pre-tokenization;
    * [a-z]+ words are BPE-encoded against [[merges]], any other word
    * counts as 1 fallback token (the simplified GPT-2-style pre-tokenizer
    * contract). NULL text → NULL; blank text → 0. */
  def tokenCount(text: Column): Column = {
    val words = filter(split(trim(text), "\\s+"), w => length(w) > 0)
    val counts = transform(words, w =>
      when(w.rlike("^[a-z]+$"),
        // split of ,,t1,,t2,, by ,, is ["", t1, t2, ""] → size - 2
        (size(split(applyMerges(wrap(w)), ",,")) - 2).cast("long"))
        .otherwise(lit(1L)))
    when(text.isNull, lit(null).cast("long"))
      .otherwise(aggregate(counts, lit(0L), (a, x) => a + x))
  }

  /** DuckDB transliteration of [[applyMerges]] — generated from the SAME
    * table, same nesting order. `expr` must already be the wrapped form. */
  private def applyMergesSql(expr: String): String =
    merges.foldLeft(expr) { case (e, (x, y)) =>
      s"replace($e, ',$x,,$y,', ',$x$y,')"
    }

  /** DuckDB expression for the BPE token count of one word expression
    * (assumed [a-z]+, non-empty). */
  def wordCountSql(wordExpr: String): String = {
    val wrapped = s"',,' || regexp_replace($wordExpr, '(.)', '\\1,,', 'g')"
    s"len(string_split(${applyMergesSql(wrapped)}, ',,')) - 2"
  }
}
