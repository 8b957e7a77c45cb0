package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization over string columns.
  *
  * Dedup keys over web text MUST normalize before hashing: the same
  * visible text arrives both precomposed (U+00E9 é) and decomposed
  * (e + U+0301), and a byte-level MinHash/SimHash/exact-hash treats
  * them as different documents — false negatives exactly where dedup
  * matters. Spark has no built-in normalizer (only lower/upper/trim),
  * so this is a native unary `Expression` whose generated code is one
  * static call into [[TextKernels.normalize]] — it inlines into
  * whole-stage codegen like a built-in, no UDF boxing.
  *
  * The kernel fast-paths all-ASCII input via `UTF8String.isFullAscii`
  * — a byte scan over the existing buffer, ZERO allocation (ASCII is
  * normal under every form) — so the normalize pass costs ~a strlen
  * for the overwhelmingly-ASCII bulk at 100 TB; only rows carrying
  * non-ASCII pay a String copy, and only rows carrying combining
  * sequences pay the actual normalize.
  *
  * Composed into dedup keys via [[graft.dedup.Dedup.exactNormalized]]
  * (the `d_exact_nfc` query): normalize-before-hash is the reason this
  * expression exists.
  */
object TextKernels {
  // stable ordinals (NOT Form.values() order-dependent) — codegen embeds
  // the int so the generated source never names the enum
  final val NFC = 0
  final val NFD = 1
  final val NFKC = 2
  final val NFKD = 3

  def formOf(name: String): Int = name.toUpperCase match {
    case "NFC" => NFC
    case "NFD" => NFD
    case "NFKC" => NFKC
    case "NFKD" => NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' " +
        "(expected NFC/NFD/NFKC/NFKD)")
  }

  private def javaForm(form: Int): java.text.Normalizer.Form = form match {
    case NFC => java.text.Normalizer.Form.NFC
    case NFD => java.text.Normalizer.Form.NFD
    case NFKC => java.text.Normalizer.Form.NFKC
    case _ => java.text.Normalizer.Form.NFKD
  }

  def normalize(s: UTF8String, form: Int): UTF8String = {
    // true zero-alloc fast path: ASCII is normal under every Unicode
    // form, and isFullAscii scans the UTF8String's own bytes — no
    // toString copy. The overwhelmingly-ASCII 100 TB bulk costs ~a
    // strlen per row and generates zero garbage.
    if (s.isFullAscii) return s
    val f = javaForm(form)
    // non-ASCII rows: one String copy for the JDK normalizer; the
    // already-normalized majority of THOSE still returns the original
    // buffer (isNormalized is a scan, not a rewrite)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** unicode_normalize(s, form) → string; NULL in, NULL out. `form` is a
  * plan-time constant (NFC/NFD/NFKC/NFKD), embedded as an int in the
  * generated code.
  */
case class UnicodeNormalize(child: Expression, form: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects a string column, got ${child.dataType}")
  override def nullSafeEval(s: Any): Any =
    TextKernels.normalize(s.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextKernels.normalize($s, $form)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused md5-prefix hash kernel: the engine's portable hash idiom is
  * `conv(substring(md5(s), 1, n), 16, 10)` — md5 hex, keep the first
  * n hex digits, parse base-16 — which as a built-in chain costs one
  * MessageDigest.getInstance + a 32-char hex encode + a substring
  * copy + a string base-16 parse PER CALL, in the hottest loops the
  * engine has (per-token classifier features, per-gram winnowing
  * fingerprints, per-row sampling priorities). [[HashKernels
  * .md5Prefix]] computes the identical value straight off the digest
  * bytes — thread-local digest instance, zero string allocation —
  * and [[Md5Prefix64]] inlines it into whole-stage codegen. The
  * DuckDB oracles keep the written-out chain; bit-equality for every
  * n in [1, 15] is property-pinned in Md5PrefixSpec.
  */
object HashKernels {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value of the first `nHex` hex digits of md5(s) as a long —
    * bit-equal to `conv(substring(md5(s), 1, nHex), 16, 10)` for
    * 1 ≤ nHex ≤ 15 (≤ 60 bits, so the value is always positive and
    * exact in a BIGINT on every engine). */
  def md5Prefix(s: UTF8String, nHex: Int): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** md5_prefix64(s, nHex) → long; NULL in, NULL out. `nHex` is a
  * plan-time constant in [1, 15], embedded in the generated code. */
case class Md5Prefix64(child: Expression, nHex: Int)
    extends UnaryExpression {
  require(nHex >= 1 && nHex <= 15,
    s"md5_prefix64: nHex must be in [1, 15], got $nHex")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix64 expects a string column, got ${child.dataType}")
  // readable explain output (r18 advice: the default case-class
  // rendering hid which kernel the plan runs)
  override def prettyName: String = "md5_prefix64"
  override def nullSafeEval(s: Any): Any =
    HashKernels.md5Prefix(s.asInstanceOf[UTF8String], nHex)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.HashKernels.md5Prefix($s, $nHex)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Identity wrapper DECLARED non-deterministic — the built-in-
  * expression analog of guide §4.4's `udf.asNondeterministic()`: the
  * optimizer may not push, duplicate, reorder or constant-fold an
  * expression it cannot assume deterministic, so wrapping a filter
  * predicate that references an EXPENSIVE projected column (a
  * tokenize, a normalize chain) stops PushPredicateThroughNonJoin
  * from substituting the column's defining expression below the
  * projection and evaluating it twice per row (r19 plan audit found
  * this duplication in the winnowing normalize chain and the
  * curation token-count gates). Value-identical to its child by
  * construction; evaluation and codegen are a plain pass-through.
  * Apply ONLY to predicates whose referenced columns are expensive —
  * a pinned predicate also blocks legitimate pushdown past it.
  */
case class Pinned(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pinned"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object text {
  private def ex(c: Column) = GraftColumnBridge.expression(c)

  /** Column-API form: `unicode_normalize($"text", "NFC")`. */
  def unicode_normalize(s: Column, form: String): Column =
    GraftColumnBridge.column(
      UnicodeNormalize(ex(s), TextKernels.formOf(form)))

  /** Column-API form: `md5_prefix64($"tok", 15)` ≡
    * `conv(substring(md5(tok), 1, 15), 16, 10)` cast long. */
  def md5_prefix64(s: Column, nHex: Int): Column =
    GraftColumnBridge.column(Md5Prefix64(ex(s), nHex))

  /** Column-API form of [[Pinned]] — see its scaladoc for when (and
    * when NOT) to pin a predicate. */
  def pinned(c: Column): Column =
    GraftColumnBridge.column(Pinned(ex(c)))
}
