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

object text {
  private def ex(c: Column) = GraftColumnBridge.expression(c)

  /** Column-API form: `unicode_normalize($"text", "NFC")`. */
  def unicode_normalize(s: Column, form: String): Column =
    GraftColumnBridge.column(
      UnicodeNormalize(ex(s), TextKernels.formOf(form)))
}
