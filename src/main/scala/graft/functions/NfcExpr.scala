package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Why it exists: web-crawl text arrives in mixed normalization forms
  * (decomposed combining marks from macOS filesystems and some CMSes,
  * composed from most editors), and every downstream exact-match surface —
  * exact dedup fingerprints (q09), shingle hashes (q14/q15), token counts,
  * blocklist matching (q80) — silently treats "é" (U+00E9) and
  * "e"+U+0301 as different documents unless the corpus is normalized
  * first. NFC is the standard first step of the C4/CCNet cleaning stacks.
  * Spark has no built-in normalization function (Postgres and DuckDB both
  * ship one), so this is a genuine engine-surface gap this expression
  * closes.
  *
  * Scale shape: pure map-side. The fast path exploits that ASCII is
  * NFC-invariant and Latin-script corpora are overwhelmingly ASCII bytes:
  * one vectorizable byte scan, and if no byte ≥ 0x80 the INPUT UTF8String
  * is returned as-is — zero-copy, no JDK String materialization. Only
  * rows that actually contain non-ASCII pay `java.text.Normalizer`
  * (`Form.NFC`, the JDK's ICU-derived implementation — the same tables
  * DuckDB's utf8proc implements, which is what keeps the q148 oracle
  * bit-identical).
  *
  * `Normalizer.isNormalized` is checked before allocating the normalized
  * copy: mixed corpora where the non-ASCII rows are already composed
  * (the common case) stay allocation-free too.
  */
object NfcExpr {

  /** Called from both interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) {
        val str = s.toString
        return if (java.text.Normalizer.isNormalized(
            str, java.text.Normalizer.Form.NFC)) s
        else UTF8String.fromString(java.text.Normalizer.normalize(
          str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s // all-ASCII is NFC by construction
  }

  case class Nfc(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"nfc requires string, got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any =
      nfc(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.NfcExpr.nfc($c)")

    override protected def withNewChildInternal(
        newChild: Expression): Nfc = copy(child = newChild)
  }

  def apply(c: Column): Column =
    GraftInterop.column(Nfc(GraftInterop.expression(c)))
}
