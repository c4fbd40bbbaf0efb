package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text normalization — the hottest expression in the
  * engine, made codegen-cheap.
  *
  * [[Text.normalize]] is `regexp_replace(lower(trim(text)), "\\s+", " ")`:
  * three full passes, one of them java.util.regex with per-match
  * Matcher/StringBuffer machinery. It opens EVERY text pipeline
  * (fingerprints, shingles, tokens, cleaning, BM25, the q76 carrier), and
  * profiling put it at ~3.2 s of the q76 carrier's cost at sf0.1 — the
  * single most expensive expression in the repo. This expression computes
  * the IDENTICAL string in one byte-level pass.
  *
  * Exactness contract (what keeps all ~40 text-gate oracles green):
  *  - ASCII fast path (any input whose bytes are all < 0x80): replicate
  *    the composition precisely — strip leading/trailing 0x20 (Spark's
  *    `trim` removes ONLY spaces since SPARK-17299), lowercase A-Z, and
  *    collapse every run of Java-regex `\s` = [ \t\n\x0B\f\r] to one
  *    space. Note `\s` runs at the (post-trim) ends collapse to a KEPT
  *    leading/trailing space, exactly as the regex form behaves.
  *  - Non-ASCII inputs take [[NormalizeTextExpr.slowPath]]: literally the
  *    same JDK machinery Spark's own operators bottom out in
  *    (space-only trim, `String.toLowerCase()` as `UTF8String
  *    .toLowerCase` does for non-ASCII, `java.util.regex` replaceAll —
  *    Spark's RegExpReplace wraps the same Pattern engine), so the
  *    result is bit-identical by construction, just not faster.
  *
  * A property spec pins new ≡ old on the full synthetic corpus and on
  * adversarial inputs (runs of every `\s` member at every position,
  * vertical tab, NBSP and other non-`\s` Unicode whitespace, empty and
  * all-space strings, non-ASCII letters).
  */
object NormalizeTextExpr {

  /** `\s` per java.util.regex: space, tab, LF, VT, FF, CR. */
  @inline private def isJavaRegexWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Single-pass ASCII normalize; assumes all bytes < 0x80. */
  private def fastAscii(bytes: Array[Byte]): UTF8String = {
    var st = 0
    var en = bytes.length
    while (st < en && bytes(st) == 0x20) st += 1
    while (en > st && bytes(en - 1) == 0x20) en -= 1
    val out = new Array[Byte](en - st)
    var o = 0
    var i = st
    var inRun = false
    while (i < en) {
      val b = bytes(i)
      if (isJavaRegexWs(b)) {
        if (!inRun) { out(o) = 0x20; o += 1; inRun = true }
      } else {
        inRun = false
        out(o) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Exact reference composition on the JDK — used for non-ASCII inputs
    * and as the oracle side of the equivalence spec. */
  private[functions] def slowPath(s: String): String = {
    var st = 0
    var en = s.length
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    s.substring(st, en).toLowerCase.replaceAll("\\s+", " ")
  }

  /** Called from both interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) return UTF8String.fromString(slowPath(s.toString))
      i += 1
    }
    fastAscii(bytes)
  }

  case class NormalizeText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"normalize_text requires string, got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any =
      normalize(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NormalizeTextExpr.normalize($c)")

    override protected def withNewChildInternal(
        newChild: Expression): NormalizeText = copy(child = newChild)
  }

  def apply(c: Column): Column =
    GraftInterop.column(NormalizeText(GraftInterop.expression(c)))
}
