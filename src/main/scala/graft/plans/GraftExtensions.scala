package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType, LongType}

import graft.functions.{BloomExpr, JsRoundExpr, NfcExpr, SlidingMinExpr,
  SortedIntersectExpr, VectorExprs}

/** The library's `SparkSessionExtensions` entry point — extension
  * preference order (c) from the build brief, registered the supported
  * way so a cluster opts in with a config, no code changes:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Injects two things:
  *
  *  1. SQL FUNCTION REGISTRATIONS for every native codegen Expression in
  *     `graft.functions` (js_round, dot_product, sum_squares,
  *     sorted_intersect, sorted_intersect_count, nfc_normalize_graft,
  *     sliding_min, bloom_might_contain_graft) — pure-SQL users get the
  *     same fused whole-stage-codegen nodes the Column API exposes,
  *     session-scoped and catalog-visible, instead of the per-session
  *     `createOrReplaceTempFunction` calls tests use.
  *
  *  2. [[SortedIntersectCountRewrite]], an optimizer `Rule[LogicalPlan]`
  *     that rewrites `size(array_intersect(a, b))` into the native
  *     two-pointer [[SortedIntersectExpr.SortedIntersectCount]] when both
  *     sides are PROVABLY sorted-distinct long arrays (syntactically
  *     `sort_array(array_distinct(_))` ascending, or the reverse
  *     nesting — array_distinct preserves the order of a sorted input).
  *     This automates the hand-optimization PLANS.md records for the
  *     dedup verify stage (hash-set `array_intersect` → linear merge
  *     intersect, measured ~6× on q146's adjacency intersections): the
  *     hash-based intersection allocates and probes a set per row-pair,
  *     the rewritten node is a branch-light codegen'd merge walk.
  *
  * The proof obligation is deliberately SYNTACTIC and conservative: an
  * attribute that happens to hold sorted data does not fire the rule
  * (provenance through projections/exchanges is not traced), a custom
  * `array_sort` comparator never matches, and descending `sort_array`
  * is rejected by the ascending-literal pattern. Wrong-sortedness would
  * silently undercount the intersection, so only shapes the rule can
  * prove locally are rewritten.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    ext.injectOptimizerRule(_ => SortedIntersectCountRewrite)
  }
}

object GraftExtensions {

  private def lit[T](e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** A wrong argument COUNT must surface as a proper analysis-time error
    * naming the expected signature, not an IndexOutOfBoundsException from
    * `e(1)` inside the builder. */
  private def arity(e: Seq[Expression], n: Int, sig: String): Seq[Expression] = {
    if (e.length != n) throw new IllegalArgumentException(
      s"wrong argument count: expected $sig, got ${e.length} argument(s)")
    e
  }

  /** name → builder for every native Expression with a SQL-expressible
    * signature. Names that would shadow a Spark builtin get a `_graft`
    * suffix (nfc_normalize exists in neither, but bloom_might_contain
    * does as `might_contain`; keep ours clearly ours). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "js_round" ->
      (e => { val a = arity(e, 2, "js_round(x, digits)"); JsRoundExpr(a.head, a(1)) }),
    "dot_product" ->
      (e => { val a = arity(e, 2, "dot_product(xs, ys)"); VectorExprs.DotProductExpr(a.head, a(1)) }),
    "sum_squares" ->
      (e => { val a = arity(e, 1, "sum_squares(xs)"); VectorExprs.SumSquaresExpr(a.head) }),
    "sorted_intersect" ->
      (e => { val a = arity(e, 2, "sorted_intersect(xs, ys)"); SortedIntersectExpr.SortedIntersect(a.head, a(1)) }),
    "sorted_intersect_count" ->
      (e => { val a = arity(e, 2, "sorted_intersect_count(xs, ys)"); SortedIntersectExpr.SortedIntersectCount(a.head, a(1)) }),
    "nfc_normalize_graft" ->
      (e => { val a = arity(e, 1, "nfc_normalize_graft(s)"); NfcExpr.Nfc(a.head) }),
    "sliding_min" ->
      (e => { val a = arity(e, 2, "sliding_min(xs, window)"); SlidingMinExpr(a.head, lit(a(1), "sliding_min window")) }),
    "bloom_might_contain_graft" ->
      (e => { val a = arity(e, 2, "bloom_might_contain_graft(filter, x)"); BloomExpr.BloomMightContain(a.head, a(1)) }),
  )
}

/** size(array_intersect(a, b)) → cast(sorted_intersect_count(a, b) as int)
  * when both sides are provably sorted-distinct array&lt;long&gt;. See
  * [[GraftExtensions]] for the proof obligation and the measured win. */
object SortedIntersectCountRewrite extends Rule[LogicalPlan] {

  /** Syntactic proof of "ascending-sorted, distinct, non-null longs":
    * sort_array(array_distinct(_), true) or
    * array_distinct(sort_array(_, true)) — array_distinct keeps first
    * occurrences in order, so a sorted input stays sorted. */
  private def sortedDistinctLongs(e: Expression): Boolean = {
    val shapeOk = e match {
      case SortArray(ArrayDistinct(_), Literal(true, BooleanType)) => true
      case ArrayDistinct(SortArray(_, Literal(true, BooleanType))) => true
      case _ => false
    }
    shapeOk && (e.dataType match {
      case ArrayType(LongType, false) => true
      case _ => false
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull=false only: the legacy mode returns -1 for null
      // input while the native node returns null — not equivalent
      case Size(ArrayIntersect(a, b), false)
          if sortedDistinctLongs(a) && sortedDistinctLongs(b) =>
        Cast(SortedIntersectExpr.SortedIntersectCount(a, b), IntegerType)
    }
}
