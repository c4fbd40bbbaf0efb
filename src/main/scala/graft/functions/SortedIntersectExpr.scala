package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native merge-intersection of two SORTED long arrays.
  *
  * The workhorse of adjacency-list triangle counting
  * ([[graft.operators.Triangles]]): for an oriented edge (u,v) the
  * triangles through it are exactly N⁺(u) ∩ N⁺(v), and with both
  * neighbor lists sorted the intersection is one two-pointer merge —
  * O(|a|+|b|) with zero allocation beyond the result. Spark's builtin
  * `array_intersect` builds a hash set per call and is interpreted
  * (PLANS.md rule 9 — higher-order/collection expressions outside
  * codegen dominated per-pair cost everywhere they sat on a hot path);
  * this runs as a tight loop inside whole-stage codegen.
  *
  * Contract: both inputs are array<long> sorted ascending with no null
  * elements and no duplicates (the caller's `sort_array(collect_list)`
  * of distinct edges guarantees it); null input → null output. Duplicate
  * or unsorted inputs produce set-semantics-violating output rather than
  * an error — this is a plan-internal primitive, not a user-facing
  * function.
  */
object SortedIntersectExpr {

  /** Two-pointer merge intersection; called from interpreted eval and
    * generated code. */
  def intersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var o = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(o) = x; o += 1; i += 1; j += 1 }
    }
    new GenericArrayData(
      if (o == out.length) out else java.util.Arrays.copyOf(out, o))
  }

  /** Intersection COUNT only — no result array allocation; the verify
    * stage's inner loop (it needs |A∩B|, not the elements). */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  private def checkLongArray(dt: DataType): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect requires array<bigint>, got ${other.simpleString}")
  }

  case class SortedIntersect(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      checkLongArray(left.dataType) match {
        case TypeCheckResult.TypeCheckSuccess => checkLongArray(right.dataType)
        case fail => fail
      }

    override def nullSafeEval(l: Any, r: Any): Any =
      intersect(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SortedIntersectExpr.intersect($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersect =
      copy(left = newLeft, right = newRight)
  }

  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      checkLongArray(left.dataType) match {
        case TypeCheckResult.TypeCheckSuccess => checkLongArray(right.dataType)
        case fail => fail
      }

    override def nullSafeEval(l: Any, r: Any): Any =
      intersectCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SortedIntersectExpr.intersectCount($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  def apply(a: Column, b: Column): Column =
    GraftInterop.column(SortedIntersect(
      GraftInterop.expression(a), GraftInterop.expression(b)))

  def count(a: Column, b: Column): Column =
    GraftInterop.column(SortedIntersectCount(
      GraftInterop.expression(a), GraftInterop.expression(b)))
}
