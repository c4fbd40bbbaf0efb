package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and the Σx² fold are
  * higher-order array expressions, which Catalyst INTERPRETS (per-element
  * lambda dispatch, boxed accumulator) — PLANS.md rule 9 exists because
  * these dominated the per-pair cost of every similarity query. These
  * expressions run the same math as a tight codegen'd loop inside
  * whole-stage codegen.
  *
  * FP-parity contract (what keeps every oracle gate green): the loop is
  * the IDENTICAL ascending-index left fold — acc = (acc + a[i]·b[i]) from
  * i=0 with acc₀=0.0 — so results are bit-for-bit the old expressions',
  * and bit-for-bit DuckDB's `list_dot_product` (the q56/q57 contract).
  * Null semantics also match: null array → null; mismatched lengths or a
  * null element → null (zip_with pads the shorter side with null, which
  * poisons the old fold the same way).
  */
object VectorExprs {

  private def checkDoubleArray(name: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double>, got ${other.simpleString}")
    }

  case class DotProductExpr(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      checkDoubleArray("dot_product", left.dataType) match {
        case TypeCheckResult.TypeCheckSuccess =>
          checkDoubleArray("dot_product", right.dataType)
        case fail => fail
      }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProductExpr =
      copy(left = newLeft, right = newRight)
  }

  case class SumSquaresExpr(child: Expression) extends UnaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      checkDoubleArray("sum_squares", child.dataType)

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val n = a.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = a.getDouble(i)
        acc += x * x
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val x = ctx.freshName("x")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $x = $a.getDouble($i);
           |  $acc += $x * $x;
           |}
           |if (!${ev.isNull}) ${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): SumSquaresExpr = copy(child = newChild)
  }

  def dot(a: Column, b: Column): Column =
    GraftInterop.column(DotProductExpr(
      GraftInterop.expression(a), GraftInterop.expression(b)))

  def sumSquares(a: Column): Column =
    GraftInterop.column(SumSquaresExpr(GraftInterop.expression(a)))
}
