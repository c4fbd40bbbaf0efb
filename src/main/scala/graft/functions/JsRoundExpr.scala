package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expression for JS-parity rounding:
  * `floor(x·10^d + 0.5)/10^d` fused into one whole-stage-codegen'd node.
  *
  * The engine's plan-shape rule (SURVEY §7.3) is that built-ins suffice —
  * [[graft.functions.jsRound]] composes floor/×/÷ and codegens fine. This
  * node exists as the library's reference implementation of the custom-
  * Expression extension point (preference order (b) in the build brief):
  * same semantics, one fused expression, `doGenCode` emitting straight
  * Java. Registered for SQL as `js_round`.
  */
case class JsRoundExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == DoubleType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"js_round requires (double, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(x: Any, d: Any): Any = {
    val p = math.pow(10.0, d.asInstanceOf[Int])
    math.floor(x.asInstanceOf[Double] * p + 0.5) / p
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, d) => {
      val p = ctx.freshName("p")
      s"""
         |double $p = java.lang.Math.pow(10.0, $d);
         |${ev.value} = java.lang.Math.floor($x * $p + 0.5) / $p;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsRoundExpr =
    copy(left = newLeft, right = newRight)
}

object JsRoundExpr {
  /** Column-level entry point for the native node. */
  def jsRoundNative(x: Column, digits: Int): Column =
    GraftInterop.column(JsRoundExpr(GraftInterop.expression(x),
      org.apache.spark.sql.catalyst.expressions.Literal(digits)))

  /** Register `js_round(x, d)` for Spark SQL text queries. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "js_round", exprs => JsRoundExpr(exprs.head, exprs(1)), "scala_udf")
}
