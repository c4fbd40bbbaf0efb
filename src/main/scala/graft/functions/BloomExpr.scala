package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Native codegen probe for [[graft.operators.BloomFilter]]: `might_contain
  * (bitset, hash60)` as a whole-stage-codegen boolean — the probe side of
  * the broadcast Bloom pre-filter stays inside the scan's codegen stage
  * (no UDF serialization boundary), which is the point of pre-filtering at
  * 100 TB: the filter evaluates at scan speed, before any exchange. */
object BloomExpr {

  case class BloomMightContain(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = left.nullable || right.nullable

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires (binary, bigint), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }

    override def nullSafeEval(bits: Any, h: Any): Any =
      graft.operators.BloomFilter.mightContain(
        bits.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, h) =>
        s"graft.operators.BloomFilter.mightContain($b, $h)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomMightContain =
      copy(left = newLeft, right = newRight)
  }

  /** `mightContain(lit(bitsetBytes), hash60Col)`. */
  def mightContain(bits: Column, h: Column): Column =
    GraftInterop.column(BloomMightContain(
      GraftInterop.expression(bits), GraftInterop.expression(h)))
}
