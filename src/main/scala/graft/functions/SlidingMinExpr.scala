package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: sliding-window minima of a long array via
  * the ascending-minima (monotonic deque) algorithm — O(m) total instead
  * of the O(m·w) `transform(sequence(...), j -> array_min(slice(a, j, w)))`
  * formulation. This is the winnowing hot loop (Schleimer/Wilkerson/Aiken
  * SIGMOD'03): for book-length documents and the recommended w≈50+, the
  * slice formulation does w array reads per window; the deque does
  * amortized O(1). Semantics are identical: element i of the result is
  * `min(a[i], …, a[i+w-1])`, result length `max(0, m-w+1)`.
  *
  * Precondition: array elements are non-null (the winnowing pipeline's
  * k-gram hashes always are). Null ARRAY input → null output.
  */
case class SlidingMinExpr(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_min requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    val n = m - w + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    val dq = new Array[Int](m) // deque of candidate indices, ascending values
    var head = 0
    var tail = 0
    var i = 0
    while (i < m) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a.getLong(dq(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $m = $a.numElements();
         |int $n = $m - $w + 1;
         |if ($n <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$n];
         |  int[] $dq = new int[$m];
         |  int $head = 0, $tail = 0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $v = $a.getLong($i);
         |    while ($tail > $head && $a.getLong($dq[$tail - 1]) >= $v) $tail--;
         |    $dq[$tail++] = $i;
         |    if ($dq[$head] <= $i - $w) $head++;
         |    if ($i >= $w - 1) $out[$i - $w + 1] = $a.getLong($dq[$head]);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SlidingMinExpr = copy(child = newChild)
}

object SlidingMinExpr {
  /** Column-level entry point. */
  def slidingMin(arr: Column, w: Int): Column =
    GraftInterop.column(SlidingMinExpr(GraftInterop.expression(arr), w))
}
