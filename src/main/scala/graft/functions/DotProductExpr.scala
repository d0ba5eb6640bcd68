package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression `graft_dot(array<double>, array<double>) ->
  * double`: the embedding-query hot loop.
  *
  * The HOF formulation `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0,
  * (acc,x) -> acc+x)` is the cross-engine REFERENCE formula (it is what
  * the DuckDB oracle's `list_dot_product` mirrors — both reduce strictly
  * left to right), but Spark's higher-order functions are CodegenFallback:
  * every dot product interprets two lambdas and boxes 64 doubles, and the
  * kNN/ANN operators run one dot per (query, candidate) pair. This
  * expression computes the IDENTICAL double — same multiply, same
  * left-to-right accumulation order, so results are bit-equal and every
  * oracle hash is unchanged — in one compiled loop that stays inside
  * whole-stage codegen via a static call like [[TextSignatureExpr]].
  *
  * Inputs must be same-length arrays with no null elements (embedding
  * vectors by construction); a length mismatch fails loudly rather than
  * zip_with's silent null-padding, and a null ELEMENT fails equally
  * loudly (an UnsafeArrayData would otherwise read it as 0.0) — a
  * dimension or null bug must not become a wrong similarity. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = DotProductExpr.functionName

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProductExpr.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {

  /** Static entry point referenced from generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: dimension mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      // loud, like the dimension contract: UnsafeArrayData would read a
      // null element as 0.0 and yield a silently wrong dot product
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_dot: null element at position $i")
      acc += a.getDouble(i) * b.getDouble(i); i += 1
    }
    acc
  }

  val functionName = "graft_dot"

  /** SparkSessionExtensions hook: `builder.withExtensions(DotProductExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[DotProductExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$functionName expects exactly 2 arguments, got ${children.length}")
        DotProductExpr(children.head, children(1))
      }))
}
