package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression `graft_eq_count(array<bigint>, array<bigint>)
  * -> bigint`: positions where the two arrays agree — the MinHash
  * similarity-estimate kernel.
  *
  * Every LSH band join estimates pair similarity as
  * `size(filter(zip_with(mh_a, mh_b, (x,y) -> x = y), m -> m)) / K` and
  * runs that on EVERY pre-distinct join row (d03/d06/d11/d14/d16 all sit
  * on this path). The HOF chain is CodegenFallback — two interpreted
  * lambdas and K boxed longs per candidate row. This expression computes
  * the identical integer count (no floating point anywhere, so the /K +
  * round downstream is bit-unchanged and every oracle hash holds) in one
  * compiled loop. Same loud dimension contract as
  * [[DotProductExpr]]. */
case class EqCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = EqCountExpr.functionName

  override def nullSafeEval(a: Any, b: Any): Any =
    EqCountExpr.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EqCountExpr.eqCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCountExpr =
    copy(left = newLeft, right = newRight)
}

object EqCountExpr {

  /** Static entry point referenced from generated code. */
  def eqCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_eq_count: dimension mismatch ${n} vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      // loud, like the dimension contract: UnsafeArrayData would read a
      // null element as 0 and count spurious agreements
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_eq_count: null element at position $i")
      if (a.getLong(i) == b.getLong(i)) acc += 1
      i += 1
    }
    acc
  }

  val functionName = "graft_eq_count"

  /** SparkSessionExtensions hook: `builder.withExtensions(EqCountExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[EqCountExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$functionName expects exactly 2 arguments, got ${children.length}")
        EqCountExpr(children.head, children(1))
      }))
}
