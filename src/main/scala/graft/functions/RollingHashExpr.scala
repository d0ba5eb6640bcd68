package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextHash

/** Native Catalyst expression for the d13/d27 rolling char hash:
  * `graft_rollhash(text, seed) -> bigint`, the seeded whole-text fold
  * `acc = (acc * 31 + codepoint) % P` with `'' -> seed`.
  *
  * The HOF formulation (`aggregate(transform(sequence(1, length(text)),
  * i -> ascii(substring(text, i, 1))), seed, ...)` — `DocumentQueries.
  * hashBucketCol`) is the cross-engine REFERENCE formula the DuckDB
  * oracles mirror, but it is a CodegenFallback chain that allocates a
  * position array, one single-char substring and a boxed long PER
  * CHARACTER — the round-15 bench-action fix exposed d13 paying ~4 s at
  * sf0.1 for what is one tight loop of integer math. This expression
  * computes the identical integers in one compiled pass and stays
  * inside whole-stage codegen via a static call like [[ParseS3LogExpr]].
  *
  * Exactness contract: Spark's `ascii`/`substring`/`length` operate on
  * CODE POINTS (`ascii('𐍈')` = 66376, `length('𐍈')` = 1 — probed, not
  * assumed), as do DuckDB's `ascii`/`substr`; the loop therefore
  * iterates code points (`codePointAt`/`charCount`), NOT UTF-16 units,
  * so parity holds beyond the BMP too (spec-pinned against the HOF on
  * astral inputs). Null text yields null (callers gate nulls loudly);
  * the seed argument must be a foldable literal in practice but any
  * bigint works.
  */
case class RollingHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, bigint) arguments, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = RollingHashExpr.functionName

  override def nullSafeEval(text: Any, seed: Any): Any =
    RollingHashExpr.hash(text.asInstanceOf[UTF8String],
      seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.RollingHashExpr.hash($t, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingHashExpr =
    copy(left = newLeft, right = newRight)
}

object RollingHashExpr {

  private val P = TextHash.P

  /** Static entry point referenced from generated code. */
  def hash(s: UTF8String, seed: Long): Long = {
    val text = s.toString
    val len = text.length
    var acc = seed
    var i = 0
    while (i < len) {
      val cp = text.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  val functionName = "graft_rollhash"

  /** SparkSessionExtensions hook: `builder.withExtensions(RollingHashExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[RollingHashExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$functionName expects exactly 2 arguments, got ${children.length}")
        RollingHashExpr(children.head, children(1))
      }))
}
