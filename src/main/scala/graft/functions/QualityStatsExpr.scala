package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField,
  StructType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the d09 quality-gate token counts:
  * `graft_quality_stats(text) -> struct(n_tok, stop_n)` — the number
  * of `split(text, ' ')` segments (EMPTY segments included: this is
  * the d09 grain, not the filtered termStream grain — `''` is one
  * segment, `'a '` is two) and how many of them are stopwords
  * (`the` / `a`, the fixed d09 stopword set the oracle mirrors).
  *
  * The DataFrame formulation (`split` + `size` + `filter(toks,
  * isInCollection)` — `DocumentQueries.withQuality`) is the
  * cross-engine REFERENCE formula, but `filter` over a lambda is a
  * CodegenFallback that allocates the full token array and a boxed
  * frame per token — and withQuality sits on the STREAMING INGEST hot
  * path (`DocumentIngest`'s quality gate scores every micro-batch
  * document) as well as under d09/d31/d42/d43/d45. This expression
  * counts segments and stopword hits in one compiled scan with no
  * token array at all; the ratio/composite arithmetic stays in the
  * DataFrame layer (plain codegen'd column math, bit-identical).
  * Spec-pinned equal to the HOF counts (FunctionsSpec). Null text
  * yields null, matching the HOF chain. */
case class QualityStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = QualityStatsExpr.schema
  override def prettyName: String = QualityStatsExpr.functionName
  override def nullSafeEval(input: Any): Any =
    QualityStatsExpr.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityStatsExpr.stats($c);")
  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

object QualityStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("stop_n", LongType, nullable = false)))

  /** Static entry point referenced from generated code. Scans the raw
    * UTF-8 BYTES with no String decode at all: this kernel exists for
    * the streaming-ingest hot path, and 0x20 never occurs inside a
    * multi-byte UTF-8 sequence, so byte-level space boundaries equal
    * character-level ones; the stopwords are ASCII, so byte-equality
    * of a segment to "a"/"the" equals string equality. (The other
    * kernels must materialize tokens; this one never has to.) */
  def stats(s: UTF8String): InternalRow = {
    val len = s.numBytes()
    // segments = spaces + 1 (split keeps empties, '' is one segment);
    // a segment is a stopword iff it is exactly "the" or "a"
    var nTok = 1L
    var stopN = 0L
    var i = 0
    var start = 0
    while (i <= len) {
      if (i == len || s.getByte(i) == 0x20) {
        val segLen = i - start
        if (segLen == 1 && s.getByte(start) == 'a') stopN += 1
        else if (segLen == 3 && s.getByte(start) == 't' &&
          s.getByte(start + 1) == 'h' && s.getByte(start + 2) == 'e')
          stopN += 1
        if (i < len) nTok += 1
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, stopN))
  }

  val functionName = "graft_quality_stats"

  /** SparkSessionExtensions hook: `builder.withExtensions(QualityStatsExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[QualityStatsExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"$functionName expects exactly 1 argument, got ${children.length}")
        QualityStatsExpr(children.head)
      }))
}
