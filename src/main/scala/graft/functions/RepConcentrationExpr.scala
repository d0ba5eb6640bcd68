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

/** Native Catalyst expression for the d51 concentration signals:
  * `graft_rep_concentration(text) ->
  *   struct(n_tok, top_tok_n, top_gram_n, max_run_len)`.
  *
  * The higher-order-function formulation (`DocumentQueries.maxAdjRunSql`
  * over `array_sort`ed token/bigram copies) is the cross-engine
  * REFERENCE formula — it is what the DuckDB oracle mirrors (positional
  * CTEs + GROUP BY + per-doc max) and what d51's Scaladoc documents —
  * but it is a CodegenFallback chain that per ROW allocates the token
  * array, a bigram string array built from `sequence`+`slice`+
  * `array_join`, TWO `array_sort`ed copies, and three `aggregate()`
  * lambda folds with a boxed struct accumulator per element. The
  * round-15 bench-action fix priced that at ~2.1 s for 5k docs at
  * sf0.1. This expression computes the identical integers in ONE
  * compiled pass per document (tokenize → frequency census via open
  * hashing → adjacent-run scan) and stays inside whole-stage codegen
  * via a static call like [[TextSignatureExpr]]; it is spec-pinned
  * bit-equal to the HOF path (FunctionsSpec).
  *
  * Semantics parity notes (each mirrors a documented HOF guard):
  *   - tokens = `filter(split(text, ' '), t -> t <> '')`: maximal
  *     nonempty runs between single spaces; tabs/newlines stay INSIDE
  *     tokens (the [[graft.queries.DocumentQueries.termStream]] grain).
  *     A UTF-16 surrogate unit can never equal ' ', so the boundary
  *     scan is code-point-safe with charAt.
  *   - top_tok_n / top_gram_n = the max multiplicity of any token /
  *     word-2-gram. The HOF reads these off sorted copies as the
  *     longest equal-adjacent run; multiplicity is sort-order-free, so
  *     a hash census counts the same integers without the sort.
  *     Bigram identity via the joined string `tok[i] + ' ' + tok[i+1]`
  *     is injective (tokens contain no spaces) — same keys the HOF
  *     compares.
  *   - max_run_len = longest run of equal ADJACENT tokens in original
  *     order (0 for a token-less doc, 1 for a single token).
  *   - token equality is UTF8String byte equality in the HOF; Java
  *     String equality after UTF-8 decode is equivalent (the decode is
  *     bijective on valid UTF-8, which Spark strings are).
  * Null text yields a null struct, matching the HOF chain on null. */
case class RepConcentrationExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = RepConcentrationExpr.schema
  override def prettyName: String = RepConcentrationExpr.functionName

  override def nullSafeEval(input: Any): Any =
    RepConcentrationExpr.signals(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepConcentrationExpr.signals($c);")

  override protected def withNewChildInternal(newChild: Expression): RepConcentrationExpr =
    copy(child = newChild)
}

object RepConcentrationExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("top_tok_n", LongType, nullable = false),
    StructField("top_gram_n", LongType, nullable = false),
    StructField("max_run_len", LongType, nullable = false)))

  /** Static entry point referenced from generated code. */
  def signals(s: UTF8String): InternalRow = {
    // the shared filter(split(text, ' ')) token grain — ONE definition
    // ([[NgramKernel.tokens]]) for every kernel on it, so a boundary
    // tweak cannot silently diverge d51 from the n-gram family
    val toks = NgramKernel.tokens(s.toString)
    val n = toks.size

    // one scan: token frequency census + longest equal-adjacent run;
    // a second implicit census for bigrams keyed by the joined string
    // (injective: tokens contain no ' ')
    val tokCount = new java.util.HashMap[String, java.lang.Long](
      math.max(16, n * 2))
    val gramCount = new java.util.HashMap[String, java.lang.Long](
      math.max(16, n * 2))
    var topTok = 0L
    var topGram = 0L
    var run = 0L
    var maxRun = 0L
    var prev: String = null
    var i = 0
    while (i < n) {
      val t = toks.get(i)
      val c = tokCount.getOrDefault(t, 0L) + 1L
      tokCount.put(t, c)
      if (c > topTok) topTok = c
      if (prev != null) {
        run = if (t == prev) run + 1L else 1L
        val g = prev + " " + t
        val gc = gramCount.getOrDefault(g, 0L) + 1L
        gramCount.put(g, gc)
        if (gc > topGram) topGram = gc
      } else run = 1L
      if (run > maxRun) maxRun = run
      prev = t
      i += 1
    }

    new GenericInternalRow(Array[Any](n.toLong, topTok, topGram, maxRun))
  }

  val functionName = "graft_rep_concentration"

  /** SparkSessionExtensions hook: `builder.withExtensions(RepConcentrationExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[RepConcentrationExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"$functionName expects exactly 1 argument, got ${children.length}")
        RepConcentrationExpr(children.head)
      }))
}
