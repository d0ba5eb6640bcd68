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

/** Native Catalyst expression for the d57 character-distribution
  * signals: `graft_char_entropy(text) ->
  *   struct(n_chars, n_distinct, top_char_n, ent_q)`.
  *
  * The signals are the code-point-grain complement of the d51 token
  * concentration family — the gibberish/boilerplate axis a token
  * tokenizer cannot see: binary spew and base64 blobs read as HIGH
  * character entropy, keyboard-mash and padding runs as LOW, and both
  * tails are exactly what a crawl quality gate trims (the C4/Gopher
  * character-level heuristics, Raffel et al. 2020 §2.2 / Rae et al.
  * 2021 app. A1.1).
  *
  *   - `n_chars`    — Unicode code points in the string (the grain the
  *     oracle's `len(text)` + `substr` counting mirrors; ASCII corpus
  *     text makes code units vs points moot, and the kernel counts
  *     POINTS so supplementary-plane text censuses correctly).
  *   - `n_distinct` — distinct code points.
  *   - `top_char_n` — the most frequent code point's multiplicity (the
  *     d51 `top_tok_n` at character grain).
  *   - `ent_q`      — Shannon entropy in MICRO-NATS, fixed-point: per
  *     distinct code point with count k over n total,
  *     `floor((k/n) * ln(n/k) * 1e6)` summed as a Long. The per-term
  *     floor is the cross-engine discipline every fractional column in
  *     this repo follows (the d19 floor, the d48 BIGINT floor sums):
  *     integer summation is order-free, so the engine's hash-census
  *     iteration order and the oracle's GROUP BY order cannot diverge,
  *     and the one transcendental (`ln`) appears in the same
  *     left-associated shape `(k/n) * ln(n/k) * 1e6` on both engines.
  *     Nats, not bits, on purpose: bits would divide by a SECOND
  *     transcendental (ln 2) whose last ulp is implementation-defined.
  *
  * One compiled pass per row (code-point scan → open-address census →
  * fold), inside whole-stage codegen via a static call like
  * [[RepConcentrationExpr]]. Null text yields a null struct; the empty
  * string the all-zero row. */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = CharEntropyExpr.schema
  override def prettyName: String = CharEntropyExpr.functionName

  override def nullSafeEval(input: Any): Any =
    CharEntropyExpr.signals(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyExpr.signals($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_char_n", LongType, nullable = false),
    StructField("ent_q", LongType, nullable = false)))

  /** Static entry point referenced from generated code. */
  def signals(s: UTF8String): InternalRow = {
    val str = s.toString
    // code-point census — one scan; the HashMap census is the
    // RepConcentrationExpr discipline (iteration order never reaches
    // the output: max and integer sum are both order-free)
    val count = new java.util.HashMap[Integer, java.lang.Long](64)
    var n = 0L
    var top = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      val c = count.getOrDefault(cp, 0L) + 1L
      count.put(cp, c)
      if (c > top) top = c
      n += 1L
      i += Character.charCount(cp)
    }
    var entQ = 0L
    if (n > 0L) {
      val it = count.values().iterator()
      while (it.hasNext) {
        val k = it.next().longValue()
        // the exact shape the DuckDB oracle writes:
        // floor(CAST(k AS DOUBLE)/n * ln(CAST(n AS DOUBLE)/k) * 1e6)
        entQ += math.floor(
          k.toDouble / n * math.log(n.toDouble / k) * 1000000.0).toLong
      }
    }
    new GenericInternalRow(Array[Any](n, count.size.toLong, top, entQ))
  }

  val functionName = "graft_char_entropy"

  /** SparkSessionExtensions hook: `builder.withExtensions(CharEntropyExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[CharEntropyExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"$functionName expects exactly 1 argument, got ${children.length}")
        CharEntropyExpr(children.head)
      }))
}
