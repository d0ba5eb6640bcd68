package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the per-document TERM census:
  * `graft_term_counts(text) ->
  *   struct(n_tok, terms array<struct(term, n)>)`.
  *
  * The d56 retrieval scorer (and any tf consumer) needs per-(doc, term)
  * counts. The DataFrame-native formulation — explode the token stream,
  * `groupBy(doc_id, term).count()` — ships EVERY TOKEN OCCURRENCE of
  * the corpus through an exchange to count rows that never leave their
  * document: at the 500k-doc scale sweep that census owned half the
  * d56 wall. This kernel is the [[HashedFeatsExpr]] move at the raw
  * term grain: the census folds IN-ROW in one compiled pass, so term
  * rows are born pre-aggregated (one per DISTINCT term, first-
  * appearance order — deterministic, though no consumer depends on it)
  * and only distinct-term rows ever reach an explode. `n_tok` is the
  * total filtered token count (Σ n — the document length every
  * BM25-family normalizer needs), computed in the same pass.
  *
  * Tokens are the shared `filter(split(text, ' '), t -> t <> '')`
  * grain ([[NgramKernel.tokens]] — ONE definition for every kernel on
  * it). Counts are multiplicities of UTF8String-equal tokens (Java
  * String equality after the bijective UTF-8 decode — the
  * [[RepConcentrationExpr]] argument). Null text yields a null struct;
  * empty text the (0, []) row. */
case class TermCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = TermCountsExpr.schema
  override def prettyName: String = TermCountsExpr.functionName

  override def nullSafeEval(input: Any): Any =
    TermCountsExpr.census(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCountsExpr.census($c);")

  override protected def withNewChildInternal(newChild: Expression): TermCountsExpr =
    copy(child = newChild)
}

object TermCountsExpr {

  val entrySchema: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("n", LongType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("terms", ArrayType(entrySchema, containsNull = false),
      nullable = false)))

  /** Static entry point referenced from generated code. */
  def census(s: UTF8String): InternalRow = {
    val toks = NgramKernel.tokens(s.toString)
    val n = toks.size
    // first-appearance order: LinkedHashMap keeps the output a pure
    // function of the token stream (iteration order of a plain HashMap
    // would leak JVM hashing into the array — harmless to every
    // current consumer, but determinism is free here)
    val counts = new java.util.LinkedHashMap[String, Array[Long]](
      math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val t = toks.get(i)
      val cell = counts.get(t)
      if (cell == null) counts.put(t, Array(1L)) else cell(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue()(0)))
      j += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, new GenericArrayData(out)))
  }

  val functionName = "graft_term_counts"

  /** SparkSessionExtensions hook: `builder.withExtensions(TermCountsExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[TermCountsExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"$functionName expects exactly 1 argument, got ${children.length}")
        TermCountsExpr(children.head)
      }))
}
