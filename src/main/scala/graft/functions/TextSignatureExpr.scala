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

import graft.operators.TextHash

/** Native Catalyst expression for the whole dedup signature family:
  * `graft_text_signature(text) ->
  *   struct(mh, bands, shset, split_bucket, simhash)`.
  *
  * The higher-order-function formulation (TextHash.spark*) is the
  * cross-engine REFERENCE formula — it is what the DuckDB oracle mirrors
  * and what d02 documents — but HOFs are CodegenFallback expressions:
  * every token hash allocates lambda frames and boxed longs, and the
  * signature pass dominated the dedup operators' wall-clock. This
  * expression computes the identical integers in one compiled loop per
  * document (token rolling hashes → 3-gram shingles → K minhash
  * components → LSH band keys → distinct shingle set → d13 split
  * bucket), stays inside whole-stage codegen via a static call like
  * [[ParseS3LogExpr]], and is spec-pinned bit-equal to the HOF path.
  *
  * Semantics parity notes (each mirrors a documented HOF guard):
  *   - `split(text, ' ')` keeps empty tokens, including trailing ones,
  *     and splits '' into one empty token; empty tokens hash to seed 7.
  *   - hashes fold Unicode CODE POINTS (what Spark's ascii/substring
  *     and DuckDB's ascii/substr count), so parity with the HOF and
  *     the oracle holds beyond the BMP too (round 15; previously a
  *     charAt loop, exact only across the BMP).
  *   - docs with < 3 tokens have no shingles → sentinel signature [P]*K.
  *   - shset preserves first-occurrence order (array_distinct).
  *   - split_bucket pins '' to seed 7 (the sequence(1,0) trap).
  *   - simhash ties (bit balance 0) resolve to 0, matching the HOF's
  *     strict `s > 0` test. */
case class TextSignatureExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = TextSignatureExpr.schema
  override def prettyName: String = TextSignatureExpr.functionName

  override def nullSafeEval(input: Any): Any =
    TextSignatureExpr.signatures(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSignatureExpr.signatures($c);")

  override protected def withNewChildInternal(newChild: Expression): TextSignatureExpr =
    copy(child = newChild)
}

object TextSignatureExpr {

  private val P = TextHash.P
  private val K = TextHash.K
  private val Bands = TextHash.Bands
  private val SimBits = TextHash.SimBits
  private val A = Array.tabulate(K)(TextHash.aCoef)
  private val B = Array.tabulate(K)(TextHash.bCoef)

  val schema: StructType = StructType(Seq(
    StructField("mh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("shset", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("split_bucket", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false)))

  /** Static entry point referenced from generated code. */
  def signatures(s: UTF8String): InternalRow = {
    val text = s.toString
    val len = text.length

    // d13 split bucket: rolling CODE-POINT hash of the whole text
    // ('' → seed 7). Code points, not UTF-16 units: Spark's
    // ascii/substring/length and DuckDB's ascii/substr all count code
    // points (ascii('𐍈') = 66376, length('𐍈') = 1 — probed round 15),
    // so a charAt loop would diverge from the HOF/oracle formula on
    // astral characters (it matched only across the BMP).
    var full = 7L
    var i = 0
    while (i < len) {
      val cp = text.codePointAt(i)
      full = (full * 31 + cp) % P
      i += Character.charCount(cp)
    }
    val splitBucket = (if (len == 0) 7L else full) % 100

    // token rolling hashes, split-on-single-space keeping empties
    // (a UTF-16 surrogate unit can never equal ' ', so the boundary
    // scan is code-point-safe with charAt)
    var nTokens = 1
    i = 0
    while (i < len) { if (text.charAt(i) == ' ') nTokens += 1; i += 1 }
    val th = new Array[Long](nTokens)
    var tok = 0
    var acc = 7L
    i = 0
    while (i < len) {
      val cp = text.codePointAt(i)
      if (cp == ' ') { th(tok) = acc; tok += 1; acc = 7L }
      else acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    th(tok) = acc

    // 3-gram shingles
    val nSh = math.max(0, nTokens - 2)
    val sh = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      sh(i) = ((th(i) * 37 + th(i + 1)) % P * 37 + th(i + 2)) % P
      i += 1
    }

    // K minhash components (sentinel P for shingle-less docs)
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, P)
    var t = 0
    while (t < nSh) {
      val x = sh(t)
      var j = 0
      while (j < K) {
        val v = (A(j) * x + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      t += 1
    }

    // LSH band keys: '-'-joined component runs (concat_ws semantics)
    val r = K / Bands
    val bands = new Array[Any](Bands)
    var b = 0
    while (b < Bands) {
      val sb = new java.lang.StringBuilder(r * 11)
      var j = 0
      while (j < r) {
        if (j > 0) sb.append('-')
        sb.append(mins(b * r + j))
        j += 1
      }
      bands(b) = UTF8String.fromString(sb.toString)
      b += 1
    }

    // distinct shingles, first-occurrence order (array_distinct semantics)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nSh) { seen.add(sh(i)); i += 1 }
    val shset = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { shset(i) = it.next().longValue(); i += 1 }

    // d04 simhash over the token hashes: per-bit +1/-1 vote, bit set
    // iff the vote is strictly positive (token hashes are < P < 2^30,
    // so bits ≥ 30 vote all -1 and stay clear — same as the HOF)
    var simhash = 0L
    var jb = 0
    while (jb < SimBits) {
      var vote = 0
      i = 0
      while (i < nTokens) {
        if (((th(i) >>> jb) & 1L) == 1L) vote += 1 else vote -= 1
        i += 1
      }
      if (vote > 0) simhash |= 1L << jb
      jb += 1
    }

    val mh = new Array[Any](K)
    i = 0
    while (i < K) { mh(i) = mins(i); i += 1 }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(mh), new GenericArrayData(bands),
      new GenericArrayData(shset), splitBucket, simhash))
  }

  val functionName = "graft_text_signature"

  /** SparkSessionExtensions hook: `builder.withExtensions(TextSignatureExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[TextSignatureExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"$functionName expects exactly 1 argument, got ${children.length}")
        TextSignatureExpr(children.head)
      }))
}
