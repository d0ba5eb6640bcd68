package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the shared word-n-gram grain
  * (`DocumentQueries.ngramFps` — the d30/d32/d39/d47 decontamination/
  * census family — and d37's gram-text pass):
  *
  *   - `graft_ngram_fps(text, n) -> array<string>`: the DISTINCT md5
  *     hex fingerprints of the doc's ' '-joined word n-grams,
  *     first-occurrence order.
  *   - `graft_ngrams(text, n) -> array<string>`: the DISTINCT n-gram
  *     strings themselves (d37's pass 2 needs the text, not the hash).
  *
  * The higher-order-function formulation (`filter(split(text,' '))` →
  * `transform(sequence(...), i -> md5(array_join(slice(toks, i, n),
  * ' ')))` → explode → `.distinct()`) is the cross-engine REFERENCE
  * formula the DuckDB oracles mirror (`duckNgramFps`), but it pays
  * twice: the per-row build is an interpreted CodegenFallback chain
  * that allocates a position array, a token-slice array and a joined
  * string per POSITION, and the per-doc dedup runs as a corpus-wide
  * `(doc_id [, carry], fp)` DISTINCT — a full shuffle of every n-gram
  * row just to collapse within-document repeats. Dedup is a per-
  * document property (the carry columns are functions of the doc), so
  * this expression folds it into the same compiled pass that builds
  * the grams: one tokenizer scan, one rolling join buffer, a
  * LinkedHashSet census — and `explode()` then emits already-distinct
  * rows straight into the map-side-combinable aggregate that follows,
  * with NO distinct exchange in the plan. At 100 TB that removes a
  * corpus-n-gram-sized shuffle stage from every operator on this
  * grain; the fp aggregates that follow were already map-side
  * combinable, they now combine against ~(tokens - n + 1) distinct
  * rows per doc produced in-stage. Spec-pinned bit-equal to the HOF
  * path (FunctionsSpec).
  *
  * Parity notes: tokens = maximal nonempty runs between single spaces
  * (the `filter(split(text, ' '), t -> t <> '')` grain — tabs/newlines
  * stay inside tokens); docs with fewer than n tokens yield an EMPTY
  * array (explode emits no rows — the `size(toks) >= n` guard's
  * behavior); md5 is over the gram's UTF-8 bytes, lower-case hex,
  * exactly Spark's `md5()` and DuckDB's `md5()`; dedup keys on the
  * fingerprint, matching the HOF's post-hash DISTINCT (gram-text
  * dedup is equivalent short of an md5 collision; `graft_ngrams`
  * dedups on the gram itself). Null text yields null. */
private[functions] object NgramKernel {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** md5 digest bytes of the string's UTF-8 encoding (thread-local
    * MessageDigest — one per executor thread, reset per call). */
  private[functions] def md5Bytes(s: String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(s.getBytes(UTF_8))
  }

  private[functions] def md5Hex(s: String): String = {
    val bytes = md5Bytes(s)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The `filter(split(text, ' '), t -> t <> '')` token grain: maximal
    * nonempty runs between single spaces (surrogate units never equal
    * ' ', so charAt boundary scanning is code-point-safe). */
  private[functions] def tokens(text: String): java.util.ArrayList[String] = {
    val len = text.length
    val toks = new java.util.ArrayList[String]()
    var i = 0
    var start = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) toks.add(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    toks
  }

  /** Distinct n-grams of the filtered token stream, first-occurrence
    * order; hashed to md5 hex when `hash`. */
  def ngrams(s: UTF8String, n: Int, hash: Boolean): GenericArrayData = {
    // loud guard (the HashedFeatsExpr convention): the functions are
    // registered session-wide, and n <= 0 would otherwise emit the
    // empty gram md5 for EVERY position — plausible-looking garbage
    require(n >= 1, s"graft_ngrams/graft_ngram_fps: n must be >= 1 (got $n)")
    val toks = tokens(s.toString)
    val nTok = toks.size
    if (nTok < n) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= nTok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j))
        j += 1
      }
      val gram = sb.toString
      seen.add(if (hash) md5Hex(gram) else gram)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  def checkTypes(prettyName: String, l: Expression, r: Expression): TypeCheckResult =
    if (l.dataType == StringType && r.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"(${l.dataType.sql}, ${r.dataType.sql})")
}

case class NgramFpsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    NgramKernel.checkTypes(prettyName, left, right)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = NgramFpsExpr.functionName
  override def nullSafeEval(text: Any, n: Any): Any =
    NgramKernel.ngrams(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], hash = true)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.NgramKernel.ngrams($t, $n, true);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramFpsExpr =
    copy(left = newLeft, right = newRight)
}

object NgramFpsExpr {
  val functionName = "graft_ngram_fps"
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[NgramFpsExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$functionName expects exactly 2 arguments, got ${children.length}")
        NgramFpsExpr(children.head, children(1))
      }))
}

case class NgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    NgramKernel.checkTypes(prettyName, left, right)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = NgramsExpr.functionName
  override def nullSafeEval(text: Any, n: Any): Any =
    NgramKernel.ngrams(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], hash = false)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.NgramKernel.ngrams($t, $n, false);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramsExpr =
    copy(left = newLeft, right = newRight)
}

object NgramsExpr {
  val functionName = "graft_ngrams"
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[NgramsExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$functionName expects exactly 2 arguments, got ${children.length}")
        NgramsExpr(children.head, children(1))
      }))
}
