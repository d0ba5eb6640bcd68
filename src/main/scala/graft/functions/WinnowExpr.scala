package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  GenericInternalRow, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextHash

/** Native Catalyst expression for d53's winnowing fingerprint selection
  * (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS local
  * fingerprinting algorithm): `graft_winnow(text, n, w, seed) ->
  * struct(n_grams, n_sel, sel_fps)`.
  *
  * Per document: the positional token n-gram stream (the shared
  * `filter(split(text, ' '), t -> t <> '')` grain of
  * [[NgramKernel.tokens]]), each gram hashed by the d13/d27 rolling
  * char hash ([[RollingHashExpr.hash]] over the space-joined gram
  * string, seeded); in every window of `w` CONSECUTIVE gram positions
  * the minimal hash is selected, rightmost position on ties — the
  * standard "robust winnowing" rule, encoded exactly as the integer key
  *
  *   key(p) = h(p) * 2^31 + (2^31 - 1 - p)
  *
  * (h < TextHash.P < 2^30, so the product stays < 2^61: BIGINT-exact on
  * any engine; smaller hash wins, larger position breaks ties). The
  * selection is the DISTINCT window-min key set over all full windows;
  * `sel_fps` is the distinct md5 hex fingerprints of the grams at the
  * selected positions, ascending-position first-occurrence order (the
  * window-min position is non-decreasing as the window slides, so
  * encounter order IS position order). Winnowing's guarantee: any
  * shared run of w + n - 1 tokens between two documents shares at
  * least one SELECTED fingerprint, at an expected density of 2/(w+1)
  * of the full gram stream — the contract that lets a 100 TB dup index
  * store ~2/(w+1) of its fps without losing long-match recall.
  *
  * The higher-order-function formulation (positional grams via
  * `transform(sequence ∘ slice)`, keys via `graft_rollhash` in a
  * lambda, window mins via `transform(sequence, q -> array_min(slice(
  * keys, q-w+2, w)))`, `array_distinct`) is the cross-engine REFERENCE
  * formula the DuckDB oracle mirrors with SQL window functions —
  * spec-pinned bit-equal in FunctionsSpec — but it is an interpreted
  * CodegenFallback chain that allocates a gram string, a position
  * array and a w-slice per window. This kernel computes the identical
  * integers in one compiled pass: one tokenizer scan, one rolling-hash
  * loop per gram, and an O(n_grams) monotonic-deque sliding minimum;
  * gram strings are re-materialized ONLY at the ~2n/(w+1) selected
  * positions for their md5. Stays inside whole-stage codegen via a
  * static call like the other r15 kernels. Null text yields null;
  * n, w and seed must be foldable literals in practice (the operator
  * interpolates them from QueryConf).
  */
case class WinnowExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
        third.dataType == IntegerType && fourth.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int, int, bigint) arguments, got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, " +
        s"${third.dataType.sql}, ${fourth.dataType.sql})")
  override def dataType: DataType = WinnowExpr.schema
  override def prettyName: String = WinnowExpr.functionName

  override def nullSafeEval(text: Any, n: Any, w: Any, seed: Any): Any =
    WinnowExpr.winnow(text.asInstanceOf[UTF8String], n.asInstanceOf[Int],
      w.asInstanceOf[Int], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, w, s) =>
      s"${ev.value} = graft.functions.WinnowExpr.winnow($t, $n, $w, $s);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): WinnowExpr =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object WinnowExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_sel", LongType, nullable = false),
    StructField("sel_fps", ArrayType(StringType, containsNull = false),
      nullable = false)))

  private val PosRange = 1L << 31

  /** Static entry point referenced from generated code. */
  def winnow(s: UTF8String, n: Int, w: Int, seed: Long): InternalRow = {
    // loud guards (the NgramKernel convention): registered session-wide,
    // a non-positive n or w would emit plausible-looking garbage
    require(n >= 1, s"graft_winnow: n must be >= 1 (got $n)")
    require(w >= 1, s"graft_winnow: w must be >= 1 (got $w)")
    val toks = NgramKernel.tokens(s.toString)
    val nTok = toks.size
    val nGrams = nTok - n + 1
    if (nGrams <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L,
        new GenericArrayData(new Array[Any](0))))
    // no full window exists: the all-zero selection row, BEFORE any gram
    // is materialized or hashed (the keys are only consumed by the
    // sliding minimum below)
    if (nGrams < w)
      return new GenericInternalRow(Array[Any](nGrams.toLong, 0L,
        new GenericArrayData(new Array[Any](0))))
    val sb = new java.lang.StringBuilder()
    def gram(p: Int): String = {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(p + j))
        j += 1
      }
      sb.toString
    }
    // keys for every gram position; gram strings are built once here for
    // the hash and rebuilt only at selected positions for the md5
    val keys = new Array[Long](nGrams)
    var p = 0
    while (p < nGrams) {
      val h = RollingHashExpr.hash(UTF8String.fromString(gram(p)), seed)
      keys(p) = h * PosRange + (PosRange - 1 - p)
      p += 1
    }
    // monotonic deque sliding minimum: indices ascending front→back,
    // keys strictly increasing (keys are pairwise distinct — the
    // position component guarantees it). Window-min positions are
    // non-decreasing over q, so distinct selection is a last-compare.
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val selFps = new java.util.LinkedHashSet[String]()
    var nSel = 0L
    var lastSel = -1
    var q = 0
    while (q < nGrams) {
      while (tail > head && keys(deque(tail - 1)) >= keys(q)) tail -= 1
      deque(tail) = q
      tail += 1
      if (deque(head) <= q - w) head += 1
      if (q >= w - 1) {
        val chosen = deque(head)
        if (chosen != lastSel) {
          lastSel = chosen
          nSel += 1
          selFps.add(NgramKernel.md5Hex(gram(chosen)))
        }
      }
      q += 1
    }
    val out = new Array[Any](selFps.size)
    val it = selFps.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericInternalRow(Array[Any](nGrams.toLong, nSel,
      new GenericArrayData(out)))
  }

  val functionName = "graft_winnow"

  /** SparkSessionExtensions hook: `builder.withExtensions(WinnowExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[WinnowExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"$functionName expects exactly 4 arguments, got ${children.length}")
        WinnowExpr(children(0), children(1), children(2), children(3))
      }))
}
