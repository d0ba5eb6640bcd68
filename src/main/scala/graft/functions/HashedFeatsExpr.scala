package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the DSIR hashed-feature census
  * (`DocumentQueries.hashedFeats`, the d46/d48 shared feature space):
  * `graft_hashed_feats(text, hexchars) ->
  *   array<struct<fb: bigint, c: bigint>>`
  * — per document, the count of unigram+bigram features landing in
  * each md5 bucket, where the bucket id is the integer value of the
  * digest's first `hexchars` hex characters (buckets = 16^hexchars,
  * the `QueryConf.dsirHexChars` vocabulary).
  *
  * The DataFrame formulation (token split + `zip_with` bigram build →
  * explode → md5 → `locate`-per-hex-char arithmetic →
  * `groupBy(doc_id, fb).count`) is the cross-engine REFERENCE formula
  * the DuckDB oracles mirror — but it pays an interpreted per-row HOF
  * build AND ships every distinct (doc_id, fb) pair through a
  * corpus-wide hash exchange whose only job is counting WITHIN each
  * document. The census is a per-document property, so this expression
  * folds it into the tokenize pass (one compiled loop: token + adjacent
  * bigram → md5 → leading-nibble bucket → open-address count), and
  * `explode()` emits the finished (fb, c) rows with NO shuffle in the
  * plan. Downstream consumers aggregate at bucket grain (≤16^hexchars
  * rows) or join per doc — the (doc_id, fb)-grain exchange is gone from
  * d46 and from every pass of d48's Lloyd loop. Spec-pinned bit-equal
  * to the DataFrame path (FunctionsSpec).
  *
  * Parity notes: tokens = the `filter(split(text, ' '), t -> t <> '')`
  * grain ([[NgramKernel.tokens]]); features = every token occurrence
  * plus every adjacent ' '-joined bigram occurrence (counted, not
  * distinct — a frequency model, unlike the n-gram fp grain); docs
  * with no tokens yield an EMPTY array (the `size(toks) >= 1` guard);
  * null text yields null. Output order follows first occurrence of
  * each bucket — consumers aggregate, so order is non-contractual, but
  * determinism keeps row-level artifacts replayable. */
case class HashedFeatsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = HashedFeatsExpr.schema
  override def prettyName: String = HashedFeatsExpr.functionName
  override def nullSafeEval(text: Any, hexChars: Any): Any =
    HashedFeatsExpr.census(text.asInstanceOf[UTF8String],
      hexChars.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, h) =>
      s"${ev.value} = graft.functions.HashedFeatsExpr.census($t, $h);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedFeatsExpr =
    copy(left = newLeft, right = newRight)
}

object HashedFeatsExpr {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("fb", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  /** Static entry point referenced from generated code. */
  def census(s: UTF8String, hexChars: Int): GenericArrayData = {
    require(hexChars >= 1 && hexChars <= 15,
      s"graft_hashed_feats: hexchars must be in [1, 15] (got $hexChars)")
    val toks = NgramKernel.tokens(s.toString)
    val n = toks.size
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    // first-occurrence-ordered census of feature buckets
    val counts = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    def add(feat: String): Unit = {
      val d = NgramKernel.md5Bytes(feat)
      // bucket = integer value of the digest's first hexChars nibbles,
      // big-endian — exactly the locate(substring(md5, k+1, 1))
      // positional arithmetic of the reference formula
      var fb = 0L
      var k = 0
      while (k < hexChars) {
        val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf
                  else d(k >> 1) & 0xf
        fb = (fb << 4) | nib
        k += 1
      }
      val slot = counts.get(fb)
      if (slot == null) counts.put(fb, Array(1L)) else slot(0) += 1L
    }
    var i = 0
    while (i < n) {
      add(toks.get(i))
      if (i + 1 < n) add(toks.get(i) + " " + toks.get(i + 1))
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  val functionName = "graft_hashed_feats"

  /** SparkSessionExtensions hook: `builder.withExtensions(HashedFeatsExpr.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[HashedFeatsExpr].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$functionName expects exactly 2 arguments, got ${children.length}")
        HashedFeatsExpr(children.head, children(1))
      }))
}
