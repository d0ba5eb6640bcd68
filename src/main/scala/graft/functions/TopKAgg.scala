package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType,
  StructField, StructType}
import org.apache.spark.sql.SparkSessionExtensions

/** Bounded top-k AGGREGATE: `graft_topk(score, id, k) ->
  * array<struct(score double, id bigint)>`, the k best rows of a group
  * ordered (score DESC, id ASC) — ties broken id-ascending, exactly
  * the rank discipline every ranked operator in this repo pins.
  *
  * Why an aggregate and not `row_number() <= k`: the window form —
  * even with Spark's WindowGroupLimit pushdown — SORTS every candidate
  * row map-side before the limit can apply. On s14's within-cell pair
  * scan at 500k docs that is a 156M-row sort (with spill) for an
  * output of 3 rows per vector; the x100 cell measured 133 s against
  * s09's ~1 s for the SAME pair scan without a sort. This aggregate
  * replaces the sort with a hash aggregation whose per-group state is
  * a k-element insertion buffer: one pass, map-side partial
  * aggregation (cell-partitioned pairs combine before the exchange),
  * and only k-row buffers ever shuffle. O(n·k) comparisons with k
  * small beats O(n log n) sort-with-spill by construction.
  *
  * Null rows (either input null) are skipped — the SQL aggregate
  * convention. `k` must be a foldable positive literal: a per-row k
  * would make partial buffers unmergeable. Determinism: insertion
  * keeps the buffer totally ordered by (score desc, id asc); merge
  * replays one buffer into the other, so any partial-aggregation
  * grouping yields the same final k (spec + fuzz pinned vs the sort
  * reference). */
case class TopKAgg(
    scoreExpr: Expression, idExpr: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName score must be DOUBLE, got ${scoreExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName id must be BIGINT, got ${idExpr.dataType.sql}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be a literal (per-row k would make " +
          "partial buffers unmergeable)")
    else if (kExpr.eval(null) == null ||
      kExpr.eval(null).asInstanceOf[Number].longValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = TopKAgg.resultType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def prettyName: String = TopKAgg.functionName

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(b: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      b.offer(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKAgg.Buf, o: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < o.n) { b.offer(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKAgg.Buf): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      out(i) = new GenericInternalRow(Array[Any](b.scores(i), b.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKAgg.Buf(k)
    val n = bb.getInt
    var i = 0
    // serialized entries are already ordered; offer replays them
    while (i < n) { b.offer(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))
}

object TopKAgg {

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** k-element insertion buffer, totally ordered (score desc, id asc).
    * Insertion shifts — O(k) per offer with k small; rejected offers
    * (worse than the current k-th) cost one comparison. */
  final class Buf(val k: Int) {
    var n: Int = 0
    val scores: Array[Double] = new Array[Double](k)
    val ids: Array[Long] = new Array[Long](k)

    // TOTAL order (java.lang.Double.compare), not raw </==: a NaN score
    // (reachable upstream from a zero-norm vector's cos_sim) makes every
    // raw comparison false — it would lodge mid-buffer, break the
    // (score desc, id asc) invariant, and block better candidates once
    // n==k. Under total order NaN > +Inf, which matches Spark SQL's and
    // DuckDB's sort semantics (NaN first under DESC), so the buffer
    // agrees with the row_number reference even on NaN inputs
    // (FunctionProps pins this).
    private def beats(s: Double, id: Long, i: Int): Boolean = {
      val c = java.lang.Double.compare(s, scores(i))
      c > 0 || (c == 0 && id < ids(i))
    }

    def offer(s0: Double, id: Long): Unit = {
      // collapse -0.0 to 0.0: total order ranks 0.0 above -0.0, but SQL
      // engines compare them equal — normalizing keeps the id tie-break
      // in charge, matching the reference ordering
      val s = if (s0 == 0.0d) 0.0d else s0
      if (n == k && !beats(s, id, n - 1)) return
      // find insertion point from the tail (offers arrive unordered)
      var i = math.min(n, k - 1)
      while (i > 0 && beats(s, id, i - 1)) {
        if (i < k) { scores(i) = scores(i - 1); ids(i) = ids(i - 1) }
        i -= 1
      }
      scores(i) = s
      ids(i) = id
      if (n < k) n += 1
    }
  }

  val functionName = "graft_topk"

  /** SparkSessionExtensions hook: `builder.withExtensions(TopKAgg.register)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[TopKAgg].getName, functionName),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"$functionName expects (score, id, k), got ${children.length} args")
        TopKAgg(children(0), children(1), children(2))
      }))
}
