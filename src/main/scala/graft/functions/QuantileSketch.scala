package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketches — the last readout of the persisted
  * sketch plane that was not re-aggregatable (MinHash = cardinality/
  * Jaccard, SimHash = similarity, Misra–Gries = frequency; percentiles
  * previously required `percentile_approx` re-reading raw data).
  *
  * State is Spark's own Greenwald–Khanna summary
  * (`org.apache.spark.sql.catalyst.util.QuantileSummaries` — the same
  * structure behind `approx_percentile`), exposed here as a
  * FIRST-CLASS persistable column: [[GkSketchAgg]] builds a sketch
  * from raw doubles, its binary eval lands in a parquet column,
  * [[GkMergeAgg]] re-aggregates persisted sketches (day → month →
  * all-time), and [[GkQuantiles]] reads estimates out. The GK merge
  * guarantee: a sketch built with relative error ε answers any
  * quantile φ with a value whose RANK is within ε·n of φ·n, and
  * merging preserves the bound (the merged error is ≤ max of the
  * inputs' — QuantileSummaries.merge keeps headroom by construction).
  *
  * At 100 TB: per-(day, key) sketch rows are KB-scale regardless of
  * row count, so p50/p90/p99 dashboards over any date range
  * re-aggregate the sketch table only — the raw fact table is scanned
  * exactly once, at ingest ([[graft.operators.QuantileRollup]]).
  */
object GkSer {

  /** compressThreshold(int) ε(double) count(long) nSamples(int)
    * then (value, g, delta) per sample — mirrors what
    * ApproximatePercentile persists, little-endian.
    */
  def serialize(qs: QuantileSummaries): Array[Byte] = {
    val s = qs.sampled
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + s.length * 24)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(qs.compressThreshold)
    bb.putDouble(qs.relativeError)
    bb.putLong(qs.count)
    bb.putInt(s.length)
    s.foreach { st => bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val threshold = bb.getInt()
    val eps = bb.getDouble()
    val count = bb.getLong()
    val n = bb.getInt()
    val sampled = Array.fill(n) {
      val v = bb.getDouble(); val g = bb.getLong(); val d = bb.getLong()
      QuantileSummaries.Stats(v, g, d)
    }
    new QuantileSummaries(threshold, eps, sampled, count, true)
  }

  def compressed(qs: QuantileSummaries): QuantileSummaries =
    if (qs.compressed) qs else qs.compress()

  /** `count` excludes values still in the un-flushed head buffer
    * (flushed only every defaultHeadSize inserts or on compress), so
    * both sides must be compressed BEFORE any emptiness check — a
    * count-first test silently drops groups smaller than the head
    * buffer in Complete-mode / window evaluation.
    */
  def mergeQs(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries = {
    val ca = compressed(a)
    val cb = compressed(b)
    if (cb.count == 0) ca
    else if (ca.count == 0) cb
    else ca.merge(cb)
  }
}

/** BUILD side: double input → binary GK sketch (ε is a plan-time
  * literal; it sizes the summary).
  */
case class GkSketchAgg(
    child: Expression,
    eps: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  override def prettyName: String = "gk_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && eps > 0 && eps < 0.5)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gk_sketch requires a double input and 0 < eps < 0.5, got " +
        s"${child.dataType.simpleString}, eps=$eps")

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double]) else buffer
  }

  override def merge(buffer: QuantileSummaries, input: QuantileSummaries): QuantileSummaries =
    GkSer.mergeQs(buffer, input)

  override def eval(buffer: QuantileSummaries): Any = {
    // Compress FIRST: count excludes the un-flushed head buffer, so a
    // count-first check evals groups with < defaultHeadSize rows to null
    // (reachable via Complete mode / `gk_sketch(...) OVER (...)`).
    val c = GkSer.compressed(buffer)
    if (c.count == 0) null else GkSer.serialize(c)
  }

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    GkSer.serialize(GkSer.compressed(buffer))

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    GkSer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GkSketchAgg =
    copy(child = newChildren.head)
}

/** MERGE side: binary sketch column → merged binary sketch — the
  * day→month→all rollup operator over a persisted sketch table.
  */
case class GkMergeAgg(
    child: Expression,
    eps: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  override def prettyName: String = "gk_merge"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType && eps > 0 && eps < 0.5)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gk_merge requires a binary sketch input and 0 < eps < 0.5, got " +
        s"${child.dataType.simpleString}, eps=$eps")

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null) GkSer.mergeQs(buffer, GkSer.deserialize(v.asInstanceOf[Array[Byte]]))
    else buffer
  }

  override def merge(buffer: QuantileSummaries, input: QuantileSummaries): QuantileSummaries =
    GkSer.mergeQs(buffer, input)

  override def eval(buffer: QuantileSummaries): Any = {
    // Same compress-before-count ordering as GkSketchAgg.eval; the
    // merge path keeps buffers compressed, but Complete mode can still
    // reach eval with a freshly-updated buffer.
    val c = GkSer.compressed(buffer)
    if (c.count == 0) null else GkSer.serialize(c)
  }

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    GkSer.serialize(GkSer.compressed(buffer))

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    GkSer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GkMergeAgg =
    copy(child = newChildren.head)
}

/** Readout: `gk_quantiles(sketch, array(φ…))` → array<double> of
  * estimates. Interpreted (CodegenFallback) — it runs once per OUTPUT
  * group row, never per input row, so codegen would buy nothing.
  */
case class GkQuantiles(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "gk_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"gk_quantiles requires (binary, array<double>), got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def nullSafeEval(sketch: Any, probs: Any): Any = {
    val qs = GkSer.deserialize(sketch.asInstanceOf[Array[Byte]])
    val ps = probs.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(ps.map(p => qs.query(p).getOrElse(
      throw new IllegalStateException("gk_quantiles on an empty sketch"))))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GkQuantiles =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the quantile sketch. */
object QuantileFunctions {

  def gkSketch(v: Column, eps: Double): Column =
    GraftBridge.column(GkSketchAgg(GraftBridge.expression(v), eps).toAggregateExpression())

  def gkMerge(sketch: Column, eps: Double): Column =
    GraftBridge.column(GkMergeAgg(GraftBridge.expression(sketch), eps).toAggregateExpression())

  def gkQuantiles(sketch: Column, probs: Seq[Double]): Column =
    GraftBridge.column(GkQuantiles(
      GraftBridge.expression(sketch),
      GraftBridge.expression(array(probs.map(lit): _*))))
}
