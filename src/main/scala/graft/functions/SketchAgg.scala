package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable MinHash sketch as a persisted AGGREGATION STATE — the
  * `TypedImperativeAggregate` extension point (SURVEY §2.6/§7.5a).
  *
  * Why an imperative aggregate when `DedupOps.docSketches` already
  * computes k=64 signatures with flat `min` columns: the relational
  * form pays one codegen'd agg COLUMN per hash — fine at k=64, but a
  * cardinality-grade sketch wants k in the hundreds, where hundreds
  * of aggregate buffer slots bloat the generated update loop and the
  * shuffle row. Here the whole signature is ONE buffer object
  * (`Array[Long](k+1)`), the per-row update is a tight JVM loop, and
  * Spark still gives map-side partial aggregation for free because
  * `merge` + `serialize` define the shuffle contract (planned as
  * ObjectHashAggregate).
  *
  * The sketch is the same family the relational plane uses, so the two
  * interoperate bit-for-bit (asserted in SketchAggSpec): component i
  * of the signature of inputs H = min over h∈H of
  * `xxhash64(h, i)` = `XXH64.hashInt(i, XXH64.hashLong(h, 42))`.
  *
  * Mergeability is what matters at 100 TB: `min` is associative and
  * commutative and duplicates are absorbed, so per-day (or
  * per-partition, per-source…) sketch ROWS persisted once re-aggregate
  * day→month→all with [[MinHashMergeAgg]] — no second visit to the raw
  * data, constant bytes per group. Supported readouts:
  *   - distinct cardinality ([[SketchFunctions.minhashCardinality]]):
  *     each component's normalized min u_i estimates 1/(n+1) via
  *     E[min of n uniforms]; the pooled unbiased estimator is
  *     n̂ = (k−1)/Σu_i − 1, relative sd ≈ 1/√(k−2) (~4.4% at k=512).
  *   - Jaccard between groups (fraction of equal components — exactly
  *     `DedupOps.estJaccard`).
  */
abstract class MinHashSketchBase extends TypedImperativeAggregate[Array[Long]] {

  def k: Int
  def child: Expression

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  /** Buffer: k running minimums + the update count in slot k (so an
    * all-null / empty group evals to null instead of a MaxValue row).
    */
  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](k + 1)
    java.util.Arrays.fill(b, 0, k, Long.MaxValue)
    b(k) = 0L
    b
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (input(i) < buffer(i)) buffer(i) = input(i)
      i += 1
    }
    buffer(k) += input(k)
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer(k) == 0L) null
    else new GenericArrayData(java.util.Arrays.copyOf(buffer, k))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((k + 1) * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](k + 1)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }
}

/** BUILD side: input is one 64-bit item hash per row (LongType —
  * e.g. `xxhash64(user_id)` or an exploded token hash); the update
  * derives the k per-seed hashes exactly like the relational
  * `min(xxhash64(h, i))` plane and folds them into the running mins.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MinHashSketchBase {

  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a bigint hash input and k > 0, got " +
        s"${child.dataType.simpleString}, k=$k")

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // identical chain to the relational xxhash64(h, i): seed 42 over
      // (long h, int i) = hashInt(i, hashLong(h, 42))
      val h1 = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var i = 0
      while (i < k) {
        val d = XXH64.hashInt(i, h1)
        if (d < buffer(i)) buffer(i) = d
        i += 1
      }
      buffer(k) += 1L
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

/** MERGE side: input is a persisted sketch (array<bigint> of length k);
  * re-aggregation = element-wise min. This is the day→month→all rollup
  * operator over a pre-aggregated sketch table.
  */
case class MinHashMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MinHashSketchBase {

  override def prettyName: String = "minhash_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_merge requires an array<bigint> sketch input and k > 0, got " +
        s"${t.simpleString}, k=$k")
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == k,
        s"sketch length ${arr.numElements()} != k=$k")
      var i = 0
      while (i < k) {
        val m = arr.getLong(i)
        if (m < buffer(i)) buffer(i) = m
        i += 1
      }
      buffer(k) += 1L
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashMergeAgg =
    copy(child = newChildren.head)
}

/** SimHash signature as a TypedImperativeAggregate: input is one
  * 64-bit token hash per row; buffer is the 64 per-bit ONES counts
  * plus the token count; eval folds them to the signature long
  * (bit j set iff ones_j·2 > n — ties to 0, the textbook ±1
  * convention, bit-identical to the relational lane-packed form in
  * `DedupOps.simhashSignaturesRelational`, asserted in SketchAggSpec).
  *
  * Why: the relational form needs 22 lane-packed `sum` columns whose
  * update expressions unroll 64 shift/mask terms — measured ~8× the
  * per-row cost of this loop at sf0.1 (the generated update code is
  * huge; this is the same "hundreds of agg slots" wall the MinHash
  * sketch hits, solved the same way). Mergeable: ones counts add.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "simhash_agg"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires a bigint hash input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buffer(j) += (h >>> j) & 1L
        j += 1
      }
      buffer(64) += 1L
    }
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 65) {
      buffer(j) += input(j)
      j += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer(64) == 0L) null
    else {
      val n = buffer(64)
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (buffer(j) * 2 > n) sig |= 1L << j
        j += 1
      }
      sig
    }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](65)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

/** Column-level entry points for the sketch aggregates. */
object SketchFunctions {

  /** Build a k-component MinHash sketch from a bigint item-hash column. */
  def minhashAgg(h: Column, k: Int): Column =
    GraftBridge.column(MinHashAgg(GraftBridge.expression(h), k).toAggregateExpression())

  /** Merge persisted k-component sketches (array<bigint> column). */
  def minhashMerge(sig: Column, k: Int): Column =
    GraftBridge.column(MinHashMergeAgg(GraftBridge.expression(sig), k).toAggregateExpression())

  /** SimHash signature of a bigint item-hash column. */
  def simhashAgg(h: Column): Column =
    GraftBridge.column(SimHashAgg(GraftBridge.expression(h)).toAggregateExpression())

  /** Distinct-count readout of a sketch: n̂ = (k−1)/Σu − 1 with
    * u_i = m_i·2⁻⁶⁴ + ½ ∈ [0,1). Interpreted HOF is fine here — it
    * runs once per OUTPUT group row, never per input row.
    */
  def minhashCardinality(sig: Column, k: Int): Column = {
    val u = aggregate(sig, lit(0.0),
      (acc, m) => acc + (m.cast("double") * lit(math.pow(2.0, -64)) + lit(0.5)))
    lit(k - 1).cast("double") / u - lit(1.0)
  }
}
