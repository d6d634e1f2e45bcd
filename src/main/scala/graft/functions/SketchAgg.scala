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

object MisraGriesAgg {
  /** Mutable MG state: item → counter (≤ k entries between calls) plus
    * the exact processed-row count.
    */
  final class Buffer(val map: java.util.HashMap[String, Long], var n: Long)
}

/** Misra–Gries frequent-items summary as a TypedImperativeAggregate —
  * the heavy-hitters sketch of the mergeable-sketch plane (MinHash =
  * cardinality/Jaccard, SimHash = similarity, MG = frequency).
  *
  * Buffer: at most k (item → counter) entries plus the EXACT total
  * update count n. Update is classic MG (hit: +1; miss with room:
  * insert 1; miss when full: decrement all, drop zeros — amortized
  * O(1) per row). Merge follows the mergeable-summaries construction
  * (Agarwal et al., PODS'12): add counterparts, then if over capacity
  * subtract the (k+1)-th largest counter from all and drop ≤ 0 —
  * which preserves the MG guarantee under ARBITRARY merge trees:
  *
  *   true_count − n/(k+1)  ≤  est  ≤  true_count
  *
  * So any item with frequency share > 1/(k+1) is guaranteed present
  * in the final summary regardless of partitioning or merge order —
  * the property that makes a 2-pass EXACT heavy-hitters query
  * deterministic at any scale: MG prunes the candidate set to ≤ k
  * items (one tiny row crosses the shuffle), an exact count of just
  * those candidates removes the false positives
  * ([[graft.operators.LlmQueries.heavyHitters]]).
  *
  * eval returns `struct(n, items)` with items sorted (est desc, item
  * asc); n is exact (counters add precisely), so downstream thresholds
  * of the form share ≥ φ need no second full scan for the total.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buffer] {

  import org.apache.spark.sql.types.{LongType => SLong, StringType, StructField, StructType}
  import org.apache.spark.unsafe.types.UTF8String

  override def prettyName: String = "misra_gries"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", SLong, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", SLong, nullable = false))), containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string input and k > 0, got " +
        s"${child.dataType.simpleString}, k=$k")

  override def createAggregationBuffer(): MisraGriesAgg.Buffer =
    new MisraGriesAgg.Buffer(new java.util.HashMap[String, Long](k * 2), 0L)

  override def update(buffer: MisraGriesAgg.Buffer, input: InternalRow): MisraGriesAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buffer.n += 1L
      val cur = buffer.map.get(item)
      if (cur != 0L || buffer.map.containsKey(item)) {
        buffer.map.put(item, cur + 1L)
      } else if (buffer.map.size < k) {
        buffer.map.put(item, 1L)
      } else {
        // miss with a full summary: decrement every counter, drop zeros
        val it = buffer.map.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(buffer: MisraGriesAgg.Buffer, input: MisraGriesAgg.Buffer): MisraGriesAgg.Buffer = {
    buffer.n += input.n
    val it = input.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buffer.map.get(e.getKey)
      buffer.map.put(e.getKey, cur + e.getValue)
    }
    if (buffer.map.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0
      val vals = new Array[Long](buffer.map.size)
      var i = 0
      val vi = buffer.map.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - (k + 1)) // (k+1)-th largest
      val ei = buffer.map.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= d) ei.remove() else e.setValue(e.getValue - d)
      }
    }
    buffer
  }

  override def eval(buffer: MisraGriesAgg.Buffer): Any = {
    val entries = new Array[(String, Long)](buffer.map.size)
    var i = 0
    val it = buffer.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    val rows: Array[Any] = sorted.map { case (item, est) =>
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(item), est)
    }
    org.apache.spark.sql.catalyst.InternalRow(buffer.n, new GenericArrayData(rows))
  }

  override def serialize(buffer: MisraGriesAgg.Buffer): Array[Byte] = {
    val items = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](buffer.map.size)
    var bytes = 8 + 4
    val it = buffer.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      items += ((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(buffer.n)
    bb.putInt(items.size)
    items.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getLong()
    val size = bb.getInt()
    val map = new java.util.HashMap[String, Long](math.max(size * 2, 16))
    var i = 0
    while (i < size) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong()
      map.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    new MisraGriesAgg.Buffer(map, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
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

  /** Misra–Gries frequent-items summary of a string column:
    * struct(n, items[(item, est)]), ≤ k items, est undercounts by at
    * most n/(k+1).
    */
  def misraGries(item: Column, k: Int): Column =
    GraftBridge.column(MisraGriesAgg(GraftBridge.expression(item), k).toAggregateExpression())

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
