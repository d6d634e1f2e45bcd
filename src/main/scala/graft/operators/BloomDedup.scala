package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.sources.Tables

/** Bloom-prefiltered incremental dedup — the "is this already in the
  * corpus" pass an INCREMENTAL ingestion pipeline runs on every new
  * batch. The asymmetry is the whole design: the history is
  * corpus-sized (100 TB) and the batch is small, so the batch's
  * content-hash set becomes a Bloom filter BROADCAST INTO THE HISTORY
  * SCAN — history rows that can't match die at the scan (no shuffle,
  * no join buffer), and only Bloom survivors (true matches + the fpp
  * sliver) reach the exact join that makes the result exact. This is
  * precisely the shape of Spark's own InjectRuntimeFilter
  * optimization (conf-gated, join-pattern-triggered), built here
  * explicitly so the operator owns its guarantee instead of hoping
  * the optimizer fires: the filter is Spark's native codegen'd
  * [[BloomFilterMightContain]] expression over the same
  * `util.sketch.BloomFilter` both sides of Spark's runtime filter
  * use — `stat.bloomFilter` builds it with `putLong`, the expression
  * probes with `mightContainLong`, both over `xxhash64(seg)`.
  *
  * Correctness does NOT depend on the Bloom filter: false positives
  * are discarded by the exact md5 join, and a Bloom filter has no
  * false negatives. BloomDedupSpec pins the bloomed plan equal to the
  * unfiltered exact plan row-for-row.
  */
object BloomDedup {

  /** `might_contain(serializedBloom, longValue)` as a Column — the
    * codegen'd scan-side probe. The bloom bytes ride the plan as a
    * Literal (KB-to-MB for realistic batch sizes, same transport as a
    * broadcast hint's small side).
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), GraftBridge.expression(value)))

  /** Serialize a batch column's values into a Bloom filter (driver
    * holds only the bit array, never the rows). `expectedItems` sizes
    * the bits; production callers size it from an approximate count
    * of the batch (the BATCH, not the corpus — that asymmetry is what
    * keeps this constant-memory at 100 TB history).
    */
  def buildBloom(batch: DataFrame, colName: String,
      expectedItems: Long = 4096L, fpp: Double = 0.01): Array[Byte] = {
    // stat.bloomFilter NPEs on an empty frame (its internal aggregate
    // yields a null buffer) — an empty batch legitimately means "an
    // empty bloom that contains nothing"
    val bf =
      if (batch.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else batch.stat.bloomFilter(colName, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Declared query `bloom_prefilter_dedup` (full oracle) — segment-
    * level incremental dedup: which 8-token segments of the "new
    * batch" (doc_id < 100) already exist in the "history"
    * (doc_id ≥ 100)? Per lang: batch segment instances, instances
    * already seen in history, genuinely new instances. Segment
    * grain (not whole-doc) because boilerplate repeats at paragraph
    * level — the [[DedupOps.segmentDedup]] pass run incrementally.
    *
    * Plan: batch segs → Bloom bits (one small job); history segs →
    * `might_contain` AT THE SCAN → distinct md5 of survivors → exact
    * left join back to batch instances. The history side's shuffle
    * carries only Bloom survivors — output-sized, not corpus-sized.
    */
  def bloomPrefilterDedup(spark: SparkSession, dir: String): DataFrame = {
    val inst = DedupOps.segmentedDocs(Tables.documents(spark, dir), Seq("lang"))
      .select(col("doc_id"), col("lang"), explode(col("segs")).as("seg"))
    val batch = inst.filter(col("doc_id") < 100)
      .select(col("lang"), md5(col("seg")).as("h"), xxhash64(col("seg")).as("k"))
    val bloom = buildBloom(batch, "k")
    val hist = inst.filter(col("doc_id") >= 100)
      .filter(mightContain(bloom, xxhash64(col("seg"))))
      .select(md5(col("seg")).as("hh"))
      .distinct()
    batch.join(hist, col("h") === col("hh"), "left")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_batch_segs"),
        sum(when(col("hh").isNotNull, 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("hh").isNull, 1L).otherwise(0L)).as("n_new"))
      .orderBy("lang")
  }

  /** The exact twin with no Bloom prefilter — BloomDedupSpec pins
    * equality (the filter must never change the answer, only the
    * bytes that reach the join).
    */
  private[graft] def exactTwin(spark: SparkSession, dir: String): DataFrame = {
    val inst = DedupOps.segmentedDocs(Tables.documents(spark, dir), Seq("lang"))
      .select(col("doc_id"), col("lang"), explode(col("segs")).as("seg"))
    val batch = inst.filter(col("doc_id") < 100)
      .select(col("lang"), md5(col("seg")).as("h"))
    val hist = inst.filter(col("doc_id") >= 100)
      .select(md5(col("seg")).as("hh")).distinct()
    batch.join(hist, col("h") === col("hh"), "left")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_batch_segs"),
        sum(when(col("hh").isNotNull, 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("hh").isNull, 1L).otherwise(0L)).as("n_new"))
      .orderBy("lang")
  }
}
