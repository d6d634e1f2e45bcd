package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Persisted co-purchase edge store — the IvfIndex pattern applied to
  * the graph plane (r7 verdict #1, the last structural scale gap).
  *
  * The ≥2-support co-purchase edge list is consumed by NINE queries
  * (triangle_parts, clustering_coeff, kcore_parts, degree_dist,
  * degree_assortativity, common_neighbor_recs[_capped], hub_distance,
  * hill_tail_index) but built by a lineitem self-join that is the
  * single most expensive plan fragment in the suite: corpus-sized on
  * both sides, it spilled 20–34 GB at sf3–sf10 when every bench query
  * re-paid it, and its ~100 GB projected sf30 spill forced the two
  * heaviest consumers out of the round-7 300× scale row entirely.
  *
  * Lifecycle (the standard database-index shape, same as IvfIndex):
  *   1. BUILD (once per corpus — `CREATE INDEX` DDL, run untimed at
  *      ingest): the audited same-order pair join, aggregated to the
  *      full (a, b, w≥1) PAIR-SUPPORT table (kept because a w = 1
  *      pair can cross the support floor later), and the ≥2-support
  *      SYMMETRIC closure published as a parquet table CLUSTERED BY
  *      (x) INTO [[NumBuckets]] BUCKETS, SORTED BY (x), one file per
  *      bucket. The build pays the corpus-sized shuffle exactly once.
  *   2. PROBE (every query): a bucketed table scan. Bucketing makes
  *      the scan's output partitioning HashPartitioning(x, 32), so
  *      the degree aggregation (groupBy x) and the wedge self-join
  *      (e1.x = e2.x) — the two shapes every graph consumer starts
  *      from — run with ZERO exchange on the edge side (pinned in
  *      PlanAuditSpec); SORTED BY (x) with one file per bucket also
  *      hands windows and SMJs their sort for free (graft sessions
  *      expose it via bucketedTableScan.outputOrdering).
  *   3. REFRESH (per ingest batch — [[appendOrders]]): pair counts
  *      for the NEW orders only (O(batch), no corpus self-join) land
  *      as a delta partition under `ingest_batch=<id>` (dynamic
  *      partition overwrite — replaying a batch REPLACES its delta,
  *      the IvfIndex.appendVectors idempotency contract), then the
  *      adjacency republishes from base ∪ deltas. [[compact]] folds
  *      accumulated deltas into the base — the LSM maintenance shape.
  *      Correct because per-(a,b) support is ADDITIVE over complete
  *      orders: batches must not split an order's lines (the natural
  *      ingest grain — an order is one transaction).
  *
  * At 100 TB the edge list is an ingest-time artifact maintained next
  * to the fact table; queries never touch lineitem at all. The
  * canonical (a < b) edge frame is a filter over the same table —
  * parquet IS the materialization, so the probe path needs no
  * localCheckpoint and no per-session SharedFrames build.
  *
  * Correctness: the stored edge SET is identical to the inline
  * build's (same join, same support floor), so all nine consumers'
  * oracle hashes are unchanged; EdgeStoreSpec pins store ≡ inline
  * build row-for-row, append ≡ full rebuild, replay idempotency, and
  * compaction invariance.
  */
object EdgeStore {

  /** Bump when the stored FORMAT changes (schema, bucketing, support
    * floor, layout) — a persisted store from older code must never be
    * reused. v2: pair-support base + ingest_batch deltas under the
    * store root; the published adjacency moved to `<root>/und`.
    */
  val FormatVersion = 2

  /** Bucket count: matches the bench session's 32 threads so a full
    * probe scan is width-parallel; bucketed joins don't require it to
    * match `spark.sql.shuffle.partitions`.
    */
  val NumBuckets = 32

  def storePath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_edges/v${FormatVersion}_$key"
  }

  /** Catalog identifier for (dir) — bucketing metadata lives in the
    * catalog, so each session re-registers the external table over
    * the persisted files (cheap, idempotent).
    */
  def tableName(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"graft_edges_v${FormatVersion}_$key"
  }

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Co-purchase pair supports for a lineitem slice: (a < b, w) with
    * w = number of shared orders IN THIS SLICE. The audited
    * corpus-sized shape — the one plan fragment that touches
    * lineitem. Additive over complete-order slices, which is what
    * makes [[appendOrders]] exact.
    */
  def pairCounts(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select("l_orderkey", "l_partkey")
    li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(count(lit(1)).as("w"))
  }

  /** Base ∪ deltas, re-aggregated to current per-pair support.
    * Deltas read with an explicit schema: an EMPTY ingest batch
    * legitimately writes a file-less delta directory (only the
    * commit marker), and schema inference has nothing to read there.
    */
  private def mergedPairs(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(s"$path/pairs")
    val deltaDir = s"$path/deltas"
    val all =
      if (fs(spark, deltaDir).exists(new Path(deltaDir)))
        base.unionByName(
          spark.read.schema("a BIGINT, b BIGINT, w BIGINT")
            .parquet(deltaDir).select("a", "b", "w"))
      else base
    all.groupBy("a", "b").agg(sum("w").as("w"))
  }

  /** Publish the ≥2-support symmetric adjacency from a pair frame as
    * the bucketed catalog table (one sorted file per bucket). The
    * adjacency derives from pairs/deltas — never from its own table —
    * so the overwrite has no read-write conflict.
    */
  private def publishUnd(spark: SparkSession, dir: String,
      pairs: DataFrame): Unit = {
    val e = pairs.filter(col("w") >= 2).select("a", "b")
    val und = e.select(col("a").as("x"), col("b").as("y"))
      .unionAll(e.select(col("b").as("x"), col("a").as("y")))
    val t = tableName(dir)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    und.repartition(NumBuckets, col("x"))
      .write.bucketBy(NumBuckets, "x").sortBy("x")
      .option("path", s"${storePath(dir)}/und")
      .mode("overwrite").saveAsTable(t)
  }

  /** Idempotent build-if-missing (JVM-synchronized like IvfIndex;
    * the published adjacency's `_SUCCESS` is the completion marker).
    */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val path = storePath(dir)
    if (fs(spark, path).exists(new Path(s"$path/und/_SUCCESS"))) return path
    pairCounts(Tables.lineitem(spark, dir))
      .write.mode("overwrite").parquet(s"$path/pairs")
    publishUnd(spark, dir, spark.read.parquet(s"$path/pairs"))
    path
  }

  /** Incremental refresh for an ingest batch of NEW orders (an
    * order's lines must not split across batches). O(batch) pair
    * counting + a delta-partition write scoped to this `batchId`
    * (dynamic overwrite ⇒ replay-safe), then the adjacency
    * republishes from base ∪ deltas. No corpus self-join — the
    * difference between a nightly maintenance window and a rebuild.
    */
  def appendOrders(spark: SparkSession, dir: String, newLineitem: DataFrame,
      batchId: Long): Unit = synchronized {
    val path = ensure(spark, dir)
    pairCounts(newLineitem)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$path/deltas")
    publishUnd(spark, dir, mergedPairs(spark, path))
  }

  /** Ad-hoc append with an auto-derived batch id (max existing + 1)
    * so successive default appends ACCUMULATE — the IvfIndex
    * convention; callers that manage replay-safe ids (foreachBatch)
    * use the explicit overload.
    */
  def appendOrders(spark: SparkSession, dir: String,
      newLineitem: DataFrame): Unit = {
    val path = ensure(spark, dir)
    val deltaDir = new Path(s"$path/deltas")
    val f = fs(spark, path)
    // batch ids from the partition DIRECTORY names (driver-side
    // metadata listing — robust to empty batches, no schema read)
    val next =
      if (!f.exists(deltaDir)) 1L
      else f.listStatus(deltaDir).map(_.getPath.getName)
        .filter(_.startsWith("ingest_batch="))
        .map(_.stripPrefix("ingest_batch=").toLong)
        .foldLeft(0L)(math.max) + 1L
    appendOrders(spark, dir, newLineitem, next)
  }

  /** Continuous maintenance: attach [[appendOrders]] as a
    * `foreachBatch` sink on a stream of new lineitem rows (micro-
    * batches are complete-order slices in any order-grain ingest —
    * Kafka keyed by order, or the order-atomic file drop). Batch ids
    * are offset by +1 so replays can never collide with the build's
    * own base; each batch's delta partition is dynamic-overwritten on
    * replay, so the published adjacency is exactly-once regardless of
    * restarts — the IvfIndex.streamingAppend contract on the graph
    * plane. Start/stop/checkpoint belong to the caller.
    */
  def streamingAppend(spark: SparkSession, dir: String, newLineitem: DataFrame):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    newLineitem.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        appendOrders(spark, dir, batch, batchId + 1)
    }

  /** Fold accumulated deltas into the pair-support base (the LSM
    * compaction step; the published adjacency is already current, so
    * this touches only maintenance state). Staged write + rename so a
    * crash mid-compaction leaves the old base intact.
    */
  def compact(spark: SparkSession, dir: String): Unit = synchronized {
    val path = storePath(dir)
    val deltaDir = new Path(s"$path/deltas")
    val f = fs(spark, path)
    if (!f.exists(deltaDir)) return
    mergedPairs(spark, path)
      .write.mode("overwrite").parquet(s"$path/pairs_next")
    f.delete(new Path(s"$path/pairs"), true)
    f.rename(new Path(s"$path/pairs_next"), new Path(s"$path/pairs"))
    f.delete(deltaDir, true)
  }

  /** Session-local registration of the persisted files as a bucketed
    * external table (the catalog holds the bucket spec; files carry
    * the bucket-id suffix the bucketed writer gave them). Must match
    * [[publishUnd]]'s layout exactly — FormatVersion guards drift.
    */
  private def register(spark: SparkSession, dir: String): DataFrame = {
    val t = tableName(dir)
    if (!spark.catalog.tableExists(t))
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $t (x BIGINT, y BIGINT)
           |USING parquet
           |CLUSTERED BY (x) SORTED BY (x) INTO $NumBuckets BUCKETS
           |LOCATION '${storePath(dir)}/und'""".stripMargin)
    spark.table(t)
  }

  /** The undirected (x → y) adjacency — a bucketed scan, build-once. */
  def undirected(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    register(spark, dir)
  }

  /** The canonical (a < b) support-edge frame — the same table with
    * the x < y half selected; alias-projected, so the scan's bucket
    * partitioning on x propagates to `a` and downstream joins keyed
    * on `a` stay exchange-free.
    */
  def canonical(spark: SparkSession, dir: String): DataFrame =
    undirected(spark, dir)
      .filter(col("x") < col("y"))
      .select(col("x").as("a"), col("y").as("b"))
}
