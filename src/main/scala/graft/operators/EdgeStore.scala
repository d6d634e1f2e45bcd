package graft.operators

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
  *      ingest): the audited same-order pair join + support agg, its
  *      SYMMETRIC closure written as a parquet table CLUSTERED BY (x)
  *      INTO [[NumBuckets]] BUCKETS, SORTED BY (x), one file per
  *      bucket. The build pays the corpus-sized shuffle exactly once.
  *   2. PROBE (every query): a bucketed table scan. Bucketing makes
  *      the scan's output partitioning HashPartitioning(x, 32), so
  *      the degree aggregation (groupBy x) and the wedge self-join
  *      (e1.x = e2.x) — the two shapes every graph consumer starts
  *      from — run with ZERO exchange on the edge side (pinned in
  *      PlanAuditSpec); SORTED BY (x) with one file per bucket also
  *      hands the SMJ its sort for free.
  *
  * At 100 TB the edge list is an ingest-time artifact maintained next
  * to the fact table (rebuilt when lineitem changes, like any
  * secondary index); queries never touch lineitem at all. The canonical
  * (a < b) edge frame is a filter over the same table — parquet IS the
  * materialization, so the probe path needs no localCheckpoint and no
  * per-session SharedFrames build.
  *
  * Correctness: the stored edge SET is byte-identical to the inline
  * build's (same join, same support floor), so all nine consumers'
  * oracle hashes are unchanged — proven by the r8 CORRECTNESS run and
  * pinned by GoldenCountsSpec; EdgeStoreSpec additionally pins
  * store ≡ inline-build row-for-row.
  */
object EdgeStore {

  /** Bump when the stored FORMAT changes (schema, bucketing, support
    * floor) — a persisted store from older code must never be reused.
    */
  val FormatVersion = 1

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

  /** The audited corpus-sized build: same-order part pairs with
    * co-purchase support ≥ 2, canonical a < b orientation. This is
    * the ONE plan fragment that touches lineitem; everything a graph
    * query does afterwards is edge- or node-grain.
    */
  private def buildCanonical(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select("a", "b")
  }

  /** Idempotent build-if-missing (JVM-synchronized like IvfIndex;
    * `_SUCCESS` is the completion marker). Persists the UNDIRECTED
    * closure — (a,b) and (b,a) for every support edge — because the
    * undirected adjacency is what degree aggs, wedge joins and BFS
    * actually consume; the canonical a < b frame is the `x < y`
    * filter of the same table. repartition on the bucket column
    * before the bucketed write yields exactly one file per bucket,
    * which is what lets the scan expose its SORTED BY order.
    */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val path = storePath(dir)
    val hPath = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) return path
    val e = buildCanonical(spark, dir)
    val und = e.select(col("a").as("x"), col("b").as("y"))
      .unionAll(e.select(col("b").as("x"), col("a").as("y")))
    val t = tableName(dir)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    und.repartition(NumBuckets, col("x"))
      .write.bucketBy(NumBuckets, "x").sortBy("x")
      .option("path", path).mode("overwrite").saveAsTable(t)
    path
  }

  /** Session-local registration of the persisted files as a bucketed
    * external table (the catalog holds the bucket spec; files carry
    * the bucket-id suffix the bucketed writer gave them). Must match
    * [[ensure]]'s layout exactly — FormatVersion guards drift.
    */
  private def register(spark: SparkSession, dir: String): DataFrame = {
    val t = tableName(dir)
    if (!spark.catalog.tableExists(t))
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $t (x BIGINT, y BIGINT)
           |USING parquet
           |CLUSTERED BY (x) SORTED BY (x) INTO $NumBuckets BUCKETS
           |LOCATION '${storePath(dir)}'""".stripMargin)
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
