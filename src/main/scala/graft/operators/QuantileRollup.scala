package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det.r4
import graft.functions.QuantileFunctions
import graft.sources.Tables

/** Persisted per-day QUANTILE sketch table + rollup — the percentile
  * twin of [[SketchRollup]] (distinct counts) and
  * [[ReportMaintenance]] (exact sum/min/max): with GK sketches
  * persisted per (event_type, event_date), p50/p90/p99 reports over
  * ANY date range re-aggregate KB-scale sketch rows instead of
  * revisiting raw events — previously the one readout that forced a
  * raw re-scan (`percentile_approx` keeps its state internal).
  *
  * BUILD (once, at ingest): one linear scan of `events` →
  * (event_type, event_date, gk_sketch(value, ε=0.01), n). ROLLUP (the
  * declared query `quantile_sketch_rollup`): `gk_merge` per
  * event_type → `gk_quantiles` readout. QuantileSketchSpec asserts
  * the GK rank guarantee end-to-end THROUGH the merge: every estimate
  * ranks within ε·n (+1) of its target against the exact sorted data.
  */
object QuantileRollup {

  /** Relative rank error ε: estimates rank within 1% of target. */
  val Eps = 0.01

  /** Bump when the sketch format changes. */
  val FormatVersion = 1

  def tablePath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_qsketch/v${FormatVersion}_$key"
  }

  /** Per-(event_type, event_date) sketch rows — the one raw scan. */
  def dailySketches(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(
        QuantileFunctions.gkSketch(col("value"), Eps).as("qs"),
        count(lit(1)).as("n_events"))

  /** Idempotent one-shot build of the persisted sketch table. */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val path = tablePath(dir)
    val hPath = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath))
      dailySketches(spark, dir).write.mode("overwrite").parquet(path)
    path
  }

  /** Incremental maintenance — the daily-ETL append (mirror of
    * [[SketchRollup.appendDayFrom]]): sketch ONLY the given day's
    * rows from `events` and replace that day's rows in the persisted
    * table (staged rewrite; the table is KB-scale). Re-running a day
    * is idempotent — the day row is a pure function of the day's
    * data — so backfills and retries can never double-count, and
    * QuantileSketchSpec proves day-wise builds answer quantiles
    * within the same ε bound as one-shot builds.
    */
  def appendDayFrom(spark: SparkSession, events: DataFrame, day: String,
      tablePath: String): Unit = {
    val dayRows = events
      .filter(to_date(col("ts")) === lit(day).cast("date"))
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(
        QuantileFunctions.gkSketch(col("value"), Eps).as("qs"),
        count(lit(1)).as("n_events"))
    val hPath = new org.apache.hadoop.fs.Path(s"$tablePath/_SUCCESS")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) {
      dayRows.write.mode("overwrite").parquet(tablePath)
      return
    }
    val existing = spark.read.parquet(tablePath)
      .filter(col("event_date") =!= lit(day).cast("date"))
    val staged = s"${tablePath}__staged"
    existing.unionByName(dayRows).write.mode("overwrite").parquet(staged)
    spark.read.parquet(staged).write.mode("overwrite").parquet(tablePath)
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
  }

  /** Declared query `quantile_sketch_rollup` (rows-only: GK sketch
    * internals have no DuckDB mirror; the ε rank bound is asserted in
    * QuantileSketchSpec): all-time p50/p90/p99 per event_type computed
    * ONLY from the persisted per-day sketch table.
    */
  def quantileSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val daily = spark.read.parquet(ensure(spark, dir))
    daily
      .groupBy("event_type")
      .agg(
        QuantileFunctions.gkMerge(col("qs"), Eps).as("qs"),
        count(lit(1)).as("n_days"),
        sum("n_events").as("n_events"))
      .withColumn("q", QuantileFunctions.gkQuantiles(col("qs"), Seq(0.5, 0.9, 0.99)))
      .select(
        col("event_type"), col("n_days"), col("n_events"),
        r4(col("q")(0)).as("p50_est"),
        r4(col("q")(1)).as("p90_est"),
        r4(col("q")(2)).as("p99_est"))
      .orderBy("event_type")
  }
}
