package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det.{r2, r4}
import graft.sources.Tables

/** Incrementally-maintained materialized day-report — the reference's
  * actual serving flow (`[pk]`: the SLR updater polls check results,
  * bulk-upserts `IndicatorValue`, and reports read the PERSISTED
  * downsampled rows, never the raw store) executed as exact
  * materialized-view maintenance over the date-partitioned sink.
  *
  * The maintained table stores the MERGEABLE state of
  * [[SliQueries.sloDayReport]] per (event_date, event_type):
  * `n, sum_value, min_value, max_value` — count/sum/min/max are all
  * associative, so a day's row is a pure function of that day's fact
  * rows and any rollup (avg = sum/n included) derives without
  * revisiting raw data.
  *
  * Maintenance contract (same shape as [[SketchRollup.appendDayFrom]]):
  * refresh recomputes ONLY the affected days from the post-merge sink
  * contents and replaces those days' rows. Because the day row is a
  * pure function of the day's data, replay/backfill/out-of-order
  * ingestion all converge — re-running a refresh is a no-op, and the
  * incremental table is BIT-IDENTICAL to a one-shot build
  * (ReportMaintenanceSpec proves both, plus equality with the directly
  * computed `slo_day_report` under upsert-correction).
  *
  * Cost at 100 TB: a refresh scans the affected days only (partition-
  * pruned on the date sink) and REWRITES only the affected days'
  * partitions of the report table (dynamic partition overwrite) —
  * unaffected days' files are never touched, so a mid-refresh crash
  * is recoverable by re-running the same refresh.
  * The declared query `slo_report_maintained` reads ONLY this table
  * (asserted in PlanAuditSpec) yet hash-matches the DuckDB oracle that
  * aggregates the raw fixture directly — the strongest form of
  * evidence that incremental maintenance loses nothing.
  */
object ReportMaintenance {

  /** Bump when the stored state schema changes.
    * v2: table is partitioned by event_date so a refresh swaps ONLY
    * the affected days' partitions (dynamic partition overwrite).
    */
  val FormatVersion = 2

  /** Deterministic per-corpus location (same convention as
    * [[SketchRollup.tablePath]]; production would use a managed table).
    */
  def tablePath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_report/v${FormatVersion}_$key"
  }

  /** Mergeable per-(event_date, event_type) report state from an
    * events frame (needs ts, event_type, value). One pass, one shuffle
    * on the report grain.
    */
  def dayStats(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum("value").as("sum_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))

  /** Idempotent one-shot build of the persisted report table
    * (event_date-partitioned so refreshes can swap single days).
    */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val path = tablePath(dir)
    val hPath = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath))
      dayStats(Tables.events(spark, dir))
        .write.mode("overwrite").partitionBy("event_date").parquet(path)
    path
  }

  /** Recompute the given days from `events` (the post-merge sink — or
    * any frame with ts/event_type/value) and replace those days' rows
    * in the report table. Days outside the list are never re-read AND
    * never rewritten: the publish is a DYNAMIC partition overwrite
    * scoped to the affected `event_date` leaf partitions, with new
    * files staged by the commit protocol before the swap — a failed
    * refresh cannot damage unaffected days, and re-running converges
    * (the day row is a pure function of the day's data).
    */
  def refreshDays(spark: SparkSession, events: DataFrame, days: Seq[String],
      tablePath: String): Unit = {
    if (days.isEmpty) return
    val dayDates = days.map(java.sql.Date.valueOf)
    dayStats(events.filter(to_date(col("ts")).isInCollection(dayDates)))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date")
      .parquet(tablePath)
  }

  /** Report-on-ingest: the streaming composition — every micro-batch
    * (1) merges into the date-partitioned sink by content key
    * ([[graft.sources.Upsert.upsertDatePartitioned]], replay-safe),
    * then (2) refreshes each AFFECTED day's report row from the SINK's
    * post-merge contents. This is the reference updater loop itself:
    * poll → upsert IndicatorValue → refresh the persisted report.
    */
  def maintainOnIngest(stream: DataFrame, sinkPath: String, reportPath: String,
      keys: Seq[String], checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val spark = df.sparkSession
        graft.sources.Upsert.upsertDatePartitioned(spark, sinkPath, df, keys)
        val days = df.select(to_date(col("ts")).as("d")).distinct()
          .collect().map(_.getDate(0).toString)
        refreshDays(spark, spark.read.parquet(sinkPath), days.toSeq, reportPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Declared query `slo_report_maintained` (FULL DuckDB oracle — the
    * same aggregation as `slo_day_report` computed directly over the
    * raw fixture): the day report served entirely from the maintained
    * table. avg derives as sum/n; rounding happens at read time so the
    * stored state stays exact and mergeable.
    */
  /** Stored-table schema, declared so reads survive an EMPTY table:
    * a partitioned write of zero rows leaves no data files to infer
    * from (event_date is the partition column).
    */
  val TableSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "event_type string, n bigint, sum_value double, " +
        "min_value double, max_value double, event_date date")

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(TableSchema).parquet(path)

  def sloReportMaintained(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, ensure(spark, dir))
      .select(
        col("event_date").as("day"),
        col("event_type"),
        col("n"),
        r4(col("sum_value") / col("n")).as("avg_value"),
        r2(col("min_value")).as("min_value"),
        r2(col("max_value")).as("max_value"),
        r2(col("sum_value")).as("sum_value"))
      .orderBy("day", "event_type")
}
