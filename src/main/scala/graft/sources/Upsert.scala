package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Idempotent upsert/backfill into the date-partitioned event sink —
  * the reference's `IndicatorValue` bulk-upsert semantics (unique
  * content key, re-ingestion can never double-count) re-expressed as
  * partition-scoped merge over plain parquet.
  *
  * Shape (write-audit-publish, the no-table-format MERGE):
  *   1. Dedup the incoming batch on the content key (latest
  *      `versionCol` wins) — a batch is allowed to carry its own dups.
  *   2. Compute the AFFECTED partitions (distinct event_date of the
  *      batch — a driver-side list of partition VALUES, metadata-scale
  *      by construction: a backfill touches bounded dates).
  *   3. Read ONLY those partitions of the sink (partition-pruned scan)
  *      and anti-join away rows whose key the batch replaces.
  *   4. Stage survivors ∪ batch to a scratch dir, then publish with
  *      DYNAMIC partition overwrite — untouched partitions are never
  *      listed, read, or rewritten (UpsertSpec proves their files
  *      don't change).
  *
  * The staging hop exists because Spark (correctly) refuses to
  * overwrite a path it is simultaneously reading; staging also gives
  * the production property that a failed merge leaves the sink intact.
  * Cost at 100 TB: two scans + two writes of the affected days only —
  * independent of total corpus size.
  *
  * Idempotency: re-running any batch (or replaying a failed one) is a
  * no-op by construction — every batch row replaces itself. That is
  * exactly the contract `foreachBatch` needs ([[streamingUpsert]]):
  * structured streaming guarantees at-least-once batch delivery, so
  * the sink function must tolerate replays.
  */
object Upsert {

  /** Merge `batch` (schema of `Tables.events`: must contain `ts` plus
    * the key columns) into the date-partitioned sink at `path`.
    * Rows match on `keys`; among matches the batch row wins, and
    * within-batch dups resolve to the highest `versionCol`
    * (deterministic tie-break on the key itself being unique).
    */
  def upsertDatePartitioned(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String], versionCol: String = "ts"): Unit = {
    val withDate = batch.withColumn("event_date", to_date(col("ts")))
    // deterministic even on version ties: fall back to a content hash
    // so the surviving row never depends on partitioning or task order
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc,
        xxhash64(struct(batch.columns.map(col).toIndexedSeq: _*)))
    val deduped = withDate
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS"))) {
      // first load: nothing to merge
      deduped.repartition(col("event_date"))
        .write.partitionBy("event_date").mode("overwrite").parquet(path)
      return
    }

    // partition VALUES only — the one driver-side step (metadata-scale)
    val affected = deduped.select("event_date").distinct()
      .collect().map(_.getDate(0))
    if (affected.isEmpty) return

    val existing = spark.read.parquet(path)
      .filter(col("event_date").isin(affected.toSeq: _*))
    val merged = existing
      .join(deduped.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(deduped)

    val staging = s"${path}__staging"
    merged.repartition(col("event_date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(staging)

    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.read.parquet(staging)
        .repartition(col("event_date"))
        .write.partitionBy("event_date").mode("overwrite").parquet(path)
    } finally {
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    }
  }

  /** Streaming twin: every micro-batch merges through
    * [[upsertDatePartitioned]], making the sink idempotent under
    * batch replay (at-least-once delivery → exactly-once effect on
    * the keyed contents).
    */
  def streamingUpsert(stream: DataFrame, path: String, keys: Seq[String],
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        upsertDatePartitioned(df.sparkSession, path, df, keys)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
