package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The table-format seam: every mutable-table operation the engine
  * performs — keyed MERGE (upsert), small-file compaction, read, and
  * the streaming-ingest twin — expressed as ONE interface, so the
  * storage format is a deployment choice rather than a code change.
  *
  * Why an interface: the plain-parquet implementation below is
  * correct (UpsertSpec/CompactionSpec prove the contract through this
  * trait), but production incremental maintenance at 100 TB wants an
  * open table format with ACID commits. The mapping is mechanical:
  *
  *   - [[MergeTableFormat.upsert]]  → `MERGE INTO t USING batch ON
  *     <keys> WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
  *     INSERT *` (Iceberg and Delta verbatim). The parquet path's
  *     write-audit-publish staging hop and its create-exclusive lock
  *     file exist ONLY because plain parquet has no commit protocol —
  *     the format's optimistic-concurrency snapshot commit replaces
  *     both (a conflicting committer retries on the new snapshot
  *     instead of queueing on a lock).
  *   - [[MergeTableFormat.compact]] → Iceberg `rewrite_data_files` /
  *     Delta `OPTIMIZE` (with the same per-partition scoping and the
  *     cluster-by columns becoming the format's sort order).
  *   - [[MergeTableFormat.read]]    → a catalog table read; snapshot
  *     isolation makes the "never read a half-published merge"
  *     property free instead of staged.
  *   - [[MergeTableFormat.streamingUpsert]] → the same foreachBatch
  *     MERGE; idempotency under replay still comes from every batch
  *     row replacing itself, so at-least-once delivery keeps its
  *     exactly-once effect unchanged.
  *
  * The Iceberg/Delta implementations are env-blocked here (no jars in
  * the offline container) — [[MergeTableFormat.forName]] names them
  * and fails with the mapping above, so wiring them later is adding
  * one object, not reshaping callers.
  */
trait MergeTableFormat {

  /** Format name as it would appear in a writer config. */
  def name: String

  /** Keyed MERGE of `batch` into the table at `path`: rows match on
    * `keys`; the batch row wins, within-batch dups resolve to the
    * highest `versionCol` (content-hash tie-break). Idempotent under
    * replay: re-merging any batch is a no-op. Touches only the
    * partitions the batch lands in.
    */
  def upsert(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String], versionCol: String = "ts"): Unit

  /** Rewrite the named date partitions down to `filesPerDate` files,
    * clustered for row-group statistics; content-identical, other
    * partitions untouched, idempotent.
    */
  def compact(spark: SparkSession, path: String, days: Seq[String],
      filesPerDate: Int = 1): Unit

  /** Read the table (partition-discovery read; a format-backed
    * implementation reads the current snapshot).
    */
  def read(spark: SparkSession, path: String): DataFrame

  /** Streaming twin: every micro-batch merges through [[upsert]]
    * (at-least-once delivery → exactly-once effect on keyed content).
    */
  def streamingUpsert(stream: DataFrame, path: String, keys: Seq[String],
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        upsert(df.sparkSession, path, df, keys)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}

/** Plain-parquet implementation: partition-scoped anti-join merge
  * with write-audit-publish staging and the create-exclusive sink
  * lock standing in for the missing commit protocol (see
  * [[Upsert]] for the mechanism and UpsertSpec for the proofs, which
  * run THROUGH this trait).
  */
object ParquetMergeFormat extends MergeTableFormat {
  val name = "parquet"

  def upsert(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String], versionCol: String = "ts"): Unit =
    Upsert.upsertDatePartitioned(spark, path, batch, keys, versionCol)

  def compact(spark: SparkSession, path: String, days: Seq[String],
      filesPerDate: Int = 1): Unit =
    EventSink.compactDates(spark, path, days, filesPerDate)

  def read(spark: SparkSession, path: String): DataFrame =
    EventSink.readDatePartitioned(spark, path)
}

object MergeTableFormat {
  /** Resolve a format by name. `parquet` is always available;
    * `iceberg`/`delta` are named so deployments fail with the exact
    * swap instructions instead of a silent fallback.
    */
  def forName(name: String): MergeTableFormat = name match {
    case "parquet" => ParquetMergeFormat
    case "iceberg" | "delta" =>
      throw new IllegalArgumentException(
        s"format '$name' needs its runtime jars on the classpath; " +
          "implement MergeTableFormat with MERGE INTO / rewrite_data_files " +
          "per the trait scaladoc — callers are already format-agnostic")
    case other =>
      throw new IllegalArgumentException(s"unknown table format '$other'")
  }
}
