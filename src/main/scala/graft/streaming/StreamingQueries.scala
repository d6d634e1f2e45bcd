package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Det.r4
import graft.sources.Tables

/** Structured Streaming twins of the batch SLI cadence queries
  * (SURVEY §2.6/§2.10): the same aggregations re-expressed over
  * `readStream`, verified batch-equivalent in StreamingSpec (the
  * batch queries are the DuckDB-oracled source of truth; streaming
  * runs are tested against them, not hashed).
  *
  * Scale notes: both twins are single-stateful-operator pipelines.
  * The tumbling window keys state by (window, event_type) — bounded
  * by watermark expiry, so state size is O(types × active windows),
  * not O(events). The session twin keys by (session_window, user_id)
  * with merge-on-overlap; at 100 TB the shuffle partitions on
  * user_id and state expires one watermark-delay after each session
  * closes. File-source here; in production the same plans bind to a
  * Kafka source unchanged.
  */
object StreamingQueries {

  /** Streaming `events` source: file stream over the sf directory's
    * events parquet, with the same nanos→µs ts normalization as the
    * batch loader — and the same DUAL-LAYOUT handling: a streaming
    * source needs its schema up front, so peek at the existing files'
    * footer once (driver-side metadata read, same cost class as the
    * stream's own listing) and convert raw-nanos LONG ts only when
    * that is what is physically stored. A standard µs-TIMESTAMP
    * events table streams unchanged.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    Tables.configure(spark)
    // glob form: the file stream source requires a directory or glob
    // basePath (a bare file path is rejected); the glob matches the
    // single events parquet in testdata and N part-files in production
    val glob = s"${dir.stripSuffix("/")}/events*.parquet"
    val schema = spark.read.parquet(glob).schema
    val raw = spark.readStream.schema(schema).parquet(glob)
    schema("ts").dataType match {
      case LongType =>
        // integral div, not `/`: see Tables.events — double division
        // loses ns precision at epoch magnitude
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive µs column: interpret as UTC wall clock (session tz is
        // UTC in every graft session) — see Tables.events
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Streaming twin of #10 `slo_hourly_tumble`: tumbling 1-hour
    * window + per-type count/avg, 1-hour watermark for state expiry.
    * Output schema matches the batch query exactly.
    */
  def hourlyTumble(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), r4(avg("value")).as("avg_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("avg_value"))

  /** Streaming `documents` source (same file-stream pattern). */
  def docsStream(spark: SparkSession, dir: String): DataFrame = {
    Tables.configure(spark)
    spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))
      .parquet(s"${dir.stripSuffix("/")}/documents*.parquet")
  }

  /** Streaming exact dedup: the first document with each normalized
    * content hash passes; later duplicates are dropped from the
    * stream. Unbounded state here (finite test streams); production
    * bounds it with `withWatermark` + `dropDuplicatesWithinWatermark`
    * — dedup-exactly-within-horizon, the standard ingest-dedup
    * contract at 100 TB/day rates.
    */
  def dedupedDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("h", md5(lower(trim(col("text")))))
      .dropDuplicates("h")

  /** Sliding-window twin (2-hour windows every hour): each event
    * contributes to two overlapping windows — the burn-rate-style
    * smoothing cadence. Same expression works identically in batch
    * (StreamingSpec asserts equivalence).
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), r4(avg("value")).as("avg_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("avg_value"))

  /** Ingest dedup with BOUNDED state — the production form of the
    * contract `dedupedDocs` documents: `dropDuplicatesWithinWatermark`
    * keeps a key's state only until the watermark passes one delay
    * beyond its event time, so a re-delivered event (at-least-once
    * source, upstream retry, replayed batch) inside the horizon is
    * dropped while state stays O(keys-per-horizon) — NEVER O(stream
    * history), which is what plain `dropDuplicates` on a stream
    * degrades to (every key ever seen, forever, an OOM at 100 TB/day).
    *
    * Semantics: exactly-once WITHIN the horizon, at-least-once across
    * it (a duplicate arriving later than watermark-delay after the
    * original may re-emit — the standard contract; downstream
    * idempotent sinks absorb it, see sources/Upsert). Keyed on
    * event_id; the watermark column need NOT be in the key, which is
    * precisely what distinguishes this operator from
    * `dropDuplicates(event_id, ts)`.
    *
    * StreamDedupSpec pins: replayed batches emit once, state rows
    * stay bounded across 10× history under RocksDB, and the emitted
    * set equals the batch `dropDuplicates` ground truth.
    */
  def dedupWithinWatermark(events: DataFrame,
                           delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming twin of #9 `sli_sessionize`: `session_window` with a
    * gap of 1800001 ms — session_window splits at gap >= gapDuration,
    * the batch logic at gap > 1800000 ms, so +1 ms makes the two
    * semantics IDENTICAL (not just approximately aligned). One row
    * per (user, session) with its event count.
    */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "1800001 milliseconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"))

  /** Streaming twin of `psi_drift`'s corpus stage: the SAME
    * (type, bucket) conditional-count aggregation
    * (SliQueries.psiBucketCounts), run incrementally as a plain
    * running aggregate — bounded state (≤ |types|·20 groups), no
    * window, complete output. A live deployment sinks this frame and
    * reads the PSI through the SAME bounded finisher the batch
    * report uses (SliQueries.psiFromBuckets), so the alarm a monitor
    * fires mid-stream and the nightly batch report can never
    * disagree on arithmetic — StreamingSpec pins the equivalence.
    */
  def psiBuckets(events: DataFrame): DataFrame =
    graft.operators.SliQueries.psiBucketCounts(events)

  /** Streaming `documents` source: file stream over the sf
    * directory's documents parquet (schema from a one-time footer
    * peek, like [[eventsStream]]; documents has no ts layout quirk).
    */
  def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    val glob = s"${dir.stripSuffix("/")}/documents*.parquet"
    val schema = spark.read.parquet(glob).schema
    spark.readStream.schema(schema).parquet(glob)
  }

  /** Streaming twin of `token_drift_movers`' aggregation stage (the
    * psi_drift playbook, r7 verdict #5): the SAME per-token side-count
    * aggregation ([[graft.operators.LlmQueries.driftTokenCounts]]),
    * run incrementally as a plain running aggregate — VOCAB-grain
    * state (bounded by the token domain, not the corpus), no window,
    * complete output. A live deployment sinks this frame and reads
    * the top-20 movers through the SAME bounded finisher the nightly
    * report uses ([[graft.operators.LlmQueries
    * .driftMoversFromCounts]]), so the mid-stream drift alarm and the
    * batch report can never disagree on arithmetic — StreamingSpec
    * pins stream == batch movers.
    */
  def driftTokenCounts(docs: DataFrame): DataFrame =
    graft.operators.LlmQueries.driftTokenCounts(docs)
}
