package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SliQueries
import graft.streaming.StreamingQueries

/** Batch-equivalence tests for the streaming twins (SURVEY §5.2.4):
  * run each streaming query over the sf0.001 events file source to
  * completion (complete output mode — watermarks don't drop data
  * here, they only bound state in continuous operation) and assert
  * the result equals the batch twin's.
  */
class StreamingSpec extends SparkTestBase {

  private def runToCompletion(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  test("hourly tumbling twin == batch slo_hourly_tumble") {
    val got = runToCompletion(
      StreamingQueries.hourlyTumble(StreamingQueries.eventsStream(spark, sf)),
      "tumble_equiv")
      .orderBy("window_start_ms", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val expect = SliQueries.sloHourlyTumble(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expect.length, s"${got.length} windows != ${expect.length}")
    assert(got.sameElements(expect))
  }

  test("sliding-window twin == identical expression over the batch frame") {
    val got = runToCompletion(
      StreamingQueries.slidingCounts(StreamingQueries.eventsStream(spark, sf)),
      "sliding_equiv")
      .orderBy("window_start_ms", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val expect = StreamingQueries.slidingCounts(
        graft.sources.Tables.events(spark, sf))
      .orderBy("window_start_ms", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expect.length && got.sameElements(expect))
  }

  test("session_window twin == batch sli_sessionize (per-user session count + sizes)") {
    val sessions = runToCompletion(
      StreamingQueries.userSessions(StreamingQueries.eventsStream(spark, sf)),
      "session_equiv")
    val got = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        (sum("n_events") * lit(1.0) / count(lit(1))).as("avg_ev"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), math.rint(r.getDouble(2) * 1e4))))
      .toMap
    val expect = SliQueries.sliSessionize(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), math.rint(r.getDouble(2) * 1e4))))
      .toMap
    assert(got.keySet == expect.keySet)
    val diffs = expect.collect {
      case (u, e) if got(u) != e => (u, e, got(u))
    }
    assert(diffs.isEmpty, s"mismatched users: ${diffs.take(5)}")
  }

  test("streaming dedup passes exactly one doc per content hash") {
    val q = StreamingQueries.dedupedDocs(StreamingQueries.docsStream(spark, sf))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("dedup_stream")
    val expectUnique = graft.sources.Tables.documents(spark, sf)
      .select(countDistinct(md5(lower(trim(col("text"))))))
      .collect().head.getLong(0)
    assert(streamed.count() == expectUnique)
    assert(streamed.select("h").distinct().count() == expectUnique)
  }

  test("session twin: total events conserved across sessions") {
    val sessions = spark.table("session_equiv")
    val streamed = sessions.agg(sum("n_events")).collect().head.getLong(0)
    val raw = graft.sources.Tables.events(spark, sf).count()
    assert(streamed == raw)
  }

  test("streaming parquet sink: checkpointed file-to-file pipeline round-trips") {
    // the production ingest shape: file source -> transform ->
    // exactly-once parquet sink (checkpoint + _spark_metadata commit
    // log). AvailableNow processes the backlog then stops, which is
    // also the batch-backfill recipe for the same streaming code.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val q = StreamingQueries.eventsStream(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000)
    finally q.stop()
    val back = spark.read.parquet(s"$dir/out")
    val orig = graft.sources.Tables.events(spark, sf)
    assert(back.count() == orig.count())
    assert(back.select(countDistinct("event_id")).collect().head.getLong(0)
      == orig.count())
  }

  test("streaming drift token counts through the shared finisher == batch token_drift_movers") {
    // the r7-verdict #5 twin: the vocab-grain count aggregation runs
    // incrementally; the movers come off the SAME finisher the batch
    // query uses. localCheckpoint for the same memory-sink expr-id
    // reason as the PSI twin below (the finisher crossJoins its input).
    val counts = runToCompletion(
      StreamingQueries.driftTokenCounts(
        StreamingQueries.documentsStream(spark, sf)),
      "drift_equiv").localCheckpoint()
    val got = graft.operators.LlmQueries.driftMoversFromCounts(counts)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = SparkEntry.queries("token_drift_movers")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expect.length && got.sameElements(expect),
      s"stream movers ${got.toSeq} != batch ${expect.toSeq}")
  }

  test("streaming PSI buckets through the shared finisher == batch psi_drift") {
    // localCheckpoint: the finisher self-joins its input, and a
    // memory-sink View carries fixed expr ids that break self-join
    // attribute dedup — the checkpoint mints fresh ones
    val counts = runToCompletion(
      StreamingQueries.psiBuckets(StreamingQueries.eventsStream(spark, sf)),
      "psi_equiv").localCheckpoint()
    val got = SliQueries.psiFromBuckets(counts)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expect = SliQueries.psiDrift(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expect.length && got.sameElements(expect),
      s"stream PSI ${got.toSeq} != batch ${expect.toSeq}")
  }
}
