package graft

import org.apache.spark.sql.functions._

/** Streaming ≡ batch for the SCD type-2 build: the
  * transformWithState twin's CLOSED versions must equal the batch
  * window build's closed versions EXACTLY (same users, same bands,
  * same effective ranges, same event counts) — fed the identical
  * event set split across micro-batches so state must carry over.
  * The one open version per user is live state by design; the batch
  * frame's eff_to IS NULL rows are that same set, asserted too.
  */
class Scd2StreamSpec extends SparkTestBase {

  test("streaming SCD2 (transformWithState) == batch scd2 version frame") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, Long)]
    val q = graft.streaming.Scd2Stream
      .closedVersions(input.toDF().toDF("user_id", "ts_ms", "event_id", "band"))
      .writeStream.format("memory").queryName("scd2_closed")
      .outputMode("append").start()
    try {
      val evs = graft.sources.Tables.events(spark, sf)
        .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
          col("event_id"),
          floor(col("value") / 25).cast("long").as("band"))
        .orderBy("ts_ms", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // 5 micro-batches in event-time order: versions opened in one
      // batch must close in a later one through carried state
      evs.grouped(evs.length / 5 + 1).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("scd2_closed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      val batch = graft.operators.SliQueries.scd2VersionFrame(spark, sf)
        .filter(col("eff_to").isNotNull)
        .select(col("user_id"), col("band"), unix_millis(col("eff_from")),
          unix_millis(col("eff_to")), col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(streamed == batch,
        s"closed-version mismatch: stream-only ${(streamed -- batch).take(3)}, " +
          s"batch-only ${(batch -- streamed).take(3)}")
      // open versions: exactly one per user with history, on both sides
      val openBatch = graft.operators.SliQueries.scd2VersionFrame(spark, sf)
        .filter(col("eff_to").isNull).groupBy("user_id").count().collect()
      assert(openBatch.forall(_.getLong(1) == 1L), "batch open-version grain")
      val users = graft.sources.Tables.events(spark, sf)
        .select("user_id").distinct().count()
      assert(openBatch.length.toLong == users)
    } finally q.stop()
  }
}
