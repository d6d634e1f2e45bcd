package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark / late-data policy (SURVEY §2.6 streaming row): in
  * append mode a window is emitted exactly once after the watermark
  * passes its end, and events arriving later than the watermark are
  * DROPPED — the emitted count never changes. This is the state-
  * bounding contract that lets the streaming twins run indefinitely
  * at 100 TB/day: state is O(active windows), not O(history).
  *
  * Uses MemoryStream for deterministic micro-batch boundaries (file
  * sources deliver everything in one batch here, so nothing would
  * ever be late).
  */
class WatermarkSpec extends SparkTestBase {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("append-mode window emits once and drops sub-watermark late events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val windowed = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
      .select(col("window.start").as("w"), col("n"), col("sum_v"))

    val q = windowed.writeStream
      .format("memory").queryName("wm_test").outputMode("append").start()
    try {
      // batch 1: two events in the 10:00 window, then 12:00 advances
      // event time; watermark after the batch = 12:00 - 10 min = 11:50,
      // past the 10:00 window's end -> it finalizes.
      input.addData(Seq((ts("10:05"), 1.0), (ts("10:45"), 2.0), (ts("12:00"), 4.0)))
      q.processAllAvailable()
      // batch 2: a LATE event for the already-finalized 10:00 window
      // (10:15 < watermark 11:50) must be dropped, not re-emitted.
      input.addData(Seq((ts("10:15"), 100.0), (ts("12:30"), 8.0)))
      q.processAllAvailable()
      // batch 3: advance watermark past the 12:00 window so it emits.
      input.addData(Seq((ts("14:00"), 16.0)))
      q.processAllAvailable()

      val out = spark.table("wm_test")
        .select(col("w").cast("string"), col("n"), col("sum_v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      // 10:00 window: the two on-time events only — late 100.0 dropped.
      assert(out.contains(("2024-01-01 10:00:00", 2L, 3.0)),
        s"10:00 window wrong or missing: ${out.mkString(", ")}")
      assert(!out.exists { case (w, _, v) => w.startsWith("2024-01-01 10") && v >= 100.0 },
        "late event leaked into a finalized window")
      // 12:00 window: both its events (12:30 was on time — watermark
      // was 11:50 when it arrived).
      assert(out.contains(("2024-01-01 12:00:00", 2L, 12.0)),
        s"12:00 window wrong or missing: ${out.mkString(", ")}")
      // each finalized window appears exactly once (append-mode law)
      assert(out.map(_._1).distinct.length == out.length)

      // the engine itself accounted the drop
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 1, s"expected exactly 1 watermark-dropped row, got $dropped")
    } finally q.stop()
  }
}
