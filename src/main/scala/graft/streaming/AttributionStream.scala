package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import AttributionStream.{AttrEv, AttrRecord, LastTouch}

/** Streaming twin of the `purchase_attribution` declared query
  * ([[graft.operators.SliQueries.purchaseAttribution]]): last-touch
  * attribution as a `transformWithState` processor — per user, ONE
  * `ValueState` cell holding the most recent non-purchase touch; a
  * purchase reads it and emits `(purchase, attributed_type)` with the
  * same 1-hour staleness rule as the batch window form.
  *
  * Why this is the right streaming shape: the batch form's
  * `last(struct, ignoreNulls) OVER (user …)` becomes a 2-long+string
  * state cell per ACTIVE user; an event-time timer clears the cell
  * one attribution-window after the last touch, so state is O(users
  * touched in the last hour), not O(users ever) — the same bounded-
  * state discipline as the TWS sessionizer. Runs on the RocksDB
  * state store (the `transformWithState` API requires it).
  *
  * AttributionStreamSpec proves stream == batch on the same events:
  * the per-purchase records aggregate to exactly the declared
  * query's (attributed, n) rollup.
  */
class AttributionProcessor extends StatefulProcessor[Long, AttrEv, AttrRecord] {

  @transient private var touch: ValueState[LastTouch] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    touch = getHandle.getValueState("touch", Encoders.product[LastTouch],
      TTLConfig.NONE)

  /** Batch-identical semantics: events processed in the total order
    * (ts, event_id); purchases read the carried touch (stale > 1 h →
    * 'direct'), everything else becomes the new touch.
    */
  override def handleInputRows(user: Long, evs: Iterator[AttrEv],
      timers: TimerValues): Iterator[AttrRecord] = {
    val out = Seq.newBuilder[AttrRecord]
    var cur = if (touch.exists()) Some(touch.get()) else None
    evs.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      if (e.event_type == "purchase") {
        val attributed = cur match {
          // µs staleness bound == the batch form's unix_micros window
          case Some(t) if e.ts_us - t.ts_us <= 3600000000L => t.et
          case _ => "direct"
        }
        out += AttrRecord(e.event_id, e.ts_us, user, attributed)
      } else {
        cur = Some(LastTouch(e.ts_us, e.event_type))
      }
    }
    cur.foreach { t =>
      touch.update(t)
      // one timer per key: clear the touch once it can never attribute
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      // timers stay ms-grain (the API's unit); ceil the µs deadline so the
      // cell is never cleared before the last µs at which it can attribute
      getHandle.registerTimer(
        math.max(t.ts_us / 1000L + 3600001L,
          timers.getCurrentWatermarkInMs() + 1L))
    }
    out.result().iterator
  }

  /** Touch older than the attribution window — drop the state cell
    * (bounded state: only users active within the last hour). */
  override def handleExpiredTimer(user: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[AttrRecord] = {
    touch.clear()
    Iterator.empty
  }
}

object AttributionStream {

  case class AttrEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String) {
    /** Event time in MICROseconds — the staleness comparison must run at
      * the same precision as the batch query's `unix_micros` or events
      * within sub-ms of the 1-hour boundary attribute differently
      * stream-vs-batch (r4 advice). `getTime` already carries the ms part;
      * `getNanos` carries the FULL sub-second fraction, so only the
      * µs-within-ms remainder is added. */
    def ts_us: Long = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  }
  case class LastTouch(ts_us: Long, et: String)
  case class AttrRecord(purchase_id: Long, ts_us: Long, user_id: Long,
      attributed: String)

  /** Per-purchase attribution stream (append mode, event-time
    * timers, RocksDB-backed state). `events` needs columns
    * (user_id, ts, event_id, event_type). */
  def attributions(events: DataFrame,
      watermarkDelay: String = "0 seconds"): Dataset[AttrRecord] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[AttrEv]
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
