package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import StatefulSessions.{EvT, OpenSess, SessionRecord}

/** The SAME closed-session semantics as
  * [[StatefulSessions.closedSessions]] re-expressed on Spark 4's
  * `transformWithState` — the successor API to
  * `flatMapGroupsWithState` (SPARK-40434 line): typed per-key state
  * cells (`ValueState`/`ListState`/`MapState`), first-class timers
  * replacing the single implicit timeout, and the RocksDB state store
  * as the backing engine. Keeping BOTH twins is deliberate: the old
  * API is what most deployed jobs still run; the new one is where
  * state TTL, multiple cells per key, and state repartitioning live.
  * TwsSessionSpec proves the two APIs and the batch engine agree
  * record-for-record on the same stream.
  *
  * Scale shape is unchanged from the old twin: one open session
  * (3 longs) per ACTIVE user, timer-expired one gap-length after the
  * session's last event — state is O(users active in the last
  * 30 min), not O(history).
  */
class SessionProcessorTws extends StatefulProcessor[Long, EvT, SessionRecord] {

  @transient private var open: ValueState[OpenSess] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState("open", Encoders.product[OpenSess], TTLConfig.NONE)

  /** Same strict-`>`-30-min gap law as the batch engine and the
    * old-API twin; re-arms the session's expiry timer after each
    * batch's events (delete-then-register — the new API allows many
    * timers per key, this processor wants exactly one).
    */
  override def handleInputRows(user: Long, evs: Iterator[EvT],
      timers: TimerValues): Iterator[SessionRecord] = {
    val out = Seq.newBuilder[SessionRecord]
    var cur = if (open.exists()) Some(open.get()) else None
    evs.toSeq.sortBy(_.ts_ms).foreach { e =>
      cur match {
        case Some(c) if e.ts_ms - c.last <= 1800000L =>
          cur = Some(OpenSess(c.start, e.ts_ms, c.n + 1))
        case Some(c) =>
          out += SessionRecord(user, c.start, c.last, c.n)
          cur = Some(OpenSess(e.ts_ms, e.ts_ms, 1))
        case None =>
          cur = Some(OpenSess(e.ts_ms, e.ts_ms, 1))
      }
    }
    cur.foreach { c =>
      open.update(c)
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(
        math.max(c.last + 1800001L, timers.getCurrentWatermarkInMs() + 1L))
    }
    out.result().iterator
  }

  /** Watermark passed last_ts + gap: the session can't grow — emit it
    * and drop the state (the explicit-timer form of the old API's
    * `state.hasTimedOut` branch).
    */
  override def handleExpiredTimer(user: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessionRecord] = {
    if (!open.exists()) Iterator.empty
    else {
      val st = open.get()
      open.clear()
      Iterator.single(SessionRecord(user, st.start, st.last, st.n))
    }
  }
}

object SessionProcessorTws {

  /** Closed-session stream via `transformWithState` (append mode,
    * event-time timers). Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `...state.RocksDBStateStoreProvider`) — the new API refuses the
    * default HDFS-backed store.
    */
  def closedSessions(events: DataFrame,
      watermarkDelay: String = "0 seconds"): Dataset[SessionRecord] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[EvT]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessorTws,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
