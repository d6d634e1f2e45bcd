package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the escape
  * hatch for session semantics `session_window` can't express (here:
  * the batch engine's exact strict-`>`-30-min gap rule, carried
  * incrementally across micro-batches).
  *
  * State per user is three longs (count, events, last ts) — constant
  * size regardless of history, the property that makes this run
  * forever at 100 TB ingest. Events WITHIN a micro-batch are sorted
  * in memory per (user, batch) — bounded by per-batch per-user
  * volume, not by history. In production a watermark-based
  * EventTimeTimeout would expire idle users' state; the test feeds a
  * finite stream so NoTimeout keeps the law exact.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts_ms: Long)
  case class SessState(sessions: Long, events: Long, lastTs: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** The incremental sessionizer: same gap law as
    * `SliQueries.sessionized` (new session iff gap > 1 800 000 ms).
    */
  def updateUser(user: Long, evs: Iterator[Ev],
      state: GroupState[SessState]): Iterator[UserSessions] = {
    var st = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue))
    evs.toSeq.sortBy(_.ts_ms).foreach { e =>
      val newSession = st.sessions == 0L || (e.ts_ms - st.lastTs) > 1800000L
      st = SessState(
        if (newSession) st.sessions + 1 else st.sessions,
        st.events + 1,
        e.ts_ms)
    }
    state.update(st)
    Iterator.single(UserSessions(user, st.sessions, st.events))
  }

  /** Streaming per-user session counts over an events stream (needs
    * `user_id` + timestamp `ts`). Update output mode: each batch
    * emits the refreshed totals for the users it touched.
    */
  def sessionCounts(events: DataFrame): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updateUser)
  }

  // ---- production shape: closed-session records + state EXPIRY ----

  case class SessionRecord(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)
  case class OpenSess(start: Long, last: Long, n: Long)
  /** Carries the raw timestamp: the watermark attribute must survive
    * into the stateful operator's input (projecting it away fails
    * analysis with "Event-time timeout not supported without
    * watermark").
    */
  case class EvT(user_id: Long, ts: java.sql.Timestamp) {
    def ts_ms: Long = ts.getTime
  }

  /** Close a session when the gap law says so (strict > 30 min,
    * identical to the batch engine); when the WATERMARK says so, also
    * expire the state. Emits one record per completed session.
    */
  def updateOpenSession(user: Long, evs: Iterator[EvT],
      state: GroupState[OpenSess]): Iterator[SessionRecord] = {
    if (state.hasTimedOut) {
      // watermark passed last_ts + gap: no in-order event can extend
      // this session anymore — emit it and drop the state entirely.
      val st = state.get
      state.remove()
      Iterator.single(SessionRecord(user, st.start, st.last, st.n))
    } else {
      val out = Seq.newBuilder[SessionRecord]
      var cur = state.getOption
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
        state.update(c)
        // fire once the watermark proves the session can't grow; the
        // max() guards the engine's "timeout must be in the future
        // of the watermark" contract when a batch closes late.
        state.setTimeoutTimestamp(
          math.max(c.last + 1800001L, state.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }
  }

  /** Streaming sessionization emitting CLOSED sessions (append mode):
    * state per user is one open session (3 longs) and is REMOVED once
    * the watermark passes the gap horizon — state size is O(users
    * active in the last 30 min), independent of stream history. This
    * is the indefinitely-running form of [[sessionCounts]].
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
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateOpenSession)
  }
}
