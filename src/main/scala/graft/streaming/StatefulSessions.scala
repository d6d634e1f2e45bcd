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
}
