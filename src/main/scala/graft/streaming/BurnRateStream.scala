package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Det.r4

/** Streaming twin of `burn_rate_alerts` (SliQueries.scala #62) — the
  * multi-window multi-burn-rate alert policy run continuously instead
  * of as a daily batch report. This is the deepest streaming pipeline
  * in the library: THREE chained stateful stages (minute pre-agg →
  * two window re-aggs → stream-stream window join → delivery dedup),
  * exercising Spark's multiple-stateful-operator support end to end.
  *
  * Semantics: an hour alerts when BOTH
  *   - fast burn (that hour's breach-minute share / 1% budget) ≥ 100
  *   - slow burn (trailing-6-hour breach-minute share / 1% budget) ≥ 85
  * Fast catches the spike; slow suppresses one-hour blips. The slow
  * window here is the minute-weighted 6-hour share (the SRE-handbook
  * definition) — the batch #62 query uses the unweighted mean of
  * hourly fasts; both are standard, and the spec pins this twin
  * against ITS OWN batch run (shared expression ⇒ equivalence by
  * construction, like StreamJoins).
  *
  * Scale notes: the minute pre-agg is the only stage that sees raw
  * events — everything downstream re-aggregates minute rows (types ×
  * 60/hour), so join + dedup state is O(types × window horizon),
  * independent of event rate. The two re-aggs consume the minute
  * stage's window column directly (`window(window, ...)` chaining),
  * so no second scan of the source; the final join keys on
  * (event_type, window end) — the documented windowed
  * stream-stream-join pattern, state expired by watermark.
  */
object BurnRateStream {

  val FastThreshold = 100.0
  val SlowThreshold = 85.0

  private def breach = col("v") < 50 || col("v") > 150

  /** Stage 1 — minute pre-aggregation (shared by both burn windows).
    * Identical grain to the batch query's minute rollup.
    */
  def minuteRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(avg("value").as("v"))

  /** Stage 2a — fast burn: tumbling 1-hour re-agg OVER the minute
    * windows (chained stateful agg; no second source scan).
    */
  def fastBurn(minutes: DataFrame): DataFrame =
    minutes
      .groupBy(window(col("window"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("minutes"),
        sum(when(breach, 1L).otherwise(0L)).as("breaches"))
      .select(
        col("window"),
        col("event_type"),
        (col("breaches") * lit(1.0) / col("minutes") / lit(0.01)).as("fast"))

  /** Stage 2b — slow burn: SLIDING 6-hour/1-hour re-agg over the same
    * minute windows. Each minute row lands in 6 overlapping windows;
    * the window ending at hour boundary H covers hours H-6..H.
    */
  def slowBurn(minutes: DataFrame): DataFrame =
    minutes
      .groupBy(window(col("window"), "6 hours", "1 hour").as("slow_window"),
        col("event_type").as("slow_type"))
      .agg(
        count(lit(1)).as("minutes6"),
        sum(when(breach, 1L).otherwise(0L)).as("breaches6"))
      .select(
        col("slow_window"),
        col("slow_type"),
        (col("breaches6") * lit(1.0) / col("minutes6") / lit(0.01)).as("slow"))

  /** Stage 3 — alert rows: join fast and slow on (event_type, window
    * end) so each hour pairs with the 6-hour window that ENDS with it,
    * then apply both thresholds. Valid on streaming frames (windowed
    * stream-stream join) and batch frames (plain equi-join) alike.
    */
  def alerts(events: DataFrame): DataFrame =
    alertWindows(events).select(
      col("event_type"),
      col("window.start").as("alert_hour"),
      col("fast"), col("slow"))

  /** As [[alerts]] but keeping the hour-window STRUCT: the struct is
    * what carries the event-time/watermark metadata downstream
    * (projecting `.start` strips it), so the dedup stage consumes
    * this form.
    */
  def alertWindows(events: DataFrame): DataFrame = {
    val m = minuteRollup(events)
    fastBurn(m).join(slowBurn(m),
        col("event_type") === col("slow_type") &&
          col("window.end") === col("slow_window.end"))
      .where(col("fast") >= FastThreshold && col("slow") >= SlowThreshold)
      .select(
        col("event_type"), col("window"),
        r4(col("fast")).as("fast"),
        r4(col("slow")).as("slow"))
  }

  /** Stage 4 — delivery dedup: alert rows are unique per (type, hour)
    * by construction, but an at-least-once source replay can re-emit
    * one; `dropDuplicatesWithinWatermark` makes delivery idempotent
    * with state bounded to the watermark horizon (vs `dropDuplicates`'
    * unbounded key set). `alert_hour` carries event-time metadata
    * propagated from the window aggs through the join, so NO second
    * `withWatermark` node is added here — a second node would hold
    * the global (min-policy) watermark at zero until it sees data,
    * which it never would because the upstream aggs would then never
    * finalize. Streaming-only — batch runs are exactly-once already.
    * Consumes [[alertWindows]] (the window struct is the event-time
    * carrier) and projects to the [[alerts]] schema after the dedup.
    */
  def dedupForDelivery(alertWindowRows: DataFrame): DataFrame =
    alertWindowRows
      .dropDuplicatesWithinWatermark("event_type", "window")
      .select(
        col("event_type"),
        col("window.start").as("alert_hour"),
        col("fast"), col("slow"))
}
