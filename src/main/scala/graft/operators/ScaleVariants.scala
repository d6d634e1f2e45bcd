package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det.r4
import graft.functions.{QuantileFunctions, SketchFunctions}
import graft.sources.Tables

/** The documented "at 100 TB, swap exact for the sketch plane"
  * promises, WIRED as executable variants (r4 verdict #3). Each keeps
  * its exact twin's report schema, so the swap is a one-line change
  * for a caller; each has a spec pinning the approximation against
  * the exact oracle-backed form (ScaleVariantSpec).
  *
  * Why variants instead of replacing the exact forms: the exact
  * queries are the oracle-checkable ground truth and remain correct
  * at their bounded grains; the variants are the shapes whose COST
  * stays flat when a grain that was "bounded in practice" (types ×
  * days, per-group buffers) stops being so.
  */
object ScaleVariants {

  /** `dq_profile_hll` — [[ScalarQueries.dqProfile]] with the six
    * exact `count(distinct)`s (an honest 6× row multiplier through
    * one Expand exchange) swapped for HLL++ `approx_count_distinct`
    * at 2% RSD: ALL distinct aggregates collapse into the same
    * single-pass partial agg as the null/min/max counters — no
    * Expand, no row multiplication, constant memory per column.
    * Profiling is diagnostics; ±2% cardinality is the accepted trade
    * everywhere. Schema identical to the exact form.
    */
  def dqProfileHll(spark: SparkSession, dir: String): DataFrame =
    ScalarQueries.dqProfileWith(spark, dir,
      c => approx_count_distinct(c, 0.02))

  /** `rolling_active_users_sketch` — [[SliQueries.rollingActiveUsers]]
    * served ENTIRELY from the persisted per-day MinHash sketch table
    * ([[SketchRollup]]): merge each day's (type-keyed) user sketches
    * into a day sketch, fan each day out to its ≤7 window anchors
    * against the broadcast day spine, and merge per anchor — the raw
    * events table is NOT in the plan. `active_7d` and `user_days`
    * (Σ per-day distinct) are k=512 MinHash estimates (RSD ≈ 4.4%).
    * This is the incremental-report shape: a new day appends ONE
    * sketch partition and re-merges ≤7 KB-sized rows, instead of
    * re-distincting a week of raw corpus.
    */
  def rollingActiveUsersSketch(spark: SparkSession, dir: String): DataFrame = {
    val k = SketchRollup.K
    val daily = SketchRollup.readTable(spark, SketchRollup.ensure(spark, dir))
    val perDay = daily.groupBy(col("event_date").as("day"))
      .agg(SketchFunctions.minhashMerge(col("sig"), k).as("sig"))
      .withColumn("day_users",
        round(SketchFunctions.minhashCardinality(col("sig"), k)).cast("long"))
    val days = perDay.select(col("day").as("d")).distinct()
    perDay.join(broadcast(days), datediff(col("d"), col("day")).between(0, 6))
      .groupBy(col("d").as("day"))
      .agg(
        round(SketchFunctions.minhashCardinality(
          SketchFunctions.minhashMerge(col("sig"), k), k))
          .cast("long").as("active_7d"),
        sum("day_users").as("user_days"))
      .orderBy("day")
  }

  /** `mad_robust_gk` — [[ScalarQueries.madRobust]] on the GK
    * quantile plane (ε = 0.01 rank error): per-type median/IQR from
    * one GK sketch pass, then ONE deviation pass sketching
    * |value − med| against the broadcast centers. The exact form's
    * `percentile` buffers every group value in memory
    * (ObjectHashAggregate) — fine at 5 event types, unbounded at
    * per-group 100 TB; GK holds O(1/ε log εN) per group no matter
    * the group size. Same two-pass structure, same report schema.
    */
  def madRobustGk(spark: SparkSession, dir: String): DataFrame = {
    val Eps = 0.01
    val events = Tables.events(spark, dir)
    val centers = events.groupBy("event_type")
      .agg(QuantileFunctions.gkSketch(col("value"), Eps).as("qs"))
      .withColumn("q",
        QuantileFunctions.gkQuantiles(col("qs"), Seq(0.25, 0.5, 0.75)))
      .select(col("event_type"), col("q").getItem(1).as("med"),
        (col("q").getItem(2) - col("q").getItem(0)).as("iqr0"))
    events.join(broadcast(centers), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        r4(first("med")).as("median_value"),
        r4(QuantileFunctions.gkQuantiles(
          QuantileFunctions.gkSketch(abs(col("value") - col("med")), Eps),
          Seq(0.5)).getItem(0)).as("mad"),
        r4(first("iqr0")).as("iqr"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }
}
