package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Affine2
import graft.functions.Det._
import graft.operators.Checkpoints._
import graft.sources.Tables

/** Distributed LINEAR RECURRENCES — `v_t = A_t · v_{t-1} + c_t` over
  * an ordered, corpus-proportional grain — via parallel scan over the
  * affine-map monoid (Blelloch 1990 §1.4; the same two-pass slicing
  * as [[PrefixOps]], generalized from the sum monoid to 2-D affine
  * composition).
  *
  * Why this family needs its own plane: a smoothing/filtering
  * recurrence looks inherently sequential (each state depends on the
  * previous), and the two in-repo escapes both stop short —
  * [[PrefixOps]] handles only `A_t = I` (pure sums), and
  * [[graft.functions.ClampScan]] runs in ONE ordered window task per
  * key, fine for calendar-bounded grains but a straggler on a
  * corpus-proportional one. Affine maps compose associatively
  * (`(F∘G)(v) = F_m G_m v + F_m g_c + f_c`), so the textbook scan
  * decomposition applies: per-slice running compositions in parallel,
  * one bounded pass over slice TOTALS for the cross-slice prefix
  * maps, then a broadcast join stitches each row's final map — every
  * task touches only its own slice, identical to the prefix-sum
  * story, and the recurrence's sequential depth disappears from the
  * job count entirely.
  */
object RecurrenceOps {

  /** Adds `outCol` = the composed affine map `f_t ∘ … ∘ f_1` (an
    * [[Affine2.MapType]] struct) of all rows up to and including the
    * current one, in ascending `orderCol` order within each `partCol`
    * group. Callers apply it to the group's seed state with
    * [[Affine2.applyTo]].
    *
    * `orderCol` must be numeric and unique per row within its group
    * (the [[PrefixOps]] contract); the slice id is the same
    * DETERMINISTIC equal-width function of the key — never
    * `spark_partition_id()` — so the two passes cannot disagree.
    * The only single-task windows run over (a) each (group, slice)'s
    * own rows and (b) the (group, slice)-grain totals frame
    * (≤ |groups|×P rows, data-size constant).
    */
  def affineScanBy(df: DataFrame, partCol: String, orderCol: String,
      mapCol: String, outCol: String): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val snap = df.cut()
    val bounds = snap.groupBy(col(partCol)).agg(
      min(col(orderCol)).cast("double").as("__lo"),
      max(col(orderCol)).cast("double").as("__hi"))
    val withPid = snap.join(broadcast(bounds), Seq(partCol))
      .withColumn("__pid", least(lit(p - 1), greatest(lit(0),
        floor((col(orderCol).cast("double") - col("__lo")) * p /
          (col("__hi") - col("__lo") + 1.0d)).cast("int"))))
      .drop("__lo", "__hi")
    // pass 1: running composition LOCAL to each (group, slice)
    val wRun = Window.partitionBy(col(partCol), col("__pid"))
      .orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // two consumers (slice totals + final stitch): materialize once
    val run = withPid
      .withColumn("__run", Affine2.composeScan(col(mapCol)).over(wRun))
      .cut()
    // each slice's TOTAL map is its last row's running map
    val totals = run.groupBy(col(partCol), col("__pid"))
      .agg(max_by(col("__run"), col(orderCol)).as("__tot"))
    // pass 2: EXCLUSIVE composition across slices per group — the
    // bounded-grain window (empty frame evaluates to the identity
    // map, so slice 0 needs no special case)
    val wOff = Window.partitionBy(col(partCol)).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", Affine2.composeScan(col("__tot")).over(wOff))
      .select(col(partCol), col("__pid"), col("__off"))
    run.join(broadcast(offsets), Seq(partCol, "__pid"))
      .withColumn(outCol, Affine2.compose(col("__run"), col("__off")))
      .drop("__pid", "__run", "__off")
  }

  /** `holt_smooth` — Holt's double exponential smoothing (level +
    * trend, α=0.3 β=0.2) of each type's daily mean value, plus the
    * one-step-ahead forecast `level + trend` — the trend-aware
    * successor to `ewma_smooth` every SLO dashboard grows into
    * (full oracle: the recursive CTE replaying the textbook
    * recurrence).
    *
    * The recurrence in state form: `(l,b)_t = A·(l,b)_{t-1} + α·x_t·
    * (1, β)` with `A = [[1-α, 1-α], [-αβ, 1-αβ]]` — substitute l_t
    * into b_t's definition to see the (2,·) row. Seeded at
    * `(x_first, 0)`, for which row 1's own update is a fixpoint
    * (l_1 = (1-α)x_1 + αx_1 = x_1, b_1 = 0), so the scan applies
    * uniformly from row 1 and matches the oracle's anchor row with
    * no special-casing.
    *
    * Scale: the day grain here is calendar-bounded, but the plan is
    * the [[affineScanBy]] two-pass — the SAME code path a
    * minute/event-grain series (corpus-proportional, the
    * window_lag_delta lesson) runs through, which RecurrenceSpec
    * pins against the one-task sequential scan at minute grain.
    * Composed-vs-sequential float drift is reassociation-ulp-class
    * (contractive A) — absorbed by the r4 grid, same argument as
    * PrefixOps.rankedPrefix.
    */
  def holtSmooth(spark: SparkSession, dir: String): DataFrame =
    holtStates(spark, dir)
      .select(col("event_type"), col("day"),
        r4(col("x")).as("day_avg"),
        r4(col("level")).as("level"),
        r4(col("trend")).as("trend"),
        r4(col("level") + col("trend")).as("forecast_next"))
      .orderBy("event_type", "day")

  private[operators] val HoltAlpha = 0.3
  private[operators] val HoltBeta = 0.2

  /** Unrounded Holt state per (type, day): (event_type, day, k, x,
    * level, trend) — shared by `holt_smooth` and `holt_anomaly`.
    */
  private[operators] def holtStates(spark: SparkSession,
      dir: String): DataFrame = {
    val alpha = HoltAlpha
    val beta = HoltBeta
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(avg("value").as("x"))
      .withColumn("k", datediff(col("day"), to_date(lit("2024-01-01"))))
      .withColumn("__m", Affine2.affineMap(
        lit(1 - alpha), lit(1 - alpha),
        lit(-alpha * beta), lit(1 - alpha * beta),
        lit(alpha) * col("x"), lit(alpha * beta) * col("x")))
    val scanned = affineScanBy(daily, "event_type", "k", "__m", "__f")
    // seeds from the SCANNED frame (checkpointed inside affineScanBy)
    // — a second `daily` reference would re-run the corpus-grain
    // events agg just to read one value per group
    val seeds = scanned.groupBy("event_type")
      .agg(min_by(col("x"), col("k")).as("x0"))
    scanned.join(broadcast(seeds), Seq("event_type"))
      .withColumn("__s", Affine2.applyTo(col("__f"), col("x0"), lit(0.0)))
      .select(col("event_type"), col("day"), col("k"), col("x"),
        col("__s").getField("s1").as("level"),
        col("__s").getField("s2").as("trend"))
  }

  /** `holt_anomaly` — one-step-forecast residual anomalies per type
    * (full oracle): days where the actual daily mean misses the Holt
    * forecast made the day BEFORE by more than 2σ of that type's
    * residual distribution — the model-based anomaly detector
    * zscore_anomaly (level-only, no trend) graduates into. One
    * summary row per type: n_days, residual σ, anomaly count, the
    * worst day and its residual.
    *
    * The previous day's forecast needs no lag/window: the Holt update
    * is invertible row-locally — `l_t = αx_t + (1-α)(l_{t-1}+b_{t-1})`
    * gives `forecast_prev = (l_t - αx_t)/(1-α)` from the row's OWN
    * state, so residuals are a pure projection over [[holtStates]]
    * (the seed row's residual is 0 by the fixpoint property). σ is a
    * per-type agg broadcast back; the worst-day pick uses the
    * (|residual| DESC, day) total order on the calendar-bounded
    * day grain.
    */
  def holtAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val alpha = HoltAlpha
    // two consumers (σ fold + flagging) — cut once so the state
    // subtree (and its seed/offset aggs) doesn't replay per branch
    val res = holtStates(spark, dir)
      .withColumn("resid",
        col("x") - (col("level") - lit(alpha) * col("x")) / lit(1 - alpha))
      .cut()
    val sig = res.groupBy(col("event_type").as("sig_type"))
      .agg(stddev_samp("resid").as("sigma"))
    val flagged = res.join(broadcast(sig),
        col("event_type") === col("sig_type"))
      // threshold compare on the r4 grid in BOTH engines (r6 ADVICE):
      // resid and sigma are independently summed floats here and in
      // DuckDB, so a residual within summation-order noise of the
      // 2σ boundary would otherwise flip n_anomalies cross-engine
      .withColumn("is_anom",
        when(r4(abs(col("resid"))) > r4(lit(2.0) * col("sigma")), 1L)
          .otherwise(0L))
    flagged
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(abs(col("resid")).desc, col("day"))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        r4(max("sigma")).as("sigma"),
        sum("is_anom").as("n_anomalies"),
        max_by(col("day"), col("rn") === 1).as("worst_day"),
        r4(max_by(col("resid"), col("rn") === 1)).as("worst_residual"))
      .orderBy("event_type")
  }
}
