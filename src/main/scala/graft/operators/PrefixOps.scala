package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints._

/** Distributed prefix (cumulative) sums — the scale-safe replacement
  * for `sum(x).over(Window.orderBy(k))` when the ordered grain grows
  * with the corpus.
  *
  * An unpartitioned Window funnels EVERY row through one task: fine
  * when the grain is dimension-bounded (a calendar, a label set), a
  * guaranteed straggler when it is corpus-proportional (Spark even
  * warns "No Partition Defined for Window operation"). The classic
  * fix is the two-pass parallel prefix sum:
  *
  *   1. split the key range into P ordered slices;
  *   2. per-slice partial sums — a slice-COUNT-grain frame
  *      (≤ spark.sql.shuffle.partitions rows, constant at any data
  *      size) whose exclusive running sum gives each slice its
  *      starting offset;
  *   3. broadcast the offsets back and finish with a cumsum LOCAL to
  *      each slice.
  *
  * The slice id is a DETERMINISTIC COLUMN — `floor((k - lo) * P /
  * span)` from the frame's min/max — NOT `spark_partition_id()` over
  * `repartitionByRange`: the range partitioner's sampled bounds are
  * not guaranteed identical across the two executions of the frame
  * (its sampling seed derives from fresh RDD ids), and a key landing
  * in slice 3 for the partial pass but slice 4 for the final pass
  * would silently corrupt every downstream offset. A pure function
  * of the data cannot disagree with itself, whether or not AQE
  * reuses the upstream exchange.
  *
  * Every task now sorts/scans only its own slice; the only
  * single-task window runs over the bounded offsets frame. Same
  * output as the naive global window (vocab_growth's unchanged
  * oracle hash + PrefixSumSpec's law test).
  */
object PrefixOps {

  /** Adds `outCol` = running sum of `valueCol` in ascending `orderCol`
    * order. `orderCol` must be numeric and unique per row (ties would
    * make the running sum frame-order-dependent, as with any
    * rowsBetween running sum). Slices are equal-WIDTH in key space —
    * balanced for the dense grids this serves (bucket ids, epoch
    * minutes/days); a heavily clustered key would want
    * quantile-based bounds instead. Output partitioning/order is not
    * guaranteed — sort downstream if needed.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // Three passes read this frame (bounds, partials, final cumsum):
    // materialize it ONCE — without this the whole upstream plan
    // (vocab_growth's bigram first-appearance agg) re-executes per
    // pass. localCheckpoint also cuts lineage, the GraphOps pattern.
    val snap = df.cut()
    val bounds = snap.agg(min(col(orderCol)).cast("double").as("__lo"),
      max(col(orderCol)).cast("double").as("__hi"))
    val withPid = snap.crossJoin(broadcast(bounds))
      .withColumn("__pid", least(lit(p - 1), greatest(lit(0),
        floor((col(orderCol).cast("double") - col("__lo")) * p /
          (col("__hi") - col("__lo") + 1.0d)).cast("int"))))
      .drop("__lo", "__hi")
    val partials = withPid.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__psum"))
    // exclusive scan over ≤ p rows — the one legitimately-bounded
    // single-task window (slice-count grain, data-size constant)
    val offsets = partials.withColumn("__offset",
        coalesce(sum("__psum").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    withPid.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol,
        sum(col(valueCol)).over(Window.partitionBy("__pid").orderBy(orderCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Ranked-DESCENDING form for `(value DESC, id ASC)` total orders —
    * the shape of every ranked-curve query (pareto, RFM, Gini,
    * price-position): adds `outRank` (row_number) and `outCum`
    * (running sum of `valueCol`), both in descending-value order with
    * the id tie-break. Same two-pass scheme: slices descend with the
    * value (`pid = floor((hi − v)·P/span)` — big values land in slice
    * 0), TIED values land in the SAME slice (pid is a pure function
    * of the value), so the tie-break never crosses a slice boundary
    * and the cross-slice rank/cumsum is exact; per-slice (count, sum)
    * partials give each slice its rank and sum offsets through one
    * bounded exclusive scan.
    *
    * The running double differs from the naive single-task window
    * only by summation REASSOCIATION across slice boundaries
    * (relative ~1e-16·n) — far inside the r4 grid every consumer
    * rounds to, which is what lets `pareto_share_prefix` keep
    * `pareto_share`'s exact oracle.
    */
  def rankedPrefix(df: DataFrame, valueCol: String, idCol: String,
      outRank: String, outCum: String): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val snap = df.cut()
    val bounds = snap.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    val withPid = snap.crossJoin(broadcast(bounds))
      .withColumn("__pid", least(lit(p - 1), greatest(lit(0),
        floor((col("__hi") - col(valueCol).cast("double")) * p /
          (col("__hi") - col("__lo") + 1.0d)).cast("int"))))
      .drop("__lo", "__hi")
    val partials = withPid.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pc"), sum(col(valueCol)).as("__ps"))
    val offsets = partials
      .withColumn("__offc",
        coalesce(sum("__pc").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__offs",
        coalesce(sum("__ps").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .select("__pid", "__offc", "__offs")
    val w = Window.partitionBy("__pid")
      .orderBy(col(valueCol).desc, col(idCol))
    withPid.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outRank, row_number().over(w) + col("__offc"))
      .withColumn(outCum,
        sum(col(valueCol)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + col("__offs"))
      .drop("__pid", "__offc", "__offs")
  }

  /** Grouped form: `outCol` = running sum of `valueCol` in ascending
    * `orderCol` order WITHIN each `partCol` group — the scale-safe
    * replacement for `sum(x).over(Window.partitionBy(dim).orderBy(k))`
    * when `dim` is a bounded dimension (a handful of event types) but
    * the per-group grain grows with the corpus: that window sorts
    * ~corpus/|dim| rows in ONE task per group (the r5-verdict
    * window_lag_delta / ntile_quartiles finding — `partitionSpec
    * .nonEmpty` hides it from the unpartitioned-Window tripwire).
    *
    * Same two-pass scheme as [[prefixSum]] with every frame keyed by
    * the group: per-group key bounds (|groups| rows, broadcast),
    * deterministic slice id from those bounds, (group, slice)-grain
    * partials whose per-group exclusive scan — a window over
    * ≤ |groups|×P rows, data-size constant — yields slice offsets,
    * then a cumsum local to each (group, slice). `orderCol` must be
    * numeric and unique per row within its group.
    */
  def prefixSumBy(df: DataFrame, partCol: String, orderCol: String,
      valueCol: String, outCol: String): DataFrame = {
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
    val partials = withPid.groupBy(col(partCol), col("__pid"))
      .agg(sum(col(valueCol)).as("__psum"))
    // per-group exclusive scan over ≤ |groups| × p rows — bounded-
    // dimension key over a data-size-constant grain (pinned in
    // PlanAuditSpec's bounded-dimension window audit)
    val offsets = partials.withColumn("__offset",
        coalesce(sum("__psum").over(Window.partitionBy(partCol)
          .orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(partCol), col("__pid"), col("__offset"))
    withPid.join(broadcast(offsets), Seq(partCol, "__pid"))
      .withColumn(outCol,
        sum(col(valueCol)).over(
          Window.partitionBy(col(partCol), col("__pid")).orderBy(orderCol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Grouped running MAX: `outCol` = max of `valueCol` over all rows
    * at or before the current one (ascending `orderCol`) within each
    * `partCol` group — the prefix scan over the max monoid, same
    * two-pass slicing as [[prefixSumBy]] (max is associative AND
    * idempotent, so the cross-slice combine is a plain `greatest`;
    * the first slice has no predecessor → its offset is NULL and
    * `greatest` ignores it by null-skipping). The running-peak /
    * drawdown / high-watermark primitive at corpus-proportional
    * grains.
    */
  def prefixMaxBy(df: DataFrame, partCol: String, orderCol: String,
      valueCol: String, outCol: String): DataFrame = {
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
    val partials = withPid.groupBy(col(partCol), col("__pid"))
      .agg(max(col(valueCol)).as("__pmax"))
    // per-group EXCLUSIVE running max over ≤ |groups| × p rows —
    // bounded grain; NULL for slice 0 (no predecessor)
    val offsets = partials.withColumn("__offset",
        max("__pmax").over(Window.partitionBy(partCol)
          .orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(partCol), col("__pid"), col("__offset"))
    withPid.join(broadcast(offsets), Seq(partCol, "__pid"))
      .withColumn(outCol, greatest(
        max(col(valueCol)).over(
          Window.partitionBy(col(partCol), col("__pid")).orderBy(orderCol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        col("__offset")))
      .drop("__pid", "__offset")
  }
}
