package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe` / `CollectMetrics`:
  * ingest-quality counters computed DURING a query's own pass —
  * accumulator-style, no second scan, no extra job, no plan change
  * beyond a metrics node (the reference's updater logged per-run
  * ingest stats the same way `[pk: sli updater run logs]`).
  *
  * At 100 TB a separate "data quality scan" doubles the read bill;
  * observation metrics ride the pass the pipeline already makes.
  * Restriction (Spark's CollectMetrics contract): aggregates must be
  * accumulator-mergeable — count/sum/min/max and approx sketches,
  * no DISTINCT, no windows.
  */
object Observability {

  /** Attach document ingest-quality metrics to any docs-frame pass:
    * total rows, empty/short texts, total chars. Read the values from
    * the supplied [[Observation]] after the FIRST action on the
    * returned frame.
    */
  def observedDocs(docs: DataFrame, obs: Observation): DataFrame =
    docs.observe(obs,
      count(lit(1)).as("n_docs"),
      sum(when(col("text").isNull || length(trim(col("text"))) === lit(0), 1L)
        .otherwise(0L)).as("n_empty"),
      sum(when(length(col("text")) < 30, 1L).otherwise(0L)).as("n_short"),
      sum(length(col("text"))).as("total_chars"))

  /** Streaming form (named metrics — `Observation` is batch-only):
    * per-micro-batch event counters surfaced in every
    * `StreamingQueryProgress.observedMetrics["ingest"]`, the hook a
    * monitoring agent tails.
    */
  def observedEvents(events: DataFrame): DataFrame =
    events.observe("ingest",
      count(lit(1)).as("n_events"),
      sum(when(col("value") < 50 || col("value") > 150, 1L).otherwise(0L))
        .as("n_breaches"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"))
}
