package graft

import org.apache.spark.sql.functions._

import graft.plans.NanosRangePushdown
import graft.sources.Tables

/** NanosRangePushdown: the naive derived-ts filter must regain raw
  * parquet pushdown, stay result-identical, and be conf-gated.
  */
class NanosPushdownSpec extends SparkTestBase {

  private def naiveRange(from: String, to: String) =
    Tables.events(spark, sf)
      .filter(col("ts") >= to_timestamp(lit(from)) &&
        col("ts") < to_timestamp(lit(to)))

  test("naive derived-ts filter gets raw-nanos PushedFilters") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val df = naiveRange("2024-01-08", "2024-01-10")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    val pushed = scanLine.replaceAll(".*PushedFilters: \\[([^\\]]*)\\].*", "$1")
    assert(pushed.contains("GreaterThanOrEqual(ts,") && pushed.contains("LessThan(ts,"),
      s"expected raw ts range in PushedFilters: $scanLine")
  }

  test("rewritten plan is result-identical to the hand-tuned eventsInRange") {
    val naive = naiveRange("2024-01-08", "2024-01-10")
      .orderBy("event_id").collect().toSeq
    val tuned = Tables.eventsInRange(spark, sf, "2024-01-08", "2024-01-10")
      .orderBy("event_id").collect().toSeq
    assert(naive.nonEmpty && naive == tuned)
  }

  test("single-sided and flipped comparisons also push") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val oneSided = Tables.events(spark, sf)
      .filter(to_timestamp(lit("2024-01-10")) > col("ts"))
    oneSided.collect()
    val plan = oneSided.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("LessThan(ts,"),
      s"flipped comparison not pushed: $scanLine")
    val n = oneSided.count()
    val expect = Tables.events(spark, sf)
      .filter(col("ts") < to_timestamp(lit("2024-01-10"))).count()
    assert(n == expect && n > 0)
  }

  test("conf gate: disabling the rule removes the raw-range pushdown " +
    "(nanos layout) / native pushdown survives (TIMESTAMP layouts)") {
    val nanosLayout = Tables.raw(spark, sf, "events").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    spark.conf.set(NanosRangePushdown.ConfKey, "false")
    try {
      val df = naiveRange("2024-01-08", "2024-01-10")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val scanLine = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
      val pushed = scanLine.replaceAll(".*PushedFilters: \\[([^\\]]*)\\].*", "$1")
      if (nanosLayout)
        // only the graft rule can recover pushdown over timestamp_micros
        assert(!pushed.contains("GreaterThanOrEqual(ts,"),
          s"rule fired despite ${NanosRangePushdown.ConfKey}=false: $scanLine")
      else
        // stored-TIMESTAMP/NTZ layouts: Spark's own cast unwrapping
        // pushes the bounds natively — the graft rule is dormant and
        // the scan must stay pushed with it disabled
        assert(pushed.contains("GreaterThanOrEqual(ts,"),
          s"native ts pushdown missing on stored-timestamp layout: $scanLine")
    } finally spark.conf.unset(NanosRangePushdown.ConfKey)
  }

  test("idempotent under the fixed-point batch (no duplicated conjuncts)") {
    val df = naiveRange("2024-01-08", "2024-01-10")
    val optimized = df.queryExecution.optimizedPlan.toString
    val bounds = "GreaterThanOrEqual\\(ts#\\d+L?, 17".r.findAllIn(optimized).size
    assert(bounds <= 1, s"duplicated raw bound in optimized plan:\n$optimized")
  }
}
