package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dual-layout portability, end to end: the SAME queries run
  * unchanged against a corpus whose events table is a STANDARD µs
  * TIMESTAMP parquet (the layout any normal writer produces) instead
  * of the fixture's INT64 TIMESTAMP(NANOS), and return identical
  * results. The loader's layout branch is unit-pinned elsewhere; this
  * proves the whole query surface composes with it.
  */
class PortabilitySpec extends SparkTestBase {

  /** sf0.001 with events rewritten as a plain TimestampType table;
    * all other tables hard-linked in place.
    */
  private lazy val stdDir: String = {
    val dir = Files.createTempDirectory("graft_std_layout").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      Files.createSymbolicLink(
        Paths.get(s"$dir/$t.parquet"), Paths.get(s"$sf/$t.parquet"))
    }
    // events: normalized ts (TimestampType) written the normal way
    Tables.events(spark, sf)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events_std")
    val part = new java.io.File(s"$dir/events_std").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$dir/events.parquet"))
    dir
  }

  test("standard-layout events table is read as TimestampType (no nanos branch)") {
    val r = Tables.raw(spark, stdDir, "events")
    assert(r.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("every events-backed query returns identical results on both layouts") {
    val eventQueries = Seq("sli_filter_project", "sli_minute_downsample",
      "sli_weighted_avg", "slo_day_report", "slo_breach_count",
      "slo_compliance_pct", "sli_latest_per_user", "sli_rolling_7d",
      "sli_sessionize", "slo_hourly_tumble", "error_budget_burn",
      "distinct_hll", "json_extract_agg", "props_map_agg",
      "percentile_value", "window_lag_delta", "moving_avg_rows",
      "date_funcs", "grouping_sets_mix")
    eventQueries.foreach { q =>
      val fn = SparkEntry.queries(q)
      val a = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, stdDir).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$q differs between ts layouts")
      assert(a.nonEmpty, s"$q empty")
    }
  }

  test("eventsInRange prunes with a directly-pushable ts predicate on the standard layout") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val df = Tables.eventsInRange(spark, stdDir, "2024-01-08", "2024-01-10")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("GreaterThanOrEqual(ts,"),
      s"standard-layout range not pushed: $scanLine")
    assert(df.count() ==
      Tables.eventsInRange(spark, sf, "2024-01-08", "2024-01-10").count())
  }
}
