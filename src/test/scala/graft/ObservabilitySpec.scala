package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.operators.Observability
import graft.sources.Tables
import graft.streaming.StreamingQueries

/** Observation metrics (Observability): values match direct
  * computation, ride the observed query's own action (no extra job),
  * and surface per-micro-batch in streaming progress.
  */
class ObservabilitySpec extends SparkTestBase {

  test("batch: observed ingest metrics == direct computation, same single action") {
    val obs = Observation("docs_quality")
    val docs = Observability.observedDocs(Tables.documents(spark, sf), obs)
    // the downstream "pipeline" — any action materializes the metrics
    val kept = docs.filter(length(col("text")) >= 30).count()
    val m = obs.get
    val direct = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum(when(col("text").isNull ||
          length(trim(col("text"))) === lit(0), 1L).otherwise(0L)),
        sum(when(length(col("text")) < 30, 1L).otherwise(0L)),
        sum(length(col("text"))))
      .collect().head
    assert(m("n_docs") == direct.getLong(0))
    assert(m("n_empty") == direct.getLong(1))
    assert(m("n_short") == direct.getLong(2))
    assert(m("total_chars") == direct.getLong(3))
    // the observed counters saw ALL rows even though the pipeline
    // filtered some — metrics are upstream of the filter
    assert(kept <= m("n_docs").asInstanceOf[Long])
  }

  test("streaming: per-batch observed metrics appear in query progress") {
    val q = Observability.observedEvents(
        StreamingQueries.eventsStream(spark, sf))
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("obs_stream")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("ingest")))
    assert(metrics.nonEmpty, "no observedMetrics in any progress")
    val total = metrics.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count(),
      s"observed $total events != table count")
    val breaches = metrics.map(_.getAs[Long]("n_breaches")).sum
    val direct = Tables.events(spark, sf)
      .filter(col("value") < 50 || col("value") > 150).count()
    assert(breaches == direct)
  }
}
