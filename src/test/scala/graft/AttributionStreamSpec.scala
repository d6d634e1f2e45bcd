package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.AttributionStream

/** transformWithState last-touch attribution: the streaming processor
  * and the declared `purchase_attribution` batch query agree on the
  * full fixture — the per-purchase records aggregate to exactly the
  * batch (attributed, n) rollup, under RocksDB state with the
  * event-time cleanup timer active.
  */
class AttributionStreamSpec extends SparkTestBase {

  test("streaming last-touch records aggregate to the batch attribution rollup") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = AttributionStream.attributions(
        input.toDF().toDF("user_id", "ts", "event_id", "event_type"))
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      val evs = Tables.events(spark, sf)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .orderBy("ts", "event_id").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      // three chunks: state must survive batch boundaries
      evs.grouped(evs.length / 3 + 1).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("attr_stream")
        .groupBy("attributed").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = graft.operators.SliQueries.purchaseAttribution(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"stream $got != batch $want")
      assert(got.values.sum > 0)
    } finally {
      spark.streams.active.foreach(_.stop())
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
