package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{SessionProcessorTws, StatefulSessions}

/** transformWithState sessionizer (SessionProcessorTws): the new
  * arbitrary-state API, the old flatMapGroupsWithState API, and the
  * batch engine agree record-for-record on the same stream.
  */
class TwsSessionSpec extends SparkTestBase {

  test("transformWithState closed sessions == old API == batch session records") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val q = SessionProcessorTws.closedSessions(input.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("tws_sessions")
      .outputMode("append").start()
    try {
      val evs = Tables.events(spark, sf).select(col("user_id"), col("ts"))
        .orderBy("ts").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
      evs.grouped(evs.length / 3 + 1).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      // watermark sentinel fires every pending event-time timer
      input.addData(Seq((-1L,
        new java.sql.Timestamp(evs.last._2.getTime + 86400000L))))
      q.processAllAvailable()

      val got = spark.table("tws_sessions").filter(col("user_id") >= 0)
        .select("user_id", "start_ms", "end_ms", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      val batch = graft.operators.SliQueries.sessionized(Tables.events(spark, sf))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(unix_millis(col("ts"))).as("s"),
          max(unix_millis(col("ts"))).as("e"), count(lit(1)).as("n"))
        .select("user_id", "s", "e", "n")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
      assert(got.size == batch.size,
        s"session records: tws ${got.size} != batch ${batch.size}")
      assert(got == batch)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
