package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamJoins

/** Stream-stream interval join (StreamJoins): the streaming run over
  * MemoryStreams produces exactly the batch twin's pairs, and the
  * shared expression means the oracle-backed `interval_join_views`
  * covers both modes.
  */
class StreamJoinSpec extends SparkTestBase {

  private def mkEvents(rows: Seq[(Long, Long, String, Long)]) = {
    // (event_id, user_id, event_type, minutes-offset)
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "mins")
      .withColumn("ts", timestamp_micros(lit(1704067200000000L) + col("mins") * 60000000L))
      .drop("mins")
  }

  private val fixture: Seq[(Long, Long, String, Long)] = Seq(
    // user 1: views at t+0, t+30, purchase at t+45 (both views match)
    (1L, 1L, "view", 0L), (2L, 1L, "view", 30L), (3L, 1L, "purchase", 45L),
    // user 1: second purchase at t+100 — only the t+45..t+100 window;
    // view at t+30 is 70 min before: OUT of the 1-hour window
    (4L, 1L, "purchase", 100L),
    // user 2: view 61 min before purchase — outside the window
    (5L, 2L, "view", 0L), (6L, 2L, "purchase", 61L),
    // user 3: view exactly at purchase ts (inclusive bound)
    (7L, 3L, "view", 10L), (8L, 3L, "purchase", 10L),
    // user 4: purchase with no views at all
    (9L, 4L, "purchase", 20L))

  test("streaming interval join emits exactly the batch twin's pairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val viewsIn = MemoryStream[(Long, Long, String, Long)]
    val purchasesIn = MemoryStream[(Long, Long, String, Long)]
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .toDF("event_id", "user_id", "event_type", "mins")
      .withColumn("ts", timestamp_micros(lit(1704067200000000L) + col("mins") * 60000000L))
      .drop("mins")
    val joined = StreamJoins.viewPurchasePairs(
      shape(viewsIn.toDF()), shape(purchasesIn.toDF()))
    val q = joined.writeStream.format("memory").queryName("sj_pairs")
      .outputMode("append").start()
    try {
      viewsIn.addData(fixture.filter(_._3 == "view"): _*)
      purchasesIn.addData(fixture.filter(_._3 == "purchase"): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sj_pairs")
      .select("user_id", "p_id", "p_ts", "v_ts").collect().toSet
    val ev = mkEvents(fixture)
    val batch = StreamJoins.viewPurchasePairs(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"))
      .select("user_id", "p_id", "p_ts", "v_ts").collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streaming pairs ${streamed.size} != batch pairs ${batch.size}")
  }

  test("interval semantics: inclusive bounds, 1-hour horizon, no-view purchases absent") {
    val ev = mkEvents(fixture)
    val pairs = StreamJoins.viewPurchasePairs(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"))
      .select(col("p_id"), col("v_ts")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // purchase 3: both user-1 views within 45 min
    assert(pairs(3L) == 2)
    // purchase 4: no view within its preceding hour
    assert(!pairs.contains(4L))
    // purchase 6: view 61 min earlier is out
    assert(!pairs.contains(6L))
    // purchase 8: simultaneous view counts (inclusive upper bound)
    assert(pairs(8L) == 1)
    // purchase 9: user with no views never appears
    assert(!pairs.contains(9L))
  }

  test("stream-static join: streaming events enrich against a static dim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dim = Seq(("purchase", 1.5), ("view", 1.0)).toDF("event_type", "weight")
    val in = MemoryStream[(Long, Long, String, Long)]
    val enriched = in.toDF()
      .toDF("event_id", "user_id", "event_type", "mins")
      .join(broadcast(dim), Seq("event_type"))
      .withColumn("weighted", col("user_id") * col("weight"))
    val q = enriched.writeStream.format("memory").queryName("sj_static")
      .outputMode("append").start()
    try {
      in.addData(fixture: _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sj_static")
    assert(out.count() == fixture.size)
    assert(out.filter(col("event_type") === "purchase")
      .filter(col("weighted") =!= col("user_id") * 1.5).count() == 0)
  }
}
