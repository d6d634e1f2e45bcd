package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ReportMaintenance
import graft.sources.{Connectors, Tables}

/** The two env-blocked connector seams, tested WITHOUT the
  * environment (round-4 verdict #3):
  *
  *   - JDBC: events round-trip through in-JVM embedded Derby (on the
  *     Spark classpath) and feed `ReportMaintenance.dayStats` — the
  *     exact aggregation behind the oracle-backed `slo_day_report` /
  *     `slo_report_maintained` queries — unchanged. PostgreSQL (the
  *     reference's actual store) is the same call with a different
  *     url: the swap is config, and this spec is the proof the seam
  *     itself works.
  *
  *   - Kafka: the seam is the SOURCE SHAPE (key/value binary +
  *     topic/partition/offset), not the transport. The same
  *     `eventsFromKafkaShape` expression is proven on a batch frame
  *     (exact row-level round-trip vs the parquet plane) and on a
  *     MemoryStream (the same code path streaming), so attaching
  *     `format("kafka")` when the cluster has it is one line.
  */
class ConnectorSeamSpec extends SparkTestBase {

  private def events: DataFrame = Tables.events(spark, sf)

  /** dayStats rows as comparable tuples; sums carry a tolerance (the
    * JDBC read partitions differently, so double accumulation order
    * differs legitimately).
    */
  private def reportRows(ev: DataFrame): Seq[(String, String, Long, Double, Double, Double)] =
    ReportMaintenance.dayStats(ev)
      .orderBy("event_date", "event_type")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSeq

  private def assertReportsEqual(
      a: Seq[(String, String, Long, Double, Double, Double)],
      b: Seq[(String, String, Long, Double, Double, Double)]): Unit = {
    assert(a.size == b.size, s"row counts differ: ${a.size} != ${b.size}")
    a.zip(b).foreach { case (x, y) =>
      assert(x._1 == y._1 && x._2 == y._2 && x._3 == y._3,
        s"group/count mismatch: $x vs $y")
      // sum, min, max — min/max are exact, the sum is order-dependent
      assert(math.abs(x._4 - y._4) <= 1e-6 * math.max(1.0, math.abs(x._4)),
        s"sum mismatch: $x vs $y")
      assert(x._5 == y._5 && x._6 == y._6, s"min/max mismatch: $x vs $y")
    }
  }

  test("JDBC seam: events through embedded Derby feed the day report unchanged") {
    val url = "jdbc:derby:memory:graft_seam;create=true"
    Connectors.writeEventsJdbc(events, url, "events_catalog")
    val maxId = events.agg(max("event_id")).head().getLong(0)
    val viaJdbc = Connectors.eventsJdbc(spark, url, "events_catalog",
      partitionColumn = Some("event_id"), numPartitions = 4,
      bounds = Some((0L, maxId + 1)))
    // the scale requirement: a range-partitioned parallel read, not a
    // single-connection driver bottleneck
    assert(viaJdbc.rdd.getNumPartitions == 4,
      s"JDBC read not partitioned: ${viaJdbc.rdd.getNumPartitions}")
    assert(viaJdbc.count() == events.count())
    assertReportsEqual(reportRows(events), reportRows(viaJdbc))
  }

  test("Kafka-shaped seam (batch): shape contract + exact round-trip vs the parquet plane") {
    val shaped = Connectors.toKafkaShape(events, "graft.events")
    // the producer-side shape must BE the Kafka source's public schema
    shaped.schema.fields.zip(Connectors.KafkaSourceSchema.fields).foreach {
      case (got, want) =>
        assert(got.name == want.name && got.dataType == want.dataType,
          s"shape drift: $got vs $want")
    }
    val back = Connectors.eventsFromKafkaShape(shaped)
      .select(Connectors.EventColumns.map(col): _*)
    val orig = events.select(Connectors.EventColumns.map(col): _*)
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0,
      "kafka-shape round trip is not row-exact")
    // and into the oracle-backed aggregation unchanged
    assertReportsEqual(reportRows(orig), reportRows(back))
  }

  test("Kafka-shaped seam (streaming): the same expression runs on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sample = Connectors.toKafkaShape(events.limit(50), "graft.events")
      .collect()
      .map(r => (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1), r.getString(2),
        r.getInt(3), r.getLong(4), r.getTimestamp(5), r.getInt(6)))
    val in = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
    val q = Connectors.eventsFromKafkaShape(
        in.toDF().toDF(Connectors.KafkaSourceSchema.fieldNames: _*))
      .writeStream.format("memory").queryName("kafka_seam")
      .outputMode("append").start()
    try {
      in.addData(sample.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("kafka_seam")
    assert(got.count() == 50)
    val want = events.limit(50).select(Connectors.EventColumns.map(col): _*)
    assert(got.select(Connectors.EventColumns.map(col): _*).exceptAll(want).count() == 0,
      "streamed kafka-shape rows differ from the parquet plane")
  }

  test("the reference updater loop end-to-end over the Kafka seam: stream -> upsert -> maintained report") {
    // the full composition the reference runs as its updater: poll
    // (kafka-shaped stream) -> idempotent keyed upsert into the
    // date-partitioned sink -> refresh the persisted day report for
    // affected days. Delivered here in TWO waves with the second wave
    // REPLAYING half of the first (at-least-once transport) — the
    // final report must equal the clean batch aggregation anyway.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_updater").toString
    val all = Connectors.toKafkaShape(events, "graft.events").collect()
      .map(r => (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1), r.getString(2),
        r.getInt(3), r.getLong(4), r.getTimestamp(5), r.getInt(6)))
    val in = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
    val q = graft.operators.ReportMaintenance.maintainOnIngest(
      Connectors.eventsFromKafkaShape(
        in.toDF().toDF(Connectors.KafkaSourceSchema.fieldNames: _*)),
      s"$base/sink", s"$base/report", Seq("event_id"), s"$base/ckpt")
    try {
      val (w1, w2) = all.splitAt(all.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData((w1.takeRight(w1.length / 2) ++ w2).toSeq) // replay half of wave 1
      q.processAllAvailable()
    } finally q.stop()
    val maintained = graft.operators.ReportMaintenance
      .readTable(spark, s"$base/report")
      .orderBy("event_date", "event_type").collect()
      .map(r => (r.getDate(5).toString, r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    val direct = reportRows(events)
    assert(maintained.size == direct.size,
      s"report rows: ${maintained.size} != ${direct.size}")
    maintained.zip(direct).foreach { case (m, d) =>
      assert(m._1 == d._1 && m._2 == d._2 && m._3 == d._3,
        s"group/count mismatch: $m vs $d (replay double-counted?)")
      assert(math.abs(m._4 - d._4) <= 1e-6 * math.max(1.0, math.abs(d._4)), s"sum: $m vs $d")
      assert(m._5 == d._5 && m._6 == d._6, s"min/max: $m vs $d")
    }
  }

  test("malformed Kafka payloads drop at the edge instead of failing the stream") {
    import spark.implicits._
    val dirty = Seq(
      """{"event_id":1,"ts_us":1704067200000000,"user_id":7,"event_type":"error","value":1.5,"props":"{}"}""",
      """not json at all""",
      """{"event_id":null,"ts_us":1,"user_id":1,"event_type":"x","value":0.0,"props":""}""",
      """{"truncated":true""")
      .toDF("s")
      .select(lit(Array.emptyByteArray).as("key"), col("s").cast("binary").as("value"),
        lit("t").as("topic"), lit(0).as("partition"), lit(0L).as("offset"),
        current_timestamp().as("timestamp"), lit(0).as("timestampType"))
    val parsed = Connectors.eventsFromKafkaShape(dirty)
    assert(parsed.count() == 1, "exactly the well-formed payload survives")
    assert(parsed.head().getLong(0) == 1L)
  }
}
