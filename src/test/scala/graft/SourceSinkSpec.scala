package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{EventSink, Tables}

/** Source/sink surface: date-partitioned parquet layout (round-trip +
  * partition pruning proof) and source-format agnosticism (CSV).
  */
class SourceSinkSpec extends SparkTestBase {

  private lazy val partDir = {
    val d = Files.createTempDirectory("graft_events_part").toString
    EventSink.writeDatePartitioned(Tables.events(spark, sf), d)
    d
  }

  test("date-partitioned write round-trips all rows and values") {
    val back = EventSink.readDatePartitioned(spark, partDir)
    val orig = Tables.events(spark, sf)
    assert(back.count() == orig.count())
    // value-level check on a stable aggregate
    val a = back.agg(sum("value"), countDistinct("event_id")).collect().head
    val b = orig.agg(sum("value"), countDistinct("event_id")).collect().head
    assert(math.abs(a.getDouble(0) - b.getDouble(0)) < 1e-6)
    assert(a.getLong(1) == b.getLong(1))
  }

  test("ts-range read prunes partitions (PartitionFilters in the scan)") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val ranged = EventSink.readRange(spark, partDir, "2024-01-08", "2024-01-10")
    val plan = ranged.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("event_date"), s"no partition filter: $scan")
    assert(!scan.replaceAll(".*PartitionFilters: \\[([^\\]]*)\\].*", "$1").trim.isEmpty,
      s"PartitionFilters empty: $scan")
    // and the result matches the flat-layout filter exactly
    val expect = Tables.eventsInRange(spark, sf, "2024-01-08", "2024-01-10").count()
    assert(ranged.count() == expect)
  }

  test("one output file per date (no small-files explosion)") {
    val dates = new java.io.File(partDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(dates.nonEmpty)
    dates.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: ${parts.length} files")
    }
  }

  test("typed Dataset[Event] surface agrees with the DataFrame surface") {
    val typed = Tables.eventsTyped(spark, sf)
    val n = typed.filter(_.event_type == "error").count()
    val m = Tables.events(spark, sf).filter(col("event_type") === "error").count()
    assert(n == m && n > 0)
    // typed map: per-event ms timestamps survive the encoder round-trip
    val maxTs = typed.map(_.ts.getTime)(org.apache.spark.sql.Encoders.scalaLong)
      .reduce((a, b) => math.max(a, b))
    val maxDf = Tables.events(spark, sf)
      .agg(max(unix_millis(col("ts")))).collect().head.getLong(0)
    assert(maxTs == maxDf)
  }

  test("CSV source: same query logic over a CSV copy of the dim tables") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Tables.nation(spark, sf).write.option("header", "true").csv(s"$dir/nation")
    val schema = Tables.nation(spark, sf).schema // exact parquet schema, whatever the key widths
    val fromCsv = spark.read.schema(schema).option("header", "true").csv(s"$dir/nation")
    val a = fromCsv.orderBy("n_nationkey").collect()
      .map(r => (r.get(0).toString, r.getString(1)))
    val b = Tables.nation(spark, sf).orderBy("n_nationkey")
      .collect().map(r => (r.get(0).toString, r.getString(1)))
    assert(a.sameElements(b))
  }

  test("ORC source: exact row parity with the parquet original") {
    val dir = Files.createTempDirectory("graft_orc").toString
    Tables.part(spark, sf).write.orc(s"$dir/part")
    val fromOrc = spark.read.orc(s"$dir/part")
    val a = fromOrc.orderBy("p_partkey").collect().toSeq
    val b = Tables.part(spark, sf).orderBy("p_partkey").collect().toSeq
    assert(a == b)
  }

  test("JSON-lines source: same aggregate over a JSON copy of customer") {
    val dir = Files.createTempDirectory("graft_json").toString
    val cust = Tables.customer(spark, sf)
    cust.write.json(s"$dir/customer")
    // schema pinned explicitly — schema inference at 100 TB means a
    // full extra pass over the data; never rely on it
    val fromJson = spark.read.schema(cust.schema).json(s"$dir/customer")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 4).as("avg_bal"))
        .orderBy("c_mktsegment").collect().toSeq
    assert(agg(fromJson) == agg(cust))
  }
}
