package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connector seams for the two env-blocked ingest planes — designed so
  * that reaching the real systems is a CONFIG swap, not a code change,
  * and so the swap itself is testable without the environment:
  *
  *   - JDBC catalog plane: the reference persists its entities and
  *     indicator values in PostgreSQL (`[pk]`: SQLAlchemy models). In
  *     this environment there is no network and no PostgreSQL driver,
  *     but the seam is `spark.read.jdbc` against ANY url/driver on the
  *     classpath — ConnectorSeamSpec proves it end-to-end against
  *     in-JVM embedded Derby (already on the Spark classpath for the
  *     Hive metastore), flowing into the same day-report aggregation
  *     the parquet plane feeds. Swapping Derby → PostgreSQL is the
  *     url + driver properties, nothing else.
  *
  *   - Kafka ingest plane: the reference's updater polls check results
  *     into the store; the Spark-native form is the Kafka source. The
  *     seam here is SHAPE-based: [[eventsFromKafkaShape]] consumes any
  *     frame with the Kafka source's fixed schema (key/value binary,
  *     topic/partition/offset/timestamp) — batch or streaming — and
  *     yields the normalized events frame every downstream operator
  *     takes. `spark.readStream.format("kafka")` produces exactly that
  *     shape, so attaching the real source is one line; the spec
  *     drives the same code path from a MemoryStream.
  */
object Connectors {

  /** Normalized events schema (post-`Tables.events` shape) that every
    * downstream operator consumes.
    */
  val EventColumns: Seq[String] =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  // ---------------------------------------------------------------
  // JDBC catalog plane
  // ---------------------------------------------------------------

  /** Read an events table from any JDBC catalog. `url` selects the
    * backend (PostgreSQL in the reference's deployment, embedded Derby
    * in the spec); `partitionColumn`/`numPartitions` turn the read
    * into parallel range-partitioned scans — REQUIRED at scale, a
    * single-connection JDBC read is a driver bottleneck by
    * construction.
    */
  def eventsJdbc(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      bounds: Option[(Long, Long)] = None): DataFrame = {
    Tables.configure(spark)
    val base = (partitionColumn, bounds) match {
      case (Some(col), Some((lo, hi))) =>
        spark.read.jdbc(url, table, col, lo, hi, numPartitions, props)
      case _ => spark.read.jdbc(url, table, props)
    }
    normalize(base)
  }

  /** Write an events frame to a JDBC catalog (the seam's reverse
    * direction — how a backfill would land in the reference's store).
    */
  def writeEventsJdbc(events: DataFrame, url: String, table: String,
      props: Properties = new Properties): Unit =
    events.select(EventColumns.map(col): _*)
      .write.mode("overwrite").jdbc(url, table, props)

  // ---------------------------------------------------------------
  // Kafka-shaped ingest plane
  // ---------------------------------------------------------------

  /** The Kafka source's fixed output schema (public contract of
    * `format("kafka")` since Spark 2.x) — the shape the seam accepts.
    */
  val KafkaSourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** JSON payload schema carried in the Kafka record value. */
  val EventPayloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType), // event time, µs since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize a Kafka-shaped frame (batch OR streaming — the
    * expression is mode-agnostic) into the events schema. Malformed
    * payloads surface as a NULL `event_id` (from_json PERMISSIVE) and
    * are dropped here — the at-the-edge policy for a lossy transport;
    * upstream offsets make the drop auditable.
    */
  def eventsFromKafkaShape(kafka: DataFrame): DataFrame =
    kafka
      .select(from_json(col("value").cast("string"), EventPayloadSchema).as("p"))
      .select(
        col("p.event_id").as("event_id"),
        timestamp_micros(col("p.ts_us")).as("ts"),
        col("p.user_id").as("user_id"),
        col("p.event_type").as("event_type"),
        col("p.value").as("value"),
        col("p.props").as("props"))
      .filter(col("event_id").isNotNull)

  /** Encode an events frame into the Kafka-shaped frame (test fixture
    * helper + the documented shape a producer would emit): value =
    * JSON payload, key = event_type (the partitioning key a real
    * deployment would choose so per-type consumers stay ordered).
    */
  def toKafkaShape(events: DataFrame, topic: String): DataFrame =
    events.select(
      col("event_type").cast("binary").as("key"),
      to_json(struct(
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props")))
        .cast("binary").as("value"),
      lit(topic).as("topic"),
      (crc32(col("event_type")) % 4).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))

  /** Column-order/type normalization for a JDBC-sourced events table
    * (JDBC preserves names; Derby/PostgreSQL may widen types).
    */
  private def normalize(df: DataFrame): DataFrame = {
    val cols = EventColumns.filter(df.columns.map(_.toLowerCase).contains)
    df.select(cols.map(col): _*)
      .withColumn("value", col("value").cast("double"))
  }
}
