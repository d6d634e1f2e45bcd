package graft

import java.nio.file.Files

import graft.sources.Tables

/** Every declared query must run on EMPTY tables without throwing —
  * the head-on-empty / max-on-empty-null class of bug that only shows
  * up in production when a partition, tenant, or date range is empty.
  * All declared queries are declarative (no collect-and-index anywhere), so
  * this must hold by construction; the spec pins it.
  *
  * The empty fixture is written by Spark itself (limit 0 per table),
  * which also exercises the loader's standard-µs-timestamp branch for
  * `events.ts` (the testdata's raw-nanos layout is the other branch).
  */
class EmptyInputSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val d = Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      Tables.raw(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    // events: write through the normalized loader, so ts round-trips
    // as a standard µs TIMESTAMP column
    Tables.events(spark, sf).limit(0)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("events loader handles the standard µs-timestamp layout") {
    val schema = Tables.events(spark, emptyDir).schema
    assert(schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(Tables.eventsInRange(spark, emptyDir, "2024-01-08", "2024-01-15")
      .count() == 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"empty input: $name does not throw") {
      val n = fn(spark, emptyDir).count()
      assert(n >= 0)
    }
  }
}
