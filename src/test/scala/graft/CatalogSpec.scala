package graft

import org.apache.spark.sql.functions._

import graft.operators.{RelationalQueries, SliQueries}
import graft.sources.GraftCatalog

/** The SQL facade (GraftCatalog + GraftExtensions): the declared
  * surface is reachable from plain `spark.sql` strings and produces
  * exactly the DSL results.
  */
class CatalogSpec extends SparkTestBase {

  test("SQL over registered views == DSL: star-schema rollup") {
    GraftCatalog.registerTables(spark, sf)
    val sql = spark.sql(
      """SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)) + 2e-5, 2) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val dsl = RelationalQueries.revByRegion(spark, sf).collect()
    assert(sql.length == dsl.length && sql.length > 0)
    sql.zip(dsl).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("SQL over the events view sees normalized timestamps (day report parity)") {
    GraftCatalog.registerTables(spark, sf)
    val sql = spark.sql(
      """SELECT to_date(date_trunc('day', ts)) AS day, event_type,
        |       count(*) AS n, round(avg(value) + 1e-7, 4) AS avg_value,
        |       round(min(value) + 2e-5, 2) AS min_value, round(max(value) + 2e-5, 2) AS max_value,
        |       round(sum(value) + 2e-5, 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    val dsl = SliQueries.sloDayReport(spark, sf).collect()
    assert(sql.length == dsl.length && sql.length > 0)
    sql.zip(dsl).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("graft extension functions compose with views in one SQL statement") {
    GraftCatalog.registerTables(spark, sf)
    val topPair = spark.sql(
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       dot_product(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                   CAST(b.embedding AS ARRAY<DOUBLE>)) AS dot
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 30 AND b.vec_id < 30
        |ORDER BY dot DESC, a_id, b_id LIMIT 1""".stripMargin).head()
    assert(!topPair.isNullAt(2))
    // prefixed registration coexists with the plain one
    GraftCatalog.registerTables(spark, sf, prefix = "g_")
    assert(spark.sql("SELECT count(*) FROM g_events").head().getLong(0) ==
      spark.sql("SELECT count(*) FROM events").head().getLong(0))
  }

  // r10: Tables serves parquet schemas from a (path, mtime, bytes)-keyed
  // cache so probe paths stop paying a footer-inference JOB per read —
  // the cache must be invisible: a regenerated file with a DIFFERENT
  // schema must be re-inferred, never served stale.
  test("schema cache re-infers after an in-place regeneration") {
    val dir = java.nio.file.Files.createTempDirectory("graft_schema_cache").toString
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "s").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val first = graft.sources.Tables.raw(spark, dir, "t")
    assert(first.schema.fieldNames.toSeq == Seq("id", "s"))
    Thread.sleep(1100) // distinct mtime granularity on coarse filesystems
    Seq((1L, "x", 2.0)).toDF("id", "s", "extra").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val second = graft.sources.Tables.raw(spark, dir, "t")
    assert(second.schema.fieldNames.toSeq == Seq("id", "s", "extra"),
      s"stale cached schema served: ${second.schema.fieldNames.toSeq}")
  }

  // r10: registerTables skips only EXACT repeats — re-pointing the same
  // prefix at a different dir must rebuild the views, not skip.
  test("registerTables re-registers when the same prefix moves dirs") {
    GraftCatalog.registerTables(spark, sf, prefix = "mv_")
    val n1 = spark.sql("SELECT count(*) FROM mv_events").head().getLong(0)
    val other = "/root/testdata/sf0.01"
    GraftCatalog.registerTables(spark, other, prefix = "mv_")
    val n2 = spark.sql("SELECT count(*) FROM mv_events").head().getLong(0)
    assert(n1 != n2, "views did not follow the dir switch")
    // and switching BACK also re-registers (the r10 set-vs-map bug shape)
    GraftCatalog.registerTables(spark, sf, prefix = "mv_")
    assert(spark.sql("SELECT count(*) FROM mv_events").head().getLong(0) == n1)
  }
}
