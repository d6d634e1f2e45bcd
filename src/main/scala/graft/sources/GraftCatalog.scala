package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL-first entry point: register every fixture table as a temp view
  * so users drive the whole engine through `spark.sql(...)` — the
  * interface a reference user switching engines actually wants.
  * Combined with [[graft.plans.GraftExtensions]] (which makes
  * `dot_product`, `minhash_sketch`, `minhash_merge`, `simhash_agg`
  * SQL-callable and injects the optimizer rules), the full declared
  * surface is reachable from plain SQL strings; CatalogSpec proves
  * SQL == DSL plan-for-plan on representative queries.
  *
  * `events` registers through [[Tables.events]], so the raw-nanos
  * normalization (SURVEY §1.2) is baked into the view and SQL users
  * never see the INT64-NANOS quirk.
  */
object GraftCatalog {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Create one temp view per table (optionally prefixed). Temp views
    * are session-scoped metadata — re-registration is cheap and safe,
    * but not free (r10, guide §1): building 10 views costs 10 analyzed
    * plans per call, and the SQL-surface queries call this on every
    * invocation, so repeated registration was pure per-query floor.
    * A session that has already registered this (dir, prefix) skips
    * the rebuild. The skip-key folds in each table's mtime+bytes
    * stamp (via [[Tables.raw]]'s schema-cache key discipline), so a
    * regenerated fixture re-registers instead of serving stale views.
    */
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  def registerTables(spark: SparkSession, dir: String, prefix: String = ""): Unit = {
    val stamp = tableNames.map { n =>
      val f = new java.io.File(
        s"${if (dir.endsWith("/")) dir.dropRight(1) else dir}/$n.parquet")
      s"${f.lastModified()}:${f.length()}"
    }.mkString(",")
    // keyed by (session, prefix) with the CURRENT (dir, stamp) as the
    // value: switching the same prefix to a different dir (or a
    // regenerated fixture) re-registers; only an exact repeat skips.
    val key = s"${System.identityHashCode(spark)}|$prefix"
    val want = s"$dir|$stamp"
    if (registered.put(key, want) != want)
      tableNames.foreach {
        case "events" => Tables.events(spark, dir).createOrReplaceTempView(s"${prefix}events")
        case name => Tables.raw(spark, dir, name).createOrReplaceTempView(s"$prefix$name")
      }
  }
}
