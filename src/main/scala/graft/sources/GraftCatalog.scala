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
    * are session-scoped metadata — re-registration is cheap and safe.
    */
  def registerTables(spark: SparkSession, dir: String, prefix: String = ""): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView(s"${prefix}events")
      case name => Tables.raw(spark, dir, name).createOrReplaceTempView(s"$prefix$name")
    }
}
