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
    * the rebuild. The skip-key folds in each table's RECURSIVE
    * mtime+bytes stamp (the same [[Tables.stamp]] the schema cache
    * keys on — r11, closing the shallow-stamp gap: a rewritten
    * part-file inside a directory table now changes the stamp even
    * when the directory entry itself does not), so a regenerated
    * fixture re-registers instead of serving stale views.
    *
    * r11 hardening (ADVICE): the cache entry is written only AFTER
    * every view registered successfully — a throw mid-registration
    * (e.g. a missing table file) leaves the key unset, so the next
    * call retries instead of silently skipping; and the map is a
    * WeakHashMap keyed on the SESSION OBJECT instead of
    * `identityHashCode` strings (reference identity — no cross-session
    * collision can skip a fresh session's registration, and a dropped
    * session's entries are collectable instead of leaking). Two racing
    * first callers may both register; `createOrReplaceTempView` is
    * idempotent, so that is only duplicate work, never missing views.
    */
  private val registered =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]

  def registerTables(spark: SparkSession, dir: String, prefix: String = ""): Unit = {
    val stamp = tableNames.map { n =>
      val f = new java.io.File(
        s"${if (dir.endsWith("/")) dir.dropRight(1) else dir}/$n.parquet")
      val (m, len) = Tables.stamp(f)
      s"$m:$len"
    }.mkString(",")
    // keyed by (session, prefix) with the CURRENT (dir, stamp) as the
    // value: switching the same prefix to a different dir (or a
    // regenerated fixture) re-registers; only an exact repeat skips.
    val perSession = registered.synchronized {
      var m = registered.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, String]
        registered.put(spark, m)
      }
      m
    }
    val want = s"$dir|$stamp"
    if (perSession.get(prefix) != want) {
      tableNames.foreach {
        case "events" => Tables.events(spark, dir).createOrReplaceTempView(s"${prefix}events")
        case name => Tables.raw(spark, dir, name).createOrReplaceTempView(s"$prefix$name")
      }
      perSession.put(prefix, want) // put-after-success: a throw above leaves no entry
    }
  }
}
