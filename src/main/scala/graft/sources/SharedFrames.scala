package graft.sources

import scala.collection.concurrent.TrieMap

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Opt-in per-session cache for frames several queries derive
  * identically (r5 verdict #6): the ≥2-support co-purchase edge list
  * is rebuilt by `triangle_parts`, `degree_dist` and
  * `degree_assortativity` (~2 s each at sf0.1) because the bench
  * harness runs queries independently — but a production SESSION
  * computes it once and serves all three. With
  * `spark.graft.sharedFrames=true`, [[getOrBuild]] materializes the
  * frame (lineage-cut, so the cached plan is a block scan) on first
  * use and returns the same frame to every later caller in the same
  * session; unset (the default), behavior and plans are EXACTLY as
  * before — per-query builds, no cross-query state, nothing for the
  * correctness/bench harnesses to misattribute.
  *
  * Keyed by (session, logical name): a new session — or the same
  * session pointed at different data (the dir is part of the name) —
  * never sees another's frame. [[clear]] drops a session's entries
  * (tests; long-lived sessions after an upstream table refresh).
  * CachedFramesSpec pins that the three consumers' results are
  * hash-identical served from the shared frame, and that three query
  * runs trigger exactly ONE build.
  */
object SharedFrames {

  private val cache = TrieMap.empty[(SparkSession, String), DataFrame]

  /** Build count, observable by tests (proves reuse actually occurs). */
  val builds = new AtomicLong(0L)

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.sharedFrames").contains("true")

  /** The shared frame for `key`, building (and counting the build)
    * at most once per session when sharing is enabled; a plain
    * every-call build otherwise. `build` must return a materialized
    * (lineage-cut) frame — the cache hands the same object to
    * concurrent queries.
    */
  def getOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    if (!enabled(spark)) build
    else cache.getOrElseUpdate((spark, key), { builds.incrementAndGet(); build })

  /** Drop every cached frame of this session. */
  def clear(spark: SparkSession): Unit =
    cache.keys.filter(_._1 eq spark).foreach(cache.remove)

  /** Drop ONE cached frame for this session — maintenance operations
    * (e.g. an EdgeStore republish) call this so a long-lived session
    * never serves a frame whose resolved file listing predates the
    * refresh (the r8 ADVICE staleness bug).
    */
  def remove(spark: SparkSession, key: String): Unit =
    cache.remove((spark, key))
}
