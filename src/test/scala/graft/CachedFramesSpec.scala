package graft

import org.apache.spark.sql.Row

import graft.sources.SharedFrames

/** r5 verdict #6 — session-scoped shared frames: with
  * `spark.graft.sharedFrames=true`, the ≥2-support co-purchase edge
  * list behind `triangle_parts` / `degree_dist` /
  * `degree_assortativity` is built ONCE per session and served to
  * all three (a production session's shape; the bench harness keeps
  * sharing off so per-query numbers stay honest). Pins: results
  * hash-identical to the unshared runs, exactly one build for three
  * queries, and the saving is real (shared total strictly under
  * unshared total on a warmed session).
  */
class CachedFramesSpec extends SparkTestBase {

  private val consumers =
    Seq("triangle_parts", "degree_dist", "degree_assortativity",
      // r6: the k-core peel is the 4th supportEdges consumer
      "kcore_parts")

  private def canon(rows: Array[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq).toSeq

  test("graph queries: hash-identical from the shared frame, one build") {
    // unshared baseline (default config)
    assert(!SharedFrames.enabled(spark), "sharing must be off by default")
    val baseline = consumers.map { q =>
      q -> canon(SparkEntry.queries(q)(spark, sf).collect())
    }.toMap
    spark.conf.set("spark.graft.sharedFrames", "true")
    try {
      SharedFrames.clear(spark)
      val b0 = SharedFrames.builds.get()
      val t0 = System.nanoTime()
      consumers.foreach { q =>
        assert(canon(SparkEntry.queries(q)(spark, sf).collect()) == baseline(q),
          s"$q differs when served from the shared frame")
      }
      val sharedSec = (System.nanoTime() - t0) / 1e9
      assert(SharedFrames.builds.get() - b0 == 1L,
        s"expected exactly 1 supportEdges build for ${consumers.size} queries, got ${SharedFrames.builds.get() - b0}")
      // informational timing only (at sf0.001 both runs are fixed-
      // overhead dominated; the structural builds==1 assertion above
      // is the reuse proof — the saving is the corpus-scale edge
      // build × 2, ~4 s at sf0.1, quantified in SURVEY §2.6)
      spark.conf.set("spark.graft.sharedFrames", "false")
      val t1 = System.nanoTime()
      consumers.foreach(q => SparkEntry.queries(q)(spark, sf).collect())
      val unsharedSec = (System.nanoTime() - t1) / 1e9
      info(f"shared $sharedSec%.2f s vs unshared $unsharedSec%.2f s for ${consumers.size} queries")
    } finally {
      spark.conf.set("spark.graft.sharedFrames", "false")
      SharedFrames.clear(spark)
    }
  }
}
