package graft.operators

import org.apache.spark.sql.DataFrame

/** The lineage-cut plane, made FAULT-TOLERANT on demand (r5 verdict
  * #2 follow-through).
  *
  * Every iterative loop (connected components, pagerank, k-means
  * replay) and every multiply-scanned frame (edge lists, shingle
  * sets, prefix-sum snapshots) cuts lineage so Catalyst doesn't
  * re-execute or unroll the upstream plan. `localCheckpoint()` is the
  * cheap way — but it stores blocks on EXECUTORS and truncates the
  * lineage, so losing one executor makes the data irrecoverable and
  * fails the query (Spark documents exactly this). Fine on local[*]
  * (one process, nothing to lose); NOT fine on a 1000-executor fleet
  * where executor churn is routine.
  *
  * [[Checkpoints.cut]] is the single switch: when the session sets
  * `spark.graft.checkpointDir` (production: an HDFS/S3 path; tests:
  * a shared local dir), frames cut through Spark's RELIABLE
  * `checkpoint()` — written to the fault-tolerant store, recomputable
  * -free under executor loss, proven by ChaosSpec's kill-an-executor
  * run. Unset (the default), it stays `localCheckpoint()` — zero
  * behavior or perf change for single-process sessions. Semantics
  * are otherwise identical (both cut lineage eagerly and return a
  * frame backed by the materialized blocks).
  */
object Checkpoints {

  /** True when the current session requested reliable checkpoints. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.checkpointDir").isDefined

  implicit class CutSyntax(private val df: DataFrame) extends AnyVal {

    /** Cut lineage: reliable `checkpoint()` when
      * `spark.graft.checkpointDir` is set (survives executor loss),
      * `localCheckpoint()` otherwise (executor-resident, cheap).
      */
    def cut(): DataFrame = {
      val sess = df.sparkSession
      sess.conf.getOption("spark.graft.checkpointDir") match {
        case Some(dir) =>
          if (sess.sparkContext.getCheckpointDir.isEmpty)
            sess.sparkContext.setCheckpointDir(dir)
          df.checkpoint()
        case None => df.localCheckpoint()
      }
    }
  }
}
