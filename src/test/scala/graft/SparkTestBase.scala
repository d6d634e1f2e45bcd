package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole `sbt test` JVM (Test/fork :=
  * true gives us a dedicated forked JVM; starting a session per suite
  * would dominate test wall-clock).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      // RocksDB is the production state store at 100 TB state sizes
      // (default HDFS-backed store keeps state on the executor heap);
      // making it the TEST default means every streaming suite
      // exercises the store the cluster would actually run.
      // StateStoreSpec holds the provider proof + eviction bounds.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // graft-owned session: opt in to the sketch-plane perf confs the
    // way Bench/Verify do (Tables.configure no longer sets them on
    // arbitrary host sessions)
    graft.sources.Tables.configureSketchPerf(s)
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark
  /** t1/unit scale factor — tiny, fast, still covers every code path. */
  val sf: String = "/root/testdata/sf0.001"
}
