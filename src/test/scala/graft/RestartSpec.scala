package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpointed restart semantics — the scheduled-incremental-job
  * pattern (`Trigger.AvailableNow` + checkpoint): each run processes
  * exactly the files that arrived since the last run, a restart after
  * new data resumes from the commit log (no loss), and a restart with
  * NO new data writes nothing (no dups). This is how the reference's
  * cron-style updater cadence maps onto Spark: same code, run N
  * times, exactly-once output across runs.
  */
class RestartSpec extends SparkTestBase {

  test("AvailableNow + checkpoint: two runs process two waves exactly once, idle run adds nothing") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    def wave(ids: Range): Unit =
      ids.map(i => (i.toLong, s"e$i", i * 1.5)).toDF("event_id", "event_type", "value")
        .write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("event_id LONG, event_type STRING, value DOUBLE")
        .parquet(src)
        .withColumn("doubled", col("value") * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }

    wave(1 to 100)
    runOnce()
    assert(spark.read.parquet(out).count() == 100)

    wave(101 to 250)
    runOnce() // restart from the commit log: only the new files
    val afterTwo = spark.read.parquet(out)
    assert(afterTwo.count() == 250)
    assert(afterTwo.select(countDistinct("event_id")).head().getLong(0) == 250,
      "restart re-processed wave 1 — duplicate rows")

    runOnce() // idle restart: nothing new, nothing written
    assert(spark.read.parquet(out).count() == 250,
      "idle restart wrote rows")
    // the transform survived the whole lifecycle
    assert(spark.read.parquet(out)
      .filter(col("doubled") =!= col("value") * 2).count() == 0)
  }
}
