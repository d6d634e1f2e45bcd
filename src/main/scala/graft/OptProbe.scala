package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the contract): run named queries with a
  * scheduler listener and print, per query, the wall time of each of
  * 3 passes plus job/stage/task counts and executor task/GC time —
  * the numbers that say whether a query is FLOOR-bound (many tiny
  * jobs paying scheduling latency) or COMPUTE-bound (task time ≈
  * wall × parallelism). `sbt "runMain graft.OptProbe q1,q2 [sfDir]"`.
  * Mirrors Bench's session shape and hygiene (unpersist between
  * passes, untimed warm pass).
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
      .foreach(builder.config("spark.sql.files.maxPartitionBytes", _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configureSketchPerf(spark)
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val runMs = new AtomicLong
    val gcMs = new AtomicLong
    // SPARK_GRAFT_STAGES=1: per-stage executor-run-time attribution —
    // stage-name -> summed run ms, printed per query
    val stageDetail = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    val byStage = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (stageDetail) {
          val key = e.stageInfo.name.take(120)
          byStage.computeIfAbsent(key, _ => new AtomicLong)
            .addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) { runMs.addAndGet(m.executorRunTime); gcMs.addAndGet(m.jvmGCTime) }
      }
    })
    // same untimed store/index DDL as Bench: the probed queries must
    // measure the probe reads, not a cold store build
    Seq[() => Unit](
      () => graft.operators.IvfIndex.ensure(spark, dir, npivots = 8),
      () => graft.operators.SketchRollup.ensure(spark, dir),
      () => graft.operators.ReportMaintenance.ensure(spark, dir),
      () => graft.operators.QuantileRollup.ensure(spark, dir),
      () => graft.operators.PqIndex.ensure(spark, dir),
      () => graft.operators.IvfPq.ensure(spark, dir, npivots = 8),
      () => graft.operators.EdgeStore.ensure(spark, dir),
      () => graft.operators.SketchStore.ensure(spark, dir)
    ).foreach(f => try f() catch { case _: Throwable => () })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val walls = (1 to 3).map { _ =>
        Thread.sleep(50) // let listener events drain before snapshotting
        val (j0, s0, t0, r0, g0) =
          (jobs.get, stages.get, tasks.get, runMs.get, gcMs.get)
        val w0 = System.nanoTime()
        fn(spark, dir).count()
        val w = (System.nanoTime() - w0) / 1e9
        Thread.sleep(100)
        println(f"[optprobe] $name%-28s wall=$w%6.2f jobs=${jobs.get - j0}%3d " +
          f"stages=${stages.get - s0}%3d tasks=${tasks.get - t0}%5d " +
          f"run_s=${(runMs.get - r0) / 1e3}%7.1f gc_s=${(gcMs.get - g0) / 1e3}%5.1f")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        w
      }
      println(f"[optprobe] $name%-28s median=${walls.sorted.apply(1)}%6.2f")
      if (stageDetail) {
        import scala.jdk.CollectionConverters._
        byStage.asScala.toSeq.sortBy(-_._2.get).take(12).foreach {
          case (k, v) => println(f"[optprobe-stage] ${v.get}%8d ms  $k")
        }
        byStage.clear()
      }
    }
    spark.stop()
  }
}
