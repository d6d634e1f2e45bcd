package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Streaming IVF index maintenance (IvfIndex.streamingAppend):
  * new vectors flow into the persisted assignment as they arrive,
  * probes see each appended batch exactly once, and a re-delivered
  * batch (the foreachBatch at-least-once case) overwrites its own
  * `ingest_batch` partitions instead of duplicating rows.
  */
class IvfStreamSpec extends SparkTestBase {

  private val dim = 64

  private def mkVecs(ids: Range, seedShift: Int): Seq[(Long, String, Seq[Double])] = {
    val rnd = new scala.util.Random(11 + seedShift)
    ids.map(i => (i.toLong, s"v$i", Seq.fill(dim)(rnd.nextGaussian()))).toSeq
  }

  private def toDf(rows: Seq[(Long, String, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "emb")
  }

  /** Fresh index dir seeded with pivots + an ingest_batch=0 build. */
  private def freshIndex(initial: Seq[(Long, String, Seq[Double])]): String = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString
    val pivots = initial.take(4).map(r => (r._1, r._3))
    pivots.toDF("p_id", "p_emb").write.mode("overwrite").parquet(s"$base/pivots")
    IvfIndex.assign(toDf(initial), pivots)
      .withColumn("ingest_batch", lit(0L))
      .write.mode("overwrite").partitionBy("bucket", "ingest_batch")
      .parquet(s"$base/assign")
    base
  }

  test("replayed batch overwrites its own partitions — no duplicate index rows") {
    val initial = mkVecs(1 to 20, 0)
    val base = freshIndex(initial)
    val batch = toDf(mkVecs(21 to 30, 1))
    IvfIndex.appendVectors(spark, base, batch, batchId = 5L)
    val once = spark.read.parquet(s"$base/assign")
      .select(col("vec_id"), col("bucket").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // re-deliver the SAME batch id (foreachBatch restart semantics)
    IvfIndex.appendVectors(spark, base, batch, batchId = 5L)
    val twice = spark.read.parquet(s"$base/assign")
      .select(col("vec_id"), col("bucket").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(once.length == 30)
    assert(twice == once, "replayed batch duplicated index rows")
  }

  test("ad-hoc appends without an explicit batch id ACCUMULATE (auto-derived max+1)") {
    // Regression (round-4 advisor): a defaulted fixed batchId made the
    // dynamic partition overwrite silently REPLACE the previous ad-hoc
    // append. The no-batchId overload must derive a fresh id per call.
    val initial = mkVecs(1 to 20, 0)
    val base = freshIndex(initial)
    IvfIndex.appendVectors(spark, base, toDf(mkVecs(21 to 30, 1)))
    IvfIndex.appendVectors(spark, base, toDf(mkVecs(31 to 40, 2)))
    val assign = spark.read.parquet(s"$base/assign")
    assert(assign.count() == 40, "second default append lost the first's rows")
    assert(assign.select("vec_id").distinct().count() == 40)
    val batches = assign.select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(batches == Set(0L, 1L, 2L), s"expected auto-derived ids 0,1,2: $batches")
  }

  test("streamingAppend: the index grows per batch and stays probe-able") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val initial = mkVecs(1 to 20, 0)
    val base = freshIndex(initial)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivf_ckpt").toString
    val in = MemoryStream[(Long, String, Seq[Double])]
    val q = IvfIndex.streamingAppend(spark, base,
        in.toDF().toDF("vec_id", "label", "emb"))
      .option("checkpointLocation", ckpt)
      .start()
    val wave1 = mkVecs(100 to 109, 2)
    val wave2 = mkVecs(200 to 214, 3)
    try {
      in.addData(wave1: _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/assign").count() == 30)
      in.addData(wave2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val assign = spark.read.parquet(s"$base/assign")
    assert(assign.count() == 45)
    assert(assign.select("vec_id").distinct().count() == 45,
      "a vector was indexed twice")
    // batches are disjoint partitions: build=0, then per-stream-batch
    val batches = assign.select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(batches.contains(0L) && batches.size == 3, s"ingest batches: $batches")
    // the index stays probe-able and finds a streamed vector exactly:
    // query = one of wave2's vectors, top hit must be itself at cos 1
    val probe = IvfIndex.probeTopk(spark, base,
      toDf(wave2.take(1)), nprobe = 4, k = 1).collect()
    assert(probe.length == 1 && probe.head.getLong(0) == wave2.head._1,
      s"probe missed the streamed vector: ${probe.toSeq}")
    assert(math.abs(probe.head.getDouble(2) - 1.0) < 1e-6)
  }
}
