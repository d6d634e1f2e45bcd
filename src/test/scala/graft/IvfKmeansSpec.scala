package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, IvfIndex}

/** k-means pivot refinement + append-only refresh for the persisted
  * IVF index, on a CONSTRUCTED clustered corpus (the fixture
  * embeddings are isotropic — worst case by design — so cluster
  * recovery must be shown on data that has clusters).
  */
class IvfKmeansSpec extends SparkTestBase {

  private val dim = 64
  private val nClusters = 8
  private val perCluster = 40

  /** 8 well-separated cluster cores + gaussian members (seeded). */
  private lazy val clustered: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cores = Seq.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 3))
    val rows = for {
      (core, c) <- cores.zipWithIndex
      i <- 0 until perCluster
    } yield (c.toLong * perCluster + i + 1, s"c$c",
      core.map(_ + 0.3 * rnd.nextGaussian()).toSeq)
    rows.toDF("vec_id", "label", "emb")
  }

  private def pivotDF(p: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    p.toDF("p_id", "p_emb")
  }

  private def objective(pivots: Seq[(Long, Seq[Double])]): Double =
    IvfIndex.assign(clustered, pivots)
      .join(pivotDF(pivots), col("bucket") === col("p_id"))
      .select(avg(AnnOps.cosine(col("emb"), col("p_emb"))))
      .head().getDouble(0)

  private def initPivots: Seq[(Long, Seq[Double])] =
    clustered.orderBy("vec_id").limit(nClusters)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2).toSeq)).toSeq

  test("Lloyd iterations monotonically improve the assignment objective") {
    val objs = (0 to 3).map(t =>
      objective(IvfIndex.kmeansPivots(clustered, initPivots, t)))
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"objective regressed: $objs")
    }
    assert(objs.last > objs.head, s"refinement never improved: $objs")
  }

  test("refined pivots beat unrefined at nprobe=1 recall on clustered data") {
    // initPivots are the first 8 vectors — all from cluster 0, the
    // degenerate seed; k-means must spread them onto the 8 cores.
    def recallAtOneProbe(pivots: Seq[(Long, Seq[Double])]): Double = {
      val assigned = IvfIndex.assign(clustered, pivots)
      // for each vector: did its bucket capture its own cluster's
      // members? proxy: fraction of vectors sharing a bucket with the
      // MAJORITY of their label-mates
      val withSize = assigned.groupBy("label", "bucket").count()
      val top = withSize
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("label")
            .orderBy(col("count").desc, col("bucket"))))
        .filter(col("rn") === 1)
        .select(sum("count")).head().getLong(0)
      top.toDouble / (nClusters * perCluster)
    }
    val before = recallAtOneProbe(initPivots)
    val after = recallAtOneProbe(IvfIndex.kmeansPivots(clustered, initPivots, 5))
    assert(after > before,
      s"k-means did not improve bucket purity: $before -> $after")
    assert(after >= 0.9, s"refined bucket purity only $after")
  }

  test("appendVectors == full rebuild, bit-for-bit") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    val pivots = IvfIndex.kmeansPivots(clustered, initPivots, 2)
    pivotDF(pivots)
      .write.mode("overwrite").parquet(s"$base/pivots")
    val (oldVecs, newVecs) =
      (clustered.filter(col("vec_id") <= 200), clustered.filter(col("vec_id") > 200))
    IvfIndex.assign(oldVecs, pivots)
      .withColumn("ingest_batch", lit(0L))
      .write.mode("overwrite").partitionBy("bucket", "ingest_batch")
      .parquet(s"$base/assign")
    IvfIndex.appendVectors(spark, base, newVecs)
    // partition columns read back from directory names as int —
    // normalize both sides to long
    val appended = spark.read.parquet(s"$base/assign")
      .select(col("vec_id"), col("bucket").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rebuilt = IvfIndex.assign(clustered, pivots)
      .select(col("vec_id"), col("bucket").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(appended == rebuilt)
  }
}
