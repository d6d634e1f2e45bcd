package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, PqIndex, ResidualPq}
import graft.sources.Tables

/** Residual PQ (ResidualPq): on a CLUSTERED corpus, encoding the
  * residual from the coarse centroid cuts reconstruction error by a
  * large factor at the same code budget; on the isotropic fixture the
  * gain is marginal — both measured, justifying why the declared
  * ivfpq_topk keeps plain codes on this fixture and when a deployment
  * should switch.
  */
class ResidualPqSpec extends SparkTestBase {

  private val dim = 64

  /** 8 well-separated clusters (the IvfKmeansSpec construction). */
  private lazy val clustered: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val cores = Seq.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 3))
    val rows = for {
      (core, c) <- cores.zipWithIndex
      i <- 0 until 40
    } yield (c.toLong * 40 + i + 1, s"c$c",
      core.map(_ + 0.3 * rnd.nextGaussian()).toSeq)
    rows.toDF("vec_id", "label", "emb")
  }

  private def isotropic: DataFrame = Tables.embeddings(spark, sf)
    .filter(col("vec_id") =!= 0)
    .select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))

  /** (plain MSE, residual MSE) at the same M×K budget. */
  private def msePair(corpus: DataFrame): (Double, Double) = {
    val seeds = corpus.orderBy("vec_id").limit(8)
      .select(col("vec_id"), col("emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val pivots = IvfIndex.kmeansPivots(corpus, seeds, iters = 3)
    val assigned = IvfIndex.assign(corpus, pivots)
    val res = ResidualPq.residuals(assigned, pivots)
    val plainCb = PqIndex.trainCodebooks(corpus)
    val resCb = PqIndex.trainCodebooks(res)
    (ResidualPq.reconstructionMse(corpus, plainCb),
      ResidualPq.reconstructionMse(res, resCb))
  }

  test("clustered corpus: residual coding cuts reconstruction MSE by >= 2x") {
    val (plain, resid) = msePair(clustered)
    info(f"clustered: plain MSE $plain%.4f, residual MSE $resid%.4f (ratio ${plain / resid}%.1fx)")
    assert(resid < plain / 2.0,
      s"residual coding should dominate on clustered data: $resid vs $plain")
  }

  test("isotropic corpus: the gain is marginal (why ivfpq_topk keeps plain codes here)") {
    val (plain, resid) = msePair(isotropic)
    info(f"isotropic: plain MSE $plain%.4f, residual MSE $resid%.4f (ratio ${plain / resid}%.2fx)")
    // coarse centroids explain little isotropic variance: residual
    // coding must NOT be dramatically better here (< 2x), or the
    // fixture isn't isotropic and the declared-query tradeoff flips
    assert(resid > plain / 2.0, s"unexpected large gain on isotropic data: $resid vs $plain")
    assert(resid < plain * 1.2, s"residual coding should never be much worse: $resid vs $plain")
  }
}
