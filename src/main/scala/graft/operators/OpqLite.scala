package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-lite: variance-balanced dimension PERMUTATION before product
  * quantization. Full OPQ learns an arbitrary rotation by iterated
  * SVD; the standard lightweight variant (natural-order vs
  * structured-order in the OPQ literature) reorders dimensions so
  * each subspace receives a balanced mix of high- and low-variance
  * dims — a permutation IS an orthogonal transform, captures most of
  * the benefit when the skew is per-dimension scale (the common case
  * for un-normalized feature pipelines), and costs one aggregate at
  * build time plus a literal-index `transform` per row.
  *
  * When PQ subspaces have wildly unequal variance, the code budget is
  * misallocated: K centroids quantize a high-variance subspace
  * coarsely while wasting precision on near-constant ones.
  * Dealing dims round-robin by variance rank equalizes subspace
  * energy. OpqLiteSpec measures the effect: large MSE cut on a
  * per-dim-scaled corpus, no effect on the isotropic fixture (whose
  * dims are already exchangeable — why the declared queries skip the
  * permutation).
  */
object OpqLite {

  /** Per-dimension variance of the `emb` column (one relational
    * aggregate; only dim doubles reach the driver — build-time DDL,
    * like every index build here).
    */
  def dimVariances(emb: DataFrame): Seq[Double] =
    emb.select(posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy("pos").agg(var_pop("v").as("s2"))
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq

  /** Variance-balancing permutation: rank dims by variance
    * descending, deal them round-robin into M groups, concatenate the
    * groups. `perm(i)` = source dim for target slot i.
    */
  def balancedPermutation(variances: Seq[Double], m: Int = PqIndex.M): Seq[Int] = {
    val ranked = variances.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2)
    val groups = Array.fill(m)(Seq.newBuilder[Int])
    ranked.zipWithIndex.foreach { case (dim, r) => groups(r % m) += dim }
    groups.toSeq.flatMap(_.result())
  }

  /** Apply a permutation to an array column (pure projection). */
  def permute(emb: Column, perm: Seq[Int]): Column =
    transform(typedlit(perm), i => element_at(emb, i + 1))

  /** Reconstruction MSE of PQ at the same budget, with and without
    * the balancing permutation (the spec's measurement harness;
    * permutation preserves L2 norms, so MSEs are directly
    * comparable).
    */
  def msePair(corpus: DataFrame): (Double, Double) = {
    val plainCb = PqIndex.trainCodebooks(corpus)
    val perm = balancedPermutation(dimVariances(corpus))
    val permuted = corpus.select(col("vec_id"), permute(col("emb"), perm).as("emb"))
    val permCb = PqIndex.trainCodebooks(permuted)
    (ResidualPq.reconstructionMse(corpus, plainCb),
      ResidualPq.reconstructionMse(permuted, permCb))
  }
}
