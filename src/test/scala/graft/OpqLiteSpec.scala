package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.OpqLite
import graft.sources.Tables

/** OPQ-lite variance-balancing permutation (OpqLite): big win when
  * per-dim variance is skewed and subspace-correlated, no effect on
  * the isotropic fixture — both measured at the same code budget.
  */
class OpqLiteSpec extends SparkTestBase {

  private val dim = 64

  /** Corpus whose variance is concentrated in the FIRST subspaces:
    * dim d scaled by 8 for d < 16, by 0.1 otherwise — the
    * misallocation case (two hot subspaces, six near-constant).
    */
  private lazy val skewed: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (1L to 300L).map { id =>
      (id, Seq.tabulate(dim)(d =>
        rnd.nextGaussian() * (if (d < 16) 8.0 else 0.1)))
    }
    rows.toDF("vec_id", "emb")
  }

  private def isotropic: DataFrame = Tables.embeddings(spark, sf)
    .filter(col("vec_id") =!= 0)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("permutation is a bijection dealing variance ranks round-robin") {
    val vs = Seq.tabulate(dim)(d => if (d < 16) 64.0 else 0.01)
    val perm = OpqLite.balancedPermutation(vs)
    assert(perm.sorted == (0 until dim))
    // every subspace gets exactly 2 of the 16 high-variance dims
    perm.grouped(8).foreach { sub =>
      assert(sub.count(_ < 16) == 2, s"unbalanced subspace: $sub")
    }
  }

  test("skewed corpus: balancing the subspace energy cuts MSE >= 1.5x") {
    val (plain, balanced) = OpqLite.msePair(skewed)
    info(f"skewed: plain MSE $plain%.4f, balanced MSE $balanced%.4f (ratio ${plain / balanced}%.2fx)")
    assert(balanced < plain / 1.5,
      s"variance balancing should dominate on skewed dims: $balanced vs $plain")
  }

  test("isotropic corpus: permutation is a no-op in expectation (declared queries skip it)") {
    val (plain, balanced) = OpqLite.msePair(isotropic)
    info(f"isotropic: plain MSE $plain%.4f, balanced MSE $balanced%.4f (ratio ${plain / balanced}%.2fx)")
    assert(balanced > plain * 0.85 && balanced < plain * 1.15,
      s"isotropic dims are exchangeable — expected ~equal MSE: $balanced vs $plain")
  }
}
