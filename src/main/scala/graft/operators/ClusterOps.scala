package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints._

import graft.functions.Det.r4
import graft.sources.Tables

/** Clustering over the embedding corpus — the corpus-organization
  * primitive between "pairwise similarity" (AnnOps) and "semantic
  * dedup" (GraphOps): k-means partitions the embedding space into
  * k buckets, which is what IVF coarse quantization, semantic mixing
  * (cluster-balanced sampling a la DoReMi-style domain discovery),
  * and cluster-then-filter curation pipelines all consume.
  *
  * The IVF plane (IvfIndex) already runs k-means internally for its
  * pivots; this surfaces Lloyd's algorithm as a *declared, oracle-
  * checkable query* — fixed seed, fixed iteration count, every
  * intermediate on a deterministic rounding grid, so DuckDB can
  * replay the identical iterations (unrolled CTEs) and hash-match.
  */
object ClusterOps {

  /** Squared L2 distance between an array<double> column and a
    * centroid literal, folded left-to-right in doubles and rounded to
    * the 1e-6 grid. The rounding is what makes the ARGMIN below
    * deterministic across engines: summation-order noise (~1e-13)
    * cannot flip a comparison that happens on the grid, and exact
    * grid ties break by cluster id.
    *
    * r7: the fold runs through the native [[graft.functions.SqL2Dist]]
    * expression — bit-identical summation order to the previous
    * portable HOF `aggregate(zip_with(…))` (so the grid values and
    * the DuckDB oracle hash are unchanged by construction) but
    * codegen'd: the per-iteration corpus scan is now a tight
    * primitive loop inside WholeStageCodegen instead of an
    * interpreted per-element lambda (the ~18× HOF penalty the repo
    * measured in SURVEY §2.5, removed from the last hot loop that
    * still paid it).
    */
  private def sqDist(v: Column, c: Array[Double]): Column =
    round(graft.functions.VectorFunctions.sqL2Native(v, typedlit(c.toSeq)), 6)

  /** `kmeans_assign` — deterministic Lloyd k-means (k=8, 3 fixed
    * iterations) over the embedding corpus, reporting per-cluster
    * size and within-cluster squared-distance stats (full oracle:
    * DuckDB replays the same 3 unrolled iterations and hash-matches).
    *
    * Determinism contract (what makes an ITERATIVE numeric algorithm
    * oracle-checkable at all): init = the k lowest vec_ids; every
    * centroid coordinate and every distance is rounded to the 1e-6
    * grid before use, so partial-agg summation order can never leak
    * into an assignment; argmin ties break by cluster id
    * (lexicographic struct `least`); iteration count is FIXED, not
    * convergence-tested — reproducible regardless of data or cluster
    * size. An empty cluster simply drops out of the next round's
    * centroid set, same in both engines.
    *
    * Scale shape (MLlib's own k-means layout, restated on DataFrames):
    * the corpus NEVER shuffles — assignment is scan-side arithmetic
    * against k×d centroid literals (constant-size, Catalyst folds
    * them into the plan exactly like a broadcast without the
    * exchange), and the centroid update is a (cluster, dim)-grain
    * partial agg whose exchange carries k×d×partitions rows, not the
    * corpus. The driver holds only k×d rounded doubles per round
    * (the IVF-seed collect precedent — constant-size by
    * construction). Per-iteration cost is one corpus scan; the input
    * is localCheckpoint'd once so 3 iterations don't re-decode
    * parquet. The HOF distance fold is interpreted (not codegen'd) —
    * at production scale the same plan swaps in the codegen'd
    * DotProduct expansion ‖v‖²+‖c‖²−2·v·c (AnnOps precedent); kept
    * portable here because the grid-rounding contract is the point.
    */
  def kmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    val k = 8
    val iters = 3
    // one materialization; re-scanned once per iteration + final agg
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .cut()

    // init: the k lowest vec_ids, on the same 1e-6 grid as updates
    var centroids: Array[(Int, Array[Double])] =
      emb.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cid"),
          transform(col("v"), x => round(x, 6)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)

    // empty corpus ⇒ no centroids ⇒ nothing to assign (EmptyInputSpec
    // policy: empty result, never a zero-arg `least`)
    if (centroids.isEmpty) {
      return emb.select(col("vec_id").cast("int").as("cluster_id"),
        lit(0L).as("n_vecs"), lit(0.0).as("avg_sqdist"),
        lit(0.0).as("max_sqdist")).limit(0)
    }

    def assign(): DataFrame = {
      val best = least(centroids.map { case (cid, c) =>
        struct(sqDist(col("v"), c).as("d"), lit(cid).as("cid"))
      }: _*)
      emb.withColumn("best", best)
        .select(col("vec_id"), col("v"),
          col("best.cid").as("cid"), col("best.d").as("d"))
    }

    for (_ <- 1 until iters) {
      // (cluster, dim)-grain mean, rounded to the grid; k×d rows to
      // the driver (constant-size — the IVF seed-collect class)
      val upd = assign()
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(round(avg("x"), 6).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      centroids = upd.groupBy(_._1).map { case (cid, rows) =>
        (cid, rows.sortBy(_._2).map(_._3))
      }.toArray.sortBy(_._1)
    }

    assign()
      .groupBy("cid")
      .agg(
        count(lit(1)).as("n_vecs"),
        r4(avg("d")).as("avg_sqdist"),
        r4(max("d")).as("max_sqdist"))
      .select(col("cid").as("cluster_id"), col("n_vecs"),
        col("avg_sqdist"), col("max_sqdist"))
      .orderBy("cluster_id")
  }
}
