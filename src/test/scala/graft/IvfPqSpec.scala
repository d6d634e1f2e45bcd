package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, IvfPq, LlmQueries, PqIndex}
import graft.sources.Tables

/** IVF×PQ composed index (IvfPq): layout consistency with the two
  * source planes, compound byte-reduction (pruned partitions × narrow
  * codes scan), exact re-ranked output, recall floor, zero shuffle.
  */
class IvfPqSpec extends SparkTestBase {

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))

  private lazy val path: String = IvfPq.ensure(spark, sf, npivots = 8).get

  test("combined assignment: one row per corpus vector, codes == PQ plane, buckets == IVF plane") {
    val combined = spark.read.parquet(s"$path/assign")
    assert(combined.count() == vecs.filter(col("vec_id") =!= 0).count())
    // codes agree with the standalone PQ index
    val pqPath = PqIndex.ensure(spark, sf).get
    val pqCodes = spark.read.parquet(s"$pqPath/codes").select("vec_id", "codes")
    assert(combined.select("vec_id", "codes").exceptAll(pqCodes).count() == 0)
    // buckets agree with the standalone IVF index
    val ivfPath = graft.operators.IvfIndex.ensure(spark, sf, 8).get
    val ivfBuckets = spark.read.parquet(s"$ivfPath/assign").select("vec_id", "bucket")
    assert(combined.select("vec_id", "bucket").exceptAll(ivfBuckets).count() == 0)
  }

  test("ivfpq_topk: exact re-ranked cosines, ordered, recall floor vs exact top-10") {
    val got = IvfPq.ivfpqTopk(spark, sf).collect()
    assert(got.length == 10)
    val exact = LlmQueries.cosineTopk(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // overlapping hits carry the exact cosine (re-rank is exact)
    got.filter(r => exact.contains(r.getLong(0))).foreach { r =>
      assert(math.abs(r.getDouble(2) - exact(r.getLong(0))) < 1e-9)
    }
    val cs = got.map(_.getDouble(2))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    // recall is bounded above by the IVF bucket recall (nprobe 3/8 on
    // an isotropic corpus); the PQ shortlist inside the probed buckets
    // must not lose further ground vs the same floor AnnRecallSpec
    // pins for plain IVF
    val recall = got.map(_.getLong(0)).count(exact.contains) / 10.0
    info(f"ivfpq recall@10 = $recall%.2f (plain-IVF floor is 0.2)")
    assert(recall >= 0.2, s"recall $recall < 0.2")
  }

  test("probe plan: partition-pruned scan reads codes, NOT raw embeddings; zero shuffle") {
    val res = IvfPq.probeTopk(spark, path,
      vecs.filter(col("vec_id") === 0), vecs.filter(col("vec_id") =!= 0),
      nprobe = 3, shortlist = 40, k = 10)
    res.collect() // materialize so DPP executes and AQE finalizes
    val plan = res.queryExecution.executedPlan.toString
    val scan = plan.linesIterator
      .find(s => s.contains("FileScan") && s.contains("graft_ivfpq"))
      .getOrElse(fail("no FileScan of the combined assign table"))
    assert(scan.contains("dynamicpruning"),
      s"combined scan is not dynamically partition-pruned: $scan")
    // the shortlist scan's schema is the NARROW one: codes+norm, no emb
    assert(scan.contains("codes") && !scan.contains("emb:"),
      s"shortlist scan should read codes, not embeddings: $scan")
    assert(!plan.contains("Exchange hashpartitioning"),
      "ivfpq probe should be scans + broadcasts + TakeOrdered only")
  }
}
