package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnOps
import graft.sources.Tables

/** Native DotProduct expression vs the portable HOF reference:
  * bit-equality, null handling, codegen participation, and the
  * speedup claim.
  */
class NativeDotSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("native dot == HOF dot, bit-for-bit, on all embedding self-products") {
    val rows = emb.select(
      col("vec_id"),
      AnnOps.dot(col("emb"), col("emb")).as("native"),
      AnnOps.dotHof(col("emb"), col("emb")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // exact: identical summation order must give identical bits
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}")
    }
  }

  test("native dot on cross pairs == HOF (different arrays both sides)") {
    val q = emb.filter(col("vec_id") === 0).select(col("emb").as("qv"))
    val rows = emb.limit(100).crossJoin(broadcast(q))
      .select(
        AnnOps.dot(col("emb"), col("qv")).as("native"),
        AnnOps.dotHof(col("emb"), col("qv")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native sq_l2_dist == HOF fold, bit-for-bit (the kmeans grid contract)") {
    // ClusterOps.sqDist rounds this value to a 1e-6 grid before the
    // argmin compare — bit-identity to the portable fold is what
    // keeps the r7 codegen swap hash-invariant. Exercise both a
    // column-vs-column and a column-vs-literal (centroid) shape.
    def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (s, x) => s + x)
    val q = emb.filter(col("vec_id") === 1).select(col("emb").as("qv"))
    val rows = emb.limit(200).crossJoin(broadcast(q))
      .select(
        graft.functions.VectorFunctions.sqL2Native(col("emb"), col("qv")).as("native"),
        hofSq(col("emb"), col("qv")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("sq_l2_dist runs inside WholeStageCodegen") {
    val plan = emb.select(
      graft.functions.VectorFunctions.sqL2Native(col("emb"), col("emb")).as("d"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("sq_l2_dist")).getOrElse("")
    assert(line.contains("*("), s"sq_l2_dist not in a codegen stage: $line")
  }

  test("null array propagates null") {
    val df = spark.sql(
      "SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1.0d, 2.0d) AS b")
    val r = df.select(AnnOps.dot(col("a"), col("b")).as("d")).collect().head
    assert(r.isNullAt(0))
  }

  test("dot_product runs inside WholeStageCodegen") {
    val plan = emb.select(AnnOps.dot(col("emb"), col("emb")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the short plan
    // form — the Project carrying dot_product must be starred.
    val dotLine = plan.linesIterator.find(_.contains("dot_product")).getOrElse("")
    assert(dotLine.contains("*("), s"dot_product not in a codegen stage: $dotLine")
  }

  test("native dot is measurably faster than the interpreted HOF form") {
    // 500 vecs x 500 vecs = 250k 64-dim dots per side; one timed pass
    // each, same plan shape. Not a microbenchmark — just guards
    // against the native path silently regressing to interpreted.
    val a = emb.select(col("vec_id").as("a_id"), col("emb").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("emb").as("b_emb"))
    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cross = a.crossJoin(b)
    val tNative = timeIt(cross.select(sum(AnnOps.dot(col("a_emb"), col("b_emb")))).collect().length)
    // NativeDotRewrite would rewrite the HOF form to the native
    // expression (ExtensionsSpec proves it does) — turn it off so
    // this measures the genuinely interpreted path.
    spark.conf.set(graft.plans.NativeDotRewrite.ConfKey, "false")
    val tHof =
      try timeIt(cross.select(sum(AnnOps.dotHof(col("a_emb"), col("b_emb")))).collect().length)
      finally spark.conf.unset(graft.plans.NativeDotRewrite.ConfKey)
    info(f"native $tNative%.2f s vs hof $tHof%.2f s (x${tHof / tNative}%.1f)")
    assert(tNative < tHof, s"native $tNative not faster than hof $tHof")
  }
}
