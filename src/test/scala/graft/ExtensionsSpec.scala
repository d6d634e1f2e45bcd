package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DotProduct
import graft.plans.NativeDotRewrite

/** GraftExtensions wiring: the SQL-registered dot_product function and
  * the HOF-dot → native-DotProduct optimizer rewrite.
  */
case class Vecs(a: Seq[Double], b: Seq[Double])

class ExtensionsSpec extends SparkTestBase {

  private def vecsDf: DataFrame = {
    import spark.implicits._
    Seq(
      Vecs(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      Vecs(Seq(0.5, -1.5, 2.25), Seq(-2.0, 0.25, 8.0)),
      Vecs(Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)),
    ).toDF()
  }

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v)"

  /** Parquet-backed frame (two copies of the embedding column as
    * array<double>) — plan-shape tests need a real relation under the
    * projection; a LocalRelation gets constant-folded by
    * ConvertToLocalRelation before the shape can be observed.
    */
  private def embPairs: DataFrame =
    graft.sources.Tables.embeddings(spark, sf)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS a",
        "CAST(embedding AS ARRAY<DOUBLE>) AS b")

  test("dot_product is SQL-callable via the injected function") {
    val d = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(d == 32.0)
  }

  test("optimizer rewrites the HOF dot pattern to native DotProduct") {
    val df = embPairs.select(expr(hofDot).as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val hasNative = optimized.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
    assert(hasNative, s"expected DotProduct in optimized plan:\n$optimized")
    // value check on the folded-literal path too (LocalRelation input)
    assert(vecsDf.select(expr(hofDot).as("d"))
      .collect().map(_.getDouble(0)).toSeq == Seq(32.0, 16.625, 0.0))
  }

  test("rewrite preserves values: HOF form == explicit dot_product call") {
    val df = vecsDf.selectExpr(s"$hofDot AS via_hof", "dot_product(a, b) AS via_native")
    df.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"mismatch: $r")
    }
  }

  test("rewrite is conf-gated: disabling it keeps the interpreted HOF plan") {
    spark.conf.set(NativeDotRewrite.ConfKey, "false")
    try {
      val optimized = embPairs.select(expr(hofDot).as("d"))
        .queryExecution.optimizedPlan
      val hasNative = optimized.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
      assert(!hasNative, s"rule fired despite ${NativeDotRewrite.ConfKey}=false:\n$optimized")
    } finally spark.conf.unset(NativeDotRewrite.ConfKey)
  }

  test("rewrite matches HOF semantics on ragged arrays (NULL, not a partial sum)") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)), // ragged -> HOF gives NULL
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),      // well-formed -> 11.0
    ).toDF("a", "b")
    val rows = df.selectExpr(s"$hofDot AS d").collect()
    assert(rows(0).isNullAt(0), "ragged input must stay NULL under the rewrite")
    assert(rows(1).getDouble(0) == 11.0)
  }

  test("rewrite does NOT fire on a non-dot aggregate (plain sum of one array)") {
    val optimized = embPairs
      .select(expr("aggregate(a, 0.0D, (s, v) -> s + v)").as("s"))
      .queryExecution.optimizedPlan
    val hasNative = optimized.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))
    assert(!hasNative)
  }
}
