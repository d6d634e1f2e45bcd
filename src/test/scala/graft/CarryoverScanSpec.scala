package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ClampScan.clampScan
import graft.operators.SliQueries

/** The clamp-monoid window scan vs the recursive-CTE carryover: the
  * swap must be row-identical on real data, and the monoid algebra
  * must saturate BOTH clamps correctly on a constructed series.
  */
class CarryoverScanSpec extends SparkTestBase {

  test("budget_carryover_scan == budget_carryover row-for-row") {
    val scan = SliQueries.budgetCarryoverScan(spark, sf).collect().map(_.toSeq)
    val rec = SliQueries.budgetCarryover(spark, sf).collect().map(_.toSeq)
    assert(scan.length == rec.length && scan.sameElements(rec))
  }

  test("clamp scan saturates both bounds exactly (constructed series)") {
    import spark.implicits._
    // deltas drive the running value through the ceiling (2.0), then
    // through the floor (0.0), then back inside — sequential reference
    // computed in plain Scala
    val deltas = Seq(0.7, 0.9, 0.9, -1.5, -1.2, -0.4, 0.3, 0.6)
    val expected = deltas.scanLeft(1.0) { (y, d) =>
      math.min(2.0, math.max(0.0, y + d))
    }.tail
    val df = deltas.zipWithIndex.map { case (d, i) => (i, d) }.toDF("i", "d")
    val got = df.withColumn("y",
        clampScan(col("d"), 0.0, 2.0, 1.0)
          .over(Window.orderBy("i")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("i").collect().map(_.getDouble(2))
    // exact: every step after a binding clamp replays the same float
    // additions; here every prefix binds within 3 steps
    assert(got.toSeq == expected,
      s"scan ${got.toSeq} != sequential $expected")
  }
}
