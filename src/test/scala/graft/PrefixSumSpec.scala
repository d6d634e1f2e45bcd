package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixOps

/** Law tests for the distributed two-pass prefix sum: for any frame,
  * `prefixSum` must equal the naive single-task
  * `sum(v).over(Window.orderBy(k))` — the exact form it exists to
  * replace at corpus-proportional grains.
  */
class PrefixSumSpec extends SparkTestBase {

  private def naive(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.withColumn("cs", sum("v").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  private def dist(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    PrefixOps.prefixSum(df, "k", "v", "cs")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("prefixSum == naive global cumsum on a dense grid (incl. negatives)") {
    import spark.implicits._
    val df = (0L until 1000L).map(k => (k, (k % 7) - 3)).toDF("k", "v")
    assert(dist(df) == naive(df))
  }

  test("prefixSum == naive on sparse, gappy, shuffled keys") {
    import spark.implicits._
    val keys = Seq(5L, 999999L, 42L, -17L, 0L, 123456L, 7L, -200L)
    val df = keys.map(k => (k, k % 11)).toDF("k", "v")
      .repartition(7) // scatter physical placement; result must not care
    assert(dist(df) == naive(df))
  }

  test("prefixSum handles frames smaller than the slice count and a single row") {
    import spark.implicits._
    val one = Seq((3L, 9L)).toDF("k", "v")
    assert(dist(one) == Map(3L -> 9L))
    val few = Seq((1L, 1L), (2L, 1L)).toDF("k", "v")
    assert(dist(few) == Map(1L -> 1L, 2L -> 2L))
  }

  test("plan: the corpus-grain window is slice-partitioned, offsets broadcast") {
    import spark.implicits._
    val df = (0L until 100L).map(k => (k, 1L)).toDF("k", "v")
    val p = PrefixOps.prefixSum(df, "k", "v", "cs")
      .queryExecution.executedPlan.toString
    // the big cumsum must carry a partition spec (__pid)
    assert(p.contains("windowspecdefinition(__pid"),
      s"slice-partitioned window missing:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$p")
  }
}
