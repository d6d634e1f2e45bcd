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

  test("prefixMaxBy == naive grouped running max (gappy keys, negatives, shuffled)") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 5.0), ("a", 3L, -2.0), ("a", 10L, 7.0), ("a", 11L, 7.0),
      ("a", 999L, 1.0), ("b", -5L, -9.0), ("b", 0L, -1.0), ("b", 2L, -4.0),
      ("c", 42L, 0.0))
    val df = rows.toDF("g", "k", "v").repartition(5)
    val naive = df.withColumn("rm",
        max("v").over(Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val dist = PrefixOps.prefixMaxBy(df, "g", "k", "v", "rm")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(dist == naive)
  }

  test("prefixMaxBy at raw-event grain matches the one-task window (sf fixture)") {
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("value"))
    val naive = e.withColumn("rm",
        max("value").over(Window.partitionBy("event_type").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val dist = PrefixOps.prefixMaxBy(e, "event_type", "event_id", "value", "rm")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(dist == naive) // max is exact — bit-identical, no tolerance
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

/** r5 verdict #7 — the ranked-window family's documented PrefixOps
  * swap, demonstrated end-to-end: `pareto_share_prefix` (range-
  * partitioned two-pass rank/cumsum) equals `pareto_share` (the
  * unpartitioned-window form) row-for-row, and rankedPrefix obeys
  * the rank/cumsum laws on a constructed frame with ties.
  */
class ParetoPrefixSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("pareto_share_prefix == pareto_share row-for-row (sf fixture)") {
    val a = SparkEntry.queries("pareto_share")(spark, sf).collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("pareto_share_prefix")(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, s"swap changed the report:\n$a\nvs\n$b")
  }

  test("rankedPrefix: ranks are a permutation, ties slice together, cumsum telescopes") {
    import spark.implicits._
    // values with heavy ties (all 7s) plus distinct ends
    val df = Seq((1L, 9.0), (2L, 7.0), (3L, 7.0), (4L, 7.0), (5L, 3.0),
      (6L, 7.0), (7L, 1.0)).toDF("id", "v")
    val r = graft.operators.PrefixOps.rankedPrefix(df, "v", "id", "rk", "cum")
      .orderBy("rk").collect()
    assert(r.map(_.getLong(2)).toSeq == (1L to 7L), "ranks not a 1..n permutation")
    // order: 9, then tied 7s by id asc (2,3,4,6), then 3, then 1
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 6L, 5L, 7L))
    // cumsum telescopes exactly (integral doubles — no FP slack needed)
    val expect = r.map(_.getDouble(1)).scanLeft(0.0)(_ + _).drop(1)
    assert(r.map(_.getDouble(3)).toSeq == expect.toSeq)
  }
}
