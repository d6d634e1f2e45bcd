package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.operators.SliQueries
import graft.sources.Tables

/** Typed Aggregator (UDAF extension point) cross-checked against the
  * column-expression form on real data.
  */
class AggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("WeightedMean Aggregator == weightedAvg column form per event_type") {
    val base = Tables.events(spark, sf)
      .select(col("event_type"),
        col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("w"))
    val typed = base.as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(Aggregators.WeightedMean.toColumn)
      .collect().toMap
    val column = base.groupBy("event_type")
      .agg(SliQueries.weightedAvg(col("value"), col("w")).as("wa"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == column.keySet)
    column.foreach { case (t, expect) =>
      assert(math.abs(typed(t) - expect) < 1e-9 * math.max(1.0, math.abs(expect)),
        s"$t: typed ${typed(t)} vs column $expect")
    }
  }

  test("WeightedMean: zero total weight yields NaN (typed twin of nullif guard)") {
    val ds = Seq((1.0, 0L), (2.0, 0L)).toDS()
    val out = ds.groupByKey(_ => "g")
      .agg(Aggregators.WeightedMean.toColumn).collect().head._2
    assert(out.isNaN)
  }
}
