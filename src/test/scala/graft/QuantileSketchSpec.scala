package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileFunctions
import graft.operators.QuantileRollup
import graft.sources.Tables

/** The GK quantile-sketch plane (QuantileSketch.scala +
  * QuantileRollup): the ε rank guarantee end-to-end through persisted
  * day sketches and merge, partial-aggregation correctness, SQL
  * surface, and empty/null behavior.
  */
class QuantileSketchSpec extends SparkTestBase {

  private val Eps = QuantileRollup.Eps

  /** rank bounds of `est` among the exact values of one group. */
  private def rankBounds(exact: Array[Double], est: Double): (Long, Long) =
    (exact.count(_ < est).toLong, exact.count(_ <= est).toLong)

  test("rollup estimates satisfy the GK rank bound against exact data, through the merge") {
    val exactByType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val rollup = QuantileRollup.quantileSketchRollup(spark, sf).collect()
    assert(rollup.length == exactByType.size && rollup.nonEmpty)
    rollup.foreach { r =>
      val et = r.getString(0)
      val exact = exactByType(et)
      val n = exact.length.toLong
      assert(r.getLong(2) == n, s"$et: sketch count ${r.getLong(2)} != $n")
      Seq(0.5 -> r.getDouble(3), 0.9 -> r.getDouble(4), 0.99 -> r.getDouble(5))
        .foreach { case (phi, est) =>
          val target = phi * n
          val (lo, hi) = rankBounds(exact, est)
          // GK: some value with rank within eps*n of target is returned
          // (+1 slack for the r4 rounding of the output column)
          assert(hi >= target - Eps * n - 1,
            s"$et p$phi: est $est rank<=$hi below target $target - eps*n")
          assert(lo <= target + Eps * n + 1,
            s"$et p$phi: est $est rank>=$lo above target $target + eps*n")
        }
    }
  }

  test("merged-of-daily == single-sketch bound; partial aggregation across partitions works") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
    // direct sketch with forced multi-partition partial->final merge
    val direct = ev.repartition(7)
      .groupBy("event_type")
      .agg(QuantileFunctions.gkSketch(col("value"), Eps).as("qs"),
        count(lit(1)).as("n"))
      .withColumn("q", QuantileFunctions.gkQuantiles(col("qs"), Seq(0.5)))
      .select(col("event_type"), col("n"), col("q")(0).as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exactByType = ev.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    exactByType.foreach { case (et, exact) =>
      val (n, p50) = direct(et)
      assert(n == exact.length.toLong)
      val (lo, hi) = rankBounds(exact, p50)
      assert(hi >= 0.5 * n - Eps * n && lo <= 0.5 * n + Eps * n,
        s"$et: partial-agg p50 $p50 violates rank bound (lo=$lo hi=$hi n=$n)")
    }
  }

  test("gk_sketch / gk_merge / gk_quantiles are SQL-callable and match the DataFrame surface") {
    Tables.events(spark, sf).createOrReplaceTempView("qs_events")
    val sql = spark.sql(
      """WITH daily AS (
        |  SELECT event_type, to_date(ts) AS d, gk_sketch(value, 0.01d) AS qs
        |  FROM qs_events GROUP BY 1, 2)
        |SELECT event_type, gk_quantiles(gk_merge(qs, 0.01d), array(0.5d, 0.9d))[0] AS p50
        |FROM daily GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val df = QuantileRollup.dailySketches(spark, sf)
      .groupBy("event_type")
      .agg(QuantileFunctions.gkMerge(col("qs"), Eps).as("qs"))
      .withColumn("q", QuantileFunctions.gkQuantiles(col("qs"), Seq(0.5, 0.9)))
      .select(col("event_type"), col("q")(0).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sql == df, s"SQL $sql != DataFrame $df")
  }

  test("quantile_sketch_rollup never scans raw events — only the persisted sketch table") {
    val df = SparkEntry.queries("quantile_sketch_rollup")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("events.parquet"), s"rollup re-read the raw fact table:\n$p")
    assert(p.contains("graft_qsketch"), "expected the persisted quantile-sketch table scan")
  }

  test("day-wise incremental builds answer quantiles within the same eps bound") {
    val base = java.nio.file.Files.createTempDirectory("graft_qs_inc").toString
    val inc = s"$base/inc"
    val ev = Tables.events(spark, sf)
    val days = ev.select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0).toString).sorted
    assert(days.length > 2)
    days.foreach(d => QuantileRollup.appendDayFrom(spark, ev, d, inc))
    // replay a mid-stream day: must be a no-op on counts
    QuantileRollup.appendDayFrom(spark, ev, days(days.length / 2), inc)
    val rollup = spark.read.parquet(inc)
      .groupBy("event_type")
      .agg(QuantileFunctions.gkMerge(col("qs"), Eps).as("qs"),
        sum("n_events").as("n"))
      .withColumn("q", QuantileFunctions.gkQuantiles(col("qs"), Seq(0.5, 0.99)))
      .select(col("event_type"), col("n"), col("q")(0).as("p50"), col("q")(1).as("p99"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exactByType = ev.select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    exactByType.foreach { case (et, exact) =>
      val (n, p50, p99) = rollup(et)
      assert(n == exact.length.toLong, s"$et: replayed day double-counted ($n != ${exact.length})")
      Seq(0.5 -> p50, 0.99 -> p99).foreach { case (phi, est) =>
        val (lo, hi) = rankBounds(exact, est)
        // same ±1 slack as the one-shot rollup assertion (discrete ranks)
        assert(hi >= phi * n - Eps * n - 1 && lo <= phi * n + Eps * n + 1,
          s"$et p$phi from day-wise table violates rank bound (lo=$lo hi=$hi n=$n)")
      }
    }
  }

  test("empty and all-null groups eval to null sketches, not crashes") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
      .groupBy("g").agg(QuantileFunctions.gkSketch(col("v"), 0.05).as("qs"))
    assert(empty.count() == 0)
    val allNull = Seq(("a", Option.empty[Double])).toDF("g", "v")
      .groupBy("g").agg(QuantileFunctions.gkSketch(col("v"), 0.05).as("qs"))
    assert(allNull.head().isNullAt(1), "all-null group should eval to null sketch")
    // merging a null sketch row is a no-op, not a crash
    val merged = Seq(("a", Option.empty[Array[Byte]])).toDF("g", "qs")
      .groupBy("g").agg(QuantileFunctions.gkMerge(col("qs"), 0.05).as("qs"))
    assert(merged.head().isNullAt(1))
  }

  test("window/Complete-mode eval on groups smaller than the head buffer is non-null") {
    // Regression (round-4 advisor): QuantileSummaries.count excludes
    // values still in the un-flushed head buffer (flushed every 50k
    // inserts or on compress). In Complete-mode evaluation — reachable
    // via `gk_sketch(...) OVER (...)` since the function is
    // SQL-registered — update+eval run on the same buffer with no
    // serialize in between, so a count-first emptiness check silently
    // evals EVERY group under 50k rows to null. eval must compress
    // first, then check.
    import spark.implicits._
    (1 to 40).map(i => (s"g${i % 4}", i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("gk_small_groups")
    val viaWindow = spark.sql(
      """SELECT g, v,
        |       gk_quantiles(gk_sketch(v, 0.05D) OVER (PARTITION BY g), array(0.5D))[0] AS p50
        |FROM gk_small_groups""".stripMargin).collect()
    assert(viaWindow.length == 40)
    viaWindow.foreach { r =>
      assert(!r.isNullAt(2),
        s"group ${r.getString(0)}: window gk_sketch evaled to null on a small group")
      // each group holds 10 evenly spread values; the p50 must be one of them
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 40.0)
    }
  }
}
