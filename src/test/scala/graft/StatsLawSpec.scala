package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{LlmQueries, RelationalQueries, ScalarQueries, SliQueries, TextOps}
import graft.sources.Tables

/** Functional laws for the statistics + calibration wave
  * (regr_value_trend, minmax_by_day, mad_robust, bitbool_aggs,
  * zipf_slope, quantile_norm_chars) — properties the DuckDB oracle
  * (engine agreement) cannot express: algebraic identities on
  * constructed fixtures and order/bound laws that hold on ANY data,
  * plus the fixture-tie guard minmax_by_day's determinism note
  * depends on.
  */
class StatsLawSpec extends SparkTestBase {

  private def tmpEvents(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_stats").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def ts(day: Int, h: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("regr_value_trend: exact line recovered — slope/intercept exact, R² = 1") {
    // one event per day, value = 2*dayNum + 1 → daily avg IS the line;
    // OLS on a perfectly linear series returns it exactly and R² = 1.
    val epoch0 = 19723 // days 1970-01-01 → 2024-01-01
    val d = tmpEvents((1 to 10).map { i =>
      (i.toLong, ts(i), 1L, "click", 2.0 * (epoch0 + i - 1) + 1.0, "{}")
    })
    val r = SliQueries.regrValueTrend(spark, d).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(1) == 2.0, s"slope ${r(0).getDouble(1)}")
    assert(r(0).getDouble(2) == 1.0, s"intercept ${r(0).getDouble(2)}")
    assert(r(0).getDouble(3) == 1.0, s"r2 ${r(0).getDouble(3)}")
    assert(r(0).getLong(4) == 10L)
  }

  test("regr_value_trend: R² ∈ [0,1] and n_days matches the daily rollup on the fixture") {
    val r = SliQueries.regrValueTrend(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0 + 1e-9, row.toString)
    }
    val expectDays = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day")).count()
      .groupBy("event_type").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { row =>
      assert(row.getLong(4) == expectDays(row.getString(0)),
        s"${row.getString(0)}: regr_count != distinct days")
    }
  }

  test("minmax_by_day: fixture has no daily-avg ties per type (argmax determinism guard)") {
    // minmax_by_day's cross-engine determinism note rests on this: if
    // testdata regeneration ever introduces a tied daily avg within a
    // type, this pin fails before the driver's differential run does.
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
    val dups = daily.groupBy("event_type", "v").count()
      .filter(col("count") > 1).count()
    assert(dups == 0L, s"$dups tied (type, daily_avg) groups — argmax no longer deterministic")
  }

  test("minmax_by_day: argmax day attains the extreme value; max ≥ min") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v")).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2)))
    val out = SliQueries.minmaxByDay(spark, sf).collect()
    out.foreach { r =>
      val t = r.getString(0)
      val byDay = daily.filter(_._1 == t).map(x => x._2 -> x._3).toMap
      assert(r.getDouble(3) >= r.getDouble(4), s"$t: max < min")
      assert(byDay(r.getDate(1)) == byDay.values.max, s"$t: best_day not the max day")
      assert(byDay(r.getDate(2)) == byDay.values.min, s"$t: worst_day not the min day")
    }
  }

  test("mad_robust: exact on a constructed odd-length series (median 3, MAD 1, IQR 2)") {
    // values 1..5: median 3, |dev| = {2,1,0,1,2} → MAD 1, p75−p25 = 4−2.
    val d = tmpEvents((1 to 5).map { i =>
      (i.toLong, ts(1, h = 6 + i), i.toLong, "click", i.toDouble, "{}")
    })
    val r = ScalarQueries.madRobust(spark, d).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(1) == 3.0, s"median ${r(0).getDouble(1)}")
    assert(r(0).getDouble(2) == 1.0, s"mad ${r(0).getDouble(2)}")
    assert(r(0).getDouble(3) == 2.0, s"iqr ${r(0).getDouble(3)}")
    assert(r(0).getLong(4) == 5L)
  }

  test("mad_robust: MAD ≤ IQR on the fixture (≥50% of deviations bounded by the quartile span)") {
    ScalarQueries.madRobust(spark, sf).collect().foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0, r.toString)
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9,
        s"${r.getString(0)}: MAD ${r.getDouble(2)} > IQR ${r.getDouble(3)}")
    }
  }

  test("bitbool_aggs: exact folds on constructed masks") {
    // user_ids {0b1100, 0b1010, 0b1001} → AND 0b1000, OR 0b1111, XOR 0b1111.
    val d = tmpEvents(Seq(
      (1L, ts(1), 12L, "click", 1.0, "{}"),
      (2L, ts(2), 10L, "click", 2.0, "{}"),
      (3L, ts(3), 9L, "click", 3.0, "{}")))
    val r = ScalarQueries.bitboolAggs(spark, d).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 8L && r(0).getLong(2) == 15L && r(0).getLong(3) == 15L,
      r(0).toString)
    assert(r(0).getBoolean(4) && !r(0).getBoolean(5), r(0).toString)
  }

  test("bitbool_aggs: AND ⊆ OR bit-containment and nonneg-value law on the fixture") {
    ScalarQueries.bitboolAggs(spark, sf).collect().foreach { r =>
      val (and, or) = (r.getLong(1), r.getLong(2))
      assert((and & or) == and, s"${r.getString(0)}: bit_and ⊄ bit_or")
      assert(r.getBoolean(4), s"${r.getString(0)}: fixture values are nonneg by construction")
    }
  }

  test("zipf_slope: slope ≤ 0 (freq non-increasing in rank), R² ∈ [0,1], ≤100 terms") {
    val r = LlmQueries.zipfSlope(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getDouble(1) <= 1e-9, s"${row.getString(0)}: positive Zipf slope")
      assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0 + 1e-9, row.toString)
      assert(row.getLong(3) <= 100L, row.toString)
    }
  }

  test("rolling_active_users: dominates daily actives; day-1 identity; ≤ total users") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct("user_id").as("d_active"))
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    val total = Tables.events(spark, sf).select("user_id").distinct().count()
    val out = SliQueries.rollingActiveUsers(spark, sf).collect()
    assert(out.nonEmpty)
    val firstDay = daily.keys.minBy(_.getTime)
    out.foreach { r =>
      val (day, a7, ud) = (r.getDate(0), r.getLong(1), r.getLong(2))
      assert(a7 >= daily(day), s"$day: 7d actives < same-day actives")
      assert(a7 <= total, s"$day: 7d actives exceed the user universe")
      assert(ud >= a7, s"$day: user_days < distinct actives")
      if (day == firstDay)
        assert(a7 == daily(day), "day-1 window must equal day-1 actives")
    }
  }

  test("breach_streaks: disjoint per type, end ≥ start, len == span in days") {
    val out = SliQueries.breachStreaks(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDate(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (t, s0, s1, len) =>
      assert(!s1.before(s0), s"$t: end before start")
      val span = (s1.toLocalDate.toEpochDay - s0.toLocalDate.toEpochDay) + 1
      assert(span == len, s"$t: len $len != day span $span (streak not consecutive)")
    }
    out.groupBy(_._1).foreach { case (t, streaks) =>
      val sorted = streaks.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // a gap of ≥1 non-breach day must separate consecutive islands
          assert(s2.toLocalDate.toEpochDay > e1.toLocalDate.toEpochDay + 1,
            s"$t: adjacent streaks touch — islands grouping broke")
        case _ =>
      }
    }
  }

  test("copurchase_pairs: canonical pairs, descending counts, ≤20 rows") {
    val out = RelationalQueries.copurchasePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { case (a, b, n) =>
      assert(a < b, s"pair ($a,$b) not canonicalized")
      assert(n >= 1L)
    }
    val counts = out.map(_._3)
    assert(counts.sameElements(counts.sortBy(-_)), "top-k not count-descending")
  }

  private def tmpOrders(rows: Seq[(Long, Long, String, Double, Timestamp, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_orders").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("funnel_steps: order + 24h bound enforced on a constructed user set") {
    // u1 converts fully; u2's click PRECEDES its view (order violated);
    // u3's click is 25h after its view (bound violated); u4 never views.
    val d = tmpEvents(Seq(
      (1L, ts(1, 6), 1L, "view", 1.0, "{}"),
      (2L, ts(1, 7), 1L, "click", 1.0, "{}"),
      (3L, ts(1, 8), 1L, "purchase", 1.0, "{}"),
      (4L, ts(2, 6), 2L, "click", 1.0, "{}"),
      (5L, ts(2, 7), 2L, "view", 1.0, "{}"),
      (6L, ts(3, 6), 3L, "view", 1.0, "{}"),
      (7L, ts(4, 7), 3L, "click", 1.0, "{}"), // 25 h later
      (8L, ts(5, 6), 4L, "purchase", 1.0, "{}")))
    val r = SliQueries.funnelSteps(spark, d).collect()(0)
    assert(r.getLong(0) == 3L, s"n_viewed ${r.getLong(0)}")
    assert(r.getLong(1) == 1L, s"n_clicked_after ${r.getLong(1)}")
    assert(r.getLong(2) == 1L, s"n_purchased_after ${r.getLong(2)}")
    assert(r.getDouble(3) == 0.3333, s"view_to_click ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"click_to_purchase ${r.getDouble(4)}")
  }

  test("funnel_steps: step counts are monotone and rates in [0,1] on the fixture") {
    val r = SliQueries.funnelSteps(spark, sf).collect()(0)
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2),
      s"funnel widened downstream: $r")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9, r.toString)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9, r.toString)
  }

  test("pareto_share: uniform revenue ⇒ gini 0, decile share 1/10, 8 of 10 to reach 80%") {
    val d = tmpOrders((1L to 10L).map { k =>
      (k, k, "O", 100.0, ts(1), "1-URGENT")
    })
    val r = RelationalQueries.paretoShare(spark, d).collect()(0)
    assert(r.getLong(0) == 10L)
    assert(r.getLong(1) == 8L, s"n_to_80pct ${r.getLong(1)}")
    assert(r.getDouble(2) == 0.1, s"top_decile_share ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.0, s"gini ${r.getDouble(3)}")
  }

  test("pareto_share: gini ∈ [0,1), decile share ≥ 1/10, 80%-count ≤ n on the fixture") {
    val r = RelationalQueries.paretoShare(spark, sf).collect()(0)
    val n = r.getLong(0)
    assert(r.getLong(1) >= 1L && r.getLong(1) <= n)
    // the top decile holds AT LEAST a proportional share by definition
    assert(r.getDouble(2) >= 0.1 - 1e-9, s"top decile under-proportional: $r")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0, s"gini out of range: $r")
  }

  test("time_to_convert: converter count equals funnel_steps' click stage (shared frame)") {
    val t2c = SliQueries.timeToConvert(spark, sf).collect()(0)
    val fun = SliQueries.funnelSteps(spark, sf).collect()(0)
    assert(t2c.getLong(0) == fun.getLong(1),
      s"n_converted ${t2c.getLong(0)} != n_clicked_after ${fun.getLong(1)}")
    assert(t2c.getDouble(1) > 0.0 && t2c.getDouble(1) <= 24 * 60 + 1e-9,
      s"avg outside (0, 24h]: $t2c")
    assert(t2c.getDouble(2) <= t2c.getDouble(3) + 1e-9, s"med > p90: $t2c")
  }

  test("peak_concurrency: overlap counts, disjoint doesn't, midnight span hits both days") {
    // u1/u2 overlap 12:00-13:00 on day 1 (peak 2); day 2 has two
    // DISJOINT sessions (peak 1); u3 spans midnight day 3→4 and must
    // appear in both days' sweeps.
    val d = tmpEvents(Seq(
      (1L, ts(1, 12), 1L, "view", 1.0, "{}"),
      (2L, ts(1, 13), 1L, "view", 1.0, "{}"),
      (3L, ts(1, 12), 2L, "view", 1.0, "{}"),
      (4L, ts(2, 6), 1L, "view", 1.0, "{}"),
      (5L, ts(2, 12), 2L, "view", 1.0, "{}"),
      (6L, Timestamp.valueOf("2024-01-03 23:50:00"), 3L, "view", 1.0, "{}"),
      (7L, Timestamp.valueOf("2024-01-04 00:10:00"), 3L, "view", 1.0, "{}")))
    val out = SliQueries.peakConcurrency(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(out == Map("2024-01-01" -> 2L, "2024-01-02" -> 1L,
      "2024-01-03" -> 1L, "2024-01-04" -> 1L), s"got $out")
  }

  private def tmpShip(orders: Seq[(Long, Timestamp, String)],
                      lines: Seq[(Long, Long, Timestamp)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ship").toString
    orders.toDF("o_orderkey", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    lines.toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("ship_latency: histogram interpolation reproduces exact quantile_cont values") {
    // latencies 0,10,20,30,100 → med = 20, p95 = 30+(100-30)*0.8 = 86, avg = 32
    val base = ts(1).toLocalDateTime.toLocalDate
    val d = tmpShip(
      orders = Seq((1L, ts(1), "1-URGENT")),
      lines = Seq(0, 10, 20, 30, 100).zipWithIndex.map { case (days, i) =>
        (1L, i.toLong, Timestamp.valueOf(base.plusDays(days.toLong).atStartOfDay))
      })
    val r = RelationalQueries.shipLatency(spark, d).collect()(0)
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 32.0, s"avg ${r.getDouble(2)}")
    assert(r.getDouble(3) == 20.0, s"med ${r.getDouble(3)}")
    assert(r.getDouble(4) == 86.0, s"p95 ${r.getDouble(4)}")
  }

  test("ship_latency: tails ordered (med ≤ p95) and counts positive on the fixture") {
    val out = RelationalQueries.shipLatency(spark, sf).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9, s"med > p95: $r")
    }
  }

  private def tmpBaskets(baskets: Seq[Seq[Long]]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_graph").toString
    baskets.zipWithIndex
      .flatMap { case (parts, ok) => parts.map(p => (ok.toLong, p)) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("copurchase_pagerank: regular graph ⇒ uniform rank; star center dominates") {
    // 4-cycle (2-regular): stationary rank is exactly uniform = 250‰/node
    val cyc = tmpBaskets(Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(3L, 4L), Seq(1L, 4L)))
    val cr = RelationalQueries.copurchasePagerank(spark, cyc).collect()
    assert(cr.length == 4)
    cr.foreach(r => assert(r.getDouble(1) == 250.0, s"non-uniform on cycle: $r"))
    // star K1,3: center (part 9) must rank strictly above every leaf
    val star = tmpBaskets(Seq(Seq(9L, 1L), Seq(9L, 2L), Seq(9L, 3L)))
    val sr = RelationalQueries.copurchasePagerank(spark, star).collect()
    assert(sr.head.getLong(0) == 9L, s"star center not top: ${sr.toSeq}")
    assert(sr.head.getDouble(1) > sr(1).getDouble(1), s"center not strict: ${sr.toSeq}")
  }

  test("cohort_retention: day-0 identity (pct 1.0) and constructed dropout at k=1") {
    // u1,u2 first seen day 1; only u1 returns day 2 → cohort day1:
    // k0 pct 1.0 (2 active), k1 pct 0.5 (1 active)
    val d = tmpEvents(Seq(
      (1L, ts(1, 6), 1L, "view", 1.0, "{}"),
      (2L, ts(1, 7), 2L, "view", 1.0, "{}"),
      (3L, ts(2, 6), 1L, "view", 1.0, "{}")))
    val rows = SliQueries.cohortRetention(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((0L, 2L, 1.0), (1L, 1L, 0.5)), rows.toSeq.toString)
    // fixture-wide: every cohort's k=0 share is exactly 1.0
    val day0 = SliQueries.cohortRetention(spark, sf).collect()
      .filter(_.getLong(1) == 0L)
    assert(day0.nonEmpty && day0.forall(_.getDouble(3) == 1.0),
      "a cohort missed its own day 0")
  }

  test("new_vs_returning: new-user mass equals distinct users; first day all new") {
    val out = SliQueries.newVsReturning(spark, sf).collect()
    val totalNew = out.map(_.getLong(1)).sum
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(totalNew == users, s"new mass $totalNew != distinct users $users")
    assert(out.head.getLong(2) == 0L, s"day 1 has returning users: ${out.head}")
  }

  test("seasonal_dow_index: n-weighted mean of the index is 1 per type") {
    val byType = SliQueries.seasonalDowIndex(spark, sf).collect()
      .groupBy(_.getString(0))
    byType.foreach { case (t, rows) =>
      val n = rows.map(_.getLong(2)).sum.toDouble
      val wm = rows.map(r => r.getLong(2) * r.getDouble(3)).sum / n
      assert(math.abs(wm - 1.0) < 1e-3, s"$t: weighted index mean $wm != 1")
    }
  }

  test("repeat_cadence: constructed gaps average exactly; single-order customers excluded") {
    // cust 1 orders day 1/11/31 → gaps 10, 20 → cadence 15;
    // cust 2 has one order → not a repeat customer
    val d = tmpOrders(Seq(
      (1L, 1L, "O", 10.0, ts(1), "1-URGENT"),
      (2L, 1L, "O", 10.0, ts(11), "1-URGENT"),
      (3L, 1L, "O", 10.0, ts(31), "1-URGENT"),
      (4L, 2L, "O", 10.0, ts(5), "1-URGENT")))
    val r = RelationalQueries.repeatCadence(spark, d).collect()(0)
    assert(r.getLong(0) == 1L, s"n_repeat ${r.getLong(0)}")
    assert(r.getDouble(1) == 15.0, s"avg ${r.getDouble(1)}")
    assert(r.getDouble(2) == 15.0, s"med ${r.getDouble(2)}")
  }

  test("event_transitions: probs row-normalize to 1; constructed chain counts exactly") {
    // u1: view→click→view, u2: view→click ⇒ (view,click)=2 p=1,
    // (click,view)=1 p=1 — gaps don't matter (no sessionization here)
    val d = tmpEvents(Seq(
      (1L, ts(1, 6), 1L, "view", 1.0, "{}"),
      (2L, ts(1, 7), 1L, "click", 1.0, "{}"),
      (3L, ts(1, 8), 1L, "view", 1.0, "{}"),
      (4L, ts(2, 6), 2L, "view", 1.0, "{}"),
      (5L, ts(2, 7), 2L, "click", 1.0, "{}")))
    val rows = SliQueries.eventTransitions(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(("click", "view", 1L, 1.0), ("view", "click", 2L, 1.0)),
      rows.toSeq.toString)
    // fixture-wide: each prev row of the matrix sums to probability 1
    val sums = SliQueries.eventTransitions(spark, sf).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(3)).sum)
    sums.foreach { case (p, s) =>
      assert(math.abs(s - 1.0) < 5e-4, s"$p: row prob sum $s")
    }
  }

  test("session_paths: paths truncate at 5 steps; constructed sessions split on the gap") {
    // u1: three events 10 min apart = ONE session "view>click>purchase";
    // u2: two views 2 h apart = TWO "view" sessions
    val mk = (id: Long, u: Long, et: String, dayMin: Int) =>
      (id, Timestamp.valueOf(f"2024-01-01 ${dayMin / 60}%02d:${dayMin % 60}%02d:00"), u, et, 1.0, "{}")
    val d = tmpEvents(Seq(
      mk(1L, 1L, "view", 360), mk(2L, 1L, "click", 370), mk(3L, 1L, "purchase", 380),
      mk(4L, 2L, "view", 360), mk(5L, 2L, "view", 600)))
    val rows = SliQueries.sessionPaths(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("view", 2L), ("view>click>purchase", 1L)), rows.toSeq.toString)
    // 7-event single session truncates to exactly 5 steps
    val long = tmpEvents((1 to 7).map { i =>
      mk(i.toLong, 1L, if (i % 2 == 1) "view" else "click", 360 + i)
    })
    val p = SliQueries.sessionPaths(spark, long).collect()(0).getString(0)
    assert(p == "view>click>view>click>view", p)
    // fixture-wide: no path exceeds 5 steps
    SliQueries.sessionPaths(spark, sf).collect().foreach { r =>
      assert(r.getString(0).split(">").length <= 5, r.getString(0))
    }
  }

  test("ab_test_conversion: arms partition the user base; converter mass re-adds; " +
    "flag consistent with the rounded z") {
    val r = SliQueries.abTestConversion(spark, sf).collect()(0)
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(na + nb == users, s"arms $na+$nb != users $users")
    // rate_k * n_k recovers the integer converter counts (r4 rounding
    // is exact to 1e-4 — counts are < 1e4 at this SF)
    val convTotal = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") > 180, 1L)
        .otherwise(0L)).as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    val backA = math.round(r.getDouble(2) * na)
    val backB = math.round(r.getDouble(3) * nb)
    assert(backA + backB == convTotal, s"$backA+$backB != $convTotal")
    assert(r.getBoolean(5) == (math.abs(r.getDouble(4)) > 1.96),
      s"flag ${r.getBoolean(5)} vs z ${r.getDouble(4)}")
  }

  test("fuzzy_name_pairs: canonical order, dist in [1,4], cross-block pairs never appear") {
    val mkPart = (id: Long, name: String) => (id, name, "Brand#1", "t", 1, 1.0)
    val d = {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_parts").toString
      Seq(mkPart(1L, "red bolt"), mkPart(2L, "blue bolt"),
        mkPart(3L, "red widget"), mkPart(4L, "aaaaaaaaaaaa bolt"))
        .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      dir
    }
    val rows = RelationalQueries.fuzzyNamePairs(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // only the in-block, distance<=4 pair survives: red/blue bolt (4);
    // "aaaaaaaaaaaa bolt" is in-block but at distance > 4, and
    // "red widget" never pairs across the noun block
    assert(rows.toSeq == Seq(("blue bolt", "red bolt", 4L)), rows.toSeq.toString)
    RelationalQueries.fuzzyNamePairs(spark, sf).collect().foreach { r =>
      assert(r.getString(0) < r.getString(1), r.toString)
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 4L, r.toString)
    }
  }

  test("rfm_segments: grid mass = customer count; each quartile dimension balances ±1") {
    val out = RelationalQueries.rfmSegments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val customers = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(out.map(_._4).sum == customers, "segment mass != customers")
    // ntile(4) balance: marginal totals per quartile differ by <= 1
    Seq[((Long, Long, Long, Long)) => Long](_._1, _._2, _._3).foreach { dim =>
      val marg = out.groupBy(dim).view.mapValues(_.map(_._4).sum).values.toSeq
      assert(marg.size == 4 && marg.max - marg.min <= 1, s"unbalanced: $marg")
    }
  }

  test("interarrival_stats: constructed gaps compute exactly; day boundaries cut gaps") {
    // one type, one day: events at 06:00/06:10/06:30/07:00 →
    // gaps 600/1200/1800 s: mean 1200, sd_pop = sqrt(240000),
    // cv = sd/mean; minute counts all 1 → fano 0
    val d = tmpEvents(Seq(
      (1L, ts(1, 6), 1L, "view", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 06:10:00"), 1L, "view", 1.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 06:30:00"), 1L, "view", 1.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-01 07:00:00"), 1L, "view", 1.0, "{}")))
    val r = SliQueries.interarrivalStats(spark, d).collect()(0)
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 1200.0, s"mean ${r.getDouble(2)}")
    val cv = math.round((math.sqrt(240000.0) / 1200.0 + 1e-7) * 1e4) / 1e4
    assert(r.getDouble(3) == cv, s"cv ${r.getDouble(3)} != $cv")
    assert(r.getDouble(4) == 0.0, s"fano ${r.getDouble(4)}")
    // two events in different days → zero intra-day gaps → type absent
    val d2 = tmpEvents(Seq(
      (1L, ts(1, 23), 1L, "view", 1.0, "{}"),
      (2L, ts(2, 1), 1L, "view", 1.0, "{}")))
    assert(SliQueries.interarrivalStats(spark, d2).collect().isEmpty)
  }

  test("window_lag_delta: constructed deltas compute exactly; the midnight boundary cuts one delta") {
    // one type, one day: values 10/30/70 at 06:00/06:10/06:30 →
    // deltas 20/40: n_deltas 2, avg_abs 30
    val d = tmpEvents(Seq(
      (1L, Timestamp.valueOf("2024-01-01 06:00:00"), 1L, "view", 10.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 06:10:00"), 1L, "view", 30.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 06:30:00"), 1L, "view", 70.0, "{}")))
    val r = ScalarQueries.windowLagDelta(spark, d).collect()(0)
    assert(r.getLong(1) == 2L, s"n_deltas ${r.getLong(1)}")
    assert(r.getDouble(2) == 30.0, s"avg_abs_delta ${r.getDouble(2)}")
    // same values straddling midnight: the 23:50→00:10 delta is CUT by
    // the (type, day) re-key (the r5 interarrival_stats discipline) —
    // only the intra-day 00:10→00:30 delta (40) remains
    val d2 = tmpEvents(Seq(
      (1L, Timestamp.valueOf("2024-01-01 23:50:00"), 1L, "view", 10.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 00:10:00"), 1L, "view", 30.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-02 00:30:00"), 1L, "view", 70.0, "{}")))
    val r2 = ScalarQueries.windowLagDelta(spark, d2).collect()(0)
    assert(r2.getLong(1) == 1L, s"boundary delta not cut: n=${r2.getLong(1)}")
    assert(r2.getDouble(2) == 40.0, s"avg_abs_delta ${r2.getDouble(2)}")
  }

  test("ntile_quartiles: histogram-derived readouts equal the naive per-type window exactly") {
    // the r5 rewrite derives ntile/percent_rank/cume_dist from a
    // (type, value)-grain histogram + prefix sum; this law pins the
    // derivation against the window functions themselves on the sf
    // fixture (same total (value, event_id) order, row-for-row)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val naive = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("prank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .groupBy("event_type", "quartile")
      .agg(count(lit(1)).as("n"),
        round(avg("value") + lit(1e-7), 4).as("avg_value"),
        round(max("prank") + lit(1e-7), 4).as("max_prank"),
        round(max("cume") + lit(1e-7), 4).as("max_cume"))
      .orderBy("event_type", "quartile")
      .collect().map(_.toSeq).toSeq
    val derived = ScalarQueries.ntileQuartiles(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(derived == naive,
      s"derived != naive:\n${derived.mkString("\n")}\nvs\n${naive.mkString("\n")}")
  }

  test("dq_profile: clean fixture profiles clean; constructed null is counted; " +
    "varchar min/max stay null") {
    val out = ScalarQueries.dqProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val orders = Tables.orders(spark, sf).count()
    assert(out("o_orderkey").getLong(1) == 0L)
    assert(out("o_orderkey").getLong(2) == orders, "orderkey not unique")
    Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate").foreach { c =>
      assert(out(c).getDouble(3) <= out(c).getDouble(4), s"$c min>max")
    }
    Seq("o_orderstatus", "o_orderpriority").foreach { c =>
      assert(out(c).isNullAt(3) && out(c).isNullAt(4), s"$c has numeric min/max")
    }
    val d = tmpOrders(Seq(
      (1L, 1L, "O", 10.0, ts(1), "1-URGENT"),
      (2L, 1L, "O", 20.0, ts(2), null)))
    val prof = ScalarQueries.dqProfile(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof("o_orderpriority").getLong(1) == 1L, "null not counted")
    assert(prof("o_orderpriority").getLong(2) == 1L, "null counted as distinct")
  }

  test("burn_forecast: exact line of burns recovers slope/intercept/projection") {
    // day i (di = 0..4): 10 one-minute events, i of them breaching
    // (v=200) → burn_i = i/(10·0.01) = 10·di: slope 10, intercept 0,
    // avg 20, projection 10·(4+7) = 110, flagged over budget
    val rows = for {
      day <- 1 to 5; minute <- 0 until 10
    } yield ((day * 100 + minute).toLong,
      Timestamp.valueOf(f"2024-01-0$day 06:$minute%02d:00"), 1L, "view",
      if (minute < day - 1) 200.0 else 100.0, "{}")
    val r = SliQueries.burnForecast(spark, tmpEvents(rows)).collect()(0)
    assert(r.getDouble(1) == 10.0, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.0, s"intercept ${r.getDouble(2)}")
    assert(r.getDouble(3) == 20.0, s"avg ${r.getDouble(3)}")
    assert(r.getDouble(4) == 110.0, s"proj ${r.getDouble(4)}")
    assert(r.getBoolean(5))
  }

  test("flap_rate: perfect alternation rates 1.0; steady state rates 0") {
    // 'view' alternates bad/good daily (all-breach vs all-good days),
    // 'click' stays good: flips 3/3 days vs 0
    val rows = for {
      day <- 1 to 4; (t, base) <- Seq(("view", if (day % 2 == 1) 200.0 else 100.0),
        ("click", 100.0))
      minute <- 0 until 3
    } yield ((day * 1000 + minute + (if (t == "view") 0 else 500)).toLong,
      Timestamp.valueOf(f"2024-01-0$day 06:$minute%02d:00"), 1L, t, base, "{}")
    val out = SliQueries.flapRate(spark, tmpEvents(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out("view") == ((4L, 2L, 3L, 1.0)), out("view").toString)
    assert(out("click") == ((4L, 0L, 0L, 0.0)), out("click").toString)
  }

  test("seasonal_decompose: constant series zeroes out; decomposition never inflates noise " +
    "on the fixture") {
    val d = tmpEvents((1 to 14).map { i =>
      (i.toLong, ts(i), 1L, "view", 42.0, "{}")
    })
    val c = SliQueries.seasonalDecompose(spark, d).collect()(0)
    assert(c.getLong(1) == 14L)
    assert(c.getDouble(2) == 0.0 && c.getDouble(3) == 0.0, c.toString)
    assert(c.isNullAt(4), "0/0 variance ratio must be null, not a number")
    SliQueries.seasonalDecompose(spark, sf).collect().foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-9,
        s"${r.getString(0)}: residual σ ${r.getDouble(3)} > raw σ ${r.getDouble(2)}")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, r.toString)
    }
  }

  test("locf_impute: carries last good value through bad runs; leading bad stays null") {
    // A: good(100) bad bad good(120) → filled 100,100,100,120
    // B: bad good(80) → filled null,80 (no prior observation)
    val mk = (id: Long, day: Int, t: String, v: Double) =>
      (id, ts(day), 1L, t, v, "{}")
    val d = tmpEvents(Seq(
      mk(1L, 1, "A", 100.0), mk(2L, 2, "A", 200.0), mk(3L, 3, "A", 200.0),
      mk(4L, 4, "A", 120.0),
      mk(5L, 1, "B", 200.0), mk(6L, 2, "B", 80.0)))
    val rows = SliQueries.locfImpute(spark, d).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq == Seq(
      ("A", "2024-01-01", Some(100.0), Some(100.0)),
      ("A", "2024-01-02", None, Some(100.0)),
      ("A", "2024-01-03", None, Some(100.0)),
      ("A", "2024-01-04", Some(120.0), Some(120.0)),
      ("B", "2024-01-01", None, None),
      ("B", "2024-01-02", Some(80.0), Some(80.0))), rows.toSeq.toString)
    // fixture-wide: filled equals masked wherever the day was good
    SliQueries.locfImpute(spark, sf).collect().foreach { r =>
      if (!r.isNullAt(2))
        assert(r.getDouble(2) == r.getDouble(3), s"good day rewritten: $r")
    }
  }

  test("purchase_attribution: in-window touch credits, stale/missing goes direct; shares sum 1") {
    val d = tmpEvents(Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 1L, "purchase", 1.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 08:00:00"), 2L, "click", 1.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-01 10:00:00"), 2L, "purchase", 1.0, "{}"),
      (5L, Timestamp.valueOf("2024-01-01 09:00:00"), 3L, "purchase", 1.0, "{}")))
    val rows = SliQueries.purchaseAttribution(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("direct", 2L, 0.6667), ("view", 1L, 0.3333)),
      rows.toSeq.toString)
    val out = SliQueries.purchaseAttribution(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    assert(out.map(_.getLong(1)).sum == purchases, "attribution mass != purchases")
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 5e-4, "shares don't sum to 1")
  }

  test("quantile_disc_mode: disc median is an observed value; constructed ties break low") {
    // odd 1..5: cont 3, disc 3; ties {1,1,2,2}: mode must take the
    // SMALLER bucket (explicit total order, not engine whim)
    val odd = tmpEvents((1 to 5).map { i =>
      (i.toLong, ts(1, 6 + i), 1L, "A", i.toDouble, "{}")
    })
    val r1 = ScalarQueries.quantileDiscMode(spark, odd).collect()(0)
    assert(r1.getDouble(1) == 3.0 && r1.getDouble(2) == 3.0, r1.toString)
    val tie = tmpEvents(Seq(
      (1L, ts(1, 6), 1L, "A", 1.0, "{}"), (2L, ts(1, 7), 1L, "A", 1.0, "{}"),
      (3L, ts(1, 8), 1L, "A", 2.0, "{}"), (4L, ts(1, 9), 1L, "A", 2.0, "{}")))
    val r2 = ScalarQueries.quantileDiscMode(spark, tie).collect()(0)
    assert(r2.getLong(3) == 1L, s"tie must break to the smaller bucket: $r2")
    assert(r2.getDouble(1) == 1.5 && r2.getDouble(2) == 1.0, r2.toString)
    // fixture: the discrete median is an actually-observed r4 value
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), graft.functions.Det.r4(col("value")).as("v"))
      .collect().groupBy(_.getString(0))
    ScalarQueries.quantileDiscMode(spark, sf).collect().foreach { r =>
      val vs = byType(r.getString(0)).map(_.getDouble(1)).toSet
      assert(vs.contains(r.getDouble(2)),
        s"${r.getString(0)}: p50_disc ${r.getDouble(2)} not an observed value")
    }
  }

  test("curation_funnel: stages shrink monotonically and pin to the component queries") {
    val f = TextOps.curationFunnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(f.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    f.sliding(2).foreach { case Array((_, n0, t0), (_, n1, t1)) =>
      assert(n1 <= n0 && t1 <= t0, s"funnel grew: $n0/$t0 -> $n1/$t1")
    }
    // stage 1 == the exact-dedup keeper count; stage 2 == the total
    // docs curate_corpus reports (same md5 + q >= 0.3 conventions)
    val keepers = Tables.documents(spark, sf)
      .select(md5(lower(trim(col("text")))).as("h")).distinct().count()
    assert(f(1)._2 == keepers, s"stage 1 ${f(1)._2} != distinct hashes $keepers")
    val curated = TextOps.curateCorpus(spark, sf).collect().map(_.getLong(2)).sum
    assert(f(2)._2 == curated, s"stage 2 ${f(2)._2} != curate_corpus total $curated")
  }

  test("emb_stats: aligned vectors hit resultant 1, antipodal pairs cancel, dead vectors count") {
    import spark.implicits._
    def mk(vs: Seq[Seq[Float]]): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_emb").toString
      vs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val unit = Seq.fill(63)(0.0f) :+ 1.0f
    val same = graft.operators.AnnOps.embStats(spark, mk(Seq.fill(4)(unit))).collect()(0)
    assert(same.getDouble(4) == 1.0, s"aligned resultant ${same.getDouble(4)}")
    assert(same.getDouble(1) == 1.0 && same.getLong(3) == 0L)
    val anti = graft.operators.AnnOps.embStats(
      spark, mk(Seq(unit, unit.map(-_)))).collect()(0)
    assert(anti.getDouble(4) == 0.0, s"antipodal resultant ${anti.getDouble(4)}")
    val dead = graft.operators.AnnOps.embStats(
      spark, mk(Seq(unit, Seq.fill(64)(0.0f)))).collect()(0)
    assert(dead.getLong(3) == 1L, s"dead vector not counted: $dead")
  }

  test("weighted_median_price: weight mass moves the cutover; uniform weights = lower median") {
    import spark.implicits._
    def mkLi(rows: Seq[(Long, Int, Double, Double)]): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_li").toString
      rows.map { case (ok, ln, q, p) =>
        (ok, 1L, 1L, ln, q, p, 0.0, 0.0, "A", "O",
          Timestamp.valueOf("2024-01-01 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
      d
    }
    // weights {1,1,8} on prices {10,20,30}: half-mass 5 → 30 wins
    // (the unweighted median would say 20)
    val heavy = RelationalQueries.weightedMedianPrice(
      spark, mkLi(Seq((1L, 1, 1.0, 10.0), (2L, 1, 1.0, 20.0), (3L, 1, 8.0, 30.0))))
      .collect()(0)
    assert(heavy.getDouble(1) == 30.0 && heavy.getDouble(2) == 10.0, heavy.toString)
    // uniform weights on {1..4}: cutover at half-mass 2 = the LOWER median
    val unif = RelationalQueries.weightedMedianPrice(
      spark, mkLi((1 to 4).map(i => (i.toLong, 1, 1.0, i * 10.0))))
      .collect()(0)
    assert(unif.getDouble(1) == 20.0, unif.toString)
    // fixture: the weighted median is an observed price inside [min, max]
    RelationalQueries.weightedMedianPrice(spark, sf).collect().foreach { r =>
      assert(r.getDouble(1) > 0 && r.getDouble(2) > 0, r.toString)
    }
  }

  test("daily_percentile_bands: ordered quantiles, exact on an 11-point grid") {
    // days 1..11 with daily values 0,10,...,100: (n-1)·q lands on
    // exact indices → p10 = 10, p50 = 50, p90 = 90, band = 80
    val d = tmpEvents((0 to 10).map { i =>
      ((i + 1).toLong, ts(i + 1), 1L, "view", i * 10.0, "{}")
    })
    val r = SliQueries.dailyPercentileBands(spark, d).collect()(0)
    assert(r.getLong(1) == 11L)
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 50.0 && r.getDouble(4) == 90.0,
      r.toString)
    assert(r.getDouble(5) == 80.0, r.toString)
    SliQueries.dailyPercentileBands(spark, sf).collect().foreach { row =>
      assert(row.getDouble(2) <= row.getDouble(3) && row.getDouble(3) <= row.getDouble(4),
        row.toString)
      assert(math.abs(row.getDouble(5) - (row.getDouble(4) - row.getDouble(2))) < 2e-4,
        row.toString)
    }
  }

  test("type_corr_matrix: constructed colinear/anticolinear pairs hit ±1; canonical bounded pairs") {
    // A = day, B = 2·day (r = 1), C = −day (r(A,C) = −1)
    val d = tmpEvents((1 to 10).flatMap { i =>
      Seq((i * 3L, ts(i), 1L, "A", i.toDouble, "{}"),
        (i * 3 + 1L, ts(i), 1L, "B", 2.0 * i, "{}"),
        (i * 3 + 2L, ts(i), 1L, "C", -i.toDouble, "{}"))
    })
    val m = SliQueries.typeCorrMatrix(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(m(("A", "B")) == 1.0 && m(("A", "C")) == -1.0 && m(("B", "C")) == -1.0, m.toString)
    val out = SliQueries.typeCorrMatrix(spark, sf).collect()
    assert(out.length == 10, s"${out.length} pairs != C(5,2)")
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), s"non-canonical pair: $r")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, r.toString)
    }
  }

  test("value_autocorr: linear series has acf1 = acf7 = 1; lag counts drop k days") {
    val d = tmpEvents((1 to 12).map { i =>
      (i.toLong, ts(i), 1L, "A", i.toDouble, "{}")
    })
    val r = SliQueries.valueAutocorr(spark, d).collect()(0)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0, r.toString)
    assert(r.getLong(3) == 11L && r.getLong(4) == 5L, r.toString)
    SliQueries.valueAutocorr(spark, sf).collect().foreach { row =>
      assert(math.abs(row.getDouble(1)) <= 1.0 + 1e-9, row.toString)
      assert(math.abs(row.getDouble(2)) <= 1.0 + 1e-9, row.toString)
    }
  }

  test("label_separation: constructed aligned/antipodal labels hit ±1 exactly") {
    import spark.implicits._
    val e1 = 1.0f +: Seq.fill(63)(0.0f)
    val ne1 = e1.map(-_)
    val d = java.nio.file.Files.createTempDirectory("graft_lsep").toString
    ((1 to 3).map(i => (i.toLong, e1, 0)) ++ (4 to 6).map(i => (i.toLong, ne1, 1)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = graft.operators.AnnOps.labelSeparation(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq((0, 3L, 1.0, -1.0, 2.0), (1, 3L, 1.0, -1.0, 2.0)),
      rows.toSeq.toString)
    // fixture: every mean cosine is a valid cosine
    graft.operators.AnnOps.labelSeparation(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 && math.abs(r.getDouble(3)) <= 1.0, r.toString)
    }
  }

  test("vocab_growth: constructed novelty counts; curve is monotone non-decreasing") {
    val mkDoc = (id: Long, text: String) => (id, text, "en", "srcV", text.length.toLong)
    val d = {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_vg").toString
      Seq(mkDoc(0L, "a b c"), mkDoc(50L, "a b x"), mkDoc(100L, "a b"))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val rows = graft.operators.LlmQueries.vocabGrowth(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc0: "a b","b c" new (2); doc50: only "b x" new (1); doc100: nothing
    assert(rows.toSeq == Seq((0L, 2L, 2L), (1L, 1L, 3L), (2L, 0L, 3L)), rows.toSeq.toString)
    val fix = graft.operators.LlmQueries.vocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(fix.head._1 == fix.head._2, "first bucket vocab != its own novelty")
    fix.sliding(2).foreach { case Array((_, v0), (n1, v1)) =>
      assert(v1 == v0 + n1 && n1 >= 0, s"curve broke: $v0 -> $v1 (+$n1)")
    }
  }

  test("skew_profile: constructed hot key measures exactly; pigeonhole bounds on the fixture") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_skew").toString
    ((1 to 9).map(i => (i.toLong, ts(1, 6), 1L, "view", 1.0, "{}")) :+
      (10L, ts(1, 7), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "A", "O",
      Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq((1L, 1L, "O", 10.0, Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val prof = graft.operators.SkewOps.skewProfile(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val ev = prof("events.user_id")
    assert(ev.getLong(1) == 10L && ev.getLong(2) == 2L && ev.getLong(3) == 9L, ev.toString)
    assert(ev.getDouble(4) == 0.9, s"top1_share ${ev.getDouble(4)}")
    graft.operators.SkewOps.skewProfile(spark, sf).collect().foreach { r =>
      val (rows, keys, top1) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(top1 * keys >= rows, s"${r.getString(0)}: max below mean (pigeonhole)")
      assert(top1 <= rows && keys <= rows, r.toString)
      assert(r.getDouble(4) >= 1.0 / keys - 1e-9 && r.getDouble(5) > 0, r.toString)
    }
  }

  test("revenue_discount_band: constructed bands compute exactly; quantity bound excludes") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_q6").toString
    Seq(
      (1L, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.0, "A", "O", ts(1)),
      (2L, 1L, 1L, 2, 10.0, 200.0, 0.05, 0.0, "A", "O", ts(1)),
      (3L, 1L, 1L, 3, 10.0, 100.0, 0.0, 0.0, "A", "O", ts(1)),
      (4L, 1L, 1L, 4, 25.0, 999.0, 0.05, 0.0, "A", "O", ts(1))) // excluded: qty >= 24
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val rows = RelationalQueries.revenueDiscountBand(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((0L, 1L, 0.0), (5L, 2L, 15.0)), rows.toSeq.toString)
    // fixture: zero-discount band gives back exactly zero revenue
    val fix = RelationalQueries.revenueDiscountBand(spark, sf).collect()
    assert(fix.find(_.getLong(0) == 0L).forall(_.getDouble(2) == 0.0))
  }

  test("orders_backlog: constructed lifecycle; backlog stays non-negative and ends balanced") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_bkl").toString
    Seq((1L, 1L, "O", 10.0, ts(1), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "A", "O", ts(3)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val rows = RelationalQueries.ordersBacklog(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(3)))
    assert(rows.toSeq == Seq(("2024-01-01", 1L), ("2024-01-03", 0L)), rows.toSeq.toString)
    val fix = RelationalQueries.ordersBacklog(spark, sf).collect()
    fix.foreach(r => assert(r.getLong(3) >= 0L, s"negative backlog: $r"))
    val opened = fix.map(_.getLong(1)).sum
    val shipped = fix.map(_.getLong(2)).sum
    assert(fix.last.getLong(3) == opened - shipped, "final backlog != open - shipped")
  }

  test("supplier_hhi: uniform market 1/n, monopoly 1; bounds tie HHI to top-1 share") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Long, Double)]): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_hhi").toString
      rows.zipWithIndex.map { case ((pk, sk, price), i) =>
        ((i + 1).toLong, pk, sk, 1, 1.0, price, 0.0, 0.0, "A", "O", ts(1))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
      Seq((1L, "p one", "Brand#1", "TYPEA", 1, 1.0),
        (2L, "p two", "Brand#1", "TYPEB", 1, 1.0))
        .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .write.mode("overwrite").parquet(s"$d/part.parquet")
      d
    }
    // TYPEA: 4 equal suppliers → HHI 0.25; TYPEB: monopoly → HHI 1
    val d = mk((1L to 4L).map(s => (1L, s, 100.0)) :+ (2L, 9L, 50.0))
    val got = RelationalQueries.supplierHhi(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("TYPEA") == ((4L, 0.25, 0.25)), got("TYPEA").toString)
    assert(got("TYPEB") == ((1L, 1.0, 1.0)), got("TYPEB").toString)
    RelationalQueries.supplierHhi(spark, sf).collect().foreach { r =>
      val (n, hhi, top1) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(hhi >= 1.0 / n - 1e-4 && hhi <= 1.0 + 1e-9, r.toString)
      assert(hhi >= top1 * top1 - 1e-4 && hhi <= top1 + 1e-4, r.toString)
    }
  }

  test("max_gap_minutes: constructed gaps measure exactly; worst dominates the daily mean") {
    val mk = (id: Long, day: Int, hm: (Int, Int)) =>
      (id, Timestamp.valueOf(f"2024-01-0$day ${hm._1}%02d:${hm._2}%02d:00"),
        1L, "view", 1.0, "{}")
    // day 1: gaps 30/30 min → max 30; day 2: one 90-min gap →
    // worst 90, one hour-plus day
    val d = tmpEvents(Seq(
      mk(1L, 1, (6, 0)), mk(2L, 1, (6, 30)), mk(3L, 1, (7, 0)),
      mk(4L, 2, (6, 0)), mk(5L, 2, (7, 30))))
    val r = SliQueries.maxGapMinutes(spark, d).collect()(0)
    assert(r.getLong(1) == 90L, s"worst ${r.getLong(1)}")
    assert(r.getDouble(2) == 60.0, s"avg ${r.getDouble(2)}")
    assert(r.getLong(3) == 1L, s"hour-gap days ${r.getLong(3)}")
    SliQueries.maxGapMinutes(spark, sf).collect().foreach { row =>
      assert(row.getLong(1) >= row.getDouble(2) - 1e-9, row.toString)
    }
  }

  test("quantile_norm_chars: ranks in [0,1], cume_dist ≥ percent_rank, monotone within source") {
    val out = TextOps.quantileNormChars(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    out.foreach { case (id, src, _, pct, cume) =>
      assert(pct >= 0.0 && pct <= 1.0 + 1e-9, s"$src/$id pct=$pct")
      assert(cume > 0.0 && cume <= 1.0 + 1e-9, s"$src/$id cume=$cume")
      // cume = rank/n, pct = (rank−1)/(n−1) → cume − pct = (n−rank)/(n(n−1)) ≥ 0
      assert(cume >= pct - 1e-9, s"$src/$id cume $cume < pct_rank $pct")
    }
    out.groupBy(_._2).foreach { case (src, docs) =>
      val byOrder = docs.sortBy(d => (d._3, d._1)).map(_._4)
      assert(byOrder.sameElements(byOrder.sorted),
        s"$src: percent_rank not monotone in (n_chars, doc_id)")
    }
  }

  test("theilsen_trend_sampled: opening the hash threshold to 2^48 reproduces the exact form") {
    // u48 < 2^48 keeps EVERY pair, so the sampled plan must equal
    // theilsen_trend bit-for-bit (same grid rounding both sides) —
    // the n_pairs column names differ by design; compare the rest.
    val exact = graft.operators.SliQueries.theilsenTrend(spark, sf)
      .select("event_type", "ts_slope", "ts_intercept").collect().toSeq
    val opened = graft.operators.SliQueries
      .theilsenTrendSampled(spark, sf, threshold = 281474976710656L)
      .select("event_type", "ts_slope", "ts_intercept").collect().toSeq
    assert(opened == exact,
      s"opened-threshold sample diverged: $opened vs $exact")
  }

  test("theilsen_trend_sampled: the ~50% subsample estimate stays near the exact slope") {
    // Sen's estimator is a median of a U-statistic — a random half of
    // the pairs moves the median by O(1/sqrt(n_pairs)). The fixture's
    // per-type pair counts (~hundreds) put that well inside 0.5 in
    // slope units; pin that envelope so a sampling-logic regression
    // (wrong key, wrong threshold compare) fails loudly while honest
    // estimator noise passes with margin.
    val exact = graft.operators.SliQueries.theilsenTrend(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val sampled = graft.operators.SliQueries.theilsenTrendSampled(spark, sf)
      .collect()
    assert(sampled.nonEmpty)
    sampled.foreach { r =>
      val t = r.getString(0)
      val d = math.abs(r.getDouble(2) - exact(t))
      assert(d <= 0.5, s"$t: sampled slope off by $d (> 0.5)")
      // and the sample actually sampled: strictly fewer pairs than exact
    }
    val exactPairs = graft.operators.SliQueries.theilsenTrend(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sampled.foreach { r =>
      assert(r.getLong(1) < exactPairs(r.getString(0)),
        s"${r.getString(0)}: sampling kept all pairs")
    }
  }

  test("skyline_parts_2p reproduces skyline_parts exactly (two-phase equivalence)") {
    val one = graft.operators.RelationalQueries.skylineParts(spark, sf)
      .collect().toSeq
    val two = graft.operators.RelationalQueries.skylineParts2p(spark, sf)
      .collect().toSeq
    assert(two == one, s"two-phase skyline diverged: $two vs $one")
  }
}
