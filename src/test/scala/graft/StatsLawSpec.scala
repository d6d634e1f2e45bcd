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
}
