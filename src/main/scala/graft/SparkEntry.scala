package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure `(SparkSession, sfDir) =>
  * DataFrame` builder; [[oracleSql]] carries the equivalent DuckDB SQL
  * (SURVEY.md Appendix A, validated) with `{dir}` as the scale-factor
  * directory placeholder — `Verify` resolves it to an absolute path
  * before dumping, so the emitted SQL is directly runnable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SliQueries.sliMinuteDownsample(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 SLI/SLO analytics surface
    "sli_filter_project" -> (SliQueries.sliFilterProject _),
    "sli_minute_downsample" -> (SliQueries.sliMinuteDownsample _),
    "sli_weighted_avg" -> (SliQueries.sliWeightedAvg _),
    "slo_day_report" -> (SliQueries.sloDayReport _),
    "slo_breach_count" -> (SliQueries.sloBreachCount _),
    "slo_compliance_pct" -> (SliQueries.sloCompliancePct _),
    "sli_latest_per_user" -> (SliQueries.sliLatestPerUser _),
    "sli_rolling_7d" -> (SliQueries.sliRolling7d _),
    "sli_sessionize" -> (SliQueries.sliSessionize _),
    "slo_hourly_tumble" -> (SliQueries.sloHourlyTumble _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (`{dir}` = sf directory, resolved by
    * Verify). Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "sli_filter_project" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, round((value) + 2e-5, 2) AS value
        |FROM read_parquet('{dir}/events.parquet')
        |WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |ORDER BY event_id""".stripMargin,
    "sli_minute_downsample" ->
      """SELECT event_type, epoch_ms(date_trunc('minute', ts)) AS minute_ms,
        |       round((avg(value)) + 1e-7, 4) AS avg_value, count(*) AS n
        |FROM read_parquet('{dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sli_weighted_avg" ->
      """SELECT event_type,
        |       round((sum(value * CAST(json_extract_string(props, '$.k') AS BIGINT))
        |             / nullif(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)), 0)) + 1e-7, 4) AS weighted_avg
        |FROM read_parquet('{dir}/events.parquet') GROUP BY 1 ORDER BY 1""".stripMargin,
    "slo_day_report" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |       count(*) AS n, round((avg(value)) + 1e-7, 4) AS avg_value,
        |       round((min(value)) + 2e-5, 2) AS min_value, round((max(value)) + 2e-5, 2) AS max_value,
        |       round((sum(value)) + 2e-5, 2) AS sum_value
        |FROM read_parquet('{dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "slo_breach_count" ->
      """WITH per_min AS (
        |  SELECT event_type, date_trunc('minute', ts) AS m, avg(value) AS v
        |  FROM read_parquet('{dir}/events.parquet') GROUP BY 1, 2)
        |SELECT event_type, count(*) AS minutes,
        |       CAST(sum(CASE WHEN v < 50 OR v > 150 THEN 1 ELSE 0 END) AS BIGINT) AS breaches
        |FROM per_min GROUP BY 1 ORDER BY 1""".stripMargin,
    "slo_compliance_pct" ->
      """WITH per_min AS (
        |  SELECT event_type, date_trunc('minute', ts) AS m, avg(value) AS v
        |  FROM read_parquet('{dir}/events.parquet') GROUP BY 1, 2)
        |SELECT event_type,
        |       round((100.0 * sum(CASE WHEN v >= 50 AND v <= 150 THEN 1 ELSE 0 END) / count(*)) + 1e-7, 4) AS compliance_pct
        |FROM per_min GROUP BY 1 ORDER BY 1""".stripMargin,
    "sli_latest_per_user" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, round((value) + 2e-5, 2) AS value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM read_parquet('{dir}/events.parquet')) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "sli_rolling_7d" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, avg(value) AS v
        |  FROM read_parquet('{dir}/events.parquet') GROUP BY 1, 2)
        |SELECT event_type, day,
        |       round((avg(v) OVER (PARTITION BY event_type ORDER BY day
        |                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) + 1e-7, 4) AS rolling_7d_avg
        |FROM daily ORDER BY event_type, day""".stripMargin,
    "sli_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                   OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM read_parquet('{dir}/events.parquet') WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | sess AS (
        |  SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                   ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT user_id, count(DISTINCT session_id) AS n_sessions,
        |       round((count(*) * 1.0 / count(DISTINCT session_id)) + 1e-7, 4) AS avg_events_per_session
        |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,
    "slo_hourly_tumble" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
        |       count(*) AS n, round((avg(value)) + 1e-7, 4) AS avg_value
        |FROM read_parquet('{dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
