package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Det.{r2, r4}
import graft.sources.Tables

/** Scalar-function surface (SURVEY.md §2.3, queries #23–#29).
  *
  * Exercises the built-in string / date / math / JSON expression
  * library plus analytic windows — everything stays inside
  * whole-stage codegen (no UDFs anywhere, SURVEY §2.6).
  *
  * Cross-engine parity notes baked in (SURVEY App. B):
  *  - `regexp_extract(_, _, 0)` — Spark's 3-arg default is group 1,
  *    DuckDB's is the full match (group 0).
  *  - `dayofweek(x) - 1` — Spark is 1=Sun..7, DuckDB 0=Sun..6.
  *  - integer outputs cast explicitly where natural widths differ.
  */
object ScalarQueries {

  /** #23 — string functions over part (upper/LIKE/length/regexp/concat/substr). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy(upper(col("p_brand")).as("brand"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("p_name").like("small%"), 1L).otherwise(0L)).as("n_small"),
        max(length(col("p_name"))).cast("long").as("max_name_len"),
        min(regexp_extract(col("p_brand"), "[0-9]+", 0)).as("brand_num"),
        max(concat(col("p_type"), lit(":"), substring(col("p_name"), 1, 3))).as("max_concat"))
      .orderBy("brand")

  /** #24 — date/time functions over orders (year/month/dayofweek/datediff). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).cast("int").as("y"),
        month(col("o_orderdate")).cast("int").as("m"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(dayofweek(col("o_orderdate")) - 1).cast("int").as("min_dow"),
        max(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")))
          .cast("int").as("max_days_since"))
      .orderBy("y", "m")

  /** #25 — math functions over lineitem (round/sqrt/ln/pow/abs).
    * The inner per-row round ALSO gets the Det nudge: price·(1+tax) is
    * a 4-decimal-exact value, so ~1% of rows land exactly on a 2-dp
    * round-half boundary where the two engines' rounding kernels
    * (BigDecimal HALF_UP vs multiply-and-rint) can disagree on the
    * same input bits; the +2e-5 nudge moves every boundary case to an
    * unambiguous side identically in both plans.
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        r2(sum(r2(col("l_extendedprice") * (lit(1) + col("l_tax"))))).as("gross"),
        r4(avg(sqrt(col("l_quantity")))).as("avg_sqrt_qty"),
        r4(avg(log(col("l_extendedprice") + 1))).as("avg_ln_price"),
        r4(max(pow(col("l_discount"), 2))).as("max_disc_sq"),
        r2(sum(abs(col("l_quantity") - 25))).as("sum_abs_dev"))
      .orderBy("l_returnflag")

  /** #26 — JSON path extract + modulo bucketing over the props column.
    * try_cast: a non-numeric `$.k` (dirty JSON) buckets under NULL
    * instead of failing the query under ANSI (DirtyInputSpec).
    */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy((expr("try_cast(get_json_object(props, '$.k') AS BIGINT)") % 10)
        .as("k_bucket"))
      .agg(count(lit(1)).as("n"), r4(avg("value")).as("avg_value"))
      .orderBy("k_bucket")

  /** #48 — JSON → MapType parse + map explode (generator over map
    * entries): per (event_type, json key) stats. Covers `from_json`
    * with MapType schema and the map-entry explode path — at scale
    * this is the schema-on-read shape for ragged JSON payloads where
    * a fixed struct schema can't be pinned.
    */
  def propsMapAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        explode(from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
          .as(Seq("key", "kv")))
      .groupBy("event_type", "key")
      .agg(
        count(lit(1)).as("n"),
        r4(avg("kv")).as("avg_k"),
        max("kv").as("max_k"))
      .orderBy("event_type", "key")

  /** #49 — explicit GROUPING SETS with grouping_id: the mixed-set
    * variant rollup/cube can't express (region-only and type-only
    * slices plus grand total in one Expand pass). Via temp-view SQL
    * for the same ambiguity reason as #18.
    */
  def groupingSetsMix(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .createOrReplaceTempView("graft_gs_events")
    // two-phase (see rollupRegionNation): Expand runs over the
    // (event_type, day) pre-aggregate, not the fact rows; avg
    // decomposes to sum(s)/sum(c)
    spark.sql(
      """WITH pre AS (
        |  SELECT event_type, day, count(*) AS c, sum(value) AS s
        |  FROM graft_gs_events GROUP BY event_type, day)
        |SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(CAST(day AS STRING), 'ALL') AS day,
        |       CAST(grouping_id(event_type, day) AS BIGINT) AS gid,
        |       sum(c) AS n,
        |       round(sum(s) / sum(c) + 1e-7, 4) AS avg_value
        |FROM pre
        |GROUP BY GROUPING SETS ((event_type), (day), ())
        |ORDER BY gid, event_type, day""".stripMargin)
  }

  /** #27 — exact interpolated percentiles p50/p90/p99 per type.
    * Spark `percentile` and DuckDB `quantile_cont` are both
    * linear-interpolation by spec (agreement verified by the t2 diff).
    */
  def percentileValue(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        r4(expr("percentile(value, 0.5)")).as("p50"),
        r4(expr("percentile(value, 0.9)")).as("p90"),
        r4(expr("percentile(value, 0.99)")).as("p99"))
      .orderBy("event_type")

  /** #50 — approximate percentiles (rows-only; spec-bounded): the
    * sketch path for #27. Exact `percentile` buffers every value per
    * group; `percentile_approx` (Greenwald-Khanna) is a bounded-size
    * MERGEABLE sketch — at 100 TB the only viable shape, and the
    * third sketch family here next to HLL (#distinct_hll) and MinHash
    * (#source_overlap). Accuracy 10000 ⇒ rank error ≲ 0.01%;
    * ApproxPercentileSpec bounds it against #27.
    */
  def percentileApproxValue(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        r4(expr("percentile_approx(value, 0.5, 10000)")).as("p50"),
        r4(expr("percentile_approx(value, 0.9, 10000)")).as("p90"),
        r4(expr("percentile_approx(value, 0.99, 10000)")).as("p99"))
      .orderBy("event_type")

  /** #71 — distribution windows: `ntile(4)` quartile buckets per
    * event_type over a TOTAL order (value, event_id — ties broken so
    * both engines bucket identically), with `percent_rank` and
    * `cume_dist` read out at each quartile's edge.
    *
    * SEMANTICS are the window functions' (the oracle literally runs
    * `ntile/percent_rank/cume_dist OVER (PARTITION BY event_type
    * ORDER BY value, event_id)`), but the PLAN is not a raw-grain
    * window: event_type has ~5 values, so `Window.partitionBy(
    * event_type)` over the raw events table sorts ~corpus/5 rows in
    * ONE task per type — the r5-verdict finding this query carried.
    * Instead the readouts are DERIVED from a (type, value)-grain
    * histogram:
    *
    *  - under the total (value, event_id) order, rank ==
    *    row_number, so `percent_rank = (rn−1)/(N−1)` and
    *    `cume_dist = rn/N`; each quartile's max is taken at its last
    *    position `q_end`, a pure function of the per-type row count
    *    N (ntile gives the first N mod 4 buckets ⌈N/4⌉ rows, the
    *    rest ⌊N/4⌋) — bit-identical to the engines' own division;
    *  - a value group occupying positions [cum−cnt+1, cum] (cum =
    *    running count in value order, via [[PrefixOps.prefixSumBy]]'s
    *    sliced two-pass — no per-type single-task sort) contributes
    *    `overlap` rows to each quartile range it straddles, so
    *    per-quartile n and avg(value) fall out of a (type, quartile)
    *    re-agg; tied rows are interchangeable w.r.t. value, so which
    *    event_ids land where cannot affect any output.
    *
    * Scale: the histogram agg collapses map-side; prefixSumBy's
    * frames are slice-local or (|types|×P)-bounded; the 4-row-per-
    * type quartile frame broadcasts. Nothing sorts more than one
    * slice in one task. A single degenerate-N guard (N=1 ⇒
    * percent_rank 0, the window functions' own convention) replaces
    * the engines' implicit behavior.
    */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("cnt"))
    val hc = PrefixOps.prefixSumBy(h, "event_type", "value", "cnt", "cum")
    val quarts = h.groupBy("event_type").agg(sum("cnt").as("n_total"))
      .select(col("event_type"), col("n_total"),
        explode(expr("sequence(1L, 4L)")).as("quartile"))
      .withColumn("__base", expr("n_total div 4"))
      .withColumn("__rem", col("n_total") % 4)
      .withColumn("q_end",
        col("quartile") * col("__base") + least(col("quartile"), col("__rem")))
      .withColumn("q_start",
        (col("quartile") - 1) * col("__base") +
          least(col("quartile") - 1, col("__rem")) + 1)
      .drop("__base", "__rem")
    hc.withColumn("lo", col("cum") - col("cnt") + 1)
      .join(broadcast(quarts), Seq("event_type"))
      .filter(col("cum") >= col("q_start") && col("lo") <= col("q_end"))
      .withColumn("overlap",
        least(col("cum"), col("q_end")) - greatest(col("lo"), col("q_start")) + 1)
      .groupBy("event_type", "quartile")
      .agg(
        sum("overlap").as("n"),
        r4(sum(col("value") * col("overlap")) / sum("overlap")).as("avg_value"),
        r4(max(when(col("n_total") === 1, lit(0.0)).otherwise(
          (col("q_end") - 1).cast("double") / (col("n_total") - 1))))
          .as("max_prank"),
        r4(max(col("q_end").cast("double") / col("n_total"))).as("max_cume"))
      .orderBy("event_type", "quartile")
  }

  /** #78 — the VARIANT semi-structured path (Spark 4 `parse_json` /
    * `variant_get`, full oracle): props parsed ONCE to the binary
    * variant encoding, then typed extraction. Same answer as the
    * string-path #26/#48 twins, different engine machinery — at
    * 100 TB the variant column is what you'd STORE at ingest
    * (parse once, read many; typed extraction skips re-tokenizing
    * the JSON text per query, and shredding can push the `$.k` read
    * into the scan), so the engine must speak it.
    *
    * Dirty-input policy (DirtyInputSpec): `try_parse_json` +
    * `try_variant_get`, not the plain forms — plain parse THROWS on
    * malformed JSON and plain variant_get THROWS on an uncastable
    * value (e.g. `{"k":"notanum"}`), so one broken props row would
    * fail the whole query at corpus scale. A broken row nulls out
    * (`k` null, still counted in `n`, excluded from avg/distinct/high
    * like every other null-k row) — identical to the get_json_object
    * twins' semantics.
    */
  def propsVariantStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        try_variant_get(try_parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        r4(avg("k")).as("avg_k"),
        countDistinct(col("k")).as("n_distinct_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
      .orderBy("event_type")

  /** #79 — SQL-defined functions (Spark 4 `CREATE FUNCTION … RETURN`,
    * full oracle): the breach predicate and burn formula declared as
    * reusable SQL UDFs and used in an aggregation. Unlike a JVM/
    * Python UDF, a SQL UDF is INLINED by Catalyst — the optimized
    * plan is the plain CASE expression (whole-stage codegen, pushdown
    * and column pruning all survive; PlanAuditSpec's codegen gate
    * covers this query like any other), so this is the extensibility
    * mechanism that costs nothing at 100 TB.
    */
  def sqlUdfSlo(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.GraftCatalog.registerTables(spark, dir, prefix = "graft_")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_is_breach(v DOUBLE)
        |RETURNS BOOLEAN RETURN v < 50 OR v > 150""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_burn(breaches BIGINT, n BIGINT)
        |RETURNS DOUBLE RETURN breaches / CAST(n AS DOUBLE) / 0.01""".stripMargin)
    // round() applied OUTSIDE the aggregate select: inlining the UDF
    // inside round() trips Spark's foldable-scale check (the literal 4
    // gets hoisted into the Aggregate and stops being foldable)
    spark.sql(
      """SELECT event_type, n, breaches, round(burn0 + 1e-7, 4) AS burn
        |FROM (
        |  SELECT event_type, count(*) AS n,
        |         sum(CASE WHEN graft_is_breach(value) THEN 1 ELSE 0 END) AS breaches,
        |         graft_burn(
        |           sum(CASE WHEN graft_is_breach(value) THEN 1 ELSE 0 END),
        |           count(*)) AS burn0
        |  FROM graft_events GROUP BY 1) t
        |ORDER BY event_type""".stripMargin)
  }

  /** #81 — ANSI-safe arithmetic (`try_divide` / `try_cast`, full
    * oracle): Spark 4 runs ANSI mode by default, where a divide-by-
    * zero THROWS — the `try_*` family is the per-row-safe form that
    * yields NULL instead, which is the only acceptable behavior when
    * one bad row 90% through a 100 TB job must not kill it. The
    * oracle mirrors with explicit CASE guards (the semantics, not the
    * spelling, are the contract).
    */
  def tryFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
      .withColumn("ratio", try_divide(col("value"), (col("k") - 50).cast("double")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("k") === 50, 1L).otherwise(0L)).as("n_zero_denom"),
        count(col("ratio")).as("n_ok"),
        r4(avg("ratio")).as("avg_ratio"))
      .orderBy("event_type")

  /** #82 — the statistical-moment aggregate family (full oracle):
    * stddev_samp / skewness / kurtosis / median / corr / covar_samp
    * per event_type. Cross-engine subtlety, pinned by the hash gate:
    * Spark's skewness/kurtosis are the POPULATION estimators
    * (g1 = m3/m2^1.5, g2 = m4/m2² − 3 over 1/n central moments) while
    * DuckDB's built-ins are bias-corrected sample estimators — so the
    * oracle derives Spark's definitions from raw central moments
    * instead of calling DuckDB's skewness()/kurtosis(). corr and
    * covar_samp agree natively; median = quantile_cont(0.5) parity is
    * the #27 result.
    */
  def distMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        // try_cast: dirty `$.k` nulls out of corr/covar instead of
        // failing the query under ANSI (DirtyInputSpec)
        expr("try_cast(get_json_object(props, '$.k') AS DOUBLE)").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        r4(stddev_samp(col("value"))).as("sd"),
        r4(skewness(col("value"))).as("skew"),
        r4(kurtosis(col("value"))).as("kurt"),
        r4(median(col("value"))).as("med"),
        r4(corr(col("value"), col("k"))).as("corr_vk"),
        r4(covar_samp(col("value"), col("k"))).as("covar_vk"))
      .orderBy("event_type")

  /** #83 — ordered string aggregation (`listagg … WITHIN GROUP`,
    * new in Spark 4; full oracle vs DuckDB `string_agg … ORDER BY`):
    * the report-rendering aggregate (comma-joined member lists). The
    * WITHIN GROUP order is what makes a string aggregate
    * deterministic at all — unordered listagg is a hash-gate landmine
    * on any distributed engine. (The dedup happens in a subquery:
    * `listagg(DISTINCT …) WITHIN GROUP` beside a second DISTINCT
    * aggregate trips Spark 4.1's distinct-rewrite with a SortOrder
    * cast error — the pre-deduped two-phase form is also the better
    * plan, one expand fewer.)
    */
  def listaggSources(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.GraftCatalog.registerTables(spark, dir, prefix = "graft_")
    spark.sql(
      """SELECT lang, count(*) AS n_sources,
        |       listagg(source, ',') WITHIN GROUP (ORDER BY source) AS sources
        |FROM (SELECT DISTINCT lang, source FROM graft_documents)
        |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** #28 — first-difference of the series via lag (burn-rate style).
    *
    * Deltas are defined WITHIN (event_type, day), not per type
    * globally: a sequence statistic only partitions if its key does
    * (the [[graft.operators.SliQueries.interarrivalStats]]
    * discipline — event_type alone has ~5 values, so the per-type
    * form sorts ~corpus/5 rows in one task at scale, the r5-verdict
    * finding). The (type, day) key re-partitions with the calendar
    * at the cost of one documented lost delta per type per day
    * boundary (first row of each day has no prior row in its
    * partition), pinned by WindowRekeySpec's constructed midnight
    * fixture; the oracle keys identically.
    */
  def windowLagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("delta", col("value") - lag("value", 1).over(w))
      .groupBy("event_type")
      .agg(
        count(col("delta")).as("n_deltas"),
        r4(avg(abs(col("delta")))).as("avg_abs_delta"))
      .orderBy("event_type")
  }

  /** #29 — 4-row moving average over the minute series, then min/max. */
  def movingAvgRows(spark: SparkSession, dir: String): DataFrame = {
    val minute = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
      .agg(avg("value").as("v"))
    val w = Window.partitionBy("event_type").orderBy("minute").rowsBetween(-3, 0)
    minute
      .select(col("event_type"), avg("v").over(w).as("mv"))
      .groupBy("event_type")
      .agg(r4(max("mv")).as("max_moving_avg"), r4(min("mv")).as("min_moving_avg"))
      .orderBy("event_type")
  }

  /** `hist_buckets` — equi-width value histogram per event_type (full
    * oracle): fixed [0, 200) range, width-10 buckets with clamp
    * (`least(greatest(floor(v/10), 0), 19)`), per-bucket count + mean.
    * The distribution profile behind the percentile queries (#27/#50)
    * — fixed bounds make it a single-scan GROUP BY with map-side
    * partial agg and an O(types×20) result at any corpus size, where
    * a data-dependent min/max width would cost a second pass.
    * Bucketing arithmetic is identical IEEE ops in both engines, so
    * edge values land deterministically.
    */
  def histBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        col("event_type"),
        least(greatest(floor(col("value") / 10), lit(0)), lit(19))
          .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), r4(avg("value")).as("avg_value"))
      .orderBy("event_type", "bucket")

  /** `mad_robust` — robust dispersion statistics per event_type (full
    * oracle): exact median, MAD (median absolute deviation from the
    * median), and IQR over raw values. The outlier-resistant
    * complement of `dist_moments` — stddev/skewness are dominated by
    * tail events; a latency SLO dashboard wants MAD/IQR, which a
    * single corrupted batch cannot move.
    *
    * Two-pass by necessity (MAD nests a median inside a median):
    * per-type medians → O(types) table broadcast back → deviations
    * aggregated in one more pass. Parity: Spark `percentile` and
    * DuckDB `median`/`quantile_cont` both linearly interpolate
    * (established at #27); the oracle computes the inner median with
    * a window to stay single-statement.
    *
    * Scale: exact per-group percentiles buffer the group's values
    * (ObjectHashAggregate) — the honest cost of EXACT order
    * statistics. This is the bounded-cardinality exact lane (5 types
    * here); at 100 TB per-group sizes, swap both medians for the GK
    * plane (`percentile_approx_value` / QuantileRollup) — MAD's
    * structure (center broadcast + one deviation pass) is unchanged.
    */
  def madRobust(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val med = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    events.join(broadcast(med), Seq("event_type"))
      .groupBy("event_type")
      .agg(
        r4(first("med")).as("median_value"),
        r4(expr("percentile(abs(value - med), 0.5)")).as("mad"),
        r4(expr("percentile(value, 0.75) - percentile(value, 0.25)"))
          .as("iqr"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** `bitbool_aggs` — bitwise + boolean aggregate surface per
    * event_type (full oracle): `bit_and`/`bit_or`/`bit_xor` over
    * user_id and `bool_and`/`bool_or` over value predicates. The
    * bit-plane fold is how compact permission masks / feature flags /
    * bitmap shards aggregate without exploding to booleans; bool_*
    * is the ALL/ANY quantifier as an aggregate.
    *
    * Determinism: bitwise AND/OR/XOR and boolean AND/OR are
    * commutative+associative on integers — NO floating-point anywhere,
    * so results are bit-identical under any partitioning and need no
    * Det rounding. The value predicates compare against exact decimal
    * literals on the fixture's 2-dp grid.
    *
    * Scale: all five are algebraic single-word accumulators with
    * map-side partial agg — the cheapest aggregate shape there is;
    * O(types) output at any corpus size.
    */
  def bitboolAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        bit_and(col("user_id")).as("uid_bit_and"),
        bit_or(col("user_id")).as("uid_bit_or"),
        bit_xor(col("user_id")).as("uid_bit_xor"),
        bool_and(col("value") >= 0.0).as("all_nonneg"),
        bool_or(col("value") > 99.0).as("any_over_99"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** `quantile_disc_mode` — the discrete location statistics beside
    * the continuous ones (full oracle): interpolated median
    * (`percentile_cont`), the DISCRETE median (`percentile_disc` —
    * an actually-observed value, what "typical latency" should quote),
    * and the distribution mode over the integer value grid. Mode is
    * DELIBERATELY not Spark's `mode()` / DuckDB's `mode()` — both
    * leave ties unspecified; here it's an explicit argmax under the
    * total order (count DESC, bucket ASC), deterministic in both
    * engines by construction.
    *
    * Scale: the mode lane is a two-phase (type, bucket) count + a
    * rank-1 window on the bounded bucket grid (WindowGroupLimit
    * prunes map-side); the exact percentiles buffer per-group values
    * — bounded-type-cardinality lane, with the documented GK-sketch
    * swap past that (same contract as `percentile_value`).
    */
  def quantileDiscMode(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val q = ev.groupBy("event_type")
      .agg(
        r4(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)")).as("p50_cont"),
        r4(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")).as("p50_disc"),
        count(lit(1)).as("n"))
    val md = ev
      .select(col("event_type"), round(col("value")).cast("long").as("b"))
      .groupBy("event_type", "b").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("c").desc, col("b"))))
      .where(col("rn") === 1)
      .select(col("event_type"), col("b").as("mode_value"))
    q.join(broadcast(md), "event_type")
      .select(col("event_type"), col("p50_cont"), col("p50_disc"),
        col("mode_value"), col("n"))
      .orderBy("event_type")
  }

  /** `dq_profile` — per-column data-quality profile of the orders
    * table (full oracle): null count, exact distinct count, and a
    * numeric min/max per column (numerics as doubles, dates as epoch
    * days, varchar min/max declared NULL — a typed profile schema
    * beats stringified min/max, whose double→string formatting is
    * engine-specific). The ingest-gate report every pipeline runs
    * before trusting a new drop: schema drift, null blowups, and
    * cardinality collapse all surface here first.
    *
    * Scale: one pass for the null/min/max lanes plus one narrow
    * single-column two-phase distinct per profiled column (r11 —
    * replacing the 6× Expand multi-distinct lowering whose wide
    * partial-agg rows spilled 31.7 GB at sf30; see the body comment);
    * at 100 TB the profile swaps exact distinct for the HLL sketch
    * plane (`approx_count_distinct` / SketchAgg) with the same report
    * schema — profiling is diagnostics, where ±2% is the accepted
    * trade everywhere. The wide→long pivot is `stack` over ONE
    * assembled row — no second scan.
    */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    // r11 (the r10 verdict's item #5, guide §5): the six exact
    // `count(distinct)`s used to plan as ONE Expand-based aggregate —
    // rows ×6 through a partial agg whose per-task hash map keys on
    // (gid, all six value slots), a wide UnsafeRow per group. On the
    // near-unique columns (orderkey/custkey/totalprice) partial
    // aggregation reduces nothing, so at sf30 the map overflowed into
    // sort-based fallback: 31.7 GB of spill for a profile query.
    // Replaced with SIX per-column two-phase distincts — each one
    // scans a single pruned column, partial-dedups 8-byte values
    // (narrow map entries, and the low-cardinality columns collapse
    // map-side entirely), exchanges only the distinct values, and
    // counts — crossJoin-broadcast back onto the one-pass
    // null/min/max row. Same schema, same values (count of distinct
    // non-null values per column, exactly what countDistinct
    // computes); the oracle hash certifies. dq_profile_hll keeps the
    // one-pass [[dqProfileWith]] plan (a sketch buffer per column —
    // no Expand, nothing to split).
    val o = Tables.orders(spark, dir)
    val epochDay = (c: Column) => datediff(to_date(c), lit("1970-01-01").cast("date"))
    val profiled: Seq[(String, Column)] = Seq(
      ("o_orderkey", col("o_orderkey").cast("double")),
      ("o_custkey", col("o_custkey").cast("double")),
      ("o_orderstatus", lit(null).cast("double")),
      ("o_totalprice", col("o_totalprice")),
      ("o_orderdate", epochDay(col("o_orderdate")).cast("double")),
      ("o_orderpriority", lit(null).cast("double")))
    val aggs = profiled.zipWithIndex.flatMap { case ((name, num), i) =>
      Seq(
        sum(when(col(name).isNull, 1L).otherwise(0L)).as(s"nn$i"),
        r4(min(num)).as(s"mn$i"),
        r4(max(num)).as(s"mx$i"))
    }
    val one = o.agg(aggs.head, aggs.tail: _*)
    val withNd = profiled.zipWithIndex.foldLeft(one) { case (acc, ((name, _), i)) =>
      acc.crossJoin(broadcast(
        o.select(col(name)).where(col(name).isNotNull).distinct()
          .agg(count(lit(1)).as(s"nd$i"))))
    }
    val stackArgs = profiled.zipWithIndex
      .map { case ((name, _), i) => s"'$name', nn$i, nd$i, mn$i, mx$i" }
      .mkString(", ")
    withNd.selectExpr(s"stack(${profiled.size}, $stackArgs) " +
        "as (col_name, n_null, n_distinct, min_num, max_num)")
      .orderBy("col_name")
  }

  /** One-pass profile body with a pluggable distinct aggregate —
    * since r11 used only by the HLL variant
    * ([[ScaleVariants.dqProfileHll]]), whose sketch buffers aggregate
    * all six columns in a single pass with no Expand (the exact twin
    * above splits per column instead — see its body comment).
    */
  private[operators] def dqProfileWith(spark: SparkSession, dir: String,
      distinctAgg: Column => Column): DataFrame = {
    val o = Tables.orders(spark, dir)
    val epochDay = (c: Column) => datediff(to_date(c), lit("1970-01-01").cast("date"))
    // (name, numeric view or null for varchar)
    val profiled: Seq[(String, Column)] = Seq(
      ("o_orderkey", col("o_orderkey").cast("double")),
      ("o_custkey", col("o_custkey").cast("double")),
      ("o_orderstatus", lit(null).cast("double")),
      ("o_totalprice", col("o_totalprice")),
      ("o_orderdate", epochDay(col("o_orderdate")).cast("double")),
      ("o_orderpriority", lit(null).cast("double")))
    val aggs = profiled.zipWithIndex.flatMap { case ((name, num), i) =>
      Seq(
        sum(when(col(name).isNull, 1L).otherwise(0L)).as(s"nn$i"),
        distinctAgg(col(name)).as(s"nd$i"),
        r4(min(num)).as(s"mn$i"),
        r4(max(num)).as(s"mx$i"))
    }
    val one = o.agg(aggs.head, aggs.tail: _*)
    val stackArgs = profiled.zipWithIndex
      .map { case ((name, _), i) => s"'$name', nn$i, nd$i, mn$i, mx$i" }
      .mkString(", ")
    one.selectExpr(s"stack(${profiled.size}, $stackArgs) " +
        "as (col_name, n_null, n_distinct, min_num, max_num)")
      .orderBy("col_name")
  }

  /** `benford_digits` — leading-digit distribution of order totals
    * vs Benford's law `log10(1 + 1/d)` (full oracle): the classic
    * fabricated-or-truncated-amounts screen (Newcomb 1881 / Benford
    * 1938, public knowledge) and a one-glance DQ monitor for any
    * money column — synthetic uniform data like this fixture FAILS
    * Benford visibly, which is exactly the kind of distribution-shape
    * fact dq_profile's null/min/max readout can't see.
    *
    * Digit extraction goes through the EXACT integer cents
    * (`cast(round(price*100) as long)` → first character), never
    * `floor(log10(x))` — log10 of an exact power of 10 lands 1 ulp
    * under its true value in both engines, which would misbin every
    * 100.00/1000.00-style amount. Plan: scan-side digit projection
    * into a ≤9-row hash agg; the grand total re-joins as a
    * single-row broadcast. One corpus pass.
    */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .select(substring(round(col("o_totalprice") * 100)
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("tot"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        r4(col("n") / col("tot")).as("obs_share"),
        r4(log10(lit(1.0) + lit(1.0) / col("digit"))).as("benford_share"),
        r4(abs(col("n") / col("tot") -
          log10(lit(1.0) + lit(1.0) / col("digit")))).as("abs_dev"))
      .orderBy("digit")
  }

  /** `ks_value_test` — two-sample Kolmogorov–Smirnov test on the
    * 'error' vs 'click' value distributions (full oracle): the
    * supremum ECDF gap D, the scaled statistic λ = D·√(n_a·n_b/n),
    * and the asymptotic p-value via the first five terms of the
    * Kolmogorov series 2·Σ (−1)^{k−1} e^{−2k²λ²} (Kolmogorov 1933 /
    * Smirnov 1948, public knowledge) — the distribution-SHAPE
    * companion to mwu_value_test's location test: a variance change
    * with equal medians moves D, not U.
    *
    * Same value-DOMAIN histogram plane as MWU: both ECDFs are
    * inclusive prefix counts over distinct values (ties collapse
    * correctly by construction — the ECDF gap is evaluated AT each
    * distinct value), so D is a max over exact-count ratios —
    * bit-parity across engines; the five-term series is identical
    * literal arithmetic on both sides. One corpus scan, one bounded
    * window, single-row output.
    */
  def ksValueTest(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .filter(col("event_type").isin("error", "click"))
      .groupBy("value")
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("na"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nb"))
    val tot = hist.agg(sum("na").as("n_a"), sum("nb").as("n_b"))
    val w = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = hist
      .withColumn("cna", sum("na").over(w))
      .withColumn("cnb", sum("nb").over(w))
      .crossJoin(broadcast(tot))
      .agg(
        max(abs(col("cna") / col("n_a") - col("cnb") / col("n_b")))
          .as("d"),
        max("n_a").as("n_a"), max("n_b").as("n_b"))
      .withColumn("lambda",
        col("d") * sqrt(col("n_a") * col("n_b") / (col("n_a") + col("n_b"))))
    val p = (1 to 5).map { k =>
      lit(if (k % 2 == 1) 2.0 else -2.0) *
        exp(lit(-2.0 * k * k) * col("lambda") * col("lambda"))
    }.reduce(_ + _)
    d.select(col("n_a"), col("n_b"), r4(col("d")).as("d_stat"),
      r4(col("lambda")).as("lambda"),
      r4(least(lit(1.0), greatest(lit(0.0), p))).as("p_approx"))
  }

  /** `mwu_value_test` — tie-corrected Mann–Whitney U test comparing
    * the VALUE distributions of 'error' vs 'click' events (full
    * oracle): U, the normal-approximation z, and the rank-biserial
    * effect size. The nonparametric companion to ab_test_conversion's
    * proportion z-test — it detects distributional location shifts a
    * mean compare misses under the fixture's skewed (exponential)
    * values, with no normality assumption (Mann & Whitney 1947,
    * public knowledge).
    *
    * Everything derives from the VALUE-DOMAIN histogram (the
    * ship_latency lesson): per distinct value, counts in each arm;
    * average ranks from the exclusive prefix count (ties share the
    * midrank), so the rank sum is Σ n_a(v)·avgrank(v) — exact integer
    * /half-integer arithmetic until the final sqrt, bit-parity across
    * engines by construction. Tie correction Σ(t³−t) folds over the
    * same frame. No corpus-grain rank window, no sort of raw events:
    * the one unpartitioned window runs on the domain-bounded
    * histogram (pinned); output is a single row.
    */
  def mwuValueTest(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .filter(col("event_type").isin("error", "click"))
      .groupBy("value")
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("na"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nb"))
    val w = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("t", col("na") + col("nb"))
      .withColumn("below", coalesce(sum(col("na") + col("nb")).over(w), lit(0L)))
      .withColumn("avgrank", col("below") + (col("t") + 1L) / lit(2.0))
    val s = ranked.agg(
      sum("na").as("n_a"), sum("nb").as("n_b"),
      sum(col("na") * col("avgrank")).as("ra"),
      // double, not long: Σt³ can pass 2^63 on a 100-TB value domain
      sum(col("t").cast("double") * col("t") * col("t") - col("t"))
        .as("tie3"))
    s.select(col("n_a"), col("n_b"),
        (col("ra") - col("n_a") * (col("n_a") + 1L) / lit(2.0)).as("u"),
        (col("n_a") + col("n_b")).as("n"), col("tie3"))
      .select(col("n_a"), col("n_b"), r2(col("u")).as("u_stat"),
        r4((col("u") - col("n_a") * col("n_b") / lit(2.0)) /
          sqrt(col("n_a") * col("n_b") / lit(12.0) *
            ((col("n") + 1L) - col("tie3") /
              (col("n") * (col("n") - 1L))))).as("z_score"),
        r4(lit(2.0) * col("u") / (col("n_a") * col("n_b")) - 1.0)
          .as("rank_biserial"))
  }

  /** `anova_value_test` — one-way ANOVA F test of value across ALL
    * event types (full oracle): F, η² effect size, and the between/
    * within sums of squares (Fisher 1925, public knowledge) — the
    * k-group parametric companion to mwu_value_test's two-group rank
    * test: "do ANY of the k arms differ in mean?" in one statistic
    * instead of k² pairwise z-tests.
    *
    * Everything derives from per-type sufficient statistics (n, Σv,
    * Σv²) — one 2-phase hash agg to a |types|-row frame, then a
    * single-row fold: SSB = Σsᵢ²/nᵢ − s²/n, SSW = Σ(qᵢ − sᵢ²/nᵢ).
    * No second pass over the corpus (the textbook Σ(v−m̄)² form needs
    * the mean first). Sufficient stats accumulate on the exact
    * CENTI-grid (round(v·100) as int64 — the 2-dp fixture grid), so
    * the corpus-size sums are exact integers on both engines and the
    * only float work is the 5-row fold — cross-engine parity by
    * construction, not by epsilon luck. Σiv and Σiv² accumulate as
    * decimal(38,0) (DuckDB: HUGEINT — its 128-bit twin), so they stay
    * EXACT far past int64: a long sum would wrap silently once
    * per-type Σ(v·100)² passes ~9.2e18 (~1e6 rows at iv ≈ 1e6), and
    * the two engines would diverge with Spark silently wrong. The
    * one double conversion per sum happens AFTER aggregation —
    * deterministic, order-independent. Scales: the corpus is touched
    * exactly once and the fold input is enum-bounded.
    */
  def anovaValueTest(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("iv"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("ni"),
        sum(col("iv").cast("decimal(38,0)")).as("si"),
        sum(col("iv").cast("decimal(38,0)") * col("iv")).as("qi"))
    per.select(col("ni").cast("double").as("ni"),
        col("si").cast("double").as("si"), col("qi").cast("double").as("qi"))
      .agg(count(lit(1)).as("k"), sum("ni").as("n"), sum("si").as("s"),
        sum(col("si") * col("si") / col("ni")).as("ssbr"),
        sum(col("qi") - col("si") * col("si") / col("ni")).as("ssw_raw"))
      .select(col("k"), col("n").cast("long").as("n"),
        ((col("ssbr") - col("s") * col("s") / col("n")) / lit(1.0e4))
          .as("ssb"),
        (col("ssw_raw") / lit(1.0e4)).as("ssw"),
        col("k").cast("double").as("kd"), col("n").as("nd"))
      .select(col("k"), col("n"),
        r2(col("ssb")).as("ss_between"), r2(col("ssw")).as("ss_within"),
        r4((col("ssb") / (col("kd") - 1.0)) /
          (col("ssw") / (col("nd") - col("kd")))).as("f_stat"),
        r4(col("ssb") / (col("ssb") + col("ssw"))).as("eta_sq"))
  }

  /** `kruskal_value_test` — tie-corrected Kruskal–Wallis H across ALL
    * event types (full oracle): the rank-based k-group omnibus test
    * (Kruskal & Wallis 1952, public knowledge) — anova_value_test's
    * nonparametric twin, robust to the fixture's exponential skew,
    * and the k-group generalization of mwu_value_test.
    *
    * Same value-DOMAIN histogram plane as MWU (the ship_latency
    * lesson): per distinct value, one count per arm; midranks from
    * the exclusive prefix count over the domain-bounded histogram (the
    * one unpartitioned window — pinned); Rᵢ = Σ nᵢ(v)·avgrank(v) and
    * the tie term Σ(t³−t) fold over the same frame. H = (12/(n(n+1)))
    * ·ΣRᵢ²/nᵢ − 3(n+1), divided by C = 1 − Σ(t³−t)/(n³−n). Exact
    * integer/half-integer arithmetic until the final division —
    * bit-parity across engines by construction. The corpus never
    * sorts; only the value domain does.
    */
  def kruskalValueTest(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val arms = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val hist = Tables.events(spark, dir)
      .groupBy("value")
      .agg(arms.head, arms.tail: _*)
    val w = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("t", types.map(t => col(s"n_$t")).reduce(_ + _))
      .withColumn("below", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("avgrank", col("below") + (col("t") + 1L) / lit(2.0))
    val folds = types.map(t => sum(col(s"n_$t")).as(s"cnt_$t")) ++
      types.map(t => sum(col(s"n_$t") * col("avgrank")).as(s"r_$t")) :+
      sum(col("t").cast("double") * col("t") * col("t") - col("t"))
        .as("tie3")
    val s = ranked.agg(folds.head, folds.tail: _*)
    val n = types.map(t => col(s"cnt_$t")).reduce(_ + _)
    val rterm = types.map(t =>
      col(s"r_$t") * col(s"r_$t") / col(s"cnt_$t")).reduce(_ + _)
    s.select(n.as("n"), rterm.as("rr"), col("tie3"))
      .select(col("n"),
        ((lit(12.0) / (col("n") * (col("n") + 1L))) * col("rr") -
          lit(3.0) * (col("n") + 1L)).as("h_raw"),
        (lit(1.0) - col("tie3") /
          (col("n").cast("double") * col("n") * col("n") - col("n")))
          .as("c"))
      .select(col("n"), r4(col("h_raw") / col("c")).as("h_stat"),
        // ε² effect size (Kelley 1935): H/((n²−1)/(n+1)) = H/(n−1)
        r4(col("h_raw") / col("c") / (col("n") - 1L)).as("eps_sq"))
  }

  /** `spearman_value_hour` — Spearman rank correlation between
    * hour-of-day and value over error events (full oracle): ρ with
    * midranks and the t-approximation statistic (Spearman 1904,
    * public knowledge) — "does latency depend on time of day?" as a
    * MONOTONE-association test, where type_corr_matrix's Pearson
    * sees only linear structure.
    *
    * No corpus-grain rank window and no per-row rank join: both
    * marginals are midranked on BOUNDED frames (hour: 24 rows;
    * value: the 2-dp domain histogram), and Σrx·ry folds over the
    * (hour, value) CELL grid — |hours|×|values| cells, corpus-
    * independent. The corpus is touched once (the cell agg); the two
    * midrank frames broadcast (domain-bounded — pinned), and Pearson
    * on ranks runs on the joined cell frame. Exact counts and
    * half-integer midranks until the final sqrt — cross-engine
    * bit-parity by construction.
    */
  def spearmanValueHour(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(hour(col("ts")).as("h"), col("value"))
    val cells = base.groupBy("h", "value").agg(count(lit(1)).as("c"))
    def midrank(df: DataFrame, key: String, rank: String): DataFrame = {
      val w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
      df.groupBy(key).agg(sum("c").as("t"))
        .withColumn("below", coalesce(sum("t").over(w), lit(0L)))
        .select(col(key),
          (col("below") + (col("t") + 1L) / lit(2.0)).as(rank))
    }
    val rx = midrank(cells, "h", "rank_h")
    val ry = midrank(cells, "value", "rank_v")
    val joined = cells
      .join(broadcast(rx), "h")
      .join(broadcast(ry), "value")
    val s = joined.agg(
      sum("c").as("n"),
      sum(col("c") * col("rank_h")).as("sx"),
      sum(col("c") * col("rank_v")).as("sy"),
      sum(col("c") * col("rank_h") * col("rank_h")).as("sxx"),
      sum(col("c") * col("rank_v") * col("rank_v")).as("syy"),
      sum(col("c") * col("rank_h") * col("rank_v")).as("sxy"))
    s.select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy")))).as("rho"))
      .select(col("n"), r4(col("rho")).as("rho"),
        r4(col("rho") * sqrt((col("n") - 2L) /
          (lit(1.0) - col("rho") * col("rho")))).as("t_stat"))
  }

  /** `conformal_interval` — split-conformal 90% prediction intervals
    * for value per event type (full oracle): a content-hash train/
    * calibration split (md5 of event_id — the hash_split discipline),
    * the trivial per-type-mean model on train, the exact
    * ⌈(n_cal+1)·0.9⌉-th order statistic of |v − μ| on calibration,
    * and the realized calibration coverage (Vovk 2005 / Lei 2018,
    * public knowledge) — the distribution-free uncertainty band an
    * SLI dashboard should draw instead of a ±2σ that assumes
    * normality the exponential fixture doesn't have.
    *
    * Scale shape: two corpus passes (train means; calibration score
    * histogram). The order statistic comes from prefix counts over
    * the SCORE-domain histogram (scores are r4-snapped so the domain
    * is the 1e-4 grid — the mwu/ks plane), never a corpus sort; the
    * quantile threshold is exact integer arithmetic
    * (⌈9(n+1)/10⌉ = ⌊(9(n+1)+9)/10⌋), so both engines pick the
    * identical score and the coverage COUNT is exact.
    */
  def conformalInterval(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("bucket", (instr(lit("0123456789abcdef"),
        substring(md5(col("event_id").cast("string")), 1, 1)) - 1)
        .cast("int"))
    val mu = ev.filter(col("bucket") < 8)
      .groupBy("event_type")
      .agg(r4(avg("value")).as("mu"), count(lit(1)).as("n_train"))
    val scores = ev.filter(col("bucket") >= 8)
      .join(broadcast(mu), "event_type")
      .select(col("event_type"), col("mu"), col("n_train"),
        r4(abs(col("value") - col("mu"))).as("score"))
    val hist = scores
      .groupBy("event_type", "mu", "n_train", "score")
      .agg(count(lit(1)).as("c"))
    val tot = hist.groupBy("event_type").agg(sum("c").as("n_cal"))
    val w = Window.partitionBy("event_type").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the coverage count needs no second calibration pass: at the
    // q_hat row, the inclusive prefix count IS #{score <= q_hat}
    hist.join(broadcast(tot), "event_type")
      .withColumn("cum", sum("c").over(w))
      .filter(col("cum") >=
        floor(((col("n_cal") + 1L) * 9L + 9L) / lit(10.0)).cast("long"))
      .groupBy("event_type", "mu", "n_train", "n_cal")
      .agg(min(struct(col("score"), col("cum"))).as("qc"))
      .select(col("event_type"), col("n_train"), col("n_cal"),
        col("mu"), col("qc.score").as("q_hat"),
        r4(col("mu") - col("qc.score")).as("lo"),
        r4(col("mu") + col("qc.score")).as("hi"),
        r4(col("qc.cum") / col("n_cal").cast("double")).as("cal_coverage"))
      .orderBy("event_type")
  }

  /** `bootstrap_ci_mean` — Poisson-bootstrap 90% confidence interval
    * for the mean value per event type, B = 32 resamples (full
    * oracle): the DISTRIBUTED bootstrap (Poisson(1) resample weights
    * per row — Chamandy et al. 2012, public knowledge; the classic
    * n-out-of-n multinomial bootstrap needs a global coordinate the
    * cluster doesn't have). Every resample weight is a pure function
    * of (event_id, b) through the content-hash uniform and the exact
    * Poisson inverse-CDF thresholds, so both engines draw the
    * IDENTICAL 32 resamples and the interval is hash-checkable — a
    * RESAMPLING method under the full oracle gate.
    *
    * Scale shape: one corpus pass with a ×B in-place expansion
    * (explode of a 32-element literal — CPU-linear, no self-join);
    * the (type, b) partial agg collapses to |types|·B rows per
    * partition before the exchange. Resample means are exact-integer
    * sums on the centi-grid (the anova discipline) — bit-identical
    * cross-engine — and the CI order statistics come off the
    * constant 32-row-per-type frame (pinned window).
    */
  def bootstrapCiMean(spark: SparkSession, dir: String): DataFrame = {
    val b = 32
    val base = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("iv"))
    val stats = base.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        r4(sum("iv").cast("double") / count(lit(1)) / 100.0).as("mean"))
    val u48 = conv(substring(md5(concat(
      col("event_id").cast("string"), lit(":"), col("b").cast("string"))),
      1, 12), 16, 10).cast("long")
    val u = (u48.cast("double") + 0.5) / lit(281474976710656.0)
    // Poisson(1) inverse CDF: P(X<=k) literals for k = 0..4
    val wgt = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .otherwise(5L)
    val means = base
      .withColumn("b", explode(lit((1 to b).toArray)))
      .withColumn("w", wgt)
      .groupBy("event_type", "b")
      .agg((sum(col("w") * col("iv")).cast("double") / sum("w") / 100.0)
        .as("mb"))
    val rw = Window.partitionBy("event_type").orderBy("mb")
    val ci = means.withColumn("r", row_number().over(rw))
      .groupBy("event_type")
      .agg(min(when(col("r") === 2, col("mb"))).as("ci_lo_raw"),
        min(when(col("r") === 31, col("mb"))).as("ci_hi_raw"),
        stddev_samp("mb").as("se_raw"))
    stats.join(ci, "event_type")
      .select(col("event_type"), col("n"), col("mean"),
        r4(col("ci_lo_raw")).as("ci_lo"), r4(col("ci_hi_raw")).as("ci_hi"),
        r4(col("se_raw")).as("se_boot"))
      .orderBy("event_type")
  }

  /** `median_ci_binomial` — distribution-free 95% confidence interval
    * for the MEDIAN via binomial order statistics (the classic
    * sign-test inversion, public knowledge): ranks
    * l = ⌊(n − 1.96√n)/2⌋, u = n + 1 − l bracket the true median with
    * ≥95% coverage under NO distributional assumption — the third
    * member of the uncertainty family (conformal = prediction
    * interval, bootstrap = CI by resampling, this = CI by exact
    * order statistics, zero randomness).
    *
    * Scale shape: the value-domain histogram plane again — value at
    * rank r is min{v : cum(v) ≥ r}, so all three order statistics
    * (l, median, u) come out of ONE conditional-min fold over the
    * prefix-counted histogram; the corpus never sorts. Integer ranks
    * from floor(n − 1.96·sqrt(n)) — identical double arithmetic both
    * engines, then pure integer compares.
    */
  def medianCiBinomial(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .groupBy("event_type", "value").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy("event_type").agg(sum("c").as("n"))
    hist.join(broadcast(tot), "event_type")
      .withColumn("cum", sum("c").over(w))
      .withColumn("l", greatest(lit(1L),
        floor((col("n") - lit(1.96) * sqrt(col("n"))) / lit(2.0))
          .cast("long")))
      .withColumn("u", least(col("n"), col("n") + 1L - col("l")))
      // explicit floor: Spark's double->long cast truncates but
      // DuckDB's CAST rounds — floor() is the one portable spelling
      .withColumn("rmed", floor((col("n") + 1L) / lit(2.0)).cast("long"))
      .groupBy("event_type", "n", "l", "u")
      .agg(min(when(col("cum") >= col("rmed"), col("value"))).as("median"),
        min(when(col("cum") >= col("l"), col("value"))).as("ci_lo"),
        min(when(col("cum") >= col("u"), col("value"))).as("ci_hi"))
      .select(col("event_type"), col("n"), col("l").as("l_rank"),
        col("u").as("u_rank"), col("median"), col("ci_lo"), col("ci_hi"))
      .orderBy("event_type")
  }

  /** `trimmed_mean` — 5%-trimmed and 5%-winsorized means per event
    * type (Tukey, public knowledge): the robust-location companions
    * to mad_robust/iqr_outliers — trimming DROPS the k = ⌊0.05n⌋
    * extreme ranks per side, winsorizing CLAMPS them to the boundary
    * order statistics; on the fixture's exponential tail the gap
    * between mean and trimmed mean IS the tail-mass readout.
    *
    * Scale shape: no corpus sort — each histogram row's contribution
    * to the trimmed sum is its RANK-RANGE overlap with [k+1, n−k]
    * (pure integer arithmetic on prefix counts), and the boundary
    * order statistics fold as conditional mins. Sums run on the
    * exact centi-grid (the anova discipline) so both engines produce
    * bit-identical totals before the one division.
    */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("iv"))
      .groupBy("event_type", "iv").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("iv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy("event_type").agg(sum("c").as("n"))
    val withCum = hist.join(broadcast(tot), "event_type")
      .withColumn("cum", sum("c").over(w))
      .withColumn("k", floor(col("n") / lit(20.0)).cast("long"))
      // overlap of this value's rank range [cum-c+1, cum] with the
      // kept band [k+1, n-k]
      .withColumn("keep", greatest(lit(0L),
        least(col("cum"), col("n") - col("k")) -
          greatest(col("cum") - col("c") + 1L, col("k") + 1L) + 1L))
    withCum.groupBy("event_type", "n", "k")
      .agg(sum(col("iv") * col("keep")).as("tsum"),
        min(when(col("cum") >= col("k") + 1L, col("iv"))).as("vlo"),
        min(when(col("cum") >= col("n") - col("k"), col("iv"))).as("vhi"),
        sum(col("iv") * col("c")).as("fullsum"))
      .select(col("event_type"), col("n"), col("k"),
        r4(col("fullsum").cast("double") / col("n") / 100.0).as("mean"),
        r4(col("tsum").cast("double") / (col("n") - col("k") * 2L) / 100.0)
          .as("trimmed_mean"),
        r4((col("tsum") + col("k") * (col("vlo") + col("vhi")))
          .cast("double") / col("n") / 100.0).as("winsorized_mean"))
      .orderBy("event_type")
  }
}
