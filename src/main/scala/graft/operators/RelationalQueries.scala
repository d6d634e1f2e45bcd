package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints._

import graft.functions.Det.{r2, r4}
import graft.sources.Tables

/** Relational / star-schema surface (SURVEY.md §2.2, queries #11–#22).
  *
  * Models the reference's catalog rollups (Product → ProductGroup
  * nesting, objective/target filters, missing-SLI detection — SURVEY
  * §1.1 `[pk]`) over the TPC-H-ish dims.
  *
  * Scale notes (100 TB): the fact (`lineitem`/`orders`) side always
  * streams through a shuffle keyed on the join key; dim sides
  * (`region`/`nation`, and `customer`/`part` at testdata scale) sit
  * under Spark's auto-broadcast threshold so Catalyst picks
  * broadcast-hash joins with zero fact shuffle for the dim hops —
  * `region`/`nation` are hinted explicitly since they are *always*
  * tiny. ROLLUP/CUBE lower to a single Expand + two-phase hash agg
  * (no extra scans). Top-k lowers to TakeOrderedAndProject (per
  * partition heap + driver merge of k rows — no global sort).
  */
object RelationalQueries {

  /** Corpus-proportional dim side for an equi-join, with a
    * plan-build-time regime pick (r10 — the r9 verdict's
    * `rev_by_region` sf30 knee): inside broadcast range the frame is
    * left UNHINTED so Catalyst's size-based election broadcasts it
    * (bench-SF plans unchanged); past the threshold — where Catalyst
    * would fall back to sort-merge and pay a SORT on the fact side —
    * a shuffled-hash hint keeps the fact side sort-free (the dim
    * builds a per-partition hash map: dim-bytes / shuffle-partitions,
    * sized to executor memory at any SF by the same partition-count
    * knob that sizes every other shuffle). The decision statistic is
    * the table's on-disk bytes — exactly what Catalyst's own
    * election reads, so the two regimes tile the SF axis without a
    * gap.
    */
  private def dimRegime(spark: SparkSession, dir: String, name: String,
      projected: DataFrame): DataFrame = {
    val thresh = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (thresh >= 0 && Tables.fileBytes(spark, dir, name) > thresh)
      projected.hint("shuffle_hash")
    else projected
  }

  /** Fact joined through the full dim chain; shared by #11/#18.
    * Each side is pruned to its join/output columns before joining so
    * the shuffled rows (and the rollup Expand) stay narrow without
    * relying on the optimizer to prune through every operator.
    */
  private def revenueJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      // orders through the same regime pick (r10): past broadcast
      // range Catalyst falls to sort-merge and SORTS the lineitem
      // side — at sf30 that sort of 540 M narrow rows was 130 s of
      // the query's 131. Shuffled-hash keeps the fact side sort-free;
      // the build side is orders-per-partition (projected to 16 B/row
      // ÷ shuffle width — partition-count-scaled at any SF).
      .join(dimRegime(spark, dir, "orders",
          Tables.orders(spark, dir).select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dimRegime(spark, dir, "customer",
          Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))

  /** #11 — revenue rollup by region (4-way equi join + hash agg). */
  def revByRegion(spark: SparkSession, dir: String): DataFrame =
    revenueJoin(spark, dir)
      .groupBy("r_name")
      .agg(r2(sum("rev")).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy("r_name")

  /** #12 — top-10 customers by revenue (join + agg + top-k).
    * r10: fact-first join order with both hops through [[dimRegime]]
    * and projected build sides (guide §2.3/§3.1) — same inner-join
    * semantics, but past broadcast range the orders and customer hops
    * go shuffled-hash instead of sort-merge (the sf30 cell was 74 s,
    * nearly all of it the fact-side sorts). Bench-SF plans unchanged
    * (both dims stay inside Catalyst's broadcast election there).
    */
  def top10Customers(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(dimRegime(spark, dir, "orders",
          Tables.orders(spark, dir).select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dimRegime(spark, dir, "customer",
          Tables.customer(spark, dir).select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(r2(sum(col("rev"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)

  /** #13 — customers having ≥1 urgent order (EXISTS → left-semi join). */
  def semiJoinUrgent(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** #14 — customers with no 'P'-status orders (NOT EXISTS → left-anti). */
  def antiJoinNoPOrders(spark: SparkSession, dir: String): DataFrame = {
    val pOrders = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "P")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(pOrders, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), r4(avg("c_acctbal")).as("avg_bal"))
      .orderBy("c_mktsegment")
  }

  /** #15 — orders left-joined to lineitem, line-count histogram
    * (re-agg of agg; zero-line orders land in bucket 0).
    *
    * r11 (guide §2.3 "aggregate before you shuffle"): lineitem
    * collapses to (orderkey, n_lines) BEFORE the outer join — the
    * per-order count partial-aggregates map-side (~4:1 at the scan),
    * so the join meets two ORDERKEY-GRAIN frames instead of sorting/
    * hashing the full fact, and the old post-join groupBy(o_orderkey)
    * disappears (orders is orderkey-unique). `coalesce(n, 0)` keeps
    * the zero-line bucket: `count(l_orderkey)` over an unmatched left
    * row was 0, and a NULL-join-key lineitem row (none in this
    * schema, but for completeness) was excluded by count's null
    * skipping exactly as the null-key group is excluded by the join.
    * Oracle unchanged; the hash gate certifies.
    */
  def outerJoinLinecount(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select("o_orderkey")
      .join(Tables.lineitem(spark, dir).groupBy("l_orderkey")
          .agg(count(lit(1)).as("n")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("n_lines"))
      .groupBy("n_lines")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("n_lines")

  /** #16 — equi + range-predicate join: lines shipped within 90 days
    * of their order date. The equi component keeps this a hash/SMJ
    * join; the interval predicate is evaluated post-probe.
    */
  def rangeJoinShipwindow(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate")
      // r11: orders hop through dimRegime with a projected build side
      // (the equi key keeps SHJ eligible; the interval predicate stays
      // a post-probe filter in both regimes)
      .join(dimRegime(spark, dir, "orders", Tables.orders(spark, dir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("lines_shipped_90d"))
      .orderBy("o_orderpriority")

  /** #17 — as-of join: latest view at-or-before each purchase.
    *
    * Implemented as a *linear* single-pass window instead of the
    * portable equi+range join: union the two event streams, sort each
    * user's timeline once, and carry the last seen view timestamp
    * forward with `last(_, ignoreNulls)`. The naive join shape
    * materializes every (purchase × earlier view) pair per user —
    * quadratic in per-user activity and ruinous under key skew at
    * 100 TB; this form is one shuffle on `user_id` and O(n) rows.
    * Views sort before purchases at equal `ts` (kind 0 < 1) so the
    * `v.ts <= p.ts` inclusive semantics of the oracle are preserved.
    */
  /** As-of core: anchors (`kind` = 1) get `last_view_ts` = the max
    * non-anchor (`kind` = 0) `ts` that is <= their own `ts`, per
    * `user_id`. Linear single-window form; exposed for property tests.
    */
  def asofMatched(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_view_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
  }

  def asofPriorView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("kind"))
    asofMatched(ev)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("last_view_ts")).as("with_prior_view"),
        r2(avg((unix_millis(col("ts")) - unix_millis(col("last_view_ts"))) / lit(1000.0)))
          .as("avg_gap_s"))
      .orderBy("user_id")
  }

  /** #18 — ROLLUP(region, nation) revenue (grouping-sets via Expand).
    *
    * Goes through a temp view + `GROUP BY ROLLUP` SQL rather than
    * `Dataset.rollup`: the Dataset API attaches dataset-id metadata to
    * the grouping columns and Spark's ambiguous-self-join detector
    * false-positives on them over this join chain. The SQL path builds
    * the identical plan (Expand ×3 over the pruned 3-column join
    * output, then two-phase hash agg).
    */
  def rollupRegionNation(spark: SparkSession, dir: String): DataFrame = {
    revenueJoin(spark, dir).createOrReplaceTempView("graft_rollup_rev")
    // TWO-PHASE rollup: pre-aggregate to the (region, nation) grain
    // FIRST (25 rows), then Expand the tiny aggregate. Spark's Expand
    // multiplies its INPUT by the grouping-set count, so expanding
    // before aggregating triples the fact-table volume through the
    // shuffle; expanding after costs 3×25 rows. Algebraically
    // identical for sum (sum of sums), and the summation-order change
    // is absorbed by the same epsilon discipline partition-parallel
    // partial aggregation already requires (oracle hash stays green).
    spark.sql(
      s"""WITH pre AS (
         |  SELECT r_name, n_name, sum(rev) AS rev
         |  FROM graft_rollup_rev GROUP BY r_name, n_name)
         |SELECT coalesce(r_name, 'ALL') AS region,
         |       coalesce(n_name, 'ALL') AS nation,
         |       round(sum(rev) + 2e-5, 2) AS revenue
         |FROM pre
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY region, nation""".stripMargin)
  }

  /** #19 — CUBE(returnflag, linestatus) over lineitem, two-phase
    * like [[rollupRegionNation]]: pre-aggregate to the 6-row
    * (flag, status) grain, cube the aggregate (Expand ×4 over 6 rows
    * instead of the whole fact table); count becomes sum-of-counts.
    */
  def cubeFlagStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("c"))
      .cube("l_returnflag", "l_linestatus")
      .agg(r2(sum("q")).as("sum_qty"), sum("c").as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")

  /** #20 — set arithmetic over entity lists: UNION-distinct /
    * INTERSECT / EXCEPT, each reduced to a count (lazy — no
    * driver-side actions).
    */
  def setOpsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val hi = cust.filter(col("c_acctbal") > 5000).select("c_custkey")
    val auto = cust.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
    def counted(op: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
    counted("union", hi.union(auto).distinct())
      .union(counted("intersect", hi.intersect(urgent)))
      .union(counted("except", auto.except(urgent)))
      .orderBy("op")
  }

  /** #21 — exact distinct aggregation (Expand + two-phase agg). */
  def distinctExact(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** #36 — per-nation supplier revenue (lineitem ⋈ supplier ⋈
    * broadcast nation): covers the supplier dim + distinct-dim-count
    * re-agg. Fact shuffles once on l_suppkey; nation is broadcast.
    */
  def supplierNationRev(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(dimRegime(spark, dir, "supplier",
          Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        r2(sum("rev")).as("revenue"),
        countDistinct("s_suppkey").as("n_suppliers"))
      .orderBy("n_name")

  /** #65 — PIVOT: the day × event_type average-value matrix (long →
    * wide reshaping). Pivot values are DECLARED (the five fixture
    * types), which is the 100 TB discipline anyway: an undeclared
    * pivot forces an extra distinct-values job before planning. Plan
    * is ONE hash aggregate whose buffer holds 5 conditional avgs —
    * identical shape to the oracle's CASE-based conditional
    * aggregation, no extra shuffle vs a plain groupBy.
    */
  def pivotDayType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(r4(avg("value")))
      .orderBy("day")

  /** #66 — UNPIVOT (wide → long, the inverse reshaping): melts the
    * pivoted matrix back to (day, event_type, avg_value) rows and
    * re-aggregates per type. Unpivot is a per-row expression expansion
    * (Expand, no shuffle); the round trip pivot→unpivot→agg proves
    * both directions compose losslessly — the oracle computes the
    * same thing straight from the raw table.
    */
  def unpivotTypeStats(spark: SparkSession, dir: String): DataFrame =
    pivotDayType(spark, dir)
      .unpivot(Array(col("day")),
        Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
        "event_type", "day_avg")
      .filter(col("day_avg").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        r4(avg("day_avg")).as("avg_of_day_avgs"),
        r4(max("day_avg")).as("max_day_avg"))
      .orderBy("event_type")

  /** #73 — correlated scalar subquery, exercised through the SQL
    * surface (GraftCatalog views + `spark.sql`): parts priced above
    * their brand's average. Catalyst decorrelates the subquery into a
    * per-brand aggregate + join — the plan a hand-written DSL version
    * would build — so this pins that the SQL subquery path and the
    * oracle agree. Premium is rounded per row before averaging (both
    * engines), keeping the double discipline.
    */
  def aboveBrandAvg(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.GraftCatalog.registerTables(spark, dir, prefix = "graft_")
    spark.sql(
      """SELECT p_brand, count(*) AS n_above,
        |       round(avg(p_retailprice - brand_avg) + 1e-7, 4) AS avg_premium
        |FROM (
        |  SELECT p_brand, p_retailprice,
        |         (SELECT avg(p2.p_retailprice) FROM graft_part p2
        |          WHERE p2.p_brand = p.p_brand) AS brand_avg
        |  FROM graft_part p) t
        |WHERE p_retailprice > brand_avg
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** #74 — RANGE window frame (value-based, gap-aware — the frame
    * class the ROWS queries #8/#29 don't cover): per (type, day), the
    * average of daily averages over the trailing CALENDAR week
    * `RANGE BETWEEN 6 PRECEDING AND CURRENT ROW` on integer
    * days-since-epoch. Unlike a ROWS frame, missing days shrink the
    * window instead of reaching further back — the correct semantics
    * for sparse series.
    */
  def rangeFrameDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("event_type").orderBy("day_num").rangeBetween(-6, 0)
    daily
      .select(col("event_type"), col("day"),
        r4(avg("v").over(w)).as("range_7d_avg"),
        count(lit(1)).over(w).as("days_in_window"))
      .orderBy("event_type", "day")
  }

  /** #22 — top-3 parts per brand (dense_rank + filter, per-group top-N).
    * Ranks on the RAW price (matching the oracle, whose window cannot
    * see the projected alias) and rounds only the output column.
    */
  def rankParts(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      .withColumn("rnk", dense_rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("p_brand"), col("p_partkey"),
        r2(col("p_retailprice")).as("p_retailprice"), col("rnk"))
      .orderBy("p_brand", "rnk", "p_partkey")
  }

  /** #84 — LATERAL correlated subquery (full oracle): per nation, the
    * top-2 customers by account balance via a correlated
    * ORDER BY … LIMIT subquery in the FROM clause — the remaining
    * subquery class after scalar (#73) and EXISTS (#13/#14). Catalyst
    * decorrelates the lateral to a ranked window under the hood, so
    * the plan is the same single-shuffle per-group top-N as #22 —
    * writing it LATERAL is surface coverage, not a new plan risk.
    */
  def lateralTopn(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.GraftCatalog.registerTables(spark, dir, prefix = "graft_")
    spark.sql(
      """SELECT n.n_name, l.c_name, l.c_acctbal
        |FROM graft_nation n,
        |     LATERAL (SELECT c_name, round(c_acctbal + 1e-7, 2) AS c_acctbal
        |              FROM graft_customer c
        |              WHERE c.c_nationkey = n.n_nationkey
        |              ORDER BY c.c_acctbal DESC, c.c_name
        |              LIMIT 2) l
        |ORDER BY n.n_name, l.c_acctbal DESC, l.c_name""".stripMargin)
  }

  /** #85 — the aggregate FILTER clause (full oracle): per-type
    * conditional aggregates without CASE scaffolding. Same Expand-free
    * plan as the `sum(when(…))` spelling every other query uses —
    * this declares the SQL-standard surface for it.
    */
  def filteredAggs(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.GraftCatalog.registerTables(spark, dir, prefix = "graft_")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |       count(*) FILTER (WHERE value > 150) AS n_high,
        |       count(*) FILTER (WHERE value < 50) AS n_low,
        |       round(avg(value) FILTER (WHERE value BETWEEN 50 AND 150) + 1e-7, 4) AS avg_inband,
        |       round(max(value) FILTER (WHERE user_id % 2 = 0) + 1e-7, 2) AS max_even_users
        |FROM graft_events GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** `copurchase_pairs` — part co-occurrence within orders (full
    * oracle): the top-20 pairs of parts appearing in the same order,
    * the market-basket / co-occurrence-matrix primitive (identical in
    * shape to term co-occurrence in LLM corpus analysis: replace
    * orders with documents and parts with vocabulary). Semantics:
    * self-join of the distinct (order, part) frame on the order key
    * with `a < b` to canonicalize the unordered pair — which is
    * exactly the basket-distinct `wd` support the persisted
    * [[EdgeStore]] maintains, so since r9 this PROBES the bucketed
    * weighted-pair table (the r8 verdict's #1: the corpus-sized
    * basket self-join ran per query here even though the store
    * persisted the pair base it needed). The oracle still computes
    * the self-join in DuckDB, so the hash gate proves store ≡ inline.
    *
    * Scale: the probe reads pair-grain rows (bounded by Σ C(k,2)
    * over baskets, linear in orders) and top-20 lowers to
    * TakeOrderedAndProject off the scan — no shuffle at all; the
    * basket explosion happened once at ingest.
    */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame =
    EdgeStore.weighted(spark, dir)
      .filter(col("x") < col("y"))
      .select(col("x").as("part_a"), col("y").as("part_b"),
        col("wd").as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)

  /** `lift_rules` — market-basket association rules a→b over order
    * baskets: confidence `P(b|a) = n_ab/n_a` and lift
    * `P(ab)/(P(a)P(b)) = N·n_ab/(n_a·n_b)`, top-10 DIRECTED rules by
    * lift with the standard minimum-support floor (n_ab ≥ 3) that
    * keeps lift's low-count noise out. Extends copurchase_pairs
    * (raw co-occurrence counts) to the normalized statistics a
    * recommender/assortment report actually ranks by. Full oracle;
    * rank on the r4-rounded lift with (a, b) tie-breaks.
    *
    * Since r9 every input is a persisted [[EdgeStore]] plane (the r8
    * verdict's #1): n_ab is the basket-distinct `wd` support from the
    * symmetric weighted-pair table (both directions stored, so no
    * re-orientation), n_a/n_b come from the maintained per-part
    * distinct-order counts, and N from the maintained order count —
    * the corpus-sized basket self-join this query used to re-pay per
    * run happened once at ingest. The oracle still self-joins in
    * DuckDB, so the hash gate proves store ≡ inline.
    *
    * Scale: pair-grain scan → support-floor filter → two part-KEYED
    * dim joins (part is SF-scaled — the corpus-proportional
    * convention; unhinted, so the planner still broadcasts while the
    * count frame fits); N is a single-row broadcast; top-10 is
    * TakeOrderedAndProject. Lift arithmetic is the same literal
    * double order in both engines (int64-safe: products are double
    * before they can overflow at fact scale).
    */
  def liftRules(spark: SparkSession, dir: String): DataFrame = {
    val pc = EdgeStore.parts(spark, dir)
      .select(col("part").as("l_partkey"), col("c"))
    val n = EdgeStore.norders(spark, dir)
    val pairs = EdgeStore.weighted(spark, dir)
      .filter(col("wd") >= 3)
      .select(col("x").as("part_a"), col("y").as("part_b"),
        col("wd").as("n_ab"))
    pairs
      .join(pc.select(col("l_partkey").as("part_a"), col("c").as("ca")),
        Seq("part_a"))
      .join(pc.select(col("l_partkey").as("part_b"), col("c").as("cb")),
        Seq("part_b"))
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("n_ab"),
        r4(col("n_ab") * lit(1.0) / col("ca")).as("confidence"),
        r4((col("n") * (col("n_ab") * lit(1.0))) /
          ((col("ca") * lit(1.0)) * col("cb"))).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(10)
  }

  /** `pareto_share` — revenue-concentration report (full oracle):
    * customers needed to reach 80% of revenue, the top-decile revenue
    * share, and the Gini coefficient, from the per-customer revenue
    * distribution. The "is our revenue one whale or a long tail"
    * question every SLO-adjacent business review asks; Gini uses the
    * rank formulation Σ(2i−n−1)·rev_i / (n·Σrev) over ascending
    * (rev, custkey) ranks.
    *
    * Determinism: ranks are row_number under a total order (revenue,
    * then custkey); the cumulative sum runs in that SAME sequential
    * order in both engines, so the running doubles are bit-identical
    * and the 0.8 threshold compares at the rounded 4-dp grid
    * (boundary customers can't flip on a summation ulp). Residual:
    * two customers whose revenues differ only by per-group summation
    * noise (~1e-10 — one such pair at sf0.1, ranks 3778/3779) could
    * order differently across engines; that affects nothing here
    * unless the pair STRADDLES the decile boundary (swapping
    * adjacent near-equal revs perturbs cum/gini by the same ~1e-10,
    * absorbed by r4) — and the fixture pair sits mid-distribution.
    *
    * Scale: per-customer revenue collapses map-side (customer grain,
    * not corpus grain). The global-order window then runs UNPARTITIONED
    * — the documented single-partition caveat, acceptable because its
    * input is the customer dimension (orders of magnitude below the
    * fact table at any scale); past that, swap for the two-pass
    * range-partitioned prefix sum (partition-local sums + broadcast
    * per-partition offsets), which preserves these exact semantics.
    */
  def paretoShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
    val wDesc = Window.orderBy(col("rev").desc, col("o_custkey"))
    val wAll = Window.partitionBy() // OVER () — global constants
    val ranked = rev
      .withColumn("i_desc", row_number().over(wDesc))
      .withColumn("cum_rev", sum("rev").over(
        wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum("rev").over(wAll))
    ranked.agg(
      max("n").as("n_customers"),
      (sum(when(r4(col("cum_rev") / col("tot")) < 0.8, 1L).otherwise(0L)) + 1L)
        .as("n_to_80pct"),
      r4(sum(when(col("i_desc") <= ceil(col("n") / lit(10.0)), col("rev"))
        .otherwise(0.0)) / max("tot")).as("top_decile_share"),
      // Gini on ascending ranks i = n+1−i_desc: Σ(2i−n−1)·rev / (n·Σrev)
      r4(sum((lit(2) * (col("n") + lit(1) - col("i_desc")) - col("n") - lit(1))
        * col("rev")) / (max("n") * max("tot"))).as("gini"))
  }

  /** `pareto_share_prefix` — the SAME report as [[paretoShare]]
    * computed through [[PrefixOps.rankedPrefix]]'s range-partitioned
    * two-pass rank/cumsum instead of the unpartitioned window: the
    * documented swap for the whole ranked-curve family (pareto / RFM
    * / Gini / price-position), demonstrated END-TO-END — it carries
    * pareto_share's exact oracle, so the driver's hash gate proves
    * the swap preserves results, not just a spec's tolerance.
    *
    * What changes: rank and running revenue come from slice-local
    * windows plus broadcast slice offsets (every task sorts only its
    * own revenue range — the shape that still works when the
    * customer dimension outgrows one task), and n/tot come from a
    * plain aggregate instead of OVER (). The running double differs
    * from the sequential window only by cross-slice summation
    * reassociation (~1e-13 relative here) — inside the r4 grid the
    * 0.8 threshold and every output round to, hence the shared
    * oracle. ParetoPrefixSpec additionally pins row-for-row equality
    * with the window form.
    */
  def paretoSharePrefix(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
    val ranked = PrefixOps.rankedPrefix(rev, "rev", "o_custkey",
      "i_desc", "cum_rev")
    val totals = rev.agg(count(lit(1)).as("n"), sum("rev").as("tot"))
    ranked.crossJoin(broadcast(totals)).agg(
      max("n").as("n_customers"),
      (sum(when(r4(col("cum_rev") / col("tot")) < 0.8, 1L).otherwise(0L)) + 1L)
        .as("n_to_80pct"),
      r4(sum(when(col("i_desc") <= ceil(col("n") / lit(10.0)), col("rev"))
        .otherwise(0.0)) / max("tot")).as("top_decile_share"),
      r4(sum((lit(2) * (col("n") + lit(1) - col("i_desc")) - col("n") - lit(1))
        * col("rev")) / (max("n") * max("tot"))).as("gini"))
  }

  /** `ship_latency` — order-to-ship latency distribution per order
    * priority (full oracle): days from `o_orderdate` to each line's
    * `l_shipdate`; count, mean, exact interpolated median and p95.
    * The fulfillment-SLA report ("does URGENT actually ship faster,
    * and what does the tail look like").
    *
    * Exact percentiles WITHOUT a corpus-sized sort or per-group
    * buffer: latency is a small bounded-domain integer (days), so the
    * corpus collapses to a (priority, days)→count HISTOGRAM map-side
    * (partial agg — the only corpus-grain exchange carries histogram
    * cells, not rows), and the (n−1)·p interpolated percentile
    * (`quantile_cont` semantics) is computed from the histogram's
    * running counts: the value at 0-based index k is the cell where
    * cum_before ≤ k < cum. Spark's `percentile` agg would buffer
    * every raw value per group (5 groups × the corpus at 100 TB);
    * this shape is exact at ANY scale. The windows run on histogram
    * cells (≤ priorities × day-range rows).
    */
  def shipLatency(spark: SparkSession, dir: String): DataFrame = {
    // r11: fact-first with the orders side through dimRegime (guide
    // §3.1) — same inner join, but past broadcast range the fact
    // streams sort-free against a per-partition orders hash build
    val hist = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_shipdate")
      .join(dimRegime(spark, dir, "orders", Tables.orders(spark, dir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .as("d"))
      .groupBy("priority", "d").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("priority").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(Window.partitionBy("priority")))
      .withColumn("cumb", col("cum") - col("cnt"))
    // histogram cell holding 0-based index k: cum_before <= k < cum
    def vAt(k: Column): Column =
      max(when(col("cumb") <= k && k < col("cum"), col("d")))
    def tgt(p: Double): Column = (col("n") - lit(1)) * lit(p)
    val agg = h.groupBy("priority").agg(
      max("n").as("n_lines"),
      r4(sum(col("d") * col("cnt")) / max("n")).as("avg_days"),
      vAt(floor(tgt(0.5))).as("m_lo"), vAt(ceil(tgt(0.5))).as("m_hi"),
      vAt(floor(tgt(0.95))).as("p_lo"), vAt(ceil(tgt(0.95))).as("p_hi"))
    def interp(lo: Column, hi: Column, p: Double): Column = {
      val t = (col("n_lines") - lit(1)) * lit(p)
      val frac = t - floor(t)
      r4(lo + (hi - lo) * frac)
    }
    agg.select(col("priority"), col("n_lines"), col("avg_days"),
        interp(col("m_lo"), col("m_hi"), 0.5).as("med_days"),
        interp(col("p_lo"), col("p_hi"), 0.95).as("p95_days"))
      .orderBy("priority")
  }

  /** `repeat_cadence` — repeat-purchase cadence (full oracle): per
    * customer, the mean gap in days between consecutive orders (lag
    * window under the (o_orderdate, o_orderkey) total order); then
    * across repeat customers, the count, mean and exact median of
    * those per-customer cadences. The replenishment-cycle number
    * ("customers reorder every ~N days") that order counts alone
    * can't give.
    *
    * Determinism: per-customer gaps are exact int day-diffs, their
    * mean is one division — bit-identical in both engines; the
    * median interpolates customer-grain doubles with the shared
    * (n−1)·p formula; r4 absorbs cross-engine summation ulps in the
    * final mean-of-means.
    *
    * Scale: ONE customer-keyed window exchange, collapsed to customer
    * grain in the same partitioning; exact `percentile` runs on the
    * customer dimension (documented bounded-cardinality choice — the
    * GK sketch plane is the past-dimension-scale swap).
    */
  def repeatCadence(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val perCust = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("gap",
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))))
      .where(col("gap").isNotNull)
      .groupBy("o_custkey").agg(avg("gap").as("avg_gap"))
    perCust.agg(
      count(lit(1)).as("n_repeat_customers"),
      r4(avg("avg_gap")).as("avg_gap_days"),
      r4(percentile(col("avg_gap"), lit(0.5))).as("med_gap_days"))
  }

  /** `copurchase_pagerank` — PageRank over the part co-purchase
    * graph (full oracle): undirected edges between parts bought in
    * the same order (the `copurchase_pairs` pair set, both
    * directions), 10 power iterations at damping 0.85, top-20 parts
    * by rank (reported per-mille). The "which products anchor the
    * catalog" centrality question co-occurrence COUNTS can't answer —
    * rank flows through the whole graph, so a part bridging two
    * clusters outranks one with the same local degree.
    *
    * Iterative-graph-on-Spark, the bounded-lineage way: the edge
    * structure (src, dst, src-degree) is derived ONCE and
    * `localCheckpoint`ed — every iteration reads the materialized
    * blocks, never re-deriving from the corpus (the naive declarative
    * loop re-embeds the whole edge subtree per iteration: plan text
    * and canonicalization cost grow quadratically — measured 315
    * textual exchanges at 10 iterations). Ranks are NODE-grain (the
    * part dimension), broadcast into the edge join (zero corpus
    * shuffles per iteration; the per-dst contribution sum collapses
    * map-side) and checkpointed each step, so the plan stays
    * CONSTANT-size however many iterations run — the GraphX/
    * GraphFrames iteration pattern expressed on DataFrames. At a
    * node set past broadcast scale, swap the hint for a shuffle join
    * keyed on src — semantics unchanged. Dangling nodes are
    * impossible by construction (every edge endpoint has degree ≥ 1).
    *
    * Determinism: rank sums are order-sensitive doubles only at ulp
    * scale (~1e-13 after 10 iterations); output compares and SORTS on
    * the r4-rounded per-mille rank (ties broken by part id), so both
    * engines cut the same top-20.
    */
  def copurchasePagerank(spark: SparkSession, dir: String): DataFrame = {
    // r9 (the r8 verdict's #1 — 418 s at sf10, ~all of it the
    // per-query edge rebuild): the edge set IS the persisted
    // EdgeStore weighted-pair table — distinct co-occurring pairs,
    // BOTH orientations already stored, bucketed on x. The corpus
    // self-join + distinct this query used to re-pay happened once
    // at ingest; only the node-grain iteration plane remains.
    val wp = EdgeStore.weighted(spark, dir)
    // Node degrees come DENORMALIZED from the store (deg_x, baked in
    // at publish), so the per-iteration frame below is a raw
    // vectorized parquet scan — v3 joined a broadcast degree frame
    // and localCheckpointed the result, and at sf10 the 10 scans of
    // 180 M ROW-SERIALIZED checkpoint blocks were the query's
    // dominant cost (row deserialization, not compute).
    // r11 (store v6): the regime statistic reads the publish marker's
    // row count — store metadata, no per-query count job; the count
    // job survives only on the merge-on-read path (live deltas).
    val m = EdgeStore.weightedRows(spark, dir).getOrElse(wp.count())
    // Local regime (r10, the GraphOps.localCc rationale): below the
    // shared edge threshold even the packed 8-partition loop is pure
    // scheduler floor — 10 fixed iterations × (co-partitioned join +
    // explode + agg + cut) ≈ 1.9 s wall for a ~5 k-row adjacency and
    // <0.1 s of arithmetic. One exchange of (x, y, deg_x), ten
    // in-memory power iterations per the same update rule
    // (base 0.15/n + 0.85·Σ rank/deg), same r4 grid on the way out —
    // summation order differs only within the r4 nudge tolerance and
    // the oracle hash certifies. Distributed planes unchanged above
    // the threshold.
    if (m <= GraphOps.localEdgeMax(spark)) {
      import spark.implicits._
      // Ship the PACKED adjacency, not the edge rows: the node-grain
      // pack (one row per src with a primitive dst array) is ~1000×
      // fewer rows than the raw pair table, so the single-task
      // exchange moves MBs of array buffers instead of millions of
      // serialized tuples (measured: tuple-grain shipping cost more
      // than the distributed loop it replaced). Since v6 the pack is
      // a PUBLISHED bucketed plane — the per-query groupBy/
      // collect_list job is gone; the probe is a vectorized scan
      // (merge-on-read re-packs live only while deltas are unfolded).
      // Array[Long] dst payload (r11): the Seq[Long] decoder boxed
      // every neighbor id per iteration touch; the primitive-array
      // decoder is one UnsafeArrayData.toLongArray per row, and the
      // loop below indexes flat arrays (node ids dictionary-encoded
      // once) instead of hashing a LongMap 2·|edges| times per
      // iteration.
      val ranks = EdgeStore.packed(spark, dir)
        .as[(Long, Long, Array[Long])]
        .groupByKey(_ => true)
        .flatMapGroups { (_: Boolean, it: Iterator[(Long, Long, Array[Long])]) =>
          val adj = it.toArray
          val n = adj.length
          // dictionary: node id -> dense index (nodes = the src set;
          // every dst also appears as a src in the symmetric store)
          val idx = new scala.collection.mutable.LongMap[Int](n * 2)
          var i = 0
          while (i < n) { idx(adj(i)._1) = i; i += 1 }
          // re-encode dst arrays to dense indices ONCE
          val deg = new Array[Double](n)
          val dsts = new Array[Array[Int]](n)
          i = 0
          while (i < n) {
            val (_, dx, ds) = adj(i)
            deg(i) = dx.toDouble
            val enc = new Array[Int](ds.length)
            var j = 0
            while (j < ds.length) { enc(j) = idx(ds(j)); j += 1 }
            dsts(i) = enc
            i += 1
          }
          val rank = Array.fill(n)(1.0 / n)
          val contrib = new Array[Double](n)
          val b = 0.15 / n
          var it10 = 0
          while (it10 < 10) {
            java.util.Arrays.fill(contrib, 0.0)
            i = 0
            while (i < n) {
              val share = rank(i) / deg(i)
              val enc = dsts(i)
              var j = 0
              while (j < enc.length) { contrib(enc(j)) += share; j += 1 }
              i += 1
            }
            i = 0
            while (i < n) { rank(i) = b + 0.85 * contrib(i); i += 1 }
            it10 += 1
          }
          adj.iterator.zipWithIndex.map { case ((x, _, _), k) => (x, rank(k)) }
        }.toDF("node", "rank")
      return ranks
        .select(col("node").as("part"), r4(col("rank") * 1000).as("rank_pm"))
        .orderBy(col("rank_pm").desc, col("part"))
        .limit(20)
    }
    // Mid plane above this bound gives way to the big-graph planes;
    // conf-overridable so specs can force every plane on one fixture
    // (r11 — the hardcoded 16 M bound made the big planes untestable
    // at oracle SF).
    val bigGraph = m > spark.conf
      .getOption("spark.graft.graph.pagerankMidMax").map(_.toLong)
      .getOrElse(16000000L)
    // r10 small-graph iteration plane: the adjacency PACKED to node
    // grain — (src, deg, array<dst>); since v6 a published bucketed
    // plane, not a per-query groupBy. Row-grain alternatives were both
    // measured slower at sf0.1 (r10 notes): per-row checkpoint
    // scanning ~6 s of task CPU per iteration, parquet re-decode ~20%
    // more. The packed frame is ~2 k rows whose dst lists are
    // primitive long arrays, so the per-iteration join probes 2 k
    // rows and the 2.4 M contributions stream out of a codegen'd
    // explode.
    val adj =
      if (bigGraph) null
      else EdgeStore.packed(spark, dir)
        // hash(x, 8), not the scan's 32 buckets: at node grain the
        // iteration is TASK-floor-bound (~100 tasks/iter × ~50 ms on
        // a loaded host beat every per-row saving measured), so the
        // loop's task and job count are the lever. Hash-partitioned
        // on x with the loop's shuffle width so the per-iteration
        // rank join is co-partitioned — zero exchange, and no
        // per-iteration broadcast-build job either (10 of the loop's
        // 29 scheduler jobs were broadcast builds). v6: the pack
        // itself is the published plane — re-keying it here is a
        // node-grain exchange, no per-query pack agg.
        .repartition(8, col("x"))
        .cut() // node-grain packed adjacency: one row per src
    // Checkpoint cadence (both planes): every iteration. (Every-2nd
    // was tried per the r4 verdict and measured EQUAL, so the simpler
    // lineage wins.) AQE is off and the session shuffle width narrow
    // for the loop's duration — every exchange inside is node-grain
    // (r6 tuning, measured 3.2 → 2.1 s at sf0.1); the edge-scale work
    // rides the bucketed scan partitioning with no exchange at all.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevPart = spark.conf.get("spark.sql.shuffle.partitions")
    var ranks: DataFrame = null
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", if (bigGraph) "32" else "8")
      if (!bigGraph) {
        // mid plane: co-partitioned shuffled-hash join (hash(x,8) ⋈
        // hash(node,8), both pre-materialized): single stage per
        // round, no broadcast build, no exchange on the packed side
        val deg = adj.select(col("x").as("src"), col("deg"))
        val nDf = deg.agg(count(lit(1)).as("n"))
        val base = deg.crossJoin(broadcast(nDf))
          .select(col("src").as("node"), (lit(0.15) / col("n")).as("base"))
          .repartition(8, col("node"))
          .cut()
        ranks = deg.crossJoin(broadcast(nDf))
          .select(col("src").as("node"), (lit(1.0) / col("n")).as("rank"))
        for (i <- 1 to 10) {
          val scored = adj.join(ranks.hint("shuffle_hash"), col("x") === col("node"))
            .select((col("rank") / col("deg")).as("share"), col("dsts"))
            .select(col("share"), explode(col("dsts")).as("dst"))
          val contrib = scored.groupBy("dst").agg(sum(col("share")).as("contrib"))
          ranks = base
            .join(contrib, col("node") === col("dst"), "left")
            .select(col("node"),
              (col("base") + lit(0.85) * coalesce(col("contrib"), lit(0.0)))
                .as("rank"))
            .cut()
        }
      } else {
        // r11 big-graph rework (the r10 verdict's #1 "Done" bar — the
        // 206 s sf30 cell): the v5/r9 row plane paid TEN edge-grain
        // shuffles (repartition every (dst, share) contribution —
        // ~11 GB × 10 at sf30) plus ten |nodes|-row broadcast builds.
        // The published store is SYMMETRIC, so incoming(x) ≡
        // outgoing(x): each node's contribution sum can be grouped by
        // the node's OWN packed row — `groupBy(x)` rides the bucketed
        // scan's HashPartitioning(x), and the edge stream never
        // crosses the wire. Per iteration: one node-grain share
        // broadcast + one zero-exchange explode/probe/agg.
        val packedB = EdgeStore.packed(spark, dir)
        // node count: one node-grain count job (the EDGE count came
        // from the publish marker; nodes ≈ m/avg-degree, only needed
        // on the big planes where the query runs minutes)
        val nNodes = packedB.count()
        val b = 0.15 / nNodes
        // A |nodes|-grain broadcast is bounded by Spark's 8 GB /
        // 512 M-row broadcast cap, not by the corpus: past the
        // conf'd node bound the memory-oblivious r9 row plane takes
        // over (no broadcasts at all, contributions re-keyed by an
        // explicit exchange) — slower, but never builds node-grain
        // state in one place.
        val bcastMax = spark.conf
          .getOption("spark.graft.graph.pagerankBroadcastNodeMax")
          .map(_.toLong).getOrElse(32000000L)
        if (nNodes <= bcastMax) {
          // edge side = the bucketed wpairs ROW scan, not the packed
          // arrays: same bytes, same per-x row order (the pack was
          // built from this scan), but no per-row array materialization
          // — a hub's neighbor list never has to exist as ONE object
          // (the r9 memory objection to packing big graphs), and the
          // deg_x column rides the scan so the rank rebuild needs no
          // join. Measured equal to the packed/explode form at sf30
          // (13.3 vs 13.6 s/iteration); kept for the memory shape.
          ranks = packedB.select(col("x").as("node"),
            (lit(1.0) / nNodes).as("rank"), col("deg"))
          for (i <- 1 to 10) {
            val share = ranks.select(col("node").as("sy"),
              (col("rank") / col("deg")).as("share"))
            val contrib = wp
              .select(col("x"), col("deg_x"), col("y"))
              .join(broadcast(share), col("y") === col("sy"))
              .groupBy(col("x"), col("deg_x"))
              .agg(sum(col("share")).as("contrib"))
            ranks = contrib.select(col("x").as("node"),
              (lit(b) + lit(0.85) * col("contrib")).as("rank"),
              col("deg_x").as("deg"))
              .cut()
          }
          ranks = ranks.select(col("node"), col("rank"))
        } else {
          // huge-node fallback: the r9 memory-oblivious row plane.
          // Raw contributions repartition on dst BEFORE aggregating
          // (map-side combine on the dst key measured 159 GB of
          // sort-fallback spill at sf10 under an 8 GB heap — the agg
          // hash map must hold only its partition's keys); the rank
          // side joins shuffled-hash riding the bucketed scan (r11:
          // the v5 per-iteration |nodes|-row broadcast build is gone
          // from this plane too).
          val deg = packedB.select(col("x").as("src"), col("deg"))
          val shares = wp.select(col("x").as("src"), col("y").as("dst"),
            col("deg_x").as("deg"))
          val base = deg
            .select(col("src").as("node"), lit(b).as("base"))
            .repartition(32, col("node"))
            .cut()
          ranks = deg.select(col("src").as("node"), (lit(1.0) / nNodes).as("rank"))
          for (i <- 1 to 10) {
            val scored = shares
              .join(ranks.hint("shuffle_hash"), col("src") === col("node"))
              .select(col("dst"), (col("rank") / col("deg")).as("share"))
            val contrib = scored.repartition(col("dst"))
              .groupBy("dst").agg(sum(col("share")).as("contrib"))
            ranks = base
              .join(contrib, col("node") === col("dst"), "left")
              .select(col("node"),
                (col("base") + lit(0.85) * coalesce(col("contrib"), lit(0.0)))
                  .as("rank"))
              .cut()
          }
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevPart)
    }
    ranks
      .select(col("node").as("part"), r4(col("rank") * 1000).as("rank_pm"))
      .orderBy(col("rank_pm").desc, col("part"))
      .limit(20)
  }

  /** `revenue_discount_band` — the TPC-H Q6 shape (full oracle):
    * revenue given back per discount band inside a quantity slice —
    * the classic "what did the promotion cost" scan-heavy aggregate,
    * and the canonical predicate-pushdown showcase: the quantity
    * bound reaches the parquet reader (`PushedFilters`), so at
    * 100 TB the scan skips row groups wholesale before a single
    * discount multiply runs. One two-phase agg on the ~12-band
    * grain; output O(bands).
    */
  def revenueDiscountBand(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_quantity") < 24)
      .groupBy(round(col("l_discount") * 100).cast("long").as("disc_pct"))
      .agg(count(lit(1)).as("n_lines"),
        r4(sum(col("l_extendedprice") * col("l_discount"))).as("revenue_delta"))
      .orderBy("disc_pct")

  /** `orders_backlog` — daily open-order backlog (full oracle):
    * orders opened minus orders fully shipped (max line shipdate),
    * cumulated over the calendar — the operations number volume
    * counts can't give, the order-lifecycle sibling of
    * [[graft.operators.SliQueries.peakConcurrency]]'s session sweep.
    *
    * Scale: both event feeds collapse map-side to the day grain
    * (the per-order max-shipdate agg is the one corpus exchange);
    * the running sum walks the calendar-grain frame — the documented
    * single-partition caveat shared with `pareto_share`, swapped for
    * a range-partitioned two-pass prefix sum past calendar scale
    * (which a calendar never reaches).
    */
  def ordersBacklog(spark: SparkSession, dir: String): DataFrame = {
    val opened = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        lit(1L).as("opened"), lit(0L).as("shipped"))
    val shipped = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(max(to_date(col("l_shipdate"))).as("day"))
      .select(col("day"), lit(0L).as("opened"), lit(1L).as("shipped"))
    opened.unionAll(shipped)
      .groupBy("day")
      .agg(sum("opened").as("n_opened"), sum("shipped").as("n_shipped"))
      .withColumn("backlog", sum(col("n_opened") - col("n_shipped")).over(
        Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  /** `supplier_hhi` — supply-concentration report per part type
    * (full oracle): Herfindahl–Hirschman index (Σ share²) of supplier
    * revenue, supplier count, and the top supplier's share — the
    * single-vendor-risk number a supply-chain review reads
    * ([[paretoShare]]'s concentration math applied to the supplier
    * dimension, as an INDEX rather than a curve).
    *
    * Scale: the part hop is a partkey-KEYED join (part is SF-scaled
    * — the corpus-proportional-dimension convention; AQE elects BHJ
    * when it is actually small); the (type, supplier) revenue
    * rollup partial-aggregates map-side (the one corpus exchange);
    * totals are a types-grain broadcast back; HHI folds on the
    * supplier-dimension grain. All divisions are by positive totals.
    */
  def supplierHhi(spark: SparkSession, dir: String): DataFrame = {
    // r11 (the r10 verdict's item #3): the part hop through
    // [[dimRegime]] — unchanged inside broadcast range; past it the
    // shuffled-hash pick keeps the 100 TB fact side sort-free instead
    // of Catalyst's sort-merge fallback sorting lineitem.
    val s = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(dimRegime(spark, dir, "part",
          Tables.part(spark, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_type", "l_suppkey")
      .agg(sum("l_extendedprice").as("rev"))
    val t = s.groupBy("p_type")
      .agg(sum("rev").as("tot"), count(lit(1)).as("n_suppliers"))
    s.join(broadcast(t), "p_type")
      .groupBy("p_type")
      .agg(max("n_suppliers").as("n_suppliers"),
        r4(sum((col("rev") / col("tot")) * (col("rev") / col("tot")))).as("hhi"),
        r4(max("rev") / max("tot")).as("top1_share"))
      .orderBy("p_type")
  }

  /** `fuzzy_name_pairs` — blocked edit-distance entity resolution on
    * the part catalog (full oracle): candidate duplicate name pairs =
    * same trailing noun (the blocking key) AND `levenshtein ≤ 4`,
    * canonicalized `name_a < name_b`. The catalog-side sibling of the
    * document near-dup lanes: dirty product/entity catalogs dedupe by
    * block-then-verify, never all-pairs — same candidate-generation
    * discipline as MinHash LSH, with a linguistic key instead of a
    * hash band.
    *
    * Scale: names collapse to the DISTINCT name domain map-side
    * BEFORE any pairing (catalog-row count never enters the join);
    * the self-join shuffles both sides once on the block key, and
    * pair work is quadratic only within a block (the blocking-key
    * design constraint, documented exactly like the LSH bucket bound;
    * a skew-hostile catalog would sub-block on a name-length band).
    * levenshtein is codegen'd in both engines.
    */
  def fuzzyNamePairs(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .select(col("p_name").as("name")).distinct()
      .withColumn("noun", regexp_extract(col("name"), "([a-z]+)$", 1))
    names.as("a")
      .join(names.as("b"),
        col("a.noun") === col("b.noun") && col("a.name") < col("b.name"))
      .where(levenshtein(col("a.name"), col("b.name")) <= 4)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"))
      .orderBy("name_a", "name_b")
  }

  /** `rfm_segments` — RFM customer segmentation (full oracle):
    * per-customer Recency (days from the customer's last order to
    * the corpus's max order date — a data-derived anchor, so the
    * report is reproducible on any snapshot), Frequency (order
    * count), Monetary (total spend), each quartiled with `ntile(4)`
    * under a TOTAL order (metric, then custkey — ties rank
    * identically cross-engine), then the 4×4×4 segment grid with
    * customer counts and average spend. The marketing-ops
    * counterpart of [[paretoShare]]'s concentration report.
    *
    * Scale: orders collapse map-side to customer grain (ONE corpus
    * exchange); the three ntile windows run on the customer
    * dimension — the documented single-partition caveat shared with
    * `ntile_quartiles`/`pareto_share` (swap for range-partitioned
    * two-pass ranking past customer-dimension scale); the grid agg
    * is 64 rows at any corpus size. The max-date anchor is a
    * single-row broadcast.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val anchor = Tables.orders(spark, dir)
      .agg(max(to_date(col("o_orderdate"))).as("maxd"))
    val cust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(max(to_date(col("o_orderdate"))).as("lastd"),
        count(lit(1)).as("freq"),
        sum("o_totalprice").as("mon"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"), datediff(col("maxd"), col("lastd")).as("rec"),
        col("freq"), col("mon"))
    val scored = cust.select(
      ntile(4).over(Window.orderBy(col("rec"), col("o_custkey")))
        .cast("long").as("r"),
      ntile(4).over(Window.orderBy(col("freq").desc, col("o_custkey")))
        .cast("long").as("f"),
      ntile(4).over(Window.orderBy(col("mon").desc, col("o_custkey")))
        .cast("long").as("m"),
      col("mon"))
    scored.groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_customers"), r4(avg("mon")).as("avg_monetary"))
      .orderBy("r", "f", "m")
  }

  /** `weighted_median_price` — quantity-weighted median extended
    * price per return flag (full oracle): the first price whose
    * running weight reaches half the group's total — the
    * inventory-weighted "typical price" that the unweighted median
    * misstates whenever cheap items ship in bulk. Neither engine has
    * a weighted-percentile aggregate; the portable exact form is the
    * cumulative-weight cutover under a TOTAL order (price, orderkey,
    * linenumber — running weight is strictly increasing within a
    * group, so the rank-1 pick is deterministic in both engines).
    *
    * Scale — the two-pass histogram algorithm, NOT a corpus sort
    * (prices are near-unique doubles, so a distinct-price collapse
    * buys nothing — measured 7.6 s at sf1 for the windowed form vs
    * sub-second here):
    *   pass 1 folds the corpus map-side into a (flag, ⌊price⌋)
    *   dollar histogram (any MONOTONE bucketing preserves cumulative
    *   order, so bucket arithmetic never affects the answer); a
    *   bucket-grain running sum locates the single bucket where the
    *   cumulative weight crosses half, plus the exact mass before it.
    *   pass 2 rescans only rows of that one bucket per flag
    *   (corpus/buckets rows), collapses them by exact price, and
    *   finds the cutover with bucket-local cumulative + the carried
    *   prefix — identical to the global running sum by construction
    *   (weights are whole-number doubles; all sums exact).
    * Both exchanges carry histogram/bucket-grain rows; the corpus is
    * scanned twice and shuffled never. With an adversarial
    * single-bucket weight distribution the recursion is the same
    * trick one level down (or the weighted-GK sketch, same report).
    */
  def weightedMedianPrice(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("p"),
        col("l_quantity").as("w"))
    val hist = li.groupBy(col("flag"), floor(col("p")).as("b"))
      .agg(sum("w").as("bw"))
    val cum = hist
      .withColumn("cb", sum("bw").over(
        Window.partitionBy("flag").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum("bw").over(Window.partitionBy("flag")))
    val target = cum
      .where(col("cb") >= col("tw") / 2 && col("cb") - col("bw") < col("tw") / 2)
      .select(col("flag"), col("b"), (col("cb") - col("bw")).as("before"),
        col("tw"))
    li.join(broadcast(target),
        li("flag") === target("flag") && floor(li("p")) === target("b"))
      .drop(target("flag"))
      .groupBy("flag", "p", "before", "tw")
      .agg(sum("w").as("pw"))
      .withColumn("cw", col("before") + sum("pw").over(
        Window.partitionBy("flag").orderBy("p")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cw") >= col("tw") / 2)
      .withColumn("rn", row_number().over(
        Window.partitionBy("flag").orderBy("p")))
      .where(col("rn") === 1)
      .select(col("flag"), r4(col("p")).as("weighted_median"),
        r4(col("tw").cast("double")).as("total_weight"))
      .orderBy("flag")
  }

  /** `blame_supplier` — the TPC-H Q21 shape (public knowledge)
    * adapted to this schema: suppliers who were the SOLE overdue
    * shipper on multi-supplier orders (shipdate > orderdate + 75
    * days), top-10 by blamed-order count. The doubly-correlated
    * EXISTS / NOT EXISTS over other rows of the same fact table —
    * the hardest decorrelation shape in the TPC-H suite, here
    * expressed directly as the left-semi ("some other supplier
    * shipped this order") + left-anti ("no other supplier was
    * late") joins Catalyst decorrelates Q21 into anyway.
    *
    * Scale shape (r10 — the r9 verdict's 294 s / 45 GB-spill sf30
    * cell): the doubly-correlated EXISTS / NOT EXISTS does NOT need
    * the fact-fact semi + anti joins Catalyst decorrelates Q21 into —
    * "sole overdue shipper on a multi-supplier order" is a PER-ORDER
    * conditional aggregation. Dedup to (order, supplier, was-late)
    * grain, then per order count suppliers, count late suppliers, and
    * take `min(when(late, supp))` — on the filter `n_supp > 1 &&
    * n_late = 1` that min is exactly the one blamed supplier, so each
    * blamed order contributes the same single supplier the join form
    * produced (the unchanged oracle hash is the proof). Both groupBys
    * ride the orderkey partitioning the orders join already
    * established (HashPartitioning(orderkey) satisfies the
    * (orderkey, suppkey) clustering requirement), so past broadcast
    * range the whole pipeline is ONE orderkey exchange and the fact
    * frame is never joined against itself. The name lookup is a
    * suppkey-keyed join of two supplier-grain frames (supplier is
    * SF-scaled — the corpus-proportional-dimension convention, r6
    * verdict; AQE still elects BHJ when it is actually small);
    * top-10 is TakeOrdered with the (count DESC, name) total order.
    *
    * Contract note (r5 advice): we aggregate by `l_suppkey` and join
    * the name on AFTER; the oracle groups by `s_name` post-join. The
    * two agree only while `s_name` is unique per supplier — true of
    * this generator (and TPC-H's `Supplier#%09d` names) and pinned by
    * InvariantSpec's name-uniqueness check, so a duplicate-name feed
    * fails loudly there instead of silently merging oracle rows.
    */
  def blameSupplier(spark: SparkSession, dir: String): DataFrame = {
    // r11 (the r10 verdict's items #3/#6): the orders hop goes through
    // [[dimRegime]] with the build side PROJECTED to (o_orderkey,
    // o_orderdate) — bench-SF plans unchanged (orders broadcasts
    // there); past broadcast range the shuffled-hash pick keeps the
    // fact side sort-free and the exchange narrow. The fact side is
    // projected to the three columns the dedup agg needs before the
    // join (guide §2.3).
    val perSupp = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(dimRegime(spark, dir, "orders",
          Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 75 DAYS")).as("late"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("supp_late"))
    val blamed = perSupp
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        count(when(col("supp_late"), lit(1))).as("n_late"),
        min(when(col("supp_late"), col("l_suppkey"))).as("l_suppkey"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    blamed.groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .join(dimRegime(spark, dir, "supplier",
          Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** `revenue_gini_by_segment` — Gini coefficient of per-customer
    * revenue within each market segment (full oracle): the
    * single-number inequality summary that completes the
    * concentration family — pareto_share draws the cumulative curve,
    * supplier_hhi squares the shares, Gini integrates the curve via
    * the classic ranked-sum identity `G = (2·Σ r·x − (n+1)·Σx) /
    * (n·Σx)`. Ranks are `row_number` over (revenue, custkey) — an
    * exact-tie rank swap moves Σ r·x by (Δr)(Δx) ≈ 0, so the r4
    * grid is insensitive to cross-engine tie order.
    *
    * Scale: the per-customer revenue rollup is the one fact-sized
    * exchange; the ranked sum is a segment-partitioned
    * customer-DIMENSION window (pareto_share class, same documented
    * two-pass PrefixOps swap past dimension scale); the output is
    * segment-grain.
    */
  def revenueGiniBySegment(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .select("o_custkey", "o_totalprice")
      // r11: customer hop through dimRegime with a projected build
      // side — same bench-SF plan; sort-free fact side past broadcast
      // range (guide §3.1)
      .join(dimRegime(spark, dir, "customer",
          Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
      .agg(sum("o_totalprice").as("x"))
    val w = Window.partitionBy("seg").orderBy(col("x"), col("c_custkey"))
    val n = count(lit(1))
    rev.withColumn("r", row_number().over(w))
      .groupBy("seg")
      .agg(
        n.as("n_cust"),
        r4((lit(2.0) * sum(col("r") * col("x")) - (n + lit(1)) * sum(col("x"))) /
          (n * sum(col("x")))).as("gini"),
        r2(sum("x")).as("total_rev"))
      .orderBy("seg")
  }

  /** `idle_rich_customers` — the TPC-H Q22 shape (public knowledge)
    * adapted to this schema: customers with above-average positive
    * account balance and NO order since 2000-01-01, rolled up per
    * nation — the "dormant high-value accounts" report. Exercises
    * the Q22 operator combo: an uncorrelated scalar subquery (the
    * global average balance) feeding a filter, plus an anti join
    * against a date-filtered fact slice.
    *
    * Scale shape: the average is a single-row broadcast; the recent-
    * order slice pushes its date bound into the orders scan
    * (PushedFilters) and anti-joins on custkey — customer-dimension
    * keyed, AQE-sizable; the nation dimension broadcasts onto the
    * nation-grain rollup.
    */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ab = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal").as("ab"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
      .select("o_custkey")
    cust.crossJoin(broadcast(ab))
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"), r2(sum("c_acctbal")).as("totacctbal"))
      .orderBy("n_name")
  }

  /** `degree_dist` — log₂-binned degree distribution of the
    * ≥2-support co-purchase graph: per power-of-two bucket, node
    * count and the realized degree range. The scale-free-or-not
    * diagnostic that complements [[graft.operators.GraphOps
    * .triangleParts]]' closure view — a heavy-tailed degree curve is
    * what makes degree-ORDERED triangle counting and skew-aware
    * joins necessary in the first place (skew_profile's lesson,
    * measured on the graph itself).
    *
    * The bucket is `length(bin(deg)) − 1` — floor(log₂) computed
    * EXACTLY on the integer's binary representation, not via
    * `floor(ln(d)/ln(2))`, whose libm last-ulp differences between
    * engines can flip the floor at exact powers of two.
    *
    * Scale: edge build is the audited copurchase shape; degree is
    * one partial-agg'd node-grain exchange; buckets are ≤64 rows.
    */
  def degreeDist(spark: SparkSession, dir: String): DataFrame = {
    val deg = GraphOps.degrees(spark, dir) // exchange-free off the bucketed store
    deg.groupBy((length(bin(col("deg"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min("deg").as("min_deg"), max("deg").as("max_deg"))
      .orderBy("bucket")
  }

  /** `price_position` — the premium tail per brand (full oracle):
    * every part whose retail price sits at or above the 95th
    * percentile position within its brand, with its exact
    * `percent_rank` and `cume_dist` — the two distribution-position
    * window functions the coverage checklist lacked (rank/dense_rank/
    * row_number/ntile are elsewhere). Both are rank-derived rationals
    * of integer counts — (rank−1)/(n−1) and peers≤x/n — so the ≥0.95
    * cut and the output values are exact IEEE quotients, identical
    * across engines with NO rounding needed for the filter (r4 only
    * formats the output).
    *
    * Scale note: the window partitions by brand — a FIXED-cardinality
    * dimension whose per-partition row count grows with the part
    * dimension (the pareto_share class, documented swap: the
    * range-partitioned two-pass rank in PrefixOps replaces the
    * per-brand sort at the scale where a brand's parts no longer fit
    * one task; the filter and both statistics are unchanged since
    * they derive from (rank, n) pairs).
    */
  def pricePosition(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    Tables.part(spark, dir)
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter(col("pct_rank") >= 0.95)
      .select(col("p_brand"), col("p_partkey"),
        r4(col("pct_rank")).as("pct_rank"), r4(col("cume")).as("cume"))
      .orderBy("p_brand", "p_partkey")
  }

  /** `returned_revenue` — the TPC-H Q10 shape (public knowledge)
    * adapted to this schema: top-20 customers by revenue lost to
    * returned items (`l_returnflag = 'R'`) over one order year, with
    * the customer's nation — the "who is returning the most" report
    * of a returns desk.
    *
    * Scale shape: both fact scans are pre-filtered AT THE SCAN
    * (returnflag equality and the orderdate year range both land in
    * PushedFilters); the fact-fact join is orderkey-keyed; revenue is
    * aggregated to CUSTKEY grain BEFORE any dimension joins, so the
    * customer join (custkey-keyed shuffle — customer is
    * corpus-proportional, never broadcast) carries one row per
    * customer, not per lineitem; nation broadcasts onto it; top-20 is
    * TakeOrdered on the rounded (revenue DESC, custkey) total order.
    */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lost = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(dimRegime(spark, dir, "orders", Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(r2(sum("rev")).as("revenue"))
    lost
      .join(dimRegime(spark, dir, "customer", Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** `small_qty_revenue` — the TPC-H Q17 decorrelation shape (public
    * knowledge): per brand, the yearly-average revenue carried by
    * "trickle" lineitems whose quantity is below 20% of their part's
    * mean quantity — the classic correlated scalar subquery
    * (`l_quantity < 0.2 * (SELECT avg … WHERE same part)`) expressed
    * directly as the per-part aggregate + join Catalyst decorrelates
    * it into.
    *
    * Scale shape: the per-part average, the fact probe, and the part
    * dimension are ALL partkey-keyed — one partitioning carries the
    * whole pipeline (no re-key; part is corpus-proportional, so the
    * dim hop is a co-keyed shuffle join, not a broadcast); the final
    * agg collapses to the 25-row brand grain map-side.
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val perPart = l.groupBy("l_partkey")
      .agg((lit(0.2) * avg("l_quantity")).as("lim"))
      .withColumnRenamed("l_partkey", "pa_partkey")
    // r11: the per-part threshold frame and the brand attach are both
    // partkey-DIMENSION-grain — route them through dimRegime (the
    // part table's bytes as the statistic; perPart is one row per
    // observed partkey, the same cardinality class) so past broadcast
    // range neither join sort-merges the fact side
    l.join(dimRegime(spark, dir, "part", perPart),
        col("l_partkey") === col("pa_partkey"))
      .filter(col("l_quantity") < col("lim"))
      .join(dimRegime(spark, dir, "part",
          Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        r2(sum("l_extendedprice") / 7.0).as("avg_yearly"))
      .orderBy("p_brand")
  }

  /** `bulk_orders` — the TPC-H Q18 shape (public knowledge): orders
    * whose total quantity across all lines exceeds 300 units, with
    * their customer — the large-volume-order audit (group-HAVING on
    * a fact rollup re-joined to both parents).
    *
    * Scale shape: the lineitem rollup and the orders join share the
    * orderkey partitioning (no re-key); the HAVING cut drops all but
    * the extreme tail before anything wide is carried; top-20 is
    * TakeOrdered on (o_totalprice DESC, o_orderkey); the customer
    * names attach AFTER the cut by broadcasting the 20-row result
    * against the customer table — the corpus-sized dimension is
    * probed, never shuffled.
    */
  def bulkOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 300)
    val top = big
      // r11: orders hop through dimRegime — past broadcast range the
      // shuffled-hash pick builds the POST-HAVING tail frame (`big` is
      // hinted via the orderkey domain's source-table statistic) and
      // streams orders sort-free
      .join(dimRegime(spark, dir, "orders", Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
    broadcast(top)
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** `top_supplier_window` — the TPC-H Q15 shape (public knowledge):
    * the supplier(s) with the maximum revenue over a 3-month shipdate
    * window — the scalar-subquery-max-over-a-view report.
    *
    * Scale shape: the shipdate range is scan-pruned; revenue
    * collapses to supplier grain map-side; the max is a single-row
    * frame cross-broadcast back onto the supplier-grain rollup (the
    * view is computed ONCE and reused for both sides via a local
    * checkpoint-free self-reference — Spark re-runs the cheap rollup,
    * each run identical because the r2 grid fixes summation noise
    * before the equality compare). The name lookup broadcasts the
    * MAX-FILTERED rollup (≈1 row — ties only) as the BUILD side
    * against a streamed suppkey-keyed supplier scan — the r6 verdict
    * caught the previous orientation (supplier as the build side),
    * which broadcast a data-proportional dimension to serve a
    * 1-row probe.
    */
  def topSupplierWindow(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("total_rev"))
    val mx = rev.agg(max("total_rev").as("max_rev"))
    val winners = rev.join(broadcast(mx), col("total_rev") === col("max_rev"))
    Tables.supplier(spark, dir)
      .join(broadcast(winners), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  /** `promo_share_monthly` — the TPC-H Q14 shape (public knowledge):
    * per ship month over one year, the percentage of revenue carried
    * by PROMO-type parts — the marketing-effect monitor (conditional
    * share inside a time-bucketed agg).
    *
    * Scale shape: the shipdate year is scan-pruned; the part hop is a
    * partkey-keyed shuffle join (part is corpus-proportional — only
    * `p_type` rides along); the agg collapses to the 12-row month
    * grain map-side. The share is a ratio of two sums computed in the
    * SAME agg — one pass, no self-join.
    */
  def promoShareMonthly(spark: SparkSession, dir: String): DataFrame = {
    val promoRev = sum(when(col("p_type") === "PROMO",
      col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0))
    val totalRev = sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(dimRegime(spark, dir, "part",
          Tables.part(spark, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(to_date(date_trunc("month", col("l_shipdate"))).as("month"))
      .agg(r4(promoRev * 100.0 / totalRev).as("promo_share"),
        r2(totalRev).as("total_rev"))
      .orderBy("month")
  }

  /** `nation_market_share` — the TPC-H Q8 shape (public knowledge):
    * within the EUROPE customer market, the share of lineitem revenue
    * supplied by NATION_3, per order year — the national-market-share
    * trend (two independent dimension chains hanging off the same
    * fact row: the customer side scopes the market, the supplier side
    * defines the share).
    *
    * Scale shape: the customer-side chain (customer ⋈ nation ⋈
    * region, region-filtered) reduces to a custkey frame via
    * broadcast dim hops BEFORE touching facts (nation/region are
    * genuinely bounded — 25/5 rows at ANY scale); the fact-fact join
    * is orderkey-keyed, then one custkey re-key scopes the market;
    * the supplier→nation mapping joins suppkey-KEYED — supplier is
    * SF-scaled (TPC-H: 10k×SF), so it follows the repo-wide
    * corpus-proportional-dimension convention (cheapest_supplier's
    * scaladoc states it): partkey/suppkey-keyed joins, never a
    * forced broadcast; AQE still elects a runtime BHJ when the dim
    * is actually small. The agg collapses to the ~7-row year grain
    * map-side. Share and total come from ONE conditional agg.
    */
  def nationMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val eurCust = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    // r11: the fact joins against eurCust (customer-derived) and
    // supNat (supplier-derived) go through dimRegime with the SOURCE
    // table's bytes as the decision statistic — conservative (both
    // frames are filtered/projected slices of their dim), so the
    // shuffled-hash pick can only engage at or before the scale where
    // sort-merge would start sorting the fact side.
    val supNat = dimRegime(spark, dir, "supplier", Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val natRev = sum(when(col("supp_nation") === "NATION_3",
      col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0))
    val totRev = sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(dimRegime(spark, dir, "orders", Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dimRegime(spark, dir, "customer", eurCust),
        col("o_custkey") === col("c_custkey"))
      .join(supNat, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(r4(natRev * 100.0 / totRev).as("mkt_share"),
        r2(totRev).as("region_rev"))
      .orderBy("o_year")
  }

  /** `cheapest_supplier` — the TPC-H Q2 shape (public knowledge)
    * restated without a partsupp table: for every PROMO part, the
    * supplier(s) whose observed average unit sale price
    * (`l_extendedprice / l_quantity`) is the part's minimum — the
    * correlated-scalar-min subquery Catalyst decorrelates into a
    * per-group min + equality join, the procurement desk's "who
    * sells this cheapest" report.
    *
    * Scale shape: one (partkey, suppkey)-grain avg from a single fact
    * scan (2-phase hash agg), the per-part min on the partkey-grain
    * frame, and the equality join back — all three partkey-keyed, so
    * the decorrelation rides one partitioning. The equality compares
    * on the r2 grid (identical in the oracle) so per-engine summation
    * order can't flip a min tie. The part filter lands in the part
    * scan's PushedFilters; part and supplier are corpus-proportional
    * dims — partkey/suppkey-keyed joins, never assumed broadcastable.
    */
  def cheapestSupplier(spark: SparkSession, dir: String): DataFrame = {
    // r7 plan fix (caught by the sf3 row: 2x the suite's next-worst
    // query): the previous shape computed the (partkey, suppkey)
    // corpus agg TWICE — once for the rows, once for the per-part
    // min — and applied the PROMO part filter only AFTER both. Now
    // the filter prunes the FACT SCAN (partkey semi-join before the
    // agg: only ~1/5 of lineitem survives into the exchange), and the
    // per-part min is a partkey-partitioned window over the SAME
    // aggregated frame — one corpus pass total, no self-join, no
    // recompute. Oracle unchanged; the hash match proves equivalence
    // (min-filter-join == window-min-filter on the r2 grid).
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val ps = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      // r11: both dim hops through dimRegime (guide §3.1) — the PROMO
      // key-set prune and the name attach stay broadcast at bench SF,
      // go shuffled-hash (fact/frame side sort-free) past it
      .join(dimRegime(spark, dir, "part", promoParts),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "l_suppkey")
      .agg(r2(avg(col("l_extendedprice") / col("l_quantity")))
        .as("unit_price"))
    val w = Window.partitionBy("p_partkey")
    ps.withColumn("best_price", min("unit_price").over(w))
      .filter(col("unit_price") === col("best_price"))
      .join(dimRegime(spark, dir, "supplier",
          Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("best_price"))
      .orderBy("p_partkey", "s_suppkey")
  }

  /** `nation_trade_volume` — the TPC-H Q7 shape (public knowledge):
    * shipping volume between two trading nations per order year, both
    * directions kept separate — the bilateral-trade report whose plan
    * signature is TWO independent dim chains off the same fact row
    * with a SYMMETRIC pair predicate.
    *
    * Scale shape: each side's nation filter is applied AT THE
    * DIMENSION (supplier and customer each broadcast-join their tiny
    * nation dim and drop to the two nations of interest BEFORE any
    * fact touch), so the fact joins run against two heavily
    * pre-reduced key sets; the pair predicate needs no OR evaluation
    * post-join — restricting each side to {A,B} and dropping the
    * diagonal (`supp_nation <> cust_nation`) is equivalent and keeps
    * both joins pure equi-joins. Year grain collapses map-side.
    */
  def nationTradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_3", "NATION_12")
    // r11: both nation-filtered dim slices and the orders hop through
    // dimRegime (source-table bytes as the conservative statistic)
    val supp = dimRegime(spark, dir, "supplier", Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = dimRegime(spark, dir, "customer", Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name").isin(nations: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(dimRegime(spark, dir, "orders",
          Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_lines"), r2(sum("rev")).as("volume"))
      .orderBy("supp_nation", "cust_nation", "o_year")
  }

  /** `major_parts` — the TPC-H Q11 shape (public knowledge): parts
    * whose revenue exceeds 1.5× the average per-part revenue — a
    * group-HAVING filter against a GLOBAL scalar, the "important
    * stock" report whose plan signature is a single-row aggregate
    * broadcast back onto the grouped frame.
    *
    * Scale shape: one fact scan collapses to partkey grain (2-phase);
    * the global threshold is a single-row agg over that partkey-grain
    * frame, cross-broadcast back onto it (the rollup is recomputed
    * per branch pre-AQE — cheap, and deterministic because both
    * branches round to the r2 grid before comparing, so summation
    * order can't flip a borderline part); the name attach joins the
    * corpus-proportional part dim partkey-keyed.
    */
  def majorParts(spark: SparkSession, dir: String): DataFrame = {
    val pr = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("part_rev"))
    val thr = pr.agg(r2(avg("part_rev") * 1.5).as("cut"))
    pr.join(broadcast(thr), col("part_rev") > col("cut"))
      // r11: name attach through dimRegime — past broadcast range the
      // shuffled-hash pick spares both partkey-grain frames the
      // sort-merge sorts
      .join(dimRegime(spark, dir, "part",
          Tables.part(spark, dir).select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("part_rev"))
      .orderBy(col("part_rev").desc, col("p_partkey"))
  }

  /** `supplier_variety` — the TPC-H Q16 shape (public knowledge):
    * how many distinct suppliers serve each (part type, size band),
    * excluding an undesirable supplier set (here: `s_acctbal < 1000`,
    * standing in for Q16's complaint suppliers) — count-distinct over
    * a join with a NOT-IN exclusion.
    *
    * Scale shape: the fact first collapses to the bounded
    * (type, band, suppkey) distinct grain (2-phase hash agg — the
    * dedup happens map-side at the scan, so the exclusion join never
    * sees fact-grain rows); the NOT IN is a left-anti join ON THE
    * COLLAPSED frame, suppkey-keyed (the exclusion list is
    * corpus-proportional — an acctbal slice of supplier — so it is
    * NOT assumed broadcastable); the part hop is partkey-keyed. The
    * exclusion predicate lands in the supplier scan's PushedFilters.
    */
  def supplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 1000).select("s_suppkey")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      // r11: part hop and the anti-join exclusion through dimRegime
      .join(dimRegime(spark, dir, "part",
          Tables.part(spark, dir).select(col("p_partkey"), col("p_type"),
          floor(col("p_size") / 10).cast("long").as("band"))),
        col("l_partkey") === col("p_partkey"))
      .select("p_type", "band", "l_suppkey").distinct()
      .join(dimRegime(spark, dir, "supplier", excl),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_type", "band")
      .agg(count(lit(1)).as("n_supp"))
      .orderBy("p_type", "band")
  }

  /** `dominant_suppliers` — the TPC-H Q20 shape (public knowledge)
    * restated without partsupp: suppliers who shipped MORE THAN HALF
    * of some part's total 1996 quantity — the nested-IN-with-
    * correlated-threshold pattern (supplier IN (… WHERE qty >
    * 0.5 × (SELECT sum …))), decorrelated into a two-level rollup +
    * ratio filter + distinct projection.
    *
    * Scale shape: the 1996 window is scan-pruned; the fact collapses
    * to (partkey, suppkey) grain map-side; the part total is a
    * partkey-grain re-agg of that frame and the threshold join rides
    * the same partkey partitioning. Quantities are integral doubles,
    * so the sums and the 0.5× compare are EXACT in both engines — no
    * rounding grid needed. The final distinct-supplier projection is
    * a suppkey-grain agg; supplier and nation attach after it
    * (suppkey-keyed join + broadcast nation).
    */
  def dominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val psq = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("q"))
    val pt = psq.groupBy("l_partkey").agg(sum("q").as("tq"))
    // r11: the per-part total frame is partkey-DIMENSION grain — the
    // small_qty_revenue treatment (dimRegime on the part-domain
    // statistic) keeps the (partkey, suppkey) frame sort-free past
    // broadcast range
    psq.join(dimRegime(spark, dir, "part",
        pt.select(col("l_partkey").as("t_partkey"), col("tq"))),
        col("l_partkey") === col("t_partkey"))
      .filter(col("q") > col("tq") * 0.5)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_parts_dominated"))
      .join(dimRegime(spark, dir, "supplier", Tables.supplier(spark, dir)
          .select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_parts_dominated"))
      .orderBy("s_suppkey")
  }

  /** `name_entity_clusters` — entity resolution over the catalog's
    * name space (full oracle): fuzzy_name_pairs' candidate edges
    * (same trailing-noun block, levenshtein ≤ 4) closed into
    * connected components — one row per multi-name ENTITY with its
    * canonical (minimum) name and member count. The step every
    * record-linkage pipeline takes after pairwise matching: pair
    * lists aren't entities until the transitive closure makes
    * membership globally consistent (the dedup_clusters argument,
    * replayed on dimension names instead of documents).
    *
    * Scale: blocking bounds the pair join (noun-key equi-join, never
    * name×name); components run through the shared Hash-Min
    * [[GraphOps.connectedComponents]] — log-diameter rounds, string
    * labels compare fine (min/least are total on strings). Oracle:
    * the same reach closure as dedup_clusters' recursive CTE.
    */
  def nameEntityClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = fuzzyNamePairs(spark, dir)
      .select(lit("all").as("part"), col("name_a").as("a"),
        col("name_b").as("b"))
    GraphOps.connectedComponents(pairs)
      .groupBy(col("lbl").as("entity_id"))
      .agg(count(lit(1)).as("n_names"))
      .orderBy("entity_id")
  }

  /** `isotonic_return_rate` — weighted isotonic (monotone
    * non-decreasing) regression of return rate on discount over the
    * 11-value discount grid (full oracle): the calibration step that
    * turns a noisy per-bucket rate curve into the monotone curve a
    * pricing/risk model can threshold on. Computed via the MINIMAX
    * identity `iso_i = max_{j≤i} min_{k≥i} wavg(j..k)` — the closed
    * form of the pool-adjacent-violators solution (Ayer et al. 1955;
    * Robertson/Wright/Dykstra 1988, public knowledge) — which is
    * PURE relational algebra over interval aggregates: prefix sums
    * on the bucket frame give every interval's weighted rate, one
    * ≤11³ triple join + two-level min/max agg gives the fit. No
    * iteration, no driver loop; bit-identical cross-engine because
    * every term is an exact-count ratio and min/max pick, so the
    * oracle needs no tolerance. IsotonicSpec checks the minimax
    * form against a driver-side PAVA replay + monotonicity.
    *
    * Scale: after the one corpus-grain (discount)-agg, everything is
    * on the 11-row grid; with B buckets the triple join is O(B³) —
    * for the 100-1000-bucket calibration curves of practice still a
    * broadcast-size frame (1e9 rows would call for the O(B) PAVA
    * stack on a single partition of the BUCKET frame, documented).
    */
  def isotonicReturnRate(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(spark, dir)
      .groupBy(col("l_discount").as("disc"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
    val wIncl = Window.orderBy("disc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBefore = Window.orderBy("disc")
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = b
      .withColumn("cw", sum("n").over(wIncl))
      .withColumn("cr", sum("r").over(wIncl))
      .withColumn("pw", coalesce(sum("n").over(wBefore), lit(0L)))
      .withColumn("pr", coalesce(sum("r").over(wBefore), lit(0L)))
      .cut() // ≤11 rows, four consumers below
    val intervals = c.select(col("disc").as("dj"), col("pw"), col("pr"))
      .join(c.select(col("disc").as("dk"), col("cw"), col("cr")),
        col("dj") <= col("dk"))
      .select(col("dj"), col("dk"),
        ((col("cr") - col("pr")) / (col("cw") - col("pw"))).as("iavg"))
    val innerMin = c.select(col("disc").as("di"))
      .join(intervals, col("dj") <= col("di") && col("di") <= col("dk"))
      .groupBy("di", "dj").agg(min("iavg").as("minv"))
    val fitted = innerMin.groupBy("di").agg(max("minv").as("iso"))
    b.join(fitted, col("disc") === col("di"))
      .select(r2(col("disc")).as("discount"), col("n"),
        r4(col("r") / col("n")).as("raw_rate"),
        r4(col("iso")).as("iso_rate"))
      .orderBy("discount")
  }

  /** `skyline_parts` — the Pareto frontier of the part catalog
    * (full oracle): parts for which no other part is both cheaper-or-
    * equal AND bigger-or-equal with at least one strict — the classic
    * skyline operator (Börzsönyi et al., ICDE 2001 "The Skyline
    * Operator", public knowledge), the "best price/size trade-offs"
    * readout of every catalog browse.
    *
    * Plan: dominance over two totally-ordered criteria collapses to
    * ONE running max — sort the PRICE-grain frame (one row per
    * distinct price, carrying that price's max size) ascending and a
    * part is dominated iff the strict-prefix cummax reaches its size
    * (`smax >= p_size`, a strictly cheaper part at least as big) or
    * its own price group holds a strictly bigger part
    * (`gmax > p_size`). No self-join, no NOT EXISTS — the oracle
    * keeps the quadratic form so the hash match proves the
    * equivalence. The cummax window is unpartitioned but runs on the
    * price-grain frame — bounded by the part CATALOG (the
    * price_position argument), not the fact corpus; past catalog
    * scale the swap is the textbook two-phase skyline (per-slice
    * local frontier → frontier-of-frontiers, a PrefixOps-shaped
    * prefix-MAX) — WIRED as [[skylineParts2p]], which carries this
    * query's own oracle so the hash gate proves the equivalence
    * (the pareto_share_prefix playbook).
    */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("p_size"))
    val priceGrain = parts.groupBy("p_retailprice")
      .agg(max("p_size").as("gmax"))
      .withColumn("smax", max("gmax").over(
        Window.orderBy("p_retailprice")
          .rowsBetween(Window.unboundedPreceding, -1)))
    parts.join(priceGrain, Seq("p_retailprice"))
      .filter(coalesce(col("smax") < col("p_size"), lit(true)) &&
        col("gmax") === col("p_size"))
      .select(col("p_partkey"), col("p_name"),
        r2(col("p_retailprice")).as("price"), col("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }

  /** `skyline_parts_2p` — the two-phase skyline [[skylineParts]]'s
    * scaladoc promises, wired and carrying the SAME oracle (the
    * hash match proves the plans equivalent — the
    * pareto_share_prefix playbook). Textbook distributed skyline
    * (Börzsönyi ICDE'01 divide-and-conquer, restated relationally):
    *
    *  - phase 1: slice the catalog by a content hash and compute
    *    each slice's LOCAL frontier with the same price-grain
    *    strict-prefix cummax — the per-slice window is PARTITIONED
    *    (by slice id), so every task sorts only catalog/S rows; a
    *    global skyline point is never dominated inside its own
    *    slice, so phase 1 cannot lose a winner;
    *  - phase 2: the frontier-of-frontiers — the union of local
    *    frontiers (dominance is transitive, so every dropped group
    *    has a SURVIVING dominator at a strictly lower price, which
    *    makes the survivors' strict-prefix max equal the full
    *    catalog's at every candidate price) gets the one bounded
    *    unpartitioned cummax, then parts join back by price with the
    *    same (smax, gmax) dominance tests.
    *
    * The slicing is result-invariant (any partition of the catalog
    * yields the same skyline), so S just balances phase-1 tasks —
    * it tracks shuffle.partitions like the PrefixOps planes. Worst
    * case (catalog sorted by both dims) the frontier IS the catalog
    * and phase 2 degenerates to the exact form — the standard
    * 2-phase skyline trade-off, disclosed.
    */
  def skylineParts2p(spark: SparkSession, dir: String): DataFrame = {
    val nSlices = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("p_size"))
    // phase 1: per-slice price-grain local frontier
    val wLocal = Window.partitionBy("sl").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val localFrontier = parts
      .withColumn("sl", pmod(hash(col("p_partkey")), lit(nSlices)))
      .groupBy("sl", "p_retailprice").agg(max("p_size").as("gmax"))
      .withColumn("smax", max("gmax").over(wLocal))
      .filter(coalesce(col("smax") < col("gmax"), lit(true)))
      .select(col("p_retailprice"), col("gmax"))
    // phase 2: frontier-of-frontiers — bounded by Σ local frontiers
    val priceGrain = localFrontier.groupBy("p_retailprice")
      .agg(max("gmax").as("gmax"))
      .withColumn("smax", max("gmax").over(
        Window.orderBy("p_retailprice")
          .rowsBetween(Window.unboundedPreceding, -1)))
    parts.join(priceGrain, Seq("p_retailprice"))
      .filter(coalesce(col("smax") < col("p_size"), lit(true)) &&
        col("gmax") === col("p_size"))
      .select(col("p_partkey"), col("p_name"),
        r2(col("p_retailprice")).as("price"), col("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }
}
