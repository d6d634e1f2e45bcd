package graft

/** Physical-plan audits (the "would this survive 100 TB" gate):
  * assert the plan SHAPES the scale design depends on — parquet
  * pushdown, column pruning, broadcast dims, top-k lowering, single-
  * shuffle windows — so a refactor that silently regresses one of
  * them fails CI, not the cluster.
  */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String = {
    // metadata strings (PushedFilters, ReadSchema) truncate at 100
    // chars by default — widen so assertions see the full filter list
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  /** Plan AFTER execution — AQE finalizes stages (and codegen stars)
    * only once the query has run.
    */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // executes THIS plan (count() would build a new one)
    df.queryExecution.executedPlan.toString
  }

  test("sli_filter_project: ts-range + event_type predicates reach the parquet scan") {
    val p = plan("sli_filter_project")
    val scanLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    // both bounds on the raw nanos ts column AND the event_type filter
    assert(scanLine.contains("GreaterThanOrEqual(ts"), scanLine)
    assert(scanLine.contains("LessThan(ts"), scanLine)
    assert(scanLine.contains("EqualTo(event_type,error)"), scanLine)
  }

  test("rev_by_region: lineitem scan pruned to 3 columns, dims broadcast") {
    val p = plan("rev_by_region")
    val lineitemScan = p.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("lineitem")).getOrElse("")
    assert(lineitemScan.contains("l_orderkey") && lineitemScan.contains("l_extendedprice"),
      lineitemScan)
    // wide columns must NOT be read
    assert(!lineitemScan.contains("l_shipdate") && !lineitemScan.contains("l_quantity"),
      lineitemScan)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, "nation/region not broadcast")
  }

  test("top-k queries lower to TakeOrderedAndProject (no global sort)") {
    Seq("top10_customers", "topk_words", "cosine_topk").foreach { q =>
      assert(plan(q).contains("TakeOrderedAndProject"), s"$q has a global sort")
    }
  }

  test("asof_prior_view: linear window plan — no join, no pair explosion") {
    val p = plan("asof_prior_view")
    assert(!p.contains("Join"), "as-of regressed to a join shape")
    assert(p.contains("Window"), "expected window-based as-of")
  }

  test("star-schema queries never use cartesian/broadcast-nested-loop joins") {
    Seq("rev_by_region", "top10_customers", "semi_join_urgent",
      "anti_join_no_p_orders", "outer_join_linecount", "range_join_shipwindow",
      "rollup_region_nation", "supplier_nation_rev").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: BNLJ")
    }
  }

  test("every declared query has at least one WholeStageCodegen stage") {
    SparkEntry.queries.keys.foreach { q =>
      assert(finalPlan(q).contains("*("), s"$q: no codegen stage")
    }
  }

  test("dedup sketch aggregation is a hash aggregate over exploded tokens (no HOF signature)") {
    val p = plan("near_dup_minhash")
    assert(p.contains("HashAggregate"), "sketches must be hash aggregates")
    assert(p.contains("Generate explode"), "token explode missing")
  }

  test("outer_join_linecount reuses the join's partitioning for the first re-agg (SMJ mode)") {
    // with broadcast off, the left join shuffles both sides on
    // orderkey; the first groupBy(o_orderkey) must NOT add a third
    // hash exchange — it aggregates directly on the join's
    // partitioning. Expected hash exchanges: join-left, join-right,
    // and the n_lines re-agg = exactly 3.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("outer_join_linecount")(spark, sf)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val p = full.indexOf("== Initial Plan ==") match {
        case -1 => full; case i => full.substring(0, i)
      }
      assert(p.contains("SortMergeJoin"), s"expected SMJ with broadcast off:\n$p")
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashExchanges == 3,
        s"expected exactly 3 hash exchanges (2 join inputs + 1 re-agg), got $hashExchanges:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("slo_report_maintained never scans raw events — only the maintained report table") {
    val p = plan("slo_report_maintained")
    assert(!p.contains("events.parquet"),
      s"served report re-read the raw fact table:\n$p")
    assert(p.contains("graft_report"), "expected the maintained report table scan")
  }

  test("sketch_rollup never scans raw events — only the persisted sketch table") {
    val p = plan("sketch_rollup")
    assert(!p.contains("events.parquet"),
      s"rollup re-read the raw fact table:\n$p")
    assert(p.contains("graft_sketch"), "expected the persisted sketch table scan")
  }
}
