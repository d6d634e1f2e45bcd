package graft

/** r4-verdict #8: scan-predicate pushdown PINS for the scan-heavy
  * pack. A filter that stays above the parquet reader still returns
  * the right rows — the regression is silent and only shows up as a
  * full-table scan at 100 TB. So for every query whose plan should
  * row-group-skip, assert the predicate atoms actually appear in the
  * `PushedFilters` of that table's FileScan in the EXECUTED plan.
  *
  * Layout note: the events `ts` range pins hold on all three fixture
  * layouts — on stored-TIMESTAMP/NTZ Spark's own cast unwrapping
  * pushes the bounds, on the INT64(NANOS) layout the
  * NanosRangePushdown rule rewrites them onto the raw long column —
  * either way atoms named `(ts,` must reach the reader
  * (NanosPushdownSpec covers the per-layout mechanism; this spec pins
  * the query-level outcome).
  */
class PushdownAuditSpec extends SparkTestBase {

  /** query -> groups of (table-path substring, atoms that must all
    * appear on ONE FileScan line of that table). Multiple groups per
    * query pin multiple scans (e.g. both sides of a self-join).
    */
  private val pins: Map[String, Seq[(String, Seq[String])]] = Map(
    // ts range + event_type equality both reach the events reader
    "sli_filter_project" -> Seq(
      ("events", Seq("GreaterThanOrEqual(ts,", "LessThan(ts,",
        "EqualTo(event_type,error)"))),
    // the canonical q6-shape row-group skip: quantity bound on lineitem
    "revenue_discount_band" -> Seq(
      ("lineitem", Seq("LessThan(l_quantity,24"))),
    // dim-side literal equality reaches the orders reader before the join
    "semi_join_urgent" -> Seq(
      ("orders", Seq("EqualTo(o_orderpriority,1-URGENT)"))),
    "anti_join_no_p_orders" -> Seq(
      ("orders", Seq("EqualTo(o_orderstatus,P)"))),
    // IN-list membership pushes as In(...)
    "asof_prior_view" -> Seq(
      ("events", Seq("In(event_type,"))),
    // (quantile_norm_chars' doc_id<200 bound deliberately NOT pinned:
    // it selects OUTPUT rows of a full-corpus percent_rank window, so
    // pushing it would change the ranks — correct plans keep it above
    // the scan)
    // contamination: benchmark slice and corpus slice are SEPARATE
    // pruned scans of the documents table
    "contamination_check" -> Seq(
      ("documents", Seq("LessThan(doc_id,50)")),
      ("documents", Seq("GreaterThanOrEqual(doc_id,50)"))),
    // exact near-dup ground truth: both self-join sides pruned
    "near_dup_pairs" -> Seq(
      ("documents", Seq("LessThan(doc_id,300)"))),
    "emb_near_dup" -> Seq(
      ("embeddings", Seq("LessThan(vec_id,400)"))),
    // r6 Q10 shape: returnflag equality on lineitem AND the order-year
    // range on orders — each fact scan pre-filtered independently
    "returned_revenue" -> Seq(
      ("lineitem", Seq("EqualTo(l_returnflag,R)")),
      ("orders", Seq("GreaterThanOrEqual(o_orderdate,", "LessThan(o_orderdate,"))),
    // r6 Q15 shape: the 3-month shipdate window row-group-skips
    "top_supplier_window" -> Seq(
      ("lineitem", Seq("GreaterThanOrEqual(l_shipdate,", "LessThan(l_shipdate,"))),
    // r6 Q14 shape: the ship-year range row-group-skips
    "promo_share_monthly" -> Seq(
      ("lineitem", Seq("GreaterThanOrEqual(l_shipdate,", "LessThan(l_shipdate,"))),
    // r6 Q8 shape: the region literal reaches the region reader (the
    // market scope cuts at the smallest dim, before any fact touch)
    "nation_market_share" -> Seq(
      ("region", Seq("EqualTo(r_name,EUROPE)"))),
    // r6 Q2 shape: the part-type literal reaches the part reader
    "cheapest_supplier" -> Seq(
      ("part", Seq("EqualTo(p_type,PROMO)"))),
    // r6 Q16 shape: the exclusion predicate reaches the supplier
    // reader (the NOT-IN side scans only the excluded slice)
    "supplier_variety" -> Seq(
      ("supplier", Seq("LessThan(s_acctbal,"))),
    // r6 Q20 shape: the 1996 window row-group-skips the fact scan
    "dominant_suppliers" -> Seq(
      ("lineitem", Seq("GreaterThanOrEqual(l_shipdate,", "LessThan(l_shipdate,"))))

  private def scanLines(name: String): Seq[String] = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).toSeq
  }

  pins.foreach { case (name, groups) =>
    test(s"pushdown pin: $name") {
      val lines = scanLines(name)
      groups.foreach { case (table, atoms) =>
        val tableLines = lines.filter(_.contains(table))
        assert(tableLines.nonEmpty, s"no $table FileScan with PushedFilters in $name")
        assert(tableLines.exists(l => atoms.forall(l.contains)),
          s"$name: no $table scan carries all of $atoms.\nScans:\n${tableLines.mkString("\n")}")
      }
    }
  }
}
