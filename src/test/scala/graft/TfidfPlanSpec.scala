package graft

/** Plan pins for the tfidf_top_terms scale fix (round-4): df must be
  * a pre-aggregated broadcast map, never a term-partitioned window.
  * The window shape shuffled the FULL (doc, term) tf frame on a
  * Zipfian key with no partial aggregation — every row of a hot term
  * in one task's window buffer — the one true straggler pattern at
  * corpus scale. These assertions make that shape a CI failure.
  */
class TfidfPlanSpec extends SparkTestBase {

  private def executedPlan = {
    val df = SparkEntry.queries("tfidf_top_terms")(spark, sf)
    df.collect()
    // AQE appends "== Initial Plan ==" — keep only the final plan so
    // node counts aren't doubled
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  test("tfidf: no term-partitioned Window — exactly one Window node (the per-doc argmax)") {
    val p = executedPlan
    val windows = "Window ".r.findAllIn(p).size
    assert(windows == 1, s"expected exactly 1 Window (doc argmax), got $windows:\n$p")
    // the surviving window partitions by doc_id, not term
    val wLine = p.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(wLine.contains("doc_id"), s"window must partition by doc_id: $wLine")
  }

  test("tfidf: df side is a two-stage aggregate (map-side partial collapses hot terms)") {
    val p = executedPlan
    // partial_count keyed by term proves map-side combine on the df
    // branch — a hot term contributes one row per map task to the
    // exchange, never one per document
    val partialAggOnTerm = p.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("partial_count") && l.contains("term"))
    assert(partialAggOnTerm, s"df side lost its partial aggregation:\n$p")
  }

  test("tfidf: the df map reaches the tf frame via broadcast, not a shuffle join") {
    val p = executedPlan
    assert(p.contains("BroadcastHashJoin"), s"df join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"df join regressed to SMJ:\n$p")
    info(s"shuffle exchanges: ${"Exchange (hash|range|Single)".r.findAllIn(p).size}")
  }

  test("tfidf: an unbroadcastable vocabulary degrades to a shuffle join, same result") {
    // the documented fallback: if the df >= 2 slice outgrows the
    // broadcast threshold, the SAME plan runs as a shuffle join whose
    // df side still carries partial aggregation — no rewrite, no skew
    // regression (the window shape is gone either way)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val want = SparkEntry.queries("tfidf_top_terms")(spark, sf).collect().toSeq
    spark.conf.set(key, "-1")
    try {
      val df = SparkEntry.queries("tfidf_top_terms")(spark, sf)
      val got = df.collect().toSeq
      val p = df.queryExecution.executedPlan.toString
      val pFinal = p.indexOf("== Initial Plan ==") match {
        case -1 => p; case i => p.substring(0, i)
      }
      assert("Window ".r.findAllIn(pFinal).size == 1,
        "fallback must not resurrect the term window")
      assert(pFinal.linesIterator.exists(l =>
        l.contains("HashAggregate") && l.contains("partial_count") && l.contains("term")),
        "fallback lost the df side's partial aggregation")
      assert(got == want, "fallback changed the result")
    } finally spark.conf.set(key, prev)
  }
}
