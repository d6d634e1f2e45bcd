package graft

import org.apache.spark.sql.functions._

import graft.operators.EdgeStore

/** The persisted co-purchase edge store (r7 verdict #1): the audited
  * lineitem self-join runs once as ingest DDL and the nine graph
  * consumers probe a bucketed parquet table. Pins here:
  *   1. store content ≡ the inline self-join build, row-for-row —
  *      the reason every consumer's oracle hash is unchanged;
  *   2. the degree aggregation (groupBy on the bucket column) runs
  *      with ZERO shuffle exchange off the bucketed scan;
  *   3. the wedge self-join (e1.x = e2.x) runs with ZERO shuffle
  *      exchange even when broadcast is disabled — the bucketed
  *      partitioning serves both sides (at bench scale AQE may still
  *      elect a broadcast; this pin proves the shuffle-free SMJ is
  *      what the plan degrades to when it can't);
  *   4. the store write produced one file per bucket, which is what
  *      lets the scan expose its SORTED BY order.
  */
class EdgeStoreSpec extends SparkTestBase {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("store content equals the inline lineitem self-join build, row-for-row") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
    val inline = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .count().filter(col("count") >= 2)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = EdgeStore.canonical(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == inline,
      s"store diverged: ${(stored -- inline).take(3)} extra, ${(inline -- stored).take(3)} missing")
    // and the undirected table is exactly the symmetric closure
    val und = EdgeStore.undirected(spark, sf).count()
    assert(und == 2L * inline.size, s"undirected rows $und != 2x${inline.size}")
  }

  test("degree aggregation on the bucket column runs with zero shuffle exchange") {
    val p = executed(
      EdgeStore.undirected(spark, sf)
        .groupBy(col("x").as("n")).agg(count(lit(1)).as("deg")))
    assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"degree agg shuffled despite bucketing:\n$p")
  }

  test("wedge self-join on the bucket key is shuffle-free with broadcast off") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val und = EdgeStore.undirected(spark, sf)
      val e1 = und.select(col("x"), col("y").as("y1"))
      val e2 = und.select(col("x"), col("y").as("y2"))
      val df = e1.join(e2, Seq("x")).filter(col("y1") < col("y2"))
        .groupBy("y1", "y2").agg(count(lit(1)).as("common"))
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val p = full.indexOf("== Initial Plan ==") match {
        case -1 => full; case i => full.substring(0, i)
      }
      assert(p.contains("SortMergeJoin"), s"expected SMJ with broadcast off:\n$p")
      // the ONLY hash exchange allowed is the (y1, y2) re-agg — the
      // join itself must ride the bucketed partitioning on x
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(n == 1, s"expected 1 hash exchange (the pair re-agg), got $n:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("capped wedge build folds the hub cap into a window, not a semi-join") {
    val df = SparkEntry.queries("common_neighbor_recs_capped")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the center filter must be a count-window over the bucketed
    // partitioning — no LeftSemi join and no exchange feeding it
    assert(!p.contains("LeftSemi"), s"cap regressed to a semi-join:\n${p.take(1500)}")
    assert(p.contains("Window"), "expected the center-degree count window")
  }

  test("store layout: one file per bucket (sort order readable)") {
    EdgeStore.ensure(spark, sf)
    val files = new java.io.File(s"${EdgeStore.storePath(sf)}/und")
      .listFiles().filter(f => f.getName.endsWith(".parquet"))
    assert(files.length == EdgeStore.NumBuckets,
      s"expected ${EdgeStore.NumBuckets} bucket files, got ${files.length}")
  }

  test("appendOrders == full rebuild; replay-safe; compaction-invariant") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    // split by ORDER (lines of one order share l_orderkey, so each
    // half is complete orders — the appendOrders contract)
    val half1 = li.filter(col("l_orderkey") % 2 === 0)
    val half2 = li.filter(col("l_orderkey") % 2 === 1)
    val dirA = java.nio.file.Files.createTempDirectory("graft_edges_inc").toString
    half1.write.mode("overwrite").parquet(s"$dirA/lineitem.parquet")
    def und(d: String): Seq[(Long, Long)] =
      EdgeStore.undirected(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val truth = und(sf) // the full-corpus build is the ground truth
    EdgeStore.ensure(spark, dirA)
    // incrementally ingest the second half: O(batch) pair counts +
    // delta partition + republish — must equal the full rebuild
    EdgeStore.appendOrders(spark, dirA, half2, batchId = 1L)
    assert(und(dirA) == truth, "append diverged from full rebuild")
    // replay the SAME batch: dynamic overwrite replaces its delta
    // partition, so support counts must not double
    EdgeStore.appendOrders(spark, dirA, half2, batchId = 1L)
    assert(und(dirA) == truth, "replayed batch double-counted support")
    // compaction folds deltas into the base without touching the
    // published adjacency
    EdgeStore.compact(spark, dirA)
    assert(!new java.io.File(s"${EdgeStore.storePath(dirA)}/deltas").exists(),
      "compaction left the delta directory")
    assert(und(dirA) == truth, "compaction changed the adjacency")
    // and the pair base alone now carries the merged supports: a
    // fresh append on top of the compacted base still agrees
    EdgeStore.appendOrders(spark, dirA, half2.limit(0), batchId = 2L)
    assert(und(dirA) == truth, "post-compaction append diverged")
  }

  test("streamingAppend maintains the adjacency exactly-once across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
    val dirB = java.nio.file.Files.createTempDirectory("graft_edges_stream").toString
    li.filter(col("l_orderkey") % 3 === 0)
      .write.mode("overwrite").parquet(s"$dirB/lineitem.parquet")
    EdgeStore.ensure(spark, dirB)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_edges_ckpt").toString
    val q = EdgeStore.streamingAppend(spark, dirB,
        input.toDF().toDF("l_orderkey", "l_partkey"))
      .option("checkpointLocation", ckpt).start()
    try {
      Seq(1L, 2L).foreach { m =>
        input.addData(li.filter(col("l_orderkey") % 3 === m)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def und(d: String): Seq[(Long, Long)] =
      EdgeStore.undirected(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(und(dirB) == und(sf),
      "streamed adjacency diverged from the full-corpus build")
  }

  test("graph consumers never scan lineitem (the no-rebuild pin)") {
    val graphPack = Seq("triangle_parts", "clustering_coeff", "kcore_parts",
      "degree_assortativity", "degree_dist", "common_neighbor_recs",
      "common_neighbor_recs_capped", "hub_distance", "hill_tail_index")
    graphPack.foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("lineitem"),
        s"$q re-paid the corpus-sized edge build:\n${p.take(1500)}")
      // kcore's RETURNED plan reads only its lineage-cut peel rounds —
      // the store scan lives inside the loop's jobs, not the finisher
      if (q != "kcore_parts")
        assert(p.contains("graft_edges"), s"$q did not read the edge store")
    }
  }
}
