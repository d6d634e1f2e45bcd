package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SketchStore}

/** The persisted document-sketch store (r8 verdict #3): the corpus
  * explode + 64-min MinHash aggregate runs once as ingest DDL and the
  * text-dedup/containment queries probe a doc-grain parquet table.
  * Pins:
  *   1. store content ≡ the inline [[DedupOps.docSketches]] build
  *      (signatures + token-hash sets + n_tok), with one row per
  *      DOCUMENT (null-text docs keep a null-signature row);
  *   2. the store-probing queries no longer scan the documents table
  *      (the no-retokenize plan pin);
  *   3. append ≡ full rebuild; replays are idempotent; folded batches
  *      are skipped (the StoreProtocol contract);
  *   4. compaction is crash-safe at each boundary (prepare-only,
  *      commit-without-gc, torn pointer) — same injection points as
  *      EdgeStoreSpec, on the second protocol client.
  */
class SketchStoreSpec extends SparkTestBase {

  private def docsOf(d: String) = graft.sources.Tables.documents(spark, d)

  private def killList(d: String): Seq[(String, Long)] =
    DedupOps.nearDupKillListFromSketches(SketchStore.sketches(spark, d))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted

  test("store content equals the inline docSketches build, one row per document") {
    val inline = DedupOps.docSketches(
        docsOf(sf).select(col("doc_id"), col("lang"),
          DedupOps.tokensCol.as("toks")))
      .select(col("doc_id"), col("m0"), col("m63"), col("n_tok"),
        size(col("hs")).as("nh"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    val stored = SketchStore.sketches(spark, sf)
      .filter(col("n_tok").isNotNull)
      .select(col("doc_id"), col("m0"), col("m63"), col("n_tok"),
        size(col("hs")).as("nh"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(stored == inline, "sketch rows diverged from the inline build")
    // doc-grain completeness: one row per document, even token-less ones
    assert(SketchStore.sketches(spark, sf).count() == docsOf(sf).count(),
      "store must carry one row per document")
    // and the bag fingerprint matches the inline incremental_dedup formula
    val inlineBag = docsOf(sf).select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(
          split(lower(col("text")), " "))))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val storedBag = SketchStore.sketches(spark, sf)
      .select("doc_id", "bag_h")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(storedBag == inlineBag, "bag_h diverged from the inline fingerprint")
  }

  test("store-probing queries never scan the documents table") {
    Seq("near_dup_minhash", "incremental_dedup").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("documents"),
        s"$q re-tokenized the corpus:\n${p.take(1500)}")
      assert(p.contains("graft_sketches"), s"$q did not read the sketch store")
    }
    // lsh_dedup_clusters / containment_lsh return lineage-cut frames
    // (CC loop / .cut()), so pin their derivation frame instead
    val sk = SketchStore.sketches(spark, sf)
    val p = sk.queryExecution.executedPlan.toString
    assert(!p.contains("documents") && p.contains("graft_sketches"))
  }

  test("appendDocs == full rebuild; replay-safe; folded batches skipped") {
    val docs = docsOf(sf)
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val dirA = java.nio.file.Files.createTempDirectory("graft_sk_inc").toString
    half1.write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val truth = killList(sf)
    SketchStore.ensure(spark, dirA)
    SketchStore.appendDocs(spark, dirA, half2, batchId = 1L)
    assert(SketchStore.sketches(spark, dirA).count() == docs.count(),
      "append lost documents")
    assert(killList(dirA) == truth, "append diverged from full rebuild")
    // replay the SAME batch: dynamic overwrite replaces the delta
    SketchStore.appendDocs(spark, dirA, half2, batchId = 1L)
    assert(killList(dirA) == truth, "replayed batch duplicated docs")
    // compact, then replay the folded batch: watermark-skipped
    SketchStore.compact(spark, dirA)
    assert(killList(dirA) == truth, "compaction changed the store")
    SketchStore.appendDocs(spark, dirA, half2, batchId = 1L)
    assert(killList(dirA) == truth, "folded replay re-applied")
    assert(SketchStore.sketches(spark, dirA).count() == docs.count())
  }

  test("compaction crash windows: prepare-only, commit-without-gc, torn pointer") {
    val docs = docsOf(sf)
    val dirB = java.nio.file.Files.createTempDirectory("graft_sk_crash").toString
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    SketchStore.ensure(spark, dirB)
    SketchStore.appendDocs(spark, dirB, docs.filter(col("doc_id") % 2 === 1),
      batchId = 1L)
    val truth = killList(sf)
    assert(killList(dirB) == truth)
    val root = SketchStore.storePath(dirB)
    // window A: crash after prepare — pointer old, nothing observable
    val next = SketchStore.compactPrepare(spark, dirB).get
    assert(killList(dirB) == truth, "prepare changed observable state")
    // window B: crash after commit, before gc — folded deltas ignored
    SketchStore.compactCommit(spark, dirB, next)
    assert(killList(dirB) == truth, "folded deltas double-served after commit")
    assert(SketchStore.sketches(spark, dirB).count() == docs.count(),
      "double-count after commit")
    // window C: torn pointer swap — recovery must promote the tmp
    val cur = new java.io.File(s"$root/CURRENT")
    val tmp = new java.io.File(s"$root/CURRENT.tmp")
    java.nio.file.Files.copy(cur.toPath, tmp.toPath)
    assert(cur.delete())
    assert(killList(dirB) == truth, "torn pointer swap not recovered")
    assert(cur.exists() && !tmp.exists())
    SketchStore.compactGc(spark, dirB)
    assert(killList(dirB) == truth, "gc retry changed the store")
  }

  test("source regenerated in place triggers a rebuild (no stale store served)") {
    val docs = docsOf(sf)
    val dirR = java.nio.file.Files.createTempDirectory("graft_sk_regen").toString
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dirR/documents.parquet")
    val n1 = SketchStore.sketches(spark, dirR).count()
    docs.write.mode("overwrite").parquet(s"$dirR/documents.parquet")
    val n2 = SketchStore.sketches(spark, dirR).count()
    assert(n2 == docs.count(),
      s"regenerated source served stale sketch store: $n2 (old $n1)")
  }

  test("streamingAppend maintains the sketch plane exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = docsOf(sf)
    val dirC = java.nio.file.Files.createTempDirectory("graft_sk_stream").toString
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(s"$dirC/documents.parquet")
    SketchStore.ensure(spark, dirC)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sk_ckpt").toString
    val q = SketchStore.streamingAppend(spark, dirC,
        input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))
      .option("checkpointLocation", ckpt).start()
    try {
      Seq(1L, 2L).foreach { m =>
        input.addData(docs.filter(col("doc_id") % 3 === m)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4))).toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(SketchStore.sketches(spark, dirC).count() == docs.count(),
      "streamed store lost or duplicated docs")
    assert(killList(dirC) == killList(sf),
      "streamed kill list diverged from the full-corpus build")
  }
}
