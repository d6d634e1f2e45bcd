package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomDedup

/** Bloom-prefiltered incremental dedup: the filter is an optimization
  * that must never change the answer, and the probe must actually be
  * in the plan (otherwise the operator is just the exact join with
  * extra steps).
  */
class BloomDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom path == exact path row-for-row (fpp never leaks into the result)") {
    val bloomed = BloomDedup.bloomPrefilterDedup(spark, sf).collect().toSeq
    val exact = BloomDedup.exactTwin(spark, sf).collect().toSeq
    assert(bloomed == exact)
  }

  test("might_contain probe reaches the history side of the plan") {
    val p = BloomDedup.bloomPrefilterDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), "Bloom probe missing from the plan")
  }

  test("bloom has no false negatives; fpp bounded on disjoint values") {
    val batch = (0L until 2000L).toDF("k")
    val bloom = BloomDedup.buildBloom(batch, "k", expectedItems = 2000L)
    // every inserted value must pass
    val inserted = batch.filter(BloomDedup.mightContain(bloom, col("k"))).count()
    assert(inserted == 2000L, "false negative — bloom broke dedup recall")
    // disjoint values mostly fail (generous 5x bound on the 1% fpp)
    val disjoint = (100000L until 102000L).toDF("k")
    val falsePos = disjoint.filter(BloomDedup.mightContain(bloom, col("k"))).count()
    assert(falsePos <= 100L, s"fpp way off: $falsePos / 2000")
  }

  test("constructed dup: an injected repeated segment is counted as seen") {
    val d = java.nio.file.Files.createTempDirectory("graft_bloom_dup").toString
    val seg = (1 to 8).map(i => s"tok$i").mkString(" ")
    val other = (11 to 18).map(i => s"zz$i").mkString(" ")
    Seq(
      (1L, seg, "en", "s", seg.length.toLong),            // batch doc = one seg
      (150L, s"$seg $other", "en", "s", 0L),              // history repeats it
      (151L, other, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = BloomDedup.bloomPrefilterDedup(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("en", 1L, 1L, 0L)), out.mkString(","))
  }
}
