package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime row-level filtering (Spark's bloom-filter injection): when
  * a shuffled fact⋈dim join has a selective dim predicate, the
  * optimizer can build a bloom filter on the dim side and apply it to
  * the FACT SCAN — at 100 TB that skips most of the fact table before
  * the shuffle. The engine's declarative plans compose with this for
  * free; this spec pins that the injection actually happens on our
  * star shape (thresholds lowered — the fixture is far below the
  * production 10 GB default) and that results are unchanged.
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective dim predicate injects a bloom filter on the fact side (SMJ)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def q = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice")
        .join(
          Tables.orders(spark, sf)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("s"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$optimized")

      // results identical with the filter disabled
      val withFilter = q.collect().toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = q.collect().toSeq
      assert(withFilter == without, "bloom filter changed results")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
