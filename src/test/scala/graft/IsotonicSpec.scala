package graft

import graft.operators.RelationalQueries
import graft.sources.Tables

/** isotonic_return_rate: the minimax form `max_{j≤i} min_{k≥i}
  * wavg(j..k)` must equal the pool-adjacent-violators algorithm's
  * output (they are two characterizations of the same L2 isotonic
  * fit), and the fit must be monotone and weighted-mean-preserving.
  */
class IsotonicSpec extends SparkTestBase {

  /** Textbook PAVA: merge adjacent violating pools until monotone. */
  private def pava(w: Seq[Double], y: Seq[Double]): Seq[Double] = {
    case class Pool(var w: Double, var sum: Double, var n: Int) {
      def avg: Double = sum / w
    }
    val pools = scala.collection.mutable.ArrayBuffer[Pool]()
    w.indices.foreach { i =>
      pools += Pool(w(i), w(i) * y(i), 1)
      while (pools.length > 1 &&
        pools(pools.length - 2).avg >= pools.last.avg - 1e-15) {
        val last = pools.remove(pools.length - 1)
        pools.last.w += last.w
        pools.last.sum += last.sum
        pools.last.n += last.n
      }
    }
    pools.toSeq.flatMap(p => Seq.fill(p.n)(p.avg))
  }

  test("minimax fit == PAVA replay on the discount grid; monotone; mean-preserving") {
    val got = RelationalQueries.isotonicReturnRate(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val w = got.map(_._2.toDouble)
    val raw = Tables.raw(spark, sf, "lineitem")
      .groupBy("l_discount")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("l_returnflag") === "R", 1.0)
            .otherwise(0.0)).as("r"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(raw.length == got.length)
    val expect = pava(raw.map(_._2.toDouble), raw.map(t => t._3 / t._2))
    got.zip(expect).foreach { case ((d, _, _, iso), e) =>
      assert(math.abs(iso - e) < 1e-3, s"disc $d: minimax $iso vs PAVA $e")
    }
    // monotone non-decreasing
    val isoSeq = got.map(_._4).toSeq
    assert(isoSeq == isoSeq.sorted, s"fit not monotone: $isoSeq")
    // weighted mean preserved (a projection property of isotonic L2)
    val rawMean = got.map(t => t._3 * t._2).sum / w.sum
    val isoMean = got.map(t => t._4 * t._2).sum / w.sum
    assert(math.abs(rawMean - isoMean) < 1e-3,
      s"weighted mean drifted: raw $rawMean iso $isoMean")
  }

  test("name_entity_clusters: every cluster has >= 2 names; canonical id is a member name") {
    val rows = SparkEntry.queries("name_entity_clusters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, s"singleton leaked into the closure: $r")
    }
    // canonical names exist in the part catalog
    val names = Tables.raw(spark, sf, "part")
      .select("p_name").distinct().collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(names.contains(r.getString(0))))
  }
}
