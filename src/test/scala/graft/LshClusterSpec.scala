package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, GraphOps, LlmQueries}
import graft.sources.Tables

/** `lsh_dedup_clusters` vs the exact transitive closure on the
  * bounded ground-truth slice (doc_id < 300, the dedup_clusters
  * fixture):
  *   - precision 1 structurally: every LSH cluster's members lie in
  *     ONE exact cluster (edges are exact-verified, so the closure
  *     can only merge along true near-dup pairs);
  *   - recall: >= 0.8 of exactly-clustered docs are LSH-clustered
  *     (the star edges inherit the kill list's band s-curve);
  *   - the star edge set stays output-linear (<= verified pair count).
  */
class LshClusterSpec extends SparkTestBase {

  private def slice = Tables.documents(spark, sf)
    .filter(col("doc_id") < 300)
    .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))

  private def components(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    GraphOps.connectedComponents(edges)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap

  test("LSH closure on the bounded slice: no false merges, doc recall >= 0.8") {
    val exactPairs = LlmQueries.exactJaccardPairs(
        slice.withColumnRenamed("toks", "ws"), 0.8)
      .select(col("lang").as("part"), col("a_id").as("a"), col("b_id").as("b"))
    val exact = components(exactPairs)
    val lshEdges = DedupOps.nearDupRepEdges(slice)
      .select(col("lang").as("part"), col("a_id").as("a"), col("b_id").as("b"))
    val lsh = components(lshEdges)
    assert(exact.nonEmpty, "exact ground truth empty — fixture changed?")
    // precision: two docs in one LSH cluster are in one exact cluster
    lsh.groupBy(_._2).values.foreach { members =>
      val exactLabels = members.keys.map(exact.get).toSet
      assert(exactLabels.size == 1 && !exactLabels.contains(None),
        s"LSH cluster spans exact clusters/singletons: ${members.keys.take(5)}")
    }
    // recall on clustered DOCS
    val recall = (lsh.keySet & exact.keySet).size.toDouble / exact.size
    assert(recall >= 0.8, s"doc recall $recall < 0.8 (|exact|=${exact.size}, |lsh|=${lsh.size})")
    info(f"LSH cluster doc recall = $recall%.2f over ${exact.size} clustered docs")
  }

  test("star edges are output-linear: <= verified pair-enumeration count") {
    val nStar = DedupOps.nearDupRepEdges(slice).count()
    val nPairs = DedupOps.minhashPairs(slice).count()
    assert(nStar > 0 && nStar <= nPairs,
      s"star edge count $nStar exceeds pair enumeration $nPairs")
  }

  test("lsh_dedup_clusters summary is self-consistent per lang") {
    val rows = GraphOps.lshDedupClusters(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nd, mx, drop) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nc >= 1 && nd >= 2 * nc, s"degenerate clusters in $r") // every cluster >= 2 docs
      assert(mx >= 2 && mx <= nd && drop == nd - nc, s"inconsistent summary $r")
    }
  }
}
