package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** curate_corpus_neardup: the near-dedup upgrade must be a strict
  * refinement of the exact-dedup pipeline — same cells or fewer docs
  * per cell, never more; strictly fewer in total on a corpus that
  * actually contains near-duplicate cliques (this fixture does).
  */
class CurateNearDupSpec extends SparkTestBase {

  test("near-dedup curation is contained in exact-dedup curation, strictly on this corpus") {
    def cells(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Long)] =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val exact = cells(TextOps.curateCorpus(spark, sf))
    val near = cells(TextOps.curateCorpusNearDup(spark, sf))
    // every near cell exists in exact with >= docs and >= tokens
    near.foreach { case (cell, (nd, nt)) =>
      val (ed, et) = exact.getOrElse(cell, fail(s"cell $cell absent from exact pipeline"))
      assert(nd <= ed, s"$cell: near-dedup kept MORE docs ($nd > $ed)")
      assert(nt <= et, s"$cell: near-dedup kept MORE tokens")
    }
    val totalExact = exact.values.map(_._1).sum
    val totalNear = near.values.map(_._1).sum
    assert(totalNear < totalExact,
      s"template-clique corpus but near-dedup removed nothing ($totalNear vs $totalExact)")
  }
}
