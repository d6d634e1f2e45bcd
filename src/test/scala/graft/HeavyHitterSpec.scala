package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions
import graft.operators.LlmQueries
import graft.sources.Tables

/** Misra–Gries frequent-items aggregate + the 2-pass exact
  * heavy-hitters query: the mergeable-summary guarantee under
  * arbitrary partitioning, the deterministic exact result, and the
  * SQL surface.
  */
class HeavyHitterSpec extends SparkTestBase {

  private val K = 128

  private def words = Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("word"))
    .filter(col("word") =!= "")

  private def exactCounts: Map[String, Long] = words
    .groupBy("word").agg(count(lit(1)).as("cnt"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def summaryOf(df: org.apache.spark.sql.DataFrame): (Long, Map[String, Long]) = {
    val row = df.agg(SketchFunctions.misraGries(col("word"), K).as("mg"))
      .select(col("mg.n"), col("mg.items")).head()
    val items = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (row.getLong(0), items)
  }

  test("MG guarantee holds under arbitrary partitioning: no heavy hitter is lost") {
    val exact = exactCounts
    val n = exact.values.sum
    Seq(1, 13).foreach { parts =>
      val (mgN, items) = summaryOf(words.repartition(parts))
      assert(mgN == n, s"MG total $mgN != exact token total $n")
      assert(items.size <= K)
      // every item with share > 1/(K+1) must be present
      val mustHave = exact.filter { case (_, c) => c * (K + 1).toLong > n }.keySet
      assert(mustHave.nonEmpty, "fixture has no heavy hitters — test is vacuous")
      assert(mustHave.subsetOf(items.keySet),
        s"parts=$parts lost heavy hitters: ${mustHave -- items.keySet}")
      // estimate bounds: true - n/(K+1) <= est <= true
      items.foreach { case (w, est) =>
        val t = exact.getOrElse(w, 0L)
        assert(est <= t, s"$w: est $est overcounts true $t")
        assert(est >= t - n / (K + 1), s"$w: est $est below the MG floor for true $t")
      }
    }
  }

  test("heavy_hitters == exact brute-force answer, regardless of sketch internals") {
    val exact = exactCounts
    val n = exact.values.sum
    val expected = exact.filter { case (_, c) => c >= n * 0.01 }
    val got = LlmQueries.heavyHitters(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
  }

  test("misra_gries is SQL-callable and matches the DataFrame surface") {
    Tables.documents(spark, sf).createOrReplaceTempView("hh_docs")
    val sqlRow = spark.sql(
      """SELECT misra_gries(word, 128) AS mg FROM (
        |  SELECT explode(split(text, ' ')) AS word FROM hh_docs) w
        |WHERE word <> ''""".stripMargin)
      .select(col("mg.n")).head().getLong(0)
    val (dfN, _) = summaryOf(words)
    assert(sqlRow == dfN)
  }

  test("empty and all-null inputs produce an empty summary, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("word")
      .agg(SketchFunctions.misraGries(col("word"), 4).as("mg"))
      .select(col("mg.n"), size(col("mg.items"))).head()
    assert(empty.getLong(0) == 0L && empty.getInt(1) == 0)
    val allNull = Seq(Option.empty[String], Option.empty[String]).toDF("word")
      .agg(SketchFunctions.misraGries(col("word"), 4).as("mg"))
      .select(col("mg.n"), size(col("mg.items"))).head()
    assert(allNull.getLong(0) == 0L && allNull.getInt(1) == 0)
  }

  test("adversarial stream: k=2 summary still catches the majority item") {
    import spark.implicits._
    // 60% a, 25% b, 15 distinct noise items, shuffled deterministically
    val items = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(Seq.fill(60)("a") ++ Seq.fill(25)("b") ++ (1 to 15).map(i => s"x$i"))
    val (n, got) = {
      val row = items.toDF("word").repartition(5)
        .agg(SketchFunctions.misraGries(col("word"), 2).as("mg"))
        .select(col("mg.n"), col("mg.items")).head()
      (row.getLong(0),
        row.getSeq[org.apache.spark.sql.Row](1).map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    assert(n == 100)
    // share(a) = 0.6 > 1/3 -> guaranteed present with est >= 60 - 100/3
    assert(got.contains("a") && got("a") >= 60 - 100 / 3)
    assert(got("a") <= 60)
  }
}
