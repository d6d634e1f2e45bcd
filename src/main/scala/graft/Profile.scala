package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.sources.Tables
/** Scratch profiler for operator stages (not part of the contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("docs+tokens")(docs.count())
    t("sketches")(DedupOps.docSketches(docs).count())
    t("containment pairs")(DedupOps.containmentLshPairs(docs).count())
    t("containment pairs 2")(DedupOps.containmentLshPairs(docs).count())
    spark.stop()
  }
}
