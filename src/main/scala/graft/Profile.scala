package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SketchStore}
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
    import graft.operators.Checkpoints._
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val K = DedupOps.K
    val r = 2
    val bands2 = K / r
    val t9 = 0.9
    val aMinTok = 20
    t("store sketches")(SketchStore.sketches(spark, dir).count())
    val sk = SketchStore.sketches(spark, dir)
      .withColumn("stratum", (length(bin(col("n_tok"))) - 1).cast("int"))
      .cut()
    t("sk cut scan")(sk.count())
    def feasible(nA: org.apache.spark.sql.Column, nB: org.apache.spark.sql.Column) =
      nB >= lit(t9) * nA && nA >= lit(aMinTok)
    val keys2 = sk.select(col("doc_id"), col("lang"), col("stratum"),
      col("n_tok"),
      posexplode(array((0 until bands2).map { b =>
        xxhash64(lit(b) +: (b * r until (b + 1) * r).map(i => col(s"m$i")): _*)
      }: _*)).as(Seq("band", "bucket")))
    val undirectedRaw = keys2.as("l").join(keys2.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.lang") === col("r.lang") &&
          col("l.doc_id") < col("r.doc_id") &&
          abs(col("l.stratum") - col("r.stratum")) <= 1 &&
          (feasible(col("l.n_tok"), col("r.n_tok")) ||
            feasible(col("r.n_tok"), col("l.n_tok"))))
      .select(col("l.lang").as("lang"),
        col("l.doc_id").as("x_id"), col("r.doc_id").as("y_id"),
        col("l.n_tok").as("n_x"), col("r.n_tok").as("n_y"))
    t("near collisions raw")(undirectedRaw.count())
    t("near distinct")(undirectedRaw.distinct().count())
    val undirected = undirectedRaw.distinct()
    val near = undirected.filter(feasible(col("n_x"), col("n_y")))
      .select(col("lang"), col("x_id").as("a_id"), col("y_id").as("b_id"))
      .unionAll(undirected.filter(feasible(col("n_y"), col("n_x")))
        .select(col("lang"), col("y_id").as("a_id"), col("x_id").as("b_id")))
    t("near oriented")(near.count())
    val aSide = sk.filter(col("n_tok") >= aMinTok).select(col("doc_id").as("a_id"),
      col("hs").as("a_hs"), col("n_tok").as("n_a"))
    val bSide = sk.select(col("doc_id").as("b_id"), col("hs").as("b_hs"),
      col("n_tok").as("n_b"))
    val verified = near.join(aSide, "a_id").join(bSide, "b_id")
      .filter(col("n_b") * lit(1.0) >= lit(t9) * col("n_a"))
      .withColumn("cont",
        size(array_intersect(col("a_hs"), col("b_hs"))) * lit(1.0) / col("n_a"))
      .filter(col("cont") >= t9)
    t("verify near")(verified.count())
    t("full query")(DedupOps.containmentLshPairsFromSketches(
      SketchStore.sketches(spark, dir)).count())
    t("audit per doc")(DedupOps.containmentAuditPerDoc(
      SketchStore.sketches(spark, dir)).count())
    t("audit query")({
      val df = DedupOps.containmentLshPairsFromSketches(
        SketchStore.sketches(spark, dir))
        .select("a_id").distinct()
      val truthDocs = df.count()
      val flagged = DedupOps.containmentAuditPerDoc(
        SketchStore.sketches(spark, dir)).select("a_id").distinct()
      val flaggedN = flagged.count()
      val hit = flagged.join(df, "a_id").count()
      println(f"[profile] doc recall: flagged=$flaggedN truth=$truthDocs hit=$hit recall=${hit.toDouble/truthDocs}%.4f")
      flaggedN
    })
    spark.stop()
  }
}
