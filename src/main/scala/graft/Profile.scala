package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
    import graft.operators.EdgeStore
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    try EdgeStore.ensure(spark, dir) catch { case _: Throwable => () }
    // warm codegen
    graft.operators.RelationalQueries.copurchasePagerank(spark, "/root/testdata/sf0.001").count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    (1 to 3).foreach { p =>
      val wp = EdgeStore.weighted(spark, dir)
      t(s"p$p wp count")(wp.count())
      t(s"p$p wp count2")(wp.count())
      import spark.implicits._
      val ranks = wp.select(col("x"), col("y"), col("deg_x"))
        .as[(Long, Long, Long)]
        .groupByKey(_ => true)
        .flatMapGroups { (_: Boolean, it: Iterator[(Long, Long, Long)]) =>
          val edges = it.toArray
          Iterator((edges.length.toLong, 0.0))
        }.toDF("node", "rank")
      t(s"p$p groupByKey job")(ranks.count())
      t(s"p$p full pagerank")(graft.operators.RelationalQueries.copurchasePagerank(spark, dir).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
