package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the contract): run one declared query and
  * dump its rows, exchange count, and executed plan.
  * `sbt "runMain graft.PlanDump <query> [sfDir] [showRows]"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val showRows = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.maxMetadataStringLength", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configureSketchPerf(spark) // mirror Bench's session
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    df.show(showRows, truncate = false)
    println(f"[plandump] $name cold ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    println(f"[plandump] $name warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val p = df.queryExecution.executedPlan.toString
    println("[plandump] exchanges: " +
      "Exchange (hash|range|Single)".r.findAllIn(p).size)
    println(p)
    spark.stop()
  }
}
