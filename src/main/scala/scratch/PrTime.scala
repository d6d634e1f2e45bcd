package scratch
import org.apache.spark.sql.SparkSession
object PrTime {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.extensions","graft.plans.GraftExtensions")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configureSketchPerf(spark)
    val dir = "/root/testdata/sf0.1"
    // warm
    graft.SparkEntry.queries("rev_by_region")(spark, dir).collect()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("copurchase_pagerank")(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PAGERANK times=${ts.map(t => f"$t%.2f").mkString(",")} median=${ts.sorted.apply(1)}%.2f")
    spark.stop()
  }
}
