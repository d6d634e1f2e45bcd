package graft

/** Scratch: print exchange counts for new queries (deleted before commit). */
object PlanCountScratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    Seq("cohort_retention", "new_vs_returning", "seasonal_dow_index", "repeat_cadence")
      .foreach { q =>
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        val n = "Exchange (hash|range|Single)".r.findAllIn(p).size
        println(s"SCRATCH $q exchanges=$n")
      }
    spark.stop()
  }
}
