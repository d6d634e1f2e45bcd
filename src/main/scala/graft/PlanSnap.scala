package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev harness (not part of the contract): dump `.explain("formatted")`
  * for a set of declared queries to files — the committed evidence for
  * optimization-round plan claims (`plans/rN/<query>_{before,after}.txt`).
  *
  * `sbt "runMain graft.PlanSnap <outDir> <suffix> [queries] [sfDir]"`
  * writes `<outDir>/<query>_<suffix>.txt` per query; `queries` is a
  * comma-separated filter (default: all declared queries). The session
  * mirrors Bench's 32-thread shape so the dumped plans are the ones the
  * bench runs (same shuffle-partition count, same extensions, same
  * sketch-perf session opts).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.maxMetadataStringLength", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.configureSketchPerf(spark)
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    SparkEntry.queries
      .filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (name, fn) =>
        try {
          val txt = fn(spark, dir).queryExecution.explainString(mode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        } catch { case e: Throwable =>
          System.err.println(s"[plansnap] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
