ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "servicelevelreportingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap default raised 8g -> 16g in r10 (measured, guide §5): local[32]
// runs 32 executor task slots in ONE JVM, and 8g = 250 MB per slot —
// under any production executor sizing. On this round's host the 8g
// full-suite bench spent 30.8 s in GC with storm inflation on the
// mid-suite iterative queries (copurchase_pagerank 19.1 s wall /
// 22.5 s GC per pass); at 16g the same tree measured 11.6 s total GC
// and pagerank 4.8 s. 16g = 500 MB per slot, still 1/8th of the
// 128 GiB sandbox. Parameterized: SPARK_DRIVER_MEM overrides (the
// sf30 scale rows use 48g, BASELINE.md).
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
