package graft

import java.io.{File, FileInputStream, FileOutputStream}
import java.util.jar.{JarEntry, JarOutputStream}

import scala.sys.process._

import org.apache.spark.sql.Row

/** r4 verdict #2 — "observed on >1 JVM": run every declared query on
  * a `local-cluster[2,4,…]` master (real executor JVMs, real
  * serialized shuffles and broadcasts, no shared driver heap) and
  * compare each result against the same query on the in-process
  * local session.
  *
  * Two SparkContexts can't share a JVM, so the cluster run forks a
  * child process executing [[graft.ClusterVerify]], shipping the
  * library as a jar via `spark.jars` — the spark-submit-faithful
  * channel (extraClassPath alone breaks lambda deserialization for
  * closures capturing graft expressions; see ClusterVerify's note).
  *
  * Compare policy mirrors the driver's gate: full value compare
  * (numeric tolerance 2e-4 — r4-rounded values can knife-edge across
  * summation orders; anything real is orders louder) for the
  * oracle-backed queries, row-count equality for the approximate
  * no-oracle ones (GK/HLL/approx_percentile merge trees differ by
  * partitioning, their ε specs hold separately).
  */
class ClusterModeSpec extends SparkTestBase {

  private def buildJar(classesDir: File, out: File): Unit = {
    val jos = new JarOutputStream(new FileOutputStream(out))
    def walk(f: File, prefix: String): Unit =
      f.listFiles().foreach { c =>
        val name = prefix + c.getName
        if (c.isDirectory) walk(c, name + "/")
        else {
          jos.putNextEntry(new JarEntry(name))
          val in = new FileInputStream(c)
          try in.transferTo(jos) finally in.close()
          jos.closeEntry()
        }
      }
    walk(classesDir, "")
    jos.close()
  }

  /** Canonical, sorted, tolerance-friendly rendering of a result set. */
  private def canon(v: Any): Any = v match {
    case r: Row => r.toSeq.map(canon)
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => (String.valueOf(k), canon(x)) }
        .sortBy(_._1)
    case s: scala.collection.Seq[_] => s.map(canon)
    case a: Array[_] => a.toSeq.map(canon)
    case f: Float => f.toDouble
    case other => other
  }

  private def numEq(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) ||
      math.abs(a - b) <= 2e-4 + 1e-6 * math.max(math.abs(a), math.abs(b))

  private def valEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) => numEq(x, y)
    case (x: Number, y: Number) if x.getClass == y.getClass =>
      x == y
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.lazyZip(y).forall(valEq)
    case (x: (_, _), y: (_, _)) =>
      valEq(x._1, y._1) && valEq(x._2, y._2)
    case _ => a == b
  }

  test("every declared query runs and agrees across real executor JVMs (local-cluster[2,4])") {
    val outDir = new File("/tmp/graft-cluster-verify")
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)

    val classesDir = System.getProperty("java.class.path")
      .split(File.pathSeparator)
      .find(_.endsWith(s"target${File.separator}scala-2.13${File.separator}classes"))
      .map(new File(_))
      .getOrElse(fail("main classes dir not on test classpath"))
    val jar = new File("/tmp/graft-cluster-lib.jar")
    buildJar(classesDir, jar)

    val javaBin = new File(new File(System.getProperty("java.home"), "bin"), "java")
    val moduleOpts = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split("\\s+").filter(_.nonEmpty)
    val cmd = Seq(javaBin.getAbsolutePath) ++ moduleOpts ++ Seq(
      "-Xmx4g", "-cp", System.getProperty("java.class.path"),
      "graft.ClusterVerify", sf, outDir.getAbsolutePath)
    val log = new StringBuilder
    val rc = Process(cmd, None,
      "SPARK_SCALA_VERSION" -> "2.13",
      "GRAFT_JAR" -> jar.getAbsolutePath)
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, s"ClusterVerify exited $rc:\n${log.takeRight(4000)}")

    val info = new String(java.nio.file.Files.readAllBytes(
      new File(outDir, "cluster_info.json").toPath))
    assert(info.contains("\"executors\":2"), s"expected 2 executor JVMs: $info")
    assert(info.contains("\"failures\":[]"), s"cluster-mode failures: $info")

    val withOracle = SparkEntry.oracleSql.keySet
    val mismatches = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val clusterDf = spark.read.parquet(s"${outDir.getAbsolutePath}/$name")
      val localDf = SparkEntry.queries(name)(spark, sf)
      if (!withOracle(name)) {
        // approximate/no-oracle queries: sketch merge trees differ by
        // partitioning — their own ε specs bound the values; here we
        // pin shape only
        if (clusterDf.count() != localDf.count()) Some(s"$name: row count")
        else None
      } else {
        val c = clusterDf.collect().map(canon(_)).sortBy(_.toString)
        val l = localDf.collect().map(canon(_)).sortBy(_.toString)
        if (c.length != l.length) Some(s"$name: ${c.length} vs ${l.length} rows")
        else c.lazyZip(l).collectFirst {
          case (cr, lr) if !valEq(cr, lr) => s"$name:\n  cluster $cr\n  local   $lr"
        }
      }
    }
    assert(mismatches.isEmpty,
      mismatches.mkString("cluster-vs-local mismatches:\n", "\n", ""))
  }
}
