package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins. AQE's skew-join split
  * (on by default) handles most hot keys at runtime; this explicit
  * salted join is for the cases AQE can't fix — a single key so hot
  * one task still chokes after splitting, or a deliberately
  * pre-partitioned pipeline where runtime re-planning is off.
  *
  * Shape: the (small) build side is replicated `salt` ways; each
  * probe row picks one replica pseudo-randomly but DETERMINISTICALLY
  * (hash of its own key + row id), so the hot key's probe rows spread
  * over `salt` reducers instead of one. Result is row-identical to
  * the plain join (ScaleOpsSpec proves it).
  */
object SkewOps {

  /** Equi-join `probe ⋈ build` on `probe(probeKey) == build(buildKey)`
    * with the build side salted `salt` ways. `build` must be the
    * smaller side (it is replicated ×salt).
    */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salt: Int): DataFrame = {
    val p = probe.withColumn("__salt_p",
      pmod(xxhash64(col(probeKey), monotonically_increasing_id()), lit(salt.toLong))
        .cast("int"))
    val b = build.withColumn("__salt_b",
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b,
        p(probeKey) === b(buildKey) && col("__salt_p") === col("__salt_b"))
      .drop("__salt_p", "__salt_b")
  }
}
