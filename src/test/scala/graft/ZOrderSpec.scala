package graft

import org.apache.spark.sql.functions._

import graft.sources.{Tables, ZOrder}

/** Z-order layout: the data-skipping claim measured directly. Every
  * parquet reader prunes files/row-groups on footer min-max stats;
  * this spec computes each file's actual min-max box (exactly what
  * the footer holds) and counts how many files a predicate's box
  * intersects under (a) single-key sort and (b) Morton layout.
  */
class ZOrderSpec extends SparkTestBase {

  private val files = 32

  test("suppkey predicates prune z-ordered files; one-key sort reads everything") {
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity")
    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    ZOrder.writeZOrdered(li, s"$base/z", "l_partkey", "l_suppkey", files)
    ZOrder.writeLinear(li, s"$base/linear", "l_partkey", files)

    def boxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("l_partkey").as("plo"), max("l_partkey").as("phi"),
          min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val (zb, lb) = (boxes(s"$base/z"), boxes(s"$base/linear"))
    assert(zb.length == files && lb.length == files)

    // a 10%-of-domain band on the key the linear layout did NOT sort by
    val (sLo, sHi) = {
      val r = li.agg(min("l_suppkey"), max("l_suppkey")).collect().head
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val w = (hi - lo) / 10
      (lo + 45 * (hi - lo) / 100, lo + 45 * (hi - lo) / 100 + w)
    }
    def overlapS(bs: Array[(Long, Long, Long, Long)]): Int =
      bs.count { case (_, _, slo, shi) => shi >= sLo && slo <= sHi }
    val (zOverlap, lOverlap) = (overlapS(zb), overlapS(lb))
    // one-key sort cannot prune the other key: every file's suppkey
    // range spans the domain
    assert(lOverlap == files,
      s"expected no pruning under linear layout, got $lOverlap/$files")
    // the Morton layout must prune a majority of files
    assert(zOverlap * 2 <= files,
      s"z-order pruned too little: $zOverlap/$files files overlap")

    // layouts must be content-equal (layout is not allowed to lose rows)
    val zSum = spark.read.parquet(s"$base/z")
      .agg(count(lit(1)), sum("l_quantity")).collect().head
    val lSum = spark.read.parquet(s"$base/linear")
      .agg(count(lit(1)), sum("l_quantity")).collect().head
    assert(zSum.getLong(0) == lSum.getLong(0))
    assert(math.abs(zSum.getDouble(1) - lSum.getDouble(1)) < 1e-6)

    // and the real reader benefits: the same filtered count through
    // the parquet scan agrees under both layouts
    val pred = col("l_suppkey").between(sLo, sHi)
    val zn = spark.read.parquet(s"$base/z").filter(pred).count()
    val ln = spark.read.parquet(s"$base/linear").filter(pred).count()
    assert(zn == ln && zn > 0)
  }

  test("zvalue: interleaving is monotone on each axis and injective on the grid") {
    import spark.implicits._
    val grid = (for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(grid.values.toSet.size == grid.size, "z not injective")
    grid.foreach { case ((a, b), z) =>
      if (a > 0) assert(grid((a - 1, b)) < z, s"not monotone in a at ($a,$b)")
      if (b > 0) assert(grid((a, b - 1)) < z, s"not monotone in b at ($a,$b)")
    }
    // spot-check the textbook interleave: (0b11, 0b00) -> 0b0101 = 5,
    // (0b00, 0b11) -> 0b1010 = 10, (0b11, 0b11) -> 0b1111 = 15
    assert(grid((3L, 0L)) == 5L && grid((0L, 3L)) == 10L && grid((3L, 3L)) == 15L)
  }
}
