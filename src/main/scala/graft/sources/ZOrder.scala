package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional data
  * skipping for the lakehouse write path (Morton 1966; the technique
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, implemented here from
  * first principles on public knowledge).
  *
  * Why a 100 TB engine needs it: parquet footers carry per-file/
  * row-group min-max stats, and readers prune on them — but pruning
  * only bites when a file's value RANGE is narrow for the filtered
  * column. A table sorted by key A has perfectly narrow A-ranges and
  * corpus-wide B-ranges: a predicate on B reads EVERY file. The
  * Morton curve interleaves the bits of both keys' rank spaces, so
  * sorting by the z-value gives every file a narrow range in BOTH
  * dimensions at once (each loses ~half its resolution — the
  * standard trade). ZOrderSpec measures the effect directly: on a
  * two-sided box predicate, the fraction of files whose min-max box
  * intersects the query box drops from ~all (one-key sort, filtered
  * on the other key) to a small minority.
  *
  * Everything is codegen'd built-ins: rank normalization is an
  * equal-width bucketization against the frame's min/max (same
  * deterministic-bounds discipline as PrefixOps — a pure function of
  * the data, never a sampled partitioner), and bit interleaving uses
  * the classic magic-mask bit-spread (5 shift-mask steps per key,
  * not a 32-term loop).
  */
object ZOrder {

  /** Spread the low 32 bits of `x` onto the even bit positions of a
    * long (the textbook mask cascade).
    */
  private def spread(x: Column): Column = {
    val m = Seq(
      (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    m.foldLeft(x.bitwiseAND(lit(0x00000000FFFFFFFFL))) {
      case (acc, (s, mask)) =>
        (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(mask))
    }
  }

  /** Morton z-value of two NON-NEGATIVE int rank columns (each
    * expected < 2³²; callers normalize with [[rank32]]).
    */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Equal-width rank of a numeric column into [0, 2^bits): a pure
    * function of the value and the frame's min/max — deterministic
    * across the write's passes (the PrefixOps slice-id argument).
    */
  def rank32(c: Column, lo: Column, hi: Column, bits: Int = 16): Column = {
    val buckets = 1L << bits
    least(lit(buckets - 1), greatest(lit(0L),
      floor((c.cast("double") - lo) * buckets / (hi - lo + 1.0d))
        .cast("long")))
  }

  /** Write `df` as `files` parquet files z-ordered on (colA, colB):
    * rank-normalize both keys against the frame's own bounds,
    * range-partition by the interleaved z-value, sort within each
    * partition by it, drop the helper column at the writer. Each
    * output file then covers a compact Morton segment — a narrow
    * min-max box in BOTH key dimensions.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, files: Int): Unit = {
    val bounds = df.agg(
      min(col(colA)).cast("double").as("loa"),
      max(col(colA)).cast("double").as("hia"),
      min(col(colB)).cast("double").as("lob"),
      max(col(colB)).cast("double").as("hib"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zvalue(
        rank32(col(colA), col("loa"), col("hia")),
        rank32(col(colB), col("lob"), col("hib"))))
      .drop("loa", "hia", "lob", "hib")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Comparison baseline: the same data single-key-sorted. */
  def writeLinear(df: DataFrame, path: String, sortCol: String,
      files: Int): Unit =
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
}
