package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Functional laws for the round-4 curation queries — properties the
  * oracle (which only proves engine agreement) cannot express:
  * structural bounds that must hold on ANY corpus, and constructed
  * positive/negative cases proving the detectors actually detect.
  */
class CurationLawSpec extends SparkTestBase {

  test("seq_pack_buckets: waste < 32 per doc, caps on the 32-grid, efficiency in (0, 1]") {
    val rows = SparkEntry.queries("seq_pack_buckets")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cap, nDocs, waste) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(cap % 32 == 0 && cap >= 32 && cap <= 512, s"cap off-grid: $cap")
      // each doc wastes at most 31 tokens against its own 32-granular
      // cap — the bound that makes bucketing worth doing at all
      assert(waste < 32 * nDocs, s"cap $cap: waste $waste >= 32 * $nDocs")
      val eff = r.getDouble(5)
      assert(eff > 0.0 && eff <= 1.0, s"cap $cap: efficiency $eff")
    }
    // total token mass is conserved: sum over buckets == corpus total
    val bucketed = rows.map(_.getLong(2)).sum
    val direct = Tables.documents(spark, sf)
      .select(sum(size(filter(split(col("text"), " "), t => t =!= "")).cast("long")))
      .head().getLong(0)
    assert(bucketed == direct, s"token mass not conserved: $bucketed != $direct")
  }

  test("repetition_stats: a pathological doc flags, a diverse doc does not") {
    import spark.implicits._
    import graft.operators.TextOps
    val d = java.nio.file.Files.createTempDirectory("graft_rep_law").toString
    val spam = ("buy " * 50).trim                    // top share 1.0
    val diverse = (1 to 50).map(i => s"w$i").mkString(" ") // distinct ratio 1.0
    Seq((1L, spam, "en", "s", spam.length.toLong),
        (2L, diverse, "en", "s", diverse.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = TextOps.repetitionStats(spark, d).collect()
    assert(r.length == 1 && r.head.getLong(2) == 1,
      s"expected exactly the spam doc flagged: ${r.toSeq}")
  }

  test("contamination_check: an embedded verbatim 8-gram flags; fresh text does not") {
    import spark.implicits._
    import graft.operators.TextOps
    val d = java.nio.file.Files.createTempDirectory("graft_cont_law").toString
    val benchDoc = (1 to 20).map(i => s"b$i").mkString(" ") // doc_id < 50 slice
    val quote = (5 to 12).map(i => s"b$i").mkString(" ")    // verbatim 8-gram
    val contaminated = s"some fresh prose then $quote and more prose after"
    val clean = (1 to 30).map(i => s"c$i").mkString(" ")
    Seq((1L, benchDoc, "en"), (100L, contaminated, "en"), (101L, clean, "en"))
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = TextOps.contaminationCheck(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 2, s"candidate pool: ${r.toSeq}")
    assert(r.head.getLong(2) == 1,
      s"exactly the embedded-quote doc must flag: ${r.toSeq}")
  }

  test("pii_scrub: scrubbed output of the fixture corpus re-scrubs to itself (idempotent)") {
    import graft.operators.TextOps
    // scrub twice == scrub once on any corpus where replacement tokens
    // don't themselves match a pattern (they can't: no @, no digits)
    val once = TextOps.piiScrubRows(Tables.documents(spark, sf))
      .select(col("doc_id"), col("scrubbed").as("text"), col("lang"))
    val twice = TextOps.piiScrubRows(once)
    val changed = twice.filter(col("text") =!= col("scrubbed")).count()
    assert(changed == 0, s"$changed docs changed on re-scrub")
  }

  test("segment_dedup: cross-doc boilerplate and intra-doc repeats both remove; clean docs survive") {
    import spark.implicits._
    import graft.operators.DedupOps
    val d = java.nio.file.Files.createTempDirectory("graft_seg_law").toString
    val boiler = (1 to 8).map(i => s"nav$i").mkString(" ")  // position-aligned 8-tok segment
    val docA = boiler + " " + (1 to 8).map(i => s"a$i").mkString(" ")
    val docB = boiler + " " + (1 to 8).map(i => s"b$i").mkString(" ")
    val rep = (1 to 8).map(i => s"x$i").mkString(" ")
    val docC = rep + " " + rep                              // intra-doc repeat: both go
    val docD = (1 to 16).map(i => s"d$i").mkString(" ")     // clean
    Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = DedupOps.segmentDedup(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 4, s"n_docs: $row")
    assert(row.getLong(2) == 8, s"n_segs: $row")
    assert(row.getLong(3) == 4, s"n_removed (A+B boiler, C both): $row")
    assert(row.getLong(4) == 3, s"n_docs_touched: $row")
    assert(math.abs(row.getDouble(5) - 0.5) < 1e-9, s"avg_frac_removed: $row")
  }

  test("segment_dedup: structural bounds hold on the real corpus") {
    SparkEntry.queries("segment_dedup")(spark, sf).collect().foreach { r =>
      val (nDocs, nSegs, nRem, nTouched, frac) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nRem >= 0 && nRem <= nSegs, s"removed out of bounds: $r")
      assert(nTouched <= nDocs, s"touched > docs: $r")
      assert(frac >= 0.0 && frac <= 1.0001, s"frac out of [0,1]: $r")
    }
  }

  test("corpus_mix_sample: inclusion is a pure function of content (JVM md5 twin)") {
    // recompute every doc's inclusion decision with java.security md5
    // — a THIRD implementation besides Spark's and DuckDB's — and
    // check the per-source sampled counts match exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    def u16(text: String): Long = {
      val h = md.digest(text.getBytes("UTF-8"))
      ((h(0).toLong & 0xffL) << 8) | (h(1).toLong & 0xffL)
    }
    def thr(source: String): Long = source.drop(3).toInt match {
      case i if i < 5  => 65536L
      case i if i < 10 => 32768L
      case i if i < 15 => 16384L
      case _           => 8192L
    }
    val expect = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .view.mapValues(rs => rs.count(r => u16(r.getString(1)) < thr(r.getString(0))).toLong)
      .toMap
    val got = SparkEntry.queries("corpus_mix_sample")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  test("corpus_mix_sample: realized rates track the tier policy") {
    SparkEntry.queries("corpus_mix_sample")(spark, sf).collect().foreach { r =>
      val (source, n, rate) = (r.getString(0), r.getLong(1), r.getDouble(3))
      val target = thrOf(source) / 65536.0
      // binomial 4-sigma band — content hashes are uniform
      val sigma = math.sqrt(target * (1 - target) / n)
      assert(math.abs(rate - target) <= 4 * sigma + 1e-4,
        s"$source: realized $rate vs target $target (n=$n)")
    }
  }

  private def thrOf(source: String): Long = source.drop(3).toInt match {
    case i if i < 5  => 65536L
    case i if i < 10 => 32768L
    case i if i < 15 => 16384L
    case _           => 8192L
  }
}
