package graft

import org.apache.spark.sql.functions._

import graft.operators.{LlmQueries, SliQueries, TextOps}
import graft.sources.Tables

/** Functional laws for the corpus-statistics / time-series-smoothing
  * queries (unigram_logprob, token_kl_sources, length_trim_outliers,
  * ewma_smooth, rolling_p95, hist_buckets) — properties the DuckDB
  * oracle (engine agreement) cannot express: information-theoretic
  * bounds that must hold on ANY corpus, and constructed fixtures
  * proving the scorers rank what they claim to rank.
  */
class CorpusStatsSpec extends SparkTestBase {

  private def tmpDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_cstats").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("unigram_logprob: rare-token docs score above common-token docs; NLL >= 0") {
    // 9 docs of a single common token, 1 doc of singleton tokens:
    // p(common) = 45/55, p(rare_i) = 1/55 — the rare doc's NLL must
    // dominate, and every NLL is -ln(p <= 1) >= 0.
    val common = Seq.fill(5)("alpha").mkString(" ")
    val rare = (1 to 5).map(i => s"zq$i").mkString(" ")
    val d = tmpDocs(
      (1L to 9L).map(i => (i, common, "en", "srcC", common.length.toLong)) :+
        (10L, rare, "en", "srcR", rare.length.toLong))
    val r = LlmQueries.unigramLogprob(spark, d).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r.keySet == Set("srcC", "srcR"))
    assert(r("srcR") > r("srcC"),
      s"rare-token doc must out-score common: ${r("srcR")} <= ${r("srcC")}")
    assert(r.values.forall(_ >= 0.0), s"NLL must be non-negative: $r")
  }

  test("token_kl_sources: KL >= 0 everywhere; single-source corpus has KL == 0") {
    val kl = LlmQueries.tokenKlSources(spark, sf).collect()
    assert(kl.nonEmpty)
    kl.foreach(r => assert(r.getDouble(3) >= 0.0,
      s"Gibbs: KL(p_src || p_corpus) < 0 for ${r.getString(0)}"))
    // one source => p_src == p_corpus => KL exactly 0 (up to Det.r4)
    val d = tmpDocs(Seq(
      (1L, "a b c a", "en", "only", 7L),
      (2L, "b c d", "en", "only", 5L)))
    val solo = LlmQueries.tokenKlSources(spark, d).collect()
    assert(solo.length == 1 && solo.head.getDouble(3) == 0.0,
      s"single source must have zero divergence: ${solo.toSeq}")
  }

  test("length_trim_outliers: partition law and an outlier actually drops") {
    val rows = TextOps.lengthTrimOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ds, dl, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ds + dl + kept == n,
        s"${r.getString(0)}: $ds + $dl + $kept != $n")
      assert(r.getDouble(5) >= 0.5,
        s"[p05,p95] trim must keep a majority: ${r.getDouble(5)}")
    }
    // constructed: 20 same-length docs + one giant => giant is the
    // only n_chars > p95 row, so dropped_long == 1 for that source
    val d = tmpDocs(
      (1L to 20L).map(i => (i, "x y z", "en", "s", 100L)) :+
        (21L, "x y z", "en", "s", 100000L))
    val t = TextOps.lengthTrimOutliers(spark, d).collect()
    assert(t.length == 1 && t.head.getLong(3) == 1L,
      s"giant doc must drop long: ${t.toSeq}")
  }

  test("ewma_smooth: day-1 identity, bounds, and constant-series fixpoint") {
    val rows = SliQueries.ewmaSmooth(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      // weight of a 1-row frame is all on that row
      assert(math.abs(sorted.head.getDouble(2) - sorted.head.getDouble(3)) < 1e-9,
        s"$t: day-1 ewma must equal day-1 avg")
      // convexity: every ewma lies within the running [min, max] of
      // the series so far
      var lo = Double.MaxValue; var hi = Double.MinValue
      sorted.foreach { r =>
        lo = math.min(lo, r.getDouble(2)); hi = math.max(hi, r.getDouble(2))
        val e = r.getDouble(3)
        assert(e >= lo - 1e-4 && e <= hi + 1e-4,
          s"$t ${r.getDate(1)}: ewma $e outside running [$lo, $hi]")
      }
    }
    // α=1/2 halves the previous weight mass: ewma_2 = (v1 + 2·v2)/3
    val s0 = byType.head._2.sortBy(_.getDate(1).toString)
    if (s0.length >= 2) {
      val expected = (s0(0).getDouble(2) + 2 * s0(1).getDouble(2)) / 3
      assert(math.abs(s0(1).getDouble(3) - expected) < 1e-3,
        s"day-2 ewma ${s0(1).getDouble(3)} != (v1+2v2)/3 = $expected")
    }
  }

  test("rolling_p95: day-1 identity and window-bound law") {
    val rows = SliQueries.rollingP95(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      assert(math.abs(sorted.head.getDouble(2) - sorted.head.getDouble(3)) < 1e-9,
        s"$t: day-1 rolling must equal day-1 p95")
      // the rolling mean of a window of p95s stays inside their range
      val p95s = sorted.map(_.getDouble(2))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val win = p95s.slice(math.max(0, i - 6), i + 1)
        assert(r.getDouble(3) >= win.min - 1e-4 && r.getDouble(3) <= win.max + 1e-4,
          s"$t ${r.getDate(1)}: rolling outside its window's range")
      }
    }
  }

  test("hist_buckets: mass conservation, bucket domain, interior-bucket means") {
    val rows = SparkEntry.queries("hist_buckets")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val direct = Tables.events(spark, sf).count()
    assert(total == direct, s"histogram mass $total != corpus $direct")
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b <= 19, s"bucket $b out of domain")
      // clamped edge buckets (0, 19) may hold out-of-range values;
      // interior means must sit inside their bucket
      if (b > 0 && b < 19) {
        val m = r.getDouble(3)
        assert(m >= b * 10 - 1e-4 && m < (b + 1) * 10 + 1e-4,
          s"bucket $b mean $m outside [${b * 10}, ${(b + 1) * 10})")
      }
    }
  }

  test("entropy_ttr: all-distinct corpus hits TTR 1 / H = ln V exactly; " +
    "fixture obeys H <= ln V and TTR in (0,1]") {
    // 4 tokens, each once → N = V = 4, Σ c·ln c = 0 → H = ln 4, TTR 1
    val d = tmpDocs(Seq((1L, "aa bb cc dd", "en", "srcU", 11L)))
    val u = LlmQueries.entropyTtr(spark, d).collect()(0)
    assert(u.getLong(1) == 4L && u.getLong(2) == 4L)
    assert(u.getDouble(3) == 1.0, s"ttr ${u.getDouble(3)}")
    val lnV = math.round((math.log(4) + 1e-7) * 1e4) / 1e4
    assert(u.getDouble(4) == lnV, s"entropy ${u.getDouble(4)} != ln4 $lnV")
    // uniform-distribution maximality + ratio bounds on the real fixture
    LlmQueries.entropyTtr(spark, sf).collect().foreach { r =>
      val (n, v) = (r.getLong(1), r.getLong(2))
      assert(n >= v && v > 0, r.toString)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0, s"ttr ${r.getDouble(3)}")
      assert(r.getDouble(4) <= math.log(v.toDouble) + 1e-3,
        s"${r.getString(0)}: H ${r.getDouble(4)} > ln(V) ${math.log(v.toDouble)}")
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("char_entropy: characters are CODE POINTS — non-BMP chars (emoji, " +
    "supplementary CJK) survive intact and entropy matches the hand computation") {
    // "a😀😀b": code points a(1), 😀(2), b(1), total 4 → 3 distinct,
    // H = −(¼ln¼·2 + ½ln½). A code-UNIT split would see the surrogate
    // halves of 😀 as two distinct chars (4 distinct, different H) —
    // the r5-advice cross-engine divergence this pins CLOSED: DuckDB's
    // string_split_regex(text, '') is per-code-point, and so is
    // Spark's split(text, '') (zero-width regex matches never land
    // inside a surrogate pair; verified empirically on 😀 / 𪚥).
    val d = tmpDocs(Seq((1L, "a😀😀b", "emoji", "s1", 4L),
      (2L, "中𪚥𪚥𪚥x", "cjk", "s2", 5L)))
    val out = TextOps.charEntropy(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("emoji").getLong(1) == 3L,
      s"emoji alphabet ${out("emoji").getLong(1)} != 3 (surrogate split?)")
    val hEmoji = math.round((-(2 * 0.25 * math.log(0.25) +
      0.5 * math.log(0.5)) + 1e-7) * 1e4) / 1e4
    assert(out("emoji").getDouble(2) == hEmoji,
      s"emoji H ${out("emoji").getDouble(2)} != $hEmoji")
    // 中(1) 𪚥(3) x(1), total 5 → 3 distinct
    assert(out("cjk").getLong(1) == 3L,
      s"cjk alphabet ${out("cjk").getLong(1)} != 3 (surrogate split?)")
    val hCjk = math.round((-(2 * 0.2 * math.log(0.2) +
      0.6 * math.log(0.6)) + 1e-7) * 1e4) / 1e4
    assert(out("cjk").getDouble(2) == hCjk,
      s"cjk H ${out("cjk").getDouble(2)} != $hCjk")
  }
}
