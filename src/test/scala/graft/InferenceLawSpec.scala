package graft

import org.apache.spark.sql.Row

/** Law/invariant assertions for the round-7 inference + evaluation
  * wave — the properties that must hold by CONSTRUCTION (accounting
  * identities, probability bounds, coverage guarantees), independent
  * of the fixture. Golden counts pin the shape and the DuckDB hash
  * pins the values; these pin the MATH, so a refactor that stays
  * hash-green on one fixture but breaks an invariant class (e.g. a
  * quantile threshold off by one) still fails here.
  */
class InferenceLawSpec extends SparkTestBase {

  private def rows(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("conformal_interval: realized calibration coverage >= the 90% target") {
    // split-conformal guarantee on the calibration set itself: the
    // ceil((n+1)*0.9)-th order statistic covers >= ceil((n+1)*0.9)/n
    // of calibration scores, which is >= 0.9 for every n
    rows("conformal_interval").foreach { r =>
      val cov = r.getAs[Double]("cal_coverage")
      assert(cov >= 0.9, s"${r.getAs[String]("event_type")}: coverage $cov")
      assert(r.getAs[Double]("q_hat") >= 0.0)
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
    }
  }

  test("bootstrap_ci_mean: interval ordered, positive spread, sample mean inside (this fixture)") {
    rows("bootstrap_ci_mean").foreach { r =>
      val (lo, hi, m) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
        r.getAs[Double]("mean"))
      assert(lo < hi, s"degenerate CI [$lo, $hi]")
      assert(r.getAs[Double]("se_boot") > 0.0)
      // not a universal law (a 90% CI may exclude the point estimate
      // with small probability) — pinned as a fixture fact so a
      // resample-weighting bug that shifts every mean fails loudly
      assert(lo <= m && m <= hi, s"mean $m outside [$lo, $hi]")
    }
  }

  test("anova/kruskal: omnibus statistics are non-negative and effect sizes in [0,1]") {
    val a = rows("anova_value_test").head
    assert(a.getAs[Long]("k") == 5L)
    assert(a.getAs[Double]("f_stat") >= 0.0)
    val eta = a.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
    assert(a.getAs[Double]("ss_between") >= 0.0)
    assert(a.getAs[Double]("ss_within") >= 0.0)
    val kw = rows("kruskal_value_test").head
    assert(kw.getAs[Double]("h_stat") >= 0.0)
    val eps = kw.getAs[Double]("eps_sq")
    assert(eps >= 0.0 && eps <= 1.0)
    // kruskal_value_test (like its SQL twin must) hardcodes the five
    // event types as pivot columns — an event type added to the
    // fixture would silently drop out of the k-group H while the
    // dynamic-k ANOVA beside it would include it. Pin the fixture's
    // distinct-type set to the hardcoded list so that drift fails
    // loudly here instead of diverging the two omnibus tests.
    val fixtureTypes = graft.sources.Tables.events(spark, sf)
      .select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(fixtureTypes == Set("click", "error", "purchase", "signup", "view"),
      s"kruskal_value_test's hardcoded arm list is stale: fixture has $fixtureTypes")
  }

  test("spearman_value_hour: rho in [-1,1]") {
    val r = rows("spearman_value_hour").head
    val rho = r.getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("dft_periodogram: shares sum to 1 over the six harmonics; ratios in [0,1]") {
    val rs = rows("dft_periodogram")
    assert(rs.length == 6)
    val s = rs.map(_.getAs[Double]("power_share")).sum
    assert(math.abs(s - 1.0) < 1e-3, s"share sum $s")
    rs.foreach { r =>
      val a = r.getAs[Double]("amp_ratio")
      assert(a >= 0.0 && a <= 1.0)
    }
  }

  test("dup_cluster_sizes: doc accounting closes against the corpus") {
    val rs = rows("dup_cluster_sizes")
    val nDocs = rs.map(_.getAs[Long]("n_docs")).sum
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    assert(nDocs == corpus, s"histogram covers $nDocs of $corpus docs")
    rs.foreach { r =>
      assert(r.getAs[Long]("n_redundant") ==
        (r.getAs[Long]("size") - 1L) * r.getAs[Long]("n_clusters"))
    }
  }

  test("emb_quantize_error: int8 SQ error small, avg <= max, positive") {
    rows("emb_quantize_error").foreach { r =>
      val (a, m) = (r.getAs[Double]("avg_rel_err"), r.getAs[Double]("max_rel_err"))
      assert(a > 0.0 && a <= m)
      // 8-bit symmetric SQ on unit-norm vectors: relative L2 error is
      // ~sqrt(d)*step/2 with step ~ max|x|/127 — far below 2% on any
      // real embedding; a broken scale join lands orders above this
      assert(m < 0.02, s"max_rel_err $m")
    }
  }

  test("matryoshka_recall: recalls are valid fractions; d/2 beats d/4 here") {
    val r = rows("matryoshka_recall").head
    val (r16, r32) = (r.getAs[Double]("recall_d16"), r.getAs[Double]("recall_d32"))
    assert(r16 >= 0.0 && r16 <= 1.0 && r32 >= 0.0 && r32 <= 1.0)
    // fixture fact (more dims = strictly more of the cosine signal on
    // isotropic data); not a universal law, pinned to catch a
    // swapped-slice bug
    assert(r32 >= r16, s"recall_d32 $r32 < recall_d16 $r16")
  }

  test("knn_label_eval: P@10 and MRR bounded; MRR >= P@10's first-hit floor") {
    rows("knn_label_eval").foreach { r =>
      val (p, mrr) = (r.getAs[Double]("avg_p_at_10"), r.getAs[Double]("mrr_at_10"))
      assert(p >= 0.0 && p <= 1.0)
      assert(mrr >= 0.0 && mrr <= 1.0)
      // any query with a hit contributes >= 1/10 to MRR and exactly
      // >= 1/10 of its P@10 mass — so MRR >= p/10 always
      assert(mrr >= p / 10.0 - 1e-9)
    }
  }

  test("bpe_merge_candidates: descending counts, 2-char pairs, shares < 1") {
    val rs = rows("bpe_merge_candidates")
    assert(rs.length == 20)
    val cnts = rs.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (x, y) => x >= y }, "not sorted")
    rs.foreach { r =>
      assert(r.getAs[String]("pair").length == 2)
      assert(r.getAs[Double]("pair_share") < 1.0)
    }
  }

  test("clustering_coeff: coefficients in [0,1], buckets non-empty") {
    rows("clustering_coeff").foreach { r =>
      val cc = r.getAs[Double]("avg_cc")
      assert(cc >= 0.0 && cc <= 1.0, s"bucket ${r.getAs[Long]("deg_bucket")}: cc $cc")
      assert(r.getAs[Long]("n_nodes") > 0L)
    }
  }

  test("hill_tail_index: k = 50 and a positive finite tail exponent") {
    val r = rows("hill_tail_index").head
    assert(r.getAs[Long]("k") == 50L)
    val a = r.getAs[Double]("alpha_hill")
    assert(a > 0.0 && !a.isInfinite && !a.isNaN, s"alpha $a")
  }

  test("scd2_versions: closed <= total versions; every user contributes >= 1 version") {
    val rs = rows("scd2_versions")
    rs.foreach { r =>
      assert(r.getAs[Long]("n_closed") <= r.getAs[Long]("n_versions"))
      assert(r.getAs[Double]("avg_events_per_version") >= 1.0)
    }
    val totalVersions = rs.map(_.getAs[Long]("n_versions")).sum
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(totalVersions >= users, "fewer versions than users with history")
  }

  test("ndcg_label_eval: nDCG in [0,1] per class") {
    rows("ndcg_label_eval").foreach { r =>
      val n = r.getAs[Double]("avg_ndcg")
      assert(n >= 0.0 && n <= 1.0, s"label ${r.getAs[Long]("q_label")}: $n")
    }
  }

  test("median_ci_binomial: l <= median-rank <= u implies ci_lo <= median <= ci_hi") {
    rows("median_ci_binomial").foreach { r =>
      val (lo, m, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("median"),
        r.getAs[Double]("ci_hi"))
      assert(lo <= m && m <= hi, s"($lo, $m, $hi) out of order")
      assert(r.getAs[Long]("l_rank") >= 1L)
      assert(r.getAs[Long]("u_rank") <= r.getAs[Long]("n"))
    }
  }

  test("trimmed_mean: trimmed <= winsorized <= mean on the right-skewed fixture") {
    rows("trimmed_mean").foreach { r =>
      val (m, t, wz) = (r.getAs[Double]("mean"), r.getAs[Double]("trimmed_mean"),
        r.getAs[Double]("winsorized_mean"))
      // exponential tail: the top 5% carries more mass than the
      // bottom 5%, so trimming pulls the location down — fixture
      // facts that catch a flipped rank band instantly
      assert(t <= wz + 1e-9 && wz <= m + 1e-9, s"($t, $wz, $m) ordering")
      assert(r.getAs[Long]("k") >= 1L)
    }
  }

  test("incremental_dedup: batch accounting identity holds per lang") {
    rows("incremental_dedup").foreach { r =>
      // n_batch - internal dups = distinct batch fingerprints
      //                         = store hits + ingested
      assert(r.getAs[Long]("n_batch") - r.getAs[Long]("n_internal_dups") ==
        r.getAs[Long]("n_store_hits") + r.getAs[Long]("n_ingested"),
        s"lang ${r.getAs[String]("lang")}: accounting broken")
      assert(r.getAs[Long]("n_ingested") > 0L)
    }
  }
}
