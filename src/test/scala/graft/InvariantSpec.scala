package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Golden-invariant suite (SURVEY §5.2.2): cross-query consistency
  * laws on sf0.001. These are engine-side truths that must hold no
  * matter what the data is — they complement (not replace) the
  * driver's DuckDB differential oracle.
  */
class InvariantSpec extends SparkTestBase {

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query returns at least one row on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query key has matching column names with its oracle SQL select") {
    // Column-name parity is the #1 hash-mismatch cause (driver compare
    // sorts columns by name). Sanity: oracleSql references every
    // output column name of the Spark result.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val cols = SparkEntry.queries(name)(spark, sf).columns
      cols.foreach { c =>
        assert(sql.toLowerCase.contains(c.toLowerCase),
          s"$name: Spark output column '$c' not mentioned in oracle SQL")
      }
    }
  }

  test("breach + compliance cross-check: compliance == 100*(minutes-breaches)/minutes") {
    val breach = rows("slo_breach_count")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val compl = rows("slo_compliance_pct")
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(breach.keySet == compl.keySet)
    breach.foreach { case (t, (minutes, breaches)) =>
      val expect = 100.0 * (minutes - breaches) / minutes
      assert(math.abs(compl(t) - expect) < 1e-3,
        s"$t: compliance ${compl(t)} != derived $expect")
    }
  }

  test("breach_count.minutes == distinct minutes in sli_minute_downsample per type") {
    val minutes = rows("sli_minute_downsample")
      .groupBy(_.getString(0)).view.mapValues(_.size).toMap
    rows("slo_breach_count").foreach { r =>
      assert(r.getLong(1) == minutes(r.getString(0)).toLong)
    }
  }

  test("rollup: ALL/ALL row equals sum of leaf rows; region ALL rows equal region sums") {
    val rs = rows("rollup_region_nation")
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val leaves = rs.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val grand = rs.find(r => r._1 == "ALL" && r._2 == "ALL").get._3
    assert(math.abs(leaves.map(_._3).sum - grand) < 1.0) // rounding slack: 31 groups * 0.005
    val regionAll = rs.filter(r => r._1 != "ALL" && r._2 == "ALL")
    regionAll.foreach { case (region, _, rev) =>
      val sumChildren = leaves.filter(_._1 == region).map(_._3).sum
      assert(math.abs(sumChildren - rev) < 0.5, s"$region: $sumChildren != $rev")
    }
  }

  test("cube: ALL/ALL count equals lineitem row count") {
    val all = rows("cube_flag_status")
      .find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(all.getLong(3) == Tables.lineitem(spark, sf).count())
  }

  test("set ops: intersect <= union; all counts non-negative") {
    val m = rows("set_ops_customers").map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("intersect") <= m("union"))
    assert(m.values.forall(_ >= 0))
  }

  test("dedup: n_unique <= n_docs and n_dups = n_docs - n_unique") {
    rows("dedup_docs").foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }

  test("distinct_exact: n_users <= n_events per type") {
    rows("distinct_exact").foreach(r => assert(r.getLong(1) <= r.getLong(2)))
  }

  test("outer_join_linecount: orders across histogram buckets sum to orders count") {
    val total = rows("outer_join_linecount").map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, sf).count())
  }

  test("asof: with_prior_view <= n_purchases; purchase totals match raw count") {
    val rs = rows("asof_prior_view")
    rs.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val totalPurchases = rs.map(_.getLong(1)).sum
    val raw = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(totalPurchases == raw)
  }

  test("rank_parts: ranks within 1..3, ordered within brand") {
    val rs = rows("rank_parts")
    rs.foreach(r => assert(r.getLong(3) >= 1 && r.getLong(3) <= 3))
  }

  test("top10_customers: exactly 10 rows, descending revenue") {
    val revs = rows("top10_customers").map(_.getDouble(2))
    assert(revs.size == 10)
    assert(revs.sliding(2).forall(p => p.head >= p.last))
  }

  test("cosine_topk: similarities in [-1, 1], descending") {
    val sims = rows("cosine_topk").map(_.getDouble(2))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sliding(2).forall(p => p.head >= p.last))
  }

  test("sessionize: avg_events_per_session >= 1") {
    rows("sli_sessionize").foreach(r => assert(r.getDouble(2) >= 1.0))
  }

  test("percentile: p50 <= p90 <= p99 per type") {
    rows("percentile_value").foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("hash_split: docs conserved, all three splits present, stable under repartition") {
    val split = rows("hash_split")
    assert(split.map(_.getString(0)).toSet == Set("train", "val", "test"))
    val total = split.map(_.getLong(2)).sum
    val docs = Tables.documents(spark, sf).count()
    assert(total == docs, s"split counts $total != $docs docs")
    // content-hash assignment is partitioning-independent by
    // construction — same result after an arbitrary repartition
    val again = SparkEntry.queries("hash_split")(spark, sf).repartition(7).collect()
    assert(again.sortBy(r => (r.getString(0), r.getString(1))).toSeq ==
      split.sortBy(r => (r.getString(0), r.getString(1))))
  }

  test("curate_corpus: curated docs <= unique docs per lang; quality in filter range") {
    val curated = rows("curate_corpus")
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val unique = rows("dedup_docs")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    curated.foreach { case (lang, n) =>
      assert(n <= unique(lang), s"$lang: curated $n > unique ${unique(lang)}")
    }
    rows("curate_corpus").foreach { r =>
      assert(r.getDouble(4) >= 0.3 && r.getDouble(4) <= 1.0 + 1e-9)
    }
  }

  test("regex_token_profile: long-word and er-word counts are non-negative, docs match") {
    val prof = rows("regex_token_profile")
    val docs = rows("text_stats").map(r => r.getString(0) -> r.getLong(1)).toMap
    prof.foreach { r =>
      assert(r.getLong(1) == docs(r.getString(0)), "per-lang doc counts disagree with text_stats")
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
    }
  }

  test("skyline_parts: survivors are exactly the undominated parts (brute force)") {
    val parts = Tables.raw(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(p: (Long, Double, Int)) = parts.exists { q =>
      q._1 != p._1 && q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3)
    }
    val expect = parts.filterNot(dominated).map(_._1).toSet
    val got = rows("skyline_parts").map(_.getLong(0)).toSet
    assert(got == expect, s"skyline mismatch: got $got expected $expect")
  }

  test("benford_digits: shares sum to 1, digits in 1..9, benford column is the law") {
    val b = rows("benford_digits")
    assert(b.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(b.map(_.getDouble(2)).sum - 1.0) < 1e-3)
    b.foreach { r =>
      val law = math.log10(1.0 + 1.0 / r.getInt(0))
      assert(math.abs(r.getDouble(3) - law) < 1e-4)
    }
  }

  test("bigram_logprob: per-source doc counts match text stats; scores negative") {
    // every fixture doc has >= 10 tokens, so no doc is excluded by the
    // >= 2-token bigram rule and the per-source doc counts must equal
    // the corpus's (sources are lang-crossed: derive from documents)
    val docs = Tables.raw(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = rows("bigram_logprob")
    assert(b.map(_.getString(0)).toSet == docs.keySet)
    b.foreach { r =>
      assert(r.getLong(1) == docs(r.getString(0)), s"doc count drift: $r")
      // add-one smoothed conditional probs are < 1 strictly (vocab > 1)
      assert(r.getDouble(2) < 0.0 && r.getDouble(3) <= r.getDouble(2),
        s"logprob ordering violated: $r")
    }
  }

  test("survival_conversion: KM curve matches a driver-side replay; monotone laws") {
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L // full µs grid
    val evs = Tables.events(spark, sf) // normalizing loader: TimestampType
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), micros(r.getTimestamp(2))))
    val t0 = evs.filter(_._2 == "view").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val tmax = evs.map(_._3).max
    val subjects = t0.map { case (u, t) =>
      val tp = evs.filter(e => e._1 == u && e._2 == "purchase" && e._3 > t)
        .map(_._3).minOption
      val durMin = (tp.getOrElse(tmax) - t) / 60000000L // µs → minutes
      (durMin, tp.isDefined)
    }.toSeq
    // KM product over event times
    val byDur = subjects.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = subjects.size.toLong
    var surv = 1.0
    val curve = scala.collection.mutable.TreeMap[Long, (Double, Long, Long)]()
    var (cumD, cumC) = (0L, 0L)
    byDur.foreach { case (dur, ss) =>
      val d = ss.count(_._2).toLong
      val c = ss.size - d
      if (d > 0) surv *= 1.0 - d.toDouble / atRisk
      atRisk -= d + c
      cumD += d; cumC += c
      curve(dur) = (surv, cumD, cumC)
    }
    rows("survival_conversion").foreach { r =>
      val h = r.getLong(0)
      val at = curve.rangeTo(h).lastOption.map(_._2)
      val (expS, expD, expC) = at.getOrElse((1.0, 0L, 0L))
      assert(r.getLong(1) == expD && r.getLong(2) == expC, s"counts drift at h=$h: $r")
      assert(math.abs(r.getDouble(3) - expS) < 1e-3,
        s"h=$h: got ${r.getDouble(3)} expected $expS")
    }
    val survs = rows("survival_conversion").map(_.getDouble(3))
    assert(survs == survs.sorted.reverse, "survival not non-increasing")
    assert(survs.forall(s => s >= 0.0 && s <= 1.0 + 1e-9))
  }

  test("ks_value_test: D matches the brute-force ECDF sweep; p in [0,1]") {
    val vals = Tables.raw(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "error").map(_._2).sorted
    val b = vals.filter(_._1 == "click").map(_._2).sorted
    val pts = (a ++ b).distinct
    val d = pts.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length -
        b.count(_ <= v).toDouble / b.length)
    }.max
    val r = rows("ks_value_test").head
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(math.abs(r.getDouble(2) - d) < 1e-3,
      s"D ${r.getDouble(2)} != brute force $d")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("mwu_value_test: U matches the brute-force pair count") {
    val vals = Tables.raw(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "error").map(_._2)
    val b = vals.filter(_._1 == "click").map(_._2)
    val u = a.iterator.map { x =>
      b.count(x > _) + 0.5 * b.count(x == _)
    }.sum
    val r = rows("mwu_value_test").head
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(math.abs(r.getDouble(2) - u) < 0.01 + 1e-9,
      s"U ${r.getDouble(2)} != brute force $u")
    // rank-biserial is 2U/(n_a n_b) − 1 of the same U
    val rb = 2.0 * u / (a.length.toDouble * b.length) - 1.0
    assert(math.abs(r.getDouble(4) - rb) < 1e-3)
  }

  test("dimension names are unique (blame_supplier oracle keying assumption)") {
    // blame_supplier aggregates by l_suppkey and joins s_name on after,
    // while its oracle groups by s_name post-join (r5 advice): the two
    // agree only while names are unique per key. Pin the assumption so
    // a duplicate-name feed fails HERE, not as a silent oracle merge.
    Seq("supplier" -> "s_name", "customer" -> "c_name").foreach {
      case (t, nameCol) =>
        val d = Tables.raw(spark, sf, t)
        assert(d.select(nameCol).distinct().count() == d.count(),
          s"$t.$nameCol is not unique — oracle name-grain grouping unsafe")
    }
  }
}
