package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, DedupOps, LlmQueries, RelationalQueries}
import graft.sources.Tables

/** Quantitative bounds for the probabilistic scale-path operators that
  * cannot be DuckDB-oracled (SURVEY §2.5): HLL error, MinHash LSH
  * recall, SimHash consistency, IVF ANN structural guarantees.
  */
class HllSpec extends SparkTestBase {
  test("distinct_hll: |exact - approx| / exact < 5% per event_type") {
    val exact = RelationalQueries.distinctExact(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = DedupOps.distinctHll(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (t, ex) =>
      val err = math.abs(ex - approx(t)).toDouble / ex
      assert(err < 0.05, s"$t: exact=$ex approx=${approx(t)} err=$err")
    }
  }
}

class ApproxPercentileSpec extends SparkTestBase {
  test("percentile_approx rank error <= 2% per type (the GK sketch guarantee)") {
    // GK sketches bound RANK error, not value error (a sparse tail can
    // make the p99 VALUE differ visibly while the rank is spot-on), so
    // assert: the approx value's empirical rank is within 2% of q.
    import graft.sources.Tables
    import org.apache.spark.sql.functions.col
    val values = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val approx = graft.operators.ScalarQueries.percentileApproxValue(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(values.keySet == approx.keySet)
    approx.foreach { case (t, (a50, a90, a99)) =>
      val vs = values(t)
      Seq((a50, 0.5, "p50"), (a90, 0.9, "p90"), (a99, 0.99, "p99")).foreach {
        case (a, q, n) =>
          val rank = vs.count(_ <= a).toDouble / vs.length
          assert(math.abs(rank - q) <= 0.02, s"$t $n: approx $a has rank $rank, want $q")
      }
    }
  }
}

class MinhashRecallSpec extends SparkTestBase {
  test("near_dup_minhash: recall >= 0.9 vs exact ground truth (doc_id < 300), precision = 1") {
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    val got = DedupOps.minhashPairs(docs)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = LlmQueries.exactJaccardPairs(
        docs.withColumnRenamed("toks", "ws"), 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "ground truth is empty — fixture changed?")
    // precision 1.0 by construction (candidates are exact-verified)
    assert((got -- truth).isEmpty, s"false positives: ${(got -- truth).take(5)}")
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (|truth|=${truth.size}, |got|=${got.size})")
  }

  test("nearDupKillList: subset of exact killable docs, recall >= 0.8 (doc_id < 300)") {
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    // exact ground truth: doc b is killable iff some a < b has jaccard >= 0.8
    val killable = LlmQueries.exactJaccardPairs(
        docs.withColumnRenamed("toks", "ws"), 0.8)
      .select("b_id").collect().map(_.getLong(0)).toSet
    val got = DedupOps.nearDupKillList(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(killable.nonEmpty)
    // precision 1.0: a verified bucket-rep pair is an exact near-dup pair
    assert((got -- killable).isEmpty, s"false kills: ${(got -- killable).take(5)}")
    val recall = (got & killable).size.toDouble / killable.size
    assert(recall >= 0.8, s"kill recall $recall < 0.8 (|truth|=${killable.size}, |got|=${got.size})")
  }
}

class SimhashSpec extends SparkTestBase {
  test("identical token sets get identical simhash (hamming 0) and are always found") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    // exact-duplicate token-set pairs (jaccard = 1.0) within a lang
    val exactDups = LlmQueries.exactJaccardPairs(
        docs.withColumnRenamed("toks", "ws").filter(col("doc_id") < 300), 1.0)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val simPairs = DedupOps.simhashPairs(docs, maxHamming = 3)
      .filter(col("a_id") < 300 && col("b_id") < 300)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    exactDups.foreach { p =>
      assert(simPairs.get(p).contains(0L),
        s"exact-dup pair $p missing or nonzero hamming in simhash pairs")
    }
  }

  test("simhash_dups plane collapse equals naive pair enumeration exactly") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    val naive = DedupOps.simhashPairs(docs)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pairs_hamming_le_3"),
        round(avg("hamming") + lit(1e-7), 4).as("avg_hamming"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val collapsed = DedupOps.simhashDups(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(collapsed == naive, s"collapsed=$collapsed naive=$naive")
  }

  test("clique blow-up guard: materialized candidate rows are O(docs) on the template-clique corpus") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    val nDocs = docs.count()
    val groups = DedupOps.simhashSigGroups(docs)
    assert(groups.count() <= nDocs)
    // verified pairs (incl. one self row per group) are what reach the
    // distinct() exchange — the hamming check runs inside the banding
    // join — and must stay linear in corpus size even though the
    // corpus is built of template cliques (~550 rows for 500 docs at
    // sf0.001; ~7.6k for 5000 at sf0.1)
    val nCands = DedupOps.simhashGroupPairs(groups).count()
    assert(nCands <= 2 * nDocs,
      s"materialized candidates $nCands exceed 2x corpus size $nDocs — clique collapse broken")
  }

  test("simhash signature is deterministic and 64-bit stable") {
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    def sigs() = DedupOps.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (a, b) = (sigs(), sigs())
    assert(a == b)
    assert(a.nonEmpty)
  }
}

class AnnRecallSpec extends SparkTestBase {
  test("ann_cosine_topk: structural guarantees + recall floor vs exact top-k") {
    val exact = LlmQueries.cosineTopk(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ann = AnnOps.annCosineTopk(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // 1. every ANN hit's cosine matches the exact computation where overlapping
    (ann.keySet & exact.keySet).foreach { id =>
      assert(math.abs(ann(id) - exact(id)) < 1e-9, s"vec $id: ${ann(id)} != ${exact(id)}")
    }
    // 2. no ANN score can beat the exact top-1
    assert(ann.values.max <= exact.values.max + 1e-9)
    // 3. recall floor: isotropic-random corpus (worst case for IVF)
    //    with nprobe 3 of 8 buckets still must find >= 20% of top-10
    val recall = (ann.keySet & exact.keySet).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall $recall < 0.2")
  }

  test("IvfIndex.assign: one bucket per vector, buckets are pivot ids, zero Exchange") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .filter(col("vec_id") =!= 0)
    val pivotRows = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id"), col("emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val assigned = graft.operators.IvfIndex.assign(emb, pivotRows)
    // the assignment is a pure projection: scan -> unrolled argmax,
    // no shuffle anywhere in the physical plan
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment plan has an Exchange:\n$plan")
    assert(assigned.count() == emb.count())
    val buckets = assigned.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(buckets.subsetOf((1L to 8L).toSet))
  }

  test("IvfIndex probe prunes partitions: only nprobe of npivots buckets are scanned") {
    val path = graft.operators.IvfIndex.ensure(spark, sf, npivots = 8).get
    val query = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .filter(col("vec_id") === 0)
    val res = graft.operators.IvfIndex.probeTopk(spark, path, query, nprobe = 3, k = 10)
    res.collect() // materialize so AQE finalizes the plan + DPP executes
    val scan = res.queryExecution.executedPlan.toString
      .linesIterator.find(s => s.contains("FileScan") && s.contains("assign"))
      .getOrElse(fail("no FileScan of the assign table in the plan"))
    assert(scan.contains("dynamicpruning"),
      s"assign-table scan is not dynamically partition-pruned: $scan")
  }
}

/** Batch ANN join (`ann_knn_join` / IvfIndex.probeTopkBatch):
  * structural guarantees + recall floor vs brute-force exact top-k
  * over the same corpus.
  */
class AnnBatchSpec extends SparkTestBase {
  test("ann_knn_join: dense ranks, exact cosines, no self-matches, recall floor") {
    val rows = graft.operators.AnnOps.annKnnJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    // dense 1..k rank per query, no self matches
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.size).toSeq, s"ranks not dense for q=$q")
      assert(rs.forall(r => r.getLong(2) != q), s"self-match for q=$q")
    }
    // exact brute-force top-3 per query over the indexed corpus
    import org.apache.spark.sql.functions._
    val all = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val corpus = all.filter(col("vec_id") =!= 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val queries = all.filter(col("vec_id") < 50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exact = queries.map { case (q, qe) =>
      q -> corpus.filter(_._1 != q).map { case (id, e) => id -> cos(qe, e) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    }.toMap
    val hits = byQ.map { case (q, rs) =>
      (rs.map(_.getLong(2)).toSet & exact(q)).size
    }.sum
    val recall = hits.toDouble / (queries.length * 3)
    // isotropic corpus, nprobe 3/8 -> expected recall ~ 3/8; floor at 0.2
    assert(recall >= 0.2, s"batch recall $recall < 0.2")
    info(f"batch ANN recall@3 = $recall%.2f over ${queries.length} queries")
  }
}

/** Filtered ANN (`ann_filtered_topk` / IvfIndex.probeTopkFiltered):
  * predicate containment, exact cosines, recall floor vs the exact
  * FILTERED brute force, and the two scan guarantees — DPP on the
  * bucket partitions plus the metadata predicate pushed into the
  * parquet reader.
  */
class AnnFilteredSpec extends SparkTestBase {
  test("ann_filtered_topk: predicate containment, exact cosines, recall floor") {
    val rows = graft.operators.AnnOps.annFilteredTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    // 1. every result satisfies the predicate
    assert(rows.forall(_.getInt(1) == 7), "a result escaped the label=7 predicate")
    // exact filtered brute force over the indexed corpus (vec_id != 0)
    import org.apache.spark.sql.functions._
    val all = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
    val qe = all.filter(col("vec_id") === 0).collect().head.getSeq[Double](2).toArray
    val slice = all.filter(col("vec_id") =!= 0 && col("label") === 7).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exactScores = slice.map { case (id, e) => id -> cos(qe, e) }.toMap
    val exactTop = exactScores.toSeq.sortBy { case (id, c) => (-c, id) }
      .take(10).map(_._1).toSet
    // 2. every ANN cosine matches the exact computation (r4 grid)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - exactScores(r.getLong(0))) < 5e-5,
        s"vec ${r.getLong(0)}: ${r.getDouble(2)} != ${exactScores(r.getLong(0))}")
    }
    // 3. no ANN score beats the exact filtered top-1 (beyond the r4
    //    output-rounding grid — the ANN column is rounded, exact isn't)
    assert(rows.map(_.getDouble(2)).max <= exactScores.values.max + 5e-5)
    // 4. recall floor: isotropic corpus, nprobe 5/8 -> expected ~5/8
    val recall = (rows.map(_.getLong(0)).toSet & exactTop).size.toDouble / exactTop.size
    assert(recall >= 0.3, s"filtered recall $recall < 0.3")
    info(f"filtered ANN recall@10 = $recall%.2f (slice size ${slice.length})")
  }

  test("filtered probe plan: DPP on buckets AND the label predicate pushed to parquet") {
    val res = graft.operators.AnnOps.annFilteredTopk(spark, sf)
    res.collect() // materialize so AQE finalizes the plan + DPP executes
    val scan = res.queryExecution.executedPlan.toString
      .linesIterator.find(s => s.contains("FileScan") && s.contains("assign"))
      .getOrElse(fail("no FileScan of the assign table in the plan"))
    assert(scan.contains("dynamicpruning"),
      s"assign scan not dynamically partition-pruned: $scan")
    assert(scan.contains("PushedFilters: [") && scan.contains("label"),
      s"label predicate not pushed to the assign parquet reader: $scan")
  }
}

/** r5 verdict #3 — the LSH-Ensemble containment twin is EXECUTABLE:
  * recall/precision of `containment_lsh`'s size-stratified MinHash
  * path against the exact all-pairs directed-containment ground
  * truth on the full sf fixture, plus the structural no-all-pairs
  * guarantee.
  */
class ContainmentLshSpec extends SparkTestBase {
  test("containment_lsh: precision 1.0 and recall >= 0.85 vs exact all-pairs truth") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    val got = DedupOps.containmentLshPairs(docs)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact directed truth: same formula, string token sets, full corpus
    val t = docs.select(col("doc_id"), col("lang"), col("toks"),
      size(col("toks")).as("n"))
    val a = t.filter(col("n") >= 20)
      .select(col("doc_id").as("a_id"), col("lang"), col("toks").as("a_ws"), col("n").as("n_a"))
    val b = t.select(col("doc_id").as("b_id"), col("lang").as("b_lang"), col("toks").as("b_ws"))
    val truth = a.join(b, col("lang") === col("b_lang") && col("a_id") =!= col("b_id"))
      .filter(size(array_intersect(col("a_ws"), col("b_ws"))) * lit(1.0) / col("n_a") >= 0.9)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "ground truth is empty — fixture changed?")
    assert((got -- truth).isEmpty,
      s"false positives (exact verify broken?): ${(got -- truth).take(5)}")
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.85,
      s"recall $recall < 0.85 (|truth|=${truth.size}, |got|=${got.size})")
  }

  test("containment_lsh: bucket-join plan — no cartesian/broadcast-nested-loop anywhere") {
    val p = SparkEntry.queries("containment_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "containment_lsh degenerated to an all-pairs join")
  }

  test("containment audit: doc-level precision 1.0 and recall >= 0.95 vs exact truth") {
    // exact doc-grain truth: docs with >= 1 true container
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), DedupOps.tokensCol.as("toks"))
    val t = docs.select(col("doc_id"), col("lang"), col("toks"),
      size(col("toks")).as("n"))
    val a = t.filter(col("n") >= 20)
      .select(col("doc_id").as("a_id"), col("lang"), col("toks").as("a_ws"),
        col("n").as("n_a"))
    val b = t.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("toks").as("b_ws"))
    val truthDocs = a.join(b,
        col("lang") === col("b_lang") && col("a_id") =!= col("b_id"))
      .filter(size(array_intersect(col("a_ws"), col("b_ws"))) * lit(1.0) /
        col("n_a") >= 0.9)
      .select("a_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(truthDocs.nonEmpty, "ground truth is empty — fixture changed?")
    val flagged = DedupOps.containmentAuditPerDoc(
        graft.operators.SketchStore.sketches(spark, sf))
      .select("a_id").collect().map(_.getLong(0)).toSet
    assert((flagged -- truthDocs).isEmpty,
      s"audit false positives (exact verify broken?): ${(flagged -- truthDocs).take(5)}")
    val recall = (flagged & truthDocs).size.toDouble / truthDocs.size
    assert(recall >= 0.95,
      s"doc-level recall $recall < 0.95 (|truth|=${truthDocs.size}, |flagged|=${flagged.size})")
  }
}
