package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalable near-duplicate detection (SURVEY §2.5 `near_dup_minhash`
  * + the training-data-pipeline dedup surface): MinHash LSH and
  * SimHash, both as pure declarative DataFrame pipelines — no UDFs,
  * no spark.ml VectorUDT detour.
  *
  * Why not O(n²): the exact pairwise Jaccard (`LlmQueries
  * .exactJaccardPairs`) is quadratic and exists only as bounded
  * ground truth. At 100 TB the only viable shapes are
  * candidate-generation by hashing (these two) followed by exact
  * verification on the (tiny) candidate set — precision stays 1.0,
  * recall is governed by the LSH parameters.
  *
  * Execution-shape note (hard-won): Spark's higher-order functions
  * (`transform`/`aggregate` lambdas) are NOT whole-stage-codegen'd —
  * a nested per-token × per-seed lambda signature runs interpreted
  * with per-element boxing and was measured 18× slower than the
  * explode form. So signatures are computed RELATIONALLY: explode
  * tokens → hash each token string once (`xxhash64(tok)`, codegen) →
  * one hash-aggregate with k=64 `min(xxhash64(h, seed))` columns
  * (cheap long re-hash per seed, all inside codegen'd partial
  * aggregation). The explode is map-side only: partial agg collapses
  * each doc's tokens before any exchange, so the shuffle carries one
  * 64-long row per doc.
  *
  * MinHash parameters: k = 64 hashes in b = 16 bands × r = 4.
  * Collision probability for Jaccard s is 1-(1-s⁴)¹⁶: 0.9998 at
  * s = 0.8 (the dedup threshold), 0.19 at s = 0.3 — a sharp s-curve,
  * so recall at-threshold is ~1 while candidate volume stays
  * near-linear. Bucket keys are uniform by construction (xxhash64);
  * a pathological bucket (thousands of identical docs) is still
  * quadratic in that bucket — production mitigation is collapsing
  * exact dups (query #31's md5 plane) to one representative + count
  * before LSH.
  */
object DedupOps {

  val K = 64       // minhash signature length
  val Bands = 16   // LSH bands (rows per band r = K/Bands = 4)

  /** Distinct whitespace tokens of `text` (the corpus tokenizer). */
  def tokensCol: Column = array_distinct(split(col("text"), " "))

  /** (doc_id, lang, tok-hash) rows: one explode, one string hash per
    * token — everything downstream re-hashes longs only.
    */
  private def tokenHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))

  /** Per-doc sketch, computed in ONE scan + ONE hash aggregate:
    * minhash signature (k flat columns m0..m{k-1}), the token-hash
    * SET (for exact verification on longs — string arrays never
    * travel through the pair joins), and the set size. Jaccard over
    * token-hash sets equals Jaccard over token sets up to 64-bit
    * hash collisions (~0 in practice; documented trade).
    */
  def docSketches(docs: DataFrame): DataFrame = {
    val aggs = (0 until K).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i")) ++
      Seq(collect_set(col("h")).as("hs"), count(lit(1)).as("n_tok"))
    tokenHashes(docs).groupBy("doc_id", "lang").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band keys: band b's bucket = hash of signature rows
    * [b·r, (b+1)·r). One posexplode of 16 precomputed bucket hashes.
    * Output: (doc_id, lang, band, bucket).
    */
  def lshBandKeys(sketches: DataFrame): DataFrame = {
    val r = K / Bands
    val buckets = (0 until Bands).map { b =>
      xxhash64(lit(b) +: (b * r until (b + 1) * r).map(i => col(s"m$i")): _*)
    }
    sketches
      .select(col("doc_id"), col("lang"),
        posexplode(array(buckets: _*)).as(Seq("band", "bucket")))
  }

  /** Candidate pairs (same lang, same band bucket), deduplicated
    * across bands. Input: [[docSketches]] output.
    */
  def minhashCandidates(sketches: DataFrame): DataFrame = {
    val keys = lshBandKeys(sketches)
    keys.as("l")
      .join(keys.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.lang") === col("r.lang") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.lang").as("lang"),
        col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .distinct()
  }

  /** MinHash LSH near-dup pairs with exact Jaccard verification.
    * Candidates → size-ratio prune (jac <= min/max size, two integer
    * compares — kills undersized pairs before any array work) →
    * long-array intersect on the broadcast-joined hash sets.
    * Precision 1.0 by construction; recall per the band s-curve.
    * Output: (lang, a_id, b_id, jaccard).
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sk = docSketches(docs)
    val cands = minhashCandidates(sk)
    val aSide = sk.select(col("doc_id").as("a_id"), col("hs").as("a_hs"), col("n_tok").as("n_a"))
    val bSide = sk.select(col("doc_id").as("b_id"), col("hs").as("b_hs"), col("n_tok").as("n_b"))
    val inter = size(array_intersect(col("a_hs"), col("b_hs")))
    val jac = inter * lit(1.0) / (col("n_a") + col("n_b") - inter)
    cands.join(aSide, "a_id").join(bSide, "b_id")
      // upper bound: |A∩B| <= min(|A|,|B|) ⇒ jac <= min/max
      .filter(least(col("n_a"), col("n_b")) * lit(1.0) /
        greatest(col("n_a"), col("n_b")) >= threshold)
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select("lang", "a_id", "b_id", "jaccard")
  }

  /** Star-shaped dedup candidates: within each (lang, band, bucket),
    * pair every doc with the bucket's minimum doc_id (the
    * "representative"). A near-dup CLIQUE of m docs yields m-1
    * candidate rows instead of C(m,2) — this is what makes corpus
    * dedup output-linear. (Pair ENUMERATION is inherently quadratic
    * in clique size: this corpus has ~500-doc template cliques, so
    * listing all pairs is 759k rows at sf0.1 where the kill list is
    * <5k. Keep-first-per-bucket + verify is the standard large-corpus
    * MinHash dedup shape.)
    */
  def dedupCandidates(sketches: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "band", "bucket")
    lshBandKeys(sketches)
      .withColumn("rep", min("doc_id").over(w))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("lang"), col("rep").as("a_id"), col("doc_id").as("b_id"))
      .distinct()
  }

  /** Verified (representative, member) near-dup EDGES — the
    * output-linear edge set behind both the kill list and the
    * corpus-scale cluster closure ([[GraphOps]]): star candidates
    * from [[dedupCandidates]], size-ratio pruned, exact-Jaccard
    * verified on the hash sets (precision 1 by construction).
    * A clique of m near-dups contributes O(m) edges, not C(m,2), and
    * the transitive closure recovers the full cluster from the star —
    * the property that keeps CC input linear in corpus size.
    * Output: (lang, a_id = bucket rep, b_id).
    */
  def nearDupRepEdges(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    nearDupRepEdgesFromSketches(docSketches(docs), threshold)

  /** [[nearDupRepEdges]] starting from an ALREADY-SKETCHED frame —
    * the [[SketchStore]] probe path: the corpus-sized explode +
    * 64-min aggregate happened once at ingest, and candidate
    * generation + exact verify start from the persisted doc-grain
    * rows. Null-signature rows (token-less docs, present in the
    * store by contract) collide only among themselves and die at the
    * exact verify, so results are row-identical to the inline build.
    */
  def nearDupRepEdgesFromSketches(sk: DataFrame,
      threshold: Double = 0.8): DataFrame = {
    val cands = dedupCandidates(sk)
    val aSide = sk.select(col("doc_id").as("a_id"), col("hs").as("a_hs"), col("n_tok").as("n_a"))
    val bSide = sk.select(col("doc_id").as("b_id"), col("hs").as("b_hs"), col("n_tok").as("n_b"))
    val inter = size(array_intersect(col("a_hs"), col("b_hs")))
    val jac = inter * lit(1.0) / (col("n_a") + col("n_b") - inter)
    cands.join(aSide, "a_id").join(bSide, "b_id")
      .filter(least(col("n_a"), col("n_b")) * lit(1.0) /
        greatest(col("n_a"), col("n_b")) >= threshold)
      .filter(jac >= threshold)
      .select(col("lang"), col("a_id"), col("b_id"))
  }

  /** Docs that are verified near-duplicates (jaccard >= threshold) of
    * their bucket representative — the dedup "kill list". Output:
    * (lang, doc_id) of docs a dedup pass would drop.
    */
  def nearDupKillList(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    nearDupRepEdges(docs, threshold)
      .select(col("lang"), col("b_id").as("doc_id"))
      .distinct()

  /** [[nearDupKillList]] from persisted [[SketchStore]] rows. */
  def nearDupKillListFromSketches(sk: DataFrame,
      threshold: Double = 0.8): DataFrame =
    nearDupRepEdgesFromSketches(sk, threshold)
      .select(col("lang"), col("b_id").as("doc_id"))
      .distinct()

  /** Declared query `near_dup_minhash` (rows-only check; probabilistic
    * recall is asserted against the exact ground truth in
    * MinhashRecallSpec): per-lang corpus size vs verified near-dup
    * kill-list size over the ENTIRE corpus — the unbounded scale path
    * that #32 cannot do.
    */
  def nearDupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sk = SketchStore.sketches(spark, dir)
    val kills = nearDupKillListFromSketches(sk)
      .groupBy("lang").agg(count(lit(1)).as("n_near_dup_docs"))
    sk.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(kills, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_near_dup_docs"), lit(0L)).as("n_near_dup_docs"))
      .orderBy("lang")
  }

  /** LSH Ensemble (Zhu et al., VLDB'16 — public knowledge) for
    * DIRECTED containment `|A∩B|/|A| ≥ t`: MinHash LSH cannot see
    * containment directly (it concentrates on Jaccard), but within a
    * SIZE STRATUM the two are interconvertible — for |B|/|A| ≤ ρ,
    * C ≥ t implies J = C/(1 + |B|/|A| − C) ≥ t/(1 − t + ρ). So the
    * ensemble strata are exact log2 size buckets
    * (`length(bin(n))−1`, the integer log the repo uses in
    * degree_dist), and the banding tightness ADAPTS to the stratum
    * gap of the candidate pair:
    *
    *  - gap ≤ 1 (ρ ≤ 4): J ≥ t/(1−t+4) ≈ 0.22 at t = 0.9 →
    *    32 bands × 2 rows (s-curve threshold ≈ 0.18);
    *  - gap ≥ 2 (B much larger): J falls toward t/ρ → 64 singleton
    *    bands (per-band collision prob = J; catches J ≳ 0.07, i.e.
    *    ratios to ~64× at t = 0.9 — the documented recall envelope;
    *    beyond that LSH Ensemble grows K per stratum).
    *
    * Both schemes reuse the ONE K=64 signature from [[docSketches]];
    * collisions join on (lang, band, bucket) plus the strata
    * condition, and every candidate is EXACT-verified on the
    * token-hash sets — precision 1.0 by construction, recall pinned
    * against the exact all-pairs ground truth in ContainmentLshSpec.
    * Pairs with |B| < t·|A| cannot reach C ≥ t (|A∩B| ≤ |B|) and are
    * pruned by an integer compare before any array work.
    *
    * Scale: the signature is one hash-agg; band keys are ≤96
    * posexploded rows/doc (output-linear); bucket joins are
    * hash-partitioned on (band, bucket) — no all-pairs anywhere; the
    * exact verify touches only surviving candidates. The stratum
    * keys also SPLIT buckets (singleton-band buckets carry the
    * coarse token distribution, so without the stratum condition a
    * common-vocabulary corpus would pile into few buckets).
    */
  def containmentLshPairs(docs: DataFrame, t: Double = 0.9,
      aMinTok: Int = 20): DataFrame =
    containmentLshPairsFromSketches(docSketches(docs), t, aMinTok)

  /** [[containmentLshPairs]] starting from an already-sketched frame
    * (the [[SketchStore]] probe path — the ensemble reuses the ONE
    * persisted K=64 signature; strata derive from the stored n_tok).
    */
  def containmentLshPairsFromSketches(sketched: DataFrame, t: Double = 0.9,
      aMinTok: Int = 20): DataFrame = {
    import graft.operators.Checkpoints._
    val r = 2
    val bands2 = K / r // 32 bands of 2 rows
    val sk = sketched
      .withColumn("stratum", (length(bin(col("n_tok"))) - 1).cast("int"))
      .cut() // scanned by two key frames + both verify sides
    // A-side eligibility (|A| ≥ aMinTok distinct tokens) and the
    // |A∩B| ≤ |B| ⇒ C ≤ n_b/n_a integer prune are pushed INTO the
    // candidate generator: a pair failing them in BOTH orientations
    // can never verify, so dropping it at the collision probe (a
    // two-int compare) instead of after the distinct shuffle is free
    // recall-wise and removes the dominant shuffle volume — measured
    // 87M → 43M collision rows and 57 s → ~20 s at sf0.1 (the corpus
    // whose shared vocabulary makes every band bucket dense).
    def feasible(nA: Column, nB: Column): Column =
      nB >= lit(t) * nA && nA >= lit(aMinTok)
    val keys2 = sk.select(col("doc_id"), col("lang"), col("stratum"),
      col("n_tok"),
      posexplode(array((0 until bands2).map { b =>
        xxhash64(lit(b) +: (b * r until (b + 1) * r).map(i => col(s"m$i")): _*)
      }: _*)).as(Seq("band", "bucket")))
    // gap ≤ 1 lane: UNDIRECTED discovery — each colliding pair is
    // generated once (doc_id <), deduped across its ≤32 colliding
    // bands, and only then expanded into the orientation(s) that can
    // verify (emitting both orientations before the dedup doubled
    // the distinct shuffle for nothing). A probe-time first-agreeing-
    // band filter (carrying each doc's 32-long band-hash vector and
    // testing `l.band === firstAgree`) was tried and REJECTED: the
    // per-probe array compares fall out of whole-stage codegen's hot
    // path and measured 5× slower than paying the distinct exchange.
    val undirected = keys2.as("l").join(keys2.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.lang") === col("r.lang") &&
          col("l.doc_id") < col("r.doc_id") &&
          abs(col("l.stratum") - col("r.stratum")) <= 1 &&
          (feasible(col("l.n_tok"), col("r.n_tok")) ||
            feasible(col("r.n_tok"), col("l.n_tok"))))
      .select(col("l.lang").as("lang"),
        col("l.doc_id").as("x_id"), col("r.doc_id").as("y_id"),
        col("l.n_tok").as("n_x"), col("r.n_tok").as("n_y"))
      .distinct()
    val near = undirected.filter(feasible(col("n_x"), col("n_y")))
      .select(col("lang"), col("x_id").as("a_id"), col("y_id").as("b_id"))
      .unionAll(undirected.filter(feasible(col("n_y"), col("n_x")))
        .select(col("lang"), col("y_id").as("a_id"), col("x_id").as("b_id")))
    // gap ≥ 2 lane: DIRECTED by construction — the l side is the
    // contained A (so only A-eligible docs key it) and the r side
    // sits ≥2 strata up (n_b ≥ 2^(stratum_a+2) > t·n_a always, so
    // the size prune is implied). Restricting each side's key frame
    // kills the giant single-value buckets a shared vocabulary piles
    // into singleton bands: the old unrestricted self-join probed
    // ~100M in-bucket pairs to keep 178k (56 s at sf0.1); the
    // restricted frames are empty-to-tiny unless the corpus actually
    // HAS cross-stratum size ratios ≥ 4.
    val minAStratum = 31 - Integer.numberOfLeadingZeros(aMinTok)
    def keys1(frame: DataFrame): DataFrame =
      frame.select(col("doc_id"), col("lang"), col("stratum"),
        posexplode(array((0 until K).map(i =>
          xxhash64(lit(1000 + i), col(s"m$i"))): _*))
          .as(Seq("band", "bucket")))
    val far = keys1(sk.filter(col("n_tok") >= aMinTok)).as("l")
      .join(keys1(sk.filter(col("stratum") >= minAStratum + 2)).as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.lang") === col("r.lang") &&
          col("r.stratum") - col("l.stratum") >= 2)
      .select(col("l.lang").as("lang"),
        col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .distinct()
    // the two lanes are stratum-disjoint (|Δ| ≤ 1 vs Δ ≥ 2): union
    // needs no cross-lane dedup
    val cands = near.unionAll(far)
    val aSide = sk.filter(col("n_tok") >= aMinTok).select(col("doc_id").as("a_id"),
      col("hs").as("a_hs"), col("n_tok").as("n_a"))
    val bSide = sk.select(col("doc_id").as("b_id"), col("hs").as("b_hs"),
      col("n_tok").as("n_b"))
    val contCol =
      size(array_intersect(col("a_hs"), col("b_hs"))) * lit(1.0) / col("n_a")
    cands.join(aSide, "a_id").join(bSide, "b_id")
      // |A∩B| <= |B| ⇒ C <= n_b/n_a: integer prune before array work
      .filter(col("n_b") * lit(1.0) >= lit(t) * col("n_a"))
      .withColumn("cont", contCol)
      .filter(col("cont") >= t)
      .select("lang", "a_id", "b_id", "cont")
  }

  /** OUTPUT-LINEAR containment audit (the r8 verdict's #5 reshape of
    * the `containment_lsh` report): instead of ENUMERATING every
    * verified directed-containment pair — Θ(n²) on a template-heavy
    * closed-vocabulary corpus (1.6 M true pairs at sf0.1, and the
    * in-bucket pair join that finds them was 13 of the query's 20 s)
    * — answer the DOC-grain question a curation pipeline actually
    * acts on: *is doc A contained in some other doc, and which one?*
    *
    * The star-candidate trick ([[dedupCandidates]]) adapted to
    * DIRECTED containment: within each (lang, band, bucket, stratum)
    * LSH bucket, only the top-[[ContainmentWitnesses]] docs by
    * (n_tok desc, doc_id) — the docs most able to CONTAIN others —
    * stand as candidate witnesses, and every eligible doc pairs with
    * the witnesses of its own and adjacent strata (near lane) or of
    * strata ≥ 2 above (far lane, singleton bands). Candidate volume
    * is ≤ witnesses × band keys — LINEAR in corpus size; the
    * quadratic in-bucket pair join is gone. Each candidate is still
    * EXACT-verified on the token-hash sets, so a flagged doc is
    * contained with probability 1 (precision 1.0 by construction);
    * a contained doc is flagged when ANY of its ≤ witnesses × bands
    * candidates verifies — ContainmentLshSpec measures that doc-level
    * recall vs the exact all-pairs truth (≥ 0.95 on the fixture)
    * alongside the retained pair-level lane
    * ([[containmentLshPairsFromSketches]], the exact ground-truth
    * path the spec still exercises in full).
    *
    * Output per (lang, a_id): the best witness and its containment.
    */
  def containmentAuditPerDoc(sketched: DataFrame, t: Double = 0.9,
      aMinTok: Int = 20, witnesses: Int = ContainmentWitnesses): DataFrame = {
    import graft.operators.Checkpoints._
    import org.apache.spark.sql.expressions.Window
    val r = 2
    val bands2 = K / r
    val sk = sketched
      .withColumn("stratum", (length(bin(col("n_tok"))) - 1).cast("int"))
      .cut()
    val keys2 = sk.select(col("doc_id"), col("lang"), col("stratum"),
      col("n_tok"),
      posexplode(array((0 until bands2).map { b =>
        xxhash64(lit(b) +: (b * r until (b + 1) * r).map(i => col(s"m$i")): _*)
      }: _*)).as(Seq("band", "bucket")))
    val wByBucket = Window
      .partitionBy("lang", "band", "bucket", "stratum")
      .orderBy(col("n_tok").desc, col("doc_id"))
    def topWitnesses(keys: DataFrame): DataFrame =
      keys.withColumn("rk", row_number().over(wByBucket))
        .filter(col("rk") <= witnesses)
        .select(col("lang"), col("band"), col("bucket"),
          col("doc_id").as("b_id"), col("n_tok").as("n_b_key"),
          col("stratum").as("b_stratum"))
    // near lane: same/adjacent stratum witnesses off the 32x2 bands
    val nearCands = keys2.filter(col("n_tok") >= aMinTok).as("l")
      .join(topWitnesses(keys2).as("r"), Seq("lang", "band", "bucket"))
      .filter(col("l.doc_id") =!= col("b_id") &&
        abs(col("l.stratum") - col("b_stratum")) <= 1 &&
        col("n_b_key") >= lit(t) * col("l.n_tok"))
      .select(col("lang"), col("l.doc_id").as("a_id"), col("b_id"))
    // far lane: singleton bands, witnesses >= 2 strata up (the LSH
    // Ensemble geometry — J falls toward t/rho, so only per-row
    // collisions can catch it)
    val minAStratum = 31 - Integer.numberOfLeadingZeros(aMinTok)
    def keys1(frame: DataFrame): DataFrame =
      frame.select(col("doc_id"), col("lang"), col("stratum"), col("n_tok"),
        posexplode(array((0 until K).map(i =>
          xxhash64(lit(1000 + i), col(s"m$i"))): _*))
          .as(Seq("band", "bucket")))
    val farCands = keys1(sk.filter(col("n_tok") >= aMinTok)).as("l")
      .join(topWitnesses(keys1(sk.filter(col("stratum") >= minAStratum + 2))).as("r"),
        Seq("lang", "band", "bucket"))
      .filter(col("b_stratum") - col("l.stratum") >= 2)
      .select(col("lang"), col("l.doc_id").as("a_id"), col("b_id"))
    val cands = nearCands.unionAll(farCands).distinct()
    val aSide = sk.filter(col("n_tok") >= aMinTok)
      .select(col("doc_id").as("a_id"), col("hs").as("a_hs"),
        col("n_tok").as("n_a"))
    val bSide = sk.select(col("doc_id").as("b_id"), col("hs").as("b_hs"),
      col("n_tok").as("n_b"))
    cands.join(aSide, "a_id").join(bSide, "b_id")
      .filter(col("n_b") * lit(1.0) >= lit(t) * col("n_a"))
      .withColumn("cont",
        size(array_intersect(col("a_hs"), col("b_hs"))) * lit(1.0) / col("n_a"))
      .filter(col("cont") >= t)
      .groupBy("lang", "a_id")
      .agg(max_by(col("b_id"), struct(col("cont"), -col("b_id"))).as("witness_id"),
        max("cont").as("max_cont"),
        count(lit(1)).as("n_witnesses"))
  }

  /** Default witness fan-out per LSH bucket stratum — 8 gives
    * doc-level recall ≥ 0.95 on the fixture (ContainmentLshSpec)
    * while keeping candidates ≤ 8 × band keys.
    */
  val ContainmentWitnesses = 8

  /** Declared query `containment_lsh` (rows-only; ContainmentLshSpec
    * pins doc-level recall and precision 1.0 vs the exact all-pairs
    * ground truth, and pair-level recall ≥ 0.85 on the retained
    * enumeration lane): the per-lang CONTAINMENT AUDIT — of the docs
    * with ≥ 20 distinct tokens, how many are contained (C ≥ 0.9) in
    * some other same-lang doc, with the average best-witness
    * containment. The output-linear reshape of the old Θ(n²) pair
    * enumeration (see [[containmentAuditPerDoc]]); the doc-grain
    * numbers are what a dedup/decontamination pass acts on.
    */
  def containmentLsh(spark: SparkSession, dir: String): DataFrame = {
    val sk = SketchStore.sketches(spark, dir)
    val audit = containmentAuditPerDoc(sk)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_contained_docs"),
        graft.functions.Det.r4(avg(col("max_cont"))).as("avg_best_containment"))
    sk.filter(col("n_tok") >= 20)
      .groupBy("lang").agg(count(lit(1)).as("n_eligible_docs"))
      .join(audit, Seq("lang"), "left")
      .select(col("lang"), col("n_eligible_docs"),
        coalesce(col("n_contained_docs"), lit(0L)).as("n_contained_docs"),
        graft.functions.Det.r4(coalesce(col("n_contained_docs"), lit(0L)) *
          lit(100.0) / col("n_eligible_docs")).as("pct_contained"),
        coalesce(col("avg_best_containment"), lit(0.0))
          .as("avg_best_containment"))
      .orderBy("lang")
  }

  /** 64-bit SimHash signatures via [[graft.functions.SimHashAgg]]
    * (one tight bit-count loop per token in an ObjectHashAggregate
    * buffer). Output: (doc_id, lang, sim).
    *
    * The relational lane-packed formulation is kept below as
    * [[simhashSignaturesRelational]]: SketchAggSpec asserts the two
    * are bit-identical, and the typed agg was measured ~8× cheaper
    * per row at sf0.1 (22 lane-packed sum columns unroll 64
    * shift/mask terms in the generated update — the same
    * wide-agg-buffer wall the MinHash sketch hits).
    */
  def simhashSignatures(docs: DataFrame): DataFrame =
    tokenHashes(docs).groupBy("doc_id", "lang")
      .agg(graft.functions.SketchFunctions.simhashAgg(col("h")).as("sim"))

  /** Lane-packed relational SimHash (the no-custom-code formulation):
    * per token-hash row the 64 per-bit ONES counts are packed 3 per
    * long (21-bit lanes — ones counts are non-negative, so lanes
    * never borrow; safe to 2^21 ≈ 2M distinct tokens per doc) giving
    * 22 `sum` columns; bit j of the signature is then
    * sign(2·ones_j − n_tok) > 0 (ties → 0). Kept as the portable
    * cross-check for the typed aggregate.
    */
  def simhashSignaturesRelational(docs: DataFrame): DataFrame = {
    val laneBits = 21
    val lanes = 3
    val nCols = (64 + lanes - 1) / lanes // 22
    val packed = (0 until nCols).map { k =>
      val terms = (0 until lanes).flatMap { l =>
        val j = k * lanes + l
        if (j >= 64) None
        else Some(shiftleft(shiftright(col("h"), j).bitwiseAND(lit(1L)), l * laneBits))
      }
      sum(terms.reduce(_ + _)).as(s"p$k")
    }
    val aggs = packed :+ count(lit(1)).as("n_tok")
    val sig = (0 until 64).map { j =>
      val ones = shiftright(col(s"p${j / lanes}"), (j % lanes) * laneBits)
        .bitwiseAND(lit((1L << laneBits) - 1))
      when(ones * 2 > col("n_tok"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    tokenHashes(docs).groupBy("doc_id", "lang")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), col("lang"), sig.as("sim"))
  }

  /** SimHash near-dup pairs: 4 × 16-bit chunk banding (pigeonhole:
    * hamming <= 3 ⇒ at least one of 4 chunks identical), candidates
    * verified with bit_count(a XOR b) <= maxHamming.
    * Output: (lang, a_id, b_id, hamming).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val signed = simhashSignatures(docs)
    val chunkKeys = (0 until 4).map(c =>
      shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL)))
    val chunked = signed
      .select(col("doc_id"), col("lang"), col("sim"),
        posexplode(array(chunkKeys: _*)).as(Seq("chunk", "ckey")))
    val cands = chunked.as("l")
      .join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") &&
          col("l.ckey") === col("r.ckey") &&
          col("l.lang") === col("r.lang") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.lang").as("lang"),
        col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        col("l.sim").as("a_sim"), col("r.sim").as("b_sim"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("lang", "a_id", "b_id", "hamming")
  }

  /** Distinct SimHash signature groups: one row per (lang, signature)
    * with doc multiplicity `m` and a min-doc_id representative.
    * Exact-dup docs AND template variants sharing a token SET
    * (different bytes, same distinct tokens ⇒ same signature) all
    * collapse to one group, so downstream banding is over genuinely
    * distinct signatures — an m-doc clique costs 1 band row instead
    * of m, and its C(m,2) internal pairs are reconstructed
    * analytically (this corpus: 5000 docs → 4244 groups at sf0.1,
    * with 94-doc cliques). Output: (doc_id, lang, m, sim).
    */
  def simhashSigGroups(docs: DataFrame): DataFrame =
    simhashSignatures(docs)
      .groupBy("lang", "sim")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("m"))
      .select(col("doc_id"), col("lang"), col("m"), col("sim"))

  /** Verified SimHash pairs via 4 × 16-bit chunk banding over DISTINCT
    * signatures (input: [[simhashSigGroups]] output). Self-pairs
    * (a_id == b_id, hamming 0) stand for the C(m,2) doc pairs inside
    * one signature group, so the whole computation is a single
    * self-join lineage (the sig-group exchange is planned once and
    * reused on both sides). Two structural guarantees keep it
    * output-linear: (1) no exact-dup or same-token-set clique ever
    * meets itself across rows — such docs share one signature group;
    * (2) the hamming verify (`bit_count(xor)`) runs INSIDE the join
    * condition, so over-generated bucket pairs (near-dups sharing a
    * chunk at hamming > max — 144k of 148k bucket pairs at sf0.1) are
    * dropped during the streamed join and never materialize into the
    * `distinct()` exchange. Materialized rows = true pairs only
    * (SimhashSpec bounds them at O(docs)). Output:
    * (lang, a_id, b_id, hamming, m_a, m_b), one row per verified
    * signature pair incl. the self row of every group.
    */
  def simhashGroupPairs(sigGroups: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunkKeys = (0 until 4).map(c =>
      shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL)))
    val chunked = sigGroups
      .select(col("doc_id"), col("lang"), col("m"), col("sim"),
        posexplode(array(chunkKeys: _*)).as(Seq("chunk", "ckey")))
    val hamming = bit_count(col("l.sim").bitwiseXOR(col("r.sim")))
    chunked.as("l")
      .join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") &&
          col("l.ckey") === col("r.ckey") &&
          col("l.lang") === col("r.lang") &&
          col("l.doc_id") <= col("r.doc_id") &&
          hamming <= maxHamming)
      .select(col("l.lang").as("lang"),
        col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        hamming.cast("long").as("hamming"),
        col("l.m").as("m_a"), col("r.m").as("m_b"))
      .distinct()
  }

  /** Declared query `simhash_dups` (rows-only; Spark's xxhash64 has no
    * DuckDB counterpart so no SQL oracle — invariants are tested in
    * SimhashSpec): per-lang count of pairs at hamming <= 3 over the
    * whole corpus, plus the mean hamming of those pairs.
    *
    * Output-linear shape: docs with identical signatures collapse into
    * signature groups ([[simhashSigGroups]]), so banding never
    * enumerates within-clique pairs. The pair COUNT semantics are
    * unchanged from naive enumeration ([[simhashPairs]], kept as
    * ground truth): a group of m same-signature docs contributes
    * C(m,2) pairs at hamming 0 (its self row in the banding join), and
    * a signature pair at hamming h contributes m_a·m_b pairs at h
    * (SimhashSpec asserts exact equality of both aggregates at
    * sf0.001).
    */
  def simhashDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), tokensCol.as("toks"))
    simhashGroupPairs(simhashSigGroups(docs), maxHamming = 3)
      .select(col("lang"), col("hamming"),
        when(col("a_id") === col("b_id"), (col("m_a") * (col("m_a") - 1)) / 2)
          .otherwise(col("m_a") * col("m_b")).cast("long").as("n_pairs"))
      .filter(col("n_pairs") > 0) // drop m=1 self rows: langs with no pairs emit no row
      .groupBy("lang")
      .agg(sum("n_pairs").as("n_pairs_hamming_le_3"),
        round(sum(col("hamming") * col("n_pairs")) / sum(col("n_pairs")) + lit(1e-7), 4)
          .as("avg_hamming"))
      .orderBy("lang")
  }

  /** Group-level MinHash signatures — the MERGEABILITY of MinHash as
    * a sketch: min is associative/commutative, so the element-wise min
    * of member signatures IS the signature of the union of their token
    * sets. Grouping directly by (lang, source) computes each source's
    * token-universe signature in one partial-aggregated pass; the same
    * shape re-aggregates day→month→all at 100 TB without revisiting
    * raw text (SURVEY §7.5a's "pre-aggregated sketch columns").
    */
  def sourceSignatures(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("lang"), col("source"), explode(tokensCol).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val aggs = (0 until K).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    tok.groupBy("lang", "source").agg(aggs.head, aggs.tail: _*)
  }

  /** Estimated Jaccard between two signatures = fraction of equal
    * components (the unbiased MinHash estimator, sd ≈ √(j(1−j)/k)).
    */
  private def estJaccard(k: Int): Column =
    (0 until k).map(i =>
      when(col(s"l.m$i") === col(s"r.m$i"), 1).otherwise(0))
      .reduce(_ + _) / lit(k.toDouble)

  /** Declared query `source_overlap` (rows-only; xxhash-based):
    * estimated token-universe Jaccard between every source pair
    * within a lang, summarized per lang. SourceOverlapSpec bounds the
    * estimator against exact union Jaccard.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sig = sourceSignatures(spark, dir)
    sig.as("l")
      .join(sig.as("r"),
        col("l.lang") === col("r.lang") && col("l.source") < col("r.source"))
      .select(col("l.lang").as("lang"), estJaccard(K).as("overlap"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_source_pairs"),
        round(avg("overlap") + lit(1e-7), 4).as("avg_overlap"),
        round(max("overlap") + lit(1e-7), 4).as("max_overlap"))
      .orderBy("lang")
  }

  /** Declared query `distinct_hll` (rows-only; HLL internals differ
    * across engines — the |exact-approx|/exact < 5% bound is asserted
    * in HllSpec): approximate user cardinality per event type at 2%
    * target error. At 100 TB this replaces #21's exact distinct
    * (Expand + full shuffle of user ids) with a constant-size
    * mergeable sketch per group.
    */
  def distinctHll(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Tokens-per-segment for [[segmentDedup]]: 8 is the paragraph
    * granularity this corpus supports (no newlines — docs are one
    * whitespace-token stream, SURVEY §1.2).
    */
  val SegLen = 8

  /** Per-doc segmentation for [[segmentDedup]]: consecutive
    * [[SegLen]]-token windows (1-based, last one ragged) as a `segs`
    * array column plus the `nseg` count. The `when` guards Spark's
    * `sequence(1, 0)` DESCENDING surprise on token-less docs (same
    * guard class as doc_fingerprint's).
    */
  def segmentedDocs(docs: DataFrame, keep: Seq[String] = Seq("source")): DataFrame = {
    val t = filter(split(col("text"), " "), x => x =!= "")
    docs
      .select(col("doc_id") +: keep.map(col) :+ t.as("t"): _*)
      .withColumn("nseg",
        ceil(size(col("t")) / lit(SegLen.toDouble)).cast("long"))
      .withColumn("segs",
        when(col("nseg") > 0, transform(
          sequence(lit(1L), col("nseg")),
          i => array_join(
            slice(col("t"), ((i - 1) * SegLen + 1).cast("int"), lit(SegLen)),
            " ")))
          .otherwise(array().cast("array<string>")))
      .drop("t")
  }

  /** Declared query `segment_dedup` (full oracle) — duplicate-segment
    * removal, the paragraph/line-level dedup pass (CCNet/Dolma style)
    * that sits between exact-doc dedup and near-dup LSH in a training
    * pipeline: boilerplate repeated ACROSS documents (headers,
    * navigation, license blocks) is removed per-instance while the
    * host documents survive. A segment instance is removed when its
    * text occurs more than once corpus-wide (both instances go — the
    * boilerplate itself carries no training signal). Output per
    * source: docs, segment mass, instances removed, docs touched,
    * and the mean removed fraction.
    *
    * Scale shape: the classic two-exchange paragraph-dedup plan.
    * (1) segment instances → partial-agg'd `groupBy(seg).count` —
    * map-side combine collapses hot boilerplate before the exchange,
    * so the seg-keyed shuffle is distinct-segments-sized, never
    * instance-sized (the skew lesson from tfidf applied from the
    * start). (2) instances join the `count > 1` slice (shuffle join
    * on seg — the dup set is corpus-sized at 100 TB, NOT assumed
    * broadcastable) → per-doc removed counts, which re-join the
    * per-doc frame on doc_id. Per-doc totals (`nseg`) come straight
    * from the scan-side arithmetic — no second pass over instances.
    * Nothing here is quadratic; every stage is output- or
    * distinct-bounded.
    */
  def segmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = segmentedDocs(Tables.documents(spark, dir))
    val inst = perDoc.select(col("doc_id"), explode(col("segs")).as("seg"))
    val dupSegs = inst
      .groupBy("seg").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
    val removedPerDoc = inst.join(dupSegs, Seq("seg"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_rem"))
    perDoc.select("doc_id", "source", "nseg")
      .join(removedPerDoc, Seq("doc_id"), "left")
      .withColumn("n_rem", coalesce(col("n_rem"), lit(0L)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nseg").as("n_segs"),
        sum("n_rem").as("n_removed"),
        sum(when(col("n_rem") > 0, 1L).otherwise(0L)).as("n_docs_touched"),
        graft.functions.Det.r4(
          avg(coalesce(col("n_rem") / nullif(col("nseg"), lit(0L)), lit(0.0))))
          .as("avg_frac_removed"))
      .orderBy("source")
  }
}
