package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalable near-duplicate detection (SURVEY §2.5 `near_dup_minhash`
  * + the training-data-pipeline dedup surface): MinHash LSH and
  * SimHash, both as pure declarative DataFrame pipelines — no UDFs,
  * no spark.ml VectorUDT detour, everything codegen-able and
  * shuffle-bounded.
  *
  * Why not O(n²): the exact pairwise Jaccard (`LlmQueries
  * .nearDupPairsExact`) is quadratic and exists only as bounded
  * ground truth. At 100 TB the only viable shapes are
  * candidate-generation by hashing (these two) followed by exact
  * verification on the (tiny) candidate set — precision stays 1.0,
  * recall is governed by the LSH parameters.
  *
  * MinHash parameters: k = 64 hash functions in b = 16 bands × r = 4
  * rows. Collision probability for Jaccard s is 1-(1-s^4)^16: 0.9998
  * at s = 0.8 (the dedup threshold), 0.19 at s = 0.3 — a sharp
  * s-curve around the threshold, so recall at-or-above threshold is
  * ~1 while the candidate volume stays near-linear.
  *
  * Scale notes: the per-doc signature is one narrow array<long>(64);
  * band explosion multiplies rows ×16 but each row is (id, band,
  * bucket) — bytes, not documents. The bucket join shuffles on
  * (band, bucket, lang), which is uniformly distributed by
  * construction (xxhash64); token arrays are re-joined only for the
  * candidate pairs. A pathological bucket (all-identical docs) is
  * still quadratic in that bucket's size — the standard mitigation
  * (cap bucket size, or pre-collapse exact dups by md5 first) is
  * applied here by exact-dedup collapsing being query #31's job.
  */
object DedupOps {

  /** Distinct whitespace tokens of `text` (the corpus tokenizer). */
  def tokensCol: Column = array_distinct(split(col("text"), " "))

  /** MinHash signature: for seeds 0..k-1, min over tokens of
    * xxhash64(token, seed). One array<long>(k) per row, computed in a
    * single codegen'd higher-order expression.
    */
  def minhashSignature(tokens: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(tokens, t => xxhash64(t, i))))

  /** Explode a signed doc into its LSH band keys: band i's bucket is
    * the hash of signature rows [i*r, (i+1)*r). Output columns:
    * doc_id, lang, band, bucket.
    */
  def lshBandKeys(docs: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands ($bands) must divide k ($k)")
    docs
      .withColumn("sig", minhashSignature(col("toks"), k))
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"),
        col("sig"))
      .withColumn("bucket",
        xxhash64(col("band"), slice(col("sig"), col("band") * lit(r) + lit(1), lit(r))))
      .select("doc_id", "lang", "band", "bucket")
  }

  /** Candidate pairs (same lang, same band bucket), deduplicated
    * across bands. Input `docs` needs (doc_id, lang, toks).
    */
  def minhashCandidates(docs: DataFrame, k: Int = 64, bands: Int = 16): DataFrame = {
    val keys = lshBandKeys(docs, k, bands)
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

  /** MinHash LSH near-dup pairs with exact Jaccard verification:
    * LSH candidates → re-join token sets → keep jaccard >= threshold.
    * Precision 1.0 by construction; recall per the band s-curve.
    * Output: (lang, a_id, b_id, jaccard).
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val cands = minhashCandidates(docs)
    val aToks = docs.select(col("doc_id").as("a_id"), col("toks").as("a_ws"))
    val bToks = docs.select(col("doc_id").as("b_id"), col("toks").as("b_ws"))
    val inter = size(array_intersect(col("a_ws"), col("b_ws")))
    val jac = inter * lit(1.0) /
      (size(col("a_ws")) + size(col("b_ws")) - inter)
    cands.join(aToks, "a_id").join(bToks, "b_id")
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select("lang", "a_id", "b_id", "jaccard")
  }

  /** Declared query `near_dup_minhash` (rows-only check; probabilistic
    * recall is asserted against the exact ground truth in
    * MinhashRecallSpec): per-lang verified near-dup pair counts over
    * the ENTIRE corpus — the unbounded scale path that #32 cannot do.
    */
  def nearDupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), tokensCol.as("toks"))
    minhashPairs(docs)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pairs_minhash_ge_08"))
      .orderBy("lang")
  }

  /** 64-bit SimHash over token hashes: bit j of the signature is set
    * iff Σ_tokens (±1 per token's j-th hash bit) > 0. Single nested
    * higher-order expression — evaluated per row inside codegen.
    */
  def simhashCol(tokens: Column): Column = {
    val th = transform(tokens, t => xxhash64(t))
    // Outer aggregate walks bit positions, inner walks token hashes.
    // shiftright/shiftleft go through call_function because the Scala
    // helpers only accept literal Int shift amounts, and here the
    // shift is the lambda variable.
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, j) => acc.bitwiseOR(
        when(
          aggregate(th, lit(0L),
            (a, h) => a + when(
              call_function("shiftright", h, j).bitwiseAND(lit(1L)) === lit(1L), 1L)
              .otherwise(-1L)) > 0,
          call_function("shiftleft", lit(1L), j)
        ).otherwise(lit(0L)).cast("long")
      )
    )
  }

  /** SimHash near-dup pairs: 4 × 16-bit chunk banding (pigeonhole:
    * hamming <= 3 ⇒ at least one of 4 chunks identical), candidates
    * verified with bit_count(a XOR b) <= maxHamming.
    * Output: (lang, a_id, b_id, hamming).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val signed = docs.select(col("doc_id"), col("lang"),
      simhashCol(col("toks")).as("sim"))
    val chunked = signed
      .select(col("doc_id"), col("lang"), col("sim"),
        explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("ckey",
        call_function("shiftright", col("sim"), col("chunk") * lit(16))
          .bitwiseAND(lit(0xFFFFL)))
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

  /** Declared query `simhash_dups` (rows-only; Spark's xxhash64 has no
    * DuckDB counterpart so no SQL oracle — invariants are tested in
    * SimhashSpec): per-lang count of pairs at hamming <= 3 over the
    * whole corpus, plus the mean hamming of those pairs.
    */
  def simhashDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), tokensCol.as("toks"))
    simhashPairs(docs)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pairs_hamming_le_3"),
        round(avg("hamming") + lit(1e-7), 4).as("avg_hamming"))
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
}
