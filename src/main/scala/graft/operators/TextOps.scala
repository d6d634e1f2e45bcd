package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints._

import graft.functions.Det.r4
import graft.sources.Tables

/** Text-analysis surface for the training-data pipeline: language
  * identification, quality scoring, token counting, document
  * fingerprinting. Everything is deterministic arithmetic over
  * built-in string/array/higher-order expressions (zero UDFs), so
  * each query carries a DuckDB oracle that mirrors the formula
  * exactly — these are graded as formula-parity ops, not statistical
  * classifiers (the corpus text is synthetic and language-neutral,
  * SURVEY §1.2).
  *
  * Scale notes: all four are single-scan → per-row expression →
  * hash-agg pipelines; no joins, no windows, no shuffle beyond the
  * final (tiny) per-lang aggregation. At 100 TB they are
  * embarrassingly parallel and bounded by parquet scan throughput.
  */
object TextOps {

  /** Languages in tie-break order (evaluated first = wins ties):
    * descending name, mirroring the oracle's CASE chain.
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "zh" -> Seq("zhong", "wen", "hua"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "de", "y", "que"),
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
  )

  private def toks: Column = split(col("text"), " ")

  private def stopCount(words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** `lang_id` — n-gram/stopword-profile language ID: score each
    * language by its stopword hits in the token stream, predict the
    * argmax (ties → first in descending-name order, matching the
    * oracle CASE chain). Output: confusion counts (lang, predicted,
    * n_docs).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = profiles.foldLeft(Tables.documents(spark, dir)) {
      case (df, (l, words)) => df.withColumn(s"s_$l", stopCount(words))
    }
    val predicted = profiles.map(_._1).foldRight(lit("??")) {
      case (l, elseCol) =>
        val isMax = profiles.map(_._1).filter(_ != l)
          .map(m => col(s"s_$l") >= col(s"s_$m"))
          .reduce(_ && _)
        when(isMax, lit(l)).otherwise(elseCol)
    }
    scored
      .withColumn("predicted", predicted)
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** `quality_score` — per-doc quality in [0, 1]:
    * 0.5·min(n_chars,400)/400 (length credit, saturating) +
    * 0.5·stopword_ratio (en-profile hits / token count).
    * Output per lang: avg/min/max quality.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(toks)
    val q = lit(0.5) * least(col("n_chars"), lit(400)) / lit(400.0) +
      lit(0.5) * stopCount(Seq("the", "a", "and", "of", "to")) / nTok
    Tables.documents(spark, dir)
      .withColumn("q", q)
      .groupBy("lang")
      .agg(
        r4(avg("q")).as("avg_quality"),
        r4(min("q")).as("min_quality"),
        r4(max("q")).as("max_quality"))
      .orderBy("lang")
  }

  /** `token_count` — whitespace tokens plus a BPE-ish subword
    * estimate (ceil(len/4) pieces per token — the ~4-chars-per-token
    * heuristic used for LLM budget estimation). Output per lang.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val words = filter(toks, t => t =!= "")
    val bpe = aggregate(words, lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
    Tables.documents(spark, dir)
      .select(col("lang"), size(words).cast("long").as("n_ws"), bpe.as("n_bpe"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_ws").as("sum_ws_tokens"),
        sum("n_bpe").as("sum_bpe_tokens"),
        r4(avg("n_ws")).as("avg_ws_tokens"))
      .orderBy("lang")
  }

  /** `seq_pack_buckets` (#87, full oracle) — sequence-length
    * bucketing for training-batch packing: the pre-tokenization pass
    * every LLM data pipeline runs to size batches. Docs bucket by
    * whitespace-token count into 32-token-granular caps (clamped at
    * 512 — longer docs truncate); per bucket the report carries doc
    * count, true token mass, padding waste (cap − kept tokens: the
    * compute a naive pad-to-cap batch would burn) and truncated
    * tokens, plus the bucket's packing efficiency kept/(kept+waste).
    *
    * Scale shape: one scan, one narrow projection (size of split —
    * no explode, the token ARRAY never materializes into rows), one
    * partial-agg'd groupBy on ≤ 17 bucket keys, ordered output.
    * All-integer arithmetic end to end, so the oracle hash is exact
    * (no float rounding discipline needed). The nullif guards the
    * all-empty-docs corpus under ANSI (DirtyInputSpec class).
    */
  def seqPackBuckets(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(filter(split(col("text"), " "), t => t =!= "")).cast("long")
    Tables.documents(spark, dir)
      .select(least(lit(512L), ceil(nTok / lit(32.0)).cast("long") * 32L).as("bucket_cap"),
        nTok.as("n_tok"))
      .groupBy("bucket_cap")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tokens"),
        sum(col("bucket_cap") - least(col("n_tok"), col("bucket_cap"))).as("padding_waste"),
        sum(greatest(col("n_tok") - lit(512L), lit(0L))).as("truncated_tokens"),
        r4(sum(least(col("n_tok"), col("bucket_cap"))).cast("double")
          / nullif(sum(col("bucket_cap")), lit(0L)).cast("double")).as("pack_efficiency"))
      .orderBy("bucket_cap")
  }

  /** `repetition_stats` (#88, full oracle) — repetition-based quality
    * filtering, the Gopher/RefinedWeb-class rule every LLM curation
    * pipeline applies: a document dominated by one token (top-word
    * share) or with a collapsed vocabulary (distinct-token ratio) is
    * boilerplate/spam and exits the corpus. Per lang: docs, flagged
    * docs (top share > 0.2 OR distinct ratio < 0.4), and the average
    * of both signals.
    *
    * Scale shape: explode → (doc, word) tf agg (the same partial-agg
    * first stage as tfidf) → per-doc reduction → per-lang rollup; no
    * window, no join, no all-pairs anywhere. The per-doc shares are
    * exact IEEE divisions of two counts, so the flag threshold can
    * never be decided differently by the two engines (no epsilon
    * discipline needed on the comparison; the averaged outputs carry
    * the usual r4 nudge).
    */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("w"))
      .groupBy("doc_id", "lang", "w")
      .agg(count(lit(1)).as("c"))
    val perDoc = tf.groupBy("doc_id", "lang")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("n_uniq"), max("c").as("top_c"))
      .select(col("lang"),
        (col("top_c").cast("double") / col("n_tok")).as("top_share"),
        (col("n_uniq").cast("double") / col("n_tok")).as("distinct_ratio"))
    perDoc.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("top_share") > 0.2 || col("distinct_ratio") < 0.4, 1L)
          .otherwise(0L)).as("n_flagged"),
        r4(avg("top_share")).as("avg_top_share"),
        r4(avg("distinct_ratio")).as("avg_distinct_ratio"))
      .orderBy("lang")
  }

  /** `contamination_check` (#89, full oracle) — benchmark
    * contamination via EXACT 8-token shingle overlap: the standard
    * train/test decontamination pass (a training doc sharing any
    * 8-gram with the benchmark set is contaminated), distinct from
    * similarity near-dup — an embedded verbatim quote flags here even
    * when the whole document is not a near-duplicate of anything.
    * The benchmark here is the reserved doc_id < 50 slice; per lang:
    * candidate docs, contaminated docs, contamination rate.
    *
    * Scale shape: the benchmark side (a test suite) is BOUNDED at any
    * corpus size, so its distinct shingle set broadcasts and the
    * check is one broadcast left-semi join over the corpus's exploded
    * shingles — the corpus shuffles only its distinct contaminated
    * (doc, lang) pairs. No all-pairs anywhere; shingles never leave
    * their scan partition un-joined.
    */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = docs
      .select(col("doc_id"), col("lang"),
        filter(split(col("text"), " "), t => t =!= "").as("ws"))
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(1), size(col("ws")) - 7),
          i => concat_ws(" ", slice(col("ws"), i, lit(8))))).as("sh"))
    val bench = sh.filter(col("doc_id") < 50).select("sh").distinct()
    val contaminated = sh.filter(col("doc_id") >= 50)
      .join(broadcast(bench), Seq("sh"), "left_semi")
      .select("doc_id", "lang").distinct()
      .groupBy("lang").agg(count(lit(1)).as("n_contaminated"))
    docs.filter(col("doc_id") >= 50)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(contaminated, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        r4(coalesce(col("n_contaminated"), lit(0L)) * lit(100.0) / col("n_docs"))
          .as("pct_contaminated"))
      .orderBy("lang")
  }

  /** PII patterns for [[piiScrub]] — deliberately simple, anchored
    * regexes valid in BOTH Java regex (Spark) and RE2 (DuckDB): no
    * lookarounds, no backrefs. Email, IPv4, long digit runs (ids /
    * phone numbers; an IPv4 octet can't reach 6 digits so the
    * classes are disjoint and replacement order is email → ip → num).
    */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIp = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiLongNum = "\\d{6,}"

  /** Row-level PII scrub over any docs-shaped frame (doc_id, text,
    * lang): per-doc match counts per class + the redacted text
    * (emails → [EMAIL], IPv4 → [IP], 6+-digit runs → [NUM]). A pure
    * codegen'd projection — no shuffle, no UDF — so it rides the
    * ingest scan for free at any corpus size.
    */
  def piiScrubRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      regexp_count(col("text"), lit(PiiEmail)).as("n_email"),
      regexp_count(col("text"), lit(PiiIp)).as("n_ip"),
      regexp_count(col("text"), lit(PiiLongNum)).as("n_num"),
      length(col("text")).as("n_chars"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), PiiEmail, "[EMAIL]"),
          PiiIp, "[IP]"),
        PiiLongNum, "[NUM]").as("scrubbed"))

  /** `pii_scrub` (#90, full oracle) — the compliance-scrubbing stage
    * of a curation pipeline: per lang, docs containing each PII class
    * (email / IPv4 / long digit run), total matches, and the net
    * character delta of redaction. The synthetic fixture is PII-free
    * — the oracle pins the all-zero report (counting nothing is also
    * a contract) — while PiiSpec drives a constructed dirty fixture
    * through the SAME [[piiScrubRows]] expressions and pins exact
    * detection counts and redacted output.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrubRows(Tables.documents(spark, dir))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_email") > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(when(col("n_ip") > 0, 1L).otherwise(0L)).as("docs_with_ip"),
        sum(when(col("n_num") > 0, 1L).otherwise(0L)).as("docs_with_num"),
        sum(col("n_email") + col("n_ip") + col("n_num")).as("total_matches"),
        sum(col("n_chars") - length(col("scrubbed"))).as("redacted_char_delta"))
      .orderBy("lang")

  /** `doc_fingerprint` — rolling-hash document fingerprint: the
    * 8-char shingle at position i hashes via Horner's rule
    * (acc·31 + ord(char)) mod 1e9+7; the doc fingerprint is the min
    * shingle hash (the MinHash-of-shingles fingerprint used for
    * near-dup clustering at corpus scale). Output per lang: distinct
    * fingerprints vs docs (collisions ⇒ near-dup clusters).
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    // length guard: Spark's sequence(1, end) DESCENDS when end < 1
    // (docs shorter than one shingle would hash garbage positions);
    // NULL here matches the oracle, whose range() is empty for them
    val fp = when(length(col("text")) >= 8, expr(
      """array_min(transform(sequence(1, length(text) - 7),
        |  i -> aggregate(sequence(0, 7), 0L,
        |         (acc, j) -> (acc * 31 + ascii(substring(text, i + j, 1))) % 1000000007)))""".stripMargin))
    Tables.documents(spark, dir)
      .select(col("lang"), fp.as("fp"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("fp").as("n_fingerprints"))
      .orderBy("lang")
  }

  /** `hash_split` — deterministic content-hash train/val/test split
    * (10/3/3 of 16 md5 buckets). THE scale-safe sampler: no RNG, no
    * reservoir state, no shuffle — every executor assigns the same
    * doc to the same split on any cluster size or re-run, and the
    * split survives re-partitioning, retries, and incremental
    * appends (a new doc's split is a pure function of its content).
    * Bucket = value of the first md5 hex digit (both engines emit
    * lowercase hex, verified App. B-adjacent in HashSplitSpec).
    * Output: per (split, lang) counts + avg chars.
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (instr(lit("0123456789abcdef"),
      substring(md5(col("text")), 1, 1)) - 1).cast("int")
    Tables.documents(spark, dir)
      .withColumn("split",
        when(bucket < 10, lit("train"))
          .when(bucket < 13, lit("val"))
          .otherwise(lit("test")))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), r4(avg("n_chars")).as("avg_chars"))
      .orderBy("split", "lang")
  }

  /** Declared query `corpus_mix_sample` (full oracle) — deterministic
    * corpus-mix subsampling, the "data mixing" step of a training
    * pipeline: each source gets a target inclusion rate (here a
    * quality-tiered policy over the source index: 1 / 0.5 / 0.25 /
    * 0.125) and a doc is included iff its content-hash uniform falls
    * under the rate. The uniform is the first 16 bits of md5 compared
    * against an EXACT integer threshold (rate × 65536 is a whole
    * number for all four tiers), so inclusion is a pure function of
    * content — identical across engines, cluster sizes, re-runs, and
    * appends, same discipline as [[hashSplit]] but rate-valued per
    * source instead of fixed global quotas.
    *
    * Scale: pure codegen'd projection riding the scan + one rollup
    * exchange; no RNG, no reservoir state, no per-group windows.
    * Output per source: docs, sampled docs, realized rate, sampled
    * char mass.
    */
  def corpusMixSample(spark: SparkSession, dir: String): DataFrame = {
    // try_cast, not cast: a source name outside the srcN scheme must
    // fall to the conservative tier (null idx -> otherwise), not crash
    // the batch under ANSI (DirtyInputSpec policy)
    val idx = expr("try_cast(substring(source, 4, 10) AS INT)")
    val thr = when(idx < 5, 65536L).when(idx < 10, 32768L)
      .when(idx < 15, 16384L).otherwise(8192L)
    val u16 = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long")
    Tables.documents(spark, dir)
      .withColumn("in_mix", u16 < thr)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("in_mix"), 1L).otherwise(0L)).as("n_sampled"),
        r4(sum(when(col("in_mix"), 1L).otherwise(0L))
          / count(lit(1)).cast("double")).as("realized_rate"),
        sum(when(col("in_mix"), col("n_chars")).otherwise(0L)).as("sampled_chars"))
      .orderBy("source")
  }

  /** #67 `stratified_sample` — deterministic fixed-size per-stratum
    * sampling: the first 10 docs per language in content-hash order
    * (md5, tie-break doc_id). Hash-ordering makes the sample a pure
    * function of content — reproducible across cluster sizes, re-runs,
    * and engines (the DuckDB oracle draws the identical sample), and
    * stable under appends unless new content actually displaces a
    * sampled doc. The eval/holdout-set discipline [[hashSplit]]
    * applies to splits, applied to per-group quotas.
    *
    * Scale: one shuffle on the stratum key + a per-group sorted
    * window truncated at 10. At 100 TB with few huge strata you'd
    * pre-prune with an approximate per-group hash-rank threshold
    * before the window; the declared grain here is the direct form.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_sampled"),
        r4(avg("n_chars")).as("avg_chars"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy("lang")
  }

  /** `weighted_sample` — deterministic weighted sampling WITHOUT
    * replacement (Efraimidis–Spirakis 2006, public knowledge; full
    * oracle): the top-10 docs per language by the ES key
    * `ln(u) / w`, where `u` is a pure content-hash uniform (first 48
    * md5 bits, the [[corpusMixSample]] discipline widened to 48 bits
    * so ties are impossible in practice) and the weight `w` is
    * `n_chars` — longer documents proportionally likelier, the
    * "sample by token mass" draw a mixing pipeline uses when a source
    * quota is expressed in tokens rather than documents. ln-form
    * instead of the paper's u^(1/w): identical ordering, no pow
    * precision skew across engines. Like hashSplit/corpusMixSample,
    * inclusion is a pure function of content — reproducible across
    * engines, cluster sizes, re-runs; stable under appends unless new
    * content actually displaces a winner.
    *
    * Scale shape: one scan computes the key; `row_number ≤ 10` over
    * the lang window lowers to WindowGroupLimit (asserted by the
    * bounded-dimension pin), so every task keeps a local top-10 and
    * the final per-lang sort sees ≤ 10×tasks survivors — the same
    * [wgl] discipline as stratified_sample, never a corpus-grain
    * per-lang sort. The exact u48 integer rides along in the output
    * for auditability (the float key is internal).
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u48 = conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long")
    val u = (u48.cast("double") + 0.5) / lit(281474976710656.0) // 2^48
    // try_divide per the DirtyInputSpec policy: a degenerate
    // zero-length doc yields a NULL key and sorts out of the sample
    // (DuckDB's -inf does the same), instead of killing the batch
    // under ANSI
    val esKey = try_divide(log(u), col("n_chars").cast("double"))
    val w = Window.partitionBy("lang")
      .orderBy(col("es_key").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        u48.as("u48"), esKey.as("es_key"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("lang"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_chars").as("weight"), col("u48"))
      .orderBy("lang", "rank")
  }

  /** `curate_corpus` — the end-to-end curation pipeline as ONE
    * declarative flow (the flagship "switch your pipeline to this
    * engine" query): exact content dedup (keep the min-doc_id
    * representative per md5 plane — one shuffle, hash-partitioned)
    * → quality filter (same formula as `quality_score`, threshold
    * 0.3) → deterministic `hash_split` assignment → per (split,
    * lang) training stats. Every stage is deterministic arithmetic,
    * so the whole pipeline is DuckDB-oracle-backed end to end.
    *
    * At 100 TB: stage 1 is the only shuffle (on the content hash);
    * stages 2-4 are per-row expressions folded into the same scan,
    * and the final agg is tiny. Replacing stage 1 with the MinHash
    * kill list (`DedupOps.nearDupMinhash`) upgrades exact dedup to
    * near-dedup without touching the rest of the flow.
    */
  def curateCorpus(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = lit(0.5) * least(col("n_chars"), lit(400)) / lit(400.0) +
      lit(0.5) * stopCount(Seq("the", "a", "and", "of", "to")) / size(toks)
    val bucket = (instr(lit("0123456789abcdef"),
      substring(md5(col("text")), 1, 1)) - 1).cast("int")
    Tables.documents(spark, dir)
      .withColumn("h", md5(lower(trim(col("text")))))
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keep_id"))
      .withColumn("q", q)
      .filter(col("q") >= 0.3)
      .withColumn("split",
        when(bucket < 10, lit("train"))
          .when(bucket < 13, lit("val"))
          .otherwise(lit("test")))
      .groupBy("split", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(filter(toks, t => t =!= "")).cast("long")).as("sum_tokens"),
        r4(avg("q")).as("avg_quality"))
      .orderBy("split", "lang")
  }

  /** Declared query `curate_corpus_neardup` (rows-only; the MinHash
    * kill list has no SQL mirror — CurateNearDupSpec pins the
    * containment invariants): [[curateCorpus]] with stage 1 upgraded
    * exact→NEAR dedup, exactly as that scaladoc promises: the md5
    * plane drops byte-identical copies, then the LSH kill list
    * (`DedupOps.nearDupKillList` — candidate generation by banding,
    * exact Jaccard verify, precision 1.0) anti-joins away verified
    * near-duplicates of each bucket representative. Quality / split /
    * stats stages unchanged. At 100 TB this adds the two sketch
    * shuffles of the kill list and nothing else.
    */
  def curateCorpusNearDup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kills = DedupOps.nearDupKillListFromSketches(
      SketchStore.sketches(spark, dir)).select("doc_id")
    val q = lit(0.5) * least(col("n_chars"), lit(400)) / lit(400.0) +
      lit(0.5) * stopCount(Seq("the", "a", "and", "of", "to")) / size(toks)
    val bucket = (instr(lit("0123456789abcdef"),
      substring(md5(col("text")), 1, 1)) - 1).cast("int")
    Tables.documents(spark, dir)
      .withColumn("h", md5(lower(trim(col("text")))))
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keep_id"))
      .join(kills, Seq("doc_id"), "left_anti")
      .withColumn("q", q)
      .filter(col("q") >= 0.3)
      .withColumn("split",
        when(bucket < 10, lit("train"))
          .when(bucket < 13, lit("val"))
          .otherwise(lit("test")))
      .groupBy("split", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(filter(toks, t => t =!= "")).cast("long")).as("sum_tokens"),
        r4(avg("q")).as("avg_quality"))
      .orderBy("split", "lang")
  }

  /** `regex_token_profile` — regex-based token profiling (the
    * filter-building block of corpus quality pipelines): per lang,
    * occurrences of '-er'-suffixed words and of long (≥8 char)
    * words, as counts and per-doc averages. Single scan, per-row
    * regexp_extract_all (codegen'd), tiny final agg. Patterns kept
    * in the RE2 ∩ Java-regex common dialect so the DuckDB oracle is
    * formula-identical.
    */
  def regexTokenProfile(spark: SparkSession, dir: String): DataFrame = {
    val erWords = size(regexp_extract_all(col("text"), lit("\\b[a-z]+er\\b"), lit(0)))
    val longWords = size(regexp_extract_all(col("text"), lit("\\b[a-z]{8,}\\b"), lit(0)))
    Tables.documents(spark, dir)
      .select(col("lang"), erWords.as("n_er"), longWords.as("n_long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_er").cast("long").as("sum_er_words"),
        sum("n_long").cast("long").as("sum_long_words"),
        r4(avg("n_er")).as("avg_er_words"))
      .orderBy("lang")
  }

  /** #80 — the higher-order array-function family as a DECLARED
    * oracle-backed query (filter / transform / aggregate /
    * array_distinct / array_max / array_contains — used as internals
    * all over the engine, here exercised as user-facing surface
    * against DuckDB's list_* twins): per-doc token-array analytics
    * rolled up per language. All lambdas run inside the row
    * projection — zero extra shuffles over a plain aggregation, the
    * reason HOFs beat explode-and-regroup when per-element state
    * isn't needed.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(toks).as("n_toks"),
        size(array_distinct(toks)).as("n_uniq"),
        array_max(transform(toks, t => length(t))).as("longest"),
        size(filter(toks, t => length(t) >= 6)).as("n_long"),
        when(array_contains(toks, "the"), 1L).otherwise(0L).as("has_the"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        // nullif: an empty/whitespace-only doc has 0 tokens — under
        // ANSI the bare division would fail the query; the empty doc
        // nulls out of the ratio instead (DirtyInputSpec)
        r4(avg(col("n_uniq").cast("double") / nullif(col("n_toks"), lit(0))))
          .as("avg_uniq_ratio"),
        max("longest").as("max_token_len"),
        sum("n_long").as("n_long_tokens"),
        sum("has_the").as("n_docs_with_the"))
      .orderBy("lang")
  }

  /** `length_trim_outliers` — percentile-based length trimming per
    * source (full oracle): docs outside the source's [p05, p95]
    * n_chars band are dropped (too-short = fragments/boilerplate,
    * too-long = concatenation artifacts — the standard length-outlier
    * pass a curation pipeline runs before content filters). Output is
    * the trim decision record: per source, docs / dropped_short /
    * dropped_long / kept / kept_frac.
    *
    * Scale shape: pass 1 is a per-source exact `percentile` (group
    * count = docs-per-source; at 100 TB swap for the GK sketch plane —
    * `percentile_approx`/QuantileSketch — same two-pass shape); the
    * source-count-sized cutoff table then BROADCASTS back onto the
    * scan, so classification is map-side and the second exchange is
    * the tiny per-source rollup. Cutoffs are compared at the ROUNDED
    * 4-dp grid in both engines (Det.r4) so a boundary doc can't flip
    * on an interpolation ulp.
    */
  def lengthTrimOutliers(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pct = docs.groupBy("source").agg(
      r4(expr("percentile(n_chars, 0.05)")).as("p05"),
      r4(expr("percentile(n_chars, 0.95)")).as("p95"))
    docs.join(broadcast(pct), Seq("source"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") < col("p05"), 1L).otherwise(0L))
          .as("dropped_short"),
        sum(when(col("n_chars") > col("p95"), 1L).otherwise(0L))
          .as("dropped_long"),
        sum(when(col("n_chars") >= col("p05") && col("n_chars") <= col("p95"), 1L)
          .otherwise(0L)).as("kept"),
        r4(sum(when(col("n_chars") >= col("p05") && col("n_chars") <= col("p95"),
          1).otherwise(0)) / count(lit(1))).as("kept_frac"))
      .orderBy("source")
  }

  /** `quantile_norm_chars` — cross-source quantile normalization of
    * doc length (full oracle): percent_rank and cume_dist of n_chars
    * WITHIN each source, reported for a bounded doc slice. Raw
    * per-source score scales are incomparable (one crawler truncates
    * at 4 KB, another doesn't); rank-normalizing to [0,1] within
    * source is how curation pipelines make a single global keep
    * threshold meaningful — the calibration step in front of
    * `corpus_mix_sample`'s per-source quotas.
    *
    * Determinism: the window orders by (n_chars, doc_id) — a total
    * order, so duplicate lengths get identical ranks in both engines;
    * rank ratios are exact small-integer divisions under Det.r4.
    * cume_dist under a total order is rank/n (each "tie group" is one
    * row) — the intended normalized-rank statistic.
    *
    * Scale: one window exchange partitioned by source. Source
    * cardinality is small-and-bounded here (the SLO-report shape); a
    * hot source at 100 TB swaps in the two-pass rank form — per-source
    * sorted rank via zipWithIndex-style windows over pre-aggregated
    * (n_chars, count) — or the GK plane for approximate ranks; the
    * [0,1] calibration contract downstream is unchanged.
    */
  def quantileNormChars(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        r4(percent_rank().over(w)).as("pct_rank"),
        r4(cume_dist().over(w)).as("cume"))
      .filter(col("doc_id") < 200)
      .orderBy("doc_id")
  }

  /** `curation_funnel` — the end-to-end curation yield report (full
    * oracle): doc and token mass surviving each cumulative stage of
    * the pipeline the individual queries implement piecewise —
    * raw → exact dedup ([[curateCorpus]]'s md5 keeper rule) →
    * quality gate (same q ≥ 0.3) → mix sampling
    * ([[corpusMixSample]]'s per-source md5 thresholds). The ONE
    * number a dataset review asks for ("how many tokens survive to
    * training, and which stage eats them"), pinned to the SAME
    * conventions as the component queries so the funnel can never
    * drift from the lanes it summarizes (CurationLawSpec ties stage
    * 3 to corpus_mix_sample's realized counts).
    *
    * Scale: ONE corpus scan + the content-hash window exchange (the
    * keeper rule); all four stages reduce to boolean flags folded in
    * a single aggregation row, pivoted with `stack` — adding stages
    * costs columns, not passes.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = lit(0.5) * least(col("n_chars"), lit(400)) / lit(400.0) +
      lit(0.5) * stopCount(Seq("the", "a", "and", "of", "to")) / size(toks)
    val idx = expr("try_cast(substring(source, 4, 10) AS INT)")
    val thr = when(idx < 5, 65536L).when(idx < 10, 32768L)
      .when(idx < 15, 16384L).otherwise(8192L)
    val u16 = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long")
    val flags = Tables.documents(spark, dir)
      .withColumn("ntok", size(filter(toks, t => t =!= "")).cast("long"))
      .withColumn("h", md5(lower(trim(col("text")))))
      .withColumn("k1",
        col("doc_id") === min("doc_id").over(Window.partitionBy("h")))
      .withColumn("k2", col("k1") && q >= 0.3)
      .withColumn("k3", col("k2") && u16 < thr)
    val one = flags.agg(
      count(lit(1)).as("n0"), sum("ntok").as("t0"),
      sum(when(col("k1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("k1"), col("ntok")).otherwise(0L)).as("t1"),
      sum(when(col("k2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("k2"), col("ntok")).otherwise(0L)).as("t2"),
      sum(when(col("k3"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("k3"), col("ntok")).otherwise(0L)).as("t3"))
    one.selectExpr(
      "stack(4, 0L, 'raw', n0, t0, 1L, 'exact_dedup', n1, t1, " +
        "2L, 'quality', n2, t2, 3L, 'mix_sample', n3, t3) " +
        "as (stage_idx, stage, n_docs, sum_tokens)")
      .orderBy("stage_idx")
  }

  /** `dup_ngram_coverage` — per-document duplicate-text fraction: the
    * share of a document's distinct 8-gram shingles that also appear
    * in ANOTHER document (the corpus-overlap diagnostic behind
    * substring-level dedup in "Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2021 — here at shingle
    * grain, exactly computable). Per-source report: doc count, mean
    * coverage, docs with ≥50% duplicated shingles (the rounded score
    * is compared so the flag can't flip on a summation-order ulp).
    *
    * Scale: shingling is scan-side HOF arithmetic (`transform` over a
    * `sequence`, `array_distinct` BEFORE the explode so within-doc
    * repeats never leave the scan task). The one corpus-sized
    * exchange is the shingle-grain Window (`count over partitionBy
    * (sh)`) — chosen over groupBy(sh)+self-join because it reads the
    * exploded stream ONCE: the duplicated-shingle set is itself
    * corpus-sized (never broadcastable), a self-join would re-shuffle
    * the same stream twice, and 8-gram keys are near-unique so
    * map-side partial aggs would collapse almost nothing. Doc and
    * source rollups above it are output-linear. At 100 TB the shingle
    * exchange is THE cost and is hash-partitioned across the cluster;
    * skew is impossible by construction (a shingle key's group is its
    * duplicate count, Zipf-bounded by dedup_docs' exact-dup rate).
    */
  def dupNgramCoverage(spark: SparkSession, dir: String): DataFrame = {
    val ws = filter(split(col("text"), " "), t => t =!= "")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), ws.as("ws"))
      .filter(size(col("ws")) >= 8)
    val sh = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("ws")) - lit(7)),
        i => array_join(slice(col("ws"), i, lit(8)), " ")))).as("sh"))
    val nd = sh.withColumn("nd", count(lit(1)).over(Window.partitionBy("sh")))
    val per = nd.groupBy("doc_id", "source").agg(
      r4(sum(when(col("nd") >= 2, 1).otherwise(0)) * lit(1.0) / count(lit(1)))
        .as("cov"))
    per.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      r4(avg("cov")).as("avg_dup_coverage"),
      sum(when(col("cov") >= 0.5, 1).otherwise(0)).as("n_heavy_dup"))
      .orderBy("source")
  }

  /** `char_entropy` — Shannon entropy of the CHARACTER distribution
    * per language (full oracle): the encoding-health signal token
    * stats can't see — mojibake, double-encoded UTF-8, or binary
    * spill inflates the character alphabet and pushes entropy far
    * off a language's natural band, while [[graft.operators
    * .LlmQueries.entropyTtr]]'s token-level entropy stays blind to
    * it (garbled bytes still form "tokens"). The standard cheap
    * pre-filter before language-ID in a curation pipeline.
    *
    * Character = Unicode CODE POINT in both engines (the r5-advice
    * check): Spark's `split(text, "")` produces zero-width regex
    * matches that never land inside a surrogate pair, so emoji and
    * supplementary CJK survive intact — empirically verified against
    * DuckDB's `string_split_regex(text, '')` (same per-code-point
    * list on 😀 / 𪚥) and pinned by CorpusStatsSpec's non-BMP
    * fixture, so a Spark regex-engine change would fail CI, not
    * silently diverge on exactly the mojibake this query detects.
    *
    * Scale: the char stream is a scan-side split+explode collapsed
    * map-side into the (lang, char)-grain agg — the exchange carries
    * |langs|×|alphabet| rows per partition, never the corpus;
    * per-lang totals broadcast back onto that same small frame.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cc = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= "")
      .groupBy("lang", "c").agg(count(lit(1)).as("n"))
    val lt = cc.groupBy("lang").agg(sum("n").as("t"))
    cc.join(broadcast(lt), Seq("lang"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_chars_distinct"),
        r4(-sum((col("n") * lit(1.0) / col("t")) *
          log(col("n") * lit(1.0) / col("t")))).as("char_entropy"))
      .orderBy("lang")
  }

  /** `shingle_novelty` — novelty-decay curve at 8-gram shingle grain
    * (full oracle): per ingestion bucket (doc_id div 50, the
    * vocab_growth grain), the distinct-shingle count and the
    * fraction appearing for the FIRST time in that bucket. The
    * dedup-policy instrument over TIME that [[dupNgramCoverage]]'s
    * corpus-static view can't give: a falling novelty curve says
    * each new crawl slice re-collects mostly known text — exactly
    * when incremental dedup (BloomDedup) starts paying for itself.
    *
    * Scale shape: ONE (bucket, shingle)-grain distinct frame feeds
    * both sides (first-bucket min and per-bucket totals) — built
    * once behind a localCheckpoint, so the corpus-sized shingle
    * exchange happens exactly once; everything after is
    * shingle-vocabulary- or bucket-grain. No windows anywhere (the
    * vocab_growth cumsum lesson does not arise: novelty is a
    * per-bucket ratio, not a running total). The bucket width is the
    * corpus-growth knob — widen it with corpus size to keep the
    * curve plot-sized.
    */
  def shingleNovelty(spark: SparkSession, dir: String): DataFrame = {
    val ws = filter(split(col("text"), " "), t => t =!= "")
    val docs = Tables.documents(spark, dir)
      .select(expr("doc_id div 50").as("bucket"), ws.as("ws"))
      .filter(size(col("ws")) >= 8)
    val bs = docs.select(col("bucket"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("ws")) - lit(7)),
        i => array_join(slice(col("ws"), i, lit(8)), " ")))).as("g"))
      .distinct()
      .cut()
    val nnew = bs.groupBy("g").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new"))
    val tot = bs.groupBy("bucket").agg(count(lit(1)).as("n_shingles"))
    tot.join(nnew, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_shingles"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        r4(coalesce(col("n_new"), lit(0L)) * lit(1.0) / col("n_shingles"))
          .as("novelty"))
      .orderBy("bucket")
  }

  /** `length_survival` — per-language token-length survival curve
    * (full oracle): for each power-of-two threshold 8…256, the count
    * and share of documents with at least that many tokens — the
    * CCDF a training-data team reads before fixing a sequence-length
    * budget (seq_pack_buckets bins the chosen budget; this curve is
    * how the budget gets chosen: "keeping ≥128-token docs only
    * retains 4% of de"). Token count is token_count's exact
    * whitespace split, so the two reports share a definition.
    *
    * Scale shape: ONE corpus scan collapsing map-side into a
    * |langs|-row wide frame of conditional counts — the thresholds
    * are SIX `sum(when)` columns in the same agg, NOT a 6× explode of
    * the corpus; the long (lang, threshold) layout is unfolded from
    * the wide frame afterwards (≤ |langs|·6 rows). An empty tail
    * (no doc reaches 256) is a 0-count row, not an absent one — the
    * curve always has the same x-axis.
    */
  def lengthSurvival(spark: SparkSession, dir: String): DataFrame = {
    val thresholds = Seq(8, 16, 32, 64, 128, 256)
    val nTok = size(filter(split(col("text"), " "), t => t =!= ""))
    val aggCols = count(lit(1)).as("n_docs") +:
      thresholds.map(t =>
        sum(when(col("n_tok") >= t, 1L).otherwise(0L)).as(s"ge_$t"))
    val wide = Tables.documents(spark, dir)
      .select(col("lang"), nTok.as("n_tok"))
      .groupBy("lang")
      .agg(aggCols.head, aggCols.tail: _*)
    wide
      .select(col("lang"), explode(array(thresholds.map(t => struct(
        lit(t.toLong).as("threshold"),
        col(s"ge_$t").as("n_ge"),
        r4(col(s"ge_$t") * lit(1.0) / col("n_docs")).as("share"))): _*))
        .as("s"))
      .select(col("lang"), col("s.threshold"), col("s.n_ge"), col("s.share"))
      .orderBy("lang", "threshold")
  }

  /** `split_leakage` — near-duplicate pairs that CROSS the
    * [[hashSplit]] train/val/test boundary (full oracle): the
    * in-corpus contamination check a training pipeline runs before
    * shipping splits — a near-dup of a test document sitting in train
    * silently inflates eval. Pairs are near_dup_pairs' exact
    * token-set Jaccard ≥ 0.8 on the same bounded slice
    * (doc_id < 300, O(n²) by construction); each side's split is the
    * SAME pure content-hash bucket hashSplit ships, so the three
    * reports (split sizes, near-dup pairs, leakage) are consistent by
    * definition. On a content-hash split, near-dups land across
    * splits at roughly the cross-split mass rate (~50% here) — the
    * measured number IS the lesson: dedup must run BEFORE splitting,
    * which is exactly the curate_corpus_neardup → hash_split order.
    *
    * Scale shape: the pair generator is the bounded exact slice; the
    * unbounded twin is the existing near_dup_minhash LSH kill-list
    * joined to the split map (both sides doc_id-keyed,
    * output-linear), documented here and executable via
    * DedupOps.nearDupMinhash + hashSplit's bucket column. The split
    * attach rides the pair join's own doc_id keys (two joins on the
    * ≤slice-sized pair frame).
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (instr(lit("0123456789abcdef"),
      substring(md5(col("text")), 1, 1)) - 1).cast("int")
    val splitCol = when(bucket < 10, lit("train"))
      .when(bucket < 13, lit("val")).otherwise(lit("test"))
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"), splitCol.as("split"),
        array_distinct(split(col("text"), " ")).as("ws"))
    val pairs = LlmQueries.exactJaccardPairs(
      docs.select("doc_id", "lang", "ws"), 0.8)
    val splits = docs.select(col("doc_id"), col("split"))
    pairs
      .join(splits.select(col("doc_id").as("a_id"), col("split").as("a_split")), "a_id")
      .join(splits.select(col("doc_id").as("b_id"), col("split").as("b_split")), "b_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("a_split") =!= col("b_split"), 1L).otherwise(0L))
          .as("n_cross"),
        r4(sum(when(col("a_split") =!= col("b_split"), 1L).otherwise(0L)) *
          lit(1.0) / count(lit(1))).as("leak_rate"))
      .orderBy("lang")
  }

  /** `bpe_merge_candidates` — the top-20 adjacent character pairs by
    * corpus frequency (full oracle): exactly the statistic the FIRST
    * iteration of byte-pair-encoding tokenizer training maximizes
    * (Sennrich et al. 2016 / Gage 1994, public knowledge). Before
    * training a tokenizer on a new corpus, this is the profile that
    * says which merges the vocabulary will spend its budget on — and
    * whether the corpus mix shifted (compare runs: a moved pair
    * distribution means the tokenizer should be retrained).
    *
    * Scale shape: tokenize → per-word in-place pair expansion
    * (transform over a sequence — each word of length L yields its
    * L−1 pairs with no self-join), then the word-count shuffle shape
    * (partial agg collapses the ~26² pair domain per partition before
    * the exchange) and a TakeOrderedAndProject top-20 (count desc,
    * pair asc — total order, never a global sort). The 1-row pair
    * total broadcasts for the share column (pinned).
    */
  def bpeMergeCandidates(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
    val total = pairs.agg(count(lit(1)).as("n_pairs_total"))
    pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(col("pair"), col("cnt"),
        graft.functions.Det.r6(col("cnt") / col("n_pairs_total")
          .cast("double")).as("pair_share"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  /** `incremental_dedup` — the NIGHTLY-INGEST dedup shape (full
    * oracle): a content-hash batch slice (~1/8 of the corpus, the
    * hash_split discipline) is deduplicated first WITHIN itself,
    * then AGAINST the existing store, on a bag-of-words fingerprint
    * (md5 of the sorted distinct token set — word-order-insensitive,
    * so shuffled re-posts collide; the exact-text plane is
    * dedup_docs). Per lang: batch size, internal dups, store hits,
    * and what actually ingests — batch dedup that recomputes against
    * the full corpus every night is the classic accidental-quadratic
    * pipeline; the semi/anti-join-against-the-store shape is the one
    * that stays linear.
    *
    * Scale shape: fingerprints collapse map-side ((lang, h) partial
    * agg); the store side reduces to its DISTINCT hash set before
    * the join (at real scale that set lives as the persisted,
    * bucketed fingerprint store — or its Bloom front, the
    * bloom_prefilter_dedup lane — so the nightly cost is
    * O(batch ⋈ store-index), never O(corpus²)).
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    // probes the persisted SketchStore: `bag_h` IS the stored
    // fingerprint column, so the nightly query never touches text
    val docs = SketchStore.sketches(spark, dir)
      .select(col("doc_id"), col("lang"), col("bag_h").as("h"))
      .withColumn("bucket", (instr(lit("0123456789abcdef"),
        substring(md5(col("doc_id").cast("string")), 1, 1)) - 1)
        .cast("int"))
    val storeH = docs.filter(col("bucket") < 14).select("h").distinct()
    val batchGroups = docs.filter(col("bucket") >= 14)
      .groupBy("lang", "h").agg(count(lit(1)).as("c"))
    val reps = batchGroups.join(storeH.withColumn("in_store", lit(1L)),
      Seq("h"), "left")
    reps.groupBy("lang")
      .agg(sum("c").as("n_batch"),
        sum(col("c") - 1L).as("n_internal_dups"),
        sum(when(col("in_store").isNotNull, 1L).otherwise(0L))
          .as("n_store_hits"),
        sum(when(col("in_store").isNull, 1L).otherwise(0L))
          .as("n_ingested"))
      .orderBy("lang")
  }
}
