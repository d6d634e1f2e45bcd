package graft

import org.apache.spark.sql.functions._

import graft.operators.MediaOps
import graft.operators.MediaOps.{MediaMeta, MediaRecord}
import graft.sources.Tables

/** Multimodal plumbing tests: typed schema round-trip, batched
  * mapPartitions feature extraction, frame sampling — on blobs
  * derived from the documents fixture (real codecs are stubbed by a
  * deterministic fake; see MediaOps scaladoc).
  */
class MediaSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = {
    val docs = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
    docs.map { case (id, text, nChars) =>
      val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
      MediaRecord(id, kind, text.getBytes("UTF-8"),
        MediaMeta(kind, width = 64, height = 48, sampleRateHz = 16000,
          durationMs = nChars))
    }
  }

  test("extractFeatures: one output per input, deterministic, fixed dim 8") {
    val f1 = MediaOps.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = MediaOps.extractFeatures(media, batchSize = 7).collect().sortBy(_.media_id)
    assert(f1.length == media.count())
    // batch size must not change results (pure per-record kernel)
    assert(f1.map(_.content_hash).sameElements(f2.map(_.content_hash)))
    f1.foreach { f =>
      assert(f.features.length == 8)
      assert(f.n_bytes > 0)
      // byte stats sanity: 0 <= min <= mean <= max <= 255
      assert(f.features(2) <= f.features(0) && f.features(0) <= f.features(3))
      assert(f.features(2) >= 0f && f.features(3) <= 255f)
      // histogram buckets sum to ~1
      val hsum = f.features.drop(4).sum
      assert(math.abs(hsum - 1f) < 1e-3, s"hist sum $hsum")
    }
  }

  test("extractFeatures: identical content => identical hash and features") {
    val f = MediaOps.extractFeatures(media).collect()
    val byHash = f.groupBy(_.content_hash)
    byHash.values.foreach { grp =>
      val heads = grp.map(_.features.toSeq).distinct
      assert(heads.size == 1)
    }
  }

  test("sampleFrames: keeps every stride-th fixed-size frame") {
    val frames = MediaOps.sampleFrames(media.filter(_.kind == "video"), frameBytes = 32, stride = 2)
    val counts = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.filter(_.kind == "video").collect().map { r =>
      val nFrames = (r.content.length + 31) / 32
      r.media_id -> ((nFrames + 1) / 2).toLong // ceil(nFrames / stride)
    }.toMap
    assert(counts == expected)
    // frame bytes: all but possibly the last are exactly 32 bytes
    val sizes = frames.select(col("media_id"), col("frame_idx"), length(col("frame")).as("len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    sizes.foreach { case (_, _, len) => assert(len <= 32 && len > 0) }
  }

  test("media_bytes_stats matches direct computation") {
    val got = MediaOps.mediaBytesStats(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expect = Tables.documents(spark, sf)
      .select(col("lang"), col("text"))
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues { docs =>
        (docs.length.toLong,
          docs.map(_._2.getBytes("UTF-8").length.toLong).sum,
          docs.map(_._2).distinct.length.toLong)
      }.toMap
    assert(got == expect)
  }

  test("aHash laws: deterministic, content-derived, locally sensitive") {
    val rnd = new scala.util.Random(23)
    val base = Array.fill(6400)(rnd.nextInt(256).toByte)
    // identical content -> identical hash; empty -> 0
    assert(MediaOps.aHash(base) == MediaOps.aHash(base.clone()))
    assert(MediaOps.aHash(Array.emptyByteArray) == 0L)
    // perturbing ONE slice region flips few bits (locality — the
    // property that makes hamming distance a near-dup signal)
    val tweaked = base.clone()
    (0 until 100).foreach(i => tweaked(i) = (tweaked(i) ^ 0x7F).toByte)
    val d = java.lang.Long.bitCount(MediaOps.aHash(base) ^ MediaOps.aHash(tweaked))
    assert(d >= 1 && d <= 8, s"one-slice perturbation flipped $d/64 bits")
    // unrelated content diverges widely
    val other = Array.fill(6400)(rnd.nextInt(256).toByte)
    assert(java.lang.Long.bitCount(MediaOps.aHash(base) ^ MediaOps.aHash(other)) > 10)
  }

  test("pigeonhole recall: every pair at hamming <= 3 IS found (by construction)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val bases = Seq.fill(20)(rnd.nextLong())
    // for each base hash, a partner with 3 bit flips spread across
    // THREE different blocks of the r10 6-block split (worst case:
    // only one 3-block subset of the C(6,3) bands left fully intact)
    // — the banding must still catch it
    val rows = bases.zipWithIndex.flatMap { case (h, i) =>
      val partner = h ^ (1L << 3) ^ (1L << 20) ^ (1L << 40)
      Seq((i * 2L + 1, h), (i * 2L + 2, partner))
    }
    val found = MediaOps.phashNearDupPairs(rows.toDF("media_id", "phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    bases.indices.foreach { i =>
      assert(found.contains((i * 2L + 1, i * 2L + 2)),
        s"pair $i at hamming 3 missed — pigeonhole guarantee broken")
    }
    // and nothing at hamming > 3 sneaks through the verify filter
    val hams = MediaOps.phashNearDupPairs(rows.toDF("media_id", "phash"))
      .select("hamming").collect().map(_.getInt(0))
    assert(hams.forall(_ <= 3))
  }

  test("phash_dups: output-linear summary counts exact cliques arithmetically") {
    val row = MediaOps.phashDups(spark, sf).collect().head
    val nMedia = row.getLong(0); val nDistinct = row.getLong(1)
    val nExact = row.getLong(2)
    assert(nMedia == Tables.documents(spark, sf).count())
    assert(nDistinct <= nMedia)
    // the corpus has exact dup cliques (dedup_docs proves dups exist);
    // identical text => identical payload => identical aHash
    val dups = Tables.documents(spark, sf)
      .groupBy(md5(col("text").cast("binary"))).count()
      .filter(col("count") > 1)
      .agg(coalesce(sum(col("count") * (col("count") - 1) / 2), lit(0.0)))
      .collect().head.getDouble(0)
    assert(nExact >= dups.toLong,
      s"exact-pair count $nExact below the md5-clique floor $dups")
  }
}
