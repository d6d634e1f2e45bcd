package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column handling for the training-data pipeline:
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, batched feature extraction, and frame sampling.
  *
  * Real codecs are NOT available in this container, so the decode
  * kernel is a clearly-marked DETERMINISTIC FAKE — the Spark-side
  * plumbing (schemas, encoders, partitioning, batched mapPartitions
  * shape) is real and tested (MediaSpec). Swapping `fakeDecode` for a
  * JNI/FFI codec changes no plan shape: mapPartitions with
  * fixed-size batches is exactly the Scala analog of `mapInPandas`
  * (per-batch amortization of decoder setup, bounded memory per
  * task).
  *
  * Scale notes: media blobs are large and must never be shuffled —
  * every operation here is a narrow map over the scan (no
  * repartition, no join on content). Aggregations only ever touch
  * extracted features/metadata (bytes, hashes, small float vectors).
  */
object MediaOps {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
    sampleRateHz: Int, durationMs: Long)

  /** One media row: id + opaque content + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String,
    content: Array[Byte], meta: MediaMeta)

  /** Extracted per-media features (what downstream training uses). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    content_hash: Long, features: Array[Float])

  /** Batched "decode + featurize": the mapInPandas-shaped kernel.
    * Batches are `batchSize` records; the decoder is invoked once per
    * batch (amortization point), then per record.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would happen here (codec init, GPU
        // buffer alloc); the fake needs none.
        batch.iterator.map(fakeDecode)
      }
    }
  }

  /** DETERMINISTIC FAKE decode — stands in for image/audio decode
    * (no codec libraries in this environment). Features are byte
    * statistics: mean, variance, min, max of the payload bytes plus
    * 4 coarse histogram buckets — deterministic, content-derived,
    * fixed dimension (8), so tests exercise real data flow.
    */
  private[operators] def fakeDecode(r: MediaRecord): MediaFeatures = {
    val bs = r.content
    val n = math.max(bs.length, 1)
    var sum = 0.0; var sumSq = 0.0
    var min = 255.0; var max = 0.0
    val hist = new Array[Float](4)
    var h = 1125899906842597L // FNV-ish rolling content hash
    bs.foreach { b =>
      val v = (b & 0xFF).toDouble
      sum += v; sumSq += v * v
      if (v < min) min = v
      if (v > max) max = v
      hist((b & 0xFF) >> 6) += 1f
      h = h * 31 + (b & 0xFF)
    }
    val mean = sum / n
    val variance = sumSq / n - mean * mean
    MediaFeatures(r.media_id, r.kind, bs.length.toLong, h,
      Array(mean.toFloat, variance.toFloat, min.toFloat, max.toFloat,
        hist(0) / n, hist(1) / n, hist(2) / n, hist(3) / n))
  }

  /** Frame sampling for "video" payloads: view content as fixed-size
    * frames and keep every `stride`-th, emitting (media_id, frame_idx,
    * frame bytes). Flat-map shape — no shuffle, output rows stay on
    * the input partition.
    */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int, stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.content.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 =>
          (r.media_id, idx.toLong, frame)
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Declared query `media_bytes_stats` (WITH oracle): documents'
    * text payloads viewed as opaque UTF-8 blobs (the stand-in media
    * store), per-lang byte/dedup stats — the metadata-plane
    * aggregation that never touches blob internals beyond length +
    * content hash, exactly what a 100 TB media catalog query should
    * do.
    */
  def mediaBytesStats(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast("binary")
    Tables.documents(spark, dir)
      .select(col("lang"), length(blob).cast("long").as("n_bytes"),
        md5(blob).as("content_md5"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("sum_bytes"),
        countDistinct("content_md5").as("n_unique_blobs"))
      .orderBy("lang")
  }
}
