package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The container has no codec
  * libraries, so the decode step is a clearly-marked deterministic
  * fake — but the Spark-side plumbing (binary columns, typed
  * mapPartitions decode with case-class Encoders, partition-sized
  * batches, metadata pushdown-friendly schema) is real and tested.
  */
object Multimodal {

  /** Typed decode output (what a real image decoder would emit). */
  case class AssetFeature(doc_id: Long, source: String, n_bytes: Long,
      width: Long, height: Long, feat_mean: Double)

  /** Asset table: payload as binary + derived typed metadata. The
    * metadata formulas are deterministic fakes standing in for a real
    * header parse; aggregation over them per source is oracle-exact. */
  def assetMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("source"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        (lit(64) + pmod(col("n_chars"), lit(512))).cast("long").as("width"),
        (lit(64) + pmod(col("n_chars") * 7, lit(512))).cast("long").as("height"),
        (lit(1) + pmod(col("doc_id"), lit(30))).cast("long").as("frames"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("width")).cast("double") / count(lit(1))).as("avg_width"),
        max(col("frames")).as("max_frames"))
      .orderBy(col("source"))

  /** Decode pipeline: binary payload → per-asset features via typed
    * mapPartitions (the Scala analogue of a Pandas-UDF/mapInPandas
    * batch decode — one decoder instantiation per partition, stream
    * of rows through it, no per-row setup cost).
    *
    * STUB: `fakeDecode` stands in for the codec call. It reads real
    * bytes and produces deterministic features, so schema/partition/
    * batch plumbing is fully exercised. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assets = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("payload"))
      .as[(Long, String, Array[Byte])]
    assets.mapPartitions { it =>
      // real decoder would be constructed once per partition here
      it.map { case (id, source, payload) =>
        val (w, h, mean) = fakeDecode(payload)
        AssetFeature(id, source, payload.length.toLong, w, h,
          math.rint(mean * 10000) / 10000)
      }
    }.toDF()
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_assets"),
        round(avg(col("feat_mean")), 4).as("avg_feat"),
        max(col("width")).as("max_width"))
      .orderBy(col("source"))
  }

  /** Per-frame record emitted by the frame sampler. */
  case class Frame(doc_id: Long, frame_idx: Long, offset: Long,
      frame_bytes: Long, luma: Double)

  /** Frame sampling / resize plumbing: treat the payload as a fake
    * video (fixed-size "frames" over the byte stream), sample every
    * k-th frame, and emit per-frame features. flatMapPartitions shape:
    * one decoder per partition, 0..n output rows per input row — the
    * real pattern for video corpora where frames explode row counts.
    * STUB: frame boundaries/features are deterministic fakes; the
    * schema, partition-batch shape, and explode semantics are real. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val every = 4
    val frameSize = 32
    val assets = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    assets.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        val nFrames = payload.length / frameSize
        (0 until nFrames by every).iterator.map { f =>
          val off = f * frameSize
          var sum = 0L
          var i = off
          while (i < off + frameSize) { sum += (payload(i) & 0xff); i += 1 }
          Frame(id, f.toLong, off.toLong, frameSize.toLong,
            math.rint(sum.toDouble / frameSize * 100) / 100)
        }
      }
    }.toDF()
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_sampled_frames"),
        round(avg(col("luma")), 2).as("avg_luma"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stand-in for an image/audio decode (???-grade stub:
    * replace with a real codec when the runtime has one). */
  private def fakeDecode(payload: Array[Byte]): (Long, Long, Double) = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xff); i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    (64L + n % 512, 64L + (n * 7) % 512, mean)
  }
}
