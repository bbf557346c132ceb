package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** m01: multimodal-column plumbing (SURVEY.md §2.C).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct; decode/feature-extract runs as a typed `mapPartitions`
  * pipeline (the Scala analogue of `mapInPandas` batch UDFs) so each
  * partition amortizes decoder setup and the work distributes with the
  * data. The actual byte→pixels decode is a STUB — the container has no
  * image/audio codecs — replaced by a deterministic fake that preserves
  * the real contract: schema, null handling, batch shape, partitioning.
  */
object Multimodal {

  /** Decoded-media feature record (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, feat: Array[Float])

  /** STUB decode: deterministic fake features from the payload bytes
    * (byte-histogram moments standing in for pixel statistics). A real
    * deployment swaps only this function for an actual codec call; the
    * surrounding pipeline is unchanged.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val nBins = 8
    val hist = new Array[Long](nBins)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % nBins) += 1
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Media table derived deterministically from documents: payload =
    * UTF-8 bytes, media_type round-robins image/audio/video. At 100 TB
    * this is `spark.read.format("binaryFile")` or a manifest join — the
    * downstream pipeline is identical.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(col("text")).cast(LongType).as("content_length"),
        col("source").as("origin"),
        col("lang").as("tag")).as("meta"))
  }

  /** m01: decode + feature-extract over the media table, then a
    * per-media-type rollup. The mapPartitions stage is the batch-UDF
    * pattern: one decoder instantiation per partition, streaming
    * iterator in/out (no materialized partition copies).
    */
  def m01Multimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
    val features = media
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup happens here (stubbed)
        rows.map { case (id, mt, payload) =>
          MediaFeatures(id, mt, payload.length.toLong, stubDecode(payload))
        }
      }
    features.toDF()
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        // decimal fixed-point before avg: float partial sums would be
        // partition-order dependent (SURVEY.md §4)
        round(avg(element_at(col("feat"), 1).cast("decimal(18,9)"))
          .cast("double"), 4).as("avg_feat0"))
      .orderBy("media_type")
  }

  /** One sampled, resized frame of a video payload. */
  final case class FrameFeatures(
      doc_id: Long, frame_idx: Int, n_frames: Int, resized: Array[Float])

  /** STUB resize: bucket-average a frame's bytes down to `outRes`
    * values — the stand-in for a real scaler/thumbnailer. Swapping in a
    * codec changes only this function.
    */
  def stubResize(frame: Array[Byte], outRes: Int): Array[Float] = {
    val out = new Array[Float](outRes)
    if (frame.isEmpty) return out
    val counts = new Array[Int](outRes)
    var i = 0
    while (i < frame.length) {
      // proportional bucket; multiply first to avoid len<outRes collapse
      val b = (i.toLong * outRes / frame.length).toInt
      out(b) += (frame(i) & 0xff)
      counts(b) += 1
      i += 1
    }
    var j = 0
    while (j < outRes) {
      if (counts(j) > 0) out(j) /= counts(j)
      j += 1
    }
    out
  }

  /** One audio analysis window (what a real PCM featurizer emits). */
  final case class AudioWindow(
      doc_id: Long, win_idx: Int, n_windows: Int, energy: Double)

  /** STUB energy: RMS over the window's bytes centered at 128 — the
    * stand-in for decode-to-PCM + a spectral feature. Swapping in a
    * codec changes only this function.
    */
  def stubEnergy(window: Array[Byte]): Double = {
    if (window.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < window.length) {
      val v = (window(i) & 0xff) - 128.0
      s += v * v
      i += 1
    }
    math.sqrt(s / window.length)
  }

  /** m03: overlapping-window audio featurization — the spectrogram-
    * frame contract m02's stride sampling doesn't cover: windows of
    * `windowBytes` advance by `hopBytes` (overlapping when
    * hop < window, the standard STFT shape), each yielding one
    * feature row. Same batch discipline as m01/m02: flatMap-shaped
    * mapPartitions, per-partition decoder amortization, streaming
    * iterators, no driver hop; the ~window/hop× row expansion happens
    * executor-side and flows straight into whatever aggregation
    * follows.
    */
  def m03AudioWindows(spark: SparkSession, dir: String,
      windowBytes: Int = 512, hopBytes: Int = 256): DataFrame = {
    require(hopBytes > 0 && windowBytes > 0, "window/hop must be positive")
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          // an empty payload has ZERO windows (no phantom silent frame
          // skewing downstream energy aggregates)
          val starts = 0 until payload.length by hopBytes
          val n = starts.length
          starts.iterator.zipWithIndex.map { case (start, w) =>
            val window = java.util.Arrays.copyOfRange(payload,
              start, math.min(start + windowBytes, payload.length))
            AudioWindow(id, w, n, stubEnergy(window))
          }
        }
      }
      .toDF()
      .select(col("doc_id"), col("win_idx"), col("n_windows"),
        round(col("energy"), 4).as("energy"))
      .orderBy("doc_id", "win_idx")
  }

  /** m02: frame-sample + resize over video payloads. A payload is
    * treated as a sequence of fixed-`frameBytes` frames; every
    * `stride`-th frame is sampled and resized to `outRes` values. The
    * flatMap-shaped mapPartitions (one input row → few frame rows) is
    * the real contract a codec-backed sampler would keep: per-partition
    * decoder amortization, streaming iterators, no driver involvement,
    * output partitioning inherited from the input so a downstream
    * per-doc groupBy needs no extra shuffle beyond the agg's own.
    */
  def m02FrameSample(spark: SparkSession, dir: String,
      frameBytes: Int = 256, stride: Int = 4, outRes: Int = 16): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val nFrames = (payload.length + frameBytes - 1) / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            val frame = java.util.Arrays.copyOfRange(payload,
              f * frameBytes, math.min((f + 1) * frameBytes, payload.length))
            FrameFeatures(id, f, nFrames, stubResize(frame, outRes))
          }
        }
      }
      .toDF()
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        round(element_at(col("resized"), 1).cast("double"), 4).as("feat0"))
      .orderBy("doc_id", "frame_idx")
  }
}
