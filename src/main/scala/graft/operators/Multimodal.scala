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
}
