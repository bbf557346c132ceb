package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (interval) join — `point BETWEEN lo AND hi` — with a
  * bucketized equi-join strategy (SURVEY.md §2.C2).
  *
  * Spark plans a raw BETWEEN join as BroadcastNestedLoopJoin (every
  * point × every interval). Binning converts it to a hash join: each
  * interval explodes into the fixed-width bins it covers, points map to
  * their bin, the equi-join on bin bounds candidates to intervals
  * overlapping the point's bin, and the exact BETWEEN filter finishes.
  * Cost drops from |points|·|intervals| to |points|·(avg intervals per
  * bin) — the standard approach when the interval table is too large to
  * broadcast.
  */
object RangeJoin {

  /** Bucketized range join: rows of `points` matched to rows of
    * `intervals` where `points.pointCol` ∈ [loCol, hiCol]. `binWidth`
    * trades replication (intervals spanning many bins) against
    * candidate-list length; set it near the median interval width.
    */
  def bucketed(points: DataFrame, pointCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    val binnedPoints = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val binnedIntervals = intervals
      .withColumn("_bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    binnedPoints.join(binnedIntervals, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** q30: orders priced into value bands (non-uniform widths, so the
    * band is not derivable by arithmetic — a genuine interval lookup).
    */
  def q30RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val bands = Seq(
      ("micro", 0.0, 9999.99),
      ("small", 10000.0, 49999.99),
      ("mid", 50000.0, 149999.99),
      ("large", 150000.0, 299999.99),
      ("jumbo", 300000.0, 10000000.0)
    ).toDF("band", "lo", "hi")
    bucketed(t.orders.select("o_orderkey", "o_totalprice"), "o_totalprice",
        bands, "lo", "hi", binWidth = 25000.0)
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
      .orderBy("band")
  }
}
