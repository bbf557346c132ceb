package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch-based approximate aggregates — the 100 TB path for distinct
  * counts and quantiles, where the exact versions (q08, q27) shuffle
  * every distinct value / hold full sort runs. HLL++ and quantile
  * summaries are mergeable, so partials combine map-side and shuffle
  * volume is O(sketch size), not O(data).
  */
object Approx {

  /** q28: approximate distinct parts per return flag, with the exact
    * count alongside (HLL++ merge is commutative → deterministic for
    * fixed data regardless of partition order; rsd 5% default).
    */
  def q28ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")
  }

  /** q28's bench shape: the HLL++ sketch ALONE. The combined demo above
    * stays the correctness entry (the spec asserts approx within rsd of
    * exact), but as a bench row it mostly measured the exact
    * countDistinct expand — the very cost the sketch exists to avoid at
    * 100 TB. This row times the mergeable-sketch path by itself.
    */
  def q28BenchSketch(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")
  }

  /** Approximate percentiles via quantile summaries (accuracy param =
    * 1/relative-error). Not in the oracle set: the summary's merge is
    * partition-order sensitive at the margin, unlike HLL.
    */
  def approxPercentiles(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("approx_pcts"))
      .orderBy("l_returnflag")
  }
}
