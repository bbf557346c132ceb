package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY.md §5).
  *
  * The biggest recurring cost at 100 TB is re-shuffling the same fact
  * tables on the same join key for every query. Bucketing pays that
  * shuffle once at write time: both sides stored bucketed by the join
  * key join with ZERO exchanges afterwards. This module wraps the
  * write-side (bucketBy into a managed table) and gives the spec a
  * handle to assert the shuffle-free plan.
  */
object Bucketing {

  /** Write `df` as a managed table bucketed by `key` (sorted within
    * buckets, so the downstream join is also sort-free).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket keys — Catalyst sees the
    * matching bucketing and plans a SortMergeJoin with no Exchange on
    * either side.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
