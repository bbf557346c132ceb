package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side MERGE (upsert/delete) semantics over plain parquet —
  * q25 is the read-side "latest per key"; this is the table-maintenance
  * counterpart (what Delta/Iceberg MERGE INTO does, expressed as a
  * relational rewrite for format-agnostic lakes).
  *
  * The rewrite is one full-outer join on the key: matched rows take the
  * update, unmatched-source rows insert, unmatched-target rows persist
  * (or drop, for delete keys). At 100 TB the join shuffles both sides
  * once on the key — partition the table by a key prefix and rewrite
  * only affected partitions to avoid the full-table cost: that
  * partition-confined form is implemented (and crash-safety-spec'd) by
  * [[graft.streaming.Streams.upsertBatchPartitioned]], which works as
  * a batch upsert as well as st07's micro-batch body.
  */
object Merge {

  /** Upsert `updates` into `target` by `key`: update-on-match,
    * insert-on-miss. Columns must match by name.
    */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = target.columns
    // prefix-rename the update side instead of dataset-qualified refs:
    // replayed merges put `updates` in both lineages, and qualified
    // refs then trip the ambiguous-self-join detector
    val u = updates.select(cols.map(c => col(c).as(s"_u_$c")): _*)
    target.join(u, col(key) === col(s"_u_$key"), "full_outer")
      .select(cols.map(c => coalesce(col(s"_u_$c"), col(c)).as(c)): _*)
  }

  /** Delete keys from `target`. */
  def delete(target: DataFrame, keys: DataFrame, key: String): DataFrame =
    target.join(keys, Seq(key), "left_anti")

  /** x14: incremental aggregate maintenance — merge a delta's partial
    * aggregates into a materialized aggregate table by summation:
    * union the partials and re-reduce per key, touching only
    * |agg| + |delta-agg| rows instead of rescanning the base fact
    * table. This is the refresh step of a materialized view: at 100 TB
    * the base scan is the cost you're avoiding, and correctness is
    * exactly "merged partials == full recompute" (oracle-checked via
    * q38). `sumCols` must be SUM-mergeable partials (decimal sums,
    * counts-as-longs) aligned by name in both inputs; other monoids
    * (min/max) need their own reduce and are not served by this
    * helper.
    */
  def refreshAgg(baseAgg: DataFrame, deltaAgg: DataFrame,
      key: String, sumCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty, "refreshAgg needs at least one measure column")
    baseAgg.unionByName(deltaAgg)
      .groupBy(key)
      .agg(sum(sumCols.head).as(sumCols.head),
        sumCols.tail.map(c => sum(c).as(c)): _*)
  }

  /** Atomically publish a merged table: write to a staging path, then
    * swap via two directory renames (parquet has no transactions;
    * staging-and-swap is the portable pattern, table formats make it
    * metadata-only). A failure during the staging write leaves the
    * published table untouched; the swap itself is two metadata-only
    * renames, so the window with no table present is microseconds, and
    * a crash inside it leaves the previous version recoverable at
    * `<path>.prev`. Because the full write happens before the target
    * moves, `merged` may safely read from `path` itself (the natural
    * upsert-then-publish flow) — the input is consumed before the swap.
    */
  def publish(merged: DataFrame, path: String): Unit = {
    val spark = merged.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val staging = new Path(path + ".staging")
    val prev = new Path(path + ".prev")
    fs.delete(staging, true)
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // swap: old version aside, staging in, old version dropped
    fs.delete(prev, true)
    if (fs.exists(target) && !fs.rename(target, prev))
      throw new java.io.IOException(s"publish: cannot move $target aside")
    if (!fs.rename(staging, target)) {
      // restore the previous version rather than leaving no table
      if (fs.exists(prev)) fs.rename(prev, target)
      throw new java.io.IOException(s"publish: cannot promote $staging")
    }
    fs.delete(prev, true)
  }
}
