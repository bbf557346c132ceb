package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Lake-layout writers (SURVEY.md §5).
  *
  * At 100 TB the write layout decides every future read: directory
  * partitioning gives coarse pruning (PartitionFilters — entire
  * directories never listed), and within-file sorting tightens parquet
  * min/max row-group statistics for fine pruning. These wrappers
  * encode that discipline.
  */
object Writers {

  /** Hive-style partitioned parquet write. `partitionCols` become
    * directory levels — queries filtering on them prune at the listing
    * step, before any I/O.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Partitioned + sorted-within-partitions write: coarse directory
    * pruning plus tight row-group min/max stats on `sortCols`.
    */
  def writePartitionedSorted(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Events laid out for time-ranged queries: partitioned by event
    * date, sorted by (event_type, ts) within files.
    */
  def writeEventsLake(events: DataFrame, path: String): Unit =
    writePartitionedSorted(
      events.withColumn("event_date", to_date(col("ts"))),
      path, Seq("event_date"), Seq("event_type", "ts"))

  /** x08: small-files compaction — rewrite a parquet directory into
    * ≈`targetBytes` files. At lake scale small files are the silent
    * killer: listing dominates planning, each file costs a task, and
    * fragmented row groups defeat min/max pruning. Sizing comes from
    * the actual on-disk bytes (not row counts), the rewrite is one
    * `repartition` shuffle to evenly-sized outputs, and the swap reuses
    * the staging+rename publish, so a crash mid-compaction leaves the
    * original directory intact. Run it per partition directory on a
    * partitioned lake — each directory compacts independently, so the
    * shuffle never exceeds one partition's data.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_")
    }
    val before = dataFiles.length
    val totalBytes = dataFiles.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    graft.operators.Merge.publish(
      spark.read.parquet(path).repartition(n), path)
    (before, n)
  }
}
