package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
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

  /** Spread the low 16 bits of `c` to even bit positions (the Morton
    * interleave half-step), as codegen'd bitwise Columns.
    */
  private def spread16(c: Column): Column = {
    var v = c.bitwiseAND(lit(0xffffL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00ff00ffL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0f0f0f0fL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton (Z-order) value of two 16-bit normalized ranks. */
  def zValue(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** x09: Z-order clustered write — range-partition and sort by the
    * Morton interleave of two columns' normalized ranks, so parquet
    * min/max stats stay tight on BOTH columns at once and either
    * predicate prunes row groups (a lexicographic sort only serves its
    * leading column). The min/max normalization pass is one cheap
    * scalar aggregate; the write is one range shuffle. This is the
    * layout move for fact tables queried by two independent selective
    * dimensions (user × time, key × date).
    */
  def writeZOrdered(df: DataFrame, path: String,
      colA: String, colB: String, numFiles: Int = 16): Unit = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    if (r.isNullAt(0)) { // empty input: nothing to cluster, write as-is
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val (loA, hiA, loB, hiB) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    def rank16(c: Column, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      else ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0))
        .cast("long")
    val z = zValue(rank16(col(colA), loA, hiA), rank16(col(colB), loB, hiB))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

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
    val all = fs.listStatus(p).filterNot { st =>
      val n = st.getPath.getName
      n.startsWith(".") || n.startsWith("_")
    }
    // ENFORCE the per-partition-directory contract the docstring
    // states: on a partitioned table ROOT the top-level listing sees
    // only directories, totalBytes would be 0, and the rewrite would
    // silently flatten the whole table into one unpartitioned file —
    // destroying directory pruning in a single "maintenance" call
    val subdirs = all.filter(_.isDirectory).map(_.getPath.getName)
    require(subdirs.isEmpty,
      s"compact($path): directory contains subdirectories " +
        s"(${subdirs.take(3).mkString(", ")}…) — run compact per " +
        "partition directory; compacting a partitioned root would " +
        "flatten its layout")
    val dataFiles = all.filter(_.isFile)
    val before = dataFiles.length
    val totalBytes = dataFiles.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    graft.operators.Merge.publish(
      spark.read.parquet(path).repartition(n), path)
    (before, n)
  }
}
