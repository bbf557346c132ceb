package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** x12: versioned table snapshots over plain parquet — publish keeps
  * the last N versions readable, giving rollback and audit reads
  * without a table format. (Delta/Iceberg make this metadata-native;
  * this is the portable construction from two primitives: complete
  * directories and atomic renames.)
  *
  * Layout: `<table>/_v<N>/` data directories plus a `<table>/_LATEST`
  * pointer file containing N.
  *
  * Crash safety, step by step: a new version writes to `_v<N>.staging`
  * and renames to `_v<N>` only when complete, so no reader or fallback
  * scan ever sees a partial version; the pointer swap writes
  * `_LATEST.tmp` then renames over the old pointer. A crash anywhere
  * leaves the previous version live (pointer untouched) or, in the
  * instant the pointer is being replaced, readers fall back to the
  * highest complete version directory — which at that point is the new
  * one. Pruning never removes the version the pointer names.
  */
object Snapshots {

  private val PointerName = "_LATEST"
  private val VersionPrefix = "_v"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Complete (non-staging) version numbers, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(VersionPrefix) &&
        !st.getPath.getName.endsWith(".staging"))
      .flatMap(st => st.getPath.getName.stripPrefix(VersionPrefix).toLongOption)
      .sorted
  }

  /** The pointer's version; falls back to the highest complete version
    * directory when the pointer is mid-swap or lost. The open itself
    * may race a concurrent pointer swap (exists-then-deleted), so a
    * missing file at either step takes the fallback, as documented.
    */
  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val f = fs(spark, path)
    val ptr = new Path(path, PointerName)
    val fromPointer =
      try {
        val in = f.open(ptr)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    fromPointer.orElse(versions(spark, path).lastOption)
  }

  /** Publish `df` as the next version and swap the pointer. Returns
    * the new version number. `keep` ≥ 1 bounds retained versions
    * (older ones are pruned after the swap).
    */
  def publish(df: DataFrame, path: String, keep: Int = 3): Long = {
    require(keep >= 1, s"keep $keep must be >= 1")
    val spark = df.sparkSession
    val f = fs(spark, path)
    // next must clear BOTH the pointer and the highest version dir: a
    // crash after the version rename but before the pointer swap leaves
    // an orphaned _v<N> above the pointer, and renaming onto it would
    // nest the new staging dir inside it (Hadoop rename-into-existing)
    val next = math.max(
      latestVersion(spark, path).getOrElse(0L),
      versions(spark, path).lastOption.getOrElse(0L)) + 1
    val staging = new Path(path, s"$VersionPrefix$next.staging")
    val live = new Path(path, s"$VersionPrefix$next")
    f.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (!f.rename(staging, live))
      throw new java.io.IOException(s"snapshot: cannot promote $staging")
    // pointer swap: tmp write + rename; delete-then-rename because
    // HDFS rename does not overwrite
    val ptr = new Path(path, PointerName)
    val tmp = new Path(path, PointerName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    f.delete(ptr, false)
    if (!f.rename(tmp, ptr))
      throw new java.io.IOException(s"snapshot: cannot swap pointer for $path")
    versions(spark, path).dropRight(keep).foreach { v =>
      f.delete(new Path(path, s"$VersionPrefix$v"), true)
    }
    next
  }

  /** Read a specific retained version. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame =
    spark.read.parquet(s"$path/$VersionPrefix$version")

  /** Read the published version. */
  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(spark, path).getOrElse(
      throw new java.io.FileNotFoundException(s"no published version at $path"))
    readVersion(spark, path, v)
  }
}
