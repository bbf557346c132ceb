package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The per-URL response-validator ledger — ONE implementation shared
  * by every conditional-fetch surface (the crawl service's content /
  * robots / sitemap drains in [[graft.streaming.Streams]], and the
  * f17 conditional paged sync in [[PagedSource]]). A 200 whose
  * response carried an ETag/Last-Modified appends a
  * `(url, etag, last_modified)` row; the next cycle reads the ledger
  * back (latest row per URL wins) and sends If-None-Match (the strong
  * validator servers prefer) or If-Modified-Since, so an unchanged
  * resource answers 304 with zero body bytes.
  *
  * Layout: `<root>/batch=<seq>` append dirs keyed by a MONOTONIC
  * write sequence (max existing id + 1) — never a caller's batch id,
  * whose namespaces (producer vs index-expansion) are not in write
  * order. Replay contract: a crash-replayed writer appends identical
  * rows at a NEW seq; latest-wins reads them identically and
  * [[compact]] folds the duplicate away. Fold keeps the per-cycle
  * read O(recent) over a long-lived service instead of O(every write
  * ever).
  */
object ValidatorLedger {

  /** The ledger's CURRENT state: latest captured (etag, last_modified)
    * per URL across `batch=*` dirs, latest-wins by seq. Columns
    * prefixed `led_` so the caller's join never collides. Empty frame
    * when no ledger exists yet.
    */
  def latest(spark: SparkSession, ledgerRoot: String): DataFrame = {
    val ids = graft.operators.Dedup.listBatchIds(spark, ledgerRoot)
      .filter(_ >= 0)
    if (ids.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "url STRING, led_etag STRING, led_last_modified STRING"))
    else
      spark.read
        .schema("url STRING, etag STRING, last_modified STRING, " +
          "batch BIGINT")
        .option("basePath", ledgerRoot)
        .parquet(ids.map(i => s"$ledgerRoot/batch=$i"): _*)
        // latest-wins: struct max orders on batch first; the string
        // fields break (impossible within one well-formed batch) ties
        // deterministically
        .groupBy("url")
        .agg(max(struct(col("batch"), col("etag"),
          col("last_modified"))).as("v"))
        .select(col("url"), col("v.etag").as("led_etag"),
          col("v.last_modified").as("led_last_modified"))
  }

  /** Append captured validators at the next free seq. `caps` must
    * carry (url, etag, last_modified); an empty frame writes nothing
    * (no empty dirs on idle cycles). Callers are serialized per
    * service tick, so the max-plus-one allocation cannot race.
    */
  def appendSeq(caps: DataFrame, ledgerRoot: String): Unit =
    appendAtFreshSeq(caps.select("url", "etag", "last_modified"),
      ledgerRoot)

  /** Append `rows` at the root's fresh `batch=<max existing + 1>` seq
    * in ONE job: the write carries an Observation counting rows, and
    * a zero-row append deletes its own empty dir afterward (the old
    * isEmpty guard cost a second evaluation job per drain). A crash
    * inside the delete window leaves one empty dir — every ledger
    * read carries an explicit schema, so it reads as zero rows and
    * the next compact folds it away. ONE definition shared by the
    * validator and announcement ledgers (review r19 wave 2 #3), so
    * their crash-window semantics cannot silently diverge; optional
    * `partitionCols` keep bucketed layouts (the announce ledger's
    * `kb=`).
    */
  private[graft] def appendAtFreshSeq(rows: DataFrame, root: String,
      partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val spark = rows.sparkSession
    val seq = (graft.operators.Dedup
      .listBatchIds(spark, root).filter(_ >= 0) :+ -1L).max + 1
    val obs = org.apache.spark.sql.Observation()
    val observed = rows.observe(obs, count(lit(1)).as("_n"))
    val arranged =
      if (partitionCols.isEmpty) observed
      else observed.repartition(partitionCols.map(col): _*)
    val w = arranged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(s"$root/batch=$seq")
    if (obs.get("_n").asInstanceOf[Long] == 0L) {
      val p = new org.apache.hadoop.fs.Path(s"$root/batch=$seq")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  /** Fold the ledger's seq dirs into ONE latest-wins dir at a FRESH
    * seq (`max + 1`). Safe at any time: writes only APPEND at fresh
    * seqs, so nothing ever Overwrites a folded directory. Crash-safe
    * at every window (VERDICT r17 #1 — the old fold Overwrote the max
    * existing dir, and a crash mid-Overwrite erased the only durable
    * copy of the newest states): the merged rows stage under a
    * dot-prefixed sibling (invisible to `batch=` listings), RENAME
    * atomically to the fresh seq, and only then do the folded dirs
    * drop — a crash before the rename leaves the ledger untouched, a
    * crash after it leaves duplicates that latest-wins reads
    * correctly. The stale staging a crash leaves is deleted (and the
    * fold redone) by the next compact call.
    *
    * Filesystem assumption (ADVICE r18 #1): the crash-safety argument
    * hinges on `fs.rename` of the staging DIRECTORY being atomic —
    * true on HDFS and local/POSIX filesystems. On object-store
    * connectors where rename is copy+delete (e.g. S3A without a
    * committer layer), the guarantee degrades to the torn window this
    * fold exists to close; run ledgers there over an HDFS/ABFS-class
    * path or an atomic-rename layer. The same assumption (and remedy)
    * applies to every `.fold.stg` sibling in the codebase — the
    * announce/robots ledger folds and `swapWrite`.
    */
  def compact(spark: SparkSession, ledgerRoot: String,
      minBatches: Int = 64): Unit = {
    val foldable = graft.operators.Dedup.listBatchIds(spark, ledgerRoot)
      .filter(_ >= 0).sorted
    // fold strictly past the threshold — the announce/robots ledgers'
    // cadence, so the one compactPastBatches knob means one thing
    if (foldable.length <= minBatches) return
    val p = new org.apache.hadoop.fs.Path(ledgerRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stg = new org.apache.hadoop.fs.Path(p, ".fold.stg")
    fs.delete(stg, true)
    spark.read
      .schema("url STRING, etag STRING, last_modified STRING, " +
        "batch BIGINT")
      .option("basePath", ledgerRoot)
      .parquet(foldable.map(i => s"$ledgerRoot/batch=$i"): _*)
      .groupBy("url")
      .agg(max(struct(col("batch"), col("etag"),
        col("last_modified"))).as("v"))
      .select(col("url"), col("v.etag").as("etag"),
        col("v.last_modified").as("last_modified"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(stg.toString)
    val target = new org.apache.hadoop.fs.Path(p,
      s"batch=${foldable.max + 1}")
    if (!fs.rename(stg, target))
      throw new java.io.IOException(
        s"ValidatorLedger.compact: cannot promote $stg to $target")
    foldable.foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s"batch=$id"), true))
  }
}
