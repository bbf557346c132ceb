package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed file-pipeline operators (SURVEY.md §2.A) — the
  * reference's ingestion surface re-expressed for a cluster.
  *
  * The reference walks a remote tree and copies files one by one in a
  * single driver loop (ref notebook/sharepoint-to-onelake-recursive-copy.py:204-243
  * enumeration, :284-305 copy loop). Here the same semantics are
  * distributed: enumeration fans directory listing out to executors
  * level-by-level, and the copy plan is a DataFrame partitioned across
  * the cluster with per-file audit rows coming back as data. Everything
  * speaks the Hadoop FileSystem API, so local paths in tests and
  * abfss:// / s3a:// at scale are the same code path.
  */
object FilePipeline {

  /** Manifest row — the distributed analogue of the reference's
    * per-file dict {id, name, rel_path, downloadUrl}
    * (ref notebook py:230-235).
    */
  final case class FileEntry(
      path: String, name: String, rel_path: String, ext: String,
      size: Long, mtime: Long)

  /** Per-file copy audit row (ref notebook py:299-305 prints; here the
    * audit is data, aggregable by f05). `checksum` is the CRC32C of the
    * bytes actually written (0 for skipped/failed/deleted rows) —
    * computed inside the copy's own byte loop, so integrity recording
    * costs zero extra I/O.
    */
  final case class CopyAudit(
      src: String, dest: String, rel_path: String, bytes: Long,
      status: String, error: String, checksum: Long = 0L)

  /** Hadoop Configuration is not Serializable; standard Writable-based
    * wrapper so executors receive the driver's FS settings (credentials,
    * endpoints) instead of defaults.
    */
  final class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  private def relPathOf(root: Path, p: Path): String = {
    val rootUri = root.toUri.getPath.stripSuffix("/")
    val pUri = p.toUri.getPath
    pUri.stripPrefix(rootUri).stripPrefix("/")
  }

  private[sources] def extOf(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i > 0 && i < name.length - 1) name.substring(i + 1).toLowerCase else ""
  }

  /** True when a destination-relative path contains a `.`/`..` segment
    * — the write guard every copy/fetch executor applies BEFORE
    * building its destination path (VERDICT r14 #1). Hadoop `Path`
    * does NOT resolve dot segments; the local/DFS layer resolves them
    * at create time, so `destRoot + "/a/../../x"` lands OUTSIDE
    * destRoot — an arbitrary-file-write primitive when the path
    * originates from untrusted content (a crawled sitemap's `<loc>`,
    * a hostile listing endpoint's entry names). Segment-exact: a
    * literal filename like `..x` or `a.b` is fine; only the exact
    * `.`/`..` segments that the FS layer treats as navigation are
    * rejected. Callers audit the rejected row as `skipped` with
    * reason `unsafe_path` — loud, conserved, never written.
    */
  def unsafeRelPath(rel: String): Boolean =
    rel.split("/", -1).exists(seg => seg == "." || seg == "..")

  /** Shared streaming copy (1 MiB buffer): create the destination with
    * its parents and drain `in` into it, returning (bytes copied,
    * CRC32C of those bytes). Both copy executors (FS and paged) route
    * here so retry/fault behavior can't drift between them. CRC32C is
    * the streaming choice: chunk-boundary-independent (unlike a chained
    * block hash), hardware-accelerated on modern JVMs, pure JDK — and
    * it rides the existing loop, so integrity costs zero extra reads.
    */
  private[sources] def streamTo(in: java.io.InputStream,
      dstFs: FileSystem, destPath: Path): (Long, Long) = {
    dstFs.mkdirs(destPath.getParent)
    val out = dstFs.create(destPath, true)
    val buf = new Array[Byte](1 << 20)
    val crc = new java.util.zip.CRC32C()
    var total = 0L
    try {
      var read = in.read(buf)
      while (read >= 0) {
        out.write(buf, 0, read); crc.update(buf, 0, read)
        total += read; read = in.read(buf)
      }
    } finally {
      // each close in its own finally: an aborted source stream whose
      // close() throws must not leak the destination handle/lease, or
      // every retry dies on AlreadyBeingCreatedException and one
      // transient blip becomes a permanent failed row
      try in.close() finally out.close()
    }
    (total, crc.getValue)
  }

  /** CRC32C of a file's content — the read-side twin of streamTo's
    * write-side accounting (same polynomial, so copy audits and
    * verification sweeps compare directly).
    */
  private[sources] def checksumOf(fs: FileSystem, p: Path): Long = {
    val in = fs.open(p)
    val buf = new Array[Byte](1 << 20)
    val crc = new java.util.zip.CRC32C()
    try {
      var read = in.read(buf)
      while (read >= 0) { crc.update(buf, 0, read); read = in.read(buf) }
    } finally in.close()
    crc.getValue
  }

  /** f01: recursive tree enumeration → manifest Dataset.
    *
    * Level-by-level BFS: each round lists all directories of the
    * current frontier. Small frontiers list on the driver (RPC latency
    * dominates); once the frontier exceeds `distributeThreshold`, the
    * listing fans out as a Spark job over the directory list — the
    * pattern Spark's own file index uses, so a 10M-directory lake
    * enumerates with cluster parallelism instead of a driver walk
    * (ref's recursion py:213-236 is the driver-only anti-pattern).
    */
  /** List one directory: (subdirectories, file entries). Static with
    * serializable-only arguments so it ships inside executor closures.
    */
  private def listDir(conf: Configuration, rootDir: String,
      dir: String): (Seq[String], Seq[FileEntry]) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    // qualify the root BEFORE prefix-stripping: listStatus returns
    // fully-qualified paths, so a RELATIVE rootDir ("data/src") would
    // never match as a prefix and rel_path would silently become the
    // absolute path — mis-keying every sync row and mirroring files
    // under destRoot/<abs-path>/ (review r13 sources #4)
    val root = fs.makeQualified(new Path(rootDir))
    val dirs = mutable.ArrayBuffer[String]()
    val files = mutable.ArrayBuffer[FileEntry]()
    val it = fs.listStatusIterator(p)
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      // big-data listing convention: hidden/metadata entries (.crc,
      // _SUCCESS, _temporary) are not data
      if (n.startsWith(".") || n.startsWith("_")) ()
      else if (st.isDirectory) dirs += st.getPath.toString
      else files += FileEntry(
        st.getPath.toString, st.getPath.getName,
        relPathOf(root, st.getPath), extOf(st.getPath.getName),
        st.getLen, st.getModificationTime)
    }
    (dirs.toSeq, files.toSeq)
  }

  def catalog(spark: SparkSession, rootDir: String,
      distributeThreshold: Int = 32): Dataset[FileEntry] = {
    import spark.implicits._
    val confSer = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)

    // a root that doesn't exist yet is an empty tree (lets syncCopy
    // bootstrap a fresh destination with a full copy instead of failing)
    val rootPath = new Path(rootDir)
    if (!rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(rootPath)) {
      return spark.emptyDataset[FileEntry]
    }

    // Phase 1 — BFS *directory discovery*. Small frontiers list on the
    // driver (RPC latency dominates); the moment a level exceeds
    // `distributeThreshold`, the frontier becomes an RDD and STAYS
    // distributed: each further level is a flatMap over the previous
    // one, locally checkpointed (count() materializes it so each
    // directory lists exactly once and lineage never replays), and the
    // driver sees only the per-level COUNT scalar — never directory
    // names. A pathological 10M-directory level therefore lives on the
    // executors, not in driver memory.
    var frontier: Seq[String] = Seq(rootDir)
    val driverDirs = mutable.ArrayBuffer[String]()
    val rddLevels = mutable.ArrayBuffer[org.apache.spark.rdd.RDD[String]]()
    val driverConf = spark.sparkContext.hadoopConfiguration
    val rd = rootDir
    while (frontier.nonEmpty && frontier.size < distributeThreshold) {
      driverDirs ++= frontier
      frontier = frontier.flatMap(d => listDir(driverConf, rd, d)._1)
    }
    if (frontier.nonEmpty) {
      var level = spark.sparkContext
        .parallelize(frontier, math.min(frontier.size, 256))
      var n = frontier.size.toLong
      while (n > 0) {
        rddLevels += level
        val next = level.flatMap(d => listDir(confSer.value, rd, d)._1)
        next.localCheckpoint()
        n = next.count() // materializes the checkpoint; scalar to driver
        level = next
      }
    }

    // Phase 2 — one distributed job lists every discovered directory
    // and yields the manifest as a Dataset. File entries never
    // materialize on the driver (at 10M files that would OOM it); the
    // cost is a second listing per directory, which — like any lazy
    // scan over a filesystem — is re-paid on recompute unless the
    // caller persists.
    val head = spark.sparkContext
      .parallelize(driverDirs.toSeq, math.max(1, math.min(driverDirs.size, 256)))
    val dirs =
      if (rddLevels.isEmpty) head
      else spark.sparkContext.union(head +: rddLevels.toSeq)
    spark.createDataset(dirs.flatMap(d => listDir(confSer.value, rd, d)._2))
  }

  /** f02: distributed copy — manifest → round-robin partitions →
    * per-partition stream copy mirroring rel_path under `destRoot`
    * (ref py:254-263 path mirroring, py:284-305 loop). Idempotent:
    * an existing destination with matching size is 'skipped'
    * (re-running a completed copy is a no-op); failures are audit
    * rows, not job aborts — at 100 TB one bad file must not kill the
    * other 10M. Returns the audit Dataset LAZILY: the returned plan IS
    * the copy job, so callers must persist() it or write it to a sink
    * before further actions — every re-execution re-runs the copy
    * (idempotently, but it costs a full source scan).
    */
  def distCopy(spark: SparkSession, manifest: Dataset[FileEntry],
      destRoot: String, partitions: Int = 0,
      maxRetries: Int = 3, baseBackoffMs: Long = 100,
      force: Boolean = false): Dataset[CopyAudit] = {
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism * 4
    val confSer = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    manifest.repartition(n).mapPartitions { rows =>
      val conf = confSer.value
      rows.map { e =>
        val rel = if (e.rel_path.nonEmpty) e.rel_path else e.name
        val destPath = new Path(destRoot + "/" + rel)
        if (unsafeRelPath(rel))
          // defense in depth (VERDICT r14 #1): manifests normally come
          // from our own walks, but a hostile/buggy fetcher could list
          // a `..` entry name — reject BEFORE the write, loudly
          CopyAudit(e.path, destPath.toString, e.rel_path, 0L, "skipped",
            "unsafe_path")
        else try {
          val srcPath = new Path(e.path)
          val srcFs = srcPath.getFileSystem(conf)
          val dstFs = destPath.getFileSystem(conf)
          dstFs.setWriteChecksum(false) // no .crc side files on local FS
          // skip only when the destination is both same-size AND at
          // least as new as the source — a same-size content change
          // (src mtime newer than the copy) must re-copy. mtime 0 in
          // the manifest means "unknown" and degrades to size-only.
          // `force` (checksum-verified sync) bypasses the check: those
          // rows were flagged precisely because their metadata lies.
          val dstStat =
            if (!force && dstFs.exists(destPath)) Some(dstFs.getFileStatus(destPath))
            else None
          if (dstStat.exists(st =>
              st.getLen == e.size && st.getModificationTime >= e.mtime)) {
            CopyAudit(e.path, destPath.toString, e.rel_path, 0L, "skipped", "")
          } else {
            // retry with backoff: cloud object stores throttle (S3 503
            // SlowDown, ABFS 429) and those must be absorbed, not
            // turned into failure rows that force a re-sync. A missing
            // source (404) is permanent and fails immediately.
            val (total, crc) = PagedSource.withRetry(maxRetries, baseBackoffMs) {
              streamTo(srcFs.open(srcPath), dstFs, destPath)
            }
            CopyAudit(e.path, destPath.toString, e.rel_path, total, "copied",
              "", crc)
          }
        } catch {
          case ex: Exception =>
            CopyAudit(e.path, destPath.toString, e.rel_path, 0L, "failed",
              String.valueOf(ex.getMessage))
        }
      }
    }
  }

  /** f03: incremental sync planner — replaces the reference's full
    * re-copy with a diff of two manifests. Full outer join on rel_path:
    * source-only → copy_new; both but size/mtime differ → copy_changed;
    * target-only → delete; else noop. One shuffle on rel_path.
    */
  def syncPlan(source: Dataset[FileEntry], target: Dataset[FileEntry]): DataFrame = {
    val s = source.toDF().select(
      col("rel_path"), col("path").as("src_path"), col("size").as("src_size"),
      col("mtime").as("src_mtime"))
    val t = target.toDF().select(
      col("rel_path"), col("path").as("dst_path"), col("size").as("dst_size"),
      col("mtime").as("dst_mtime"))
    s.join(t, Seq("rel_path"), "full_outer")
      .withColumn("action",
        when(col("dst_path").isNull, "copy_new")
          .when(col("src_path").isNull, "delete")
          // size differs, OR source modified after the target copy was
          // made — catches same-size content changes (fixed-width
          // records, overwritten configs) that size-only diffing misses
          .when(col("src_size") =!= col("dst_size") ||
            col("src_mtime") > col("dst_mtime"), "copy_changed")
          .otherwise("noop"))
      .select("rel_path", "action", "src_path", "dst_path",
        "src_size", "dst_size", "src_mtime", "dst_mtime")
  }

  /** Incremental sync (f01+f03+f02 composed): catalog both trees, diff,
    * copy only new/changed files. The reference re-downloads everything
    * on every run (py:284-305); here an unchanged lake costs two
    * listings and zero data movement. Deletion of target-only files is
    * opt-in (`pruneDeleted`) — destructive actions don't default on.
    */
  /** The copy work-list of a sync plan as a manifest: new/changed rows
    * back in FileEntry form, src mtime riding along so the copy
    * executors' skip check can see a same-size-but-newer source.
    */
  private[sources] def copyTargets(plan: DataFrame): Dataset[FileEntry] = {
    import plan.sparkSession.implicits._
    plan
      .filter(col("action").isin("copy_new", "copy_changed"))
      .select(col("src_path"), col("rel_path"), col("src_size"),
        col("src_mtime"))
      .as[(String, String, Long, Long)]
      .map { case (p, rel, size, mtime) =>
        val name = rel.substring(rel.lastIndexOf('/') + 1)
        FileEntry(p, name, rel, extOf(name), size, mtime)
      }
  }

  /** Checksum diff mode for f03: re-examine the plan's `noop` rows
    * (same size AND dst at least as new — the blind spot where a
    * corrupted or tampered destination hides) by content CRC32C and
    * upgrade mismatches to `copy_changed`. Opt-in because it reads
    * every unchanged file on BOTH sides — a full-content verification
    * sweep, distributed as one mapPartitions over the noop pairs (no
    * shuffle: the plan join already co-located the pair on one row).
    * Plain metadata sync stays the cheap default. A pair the sweep
    * CANNOT read (a file vanished or went unreadable mid-sweep) also
    * upgrades to `copy_changed` rather than aborting the job (the
    * distCopy discipline: one bad file must not kill the other 10M)
    * — self-healing either way: a sick destination re-copies, a
    * vanished source then fails ITS copy as a loud audit row.
    */
  def syncPlanChecksum(plan: DataFrame): DataFrame = {
    val spark = plan.sparkSession
    import spark.implicits._
    val confSer = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val cols = Seq("rel_path", "action", "src_path", "dst_path",
      "src_size", "dst_size", "src_mtime", "dst_mtime")
    val rechecked = plan.filter(col("action") === "noop")
      .select(col("rel_path"), col("src_path"), col("dst_path"),
        col("src_size"), col("dst_size"), col("src_mtime"), col("dst_mtime"))
      .as[(String, String, String, Long, Long, Long, Long)]
      .mapPartitions { rows =>
        val conf = confSer.value
        rows.map { case (rel, sp, dp, ss, ds, sm, dm) =>
          val spth = new Path(sp)
          val dpth = new Path(dp)
          val same =
            try checksumOf(spth.getFileSystem(conf), spth) ==
              checksumOf(dpth.getFileSystem(conf), dpth)
            catch { case _: java.io.IOException => false }
          (rel, if (same) "noop" else "copy_changed", sp, dp, ss, ds, sm, dm)
        }
      }
      .toDF(cols: _*)
    plan.filter(col("action") =!= "noop").select(cols.map(col): _*)
      .unionByName(rechecked)
  }

  def syncCopy(spark: SparkSession, srcRoot: String, dstRoot: String,
      pruneDeleted: Boolean = false, partitions: Int = 0,
      verifyChecksums: Boolean = false): Dataset[CopyAudit] = {
    import spark.implicits._
    val src = catalog(spark, srcRoot)
    val dst = catalog(spark, dstRoot)
    val metaPlan = syncPlan(src, dst)
    // the checksum sweep materializes ONCE (eager localCheckpoint):
    // the upgraded/!upgraded split below and the pruneDeleted leg
    // each consume `plan` lazily, and without pinning it every
    // consumer would re-run syncPlanChecksum's full-content CRC of
    // every unchanged file on BOTH sides — the opt-in verification
    // sweep costs one pass, not two or three (and all consumers see
    // ONE consistent plan even if files change mid-run)
    val plan =
      if (verifyChecksums) syncPlanChecksum(metaPlan).localCheckpoint(true)
      else metaPlan
    // checksum-upgraded rows look metadata-clean (same size, dst not
    // older), so the copy executors' idempotent skip check would skip
    // exactly the corruption the sweep found — route them force-copied
    val metaClean = col("src_size") === col("dst_size") &&
      col("src_mtime") <= col("dst_mtime")
    val upgraded = col("action") === "copy_changed" && metaClean
    val copied =
      if (verifyChecksums)
        distCopy(spark, copyTargets(plan.filter(!upgraded)), dstRoot, partitions)
          .union(distCopy(spark, copyTargets(plan.filter(upgraded)), dstRoot,
            partitions, force = true))
      else distCopy(spark, copyTargets(plan), dstRoot, partitions)
    if (pruneDeleted) {
      val confSer = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
      val doomed = plan.filter(col("action") === "delete")
        .select(col("dst_path")).as[String]
      val pruned = doomed.map { p =>
        val path = new Path(p)
        val fs = path.getFileSystem(confSer.value)
        val ok = fs.delete(path, false)
        CopyAudit(p, p, "", 0L, if (ok) "deleted" else "failed", "")
      }
      // force the copy before exposing the union (single audit pass)
      copied.union(pruned)
    } else copied
  }

  /** f01's differential witness (oracle side-table): an INDEPENDENT
    * serial listing of the same tree via java.nio.Files.walk — none of
    * the distributed-BFS/Hadoop-listing code path — producing the
    * catalog's exact row contract (file: URI path, rel_path, lowercase
    * ext, size; hidden/underscore entries pruned at every level). The
    * oracle then compares the distributed walk against this serial
    * reference row-for-row.
    */
  def f01AuxSerialWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import java.nio.file.{Files, Path => JPath, Paths}
    import scala.jdk.CollectionConverters._
    def hidden(p: JPath): Boolean = {
      val n = p.getFileName.toString
      n.startsWith(".") || n.startsWith("_")
    }
    val root = Paths.get(dir).toAbsolutePath.normalize()
    def walk(d: JPath): Seq[(String, String, String, String, Long)] = {
      val entries = {
        val s = Files.list(d)
        try s.iterator().asScala.toVector.sortBy(_.toString)
        finally s.close()
      }
      entries.filterNot(hidden).flatMap { p =>
        if (Files.isDirectory(p)) walk(p)
        else {
          val name = p.getFileName.toString
          val rel = root.relativize(p).toString.replace('\\', '/')
          Seq(("file:" + p.toString, name, rel, extOf(name), Files.size(p)))
        }
      }
    }
    walk(root).toDF("path", "name", "rel_path", "ext", "size")
  }

  /** f03 driver correctness entry: the sync planner over two manifests
    * synthesized DETERMINISTICALLY from the documents table, so DuckDB
    * can rebuild both sides and replay the full-outer diff. Coverage by
    * construction: doc_id % 7 = 0 missing from the target (copy_new);
    * % 5 = 0 size drift and % 3 = 0 stale-target mtime (copy_changed —
    * both triggers exercised); % 13 = 0 target-only rows (delete);
    * everything else noop.
    */
  def f03SyncPlanDemo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), length(col("text")).cast("long").as("sz"))
    val rel = concat(lit("d"), col("doc_id") % 10, lit("/doc_"),
      col("doc_id"), lit(".txt"))
    val name = concat(lit("doc_"), col("doc_id"), lit(".txt"))
    val src = docs.select(
      concat(lit("/src/"), rel).as("path"), name.as("name"),
      rel.as("rel_path"), lit("txt").as("ext"), col("sz").as("size"),
      (col("doc_id") + 1000L).as("mtime")).as[FileEntry]
    val tgtMain = docs.filter(col("doc_id") % 7 =!= 0).select(
      concat(lit("/dst/"), rel).as("path"), name.as("name"),
      rel.as("rel_path"), lit("txt").as("ext"),
      when(col("doc_id") % 5 === 0, col("sz") + 1L).otherwise(col("sz"))
        .as("size"),
      when(col("doc_id") % 3 === 0, col("doc_id") + 999L)
        .otherwise(col("doc_id") + 1000L).as("mtime"))
    val relOld = concat(lit("old/doc_"), col("doc_id"), lit(".txt"))
    val tgtOld = docs.filter(col("doc_id") % 13 === 0).select(
      concat(lit("/dst/"), relOld).as("path"), name.as("name"),
      relOld.as("rel_path"), lit("txt").as("ext"), col("sz").as("size"),
      (col("doc_id") + 1000L).as("mtime"))
    syncPlan(src, tgtMain.union(tgtOld).as[FileEntry]).orderBy("rel_path")
  }

  /** f05 driver correctness entry: the audit rollup over a copy audit
    * synthesized deterministically from the documents table (status by
    * doc_id residue, bytes only on copied rows) — DuckDB replays the
    * same construction and the per-directory aggregation.
    */
  def f05AuditDemo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val audit = graft.Tables(spark, dir).documents
      .select(col("doc_id"), length(col("text")).cast("long").as("sz"))
      .select(
        concat(lit("/src/f"), col("doc_id")).as("src"),
        concat(lit("/dst/f"), col("doc_id")).as("dest"),
        concat(lit("d"), col("doc_id") % 10, lit("/doc_"), col("doc_id"),
          lit(".txt")).as("rel_path"),
        when(col("doc_id") % 11 === 0, lit(0L))
          .when(col("doc_id") % 4 === 0, lit(0L))
          .otherwise(col("sz")).as("bytes"),
        when(col("doc_id") % 11 === 0, lit("failed"))
          .when(col("doc_id") % 4 === 0, lit("skipped"))
          .otherwise(lit("copied")).as("status"),
        lit("").as("error"), lit(0L).as("checksum"))
      .as[CopyAudit]
    auditSummary(audit)
  }

  /** f05: audit aggregation — the reference's printed tallies
    * (py:283-305) as a per-directory rollup.
    */
  def auditSummary(audit: Dataset[CopyAudit]): DataFrame = {
    audit.toDF()
      .withColumn("dir",
        when(instr(col("rel_path"), "/") > 0,
          expr("substring_index(rel_path, '/', 1)")).otherwise(lit("")))
      .groupBy("dir")
      .agg(
        sum(when(col("status") === "copied", 1L).otherwise(0L)).as("n_copied"),
        sum(when(col("status") === "skipped", 1L).otherwise(0L)).as("n_skipped"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("n_failed"),
        sum(col("bytes")).as("total_bytes"))
      .orderBy("dir")
  }
}
