package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** x17: file-level min/max statistics index — the data-skipping layer
  * table formats (Delta/Iceberg/Hudi — all public designs) put between
  * the query planner and the file listing. Parquet row-group stats
  * only prune AFTER a file is opened; partition directories only prune
  * on the partition key. This closes the gap in between: a manifest of
  * per-file [min, max] on a chosen column lets a range query drop
  * whole files at PLANNING time, from a manifest that is itself a tiny
  * parquet table.
  *
  * Scale posture: the stats pass is one distributed scan of the
  * written files (`input_file_name` groupBy — no driver involvement);
  * the manifest holds ONE row per file, so even a million-file table
  * is a ~50 MB manifest. Query planning filters the manifest and
  * collects only the MATCHED file names — the same object a table
  * format's driver-side planner holds, bounded by the query's
  * selectivity, which is the point of range-laying-out the data in the
  * first place (files whose range doesn't overlap never reach the
  * driver).
  */
object StatsIndex {

  private def statsPath(path: String): String = path + ".stats"

  /** Build: write `df` range-laid-out on `statsCol` (so file ranges
    * are disjoint and skipping has teeth), then scan the written files
    * once to record per-file min/max/rows. Works on any ordered column
    * type (dates, timestamps, numerics, strings).
    */
  def writeWithStats(df: DataFrame, path: String, statsCol: String,
      nFiles: Int): Unit = {
    df.repartitionByRange(nFiles, col(statsCol))
      .sortWithinPartitions(statsCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
      .repartition(1) // one row per file — the manifest is tiny by design
      .write.mode(SaveMode.Overwrite).parquet(statsPath(path))
  }

  /** The manifest as a DataFrame (file, min_v, max_v, n_rows). */
  def stats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(statsPath(path))

  /** Files whose [min_v, max_v] overlaps [lo, hi] — the planning step,
    * exposed for specs and composition.
    */
  def candidateFiles(spark: SparkSession, path: String,
      lo: Any, hi: Any): Seq[String] =
    stats(spark, path)
      .filter(col("max_v") >= lit(lo) && col("min_v") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Empty frame with the LEAF-FILE schema: reading the table root
    * would discover directory partition columns (`batch=<id>` from
    * appendBatchWithStats) that leaf-file reads lack — the two
    * prunedRead branches must agree on schema or a caller unioning
    * across queries breaks on the no-candidates edge. One leaf path
    * from the manifest pins the schema; a table with no files at all
    * has no rows either way.
    */
  private def emptyLike(spark: SparkSession, path: String): DataFrame =
    emptyLikeFrom(spark, path, statsPath(path))

  /** The shared leaf-schema fallback, parameterized by which manifest
    * (stats or bloom) knows the leaf files.
    */
  private def emptyLikeFrom(spark: SparkSession, path: String,
      manifestPath: String): DataFrame = {
    val anyFile = spark.read.parquet(manifestPath)
      .select("file").limit(1).collect().map(_.getString(0))
    if (anyFile.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(anyFile.head).limit(0)
  }

  /** Query: read only the overlapping files, then apply the exact
    * range predicate (stats are necessary, not sufficient — edge files
    * straddle the bounds). Equal to a full-scan filter by
    * construction; reads a selectivity-bounded subset of the files.
    */
  def prunedRead(spark: SparkSession, path: String, statsCol: String,
      lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(spark, path, lo, hi)
    val base =
      if (files.isEmpty) emptyLike(spark, path)
      else spark.read.parquet(files: _*)
    base.filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }

  /** x18 build: Z-order the table (x09) AND record a TWO-dimensional
    * per-file stats manifest — min/max of both cluster columns. The
    * Morton layout is what makes the manifest useful: it bounds BOTH
    * columns' spans per file (x09's spec-pinned property), so a 2-D
    * box query can drop most files, where a single-column sort leaves
    * the second column's span at ~100% per file and prunes nothing on
    * that dimension.
    */
  def writeZOrderedWithStats(df: DataFrame, path: String,
      colA: String, colB: String, nFiles: Int): Unit = {
    Writers.writeZOrdered(df, path, colA, colB, numFiles = nFiles)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"),
        count(lit(1)).as("n_rows"))
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(statsPath(path))
  }

  /** x18 query: read only files whose 2-D bounding box overlaps the
    * query box, then apply the exact predicate. Equal to a full-scan
    * filter by construction.
    */
  def prunedBoxRead(spark: SparkSession, path: String,
      colA: String, aLo: Any, aHi: Any,
      colB: String, bLo: Any, bHi: Any): DataFrame = {
    val files = stats(spark, path)
      .filter(col("max_a") >= lit(aLo) && col("min_a") <= lit(aHi) &&
        col("max_b") >= lit(bLo) && col("min_b") <= lit(bHi))
      .select("file").collect().map(_.getString(0)).toSeq
    val base =
      if (files.isEmpty) emptyLike(spark, path)
      else spark.read.parquet(files: _*)
    base.filter(col(colA).between(lit(aLo), lit(aHi)) &&
      col(colB).between(lit(bLo), lit(bHi)))
  }

  /** x19 build: per-file membership FILTERS for equality lookups on a
    * high-cardinality key — the skipping class min/max stats can't
    * serve. A table laid out by time (st11's batches, x08's compacted
    * runs) has every file's [min_id, max_id] spanning ~the whole key
    * domain, so x17 prunes nothing for `key = v`; table formats
    * (Delta/Iceberg/Hudi, all public designs) add per-file bloom
    * filters for exactly this. Here each file records TWO independent
    * 16-bit fingerprint sets (xxhash64 under different seed mixes) in
    * sparse form — a candidate file must contain BOTH fingerprints of
    * the probe, so for a file of n distinct keys the false-candidate
    * rate is ~(n/2¹⁶)², under 3% at 10k keys/file, while present keys
    * are NEVER skipped (no false negatives, the bloom guarantee).
    *
    * Scale posture: the filter pass is one distributed scan of the
    * written files (input_file_name groupBy, positions dedup'd
    * map-side by collect_set); the manifest holds one row per file
    * (two ≤2¹⁶-int arrays ≈ 100 KB worst case), and planning filters
    * it with two array_contains — the same tiny-manifest planner
    * discipline as x17.
    */
  def writeWithBloom(df: DataFrame, path: String, keyCol: String,
      nFiles: Int): Unit = {
    df.repartition(nFiles) // hash layout: the adversarial case for x17
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        collect_set(fingerprint(col(keyCol), 1)).as("fp1"),
        collect_set(fingerprint(col(keyCol), 2)).as("fp2"),
        count(lit(1)).as("n_rows"))
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(bloomPath(path))
  }

  private def bloomPath(path: String): String = path + ".bloom"

  /** 16-bit fingerprint of `c` under seed-mix `seed` — the engine
    * expression AND the planner's probe run the same codegen'd
    * xxhash64, so fingerprints agree by construction.
    */
  private def fingerprint(c: org.apache.spark.sql.Column,
      seed: Int): org.apache.spark.sql.Column =
    (xxhash64(lit(seed), c).bitwiseAND(lit(0xFFFFL))).cast("int")

  /** x19 planning: files whose BOTH fingerprint sets contain the
    * probe's. The probe fingerprints are computed by the engine itself
    * (1-row query) — no re-implementation of the hash driver-side —
    * and the probe literal is CAST to the stored key column's type
    * first: xxhash64 hashes an Int and a Long to different values, so
    * an uncast probe whose Scala type differs from the column's would
    * silently produce false negatives — the one failure class a bloom
    * index must never have.
    */
  def bloomCandidateFiles(spark: SparkSession, path: String,
      keyCol: String, value: Any): Seq[String] = {
    val keyType = spark.read.parquet(path).schema(keyCol).dataType
    val probe = spark.range(1)
      .select(fingerprint(lit(value).cast(keyType), 1).as("p1"),
        fingerprint(lit(value).cast(keyType), 2).as("p2"))
      .collect().head
    val (p1, p2) = (probe.getInt(0), probe.getInt(1))
    spark.read.parquet(bloomPath(path))
      .filter(array_contains(col("fp1"), p1) &&
        array_contains(col("fp2"), p2))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** x19 query: read only may-contain files, then apply the exact
    * equality predicate. Equal to a full-scan filter by construction
    * (no false negatives); reads a ~(n/2¹⁶)²-bounded fraction of the
    * files for absent or rare keys.
    */
  def bloomPrunedRead(spark: SparkSession, path: String, keyCol: String,
      value: Any): DataFrame = {
    val files = bloomCandidateFiles(spark, path, keyCol, value)
    val base =
      if (files.isEmpty) emptyLikeFrom(spark, path, bloomPath(path))
      else spark.read.parquet(files: _*)
    base.filter(col(keyCol) === lit(value))
  }

  /** x19's st11-style maintenance: append one micro-batch to a
    * bloom-indexed table and keep the fingerprint manifest fresh —
    * same replay-idempotent `batch=<id>` discipline as
    * [[appendBatchWithStats]] (a replayed batch rewrites its own
    * directory and its own manifest rows), same staging+swap publish.
    * Per batch: one write, one fingerprint scan OF THE BATCH ONLY,
    * one tiny-manifest rewrite. Equality lookups stay pruned as the
    * table grows — the case where batch append does NOT degrade the
    * index (each batch's files carry their own fingerprints; a key
    * lives in the few files that contain it regardless of arrival
    * order), unlike x17's range manifests (x20's job).
    */
  def appendBatchWithBloom(batch: DataFrame, path: String, keyCol: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dirPath = s"$path/batch=$batchId"
    batch.write.mode(SaveMode.Overwrite).parquet(dirPath)
    val fresh = spark.read.parquet(dirPath)
      .groupBy(input_file_name().as("file"))
      .agg(
        collect_set(fingerprint(col(keyCol), 1)).as("fp1"),
        collect_set(fingerprint(col(keyCol), 2)).as("fp2"),
        count(lit(1)).as("n_rows"))
    val bp = new org.apache.hadoop.fs.Path(bloomPath(path))
    val merged =
      if (bp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(bp))
        spark.read.parquet(bloomPath(path))
          .filter(!col("file").contains(s"/batch=$batchId/"))
          .unionByName(fresh)
      else fresh
    graft.operators.Merge.publish(merged.repartition(1), bloomPath(path))
  }

  /** x20: compaction that RESTORES range-layout pruning teeth. A
    * batch-appended table ([[appendBatchWithStats]] / st11) stays
    * correct but its skipping degrades: every arriving batch spans
    * ~the whole key domain, so after k batches a narrow range query's
    * candidate set is ~all k·files — the manifest is fresh, the
    * LAYOUT is wrong. This is the lake-maintenance step table formats
    * schedule as OPTIMIZE/rewrite (public Delta/Iceberg design):
    * re-range-partition the whole table on the stats column, publish
    * via the staging+swap ([[graft.operators.Merge.publish]] — a
    * crash mid-compaction leaves the previous table readable), and
    * rebuild the manifest from one distributed scan. The `batch=<id>`
    * layout column is a physical artifact and is dropped — after
    * compaction the table IS the x17 shape, and x17/x18 pruning specs
    * apply verbatim. Idempotent: re-running compacts the already-
    * compacted layout to itself.
    *
    * At 100 TB this is the one full-table rewrite in the maintenance
    * cycle — one range shuffle — which is exactly what it costs in
    * any table format; everything incremental stays in st11.
    */
  def compactToRangeLayout(spark: SparkSession, path: String,
      statsCol: String, nFiles: Int): Unit = {
    val df = spark.read.parquet(path)
    val data = if (df.columns.contains("batch")) df.drop("batch") else df
    // publish writes staging FULLY before the swap, so reading from
    // `path` while replacing `path` is safe by construction
    graft.operators.Merge.publish(
      data.repartitionByRange(nFiles, col(statsCol))
        .sortWithinPartitions(statsCol), path)
    val manifest = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
      .repartition(1)
    graft.operators.Merge.publish(manifest, statsPath(path))
  }

  /** st11's batch engine: append one micro-batch to a stats-indexed
    * table and keep the manifest fresh. The batch lands in a
    * DETERMINISTIC directory (`batch=<id>`) written with Overwrite, so
    * a replayed batch (the foreachBatch at-least-once contract)
    * rewrites the same directory instead of duplicating rows; the
    * manifest merge drops any rows for that directory before unioning
    * the fresh stats, making the whole step idempotent. Manifest
    * updates go through [[graft.operators.Merge.publish]]'s
    * staging+swap, so a crash mid-update leaves the previous manifest
    * readable. Per batch: one write of the batch, one stats scan OF
    * THE BATCH ONLY, one manifest rewrite (manifest is one row per
    * file — tiny at any table size).
    */
  def appendBatchWithStats(batch: DataFrame, path: String, statsCol: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dirPath = s"$path/batch=$batchId"
    batch.sortWithinPartitions(statsCol)
      .write.mode(SaveMode.Overwrite).parquet(dirPath)
    val fresh = spark.read.parquet(dirPath)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
    val sp = new org.apache.hadoop.fs.Path(statsPath(path))
    val merged =
      if (sp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(sp))
        // match on the slash-bounded directory name: `file` is a URI
        // (file:///…), dirPath a bare path — prefix compare won't do
        stats(spark, path)
          .filter(!col("file").contains(s"/batch=$batchId/"))
          .unionByName(fresh)
      else fresh
    graft.operators.Merge.publish(merged.repartition(1), statsPath(path))
  }
}
