package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class WritersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("partitioned events lake prunes partitions on date filters") {
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_lake").toString + "/events"
    Writers.writeEventsLake(t.events, path)

    val lake = spark.read.parquet(path)
    val q = lake.filter(col("event_date") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      s"no partition filter:\n$plan")
    // correctness: pruned read equals full-scan filter
    val full = t.events.filter(to_date(col("ts")) === "2024-01-02").count()
    assert(q.count() == full)
    assert(full > 0, "need events on the probe date for a meaningful test")
    // physical layout: one directory per date
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("event_date="))
    assert(dirs.nonEmpty)
  }

  test("dynamic partition pruning fires on a dim-filtered join against the lake") {
    import spark.implicits._
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_dpp").toString + "/events"
    Writers.writeEventsLake(t.events, path)
    val lake = spark.read.parquet(path)
    // dimension carrying the partition key, filtered at query time —
    // the classic DPP shape: the fact side's partition list must be
    // pruned by the dim filter's runtime result, not scanned fully
    val dim = t.events.select(to_date(col("ts")).as("event_date"))
      .distinct().withColumn("is_probe", col("event_date") === "2024-01-02")
    val q = lake.join(dim.filter(col("is_probe")), Seq("event_date"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP in plan:\n$plan")
    val expected = t.events.filter(to_date(col("ts")) === "2024-01-02").count()
    assert(q.count() == expected && expected > 0)
  }

  test("x09 z-order keeps per-file spans tight on BOTH cluster columns") {
    import spark.implicits._
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_zorder").toString + "/orders"
    val src = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    Writers.writeZOrdered(src, path, "o_custkey", "o_totalprice",
      numFiles = 16)
    val back = spark.read.parquet(path)
    assert(back.count() == src.count())
    // per-file spans: a z-ordered layout bounds the span of BOTH
    // columns per file; a single-column sort would leave the other
    // column's span at ~100% of global
    val spans = back.groupBy(input_file_name().as("f"))
      .agg(
        (max("o_custkey") - min("o_custkey")).cast("double").as("span_a"),
        (max("o_totalprice") - min("o_totalprice")).as("span_b"))
      .collect()
    assert(spans.length >= 8, s"expected >=8 files, got ${spans.length}")
    val globA = src.agg(max("o_custkey") - min("o_custkey")).head.getLong(0).toDouble
    val globB = src.agg(max("o_totalprice") - min("o_totalprice")).head.getDouble(0)
    val avgA = spans.map(_.getDouble(1)).sum / spans.length / globA
    val avgB = spans.map(_.getDouble(2)).sum / spans.length / globB
    assert(avgA <= 0.5, s"avg custkey span fraction $avgA")
    assert(avgB <= 0.5, s"avg totalprice span fraction $avgB")
  }

  test("x17 stats index prunes files a range query cannot touch") {
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_stats").toString + "/lineitem"
    val src = t.lineitem.select("l_orderkey", "l_shipdate", "l_quantity")
    StatsIndex.writeWithStats(src, path, "l_shipdate", nFiles = 16)

    // manifest: one row per written file, rows conserved
    val manifest = StatsIndex.stats(spark, path).collect()
    val nFilesOnDisk = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(manifest.length == nFilesOnDisk && manifest.length >= 8)
    assert(manifest.map(_.getLong(3)).sum == src.count())

    // a narrow shipdate range: the candidate list must be a strict
    // subset of the files (range layout makes file spans disjoint)
    val (lo, hi) = ("1996-01-01", "1996-03-31")
    val files = StatsIndex.candidateFiles(spark, path, lo, hi)
    assert(files.nonEmpty && files.size < manifest.length,
      s"${files.size} of ${manifest.length} files — no pruning happened")

    // pruned read == full-scan filter, row-for-row
    val got = StatsIndex.prunedRead(spark, path, "l_shipdate", lo, hi)
      .orderBy("l_orderkey", "l_shipdate", "l_quantity").collect()
    val want = src
      .filter(col("l_shipdate") >= lo && col("l_shipdate") <= hi)
      .orderBy("l_orderkey", "l_shipdate", "l_quantity").collect()
    assert(got.toSeq == want.toSeq && want.nonEmpty)

    // the scan's file list is exactly the candidates — nothing else is
    // opened (planted-garbage equivalent: an out-of-range file with
    // poison rows could never affect the result)
    val scanned = StatsIndex.prunedRead(spark, path, "l_shipdate", lo, hi)
      .inputFiles.toSet
    assert(scanned == files.toSet)

    // an empty range prunes everything and still returns the schema
    val none = StatsIndex.prunedRead(spark, path, "l_shipdate",
      "2099-01-01", "2099-12-31")
    assert(none.count() == 0 &&
      none.columns.sameElements(src.columns))

    // byte-level proof (x11): the pruned read SELECTS fewer on-disk
    // bytes than the same filter over a full scan — data skipping is
    // real I/O avoided, not just a shorter file list
    val prunedBytes = graft.Instrument.profile(
      StatsIndex.prunedRead(spark, path, "l_shipdate", lo, hi)).scanSelectedBytes
    val fullBytes = graft.Instrument.profile(
      spark.read.parquet(path)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") <= hi)).scanSelectedBytes
    assert(prunedBytes > 0 && prunedBytes < fullBytes,
      s"pruned $prunedBytes vs full $fullBytes — no byte reduction")
  }

  test("x19 bloom skipping serves equality lookups a min/max index cannot") {
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_bloom").toString + "/orders"
    val src = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    StatsIndex.writeWithBloom(src, path, "o_orderkey", nFiles = 16)

    // manifest: one row per file, rows conserved
    val manifest = spark.read.parquet(path + ".bloom").collect()
    val nFilesOnDisk = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(manifest.length == nFilesOnDisk && manifest.length >= 8)
    assert(manifest.map(_.getLong(3)).sum == src.count())

    // present keys: NEVER skipped (bloom guarantee) — pruned read ==
    // full-scan filter row-for-row, on a spread of real keys
    val keys = src.select("o_orderkey").distinct()
      .orderBy("o_orderkey").collect().map(_.getLong(0))
    val sample = Seq(keys.head, keys(keys.length / 3),
      keys(2 * keys.length / 3), keys.last)
    sample.foreach { k =>
      val got = StatsIndex.bloomPrunedRead(spark, path, "o_orderkey", k)
        .orderBy("o_custkey", "o_totalprice").collect()
      val want = src.filter(col("o_orderkey") === k)
        .orderBy("o_custkey", "o_totalprice").collect()
      assert(got.toSeq == want.toSeq && want.nonEmpty, s"key $k mismatch")
      // and the lookup opened a bounded candidate set, not the table:
      // the key lives in few files; false candidates are ~(n/2^16)^2
      val scanned = StatsIndex.bloomPrunedRead(spark, path, "o_orderkey", k)
        .inputFiles.toSet
      assert(scanned.size < manifest.length / 2,
        s"key $k scanned ${scanned.size}/${manifest.length} files")
      assert(scanned ==
        StatsIndex.bloomCandidateFiles(spark, path, "o_orderkey", k).toSet)
    }

    // absent key: result empty with the data schema, and the bloom
    // pruned (almost) everything — this is the case where x17's
    // min/max manifest over a hash layout prunes NOTHING
    val absent = keys.max + 999983L
    val none = StatsIndex.bloomPrunedRead(spark, path, "o_orderkey", absent)
    assert(none.count() == 0 && none.columns.sameElements(src.columns))
    assert(StatsIndex.bloomCandidateFiles(spark, path, "o_orderkey", absent).size <
      manifest.length / 2)
  }

  test("x19 batch appends keep equality lookups pruned and are replay-idempotent") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_bloomapp").toString + "/t"
    def batchDf(lo: Long, hi: Long) =
      (lo until hi).map(v => (v, s"p$v")).toDF("k", "payload").repartition(2)
    StatsIndex.appendBatchWithBloom(batchDf(0, 2000), path, "k", 0L)
    StatsIndex.appendBatchWithBloom(batchDf(2000, 4000), path, "k", 1L)
    StatsIndex.appendBatchWithBloom(batchDf(4000, 6000), path, "k", 2L)
    val manifest = spark.read.parquet(path + ".bloom").collect()
    assert(manifest.map(_.getLong(3)).sum == 6000L && manifest.length >= 6)
    // lookups across all three batches: exact row, bounded file set
    Seq(10L, 2500L, 5999L).foreach { k =>
      val got = StatsIndex.bloomPrunedRead(spark, path, "k", k).collect()
      assert(got.length == 1 && got.head.getString(1) == s"p$k")
      assert(StatsIndex.bloomCandidateFiles(spark, path, "k", k).size <
        manifest.length / 2, s"key $k: no pruning")
      // the probe-type guard: an Int-typed probe of the Long key
      // column must find the same files (the cast, not the caller's
      // Scala type, decides the hash input)
      assert(StatsIndex.bloomCandidateFiles(spark, path, "k", k.toInt).size ==
        StatsIndex.bloomCandidateFiles(spark, path, "k", k).size)
    }
    // replay: re-appending batch 1 rewrites its directory and its
    // manifest rows — row counts and lookups unchanged
    StatsIndex.appendBatchWithBloom(batchDf(2000, 4000), path, "k", 1L)
    val manifest2 = spark.read.parquet(path + ".bloom").collect()
    assert(manifest2.map(_.getLong(3)).sum == 6000L)
    assert(StatsIndex.bloomPrunedRead(spark, path, "k", 2500L)
      .collect().map(_.getString(1)).toSeq == Seq("p2500"))
  }

  test("x20 compaction restores range-pruning teeth to a batch-appended table") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_compactr").toString + "/t"
    // three batches, each spanning the FULL key domain (interleaved
    // residues): correct manifest, useless layout — the worst case
    // for x17 pruning that real time-ordered ingest produces
    (0 until 3).foreach { i =>
      val batch = (0L until 6000L).filter(_ % 3 == i)
        .map(v => (v, s"p$v")).toDF("v", "payload").repartition(2)
      StatsIndex.appendBatchWithStats(batch, path, "v", i.toLong)
    }
    val preFiles = StatsIndex.stats(spark, path).count()
    val (lo, hi) = (1000L, 1200L)
    val preCand = StatsIndex.candidateFiles(spark, path, lo, hi)
    assert(preCand.size == preFiles,
      s"interleaved batches should defeat pruning: ${preCand.size}/$preFiles")
    val want = (lo to hi).map(v => (v, s"p$v"))

    StatsIndex.compactToRangeLayout(spark, path, "v", nFiles = 12)

    // rows conserved, layout column gone, manifest matches disk
    val after = spark.read.parquet(path)
    assert(after.count() == 6000L && !after.columns.contains("batch"))
    val manifest = StatsIndex.stats(spark, path).collect()
    assert(manifest.map(_.getLong(3)).sum == 6000L && manifest.length >= 8)
    // pruning has teeth again: strict-subset candidates, exact rows
    val postCand = StatsIndex.candidateFiles(spark, path, lo, hi)
    assert(postCand.nonEmpty && postCand.size < manifest.length / 2,
      s"${postCand.size}/${manifest.length} files after compaction")
    val got = StatsIndex.prunedRead(spark, path, "v", lo, hi)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == want)

    // idempotent: compacting the compacted layout changes nothing
    StatsIndex.compactToRangeLayout(spark, path, "v", nFiles = 12)
    val again = StatsIndex.prunedRead(spark, path, "v", lo, hi)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(again.toSeq == want &&
      spark.read.parquet(path).count() == 6000L)
  }

  test("x17 pruned reads agree on schema between hit and no-candidate branches") {
    import spark.implicits._
    // batch-appended layout: reading the ROOT discovers a `batch`
    // partition column that leaf-file reads lack — the no-candidate
    // branch must build its empty frame from a LEAF file or a caller
    // unioning across queries breaks on exactly the empty edge
    val path = Files.createTempDirectory("graft_statsschema").toString + "/t"
    StatsIndex.appendBatchWithStats(
      (0L until 50L).map(i => (i, i)).toDF("id", "v"), path, "v", 0L)
    StatsIndex.appendBatchWithStats(
      (50L until 100L).map(i => (i, i)).toDF("id", "v"), path, "v", 1L)
    val hit = StatsIndex.prunedRead(spark, path, "v", 10L, 20L)
    val miss = StatsIndex.prunedRead(spark, path, "v", 1000L, 2000L)
    assert(hit.count() == 11L && miss.count() == 0L)
    assert(miss.schema == hit.schema,
      s"empty-branch schema ${miss.schema} != hit-branch ${hit.schema}")
    // the contract that matters downstream: the union is legal
    assert(hit.unionByName(miss).count() == 11L)
  }

  test("x18 z-order + 2-D stats prune a box query on BOTH dimensions") {
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_zstats").toString + "/orders"
    val src = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    StatsIndex.writeZOrderedWithStats(src, path, "o_custkey", "o_totalprice",
      nFiles = 16)
    val manifest = StatsIndex.stats(spark, path).collect()
    assert(manifest.length >= 8)
    assert(manifest.map(_.getLong(5)).sum == src.count())

    // a box covering ~1/16 of each dimension's range
    val (aLo, aHi) = (100L, 200L)
    val (bLo, bHi) = (100000.0, 150000.0)
    val pruned = StatsIndex.prunedBoxRead(spark, path,
      "o_custkey", aLo, aHi, "o_totalprice", bLo, bHi)
    val want = src.filter(
      col("o_custkey").between(aLo, aHi) &&
        col("o_totalprice").between(bLo, bHi))
      .orderBy("o_orderkey").collect()
    assert(pruned.orderBy("o_orderkey").collect().toSeq == want.toSeq)
    assert(want.nonEmpty, "box query matched nothing — widen the box")
    // 2-D pruning has teeth: the box reads a strict subset of files
    val scanned = pruned.inputFiles.toSet
    assert(scanned.size < manifest.length,
      s"${scanned.size} of ${manifest.length} files — no 2-D pruning")
  }

  test("x08 compaction merges small files without losing a row") {
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_compact").toString + "/orders"
    // fragment: 24 tiny files
    t.orders.repartition(24).write.parquet(path)
    def parquetFiles = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetFiles == 24)
    val expectedCount = t.orders.count()
    val expectedSum = t.orders.agg(sum("o_orderkey")).head.getLong(0)

    val (before, after) = Writers.compact(spark, path, targetBytes = 1L << 30)
    assert(before == 24 && after == 1)
    assert(parquetFiles == 1, s"still $parquetFiles files after compaction")
    val compacted = spark.read.parquet(path)
    assert(compacted.count() == expectedCount)
    assert(compacted.agg(sum("o_orderkey")).head.getLong(0) == expectedSum)
  }

  test("x08 compact refuses a partitioned table root") {
    // the docstring's per-partition-directory contract is ENFORCED:
    // on a partitioned root the top-level listing sees only
    // directories (totalBytes 0) and the rewrite would silently
    // flatten the layout into one unpartitioned file
    val t = Tables(spark, dir)
    val root = Files.createTempDirectory("graft_compact_part").toString +
      "/orders"
    t.orders.limit(100)
      .withColumn("pk", org.apache.spark.sql.functions.expr("o_orderkey % 3"))
      .write.partitionBy("pk").parquet(root)
    val e = intercept[IllegalArgumentException] {
      Writers.compact(spark, root)
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
    // the partition layout is untouched
    assert(new java.io.File(root).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("pk=")))
  }
}
