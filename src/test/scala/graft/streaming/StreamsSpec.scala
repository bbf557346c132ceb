package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.Streams._

object StreamsSpec {
  /** Minimal paged endpoint over a local directory — the spec's
    * stand-in for a remote listing API (pagination exercised via
    * pageSize). Top-level so it serializes without a suite $outer.
    */
  final case class LocalFsFetcher(root: String, pageSize: Int = 2)
      extends graft.sources.PagedSource.PageFetcher {
    import graft.sources.PagedSource.{Page, PageItem}
    override def listPage(dirId: String, token: Option[String]): Page = {
      val dir = new java.io.File(if (dirId.isEmpty) root else dirId)
      val all = Option(dir.listFiles()).getOrElse(Array.empty)
        .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
        .sortBy(_.getName)
        .map(f => PageItem(f.getAbsolutePath, f.getName, f.isDirectory,
          f.length(), f.lastModified()))
      val off = token.map(_.toInt).getOrElse(0)
      Page(all.slice(off, off + pageSize).toSeq,
        if (off + pageSize < all.length) Some((off + pageSize).toString) else None)
    }
    override def open(fileId: String): java.io.InputStream =
      new java.io.FileInputStream(fileId)
  }

  // The conditional local fixture for the service-path f17 legs is
  // the main-side Streams.CondLocalDirFetcher (bytes-derived ETag +
  // metadata-only mtime bump) — no test twin to keep in sync.

  /** Robots endpoint for the announce-bucket leg: one sitemap per
    * host, a constant ETag captured on fetch, NotModified on any
    * If-None-Match — so drain 2 is a pure 304 heartbeat. Top-level
    * for the no-$outer serialization rule.
    */
  final case class HeartbeatRobotsFetcher()
      extends graft.sources.PagedSource.ConditionalFetcher {
    override def listPage(dirId: String, token: Option[String])
        : graft.sources.PagedSource.Page =
      throw new UnsupportedOperationException("robots only")
    override def open(fileId: String): java.io.InputStream = {
      val host = fileId.stripPrefix("https://")
        .takeWhile(c => c != '/' && c != '?')
      val s = host.stripPrefix("site").takeWhile(_.isDigit)
      new java.io.ByteArrayInputStream(
        s"User-agent: *\nSitemap: https://$host/sm_$s.xml\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    override def openIfModifiedSince(fileId: String, validator: String)
        : java.io.InputStream = open(fileId)
    override def openIfNoneMatch(fileId: String, etag: String)
        : java.io.InputStream =
      throw new graft.sources.PagedSource.NotModified
    override def openCapturing(fileId: String)
        : (java.io.InputStream, graft.sources.PagedSource.RespValidators) =
      (open(fileId), graft.sources.PagedSource.RespValidators("\"tag\"", ""))
  }
}

class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def tsh(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("st01 tumbling windows count per type and drop late data") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = st01WindowedAgg(input.toDS(), "10 minutes", "20 minutes")
      .writeStream.format("memory").queryName("st01_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: two windows for type A, one for B
    input.addData(
      Event(1, ts(1), 10, "A", 1.0), Event(2, ts(4), 11, "A", 2.0),
      Event(3, ts(12), 10, "A", 3.0), Event(4, ts(2), 12, "B", 4.0))
    q.processAllAvailable()
    // batch 2: advance watermark far, closing earlier windows
    input.addData(Event(5, tsh(11, 30), 10, "A", 5.0))
    q.processAllAvailable()
    // batch 3: a very late event for the first window → dropped
    input.addData(Event(6, ts(3), 13, "A", 99.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT win_start, event_type, n_events, sum_value FROM st01_out ORDER BY win_start, event_type")
      .collect()
    q.stop()
    val a0 = rows.find(r => r.getString(1) == "A" &&
      r.getTimestamp(0) == Timestamp.valueOf("2024-01-01 10:00:00")).get
    assert(a0.getLong(2) == 2 && a0.getDouble(3) == 3.0, "late event must not inflate the closed window")
    val a1 = rows.find(r => r.getString(1) == "A" &&
      r.getTimestamp(0) == Timestamp.valueOf("2024-01-01 10:10:00")).get
    assert(a1.getLong(2) == 1)
    assert(rows.exists(r => r.getString(1) == "B" && r.getLong(2) == 1))
  }

  test("st02 flatMapGroupsWithState closes sessions on gap and timeout") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = st02Sessionize(input.toDS(), gapMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("st02_out")
      .outputMode(OutputMode.Append).start()
    // user 1: events 10:01,10:05 then a 40-min gap then 10:45 → first session closes
    input.addData(
      Event(1, ts(1), 1, "A", 0), Event(2, ts(5), 1, "A", 0))
    q.processAllAvailable()
    input.addData(Event(3, ts(45), 1, "A", 0))
    q.processAllAvailable()
    // advance event time far past 10:45+30m+watermark → timeout closes session 2
    input.addData(Event(4, tsh(13, 0), 2, "A", 0))
    q.processAllAvailable()
    input.addData(Event(5, tsh(14, 0), 2, "A", 0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, n_events, start_ts, end_ts FROM st02_out WHERE user_id = 1 ORDER BY start_ts")
      .collect()
    q.stop()
    assert(rows.length == 2, s"expected both user-1 sessions closed, got ${rows.length}")
    assert(rows(0).getInt(1) == 2 && rows(0).getTimestamp(2) == ts(1) &&
      rows(0).getTimestamp(3) == ts(5))
    assert(rows(1).getInt(1) == 1 && rows(1).getTimestamp(2) == ts(45))
  }

  test("st04 file-source stream drains a landing zone incrementally") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_landing").toString
    // two "arrivals" in the landing zone (as the copy pipeline would write)
    Seq(Event(1, ts(1), 1, "A", 1.0), Event(2, ts(2), 1, "B", 2.0))
      .toDF().write.parquet(s"$dir/batch1")
    Seq(Event(3, ts(3), 2, "A", 3.0))
      .toDF().write.parquet(s"$dir/batch2")
    val schema = Seq.empty[Event].toDF().schema
    val q = Streams.st04FileStream(spark, s"$dir/*", schema, maxFilesPerTrigger = 1)
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("st04_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val counts = spark.sql("SELECT event_type, count FROM st04_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("A" -> 2L, "B" -> 1L))
  }

  test("st05 stream-static join enriches events with dimension rows") {
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("d_user", "tier")
    val input = MemoryStream[Event](spark)
    val q = Streams.st05EnrichJoin(input.toDS(), dim, "d_user")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("st05_out")
      .outputMode("append").start()
    input.addData(
      Event(1, ts(1), 1, "A", 0), Event(2, ts(2), 2, "B", 0),
      Event(3, ts(3), 9, "C", 0)) // user 9 has no dim row
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_id, tier FROM st05_out ORDER BY event_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    q.stop()
    assert(rows == Map(1L -> "gold", 2L -> "silver", 3L -> null))
  }

  test("st03 dedup drops repeated event ids within the watermark") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = st03DedupStream(input.toDS(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("st03_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Event(1, ts(1), 1, "A", 0), Event(1, ts(2), 1, "A", 0),
      Event(2, ts(3), 1, "B", 0))
    q.processAllAvailable()
    input.addData(Event(1, ts(4), 1, "A", 0), Event(3, ts(5), 2, "C", 0))
    q.processAllAvailable()
    val n = spark.sql("SELECT COUNT(*) FROM st03_out").head.getLong(0)
    val distinct = spark.sql("SELECT COUNT(DISTINCT event_id) FROM st03_out").head.getLong(0)
    q.stop()
    assert(n == 3 && distinct == 3)
  }

  test("st09 intake stream gates junk and drops repeated content by fingerprint") {
    import spark.implicits._
    val good1 = (0 until 20).map(i => s"w$i").mkString(" ")
    val good2 = (0 until 20).map(i => s"x$i").mkString(" ")
    val good3 = (0 until 20).map(i => s"y$i").mkString(" ")
    val input = MemoryStream[Doc](spark)
    val q = st09CleanStream(input.toDS(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("st09_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: two good docs + one under the token gate
    input.addData(
      Doc(1, ts(1), good1), Doc(2, ts(2), "too short"), Doc(3, ts(3), good2))
    q.processAllAvailable()
    // batch 2: doc 4 repeats doc 1's CONTENT under a new id (within
    // the watermark → dropped); doc 5 is new
    input.addData(Doc(4, ts(5), good1), Doc(5, ts(6), good3))
    q.processAllAvailable()
    val ids = spark.sql("SELECT doc_id FROM st09_out")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    assert(ids == Set(1L, 3L, 5L),
      s"expected gate to drop 2 and fingerprint-dedup to drop 4, got $ids")
  }

  test("st07 foreachBatch upsert sink materializes latest-per-key across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st07")
    val path = dir.resolve("users").toString
    val ckpt = dir.resolve("ckpt").toString
    val input = MemoryStream[Event](spark)
    val q = st07UpsertSink(input.toDS(), path, ckpt)
    // batch 1: users 1 and 2
    input.addData(
      Event(1, ts(1), 1, "A", 10.0), Event(2, ts(2), 1, "B", 20.0),
      Event(3, ts(3), 2, "C", 30.0))
    q.processAllAvailable()
    val v1 = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
    assert(v1 == Map(1L -> ("B", 20.0), 2L -> ("C", 30.0)))
    // batch 2: user 1 updated, user 3 inserted, user 2 untouched
    input.addData(Event(4, ts(9), 1, "D", 40.0), Event(5, ts(8), 3, "E", 50.0))
    q.processAllAvailable()
    // batch 3: a LATE event for user 1 (older event time than the
    // published row) — latest-per-key must hold ACROSS batches, so the
    // table must not regress to it
    input.addData(Event(6, ts(4), 1, "LATE", 99.0))
    q.processAllAvailable()
    q.stop()
    val v2 = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
    assert(v2 == Map(1L -> ("D", 40.0), 2L -> ("C", 30.0), 3L -> ("E", 50.0)))
  }

  test("st07 rewrites only the partitions a batch touches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st07p")
    val path = dir.resolve("users").toString
    val ckpt = dir.resolve("ckpt").toString
    val input = MemoryStream[Event](spark)
    val q = st07UpsertSink(input.toDS(), path, ckpt, nParts = 8)
    // batch 1: users 1, 2, 3 → partitions 1, 2, 3
    input.addData(
      Event(1, ts(1), 1, "A", 10.0), Event(2, ts(2), 2, "B", 20.0),
      Event(3, ts(3), 3, "C", 30.0))
    q.processAllAvailable()

    def snapshot(part: Long): Map[String, (Long, Long)] = {
      val d = java.nio.file.Paths.get(path, s"part=$part")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString ->
          (java.nio.file.Files.size(f),
            java.nio.file.Files.getLastModifiedTime(f).toMillis))
        .toMap
    }
    val before1 = snapshot(1)
    val before3 = snapshot(3)
    val tableBytes = Seq(1L, 2L, 3L)
      .flatMap(k => snapshot(k).values.map(_._1)).sum

    // batch 2 touches ONLY user 2 → partition 2
    val (_, m) = graft.Instrument.measure(spark) {
      input.addData(Event(4, ts(9), 2, "D", 40.0))
      q.processAllAvailable()
    }
    q.stop()

    // untouched partitions: bit-identical files (same names/sizes/mtimes)
    assert(snapshot(1) == before1, "partition 1 was rewritten")
    assert(snapshot(3) == before3, "partition 3 was rewritten")
    assert(snapshot(2) != Map.empty && snapshot(2).nonEmpty)
    // x11 byte accounting: the batch's scans selected less than the
    // whole table (a full-table merge would read every partition plus
    // the batch)
    assert(m.scanSelectedBytes < tableBytes,
      s"batch scanned ${m.scanSelectedBytes} bytes >= table $tableBytes — not partition-confined")
    // cross-batch latest-per-key still holds
    val v = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
    assert(v == Map(1L -> ("A", 10.0), 2L -> ("D", 40.0), 3L -> ("C", 30.0)))
  }

  test("st07 recovers a partition caught mid-swap from its prev version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st07r")
    val path = dir.resolve("users").toString
    Streams.upsertBatchPartitioned(
      Seq(Event(1, ts(1), 1, "A", 10.0), Event(2, ts(2), 2, "B", 20.0))
        .toDF(), path, nParts = 8)
    // simulate a crash between "live moved aside" and "staged promoted":
    // part=1 exists only as <path>.prev/part=1
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path + ".prev"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/part=1"),
      new org.apache.hadoop.fs.Path(s"$path.prev/part=1")))
    // the next batch touching partition 1 must see user 1's old row
    // (so a late event cannot regress it) and republish the partition
    Streams.upsertBatchPartitioned(
      Seq(Event(3, ts(0), 1, "LATE", 99.0)).toDF(), path, nParts = 8)
    val v = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
    assert(v == Map(1L -> ("A", 10.0), 2L -> ("B", 20.0)))
  }

  test("st08 ingestion composition converges the lake to the remote across two drains") {
    import StreamsSpec.LocalFsFetcher
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st08")
    val remote = dir.resolve("remote").toString
    val landing = dir.resolve("landing").toString
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    new java.io.File(remote).mkdirs()

    // "the remote drops a file": one parquet file per remote object
    def publishRemote(name: String, events: Seq[Event]): Unit = {
      val tmp = dir.resolve(s"tmp_$name").toString
      events.toDF().coalesce(1).write
        .mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(remote, name))
    }
    def lakeState(): Map[Long, (String, Double)] =
      spark.read.parquet(lake).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
    def snapshot(part: Long): Map[String, (Long, Long)] = {
      val d = java.nio.file.Paths.get(lake, s"part=$part")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString ->
          (java.nio.file.Files.size(f),
            java.nio.file.Files.getLastModifiedTime(f).toMillis))
        .toMap
    }

    publishRemote("b1.parquet", Seq(
      Event(1, ts(1), 1, "A", 10.0), Event(2, ts(2), 2, "B", 20.0),
      Event(3, ts(3), 3, "C", 30.0)))
    val fetcher = LocalFsFetcher(remote)
    // drain 1: lands b1, streams it, lake = latest per key
    val audit1 = Streams.st08PagedIngest(spark, fetcher, landing, lake,
      ckpt, nParts = 8).collect()
    // the audit is the sync DIFF's work-list: unchanged files are noop
    // in the plan and never reach the copy, so drain 1 = 1 copied row
    assert(audit1.map(_.status).toSeq == Seq("copied"), audit1.mkString("; "))
    assert(lakeState() == Map(1L -> ("A", 10.0), 2L -> ("B", 20.0),
      3L -> ("C", 30.0)))

    val before1 = snapshot(1)
    val before3 = snapshot(3)

    // the remote drops b2: user 2 updated, user 10 new — both land in
    // partition 2 (2 % 8 == 10 % 8), so partitions 1 and 3 must not move
    publishRemote("b2.parquet", Seq(
      Event(4, ts(9), 2, "D", 40.0), Event(5, ts(8), 10, "E", 50.0)))
    val audit2 = Streams.st08PagedIngest(spark, fetcher, landing, lake,
      ckpt, nParts = 8).collect()
    // incremental: only the new b2 moves; the unchanged b1 is a plan
    // noop (zero downloads, not even a skipped-copy round trip)
    assert(audit2.map(_.status).toSeq == Seq("copied"), audit2.mkString("; "))
    assert(audit2.head.rel_path == "b2.parquet")
    assert(lakeState() == Map(1L -> ("A", 10.0), 2L -> ("D", 40.0),
      3L -> ("C", 30.0), 10L -> ("E", 50.0)))
    // untouched partitions bit-identical across the drain (st07's
    // confinement, now proven through the whole composition)
    assert(snapshot(1) == before1, "partition 1 was rewritten")
    assert(snapshot(3) == before3, "partition 3 was rewritten")

    // drain 3 with an unchanged remote: zero downloads, lake untouched
    val allBefore = Seq(1L, 2L, 3L).map(k => k -> snapshot(k)).toMap
    val audit3 = Streams.st08PagedIngest(spark, fetcher, landing, lake,
      ckpt, nParts = 8).collect()
    assert(audit3.isEmpty, audit3.mkString("; "))
    Seq(1L, 2L, 3L).foreach(k =>
      assert(snapshot(k) == allBefore(k), s"partition $k moved on a no-op drain"))

    // drain 4 (f17 through the SERVICE — VERDICT r17 next #1): a
    // conditional fetcher whose listing mtimes ride a metadata-only
    // bump plans both files copy_changed; with no validators stored
    // yet they re-copy ONCE and the responses' ETags land in the
    // landing zone's ledger
    val lakeAfter3 = lakeState()
    val cond1 = new Streams.CondLocalDirFetcher(remote, 3600000L, pageSize = 2)
    val audit4 = Streams.st08PagedIngest(spark, cond1, landing, lake,
      ckpt, nParts = 8).collect()
    assert(audit4.map(_.status).sorted.toSeq == Seq("copied", "copied"),
      audit4.mkString("; "))
    assert(audit4.forall(_.etag.nonEmpty), "validators must be captured")
    // the re-copied paths are stream-tracked: empty drain, lake as-is
    assert(lakeState() == lakeAfter3,
      "a seeding re-copy must not re-stream into the lake")
    // drain 5: ANOTHER metadata-only touch — every planned file now
    // answers 304 from the stored validators THROUGH the service
    // path: not_modified audit rows, ZERO body bytes, lake untouched
    val cond2 = new Streams.CondLocalDirFetcher(remote, 7200000L, pageSize = 2)
    val audit5 = Streams.st08PagedIngest(spark, cond2, landing, lake,
      ckpt, nParts = 8).collect()
    assert(audit5.map(_.status).sorted.toSeq ==
      Seq("not_modified", "not_modified"), audit5.mkString("; "))
    assert(audit5.forall(_.bytes == 0L), "a 304 must move zero body bytes")
    assert(lakeState() == lakeAfter3)
    // drain 6: the 304's mtime touch re-plans noop — empty plan
    val audit6 = Streams.st08PagedIngest(spark, cond2, landing, lake,
      ckpt, nParts = 8).collect()
    assert(audit6.isEmpty,
      s"a 304-confirmed file must re-plan as noop: ${audit6.mkString("; ")}")
  }

  // (LocalFsFetcher lives in the companion object: an inner class would
  // capture the non-serializable suite as $outer and break the
  // executor-shipped fetcher contract)

  test("st10 streamed vectors reach s08 probes; untouched cells bit-identical") {
    import spark.implicits._
    import graft.operators.Ann
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_st10")
    val index = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    val base = spark.read.parquet(s"${graft.TestSpark.Sf001}/embeddings.parquet")
    Ann.buildIvfIndex(
      base.filter(col("vec_id") =!= 0).select("vec_id", "embedding"), index)
    val qv = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).toArray

    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = Streams.st10IndexMaintain(
      input.toDS().toDF("vec_id", "embedding"), index, ckpt)
    // drain 1: a new vector equal to the query — must become the top hit
    input.addData((900001L, qv))
    q.processAllAvailable()
    val top1 = Ann.s08AnnIvfIndexed(spark, index, qv, k = 1).collect()
    assert(top1.head.getLong(0) == 900001L && top1.head.getDouble(1) == 1.0)

    // drain 2 touches only the query's cell: every other cell's files
    // must stay bit-identical (st07's confinement, on the index)
    def snapshot(cell: String): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(index, cell))
        .iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString ->
          (java.nio.file.Files.size(f),
            java.nio.file.Files.getLastModifiedTime(f).toMillis))
        .toMap
    }
    // partition discovery types the cell= dir value as INT — cast
    val qCell = spark.read.parquet(index)
      .filter(col("vec_id") === 900001L)
      .select(col("cell").cast("long")).head.getLong(0)
    val others = new java.io.File(index).listFiles()
      .map(_.getName).filter(_.startsWith("cell="))
      .filterNot(_ == s"cell=$qCell").toSeq
    assert(others.nonEmpty)
    val before = others.map(c => c -> snapshot(c)).toMap
    input.addData((900002L, qv))
    q.processAllAvailable()
    q.stop()
    val top2 = Ann.s08AnnIvfIndexed(spark, index, qv, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(900001L, 900002L))
    others.foreach(c => assert(snapshot(c) == before(c), s"$c was rewritten"))

    // replaying a delivered batch is an idempotent insert (vec_id dedup)
    val rowsBefore = spark.read.parquet(index)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    Ann.ivfUpsertBatch(Seq((900002L, qv)).toDF("vec_id", "embedding"), index)
    val rowsAfter = spark.read.parquet(index)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rowsAfter == rowsBefore)
  }

  test("st10 LSH twin: streamed vectors reach s07 probes; untouched sigs bit-identical") {
    import spark.implicits._
    import graft.operators.Ann
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_st10lsh")
    val index = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    val base = spark.read.parquet(s"${graft.TestSpark.Sf001}/embeddings.parquet")
    Ann.buildLshIndex(
      base.filter(col("vec_id") =!= 0).select("vec_id", "embedding"), index)
    val qv = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).toArray

    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = Streams.st10LshIndexMaintain(
      input.toDS().toDF("vec_id", "embedding"), index, ckpt)
    // drain 1: a new vector equal to the query — must become the top hit
    input.addData((900001L, qv))
    q.processAllAvailable()
    val top1 = Ann.s07AnnLshIndexed(spark, index, qv, k = 1).collect()
    assert(top1.head.getLong(0) == 900001L && top1.head.getDouble(1) == 1.0)

    // drain 2 touches only the query's signature: every other sig's
    // files must stay bit-identical (st07's confinement, on the index)
    def snapshot(sig: String): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(index, sig))
        .iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString ->
          (java.nio.file.Files.size(f),
            java.nio.file.Files.getLastModifiedTime(f).toMillis))
        .toMap
    }
    val qSig = spark.read
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, sig BIGINT")
      .parquet(index)
      .filter(col("vec_id") === 900001L)
      .select("sig").head.getLong(0)
    val others = new java.io.File(index).listFiles()
      .map(_.getName).filter(_.startsWith("sig="))
      .filterNot(_ == s"sig=$qSig").toSeq
    assert(others.nonEmpty)
    val before = others.map(s => s -> snapshot(s)).toMap
    input.addData((900002L, qv))
    q.processAllAvailable()
    q.stop()
    val top2 = Ann.s07AnnLshIndexed(spark, index, qv, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(900001L, 900002L))
    others.foreach(s => assert(snapshot(s) == before(s), s"$s was rewritten"))

    // replaying a delivered batch is an idempotent insert (vec_id dedup)
    val rowsBefore = spark.read.parquet(index)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    Ann.lshUpsertBatch(Seq((900002L, qv)).toDF("vec_id", "embedding"), index)
    val rowsAfter = spark.read.parquet(index)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rowsAfter == rowsBefore)
  }

  test("st06 stream-stream join attributes clicks within the horizon only") {
    import spark.implicits._
    val imps = MemoryStream[Event](spark)
    val clicks = MemoryStream[Event](spark)
    val q = st06StreamStreamJoin(imps.toDS(), clicks.toDS(),
      horizonMinutes = 10, watermark = "20 minutes")
      .writeStream.format("memory").queryName("st06_out")
      .outputMode(OutputMode.Append).start()
    // user 1: imp at 10:01 — clicks at 10:05 (in horizon) and 10:30 (out)
    // user 2: click at 10:06 with no impression → never emitted
    imps.addData(Event(100, ts(1), 1, "imp", 0))
    clicks.addData(
      Event(200, ts(5), 1, "click", 0), Event(201, ts(30), 1, "click", 0),
      Event(202, ts(6), 2, "click", 0))
    q.processAllAvailable()
    // a click arriving in a later batch still joins if within horizon
    clicks.addData(Event(203, ts(9), 1, "click", 0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT imp_id, click_id FROM st06_out ORDER BY click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(rows.toSeq == Seq((100L, 200L), (100L, 203L)), rows.toSeq)
  }

  test("st12 streaming pack offsets continue exactly across drains") {
    import spark.implicits._
    val input = MemoryStream[Streams.DocSize](spark)
    // append mode: the placements are emit-once rows, and append is
    // what file sinks require (the flatMapGroupsWithState form)
    val q = Streams.st12StreamPack(input.toDS(), seqLen = 8L)
      .writeStream.format("memory").queryName("st12_out")
      .outputMode("append").start()
    // drain 1: A gets docs 1(5 tok) and 3(10); B gets 2(7)
    input.addData(
      Streams.DocSize(3L, "A", 10L), Streams.DocSize(1L, "A", 5L),
      Streams.DocSize(2L, "B", 7L))
    q.processAllAvailable()
    // drain 2: A gets 5(4); B gets 4(9) and 6(2)
    input.addData(
      Streams.DocSize(5L, "A", 4L), Streams.DocSize(6L, "B", 2L),
      Streams.DocSize(4L, "B", 9L))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT doc_id, source, tok_start, seq_first, seq_last " +
        "FROM st12_out ORDER BY source, doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // per-source offsets: batch order within a drain is doc_id-sorted,
    // state carries the counter across drains; seqLen 8 boundaries
    assert(got.toSeq == Seq(
      (1L, "A", 0L, 0L, 0L),   // [0,5)
      (3L, "A", 5L, 0L, 1L),   // [5,15) straddles
      (5L, "A", 15L, 1L, 2L),  // [15,19) straddles
      (2L, "B", 0L, 0L, 0L),   // [0,7)
      (4L, "B", 7L, 0L, 1L),   // [7,16)
      (6L, "B", 16L, 2L, 2L))) // [16,18)
  }

  test("st13 admission gate rejects near-dups of earlier drains' admits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st13")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    // seed the lake with one long tagged document
    def doc(id: Long, tag: String) =
      (id, (1 to 30).map(i => s"w${i}_$tag").mkString(" "))
    Seq(doc(1L, "seed")).toDF("doc_id", "text")
      .write.parquet(s"$lake/batch=-1")

    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st13AdmitStream(
      input.toDS().toDF("doc_id", "text"), lake, ckpt)
    // drain 1: a near-dup of the seed (reject) + fresh content (admit)
    input.addData(
      (100L, doc(1L, "seed")._2 + " tail"), doc(200L, "fresh"))
    q.processAllAvailable()
    // drain 2: a near-dup of drain 1's ADMITTED doc (reject — the
    // lake the gate reads must have grown) + more fresh content
    input.addData(
      (300L, doc(200L, "fresh")._2 + " tail"), doc(400L, "other"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 200L, 400L),
      s"lake holds $ids — want seed + the two fresh docs only")

    // replay idempotency: re-running batch 1 against the grown lake
    // (which now CONTAINS batch 1's own output) must not empty it
    Streams.admitBatch(
      Seq((300L, doc(200L, "fresh")._2 + " tail"), doc(400L, "other"))
        .toDF("doc_id", "text"), lake, 1L)
    val after = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after == Set(1L, 200L, 400L), s"replay changed the lake: $after")
  }

  test("st14 fluency gate admits reference-like docs, rejects gibberish, replays clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st14")
    val lmPath = dir.resolve("lm").toString
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    // reference: one deterministic chain — every bigram (r_i, r_i+1)
    // has c12 = c1 = 1, so an in-domain doc scores mean_lp = 0 while
    // OOV gibberish scores ln(0.4/T) << 0
    val ref = Seq((1L, (1 to 40).map(i => s"r$i").mkString(" ")))
      .toDF("doc_id", "text")
    graft.operators.TextOps.lmTrainTables(ref, lmPath)

    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st14FluencyStream(
      input.toDS().toDF("doc_id", "text"), lmPath, lake, ckpt, minLp = -3.0)
    input.addData(
      (10L, (5 to 12).map(i => s"r$i").mkString(" ")), // fluent
      (11L, "zz qq ww ee rr tt"),                      // OOV junk
      (14L, "r7"))         // sub-bigram: unscorable, rejected by contract
    q.processAllAvailable()
    input.addData(
      (12L, (20 to 30).map(i => s"r$i").mkString(" ")),
      (13L, "xx yy zz aa bb cc"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(10L, 12L), s"lake holds $ids")
    // replay: re-running a batch body rewrites its own directory with
    // the same verdicts — stateless gate, idempotent landing
    Streams.fluencyBatch(
      Seq((10L, (5 to 12).map(i => s"r$i").mkString(" ")),
        (11L, "zz qq ww ee rr tt")).toDF("doc_id", "text"),
      lmPath, lake, batchId = 0L, minLp = -3.0)
    val after = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after == Set(10L, 12L), s"replay changed the lake: $after")
  }

  test("st16 classifier gate admits exemplar-like docs, rejects junk, replays clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st16")
    val modelPath = dir.resolve("model").toString
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    // the c16 hand corpus: positives share the "alpha beta" bigram
    val labeled = Seq(
      (1L, "alpha beta gamma", 1), (2L, "alpha beta delta", 1),
      (3L, "epsilon zeta eta", 0), (4L, "iota kappa lambda", 0),
      (5L, "mu nu xi omicron", 0)).toDF("doc_id", "text", "label")
    graft.operators.Corpus.c16ModelBuild(labeled, modelPath)

    val stream1 = Seq((10L, "alpha beta rho"), (11L, "qq ww ee rr"))
    val stream2 = Seq((12L, "alpha beta sigma tau"),
      (13L, "epsilon zeta eta"))
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st16ClassifierStream(
      input.toDS().toDF("doc_id", "text"), modelPath, lake, ckpt)
    input.addData(stream1: _*)
    q.processAllAvailable()
    input.addData(stream2: _*)
    q.processAllAvailable()
    q.stop()

    val ids = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the gate's verdicts ARE the indexed scorer's verdicts
    val expected = graft.operators.Corpus.c16ScoreIndexed(
      (stream1 ++ stream2).toDF("doc_id", "text"), modelPath)
      .filter(org.apache.spark.sql.functions.col("keep"))
      .collect().map(_.getLong(0)).toSet
    assert(ids == expected, s"lake $ids vs scorer $expected")
    // and the planted signal holds: exemplar-bigram docs admitted,
    // the training-negative lookalike rejected
    assert(ids.contains(10L) && ids.contains(12L) && !ids.contains(13L),
      s"lake holds $ids")
    // replay: re-running a batch body rewrites its own directory with
    // the same verdicts — stateless gate, idempotent landing
    Streams.classifierBatch(stream1.toDF("doc_id", "text"),
      modelPath, lake, batchId = 0L)
    val after = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after == ids, s"replay changed the lake: $after")
  }

  test("gate verdicts are per ROW: a twin sharing an admitted doc_id is judged alone") {
    import spark.implicits._
    // duplicate doc_ids inside one drain (a URL re-crawled, a buggy
    // upstream id mint) must not let one row's verdict ride another's
    // key: scoring by doc_id would MERGE the texts' features and then
    // key-join BOTH rows to the merged verdict (r15 review wave —
    // robotsGateBatch/piiScrubBatch already minted row ids; the three
    // standalone gate bodies now do too)
    val dir = java.nio.file.Files.createTempDirectory("graft_dupid")
    // st14: fluent text + a gibberish twin on the SAME id
    val lmPath = dir.resolve("lm").toString
    graft.operators.TextOps.lmTrainTables(
      Seq((1L, (1 to 40).map(i => s"r$i").mkString(" ")))
        .toDF("doc_id", "text"), lmPath)
    val fluent = (5 to 12).map(i => s"r$i").mkString(" ")
    val lakeF = dir.resolve("lakeF").toString
    Streams.fluencyBatch(
      Seq((7L, fluent), (7L, "zz qq ww ee rr tt"),
        (8L, "xx yy zz aa bb cc")).toDF("doc_id", "text"),
      lmPath, lakeF, batchId = 0L, minLp = -3.0)
    val landedF = spark.read.parquet(lakeF).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(landedF == Set((7L, fluent)),
      s"fluency gate landed $landedF — the twin must be judged alone")
    // st16: exemplar-like text + a junk twin on the SAME id
    val modelPath = dir.resolve("model").toString
    graft.operators.Corpus.c16ModelBuild(Seq(
      (1L, "alpha beta gamma", 1), (2L, "alpha beta delta", 1),
      (3L, "epsilon zeta eta", 0), (4L, "iota kappa lambda", 0),
      (5L, "mu nu xi omicron", 0)).toDF("doc_id", "text", "label"),
      modelPath)
    val lakeC = dir.resolve("lakeC").toString
    Streams.classifierBatch(
      Seq((7L, "alpha beta rho"), (7L, "qq ww ee rr"))
        .toDF("doc_id", "text"), modelPath, lakeC, batchId = 0L)
    val landedC = spark.read.parquet(lakeC).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(landedC == Set((7L, "alpha beta rho")),
      s"classifier gate landed $landedC")
    // st17: a clean row must NOT be anti-joined away by a contaminated
    // twin sharing its id (this one failed CLOSED before — still the
    // wrong rows)
    val benchPath = dir.resolve("bench").toString
    graft.operators.Corpus.c03BenchBuild(
      Seq((1L, (1 to 8).map(i => s"s$i").mkString(" ")))
        .toDF("doc_id", "text"), benchPath)
    val clean = (1 to 8).map(i => s"t$i").mkString(" ")
    val contaminated = (1 to 7).map(i => s"s$i").mkString(" ")
    val lakeD = dir.resolve("lakeD").toString
    Streams.contaminationBatch(
      Seq((7L, clean), (7L, contaminated)).toDF("doc_id", "text"),
      benchPath, lakeD, batchId = 0L)
    val landedD = spark.read.parquet(lakeD).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(landedD == Set((7L, clean)),
      s"decontam gate landed $landedD")
  }

  test("st19 drift monitor: matching batch zero, shifted batch maximal, replays clean") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max}
    val dir = java.nio.file.Files.createTempDirectory("graft_st19")
    val refPath = dir.resolve("ref").toString
    val driftPath = dir.resolve("drift").toString
    val ckpt = dir.resolve("ckpt").toString
    // identical token/char/source shape everywhere; lang is the dial
    def doc(id: Long, lang: String) = (id, "w1 w2 w3", lang, "web", 20L)
    val refDocs = (1L to 40L)
      .map(i => doc(i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Streams.st19RefBuild(refDocs, refPath)

    val batch0 = (101L to 110L).map(i => doc(i, if (i % 2 == 0) "en" else "fr"))
    val batch1 = (201L to 210L).map(i => doc(i, "zz"))
    val input = MemoryStream[(Long, String, String, String, Long)](spark)
    val q = Streams.st19DriftStream(
      input.toDS().toDF("doc_id", "text", "lang", "source", "n_chars"),
      refPath, driftPath, ckpt)
    input.addData(batch0: _*)
    q.processAllAvailable()
    input.addData(batch1: _*)
    q.processAllAvailable()
    q.stop()

    val drift = spark.read.parquet(driftPath)
    assert(drift.count() == 8) // 4 metrics × 2 batches
    // batch 0 matches the reference distribution exactly → TVD 0;
    // batch 1's language set is disjoint from the reference's → TVD 1
    // fresh read per call: the replay leg below rewrites batch files,
    // so a captured file index would go stale
    def langTvd(b: Int): Double = spark.read.parquet(driftPath)
      .filter(col("batch") === b && col("metric") === "lang")
      .head.getAs[Double]("tvd")
    assert(langTvd(0) == 0.0 && langTvd(1) == 1.0)
    // the unshifted dimensions stay zero in BOTH batches
    assert(drift.filter(col("metric") =!= "lang")
      .agg(max(col("tvd"))).head.getDouble(0) == 0.0)
    // replay: re-running a batch body rewrites its own directory with
    // identical rows — stateless monitor, idempotent landing
    Streams.driftBatch(
      batch1.toDF("doc_id", "text", "lang", "source", "n_chars"),
      refPath, driftPath, batchId = 1L)
    val after = spark.read.parquet(driftPath)
    assert(after.count() == 8 && langTvd(1) == 1.0)
  }

  test("st17 decontamination gate rejects benchmark-overlapping docs, replays clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st17")
    val benchPath = dir.resolve("bench").toString
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    def span(p: String, a: Int, b: Int) =
      (a to b).map(i => s"$p$i").mkString(" ")
    // the benchmark: one eval doc (the b-chain), shingled once
    graft.operators.Corpus.c03BenchBuild(
      Seq((1L, span("b", 1, 30))).toDF("doc_id", "text"), benchPath)

    val stream1 = Seq(
      // embeds an 8-token benchmark passage → 4 shared 5-shingles ≥ 3
      (10L, "x1 x2 " + span("b", 5, 12) + " x3 x4"),
      (11L, span("c", 1, 12)))                       // clean
    val stream2 = Seq(
      (12L, span("b", 10, 20)),                      // pure excerpt
      (13L, span("d", 1, 10)))                       // clean
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st17DecontamStream(
      input.toDS().toDF("doc_id", "text"), benchPath, lake, ckpt)
    input.addData(stream1: _*)
    q.processAllAvailable()
    input.addData(stream2: _*)
    q.processAllAvailable()
    q.stop()

    val ids = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(11L, 13L), s"lake holds $ids")
    // replay: re-running a batch body rewrites its own directory with
    // the same verdicts — stateless gate, idempotent landing
    Streams.contaminationBatch(stream1.toDF("doc_id", "text"),
      benchPath, lake, batchId = 0L)
    val after = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after == ids, s"replay changed the lake: $after")
  }

  test("st24 robots gate: noindex pages never land, conservation, idempotent replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st24")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    def page(id: Long, meta: String) =
      (id, s"<html><head>$meta</head><body><p>doc $id</p></body></html>")
    val stream1 = Seq(
      page(1L, ""),
      page(2L, "<meta name=\"robots\" content=\"noindex\"/>"),
      page(3L, "<meta name=\"robots\" content=\"index, nofollow\"/>"))
    val stream2 = Seq(
      page(4L, "<META NAME=\"ROBOTS\" CONTENT=\"NOINDEX\"/>"),
      page(5L, "<meta name=\"robots\" content=\"none\"/>"),
      page(6L, ""))
    // a URL re-crawled WITHIN one micro-batch: same doc_id, one clean
    // and one noindex body — the verdict is per ROW (a key-join gate
    // would admit both)
    val stream3 = Seq(page(7L, ""),
      page(7L, "<meta name=\"robots\" content=\"noindex\"/>"))
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st24RobotsGate(
      input.toDS().toDF("doc_id", "html"), lake, ckpt)
    input.addData(stream1: _*)
    q.processAllAvailable()
    input.addData(stream2: _*)
    q.processAllAvailable()
    input.addData(stream3: _*)
    q.processAllAvailable()
    q.stop()
    // the dup-key drain landed ONLY the clean row
    val b2 = spark.read.parquet(s"$lake/batch=2").collect()
    assert(b2.length == 1 && !b2.head.getAs[String]("html").contains("noindex"),
      s"dup-key drain landed ${b2.length} rows")
    // ONLY publisher-permitted pages land: noindex (any case) and
    // 'none' are out, nofollow-only still indexes
    val landed = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == Set(1L, 3L, 6L, 7L), s"landed $landed")
    // audit conserves arrived = admitted + noindex, per batch — ROW
    // counts, so the dup-key drain audits (2, 1, 1)
    val audit = spark.read.parquet(lake + ".audit")
      .collect().map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("arrived"), r.getAs[Long]("admitted"),
          r.getAs[Long]("noindex"), r.getAs[Long]("nofollow"))).toMap
    assert(audit(0L) == ((3L, 2L, 1L, 1L)) && audit(1L) == ((3L, 1L, 2L, 1L))
      && audit(2L) == ((2L, 1L, 1L, 0L)), s"audit $audit")
    audit.values.foreach { case (a, ad, ni, _) => assert(a == ad + ni) }
    // replay: re-running a drained batch overwrites its own directory
    // byte-identically (stateless verdicts, per-batch Overwrite)
    Streams.robotsGateBatch(stream1.toDF("doc_id", "html"), lake, batchId = 0L)
    val after = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after == landed, s"replay changed the lake: $after")
    // NULL html (nullable source column) fails CLOSED — never admitted,
    // audited as noindex, and an ALL-null drain must not NPE the
    // stream on a null aggregate sum
    Streams.robotsGateBatch(
      Seq((8L, null: String), (9L, null: String)).toDF("doc_id", "html"),
      lake, batchId = 5L)
    val a5 = spark.read.parquet(lake + ".audit").where("batch_id = 5")
      .collect().head
    assert((a5.getAs[Long]("arrived"), a5.getAs[Long]("admitted"),
      a5.getAs[Long]("noindex")) == ((2L, 0L, 2L)), s"null-html audit $a5")
  }

  test("st25 sitemap discovery: decoys stop at parse, gate dedupes, replay idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_st25")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    def sm(host: String, locs: Seq[String]) =
      (host, "<?xml version=\"1.0\"?>\n<urlset>\n" +
        locs.map(l => s"  <url>\n    <loc>$l</loc>\n  </url>\n").mkString +
        "</urlset>\n")
    val drain1 = Seq(
      sm("a.example.com", Seq(
        "https://a.example.com/p/1",
        "https://a.example.com/p/2",
        "https://b.example.com/decoy")), // cross-host decoy
      sm("b.example.com", Seq("https://b.example.com/p/1")))
    // drain 2: a re-ANNOUNCED URL plus a new one — the persisted
    // canonical-URL index (not in-batch rank) must reject the former
    val drain2 = Seq(
      sm("a.example.com", Seq(
        "https://a.example.com/p/1",
        "https://a.example.com/p/9")))
    val input = MemoryStream[(String, String)](spark)
    val q = Streams.st25SitemapDiscoverStream(
      input.toDS().toDF("host", "xml"), lake, ckpt)
    input.addData(drain1: _*)
    q.processAllAvailable()
    input.addData(drain2: _*)
    q.processAllAvailable()
    q.stop()
    // the discovery landing keeps EVERY parsed entry, decoy flagged
    val disc = spark.read.parquet(lake + ".discovered")
    assert(disc.count() == 6, s"discovered ${disc.count()}")
    assert(disc.filter(col("in_scope") === 0L).collect()
      .map(_.getAs[String]("loc")).toSeq ==
      Seq("https://b.example.com/decoy"), "decoy flagging")
    // the decoy never reaches the admitted lake; the re-announced URL
    // admits exactly once (first drain)
    val landed = spark.read.parquet(lake).select("url")
      .collect().map(_.getString(0)).toSet
    assert(landed == Set("https://a.example.com/p/1",
      "https://a.example.com/p/2", "https://b.example.com/p/1",
      "https://a.example.com/p/9"), s"landed $landed")
    val b1 = spark.read.parquet(s"$lake/batch=1").select("url")
      .collect().map(_.getString(0)).toSet
    assert(b1 == Set("https://a.example.com/p/9"), s"batch 1 landed $b1")
    // discovery audit conserves entries = in_scope + cross_host
    val audit = spark.read.parquet(lake + ".discovered.audit").collect()
      .map(r => r.getAs[Long]("batch_id") -> (r.getAs[Long]("entries"),
        r.getAs[Long]("in_scope"), r.getAs[Long]("cross_host"))).toMap
    assert(audit(0L) == ((4L, 3L, 1L)) && audit(1L) == ((2L, 2L, 0L)),
      s"discovery audit $audit")
    audit.values.foreach { case (e, i, c) => assert(e == i + c) }
    // st20's own audit accounts the admission half: drain 2 saw 2
    // in-scope URLs arrive, admitted 1, lake-duped 1
    val gAudit = spark.read.parquet(lake + ".audit").collect()
      .map(r => r.getAs[Long]("batch_id") -> (r.getAs[Long]("arrived"),
        r.getAs[Long]("admitted"), r.getAs[Long]("dup_lake"))).toMap
    assert(gAudit(1L) == ((2L, 1L, 1L)), s"gate audit $gAudit")
    // replay drain 1: Overwrite landings + the self-batch-excluding
    // index probe re-derive the identical lake
    Streams.sitemapDiscoverBatch(drain1.toDF("host", "xml"), lake,
      batchId = 0L)
    val after = spark.read.parquet(lake).select("url")
      .collect().map(_.getString(0)).toSet
    assert(after == landed, s"replay changed the lake: $after")
    // the same <loc> announced TWICE in one drain collapses to ONE
    // admitted row: the minted doc_ids tie exactly (xxhash64 of the
    // same URL), which a min-filter winner kept twice — row_number
    // collapses the tie and the audit counts the in-batch dup
    Streams.sitemapDiscoverBatch(Seq(
      sm("d.example.com", Seq("https://d.example.com/p/1",
        "https://d.example.com/p/1"))).toDF("host", "xml"),
      lake, batchId = 9L)
    assert(spark.read.parquet(s"$lake/batch=9").count() == 1,
      "tied duplicate URLs landed more than once")
    val g9 = spark.read.parquet(s"$lake.audit").where("batch_id = 9")
      .collect().head
    assert((g9.getAs[Long]("arrived"), g9.getAs[Long]("admitted"),
      g9.getAs[Long]("dup_batch")) == ((2L, 1L, 1L)), s"tie audit $g9")
    // canonical-URL index compaction: fold everything ≤ 9 into the
    // watermark base, verdicts identical off the base, folded dirs gone
    Streams.urlGateCompactIndex(spark, lake, upTo = 9L)
    val idirs = new java.io.File(s"$lake.urlindex").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(idirs == Set("batch=-11"), s"urlindex dirs after compaction: $idirs")
    Streams.sitemapDiscoverBatch(Seq(
      sm("d.example.com", Seq("https://d.example.com/p/1")))
      .toDF("host", "xml"), lake, batchId = 10L)
    val g10 = spark.read.parquet(s"$lake.audit").where("batch_id = 10")
      .collect().head
    assert((g10.getAs[Long]("admitted"), g10.getAs[Long]("dup_lake")) ==
      ((0L, 1L)), s"compacted index lost an admitted URL: $g10")
    // poison-pill guard: a non-empty drain whose sitemaps parse to
    // ZERO entries (empty urlset, garbage) must not throw — the NULL
    // in-scope sum is coalesced and the audit records zeros
    Streams.sitemapDiscoverBatch(
      Seq(("c.example.com", "<?xml version=\"1.0\"?>\n<urlset></urlset>\n"),
        ("d.example.com", "not xml at all")).toDF("host", "xml"),
      lake, batchId = 7L)
    val a7 = spark.read.parquet(lake + ".discovered.audit")
      .where("batch_id = 7").collect().head
    assert((a7.getAs[Long]("entries"), a7.getAs[Long]("in_scope"),
      a7.getAs[Long]("cross_host")) == ((0L, 0L, 0L)), s"zero-entry audit $a7")
    // feed GC (the consumer-owns-GC contract): the .discovered landing
    // and its audit grow one directory per drain — a consumer that has
    // fully processed batches ≤ 7 drops them, later batches survive,
    // and a repeated call is a no-op
    def feedDirs(sfx: String): Set[String] =
      new java.io.File(lake + sfx).listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(feedDirs(".discovered") ==
      Set("batch=0", "batch=1", "batch=7", "batch=9", "batch=10"),
      s"pre-GC dirs: ${feedDirs(".discovered")}")
    Streams.dropConsumedBatches(spark, lake + ".discovered", upTo = 7L)
    Streams.dropConsumedBatches(spark, lake + ".discovered.audit", upTo = 7L)
    assert(feedDirs(".discovered") == Set("batch=9", "batch=10"),
      s"post-GC dirs: ${feedDirs(".discovered")}")
    assert(feedDirs(".discovered.audit") == Set("batch=9", "batch=10"))
    // kept batches are intact and readable
    assert(spark.read.parquet(s"$lake.discovered/batch=9").count() == 2)
    // idempotent: a second sweep changes nothing, a missing root is a
    // no-op (never an exception)
    Streams.dropConsumedBatches(spark, lake + ".discovered", upTo = 7L)
    assert(feedDirs(".discovered") == Set("batch=9", "batch=10"))
    Streams.dropConsumedBatches(spark, lake + ".never-existed", upTo = 7L)
  }

  test("st27 discovery bootstrap: robots+index drains land the sitemap feed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st27")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    val robots = ("a.example.com", "robots",
      "User-agent: *\nDisallow: /x\n" +
        "Sitemap: https://a.example.com/sitemap_index.xml\n" +
        "sitemap: https://cdn.example.net/a.xml # mirror")
    val index = ("a.example.com", "index",
      "<?xml version=\"1.0\"?>\n<sitemapindex>\n" +
        "  <sitemap>\n    <loc>https://a.example.com/sm/0.xml</loc>\n" +
        "    <lastmod>2026-02-03</lastmod>\n  </sitemap>\n" +
        "  <sitemap>\n    <loc>https://b.example.com/sm/9.xml</loc>\n" +
        "  </sitemap>\n</sitemapindex>\n")
    val input = MemoryStream[(String, String, String)](spark)
    val q = Streams.st27DiscoveryBootstrapStream(
      input.toDS().toDF("host", "kind", "payload"), lake, ckpt)
    input.addData(robots, index)
    q.processAllAvailable()
    q.stop()
    // the feed holds ONLY the in-scope announcements — the same-host
    // robots directive and the same-host index child; both decoys
    // (the cross-host cdn mirror, the cross-host index entry) stop
    // at the audit
    val feed = spark.read.parquet(s"$lake.sitemaps/batch=0")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(feed == Set(
      ("robots", "https://a.example.com/sitemap_index.xml", ""),
      ("index", "https://a.example.com/sm/0.xml", "2026-02-03")),
      s"feed: $feed")
    val a = spark.read.parquet(s"$lake.sitemaps.audit")
      .where("batch_id = 0").collect().head
    assert((a.getAs[Long]("announced"), a.getAs[Long]("in_scope"),
      a.getAs[Long]("cross_host"), a.getAs[Long]("from_robots"),
      a.getAs[Long]("from_index")) == ((4L, 2L, 2L, 2L, 2L)), s"audit $a")
    // replay: Overwrite landings re-derive the identical feed
    Streams.discoveryBootstrapBatch(
      Seq(robots, index).toDF("host", "kind", "payload"), lake, batchId = 0L)
    val replayed = spark.read.parquet(s"$lake.sitemaps/batch=0")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(replayed == feed.map(t => (t._1, t._2)),
      s"replay changed the feed: $replayed")
    // poison-pill guard: a non-empty drain whose payloads announce
    // NOTHING (comment-only robots, empty index) must not NPE — the
    // audit records zeros
    Streams.discoveryBootstrapBatch(Seq(
      ("c.example.com", "robots", "# nothing here\nUser-agent: *\n"),
      ("d.example.com", "index", "<sitemapindex></sitemapindex>"))
      .toDF("host", "kind", "payload"), lake, batchId = 7L)
    val a7 = spark.read.parquet(s"$lake.sitemaps.audit")
      .where("batch_id = 7").collect().head
    assert((a7.getAs[Long]("announced"), a7.getAs[Long]("in_scope")) ==
      ((0L, 0L)), s"zero-announcement audit $a7")
  }

  test("st26 recrawl stream: ledger-driven freshness, latest-lastmod wins, replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st26")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    def sm(host: String, entries: Seq[(String, String)]) =
      (host, "<?xml version=\"1.0\"?>\n<urlset>\n" +
        entries.map { case (l, lm) =>
          "  <url>\n    <loc>" + l + "</loc>\n" +
            (if (lm.isEmpty) "" else s"    <lastmod>$lm</lastmod>\n") +
            "  </url>\n"
        }.mkString + "</urlset>\n")
    val u1 = "https://a.example.com/u1"
    val u2 = "https://a.example.com/u2"
    val u3 = "https://a.example.com/u3"
    val u4 = "https://b.example.com/u4"
    val drain1 = Seq(sm("a.example.com", Seq(
      (u1, "2026-01-05"), (u2, ""),
      ("https://evil.example.com/x", "2026-01-01")))) // cross-host decoy
    val drain2 = Seq(
      sm("a.example.com", Seq(
        (u1, "2026-01-05"), // unchanged → fresh
        // timestamp suffix: comparisons use the date PREFIX, the feed
        // must still carry this verbatim raw alongside
        (u2, "2026-01-07T08:00:00Z"), // date appears over stored '' → stale
        (u3, ""))), // never seen → new
      // u4 announced TWICE in one drain — the later date must win
      sm("b.example.com", Seq((u4, "2026-01-02"))),
      sm("b.example.com", Seq((u4, "2026-01-09"))))
    val input = MemoryStream[(String, String)](spark)
    val q = Streams.st26RecrawlStream(
      input.toDS().toDF("host", "xml"), lake, ckpt)
    input.addData(drain1: _*)
    q.processAllAvailable()
    input.addData(drain2: _*)
    q.processAllAvailable()
    q.stop()
    // drain 1: both in-scope URLs are new; the decoy never plans
    val b0 = spark.read.parquet(s"$lake.refetch/batch=0")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(b0 == Map(u1 -> "new", u2 -> "new"), s"batch 0: $b0")
    // drain 2: ledger (not in-batch state) verdicts; latest lastmod
    // of a twice-announced URL wins
    val b1 = spark.read.parquet(s"$lake.refetch/batch=1")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(b1 == Map(u2 -> (("2026-01-07", "stale")),
      u3 -> (("", "new")), u4 -> (("2026-01-09", "new"))), s"batch 1: $b1")
    // the feed carries the winning announcement's RAW lastmod beside
    // the normalized one (the batch g10 kernel's value) — comparisons
    // used the date prefix, the verbatim string survives
    val b1raw = spark.read.parquet(s"$lake.refetch/batch=1")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(b1raw(u2) == "2026-01-07T08:00:00Z", s"raw lastmod: $b1raw")
    // audits conserve both identities
    val audit = spark.read.parquet(s"$lake.refetch.audit").collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("entries"), r.getAs[Long]("in_scope"),
          r.getAs[Long]("cross_host"), r.getAs[Long]("n_urls"),
          r.getAs[Long]("n_new"), r.getAs[Long]("n_stale"),
          r.getAs[Long]("n_fresh"))).toMap
    assert(audit(0L) == ((3L, 2L, 1L, 2L, 2L, 0L, 0L)), s"audit0 ${audit(0L)}")
    assert(audit(1L) == ((5L, 5L, 0L, 4L, 2L, 1L, 1L)), s"audit1 ${audit(1L)}")
    audit.values.foreach { case (e, i, c, u, nw, st, fr) =>
      assert(e == i + c && u == nw + st + fr)
    }
    // replay the LAST drain: the self-batch-excluding probe re-derives
    // the identical refetch plan
    Streams.recrawlBatch(drain2.toDF("host", "xml"), lake, batchId = 1L)
    val b1r = spark.read.parquet(s"$lake.refetch/batch=1")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(b1r == b1.map { case (k, v) => k -> v._2 },
      s"replay changed the plan: $b1r")
    // zero-entry drain never throws; audit records zeros
    Streams.recrawlBatch(
      Seq(("c.example.com", "<urlset></urlset>")).toDF("host", "xml"),
      lake, batchId = 7L)
    val a7 = spark.read.parquet(s"$lake.refetch.audit")
      .where("batch_id = 7").collect().head
    assert((a7.getAs[Long]("entries"), a7.getAs[Long]("n_urls")) == ((0L, 0L)))
    // lastmod validation: 'TBD' sorts above every ISO date lexically
    // — unvalidated it would append to the ledger and wedge u1 as
    // never-stale via the MAX; validated it is fresh, writes nothing,
    // and a LATER genuine date still goes stale
    Streams.recrawlBatch(Seq(sm("a.example.com", Seq((u1, "TBD"))))
      .toDF("host", "xml"), lake, batchId = 8L)
    val a8 = spark.read.parquet(s"$lake.refetch.audit")
      .where("batch_id = 8").collect().head
    assert(a8.getAs[Long]("n_fresh") == 1L, "malformed lastmod not fresh")
    Streams.recrawlBatch(Seq(sm("a.example.com", Seq((u1, "2027-06-01"))))
      .toDF("host", "xml"), lake, batchId = 9L)
    val b9 = spark.read.parquet(s"$lake.refetch/batch=9")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(b9 == Map(u1 -> "stale"), s"post-TBD update not stale: $b9")
    // ledger compaction: fold everything ≤ 9 into the watermark base;
    // verdicts must be IDENTICAL off the compacted base, and the
    // folded batch directories are gone
    Streams.recrawlCompactLedger(spark, lake, upTo = 9L)
    val dirs = new java.io.File(s"$lake.lastmod").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs == Set("batch=-11"), s"ledger dirs after compaction: $dirs")
    Streams.recrawlBatch(Seq(sm("a.example.com", Seq((u1, "2027-06-01"))))
      .toDF("host", "xml"), lake, batchId = 10L)
    val a10 = spark.read.parquet(s"$lake.refetch.audit")
      .where("batch_id = 10").collect().head
    assert(a10.getAs[Long]("n_fresh") == 1L,
      "compacted ledger lost u1's state")
  }

  test("st28 fetch drain: consumes both feeds over live HTTP, conserves, GCs, replays") {
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_st28")
    val lake = dir.resolve("lake").toString
    val dest = dir.resolve("dest").toString
    val ckpt = dir.resolve("ckpt").toString
    val u1 = "https://a.example.com/p/1"
    val u2 = "https://a.example.com/p/2"
    // the "web": one sitemap FILE and two content URLs with server-side
    // validators (ims >= lastmod → 304); /sm/missing.xml 404s
    val smXml = "<?xml version=\"1.0\"?>\n<urlset>\n" +
      s"  <url><loc>$u1</loc><lastmod>2026-01-03</lastmod></url>\n" +
      s"  <url><loc>$u2</loc><lastmod>2026-01-05</lastmod></url>\n" +
      "</urlset>\n"
    val content = Map(
      "/c/a.example.com/sm0.xml" -> (smXml, "1970-01-01"),
      "/c/a.example.com/p/1" -> ("alpha", "2026-01-02"),
      "/c/a.example.com/p/2" -> ("bravo-v2", "2026-01-21"))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def send(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext("/c/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath
      val ims = ex.getRequestHeaders.getFirst("If-Modified-Since")
      // the wire form is IMF-fixdate (r15: RFC 9110 §13.1.3 — servers
      // ignore anything else); convert back to the fixture's ISO form
      val imsIso =
        if (ims == null) null
        else graft.sources.PagedSourceSpec.httpDateToIso(ims)
      content.get(id) match {
        case Some((_, lm)) if imsIso != null && imsIso >= lm =>
          send(ex, 304, Array.empty)
        case Some((body, _)) =>
          send(ex, 200, body.getBytes(StandardCharsets.UTF_8))
        case None => send(ex, 404, Array.empty)
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      val traps = Seq.empty[(String, String, Long)]
        .toDF("host", "template", "is_trap")
      // seed st27's feed: one fetchable announcement + one that 404s
      val robots = ("a.example.com", "robots",
        "User-agent: *\nSitemap: https://a.example.com/sm0.xml\n" +
          "Sitemap: https://a.example.com/sm/missing.xml\n")
      Streams.discoveryBootstrapBatch(
        Seq(robots).toDF("host", "kind", "payload"), lake, batchId = 1L)
      // seed st26's ledger + feed: drain 1 makes both URLs new
      // (unconditional fetches), drain 2 re-announces with later
      // lastmods → stale rows whose stored validators are drain 1's
      // dates — u1's server copy (2026-01-02) is NOT newer than the
      // stored 2026-01-03, so the conditional fetch 304s; u2's is.
      // The pathless in-scope loc exercises the bad_url audit path.
      def sm(entries: Seq[(String, String)]) = ("a.example.com",
        "<?xml version=\"1.0\"?>\n<urlset>\n" + entries.map { case (l, lm) =>
          s"  <url><loc>$l</loc>" +
            (if (lm.isEmpty) "" else s"<lastmod>$lm</lastmod>") + "</url>\n"
        }.mkString + "</urlset>\n")
      Streams.recrawlBatch(Seq(sm(Seq((u1, "2026-01-03"),
        (u2, "2026-01-05")))).toDF("host", "xml"), lake, batchId = 1L)
      Streams.recrawlBatch(Seq(sm(Seq((u1, "2026-01-05"),
        (u2, "2026-01-21"), ("https://a.example.com", "2026-01-22"))))
        .toDF("host", "xml"), lake, batchId = 2L)
      // one tick of the st28 stream consumes BOTH feeds
      val ticks = MemoryStream[Int](spark)
      val q = Streams.st28FetchDrainStream(ticks.toDS().toDF(), lake,
        fetcher, traps, dest, ckpt)
      ticks.addData(1)
      q.processAllAvailable()
      q.stop()
      // --- sitemap drain: the landed (host, xml) IS st25/st26's input
      val xmlRows = spark.read.parquet(s"$lake.sitemapxml/batch=1")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(xmlRows.length == 1 && xmlRows.head._2.endsWith("/sm0.xml") &&
        xmlRows.head._3 == smXml, s"xml feed: ${xmlRows.toSeq}")
      val parsed = graft.operators.Graph.sitemapExtractOver(
        spark.read.parquet(s"$lake.sitemapxml/batch=1"))
        .collect().map(_.getAs[String]("loc")).toSet
      assert(parsed == Set(u1, u2), "landed XML must parse through g08")
      val smA = spark.read.parquet(s"$lake.sitemapxml.audit/batch=1")
        .collect().head
      assert((smA.getAs[Long]("planned"), smA.getAs[Long]("fetched"),
        smA.getAs[Long]("skipped"), smA.getAs[Long]("failed")) ==
        ((2L, 1L, 0L, 1L)), s"sitemap audit: $smA")
      // --- refetch drain: batch 1 fetched both unconditionally;
      // batch 2 304'd u1, refetched u2, bad_url'd the pathless loc
      val fa = spark.read.parquet(s"$lake.fetched.audit").collect()
        .map(r => r.getAs[Long]("batch_id") ->
          (r.getAs[Long]("planned"), r.getAs[Long]("fetched"),
            r.getAs[Long]("not_modified"), r.getAs[Long]("skipped"),
            r.getAs[Long]("failed"))).toMap
      assert(fa(1L) == ((2L, 2L, 0L, 0L, 0L)), s"audit1: ${fa(1L)}")
      assert(fa(2L) == ((3L, 1L, 1L, 1L, 0L)), s"audit2: ${fa(2L)}")
      val b2 = spark.read.parquet(s"$lake.fetched/batch=2").collect()
      assert(b2.find(_.getAs[String]("src") == u1)
        .get.getAs[String]("status") == "not_modified")
      assert(b2.find(_.getAs[String]("error") == "bad_url")
        .get.getAs[String]("src") == "https://a.example.com")
      // content landed under destRoot/<host><path>, refreshed by batch 2
      assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dest, "a.example.com", "p", "2"))
        == "bravo-v2")
      // --- consumer-owned GC: both consumed feeds are EMPTY now
      assert(new java.io.File(s"$lake.sitemaps").listFiles()
        .forall(!_.getName.startsWith("batch=")), "sitemap feed not GC'd")
      assert(new java.io.File(s"$lake.refetch").listFiles()
        .forall(!_.getName.startsWith("batch=")), "refetch feed not GC'd")
      // an idle tick is a no-op against drained feeds
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq.empty)
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest)
        == Seq.empty)
      // --- replay safety: the PRODUCER re-lands its batch (crash
      // between its landing and our consumption), the drain re-derives
      // the identical landing via Overwrite and GCs again
      Streams.discoveryBootstrapBatch(
        Seq(robots).toDF("host", "kind", "payload"), lake, batchId = 1L)
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(1L))
      val replayed = spark.read.parquet(s"$lake.sitemapxml/batch=1")
        .collect().map(r => (r.getString(1), r.getString(2))).toSet
      assert(replayed == xmlRows.map(t => (t._2, t._3)).toSet,
        "replayed drain changed the landing")
    } finally server.stop(0)
  }

  test("st28 sitemap drain inflates gzipped sitemaps (sitemap.xml.gz)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st28_gz")
    val lake = dir.resolve("lake").toString
    val xml = "<?xml version=\"1.0\"?>\n<urlset>\n" +
      "  <url><loc>https://a.example.com/p/1</loc></url>\n</urlset>\n"
    // seed st27's feed directly: one gzipped announcement, one plain
    Seq(
      ("a.example.com", "robots", "https://a.example.com/sm.xml.gz", ""),
      ("a.example.com", "robots", "https://a.example.com/sm.xml", ""))
      .toDF("host", "source", "loc", "lastmod")
      .write.parquet(s"$lake.sitemaps/batch=1")
    val fetcher = new graft.sources.PagedSource.PageFetcher {
      override def listPage(dirId: String, token: Option[String])
          : graft.sources.PagedSource.Page =
        throw new UnsupportedOperationException("content-only fake")
      override def open(fileId: String): java.io.InputStream = {
        val plain = xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bytes =
          if (fileId.endsWith(".gz")) graft.sources.WarcSource.gzip(plain)
          else plain
        new java.io.ByteArrayInputStream(bytes)
      }
    }
    assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(1L))
    val landed = spark.read.parquet(s"$lake.sitemapxml/batch=1")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    // BOTH forms land as the same parseable XML text — raw gzip bytes
    // decoded as UTF-8 would be garbage g08 parses to zero entries
    assert(landed == Map(
      "https://a.example.com/sm.xml.gz" -> xml,
      "https://a.example.com/sm.xml" -> xml), s"landed: $landed")
    val parsed = graft.operators.Graph.sitemapExtractOver(
      spark.read.parquet(s"$lake.sitemapxml/batch=1"))
      .collect().map(_.getAs[String]("loc"))
    assert(parsed.toSeq == Seq("https://a.example.com/p/1",
      "https://a.example.com/p/1"), "gz sitemap must parse through g08")
  }

  test("st28 index chase: a fetched sitemapindex expands once, children fetch next tick") {
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_st28_idx")
    val lake = dir.resolve("lake").toString
    def urlset(locs: String*): String =
      "<?xml version=\"1.0\"?>\n<urlset>\n" + locs.map(l =>
        s"  <url><loc>$l</loc></url>\n").mkString + "</urlset>\n"
    def index(locs: String*): String =
      "<?xml version=\"1.0\"?>\n<sitemapindex>\n" + locs.map(l =>
        s"  <sitemap>\n    <loc>$l</loc>\n  </sitemap>\n").mkString +
        "</sitemapindex>\n"
    val pages = Map(
      // the announced file is an INDEX: two in-scope children, one
      // cross-host decoy (must stop here), one NESTED index child
      "/c/a.example.com/sm_index.xml" -> index(
        "https://a.example.com/c1.xml", "https://a.example.com/c2.xml",
        "https://evil.example.com/x.xml",
        "https://a.example.com/nested_index.xml"),
      "/c/a.example.com/c1.xml" -> urlset("https://a.example.com/p/1"),
      "/c/a.example.com/c2.xml" -> urlset("https://a.example.com/p/2"),
      "/c/a.example.com/nested_index.xml" ->
        index("https://a.example.com/deep.xml"))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/c/", (ex: HttpExchange) => {
      pages.get(ex.getRequestURI.getPath) match {
        case Some(body) =>
          val b = body.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      Seq(("a.example.com", "robots",
          "https://a.example.com/sm_index.xml", ""))
        .toDF("host", "source", "loc", "lastmod")
        .write.parquet(s"$lake.sitemaps/batch=1")
      // tick 1: the index is fetched, recognized, and EXPANDED — not
      // landed as urlset XML (g08 would parse it to zero entries and
      // every child silently vanish)
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher)
        == Seq(1L))
      val a1 = spark.read.parquet(s"$lake.sitemapxml.audit/batch=1")
        .collect().head
      assert((a1.getAs[Long]("planned"), a1.getAs[Long]("fetched"),
        a1.getAs[Long]("indexes"), a1.getAs[Long]("index_children")) ==
        ((1L, 1L, 1L, 3L)), s"index audit: $a1")
      assert(spark.read.parquet(s"$lake.sitemapxml/batch=1").count() == 0L,
        "an index file must not land as urlset XML")
      val childId = Streams.IndexChildBase + 1L
      val kids = spark.read.parquet(s"$lake.sitemaps/batch=$childId")
        .collect().map(_.getAs[String]("loc")).toSet
      assert(kids == Set("https://a.example.com/c1.xml",
        "https://a.example.com/c2.xml",
        "https://a.example.com/nested_index.xml"),
        s"children: $kids (the cross-host decoy must stop at the chase)")
      // tick 2: the children fetch; the nested index is refused at
      // depth two (sitemaps.org forbids nesting — a self-referencing
      // index cannot loop the drain)
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher)
        == Seq(childId))
      val a2 = spark.read
        .parquet(s"$lake.sitemapxml.audit/batch=$childId").collect().head
      assert((a2.getAs[Long]("planned"), a2.getAs[Long]("fetched"),
        a2.getAs[Long]("skipped"), a2.getAs[Long]("indexes"),
        a2.getAs[Long]("index_children")) == ((3L, 2L, 1L, 0L, 0L)),
        s"child audit: $a2")
      val locs = graft.operators.Graph.sitemapExtractOver(
        spark.read.parquet(s"$lake.sitemapxml/batch=$childId"))
        .collect().map(_.getAs[String]("loc")).toSet
      assert(locs == Set("https://a.example.com/p/1",
        "https://a.example.com/p/2"), s"parsed: $locs")
      // no second-level expansion batch exists, and the feed drained
      assert(new java.io.File(s"$lake.sitemaps").listFiles()
        .forall(!_.getName.startsWith("batch=")),
        "feed not GC'd / nested expansion leaked")
    } finally server.stop(0)
  }

  test("st28 validator ledger: captured ETag drives the next drain's If-None-Match") {
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_st28_led")
    val lake = dir.resolve("lake").toString
    val dest = dir.resolve("dest").toString
    val u1 = "https://a.example.com/p/1"
    val u2 = "https://a.example.com/p/2"
    // request log: (path, If-None-Match, If-Modified-Since)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, String, String)]()
    // /p/2's resource CHANGES after its first serve (version counter):
    // the stored "a" validator must then miss and the 200 must hand
    // back the NEW etag for the ledger to store
    val p2Served = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def send(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext("/c/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val inm = ex.getRequestHeaders.getFirst("If-None-Match")
      val ims = ex.getRequestHeaders.getFirst("If-Modified-Since")
      seen.add((path, String.valueOf(inm), String.valueOf(ims)))
      def ok(body: String, etag: String, lm: String): Unit = {
        ex.getResponseHeaders.add("ETag", etag)
        ex.getResponseHeaders.add("Last-Modified", lm)
        send(ex, 200, body.getBytes(StandardCharsets.UTF_8))
      }
      path match {
        case "/c/a.example.com/p/1" =>
          if (inm == "\"tag-1\"") send(ex, 304, Array.empty)
          else ok("v1", "\"tag-1\"", "Mon, 05 Jan 2026 00:00:00 GMT")
        case "/c/a.example.com/p/2" =>
          val cur = if (p2Served.getAndIncrement() == 0) "\"a\"" else "\"b\""
          if (inm == cur) send(ex, 304, Array.empty)
          else ok(if (cur == "\"a\"") "v1" else "v2", cur,
            "Tue, 06 Jan 2026 00:00:00 GMT")
        case _ => send(ex, 404, Array.empty)
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      val traps = Seq.empty[(String, String, Long)]
        .toDF("host", "template", "is_trap")
      def feed(id: Long, rows: Seq[(String, String, String)]): Unit =
        rows.map { case (url, status, stored) =>
          (url, "", status, "", stored) }
          .toDF("url", "lastmod", "status", "lastmod_raw", "stored_lastmod")
          .write.parquet(s"$lake.refetch/batch=$id")
      def auditOf(id: Long): Map[String, String] =
        spark.read.parquet(s"$lake.fetched/batch=$id").collect()
          .map(r => r.getAs[String]("src") -> r.getAs[String]("status"))
          .toMap
      // drain 1: both URLs new → unconditional 200s; the responses'
      // validators land in the ledger
      feed(1L, Seq((u1, "new", ""), (u2, "new", "")))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest)
        == Seq(1L))
      assert(auditOf(1L) == Map(u1 -> "fetched", u2 -> "fetched"))
      // ledger dirs key on a WRITE sequence starting at 0, not the
      // feed id (feed ids mix namespaces — write order is the law)
      val led1 = spark.read.parquet(s"$lake.validators/batch=0").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
      assert(led1 == Map(
        u1 -> (("\"tag-1\"", "Mon, 05 Jan 2026 00:00:00 GMT")),
        u2 -> (("\"a\"", "Tue, 06 Jan 2026 00:00:00 GMT"))), s"$led1")
      // drain 2: both stale (the feed's stored_lastmod is only the
      // sitemap HINT) — the plan must prefer the ledger's CAPTURED
      // etag: u1's still matches (304, nothing written), u2's
      // resource changed (200 with the NEW etag, ledger updated)
      feed(2L, Seq((u1, "stale", "2026-01-03"), (u2, "stale", "2026-01-03")))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest)
        == Seq(2L))
      assert(auditOf(2L) == Map(u1 -> "not_modified", u2 -> "fetched"))
      // the wire requests carried If-None-Match, NOT If-Modified-Since
      val drain2 = seen.toArray.map(
        _.asInstanceOf[(String, String, String)]).drop(2)
      assert(drain2.forall(r => r._2 != "null" && r._3 == "null"),
        s"stale rows with a stored etag must send INM only: " +
          s"${drain2.toSeq}")
      assert(drain2.find(_._1.endsWith("/p/1")).get._2 == "\"tag-1\"")
      assert(drain2.find(_._1.endsWith("/p/2")).get._2 == "\"a\"")
      // latest-wins: u2's ledger row is now the NEW etag
      val latest = Streams.validatorLedgerLatest(spark, s"$lake.validators")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(latest == Map(u1 -> "\"tag-1\"", u2 -> "\"b\""), s"$latest")
      // drain 3: u2 stale again → INM "b" → 304 (the full cycle:
      // fetch → ledger → conditional refetch → confirm)
      feed(3L, Seq((u2, "stale", "2026-01-03")))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest)
        == Seq(3L))
      assert(auditOf(3L) == Map(u2 -> "not_modified"))
      // ledger compaction folds seq dirs to a FRESH seq (crash-safe:
      // the fold never Overwrites the dir holding the newest states
      // — VERDICT r17 #1), preserving latest-wins
      Streams.compactValidatorLedger(spark, s"$lake.validators",
        minBatches = 2)
      val dirs = new java.io.File(s"$lake.validators").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq
      assert(dirs == Seq("batch=3"), s"compaction left $dirs")
      val after = Streams.validatorLedgerLatest(spark, s"$lake.validators")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(after == latest, s"compaction changed the ledger: $after")
      // cross-namespace ordering: a drain consuming an INDEX-EXPANSION
      // feed id (2^40+) appends at the next small seq — keyed on the
      // feed id, this dir would outrank every later capture forever
      // and conditional fetches would ship stale validators
      feed(Streams.IndexChildBase + 9L, Seq((u1, "new", "")))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest)
        == Seq(Streams.IndexChildBase + 9L))
      val dirs2 = new java.io.File(s"$lake.validators").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq.sorted
      assert(dirs2 == Seq("batch=3", "batch=4"),
        s"expansion-id drain must append at seq 4: $dirs2")
      assert(Streams.validatorLedgerLatest(spark, s"$lake.validators")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        == latest)
    } finally server.stop(0)
  }

  test("redirect hop: 3xx targets re-enter through the gates, cross-host pays the new host's bucket") {
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_replan")
    val lake = dir.resolve("lake").toString
    val dest = dir.resolve("dest").toString
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/c/", (ex: HttpExchange) => {
      def redirect(code: Int, loc: String): Unit = {
        ex.getResponseHeaders.add("Location", loc)
        ex.sendResponseHeaders(code, -1)
      }
      def ok(body: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
      }
      ex.getRequestURI.getPath match {
        // cross-host absolute redirect: the target must pay
        // b.example.com's politeness bucket, not a's
        case "/c/a.example.com/p/1" =>
          redirect(302, "https://b.example.com/q/1")
        // RELATIVE Location (legal per RFC 9110 §10.2.2) — must
        // resolve against the source URL
        case "/c/a.example.com/p/2" => redirect(301, "/p/2b")
        // the legacy-base retirement leg's redirect: its target's
        // canonical URL lives ONLY in a planted watermark base
        case "/c/a.example.com/p/4" => redirect(302, "/p/base-only")
        // TWO-hop chain (the http→https→www shape): the replan drain
        // must feed its own 3xx answers back through the hop (ADVICE
        // r16 #1 — they used to die as skipped rows, content lost)
        case "/c/a.example.com/p/3" => redirect(301, "/p/3b")
        case "/c/a.example.com/p/3b" => redirect(302, "/p/3c")
        case "/c/b.example.com/q/1" => ok("cross-host target")
        case "/c/a.example.com/p/2b" => ok("relative target")
        case "/c/a.example.com/p/3c" => ok("multi-hop target")
        case _ => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      val traps = Seq.empty[(String, String, Long)]
        .toDF("host", "template", "is_trap")
      def feed(id: Long, urls: Seq[String]): Unit =
        urls.map(u => (u, "", "new", "", ""))
          .toDF("url", "lastmod", "status", "lastmod_raw", "stored_lastmod")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$lake.refetch/batch=$id")
      feed(1L, Seq("https://a.example.com/p/1", "https://a.example.com/p/2",
        "https://a.example.com/p/3"))
      // drain the content feed: all three answers are 3xx → skipped
      // rows whose Locations flow through the hop into the .replan
      // feed under the DENSE hop id 2·1 = 2 (replanHopId — never a
      // raw feed id: the gate's index must stay watermark-foldable)
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest,
        hostPermitsPerSec = 5) == Seq(1L))
      val fa = spark.read.parquet(s"$lake.fetched.audit/batch=1")
        .collect().head
      assert((fa.getAs[Long]("planned"), fa.getAs[Long]("skipped"),
        fa.getAs[Long]("redirected"), fa.getAs[Long]("replanned")) ==
        ((3L, 3L, 3L, 3L)), s"fetched audit: $fa")
      val ga = spark.read.parquet(s"$lake.replan.audit/batch=2")
        .collect().head
      assert((ga.getAs[Long]("arrived"), ga.getAs[Long]("admitted")) ==
        ((3L, 3L)), s"gate audit: $ga")
      // the replan drain fetches the admitted targets — the relative
      // form resolved, the cross-host one under the NEW host's path;
      // the chain's middle hop (p/3b) 3xxes again and re-enters the
      // gate under the derived id for the NEXT cycle
      assert(Streams.replanFetchDrainOnce(spark, lake, fetcher, traps,
        dest, hostPermitsPerSec = 5) == Seq(2L))
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
        dest, "b.example.com", "q", "1")) == "cross-host target")
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
        dest, "a.example.com", "p", "2b")) == "relative target")
      // the cross-host fetch paid the TARGET host's politeness bucket
      assert(graft.sources.PagedSource.RateLimiter
        .currentRate("fetch:b.example.com").contains(5.0),
        "cross-host target must hit the new host's bucket")
      val ra = spark.read.parquet(s"$lake.replanfetched.audit/batch=2")
        .collect().head
      assert((ra.getAs[Long]("planned"), ra.getAs[Long]("fetched"),
        ra.getAs[Long]("skipped"), ra.getAs[Long]("failed"),
        ra.getAs[Long]("redirected"), ra.getAs[Long]("replanned")) ==
        ((3L, 2L, 1L, 0L, 1L, 1L)), s"replan audit: $ra")
      // the consumed producer batch is GC'd; the hop's derived batch
      // (2·2+1 = 5 — the odd replan-source half of the dense
      // namespace) is the only thing left in the feed
      assert(new java.io.File(s"$lake.replan").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq ==
        Seq("batch=5"),
        "hop must land the derived batch and GC the consumed one")
      // next cycle: the derived batch drains — the chain's terminal
      // target lands, nothing further re-plans
      assert(Streams.replanFetchDrainOnce(spark, lake, fetcher, traps,
        dest, hostPermitsPerSec = 5) == Seq(5L))
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
        dest, "a.example.com", "p", "3c")) == "multi-hop target")
      val ra2 = spark.read.parquet(s"$lake.replanfetched.audit/batch=5")
        .collect().head
      assert((ra2.getAs[Long]("planned"), ra2.getAs[Long]("fetched"),
        ra2.getAs[Long]("redirected")) == ((1L, 1L, 0L)),
        s"hop-batch audit: $ra2")
      // now the feeds are fully consumer-GC'd
      assert(new java.io.File(s"$lake.replan").listFiles()
        .forall(!_.getName.startsWith("batch=")), "replan feed not GC'd")
      // cycle bound: the SAME redirects arriving again dedup against
      // the .replan index — nothing re-admitted, nothing re-fetched
      feed(2L, Seq("https://a.example.com/p/1", "https://a.example.com/p/2"))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest,
        hostPermitsPerSec = 5) == Seq(2L))
      val ga2 = spark.read.parquet(s"$lake.replan.audit/batch=4")
        .collect().head
      assert((ga2.getAs[Long]("arrived"), ga2.getAs[Long]("admitted"),
        ga2.getAs[Long]("dup_lake")) == ((2L, 0L, 2L)), s"$ga2")
      // the gate still lands its (empty) batch dir — the drain
      // consumes it as a zero-planned no-op
      assert(Streams.replanFetchDrainOnce(spark, lake, fetcher, traps,
        dest) == Seq(4L))
      assert(spark.read.parquet(s"$lake.replanfetched.audit/batch=4")
        .collect().head.getAs[Long]("planned") == 0L,
        "deduped targets must not be re-fetched")
      // fold for the replan index (VERDICT r17 wrong #4): with the
      // upstream feeds drained, only the pending batch's own chain is
      // replayable, so a threshold of 1 folds every older gate batch
      // INTO the max foldable dir (append, no watermark base — hop
      // ids are non-monotonic, so a watermark could overshoot future
      // hop ids) — and the folded index must still verdict: the same
      // redirects a THIRD time are all dup_lake, nothing re-fetched
      feed(3L, Seq("https://a.example.com/p/1", "https://a.example.com/p/2"))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest,
        hostPermitsPerSec = 5) == Seq(3L))
      // a legacy watermark base must RETIRE through the fold: while
      // one exists the live filter hides every dir at id ≤ W, and
      // the non-monotonic hop-id space can mint future dirs below W
      assert(new java.io.File(s"$lake.replan.urlindex/batch=-4").mkdirs())
      assert(Streams.replanFetchDrainOnce(spark, lake, fetcher, traps,
        dest, compactPastBatches = 1) == Seq(6L))
      val idxDirs = new java.io.File(s"$lake.replan.urlindex").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq.sorted
      assert(idxDirs == Seq("batch=6"),
        s"index history must fold into the max foldable dir " +
          s"(legacy base retired): $idxDirs")
      val ga3 = spark.read.parquet(s"$lake.replan.audit/batch=6")
        .collect().head
      assert((ga3.getAs[Long]("arrived"), ga3.getAs[Long]("admitted"),
        ga3.getAs[Long]("dup_lake")) == ((2L, 0L, 2L)), s"$ga3")
      // ...and the FOLDED base must still verdict: a fourth arrival
      // of the same redirects probes the watermark base alone
      feed(4L, Seq("https://a.example.com/p/1", "https://a.example.com/p/2"))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest,
        hostPermitsPerSec = 5) == Seq(4L))
      val ga4 = spark.read.parquet(s"$lake.replan.audit/batch=8")
        .collect().head
      assert((ga4.getAs[Long]("arrived"), ga4.getAs[Long]("admitted"),
        ga4.getAs[Long]("dup_lake")) == ((2L, 0L, 2L)),
        s"folded index must still verdict dup_lake: $ga4")
      // IMMEDIATE retirement: a legacy base beside any foldable dir
      // retires on the next drain even under the DEFAULT size
      // threshold (while it stands, the live filter hides every dir
      // at id ≤ W — waiting for 64 fresh dirs would re-admit indexed
      // targets the whole time). The base is REAL this time: it holds
      // the ONLY index copy of p/4's redirect target, so the leg also
      // proves retirement MERGES the base's rows instead of just
      // deleting them (wave-5 review #1).
      locally {
        import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
        graft.operators.Dedup.urlCanonicalizeOver(
            Seq((999L, "https://a.example.com/p/base-only"))
              .toDF("doc_id", "url"))
          .select(col("canon_url"),
            // UrlParts = 64, the gate's hash-bucket dial
            pmod(xxhash64(col("canon_url")), lit(64L)).cast("int")
              .as("ub"))
          .write.partitionBy("ub")
          .parquet(s"$lake.replan.urlindex/batch=-4")
      }
      assert(Streams.replanFetchDrainOnce(spark, lake, fetcher, traps,
        dest) == Seq(8L))
      val idxDirs2 = new java.io.File(s"$lake.replan.urlindex").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq.sorted
      assert(idxDirs2 == Seq("batch=8"),
        s"a legacy base must retire on the first drain: $idxDirs2")
      feed(5L, Seq("https://a.example.com/p/1", "https://a.example.com/p/2",
        "https://a.example.com/p/4"))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest,
        hostPermitsPerSec = 5) == Seq(5L))
      val ga5 = spark.read.parquet(s"$lake.replan.audit/batch=10")
        .collect().head
      assert((ga5.getAs[Long]("arrived"), ga5.getAs[Long]("admitted"),
        ga5.getAs[Long]("dup_lake")) == ((3L, 0L, 3L)),
        s"retired-base rows must still verdict dup_lake: $ga5")
      // CHAIN CAP: a replan batch whose NEXT hop id would cross the
      // IndexChildBase boundary stops re-planning LOUDLY — redirects
      // counted, nothing handed to the gate, no derived batch minted
      val capId = Streams.IndexChildBase / 2
      Seq("https://a.example.com/p/3").toDF("url")
        .write.parquet(s"$lake.replan/batch=$capId")
      assert(Streams.replanFetchDrainOnce(spark, lake, fetcher, traps,
        dest, hostPermitsPerSec = 5) == Seq(10L, capId))
      val rc = spark.read
        .parquet(s"$lake.replanfetched.audit/batch=$capId")
        .collect().head
      assert((rc.getAs[Long]("planned"), rc.getAs[Long]("redirected"),
        rc.getAs[Long]("replanned")) == ((1L, 1L, 0L)),
        s"capped chain must drop loudly: $rc")
      assert(new java.io.File(s"$lake.replan").listFiles()
        .forall(!_.getName.startsWith("batch=")),
        "a capped hop must mint no derived batch")
    } finally server.stop(0)
  }

  test("st30 robots bootstrap: seeded hosts flow robots → st27 → sitemap fetch, audits conserve") {
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_st30")
    val lake = dir.resolve("lake").toString
    val dest = dir.resolve("dest").toString
    val ckpt = dir.resolve("ckpt").toString
    val smXml = "<?xml version=\"1.0\"?>\n<urlset>\n" +
      "  <url><loc>https://a.example.com/p/1</loc></url>\n" +
      "  <url><loc>https://a.example.com/p/2</loc></url>\n</urlset>\n"
    val pages = Map(
      "/c/a.example.com/robots.txt" ->
        ("User-agent: *\nDisallow: /private\n" +
          "Sitemap: https://a.example.com/sm0.xml\n"),
      "/c/a.example.com/sm0.xml" -> smXml)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/c/", (ex: HttpExchange) => {
      pages.get(ex.getRequestURI.getPath) match {
        case Some(body) =>
          val b = body.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      val traps = Seq.empty[(String, String, Long)]
        .toDF("host", "template", "is_trap")
      // seed: one live host (mixed case — must normalize), one with
      // no robots.txt, one malformed (must never spend a request)
      Seq("A.Example.COM", "b.example.com", "bad host!")
        .toDF("host").write.parquet(s"$lake.seedhosts/batch=1")
      // ONE tick of the st28 stream runs the whole chain: robots
      // drain → st27 parse → sitemap drain — NO hand-fed payloads
      val ticks = MemoryStream[Int](spark)
      val q = Streams.st28FetchDrainStream(ticks.toDS().toDF(), lake,
        fetcher, traps, dest, ckpt)
      ticks.addData(1)
      q.processAllAvailable()
      q.stop()
      // robots audit conserves: seeded = fetched + skipped + failed
      val ra = spark.read.parquet(s"$lake.robotstxt.audit/batch=1")
        .collect().head
      assert((ra.getAs[Long]("seeded"), ra.getAs[Long]("fetched"),
        ra.getAs[Long]("skipped"), ra.getAs[Long]("failed")) ==
        ((3L, 1L, 2L, 0L)), s"robots audit: $ra")
      // st27 landed the announcement under the SAME batch id...
      val sm = spark.read.parquet(s"$lake.sitemaps.audit/batch=1")
        .collect().head
      assert((sm.getAs[Long]("announced"), sm.getAs[Long]("in_scope")) ==
        ((1L, 1L)), s"st27 audit: $sm")
      // ...and the SAME tick's sitemap drain already fetched the
      // urlset — the leaf XML st25/st26 parse
      val xml = spark.read.parquet(s"$lake.sitemapxml/batch=1")
        .collect().map(r => (r.getString(0), r.getString(2)))
      assert(xml.toSeq == Seq(("a.example.com", smXml)), s"${xml.toSeq}")
      assert(graft.operators.Graph.sitemapExtractOver(
        spark.read.parquet(s"$lake.sitemapxml/batch=1"))
        .collect().map(_.getAs[String]("loc")).toSet ==
        Set("https://a.example.com/p/1", "https://a.example.com/p/2"))
      // consumer-owned GC: the seed feed is drained
      assert(new java.io.File(s"$lake.seedhosts").listFiles()
        .forall(!_.getName.startsWith("batch=")), "seed feed not GC'd")
      // a NEVER-announced 404 host (b) must not grow the announcement
      // ledger: tombstones only withdraw live stored sets (wave-6 #5)
      assert(spark.read.parquet(s"$lake.robotstxt.announcements")
        .filter(org.apache.spark.sql.functions.col("src_key") ===
          "b.example.com").count() == 0L,
        "a never-announced 404 host must not tombstone")
      // staleness policy: the host re-seeded within the refetch window
      // is skipped/fresh — no second request, no new landing
      Seq("a.example.com").toDF("host")
        .write.parquet(s"$lake.seedhosts/batch=2")
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher) == Seq(2L))
      val ra2 = spark.read.parquet(s"$lake.robotstxt.audit/batch=2")
        .collect().head
      assert((ra2.getAs[Long]("seeded"), ra2.getAs[Long]("fetched"),
        ra2.getAs[Long]("skipped")) == ((1L, 0L, 1L)), s"$ra2")
      // replay safety: the producer re-lands batch 1 (crash before
      // consumption drop) — the ledger probe EXCLUDES the current id,
      // so the drain re-fetches instead of trusting its own
      // half-committed rows, and the landing re-derives identically
      Seq("a.example.com").toDF("host")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$lake.seedhosts/batch=1")
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher) == Seq(1L))
      val ra1b = spark.read.parquet(s"$lake.robotstxt.audit/batch=1")
        .collect().head
      assert(ra1b.getAs[Long]("fetched") == 1L, s"replay skipped: $ra1b")
      assert(spark.read.parquet(s"$lake.sitemaps/batch=1")
        .collect().map(_.getAs[String]("loc")).toSeq ==
        Seq("https://a.example.com/sm0.xml"), "replay changed the landing")
    } finally server.stop(0)
  }

  test("conditional discovery: unchanged robots and sitemap answer 304 with zero body bytes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_cond_disc")
    val lake = dir.resolve("lake").toString
    // robots version: v1 serves ETag "r1", v2 (after rotation) "r2";
    // BOTH bodies announce the SAME sitemap file, whose ETag never
    // rotates — the discovery shape where 304 economics are biggest
    val robotsV = new java.util.concurrent.atomic.AtomicInteger(1)
    // the 404-withdrawal leg's switch: true = robots.txt is GONE
    val robots404 = new java.util.concurrent.atomic.AtomicBoolean(false)
    // request log: (path, If-None-Match)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, String)]()
    def urlset(locs: String*): String =
      "<?xml version=\"1.0\"?>\n<urlset>\n" + locs.map(l =>
        s"  <url><loc>$l</loc></url>\n").mkString + "</urlset>\n"
    // the sitemap's content/etag rotate in the heartbeat leg
    @volatile var smBody = urlset("https://a.example.com/p/1")
    @volatile var smTag = "\"s1\""
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/c/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val inm = String.valueOf(
        ex.getRequestHeaders.getFirst("If-None-Match"))
      seen.add((path, inm))
      def ok(body: String, etag: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("ETag", etag)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
      }
      path match {
        case "/c/a.example.com/robots.txt" =>
          val cur = s""""r${robotsV.get()}""""
          // the 404 leg: the file is GONE — conditional or not
          if (robots404.get()) ex.sendResponseHeaders(404, -1)
          else if (inm == cur) ex.sendResponseHeaders(304, -1)
          // v3 WITHDRAWS the announcement (no Sitemap directive)
          else ok(if (robotsV.get() == 3) "User-agent: *\n"
            else "User-agent: *\n" +
              "Sitemap: https://a.example.com/sm0.xml\n", cur)
        case "/c/a.example.com/sm0.xml" =>
          if (inm == smTag) ex.sendResponseHeaders(304, -1)
          else ok(smBody, smTag)
        case _ => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      def seed(id: Long): Unit =
        Seq("a.example.com").toDF("host")
          .write.parquet(s"$lake.seedhosts/batch=$id")
      def robotsAudit(id: Long): (Long, Long, Long) = {
        val r = spark.read.parquet(s"$lake.robotstxt.audit/batch=$id")
          .collect().head
        (r.getAs[Long]("fetched"), r.getAs[Long]("skipped"),
          r.getAs[Long]("not_modified"))
      }
      // tick 1: unconditional 200s; both responses' validators land
      seed(1L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher) == Seq(1L))
      assert(robotsAudit(1L) == ((1L, 0L, 0L)))
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(1L))
      val led = Streams.validatorLedgerLatest(spark, s"$lake.validators")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(led == Map(
        "https://a.example.com/robots.txt" -> "\"r1\"",
        "https://a.example.com/sm0.xml" -> "\"s1\""), s"ledger: $led")
      // tick 2, robots STALE but unchanged: the refetch sends the
      // captured ETag, the 304 lands a not_modified row with zero
      // body bytes — and the stored announcement set RE-enters the
      // feed (the heartbeat: without it, discovery would freeze while
      // robots stays byte-stable)
      seed(2L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(2L))
      assert(robotsAudit(2L) == ((0L, 0L, 1L)))
      val sa2 = spark.read.parquet(s"$lake.sitemaps.audit/batch=2")
        .collect().head
      assert((sa2.getAs[Long]("announced"),
        sa2.getAs[Long]("re_announced")) == ((0L, 1L)), s"$sa2")
      assert(spark.read.parquet(s"$lake.sitemaps/batch=2")
        .collect().map(_.getAs[String]("loc")).toSeq ==
        Seq("https://a.example.com/sm0.xml"),
        "a 304'd robots must re-announce its stored set")
      assert(seen.toArray.map(_.asInstanceOf[(String, String)]).toSeq
        .filter(_._1.endsWith("robots.txt")).map(_._2) ==
        Seq("null", "\"r1\""), "second robots request must send INM")
      // ...and the re-announced unchanged sitemap costs one 304
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(2L))
      val xa2 = spark.read.parquet(s"$lake.sitemapxml.audit/batch=2")
        .collect().head
      assert((xa2.getAs[Long]("planned"), xa2.getAs[Long]("fetched"),
        xa2.getAs[Long]("not_modified")) == ((1L, 0L, 1L)), s"$xa2")
      assert(spark.read.parquet(s"$lake.sitemapxml/batch=2").count() == 0L,
        "a first-attempt 304 has nothing to land")
      // the 304 RESTARTED the staleness window: a re-seed within it
      // is skipped/fresh, no request at all
      seed(3L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher) == Seq(3L))
      assert(robotsAudit(3L) == ((0L, 1L, 0L)))
      // ETag rotation: robots CHANGED — the conditional refetch
      // misses, the 200 re-announces (a fresh parse, not the ledger),
      // and the ledger stores the new tag; the re-announced sitemap
      // is UNCHANGED and 304s
      robotsV.set(2)
      seed(4L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(4L))
      assert(robotsAudit(4L) == ((1L, 0L, 0L)))
      assert(spark.read.parquet(s"$lake.sitemaps/batch=4")
        .collect().map(_.getAs[String]("loc")).toSeq ==
        Seq("https://a.example.com/sm0.xml"))
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(4L))
      val xa = spark.read.parquet(s"$lake.sitemapxml.audit/batch=4")
        .collect().head
      assert((xa.getAs[Long]("planned"), xa.getAs[Long]("fetched"),
        xa.getAs[Long]("failed"), xa.getAs[Long]("not_modified")) ==
        ((1L, 0L, 0L, 1L)), s"sitemap audit: $xa")
      assert(spark.read.parquet(s"$lake.sitemapxml/batch=4").count() == 0L,
        "a 304'd sitemap must not land XML")
      // latest-wins across both drains' captures
      val led2 = Streams.validatorLedgerLatest(spark, s"$lake.validators")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(led2 == Map(
        "https://a.example.com/robots.txt" -> "\"r2\"",
        "https://a.example.com/sm0.xml" -> "\"s1\""), s"ledger: $led2")
      // HEARTBEAT: the sitemap CHANGES while robots stays byte-stable
      // — the robots 304 re-announces, the sitemap conditional misses,
      // and the NEW urlset lands and parses (before the announcement
      // ledger, this exact case froze forever)
      smBody = urlset("https://a.example.com/p/1",
        "https://a.example.com/p/2")
      smTag = "\"s2\""
      seed(5L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(5L))
      assert(robotsAudit(5L) == ((0L, 0L, 1L)))
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(5L))
      val xa5 = spark.read.parquet(s"$lake.sitemapxml.audit/batch=5")
        .collect().head
      assert((xa5.getAs[Long]("planned"), xa5.getAs[Long]("fetched"),
        xa5.getAs[Long]("not_modified")) == ((1L, 1L, 0L)), s"$xa5")
      assert(spark.read.parquet(s"$lake.sitemapxml/batch=5")
        .collect().map(_.getAs[String]("xml")).toSeq == Seq(smBody),
        "the changed urlset must land")
      // CRASH-REPLAY idempotence (the landing survives a replay that
      // 304s): re-land the consumed announcement batch — the replayed
      // fetch 304s against the stored "s2", and the carry-forward
      // keeps attempt one's landed-but-unparsed XML instead of
      // truncating it to an empty Overwrite
      Seq(("a.example.com", "robots", "https://a.example.com/sm0.xml", ""))
        .toDF("host", "source", "loc", "lastmod")
        .write.parquet(s"$lake.sitemaps/batch=5")
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(5L))
      assert(spark.read.parquet(s"$lake.sitemapxml/batch=5")
        .collect().map(_.getAs[String]("xml")).toSeq == Seq(smBody),
        "replay must carry the first attempt's landed XML forward")
      // robots-side replay: re-land the consumed seed batch — the
      // replayed drain 304s (validators committed) and re-announces
      // from the ledger, so the feed landing re-derives instead of
      // vanishing
      seed(5L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(5L))
      assert(spark.read.parquet(s"$lake.sitemaps/batch=5")
        .collect().map(_.getAs[String]("loc")).toSeq ==
        Seq("https://a.example.com/sm0.xml"),
        "a replayed 304 must re-announce from the ledger")
      // WITHDRAWAL: robots drops its Sitemap directive — the re-fetch
      // appends a tombstone, so later 304 heartbeats re-announce
      // NOTHING (without it the withdrawn set re-announced forever)
      robotsV.set(3)
      seed(6L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(6L))
      assert(robotsAudit(6L) == ((1L, 0L, 0L)))
      assert(spark.read.parquet(s"$lake.sitemaps/batch=6").count() == 0L,
        "a fetched robots with no directives announces nothing")
      seed(7L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(7L))
      assert(robotsAudit(7L) == ((0L, 0L, 1L)))
      assert(!new java.io.File(s"$lake.sitemaps/batch=7").exists(),
        "a tombstoned announcer's heartbeat must re-announce nothing")
      // RECOVERY: robots returns with its directive (v4) — the fresh
      // parse replaces the tombstone and the set re-announces
      robotsV.set(4)
      seed(8L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(8L))
      assert(robotsAudit(8L) == ((1L, 0L, 0L)))
      assert(spark.read.parquet(s"$lake.sitemaps/batch=8")
        .collect().map(_.getAs[String]("loc")).toSeq ==
        Seq("https://a.example.com/sm0.xml"))
      // 404 WITHDRAWAL (VERDICT r17 wrong #2): the robots file
      // VANISHES — RFC 9309 absent-robots is allow-all, and the
      // declared sitemaps are gone with the file that declared them.
      // The confirmed 404 must tombstone the stored announcement set
      // (not just fail to re-announce this tick)...
      robots404.set(true)
      seed(9L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(9L))
      assert(robotsAudit(9L) == ((0L, 1L, 0L)), s"${robotsAudit(9L)}")
      assert(!new java.io.File(s"$lake.sitemaps/batch=9").exists())
      val annLatest = {
        val ann = spark.read
          .parquet(s"$lake.robotstxt.announcements")
          .filter(col("src_key") === "a.example.com")
          .localCheckpoint(true)
        val mb = ann.agg(org.apache.spark.sql.functions.max(
          col("batch").cast("long"))).head().getLong(0)
        ann.filter(col("batch") === mb)
          .collect().map(_.getAs[String]("loc")).toSeq
      }
      assert(annLatest == Seq(""),
        s"404 must tombstone the stored set, got $annLatest")
      // ...restart the staleness window (absent-robots is a cacheable
      // verdict: a re-seed inside the window costs no request)...
      val nReq = seen.size()
      seed(10L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher) == Seq(10L))
      assert(robotsAudit(10L) == ((0L, 1L, 0L)))
      assert(seen.size() == nReq,
        "a confirmed 404 inside the window must not re-spend a request")
      // ...and CLEAR the stored validators: robots RESTORED
      // byte-identical (same ETag "r4") must fetch 200 and re-announce
      // — with the pre-404 ETag still stored it would 304 against the
      // withdrawn state and the set would stay frozen forever
      robots404.set(false)
      seed(11L)
      assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
        refetchAfterBatches = 0) == Seq(11L))
      assert(robotsAudit(11L) == ((1L, 0L, 0L)),
        s"restored robots must re-fetch, not 304: ${robotsAudit(11L)}")
      assert(spark.read.parquet(s"$lake.sitemaps/batch=11")
        .collect().map(_.getAs[String]("loc")).toSeq ==
        Seq("https://a.example.com/sm0.xml"),
        "the restored robots' fresh parse must replace the tombstone")
    } finally server.stop(0)
  }

  test("index chase heartbeat: a 304'd index re-announces its stored children") {
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_hb")
    val lake = dir.resolve("lake").toString
    val idxXml = "<?xml version=\"1.0\"?>\n<sitemapindex>\n" +
      "  <sitemap><loc>https://a.example.com/c1.xml</loc></sitemap>\n" +
      "</sitemapindex>\n"
    def urlset(locs: String*): String =
      "<?xml version=\"1.0\"?>\n<urlset>\n" + locs.map(l =>
        s"  <url><loc>$l</loc></url>\n").mkString + "</urlset>\n"
    @volatile var cBody = urlset("https://a.example.com/p/1")
    @volatile var cTag = "\"c1\""
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/c/", (ex: HttpExchange) => {
      val inm = String.valueOf(
        ex.getRequestHeaders.getFirst("If-None-Match"))
      def ok(body: String, etag: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("ETag", etag)
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b)
      }
      ex.getRequestURI.getPath match {
        case "/c/a.example.com/idx.xml" =>
          if (inm == "\"i1\"") ex.sendResponseHeaders(304, -1)
          else ok(idxXml, "\"i1\"")
        case "/c/a.example.com/c1.xml" =>
          if (inm == cTag) ex.sendResponseHeaders(304, -1)
          else ok(cBody, cTag)
        case _ => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      def announce(id: Long): Unit =
        Seq(("a.example.com", "robots", "https://a.example.com/idx.xml", ""))
          .toDF("host", "source", "loc", "lastmod")
          .write.parquet(s"$lake.sitemaps/batch=$id")
      def xmlAudit(id: Long): (Long, Long, Long) = {
        val r = spark.read.parquet(s"$lake.sitemapxml.audit/batch=$id")
          .collect().head
        (r.getAs[Long]("fetched"), r.getAs[Long]("not_modified"),
          r.getAs[Long]("index_children"))
      }
      val childId = Streams.IndexChildBase
      // announce 1: the index fetches, expands, and its children are
      // LEDGERED under the index's loc
      announce(1L)
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(1L))
      assert(xmlAudit(1L) == ((1L, 0L, 1L)))
      // the child fetches (its validator captured)
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher)
        == Seq(childId + 1L))
      assert(xmlAudit(childId + 1L) == ((1L, 0L, 0L)))
      // announce 2, index UNCHANGED: the 304 re-announces the stored
      // children — and the unchanged child then costs one 304 too
      announce(2L)
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(2L))
      assert(xmlAudit(2L) == ((0L, 1L, 1L)), s"${xmlAudit(2L)}")
      assert(spark.read.parquet(s"$lake.sitemaps/batch=${childId + 2L}")
        .collect().map(_.getAs[String]("loc")).toSeq ==
        Seq("https://a.example.com/c1.xml"),
        "a 304'd index must re-announce its stored children")
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher)
        == Seq(childId + 2L))
      assert(xmlAudit(childId + 2L) == ((0L, 1L, 0L)))
      // the child CHANGES behind the byte-stable index: the heartbeat
      // re-announces, the child's conditional misses, the new urlset
      // lands (before the ledger this froze forever)
      cBody = urlset("https://a.example.com/p/1",
        "https://a.example.com/p/2")
      cTag = "\"c2\""
      announce(3L)
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher) == Seq(3L))
      assert(Streams.sitemapFetchDrainOnce(spark, lake, fetcher)
        == Seq(childId + 3L))
      assert(xmlAudit(childId + 3L) == ((1L, 0L, 0L)))
      assert(spark.read
        .parquet(s"$lake.sitemapxml/batch=${childId + 3L}")
        .collect().map(_.getAs[String]("xml")).toSeq == Seq(cBody),
        "the changed child urlset must land")
    } finally server.stop(0)
  }

  test("robots staleness ledger folds below the replayable window, verdicts unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_robledger")
    val lake = dir.resolve("lake").toString
    val fetcher = new Streams.DemoRobotsFetcher
    def seed(id: Long, hosts: Seq[String]): Unit =
      hosts.toDF("host")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$lake.seedhosts/batch=$id")
    def audit(id: Long): (Long, Long) = {
      val r = spark.read.parquet(s"$lake.robotstxt.audit/batch=$id")
        .collect().head
      (r.getAs[Long]("fetched"), r.getAs[Long]("skipped"))
    }
    def ledgerDirs: Seq[String] =
      new java.io.File(s"$lake.robotstxt.ledger").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq.sorted
    // a PRE-COLUMN dir (old builds stored host only): the probe and
    // the fold must fall back to its partition id as the seen value
    Seq("e.example.com").toDF("host")
      .write.parquet(s"$lake.robotstxt.ledger/batch=0")
    // three drains build history at seen = 1, 2, 3
    seed(1L, Seq("a.example.com")); seed(2L, Seq("c.example.com"))
    seed(3L, Seq("d.example.com"))
    assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher)
      == Seq(1L, 2L, 3L))
    assert(ledgerDirs == Seq("batch=0", "batch=1", "batch=2", "batch=3"))
    // empty feed → nothing is replayable → everything folds into the
    // max dir, per-host seen values preserved as data
    assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
      compactPastBatches = 2) == Seq.empty)
    assert(ledgerDirs == Seq("batch=3"), s"fold left $ledgerDirs")
    // verdicts unchanged post-fold: within a window of 3, host a
    // (seen=1) is stale and refetches; d (seen=3) and the legacy e
    // (seen=0 → fresh under a window of 100) skip
    seed(4L, Seq("a.example.com", "d.example.com"))
    assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
      refetchAfterBatches = 3) == Seq(4L))
    assert(audit(4L) == ((1L, 1L)), s"post-fold verdicts: ${audit(4L)}")
    seed(5L, Seq("e.example.com"))
    assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
      refetchAfterBatches = 100) == Seq(5L))
    assert(audit(5L) == ((0L, 1L)),
      "legacy pre-column row must survive the fold as its partition id")
    // replay exclusion survives the fold: re-land batch 4 (crash
    // before the feed drop) — the probe excludes ONLY id 4, reads a's
    // folded seen=1, and re-fetches instead of trusting its own
    // half-committed rows
    seed(4L, Seq("a.example.com"))
    assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
      refetchAfterBatches = 3) == Seq(4L))
    assert(audit(4L) == ((1L, 0L)), s"replay verdict: ${audit(4L)}")
  }

  test("announcement + robots ledger folds are crash-safe at every torn window") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, max}
    val dir = java.nio.file.Files.createTempDirectory("graft_fold")
    // --- announcement ledger (SET semantics → dir-level atomicity) ---
    val ann = dir.resolve("ann").toString
    // fixture dirs follow the live kb= layout (r19: appends partition
    // by key bucket so heartbeat probes prune) — a flat dir beside
    // bucketed ones would break partition discovery, which is the
    // documented pre-bucket upgrade boundary, not a crash window
    def putAnn(seq: Long, rows: Seq[(String, String)]): Unit =
      rows.map { case (k, loc) => (k, k, "robots", loc, "") }
        .toDF("src_key", "host", "source", "loc", "lastmod")
        .withColumn("kb", Streams.annKb(col("src_key")))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("kb")
        .parquet(s"$ann/batch=$seq")
    def latestSets(): Map[String, Set[String]] = {
      val rows = spark.read.parquet(ann).localCheckpoint(true)
      val mb = rows.groupBy("src_key")
        .agg(org.apache.spark.sql.functions.max("batch").as("mb"))
      rows.join(mb, Seq("src_key"))
        .filter(col("batch") === col("mb"))
        .collect()
        .map(r => r.getAs[String]("src_key") -> r.getAs[String]("loc"))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    }
    // h1's set supersedes (seq 0 → 2), h2 tombstoned at seq 1
    putAnn(0L, Seq(("h1", "s0"), ("h2", "sX")))
    putAnn(1L, Seq(("h2", "")))
    putAnn(2L, Seq(("h1", "s1"), ("h1", "s2")))
    val want = Map("h1" -> Set("s1", "s2"), "h2" -> Set(""))
    assert(latestSets() == want)
    // torn window 1: crash mid-staging — the dot-dir is invisible and
    // the next fold replaces it
    val stg = new java.io.File(s"$ann/.fold.stg")
    assert(stg.mkdirs())
    java.nio.file.Files.writeString(stg.toPath.resolve("junk"), "junk")
    assert(latestSets() == want, "stale fold staging must be invisible")
    // the fold lands at a FRESH seq via atomic rename (never a
    // partial fold dir — a truncated SET at the max seq would win the
    // latest-set selection, VERDICT r17 wrong #1's erasure class) and
    // keeps supersession + tombstones
    Streams.compactAnnounceLedger(spark, ann, minBatches = 1)
    assert(new java.io.File(ann).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq.sorted ==
      Seq("batch=3"), "fold must promote to a fresh seq")
    assert(latestSets() == want)
    // torn window 2: crash between the rename and the old-dir deletes
    // — a leftover old dir beside the fold reads identically (the
    // fold's seq outranks everything it folded)
    putAnn(0L, Seq(("h1", "s0"), ("h2", "sX")))
    assert(latestSets() == want,
      "a leftover folded dir must lose to the promoted fold")
    // --- robots staleness ledger (per-ROW max → append-into-target) ---
    val rob = dir.resolve("rob").toString
    def putRob(seq: Long, rows: Seq[(String, Long)]): Unit =
      rows.toDF("host", "seen")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$rob/batch=$seq")
    def seenOf(): Map[String, Long] =
      spark.read.schema("host STRING, seen BIGINT, batch BIGINT")
        .option("basePath", rob)
        .parquet(new java.io.File(rob).listFiles()
          .map(_.getName).filter(_.startsWith("batch="))
          .map(n => s"$rob/$n").toSeq: _*)
        .groupBy("host")
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.coalesce(col("seen"),
            col("batch"))).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    putRob(0L, Seq(("a", 0L)))
    putRob(1L, Seq(("a", 1L), ("b", 1L)))
    putRob(2L, Seq(("b", 2L)))
    val wantRob = Map("a" -> 1L, "b" -> 2L)
    assert(seenOf() == wantRob)
    // torn window: a crash mid-append leaves a SUBSET of fold rows in
    // the target beside ALL intact originals — per-host max unchanged
    // (fold rows duplicate the max values, and append deletes nothing)
    Seq(("a", 1L)).toDF("host", "seen")
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$rob/batch=2")
    assert(seenOf() == wantRob,
      "a partial fold append must not change any host's clock")
    // the fold redone: appends the per-host max into the target and
    // drops the older dirs — clocks preserved as data
    Streams.compactRobotsLedger(spark, rob, upTo = Long.MaxValue,
      minBatches = 1)
    assert(new java.io.File(rob).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq.sorted ==
      Seq("batch=2"), "robots fold must keep the target id")
    assert(seenOf() == wantRob)
  }

  test("crawl service loop: a bare seeded host becomes fetched content in one tick") {
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_svc_loop")
    val lake = dir.resolve("lake").toString
    val dest = dir.resolve("dest").toString
    val ckpt = dir.resolve("ckpt").toString
    val pages = Map(
      "/c/a.example.com/robots.txt" ->
        "User-agent: *\nSitemap: https://a.example.com/sm0.xml\n",
      "/c/a.example.com/sm0.xml" ->
        ("<?xml version=\"1.0\"?>\n<urlset>\n" +
          "  <url><loc>https://a.example.com/p/1</loc>" +
          "<lastmod>2026-01-05</lastmod></url>\n" +
          "  <url><loc>https://a.example.com/p/2</loc></url>\n</urlset>\n"),
      "/c/a.example.com/p/1" -> "content-one",
      "/c/a.example.com/p/2" -> "content-two")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/c/", (ex: HttpExchange) => {
      pages.get(ex.getRequestURI.getPath) match {
        case Some(body) =>
          val b = body.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      val traps = Seq.empty[(String, String, Long)]
        .toDF("host", "template", "is_trap")
      Seq("a.example.com").toDF("host")
        .write.parquet(s"$lake.seedhosts/batch=1")
      // ONE tick of the FULL loop: seed → robots → st27 → sitemap
      // fetch → parse/plan → content fetch — no hand-fed stage
      val ticks = MemoryStream[Int](spark)
      val q = Streams.crawlServiceStream(ticks.toDS().toDF(), lake,
        fetcher, traps, dest, ckpt)
      ticks.addData(1)
      q.processAllAvailable()
      // content landed under destRoot/<host><path>
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
        dest, "a.example.com", "p", "1")) == "content-one")
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
        dest, "a.example.com", "p", "2")) == "content-two")
      // every stage audited and conserved under the SAME batch id
      def one(path: String): org.apache.spark.sql.Row =
        spark.read.parquet(path).collect().head
      val ra = one(s"$lake.robotstxt.audit/batch=1")
      assert((ra.getAs[Long]("seeded"), ra.getAs[Long]("fetched")) ==
        ((1L, 1L)), s"$ra")
      val sa = one(s"$lake.sitemaps.audit/batch=1")
      assert((sa.getAs[Long]("announced"), sa.getAs[Long]("in_scope")) ==
        ((1L, 1L)), s"$sa")
      val xa = one(s"$lake.sitemapxml.audit/batch=1")
      assert((xa.getAs[Long]("planned"), xa.getAs[Long]("fetched")) ==
        ((1L, 1L)), s"$xa")
      // parse-side landings sit under parseBatchId(1) = 2 (the dense
      // remap that keeps the st20/st26 probed state compactable)
      val da = one(s"$lake.discovered.audit/batch=2")
      assert((da.getAs[Long]("entries"), da.getAs[Long]("in_scope")) ==
        ((2L, 2L)), s"$da")
      val fa = one(s"$lake.fetched.audit/batch=2")
      assert((fa.getAs[Long]("planned"), fa.getAs[Long]("fetched")) ==
        ((2L, 2L)), s"$fa")
      // the st20 gate admitted both discovered URLs
      assert(spark.read.parquet(s"$lake/batch=2")
        .select("url").collect().map(_.getString(0)).toSet ==
        Set("https://a.example.com/p/1", "https://a.example.com/p/2"))
      // every consumed feed is GC'd
      Seq(".seedhosts", ".sitemaps", ".sitemapxml", ".refetch")
        .foreach { f =>
          assert(new java.io.File(s"$lake$f").listFiles()
            .forall(!_.getName.startsWith("batch=")), s"$f not GC'd")
        }
      // tick 2 is idle: robots is fresh, no feeds — nothing re-runs
      ticks.addData(2)
      q.processAllAvailable()
      q.stop()
      assert(!new java.io.File(s"$lake.robotstxt.audit/batch=2").exists(),
        "idle tick must not re-fetch a fresh host")
      // an index-EXPANSION feed batch (2^40 + 1) parses under the
      // dense id 2*1+1 = 3, never an immortal 2^40 ledger/index dir
      Seq(("a.example.com", "https://a.example.com/sm0.xml",
          pages("/c/a.example.com/sm0.xml")))
        .toDF("host", "loc", "xml")
        .write.parquet(
          s"$lake.sitemapxml/batch=${Streams.IndexChildBase + 1L}")
      assert(Streams.sitemapParseDrainOnce(spark, lake)
        == Seq(Streams.IndexChildBase + 1L))
      assert(new java.io.File(s"$lake.discovered/batch=3").exists,
        "expansion batch must parse under its dense id")
      // both URLs are known (lastmod unchanged, index has them):
      // nothing refetch-eligible, nothing re-admitted
      assert(spark.read.parquet(s"$lake.refetch/batch=3").count() == 0L)
      // probed-state compaction: with the fold threshold at 1, the
      // next drain folds the .lastmod ledger + .urlindex up to below
      // the replayable window, and the folded state still verdicts —
      // a re-announcement is all-fresh and all-dup
      Seq(("a.example.com", "https://a.example.com/sm0.xml",
          pages("/c/a.example.com/sm0.xml")))
        .toDF("host", "loc", "xml")
        .write.parquet(s"$lake.sitemapxml/batch=5")
      assert(Streams.sitemapParseDrainOnce(spark, lake,
        compactPastBatches = 1) == Seq(5L))
      val lmDirs = new java.io.File(s"$lake.lastmod").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq.sorted
      assert(lmDirs.forall(d => d == "batch=10" ||
        d.stripPrefix("batch=").toLong < 0),
        s"ledger history must fold to the watermark base: $lmDirs")
      val ga = one(s"$lake.audit/batch=10")
      assert((ga.getAs[Long]("arrived"), ga.getAs[Long]("admitted"),
        ga.getAs[Long]("dup_lake")) == ((2L, 0L, 2L)),
        s"folded index must still dedup: $ga")
      assert(spark.read.parquet(s"$lake.refetch/batch=10").count() == 0L,
        "folded ledger must still verdict fresh")
    } finally server.stop(0)
  }

  test("crawl-to-corpus: the crawl service's landings feed the corpus service") {
    import StreamsSpec.LocalFsFetcher
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_c2c")
    val lake = dir.resolve("crawl").toString
    val dest = dir.resolve("dest").toString
    val svc = dir.resolve("svc").toString
    val lmPath = dir.resolve("lm").toString
    def span(p: String, a: Int, b: Int) =
      (a to b).map(i => s"$p$i").mkString(" ")
    // the "web": two fluent pages and one all-OOV junk page — real
    // crawls land junk; the CORPUS service's gates are where it dies
    val pages = Map(
      "/c/a.example.com/robots.txt" ->
        "User-agent: *\nSitemap: https://a.example.com/sm0.xml\n",
      "/c/a.example.com/sm0.xml" ->
        ("<?xml version=\"1.0\"?>\n<urlset>\n" +
          "  <url><loc>https://a.example.com/p/1</loc></url>\n" +
          "  <url><loc>https://a.example.com/p/2</loc></url>\n" +
          "  <url><loc>https://a.example.com/p/3</loc></url>\n" +
          "</urlset>\n"),
      "/c/a.example.com/p/1" -> span("r", 1, 10),
      "/c/a.example.com/p/2" -> span("r", 11, 20),
      "/c/a.example.com/p/3" -> span("z", 1, 10))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/c/", (ex: HttpExchange) => {
      pages.get(ex.getRequestURI.getPath) match {
        case Some(body) =>
          val b = body.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      val traps = Seq.empty[(String, String, Long)]
        .toDF("host", "template", "is_trap")
      // HALF ONE — the reference's download loop, distributed: a
      // seeded host becomes crawled page files in one tick
      Seq("a.example.com").toDF("host")
        .write.parquet(s"$lake.seedhosts/batch=1")
      val ticks = MemoryStream[Int](spark)
      val q = Streams.crawlServiceStream(ticks.toDS().toDF(), lake,
        fetcher, traps, dest, dir.resolve("ckpt").toString)
      ticks.addData(1)
      q.processAllAvailable()
      q.stop()
      // HALF TWO — the corpus service ingests the crawl's landing
      // tree (st08's paged sync walks it like any remote) and gates
      // it: st09 quality, st14 fluency, st13 near-dup
      graft.operators.TextOps.lmTrainTables(
        Seq((1L, span("r", 1, 40))).toDF("doc_id", "text"), lmPath)
      val audit = Streams.st15ServiceCycle(spark, LocalFsFetcher(dest),
        svc, lmPath).collect()
      assert(audit.length == 3 && audit.forall(_.status == "copied"),
        s"sync: ${audit.toSeq}")
      val corpus = spark.read.parquet(s"$svc/lake")
        .select("text").collect().map(_.getString(0)).toSet
      // the two fluent crawled pages are the corpus; the junk page
      // died at the fluency gate — seeds to curated corpus with no
      // hand-fed stage anywhere
      assert(corpus == Set(span("r", 1, 10), span("r", 11, 20)),
        s"corpus = $corpus")
      val sa = spark.read.parquet(s"$svc/audit").collect()
        .map(r => (r.getAs[Long]("arrived"), r.getAs[Long]("fluent"),
          r.getAs[Long]("curated"), r.getAs[Long]("admitted"))).toSeq
      assert(sa == Seq((3L, 2L, 2L, 2L)), s"service audit: $sa")
    } finally server.stop(0)
  }

  test("st29 perplexity gate == the c28 report's verdicts; per-row twins; replays") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = TestSpark.Sf001
    val root = java.nio.file.Files.createTempDirectory("graft_st29")
    val gate = root.resolve("gate").toString
    val lake = root.resolve("lake").toString
    val docs = graft.Tables(spark, dir).documents
    val ref = docs.select(org.apache.spark.sql.functions.min(col("source")))
      .collect().head.getString(0)
    graft.operators.Corpus.c28GateBuild(
      docs.select(col("doc_id"), col("lang"), col("text")),
      docs.filter(col("source") === ref).select("doc_id", "text"), gate)
    // gate the whole corpus as one drain: the admitted set must equal
    // the c28 BATCH report's head+middle rows exactly — report and
    // gate share the scorer, the cutoff math, and the verdict
    // expression, and this pins that they cannot drift
    Streams.ppxGateBatch(
      docs.select(col("doc_id"), col("lang"), col("text")),
      gate, lake, batchId = 1L)
    val admitted = spark.read.parquet(s"$lake/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val report = graft.operators.Corpus.c28CcnetBuckets(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(admitted == report.filter(kv =>
      kv._2 == "head" || kv._2 == "middle").keySet)
    // audit conserves: arrived = Σ buckets, admitted = head + middle,
    // and the bucket counts equal the report's
    val a = spark.read.parquet(s"$lake.audit/batch=1").collect().head
    def g(n: String) = a.getAs[Long](n)
    assert(g("arrived") == report.size)
    assert(g("arrived") == g("n_head") + g("n_middle") + g("n_tail") +
      g("n_unscored") + g("n_unsampled"))
    assert(g("admitted") == g("n_head") + g("n_middle"))
    val want = report.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(g("n_head") == want.getOrElse("head", 0L) &&
      g("n_tail") == want.getOrElse("tail", 0L))
    // per-ROW verdicts: a gibberish twin riding an admitted doc's id
    // is judged alone (the fluencyBatch rule); the sub-2-token row is
    // unscored → rejected
    val goodId = admitted.head
    val goodText = docs.filter(col("doc_id") === goodId)
      .select("text", "lang").collect().head
    val twins = Seq(
      (goodId, goodText.getString(1), goodText.getString(0)),
      (goodId, goodText.getString(1), "zxq9 vvb7 qqp3 mmz1 kkt5 wwx8"),
      (goodId, goodText.getString(1), "tiny"))
      .toDF("doc_id", "lang", "text")
    Streams.ppxGateBatch(twins, gate, s"$root/lake2", batchId = 1L)
    val landed = spark.read.parquet(s"$root/lake2/batch=1")
      .select("text").collect().map(_.getString(0))
    assert(landed.contains(goodText.getString(0)), "real doc rejected")
    assert(!landed.contains("tiny"), "unscored row admitted")
    assert(!landed.contains("zxq9 vvb7 qqp3 mmz1 kkt5 wwx8"),
      "all-OOV gibberish (mean_lp ≈ ln(0.4/T) ≈ −11) rode the twin id in")
    val a2 = spark.read.parquet(s"$root/lake2.audit/batch=1")
      .collect().head
    assert(a2.getAs[Long]("arrived") == 3L &&
      a2.getAs[Long]("n_unscored") == 1L)
    // replay idempotence: rerun the SAME batch id → identical landing
    Streams.ppxGateBatch(twins, gate, s"$root/lake2", batchId = 1L)
    val replay = spark.read.parquet(s"$root/lake2/batch=1")
      .select("text").collect().map(_.getString(0)).sorted
    assert(replay.toSeq == landed.sorted.toSeq)
  }

  test("st18 PII scrub stage lands clean text, audits counts, replays clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st18")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    val stream1 = Seq(
      (1L, "write to bob@mail.net or 10.0.0.1 soon"),
      (2L, "totally clean prose"))
    val stream2 = Seq(
      (3L, "dial +1-555-010-0199 and +1-555-010-0200"))
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st18PiiScrubStream(
      input.toDS().toDF("doc_id", "text"), lake, ckpt)
    input.addData(stream1: _*)
    q.processAllAvailable()
    input.addData(stream2: _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.read.parquet(lake)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    // every doc LANDS (transform, not gate) — with its PII redacted
    assert(rows == Map(
      1L -> "write to <EMAIL> or <IP> soon",
      2L -> "totally clean prose",
      3L -> "dial <PHONE> and <PHONE>"))
    // audit conserves docs and records per-category totals per batch
    val audit = spark.read.parquet(lake + ".audit")
      .collect().map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("n_emails"),
          r.getAs[Long]("n_ssns"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getAs[Long]("n_ccs"))).toMap
    assert(audit(0L) == ((2L, 1L, 0L, 0L, 1L, 0L)) &&
      audit(1L) == ((1L, 0L, 0L, 2L, 0L, 0L)),
      s"audit rows wrong: $audit")
    // replay: re-running a batch body overwrites its own directory
    // byte-identically — stateless stage, idempotent landing
    Streams.piiScrubBatch(stream1.toDF("doc_id", "text"), lake, batchId = 0L)
    val after = spark.read.parquet(lake)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(after == rows, s"replay changed the lake: $after")
    // duplicate doc_ids within ONE drain scrub per ROW (the minted
    // row-uid join): each original row keeps ITS OWN clean text, and
    // docs_in = docs_landed holds — a doc_id key join cross-attached
    // every clean text to every row sharing the key
    Streams.piiScrubBatch(Seq(
      (9L, "a@b.co wrote"), (9L, "nothing here"))
      .toDF("doc_id", "text"), lake, batchId = 5L)
    val b5 = spark.read.parquet(s"$lake/batch=5")
      .collect().map(_.getAs[String]("text")).sorted.toSeq
    assert(b5 == Seq("<EMAIL> wrote", "nothing here"),
      s"dup-doc_id drain landed: $b5")
  }

  test("st13 bootstraps a fresh deployment: batch 0 admits into a lake that doesn't exist yet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st13boot")
    val lake = dir.resolve("lake").toString // never created
    val ckpt = dir.resolve("ckpt").toString
    def doc(id: Long, tag: String) =
      (id, (1 to 30).map(i => s"w${i}_$tag").mkString(" "))

    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st13AdmitStream(
      input.toDS().toDF("doc_id", "text"), lake, ckpt)
    // drain 1 against the nonexistent lake: everything admits, the
    // tree is created
    input.addData(doc(1L, "a"), doc(2L, "b"))
    q.processAllAvailable()
    // drain 2 still gates against what batch 0 just admitted
    input.addData((3L, doc(1L, "a")._2 + " tail"), doc(4L, "c"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L),
      s"lake holds $ids — want batch 0 fully admitted, near-dup 3 rejected")
  }

  test("st13 catch-up respects a compacted index: watermark coverage, no re-index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st13c")
    val lake = dir.resolve("lake").toString
    def doc(id: Long, tag: String) =
      (id, (1 to 30).map(i => s"w${i}_$tag").mkString(" "))
    Streams.admitBatch(
      Seq(doc(1L, "a"), doc(2L, "b")).toDF("doc_id", "text"), lake, 0L)
    Streams.admitBatch(
      Seq(doc(3L, "c")).toDF("doc_id", "text"), lake, 1L)

    val index = Streams.lakeIndexPath(lake)
    graft.operators.Dedup.d13CompactIndex(spark, index, upTo = 1L)
    def bandDirs(): Set[String] =
      new java.io.File(s"$index/bands").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getName).toSet
    assert(bandDirs() == Set("batch=-3"), s"compact left ${bandDirs()}")

    // the folded dir covers lake batches 0..1: the next admission must
    // NOT re-index them (no batch=0/1 dirs reappear) and must still
    // reject a near-dup of a folded batch's doc
    Streams.admitBatch(
      Seq((10L, doc(1L, "a")._2 + " tail"), doc(11L, "z"))
        .toDF("doc_id", "text"), lake, 2L)
    assert(bandDirs() == Set("batch=-3", "batch=2"),
      s"catch-up re-indexed folded batches: ${bandDirs()}")
    val ids = spark.read.parquet(lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 11L),
      s"lake holds $ids — near-dup 10 must be rejected via the compacted base")
  }

  test("st13 gate bytes scale with batch + index touch, never the lake (x11 proof)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st13bytes")
    val lake = dir.resolve("lake").toString
    // fat lake: 400 decorrelated docs × 500 tokens — the TEXT is the
    // dominant on-disk artifact, exactly what the indexed gate must
    // never read (the per-doc tag keeps cross-doc similarity at zero,
    // so candidate sets are exactly the planted ones)
    def fatDoc(id: Long) =
      (id, (1 to 500).map(i => s"w${i}_d$id").mkString(" "))
    Streams.admitBatch((1L to 400L).map(fatDoc).toDF("doc_id", "text"),
      lake, batchId = 0L)

    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }
    val textBytes = dirBytes(s"$lake/batch=0")
    val shingleBytes = dirBytes(s"${Streams.lakeIndexPath(lake)}/shingles")
    assert(textBytes > 200000 && shingleBytes > 200000,
      s"corpus too small to make the proof meaningful: " +
        s"text=$textBytes shingles=$shingleBytes")

    // zero-collision batch: the gate reads the bands index + nothing
    // else — no lake text, no shingle bucket (sp pruning with an empty
    // candidate set opens zero shingle files). scanSelectedBytes sums
    // the scans' post-pruning selected file bytes — the honest pruning
    // metric (inputReadBytes misses parquet data-page IO on local FS)
    val fresh = (1000L to 1004L).map(fatDoc).toDF("doc_id", "text")
    val (_, mFresh) = graft.Instrument.measure(spark) {
      Streams.admitBatch(fresh, lake, batchId = 1L)
    }
    assert(mFresh.scanSelectedBytes < textBytes / 2,
      s"fresh-batch gate scanned ${mFresh.scanSelectedBytes} bytes — " +
        s"comparable to the lake text ($textBytes): it is re-reading the lake")
    assert(mFresh.scanSelectedBytes < shingleBytes / 2,
      s"fresh-batch gate scanned ${mFresh.scanSelectedBytes} bytes — " +
        s"comparable to the shingle table ($shingleBytes): sp pruning is dead")

    // colliding batch: 3 candidates → ≤ 3 of the 64 shingle buckets
    // read; still nowhere near a lake scan
    val dups = Seq(5L, 6L, 7L)
      .map(i => (2000L + i, fatDoc(i)._2 + " tail")).toDF("doc_id", "text")
    val (_, mDup) = graft.Instrument.measure(spark) {
      Streams.admitBatch(dups, lake, batchId = 2L)
    }
    assert(mDup.scanSelectedBytes < textBytes / 2,
      s"dup-batch gate scanned ${mDup.scanSelectedBytes} vs text $textBytes")

    // the verdicts stayed right while the bytes shrank
    val ids = spark.read.parquet(lake).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert((1000L to 1004L).forall(ids.contains) &&
      Seq(2005L, 2006L, 2007L).forall(id => !ids.contains(id)),
      s"wrong admissions: $ids")

    // and the inline (d11) form on the SAME lake pays the O(lake)
    // re-signature the index kills — the round-trip comparison that
    // makes the scaling claim concrete
    val lakeDf = spark.read.parquet(lake).select("doc_id", "text")
    val mInline = graft.Instrument.profile(
      graft.operators.Dedup.d11IncrementalDedup(
        (3000L to 3004L).map(fatDoc).toDF("doc_id", "text"), lakeDf))
    assert(mFresh.scanSelectedBytes * 2 < mInline.scanSelectedBytes,
      s"indexed gate (${mFresh.scanSelectedBytes}) should scan far less " +
        s"than the inline lake re-signature (${mInline.scanSelectedBytes})")
  }

  test("st15 service cycles: land → st09 → st14 → st13 → maintain, counts conserve") {
    import StreamsSpec.LocalFsFetcher
    val dir = java.nio.file.Files.createTempDirectory("graft_st15")
    val remote = dir.resolve("remote").toString
    val root = dir.resolve("svc").toString
    val lmPath = dir.resolve("lm").toString
    new java.io.File(remote).mkdirs()
    // the t15 LM, trained ONCE on the reference chain (st14's fixture:
    // in-domain contiguous spans score 0, OOV gibberish ≪ 0)
    locally {
      import spark.implicits._
      graft.operators.TextOps.lmTrainTables(
        Seq((1L, (1 to 40).map(i => s"r$i").mkString(" ")))
          .toDF("doc_id", "text"), lmPath)
    }
    def span(a: Int, b: Int) = (a to b).map(i => s"r$i").mkString(" ")
    def drop(name: String, text: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(remote, name), text + "\n")
    def lakeTexts(): Set[String] =
      spark.read.parquet(s"$root/lake")
        .select("text").collect().map(_.getString(0)).toSet
    def audits(): Map[Long, (Long, Long, Long)] =
      spark.read.parquet(s"$root/audit").collect()
        .map(r => r.getAs[Long]("batch_id") ->
          ((r.getAs[Long]("arrived"), r.getAs[Long]("fluent"),
            r.getAs[Long]("admitted")))).toMap

    val fetcher = LocalFsFetcher(remote)
    // cycle 1: a fluent admit, a too-short junk doc (st09), an OOV
    // gibberish doc (st14), a second fluent admit
    drop("a.txt", span(1, 10))
    drop("b.txt", "r5 tiny")
    drop("c.txt", "zz qq ww ee rr tt uu vv")
    drop("d.txt", span(20, 30))
    val audit1 = Streams.st15ServiceCycle(spark, fetcher, root, lmPath)
      .collect()
    assert(audit1.length == 4 && audit1.forall(_.status == "copied"))
    assert(lakeTexts() == Set(span(1, 10), span(20, 30)))
    // st09 dropped b before the batch; st14 rejected c; both admits
    // (batch ids are the checkpoint's business — assert on the rows)
    assert(audits().values.toSeq == Seq((3L, 2L, 2L)), s"got ${audits()}")

    // cycle 2: an exact re-crawl of a (new file, same text — st09's
    // cross-cycle fingerprint state), a near-dup of d (st13, via the
    // maintained index: d was admitted by a PREVIOUS cycle), a fresh doc
    drop("e.txt", span(1, 10))
    drop("f.txt", span(20, 30) + " r31")
    drop("g.txt", span(32, 40))
    val audit2 = Streams.st15ServiceCycle(spark, fetcher, root, lmPath)
      .collect()
    assert(audit2.map(_.rel_path).sorted.toSeq ==
      Seq("e.txt", "f.txt", "g.txt"), audit2.mkString("; "))
    assert(lakeTexts() == Set(span(1, 10), span(20, 30), span(32, 40)),
      s"lake = ${lakeTexts()}")
    assert(audits().values.toSet == Set((3L, 2L, 2L), (2L, 2L, 1L)),
      s"got ${audits()}")

    // cycle 3: unchanged remote — one enumeration, zero downloads,
    // empty drain, nothing moves
    val lakeBefore = lakeTexts()
    val auditsBefore = audits()
    val audit3 = Streams.st15ServiceCycle(spark, fetcher, root, lmPath)
      .collect()
    assert(audit3.isEmpty, audit3.mkString("; "))
    assert(lakeTexts() == lakeBefore && audits() == auditsBefore)

    // cycle 4 (f17 through the SERVICE — VERDICT r17 next #1): a
    // conditional fetcher with metadata-only-bumped mtimes plans all
    // seven files copy_changed; no validators stored yet → one
    // seeding re-copy, ETags captured, nothing re-streams (paths are
    // stream-tracked), lake and audits untouched
    val cond1 = new Streams.CondLocalDirFetcher(remote, 3600000L, pageSize = 2)
    val audit4 = Streams.st15ServiceCycle(spark, cond1, root, lmPath)
      .collect()
    assert(audit4.length == 7 && audit4.forall(_.status == "copied"),
      audit4.mkString("; "))
    assert(audit4.forall(_.etag.nonEmpty))
    assert(lakeTexts() == lakeBefore && audits() == auditsBefore)
    // cycle 5: ANOTHER metadata-only touch — every planned file
    // answers 304 through the service path: not_modified rows, zero
    // body bytes, nothing moves
    val cond2 = new Streams.CondLocalDirFetcher(remote, 7200000L, pageSize = 2)
    val audit5 = Streams.st15ServiceCycle(spark, cond2, root, lmPath)
      .collect()
    assert(audit5.length == 7 &&
      audit5.forall(_.status == "not_modified"), audit5.mkString("; "))
    assert(audit5.forall(_.bytes == 0L), "a 304 must move zero body bytes")
    assert(lakeTexts() == lakeBefore && audits() == auditsBefore)
    // cycle 6: the 304's mtime touch re-plans noop — empty plan
    val audit6 = Streams.st15ServiceCycle(spark, cond2, root, lmPath)
      .collect()
    assert(audit6.isEmpty, audit6.mkString("; "))

    // maintenance stayed fresh: the doclen stats table covers exactly
    // the admissions and prunes by token count (g is the only 9-token
    // admit; a=10, d=11)
    import graft.sources.StatsIndex
    val manifest = StatsIndex.stats(spark, s"$root/doclen").collect()
    assert(manifest.map(_.getLong(3)).sum == 3L)
    val probe = StatsIndex.prunedRead(spark, s"$root/doclen",
      "n_tokens", 9L, 9L).collect()
    assert(probe.length == 1 && probe.head.getAs[Long]("n_tokens") == 9L)
  }

  test("st15 with the classifier model: the fourth gate fires, counts conserve") {
    import StreamsSpec.LocalFsFetcher
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st15c")
    val remote = dir.resolve("remote").toString
    val root = dir.resolve("svc").toString
    val lmPath = dir.resolve("lm").toString
    val modelPath = dir.resolve("model").toString
    new java.io.File(remote).mkdirs()
    def span(p: String, a: Int, b: Int) =
      (a to b).map(i => s"$p$i").mkString(" ")
    // the LM knows BOTH chains (r and n), so an n-span doc is FLUENT —
    // only the classifier can tell the domains apart
    graft.operators.TextOps.lmTrainTables(
      Seq((1L, span("r", 1, 40)), (2L, span("n", 1, 40)))
        .toDF("doc_id", "text"), lmPath)
    // classifier: r-domain docs are the quality exemplar
    graft.operators.Corpus.c16ModelBuild(
      Seq((1L, span("r", 1, 20), 1), (2L, span("r", 21, 40), 1),
        (3L, span("n", 1, 20), 0), (4L, span("n", 21, 40), 0))
        .toDF("doc_id", "text", "label"), modelPath)

    def drop(name: String, text: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(remote, name), text + "\n")
    // both stream docs are ≥8 tokens (st09) and LM-fluent (st14);
    // only the r-domain doc should survive the classifier
    drop("a.txt", span("r", 5, 12))
    drop("b.txt", span("n", 5, 12))
    val fetcher = LocalFsFetcher(remote)
    val audit = Streams.st15ServiceCycle(spark, fetcher, root, lmPath,
      classifierModelPath = modelPath).collect()
    assert(audit.length == 2 && audit.forall(_.status == "copied"))

    val lake = spark.read.parquet(s"$root/lake")
      .select("text").collect().map(_.getString(0)).toSet
    assert(lake == Set(span("r", 5, 12)), s"lake = $lake")
    val audits = spark.read.parquet(s"$root/audit").collect()
      .map(r => (r.getAs[Long]("arrived"), r.getAs[Long]("fluent"),
        r.getAs[Long]("kept"), r.getAs[Long]("admitted"))).toSeq
    // 2 arrived, both fluent, classifier kept 1, near-dup gate kept it
    assert(audits == Seq((2L, 2L, 1L, 1L)), s"got $audits")
  }

  test("st15 with the benchmark shingle set: the decontam gate fires, counts conserve") {
    import StreamsSpec.LocalFsFetcher
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st15d")
    val remote = dir.resolve("remote").toString
    val root = dir.resolve("svc").toString
    val lmPath = dir.resolve("lm").toString
    val benchPath = dir.resolve("bench").toString
    new java.io.File(remote).mkdirs()
    def span(p: String, a: Int, b: Int) =
      (a to b).map(i => s"$p$i").mkString(" ")
    // the LM knows BOTH chains (r and b), so a doc quoting the
    // benchmark is FLUENT — only the decontam gate can reject it
    graft.operators.TextOps.lmTrainTables(
      Seq((1L, span("r", 1, 40)), (2L, span("b", 1, 40)))
        .toDF("doc_id", "text"), lmPath)
    // the persisted benchmark shingle set (st17's build half)
    graft.operators.Corpus.c03BenchBuild(
      Seq((1L, span("b", 1, 20))).toDF("doc_id", "text"), benchPath)

    def drop(name: String, text: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(remote, name), text + "\n")
    // both docs are ≥8 tokens (st09) and LM-fluent (st14); b.txt
    // embeds an 8-token benchmark passage (4 shared 5-shingles ≥ 3)
    // — only the decontam gate separates them
    drop("a.txt", span("r", 5, 12))
    drop("b.txt", span("b", 5, 12))
    val fetcher = LocalFsFetcher(remote)
    val audit = Streams.st15ServiceCycle(spark, fetcher, root, lmPath,
      benchShinglePath = benchPath).collect()
    assert(audit.length == 2 && audit.forall(_.status == "copied"))

    val lake = spark.read.parquet(s"$root/lake")
      .select("text").collect().map(_.getString(0)).toSet
    assert(lake == Set(span("r", 5, 12)), s"lake = $lake")
    val audits = spark.read.parquet(s"$root/audit").collect()
      .map(r => (r.getAs[Long]("arrived"), r.getAs[Long]("fluent"),
        r.getAs[Long]("kept"), r.getAs[Long]("screened"),
        r.getAs[Long]("admitted"))).toSeq
    // 2 arrived, both fluent, no classifier (kept = fluent), decontam
    // screened out the quoting doc, near-dup admitted the survivor
    assert(audits == Seq((2L, 2L, 2L, 1L, 1L)), s"got $audits")
  }

  test("st15 with the perplexity gate: only the tercile axis separates two fluent docs") {
    import StreamsSpec.LocalFsFetcher
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st15x")
    val remote = dir.resolve("remote").toString
    val root = dir.resolve("svc").toString
    val lmPath = dir.resolve("lm").toString
    val gatePath = dir.resolve("gate").toString
    new java.io.File(remote).mkdirs()
    def span(p: String, a: Int, b: Int) =
      (a to b).map(i => s"$p$i").mkString(" ")
    // every doc leads with the en markers so the service's t03 lang
    // derivation maps them onto the gate's 'en' cutoffs
    val marker = "the and of to is with that"
    val good = marker + " " + span("g", 1, 10)
    val mid = marker + " " + span("g", 1, 5) + " " + span("x", 6, 10)
    val bad = marker + " " + span("x", 1, 10)
    // st14's LM knows BOTH chains — both stream docs are FLUENT;
    // only the corpus-RELATIVE tercile can separate them
    graft.operators.TextOps.lmTrainTables(
      Seq((1L, good), (2L, bad)).toDF("doc_id", "text"), lmPath)
    // the c28 gate artifacts: LM from the g-chain reference, terciles
    // from a 3-doc 'en' corpus (good=head, mid=middle, bad=tail)
    graft.operators.Corpus.c28GateBuild(
      Seq((10L, "en", good), (11L, "en", mid), (12L, "en", bad))
        .toDF("doc_id", "lang", "text"),
      Seq((1L, marker + " " + span("g", 1, 30))).toDF("doc_id", "text"),
      gatePath, sampleMod = 1L)
    def drop(name: String, text: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(remote, name), text + "\n")
    drop("a.txt", good)
    drop("b.txt", bad)
    val fetcher = LocalFsFetcher(remote)
    val audit = Streams.st15ServiceCycle(spark, fetcher, root, lmPath,
      ppxGatePath = gatePath).collect()
    assert(audit.length == 2 && audit.forall(_.status == "copied"))
    val lake = spark.read.parquet(s"$root/lake")
      .select("text").collect().map(_.getString(0)).toSet
    assert(lake == Set(good), s"lake = $lake")
    val audits = spark.read.parquet(s"$root/audit").collect()
      .map(r => (r.getAs[Long]("arrived"), r.getAs[Long]("fluent"),
        r.getAs[Long]("kept"), r.getAs[Long]("screened"),
        r.getAs[Long]("curated"), r.getAs[Long]("admitted"))).toSeq
    // 2 arrived, both fluent, classifier/decontam off (kept =
    // screened = fluent), the SIXTH axis cut the tail doc, near-dup
    // admitted the survivor — conservation through all six gates
    assert(audits == Seq((2L, 2L, 2L, 2L, 1L, 1L)), s"got $audits")
  }

  test("st15 with PII scrub: docs land redacted, counts conserve through the transform") {
    import StreamsSpec.LocalFsFetcher
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st15p")
    val remote = dir.resolve("remote").toString
    val root = dir.resolve("svc").toString
    val lmPath = dir.resolve("lm").toString
    new java.io.File(remote).mkdirs()
    def span(p: String, a: Int, b: Int) =
      (a to b).map(i => s"$p$i").mkString(" ")
    graft.operators.TextOps.lmTrainTables(
      Seq((1L, span("r", 1, 40))).toDF("doc_id", "text"), lmPath)
    def drop(name: String, text: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(remote, name), text + "\n")
    // fluent doc carrying an email — must LAND (scrub is a transform,
    // not a gate) with the address redacted
    drop("a.txt", span("r", 5, 12) + " ping joe@crawl.io")
    drop("b.txt", span("r", 20, 30))
    val fetcher = LocalFsFetcher(remote)
    val audit = Streams.st15ServiceCycle(spark, fetcher, root, lmPath,
      scrubPii = true).collect()
    assert(audit.length == 2 && audit.forall(_.status == "copied"))

    val lake = spark.read.parquet(s"$root/lake")
      .select("text").collect().map(_.getString(0)).toSet
    assert(lake == Set(span("r", 5, 12) + " ping <EMAIL>",
      span("r", 20, 30)), s"lake = $lake")
    val audits = spark.read.parquet(s"$root/audit").collect()
      .map(r => (r.getAs[Long]("arrived"), r.getAs[Long]("fluent"),
        r.getAs[Long]("kept"), r.getAs[Long]("screened"),
        r.getAs[Long]("admitted"))).toSeq
    // the scrub rejected nothing: every stage count is conserved
    assert(audits == Seq((2L, 2L, 2L, 2L, 2L)), s"got $audits")
  }

  test("st15 against a live 429-throttling endpoint: counts conserve, zero duplicate landings") {
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import java.util.concurrent.atomic.AtomicInteger
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_st15t")
    val root = dir.resolve("svc").toString
    val lmPath = dir.resolve("lm").toString
    def span(a: Int, b: Int) = (a to b).map(i => s"r$i").mkString(" ")
    graft.operators.TextOps.lmTrainTables(
      Seq((1L, span(1, 40))).toDF("doc_id", "text"), lmPath)

    // the mutable "remote": name -> text, served paged over live HTTP
    // with every 3rd list and every 4th content request answered
    // 429 Retry-After: 0 — f08's retry must absorb the throttles at
    // the SERVICE level, mid-enumeration and mid-copy, without
    // duplicating or dropping a landing
    val remote = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val listCalls = new AtomicInteger(0)
    val contentCalls = new AtomicInteger(0)
    val throttled = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def send(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext("/list", (ex: HttpExchange) => {
      if (listCalls.incrementAndGet() % 3 == 0) {
        throttled.incrementAndGet()
        ex.getResponseHeaders.add("Retry-After", "0")
        send(ex, 429, Array.empty)
      } else {
        val params = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
          }.toMap
        val off = params.get("token").map(_.toInt).getOrElse(0)
        val all = remote.keySet().toArray(Array.empty[String]).sorted.toSeq
        val page = all.slice(off, off + 2)
        val items = page.map { name =>
          // +1: the content endpoint serves text + "\n" — the listed
          // size must match the served bytes or the sync diff marks
          // every unchanged file copy_changed forever
          val size = remote.get(name).length + 1
          s"""{"id":"/c/$name","name":"$name","isDir":false,"size":$size,"mtime":1700000000000}"""
        }.mkString("[", ",", "]")
        val next =
          if (off + 2 < all.size) s""","nextToken":"${off + 2}"""" else ""
        send(ex, 200,
          s"""{"items":$items$next}""".getBytes(StandardCharsets.UTF_8))
      }
    })
    server.createContext("/c/", (ex: HttpExchange) => {
      if (contentCalls.incrementAndGet() % 4 == 0) {
        throttled.incrementAndGet()
        ex.getResponseHeaders.add("Retry-After", "0")
        send(ex, 429, Array.empty)
      } else {
        val name = ex.getRequestURI.getPath.stripPrefix("/c/")
        Option(remote.get(name)) match {
          case Some(t) => send(ex, 200, (t + "\n").getBytes(StandardCharsets.UTF_8))
          case None    => send(ex, 404, Array.empty)
        }
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = new graft.sources.PagedSource.HttpJsonFetcher(base)
      def audits(): Seq[(Long, Long, Long)] =
        spark.read.parquet(s"$root/audit").collect()
          .map(r => (r.getAs[Long]("arrived"), r.getAs[Long]("fluent"),
            r.getAs[Long]("admitted"))).toSeq
      def lakeTexts(): Set[String] =
        spark.read.parquet(s"$root/lake")
          .select("text").collect().map(_.getString(0)).toSet

      // cycle 1: fluent admit, st09 junk, st14 gibberish, fluent admit
      remote.put("a.txt", span(1, 10))
      remote.put("b.txt", "r5 tiny")
      remote.put("c.txt", "zz qq ww ee rr tt uu vv")
      remote.put("d.txt", span(20, 30))
      val audit1 = Streams.st15ServiceCycle(spark, fetcher, root, lmPath)
        .collect()
      assert(audit1.length == 4 && audit1.forall(_.status == "copied"),
        audit1.mkString("; "))
      assert(lakeTexts() == Set(span(1, 10), span(20, 30)))
      assert(audits() == Seq((3L, 2L, 2L)), s"got ${audits()}")
      assert(throttled.get() > 0, "server never throttled — test is vacuous")

      // cycle 2: one fresh admit + one near-dup reject; the unchanged
      // remote files must be skip-diffed (no re-download, no audit row)
      remote.put("e.txt", span(32, 40))
      remote.put("f.txt", span(20, 30) + " r31")
      val t0 = throttled.get()
      val audit2 = Streams.st15ServiceCycle(spark, fetcher, root, lmPath)
        .collect()
      assert(audit2.map(_.rel_path).sorted.toSeq == Seq("e.txt", "f.txt"),
        audit2.mkString("; "))
      assert(audit2.forall(_.status == "copied"))
      assert(lakeTexts() == Set(span(1, 10), span(20, 30), span(32, 40)))
      assert(audits().toSet == Set((3L, 2L, 2L), (2L, 2L, 1L)),
        s"got ${audits()}")
      assert(throttled.get() > t0,
        "cycle 2 saw no throttles — the mid-sync leg is vacuous")

      // zero duplicate landings: exactly one landed file per remote
      // object, bit-for-bit the remote text
      val landed = new java.io.File(s"$root/landing").listFiles()
        .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      assert(landed.map(_.getName).sorted.toSeq ==
        Seq("a.txt", "b.txt", "c.txt", "d.txt", "e.txt", "f.txt"))
      landed.foreach { f =>
        assert(java.nio.file.Files.readString(f.toPath) ==
          remote.get(f.getName) + "\n", s"landing drift in ${f.getName}")
      }
    } finally server.stop(0)
  }

  test("st11 streamed appends keep the stats manifest fresh and prunable") {
    import spark.implicits._
    import graft.sources.StatsIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_st11")
    val table = dir.resolve("table").toString
    val ckpt = dir.resolve("ckpt").toString

    val input = MemoryStream[(Long, Long)](spark)
    val q = Streams.st11StatsMaintain(
      input.toDS().toDF("id", "v"), table, "v", ckpt)
    // drain 1: values 0–99
    input.addData((0L until 100L).map(i => (i, i)): _*)
    q.processAllAvailable()
    // drain 2: values 100–199
    input.addData((100L until 200L).map(i => (i, i)): _*)
    q.processAllAvailable()
    q.stop()

    // manifest covers exactly the files on disk; rows conserved
    val manifest = StatsIndex.stats(spark, table).collect()
    assert(manifest.map(_.getLong(3)).sum == 200L)
    val probe = StatsIndex.prunedRead(spark, table, "v", 150L, 180L)
    assert(probe.count() == 31L)
    // pruning has teeth across batches: drain 1's files can't overlap
    val scanned = probe.inputFiles.toSet
    assert(scanned.nonEmpty && scanned.forall(_.contains("/batch=1/")),
      s"expected only batch=1 files, got $scanned")
    assert(scanned.subsetOf(manifest.map(_.getString(0)).toSet))

    // replay idempotency: re-running a batch id with the same rows
    // leaves the table row set and the manifest unchanged
    val again = Seq((100L until 200L).map(i => (i, i)): _*).toDF("id", "v")
    StatsIndex.appendBatchWithStats(again, table, "v", 1L)
    assert(StatsIndex.stats(spark, table).collect()
      .map(_.getLong(3)).sum == 200L)
    assert(spark.read.parquet(table).count() == 200L)
  }

  test("st20 URL gate: in-batch dedup, lake probe, conservation, idempotent replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st20")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    // drain 1: docs 1/2 collapse in-batch (case + default port); 3 fresh
    val stream1 = Seq(
      (1L, "https://A.com/x"),
      (2L, "https://a.com:443/x"),
      (3L, "https://b.com/y?utm_source=s"))
    // drain 2: 10 re-crawls an admitted target (fragment variant),
    // 11/12 collapse in-batch (trailing slash)
    val stream2 = Seq(
      (10L, "https://a.com/x#frag"),
      (11L, "https://c.com/z/"),
      (12L, "https://c.com/z"))
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st20UrlGateStream(
      input.toDS().toDF("doc_id", "url"), lake, ckpt)
    input.addData(stream1: _*)
    q.processAllAvailable()
    input.addData(stream2: _*)
    q.processAllAvailable()
    q.stop()

    val lakeRows = spark.read.parquet(lake).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("canon_url"))
    assert(lakeRows.toMap == Map(
      1L -> "https://a.com/x",
      3L -> "https://b.com/y",
      11L -> "https://c.com/z"), s"lake holds ${lakeRows.toSeq}")
    // the lake's canonical URLs are unique corpus-wide
    assert(lakeRows.map(_._2).distinct.length == lakeRows.length)
    def auditOf(): Map[Long, (Long, Long, Long, Long)] =
      spark.read.parquet(lake + ".audit").collect()
        .map(r => r.getAs[Long]("batch_id") ->
          (r.getAs[Long]("arrived"), r.getAs[Long]("admitted"),
            r.getAs[Long]("dup_batch"), r.getAs[Long]("dup_lake"))).toMap
    val audit = auditOf()
    assert(audit(0L) == ((3L, 2L, 1L, 0L)), s"batch 0 audit: $audit")
    assert(audit(1L) == ((3L, 1L, 1L, 1L)), s"batch 1 audit: $audit")
    // replay drain 2 as a batch body: the probe excludes the batch's
    // own index directory, so verdicts re-derive identically and the
    // landings rewrite in place
    Streams.urlGateBatch(stream2.toDF("doc_id", "url"), lake, batchId = 1L)
    val after = spark.read.parquet(lake).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("canon_url")).toMap
    assert(after == lakeRows.toMap, s"replay changed the lake: $after")
    assert(auditOf() == audit, "replay changed the audit")
  }

  test("st21 media scrub: PNGs scrubbed to original bytes, others pass through") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st21")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    import graft.operators.Multimodal
    val wav = Multimodal.synthWav(4L)
    val stream1 = Seq(
      (1L, Multimodal.synthMetaImage(1L)), // PNG with 2 metadata chunks
      (4L, wav),                           // non-media: byte-exact passthrough
      (5L, Multimodal.synthMetaJpeg(5L)))  // JPEG with EXIF+COM
    // 9: PNG-tagged but corrupt (flipped data byte → bad CRC) — the
    // poison pill that must quarantine, not wedge the stream
    val poison = Multimodal.synthMetaImage(9L).clone()
    poison(20) = (poison(20) ^ 0x01).toByte
    val stream2 = Seq((7L, Multimodal.synthMetaImage(7L)), (9L, poison))
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = Streams.st21MediaScrubStream(
      input.toDS().toDF("doc_id", "payload"), lake, ckpt)
    input.addData(stream1: _*)
    q.processAllAvailable()
    input.addData(stream2: _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.read.parquet(lake).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
      .toMap
    assert(rows.keySet == Set(1L, 4L, 5L, 7L))
    // scrubbed PNGs equal the independently re-synthesized originals
    assert(java.util.Arrays.equals(rows(1L), Multimodal.synthImage(1L)))
    assert(java.util.Arrays.equals(rows(7L), Multimodal.synthImage(7L)))
    // the JPEG lost its EXIF+COM and equals the re-synthesized original
    assert(java.util.Arrays.equals(rows(5L), Multimodal.synthJpeg(5L)))
    // the WAV passed through byte-identically
    assert(java.util.Arrays.equals(rows(4L), wav))
    // the poison pill did NOT wedge the stream, did NOT reach the
    // lake, and sits unmodified in quarantine
    assert(!rows.contains(9L))
    val quarantined = spark.read.parquet(lake + ".quarantine").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
      .toMap
    assert(quarantined.keySet == Set(9L) &&
      java.util.Arrays.equals(quarantined(9L), poison))
    val audit = spark.read.parquet(lake + ".audit").collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("n_png"),
          r.getAs[Long]("n_jpeg"), r.getAs[Long]("n_meta"),
          r.getAs[Long]("bytes_in"), r.getAs[Long]("bytes_out"),
          r.getAs[Long]("n_corrupt"))).toMap
    // drain 1: one PNG (2 meta chunks) + one JPEG (2 meta segments)
    assert(audit(0L)._1 == 3L && audit(0L)._2 == 1L &&
      audit(0L)._3 == 1L && audit(0L)._4 == 4L && audit(0L)._7 == 0L)
    assert(audit(1L) == ((2L, 1L, 0L, 2L,
      Multimodal.synthMetaImage(7L).length.toLong + poison.length,
      Multimodal.synthImage(7L).length.toLong + poison.length, 1L)))
    // replay: re-running a batch body rewrites byte-identically
    Streams.mediaScrubBatch(stream1.toDF("doc_id", "payload"), lake, 0L)
    val after = spark.read.parquet(lake).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
      .toMap
    assert(after.keySet == rows.keySet &&
      after.forall { case (k, v) => java.util.Arrays.equals(v, rows(k)) })
    // a NULL payload (failed fetch) quarantines instead of NPE'ing the
    // task before the Try — the other poison-pill shape
    Streams.mediaScrubBatch(
      Seq((11L, null: Array[Byte])).toDF("doc_id", "payload"),
      lake, batchId = 5L)
    val a5 = spark.read.parquet(lake + ".audit").where("batch_id = 5")
      .collect().head
    assert((a5.getAs[Long]("docs"), a5.getAs[Long]("n_corrupt")) ==
      ((1L, 1L)), s"null-payload audit $a5")
    assert(spark.read.parquet(s"$lake.quarantine/batch=5").count() == 1)
  }

  test("st23 domain quota: ledger caps across drains, replay idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st23")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    def urls(ids: Seq[Long], dom: String) =
      ids.map(id => (id, s"https://$dom/page/$id"))
    // drain 1: 8 docs on a.com, 3 on b.com — cap 5
    val stream1 = urls(1L to 8L, "a.com") ++ urls(20L to 22L, "b.com")
    // drain 2: fresh ids on both — a.com is FULL (ledger, not rank,
    // must reject), b.com has 2 slots left
    val stream2 = urls(100L to 103L, "a.com") ++ urls(120L to 124L, "b.com")
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.st23DomainQuotaStream(
      input.toDS().toDF("doc_id", "url"), lake, ckpt, cap = 5L)
    input.addData(stream1: _*)
    q.processAllAvailable()
    input.addData(stream2: _*)
    q.processAllAvailable()
    q.stop()

    val landed = spark.read.parquet(lake).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("domain"))
    // drain 1: lowest 5 a.com ids + all 3 b.com
    // drain 2: zero a.com, exactly 2 more b.com (lowest fresh ids)
    assert(landed.filter(_._2 == "a.com").map(_._1).sorted.toSeq ==
      (1L to 5L))
    assert(landed.filter(_._2 == "b.com").map(_._1).sorted.toSeq ==
      Seq(20L, 21L, 22L, 120L, 121L))
    val audit = spark.read.parquet(lake + ".audit").collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("arrived"), r.getAs[Long]("admitted"),
          r.getAs[Long]("over_quota"))).toMap
    assert(audit(0L) == ((11L, 8L, 3L)))
    assert(audit(1L) == ((9L, 2L, 7L)))
    // replay drain 2's body: the ledger read excludes batch=1's own
    // counts, so verdicts re-derive identically and landings rewrite
    Streams.domainQuotaBatch(stream2.toDF("doc_id", "url"), lake, 5L, 1L)
    val after = spark.read.parquet(lake).collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    assert(after == landed.map(_._1).sorted.toSeq, "replay changed the lake")
    assert(spark.read.parquet(lake + ".domcounts")
      .groupBy("domain").sum("n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a.com" -> 5L, "b.com" -> 5L))
    // schemeless/junk URLs are their OWN domains (the canonDomain
    // self-domain rule): they must never share one "" budget — two
    // distinct junk URLs both admit even at cap 1-per-domain
    Streams.domainQuotaBatch(
      Seq((500L, "not-a-url"), (501L, "mailto:x@y.z"))
        .toDF("doc_id", "url"), lake, 5L, 2L)
    val junk = spark.read.parquet(lake)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 500L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("domain")).toMap
    assert(junk == Map(500L -> "not-a-url", 501L -> "mailto:x@y.z"))
  }

  test("st23 ledger compaction: history folds to one base, verdicts unchanged, replay safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st23c")
    val lake = dir.resolve("lake").toString
    def urls(ids: Seq[Long], dom: String) =
      ids.map(id => (id, s"https://$dom/p/$id"))
    // batches 0..3: 2 docs/drain on a.com + 1 on b.com, cap 7 —
    // a.com fills mid-batch-3 (admits 31, rejects 32)
    for (b <- 0L to 3L)
      Streams.domainQuotaBatch(
        (urls(Seq(10 * b + 1, 10 * b + 2), "a.com") ++
          urls(Seq(10 * b + 5), "b.com")).toDF("doc_id", "url"),
        lake, 7L, b)
    val ledger = () => spark.read
      .schema("domain STRING, n BIGINT, batch BIGINT")
      .parquet(lake + ".domcounts")
      .groupBy("domain").agg(org.apache.spark.sql.functions.sum("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pre = ledger()
    assert(pre == Map("a.com" -> 7L, "b.com" -> 4L))
    // compact everything except the replayable last batch
    Streams.domainQuotaCompactLedger(spark, lake, upTo = 2L)
    def batchDirs() = new java.io.File(lake + ".domcounts").listFiles
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(batchDirs() == Set("batch=-4", "batch=3"), "one base + the tail")
    assert(ledger() == pre, "compaction changed total counts")
    // idempotent: same upTo is a no-op
    Streams.domainQuotaCompactLedger(spark, lake, upTo = 2L)
    assert(batchDirs() == Set("batch=-4", "batch=3"))
    // next drain's verdicts against the compacted ledger: a.com full,
    // b.com has 3 slots left
    Streams.domainQuotaBatch(
      (urls(Seq(41L, 42L), "a.com") ++ urls(Seq(45L), "b.com"))
        .toDF("doc_id", "url"), lake, 7L, 4L)
    val landed4 = spark.read.parquet(s"$lake/batch=4").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(landed4 == Seq(45L), "compacted prior must reject full a.com")
    // replay the UNCOMPACTED tail batch: the base (not batch=3's own
    // counts) supplies prior, verdicts re-derive identically
    Streams.domainQuotaBatch(
      (urls(Seq(31L, 32L), "a.com") ++ urls(Seq(35L), "b.com"))
        .toDF("doc_id", "url"), lake, 7L, 3L)
    val landed3 = spark.read.parquet(s"$lake/batch=3").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(landed3 == Seq(31L, 35L), "replay changed batch-3 verdicts")
    assert(ledger() == Map("a.com" -> 7L, "b.com" -> 5L))
    // second compaction folds the old base + the tail into a new base;
    // a leftover old base (crash window) would be ignored by readers
    Streams.domainQuotaCompactLedger(spark, lake, upTo = 3L)
    assert(batchDirs() == Set("batch=-5", "batch=4"))
    assert(ledger() == Map("a.com" -> 7L, "b.com" -> 5L))
  }

  test("st22 warc intake: conversion text lands, plumbing dropped, poison quarantined") {
    import spark.implicits._
    import graft.sources.WarcSource
    val dir = java.nio.file.Files.createTempDirectory("graft_st22")
    val lake = dir.resolve("lake").toString
    val ckpt = dir.resolve("ckpt").toString
    def arch(id: Long, text: String) =
      WarcSource.buildWarc(WarcSource.demoRecords(id, text))
    // drain 1: plain + whole-file gzip; drain 2: per-record members +
    // a truncated poison archive
    val stream1 = Seq(
      (1L, arch(1L, "alpha text one")),
      (2L, WarcSource.gzip(arch(2L, "bravo text éé two"))))
    val poison = arch(9L, "poisoned").dropRight(7)
    val stream2 = Seq(
      (3L, WarcSource.gzipPerRecord(WarcSource.demoRecords(3L, "charlie"))),
      (9L, poison))
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = Streams.st22WarcIntakeStream(
      input.toDS().toDF("archive_id", "payload"), lake, ckpt)
    input.addData(stream1: _*)
    q.processAllAvailable()
    input.addData(stream2: _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.read.parquet(lake).collect()
      .map(r => r.getAs[Long]("archive_id") ->
        (r.getAs[Long]("idx"), r.getAs[String]("record_id"),
          r.getAs[String]("target_uri"), r.getAs[String]("text"))).toMap
    // only CONVERSION records land (idx 1 of each demo archive);
    // warcinfo plumbing is counted, never landed
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == ((1L, "urn:graft:doc:1",
      "https://example.org/doc/1", "alpha text one")))
    assert(rows(2L)._4 == "bravo text éé two") // gzip + multi-byte exact
    assert(rows(3L)._4 == "charlie")           // member-gzip layout
    // poison quarantined unmodified, stream not wedged
    val quarantined = spark.read.parquet(lake + ".quarantine").collect()
      .map(r => r.getAs[Long]("archive_id") ->
        r.getAs[Array[Byte]]("payload")).toMap
    assert(quarantined.keySet == Set(9L) &&
      java.util.Arrays.equals(quarantined(9L), poison))
    // audit conserves archives = parsed + corrupt, counts plumbing
    val audit = spark.read.parquet(lake + ".audit").collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("archives"), r.getAs[Long]("parsed"),
          r.getAs[Long]("corrupt"), r.getAs[Long]("records"),
          r.getAs[Long]("conversions"))).toMap
    assert(audit(0L) == ((2L, 2L, 0L, 4L, 2L)))
    assert(audit(1L) == ((2L, 1L, 1L, 2L, 1L)))
    // replay: re-running a batch body rewrites byte-identically
    Streams.warcIntakeBatch(stream1.toDF("archive_id", "payload"), lake, 0L)
    val after = spark.read.parquet(lake).collect()
      .map(r => r.getAs[Long]("archive_id") -> r.getAs[String]("text")).toMap
    assert(after == rows.map { case (k, v) => k -> v._4 })
    assert(spark.read.parquet(lake + ".audit").count() == 2L)
  }

  test("st20 bench phases: seeded index gates a mixed recurrence drain") {
    val sf = graft.TestSpark.Sf0001
    Streams.st20BenchBuild(spark, sf)
    val lake = Streams.st20BenchGate(spark, sf).head().getString(0)
    val audit = spark.read.parquet(lake + ".audit")
      .orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // build drain: 500 arrivals, 2 canonical targets per group of 5
    assert(audit.head == ((-1L, 500L, 200L, 300L, 0L)), audit.head)
    // gate drain: conservation holds; every even row (250) re-crawls
    // an admitted target and lands as dup_lake after in-batch dedup,
    // odd rows split between fresh admissions and in-batch dups
    val (_, arrived, admitted, dupBatch, dupLake) = audit(1)
    assert(arrived == 500L && admitted + dupBatch + dupLake == arrived)
    assert(admitted > 0L && dupBatch > 0L && dupLake > 0L, audit(1))
    // no canonical URL ever admitted twice
    val urls = spark.read.parquet(lake + ".urlindex")
      .select("canon_url").collect().map(_.getString(0))
    assert(urls.distinct.length == urls.length, "duplicate canon in index")
  }

  test("st13 conditional landing: an identical replay moves zero lake bytes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st13cond")
      .toString
    val lake = s"$dir/lake"
    // fully distinct shingle sets per doc — the near-dup gate must
    // admit every row, so the leg tests the LANDING, not the gate
    def mk(ids: Seq[Long]) = ids
      .map(i => (i, (1 to 30).map(k => s"w${i}x$k").mkString(" ")))
      .toDF("doc_id", "text")
    Streams.admitBatch(mk(1L to 5L), lake, batchId = 0L)
    Streams.admitBatch(mk(101L to 105L), lake, batchId = 1L)
    val a1 = spark.read.parquet(s"$lake.audit/batch=1").collect().head
    assert(a1.getAs[String]("outcome") == "landed" &&
      a1.getAs[Long]("n_rows") == 5L, s"$a1")
    def lakeFiles() = new java.io.File(s"$lake/batch=1").listFiles()
      .filter(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(f => f.getName -> f.lastModified()).toMap
    val files1 = lakeFiles()
    val bandRows = spark.read
      .parquet(s"${Streams.lakeIndexPath(lake)}/bands").count()
    Thread.sleep(1100) // mtime resolution: a rewrite WOULD move mtimes
    // identical replay (the foreachBatch at-least-once shape): the
    // stored fingerprint matches → no staging write, no target swap
    Streams.admitBatch(mk(101L to 105L), lake, batchId = 1L)
    assert(lakeFiles() == files1,
      "identical replay must leave lake file mtimes untouched")
    val a2 = spark.read.parquet(s"$lake.audit/batch=1").collect().head
    assert(a2.getAs[String]("outcome") == "skipped_identical" &&
      a2.getAs[Long]("content_fp") == a1.getAs[Long]("content_fp"),
      s"$a2")
    assert(spark.read.parquet(s"${Streams.lakeIndexPath(lake)}/bands")
      .count() == bandRows, "index row count must not change on replay")
    // a DIFFERENT replay of the same id (one novel doc appended) must
    // rewrite — the guard is conditional, not a landing freeze
    Streams.admitBatch(mk(101L to 106L), lake, batchId = 1L)
    val a3 = spark.read.parquet(s"$lake.audit/batch=1").collect().head
    assert(a3.getAs[String]("outcome") == "landed" &&
      a3.getAs[Long]("n_rows") == 6L, s"$a3")
    assert(spark.read.parquet(s"$lake/batch=1").count() == 6L)
  }

  test("announce ledger heartbeat probe opens only the probed keys' buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_annkb")
      .toString
    val lake = s"$dir/lake"
    val hosts = (0 until 40).map(i => s"site$i.example.com")
    val fetcher = StreamsSpec.HeartbeatRobotsFetcher()
    hosts.toDF("host").write.parquet(s"$lake.seedhosts/batch=1")
    assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher) == Seq(1L))
    val annRoot = s"$lake.robotstxt.announcements"
    // the ledger landed hive-partitioned by key bucket (appends key
    // on their own monotonic seq, so take the latest seq dir)
    val annSeq = new java.io.File(annRoot).listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).max
    val kbDirs = new java.io.File(s"$annRoot/batch=$annSeq").listFiles()
      .filter(_.getName.startsWith("kb=")).map(_.getName).toSet
    assert(kbDirs.size > 1, s"expected multiple kb= buckets, got $kbDirs")
    // poisoned-partition proof (the s07/s08 shape): corrupt every
    // bucket EXCEPT one probed host's — a heartbeat probe for that
    // host must still succeed, because untouched bucket directories
    // are never opened
    val probeHost = hosts.head
    val probeKb = spark.range(1)
      .select(Streams.annKb(org.apache.spark.sql.functions.lit(probeHost)))
      .head().getInt(0)
    kbDirs.filter(_ != s"kb=$probeKb").foreach { d =>
      new java.io.File(s"$annRoot/batch=$annSeq/$d").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val out = new java.io.FileOutputStream(f)
          out.write("not parquet at all".getBytes); out.close()
          // kill the crc sidecar so the corruption isn't caught by it
          val crc = new java.io.File(f.getParent, s".${f.getName}.crc")
          if (crc.exists()) crc.delete()
        }
    }
    // the heartbeat: re-seed ONLY the probed host with the staleness
    // skip disabled — drain 1 captured its ETag, so this fetch 304s
    // and the drain re-announces the stored set from the ledger (the
    // read under test)
    Seq(probeHost).toDF("host").write
      .parquet(s"$lake.seedhosts/batch=2")
    assert(Streams.robotsFetchDrainOnce(spark, lake, fetcher,
      refetchAfterBatches = 0) == Seq(2L))
    val audit = spark.read.parquet(s"$lake.robotstxt.audit/batch=2")
      .collect().head
    assert(audit.getAs[Long]("not_modified") == 1L, s"$audit")
    // the 304'd host's stored set re-entered the feed — read through
    // a ledger where every unprobed bucket is GARBAGE: the probe
    // cannot have opened them
    val feed = spark.read.parquet(s"$lake.sitemaps/batch=2")
      .select("loc").collect().map(_.getString(0)).toSet
    assert(feed == Set(s"https://$probeHost/sm_0.xml"), s"$feed")
  }

  test("replan index fold converges over a hand-landed expansion-namespace feed id") {
    // VERDICT r18 next #6: the documented carve-out — a deployment
    // that hand-lands `.refetch` under an IndexChildBase+k id gates
    // its redirects at 2·(2^40+k), above every pending-chain fold
    // watermark. Pin the carve-out's BOUND: the huge dir resists
    // folding only while chains are pending, and a QUIESCENT tick
    // folds it — the index converges to one directory.
    import spark.implicits._
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val dir = java.nio.file.Files.createTempDirectory("graft_replanhl")
    val lake = dir.resolve("lake").toString
    val dest = dir.resolve("dest").toString
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/c/", (ex: HttpExchange) => {
      ex.getRequestURI.getPath match {
        case "/c/a.example.com/hand/1" =>
          ex.getResponseHeaders.add("Location", "/hand/1b")
          ex.sendResponseHeaders(301, -1)
        case _ =>
          val b = "target".getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
      }
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = graft.sources.CondRewriteFetcher(base)
      val traps = Seq.empty[(String, String, Long)]
        .toDF("host", "template", "is_trap")
      val handId = Streams.IndexChildBase + 3L
      def feed(id: Long, urls: Seq[String]): Unit =
        urls.map(u => (u, "", "new", "", ""))
          .toDF("url", "lastmod", "status", "lastmod_raw", "stored_lastmod")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$lake.refetch/batch=$id")
      // the hand-landed expansion-namespace batch: one redirecting URL
      feed(handId, Seq("https://a.example.com/hand/1"))
      assert(Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest)
        == Seq(handId))
      val hugeHop = 2L * handId
      def idxIds() = graft.operators.Dedup
        .listBatchIds(spark, s"$lake.replan.urlindex").filter(_ >= 0)
      assert(idxIds().contains(hugeHop),
        s"hand-landed hop-0 gates at 2*(2^40+3), got ${idxIds()}")
      // drain the hop (its own next hop is capped — depth-one works);
      // then run a few DENSE chains so small index dirs accumulate
      assert(Streams.replanFetchDrainOnce(spark, lake, fetcher, traps,
        dest) == Seq(hugeHop))
      feed(1L, Seq("https://a.example.com/hand/1"))
      Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest)
      Streams.replanFetchDrainOnce(spark, lake, fetcher, traps, dest)
      assert(idxIds().size > 1, s"fixture should hold several dirs: ${idxIds()}")
      // QUIESCENT tick (all feeds drained): the fold window is
      // unbounded, so the whole index — huge id included — converges
      // to ONE directory (compactPastBatches=1 forces the fold now)
      Streams.replanFetchDrainOnce(spark, lake, fetcher, traps, dest,
        compactPastBatches = 1)
      assert(idxIds() == Seq(hugeHop),
        s"quiescent fold must converge to the max dir, got ${idxIds()}")
      // and dedup survives the fold: the same redirect arriving again
      // is dup_lake — nothing re-enters the replan feed
      feed(7L, Seq("https://a.example.com/hand/1"))
      Streams.refetchDrainOnce(spark, lake, fetcher, traps, dest)
      val ga = spark.read
        .parquet(s"$lake.replan.audit/batch=${2L * 7L}")
        .collect().head
      assert((ga.getAs[Long]("arrived"), ga.getAs[Long]("admitted"),
        ga.getAs[Long]("dup_lake")) == ((1L, 0L, 1L)),
        s"post-fold dedup broken: $ga")
    } finally server.stop(0)
  }
}
