package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end file-pipeline specs on a generated local tree (the
  * Hadoop FS API makes local and object-store paths the same code).
  */
class FilePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Build a small tree: root/{a.txt, sub1/b.bin, sub1/deep/c.txt, sub2/d.csv} */
  private def mkTree(): JPath = {
    val root = Files.createTempDirectory("graft_src")
    Files.writeString(root.resolve("a.txt"), "alpha")
    Files.createDirectories(root.resolve("sub1/deep"))
    Files.write(root.resolve("sub1/b.bin"), Array.fill[Byte](2048)(7))
    Files.writeString(root.resolve("sub1/deep/c.txt"), "gamma content")
    Files.createDirectories(root.resolve("sub2"))
    Files.writeString(root.resolve("sub2/d.csv"), "x,y\n1,2\n")
    root
  }

  test("f01 catalog enumerates the full tree with rel_path/ext/size") {
    val root = mkTree()
    val m = FilePipeline.catalog(spark, root.toString).collect()
    assert(m.length == 4)
    val byRel = m.map(e => e.rel_path -> e).toMap
    assert(byRel.keySet == Set("a.txt", "sub1/b.bin", "sub1/deep/c.txt", "sub2/d.csv"))
    assert(byRel("sub1/b.bin").size == 2048)
    assert(byRel("sub1/b.bin").ext == "bin")
    assert(byRel("sub2/d.csv").name == "d.csv")
  }

  test("f01 catalog handles a RELATIVE root without mangling rel_path") {
    // the root must qualify before prefix-stripping: listStatus
    // returns fully-qualified paths, so an unqualified relative root
    // would never match as a prefix and rel_path would silently
    // become the absolute path (mis-keying every sync row)
    val relDir = s"target/graft_relroot_${System.nanoTime()}"
    val d = new java.io.File(relDir)
    assert(d.mkdirs())
    val f = new java.io.File(d, "a.txt")
    java.nio.file.Files.write(f.toPath, "hi".getBytes)
    try {
      val rels = FilePipeline.catalog(spark, relDir).collect()
        .map(_.rel_path).toSeq
      assert(rels == Seq("a.txt"), s"rel_path mangled: $rels")
    } finally { f.delete(); d.delete() }
  }

  test("f01 catalog distributes listing when the frontier is wide") {
    val root = Files.createTempDirectory("graft_wide")
    (1 to 40).foreach { i =>
      Files.createDirectories(root.resolve(s"d$i"))
      Files.writeString(root.resolve(s"d$i/f$i.txt"), s"file $i")
    }
    // threshold 8 << 40 dirs → second BFS level goes through the cluster
    val m = FilePipeline.catalog(spark, root.toString, distributeThreshold = 8)
    assert(m.count() == 40)
  }

  test("f01 manifest stays distributed over a deep+wide tree (no driver materialization)") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    // wide at the top, deep chain below — exercises both BFS shapes
    val root = Files.createTempDirectory("graft_deepwide")
    (1 to 12).foreach { i =>
      Files.createDirectories(root.resolve(s"w$i"))
      Files.writeString(root.resolve(s"w$i/f.txt"), s"w$i")
    }
    var deep = root.resolve("deep")
    (1 to 15).foreach { lvl =>
      deep = deep.resolve(s"l$lvl")
      Files.createDirectories(deep)
      Files.writeString(deep.resolve(s"leaf$lvl.txt"), s"level $lvl")
    }
    val m = FilePipeline.catalog(spark, root.toString, distributeThreshold = 8)
    // a driver-accumulated manifest would be a LocalRelation; the
    // distributed build scans an executor-side RDD
    val local = m.queryExecution.optimizedPlan.collect { case l: LocalRelation => l }
    assert(local.isEmpty, "manifest materialized on the driver as a LocalRelation")
    assert(m.count() == 12 + 15)
    assert(m.filter(_.rel_path.startsWith("deep/")).count() == 15)
  }

  test("f02 copy mirrors structure, is idempotent, and audits failures") {
    val root = mkTree()
    val dest = Files.createTempDirectory("graft_dst")
    val m = FilePipeline.catalog(spark, root.toString)
    val audit1 = FilePipeline.distCopy(spark, m, dest.toString, partitions = 4).collect()
    assert(audit1.count(_.status == "copied") == 4)
    assert(Files.readString(dest.resolve("sub1/deep/c.txt")) == "gamma content")
    assert(Files.size(dest.resolve("sub1/b.bin")) == 2048)
    // idempotent re-run: all skipped
    val audit2 = FilePipeline.distCopy(spark, m, dest.toString, partitions = 4).collect()
    assert(audit2.count(_.status == "skipped") == 4)
    // vanished source → failed audit row, not a job abort
    import spark.implicits._
    val ghost = spark.createDataset(Seq(FilePipeline.FileEntry(
      root.resolve("missing.txt").toString, "missing.txt", "missing.txt",
      "txt", 10L, 0L)))
    val audit3 = FilePipeline.distCopy(spark, ghost, dest.toString, partitions = 1).collect()
    assert(audit3.length == 1 && audit3.head.status == "failed")
  }

  test("f02 copy rejects dot-segment rel_paths as unsafe_path (defense in depth)") {
    // Hadoop Path does not resolve `..`; the FS layer does at create
    // time — a hostile manifest's rel_path must never escape destRoot
    val root = mkTree()
    val scratch = Files.createTempDirectory("graft_dst_guard")
    val dest = scratch.resolve("dest")
    import spark.implicits._
    val hostile = spark.createDataset(Seq(
      FilePipeline.FileEntry(root.resolve("a.txt").toString, "a.txt",
        "up/../../../escape.txt", "txt", 5L, 0L),
      // interior dots are benign filename characters, not navigation
      FilePipeline.FileEntry(root.resolve("a.txt").toString, "a.txt",
        "v1..2/ok.txt", "txt", 5L, 0L)))
    val audit = FilePipeline.distCopy(spark, hostile, dest.toString,
      partitions = 1).collect()
    val byStatus = audit.groupBy(_.status).view.mapValues(_.length).toMap
    assert(byStatus == Map("skipped" -> 1, "copied" -> 1), s"$byStatus")
    assert(audit.find(_.status == "skipped").get.error == "unsafe_path")
    assert(!Files.exists(scratch.resolve("escape.txt")),
      "dot segments escaped destRoot")
    assert(Files.exists(dest.resolve("v1..2/ok.txt")))
    // the guard itself is segment-exact
    assert(FilePipeline.unsafeRelPath("a/../b") &&
      FilePipeline.unsafeRelPath("./a") && FilePipeline.unsafeRelPath("..") &&
      !FilePipeline.unsafeRelPath("a..b/c.d") &&
      !FilePipeline.unsafeRelPath("normal/path.txt"))
  }

  test("f03 sync planner classifies new/changed/deleted/noop") {
    val root = mkTree()
    val dest = Files.createTempDirectory("graft_sync")
    val m1 = FilePipeline.catalog(spark, root.toString)
    FilePipeline.distCopy(spark, m1, dest.toString, partitions = 2).count()
    // mutate: new file, changed file, deleted file
    Files.writeString(root.resolve("new.txt"), "brand new")
    Files.writeString(root.resolve("a.txt"), "alpha changed content")
    Files.delete(root.resolve("sub2/d.csv"))
    val src2 = FilePipeline.catalog(spark, root.toString)
    val tgt = FilePipeline.catalog(spark, dest.toString)
    val plan = FilePipeline.syncPlan(src2, tgt).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plan("new.txt") == "copy_new")
    assert(plan("a.txt") == "copy_changed")
    assert(plan("sub2/d.csv") == "delete")
    assert(plan("sub1/b.bin") == "noop")
  }

  test("f05 audit summary rolls up by top-level dir") {
    val root = mkTree()
    val dest = Files.createTempDirectory("graft_audit")
    val m = FilePipeline.catalog(spark, root.toString)
    val audit = FilePipeline.distCopy(spark, m, dest.toString, partitions = 2)
    val sums = FilePipeline.auditSummary(audit).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(sums("sub1")._1 == 2)           // b.bin + deep/c.txt
    assert(sums("")._1 == 1)               // a.txt at root
    assert(sums("sub1")._2 == 2048 + 13)   // bytes copied
  }

  test("f03+f02 syncCopy moves only new/changed files and can prune deletes") {
    val root = mkTree()
    // bootstrap: destination doesn't exist yet → full copy, no crash
    val dest = Files.createTempDirectory("graft_synccopy").resolve("fresh")
    val boot = FilePipeline.syncCopy(spark, root.toString, dest.toString,
      partitions = 2).collect()
    assert(boot.length == 4 && boot.forall(_.status == "copied"))
    // mutate source
    Files.writeString(root.resolve("new.txt"), "brand new")
    Files.writeString(root.resolve("a.txt"), "alpha changed content")
    Files.delete(root.resolve("sub2/d.csv"))
    val audit = FilePipeline.syncCopy(spark, root.toString, dest.toString,
      pruneDeleted = true, partitions = 2).collect()
    val byStatus = audit.groupBy(_.status).view.mapValues(_.length).toMap
    assert(byStatus.getOrElse("copied", 0) == 2, s"got $byStatus")
    assert(byStatus.getOrElse("deleted", 0) == 1)
    assert(Files.readString(dest.resolve("a.txt")) == "alpha changed content")
    assert(Files.readString(dest.resolve("new.txt")) == "brand new")
    assert(!Files.exists(dest.resolve("sub2/d.csv")))
    // second sync: nothing to do
    val audit2 = FilePipeline.syncCopy(spark, root.toString, dest.toString,
      pruneDeleted = true, partitions = 2).collect()
    assert(audit2.isEmpty, s"expected empty second-sync audit, got ${audit2.toSeq}")
  }

  test("f03 detects a same-size content change via mtime and re-copies it") {
    val root = mkTree()
    val dest = Files.createTempDirectory("graft_msync")
    FilePipeline.syncCopy(spark, root.toString, dest.toString, partitions = 2).count()
    // same-size rewrite: "alpha" -> "bravo" (both 5 bytes) — size-only
    // diffing calls this a noop and silently never re-copies
    Files.writeString(root.resolve("a.txt"), "bravo")
    // deterministic ordering regardless of FS timestamp granularity:
    // the target copy looks 60s older than the source change
    Files.setLastModifiedTime(dest.resolve("a.txt"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000))
    val plan = FilePipeline.syncPlan(
      FilePipeline.catalog(spark, root.toString),
      FilePipeline.catalog(spark, dest.toString))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plan("a.txt") == "copy_changed", s"got $plan")
    assert(plan("sub1/b.bin") == "noop")
    val audit = FilePipeline.syncCopy(spark, root.toString, dest.toString,
      partitions = 2).collect()
    assert(audit.count(_.status == "copied") == 1, s"got ${audit.toSeq}")
    assert(Files.readString(dest.resolve("a.txt")) == "bravo")
    // converged: the next sync is a no-op
    val audit2 = FilePipeline.syncCopy(spark, root.toString, dest.toString,
      partitions = 2).collect()
    assert(audit2.isEmpty, s"expected converged sync, got ${audit2.toSeq}")
  }

  test("f02 copy audits carry the content CRC32C at zero extra reads") {
    val root = mkTree()
    val dest = Files.createTempDirectory("graft_crc")
    val audit = FilePipeline.distCopy(spark,
      FilePipeline.catalog(spark, root.toString), dest.toString,
      partitions = 2).collect()
    assert(audit.length == 4 && audit.forall(_.status == "copied"))
    audit.foreach { a =>
      val crc = new java.util.zip.CRC32C()
      val bytes = Files.readAllBytes(Paths.get(new java.net.URI(a.dest).getPath))
      crc.update(bytes, 0, bytes.length)
      assert(a.checksum == crc.getValue, s"${a.rel_path}")
      assert(a.bytes == bytes.length)
    }
    // skipped rows don't fake a checksum
    val again = FilePipeline.distCopy(spark,
      FilePipeline.catalog(spark, root.toString), dest.toString,
      partitions = 2).collect()
    assert(again.forall(a => a.status == "skipped" && a.checksum == 0L))
  }

  test("f03 checksum sync heals same-size+same-mtime corruption; plain sync can't") {
    val root = mkTree()
    val dest = Files.createTempDirectory("graft_csync")
    FilePipeline.syncCopy(spark, root.toString, dest.toString, partitions = 2).count()
    // corrupt the destination copy: same byte count, same mtime as the
    // source — the metadata blind spot (bit rot, tampering, torn write)
    val victim = dest.resolve("sub1/deep/c.txt")
    Files.writeString(victim, "gamma corrupt")
    assert(Files.size(victim) == Files.size(root.resolve("sub1/deep/c.txt")))
    Files.setLastModifiedTime(victim,
      Files.getLastModifiedTime(root.resolve("sub1/deep/c.txt")))
    // plain metadata sync sees nothing to do
    val plain = FilePipeline.syncCopy(spark, root.toString, dest.toString,
      partitions = 2).collect()
    assert(plain.isEmpty, s"metadata sync should be blind here, got ${plain.toSeq}")
    assert(Files.readString(victim) == "gamma corrupt")
    // checksum sync finds and heals exactly the corrupted file
    val healed = FilePipeline.syncCopy(spark, root.toString, dest.toString,
      partitions = 2, verifyChecksums = true).collect()
    assert(healed.length == 1 && healed.head.status == "copied",
      s"got ${healed.toSeq}")
    assert(healed.head.rel_path == "sub1/deep/c.txt")
    assert(Files.readString(victim) == "gamma content")
    // converged: a second checksum sweep finds nothing
    val again = FilePipeline.syncCopy(spark, root.toString, dest.toString,
      partitions = 2, verifyChecksums = true).collect()
    assert(again.isEmpty, s"expected converged checksum sync, got ${again.toSeq}")
    // a destination that VANISHES between plan and sweep must not
    // abort the job (one bad file vs the other 10M — the distCopy
    // discipline): the unreadable pair upgrades to copy_changed and
    // the copy re-lands it
    Files.delete(victim)
    val plan = FilePipeline.syncPlan(
      FilePipeline.catalog(spark, root.toString),
      FilePipeline.catalog(spark, dest.toString))
    // fake the blind-spot shape for the vanished file: hand the sweep
    // a noop row whose dst_path no longer exists
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    val ghost = col("rel_path") === "sub1/deep/c.txt"
    val withGhost = plan
      .withColumn("action", when(ghost, "noop").otherwise(col("action")))
      .withColumn("dst_path",
        when(ghost, lit(victim.toString)).otherwise(col("dst_path")))
      .withColumn("dst_size",
        when(ghost, col("src_size")).otherwise(col("dst_size")))
      .withColumn("dst_mtime",
        when(ghost, col("src_mtime")).otherwise(col("dst_mtime")))
    val sweep = FilePipeline.syncPlanChecksum(withGhost)
      .filter(col("rel_path") === "sub1/deep/c.txt").collect()
    assert(sweep.length == 1 &&
      sweep.head.getAs[String]("action") == "copy_changed",
      s"vanished pair must upgrade, got ${sweep.toSeq}")
  }

  test("f04 grant ledger merge is idempotent") {
    import spark.implicits._
    val ledger0 = GrantLedger.emptyLedger(spark)
    val requested = Seq(
      ("appB", "site1", "write"), ("appA", "site1", "write"))
      .toDF("principal", "resource", "role")
    val plan1 = GrantLedger.plan(ledger0, requested)
    assert(plan1.filter("action = 'create'").count() == 2)
    val ledger1 = GrantLedger.apply(ledger0, plan1, "2026-08-12")
    assert(ledger1.count() == 2)
    // replay: everything 'already', ledger unchanged
    val plan2 = GrantLedger.plan(ledger1, requested)
    assert(plan2.filter("action = 'create'").count() == 0)
    assert(plan2.filter("action = 'already'").count() == 2)
    val ledger2 = GrantLedger.apply(ledger1, plan2, "2026-08-13")
    assert(ledger2.count() == 2)
    // a replayed apply keeps the ORIGINAL audit timestamp: re-running
    // the SAME create plan (at-least-once orchestrator) with a later
    // grantedAt must not rewrite granted_at — a bare union+dedup kept
    // an arbitrary row per key and flipped it nondeterministically
    val ledger2b = GrantLedger.apply(ledger1, plan1, "2026-09-30")
    val dates = ledger2b.select("granted_at").collect()
      .map(_.getString(0)).toSet
    assert(dates == Set("2026-08-12"),
      s"replayed apply rewrote granted_at: $dates")
  }

  test("f04 name resolution: SP → application fallback, cached, over live HTTP") {
    import spark.implicits._
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.nio.charset.StandardCharsets
    GrantLedger.clearNameCache()
    val spCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    val appCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    // the two directories of the reference (py:83-99): service
    // principals answer for enrolled apps, the application registry
    // for registered-but-not-enrolled ones
    val spDir = Map("appB" -> "Lakehouse Writer")
    val appDir = Map("appB" -> "Lakehouse Writer (registration)",
      "appA" -> "Notebook Caller")
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def send(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    def appOf(ex: HttpExchange): String =
      Option(ex.getRequestURI.getQuery).getOrElse("")
        .stripPrefix("app=")
    server.createContext("/sp", (ex: HttpExchange) => {
      spCalls.incrementAndGet()
      spDir.get(appOf(ex)) match {
        case Some(n) => send(ex, 200, n)
        case None => send(ex, 404, "")
      }
    })
    server.createContext("/app", (ex: HttpExchange) => {
      appCalls.incrementAndGet()
      appDir.get(appOf(ex)) match {
        case Some(n) => send(ex, 200, n)
        case None => send(ex, 404, "")
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      final class HttpNameResolver(b: String) extends GrantLedger.NameResolver {
        private def get(url: String): Option[String] = {
          val c = new java.net.URI(url).toURL.openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          try {
            if (c.getResponseCode != 200) None
            else Some(new String(c.getInputStream.readAllBytes(),
              StandardCharsets.UTF_8)).filter(_.nonEmpty)
          } finally c.disconnect()
        }
        def servicePrincipalName(p: String): Option[String] =
          get(s"$b/sp?app=$p")
        def applicationName(p: String): Option[String] =
          get(s"$b/app?app=$p")
      }
      val r = new HttpNameResolver(base)
      // SP hit wins; SP miss falls through to the registration;
      // neither directory knowing the app yields the caller's default
      assert(GrantLedger.resolveName(r, "appB", "hint") == "Lakehouse Writer")
      assert(GrantLedger.resolveName(r, "appA", "hint") == "Notebook Caller")
      assert(GrantLedger.resolveName(r, "ghost", "Fallback-Hint")
        == "Fallback-Hint")
      // cached: resolving the same principals again makes NO calls
      val (sp0, app0) = (spCalls.get(), appCalls.get())
      assert(GrantLedger.resolveName(r, "appB", "x") == "Lakehouse Writer")
      assert(GrantLedger.resolveName(r, "ghost", "y") == "Fallback-Hint")
      assert(spCalls.get() == sp0 && appCalls.get() == app0,
        "cache miss: name lookups repeated")
      // ledger rows carry the resolved names (one lookup per DISTINCT
      // principal, broadcast back), and a DEAD directory — the whole
      // service unreachable — still names rows via the default
      val plan = GrantLedger.plan(GrantLedger.emptyLedger(spark),
        Seq(("appB", "site1", "write"), ("appA", "site1", "write"),
          ("appB", "site2", "read"))
          .toDF("principal", "resource", "role"))
      val named = GrantLedger.withNames(plan, r)
        .select("principal", "display_name").distinct().collect()
        .map(row => row.getString(0) -> row.getString(1)).toMap
      assert(named == Map("appB" -> "Lakehouse Writer",
        "appA" -> "Notebook Caller"))
      server.stop(0)
      GrantLedger.clearNameCache()
      val offline = GrantLedger.withNames(
        Seq(("appZ", "site1", "write")).toDF("principal", "resource", "role"),
        r, p => s"unresolved:$p").collect()
      assert(offline.head.getAs[String]("display_name") == "unresolved:appZ",
        "a throwing resolver must fall back to the default, not fail the run")
    } finally { server.stop(0); GrantLedger.clearNameCache() }
  }
}
