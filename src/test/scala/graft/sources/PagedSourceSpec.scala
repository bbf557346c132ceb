package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** f07/f08 against a real (localhost) paged HTTP endpoint: pagination
  * via continuation tokens, injected 429 throttling that must be
  * absorbed by retry, content download, audit rows for permanent
  * failures, and the token-bucket rate cap.
  */
class PagedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** In-memory tree served over HTTP, page size 2, with every 3rd list
    * request and every 4th content request answered 429 Retry-After: 0.
    * `poison` ids always 404 (permanent failure).
    */
  private def withServer(throttleEvery: Int = 3)(
      body: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val tree: Map[String, Seq[(String, String, Boolean)]] = Map(
      // (id, name, isDir); root has 2 dirs + 1 file so both BFS shapes run
      "" -> Seq(("sub1", "sub1", true), ("sub2", "sub2", true),
        ("/c/root.txt", "root.txt", false)),
      "sub1" -> Seq(("/c/a.txt", "a.txt", false), ("/c/b.txt", "b.txt", false),
        ("/c/c.txt", "c.txt", false), ("/c/d.txt", "d.txt", false),
        ("/c/e.txt", "e.txt", false)),
      "sub2" -> Seq(("/c/x.txt", "x.txt", false), ("poison", "gone.txt", false)))
    val content: Map[String, String] = Map(
      "/c/root.txt" -> "root", "/c/a.txt" -> "alpha", "/c/b.txt" -> "bravo",
      "/c/c.txt" -> "charlie", "/c/d.txt" -> "delta", "/c/e.txt" -> "echo",
      "/c/x.txt" -> "xray")
    val listCalls = new AtomicInteger(0)
    val throttled = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    def send(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }

    server.createContext("/list", (ex: HttpExchange) => {
      val n = listCalls.incrementAndGet()
      if (throttleEvery > 0 && n % throttleEvery == 0) {
        throttled.incrementAndGet()
        ex.getResponseHeaders.add("Retry-After", "0")
        send(ex, 429, Array.empty)
      } else {
        val params = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
          }.toMap
        val dir = params.getOrElse("dir", "")
        val off = params.get("token").map(_.toInt).getOrElse(0)
        val all = tree.getOrElse(dir, Seq.empty)
        val page = all.slice(off, off + 2)
        val items = page.map { case (id, name, isDir) =>
          val size = if (isDir) 0 else content.getOrElse(id, "MISSING").length
          // epoch MILLIS per the PageItem contract
          s"""{"id":"$id","name":"$name","isDir":$isDir,"size":$size,"mtime":1700000000000}"""
        }.mkString("[", ",", "]")
        val next = if (off + 2 < all.size) s""","nextToken":"${off + 2}"""" else ""
        send(ex, 200,
          s"""{"items":$items$next}""".getBytes(StandardCharsets.UTF_8))
      }
    })
    server.createContext("/c/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath
      content.get(id) match {
        case Some(c) => send(ex, 200, c.getBytes(StandardCharsets.UTF_8))
        case None => send(ex, 404, Array.empty)
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}",
      listCalls, throttled)
    finally server.stop(0)
  }

  test("f07 paged catalog walks every page through injected 429s") {
    withServer() { (base, _, throttled) =>
      val fetcher = new PagedSource.HttpJsonFetcher(base)
      val m = PagedSource.pagedCatalog(spark, fetcher,
        maxRetries = 8, baseBackoffMs = 1).collect()
      assert(m.length == 8, s"got ${m.map(_.rel_path).toSeq.sorted}")
      val byRel = m.map(e => e.rel_path -> e).toMap
      assert(byRel("sub1/c.txt").size == 7) // "charlie"
      assert(byRel("root.txt").path == "/c/root.txt")
      assert(byRel.keySet.count(_.startsWith("sub1/")) == 5)
      assert(throttled.get() > 0, "server never throttled — test is vacuous")
    }
  }

  test("resolveRoot maps a human-readable path to the walk's rootId") {
    // synthetic endpoint: display names ("dir3") differ from ids ("d3"),
    // so the resolution is a genuine name→id mapping, paged (pageSize 3
    // forces the name-walk across pages)
    val f = PagedSource.SyntheticFetcher(dirs = 8, filesPerDir = 25, pageSize = 3)
    assert(f.resolveRoot("dir5") == "d5")
    assert(f.resolveRoot("") == "")
    val m = PagedSource.pagedCatalogByName(spark, f, "dir5").collect()
    assert(m.length == 25)
    assert(m.forall(e => e.path.startsWith("d5/")))
    intercept[java.io.FileNotFoundException](f.resolveRoot("nope"))
  }

  test("resolveRoot works over live HTTP, absorbing injected 429s") {
    withServer() { (base, _, throttled) =>
      val fetcher = new PagedSource.HttpJsonFetcher(base)
      val m = PagedSource.pagedCatalogByName(spark, fetcher, "sub1",
        maxRetries = 8, baseBackoffMs = 1).collect()
      assert(m.length == 5, s"got ${m.map(_.rel_path).toSeq.sorted}")
      assert(m.map(_.name).toSet ==
        Set("a.txt", "b.txt", "c.txt", "d.txt", "e.txt"))
      assert(throttled.get() > 0, "throttling never fired — test weakened")
    }
  }

  test("f07 retries are bounded: a hard-throttled endpoint fails, not hangs") {
    withServer(throttleEvery = 1) { (base, _, _) =>
      val fetcher = new PagedSource.HttpJsonFetcher(base)
      val ex = intercept[org.apache.spark.SparkException] {
        PagedSource.pagedCatalog(spark, fetcher,
          maxRetries = 2, baseBackoffMs = 1).collect()
      }
      assert(ex.getMessage.contains("throttled") ||
        String.valueOf(ex.getCause).contains("throttled"))
    }
  }

  test("f08 paged copy downloads content, audits the permanent 404, skips on re-run") {
    withServer() { (base, _, _) =>
      val fetcher = new PagedSource.HttpJsonFetcher(base)
      val dest = Files.createTempDirectory("graft_paged_dst")
      val manifest = PagedSource.pagedCatalog(spark, fetcher,
        maxRetries = 8, baseBackoffMs = 1)
      val audit = PagedSource.distCopyPaged(spark, fetcher, manifest,
        dest.toString, partitions = 2, maxRetries = 3, baseBackoffMs = 1)
        .collect()
      assert(audit.count(_.status == "copied") == 7, s"got ${audit.toSeq}")
      val failed = audit.filter(_.status == "failed")
      assert(failed.map(_.rel_path).toSeq == Seq("sub2/gone.txt"))
      assert(Files.readString(dest.resolve("sub1/c.txt")) == "charlie")
      assert(Files.readString(dest.resolve("root.txt")) == "root")
      // idempotent re-run: same-size destinations are skipped
      val audit2 = PagedSource.distCopyPaged(spark, fetcher, manifest,
        dest.toString, partitions = 2, maxRetries = 3, baseBackoffMs = 1)
        .collect()
      assert(audit2.count(_.status == "skipped") == 7, s"got ${audit2.toSeq}")
    }
  }

  test("synthetic fetcher manifest is complete and copies bit-exact content") {
    val fetcher = PagedSource.SyntheticFetcher(dirs = 6, filesPerDir = 11,
      pageSize = 4)
    val m = PagedSource.pagedCatalog(spark, fetcher).collect()
    assert(m.length == 66)
    assert(m.map(_.rel_path).distinct.length == 66)
    val dest = Files.createTempDirectory("graft_synth_dst")
    val audit = PagedSource.distCopyPaged(spark, fetcher,
      PagedSource.pagedCatalog(spark, fetcher), dest.toString, partitions = 4)
      .collect()
    assert(audit.count(_.status == "copied") == 66)
    val sample = Files.readAllBytes(dest.resolve("dir2/file3.txt"))
    val expected = fetcher.open("d2/f3").readAllBytes()
    assert(sample.sameElements(expected))
    assert(sample.length == m.find(_.rel_path == "dir2/file3.txt").get.size)
  }

  test("f09 paged sync copies all, then nothing, then only the damaged file") {
    withServer() { (base, _, _) =>
      val fetcher = new PagedSource.HttpJsonFetcher(base)
      val dest = Files.createTempDirectory("graft_psync")
      def sync() = PagedSource.syncCopyPaged(spark, fetcher, dest.toString,
        partitions = 2, maxRetries = 8, baseBackoffMs = 1).collect()
      // first sync: the full remote (7 good files; the poisoned one
      // 404s at content download and stays a failure row)
      val a1 = sync()
      assert(a1.count(_.status == "copied") == 7, s"got ${a1.toSeq}")
      // unchanged remote: no copies at all (the failed file's entry
      // still differs — dest has no copy of it — so it retries+fails)
      val a2 = sync()
      assert(a2.count(_.status == "copied") == 0, s"got ${a2.toSeq}")
      // damage one destination file (size change): only it re-syncs
      Files.writeString(dest.resolve("sub1/c.txt"), "x")
      val a3 = sync()
      assert(a3.count(_.status == "copied") == 1, s"got ${a3.toSeq}")
      assert(Files.readString(dest.resolve("sub1/c.txt")) == "charlie")
      // SAME-SIZE divergence must also re-sync via the mtime contract:
      // rewrite a dest file with equal length but backdate it before
      // the remote's (millis) mtime — size-only diffing would call
      // this a noop forever
      Files.writeString(dest.resolve("sub2/x.txt"), "XRAY") // len 4 == "xray"
      Files.setLastModifiedTime(dest.resolve("sub2/x.txt"),
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L - 60000))
      val a4 = sync()
      assert(a4.count(_.status == "copied") == 1, s"got ${a4.toSeq}")
      assert(Files.readString(dest.resolve("sub2/x.txt")) == "xray")
    }
  }

  test("rate limiter makes progress at fractional (sub-1/s) rates") {
    // regression: with the cap clamped to permitsPerSec, a rate < 1
    // could never accumulate a whole token and acquire() hung forever
    val t0 = System.nanoTime()
    PagedSource.RateLimiter.acquire("spec-frac", 0.8)
    PagedSource.RateLimiter.acquire("spec-frac", 0.8) // ~1.25s refill
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 1000, s"second acquire at 0.8/s took ${elapsedMs}ms")
  }

  test("rate limiter enforces a lower bound on elapsed time") {
    val t0 = System.nanoTime()
    // 1 burst token + 50/s refill → 11 acquires need ≥ ~200ms
    (1 to 11).foreach(_ => PagedSource.RateLimiter.acquire("spec-bucket", 50.0))
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 150, s"11 acquires at 50/s took only ${elapsedMs}ms")
  }
}
