package graft.sources

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WarcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val recs = Seq(
    ("warcinfo", "urn:graft:info:1", "", WarcSource.WarcInfoContent),
    ("conversion", "urn:graft:doc:1", "https://example.org/doc/1",
      "hello warc éé".getBytes(UTF_8)), // multi-byte content
    ("conversion", "urn:graft:doc:2", "https://example.org/doc/2",
      "body with\r\n\r\nembedded separator".getBytes(US_ASCII)),
    ("conversion", "urn:graft:doc:3", "https://example.org/doc/3",
      Array.empty[Byte])) // zero-length content

  test("f16 export: shard layout, manifest math, byte-exact round-trip") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_f16_spec").toString
    // multi-byte UTF-8, an EMPTY doc, and an un-aligned tail shard
    val docs = Seq(
      (1L, "hello warc éé"), (2L, ""), (3L, "plain text body"),
      (4L, "four"), (5L, "five"), (6L, "six"), (7L, "seven"))
      .toDF("doc_id", "text")
    val manifest = WarcSource.f16WarcExport(docs, root, docsPerShard = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // rank div 3 over 7 docs: shards of 3, 3, 1 (+1 warcinfo each)
    assert(manifest.map(m => (m._1, m._2, m._3)).toSeq ==
      Seq((0L, 3L, 4L), (1L, 3L, 4L), (2L, 1L, 2L)))
    // plain_bytes replays serially from the same canonical builder
    val byShard = Seq(1L to 3L, 4L to 6L, 7L to 7L)
    val texts = Map(1L -> "hello warc éé", 2L -> "", 3L -> "plain text body",
      4L -> "four", 5L -> "five", 6L -> "six", 7L -> "seven")
    manifest.zip(byShard).foreach { case ((sid, _, _, plain, gz), ids) =>
      val recs = ("warcinfo", s"urn:graft:shard:$sid", "",
        WarcSource.WarcInfoContent) +: ids.map(id =>
        ("conversion", s"urn:graft:doc:$id", s"https://example.org/doc/$id",
          texts(id).getBytes(UTF_8))).toSeq
      assert(plain ==
        recs.map(r => WarcSource.buildWarc(Seq(r)).length.toLong).sum)
      // the landed file IS the per-record gzip-member layout, exactly
      val f = java.nio.file.Paths.get(root, f"shard-$sid%05d.warc.gz")
      val bytes = java.nio.file.Files.readAllBytes(f)
      assert(bytes.length.toLong == gz)
      assert(java.util.Arrays.equals(WarcSource.maybeGunzip(bytes),
        recs.flatMap(r => WarcSource.buildWarc(Seq(r))).toArray))
    }
    // full round-trip through the production intake: every document
    // byte-exact, including the multi-byte and empty ones
    val back = WarcSource.warcFromDir(spark, root)
      .filter(col("warc_type") === "conversion")
      .select(col("record_id"), col("target_uri"), col("text"))
      .collect()
      .map(r => (r.getString(0).stripPrefix("urn:graft:doc:").toLong,
        r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(back.toSeq == (1L to 7L).map(id =>
      (id, s"https://example.org/doc/$id", texts(id))))
    // a SMALLER re-export to the same root sweeps the stale tail
    // shards and any orphaned attempt-temp (ADVICE r15 #2: without
    // the sweep, shard-00001/2 linger and warcFromDir resurrects
    // docs 4-7); the fresh shard re-lands via temp + atomic rename
    val orphan = java.nio.file.Paths.get(root,
      ".shard-00000.warc.gz.999.tmp")
    java.nio.file.Files.write(orphan, Array[Byte](1, 2, 3))
    val manifest2 = WarcSource.f16WarcExport(
      docs.filter(col("doc_id") <= 2L), root, docsPerShard = 3L)
      .collect()
    assert(manifest2.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 2L)))
    val left = new java.io.File(root).listFiles().map(_.getName).sorted
    assert(left.toSeq == Seq("shard-00000.warc.gz"),
      s"stale shards/temps survived the re-export: ${left.toSeq}")
    val back2 = WarcSource.warcFromDir(spark, root)
      .filter(col("warc_type") === "conversion").count()
    assert(back2 == 2L, s"resurrected docs: $back2")
  }

  test("f13 round-trip: records walk back out with exact ids, lengths, bytes") {
    val warc = WarcSource.buildWarc(recs)
    val walked = WarcSource.warcRecords(warc)
    assert(walked.map(_._1) == recs.map(_._1))
    assert(walked.map(_._2) == recs.map(_._2))
    assert(walked.map(_._3) == recs.map(_._3))
    assert(walked.map(_._4) == recs.map(_._4.length.toLong))
    // content framed by length, NOT by scanning — the embedded
    // \r\n\r\n body and the multi-byte UTF-8 body both recover exact
    walked.zip(recs).foreach { case ((_, _, _, len, off), (_, _, _, data)) =>
      assert(java.util.Arrays.equals(
        warc.slice(off, off + len.toInt), data))
    }
  }

  test("f13 gzip: whole-file and per-record-member layouts both inflate") {
    val plain = WarcSource.buildWarc(recs)
    val whole = WarcSource.maybeGunzip(WarcSource.gzip(plain))
    assert(java.util.Arrays.equals(whole, plain))
    // per-record members concatenate to the same decompressed stream
    val chain = WarcSource.gzipPerRecord(recs)
    val members = WarcSource.maybeGunzip(chain)
    assert(java.util.Arrays.equals(members, plain))
    // plain bytes pass through untouched
    assert(WarcSource.maybeGunzip(plain) eq plain)
    // strictness: a corrupt MID-CHAIN member must fail loudly, never
    // inflate to a clean-looking prefix (GZIPInputStream's silent-
    // trailer behavior is exactly what gunzipMembers exists to refuse)
    val m1len = WarcSource.gzip(WarcSource.buildWarc(Seq(recs.head))).length
    val badMagic = chain.clone(); badMagic(m1len) = 'X'.toByte
    assertThrows[IllegalArgumentException] { WarcSource.maybeGunzip(badMagic) }
    // flipped byte inside a member's deflate stream → CRC/format error
    val badBody = chain.clone()
    badBody(m1len + 20) = (badBody(m1len + 20) ^ 0x55).toByte
    assertThrows[IllegalArgumentException] { WarcSource.maybeGunzip(badBody) }
    // truncated trailer and trailing garbage both refuse
    assertThrows[IllegalArgumentException] {
      WarcSource.maybeGunzip(chain.dropRight(3))
    }
    assertThrows[IllegalArgumentException] {
      WarcSource.maybeGunzip(chain ++ Array[Byte](1, 2, 3))
    }
  }

  test("f13 walker fails loudly on corruption") {
    val warc = WarcSource.buildWarc(recs)
    // bad version line
    val badv = warc.clone(); badv(5) = '9'
    assertThrows[IllegalArgumentException] { WarcSource.warcRecords(badv) }
    // truncated content
    assertThrows[IllegalArgumentException] {
      WarcSource.warcRecords(warc.take(warc.length - 10))
    }
    // separator overwritten after the first record's content
    val first = WarcSource.warcRecords(warc).head
    val sep = first._5 + first._4.toInt
    val bads = warc.clone(); bads(sep) = 'X'
    assertThrows[IllegalArgumentException] { WarcSource.warcRecords(bads) }
    // missing Content-Length: hand-build a header without it
    val noLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Record-ID: <urn:x>\r\n\r\nabc\r\n\r\n").getBytes(US_ASCII)
    assertThrows[IllegalArgumentException] { WarcSource.warcRecords(noLen) }
    // obs-fold continuation line
    val fold = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      " folded: value\r\nWARC-Record-ID: <urn:x>\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(US_ASCII)
    assertThrows[IllegalArgumentException] { WarcSource.warcRecords(fold) }
    // the builder refuses non-ASCII header values
    assertThrows[IllegalArgumentException] {
      WarcSource.buildWarc(Seq(("conversion", "urn:docé", "",
        Array.empty[Byte])))
    }
  }

  test("f13 walker accepts foreign header order, case and WARC/1.1") {
    // a record NOT produced by our builder: different version, header
    // case, order, an ignored extra header, and an unbracketed id
    val foreign = ("WARC/1.1\r\ncontent-length: 4\r\n" +
      "X-Ignored: junk\r\nWARC-TARGET-URI: http://x/y\r\n" +
      "warc-record-id: urn:plain:7\r\nWarc-Type: response\r\n" +
      "\r\nbody\r\n\r\n").getBytes(US_ASCII)
    val Seq((t, id, uri, len, _)) = WarcSource.warcRecords(foreign)
    assert(t == "response" && id == "urn:plain:7" &&
      uri == "http://x/y" && len == 4L)
  }

  test("f13 production intake: real files on disk, all three layouts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    try {
      def recsOf(id: Long, text: String) = WarcSource.demoRecords(id, text)
      java.nio.file.Files.write(dir.resolve("a.warc"),
        WarcSource.buildWarc(recsOf(1L, "plain file one")))
      java.nio.file.Files.write(dir.resolve("b.warc.gz"),
        WarcSource.gzip(WarcSource.buildWarc(recsOf(2L, "whole-gzip two"))))
      java.nio.file.Files.write(dir.resolve("c.warc.gz"),
        WarcSource.gzipPerRecord(recsOf(3L, "member-gzip three")))
      // a non-WARC file in the same drop must be glob-filtered out
      java.nio.file.Files.write(dir.resolve("notes.txt"),
        "not a warc".getBytes("UTF-8"))
      val rows = WarcSource.warcFromDir(spark, dir.toString).collect()
      assert(rows.length == 6) // 3 archives x (warcinfo + conversion)
      val convs = rows.filter(_.getAs[String]("warc_type") == "conversion")
        .map(r => r.getAs[String]("record_id") -> r.getAs[String]("text"))
        .toMap
      assert(convs == Map(
        "urn:graft:doc:1" -> "plain file one",
        "urn:graft:doc:2" -> "whole-gzip two",
        "urn:graft:doc:3" -> "member-gzip three"))
      // warcinfo plumbing rows carry no text
      assert(rows.filter(_.getAs[String]("warc_type") == "warcinfo")
        .forall(_.getAs[String]("text") == null))
      // archive ids are stable path hashes, distinct per file
      assert(rows.map(_.getAs[Long]("archive_id")).distinct.length == 3)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("f13 demo: inventory matches the closed-form record plan") {
    val rows = WarcSource.f13WarcIntake(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables(spark, TestSpark.Sf0001).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, idx) = (r.getLong(0), r.getLong(1))
      val expect = WarcSource.demoRecords(id, texts(id))
      val warc = WarcSource.buildWarc(expect)
      assert(r.getString(2) == expect(idx.toInt)._1) // warc_type
      assert(r.getString(3) == expect(idx.toInt)._2) // record_id
      assert(r.getString(4) == expect(idx.toInt)._3) // target_uri
      assert(r.getLong(5) == expect(idx.toInt)._4.length.toLong)
      assert(r.getLong(7) == warc.length.toLong)
    }
  }
}
