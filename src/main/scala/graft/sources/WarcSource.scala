package graft.sources

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** f13: WARC container intake — web-crawl corpora (the dominant LLM
  * pretraining source) ship as WARC archives (ISO 28500; Common
  * Crawl's WARC/WET drops). A distributed intake must enumerate
  * records without shelling out or landing temp files: this is a
  * real WARC walker (version line, CRLF-terminated named headers,
  * Content-Length-framed content block, CRLF CRLF separator) plus a
  * canonical deterministic BUILDER, the f12 tar discipline — corrupt
  * framing fails loudly, never a silently wrong record.
  *
  * The walker never SCANS for separators: content is framed by
  * Content-Length, so a body containing `\r\n\r\n` can neither split
  * a record nor leak headers — the separator is REQUIRED at exactly
  * the framed position. Header names fold case per the spec;
  * deprecated obs-fold continuation lines are refused loudly (they
  * would silently merge into the previous value).
  *
  * Gzip: Common Crawl archives arrive gzipped. `maybeGunzip`
  * transparently inflates (including the per-record concatenated-
  * member layout — `GZIPInputStream` consumes member chains), and
  * the walker's offsets then refer to the DECOMPRESSED stream.
  * Whole-file gzip is non-splittable — at 100 TB the per-record
  * member layout is the right drop shape (members re-align record
  * boundaries), and either way the walker emits only slim rows, so
  * a repartition after intake restores parallelism.
  *
  * Scale: one walker pass per archive inside mapPartitions; record
  * bytes stay executor-side, only (type, id, uri, length, offset)
  * rows shuffle — the m-family's pixels-never-shuffle posture.
  */
object WarcSource {

  private val Crlf = "\r\n".getBytes(US_ASCII)

  /** One parsed record: (warcType, recordId, targetUri, contentLength,
    * contentOffset). recordId is stripped of its `<...>` delimiters;
    * targetUri is "" when the header is absent (warcinfo records).
    */
  def warcRecords(bytes: Array[Byte]): Seq[(String, String, String, Long, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, Long, Int)]
    var p = 0
    while (p < bytes.length) {
      val ve = crlfAt(bytes, p)
      val version = new String(bytes, p, ve - p, US_ASCII)
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"bad WARC version line '$version'")
      p = ve + 2
      var wtype: String = null
      var rid: String = null
      var uri: String = null
      var clen = -1L
      var inHeaders = true
      while (inHeaders) {
        val e = crlfAt(bytes, p)
        if (e == p) { inHeaders = false; p += 2 }
        else {
          val line = new String(bytes, p, e - p, US_ASCII)
          require(!Character.isWhitespace(line.charAt(0)),
            s"obs-fold continuation line refused: '$line'")
          val ci = line.indexOf(':')
          require(ci > 0, s"malformed WARC header '$line'")
          val value = line.substring(ci + 1).trim
          line.substring(0, ci).toLowerCase(java.util.Locale.ROOT) match {
            case "warc-type" => wtype = value
            case "warc-record-id" =>
              rid = if (value.length >= 2 && value.head == '<' &&
                value.last == '>') value.substring(1, value.length - 1)
              else value
            case "warc-target-uri" => uri = value
            case "content-length" => clen = value.toLong
            case _ => ()
          }
          p = e + 2
        }
      }
      require(wtype != null && rid != null && clen >= 0,
        "missing mandatory WARC header (WARC-Type/WARC-Record-ID/Content-Length)")
      require(clen <= bytes.length - p - 4,
        s"truncated WARC content for $rid")
      val off = p
      p += clen.toInt
      require(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
        bytes(p + 2) == '\r' && bytes(p + 3) == '\n',
        s"missing WARC record separator after $rid")
      p += 4
      out += ((wtype, rid, if (uri == null) "" else uri, clen, off))
    }
    out.toSeq
  }

  /** Index of the next CRLF at/after `p` — loud on a bare LF, a bare
    * CR, or EOF inside a header block (all framing corruption).
    */
  private def crlfAt(bytes: Array[Byte], p: Int): Int = {
    var i = p
    while (i + 1 < bytes.length &&
      !(bytes(i) == '\r' && bytes(i + 1) == '\n')) {
      require(bytes(i) != '\n', "bare LF in WARC header block")
      require(bytes(i) != '\r', "bare CR in WARC header block")
      i += 1
    }
    require(i + 1 < bytes.length, "truncated WARC header block")
    i
  }

  /** Build a canonical WARC/1.0 archive from (warcType, recordId,
    * targetUri, content) records: fixed header order and a fixed
    * WARC-Date, so the bytes are a pure function of the records (the
    * builder is the demo generator AND a real encoder). Header
    * values must be ASCII — refused loudly rather than mangled, the
    * buildTar rule.
    */
  def buildWarc(records: Seq[(String, String, String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { case (wtype, rid, uri, content) =>
      Seq(wtype, rid, uri).foreach(v =>
        require(v.forall(c => c >= 0x20 && c < 0x7f),
          s"non-ASCII WARC header value: $v"))
      val sb = new StringBuilder
      sb.append("WARC/1.0\r\n")
      sb.append("WARC-Type: ").append(wtype).append("\r\n")
      sb.append("WARC-Record-ID: <").append(rid).append(">\r\n")
      if (uri.nonEmpty)
        sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
      sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      sb.append("Content-Type: text/plain\r\n")
      sb.append("Content-Length: ").append(content.length).append("\r\n")
      sb.append("\r\n")
      bos.write(sb.toString.getBytes(US_ASCII))
      bos.write(content)
      bos.write(Crlf); bos.write(Crlf)
    }
    bos.toByteArray
  }

  /** Whole-stream gzip (JDK GZIPOutputStream writes MTIME=0, so the
    * bytes are deterministic for fixed input).
    */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** The Common Crawl splittable layout: one gzip MEMBER per record,
    * concatenated — member boundaries re-align record boundaries so a
    * scale-out reader can split on them.
    */
  def gzipPerRecord(records: Seq[(String, String, String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach(r => bos.write(gzip(buildWarc(Seq(r)))))
    bos.toByteArray
  }

  /** Inflate if gzipped (0x1f 0x8b magic), consuming concatenated
    * members; pass plain bytes through untouched.
    *
    * Deliberately NOT `GZIPInputStream`: its readTrailer() silently
    * IGNORES malformed bytes after any member boundary, so a
    * per-record-member archive with one corrupt mid-chain member
    * header would inflate to a clean-looking PREFIX — every later
    * record silently lost, the exact silent-wrong-record failure the
    * walker exists to refuse. This is a strict RFC 1952 member-chain
    * walk: each member's header flags are honored, the deflate
    * stream is inflated raw, CRC32 and ISIZE trailers are verified,
    * and every byte of the payload must belong to some member —
    * corruption anywhere fails loudly.
    */
  def maybeGunzip(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
      (bytes(1) & 0xff) == 0x8b) gunzipMembers(bytes)
    else bytes

  /** Hard ceiling on an archive's PLAIN (inflated) size: the walker
    * and its content slicing are single-array by design, so an
    * archive inflating past ~2 GiB cannot be represented — it fails
    * LOUDLY here (streaming intakes quarantine the row) instead of
    * dying mid-inflate with a JVM OutOfMemoryError that reads like an
    * infrastructure problem. Production-sized monolith archives (a
    * Common Crawl segment inflates 4-5 GiB) must arrive SHARDED; the
    * intake processes archives independently, so smaller shards
    * restore the bound without any code change.
    */
  private val MaxPlainBytes: Long = Int.MaxValue.toLong - 64

  private def gunzipMembers(bytes: Array[Byte]): Array[Byte] = {
    def u8(i: Int) = bytes(i) & 0xff
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) |
      (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    val bos = new java.io.ByteArrayOutputStream()
    var grand = 0L
    var p = 0
    while (p < bytes.length) {
      require(bytes.length - p >= 18, "truncated gzip member")
      require(u8(p) == 0x1f && u8(p + 1) == 0x8b,
        "bad gzip member magic")
      require(u8(p + 2) == 8, s"unsupported gzip CM ${u8(p + 2)}")
      val flg = u8(p + 3)
      require((flg & 0xe0) == 0, "reserved gzip FLG bits set")
      var q = p + 10
      if ((flg & 4) != 0) { // FEXTRA
        require(q + 2 <= bytes.length, "truncated FEXTRA")
        val xlen = u8(q) | (u8(q + 1) << 8)
        q += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME: NUL-terminated
        while (q < bytes.length && bytes(q) != 0) q += 1
        q += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (q < bytes.length && bytes(q) != 0) q += 1
        q += 1
      }
      if ((flg & 2) != 0) q += 2 // FHCRC
      require(q < bytes.length, "truncated gzip header")
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, q, bytes.length - q)
        val crc = new java.util.zip.CRC32
        val buf = new Array[Byte](8192)
        var memberLen = 0L
        while (!inf.finished()) {
          val n = try inf.inflate(buf) catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"corrupt deflate stream in gzip member: ${e.getMessage}")
          }
          if (n > 0) {
            grand += n
            require(grand <= MaxPlainBytes,
              s"archive inflates past the single-buffer intake cap" +
                s" (~2 GiB plain) — shard the archive; see MaxPlainBytes")
            bos.write(buf, 0, n); crc.update(buf, 0, n); memberLen += n
          }
          else require(inf.finished(),
            "truncated deflate stream in gzip member")
        }
        val used = q + inf.getBytesRead.toInt
        require(bytes.length - used >= 8, "truncated gzip trailer")
        require(le32(used) == crc.getValue, "gzip member CRC mismatch")
        require(le32(used + 4) == (memberLen & 0xffffffffL),
          "gzip member ISIZE mismatch")
        p = used + 8
      } finally inf.end()
    }
    bos.toByteArray
  }

  /** Fixed warcinfo content of the demo archives (CRLF-terminated
    * named fields, per the spec's application/warc-fields).
    */
  val WarcInfoContent: Array[Byte] =
    "software: graft/1.0\r\nformat: WARC File Format 1.0\r\n"
      .getBytes(US_ASCII)

  /** The deterministic demo records of one archive: a warcinfo
    * record + one WET-style conversion record carrying the
    * document's text — every name, length and offset is closed-form
    * in (doc_id, text), so the oracle reconstructs the whole
    * inventory in SQL with NO side-table (f12's differential
    * third-expression discipline).
    */
  def demoRecords(id: Long, text: String): Seq[(String, String, String, Array[Byte])] =
    Seq(
      ("warcinfo", s"urn:graft:info:$id", "", WarcInfoContent),
      ("conversion", s"urn:graft:doc:$id",
        s"https://example.org/doc/$id", text.getBytes(UTF_8)))

  /** The production intake the f13 demo's synthesized archives stand
    * in for: read a directory tree of WARC drops through Spark's
    * `binaryFile` source (the m05 rule — path-hash ids, listing
    * distributes, payloads stay executor-side), enumerate every
    * archive's records with the same walker (gzip inflated
    * transparently in both layouts), and emit the slim record
    * inventory plus the conversion text st22's gate lands. A
    * whole-file-gzipped archive makes the FILE the parallel unit
    * (non-splittable); the per-record-member layout is the
    * splittable drop shape — either way only slim rows shuffle and a
    * repartition downstream restores balance.
    */
  def warcFromDir(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(abs(xxhash64(col("path"))).as("archive_id"),
        col("path"), col("content"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (aid, p, bytes) =>
        val plain = maybeGunzip(bytes)
        warcRecords(plain).zipWithIndex.map {
          case ((t, rid, uri, len, off), i) =>
            (aid, p, i.toLong, t, rid, uri, len,
              if (t == "conversion")
                new String(plain, off, len.toInt,
                  java.nio.charset.StandardCharsets.UTF_8)
              else null)
        }
      }
      .toDF("archive_id", "path", "idx", "warc_type", "record_id",
        "target_uri", "content_length", "text")
  }

  /** f16's default shard capacity. ONE definition shared by the
    * export, both demo entry points, and the DuckDB oracle's shard
    * divisor (ADVICE r15 #4 — the oracle used to hard-code `// 64`,
    * so any caller overriding the demo parameter silently diverged
    * from it).
    */
  val DefaultDocsPerShard: Long = 64L

  /** f16: WARC shard EXPORT — the WRITE half of f13 (the reference
    * pipeline only CONSUMES archives; a complete engine must also
    * produce them, because WARC/WET is the interchange format crawl
    * corpora move between pipelines in). Documents are packed into
    * fixed-capacity shards in doc_id order, each shard built with the
    * canonical [[buildWarc]] encoder — one `warcinfo` header record
    * (`urn:graft:shard:<id>`) followed by one WET-style `conversion`
    * record per document (f13's demo record shape, so anything that
    * reads f13's output reads these) — and landed as
    * `shard-<id>.warc.gz` in the per-record gzip-member layout (the
    * splittable Common Crawl drop shape [[gzipPerRecord]] exists
    * for). Returns the per-shard manifest: doc/record counts, PLAIN
    * (pre-gzip) byte size — closed-form in the inputs, so the DuckDB
    * oracle replays it string-for-string (f13's differential
    * discipline) — and the gzipped size actually landed.
    *
    * Scale: shard ranks come from c09's DISTRIBUTED prefix-sum over
    * unit weights (no unpartitioned window anywhere); each shard
    * group holds ≤ `docsPerShard` documents by construction (the c23
    * bounded-collect class — `docsPerShard` sizes the memory unit);
    * archive bytes are built and written executor-side and never
    * shuffle (the m-family posture); the only exchange is the
    * shard-id group-by. Re-export is Overwrite-idempotent per shard
    * file: each attempt writes an attempt-unique dot-temp and renames
    * into place (ADVICE r15 #2 — a task retry or speculative
    * duplicate writing the final path directly could tear the shard
    * while the manifest row, built from in-memory bytes, still
    * reported it clean; rename is atomic and every attempt's bytes
    * are identical, so any winner is correct), and shard files left
    * by a previous LARGER export to the same root are swept at
    * plan-build time (a lingering `shard-00009` beside a fresh
    * 3-shard export would resurrect vanished docs through
    * [[warcFromDir]]'s directory listing).
    */
  def f16WarcExport(docs: DataFrame, outRoot: String,
      docsPerShard: Long = DefaultDocsPerShard): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(docsPerShard > 0, s"docsPerShard $docsPerShard must be positive")
    // stale-shard + orphaned-temp sweep (driver-side, one listing):
    // evaluation then re-creates every CURRENT shard
    val rootPath = new org.apache.hadoop.fs.Path(outRoot)
    val rfs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (rfs.exists(rootPath))
      rfs.listStatus(rootPath).foreach { st =>
        val nm = st.getPath.getName
        if (nm.matches("shard-\\d{5}\\.warc\\.gz") ||
            nm.matches("\\.shard-\\d{5}\\.warc\\.gz\\..*\\.tmp"))
          rfs.delete(st.getPath, false)
      }
    // rank div docsPerShard via the c09 prefix-sum with unit weights:
    // seq_first IS the 0-based global rank's shard
    val ranked = graft.operators.Corpus.packOffsetsOver(
      docs.select(col("doc_id"), lit(1L).as("n_tokens")), docsPerShard)
      .select(col("doc_id"), col("seq_first").as("shard_id"))
    val confSer = new FilePipeline.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    docs.select(col("doc_id"), col("text")).join(ranked, "doc_id")
      .select(col("shard_id"), col("doc_id"), col("text"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (sid, it) =>
        // bounded by construction: ≤ docsPerShard members
        val members = it.map(t => (t._2, t._3)).toSeq.sortBy(_._1)
        val recs = ("warcinfo", s"urn:graft:shard:$sid", "",
          WarcInfoContent) +: members.map { case (id, text) =>
          ("conversion", s"urn:graft:doc:$id",
            s"https://example.org/doc/$id", text.getBytes(UTF_8))
        }
        val plains = recs.map(r => buildWarc(Seq(r)))
        val gz = {
          val bos = new java.io.ByteArrayOutputStream()
          plains.foreach(p => bos.write(gzip(p)))
          bos.toByteArray
        }
        val out = new org.apache.hadoop.fs.Path(
          f"$outRoot/shard-$sid%05d.warc.gz")
        val fs = out.getFileSystem(confSer.value)
        fs.setWriteChecksum(false) // no .crc sidecars (f14's discipline)
        // attempt-unique dot-temp → rename (ADVICE r15 #2): never two
        // writers on one final path; dot-prefix keeps readers
        // (binaryFile listings skip hidden files) off in-flight bytes
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId().toString)
          .getOrElse(java.util.UUID.randomUUID().toString)
        val tmp = new org.apache.hadoop.fs.Path(
          f"$outRoot/.shard-$sid%05d.warc.gz.$attempt%s.tmp")
        val os = fs.create(tmp, true)
        try os.write(gz) finally os.close()
        // rename-FIRST commit (ADVICE r16 #2): an existing dest here
        // can only be a concurrent/zombie attempt's IDENTICAL bytes
        // (stale shards from older exports were swept at plan time),
        // so it must never be deleted — the old delete-then-rename
        // order let a losing attempt delete the winner's committed
        // shard and die before its own rename, leaving the manifest
        // pointing at a missing file. HDFS rename refuses an existing
        // dest (we drop tmp: the winner is byte-identical); a failed
        // rename with NO dest is a real FS failure and must be loud.
        if (!fs.rename(tmp, out)) {
          fs.delete(tmp, false)
          if (!fs.exists(out))
            throw new java.io.IOException(s"f16: failed to land $out")
        }
        (sid, members.length.toLong, recs.length.toLong,
          plains.map(_.length.toLong).sum, gz.length.toLong)
      }
      .toDF("shard_id", "n_docs", "n_records", "plain_bytes", "gz_bytes")
      .orderBy("shard_id")
  }

  private def f16DemoRoot(dir: String, tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_f16${tag}_${dir.hashCode.toHexString}"

  /** f16 driver query: export the corpus as WARC shards and report
    * the manifest's oracle-replayable columns (gz_bytes stays in the
    * public API but out of the oracle — deflate output is
    * deterministic bytes, not SQL).
    */
  def f16WarcExportDemo(spark: SparkSession, dir: String,
      docsPerShard: Long = DefaultDocsPerShard): DataFrame = {
    val root = f16DemoRoot(dir, "")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f16WarcExport(Tables(spark, dir).documents.select("doc_id", "text"),
      root, docsPerShard)
      .select("shard_id", "n_docs", "n_records", "plain_bytes")
  }

  /** f16 round-trip driver query: export, then read every shard back
    * through the f13 production intake ([[warcFromDir]] — binaryFile
    * listing, member-chain gunzip, the validating walker) and emit
    * the recovered documents. The oracle is a plain SELECT over
    * `documents`: a hash match proves the whole write→read path —
    * encoder, gzip member layout, walker framing, UTF-8 round-trip —
    * preserves every byte of every document.
    */
  def f16WarcRoundtrip(spark: SparkSession, dir: String,
      docsPerShard: Long = DefaultDocsPerShard): DataFrame = {
    val root = f16DemoRoot(dir, "rt")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    f16WarcExport(Tables(spark, dir).documents.select("doc_id", "text"),
      root, docsPerShard).collect() // materialize the export (side effect)
    warcFromDir(spark, root)
      .filter(col("warc_type") === "conversion")
      .select(
        regexp_extract(col("record_id"), "^urn:graft:doc:(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("target_uri"), col("text"))
      .orderBy("doc_id")
  }

  /** f13 driver demo: synthesize one WET-style archive per document,
    * walk every record back out, and report the record inventory
    * plus the archive's structural size.
    */
  def f13WarcIntake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val warc = buildWarc(demoRecords(id, text))
        warcRecords(warc).zipWithIndex.map {
          case ((wtype, rid, uri, clen, off), i) =>
            (id, i.toLong, wtype, rid, uri, clen, off.toLong,
              warc.length.toLong)
        }
      }
      .toDF("doc_id", "idx", "warc_type", "record_id", "target_uri",
        "content_length", "content_offset", "warc_len")
      .orderBy("doc_id", "idx")
  }
}
