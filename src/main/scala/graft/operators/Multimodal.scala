package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** m01–m03: multimodal columns with REAL pure-JDK codecs (SURVEY.md §2.C).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct; decode/feature-extract runs as a typed `mapPartitions`
  * pipeline (the Scala analogue of `mapInPandas` batch UDFs) so each
  * partition amortizes decoder setup and the work distributes with the
  * data. Decoding is real: images are PNG decoded with
  * `javax.imageio.ImageIO`, audio is 16-bit PCM WAV parsed with
  * a hand-rolled RIFF codec, and video is a length-prefixed
  * container of PNG frames (no pure-JDK video codec exists; the
  * container keeps frame decode honest). The demo `mediaTable`
  * synthesizes genuine encoded payloads so the decode path exercises
  * the actual codecs end-to-end; at 100 TB the same pipeline reads
  * `spark.read.format("binaryFile")` and only the synthesis goes away.
  */
object Multimodal {

  /** Pure-JDK encode/decode kernels. Kept tiny, deterministic, and
    * driver-free so ScalaCheck can fuzz round-trip laws on them.
    */
  object Codecs {
    // keep ImageIO in-memory: executor-side decode must not touch /tmp
    ImageIO.setUseCache(false)

    /** Encode an 8-bit grayscale image (row-major `gray`, values
      * 0..255) as PNG. Java's PNG writer emits no timestamp chunks, so
      * the bytes are a deterministic function of the pixels.
      */
    def encodePng(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
      require(gray.length == w * h, s"expected ${w * h} pixels, got ${gray.length}")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, gray(y * w + x) & 0xff)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode any ImageIO-supported image (PNG/JPEG/BMP/GIF) to
      * (width, height, row-major luminance 0..255). Rec.601 integer
      * luma; for grayscale sources r==g==b so luma == the gray value
      * exactly.
      */
    def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h)
      val singleBand = img.getRaster.getNumBands == 1
      // deep gray sources (16-bit PNG, 12-bit medical scans) carry
      // samples above 255: `& 0xff` would WRAP them mod 256 — silent
      // luminance garbage (review r14). Shift the top 8 bits down
      // instead; 8-bit sources shift by 0 and are untouched.
      val grayShift =
        if (singleBand)
          math.max(0, img.getRaster.getSampleModel.getSampleSize(0) - 8)
        else 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) =
            if (singleBand) {
              // gray sources: raw raster sample — getRGB would route the
              // linear gray space through sRGB gamma and corrupt values
              (img.getRaster.getSample(x, y, 0) >>> grayShift) & 0xff
            } else {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              (r * 299 + g * 587 + b * 114) / 1000
            }
          x += 1
        }
        y += 1
      }
      (w, h, out)
    }

    /** Encode 16-bit mono PCM as a canonical RIFF/WAVE payload.
      * Hand-rolled on purpose: `AudioSystem.write` costs milliseconds
      * PER CALL in provider lookup and stream plumbing — ~6.5 ms/clip,
      * which made codec overhead (not audio math) the entire audio
      * family's wall clock at 10× data — where this is a 44-byte
      * header plus one little-endian array copy. The emitted bytes are
      * the same canonical PCM WAVE layout AudioSystem produces.
      */
    def encodeWav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
      val dataLen = samples.length * 2
      val sr = sampleRate.toInt
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('R'.toByte).put('I'.toByte).put('F'.toByte).put('F'.toByte)
        .putInt(36 + dataLen)
        .put('W'.toByte).put('A'.toByte).put('V'.toByte).put('E'.toByte)
        .put('f'.toByte).put('m'.toByte).put('t'.toByte).put(' '.toByte)
        .putInt(16).putShort(1).putShort(1) // PCM, mono
        .putInt(sr).putInt(sr * 2)          // sample rate, byte rate
        .putShort(2).putShort(16)           // block align, bits/sample
        .put('d'.toByte).put('a'.toByte).put('t'.toByte).put('a'.toByte)
        .putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** Walk a PNG's chunk sequence: (type, dataLen, byteOffset) in
      * stream order. Real parsing per the public PNG spec (ISO 15948
      * §5): validates the 8-byte signature, every chunk's CRC32 over
      * type+data, and the terminal IEND — a corrupt payload fails
      * loudly instead of passing garbage downstream.
      */
    def pngChunks(bytes: Array[Byte]): Seq[(String, Int, Int)] = {
      require(bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G' &&
        bytes(4) == 0x0d && bytes(5) == 0x0a &&
        bytes(6) == 0x1a && bytes(7) == 0x0a, "not a PNG payload")
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
      var p = 8
      while (p < bytes.length) {
        require(p + 12 <= bytes.length, "truncated chunk header")
        val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        val ctype = new String(bytes, p + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        // overflow-safe form: p + 12 + len can wrap Int for a crafted
        // length and slip past a `p + 12 + len <= length` guard
        require(len >= 0 && len <= bytes.length - 12 - p,
          s"truncated $ctype chunk")
        val crc = new java.util.zip.CRC32
        crc.update(bytes, p + 4, 4 + len)
        val stored = ((bytes(p + 8 + len) & 0xffL) << 24) |
          ((bytes(p + 9 + len) & 0xffL) << 16) |
          ((bytes(p + 10 + len) & 0xffL) << 8) |
          (bytes(p + 11 + len) & 0xffL)
        require(crc.getValue == stored, s"bad CRC in $ctype chunk")
        out += ((ctype, len, p))
        p += 12 + len
        // IEND must be the FINAL byte (ISO 15948 §5.6): decoders stop
        // at the first IEND, so bytes after an interior one are a
        // covert channel the scrub would otherwise pass through —
        // crafted "critical"-typed chunks there survive
        // scrubPngAncillary while staying invisible to every decoder
        // (review r14)
        if (ctype == "IEND")
          require(p == bytes.length,
            s"${bytes.length - p} trailing bytes after IEND")
      }
      require(out.nonEmpty && out.last._1 == "IEND" && out.head._1 == "IHDR",
        "malformed PNG chunk sequence")
      out.toSeq
    }

    /** Splice one chunk (correct length + CRC32) immediately after
      * IHDR — how metadata editors plant tEXt/tIME/eXIf chunks.
      */
    def addPngChunk(bytes: Array[Byte], ctype: String,
        data: Array[Byte]): Array[Byte] = {
      require(ctype.length == 4, s"chunk type must be 4 chars: $ctype")
      val chunks = pngChunks(bytes)
      val insertAt = chunks.head match { case (_, len, off) => off + 12 + len }
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      val bb = ByteBuffer.allocate(bytes.length + 12 + data.length)
      bb.put(bytes, 0, insertAt)
        .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
        .put(bytes, insertAt, bytes.length - insertAt)
      bb.array()
    }

    /** Drop every ancillary chunk (bit 5 of the type's first byte set
      * — the PNG spec's critical/ancillary rule), keeping the
      * signature and all critical chunks byte-identical. This is the
      * metadata scrub: tEXt/zTXt/iTXt/tIME/eXIf all classify
      * ancillary; IHDR/PLTE/IDAT/IEND survive.
      */
    def scrubPngAncillary(bytes: Array[Byte]): Array[Byte] =
      scrubFromChunks(bytes, pngChunks(bytes))

    /** [[scrubPngAncillary]] given an already-computed chunk walk —
      * callers that also need chunk counts walk (and CRC-validate)
      * the payload ONCE and derive both from the same result.
      */
    def scrubFromChunks(bytes: Array[Byte],
        chunks: Seq[(String, Int, Int)]): Array[Byte] = {
      val kept = chunks.filter { case (t, _, _) => (t.charAt(0) & 0x20) == 0 }
      val out = ByteBuffer.allocate(
        8 + kept.map { case (_, len, _) => 12 + len }.sum)
      out.put(bytes, 0, 8)
      kept.foreach { case (_, len, off) => out.put(bytes, off, 12 + len) }
      out.array()
    }

    /** Average-pool a grayscale image by an integer factor: each
      * output sample is the INTEGER mean (floor) of its f×f block —
      * exact arithmetic, so the result is bit-identical in any
      * engine. Dimensions must divide evenly (the demo's 8×8 with
      * f=2 does; a production resize pads or crops first — that
      * policy belongs to the caller, not the kernel).
      */
    def poolGray(w: Int, h: Int, px: Array[Int],
        f: Int): (Int, Int, Array[Int]) = {
      require(f > 0 && w % f == 0 && h % f == 0,
        s"pool factor $f must divide ${w}x$h")
      require(px.length == w * h, s"expected ${w * h} pixels")
      val (ow, oh) = (w / f, h / f)
      val out = new Array[Int](ow * oh)
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var s = 0
          var dy = 0
          while (dy < f) {
            var dx = 0
            while (dx < f) {
              s += px((oy * f + dy) * w + (ox * f + dx))
              dx += 1
            }
            dy += 1
          }
          out(oy * ow + ox) = s / (f * f)
          ox += 1
        }
        oy += 1
      }
      (ow, oh, out)
    }

    /** Decimate 16-bit PCM by an integer factor: each output sample
      * is the FLOOR mean (Math.floorDiv — floor, not
      * truncate-toward-zero, so negative sums agree with SQL floor
      * division) of f consecutive inputs. Exact integer arithmetic,
      * bit-identical in any engine; sample count must divide evenly
      * (the synth corpus's multiples-of-128 do; production pads or
      * trims first — caller policy, as in [[poolGray]]).
      */
    def decimatePcm(samples: Array[Short], f: Int): Array[Short] = {
      require(f > 0 && samples.length % f == 0,
        s"factor $f must divide ${samples.length} samples")
      val out = new Array[Short](samples.length / f)
      var i = 0
      while (i < out.length) {
        var s = 0L // Long: an Int sum overflows past f ≈ 2^16 windows
        var k = 0
        while (k < f) { s += samples(i * f + k); k += 1 }
        out(i) = Math.floorDiv(s, f.toLong).toShort
        i += 1
      }
      out
    }

    /** Parse a WAV payload back to its 16-bit PCM mono samples — a
      * real RIFF chunk walk (fmt validated, unknown chunks skipped,
      * odd sizes padded per spec), so payloads written by any
      * conformant encoder decode, not just [[encodeWav]]'s. Same
      * per-call-overhead rationale as the encoder.
      */
    def decodeWav(bytes: Array[Byte]): Array[Short] = {
      require(bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
        "not a RIFF/WAVE payload")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var fmtOk = false
      var dataOff = -1
      var dataLen = 0
      while (pos + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
        val a = bytes(pos); val b = bytes(pos + 1)
        val c = bytes(pos + 2); val d = bytes(pos + 3)
        val size = bb.getInt(pos + 4)
        // a NEGATIVE declared size (crafted/corrupt) must fail loudly:
        // unvalidated, `pos += 8 + size` advances by ≤ 0 and the walk
        // spins forever — an executor HANG, strictly worse than a
        // throw (review r14)
        require(size >= 0, s"negative RIFF chunk size $size at offset $pos")
        if (a == 'f' && b == 'm' && c == 't' && d == ' ') {
          // a short fmt chunk must not read its "fields" out of the
          // NEXT chunk's bytes (PCM fmt is ≥ 16 bytes by spec)
          require(size >= 16, s"short fmt chunk ($size bytes)")
          val audioFormat = bb.getShort(pos + 8)
          val channels = bb.getShort(pos + 10)
          val bits = bb.getShort(pos + 22)
          require(audioFormat == 1 && channels == 1 && bits == 16,
            s"expected 16-bit mono PCM, got format=$audioFormat " +
              s"channels=$channels bits=$bits")
          fmtOk = true
        } else if (a == 'd' && b == 'a' && c == 't' && d == 'a') {
          dataOff = pos + 8
          dataLen = size
        }
        // Long advance: 8 + size + pad can wrap Int for a ~2^31 size
        // and land `pos` NEGATIVE (then bytes(pos) throws a misleading
        // AIOOBE); a past-the-end advance just ends the walk — a
        // truncated final chunk is tolerated by the min() below, the
        // decoder's long-standing torn-tail contract
        val next = pos.toLong + 8L + size + (size & 1) // word-aligned
        pos = if (next > bytes.length) bytes.length else next.toInt
      }
      require(fmtOk && dataOff >= 0, "missing fmt/data chunk in WAVE payload")
      val n = math.min(dataLen.toLong, (bytes.length - dataOff).toLong).toInt / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = bb.getShort(dataOff + 2 * i); i += 1 }
      out
    }

    /** Normalized n-bin luminance histogram (sums to 1 for any
      * non-empty image).
      */
    def lumaHistogram(pixels: Array[Int], nBins: Int = 8): Array[Float] = {
      val hist = new Array[Long](nBins)
      var i = 0
      while (i < pixels.length) {
        hist(math.min(pixels(i) * nBins / 256, nBins - 1)) += 1
        i += 1
      }
      val n = math.max(pixels.length, 1).toFloat
      hist.map(_ / n)
    }

    /** Normalized n-bin amplitude histogram over the full 16-bit range. */
    def amplitudeHistogram(samples: Array[Short], nBins: Int = 8): Array[Float] = {
      val hist = new Array[Long](nBins)
      var i = 0
      while (i < samples.length) {
        hist(((samples(i) + 32768) * nBins) >>> 16) += 1
        i += 1
      }
      val n = math.max(samples.length, 1).toFloat
      hist.map(_ / n)
    }

    /** RMS of normalized samples (|s|/32768 ∈ [0,1]) over [from, until). */
    def rms(samples: Array[Short], from: Int, until: Int): Double = {
      val n = until - from
      if (n <= 0) return 0.0
      var s = 0.0
      var i = from
      while (i < until) {
        val v = samples(i) / 32768.0
        s += v * v
        i += 1
      }
      math.sqrt(s / n)
    }

    /** Block-average a w×h grayscale image down to an outRes×outRes
      * grid (row-major, length outRes²) — a real thumbnailer without a
      * resample kernel dependency. Cells with no source pixels (only
      * possible when w or h < outRes) stay 0.
      */
    def blockResize(w: Int, h: Int, pixels: Array[Int], outRes: Int): Array[Float] = {
      require(pixels.length == w * h, s"expected ${w * h} pixels, got ${pixels.length}")
      val out = new Array[Float](outRes * outRes)
      val cnt = new Array[Int](outRes * outRes)
      var y = 0
      while (y < h) {
        val by = y * outRes / h
        var x = 0
        while (x < w) {
          val b = by * outRes + x * outRes / w
          out(b) += pixels(y * w + x)
          cnt(b) += 1
          x += 1
        }
        y += 1
      }
      var j = 0
      while (j < out.length) {
        if (cnt(j) > 0) out(j) /= cnt(j)
        j += 1
      }
      out
    }

    /** Pack PNG frames into a length-prefixed container (4-byte
      * big-endian length per frame). Stand-in for a video bitstream:
      * frame boundaries are explicit, each frame is a real encoded
      * image.
      */
    def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      frames.foreach { f =>
        bos.write(ByteBuffer.allocate(4).putInt(f.length).array())
        bos.write(f)
      }
      bos.toByteArray
    }

    /** Unpack a length-prefixed frame container. */
    def unpackFrames(container: Array[Byte]): Array[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var pos = 0
      while (pos + 4 <= container.length) {
        val len = ByteBuffer.wrap(container, pos, 4).getInt
        // overflow-safe form (the pngChunks rule): pos + 4 + len wraps
        // Int for a crafted ~2^31 length and would slip past the
        // additive guard into copyOfRange with a misleading error
        require(len >= 0 && len <= container.length - pos - 4,
          s"corrupt frame container at offset $pos")
        out += java.util.Arrays.copyOfRange(container, pos + 4, pos + 4 + len)
        pos += 4 + len
      }
      // a torn/truncated container must fail LOUDLY, not silently
      // return fewer frames: 1-3 trailing bytes are a partial length
      // prefix, i.e. a write that stopped mid-frame (review r14)
      require(pos == container.length,
        s"${container.length - pos} trailing bytes after the last frame")
      out.toArray
    }
  }

  // ---- deterministic payload synthesis (demo corpus; real deployments
  //      read binaryFile/manifest instead) ----

  private val ImgRes = 8

  private def pixel(seed: Long, f: Int, x: Int, y: Int): Int =
    (((seed * 31 + f * 101 + x * 7 + y * 13) % 256 + 256) % 256).toInt

  /** An 8×8 grayscale PNG whose pixels are a fixed function of the id. */
  def synthImage(seed: Long): Array[Byte] = {
    val px = Array.tabulate(ImgRes * ImgRes)(i => pixel(seed, 0, i % ImgRes, i / ImgRes))
    Codecs.encodePng(ImgRes, ImgRes, px)
  }

  /** A mono 16-bit WAV: sine tone whose frequency/amplitude/length are
    * fixed functions of the id. StrictMath keeps the samples bit-exact
    * across executors.
    */
  def synthWav(seed: Long): Array[Byte] = {
    val sr = 8000.0
    val n = 512 + (seed % 8).toInt * 128
    val freq = 220.0 + (seed % 16).toInt * 55.0
    val amp = 6000.0 + (seed % 8).toInt * 2000.0
    val samples = Array.tabulate(n)(i =>
      math.round(amp * StrictMath.sin(2.0 * StrictMath.PI * freq * i / sr)).toShort)
    Codecs.encodeWav(samples)
  }

  /** 3–8 PNG frames in the length-prefixed container. */
  def synthVideo(seed: Long): Array[Byte] = {
    val nFrames = 3 + (seed % 6).toInt
    Codecs.packFrames((0 until nFrames).map { f =>
      val px = Array.tabulate(ImgRes * ImgRes)(i => pixel(seed, f, i % ImgRes, i / ImgRes))
      Codecs.encodePng(ImgRes, ImgRes, px)
    })
  }

  /** The slim id/meta frame re-spread across the session's cores
    * before an expensive per-row payload synthesis/codec pass. The
    * scan feeding these demo corpora is a handful of small parquet
    * files, which Spark's small-file packing coalesces into one or
    * two partitions (openCostInBytes vs maxPartitionBytes) — the
    * right call for scan-bound queries, but SERIAL for compute-bound
    * mapPartitions: at 10× data the entire multimodal family was
    * synthesizing and decoding on one thread while 31 idled. A
    * bytes-per-row shuffle buys full-width codec parallelism; real
    * `binaryFile` intakes (m05) split per file and don't need this.
    */
  private def spreadIds(ids: DataFrame): DataFrame =
    ids.repartition(ids.sparkSession.sparkContext.defaultParallelism)

  /** Typed metadata travelling with each payload. */
  final case class MediaMeta(content_length: Long, origin: String, tag: String)
  final case class MediaRow(
      doc_id: Long, media_type: String, payload: Array[Byte], meta: MediaMeta)

  /** Media table derived deterministically from documents: payloads are
    * REAL encoded PNG/WAV/frame-container bytes (media_type round-robins
    * image/audio/video on doc_id%3 = 0/1/2). Synthesis runs executor-side
    * in the same mapPartitions batch shape the decoders use. At 100 TB
    * this is `spark.read.format("binaryFile")` or a manifest join — the
    * downstream pipeline is identical.
    *
    * `only`: optional media-type pre-filter. A `media_type === …`
    * filter ABOVE this table cannot be pushed below the typed
    * mapPartitions by Catalyst (typed deserialization is a barrier),
    * so a single-modality consumer would synthesize all three payload
    * kinds and discard two — at 10× data that was most of m02/m03's
    * wall clock (video synthesis deflate-encodes multiple PNGs per
    * row). The type is a pure doc_id residue, so the pre-filter below
    * the barrier is exactly the pushdown Catalyst would have wanted.
    */
  def mediaTable(spark: SparkSession, dir: String,
      only: Option[String] = None): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("long").as("text_len"))
    val pre = only match {
      case Some("image") => docs.filter(col("doc_id") % 3 === 0)
      case Some("audio") => docs.filter(col("doc_id") % 3 === 1)
      case Some("video") => docs.filter(col("doc_id") % 3 === 2)
      case _             => docs
    }
    spreadIds(pre)
      .as[(Long, String, String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, source, lang, textLen) =>
          val (mt, payload) = (id % 3) match {
            case 0 => ("image", synthImage(id))
            case 1 => ("audio", synthWav(id))
            case _ => ("video", synthVideo(id))
          }
          MediaRow(id, mt, payload, MediaMeta(textLen, source, lang))
        }
      }
      .toDF()
  }

  /** The production intake the demo `mediaTable` stands in for: read a
    * directory tree of media files through Spark's `binaryFile` source
    * (path, modificationTime, length, content), type them by an
    * explicit extension allowlist (png/jpg/jpeg/bmp/gif → image,
    * wav → audio, vid → the frame container; anything else fails at
    * intake), and surface the same (doc_id, media_type, payload)
    * contract every m-operator consumes — `m01Features`,
    * [[m04PhashPairsOver]], the frame/audio windows all run unchanged
    * on top. doc_id is the 63-bit xxhash of the file path (stable
    * across re-listings; collision-free in practice at any corpus
    * size). `pathGlobFilter`/`recursiveFileLookup` are the listing
    * dials; at 100 TB the listing itself distributes, and everything
    * downstream is the already-tested decode pipeline.
    */
  def mediaFromDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(
        abs(xxhash64(col("path"))).as("doc_id"),
        // explicit allowlist: every ImageIO-decodable extension routes
        // to the image path (decodeGray reads them all); "video" is
        // RESERVED for the frame-container extension — a catch-all
        // `otherwise("video")` once sent .jpg files into unpackFrames
        // to die as "corrupt frame container" at decode time. Unknown
        // extensions fail HERE, at intake, with the offending path.
        when(regexp_like(lower(col("path")),
            lit("\\.(png|jpg|jpeg|bmp|gif)$")), "image")
          .when(lower(col("path")).endsWith(".wav"), "audio")
          .when(lower(col("path")).endsWith(".vid"), "video")
          .otherwise(raise_error(concat(
            lit("mediaFromDir: unknown media extension: "), col("path"))))
          .as("media_type"),
        col("content").as("payload"),
        col("path"), col("length").as("n_bytes"))

  /** Decoded-media feature record. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, feat: Array[Float])

  /** Real decode + featurize: PNG → luminance histogram, WAV →
    * amplitude histogram, video → first-frame luminance histogram.
    * Always 8 bins, normalized.
    */
  def decodeFeatures(mediaType: String, payload: Array[Byte]): Array[Float] =
    mediaType match {
      case "image" =>
        val (_, _, px) = Codecs.decodeGray(payload)
        Codecs.lumaHistogram(px)
      case "audio" =>
        Codecs.amplitudeHistogram(Codecs.decodeWav(payload))
      case _ =>
        val frames = Codecs.unpackFrames(payload)
        require(frames.nonEmpty, "video payload has no frames")
        val (_, _, px) = Codecs.decodeGray(frames(0))
        Codecs.lumaHistogram(px)
    }

  /** The m01 decode kernel alone: one (doc_id, media_type, n_bytes,
    * feat) row per media payload — shared by the m01 rollup and its
    * oracle side-table (which persists the kernel output so DuckDB
    * independently replays the distributed per-type aggregation).
    */
  def m01FeaturesOver(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup amortizes here (ImageIO/AudioSystem
        // are static, so setup cost is class-loading, once per executor)
        rows.map { case (id, mt, payload) =>
          MediaFeatures(id, mt, payload.length.toLong, decodeFeatures(mt, payload))
        }
      }
      .toDF()
  }

  /** m01 oracle side-table: feat0 persisted AS the DECIMAL(18,9) the
    * rollup averages — the quantization happens once, engine-side, so
    * the replay has no float→decimal cast-parity surface at all.
    */
  def m01AuxFeatures(spark: SparkSession, dir: String): DataFrame =
    m01FeaturesOver(mediaTable(spark, dir))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        element_at(col("feat"), 1).cast("decimal(18,9)").as("s9"))

  /** m01: decode + feature-extract over the media table, then a
    * per-media-type rollup. The mapPartitions stage is the batch-UDF
    * pattern: one decoder instantiation per partition, streaming
    * iterator in/out (no materialized partition copies).
    */
  def m01Multimodal(spark: SparkSession, dir: String): DataFrame = {
    m01FeaturesOver(mediaTable(spark, dir))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        // decimal fixed-point before avg: float partial sums would be
        // partition-order dependent (SURVEY.md §4)
        round(avg(element_at(col("feat"), 1).cast("decimal(18,9)"))
          .cast("double"), 4).as("avg_feat0"))
      .orderBy("media_type")
  }

  /** One sampled, resized frame of a video payload. */
  final case class FrameFeatures(
      doc_id: Long, frame_idx: Int, n_frames: Int, resized: Array[Float])

  /** The m02 decode kernel: every `stride`-th frame's resized grid.
    * Exposed so the oracle side-table can persist the stride=1
    * superset and DuckDB replay the stride SELECTION plus the feature
    * extraction downstream.
    */
  def frameFeaturesOver(videos: DataFrame, stride: Int,
      outRes: Int): DataFrame = {
    require(stride > 0 && outRes > 0, "stride/outRes must be positive")
    val spark = videos.sparkSession
    import spark.implicits._
    videos
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val frames = Codecs.unpackFrames(payload)
          (0 until frames.length by stride).iterator.map { f =>
            val (w, h, px) = Codecs.decodeGray(frames(f))
            FrameFeatures(id, f, frames.length, Codecs.blockResize(w, h, px, outRes))
          }
        }
      }
      .toDF()
  }

  /** m02 oracle side-table: ALL frames' resized grids (stride=1 is a
    * superset of every stride's pick, so the oracle proves the
    * sampling selected exactly the right frames — none extra, none
    * missing — and re-derives feat0 from the raw grid).
    */
  def m02AuxFrames(spark: SparkSession, dir: String): DataFrame =
    frameFeaturesOver(
      mediaTable(spark, dir, only = Some("video"))
        .filter(col("media_type") === "video"),
      stride = 1, outRes = 4)

  /** m02: frame-sample + resize over video payloads. The container is
    * parsed executor-side, every `stride`-th frame is PNG-decoded with
    * ImageIO and block-averaged to an outRes×outRes grid. The
    * flatMap-shaped mapPartitions (one input row → few frame rows) is
    * the batch contract a codec-backed sampler keeps: per-partition
    * decoder amortization, streaming iterators, no driver involvement,
    * output partitioning inherited from the input so a downstream
    * per-doc groupBy needs no extra shuffle beyond the agg's own.
    */
  def m02FrameSample(spark: SparkSession, dir: String,
      stride: Int = 2, outRes: Int = 4): DataFrame = {
    frameFeaturesOver(
      mediaTable(spark, dir, only = Some("video"))
        .filter(col("media_type") === "video"),
      stride, outRes)
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        round(element_at(col("resized"), 1).cast("double"), 4).as("feat0"))
      .orderBy("doc_id", "frame_idx")
  }

  /** One audio analysis window. */
  final case class AudioWindow(
      doc_id: Long, win_idx: Int, n_windows: Int, energy: Double)

  /** m03: overlapping-window audio featurization — the spectrogram-
    * frame contract: the WAV payload is parsed to PCM samples with
    * AudioSystem, then windows of `windowSamples` advance by
    * `hopSamples` (overlapping when hop < window, the standard STFT
    * shape), each yielding one normalized-RMS energy row. Same batch
    * discipline as m01/m02: flatMap-shaped mapPartitions, streaming
    * iterators, no driver hop; the ~len/hop× row expansion happens
    * executor-side and flows straight into whatever aggregation
    * follows.
    */
  def m03AudioWindows(spark: SparkSession, dir: String,
      windowSamples: Int = 256, hopSamples: Int = 128): DataFrame = {
    require(hopSamples > 0 && windowSamples > 0, "window/hop must be positive")
    import spark.implicits._
    mediaTable(spark, dir, only = Some("audio"))
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val samples = Codecs.decodeWav(payload)
          // an empty stream has ZERO windows (no phantom silent frame
          // skewing downstream energy aggregates)
          val starts = 0 until samples.length by hopSamples
          val n = starts.length
          starts.iterator.zipWithIndex.map { case (start, w) =>
            val until = math.min(start + windowSamples, samples.length)
            AudioWindow(id, w, n, Codecs.rms(samples, start, until))
          }
        }
      }
      .toDF()
      .select(col("doc_id"), col("win_idx"), col("n_windows"),
        round(col("energy"), 4).as("energy"))
      .orderBy("doc_id", "win_idx")
  }

  /** m03 oracle side-table: the decoded PCM streams themselves. The
    * windowing, the RMS and the rounding all replay in SQL — and the
    * Σv² accumulation is EXACT in both engines (each v² = s²/2³⁰ is a
    * dyadic rational ≤ 1; 256 of them need 38 bits — no float-order
    * surface), so the only persisted artifact is the WAV parse.
    */
  def m03AuxPcm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir, only = Some("audio"))
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows =>
        rows.map { case (id, p) => (id, Codecs.decodeWav(p)) })
      .toDF("doc_id", "samples")
  }

  // ---------------------------------------------------------------- m04

  /** 64-bit average-hash (the public aHash perceptual fingerprint) of
    * a decoded grayscale image: block-average to an 8×8 grid, bit i =
    * cell i brighter than the grid mean. Invariant to uniform
    * brightness shifts (p + c > mean + c ⇔ p > mean) and, via the
    * block resize, to scaling — the properties that make it a NEAR-dup
    * signature where a byte hash (d01) sees nothing. Fixed-order
    * arithmetic over 64 cells: bit-identical on every executor.
    */
  def aHash64(w: Int, h: Int, pixels: Array[Int]): Long = {
    val grid = Codecs.blockResize(w, h, pixels, 8)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += grid(i); i += 1 }
    mean /= 64.0
    var bits = 0L
    i = 0
    while (i < 64) { if (grid(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Perceptual-hash pair record. */
  final case class PhashSig(doc_id: Long, ah64: Long)

  /** m04: image near-dup pairs over any (doc_id, payload) frame of
    * encoded images — the dedup family (d01–d10) extended to the
    * multimodal columns. Decode + hash is one mapPartitions batch pass
    * (8 bytes out per image, whatever the payload size); candidate
    * generation is d03's pigeonhole-exact banding on the aHash — 4×16
    * bit bands, at least one band survives ≤ 3 flipped bits — so the
    * self-join shuffles 8-byte signatures, never pixels, and no pair
    * outside a shared band is ever scored. At 100 TB: one decode pass
    * over `binaryFile` payloads, one band shuffle of n×4 16-byte rows.
    */
  /** (doc_id, ah64) aHash signatures of an image frame — shared by the
    * m04 pair join and its oracle side-table.
    */
  def m04Sigs(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, png) =>
          val (w, h, px) = Codecs.decodeGray(png)
          PhashSig(id, aHash64(w, h, px))
        }
      }
      .toDF()
  }

  /** Shared banded-Hamming pair join — the ONE template all four
    * perceptual-signature dedups (m04 aHash, m06 dHash, m08 audio,
    * m16 DCT) instantiate, mirroring the oracle side's single
    * `bandedHammingSql` helper: explode 4 `bandBits`-wide bands of
    * `sigCol`, self-join on (band, hash), verify by xor/popcount —
    * pigeonhole-exact for Hamming ≤ 3 within the banded bits. The
    * signature frame is checkpointed once, so the decode+hash
    * pipeline feeds BOTH join sides from one pass.
    */
  def bandedPairsOver(sigs0: DataFrame, sigCol: String, bandBits: Int,
      maxHamming: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    val sigs = sigs0.localCheckpoint(false)
    val bnd = sigs.select(col("doc_id"), col(sigCol), explode(
      transform(sequence(lit(0), lit(3)), j => struct(j.as("band"),
        call_function("shiftright", col(sigCol), j * lit(bandBits))
          .bitwiseAND(lit(mask)).as("bh"))))
      .as("bk"))
      .select(col("doc_id"), col(sigCol), col("bk.band"), col("bk.bh"))
    bnd.as("x").join(bnd.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col(s"x.$sigCol").bitwiseXOR(col(s"y.$sigCol")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  def m04PhashPairsOver(images: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedPairsOver(m04Sigs(images), "ah64", 16, maxHamming)

  // ---------------------------------------------------------------- m16

  /** 8-point DCT-II basis, cos((2x+1)·u·π/16) — StrictMath on fixed
    * arguments, one table per JVM, bit-identical everywhere.
    */
  private val DctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) =>
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0))

  /** 64-bit DCT perceptual hash (the public pHash construction):
    * block-resize to 8×8, unnormalized 2D DCT-II in a fixed fold
    * order, bit i = coefficient i above the MEDIAN of the 63 non-DC
    * coefficients (DC excluded and its bit left 0). The frequency-
    * domain sibling of aHash (m04) and dHash (m06): thresholding
    * against the median of spectral coefficients is EXACTLY invariant
    * under contrast scaling (all coefficients and the median scale
    * together — doubling is even IEEE-exact) and insensitive to
    * uniform brightness shifts (only the excluded DC moves, up to the
    * ~1e-16 cos-row residue), while localized pixel damage spreads
    * thinly across the spectrum instead of flipping whole cells.
    * Fixed-order arithmetic: bit-identical on every executor.
    */
  def dctPhash64(w: Int, h: Int, pixels: Array[Int]): Long = {
    val g = Codecs.blockResize(w, h, pixels, 8)
    val f = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            acc += g(y * 8 + x).toDouble * DctCos(u)(x) * DctCos(v)(y)
            y += 1
          }
          x += 1
        }
        f(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val nonDc = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(nonDc)
    val med = nonDc(31)
    var bits = 0L
    var i = 1
    while (i < 64) { if (f(i) > med) bits |= (1L << i); i += 1 }
    bits
  }

  /** (doc_id, ph64) DCT-hash signatures of an image frame — shared by
    * the m16 pair join and its oracle side-table.
    */
  def m16Sigs(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, png) =>
          val (w, h, px) = Codecs.decodeGray(png)
          (id, dctPhash64(w, h, px))
        }
      }
      .toDF("doc_id", "ph64")
  }

  /** m16: DCT-hash near-dup pairs — the shared [[bandedPairsOver]]
    * template (4×16-bit bands, pigeonhole-exact for Hamming ≤ 3) on
    * the spectral signature. Signatures shuffle, pixels never do.
    */
  def m16DctPairsOver(images: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedPairsOver(m16Sigs(images), "ph64", 16, maxHamming)

  /** m16 driver query: spectral near-dup pairs over the SAME planted
    * corpus m04 hashes — the three perceptual signatures (aHash m04,
    * dHash m06, DCT m16) are deliberately comparable side by side.
    */
  def m16DctDedup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    m16DctPairsOver(plantedImageCorpus(spark, dir), maxHamming)

  /** m16 oracle side-table: the planted corpus's DCT signatures. */
  def m16AuxSigs(spark: SparkSession, dir: String): DataFrame =
    m16Sigs(plantedImageCorpus(spark, dir))

  /** splitmix64 finalizer — the public 64-bit mixer. m04's demo needs
    * it because [[pixel]] is LINEAR in the seed: two nearby ids give
    * uniformly-shifted images, which aHash (correctly) calls
    * near-identical — every id pair would be a "near-dup". Decorrelated
    * noise makes the planted pairs the only signal.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** An 8×8 PNG of id-seeded DECORRELATED noise (per-pixel mixed). */
  def synthImageNoise(seed: Long): Array[Byte] = {
    val px = Array.tabulate(ImgRes * ImgRes)(i =>
      (mix64(seed * 64 + i) & 0xffL).toInt)
    Codecs.encodePng(ImgRes, ImgRes, px)
  }

  /** A brightness-shifted, lightly-damaged copy of [[synthImageNoise]]:
    * +10 brightness (clamped at white) and two pixels blown out —
    * what a re-encode/re-upload of the same picture looks like. */
  def synthImageVariant(seed: Long): Array[Byte] = {
    val px = Array.tabulate(ImgRes * ImgRes) { i =>
      val p = math.min(255, (mix64(seed * 64 + i) & 0xffL).toInt + 10)
      if (i == 5 || i == 42) 255 else p
    }
    Codecs.encodePng(ImgRes, ImgRes, px)
  }

  /** The planted image corpus: a noise PNG per image-typed doc, plus a
    * [[synthImageVariant]] copy (id + 1e6) for every 30th doc_id. The
    * base hashes are mutually random (P[Hamming ≤ 3] ≈ 2⁻⁴⁸ per pair),
    * so the only sub-`maxHamming` pairs are the planted copies — the
    * spec recomputes the exact expected set locally.
    */
  def plantedImageCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).transform(spreadIds).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val orig = (id, synthImageNoise(id))
          if (id % 30 == 0) Iterator(orig, (id + 1000000L, synthImageVariant(id)))
          else Iterator(orig)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** m04 driver query: perceptual near-dup pairs over the planted
    * image corpus — expected output is exactly the planted pairs whose
    * aHash Hamming distance clears `maxHamming` (spec-asserted
    * pair-for-pair against locally recomputed hashes).
    */
  def m04PhashDedup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    m04PhashPairsOver(plantedImageCorpus(spark, dir), maxHamming)

  // ---------------------------------------------------------------- m08

  /** 64-bit audio fingerprint over a decoded PCM stream — the
    * chromaprint-style construction from public descriptions: bits
    * encode the SIGN of energy transitions between consecutive
    * overlapping RMS windows (m03's frame contract), folded into 64
    * slots by majority vote (first-transition tie-break, so even-vote
    * slots stay unbiased) so any duration hashes to the same width.
    * Uniform gain scales every window's RMS equally, preserving each
    * comparison — a volume-normalized remaster fingerprints
    * identically up to rounding; re-encode dither flips only
    * near-tie transitions, which banding absorbs. Meaningful when the
    * stream spans ≳ 64 transitions (the chromaprint minimum-duration
    * caveat); shorter streams leave high slots at zero. Fixed
    * iteration order: bit-identical on every executor.
    */
  def audioFingerprint64(samples: Array[Short],
      windowSamples: Int = 256, hopSamples: Int = 128): Long = {
    val starts = (0 until samples.length by hopSamples).toArray
    val up = new Array[Int](64)
    val dn = new Array[Int](64)
    // first observed transition sign per slot — the DEBIASING
    // tie-break. A slot with an EVEN vote count ties with probability
    // 1/2 on random audio, and a tie→0 rule makes those bits
    // Bernoulli(1/4): unrelated clips then agree per bit with
    // probability 5/8, a 16-bit band collides at (5/8)^16 ≈ 1/1850
    // instead of 2^-16, and candidate volume goes quadratic ~35×
    // early (the measured 3.8× wall blowup at 10× data). Breaking
    // ties by the slot's first transition sign restores
    // Bernoulli(1/2) on every voted slot — and keeps gain
    // invariance, since uniform gain preserves every comparison the
    // tie-break reads.
    val first = new Array[Byte](64)
    var i = 0
    while (i + 1 < starts.length) {
      val e1 = Codecs.rms(samples, starts(i),
        math.min(starts(i) + windowSamples, samples.length))
      val e2 = Codecs.rms(samples, starts(i + 1),
        math.min(starts(i + 1) + windowSamples, samples.length))
      val j = i % 64
      if (e2 > e1) {
        if (first(j) == 0) first(j) = 1
        up(j) += 1
      } else {
        if (first(j) == 0) first(j) = -1
        dn(j) += 1
      }
      i += 1
    }
    var bits = 0L
    var j = 0
    while (j < 64) {
      if (up(j) > dn(j) || (up(j) == dn(j) && first(j) > 0)) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** [[audioFingerprint64]] straight off a WAV payload (the form specs
    * and callers with encoded bytes use).
    */
  def audioFingerprint64Wav(payload: Array[Byte],
      windowSamples: Int = 256, hopSamples: Int = 128): Long =
    audioFingerprint64(Codecs.decodeWav(payload), windowSamples, hopSamples)

  /** Audio-fingerprint signature record. */
  final case class AfpSig(doc_id: Long, af64: Long)

  /** m08: audio near-dup pairs over any (doc_id, payload) frame of WAV
    * audio — the dedup family extended to the audio modality, closing
    * the m04/m06 pattern: decode + fingerprint is one mapPartitions
    * batch pass (8 bytes out per clip, whatever the payload size);
    * candidate generation is d03's pigeonhole-exact banding (4×16-bit
    * bands — ≤ 3 flipped bits always leave one band intact), so the
    * self-join shuffles 8-byte signatures, never PCM. At 100 TB: one
    * decode pass over `binaryFile` payloads, one band shuffle of n×4
    * short rows.
    */
  /** (doc_id, af64) audio fingerprints of a WAV frame — shared by the
    * m08 pair join and its oracle side-table.
    */
  def m08Sigs(audio: DataFrame,
      windowSamples: Int = 256, hopSamples: Int = 128): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, wav) =>
          AfpSig(id, audioFingerprint64Wav(wav, windowSamples, hopSamples))
        }
      }
      .toDF()
  }

  def m08AudioPairsOver(audio: DataFrame, maxHamming: Int = 3,
      windowSamples: Int = 256, hopSamples: Int = 128): DataFrame =
    bandedPairsOver(m08Sigs(audio, windowSamples, hopSamples),
      "af64", 16, maxHamming)

  /** The audio demo needs ~64+ windows and DECORRELATED energies:
    * [[synthWav]]'s pure tones are near-constant-RMS (transition signs
    * ride numeric wiggle and would correlate across docs — the m04
    * linear-pixel lesson, audio edition), and its clips are too short
    * to populate the fold. Per-sample mixed noise gives every window
    * an independent energy, so base fingerprints are mutually random.
    */
  def synthWavNoise(seed: Long, nSamples: Int = 256 * 70): Array[Byte] =
    Codecs.encodeWav(Array.tabulate(nSamples)(i =>
      ((mix64(seed * 131071 + i) & 0x3fffL) - 8192L).toShort))

  /** A volume-normalized remaster of [[synthWavNoise]]: every sample
    * scaled ×0.8 and rounded — RMS comparisons are gain-invariant, so
    * the fingerprint survives up to rounding-induced near-tie flips.
    */
  def synthWavGain(seed: Long, nSamples: Int = 256 * 70): Array[Byte] =
    Codecs.encodeWav(Array.tabulate(nSamples)(i =>
      math.round(((mix64(seed * 131071 + i) & 0x3fffL) - 8192L)
        * 0.8).toShort))

  /** A lossy re-encode of [[synthWavNoise]]: deterministic ±2 LSB
    * dither per sample — the quantization-noise class a codec round
    * trip adds, tiny against the window-to-window energy spread.
    */
  def synthWavReencode(seed: Long, nSamples: Int = 256 * 70): Array[Byte] =
    Codecs.encodeWav(Array.tabulate(nSamples)(i =>
      (((mix64(seed * 131071 + i) & 0x3fffL) - 8192L) +
        ((mix64(seed * 977 + i) % 5L) - 2L)).toShort))

  /** The planted audio corpus: a noise clip per audio-typed doc, plus
    * for every 30th doc_id ONE variant copy (id + 1e6) — alternating
    * gain-shifted and re-encoded so both damage classes are exercised
    * without variant-variant pairs muddying the expected set. Base
    * fingerprints are mutually random (P[Hamming ≤ 3] ≈ 2⁻⁴⁸ per
    * pair), so the only sub-threshold pairs are the planted copies.
    */
  def plantedAudioCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).transform(spreadIds).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val orig = (id, synthWavNoise(id))
          // audio ids are ≡ 1 (mod 3); every 30th of them (≡ 1 mod 30)
          // gets its variant, type alternating on the 60-cycle
          if (id % 30 == 1) {
            val variant = if (id % 60 == 1) synthWavGain(id)
            else synthWavReencode(id)
            Iterator(orig, (id + 1000000L, variant))
          } else Iterator(orig)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** m08 driver query: audio near-dup pairs over the planted corpus —
    * expected output is exactly the planted (id, id+1e6) pairs whose
    * fingerprint Hamming distance clears `maxHamming` (spec-asserted
    * pair-for-pair against locally recomputed fingerprints).
    */
  def m08AudioDedup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    m08AudioPairsOver(plantedAudioCorpus(spark, dir), maxHamming)

  // ---------------------------------------------------------------- m06

  /** 64-bit difference-hash (the public dHash perceptual fingerprint):
    * block-average to an 8×8 grid, bit (y,x) set iff cell (y,x) is
    * darker than its right neighbor — 56 horizontal-gradient bits
    * (top 8 bits zero). Where aHash compares every cell against the
    * GLOBAL mean (invariant only to affine tone changes — the mean
    * moves with the curve), dHash encodes local gradient ORDER, so it
    * survives any monotone tone curve: gamma, contrast S-curves,
    * histogram stretch — the re-grade/re-encode class aHash
    * misclassifies. Fixed-order arithmetic over the grid:
    * bit-identical on every executor.
    */
  def dHash64(w: Int, h: Int, pixels: Array[Int]): Long = {
    val g = Codecs.blockResize(w, h, pixels, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (g(y * 8 + x) < g(y * 8 + x + 1)) bits |= (1L << (y * 7 + x))
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Difference-hash signature record. */
  final case class DhashSig(doc_id: Long, dh64: Long)

  /** m06: gradient-hash image near-dup pairs — m04's banding scheme
    * re-cut for the 56-bit dHash: decode + hash in one mapPartitions
    * batch pass (8 bytes out per image), then 4 bands × 14 bits —
    * pigeonhole-exact, ≤ `maxHamming` = 3 flipped bits always leave
    * one band intact — so the self-join shuffles 8-byte signatures,
    * never pixels. Same 100 TB shape as m04: one decode pass, one
    * band shuffle of n×4 short rows.
    */
  /** (doc_id, dh64) dHash signatures of an image frame — shared by the
    * m06 pair join and its oracle side-table.
    */
  def m06Sigs(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, png) =>
          val (w, h, px) = Codecs.decodeGray(png)
          DhashSig(id, dHash64(w, h, px))
        }
      }
      .toDF()
  }

  def m06DhashPairsOver(images: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedPairsOver(m06Sigs(images), "dh64", 14, maxHamming)

  /** Monotone NON-affine tone curve: tone(p) = p·(p+255)/510 — a
    * gamma-style darkening (0→0, 255→255, convex in between) that
    * preserves neighbor order up to integer-floor collapses at the
    * dark end, but moves cells across the global mean. A re-graded
    * copy therefore keeps its dHash (gradient order survives) while
    * its aHash drifts (mean-relative bits flip) — exactly the pair
    * class m06 exists for.
    */
  def synthImageTone(seed: Long): Array[Byte] = {
    val px = Array.tabulate(ImgRes * ImgRes) { i =>
      val p = (mix64(seed * 64 + i) & 0xffL).toInt
      (p * (p + 255)) / 510
    }
    Codecs.encodePng(ImgRes, ImgRes, px)
  }

  /** The m06 planted corpus: the same decorrelated-noise base as m04,
    * but every 30th image's copy is TONE-MAPPED ([[synthImageTone]]),
    * not brightness-shifted — the monotone-regrade near-dup class.
    */
  def plantedToneCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).transform(spreadIds).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val orig = (id, synthImageNoise(id))
          if (id % 30 == 0) Iterator(orig, (id + 1000000L, synthImageTone(id)))
          else Iterator(orig)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** m06 driver query: gradient-hash near-dup pairs over the planted
    * tone-mapped corpus (spec-asserted pair-for-pair against locally
    * recomputed hashes, plus the aHash-misses-what-dHash-catches
    * differentiator).
    */
  def m06DhashDedup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    m06DhashPairsOver(plantedToneCorpus(spark, dir), maxHamming)

  // ---------------------------------------------------------------- m07

  /** Shot-structured synthetic video: shots of identical frames, one
    * decorrelated noise image per shot (splitmix per-element, the m04
    * lesson). Closed form for the m07 spec: consecutive-frame delta
    * is exactly 0 inside a shot and decorrelated-noise-large (E|Δ| ≈
    * 85) at exactly the shot boundaries.
    */
  def synthShotVideo(seed: Long): Array[Byte] = {
    val nShots = 2 + (seed % 3).toInt
    val shotLen = 2 + (seed % 2).toInt
    Codecs.packFrames((0 until nShots).flatMap { s =>
      val px = Array.tabulate(ImgRes * ImgRes)(i =>
        (mix64(seed * 1024 + s * 64 + i) & 0xffL).toInt)
      val png = Codecs.encodePng(ImgRes, ImgRes, px)
      Seq.fill(shotLen)(png)
    })
  }

  /** One consecutive-frame comparison. */
  final case class FrameDelta(
      doc_id: Long, frame_idx: Int, n_frames: Int, delta: Double)

  /** m07: shot-boundary (scene-cut) detection over the frame
    * container — the segmentation primitive that belongs BEFORE m02's
    * stride sampling (sample per SCENE and long static shots stop
    * dominating the sample set; every public frame pipeline cuts
    * first). Per consecutive frame pair: mean absolute difference on
    * the 8×8 block grid — resolution-independent (64 subtractions per
    * pair whatever the frame size) and decode-once (each frame's grid
    * is computed once and carried to the next comparison). Emits one
    * row per pair (frame_idx ≥ 1 compares frame_idx−1 → frame_idx)
    * with the boundary verdict and the frame's scene index (running
    * boundary count — a per-video window, bounded by frames-per-video
    * by construction). Same mapPartitions batch contract as m01–m03:
    * pixels never shuffle, 20-byte rows do.
    */
  def sceneDetectOver(videos: DataFrame, threshold: Double = 30.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frameDeltasOver(videos)
      .withColumn("boundary", col("delta") >= threshold)
      .withColumn("scene_idx",
        sum(col("boundary").cast("long")).over(w))
      .orderBy("doc_id", "frame_idx")
  }

  /** The m07 decode kernel alone: per consecutive-frame pair one
    * (doc_id, frame_idx, n_frames, delta) row, delta already 4-dp
    * rounded (the value the boundary verdict tests). Split out so the
    * m07/m10 oracle side-table persists exactly the kernel output and
    * DuckDB independently replays everything downstream — the
    * boundary threshold, the running scene index, and m10's per-scene
    * rollup.
    */
  def frameDeltasOver(videos: DataFrame): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val frames = Codecs.unpackFrames(payload)
          var prev: Array[Float] = null
          frames.iterator.zipWithIndex.map { case (png, f) =>
            val (w, h, px) = Codecs.decodeGray(png)
            val g = Codecs.blockResize(w, h, px, 8)
            val out =
              if (f == 0) None
              else {
                var s = 0.0
                var i = 0
                while (i < 64) { s += math.abs(g(i) - prev(i)); i += 1 }
                Some(FrameDelta(id, f, frames.length, s / 64.0))
              }
            prev = g
            out
          }.flatten
        }
      }
      .toDF()
      .withColumn("delta", round(col("delta"), 4))
  }

  /** m07/m10 oracle side-table: the planted-corpus frame deltas. */
  def m07AuxDeltas(spark: SparkSession, dir: String): DataFrame =
    frameDeltasOver(plantedShotCorpus(spark, dir))

  /** m07 planted corpus: a shot-structured video per fifth document. */
  def plantedShotCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id")).transform(spreadIds).as[Long]
      .mapPartitions(ids => ids.map(id => (id, synthShotVideo(id))))
      .toDF("doc_id", "payload")
  }

  /** m07 driver query: scene cuts over the planted shot corpus —
    * boundaries land exactly at the planted shot edges (spec pins the
    * closed form per video).
    */
  def m07SceneDetect(spark: SparkSession, dir: String,
      threshold: Double = 30.0): DataFrame =
    sceneDetectOver(plantedShotCorpus(spark, dir), threshold)

  // ---------------------------------------------------------------- m10

  /** m10: scene-aware keyframe sampling — the composition m07 exists
    * for (its docstring: segment BEFORE m02's stride sampling, so
    * long static shots stop dominating the sample): one
    * representative frame per detected scene — the scene's MIDDLE
    * frame, the deterministic pick that never lands on the
    * boundary-adjacent transition frames. Built entirely on m07's
    * delta rows: per (video, scene) the span is an aggregate of the
    * 20-byte delta rows (bounded by frames-per-video) — the pixels
    * were decoded ONCE in m07's pass and never again. A video with
    * fewer than 2 frames yields no scenes (m07's own contract).
    * At 100 TB: one decode pass + one (doc_id, scene) rollup; the
    * keyframe table is what m02's downstream feature extraction
    * reads INSTEAD of every nth frame.
    */
  def m10KeyframesOver(videos: DataFrame,
      threshold: Double = 30.0): DataFrame =
    sceneDetectOver(videos, threshold)
      .groupBy(col("doc_id"), col("scene_idx"))
      .agg(min(col("frame_idx")).as("first_row"),
        max(col("frame_idx")).as("f_end"),
        first(col("n_frames")).as("n_frames"))
      // scene 0 starts at frame 0, which has no delta row by
      // construction (nothing precedes it); every later scene starts
      // at its boundary frame = the scene's min delta row
      .withColumn("f_start",
        when(col("scene_idx") === 0, lit(0)).otherwise(col("first_row")))
      .withColumn("n_scene_frames", col("f_end") - col("f_start") + 1)
      .withColumn("keyframe_idx",
        col("f_start") + expr("(n_scene_frames - 1) div 2"))
      .select("doc_id", "scene_idx", "f_start", "n_scene_frames",
        "keyframe_idx")
      .orderBy("doc_id", "scene_idx")

  /** m10 driver query over m07's planted shot corpus — closed form:
    * video id has 2+(id%3) shots of length 2+(id%2), so scene s
    * spans [s·len, (s+1)·len) and the keyframe is s·len+(len−1)/2.
    */
  def m10KeyframeSample(spark: SparkSession, dir: String,
      threshold: Double = 30.0): DataFrame =
    m10KeyframesOver(plantedShotCorpus(spark, dir), threshold)

  // ---------------------------------------------------------------- m09

  /** Fully-decorrelated noise video for the m09 demo: every frame its
    * own splitmix-mixed noise image (per-element mixing — the m04
    * lesson), 6–10 frames, so frame hashes are mutually random across
    * frames AND videos and the only sub-threshold video pairs are the
    * planted copies.
    */
  def synthNoiseVideo(seed: Long): Array[Byte] =
    Codecs.packFrames((0 until noiseVideoFrames(seed)).map(f =>
      Codecs.encodePng(ImgRes, ImgRes, noiseVideoFrame(seed, f))))

  private def noiseVideoFrames(seed: Long): Int =
    6 + java.lang.Math.floorMod(mix64(seed), 5L).toInt

  private def noiseVideoFrame(seed: Long, f: Int): Array[Int] =
    Array.tabulate(ImgRes * ImgRes)(i =>
      (mix64(seed * 8191 + f * 64 + i) & 0xffL).toInt)

  /** A lossy re-encode of [[synthNoiseVideo]]: deterministic ±1 LSB
    * dither per pixel — the codec-round-trip damage class. Each frame's
    * dHash drifts a few bits (a bit flips only when a neighbor-pixel
    * gap is smaller than the dither), staying within the pigeonhole
    * tolerance for nearly every frame.
    */
  def synthVideoReencode(seed: Long): Array[Byte] =
    Codecs.packFrames((0 until noiseVideoFrames(seed)).map { f =>
      val px = noiseVideoFrame(seed, f).zipWithIndex.map { case (p, i) =>
        val d = java.lang.Math.floorMod(mix64(seed * 6553 + f * 64 + i), 3L).toInt - 1
        math.max(0, math.min(255, p + d))
      }
      Codecs.encodePng(ImgRes, ImgRes, px)
    })

  /** A trimmed copy of [[synthNoiseVideo]]: the first two frames cut —
    * the clip/excerpt damage class. Its frame-hash set is a strict
    * subset of the original's, so containment on the shorter side is
    * exactly 1.
    */
  def synthVideoTrim(seed: Long): Array[Byte] =
    Codecs.packFrames((2 until noiseVideoFrames(seed)).map(f =>
      Codecs.encodePng(ImgRes, ImgRes, noiseVideoFrame(seed, f))))

  /** Distinct, sorted per-frame dHashes of a frame container — the
    * video's temporal signature set (decode once; 8 bytes per distinct
    * frame out, whatever the payload size).
    */
  def videoFrameHashes(payload: Array[Byte]): Array[Long] =
    Codecs.unpackFrames(payload).iterator.map { png =>
      val (w, h, px) = Codecs.decodeGray(png)
      dHash64(w, h, px)
    }.toArray.distinct.sorted

  /** Video frame-hash-set signature record. */
  final case class VideoSig(doc_id: Long, fhs: Array[Long])

  /** m09: video near-dup pairs — the dedup axis closed over the video
    * modality (m04/m06 images, m08 audio): each video's signature is
    * its SET of per-frame dHashes (bag-of-perceptual-hashes, the
    * public video-copy-detection construction), candidate pairs come
    * from d03's pigeonhole banding applied per frame hash (4×14-bit
    * bands — two videos pair when ANY frame pair shares a band, so a
    * ≤ `maxHamming`-bit re-encode drift always still pairs), and the
    * verify is a CONTAINMENT match: the fraction of the shorter
    * video's frames with a ≤ `maxHamming` Hamming match in the other —
    * robust to both re-encode dither (per-frame drift) and trimming
    * (the surviving frames all match, shorter-side fraction stays 1).
    * The match loop is codegen'd higher-order `exists`/`aggregate`
    * over the carried hash arrays (frames-per-video is bounded, the
    * m07 argument, so arrays are KBs). At 100 TB: one decode pass,
    * one band shuffle of n×frames×4 short rows, verify work bounded
    * by collisions × frames² — pixels never shuffle.
    */
  /** (doc_id, fhs) per-video frame-hash sets — shared by the m09 pair
    * join and its oracle side-table.
    */
  def m09Sigs(videos: DataFrame): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, v) => VideoSig(id, videoFrameHashes(v)) }
      }
      .toDF()
  }

  def m09VideoPairsOver(videos: DataFrame, maxHamming: Int = 3,
      minMatchFrac: Double = 0.5): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    // lazy localCheckpoint: the signature pass (the decode) runs once,
    // not once per side of the candidate join + once per verify side
    val sigs = m09Sigs(videos).localCheckpoint(false)
    val fh = sigs.select(col("doc_id"), explode(col("fhs")).as("fh"))
    val bnd = fh.select(col("doc_id"), explode(
      transform(sequence(lit(0), lit(3)), j => struct(j.as("band"),
        call_function("shiftright", col("fh"), j * lit(14))
          .bitwiseAND(lit(0x3FFFL)).as("bh"))))
      .as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
    val cand = bnd.as("x").join(bnd.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    def matchedIn(as: Column, bs: Column): Column =
      aggregate(as, lit(0), (acc, x) => acc +
        when(exists(bs, y =>
          bit_count(x.bitwiseXOR(y)) <= lit(maxHamming)), 1).otherwise(0))
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("fhs").as("fhs_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("fhs").as("fhs_b")), "doc_b")
      .withColumn("n_a", size(col("fhs_a")).cast("long"))
      .withColumn("n_b", size(col("fhs_b")).cast("long"))
      .withColumn("match_frac", round(greatest(
        matchedIn(col("fhs_a"), col("fhs_b")).cast("double") / col("n_a"),
        matchedIn(col("fhs_b"), col("fhs_a")).cast("double") / col("n_b")), 4))
      .filter(col("match_frac") >= minMatchFrac)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("match_frac"))
      .orderBy("doc_a", "doc_b")
  }

  /** The planted video corpus: a decorrelated-noise video per
    * video-typed doc, plus for every 30th doc_id ONE variant copy
    * (id + 1e6) — alternating re-encode-dithered and trimmed so both
    * damage classes are exercised without variant-variant pairs.
    */
  def plantedVideoCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .filter(col("doc_id") % 5 === 2)
      .select(col("doc_id")).transform(spreadIds).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val orig = (id, synthNoiseVideo(id))
          if (id % 30 == 2) {
            val variant = if (id % 60 == 2) synthVideoReencode(id)
            else synthVideoTrim(id)
            Iterator(orig, (id + 1000000L, variant))
          } else Iterator(orig)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** m09 driver query: video near-dup pairs over the planted corpus —
    * expected output is exactly the planted (id, id+1e6) pairs whose
    * frame-containment clears `minMatchFrac` (spec-asserted
    * pair-for-pair against locally recomputed frame hashes).
    */
  def m09VideoDedup(spark: SparkSession, dir: String,
      maxHamming: Int = 3, minMatchFrac: Double = 0.5): DataFrame =
    m09VideoPairsOver(plantedVideoCorpus(spark, dir), maxHamming, minMatchFrac)

  /** m11: content-type sniffing — the magic-byte router every binary
    * intake runs BEFORE trusting a path extension or an upstream
    * content-type header (public practice: `file`/libmagic semantics;
    * mislabeled media is routed by what its bytes say, not what its
    * name claims). Detects PNG/JPEG/GIF signatures, RIFF/WAVE (outer
    * fourcc + the WAVE form type at offset 8), the m-family's
    * length-prefixed PNG frame container (PNG magic at offset 4), and
    * falls through to `unknown`. Pure codegen'd byte-slice/hex
    * comparisons on the binary column — per-row, shuffle-free except
    * the final small rollup; never decodes a payload.
    */
  def m11TypeSniff(spark: SparkSession, dir: String): DataFrame =
    m11SniffOver(mediaTable(spark, dir))

  /** The sniff verdict of a binary `payload` column. */
  def sniffExpr(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(payload, 1, 4)) === "89504E47", "image/png")
      .when(hex(substring(payload, 1, 3)) === "FFD8FF", "image/jpeg")
      .when(hex(substring(payload, 1, 3)) === "474946", "image/gif")
      .when(hex(substring(payload, 1, 4)) === "52494646" &&
        hex(substring(payload, 9, 4)) === "57415645", "audio/wav")
      .when(hex(substring(payload, 1, 4)) === "52494646", "riff/other")
      .when(hex(substring(payload, 5, 4)) === "89504E47", "video/frames")
      .otherwise("unknown")

  /** m11 rollup over any (media_type, payload, meta) media frame:
    * declared type × sniffed type with file/byte counts — the intake
    * reconciliation report (a non-diagonal row is a mislabel).
    */
  def m11SniffOver(media: DataFrame): DataFrame =
    media
      .select(col("media_type"), sniffExpr(col("payload")).as("sniffed"),
        col("meta.content_length").as("len"))
      .groupBy("media_type", "sniffed")
      .agg(count(lit(1)).as("n_files"),
        sum(col("len")).as("total_bytes"))
      .orderBy("media_type", "sniffed")

  /** m11 oracle side-table: each payload's first 12 bytes as hex +
    * its declared type/length — the codecs aren't SQL, the
    * classification and rollup downstream of the head bytes are.
    */
  def m11AuxHeads(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        hex(substring(col("payload"), 1, 12)).as("head_hex"),
        col("media_type"),
        col("meta.content_length").as("len"))

  // ---- m14: audio downsampling ----

  /** m14: audio downsampling — 2× PCM decimation with pair
    * averaging, the sample-rate normalization every audio-training
    * pipeline runs at intake (training sample rates are fixed;
    * crawled audio is decoded, resampled, re-encoded once — m13's
    * rationale on the audio axis). Kernel is [[Codecs.decimatePcm]]
    * (floor-mean, exact integer); the decimated clip is re-encoded
    * as a canonical half-rate WAV (the encode leg is real), and the
    * driver row reports exact-integer evidence of the result —
    * counts, Σ|v|, Σv², min/max — every one replayable in SQL from
    * the m03 PCM side-table.
    *
    * Scale: decode + decimate + re-encode per-row inside one
    * mapPartitions batch; only the slim per-doc summary ever
    * shuffles.
    */
  def m14AudioDecimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir, only = Some("audio"))
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, p) =>
          val in = Codecs.decodeWav(p)
          val out = Codecs.decimatePcm(in, 2)
          val wav = Codecs.encodeWav(out, 4000f)
          require(wav.length > 0)
          var sumAbs = 0L; var sumSq = 0L
          var vMin = Long.MaxValue; var vMax = Long.MinValue
          out.foreach { s =>
            val v = s.toLong
            sumAbs += math.abs(v); sumSq += v * v
            if (v < vMin) vMin = v
            if (v > vMax) vMax = v
          }
          // empty-data clips (legal RIFF) must not emit the sentinel
          // extremes as evidence
          if (out.isEmpty) { vMin = 0L; vMax = 0L }
          (id, in.length.toLong, out.length.toLong, sumAbs, sumSq,
            vMin, vMax)
        }
      }
      .toDF("doc_id", "n_in", "n_out", "sum_abs", "sum_sq",
        "v_min", "v_max")
      .orderBy("doc_id")
  }

  // ---- m12: PNG metadata scrub ----

  /** The metadata-bearing demo image: [[synthImage]] with a tEXt
    * (Author → "user<id>") and a tIME chunk spliced after IHDR —
    * deterministic stand-ins for the EXIF/author/timestamp metadata
    * real crawled images carry (and that a privacy-scrubbing pipeline
    * must remove before training).
    */
  def synthMetaImage(id: Long): Array[Byte] = {
    val base = synthImage(id)
    val text = Codecs.addPngChunk(base, "tEXt",
      s"Author\u0000user$id".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val year = 2020 + (id % 5).toInt
    val time = Array[Byte]((year >> 8).toByte, (year & 0xff).toByte,
      (1 + id % 12).toByte, (1 + id % 28).toByte,
      (id % 24).toByte, (id % 60).toByte, (id % 60).toByte)
    Codecs.addPngChunk(text, "tIME", time)
  }

  /** m12: PNG metadata scrubbing — drop every ancillary chunk
    * (tEXt/zTXt/iTXt/tIME/eXIf carry author, software, GPS and
    * timestamp metadata; the PNG spec's bit-5 critical/ancillary rule
    * classifies them) while keeping the image data byte-identical.
    * This is the image-side PII scrub a training-data pipeline runs
    * at intake (c04 is the text side). The demo plants two metadata
    * chunks on each image payload and scrubs them; `recovered`
    * certifies the scrubbed bytes equal the pre-plant original
    * EXACTLY (independently re-synthesized, not round-tripped).
    *
    * Oracle: a side-table carries the planted payload's chunk walk
    * (type, length) plus xxhash64 of the original and scrubbed bytes
    * — the ancillary classification, all size accounting and the
    * recovery verdict replay in SQL (the m04/m07 side-table
    * discipline: the byte-level kernel is spec-checked, everything
    * downstream of it is oracled).
    *
    * Scale: ONE per-row chunk walk inside one mapPartitions batch —
    * pixels never shuffle, no decode happens (the walk reads chunk
    * headers and CRC-checks data in a single linear pass; the scrub
    * reuses that walk's offsets), output is one slim row per image.
    */
  def m12PngScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spreadIds(Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    ids.as[Long].mapPartitions { rows =>
      rows.map { id =>
        val planted = synthMetaImage(id)
        val chunks = Codecs.pngChunks(planted)
        val scrubbed = Codecs.scrubFromChunks(planted, chunks)
        val nMeta = chunks.count { case (t, _, _) => (t.charAt(0) & 0x20) != 0 }
        (id, chunks.size.toLong, nMeta.toLong,
          planted.length.toLong, scrubbed.length.toLong,
          if (java.util.Arrays.equals(scrubbed, synthImage(id))) 1L else 0L)
      }
    }.toDF("doc_id", "n_chunks", "n_meta", "bytes_in", "bytes_out",
      "recovered")
      .orderBy("doc_id")
  }

  // ---- m13: image downsampling ----

  /** m13: image downsampling — 2× average-pool thumbnails, the
    * resize/preprocess stage every vision-training pipeline runs at
    * intake (public practice: training resolutions are fixed; crawled
    * images are decoded, resampled, re-encoded once, downstream
    * stages touch only the small form). The kernel is exact-integer
    * block pooling ([[Codecs.poolGray]] — floor mean of each f×f
    * block), so every output sample replays bit-for-bit in SQL from
    * a decoded-pixel side-table; the re-encode leg (pooled pixels →
    * canonical PNG → decode) is spec'd lossless round-trip.
    *
    * Output: one row per OUTPUT pixel (doc_id, y, x, v) — the fully
    * replayable form; real deployments keep the re-encoded payload
    * column instead (same pipeline, drop the explode).
    *
    * Scale: decode + pool + re-encode run per-row inside one
    * mapPartitions batch; pixels shuffle only as the slim exploded
    * output (64→16 samples/image at the demo size), and the
    * production form shuffles nothing.
    */
  def m13ImagePool(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spreadIds(Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    ids.as[Long].flatMap { id =>
      val (w, h, px) = Codecs.decodeGray(synthImage(id))
      val (ow, _, pooled) = Codecs.poolGray(w, h, px, 2)
      // re-encode leg: the pooled image is what a real pipeline lands
      val png = Codecs.encodePng(ow, pooled.length / ow, pooled)
      require(png.length > 0)
      pooled.zipWithIndex.map { case (v, i) =>
        (id, (i / ow).toLong, (i % ow).toLong, v.toLong)
      }
    }.toDF("doc_id", "y", "x", "v")
      .orderBy("doc_id", "y", "x")
  }

  /** m13 oracle side-table: the ORIGINAL decoded pixels, one row per
    * input sample — the pooling arithmetic downstream of the codec
    * replays in SQL (the m04/m07 side-table discipline).
    */
  def m13AuxPixels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spreadIds(Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    ids.as[Long].flatMap { id =>
      val (w, _, px) = Codecs.decodeGray(synthImage(id))
      px.zipWithIndex.map { case (v, i) =>
        (id, (i / w).toLong, (i % w).toLong, v.toLong)
      }
    }.toDF("doc_id", "y", "x", "v")
  }

  /** m12 oracle side-table: the planted payload's chunk walk (one row
    * per chunk) plus per-doc xxhash64 of the original and scrubbed
    * byte arrays (hashed by Spark's kernel, produced by two different
    * code paths — re-synthesis vs splice-then-scrub).
    */
  def m12AuxChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spreadIds(Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0).select(col("doc_id")))
      .localCheckpoint(false) // one id frame feeds both passes
    // per-doc payload hashes computed ONCE, then joined onto the slim
    // chunk rows — replicating full payload copies per chunk row
    // would serialize and hash O(n_chunks × payload) instead
    val hashes = ids.as[Long].map { id =>
        val planted = synthMetaImage(id)
        (id, Codecs.scrubPngAncillary(planted), synthImage(id))
      }.toDF("doc_id", "sb", "ob")
      .select(col("doc_id"), xxhash64(col("sb")).as("h_scrub"),
        xxhash64(col("ob")).as("h_orig"))
    val chunks = ids.as[Long].flatMap { id =>
      Codecs.pngChunks(synthMetaImage(id)).zipWithIndex.map {
        case ((t, len, _), i) => (id, i, t, len.toLong)
      }
    }.toDF("doc_id", "idx", "ctype", "clen")
    chunks.join(hashes, Seq("doc_id"))
  }

  // ---- m15: JPEG metadata scrub ----

  /** JPEG segment codec (public ITU T.81 + JFIF/EXIF specs). The
    * m12 PNG walker's sibling for the OTHER dominant crawled-image
    * container — and the one that actually carries EXIF GPS, the
    * canonical image-PII case.
    */
  object Jpeg {
    /** Synthetic entropy-stream marker code for the walk result (no
      * real marker is > 0xFF).
      */
    val Ecs = 0x100

    /** Walk a JPEG's segment sequence: (marker, totalLen, byteOffset)
      * in stream order — SOI/EOI standalone, length-framed segments
      * (the 2-byte big-endian length INCLUDES itself), and after a
      * SOS header the entropy-coded stream (emitted as one [[Ecs]]
      * pseudo-segment) scanned per the byte-stuffing rule: FF 00 is
      * data, FF D0-D7 a restart marker, and ANY other FF-pair ends
      * the scan and returns to the segment loop — which is how
      * progressive/multi-scan JPEGs work (DHT/SOS/DNL between scans,
      * each SOS re-entering entropy), not a corruption. Truncation,
      * bad lengths, a missing EOI, fill bytes (FF FF) and trailing
      * bytes after EOI fail loudly (the m12 discipline — corrupt
      * payloads never pass garbage downstream).
      */
    def jpegSegments(bytes: Array[Byte]): Seq[(Int, Int, Int)] = {
      require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8, "not a JPEG payload")
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      out += ((0xd8, 2, 0))
      var p = 2
      var done = false
      while (!done) {
        require(p + 2 <= bytes.length, "truncated JPEG segment marker")
        require((bytes(p) & 0xff) == 0xff,
          f"expected JPEG marker at $p, got 0x${bytes(p) & 0xff}%02x")
        val m = bytes(p + 1) & 0xff
        require(m != 0x00 && m != 0xff && m != 0xd8,
          f"unexpected JPEG marker 0x$m%02x at $p")
        if (m == 0xd9) { // EOI
          out += ((m, 2, p))
          require(p + 2 == bytes.length,
            s"${bytes.length - p - 2} trailing bytes after EOI")
          done = true
        } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          out += ((m, 2, p)) // standalone TEM/RSTn
          p += 2
        } else {
          require(p + 4 <= bytes.length, "truncated JPEG segment length")
          val len16 = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          require(len16 >= 2 && len16 <= bytes.length - 2 - p,
            f"truncated 0x$m%02x segment")
          out += ((m, 2 + len16, p))
          p += 2 + len16
          if (m == 0xda) { // SOS: scan the entropy-coded stream
            val start = p
            var ecsDone = false
            while (!ecsDone) {
              require(p < bytes.length, "truncated entropy stream")
              if ((bytes(p) & 0xff) != 0xff) p += 1
              else {
                require(p + 1 < bytes.length, "truncated entropy marker")
                val n = bytes(p + 1) & 0xff
                if (n == 0x00 || (n >= 0xd0 && n <= 0xd7)) p += 2
                else ecsDone = true // next segment (EOI, or a
                // between-scans DHT/SOS/DNL in progressive streams) —
                // the segment loop re-validates it
              }
            }
            out += ((Ecs, p - start, start))
          }
        }
      }
      out.toSeq
    }

    /** Drop the metadata segments — APP1..APP15 (EXIF, XMP, ICC,
      * maker notes) and COM — keeping everything else byte-identical.
      * APP0 (the JFIF header) is structural and kept, matching the
      * public scrubbers' default.
      */
    def scrubFromSegments(bytes: Array[Byte],
        segs: Seq[(Int, Int, Int)]): Array[Byte] = {
      val kept = segs.filterNot { case (m, _, _) => isMeta(m) }
      val out = java.nio.ByteBuffer.allocate(
        kept.map(_._2).sum)
      kept.foreach { case (_, len, off) => out.put(bytes, off, len) }
      out.array()
    }

    /** The scrub rule: APP1-APP15 or COM. */
    def isMeta(marker: Int): Boolean =
      (marker >= 0xe1 && marker <= 0xef) || marker == 0xfe

    /** Splice a length-framed segment immediately after APP0 — how
      * editors plant EXIF/COM metadata.
      */
    def addSegment(bytes: Array[Byte], marker: Int,
        data: Array[Byte]): Array[Byte] = {
      // the 16-bit length field covers payload + itself; a larger
      // payload would wrap toShort and frame wrong bytes — refuse
      // loudly (the buildWarc/buildTar rule)
      require(data.length <= 0xffff - 2,
        s"JPEG segment payload ${data.length} exceeds the 16-bit frame")
      val segs = jpegSegments(bytes)
      val insertAt = segs.find { case (m, _, _) => m == 0xe0 }
        .map { case (_, len, off) => off + len }
        .getOrElse(2)
      val bb = java.nio.ByteBuffer.allocate(bytes.length + 4 + data.length)
      bb.put(bytes, 0, insertAt)
        .put(0xff.toByte).put(marker.toByte)
        .putShort((data.length + 2).toShort).put(data)
        .put(bytes, insertAt, bytes.length - insertAt)
      bb.array()
    }
  }

  /** A canonical structural JPEG: SOI, JFIF APP0, DQT, baseline SOF0
    * (8×8, one component), DHT, SOS and a deterministic entropy
    * stream (always ending in a stuffed FF 00 so every payload
    * exercises the stuffing path), EOI. Not decodable to pixels (the
    * Huffman tables are empty) — the SCRUB never decodes; what
    * matters is that the segment structure is real and the bytes are
    * a pure function of the id.
    */
  def synthJpeg(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, data: Array[Byte]): Unit = {
      bos.write(0xff); bos.write(marker)
      bos.write((data.length + 2) >> 8); bos.write((data.length + 2) & 0xff)
      bos.write(data)
    }
    bos.write(0xff); bos.write(0xd8) // SOI
    seg(0xe0, "JFIF ".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, Array.tabulate[Byte](65)(i =>
      if (i == 0) 0 else (1 + (i + id) % 200).toByte))
    seg(0xc0, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(0xc4, new Array[Byte](17)) // class/id byte + 16 zero counts
    seg(0xda, Array[Byte](1, 1, 0, 0, 0x3f, 0))
    var k = 0
    while (k < 24) { // entropy bytes with FF-stuffing
      val b = ((id * 31 + k * 17) % 256).toInt & 0xff
      bos.write(b)
      if (b == 0xff) bos.write(0x00)
      k += 1
    }
    bos.write(0xff); bos.write(0x00) // guaranteed stuffed-FF tail
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /** The metadata-bearing demo JPEG: [[synthJpeg]] with an APP1 EXIF
    * segment (author + GPS-shaped payload) and a COM segment spliced
    * after APP0 — the PII a privacy scrub must remove.
    */
  def synthMetaJpeg(id: Long): Array[Byte] = {
    val exif = s"Exif  Author=user$id;GPS=${id % 90}.5,${id % 180}.25"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val com = s"created ${2020 + id % 5}".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    Jpeg.addSegment(Jpeg.addSegment(synthJpeg(id), 0xe1, exif), 0xfe, com)
  }

  /** m15: JPEG metadata scrubbing — m12's sibling for the container
    * that carries EXIF (author, GPS, timestamps — the canonical
    * image-PII case; public scrubbers drop APP1..APP15 + COM and
    * keep the image stream byte-identical). The demo plants an EXIF
    * APP1 and a COM on each payload and scrubs them; `recovered`
    * certifies the scrubbed bytes equal the pre-plant original
    * EXACTLY (independently re-synthesized, not round-tripped).
    *
    * Oracle: the m12 side-table discipline — segment walk (marker,
    * length) + xxhash64 of original/scrubbed bytes persisted; the
    * APPn/COM classification, all size accounting and the recovery
    * verdict replay in SQL.
    *
    * Scale: ONE per-row segment walk inside mapPartitions — no
    * decode (the entropy stream is scanned, never parsed), payloads
    * never shuffle, output is one slim row per image.
    */
  def m15JpegScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spreadIds(Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 1).select(col("doc_id")))
    ids.as[Long].mapPartitions { rows =>
      rows.map { id =>
        val planted = synthMetaJpeg(id)
        val segs = Jpeg.jpegSegments(planted)
        val scrubbed = Jpeg.scrubFromSegments(planted, segs)
        val nMeta = segs.count { case (m, _, _) => Jpeg.isMeta(m) }
        (id, segs.size.toLong, nMeta.toLong,
          planted.length.toLong, scrubbed.length.toLong,
          if (java.util.Arrays.equals(scrubbed, synthJpeg(id))) 1L else 0L)
      }
    }.toDF("doc_id", "n_segments", "n_meta", "bytes_in", "bytes_out",
      "recovered")
      .orderBy("doc_id")
  }

  /** m15 oracle side-table: the planted payload's segment walk (one
    * row per segment) plus per-doc xxhash64 of the original and
    * scrubbed byte arrays (two independent code paths — re-synthesis
    * vs splice-then-scrub; the m12AuxChunks slim-row join shape).
    */
  def m15AuxSegs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spreadIds(Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 1).select(col("doc_id")))
      .localCheckpoint(false)
    val hashes = ids.as[Long].map { id =>
        val planted = synthMetaJpeg(id)
        (id, Jpeg.scrubFromSegments(planted, Jpeg.jpegSegments(planted)),
          synthJpeg(id))
      }.toDF("doc_id", "sb", "ob")
      .select(col("doc_id"), xxhash64(col("sb")).as("h_scrub"),
        xxhash64(col("ob")).as("h_orig"))
    val segs = ids.as[Long].flatMap { id =>
      Jpeg.jpegSegments(synthMetaJpeg(id)).zipWithIndex.map {
        case ((m, len, _), i) => (id, i, m, len.toLong)
      }
    }.toDF("doc_id", "idx", "marker", "slen")
    segs.join(hashes, Seq("doc_id"))
  }
}
