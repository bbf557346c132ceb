package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal.Codecs

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("m11 sniffs every magic-byte family and falls through to unknown") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A)
    val rows = Seq(
      ("png", png),
      ("jpeg", b(0xFF, 0xD8, 0xFF, 0xE0)),
      ("gif", b(0x47, 0x49, 0x46, 0x38, 0x39)),
      ("wav", "RIFF".getBytes("US-ASCII") ++ b(1, 0, 0, 0) ++
        "WAVE".getBytes("US-ASCII")),
      ("riff", "RIFF".getBytes("US-ASCII") ++ b(1, 0, 0, 0) ++
        "AVI ".getBytes("US-ASCII")),
      ("vid", b(0, 0, 0, 10) ++ png), // length-prefixed frame container
      ("junk", b(1, 2, 3)),
      ("empty", Array.empty[Byte]))
    val got = rows.toDF("name", "payload")
      .select(col("name"), Multimodal.sniffExpr(col("payload")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "png" -> "image/png", "jpeg" -> "image/jpeg", "gif" -> "image/gif",
      "wav" -> "audio/wav", "riff" -> "riff/other",
      "vid" -> "video/frames", "junk" -> "unknown", "empty" -> "unknown"))
  }

  test("m11 corpus sniff is diagonal: bytes agree with declared types") {
    val got = Multimodal.m11TypeSniff(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toSeq.sorted == Seq(
      "audio" -> "audio/wav", "image" -> "image/png",
      "video" -> "video/frames"))
    assert(got.map(_._3).sum > 0)
  }

  // ---- codec kernels: real JDK decode against hand-built payloads ----

  test("PNG round-trip: encode then ImageIO-decode returns the exact pixels") {
    val px = Array(0, 85, 170, 255)
    val png = Codecs.encodePng(2, 2, px)
    // a real PNG: magic bytes present
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, back) = Codecs.decodeGray(png)
    assert(w == 2 && h == 2)
    assert(back.sameElements(px))
  }

  test("WAV round-trip: encode then AudioSystem-decode returns the exact samples") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 7)
    val wav = Codecs.encodeWav(samples)
    // a real RIFF/WAVE file
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(Codecs.decodeWav(wav).sameElements(samples))
  }

  test("luma histogram of known pixels lands in the expected bins") {
    // 0→bin0, 85→bin2, 170→bin5, 255→bin7 (8 bins over 0..255)
    val hist = Codecs.lumaHistogram(Array(0, 85, 170, 255))
    assert(hist.toSeq == Seq(0.25f, 0f, 0.25f, 0f, 0f, 0.25f, 0f, 0.25f))
  }

  test("440 Hz sine WAV has the known RMS (A/sqrt2) after a real decode") {
    val sr = 8000.0
    val amp = 16000.0
    // 10 full cycles → windows aligned to whole cycles have RMS A/√2
    val n = (10 * sr / 440.0).round.toInt
    val sine = Array.tabulate(n)(i =>
      math.round(amp * StrictMath.sin(2 * StrictMath.PI * 440.0 * i / sr)).toShort)
    val decoded = Codecs.decodeWav(Codecs.encodeWav(sine))
    val rms = Codecs.rms(decoded, 0, decoded.length)
    val expected = amp / math.sqrt(2.0) / 32768.0
    assert(math.abs(rms - expected) < 0.01 * expected,
      s"rms $rms vs expected $expected")
    // silence decodes to zero energy
    val silent = Codecs.decodeWav(Codecs.encodeWav(Array.fill[Short](256)(0)))
    assert(Codecs.rms(silent, 0, silent.length) == 0.0)
  }

  test("blockResize averages real quadrants; identity at native res") {
    // 4×4 with constant quadrants 10/20/30/40 → 2×2 exactly those values
    val px = Array(
      10, 10, 20, 20,
      10, 10, 20, 20,
      30, 30, 40, 40,
      30, 30, 40, 40)
    assert(Codecs.blockResize(4, 4, px, 2).toSeq == Seq(10f, 20f, 30f, 40f))
    // outRes == image res: resize is the identity
    val some = Array(1, 2, 3, 4)
    assert(Codecs.blockResize(2, 2, some, 2).toSeq == some.map(_.toFloat).toSeq)
  }

  test("frame container round-trips and rejects corruption") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](), Array[Byte](9))
    val packed = Codecs.packFrames(frames)
    val back = Codecs.unpackFrames(packed)
    assert(back.length == 3 && back(0).toSeq == Seq[Byte](1, 2, 3) &&
      back(1).isEmpty && back(2).toSeq == Seq[Byte](9))
    // truncated container must fail loudly, not yield garbage frames
    intercept[IllegalArgumentException] {
      Codecs.unpackFrames(packed.dropRight(1))
    }
  }

  test("adversarial codec bytes fail loudly — never hang, wrap, or pass through") {
    import java.nio.{ByteBuffer, ByteOrder}
    // a NEGATIVE RIFF chunk size once spun decodeWav's walk forever
    // (pos += 8 + size with size = -8 never advances) — an executor
    // HANG; it must throw instead (review r14)
    val evilWav = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(24).put("WAVE".getBytes)
      .put("junk".getBytes).putInt(-8)
      .put(new Array[Byte](12)).array()
    val e1 = intercept[IllegalArgumentException](Codecs.decodeWav(evilWav))
    assert(e1.getMessage.contains("negative RIFF chunk size"), e1.getMessage)
    // a SHORT fmt chunk must not read its fields out of the next
    // chunk's bytes
    val shortFmt = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(32).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(4).putInt(0x00010001)
      .put("data".getBytes).putInt(4).putInt(0).array()
    val e2 = intercept[IllegalArgumentException](Codecs.decodeWav(shortFmt))
    assert(e2.getMessage.contains("short fmt chunk"), e2.getMessage)
    // 16-bit grayscale decodes SCALED (top 8 bits), never wrapped mod
    // 256: sample 0x8001 must read ~0x80, not 0x01
    val deep = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    deep.getRaster.setSample(0, 0, 0, 0x8001)
    deep.getRaster.setSample(1, 0, 0, 0x00ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(deep, "png", bos)
    val (_, _, px16) = Codecs.decodeGray(bos.toByteArray)
    assert(px16(0) == 0x80 && px16(1) == 0x00,
      s"16-bit gray wrapped: ${px16.toSeq}")
    // 1-3 trailing bytes = a torn frame container (partial length
    // prefix) — fewer frames silently was the old behavior
    val packed = Codecs.packFrames(Seq(Array[Byte](1, 2, 3)))
    val e3 = intercept[IllegalArgumentException](
      Codecs.unpackFrames(packed ++ Array[Byte](7)))
    assert(e3.getMessage.contains("trailing bytes"), e3.getMessage)
    // chunks AFTER an interior IEND are a scrub-evasion channel
    // (decoders stop at the first IEND; crafted critical-typed chunks
    // there would survive the scrub invisibly) — the walker refuses
    val png = Multimodal.synthImage(3L)
    val iendOff = Codecs.pngChunks(png).last._3
    val doubled = png ++ java.util.Arrays.copyOfRange(png, iendOff, png.length)
    val e4 = intercept[IllegalArgumentException](Codecs.pngChunks(doubled))
    assert(e4.getMessage.contains("after IEND"), e4.getMessage)
  }

  // ---- table + pipeline: real payloads flow through the real codecs ----

  test("m01 media table has binary payloads that actually decode") {
    val m = Multimodal.mediaTable(spark, dir)
    val s = m.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
    val rows = m.select("media_type", "payload").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      r.getString(0) match {
        case "image" =>
          val (w, h, _) = Codecs.decodeGray(payload)
          assert(w == 8 && h == 8)
        case "audio" =>
          assert(Codecs.decodeWav(payload).length >= 512)
        case "video" =>
          val fs = Codecs.unpackFrames(payload)
          assert(fs.length >= 3)
          assert(Codecs.decodeGray(fs(0))._1 == 8)
      }
    }
  }

  test("m01 features are normalized 8-bin histograms from real decodes") {
    val feats = Multimodal.mediaTable(spark, dir)
      .select("media_type", "payload").collect()
      .map(r => Multimodal.decodeFeatures(r.getString(0), r.getAs[Array[Byte]](1)))
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.length == 8)
      assert(math.abs(f.sum - 1.0f) < 1e-3, "histogram should normalize")
    }
  }

  test("m01 rollup is deterministic across runs") {
    val a = Multimodal.m01Multimodal(spark, dir).collect().map(_.toString)
    val b = Multimodal.m01Multimodal(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
    assert(a.length == 3) // image / audio / video
  }

  test("m02 samples every stride-th decoded frame with correct accounting") {
    import spark.implicits._
    val frames = Multimodal.m02FrameSample(spark, dir, stride = 3).collect()
    assert(frames.nonEmpty)
    val videoFrameCounts = Multimodal.mediaTable(spark, dir)
      .filter(col("media_type") === "video")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect()
      .map { case (id, p) => id -> Codecs.unpackFrames(p).length }.toMap
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc.keySet == videoFrameCounts.keySet)
    byDoc.foreach { case (id, fs) =>
      val total = videoFrameCounts(id)
      assert(fs.forall(_.getInt(2) == total))
      // sampled indices are exactly 0, 3, 6, ...
      val idxs = fs.map(_.getInt(1)).sorted
      assert(idxs.sameElements(0 until total by 3), s"doc $id: ${idxs.toSeq}")
    }
    // feat0 is a real pixel average: reproduce one row by hand
    val (docId, fsRows) = byDoc.head
    val frame0 = Codecs.unpackFrames(
      Multimodal.mediaTable(spark, dir)
        .filter(col("doc_id") === docId).select("payload")
        .as[Array[Byte]].head())(0)
    val (w, h, px) = Codecs.decodeGray(frame0)
    val expected = BigDecimal(Codecs.blockResize(w, h, px, 4)(0).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = fsRows.find(_.getInt(1) == 0).get.getDouble(3)
    assert(math.abs(got - expected) < 1e-9, s"feat0 $got vs $expected")
  }

  test("m03 windows overlap at the hop over real decoded PCM") {
    val out = Multimodal.m03AudioWindows(spark, dir,
      windowSamples = 256, hopSamples = 128).collect()
    assert(out.nonEmpty)
    // audio docs only (media_type round-robins on doc_id % 3 == 1)
    assert(out.forall(_.getLong(0) % 3 == 1))
    import spark.implicits._
    val sampleCounts = Multimodal.mediaTable(spark, dir)
      .filter(col("media_type") === "audio")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect()
      .map { case (id, p) => id -> Codecs.decodeWav(p).length }.toMap
    out.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val expectN = (sampleCounts(id) + 127) / 128
      assert(rows.length == expectN, s"doc $id: ${rows.length} vs $expectN")
      assert(rows.map(_.getInt(1)).sorted.sameElements(0 until expectN))
      assert(rows.forall(_.getInt(2) == expectN))
      // a sine tone: full windows carry real energy, near A/√2
      assert(rows.filter(_.getInt(1) == 0).forall(_.getDouble(3) > 0.05))
    }
  }

  test("binaryFile intake decodes and near-dups real files on disk") {
    // write REAL media files, read them back through the production
    // binaryFile path, and run the m-pipeline on the result
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("nested"))
    java.nio.file.Files.write(dir.resolve("a.png"),
      Multimodal.synthImageNoise(1L))
    java.nio.file.Files.write(sub.resolve("a_copy.png"),
      Multimodal.synthImageVariant(1L))
    java.nio.file.Files.write(dir.resolve("b.png"),
      Multimodal.synthImageNoise(2L))
    java.nio.file.Files.write(dir.resolve("tone.wav"),
      Multimodal.synthWav(3L))
    // other ImageIO extensions route to the image decoder (ImageIO
    // sniffs content, so PNG bytes under .jpg exercise the routing,
    // which is what broke — .jpg once fell through to "video"), and
    // the frame container rides its reserved extension
    java.nio.file.Files.write(sub.resolve("extra.jpg"),
      Multimodal.synthImageNoise(4L))
    java.nio.file.Files.write(dir.resolve("clip.vid"),
      Multimodal.synthVideo(5L))

    val media = Multimodal.mediaFromDir(spark, dir.toString)
    val rows = media.collect()
    assert(rows.length == 6)
    assert(rows.count(_.getString(1) == "image") == 4)
    assert(rows.count(_.getString(1) == "audio") == 1)
    assert(rows.count(_.getString(1) == "video") == 1)
    // the video payload decodes through the frame pipeline
    rows.filter(_.getString(1) == "video").foreach { r =>
      assert(Codecs.unpackFrames(r.getAs[Array[Byte]](2)).nonEmpty)
    }
    // payloads decode with the real codecs
    rows.filter(_.getString(1) == "image").foreach { r =>
      val (w, h, _) = Codecs.decodeGray(r.getAs[Array[Byte]](2))
      assert(w == 8 && h == 8)
    }
    // the near-dup pipeline runs unchanged on the binaryFile frame:
    // exactly the planted (a.png, a_copy.png) pair comes back
    val pairs = Multimodal.m04PhashPairsOver(
      media.filter(col("media_type") === "image")).collect()
    val idOf = rows.filter(_.getString(1) == "image")
      .map(r => r.getString(3).split("/").last -> r.getLong(0)).toMap
    val expected = Set(
      (idOf("a.png") min idOf("a_copy.png"),
        idOf("a.png") max idOf("a_copy.png")))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("mediaFromDir fails fast at intake on unknown extensions, naming the path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_bad")
    java.nio.file.Files.write(dir.resolve("ok.png"),
      Multimodal.synthImageNoise(1L))
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "not media")
    val ex = intercept[Exception] {
      Multimodal.mediaFromDir(spark, dir.toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("unknown media extension") && m.contains("notes.txt")),
      s"got: ${messages(ex)}")
  }

  test("m04 aHash is invariant to uniform brightness shift") {
    val px = Array.tabulate(64)(i => (i * 37) % 200) // headroom for +40
    val shifted = px.map(_ + 40)
    assert(Multimodal.aHash64(8, 8, px) == Multimodal.aHash64(8, 8, shifted))
    // and sensitive to content: a different image hashes differently
    val other = Array.tabulate(64)(i => ((i * 53) + 11) % 256)
    assert(Multimodal.aHash64(8, 8, px) != Multimodal.aHash64(8, 8, other))
  }

  test("m04 finds exactly the planted perceptual near-dup pairs") {
    import spark.implicits._
    val got = Multimodal.m04PhashDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // ground truth recomputed locally: hash every corpus image through
    // the same decode path and enumerate ALL pairs within Hamming ≤ 3
    val ids = graft.Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0).select("doc_id")
      .as[Long].collect().sorted
    val hashes: Map[Long, Long] =
      (ids.map { id =>
        val (w, h, px) = Codecs.decodeGray(Multimodal.synthImageNoise(id))
        id -> Multimodal.aHash64(w, h, px)
      } ++ ids.filter(_ % 30 == 0).map { id =>
        val (w, h, px) = Codecs.decodeGray(Multimodal.synthImageVariant(id))
        (id + 1000000L) -> Multimodal.aHash64(w, h, px)
      }).toMap
    val all = hashes.keys.toSeq.sorted
    val expected = for {
      i <- all.indices; j <- (i + 1) until all.length
      h = java.lang.Long.bitCount(hashes(all(i)) ^ hashes(all(j)))
      if h <= 3
    } yield (all(i), all(j), h.toLong)

    assert(got.toSeq.sorted == expected.sorted)
    // the demo is not vacuous: most planted variants survive ≤ 3 bits
    val planted = ids.count(_ % 30 == 0)
    val foundPlanted = got.count { case (a, b, _) => b == a + 1000000L }
    assert(planted > 0 && foundPlanted * 2 >= planted,
      s"$foundPlanted of $planted planted variants found")
  }

  test("m08 fingerprint is gain-invariant and dither-robust, content-sensitive") {
    val base = Multimodal.audioFingerprint64Wav(Multimodal.synthWavNoise(7L))
    val gain = Multimodal.audioFingerprint64Wav(Multimodal.synthWavGain(7L))
    val reenc = Multimodal.audioFingerprint64Wav(Multimodal.synthWavReencode(7L))
    val other = Multimodal.audioFingerprint64Wav(Multimodal.synthWavNoise(8L))
    assert(java.lang.Long.bitCount(base ^ gain) <= 3,
      s"gain shift moved ${java.lang.Long.bitCount(base ^ gain)} bits")
    assert(java.lang.Long.bitCount(base ^ reenc) <= 3,
      s"re-encode moved ${java.lang.Long.bitCount(base ^ reenc)} bits")
    assert(java.lang.Long.bitCount(base ^ other) > 3,
      "different content must not fingerprint as a near-dup")
  }

  test("m08 finds exactly the planted audio near-dup pairs") {
    import spark.implicits._
    val got = Multimodal.m08AudioDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // ground truth recomputed locally: fingerprint every corpus clip
    // through the same decode path, enumerate ALL pairs within ≤ 3
    val ids = graft.Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 1).select("doc_id")
      .as[Long].collect().sorted
    val fps: Map[Long, Long] =
      (ids.map { id =>
        id -> Multimodal.audioFingerprint64Wav(Multimodal.synthWavNoise(id))
      } ++ ids.filter(_ % 30 == 1).map { id =>
        val v = if (id % 60 == 1) Multimodal.synthWavGain(id)
        else Multimodal.synthWavReencode(id)
        (id + 1000000L) -> Multimodal.audioFingerprint64Wav(v)
      }).toMap
    val all = fps.keys.toSeq.sorted
    val expected = for {
      i <- all.indices; j <- (i + 1) until all.length
      h = java.lang.Long.bitCount(fps(all(i)) ^ fps(all(j)))
      if h <= 3
    } yield (all(i), all(j), h.toLong)

    assert(got.toSeq.sorted == expected.sorted)
    // not vacuous: most planted variants survive ≤ 3 bits, and BOTH
    // damage classes are represented among the found pairs
    val planted = ids.count(_ % 30 == 1)
    val foundPlanted = got.collect {
      case (a, b, _) if b == a + 1000000L => a }
    assert(planted > 0 && foundPlanted.length * 2 >= planted,
      s"${foundPlanted.length} of $planted planted variants found")
    assert(foundPlanted.exists(_ % 60 == 1) &&
      foundPlanted.exists(_ % 60 != 1),
      "expected both gain-shifted and re-encoded variants among the finds")
  }

  test("m06 dHash survives a monotone tone curve that flips aHash") {
    // by construction: bimodal 0/248 cells plus one 128 mid-cell. The
    // convex tone curve p·(p+255)/510 maps 0→0, 128→96, 248→244 —
    // strictly order-preserving (dHash bit-identical) but the mid-cell
    // crosses the global mean (128 > 126 before; 96 < 123.5 after), so
    // aHash MUST differ: the exact failure class m06 exists for.
    val px = Array.tabulate(64)(i =>
      if (i == 20) 128 else if (i % 2 == 0) 0 else 248)
    val toned = px.map(p => (p * (p + 255)) / 510)
    assert(Multimodal.dHash64(8, 8, px) == Multimodal.dHash64(8, 8, toned))
    assert(Multimodal.aHash64(8, 8, px) != Multimodal.aHash64(8, 8, toned))
    // and dHash is still content-sensitive
    val other = Array.tabulate(64)(i => ((i * 53) + 11) % 256)
    assert(Multimodal.dHash64(8, 8, px) != Multimodal.dHash64(8, 8, other))
  }

  test("m06 finds exactly the planted tone-mapped near-dup pairs") {
    import spark.implicits._
    val got = Multimodal.m06DhashDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // ground truth recomputed locally, m04's discipline: hash every
    // corpus image through the same decode path, enumerate ALL pairs
    // within Hamming ≤ 3
    val ids = graft.Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0).select("doc_id")
      .as[Long].collect().sorted
    val dhashes: Map[Long, Long] =
      (ids.map { id =>
        val (w, h, px) = Codecs.decodeGray(Multimodal.synthImageNoise(id))
        id -> Multimodal.dHash64(w, h, px)
      } ++ ids.filter(_ % 30 == 0).map { id =>
        val (w, h, px) = Codecs.decodeGray(Multimodal.synthImageTone(id))
        (id + 1000000L) -> Multimodal.dHash64(w, h, px)
      }).toMap
    val all = dhashes.keys.toSeq.sorted
    val expected = for {
      i <- all.indices; j <- (i + 1) until all.length
      h = java.lang.Long.bitCount(dhashes(all(i)) ^ dhashes(all(j)))
      if h <= 3
    } yield (all(i), all(j), h.toLong)
    assert(got.toSeq.sorted == expected.sorted)

    // the demo is not vacuous, and the tone class is REAL: dHash keeps
    // most planted regrades within 3 bits...
    val planted = ids.count(_ % 30 == 0)
    val foundPlanted = got.count { case (a, b, _) => b == a + 1000000L }
    assert(planted > 0 && foundPlanted * 2 >= planted,
      s"$foundPlanted of $planted planted regrades found")
    // ...while the same pairs drift past aHash's banding tolerance for
    // at least one planted pair (m04 alone would MISS tone regrades)
    val aMissed = ids.filter(_ % 30 == 0).count { id =>
      val (w1, h1, p1) = Codecs.decodeGray(Multimodal.synthImageNoise(id))
      val (w2, h2, p2) = Codecs.decodeGray(Multimodal.synthImageTone(id))
      java.lang.Long.bitCount(
        Multimodal.aHash64(w1, h1, p1) ^ Multimodal.aHash64(w2, h2, p2)) > 3
    }
    assert(aMissed >= 1, s"aHash caught every tone regrade — differentiator vacuous")
  }

  test("m07 finds exactly the planted shot boundaries, scenes indexed in order") {
    import spark.implicits._
    val got = Multimodal.m07SceneDetect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getDouble(3), r.getBoolean(4), r.getLong(5)))
      .toMap

    // closed form per video: seed → nShots shots of shotLen identical
    // frames; within-shot deltas are EXACTLY 0, boundaries land
    // exactly at the shot edges, scene_idx counts boundaries so far
    val ids = graft.Tables(spark, dir).documents
      .filter(col("doc_id") % 5 === 0).select("doc_id")
      .as[Long].collect().sorted
    assert(ids.nonEmpty)
    var checked = 0
    ids.foreach { id =>
      val nShots = 2 + (id % 3).toInt
      val shotLen = 2 + (id % 2).toInt
      val n = nShots * shotLen
      (1 until n).foreach { f =>
        val (nf, delta, boundary, scene) = got((id, f))
        assert(nf == n)
        val isEdge = f % shotLen == 0
        assert(boundary == isEdge, s"video $id frame $f: boundary=$boundary")
        if (!isEdge) assert(delta == 0.0, s"video $id frame $f: delta=$delta")
        else assert(delta >= 30.0, s"video $id frame $f: edge delta=$delta")
        assert(scene == f / shotLen, s"video $id frame $f: scene=$scene")
        checked += 1
      }
    }
    assert(got.size == checked, s"${got.size} rows vs $checked expected pairs")
  }

  test("m10 keyframes: exactly one middle frame per planted shot") {
    import spark.implicits._
    val got = Multimodal.m10KeyframeSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4)))
      .toMap

    val ids = graft.Tables(spark, dir).documents
      .filter(col("doc_id") % 5 === 0).select("doc_id")
      .as[Long].collect().sorted
    assert(ids.nonEmpty)
    // closed form: video id = nShots shots of shotLen identical
    // frames; scene s spans [s·len, (s+1)·len), keyframe = middle
    var expectedRows = 0
    ids.foreach { id =>
      val nShots = 2 + (id % 3).toInt
      val shotLen = 2 + (id % 2).toInt
      (0 until nShots).foreach { s =>
        val (fStart, nFrames, key) = got((id, s.toLong))
        assert(fStart == s * shotLen, s"video $id scene $s start $fStart")
        assert(nFrames == shotLen, s"video $id scene $s len $nFrames")
        assert(key == s * shotLen + (shotLen - 1) / 2,
          s"video $id scene $s keyframe $key")
        expectedRows += 1
      }
    }
    assert(got.size == expectedRows,
      s"${got.size} keyframe rows vs $expectedRows scenes")
  }

  test("m09 banding pigeonhole law: any ≤3-bit drift always shares a band") {
    // the recall guarantee the candidate cut rests on: 4 disjoint
    // 14-bit bands cover bits 0..55; ≤3 flipped bits dirty ≤3 bands,
    // so one band is always clean — and flips in bits 56..63 touch no
    // band at all. Deterministic sweep: 2000 seeded (hash, ≤3-flip)
    // trials, plus the all-bands-dirty negative direction.
    def bandKeys(h: Long): Set[(Int, Long)] =
      (0 until 4).map(j => (j, (h >>> (j * 14)) & 0x3FFFL)).toSet
    val rnd = new scala.util.Random(97L)
    (1 to 2000).foreach { _ =>
      val h = rnd.nextLong()
      val nFlips = 1 + rnd.nextInt(3)
      val flipped = (1 to nFlips).foldLeft(h)((acc, _) =>
        acc ^ (1L << rnd.nextInt(64)))
      assert((bandKeys(h) & bandKeys(flipped)).nonEmpty,
        f"pigeonhole violated: $h%016x vs $flipped%016x")
    }
    // 4 flips CAN dirty all four bands (the guarantee is tight at 3)
    val h = 0L
    val fourFlips = (0 until 4).foldLeft(h)((acc, j) =>
      acc ^ (1L << (j * 14)))
    assert((bandKeys(h) & bandKeys(fourFlips)).isEmpty)
  }

  test("m09 frame-hash signature: re-encode drifts few bits, trim is a subset, noise unrelated") {
    val base = Multimodal.videoFrameHashes(Multimodal.synthNoiseVideo(12L))
    val reenc = Multimodal.videoFrameHashes(Multimodal.synthVideoReencode(12L))
    val trim = Multimodal.videoFrameHashes(Multimodal.synthVideoTrim(12L))
    val other = Multimodal.videoFrameHashes(Multimodal.synthNoiseVideo(13L))
    // trim: strict subset of the original's frame set → containment 1
    assert(trim.toSet.subsetOf(base.toSet) && trim.length < base.length)
    // re-encode dither: most frames stay within 3 bits of a base frame
    val matched = reenc.count(r =>
      base.exists(b => java.lang.Long.bitCount(r ^ b) <= 3))
    assert(matched * 2 >= reenc.length,
      s"$matched of ${reenc.length} re-encoded frames survived ≤3 bits")
    // unrelated noise video: zero frame-level near-matches
    val cross = other.count(r =>
      base.exists(b => java.lang.Long.bitCount(r ^ b) <= 3))
    assert(cross == 0, s"$cross accidental cross-video frame matches")
  }

  test("m09 finds exactly the planted video near-dup pairs") {
    import spark.implicits._
    val got = Multimodal.m09VideoDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq

    // ground truth recomputed locally, m08's discipline: signature
    // every corpus video through the same decode path, replay the
    // band-candidate + containment-verify pipeline over ALL pairs
    val ids = graft.Tables(spark, dir).documents
      .filter(col("doc_id") % 5 === 2).select("doc_id")
      .as[Long].collect().sorted
    val sigs: Map[Long, Array[Long]] =
      (ids.map { id =>
        id -> Multimodal.videoFrameHashes(Multimodal.synthNoiseVideo(id))
      } ++ ids.filter(_ % 30 == 2).map { id =>
        val v = if (id % 60 == 2) Multimodal.synthVideoReencode(id)
        else Multimodal.synthVideoTrim(id)
        (id + 1000000L) -> Multimodal.videoFrameHashes(v)
      }).toMap
    def bandKeys(h: Long): Seq[(Int, Long)] =
      (0 until 4).map(j => (j, (h >>> (j * 14)) & 0x3FFFL))
    val bandSets: Map[Long, Set[(Int, Long)]] =
      sigs.map { case (id, fhs) => id -> fhs.flatMap(bandKeys).toSet }
    def matchedIn(as: Array[Long], bs: Array[Long]): Int =
      as.count(a => bs.exists(b => java.lang.Long.bitCount(a ^ b) <= 3))
    val all = sigs.keys.toSeq.sorted
    val expected = for {
      i <- all.indices
      j <- (i + 1) until all.length
      a = all(i); b = all(j)
      if (bandSets(a) & bandSets(b)).nonEmpty
      na = sigs(a).length; nb = sigs(b).length
      frac = math.max(matchedIn(sigs(a), sigs(b)).toDouble / na,
        matchedIn(sigs(b), sigs(a)).toDouble / nb)
      // Spark round() on double: BigDecimal.valueOf + HALF_UP
      fracR = java.math.BigDecimal.valueOf(frac)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      if fracR >= 0.5
    } yield (a, b, na.toLong, nb.toLong, fracR)

    assert(got == expected.sorted)

    // not vacuous: most planted variants clear the containment bar,
    // and BOTH damage classes appear among the found pairs
    val planted = ids.count(_ % 30 == 2)
    val foundPlanted = got.collect {
      case (a, b, _, _, _) if b == a + 1000000L => a }
    assert(planted > 0 && foundPlanted.length * 2 >= planted,
      s"${foundPlanted.length} of $planted planted variants found")
    assert(foundPlanted.exists(_ % 60 == 2) &&
      foundPlanted.exists(_ % 60 != 2),
      "expected both re-encoded and trimmed variants among the finds")
  }

  test("m12 chunk walk: planted chunks sit after IHDR and still decode") {
    val planted = Multimodal.synthMetaImage(7L)
    val types = Multimodal.Codecs.pngChunks(planted).map(_._1)
    assert(types.head == "IHDR" && types.last == "IEND", types)
    // insertion is after-IHDR each time, so the LAST splice lands first
    assert(types(1) == "tIME" && types(2) == "tEXt", types)
    assert(types.count(_ == "tEXt") == 1 && types.count(_ == "tIME") == 1)
    // the planted payload is still a valid PNG with identical pixels
    // (correct lengths + CRCs, decoder-tolerated placement)
    val (w, h, px) = Multimodal.Codecs.decodeGray(planted)
    val (w0, h0, px0) = Multimodal.Codecs.decodeGray(Multimodal.synthImage(7L))
    assert(w == w0 && h == h0 && px.sameElements(px0))
  }

  test("m12 scrub: byte-exact recovery of the original, idempotent") {
    for (id <- Seq(0L, 3L, 42L, 123L)) {
      val original = Multimodal.synthImage(id)
      val scrubbed = Multimodal.Codecs.scrubPngAncillary(
        Multimodal.synthMetaImage(id))
      assert(java.util.Arrays.equals(scrubbed, original), s"id $id")
      assert(java.util.Arrays.equals(
        Multimodal.Codecs.scrubPngAncillary(scrubbed), scrubbed),
        s"id $id not idempotent")
    }
  }

  test("m12 walker fails loudly on corruption") {
    val planted = Multimodal.synthMetaImage(9L)
    // flip a byte inside the first chunk's data → CRC mismatch
    val bad = planted.clone(); bad(20) = (bad(20) ^ 0x01).toByte
    assertThrows[IllegalArgumentException] {
      Multimodal.Codecs.pngChunks(bad)
    }
    // junk payload → signature check
    assertThrows[IllegalArgumentException] {
      Multimodal.Codecs.pngChunks("not a png".getBytes)
    }
  }

  test("m13 pooling: hand fixture, lossless round-trip, odd dims rejected") {
    // 4x4 → 2x2: each output is the floor mean of its block
    val px = Array(
      0, 10, 20, 30,
      2, 12, 22, 32,
      100, 110, 200, 210,
      102, 112, 202, 212)
    val (ow, oh, pooled) = Multimodal.Codecs.poolGray(4, 4, px, 2)
    assert((ow, oh) == ((2, 2)))
    assert(pooled.toSeq == Seq((0 + 10 + 2 + 12) / 4, (20 + 30 + 22 + 32) / 4,
      (100 + 110 + 102 + 112) / 4, (200 + 210 + 202 + 212) / 4))
    // pooled pixels re-encode to PNG and decode back bit-exactly
    val png = Multimodal.Codecs.encodePng(ow, oh, pooled)
    val (w2, h2, back) = Multimodal.Codecs.decodeGray(png)
    assert(w2 == ow && h2 == oh && back.sameElements(pooled))
    assertThrows[IllegalArgumentException] {
      Multimodal.Codecs.poolGray(3, 4, new Array[Int](12), 2)
    }
  }

  test("m13 demo rows == plain-Scala pooling of the synthesized images") {
    val rows = Multimodal.m13ImagePool(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(rows.nonEmpty)
    val ids = rows.keys.map(_._1).toSeq.distinct.sorted.take(5)
    ids.foreach { id =>
      val (w, h, px) = Multimodal.Codecs.decodeGray(Multimodal.synthImage(id))
      val (ow, oh, pooled) = Multimodal.Codecs.poolGray(w, h, px, 2)
      for (y <- 0 until oh; x <- 0 until ow)
        assert(rows((id, y.toLong, x.toLong)) == pooled(y * ow + x).toLong,
          s"doc $id ($y,$x)")
    }
  }

  test("m14 decimation: floor-mean pairs incl. negatives, lossless WAV round-trip") {
    // floorDiv semantics: (-3) pairs to -2, NOT -1 (truncation)
    val in = Array[Short](0, 10, -1, -2, 7, 8, -32768, -32767)
    val out = Multimodal.Codecs.decimatePcm(in, 2)
    assert(out.toSeq == Seq[Short](5, -2, 7, -32768))
    // round-trip through the canonical WAV encoder
    val back = Multimodal.Codecs.decodeWav(
      Multimodal.Codecs.encodeWav(out, 4000f))
    assert(back.sameElements(out))
    assertThrows[IllegalArgumentException] {
      Multimodal.Codecs.decimatePcm(new Array[Short](7), 2)
    }
  }

  test("m14 demo rows == plain-Scala decimation of the synthesized clips") {
    val rows = Multimodal.m14AudioDecimate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.nonEmpty)
    rows.keys.toSeq.sorted.take(5).foreach { id =>
      val in = Multimodal.Codecs.decodeWav(Multimodal.synthWav(id))
      val out = Multimodal.Codecs.decimatePcm(in, 2)
      val vs = out.map(_.toLong)
      assert(rows(id) == ((in.length.toLong, out.length.toLong,
        vs.map(math.abs).sum, vs.map(v => v * v).sum, vs.min, vs.max)),
        s"doc $id")
    }
  }

  test("m12 demo: every image recovers exactly, two metadata chunks each") {
    val rows = Multimodal.m12PngScrub(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 2L, s"doc ${r.getLong(0)} n_meta")
      assert(r.getLong(5) == 1L, s"doc ${r.getLong(0)} not recovered")
      assert(r.getLong(3) > r.getLong(4), "scrub must shrink the payload")
    }
  }

  test("m15 segment walk: canonical structure, stuffed FFs and RSTs handled") {
    val jpeg = Multimodal.synthJpeg(7L)
    val segs = Multimodal.Jpeg.jpegSegments(jpeg)
    assert(segs.map(_._1) == Seq(0xd8, 0xe0, 0xdb, 0xc0, 0xc4, 0xda,
      Multimodal.Jpeg.Ecs, 0xd9))
    // the walk tiles the byte stream exactly
    assert(segs.map(_._2).sum == jpeg.length)
    // every payload ends with the guaranteed stuffed FF 00 pair
    val (_, ecsLen, ecsOff) = segs.find(_._1 == Multimodal.Jpeg.Ecs).get
    assert((jpeg(ecsOff + ecsLen - 2) & 0xff) == 0xff &&
      jpeg(ecsOff + ecsLen - 1) == 0x00)
    // restart markers inside entropy are data, not segment breaks
    val withRst = jpeg.clone()
    withRst(ecsOff + 2) = 0xff.toByte
    withRst(ecsOff + 3) = 0xd3.toByte
    val segs2 = Multimodal.Jpeg.jpegSegments(withRst)
    assert(segs2.map(_._1) == segs.map(_._1))
  }

  test("m15 scrub: byte-exact recovery, idempotent; walker loud on corruption") {
    val id = 11L
    val planted = Multimodal.synthMetaJpeg(id)
    val segs = Multimodal.Jpeg.jpegSegments(planted)
    assert(segs.count { case (m, _, _) => Multimodal.Jpeg.isMeta(m) } == 2)
    val scrubbed = Multimodal.Jpeg.scrubFromSegments(planted, segs)
    assert(java.util.Arrays.equals(scrubbed, Multimodal.synthJpeg(id)))
    // idempotent: a clean payload scrubs to itself
    assert(java.util.Arrays.equals(
      Multimodal.Jpeg.scrubFromSegments(scrubbed,
        Multimodal.Jpeg.jpegSegments(scrubbed)), scrubbed))
    // corruption legs: truncation, bad length, trailing bytes
    assertThrows[IllegalArgumentException] {
      Multimodal.Jpeg.jpegSegments(planted.take(planted.length - 3))
    }
    val badLen = planted.clone(); badLen(4) = 0x7f.toByte // APP0 length
    assertThrows[IllegalArgumentException] {
      Multimodal.Jpeg.jpegSegments(badLen)
    }
    assertThrows[IllegalArgumentException] {
      Multimodal.Jpeg.jpegSegments(planted :+ 0x00.toByte)
    }
    // oversized splice payloads refuse instead of wrapping the frame
    assertThrows[IllegalArgumentException] {
      Multimodal.Jpeg.addSegment(planted, 0xe1, new Array[Byte](0xfffe))
    }
  }

  test("m15 walker: progressive multi-scan streams walk; their EXIF scrubs") {
    // hand-build a two-scan (progressive-style) stream: a marker ends
    // the first entropy run, DHT+SOS follow, a second run, then EOI
    val bos = new java.io.ByteArrayOutputStream()
    def seg(m: Int, data: Array[Byte]): Unit = {
      bos.write(0xff); bos.write(m)
      bos.write((data.length + 2) >> 8); bos.write((data.length + 2) & 0xff)
      bos.write(data)
    }
    bos.write(0xff); bos.write(0xd8)
    seg(0xe0, new Array[Byte](14))
    seg(0xe1, "Exif  gps".getBytes("US-ASCII")) // the EXIF to scrub
    seg(0xda, Array[Byte](1, 1, 0, 0, 0, 0))
    bos.write(Array[Byte](1, 2, 3, 4))           // scan 1
    seg(0xc4, new Array[Byte](17))               // between-scans DHT
    seg(0xda, Array[Byte](1, 1, 0, 1, 0, 0))
    bos.write(Array[Byte](5, 6, 7))              // scan 2
    bos.write(0xff); bos.write(0xd9)
    val jpeg = bos.toByteArray
    val segs = Multimodal.Jpeg.jpegSegments(jpeg)
    assert(segs.map(_._1) == Seq(0xd8, 0xe0, 0xe1, 0xda,
      Multimodal.Jpeg.Ecs, 0xc4, 0xda, Multimodal.Jpeg.Ecs, 0xd9))
    assert(segs.map(_._2).sum == jpeg.length)
    // the scrub drops ONLY the EXIF; both scans survive byte-exact
    val scrubbed = Multimodal.Jpeg.scrubFromSegments(jpeg, segs)
    val segs2 = Multimodal.Jpeg.jpegSegments(scrubbed)
    assert(segs2.map(_._1) == Seq(0xd8, 0xe0, 0xda,
      Multimodal.Jpeg.Ecs, 0xc4, 0xda, Multimodal.Jpeg.Ecs, 0xd9))
    assert(scrubbed.length == jpeg.length - (4 + "Exif  gps".length))
  }

  test("m16 dct hash: exact contrast invariance, shift stability, damage spread") {
    val (w, h, px) = Multimodal.Codecs.decodeGray(Multimodal.synthImageNoise(7L))
    val base = Multimodal.dctPhash64(w, h, px)
    // contrast doubling is IEEE-EXACT invariant (exponent bump only)
    assert(Multimodal.dctPhash64(w, h, px.map(_ * 2)) == base)
    // brightness shift moves only the excluded DC (up to the ~1e-16
    // cos-row residue — far below any |F − median| gap on real data)
    assert(Multimodal.dctPhash64(w, h, px.map(_ + 50)) == base)
    // a blown pixel spreads thinly across the spectrum — bounded flips
    val dam = px.clone(); dam(5) = 255
    val hd = java.lang.Long.bitCount(Multimodal.dctPhash64(w, h, dam) ^ base)
    assert(hd > 0 && hd <= 12, s"damage flipped $hd bits")
    // balanced signature: median thresholding sets ~half the bits
    val n = java.lang.Long.bitCount(base)
    assert(n >= 20 && n <= 40, s"unbalanced signature: $n bits")
  }

  test("m16 demo: pairs are exactly the planted variants within Hamming 3") {
    import spark.implicits._
    val got = Multimodal.m16DctDedup(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // recompute the FULL expected set locally (the m04 template):
    // every corpus image hashed, all pairs brute-forced — exact set
    // equality, so a spurious or dropped pair anywhere fails
    val ids = graft.Tables(spark, TestSpark.Sf0001).documents
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    def hashOf(png: Array[Byte]): Long = {
      val (w, h, px) = Multimodal.Codecs.decodeGray(png)
      Multimodal.dctPhash64(w, h, px)
    }
    val all = ids.map(id => id -> hashOf(Multimodal.synthImageNoise(id))) ++
      ids.filter(_ % 30 == 0)
        .map(id => (id + 1000000L) -> hashOf(Multimodal.synthImageVariant(id)))
    val expect = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      hm = java.lang.Long.bitCount(ha ^ hb) if hm <= 3
    } yield (a, b, hm.toLong)).toSet
    assert(got == expect,
      s"missing=${expect -- got} spurious=${got -- expect}")
    assert(expect.exists { case (a, b, _) => b == a + 1000000L },
      "no planted pair within threshold — demo inert")
  }

  test("m15 demo: every image recovers exactly, two metadata segments each") {
    val rows = Multimodal.m15JpegScrub(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 2L, s"doc ${r.getLong(0)} n_meta")
      assert(r.getLong(5) == 1L, s"doc ${r.getLong(0)} not recovered")
      assert(r.getLong(3) > r.getLong(4), "scrub must shrink the payload")
    }
  }
}
