package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("m01 media table has binary payload + typed metadata schema") {
    val m = Multimodal.mediaTable(spark, dir)
    val s = m.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
    assert(m.count() > 0)
  }

  test("m01 feature pipeline: stub decode emits normalized 8-bin features") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
    val feats = media.mapPartitions(_.map { case (id, mt, p) =>
      Multimodal.MediaFeatures(id, mt, p.length.toLong, Multimodal.stubDecode(p))
    }).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.feat.length == 8)
      assert(math.abs(f.feat.sum - 1.0f) < 1e-3, "histogram should normalize")
    }
  }

  test("m01 rollup is deterministic across runs") {
    val a = Multimodal.m01Multimodal(spark, dir).collect().map(_.toString)
    val b = Multimodal.m01Multimodal(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
    assert(a.length == 3) // image / audio / video
  }

  test("m02 samples every stride-th frame with correct frame accounting") {
    import spark.implicits._
    val frames = Multimodal.m02FrameSample(spark, dir,
      frameBytes = 64, stride = 3).collect()
    assert(frames.nonEmpty)
    val videoLens = Multimodal.mediaTable(spark, dir)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), length(col("payload")))
      .as[(Long, Int)].collect().toMap
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc.keySet == videoLens.filter(_._2 > 0).keySet)
    byDoc.foreach { case (id, fs) =>
      val expectedTotal = (videoLens(id) + 63) / 64
      assert(fs.forall(_.getInt(2) == expectedTotal))
      // sampled indices are exactly 0, 3, 6, ...
      val idxs = fs.map(_.getInt(1)).sorted
      assert(idxs.sameElements(0 until expectedTotal by 3), s"doc $id: ${idxs.toSeq}")
    }
  }

  test("m02 stub resize bucket-averages to the target resolution") {
    // 4 bytes → 2 buckets: (10,20 | 30,40) → (15, 35)
    val r = Multimodal.stubResize(Array[Byte](10, 20, 30, 40), 2)
    assert(r.toSeq == Seq(15.0f, 35.0f))
    // shorter frame than resolution: empty buckets stay zero
    val short = Multimodal.stubResize(Array[Byte](100), 4)
    assert(short.length == 4 && short(0) == 100.0f && short.drop(1).forall(_ == 0f))
    assert(Multimodal.stubResize(Array.empty[Byte], 4).forall(_ == 0f))
  }

  test("m03 windows overlap at the hop and account correctly") {
    val out = Multimodal.m03AudioWindows(spark, dir,
      windowBytes = 512, hopBytes = 256).collect()
    assert(out.nonEmpty)
    // audio docs only (media_type round-robins on doc_id % 3 == 1)
    assert(out.forall(_.getLong(0) % 3 == 1))
    // per-doc: indices are 0..n-1, n matches ceil(len/hop), and the
    // n_windows column is constant within the doc
    val media = Multimodal.mediaTable(spark, dir)
      .filter(org.apache.spark.sql.functions.col("media_type") === "audio")
      .select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    out.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val expectN = (media(id).length + 255) / 256
      assert(rows.length == expectN, s"doc $id: ${rows.length} vs $expectN")
      assert(rows.map(_.getInt(1)).sorted.sameElements(0 until expectN))
      assert(rows.forall(_.getInt(2) == expectN))
    }
    // empty payloads yield zero windows, never a phantom silent frame
    val outIds = out.map(_.getLong(0)).toSet
    media.filter(_._2.isEmpty).keys.foreach(id => assert(!outIds(id)))
  }

  test("m03 stub energy matches a hand-computed RMS") {
    // bytes 128 -> centered 0 -> energy 0; bytes 138/118 -> |v|=10 -> RMS 10
    assert(Multimodal.stubEnergy(Array.fill(4)(128.toByte)) == 0.0)
    val w = Array[Byte](138.toByte, 118.toByte, 138.toByte, 118.toByte)
    assert(math.abs(Multimodal.stubEnergy(w) - 10.0) < 1e-12)
    assert(Multimodal.stubEnergy(Array.emptyByteArray) == 0.0)
  }
}
