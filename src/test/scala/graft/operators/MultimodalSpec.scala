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
}
