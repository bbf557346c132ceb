package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("s16 BM25 scores == plain-Scala Okapi replay on a planted corpus") {
    import spark.implicits._
    // query doc 0 = "apple banana"; corpus: d1 has apple×2, d2 has
    // banana×1, d3 has no query term at all
    val docs = Seq(
      (0L, "apple banana"),
      (1L, "apple apple cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "cherry date")).toDF("doc_id", "text")
    val got = HybridSearch.bm25ScoresOver(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replay with the EXACT expression tree the operator declares
    val nd = 3L; val tt = 9L
    def term(tf: Long, dl: Long, df: Long): Double = {
      val x = 1.0 + (((nd - df) + 0.5) / (df + 0.5))
      val raw = StrictMath.log(x) *
        ((tf * 2.2) / (tf + 0.3 + 0.9 * ((dl * nd).toDouble / tt)))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == Map(1L -> term(2, 3, 1), 2L -> term(1, 4, 1)))
  }

  test("s16 fused output is internally consistent on the corpus") {
    val out = HybridSearch.s16HybridSearch(spark, TestSpark.Sf001)
      .collect()
    assert(out.length == 20)
    out.foreach { r =>
      val rb = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rv = if (r.isNullAt(2)) None else Some(r.getLong(2))
      // every emitted doc is in at least one leg's top-100, and the
      // reported rrf is exactly the fusion of its reported ranks
      assert(rb.nonEmpty || rv.nonEmpty)
      val expected = rb.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(r.getDouble(3) == expected)
    }
    // descending rrf with doc_id tie-break
    val pairs = out.map(r => (r.getDouble(3), r.getLong(0)))
    assert(pairs.sliding(2).forall {
      case Array((s1, d1), (s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
  }
}
