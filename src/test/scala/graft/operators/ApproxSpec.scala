package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  test("q28 HLL distinct is within 5% of exact") {
    Approx.q28ApproxDistinct(spark, dir).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx percentiles bracket the exact medians") {
    val exact = Relational.q27Percentile(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    Approx.approxPercentiles(spark, dir).collect().foreach { r =>
      val p50 = r.getSeq[Double](1)(1)
      val e = exact(r.getString(0))
      assert(math.abs(p50 - e) <= 1.0, s"p50 $p50 vs exact $e")
    }
  }
}
