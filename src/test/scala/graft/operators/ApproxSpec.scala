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

  test("q28 sketch is partition-order deterministic (HLL merge is commutative)") {
    // the property that justifies q28's rows-only status: the VALUE is
    // estimator-specific (no cross-engine oracle can exist), but for a
    // fixed engine it is a pure function of the data SET — hostile
    // repartitionings must reproduce it bit-for-bit, or the driver's
    // rows-only check itself would flake
    val base = Approx.q28ApproxDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    for (parts <- Seq(1, 13)) {
      val t = graft.Tables(spark, dir)
      val got = t.lineitem.repartition(parts)
        .groupBy("l_returnflag")
        .agg(
          org.apache.spark.sql.functions.approx_count_distinct(
            org.apache.spark.sql.functions.col("l_partkey"))
            .as("approx_parts"),
          org.apache.spark.sql.functions.countDistinct(
            org.apache.spark.sql.functions.col("l_partkey"))
            .as("exact_parts"))
        .orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == base, s"sketch drifted under repartition($parts)")
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
