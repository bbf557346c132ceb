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

  test("q28 sketch is partition-order deterministic (max-merge is commutative)") {
    // registers merge by MAX, so the estimate is a pure function of
    // the data SET — hostile repartitionings must reproduce it
    // bit-for-bit, or the DuckDB oracle replay itself would flake
    val base = Approx.q28ApproxDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    for (parts <- Seq(1, 13)) {
      val t = graft.Tables(spark, dir)
      val got = Approx.hllDistinct(
          t.lineitem.repartition(parts)
            .select(org.apache.spark.sql.functions.col("l_returnflag"),
              org.apache.spark.sql.functions.col("l_partkey")),
          "l_returnflag", org.apache.spark.sql.functions.col("l_partkey"))
        .orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == base.map(b => (b._1, b._2)),
        s"sketch drifted under repartition($parts)")
    }
  }

  test("q28 exercises both estimator branches across cardinalities") {
    // linear counting fires below E ≤ 2.5m (n ≪ 10240), the raw
    // harmonic estimate above it; both must stay within the bound.
    // n = 200 ≪ 2.5m forces linear counting; n = 60000 forces raw.
    import spark.implicits._
    for (n <- Seq(200L, 60000L)) {
      val df = spark.range(n).select(
        org.apache.spark.sql.functions.lit("g").as("g"),
        org.apache.spark.sql.functions.col("id"))
      val est = Approx.hllDistinct(df, "g",
        org.apache.spark.sql.functions.col("id")).collect()(0).getLong(1)
      assert(math.abs(est - n).toDouble / n < 0.05, s"n=$n est=$est")
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
