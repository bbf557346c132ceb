package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("bucketed fact-fact join plans without a shuffle on either side") {
    val t = Tables(spark, dir)
    Bucketing.writeBucketed(t.lineitem.select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(t.orders.select("o_orderkey", "o_orderpriority"),
      "b_orders", "o_orderkey", 8)
    val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders",
      "l_orderkey", "o_orderkey")
    // disable broadcast so the co-location (not size) is what avoids
    // the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // and it's still correct
      val n = joined.count()
      val expected = t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
