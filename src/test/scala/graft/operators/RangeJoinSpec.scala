package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("bucketed range join equals naive BETWEEN join") {
    import spark.implicits._
    val t = Tables(spark, dir)
    val intervals = Seq(
      ("a", 0.0, 10.0), ("b", 5.0, 25.0), ("c", 24.0, 50.0), ("d", 100.0, 200.0))
      .toDF("tag", "lo", "hi")
    val points = t.lineitem.select(col("l_orderkey"), col("l_quantity"))
    val naive = points.join(intervals,
        col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      .groupBy("tag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fast = RangeJoin.bucketed(points, "l_quantity", intervals, "lo", "hi",
        binWidth = 8.0)
      .groupBy("tag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fast == naive)
    assert(naive.contains("a") && naive.contains("b"))
    // overlapping intervals: a point can match multiple (no dedup loss)
    assert(naive.values.sum > points.count(), "overlap must duplicate matches")
  }

  test("bucketed range join plans a hash join, not a nested loop") {
    import spark.implicits._
    val t = Tables(spark, dir)
    val intervals = Seq(("a", 0.0, 10.0), ("b", 5.0, 25.0)).toDF("tag", "lo", "hi")
    val joined = RangeJoin.bucketed(
      t.lineitem.select("l_orderkey", "l_quantity"), "l_quantity",
      intervals, "lo", "hi", binWidth = 8.0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"NLJ survived:\n$plan")
  }
}
