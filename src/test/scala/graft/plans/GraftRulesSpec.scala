package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.F

class GraftRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("cosine_sim(x, x) folds away the kernel call, null-preserving") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val df = e.select(F.cosineSim(col("embedding"), col("embedding")).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim"), s"not folded:\n$optimized")
    assert(optimized.contains("1.0"), s"no literal:\n$optimized")
    assert(df.collect().forall(_.getDouble(0) == 1.0))
  }

  test("cosine_sim(x, y) with distinct children is untouched") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.select(col("embedding").as("qv")).limit(1)
    val df = e.crossJoin(q)
      .select(F.cosineSim(col("embedding"), col("qv")).as("c"))
    assert(df.queryExecution.optimizedPlan.toString.contains("cosine_sim"))
  }

  test("redundant nested round collapses") {
    val df = spark.range(1).select(
      round(round(lit(3.14159265), 4), 6).as("r"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("round(round"), s"nested round survived:\n$optimized")
    assert(df.head.getDouble(0) == 3.1416)
  }
}
