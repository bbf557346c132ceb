package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class WritersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("partitioned events lake prunes partitions on date filters") {
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_lake").toString + "/events"
    Writers.writeEventsLake(t.events, path)

    val lake = spark.read.parquet(path)
    val q = lake.filter(col("event_date") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      s"no partition filter:\n$plan")
    // correctness: pruned read equals full-scan filter
    val full = t.events.filter(to_date(col("ts")) === "2024-01-02").count()
    assert(q.count() == full)
    assert(full > 0, "need events on the probe date for a meaningful test")
    // physical layout: one directory per date
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("event_date="))
    assert(dirs.nonEmpty)
  }
}
