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

  test("x08 compaction merges small files without losing a row") {
    val t = Tables(spark, dir)
    val path = Files.createTempDirectory("graft_compact").toString + "/orders"
    // fragment: 24 tiny files
    t.orders.repartition(24).write.parquet(path)
    def parquetFiles = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetFiles == 24)
    val expectedCount = t.orders.count()
    val expectedSum = t.orders.agg(sum("o_orderkey")).head.getLong(0)

    val (before, after) = Writers.compact(spark, path, targetBytes = 1L << 30)
    assert(before == 24 && after == 1)
    assert(parquetFiles == 1, s"still $parquetFiles files after compaction")
    val compacted = spark.read.parquet(path)
    assert(compacted.count() == expectedCount)
    assert(compacted.agg(sum("o_orderkey")).head.getLong(0) == expectedSum)
  }
}
