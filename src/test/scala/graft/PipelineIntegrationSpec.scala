package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FilePipeline

/** End-to-end composition of the engine's surfaces — the workflow a
  * user of the reference actually runs, plus the training-data steps
  * the lake exists for: ingest a remote tree, read payloads as binary,
  * extract text, fingerprint + dedup, and audit the whole run.
  */
class PipelineIntegrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ingest → binary read → text extract → dedup → audit, end to end") {
    // 1. a "remote" source tree with duplicate content across dirs
    val src = Files.createTempDirectory("graft_e2e_src")
    Files.createDirectories(src.resolve("batch1"))
    Files.createDirectories(src.resolve("batch2"))
    Files.writeString(src.resolve("batch1/doc1.txt"), "the quick brown fox jumps")
    Files.writeString(src.resolve("batch1/doc2.txt"), "completely different content here")
    Files.writeString(src.resolve("batch2/doc3.txt"), "the quick brown fox jumps") // dup of doc1
    Files.writeString(src.resolve("batch2/doc4.txt"), "another unique document body")

    // 2. distributed copy into the "lake"
    val lake = Files.createTempDirectory("graft_e2e_lake").toString
    val audit = FilePipeline.syncCopy(spark, src.toString, lake).persist()
    assert(audit.count() == 4 && audit.collect().forall(_.status == "copied"))

    // 3. read the lake as binary (the multimodal ingestion path)
    val bin = spark.read.format("binaryFile").load(s"$lake/*/*.txt")
      .select(col("path"), col("content"))
    assert(bin.count() == 4)

    // 4. decode binary → text, fingerprint with the native expression
    val docs = bin.select(
      col("path"),
      decode(col("content"), "UTF-8").as("text"))
      .withColumn("fp64", functions.F.fingerprint64(col("text")))

    // 5. exact dedup on the fingerprint: one winner per distinct content
    val winners = docs.groupBy("fp64")
      .agg(min(col("path")).as("keep_path"), count(lit(1)).as("n_copies"))
    assert(winners.count() == 3, "4 files, 1 duplicate pair → 3 distinct")
    val dup = winners.filter(col("n_copies") === 2).collect()
    assert(dup.length == 1 && dup.head.getAs[String]("keep_path").contains("doc1"))

    // 6. audit rollup matches the copy
    val sums = FilePipeline.auditSummary(audit).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("batch1" -> 2L, "batch2" -> 2L))
    audit.unpersist()
  }
}
