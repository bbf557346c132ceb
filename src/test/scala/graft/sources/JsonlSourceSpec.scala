package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JsonlSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("f10 ingest parses good lines and quarantines malformed ones") {
    val dir = Files.createTempDirectory("graft_f10_spec").toString
    Files.write(Paths.get(s"$dir/part-0.jsonl"), java.util.Arrays.asList(
      """{"doc_id":1,"lang":"en","source":"web","n_chars":42}""",
      """{"doc_id":2,"lang":"fr","source":"book","n_chars":7""", // truncated
      """not json at all""",
      """{"doc_id":3,"lang":"de","source":"web","n_chars":9}"""))
    val got = JsonlSource.ingestJsonl(spark, dir)
    val rows = got.collect()
    assert(rows.length == 4) // conservation: arrived = parsed + corrupt
    val good = rows.filter(_.isNullAt(4)).map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(good.toSet == Set((1L, "en", "web", 42L), (3L, "de", "web", 9L)))
    val bad = rows.filter(!_.isNullAt(4)).map(_.getString(4))
    assert(bad.toSet == Set(
      """{"doc_id":2,"lang":"fr","source":"book","n_chars":7""",
      "not json at all"))
    // corrupt rows carry no parsed fields
    assert(rows.filter(!_.isNullAt(4)).forall(r =>
      r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
  }

  test("f10 demo round-trips the documents table through real files") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, TestSpark.Sf0001).documents
    val out = JsonlSource.f10JsonlIngest(spark, TestSpark.Sf0001)
    // counts read off one materialized result: a corrupt-only
    // projection against the raw source is disallowed by Spark
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN — see the ingestJsonl docs)
    val rows = out.collect()
    assert(rows.length == docs.count()) // arrived = parsed + corrupt
    val nCorrupt = rows.count(_.getBoolean(4))
    assert(nCorrupt == docs.filter(col("doc_id") % 97 === 0).count())
    assert(nCorrupt > 0)
    // every parsed row's fields equal the source row's (full round-trip)
    val mismatch = out.filter(!col("is_corrupt"))
      .join(docs.select(col("doc_id"), col("lang").as("l2"),
        col("source").as("s2"), col("n_chars").as("n2")), Seq("doc_id"))
      .filter(col("lang") =!= col("l2") || col("source") =!= col("s2") ||
        col("n_chars") =!= col("n2"))
      .count()
    assert(mismatch == 0)
  }
}
