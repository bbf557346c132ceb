package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  test("hash sample is deterministic and layout-independent") {
    val t = Tables(spark, dir)
    val docs = t.documents
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(17), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same rows regardless of partitioning")
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.2 && rate < 0.4, s"empirical rate $rate")
    // nested property: a lower-rate sample is a subset of a higher-rate one
    val c = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("stratified sample applies per-stratum rates") {
    val t = Tables(spark, dir)
    val out = Sampling.stratifiedSample(t.documents, col("doc_id"),
      col("lang"), Map("en" -> 0.8, "zh" -> 0.1), defaultRate = 0.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = t.documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("en", "zh"), "default 0 drops other strata")
    assert(byLang("en").toDouble / totals("en") > 0.6)
    assert(byLang("zh").toDouble / totals("zh") < 0.25)
  }

  test("3-way split is disjoint and exhaustive") {
    val t = Tables(spark, dir)
    val docs = t.documents
    val (tr, va, te) = Sampling.split3(docs, col("doc_id"), 0.7, 0.15)
    val n = docs.count()
    val (a, b, c) = (tr.count(), va.count(), te.count())
    assert(a + b + c == n)
    val ids = (tr.select("doc_id").collect() ++ va.select("doc_id").collect() ++
      te.select("doc_id").collect()).map(_.getLong(0))
    assert(ids.distinct.length == n)
    assert(a.toDouble / n > 0.6 && a.toDouble / n < 0.8)
  }

  test("x16 deterministic shuffle is a reproducible, seed-sensitive permutation") {
    val t = graft.Tables(spark, dir)
    val docs = t.documents.select("doc_id")
    def order(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      Sampling.shuffleDeterministic(df, col("doc_id"), seed)
        .collect().map(_.getLong(0)).toSeq
    val a = order(docs, 42L)
    // permutation: same multiset, different order than the identity
    assert(a.sorted == docs.collect().map(_.getLong(0)).toSeq.sorted)
    assert(a != a.sorted, "hash order degenerated to the identity")
    // reproducible across runs AND physical layouts
    assert(order(docs, 42L) == a)
    assert(order(docs.repartition(17), 42L) == a)
    // seed-sensitive
    assert(order(docs, 43L) != a)
  }
}
