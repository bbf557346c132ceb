package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("d14 finds planted typos and nothing else") {
    import spark.implicits._
    val strs = Seq(
      (1L, "quick brown fox"),
      (2L, "quick brwon fox"),   // transposition = 2 edits — OUT at t=1
      (3L, "quick brown fax"),   // 1 substitution — IN
      (4L, "quick brown foxx"),  // 1 insertion — IN
      (5L, "slow green turtle"), // unrelated
      (6L, "ab"),                // short-path pair with 7
      (7L, "ac"),
      (8L, "zz")).toDF("id", "s")
    val got = FuzzyJoin.fuzzyJoinOver(strs, maxDist = 1)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 3L, 1L), (1L, 4L, 1L), (6L, 7L, 1L)))
  }

  test("d14 == brute-force Levenshtein all-pairs on corpus titles") {
    import org.apache.spark.sql.functions._
    val titles = graft.Tables(spark, TestSpark.Sf001).documents
      .select(col("doc_id").as("id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("s"))
    val got = FuzzyJoin.fuzzyJoinOver(titles, maxDist = 1)
      .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
      .collect().toSeq
    // reference: all-pairs with only the (necessary) length-band cut —
    // the filter the blocking must never beat on recall
    val ref = titles.as("a").join(titles.as("b"),
        col("a.id") < col("b.id") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= 1 &&
          levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
      .orderBy("id_a", "id_b")
      .collect().toSeq
    assert(got == ref)
    assert(got.nonEmpty) // the sweep finds real near-dup titles
  }
}
