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
      (6L, "ab"),                // tiny-path pair with 7
      (7L, "ac"),
      (8L, "zz"),
      (9L, "quick brown fox")).toDF("id", "s") // exact dup of 1 —
    // collapses to the min-id representative, never a pair of its own
    val got = FuzzyJoin.fuzzyJoinOver(strs, maxDist = 1)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 3L, 1L), (1L, 4L, 1L), (6L, 7L, 1L)))
  }

  test("d14 == brute-force Levenshtein all-pairs on distinct corpus titles") {
    import org.apache.spark.sql.functions._
    // the demo's typo-planted titles (char-3 drop on every third doc)
    val titles = graft.Tables(spark, TestSpark.Sf001).documents
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("t0"))
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 3 === 1,
          concat(substring(col("t0"), 1, 2),
            expr("substring(t0, 4, 2147483647)")))
          .otherwise(col("t0")).as("s"))
    val got = FuzzyJoin.fuzzyJoinOver(titles, maxDist = 1)
      .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
      .collect().toSeq
    // reference: min-id representatives, then all-pairs with only the
    // (necessary) length-band cut — the filter the prefix blocking
    // must never beat on recall
    val uniq = titles.groupBy("s").agg(min(col("id")).as("id"))
    val ref = uniq.as("a").join(uniq.as("b"),
        col("a.id") < col("b.id") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= 1 &&
          levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
      .orderBy("id_a", "id_b")
      .collect().toSeq
    assert(got == ref)
    assert(got.nonEmpty) // the sweep finds real near-dup titles
    assert(got.forall(_.getLong(2) == 1L)) // distinct strings ⇒ dist ≥ 1
  }
}
