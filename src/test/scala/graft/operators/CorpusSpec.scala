package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  test("c01 resolves every near-dup pair among survivors to one winner") {
    val survivors = Corpus.c01CleanCorpus(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the pairs c01 actually decides on: near-dups among the
    // gated+exact-deduped survivors (a doc can only lose to a winner
    // that itself survived stages 1-2)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairInput = Corpus.exactDedupKept(Corpus.qualityGate(docs))
    val pairs = Dedup.d02PairsOver(pairInput, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(!(survivors.contains(a) && survivors.contains(b)),
        s"both of near-dup pair ($a,$b) survived")
      assert(survivors.contains(a) || !survivors.contains(b),
        s"loser $b survived while winner $a was dropped")
    }
  }

  test("c01 keeps the bulk of a clean corpus") {
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val kept = Corpus.c01CleanCorpus(spark, dir).count()
    // this corpus: ~25 near-dup losers + any short docs
    assert(kept >= total - 50 && kept < total)
  }
}
