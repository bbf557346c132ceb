package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/** Fuzzing laws for the hand-written native codegen kernels: each must
  * be BIT-IDENTICAL to its interpreted HOF reference implementation on
  * arbitrary generated text, not just on the corpus the example specs
  * use — empty strings, single tokens, repeated tokens, and non-ASCII
  * all ride the generators.
  */
object NativeKernelProps extends Properties("graft.native-kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.TestSpark.spark

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.oneOf("the", "a", "zyx", "Wort", "héllo", "中文", "data", "x"))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 24)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  private def docsDf(texts: List[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  property("native fused MinHash == interpreted HOF reference") =
    forAll(Gen.listOfN(12, textGen)) { texts =>
      val docs = docsDf(texts)
      val native = Dedup.minhashSignatures(docs, shingleK = 3, numPerm = 16)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = Dedup.minhashSignaturesHof(docs, shingleK = 3, numPerm = 16)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      native == hof
    }

  property("native SimHash == interpreted HOF reference") =
    forAll(Gen.listOfN(12, textGen)) { texts =>
      val docs = docsDf(texts)
      val native = docs.select(col("doc_id"),
        graft.functions.F.simhash64(col("text")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hof = docs.select(col("doc_id"), Dedup.simhash64(col("text")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      native == hof
    }

  property("native shingle-hash set == xxhash64 over HOF shingles") =
    forAll(Gen.listOfN(12, textGen)) { texts =>
      val docs = docsDf(texts)
      val native = Dedup.docShingleHashes(docs, 3)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val hof = Dedup.docShingles(docs, 3)
        .select(col("doc_id"),
          transform(col("sh"), s => xxhash64(s)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      native == hof
    }
}
