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
    Gen.oneOf("the", "a", "zyx", "Wort", "héllo", "中文", "data", "x",
      "a,b", ",", "big,data"))

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

  property("markerCount == driver-side exact token membership count") =
    forAll(Gen.listOfN(10, textGen)) { texts =>
      val docs = docsDf(texts)
      val markers = Set("the", "a", "中文", "x")
      val native = docs.select(col("doc_id"),
        graft.functions.F.markerCount(col("text"), markers.mkString(",")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ", -1).count(markers).toLong
      }.toMap
      native == expected
    }

  property("dotProd == driver left-to-right double fold, bit-identical") =
    forAll(Gen.listOfN(6,
      Gen.zip(Gen.listOfN(8, Gen.choose(-100.0, 100.0)),
        Gen.listOfN(8, Gen.choose(-100.0, 100.0))))) { pairs =>
      import spark.implicits._
      val vecs = pairs.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, a.map(_.toFloat).toArray, b.map(_.toFloat).toArray)
      }
      val df = vecs.toDF("id", "a", "b")
      val native = df.select(col("id"),
        graft.functions.F.dotProd(col("a"), col("b")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected = vecs.map { case (i, a, b) =>
        i -> Ann.dotLocal(a, b)
      }.toMap
      native == expected // bit-exact: same fold order, same widening
    }

  property("i8Quantize == floor reference; dequantized error ≤ scale/2") =
    forAll(Gen.listOfN(6, Gen.oneOf(
      Gen.listOfN(8, Gen.choose(-100.0, 100.0)),
      Gen.const(List.fill(8)(0.0))))) { vecs0 =>
      import spark.implicits._
      val vecs = vecs0.zipWithIndex.map { case (v, i) =>
        (i.toLong, v.map(_.toFloat).toArray)
      }
      val native = vecs.toDF("id", "v")
        .select(col("id"), graft.functions.F.i8Quantize(col("v")))
        .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
      vecs.forall { case (i, v) =>
        val maxAbs = v.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
        val expected =
          if (maxAbs == 0.0) v.map(_ => 0.toByte).toSeq
          else v.map(x =>
            math.floor(x.toDouble / (maxAbs / 127.0) + 0.5).toByte).toSeq
        val scale = if (maxAbs == 0.0) 0.0 else maxAbs / 127.0
        native(i) == expected &&
          native(i).zip(v).forall { case (q, x) =>
            math.abs(q * scale - x.toDouble) <= scale / 2 + 1e-12
          }
      }
    }

  property("i8Dot == exact BigInt reference") =
    forAll(Gen.listOfN(6,
      Gen.zip(Gen.listOfN(8, Gen.choose(-127, 127)),
        Gen.listOfN(8, Gen.choose(-127, 127))))) { pairs =>
      import spark.implicits._
      // Seq[Byte], not Array[Byte]: the latter encodes as BINARY while
      // the kernel contract is array<tinyint> (i8Quantize's output type)
      val vecs = pairs.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, a.map(_.toByte), b.map(_.toByte))
      }
      val native = vecs.toDF("id", "a", "b")
        .select(col("id"), graft.functions.F.i8Dot(col("a"), col("b")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      vecs.forall { case (i, a, b) =>
        native(i) == a.zip(b).map { case (x, y) =>
          BigInt(x.toInt) * BigInt(y.toInt) }.sum.toLong
      }
    }

  property("jaccardH64 == builtin intersect/union form, bit-identical") =
    forAll(Gen.listOfN(6,
      Gen.zip(Gen.listOf(Gen.choose(-8L, 8L)),
        Gen.listOf(Gen.choose(-8L, 8L))))) { pairs =>
      import spark.implicits._
      // distinct inputs are the kernel's contract (shingle-hash sets);
      // the tight value range forces real overlaps
      val vecs = pairs.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, a.distinct, b.distinct)
      }
      val df = vecs.toDF("id", "a", "b")
      val native = df
        .select(col("id"), graft.functions.F.jaccardH64(col("a"), col("b")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // ANSI guard: the builtin form throws on 0/0 (an edge no real
      // shingle producer emits — they yield NULL, never []); the
      // kernel pins it to NaN, the pre-ANSI builtin value
      val ref = df
        .select(col("id"),
          when(size(array_union(col("a"), col("b"))) === 0,
            lit(Double.NaN))
            .otherwise(size(array_intersect(col("a"), col("b")))
              .cast("double") / size(array_union(col("a"), col("b")))))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      vecs.forall { case (i, _, _) =>
        // NaN == NaN for the empty-empty edge; otherwise bit equality
        (native(i).isNaN && ref(i).isNaN) || native(i) == ref(i)
      }
    }

  property("cosineSim4 == rounded driver fold, bit-identical") =
    forAll(Gen.listOfN(6,
      Gen.zip(Gen.listOfN(8, Gen.choose(-100.0, 100.0)),
        Gen.listOfN(8, Gen.choose(-100.0, 100.0))))) { pairs =>
      import spark.implicits._
      val vecs = pairs.zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, a.map(_.toFloat).toArray, b.map(_.toFloat).toArray)
      }
      val df = vecs.toDF("id", "a", "b")
      val native = df.select(col("id"),
        graft.functions.F.cosineSim4(col("a"), col("b")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected = vecs.map { case (i, a, b) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        while (j < a.length) {
          val x = a(j).toDouble; val y = b(j).toDouble
          dot += x * y; na += x * x; nb += y * y
          j += 1
        }
        // Spark's round(_, 4) is BigDecimal HALF_UP on the exact double
        i -> BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
      native == expected
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

  property("positional shingle hashes == xxhash64 over HOF positional shingles") =
    forAll(Gen.listOfN(12, textGen)) { texts =>
      val docs = docsDf(texts)
      val native = docs.select(col("doc_id"),
        graft.functions.F.shinglePosHashes64(col("text"), 3).as("h"))
        .filter(col("h").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val toks = split(col("text"), " ")
      val hof = docs
        .filter(size(toks) >= 3)
        .select(col("doc_id"),
          transform(sequence(lit(0), size(toks) - 3),
            i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(3)))))
            .as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      native == hof
    }

  property("one-pass repetition kernel == explode formulation, value-exact") =
    forAll(Gen.listOfN(10, textGen)) { texts =>
      val docs = docsDf(texts)
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      asMap(TextOps.repetitionOver(docs)) ==
        asMap(TextOps.repetitionOverExploded(docs))
    }

  /** Plain-Scala greedy longest-match reference for subwordStats. */
  private def subwordRef(text: String, vocab: Seq[String]): (Long, Long) = {
    val sorted = vocab.sortBy(p => (-p.length, p))
    var pos = 0; var nSub = 0L; var nUnk = 0L
    while (pos < text.length) {
      sorted.find(p => text.startsWith(p, pos)) match {
        case Some(p) => pos += p.length
        case None    => nUnk += 1; pos += 1
      }
      nSub += 1
    }
    (nSub, nUnk)
  }

  property("subwordStats kernel == driver-side greedy longest-match") =
    forAll(Gen.listOfN(10, textGen)) { texts =>
      val docs = docsDf(texts)
      val vocab = TextOps.SubwordVocab
      val native = docs.select(col("doc_id"),
        TextOps.subwordStatsCol(col("text")))
        .collect().map(r => r.getLong(0) -> {
          val a = r.getSeq[Long](1); (a(0), a(1))
        }).toMap
      val expected = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> subwordRef(t, vocab)
      }.toMap
      native == expected
    }

  /** Plain-Scala greedy reference emitting vocab indices (UNK → −1). */
  private def subwordIdsRef(text: String, vocab: Seq[String]): List[Int] = {
    val sorted = vocab.zipWithIndex.sortBy { case (p, _) => (-p.length, p) }
    var pos = 0
    val out = List.newBuilder[Int]
    while (pos < text.length) {
      sorted.find { case (p, _) => text.startsWith(p, pos) } match {
        case Some((p, i)) => out += i; pos += p.length
        case None         => out += -1; pos += 1
      }
    }
    out.result()
  }

  property("subwordIds kernel == driver-side greedy ids (comma pieces ride the U+001F encoding)") =
    forAll(Gen.listOfN(10, textGen)) { texts =>
      val docs = docsDf(texts)
      val vocab = TextOps.SubwordVocab
      val native = docs.select(col("doc_id"),
        TextOps.subwordIdsCol(col("text")))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      val expected = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> subwordIdsRef(t, vocab)
      }.toMap
      native == expected
    }
}
