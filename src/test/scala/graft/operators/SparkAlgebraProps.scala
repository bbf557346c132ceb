package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/** Property-based laws for the distributed algorithms, on arbitrary
  * (small, seeded) inputs. Few successful cases each — every case runs
  * Spark jobs — but each case is a full adversarial instance the
  * example specs never enumerate (random graphs, random splits).
  */
object SparkAlgebraProps extends Properties("graft.spark-algebra") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.TestSpark.spark

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, 25L)
      b <- Gen.choose(1L, 25L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges

  property("connectedComponents == union-find on random graphs") =
    forAll(edgesGen) { edges =>
      import spark.implicits._
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }

  property("connectedComponentsStar == union-find on random graphs") =
    forAll(edgesGen) { edges =>
      import spark.implicits._
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponentsStar(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }

  private val rowsGen: Gen[List[(Long, Long, Boolean)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 8L)     // key
      v <- Gen.choose(-50L, 50L)  // measure
      inDelta <- Gen.oneOf(true, false)
    } yield (k, v, inDelta))
  } yield rows

  property("refreshAgg(base, delta) == direct aggregation of the union") =
    forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("k", "v", "in_delta")
      def agg(d: org.apache.spark.sql.DataFrame) = d.groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val merged = Merge.refreshAgg(
        agg(df.filter(!col("in_delta"))), agg(df.filter(col("in_delta"))),
        "k", Seq("n", "s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val direct = agg(df)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      merged == direct
    }

  property("split3 is disjoint and exhaustive for any fractions") =
    forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, b) =>
      import spark.implicits._
      val trainFrac = math.min(a, b)
      val valFrac = math.max(a, b) - trainFrac
      val df = (1L to 200L).toDF("id")
      val (tr, va, te) = Sampling.split3(df, col("id"), trainFrac, valFrac)
      val sets = Seq(tr, va, te).map(_.collect().map(_.getLong(0)).toSet)
      sets.combinations(2).forall { case Seq(x, y) => (x & y).isEmpty } &&
        sets.reduce(_ ++ _) == (1L to 200L).toSet
    }

  property("deterministic shuffle is a permutation for any seed") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { seed =>
      import spark.implicits._
      val df = (1L to 100L).toDF("id")
      val order = Sampling.shuffleDeterministic(df, col("id"), seed)
        .collect().map(_.getLong(0)).toSeq
      val again = Sampling.shuffleDeterministic(df.repartition(7), col("id"), seed)
        .collect().map(_.getLong(0)).toSeq
      order.sorted == (1L to 100L) && order == again
    }

  // ---- redactPiiOver laws: random documents assembled from PII and
  // near-PII segments (the adversarial mixes the example spec never
  // enumerates: adjacent categories, Luhn-invalid near-cards, digit
  // runs, bare dots)
  private val piiSegGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("alpha", "bravo9", "x", "the"),
    for { u <- Gen.choose(1, 99); d <- Gen.oneOf("ex.org", "a-b.co.uk") }
      yield s"user$u@$d",
    Gen.choose(0, 999).map(n => f"$n%03d-45-6789"),          // SSN
    Gen.choose(0, 999).map(n => f"+1-555-$n%03d-0199"),      // intl phone
    Gen.choose(0, 999).map(n => f"415-$n%03d-0137"),         // US phone
    Gen.choose(0, 255).map(o => s"10.20.$o.40"),             // IPv4
    Gen.const("4539578763621486"),                           // Luhn-valid
    Gen.const("4539578763621487"),                           // Luhn-INVALID
    Gen.oneOf("1234", "1.2", "12-34", "....", "@", "+1-"))   // near-misses
  private val piiDocGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, piiSegGen).map(_.mkString(" ")))

  property("redactPiiOver is idempotent and leaves no redactable PII") =
    forAll(Gen.listOfN(6, piiDocGen)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Corpus.redactPiiOver(docs)
      val clean = once.select(col("doc_id"), col("clean_text").as("text"))
      // nothing redactable survives: a second pass counts zero in
      // every class and rewrites nothing
      val twice = Corpus.redactPiiOver(clean).collect()
      val counts = twice.forall(r =>
        r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0 &&
          r.getLong(4) == 0 && r.getLong(5) == 0)
      val onceTexts = once.collect()
        .map(r => r.getLong(0) -> r.getString(6)).toMap
      val twiceTexts = twice.map(r => r.getLong(0) -> r.getString(6)).toMap
      counts && twiceTexts == onceTexts
    }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(8, Gen.choose(-100, 100)).map(_.map(_ / 100.0f).toArray)

  property("mmrSelect: distinct picks, greedy head, lambda=1 is the sort order") =
    forAll(Gen.choose(1, 12), Gen.choose(0.0, 1.0),
      Gen.listOfN(14, vecGen)) { (k, lambda, vs) =>
      val vecs = vs.toArray
      val n = vecs.length
      val ids = Array.tabulate(n)(i => (i + 1).toLong)
      val q = vecs.head
      val simq = vecs.map(v => Ann.cosine4Local(q, v))
      val out = Ann.mmrSelect(ids, vecs, simq, k, lambda)
      val picked = out.map(_._2)
      // ranks 1..min(k,n), all picks distinct, every pick a real id
      val shapeOk = out.map(_._1) == (1L to math.min(k, n).toLong) &&
        picked.distinct == picked && picked.forall(ids.contains)
      // the head pick is the pure-relevance argmax (empty selected set
      // means the diversity term is zero for EVERY lambda), id tie-break
      val bestSim = simq.max
      val headOk = picked.head ==
        ids(simq.indexWhere(_ == bestSim))
      // lambda=1: plain relevance order with (sim desc, id) tie-break
      val sorted = ids.zip(simq).sortBy { case (id, s) => (-s, id) }
        .take(math.min(k, n)).map(_._1).toSeq
      val lambda1Ok = Ann.mmrSelect(ids, vecs, simq, k, 1.0)
        .map(_._2) == sorted
      shapeOk && headOk && lambda1Ok
    }
}
