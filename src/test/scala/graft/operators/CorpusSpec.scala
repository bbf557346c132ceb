package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  test("c26 bloom decontamination: no false negatives vs the exact gram sets, FPs bounded") {
    import spark.implicits._
    val out = Corpus.c26BloomDecontam(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // serial EXACT reference on gram STRINGS (the corpus itself plants
    // near-duplicate texts, so real overlap exists beyond the passage
    // plant — the exact sets are the ground truth, not the plant)
    val passage = Dedup.SharedPassage.mkString(" ")
    val texts = graft.Tables(spark, dir).documents
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    def grams(t: String): Set[String] =
      t.split(" ", -1).toSeq.sliding(13).filter(_.size == 13)
        .map(_.mkString(" ")).toSet
    val benchSet = texts.filter(_._1 % 10 == 0)
      .flatMap { case (_, t) => grams(t + " " + passage) }.toSet
    val train = texts.filter(_._1 % 10 != 0).map { case (id, t) =>
      id -> grams(if (id % 7 == 0) t + " " + passage else t)
    }
    assert(out.keySet == train.map(_._1).toSet)
    var fps = 0
    train.foreach { case (id, gs) =>
      val (ng, nh, c) = out(id)
      assert(ng == gs.size.toLong, s"doc $id gram count")
      val exact = gs.count(benchSet)
      // bloom law: no false negatives, per gram — hits can only exceed
      assert(nh >= exact.toLong, s"doc $id: $nh hits < $exact exact")
      if (exact > 0) assert(c == 1L, s"contaminated doc $id not flagged")
      if (exact == 0 && c == 1L) fps += 1
      if (id % 7 == 0) assert(c == 1L && nh >= 8L, s"planted doc $id")
    }
    // deterministic fixed-seed sketch: FPs possible but must stay rare
    assert(fps <= math.max(1, train.size / 100), s"$fps bloom FP docs")
  }

  test("c26 plan: the sketch rides as a literal — no join on the scoring path") {
    val df = Corpus.c26BloomDecontam(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // exactly ONE join in the whole query: the short-doc backfill
    // (train left-join scores); the bloom probe itself is a literal
    // per-row expression — a second join would mean the sketch is
    // being joined in as data
    val joins = "Join".r.findAllIn(plan).size
    assert(plan.contains("might_contain"), "bloom probe missing from plan")
    assert(joins <= 2, s"unexpected joins on the c26 scoring path:\n$plan")
  }

  test("c26 refuses an empty benchmark sketch loudly") {
    import spark.implicits._
    // zero benchmark docs AND docs too short to carry one 13-gram:
    // both yield a NULL BloomFilterAggregate, and might_contain(NULL)
    // would score every train doc (0 hits, clean) — the gate silently
    // OFF. Must raise instead (r15 wave).
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val short = Seq((1L, "too short for thirteen")).toDF("doc_id", "text")
    for (bench <- Seq(empty, short)) {
      val ex = intercept[IllegalArgumentException] {
        Corpus.c26Sketch(bench, gramK = 13,
          estItems = 1L << 10, numBits = 1L << 14)
      }
      assert(ex.getMessage.contains("zero 13-grams"), ex.getMessage)
    }
  }

  test("c28 buckets == plain-Scala ntile replay over the hash sample") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val out = Corpus.c28CcnetBuckets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getString(4)))
    assert(out.nonEmpty)
    // the one non-Scala kernel: the sample gate's xxhash64 verdict
    val inSample = graft.Tables(spark, dir).documents
      .select(col("doc_id"),
        (pmod(xxhash64(col("doc_id")), lit(4L)) === 0L).as("s"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // replay: per lang, ntile(3) over the sampled scored docs ordered
    // by (mean_lp desc, doc_id) — standard ntile (first n%3 tiles one
    // larger) — then min-per-tile cutoffs and the >= assignment
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val sample = rows.filter(r => r._3.isDefined && inSample(r._1))
        .sortBy(r => (-r._3.get, r._1))
      val bounds =
        if (sample.isEmpty) None
        else {
          val n = sample.length
          val base = n / 3
          val sizes = (0 until 3).map(i => base + (if (i < n % 3) 1 else 0))
          val t1 = sample.take(sizes(0))
          val t2 = sample.slice(sizes(0), sizes(0) + sizes(1))
          Some((t1.map(_._3.get).min,
            if (t2.isEmpty) None else Some(t2.map(_._3.get).min)))
        }
      rows.foreach { case (id, _, lp, bucket) =>
        val want = (lp, bounds) match {
          case (None, _) => "unscored"
          case (_, None) => "unsampled"
          case (Some(v), Some((b1, _))) if v >= b1 => "head"
          case (Some(v), Some((_, Some(b2)))) if v >= b2 => "middle"
          case _ => "tail"
        }
        assert(bucket == want, s"doc $id lang $lang: $bucket != $want")
      }
      // cutoffs are the tier's minimum: within a sampled lang, every
      // SAMPLED scored doc's tile agrees with its assigned bucket
      bounds.foreach { case (b1, _) =>
        sample.headOption.foreach { top =>
          assert(top._3.get >= b1 && rows.find(_._1 == top._1).get._4 == "head")
        }
      }
    }
    // every verdict class is exercised or explicitly absent
    val buckets = out.map(_._4).toSet
    assert(Set("head", "middle", "tail").subsetOf(buckets), buckets)
  }

  test("c14 importance weights == plain-Scala DSIR recompute on a hand corpus") {
    import spark.implicits._
    // fixture bigrams are all distinct strings (no two docs share a
    // bigram unless planted), so each distinct bigram is its own
    // 2^16 bucket w.h.p. — expected weights derive from bigram-string
    // counts alone
    val raw = Seq(
      (1L, "alpha beta gamma"),        // bigrams: "alpha beta","beta gamma"
      (2L, "alpha beta delta"),        // "alpha beta","beta delta"
      (3L, "epsilon zeta eta theta"),  // 3 unique bigrams
      (4L, "iota kappa")).toDF("doc_id", "text") // 1 unique bigram
    val target = Seq(
      (1L, "alpha beta gamma"),
      (9L, "alpha beta mu")).toDF("doc_id", "text")
    val b = 65536
    // bigram counts: raw N = 2+2+3+1 = 8; target N = 2+2 = 4
    val rawC = Map("alpha beta" -> 2L, "beta gamma" -> 1L,
      "beta delta" -> 1L, "epsilon zeta" -> 1L, "zeta eta" -> 1L,
      "eta theta" -> 1L, "iota kappa" -> 1L)
    val tgtC = Map("alpha beta" -> 2L, "beta gamma" -> 1L,
      "alpha mu" -> 0L, "beta mu" -> 1L)
    val (nRaw, nTgt) = (8L, 4L)
    def lr(g: String): Double =
      StrictMath.log((tgtC.getOrElse(g, 0L) + 1L).toDouble / (nTgt + b)) -
        StrictMath.log((rawC(g) + 1L).toDouble / (nRaw + b))
    def weight(bigrams: Seq[String]): Double =
      bigrams.groupBy(identity).map { case (g, occ) =>
        BigDecimal(occ.size * lr(g))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
    val expected = Map(
      1L -> (2L, weight(Seq("alpha beta", "beta gamma"))),
      2L -> (2L, weight(Seq("alpha beta", "beta delta"))),
      3L -> (3L, weight(Seq("epsilon zeta", "zeta eta", "eta theta"))),
      4L -> (1L, weight(Seq("iota kappa"))))
    val got = Corpus.importanceWeightsOver(raw, target)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == expected)
    // the signal points the right way: docs sharing the target's
    // bigrams outscore the disjoint ones
    assert(got(1L)._2 > got(3L)._2 && got(2L)._2 > got(4L)._2)
  }

  test("c15 schedule == naive driver-side quality ranking") {
    val docs = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def quality(text: String): Double = {
      val toks = text.split(" ", -1)
      if (toks.length < 8) 0.0
      else {
        val stop = toks.count(t => t == "the" || t == "a")
        BigDecimal(1.0 - stop.toDouble / toks.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val n = docs.length.toLong
    val expected = docs
      .map { case (id, text) =>
        (id, quality(text), text.split(" ", -1).length.toLong)
      }
      .sortBy { case (id, q, _) => (-q, id) }
      .zipWithIndex
      .map { case ((_, q, toks), i) => ((i.toLong * 4L) / n, q, toks) }
      .groupBy(_._1)
      .map { case (phase, rows) =>
        phase -> (rows.length.toLong, rows.map(_._3).sum,
          rows.map(_._2).min, rows.map(_._2).max)
      }
    val got = Corpus.c15CurriculumPhases(spark, TestSpark.Sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got == expected)
    // phases balanced; phase 0 (the annealing slice) strictly
    // dominates the last phase on quality
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1)
    assert(got(0L)._3 >= got(3L)._4,
      s"phase 0 min ${got(0L)._3} < phase 3 max ${got(3L)._4}")
  }

  test("c14 demo: target-source docs outscore the rest on average") {
    val docs = graft.Tables(spark, TestSpark.Sf0001).documents
    val tgt = docs.select(org.apache.spark.sql.functions.min(
      org.apache.spark.sql.functions.col("source")))
      .collect().head.getString(0)
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val w = Corpus.c14ImportanceWeights(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    val (in, out) = w.partition { case (id, _) => srcOf(id) == tgt }
    assert(in.nonEmpty && out.nonEmpty)
    val meanIn = in.map(_._2).sum / in.size
    val meanOut = out.map(_._2).sum / out.size
    assert(meanIn > meanOut,
      s"target-source mean $meanIn ≤ other mean $meanOut — no signal")
  }

  test("c09 distributed prefix-sum == naive global window, any layout") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, TestSpark.Sf0001).documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n_tokens"))
    val naive = docs
      .withColumn("tok_start",
        coalesce(sum(col("n_tokens")).over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("seq_first", expr("tok_start div 512"))
      .withColumn("seq_last", expr("(tok_start + n_tokens - 1) div 512"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
      .select("doc_id", "n_tokens", "tok_start", "seq_first", "seq_last",
        "n_seqs")
      .orderBy("doc_id").collect()
    // adversarial input layouts: the result must not depend on them
    for (layout <- Seq(docs, docs.repartition(7), docs.coalesce(1))) {
      val got = Corpus.packOffsetsOver(layout, 512L).orderBy("doc_id").collect()
      assert(got.toSeq == naive.toSeq)
    }
  }

  test("c09 packs a hand fixture: offsets, straddles, sequence spans") {
    import spark.implicits._
    // token counts 3, 10, 4 with seqLen 8: doc 1 [0,3), doc 2 [3,13)
    // straddles seqs 0 and 1, doc 3 [13,17) straddles 1 and 2
    val docs = Seq((1L, "a b c"), (2L, ("x " * 10).trim), (3L, "p q r s"))
      .toDF("doc_id", "text")
      .select($"doc_id", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")).cast("long")
        .as("n_tokens"))
    val got = Corpus.packOffsetsOver(docs, 8L).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 3L, 0L, 1L, 2L),
      (3L, 13L, 1L, 2L, 2L)))
  }

  test("c09 plan: the corpus-wide window is partition-parallel") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n_tokens"))
    val plan = Corpus.packOffsetsOver(docs, 512L)
      .queryExecution.executedPlan.toString
    // the per-row running sum must be keyed by the range-partition id —
    // a corpus-sized single-partition window would show a Window node
    // whose required ordering has no partitioning expression on _pid
    assert(plan.contains("hashpartitioning(_pid"),
      s"expected the corpus window keyed by _pid:\n$plan")
  }

  test("c13 quarantines exactly the held-out docs sharing a train passage") {
    import org.apache.spark.sql.functions._
    // tagged corpus: zero natural cross-doc overlap; every 7th doc
    // carries the same untagged passage — the planted leak
    val passage = Dedup.SharedPassage.mkString(" ")
    val docs = graft.Tables(spark, TestSpark.Sf0001).documents
      .select(col("doc_id"),
        Dedup.tagTokens(col("text"), col("doc_id")).as("text"))
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + passage)))
          .otherwise(col("text")).as("text"))
    val got = Corpus.leakproofSplitOver(docs, 0.8, 0.1, 8, 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // the hash split must put at least one planted doc in train for
    // the leak to exist (holds for this corpus; assert, don't assume)
    val plantedInTrain = got.exists { case (id, s, _) =>
      id % 7 == 0 && s == "train" }
    assert(plantedInTrain)
    got.foreach { case (id, split, fin) =>
      if (id % 7 == 0 && split != "train")
        assert(fin == "train", s"doc $id: leaked but kept $fin")
      else
        assert(fin == split, s"doc $id: $split flipped to $fin")
    }
    // the split is a real 80/10/10-ish partition before quarantine
    val bySplit = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySplit("train") > bySplit.getOrElse("val", 0))
    assert(bySplit.getOrElse("val", 0) > 0 && bySplit.getOrElse("test", 0) > 0)
  }

  test("c13 quarantine reaches the fixpoint: transitive leak chains all land in train") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // pick ids landing in each split under the operator's own hash
    // assignment (bucket = xxhash64(doc_id) mod 1e6; train < 8e5,
    // val < 9e5, test above) — planted, not assumed
    val buckets = spark.range(0, 4000)
      .select(col("id"), pmod(xxhash64(col("id")), lit(1000000L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    def pick(lo: Long, hi: Long, skip: Set[Long]): Long =
      buckets.find { case (id, b) => b >= lo && b < hi && !skip(id) }.get._1
    val idA = pick(0L, 800000L, Set.empty)            // train
    val idB = pick(800000L, 900000L, Set.empty)       // val
    val idC = pick(900000L, 1000000L, Set.empty)      // test
    val idD = pick(900000L, 1000000L, Set(idC))       // test, clean

    // 12-word passages → 5 distinct 8-shingles each, ≥ minShared = 3.
    // Chain: A(train) ~P1~ B(val) ~P2~ C(test); C shares NOTHING with
    // the original train split — only the fixpoint can catch it.
    val p1 = (1 to 12).map(i => s"p1w$i").mkString(" ")
    val p2 = (1 to 12).map(i => s"p2w$i").mkString(" ")
    def base(tag: String) = (1 to 15).map(i => s"${tag}w$i").mkString(" ")
    val docs = Seq(
      (idA, base("a") + " " + p1),
      (idB, base("b") + " " + p1 + " " + p2),
      (idC, base("c") + " " + p2),
      (idD, base("d"))).toDF("doc_id", "text")

    val got = Corpus.leakproofSplitOver(docs, 0.8, 0.1, 8, 3L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got(idA) == ("train", "train"))
    assert(got(idB) == ("val", "train"), s"direct leak: ${got(idB)}")
    // the single-pass implementation left this one in test
    assert(got(idC) == ("test", "train"), s"transitive leak: ${got(idC)}")
    assert(got(idD) == ("test", "test"), s"clean doc moved: ${got(idD)}")
  }

  test("c13 law: random overlap structures match a naive local fixpoint") {
    import spark.implicits._
    // seeded random corpora with a shared-passage pool: docs pick 0-2
    // passages, so direct leaks, transitive chains, and clean docs all
    // arise by chance. The reference takes the operator's OWN hash
    // split as input (xxhash64 has no plain-Scala twin) and replays
    // only the sweep — the same separation the DuckDB oracle uses.
    def refLeaky(split: Map[Long, String], sh: Map[Long, Set[String]],
        minShared: Int): Set[Long] = {
      var trainSh = split.collect { case (d, "train") => d }.toSet
        .flatMap((d: Long) => sh.getOrElse(d, Set.empty[String]))
      var held = split.collect { case (d, s) if s != "train" => d }.toSet
      var leaky = Set.empty[Long]
      var moved = true
      while (moved) {
        val next = held.filter(d =>
          (sh.getOrElse(d, Set.empty[String]) & trainSh).size >= minShared)
        moved = next.nonEmpty
        leaky ++= next
        trainSh ++= next.flatMap(sh(_))
        held --= next
      }
      leaky
    }
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val passages = (0 until 6).map(p =>
        (0 until 10 + rnd.nextInt(5)).map(i => s"s${seed}p${p}w$i"))
      val corpus = (0L until 40L).map { id =>
        val own = (0 until 15).map(i => s"s${seed}d${id}w$i")
        val extra = (0 until rnd.nextInt(3))
          .flatMap(_ => passages(rnd.nextInt(passages.length)))
        (id, (own ++ extra).mkString(" "))
      }
      val got = Corpus
        .leakproofSplitOver(corpus.toDF("doc_id", "text"), 0.8, 0.1, 8, 3L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val split = got.map { case (d, s, _) => d -> s }.toMap
      val sh = corpus.map { case (d, t) =>
        d -> t.split(" ").toSeq.sliding(8)
          .filter(_.length == 8).map(_.mkString(" ")).toSet
      }.toMap
      val leaky = refLeaky(split, sh, 3)
      got.foreach { case (d, s, fin) =>
        val want = if (leaky(d)) "train" else s
        assert(fin == want, s"seed $seed doc $d: split=$s got=$fin want=$want")
      }
    }
  }

  test("c12 sequences are full except the tail; tokens conserve t09's") {
    val seqLen = 128L
    val rows = Corpus.c12PackSequences(spark, TestSpark.Sf0001, seqLen)
      .collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids.sameElements(ids.head to ids.last), "seq_ids not dense")
    // every sequence holds exactly seqLen tokens except the last
    rows.sortBy(_.getLong(0)).dropRight(1)
      .foreach(r => assert(r.getLong(1) == seqLen, r.toString))
    // token conservation vs the t09 per-doc counts
    val t09Total = TextOps.t09SubwordIds(spark, TestSpark.Sf0001)
      .agg(org.apache.spark.sql.functions.sum("n_pieces")).head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == t09Total)
    // each csv really carries n_tokens ids
    rows.foreach { r =>
      assert(r.getString(2).split(",").length.toLong == r.getLong(1))
    }
  }

  test("c10 epochs + residual consume exactly the per-source budget") {
    val rows = Corpus.c10MixtureEpochs(spark, dir, targetTokens = 500000L)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tot, budget, epochs, residual) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(epochs == budget / tot)
      assert(residual >= 0.0 && residual < 1.0)
      // epochs + residual passes cover the budget to rounding precision
      assert(math.abs(epochs * tot + residual * tot - budget) <= tot * 1e-6 + 1)
      // the demo target actually exercises upsampling
      assert(epochs >= 1, s"${r.getString(0)}: no upsampling at this target")
    }
  }

  test("c08 temperature weights sit between proportional and equal-share") {
    val rows = Corpus.c08TemperatureMixture(spark, dir, targetTokens = 100000L)
      .collect()
    assert(rows.length >= 2)
    val total = rows.map(_.getLong(2)).sum.toDouble
    val n = rows.length
    // α=0.5 damps the head and boosts the tail: every source's weight
    // lands strictly between its proportional share (α=1) and the
    // equal share 1/n (α=0) — unless the source IS at the mean mass
    rows.foreach { r =>
      val prop = r.getLong(2) / total
      val w = r.getDouble(3)
      val lo = math.min(prop, 1.0 / n) - 1e-6
      val hi = math.max(prop, 1.0 / n) + 1e-6
      assert(w >= lo && w <= hi,
        s"${r.getString(0)}: weight $w outside [$lo, $hi]")
      // weight is exactly the sqrt-mass share, rounded once
      val sqrts = rows.map(x => math.floor(math.sqrt(x.getLong(2).toDouble)
        * 1e6 + 0.5))
      val expected = math.floor(math.sqrt(r.getLong(2).toDouble) * 1e6 + 0.5) /
        sqrts.sum
      assert(math.abs(w - expected) < 1e-6)
    }
    // weights form a distribution; budgets conserve the target
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getLong(4)).sum - 100000L) <= n)
    // sample_rate = budget/mass capped at 1
    rows.foreach { r =>
      val expected = math.min(1.0, r.getLong(4).toDouble / r.getLong(2))
      assert(math.abs(r.getDouble(5) - expected) < 1e-6)
    }
  }

  test("c02 mixture plan computes equal-share rates capped at 1") {
    val rows = Corpus.c02MixturePlan(spark, dir, targetTokens = 100000L)
      .collect()
    assert(rows.nonEmpty)
    val n = rows.length
    rows.foreach { r =>
      val tot = r.getLong(2)
      val expected = math.min(1.0,
        (100000.0 / n) / tot)
      val rate = r.getDouble(3)
      assert(rate > 0 && rate <= 1.0)
      assert(math.abs(rate - expected) < 1e-6,
        s"${r.getString(0)}: rate $rate vs expected $expected")
    }
  }

  test("c03 flags exactly the docs sharing >=3 distinct shingles with the bench set") {
    val flagged = Corpus.c03Contamination(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.nonEmpty)
    // brute-force ground truth on the collected corpus
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingleSet(text: String): Set[String] = {
      val toks = text.split(" ", -1)
      if (toks.length < 5) Set.empty
      else toks.sliding(5).map(_.mkString(" ")).toSet
    }
    val benchSh = docs.filter(_._1 % 10 == 0).flatMap(d => shingleSet(d._2)).toSet
    val expected = docs.filter(_._1 % 10 != 0)
      .map { case (id, t) => id -> (shingleSet(t) & benchSh).size.toLong }
      .filter(_._2 >= 3).toMap
    assert(flagged == expected,
      s"diff: ${(flagged.keySet diff expected.keySet) ++ (expected.keySet diff flagged.keySet)}")
  }

  test("c01 removeDupSpans excises shared passages from surviving docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // three clean docs (pass the gate, not near-dups of each other),
    // docs 1 and 2 sharing a 20-token passage — document-granular
    // stages keep both; the substring stage must strip the passage
    // from doc 2 (higher id) only
    val passage = (0 until 20).map(i => s"p$i").mkString(" ")
    def uniq(d: Int, n: Int) = (0 until n).map(i => s"u${d}_$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq(1, 30)} $passage"),
      (2L, s"$passage ${uniq(2, 30)}"),
      (3L, uniq(3, 40))
    ).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val without = Corpus.c01Over(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val withSpans = Corpus.c01Over(docs, removeDupSpans = true)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // all three survive both ways; doc 2 lost exactly the 20 passage
    // tokens, doc 1 (min id) and doc 3 are untouched
    assert(without.keySet == Set(1L, 2L, 3L))
    assert(withSpans.keySet == Set(1L, 2L, 3L))
    assert(without(1L) == 50L && without(2L) == 50L && without(3L) == 40L)
    assert(withSpans(1L) == 50L && withSpans(2L) == 30L && withSpans(3L) == 40L)
  }

  test("c07 excises exactly the eval passages, keeps sub-minimum quotes") {
    import spark.implicits._
    val passage = (0 until 20).map(i => s"e$i").mkString(" ")
    def uniq(p: String, n: Int) = (0 until n).map(i => s"${p}_$i").mkString(" ")
    val train = Seq(
      // passage mid-document → one span [10, 29]
      (1L, s"${uniq("a", 10)} $passage ${uniq("b", 10)}"),
      // two disjoint copies → spans [0, 19] and [32, 51]
      (2L, s"$passage ${uniq("c", 12)} $passage"),
      // no overlap → untouched
      (3L, uniq("d", 40)),
      // a 12-token eval quote: matched, but below minSpanTokens=15 →
      // the span filter must keep it
      (4L, s"${(0 until 12).map(i => s"e$i").mkString(" ")} ${uniq("f", 10)}")
    ).toDF("doc_id", "text")
    val evalDocs = Seq(passage).toDF("text")

    val spans = Dedup.spansAgainst(train, evalDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 10L, 29L), (2L, 0L, 19L), (2L, 32L, 51L)))

    val cleaned = Corpus.decontaminateOver(train, evalDocs)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_removed"))).toMap
    assert(cleaned(1L) == (s"${uniq("a", 10)} ${uniq("b", 10)}", 20L))
    assert(cleaned(2L) == (uniq("c", 12), 40L))
    assert(cleaned(3L) == (uniq("d", 40), 0L))
    assert(cleaned(4L)._2 == 0L)
  }

  test("c04 redacts exactly the planted PII and nothing survives redaction") {
    val rows = Corpus.c04RedactPii(spark, dir).collect()
    // columns: doc_id, n_emails, n_ssns, n_phones, n_ips, n_ccs, clean_text
    rows.foreach { r =>
      val id = r.getLong(0)
      val clean = r.getString(6)
      if (id % 7 == 0) {
        assert(r.getLong(1) == 1 && r.getLong(2) == 1, s"doc $id: $r")
        assert(clean.contains("<EMAIL>") && clean.contains("<SSN>"))
      } else {
        assert(r.getLong(1) == 0 && r.getLong(2) == 0, s"doc $id: $r")
      }
      val wantPhones =
        (if (id % 11 == 0) 1 else 0) + (if (id % 17 == 0) 1 else 0)
      assert(r.getLong(3) == wantPhones, s"doc $id: $r")
      if (id % 11 == 0) {
        assert(r.getLong(5) == 1, s"doc $id: $r")
        assert(clean.contains("<PHONE>") && clean.contains("<CC>"))
      }
      if (id % 17 == 0) {
        // the intl number is redacted whole — no dangling '+44-' stub
        assert(clean.contains("intl <PHONE>"), s"doc $id: $clean")
        assert(!clean.contains("+44"), s"doc $id: $clean")
      }
      if (id % 13 == 0) {
        assert(r.getLong(4) == 1, s"doc $id: $r")
        assert(clean.contains("<IP>"))
        // the Luhn-INVALID near-card is NOT a card: it must survive
        // both the count and the redaction
        assert(clean.contains("4539578763621487"), s"doc $id over-redacted")
      } else assert(r.getLong(4) == 0, s"doc $id: $r")
      if (id % 13 != 0 && id % 11 == 0)
        assert(r.getLong(5) == 1, s"doc $id: $r")
      assert(!clean.contains("@example.com"))
      assert(!clean.contains("123-45-6789"))
      assert(!clean.contains("415-555-0137"))
      assert(!clean.contains("10.20.30.40"))
      assert(!clean.contains("4539578763621486"))
    }
    // non-vacuity: every planted class occurred at least once
    assert(rows.exists(_.getLong(5) == 1))
    assert(rows.exists(_.getLong(4) == 1))
    assert(rows.exists(_.getLong(3) == 1))
  }

  test("redactPiiOver: counts and redaction on hand fixtures incl. intl phones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at alice.smith+spam@corp-mail.co.uk today"),
      (2L, "call +1-555-867-5309 or +44-020-7946-0958 now"),
      (3L, "server 192.168.1.254 and 10.0.0.7 are up"),
      (4L, "alice@ex.org from 10.1.2.3 dialed +1-555-010-0199"),
      (5L, "ssn 987-65-4321 card 4539578763621486 end"),
      // a one-intl-number doc must count ONE phone (the US shape is a
      // substring of the intl shape — no double tally)
      (6L, "just +1-555-867-5309 here"),
      (7L, "no pii here, just 1234 plain. digits and dots 1.2"),
      (8L, ""),
      // a Luhn-valid card standalone AND embedded in a 17-digit
      // reference number: the reference is neither counted nor
      // rewritten (the \b-delimited candidate/replace rule — an
      // unanchored replace once rewrote the embedded occurrence too,
      // leaving more placeholders than n_ccs)
      (9L, "card 4539578763621486 ref 94539578763621486 end"),
      // two standalone cards space-adjacent both redact (\b is
      // non-consuming, unlike a consumed boundary group)
      (10L, "cards 4539578763621486 4539578763621486!")
    ).toDF("doc_id", "text")
    val got = Corpus.redactPiiOver(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(got === Array(
      (1L, 1L, 0L, 0L, 0L, 0L, "mail me at <EMAIL> today"),
      (2L, 0L, 0L, 2L, 0L, 0L, "call <PHONE> or <PHONE> now"),
      (3L, 0L, 0L, 0L, 2L, 0L, "server <IP> and <IP> are up"),
      (4L, 1L, 0L, 1L, 1L, 0L, "<EMAIL> from <IP> dialed <PHONE>"),
      (5L, 0L, 1L, 0L, 0L, 1L, "ssn <SSN> card <CC> end"),
      (6L, 0L, 0L, 1L, 0L, 0L, "just <PHONE> here"),
      // 1.2 and 1234 must NOT trip the IPv4/phone patterns
      (7L, 0L, 0L, 0L, 0L, 0L,
        "no pii here, just 1234 plain. digits and dots 1.2"),
      (8L, 0L, 0L, 0L, 0L, 0L, ""),
      (9L, 0L, 0L, 0L, 0L, 1L,
        "card <CC> ref 94539578763621486 end"),
      (10L, 0L, 0L, 0L, 0L, 2L, "cards <CC> <CC>!")))
  }

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

  test("c05 mixture build is a reproducible sample in the planned proportions") {
    import org.apache.spark.sql.functions._
    val out = Corpus.c05MixtureBuild(spark, dir).collect()
    assert(out.nonEmpty)
    // reproducible: same inputs, same seed -> identical example ORDER
    val again = Corpus.c05MixtureBuild(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // every kept doc passes its source's hash gate (subset-of-corpus +
    // the gate recomputed independently of the operator)
    val rates = Corpus.c02MixturePlan(spark, dir, targetTokens = 12000L)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("sample_rate")).toMap
    assert(rates.values.exists(_ < 1.0), "rates all capped — demo vacuous")
    val gate = graft.Tables(spark, dir).documents
      .filter(pmod(xxhash64(col("doc_id")), lit(1L << 20)) <
        rates.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
          when(col("source") === k, lit(v)).otherwise(acc)
        }.multiply(lit(1L << 20)).cast("long"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == gate)
    // proportions: each source's sampled token mass is near the equal
    // share the plan targeted (hash sampling is exact only in expectation)
    val bySource = out.groupBy(_.getString(1))
      .map { case (src, rows) => src -> rows.map(_.getLong(2)).sum }
    val target = 12000.0 / rates.size
    bySource.foreach { case (src, toks) =>
      if (rates(src) < 1.0) // uncapped sources should land near the share
        assert(toks > target * 0.5 && toks < target * 1.6,
          s"$src sampled $toks tokens vs target $target")
    }
  }

  test("c16 classifier == plain-Scala GD replay on a hand corpus") {
    import spark.implicits._
    // fixture bigrams are distinct strings (each its own 2^16 bucket
    // w.h.p., c14's argument), so the replay can treat every distinct
    // bigram as its own feature. Positives share "alpha beta".
    val labeled = Seq(
      (1L, "alpha beta gamma", 1),
      (2L, "alpha beta delta", 1),
      (3L, "epsilon zeta eta", 0),
      (4L, "iota kappa lambda", 0),
      (5L, "mu nu xi omicron", 0)).toDF("doc_id", "text", "label")
    def bigrams(t: String): Seq[String] =
      t.split(" ").sliding(2).map(_.mkString(" ")).toSeq
    val docs = Seq(
      1L -> ("alpha beta gamma", 1), 2L -> ("alpha beta delta", 1),
      3L -> ("epsilon zeta eta", 0), 4L -> ("iota kappa lambda", 0),
      5L -> ("mu nu xi omicron", 0))
    val featsOf: Map[Long, Map[String, Long]] = docs.map { case (id, (t, _)) =>
      id -> bigrams(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val labelOf = docs.map { case (id, (_, l)) => id -> l }.toMap
    val (iters, lr) = (3, 0.5)
    val nDocs = 5.0
    val (wPos, wNeg) = (nDocs / (2.0 * 2), nDocs / (2.0 * 3))
    def r9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def margin(w: Map[String, Double], id: Long): Double =
      featsOf(id).collect { case (g, n) if w.contains(g) =>
        r9(n * w(g)) }.sum.toDouble
    var w = Map.empty[String, Double]
    var bias = 0.0
    (0 until iters).foreach { _ =>
      val res = docs.map { case (id, (_, l)) =>
        val sig = 1.0 / (1.0 + math.exp(-(margin(w, id) + bias)))
        id -> (sig - l) * (if (l == 1) wPos else wNeg)
      }.toMap
      val grad = docs.flatMap { case (id, _) =>
        featsOf(id).map { case (g, n) => g -> r9(res(id) * n) }
      }.groupBy(_._1).map { case (g, ts) => g -> ts.map(_._2).sum.toDouble }
      val gBias = docs.map { case (id, _) => r9(res(id)) }.sum.toDouble
      w = (w.keySet ++ grad.keySet).iterator.map { g =>
        g -> (w.getOrElse(g, 0.0) - lr * grad.getOrElse(g, 0.0) / nDocs)
      }.toMap
      bias -= lr * gBias / nDocs
    }
    val expected = docs.map { case (id, (_, l)) =>
      val sig = 1.0 / (1.0 + math.exp(-(margin(w, id) + bias)))
      val prob = BigDecimal(sig)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> (l, featsOf(id).values.sum, prob, prob >= 0.5)
    }.toMap
    val got = Corpus.qualityClassifierOver(labeled, iters, lr)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got == expected)
    // the shared-bigram positives separate from the negatives
    assert(got(1L)._4 && got(2L)._4 && !got(3L)._4 && !got(4L)._4)
  }

  test("c16 demo: exemplar-source docs are kept, false-positive rate bounded") {
    val docs = graft.Tables(spark, TestSpark.Sf0001).documents
    val tgt = docs.select(org.apache.spark.sql.functions.min(
      org.apache.spark.sql.functions.col("source")))
      .collect().head.getString(0)
    val got = Corpus.c16QualityClassifier(spark, TestSpark.Sf0001)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getDouble(3), r.getBoolean(4)))
    val (pos, neg) = got.partition(_._2 == 1)
    assert(pos.nonEmpty && neg.nonEmpty)
    // recall on the exemplar slice ≥ 0.9; FP rate on the rest ≤ 10%
    assert(pos.count(_._4) * 10 >= pos.length * 9,
      s"${pos.count(_._4)} of ${pos.length} exemplar docs kept")
    assert(neg.count(_._4) * 10 <= neg.length,
      s"${neg.count(_._4)} of ${neg.length} non-exemplar docs kept")
    // and the probabilities themselves separate on average
    val meanPos = pos.map(_._3).sum / pos.length
    val meanNeg = neg.map(_._3).sum / neg.length
    assert(meanPos > meanNeg + 0.2,
      s"mean prob: exemplar $meanPos vs rest $meanNeg — no separation")
  }

  test("c16 indexed scoring == in-memory classifier, bit-identical probs") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_c16model")
    val modelPath = tmp.resolve("model").toString
    val docs = graft.Tables(spark, TestSpark.Sf0001).documents
    val tgt = docs.select(min(col("source"))).collect().head.getString(0)
    val labeled = docs.select(col("doc_id"), col("text"),
      (col("source") === tgt).cast("int").as("label"))
    Corpus.c16ModelBuild(labeled, modelPath)
    val mem = Corpus.c16QualityClassifier(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4)))
      .toMap
    val idx = Corpus.c16ScoreIndexed(
      docs.select("doc_id", "text"), modelPath)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(idx == mem,
      "persisted-model scoring diverged from the in-memory classifier")
  }

  test("c17 == brute-force cosine replay; only cross bench×train pairs count") {
    val emb = spark.read
      .parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos4(a: Array[Float], b: Array[Float]): Double =
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bench = emb.keys.filter(_ % 10 == 0).toSeq.sorted
    val train = emb.keys.filter(_ % 10 != 0).toSeq.sorted
    val expected = train.flatMap { t =>
      val hits = bench.map(b => cos4(emb(t), emb(b))).filter(_ >= 0.4)
      if (hits.isEmpty) None
      else Some((t, hits.length.toLong, hits.max))
    }
    val got = Corpus.c17SemanticDecontam(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty, "threshold demo is vacuous — no flagged vectors")
  }

  test("c17 IVF screen at nprobe=all equals the flat screen row-for-row") {
    // the docstring's equality law: probing every cell means every
    // bench×train pair gets the exact cosine check, so the indexed
    // path must reproduce the brute-force output EXACTLY — this is
    // what lets the flat c17 oracle certify the whole IVF machinery
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val flat = rows(Corpus.c17SemanticDecontam(spark, TestSpark.Sf0001))
    val ivf = rows(Corpus.c17SemanticDecontamIvf(spark, TestSpark.Sf0001,
      nprobe = 0))
    assert(ivf == flat, "nprobe=all must degenerate to brute force exactly")
    assert(flat.nonEmpty)
    // narrowed nprobe is a subset: every reported pair passed the real
    // cosine, so hits can only be missed, never invented
    val narrowed = rows(Corpus.c17SemanticDecontamIvf(spark,
      TestSpark.Sf0001, nprobe = 1))
    val flatByVec = flat.map(r => r._1 -> r).toMap
    assert(narrowed.forall { case (v, hits, maxCos) =>
      flatByVec.get(v).exists { case (_, fh, fm) =>
        hits <= fh && maxCos <= fm + 1e-12 }
    }, "nprobe=1 invented a hit the flat screen never saw")
  }

  test("c18 balanced sample: per-cluster quotas, top-central prototypes, repartition-stable") {
    import spark.implicits._
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .select("vec_id", "embedding")
    val perCluster = 5
    val nlist = 8
    val got = Corpus.c18Over(emb, perCluster, nlist).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // independent replay: same deterministic trainer, kernel-order dots
    val cents = Ann.trainCentroids(emb, nlist)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val assigned = vecs.map { case (id, v) =>
      val ds = cents.map(c => dot(v, c))
      val cell = ds.indexOf(ds.max) + 1
      (id, cell, ds.max / math.sqrt(dot(v, v)))
    }
    val expected = assigned.groupBy(_._2).toSeq.flatMap { case (cell, vs) =>
      vs.sortBy { case (id, _, cen) => (-cen, id) }.take(perCluster)
        .zipWithIndex.map { case ((id, _, cen), i) =>
          (cell.toLong, i + 1, id,
            BigDecimal(cen).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected, "c18 diverged from the plain-Scala replay")

    // quota law: every nonempty cluster contributes min(quota, size)
    val sizes = assigned.groupBy(_._2).view.mapValues(_.length).toMap
    val gotCounts = got.groupBy(_._1).view.mapValues(_.length).toMap
    sizes.foreach { case (cell, n) =>
      assert(gotCounts(cell.toLong) == math.min(perCluster, n), s"cell $cell") }

    // hostile repartition must not move a single row
    val again = Corpus.c18Over(emb.repartition(7), perCluster, nlist)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq == got.toSeq, "c18 depends on partitioning")
  }

  test("c20 gopher rules: hand-corpus metrics and flags are closed-form") {
    import spark.implicits._
    val docs = Seq(
      // pristine: 50 words (the, with, 48×word), all alpha, 2 stops
      (1L, (Seq("the", "with") ++ Seq.fill(48)("word")).mkString(" ")),
      // too short: only the word-count rule trips
      (2L, "the tiny with doc"),
      // 9 bullet lines of 10 → ratio exactly 0.9, fails the strict <
      (3L, "* bulletword here\n" * 9 + Seq.fill(25)("the and").mkString(" ")),
      // #-runs: symbol rule trips, alpha ratio 50/60 stays just over 0.8
      (4L, Seq.fill(25)("that have").mkString(" ") + " ####" * 10),
      // 2 of 3 lines end in ellipsis → 2/3 > 0.3
      (5L, Seq.fill(25)("that have").mkString(" ") +
        "\nto be continued...\nread more soon...")
    ).toDF("doc_id", "text")
    val got = Corpus.gopherRulesOver(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    def flags(r: org.apache.spark.sql.Row): Seq[Long] =
      (9 to 16).map(r.getLong)
    // doc 1: mean = (3 + 4 + 48·4) / 50 = 199/50, everything passes
    assert(got(1L).getLong(1) == 50L && got(1L).getLong(2) == 1L)
    assert(got(1L).getDouble(3) == 199.0 / 50)
    assert(got(1L).getDouble(7) == 1.0 && got(1L).getLong(8) == 2L)
    assert(flags(got(1L)) == Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
    // doc 2: only r_words trips
    assert(flags(got(2L)) == Seq(0L, 1L, 1L, 1L, 1L, 1L, 1L, 0L))
    // doc 3: 77 words, 10 lines, bullet 9/10 = 0.9 exactly → strict-<
    // fails; mean = (9·(1+10+4) + 50·3)/77 = 285/77 holds; alpha 68/77
    assert(got(3L).getLong(1) == 77L && got(3L).getLong(2) == 10L)
    assert(got(3L).getDouble(5) == 9.0 / 10)
    assert(got(3L).getDouble(3) == 285.0 / 77)
    assert(got(3L).getDouble(7) == 68.0 / 77)
    assert(flags(got(3L)) == Seq(1L, 1L, 1L, 0L, 1L, 1L, 1L, 0L))
    // doc 4: 60 words, 40 '#' chars → 40/60; alpha 50/60 > 0.8
    assert(got(4L).getDouble(4) == 40.0 / 60)
    assert(got(4L).getDouble(7) == 50.0 / 60)
    assert(flags(got(4L)) == Seq(1L, 1L, 0L, 1L, 1L, 1L, 1L, 0L))
    // doc 5: 56 words over 3 lines, 2 ellipsis lines; '...' counts as
    // symbol too (2/56 < 0.1 passes); 4 distinct stops
    assert(got(5L).getLong(2) == 3L && got(5L).getDouble(6) == 2.0 / 3)
    assert(got(5L).getLong(8) == 4L)
    assert(flags(got(5L)) == Seq(1L, 1L, 1L, 1L, 0L, 1L, 1L, 0L))
  }

  test("c20: mixed case counts as alphabetic, separator runs don't dilute") {
    import spark.implicits._
    val docs = Seq(
      // all-caps words are words; 'The' matches the stop list
      (1L, "NASA JPL REPORT The End A"),
      // a paragraph break (blank line) must not create empty tokens
      (2L, "word1 word2\n\nword3 word4")).toDF("doc_id", "text")
    val got = Corpus.gopherRulesOver(docs, stops = Seq("the", "a"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 6L)          // n_words
    assert(got(1L).getDouble(7) == 1.0)       // alpha_ratio
    assert(got(1L).getLong(8) == 2L)          // The + A, case-folded
    assert(got(2L).getLong(1) == 4L)          // no empty tokens
    assert(got(2L).getLong(2) == 3L)          // blank line still a line
    assert(got(2L).getDouble(3) == 5.0)       // 20 chars / 4 words
    assert(got(2L).getDouble(7) == 1.0)
  }

  test("c21 canary scan: exact GUID capture, multi-hit, near-miss rejection") {
    import spark.implicits._
    val g1 = "0123abcd-dead-beef-cafe-0123456789ab"
    val g2 = "ffffffff-0000-1111-2222-333333333333"
    val docs = Seq(
      (1L, s"clean prose with no markers"),
      (2L, s"leaked canary $g1 mid text"),
      (3L, s"two canary $g1 and canary $g2 hits"),
      // near-misses: wrong GUID shape, uppercase hex, missing marker
      (4L, "canary 1234-not-a-guid and CANARY " + g1 + s" and bare $g2"))
      .toDF("doc_id", "text")
    val got = Corpus.canaryScanOver(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, "", 1L),
      (2L, 1L, g1, 0L),
      (3L, 2L, s"$g1,$g2", 0L),
      (4L, 0L, "", 1L)))
  }

  test("c21 demo: planted docs flagged with their own GUID, others keep") {
    val rows = Corpus.c21CanaryScan(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n, c, keep) = (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))
      if (id % 11 == 3) {
        assert(n == 1L && keep == 0L, s"doc $id")
        assert(c.startsWith(f"$id%08d-dead-beef-cafe-"), s"doc $id: $c")
      } else assert(n == 0L && keep == 1L, s"doc $id")
    }
  }

  test("c20 demo: each planted family trips exactly its rule") {
    val rows = Corpus.c20GopherRules(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    byId.foreach { case (id, r) =>
      if (id % 7 == 3) assert(r.getLong(12) == 0L, s"doc $id r_bullet")
      if (id % 7 == 5) assert(r.getLong(13) == 0L, s"doc $id r_ellipsis")
      if (id % 7 == 1) assert(r.getLong(11) == 0L, s"doc $id r_symbol")
    }
    // the gate discriminates: both verdicts occur on the demo corpus
    val keeps = rows.map(_.getLong(16)).toSet
    assert(keeps == Set(0L, 1L), s"keep verdicts: $keeps")
  }

  test("c22 domain mixture: rollup matches a plain-Scala replay, cap binds") {
    val docs = graft.Tables(spark, dir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // every variant of doc_id%5 canonicalizes to the same host, so the
    // expected domain is closed-form in doc_id
    val expect = docs.groupBy { case (id, _) =>
      s"site${(id / 5) % 50}.example.com"
    }.map { case (dom, ds) =>
      dom -> (ds.length.toLong, ds.map(_._2.split(" ", -1).length.toLong).sum)
    }
    val tot = expect.values.map(_._2).sum.toDouble
    val rows = Corpus.c22DomainMixture(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet == expect.keySet)
    rows.foreach { r =>
      val (nd, nt) = expect(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == nt, r.getString(0))
      assert(r.getDouble(3) ==
        BigDecimal(nt / tot).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, s"${r.getString(0)} share")
      assert(r.getLong(4) == math.min(nd, 15L), s"${r.getString(0)} cap")
    }
    // shares partition the corpus
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6)
    // the cap BINDS when a domain exceeds it: tighten cap below the
    // ~10-docs-per-domain density of sf0.01
    val capped = Corpus.c22DomainMixture(spark, dir, cap = 4L).collect()
    assert(capped.forall(_.getLong(4) == 4L), "cap=4 must bind everywhere")
  }

  test("c23 shard export: shards replay from t09's ids; structure laws hold") {
    // rebuild the expected byte stream from Spark's OWN t09 output —
    // the prefix-sum, shard cut and uint16-LE serialization are the
    // surfaces under test (the id kernel has t09's fuzz suite)
    val idsByDoc = graft.operators.TextOps
      .t09SubwordIds(spark, TestSpark.Sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2))
    val stream = idsByDoc.sortBy(_._1).flatMap(_._2.split(",").map(_.toInt))
    val expect = stream.zipWithIndex
      .groupBy { case (_, pos) => pos / 256 }
      .map { case (shard, toks) =>
        shard.toLong -> (toks.length.toLong,
          toks.sortBy(_._2).map { case (v0, _) =>
            val v = v0 & 0xffff
            f"${v & 255}%02X${v >> 8}%02X"
          }.mkString)
      }
    val rows = Corpus.c23ShardExport(spark, TestSpark.Sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == expect.keys.toSeq.sorted)
    rows.foreach { r =>
      val (n, hex) = expect(r.getLong(0))
      assert(r.getLong(1) == n, s"shard ${r.getLong(0)} count")
      assert(r.getString(2) == hex, s"shard ${r.getLong(0)} bytes")
    }
    // structure: every shard but the last is full, hex is 4 chars/token
    rows.dropRight(1).foreach(r => assert(r.getLong(1) == 256L))
    rows.foreach(r => assert(r.getString(2).length == 4 * r.getLong(1)))
    // the UNK sentinel serializes as FFFF (two's-complement identity)
    if (stream.contains(-1))
      assert(rows.exists(_.getString(2).contains("FFFF")))
  }

  test("c25 sft pack: spans tile like c24, masks split each doc at n div 3") {
    val rows = Corpus.c25SftPack(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // tiling: same contiguity discipline as c24
    rows.groupBy(_._1).foreach { case (seq, segs) =>
      val s = segs.sortBy(_._2)
      assert(s.map(_._2).toSeq == s.indices.map(_.toLong))
      assert(s.head._4 == 0L)
      s.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._5, s"gap in seq $seq")
        case _ =>
      }
      assert(s.forall(_._5 > 0))
    }
    // per doc: masked token total == n div 3, trained == the rest;
    // c24 agreement: merging the mask split reproduces its layout
    val c24 = Corpus.c24BoundaryMasks(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(4)).toMap
    val byDoc = rows.groupBy(_._3)
    byDoc.foreach { case (doc, segs) =>
      val masked = segs.filter(_._6 == 0L).map(_._5).sum
      val trained = segs.filter(_._6 == 1L).map(_._5).sum
      val n = masked + trained
      assert(masked == n / 3, s"doc $doc masked $masked of $n")
      // per (seq, doc): c25 lens sum to the c24 segment length
      segs.groupBy(_._1).foreach { case (seq, ss) =>
        assert(ss.map(_._5).sum == c24((seq, doc)), s"seq $seq doc $doc")
      }
    }
    // both mask classes exist
    assert(rows.exists(_._6 == 0L) && rows.exists(_._6 == 1L))
  }

  test("c24 boundary masks: segments tile every sequence; c12 cross-check") {
    val rows = Corpus.c24BoundaryMasks(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val bySeq = rows.groupBy(_._1)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, segs) =>
      val s = segs.sortBy(_._2)
      // seg_idx is dense from 0; segments are contiguous from 0
      assert(s.map(_._2).toSeq == s.indices.map(_.toLong))
      assert(s.head._4 == 0L, s"seq $seq starts at ${s.head._4}")
      s.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._5, s"gap in seq $seq")
        case _ =>
      }
      assert(s.forall(_._5 > 0), s"empty segment in seq $seq")
      // every sequence but the final partial one is exactly full
      val total = s.map(_._5).sum
      if (seq != lastSeq) assert(total == 128L, s"seq $seq total $total")
    }
    // cross-check against c12's materialized token counts per sequence
    val c12 = Corpus.c12PackSequences(spark, TestSpark.Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySeq.keySet == c12.keySet)
    bySeq.foreach { case (seq, segs) =>
      assert(segs.map(_._5).sum == c12(seq), s"seq $seq vs c12")
    }
  }

  test("c27 soft-dedup weights: 1/cluster over d07's labels, singletons at 1") {
    val d = TestSpark.Sf0001
    val rows = Corpus.c27DupWeights(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = graft.Tables(spark, d).documents.count()
    // full-corpus coverage: exactly one weight row per document
    assert(rows.length == nDocs && rows.map(_._1).distinct.length == rows.length)
    // clustered docs carry d07's exact labels; everything else is its
    // own singleton at weight 1
    val labs = graft.operators.Dedup.d07DedupClusters(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, cl, sz, w) =>
      assert(cl == labs.getOrElse(id, id), s"doc $id cluster")
      assert(w == BigDecimal(1.0 / sz)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"doc $id weight $w for size $sz")
      if (!labs.contains(id)) assert(sz == 1L && w == 1.0, s"singleton $id")
    }
    // the soft-dedup LAW: each cluster's expected epoch contribution
    // is one document (Σ weight = size · 1/size = 1, up to the one
    // 6-dp rounding per member)
    assert(labs.nonEmpty, "no clusters at this SF — the law is vacuous")
    rows.groupBy(_._2).foreach { case (cl, members) =>
      val s = members.map(_._4).sum
      assert(math.abs(s - 1.0) <= 1e-6 * members.length,
        s"cluster $cl weight mass $s over ${members.length} members")
    }
  }
}
