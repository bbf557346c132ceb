package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  test("s01 brute-force top-k is ordered and complete") {
    val rows = Ann.s01AnnBruteforce(spark, dir, k = 10).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("s02 LSH recall beats its scanned fraction by a wide margin") {
    val exact = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Ann.s02AnnLsh(spark, dir, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 37 of 256 buckets probed ≈ 14% of the corpus; random scanning at
    // that fraction would yield ~0.14 recall in expectation.
    assert(recall >= 0.3, s"recall $recall too low for 14% scan")
  }

  test("s02 results are true cosines (subset of brute-force ranking by value)") {
    val exactAll = Ann.s01AnnBruteforce(spark, dir, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = Ann.s02AnnLsh(spark, dir, k = 10).collect()
    approx.foreach { r =>
      assert(math.abs(exactAll(r.getLong(0)) - r.getDouble(1)) < 1e-12)
    }
  }

  test("s04 IVF probes a corpus fraction yet recalls most true neighbors") {
    val exact = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Ann.s04AnnIvf(spark, dir, k = 10, nlist = 16, nprobe = 4)
      .collect()
    assert(approx.length == 10)
    val recall = (exact & approx.map(_.getLong(0)).toSet).size.toDouble / 10
    // 4 of 16 cells probed = 25% of the corpus; the quantizer must beat
    // random-fraction recall decisively
    assert(recall >= 0.5, s"recall $recall too low for a 25% probe")
    // scores are true cosines, not quantized approximations
    val exactAll = Ann.s01AnnBruteforce(spark, dir, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    approx.foreach { r =>
      assert(math.abs(exactAll(r.getLong(0)) - r.getDouble(1)) < 1e-12)
    }
  }

  test("s13 filtered IVF: predicate holds, scores exact, recall beats the probe fraction") {
    val exact = Ann.s12AnnFiltered(spark, dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(exact.length == 10 && exact.forall(_._2 == 1))
    val exactMap = Ann.s12AnnFiltered(spark, dir, k = 10000)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    val probed = Ann.s13AnnFilteredIvf(spark, dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // pre-filter contract: every returned row satisfies the predicate,
    // and k survivors exist despite the filter thinning each cell
    assert(probed.length == 10 && probed.forall(_._2 == 1))
    // scores are true cosines (the probe prunes candidates, never
    // perturbs values): every emitted score equals the exact kernel's
    probed.foreach { case (id, _, s) =>
      assert(math.abs(exactMap(id) - s) < 1e-12, s"vec $id score drift")
    }
    // oversampled probe (16/16 cells here at the defaults) must hold
    // recall well above the unwidened 4/16 fraction
    val recall = (exact.map(_._1).toSet & probed.map(_._1).toSet).size / 10.0
    assert(recall >= 0.8, s"filtered recall $recall")
    // and the oversampling is the load-bearing part: an unwidened
    // probe over the thinned cells loses recall on this corpus
    val narrow = Ann.s13AnnFilteredIvf(spark, dir, k = 10, oversample = 1)
      .collect().map(_.getLong(0)).toSet
    val narrowRecall = (exact.map(_._1).toSet & narrow).size / 10.0
    assert(narrowRecall <= recall,
      s"narrow $narrowRecall > oversampled $recall — widening does nothing")
  }

  test("s09 with a corpus-covering rerank collapses to s01 exactly") {
    // when k·rerank ≥ |corpus| the coarse quantized cut keeps everyone,
    // so the exact re-rank IS brute force: output must equal s01
    // row-for-row (same ids, same cos_sim values, same order)
    val exact = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val full = Ann.s09AnnQuantized(spark, dir, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq == exact.toSeq)
  }

  test("s09 default rerank recalls the true top-k from the int8 coarse cut") {
    val exact = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(_.getLong(0)).toSet
    val rows = Ann.s09AnnQuantized(spark, dir, k = 10).collect()
    assert(rows.length == 10)
    val recall = (exact & rows.map(_.getLong(0)).toSet).size.toDouble / 10
    // int8 quantization of 64-dim vectors perturbs cosine by ~1e-2;
    // a 4× rerank margin should recover essentially all true neighbors
    assert(recall >= 0.8, s"recall $recall too low for int8 + 4× rerank")
    // emitted cos_sim is the full-precision value, and the quantized
    // coarse score sits close to it
    val exactAll = Ann.s01AnnBruteforce(spark, dir, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(exactAll(r.getLong(0)) - r.getDouble(1)) < 1e-12)
      assert(math.abs(r.getDouble(2) - r.getDouble(1)) < 0.05,
        s"quantized score drifted: ${r.getDouble(2)} vs ${r.getDouble(1)}")
    }
  }

  test("s10 with a corpus-covering rerank collapses to s01 exactly") {
    val exact = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val full = Ann.s10AnnPq(spark, dir, k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq == exact.toSeq)
  }

  test("s10 default rerank recalls the true top-k from the ADC coarse cut") {
    val exact = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(_.getLong(0)).toSet
    val rows = Ann.s10AnnPq(spark, dir, k = 10).collect()
    assert(rows.length == 10)
    val recall = (exact & rows.map(_.getLong(0)).toSet).size.toDouble / 10
    info(s"s10 recall@10 (m=16, ksub=16, rerank=8): $recall")
    // 4-dim subspaces quantize this unclustered corpus tightly enough
    // that the measured recall is 1.0; 0.8 leaves sampling headroom
    assert(recall >= 0.8, s"recall $recall too low for PQ + 8× rerank")
    // emitted cos_sim is full precision
    val exactAll = Ann.s01AnnBruteforce(spark, dir, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(exactAll(r.getLong(0)) - r.getDouble(1)) < 1e-12)
    }
  }

  test("s11 full probe + covering rerank collapses to s01 exactly") {
    // nprobe = nlist prunes nothing, k·rerank ≥ |corpus| keeps all —
    // the composed path degenerates to brute force, row-for-row
    val exact = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val full = Ann.s11AnnIvfPq(spark, dir, k = 10, nprobe = 16,
      rerank = 100).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq == exact.toSeq)
  }

  test("s11 composed IVF+PQ recalls true neighbors from a 25% probe") {
    val exact = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(_.getLong(0)).toSet
    val rows = Ann.s11AnnIvfPq(spark, dir, k = 10).collect()
    assert(rows.length == 10)
    val recall = (exact & rows.map(_.getLong(0)).toSet).size.toDouble / 10
    info(s"s11 recall@10 (nprobe 4/16, PQ coarse, 8× rerank): $recall")
    // bounded by s04's IVF recall at the same probe fraction (PQ's
    // in-cell recall measured 1.0 in s10); must beat random 25% scan
    assert(recall >= 0.5, s"recall $recall too low for composed path")
    // emitted cos_sim is full precision
    val exactAll = Ann.s01AnnBruteforce(spark, dir, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(exactAll(r.getLong(0)) - r.getDouble(1)) < 1e-12)
    }
  }

  test("s10 codebook training is deterministic") {
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") =!= 0)
    val a = Ann.trainPqCodebooks(corpus, m = 16, ksub = 16)
    val b = Ann.trainPqCodebooks(corpus, m = 16, ksub = 16)
    assert(a.length == 16 && a.head.length == 16)
    a.zip(b).foreach { case (xs, ys) =>
      xs.zip(ys).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("s04 centroid training is deterministic") {
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") =!= 0)
    val a = Ann.trainCentroids(corpus, nlist = 16)
    val b = Ann.trainCentroids(corpus, nlist = 16)
    assert(a.length == 16)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("s05 LSH kNN join recalls most of the exact s03 neighbors") {
    val exact = Ann.s03KnnJoin(spark, dir, k = 5, nQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.s05KnnJoinLsh(spark, dir, k = 5, nQueries = 10)
      .collect()
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    // Hamming ≤ 3 probing covers 93/256 of the bucket space (~36%);
    // near neighbors collide far more often than that
    assert(recall >= 0.5, s"recall $recall too low for a 36% probe")
    // per-query output is ranked and at most k
    approx.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length <= 5)
      val sims = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("s03 kNN join returns k ranked neighbors per query") {
    val rows = Ann.s03KnnJoin(spark, dir, k = 5, nQueries = 10).collect()
    assert(rows.length == 50)
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.values.foreach { g =>
      assert(g.map(_.getLong(3)).sorted.sameElements(1L to 5L))
      val sims = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("s14 distributed Lloyd == serial replay, bit-identical at any partitioning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (nlist, iters) = (8, 3)
    val emb = graft.Tables(spark, TestSpark.Sf0001).embeddings
      .select(col("vec_id"), col("embedding"))
    // kernel-order helpers (left-to-right float→double folds)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def l2(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(dot(v, v))
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    // seeds via the SAME deterministic Spark expression the trainer
    // uses (murmur3 hash order is Spark-side), then serial Lloyd
    val seeds = emb
      .orderBy(pmod(hash(col("vec_id")), lit(1000003)), col("vec_id"))
      .limit(nlist).select("embedding").as[Array[Float]].collect()
      .map(l2)
    val vecs = emb.select("embedding").as[Array[Float]].collect()
    val dim = seeds.head.length
    def argmax(v: Array[Float], cents: Array[Array[Float]]): Int = {
      var best = 0; var bd = Double.NegativeInfinity
      cents.zipWithIndex.foreach { case (c, i) =>
        val d = dot(v, c); if (d > bd) { bd = d; best = i } }
      best
    }
    var cents = seeds
    (1 to iters).foreach { _ =>
      val acc = Array.fill(nlist)(Array.fill(dim)(BigDecimal(0)))
      val counts = new Array[Long](nlist)
      vecs.foreach { v =>
        val cell = argmax(v, cents)
        counts(cell) += 1
        var i = 0
        while (i < dim) {
          acc(cell)(i) += BigDecimal(v(i).toDouble)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
          i += 1
        }
      }
      cents = Array.tabulate(nlist)(ci =>
        if (counts(ci) == 0) cents(ci)
        else l2(acc(ci).map(_.toDouble.toFloat)))
    }
    val got = Ann.s14TrainDistributed(emb, nlist, iters)
    assert(got.length == nlist)
    got.zip(cents).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g.sameElements(e), s"centroid $i differs from serial replay") }
    // decimal-fixed-point proof: a hostile partitioning changes nothing
    val again = Ann.s14TrainDistributed(emb.repartition(7), nlist, iters)
    got.zip(again).zipWithIndex.foreach { case ((g, a), i) =>
      assert(g.sameElements(a), s"centroid $i depends on partitioning") }

    // the census query: populations conserve the corpus, means replay
    def cos4(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val census = Ann.s14KmeansDistributed(spark, TestSpark.Sf0001,
      nlist, iters).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(census.values.map(_._1).sum == vecs.length.toLong)
    val byCell = vecs.groupBy(v => argmax(v, cents))
    byCell.foreach { case (cell, vs) =>
      val (n, mean) = census(cell)
      assert(n == vs.length.toLong, s"cell $cell population")
      val expMean = BigDecimal(
        vs.map(v => BigDecimal(cos4(v, cents(cell)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
          / vs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mean == expMean, s"cell $cell mean cos: $mean vs $expMean")
    }
  }

  test("s15 MMR at lambda=1 is exactly the s01 top-k") {
    val mmr = Ann.s15MmrRerank(spark, dir, k = 10, lambda = 1.0)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val s01 = Ann.s01AnnBruteforce(spark, dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(mmr.toSeq == s01.toSeq,
      "lambda=1 must degenerate to plain relevance ranking")
  }

  test("s15 MMR skips a near-duplicate hit that plain top-k keeps") {
    import spark.implicits._
    // planted window: a and its near-clone a' both out-rank b on query
    // similarity; MMR at lambda=0.5 must take a then b (the clone's
    // marginal score collapses), while plain top-2 keeps the clone.
    // a is deliberately NOT parallel to q: for a ∥ q every candidate
    // has sim(q,·) == sim(a,·) and all marginal scores tie.
    val q = Array(1.0f, 0.0f, 0.0f)
    val a = Array(0.8f, 0.6f, 0.0f)
    val aClone = Array(0.8f, 0.6f, 0.001f)
    val b = Array(0.75f, -0.6614378f, 0.0f)
    val ids = Array(1L, 2L, 3L)
    val vecs = Array(a, aClone, b)
    val simq = vecs.map(v => Ann.cosine4Local(q, v))
    val picked = Ann.mmrSelect(ids, vecs, simq, k = 2, lambda = 0.5)
      .map(_._2)
    assert(picked == Seq(1L, 3L), s"picked $picked")
    // plain relevance top-2 would keep the clone
    assert(simq(1) > simq(2))
  }

  test("ANN dial rule: widens with corpus size, fixed base dials at every gate SF") {
    // gate SFs carry ≤ 2000 vectors — the rule must return the BASE
    // dials there (8 bits / 4 probes), so oracle replays never see a
    // scaled dial; the widening engages on the bench scale legs
    // (sf1 ≈ 20k, sf3 ≈ 60k), where the fixed dials measured
    // s02 0.5→0.3 and s04 0.6→0.3 recall decay
    assert(Ann.srpBitsFor(500) == 8 && Ann.srpBitsFor(2000) == 8 &&
      Ann.srpBitsFor(4000) == 8)
    assert(Ann.srpBitsFor(20000) == 7 && Ann.srpBitsFor(60000) == 6)
    assert(Ann.ivfProbesFor(500) == 4 && Ann.ivfProbesFor(2000) == 4)
    assert(Ann.ivfProbesFor(20000) == 6 && Ann.ivfProbesFor(60000) == 8)
    // monotone: the probed fraction never shrinks as the corpus grows
    val ns = Seq(100L, 4000L, 4001L, 32000L, 32001L, 1000000L)
    assert(ns.map(Ann.srpBitsFor).sliding(2).forall(p => p(0) >= p(1)))
    assert(ns.map(Ann.ivfProbesFor).sliding(2).forall(p => p(0) <= p(1)))
    // bits stay in the signature kernel's legal window
    assert(Ann.srpBitsFor(Long.MaxValue) >= 6 && Ann.srpBitsFor(1) <= 56)
  }

  test("s14 auto-cutover: rule boundary, measured sample degradation, buildIvfIndex flips") {
    import org.apache.spark.sql.functions.{array_max, avg, col}
    import spark.implicits._
    // rule boundary: the flip sits exactly past 16 × sampleN
    assert(!Ann.shouldTrainDistributed(16L * 2048, 2048))
    assert(Ann.shouldTrainDistributed(16L * 2048 + 1, 2048))

    // structured corpus the cutover exists for: 64 tight unit-norm
    // clusters × 250 members. A 128-vector sample supports each
    // centroid with ~2 noisy points, so the sampled trainer's
    // centroids sit off the cluster means; full-corpus Lloyd averages
    // all 250 — the quantization-quality gap the auto-flip is
    // justified by, MEASURED (members are unit vectors, so the argmax
    // centroid dot IS the assignment cosine).
    val rnd = new scala.util.Random(7)
    val dim = 16
    def l2(v: Array[Float]): Array[Float] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val centers = Array.fill(64)(
      l2(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val rows = for { c <- 0 until 64; m <- 0 until 250 } yield {
      val noise = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (c * 250L + m,
        l2(centers(c).zip(noise).map { case (a, b) => a + 0.35f * b }))
    }
    val corpus = rows.toDF("vec_id", "embedding")
      .repartition(8).localCheckpoint(true)
    def meanQuant(cents: Array[Array[Float]]): Double =
      corpus.select(
          avg(array_max(Ann.centroidScores(col("embedding"), cents))))
        .head().getDouble(0)
    val sampled = Ann.trainCentroids(corpus, 64, sampleN = 128)
    val distributed = Ann.s14TrainDistributed(corpus, 64)
    val (qs, qd) = (meanQuant(sampled), meanQuant(distributed))
    assert(qd > qs,
      f"distributed quantization $qd%.4f not above sampled $qs%.4f")

    // integration: buildIvfIndex consults the rule. Below the ceiling
    // it trains the sampled quantizer; past it, the s14 centroids —
    // both trainers are deterministic, so the choice is observable
    // bit-for-bit in the returned centroids.
    val tmp = java.nio.file.Files.createTempDirectory("graft_cutover")
    val small = rows.take(512).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val centsSmall = Ann.buildIvfIndex(small,
      tmp.resolve("ivf_small").toString, nlist = 8, sampleN = 64)
    val expSmall = Ann.trainCentroids(small, 8, sampleN = 64)
    centsSmall.zip(expSmall).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g.sameElements(e), s"small-corpus centroid $i not sampled-trained") }
    val centsBig = Ann.buildIvfIndex(corpus,
      tmp.resolve("ivf_big").toString, nlist = 8, sampleN = 64)
    val expBig = Ann.s14TrainDistributed(corpus, 8)
    centsBig.zip(expBig).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g.sameElements(e), s"big-corpus centroid $i not s14-trained") }
  }

  test("s15 ranks are 1..k and every selected cos_sim matches s01's value") {
    val rows = Ann.s15MmrRerank(spark, dir, k = 8, lambda = 0.7).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    val s01 = Ann.s01AnnBruteforce(spark, dir, k = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(s01(r.getLong(1)) == r.getDouble(2),
        s"cos_sim drifted for vec ${r.getLong(1)}") }
    // greedy MMR scores are non-increasing in rank
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse, s"mmr scores not monotone: $scores")
  }

  test("s17 margin mining equals the serial ratio-margin replay bit-for-bit") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val k = 4; val nQ = 20
    val vecs = graft.Tables(spark, dir).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val xs = vecs.keys.filter(_ < nQ).toSeq.sorted
    val ys = vecs.keys.filter(_ >= nQ).toSeq.sorted
    def d4(v: Double): JBD = new JBD(v).setScale(4, RoundingMode.HALF_UP)
    val sim = (for (x <- xs; y <- ys)
      yield (x, y) -> Ann.cosine4Local(vecs(y), vecs(x))).toMap
    val sumF = xs.map { x =>
      x -> ys.map(y => (sim((x, y)), y)).sortBy { case (s, y) => (-s, y) }
        .take(k).map(t => d4(t._1)).reduce(_.add(_))
    }.toMap
    val sumB = ys.map { y =>
      y -> xs.map(x => (sim((x, y)), x)).sortBy { case (s, x) => (-s, x) }
        .take(k).map(t => d4(t._1)).reduce(_.add(_))
    }.toMap
    val expected = xs.map { x =>
      val fwd = ys.map(y => (sim((x, y)), y)).sortBy { case (s, y) => (-s, y) }
        .take(k)
      val cands = fwd.map { case (s, y) =>
        val m = d4(s * 2.0 * k / sumF(x).add(sumB(y)).doubleValue).doubleValue
        (y, s, m)
      }
      val (y, s, m) = cands.sortBy { case (y, _, m) => (-m, y) }.head
      (x, y, s, m, m >= 1.35)
    }
    val got = Ann.s17MarginMining(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == expected)
    // the ratio margin must actually discriminate on this corpus —
    // a fixture where every margin lands on the same side would make
    // the accepted column vacuous
    assert(got.exists(_._5) && got.exists(!_._5),
      s"margin threshold not discriminating: ${got.map(_._4).toList}")
  }
}
