package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Correctness of the near-dup pipelines against in-Spark brute-force
  * ground truth on the sf0.01 corpus (which has injected near-dup
  * pairs; TESTDATA.md).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  test("d11 admits fresh docs and rejects lake near-dups, doc-for-doc") {
    val got = Dedup.d11IncrementalDedupDemo(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))

    // operator-independent expectation: a resubmission is rejected iff
    // its base doc has ≥ 3 distinct shingles (Jaccard m/(m+1) ≥ 0.7 ⇔
    // m ≥ 3 — one appended token adds exactly one shingle)
    val docs = graft.Tables(spark, TestSpark.Sf0001).documents
      .select(col("doc_id"), Dedup.tagTokens(col("text"), col("doc_id"))
        .as("text"))
    val shSizes = Dedup.docShingleHashes(docs, 5)
      .select(col("doc_id"), size(col("sh")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    assert(got.nonEmpty)
    var rejected = 0
    got.foreach { case (id, admit, dupOf) =>
      if (id >= 3000000L) {
        assert(admit && dupOf == -1L, s"fresh doc $id not admitted")
      } else {
        val base = id - 2000000L
        if (shSizes.getOrElse(base, 0) >= 3) {
          assert(!admit && dupOf == base,
            s"resub $id: admit=$admit dup_of=$dupOf (want $base)")
          rejected += 1
        }
      }
    }
    assert(rejected > 10, s"only $rejected rejections — demo is vacuous")
  }

  test("d02 MinHash+LSH finds exactly the exact-Jaccard pairs at its threshold") {
    // d04 is the exact inverted-index join — brute-force truth here.
    val exact = Dedup.d04NgramJaccard(spark, dir, shingleK = 5, threshold = 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.d02DedupMinhash(spark, dir, shingleK = 5, threshold = 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain injected near-dup pairs")
    // LSH output is always a subset (verified by exact Jaccard);
    // at 16 bands × 4 rows the miss probability at J≥0.7 is ~(1-0.24)^16≈1%.
    assert(lsh.subsetOf(exact))
    assert(lsh.size >= exact.size - 1,
      s"LSH missed too many: ${exact.size - lsh.size} of ${exact.size}")
  }

  test("d03 SimHash band join equals brute-force Hamming pairs (pigeonhole exact)") {
    val sigs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("sh64"))
    val brute = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        bit_count(col("x.sh64").bitwiseXOR(col("y.sh64"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.d03DedupSimhash(spark, dir, maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bands × 16 bits: any pair with Hamming ≤ 3 must collide in ≥1 band.
    assert(banded == brute)
    assert(banded.nonEmpty)
  }

  test("d02 planted-pair demo finds exactly the planted pairs (known answer)") {
    val corpus = Dedup.plantedTextCorpus(
      spark.read.parquet(s"$dir/documents.parquet"))
    // expected set computed WITHOUT LSH: each planted pair's exact
    // Jaccard from the shingle sets directly; tagging guarantees no
    // cross-document pair can exist at all
    val sh = Dedup.docShingleHashes(corpus, 5)
    val expected = sh.as("a")
      .join(sh.as("b"), col("b.doc_id") === col("a.doc_id") + 1000000L)
      .select(col("a.doc_id").as("da"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .filter(col("j") >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    val got = Dedup.d02DedupMinhashDemo(spark, dir).collect()
    assert(got.forall(r => r.getLong(1) == r.getLong(0) + 1000000L),
      "a non-planted pair surfaced — token tagging failed")
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(expected.size >= 400, s"demo near-vacuous: ${expected.size} pairs")
  }

  test("d03 planted-pair demo: banding finds exactly the <=3-Hamming planted pairs") {
    val corpus = Dedup.plantedTextCorpus(
      spark.read.parquet(s"$dir/documents.parquet"))
    val sigs = corpus.select(col("doc_id"),
      graft.functions.F.simhash64(col("text")).as("s"))
    val expected = sigs.as("a")
      .join(sigs.as("b"), col("b.doc_id") === col("a.doc_id") + 1000000L)
      .select(col("a.doc_id").as("da"),
        bit_count(col("a.s").bitwiseXOR(col("b.s"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    val got = Dedup.d03DedupSimhashDemo(spark, dir).collect()
    assert(got.forall(r => r.getLong(1) == r.getLong(0) + 1000000L),
      "a non-planted pair surfaced — cross-doc SimHash collision")
    // banding is pigeonhole-exact at Hamming <= 3: equality, not recall
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(expected.nonEmpty)
  }

  test("d01 exact dedup keeps one row per distinct text") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDistinct = docs.select("text").distinct().count()
    val out = Dedup.d01DedupExact(spark, dir)
    assert(out.count() == nDistinct)
    assert(out.agg(sum("n_copies")).head.getLong(0) == docs.count())
  }

  test("d05 embedding near-dup pairs are symmetric-free and above threshold") {
    val out = Dedup.d05EmbedNeardup(spark, dir, threshold = 0.4).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getDouble(2) >= 0.4))
  }

  test("d07 clusters equal brute-force union-find over the same pairs") {
    val pairs = Dedup.d04NgramJaccard(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.d07DedupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // a multi-node chain exists (the test is not vacuous)
    assert(got.groupBy(_._2).values.exists(_.size >= 2))
  }

  test("d12 keeps exactly the highest-quality member of every cluster") {
    // independent ground truth: d04's verified pairs → driver-side
    // union-find → per-cluster argmax on a locally recomputed t02
    // quality score (split/count/round redone in plain Scala, no
    // engine code shared)
    val pairs = Dedup.d04NgramJaccard(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def quality(text: String): Double = {
      val toks = text.split(" ", -1)
      if (toks.length < 8) 0.0
      else {
        val stop = toks.count(t => t == "the" || t == "a")
        BigDecimal(1.0 - stop.toDouble / toks.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val byCluster = parent.keys.toSeq.groupBy(find)
    val expected = byCluster.flatMap { case (_, members) =>
      val cluster = members.min
      val kept = members.minBy(id => (-quality(texts(id)), id))
      members.map(id =>
        id -> (cluster, kept, if (id == kept) "keep" else "drop"))
    }
    val got = Dedup.d12KeepBestDedup(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(4)))
      .toMap
    assert(got == expected)
    // not vacuous: clusters exist, so something was dropped
    assert(got.values.exists(_._3 == "drop"))
  }

  test("d13 indexed gate == d11, and maintenance makes the lake remember admissions") {
    import spark.implicits._
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))
    // the persisted index must change NOTHING about verdicts: same
    // demo corpus through d11 (recompute) and d13 (index) agree
    // row-for-row including jaccard values
    val viaLake = Dedup.d11IncrementalDedupDemo(spark, dir)
      .collect().map(key).toSeq
    val viaIndex = Dedup.d13IndexedAdmitDemo(spark, dir)
      .collect().map(key).toSeq
    assert(viaIndex == viaLake && viaLake.nonEmpty)

    // maintenance: an admitted doc becomes part of the lake the NEXT
    // batch is gated against — and a replayed batch grows nothing
    val path = java.nio.file.Files
      .createTempDirectory("graft_d13m").toString + "/index"
    def doc(id: Long, tag: String) =
      (id, (1 to 30).map(i => s"w${i}_$tag").mkString(" "))
    Dedup.d13BuildDedupIndex(
      Seq(doc(1L, "a"), doc(2L, "b")).toDF("doc_id", "text"), path)
    val batch1 = Seq(doc(10L, "c")).toDF("doc_id", "text")
    val v1 = Dedup.d13AdmitAndMaintain(batch1, path, batchId = 1L).collect()
    assert(v1.length == 1 && v1.head.getBoolean(1), "fresh doc must admit")
    // resubmission of the ADMITTED doc (same text, new id): only the
    // maintained index can reject it — doc 10 was never in the build
    val v2 = Dedup.d13AdmitAndMaintain(
      Seq(doc(20L, "c")).toDF("doc_id", "text"), path, batchId = 2L)
      .collect()
    assert(v2.length == 1 && !v2.head.getBoolean(1) &&
      v2.head.getLong(2) == 10L,
      s"resubmission not caught by the maintained index: ${v2.toSeq}")
    // replay idempotence: re-running batch 1 rewrites its own
    // directory, never duplicates index rows
    val before = spark.read.parquet(s"$path/bands").count()
    Dedup.d13AdmitAndMaintain(batch1, path, batchId = 1L).collect()
    assert(spark.read.parquet(s"$path/bands").count() == before)
  }

  test("d13 meta gates loudly: no meta on the gate path, any param mismatch") {
    import spark.implicits._
    def doc(id: Long, tag: String) =
      (id, (1 to 30).map(i => s"w${i}_$tag").mkString(" "))
    // gating a path no build ever stamped must NOT invent a meta —
    // it must name the rebuild remedy
    val empty = java.nio.file.Files
      .createTempDirectory("graft_d13meta0").toString + "/index"
    val e0 = intercept[IllegalStateException] {
      Dedup.d13IncrementalDedupIndexed(
        Seq(doc(1L, "a")).toDF("doc_id", "text"), empty).collect()
    }
    assert(e0.getMessage.contains("no meta table") &&
      e0.getMessage.contains("rebuild"))
    // and no meta directory was left behind asserting parameters no
    // build ever used
    assert(!new java.io.File(s"$empty/meta").exists())

    // a shingle_k mismatch against a REAL build fails naming the param
    val path = java.nio.file.Files
      .createTempDirectory("graft_d13meta1").toString + "/index"
    Dedup.d13BuildDedupIndex(
      Seq(doc(1L, "a"), doc(2L, "b")).toDF("doc_id", "text"), path)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.d13IncrementalDedupIndexed(
        Seq(doc(3L, "c")).toDF("doc_id", "text"), path, shingleK = 7)
        .collect()
    }
    assert(e1.getMessage.contains("shingle_k"))
  }

  test("d13 compaction folds batch dirs, keeps verdicts, stays idempotent") {
    import spark.implicits._
    def doc(id: Long, tag: String) =
      (id, (1 to 30).map(i => s"w${i}_$tag").mkString(" "))
    val path = java.nio.file.Files
      .createTempDirectory("graft_d13c").toString + "/index"
    Dedup.d13BuildDedupIndex(
      Seq(doc(1L, "a"), doc(2L, "b")).toDF("doc_id", "text"), path)
    Dedup.d13AdmitAndMaintain(
      Seq(doc(10L, "c")).toDF("doc_id", "text"), path, batchId = 1L).collect()
    Dedup.d13AdmitAndMaintain(
      Seq(doc(11L, "d")).toDF("doc_id", "text"), path, batchId = 2L).collect()

    def batchDirs(sub: String): Set[String] =
      new java.io.File(s"$path/$sub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getName).toSet
    assert(batchDirs("bands") == Set("batch=-1", "batch=1", "batch=2"))

    // verdicts for a next batch, measured BEFORE compaction: one dup
    // of the build base, one dup of a streamed admission, one fresh
    val probe = Seq(doc(20L, "a"), doc(21L, "c"), doc(22L, "z"))
      .toDF("doc_id", "text")
    def verdicts() = Dedup.d13IncrementalDedupIndexed(probe, path)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq
    val before = verdicts()
    assert(before == Seq((20L, false, Some(1L)), (21L, false, Some(10L)),
      (22L, true, None)))

    // compact everything through batch 2: one base dir per sub-table,
    // name encoding watermark 2, and the SAME verdicts
    Dedup.d13CompactIndex(spark, path, upTo = 2L)
    assert(batchDirs("bands") == Set("batch=-4") &&
      batchDirs("shingles") == Set("batch=-4"))
    assert(verdicts() == before)
    assert(Dedup.compactWatermark(Set(-4L)) == Some(2L))

    // idempotent: re-running changes nothing on disk
    val snapshot = new java.io.File(s"$path/bands/batch=-4").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    Dedup.d13CompactIndex(spark, path, upTo = 2L)
    assert(new java.io.File(s"$path/bands/batch=-4").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap == snapshot)

    // and the maintained gate keeps working on the compacted index
    val v = Dedup.d13AdmitAndMaintain(
      Seq(doc(30L, "c"), doc(31L, "q")).toDF("doc_id", "text"),
      path, batchId = 3L).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v == Map(30L -> false, 31L -> true))
  }

  test("d07 propagation resolves a long chain (diameter > 1 round)") {
    import spark.implicits._
    // path graph 1-2-3-...-8: min label must travel 7 hops
    val edges = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("star CC collapses a 1200-hop chain in O(log n) rounds, exactly") {
    import spark.implicits._
    // adversarial diameter: a single path graph 1-2-...-1201. Min-label
    // propagation needs 1200 rounds here; star contraction must stay
    // logarithmic (the 100 TB posture for arbitrary cluster shapes).
    val n = 1201L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Dedup.connectedComponentsStarWithRounds(edges)
    val cc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == (1L to n).map(_ -> 1L).toMap)
    val bound = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 2
    assert(rounds <= bound, s"$rounds rounds > O(log n) bound $bound")
  }

  test("star CC handles worst-case star + multi-component mixes") {
    import spark.implicits._
    // two components with interleaved ids + an already-star component
    val edges = (Seq((10L, 2L), (2L, 30L), (30L, 4L)) ++ // comp min 2
      Seq((5L, 99L), (99L, 7L)) ++                       // comp min 5
      Seq((100L, 200L))).toDF("src", "dst")              // comp min 100
    val cc = Dedup.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(10L -> 2L, 2L -> 2L, 30L -> 2L, 4L -> 2L,
      5L -> 5L, 99L -> 5L, 7L -> 5L, 100L -> 100L, 200L -> 100L))
  }

  test("d08 finds planted shared passages at exact token offsets (all-pairs branch)") {
    import spark.implicits._
    // 16-token passage embedded in three docs at different offsets;
    // fillers are doc-unique so no other shingle can match. k=8,
    // minSpan=15 → the 16-token span qualifies; doc 1 (min id) keeps.
    val p = (0 until 16).map(i => s"p$i").mkString(" ")
    def filler(d: Int, n: Int) = (0 until n).map(i => s"f${d}_$i").mkString(" ")
    val docs = Seq(
      (1L, s"${filler(1, 4)} $p ${filler(1, 11)}"), // passage at 4..19
      (2L, s"${filler(2, 9)} $p"),                  // passage at 9..24
      (3L, s"$p ${filler(3, 13)}")                  // passage at 0..15
    ).toDF("doc_id", "text")
    val out = Dedup.d08SpansOver(docs, shingleK = 8, minSpanTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((2L, 9L, 24L, 16L), (3L, 0L, 15L, 16L)))
  }

  test("d08 canonical branch flags hot boilerplate at linear cost (df > maxDf)") {
    import spark.implicits._
    val p = (0 until 16).map(i => s"p$i").mkString(" ")
    def filler(d: Int, n: Int) = (0 until n).map(i => s"f${d}_$i").mkString(" ")
    val docs = (1 to 5).map(d =>
      (d.toLong, s"${filler(d, d + 2)} $p")).toDF("doc_id", "text")
    // maxDf=2 < df=5 → every non-canonical doc pairs ONLY with doc 1
    val out = Dedup.d08SpansOver(docs, shingleK = 8, minSpanTokens = 15,
      maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (2 to 5).map { d =>
      val start = (d + 2).toLong // passage starts after the filler
      (d.toLong, start, start + 15L, 16L)
    }.toSet
    assert(out.toSet == expected)
    // the canonical pack (doc_id << 24 | pos) is only sound for
    // 0 ≤ doc_id < 2^39 — a hash-MINTED id (negative, the st25 class)
    // must fail LOUDLY in the high-df branch, not shift-wrap into a
    // garbage canonical election (review r14)
    val withNeg = docs.union(
      Seq((-7L, s"${filler(9, 3)} $p")).toDF("doc_id", "text"))
    val e = intercept[Exception] {
      Dedup.d08SpansOver(withNeg, shingleK = 8, minSpanTokens = 15,
        maxDf = 2).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.toString + msgs(t.getCause)
    assert(msgs(e).contains("packable"), s"wrong failure: ${msgs(e)}")
  }

  test("d08 merges overlapping runs from different partners into one maximal span") {
    import spark.implicits._
    // doc 3 = a0..a15 x0..x7. It shares a0..a15 (tokens 0..15) with
    // doc 1 and a8..a15 x0..x7 (tokens 8..23) with doc 2 → the two
    // runs overlap and must merge into one maximal span 0..23.
    val a = (0 until 16).map(i => s"a$i").mkString(" ")
    val docs2 = Seq(
      (1L, s"$a g0 g1 g2 g3 g4 g5 g6 g7"),
      (2L, s"h0 h1 h2 h3 h4 h5 h6 h7 " +
        s"${(8 until 16).map(i => s"a$i").mkString(" ")} x0 x1 x2 x3 x4 x5 x6 x7"),
      (3L, s"$a x0 x1 x2 x3 x4 x5 x6 x7")
    ).toDF("doc_id", "text")
    val out = Dedup.d08SpansOver(docs2, shingleK = 8, minSpanTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 3: tokens 0..15 (a0..a15) dup of doc 1; tokens 8..23
    // (a8..a15 x0..x7) dup of doc 2 → merged maximal span 0..23
    assert(out.contains((3L, 0L, 23L, 24L)))
    val doc3 = out.filter(_._1 == 3L)
    assert(doc3.length == 1, s"expected one merged span, got ${doc3.toSeq}")
  }

  test("d08 drops runs under minSpanTokens") {
    import spark.implicits._
    val p = (0 until 14).map(i => s"p$i").mkString(" ") // 14 < 15 min
    def filler(d: Int, n: Int) = (0 until n).map(i => s"f${d}_$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p ${filler(1, 6)}"),
      (2L, s"${filler(2, 6)} $p")).toDF("doc_id", "text")
    assert(Dedup.d08SpansOver(docs, shingleK = 8, minSpanTokens = 15).isEmpty)
  }

  test("d08 demo: every planted doc except the min gets exactly its 20-token span") {
    val out = Dedup.d08SubstringDedup(spark, TestSpark.Sf0001).collect()
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val plantedIds = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.length == plantedIds.length - 1)
    assert(out.forall(_.getLong(3) == 20L))
    assert(out.map(_.getLong(0)).toSet == plantedIds.drop(1).toSet)
    // span covers exactly the appended passage: [n_base_tokens, +19]
    val nToks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) == nToks(r.getLong(0)))
      assert(r.getLong(2) == nToks(r.getLong(0)) + 19L)
    }
  }

  test("d09 applySpans removes exactly the covered tokens (hand fixture)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "k l m n o p")).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 1L, 2L), (1L, 5L, 6L) // two disjoint spans in doc 1
    ).toDF("doc_id", "span_start", "span_end")
    val out = Dedup.applySpans(docs, spans)
      .select("doc_id", "clean_text", "n_removed").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("a d e h", 4L)))
    assert(out(2L) == (("k l m n o p", 0L))) // span-free doc untouched
  }

  test("d09 demo restores every non-min planted doc to its tagged base text") {
    val base = Dedup.plantedSpanCorpus(
      spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val taggedOnly = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val tagged = taggedOnly.select(col("doc_id"),
      array_join(transform(split(col("text"), " "),
        t => concat(t, lit("_"), col("doc_id"))), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val minPlanted = tagged.keys.filter(_ % 10 == 0).min
    val out = Dedup.d09SubstringApply(spark, TestSpark.Sf0001).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 10 == 0 && id != minPlanted) {
        assert(r.getString(1) == tagged(id), s"doc $id not restored")
        assert(r.getLong(2) == 20L)
      } else {
        assert(r.getString(1) == base(id), s"doc $id changed")
        assert(r.getLong(2) == 0L)
      }
    }
    assert(out.count(_.getLong(2) == 20L) ==
      tagged.keys.count(_ % 10 == 0) - 1)
  }

  test("d06 narrow bands (8-bit, high-recall opt-in) find every planted pair, exactly") {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val out = Dedup.d06EmbedNeardupDemo(spark, dir, threshold = 0.9,
      bands = 8).collect()
    // each planted copy sits ~1.4° from its base: every (v, v+1e6) pair
    // must surface, and nothing else clears 0.9 (natural max ≈ 0.6)
    assert(out.length == n, s"expected $n pairs, got ${out.length}")
    assert(out.forall(r => r.getLong(1) == r.getLong(0) + 1000000L))
    assert(out.forall(_.getDouble(2) >= 0.9))
  }

  test("d06 default (16-bit bands) holds the >=0.95 recall envelope") {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // the DEFAULT is the scale-safe config: 64× fewer random
    // collisions (n²/2¹⁶ floor vs n²/2⁸). Planted pairs sit at ~4.9°
    // (cos ≈ 0.9964): p(bit) ≈ 0.973, so per-pair band recall is
    // 1 − (1 − 0.973¹⁶)⁴ ≈ 0.98 — assert the ≥ 0.95 envelope and
    // that nothing BUT planted pairs surfaces (precision stays 1
    // by exact-cosine verification at any band width)
    val out = Dedup.d06EmbedNeardupDemo(spark, dir, threshold = 0.9).collect()
    assert(out.length >= (n * 95) / 100,
      s"recall ${out.length}/$n below the 0.95 envelope")
    assert(out.forall(r => r.getLong(1) == r.getLong(0) + 1000000L))
  }

  test("d10 semantic dedup drops planted copies against their originals") {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val out = Dedup.d10SemanticDedupDemo(spark, dir).collect()
    // precision 1 on the closed form: only planted copies (v + 1e6)
    // can clear 0.9 cosine, and their canonical winner is the base v
    assert(out.forall(r => r.getLong(0) >= 1000000L &&
      r.getLong(1) == r.getLong(0) - 1000000L), s"non-planted drop in d10")
    assert(out.forall(_.getDouble(2) >= 0.9))
    // recall: the published SemDeDup loss is pairs straddling a cell
    // boundary; at a ~1.4° perturbation the quantizer co-cells almost
    // every planted pair — pin the ≥ 0.9 envelope
    assert(out.length >= (n * 90) / 100,
      s"recall ${out.length}/$n below the 0.9 envelope")
  }

  test("d10 with the s14 distributed trainer keeps the planted closed form") {
    // the opt-in full-corpus Lloyd quantizer slots in where the
    // sampled trainer was — same precision-1 closed form, recall
    // envelope unchanged (cells move, the verify inside them doesn't)
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val planted = base.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + lit(0.015f) * cos(i.cast("double")).cast("float")))
        .as("embedding"))
    val n = base.count()
    val out = Dedup.d10SemanticDedupOver(base.union(planted),
      threshold = 0.9, distributedTrainer = true).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) >= 1000000L &&
      r.getLong(1) == r.getLong(0) - 1000000L),
      "non-planted drop under the distributed trainer")
    assert(out.length >= (n * 90) / 100,
      s"recall ${out.length}/$n below the 0.9 envelope")
  }

  test("d10 within-cell pruning is exact: co-celled d05 pairs all resolve") {
    // d10's only approximation is the cell partition: a (dup_of,
    // dropped) decision can only arise from a real ≥-threshold pair,
    // so every emitted pair must exist in d05's brute-force answer
    // over the same id slice (precision 1 w.r.t. pair existence).
    val exact = Dedup.d05EmbedNeardup(spark, dir, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sem = Dedup.d10SemanticDedupOver(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(org.apache.spark.sql.functions.col("vec_id") < 1000)
        .select("vec_id", "embedding"),
      threshold = 0.4).collect()
    assert(sem.nonEmpty)
    sem.foreach { r =>
      val k = (r.getLong(1), r.getLong(0)) // (dup_of=smaller, dropped)
      // dup_of is the MIN partner ≥ threshold; d05 must know that pair
      assert(exact.contains(k), s"$k not in brute-force pairs")
    }
  }

  test("d06 candidates verify exactly: subset of d05 brute force with equal values") {
    // same corpus, same threshold — d06's result must be a subset of
    // brute force (precision 1) with bit-identical cosine values
    val exact = Dedup.d05EmbedNeardup(spark, dir, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // bands = 8: the high-recall form surfaces enough borderline
    // (~0.4-cosine) candidates for a meaningful subset check — the
    // default 16-bit bands would correctly return few-to-none here
    val lsh = Dedup.d06EmbedNeardupLsh(spark, dir, threshold = 0.4,
      bands = 8).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(exact.contains(k), s"$k not in brute-force pairs")
      assert(exact(k) == r.getDouble(2))
    }
  }

  test("d15 canonicalization: hand URLs normalize to the documented form") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host case, default https port, fragment
      ("HTTPS://WWW.Example.COM:443/A/B#sec", "https://www.example.com/A/B"),
      // http default port; path case PRESERVED (only scheme/host fold)
      ("http://Example.com:80/Path/", "http://example.com/Path"),
      // non-default port kept
      ("https://example.com:8443/x", "https://example.com:8443/x"),
      // empty path → root; root slash survives
      ("https://example.com", "https://example.com/"),
      ("https://example.com/", "https://example.com/"),
      // tracking params dropped, rest sorted bytewise
      ("https://e.com/p?z=1&utm_source=a&a=2&gclid=g&ref=r",
        "https://e.com/p?a=2&z=1"),
      // tracking-only query collapses to no query at all
      ("https://e.com/p?utm_campaign=c&fbclid=f", "https://e.com/p"),
      // VALUELESS tracking params (no '=') drop too — ?fbclid and
      // ?fbclid=f must land on the same canonical URL
      ("https://e.com/p?fbclid&a=2&utm_source&ref", "https://e.com/p?a=2"),
      // but a non-tracking param that merely STARTS with 'ref' stays
      ("https://e.com/p?reference=1&refresh", "https://e.com/p?reference=1&refresh"),
      // '?' with empty query
      ("https://e.com/p?", "https://e.com/p"),
      // fragment before query-less path, trailing slash
      ("https://e.com/a/b/#x", "https://e.com/a/b"),
      // scheme-less / malformed URLs canonicalize to THEMSELVES —
      // distinct junk must never collapse to one shared key
      ("foo.com/a", "foo.com/a"),
      ("bar.com/b", "bar.com/b"),
      ("mailto:alice@example.com", "mailto:alice@example.com"))
    val got = Dedup.urlCanonicalizeOver(
        cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }
          .toDF("doc_id", "url"))
      .orderBy("doc_id").select("canon_url").as[String].collect()
    cases.zip(got).foreach { case ((u, want), c) =>
      assert(c == want, s"canon($u) = $c, want $want")
    }
  }

  test("d16 line dedup: boilerplate cut at minDf, order kept, empty-doc leg") {
    import spark.implicits._
    val bp = "cookie banner"
    val docs = Seq(
      (1L, s"alpha one\n$bp\nbeta two"),
      (2L, s"$bp\ngamma three"),
      (3L, s"delta four\n$bp"),
      (4L, bp),                       // all-boilerplate doc → empty clean
      (5L, "epsilon five\nzeta six")) // untouched
      .toDF("doc_id", "text")
    val got = Dedup.lineDedupOver(docs, minDf = 3L).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, "alpha one\nbeta two", 18L),
      (2L, 2L, 1L, "gamma three", 11L),
      (3L, 2L, 1L, "delta four", 10L),
      (4L, 1L, 1L, "", 0L),
      (5L, 2L, 0L, "epsilon five\nzeta six", 21L)))
    // below the threshold nothing is boilerplate
    val none = Dedup.lineDedupOver(docs, minDf = 5L)
      .agg(org.apache.spark.sql.functions.sum("n_dropped")).head.getLong(0)
    assert(none == 0L)
  }

  test("d16 demo: planted docs lose exactly the boilerplate line, others none") {
    val rows = Dedup.d16LineDedup(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nDropped, clean) = (r.getLong(0), r.getLong(2), r.getString(3))
      if (id % 4 == 1 || id % 4 == 3)
        assert(nDropped == 1L, s"doc $id dropped $nDropped")
      else assert(nDropped == 0L, s"doc $id dropped $nDropped")
      assert(!clean.contains("subscribe to our newsletter"), s"doc $id")
    }
  }

  test("d17 demo: only the shared boilerplate sentence is cut, docs stay intact") {
    val rows = Dedup.d17SentenceDedup(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nDropped, clean) = (r.getLong(0), r.getLong(2), r.getString(3))
      if (id % 3 == 0) assert(nDropped == 1L, s"doc $id dropped $nDropped")
      else assert(nDropped == 0L, s"doc $id dropped $nDropped")
      assert(!clean.contains("all rights reserved"), s"doc $id")
      // surviving sentences still carry their terminators in order
      assert(clean.nonEmpty && "[.!?]$".r.findFirstIn(clean).isDefined,
        s"doc $id clean tail: ${clean.takeRight(12)}")
    }
  }

  test("d15 demo: every group of 5 collapses to one canonical keeper") {
    val rows = Dedup.d15UrlDedup(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    // variants 0-3 share the bare canonical; variant 4 keeps ?a=1&b=2 —
    // so each doc_id div 5 group yields exactly two canonical URLs
    rows.foreach { r =>
      val (id, nDups, keeper) = (r.getLong(0), r.getLong(3), r.getLong(4))
      if (id % 5 == 4) {
        assert(nDups == 1L && keeper == 1L, s"doc $id")
        assert(r.getString(2).endsWith("?a=1&b=2"), r.getString(2))
      } else {
        assert(nDups == 4L, s"doc $id n_dups $nDups")
        assert(keeper == (if (id % 5 == 0) 1L else 0L), s"doc $id")
      }
    }
    // group law: canonical URLs within a group agree across variants
    rows.filter(_.getLong(0) % 5 != 4).groupBy(_.getLong(0) / 5)
      .foreach { case (_, g) =>
        assert(g.map(_.getString(2)).toSet.size == 1, "group split")
      }
  }
}
