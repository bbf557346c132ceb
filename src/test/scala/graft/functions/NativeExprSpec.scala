package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorOps
import graft.operators.Dedup

/** e01/e02/e03: native codegen expressions match their higher-order-
  * function reference compositions bit-for-bit, and are callable from
  * SQL via the GraftExtensions registration.
  */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  test("e01 native cosine == HOF cosine on all embedding pairs vs vec 0") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = e.crossJoin(q)
      .select(
        VectorOps.cosine(col("embedding"), col("qv")).as("hof"),
        F.cosineSim(col("embedding"), col("qv")).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("e06 native minhash signatures == HOF signatures on the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val native = Dedup.minhashSignatures(docs, shingleK = 5, numPerm = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = Dedup.minhashSignaturesHof(docs, shingleK = 5, numPerm = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == hof.keySet && native.nonEmpty)
    native.foreach { case (id, sig) => assert(sig == hof(id), s"doc $id") }
  }

  test("e02 native simhash == HOF simhash on the corpus") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(
        Dedup.simhash64(col("text")).as("hof"),
        F.simhash64(col("text")).as("native"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("e03 SQL registration: cosine_sim/simhash64/fingerprint64 callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |  simhash64('hello world') AS s,
        |  fingerprint64('hello world') AS f""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) != 0L)
    assert(r.getLong(2) != 0L)
  }

  test("fingerprint64 is order-sensitive and deterministic") {
    val r = spark.sql(
      """SELECT fingerprint64('a b c') AS x, fingerprint64('c b a') AS y,
        |       fingerprint64('a b c') AS x2""".stripMargin).head()
    assert(r.getLong(0) != r.getLong(1))
    assert(r.getLong(0) == r.getLong(2))
  }

  test("e03 SQL registration: marker_count/shingle_hashes64/minhash_sig_text") {
    val r = spark.sql(
      """SELECT
        |  marker_count('the cat and the hat', 'the,and') AS mc,
        |  size(shingle_hashes64('a b c d e f', 5)) AS nsh,
        |  size(minhash_sig_text('a b c d e f', 5, 16)) AS nsig""".stripMargin)
      .head()
    assert(r.getLong(0) == 3)
    assert(r.getInt(1) == 2) // "a b c d e", "b c d e f"
    assert(r.getInt(2) == 16)
  }

  test("e03 SQL registration: round-5 kernels callable from SQL") {
    val vocab = graft.functions.F.joinVocab(Seq("ab", "a", "b"))
    val r = spark.sql(
      s"""SELECT
         |  subword_stats('abab', '$vocab') AS st,
         |  subword_ids('abab', '$vocab') AS ids,
         |  repetition_stats('a a b') AS rep,
         |  size(shingle_pos_hashes64('a b a b a', 2)) AS nsp,
         |  remove_token_spans('a b c d', array(1L, 3L), array(1L, 3L)) AS rm
         |""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(2L, 0L))       // ab|ab
    assert(r.getSeq[Int](1) == Seq(0, 0))          // both pieces id 0
    assert(r.getSeq[Long](2) == Seq(3L, 2L, 2L, 1L, 2L))
    assert(r.getInt(3) == 4)                       // positions 0..3
    assert(r.getString(4) == "a c")
  }

  test("e10 shingle hashes == xxhash64 of HOF shingles, as sets") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val toks = split(col("text"), " ")
    val hofShingles = array_distinct(
      transform(sequence(lit(0), size(toks) - 5),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(5)))))
    val rows = d
      .filter(size(split(col("text"), " ")) >= 5)
      .select(
        sort_array(transform(hofShingles, s => xxhash64(s))).as("hof"),
        sort_array(F.shingleHashes64(col("text"), 5)).as("native"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // short docs are null, matching the size(sh) > 0 filter semantics
    import spark.implicits._
    val short = Seq("a b c").toDF("text")
      .select(F.shingleHashes64(col("text"), 5)).head
    assert(short.isNullAt(0))
  }

  test("e09 srp_sig64: SQL == column API, deterministic, scale-invariant") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.createOrReplaceTempView("ne_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, srp_sig64(embedding) AS s FROM ne_emb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = e.select(col("vec_id"), F.srpSig64(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // sign-projection is invariant to positive scaling of the vector
    val scaled = e.select(col("vec_id"),
      F.srpSig64(transform(col("embedding"),
        x => (x * lit(2.5f)))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scaled == viaSql)
  }
}
