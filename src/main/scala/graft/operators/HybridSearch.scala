package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.F

/** s16: hybrid retrieval — the BM25 ⊕ vector-search fusion every
  * modern retrieval/RAG stack runs (public practice: lexical and
  * semantic recall fail on DIFFERENT queries, so fuse both lists with
  * reciprocal-rank fusion, Cormack et al. SIGIR'09). The keyword leg
  * is Okapi BM25 (k1 = 1.2, b = 0.75); the vector leg is the s01
  * exact-cosine ranking; fusion is RRF with the standard c = 60:
  * rrf(d) = Σ_legs 1/(60 + rank_leg(d)) over each leg's top `legK`.
  *
  * Determinism discipline: every BM25 factor is IEEE arithmetic on
  * exact integers in a FIXED expression tree (dl·N stays < 2⁵³ to
  * ~10⁹ docs — beyond that lift the product to DECIMAL); ln of the
  * idf input is the one transcendental (StrictMath on the Spark side,
  * memo side-table for the oracle — the c14/t15 pattern); per-doc
  * term sums are 9-dp-rounded DECIMAL(28,9) (partition-order-free);
  * ranks break ties on doc_id.
  *
  * Scale: the tf pass joins the exploded corpus against the ≤8
  * broadcast query terms FIRST, so only query-term postings shuffle
  * (the inverted-index access pattern, never the full vocabulary);
  * each leg's top-k is a distributed TakeOrdered; the rank windows
  * and the fusion join run on ≤ 2·legK rows (bounded, documented).
  */
object HybridSearch {

  /** s16 driver demo: query = the first 8 tokens + the embedding of
    * doc/vec 0; corpus = everything else (the s01 convention). Output:
    * top-k docs by RRF with each leg's rank (null = not in that leg's
    * top `legK`).
    */
  def s16HybridSearch(spark: SparkSession, dir: String, k: Int = 20,
      legK: Int = 100): DataFrame = {
    val scored = bm25ScoresOver(Tables(spark, dir).documents)
    val topB = scored
      .orderBy(col("bm25").desc, col("doc_id")).limit(legK)
      .withColumn("rank_bm25", row_number()
        .over(Window.orderBy(col("bm25").desc, col("doc_id")))
        .cast(LongType))
      .select("doc_id", "rank_bm25")
    val emb = Tables(spark, dir).embeddings
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val topV = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        F.cosineSim4(col("embedding"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id")).limit(legK)
      .withColumn("rank_vec", row_number()
        .over(Window.orderBy(col("cos_sim").desc, col("doc_id")))
        .cast(LongType))
      .select("doc_id", "rank_vec")
    topB.join(topV, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("rank_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rank_vec")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .select("doc_id", "rank_bm25", "rank_vec", "rrf")
  }

  /** Per-document BM25 scores of the demo query against the demo
    * corpus — shared by the driver query and [[s16AuxLn]] so the idf
    * inputs can never drift from the scoring pass.
    */
  private[operators] def bm25ScoresOver(docs: DataFrame): DataFrame = {
    val (qterms, tf, dl, nd, tt) = bm25Base(docs)
    val idf = idfInputs(tf, nd)
    qterms.join(idf, Seq("tok"))
      .join(tf, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"),
        round(log(col("x")) *
          ((col("tf") * lit(2.2)) /
            (col("tf") + lit(0.3) +
              lit(0.9) * ((col("dl") * lit(nd)) / lit(tt)))), 9)
          .cast("decimal(28,9)").as("term"))
      .groupBy("doc_id")
      .agg(sum(col("term")).cast("double").as("bm25"))
  }

  /** (query terms w/ positions, per-doc tf on query terms only,
    * per-doc lengths, corpus doc count, corpus token count).
    */
  private def bm25Base(docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame, Long, Long) = {
    val corpus = docs.filter(col("doc_id") =!= 0)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val dl = corpus
      .select(col("doc_id"), size(col("w")).cast(LongType).as("dl"))
    val nd = corpus.count()
    val tt = dl.agg(sum(col("dl"))).collect().head.getLong(0)
    val qterms = docs.filter(col("doc_id") === 0)
      .select(posexplode(slice(split(col("text"), " "), 1, 8))
        .as(Seq("qpos", "tok")))
    // inverted-index access: only postings of the ≤8 query terms
    // survive the broadcast semi-join — the full vocabulary never
    // shuffles
    val tfAll = corpus.select(col("doc_id"), explode(col("w")).as("tok"))
      .join(broadcast(qterms.select("tok").distinct()), Seq("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    (qterms, tfAll, dl, nd, tt)
  }

  /** Distinct idf inputs x = 1 + (N − df + 0.5)/(df + 0.5), one per
    * query term.
    */
  private def idfInputs(tf: DataFrame, nd: Long): DataFrame =
    tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .select(col("tok"),
        (lit(1.0) + ((lit(nd) - col("df")) + lit(0.5)) /
          (col("df") + lit(0.5))).as("x"))

  /** s16 oracle ln-memo: the exact idf-input doubles with their
    * StrictMath ln — DuckDB recomputes the whole BM25 + fusion
    * pipeline itself and only looks up this one transcendental
    * (the c14/t15 pattern).
    */
  def s16AuxLn(spark: SparkSession, dir: String): DataFrame = {
    val (_, tf, _, nd, _) = bm25Base(Tables(spark, dir).documents)
    idfInputs(tf, nd).select(col("x"), log(col("x")).as("lx")).distinct()
  }
}
