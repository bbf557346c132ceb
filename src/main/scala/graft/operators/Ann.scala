package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.F.cosineSim4
import graft.functions.VectorOps._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2.C, s01–s03).
  *
  * s01 is the exact brute-force baseline; s02 is the random-hyperplane
  * LSH path that survives 100 TB (bucket the corpus once, probe only
  * matching buckets); s03 generalizes to a k-NN join of a query set
  * against the corpus.
  */
object Ann {

  /** s01: brute-force cosine top-k for one query vector (vec_id 0).
    * The 1-row query side is broadcast; the scan side streams through
    * whole-stage-codegen'd zip_with/aggregate — no UDF, no collect.
    */
  def s01AnnBruteforce(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val t = Tables(spark, dir)
    val q = t.embeddings.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    t.embeddings.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosineSim4(col("embedding"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Random hyperplane for LSH, drawn from a fixed seed (deterministic
    * across runs/executors). Components are ±1 so the projection is an
    * exact integer-weighted sum — no float-order sensitivity.
    */
  private def hyperplanes(nBits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(nBits)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Sign-random-projection signature: bit i = [v · h_i > 0]. Built as
    * a codegen'd expression tree (one zip_with+aggregate per plane over
    * a literal ±1 array).
    */
  def srpSignature(v: Column, nBits: Int, dim: Int): Column = {
    val planes = hyperplanes(nBits, dim)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val lp = array(p.map(lit): _*)
      when(dot(v, lp) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce[Column]((a, b) => a.bitwiseOR(b))
  }

  /** s02: LSH-bucketed ANN — signature-bucket the corpus, multi-probe
    * the query's bucket plus all buckets within Hamming distance 2
    * (1 + n + n(n−1)/2 probes; 37/256 of the space at 8 bits), rank by
    * exact cosine inside the probed buckets. At 100 TB the corpus
    * bucketing is a one-off write partitioned by signature; each query
    * then touches ~14% of the data instead of all of it, and the probe
    * radius is the recall/cost dial.
    */
  def s02AnnLsh(spark: SparkSession, dir: String, k: Int = 10,
      nBits: Int = 8, dim: Int = 64): DataFrame = {
    val t = Tables(spark, dir)
    val corpus = t.embeddings.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"),
        srpSignature(col("embedding"), nBits, dim).as("sig"))
    val q = t.embeddings.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"),
        srpSignature(col("embedding"), nBits, dim).as("qsig"))
    // multi-probe set: Hamming 0, 1, and 2 perturbations of qsig
    val h1 = transform(sequence(lit(0), lit(nBits - 1)),
      i => col("qsig").bitwiseXOR(call_function("shiftleft", lit(1L), i)))
    val h2 = flatten(transform(sequence(lit(0), lit(nBits - 2)), i =>
      transform(sequence(i + lit(1), lit(nBits - 1)), j =>
        col("qsig")
          .bitwiseXOR(call_function("shiftleft", lit(1L), i))
          .bitwiseXOR(call_function("shiftleft", lit(1L), j)))))
    val probes = q.select(col("qv"),
      explode(concat(array(col("qsig")), h1, h2)).as("psig"))
    corpus.join(broadcast(probes), col("sig") === col("psig"))
      .select(col("vec_id"), cosineSim4(col("embedding"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** s03: k-NN join — every query vector (vec_id < nQueries) gets its
    * top-k corpus neighbors. Brute-force scoring with the small query
    * side broadcast; per-query ranking is one window over query_id.
    * The LSH-bucketed variant (s02's bucketing on both sides) replaces
    * the cross join at scale.
    */
  def s03KnnJoin(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 10): DataFrame = {
    import graft.functions.F
    val t = Tables(spark, dir)
    val queries = t.embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        sqrt(F.dotProd(col("embedding"), col("embedding"))).as("qn"))
    val corpus = t.embeddings.filter(col("vec_id") >= nQueries)
      .select(col("vec_id"), col("embedding"),
        sqrt(F.dotProd(col("embedding"), col("embedding"))).as("cn"))
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        F.cosineSim4Pre(col("embedding"), col("cn"), col("qv"), col("qn"))
          .as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
