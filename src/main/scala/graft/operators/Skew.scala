package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5).
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; salting
  * is the complementary static tool for the cases AQE can't rewrite —
  * skewed aggregations and joins where one side must be replicated.
  * Both helpers preserve exact semantics: results are identical to the
  * unsalted equivalent, only the partitioning changes.
  */
object Skew {

  /** Salted equi-join: fact rows get a random-but-deterministic salt in
    * [0, salts); the (small-ish, but too big to broadcast) build side is
    * replicated once per salt. A hot key's rows then spread over `salts`
    * partitions instead of one straggler task.
    *
    * Exactness: salt is derived from the fact row's full content hash,
    * so it's stable across retries; each fact row matches exactly one
    * replica of each build row (its own salt), so multiplicity is
    * unchanged.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: String,
      buildKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          col(factKey) === col(buildKey), joinType)
      .drop("_salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: aggregate on
    * (key, salt) first — spreading a hot key across `salts` reducers —
    * then combine the partials per key. Caller supplies per-phase
    * aggregates whose composition is exact (sum/sum, count/sum,
    * min/min, max/max...).
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      phase1: Seq[Column], phase2: Seq[Column]): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(col(key))
      .agg(phase2.head, phase2.tail: _*)
}
