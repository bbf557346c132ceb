package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent but partition-layout-dependent too —
  * the same seed over a repartitioned table picks different rows, which
  * breaks reproducible dataset builds. Hash-gating on a stable key is
  * layout-independent: the same (key, rate) always selects the same
  * rows, on any cluster, in any partitioning, today or in a year.
  */
object Sampling {

  private val Buckets = 1L << 20

  /** Keep rows whose key hashes into the first `rate` fraction of the
    * hash space. Deterministic, layout-independent, O(1) per row.
    */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame =
    df.filter(pmod(xxhash64(keyCol), lit(Buckets)) < lit((rate * Buckets).toLong))

  /** Per-stratum hash sampling: each group keyed by `stratumCol` is
    * sampled at its own rate (absent strata use `defaultRate`).
    * Rates ship as a literal map expression — no join, no shuffle.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateExpr = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(stratumCol === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(keyCol), lit(Buckets)) <
      (rateExpr * Buckets).cast("long"))
  }

  /** Deterministic train/validation/test split — disjoint and
    * exhaustive by construction (one hash, three ranges).
    */
  def split3(df: DataFrame, keyCol: Column, trainFrac: Double,
      valFrac: Double): (DataFrame, DataFrame, DataFrame) = {
    val h = pmod(xxhash64(keyCol), lit(Buckets))
    val t = (trainFrac * Buckets).toLong
    val v = ((trainFrac + valFrac) * Buckets).toLong
    (df.filter(h < t), df.filter(h >= t && h < v), df.filter(h >= v))
  }

  /** x16: deterministic corpus shuffle — the global example-order
    * permutation every training run needs. Ordering by a seeded hash
    * of the key is a fixed pseudo-random permutation: seed-sensitive,
    * layout-independent (same order on any cluster or partitioning),
    * and reproducible a year later — none of which holds for
    * `orderBy(rand())`. The key tiebreak makes it total even under
    * hash collisions. Physically this is one range-partitioned sort —
    * the same cost class as any global sort Spark plans, and the
    * sorted write doubles as the x09-style layout pass; downstream
    * trainers read partitions in filename order and see the
    * permutation without any further shuffle.
    */
  def shuffleDeterministic(df: DataFrame, keyCol: Column,
      seed: Long): DataFrame =
    df.orderBy(xxhash64(lit(seed), keyCol), keyCol)
}
