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
}
