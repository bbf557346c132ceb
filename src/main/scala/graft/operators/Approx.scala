package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch-based approximate aggregates — the 100 TB path for distinct
  * counts and quantiles, where the exact versions (q08, q27) shuffle
  * every distinct value / hold full sort runs. HLL and quantile
  * summaries are mergeable, so partials combine map-side and shuffle
  * volume is O(sketch size), not O(data).
  */
object Approx {

  /** HLL precision: p index bits → m = 2^12 = 4096 registers,
    * standard error 1.04/√m ≈ 1.6%. Rank lives in the remaining
    * 64−p = 52 hash bits, so register values span 1..53.
    */
  val HllP = 12
  val HllM: Int = 1 << HllP          // 4096
  val HllRankMax: Int = 64 - HllP + 1 // 53 (all 52 suffix bits zero)

  /** α·m² for the raw HLL estimate (Flajolet et al. 2007, m ≥ 128:
    * α = 0.7213/(1 + 1.079/m)). Computed once in plain IEEE doubles;
    * the oracle SQL interpolates this exact double's shortest
    * round-trip literal, so both engines start from the identical
    * bits and the whole estimate chain stays bit-deterministic.
    */
  val HllAlphaM2: Double =
    0.7213 / (1.0 + 1.079 / HllM.toDouble) * HllM.toDouble * HllM.toDouble

  /** Classic HLL over `value` per `group`, entirely in builtin
    * codegen'd expressions — a DETERMINISTIC sketch (unlike the
    * opaque HLL++ in [[q28BenchSketch]], every intermediate is a
    * documented integer/IEEE op, so a DuckDB oracle can replay it):
    *
    *  - bucket = top p bits of xxhash64(value) (seed 42);
    *  - rank   = 1 + leading-zero count of the 52-bit suffix,
    *    via `65 − length(bin(h << p))` — Spark's `bin` prints a
    *    long's two's-complement binary without leading zeros, so its
    *    length IS 64 − clz (the w = 0 suffix caps rank at 53);
    *  - registers: groupBy(group, bucket) → max(rank) — ONE shuffle
    *    carrying ≤ m slim rows per group, the sketch's whole point;
    *  - harmonic sum as an EXACT integer: Σ 2^(R−r) over present
    *    registers + V·2^R for the V empty ones (R = group max rank),
    *    accumulated in DECIMAL(38,0) — each term ≤ 2^52 is an exact
    *    long, the total ≤ m·2^53 exceeds long range but not decimal;
    *  - raw estimate α·m²·2^R / S with the float ops in one fixed
    *    order (exact-int → double conversions are correctly rounded
    *    on both engines);
    *  - small-range correction: E ≤ 2.5m and V > 0 → m·ln(m/V)
    *    (linear counting). ln is the one transcendental; the oracle
    *    reads it from the [[q28AuxLn]] memo keyed on integer V.
    *    No large-range branch: with 64-bit hashes the 2^32 collision
    *    correction never fires (Heule et al. 2013 dropped it too).
    *
    * Scale posture: input → one map-side-combinable register
    * aggregation (≤ m rows per group survive the partial), then two
    * scalar-per-group aggs. Shuffle volume is O(groups·m), data-size
    * independent — the 100 TB shape.
    */
  def hllDistinct(df: DataFrame, groupCol: String, value: Column): DataFrame = {
    val h = xxhash64(value)
    val w = shiftleft(h, HllP)
    val reg = df
      .select(col(groupCol),
        shiftrightunsigned(h, 64 - HllP).as("bucket"),
        when(w === 0L, lit(HllRankMax))
          .otherwise(lit(65) - length(bin(w))).as("r"))
      .groupBy(groupCol, "bucket").agg(max("r").as("r"))
    val st = reg.groupBy(groupCol)
      .agg(count(lit(1)).as("pres"), max("r").as("big_r"))
    val s = reg.join(st, groupCol)
      .select(col(groupCol),
        expr("CAST(shiftleft(CAST(1 AS BIGINT), big_r - r) AS DECIMAL(38,0))")
          .as("term"))
      .groupBy(groupCol).agg(sum("term").as("s_pres"))
    st.join(s, groupCol)
      .select(col(groupCol),
        (lit(HllM) - col("pres")).cast("int").as("v"), col("big_r"),
        // exact-integer S: each factor explicitly DECIMAL(20,0) so the
        // product type (≤ 2^65) carries scale 0 — no rounding surface
        expr(s"""CAST(s_pres +
                 CAST($HllM AS DECIMAL(20,0)) *
                   CAST(shiftleft(CAST(1 AS BIGINT), big_r) AS DECIMAL(20,0)) -
                 CAST(pres AS DECIMAL(20,0)) *
                   CAST(shiftleft(CAST(1 AS BIGINT), big_r) AS DECIMAL(20,0))
               AS DECIMAL(38,0))""").as("s"))
      .select(col(groupCol), col("v"),
        ((lit(HllAlphaM2) *
          expr("CAST(shiftleft(CAST(1 AS BIGINT), big_r) AS DOUBLE)")) /
          col("s").cast("double")).as("e_raw"))
      .select(col(groupCol),
        when(col("e_raw") <= lit(2.5 * HllM) && col("v") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v").cast("double")))
          .otherwise(col("e_raw")).as("e"))
      .select(col(groupCol), floor(col("e")).cast("long").as("approx_parts"))
  }

  /** q28: approximate distinct parts per return flag via the
    * deterministic HLL above, with the exact count alongside (the
    * spec asserts |approx−exact|/exact < 5%; the oracle replays the
    * whole estimator in DuckDB from the persisted hash side-table).
    */
  def q28ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val approx = hllDistinct(
      t.lineitem.select(col("l_returnflag"), col("l_partkey")),
      "l_returnflag", col("l_partkey"))
    val exact = t.lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("approx_parts"), col("exact_parts"))
      .orderBy("l_returnflag")
  }

  /** Oracle side-table: xxhash64 per distinct part key. DuckDB has no
    * xxhash64, so the hash KERNEL crosses as data; bucketing, rank
    * (re-derived by an INDEPENDENT method — min set-bit probe over a
    * generate_series join, vs Spark's bin-length trick), registers,
    * the exact harmonic integer and both estimate branches all replay
    * in SQL.
    */
  def q28AuxHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .select(col("l_partkey").as("pk")).distinct()
      .select(col("pk"), xxhash64(col("pk")).as("h"))

  /** Oracle ln-memo for the linear-counting branch: lx = ln(m/v) for
    * every possible empty-register count v ∈ 1..m−1, computed by the
    * same JVM `log` the query uses (the established memo discipline —
    * DuckDB's libm ln can drift a last ulp).
    */
  def q28AuxLn(spark: SparkSession, dir: String): DataFrame =
    spark.range(1L, HllM.toLong)
      .select(col("id").cast("int").as("v"),
        log(lit(HllM.toDouble) / col("id").cast("double")).as("lx"))

  /** q28's bench shape: Spark's builtin HLL++ sketch ALONE, kept as
    * the engine-native comparison row (its merge is deterministic for
    * fixed data but its bias tables are engine-specific, so it cannot
    * be oracled; the correctness entry uses [[hllDistinct]]). As a
    * bench row it also avoids timing the exact countDistinct expand —
    * the very cost the sketch exists to avoid at 100 TB.
    */
  def q28BenchSketch(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")
  }

  /** Approximate percentiles via quantile summaries (accuracy param =
    * 1/relative-error). Not in the oracle set: the summary's merge is
    * partition-order sensitive at the margin, unlike HLL.
    */
  def approxPercentiles(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("approx_pcts"))
      .orderBy("l_returnflag")
  }
}
