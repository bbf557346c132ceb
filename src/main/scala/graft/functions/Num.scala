package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Deterministic-aggregate helpers.
  *
  * Double sums in a distributed groupBy are order-dependent (partition
  * order varies run to run), which would break bit-exact comparison
  * against a single-threaded oracle. All monetary aggregates therefore
  * run through fixed-point DECIMAL(18,4): decimal addition is
  * associative/commutative-exact, so any partition order yields the same
  * value; the final CAST back to DOUBLE is a single deterministic
  * conversion. Integral measures (quantities, counts) sum as LONG.
  */
object Num {
  val Money: DecimalType = DecimalType(18, 4)

  /** Fixed-point view of a monetary double column. */
  def dec(c: Column): Column = c.cast(Money)

  /** Order-independent sum of a monetary column, as double. */
  def decSum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact sum of an integral-valued double column. */
  def lsum(c: Column): Column = sum(c.cast(LongType))

  /** Order-independent mean of a monetary column (exact sum / count). */
  def decAvg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** Exact mean of an integral-valued column. */
  def intAvg(c: Column): Column = sum(c.cast(LongType)).cast(DoubleType) / count(lit(1))

  /** lineitem revenue: extendedprice * (1 - discount), fixed-point. */
  def revenueExpr: Column =
    dec(col("l_extendedprice")) * (lit(1).cast(Money) - dec(col("l_discount")))

  /** Order-independent revenue sum, as double. */
  def revenueSum: Column = sum(revenueExpr).cast(DoubleType)
}
