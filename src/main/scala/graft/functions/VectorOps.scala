package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` / `aggregate`) — no
  * UDFs, so the expressions stay inside whole-stage codegen and are
  * usable at any scale.
  *
  * Determinism (SURVEY.md §4): every element is cast float→double
  * before arithmetic and the fold is left-to-right, matching a
  * single-threaded oracle loop bit-for-bit; results that cross an
  * engine boundary are rounded to 4 decimals.
  */
object VectorOps {

  /** Left-to-right double dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Left-to-right double squared L2 norm. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Cosine similarity, double precision, deterministic fold order. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine rounded for engine-boundary comparison. */
  def cosine4(a: Column, b: Column): Column = round(cosine(a, b), 4)
}
