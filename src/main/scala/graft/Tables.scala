package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each accessor is a plain `spark.read.parquet` so Catalyst sees the
  * scan directly — filters and projections written downstream are pushed
  * into the parquet reader (visible as PushedFilters / ReadSchema in
  * `.explain("formatted")`), which is the property that matters when the
  * same code runs over a 100 TB lake instead of a local directory.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects. Read nanos as LONG
    * (legacy.parquet.nanosAsLong) and rebuild a TIMESTAMP_NTZ. The
    * nanos→micros step uses integral `div` — epoch-nanos (~1.7e18)
    * exceed double's 2^53 exact-integer range, so a float division
    * would silently corrupt timestamps. Source data is micros-grained,
    * so the conversion is lossless.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000"))
        .cast("timestamp_ntz"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
