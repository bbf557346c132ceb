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

  /** events.parquet's `ts` physical type has drifted across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * surfaces as LONG under `legacy.parquet.nanosAsLong`) vs
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read natively as
    * TIMESTAMP_NTZ). Branch on the schema actually loaded rather than
    * assuming either: LongType → rebuild a TIMESTAMP_NTZ via integral
    * `div 1000` (epoch-nanos ~1.7e18 exceed double's 2^53 exact range, so
    * float division would silently corrupt timestamps; source data is
    * micros-grained, so the conversion is lossless); timestamp types →
    * pass through, normalized to TIMESTAMP_NTZ so downstream queries see
    * one type regardless of the file era.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, expr, lit, raise_error, timestamp_micros, when}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        // magnitude guard: epoch-NANOS for any plausible date sits in
        // ~[1e17, 4e18] (1973–2096); a future era shipping epoch-MICROS
        // as plain LONG (~1.7e15) would hit this same branch and
        // silently divide every timestamp 1000× into 1970-adjacent
        // garbage. The guard is a per-row codegen'd branch (no extra
        // load-time job) that fails LOUDLY on the wrong magnitude.
        raw.withColumn("ts",
          when(col("ts").between(100000000000000000L, 4000000000000000000L),
            timestamp_micros(expr("ts div 1000")))
            .otherwise(raise_error(concat(
              lit("events.ts LONG value "), col("ts").cast("string"),
              lit(" is outside the epoch-nanos magnitude range — a new " +
                "testdata era (micros-as-LONG?); extend Tables.events " +
                "with an explicit branch for this era"))))
            .cast(TimestampNTZType))
      case TimestampNTZType => raw
      case org.apache.spark.sql.types.TimestampType =>
        // zoned → wall clock in the session timezone (GraftSession pins
        // UTC, matching the oracle's epoch arithmetic)
        raw.withColumn("ts", raw("ts").cast(TimestampNTZType))
      case other =>
        // an unanticipated era must FAIL LOUDLY at load: a blind cast
        // to timestamp_ntz can silently null every value (e.g. a
        // STRING era with a non-ISO format) while still passing any
        // schema-level check downstream
        throw new IllegalStateException(
          s"events.ts loaded as unexpected type $other — the testdata " +
            "generator drifted again; extend Tables.events with an " +
            "explicit branch for this era (see the LongType nanos case)")
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
