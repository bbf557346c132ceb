package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables

/** f11: CSV ingestion — the second-dominant drop format after JSONL
  * (f10), through Spark's native distributed CSV source with the same
  * never-drop-silently contract: PERMISSIVE mode + a quarantine
  * column, so arrived = parsed + corrupt conserves. RFC 4180 quoting
  * is exercised for real (quoted fields with embedded commas and
  * doubled-quote escapes — `escape` is set to `"` explicitly because
  * Spark's univocity default is backslash, NOT the RFC's `""`).
  *
  * Spark's PERMISSIVE CSV semantics (probed, not assumed): a
  * wrong-arity row still parses its leading well-formed tokens into
  * the schema columns AND lands the whole raw line in the quarantine
  * column — both the partial parse and the verdict are part of the
  * oracle contract.
  *
  * Scale: file-granular parallelism, schema as a contract (never
  * inferred — inference is a full extra pass that drifts with data),
  * no shuffle — ingest is a scan.
  */
object CsvSource {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** Read a CSV directory/file with corrupt-line quarantine. */
  def ingestCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(DocSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("escape", "\"") // RFC 4180 doubled-quote escaping
      .csv(path)

  /** The deterministic demo corpus: one CSV line per document row,
    * built by string concat so the oracle re-parses byte-identical
    * lines with an independent implementation. Every 7th-mod-2 row
    * quotes its source field with an embedded comma and a doubled
    * quote (the RFC's two hard cases); every 89th row carries one
    * EXTRA field — the wrong-arity corrupt fixture.
    */
  def f11Lines(spark: SparkSession, dir: String): DataFrame = {
    val srcField = when(col("doc_id") % 7 === 2,
      concat(lit("\""), col("source"), lit(",q\"\"t\"")))
      .otherwise(col("source"))
    val base = concat(col("doc_id"), lit(","), col("lang"), lit(","),
      srcField, lit(","), col("n_chars"))
    Tables(spark, dir).documents
      .select(col("doc_id"), base.as("b"))
      .select(when(col("doc_id") % 89 === 0, concat(col("b"), lit(",x")))
        .otherwise(col("b")).as("line"))
  }

  /** f11 driver demo: materialize the demo corpus as real .txt CSV
    * files, ingest through the distributed CSV source, and emit
    * parsed rows + quarantine accounting.
    */
  def f11CsvIngest(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_f11_${dir.hashCode.toHexString}/lines"
    f11Lines(spark, dir).write.mode("overwrite").text(path)
    ingestCsv(spark, path)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("_corrupt_record").isNotNull.as("is_corrupt"),
        col("_corrupt_record").as("corrupt_raw"))
      .orderBy(col("is_corrupt"), col("doc_id"), col("corrupt_raw"))
  }
}
