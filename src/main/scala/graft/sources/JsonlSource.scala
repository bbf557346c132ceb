package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables

/** f10: JSONL ingestion — the line-delimited-JSON intake every
  * crawl/training-data drop arrives as (the reference copies opaque
  * files; a lakehouse engine must also PARSE the dominant text format
  * on the way in). Built on Spark's native distributed JSON source:
  * `spark.read.schema(...).json(dir)` splits files across executors
  * and parses with the codegen'd Jackson path — never a UDF. Malformed
  * lines are never dropped silently: PERMISSIVE mode +
  * `columnNameOfCorruptRecord` lands each bad line's raw text in a
  * quarantine column, so the ingest reports exactly which lines failed
  * and why-shaped accounting (arrived = parsed + corrupt) holds — the
  * same conservation discipline as the st15 audit rows.
  *
  * Scale: file-granular parallelism (one task per split), schema
  * pushdown (only requested fields are materialized by the parser),
  * no shuffle — ingest is a scan.
  */
object JsonlSource {

  /** The explicit ingest schema — an ingest NEVER infers (inference
    * costs a full extra pass and drifts with the data; a production
    * schema is a contract).
    */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** Read a JSONL directory/file with corrupt-line quarantine.
    *
    * Caveat (Spark contract): a query that references ONLY the
    * corrupt column against the raw files is rejected by Spark
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) because the parser would have
    * nothing to parse INTO — materialize (cache/write) the parsed
    * frame first when computing corrupt-only rollups.
    */
  def ingestJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(DocSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** The deterministic demo corpus: one JSON line per document row,
    * built by string concat (NOT to_json) so the DuckDB oracle can
    * parse the byte-identical lines independently; every 97th doc_id
    * is truncated mid-object — the corrupt-line fixture. Shared by
    * the driver demo (which writes + re-reads it as real files) and
    * the OracleAux side-table, so the two can never drift.
    */
  def f10Lines(spark: SparkSession, dir: String): DataFrame = {
    val good = concat(
      lit("{\"doc_id\":"), col("doc_id"),
      lit(",\"lang\":\""), col("lang"),
      lit("\",\"source\":\""), col("source"),
      lit("\",\"n_chars\":"), col("n_chars"), lit("}"))
    Tables(spark, dir).documents
      .select(col("doc_id"), good.as("g"))
      // truncation strips the closing brace AND the n_chars value's
      // last digit — unambiguously malformed, still one line
      .select(when(col("doc_id") % 97 === 0,
        expr("substring(g, 1, length(g) - 2)"))
        .otherwise(col("g")).as("line"))
  }

  /** f10 driver demo: materialize the demo corpus as real .txt JSONL
    * files, ingest through the distributed JSON source, and emit the
    * parsed rows + quarantine accounting.
    */
  def f10JsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_f10_${dir.hashCode.toHexString}/lines"
    f10Lines(spark, dir).write.mode("overwrite").text(path)
    ingestJsonl(spark, path)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("_corrupt_record").isNotNull.as("is_corrupt"),
        col("_corrupt_record").as("corrupt_raw"))
      .orderBy(col("is_corrupt"), col("doc_id"), col("corrupt_raw"))
  }
}
