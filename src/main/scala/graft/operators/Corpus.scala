package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** c01: the composed training-corpus cleaning pipeline — what the
  * individual C-operators exist for. Order matters for cost:
  *
  *   1. quality gate (cheap per-row scoring, t02) — drop junk before
  *      anything pairwise;
  *   2. exact dedup (d01 semantics on the native fingerprint — one
  *      shuffle on a long, not on document text);
  *   3. near-dup removal (d02 MinHash+LSH) — each near-dup cluster
  *      keeps its minimum doc_id;
  *   4. language tag (t03) for downstream mixture control.
  *
  * At 100 TB each stage is one pass/shuffle and strictly shrinks the
  * data for the next. Output: the surviving documents with their
  * metadata.
  */
object Corpus {

  def c01CleanCorpus(spark: SparkSession, dir: String,
      minTokens: Long = 8, maxStopwordRatio: Double = 0.9,
      nearDupThreshold: Double = 0.7): DataFrame = {
    val t = Tables(spark, dir)

    // 1. quality gate
    val toks = split(col("text"), " ")
    val nToks = size(toks).cast("long")
    val nStop = graft.functions.F.markerCount(col("text"), "the,a")
    val gated = t.documents
      .withColumn("n_tokens", nToks)
      .withColumn("stop_ratio", nStop.cast("double") / nToks)
      .filter(col("n_tokens") >= minTokens &&
        col("stop_ratio") <= maxStopwordRatio)

    // 2. exact dedup on the native 64-bit fingerprint
    val fp = gated.withColumn("fp64", graft.functions.F.fingerprint64(col("text")))
    val exactWinners = fp
      .groupBy("fp64").agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id").as("doc_id"))
    val exactKept = fp.join(exactWinners, Seq("doc_id"), "left_semi")

    // 3. near-dup removal: LSH pairs → losers = the larger id of each
    // verified pair (transitively, min-id of a chain survives unless it
    // loses to a smaller id elsewhere)
    val losers = Dedup.d02DedupMinhash(spark, dir, threshold = nearDupThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val deduped = exactKept.join(losers, Seq("doc_id"), "left_anti")

    // 4. language tag
    TextOps.langIdOver(deduped)
      .select("doc_id", "lang", "source", "n_tokens", "pred_lang")
      .orderBy("doc_id")
  }
}
