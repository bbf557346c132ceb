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
  *   3. near-dup removal (d02 MinHash+LSH) over the SURVIVORS of 1–2 —
  *      each near-dup cluster keeps its minimum doc_id, and a document
  *      can only lose to a winner that itself survived;
  *   4. language tag (t03) for downstream mixture control.
  *
  * At 100 TB each stage is one pass/shuffle and strictly shrinks the
  * data for the next. Output: the surviving documents with their
  * metadata.
  */
object Corpus {

  /** Stage 1: cheap per-row quality gate (t02 semantics). */
  def qualityGate(docs: DataFrame,
      minTokens: Long = 8, maxStopwordRatio: Double = 0.9): DataFrame = {
    val toks = split(col("text"), " ")
    val nToks = size(toks).cast("long")
    val nStop = graft.functions.F.markerCount(col("text"), "the,a")
    docs
      .withColumn("n_tokens", nToks)
      .withColumn("stop_ratio", nStop.cast("double") / nToks)
      .filter(col("n_tokens") >= minTokens &&
        col("stop_ratio") <= maxStopwordRatio)
  }

  /** Stage 2: exact dedup on the native 64-bit fingerprint — one
    * shuffle on a long key, min doc_id wins.
    */
  def exactDedupKept(gated: DataFrame): DataFrame = {
    val fp = gated.withColumn("fp64",
      graft.functions.F.fingerprint64(col("text")))
    val winners = fp
      .groupBy("fp64").agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id").as("doc_id"))
    fp.join(winners, Seq("doc_id"), "left_semi")
  }

  def c01CleanCorpus(spark: SparkSession, dir: String,
      minTokens: Long = 8, maxStopwordRatio: Double = 0.9,
      nearDupThreshold: Double = 0.7): DataFrame = {
    val t = Tables(spark, dir)

    // stages 1+2; localCheckpoint (lazy) because the survivors feed
    // BOTH the near-dup pair generation and the final anti-join —
    // materialize the gated+deduped set once instead of re-running the
    // gate per consumer (blocks are freed when the RDD is GC'd, unlike
    // a CacheManager entry)
    val exactKept =
      exactDedupKept(qualityGate(t.documents, minTokens, maxStopwordRatio))
        .localCheckpoint(false)

    // 3. near-dup removal on the survivors (not the raw corpus): junk
    // docs the gate removed can't decide near-dup outcomes, and the
    // pairwise stage sees strictly shrunk data
    val losers = Dedup.d02PairsOver(exactKept, threshold = nearDupThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val deduped = exactKept.join(losers, Seq("doc_id"), "left_anti")

    // 4. language tag
    TextOps.langIdOver(deduped)
      .select("doc_id", "lang", "source", "n_tokens", "pred_lang")
      .orderBy("doc_id")
  }
}
