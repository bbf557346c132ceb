package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** c01 oracle side-table: MinHash signatures of the gate+exact-dedup
    * survivors (the e06 kernel, the pipeline's one non-SQL artifact).
    * The oracle re-derives the SURVIVOR SET itself in SQL (token gate,
    * stopword ratio, min-doc_id-per-identical-text — fingerprint
    * equality is text equality modulo the collision class every
    * hashed-shingle oracle already accepts), replays d02's banding
    * and string-shingle Jaccard over it, and finishes with the t03
    * marker argmax — the full four-stage composition cross-checked.
    */
  def c01AuxSigs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(
      exactDedupKept(qualityGate(Tables(spark, dir).documents)),
      shingleK = 5, numPerm = 64)

  def c01CleanCorpus(spark: SparkSession, dir: String,
      minTokens: Long = 8, maxStopwordRatio: Double = 0.9,
      nearDupThreshold: Double = 0.7,
      removeDupSpans: Boolean = false): DataFrame =
    c01Over(Tables(spark, dir).documents, minTokens, maxStopwordRatio,
      nearDupThreshold, removeDupSpans)

  /** c01 over any (doc_id, text, lang, source, …) DataFrame (spec +
    * composition reuse).
    */
  def c01Over(docs: DataFrame,
      minTokens: Long = 8, maxStopwordRatio: Double = 0.9,
      nearDupThreshold: Double = 0.7,
      removeDupSpans: Boolean = false): DataFrame = {
    // stages 1+2; localCheckpoint (lazy) because the survivors feed
    // BOTH the near-dup pair generation and the final anti-join —
    // materialize the gated+deduped set once instead of re-running the
    // gate per consumer (blocks are freed when the RDD is GC'd, unlike
    // a CacheManager entry)
    val exactKept =
      exactDedupKept(qualityGate(docs, minTokens, maxStopwordRatio))
        .localCheckpoint(false)

    // 3. near-dup removal on the survivors (not the raw corpus): junk
    // docs the gate removed can't decide near-dup outcomes, and the
    // pairwise stage sees strictly shrunk data
    val losers = Dedup.d02PairsOver(exactKept, threshold = nearDupThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val deduped = exactKept.join(losers, Seq("doc_id"), "left_anti")

    // 3b (opt-in): substring-level span removal over the survivors —
    // DOCUMENT-granular stages can't see a shared passage inside two
    // otherwise-different documents; d08 finds those spans and d09's
    // apply excises them, with token counts refreshed to the cleaned
    // text. Off by default: span removal rewrites text, which not
    // every corpus build wants.
    val cleaned =
      if (removeDupSpans)
        Dedup.applySpans(deduped, Dedup.d08SpansOver(deduped))
          .withColumn("text", col("clean_text"))
          // split('', ' ') yields [''] — a FULLY-excised doc would
          // carry a phantom token into every later token budget, the
          // exact edge applySpans's own n_removed avoids (review r13
          // corpus #2)
          .withColumn("n_tokens",
            when(col("text") === "", 0L)
              .otherwise(size(split(col("text"), " ")).cast("long")))
          .drop("clean_text", "n_removed")
      else deduped

    // 4. language tag
    TextOps.langIdOver(cleaned)
      .select("doc_id", "lang", "source", "n_tokens", "pred_lang")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- c02

  /** c02: training-mixture planner — compute each source's document
    * and token mass, then the per-source sampling rate that hits an
    * equal share of `targetTokens`. One groupBy shuffle over (source),
    * one tiny unpartitioned window over the handful of source rows (a
    * single task over |sources| rows — nothing at data scale). The
    * rates feed deterministic hash-sampling (x06) so a 100 TB mixture
    * rebalance is plan + one filtered pass, never a collect.
    */
  def c02MixturePlan(spark: SparkSession, dir: String,
      targetTokens: Long = 100000L): DataFrame =
    mixturePlanOver(Tables(spark, dir).documents,
      size(split(col("text"), " ")).cast("long"), targetTokens)

  /** c06: c02's planner budgeted in MODEL-TOKENIZER tokens — per-doc
    * counts come from the t08 greedy longest-match kernel instead of
    * whitespace splitting. Same single groupBy shuffle; only the
    * per-row token counter changes, which is the point: sources with
    * high subword fertility (more pieces per word) weigh heavier, so
    * rates hit the actual token budget a trainer consumes.
    */
  def c06MixtureSubword(spark: SparkSession, dir: String,
      targetTokens: Long = 100000L): DataFrame =
    mixturePlanOver(Tables(spark, dir).documents,
      element_at(TextOps.subwordStatsCol(col("text")), 1), targetTokens)

  /** The per-source doc/token mass rollup every mixture planner
    * starts from — ONE definition (c02/c08/c10 each carried a
    * verbatim copy; a changed token-counting or null-source
    * convention must reach all three through here).
    */
  private def perSourceMass(docs: DataFrame,
      tokenCount: org.apache.spark.sql.Column): DataFrame = docs
    .select(col("source"), tokenCount.as("n_tokens"))
    .groupBy("source")
    .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tot_tokens"))

  /** c08: TEMPERATURE-scaled mixture planner — c02 gives every source
    * an equal token share; real multilingual/multi-domain training
    * uses exponent smoothing p_s ∝ mass_s^α (the public XLM-R /
    * multilingual-BERT scheme): α=1 is proportional (head sources
    * dominate), α=0 is equal-share, between them the head is damped
    * and the tail boosted. α is FIXED at 0.5 here because sqrt is the
    * one exponent that is a correctly-rounded IEEE op in every engine
    * — weight arithmetic stays bit-replayable (arbitrary-α pow is not,
    * so it would demote the oracle to a rows-only check). The
    * smoothed-weight sum runs over 6-decimal scaled BIGINTs (exact,
    * order-independent — no float-fold caveat); weights, budgets, and
    * rates are each rounded ONCE. Same single groupBy shuffle as c02;
    * the window runs over |sources| rows.
    */
  def c08TemperatureMixture(spark: SparkSession, dir: String,
      targetTokens: Long = 100000L): DataFrame = {
    val perSource = perSourceMass(Tables(spark, dir).documents,
      size(split(col("text"), " ")).cast("long"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    perSource
      // smoothed mass as a scaled integer: floor-form rounding (e15's
      // discipline) so the summed quantity is exact in both engines
      .withColumn("sqrt_i",
        floor(sqrt(col("tot_tokens").cast("double")) * 1000000.0d + 0.5d))
      .withColumn("weight",
        round(col("sqrt_i").cast("double") /
          sum(col("sqrt_i")).over(w).cast("double"), 6))
      .withColumn("budget_tokens",
        floor(col("weight") * lit(targetTokens.toDouble) + 0.5d))
      .withColumn("sample_rate",
        round(least(lit(1.0),
          col("budget_tokens").cast("double") /
            col("tot_tokens").cast("double")), 6))
      .select("source", "n_docs", "tot_tokens", "weight", "budget_tokens",
        "sample_rate")
      .orderBy("source")
  }

  /** Shared planner body: per-source doc/token mass → equal-share
    * sampling rates, parameterized by the per-row token counter.
    */
  def mixturePlanOver(docs: DataFrame, tokenCount: org.apache.spark.sql.Column,
      targetTokens: Long): DataFrame = {
    val perSource = perSourceMass(docs, tokenCount)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    perSource
      .withColumn("sample_rate",
        round(least(lit(1.0),
          (lit(targetTokens.toDouble) / count(lit(1)).over(w)) /
            col("tot_tokens")), 6))
      .select("source", "n_docs", "tot_tokens", "sample_rate")
      .orderBy("source")
  }

  // ---------------------------------------------------------------- c05

  /** c05: materialize the training mixture — the composition c02's
    * plan exists for. Per-source sampling rates (c02) feed the
    * deterministic stratified hash-sample (x06), and the survivors get
    * the seeded global shuffle (x16) that fixes the example order a
    * trainer will consume. Everything is layout-independent and
    * reproducible: same corpus + target + seed → byte-identical
    * mixture and order on any cluster, today or in a year — which is
    * what makes a 100 TB dataset build auditable. The rates collect is
    * bounded by |sources| (a handful of rows, same class as IVF's
    * centroid load); the sample is a shuffle-free filter; the shuffle
    * is one range-partitioned sort.
    */
  // default target sized BELOW the sf0.01 corpus mass (~27k tokens)
  // so the demo's rates land under 1.0 and the sample is a genuine
  // subset, not the capped identity
  // `subwordTokens = true` budgets and reports in t08 model-tokenizer
  // tokens (c06 plan) instead of whitespace tokens (c02 plan)
  // `materializeIds = true` rides the t09/e11b kernel to emit each
  // sampled document's piece-id sequence — the mixture leaves as
  // training-ready token ids, not just an id list to re-join
  def c05MixtureBuild(spark: SparkSession, dir: String,
      targetTokens: Long = 12000L, seed: Long = 42L,
      subwordTokens: Boolean = false,
      materializeIds: Boolean = false): DataFrame = {
    val t = Tables(spark, dir)
    val plan =
      if (subwordTokens) c06MixtureSubword(spark, dir, targetTokens)
      else c02MixturePlan(spark, dir, targetTokens)
    val rates = plan
      .select("source", "sample_rate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val tokenCount =
      if (subwordTokens) element_at(TextOps.subwordStatsCol(col("text")), 1)
      else size(split(col("text"), " ")).cast("long")
    val sampled = Sampling.stratifiedSample(
      t.documents, col("doc_id"), col("source"), rates, defaultRate = 0.0)
    val base = Seq(col("doc_id"), col("source"), tokenCount.as("n_tokens"))
    val cols =
      if (materializeIds) base :+ TextOps.subwordIdsCol(col("text")).as("piece_ids")
      else base
    Sampling.shuffleDeterministic(sampled.select(cols: _*), col("doc_id"), seed)
  }

  /** c05 oracle side-table: the x06 sampling hash per document — the
    * one non-SQL-replayable input (xxhash64). Rates, the stratified
    * gate, and the token counts all replay in SQL; the seeded output
    * shuffle is order-only, which the sorted-row compare absorbs.
    */
  def c05AuxHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(col("doc_id"),
      pmod(xxhash64(col("doc_id")), lit(1L << 20)).as("h"))

  // ---------------------------------------------------------------- c10

  /** c10: mixture EPOCHS — c02 caps sampling rates at 1.0, but a real
    * training mixture upsamples scarce sources past one pass (the
    * public data-budget practice: small high-quality sources run
    * multiple epochs). For each source under an equal token share:
    * `n_epochs` full passes (exact integer division of budget by
    * mass) plus a fractional `residual_rate` pass covering the
    * remainder — n_epochs + residual_rate passes consume exactly the
    * source's budget. Same single groupBy as c02; every quantity is
    * exact-integer until the one once-rounded residual division.
    */
  def c10MixtureEpochs(spark: SparkSession, dir: String,
      targetTokens: Long = 500000L): DataFrame = {
    val perSource = perSourceMass(Tables(spark, dir).documents,
      size(split(col("text"), " ")).cast("long"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    perSource
      // the |sources| window is the same bounded single-task class as
      // c02's; div keeps every step in exact longs
      .withColumn("n_src", count(lit(1)).over(w))
      .withColumn("budget_tokens", expr(s"$targetTokens div n_src"))
      .withColumn("n_epochs", expr("budget_tokens div tot_tokens"))
      .withColumn("residual_rate",
        round((col("budget_tokens") - col("n_epochs") * col("tot_tokens"))
          .cast("double") / col("tot_tokens"), 6))
      .select("source", "n_docs", "tot_tokens", "budget_tokens", "n_epochs",
        "residual_rate")
      .orderBy("source")
  }

  // ---------------------------------------------------------------- c11

  /** c11: corpus report — the per-(source, lang) governance rollup a
    * training-data card is built from: document and token mass, doc
    * length distribution (min/max/avg), and the short-doc fraction the
    * c01 gate would drop. One groupBy shuffle; counts and sums stay
    * exact longs, the two ratios are each divided and rounded ONCE.
    */
  def c11CorpusReport(spark: SparkSession, dir: String,
      shortDocTokens: Long = 8L): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    docs.groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tot_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(when(col("n_tokens") < shortDocTokens, 1L).otherwise(0L))
          .as("n_short"))
      .withColumn("avg_tokens",
        round(col("tot_tokens").cast("double") / col("n_docs"), 4))
      .withColumn("short_frac",
        round(col("n_short").cast("double") / col("n_docs"), 4))
      .select("source", "lang", "n_docs", "tot_tokens", "min_tokens",
        "max_tokens", "avg_tokens", "n_short", "short_frac")
      .orderBy("source", "lang")
  }

  // ---------------------------------------------------------------- c09

  /** c09: sequence PACKING offsets — the step between a built mixture
    * (c05) and a trainer's data loader. GPT-style pretraining
    * concatenates the corpus in a fixed document order and chops the
    * token stream into `seqLen`-token training sequences; a document's
    * placement is fully determined by its global token offset. This
    * computes, per document: the exclusive running token offset
    * (`tok_start`) and the first/last training sequence it lands in —
    * documents straddle sequence boundaries by design (that IS the
    * public packing scheme; no padding, no truncation).
    *
    * The running sum is a DISTRIBUTED prefix-sum, not a global window:
    * a `Window.orderBy(doc_id)` with no partition key collapses the
    * whole corpus into ONE task — the canonical window scale-killer.
    * Instead: range-partition by the order key, per-partition running
    * sums (window keyed by the partition id — parallel), then a
    * per-partition token total (one tiny row per partition) is
    * prefix-summed and broadcast back. The only single-task window
    * runs over ≤ `spark.sql.shuffle.partitions` rows — the same
    * bounded class as c02's |sources| window. All arithmetic is exact
    * integer (`div`, not float division), so the oracle replays it
    * bit-for-bit at any scale.
    */
  def c09PackOffsets(spark: SparkSession, dir: String,
      seqLen: Long = 512L): DataFrame =
    packOffsetsOver(
      Tables(spark, dir).documents.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      seqLen)
      .orderBy("doc_id")

  /** Distributed prefix-sum packing over any (doc_id, n_tokens) frame.
    * `doc_id` must be unique — it is the total concatenation order.
    */
  def packOffsetsOver(docs: DataFrame, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    val spark = docs.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // range partitions are ordered by doc_id, so partition id order ==
    // global key order; localCheckpoint materializes the slim
    // (doc_id, n_tokens, _pid) rows once — both consumers (the local
    // window and the per-partition totals) read the same layout, and
    // the nondeterministic-flagged partition id is evaluated exactly
    // once per row
    val ranged = docs
      .repartitionByRange(nParts, col("doc_id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy("doc_id")
    val local = ranged
      .withColumn("_end_local", sum(col("n_tokens")).over(wLocal))
    // per-partition totals: ≤ nParts rows — the prefix window over
    // them is single-task by construction and bounded by construction
    val wPrefix = org.apache.spark.sql.expressions.Window
      .orderBy("_pid").rowsBetween(Long.MinValue, -1)
    val prefixed = ranged
      .groupBy("_pid").agg(sum(col("n_tokens")).as("_ptot"))
      .withColumn("_poff", coalesce(sum(col("_ptot")).over(wPrefix), lit(0L)))
      .select("_pid", "_poff")
    // ZERO-token rows (empty/untokenizable text — the kernel is
    // public "over any frame") occupy NO sequence: naive bounds gave
    // them n_seqs = 1 mid-sequence and an INVERTED seq_last <
    // seq_first at an exact boundary, which a sequence(first, last)
    // caller expands DESCENDING into phantom segments (review r13
    // corpus #3). They pin seq_first = seq_last = the sequence their
    // offset points at, with n_seqs = 0.
    local.join(broadcast(prefixed), Seq("_pid"))
      .withColumn("tok_start", col("_poff") + col("_end_local") - col("n_tokens"))
      .withColumn("seq_first", expr(s"tok_start div $seqLen"))
      .withColumn("_last_tok", col("tok_start") + col("n_tokens") - 1)
      .withColumn("seq_last",
        when(col("n_tokens") === 0L, col("seq_first"))
          .otherwise(expr(s"_last_tok div $seqLen")))
      .withColumn("n_seqs",
        when(col("n_tokens") === 0L, 0L)
          .otherwise(col("seq_last") - col("seq_first") + 1))
      .select("doc_id", "n_tokens", "tok_start", "seq_first", "seq_last",
        "n_seqs")
  }

  // ---------------------------------------------------------------- c13

  /** c13: LEAK-PROOF train/val/test split — a hash split (x06) is
    * uniform but leakage-blind: a held-out document sharing a passage
    * with a training document inflates eval scores exactly like c03's
    * train/bench contamination. This composes the split with the
    * contamination sweep and QUARANTINES the leaks: any val/test
    * document sharing ≥ `minShared` distinct word-`shingleK`-shingles
    * with ANY train document is reassigned to train (the public
    * held-out-dedup practice: eval must shrink, training may grow —
    * dropping would also be sound, reassignment keeps the corpus).
    * The quarantine iterates to a FIXPOINT: reassignment grows the
    * train shingle set, which can expose held-out docs whose only
    * overlap is with a just-moved doc — sweeping until no doc moves is
    * what makes the final eval splits share nothing with ANY train
    * document, original or reassigned. Cost: one shingle-hash scan,
    * then per round one semi-join of surviving held-out shingles
    * against the cumulative train shingles (8-byte keys) — rounds are
    * bounded by the longest leak chain, 1-2 in practice. Deterministic:
    * same corpus → same split → same quarantine, on any cluster.
    */
  /** The c13 demo split fractions, pinned once — the driver query's
    * defaults and the oracle side-table assign through these same
    * constants (the C16Iters/C16Lr discipline), so a retuned split
    * cannot silently diverge from what the oracle replays.
    */
  private val C13TrainFrac = 0.8
  private val C13ValFrac = 0.1

  def c13LeakproofSplit(spark: SparkSession, dir: String,
      trainFrac: Double = C13TrainFrac, valFrac: Double = C13ValFrac,
      shingleK: Int = 8, minShared: Long = 3L): DataFrame =
    leakproofSplitOver(Tables(spark, dir).documents, trainFrac, valFrac,
      shingleK, minShared)

  /** The c13 pre-sweep hash assignment (x06's split), shared by the
    * sweep and its oracle side-table: the xxhash64 bucketing has no
    * DuckDB counterpart, so the oracle reads the assignment back and
    * independently replays everything DOWNSTREAM — the shingle
    * inventories and the whole quarantine fixpoint.
    */
  private def c13Assign(docs: DataFrame, trainFrac: Double,
      valFrac: Double): DataFrame = {
    val buckets = 1000000L
    val h = pmod(xxhash64(col("doc_id")), lit(buckets))
    val t = (trainFrac * buckets).toLong
    val v = ((trainFrac + valFrac) * buckets).toLong
    docs.select(col("doc_id"), col("text"),
      when(h < t, "train").when(h < v, "val").otherwise("test")
        .as("split"))
  }

  /** (doc_id, split) side-table for the c13 oracle replay. */
  def c13AuxAssigned(spark: SparkSession, dir: String): DataFrame =
    c13Assign(Tables(spark, dir).documents, C13TrainFrac, C13ValFrac)
      .select("doc_id", "split")

  def leakproofSplitOver(docs: DataFrame, trainFrac: Double,
      valFrac: Double, shingleK: Int, minShared: Long): DataFrame = {
    val assigned = c13Assign(docs, trainFrac, valFrac)
    // one shingle scan feeds every round of the cross-split sweep
    val sh = Dedup.docShingleHashes(assigned, shingleK)
      .join(assigned.select("doc_id", "split"), Seq("doc_id"))
      .localCheckpoint(false)
    // fixpoint rounds: each recounts SURVIVING held-out docs against
    // the CUMULATIVE train shingle set (the threshold is on total
    // shared shingles — counting only against the newly-moved docs'
    // shingles would undercount a doc that shares some with original
    // train and some with a reassigned doc). localCheckpoint per round
    // keeps lineage flat; `moved` is the driver's only scalar.
    var trainShingles = sh.filter(col("split") === "train")
      .select(explode(col("sh")).as("g")).distinct()
      .localCheckpoint(false)
    var heldout = sh.filter(col("split") =!= "train")
      .select(col("doc_id"), col("sh"))
      .localCheckpoint(false)
    var leakyAll: Option[DataFrame] = None
    var moved = 1L
    while (moved > 0) {
      val leakyRound = heldout
        .select(col("doc_id"), explode(col("sh")).as("g"))
        .join(trainShingles, Seq("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .select("doc_id")
        .localCheckpoint(false)
      moved = leakyRound.count()
      if (moved > 0) {
        leakyAll = Some(leakyAll.fold(leakyRound)(_.union(leakyRound)))
        trainShingles = trainShingles
          .union(heldout.join(leakyRound, Seq("doc_id"), "left_semi")
            .select(explode(col("sh")).as("g")))
          .distinct()
          .localCheckpoint(false)
        heldout = heldout.join(leakyRound, Seq("doc_id"), "left_anti")
          .localCheckpoint(false)
      }
    }
    val leaky = leakyAll.getOrElse(assigned.select("doc_id").limit(0))
      .select(col("doc_id"), lit(true).as("leaked"))
    assigned.select("doc_id", "split")
      .join(leaky, Seq("doc_id"), "left")
      .select(col("doc_id"), col("split"),
        when(col("leaked"), "train").otherwise(col("split"))
          .as("final_split"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- c12

  /** c12: MATERIALIZE the packed training sequences — the pipeline's
    * terminal artifact, where t09's piece ids and c09's packing
    * offsets become actual fixed-length rows a trainer reads. Each
    * document's pieces explode with their GLOBAL token position
    * (c09's distributed prefix-sum supplies the per-doc offset), land
    * in sequence `gpos div seqLen`, and each sequence collects its
    * tokens in position order (q47's sorted-struct collect — the
    * per-group list is bounded by seqLen). The token-granular explode
    * is the unavoidable cost of materialization; it is one projection
    * and ONE shuffle on seq_id. The offsets side re-runs the subword
    * kernel in stats-only form (no array construction) rather than
    * checkpointing the exploded arrays — kernels are cheap, token
    * arrays are not. Ids ride as a CSV string (the t09 oracle's wire
    * form) so the DuckDB replay — greedy tokenizer CTE → running sum →
    * positional unnest → ordered string_agg — is value-exact.
    */
  def c12PackSequences(spark: SparkSession, dir: String,
      seqLen: Long = 128L): DataFrame = {
    val docs = Tables(spark, dir).documents
    val offsets = packOffsetsOver(
      docs.select(col("doc_id"),
        element_at(TextOps.subwordStatsCol(col("text")), 1).as("n_tokens")),
      seqLen)
      .select("doc_id", "tok_start")
    docs
      .select(col("doc_id"), TextOps.subwordIdsCol(col("text")).as("pieces"))
      .join(offsets, Seq("doc_id"))
      .select(col("tok_start"), posexplode(col("pieces")))
      .withColumn("gpos", col("tok_start") + col("pos"))
      .withColumn("seq_id", expr(s"gpos div $seqLen"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("gpos"), col("col")))),
            s => s.getField("col").cast("string"))).as("ids_csv"))
      .orderBy("seq_id")
  }

  // ---------------------------------------------------------------- c04

  /** Luhn check over a 16-digit candidate string, as a pure column
    * expression (exact integer arithmetic, no UDF): double every
    * odd 1-based position (the even-length form of the public mod-10
    * algorithm), subtract 9 when the double exceeds 9, sum, test
    * mod 10. Replayed digit-for-digit by the DuckDB oracle.
    */
  private def luhnValid16(c: Column): Column =
    (1 to 16).map { i =>
      val d = substring(c, i, 1).cast("int")
      if (i % 2 == 1) { val dd = d * lit(2); when(dd > 9, dd - 9).otherwise(dd) }
      else d
    }.reduce(_ + _) % 10 === 0

  /** c04: PII redaction — the pre-training privacy pass, six classes:
    * email, SSN, international phone (`+CC-…`), US phone, IPv4, and
    * 16-digit credit-card numbers gated by the Luhn mod-10 check (a
    * digit run that fails Luhn is NOT a card number and must survive —
    * regex alone over-redacts). The synthetic corpus carries no PII,
    * so the demo deterministically plants some (every 7th doc:
    * email+SSN; every 11th: phone + a Luhn-VALID card; every 13th:
    * IPv4 + a Luhn-INVALID near-card that must pass through); the
    * oracle replays the same construction. The scrub engine itself is
    * [[redactPiiOver]] — the reusable form the st18 streaming stage
    * and st15's opt-in scrub compose.
    */
  def c04RedactPii(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id"),
          lit("@example.com ssn 123-45-6789"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        lit(" call 415-555-0137 card 4539578763621486")).otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        lit(" ip 10.20.30.40 card 4539578763621487")).otherwise(lit("")),
      when(col("doc_id") % 17 === 0,
        lit(" intl +44-020-7946-0958")).otherwise(lit("")))
    redactPiiOver(
      Tables(spark, dir).documents.select(col("doc_id"), planted.as("text")))
      .orderBy("doc_id")
  }

  /** The c04 scrub engine over any (doc_id, text, …) frame: per-class
    * PII counts (each class counted on the text with all
    * earlier-priority classes already redacted, so counts match the
    * placeholders in clean_text) plus the redacted text with
    * `<EMAIL>`/`<SSN>`/`<PHONE>`/`<IP>`/`<CC>` placeholders. Pure
    * per-row projection — shuffle-free at any scale, no UDFs; patterns
    * restricted to constructs with identical semantics in Java regex
    * and RE2 (no lookaround, no backreferences), so DuckDB replays the
    * IDENTICAL pattern text and the oracle certifies the byte-exact
    * redacted string. The card filter/redact pair are the only HOFs:
    * they run over the per-row candidate list (almost always 0–2
    * elements), not over tokens, so the interpreted-HOF cost is
    * bounded per document. Redaction order (email → SSN → intl phone →
    * US phone → IP → Luhn cards) is fixed for determinism; the intl
    * pattern runs before the US one so a `+CC-` prefix isn't orphaned
    * by a partial inner match.
    */
  def redactPiiOver(docs: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ssn = "\\d{3}-\\d{2}-\\d{4}"
    val intlPhone = "\\+\\d{1,3}-\\d{3}-\\d{3,4}-\\d{4}"
    val phone = "\\d{3}-\\d{3}-\\d{4}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    // \b-delimited: a 16-digit window INSIDE a longer digit run (a
    // 17-digit reference number) is neither a candidate nor a
    // replacement site — un-anchored \d{16} extracted the run's
    // 16-prefix, and the literal replace then ALSO rewrote a
    // Luhn-valid card's occurrence inside longer runs it was never
    // extracted from, so placeholders outnumbered n_ccs (review r13
    // corpus #1). \b is Java ↔ RE2 portable and non-consuming, so
    // adjacent standalone cards each match.
    val cc16 = "\\b\\d{16}\\b"
    // Each class is COUNTED on the text with every earlier-priority
    // class already redacted, so counts always equal the placeholders
    // that actually land in clean_text: a phone/SSN-shaped run inside
    // an email local part ('415-555-0137@ex.org') is redacted as
    // <EMAIL> and must not tally as a phone; likewise the US phone
    // shape is a proper substring of the intl one. The redacted text
    // itself is unchanged — the progressive intermediates compose to
    // the same fixed-order chain as before. Placeholders contain no
    // digits, so a redaction can neither create a later-class match
    // nor join two digit runs into one.
    val afterEmail = regexp_replace(col("t"), email, "<EMAIL>")
    val afterSsn = regexp_replace(col("a_email"), ssn, "<SSN>")
    val afterIntl = regexp_replace(col("a_ssn"), intlPhone, "<PHONE>")
    val afterPhone = regexp_replace(col("a_intl"), phone, "<PHONE>")
    val afterIp = regexp_replace(col("a_phone"), ipv4, "<IP>")
    val ccs = filter(regexp_extract_all(col("scrubbed"), lit(cc16), lit(0)),
      c => luhnValid16(c))
    docs
      .select(col("doc_id"), col("text").as("t"))
      .select(col("doc_id"), col("t"), afterEmail.as("a_email"))
      .select(col("*"), afterSsn.as("a_ssn"))
      .select(col("*"), afterIntl.as("a_intl"))
      .select(col("*"), afterPhone.as("a_phone"))
      .select(col("*"), afterIp.as("scrubbed"))
      .select(col("*"), ccs.as("ccs"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("a_email"), lit(ssn), lit(0)))
          .cast("long").as("n_ssns"),
        (size(regexp_extract_all(col("a_ssn"), lit(intlPhone), lit(0))) +
          size(regexp_extract_all(col("a_intl"), lit(phone), lit(0))))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("a_phone"), lit(ipv4), lit(0)))
          .cast("long").as("n_ips"),
        size(col("ccs")).cast("long").as("n_ccs"),
        aggregate(col("ccs"), col("scrubbed"),
          (acc, c) => regexp_replace(acc,
            concat(lit("\\b"), c, lit("\\b")), lit("<CC>")))
          .as("clean_text"))
  }

  // ---------------------------------------------------------------- c07

  /** c07: substring-level DECONTAMINATION — c03 flags documents that
    * overlap the eval set; this REMOVES the overlapping passages and
    * keeps the rest of the document. Span finding is
    * [[Dedup.spansAgainst]] (train positional shingles ⋈ broadcast
    * eval shingle set → maximal matched spans); the apply step is
    * d09's [[Dedup.applySpans]] (e14 kernel). Per-document outcome:
    * clean_text with every ≥`minSpanTokens`-token eval passage
    * excised and n_removed tokens dropped — a training corpus that
    * can quote an eval benchmark loses the quotes, not the documents.
    */
  def decontaminateOver(train: DataFrame, evalDocs: DataFrame,
      shingleK: Int = 8, minSpanTokens: Int = 15): DataFrame =
    Dedup.applySpans(train,
      Dedup.spansAgainst(train, evalDocs, shingleK, minSpanTokens))

  /** c07 driver query: the planted-contamination demo. Token tagging
    * (d02's construction) zeroes every natural train↔eval shingle
    * match, then every 7th document gets the UNTAGGED shared passage
    * ([[Dedup.SharedPassage]]) appended — the planted contamination.
    * The eval corpus is one synthetic document: the passage itself.
    * Expected output is CLOSED-FORM: every 7th doc's clean_text is
    * exactly its tagged base text (20 tokens removed), every other doc
    * passes through untouched — which the oracle asserts independently
    * of the span pipeline (an end-to-end check of spansAgainst find +
    * e14 apply together).
    */
  def c07Decontaminate(spark: SparkSession, dir: String,
      shingleK: Int = 8, minSpanTokens: Int = 15): DataFrame = {
    val t = Tables(spark, dir)
    val passage = Dedup.SharedPassage.mkString(" ")
    val tagged = t.documents.select(col("doc_id"),
      Dedup.tagTokens(col("text"), col("doc_id")).as("text"))
    val train = tagged.select(col("doc_id"),
      when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + passage)))
        .otherwise(col("text")).as("text"))
    val evalDocs = spark.range(1).select(lit(passage).as("text"))
    decontaminateOver(train, evalDocs, shingleK, minSpanTokens)
      .select("doc_id", "clean_text", "n_removed")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- c03

  /** c03: benchmark-contamination scan — flag training documents that
    * share at least `minShared` distinct word-k-shingles with an
    * eval/benchmark set (here the deterministic stand-in: doc_id
    * divisible by 10; a real run substitutes its benchmark table).
    * The benchmark shingle set is small by nature (eval sets are), so
    * the join broadcasts it; per-doc distinct counting is the only
    * shuffle. This is the standard train/test leakage gate every
    * training-data pipeline runs before a model ever sees the corpus.
    */
  def c03Contamination(spark: SparkSession, dir: String,
      shingleK: Int = 5, minShared: Long = 3L): DataFrame = {
    val t = Tables(spark, dir)
    // hashed shingles: the broadcast set and the per-doc agg carry
    // 8-byte longs, not ~50-byte shingle strings. localCheckpoint:
    // the kernel scan feeds BOTH the bench and train branches —
    // materialize once instead of re-shingling the corpus per branch
    val sh = Dedup.docShingleHashes(t.documents, shingleK)
      .localCheckpoint(false)
    val benchShingles = sh.filter(col("doc_id") % 10 === 0)
      .select(explode(col("sh")).as("g")).distinct()
    val trainShingles = sh.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    trainShingles
      .join(broadcast(benchShingles), Seq("g"))
      .groupBy("doc_id")
      // plain count: (doc_id, g) is already unique — `sh` arrays are
      // distinct per doc and the broadcast side was dedup'd
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_id")
  }

  /** Persist the benchmark's distinct shingle-hash set — c03's
    * broadcast side, built ONCE (eval sets are small and static by
    * nature) so st17's streaming gate never re-shingles the benchmark
    * per batch. 8-byte hashed shingles, not strings (c03's own
    * discipline).
    */
  def c03BenchBuild(benchDocs: DataFrame, benchPath: String,
      shingleK: Int = 5): Unit =
    Dedup.docShingleHashes(benchDocs, shingleK)
      .select(explode(col("sh")).as("g")).distinct()
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(benchPath)

  /** c03 against a PERSISTED benchmark shingle set: flag every doc
    * sharing ≥ `minShared` distinct `shingleK`-shingles with the
    * benchmark — the inference half of the contamination gate (one
    * shingle pass over the docs, benchmark broadcast whole, one
    * doc-keyed rollup; plain count is exact because per-doc shingle
    * arrays are distinct and the stored set was dedup'd).
    */
  def c03ScreenIndexed(docs: DataFrame, benchPath: String,
      shingleK: Int = 5, minShared: Long = 3L): DataFrame = {
    val spark = docs.sparkSession
    val bench = spark.read.parquet(benchPath)
    Dedup.docShingleHashes(docs, shingleK)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(bench), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ---------------------------------------------------------------- c14

  /** c14: importance-weighted data selection (DSIR — Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * public): score every raw document by how much more likely its
    * hashed n-gram features are under a TARGET domain than under the
    * raw corpus — the importance weight that resamples a generic
    * crawl toward a quality exemplar set. Features are the e12
    * positional bigram hashes bucketed to 2¹⁶ (DSIR's hashed-ngram
    * trick: fixed feature space at any corpus size); both
    * distributions are add-1-smoothed bucket frequencies; weight =
    * Σ_b n_b(doc) · (ln p_target(b) − ln p_raw(b)).
    *
    * Determinism discipline: ln runs on identical doubles everywhere
    * (StrictMath — fdlibm, platform-exact), and the per-doc sum
    * accumulates in fixed-point DECIMAL on 9-dp-rounded terms, so the
    * result is bit-identical at any partitioning — float Σ would be
    * partition-order-dependent. Shape at scale: one bigram scan, two
    * bounded (≤ 2¹⁶-row) frequency tables broadcast to a bucket join,
    * one doc-keyed rollup. The target table is built from the
    * exemplar subset only — at 100 TB the exemplar is tiny by design
    * (DSIR targets Wikipedia-sized sets), the crawl side streams.
    */
  def c14ImportanceWeights(spark: SparkSession, dir: String,
      targetSource: String = ""): DataFrame = {
    val (raw, target) = c14DemoFrames(spark, dir, targetSource)
    importanceWeightsOver(raw, target).orderBy("doc_id")
  }

  /** The c14/c16 demo corpus split: raw = every document, target =
    * the alphabetically-first source (deterministic exemplar).
    */
  private def c14DemoFrames(spark: SparkSession, dir: String,
      targetSource: String = ""): (DataFrame, DataFrame) = {
    val docs = Tables(spark, dir).documents
    val tgt = if (targetSource.nonEmpty) targetSource
      else docs.select(min(col("source"))).collect().head.getString(0)
    (docs.select(col("doc_id"), col("text")),
      docs.filter(col("source") === tgt).select(col("doc_id"), col("text")))
  }

  /** c14/c16 oracle side-table: the hashed-bigram bucket counts of
    * every document — the e12 kernel output the two operators share.
    * Everything downstream (both smoothed distributions, the
    * log-ratio table, margins, rollups) replays in SQL.
    */
  def c14AuxFeats(spark: SparkSession, dir: String): DataFrame =
    c16Featurize(
      Tables(spark, dir).documents.select(col("doc_id"), col("text")),
      C16Buckets)

  /** c14 oracle ln-memo: the exact doubles importanceWeightsOver
    * passes to `log`, with their StrictMath results — DuckDB
    * recomputes both distributions itself and only LOOKS UP the one
    * scalar transcendental (its libm ln can differ from fdlibm in the
    * last ulp, which the 9-dp term rounding cannot always absorb).
    */
  def c14AuxLn(spark: SparkSession, dir: String): DataFrame = {
    val buckets = C16Buckets
    val (raw, target) = c14DemoFrames(spark, dir)
    val rawCounts = c16Featurize(raw, buckets)
    val tgtCounts = c16Featurize(target, buckets)
    val nRaw = rawCounts.agg(sum(col("n"))).collect().head.getLong(0)
    val nTgt = tgtCounts.agg(sum(col("n"))).collect().head.getLong(0)
    val xs = rawCounts.groupBy("b").agg(sum(col("n")).as("c_r"))
      .join(tgtCounts.groupBy("b").agg(sum(col("n")).as("c_t")),
        Seq("b"), "left")
      .select(
        ((coalesce(col("c_t"), lit(0L)) + lit(1L)).cast("double") /
          lit((nTgt + buckets).toDouble)).as("xt"),
        ((col("c_r") + lit(1L)).cast("double") /
          lit((nRaw + buckets).toDouble)).as("xr"))
    xs.select(col("xt").as("x")).union(xs.select(col("xr").as("x")))
      .distinct()
      .select(col("x"), log(col("x")).as("lx"))
  }

  /** c16 oracle side-table: the frozen trained model in
    * [[c16ModelBuild]]'s (b, w) + bias-at-−1 wire format. Training is
    * deterministic, so these weights equal the driver query's own;
    * the corpus-wide SCORING pass — margins, sigmoid, keep verdicts —
    * replays in SQL against c14_feats.
    */
  def c16AuxModel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, _, w, bias) = c16Fit(c16DemoLabeled(spark, dir),
      C16Iters, C16Lr, C16Buckets, C16TrainCap)
    (w.toSeq :+ (-1L, bias)).toDF("b", "w")
  }

  /** c16 oracle exp-memo: the exact doubles the scoring sigmoid
    * passes to `exp` — one per distinct −(margin+bias) — with Spark's
    * own exp results, so the oracle's sigmoid has no JVM-vs-libm
    * last-ulp surface (the ln-memo rationale, applied to the one
    * other transcendental in the suite). Reads the model back from
    * the c16_model side-table written just before it (OracleAux runs
    * producers in declaration order) instead of training a third
    * time; parquet round-trips the weight doubles exactly.
    */
  def c16AuxExp(spark: SparkSession, dir: String): DataFrame = {
    val model = spark.read.parquet(s"${graft.OracleAux.Root}/c16_model")
    val bias = model.filter(col("b") === -1L).collect().head.getDouble(1)
    val labeled = c16DemoLabeled(spark, dir)
    marginsOf(broadcast(model.filter(col("b") =!= -1L)),
        labeled.select("doc_id"), c16Featurize(labeled, C16Buckets))
      .select((-(col("margin") + lit(bias))).as("x")).distinct()
      .select(col("x"), exp(col("x")).as("ex"))
  }

  // ---------------------------------------------------------------- c15

  /** c15: curriculum phases — the data-ordering schedule (public
    * curriculum-learning / annealing practice: train on broad data
    * first, anneal on the highest-quality slice last). Every document
    * is ranked globally by the t02 quality score and cut into
    * `nPhases` equal-population phases; the emitted table is the
    * SCHEDULE — per phase: population, token budget, and the quality
    * span — what a training loop consumes to plan its epochs (phase 0
    * holds the top-ranked docs: the annealing slice a run saves for
    * last). The global rank is q53's
    * distributed prefix-sum (range-partition on the (quality desc,
    * doc_id) total order, parallel local row_numbers, per-partition
    * COUNTS through the one bounded single-task window) — never an
    * unpartitioned Window over the corpus. Exact-integer rank/phase
    * arithmetic; deterministic at any partitioning.
    */
  def c15CurriculumPhases(spark: SparkSession, dir: String,
      nPhases: Int = 4): DataFrame = {
    val docs = Tables(spark, dir).documents
    val quality = TextOps.qualityScoreOver(docs.select("doc_id", "text"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
        Seq("doc_id"))
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = quality
      .repartitionByRange(nParts, col("quality_score").desc, col("doc_id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val local = ranged
      .withColumn("_r_local", row_number().over(wLocal).cast("long"))
    val wPrefix = org.apache.spark.sql.expressions.Window
      .orderBy("_pid")
      .rowsBetween(Long.MinValue, -1)
    val wTotal = org.apache.spark.sql.expressions.Window
      .orderBy("_pid")
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val offsets = ranged.groupBy("_pid").agg(count(lit(1)).as("_pc"))
      .withColumn("_poff", coalesce(sum(col("_pc")).over(wPrefix), lit(0L)))
      .withColumn("_n", sum(col("_pc")).over(wTotal))
      .select("_pid", "_poff", "_n")
    local.join(offsets, Seq("_pid"))
      .withColumn("rnk", col("_poff") + col("_r_local"))
      .withColumn("phase", expr(s"((rnk - 1) * $nPhases) div _n"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("phase_tokens"),
        min(col("quality_score")).as("min_quality"),
        max(col("quality_score")).as("max_quality"))
      .orderBy("phase")
  }

  /** c14 over any raw/target (doc_id, text) pair of frames. Emits
    * (doc_id, n_feats, weight) for every raw doc with ≥ 1 bigram.
    */
  def importanceWeightsOver(raw: DataFrame, target: DataFrame,
      buckets: Int = C16Buckets): DataFrame = {
    def bucketCounts(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"),
        explode(graft.functions.F.shinglePosHashes64(col("text"), 2))
          .as("bh"))
      .select(col("doc_id"), pmod(col("bh"), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
    // localCheckpoint: the raw scan feeds the raw distribution AND the
    // per-doc scoring join — one corpus tokenization, not two
    val rawCounts = bucketCounts(raw).localCheckpoint(false)
    val tgtCounts = bucketCounts(target)
    // bounded driver scalars (one long each), the mixture-rate class
    val nRaw = rawCounts.agg(sum(col("n"))).collect().head.getLong(0)
    val nTgt = tgtCounts.agg(sum(col("n"))).collect().head.getLong(0)
    // bucket log-ratio table, ≤ 2¹⁶ rows by construction: every
    // bucket a doc can hit exists on the raw side (doc ⊆ raw), the
    // target side smooths absent buckets to count 0 (add-1)
    val lnRatio =
      log((coalesce(col("c_t"), lit(0L)) + lit(1L)).cast("double") /
        lit((nTgt + buckets).toDouble)) -
      log((col("c_r") + lit(1L)).cast("double") /
        lit((nRaw + buckets).toDouble))
    val lr = rawCounts.groupBy("b").agg(sum(col("n")).as("c_r"))
      .join(tgtCounts.groupBy("b").agg(sum(col("n")).as("c_t")),
        Seq("b"), "left")
      .select(col("b"), lnRatio.as("lr"))
    // fixed-point accumulation: the per-doc Σ n_b·lr(b) runs on
    // 9-dp-rounded DECIMAL terms — decimal addition is associative,
    // so the weight is bit-identical at any partition order (a float
    // Σ would not be)
    rawCounts.join(broadcast(lr), Seq("b"))
      .select(col("doc_id"), col("n"),
        round(col("n") * col("lr"), 9).cast("decimal(28,9)").as("term"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_feats"),
        sum(col("term")).cast("double").as("weight"))
  }

  // ---------------------------------------------------------------- c16

  /** c16: TRAINED quality classifier — the GPT-3/CCNet-class gate
    * (public practice: a logistic regression over hashed n-gram
    * features, trained to separate an exemplar "high-quality" slice
    * from the rest of the crawl; fastText's linear classifier without
    * the embedding layer). Features are the e12 positional bigram
    * hashes bucketed to 2¹⁶ (c14's fixed feature space at any corpus
    * size); weights come from `iters` rounds of full-batch gradient
    * descent in which EVERY per-round quantity is a bounded
    * distributed aggregate: per-doc margins are a doc-keyed rollup of
    * round(n_b·w_b, 9 dp) DECIMAL terms (partition-order-exact, c14's
    * determinism discipline), the gradient is a bucket-keyed rollup
    * of round(residual·n_b, 9) DECIMAL terms, and only the ≤ 2¹⁶-row
    * gradient vector (plus one bias row) ever reaches the driver.
    *
    * Shape at 100 TB: classifier TRAINING is small-data by design —
    * the labeled set is ~10⁵ docs in public pipelines, so the `iters`
    * training passes run over a bounded labeled frame — while SCORING
    * is one corpus-wide pass with the frozen ≤ 2¹⁶-double weight
    * table broadcast (one equi bucket join + one doc rollup). The
    * demo labels by exemplar source (c14's convention: the
    * alphabetically-first source is the quality slice).
    */
  def c16QualityClassifier(spark: SparkSession, dir: String,
      iters: Int = C16Iters, lr: Double = C16Lr): DataFrame =
    qualityClassifierOver(c16DemoLabeled(spark, dir), iters, lr)
      .orderBy("doc_id")

  /** The c16 demo labeling (c14's convention: the alphabetically-
    * first source is the quality slice) — shared by the driver query
    * and both oracle side-tables so they provably label identically.
    */
  private def c16DemoLabeled(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val tgt = docs.select(min(col("source"))).collect().head.getString(0)
    docs.select(col("doc_id"), col("text"),
      (col("source") === tgt).cast("int").as("label"))
  }

  /** The c16 demo hyper-parameters, pinned once — the driver query's
    * defaults and the oracle side-tables train through these same
    * constants, so they cannot drift apart.
    */
  private val C16Iters = 8
  private val C16Lr = 0.5
  // also the SHARED c16Featurize hash-bucket space: c14's DSIR
  // weights and c16ScoreIndexed's persisted-model scoring hash into
  // this same domain — a retune must reach every user through this
  // one constant, or scoring silently desynchronizes from training
  private val C16Buckets = 65536
  private val C16TrainCap = 4096L

  /** One fit: featurize + labels + the driver-side GD — the shared
    * trainer behind the demo query, [[c16ModelBuild]], and the oracle
    * model side-table.
    */
  private def c16Fit(labeled: DataFrame, iters: Int, lr: Double,
      buckets: Int, trainCap: Long)
      : (DataFrame, DataFrame, Map[Long, Double], Double) = {
    val feats = c16Featurize(labeled, buckets)
    val labels = labeled.select(col("doc_id"), col("label"))
      .localCheckpoint(false)
    val (w, bias) = c16Train(feats, labels, iters, lr, trainCap)
    (feats, labels, w, bias)
  }

  /** c16 over any labeled (doc_id, text, label∈{0,1}) frame: trains
    * logistic-regression weights by distributed full-batch GD with
    * CLASS-WEIGHTED loss (the exemplar slice is tiny by nature —
    * unweighted GD would just learn the base rate; balanced class
    * weights n/(2·n_class) put the 0.5 decision boundary at the
    * balanced point, standard practice for this gate), then scores
    * every doc. Emits (doc_id, label, n_feats, prob, keep).
    *
    * Cost shape: training runs over a DETERMINISTIC bounded sample
    * (every ⌈n/trainCap⌉-th doc_id — public classifiers train on
    * ~10⁵ labeled docs however big the corpus), and each GD round is
    * ONE chained Spark action: margins → residuals → bucket-gradient
    * rollup, with the bias gradient folded in as sentinel bucket −1
    * so no second pass is needed. Scoring is one corpus-wide pass.
    */
  def qualityClassifierOver(labeled: DataFrame, iters: Int = C16Iters,
      lr: Double = C16Lr, buckets: Int = C16Buckets,
      trainCap: Long = C16TrainCap): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    // one tokenization, reused by every training round and the final
    // scoring pass (lazy localCheckpoint, c03's discipline)
    val (feats, labels, w, bias) = c16Fit(labeled, iters, lr, buckets, trainCap)
    c16ScoreWith(broadcast(w.toSeq.toDF("b", "w")), bias, labels, feats)
  }

  /** The c16 GD loop over a featurized corpus: returns the frozen
    * (bucket→weight, bias) model. See [[qualityClassifierOver]] for
    * the cost shape.
    */
  private def c16Train(feats: DataFrame, labels: DataFrame, iters: Int,
      lr: Double, trainCap: Long): (Map[Long, Double], Double) = {
    val spark = feats.sparkSession
    import spark.implicits._
    val nAll = labels.count()
    val every = math.max(1L, (nAll + trainCap - 1) / trainCap)
    val trainLabels = labels.filter(pmod(col("doc_id"), lit(every)) === 0)
      .localCheckpoint(false)
    val trainFeats =
      if (every == 1L) feats
      else feats.filter(pmod(col("doc_id"), lit(every)) === 0)
    // The GD loop runs DRIVER-SIDE over the collected sample: the
    // sample is bounded by construction (≤ trainCap docs — public
    // classifiers train on ~10⁵ labeled docs however big the corpus),
    // and running 8 rounds as 8 chained Spark actions priced each
    // round at a full job's scheduling + shuffle latency (st16_build
    // breached the 10 s bar on exactly that). Same justification as
    // t11's capped word table. Bit-exactness vs the old distributed
    // loop is preserved because every rollup the cluster did in
    // decimal(28,9) fixed-point is replayed here as an EXACT BigDecimal
    // sum of the identical round-9 terms (order-independent), and the
    // per-doc double ops (sigmoid, class weight) are the same JVM
    // arithmetic — the plain-Scala-replay spec pins this.
    val lab = trainLabels.collect().map(r => r.getLong(0) -> r.getInt(1))
    val featRows = trainFeats.select(col("doc_id"), col("b"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc: Map[Long, Array[(Long, Long)]] = featRows
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(t => (t._2, t._3)) }
    val nDocs = lab.length.toDouble
    val nPos = lab.count(_._2 == 1).toDouble
    require(nPos > 0 && nPos < nDocs,
      s"training sample has one class only ($nPos of $nDocs positive)")
    val (wPos, wNeg) = (nDocs / (2.0 * nPos), nDocs / (2.0 * (nDocs - nPos)))
    def r9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    var w = Map.empty[Long, Double]
    var bias = 0.0
    for (_ <- 0 until iters) {
      val res: Array[(Long, Double)] = lab.map { case (d, l) =>
        val margin = byDoc.get(d).fold(0.0)(
          _.collect { case (b, n) if w.contains(b) => r9(n * w(b)) }
            .foldLeft(BigDecimal(0))(_ + _).toDouble)
        val sig = 1.0 / (1.0 + math.exp(-(margin + bias)))
        d -> (sig - l) * (if (l == 1) wPos else wNeg)
      }
      val resOf = res.toMap
      val grad: Map[Long, Double] = featRows.iterator
        .map { case (d, b, n) => b -> r9(resOf(d) * n) }
        .toSeq.groupBy(_._1)
        .map { case (b, ts) =>
          b -> ts.foldLeft(BigDecimal(0))(_ + _._2).toDouble }
      val gBias = res.map { case (_, r) => r9(r) }
        .foldLeft(BigDecimal(0))(_ + _).toDouble
      w = (w.keySet ++ grad.keySet).iterator.map { b =>
        b -> (w.getOrElse(b, 0.0) - lr * grad.getOrElse(b, 0.0) / nDocs)
      }.toMap
      bias -= lr * gBias / nDocs
    }
    (w, bias)
  }

  /** The c16 scoring pass: margins under a frozen weight table →
    * sigmoid prob (6 dp) → keep at 0.5. `keyed` must carry doc_id;
    * a `label` column rides along when present.
    */
  private def c16ScoreWith(wDf: DataFrame, bias: Double,
      keyed: DataFrame, feats: DataFrame): DataFrame =
    marginsOf(wDf, keyed, feats)
      .join(feats.groupBy("doc_id").agg(sum(col("n")).as("n_feats")),
        Seq("doc_id"), "left")
      .withColumn("n_feats", coalesce(col("n_feats"), lit(0L)))
      .withColumn("prob",
        round(lit(1.0) / (lit(1.0) + exp(-(col("margin") + lit(bias)))), 6))
      .withColumn("keep", col("prob") >= 0.5)
      .drop("margin")

  /** margin_dec(doc) = Σ_b round(n_b·w_b, 9) in DECIMAL — exact at
    * any partition order; docs with no weighted features get margin 0.
    * `keyed` must carry doc_id (label or any other columns ride
    * along); `wDf` is a (b, w) weight table, already broadcast-sized.
    */
  private def marginsOf(wDf: DataFrame, keyed: DataFrame,
      fts: DataFrame): DataFrame =
    keyed.join(
      fts.join(wDf, Seq("b"))
        .select(col("doc_id"),
          round(col("n") * col("w"), 9).cast("decimal(28,9)").as("term"))
        .groupBy("doc_id").agg(sum(col("term")).as("margin_dec")),
      Seq("doc_id"), "left")
      .withColumn("margin",
        coalesce(col("margin_dec").cast("double"), lit(0.0)))
      .drop("margin_dec")

  /** The c16 feature pass: e12 bigram hashes → 2^buckets-bounded
    * bucket counts per doc (one tokenization, localCheckpointed so
    * every consumer reuses it).
    */
  private def c16Featurize(docs: DataFrame, buckets: Int): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.F.shinglePosHashes64(col("text"), 2))
          .as("bh"))
      .select(col("doc_id"), pmod(col("bh"), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)

  /** Train the c16 classifier and PERSIST the frozen model as a
    * (b, w) parquet weight table — the bias rides as sentinel bucket
    * −1 (pmod keeps real buckets in [0, 2¹⁶), so it can't collide).
    * Train once, score forever: this is what st16's streaming gate
    * reads — the labeled corpus is never re-scanned on the stream.
    */
  def c16ModelBuild(labeled: DataFrame, modelPath: String,
      iters: Int = C16Iters, lr: Double = C16Lr,
      buckets: Int = C16Buckets, trainCap: Long = C16TrainCap): Unit = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val (_, _, w, bias) = c16Fit(labeled, iters, lr, buckets, trainCap)
    (w.toSeq :+ (-1L, bias)).toDF("b", "w")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(modelPath)
  }

  /** Score any (doc_id, text, …) frame against a PERSISTED c16 model
    * — the inference half of the gate: one feature pass, the ≤ 2¹⁶-row
    * weight table broadcast into a bucket equi-join, no training jobs.
    * Probabilities are bit-identical to [[qualityClassifierOver]]'s on
    * the same docs (same margins/rounding chain; parquet round-trips
    * the weight doubles exactly). Emits (doc_id, n_feats, prob, keep).
    */
  def c16ScoreIndexed(docs: DataFrame, modelPath: String,
      buckets: Int = C16Buckets): DataFrame = {
    val spark = docs.sparkSession
    val model = spark.read.parquet(modelPath)
    val bias = model.filter(col("b") === -1L)
      .collect().headOption.map(_.getDouble(1))
      .getOrElse(throw new IllegalStateException(
        s"c16 model at $modelPath has no bias row — rebuild the model"))
    c16ScoreWith(broadcast(model.filter(col("b") =!= -1L)), bias,
      docs.select("doc_id"), c16Featurize(docs, buckets))
  }

  // ---------------------------------------------------------------- c18

  /** c18: cluster-balanced corpus sampling — per-semantic-cluster
    * quota selection (public practice: after SemDeDup-style
    * clustering, curation keeps the most CENTRAL `perCluster`
    * prototypes of every cluster, so no dense topic dominates the
    * subsample — prototype selection / data-diet curation).
    *
    * Scale shape: cell assignment is one per-row projection through
    * the native dot kernel (no shuffle — d10's layout); the only
    * shuffle is the per-cell window, whose state is bounded by the
    * quantizer's ~balanced cells, and the output is quota-bounded at
    * nlist·perCluster rows no matter the corpus. At 100 TB the celled
    * corpus persists partitioned by `cell` (s08's layout) and the
    * window runs per partition.
    */
  def c18Over(vectors: DataFrame, perCluster: Int = 8,
      nlist: Int = 16): DataFrame = {
    import graft.functions.F
    val cents = Ann.trainCentroids(vectors, nlist)
    val scores = Ann.centroidScores(col("embedding"), cents)
    // spherical centroids are unit-norm, so dot/|v| IS the cosine to
    // the winning centroid — the centrality that ranks prototypes
    val celled = vectors.select(col("vec_id"),
      array_position(scores, array_max(scores)).as("cell"),
      (array_max(scores) /
        sqrt(F.dotProd(col("embedding"), col("embedding"))))
        .as("centrality"))
    celled
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
          .orderBy(col("centrality").desc, col("vec_id"))))
      .filter(col("rank") <= perCluster)
      .select(col("cell"), col("rank"), col("vec_id"),
        round(col("centrality"), 4).as("centrality"))
      .orderBy("cell", "rank")
  }

  /** c18 driver demo over the embeddings table. */
  def c18BalancedSample(spark: SparkSession, dir: String,
      perCluster: Int = 8, nlist: Int = 16): DataFrame =
    c18Over(
      Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding")),
      perCluster, nlist)

  // ---------------------------------------------------------------- c17

  /** c17: semantic decontamination — c03's train/eval leakage gate
    * lifted from lexical shingles to the embedding space (public
    * practice: benchmark contamination increasingly survives
    * paraphrase, so pipelines screen on embedding cosine as well as
    * n-gram overlap). Benchmark stand-in: vec_id divisible by 10
    * (c03's convention; a real run substitutes its benchmark
    * embedding table). Every train vector is scored against the full
    * benchmark set; output = flagged train vectors with their hit
    * count and closest similarity at `threshold`.
    *
    * The benchmark side is small BY NATURE (eval sets are), so it
    * broadcasts whole and the scan is one by-design-linear pass over
    * the train side with norm-precomputed cosine (each norm computed
    * once, not per pair) — s01's declared-baseline shape. When the
    * benchmark itself grows, s04's IVF cells or d06's SRP banding
    * compose in front as the candidate cut, exactly as they do for
    * the search operators.
    */
  def c17SemanticDecontam(spark: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    import graft.functions.F
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"),
        sqrt(F.dotProd(col("embedding"), col("embedding"))).as("nrm"))
    val bench = emb.filter(col("vec_id") % 10 === 0)
    val train = emb.filter(col("vec_id") % 10 =!= 0)
    train.as("t").join(broadcast(bench.as("b")),
        F.cosineSim4Pre(col("t.embedding"), col("t.nrm"),
          col("b.embedding"), col("b.nrm")) >= threshold)
      .select(col("t.vec_id").as("vec_id"),
        F.cosineSim4Pre(col("t.embedding"), col("t.nrm"),
          col("b.embedding"), col("b.nrm")).as("cos"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_bench_hits"), max(col("cos")).as("max_cos"))
      .orderBy("vec_id")
  }

  /** c17 build half: persist the benchmark embedding set as an IVF
    * index (Ann.buildIvfIndex — celled parquet + the quantizer's
    * centroids beside it). `nlist = 0` auto-sizes to ⌈√n_bench⌉, the
    * classic IVF balance point: with a fixed `nprobe`, screen work
    * then grows as n_train·√n_bench instead of c17's declared
    * n_train·n_bench brute force — the subquadratic scale path the
    * c17 docstring promises. Built ONCE per benchmark version (eval
    * sets are static by nature), like c03BenchBuild/c16ModelBuild.
    */
  def c17BenchBuild(benchVectors: DataFrame, path: String,
      nlist: Int = 0): Int = {
    val count = benchVectors.count()
    require(count > 0,
      s"c17BenchBuild: benchmark embedding set is empty — nothing to index at $path")
    // auto-nlist = ⌈√n⌉, clamped to the quantizer's 2048-vector sample
    // cap: past ~4.2M bench rows ⌈√n⌉ would exceed the sample and trip
    // trainCentroids' pts.length >= nlist requirement
    val n =
      if (nlist > 0) nlist
      else math.min(2048, math.max(1, math.ceil(math.sqrt(count.toDouble)).toInt))
    Ann.buildIvfIndex(benchVectors.select("vec_id", "embedding"), path,
      nlist = n)
    n
  }

  /** c17 inference half: screen train vectors against the PERSISTED
    * benchmark IVF index. Each train vector scores the nlist centroids
    * in one per-row projection (native dot kernel — no shuffle, no
    * UDF), keeps its `nprobe` best cells, and exact-cosine-verifies
    * only the benchmark vectors in those cells via a cell equi-join —
    * a hash join on a small int, never a cosine cross product. Flags
    * are exact by construction (every reported pair passed the real
    * cosine); `nprobe` is the recall dial, and `nprobe = nlist`
    * degenerates to c17's brute force exactly (every cell probed ⇒
    * every pair compared — the spec's equality law). Output matches
    * c17's schema: (vec_id, n_bench_hits, max_cos).
    */
  def c17ScreenIndexed(train: DataFrame, indexPath: String,
      threshold: Double = 0.4, nprobe: Int = 4): DataFrame = {
    import graft.functions.F
    val spark = train.sparkSession
    // bounded by construction: nlist rows (≈ √n_bench)
    val cents = spark.read.parquet(indexPath + ".centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Float](1).toArray)
    val bench = spark.read.parquet(indexPath)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("cell"))
      .withColumn("b_nrm", sqrt(F.dotProd(col("b_emb"), col("b_emb"))))
    // nprobe <= 0 is the "probe ALL cells" sentinel (brute-equal), the
    // same convention as c17SemanticDecontamIvf — slice(probes, 1, 0)
    // would otherwise silently return ZERO probes and an empty screen,
    // the exact opposite of what a caller passing 0 means.
    val np = if (nprobe <= 0) cents.length else math.min(nprobe, cents.length)
    // top-nprobe cells per train vector: zip (score, pos), sort by
    // (-score, pos) — deterministic tie-break — slice, 1-based cell ids
    val scored = train.select(col("vec_id"), col("embedding"),
      sqrt(F.dotProd(col("embedding"), col("embedding"))).as("nrm"),
      slice(
        sort_array(zip_with(
          Ann.centroidScores(col("embedding"), cents),
          sequence(lit(0), lit(cents.length - 1)),
          (s, p) => struct((-s).as("ns"), p.as("pos")))),
        1, np).as("probes"))
    scored
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(col("probes")).as("pr"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (col("pr.pos") + 1).cast("long").as("cell"))
      .join(broadcast(bench), Seq("cell"))
      .select(col("vec_id"),
        F.cosineSim4Pre(col("embedding"), col("nrm"),
          col("b_emb"), col("b_nrm")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_bench_hits"), max(col("cos")).as("max_cos"))
  }

  private def demoPath(tag: String, dir: String): String =
    Ann.demoIndexPath(tag, dir)

  /** c17 driver query, indexed form: the same vec_id%10 bench/train
    * split as c17, screened through the persisted IVF index at the
    * auto-sized nlist. `nprobe = 0` probes ALL cells — brute-equal
    * output (the oracle-checkable config; the recall/cost dial only
    * opens when a deployment lowers nprobe below nlist, measured by
    * the bench phase rows).
    */
  def c17SemanticDecontamIvf(spark: SparkSession, dir: String,
      threshold: Double = 0.4, nprobe: Int = 0): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val path = demoPath("c17", dir)
    val nlist = c17BenchBuild(emb.filter(col("vec_id") % 10 === 0), path)
    val np = if (nprobe > 0) nprobe else nlist
    c17ScreenIndexed(emb.filter(col("vec_id") % 10 =!= 0), path,
      threshold, np)
      .orderBy("vec_id")
  }

  /** c17 bench build phase: one-time benchmark IVF index persist. */
  def c17BenchBuildRow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = demoPath("c17", dir)
    val nlist = c17BenchBuild(
      Tables(spark, dir).embeddings.filter(col("vec_id") % 10 === 0),
      path)
    Seq((path, nlist)).toDF("path", "nlist")
  }

  /** c17 bench screen phase: the recurring indexed screen at nprobe=4
    * — the n_train·√n_bench shape a deployment repeats per corpus
    * drop (build strictly before screen in bench order).
    */
  def c17BenchScreenRow(spark: SparkSession, dir: String): DataFrame =
    c17ScreenIndexed(
      Tables(spark, dir).embeddings.filter(col("vec_id") % 10 =!= 0),
      demoPath("c17", dir), threshold = 0.4, nprobe = 4)

  /** c19: corpus drift report — the distribution-shift monitor a
    * pipeline runs between two corpus snapshots (yesterday's crawl vs
    * today's, pre- vs post-filter) before retraining decisions. Per
    * monitored dimension (token-count bucket, char-count bucket,
    * lang, source) it reports the bucket count and the total
    * variation distance ½·Σ|p_a − p_b| between the snapshots'
    * bucket distributions. TVD instead of PSI/KL by design: it needs
    * no ln, so the whole report is exact cross-multiplied integer
    * arithmetic (tvd_num = Σ|cnt_a·total_b − cnt_b·total_a|) with ONE
    * final IEEE division — bit-identical across engines and
    * partitionings. The demo splits `documents` into even/odd doc_id
    * snapshots (deterministic, population-balanced).
    *
    * Scale: one pass per snapshot fused into one scan of the union,
    * a (metric, bucket) count shuffle (≤ 4·buckets rows), a ≤4-row
    * broadcast totals join. tvd_num stays in BIGINT while
    * cnt·total < 2⁶³ — snapshots beyond ~3×10⁹ docs per bucket pair
    * should lift the cross-products to DECIMAL(38,0).
    */
  def c19DriftReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    driftReportOver(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0))
  }

  /** c19 over any two snapshots of the documents schema
    * (doc_id, text, lang, source, n_chars).
    */
  def driftReportOver(snapA: DataFrame, snapB: DataFrame): DataFrame =
    driftFromCounts(c19BucketCounts(snapA), c19BucketCounts(snapB))

  /** The c19 bucket histogram of one snapshot — (metric, bucket, cnt)
    * rows. Persisting this IS the "frozen reference" a monitoring
    * deployment compares against (st19's build phase).
    */
  def c19BucketCounts(docs: DataFrame): DataFrame =
    docs.select(expr(
      """stack(4,
        |  'tokens', CAST(least(size(split(text, ' ')) div 32, 7) AS STRING),
        |  'chars',  CAST(least(n_chars div 256, 7) AS STRING),
        |  'lang',   lang,
        |  'source', source) AS (metric, bucket)""".stripMargin))
      .groupBy("metric", "bucket").agg(count(lit(1)).as("cnt"))

  /** The c19 report from two prebuilt bucket histograms — shared by
    * the batch report (c19) and the streaming monitor (st19), so
    * their drift math can never diverge. Buckets absent from one side
    * count 0 there (full-outer union of the bucket sets).
    *
    * Bound (review r14): the exact cross-multiplied TVD numerator
    * `cnt·total` stays inside Long for snapshots up to ~3·10⁹
    * documents each; past that the product fails LOUDLY under the
    * session's ANSI mode (never a silent wrap). Snapshots at that
    * scale should compare SAMPLED histograms (drift is a ratio
    * statistic — subsampling both sides preserves it), or route the
    * products through DECIMAL(38,0) in a caller-owned variant.
    */
  def driftFromCounts(countsA: DataFrame, countsB: DataFrame): DataFrame = {
    val bc = countsA.withColumnRenamed("cnt", "cnt_a")
      .join(countsB.withColumnRenamed("cnt", "cnt_b"),
        Seq("metric", "bucket"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val tot = bc.groupBy("metric")
      .agg(count(lit(1)).as("n_buckets"), sum(col("cnt_a")).as("total_a"),
        sum(col("cnt_b")).as("total_b"))
    bc.join(broadcast(tot), Seq("metric"))
      .groupBy("metric", "n_buckets", "total_a", "total_b")
      .agg(sum(abs(col("cnt_a") * col("total_b") -
        col("cnt_b") * col("total_a"))).as("tvd_num"))
      .withColumn("tvd", col("tvd_num").cast("double") /
        (lit(2.0) * col("total_a") * col("total_b")))
      .select("metric", "n_buckets", "total_a", "total_b", "tvd_num", "tvd")
      .orderBy("metric")
  }

  /** c21: canary-string detection — benchmark suites embed canary
    * GUIDs (the public BIG-bench practice) precisely so that a
    * training pipeline can PROVE it excluded them; a corpus that
    * ships a canary is evidence of benchmark contamination that c03/
    * c07/c17's similarity screens may miss when the surrounding text
    * was rewritten. Scans for the `canary` marker word followed by a
    * GUID and reports every hit; `keep` is the exclusion verdict.
    * Pure per-row codegen'd regexp on an RE2-portable pattern —
    * shuffle-free, and cheap enough to run unconditionally at intake.
    *
    * The demo plants a deterministic decimal-digit GUID (digits are
    * valid hex) on doc_id%11==3 documents.
    */
  def c21CanaryScan(spark: SparkSession, dir: String): DataFrame = {
    val guid = concat(lpad(col("doc_id").cast("string"), 8, "0"),
      lit("-dead-beef-cafe-"),
      lpad(col("doc_id").cast("string"), 12, "0"))
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      when(col("doc_id") % 11 === 3,
        concat(col("text"), lit(" canary "), guid))
        .otherwise(col("text")).as("text"))
    canaryScanOver(planted).orderBy("doc_id")
  }

  /** The canary pattern: marker word + GUID (8-4-4-4-12 hex). */
  val CanaryPattern: String =
    "canary ([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12})"

  /** c21 over any (doc_id, text) frame: hit count, the GUIDs found
    * (sorted, comma-joined — deterministic), and the keep verdict.
    */
  def canaryScanOver(docs: DataFrame): DataFrame = {
    val hits = regexp_extract_all(col("text"), lit(CanaryPattern), lit(1))
    docs.select(col("doc_id"),
      size(hits).cast("long").as("n_canaries"),
      array_join(array_sort(hits), ",").as("canaries"))
      .withColumn("keep",
        when(col("n_canaries") === 0L, 1L).otherwise(0L))
  }

  /** The Gopher stop set (Rae et al. 2021 §A1.1, public): a document
    * is expected to contain at least 2 of these 8 function words.
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** c20: the Gopher-style quality RULE SUITE — per-document
    * admission flags, one per published rule, not a scalar score.
    * t02 is the scalar composite a ranking wants; this is the
    * rule-by-rule gate a curation pipeline tunes and AUDITS
    * individually (public practice: Gopher §A1.1, Dolma, FineWeb all
    * gate on named rules so a curator can see WHICH rule rejected a
    * document). Rules: word-count bounds [50, 100000], mean word
    * length in [3, 10], symbol-to-word ratio (# chars + '...'
    * ellipses) < 0.1, bullet-started line fraction < 0.9,
    * ellipsis-ended line fraction < 0.3, alphabetic-word fraction
    * > 0.8, and ≥ 2 distinct stop words present.
    *
    * Determinism: every ratio is ONE IEEE division of two exact
    * integers (correctly rounded by definition), and every flag
    * compares such a quotient against a literal — so metrics, flags
    * and the keep verdict replay bit-for-bit in the DuckDB oracle.
    * Counts come from codegen'd string arithmetic (length deltas for
    * '#'/'...', multiline-anchored regexp counts for bullet/ellipsis
    * lines and alphabetic words — RE2-portable, no interpreted HOF
    * in the per-row path); words are NON-EMPTY separator-run
    * extractions (so double spaces and blank lines never dilute the
    * ratios), the word-length sum is chars minus all separator
    * chars, alphabetic means either case, and stop matching is
    * case-folded.
    *
    * The synthetic corpus is single-line prose, so the demo plants
    * rule violations deterministically (the t17 discipline):
    * doc_id%7==1 appends a ####-run tail (symbol + alpha rules),
    * ==3 prepends nine bullet lines (9/10 = 0.9 fails the strict-<
    * bullet rule exactly), ==5 appends two ellipsis-ended lines.
    * The stop LIST is a parameter (every production pipeline
    * configures it per language): the published Gopher 8 is the
    * default, but the TESTDATA vocabulary contains exactly two
    * function words ("the", "a" — the t03 content-free-corpus note),
    * so the demo supplies those; with the Gopher 8 the r_stop rule
    * would degenerately reject the whole synthetic corpus.
    *
    * Scale: per-row, shuffle-free (the driver orderBy is
    * presentation only); the (doc_id, text) projection reaches the
    * scan. At 100 TB this is a map-only pass fused into whatever
    * scan follows it.
    */
  def c20GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents.select(col("doc_id"),
      when(col("doc_id") % 7 === 1,
        concat(col("text"),
          lit(" #### ## ###### ### ## #### ### ## #### ###")))
        .when(col("doc_id") % 7 === 3,
          concat(lit("- item x\n" * 9), col("text")))
        .when(col("doc_id") % 7 === 5,
          concat(col("text"), lit("\nto be continued...\nread more soon...")))
        .otherwise(col("text")).as("text"))
    gopherRulesOver(planted, stops = Seq("the", "a")).orderBy("doc_id")
  }

  /** c20 over any (doc_id, text) frame. Flags are BIGINT 0/1 (the
    * artifact convention); `keep` is the conjunction of all seven.
    */
  def gopherRulesOver(docs: DataFrame,
      stops: Seq[String] = GopherStops): DataFrame = {
    // token/word counts via NON-EMPTY-run extraction, not split:
    // split("[ \n]") keeps empty tokens at separator runs (double
    // spaces, blank lines), silently deflating mean_word_len and
    // alpha_ratio on ordinary multi-paragraph text
    val nWords = size(regexp_extract_all(
      col("text"), lit("[^ \n]+"), lit(0))).cast("long")
    val nLines = size(split(col("text"), "\n")).cast("long")
    // sum of word lengths = chars minus ALL separator chars — exact
    // for any separator-run structure (the split identity is not)
    val sumLen = length(regexp_replace(col("text"), "[ \n]", "")).cast("long")
    val nHash =
      (length(col("text")) - length(replace(col("text"), lit("#")))).cast("long")
    val nEllSym = expr(
      "(length(text) - length(replace(text, '...'))) div 3")
    val nBullet = size(regexp_extract_all(
      col("text"), lit("(?m)^[-*•] "), lit(0))).cast("long")
    val nEllLine = size(regexp_extract_all(
      col("text"), lit("(?m)\\.\\.\\.$"), lit(0))).cast("long")
    // one match per token containing ≥1 LETTER (either case — the
    // published rule is 'contains an alphabetic character', and
    // all-caps headers are still words): the leading separator (or ^)
    // is consumed WITH the match, so adjacent alphabetic tokens still
    // count once each
    val nAlpha = size(regexp_extract_all(
      col("text"), lit("(^|[ \n])[^ \n]*[a-zA-Z]"), lit(0))).cast("long")
    // stop matching is case-insensitive ('The' at sentence start IS
    // 'the'); tokens re-extracted from the lowercased text
    val nStop = size(array_intersect(
      regexp_extract_all(lower(col("text")), lit("[^ \n]+"), lit(0)),
      array(stops.map(lit): _*))).cast("long")
    val meanLen = sumLen.cast("double") / nWords
    val symbolRatio = (nHash + nEllSym).cast("double") / nWords
    val bulletRatio = nBullet.cast("double") / nLines
    val ellipsisRatio = nEllLine.cast("double") / nLines
    val alphaRatio = nAlpha.cast("double") / nWords
    def flag(c: Column): Column = when(c, 1L).otherwise(0L)
    val rWords = flag(nWords >= 50 && nWords <= 100000)
    val rMean = flag(meanLen >= 3.0 && meanLen <= 10.0)
    val rSymbol = flag(symbolRatio < 0.1)
    val rBullet = flag(bulletRatio < 0.9)
    val rEll = flag(ellipsisRatio < 0.3)
    val rAlpha = flag(alphaRatio > 0.8)
    val rStop = flag(nStop >= 2)
    docs.select(col("doc_id"),
      nWords.as("n_words"), nLines.as("n_lines"),
      meanLen.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
      bulletRatio.as("bullet_ratio"), ellipsisRatio.as("ellipsis_ratio"),
      alphaRatio.as("alpha_ratio"), nStop.as("n_stop_hits"),
      rWords.as("r_words"), rMean.as("r_mean"), rSymbol.as("r_symbol"),
      rBullet.as("r_bullet"), rEll.as("r_ellipsis"), rAlpha.as("r_alpha"),
      rStop.as("r_stop"),
      flag(rWords + rMean + rSymbol + rBullet + rEll + rAlpha + rStop === 7)
        .as("keep"))
  }

  /** Clip document token spans [lo, hi) against fixed-`seqLen`
    * sequence windows and index the per-sequence segments: one row
    * per (sequence, segment) — `seq_id, seg_idx, doc_id, seg_start,
    * seg_len` plus any `carry` columns riding through (c25's
    * loss_mask). The subtle arithmetic — the `(hi-1) div seqLen`
    * upper bound and the greatest/least clip — lives ONLY here: c24
    * is the one-span-per-doc call, c25 the two-span one (review r13
    * corpus #7). seg_idx is a row_number over a seq_id-KEYED window
    * (never unpartitioned); the explode is bounded per span by its
    * sequence-crossing count.
    */
  private def clipSpansToSequences(spans: DataFrame, seqLen: Long,
      carry: Seq[String] = Nil): DataFrame = {
    val clipped = spans
      .select(Seq(col("doc_id"), col("lo"), col("hi")) ++
        carry.map(col) :+
        explode(sequence(expr(s"lo div $seqLen"),
          expr(s"(hi - 1) div $seqLen"))).as("seq_id"): _*)
      .select(Seq(col("seq_id"), col("doc_id"),
        (greatest(col("lo"), col("seq_id") * seqLen) -
          col("seq_id") * seqLen).as("seg_start"),
        (least(col("hi"), (col("seq_id") + 1) * seqLen) -
          greatest(col("lo"), col("seq_id") * seqLen)).as("seg_len")) ++
        carry.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("seq_id").orderBy("seg_start")
    clipped
      .withColumn("seg_idx",
        (org.apache.spark.sql.functions.row_number().over(w) - 1)
          .cast("long"))
      .select((Seq("seq_id", "seg_idx", "doc_id", "seg_start", "seg_len")
        ++ carry).map(col): _*)
      .orderBy("seq_id", "seg_idx")
  }

  /** c24: packed-sequence boundary masks — the document-boundary
    * layout every packed-pretraining stack needs for BLOCK-DIAGONAL
    * attention (public practice: sequences packed from multiple
    * documents must not cross-attend; the mask is built from each
    * document's contiguous span inside each sequence — e.g. the
    * attention-mask resets the T5/LLaMA packing recipes describe).
    * One row per (sequence, segment): `seq_id, seg_idx, doc_id,
    * seg_start, seg_len`, derived from c09's distributed prefix-sum
    * offsets ALONE — no token materialization; span arithmetic is
    * exact integer min/max clipping of [tok_start, tok_start+n)
    * against [seq·L, (seq+1)·L).
    *
    * Scale: the explode is bounded by each doc's n_seqs (≤ n/L + 1);
    * seg_idx is a row_number over a seq_id-KEYED window (never
    * unpartitioned); one exchange on seq_id.
    */
  def c24BoundaryMasks(spark: SparkSession, dir: String,
      seqLen: Long = 128L): DataFrame = {
    val offs = packOffsetsOver(
      Tables(spark, dir).documents.select(col("doc_id"),
        element_at(TextOps.subwordStatsCol(col("text")), 1).as("n_tokens")),
      seqLen)
    // [lo, hi) = the doc's whole token span; sequence bounds derive
    // inside the shared clipper (lo div L == c09's seq_first,
    // (hi-1) div L == seq_last — same integers)
    clipSpansToSequences(
      offs.filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("tok_start").as("lo"),
          (col("tok_start") + col("n_tokens")).as("hi")),
      seqLen)
  }

  /** c25: SFT pack layout with loss masks — the instruction-tuning
    * sibling of c24 (public practice: supervised fine-tuning packs
    * (prompt, response) pairs and masks the PROMPT tokens out of the
    * loss; the pack layout must carry per-span mask flags next to the
    * doc boundaries). Each document splits at a closed-form boundary
    * (prompt = first n div 3 tokens, response = the rest — the demo's
    * stand-in for a real prompt/response delimiter), contributing up
    * to two logical spans per sequence crossing: one row per
    * (sequence, segment) with `seq_id, seg_idx, doc_id, seg_start,
    * seg_len, loss_mask` (0 = prompt, masked; 1 = response, trained).
    *
    * Same scale posture as c24: offsets from c09's distributed
    * prefix-sum alone, exact-integer span clipping, seg_idx via a
    * seq-KEYED row_number, explode bounded per doc.
    */
  def c25SftPack(spark: SparkSession, dir: String,
      seqLen: Long = 128L): DataFrame = {
    val offs = packOffsetsOver(
      Tables(spark, dir).documents.select(col("doc_id"),
        element_at(TextOps.subwordStatsCol(col("text")), 1).as("n_tokens")),
      seqLen)
    // the two per-doc spans: [ts, ts+p) masked, [ts+p, ts+n) trained
    val spans = offs.filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("tok_start"),
        expr("n_tokens div 3").as("p"))
      .select(col("doc_id"), explode(array(
        struct(col("tok_start").as("lo"),
          (col("tok_start") + col("p")).as("hi"), lit(0L).as("loss_mask")),
        struct((col("tok_start") + col("p")).as("lo"),
          (col("tok_start") + col("n_tokens")).as("hi"),
          lit(1L).as("loss_mask")))).as("s"))
      .select(col("doc_id"), col("s.lo"), col("s.hi"), col("s.loss_mask"))
      .filter(col("hi") > col("lo")) // empty prompt/response spans drop
    clipSpansToSequences(spans, seqLen, carry = Seq("loss_mask"))
  }

  /** c23: binary token-shard export — the terminal TRAIN-READY
    * artifact below even c12's packed sequences: the public
    * fixed-width binary shard convention (GPT-2/nanoGPT-style `.bin`
    * files — the token stream serialized as uint16 little-endian,
    * cut into fixed-capacity shards a data loader mmaps). Composes
    * the t09 subword-id kernel with the c09 distributed prefix-sum:
    * per-doc ids → global token positions (NO unpartitioned window)
    * → shard = pos div cap → per-shard ordered byte assembly.
    *
    * Serialization rule: piece id & 0xFFFF little-endian; t09's UNK
    * sentinel (−1) therefore serializes as FFFF, the conventional
    * uint16 unknown. Output carries the shard bytes as a HEX string
    * — byte-level, so the DuckDB oracle (which rebuilds the ids with
    * the t09 recursive CTE and re-serializes with printf) is a full
    * differential check of the binary layout; a real deployment
    * lands `unhex(bytes_hex)` instead.
    *
    * Scale: the prefix-sum is c09's (local windows + ≤nParts-row
    * broadcast); the assembly groupBy carries (shard, off, tok) slim
    * rows and each group is bounded by `cap` — collect_list is safe
    * by construction, sorted in-group for determinism. Shuffle is
    * one exchange on shard_id. The offsets side re-runs the subword
    * kernel in stats-only form instead of checkpointing the exploded
    * id ARRAYS for reuse (c12's rule, applied here in the r17 review
    * wave: kernels are cheap CPU, but a localCheckpoint of the full
    * token stream materializes the corpus's token MASS to
    * memory-and-disk — at 100 TB that cache IS the bottleneck).
    */
  def c23ShardExport(spark: SparkSession, dir: String,
      cap: Long = 256L): DataFrame = {
    val docs = Tables(spark, dir).documents
    val offs = packOffsetsOver(
      docs.select(col("doc_id"),
        element_at(TextOps.subwordStatsCol(col("text")), 1).as("n_tokens")),
      cap).select("doc_id", "tok_start")
    docs
      .select(col("doc_id"), TextOps.subwordIdsCol(col("text")).as("ids"))
      .join(offs, "doc_id")
      .select(col("tok_start"), posexplode(col("ids")).as(Seq("i", "tok")))
      .select(((col("tok_start") + col("i")).cast("long")).as("pos"),
        col("tok"))
      .select(expr(s"pos div $cap").as("shard_id"),
        expr(s"pos % $cap").as("off"),
        expr("tok & 65535").as("v"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("off"), col("v")))),
          s => format_string("%02X%02X",
            s.getField("v").bitwiseAND(lit(255)),
            shiftright(s.getField("v"), 8))),
          "").as("bytes_hex"))
      .orderBy("shard_id")
  }

  /** c22: per-domain mixture report + domain cap — the domain-level
    * composition view crawl-curation pipelines publish (public
    * practice: RefinedWeb/FineWeb report per-domain document/token
    * shares and CAP any one domain's contribution so no single host
    * dominates the mixture; Dolma ships the same rollup). Composes
    * the d15 canonicalizer: synthesize the demo URLs, canonicalize,
    * take the canonical HOST as the domain, roll up documents and
    * ws-tokens (t01's kernel) per domain, and report each domain's
    * token share (exact integers until ONE final IEEE divide — the
    * c19 discipline) plus the capped doc count
    * `n_kept = least(n_docs, cap)`.
    *
    * Across SFs both cap regimes are exercised: at sf≤0.01 each
    * domain holds ≤10 docs (cap idle), at sf0.1 ~100 (cap binds on
    * every domain); the spec additionally pins the binding regime
    * with a tightened cap.
    *
    * Scale: canonicalization is per-row; the rollup is ONE map-side-
    * combinable shuffle keyed on domain; the corpus total is a 1-row
    * aggregate broadcast back. The final sort runs over |domains|
    * rows, not the corpus — no unpartitioned window anywhere.
    */
  def c22DomainMixture(spark: SparkSession, dir: String,
      cap: Long = 15L): DataFrame = {
    val docs = Tables(spark, dir).documents
    val canon = Dedup.urlCanonicalizeOver(
      Dedup.d15DemoUrls(docs, expr("doc_id div 5")))
    val perDoc = canon
      .select(col("doc_id"),
        Dedup.canonDomain(col("canon_url")).as("domain"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks")), "doc_id")
    val dom = perDoc.groupBy("domain").agg(
      count(lit(1)).as("n_docs"),
      sum("n_toks").as("n_tokens"))
    val total = dom.agg(sum("n_tokens").as("tot"))
    dom.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tot").cast("double"), 9)
          .as("tok_share"),
        least(col("n_docs"), lit(cap)).as("n_kept"))
      .orderBy("domain")
  }

  // ---------------------------------------------------------------- c26

  /** The c26 demo fixture: benchmark docs (doc_id % 10 == 0) and the
    * contaminated subset of train docs (doc_id % 7 == 0) both carry
    * the d08 SharedPassage appended — the passage's 8 interior
    * 13-grams are what the filter must catch; everything else is
    * random-token text with no meaningful 13-gram collisions.
    */
  private[operators] def c26Bench(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        concat(col("text"),
          lit(" " + Dedup.SharedPassage.mkString(" "))).as("text"))

  private[operators] def c26Train(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" " + Dedup.SharedPassage.mkString(" "))))
          .otherwise(col("text")).as("text"))

  /** The benchmark Bloom sketch as a bounded driver-side constant —
    * the s04-centroids pattern: a FIXED-SIZE model collected once and
    * embedded as a literal, never data. Spark's own
    * BloomFilterAggregate builds it (bit-OR merge across partitions:
    * order-independent, fixed hash seeds, deterministic bytes).
    */
  private[operators] def c26Sketch(bench: DataFrame, gramK: Int,
      estItems: Long, numBits: Long): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    val grams = Dedup.docShingleHashes(bench, gramK)
      .select(explode(col("sh")).as("h")).distinct()
    val agg = new BloomFilterAggregate(Bridge.expression(grams("h")),
      Literal(estItems), Literal(numBits))
    val row = grams.agg(Bridge.column(agg.toAggregateExpression()).as("bf"))
      .head()
    // BloomFilterAggregate over ZERO rows returns NULL, and
    // might_contain(NULL, h) is NULL → every train doc would score
    // (0 hits, clean) with no error anywhere — an empty or
    // sub-one-k-gram benchmark silently DISABLES the decontamination
    // gate (review r15 wave; c17BenchBuild's empty-benchmark
    // discipline applied here).
    require(!row.isNullAt(0),
      s"c26Sketch: the benchmark contributed zero $gramK-grams — an " +
        "empty sketch passes every train document as clean; supply a " +
        "non-empty benchmark (or lower gramK) instead of silently " +
        "skipping the gate")
    row.getAs[Array[Byte]](0)
  }

  /** c26: Bloom-gram decontamination — the FIXED-MEMORY version of the
    * c03/c07 train-vs-benchmark gates (public practice: GPT-3's
    * appendix-C 13-gram overlap filter; the Dolma/FineWeb
    * decontamination passes run the same shape): hash every benchmark
    * k-gram (e10 xxhash64 shingle kernel) into ONE Bloom filter, then
    * score each training document by how many of its k-grams the
    * filter might contain. The probe side embeds the sketch as a
    * LITERAL (might_contain requires a constant), so scoring is pure
    * per-row codegen with NO join at all: at 100 TB the benchmark
    * sketch is a few hundred KB riding the task binary while the
    * train side streams through the scan — where c03's exact-hash
    * broadcast grows with the benchmark and c07's span join shuffles
    * positional shingles.
    *
    * Determinism: fixed hash seeds inside Spark's sketch make false
    * positives REPRODUCIBLE; the output surfaces the evidence
    * (n_grams, n_hits) rather than a bare verdict, and `contaminated`
    * is the n_hits >= minHits threshold. Docs too short to carry one
    * k-gram score (0, 0, clean).
    *
    * Oracle: side-tables carry the per-doc hashed grams and the
    * per-DISTINCT-gram bloom verdict (the kernel boundary); the
    * explode -> verdict join -> per-doc aggregation -> threshold ->
    * left-join-back all replay in SQL. The spec pins what the oracle
    * cannot: zero false negatives (every planted passage doc flags)
    * and a bounded false-positive count on clean docs.
    */
  def c26BloomDecontam(spark: SparkSession, dir: String, gramK: Int = 13,
      minHits: Long = 1L, estItems: Long = 1L << 19,
      numBits: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.Bridge
    val bits = c26Sketch(c26Bench(spark, dir), gramK, estItems, numBits)
    val train = c26Train(spark, dir).localCheckpoint(false)
    val grams = Dedup.docShingleHashes(train, gramK)
      .select(col("doc_id"), explode(col("sh")).as("h"))
    val hit = Bridge.column(BloomFilterMightContain(
      Literal.create(bits,
        org.apache.spark.sql.types.BinaryType),
      Bridge.expression(grams("h"))))
    val perDoc = grams
      .select(col("doc_id"), when(hit, 1L).otherwise(0L).as("hit"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("hit")).as("n_hits"))
    train.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).cast("long")
          .as("contaminated"))
      .orderBy("doc_id")
  }

  /** c26 oracle side-tables: the per-doc hashed train grams and the
    * bloom verdict per distinct gram (computed with the SAME literal
    * sketch the query embeds).
    */
  def c26AuxGrams(spark: SparkSession, dir: String, gramK: Int = 13): DataFrame =
    Dedup.docShingleHashes(c26Train(spark, dir), gramK)
      .select(col("doc_id"), explode(col("sh")).as("h"))

  def c26AuxHits(spark: SparkSession, dir: String, gramK: Int = 13,
      estItems: Long = 1L << 19, numBits: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.Bridge
    val bits = c26Sketch(c26Bench(spark, dir), gramK, estItems, numBits)
    val hs = c26AuxGrams(spark, dir, gramK).select(col("h")).distinct()
    hs.select(col("h"),
      Bridge.column(BloomFilterMightContain(
        Literal.create(bits, org.apache.spark.sql.types.BinaryType),
        Bridge.expression(hs("h")))).cast("long").as("hit"))
  }

  // ---------------------------------------------------------------- c27

  /** c27: duplicate-cluster sampling weights — SOFT dedup (public
    * practice: the middle ground between keeping every near-dup copy
    * (over-trains the shared content) and d07/d12's hard one-per-
    * cluster drop (loses whatever differs between copies). Every
    * member of a near-dup cluster is downweighted to 1/|cluster|, so
    * the cluster's EXPECTED contribution to a weighted-sampling epoch
    * equals one document's — repetition-aware sampling, composable
    * with c02/c05's per-source rates by multiplication. Clusters are
    * d07's transitive resolution over d04's exact-Jaccard pairs;
    * unclustered docs are their own singleton (cluster_id = doc_id,
    * size 1, weight 1 — g04's coalesce convention).
    *
    * Scale: the cluster pass is d07's (O(collisions) pair edges,
    * O(log n) star-contraction rounds — never all-pairs); on top ride
    * ONE cluster-keyed count and one doc-keyed join back to the
    * corpus id set. Weights are one exact double division of two
    * integers rounded once, bit-identical in both engines.
    */
  def c27DupWeights(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    // localCheckpoint (lazy): `full` feeds BOTH the size aggregate and
    // the final join — unmaterialized, the d04 pair join + the star
    // contraction's label derivation execute once per consumer
    // (measured: 14.5 s vs d07's own 6.6 s at sf0.1)
    val labs = Dedup.d07DedupClusters(spark, dir, threshold)
    val full = Tables(spark, dir).documents.select("doc_id")
      .join(labs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .localCheckpoint(false)
    val sizes = full.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    full.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 6).as("weight"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- c28

  /** c28: CCNet-style perplexity bucketing — the public web-corpus
    * curation recipe (Wenzek et al. 2020): score every document under
    * a reference LM (t15's stupid-backoff scorer — mean per-bigram
    * log-prob; perplexity is exp(−score), same ordering), compute
    * per-LANGUAGE tercile cutoffs, and label each document
    * `head`/`middle`/`tail` — head is the most reference-like third,
    * the slice CCNet keeps outright, middle the re-usable reserve,
    * tail the discard candidate. Mixture builders consume the label
    * as a sampling stratum (c02/c05 compose by filtering on it).
    *
    * The cutoffs come from a DETERMINISTIC hash sample (x06's gate,
    * `pmod(xxhash64(doc_id), sampleMod) = 0`), not the full corpus —
    * CCNet's own recipe computes its percentiles on a sample, and it
    * is what keeps the operator scale-honest: the only order
    * statistic (an ntile window per language) runs over the SAMPLE,
    * whose size the `sampleMod` dial bounds, while the full corpus
    * only takes a per-row broadcast-join comparison against the two
    * cutoff values per language. Ties order by (mean_lp desc,
    * doc_id) — deterministic in both engines.
    *
    * Row contract: a document the LM cannot score (< 2 whitespace
    * tokens — no bigram) buckets as `unscored` (st14's cannot-vouch
    * rule); a language with no sampled scored document buckets as
    * `unsampled` (no cutoffs exist — route it explicitly rather than
    * defaulting into a quality tier). A doc AT a cutoff buckets into
    * the better tier (`>=` — cutoffs are the tier's minimum).
    */
  def c28CcnetBuckets(spark: SparkSession, dir: String,
      sampleMod: Long = 4L): DataFrame = {
    require(sampleMod > 0, s"sampleMod $sampleMod must be positive")
    val docs = Tables(spark, dir).documents
    // t15's exact scorer (decimal-summed 9-dp StrictMath terms): the
    // shared kernel keeps c28's scores bit-identical with t15's, so
    // the oracle replays them through the same ln-memo
    val scores = TextOps.t15LmScore(spark, dir)
    val bounds = c28BoundsOf(
      scores.join(docs.select(col("doc_id"), col("lang")), "doc_id"),
      sampleMod)
    // no forced broadcast on the cutoff side: its |langs|-row size is
    // a data property the plan can't prove (the sweep's rule), and AQE
    // broadcasts a few-row side at runtime anyway
    docs.select(col("doc_id"), col("lang"))
      .join(scores, Seq("doc_id"), "left")
      .join(bounds, Seq("lang"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("mean_lp"),
        c28Bucket(col("mean_lp"), col("b1"), col("b2")).as("bucket"))
      .orderBy("doc_id")
  }

  /** The per-language tercile cutoffs of a scored+lang'd frame's hash
    * sample — ONE definition shared by the batch report (c28) and the
    * persisted gate build ([[c28GateBuild]]), so their cutoff math
    * can never drift. Input: (doc_id, mean_lp, lang, …).
    */
  private[graft] def c28BoundsOf(scored: DataFrame,
      sampleMod: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("mean_lp").desc, col("doc_id"))
    scored
      .filter(pmod(xxhash64(col("doc_id")), lit(sampleMod)) === 0L)
      .withColumn("tile", ntile(3).over(w))
      .groupBy("lang")
      .agg(min(when(col("tile") === 1, col("mean_lp"))).as("b1"),
        min(when(col("tile") === 2, col("mean_lp"))).as("b2"))
  }

  /** The c28 bucket verdict of a score against a language's cutoffs —
    * ONE definition (c28 report + st29 gate): `unscored` for a
    * score-less doc (st14's cannot-vouch rule), `unsampled` for a
    * cutoff-less language, head/middle/tail by `>=` (cutoffs are the
    * tier's minimum; a null b2 falls through to tail).
    */
  private[graft] def c28Bucket(lp: Column, b1: Column,
      b2: Column): Column =
    when(lp.isNull, "unscored")
      .when(b1.isNull, "unsampled")
      .when(lp >= b1, "head")
      .when(lp >= b2, "middle")
      .otherwise("tail")

  /** Persist the c28 gate's train-once artifacts under `gatePath`:
    * the t15 LM tables (`<path>/lm` — [[TextOps.lmTrainTables]]) and
    * the per-language tercile cutoffs (`<path>/cutoffs`), computed by
    * scoring `docs` against the reference through the SAME persisted
    * tables the gate will read (build and gate provably share one
    * LM). The st14/st16/st17 shape: reference corpus and cutoff
    * sample are never re-scanned on the stream.
    */
  def c28GateBuild(docs: DataFrame, refDocs: DataFrame,
      gatePath: String, sampleMod: Long = 4L): Unit = {
    require(sampleMod > 0, s"sampleMod $sampleMod must be positive")
    TextOps.lmTrainTables(refDocs.select("doc_id", "text"), s"$gatePath/lm")
    val scores = TextOps.lmScoreIndexed(
      docs.select(col("doc_id"), col("text")), s"$gatePath/lm")
    c28BoundsOf(scores.join(docs.select(col("doc_id"), col("lang")),
        "doc_id"), sampleMod)
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$gatePath/cutoffs")
  }
}
