package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Text-analysis operators for LLM-training-data pipelines
  * (SURVEY.md §2.C, t01–t03). All are per-row, shuffle-free,
  * codegen'd builtins — they scale linearly with the corpus and
  * pushdown-project only the columns they touch.
  */
object TextOps {

  /** Whitespace tokens of `text` (single-space split — the corpus is
    * single-space delimited; empty fields count the same way in both
    * engines).
    */
  private def wsTokens: Column = split(col("text"), " ")

  /** BPE-ish lexer: words | digit runs | single non-alnum glyphs.
    * RE2-portable so the oracle can run the identical pattern.
    */
  private val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** t01: token counting — whitespace tokens + BPE-ish lexer tokens
    * per document. Narrow projection (doc_id, text) reaches the scan.
    */
  def t01TokenCount(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(
        col("doc_id"),
        size(wsTokens).cast(LongType).as("n_tokens_ws"),
        size(regexp_extract_all(col("text"), lit(BpeishPattern), lit(0)))
          .cast(LongType).as("n_tokens_bpe"))
      .orderBy("doc_id")
  }

  /** t02: quality scoring — length, token stats, stopword ratio, and a
    * composite quality score. All arithmetic is exact-integer until the
    * final per-row division, so results are bit-identical across
    * engines and partitionings.
    */
  def t02QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val toks = wsTokens
    val nToks = size(toks).cast(LongType)
    // exact identity: sum of token lengths = total chars − separators
    // (holds for any single-char-delimited split, empties included) —
    // replaces an interpreted HOF aggregate with codegen'd arithmetic
    val sumLen = length(col("text")).cast(LongType) - (nToks - lit(1L))
    val nStop = graft.functions.F.markerCount(col("text"), "the,a")
    t.documents
      .select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        nToks.as("n_tokens"),
        (sumLen.cast("double") / nToks).as("avg_token_len"),
        (nStop.cast("double") / nToks).as("stopword_ratio"))
      .withColumn("quality_score",
        when(col("n_tokens") < 8, 0.0)
          .otherwise(round(lit(1.0) - col("stopword_ratio"), 4)))
      .orderBy("doc_id")
  }

  /** t02's composite score alone, over any (doc_id, text) frame — the
    * reusable form d12's keep-best resolution ranks candidates with.
    * Same arithmetic order as [[t02QualityScore]] (divide, subtract,
    * round) so the two agree bit-for-bit and one oracle SQL fragment
    * replays both.
    */
  def qualityScoreOver(docs: DataFrame): DataFrame = {
    val nToks = size(wsTokens).cast(LongType)
    val nStop = graft.functions.F.markerCount(col("text"), "the,a")
    docs.select(col("doc_id"),
      when(nToks < 8, 0.0)
        .otherwise(round(lit(1.0) - nStop.cast("double") / nToks, 4))
        .as("quality_score"))
  }

  /** Characteristic high-frequency words per language (public stopword
    * lists). Used by the t03 scorer; content-free corpora simply score
    * 0 everywhere and fall back to 'und' (undetermined).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "las", "que", "es", "una"),
    "fr" -> Seq("le", "la", "les", "est", "une", "dans", "pas"),
    "zh" -> Seq("的", "是", "不", "在", "了", "我", "有"))

  /** Marker-hit score for one language over the lowercased text
    * (native kernel — the HOF filter/isin form is interpreted).
    */
  private def langScore(lowered: Column, markers: Seq[String]): Column =
    graft.functions.F.markerCount(lowered, markers.mkString(","))

  /** t03: language identification — count characteristic-marker hits
    * per language, pick the argmax (ties and zero-score rows → 'und').
    * Pure codegen'd array functions; one pass over the tokens per
    * language profile. Accuracy is spec-tested on real multilingual
    * samples (the synthetic corpus is content-uniform, TESTDATA).
    */
  def t03LangId(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    langIdOver(t.documents).orderBy("doc_id")
  }

  /** t04: document fingerprinting — 64-bit rolling hash (Rabin–Karp
    * over UTF-8 bytes) via the native codegen expression
    * [[graft.functions.expr.Fingerprint64]]. Order-sensitive: content
    * permutations fingerprint differently. Per-row, shuffle-free.
    */
  def t04Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), graft.functions.F.fingerprint64(col("text")).as("fp64"))
      .orderBy("doc_id")
  }

  /** t05: corpus vocabulary — token frequencies, top-k. The classic
    * corpus-analysis primitive (vocab coverage, stopword discovery,
    * tokenizer sanity). One explode + one groupBy shuffle with map-side
    * partial counts; the top-k is TakeOrdered, never a global sort.
    * Ties break on the token for a deterministic cut.
    */
  def t05VocabTopK(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
  }

  /** t06: text normalization — the pre-tokenization cleanup pass:
    * lowercase, collapse whitespace runs, trim. Pure per-row
    * projection (shuffle-free at any scale); regex restricted to
    * Java↔RE2-identical constructs so the oracle replays it.
    */
  def t06Normalize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    t.documents
      .select(col("doc_id"), norm.as("norm_text"),
        length(norm).cast("long").as("n_chars_norm"))
      .orderBy("doc_id")
  }

  /** t07: intra-document repetition scoring — the Gopher-family
    * quality rule that length/stopword ratios (t02) can't see: a
    * boilerplate or looping document repeats itself. Three signals per
    * document: duplicate-token fraction (1 − distinct/total), the most
    * frequent token's share, and the most frequent word-2-gram's
    * share. All multiplicities come from the one-pass e13 kernel, so
    * the whole operator is a shuffle-free per-row projection (the
    * explode formulation it replaced pushed ~doc_len rows per
    * document through TWO doc-keyed shuffles); ratios are
    * exact-integer divisions rounded once, so the oracle replays them
    * bit-exactly.
    */
  def t07Repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOver(Tables(spark, dir).documents)

  /** t07 over any (doc_id, text) DataFrame (spec + pipeline reuse). */
  def repetitionOver(docs: DataFrame): DataFrame = {
    val st = graft.functions.F.repetitionStats(col("text"))
    docs.select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        element_at(col("st"), 1).as("n_tokens"),
        round(lit(1.0) -
          element_at(col("st"), 2).cast("double") / element_at(col("st"), 1), 4)
          .as("dup_tok_ratio"),
        round(element_at(col("st"), 3).cast("double") / element_at(col("st"), 1), 4)
          .as("top_tok_ratio"),
        // 0-gram docs: try_divide(0, 0) → null, coalesced to 0.0 — the
        // same value the exploded form's left join produced (a plain
        // division is an ANSI divide-by-zero error here)
        round(coalesce(
          try_divide(element_at(col("st"), 4).cast("double"),
            element_at(col("st"), 5)),
          lit(0.0)), 4).as("top_2gram_ratio"))
      .orderBy("doc_id")
  }

  /** The explode + doc-keyed aggregation formulation of t07 — the
    * readable reference implementation the e13 kernel is fuzz-checked
    * against (NativeKernelProps); not on any hot path.
    */
  def repetitionOverExploded(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(wsTokens).as(Seq("pos", "tok")))
    // per-token and per-2gram multiplicities, reduced per doc
    val tokCounts = toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_tok"))
    // single-token docs have no 2-grams (guard: sequence(0, n-2) would
    // otherwise run DESCENDING for n=1 and fabricate windows)
    val grams = docs.filter(size(wsTokens) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(wsTokens) - 2),
          i => concat_ws(" ", slice(wsTokens, i + lit(1), lit(2))))).as("g"))
    val gramCounts = grams.groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top_gram"), sum(col("c")).as("n_grams"))
    tokCounts.join(gramCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("dup_tok_ratio"),
        round(col("top_tok").cast("double") / col("n_tokens"), 4)
          .as("top_tok_ratio"),
        round(coalesce(col("top_gram").cast("double") / col("n_grams"),
          lit(0.0)), 4).as("top_2gram_ratio"))
      .orderBy("doc_id")
  }

  /** Demo subword vocabulary — whole words plus BPE-flavored merges
    * ("customer" → cust+om+er, "window" → wind+ow, "query" → qu+ery)
    * and a few single-char pieces; anything else falls back to
    * one-char UNK tokens. A real deployment substitutes its model
    * tokenizer's vocab; the apply rule (greedy longest-match) is the
    * standard public WordPiece/BPE inference algorithm.
    */
  val SubwordVocab: Seq[String] = Seq(
    " ", "table", "value", "part", "scan", "fast", "slow", "key", "row",
    "agg", "the", "line", "sort", "order", "data", "col", "umn", "qu",
    "ery", "join", "str", "eam", "gr", "oup", "wind", "ow", "merge",
    "batch", "spark", "hash", "small", "big", "cust", "om", "er", "at",
    "an", "in", "on", "a", "e", "s", "t",
    // punctuation pieces — incl. the comma, which the U+001F vocab wire
    // encoding exists to carry (a CSV vocab cannot express it)
    ",", ", ", ".")

  /** Subword stats column: [n_subwords, n_unk] via the native e11
    * kernel (one codegen'd pass; the vocab trie builds once per
    * executor, not per row).
    */
  def subwordStatsCol(text: Column, vocab: Seq[String] = SubwordVocab): Column =
    graft.functions.F.subwordStats(text, graft.functions.F.joinVocab(vocab))

  /** Piece-id sequence column (e11b): array<int> of vocab indices,
    * UNK → −1 — the training-ready form of [[subwordStatsCol]].
    */
  def subwordIdsCol(text: Column, vocab: Seq[String] = SubwordVocab): Column =
    graft.functions.F.subwordIds(text, graft.functions.F.joinVocab(vocab))

  /** Cost-optimal piece-id sequence column (e16): the Viterbi lattice
    * decode against the same vocab (piece cost 1, UNK 3).
    */
  def viterbiIdsCol(text: Column, vocab: Seq[String] = SubwordVocab): Column =
    graft.functions.F.viterbiIds(text, graft.functions.F.joinVocab(vocab))

  /** t21: Viterbi lattice tokenization — the unigram-LM DECODE rule
    * (SentencePiece's inference step, public algorithm) with integer
    * costs: minimize total segmentation cost (piece 1, UNK char 3 —
    * the minimal-fertility objective; a trained LM supplies real
    * costs at scale, the lattice DP is identical). Globally OPTIMAL
    * where t08/t09's greedy longest-match is not: an early long match
    * can force UNKs later ("xy" then UNK z, where x + yz segments
    * clean) — the corpus-wide law `n_pieces ≤ n_pieces_greedy` is
    * asserted by the spec AND replayed in the oracle.
    *
    * Per-row, shuffle-free, one codegen'd e16 kernel pass
    * (O(n·maxPieceLen) forward DP + backtrack, two int arrays); the
    * greedy column rides the same scan for the comparison.
    */
  def t21ViterbiTokenize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"),
        viterbiIdsCol(col("text")).as("ids"),
        // greedy count via the STATS kernel — same count, no array
        // construction (the c12 kernels-cheap-arrays-not discipline)
        element_at(subwordStatsCol(col("text")), 1).as("n_pieces_greedy"))
      .select(col("doc_id"),
        size(col("ids")).cast(LongType).as("n_pieces"),
        (size(col("ids")) - size(array_remove(col("ids"), -1)))
          .cast(LongType).as("n_unk"),
        col("n_pieces_greedy"),
        concat_ws(",", col("ids").cast("array<string>")).as("ids_csv"))
      .orderBy("doc_id")
  }

  /** t08: tokenizer-apply — greedy longest-match subword segmentation
    * of every document against the (broadcast-literal) vocab, emitting
    * model-tokenizer token counts and the UNK fallback count. Per-row,
    * shuffle-free, codegen'd; this is the token counter a mixture
    * planner should budget with (c06), since whitespace counts ignore
    * per-source subword fertility.
    */
  def t08SubwordTokenize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), subwordStatsCol(col("text")).as("st"))
      .select(col("doc_id"),
        element_at(col("st"), 1).as("n_subwords"),
        element_at(col("st"), 2).as("n_unk"))
      .orderBy("doc_id")
  }

  /** t09: tokenize-materialize — the actual piece-id sequence per
    * document (e11b kernel), the step that turns mixture planning
    * (t08/c06 count budgets) into training-ready output. Per-row,
    * shuffle-free, codegen'd. The driver entry exposes the sequence as
    * a CSV string beside its length so the DuckDB oracle (a recursive
    * CTE replaying the same greedy rule over the same vocab constant)
    * can hash-compare it; API users take [[subwordIdsCol]] directly
    * for the array<int> column.
    */
  def t09SubwordIds(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), subwordIdsCol(col("text")).as("ids"))
      .select(col("doc_id"),
        size(col("ids")).cast(LongType).as("n_pieces"),
        concat_ws(",", col("ids").cast("array<string>")).as("ids_csv"))
      .orderBy("doc_id")
  }

  /** t10: corpus heavy hitters — every token whose frequency exceeds
    * `support` of all tokens, EXACTLY, via the standard two-pass
    * scale pattern: a one-pass Karp–Papadimitriou–Shenker candidate
    * sweep (`stat.freqItems` — guaranteed superset of the true heavy
    * hitters, ≤ 1/support candidates) followed by an exact count of
    * candidates only. Where t05's vocabulary build shuffles every
    * distinct token, this shuffles at most 1/support tokens'
    * occurrences — the right shape when the vocabulary is billions of
    * tokens but the heavy tail is what you're after. The second pass
    * makes the output exact (sketch false positives are filtered), so
    * the result is deterministic and oracle-checkable.
    */
  def t10HeavyHitters(spark: SparkSession, dir: String,
      support: Double = 0.002): DataFrame = {
    val t = Tables(spark, dir)
    val toks = t.documents
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    // pass 1: KPS candidates (driver-side array, ≤ 1/support entries)
    val candidates = toks.stat.freqItems(Seq("token"), support)
      .head().getSeq[String](0)
    // pass 2: exact counts for candidates only; threshold on the
    // exact total. count(*) over the unfiltered scan is a cheap
    // map-side-combined pass (no explode row survives to a shuffle).
    val total = toks.count()
    val threshold = (support * total).toLong
    toks.filter(col("token").isin(candidates: _*))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
      .orderBy(col("n").desc, col("token"))
  }

  /** Left-to-right greedy application of one BPE merge to a symbol
    * sequence — "aaa" under (a,a) becomes ("aa", "a"), the standard
    * public rule (Sennrich et al. 2016). Runs on executors over the
    * bounded words table.
    */
  private[operators] def applyMerge(syms: Seq[String], l: String,
      r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** t11: distributed BPE vocabulary TRAINING — the learn side of the
    * tokenizer family (t08/t09 only APPLY a vocab). Standard byte-pair
    * encoding over word frequencies (Sennrich et al. 2016, public):
    *
    *   1. ONE corpus-scale pass: whitespace tokens → word-frequency
    *      table (one shuffle with map-side partials), capped to the
    *      `maxWords` most frequent words (TakeOrdered, the standard
    *      practical cap) — everything after runs on this BOUNDED
    *      distinct-words table, never the corpus;
    *   2. each word starts as its character sequence;
    *   3. per merge round: adjacent-pair frequencies (flatMap + one
    *      small groupBy), the argmax pair by (count desc, left,
    *      right) — ONE row to the driver per round, d07's fixpoint
    *      discipline — then a left-to-right greedy merge applied to
    *      every word, localCheckpoint'd eagerly so round N's lineage
    *      never replays rounds 1..N−1. Early stop when no pair
    *      repeats.
    *
    * The words table is Heaps-law bounded (millions of rows at 100 TB
    * while the corpus is billions of documents), so typed flatMap/map
    * stages here are NOT the per-row-UDF hot-path anti-pattern — the
    * corpus itself is touched exactly once, by a codegen'd
    * explode+count. Output: (rank, left, right, merged, cnt) — the
    * ordered merge table a tokenizer ships; [[bpeLearnedVocab]] turns
    * it into a vocab for the e11/e11b apply kernels. Deterministic at
    * any partitioning: integer counts + a total argmax order.
    */
  /** The corpus-scale pass shared by training and vocab assembly: the
    * `maxWords` most frequent words with their counts (one shuffle,
    * TakeOrdered cut on (freq desc, word)).
    */
  private def cappedWords(docs: DataFrame, maxWords: Int): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(maxWords)

  /** A word's initial BPE symbols: one per CODE POINT (not UTF-16
    * unit — splitting a surrogate pair would make two broken
    * half-character symbols, and the DuckDB oracle, which iterates
    * code points, could never reproduce them). Shared by the trainer,
    * the vocab assembly, and the spec's plain-Scala reference.
    */
  private[operators] def charSyms(w: String): Seq[String] =
    w.codePoints().toArray.toSeq
      .map(cp => new String(Character.toChars(cp)))

  def t11BpeTrainOver(docs: DataFrame, numMerges: Int = 24,
      maxWords: Int = 50000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE distributed pass — the corpus-scale explode + groupBy +
    // TakeOrdered — then the merge loop runs DRIVER-SIDE over the
    // collected ≤ maxWords table. The previous shape scheduled two
    // Spark jobs per merge rank (argmax + checkpointed rewrite): fine
    // at the demo's 24 merges, ~64k driver-bottlenecked jobs at a real
    // 32k-merge vocab. The capped word table is a bounded artifact
    // (IVF's centroid-load class); looping over it is not distributed
    // work, and the loop is what a single-node BPE trainer does anyway.
    val freqs = cappedWords(docs, maxWords).as[(String, Long)].collect()
    val wordFreq = freqs.map(_._2)
    val wordSyms = freqs.map { case (w, _) =>
      scala.collection.mutable.ArrayBuffer.from(charSyms(w)) }
    // pair counts maintained incrementally: only words CONTAINING the
    // merged pair change between ranks, so each rank re-counts the
    // touched words, not the table. Contributions are removed and
    // re-added wholesale per word, which keeps the overlapping-repeat
    // accounting ("aaaa" holds (a,a) three sliding times but merges
    // leftmost-greedy to "aa aa") exact by construction.
    val counts = scala.collection.mutable.HashMap
      .empty[(String, String), Long].withDefaultValue(0L)
    val touch = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def contribute(i: Int, sign: Long): Unit = {
      val syms = wordSyms(i)
      val f = wordFreq(i)
      var j = 0
      while (j + 1 < syms.length) {
        val p = (syms(j), syms(j + 1))
        val c = counts(p) + sign * f
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0L)
          touch.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty[Int]) += i
        j += 1
      }
    }
    wordSyms.indices.foreach(contribute(_, 1L))
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < numMerges && !done) {
      if (counts.isEmpty) done = true
      else {
        // same total order as the distributed argmax had: max count,
        // then (left, right) lexicographic — determinism is free here
        // (no partitioning in sight) but the ORDER is part of the
        // operator's contract with the spec's independent reference
        val ((l, r), cnt) =
          counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (cnt < 2L) done = true
        else {
          merges += ((rank, l, r, l + r, cnt))
          // entries for words whose (l,r) was merged away by an earlier
          // rank are stale: remove+reapply+re-add is the identity for
          // them, so staleness costs a word re-count, never correctness
          touch.get((l, r)).foreach(_.toArray.foreach { i =>
            contribute(i, -1L)
            wordSyms(i) = scala.collection.mutable.ArrayBuffer
              .from(applyMerge(wordSyms(i).toSeq, l, r))
            contribute(i, 1L)
          })
          touch.remove((l, r))
          rank += 1L
        }
      }
    }
    merges.toSeq
      .toDF("rank", "left", "right", "merged", "cnt")
      .orderBy("rank")
  }

  /** t11 driver query: train on the corpus documents. */
  def t11BpeTrain(spark: SparkSession, dir: String,
      numMerges: Int = 24): DataFrame =
    t11BpeTrainOver(Tables(spark, dir).documents, numMerges)

  /** The learned-vocab form of [[t11BpeTrainOver]]'s merge table for
    * the greedy apply kernels (e11/e11b): every single character seen
    * in the capped words table (so no in-vocab word can produce UNK),
    * the space separator, and each merged piece. Bounded by
    * |alphabet| + numMerges + 1 — a driver-side constant, same class
    * as IVF's centroid load.
    */
  def bpeLearnedVocab(docs: DataFrame, numMerges: Int = 24,
      maxWords: Int = 50000): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merged = t11BpeTrainOver(docs, numMerges, maxWords)
      .select("merged").as[String].collect().toSeq
    val chars = cappedWords(docs, maxWords)
      .as[(String, Long)]
      .flatMap { case (w, _) => charSyms(w) }
      .distinct().collect().toSeq.sorted
    (chars :+ " ") ++ merged
  }

  // ---------------------------------------------------------------- t23

  /** t23 dials, shared by the trainer, the spec's plain-Scala replay,
    * and the oracle SQL generator so they cannot drift.
    */
  private[graft] object Unigram {
    /** Max seed-piece length — also the oracle DP's rolling-window
      * width (a longer piece would silently decode a worse lattice
      * there, so the trainer enforces it by construction).
      */
    val MaxPieceLen = 4
    /** Seed inventory size (top substrings by freq-weighted count). */
    val SeedN = 64
    /** EM rounds (hard/Viterbi EM — deterministic, replayable). */
    val Rounds = 3
    /** Multi-char pieces surviving the loss prune. */
    val KeepMulti = 16
    /** UNK-character cost, 1e-9 nats — worse than any inventory piece
      * (a seed piece's cost is at most ln(total) ≈ a few tens of nats
      * only for vanishing probabilities; 30 nats ≈ p = 1e-13).
      */
    val UnkCostE9 = 30000000000L
  }

  /** −ln(cnt/total) in 1e-9-nat fixed point: StrictMath.log (Spark's
    * own log) rounded HALF_UP at 9 dp — c14's decimal discipline, so
    * every downstream sum is an exact integer fold, partition-order
    * independent, and the DuckDB oracle consumes the value from a
    * memo side-table instead of trusting libm to agree on the last
    * ulp.
    */
  private[graft] def lnCostE9(cnt: Long, total: Long): Long =
    (BigDecimal(-StrictMath.log(cnt.toDouble / total.toDouble))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      * BigDecimal(1000000000L)).toLongExact

  /** Integer-cost Viterbi over one word — the e16 lattice rule
    * (minimal total cost; at equal cost the LONGER final piece wins;
    * an uncovered char consumes as UNK at [[Unigram.UnkCostE9]]).
    * `exclude` drops one piece from the inventory — the loss prune's
    * "segment p without p" probe. Returns (pieces in order, UNKs
    * dropped; total cost including UNK charges).
    */
  private[graft] def segmentWord(w: String,
      cost: scala.collection.Map[String, Long],
      maxLen: Int = Unigram.MaxPieceLen,
      unkCost: Long = Unigram.UnkCostE9,
      exclude: String = null): (List[String], Long) = {
    val n = w.length
    val best = new Array[Long](n + 1)
    val plen = new Array[Int](n + 1) // chosen len; 0 marks UNK
    var i = 1
    while (i <= n) {
      best(i) = best(i - 1) + unkCost
      plen(i) = 0
      var l = 1
      val cap = math.min(maxLen, i)
      while (l <= cap) {
        val p = w.substring(i - l, i)
        if (p != exclude) {
          val c = cost.getOrElse(p, Long.MinValue)
          if (c != Long.MinValue) {
            val cand = best(i - l) + c
            if (cand < best(i) || (cand == best(i) && l > plen(i))) {
              best(i) = cand; plen(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    var pos = n
    var acc: List[String] = Nil
    while (pos > 0) {
      if (plen(pos) == 0) pos -= 1
      else { acc = w.substring(pos - plen(pos), pos) :: acc; pos -= plen(pos) }
    }
    (acc, best(n))
  }

  /** Prune loss cnt × Δcost, saturated at ±Long.MaxValue: at corpus
    * scales where cnt reaches 1e12+, the raw product overflows — a
    * silent Scala wrap would flip keep/prune verdicts while the
    * oracle's checked HUGEINT multiply errors, a guaranteed
    * divergence. Saturation keeps the prune ORDER correct (saturated
    * ties fall to the (cnt, piece) tie-break) and both engines agree.
    */
  private[graft] def clampedLoss(cnt: Long, delta: Long): Long =
    (BigInt(cnt) * BigInt(delta))
      .min(BigInt(Long.MaxValue)).max(BigInt(-Long.MaxValue)).toLong

  /** The t23 training transcript: final inventory rows plus the
    * ln-memo the oracle replay consumes (every (cnt, total) → cost
    * pair the trainer evaluated, init and all rounds).
    */
  private[graft] final case class UnigramTrained(
      rows: Seq[(String, Long, Long, Long, Long)], // piece,cnt,cost,loss,kept
      memo: Seq[(Long, Long, Long)]) // cnt, total, cost_e9

  /** t23: unigram-LM tokenizer TRAINING — the SentencePiece trainer's
    * shape (Kudo 2018, public), simplified to hard (Viterbi) EM so
    * every step is exact-integer deterministic and SQL-replayable:
    *
    *   1. ONE corpus-scale pass: the capped word-frequency table
    *      (t11's Heaps-bounded discipline) — everything after runs on
    *      this BOUNDED table, never the corpus;
    *   2. seed inventory: freq-weighted substring occurrences (length
    *      ≤ [[Unigram.MaxPieceLen]]), top [[Unigram.SeedN]] by
    *      (count desc, piece); init costs −ln(cnt/Σcnt) in 1e-9-nat
    *      fixed point;
    *   3. EM rounds, ONE chained action each (c16's pattern): E-step
    *      Viterbi-segments every word under the broadcast cost table
    *      (typed flatMap over the bounded word table — t11's
    *      justification: the corpus is touched once, by codegen'd
    *      explode+count) and aggregates per-piece counts (≤ |inventory|
    *      rows to the driver); M-step re-costs −ln(cnt/Σcnt); pieces
    *      with zero count drop (their chars fall back to UNK);
    *   4. loss prune: a multi-char piece's loss = cnt × (cost of its
    *      best segmentation WITHOUT itself − its own cost) — the
    *      corpus code-length increase if removed; keep the top
    *      [[Unigram.KeepMulti]] by (loss desc, cnt desc, piece) plus
    *      every surviving single char (coverage).
    *
    * The trained (piece, cost) rows feed the e16 cost-weighted decode
    * kernel (`viterbi_cost_ids`) — completing BPE-train (t11) +
    * lattice-decode (t21) into a full tokenizer axis. Scale shape:
    * the word table is bounded at any corpus size; each EM round
    * shuffles only (piece, partial-count) pairs with map-side combine.
    */
  def t23TrainCore(docs: DataFrame, maxWords: Int = 50000): UnigramTrained = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = cappedWords(docs, maxWords).as[(String, Long)]
      .localCheckpoint(false)
    // seed: freq-weighted substring occurrences, one chained action
    val seedCounts: Seq[(String, Long)] = words
      .flatMap { case (w, f) =>
        for {
          l <- 1 to math.min(Unigram.MaxPieceLen, w.length)
          s <- 0 to w.length - l
        } yield (w.substring(s, s + l), f)
      }
      .groupBy("_1").agg(sum("_2").as("cnt"))
      .orderBy(col("cnt").desc, col("_1"))
      .limit(Unigram.SeedN)
      .as[(String, Long)].collect().toSeq
    // ln-memo: one entry per distinct (cnt, total) the trainer sees —
    // the ONLY transcendental boundary; everything else is integers
    val memo = scala.collection.mutable.LinkedHashMap.empty[(Long, Long), Long]
    def costsOf(counts: Seq[(String, Long)]): Map[String, Long] = {
      val total = counts.map(_._2).sum
      counts.map { case (p, c) =>
        p -> memo.getOrElseUpdate((c, total), lnCostE9(c, total))
      }.toMap
    }
    var inv: Map[String, Long] = costsOf(seedCounts)
    var lastCounts: Seq[(String, Long)] = seedCounts
    for (_ <- 1 to Unigram.Rounds) {
      val bc = spark.sparkContext.broadcast(inv)
      lastCounts = words
        .flatMap { case (w, f) => segmentWord(w, bc.value)._1.map((_, f)) }
        .groupBy("_1").agg(sum("_2").as("cnt"))
        .as[(String, Long)].collect().toSeq
        .sortBy(_._1) // determinism of the memo/emission order
      inv = costsOf(lastCounts)
    }
    // loss prune over the final BOUNDED inventory (driver-side by the
    // same bounded-artifact argument as the IVF centroid load)
    val chars = lastCounts.filter(_._1.length == 1)
    val multi = lastCounts.filter(_._1.length > 1)
    val losses = multi.map { case (p, c) =>
      val alt = segmentWord(p, inv, exclude = p)._2
      (p, c, inv(p), clampedLoss(c, alt - inv(p)))
    }
    val kept = losses
      .sortBy { case (p, c, _, loss) => (-loss, -c, p) }
      .take(Unigram.KeepMulti).map(_._1).toSet
    val rows =
      chars.map { case (p, c) => (p, c, inv(p), -1L, 1L) } ++
        losses.map { case (p, c, ce, loss) =>
          (p, c, ce, loss, if (kept(p)) 1L else 0L)
        }
    UnigramTrained(rows.sortBy(_._1),
      memo.map { case ((c, t), v) => (c, t, v) }.toSeq)
  }

  /** One training run per sf dir: a verify run consumes the trainer
    * from THREE places (the ln-memo side-table, the driver query, the
    * trained decoder) — without a cache each re-runs the full EM.
    * The gate's testdata dirs are immutable, so dir is a sound key.
    */
  private val unigramCache =
    new java.util.concurrent.ConcurrentHashMap[String, UnigramTrained]()

  private[graft] def t23Trained(spark: SparkSession,
      dir: String): UnigramTrained =
    unigramCache.computeIfAbsent(dir,
      d => t23TrainCore(Tables(spark, d).documents))

  /** t23 driver query: the trained inventory — every final-round
    * piece with its count, 1e-9-nat cost, prune loss (−1 for the
    * never-pruned single chars), and the keep verdict.
    */
  def t23UnigramTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t23Trained(spark, dir).rows
      .toDF("piece", "cnt", "cost_e9", "loss_e9", "kept")
      .orderBy("piece")
  }

  /** t23's ln-memo side-table (oracle): (cnt, total) → cost_e9 for
    * every ratio the trainer evaluated. The oracle re-derives all
    * counts in SQL and JOINS costs from here — a count divergence
    * surfaces as a missing memo row, never a silent drift.
    */
  def t23AuxLnMemo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t23Trained(spark, dir).memo.toDF("cnt", "total", "cost_e9")
  }

  /** The trained tokenizer in e16 wire form: (vocab pieces, cost
    * string with UNK first) for [[graft.functions.F.viterbiCostIds]]
    * — kept pieces only, piece-sorted so ids are stable.
    */
  def t23TrainedDecoder(spark: SparkSession,
      dir: String): (Seq[String], String) = {
    val kept = t23Trained(spark, dir).rows.filter(_._5 == 1L)
    val pieces = kept.map(_._1)
    val costs = Unigram.UnkCostE9 +: kept.map(_._3)
    (pieces, costs.mkString(","))
  }

  // ---------------------------------------------------------------- t12

  /** t12: bigram-novelty quality signal — for each document, the
    * fraction of its word-bigram occurrences that are UNIQUE to it
    * (corpus document frequency 1). High novelty means the document's
    * local word transitions appear nowhere else: characteristic of
    * garbled text, OCR noise, and machine-generated filler — the
    * signal an n-gram LM quality filter thresholds on, kept in exact
    * integer arithmetic (a real LM's log-probs are float folds no two
    * engines reproduce bit-for-bit).
    *
    * Plumbing is the e12 positional-shingle kernel at k=2: every
    * shuffle carries 8-byte bigram hashes, never bigram strings. Three
    * key-partitioned shuffles — (doc,bigram) occurrence counts, bigram
    * document frequency, per-doc rollup — each linear in corpus
    * tokens; the df join is co-partitioned with the groupBy that feeds
    * it. The oracle replays the pipeline on bigram STRINGS, so a
    * hash-collision shortcut could not silently pass.
    */
  def t12BigramNovelty(spark: SparkSession, dir: String): DataFrame =
    bigramNoveltyOver(Tables(spark, dir).documents).orderBy("doc_id")

  def bigramNoveltyOver(docs: DataFrame): DataFrame = {
    // localCheckpoint: occ feeds BOTH the df rollup and the join's
    // probe side — materialize the slim (doc_id, bh, occ) rows once
    // instead of re-shingling the corpus per consumer (c03's pattern;
    // without it the plan shows two full parquet scans)
    val occ = docs
      .filter(size(wsTokens) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.F.shinglePosHashes64(col("text"), 2)).as("bh"))
      .groupBy("doc_id", "bh")
      .agg(count(lit(1)).as("occ"))
      .localCheckpoint(false)
    val dfreq = occ.groupBy("bh").agg(count(lit(1)).as("df"))
    occ.join(dfreq, Seq("bh"))
      .groupBy("doc_id")
      .agg(sum(col("occ")).as("n_bigrams"),
        sum(when(col("df") === 1, col("occ")).otherwise(lit(0L))).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_bigrams"), 4))
  }

  // ---------------------------------------------------------------- t13

  /** t13: cross-source vocabulary overlap — pairwise Jaccard of each
    * source's top-`k` token vocabulary, the mixture diagnostic that
    * says which sources are lexically redundant (near-1 overlap →
    * temperature/epoch planning treats them as one pool) and which
    * bring genuinely new vocabulary. One (source, token) count
    * shuffle over the corpus; everything after operates on |sources|·k
    * rows — the per-source top-k (deterministic (count desc, token)
    * total order), the token self-join, and the pair rollup are all
    * bounded regardless of corpus size. Pairs sharing zero tokens are
    * absent (inner join), which the oracle mirrors.
    */
  def t13SourceOverlap(spark: SparkSession, dir: String,
      k: Int = 50): DataFrame = {
    val docs = Tables(spark, dir).documents
    val counts = docs
      .select(col("source"), explode(wsTokens).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("cnt").desc, col("tok"))
    val topk = counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("source", "tok")
    val sizes = topk.groupBy("source").agg(count(lit(1)).as("sz"))
    topk.as("a")
      .join(topk.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.as("sa"), col("source_a") === col("sa.source"))
      .join(sizes.as("sb"), col("source_b") === col("sb.source"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("n_shared")), 4).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  // ---------------------------------------------------------------- t14

  /** t14: per-document distinctive keywords — top-`k` tokens by
    * tf/df ratio, the TF-IDF ranking in its cross-engine-exact form.
    * Because the corpus size N is constant across a ranking,
    * tf·idf(term) orderings under the linear idf N/df reduce to
    * tf/df — one IEEE double division of two exact integers, which is
    * correctly rounded by definition and therefore bit-identical in
    * Spark and DuckDB (a log-idf would rank identically per term-pair
    * only without the tf factor, and ln is not exactly portable).
    *
    * Shape at scale: one (doc, token) count shuffle (map-side
    * combined), a df rollup over the (doc, token) pairs (never a
    * second corpus scan), a token-keyed join co-partitioned with the
    * rollup, and a doc-keyed window for the per-doc top-k — every
    * stage keyed, nothing global. Ties break (ratio desc, token asc)
    * for a deterministic cut.
    */
  def t14TfidfKeywords(spark: SparkSession, dir: String,
      k: Int = 3): DataFrame =
    tfidfKeywordsOver(Tables(spark, dir).documents, k)
      .orderBy("doc_id", "rk")

  /** t14 over any (doc_id, text) frame. */
  def tfidfKeywordsOver(docs: DataFrame, k: Int): DataFrame = {
    // localCheckpoint: tf feeds BOTH the df rollup and the join probe
    // side (t12's pattern — without it the corpus tokenizes twice)
    val tf = docs
      .select(col("doc_id"), explode(wsTokens).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy((col("tf").cast("double") / col("df")).desc, col("token"))
    tf.join(dfreq, Seq("token"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("doc_id", "token", "tf", "df", "rk")
  }

  // ---------------------------------------------------------------- t15

  /** t15: n-gram language-model quality scoring — the CCNet-style
    * filter (public: CCNet scores CommonCrawl with a reference-domain
    * KenLM and keeps the low-perplexity tail): train a BIGRAM model
    * with stupid backoff (Brants et al., public — no discounting, the
    * web-scale standard) on a reference corpus, score every raw doc
    * by mean per-bigram log-probability (high = reference-like;
    * perplexity is exp(−score), same ranking):
    *
    *   p(w2|w1) = c(w1 w2)/c(w1 ·)   if the bigram was seen
    *            = 0.4 · c(w2)/T      else if w2 was seen (backoff)
    *            = 0.4 · 1/T          else (OOV)
    *
    * Where c14 asks "target-like vs raw-like" (a two-corpus ratio),
    * t15 asks "how fluent under the reference LM" — the two public
    * quality axes. Determinism: c14's discipline — StrictMath ln on
    * identical doubles, per-doc Σ in fixed-point DECIMAL on
    * 9-dp-rounded terms, one final exact division.
    *
    * Shape at scale: LM tables are vocab-bounded (Heaps' law) keyed
    * aggregations built once from the reference; scoring is three
    * keyed joins (bigram, prefix, unigram) against the raw corpus's
    * exploded bigrams and one doc-keyed rollup — every stage keyed,
    * nothing global, no UDFs (arrays_zip/slice are codegen).
    */
  def t15LmScore(spark: SparkSession, dir: String,
      refSource: String = ""): DataFrame = {
    val docs = Tables(spark, dir).documents
    val ref = if (refSource.nonEmpty)
      docs.filter(col("source") === refSource)
        .select(col("doc_id"), col("text"))
    else lmDemoRef(docs)
    lmScoreOver(docs.select(col("doc_id"), col("text")), ref)
      .orderBy("doc_id")
  }

  /** The t15 demo reference slice (the alphabetically-first source) —
    * shared by the driver query and the oracle ln-memo so they
    * provably train on the same corpus.
    */
  private def lmDemoRef(docs: DataFrame): DataFrame = {
    val ref = docs.select(min(col("source"))).collect().head.getString(0)
    docs.filter(col("source") === ref).select(col("doc_id"), col("text"))
  }

  /** The reference LM tables of a (doc_id, text) frame — (bigram
    * conditionals, prefix totals, unigram counts, total bigrams) —
    * shared by the batch scorer, the persisted trainer, and the
    * oracle ln-memo so their count tables can never drift.
    */
  private def lmTables(ref: DataFrame)
      : (DataFrame, DataFrame, DataFrame, Long) = {
    // refBg feeds big, uni AND the total count, so it materializes
    // once (the reference corpus tokenizes once, not three times)
    val refBg = lmBigrams(ref).localCheckpoint(false)
    val big = refBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(false) // feeds prefix counts AND the score join
    val prefix = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val uni = refBg.groupBy("w2").agg(count(lit(1)).as("c2"))
    (big, prefix, uni, refBg.count())
  }

  /** (doc_id, w1, w2) bigram rows of a (doc_id, text) frame. */
  private def lmBigrams(docs: DataFrame): DataFrame = {
    val toks = wsTokens
    docs.filter(size(toks) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1))).as("bg"))
      .select(col("doc_id"),
        col("bg").getField("0").as("w1"),
        col("bg").getField("1").as("w2"))
  }

  /** t15 over any raw/reference (doc_id, text) pair of frames. Emits
    * (doc_id, n_bigrams, mean_lp) for every raw doc with ≥ 1 bigram.
    */
  def lmScoreOver(raw: DataFrame, ref: DataFrame,
      alpha: Double = 0.4): DataFrame = {
    val (big, prefix, uni, total) = lmTables(ref)
    lmScoreWith(raw, big, prefix, uni, total, alpha)
  }

  /** Score against prebuilt LM tables — the shared core of the batch
    * (t15) and persisted/streaming (st14) forms.
    */
  def lmScoreWith(raw: DataFrame, big: DataFrame, prefix: DataFrame,
      uni: DataFrame, totalBigrams: Long, alpha: Double = 0.4): DataFrame = {
    val total = totalBigrams.toDouble
    // stupid backoff, exactly the three cases; every division is one
    // IEEE op on exact longs, ln is StrictMath on both engines
    val p = when(col("c12").isNotNull,
        col("c12").cast("double") / col("c1"))
      .when(col("c2").isNotNull,
        lit(alpha) * (col("c2").cast("double") / lit(total)))
      .otherwise(lit(alpha) * lit(1.0 / total))
    lmBigrams(raw)
      .join(big, Seq("w1", "w2"), "left")
      .join(prefix, Seq("w1"), "left")
      .join(uni, Seq("w2"), "left")
      .select(col("doc_id"),
        round(log(p), 9).cast("decimal(28,9)").as("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // exact-decimal Σ → one double conversion → one IEEE divide:
        // replayable in plain Scala without Spark's decimal-division
        // scale rules
        (sum(col("term")).cast("double") / count(lit(1))).as("mean_lp"))
  }

  /** t15 oracle ln-memo: the exact doubles lmScoreWith passes to
    * `log` — every bigram conditional c12/c1, every backoff
    * α·(c2/T), and the unseen constant α·(1/T) — with their
    * StrictMath results. DuckDB rebuilds the whole LM (bigram
    * extraction, count tables, joins, the three-case backoff, the
    * decimal rollup) from `documents` itself and only LOOKS UP the
    * scalar ln, the one op where libm can drift a last ulp past what
    * 9-dp term rounding absorbs.
    */
  def t15AuxLn(spark: SparkSession, dir: String,
      alpha: Double = 0.4): DataFrame = {
    import spark.implicits._
    val (big, prefix, uni, totalL) =
      lmTables(lmDemoRef(Tables(spark, dir).documents))
    val total = totalL.toDouble
    val xBig = big.join(prefix, Seq("w1"))
      .select((col("c12").cast("double") / col("c1")).as("x"))
    val xUni = uni.select(
      (lit(alpha) * (col("c2").cast("double") / lit(total))).as("x"))
    val xElse = Seq(alpha * (1.0 / total)).toDF("x")
    xBig.union(xUni).union(xElse).distinct()
      .select(col("x"), log(col("x")).as("lx"))
  }

  /** Persist the t15 LM tables once (vocab-bounded parquet: bigram
    * conditionals, prefix totals, unigram counts, and a 1-row meta
    * with T) — the train-once artifact st14's streaming gate scores
    * against without ever re-scanning the reference corpus.
    */
  def lmTrainTables(ref: DataFrame, path: String): Unit = {
    val spark = ref.sparkSession
    import spark.implicits._
    val (big, prefix, uni, total) = lmTables(ref)
    big.write.mode("overwrite").parquet(s"$path/big")
    prefix.write.mode("overwrite").parquet(s"$path/prefix")
    uni.write.mode("overwrite").parquet(s"$path/uni")
    Seq(total).toDF("total")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Score a frame against [[lmTrainTables]]' persisted artifact. */
  def lmScoreIndexed(raw: DataFrame, lmPath: String,
      alpha: Double = 0.4): DataFrame = {
    val spark = raw.sparkSession
    lmScoreWith(raw,
      spark.read.parquet(s"$lmPath/big"),
      spark.read.parquet(s"$lmPath/prefix"),
      spark.read.parquet(s"$lmPath/uni"),
      spark.read.parquet(s"$lmPath/meta").head().getLong(0), alpha)
  }

  /** Reusable scorer: adds `pred_lang` to any DF with a `text` col. */
  def langIdOver(docs: DataFrame): DataFrame = {
    val scored = docs.withColumn("_toks", lower(col("text")))
    val langs = LangMarkers.keys.toSeq.sorted
    val withScores = langs.foldLeft(scored) { (df, l) =>
      df.withColumn(s"_s_$l", langScore(col("_toks"), LangMarkers(l)))
    }
    // argmax via greatest + chained when (first lang in sorted order
    // wins ties deterministically); zero hits → 'und'
    val best = greatest(langs.map(l => col(s"_s_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, elseCol) =>
      when(col(s"_s_$l") === best && best > 0, lit(l)).otherwise(elseCol)
    }
    withScores
      .withColumn("pred_lang", pred)
      .drop("_toks" +: langs.map(l => s"_s_$l"): _*)
  }

  /** t17: HTML/markup stripping — the boilerplate-removal stage every
    * crawl-cleaning pipeline runs before any text analysis (public
    * practice: CCNet/Dolma/FineWeb all strip markup on intake). Tags
    * (`<[^>]*>`) are removed, the five standard character entities +
    * nbsp are decoded (with `&amp;` LAST, so `&amp;lt;` correctly
    * yields the literal `&lt;` and never a spurious `<`), space runs
    * collapse, and the result is trimmed. Every step is a codegen'd
    * regexp_replace/replace on RE2-portable patterns — per-row,
    * shuffle-free, replayed identically by the oracle.
    *
    * The synthetic corpus carries no markup, so the demo plants it
    * deterministically (the d14 discipline): every doc with
    * doc_id % 4 == 2 is wrapped in html/p tags with a bold-tagged
    * token — the strip must recover the ORIGINAL text byte-exactly,
    * which the spec asserts corpus-wide.
    */
  def t17HtmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 2,
          concat(lit("<html><p class=\"x\">"),
            expr("replace(text, ' the ', ' <b>the</b> ')"),
            lit("</p>")))
          .otherwise(col("text")).as("text"))
    htmlStripOver(planted).orderBy("doc_id")
  }

  /** t17 over any (doc_id, text) frame. Output: doc_id, n_tags
    * removed, the cleaned text, its length.
    */
  def htmlStripOver(docs: DataFrame): DataFrame = {
    val noTags = regexp_replace(col("text"), "<[^>]*>", "")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("<[^>]*>"), lit(0)))
        .cast(LongType).as("n_tags"),
      trim(regexp_replace(decoded, " {2,}", " ")).as("clean"))
      .withColumn("n_chars_clean", length(col("clean")).cast(LongType))
  }

  /** t16: token-aware document chunking — the context-window splitter
    * every RAG / training-prep pipeline runs before embedding or
    * packing (ref's per-file copy loop has no analog; this is part of
    * the mandated LLM-pipeline surface). Each document becomes
    * ⌈(n − overlap) / stride⌉ sliding windows of `chunkSize`
    * whitespace tokens overlapping by `overlap` (stride = size −
    * overlap), so every token is covered and consecutive chunks share
    * exactly `overlap` tokens; a doc shorter than one window emits a
    * single short chunk. Chunk boundaries are exact-integer
    * arithmetic on the token count, so the oracle replays them
    * bit-for-bit.
    *
    * Scale: a per-row explode — no shuffle, no state; output volume
    * is input tokens × (1 + overlap/stride), the documented fan-out.
    * The projection (doc_id, text) reaches the scan, and the whole
    * operator stays inside one WholeStageCodegen span.
    */
  def t16ChunkSplit(spark: SparkSession, dir: String): DataFrame =
    chunkSplitOver(Tables(spark, dir).documents)
      .orderBy("doc_id", "chunk_id")

  /** t20: sentence segmentation — the rule-based splitter every
    * sentence-granular stage (sentence dedup, per-sentence PII,
    * sentence-bounded chunking) runs before it can exist (public
    * practice: high-throughput pipelines use rule-based splitters —
    * terminator + space — with abbreviation lists as a refinement;
    * this is the distributed skeleton that refinement plugs into).
    * A sentence ends at '.', '!' or '?' followed by a space (or at
    * end of text); terminators stay attached to their sentence.
    *
    * Portability by construction: the boundary marking is three
    * LITERAL replaces ('. ' → '.\u0001' etc.) — no regex backrefs,
    * which Spark spells `$1` and DuckDB `\1` — then one split on the
    * control char (which cannot occur in text).
    *
    * The corpus is unpunctuated, so the demo builds sentences
    * deterministically (10-token groups, cycling terminators) and
    * the splitter must recover exactly those groups — the
    * construction/recovery law the spec asserts corpus-wide.
    *
    * Scale: per-row mark + split + posexplode; no shuffle (the
    * driver orderBy is presentation only); pruned scan.
    */
  def t20SentenceSplit(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir).documents.select(col("doc_id"), expr(
      """array_join(transform(
        |  sequence(0, (size(split(text, ' ')) + 9) div 10 - 1),
        |  i -> concat(array_join(slice(split(text, ' '), i * 10 + 1, 10), ' '),
        |              element_at(array('.', '!', '?'),
        |                CAST(i % 3 + 1 AS INT)))),
        |' ')""".stripMargin).as("text"))
    sentenceSplitOver(planted).orderBy("doc_id", "sent_id")
  }

  /** t20 over any (doc_id, text) frame: one row per sentence with its
    * 0-based position and token count.
    */
  def sentenceSplitOver(docs: DataFrame): DataFrame = {
    val marked = Seq(". ", "! ", "? ").foldLeft(col("text")) { (c, t) =>
      replace(c, lit(t), lit(t.charAt(0) + "\u0001"))
    }
    docs
      .select(col("doc_id"), posexplode(split(marked, "\u0001"))
        .as(Seq("sent_id", "sentence")))
      .select(col("doc_id"), col("sent_id").cast(LongType).as("sent_id"),
        col("sentence"),
        size(split(col("sentence"), " ")).cast(LongType).as("n_tokens"))
  }

  /** t19: token-entropy quality scoring — the information-theoretic
    * repetitiveness signal (public practice: RedPajama/Dolma-class
    * quality suites carry an entropy signal; near-zero entropy means
    * looping/boilerplate text no length or stopword ratio catches,
    * maximal entropy ln(n) means no token repeats). Shannon entropy
    * over the document's token distribution in nats, via the
    * count-only identity H = ln(n) − (Σ_w c_w·ln c_w)/n — every ln
    * input is an exact INTEGER cast to double, so the oracle's
    * ln-memo is keyed on token counts alone.
    *
    * Complements t07: t07 reports max-share ratios (the Gopher rule
    * inputs), entropy summarizes the WHOLE distribution in one
    * number a curation pipeline can threshold or stratify on.
    *
    * Determinism (the c14 discipline): terms c·ln(c) are 9-dp-rounded
    * and accumulated in DECIMAL(28,9) — associative, so bit-identical
    * at any partitioning; the final expression is one divide, one
    * subtract, one 6-dp round in a fixed order both engines replay.
    *
    * Scale: one token explode, a (doc, token) count shuffle with
    * map-side partials, one doc rollup — t05's shape, bounded by
    * corpus token volume.
    */
  def t19TokenEntropy(spark: SparkSession, dir: String): DataFrame =
    entropyOver(Tables(spark, dir).documents).orderBy("doc_id")

  /** t19 over any (doc_id, text) frame. */
  def entropyOver(docs: DataFrame): DataFrame =
    tokenCounts(docs).groupBy("doc_id")
      .agg(sum(col("c")).cast(LongType).as("n_tokens"),
        count(lit(1)).cast(LongType).as("n_distinct"),
        sum(round(col("c").cast("double") * log(col("c").cast("double")), 9)
          .cast("decimal(28,9)")).as("s"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(log(col("n_tokens").cast("double")) -
          col("s").cast("double") / col("n_tokens"), 6).as("entropy_nats"))

  /** Per-doc token multiplicities — shared by the t19 score and its
    * ln-memo producer so the memo provably covers every ln input.
    */
  private def tokenCounts(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    .filter(length(col("w")) > 0)
    .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))

  /** t19 oracle ln-memo: Spark's ln of every distinct token count and
    * every distinct doc length — the only transcendentals in the
    * score (the c14 ln-memo rationale: DuckDB's libm ln can drift a
    * last ulp past the 9-dp rounding).
    */
  def t19AuxLn(spark: SparkSession, dir: String): DataFrame = {
    val cnt = tokenCounts(
      Tables(spark, dir).documents.select(col("doc_id"), col("text")))
    cnt.select(col("c"))
      .union(cnt.groupBy("doc_id").agg(sum(col("c")).as("c")).select(col("c")))
      .distinct()
      .select(col("c").cast("double").as("x"),
        log(col("c").cast("double")).as("lx"))
  }

  /** t18: invisible-character scrub + Unicode-space normalization —
    * the codepoint-hygiene stage every crawl-cleaning pipeline runs
    * before tokenization (public practice: zero-width characters and
    * exotic spaces break whitespace tokenizers, inflate dedup
    * signatures and smuggle adversarial content past filters).
    * Removes ZWSP/ZWNJ/ZWJ (U+200B..D), BOM/ZWNBSP (U+FEFF) and
    * soft hyphen (U+00AD); maps NBSP (U+00A0), thin space (U+2009),
    * narrow NBSP (U+202F) and ideographic space (U+3000) to a plain
    * space. 1:1 or 1:0 per char — no run collapsing (that is t17's
    * job), so a plant is recovered byte-exactly.
    *
    * Both passes are codegen'd regexp_replace on explicit char
    * classes (Java `\uXXXX` ↔ RE2 `\x{XXXX}` — portable by
    * construction; no \p{} property classes, whose tables can drift
    * between engines). Counts are regexp counts on the RAW text.
    *
    * The synthetic corpus is ASCII, so the demo plants violations
    * deterministically (the t17 discipline): doc_id%6==1 gets a BOM
    * prefix and a ZWSP inside each ' the ', ==3 has every space
    * turned NBSP, ==5 gets a soft-hyphen + ZWJ tail. The scrub must
    * recover every original byte exactly (spec'd corpus-wide).
    *
    * Scale: per-row, shuffle-free (plan-asserted), pruned scan.
    */
  def t18UnicodeScrub(spark: SparkSession, dir: String): DataFrame = {
    val planted = graft.Tables(spark, dir).documents.select(col("doc_id"),
      when(col("doc_id") % 6 === 1,
        concat(lit("\ufeff"), replace(col("text"), lit(" the "),
          lit(" t\u200bhe "))))
        .when(col("doc_id") % 6 === 3,
          replace(col("text"), lit(" "), lit("\u00a0")))
        .when(col("doc_id") % 6 === 5,
          concat(col("text"), lit("\u00ad\u200d")))
        .otherwise(col("text")).as("text"))
    unicodeScrubOver(planted).orderBy("doc_id")
  }

  private val InvisibleClass = "[\u200b\u200c\u200d\ufeff\u00ad]"
  private val ExoticSpaceClass = "[\u00a0\u2009\u202f\u3000]"

  /** t18 over any (doc_id, text) frame: per-doc removed/normalized
    * counts, the clean text, its length.
    */
  def unicodeScrubOver(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(InvisibleClass), lit(0)))
        .cast(LongType).as("n_invisible"),
      size(regexp_extract_all(col("text"), lit(ExoticSpaceClass), lit(0)))
        .cast(LongType).as("n_spaces"),
      regexp_replace(
        regexp_replace(col("text"), InvisibleClass, ""),
        ExoticSpaceClass, " ").as("clean"))
      .withColumn("n_chars_clean", length(col("clean")).cast(LongType))

  /** t16 over any (doc_id, text) DataFrame. `chunkSize` > `overlap`
    * ≥ 0 (stride must be positive or the window never advances).
    */
  def chunkSplitOver(docs: DataFrame, chunkSize: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got ($chunkSize, $overlap)")
    val stride = chunkSize - overlap
    // nChunks = max(1, ceil((n − overlap) / stride)) as integer div;
    // covers all n tokens: last start = (nChunks−1)·stride < n − overlap
    // + stride ⇒ start + chunkSize ≥ n
    docs
      .select(col("doc_id"), wsTokens.as("w"), size(wsTokens).as("n"))
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0L),
          greatest(lit(1L),
            expr(s"(n - $overlap + ${stride - 1}) div $stride")) - 1))
          .as("chunk_id"))
      .select(col("doc_id"),
        col("chunk_id").cast(LongType).as("chunk_id"),
        (col("chunk_id") * stride).cast(LongType).as("tok_start"),
        least(lit(chunkSize.toLong),
          col("n") - col("chunk_id") * stride).cast(LongType)
          .as("n_tokens"),
        array_join(
          slice(col("w"), col("chunk_id") * stride + 1, lit(chunkSize)),
          " ").as("chunk_text"))
  }

  // ---------------------------------------------------------------- t03b

  /** Unicode script ranges for t03b — (name, Java char class, RE2
    * char class). EXPLICIT `\uXXXX` ranges on both sides (t18's
    * portability discipline: `\p{Script=...}` property tables can
    * drift between regex engines; a literal range cannot). Names are
    * kept alphabetical — the argmax tie-break order.
    */
  private[graft] val ScriptRanges: Seq[(String, String, String)] = Seq(
    ("arabic", "[\u0600-\u06FF]", "[\\x{0600}-\\x{06FF}]"),
    ("cjk", "[\u4E00-\u9FFF]", "[\\x{4E00}-\\x{9FFF}]"),
    ("cyrillic", "[\u0400-\u04FF]", "[\\x{0400}-\\x{04FF}]"),
    ("greek", "[\u0370-\u03FF]", "[\\x{0370}-\\x{03FF}]"),
    ("hangul", "[\uAC00-\uD7AF]", "[\\x{AC00}-\\x{D7AF}]"),
    ("latin", "[A-Za-z]", "[A-Za-z]"))

  /** The t03b plant: the synthetic corpus is pure ASCII, so docs with
    * doc_id % 6 ∈ 1..5 swap their text for a fixed phrase in one of
    * the five non-Latin scripts (plus the doc_id, so rows stay
    * distinct); % 6 == 0 keeps the original Latin text. Every branch
    * is a constant-concat the oracle rebuilds byte-for-byte.
    */
  private[graft] val ScriptPlants: Seq[(Int, String)] = Seq(
    1 -> "данные поток система запрос таблица ",
    2 -> "δεδομένα ροή σύστημα ερώτημα πίνακας ",
    3 -> "数据 流 系统 查询 表 ",
    4 -> "بيانات تدفق نظام استعلام جدول ",
    5 -> "데이터 흐름 시스템 쿼리 테이블 ")

  private[operators] def demoScriptDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      ScriptPlants.foldRight(col("text")) { case ((v, phrase), e) =>
        when(col("doc_id") % 6 === v,
          concat(lit(phrase), col("doc_id").cast("string"))).otherwise(e)
      }.as("text"))

  /** Adds per-script char counts + `pred_script` (argmax, alphabetical
    * tie-break, zero hits → 'und') to any frame with a `text` column —
    * the charset-level complement of [[langIdOver]]'s marker words:
    * portable across corpora because it keys on code points, not on a
    * language-specific vocabulary.
    */
  def scriptIdOver(docs: DataFrame): DataFrame = {
    // same guard as robotsFlagsOver: the derived columns would
    // silently OVERWRITE same-named input columns (withColumn)
    val emitted = ScriptRanges.map { case (n, _, _) => s"n_$n" } :+
      "pred_script"
    val clash = docs.columns.intersect(emitted)
    require(clash.isEmpty,
      s"scriptIdOver: input already has column(s) ${clash.mkString(", ")}" +
        s" — rename them; the kernel emits ${emitted.mkString(", ")}")
    val withCounts = ScriptRanges.foldLeft(docs) { case (df, (n, jc, _)) =>
      df.withColumn(s"n_$n",
        size(regexp_extract_all(col("text"), lit(jc), lit(0)))
          .cast(LongType))
    }
    val names = ScriptRanges.map(_._1)
    val best = greatest(names.map(n => col(s"n_$n")): _*)
    val pred = names.foldRight(lit("und")) { (n, e) =>
      when(col(s"n_$n") === best && best > 0, lit(n)).otherwise(e)
    }
    withCounts.withColumn("pred_script", pred)
  }

  /** t03b: Unicode-script language/charset ID — per-doc script
    * histogram over explicit code-point ranges + argmax, beside
    * t03's marker-word verdict on the SAME planted frame so the demo
    * COMPARES the classifiers: the marker heuristic (corpus-specific
    * vocabulary) calls every non-Latin plant 'und', while the script
    * ranges (portable) name them — and neither can classify what the
    * other does without its table. Per-row codegen'd regex counting;
    * no shuffle.
    */
  def t03bScriptId(spark: SparkSession, dir: String): DataFrame = {
    val planted = demoScriptDocs(Tables(spark, dir).documents)
    langIdOver(scriptIdOver(planted))
      .select((col("doc_id") +:
        ScriptRanges.map { case (n, _, _) => col(s"n_$n") }) :+
        col("pred_script") :+ col("pred_lang"): _*)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- t24

  /** t24 stopword markers (the jusText-style function-word set the
    * density verdict keys on) — comma-joined for the e-series marker
    * kernel and mirrored verbatim by the oracle's list_contains.
    */
  private[operators] val T24Stops =
    Seq("the", "a", "an", "and", "in", "of", "to", "is", "this")

  /** The t24 plant: each doc becomes a FIVE-block page — a nav bar
    * (link-dense), the MAIN block (the doc's text plus a fixed
    * stopword-bearing tail, so the stopword-density gate is satisfied
    * by construction at any corpus composition — the synthetic corpus
    * has docs with ZERO function words), a short promo block, a long
    * function-word-free filler (the 'low' class must fire too), and a
    * link-dense footer. Every block is an affine function of
    * (doc_id, text), so the oracle rebuilds the page byte-for-byte.
    */
  private[operators] def demoBlockPages(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      lit("<html><body><div><a href=\"/home\">home</a> " +
        "<a href=\"/docs\">docs</a> <a href=\"/about\">about</a> menu"),
      expr("doc_id % 5"),
      lit("</div><p>"), col("text"),
      lit(" and this is the rest of the story in a sea of the common" +
        " words</p><div>promo box "),
      expr("doc_id % 7"),
      // long but function-word-free: the 'low' class must fire too
      lit("</div><div>alpha beta gamma delta epsilon zeta eta theta iota "),
      expr("doc_id % 3"),
      lit("</div><div>copyright acme <a href=\"/terms\">terms</a> " +
        "<a href=\"/privacy\">privacy</a></div></body></html>")).as("html"))

  /** t24 kernel over any (doc_id, html) frame: segment the markup
    * into block-level units (`<div>`/`<p>` bodies — g03/t17's
    * regex-parsing discipline), compute the three densities each
    * block's verdict keys on, classify. All counts are exact
    * integers; density thresholds compare by CROSS-MULTIPLICATION
    * (3·link_chars vs n_chars; 16·n_stop vs n_words), so no float
    * ever enters the verdict. Per-row codegen'd regex — pages never
    * shuffle; posexplode fans out to blocks only.
    */
  def t24BlocksOver(pages: DataFrame): DataFrame = {
    // unlike robotsFlagsOver, input columns do NOT ride along here
    // (the block explode re-projects) — refuse same-named inputs up
    // front anyway so a caller can't mistake a silently-DROPPED
    // column for a riding one
    val emitted = Seq("blk", "block_text", "n_chars", "link_chars",
      "n_words", "n_stop", "verdict")
    val clash = pages.columns.intersect(emitted)
    require(clash.isEmpty,
      s"t24BlocksOver: input already has column(s) ${clash.mkString(", ")}" +
        s" — rename them; the kernel emits ${emitted.mkString(", ")}")
    val blocks = pages.select(col("doc_id"),
      posexplode(regexp_extract_all(col("html"),
        lit("<(?:div|p)>(.*?)</(?:div|p)>"), lit(1))))
      .select(col("doc_id"), col("pos").cast(LongType).as("blk"),
        col("col").as("raw"))
    val txt = trim(regexp_replace(
      regexp_replace(col("raw"), "<[^>]*>", ""), " {2,}", " "))
    val linkTxt = array_join(regexp_extract_all(col("raw"),
      lit("<a href=\"[^\"]*\">([^<]*)</a>"), lit(1)), "")
    blocks
      .select(col("doc_id"), col("blk"), txt.as("block_text"),
        length(txt).cast(LongType).as("n_chars"),
        length(linkTxt).cast(LongType).as("link_chars"),
        when(txt === "", 0L)
          .otherwise(size(split(txt, " ")).cast(LongType)).as("n_words"),
        graft.functions.F.markerCount(txt, T24Stops.mkString(","))
          .cast(LongType).as("n_stop"))
      .withColumn("verdict",
        when(col("link_chars") * 3 > col("n_chars"), "bad")
          .when(col("n_words") < 8, "short")
          .when(col("n_stop") * 16 >= col("n_words"), "content")
          .otherwise("low"))
  }

  /** t24: main-content block extraction — the jusText/trafilatura
    * density classifier (Pomikálek 2011; public) that every
    * web-corpus pipeline runs after t17's tag strip keeps nav/footer
    * TEXT: segment the page into block-level units, then judge each
    * block by link density (boilerplate is link-dense), length
    * (fragments are noise), and stopword density (real prose carries
    * function words; listy boilerplate doesn't). `content` blocks are
    * what feeds the corpus; `bad`/`short`/`low` are the dropped
    * boilerplate classes. The demo plants a five-block page per doc
    * (t17's plant discipline) so every verdict class fires at every
    * SF and the kept content is a KNOWN exact string per page.
    */
  def t24MainContent(spark: SparkSession, dir: String): DataFrame =
    t24BlocksOver(demoBlockPages(Tables(spark, dir).documents))
      .orderBy("doc_id", "blk")

  // ---------------------------------------------------------------- t22

  /** Count-min sketch geometry: 4 rows (independent xxhash64 seeds) ×
    * 1024 buckets. Error bound: overestimate ≤ 2·N/width with prob.
    * 1 − 2^-depth per probe (Cormode & Muthukrishnan 2005).
    */
  val CmsDepth = 4
  val CmsWidth = 1024L

  /** t22: count-min sketch frequency estimation — the bounded-memory
    * counterpart to t10's exact heavy hitters. The sketch is a FIXED
    * 4×1024 cell grid no matter the corpus: the token stream fans out
    * to its 4 cells and one groupBy(seed, bucket) with map-side
    * combine collapses everything (per-task state ≤ 4096 counters —
    * THE property that lets the same plan stream 100 TB; t10's exact
    * pass keeps per-task state proportional to the live vocab).
    * Estimates then cost one broadcast join of the 4096-row sketch
    * against the probe set's cell coordinates and a min over the 4
    * cells.
    *
    * The demo probes the full (Heaps-bounded) vocab and carries the
    * exact count beside the estimate so the CMS guarantee is visible
    * in the output: est ≥ exact always, with overshoot only from
    * bucket collisions. At 100 TB the probe set would come from a
    * sampled candidate pre-pass (the t10 KPS pattern) — the sketch
    * itself never materializes the vocab.
    *
    * Output: top-`k` tokens by estimate — (token, est, exact).
    */
  def t22CmsTopk(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val fan = toks
      .select(col("token"),
        explode(expr(s"sequence(0L, ${CmsDepth - 1}L)")).as("cms_seed"))
      .select(col("cms_seed"),
        pmod(xxhash64(col("cms_seed"), col("token")), lit(CmsWidth))
          .as("bucket"))
    val sketch = fan.groupBy("cms_seed", "bucket")
      .agg(count(lit(1)).as("cnt"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("exact"))
    val probes = vocab
      .select(col("token"), col("exact"),
        explode(expr(s"sequence(0L, ${CmsDepth - 1}L)")).as("cms_seed"))
      .select(col("token"), col("exact"), col("cms_seed"),
        pmod(xxhash64(col("cms_seed"), col("token")), lit(CmsWidth))
          .as("bucket"))
    probes.join(broadcast(sketch), Seq("cms_seed", "bucket"))
      .groupBy("token", "exact").agg(min("cnt").as("est"))
      .orderBy(col("est").desc, col("token"))
      .limit(k)
      .select(col("token"), col("est"), col("exact"))
  }

  /** Oracle side-table: the xxhash64 cell coordinates per DISTINCT
    * token (the only non-SQL kernel in t22 — DuckDB replays the
    * sketch build, the min-estimate, and the exact comparison from
    * these coordinates alone).
    */
  def t22AuxHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
      .select(col("token"),
        explode(expr(s"sequence(0L, ${CmsDepth - 1}L)")).as("cms_seed"))
      .select(col("token"), col("cms_seed"),
        pmod(xxhash64(col("cms_seed"), col("token")), lit(CmsWidth))
          .as("bucket"))
}
