package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.{Bridge, CosineSim, DotProd, Fingerprint64, I8Dot, I8Quantize, JaccardH64, MarkerCount, MinHashSig, MinHashSigText, RemoveTokenSpans, RepetitionStats, ShingleHashes64, ShinglePosHashes64, SimHash64, SrpSig64, SubwordIds, SubwordStats, ViterbiCostIds, ViterbiIds}

/** Typed Column API over graft's native Catalyst expressions — usable
  * without SQL-function registration (plans embed the expression
  * directly, so any session can run them).
  */
object F {
  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  /** Native codegen cosine similarity of two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column = c(CosineSim(e(a), e(b)))

  /** Native cosine rounded for engine-boundary comparison (same fold
    * order as VectorOps.cosine4 — spec-proven bit-identical, ~10x
    * faster: one fused loop, no intermediate zip array per row).
    */
  def cosineSim4(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.round(cosineSim(a, b), 4)

  /** Native codegen dot product of two array<float> columns. */
  def dotProd(a: Column, b: Column): Column = c(DotProd(e(a), e(b)))

  /** Native exact Jaccard over two distinct long-hash arrays (e17). */
  def jaccardH64(a: Column, b: Column): Column = c(JaccardH64(e(a), e(b)))

  /** e15: int8 scalar quantization (array<float> → array<byte>, 4×
    * smaller; per-vector symmetric scale max|v|/127).
    */
  def i8Quantize(v: Column): Column = c(I8Quantize(e(v)))

  /** e15: exact int64 dot product over two int8 code arrays. */
  def i8Dot(a: Column, b: Column): Column = c(I8Dot(e(a), e(b)))

  /** Norm-precomputed cosine: dot(a,b)/(na*nb), rounded. Bit-identical
    * to cosineSim4 when na/nb are sqrt(dotProd(x,x)) — use when many
    * pairs share a vector, so each norm is computed once, not per pair.
    */
  def cosineSim4Pre(a: Column, na: Column, b: Column, nb: Column): Column =
    org.apache.spark.sql.functions.round(dotProd(a, b) / (na * nb), 4)

  /** Native fused MinHash signature over a shingle-array column. */
  def minhashSig(shingles: Column, numPerm: Int = 64): Column =
    c(MinHashSig(e(shingles), numPerm))

  /** Native text→MinHash signature: tokenize + shingle + hash + fold in
    * one kernel pass (null for docs shorter than shingleK tokens).
    */
  def minhashSigText(text: Column, shingleK: Int, numPerm: Int = 64): Column =
    c(MinHashSigText(e(text), shingleK, numPerm))

  /** Native marker-token counter (comma-separated marker set). */
  def markerCount(text: Column, markers: String): Column =
    c(MarkerCount(e(text), e(org.apache.spark.sql.functions.lit(markers))))

  /** Native codegen 64-bit SimHash of whitespace tokens. */
  def simhash64(text: Column): Column = c(SimHash64(e(text)))

  /** Native codegen 64-bit rolling-hash document fingerprint. */
  def fingerprint64(text: Column): Column = c(Fingerprint64(e(text)))

  /** 64-bit sign-random-projection signature of a float-array column
    * (e09) — one fused native loop over 64 deterministic hyperplanes.
    */
  def srpSig64(v: Column): Column = c(SrpSig64(e(v)))

  /** Distinct 64-bit shingle hashes of text (e10) — the hashed-set
    * form of word-k-shingling, one fused kernel pass.
    */
  def shingleHashes64(text: Column, shingleK: Int): Column =
    c(ShingleHashes64(e(text), shingleK))

  /** Positional shingle hashes (e12): index = token position,
    * duplicates kept — the substring-dedup form of [[shingleHashes64]].
    */
  def shinglePosHashes64(text: Column, shingleK: Int): Column =
    c(ShinglePosHashes64(e(text), shingleK))

  /** Native greedy longest-match subword segmentation stats (e11):
    * [n_subwords, n_unk] against a U+001F-joined vocab (use
    * [[joinVocab]] — the separator encoding lets pieces contain
    * commas).
    */
  def subwordStats(text: Column, vocabJoined: String): Column =
    c(SubwordStats(e(text), e(org.apache.spark.sql.functions.lit(vocabJoined))))

  /** Native tokenize-materialize (e11b): the piece-id sequence of the
    * greedy longest-match segmentation as array<int> (UNK → −1).
    */
  def subwordIds(text: Column, vocabJoined: String): Column =
    c(SubwordIds(e(text), e(org.apache.spark.sql.functions.lit(vocabJoined))))

  /** Native Viterbi lattice segmentation (e16): the cost-optimal
    * piece-id sequence (piece 1, UNK 3, ties → longer final piece).
    */
  def viterbiIds(text: Column, vocabJoined: String): Column =
    c(ViterbiIds(e(text), e(org.apache.spark.sql.functions.lit(vocabJoined))))

  /** Cost-weighted Viterbi segmentation (e16's trained-cost form):
    * per-piece costs comma-joined, UNK cost first (t23's output).
    */
  def viterbiCostIds(text: Column, vocabJoined: String,
      costsJoined: String): Column =
    c(ViterbiCostIds(e(text),
      e(org.apache.spark.sql.functions.lit(vocabJoined)),
      e(org.apache.spark.sql.functions.lit(costsJoined))))

  /** One-pass per-document repetition stats (e13): [n_tokens,
    * n_distinct, top_token_count, top_2gram_count, n_2grams].
    */
  def repetitionStats(text: Column): Column = c(RepetitionStats(e(text)))

  /** Token-span removal (e14): drop tokens inside sorted disjoint
    * [start, end] position ranges, rejoin with single spaces.
    */
  def removeTokenSpans(text: Column, starts: Column, ends: Column): Column =
    c(RemoveTokenSpans(e(text), e(starts), e(ends)))

  /** Encode a vocab piece list in the kernel wire format (U+001F
    * joined; a piece's id is its index here).
    */
  def joinVocab(pieces: Seq[String]): String =
    pieces.mkString(org.apache.spark.sql.graft.Kernels.VocabSep.toString)
}
