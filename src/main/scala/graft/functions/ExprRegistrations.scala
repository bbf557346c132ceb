package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import org.apache.spark.sql.graft.{CosineSim, DotProd, JaccardH64, Fingerprint64, I8Dot, I8Quantize, MarkerCount, MinHashSigText, RemoveTokenSpans, RepetitionStats, ShingleHashes64, ShinglePosHashes64, SimHash64, SrpSig64, SubwordIds, SubwordStats, ViterbiCostIds, ViterbiIds}

/** Catalog entries for graft's native Catalyst expressions (SURVEY.md
  * §2.E). Injected via GraftExtensions so plain SQL can call them.
  */
object ExprRegistrations {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def desc(name: String, usage: String)(
      builder: Seq[Expression] => Expression): FunctionDescription =
    (new FunctionIdentifier(name),
      new ExpressionInfo("org.apache.spark.sql.graft", name, usage),
      builder)

  def all: Seq[FunctionDescription] = Seq(
    desc("cosine_sim",
      "cosine_sim(a, b) - deterministic cosine similarity of two float arrays") {
      case Seq(a, b) => CosineSim(a, b)
      case other => throw new IllegalArgumentException(
        s"cosine_sim expects 2 arguments, got ${other.size}")
    },
    desc("dot_product",
      "dot_product(a, b) - deterministic dot product of two float arrays") {
      case Seq(a, b) => DotProd(a, b)
      case other => throw new IllegalArgumentException(
        s"dot_product expects 2 arguments, got ${other.size}")
    },
    desc("jaccard_h64",
      "jaccard_h64(a, b) - exact Jaccard of two long-hash arrays. " +
        "PRECONDITION: both arrays must be element-DISTINCT (sets); " +
        "on duplicate elements the result is undefined and may exceed " +
        "1.0 - wrap untrusted inputs in array_distinct()") {
      case Seq(a, b) => JaccardH64(a, b)
      case other => throw new IllegalArgumentException(
        s"jaccard_h64 expects 2 arguments, got ${other.size}")
    },
    desc("i8_quantize",
      "i8_quantize(v) - int8 scalar quantization of a float array (scale max|v|/127)") {
      case Seq(v) => I8Quantize(v)
      case other => throw new IllegalArgumentException(
        s"i8_quantize expects 1 argument, got ${other.size}")
    },
    desc("i8_dot",
      "i8_dot(a, b) - exact int64 dot product of two int8 code arrays") {
      case Seq(a, b) => I8Dot(a, b)
      case other => throw new IllegalArgumentException(
        s"i8_dot expects 2 arguments, got ${other.size}")
    },
    desc("simhash64", "simhash64(text) - 64-bit SimHash of whitespace tokens") {
      case Seq(c) => SimHash64(c)
      case other => throw new IllegalArgumentException(
        s"simhash64 expects 1 argument, got ${other.size}")
    },
    desc("fingerprint64",
      "fingerprint64(text) - 64-bit rolling-hash document fingerprint") {
      case Seq(c) => Fingerprint64(c)
      case other => throw new IllegalArgumentException(
        s"fingerprint64 expects 1 argument, got ${other.size}")
    },
    desc("srp_sig64",
      "srp_sig64(embedding) - 64-bit sign-random-projection signature") {
      case Seq(c) => SrpSig64(c)
      case other => throw new IllegalArgumentException(
        s"srp_sig64 expects 1 argument, got ${other.size}")
    },
    desc("marker_count",
      "marker_count(text, markers) - count of whitespace tokens in the comma-separated marker set") {
      case Seq(t, m) => MarkerCount(t, m)
      case other => throw new IllegalArgumentException(
        s"marker_count expects 2 arguments, got ${other.size}")
    },
    desc("shingle_hashes64",
      "shingle_hashes64(text, k) - distinct 64-bit hashes of the word-k-shingles") {
      case Seq(c, Literal(k: Int, IntegerType)) => ShingleHashes64(c, k)
      case other => throw new IllegalArgumentException(
        s"shingle_hashes64 expects (text, int literal k), got $other")
    },
    desc("shingle_pos_hashes64",
      "shingle_pos_hashes64(text, k) - positional 64-bit word-k-shingle hashes (index = token position)") {
      case Seq(c, Literal(k: Int, IntegerType)) => ShinglePosHashes64(c, k)
      case other => throw new IllegalArgumentException(
        s"shingle_pos_hashes64 expects (text, int literal k), got $other")
    },
    desc("minhash_sig_text",
      "minhash_sig_text(text, k, numPerm) - fused MinHash signature of the word-k-shingles") {
      case Seq(c, Literal(k: Int, IntegerType), Literal(p: Int, IntegerType)) =>
        MinHashSigText(c, k, p)
      case other => throw new IllegalArgumentException(
        s"minhash_sig_text expects (text, int literal k, int literal numPerm), got $other")
    },
    desc("subword_stats",
      "subword_stats(text, vocab) - [n_subwords, n_unk] of greedy longest-match segmentation against the U+001F-joined vocab") {
      case Seq(t, v) => SubwordStats(t, v)
      case other => throw new IllegalArgumentException(
        s"subword_stats expects 2 arguments, got ${other.size}")
    },
    desc("repetition_stats",
      "repetition_stats(text) - [n_tokens, n_distinct, top_token_count, top_2gram_count, n_2grams] in one pass") {
      case Seq(c) => RepetitionStats(c)
      case other => throw new IllegalArgumentException(
        s"repetition_stats expects 1 argument, got ${other.size}")
    },
    desc("remove_token_spans",
      "remove_token_spans(text, starts, ends) - drop tokens inside sorted disjoint position ranges") {
      case Seq(t, s, e) => RemoveTokenSpans(t, s, e)
      case other => throw new IllegalArgumentException(
        s"remove_token_spans expects 3 arguments, got ${other.size}")
    },
    desc("subword_ids",
      "subword_ids(text, vocab) - piece-id sequence of greedy longest-match segmentation against the U+001F-joined vocab (UNK -> -1)") {
      case Seq(t, v) => SubwordIds(t, v)
      case other => throw new IllegalArgumentException(
        s"subword_ids expects 2 arguments, got ${other.size}")
    },
    desc("viterbi_ids",
      "viterbi_ids(text, vocab) - piece-id sequence of the COST-OPTIMAL lattice segmentation (piece cost 1, UNK char 3, ties to the longer final piece; UNK -> -1)") {
      case Seq(t, v) => ViterbiIds(t, v)
      case other => throw new IllegalArgumentException(
        s"viterbi_ids expects 2 arguments, got ${other.size}")
    },
    desc("viterbi_cost_ids",
      "viterbi_cost_ids(text, vocab, costs) - viterbi_ids against TRAINED per-piece costs (comma-joined longs, UNK cost first - the t23 unigram trainer's output)") {
      case Seq(t, v, cst) => ViterbiCostIds(t, v, cst)
      case other => throw new IllegalArgumentException(
        s"viterbi_cost_ids expects 3 arguments, got ${other.size}")
    })
}
