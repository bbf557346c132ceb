package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** d14: edit-distance fuzzy join — near-duplicate detection for SHORT
  * strings (titles, names, URLs) where the shingle/MinHash machinery
  * (d02/d04) is too coarse: a one-character typo changes most
  * 5-gram shingles of a 20-char title, but its Levenshtein distance
  * is 1. The public scale recipe is q-gram count filtering
  * (Gravano et al., VLDB'01): strings within edit distance t must
  * share at least max(|a|,|b|) − q + 1 − t·q positional q-grams
  * (each edit destroys ≤ q grams), with positions differing by ≤ t.
  * Candidate generation is therefore an inverted-index join on grams
  * — never all-pairs — and the exact Levenshtein DP runs only on the
  * filtered candidates.
  *
  * Scale: the gram join shuffles (gram, id, pos) tuples — linear in
  * total characters; the verify step is O(candidates · len²) on
  * ≤ ~100-char strings. Hot grams (a gram shared by k strings
  * contributes k² join rows) are the documented skew surface — the
  * same dial as d08's maxDf: cap with [[graft.operators.Skew]]
  * salting or pre-filter stop-grams; at the demo's title corpus the
  * df distribution is flat. Strings too short for the count bound to
  * bite (max(len) < q·(t+1) + q − 1, where the bound is ≤ 0) pair
  * through a length-band block instead — bounded because strings that
  * short are a vanishing fraction of any real corpus (docstring dial:
  * shortLen).
  *
  * Unicode note: both engines run the classic character-DP — Spark on
  * UTF-16 code units, DuckDB on UTF-8-decoded characters — identical
  * on BMP text; supplementary-plane glyphs count 2 vs 1 (the t08/t11
  * code-point discipline documents the same seam).
  */
object FuzzyJoin {

  /** d14 demo: document "titles" (first 4 whitespace tokens) joined
    * at edit distance ≤ 1 — the near-dup typo sweep a curation
    * pipeline runs over titles/URLs before exact-key grouping.
    */
  def d14FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val titles = Tables(spark, dir).documents
      .select(col("doc_id").as("id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("s"))
    fuzzyJoinOver(titles, maxDist = 1)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("s_a").as("title_a"), col("s_b").as("title_b"), col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** All pairs (id_a < id_b) from `strs` (columns: id, s) with
    * Levenshtein(s_a, s_b) ≤ maxDist, via positional q-gram count
    * filtering + exact verify. Output: id_a, id_b, s_a, s_b, dist.
    */
  def fuzzyJoinOver(strs: DataFrame, maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 1 && q >= 2, s"need maxDist>=1, q>=2, got ($maxDist, $q)")
    val t = maxDist
    val base = strs.select(col("id"), col("s"), length(col("s")).as("len"))
    // positional q-grams; len >= q guard keeps sequence() ascending
    val grams = base.filter(col("len") >= q)
      .select(col("id"), col("len"),
        explode(expr(
          s"transform(sequence(1, len - ${q - 1}), " +
            s"j -> struct(j AS pos, substring(s, j, $q) AS gm))")).as("pg"))
      .select(col("id"), col("len"), col("pg.pos").as("pos"),
        col("pg.gm").as("gm"))
    // count filter: matching positional grams >= max(len) − (q−1) − t·q.
    // The join count over-counts 1-to-1 gram matches, so the candidate
    // set is a SUPERSET of true pairs — exactness comes from the verify.
    val gramCand = grams.as("a").join(grams.as("b"),
        col("a.gm") === col("b.gm") && col("a.id") < col("b.id") &&
          abs(col("a.pos") - col("b.pos")) <= t &&
          abs(col("a.len") - col("b.len")) <= t)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.len").as("la"), col("b.len").as("lb"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") >=
        greatest(col("la"), col("lb")) - lit(q - 1) - lit(t * q))
      .select("id_a", "id_b")
    // both-short pairs (bound ≤ 0 ⟺ max(len) < shortLen): length-band
    // block — each short string under keys len..len+t, so any pair with
    // |Δlen| ≤ t shares the key max(la, lb)
    val shortLen = q * (t + 1) + q - 1
    val keyed = base.filter(col("len") < shortLen)
      .select(col("id"),
        explode(sequence(col("len"), col("len") + t)).as("k"))
    val shortCand = keyed.as("a").join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val cand = gramCand.union(shortCand).distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b")).cast(LongType))
      .filter(col("dist") <= t)
      .select("id_a", "id_b", "s_a", "s_b", "dist")
  }
}
