package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** d14: edit-distance fuzzy join — near-duplicate detection for SHORT
  * strings (titles, names, URLs) where the shingle/MinHash machinery
  * (d02/d04) is too coarse: a one-character typo changes most 5-gram
  * shingles of a 20-char title, but its Levenshtein distance is 1.
  *
  * Candidate generation is EXACT blocking, picked by threshold (see
  * [[fuzzyJoinOver]]): deletion neighborhoods (FastSS/SymSpell) for
  * t = 1, rarest-first q-gram prefix filtering (Ed-Join — Xiao, Wang
  * & Lin, VLDB'08: ed ≤ t destroys ≤ q·t distinct grams, so true
  * pairs overlap in their (q·t+1)-prefixes under any shared gram
  * order) for t ≥ 2 — then the Levenshtein DP verifies. Both were
  * measured here: a first cut joining ALL grams spilled 27 GB at 10×
  * data (hot grams contribute df² candidates); the prefix filter cut
  * the shuffle 100× but still drew 25M candidates on this corpus's
  * 635-gram alphabet; deletion keys — full strings — collapse the
  * candidate set to ~the true pairs (1.1k) because a bucket IS a
  * near-dup group. The dispatch encodes that measurement.
  *
  * Exact duplicates are d01's job: identical strings collapse to
  * their min-id representative FIRST, so the join's output (and cost)
  * is over distinct strings — under heavy duplication an
  * all-doc-pairs answer is inherently quadratic in group sizes, while
  * the representative answer stays linear in distinct strings.
  *
  * Strings the overlap bound cannot see (fewer than q characters, or
  * ≤ q·t distinct grams, where the bound is vacuous) pair through a
  * length-band block instead — bounded because only the tiny tail of
  * a real corpus is that short; a pair of one tiny and one gram-safe
  * string is still covered by the gram path (its prefix is all of the
  * tiny string's grams).
  *
  * Unicode note: both engines run the classic character-DP — Spark on
  * UTF-16 code units, DuckDB on UTF-8-decoded characters — identical
  * on BMP text; supplementary-plane glyphs count 2 vs 1 (the t08/t11
  * code-point discipline documents the same seam).
  */
object FuzzyJoin {

  /** d14 demo: document "titles" (first 4 whitespace tokens) joined
    * at edit distance ≤ 1 — the near-dup typo sweep a curation
    * pipeline runs over titles/URLs after exact-key grouping. The
    * synthetic corpus's vocabulary has NO natural single-character
    * variants (every word pair is ≥ 2 edits apart), so the demo
    * plants the production signal deterministically: every third doc
    * "typos" its title by dropping the third character — the join
    * must recover exactly the typo'd-vs-clean representative pairs.
    */
  def d14FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val titles = Tables(spark, dir).documents
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("t0"))
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 3 === 1,
          concat(substring(col("t0"), 1, 2),
            expr("substring(t0, 4, 2147483647)")))
          .otherwise(col("t0")).as("s"))
    fuzzyJoinOver(titles, maxDist = 1)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("s_a").as("title_a"), col("s_b").as("title_b"), col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** All DISTINCT-string pairs from `strs` (columns: id, s) with
    * 1 ≤ Levenshtein(s_a, s_b) ≤ maxDist, each string represented by
    * the min id bearing it. Output: id_a, id_b, s_a, s_b, dist
    * (id_a < id_b).
    *
    * Two exact candidate-generation strategies, dispatched on t:
    * - t = 1 (the common typo sweep): DELETION NEIGHBORHOODS
    *   (FastSS/SymSpell, public): ed(a,b) ≤ 1 ⟹ K(a) ∩ K(b) ≠ ∅
    *   where K(x) = {x} ∪ {x minus one char} (substitution at i ⟹
    *   both sides' i-deletions coincide; insertion ⟹ the longer
    *   side's deletion equals the shorter string). Keys are full
    *   strings, so buckets collapse to true near-dup groups even on
    *   tiny-alphabet corpora — the q-gram prefix path on THIS corpus
    *   (635 distinct 3-grams total) generated 25.4M candidates at 10×
    *   data where deletion keys generate ~1.1k. Key volume is
    *   Σ(len+1) ≈ corpus characters — linear.
    * - t ≥ 2: rarest-first q-gram PREFIX FILTERING (Ed-Join) as
    *   described above — deletion neighborhoods explode as C(len, t)
    *   keys past t = 1, prefixes don't.
    */
  def fuzzyJoinOver(strs: DataFrame, maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 1 && q >= 2, s"need maxDist>=1, q>=2, got ($maxDist, $q)")
    val t = maxDist
    // uniq feeds candidate generation (twice, via the self-join) AND
    // both verify joins — materialize the slim (id, s, len) rows once
    // (q53/lmTables' localCheckpoint discipline) instead of paying the
    // distinct aggregation per consumer
    val uniq = strs.groupBy("s").agg(min(col("id")).as("id"))
      .select(col("id"), col("s"), length(col("s")).as("len"))
      .localCheckpoint(false)
    val cand =
      if (t == 1) deletionCandidates(uniq) else prefixCandidates(uniq, t, q)
    cand
      .join(uniq.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(uniq.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b")).cast(LongType))
      .filter(col("dist") <= t)
      .select("id_a", "id_b", "s_a", "s_b", "dist")
  }

  /** FastSS candidate pairs for t = 1: join on the shared deletion-
    * neighborhood key, dedup. Exact — no recall loss (see
    * [[fuzzyJoinOver]]).
    */
  private def deletionCandidates(uniq: DataFrame): DataFrame = {
    val keysId = uniq.select(col("id"), col("s").as("k"))
    val keysDel = uniq.filter(col("len") >= 1)
      .select(col("id"), explode(expr(
        "transform(sequence(1, len), j -> " +
          "concat(substring(s, 1, j - 1), substring(s, j + 1, 2147483647)))"))
        .as("k"))
    val keys = keysId.union(keysDel)
    keys.as("a").join(keys.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Ed-Join prefix-filter candidate pairs for t ≥ 2. */
  private def prefixCandidates(uniq: DataFrame, t: Int, q: Int): DataFrame = {
    val prefLen = q * t + 1
    // distinct q-gram set per string (set semantics — the overlap
    // bound and the prefix theorem are both stated on sets)
    val dg = uniq.filter(col("len") >= q)
      .select(col("id"), col("len"),
        explode(expr(s"array_distinct(transform(sequence(1, len - ${q - 1}), " +
          s"j -> substring(s, j, $q)))")).as("gm"))
    val withDf = dg.join(dg.groupBy("gm").agg(count(lit(1)).as("df")),
      Seq("gm"))
    // rarest-first prefix: the ONLY grams that reach the index
    val pref = withDf
      .withColumn("rk", row_number()
        .over(Window.partitionBy("id").orderBy(col("df"), col("gm"))))
      .filter(col("rk") <= prefLen)
      .select(col("id"), col("len"), col("gm"))
    val gramCand = pref.as("a").join(pref.as("b"),
        col("a.gm") === col("b.gm") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= t)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // strings the bound cannot see: < q chars or ≤ q·t distinct grams
    val ndg = dg.groupBy("id").agg(count(lit(1)).as("ndg"))
    val tiny = uniq.join(ndg, Seq("id"), "left")
      .filter(col("len") < q || coalesce(col("ndg"), lit(0L)) <= q * t)
    val keyed = tiny.select(col("id"),
      explode(sequence(col("len"), col("len") + t)).as("k"))
    val shortCand = keyed.as("a").join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    gramCand.union(shortCand).distinct()
  }
}
