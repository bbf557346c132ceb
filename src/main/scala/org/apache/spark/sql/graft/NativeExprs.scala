// Lives under org.apache.spark.sql so the private[sql] Catalyst types
// (AbstractDataType, ExpressionUtils) are accessible — the standard
// placement for third-party native expressions. Public API: graft.functions.F.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code — the
  * generated code calls these directly (a static call the JIT inlines),
  * so both paths are one implementation and whole-stage codegen never
  * falls back to interpretation.
  */
object Kernels {

  /** MinHash permutation parameters (a_i, b_i), identical derivation to
    * graft.operators.Dedup.perms — fixed seed, so signatures are stable
    * across executors and runs.
    */
  private val MinhashP = 4294967311L
  private val MinhashM = 4294967296L
  private def permsFor(k: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = new Array[Long](k); val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = rnd.nextInt(Int.MaxValue - 1).toLong + 1
      b(i) = rnd.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (a, b)
  }
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** Fused MinHash signature kernel (see MinHashSig). */
  def minhashSig(shingles: ArrayData, numPerm: Int): ArrayData = {
    val (pa, pb) = permCache.computeIfAbsent(numPerm, permsFor)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(shingles.getUTF8String(i), StringType, 42L)
      val h32 = ((h % MinhashM) + MinhashM) % MinhashM // pmod, matches builtin
      var j = 0
      while (j < numPerm) {
        val v = (pa(j) * h32 + pb(j)) % MinhashP // positive: no pmod needed
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  /** Text-to-signature kernel: tokenize on single spaces (Spark
    * split-with-limit=-1 semantics, empties kept), slide a k-token
    * window, hash each shingle string, fold all permutation minima —
    * no intermediate shingle array materialized. Duplicate shingles
    * don't affect a minimum, so array_distinct is unnecessary here.
    * Returns null for documents with fewer than k tokens (the
    * `size(sh) > 0` filter of the array formulation).
    */
  def minhashSigText(text: UTF8String, k: Int, numPerm: Int): ArrayData = {
    val s = text.toString
    // split on ' ' keeping empty tokens (limit -1 semantics)
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var idx = s.indexOf(' ')
    while (idx >= 0) {
      toks.add(s.substring(start, idx)); start = idx + 1
      idx = s.indexOf(' ', start)
    }
    toks.add(s.substring(start))
    val n = toks.size
    if (n < k) return null
    val (pa, pb) = permCache.computeIfAbsent(numPerm, permsFor)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var t = 0
      while (t < k) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(i + t))
        t += 1
      }
      val h = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      val h32 = ((h % MinhashM) + MinhashM) % MinhashM
      var j = 0
      while (j < numPerm) {
        val v = (pa(j) * h32 + pb(j)) % MinhashP
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  private val markerSetCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[String]]()

  /** Count whitespace tokens of `text` that are in the comma-separated
    * `markers` set (exact string equality — same semantics as
    * size(filter(split(text,' '), w => w.isin(markers)))).
    */
  def markerCount(text: UTF8String, markers: UTF8String): Long = {
    val set = markerSetCache.computeIfAbsent(markers.toString, m => {
      val s = new java.util.HashSet[String]()
      m.split(',').foreach(s.add)
      s
    })
    val str = text.toString
    var count = 0L
    var start = 0
    while (start <= str.length) {
      var end = str.indexOf(' ', start)
      if (end < 0) end = str.length
      if (set.contains(str.substring(start, end))) count += 1
      start = end + 1
    }
    count
  }

  /** Vocab wire format: pieces joined by UNIT SEPARATOR (U+001F). A C0
    * control that never occurs in text, so — unlike the original CSV
    * encoding — pieces may contain commas (real BPE vocabs do). A
    * piece's id is its index in the joined sequence (first occurrence
    * wins for duplicates), which is what [[subwordIds]] emits.
    */
  val VocabSep: Char = '\u001F'

  /** Vocab pieces grouped by first char, longest first, each carrying
    * its vocab id — the greedy longest-match lookup structure. Built
    * once per distinct vocab string, shared across rows and threads.
    */
  private val subwordVocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashMap[Character, (Array[String], Array[Int])]]()

  private def buildSubwordVocab(joined: String)
      : java.util.HashMap[Character, (Array[String], Array[Int])] = {
    val byFirst = new java.util.HashMap[Character, (Array[String], Array[Int])]()
    joined.split(VocabSep).zipWithIndex
      .filter(_._1.nonEmpty)
      .distinctBy(_._1)
      .groupBy(_._1.charAt(0))
      .foreach { case (c, ps) =>
        val sorted = ps.sortBy { case (p, _) => (-p.length, p) }
        byFirst.put(c, (sorted.map(_._1), sorted.map(_._2)))
      }
    byFirst
  }

  /** Greedy longest-match subword segmentation (the WordPiece/BPE-apply
    * inference rule, public algorithm): at each position take the
    * longest vocab piece matching there; no match → consume one char as
    * an UNK token. Returns [n_subwords, n_unk]. Vocab is U+001F-joined
    * (see [[VocabSep]]); single pass, no allocation beyond the result
    * pair.
    */
  def subwordStats(text: UTF8String, vocabJoined: UTF8String): ArrayData = {
    val vocab = subwordVocabCache.computeIfAbsent(vocabJoined.toString, buildSubwordVocab)
    val s = text.toString
    var pos = 0
    var nSub = 0L
    var nUnk = 0L
    while (pos < s.length) {
      var matched = 0
      val candidates = vocab.get(s.charAt(pos))
      if (candidates != null) {
        val ps = candidates._1
        var i = 0
        while (i < ps.length && matched == 0) {
          if (s.startsWith(ps(i), pos)) matched = ps(i).length
          i += 1
        }
      }
      if (matched == 0) { nUnk += 1; pos += 1 } else pos += matched
      nSub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(nSub, nUnk))
  }

  /** Tokenize-MATERIALIZE: the same greedy longest-match walk as
    * [[subwordStats]], emitting the piece-id sequence itself (id =
    * piece index in the vocab; UNK char → −1). This is the step that
    * turns a mixture build into training-ready output — counts plan
    * the budget, ids are what a trainer consumes.
    */
  def subwordIds(text: UTF8String, vocabJoined: UTF8String): ArrayData = {
    val vocab = subwordVocabCache.computeIfAbsent(vocabJoined.toString, buildSubwordVocab)
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    out.sizeHint(s.length / 3 + 1)
    var pos = 0
    while (pos < s.length) {
      var matched = 0
      var id = -1
      val candidates = vocab.get(s.charAt(pos))
      if (candidates != null) {
        val ps = candidates._1
        var i = 0
        while (i < ps.length && matched == 0) {
          if (s.startsWith(ps(i), pos)) { matched = ps(i).length; id = candidates._2(i) }
          i += 1
        }
      }
      if (matched == 0) { out += -1; pos += 1 } else { out += id; pos += matched }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  /** Viterbi lattice segmentation (the unigram-LM DECODE step, public
    * algorithm — SentencePiece's inference rule with integer costs):
    * minimize total segmentation cost over the whole text, where a
    * vocab piece costs 1 and an UNK character costs 3 (minimal-token
    * "fertility" objective; a trained LM supplies real costs at scale
    * — the lattice DP is identical). Deterministic tie-break: at
    * equal cost the LONGER final piece wins, which fixes a unique
    * predecessor per position (a piece is determined by its end and
    * length). Emits piece ids (UNK → −1) like [[subwordIds]], but
    * globally OPTIMAL — greedy longest-match can be beaten when an
    * early long match blocks a longer suffix match; Viterbi never is
    * (piece count ≤ greedy's, a law the spec and oracle both pin).
    *
    * One forward pass with best-cost + backpointer arrays, one
    * backtrack; O(n·maxPieceLen) per row, no allocation beyond the
    * two int arrays.
    */
  private val vocabMaxLenCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  def viterbiIds(text: UTF8String, vocabJoined: UTF8String): ArrayData = {
    val joined = vocabJoined.toString
    val vocab = subwordVocabCache.computeIfAbsent(joined, buildSubwordVocab)
    val maxPieceLen: Int = vocabMaxLenCache.computeIfAbsent(joined,
      j => Integer.valueOf(
        j.split(VocabSep).foldLeft(1)((m, p) => math.max(m, p.length))))
    val s = text.toString
    val n = s.length
    val best = new Array[Int](n + 1)
    val predLen = new Array[Int](n + 1) // chosen len; 0 marks UNK
    val predId = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      // UNK baseline: consume one char
      best(i) = best(i - 1) + 3
      predLen(i) = 0
      predId(i) = -1
      // pieces ENDING at i: scan candidates starting at each j < i is
      // O(n·V); instead scan pieces STARTING at i−len for len ↓ —
      // equivalently all candidate pieces anchored at each start are
      // prefix-checked once per end via the by-first-char index
      var len = 1
      val lenCap = math.min(i, maxPieceLen)
      while (len <= lenCap) {
        val start = i - len
        val candidates = vocab.get(s.charAt(start))
        if (candidates != null) {
          val ps = candidates._1
          // candidates are length-DESCENDING: skip longer pieces,
          // stop as soon as lengths fall below the target
          var k = 0
          while (k < ps.length && ps(k).length > len) k += 1
          var found = false
          while (k < ps.length && ps(k).length == len && !found) {
            if (s.startsWith(ps(k), start)) {
              val c = best(start) + 1
              if (c < best(i) || (c == best(i) && len > predLen(i))) {
                best(i) = c; predLen(i) = len; predId(i) = candidates._2(k)
              }
              found = true
            }
            k += 1
          }
        }
        len += 1
      }
      i += 1
    }
    // backtrack
    var p = n
    var count = 0
    while (p > 0) { count += 1; p -= math.max(predLen(p), 1) }
    val ids = new Array[Int](count)
    p = n
    var w = count - 1
    while (p > 0) {
      ids(w) = predId(p)
      p -= math.max(predLen(p), 1)
      w -= 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(ids)
  }

  /** e16's cost-weighted form: [[viterbiIds]] with a TRAINED per-piece
    * cost table (the t23 unigram-LM trainer's output) instead of the
    * fixed piece-1/UNK-3 integers. `costsJoined` is comma-joined
    * longs: the UNK-character cost FIRST, then one cost per vocab
    * piece in vocab order (1e-9-nat fixed point — integer sums keep
    * the DP deterministic). Same lattice, same longer-final-piece
    * tie-break; emits piece ids (UNK → −1).
    */
  private val costVocabCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String),
    (java.util.HashMap[Character, (Array[String], Array[Int], Array[Long])],
      Long, Int)]()

  def viterbiCostIds(text: UTF8String, vocabJoined: UTF8String,
      costsJoined: UTF8String): ArrayData = {
    val key = (vocabJoined.toString, costsJoined.toString)
    val (vocab, unkCost, maxPieceLen) = costVocabCache.computeIfAbsent(key,
      k => {
        val pieces = k._1.split(VocabSep)
        val costs = k._2.split(',').map(_.trim.toLong)
        require(costs.length == pieces.length + 1,
          s"viterbi_cost_ids: ${costs.length} costs for ${pieces.length} " +
            "pieces (want pieces + 1: UNK cost first)")
        val byFirst =
          new java.util.HashMap[Character, (Array[String], Array[Int], Array[Long])]()
        pieces.zipWithIndex
          .filter(_._1.nonEmpty)
          .distinctBy(_._1)
          .groupBy(_._1.charAt(0))
          .foreach { case (c, ps) =>
            val sorted = ps.sortBy { case (p, _) => (-p.length, p) }
            byFirst.put(c, (sorted.map(_._1), sorted.map(_._2),
              sorted.map { case (_, i) => costs(i + 1) }))
          }
        val maxLen = pieces.foldLeft(1)((m, p) => math.max(m, p.length))
        (byFirst, costs(0), maxLen)
      })
    val s = text.toString
    val n = s.length
    val best = new Array[Long](n + 1)
    val predLen = new Array[Int](n + 1) // chosen len; 0 marks UNK
    val predId = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = best(i - 1) + unkCost
      predLen(i) = 0
      predId(i) = -1
      var len = 1
      val lenCap = math.min(i, maxPieceLen)
      while (len <= lenCap) {
        val start = i - len
        val candidates = vocab.get(s.charAt(start))
        if (candidates != null) {
          val ps = candidates._1
          var k = 0
          while (k < ps.length && ps(k).length > len) k += 1
          var found = false
          while (k < ps.length && ps(k).length == len && !found) {
            if (s.startsWith(ps(k), start)) {
              val c = best(start) + candidates._3(k)
              if (c < best(i) || (c == best(i) && len > predLen(i))) {
                best(i) = c; predLen(i) = len; predId(i) = candidates._2(k)
              }
              found = true
            }
            k += 1
          }
        }
        len += 1
      }
      i += 1
    }
    var p = n
    var count = 0
    while (p > 0) { count += 1; p -= math.max(predLen(p), 1) }
    val ids = new Array[Int](count)
    p = n
    var w = count - 1
    while (p > 0) {
      ids(w) = predId(p)
      p -= math.max(predLen(p), 1)
      w -= 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(ids)
  }

  /** Deterministic dot product: float→double per element, left-to-right
    * fold (SURVEY.md §4 determinism discipline).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Exact Jaccard over two DISTINCT long-hash arrays (the
    * [[shingleHashes64]] set form): |a∩b| via one flat open-addressing
    * probe table over the smaller... — over `a`; |a∪b| = |a|+|b|−|a∩b|.
    * Value-identical to size(array_intersect)/size(array_union) on
    * distinct inputs (integer counts, one IEEE division) — including
    * the 0/0 → NaN empty-empty edge — but one primitive linear-probe
    * pass instead of two generic set builds (measured 10×+ on the d02
    * verify leg). Inputs MUST be distinct (duplicates would inflate
    * the intersection count); every shingle-hash producer guarantees
    * that.
    */
  def jaccardH64(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0)
      return if (na + nb == 0) Double.NaN else 0.0
    var cap = 4
    while (cap < na * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var i = 0
    while (i < na) {
      val v = a.getLong(i)
      var p = (java.lang.Long.hashCode(v) * 0x9E3779B9) & mask
      while (used(p) && table(p) != v) p = (p + 1) & mask
      if (!used(p)) { used(p) = true; table(p) = v }
      i += 1
    }
    var inter = 0
    var j = 0
    while (j < nb) {
      val v = b.getLong(j)
      var p = (java.lang.Long.hashCode(v) * 0x9E3779B9) & mask
      while (used(p) && table(p) != v) p = (p + 1) & mask
      if (used(p)) inter += 1
      j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** e15: int8 scalar quantization of a float vector — per-vector
    * symmetric scale max|v|/127, code = floor(v/scale + 0.5) (explicit
    * floor form so DuckDB can replay it literally: Java's Math.round
    * and SQL round() disagree on negative halves). Every step is a
    * correctly-rounded IEEE double op, so the codes are engine-exact.
    * All-zero vectors quantize to all-zero codes.
    */
  def i8Quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble)
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0) {
      val scale = maxAbs / 127.0
      i = 0
      while (i < n) {
        out(i) = math.floor(v.getFloat(i).toDouble / scale + 0.5).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** e15: integer dot product over two int8 code arrays. Exact int64
    * arithmetic — order-independent, no float fold discipline needed;
    * |result| ≤ dim·127² so a 100M-dim vector is still overflow-free.
    */
  def i8Dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  /** Deterministic cosine over float arrays: float→double per element,
    * left-to-right fold (SURVEY.md §4 determinism discipline).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** 64-bit SimHash over space-delimited tokens. Token hash is Spark's
    * xxhash64 (seed 42) so the result is bit-identical to the
    * HOF composition in [[graft.operators.Dedup.simhash64]].
    */
  def simhash64(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val s = text.toString
    var start = 0
    while (start <= s.length) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = s.length
      val tok = UTF8String.fromString(s.substring(start, end))
      val h = XxHash64Function.hash(tok, StringType, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      start = end + 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** 64-bit polynomial rolling-hash fingerprint over UTF-8 bytes
    * (Rabin–Karp base-257 accumulation — order-sensitive, so content
    * permutations fingerprint differently, unlike bag-of-words hashes).
    */
  def fingerprint64(text: UTF8String): Long = {
    val bytes = text.getBytes
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) {
      h = h * 257L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Distinct 64-bit shingle hashes of the k-token shingles of `text` —
    * the hashed-set form of the HOF shingles() column. Tokenization is
    * identical to minhashSigText (split on single spaces, empties
    * kept); each shingle string hashes via xxhash64(seed 42);
    * first-occurrence order. Null for documents under k tokens (the
    * `size(sh) > 0` filter of the array formulation). Set operations
    * (distinct counts, intersect/union sizes) over the hashes are
    * value-identical to the string sets absent a 64-bit collision
    * (~1e-13 at a million shingles), while shuffles carry 8-byte longs
    * instead of ~50-byte strings.
    */
  def shingleHashes64(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var idx = s.indexOf(' ')
    while (idx >= 0) {
      toks.add(s.substring(start, idx)); start = idx + 1
      idx = s.indexOf(' ', start)
    }
    toks.add(s.substring(start))
    val n = toks.size
    if (n < k) return null
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var t = 0
      while (t < k) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(i + t))
        t += 1
      }
      seen.add(XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** POSITIONAL k-shingle hashes: one hash per shingle START POSITION,
    * in order, duplicates kept — array index IS the token position of
    * the shingle, which is what substring-level dedup (d08) needs and
    * the deduped set form ([[shingleHashes64]]) destroys. Same
    * tokenization (single-space split, empties kept) and same
    * xxhash64(seed 42) per shingle string, so the two forms agree on
    * shingle identity. Null for documents under k tokens.
    */
  def shingleHashesPos64(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var idx = s.indexOf(' ')
    while (idx >= 0) {
      toks.add(s.substring(start, idx)); start = idx + 1
      idx = s.indexOf(' ', start)
    }
    toks.add(s.substring(start))
    val n = toks.size
    if (n < k) return null
    val out = new Array[Long](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var t = 0
      while (t < k) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(i + t))
        t += 1
      }
      out(i) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-document repetition statistics in ONE pass:
    * [n_tokens, n_distinct, top_token_count, top_2gram_count,
    * n_2grams] over single-space tokens (empties kept — split
    * semantics). The t07 explode formulation materializes ~doc_len
    * rows per document into TWO doc-keyed aggregations; this kernel
    * touches each token once in place, turning repetition scoring
    * into a shuffle-free per-row projection. Gram identity is the
    * same "prev tok" string the concat_ws slice builds, so counts
    * are value-identical to the exploded form.
    */
  def repetitionStats(text: UTF8String): ArrayData = {
    val s = text.toString
    val tokCounts = new java.util.HashMap[String, Integer]()
    val gramCounts = new java.util.HashMap[String, Integer]()
    var nTokens = 0L
    var nGrams = 0L
    var topTok = 0L
    var topGram = 0L
    var prev: String = null
    var start = 0
    while (start <= s.length) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = s.length
      val tok = s.substring(start, end)
      nTokens += 1
      val c = tokCounts.merge(tok, 1, (a, b) => a + b)
      if (c > topTok) topTok = c.longValue()
      if (prev != null) {
        nGrams += 1
        val gc = gramCounts.merge(prev + " " + tok, 1, (a, b) => a + b)
        if (gc > topGram) topGram = gc.longValue()
      }
      prev = tok
      start = end + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(nTokens, tokCounts.size.toLong, topTok, topGram, nGrams))
  }

  /** Remove token ranges from `text`: tokens whose 0-based position
    * falls inside any [starts(k), ends(k)] are dropped, survivors
    * rejoin with single spaces. Spans must be sorted by start and
    * disjoint (d08's output contract) — the walk advances one span
    * pointer alongside the token scan, so cost is O(tokens + spans)
    * per row regardless of span count.
    */
  def removeTokenSpans(text: UTF8String, starts: ArrayData,
      ends: ArrayData): UTF8String = {
    val s = text.toString
    val n = starts.numElements()
    val sb = new java.lang.StringBuilder(s.length)
    var tokIdx = 0
    var spanIdx = 0
    var start = 0
    var first = true
    while (start <= s.length) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = s.length
      while (spanIdx < n && ends.getLong(spanIdx) < tokIdx) spanIdx += 1
      val drop = spanIdx < n && starts.getLong(spanIdx) <= tokIdx &&
        tokIdx <= ends.getLong(spanIdx)
      if (!drop) {
        if (!first) sb.append(' ')
        sb.append(s, start, end)
        first = false
      }
      tokIdx += 1
      start = end + 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** splitmix64 finalizer — the deterministic pseudo-random source for
    * SRP hyperplane signs (same constants as java.util.SplittableRandom).
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** ±1 hyperplane sign table for 64 planes × dim, derived from mix64
    * of the (plane, dim) index — no stored planes to ship, identical on
    * every executor. Cached per dim (64 × dim doubles ≈ 32 KB at 64-d).
    */
  private val srpPlaneCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def srpPlanes(dim: Int): Array[Array[Double]] =
    srpPlaneCache.computeIfAbsent(dim, d =>
      Array.tabulate(64, d)((bit, j) =>
        if ((mix64(bit.toLong * 65537L + j) & 1L) == 0L) 1.0 else -1.0))

  /** 64-bit sign-random-projection signature: bit i = [v · h_i > 0]
    * over 64 deterministic ±1 hyperplanes. One fused loop — the HOF
    * formulation (64 interpreted zip_with/aggregate dots per row) is
    * the 40× interpreted-expression trap this kernel family exists to
    * avoid. P(bit match) for vectors at angle θ is 1 − θ/π, the SRP
    * collision guarantee banding schemes build on.
    */
  def srpSig64(v: ArrayData): Long = {
    val n = v.numElements()
    val planes = srpPlanes(n)
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      val p = planes(bit)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += p(j) * v.getFloat(j); j += 1 }
      if (acc > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}

/** e06: native MinHash signature — one fused loop over the shingle
  * array computing all `numPerm` permutation minima. The HOF
  * formulation (zip_with outer, aggregate inner) is interpreted per
  * element by Spark's higher-order-function runtime (~40× slower at
  * corpus scale); this kernel is a plain nested loop the JIT vectorizes.
  * Hash/permutation math matches the HOF version bit-for-bit:
  * xxhash64(seed 42) → pmod 2^32 → (a·h+b) mod P, params drawn from
  * Random(42). `minhash_sig(shingles)` in SQL.
  */
case class MinHashSig(child: Expression, numPerm: Int = 64)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.minhashSig(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Kernels.minhashSig($c, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** e06b: MinHash signature straight from text — tokenize, shingle, hash
  * and fold minima in one kernel pass, no intermediate shingle array.
  * Null (not a signature) for documents shorter than `shingleK` tokens.
  * Bit-identical to MinHashSig over the shingles-array formulation.
  */
case class MinHashSigText(child: Expression, shingleK: Int, numPerm: Int = 64)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig_text"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.minhashSigText(input.asInstanceOf[UTF8String], shingleK, numPerm)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Kernels.minhashSigText(v.asInstanceOf[UTF8String], shingleK, numPerm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = org.apache.spark.sql.graft.Kernels.minhashSigText(
            ${childGen.value}, $shingleK, $numPerm);
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigText =
    copy(child = newChild)
}

/** Native codegen dot product over two array<float> columns — the
  * building block for norm-precomputed cosine: callers that score many
  * pairs per vector compute each side's norm once and divide, cutting
  * per-pair arithmetic to one fused dot loop. Same float→double
  * left-to-right fold as the cosine kernel, so
  * dot(a,b)/(norm(a)*norm(b)) is bit-identical to cosine_sim(a,b).
  * `dot_product(a, b)` in SQL after GraftExtensions registration.
  */
case class DotProd(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.Kernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
}

/** e17: native exact Jaccard over two distinct long-hash shingle sets
  * — the dedup families' verification kernel (d02/d04/d11/d17 score
  * every CANDIDATE pair with it, so it is the hot loop once banding
  * has done its job). One primitive probe-table pass replaces the
  * builtin array_intersect + array_union pair (two generic set
  * builds per row), value-identically. `jaccard_h64(a, b)` in SQL.
  */
case class JaccardH64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_h64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaccardH64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.Kernels.jaccardH64($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardH64 =
    copy(left = newLeft, right = newRight)
}

/** e15: int8 scalar quantization of an array<float> embedding — the
  * 100 TB ANN memory lever: codes are 4× smaller than float32, so a
  * corpus whose float vectors spill to disk keeps its codes in executor
  * memory. Pairs with [[I8Dot]] for the coarse scoring pass; exact
  * re-rank on the surviving candidates restores full precision.
  * `i8_quantize(v)` in SQL.
  */
case class I8Quantize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "i8_quantize"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.i8Quantize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.sql.graft.Kernels.i8Quantize($v)")

  override protected def withNewChildInternal(newChild: Expression): I8Quantize =
    copy(child = newChild)
}

/** e15: exact int64 dot product over two int8 code arrays — the
  * quantized scoring kernel. Integer accumulation is order-independent,
  * so this is the one similarity score with NO float-fold determinism
  * caveat. `i8_dot(a, b)` in SQL.
  */
case class I8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType
  override def prettyName: String = "i8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.i8Dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.Kernels.i8Dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): I8Dot =
    copy(left = newLeft, right = newRight)
}

/** e08: native marker-token counter — counts whitespace tokens present
  * in a comma-separated marker set. Replaces the interpreted
  * size(filter(split(...), isin(...))) HOF on text hot paths (language
  * ID scoring, stopword ratios). `marker_count(text, markers)` in SQL.
  */
case class MarkerCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "marker_count"

  override protected def nullSafeEval(t: Any, m: Any): Any =
    Kernels.markerCount(t.asInstanceOf[UTF8String], m.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) =>
      s"org.apache.spark.sql.graft.Kernels.markerCount($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MarkerCount =
    copy(left = newLeft, right = newRight)
}

/** e11: native subword tokenizer-apply — greedy longest-match
  * segmentation against a comma-separated vocab, returning
  * [n_subwords, n_unk] in one codegen'd pass. The model-tokenizer
  * token counter for mixture planning (t08/c06): whitespace counts
  * over- or under-budget a mixture by the subword fertility of each
  * source. `subword_stats(text, vocab)` in SQL.
  */
case class SubwordStats(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "subword_stats"

  override protected def nullSafeEval(t: Any, v: Any): Any =
    Kernels.subwordStats(t.asInstanceOf[UTF8String], v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, v) =>
      s"org.apache.spark.sql.graft.Kernels.subwordStats($t, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubwordStats =
    copy(left = newLeft, right = newRight)
}

/** e11b: tokenize-materialize — the piece-id sequence of the greedy
  * longest-match segmentation (id = piece index in the vocab, UNK
  * char → −1). Same walk, same per-executor vocab cache as
  * [[SubwordStats]]; this is the `array<int>` a trainer consumes,
  * where the stats form only budgets. `subword_ids(text, vocab)` in
  * SQL.
  */
case class SubwordIds(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "subword_ids"

  override protected def nullSafeEval(t: Any, v: Any): Any =
    Kernels.subwordIds(t.asInstanceOf[UTF8String], v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, v) =>
      s"org.apache.spark.sql.graft.Kernels.subwordIds($t, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubwordIds =
    copy(left = newLeft, right = newRight)
}

/** e16: Viterbi lattice segmentation — the unigram-LM decode rule
  * with integer costs (piece 1, UNK 3; equal cost → longer final
  * piece). Globally optimal where e11b is greedy; `viterbi_ids` in
  * SQL after GraftExtensions registration.
  */
case class ViterbiIds(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "viterbi_ids"

  override protected def nullSafeEval(t: Any, v: Any): Any =
    Kernels.viterbiIds(t.asInstanceOf[UTF8String], v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, v) =>
      s"org.apache.spark.sql.graft.Kernels.viterbiIds($t, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ViterbiIds =
    copy(left = newLeft, right = newRight)
}

/** e16's cost-weighted form: Viterbi decode against TRAINED per-piece
  * costs (t23's unigram-LM trainer output; comma-joined longs, UNK
  * cost first). `viterbi_cost_ids(text, vocab, costs)` in SQL after
  * GraftExtensions registration.
  */
case class ViterbiCostIds(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "viterbi_cost_ids"

  override protected def nullSafeEval(t: Any, v: Any, cst: Any): Any =
    Kernels.viterbiCostIds(t.asInstanceOf[UTF8String],
      v.asInstanceOf[UTF8String], cst.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, v, cst) =>
      s"org.apache.spark.sql.graft.Kernels.viterbiCostIds($t, $v, $cst)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ViterbiCostIds =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** e01: native codegen cosine similarity over two array<float> columns.
  * `cosine_sim(a, b)` in SQL after GraftExtensions registration.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.Kernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** e02: native codegen 64-bit SimHash of a text column.
  * `simhash64(text)` in SQL after GraftExtensions registration.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Kernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** t04 kernel as an expression: 64-bit rolling-hash fingerprint.
  * `fingerprint64(text)` in SQL after GraftExtensions registration.
  */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.fingerprint64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Kernels.fingerprint64($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** e10: native shingle-hash set — tokenize, shingle, hash, dedup in
  * one kernel pass (no interpreted transform/concat_ws/array_distinct
  * chain, no string intermediates into the shuffle). Null for
  * documents shorter than `shingleK` tokens.
  */
case class ShingleHashes64(child: Expression, shingleK: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes64"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.shingleHashes64(input.asInstanceOf[UTF8String], shingleK)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Kernels.shingleHashes64(v.asInstanceOf[UTF8String], shingleK)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = org.apache.spark.sql.graft.Kernels.shingleHashes64(
            ${childGen.value}, $shingleK);
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes64 =
    copy(child = newChild)
}

/** e14: token-span removal — drop tokens inside sorted disjoint
  * [start, end] position ranges and rejoin with single spaces; the
  * apply step of substring dedup (d09). `remove_token_spans(text,
  * starts, ends)` in SQL.
  */
case class RemoveTokenSpans(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_token_spans"

  override protected def nullSafeEval(t: Any, s: Any, e: Any): Any =
    Kernels.removeTokenSpans(t.asInstanceOf[UTF8String],
      s.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s, e) =>
      s"org.apache.spark.sql.graft.Kernels.removeTokenSpans($t, $s, $e)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RemoveTokenSpans =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** e13: one-pass per-document repetition statistics —
  * [n_tokens, n_distinct, top_token_count, top_2gram_count, n_2grams].
  * `repetition_stats(text)` in SQL.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Kernels.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** e12: positional shingle hashes — one 64-bit hash per shingle start
  * position, order-preserving and duplicate-keeping (index = token
  * position). The substring-dedup (d08) companion of e10's deduped
  * set form. Null for documents shorter than `shingleK` tokens.
  */
case class ShinglePosHashes64(child: Expression, shingleK: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_pos_hashes64"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.shingleHashesPos64(input.asInstanceOf[UTF8String], shingleK)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Kernels.shingleHashesPos64(v.asInstanceOf[UTF8String], shingleK)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = org.apache.spark.sql.graft.Kernels.shingleHashesPos64(
            ${childGen.value}, $shingleK);
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglePosHashes64 =
    copy(child = newChild)
}

/** e09: native 64-bit SRP (sign-random-projection) signature of an
  * embedding column — the vector-space analogue of e02's text SimHash,
  * shared by the banded near-dup self-join (d06) and available to ANN
  * bucketing. `srp_sig64(embedding)` in SQL after GraftExtensions
  * registration.
  */
case class SrpSig64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_sig64"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.srpSig64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Kernels.srpSig64($c)")

  override protected def withNewChildInternal(newChild: Expression): SrpSig64 =
    copy(child = newChild)
}

/** Column↔Expression bridge for the public graft API (ExpressionUtils
  * is private[sql]; this subpackage placement grants access).
  */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
