package graft

/** DuckDB oracle SQL, one entry per SparkEntry.queries key.
  *
  * Determinism discipline (SURVEY.md §4): monetary aggregates go
  * through DECIMAL(18,4) exactly as the Spark side does, then CAST to
  * DOUBLE; integral sums CAST to BIGINT (DuckDB integer SUM widens to
  * HUGEINT, which would break the schema compare); every query has a
  * total ORDER BY.
  */
object Oracles {

  /** The shared banded-Hamming replay (d03/m04/m06/m08 all pair on
    * 4 bands of `bandBits` bits and verify popcount ≤ 3): reads the
    * persisted 64-bit signatures and replays banding, candidate
    * self-join, Hamming verify, threshold and ordering in SQL.
    */
  private def bandedHammingSql(auxTable: String, sigCol: String,
      bandBits: Int): String = {
    val mask = (1 << bandBits) - 1
    s"""WITH sigs AS (SELECT doc_id, $sigCol AS sg
       |  FROM '${OracleAux.Root}/$auxTable/*.parquet'),
       |bnd AS (SELECT doc_id, sg, j AS band,
       |          (sg >> (j*$bandBits)) & $mask AS bh
       |        FROM sigs, generate_series(0,3) g(j)),
       |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |            CAST(bit_count(xor(x.sg, y.sg)) AS BIGINT) AS hamming
       |          FROM bnd x JOIN bnd y ON x.band = y.band AND x.bh = y.bh
       |            AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** The s10/s11 PQ-ADC replay: encode every corpus vector against
    * the persisted codebooks (the dot-identity argmax with first-max
    * tie-break), build the query's ADC table, score as the ORDERED
    * j-sum of table lookups (list(t ORDER BY j) → list_sum preserves
    * Spark's fixed reduce order), coarse-cut to k·rerank, and rerank
    * by exact kernel cosine. `cellCtes`/`adcFrom` splice in s11's IVF
    * probe (s10 passes the identity).
    */
  private def pqAdcSql(cellCtes: String, adcFrom: String): String =
    s"""WITH books AS (SELECT j, c, CAST(cv AS DOUBLE[]) AS cv
       |  FROM '${OracleAux.Root}/s10_books/*.parquet'),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings WHERE vec_id <> 0),
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv,
       |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |                              CAST(embedding AS DOUBLE[]))) AS qn
       |      FROM embeddings WHERE vec_id = 0),
       |ds AS (SELECT len(v) // 16 AS d FROM e LIMIT 1),
       |enc AS (SELECT vec_id, j, c AS code FROM (
       |    SELECT e.vec_id, b.j, b.c,
       |      row_number() OVER (PARTITION BY e.vec_id, b.j
       |        ORDER BY
       |          list_dot_product(e.v[b.j*ds.d+1 : b.j*ds.d+ds.d], b.cv)
       |            / sqrt(list_dot_product(e.v, e.v))
       |            - list_dot_product(b.cv, b.cv)/2.0 DESC,
       |          b.c) AS rn
       |    FROM e CROSS JOIN books b CROSS JOIN ds) t WHERE rn = 1),
       |ltab AS (SELECT b.j, b.c,
       |    list_dot_product(list_transform(
       |      q.qv[b.j*ds.d+1 : b.j*ds.d+ds.d], x -> x/q.qn), b.cv) AS t
       |  FROM books b, q, ds),
       |adc AS (SELECT enc.vec_id,
       |    round(list_sum(list(lt.t ORDER BY lt.j)), 4) AS pq_sim
       |  FROM enc JOIN ltab lt ON enc.j = lt.j AND enc.code = lt.c
       |  GROUP BY enc.vec_id),
       |$cellCtes
       |top AS (SELECT vec_id, pq_sim FROM (
       |    SELECT *, row_number() OVER (ORDER BY pq_sim DESC, vec_id)
       |      AS rn
       |    FROM $adcFrom) t WHERE rn <= 80),
       |scored AS (SELECT t.vec_id,
       |    round(list_dot_product(e.v, q.qv) /
       |      (sqrt(list_dot_product(e.v, e.v)) *
       |       sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos_sim,
       |    t.pq_sim
       |  FROM top t JOIN e ON t.vec_id = e.vec_id, q)
       |SELECT vec_id, cos_sim, pq_sim FROM (
       |  SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id)
       |    AS rn FROM scored) t
       |WHERE rn <= 10
       |ORDER BY cos_sim DESC, vec_id""".stripMargin

  /** The d11/d13 admission-gate replay: persisted MinHash signatures
    * of the demo lake and batch → banding by signature slices →
    * asymmetric new×lake candidate join → exact string-shingle
    * Jaccard on the SQL-rebuilt tagged corpora → best lake match per
    * new doc (jaccard desc, lake id asc) → admission verdicts for the
    * whole batch (short docs have no signature and therefore admit).
    */
  private val AdmissionGateSql: String =
    s"""WITH sl AS (SELECT doc_id, sig
       |  FROM '${OracleAux.Root}/d11_sigs_lake/*.parquet'),
       |sn AS (SELECT doc_id, sig
       |  FROM '${OracleAux.Root}/d11_sigs_new/*.parquet'),
       |bl AS (SELECT doc_id, j AS band, sig[j*4+1:j*4+4] AS bs
       |       FROM sl, generate_series(0,15) g(j)),
       |bn AS (SELECT doc_id, j AS band, sig[j*4+1:j*4+4] AS bs
       |       FROM sn, generate_series(0,15) g(j)),
       |cand AS (SELECT DISTINCT n.doc_id AS new_id, l.doc_id AS lake_id
       |         FROM bn n JOIN bl l ON n.band = l.band AND n.bs = l.bs),
       |toksl AS (SELECT doc_id,
       |            list_transform(string_split(text, ' '),
       |              t -> t || '_' || CAST(doc_id AS VARCHAR)) AS w
       |          FROM documents),
       |neww AS (SELECT doc_id + 2000000 AS doc_id,
       |           list_append(w, 'resubmitted') AS w
       |         FROM toksl WHERE doc_id % 3 = 0
       |         UNION ALL
       |         SELECT doc_id + 3000000,
       |           list_transform(string_split(text, ' '),
       |             t -> t || '_' || CAST(doc_id + 3000000 AS VARCHAR))
       |         FROM documents
       |         WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0),
       |shl AS (SELECT doc_id,
       |          list_distinct(list_transform(range(1, len(w)-5+2),
       |            i -> array_to_string(w[i:i+4], ' '))) AS s
       |        FROM toksl WHERE len(w) >= 5),
       |shn AS (SELECT doc_id,
       |          list_distinct(list_transform(range(1, len(w)-5+2),
       |            i -> array_to_string(w[i:i+4], ' '))) AS s
       |        FROM neww WHERE len(w) >= 5),
       |ver AS (SELECT new_id, lake_id,
       |          round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |                len(list_distinct(list_concat(a.s, b.s))), 4)
       |            AS jaccard
       |        FROM cand JOIN shn a ON new_id = a.doc_id
       |                  JOIN shl b ON lake_id = b.doc_id),
       |best AS (SELECT new_id, lake_id, jaccard,
       |           row_number() OVER (PARTITION BY new_id
       |             ORDER BY jaccard DESC, lake_id) AS rn
       |         FROM ver WHERE jaccard >= 0.7)
       |SELECT n.doc_id, b.lake_id IS NULL AS admit,
       |  b.lake_id AS dup_of, b.jaccard AS jaccard
       |FROM (SELECT doc_id FROM neww) n
       |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON n.doc_id = b.new_id
       |ORDER BY n.doc_id""".stripMargin

  /** The SRP Hamming<=2 probe replay (persisted signatures, XOR-mask
    * probe set, exact-cosine top-k) - serves s02 AND the s07 indexed
    * probe, whose contract is exactly this flat answer.
    */
  private val SrpProbeSql: String =
    s"""WITH sigs AS (SELECT vec_id, sig
         |  FROM '${OracleAux.Root}/s02_sigs/*.parquet'),
         |q AS (SELECT sig AS qsig FROM sigs WHERE vec_id = 0),
         |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
         |       FROM embeddings WHERE vec_id = 0),
         |masks AS (SELECT CAST(0 AS BIGINT) AS m
         |  UNION ALL SELECT CAST(1 AS BIGINT) << i
         |    FROM generate_series(0,7) g(i)
         |  UNION ALL SELECT (CAST(1 AS BIGINT) << i) | (CAST(1 AS BIGINT) << j)
         |    FROM generate_series(0,6) a(i), generate_series(0,7) b(j)
         |    WHERE j > i),
         |probes AS (SELECT DISTINCT xor(qsig, m) AS p FROM q, masks),
         |cand AS (SELECT s.vec_id FROM sigs s
         |         JOIN probes ON s.sig = probes.p
         |         WHERE s.vec_id <> 0)
         |SELECT e.vec_id,
         |  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.v) /
         |    (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
         |                           CAST(e.embedding AS DOUBLE[]))) *
         |     sqrt(list_dot_product(qv.v, qv.v))), 4) AS cos_sim
         |FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, qv
         |ORDER BY cos_sim DESC, e.vec_id
         |LIMIT 10""".stripMargin

  /** The IVF nprobe=4 probe replay (persisted centroids, first-max
    * cell assignment, probe-cell selection, exact-cosine top-k) -
    * serves s04 AND the s08 indexed probe.
    */
  private val IvfProbeSql: String =
    s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS cv
         |  FROM '${OracleAux.Root}/s04_cents/*.parquet'),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings WHERE vec_id <> 0),
         |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
         |       FROM embeddings WHERE vec_id = 0),
         |qcells AS (SELECT cell FROM (
         |    SELECT k.cell,
         |      row_number() OVER (ORDER BY list_dot_product(qv.v, k.cv)
         |        DESC, k.cell) AS rn
         |    FROM cents k, qv) t
         |  WHERE rn <= 4),
         |celled AS (SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, k.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, k.cv) DESC, k.cell) AS rn
         |    FROM e CROSS JOIN cents k) t
         |  WHERE rn = 1)
         |SELECT c.vec_id,
         |  round(list_dot_product(c.v, qv.v) /
         |    (sqrt(list_dot_product(c.v, c.v)) *
         |     sqrt(list_dot_product(qv.v, qv.v))), 4) AS cos_sim
         |FROM celled c JOIN qcells ON c.cell = qcells.cell, qv
         |ORDER BY cos_sim DESC, vec_id
         |LIMIT 10""".stripMargin

  /** Fixed-point revenue sum, identical to Num.revenueSum. */
  private val REV =
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
      "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)"

  /** The t08/t09 greedy longest-match tokenizer as a recursive CTE,
    * generated from the SAME vocab constant the native kernel uses
    * (single source of truth — vocab drift can't silently pass). A
    * piece's id is its index in the constant, the same id contract the
    * e11b kernel emits.
    */
  private def subwordVocabValues: String =
    graft.operators.TextOps.SubwordVocab.zipWithIndex
      .map { case (p, i) => s"('${p.replace("'", "''")}', $i)" }.mkString(",")

  private def SubwordStepCte: String =
    s"""WITH RECURSIVE vocab(piece, id, len) AS (
       |  SELECT piece, id, length(piece) FROM (VALUES $subwordVocabValues) t(piece, id)),
       |step(doc_id, pos, n_sub, n_unk, text) AS (
       |  SELECT doc_id, 1, 0, 0, text FROM documents
       |  UNION ALL
       |  SELECT doc_id,
       |    pos + COALESCE((SELECT MAX(len) FROM vocab
       |                    WHERE substr(text, pos, len) = piece), 1),
       |    n_sub + 1,
       |    n_unk + CASE WHEN (SELECT MAX(len) FROM vocab
       |                       WHERE substr(text, pos, len) = piece) IS NULL
       |            THEN 1 ELSE 0 END,
       |    text
       |  FROM step WHERE pos <= length(text))""".stripMargin

  /** t09 variant: the same walk accumulating the piece-id sequence
    * itself (UNK → −1), comma-prefixed per step so the final
    * `substr(ids, 2)` is the CSV the Spark side emits via concat_ws.
    */
  private def SubwordIdsCte: String =
    s"""WITH RECURSIVE vocab(piece, id, len) AS (
       |  SELECT piece, id, length(piece) FROM (VALUES $subwordVocabValues) t(piece, id)),
       |step(doc_id, pos, ids, text) AS (
       |  SELECT doc_id, 1, '', text FROM documents
       |  UNION ALL
       |  SELECT doc_id,
       |    pos + COALESCE((SELECT MAX(len) FROM vocab
       |                    WHERE substr(text, pos, len) = piece), 1),
       |    ids || ',' || CAST(COALESCE(
       |      (SELECT id FROM vocab WHERE substr(text, pos, len) = piece
       |       ORDER BY len DESC LIMIT 1), -1) AS VARCHAR),
       |    text
       |  FROM step WHERE pos <= length(text))""".stripMargin

  /** Shared CTE prefix for the g01/g02 graph oracles: rebuilds the
    * HOST link graph g03 extracts from the planted markup — the
    * affine link formula directly in host-name space (the extraction
    * itself is independently oracled by g03_link_extract's
    * regex-replay; these oracles verify the recurrence over the same
    * edges), self-links dropped, doc-level links collapsed to integer
    * weights, plus out-weights, the node set, and its count.
    */
  private def graphEdgesCte: String =
    """WITH e0 AS (SELECT ((doc_id // 5) % 50) AS s,
      |              unnest([1,2,3]) AS k, (doc_id % 5) AS v
      |            FROM documents),
      |edges AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
      |          FROM (SELECT 'site' || s || '.example.com' AS src,
      |                  'site' || ((s * 7 + k * 13 + v * 11) % 50) ||
      |                    '.example.com' AS dst
      |                FROM e0
      |                UNION ALL
      |                SELECT 'site' || ((doc_id // 5) % 50) || '.example.com',
      |                  'mirror.example.net'
      |                FROM documents WHERE doc_id % 5 = 0) t
      |          WHERE dst <> src GROUP BY src, dst),
      |ow AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
      |       FROM edges GROUP BY src),
      |nodes AS MATERIALIZED (SELECT src AS node FROM edges
      |          UNION SELECT dst FROM edges),
      |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)""".stripMargin

  /** g01's integer PageRank recurrence, unrolled to `iters` chained
    * CTEs (DuckDB recursive CTEs cannot aggregate in the recursive
    * term, and the iteration count is fixed anyway). Every step is
    * the exact BIGINT recurrence the Spark loop runs — floor `//`
    * equals Spark's truncating `div` on the non-negative operands.
    */
  /** The unrolled g01 CTE chain (edges → r0 → r`iters`), WITHOUT the
    * final SELECT — shared by the g01 oracle and compositions that
    * consume host ranks (g07). Begins with `WITH`.
    */
  private def pageRankCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""d$i AS (SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang
         |  FROM r${i - 1} r LEFT JOIN ow o ON o.src = r.node
         |  WHERE o.src IS NULL),
         |r$i AS MATERIALIZED (SELECT nd.node,
         |  (15 * (CAST(1000000000 AS BIGINT) // nn.n)) // 100
         |    + (85 * (COALESCE(inf.inflow, CAST(0 AS BIGINT))
         |             + dg.dang // nn.n)) // 100 AS rank
         |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$i dg
         |  LEFT JOIN (SELECT e.dst,
         |               CAST(SUM((r.rank * e.w) // o.outw) AS BIGINT) AS inflow
         |             FROM r${i - 1} r JOIN edges e ON e.src = r.node
         |             JOIN ow o ON o.src = e.src
         |             GROUP BY e.dst) inf ON inf.dst = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""$graphEdgesCte,
       |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) // n AS rank
       |       FROM nodes CROSS JOIN nn),
       |$steps""".stripMargin
  }

  private def pageRankSql(iters: Int): String =
    s"""${pageRankCtes(iters)}
       |SELECT nd.node, COALESCE(o.outw, CAST(0 AS BIGINT)) AS out_w,
       |  r.rank AS rank_e9
       |FROM nodes nd
       |LEFT JOIN ow o ON o.src = nd.node
       |JOIN r$iters r ON r.node = nd.node
       |ORDER BY rank_e9 DESC, nd.node""".stripMargin

  /** g02's integer HITS recurrence, unrolled: per iteration the raw
    * authority/hub sums then exact L1 normalization to 1e9 — the
    * `raw * 1e9 // tot` numerator goes through HUGEINT exactly as
    * the Spark side routes it through DECIMAL(38,0) `div`.
    */
  private def hitsSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.dst, CAST(SUM(h.h * e.w) AS BIGINT) AS araw
         |  FROM h${i - 1} h JOIN edges e ON e.src = h.node GROUP BY e.dst),
         |at$i AS (SELECT CAST(SUM(araw) AS BIGINT) AS tot FROM ar$i),
         |a$i AS MATERIALIZED (SELECT nd.node,
         |    CAST((CAST(COALESCE(ar.araw, 0) AS HUGEINT) * 1000000000)
         |         // t.tot AS BIGINT) AS a
         |  FROM nodes nd CROSS JOIN at$i t
         |  LEFT JOIN ar$i ar ON ar.dst = nd.node),
         |hr$i AS MATERIALIZED (SELECT e.src, CAST(SUM(a.a * e.w) AS BIGINT) AS hraw
         |  FROM a$i a JOIN edges e ON e.dst = a.node GROUP BY e.src),
         |ht$i AS (SELECT CAST(SUM(hraw) AS BIGINT) AS tot FROM hr$i),
         |h$i AS MATERIALIZED (SELECT nd.node,
         |    CAST((CAST(COALESCE(hr.hraw, 0) AS HUGEINT) * 1000000000)
         |         // t.tot AS BIGINT) AS h
         |  FROM nodes nd CROSS JOIN ht$i t
         |  LEFT JOIN hr$i hr ON hr.src = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""$graphEdgesCte,
       |h0 AS (SELECT node, CAST(1000000000 AS BIGINT) // n AS h
       |       FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT nd.node, h.h AS hub_e9, a.a AS auth_e9
       |FROM nodes nd
       |JOIN h$iters h ON h.node = nd.node
       |JOIN a$iters a ON a.node = nd.node
       |ORDER BY auth_e9 DESC, nd.node""".stripMargin
  }

  /** One t23 EM round as chained CTEs: Viterbi DP over the capped
    * word table against inventory `inv${r-1}` (a 4-slot rolling
    * window — [[operators.TextOps.Unigram.MaxPieceLen]] — of best
    * costs, t21's window technique but cost-weighted), a backtrack
    * accumulating the chosen pieces (chr(31)-joined so pieces may
    * contain commas; −1 in the length track marks an UNK char),
    * freq-weighted piece counts, and the re-costed inventory via the
    * ln-memo side-table. A count divergence from the Spark trainer
    * surfaces as a MISSING memo row (inner join) — loud, never a
    * silent drift.
    *
    * NB the DP's argmin is a list-lambda fold over a PRE-JOINED
    * candidate list (`pc$r`), not t21's correlated scalar subquery:
    * DuckDB 1.0 silently mis-evaluates a correlated subquery inside a
    * recursive CTE when it scans a DERIVED CTE (t21's vocab is a
    * VALUES constant, which is why its shape is safe there — measured
    * on this very query: len-1 candidates randomly missed). Plain
    * joins in recursive terms are fine (the g04 walk joins a derived
    * CTE every round). The argmin key packs (cost, length) into one
    * BIGINT — `cost*8 + (4 − len)`, UNK len −1 → +5 — so one
    * list_min realizes cost-asc/len-desc with UNK losing ties,
    * exactly the kernel's tie-break.
    */
  private def unigramRoundSql(r: Int): String = {
    val unk = operators.TextOps.Unigram.UnkCostE9
    s"""pc$r AS MATERIALIZED (SELECT p.w, p.e,
       |    list({'l': v.len, 'c': v.cost_e9}) AS cands
       |  FROM (SELECT w, unnest(range(1, length(w) + 1)) AS e
       |        FROM words) p
       |  JOIN inv${r - 1} v
       |    ON v.len <= p.e
       |   AND substr(p.w, CAST(p.e - v.len + 1 AS INTEGER),
       |         CAST(v.len AS INTEGER)) = v.piece
       |  GROUP BY p.w, p.e),
       |fwd$r(w, freq, pos, b1, b2, b3, b4, lens) AS (
       |  SELECT w, freq, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
       |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS BIGINT), ''
       |  FROM words
       |  UNION ALL
       |  SELECT w, freq, pos + 1, b2, b3, b4, k // 8,
       |    lens || ',' || CAST(4 - (k % 8) AS VARCHAR)
       |  FROM (SELECT f.w, f.freq, f.pos, f.b2, f.b3, f.b4, f.lens,
       |      list_min(list_append(
       |        list_filter(
       |          list_transform(coalesce(c.cands, []), x ->
       |            (CASE x['l'] WHEN 1 THEN f.b4 WHEN 2 THEN f.b3
       |               WHEN 3 THEN f.b2 ELSE f.b1 END + x['c']) * 8
       |              + (4 - x['l'])),
       |          y -> y IS NOT NULL),
       |        (f.b4 + $unk) * 8 + 5)) AS k
       |    FROM fwd$r f
       |    LEFT JOIN pc$r c ON c.w = f.w AND c.e = f.pos + 1
       |    WHERE f.pos < length(f.w)) x),
       |seg$r AS (SELECT w, freq, string_split(substr(lens, 2), ',') AS la
       |  FROM fwd$r WHERE pos = length(w)),
       |bwd$r(w, freq, pos, la, path) AS (
       |  SELECT w, freq, length(w), la, '' FROM seg$r
       |  UNION ALL
       |  SELECT w, freq,
       |    pos - CASE WHEN la[pos] = '-1' THEN 1
       |               ELSE CAST(la[pos] AS BIGINT) END,
       |    la,
       |    CASE WHEN la[pos] = '-1' THEN path
       |         WHEN path = '' THEN substr(w,
       |           CAST(pos - CAST(la[pos] AS BIGINT) + 1 AS BIGINT),
       |           CAST(la[pos] AS BIGINT))
       |         ELSE substr(w,
       |           CAST(pos - CAST(la[pos] AS BIGINT) + 1 AS BIGINT),
       |           CAST(la[pos] AS BIGINT)) || chr(31) || path END
       |  FROM bwd$r WHERE pos > 0),
       |cnt$r AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(string_split(path, chr(31))) AS piece
       |        FROM bwd$r WHERE pos = 0 AND path <> '') t
       |  GROUP BY piece),
       |tot$r AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM cnt$r),
       |inv$r AS MATERIALIZED (SELECT c.piece,
       |    CAST(length(c.piece) AS BIGINT) AS len, c.cnt, m.cost_e9
       |  FROM cnt$r c CROSS JOIN tot$r t
       |  JOIN lnmemo m ON m.cnt = c.cnt AND m.total = t.total)""".stripMargin
  }

  /** t23's full replay: capped word table → weighted substring seed →
    * [[unigramRoundSql]] × Rounds (hard-EM) → loss prune (per
    * multi-char piece, the cost of its best segmentation WITHOUT
    * itself, same DP minus one inventory row) → keep verdicts.
    */
  private def unigramTrainSql: String = {
    val U = operators.TextOps.Unigram
    val rounds = (1 to U.Rounds).map(unigramRoundSql).mkString(",\n")
    val last = s"inv${U.Rounds}"
    s"""WITH RECURSIVE lnmemo AS (SELECT cnt, total, cost_e9
       |  FROM '${OracleAux.Root}/t23_ln/*.parquet'),
       |words AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
       |  WHERE length(w) > 0
       |  GROUP BY w ORDER BY freq DESC, w LIMIT 50000),
       |ls AS (SELECT w, freq,
       |    unnest(range(1, ${U.MaxPieceLen + 1})) AS l FROM words),
       |ss AS (SELECT w, freq, l,
       |    unnest(range(1, length(w) - l + 2)) AS s
       |  FROM ls WHERE l <= length(w)),
       |sub AS (SELECT substr(w, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS piece,
       |    CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM ss GROUP BY piece),
       |seed AS (SELECT piece, cnt FROM sub
       |  ORDER BY cnt DESC, piece LIMIT ${U.SeedN}),
       |tot0 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM seed),
       |inv0 AS MATERIALIZED (SELECT s.piece,
       |    CAST(length(s.piece) AS BIGINT) AS len, s.cnt, m.cost_e9
       |  FROM seed s CROSS JOIN tot0 t
       |  JOIN lnmemo m ON m.cnt = s.cnt AND m.total = t.total),
       |$rounds,
       |mp AS (SELECT piece, len, cnt, cost_e9 FROM $last WHERE len > 1),
       |ppc AS MATERIALIZED (SELECT p.pw, p.e,
       |    list({'l': v.len, 'c': v.cost_e9}) AS cands
       |  FROM (SELECT piece AS pw, unnest(range(1, length(piece) + 1)) AS e
       |        FROM mp) p
       |  JOIN $last v
       |    ON v.piece <> p.pw AND v.len <= p.e
       |   AND substr(p.pw, CAST(p.e - v.len + 1 AS INTEGER),
       |         CAST(v.len AS INTEGER)) = v.piece
       |  GROUP BY p.pw, p.e),
       |pf(pw, pos, b1, b2, b3, b4) AS (
       |  SELECT piece, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
       |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS BIGINT)
       |  FROM mp
       |  UNION ALL
       |  SELECT f.pw, f.pos + 1, f.b2, f.b3, f.b4,
       |    list_min(list_append(
       |      list_filter(
       |        list_transform(coalesce(c.cands, []), x ->
       |          CASE x['l'] WHEN 1 THEN f.b4 WHEN 2 THEN f.b3
       |            WHEN 3 THEN f.b2 ELSE f.b1 END + x['c']),
       |        y -> y IS NOT NULL),
       |      f.b4 + ${U.UnkCostE9}))
       |  FROM pf f
       |  LEFT JOIN ppc c ON c.pw = f.pw AND c.e = f.pos + 1
       |  WHERE f.pos < length(f.pw)),
       |alt AS (SELECT pw AS piece, b4 AS alt_cost
       |  FROM pf WHERE pos = length(pw)),
       |loss AS (SELECT m.piece, m.cnt, m.cost_e9,
       |    -- saturated at +/-Long.MaxValue, mirroring the trainer's
       |    -- clampedLoss (an unchecked product would error in HUGEINT
       |    -- exactly where Scala would silently wrap)
       |    CAST(least(greatest(CAST(m.cnt AS HUGEINT)
       |        * (a.alt_cost - m.cost_e9), -9223372036854775807),
       |      9223372036854775807) AS BIGINT) AS loss_e9
       |  FROM mp m JOIN alt a USING (piece)),
       |keepset AS (SELECT piece FROM loss
       |  ORDER BY loss_e9 DESC, cnt DESC, piece LIMIT ${U.KeepMulti})
       |SELECT piece, cnt, cost_e9, CAST(-1 AS BIGINT) AS loss_e9,
       |  CAST(1 AS BIGINT) AS kept
       |FROM $last WHERE len = 1
       |UNION ALL
       |SELECT l.piece, l.cnt, l.cost_e9, l.loss_e9,
       |  CAST(CASE WHEN k.piece IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |FROM loss l LEFT JOIN keepset k USING (piece)
       |ORDER BY piece""".stripMargin
  }

  /** t03b's replay, generated from the SAME range/plant constants the
    * Spark side uses (TextOps.ScriptRanges carries each range in both
    * Java `\uXXXX` and RE2 `\x{XXXX}` spellings — t18's portability
    * discipline) plus t03's marker-word CASE for the side-by-side
    * pred_lang column.
    */
  private def scriptIdSql: String = {
    val plants = operators.TextOps.ScriptPlants.map { case (v, p) =>
      s"WHEN doc_id % 6 = $v THEN '$p' || doc_id"
    }.mkString("\n         ")
    val counts = operators.TextOps.ScriptRanges.map { case (n, _, re2) =>
      s"CAST(len(regexp_extract_all(text, '$re2')) AS BIGINT) AS n_$n"
    }.mkString(",\n    ")
    val names = operators.TextOps.ScriptRanges.map(_._1)
    val g = names.map("n_" + _).mkString("greatest(", ", ", ")")
    val scriptCase = names.map(n => s"WHEN n_$n = $g THEN '$n'")
      .mkString("\n    ")
    val cols = names.map("n_" + _).mkString(", ")
    s"""WITH planted AS (SELECT doc_id,
       |    CASE $plants
       |         ELSE text END AS text
       |  FROM documents),
       |s AS (SELECT doc_id, text,
       |    $counts,
       |    len(list_filter(string_split(lower(text), ' '),
       |      t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS s_de,
       |    len(list_filter(string_split(lower(text), ' '),
       |      t -> t IN ('the','and','of','to','is','with','that'))) AS s_en,
       |    len(list_filter(string_split(lower(text), ' '),
       |      t -> t IN ('el','la','los','las','que','es','una'))) AS s_es,
       |    len(list_filter(string_split(lower(text), ' '),
       |      t -> t IN ('le','la','les','est','une','dans','pas'))) AS s_fr,
       |    len(list_filter(string_split(lower(text), ' '),
       |      t -> t IN ('的','是','不','在','了','我','有'))) AS s_zh
       |  FROM planted)
       |SELECT doc_id, $cols,
       |  CASE WHEN $g = 0 THEN 'und'
       |    $scriptCase
       |    ELSE 'und' END AS pred_script,
       |  CASE
       |    WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
       |    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
       |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
       |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
       |    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
       |    ELSE 'zh'
       |  END AS pred_lang
       |FROM s
       |ORDER BY doc_id""".stripMargin
  }

  /** g06's full CTE chain (plant → parse → group scoping → rules →
    * frontier → longest-match argmax), ending in
    * `perm(doc_id, host, path, matched_len, matched_rule, allowed)`.
    * No `WITH` prefix so compositions (g07) can splice it after other
    * chains; all names are disjoint from [[pageRankCtes]]'s. The
    * longest-match tie-break counts OCTETS (RFC 9309 §2.2.2): DuckDB
    * `strlen` = bytes, matching Spark's `octet_length`. The argmax
    * window partitions by (doc_id, host, path) — the Spark kernel
    * partitions by a minted row-unique id, which is equivalent here
    * because the demo frontier carries no duplicate rows (SQL has no
    * row identity to replay the duplicate-preserving form).
    */
  /** The shared demo-host index CTE (one row per distinct host index
    * s) — g05-g10's plants all derive from it, so it is spliced ONCE
    * per composed query (the robots and sitemap chains both read it).
    */
  private def hostsCte: String =
    """hosts AS (SELECT DISTINCT ((doc_id // 5) % 50) AS s
      |  FROM documents)""".stripMargin

  private def robotsPermCtes: String =
    s"""$hostsCte,
      |${robotsRuleCtes},
      |${demoUrlsCte},
      |${permEvalCtes("urls")}""".stripMargin

  /** robots.txt plant → parse → group scoping → LIKE patterns, ending
    * in `pats(host, rule, prefix, pattern)`. Requires [[hostsCte]].
    */
  private def robotsRuleCtes: String =
    """rb AS (SELECT 'site' || s || '.example.com' AS host,
      |    'User-agent: googlebot' || chr(10) || 'User-agent: *' || chr(10) ||
      |    'Disallow: /private # keep out' || chr(10) ||
      |    'Allow: /private/pub' || chr(10) ||
      |    'Disallow: /cgi' || (s % 3) || chr(10) ||
      |    'Disallow: /*.tmp$' || chr(10) || 'Allow: /dl/*/ok' || chr(10) ||
      |    chr(10) ||
      |    'User-agent: strictbot' || chr(10) || 'Disallow: /' || chr(10)
      |      AS body
      |  FROM hosts),
      |l0 AS (SELECT host, string_split(body, chr(10)) AS ln FROM rb),
      |l1 AS (SELECT host, ln,
      |    unnest(generate_series(1, len(ln))) AS i FROM l0),
      |rlines AS (SELECT host, i - 1 AS pos,
      |    trim(regexp_replace(ln[CAST(i AS INTEGER)], '#.*', '')) AS line
      |  FROM l1),
      |flg AS (SELECT host, pos, line,
      |    regexp_matches(line, '(?i)^user-agent\s*:') AS is_ua
      |  FROM rlines WHERE line <> ''),
      |f1 AS (SELECT host, pos, line, is_ua,
      |    COALESCE(lag(is_ua) OVER (PARTITION BY host ORDER BY pos), FALSE)
      |      AS prev_ua
      |  FROM flg),
      |f2 AS (SELECT *, SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY host ORDER BY pos ROWS UNBOUNDED PRECEDING)
      |      AS run_id
      |  FROM f1),
      |star AS (SELECT DISTINCT host, run_id FROM f2
      |  WHERE is_ua AND
      |    trim(regexp_extract(line, '(?i)^user-agent\s*:\s*(.*)$', 1)) = '*'),
      |rules AS (SELECT r.host, r.rule, r.prefix FROM (
      |    SELECT host, run_id,
      |      lower(regexp_extract(line, '(?i)^(allow|disallow)\s*:', 1)) AS rule,
      |      trim(regexp_extract(line, '(?i)^(?:allow|disallow)\s*:\s*(.*)$', 1))
      |        AS prefix
      |    FROM f2 WHERE regexp_matches(line, '(?i)^(allow|disallow)\s*:')) r
      |  JOIN star s ON s.host = r.host AND s.run_id = r.run_id
      |  WHERE r.prefix <> ''),
      |pats AS (SELECT host, rule, prefix,
      |    CASE WHEN ends_with(w0, '$')
      |         THEN substr(w0, 1, length(w0) - 1)
      |         ELSE w0 || '%' END AS pattern
      |  FROM (SELECT host, rule, prefix,
      |      replace(replace(replace(replace(prefix,
      |        '\', '\\'), '%', '\%'), '_', '\_'), '*', '%') AS w0
      |    FROM rules) t)""".stripMargin

  /** The crawled-link demo frontier — `urls(doc_id, host, path)`. */
  private def demoUrlsCte: String =
    """urls AS (SELECT doc_id,
      |    'site' || ((doc_id // 5) % 50) || '.example.com' AS host,
      |    CASE doc_id % 8 WHEN 0 THEN '/docs/' || doc_id
      |      WHEN 1 THEN '/private/' || doc_id
      |      WHEN 2 THEN '/private/pub/' || doc_id
      |      WHEN 3 THEN '/cgi' || (doc_id % 3) || '/' || doc_id
      |      WHEN 4 THEN '/cgi9/' || doc_id
      |      WHEN 5 THEN '/files/' || doc_id || '.tmp'
      |      WHEN 6 THEN '/files/' || doc_id || '.tmp.bak'
      |      ELSE '/dl/' || doc_id || '/ok' END AS path
      |  FROM documents)""".stripMargin

  /** g06's longest-match evaluation of the frontier CTE `$urlsName`
    * against `pats`, ending in
    * `perm(doc_id, host, path, matched_len, matched_rule, allowed)`.
    */
  private def permEvalCtes(urlsName: String): String =
    s"""mt AS (SELECT u.doc_id, u.host, u.path, r.rule, r.prefix,
      |    (r.prefix IS NOT NULL AND u.path LIKE r.pattern ESCAPE '\\') AS hit
      |  FROM $urlsName u LEFT JOIN pats r ON r.host = u.host),
      |prk AS (SELECT *, row_number() OVER (PARTITION BY doc_id, host, path
      |    ORDER BY
      |    CASE WHEN hit THEN strlen(prefix) ELSE -1 END DESC,
      |    CASE WHEN rule = 'allow' THEN 0 ELSE 1 END, prefix) AS rn FROM mt),
      |perm AS (SELECT doc_id, host, path,
      |    CAST(CASE WHEN hit THEN strlen(prefix) ELSE 0 END AS BIGINT)
      |      AS matched_len,
      |    CASE WHEN hit THEN rule ELSE 'none' END AS matched_rule,
      |    CAST(CASE WHEN NOT hit OR rule = 'allow' THEN 1 ELSE 0 END
      |      AS BIGINT) AS allowed
      |  FROM prk WHERE rn = 1)""".stripMargin

  /** The g08 sitemap chain (plant -> block split -> field
    * extraction -> path/scope projection), ending in
    * `smf(host, ord, loc, path, lastmod, priority, in_scope)`.
    * Requires [[hostsCte]]; internal names are smb0/smb1/sme/smf0
    * so compositions (g09/g10) can splice it beside the robots and
    * rank chains without collisions.
    */
  private def sitemapCtes: String =
    """sm AS (SELECT 'site' || s || '.example.com' AS host,
      |    '<?xml version="1.0"?>' || chr(10) || '<urlset>' || chr(10) ||
      |    '  <url>' || chr(10) || '    <loc>https://site' || s ||
      |      '.example.com/p/0</loc>' || chr(10) ||
      |    '    <lastmod>2026-01-' || lpad(CAST((s + 0) % 28 + 1 AS VARCHAR), 2, '0') ||
      |      '</lastmod>' || chr(10) ||
      |    '    <priority>0.' || ((s * 7 + 0) % 10) || '</priority>' ||
      |      chr(10) || '  </url>' || chr(10) ||
      |    '  <url>' || chr(10) || '    <loc>https://site' || s ||
      |      '.example.com/p/1</loc>' || chr(10) ||
      |    '    <lastmod>2026-01-' || lpad(CAST((s + 1) % 28 + 1 AS VARCHAR), 2, '0') ||
      |      '</lastmod>' || chr(10) ||
      |    '    <priority>0.' || ((s * 7 + 1) % 10) || '</priority>' ||
      |      chr(10) || '  </url>' || chr(10) ||
      |    '  <url>' || chr(10) || '    <loc>https://site' || s ||
      |      '.example.com/p/2</loc>' || chr(10) ||
      |    '    <lastmod>2026-01-' || lpad(CAST((s + 2) % 28 + 1 AS VARCHAR), 2, '0') ||
      |      '</lastmod>' || chr(10) ||
      |    '    <priority>0.' || ((s * 7 + 2) % 10) || '</priority>' ||
      |      chr(10) || '  </url>' || chr(10) ||
      |    '  <url>' || chr(10) || '    <loc>https://site' || s ||
      |      '.example.com/p/3</loc>' || chr(10) || '  </url>' || chr(10) ||
      |    '  <url>' || chr(10) || '    <loc>https://site' || ((s + 1) % 50) ||
      |      '.example.com/p/4</loc>' || chr(10) || '  </url>' || chr(10) ||
      |    '</urlset>' || chr(10) AS xml
      |  FROM hosts),
      |smb0 AS (SELECT host, regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1)
      |    AS bl FROM sm),
      |smb1 AS (SELECT host, bl,
      |    unnest(generate_series(1, len(bl))) AS i FROM smb0),
      |sme AS (SELECT host, CAST(i - 1 AS BIGINT) AS ord,
      |    bl[CAST(i AS INTEGER)] AS entry FROM smb1),
      |smf0 AS (SELECT host, ord,
      |    regexp_extract(entry, '<loc>([^<]*)</loc>', 1) AS loc,
      |    regexp_extract(entry, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod,
      |    regexp_extract(entry, '<priority>([^<]*)</priority>', 1) AS priority
      |  FROM sme),
      |smf AS (SELECT host, ord, loc,
      |    regexp_extract(loc, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/.*)$', 1)
      |      AS path,
      |    lastmod, priority,
      |    CAST(lower(regexp_extract(loc,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) = lower(host)
      |      AS BIGINT) AS in_scope
      |  FROM smf0)""".stripMargin

  private val sqlBase: Map[String, String] = Map(
    "g01_pagerank" -> pageRankSql(10),
    "g02_hits" -> hitsSql(10),
    "t23_unigram_train" -> unigramTrainSql,
    "t03b_script_id" -> scriptIdSql,

    // g11: rebuild the two planted URL families, replay the digit-run
    // template collapse (DuckDB regexp_replace needs the 'g' flag to
    // match Spark's replace-all default), the distinct-path counts,
    // the host-share window, and the depth-AND-concentration verdict
    // (integer cross-multiplication, no floats)
    "g11_trap_detect" ->
      ("""WITH u0 AS (
        |  SELECT 'site' || ((doc_id // 5) % 50) || '.example.com' AS host,
        |    '/docs/' || doc_id AS path
        |  FROM documents
        |  UNION ALL
        |  SELECT 'site' || ((doc_id // 5) % 50) || '.example.com',
        |    '/cal/' || doc_id || '/' || k || '/' || k
        |  FROM documents, (SELECT unnest([1, 2, 3, 4]) AS k) ks
        |  WHERE doc_id % 5 = 0),
        |t AS (SELECT host,
        |    regexp_replace(path, '[0-9]+', '{d}', 'g') AS template, path
        |  FROM u0),
        |c AS (SELECT host, template,
        |    CAST(COUNT(DISTINCT path) AS BIGINT) AS n_urls
        |  FROM t GROUP BY 1, 2),
        |w AS (SELECT *, SUM(n_urls) OVER (PARTITION BY host) AS host_urls,
        |    (length(template) - length(replace(template, '{d}', ''))) // 3
        |      AS runs
        |  FROM c)
        |SELECT host, template, n_urls, CAST(runs AS BIGINT) AS digit_runs,
        |  CAST(CASE WHEN runs >= 3 AND n_urls * 4 >= host_urls
        |    AND n_urls >= """.stripMargin +
      operators.Graph.TrapMinUrls.toString +
      """
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_trap
        |FROM w
        |ORDER BY host, template""".stripMargin),

    // g05: rebuild the meta-robots plant byte-for-byte (incl. the
    // tolerant-markup variants: reversed attribute order, single /
    // no quotes, whitespace around '='), replay the two-step tolerant
    // extraction ((?i) inline groups + \b boundaries — RE2-portable,
    // no lookaround) and the REP directive semantics
    "g05_robots_gate" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head>' ||
        |    CASE WHEN doc_id % 4 = 1
        |           THEN '<meta name="robots" content="noindex"/>'
        |         WHEN doc_id % 12 = 2
        |           THEN '<meta content=''none, noarchive'' name=robots />'
        |         WHEN doc_id % 12 = 10
        |           THEN '<meta name="robots" content="noindex,' ||
        |                chr(9) || 'nofollow">'
        |         WHEN doc_id % 4 = 2
        |           THEN '<meta content=''index, nofollow'' name=robots />'
        |         WHEN doc_id % 4 = 3
        |           THEN '<META NAME = ''ROBOTS'' CONTENT = "NOINDEX, NOFOLLOW"/>'
        |         ELSE '' END ||
        |    '</head><body><p>' || text || '</p></body></html>' AS html
        |  FROM documents),
        |tg AS (SELECT doc_id,
        |    regexp_extract(html,
        |      '(?i)<meta\b(?:[^>"'']|"[^"]*"|''[^'']*'')*?[\s"''/]name\s*=\s*(?:"robots"(?:[^>"'']|"[^"]*"|''[^'']*'')*|''robots''(?:[^>"'']|"[^"]*"|''[^'']*'')*|robots[\s/](?:[^>"'']|"[^"]*"|''[^'']*'')*|robots)>',
        |      0) AS tag
        |  FROM h),
        |f AS (SELECT doc_id, lower(COALESCE(
        |    nullif(regexp_extract(tag,
        |      '(?i)[\s"''/]content\s*=\s*"([^"]*)"', 1), ''),
        |    nullif(regexp_extract(tag,
        |      '(?i)[\s"''/]content\s*=\s*''([^'']*)''', 1), ''),
        |    regexp_extract(tag,
        |      '(?i)[\s"''/]content\s*=\s*([^\s"''/>]+)', 1))) AS robots
        |  FROM tg),
        |g AS (SELECT doc_id, robots,
        |    CAST(list_contains(list_transform(string_split(robots, ','),
        |        x -> regexp_replace(x, '^\s+|\s+$', '', 'g')), 'noindex')
        |      OR list_contains(list_transform(string_split(robots, ','),
        |        x -> regexp_replace(x, '^\s+|\s+$', '', 'g')), 'none')
        |      AS BIGINT) AS noindex,
        |    CAST(list_contains(list_transform(string_split(robots, ','),
        |        x -> regexp_replace(x, '^\s+|\s+$', '', 'g')), 'nofollow')
        |      OR list_contains(list_transform(string_split(robots, ','),
        |        x -> regexp_replace(x, '^\s+|\s+$', '', 'g')), 'none')
        |      AS BIGINT) AS nofollow
        |  FROM f)
        |SELECT doc_id, robots, noindex, nofollow,
        |  CAST(1 - noindex AS BIGINT) AS admit
        |FROM g ORDER BY doc_id""".stripMargin,

    // g06: rebuild the per-host robots.txt plant and the URL frontier
    // byte-for-byte, replay the CRLF/comment-tolerant line split, the
    // user-agent group scoping (consecutive UA lines form one RUN,
    // empty lines dropped before run detection — RFC 9309 §2.2), the
    // `*`-group rule extraction, and the longest-match/allow-wins-ties
    // evaluation with wildcard/anchor rules as escaped LIKE patterns
    "g06_robots_txt" ->
      s"""WITH $robotsPermCtes
         |SELECT doc_id, host, path, matched_len, matched_rule, allowed
         |FROM perm
         |ORDER BY doc_id""".stripMargin,

    // g07: the governance pieces COMPOSED into a fetch plan — g01's
    // unrolled rank CTEs + g06's permission CTEs (disjoint names) +
    // the per-host running-budget window
    "g07_frontier_plan" ->
      s"""${pageRankCtes(10)},
         |$robotsPermCtes,
         |jn AS (SELECT p.doc_id, p.host, p.path,
         |    CAST(COALESCE(r.rank, 0) AS BIGINT) AS rank_e9, p.allowed
         |  FROM perm p LEFT JOIN r10 r ON r.node = p.host),
         |wb AS (SELECT *, SUM(allowed) OVER (PARTITION BY host
         |    ORDER BY doc_id, path ROWS UNBOUNDED PRECEDING) AS runa
         |  FROM jn)
         |SELECT doc_id, host, path, rank_e9, allowed,
         |  CAST(CASE WHEN allowed = 1
         |    AND runa <= ${operators.Graph.DefaultFetchBudget}
         |    THEN 1 ELSE 0 END AS BIGINT) AS fetch
         |FROM wb
         |ORDER BY doc_id""".stripMargin,

    // g08: rebuild the per-host sitemap plant byte-for-byte, replay
    // the (?s) lazy block split, the per-field extraction (optional
    // fields '' when absent), the loc path, and the same-host scope
    // flag ([[sitemapCtes]] — shared with the g09/g10 compositions)
    "g08_sitemap_extract" ->
      s"""WITH $hostsCte,
         |$sitemapCtes
         |SELECT host, ord, loc, path, lastmod, priority, in_scope
         |FROM smf
         |ORDER BY host, ord""".stripMargin,

    // g09: the crawl axis composed end to end — g08's in-scope
    // discovered URLs (minted NEGATIVE doc_ids: publisher-declared
    // URLs take budget priority) union the crawled-link frontier,
    // g06's permission argmax evaluates the merged set, g01's ranks
    // and the per-host running budget plan the fetches; every chain
    // spliced into ONE query
    "g09_discovered_plan" ->
      s"""${pageRankCtes(10)},
         |$hostsCte,
         |$robotsRuleCtes,
         |$demoUrlsCte,
         |$sitemapCtes,
         |u9 AS (SELECT doc_id, host, path FROM urls
         |  UNION ALL
         |  SELECT -(CAST(regexp_extract(host, '^site(\\d+)\\.', 1)
         |      AS BIGINT) * 8 + ord) - 1 AS doc_id, host, path
         |  FROM smf WHERE in_scope = 1),
         |${permEvalCtes("u9")},
         |jn AS (SELECT p.doc_id, p.host, p.path,
         |    CAST(COALESCE(r.rank, 0) AS BIGINT) AS rank_e9, p.allowed
         |  FROM perm p LEFT JOIN r10 r ON r.node = p.host),
         |wb AS (SELECT *, SUM(allowed) OVER (PARTITION BY host
         |    ORDER BY doc_id, path ROWS UNBOUNDED PRECEDING) AS runa
         |  FROM jn)
         |SELECT doc_id, host, path, rank_e9, allowed,
         |  CAST(CASE WHEN allowed = 1
         |    AND runa <= ${operators.Graph.DiscoveredFetchBudget}
         |    THEN 1 ELSE 0 END AS BIGINT) AS fetch
         |FROM wb
         |ORDER BY doc_id""".stripMargin,

    // g10: recrawl/freshness planning — the admitted-ledger plant,
    // the lastmod-vs-admitted diff (new/stale/fresh; missing lastmod
    // on an admitted URL is fresh), and the g07 budget window over
    // refetch-eligible rows with the freshness columns carried
    "g10_recrawl_plan" ->
      s"""${pageRankCtes(10)},
         |$hostsCte,
         |$sitemapCtes,
         |adm AS (SELECT 'site' || s || '.example.com' AS host,
         |    '/p/' || ord AS path,
         |    '2026-01-' || lpad(CAST((s * 5 + ord) % 28 + 1 AS VARCHAR),
         |      2, '0') AS admitted_on
         |  FROM (SELECT s, unnest([0, 1, 2, 3]) AS ord FROM hosts) t
         |  WHERE (s + ord) % 3 <> 0),
         |disc AS (SELECT -(CAST(regexp_extract(host, '^site(\\d+)\\.', 1)
         |      AS BIGINT) * 8 + ord) - 1 AS doc_id, host, path, lastmod
         |  FROM smf WHERE in_scope = 1),
         |fst AS (SELECT d.doc_id, d.host, d.path, d.lastmod, a.admitted_on,
         |    CASE WHEN a.admitted_on IS NULL THEN 'new'
         |         WHEN regexp_extract(d.lastmod,
         |             '^(\\d{4}-\\d{2}-\\d{2})', 1) <> ''
         |           AND regexp_extract(d.lastmod,
         |             '^(\\d{4}-\\d{2}-\\d{2})', 1) > a.admitted_on
         |           THEN 'stale'
         |         ELSE 'fresh' END AS status
         |  FROM disc d LEFT JOIN adm a
         |    ON a.host = d.host AND a.path = d.path),
         |jn AS (SELECT f.*, CAST(CASE WHEN f.status <> 'fresh'
         |      THEN 1 ELSE 0 END AS BIGINT) AS allowed,
         |    CAST(COALESCE(r.rank, 0) AS BIGINT) AS rank_e9
         |  FROM fst f LEFT JOIN r10 r ON r.node = f.host),
         |wb AS (SELECT *, SUM(allowed) OVER (PARTITION BY host
         |    ORDER BY doc_id, path ROWS UNBOUNDED PRECEDING) AS runa
         |  FROM jn)
         |SELECT doc_id, host, path, rank_e9, allowed,
         |  CAST(CASE WHEN allowed = 1
         |    AND runa <= ${operators.Graph.DefaultFetchBudget}
         |    THEN 1 ELSE 0 END AS BIGINT) AS fetch,
         |  lastmod, admitted_on, status
         |FROM wb
         |ORDER BY doc_id""".stripMargin,



    // t24: rebuild the five-block plant byte-for-byte, replay the
    // block split (lazy regex), the tag strip, all three densities
    // (integer cross-multiplication), and the verdict ladder
    "t24_main_content" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><body><div><a href="/home">home</a> ' ||
        |    '<a href="/docs">docs</a> <a href="/about">about</a> menu' ||
        |    (doc_id % 5) || '</div><p>' || text ||
        |    ' and this is the rest of the story in a sea of the common' ||
        |    ' words</p><div>promo box ' || (doc_id % 7) ||
        |    '</div><div>alpha beta gamma delta epsilon zeta eta theta iota ' ||
        |    (doc_id % 3) ||
        |    '</div><div>copyright acme <a href="/terms">terms</a> ' ||
        |    '<a href="/privacy">privacy</a></div></body></html>' AS html
        |  FROM documents),
        |b0 AS (SELECT doc_id,
        |    regexp_extract_all(html, '<(?:div|p)>(.*?)</(?:div|p)>', 1) AS bl
        |  FROM h),
        |bx AS (SELECT doc_id, unnest(generate_series(1, len(bl))) AS i, bl
        |  FROM b0),
        |b AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS blk,
        |    bl[CAST(i AS INTEGER)] AS raw FROM bx),
        |f AS (SELECT doc_id, blk,
        |    trim(regexp_replace(regexp_replace(raw, '<[^>]*>', '', 'g'),
        |      ' {2,}', ' ', 'g')) AS block_text,
        |    array_to_string(regexp_extract_all(raw,
        |      '<a href="[^"]*">([^<]*)</a>', 1), '') AS link_txt
        |  FROM b),
        |g AS (SELECT doc_id, blk, block_text,
        |    CAST(length(block_text) AS BIGINT) AS n_chars,
        |    -- array_to_string of an empty list is NULL in DuckDB 1.0
        |    CAST(COALESCE(length(link_txt), 0) AS BIGINT) AS link_chars,
        |    CAST(CASE WHEN block_text = '' THEN 0
        |      ELSE len(string_split(block_text, ' ')) END AS BIGINT) AS n_words,
        |    CAST(len(list_filter(string_split(block_text, ' '),
        |      x -> list_contains(
        |        ['the','a','an','and','in','of','to','is','this'], x)))
        |      AS BIGINT) AS n_stop
        |  FROM f)
        |SELECT doc_id, blk, block_text, n_chars, link_chars, n_words, n_stop,
        |  CASE WHEN link_chars * 3 > n_chars THEN 'bad'
        |       WHEN n_words < 8 THEN 'short'
        |       WHEN n_stop * 16 >= n_words THEN 'content'
        |       ELSE 'low' END AS verdict
        |FROM g ORDER BY doc_id, blk""".stripMargin,

    // c26: per-doc gram explode + bloom-verdict join + threshold
    // replayed from the kernel-boundary side-tables (the bloom probe
    // itself is the non-SQL kernel; the spec pins its no-false-
    // negative law); short docs left-join back as (0, 0, clean).
    "c26_bloom_decontam" ->
      s"""WITH g AS (SELECT doc_id, h
         |  FROM '${OracleAux.Root}/c26_grams/*.parquet'),
         |v AS (SELECT h, hit FROM '${OracleAux.Root}/c26_hits/*.parquet'),
         |agg AS (SELECT doc_id,
         |    CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(SUM(hit) AS BIGINT) AS n_hits
         |  FROM g JOIN v USING (h) GROUP BY doc_id),
         |train AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0)
         |SELECT t.doc_id,
         |  CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(COALESCE(a.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(a.n_hits, 0) >= 1 AS BIGINT) AS contaminated
         |FROM train t LEFT JOIN agg a USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    // g04: the host-edge CTE (g01/g02's), the two mutual-backbone
    // windows, then the d07 recursive-CTE component walk — min
    // reachable host is the cluster id (bytewise string MIN, the same
    // order Spark's star contraction uses); non-backbone hosts
    // singleton to themselves via the left join.
    "g04_host_communities" ->
      """WITH RECURSIVE e0 AS (SELECT ((doc_id // 5) % 50) AS s,
        |              unnest([1,2,3]) AS k, (doc_id % 5) AS v
        |            FROM documents),
        |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |          FROM (SELECT 'site' || s || '.example.com' AS src,
        |                  'site' || ((s * 7 + k * 13 + v * 11) % 50) ||
        |                    '.example.com' AS dst
        |                FROM e0
        |                UNION ALL
        |                SELECT 'site' || ((doc_id // 5) % 50) || '.example.com',
        |                  'mirror.example.net'
        |                FROM documents WHERE doc_id % 5 = 0) t
        |          WHERE dst <> src GROUP BY src, dst),
        |topout AS (SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
        |    FROM edges) x WHERE rk <= 2),
        |topin AS (SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY dst ORDER BY w DESC, src) AS rk
        |    FROM edges) x WHERE rk <= 2),
        |bb AS (SELECT o.src, o.dst FROM topout o
        |       JOIN topin i ON o.src = i.src AND o.dst = i.dst),
        |-- DISTINCT over UNION ALL, not UNION: inside WITH RECURSIVE
        |-- DuckDB gives any  a UNION b  CTE recursive treatment and
        |-- skips the cross-part dedup
        |nodes AS (SELECT DISTINCT host FROM (
        |    SELECT src AS host FROM edges
        |    UNION ALL SELECT dst FROM edges) u),
        |bidir AS (SELECT src AS a, dst AS b FROM bb
        |          UNION ALL SELECT dst, src FROM bb),
        |walk(n, lab) AS (
        |  SELECT a, a FROM bidir
        |  UNION
        |  SELECT e.b, wk.lab FROM walk wk JOIN bidir e ON e.a = wk.n),
        |lab0 AS (SELECT n AS host, MIN(lab) AS cluster_id FROM walk GROUP BY n),
        |lab AS (SELECT nd.host, COALESCE(l.cluster_id, nd.host) AS cluster_id
        |        FROM nodes nd LEFT JOIN lab0 l ON l.host = nd.host),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM lab GROUP BY cluster_id)
        |SELECT lab.host, lab.cluster_id, sz.cluster_size
        |FROM lab JOIN sz USING (cluster_id)
        |ORDER BY host""".stripMargin,

    // g03: rebuild the planted html byte-for-byte, then replay the
    // EXTRACTION itself — canonical-link host as source, every
    // <a href> host as destination, relative hrefs (no scheme → empty
    // host) and self-links dropped — on the same RE2-portable
    // patterns the Spark side codegens.
    "g03_link_extract" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><head><link rel="canonical" href="https://site' ||
        |    ((doc_id // 5) % 50) || '.example.com/docs/' || (doc_id // 5) ||
        |    '"/></head><body><p>' || text || '</p>' ||
        |    '<a href="https://site' ||
        |      ((((doc_id // 5) % 50) * 7 + 1 * 13 + (doc_id % 5) * 11) % 50) ||
        |      '.example.com/p/' || doc_id || '">r1</a> ' ||
        |    '<a href="https://site' ||
        |      ((((doc_id // 5) % 50) * 7 + 2 * 13 + (doc_id % 5) * 11) % 50) ||
        |      '.example.com/p/' || doc_id || '">r2</a> ' ||
        |    '<a href="https://site' ||
        |      ((((doc_id // 5) % 50) * 7 + 3 * 13 + (doc_id % 5) * 11) % 50) ||
        |      '.example.com/p/' || doc_id || '">r3</a> ' ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN '<a href="https://mirror.example.net/snap/' || doc_id ||
        |        '">m</a> '
        |      ELSE '' END ||
        |    '<a href="/local/nav">nav</a></body></html>' AS html
        |  FROM documents),
        |e AS (SELECT
        |    lower(regexp_extract(
        |      regexp_extract(html, 'rel="canonical" href="([^"]*)"', 1),
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS src_host,
        |    unnest(regexp_extract_all(html, '<a href="([^"]*)"', 1)) AS href
        |  FROM h),
        |d AS (SELECT src_host,
        |    lower(regexp_extract(href,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS dst_host
        |  FROM e)
        |SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS w
        |FROM d
        |WHERE src_host <> '' AND dst_host <> '' AND dst_host <> src_host
        |GROUP BY src_host, dst_host
        |ORDER BY src_host, dst_host""".stripMargin,

    // replays the CMS build (cell counts from the persisted xxhash
    // coordinates), the min-over-rows estimate, and the exact counts
    "t22_cms_topk" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
         |             FROM documents),
         |tk AS MATERIALIZED (SELECT token FROM toks WHERE len(token) > 0),
         |aux AS MATERIALIZED (SELECT token, cms_seed, bucket
         |  FROM '${OracleAux.Root}/t22_hash/*.parquet'),
         |cells AS MATERIALIZED (
         |  SELECT cms_seed, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tk JOIN aux USING (token) GROUP BY cms_seed, bucket),
         |vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact
         |          FROM tk GROUP BY token),
         |est AS (SELECT a.token, MIN(c.cnt) AS est
         |        FROM aux a JOIN cells c USING (cms_seed, bucket)
         |        GROUP BY a.token)
         |SELECT v.token, e.est, v.exact
         |FROM vocab v JOIN est e USING (token)
         |ORDER BY est DESC, token
         |LIMIT 20""".stripMargin,

    // full ratio-margin replay: 4-dp cosines, DECIMAL k-NN sums,
    // one double division — operand-exact, so margins hash-match
    "s17_margin_mining" ->
      """WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |sims AS MATERIALIZED (
        |  SELECT x.vec_id AS x_id, y.vec_id AS y_id,
        |    round(list_dot_product(y.v, x.v) /
        |      (sqrt(list_dot_product(y.v, y.v)) *
        |       sqrt(list_dot_product(x.v, x.v))), 4) AS sim
        |  FROM d x JOIN d y ON x.vec_id < 20 AND y.vec_id >= 20),
        |fwd AS MATERIALIZED (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY x_id ORDER BY sim DESC, y_id) AS r
        |  FROM sims QUALIFY r <= 4),
        |sumf AS (SELECT x_id, SUM(CAST(sim AS DECIMAL(10,4))) AS sumf,
        |           COUNT(*) AS nf
        |         FROM fwd GROUP BY x_id),
        |sumb AS (SELECT y_id, SUM(CAST(sim AS DECIMAL(10,4))) AS sumb,
        |           COUNT(*) AS nb
        |         FROM (SELECT *, row_number() OVER
        |                 (PARTITION BY y_id ORDER BY sim DESC, x_id) AS r
        |               FROM sims QUALIFY r <= 4) b
        |         GROUP BY y_id),
        |mg AS (SELECT f.x_id, f.y_id, f.sim,
        |         round(f.sim * CAST(sf.nf + sb.nb AS DOUBLE) /
        |           CAST(sf.sumf + sb.sumb AS DOUBLE), 4) AS margin
        |       FROM fwd f
        |       JOIN sumf sf USING (x_id) JOIN sumb sb USING (y_id)),
        |best AS (SELECT *, row_number() OVER
        |           (PARTITION BY x_id ORDER BY margin DESC, y_id) AS rb
        |         FROM mg QUALIFY rb = 1)
        |SELECT x_id AS query_id, y_id AS match_id, sim AS cos_sim,
        |  margin, (margin >= 1.35) AS accepted
        |FROM best
        |ORDER BY query_id""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
         |  $REV AS sum_disc_price,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity < 5 AND l_discount > 0.08
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_top_revenue" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
         |  $REV AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q05_regional_revenue" ->
      s"""SELECT n_name, $REV AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS forecast_revenue
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,

    "q08_distinct_count" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
        |       COUNT(*) AS n_customers
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q09_set_ops" ->
      """SELECT custkey FROM (
        |  (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
        |   INTERSECT SELECT o_custkey FROM orders)
        |  UNION
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |   EXCEPT SELECT o_custkey FROM orders)
        |) t
        |ORDER BY custkey""".stripMargin,

    "q10_rollup" ->
      """SELECT
        |  COALESCE(r_name, 'ALL') AS region_name,
        |  COALESCE(n_name, 'ALL') AS nation_name,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_acctbal,
        |  COUNT(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,

    "q11_having" ->
      """SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
        |ORDER BY l_partkey""".stripMargin,

    "q12_conditional_agg" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines,
        |  CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
        |  CAST(SUM(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS high_tax_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q13_outer_join_hist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $REV AS total_revenue
         |  FROM lineitem GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q16_sort_limit" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |ORDER BY p_retailprice DESC, p_partkey
        |LIMIT 20""".stripMargin,

    "q17_avg_compare" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN (SELECT l_partkey AS ap_partkey,
        |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_partkey
        |WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |       o_totalprice, CAST(sum_qty AS BIGINT) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS BIGINT)) > 150) b ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q19_disjunctive" ->
      s"""SELECT $REV AS revenue, COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_in_subquery" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_name LIKE 'NATION_1%')
        |ORDER BY s_suppkey""".stripMargin,

    "q21_string_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_uc,
        |       SUBSTR(p_name, 1, 12) AS name_pfx,
        |       REPLACE(p_type, ' ', '_') AS type_tag,
        |       CAST(LENGTH(p_name) AS BIGINT) AS name_len
        |FROM part
        |WHERE p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin,

    "q22_regex_extract" ->
      """SELECT event_id,
        |       TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k_val
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q23_events_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_ts, event_type,
        |       COUNT(*) AS n_events,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q24_sessionize" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM (SELECT user_id, ts, event_id,
        |        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |      FROM events) t
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q25_upsert_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q26_cube" ->
      """SELECT COALESCE(event_type, 'ALL') AS etype,
        |       CAST(COALESCE(EXTRACT(day FROM ts), -1) AS INT) AS dom,
        |       COUNT(*) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY CUBE(event_type, EXTRACT(day FROM ts))
        |ORDER BY etype, dom""".stripMargin,

    "q27_percentile" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75,
        |       MIN(l_quantity) AS min_qty,
        |       MAX(l_quantity) AS max_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // q28: the deterministic HLL replays END-TO-END. The xxhash64
    // kernel crosses as the q28_hash side-table; register rank is
    // re-derived by an INDEPENDENT method (min set-bit probe over a
    // range join, vs Spark's bin-length trick); the harmonic sum is
    // an exact HUGEINT; the α·m²·2^R/S float chain runs in the same
    // fixed order from the identical interpolated α·m² literal
    // (shortest-round-trip double — both engines parse the same
    // bits); the linear-counting ln comes from the q28_ln memo.
    "q28_approx_distinct" ->
      s"""WITH hm AS (SELECT pk, h FROM '${OracleAux.Root}/q28_hash/*.parquet'),
         |lnm AS (SELECT v, lx FROM '${OracleAux.Root}/q28_ln/*.parquet'),
         |ranks AS (SELECT h,
         |    CAST(COALESCE(MIN(CASE WHEN ((h & 4503599627370495) >> (52 - i)) & 1 = 1
         |                           THEN i END), 53) AS BIGINT) AS r
         |  FROM (SELECT DISTINCT h FROM hm) dh CROSS JOIN range(1, 53) t(i)
         |  GROUP BY h),
         |reg AS (SELECT l.l_returnflag AS flag,
         |    (hm.h >> 52) & 4095 AS bucket, MAX(rk.r) AS r
         |  FROM lineitem l JOIN hm ON hm.pk = l.l_partkey
         |  JOIN ranks rk ON rk.h = hm.h
         |  GROUP BY flag, bucket),
         |st AS (SELECT flag, COUNT(*) AS pres, MAX(r) AS big_r
         |  FROM reg GROUP BY flag),
         |hs AS (SELECT reg.flag,
         |    SUM(CAST(CAST(1 AS BIGINT) << (st.big_r - reg.r) AS HUGEINT)) AS s_pres
         |  FROM reg JOIN st USING (flag) GROUP BY reg.flag),
         |est AS (SELECT st.flag, CAST(4096 - st.pres AS INTEGER) AS v, st.big_r,
         |    hs.s_pres + CAST(4096 - st.pres AS HUGEINT) *
         |      CAST(CAST(1 AS BIGINT) << st.big_r AS HUGEINT) AS s
         |  FROM st JOIN hs USING (flag)),
         |raw AS (SELECT flag, v,
         |    (${operators.Approx.HllAlphaM2} *
         |      CAST(CAST(1 AS BIGINT) << big_r AS DOUBLE)) / CAST(s AS DOUBLE)
         |      AS e_raw
         |  FROM est),
         |fin AS (SELECT flag,
         |    CASE WHEN e_raw <= 10240.0 AND raw.v > 0
         |         THEN 4096.0 * lnm.lx ELSE e_raw END AS e
         |  FROM raw LEFT JOIN lnm ON lnm.v = raw.v),
         |ex AS (SELECT l_returnflag AS flag,
         |    COUNT(DISTINCT l_partkey) AS exact_parts
         |  FROM lineitem GROUP BY flag)
         |SELECT f.flag AS l_returnflag,
         |  CAST(floor(f.e) AS BIGINT) AS approx_parts, ex.exact_parts
         |FROM fin f JOIN ex USING (flag)
         |ORDER BY l_returnflag""".stripMargin,

    // q55: the walk replays as a recursive CTE — the oracle iterates
    // the parent rule itself, so the pointer-doubling composition is
    // differentially checked against a per-level walk.
    "q55_tree_flatten" ->
      """WITH RECURSIVE walk(id, anc, depth) AS (
        |  SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT id, anc // 2, depth + 1 FROM walk WHERE anc >= 2)
        |SELECT id AS doc_id, CAST(anc AS BIGINT) AS root_id, depth
        |FROM walk WHERE anc < 2
        |ORDER BY doc_id""".stripMargin,

    "q29_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  CAST(p.ts AS VARCHAR) AS purchase_ts,
        |  c.event_id AS click_id, CAST(c.ts AS VARCHAR) AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,

    "q30_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('micro', 0.0, 9999.99), ('small', 10000.0, 49999.99),
        |  ('mid', 50000.0, 149999.99), ('large', 150000.0, 299999.99),
        |  ('jumbo', 300000.0, 10000000.0))
        |SELECT band, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,

    "q31_window_funcs" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice) OVER w AS prev_price,
        |  LEAD(o_totalprice) OVER w AS next_price,
        |  DENSE_RANK() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC) AS price_rank,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q32_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, '*') AS rf,
        |       COALESCE(l_linestatus, '*') AS ls,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY gid, rf, ls""".stripMargin,

    "q33_multi_exists" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    // q54: SCD2 history — window algebra only; epoch_us mirrors
    // Spark's unix_micros under the UTC-pinned session.
    "q54_scd2" ->
      """WITH ordered AS (SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |chg AS (SELECT user_id, ts, event_id, event_type FROM ordered
        |        WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id) AS BIGINT) AS version,
        |  event_type AS state,
        |  epoch_us(ts) AS effective_from,
        |  epoch_us(LEAD(ts) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id)) AS effective_to,
        |  (LEAD(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM chg
        |ORDER BY user_id, version""".stripMargin,

    "q34_json_extract" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q35_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |           THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |           THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q36_unpivot" ->
      """SELECT p_partkey, attr, val
        |FROM (SELECT p_partkey,
        |        CAST(p_retailprice AS DOUBLE) AS retailprice,
        |        CAST(p_size AS DOUBLE) AS size
        |      FROM part) t
        |UNPIVOT (val FOR attr IN (retailprice, size))
        |ORDER BY p_partkey, attr""".stripMargin,

    "t01_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
        |       AS BIGINT) AS n_tokens_bpe
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "t02_quality_score" ->
      """SELECT doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
        |  CASE WHEN n_tokens < 8 THEN 0.0
        |       ELSE round(1.0 - stopword_ratio, 4) END AS quality_score
        |FROM (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |         w -> length(w))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS avg_token_len,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         w -> w IN ('the', 'a'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS stopword_ratio
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q44_no_order_rich" ->
      """WITH pool AS (SELECT * FROM customer WHERE c_nationkey < 13),
        |thr AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s,
        |               COUNT(*) AS n
        |        FROM pool WHERE c_acctbal > 0.0)
        |SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  COUNT(*) AS n_cust,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR)
        |       AS DOUBLE) AS total_bal
        |FROM pool, thr
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = pool.c_custkey
        |                    AND o.o_totalprice > 400000)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q45_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n,
        |                      SUM(CAST(value AS DECIMAL(18,4))) AS v
        |               FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(d) AS d0, max(d) AS d1
        |         FROM daily GROUP BY 1),
        |grid AS (SELECT user_id,
        |           CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |             CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |         FROM span)
        |SELECT grid.user_id, CAST(d AS VARCHAR) AS day,
        |  COALESCE(n, 0) AS n_events,
        |  COALESCE(CAST(CAST(v AS VARCHAR) AS DOUBLE), 0.0) AS day_value,
        |  CAST(SUM(COALESCE(n, 0)) OVER (PARTITION BY grid.user_id ORDER BY d)
        |       AS BIGINT) AS cum_events
        |FROM grid LEFT JOIN daily USING (user_id, d)
        |ORDER BY 1, 2""".stripMargin,

    "q46_forward_fill" ->
      """WITH ranked AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type,
        |                       event_id,
        |                       ROW_NUMBER() OVER (
        |                         PARTITION BY user_id, CAST(ts AS DATE)
        |                         ORDER BY ts DESC, event_id DESC) AS rn
        |                FROM events),
        |lastday AS (SELECT user_id, d, event_type AS et, event_id AS eid
        |            FROM ranked WHERE rn = 1),
        |span AS (SELECT user_id, min(d) AS d0, max(d) AS d1
        |         FROM lastday GROUP BY 1),
        |grid AS (SELECT user_id,
        |           CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |             CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |         FROM span)
        |SELECT grid.user_id, CAST(d AS VARCHAR) AS day,
        |  last_value(et IGNORE NULLS) OVER (PARTITION BY grid.user_id
        |    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS carried_type,
        |  CAST(last_value(eid IGNORE NULLS) OVER (PARTITION BY grid.user_id
        |    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS carried_event_id
        |FROM grid LEFT JOIN lastday USING (user_id, d)
        |ORDER BY 1, 2""".stripMargin,

    "q47_session_paths" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |      FROM e),
        |p AS (SELECT user_id, sess_id,
        |        string_agg(event_type, '->' ORDER BY ts, event_id) AS path
        |      FROM s GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path
        |LIMIT 20""".stripMargin,

    "q48_markov_transitions" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |n AS (SELECT event_type,
        |        lead(event_type) OVER w2 AS next_type,
        |        lead(new_sess) OVER w2 AS next_new
        |      FROM e
        |      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |tr AS (SELECT event_type AS from_type, next_type AS to_type,
        |         count(*) AS n_trans
        |       FROM n WHERE next_type IS NOT NULL AND next_new = 0
        |       GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |  round(CAST(n_trans AS DOUBLE) /
        |    SUM(n_trans) OVER (PARTITION BY from_type), 4) AS p
        |FROM tr
        |ORDER BY from_type, to_type""".stripMargin,

    "t07_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS tok FROM toks),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |tstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |            CAST(count(*) AS BIGINT) AS n_distinct,
        |            max(c) AS top_tok
        |          FROM tc GROUP BY 1),
        |grams AS (SELECT doc_id,
        |            unnest(list_transform(range(1, len(w)),
        |              i -> w[i] || ' ' || w[i+1])) AS g
        |          FROM toks WHERE len(w) >= 2),
        |gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
        |gstat AS (SELECT doc_id, max(c) AS top_gram, sum(c) AS n_grams
        |          FROM gc GROUP BY 1)
        |SELECT t.doc_id, t.n_tokens,
        |  round(1 - CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS dup_tok_ratio,
        |  round(CAST(top_tok AS DOUBLE) / n_tokens, 4) AS top_tok_ratio,
        |  round(coalesce(CAST(top_gram AS DOUBLE) / n_grams, 0.0), 4)
        |    AS top_2gram_ratio
        |FROM tstat t LEFT JOIN gstat USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "d01_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY text
        |ORDER BY keep_id""".stripMargin,

    "d04_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(w)-5+2),
        |           i -> array_to_string(w[i:i+4], ' '))) AS s
        |       FROM toks WHERE len(w) >= 5),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
        |FROM inter
        |JOIN (SELECT doc_id, len(s) AS n FROM sh) za ON doc_a = za.doc_id
        |JOIN (SELECT doc_id, len(s) AS n FROM sh) zb ON doc_b = zb.doc_id
        |WHERE round(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    // ---- LSH/multimodal replay oracles (signature side-tables) ----
    // The hash/codec kernels (MinHash, SimHash, SRP, perceptual/audio/
    // video fingerprints) have no DuckDB counterpart; OracleAux
    // persists their Spark-computed signatures and these oracles
    // independently replay everything downstream — banding arithmetic,
    // candidate self-joins, exact verification, thresholds, ordering
    // (the d08 replay pattern generalized). Bit ops are
    // representation-identical: (x >> s) & mask reads the same 16/14
    // bits under arithmetic or logical shift, and bit_count(xor(..))
    // is the same two's-complement popcount both engines compute.

    "d02_dedup_minhash" ->
      s"""WITH sigs AS (SELECT doc_id, sig
         |  FROM '${OracleAux.Root}/d02_sigs/*.parquet'),
         |bnd AS (SELECT doc_id, j AS band, sig[j*4+1:j*4+4] AS bs
         |        FROM sigs, generate_series(0,15) g(j)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bnd x JOIN bnd y ON x.band = y.band AND x.bs = y.bs
         |           AND x.doc_id < y.doc_id),
         |toks AS (SELECT doc_id,
         |           list_transform(string_split(text, ' '),
         |             t -> t || '_' || CAST(doc_id AS VARCHAR)) AS w
         |         FROM documents),
         |corpus AS (SELECT doc_id, w FROM toks
         |           UNION ALL
         |           SELECT doc_id + 1000000, list_append(w, 'plantedtail')
         |           FROM toks),
         |sh AS (SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(w)-5+2),
         |           i -> array_to_string(w[i:i+4], ' '))) AS s
         |       FROM corpus WHERE len(w) >= 5)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT doc_a, doc_b,
         |    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |          len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
         |  FROM cand JOIN sh a ON doc_a = a.doc_id
         |            JOIN sh b ON doc_b = b.doc_id) t
         |WHERE jaccard >= 0.7
         |ORDER BY doc_a, doc_b""".stripMargin,

    "d03_dedup_simhash" -> bandedHammingSql("d03_sigs", "sh64", 16),
    "m04_phash_dedup" -> bandedHammingSql("m04_sigs", "ah64", 16),
    "m16_dct_dedup" -> bandedHammingSql("m16_sigs", "ph64", 16),
    "m06_dhash_dedup" -> bandedHammingSql("m06_sigs", "dh64", 14),
    "m08_audio_dedup" -> bandedHammingSql("m08_sigs", "af64", 16),

    "d06_embed_neardup_lsh" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sig
         |  FROM '${OracleAux.Root}/d06_corpus/*.parquet'),
         |bnd AS (SELECT vec_id, j AS band, (sig >> (j*16)) & 65535 AS bh
         |        FROM c, generate_series(0,3) g(j)),
         |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |         FROM bnd x JOIN bnd y ON x.band = y.band AND x.bh = y.bh
         |           AND x.vec_id < y.vec_id)
         |SELECT vec_a, vec_b, cos_sim FROM (
         |  SELECT vec_a, vec_b,
         |    round(list_dot_product(a.v, b.v) /
         |      (sqrt(list_dot_product(a.v, a.v)) *
         |       sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
         |  FROM cand JOIN c a ON vec_a = a.vec_id
         |            JOIN c b ON vec_b = b.vec_id) t
         |WHERE cos_sim >= 0.9
         |ORDER BY vec_a, vec_b""".stripMargin,

    "m09_video_dedup" ->
      s"""WITH s AS (SELECT doc_id, fhs
         |  FROM '${OracleAux.Root}/m09_sigs/*.parquet'),
         |fh AS (SELECT doc_id, unnest(fhs) AS f FROM s),
         |bnd AS (SELECT doc_id, j AS band, (f >> (j*14)) & 16383 AS bh
         |        FROM fh, generate_series(0,3) g(j)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bnd x JOIN bnd y ON x.band = y.band AND x.bh = y.bh
         |           AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, n_a, n_b, match_frac FROM (
         |  SELECT doc_a, doc_b,
         |    CAST(len(a.fhs) AS BIGINT) AS n_a,
         |    CAST(len(b.fhs) AS BIGINT) AS n_b,
         |    round(greatest(
         |      CAST(len(list_filter(a.fhs, x -> len(list_filter(b.fhs,
         |        y -> bit_count(xor(x, y)) <= 3)) > 0)) AS DOUBLE) / len(a.fhs),
         |      CAST(len(list_filter(b.fhs, x -> len(list_filter(a.fhs,
         |        y -> bit_count(xor(x, y)) <= 3)) > 0)) AS DOUBLE) / len(b.fhs)
         |      ), 4) AS match_frac
         |  FROM cand JOIN s a ON doc_a = a.doc_id
         |            JOIN s b ON doc_b = b.doc_id) t
         |WHERE match_frac >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "d10_semantic_dedup" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM '${OracleAux.Root}/d06_corpus/*.parquet'),
         |cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS cv
         |  FROM '${OracleAux.Root}/d10_cents/*.parquet'),
         |asg AS (SELECT vec_id, v, cell FROM (
         |    SELECT c.vec_id, c.v, k.cell,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(c.v, k.cv) DESC, k.cell) AS rn
         |    FROM c CROSS JOIN cents k) t
         |  WHERE rn = 1),
         |pairs AS (SELECT y.vec_id AS vec_id, x.vec_id AS partner,
         |    round(list_dot_product(x.v, y.v) /
         |      (sqrt(list_dot_product(x.v, x.v)) *
         |       sqrt(list_dot_product(y.v, y.v))), 4) AS cos_sim
         |  FROM asg x JOIN asg y
         |    ON x.cell = y.cell AND x.vec_id < y.vec_id)
         |SELECT vec_id, MIN(partner) AS dup_of,
         |  round(MAX(cos_sim), 4) AS max_cos
         |FROM pairs WHERE cos_sim >= 0.9
         |GROUP BY vec_id
         |ORDER BY vec_id""".stripMargin,

    // s07's indexed probe must return EXACTLY the flat s02 answer on
    // the demo corpus (same corpus, query vec 0, same signature and
    // probe parameters) — one SQL certifies both, which is precisely
    // the indexed-equals-flat contract. Likewise s08 vs s04.
    "s02_ann_lsh" -> SrpProbeSql,
    "s07_ann_lsh_indexed" -> SrpProbeSql,
    "s04_ann_ivf" -> IvfProbeSql,
    "s08_ann_ivf_indexed" -> IvfProbeSql,

    "s05_knn_join_lsh" ->
      s"""WITH sigs AS (SELECT vec_id, sig
         |  FROM '${OracleAux.Root}/s02_sigs/*.parquet'),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings),
         |masks AS (SELECT CAST(0 AS BIGINT) AS m
         |  UNION ALL SELECT CAST(1 AS BIGINT) << i
         |    FROM generate_series(0,7) g(i)
         |  UNION ALL SELECT (CAST(1 AS BIGINT) << i) | (CAST(1 AS BIGINT) << j)
         |    FROM generate_series(0,6) a(i), generate_series(0,7) b(j)
         |    WHERE j > i
         |  UNION ALL SELECT (CAST(1 AS BIGINT) << i) | (CAST(1 AS BIGINT) << j)
         |      | (CAST(1 AS BIGINT) << l)
         |    FROM generate_series(0,5) a(i), generate_series(0,6) b(j),
         |      generate_series(0,7) c(l)
         |    WHERE j > i AND l > j),
         |qp AS (SELECT s.vec_id AS query_id, xor(s.sig, masks.m) AS p
         |       FROM sigs s, masks WHERE s.vec_id < 10),
         |cand AS (SELECT DISTINCT qp.query_id, s.vec_id
         |         FROM qp JOIN sigs s ON s.sig = qp.p
         |         WHERE s.vec_id >= 10),
         |scored AS (SELECT c.query_id, c.vec_id,
         |    round(list_dot_product(a.v, b.v) /
         |      (sqrt(list_dot_product(a.v, a.v)) *
         |       sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
         |  FROM cand c JOIN e a ON c.vec_id = a.vec_id
         |              JOIN e b ON c.query_id = b.vec_id),
         |rk AS (SELECT query_id, vec_id, cos_sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, cos_sim, rank FROM rk
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "s06_knn_join_ivf" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS cv
         |  FROM '${OracleAux.Root}/s06_cents/*.parquet'),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 10),
         |corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 10),
         |qc AS (SELECT query_id, cell FROM (
         |    SELECT q.query_id, k.cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY list_dot_product(q.v, k.cv) DESC, k.cell) AS rn
         |    FROM q CROSS JOIN cents k) t
         |  WHERE rn <= 4),
         |celled AS (SELECT vec_id, v, cell FROM (
         |    SELECT c.vec_id, c.v, k.cell,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(c.v, k.cv) DESC, k.cell) AS rn
         |    FROM corpus c CROSS JOIN cents k) t
         |  WHERE rn = 1),
         |scored AS (SELECT qc.query_id, cl.vec_id,
         |    round(list_dot_product(cl.v, q.v) /
         |      (sqrt(list_dot_product(cl.v, cl.v)) *
         |       sqrt(list_dot_product(q.v, q.v))), 4) AS cos_sim
         |  FROM celled cl JOIN qc ON cl.cell = qc.cell
         |                 JOIN q ON q.query_id = qc.query_id),
         |rk AS (SELECT query_id, vec_id, cos_sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, cos_sim, rank FROM rk
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "s13_ann_filtered_ivf" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS cv
         |  FROM '${OracleAux.Root}/s04_cents/*.parquet'),
         |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
         |       FROM embeddings WHERE vec_id = 0),
         |qcells AS (SELECT cell FROM (
         |    SELECT k.cell,
         |      row_number() OVER (ORDER BY list_dot_product(qv.v, k.cv)
         |        DESC, k.cell) AS rn
         |    FROM cents k, qv) t
         |  WHERE rn <= 16),
         |celled AS (SELECT vec_id, label, v, cell FROM (
         |    SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v,
         |      k.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
         |          k.cv) DESC, k.cell) AS rn
         |    FROM embeddings e CROSS JOIN cents k
         |    WHERE e.vec_id <> 0 AND e.label = 1) t
         |  WHERE rn = 1)
         |SELECT c.vec_id, c.label,
         |  round(list_dot_product(c.v, qv.v) /
         |    (sqrt(list_dot_product(c.v, c.v)) *
         |     sqrt(list_dot_product(qv.v, qv.v))), 4) AS cos_sim
         |FROM celled c JOIN qcells ON c.cell = qcells.cell, qv
         |ORDER BY cos_sim DESC, c.vec_id
         |LIMIT 10""".stripMargin,

    // f01: differential oracle — the side-table is an independent
    // java.nio serial walk of the same tree; the compare certifies the
    // distributed BFS listing against it row-for-row
    "f01_manifest" ->
      s"""SELECT path, name, rel_path, ext, size
         |FROM '${OracleAux.Root}/f01_expected/*.parquet'
         |ORDER BY path""".stripMargin,

    // d11/d13 share one oracle: the indexed gate's verdicts are
    // law-equal to the inline gate's row-for-row, over the same demo
    // lake/batch and the same persisted signature pair
    "d11_incr_dedup" -> AdmissionGateSql,
    "d13_indexed_admit" -> AdmissionGateSql,

    "s14_kmeans_distributed" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS cv
         |  FROM '${OracleAux.Root}/s14_cents/*.parquet'),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings),
         |scored AS (SELECT e.vec_id, c.cell, e.v, c.cv,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
         |  FROM e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, cell,
         |    CAST(round(list_dot_product(v, cv) /
         |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))),
         |      4) AS DECIMAL(18,4)) AS cos4
         |  FROM scored WHERE rn = 1)
         |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  round(CAST(CAST(SUM(cos4) AS VARCHAR) AS DOUBLE) / COUNT(*), 4)
         |    AS mean_cos
         |FROM asg GROUP BY cell
         |ORDER BY cell""".stripMargin,

    // ---- file-pipeline relational oracles (f03/f05) ----

    "f03_sync_plan" ->
      """WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS sz
        |           FROM documents),
        |src AS (SELECT
        |    'd' || CAST(doc_id % 10 AS VARCHAR) || '/doc_' ||
        |      CAST(doc_id AS VARCHAR) || '.txt' AS rel_path,
        |    '/src/d' || CAST(doc_id % 10 AS VARCHAR) || '/doc_' ||
        |      CAST(doc_id AS VARCHAR) || '.txt' AS src_path,
        |    sz AS src_size, doc_id + 1000 AS src_mtime
        |  FROM d),
        |tgt AS (SELECT
        |    'd' || CAST(doc_id % 10 AS VARCHAR) || '/doc_' ||
        |      CAST(doc_id AS VARCHAR) || '.txt' AS rel_path,
        |    '/dst/d' || CAST(doc_id % 10 AS VARCHAR) || '/doc_' ||
        |      CAST(doc_id AS VARCHAR) || '.txt' AS dst_path,
        |    CASE WHEN doc_id % 5 = 0 THEN sz + 1 ELSE sz END AS dst_size,
        |    CASE WHEN doc_id % 3 = 0 THEN doc_id + 999
        |         ELSE doc_id + 1000 END AS dst_mtime
        |  FROM d WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT 'old/doc_' || CAST(doc_id AS VARCHAR) || '.txt',
        |    '/dst/old/doc_' || CAST(doc_id AS VARCHAR) || '.txt',
        |    sz, doc_id + 1000
        |  FROM d WHERE doc_id % 13 = 0)
        |SELECT COALESCE(s.rel_path, t.rel_path) AS rel_path,
        |  CASE WHEN t.dst_path IS NULL THEN 'copy_new'
        |       WHEN s.src_path IS NULL THEN 'delete'
        |       WHEN s.src_size <> t.dst_size OR s.src_mtime > t.dst_mtime
        |         THEN 'copy_changed'
        |       ELSE 'noop' END AS action,
        |  s.src_path AS src_path, t.dst_path AS dst_path,
        |  s.src_size AS src_size, t.dst_size AS dst_size,
        |  s.src_mtime AS src_mtime, t.dst_mtime AS dst_mtime
        |FROM src s FULL OUTER JOIN tgt t ON s.rel_path = t.rel_path
        |ORDER BY rel_path""".stripMargin,

    // f12: the member inventory and the archive's structural size are
    // closed-form in doc_id (sub-block members: 512 header + 512 data
    // + 1024 terminator), so the oracle reconstructs them with NO
    // side-table — builder and walker are differentially checked
    // against a third, independent expression of the format.
    "f12_tar_intake" ->
      """WITH m AS (SELECT doc_id,
        |    unnest(range(0, doc_id % 3 + 1)) AS j
        |  FROM documents),
        |s AS (SELECT doc_id, j,
        |    10 + (doc_id + j) % 50 AS size,
        |    'doc' || doc_id || '/part' || j || '.txt' AS name
        |  FROM m),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nm
        |  FROM s GROUP BY doc_id)
        |SELECT s.doc_id, CAST(s.j AS BIGINT) AS idx, s.name,
        |  CAST(s.size AS BIGINT) AS size,
        |  CAST(1024 * (n.nm + 1) AS BIGINT) AS tar_len
        |FROM s JOIN n USING (doc_id)
        |ORDER BY doc_id, idx""".stripMargin,

    // f13: every name, length and offset of the WET-style demo
    // archives is closed-form in (doc_id, text) — the oracle
    // re-synthesizes the exact header strings and measures them with
    // strlen (bytes), so builder and walker are differentially
    // checked against an independent expression of the framing
    // arithmetic; NO side-table.
    "f13_warc_intake" ->
      """WITH cr AS (SELECT chr(13) || chr(10) AS c),
        |d AS (SELECT doc_id, text,
        |    'software: graft/1.0' || c ||
        |    'format: WARC File Format 1.0' || c AS body0, c
        |  FROM documents CROSS JOIN cr),
        |h AS (SELECT doc_id, text, body0,
        |    'WARC/1.0' || c || 'WARC-Type: warcinfo' || c ||
        |      'WARC-Record-ID: <urn:graft:info:' || doc_id || '>' || c ||
        |      'WARC-Date: 2026-01-01T00:00:00Z' || c ||
        |      'Content-Type: text/plain' || c ||
        |      'Content-Length: ' || strlen(body0) || c || c AS h0,
        |    'WARC/1.0' || c || 'WARC-Type: conversion' || c ||
        |      'WARC-Record-ID: <urn:graft:doc:' || doc_id || '>' || c ||
        |      'WARC-Target-URI: https://example.org/doc/' || doc_id || c ||
        |      'WARC-Date: 2026-01-01T00:00:00Z' || c ||
        |      'Content-Type: text/plain' || c ||
        |      'Content-Length: ' || strlen(text) || c || c AS h1
        |  FROM d),
        |t AS (SELECT doc_id,
        |    CAST(strlen(h0) AS BIGINT) AS off0,
        |    CAST(strlen(h0) + strlen(body0) + 4 AS BIGINT) AS rec0,
        |    CAST(strlen(h1) AS BIGINT) AS lh1,
        |    CAST(strlen(body0) AS BIGINT) AS n0,
        |    CAST(strlen(text) AS BIGINT) AS n1
        |  FROM h)
        |SELECT doc_id, CAST(0 AS BIGINT) AS idx,
        |  'warcinfo' AS warc_type,
        |  'urn:graft:info:' || doc_id AS record_id, '' AS target_uri,
        |  n0 AS content_length, off0 AS content_offset,
        |  rec0 + lh1 + n1 + 4 AS warc_len
        |FROM t
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT), 'conversion',
        |  'urn:graft:doc:' || doc_id,
        |  'https://example.org/doc/' || doc_id,
        |  n1, rec0 + lh1, rec0 + lh1 + n1 + 4
        |FROM t
        |ORDER BY doc_id, idx""".stripMargin,

    // f16 manifest: the shard assignment (row_number div capacity —
    // Spark derives it through c09's distributed prefix-sum over unit
    // weights; the divisor is the SHARED DefaultDocsPerShard constant,
    // ADVICE r15 #4) and every record's PLAIN byte size re-synthesized
    // string-for-string (the f13 differential discipline: header
    // strings rebuilt, measured with strlen = bytes).
    "f16_warc_export" ->
      s"""WITH cr AS (SELECT chr(13) || chr(10) AS c),
        |d AS (SELECT doc_id, text,
        |    (row_number() OVER (ORDER BY doc_id) - 1)
        |      // ${graft.sources.WarcSource.DefaultDocsPerShard}
        |      AS shard_id, c
        |  FROM documents CROSS JOIN cr),
        |recs AS (SELECT shard_id,
        |    strlen('WARC/1.0' || c || 'WARC-Type: conversion' || c ||
        |      'WARC-Record-ID: <urn:graft:doc:' || doc_id || '>' || c ||
        |      'WARC-Target-URI: https://example.org/doc/' || doc_id || c ||
        |      'WARC-Date: 2026-01-01T00:00:00Z' || c ||
        |      'Content-Type: text/plain' || c ||
        |      'Content-Length: ' || strlen(text) || c || c) +
        |      strlen(text) + 4 AS rec_bytes
        |  FROM d),
        |wi AS (SELECT DISTINCT shard_id,
        |    strlen('WARC/1.0' || c || 'WARC-Type: warcinfo' || c ||
        |      'WARC-Record-ID: <urn:graft:shard:' || shard_id || '>' || c ||
        |      'WARC-Date: 2026-01-01T00:00:00Z' || c ||
        |      'Content-Type: text/plain' || c ||
        |      'Content-Length: ' ||
        |      strlen('software: graft/1.0' || c ||
        |             'format: WARC File Format 1.0' || c) || c || c) +
        |      strlen('software: graft/1.0' || c ||
        |             'format: WARC File Format 1.0' || c) + 4 AS wi_bytes
        |  FROM d)
        |SELECT r.shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) + 1 AS BIGINT) AS n_records,
        |  CAST(sum(rec_bytes) + min(wi.wi_bytes) AS BIGINT) AS plain_bytes
        |FROM recs r JOIN wi ON wi.shard_id = r.shard_id
        |GROUP BY r.shard_id ORDER BY r.shard_id""".stripMargin,

    // f16 round-trip: the expected recovery is the documents table
    // itself — a hash match proves the encoder → gzip-member layout →
    // walker → UTF-8 path preserves every byte of every document.
    "f16_warc_roundtrip" ->
      """SELECT doc_id,
        |  'https://example.org/doc/' || doc_id AS target_uri, text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // f11: an independent RE2 field grammar re-parses the identical
    // CSV bytes — RFC 4180 fields (bare or quoted with "" escapes),
    // arity-4 anchored match as the validity verdict, leading fields
    // still extracted on wrong-arity rows (Spark's probed PERMISSIVE
    // contract), doubled quotes unescaped after unwrapping.
    "f11_csv_ingest" ->
      s"""WITH l AS (SELECT line
         |  FROM '${OracleAux.Root}/f11_lines/*.parquet'),
         |p AS (SELECT line,
         |    regexp_matches(line,
         |      '^(?:[^,"]*|"(?:[^"]|"")*")(?:,(?:[^,"]*|"(?:[^"]|"")*")){3}$$')
         |      AS ok,
         |    regexp_extract(line,
         |      '^([^,"]*|"(?:[^"]|"")*"),([^,"]*|"(?:[^"]|"")*"),([^,"]*|"(?:[^"]|"")*"),([^,"]*|"(?:[^"]|"")*")(?:,.*)?$$',
         |      ['f1', 'f2', 'f3', 'f4']) AS f
         |  FROM l),
         |u AS (SELECT line, ok,
         |    CAST(f['f1'] AS BIGINT) AS doc_id, f['f2'] AS lang,
         |    CASE WHEN f['f3'] LIKE '"%'
         |         THEN replace(substring(f['f3'], 2, length(f['f3']) - 2),
         |                      '""', '"')
         |         ELSE f['f3'] END AS source,
         |    CAST(f['f4'] AS BIGINT) AS n_chars
         |  FROM p)
         |SELECT doc_id, lang, source, n_chars,
         |  NOT ok AS is_corrupt,
         |  CASE WHEN NOT ok THEN line END AS corrupt_raw
         |FROM u
         |ORDER BY is_corrupt, doc_id, corrupt_raw""".stripMargin,

    // f10: DuckDB's yyjson parser re-parses the byte-identical lines
    // independently of Spark's Jackson path — validity verdicts,
    // parsed fields, and the quarantine column must all agree.
    "f10_jsonl_ingest" ->
      s"""WITH l AS (SELECT line
         |  FROM '${OracleAux.Root}/f10_lines/*.parquet'),
         |p AS (SELECT line, json_valid(line) AS ok FROM l)
         |SELECT
         |  CASE WHEN ok THEN CAST(line->>'doc_id' AS BIGINT) END AS doc_id,
         |  CASE WHEN ok THEN line->>'lang' END AS lang,
         |  CASE WHEN ok THEN line->>'source' END AS source,
         |  CASE WHEN ok THEN CAST(line->>'n_chars' AS BIGINT) END
         |    AS n_chars,
         |  NOT ok AS is_corrupt,
         |  CASE WHEN NOT ok THEN line END AS corrupt_raw
         |FROM p
         |ORDER BY is_corrupt, doc_id, corrupt_raw""".stripMargin,

    "f05_audit_rollup" ->
      """WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS sz
        |           FROM documents),
        |a AS (SELECT 'd' || CAST(doc_id % 10 AS VARCHAR) AS dir,
        |        CASE WHEN doc_id % 11 = 0 THEN 'failed'
        |             WHEN doc_id % 4 = 0 THEN 'skipped'
        |             ELSE 'copied' END AS status,
        |        CASE WHEN doc_id % 11 = 0 OR doc_id % 4 = 0 THEN 0
        |             ELSE sz END AS bytes
        |      FROM d)
        |SELECT dir,
        |  CAST(SUM(CASE WHEN status = 'copied' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_copied,
        |  CAST(SUM(CASE WHEN status = 'skipped' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_skipped,
        |  CAST(SUM(CASE WHEN status = 'failed' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_failed,
        |  CAST(SUM(bytes) AS BIGINT) AS total_bytes
        |FROM a GROUP BY dir
        |ORDER BY dir""".stripMargin,

    "d05_embed_neardup" ->
      """WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 1000)
        |SELECT vec_a, vec_b, cos_sim FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) *
        |       sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
        |  FROM d a JOIN d b ON a.vec_id < b.vec_id) t
        |WHERE cos_sim >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,

    // m14: pair-averaged decimation replayed from the m03 PCM
    // side-table — floor(sum/2.0) matches the kernel's floorDiv on
    // negative sums (truncation would not); all outputs are exact
    // integers. The decimated aggregate LEFT-joins back onto the full
    // clip set with zero defaults so a legal empty-PCM clip yields
    // the same zeroed evidence row the kernel's out.isEmpty branch
    // emits (an unnest-only derivation would drop the row entirely).
    "m14_audio_decimate" ->
      s"""WITH base AS (SELECT doc_id, samples
         |  FROM '${OracleAux.Root}/m03_pcm/*.parquet'),
         |s AS (SELECT doc_id,
         |    unnest(samples) AS v,
         |    unnest(range(0, len(samples))) AS i
         |  FROM base),
         |d AS (SELECT doc_id, i // 2 AS j,
         |    CAST(floor(sum(v) / 2.0) AS BIGINT) AS o
         |  FROM s GROUP BY doc_id, i // 2),
         |agg AS (SELECT doc_id,
         |    CAST(count(*) AS BIGINT) AS n_out,
         |    CAST(sum(abs(o)) AS BIGINT) AS sum_abs,
         |    CAST(sum(o * o) AS BIGINT) AS sum_sq,
         |    CAST(min(o) AS BIGINT) AS v_min,
         |    CAST(max(o) AS BIGINT) AS v_max
         |  FROM d GROUP BY doc_id)
         |SELECT b.doc_id, CAST(len(b.samples) AS BIGINT) AS n_in,
         |  CAST(COALESCE(a.n_out, 0) AS BIGINT) AS n_out,
         |  CAST(COALESCE(a.sum_abs, 0) AS BIGINT) AS sum_abs,
         |  CAST(COALESCE(a.sum_sq, 0) AS BIGINT) AS sum_sq,
         |  CAST(COALESCE(a.v_min, 0) AS BIGINT) AS v_min,
         |  CAST(COALESCE(a.v_max, 0) AS BIGINT) AS v_max
         |FROM base b LEFT JOIN agg a USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin,

    // m13: exact-integer 2x2 block pooling replayed from the decoded
    // pixel side-table — floor mean via integer div, bit-identical.
    "m13_image_pool" ->
      s"""WITH px AS (SELECT * FROM '${OracleAux.Root}/m13_pixels/*.parquet')
         |SELECT doc_id, CAST(y // 2 AS BIGINT) AS y,
         |  CAST(x // 2 AS BIGINT) AS x,
         |  CAST(sum(v) // 4 AS BIGINT) AS v
         |FROM px
         |GROUP BY doc_id, y // 2, x // 2
         |ORDER BY doc_id, y, x""".stripMargin,

    // m12: from the chunk side-table the PNG spec's bit-5 rule
    // (lowercase first type char = ancillary) classifies each chunk;
    // counts, the 8 + Σ(12+len) size identities and the
    // hash-equality recovery verdict all replay in SQL.
    "m12_png_scrub" ->
      s"""WITH ch AS (SELECT * FROM '${OracleAux.Root}/m12_chunks/*.parquet')
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN substr(ctype, 1, 1) = lower(substr(ctype, 1, 1))
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_meta,
         |  CAST(8 + sum(12 + clen) AS BIGINT) AS bytes_in,
         |  CAST(8 + sum(CASE WHEN substr(ctype, 1, 1) <> lower(substr(ctype, 1, 1))
         |    THEN 12 + clen ELSE 0 END) AS BIGINT) AS bytes_out,
         |  CAST(any_value(h_scrub) = any_value(h_orig) AS BIGINT) AS recovered
         |FROM ch
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // m15: m12's replay shape for the JPEG container — APPn/COM
    // classification by marker code, size accounting over the
    // partitioning segment walk (SOI+segments+entropy+EOI tile the
    // byte stream, so bytes_in is their plain sum), hash-equality
    // recovery verdict.
    "m15_jpeg_scrub" ->
      s"""WITH sg AS (SELECT * FROM '${OracleAux.Root}/m15_segs/*.parquet')
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_segments,
         |  CAST(sum(CASE WHEN (marker BETWEEN 225 AND 239) OR marker = 254
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_meta,
         |  CAST(sum(slen) AS BIGINT) AS bytes_in,
         |  CAST(sum(CASE WHEN (marker BETWEEN 225 AND 239) OR marker = 254
         |    THEN 0 ELSE slen END) AS BIGINT) AS bytes_out,
         |  CAST(any_value(h_scrub) = any_value(h_orig) AS BIGINT) AS recovered
         |FROM sg
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // m11: the magic-byte classification + rollup replayed from the
    // persisted head-hex side-table (the codecs aren't SQL; the
    // routing logic downstream of the head bytes is).
    "m11_type_sniff" ->
      s"""WITH h AS (SELECT media_type, head_hex, len
         |  FROM '${OracleAux.Root}/m11_heads/*.parquet'),
         |c AS (SELECT media_type, len,
         |    CASE
         |      WHEN substr(head_hex, 1, 8) = '89504E47' THEN 'image/png'
         |      WHEN substr(head_hex, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
         |      WHEN substr(head_hex, 1, 6) = '474946' THEN 'image/gif'
         |      WHEN substr(head_hex, 1, 8) = '52494646'
         |       AND substr(head_hex, 17, 8) = '57415645' THEN 'audio/wav'
         |      WHEN substr(head_hex, 1, 8) = '52494646' THEN 'riff/other'
         |      WHEN substr(head_hex, 9, 8) = '89504E47' THEN 'video/frames'
         |      ELSE 'unknown' END AS sniffed
         |  FROM h)
         |SELECT media_type, sniffed, COUNT(*) AS n_files,
         |  CAST(SUM(len) AS BIGINT) AS total_bytes
         |FROM c
         |GROUP BY media_type, sniffed
         |ORDER BY media_type, sniffed""".stripMargin,

    // s16: the whole BM25 + cosine + RRF pipeline recomputed in SQL —
    // fixed expression trees over exact integers (identical IEEE ops
    // in both engines), ln from the memo, ranks tie-broken on doc_id.
    "s16_hybrid_search" ->
      s"""WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents WHERE doc_id <> 0),
         |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM corpus),
         |consts AS (SELECT
         |    (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS nd,
         |    (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS tt),
         |q AS (SELECT unnest(w[1:8]) AS tok
         |      FROM (SELECT string_split(text, ' ') AS w
         |            FROM documents WHERE doc_id = 0)),
         |post AS (SELECT doc_id, tok
         |  FROM (SELECT doc_id, unnest(w) AS tok FROM corpus)
         |  WHERE tok IN (SELECT DISTINCT tok FROM q)),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |       FROM post GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
         |       FROM tf GROUP BY tok),
         |idf AS (SELECT tok,
         |    1.0 + ((consts.nd - df) + 0.5) / (df + 0.5) AS x
         |  FROM df, consts),
         |term AS (SELECT tf.doc_id,
         |    CAST(round(m.lx * ((tf.tf * 2.2) /
         |      (tf.tf + 0.3 + 0.9 * ((dl.dl * consts.nd) / consts.tt))),
         |      9) AS DECIMAL(28,9)) AS term
         |  FROM q
         |  JOIN idf USING (tok)
         |  JOIN '${OracleAux.Root}/s16_ln/*.parquet' m ON m.x = idf.x
         |  JOIN tf USING (tok)
         |  JOIN dl ON dl.doc_id = tf.doc_id, consts),
         |scored AS (SELECT doc_id, CAST(SUM(term) AS DOUBLE) AS bm25
         |           FROM term GROUP BY doc_id),
         |topb AS (SELECT doc_id, CAST(row_number() OVER
         |    (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_bm25
         |  FROM scored QUALIFY rank_bm25 <= 100),
         |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id = 0),
         |vec AS (SELECT vec_id AS doc_id,
         |    round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
         |      (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                             CAST(embedding AS DOUBLE[]))) *
         |       sqrt(list_dot_product(qv, qv))), 4) AS cos_sim
         |  FROM embeddings, qv WHERE vec_id <> 0),
         |topv AS (SELECT doc_id, CAST(row_number() OVER
         |    (ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS rank_vec
         |  FROM vec QUALIFY rank_vec <= 100)
         |SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
         |  b.rank_bm25, v.rank_vec,
         |  COALESCE(1.0 / (60.0 + b.rank_bm25), 0.0) +
         |    COALESCE(1.0 / (60.0 + v.rank_vec), 0.0) AS rrf
         |FROM topb b FULL OUTER JOIN topv v ON b.doc_id = v.doc_id
         |ORDER BY rrf DESC, doc_id
         |LIMIT 20""".stripMargin,

    "s01_ann_bruteforce" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
        |    (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                           CAST(embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(qv, qv))), 4) AS cos_sim
        |FROM embeddings, q
        |WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id
        |LIMIT 10""".stripMargin,

    "s09_ann_quantized" ->
      """WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc,
        |        sqrt(list_dot_product(v, v)) AS nrm FROM d),
        |qz AS (SELECT vec_id, v, sc, nrm,
        |        CASE WHEN sc > 0
        |          THEN list_transform(v, x -> floor(x / sc + 0.5))
        |          ELSE list_transform(v, x -> 0.0) END AS q FROM s),
        |qry AS (SELECT v, sc, nrm, q FROM qz WHERE vec_id = 0),
        |cand AS (SELECT c.vec_id, c.v AS cv, qry.v AS qv, c.nrm AS cnrm,
        |           qry.nrm AS qnrm,
        |           CASE WHEN c.nrm = 0 OR qry.nrm = 0 THEN 0.0
        |             ELSE round(list_dot_product(c.q, qry.q) * c.sc * qry.sc /
        |               (c.nrm * qry.nrm), 4) END AS q_sim
        |         FROM qz c, qry WHERE c.vec_id <> 0
        |         ORDER BY q_sim DESC, c.vec_id LIMIT 40)
        |SELECT vec_id,
        |  CASE WHEN cnrm = 0 OR qnrm = 0 THEN 0.0
        |    ELSE round(list_dot_product(cv, qv) / (cnrm * qnrm), 4)
        |    END AS cos_sim,
        |  q_sim
        |FROM cand
        |ORDER BY cos_sim DESC, vec_id
        |LIMIT 10""".stripMargin,

    "s03_knn_join" ->
      """WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT query_id, vec_id, rank, cos_sim FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id,
        |    round(list_dot_product(c.v, q.v) /
        |      (sqrt(list_dot_product(c.v, c.v)) *
        |       sqrt(list_dot_product(q.v, q.v))), 4) AS cos_sim,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_dot_product(c.v, q.v) /
        |        (sqrt(list_dot_product(c.v, c.v)) *
        |         sqrt(list_dot_product(q.v, q.v))), 4) DESC, c.vec_id) AS rank
        |  FROM d q JOIN d c ON q.vec_id < 10 AND c.vec_id >= 10) t
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q39_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year, $REV AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE year(l_shipdate) BETWEEN 1996 AND 1997
         |  AND n1.n_name IN ('NATION_1', 'NATION_2')
         |  AND n2.n_name IN ('NATION_1', 'NATION_2')
         |  AND n1.n_name <> n2.n_name
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "q40_market_share" ->
      s"""WITH base AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    l_extendedprice, l_discount, sn.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  WHERE year(o_orderdate) BETWEEN 1996 AND 1997)
         |SELECT o_year,
         |  round(coalesce(
         |    CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
         |      THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
         |        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         |      END) AS VARCHAR) AS DOUBLE), 0.0) / $REV, 6) AS mkt_share
         |FROM base
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin,

    "q41_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id AS u, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id AS u, MIN(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id AS u, MIN(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |  GROUP BY e.user_id)
        |SELECT s1.u AS user_id,
        |  CAST(1 + (s2.u IS NOT NULL)::INT + (s3.u IS NOT NULL)::INT
        |       AS BIGINT) AS funnel_stage
        |FROM s1 LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u
        |ORDER BY user_id""".stripMargin,

    "q43_purchase_cadence" ->
      """SELECT user_id, COUNT(*) AS n_purchases,
        |  round(CAST(date_diff('day', MIN(CAST(ts AS DATE)),
        |    MAX(CAST(ts AS DATE))) AS DOUBLE) / (COUNT(*) - 1), 4)
        |    AS avg_gap_days
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY user_id
        |HAVING COUNT(*) >= 2
        |ORDER BY user_id""".stripMargin,

    // day-arithmetic week buckets (datediff/7) — deliberately NOT
    // calendar week truncation, whose week-start conventions differ
    "q42_retention" ->
      """WITH fd AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY user_id)
        |SELECT CAST(cohort_date AS VARCHAR) AS cohort,
        |  CAST(floor(date_diff('day', cohort_date, CAST(e.ts AS DATE)) / 7)
        |       AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM events e JOIN fd ON e.user_id = fd.user_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "t06_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
        |  CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |       AS BIGINT) AS n_chars_norm
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // q38's oracle recomputes the aggregate from the FULL table — the
    // hash match proves merged partials == full recompute
    "q38_incr_agg" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR)
        |       AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "t05_vocab_topk" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE len(token) > 0
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 100""".stripMargin,

    // c04 replays the same deterministic PII planting, then redacts;
    // patterns use only constructs with identical Java-regex/RE2
    // semantics
    // c04: the Luhn filter is unrolled digit-by-digit (identical
    // arithmetic to the Spark column expression); the card redaction
    // seeds list_reduce with the scrubbed text via list_prepend
    // (DuckDB's 2-arg reduce takes its init from the first element),
    // mirroring Spark's aggregate(ccs, scrubbed, replace).
    "c04_redact_pii" -> {
      val luhn = (1 to 16).map { i =>
        if (i % 2 == 1)
          s"(CASE WHEN 2*CAST(substr(c,$i,1) AS INT) > 9 " +
            s"THEN 2*CAST(substr(c,$i,1) AS INT) - 9 " +
            s"ELSE 2*CAST(substr(c,$i,1) AS INT) END)"
        else s"CAST(substr(c,$i,1) AS INT)"
      }.mkString(" + ")
      s"""WITH p AS (
         |  SELECT doc_id,
         |    text || CASE WHEN doc_id % 7 = 0
         |      THEN ' contact user' || doc_id || '@example.com ssn 123-45-6789'
         |      ELSE '' END
         |    || CASE WHEN doc_id % 11 = 0
         |      THEN ' call 415-555-0137 card 4539578763621486' ELSE '' END
         |    || CASE WHEN doc_id % 13 = 0
         |      THEN ' ip 10.20.30.40 card 4539578763621487' ELSE '' END
         |    || CASE WHEN doc_id % 17 = 0
         |      THEN ' intl +44-020-7946-0958' ELSE '' END AS t
         |  FROM documents),
         |r1 AS (SELECT doc_id, t,
         |  regexp_replace(t,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g')
         |    AS a_email FROM p),
         |r2 AS (SELECT *, regexp_replace(a_email,
         |  '\\d{3}-\\d{2}-\\d{4}', '<SSN>', 'g') AS a_ssn FROM r1),
         |r3 AS (SELECT *, regexp_replace(a_ssn,
         |  '\\+\\d{1,3}-\\d{3}-\\d{3,4}-\\d{4}', '<PHONE>', 'g') AS a_intl
         |  FROM r2),
         |r4 AS (SELECT *, regexp_replace(a_intl,
         |  '\\d{3}-\\d{3}-\\d{4}', '<PHONE>', 'g') AS a_phone FROM r3),
         |r5 AS (SELECT *, regexp_replace(a_phone,
         |  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')
         |  AS scrubbed FROM r4),
         |cc AS (
         |  SELECT *,
         |    list_filter(regexp_extract_all(scrubbed, '\\b\\d{16}\\b'),
         |      c -> ($luhn) % 10 = 0) AS ccs
         |  FROM r5)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(a_email, '\\d{3}-\\d{2}-\\d{4}'))
         |    AS BIGINT) AS n_ssns,
         |  CAST(len(regexp_extract_all(a_ssn,
         |      '\\+\\d{1,3}-\\d{3}-\\d{3,4}-\\d{4}'))
         |    + len(regexp_extract_all(a_intl, '\\d{3}-\\d{3}-\\d{4}'))
         |    AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(a_phone,
         |    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
         |    AS n_ips,
         |  CAST(len(ccs) AS BIGINT) AS n_ccs,
         |  list_reduce(list_prepend(scrubbed, ccs),
         |    (acc, c) -> regexp_replace(acc, '\\b' || c || '\\b',
         |      '<CC>', 'g')) AS clean_text
         |FROM cc
         |ORDER BY doc_id""".stripMargin
    },

    "q37_rolling_window" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_trailing_hour,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR)
        |       AS DOUBLE) AS sum_trailing_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // d07 = connected components over the exact d04 pair graph; the
    // recursive CTE computes each node's min reachable id (UNION
    // dedups, so the walk reaches a fixpoint).
    "d07_dedup_clusters" ->
      """WITH RECURSIVE pairs AS (
        |  WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |  sh AS (SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(w)-5+2),
        |             i -> array_to_string(w[i:i+4], ' '))) AS s
        |         FROM toks WHERE len(w) >= 5),
        |  inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |  inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |            FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |            GROUP BY 1, 2)
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN (SELECT doc_id, len(s) AS n FROM sh) za ON doc_a = za.doc_id
        |  JOIN (SELECT doc_id, len(s) AS n FROM sh) zb ON doc_b = zb.doc_id
        |  WHERE round(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) >= 0.5),
        |bidir AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |walk(doc, lab) AS (
        |  SELECT a, a FROM bidir
        |  UNION
        |  SELECT e.b, w.lab FROM walk w JOIN bidir e ON e.a = w.doc)
        |SELECT doc AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id
        |FROM walk GROUP BY doc
        |ORDER BY doc_id""".stripMargin,

    // c27: d07's pair + component chain, then the soft-dedup weight
    // arithmetic — full-corpus left join (singletons = their own
    // cluster), cluster sizes, one rounded division
    "c27_dup_weights" ->
      """WITH RECURSIVE pairs AS (
        |  WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |  sh AS (SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(w)-5+2),
        |             i -> array_to_string(w[i:i+4], ' '))) AS s
        |         FROM toks WHERE len(w) >= 5),
        |  inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |  inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |            FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |            GROUP BY 1, 2)
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN (SELECT doc_id, len(s) AS n FROM sh) za ON doc_a = za.doc_id
        |  JOIN (SELECT doc_id, len(s) AS n FROM sh) zb ON doc_b = zb.doc_id
        |  WHERE round(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) >= 0.5),
        |bidir AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |walk(doc, lab) AS (
        |  SELECT a, a FROM bidir
        |  UNION
        |  SELECT e.b, w.lab FROM walk w JOIN bidir e ON e.a = w.doc),
        |labs AS (SELECT doc, CAST(MIN(lab) AS BIGINT) AS cluster_id
        |  FROM walk GROUP BY doc),
        |fullset AS (SELECT d.doc_id,
        |    COALESCE(l.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN labs l ON l.doc = d.doc_id),
        |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        |  FROM fullset GROUP BY cluster_id)
        |SELECT f.doc_id, f.cluster_id, s.cluster_size,
        |  round(1.0 / s.cluster_size, 6) AS weight
        |FROM fullset f JOIN sz s USING (cluster_id)
        |ORDER BY f.doc_id""".stripMargin,

    "c08_mixture_temperature" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
        |         AS BIGINT) AS tot_tokens
        |  FROM documents GROUP BY source),
        |s AS (SELECT *,
        |        CAST(floor(sqrt(CAST(tot_tokens AS DOUBLE)) * 1000000.0
        |          + 0.5) AS BIGINT) AS sqrt_i
        |      FROM per),
        |w AS (SELECT *,
        |        round(CAST(sqrt_i AS DOUBLE) /
        |          CAST((SELECT CAST(SUM(sqrt_i) AS BIGINT) FROM s)
        |               AS DOUBLE), 6) AS weight
        |      FROM s),
        |b AS (SELECT *,
        |        CAST(floor(weight * 100000.0 + 0.5) AS BIGINT)
        |          AS budget_tokens
        |      FROM w)
        |SELECT source, n_docs, tot_tokens, weight, budget_tokens,
        |  round(least(1.0, CAST(budget_tokens AS DOUBLE) /
        |    CAST(tot_tokens AS DOUBLE)), 6) AS sample_rate
        |FROM b
        |ORDER BY source""".stripMargin,

    "c02_mixture_plan" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
        |         AS BIGINT) AS tot_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, tot_tokens,
        |  round(least(1.0,
        |    (100000.0 / (SELECT COUNT(*) FROM per)) / tot_tokens), 6)
        |    AS sample_rate
        |FROM per
        |ORDER BY source""".stripMargin,

    // same shingle construction as the d04 oracle; bench set = doc_id
    // divisible by 10, contamination = ≥3 shared distinct shingles
    "c03_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(w)-5+2),
        |           i -> array_to_string(w[i:i+4], ' '))) AS s
        |       FROM toks WHERE len(w) >= 5),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 = 0),
        |train AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 10 <> 0)
        |SELECT t.doc_id, CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_shared
        |FROM train t JOIN bench b ON t.g = b.g
        |GROUP BY t.doc_id
        |HAVING COUNT(DISTINCT t.g) >= 3
        |ORDER BY doc_id""".stripMargin,

    // c03's leakage gate in the embedding space: bench = vec_id
    // divisible by 10, per-pair cosine in DOUBLE rounded to 4 dp
    // (d05's construction), flagged at >= 0.4
    "c17_semantic_decontam" ->
      """WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM d),
        |p AS (SELECT t.vec_id,
        |        round(list_dot_product(t.v, b.v) / (t.nrm * b.nrm), 4) AS cos
        |      FROM n t JOIN n b
        |        ON t.vec_id % 10 <> 0 AND b.vec_id % 10 = 0)
        |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
        |  max(cos) AS max_cos
        |FROM p WHERE cos >= 0.4
        |GROUP BY vec_id
        |ORDER BY vec_id""".stripMargin,

    // the IVF-indexed screen at nprobe=all is brute-equal by the
    // equality law, so it shares c17's oracle verbatim
    "c17_semantic_decontam_ivf" ->
      """WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM d),
        |p AS (SELECT t.vec_id,
        |        round(list_dot_product(t.v, b.v) / (t.nrm * b.nrm), 4) AS cos
        |      FROM n t JOIN n b
        |        ON t.vec_id % 10 <> 0 AND b.vec_id % 10 = 0)
        |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
        |  max(cos) AS max_cos
        |FROM p WHERE cos >= 0.4
        |GROUP BY vec_id
        |ORDER BY vec_id""".stripMargin,

    // t03's marker argmax in SQL: per-language occurrence counts over
    // the space-split lowered text, argmax with the same sorted-lang
    // tie-break (first CASE arm wins) and zero-hit → 'und'.
    "t03_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, text, lang, source, n_chars,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS s_de,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> t IN ('the','and','of','to','is','with','that'))) AS s_en,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> t IN ('el','la','los','las','que','es','una'))) AS s_es,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> t IN ('le','la','les','est','une','dans','pas'))) AS s_fr,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> t IN ('的','是','不','在','了','我','有'))) AS s_zh
        |  FROM documents)
        |SELECT doc_id, text, lang, source, n_chars,
        |  CASE
        |    WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
        |    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
        |    ELSE 'zh'
        |  END AS pred_lang
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    // t08: the greedy longest-match tokenizer replayed char-by-char as
    // a recursive CTE — each step consumes the longest matching vocab
    // piece (max(len) over matches) or one UNK char. The vocab VALUES
    // list is generated from the same Scala constant the kernel uses.
    "t08_subword_tokenize" ->
      s"""$SubwordStepCte
         |SELECT doc_id, CAST(n_sub AS BIGINT) AS n_subwords,
         |  CAST(n_unk AS BIGINT) AS n_unk
         |FROM step WHERE pos > length(text)
         |ORDER BY doc_id""".stripMargin,

    // d08: substring-level dedup — the oracle replays the planted-span
    // construction (token tagging + shared passage on every 10th doc)
    // and the whole pipeline (positional shingles → df-classed pairing
    // with the same maxDf=32 split → diagonal runs → interval union) on
    // shingle STRINGS, so a hash-collision shortcut on the Spark side
    // could not silently pass. Passage is generated from the same
    // constant the demo plants (Dedup.SharedPassage).
    "d08_substring_dedup" -> {
      val passage = graft.operators.Dedup.SharedPassage.mkString(" ")
      s"""WITH tagged AS (
         |  SELECT doc_id,
         |    list_transform(string_split(text, ' '),
         |      t -> t || '_' || CAST(doc_id AS VARCHAR)) AS wt
         |  FROM documents),
         |docs AS (
         |  SELECT doc_id, CASE WHEN doc_id % 10 = 0
         |    THEN list_concat(wt, string_split('$passage', ' '))
         |    ELSE wt END AS w
         |  FROM tagged),
         |shp AS (
         |  SELECT doc_id, u.pos AS pos, u.g AS g FROM (
         |    SELECT doc_id, unnest(list_transform(range(0, len(w) - 8 + 1),
         |      i -> struct_pack(pos := i, g := array_to_string(w[i+1:i+8], ' ')))) AS u
         |    FROM docs WHERE len(w) >= 8)),
         |dfreq AS (
         |  SELECT g, COUNT(DISTINCT doc_id) AS df FROM shp GROUP BY g
         |  HAVING COUNT(DISTINCT doc_id) >= 2),
         |m AS (SELECT s.doc_id, s.pos, s.g, d.df FROM shp s JOIN dfreq d USING (g)),
         |pairs_low AS (
         |  SELECT y.doc_id AS doc_id, x.doc_id AS src_id, y.pos AS pos,
         |    y.pos - x.pos AS diag
         |  FROM m x JOIN m y ON x.g = y.g AND x.doc_id < y.doc_id
         |  WHERE x.df <= 32),
         |canon AS (
         |  SELECT g, doc_id AS cdoc, pos AS cpos FROM (
         |    SELECT g, doc_id, pos,
         |      ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
         |    FROM m WHERE df > 32) WHERE rn = 1),
         |pairs_high AS (
         |  SELECT m.doc_id, c.cdoc AS src_id, m.pos, m.pos - c.cpos AS diag
         |  FROM m JOIN canon c USING (g)
         |  WHERE m.df > 32 AND m.doc_id <> c.cdoc),
         |allp AS (SELECT * FROM pairs_low UNION ALL SELECT * FROM pairs_high),
         |runs AS (
         |  SELECT doc_id, MIN(pos) AS start_tok, MAX(pos) + 7 AS end_tok
         |  FROM (
         |    SELECT doc_id, src_id, diag, pos,
         |      pos - ROW_NUMBER() OVER (PARTITION BY doc_id, src_id, diag
         |                               ORDER BY pos) AS island
         |    FROM allp)
         |  GROUP BY doc_id, src_id, diag, island
         |  HAVING MAX(pos) + 7 - MIN(pos) + 1 >= 15),
         |ordered AS (
         |  SELECT doc_id, start_tok, end_tok,
         |    MAX(end_tok) OVER (PARTITION BY doc_id ORDER BY start_tok, end_tok
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
         |  FROM runs),
         |grp AS (
         |  SELECT doc_id, start_tok, end_tok,
         |    SUM(CASE WHEN prev_max IS NULL OR start_tok > prev_max + 1
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY start_tok, end_tok) AS g
         |  FROM ordered)
         |SELECT doc_id, CAST(MIN(start_tok) AS BIGINT) AS span_start,
         |  CAST(MAX(end_tok) AS BIGINT) AS span_end,
         |  CAST(MAX(end_tok) - MIN(start_tok) + 1 AS BIGINT) AS n_tokens
         |FROM grp GROUP BY doc_id, g
         |ORDER BY doc_id, span_start""".stripMargin
    },

    // t10: the two-pass sketch pipeline's output is EXACT (candidate
    // false positives are removed by the exact second pass), so the
    // oracle is a plain frequency threshold.
    "t10_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT t AS token FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |tot AS (SELECT COUNT(*) AS n FROM tok)
        |SELECT token, COUNT(*) AS n
        |FROM tok GROUP BY token
        |HAVING COUNT(*) > CAST(floor(0.002 * (SELECT n FROM tot)) AS BIGINT)
        |ORDER BY n DESC, token""".stripMargin,

    "q49_promo_share" ->
      s"""WITH base AS (
         |  SELECT l_extendedprice, l_discount, p_type
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'),
         |a AS (
         |  SELECT
         |    coalesce(CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
         |      THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
         |        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         |      END) AS VARCHAR) AS DOUBLE), 0.0) AS promo_rev,
         |    $REV AS total_rev
         |  FROM base)
         |SELECT round(100.0 * promo_rev / total_rev, 6) AS promo_share,
         |  promo_rev, total_rev
         |FROM a""".stripMargin,

    "q50_revenue_concentration" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |      AS DECIMAL(19,4)) AS part_rev
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |      AS DECIMAL(27,4)) AS tot_rev,
        |    CAST(COUNT(DISTINCT l_partkey) * 10 AS DECIMAL(18,0)) AS np_x
        |  FROM lineitem)
        |SELECT l_partkey,
        |  CAST(CAST(part_rev AS VARCHAR) AS DOUBLE) AS part_rev
        |FROM pp, tot
        |WHERE part_rev * np_x > tot_rev * 13
        |ORDER BY part_rev DESC, l_partkey""".stripMargin,

    "q51_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(CAST(SUM(
        |    CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) -
        |    CAST(p_retailprice AS DECIMAL(18,4)) *
        |      CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |    AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q52_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name, $REV AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "t13_source_overlap" ->
      """WITH counts AS (
        |  SELECT source, t AS tok, COUNT(*) AS cnt FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS t
        |    FROM documents) WHERE len(t) > 0
        |  GROUP BY source, t),
        |topk AS (
        |  SELECT source, tok FROM (
        |    SELECT source, tok,
        |      ROW_NUMBER() OVER (PARTITION BY source
        |        ORDER BY cnt DESC, tok) AS rn
        |    FROM counts) WHERE rn <= 50),
        |sizes AS (SELECT source, COUNT(*) AS sz FROM topk GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    COUNT(*) AS n_shared
        |  FROM topk a JOIN topk b
        |    ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared,
        |  round(CAST(n_shared AS DOUBLE) /
        |    (sa.sz + sb.sz - n_shared), 4) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON source_a = sa.source
        |JOIN sizes sb ON source_b = sb.source
        |ORDER BY source_a, source_b""".stripMargin,

    // s12: the filtered exact search replays as s01's SQL plus the
    // pre-filter — all k rows must satisfy the predicate.
    "s12_ann_filtered" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
        |    (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                           CAST(embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(qv, qv))), 4) AS cos_sim
        |FROM embeddings, q
        |WHERE vec_id <> 0 AND label = 1
        |ORDER BY cos_sim DESC, vec_id
        |LIMIT 10""".stripMargin,

    // c19: TVD drift — exact cross-multiplied integers with one final
    // IEEE division of exactly-representable operands; replayed whole.
    // c21: the decimal-digit GUID plant and the marker+GUID capture
    // replay on the identical RE2-portable pattern.
    // t21: the Viterbi lattice decode replayed as TWO recursive
    // passes over the SAME vocab CTE the greedy replay uses — a
    // forward DP whose state is the rolling 8-cost window (b1..b8 =
    // best cost at pos−7..pos; vocab max piece len is 5, 8 leaves
    // headroom) plus the append-only chosen-consume/id logs (sound:
    // best[pos] is final once computed), then a backtrack walk over
    // the logs. The per-step argmin is ORDER BY cost, ordlen DESC —
    // the kernel's exact tie-break (UNK carries ordlen 0, so any
    // equal-cost piece beats it; a piece is unique given end+len).
    "t21_viterbi_tokenize" -> {
      // the fwd CTE's rolling window is 8 slots wide; a vocab piece
      // longer than that would be SILENTLY dropped by `v.len <= 8`
      // and decode a worse lattice — fail at map construction, not
      // with a confusing value mismatch at gate time
      require(operators.TextOps.SubwordVocab.forall(_.length <= 8),
        "t21 oracle window (8) is narrower than a SubwordVocab piece")
      s"""$SubwordIdsCte,
         |fwd(doc_id, text, pos, b1, b2, b3, b4, b5, b6, b7, b8,
         |    lens, pids) AS (
         |  SELECT doc_id, text, 0,
         |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |    CAST(NULL AS BIGINT), CAST(0 AS BIGINT), '', ''
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id, text, pos + 1, b2, b3, b4, b5, b6, b7, b8,
         |    cand['c'], lens || ',' || CAST(cand['n'] AS VARCHAR),
         |    pids || ',' || CAST(cand['i'] AS VARCHAR)
         |  FROM (SELECT f.*,
         |      (SELECT {'c': c, 'n': n, 'i': i} FROM (
         |         SELECT CASE v.len WHEN 1 THEN b8 WHEN 2 THEN b7
         |             WHEN 3 THEN b6 WHEN 4 THEN b5 WHEN 5 THEN b4
         |             WHEN 6 THEN b3 WHEN 7 THEN b2 ELSE b1 END + 1 AS c,
         |           v.len AS o, v.len AS n, v.id AS i
         |         FROM vocab v
         |         WHERE v.len <= f.pos + 1 AND v.len <= 8
         |           AND substr(f.text, f.pos + 2 - v.len, v.len) = v.piece
         |           AND (CASE v.len WHEN 1 THEN b8 WHEN 2 THEN b7
         |             WHEN 3 THEN b6 WHEN 4 THEN b5 WHEN 5 THEN b4
         |             WHEN 6 THEN b3 WHEN 7 THEN b2 ELSE b1 END) IS NOT NULL
         |         UNION ALL
         |         SELECT b8 + 3, 0, 1, -1
         |       ) cands ORDER BY c, o DESC LIMIT 1) AS cand
         |    FROM fwd f WHERE f.pos < length(f.text)) x),
         |fin AS (SELECT doc_id, text, b8 AS total_cost,
         |    string_split(substr(lens, 2), ',') AS la,
         |    string_split(substr(pids, 2), ',') AS ia
         |  FROM fwd WHERE pos = length(text)),
         |bwd(doc_id, pos, la, ia, path) AS (
         |  SELECT doc_id, length(text), la, ia, '' FROM fin
         |  UNION ALL
         |  SELECT doc_id, pos - CAST(la[pos] AS BIGINT), la, ia,
         |    CASE WHEN path = '' THEN ia[pos]
         |         ELSE ia[pos] || ',' || path END
         |  FROM bwd WHERE pos > 0),
         |vit AS (SELECT doc_id, path FROM bwd WHERE pos = 0),
         |greedy AS (SELECT doc_id,
         |    CAST(length(ids) - length(replace(ids, ',', '')) AS BIGINT)
         |      AS n_greedy
         |  FROM step WHERE pos > length(text))
         |SELECT v.doc_id,
         |  CAST(CASE WHEN v.path = '' THEN 0
         |    ELSE len(string_split(v.path, ',')) END AS BIGINT) AS n_pieces,
         |  CAST(CASE WHEN v.path = '' THEN 0
         |    ELSE len(list_filter(string_split(v.path, ','), x -> x = '-1'))
         |    END AS BIGINT) AS n_unk,
         |  g.n_greedy AS n_pieces_greedy,
         |  v.path AS ids_csv
         |FROM vit v JOIN greedy g USING (doc_id)
         |ORDER BY v.doc_id""".stripMargin
    },

    // c25: c24's replay extended with the two-span prompt/response
    // construction — spans built per doc, empty ones dropped, clipped
    // per sequence, seg_idx by a seq-partitioned row_number (seg_start
    // is unique per seq: spans tile the token stream).
    "c25_sft_pack" ->
      s"""$SubwordIdsCte,
         |d AS (SELECT doc_id,
         |    CAST(length(ids) - length(replace(ids, ',', '')) AS BIGINT) AS n
         |  FROM step WHERE pos > length(text)),
         |o AS (SELECT doc_id, n,
         |    CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS ts
         |  FROM d),
         |sp AS (
         |  SELECT doc_id, ts AS lo, ts + (n // 3) AS hi,
         |    CAST(0 AS BIGINT) AS loss_mask
         |  FROM o WHERE n > 0 AND n // 3 > 0
         |  UNION ALL
         |  SELECT doc_id, ts + (n // 3), ts + n, CAST(1 AS BIGINT)
         |  FROM o WHERE n > 0 AND n - n // 3 > 0),
         |e AS (SELECT doc_id, lo, hi, loss_mask,
         |    unnest(range(lo // 128, (hi - 1) // 128 + 1)) AS seq_id
         |  FROM sp),
         |s AS (SELECT seq_id, doc_id, loss_mask,
         |    greatest(lo, seq_id * 128) - seq_id * 128 AS seg_start,
         |    least(hi, (seq_id + 1) * 128) -
         |      greatest(lo, seq_id * 128) AS seg_len
         |  FROM e)
         |SELECT CAST(seq_id AS BIGINT) AS seq_id,
         |  CAST(row_number() OVER (PARTITION BY seq_id ORDER BY seg_start)
         |    - 1 AS BIGINT) AS seg_idx,
         |  doc_id, CAST(seg_start AS BIGINT) AS seg_start,
         |  CAST(seg_len AS BIGINT) AS seg_len, loss_mask
         |FROM s
         |ORDER BY seq_id, seg_idx""".stripMargin,

    // c24: the whole boundary layout replays — ids rebuilt by the t09
    // CTE (comma count = piece count), global offsets by a window
    // prefix-sum, per-doc sequence ranges by generate-series, the
    // span clipping in exact integer min/max, seg_idx by a
    // seq-partitioned row_number.
    "c24_boundary_masks" ->
      s"""$SubwordIdsCte,
         |d AS (SELECT doc_id,
         |    CAST(length(ids) - length(replace(ids, ',', '')) AS BIGINT) AS n
         |  FROM step WHERE pos > length(text)),
         |o AS (SELECT doc_id, n,
         |    CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS ts
         |  FROM d),
         |e AS (SELECT doc_id, n, ts,
         |    unnest(range(ts // 128, (ts + n - 1) // 128 + 1)) AS seq_id
         |  FROM o WHERE n > 0),
         |s AS (SELECT seq_id, doc_id,
         |    greatest(ts, seq_id * 128) - seq_id * 128 AS seg_start,
         |    least(ts + n, (seq_id + 1) * 128) -
         |      greatest(ts, seq_id * 128) AS seg_len
         |  FROM e)
         |SELECT CAST(seq_id AS BIGINT) AS seq_id,
         |  CAST(row_number() OVER (PARTITION BY seq_id ORDER BY seg_start)
         |    - 1 AS BIGINT) AS seg_idx,
         |  doc_id, CAST(seg_start AS BIGINT) AS seg_start,
         |  CAST(seg_len AS BIGINT) AS seg_len
         |FROM s
         |ORDER BY seq_id, seg_idx""".stripMargin,

    // c23: a FULL byte-level differential check of the shard layout —
    // the ids are rebuilt with the t09 recursive CTE, the global
    // positions with a window prefix-sum, and every uint16-LE byte
    // pair re-serialized with printf; the hex strings must agree
    // character for character. UNK (−1) → +65536 mod 65536 = FFFF,
    // the same two's-complement identity as Spark's `tok & 65535`.
    "c23_shard_export" ->
      s"""$SubwordIdsCte,
         |d AS (SELECT doc_id, substr(ids, 2) AS csv,
         |    CAST(length(ids) - length(replace(ids, ',', '')) AS BIGINT) AS n
         |  FROM step WHERE pos > length(text)),
         |o AS (SELECT doc_id, csv,
         |    CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS ts
         |  FROM d),
         |e AS (SELECT doc_id, ts,
         |    unnest(string_split(csv, ',')) AS sid,
         |    unnest(range(1, len(string_split(csv, ',')) + 1)) AS i
         |  FROM o),
         |p AS (SELECT (ts + i - 1) // 256 AS shard_id,
         |    (ts + i - 1) % 256 AS off,
         |    (CAST(sid AS BIGINT) + 65536) % 65536 AS v
         |  FROM e)
         |SELECT CAST(shard_id AS BIGINT) AS shard_id,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  string_agg(printf('%02X%02X', v % 256, v // 256), ''
         |    ORDER BY off) AS bytes_hex
         |FROM p
         |GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin,

    // c22: the demo URL plant and the host-canonicalization steps
    // replay exactly as in d15's oracle; the rollup, the single-divide
    // share, and the cap replay in SQL (sum widens to HUGEINT — cast
    // back to BIGINT per the gotcha).
    "c22_domain_mixture" ->
      """WITH u AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      'HTTPS://Site' || ((doc_id // 5) % 50) ||
        |      '.Example.com/docs/' || (doc_id // 5)
        |    WHEN doc_id % 5 = 1 THEN
        |      'https://site' || ((doc_id // 5) % 50) ||
        |      '.example.com:443/docs/' || (doc_id // 5)
        |    WHEN doc_id % 5 = 2 THEN
        |      'https://site' || ((doc_id // 5) % 50) ||
        |      '.example.com/docs/' || (doc_id // 5) ||
        |      '?utm_source=feed&utm_campaign=x'
        |    WHEN doc_id % 5 = 3 THEN
        |      'https://site' || ((doc_id // 5) % 50) ||
        |      '.example.com/docs/' || (doc_id // 5) || '/'
        |    ELSE
        |      'https://site' || ((doc_id // 5) % 50) ||
        |      '.example.com/docs/' || (doc_id // 5) ||
        |      '?b=2&utm_medium=m&a=1#frag' END AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS hostport
        |  FROM u),
        |h AS (SELECT doc_id,
        |    CASE WHEN scheme = '' THEN url
        |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |         WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |         ELSE hostport END AS domain
        |  FROM p),
        |t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |d AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |  FROM h JOIN t USING (doc_id) GROUP BY domain),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM d)
        |SELECT domain, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE), 9)
        |    AS tok_share,
        |  least(n_docs, 15) AS n_kept
        |FROM d CROSS JOIN tot
        |ORDER BY domain""".stripMargin,

    "c21_canary_scan" ->
      """WITH planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 3
        |         THEN text || ' canary ' ||
        |              lpad(CAST(doc_id AS VARCHAR), 8, '0') ||
        |              '-dead-beef-cafe-' ||
        |              lpad(CAST(doc_id AS VARCHAR), 12, '0')
        |         ELSE text END AS text
        |  FROM documents),
        |h AS (SELECT doc_id,
        |    regexp_extract_all(text,
        |      'canary ([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12})',
        |      1) AS hits
        |  FROM planted)
        |SELECT doc_id,
        |  CAST(len(hits) AS BIGINT) AS n_canaries,
        |  COALESCE(array_to_string(list_sort(hits), ','), '') AS canaries,
        |  CAST(len(hits) = 0 AS BIGINT) AS keep
        |FROM h
        |ORDER BY doc_id""".stripMargin,

    // c20: the plant, every count (length deltas, multiline-anchored
    // regexp matches, the distinct-stop intersection) and every
    // single-divide ratio replay on the same RE2-portable patterns;
    // flags compare the identical correctly-rounded quotients against
    // the identical literals.
    "c20_gopher_rules" ->
      """WITH planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 1
        |           THEN text || ' #### ## ###### ### ## #### ### ## #### ###'
        |         WHEN doc_id % 7 = 3
        |           THEN repeat('- item x' || chr(10), 9) || text
        |         WHEN doc_id % 7 = 5
        |           THEN text || chr(10) || 'to be continued...' ||
        |                chr(10) || 'read more soon...'
        |         ELSE text END AS text
        |  FROM documents),
        |m AS (SELECT doc_id, text,
        |    len(regexp_extract_all(text, '[^ \n]+')) AS n_words,
        |    len(string_split(text, chr(10))) AS n_lines,
        |    len(regexp_replace(text, '[ \n]', '', 'g')) AS sum_len,
        |    len(text) - len(replace(text, '#', '')) AS n_hash,
        |    (len(text) - len(replace(text, '...', ''))) // 3 AS n_ell3,
        |    len(regexp_extract_all(text, '(?m)^[-*•] ')) AS n_bullet,
        |    len(regexp_extract_all(text, '(?m)\.\.\.$')) AS n_ell_line,
        |    len(regexp_extract_all(text, '(^|[ \n])[^ \n]*[a-zA-Z]'))
        |      AS n_alpha,
        |    len(list_intersect(regexp_extract_all(lower(text), '[^ \n]+'),
        |      ['the','a'])) AS n_stop
        |  FROM planted),
        |r AS (SELECT doc_id,
        |    CAST(n_words AS BIGINT) AS n_words,
        |    CAST(n_lines AS BIGINT) AS n_lines,
        |    CAST(sum_len AS DOUBLE) / n_words AS mean_word_len,
        |    CAST(n_hash + n_ell3 AS DOUBLE) / n_words AS symbol_ratio,
        |    CAST(n_bullet AS DOUBLE) / n_lines AS bullet_ratio,
        |    CAST(n_ell_line AS DOUBLE) / n_lines AS ellipsis_ratio,
        |    CAST(n_alpha AS DOUBLE) / n_words AS alpha_ratio,
        |    CAST(n_stop AS BIGINT) AS n_stop_hits
        |  FROM m),
        |f AS (SELECT *,
        |    CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT) AS r_words,
        |    CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS BIGINT)
        |      AS r_mean,
        |    CAST(symbol_ratio < 0.1 AS BIGINT) AS r_symbol,
        |    CAST(bullet_ratio < 0.9 AS BIGINT) AS r_bullet,
        |    CAST(ellipsis_ratio < 0.3 AS BIGINT) AS r_ellipsis,
        |    CAST(alpha_ratio > 0.8 AS BIGINT) AS r_alpha,
        |    CAST(n_stop_hits >= 2 AS BIGINT) AS r_stop
        |  FROM r)
        |SELECT *, CAST(r_words + r_mean + r_symbol + r_bullet +
        |    r_ellipsis + r_alpha + r_stop = 7 AS BIGINT) AS keep
        |FROM f
        |ORDER BY doc_id""".stripMargin,

    "c19_drift_report" ->
      """WITH d AS (SELECT
        |    CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS snap,
        |    CAST(least(len(string_split(text, ' ')) // 32, 7) AS VARCHAR)
        |      AS btok,
        |    CAST(least(n_chars // 256, 7) AS VARCHAR) AS bchr,
        |    lang, source
        |  FROM documents),
        |m AS (SELECT snap, 'tokens' AS metric, btok AS bucket FROM d
        |  UNION ALL SELECT snap, 'chars', bchr FROM d
        |  UNION ALL SELECT snap, 'lang', lang FROM d
        |  UNION ALL SELECT snap, 'source', source FROM d),
        |bc AS (SELECT metric, bucket,
        |    CAST(SUM(CASE WHEN snap = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cnt_a,
        |    CAST(SUM(CASE WHEN snap = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cnt_b
        |  FROM m GROUP BY metric, bucket),
        |tot AS (SELECT metric, COUNT(*) AS n_buckets,
        |    CAST(SUM(cnt_a) AS BIGINT) AS total_a,
        |    CAST(SUM(cnt_b) AS BIGINT) AS total_b
        |  FROM bc GROUP BY metric),
        |agg AS (SELECT bc.metric, tot.n_buckets, tot.total_a, tot.total_b,
        |    CAST(SUM(abs(bc.cnt_a * tot.total_b - bc.cnt_b * tot.total_a))
        |      AS BIGINT) AS tvd_num
        |  FROM bc JOIN tot ON bc.metric = tot.metric
        |  GROUP BY bc.metric, tot.n_buckets, tot.total_a, tot.total_b)
        |SELECT metric, n_buckets, total_a, total_b, tvd_num,
        |  CAST(tvd_num AS DOUBLE) / (2.0 * total_a * total_b) AS tvd
        |FROM agg
        |ORDER BY metric""".stripMargin,

    // d14: the full FastSS pipeline — min-id representatives,
    // deletion-neighborhood keys, key join, Levenshtein verify — is
    // plain relational algebra + a character DP both engines define
    // identically (ASCII corpus); replayed end to end, no side-table.
    // d16: the re-lining, the plant, the distinct-doc line frequency,
    // the boilerplate cut and the ordered reassembly all replay in
    // SQL on line STRINGS (the demo keys on strings exactly so this
    // is a full replay; the 100 TB form hashes the key).
    "d16_line_dedup" ->
      """WITH lined AS (SELECT doc_id,
        |    array_to_string(list_transform(
        |      range(0, (len(string_split(text, ' ')) + 7) // 8),
        |      i -> array_to_string(
        |        string_split(text, ' ')[i*8 + 1 : i*8 + 8], ' ')),
        |      chr(10)) AS text
        |  FROM documents),
        |planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 1
        |           THEN 'subscribe to our newsletter today' || chr(10) || text
        |         WHEN doc_id % 4 = 3
        |           THEN text || chr(10) || 'subscribe to our newsletter today'
        |         ELSE text END AS text
        |  FROM lined),
        |ln AS (SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
        |  FROM planted),
        |boiler AS (SELECT line FROM ln
        |  GROUP BY line HAVING count(DISTINCT doc_id) >= 50),
        |kept AS (SELECT ln.* FROM ln ANTI JOIN boiler USING (line)),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
        |  FROM ln GROUP BY doc_id),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY pos) AS clean
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, t.n_lines,
        |  CAST(t.n_lines - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
        |  COALESCE(a.clean, '') AS clean,
        |  CAST(len(COALESCE(a.clean, '')) AS BIGINT) AS n_chars_clean
        |FROM tot t LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // d17: t20's sentence construction + boundary-to-newline marking
    // composed with d16's line-dedup replay — the oracle composes the
    // same two halves the operator does.
    "d17_sentence_dedup" ->
      """WITH sentenced AS (SELECT doc_id,
        |    array_to_string(list_transform(
        |      range(0, (len(string_split(text, ' ')) + 9) // 10),
        |      i -> array_to_string(
        |             string_split(text, ' ')[i*10 + 1 : i*10 + 10], ' ')
        |           || ['.', '!', '?'][(i % 3) + 1]), ' ') AS text
        |  FROM documents),
        |planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |         THEN text || ' all rights reserved worldwide.'
        |         ELSE text END AS text
        |  FROM sentenced),
        |lined AS (SELECT doc_id,
        |    replace(replace(replace(text,
        |      '. ', '.' || chr(10)), '! ', '!' || chr(10)),
        |      '? ', '?' || chr(10)) AS text
        |  FROM planted),
        |ln AS (SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
        |  FROM lined),
        |boiler AS (SELECT line FROM ln
        |  GROUP BY line HAVING count(DISTINCT doc_id) >= 50),
        |kept AS (SELECT ln.* FROM ln ANTI JOIN boiler USING (line)),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
        |  FROM ln GROUP BY doc_id),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY pos) AS clean
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, t.n_lines,
        |  CAST(t.n_lines - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
        |  COALESCE(a.clean, '') AS clean,
        |  CAST(len(COALESCE(a.clean, '')) AS BIGINT) AS n_chars_clean
        |FROM tot t LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // d15: the synthetic URL plant and every canonicalization step
    // (fragment strip, scheme/host lowering, default-port strip, path
    // normalization, tracking-param filter + bytewise sort) replay on
    // the same RE2-portable patterns; the dedup is a plain window.
    "d15_url_dedup" ->
      """WITH u AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      'HTTPS://Site' || ((doc_id // 5) % 50) ||
        |      '.Example.com/docs/' || (doc_id // 5)
        |    WHEN doc_id % 5 = 1 THEN
        |      'https://site' || ((doc_id // 5) % 50) ||
        |      '.example.com:443/docs/' || (doc_id // 5)
        |    WHEN doc_id % 5 = 2 THEN
        |      'https://site' || ((doc_id // 5) % 50) ||
        |      '.example.com/docs/' || (doc_id // 5) ||
        |      '?utm_source=feed&utm_campaign=x'
        |    WHEN doc_id % 5 = 3 THEN
        |      'https://site' || ((doc_id // 5) % 50) ||
        |      '.example.com/docs/' || (doc_id // 5) || '/'
        |    ELSE
        |      'https://site' || ((doc_id // 5) % 50) ||
        |      '.example.com/docs/' || (doc_id // 5) ||
        |      '?b=2&utm_medium=m&a=1#frag' END AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS hostport,
        |    regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1) AS rawpath,
        |    regexp_extract(regexp_replace(url, '#.*$', ''),
        |      '\?(.*)$', 1) AS query
        |  FROM u),
        |n AS (SELECT doc_id, url, scheme,
        |    CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |         WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |         ELSE hostport END AS host,
        |    CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path0,
        |    COALESCE(array_to_string(
        |      list_sort(list_filter(string_split(query, '&'),
        |        x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|ref)(=|$)')
        |          AND x <> '')), '&'), '') AS kept
        |  FROM p),
        |c AS (SELECT doc_id, url,
        |    CASE WHEN scheme = '' THEN url
        |         ELSE scheme || '://' || host ||
        |           CASE WHEN path0 <> '/' AND path0 LIKE '%/'
        |                THEN substring(path0, 1, length(path0) - 1)
        |                ELSE path0 END ||
        |           CASE WHEN kept = '' THEN '' ELSE '?' || kept END
        |    END AS canon_url
        |  FROM n)
        |SELECT doc_id, url, canon_url,
        |  CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_dups,
        |  CAST(doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS BIGINT)
        |    AS is_keeper
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    "d14_fuzzy_join" ->
      """WITH t0 AS (SELECT doc_id,
        |    array_to_string((string_split(text, ' '))[1:4], ' ') AS t0
        |  FROM documents),
        |raw AS (SELECT doc_id AS id,
        |    CASE WHEN doc_id % 3 = 1
        |         THEN substr(t0, 1, 2) || substr(t0, 4)
        |         ELSE t0 END AS s
        |  FROM t0),
        |u AS (SELECT min(id) AS id, s FROM raw GROUP BY s),
        |t AS (SELECT id, s, len(s) AS len FROM u),
        |ks AS (SELECT id, s AS k FROM t
        |  UNION ALL
        |  SELECT id, substr(s, 1, CAST(j AS INT) - 1) ||
        |             substr(s, CAST(j AS INT) + 1) AS k
        |  FROM (SELECT id, s, unnest(range(1, len + 1)) AS j
        |        FROM t WHERE len >= 1)),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |         FROM ks a JOIN ks b ON a.k = b.k AND a.id < b.id)
        |SELECT c.id_a AS doc_a, c.id_b AS doc_b,
        |  ta.s AS title_a, tb.s AS title_b,
        |  CAST(levenshtein(ta.s, tb.s) AS BIGINT) AS dist
        |FROM cand c JOIN t ta ON ta.id = c.id_a
        |  JOIN t tb ON tb.id = c.id_b
        |WHERE levenshtein(ta.s, tb.s) <= 1
        |ORDER BY doc_a, doc_b""".stripMargin,

    // t20: the sentence plant (10-token groups, cycling terminators)
    // and the splitter (three LITERAL boundary replaces — no regex
    // backrefs, whose syntax differs between engines — then one
    // control-char split) replay exactly.
    "t20_sentence_split" ->
      """WITH planted AS (SELECT doc_id,
        |    array_to_string(list_transform(
        |      range(0, (len(string_split(text, ' ')) + 9) // 10),
        |      i -> array_to_string(
        |             string_split(text, ' ')[i*10 + 1 : i*10 + 10], ' ')
        |           || ['.', '!', '?'][(i % 3) + 1]), ' ') AS text
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    replace(replace(replace(text,
        |      '. ', '.' || chr(1)), '! ', '!' || chr(1)),
        |      '? ', '?' || chr(1)) AS t
        |  FROM planted),
        |s AS (SELECT doc_id,
        |    unnest(string_split(t, chr(1))) AS sentence,
        |    unnest(range(1, len(string_split(t, chr(1))) + 1)) AS pos
        |  FROM m)
        |SELECT doc_id, CAST(pos - 1 AS BIGINT) AS sent_id, sentence,
        |  CAST(len(string_split(sentence, ' ')) AS BIGINT) AS n_tokens
        |FROM s
        |ORDER BY doc_id, sent_id""".stripMargin,

    // t19: the token distribution is recomputed from raw text; only
    // ln comes from the memo (keyed on integer counts cast to
    // double); terms, the DECIMAL sum (VARCHAR→DOUBLE route) and the
    // fixed-order final expression replay exactly.
    "t19_token_entropy" ->
      s"""WITH lnm AS (SELECT x, lx FROM '${OracleAux.Root}/t19_ln/*.parquet'),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |cnt AS (SELECT doc_id, w, count(*) AS c FROM tok
         |  WHERE len(w) > 0 GROUP BY doc_id, w),
         |agg AS (SELECT doc_id,
         |    CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_distinct,
         |    SUM(CAST(round(CAST(c AS DOUBLE) * lc.lx, 9)
         |      AS DECIMAL(28,9))) AS s
         |  FROM cnt JOIN lnm lc ON lc.x = CAST(c AS DOUBLE)
         |  GROUP BY doc_id)
         |SELECT a.doc_id, a.n_tokens, a.n_distinct,
         |  round(lnn.lx - CAST(CAST(a.s AS VARCHAR) AS DOUBLE) / a.n_tokens,
         |    6) AS entropy_nats
         |FROM agg a JOIN lnm lnn ON lnn.x = CAST(a.n_tokens AS DOUBLE)
         |ORDER BY a.doc_id""".stripMargin,

    // t18: the invisible/exotic-space plants are constructed from
    // chr() codepoints and both scrub passes replay on explicit
    // \x{XXXX} char classes — Java \uXXXX ↔ RE2 \x{XXXX}, no \p{}
    // property classes whose tables could drift between engines.
    "t18_unicode_scrub" ->
      """WITH planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 1 THEN chr(65279) ||
        |           replace(text, ' the ', ' t' || chr(8203) || 'he ')
        |         WHEN doc_id % 6 = 3 THEN replace(text, ' ', chr(160))
        |         WHEN doc_id % 6 = 5 THEN text || chr(173) || chr(8205)
        |         ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}]')) AS BIGINT)
        |    AS n_invisible,
        |  CAST(len(regexp_extract_all(text,
        |    '[\x{00A0}\x{2009}\x{202F}\x{3000}]')) AS BIGINT) AS n_spaces,
        |  regexp_replace(regexp_replace(text,
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}]', '', 'g'),
        |    '[\x{00A0}\x{2009}\x{202F}\x{3000}]', ' ', 'g') AS clean,
        |  CAST(len(regexp_replace(regexp_replace(text,
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}]', '', 'g'),
        |    '[\x{00A0}\x{2009}\x{202F}\x{3000}]', ' ', 'g')) AS BIGINT)
        |    AS n_chars_clean
        |FROM planted
        |ORDER BY doc_id""".stripMargin,

    // t17: the plant and the strip both replay as RE2-portable
    // regexp_replace ('g' flag = Spark's replace-all default) and
    // literal replaces in the same amp-last order.
    "t17_html_strip" ->
      """WITH planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 2
        |         THEN '<html><p class="x">' ||
        |              replace(text, ' the ', ' <b>the</b> ') || '</p>'
        |         ELSE text END AS text
        |  FROM documents),
        |strip AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '<[^>]*>')) AS BIGINT)
        |      AS n_tags,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(text, '<[^>]*>', '', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |      ' {2,}', ' ', 'g')) AS clean
        |  FROM planted)
        |SELECT doc_id, n_tags, clean,
        |  CAST(len(clean) AS BIGINT) AS n_chars_clean
        |FROM strip
        |ORDER BY doc_id""".stripMargin,

    // t16: chunk boundaries are pure integer arithmetic on the
    // whitespace-token count (same ceil-div in both engines); the
    // chunk text is a clamped list slice re-joined on the same
    // delimiter, so the replay is bit-exact.
    "t16_chunk_split" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |                  len(string_split(text, ' ')) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, w, n,
        |        unnest(range(0, greatest(1, (n - 16 + 47) // 48))) AS chunk_id
        |      FROM d)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(chunk_id * 48 AS BIGINT) AS tok_start,
        |  CAST(least(64, n - chunk_id * 48) AS BIGINT) AS n_tokens,
        |  array_to_string(w[chunk_id*48 + 1 : chunk_id*48 + 64], ' ')
        |    AS chunk_text
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // t14: tf/df ranking — the division is one IEEE double op on two
    // exact integers (correctly rounded by definition), so the ORDER
    // BY agrees bit-for-bit with Spark's; ties break on the token.
    "t14_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM toks
        |  WHERE len(token) > 0 GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |ranked AS (
        |  SELECT t.doc_id, t.token, t.tf, df.df,
        |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |      ORDER BY CAST(t.tf AS DOUBLE) / df.df DESC, t.token) AS rk
        |  FROM tf t JOIN df USING (token))
        |SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    // d12: d07's full recursive-CTE component replay, extended with
    // the t02 quality fragment and the per-cluster argmax — the
    // entire keep-best resolution recomputed from raw text.
    "d12_keep_best_dedup" ->
      """WITH RECURSIVE pairs AS (
        |  WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |  sh AS (SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(w)-5+2),
        |             i -> array_to_string(w[i:i+4], ' '))) AS s
        |         FROM toks WHERE len(w) >= 5),
        |  inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |  inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |            FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        |            GROUP BY 1, 2)
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN (SELECT doc_id, len(s) AS n FROM sh) za ON doc_a = za.doc_id
        |  JOIN (SELECT doc_id, len(s) AS n FROM sh) zb ON doc_b = zb.doc_id
        |  WHERE round(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) >= 0.5),
        |bidir AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |walk(doc, lab) AS (
        |  SELECT a, a FROM bidir
        |  UNION
        |  SELECT e.b, w.lab FROM walk w JOIN bidir e ON e.a = w.doc),
        |lab AS (SELECT doc AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id
        |        FROM walk GROUP BY doc),
        |qual AS (
        |  SELECT doc_id,
        |    CASE WHEN n_tokens < 8 THEN 0.0
        |         ELSE round(1.0 - stopword_ratio, 4) END AS quality_score
        |  FROM (
        |    SELECT doc_id,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |      CAST(len(list_filter(string_split(text, ' '),
        |           w -> w IN ('the', 'a'))) AS DOUBLE)
        |        / len(string_split(text, ' ')) AS stopword_ratio
        |    FROM documents) t),
        |ranked AS (
        |  SELECT l.doc_id, l.cluster_id, q.quality_score,
        |    ROW_NUMBER() OVER (PARTITION BY l.cluster_id
        |      ORDER BY q.quality_score DESC, l.doc_id) AS rn
        |  FROM lab l JOIN qual q USING (doc_id)),
        |keep AS (SELECT cluster_id, doc_id AS kept_doc_id
        |         FROM ranked WHERE rn = 1)
        |SELECT r.doc_id, r.cluster_id, k.kept_doc_id, r.quality_score,
        |  CASE WHEN r.doc_id = k.kept_doc_id THEN 'keep' ELSE 'drop' END AS action
        |FROM ranked r JOIN keep k USING (cluster_id)
        |ORDER BY r.doc_id""".stripMargin,

    // c15: the schedule replayed with one global window (fine
    // single-threaded) over the t02 quality fragment; the engine must
    // reproduce it with the distributed prefix-sum rank.
    "c15_curriculum_phases" ->
      """WITH qual AS (
        |  SELECT doc_id,
        |    CASE WHEN n_tokens < 8 THEN 0.0
        |         ELSE round(1.0 - stopword_ratio, 4) END AS quality_score,
        |    n_tokens
        |  FROM (
        |    SELECT doc_id,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |      CAST(len(list_filter(string_split(text, ' '),
        |           w -> w IN ('the', 'a'))) AS DOUBLE)
        |        / len(string_split(text, ' ')) AS stopword_ratio
        |    FROM documents) t),
        |ranked AS (
        |  SELECT quality_score, n_tokens,
        |    ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS rnk,
        |    COUNT(*) OVER () AS n
        |  FROM qual)
        |SELECT CAST((rnk - 1) * 4 // n AS BIGINT) AS phase,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS phase_tokens,
        |  MIN(quality_score) AS min_quality,
        |  MAX(quality_score) AS max_quality
        |FROM ranked GROUP BY 1
        |ORDER BY phase""".stripMargin,

    // q53: the oracle ranks with ONE global window (fine single-
    // threaded); the engine must reproduce it with the distributed
    // prefix-sum — rank arithmetic is exact-integer (// matches div),
    // money stays DECIMAL until the VARCHAR→DOUBLE exit.
    "q53_revenue_deciles" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS cust_rev
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, cust_rev,
        |    ROW_NUMBER() OVER (ORDER BY cust_rev DESC, o_custkey) AS rnk,
        |    COUNT(*) OVER () AS n
        |  FROM rev)
        |SELECT CAST((rnk - 1) * 10 // n + 1 AS BIGINT) AS decile,
        |  COUNT(*) AS n_customers,
        |  CAST(CAST(SUM(cust_rev) AS VARCHAR) AS DOUBLE) AS decile_revenue,
        |  CAST(MIN(rnk) AS BIGINT) AS rank_lo,
        |  CAST(MAX(rnk) AS BIGINT) AS rank_hi
        |FROM ranked GROUP BY 1
        |ORDER BY decile""".stripMargin,

    // c12: packed training sequences — the FULL materialization
    // replays: greedy tokenizer CTE (same vocab constant) → per-doc
    // running token offset → positional unnest to global positions →
    // per-sequence ordered string_agg. Value-exact including the UNK
    // −1 ids and every straddled boundary.
    "c12_pack_sequences" -> {
      s"""$SubwordIdsCte,
         |docs2 AS (
         |  SELECT doc_id, substr(ids, 2) AS ids_csv,
         |    CAST(length(ids) - length(replace(ids, ',', '')) AS BIGINT)
         |      AS n_pieces
         |  FROM step WHERE pos > length(text)),
         |off AS (
         |  SELECT doc_id, ids_csv,
         |    CAST(COALESCE(SUM(n_pieces) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS tok_start
         |  FROM docs2),
         |tok AS (
         |  SELECT unnest(list_transform(range(1, len(l) + 1),
         |    i -> struct_pack(gpos := tok_start + i - 1, id := l[i]))) AS u
         |  FROM (SELECT tok_start, string_split(ids_csv, ',') AS l FROM off))
         |SELECT u.gpos // 128 AS seq_id,
         |  COUNT(*) AS n_tokens,
         |  string_agg(u.id, ',' ORDER BY u.gpos) AS ids_csv
         |FROM tok
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
    },

    // c09: sequence-packing offsets — the distributed prefix-sum must
    // equal the one-pass global running sum, replayed here exactly
    // (all-integer: // is DuckDB floor division, div on the Spark
    // side; SUM OVER returns HUGEINT → cast back to BIGINT).
    "c09_pack_offsets" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tok_start
        |  FROM d)
        |SELECT doc_id, n_tokens, tok_start,
        |  tok_start // 512 AS seq_first,
        |  CASE WHEN n_tokens = 0 THEN tok_start // 512
        |       ELSE (tok_start + n_tokens - 1) // 512 END AS seq_last,
        |  CASE WHEN n_tokens = 0 THEN 0
        |       ELSE (tok_start + n_tokens - 1) // 512 - tok_start // 512 + 1
        |       END AS n_seqs
        |FROM o ORDER BY doc_id""".stripMargin,

    // c10: epochs + residual — all-integer until the one rounded
    // residual division (// is floor division on BIGINTs, matching
    // Spark's div; window COUNT(*) OVER () replays n_src)
    "c10_mixture_epochs" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot_tokens
        |  FROM documents GROUP BY source),
        |b AS (
        |  SELECT *, CAST(500000 // (COUNT(*) OVER ()) AS BIGINT)
        |    AS budget_tokens
        |  FROM s)
        |SELECT source, n_docs, tot_tokens, budget_tokens,
        |  budget_tokens // tot_tokens AS n_epochs,
        |  round(CAST(budget_tokens - (budget_tokens // tot_tokens) *
        |      tot_tokens AS DOUBLE) / tot_tokens, 6) AS residual_rate
        |FROM b ORDER BY source""".stripMargin,

    "c11_corpus_report" ->
      """SELECT source, lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot_tokens,
        |  CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
        |  CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
        |  round(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) /
        |    COUNT(*), 4) AS avg_tokens,
        |  CAST(SUM(CASE WHEN len(string_split(text, ' ')) < 8
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        |  round(CAST(SUM(CASE WHEN len(string_split(text, ' ')) < 8
        |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS short_frac
        |FROM documents
        |GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    // t12: bigram novelty — replayed on bigram STRINGS (the Spark side
    // shuffles e12 hashes; counting by string here means a
    // hash-collision shortcut could not silently pass). Bigram
    // construction matches d04/d08's slicing convention.
    "t12_bigram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> array_to_string(w[i:i+1], ' '))) AS g
        |  FROM toks WHERE len(w) >= 2),
        |occ AS (SELECT doc_id, g, COUNT(*) AS occ FROM bi GROUP BY 1, 2),
        |dfs AS (SELECT g, COUNT(*) AS df FROM occ GROUP BY g)
        |SELECT doc_id,
        |  CAST(SUM(occ) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CASE WHEN df = 1 THEN occ ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  round(CAST(SUM(CASE WHEN df = 1 THEN occ ELSE 0 END) AS DOUBLE) /
        |    SUM(occ), 4) AS novelty
        |FROM occ JOIN dfs USING (g)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // d09: the expected CLEANED corpus is closed-form from the demo's
    // construction — the span pipeline must restore every non-minimum
    // planted doc to exactly its tagged base text (20 tokens removed)
    // and leave everything else untouched. Asserting the closed form
    // (rather than replaying the pipeline) makes this an independent
    // end-to-end check of d08 find + e14 apply together.
    "d09_substring_apply" -> {
      val passage = graft.operators.Dedup.SharedPassage.mkString(" ")
      s"""WITH tagged AS (
         |  SELECT doc_id, array_to_string(
         |    list_transform(string_split(text, ' '),
         |      t -> t || '_' || CAST(doc_id AS VARCHAR)), ' ') AS tt
         |  FROM documents),
         |mn AS (SELECT MIN(doc_id) AS m FROM documents WHERE doc_id % 10 = 0)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 10 = 0 AND doc_id <> (SELECT m FROM mn)
         |         THEN tt
         |       WHEN doc_id % 10 = 0
         |         THEN tt || ' $passage'
         |       ELSE tt END AS clean_text,
         |  CAST(CASE WHEN doc_id % 10 = 0 AND doc_id <> (SELECT m FROM mn)
         |       THEN 20 ELSE 0 END AS BIGINT) AS n_removed
         |FROM tagged
         |ORDER BY doc_id""".stripMargin
    },

    // c07: substring decontamination — the expected cleaned corpus is
    // CLOSED-FORM from the demo's construction (tagging zeroes natural
    // train↔eval matches; the planted passage on every 7th doc must be
    // excised in full, everything else untouched) — an independent
    // end-to-end check of spansAgainst find + e14 apply together.
    "c07_decontaminate" -> {
      val passage = graft.operators.Dedup.SharedPassage.mkString(" ")
      s"""WITH tagged AS (
         |  SELECT doc_id, array_to_string(
         |    list_transform(string_split(text, ' '),
         |      t -> t || '_' || CAST(doc_id AS VARCHAR)), ' ') AS tt
         |  FROM documents)
         |SELECT doc_id, tt AS clean_text,
         |  CAST(CASE WHEN doc_id % 7 = 0 THEN 20 ELSE 0 END AS BIGINT)
         |    AS n_removed
         |FROM tagged
         |ORDER BY doc_id""".stripMargin
    },

    // t09: piece-id materialization — same recursive walk, ids
    // accumulated as a CSV string (n_pieces = comma count: every step
    // appends exactly one comma-prefixed integer).
    "t09_subword_ids" ->
      s"""$SubwordIdsCte
         |SELECT doc_id,
         |  CAST(length(ids) - length(replace(ids, ',', '')) AS BIGINT)
         |    AS n_pieces,
         |  substr(ids, 2) AS ids_csv
         |FROM step WHERE pos > length(text)
         |ORDER BY doc_id""".stripMargin,

    // c06: c02's equal-share planner budgeted in t08 subword tokens —
    // same recursive tokenizer CTE, then the per-source rollup.
    "c06_mixture_subword" ->
      s"""$SubwordStepCte,
         |counts AS (SELECT doc_id, n_sub FROM step WHERE pos > length(text)),
         |per AS (SELECT d.source, COUNT(*) AS n_docs,
         |          CAST(SUM(CAST(c.n_sub AS BIGINT)) AS BIGINT) AS tot_tokens
         |        FROM counts c JOIN documents d USING (doc_id)
         |        GROUP BY d.source)
         |SELECT source, n_docs, tot_tokens,
         |  round(least(1.0,
         |    (100000.0 / (SELECT COUNT(*) FROM per)) / tot_tokens), 6)
         |    AS sample_rate
         |FROM per
         |ORDER BY source""".stripMargin,

    // f07's SyntheticFetcher manifest is a pure function of (dirs=8,
    // filesPerDir=25, pageSize=7) — the oracle regenerates it from
    // generate_series, proving the BFS walker + pagination reassemble
    // the exact tree (no page dropped or duplicated at any boundary).
    "f07_paged_manifest" ->
      """SELECT 'd'||d||'/f'||f AS path,
        |  'file'||f||'.txt' AS name,
        |  'dir'||d||'/file'||f||'.txt' AS rel_path,
        |  'txt' AS ext,
        |  CAST(64 + (d*31 + f*7) % 192 AS BIGINT) AS size,
        |  CAST(1700000000000 + f AS BIGINT) AS mtime
        |FROM generate_series(0, 7) AS gd(d),
        |     generate_series(0, 24) AS gf(f)
        |ORDER BY path""".stripMargin,

    // c13's quarantine fixpoint replayed as bootstrap percolation: the
    // recursive term RE-EMITS the full leaky set each round (UNION ALL
    // keeps the previous round's full set as the working table) and
    // the `cnt > max(n)` guard stops at the fixpoint — the monotone
    // set-growth argument in leakproofSplitOver's docstring. Only the
    // xxhash64 pre-assignment comes from the side-table; shingle
    // inventories and every sweep round are recomputed from documents.
    "c13_leakproof_split" ->
      s"""WITH RECURSIVE assigned AS (
         |  SELECT doc_id, split FROM '${OracleAux.Root}/c13_assigned/*.parquet'),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(w)-8+2),
         |           i -> array_to_string(w[i:i+7], ' '))) AS s
         |       FROM toks WHERE len(w) >= 8),
         |inv AS (SELECT sh.doc_id, unnest(s) AS g, a.split
         |        FROM sh JOIN assigned a ON sh.doc_id = a.doc_id),
         |train_g AS (SELECT DISTINCT g FROM inv WHERE split = 'train'),
         |held AS (SELECT doc_id, g FROM inv WHERE split <> 'train'),
         |walk(doc_id, n) AS (
         |  SELECT doc_id, CAST(count(*) OVER () AS BIGINT) FROM (
         |    SELECT h.doc_id FROM held h JOIN train_g t ON h.g = t.g
         |    GROUP BY 1 HAVING count(*) >= 3)
         |  UNION ALL
         |  SELECT doc_id, cnt FROM (
         |    SELECT doc_id, CAST(count(*) OVER () AS BIGINT) AS cnt FROM (
         |      SELECT h.doc_id FROM held h
         |      JOIN (SELECT g FROM train_g
         |            UNION SELECT h2.g FROM held h2
         |                  JOIN walk w ON h2.doc_id = w.doc_id) u
         |        ON h.g = u.g
         |      GROUP BY 1 HAVING count(*) >= 3))
         |  WHERE cnt > (SELECT max(n) FROM walk)),
         |leaky AS (SELECT DISTINCT doc_id FROM walk)
         |SELECT a.doc_id, a.split,
         |  CASE WHEN l.doc_id IS NOT NULL THEN 'train' ELSE a.split END
         |    AS final_split
         |FROM assigned a LEFT JOIN leaky l ON a.doc_id = l.doc_id
         |ORDER BY a.doc_id""".stripMargin,

    // m07 downstream of the persisted decode-kernel deltas: boundary
    // verdict on the 4-dp delta and the per-video running scene index
    "m07_scene_detect" ->
      s"""WITH d AS (SELECT doc_id, frame_idx, n_frames, delta
         |  FROM '${OracleAux.Root}/m07_deltas/*.parquet')
         |SELECT doc_id, frame_idx, n_frames, delta,
         |  delta >= 30.0 AS boundary,
         |  CAST(sum(CASE WHEN delta >= 30.0 THEN 1 ELSE 0 END) OVER
         |    (PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT)
         |    AS scene_idx
         |FROM d
         |ORDER BY doc_id, frame_idx""".stripMargin,

    // m10 = m07's running scene index + the per-(video, scene) span
    // rollup and middle-frame pick, all replayed from the same deltas
    "m10_keyframe_sample" ->
      s"""WITH d AS (SELECT doc_id, frame_idx, n_frames, delta
         |  FROM '${OracleAux.Root}/m07_deltas/*.parquet'),
         |sc AS (SELECT doc_id, frame_idx,
         |    CAST(sum(CASE WHEN delta >= 30.0 THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT)
         |      AS scene_idx
         |  FROM d),
         |g AS (SELECT doc_id, scene_idx,
         |    min(frame_idx) AS first_row, max(frame_idx) AS f_end
         |  FROM sc GROUP BY doc_id, scene_idx),
         |f AS (SELECT doc_id, scene_idx,
         |    CAST(CASE WHEN scene_idx = 0 THEN 0 ELSE first_row END
         |      AS INTEGER) AS f_start,
         |    f_end FROM g)
         |SELECT doc_id, scene_idx, f_start,
         |  CAST(f_end - f_start + 1 AS INTEGER) AS n_scene_frames,
         |  CAST(f_start + (f_end - f_start) // 2 AS BIGINT) AS keyframe_idx
         |FROM f
         |ORDER BY doc_id, scene_idx""".stripMargin,

    // m01 downstream of the persisted decode features: the per-type
    // rollup with Spark's decimal-avg chain replayed in exact HUGEINT
    // arithmetic (sum·10⁴ half-up-divided by n = the decimal(·,13)
    // average, then one double conversion and the 4-dp round)
    "m01_multimodal" ->
      s"""WITH f AS (SELECT media_type, n_bytes,
         |    CAST(s9 * 1000000000 AS HUGEINT) AS s_int
         |  FROM '${OracleAux.Root}/m01_feats/*.parquet'),
         |a AS (SELECT media_type,
         |    CAST(COUNT(*) AS BIGINT) AS n_media,
         |    CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         |    CAST(SUM(s_int) AS HUGEINT) AS s_scaled
         |  FROM f GROUP BY media_type)
         |SELECT media_type, n_media, total_bytes,
         |  round(CAST((2*s_scaled*10000 + n_media) // (2*n_media)
         |    AS DOUBLE) / 1e13, 4) AS avg_feat0
         |FROM a ORDER BY media_type""".stripMargin,

    // m02: the stride-1 superset side-table proves the sampler picked
    // exactly the even frames and re-derives feat0 from the raw grid
    "m02_frame_sample" ->
      s"""SELECT doc_id, frame_idx, n_frames,
         |  round(CAST(resized[1] AS DOUBLE), 4) AS feat0
         |FROM '${OracleAux.Root}/m02_frames/*.parquet'
         |WHERE frame_idx % 2 = 0
         |ORDER BY doc_id, frame_idx""".stripMargin,

    // m03 downstream of the persisted PCM: hop/window arithmetic, the
    // exact-dyadic Σv² (no float-order surface — see m03AuxPcm) and
    // the normalized RMS all replayed in SQL
    "m03_audio_windows" ->
      s"""WITH p AS (SELECT doc_id, samples, len(samples) AS n
         |  FROM '${OracleAux.Root}/m03_pcm/*.parquet'),
         |w AS (SELECT doc_id, n, unnest(range(0, n, 128)) AS start
         |      FROM p WHERE n > 0),
         |e AS (SELECT doc_id, n, start,
         |    CAST(start // 128 AS INTEGER) AS win_idx,
         |    CAST((n + 127) // 128 AS INTEGER) AS n_windows,
         |    least(start + 256, n) AS til FROM w)
         |SELECT e.doc_id, e.win_idx, e.n_windows,
         |  round(sqrt(list_sum(list_transform(
         |    p.samples[e.start+1:e.til],
         |    x -> (x/32768.0)*(x/32768.0))) / (e.til - e.start)), 4)
         |    AS energy
         |FROM e JOIN p ON e.doc_id = p.doc_id
         |ORDER BY e.doc_id, e.win_idx""".stripMargin,

    // c14 downstream of the persisted bucket counts: both smoothed
    // distributions, the log-ratio table (ln via the memo — the one
    // scalar DuckDB's libm can't replay bit-exactly), and the
    // decimal-fixed-point per-doc rollup
    "c14_importance_weights" ->
      s"""WITH f AS (SELECT doc_id, b, n
         |  FROM '${OracleAux.Root}/c14_feats/*.parquet'),
         |lnm AS (SELECT x, lx FROM '${OracleAux.Root}/c14_ln/*.parquet'),
         |tgt AS (SELECT doc_id FROM documents
         |        WHERE source = (SELECT min(source) FROM documents)),
         |rawc AS (SELECT b, CAST(SUM(n) AS BIGINT) AS c_r
         |         FROM f GROUP BY b),
         |tgtc AS (SELECT f.b, CAST(SUM(f.n) AS BIGINT) AS c_t
         |         FROM f JOIN tgt USING (doc_id) GROUP BY f.b),
         |tot AS (SELECT
         |    CAST((SELECT SUM(n) FROM f) AS BIGINT) AS n_raw,
         |    CAST((SELECT SUM(f.n) FROM f JOIN tgt USING (doc_id))
         |      AS BIGINT) AS n_tgt),
         |lr AS (SELECT r.b, lt.lx - lq.lx AS lr
         |       FROM rawc r LEFT JOIN tgtc t ON r.b = t.b CROSS JOIN tot
         |       JOIN lnm lt ON lt.x = CAST(COALESCE(t.c_t, 0) + 1 AS DOUBLE)
         |         / CAST(tot.n_tgt + 65536 AS DOUBLE)
         |       JOIN lnm lq ON lq.x = CAST(r.c_r + 1 AS DOUBLE)
         |         / CAST(tot.n_raw + 65536 AS DOUBLE))
         |SELECT f.doc_id, CAST(SUM(f.n) AS BIGINT) AS n_feats,
         |  CAST(CAST(SUM(CAST(round(f.n * lr.lr, 9) AS DECIMAL(28,9)))
         |    AS VARCHAR) AS DOUBLE) AS weight
         |FROM f JOIN lr ON f.b = lr.b
         |GROUP BY f.doc_id
         |ORDER BY f.doc_id""".stripMargin,

    // c16: corpus-wide scoring replayed against the persisted frozen
    // model — margins in decimal fixed-point, sigmoid, keep verdicts
    "c16_quality_classifier" ->
      s"""WITH f AS (SELECT doc_id, b, n
         |  FROM '${OracleAux.Root}/c14_feats/*.parquet'),
         |m AS (SELECT b, w FROM '${OracleAux.Root}/c16_model/*.parquet'
         |      WHERE b <> -1),
         |bias AS (SELECT w AS bw
         |         FROM '${OracleAux.Root}/c16_model/*.parquet'
         |         WHERE b = -1),
         |lab AS (SELECT doc_id,
         |    CAST(source = (SELECT min(source) FROM documents)
         |      AS INTEGER) AS label
         |  FROM documents),
         |marg AS (SELECT f.doc_id,
         |    CAST(CAST(SUM(CAST(round(f.n * m.w, 9) AS DECIMAL(28,9)))
         |      AS VARCHAR) AS DOUBLE) AS margin
         |  FROM f JOIN m USING (b) GROUP BY f.doc_id),
         |nf AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_feats
         |       FROM f GROUP BY doc_id),
         |s AS (SELECT l.doc_id, l.label,
         |    COALESCE(nf.n_feats, 0) AS n_feats,
         |    round(1.0 / (1.0 + em.ex), 6) AS prob
         |  FROM lab l LEFT JOIN marg ON l.doc_id = marg.doc_id
         |             LEFT JOIN nf ON l.doc_id = nf.doc_id
         |             CROSS JOIN bias
         |             JOIN '${OracleAux.Root}/c16_exp/*.parquet' em
         |               ON em.x = -(COALESCE(marg.margin, 0.0) + bias.bw))
         |SELECT doc_id, label, n_feats, prob, prob >= 0.5 AS keep
         |FROM s ORDER BY doc_id""".stripMargin,

    // t15: the WHOLE stupid-backoff LM rebuilt in SQL — reference
    // bigram tables, three-case backoff, decimal rollup — with only
    // the scalar ln looked up from the memo side-table
    "t15_lm_score" ->
      s"""WITH rtoks AS (SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents
         |  WHERE source = (SELECT min(source) FROM documents)),
         |rbg0 AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i
         |         FROM rtoks WHERE len(w) >= 2),
         |rbg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM rbg0),
         |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM rbg GROUP BY 1, 2),
         |prefix AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
         |           FROM big GROUP BY 1),
         |uni AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2
         |        FROM rbg GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM rbg),
         |atoks AS (SELECT doc_id, string_split(text, ' ') AS w
         |          FROM documents),
         |abg0 AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i
         |         FROM atoks WHERE len(w) >= 2),
         |abg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM abg0),
         |p AS (SELECT a.doc_id,
         |    CASE WHEN b.c12 IS NOT NULL
         |           THEN CAST(b.c12 AS DOUBLE) / CAST(pf.c1 AS DOUBLE)
         |         WHEN u.c2 IS NOT NULL
         |           THEN 0.4 * (CAST(u.c2 AS DOUBLE) / tot.T)
         |         ELSE 0.4 * (1.0 / tot.T) END AS pv
         |  FROM abg a LEFT JOIN big b ON a.w1 = b.w1 AND a.w2 = b.w2
         |             LEFT JOIN prefix pf ON a.w1 = pf.w1
         |             LEFT JOIN uni u ON a.w2 = u.w2
         |             CROSS JOIN tot),
         |s AS (SELECT p.doc_id,
         |    CAST(round(l.lx, 9) AS DECIMAL(28,9)) AS term
         |  FROM p JOIN '${OracleAux.Root}/t15_ln/*.parquet' l
         |    ON l.x = p.pv)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE) / count(*)
         |    AS mean_lp
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // c28: the full t15 LM replay (same CTEs, same ln-memo — c28's
    // scores are the t15 kernel verbatim), then the CCNet recipe on
    // top: hash-sample gate from the c05 aux (pmod(xxhash64, 2^20) is
    // divisible-compatible with mod 4), per-lang ntile(3) cutoffs on
    // the sample, per-row >= assignment, the unscored/unsampled rows.
    "c28_ccnet_buckets" ->
      s"""WITH rtoks AS (SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents
         |  WHERE source = (SELECT min(source) FROM documents)),
         |rbg0 AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i
         |         FROM rtoks WHERE len(w) >= 2),
         |rbg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM rbg0),
         |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM rbg GROUP BY 1, 2),
         |prefix AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
         |           FROM big GROUP BY 1),
         |uni AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2
         |        FROM rbg GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM rbg),
         |atoks AS (SELECT doc_id, string_split(text, ' ') AS w
         |          FROM documents),
         |abg0 AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i
         |         FROM atoks WHERE len(w) >= 2),
         |abg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM abg0),
         |p AS (SELECT a.doc_id,
         |    CASE WHEN b.c12 IS NOT NULL
         |           THEN CAST(b.c12 AS DOUBLE) / CAST(pf.c1 AS DOUBLE)
         |         WHEN u.c2 IS NOT NULL
         |           THEN 0.4 * (CAST(u.c2 AS DOUBLE) / tot.T)
         |         ELSE 0.4 * (1.0 / tot.T) END AS pv
         |  FROM abg a LEFT JOIN big b ON a.w1 = b.w1 AND a.w2 = b.w2
         |             LEFT JOIN prefix pf ON a.w1 = pf.w1
         |             LEFT JOIN uni u ON a.w2 = u.w2
         |             CROSS JOIN tot),
         |s AS (SELECT p.doc_id,
         |    CAST(round(l.lx, 9) AS DECIMAL(28,9)) AS term
         |  FROM p JOIN '${OracleAux.Root}/t15_ln/*.parquet' l
         |    ON l.x = p.pv),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE) / count(*)
         |      AS mean_lp
         |  FROM s GROUP BY doc_id),
         |h AS (SELECT doc_id, h
         |      FROM '${OracleAux.Root}/c05_hash/*.parquet'),
         |smp AS (SELECT d.lang, sc.doc_id, sc.mean_lp,
         |    ntile(3) OVER (PARTITION BY d.lang
         |      ORDER BY sc.mean_lp DESC, sc.doc_id) AS tile
         |  FROM sc JOIN documents d USING (doc_id)
         |          JOIN h ON h.doc_id = sc.doc_id
         |  WHERE h.h % 4 = 0),
         |b AS (SELECT lang,
         |    min(CASE WHEN tile = 1 THEN mean_lp END) AS b1,
         |    min(CASE WHEN tile = 2 THEN mean_lp END) AS b2
         |  FROM smp GROUP BY lang)
         |SELECT d.doc_id, d.lang,
         |  CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  sc.mean_lp,
         |  CASE WHEN sc.mean_lp IS NULL THEN 'unscored'
         |       WHEN b.b1 IS NULL THEN 'unsampled'
         |       WHEN sc.mean_lp >= b.b1 THEN 'head'
         |       WHEN sc.mean_lp >= b.b2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM documents d LEFT JOIN sc USING (doc_id)
         |                 LEFT JOIN b ON b.lang = d.lang
         |ORDER BY d.doc_id""".stripMargin,

    // c18 downstream of the persisted quantizer: cell assignment
    // (first-max by dot, the array_position convention), centrality,
    // per-cell prototype quotas — the full operator replayed
    "c18_balanced_sample" ->
      s"""WITH cents AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS cv
         |  FROM '${OracleAux.Root}/c18_cents/*.parquet'),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |      FROM embeddings),
         |asg AS (SELECT vec_id, cell, sc, v FROM (
         |    SELECT e.vec_id, k.cell, e.v,
         |      list_dot_product(e.v, k.cv) AS sc,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, k.cv) DESC, k.cell) AS rn
         |    FROM e CROSS JOIN cents k) t WHERE rn = 1),
         |ctr AS (SELECT vec_id, cell,
         |    sc / sqrt(list_dot_product(v, v)) AS centrality FROM asg),
         |rk AS (SELECT cell, vec_id, centrality,
         |    CAST(row_number() OVER (PARTITION BY cell
         |      ORDER BY centrality DESC, vec_id) AS INTEGER) AS rank
         |  FROM ctr)
         |SELECT cell, rank, vec_id, round(centrality, 4) AS centrality
         |FROM rk WHERE rank <= 8
         |ORDER BY cell, rank""".stripMargin,

    // c05: the c02 plan rates at the c05 token budget, the stratified
    // hash gate (hash from the side-table — the one xxhash64 input),
    // and the per-doc token count, all replayed; the seeded output
    // shuffle is order-only and the sorted-row compare absorbs it
    "c05_mixture_build" ->
      s"""WITH per AS (SELECT source,
         |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
         |      AS BIGINT) AS tot_tokens
         |  FROM documents GROUP BY source),
         |r AS (SELECT source, round(least(1.0,
         |    (12000.0 / (SELECT COUNT(*) FROM per)) / tot_tokens), 6)
         |    AS rate FROM per),
         |h AS (SELECT doc_id, h
         |      FROM '${OracleAux.Root}/c05_hash/*.parquet')
         |SELECT d.doc_id, d.source,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
         |FROM documents d
         |JOIN h ON d.doc_id = h.doc_id
         |JOIN r ON d.source = r.source
         |WHERE h.h < CAST(trunc(r.rate * 1048576) AS BIGINT)
         |ORDER BY d.doc_id""".stripMargin,

    // s15: the full MMR greedy loop as a recursive CTE — the working
    // set re-emits the selected prefix each round and adds the
    // argmax, with divMax floored at 0.0 (mmrSelect's init) and λ
    // arithmetic forced to DOUBLE (DuckDB parses 0.7 as DECIMAL, and
    // decimal-folded 1.0−0.7 is a DIFFERENT double than Java's).
    // Entirely self-contained: no side-table, kernel cosines included
    "s15_mmr_rerank" ->
      """WITH RECURSIVE
        |lam AS (SELECT CAST(0.7 AS DOUBLE) AS l,
        |               CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE) AS ml),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id = 0),
        |c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    round(list_dot_product(CAST(embedding AS DOUBLE[]), q.qv) /
        |      (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                             CAST(embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos_sim
        |  FROM embeddings, q WHERE vec_id <> 0),
        |cand AS (SELECT vec_id, v, cos_sim FROM (
        |    SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id)
        |      AS rn
        |    FROM c0 WHERE NOT isnan(cos_sim)) t WHERE rn <= 50),
        |walk(it, rank, vec_id, cos_sim, mmr_score) AS (
        |  SELECT 1, CAST(1 AS BIGINT), vec_id, cos_sim,
        |         lam.l*cos_sim - lam.ml*0.0
        |  FROM (SELECT vec_id, cos_sim, row_number() OVER (
        |          ORDER BY lam0.l*cos_sim - lam0.ml*0.0 DESC, vec_id)
        |          AS rn
        |        FROM cand, lam lam0) t, lam WHERE rn = 1
        |  UNION ALL
        |  SELECT u.* FROM (
        |    SELECT w.it + 1 AS it, w.rank, w.vec_id, w.cos_sim,
        |           w.mmr_score
        |    FROM walk w
        |    UNION ALL
        |    SELECT (SELECT max(it) FROM walk) + 1,
        |           CAST((SELECT count(*) FROM walk) + 1 AS BIGINT),
        |           s.vec_id, s.cos_sim, s.score
        |    FROM (
        |      SELECT d.vec_id, d.cos_sim,
        |        lam.l*d.cos_sim - lam.ml*d.dv AS score,
        |        row_number() OVER (
        |          ORDER BY lam.l*d.cos_sim - lam.ml*d.dv DESC, d.vec_id)
        |          AS rn
        |      FROM (
        |        SELECT c2.vec_id, c2.cos_sim,
        |          greatest(0.0, max(round(list_dot_product(c2.v, cv.v) /
        |            (sqrt(list_dot_product(c2.v, c2.v)) *
        |             sqrt(list_dot_product(cv.v, cv.v))), 4))) AS dv
        |        FROM cand c2
        |        JOIN cand cv ON cv.vec_id IN (SELECT vec_id FROM walk)
        |        WHERE c2.vec_id NOT IN (SELECT vec_id FROM walk)
        |        GROUP BY c2.vec_id, c2.cos_sim) d, lam) s
        |    WHERE s.rn = 1) u
        |  WHERE (SELECT max(it) FROM walk) < 10
        |)
        |SELECT rank, vec_id, cos_sim, mmr_score FROM walk
        |WHERE it = (SELECT max(it) FROM walk)
        |ORDER BY rank""".stripMargin,

    "s10_ann_pq" ->
      pqAdcSql("adcf AS (SELECT * FROM adc),", "adcf"),

    // s11 = s10's ADC pipeline gated to the query's nprobe=4 IVF
    // cells (quantizer shared with s04's side-table; first-max cell
    // assignment and probe pick replayed as in the s06 oracle)
    "s11_ann_ivf_pq" ->
      pqAdcSql(
        s"""cells AS (SELECT cell, CAST(centroid AS DOUBLE[]) AS cv
           |  FROM '${OracleAux.Root}/s04_cents/*.parquet'),
           |probe AS (SELECT cell FROM (
           |    SELECT k.cell, row_number() OVER (
           |      ORDER BY list_dot_product(q.qv, k.cv) DESC, k.cell)
           |      AS rn
           |    FROM cells k, q) t WHERE rn <= 4),
           |asg AS (SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, k.cell, row_number() OVER (
           |      PARTITION BY e.vec_id
           |      ORDER BY list_dot_product(e.v, k.cv) DESC, k.cell)
           |      AS rn
           |    FROM e CROSS JOIN cells k) t WHERE rn = 1),
           |adcf AS (SELECT adc.* FROM adc
           |  JOIN asg ON adc.vec_id = asg.vec_id
           |  WHERE asg.cell IN (SELECT cell FROM probe)),""".stripMargin,
        "adcf"),

    // c01: the full four-stage cleaning composition — quality gate,
    // exact dedup (min doc_id per identical text), d02-style MinHash
    // banding + string-shingle Jaccard near-dup removal over the
    // persisted survivor signatures, and the t03 marker argmax
    "c01_clean_corpus" ->
      s"""WITH g AS (
         |  SELECT doc_id, text, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) >= 8
         |    AND CAST(len(list_filter(string_split(text, ' '),
         |          w -> w IN ('the', 'a'))) AS DOUBLE)
         |        / len(string_split(text, ' ')) <= 0.9),
         |x AS (SELECT g.* FROM g
         |  JOIN (SELECT min(doc_id) AS keep FROM g GROUP BY text) k
         |    ON g.doc_id = k.keep),
         |sigs AS (SELECT doc_id, sig
         |  FROM '${OracleAux.Root}/c01_sigs/*.parquet'),
         |bnd AS (SELECT doc_id, j AS band, sig[j*4+1:j*4+4] AS bs
         |        FROM sigs, generate_series(0,15) g2(j)),
         |cand AS (SELECT DISTINCT b1.doc_id AS doc_a, b2.doc_id AS doc_b
         |         FROM bnd b1 JOIN bnd b2 ON b1.band = b2.band
         |           AND b1.bs = b2.bs AND b1.doc_id < b2.doc_id),
         |sh AS (SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(w)-5+2),
         |           i -> array_to_string(w[i:i+4], ' '))) AS s
         |       FROM (SELECT doc_id, string_split(text, ' ') AS w
         |             FROM x) t
         |       WHERE len(w) >= 5),
         |losers AS (SELECT DISTINCT doc_b AS doc_id FROM (
         |    SELECT doc_a, doc_b,
         |      round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |            len(list_distinct(list_concat(a.s, b.s))), 4) AS jac
         |    FROM cand JOIN sh a ON doc_a = a.doc_id
         |              JOIN sh b ON doc_b = b.doc_id) t
         |  WHERE jac >= 0.7),
         |kept AS (SELECT x.* FROM x LEFT JOIN losers l
         |         ON x.doc_id = l.doc_id WHERE l.doc_id IS NULL),
         |s AS (SELECT doc_id, lang, source, n_tokens,
         |    len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS s_de,
         |    len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ('the','and','of','to','is','with','that'))) AS s_en,
         |    len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ('el','la','los','las','que','es','una'))) AS s_es,
         |    len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ('le','la','les','est','une','dans','pas'))) AS s_fr,
         |    len(list_filter(string_split(lower(text), ' '),
         |      t -> t IN ('的','是','不','在','了','我','有'))) AS s_zh
         |  FROM kept)
         |SELECT doc_id, lang, source, n_tokens,
         |  CASE
         |    WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
         |    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
         |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
         |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
         |    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
         |    ELSE 'zh'
         |  END AS pred_lang
         |FROM s
         |ORDER BY doc_id""".stripMargin,

    // t04: the rolling-hash kernel recomputed INDEPENDENTLY in SQL —
    // UTF-8 bytes rebuilt arithmetically from code points, then the
    // h = h·257 + byte fold in HUGEINT mod 2⁶⁴, mapped back to the
    // signed 64-bit value. A true differential check of e04.
    "t04_fingerprint" ->
      """WITH cp AS (SELECT doc_id,
        |    flatten(list_transform(
        |      list_transform(range(1, length(text)+1),
        |        i -> unicode(text[i])),
        |      c -> CASE WHEN c < 128 THEN [c]
        |                WHEN c < 2048 THEN [192 + c // 64, 128 + c % 64]
        |                WHEN c < 65536 THEN [224 + c // 4096,
        |                      128 + (c // 64) % 64, 128 + c % 64]
        |                ELSE [240 + c // 262144, 128 + (c // 4096) % 64,
        |                      128 + (c // 64) % 64, 128 + c % 64]
        |           END)) AS bytes
        |  FROM documents),
        |fp AS (SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(bytes, b -> CAST(b AS HUGEINT))),
        |      (a, b) -> (a * 257 + b)
        |        % CAST(18446744073709551616 AS HUGEINT)) AS u
        |  FROM cp)
        |SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST(9223372036854775808 AS HUGEINT)
        |            THEN u - CAST(18446744073709551616 AS HUGEINT)
        |            ELSE u END AS BIGINT) AS fp64
        |FROM fp ORDER BY doc_id""".stripMargin,

    // t11: the WHOLE BPE training loop as a recursive CTE — capped
    // word table, per-rank pair counts, (cnt desc, l, r) argmax, and
    // the leftmost-greedy merge via run-parity (within a run of
    // overlapping matches, every even offset merges — applyMerge's
    // scan semantics). Self-contained: no side-table, no kernel.
    "t11_bpe_train" ->
      """WITH RECURSIVE
        |wt AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w
        |    FROM documents) t
        |  WHERE length(w) > 0 GROUP BY w
        |  ORDER BY freq DESC, w LIMIT 50000),
        |walk(it, w, freq, syms, mrank, ml, mr, mcnt) AS (
        |  SELECT 0, w, freq,
        |    list_transform(range(1, length(w)+1), i -> w[i]),
        |    CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
        |  FROM wt
        |  UNION ALL
        |  SELECT u.* FROM (
        |    WITH best AS (
        |      SELECT l, r, cnt FROM (
        |        SELECT syms[p] AS l, syms[p+1] AS r,
        |          CAST(SUM(freq) AS BIGINT) AS cnt
        |        FROM (SELECT w, freq, syms,
        |                unnest(range(1, len(syms))) AS p
        |              FROM walk WHERE w IS NOT NULL) t
        |        GROUP BY 1, 2) c
        |      WHERE cnt >= 2
        |        AND (SELECT count(*) FROM walk WHERE w IS NULL) < 24
        |      ORDER BY cnt DESC, l, r LIMIT 1),
        |    pos AS (SELECT w, freq, syms, len(syms) AS n,
        |              unnest(range(1, len(syms)+1)) AS p
        |            FROM walk WHERE w IS NOT NULL),
        |    mp AS (SELECT s.w, s.p,
        |             (s.p - CAST(row_number() OVER (PARTITION BY s.w
        |                ORDER BY s.p) AS BIGINT)) AS rid
        |           FROM pos s, best b
        |           WHERE s.p < s.n AND s.syms[s.p] = b.l
        |             AND s.syms[s.p+1] = b.r),
        |    st AS (SELECT w, p,
        |             (p - min(p) OVER (PARTITION BY w, rid)) % 2 = 0
        |               AS is_start
        |           FROM mp),
        |    starts AS (SELECT w, p FROM st WHERE is_start),
        |    emit AS (
        |      SELECT s.w, s.p AS ord, b.l || b.r AS tok
        |      FROM starts s, best b
        |      UNION ALL
        |      SELECT s.w, s.p, s.syms[s.p] FROM pos s
        |      WHERE NOT EXISTS (SELECT 1 FROM starts m
        |        WHERE m.w = s.w AND (m.p = s.p OR m.p = s.p - 1))),
        |    newseg AS (SELECT e.w, list(e.tok ORDER BY e.ord) AS syms
        |               FROM emit e GROUP BY e.w)
        |    SELECT it + 1, x.w, x.freq, ns.syms,
        |           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
        |    FROM walk x JOIN newseg ns ON x.w = ns.w
        |    CROSS JOIN (SELECT 1 FROM best) g
        |    WHERE x.w IS NOT NULL
        |    UNION ALL
        |    SELECT it + 1, NULL, NULL, NULL, x.mrank, x.ml, x.mr, x.mcnt
        |    FROM walk x CROSS JOIN (SELECT 1 FROM best) g
        |    WHERE x.w IS NULL
        |    UNION ALL
        |    SELECT (SELECT max(it) FROM walk) + 1, NULL, NULL, NULL,
        |           (SELECT count(*) FROM walk WHERE w IS NULL),
        |           b.l, b.r, b.cnt
        |    FROM best b
        |  ) u
        |)
        |SELECT mrank AS rank, ml AS "left", mr AS "right",
        |  ml || mr AS merged, mcnt AS cnt
        |FROM walk WHERE w IS NULL AND it = (SELECT max(it) FROM walk)
        |ORDER BY rank""".stripMargin
  )

  /** g13: rebuild BOTH discovery plants byte-for-byte — the robots
    * bodies with their two Sitemap announcements and the
    * `<sitemapindex>` XML — then replay directive extraction (line
    * split, comment strip, case-insensitive field, trim, scope flag)
    * and index-block extraction (lazy (?s) blocks, optional lastmod,
    * scope flag) entirely in SQL, union the channels.
    */
  private val g13Sql: String =
    s"""WITH $hostsCte,
       |g13rb AS (SELECT 'site' || s || '.example.com' AS host,
       |    'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10) ||
       |    'Sitemap: https://site' || s ||
       |      '.example.com/sitemap_index.xml' || chr(10) ||
       |    'sitemap: https://cdn.example.net/shared/' || s ||
       |      '.xml # mirrored copy' AS body
       |  FROM hosts),
       |g13l0 AS (SELECT host, string_split(body, chr(10)) AS ln FROM g13rb),
       |g13l1 AS (SELECT host, ln,
       |    unnest(generate_series(1, len(ln))) AS i FROM g13l0),
       |g13ln AS (SELECT host, i - 1 AS pos,
       |    trim(regexp_replace(ln[CAST(i AS INTEGER)], '#.*', '')) AS line
       |  FROM g13l1),
       |g13r AS (SELECT host, 'robots' AS source, CAST(pos AS BIGINT) AS ord,
       |    trim(regexp_extract(line, '(?i)^sitemap\\s*:\\s*(.*)$$', 1)) AS loc,
       |    '' AS lastmod
       |  FROM g13ln WHERE regexp_matches(line, '(?i)^sitemap\\s*:')),
       |g13ix AS (SELECT 'site' || s || '.example.com' AS host,
       |    '<?xml version="1.0"?>' || chr(10) || '<sitemapindex>' || chr(10) ||
       |    '  <sitemap>' || chr(10) || '    <loc>https://site' || s ||
       |      '.example.com/sm/0.xml</loc>' || chr(10) ||
       |    '    <lastmod>2026-02-' ||
       |      lpad(CAST((s * 3 + 0) % 28 + 1 AS VARCHAR), 2, '0') ||
       |      '</lastmod>' || chr(10) || '  </sitemap>' || chr(10) ||
       |    '  <sitemap>' || chr(10) || '    <loc>https://site' || s ||
       |      '.example.com/sm/1.xml</loc>' || chr(10) ||
       |    '    <lastmod>2026-02-' ||
       |      lpad(CAST((s * 3 + 1) % 28 + 1 AS VARCHAR), 2, '0') ||
       |      '</lastmod>' || chr(10) || '  </sitemap>' || chr(10) ||
       |    '  <sitemap>' || chr(10) || '    <loc>https://site' || s ||
       |      '.example.com/sm/2.xml</loc>' || chr(10) ||
       |    '    <lastmod>2026-02-' ||
       |      lpad(CAST((s * 3 + 2) % 28 + 1 AS VARCHAR), 2, '0') ||
       |      '</lastmod>' || chr(10) || '  </sitemap>' || chr(10) ||
       |    '  <sitemap>' || chr(10) || '    <loc>https://site' || s ||
       |      '.example.com/sm/3.xml</loc>' || chr(10) ||
       |      '  </sitemap>' || chr(10) ||
       |    '  <sitemap>' || chr(10) || '    <loc>https://site' ||
       |      ((s + 1) % 50) || '.example.com/sm/4.xml</loc>' || chr(10) ||
       |      '  </sitemap>' || chr(10) ||
       |    '</sitemapindex>' || chr(10) AS xml
       |  FROM hosts),
       |g13b0 AS (SELECT host,
       |    regexp_extract_all(xml, '(?s)<sitemap>(.*?)</sitemap>', 1) AS bl
       |  FROM g13ix),
       |g13b1 AS (SELECT host, bl,
       |    unnest(generate_series(1, len(bl))) AS i FROM g13b0),
       |g13i AS (SELECT host, 'index' AS source, CAST(i - 1 AS BIGINT) AS ord,
       |    regexp_extract(bl[CAST(i AS INTEGER)], '<loc>([^<]*)</loc>', 1)
       |      AS loc,
       |    regexp_extract(bl[CAST(i AS INTEGER)],
       |      '<lastmod>([^<]*)</lastmod>', 1) AS lastmod
       |  FROM g13b1),
       |g13u AS (SELECT * FROM g13r UNION ALL SELECT * FROM g13i)
       |SELECT host, source, ord, loc, lastmod,
       |  CAST(lower(regexp_extract(loc,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) = lower(host)
       |    AS BIGINT) AS in_scope
       |FROM g13u
       |ORDER BY host, source, ord""".stripMargin

  /** The g12 probe queries are INDEX-equals-INLINE contracts: each
    * must reproduce its inline twin row-for-row (the persisted rank
    * table is byte-identical to what the twin computes in-plan), so
    * the oracle SQL IS the twin's — any divergence between the staged
    * publish, the pinned read schema, and the live rank recurrence
    * hash-mismatches here.
    */
  /** g14: rebuild the Crawl-delay plant byte-for-byte, then replay
    * the full `*`-group scoping (line split, comment strip, UA-run
    * detection — the g06 rule machinery with disjoint CTE names) and
    * the tolerant value parse (TRY_CAST, non-positive dropped, max of
    * the valid in-scope values; hosts with none produce no row).
    */
  private val g14Sql: String =
    s"""WITH $hostsCte,
       |g14rb AS (SELECT 'site' || s || '.example.com' AS host,
       |    'User-agent: googlebot' || chr(10) || 'User-agent: *' || chr(10) ||
       |    'Crawl-delay: ' || (s % 6) || chr(10) ||
       |    CASE WHEN s % 5 = 0 THEN 'crawl-delay: ' || (s % 7) ||
       |      '.5 # mirrored' || chr(10) ELSE '' END ||
       |    CASE WHEN s % 4 = 1 THEN 'Crawl-delay: fast' || chr(10)
       |      ELSE '' END ||
       |    'Disallow: /x' || chr(10) || chr(10) ||
       |    'User-agent: strictbot' || chr(10) || 'Crawl-delay: 9' || chr(10)
       |      AS body
       |  FROM hosts),
       |g14l0 AS (SELECT host, string_split(body, chr(10)) AS ln FROM g14rb),
       |g14l1 AS (SELECT host, ln,
       |    unnest(generate_series(1, len(ln))) AS i FROM g14l0),
       |g14ln AS (SELECT host, i - 1 AS pos,
       |    trim(regexp_replace(ln[CAST(i AS INTEGER)], '#.*', '')) AS line
       |  FROM g14l1),
       |g14f AS (SELECT host, pos, line,
       |    regexp_matches(line, '(?i)^user-agent\\s*:') AS is_ua
       |  FROM g14ln WHERE line <> ''),
       |g14f1 AS (SELECT host, pos, line, is_ua,
       |    COALESCE(lag(is_ua) OVER (PARTITION BY host ORDER BY pos), FALSE)
       |      AS prev_ua
       |  FROM g14f),
       |g14f2 AS (SELECT *, SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1
       |    ELSE 0 END)
       |    OVER (PARTITION BY host ORDER BY pos ROWS UNBOUNDED PRECEDING)
       |      AS run_id
       |  FROM g14f1),
       |g14star AS (SELECT DISTINCT host, run_id FROM g14f2
       |  WHERE is_ua AND
       |    trim(regexp_extract(line, '(?i)^user-agent\\s*:\\s*(.*)$$', 1))
       |      = '*'),
       |g14v AS (SELECT f.host,
       |    TRY_CAST(trim(regexp_extract(f.line,
       |      '(?i)^crawl-delay\\s*:\\s*(.*)$$', 1)) AS DOUBLE) AS delay
       |  FROM g14f2 f JOIN g14star st
       |    ON st.host = f.host AND st.run_id = f.run_id
       |  WHERE regexp_matches(f.line, '(?i)^crawl-delay\\s*:'))
       |SELECT host, max(delay) AS crawl_delay
       |FROM g14v WHERE delay IS NOT NULL AND delay > 0
       |GROUP BY host
       |ORDER BY host""".stripMargin

  val sql: Map[String, String] = sqlBase ++ Map(
    "g12_frontier_probe" -> sqlBase("g07_frontier_plan"),
    "g12_discovered_probe" -> sqlBase("g09_discovered_plan"),
    "g12_recrawl_probe" -> sqlBase("g10_recrawl_plan"),
    "g13_sitemap_discovery" -> g13Sql,
    "g14_crawl_delay" -> g14Sql)
}
