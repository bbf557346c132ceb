package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the corpus link graph (SURVEY.md §2.G).
  *
  * Training-data pipelines rank crawl HOSTS by link authority before
  * spending fetch/compute budget on them (Common Crawl publishes
  * host-level ranks; CCNet/RefinedWeb-style curation consumes them as
  * a quality prior). The two classic iterative rankings are
  * implemented here Spark-first:
  *
  *   - g01 PageRank (damped random surfer, d=0.85)
  *   - g02 HITS (hubs/authorities mutual recursion, L1-normalized)
  *
  * Both run in EXACT 64-bit integer fixed-point (rank mass in units
  * of 1e-9): every per-iteration contribution is an integral
  * `(rank * w) div outw`, and integer sums are associative and
  * commutative, so the result is bit-identical regardless of
  * partitioning, task order, or reduction tree — the same
  * partition-order-independence discipline the monetary DECIMAL
  * aggregates use ([[graft.functions.Num]]), applied to iterative
  * graph state. A float PageRank would drift across shuffles; this
  * one hash-matches a serial replay (and the DuckDB oracle unrolls
  * the identical integer recurrence).
  *
  * Scale shape (the 100 TB posture): state per iteration is one row
  * per NODE (hosts: millions, not the trillions of raw pages), edges
  * are grouped/weighted once up front (one shuffle) and checkpointed;
  * each iteration is then ONE hash join ranks⋈edges on src (a few MB
  * of rank state at host granularity — AQE broadcasts it; at
  * larger-than-memory node counts the same plan degrades gracefully
  * to a shuffle join co-partitioned with the frozen edge layout) plus
  * ONE aggregation on dst. Lineage is cut with localCheckpoint every
  * few rounds — the q55 doubling-loop discipline
  * (Relational.scala q55TreeFlatten).
  *
  * The graph is EXTRACTED, not planted as numbers: g03 parses each
  * document's markup — the doc's own canonical-URL host becomes the
  * source node, every `<a href>` target host a destination — so the
  * §G axis consumes actual corpus content end to end (relative links
  * and self-links drop; doc-level multi-links collapse into integer
  * edge weights). The synthetic corpus carries no markup, so the demo
  * plants it deterministically (the t17/d14 discipline): a canonical
  * link on the doc's d15 domain (Dedup.scala d15DemoUrls) plus three
  * anchors whose target hosts are fixed affine functions of (domain,
  * link slot, doc variant), plus a relative-link decoy. Plant and
  * extraction are both regex/string-expressible, so the oracle
  * rebuilds the identical host graph from the documents table alone.
  */
object Graph {

  /** Rank mass carried in units of 1e-9 (BIGINT end to end). */
  val Scale = 1000000000L

  /** The markup plant: each doc becomes an html page carrying its OWN
    * canonical URL (`site{(doc_id div 5) % 50}.example.com` — the d15
    * domain) and three outbound anchors whose target hosts follow the
    * affine formula `(src*7 + k*13 + v*11) % 50` with v = doc_id % 5,
    * plus one relative-href decoy the extractor must drop. Docs with
    * v = 0 additionally link `mirror.example.net` — a host that is
    * never a canonical SOURCE, so the extracted graph always carries
    * one genuine DANGLING node (linked-to-but-never-crawled hosts are
    * the norm on real crawl graphs; the demo must exercise g01's
    * redistribution term at every SF). Narrow per-row projection — no
    * shuffle.
    */
  private[operators] def demoLinkedDocs(docs: DataFrame): DataFrame = {
    def anchor(k: Int) = concat(
      lit("<a href=\"https://site"),
      expr(s"(((doc_id div 5) % 50) * 7 + $k * 13 + (doc_id % 5) * 11) % 50"),
      lit(".example.com/p/"), col("doc_id"), lit(s"\">r$k</a> "))
    val sinkAnchor = when(col("doc_id") % 5 === 0,
      concat(lit("<a href=\"https://mirror.example.net/snap/"),
        col("doc_id"), lit("\">m</a> "))).otherwise(lit(""))
    docs.select(col("doc_id"),
      concat(
        lit("<html><head><link rel=\"canonical\" href=\"https://site"),
        expr("(doc_id div 5) % 50"), lit(".example.com/docs/"),
        expr("doc_id div 5"), lit("\"/></head><body><p>"), col("text"),
        lit("</p>"), anchor(1), anchor(2), anchor(3), sinkAnchor,
        lit("<a href=\"/local/nav\">nav</a></body></html>")).as("html"))
  }

  /** g03 kernel over any (doc_id, html) frame: the weighted host link
    * graph (src_host, dst_host, w). Source host comes from the page's
    * `rel="canonical"` link, destinations from every `<a href>`; an
    * href with no `scheme://` (relative links) yields no host and
    * drops, as do self-links. One groupBy shuffle on slim string
    * pairs; the parse is per-row codegen'd regex — pages never
    * shuffle.
    */
  def linkExtractOver(docs: DataFrame): DataFrame = {
    def host(u: org.apache.spark.sql.Column) =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    docs
      .select(
        host(regexp_extract(col("html"),
          "rel=\"canonical\" href=\"([^\"]*)\"", 1)).as("src_host"),
        explode(regexp_extract_all(col("html"),
          lit("<a href=\"([^\"]*)\""), lit(1))).as("href"))
      .select(col("src_host"), host(col("href")).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("dst_host") =!= col("src_host"))
      .groupBy("src_host", "dst_host").agg(count(lit(1)).as("w"))
  }

  /** g03: href link extraction — the crawl-graph builder that feeds
    * g01/g02 (Common Crawl's host-level web graph is built exactly
    * this way: page markup → href targets → host-granular weighted
    * edges).
    */
  def g03LinkExtract(spark: SparkSession, dir: String): DataFrame =
    linkExtractOver(demoLinkedDocs(Tables(spark, dir).documents))
      .orderBy("src_host", "dst_host")

  /** The extracted edge frame g01/g02 iterate over, as (src, dst, w). */
  private[operators] def linkEdges(spark: SparkSession, dir: String): DataFrame =
    linkExtractOver(demoLinkedDocs(Tables(spark, dir).documents))
      .select(col("src_host").as("src"), col("dst_host").as("dst"), col("w"))

  /** g04: MUTUAL-backbone communities over the extracted host graph —
    * keep an edge only when dst is among src's `k` strongest
    * out-links AND src is among dst's `k` strongest in-links (weight
    * desc, host asc ties), then transitive communities via the shared
    * d07 large-star/small-star contraction
    * ([[graft.operators.Dedup.connectedComponentsStar]] — its
    * greatest/least/min machinery is key-type agnostic, so string
    * hosts ride unchanged, bytewise). The mutual rule is the
    * mutual-nearest-neighbor sparsifier: one-sided strongest links
    * chain everything into a giant component (measured: this demo
    * graph is ONE component even at k = 1 one-sided), while
    * RECIPROCATED strength isolates genuinely tight neighborhoods.
    * The backbone is SF-invariant by construction — the plant's
    * (slot, variant) structure fixes link-weight RATIOS, corpus
    * growth only scales magnitudes. This is how a crawl-curation
    * pipeline turns raw link counts into domain neighborhoods for
    * mixture/quota policy (c22/st23 operate per-domain; communities
    * lift that to per-neighborhood).
    *
    * Scale: two windows (one shuffle each, on src / on dst) over the
    * already-aggregated edge list (hosts, not pages) + a semi-join;
    * contraction is O(log n) rounds of join+agg on ≤ k·|hosts|
    * canonical edges. Hosts with no reciprocated strong link are
    * singleton communities of themselves.
    *
    * Output: (host, cluster_id = min member host, cluster_size).
    */
  def g04HostCommunities(spark: SparkSession, dir: String,
      k: Int = 2): DataFrame = {
    val edges = linkEdges(spark, dir).localCheckpoint(false)
    val wndOut = Window.partitionBy("src").orderBy(col("w").desc, col("dst"))
    val wndIn = Window.partitionBy("dst").orderBy(col("w").desc, col("src"))
    val topOut = edges.withColumn("rk", row_number().over(wndOut))
      .filter(col("rk") <= k).select(col("src"), col("dst"))
    val topIn = edges.withColumn("rk", row_number().over(wndIn))
      .filter(col("rk") <= k).select(col("src"), col("dst"))
    val backbone = topOut.join(topIn, Seq("src", "dst"), "left_semi")
    val labels = graft.operators.Dedup.connectedComponentsStar(backbone)
      .select(col("id").as("host"), col("lab").as("cluster_id"))
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct()
    val lab = nodes.join(labels, Seq("host"), "left")
      .select(col("host"),
        coalesce(col("cluster_id"), col("host")).as("cluster_id"))
    val sizes = lab.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    lab.join(sizes, "cluster_id")
      .select(col("host"), col("cluster_id"), col("cluster_size"))
      .orderBy("host")
  }

  /** g01: damped PageRank, 10 power iterations, integer fixed-point.
    *
    * Recurrence (all BIGINT; div is truncating integral division —
    * operands are non-negative, so it equals the oracle's floor `//`;
    * the one product that can exceed Long — `r(src) * w(e)` on a
    * host pair with > ~9e9 links — lifts to DECIMAL(38,0), and its
    * quotient re-enters BIGINT exactly since c ≤ r(src)):
    *   r0(n)   = Scale div N
    *   c(e)    = (r(src) * w(e)) div outw(src)
    *   dang    = Σ_{m: outw(m)=0} r(m)          (dangling rank mass)
    *   r'(n)   = (15 * (Scale div N)) div 100
    *             + (85 * (Σ_{e into n} c(e) + dang div N)) div 100
    *
    * The 15% teleport keeps rank from pooling; the DANGLING term is
    * the standard redistribution for nodes with no out-links (on a
    * real crawl graph, hosts linked-to but never crawled are the
    * norm): their rank mass is re-spread uniformly each iteration
    * instead of silently leaking. `dang div N` truncates — mass only
    * ever DISCARDS under integer fixed-point, never inflates, so the
    * mass-band law below survives.
    *
    * Output: (node, out_w, rank_e9) — rank in 1e-9 units, highest
    * first. N is obtained with a driver-side count (one aggregate
    * job over the node frame; a bounded scalar, never a collect of
    * data); the per-iteration dangling total rides IN-PLAN as a
    * broadcast 1-row aggregate crossJoined on (the g02 normalizer
    * shape), so iterations stay free of driver-blocking actions.
    */
  def g01PageRank(spark: SparkSession, dir: String, iters: Int = 10): DataFrame =
    pageRankOver(linkEdges(spark, dir), iters)

  /** g01 iterations over ANY weighted (src, dst, w) edge frame —
    * node keys may be numeric or string (hosts); the integer
    * recurrence is key-type agnostic. Dangling nodes (no out-links)
    * are handled by the uniform redistribution term.
    */
  def pageRankOver(edgesIn: DataFrame, iters: Int = 10): DataFrame = {
    val edges = edgesIn.localCheckpoint(false)
    val outw = edges.groupBy("src").agg(sum("w").as("outw"))
    // (Measured and rejected, guide §1: pre-partitioning adj by dst to
    // serve the per-iteration groupBy("dst") — Dataset.localCheckpoint
    // under AQE reports UnknownPartitioning on the checkpointed RDD,
    // so the partitioning is invisible to downstream planning and the
    // repartition is pure setup cost.)
    val adj = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .localCheckpoint(false)
    // nodes carry out-weight AND the dangling flag (outw missing) —
    // both FIXED across iterations (functions of the frozen edge frame
    // alone). The flag rides IN the rank state, so the per-iteration
    // dangling mass is a filter+aggregate over the already-checkpointed
    // ranks instead of a semi-join against a separate dangling frame:
    // one fewer join (and its broadcast-build job) in every iteration
    // (optimization guide §2.4 — remove joins/shuffles outright).
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .join(outw.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), col("outw"), col("outw").isNull.as("dang"))
      .localCheckpoint(false)
    val n = nodes.count()
    require(n > 0, "g01: empty edge frame — no nodes to rank")
    // SIZE-ADAPTIVE join strategy (guide §3.1): rank state is one slim
    // row per node, so when the measured node count provably fits a
    // broadcast, hint it — the static planner then skips the
    // shuffle-both-sides SMJ plan that AQE would only downgrade to a
    // broadcast join AFTER paying both exchange jobs (checkpointed-RDD
    // inputs carry no size stats, so the planner assumes huge).
    // Measured at sf0.1: 73 → 63 scheduled jobs, 131 → 91 stages,
    // sum of job walls 1.8 → 1.0 s. Above the bound (web-scale host
    // counts) nothing is hinted and the AQE plan is unchanged — the
    // dial derives from the input, not from the local core count.
    val smallState = n <= 4000000L // ≤ ~4M nodes ≈ low-hundreds MB broadcast
    val r0 = Scale / n
    val base = 15L * r0 / 100L
    var ranks = nodes.select(col("node"), lit(r0).as("rank"), col("dang"))
    for (_ <- 1 to iters) {
      // lazy checkpoint BEFORE the dual use: the dangling-mass
      // aggregate and the inflow join both read one materialization.
      // (Measured and rejected here, guide §1: (a) folding the
      // dangling mass into the inflow groupBy via a keyed union leg —
      // the union's extra AQE stages cost MORE jobs than the separate
      // 1-row aggregate, 83 vs 73 jobs at sf0.1; (b) checkpointing
      // every SECOND iteration — the un-checkpointed iteration's
      // dual-use subtree is NOT deduped across AQE stage boundaries,
      // so per-iteration work doubles: 2.9 s → 5.6 s.)
      ranks = ranks.localCheckpoint(false)
      val dTot = ranks.where(col("dang"))
        .agg(coalesce(sum("rank"), lit(0L)).as("dang_tot"))
      // the contribution product lifts to DECIMAL(38,0) (g02's
      // normalizer discipline, VERDICT r15 #7): rank ≤ Scale (1e9),
      // so a host pair with > ~9.2e9 links used to overflow the
      // BIGINT `rank * w` and throw under ANSI — genuinely dense
      // pairs are data, not errors. The quotient re-enters BIGINT
      // exactly (c ≤ rank, since w ≤ outw).
      val rankSide = if (smallState) broadcast(ranks) else ranks
      val inflow = adj.join(rankSide, adj("src") === rankSide("node"))
        .select(col("dst"), expr(
          "CAST((CAST(rank AS DECIMAL(38,0)) * w) div outw AS BIGINT)")
          .as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      val inflowSide = if (smallState) broadcast(inflow) else inflow
      ranks = nodes.join(inflowSide, nodes("node") === inflowSide("dst"), "left")
        .crossJoin(broadcast(dTot))
        .select(col("node"),
          (lit(base) + expr(
            s"(85 * (coalesce(inflow, 0L) + dang_tot div ${n}L)) div 100"))
            .as("rank"),
          col("dang"))
    }
    // nodes already carries outw — one final join instead of two
    nodes.join(ranks.select("node", "rank"), "node")
      .select(col("node"), coalesce(col("outw"), lit(0L)).as("out_w"),
        col("rank").as("rank_e9"))
      .orderBy(desc("rank_e9"), col("node"))
  }

  /** g02: HITS hubs/authorities, 10 mutual-recursion iterations,
    * integer fixed-point with exact L1 normalization.
    *
    * Recurrence (all BIGINT; the standard HITS L2 norm is replaced by
    * L1 — same fixed-point direction, but exactly computable in
    * integers: the normalizer is an integer SUM, not a square root):
    *   h0(n) = a0(n) = Scale div N
    *   a~(n) = Σ_{e: src→n} h(src) * w(e)
    *   a(n)  = (a~(n) * Scale) div Σ a~        (L1-normalize to Scale)
    *   h~(n) = Σ_{e: n→dst} a(dst) * w(e)
    *   h(n)  = (h~(n) * Scale) div Σ h~
    *
    * Each iteration: two join+agg passes over the frozen edge frame
    * (auth from hubs, then hubs from the fresh auth). Score state is
    * SPARSE — a node absent from the frame has score EXACTLY 0 (it
    * contributes nothing to any sum and normalizes to `0 div tot =
    * 0`), so the per-iteration nodes⋈scores densifying join is
    * dropped entirely and the full node set joins back once at the
    * END. The raw-score frames are localCheckpointed (lazily) before
    * their dual use — the normalizer aggregate and the normalize
    * projection both read the SAME materialization instead of
    * re-executing the edges⋈scores lineage — and the L1 normalizer
    * rides INSIDE the plan as a broadcast 1-row global aggregate
    * crossJoined on (the q44/q50 scalar-threshold shape), so an
    * iteration is one materialization per phase with ZERO
    * driver-blocking scalar actions; a vanished normalizer fails
    * loudly in the division itself under ANSI mode (the session
    * default), so no driver-side mass check is needed.
    * Overflow: ALL products ride DECIMAL(38,0) (g01's dense-pair
    * discipline, VERDICT r16 #1). The per-edge `h * w` / `a * w`
    * contribution lifts before the sum — a host pair denser than
    * ~9.2e9 links (where the old BIGINT product threw under ANSI) is
    * data, not an error — and the normalization numerator
    * `raw * Scale` (reaching ~1e30 at large corpora) computes with
    * Spark's integral `div` (the oracle mirrors it in HUGEINT),
    * exact at any realistic scale; the normalized score re-enters
    * BIGINT exactly (≤ Scale by construction).
    *
    * Output: (node, hub_e9, auth_e9), strongest authorities first.
    */
  def g02Hits(spark: SparkSession, dir: String, iters: Int = 10): DataFrame =
    hitsOver(linkEdges(spark, dir), iters)

  // ---------------------------------------------------------------- g05

  /** The g05 plant: meta-robots variants by doc_id % 4 — no directive
    * (the default index,follow), a plain noindex, an index-but-
    * nofollow, and an UPPERCASE noindex,nofollow (real pages mix
    * cases; the extractor must be case-insensitive). Byte-exact
    * affine construction, oracle-rebuildable.
    */
  private[graft] def demoRobotsDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      lit("<html><head>"),
      when(col("doc_id") % 4 === 1,
        lit("<meta name=\"robots\" content=\"noindex\"/>"))
        // `none` in a comma LIST (legal: none + a non-REP directive)
        // — the exact-match `=== "none"` semantics failed OPEN here;
        // token matching must block it (review r15 wave)
        .when(col("doc_id") % 12 === 2,
          lit("<meta content='none, noarchive' name=robots />"))
        // TAB as the inter-token whitespace (legal per the value
        // grammar): space-only trim leaves '\tnofollow' != 'nofollow'
        // and the opt-out fails OPEN — the plant variant that forces
        // full-whitespace token trimming (ADVICE r15 #1)
        .when(col("doc_id") % 12 === 10,
          lit("<meta name=\"robots\" content=\"noindex,\tnofollow\">"))
        .when(col("doc_id") % 4 === 2,
          // reversed attribute order + single-quoted content +
          // unquoted name value — real-world markup the extractor
          // must not fail open on (ADVICE r12 #2)
          lit("<meta content='index, nofollow' name=robots />"))
        .when(col("doc_id") % 4 === 3,
          // uppercase + whitespace around '=' + mixed quote styles
          lit("<META NAME = 'ROBOTS' CONTENT = \"NOINDEX, NOFOLLOW\"/>"))
        .otherwise(lit("")),
      lit("</head><body><p>"), col("text"),
      lit("</p></body></html>")).as("html"))

  /** g05 kernel over any (doc_id, html) frame: meta-robots directive
    * extraction (the governance flag every crawl pipeline must honor
    * BEFORE a page enters the corpus — REP meta tags are the
    * publisher's opt-out) + the standard directive semantics:
    * `noindex`/`none` blocks indexing (admit = 0), `nofollow`/`none`
    * blocks link extraction (g03 composes: a nofollow page's anchors
    * should not feed the host graph). The extractor is tolerant of
    * real-world markup (ADVICE r12 #2): attributes in EITHER order,
    * double/single/no quotes, optional whitespace around `=`,
    * case-insensitive via inline `(?i)` groups — all Java ↔ RE2
    * portable (`\b` word boundaries, no lookaround), t18's
    * discipline; quoted attribute values may legally contain `>` and
    * the tag walker steps over them atomically. Known narrow scope:
    * only the FIRST meta tag whose `name` resolves to `robots` is
    * read (multiple robots tags are rare and additive in practice),
    * and MALFORMED markup — an unclosed tag, unpaired quotes, a
    * value containing the literal text `name=robots` — can still
    * defeat a regex-level parse and fail open; well-formed HTML in
    * any attribute order/quoting does not. Per-row codegen'd regex;
    * no shuffle.
    */
  def robotsFlagsOver(pages: DataFrame): DataFrame = {
    // the derived columns would silently OVERWRITE same-named input
    // columns (withColumn semantics) and st24 would then land the
    // derived values under the original names — refuse up front
    val clash = pages.columns
      .intersect(Seq("robots", "noindex", "nofollow", "admit"))
    require(clash.isEmpty,
      s"robotsFlagsOver: input already has column(s) ${clash.mkString(", ")}" +
        " — rename them; the extractor emits robots/noindex/nofollow/admit")
    // two-step tolerant extraction: (1) the first <meta ...> tag whose
    // name attribute resolves to robots (either attribute order, any
    // quote style, whitespace around '='); (2) its content value —
    // double-quoted, then single-quoted, then unquoted token. The
    // attribute walker `(?:[^>"']|"[^"]*"|'[^']*')*` steps over
    // QUOTED values atomically, so a legal '>' inside a quoted
    // attribute never truncates the tag (review r13 #2), and the
    // `[\s"'/]` delimiter before name/content stops hyphenated
    // decoys like data-name= / data-content= from shadowing the real
    // attribute (review r13 #3 — RE2 has no lookbehind; after
    // `<meta` a real attribute is always preceded by one of these).
    // the name VALUE must terminate right after `robots`: quoted
    // values close their quote, unquoted ones hit whitespace / '/'
    // or end the tag — `robots\b` alone would let an UNQUOTED
    // name=robots-feed decoy match ('-' is a word boundary) and
    // shadow a real robots tag behind it (review r13 #8)
    val walker = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
    val tag = regexp_extract(col("html"),
      "(?i)<meta\\b" + walker + "?[\\s\"'/]name\\s*=\\s*" +
        "(?:\"robots\"" + walker +
        "|'robots'" + walker +
        "|robots[\\s/]" + walker +
        "|robots)>", 0)
    val content = lower(coalesce(
      nullif(regexp_extract(tag,
        "(?i)[\\s\"'/]content\\s*=\\s*\"([^\"]*)\"", 1), lit("")),
      nullif(regexp_extract(tag,
        "(?i)[\\s\"'/]content\\s*=\\s*'([^']*)'", 1), lit("")),
      regexp_extract(tag,
        "(?i)[\\s\"'/]content\\s*=\\s*([^\\s\"'/>]+)", 1)))
    // input columns RIDE ALONG (the verdict is per ROW, and a gate
    // that joins verdicts back by key would admit every row sharing a
    // doc_id with an admitted one — e.g. a URL re-crawled within one
    // micro-batch)
    //
    // directives match as comma-separated TOKENS, not substrings
    // (review r15 wave): the value grammar is a comma list, and the
    // old `robots === "none"` exact-match failed OPEN on the legal
    // combination `none, noarchive` — a publisher's opt-out admitted
    // — while substring contains() also fired on exotic foreign
    // tokens. The token arrays are 1-3 elements, so the interpreted
    // HOF cost is bounded per row (the c04 card-list precedent).
    // Tokens trim FULL whitespace, not trim()'s ASCII spaces
    // (ADVICE r15 #1): 'noindex,\tnofollow' is legal markup, and a
    // space-only trim leaves '\tnofollow' — the opt-out admitted.
    val toks = transform(split(content, ","),
      t => regexp_replace(t, "^\\s+|\\s+$", ""))
    pages
      .withColumn("robots", content)
      .withColumn("noindex",
        (array_contains(toks, "noindex") || array_contains(toks, "none"))
          .cast("long"))
      .withColumn("nofollow",
        (array_contains(toks, "nofollow") || array_contains(toks, "none"))
          .cast("long"))
      .withColumn("admit", lit(1L) - col("noindex"))
  }

  /** g05: meta-robots governance flags over the planted demo pages. */
  def g05RobotsGate(spark: SparkSession, dir: String): DataFrame =
    robotsFlagsOver(demoRobotsDocs(Tables(spark, dir).documents))
      .select("doc_id", "robots", "noindex", "nofollow", "admit")
      .orderBy("doc_id")

  // ---------------------------------------------------------------- g06

  /** The demo host NAME builder — one definition shared by the robots
    * bodies, the frontier URLs, and the sitemap plant, so those
    * formulas cannot drift from each other silently (a drifted g07
    * rank join would zero-fill every rank and the composition would
    * stop testing authority without failing anything). The markup
    * plant (demoLinkedDocs) builds full URLs rather than bare hosts
    * and keeps its own inline formula — its agreement is pinned by
    * the g07 spec's ranks-equal-g01 check instead.
    */
  private def demoHost(s: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(lit("site"), s, lit(".example.com"))

  private def demoHostCol: org.apache.spark.sql.Column =
    demoHost(expr("(doc_id div 5) % 50"))

  /** The g06 plant, per DISTINCT demo host: a robots.txt body whose
    * `*` group exercises every parser feature — a CONSECUTIVE
    * user-agent pair (googlebot + `*` form ONE group per RFC 9309),
    * an inline `# comment`, a path-hierarchy allow-under-disallow
    * pair, one host-varying disallow (`/cgi{s % 3}`), a
    * wildcard-plus-anchor rule (slash-star `.tmp$`), and a mid-path
    * wildcard allow (`/dl/` star `/ok`) — plus a SECOND group (`strictbot`,
    * disallow-everything) the `*` evaluation must IGNORE. Bodies are
    * affine in the host index, oracle-rebuildable.
    */
  private[graft] def demoRobotsTxt(docs: DataFrame): DataFrame =
    docs.select(expr("(doc_id div 5) % 50").as("s")).distinct()
      .select(
        demoHost(col("s")).as("host"),
        concat(
          lit("User-agent: googlebot\nUser-agent: *\n" +
            "Disallow: /private # keep out\nAllow: /private/pub\n" +
            "Disallow: /cgi"),
          expr("s % 3"),
          lit("\nDisallow: /*.tmp$\nAllow: /dl/*/ok\n" +
            "\nUser-agent: strictbot\nDisallow: /\n")).as("body"))

  /** The g06 demo URL frontier: one URL per doc on its d15 domain,
    * with paths cycling through every verdict branch — unmatched,
    * plainly disallowed, allowed by the LONGER nested rule,
    * host-dependently disallowed (`/cgi{v3}` matches only when the
    * doc's v3 equals the host's s % 3), a near-miss literal prefix
    * (`/cgi9…`), a wildcard-anchored disallow hit (`….tmp`), the
    * anchor's near-miss (`….tmp.bak`), and a mid-wildcard allow hit
    * (`/dl/…/ok`).
    */
  private[graft] def demoFrontierUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), demoHostCol.as("host"),
      when(col("doc_id") % 8 === 0,
        concat(lit("/docs/"), col("doc_id")))
        .when(col("doc_id") % 8 === 1,
          concat(lit("/private/"), col("doc_id")))
        .when(col("doc_id") % 8 === 2,
          concat(lit("/private/pub/"), col("doc_id")))
        .when(col("doc_id") % 8 === 3,
          concat(lit("/cgi"), expr("doc_id % 3"), lit("/"), col("doc_id")))
        .when(col("doc_id") % 8 === 4,
          concat(lit("/cgi9/"), col("doc_id")))
        .when(col("doc_id") % 8 === 5,
          concat(lit("/files/"), col("doc_id"), lit(".tmp")))
        .when(col("doc_id") % 8 === 6,
          concat(lit("/files/"), col("doc_id"), lit(".tmp.bak")))
        .otherwise(concat(lit("/dl/"), col("doc_id"), lit("/ok")))
        .as("path"))

  /** Parse robots.txt bodies into `*`-group rules (host, rule,
    * prefix), RFC 9309-faithfully:
    *   - lines split on `\r?\n` (CRLF bodies are the common case in
    *     the wild), `# comments` stripped, whitespace trimmed;
    *   - field names matched case-insensitively (§2.1);
    *   - CONSECUTIVE `User-agent` lines form ONE group (§2.2.1): a
    *     header RUN is delimited by a UA line whose predecessor is
    *     not one, and a rule belongs to the `*` evaluation iff its
    *     run CONTAINS `*` — latest-UA-wins would silently unscope
    *     `User-agent: googlebot\nUser-agent: *` groups;
    *   - empty prefixes drop (an empty Disallow means allow-all).
    * Per-host windows over line position — bodies are KB, hosts are
    * the partition key.
    */
  def robotsTxtRules(robots: DataFrame): DataFrame =
    robotsStarLines(robots)
      .select(col("host"),
        lower(regexp_extract(col("line"), "(?i)^(allow|disallow)\\s*:", 1))
          .as("rule"),
        trim(regexp_extract(col("line"),
          "(?i)^(?:allow|disallow)\\s*:\\s*(.*)$", 1)).as("prefix"))
      .filter(col("rule") =!= "" && col("prefix") =!= "")
      .select("host", "rule", "prefix")

  /** The `*`-group line scope shared by [[robotsTxtRules]] and
    * [[robotsCrawlDelays]]: comment-stripped, trimmed, non-empty
    * robots.txt lines belonging to a header run that CONTAINS
    * `User-agent: *` (RFC 9309 §2.2.1 — consecutive UA lines form one
    * group; empty lines are dropped BEFORE run detection because the
    * ABNF permits emptylines between a group's UA lines, and splitting
    * a run there would silently unscope the rules that follow —
    * fail-open governance). Output: (host, pos, line) for every line
    * of every `*` run, directive lines included.
    */
  private def robotsStarLines(robots: DataFrame): DataFrame = {
    val lines = robots
      .select(col("host"),
        posexplode(split(col("body"), "\r?\n")).as(Seq("pos", "raw")))
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("line"))
      .filter(col("line") =!= "")
    val byPos = Window.partitionBy("host").orderBy("pos")
    val cum = byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // §2.1 ABNF allows whitespace BEFORE the colon too
    val flagged = lines
      .withColumn("is_ua", col("line").rlike("(?i)^user-agent\\s*:"))
      .withColumn("prev_ua", lag(col("is_ua"), 1, false).over(byPos))
      .withColumn("run_id",
        sum(when(col("is_ua") && !col("prev_ua"), 1).otherwise(0)).over(cum))
    val starRuns = flagged
      .filter(col("is_ua") &&
        trim(regexp_extract(col("line"), "(?i)^user-agent\\s*:\\s*(.*)$", 1))
          === "*")
      .select("host", "run_id").distinct()
    flagged.join(starRuns, Seq("host", "run_id"), "left_semi")
      .select("host", "pos", "line")
  }

  /** `Crawl-delay` per host, from the `*` group's scope (the directive
    * is non-standard — absent from RFC 9309 — but honored by major
    * crawlers per Yandex/Bing's published semantics: seconds between
    * requests, group-scoped like Allow/Disallow). Parsing is tolerant:
    * case-insensitive field name, comments stripped, value
    * try_cast to double (a non-numeric or non-positive value is
    * IGNORED, never a parse failure — a typo'd directive must not
    * fail the crawl open or closed); multiple valid values in scope
    * collapse to the MAX (the politest reading — when a publisher
    * says both 2 and 5, waiting 5 violates neither). Output:
    * (host, crawl_delay) seconds — the column
    * [[graft.sources.PagedSource.executeCrawlPlan]] derives per-host
    * bucket rates from (rate = 1/delay, job dial as fallback for
    * hosts that declare none). No ceiling is applied HERE — the
    * parse reports what the publisher declared; the executors refuse
    * un-honorable values (`maxPoliteDelaySecs`, audited
    * `delay_excessive`) so one hostile `Crawl-delay: 9999999` line
    * can never park a fetch partition inside Thread.sleep
    * (VERDICT r15 wrong #1a).
    */
  def robotsCrawlDelays(robots: DataFrame): DataFrame =
    robotsStarLines(robots)
      .filter(col("line").rlike("(?i)^crawl-delay\\s*:"))
      .select(col("host"),
        trim(regexp_extract(col("line"),
          "(?i)^crawl-delay\\s*:\\s*(.*)$", 1)).as("raw"))
      .select(col("host"), expr("try_cast(raw AS double)").as("delay"))
      .filter(col("delay").isNotNull && col("delay") > 0)
      .groupBy("host").agg(max(col("delay")).as("crawl_delay"))

  /** g06 kernel: evaluate a URL frontier against parsed robots rules
    * — RFC 9309 §2.2.2-3 match semantics: a rule is a path PREFIX
    * where `*` matches any character sequence and a trailing `$`
    * anchors the end; the longest rule (most octets) wins, Allow wins
    * length ties, no match → allowed. Rules translate to SQL LIKE
    * patterns (escape `\\ % _`, then `*` → `%`; non-anchored rules
    * get a trailing `%`), evaluated per row. One PLAIN equi-join on
    * host — per-host rule sets are bounded but the TOTAL rule frame
    * is |hosts|·|rules/host| and hosts grow with the corpus, so no
    * forced broadcast (AQE auto-broadcasts while small, g01's
    * discipline) — then a per-ROW argmax window on (rule octet-length
    * desc, allow-first, prefix) — a total order, so ties in length
    * AND type pick one deterministic rule row. The window partitions
    * on a row-unique id minted BEFORE the join, so frontier rows that
    * share (doc_id, host, path) — a URL re-crawled within one batch,
    * the duplicate tolerance g07's budget window defends per-row —
    * each keep their own verdict instead of collapsing to one.
    * RFC 9309 §2.2.2 longest-match counts OCTETS, so the tie-break is
    * `octet_length(prefix)` (UTF-16 char length diverges on non-ASCII
    * rule paths), and `matched_len` reports octets too.
    */
  def g06UrlPermissionsOver(urls: DataFrame, robots: DataFrame): DataFrame = {
    // row_uid is the internal row-identity column minted below — a
    // same-named input would be silently overwritten (withColumn)
    require(!urls.columns.contains("row_uid"),
      "g06UrlPermissionsOver: input already has column row_uid — rename it;" +
        " the kernel mints an internal row-identity column under that name")
    val rules = robotsTxtRules(robots)
      .withColumn("anch", col("prefix").endsWith("$"))
      .withColumn("esc",
        replace(replace(replace(col("prefix"),
          lit("\\"), lit("\\\\")), lit("%"), lit("\\%")), lit("_"),
          lit("\\_")))
      .withColumn("wild", replace(col("esc"), lit("*"), lit("%")))
      .withColumn("pattern",
        when(col("anch"), expr("substring(wild, 1, length(wild) - 1)"))
          .otherwise(concat(col("wild"), lit("%"))))
      .select("host", "rule", "prefix", "pattern")
    val matched = urls.withColumn("row_uid", monotonically_increasing_id())
      .join(rules, Seq("host"), "left")
      .withColumn("hit",
        col("prefix").isNotNull && expr("path LIKE pattern ESCAPE '\\\\'"))
    val wnd = Window.partitionBy("row_uid").orderBy(
      when(col("hit"), octet_length(col("prefix"))).otherwise(-1).desc,
      when(col("rule") === "allow", 0).otherwise(1),
      col("prefix"))
    matched
      .withColumn("rk", row_number().over(wnd))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("host"), col("path"),
        when(col("hit"), octet_length(col("prefix"))).otherwise(0)
          .cast("long").as("matched_len"),
        when(col("hit"), col("rule")).otherwise("none").as("matched_rule"),
        when(!col("hit") || col("rule") === "allow", 1L).otherwise(0L)
          .as("allowed"))
  }

  /** The g14 plant, per distinct demo host: a robots body exercising
    * every Crawl-delay parse feature — a consecutive-UA run
    * (googlebot + `*` form one group), an integer value that is
    * NON-POSITIVE on s%6==0 hosts (ignored), a lowercase fractional
    * value with an inline comment on s%5==0 hosts, a non-numeric
    * decoy on s%4==1 hosts (ignored, never a failure), and a
    * `strictbot` group whose delay the `*` evaluation must not see.
    * Hosts where no valid in-scope value survives produce NO row.
    * Affine in the host index, oracle-rebuildable.
    */
  private[graft] def demoCrawlDelayRobots(docs: DataFrame): DataFrame =
    docs.select(expr("(doc_id div 5) % 50").as("s")).distinct()
      .select(demoHost(col("s")).as("host"),
        concat(
          lit("User-agent: googlebot\nUser-agent: *\nCrawl-delay: "),
          expr("s % 6"), lit("\n"),
          when(expr("s % 5 = 0"),
            concat(lit("crawl-delay: "), expr("s % 7"),
              lit(".5 # mirrored\n"))).otherwise(lit("")),
          when(expr("s % 4 = 1"), lit("Crawl-delay: fast\n"))
            .otherwise(lit("")),
          lit("Disallow: /x\n\nUser-agent: strictbot\nCrawl-delay: 9\n"))
          .as("body"))

  /** g14: robots.txt Crawl-delay extraction over the planted demo
    * bodies — the per-host politeness rate publishers actually
    * declare ([[robotsCrawlDelays]]); f14/f15 derive their
    * `fetch:<host>` token-bucket rates from this column
    * (rate = 1/delay, job dial as fallback).
    */
  def g14CrawlDelay(spark: SparkSession, dir: String): DataFrame =
    robotsCrawlDelays(demoCrawlDelayRobots(Tables(spark, dir).documents))
      .orderBy("host")

  /** g06: robots.txt frontier permissions — the FILE-level half of
    * crawl governance beside g05's page-level meta-robots (RFC 9309,
    * public): a crawler must evaluate every frontier URL against the
    * host's robots.txt BEFORE fetching. Composes with st20's URL gate
    * and st23's domain quotas at intake.
    */
  def g06RobotsTxt(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    g06UrlPermissionsOver(demoFrontierUrls(docs), demoRobotsTxt(docs))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- g07

  /** g07 kernel: compose permissions × authority × budget into a
    * fetch plan. Inputs: a permission frame (g06's output shape —
    * doc_id, host, path, allowed) and a rank frame (g01's — node,
    * rank_e9). Each URL gets its host's authority (unranked hosts →
    * 0) and a per-host RUNNING budget: the first `budget` ALLOWED
    * URLs per host (doc_id order) get `fetch = 1` — a disallowed URL
    * never consumes a slot. One PLAIN equi-join on host — rank state
    * is one row per host, which GROWS with the corpus, so no forced
    * broadcast (AQE auto-broadcasts while small, g01's discipline) —
    * + one host-partitioned window; no global window anywhere, so the
    * plan scales with the frontier.
    */
  def frontierPlanOver(perms: DataFrame, ranks: DataFrame,
      budget: Int, carry: Seq[String] = Nil): DataFrame = {
    // (doc_id, path) is a TOTAL order per host — doc_id alone is not
    // unique (a URL re-crawled within one batch), and a ROWS frame
    // over tied keys would hand out budget slots nondeterministically
    val wnd = Window.partitionBy("host").orderBy("doc_id", "path")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `carry` columns ride through unchanged, appended after `fetch`
    // (g10 carries its freshness verdict; g07 carries nothing)
    perms
      .join(ranks.select(col("node").as("host"), col("rank_e9")),
        Seq("host"), "left")
      .select(Seq(col("doc_id"), col("host"), col("path"),
        coalesce(col("rank_e9"), lit(0L)).as("rank_e9"),
        col("allowed")) ++ carry.map(col): _*)
      .withColumn("runa", sum("allowed").over(wnd))
      .select(Seq(col("doc_id"), col("host"), col("path"),
        col("rank_e9"), col("allowed"),
        when(col("allowed") === 1L && col("runa") <= budget, 1L)
          .otherwise(0L).as("fetch")) ++ carry.map(col): _*)
  }

  /** The g07 demo/oracle politeness budget — ONE constant, referenced
    * by the oracle generator too, so the two cannot drift.
    */
  val DefaultFetchBudget = 3

  /** g07: crawl-frontier fetch planning — the governance axis
    * COMPOSED (the st15 composition discipline, batch form): a URL is
    * fetched only if its host's robots.txt permits it (g06), CARRIES
    * the host's link authority (g01, dangling-mass PageRank over the
    * g03-extracted graph — the priority key a downstream scheduler
    * sorts on; it does not change which URLs fit the budget), and
    * sits within a per-host politeness budget (st23's quota idea at
    * plan time). This is the decision every crawler makes per
    * frontier drain; each input is independently oracled, and this
    * oracle replays the composition end to end.
    *
    * Overflow posture (g01, r15 note → LIFTED r16): the per-edge
    * contribution `rank * w` now computes as DECIMAL(38,0) (g02's
    * normalizer discipline), so a host pair with > ~9e9 links ranks
    * exactly instead of failing the multiply — dense pairs are data,
    * not errors. The quotient re-enters BIGINT exactly (c ≤ rank).
    */
  def g07FrontierPlan(spark: SparkSession, dir: String,
      budget: Int = DefaultFetchBudget): DataFrame =
    g07PlanWith(spark, dir, inlineRanks(spark, dir), budget)

  /** g07 against a PERSISTED g12 rank index instead of the inline
    * 10-iteration PageRank — the form a production frontier drain
    * runs: rank refresh is a periodic graph job ([[buildRankIndex]]),
    * planning is a plan-time read. Row-identical to
    * [[g07FrontierPlan]] when the index is current (spec-pinned).
    */
  def g07FrontierPlanIndexed(spark: SparkSession, dir: String,
      indexPath: String, budget: Int = DefaultFetchBudget): DataFrame =
    g07PlanWith(spark, dir, readRankIndex(spark, indexPath), budget)

  private def g07PlanWith(spark: SparkSession, dir: String,
      ranks: DataFrame, budget: Int): DataFrame = {
    val docs = Tables(spark, dir).documents
    val perms =
      g06UrlPermissionsOver(demoFrontierUrls(docs), demoRobotsTxt(docs))
    frontierPlanOver(perms, ranks, budget).orderBy("doc_id")
  }

  // ---------------------------------------------------------------- g08

  /** The g08 plant, per DISTINCT demo host: a sitemaps.org urlset with
    * five entries — three fully-populated (loc + lastmod + priority,
    * affine in (host, slot)), one with the OPTIONAL fields omitted
    * (the protocol makes lastmod/priority optional), and one
    * CROSS-HOST decoy the extractor must flag (the protocol scopes a
    * sitemap to its own host). Multi-line XML with indentation — the
    * extractor's block regex must span newlines.
    */
  private[graft] def demoSitemaps(docs: DataFrame): DataFrame = {
    def entry(k: Int): org.apache.spark.sql.Column = {
      val day = expr(s"lpad(cast((s + $k) % 28 + 1 as string), 2, '0')")
      val pri = expr(s"(s * 7 + $k) % 10")
      concat(lit("  <url>\n    <loc>https://site"), col("s"),
        lit(s".example.com/p/$k</loc>\n    <lastmod>2026-01-"), day,
        lit("</lastmod>\n    <priority>0."), pri,
        lit("</priority>\n  </url>\n"))
    }
    docs.select(expr("(doc_id div 5) % 50").as("s")).distinct()
      .select(
        demoHost(col("s")).as("host"),
        concat(
          lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
          entry(0), entry(1), entry(2),
          // optional fields omitted
          concat(lit("  <url>\n    <loc>https://site"), col("s"),
            lit(".example.com/p/3</loc>\n  </url>\n")),
          // cross-host decoy
          concat(lit("  <url>\n    <loc>https://site"),
            expr("(s + 1) % 50"),
            lit(".example.com/p/4</loc>\n  </url>\n")),
          lit("</urlset>\n")).as("xml"))
  }

  /** g08 kernel over any (host, xml) frame: sitemaps.org urlset
    * extraction — `<url>` blocks (a `(?s)` lazy regex spanning
    * newlines, the t24 block discipline), per-block `loc` plus the
    * OPTIONAL `lastmod`/`priority` fields ('' when absent), the loc's
    * path, and the protocol's same-host scope flag (a sitemap only
    * speaks for its own host — cross-host entries are flagged, not
    * silently kept). Per-row codegen'd regex; no shuffle.
    */
  def sitemapExtractOver(sitemaps: DataFrame): DataFrame = {
    def field(name: String) = regexp_extract(col("entry"),
      s"<$name>([^<]*)</$name>", 1)
    val locHost =
      lower(regexp_extract(field("loc"), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    sitemaps
      .select(col("host"), posexplode(regexp_extract_all(col("xml"),
        lit("(?s)<url>(.*?)</url>"), lit(1))).as(Seq("ord", "entry")))
      .select(col("host"), col("ord").cast("long").as("ord"),
        field("loc").as("loc"),
        regexp_extract(field("loc"), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/.*)$", 1)
          .as("path"),
        field("lastmod").as("lastmod"),
        field("priority").as("priority"),
        // DNS names are case-insensitive — lower BOTH sides, or a
        // mixed-case host column would flag its own URLs out of scope
        (locHost === lower(col("host"))).cast("long").as("in_scope"))
  }

  /** g08: sitemap URL discovery — the crawl axis's DISCOVERY half
    * (sitemaps.org protocol, public): publishers enumerate their own
    * URLs with freshness/priority hints; a crawler merges the
    * in-scope entries into the frontier that g06 permissions and the
    * g07 plan then govern.
    */
  def g08SitemapExtract(spark: SparkSession, dir: String): DataFrame =
    sitemapExtractOver(demoSitemaps(Tables(spark, dir).documents))
      .orderBy("host", "ord")

  // ---------------------------------------------------------------- g09

  /** doc_id minting for DISCOVERED (sitemap) frontier rows: the
    * frontier keys on doc_id but sitemap entries have none, so each
    * gets a NEGATIVE id, unique per (host index, ord) — negative ids
    * sort before every crawled-link doc_id, so publisher-DECLARED
    * URLs take budget priority over crawled-link URLs in the per-host
    * plan window (a deliberate, oracle-replayable policy: the
    * publisher told us these exist; links merely suggested the rest).
    * The host index is re-extracted from the host NAME so the formula
    * works on g08's output schema (which drops the index).
    */
  private def discoveredDocId: org.apache.spark.sql.Column =
    -(regexp_extract(col("host"), "^site(\\d+)\\.", 1).cast("long") * 8 +
      col("ord")) - 1

  /** The g09 demo politeness budget: wider than g07's so the plan
    * interleaves BOTH sources per host (4 discovered + 10 crawled
    * URLs compete for 6 slots) instead of starving either.
    */
  val DiscoveredFetchBudget = 6

  /** g09: the crawl axis composed END TO END — discovery feeds the
    * plan. g08's in-scope discovered URLs (cross-host decoys already
    * flagged out) union the crawled-link demo frontier, the merged
    * frontier takes g06's robots.txt permissions, and g07's
    * rank-carrying budget window plans the fetches — the full
    * sitemap → robots → budget decision a crawler makes per frontier
    * drain, in ONE declarative plan. Each stage is independently
    * oracled (g06/g07/g08); this oracle replays the composition.
    */
  def g09DiscoveredPlan(spark: SparkSession, dir: String,
      budget: Int = DiscoveredFetchBudget): DataFrame =
    g09PlanWith(spark, dir, inlineRanks(spark, dir), budget)

  /** g09 against a persisted g12 rank index (see
    * [[g07FrontierPlanIndexed]]) — row-identical to the inline form
    * when the index is current.
    */
  def g09DiscoveredPlanIndexed(spark: SparkSession, dir: String,
      indexPath: String, budget: Int = DiscoveredFetchBudget): DataFrame =
    g09PlanWith(spark, dir, readRankIndex(spark, indexPath), budget)

  private def g09PlanWith(spark: SparkSession, dir: String,
      ranks: DataFrame, budget: Int): DataFrame = {
    val docs = Tables(spark, dir).documents
    val discovered = sitemapExtractOver(demoSitemaps(docs))
      .filter(col("in_scope") === 1)
      .select(discoveredDocId.as("doc_id"), col("host"), col("path"))
    val frontier = demoFrontierUrls(docs).unionByName(discovered)
    val perms = g06UrlPermissionsOver(frontier, demoRobotsTxt(docs))
    frontierPlanOver(perms, ranks, budget).orderBy("doc_id")
  }

  // ---------------------------------------------------------------- g10

  /** The g10 plant: the lake's ADMITTED ledger for the demo sitemap
    * URLs — per (host s, ord 0..3), entries with (s + ord) % 3 == 0
    * were never admitted (the 'new' class), the rest were admitted on
    * 2026-01-{(s·5+ord) % 28 + 1}. Against the sitemap lastmod
    * 2026-01-{(s+ord) % 28 + 1} this makes all three freshness
    * verdicts fire at every SF (new/stale/fresh), and the per-host
    * eligible count crosses the budget on some hosts (so the budget
    * provably binds). Affine in (s, ord) — oracle-rebuildable.
    */
  private[graft] def demoAdmittedLedger(docs: DataFrame): DataFrame =
    docs.select(expr("(doc_id div 5) % 50").as("s")).distinct()
      .select(col("s"), explode(expr("array(0L, 1L, 2L, 3L)")).as("ord"))
      .filter((col("s") + col("ord")) % 3 =!= 0)
      .select(demoHost(col("s")).as("host"),
        concat(lit("/p/"), col("ord")).as("path"),
        concat(lit("2026-01-"),
          lpad(((col("s") * 5 + col("ord")) % 28 + 1).cast("string"), 2,
            "0")).as("admitted_on"))

  /** g10 kernel: freshness verdicts for discovered URLs against the
    * lake's admitted ledger — f03's incremental-sync diff lifted to
    * the crawl frontier. One LEFT equi-join on (host, path), then a
    * per-row verdict: `new` (never admitted — fetch), `stale`
    * (publisher's lastmod POSTDATES the admitted copy — refetch),
    * `fresh` (otherwise — skip; a missing lastmod on an admitted URL
    * is fresh: the protocol makes lastmod optional, and refetching on
    * absence would re-crawl every minimal sitemap forever). The
    * comparison runs on the VALIDATED `YYYY-MM-DD` date prefix —
    * lexical ordering is only sound over one uniform format, and an
    * unvalidated 'TBD' / RFC-822 date would sort above every ISO
    * date (st26 ledger discipline; freshness is deliberately
    * DATE-granular). The output keeps the RAW lastmod. No window, no
    * global state.
    */
  def recrawlStatusOver(discovered: DataFrame,
      admitted: DataFrame): DataFrame = {
    val lmNorm = regexp_extract(col("lastmod"),
      "^(\\d{4}-\\d{2}-\\d{2})", 1)
    discovered.join(admitted, Seq("host", "path"), "left")
      .withColumn("status",
        when(col("admitted_on").isNull, "new")
          .when(lmNorm =!= "" && lmNorm > col("admitted_on"), "stale")
          .otherwise("fresh"))
      .withColumn("refetch", (col("status") =!= "fresh").cast("long"))
  }

  /** g10: recrawl/freshness planning — which discovered URLs to
    * REfetch, budgeted. g08's in-scope entries diff against the
    * lake's admitted ledger ([[recrawlStatusOver]]), then the g07
    * plan window budgets the eligible rows per host (a fresh URL
    * never consumes a slot — the g07 allowed-only discipline), with
    * the freshness columns carried through for the scheduler.
    */
  def g10RecrawlPlan(spark: SparkSession, dir: String,
      budget: Int = DefaultFetchBudget): DataFrame =
    g10PlanWith(spark, dir, inlineRanks(spark, dir), budget)

  /** g10 against a persisted g12 rank index (see
    * [[g07FrontierPlanIndexed]]) — row-identical to the inline form
    * when the index is current.
    */
  def g10RecrawlPlanIndexed(spark: SparkSession, dir: String,
      indexPath: String, budget: Int = DefaultFetchBudget): DataFrame =
    g10PlanWith(spark, dir, readRankIndex(spark, indexPath), budget)

  private def g10PlanWith(spark: SparkSession, dir: String,
      ranks: DataFrame, budget: Int): DataFrame = {
    val docs = Tables(spark, dir).documents
    val discovered = sitemapExtractOver(demoSitemaps(docs))
      .filter(col("in_scope") === 1)
      .select(discoveredDocId.as("doc_id"), col("host"), col("path"),
        col("lastmod"))
    val status = recrawlStatusOver(discovered, demoAdmittedLedger(docs))
      .withColumn("allowed", col("refetch"))
    frontierPlanOver(status, ranks, budget,
      carry = Seq("lastmod", "admitted_on", "status"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- g11

  /** The g11 plant: one crawled-link URL per doc (`/docs/{id}` — an
    * id-parameterized but SHALLOW family) plus, for every 5th doc, 4
    * calendar-style URLs (`/cal/{id}/{k}/{k}` — the classic crawler
    * trap: a deep parameterized space that explodes combinatorially).
    * Both families scale WITH the corpus, so their per-host shares
    * are SF-invariant and the ratio-based verdict is stable at every
    * scale factor.
    */
  private[graft] def demoTrapUrls(docs: DataFrame): DataFrame = {
    val normal = docs.select(demoHostCol.as("host"),
      concat(lit("/docs/"), col("doc_id")).as("path"))
    val traps = docs.filter(col("doc_id") % 5 === 0)
      .select(demoHostCol.as("host"), col("doc_id"),
        explode(expr("array(1L, 2L, 3L, 4L)")).as("k"))
      .select(col("host"),
        concat(lit("/cal/"), col("doc_id"), lit("/"), col("k"), lit("/"),
          col("k")).as("path"))
    normal.unionByName(traps)
  }

  /** g11 kernel over any (host, path) frontier: crawler-trap
    * detection by URL-template explosion (public practice — Heritrix
    * path-repetition rules, IRLbot's spam/trap budgeting): collapse
    * every digit run to a `{d}` slot, count DISTINCT paths per
    * (host, template), and flag a template as a trap when it is BOTH
    * deep (≥ 3 parameter slots — calendars, session paths, cursor
    * chains) AND concentrated (≥ 1/4 of the host's distinct URLs —
    * integer cross-multiplication, no floats) AND actually exploded
    * (≥ [[TrapMinUrls]] distinct paths). Share alone would flag every
    * id-parameterized listing (`/docs/{d}` is most of a normal
    * site); depth alone would flag benign deep permalinks the moment
    * one exists; and without the absolute floor a single deep URL on
    * a small host is 100% of its frontier. A planner joins `is_trap`
    * templates back to stop budgeting URLs the frontier will never
    * exhaust.
    *
    * Scale: one groupBy on (host, template) + one host-partitioned
    * window — no global state; templates are short strings and the
    * per-host template set is bounded by site structure, not corpus
    * size.
    */
  /** The g11 explosion floor — referenced by the oracle generator
    * too, so the two cannot drift. 8 keeps the demo plant (0.8 URLs
    * per doc, ≥ 10 docs per host at every SF) above the floor.
    */
  val TrapMinUrls = 8

  def urlTrapsOver(urls: DataFrame): DataFrame = {
    val tmpl = urls.select(col("host"),
      regexp_replace(col("path"), "[0-9]+", "{d}").as("template"),
      col("path"))
    val counts = tmpl.groupBy("host", "template")
      .agg(countDistinct(col("path")).as("n_urls"))
    val wnd = Window.partitionBy("host")
    val runs = expr(
      "(length(template) - length(replace(template, '{d}', ''))) div 3")
    counts
      .withColumn("host_urls", sum("n_urls").over(wnd))
      .select(col("host"), col("template"), col("n_urls"),
        runs.cast("long").as("digit_runs"),
        (runs >= 3 && col("n_urls") * 4 >= col("host_urls") &&
          col("n_urls") >= TrapMinUrls)
          .cast("long").as("is_trap"))
  }

  /** g11: crawler-trap templates over the planted demo frontier —
    * the governance axis's SAFETY valve beside g06's permissions and
    * g07's budgets (robots.txt can't announce a trap; the crawler
    * must infer it from its own frontier's shape).
    */
  def g11TrapDetect(spark: SparkSession, dir: String): DataFrame =
    urlTrapsOver(demoTrapUrls(Tables(spark, dir).documents))
      .orderBy("host", "template")

  /** g02 iterations over ANY weighted (src, dst, w) edge frame. */
  def hitsOver(edgesIn: DataFrame, iters: Int = 10): DataFrame = {
    val edges = edgesIn.localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    require(n > 0, "g02: empty edge frame — no nodes to score")
    // (Measured and rejected, guide §1: g01 pageRankOver's
    // size-adaptive broadcast hint on the score state. Unlike g01 —
    // where the hinted side is a checkpointed RDD — g02's hub/auth
    // state is an UNCHECKPOINTED normalize subtree between its cadence
    // points, so hinting it forces extra broadcast-build stage chains:
    // 229 vs 180 stages, profiled A/B at sf0.1. Unhinted is faster.)
    val s0 = Scale / n
    // sparse score frames: absent node == score 0 (exact, not approx)
    var hubs = nodes.select(col("node"), lit(s0).as("h"))
    var auths = nodes.select(col("node"), lit(s0).as("a"))
    for (i <- 1 to iters) {
      // lazy checkpoint BEFORE the dual use: the normalizer aggregate
      // and the normalize projection both read one cached
      // materialization of the edges⋈scores pass
      // the per-edge score·weight product lifts to DECIMAL(38,0)
      // (g01's dense-pair discipline, VERDICT r16 #1): scores ≤ Scale
      // (1e9), so a host pair with > ~9.2e9 links used to overflow
      // the BIGINT product and throw under ANSI — genuinely dense
      // pairs are data, not errors. Raw sums and normalizers stay
      // DECIMAL through the L1 division; the normalized score
      // re-enters BIGINT exactly (a ≤ Scale by construction).
      val aRaw = edges.join(hubs, edges("src") === hubs("node"))
        .select(col("dst"), expr("CAST(h AS DECIMAL(38,0)) * w").as("c"))
        .groupBy("dst").agg(sum("c").as("araw"))
        .localCheckpoint(false)
      val aTot = aRaw.agg(sum("araw").as("atot"))
      auths = aRaw.crossJoin(broadcast(aTot))
        .select(col("dst").as("node"),
          expr(s"CAST((CAST(araw AS DECIMAL(38,0)) * ${Scale}L)" +
            " div atot AS BIGINT)").as("a"))
      val hRaw = edges.join(auths, edges("dst") === auths("node"))
        .select(col("src"), expr("CAST(a AS DECIMAL(38,0)) * w").as("c"))
        .groupBy("src").agg(sum("c").as("hraw"))
        .localCheckpoint(false)
      val hTot = hRaw.agg(sum("hraw").as("htot"))
      hubs = hRaw.crossJoin(broadcast(hTot))
        .select(col("src").as("node"),
          expr(s"CAST((CAST(hraw AS DECIMAL(38,0)) * ${Scale}L)" +
            " div htot AS BIGINT)").as("h"))
      // mass guard: under Spark 4's default ANSI mode a vanished
      // normalizer (atot/htot = 0) fails LOUDLY inside the `div`
      // itself (DIVIDE_BY_ZERO) — no driver-side check needed, and a
      // non-ANSI session would surface it as an all-NULL score column
      // in the output
      if (i % 3 == 0 || i == iters) {
        hubs = hubs.localCheckpoint(false)
        auths = auths.localCheckpoint(false)
      }
    }
    nodes.join(hubs, Seq("node"), "left")
      .join(auths, Seq("node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0L)).as("hub_e9"),
        coalesce(col("a"), lit(0L)).as("auth_e9"))
      .orderBy(desc("auth_e9"), col("node"))
  }

  // ---------------------------------------------------------------- g12

  /** The rank frame the inline g07/g09/g10 forms compute per call. */
  private def inlineRanks(spark: SparkSession, dir: String): DataFrame =
    pageRankOver(linkEdges(spark, dir))
      .select(col("node"), col("rank_e9"))

  /** g12 build: persist g01's host-rank table as an index (the s07/s08
    * staged-publish discipline — build into `.staging`, record the
    * iteration dial in `.meta`, then [[Ann.publishStaged]]'s
    * retire-to-`.old` / promote / drop-`.old` swap, so a crash never
    * leaves a half-written table where a probe would silently read
    * partial ranks, and the previous index stays recoverable in place).
    *
    * Why it exists (VERDICT r13 #1): g07/g09/g10 each recomputed the
    * full 10-iteration PageRank INLINE per call — at 100 TB that turns
    * every frontier-drain plan into a graph job. Rank freshness is a
    * POLICY cadence (ranks move on crawl-graph timescales, not
    * per-drain), so production refreshes this table periodically and
    * every plan query is a read. The table is one slim row per HOST
    * (millions at web scale — a few hundred MB), written as plain
    * parquet: the consumers equi-join it on host where AQE broadcasts
    * it while small (g01's no-forced-broadcast discipline), so no
    * hive partitioning is needed or wanted (a dir-per-host layout
    * would explode the listing).
    */
  def buildRankIndex(edges: DataFrame, path: String,
      iters: Int = 10): Unit = {
    val spark = edges.sparkSession
    pageRankOver(edges, iters)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path + ".staging")
    Ann.writeIndexMeta(spark, path + ".staging", iters.toLong)
    Ann.publishStaged(spark, path, Seq("", ".meta"))
  }

  /** g12 probe side: the persisted (node, rank_e9) frame, schema
    * pinned (host keys are strings). Fails loudly on a missing OR
    * schema-drifted index (advice r14): a user-specified schema alone
    * would tolerate missing/renamed columns (Spark null-fills them),
    * and the plan consumers coalesce null rank to 0 — a drifted index
    * would silently produce a zero-rank plan. The footer-inferred
    * schema is validated against the pinned one up front (one driver-
    * side footer read — index reads happen at plan cadence, not per
    * row).
    */
  def readRankIndex(spark: SparkSession, path: String): DataFrame = {
    val actual = spark.read.parquet(path).schema
    val need = Map(
      "node" -> org.apache.spark.sql.types.StringType,
      "rank_e9" -> org.apache.spark.sql.types.LongType)
    val bad = need.collect {
      case (name, t) if !actual.exists(f => f.name == name && f.dataType == t)
        => s"$name $t"
    }
    require(bad.isEmpty,
      s"readRankIndex: '$path' is not a rank index — missing/mistyped " +
        s"column(s) ${bad.mkString(", ")} (found: ${actual.simpleString})")
    spark.read.schema("node STRING, out_w BIGINT, rank_e9 BIGINT")
      .parquet(path)
      .select(col("node"), col("rank_e9"))
  }

  /** Fixed per-sfdir demo rank-index path (Ann.demoIndexPath — one
    * directory reused across runs, Overwrite semantics via the staged
    * publish).
    */
  private[graft] def g12DemoPath(dir: String): String =
    Ann.demoIndexPath("g12", dir)

  /** g12 driver queries: build-then-probe in one call (the s07/s08
    * demo shape — the driver's queries take only (spark, dir)). Each
    * must equal its inline twin row-for-row, so the oracle SQL is the
    * twin's; GraphSpec asserts the equality and that the probe plan
    * carries no PageRank-iteration residue.
    */
  def g12FrontierProbeDemo(spark: SparkSession, dir: String): DataFrame = {
    buildRankIndex(linkEdges(spark, dir), g12DemoPath(dir))
    g07FrontierPlanIndexed(spark, dir, g12DemoPath(dir))
  }

  def g12DiscoveredProbeDemo(spark: SparkSession, dir: String): DataFrame = {
    buildRankIndex(linkEdges(spark, dir), g12DemoPath(dir))
    g09DiscoveredPlanIndexed(spark, dir, g12DemoPath(dir))
  }

  def g12RecrawlProbeDemo(spark: SparkSession, dir: String): DataFrame = {
    buildRankIndex(linkEdges(spark, dir), g12DemoPath(dir))
    g10RecrawlPlanIndexed(spark, dir, g12DemoPath(dir))
  }

  // g12 bench phases: the combined demos above are the correctness
  // entries, but their wall is dominated by the one-off rank build.
  // Bench times the phases separately (name-sort keeps g12_build
  // before every g12_*_probe row): the build row is what a deployment
  // pays per rank REFRESH, the probe rows what every frontier drain
  // pays — the delta against the inline g07/g09/g10 rows is the
  // recompute this index exists to kill.

  /** g12 build phase: write the rank index; 1-row audit. */
  def g12BenchBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    buildRankIndex(linkEdges(spark, dir), g12DemoPath(dir))
    Seq(g12DemoPath(dir)).toDF("index_path")
  }

  def g12BenchProbeG07(spark: SparkSession, dir: String): DataFrame =
    g07FrontierPlanIndexed(spark, dir, g12DemoPath(dir))

  def g12BenchProbeG09(spark: SparkSession, dir: String): DataFrame =
    g09DiscoveredPlanIndexed(spark, dir, g12DemoPath(dir))

  def g12BenchProbeG10(spark: SparkSession, dir: String): DataFrame =
    g10RecrawlPlanIndexed(spark, dir, g12DemoPath(dir))

  // ---------------------------------------------------------------- g13

  /** The g13 robots plant, per distinct demo host: a `*` governance
    * group (so directive extraction provably coexists with rule
    * parsing) plus two sitemap announcements — one same-host INDEX
    * announcement, and one lowercase-field cross-host announcement
    * carrying an inline comment (field-name case-insensitivity,
    * comment stripping, and the scope flag all exercised). Affine in
    * the host index, oracle-rebuildable.
    */
  private[graft] def demoG13Robots(docs: DataFrame): DataFrame =
    docs.select(expr("(doc_id div 5) % 50").as("s")).distinct()
      .select(demoHost(col("s")).as("host"),
        concat(
          lit("User-agent: *\nDisallow: /private\nSitemap: https://site"),
          col("s"),
          lit(".example.com/sitemap_index.xml\nsitemap: https://cdn.example.net/shared/"),
          col("s"), lit(".xml # mirrored copy")).as("body"))

  /** The g13 index plant, per distinct demo host: a sitemaps.org
    * `<sitemapindex>` with five `<sitemap>` children — three fully
    * populated (loc + lastmod, affine in (host, slot)), one with the
    * OPTIONAL lastmod omitted, and one CROSS-HOST decoy the extractor
    * must flag. The wrapper tag name CONTAINS "sitemap", so the block
    * regex's exact-tag match is load-bearing, not decorative.
    */
  private[graft] def demoSitemapIndexes(docs: DataFrame): DataFrame = {
    def child(k: Int): org.apache.spark.sql.Column = {
      val day = expr(s"lpad(cast((s * 3 + $k) % 28 + 1 as string), 2, '0')")
      concat(lit("  <sitemap>\n    <loc>https://site"), col("s"),
        lit(s".example.com/sm/$k.xml</loc>\n    <lastmod>2026-02-"), day,
        lit("</lastmod>\n  </sitemap>\n"))
    }
    docs.select(expr("(doc_id div 5) % 50").as("s")).distinct()
      .select(
        demoHost(col("s")).as("host"),
        concat(
          lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n"),
          child(0), child(1), child(2),
          concat(lit("  <sitemap>\n    <loc>https://site"), col("s"),
            lit(".example.com/sm/3.xml</loc>\n  </sitemap>\n")),
          concat(lit("  <sitemap>\n    <loc>https://site"),
            expr("(s + 1) % 50"),
            lit(".example.com/sm/4.xml</loc>\n  </sitemap>\n")),
          lit("</sitemapindex>\n")).as("xml"))
  }

  /** g13 kernel A over any (host, body) robots frame: every
    * `Sitemap:` directive. RFC 9309 §2.3 + sitemaps.org: the
    * directive is GROUP-INDEPENDENT — it binds to the robots FILE,
    * not to a user-agent group, so no run scoping applies (unlike
    * Allow/Disallow, deliberately); field names match
    * case-insensitively, `#` comments strip, values trim. The
    * announced URL's host yields a same-host scope flag — cross-host
    * announcements are LEGAL per the protocol (cross-submission), but
    * a crawler cross-verifies before trusting them, so they are
    * FLAGGED, never silently kept or dropped (the g08 discipline).
    * Output: (host, ord = the directive's line position, sitemap_url,
    * in_scope). Per-row codegen'd regex; no shuffle.
    */
  def robotsSitemapsOver(robots: DataFrame): DataFrame = {
    val lines = robots
      .select(col("host"),
        posexplode(split(col("body"), "\r?\n")).as(Seq("pos", "raw")))
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("line"))
    val url = trim(regexp_extract(col("line"),
      "(?i)^sitemap\\s*:\\s*(.*)$", 1))
    val urlHost =
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    lines
      .filter(col("line").rlike("(?i)^sitemap\\s*:"))
      .select(col("host"), col("pos").cast("long").as("ord"),
        url.as("sitemap_url"),
        (urlHost === lower(col("host"))).cast("long").as("in_scope"))
  }

  /** g13 kernel B over any (host, xml) frame: sitemaps.org
    * `<sitemapindex>` extraction — the NESTING level above g08's
    * urlsets (the protocol caps one sitemap at 50k URLs / 50 MB, so
    * any large site shards behind an index; discovery must walk
    * index → leaves before g08 can parse a single URL). `(?s)` lazy
    * `<sitemap>` blocks (the exact-tag match must NOT swallow the
    * `<sitemapindex>` wrapper, whose name contains the child tag's),
    * per-block loc + OPTIONAL lastmod ('' when absent), same-host
    * scope flag. Per-row codegen'd regex; no shuffle.
    */
  def sitemapIndexExtractOver(indexes: DataFrame): DataFrame = {
    def field(name: String) = regexp_extract(col("entry"),
      s"<$name>([^<]*)</$name>", 1)
    val locHost = lower(regexp_extract(field("loc"),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    // extra input columns RIDE ALONG (the robotsFlagsOver rule): the
    // sitemap drain's announcement ledger needs each child keyed by
    // the PARENT index's loc, which only the caller knows — callers
    // passing the bare (host, xml) frame see the same output as ever.
    // A carried column shadowing one of the kernel's OUTPUT names
    // (or its internal `entry`) would silently collide — refuse
    // loudly (robotsFlagsOver's clash rule): rename before calling
    // (the drain passes its `loc` as `parent_loc` for exactly this).
    val carry = indexes.columns.filterNot(c => c == "host" || c == "xml")
    val clash = carry.intersect(
      Seq("ord", "entry", "loc", "lastmod", "in_scope"))
    require(clash.isEmpty,
      s"sitemapIndexExtractOver: input column(s) ${clash.mkString(", ")}" +
        " collide with the kernel's outputs — rename them (e.g." +
        " loc -> parent_loc)")
    indexes
      .select((Seq(col("host")) ++ carry.map(col) :+
        posexplode(regexp_extract_all(col("xml"),
          lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)))
          .as(Seq("ord", "entry"))): _*)
      .select((Seq(col("host"), col("ord").cast("long").as("ord"),
        field("loc").as("loc"),
        field("lastmod").as("lastmod"),
        (locHost === lower(col("host"))).cast("long").as("in_scope")) ++
        carry.map(col)): _*)
  }

  /** g13: the discovery BOOTSTRAP composed — where does a crawler get
    * sitemaps FROM? robots.txt announces them (`Sitemap:` directives,
    * kernel A), and announced INDEX files shard into child sitemaps
    * (kernel B); this emits one row per discovered sitemap FILE with
    * its source channel, completing the chain in front of g08 (which
    * parses the leaf urlsets): robots → index → sitemaps → urls →
    * permissions → plan → fetch.
    */
  def g13SitemapDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val fromRobots = robotsSitemapsOver(demoG13Robots(docs))
      .select(col("host"), lit("robots").as("source"), col("ord"),
        col("sitemap_url").as("loc"), lit("").as("lastmod"),
        col("in_scope"))
    val fromIndex = sitemapIndexExtractOver(demoSitemapIndexes(docs))
      .select(col("host"), lit("index").as("source"), col("ord"),
        col("loc"), col("lastmod"), col("in_scope"))
    fromRobots.unionByName(fromIndex)
      .orderBy("host", "source", "ord")
  }

  // ---------------------------------------------------------------- f14

  /** Deterministic in-memory content endpoint for the f14 demo/bench:
    * bytes are an affine function of the URL (64-255 per fetch), so
    * the bench row measures the fetch MACHINERY (partitioning,
    * per-host permits, retry plumbing, FS landing) without network.
    * Content-only — the crawl axis discovers URLs through sitemaps
    * and links, never through a listing walk.
    */
  private[graft] final class DemoContentFetcher
      extends graft.sources.PagedSource.PageFetcher {
    override def listPage(dirId: String, token: Option[String])
        : graft.sources.PagedSource.Page =
      throw new UnsupportedOperationException(
        "f14 demo fetcher serves content only")
    override def open(fileId: String): java.io.InputStream = {
      val h = scala.util.hashing.MurmurHash3.stringHash(fileId)
      val size = 64 + math.floorMod(h, 192)
      new java.io.ByteArrayInputStream(
        Array.tabulate(size)(i => ((h + i * 31) & 0xff).toByte))
    }
  }

  private[graft] def f14DemoRoot(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_f14_${dir.hashCode.toHexString}"

  /** f14 bench, build phase: materialize the crawl PLAN (g09's
    * composed discovery plan) and g11's trap templates once — the
    * fetch row must measure execution, not re-planning (a deployment
    * plans once per frontier drain and fetches from the landed plan).
    * Planning reads the g12 rank INDEX — the production shape
    * (VERDICT r14 #8): rank refresh is a periodic graph job, so this
    * row builds the index once and plans via the indexed probe
    * instead of paying the inline 10-iteration PageRank per plan
    * (f14_build name-sorts before g12_build, so it cannot reuse that
    * row's index — it builds its own, the same one-call publish).
    */
  def f14BenchBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = f14DemoRoot(dir)
    buildRankIndex(linkEdges(spark, dir), g12DemoPath(dir))
    g09DiscoveredPlanIndexed(spark, dir, g12DemoPath(dir))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/plan")
    g11TrapDetect(spark, dir)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/traps")
    Seq(root).toDF("plan_root")
  }

  /** f14 bench, fetch phase: execute the landed plan through
    * [[graft.sources.PagedSource.executeCrawlPlan]] — the recurring
    * per-drain cost of the crawl axis's download half.
    */
  def f14BenchFetch(spark: SparkSession, dir: String): DataFrame = {
    val root = f14DemoRoot(dir)
    graft.sources.PagedSource.executeCrawlPlan(spark,
      new DemoContentFetcher,
      spark.read.parquet(s"$root/plan"),
      spark.read.parquet(s"$root/traps"),
      s"$root/dest").toDF()
  }
}
