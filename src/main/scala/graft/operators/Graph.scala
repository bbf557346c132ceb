package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * The demo graph is a deterministic link plant over the documents
  * table in the d15 style (Dedup.scala d15DemoUrls): each doc's d15
  * group domain `(doc_id div 5) % 50` emits three out-links whose
  * targets are fixed affine functions of (domain, link slot, doc
  * variant), self-links dropped, multi-links collapsing into integer
  * edge weights. Fully SQL-expressible, so the oracle rebuilds the
  * identical graph from the documents table alone.
  */
object Graph {

  /** Rank mass carried in units of 1e-9 (BIGINT end to end). */
  val Scale = 1000000000L

  /** Weighted domain link graph planted over `documents`:
    * (src, dst, w) with w = number of doc-level links. One groupBy
    * shuffle; everything upstream is a narrow projection of the scan.
    */
  private[operators] def demoEdges(docs: DataFrame): DataFrame =
    docs
      .select(expr("(doc_id div 5) % 50").as("src"),
        explode(expr("sequence(1L, 3L)")).as("k"),
        expr("doc_id % 5").as("v"))
      .select(col("src"), expr("(src * 7 + k * 13 + v * 11) % 50").as("dst"))
      .filter(col("dst") =!= col("src"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))

  /** g01: damped PageRank, 10 power iterations, integer fixed-point.
    *
    * Recurrence (all BIGINT; div is truncating integral division —
    * operands are non-negative, so it equals the oracle's floor `//`):
    *   r0(n)   = Scale div N
    *   c(e)    = (r(src) * w(e)) div outw(src)
    *   r'(n)   = (15 * (Scale div N)) div 100
    *             + (85 * Σ_{e into n} c(e)) div 100
    *
    * The 15% teleport mass keeps sinks from draining rank; this graph
    * has no dangling nodes by construction (each domain keeps ≥ 2 of
    * its 3 slots after self-link removal), so no dangling
    * redistribution term is needed — a require() guards the
    * assumption loudly rather than silently leaking mass if the
    * fixture ever changes.
    *
    * Output: (node, out_w, rank_e9) — rank in 1e-9 units, highest
    * first. N is obtained with a driver-side count (one aggregate
    * job over the node frame; a bounded scalar, never a collect of
    * data).
    */
  def g01PageRank(spark: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    val edges = demoEdges(Tables(spark, dir).documents)
      .localCheckpoint(false)
    val outw = edges.groupBy("src").agg(sum("w").as("outw"))
    val adj = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    // dangling guard: every node must carry out-weight, or the
    // recurrence silently leaks its rank mass each iteration
    require(nodes.join(outw, nodes("node") === outw("src"), "left_anti")
      .limit(1).count() == 0L,
      "g01: dangling node (no out-links) — add a redistribution term")
    val n = nodes.count()
    val r0 = Scale / n
    val base = 15L * r0 / 100L
    var ranks = nodes.select(col("node"), lit(r0).as("rank"))
    for (i <- 1 to iters) {
      val inflow = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("(rank * w) div outw").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      ranks = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("rank"))
      if (i % 3 == 0 || i == iters) ranks = ranks.localCheckpoint(false)
    }
    nodes.join(outw.withColumnRenamed("src", "node"), Seq("node"), "left")
      .join(ranks, "node")
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
    * (auth from hubs, then hubs from the fresh auth), plus two scalar
    * normalizer aggregates (driver-side single values, not collects).
    * Overflow: scores ≤ 1e9 and weights are doc counts, so the raw
    * sums stay well inside Long, but the normalization numerator
    * `raw * Scale` can reach ~1e24 at large corpora — it is computed
    * as a DECIMAL(38,0) product with Spark's integral `div` (the
    * oracle mirrors it in HUGEINT), exact at any realistic scale.
    *
    * Output: (node, hub_e9, auth_e9), strongest authorities first.
    */
  def g02Hits(spark: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    val edges = demoEdges(Tables(spark, dir).documents)
      .localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    val s0 = Scale / n
    var hubs = nodes.select(col("node"), lit(s0).as("h"))
    var auths = nodes.select(col("node"), lit(s0).as("a"))
    for (i <- 1 to iters) {
      val aRaw = edges.join(hubs, edges("src") === hubs("node"))
        .select(col("dst"), expr("h * w").as("c"))
        .groupBy("dst").agg(sum("c").as("araw"))
      val aTot = aRaw.agg(sum("araw")).head.getLong(0)
      require(aTot > 0L, "g02: authority mass vanished — empty graph?")
      auths = nodes.join(aRaw, nodes("node") === aRaw("dst"), "left")
        .select(col("node"),
          expr(s"CAST((CAST(coalesce(araw, 0L) AS DECIMAL(38,0)) * ${Scale}L)" +
            s" div ${aTot}L AS BIGINT)").as("a"))
      val hRaw = edges.join(auths, edges("dst") === auths("node"))
        .select(col("src"), expr("a * w").as("c"))
        .groupBy("src").agg(sum("c").as("hraw"))
      val hTot = hRaw.agg(sum("hraw")).head.getLong(0)
      require(hTot > 0L, "g02: hub mass vanished — empty graph?")
      hubs = nodes.join(hRaw, nodes("node") === hRaw("src"), "left")
        .select(col("node"),
          expr(s"CAST((CAST(coalesce(hraw, 0L) AS DECIMAL(38,0)) * ${Scale}L)" +
            s" div ${hTot}L AS BIGINT)").as("h"))
      if (i % 3 == 0 || i == iters) {
        hubs = hubs.localCheckpoint(false)
        auths = auths.localCheckpoint(false)
      }
    }
    nodes.join(hubs, "node").join(auths, "node")
      .select(col("node"), col("h").as("hub_e9"), col("a").as("auth_e9"))
      .orderBy(desc("auth_e9"), col("node"))
  }
}
