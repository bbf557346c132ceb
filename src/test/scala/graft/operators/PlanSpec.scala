package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Plan-shape assertions (SURVEY.md §5): the properties that decide
  * whether these queries survive a 100 TB scale-up — scan pruning,
  * filter pushdown, broadcast joins, map-side partial aggregation,
  * top-k without a global sort — locked in as tests so a refactor
  * that silently de-optimizes a plan fails CI.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Built once and shared by both global sweeps: CONSTRUCTING some
    * queries runs real side effects (s07/s08 build+persist an index,
    * f07 walks its fixture, c05/s04 collect bounded driver state) —
    * paying them once instead of once per sweep.
    */
  private lazy val allQueryExecutions
      : Seq[(String, org.apache.spark.sql.execution.QueryExecution)] =
    SparkEntry.queries.keys.toSeq.sorted
      .map(n => n -> SparkEntry.queries(n)(spark, dir).queryExecution)

  test("q02: filters and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"))
    assert(p.contains("LessThan(l_quantity,5.0)"))
    // scan reads only the projected + filtered columns, not all 16
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double,l_discount:dou"))
  }

  test("q05: all dimension joins broadcast; no sort-merge join") {
    val p = plan("q05_regional_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"))
  }

  test("q07: per-group top-k gets Partial WindowGroupLimit before the shuffle") {
    // Spark 4's WindowGroupLimit pushes rank<=k into a map-side bounded
    // top-k — which is why graft does NOT ship a custom top-k-per-key
    // operator (custom-plan ladder: compose first; the builtin already
    // plans the optimal shape).
    val p = plan("q07_window_rank")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"))
  }

  test("q16: top-k uses TakeOrderedAndProject, not a global sort") {
    val p = plan("q16_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("q06: scalar agg scan prunes to the 3 needed columns") {
    val p = plan("q06_forecast_revenue")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double>"))
  }

  test("s01: query side is broadcast (no shuffle of the corpus)") {
    val p = plan("s01_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("q17: per-part aggregate input is brand-pruned before the shuffle") {
    val p = plan("q17_avg_compare")
    // both consumers of lineitem — the per-part aggregate branch AND the
    // probe side — must join broadcast(brandParts) first; an unpruned
    // aggregate would show only one p_partkey broadcast join
    assert("BroadcastHashJoin \\[l_partkey".r.findAllIn(p).size >= 2, p)
    // the brand filter reaches the part scan
    assert(p.contains("EqualTo(p_brand,Brand#23)"))
  }

  test("q33: one fact-fact join — each fact table is scanned once") {
    val p = plan("q33_multi_exists")
    // window formulation: lineitem and orders each appear exactly once
    // (the join-back formulation scanned and shuffled them twice)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p)
    assert("orders\\.parquet".r.findAllIn(p).size == 1, p)
  }

  test("s04: cell probe is an equi broadcast join, not a nested loop") {
    val p = plan("s04_ann_ivf")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q52: top-20 rides TakeOrderedAndProject, not a global sort") {
    val p = Relational.q52ReturnedItems(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q51: the part-name filter reaches the part scan") {
    val p = Relational.q51ProductProfit(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(p_name)") ||
      p.contains("Contains(p_name"), s"part filter not pushed:\n$p")
  }

  test("t16: chunking is shuffle-free with a pruned scan") {
    val docs = graft.Tables(spark, dir).documents
    val p = TextOps.chunkSplitOver(docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking shuffled:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("d15: both dedup window passes share ONE hash exchange on canon_url") {
    import spark.implicits._
    val df = Seq((1L, "https://a.com/x"), (2L, "https://a.com/x#f"))
      .toDF("doc_id", "url")
    val p = Dedup.urlDedupOver(df).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(canon_url".r.findAllIn(p).size == 1, p)
  }

  test("c20: the gopher rule suite is shuffle-free with a pruned scan") {
    val docs = graft.Tables(spark, dir).documents
    val p = Corpus.gopherRulesOver(docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"gopher rules shuffled:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t18: the unicode scrub is shuffle-free with a pruned scan") {
    val docs = graft.Tables(spark, dir).documents
    val p = TextOps.unicodeScrubOver(docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unicode scrub shuffled:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t24: block extraction is shuffle-free with a pruned scan") {
    val docs = graft.Tables(spark, dir).documents
    val p = TextOps.t24BlocksOver(TextOps.demoBlockPages(docs))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"t24 shuffled:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t03b: script ID is shuffle-free with a pruned scan") {
    val docs = graft.Tables(spark, dir).documents
    val p = TextOps.scriptIdOver(TextOps.demoScriptDocs(docs))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"t03b shuffled:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("g05: robots extraction is shuffle-free with a pruned scan") {
    val docs = graft.Tables(spark, dir).documents
    val p = Graph.robotsFlagsOver(Graph.demoRobotsDocs(docs))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"g05 shuffled:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q54: both window passes share ONE hash exchange on the entity key") {
    val p = plan("q54_scd2")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
  }

  test("d14: candidate generation is equi-join only — no cartesian") {
    val p = plan("d14_fuzzy_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s16: the tf pass joins the broadcast query terms, not the vocabulary") {
    val p = plan("s16_hybrid_search")
    // the exploded corpus joins the ≤8 query terms via BroadcastHashJoin
    assert("BroadcastHashJoin \\[tok".r.findAllIn(p).nonEmpty, p)
  }

  test("x15: runtime bloom filter prunes the fact side of a selective shuffle join") {
    // thresholds forced in an isolated session (local data is far below
    // the 10 GB application-side default that gates it at real scale)
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val t = graft.Tables(s, dir)
    val selectiveDim = t.orders
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val q = t.lineitem.join(selectiveDim,
      org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_filter") || plan.contains("might_contain"),
      s"no runtime bloom filter in plan:\n$plan")
  }

  test("g09/g10: every window partitions on host or row id — no global window") {
    // the composed crawl plans stack THREE window families (robots
    // argmax per row id, budget running-sum per host, g01's rank
    // windows) — none may be a global (empty-partition) window, or
    // the frontier serializes through one task at scale
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("g09_discovered_plan", "g10_recrawl_plan").foreach { name =>
      val exec = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      val globals = exec.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globals.isEmpty, s"$name has a global window:\n$exec")
    }
  }

  test("global sweep: no forced broadcast hint on an SF-scaling table lineage") {
    // The rule (VERDICT r2 #1): a forced broadcast() bypasses AQE's
    // runtime size check, so it is only ever legal on a side that is
    // bounded at EVERY scale factor — region/nation (fixed 5/25 rows)
    // or a subtree whose cardinality a Limit / grouping-free Aggregate
    // provably caps (q15's 1-row max, s04's nprobe cells). A hint whose
    // lineage reaches customer/supplier/part/orders/lineitem without
    // such a cap is a driver OOM at the 100 TB design point.
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // documents/events/embeddings joined r13: g06/g07's host-granular
    // frames derive from documents and shipped with forced broadcasts
    // the 5-table sweep could not see (VERDICT r12 #3)
    val scaling = Set("customer", "supplier", "part", "orders", "lineitem",
      "documents", "events", "embeddings")
    // Adjudicated hints (the s17/c17 NLJ-sweep precedent): each query
    // below force-broadcasts frames whose cardinality IS bounded at
    // every corpus size, but by a property the plan can't prove —
    // a point lookup on the unique vec_id key, a fixed hash-bucket
    // domain, an eval set that is small by nature, or a bounded batch
    // contract. The WHY and the EXACT hint count are recorded per
    // name: a future change that adds one more unbounded-looking hint
    // inside an adjudicated query raises its count past the budget
    // and fails the sweep — no wholesale per-query blind spot
    // (review r13 #5); removing one fails too, prompting a re-audit.
    val adjudicated: Map[String, (Int, String)] = Map(
      // 1-row query vector: point lookup vec_id = 0 on the unique key
      "s01_ann_bruteforce" -> ((1, "1-row query vector (vec_id point lookup)")),
      "s09_ann_quantized" -> ((1, "1-row query vector (vec_id point lookup)")),
      "s12_ann_filtered" -> ((1, "1-row query vector (vec_id point lookup)")),
      // probe set = Hamming ball of the 1-row query signature
      // (≤ 1 + nBits + C(nBits,2) rows at any corpus size)
      "s02_ann_lsh" -> ((1, "Hamming-ball probe set of the 1-row query sig")),
      // query batch: vec_id < nQueries — bounded by the caller's
      // batch-size argument, same contract as s17's mining batch
      "s03_knn_join" -> ((1, "bounded query batch (vec_id < nQueries)")),
      // s16: 1-row query vector + ≤8 distinct query terms (tf pass,
      // idf pass, vector leg)
      "s16_hybrid_search" -> ((3, "1-row query vector / <=8 query terms")),
      // s17: the docstring's BOUNDED broadcast mining batch X, used
      // in the forward scores, backward-kNN sums, and margin join
      "s17_margin_mining" -> ((3, "bounded mining batch X (caller contract)")),
      // c14 DSIR: per-bucket log-ratio table, hashed feature space
      // caps it at 2^16 rows regardless of corpus size
      "c14_importance_weights" -> ((1, "hash-bucket weight table (<=2^16 rows)")),
      // c17: the benchmark side is small by nature (eval sets are) —
      // the NLJ sweep's own adjudication
      "c17_semantic_decontam" -> ((1, "benchmark eval set, small by nature")),
      // c19: per-metric totals grouped by a FIXED metric-name set,
      // once per compared corpus half
      "c19_drift_report" -> ((1, "per-metric totals (fixed metric domain)")),
      // t22: the 4x1024-cell CMS sketch — groupBy(seed, bucket) with
      // bucket = hash % width caps it at 4096 rows by construction
      "t22_cms_topk" -> ((1, "CMS sketch (<=depth*width = 4096 cells)")))
    val offenders = allQueryExecutions.flatMap { case (name, qe) =>
      val hits = qe.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }.flatMap { h =>
        val leaves = h.child.collectLeaves().flatMap {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation => fs.location.rootPaths.map(_.getName)
            case _ => Nil
          }
          case _ => Nil
        }
        val scalingLeaves = leaves.map(_.stripSuffix(".parquet")).filter(scaling)
        val bounded = h.child.exists {
          case _: GlobalLimit | _: LocalLimit => true
          case a: Aggregate if a.groupingExpressions.isEmpty => true
          case _ => false
        }
        if (scalingLeaves.nonEmpty && !bounded) Some(s"$name -> $scalingLeaves")
        else None
      }
      adjudicated.get(name) match {
        case Some((budget, why)) if hits.length == budget => Nil
        case Some((budget, why)) => Seq(
          s"$name: ${hits.length} uncapped-broadcast hints vs $budget" +
            s" adjudicated ($why) -> $hits")
        case None => hits
      }
    }
    assert(offenders.isEmpty,
      s"forced broadcast on SF-scaling lineage without a cardinality cap: $offenders")
  }

  test("global sweep: no accidental cartesian/nested-loop joins in any query") {
    // these intentionally score all pairs (brute-force baselines) or
    // broadcast a tiny side against a non-equi condition (q44's and
    // q50's 1-row scalar thresholds joined on an inequality); s09's
    // coarse pass is BY DESIGN a linear scan with a 1-row broadcast
    // query — scalar quantization shrinks what the scan reads, not
    // which rows it touches (IVF composes for that):
    val allowedNlj = Set(
      "s01_ann_bruteforce", "s02_ann_lsh", "s03_knn_join",
      "d05_embed_neardup", "q44_no_order_rich", "s09_ann_quantized",
      "q50_revenue_concentration",
      // s12 is s01's intentional scan with the label pre-filter: the
      // 1-row query side broadcasts against the filtered corpus
      "s12_ann_filtered",
      // s16's vector leg is s01's baseline shape (1-row query vector
      // broadcast against the corpus scan); the BM25 leg is all
      // equi-joins — the indexed ANN probes swap in at scale
      "s16_hybrid_search",
      // c17 is the decontamination gate: the benchmark side is small
      // by nature (eval sets are) and broadcasts whole against a
      // by-design-linear scan of the train side — s01's baseline
      // shape; IVF/banding compose in front when the benchmark grows
      "c17_semantic_decontam",
      // c22 broadcasts its 1-row corpus-total aggregate back onto the
      // |domains|-row rollup (q44/q50's scalar-threshold shape)
      "c22_domain_mixture",
      // s17 scores a BOUNDED broadcast mining batch X against one
      // linear pass over Y (s01's baseline shape); the backward-kNN
      // sums in the margin denominator need the full X×Y score
      // matrix, so the dense pass IS the algorithm for a mining
      // batch — at 100 TB the batch stays bounded and the indexed
      // s05/s06 retrievers pre-narrow Y, not X
      "s17_margin_mining",
      // g02 folds its L1 normalizer in as a broadcast 1-row global
      // aggregate crossJoined onto the node frame (q44/q50's
      // scalar-threshold shape) instead of a per-iteration driver
      // .head sync
      "g02_hits",
      // g01's dangling-mass total rides the same shape: one broadcast
      // 1-row aggregate crossJoined per iteration — the alternative
      // is a driver-blocking scalar action every round
      "g01_pagerank",
      // g07 composes g01's iterations (its authority input), so the
      // same dangling-mass crossJoin appears in its plan — and
      // g09/g10 compose g07's plan window in turn
      "g07_frontier_plan", "g09_discovered_plan", "g10_recrawl_plan")
    val offenders = allQueryExecutions.flatMap { case (name, qe) =>
      val p = qe.executedPlan.toString
      val bad =
        (p.contains("CartesianProduct") ||
          (p.contains("BroadcastNestedLoopJoin") && !allowedNlj(name)))
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"unexpected NLJ/cartesian in: $offenders")
  }
}
