package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: evaluates every output row AND column. count() would
    // let Catalyst prune the projections being measured (column pruning
    // deletes expensive expressions, EliminateSorts drops orderBys), so
    // scan-and-transform queries would be benchmarked with their work
    // optimized away.
    def run(fn: (SparkSession, String) => DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // s07/s08's combined demos (build-then-probe in one call) stay the
    // driver's correctness entries, but as bench rows they'd report a
    // one-off build cost as if it were the per-query cost. Bench
    // replaces them with explicit build/probe phase rows, ordered so
    // each probe hits the index its build row just wrote.
    val phaseSplit = Set("s07_ann_lsh_indexed", "s08_ann_ivf_indexed",
      "d13_indexed_admit", "c17_semantic_decontam_ivf",
      "q28_approx_distinct")
    val phased: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "s07_build" -> ((s, d) => operators.Ann.s07BenchBuild(s, d)),
      "s07_probe" -> ((s, d) => operators.Ann.s07BenchProbe(s, d)),
      "s08_build" -> ((s, d) => operators.Ann.s08BenchBuild(s, d)),
      "s08_probe" -> ((s, d) => operators.Ann.s08BenchProbe(s, d)),
      // name-sort keeps d13_build before d13_gate, so the gate row
      // measures ONLY the recurring per-batch cost of the persisted
      // index — the one-time signature pass has its own row
      "d13_build" -> ((s, d) => operators.Dedup.d13BenchBuild(s, d)),
      "d13_gate" -> ((s, d) => operators.Dedup.d13BenchGate(s, d)),
      // c17's indexed decontamination as its two phases: the one-time
      // benchmark IVF persist, then the recurring nprobe=4 screen —
      // the n_train·√n_bench shape repeated per corpus drop (name-sort
      // keeps build before screen)
      "c17_build" -> ((s, d) => operators.Corpus.c17BenchBuildRow(s, d)),
      "c17_screen" -> ((s, d) => operators.Corpus.c17BenchScreenRow(s, d)),
      // q28's driver entry computes the exact countDistinct NEXT TO the
      // sketch (so the oracle-adjacent spec can bound the error); the
      // bench row times the sketch alone — the 100 TB path
      "q28_approx_distinct" -> ((s, d) => operators.Approx.q28BenchSketch(s, d)),
      // st13's streaming admission measured as its two phases: the
      // one-time lake+index bootstrap, then the recurring per-drain
      // cost (gate + lake landing + index append) — name-sort keeps
      // build before gate
      "st13_build" -> ((s, d) => streaming.Streams.st13BenchBuild(s, d)),
      "st13_gate" -> ((s, d) => streaming.Streams.st13BenchGate(s, d)),
      // the other three stateless admission gates, same build/gate
      // split: the build row is the one-time model/set persist, the
      // gate row the recurring per-drain inference + lake landing
      "st14_build" -> ((s, d) => streaming.Streams.st14BenchBuild(s, d)),
      "st14_gate" -> ((s, d) => streaming.Streams.st14BenchGate(s, d)),
      "st16_build" -> ((s, d) => streaming.Streams.st16BenchBuild(s, d)),
      "st16_gate" -> ((s, d) => streaming.Streams.st16BenchGate(s, d)),
      "st17_build" -> ((s, d) => streaming.Streams.st17BenchBuild(s, d)),
      "st17_gate" -> ((s, d) => streaming.Streams.st17BenchGate(s, d)),
      // st18 is stateless (no trained artifact) — one row, the
      // recurring per-drain scrub cost
      "st18_scrub" -> ((s, d) => streaming.Streams.st18BenchScrub(s, d)),
      // the d06 collision-floor dial measured, not asserted: the
      // 8-bit high-recall opt-in rides the n²/2⁸ random-candidate
      // floor the 16-bit DEFAULT avoids — the row keeps the tradeoff
      // visible round-over-round
      "d06_narrow_bands" -> ((s, d) =>
        operators.Dedup.d06EmbedNeardupDemo(s, d, bands = 8)))
    // name-sorted so round-over-round per-query deltas reflect plan
    // changes, not placement: map-order scheduling once moved a query
    // next to the warm-up slot and its time 3.8×'d with no plan change
    val timed = (SparkEntry.queries.toSeq
      .filterNot { case (name, _) => phaseSplit(name) } ++ phased)
      .sortBy(_._1)
    // JVM/codegen warm-up outside the timed region, so the (sorted)
    // head query doesn't absorb ~5s of JIT + classloading. A warm-up
    // failure is logged by query name (a broken head query must not
    // hide here) — the timed run still reports it in `failed`.
    timed.headOption.foreach { case (name, fn) =>
      try run(fn)
      catch {
        case t: Throwable =>
          System.err.println(s"[bench] warm-up query '$name' failed: $t")
      }
    }
    // failures must be LOUD: round 8 shipped 16 silently-failed rows
    // whose root cause took a judge repro to name. Record the exception
    // class+message per failed row — stderr for the human, an "errors"
    // JSON field for the artifact.
    val results = timed.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { run(fn); None } catch {
        case t: Throwable =>
          System.err.println(s"[bench] query '$name' failed: ${t.getClass.getName}: ${t.getMessage}")
          Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // no cross-query cache credit
      (name, sec, err)
    }
    // elapsed time is recorded for every query — a failure must not
    // corrupt the wall-clock total with a sentinel; failures are
    // reported by name instead. 4-decimal formatting keeps the JSON
    // line compact (a 17-digit double per query once truncated the
    // driver's captured artifact mid-key).
    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(_)) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val errors = results.collect { case (k, _, Some(m)) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"failed":$failed,"errors":$errors,"sf":"$sfDir"}"""
    println(json)
    // the sbt log prefix makes stdout unparseable for the driver; the
    // file copy is the machine-readable record
    Files.writeString(Paths.get("BENCH_LOCAL.json"), json)
    spark.stop()
  }
}
