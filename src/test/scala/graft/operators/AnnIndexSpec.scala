package graft.operators

import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Persisted ANN indexes (VERDICT r2 #2): the bucket-once/probe-pruned
  * posture must be REAL — the probe plan prunes partitions at the
  * listing step, and the indexed answer equals the inline one.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  private def queryVec(): Array[Float] = {
    val r = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0).select("embedding").head
    r.getSeq[Float](0).toArray
  }

  private def corpus() = spark.read.parquet(s"$dir/embeddings.parquet")
    .filter(col("vec_id") =!= 0)
    .select("vec_id", "embedding")

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    s"$d/index"
  }

  /** Plant a garbage (unreadable-as-parquet) file inside every
    * partition directory NOT in `probed`: if the scan prunes at the
    * directory level the query never opens them; a plan that reads all
    * partitions fails loudly instead of silently scanning everything.
    */
  private def poisonUnprobed(indexPath: String, partCol: String,
      probed: Set[Long]): Int = {
    val root: JPath = Paths.get(indexPath)
    val unprobed = Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(s"$partCol="))
      .filter(p => !probed.contains(
        p.getFileName.toString.stripPrefix(s"$partCol=").toLong))
      .toList
    unprobed.foreach { d =>
      Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(f => Files.write(f, "not parquet".getBytes))
    }
    unprobed.size
  }

  test("s07 indexed LSH probe prunes partitions and equals inline s02") {
    val path = tmp("lsh_index")
    Ann.buildLshIndex(corpus(), path)
    val qv = queryVec()
    val probe = Ann.s07AnnLshIndexed(spark, path, qv, k = 10)

    // 1. the probe set is a partition filter, visible in the plan
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert("PartitionFilters: \\[[^\\]]*sig".r.findFirstIn(plan).isDefined, plan)

    // 2. behavioral pruning proof: poison every unprobed sig= directory;
    // a scan that touches them now throws
    val inline = Ann.s02AnnLsh(spark, dir, k = 10).collect()
    val sigDirs = Files.list(Paths.get(path)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("sig=")).size
    // recompute the probe set with the operator's OWN helper, so the
    // poison set can never drift from what s07 actually probes
    import spark.implicits._
    val qsig = Seq(qv).toDF("embedding")
      .select(Ann.srpSignature(col("embedding"), 8, 64)).head.getLong(0)
    val probes = Ann.hamming2ProbesLocal(qsig, 8).toSet
    val poisoned = poisonUnprobed(path, "sig", probes)
    assert(poisoned > 0, s"test vacuous: all $sigDirs partitions probed")
    val got = Ann.s07AnnLshIndexed(spark, path, qv, k = 10).collect()

    // 3. the indexed answer IS the inline s02 answer
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      inline.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("s08 indexed IVF probe prunes cells and equals inline s04") {
    val path = tmp("ivf_index")
    val cents = Ann.buildIvfIndex(corpus(), path, nlist = 16)
    assert(cents.length == 16)
    val qv = queryVec()
    val probe = Ann.s08AnnIvfIndexed(spark, path, qv, k = 10, nprobe = 4)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan)

    val inline = Ann.s04AnnIvf(spark, dir, k = 10, nlist = 16, nprobe = 4)
      .collect()

    // behavioral pruning proof: read the probe's own cells from its
    // plan literals is fragile; instead poison everything except the
    // 4 best cells computed the same way the operator computes them
    val stored = spark.read.parquet(path + ".centroids")
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cells = stored.map { case (cl, c) => (cl, Ann.dotLocal(qv, c)) }
      .sortBy { case (cl, sc) => (-sc, cl) }.take(4).map(_._1).toSet
    val poisoned = poisonUnprobed(path, "cell", cells)
    assert(poisoned > 0, "test vacuous: all cells probed")
    val got = Ann.s08AnnIvfIndexed(spark, path, qv, k = 10, nprobe = 4)
      .collect()

    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      inline.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("bench phase split: probe-after-build equals the combined demos") {
    // Bench replaces the combined s07/s08 rows with build/probe phase
    // rows; the split must not change the answer — probe against the
    // build phase's index == the one-call demo.
    val s07Combined = Ann.s07AnnLshIndexedDemo(spark, dir).collect().toSeq
    Ann.s07BenchBuild(spark, dir)
    val s07Split = Ann.s07BenchProbe(spark, dir).collect().toSeq
    assert(s07Split == s07Combined)

    val s08Combined = Ann.s08AnnIvfIndexedDemo(spark, dir).collect().toSeq
    Ann.s08BenchBuild(spark, dir)
    val s08Split = Ann.s08BenchProbe(spark, dir).collect().toSeq
    assert(s08Split == s08Combined)
  }

  test("s06 IVF kNN join recalls most exact s03 neighbors, ranked per query") {
    val exact = Ann.s03KnnJoin(spark, dir, k = 5, nQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.s06KnnJoinIvf(spark, dir, k = 5, nQueries = 10)
      .collect()
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    // 4 of 16 cells probed per query = 25% of the corpus; the quantizer
    // must beat random-fraction recall decisively
    assert(recall >= 0.4, s"recall $recall too low for a 25% probe")
    approx.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length <= 5)
      val sims = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }
}
