package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only data scaler: writes a `factor`× copy of an sf directory
  * as the union of key-offset copies, preserving referential integrity
  * (each copy's foreign keys shift by the same per-table offset) and
  * keeping the fixed dimension tables (region, nation) single.
  *
  * Copy semantics for the LLM-pipeline tables keep per-copy structure
  * instead of mass-duplicating content: document tokens are tagged
  * with the copy index (so cross-copy similarity is zero and dedup
  * densities scale LINEARLY, matching how a real corpus grows), and
  * embeddings get a deterministic per-copy perturbation large enough
  * to stay below near-dup thresholds. The scaled `events.ts` column
  * round-trips through whatever physical type the source era uses
  * (LONG epoch-nanos under nanosAsLong, or TIMESTAMP_NTZ micros) —
  * the schema-adaptive `Tables.events` reads either encoding.
  *
  * Usage: runMain graft.ScaleData <srcDir> <dstDir> <factor>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dstDir/$t.parquet")
    def keySpan(t: String, c: String): Long =
      rd(t).agg(max(col(c))).head().getLong(0) + 1

    Seq("region", "nation").foreach(t => wr(rd(t), t))

    val oc = keySpan("customer", "c_custkey")
    val os = keySpan("supplier", "s_suppkey")
    val op = keySpan("part", "p_partkey")
    val oo = keySpan("orders", "o_orderkey")
    val oe = keySpan("events", "event_id")
    val ou = keySpan("events", "user_id")
    val od = keySpan("documents", "doc_id")
    val ov = keySpan("embeddings", "vec_id")

    def scaled(t: String, offsets: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = rd(t)
      val copies = (0 until factor).map { i =>
        val shifted = offsets.foldLeft(base) { case (df, (k, o)) =>
          df.withColumn(k, col(k) + lit(o * i))
        }
        extra(shifted, i)
      }
      wr(copies.reduce(_ unionByName _), t)
    }

    scaled("customer", Map("c_custkey" -> oc))
    scaled("supplier", Map("s_suppkey" -> os))
    scaled("part", Map("p_partkey" -> op))
    scaled("orders", Map("o_orderkey" -> oo, "o_custkey" -> oc))
    scaled("lineitem",
      Map("l_orderkey" -> oo, "l_partkey" -> op, "l_suppkey" -> os))
    scaled("events", Map("event_id" -> oe, "user_id" -> ou))
    scaled("documents", Map("doc_id" -> od), (df, i) =>
      if (i == 0) df
      else df.withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_c$i"))), " ")))
    // per-element HASH noise (xxhash64 of (vec_id, dim, copy) mapped
    // to [-1, 1]): perturbations must be mutually UNCORRELATED across
    // vectors or the noise term dominates every pairwise dot product
    // and whole copies become mutually near-dup — a quadratic answer
    // set no real corpus has (a per-copy constant offset and even a
    // same-frequency sinusoid family both failed this way, sending
    // the d06 bench to minutes on artifact pairs). Independent hash
    // noise keeps cross- and within-copy similarity at the base
    // corpus's level, so dedup densities scale linearly.
    scaled("embeddings", Map("vec_id" -> ov), (df, i) =>
      if (i == 0) df
      else df.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x + (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(2001L))
            .cast("double") / 1000.0 - 1.0).cast("float")).cast("float"))))

    println(s"scaled $srcDir x$factor -> $dstDir")
    spark.stop()
  }
}
