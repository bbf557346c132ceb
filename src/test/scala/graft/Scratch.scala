package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for interactive debugging — not a spec. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def mkLake(tokens: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_scr_$tokens")
      val lake = dir.resolve("lake").toString
      def fatDoc(id: Long) =
        (id, (1 to tokens).map(i => s"w${i}_d$id").mkString(" "))
      graft.streaming.Streams.admitBatch(
        (1L to 400L).map(fatDoc).toDF("doc_id", "text"), lake, batchId = 0L)
      lake
    }
    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }

    for (tokens <- Seq(100, 800)) {
      val lake = mkLake(tokens)
      def fatDoc(id: Long) =
        (id, (1 to tokens).map(i => s"w${i}_d$id").mkString(" "))
      println(s"--- tokens=$tokens  textOnDisk=${dirBytes(s"$lake/batch=0")} " +
        s"shinglesOnDisk=${dirBytes(s"$lake.index/shingles")}")
      val mScan = Instrument.profile(
        spark.read.parquet(s"$lake/batch=0").select("doc_id", "text"))
      println(s"plain text scan: $mScan")
      val (_, mFresh) = Instrument.measure(spark) {
        graft.streaming.Streams.admitBatch(
          (1000L to 1004L).map(fatDoc).toDF("doc_id", "text"), lake, 1L)
      }
      println(s"fresh gate:      $mFresh")
      val (_, mDup) = Instrument.measure(spark) {
        graft.streaming.Streams.admitBatch(
          Seq(5L, 6L, 7L).map(i => (2000L + i, fatDoc(i)._2 + " tail"))
            .toDF("doc_id", "text"), lake, 2L)
      }
      println(s"dup gate:        $mDup")
      val mInline = Instrument.profile(
        graft.operators.Dedup.d11IncrementalDedup(
          (3000L to 3004L).map(fatDoc).toDF("doc_id", "text"),
          spark.read.parquet(lake).select("doc_id", "text")))
      println(s"inline d11:      $mInline")
    }
    spark.stop()
  }
}
