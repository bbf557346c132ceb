package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** x11: job instrumentation — "measure, don't guess" as a library
  * surface. Tuning a 100 TB job is a shuffle-and-spill accounting
  * problem; this captures the cluster-wide task metrics for exactly
  * one action so plan changes can be judged by bytes moved, not
  * eyeballed. (The SQL UI shows the same numbers; this makes them
  * programmatic — assertable in CI, loggable per pipeline stage.)
  */
object Instrument {

  /** Cluster-wide totals for the measured action. */
  final case class JobMetrics(
      shuffleReadBytes: Long, shuffleWriteBytes: Long,
      memorySpillBytes: Long, diskSpillBytes: Long,
      inputReadBytes: Long, recordsRead: Long)

  private final class Collector extends SparkListener {
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val input = new AtomicLong
    val records = new AtomicLong
    val tasks = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        input.addAndGet(m.inputMetrics.bytesRead)
        records.addAndGet(m.inputMetrics.recordsRead)
        tasks.incrementAndGet()
      }
    }
  }

  /** Run `body` (which must trigger exactly the Spark actions to be
    * measured) and return its result with the summed task metrics.
    * Listener events are delivered asynchronously, so after the action
    * returns we poll until the counters go quiet (bounded at ~2 s) —
    * the public-API alternative to the internal listener-bus flush.
    */
  def measure[T](spark: SparkSession)(body: => T): (T, JobMetrics) = {
    val c = new Collector
    spark.sparkContext.addSparkListener(c)
    try {
      val result = body
      var prev = -1L
      var settled = 0
      var waited = 0
      while (settled < 2 && waited < 20) {
        Thread.sleep(100)
        val now = c.tasks.get()
        if (now == prev) settled += 1 else settled = 0
        prev = now
        waited += 1
      }
      (result, JobMetrics(
        c.shuffleRead.get(), c.shuffleWrite.get(),
        c.memSpill.get(), c.diskSpill.get(),
        c.input.get(), c.records.get()))
    } finally spark.sparkContext.removeSparkListener(c)
  }

  /** Measure one DataFrame's full evaluation through the noop sink
    * (every row and column materialized, nothing cached away).
    */
  def profile(df: DataFrame): JobMetrics =
    measure(df.sparkSession) {
      df.write.format("noop").mode("overwrite").save()
    }._2
}
