package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
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
    // only stages of jobs that STARTED while this collector was
    // attached count — a backlogged listener bus delivering a previous
    // action's task-ends must not bleed into this measurement
    private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val jobsStarted = new AtomicLong
    val jobsEnded = new AtomicLong
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val input = new AtomicLong
    val records = new AtomicLong
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      js.stageIds.foreach(id => stages.add(id))
      jobsStarted.incrementAndGet()
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      jobsEnded.incrementAndGet()
    }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null && stages.contains(te.stageId)) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        input.addAndGet(m.inputMetrics.bytesRead)
        records.addAndGet(m.inputMetrics.recordsRead)
      }
    }
  }

  /** Run `body` (which must trigger exactly the Spark actions to be
    * measured) and return its result with the summed task metrics.
    * Listener events arrive asynchronously; completion is detected by
    * job accounting (every job started during the body must end),
    * bounded at ~10 s — the public-API alternative to the internal
    * listener-bus flush.
    */
  def measure[T](spark: SparkSession)(body: => T): (T, JobMetrics) = {
    val c = new Collector
    spark.sparkContext.addSparkListener(c)
    try {
      val result = body
      var waited = 0
      while ((c.jobsStarted.get() == 0 ||
          c.jobsEnded.get() < c.jobsStarted.get()) && waited < 100) {
        Thread.sleep(100)
        waited += 1
      }
      Thread.sleep(200) // drain task-end events behind the job-end
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
