package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlanInfo
import org.apache.spark.sql.execution.ui.{SparkListenerDriverAccumUpdates, SparkListenerSQLAdaptiveExecutionUpdate, SparkListenerSQLExecutionStart}

/** x11: job instrumentation — "measure, don't guess" as a library
  * surface. Tuning a 100 TB job is a shuffle-and-spill accounting
  * problem; this captures the cluster-wide task metrics for exactly
  * one action so plan changes can be judged by bytes moved, not
  * eyeballed. (The SQL UI shows the same numbers; this makes them
  * programmatic — assertable in CI, loggable per pipeline stage.)
  */
object Instrument {

  /** Cluster-wide totals for the measured action.
    *
    * `scanSelectedBytes`/`scanSelectedFiles` sum the file-source scan
    * nodes' "size of files read"/"number of files read" SQL metrics —
    * the on-disk bytes the scans SELECTED after partition/bucket
    * pruning. This is the metric that proves pruning claims:
    * `inputReadBytes` (Hadoop FS statistics) misses parquet data-page
    * IO on the local filesystem (ByteBuffer/positioned reads bypass
    * the statistics wrapper), so it tracks per-file overhead, not
    * data volume — a full scan of a 688 KB table reports ~14 KB.
    */
  final case class JobMetrics(
      shuffleReadBytes: Long, shuffleWriteBytes: Long,
      memorySpillBytes: Long, diskSpillBytes: Long,
      inputReadBytes: Long, recordsRead: Long,
      scanSelectedBytes: Long, scanSelectedFiles: Long)

  /** Local-property key marking the drain-barrier sentinel job so the
    * collector can recognize (and exclude) it.
    */
  private val SentinelKey = "graft.instrument.sentinel"

  private final class Collector extends SparkListener {
    // only stages of jobs that STARTED while this collector was
    // attached count — a backlogged listener bus delivering a previous
    // action's task-ends must not bleed into this measurement
    private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    private val sentinelJobs = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    @volatile var sentinelEnded = false
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val input = new AtomicLong
    val records = new AtomicLong
    // scan-node SQL metric accumulator ids, harvested from execution
    // plan-info events; their driver-side updates carry the
    // post-pruning selected file bytes/counts
    private val scanBytesIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    private val scanFilesIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val scanBytes = new AtomicLong
    val scanFiles = new AtomicLong
    private def harvest(info: SparkPlanInfo): Unit = {
      info.metrics.foreach { m =>
        if (m.name == "size of files read") scanBytesIds.add(m.accumulatorId)
        else if (m.name == "number of files read") scanFilesIds.add(m.accumulatorId)
      }
      info.children.foreach(harvest)
    }
    override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
      case s: SparkListenerSQLExecutionStart => harvest(s.sparkPlanInfo)
      case u: SparkListenerSQLAdaptiveExecutionUpdate => harvest(u.sparkPlanInfo)
      case d: SparkListenerDriverAccumUpdates =>
        d.accumUpdates.foreach { case (id, v) =>
          if (scanBytesIds.contains(id)) scanBytes.addAndGet(v)
          else if (scanFilesIds.contains(id)) scanFiles.addAndGet(v)
        }
      case _ =>
    }
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val isSentinel = js.properties != null &&
        js.properties.getProperty(SentinelKey) == "1"
      if (isSentinel) sentinelJobs.add(js.jobId)
      else js.stageIds.foreach(id => stages.add(id))
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      if (sentinelJobs.contains(je.jobId)) sentinelEnded = true
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
    *
    * Listener events arrive asynchronously, and a multi-job body can
    * leave late jobs' task-end events on the bus after any
    * job-started/job-ended count balance (the counts also balance on
    * every prefix of the body's jobs). Completion is therefore
    * detected by a sentinel barrier: after the body returns — all its
    * actions are blocking, so every event it produced has already been
    * POSTED to the listener bus — we submit one marked empty job. The
    * bus is FIFO per listener, so once the sentinel's job-end is
    * observed, everything the body posted has been delivered. The
    * sentinel's own stages are excluded from the sums via the marker
    * property, and the wait is bounded at ~10 s.
    */
  def measure[T](spark: SparkSession)(body: => T): (T, JobMetrics) = {
    val c = new Collector
    val sc = spark.sparkContext
    sc.addSparkListener(c)
    try {
      val result = body
      sc.setLocalProperty(SentinelKey, "1")
      try sc.parallelize(Seq.empty[Int], 1).count()
      finally sc.setLocalProperty(SentinelKey, null)
      var waited = 0
      while (!c.sentinelEnded && waited < 1000) {
        Thread.sleep(10)
        waited += 1
      }
      (result, JobMetrics(
        c.shuffleRead.get(), c.shuffleWrite.get(),
        c.memSpill.get(), c.diskSpill.get(),
        c.input.get(), c.records.get(),
        c.scanBytes.get(), c.scanFiles.get()))
    } finally sc.removeSparkListener(c)
  }

  /** Measure one DataFrame's full evaluation through the noop sink
    * (every row and column materialized, nothing cached away).
    *
    * `df` is by-name on purpose: operators that checkpoint an
    * intermediate (even lazily) force `queryExecution.toRdd` during
    * plan CONSTRUCTION, and under AQE that executes every upstream
    * query stage — real scan and shuffle jobs — before any action on
    * the returned Dataset. Evaluating the expression inside the
    * measured window keeps those construction-time jobs in the sums.
    */
  def profile(df: => DataFrame): JobMetrics = {
    val spark = SparkSession.active
    measure(spark) {
      df.write.format("noop").mode("overwrite").save()
    }._2
  }
}
