package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job wall-clock profiler for one declared query (guide §1:
  * measure first). The bench's x11 listener answers "how many bytes
  * moved"; this answers the complementary fixed-cost question — HOW
  * MANY jobs/stages/tasks a query schedules and where the wall time
  * sits — which is the dominant term for the iterative graph/stream
  * rows whose data is tiny (sf0.1 graph rows move < 1 MB but schedule
  * dozens of jobs).
  *
  *   runMain graft.ProfileQuery <query> [sfDir] [reps]
  *
  * Uses the same session shape as graft.Bench (master/local[$CPUS],
  * shuffle partitions, UTC, noop sink) so numbers are comparable.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <query> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      graft.Bench.phasedRows.toMap.getOrElse(name,
        sys.error(s"unknown query '$name'")))
    val jobStart = new ConcurrentHashMap[Int, Long]()
    val jobWall = new ConcurrentHashMap[Int, Long]()
    val jobStages = new ConcurrentHashMap[Int, Int]()
    val jobDesc = new ConcurrentHashMap[Int, String]()
    val stageTasks = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, System.nanoTime())
        jobStages.put(js.jobId, js.stageIds.size)
        val d = if (js.properties == null) "" else {
          val cs = js.properties.getProperty("callSite.short", "")
          val sd = js.properties.getProperty("spark.job.description", "")
          if (sd != null && sd.nonEmpty) sd.take(90) else cs
        }
        jobDesc.put(js.jobId, if (d == null) "" else d.take(90))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = jobStart.get(je.jobId)
        if (s != 0L) jobWall.put(je.jobId, System.nanoTime() - s)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageTasks.addAndGet(sc.stageInfo.numTasks.toLong)
    }
    // warm-up rep outside the listener so JIT/classloading noise does
    // not masquerade as job cost (the bench does the same)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    (1 to reps).foreach { rep =>
      jobStart.clear(); jobWall.clear(); jobStages.clear(); stageTasks.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the bus drain
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      import scala.jdk.CollectionConverters._
      val jobs = jobWall.asScala.toSeq.sortBy(_._1)
      val totJob = jobs.map(_._2).sum / 1e9
      println(f"[profile] $name rep $rep: wall=$wall%.3fs jobs=${jobs.size} " +
        f"stages=${jobStages.asScala.values.sum} tasks=${stageTasks.get} " +
        f"sum(job walls)=$totJob%.3fs gap=${wall - totJob}%.3fs")
      jobs.foreach { case (id, ns) =>
        println(f"[profile]   job $id%4d ${ns / 1e9}%7.3fs " +
          f"stages=${jobStages.get(id)} ${jobDesc.getOrDefault(id, "")}")
      }
    }
    spark.stop()
  }
}
