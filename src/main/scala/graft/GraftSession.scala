package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the graft engine.
  *
  * Local testing runs `local[32]`; the settings below are the ones that
  * also matter on a 1000-executor cluster: AQE (runtime re-plan, skew
  * join splitting, partition coalescing) and a shuffle partition count
  * sized to the executor parallelism rather than Spark's default 200.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: String = "32"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // runtime bloom-filter semi-join reduction: when a selective dim
      // filter survives into a SHUFFLE join (too big to broadcast), the
      // fact side is pre-filtered by a bloom filter built from the dim
      // keys — at 100 TB this is the difference between shuffling the
      // whole fact table and shuffling the ~matching fraction. This is
      // Spark's default since 3.4 — set here as a PIN against default
      // drift (the engine's plans count on it; x15 spec asserts the
      // injection). Size thresholds keep Spark's defaults (10 MB
      // creation side / 10 GB application side), which only engage at
      // real scale.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
