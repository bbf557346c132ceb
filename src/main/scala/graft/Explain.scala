package graft

/** Plan-inspection entry point: print the formatted physical plan of
  * one (or every) driver query without executing it —
  * `runMain graft.Explain q33_multi_exists [sfDir]`. The habit this
  * encodes: every new operator gets its plan read before it ships.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <query|ALL> [sfDir]; " +
      s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.get()
    val names =
      if (args(0) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else Seq(args(0))
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
