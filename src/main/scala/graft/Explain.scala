package graft

/** Plan-inspection entry point: print the formatted physical plan of
  * one (or every) driver query — `runMain graft.Explain
  * q33_multi_exists [sfDir]`. The habit this encodes: every new
  * operator gets its plan read before it ships. Most queries build
  * lazily (no execution before explain); the exceptions are entries
  * whose CONSTRUCTION runs jobs — paged-source enumeration (f07) and
  * IVF centroid training (s04) — so "explaining" those against a live
  * endpoint does real work.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val known = SparkEntry.queries.keys.toSeq.sorted
    require(args.nonEmpty && (args(0) == "ALL" || known.contains(args(0))),
      s"usage: Explain <query|ALL> [sfDir]; queries: ${known.mkString(", ")}")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.get()
    try {
      val names = if (args(0) == "ALL") known else Seq(args(0))
      names.foreach { name =>
        println(s"\n========== $name ==========")
        SparkEntry.queries(name)(spark, dir).explain("formatted")
      }
    } finally spark.stop()
  }
}
