package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface parity: register the graft tables as temp views so the
  * whole engine is usable from plain `spark.sql` — every DataFrame
  * operator in [[SparkEntry.queries]] has the same semantics when the
  * user writes SQL against these views, plus the registered native
  * functions (cosine_sim, dot_product, simhash64, fingerprint64,
  * srp_sig64, shingle_hashes64, minhash_sig_text, marker_count — see
  * [[graft.functions.ExprRegistrations]]).
  */
object GraftCatalog {
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every table in `dir` as a temp view named after it.
    *
    * Registration is per-view fault-isolated: one table whose loader
    * throws (e.g. a physical-type drift in the testdata, round 8's
    * events breakage) must cost queries against THAT view only, not
    * abort registration of the other nine — a single eager loop here
    * once turned one bad table into 50 red SqlParitySpec legs. Failures
    * are loud (stderr) and returned so callers can assert on them.
    */
  def register(spark: SparkSession, dir: String): Seq[(String, Throwable)] = {
    val t = Tables(spark, dir)
    val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> (() => t.region), "nation" -> (() => t.nation),
      "customer" -> (() => t.customer), "supplier" -> (() => t.supplier),
      "part" -> (() => t.part), "orders" -> (() => t.orders),
      "lineitem" -> (() => t.lineitem), "events" -> (() => t.events),
      "documents" -> (() => t.documents), "embeddings" -> (() => t.embeddings))
    loaders.flatMap { case (name, load) =>
      // NonFatal only: an OOM/LinkageError means the JVM itself is
      // compromised — swallowing it and registering the remaining
      // views would report a corrupt session as nine healthy tables
      try { load().createOrReplaceTempView(name); None }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[catalog] view '$name' failed to register: ${e.getClass.getName}: ${e.getMessage}")
        // drop any PREVIOUS registration of this name: a stale view
        // silently serving the old snapshot's rows is worse than a
        // missing view that fails the query loudly
        spark.catalog.dropTempView(name)
        Some(name -> e)
      }
    }
  }
}
