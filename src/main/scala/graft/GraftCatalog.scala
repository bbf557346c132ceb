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

  /** Register every table in `dir` as a temp view named after it. */
  def register(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    t.region.createOrReplaceTempView("region")
    t.nation.createOrReplaceTempView("nation")
    t.customer.createOrReplaceTempView("customer")
    t.supplier.createOrReplaceTempView("supplier")
    t.part.createOrReplaceTempView("part")
    t.orders.createOrReplaceTempView("orders")
    t.lineitem.createOrReplaceTempView("lineitem")
    t.events.createOrReplaceTempView("events")
    t.documents.createOrReplaceTempView("documents")
    t.embeddings.createOrReplaceTempView("embeddings")
  }
}
