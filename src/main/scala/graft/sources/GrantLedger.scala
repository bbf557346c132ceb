package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** f04: idempotent permission-grant ledger (SURVEY.md §2.A).
  *
  * The reference checks a site's existing app grants and creates the
  * missing ones, caching name lookups (ref
  * notebook/sharepoint-to-onelake-recursive-copy.py:110-152). Here the
  * same check-then-create becomes a set-difference merge over a ledger
  * table: requested grants are diffed against the ledger in one
  * anti-join (no per-principal RPC loop), and applying the plan twice
  * is a no-op — the idempotence the reference gets from its `already`
  * flag, expressed relationally so it scales to millions of
  * (principal, resource) pairs.
  */
object GrantLedger {

  /** Plan: each requested grant labelled 'create' (absent from the
    * ledger at the required role) or 'already' (present). Dimension-
    * sized request sets broadcast against the big ledger.
    */
  def plan(ledger: DataFrame, requested: DataFrame): DataFrame = {
    val existing = ledger.select(
      col("principal").as("l_principal"), col("resource").as("l_resource"),
      col("role").as("l_role"))
    requested
      .join(existing,
        col("principal") === col("l_principal") &&
          col("resource") === col("l_resource") && col("role") === col("l_role"),
        "left_outer")
      .withColumn("action",
        when(col("l_principal").isNull, "create").otherwise("already"))
      .select("principal", "resource", "role", "action")
  }

  /** Apply: merge the 'create' rows into the ledger (distinct union —
    * replaying an apply cannot duplicate grants).
    */
  def apply(ledger: DataFrame, planned: DataFrame, grantedAt: String): DataFrame = {
    val created = planned.filter(col("action") === "create")
      .select(col("principal"), col("resource"), col("role"),
        lit(grantedAt).as("granted_at"))
    ledger.unionByName(created).dropDuplicates("principal", "resource", "role")
  }

  /** Empty ledger with the canonical schema. */
  def emptyLedger(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String, String)]
      .toDF("principal", "resource", "role", "granted_at")
  }
}
