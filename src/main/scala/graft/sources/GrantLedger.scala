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

  /** Apply: merge the 'create' rows into the ledger. New rows are
    * anti-joined against the ledger FIRST, so a replayed apply (an
    * at-least-once orchestrator re-running the same plan with a
    * later grantedAt) is a true no-op — the original row and its
    * audit timestamp survive. A bare union+dropDuplicates would keep
    * an ARBITRARY row per key, nondeterministically rewriting
    * granted_at on every replay. The trailing dropDuplicates only
    * guards duplicate rows WITHIN one planned frame (all carrying
    * this call's grantedAt, so the pick is value-deterministic).
    */
  def apply(ledger: DataFrame, planned: DataFrame, grantedAt: String): DataFrame = {
    val created = planned.filter(col("action") === "create")
      .select(col("principal"), col("resource"), col("role"),
        lit(grantedAt).as("granted_at"))
      .join(ledger.select("principal", "resource", "role"),
        Seq("principal", "resource", "role"), "left_anti")
    ledger.unionByName(created).dropDuplicates("principal", "resource", "role")
  }

  /** Empty ledger with the canonical schema. */
  def emptyLedger(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String, String)]
      .toDF("principal", "resource", "role", "granted_at")
  }

  /** Principal display-name lookup contract (ref
    * notebook/sharepoint-to-onelake-recursive-copy.py:80-107
    * `resolve_app_name`): two directories tried in order — the
    * service-principal enrollment first, then the application
    * registration — so a caller can plug any identity backend (an
    * HTTP directory, an LDAP mirror, a parquet snapshot) behind the
    * same fallback semantics.
    */
  trait NameResolver extends Serializable {
    /** Display name from the service-principal directory, if enrolled. */
    def servicePrincipalName(principal: String): Option[String]
    /** Display name from the application registry, if registered. */
    def applicationName(principal: String): Option[String]
  }

  /** Per-JVM resolved-name cache (the reference's APP_NAME_CACHE):
    * every principal is resolved AT MOST ONCE per process, whatever
    * the row count — including negative results, which cache the
    * caller's default exactly as the reference does.
    */
  private val nameCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Resolve one principal through the cache: service principal, then
    * application, then the caller's default — and a resolver that
    * THROWS also falls back to the default (the reference's bare
    * `except: pass`; a name lookup must never fail a grant run).
    */
  def resolveName(resolver: NameResolver, principal: String,
      default: String): String =
    nameCache.computeIfAbsent(principal, _ =>
      try resolver.servicePrincipalName(principal)
        .orElse(resolver.applicationName(principal))
        .getOrElse(default)
      catch { case _: Exception => default })

  /** Test seam / tenant switch: forget cached names. */
  def clearNameCache(): Unit = nameCache.clear()

  /** Annotate grant rows (ledger, plan, or request shapes — anything
    * with a `principal` column) with resolved display names. The
    * DISTINCT principals are dimension-sized by contract, so they
    * resolve DRIVER-SIDE through the cache — one lookup per unknown
    * principal, never an RPC per row — and broadcast back onto the
    * rows. `default` derives the fallback label from the principal id
    * (the reference passes a human hint; id-as-name is the neutral
    * default).
    */
  def withNames(rows: DataFrame, resolver: NameResolver,
      default: String => String = identity): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val principals = rows.select("principal").distinct()
      .collect().map(_.getString(0))
    val named = principals
      .map(p => (p, resolveName(resolver, p, default(p)))).toSeq
      .toDF("principal", "display_name")
    rows.join(broadcast(named), Seq("principal"), "left")
  }
}
