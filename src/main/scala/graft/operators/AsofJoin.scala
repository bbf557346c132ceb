package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (time-travel) join — an operator Spark lacks natively,
  * composed from union + ordered window (preference (a) from the
  * custom-operator ladder: built-ins express the semantics exactly,
  * so no custom SparkPlan is needed).
  *
  * For each left row, attach the latest right row of the same key with
  * right.time <= left.time (DuckDB `ASOF LEFT JOIN` semantics, which is
  * also the oracle). One shuffle on the key — same cost as a regular
  * join; the interleave-and-scan inside each partition is linear, vs
  * the range-join blowup of the naive `l.ts >= r.ts` theta-join.
  */
object AsofJoin {

  /** Generic as-of join. Left/right must share the key column name;
    * right values arrive as `asof_<col>` columns (null where no right
    * row precedes the left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String]): DataFrame = {
    val rv = struct(rightCols.map(col): _*)
    val r2 = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      rv.as("_rv"), lit(0).as("_tag"))
    val rvType = r2.schema("_rv").dataType
    val l2 = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      struct(left.columns.map(col): _*).as("_lv"), lit(1).as("_tag"))
    val unioned = l2.withColumn("_rv", lit(null).cast(rvType))
      .unionByName(r2.withColumn("_lv",
        lit(null).cast(l2.schema("_lv").dataType)))
    // right rows sort before left rows at equal time → inclusive <=
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_last_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val leftOut = left.columns.map(c => col(s"_lv.$c").as(c))
    val rightOut = rightCols.map(c => col(s"_last_rv.$c").as(s"asof_$c"))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** q29: purchase→click attribution — each purchase joined as-of to
    * the same user's most recent prior click. Timestamps leave as
    * strings (engine-portable NTZ serialization, SURVEY.md §4).
    */
  def q29AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    asofJoin(purchases, clicks, "user_id", "ts", "ts",
      rightCols = Seq("event_id", "ts"))
      .select(col("purchase_id"), col("user_id"),
        col("ts").cast("string").as("purchase_ts"),
        col("asof_event_id").as("click_id"),
        col("asof_ts").cast("string").as("click_ts"))
      .orderBy("purchase_id")
  }
}
