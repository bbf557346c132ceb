package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Table profiling — the data-quality pass a 100 TB ingestion runs
  * before anything downstream trusts the data. One aggregation job for
  * the whole table (all columns profiled in a single pass, partials
  * merged map-side; approx distinct keeps shuffle O(sketch)).
  */
object Profile {

  /** One profile row per column: nulls, approx distinct, and
    * numeric/string summaries where the type applies.
    */
  def table(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // row count folds into the same aggregate as the per-column stats —
    // genuinely one pass over the table, not count() + agg
    val rowCountAgg = Seq(count(lit(1)).as("__n_rows"))
    val aggs = rowCountAgg ++ df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__dist")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            min(c).cast("double").as(s"${f.name}__min"),
            max(c).cast("double").as(s"${f.name}__max"))
          case StringType => Seq(
            min(length(c)).cast("double").as(s"${f.name}__min"),
            max(length(c)).cast("double").as(s"${f.name}__max"))
          case _ => Seq(
            lit(null).cast("double").as(s"${f.name}__min"),
            lit(null).cast("double").as(s"${f.name}__max"))
        })
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(row.fieldIndex("__n_rows"))
    val profiles = df.schema.fields.map { f =>
      def g(suffix: String): Any = row.get(row.fieldIndex(s"${f.name}__$suffix"))
      (f.name, f.dataType.typeName, n,
        g("nulls").asInstanceOf[Long],
        g("dist").asInstanceOf[Long],
        Option(g("min")).map(_.asInstanceOf[Double]),
        Option(g("max")).map(_.asInstanceOf[Double]))
    }
    profiles.toSeq.toDF(
      "column", "type", "n_rows", "n_nulls", "approx_distinct", "min", "max")
  }
}
