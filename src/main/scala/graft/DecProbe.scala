package graft
import org.apache.spark.sql.functions._
import graft.functions.Num._
object DecProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("decprobe", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")
    val df = t.lineitem
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "O")
      .agg(sum(revenueExpr).as("dec_sum"))
    df.printSchema()
    val v = df.head.getDecimal(0)
    println("DECIMAL VALUE: " + v.toPlainString)
    println("AS DOUBLE: " + v.doubleValue)
    spark.stop()
  }
}
