package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Salting must change partitioning only — results stay identical to
  * the unsalted plans.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    // isolated session: tiny skew thresholds must not leak into other
    // suites (newSession shares the context but not the SQLConf)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    // one hot key carrying ~90% of rows, long payloads to cross the
    // byte thresholds, plus a uniform tail
    val fact = s.range(0, 60000)
      .select(when(col("id") < 54000, 0L).otherwise(col("id")).as("k"),
        concat(lit("x"), col("id").cast("string"),
          lit("padpadpadpadpadpadpadpad")).as("payload"))
    val dim = s.range(0, 60000).select(col("id").as("k"),
      (col("id") % 100).as("grp"))
    val joined = fact.join(dim, Seq("k"))
    // collect() executes joined's own QueryExecution, finalizing ITS
    // adaptive plan (count() would plan a separate query)
    assert(joined.collect().length == 60000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n$plan")
  }

  test("salted join equals plain join (multiplicity preserved)") {
    val t = Tables(spark, dir)
    val fact = t.lineitem.select("l_orderkey", "l_quantity")
    val build = t.orders.select("o_orderkey", "o_orderpriority")
    val plain = fact.join(build, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(fact, build, "l_orderkey", "o_orderkey", salts = 7)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val t = Tables(spark, dir)
    val df = t.lineitem.select(col("l_returnflag"),
      col("l_quantity").cast("long").as("q"))
    val direct = df.groupBy("l_returnflag")
      .agg(sum("q").as("sq"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, "l_returnflag", salts = 5,
        phase1 = Seq(sum("q").as("ps"), count(lit(1)).as("pn")),
        phase2 = Seq(sum("ps").as("sq"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
