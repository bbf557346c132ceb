package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

/** Regression shield for the events `ts` physical-type drift: the driver's
  * testdata generator has shipped `ts` both as parquet TIMESTAMP(NANOS)
  * (surfaced by Spark only as LONG under `legacy.parquet.nanosAsLong`) and
  * as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read natively as
  * TIMESTAMP_NTZ). `Tables.events` must load EVERY era without edits —
  * round 8 lost 16 queries and 56 tests to a hard-coded assumption here.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // one logical dataset, written in each physical flavor the loader must
  // survive: epoch-nanos LONG (what nanosAsLong surfaces), TIMESTAMP_NTZ
  // (the current micros era), and zoned TIMESTAMP (a plausible future drift)
  private val micros = Seq(1704153600000000L, 1704240000000000L) // 2024-01-02, -03 UTC

  private def loadVariant(writeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_era").toString
    val base = micros.toDF("ts_us")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("view"))
    writeTs(base).drop("ts_us").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables(spark, dir).events
    assert(got.schema("ts").dataType == TimestampNTZType,
      s"ts must normalize to TIMESTAMP_NTZ, got ${got.schema("ts").dataType}")
    val back = got.select(unix_micros(col("ts").cast("timestamp")))
      .as[Long].collect().sorted
    assert(back.toSeq == micros, s"timestamp values corrupted: ${back.toSeq}")
  }

  test("events loads the nanos-era file (ts read as LONG epoch-nanos)") {
    loadVariant(df => df.withColumn("ts", col("ts_us") * 1000L))
  }

  test("events loads the micros-era file (ts read as TIMESTAMP_NTZ)") {
    loadVariant(df => df.withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz")))
  }

  test("events loads a zoned-TIMESTAMP file (normalized to NTZ)") {
    loadVariant(df => df.withColumn("ts", timestamp_micros(col("ts_us"))))
  }

  test("events loads the live driver testdata at sf0.001") {
    val got = Tables(spark, TestSpark.Sf0001).events
    assert(got.schema("ts").dataType == TimestampNTZType)
    assert(got.limit(1).count() == 1)
  }

  // Pin of every table's Spark-visible schema against the LIVE driver
  // testdata. The driver regenerates /root/testdata between rounds and
  // has already drifted a physical type once (events.ts, round 8 —
  // 16 queries + 56 tests red). If THIS test fails, the generator
  // drifted again: do NOT patch call sites — make the `Tables` loader
  // schema-adaptive for the drifted column (the events branch above is
  // the playbook) and extend this pin with the new era.
  test("all ten tables load with the pinned column names and types") {
    val expected = Map(
      "region" -> "r_regionkey:int, r_name:string",
      "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
        "c_acctbal:double, c_mktsegment:string"),
      "supplier" -> ("s_suppkey:bigint, s_name:string, s_nationkey:int, " +
        "s_acctbal:double"),
      "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, " +
        "p_type:string, p_size:int, p_retailprice:double"),
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, " +
        "o_orderstatus:string, o_totalprice:double, " +
        "o_orderdate:timestamp_ntz, o_orderpriority:string"),
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, " +
        "l_suppkey:bigint, l_linenumber:int, l_quantity:double, " +
        "l_extendedprice:double, l_discount:double, l_tax:double, " +
        "l_returnflag:string, l_linestatus:string, " +
        "l_shipdate:timestamp_ntz"),
      "events" -> ("event_id:bigint, ts:timestamp_ntz, user_id:bigint, " +
        "event_type:string, value:double, props:string"),
      "documents" -> ("doc_id:bigint, text:string, lang:string, " +
        "source:string, n_chars:bigint"),
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")
    val t = Tables(spark, TestSpark.Sf0001)
    val loaders = Map(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
    for ((name, df) <- loaders) {
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got == expected(name),
        s"table '$name' drifted from the pinned schema.\n  pinned: " +
          s"${expected(name)}\n  loaded: $got\n  → adapt the Tables " +
          "loader (see events), don't patch call sites.")
    }
  }
}
