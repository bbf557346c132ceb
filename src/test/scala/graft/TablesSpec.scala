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
}
