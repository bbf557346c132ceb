package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest prior row, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // before any right row → null
      (1L, ts("2024-01-01 10:05:00"), 101L), // exactly at right row B → B (inclusive)
      (1L, ts("2024-01-01 10:30:00"), 102L), // after B and C → C
      (2L, ts("2024-01-01 10:10:00"), 200L)  // other key, one prior → D
    ).toDF("k", "t", "lval")
    val right = Seq(
      (1L, ts("2024-01-01 10:02:00"), "A"),
      (1L, ts("2024-01-01 10:05:00"), "B"),
      (1L, ts("2024-01-01 10:20:00"), "C"),
      (2L, ts("2024-01-01 10:00:00"), "D"),
      (3L, ts("2024-01-01 09:00:00"), "E")   // key with no left rows
    ).toDF("k", "t", "rval")

    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("rval"))
      .collect().map(r => r.getAs[Long]("lval") -> r.getAs[String]("asof_rval"))
      .toMap
    assert(out(100L) == null)
    assert(out(101L) == "B")
    assert(out(102L) == "C")
    assert(out(200L) == "D")
    assert(out.size == 4)
  }
}
