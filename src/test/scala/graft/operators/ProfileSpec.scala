package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("profile covers every column with sane stats") {
    val t = Tables(spark, dir)
    val p = Profile.table(t.orders).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == t.orders.columns.toSet)
    val ok = p("o_orderkey")
    assert(ok.getLong(2) == t.orders.count())
    assert(ok.getLong(3) == 0) // no null keys
    val dist = ok.getLong(4).toDouble
    assert(math.abs(dist - ok.getLong(2)) / ok.getLong(2) < 0.1,
      "keys are unique → distinct ≈ rows")
    assert(p("o_totalprice").getDouble(5) > 0) // min price
    assert(p("o_orderpriority").getLong(4) <= 10) // few distinct priorities
  }
}
