package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q53 distributed prefix-sum deciles == naive global ranking") {
    // ground truth recomputed driver-side: per-customer DECIMAL(18,4)
    // sums, one global sort, ranks and decile arithmetic in plain
    // Scala — no engine window, no prefix-sum machinery shared
    val orders = spark.read
      .parquet(s"${TestSpark.Sf0001}/orders.parquet")
      .select("o_custkey", "o_totalprice")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val per = orders.groupBy(_._1).map { case (ck, rows) =>
      ck -> rows.map(r => BigDecimal(r._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
    }.toSeq
    val rankedDesc = per.sortBy { case (ck, rev) => (-rev, ck) }
    val n = rankedDesc.size.toLong
    val expected = rankedDesc.zipWithIndex
      .map { case ((_, rev), i) =>
        val rnk = i + 1L
        ((rnk - 1L) * 10L / n + 1L, rev, rnk)
      }
      .groupBy(_._1)
      .map { case (decile, rows) =>
        decile -> (rows.size.toLong,
          rows.map(_._2).sum.toDouble,
          rows.map(_._3).min, rows.map(_._3).max)
      }
    val got = Relational.q53RevenueDeciles(spark, TestSpark.Sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
    // population is balanced: any two deciles differ by at most 1
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1)
  }
}
