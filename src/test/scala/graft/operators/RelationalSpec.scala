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

  test("q54 SCD2 history matches hand-built versions") {
    import spark.implicits._
    import java.sql.Timestamp
    // instant-based constructor: TZ-independent epoch arithmetic
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: A A B A — consecutive dup collapses, re-entry is a NEW
    // version; user 2: single state stays current from its first event
    val events = Seq(
      (1L, ts(100), 10L, "A"), (1L, ts(200), 11L, "A"),
      (1L, ts(300), 12L, "B"), (1L, ts(400), 13L, "A"),
      (2L, ts(500), 14L, "X"), (2L, ts(600), 15L, "X"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Relational.scd2Over(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, "A", 100000000L, 300000000L, false),
      (1L, 2L, "B", 300000000L, 400000000L, false),
      (1L, 3L, "A", 400000000L, -1L, true),
      (2L, 1L, "X", 500000000L, -1L, true)))
    // validity ranges tile each user's timeline: version k's
    // effective_to == version k+1's effective_from, one open row each
    val byUser = got.groupBy(_._1)
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2).toSeq
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 == b._4)
        case _         =>
      }
      assert(sorted.count(_._6) == 1 && sorted.last._6)
    }
  }

  test("c19 drift: identical snapshots are zero, disjoint langs are 1") {
    import spark.implicits._
    def docs(rows: Seq[(Long, String, String, String, Long)]) =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = docs(Seq((1L, "x y z", "en", "web", 10L),
      (2L, "a b", "fr", "web", 600L)))
    val same = Corpus.driftReportOver(a, a).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(same.values.forall(_ == (0L, 0.0)))
    // same token/char shape, fully disjoint languages
    val b = docs(Seq((3L, "x y z", "de", "web", 10L),
      (4L, "a b", "ja", "web", 600L)))
    val diff = Corpus.driftReportOver(a, b).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(diff("lang") == 1.0 && diff("tokens") == 0.0 &&
      diff("chars") == 0.0 && diff("source") == 0.0)
  }

  test("q55 tree flatten: closed-form depth/root laws; parent consistency") {
    val rows = Relational.q55TreeFlatten(spark, TestSpark.Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, (root, depth)) =>
      // parent = id div 2, roots 0 and 1 ⇒ depth = floor(log2 id),
      // root = 1 for every id ≥ 1
      if (id == 0L) assert(root == 0L && depth == 0L)
      else {
        assert(root == 1L, s"id $id root $root")
        assert(depth == (63 - java.lang.Long.numberOfLeadingZeros(id)).toLong,
          s"id $id depth $depth")
      }
    }
    // local consistency: every non-root's parent sits one level up
    rows.foreach { case (id, (_, depth)) =>
      if (id >= 2L) rows.get(id / 2).foreach { case (_, pDepth) =>
        assert(pDepth == depth - 1, s"id $id parent depth")
      }
    }
  }
}
