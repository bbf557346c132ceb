package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface produces the same results as the DataFrame surface. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("spark.sql over registered views matches the DataFrame operators") {
    GraftCatalog.register(spark, dir)
    val sqlRows = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin).collect()
    val dfRows = graft.operators.Relational.q04OrderPriority(spark, dir).collect()
    assert(sqlRows.map(_.toString).sameElements(dfRows.map(_.toString)))
  }

  test("one sabotaged table degrades its own view only, loudly") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft_sabotage")
    for (n <- GraftCatalog.TableNames)
      Files.createSymbolicLink(tmp.resolve(s"$n.parquet"),
        Paths.get(s"$dir/$n.parquet"))
    // corrupt exactly one table: not-a-parquet bytes under events
    Files.delete(tmp.resolve("events.parquet"))
    Files.write(tmp.resolve("events.parquet"), "not parquet".getBytes)
    // a PRIOR healthy registration must not linger: re-registration
    // over the broken dir has to DROP the stale events view, not leave
    // it silently serving the old snapshot
    GraftCatalog.register(spark, dir)
    try {
      val failed = GraftCatalog.register(spark, tmp.toString)
      assert(failed.map(_._1) == Seq("events"),
        s"expected only events to fail, got ${failed.map(_._1)}")
      // the other nine views survived and are queryable
      assert(spark.sql("SELECT count(*) FROM lineitem").head.getLong(0) > 0)
      assert(spark.sql("SELECT count(*) FROM documents").head.getLong(0) > 0)
      // the broken table's view is GONE — querying it fails loudly
      // instead of reading the previous registration's data
      assert(!spark.catalog.tableExists("events"),
        "stale events view survived a failed re-registration")
    } finally GraftCatalog.register(spark, dir) // restore for later suites
  }

  test("native functions work over the views in SQL") {
    GraftCatalog.register(spark, dir)
    val n = spark.sql(
      """SELECT count(DISTINCT simhash64(text)) AS n FROM documents""")
      .head.getLong(0)
    assert(n > 0)
    val top = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = 0) b
        |WHERE a.vec_id <> 0
        |ORDER BY c DESC, a.vec_id LIMIT 1""".stripMargin).head
    assert(top.getDouble(1) <= 1.0 && top.getDouble(1) >= -1.0)
  }
}
