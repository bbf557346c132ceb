package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InstrumentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf001

  test("x11 groupBy shuffles bytes; a map-only filter shuffles none") {
    val t = Tables(spark, dir)
    val agg = Instrument.profile(
      t.lineitem.groupBy("l_partkey").agg(sum("l_quantity")))
    assert(agg.shuffleWriteBytes > 0, s"groupBy wrote no shuffle: $agg")
    assert(agg.inputReadBytes > 0)

    val mapOnly = Instrument.profile(
      t.lineitem.filter(col("l_quantity") < 10)
        .select("l_orderkey", "l_quantity"))
    assert(mapOnly.shuffleWriteBytes == 0,
      s"map-only plan shuffled: $mapOnly")
  }

  test("x11 broadcast join moves far fewer shuffle bytes than its shuffle-join twin") {
    val t = Tables(spark, dir)
    val dim = t.part.select("p_partkey", "p_brand")
    val bcast = Instrument.profile(
      t.lineitem.join(broadcast(dim), col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "p_brand"))
    val shuffled = Instrument.profile(
      t.lineitem.hint("shuffle_merge")
        .join(dim.hint("shuffle_merge"), col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "p_brand"))
    assert(bcast.shuffleWriteBytes < shuffled.shuffleWriteBytes / 2,
      s"broadcast $bcast vs shuffle $shuffled")
  }
}
