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
    assert(agg.scanSelectedBytes > 0 && agg.scanSelectedFiles > 0,
      s"scan metrics not harvested: $agg")

    val mapOnly = Instrument.profile(
      t.lineitem.filter(col("l_quantity") < 10)
        .select("l_orderkey", "l_quantity"))
    assert(mapOnly.shuffleWriteBytes == 0,
      s"map-only plan shuffled: $mapOnly")
  }

  test("x11 sentinel barrier: a multi-job body keeps every job's task metrics") {
    val t = Tables(spark, dir)
    val proj = t.lineitem.select("l_orderkey", "l_quantity")
    val single = Instrument.profile(proj)
    assert(single.inputReadBytes > 0, s"single scan read nothing: $single")
    // three sequential jobs that each scan the parquet once (the
    // localCheckpoint materialization is its own job; its count reads
    // checkpoint blocks, not files) — the old balanced-prefix wait
    // could exit after job 1 and drop the later jobs' input bytes
    val (_, multi) = Instrument.measure(spark) {
      proj.write.format("noop").mode("overwrite").save()
      val cp = proj.localCheckpoint(true)
      cp.count()
      proj.write.format("noop").mode("overwrite").save()
    }
    assert(multi.inputReadBytes * 2 >= single.inputReadBytes * 5,
      s"multi-job body lost task metrics: $multi vs single-scan $single")
    assert(multi.scanSelectedBytes == 3 * single.scanSelectedBytes,
      s"multi-job body lost scan metrics: $multi vs single-scan $single")
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
