package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CsvSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("f11 ingest: RFC quoting, partial parse of wrong-arity rows, quarantine") {
    val dir = Files.createTempDirectory("graft_f11_spec").toString
    Files.write(Paths.get(s"$dir/part-0.csv"), java.util.Arrays.asList(
      "1,en,src0,10",
      "2,de,\"src1,q\"\"t\",20", // quoted: embedded comma + "" escape
      "3,fr,src2,30,EXTRA",      // wrong arity → partial parse + quarantine
      "4,es",                    // short row → null-fill + quarantine
      "5,it,\"unclosed,40"))     // bad quote consumes the rest of the line
    val rows = CsvSource.ingestCsv(spark, dir)
      .cache().orderBy("doc_id").collect()
    assert(rows.length == 5) // conservation: arrived = parsed + corrupt
    def tup(i: Int) = (rows(i).getLong(0),
      rows(i).getString(1), rows(i).getString(2),
      if (rows(i).isNullAt(3)) -1L else rows(i).getLong(3),
      !rows(i).isNullAt(4))
    assert(tup(0) == ((1L, "en", "src0", 10L, false)))
    // the RFC cases decode: comma survives, "" becomes one quote
    assert(tup(1) == ((2L, "de", "src1,q\"t", 20L, false)))
    // Spark's probed PERMISSIVE contract: leading fields still parse
    assert(tup(2) == ((3L, "fr", "src2", 30L, true)))
    assert(rows(2).getString(4) == "3,fr,src2,30,EXTRA")
    assert(tup(3) == ((4L, "es", null, -1L, true)))
    // univocity's unclosed quote consumes to end of line
    assert(tup(4) == ((5L, "it", "unclosed,40", -1L, true)))
  }

  test("f11 demo: quoted sources decode, only planted rows quarantine") {
    val got = CsvSource.f11CsvIngest(spark, TestSpark.Sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (id, src, corrupt) = (r.getLong(0), r.getString(2), r.getBoolean(4))
      assert(corrupt == (id % 89 == 0), s"doc $id corrupt=$corrupt")
      if (id % 7 == 2) assert(src.endsWith(",q\"t"), s"doc $id src=$src")
      else assert(!src.contains(","), s"doc $id src=$src")
    }
    // every quarantined line is preserved verbatim with its extra field
    got.filter(_.getBoolean(4)).foreach { r =>
      assert(r.getString(5).endsWith(",x"))
    }
  }
}
