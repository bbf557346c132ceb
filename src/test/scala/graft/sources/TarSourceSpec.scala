package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TarSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("f12 round-trip: members walk back out with exact names, sizes, bytes") {
    val members = Seq(
      "a/x.txt" -> "hello tar".getBytes,
      "a/y.txt" -> Array.fill[Byte](600)(7), // spans two data blocks
      "z.txt" -> Array.empty[Byte])          // zero-size member
    val tar = TarSource.buildTar(members)
    assert(tar.length % 512 == 0)
    val walked = TarSource.tarMembers(tar)
    assert(walked.map(_._1) == members.map(_._1))
    assert(walked.map(_._2) == members.map(_._2.length.toLong))
    walked.zip(members).foreach { case ((_, size, off), (_, data)) =>
      assert(java.util.Arrays.equals(
        tar.slice(off, off + size.toInt), data))
    }
  }

  test("f12 interop: the system tar utility reads the built archive") {
    val tarBin = Seq("/bin/tar", "/usr/bin/tar")
      .find(p => new java.io.File(p).exists)
    assume(tarBin.isDefined, "no tar binary on this machine")
    val members = TarSource.demoMembers(7L)
    val f = java.nio.file.Files.createTempFile("graft_f12", ".tar")
    java.nio.file.Files.write(f, TarSource.buildTar(members))
    val proc = new ProcessBuilder(tarBin.get, "-tf", f.toString)
      .redirectErrorStream(true).start()
    val listed = scala.io.Source.fromInputStream(proc.getInputStream)
      .getLines().toList
    assert(proc.waitFor() == 0, s"tar -tf failed: $listed")
    assert(listed == members.map(_._1).toList)
  }

  test("f12 walker fails loudly on corruption") {
    val tar = TarSource.buildTar(TarSource.demoMembers(5L))
    // flip a name byte → checksum mismatch
    val bad = tar.clone(); bad(0) = (bad(0) ^ 0x01).toByte
    assertThrows[IllegalArgumentException] { TarSource.tarMembers(bad) }
    // truncate mid-member → structural failure
    assertThrows[IllegalArgumentException] {
      TarSource.tarMembers(tar.take(700))
    }
  }

  test("f12 demo: inventory matches the closed-form member plan") {
    val rows = TarSource.f12TarIntake(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, idx, name, size, tarLen) = (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3), r.getLong(4))
      assert(name == s"doc$id/part$idx.txt")
      assert(size == 10 + (id + idx) % 50)
      assert(tarLen == 1024 * (id % 3 + 2))
    }
  }
}
