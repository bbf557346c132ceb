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
    try {
      java.nio.file.Files.write(f, TarSource.buildTar(members))
      val proc = new ProcessBuilder(tarBin.get, "-tf", f.toString)
        .redirectErrorStream(true).start()
      val src = scala.io.Source.fromInputStream(proc.getInputStream)
      val listed = try src.getLines().toList finally src.close()
      assert(proc.waitFor() == 0, s"tar -tf failed: $listed")
      assert(listed == members.map(_._1).toList)
    } finally java.nio.file.Files.delete(f)
  }

  test("f12 walker: ustar prefix paths rejoin, PAX records refuse loudly") {
    // hand-build a header using the prefix field (the builder never
    // does, so this exercises the walker against foreign archives)
    val tar = TarSource.buildTar(Seq("file.txt" -> "data!".getBytes))
    val withPrefix = tar.clone()
    "very/long/dir".getBytes.copyToArray(withPrefix, 345)
    // re-checksum after editing the header
    java.util.Arrays.fill(withPrefix, 148, 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += withPrefix(i) & 0xff
    f"$sum%06o".getBytes.copyToArray(withPrefix, 148)
    withPrefix(154) = 0; withPrefix(155) = ' '
    assert(TarSource.tarMembers(withPrefix).map(_._1) ==
      Seq("very/long/dir/file.txt"))
    // a PAX override record would silently rename the NEXT member —
    // the walker must refuse, not mis-name
    val pax = tar.clone()
    pax(156) = 'x'
    java.util.Arrays.fill(pax, 148, 156, ' '.toByte)
    sum = 0L
    for (i <- 0 until 512) sum += pax(i) & 0xff
    f"$sum%06o".getBytes.copyToArray(pax, 148)
    pax(154) = 0; pax(155) = ' '
    assertThrows[IllegalArgumentException] { TarSource.tarMembers(pax) }
    // the builder refuses names US_ASCII would silently mangle
    assertThrows[IllegalArgumentException] {
      TarSource.buildTar(Seq("docé.txt" -> Array.empty[Byte]))
    }
    // a NON-ustar archive (GNU stores atime/ctime octal text where
    // ustar keeps the prefix) must refuse rather than silently emit
    // "14712345671/file.txt" — the prefix join is ustar-magic-gated
    val gnu = tar.clone()
    "ustar  ".getBytes.copyToArray(gnu, 257) // GNU old magic+version
    "14712345671".getBytes.copyToArray(gnu, 345) // atime field
    java.util.Arrays.fill(gnu, 148, 156, ' '.toByte)
    sum = 0L
    for (i <- 0 until 512) sum += gnu(i) & 0xff
    f"$sum%06o".getBytes.copyToArray(gnu, 148)
    gnu(154) = 0; gnu(155) = ' '
    val e = intercept[IllegalArgumentException] { TarSource.tarMembers(gnu) }
    assert(e.getMessage.contains("non-ustar"), e.getMessage)
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
