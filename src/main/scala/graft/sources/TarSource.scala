package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** f12: TAR container intake — crawl and archive drops frequently
  * arrive as tarballs of many small documents; a distributed intake
  * must enumerate members WITHOUT shelling out or landing temp files.
  * This is a real POSIX ustar walker (public format: 512-byte header
  * blocks, NUL-terminated name, octal size, header checksum computed
  * with the checksum field blanked to spaces, data padded to
  * 512-byte blocks, two zero blocks as the terminator) — corrupt
  * headers fail loudly, the m12 walker discipline.
  *
  * Scale: one walker pass per payload inside mapPartitions; only the
  * slim member rows (name/size/offset) shuffle, member bytes stay
  * executor-side exactly like the m-family's pixels.
  */
object TarSource {

  private val Block = 512

  /** Parse a TAR payload: (name, size, dataOffset) per regular-file
    * member, in archive order. Validates each header's checksum and
    * the structural arithmetic; stops at the first zero block. The
    * ustar `prefix` field (offset 345) is honored — long paths split
    * prefix/name rejoin; PAX (`x`/`g`) and GNU longname (`L`/`K`)
    * override records would change the FOLLOWING member's identity,
    * so they fail loudly instead of yielding a silently wrong name.
    */
  def tarMembers(bytes: Array[Byte]): Seq[(String, Long, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Int)]
    var p = 0
    var done = false
    while (!done) {
      require(p + Block <= bytes.length, "truncated TAR header")
      val zero = {
        var i = 0
        while (i < Block && bytes(p + i) == 0) i += 1
        i == Block
      }
      if (zero) done = true
      else {
        // checksum: unsigned byte sum of the header with the checksum
        // field (148..155) read as spaces
        var sum = 0L
        var i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) ' '.toInt
                  else bytes(p + i) & 0xff)
          i += 1
        }
        val stored = octal(bytes, p + 148, 8)
        require(stored == sum, s"TAR header checksum $stored != $sum")
        def field(off: Int, len: Int): String = {
          var e = p + off
          while (e < p + off + len && bytes(e) != 0) e += 1
          new String(bytes, p + off, e - (p + off),
            java.nio.charset.StandardCharsets.US_ASCII)
        }
        // the prefix field exists ONLY in ustar: GNU-format archives
        // store atime/ctime octal text at offset 345, which a blind
        // prefix join would read as a path component ("14712345671/
        // doc.txt") with a still-valid checksum — exactly the silent
        // mis-naming the PAX/longname refusals below exist to stop.
        // Honor the prefix only under the ustar magic; refuse other
        // magics when the field is non-empty (old v7 archives leave
        // both the magic and the field zeroed — those pass through)
        val magic = field(257, 6)
        val prefix = field(345, 155)
        require(prefix.isEmpty || magic == "ustar",
          s"non-ustar TAR magic '$magic' with a non-empty prefix " +
            "field — refusing rather than mis-naming the member")
        val name0 = field(0, 100)
        val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
        val size = octal(bytes, p + 124, 12)
        val typeflag = bytes(p + 156)
        require(typeflag != 'x' && typeflag != 'g' &&
          typeflag != 'L' && typeflag != 'K',
          s"unsupported TAR override record '${typeflag.toChar}' before " +
            s"$name — PAX/GNU extensions would change the next member's " +
            "identity; refusing rather than mis-naming it")
        require(size >= 0 && p + Block + size <= bytes.length,
          s"truncated member $name")
        if (typeflag == '0' || typeflag == 0)
          out += ((name, size, p + Block))
        val dataBlocks = ((size + Block - 1) / Block).toInt
        p += Block * (1 + dataBlocks)
      }
    }
    out.toSeq
  }

  /** Parse a NUL/space-terminated octal field. */
  private def octal(bytes: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    var seen = false
    while (i < off + len && bytes(i) != 0) {
      val c = bytes(i).toChar
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else require(c == ' ', s"bad octal char '$c'")
      i += 1
    }
    require(seen, "empty octal field")
    v
  }

  /** Build a canonical ustar archive from (name, data) members —
    * the deterministic demo payload generator AND a real encoder
    * (headers carry the ustar magic; mode/uid/gid/mtime are fixed so
    * bytes are a pure function of the members).
    */
  def buildTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val total = members.map { case (_, d) =>
      Block * (1 + (d.length + Block - 1) / Block)
    }.sum + 2 * Block
    val out = new Array[Byte](total) // zero-filled: padding + terminator
    var p = 0
    members.foreach { case (name, data) =>
      require(name.length < 100, s"name too long: $name")
      // String.getBytes(US_ASCII) would silently mangle non-ASCII to
      // '?' — refuse instead of writing a different name than asked
      require(name.forall(c => c >= 0x20 && c < 0x7f),
        s"non-ASCII member name: $name")
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      name.getBytes(ascii).copyToArray(out, p)
      "0000644".getBytes(ascii).copyToArray(out, p + 100) // mode
      "0000000".getBytes(ascii).copyToArray(out, p + 108) // uid
      "0000000".getBytes(ascii).copyToArray(out, p + 116) // gid
      f"${data.length}%011o".getBytes(ascii).copyToArray(out, p + 124)
      "00000000000".getBytes(ascii).copyToArray(out, p + 136) // mtime
      out(p + 156) = '0' // regular file
      "ustar".getBytes(ascii).copyToArray(out, p + 257)
      "00".getBytes(ascii).copyToArray(out, p + 263) // version
      // checksum over the header with the field as spaces, then write
      java.util.Arrays.fill(out, p + 148, p + 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < Block) { sum += out(p + i) & 0xff; i += 1 }
      f"$sum%06o".getBytes(ascii).copyToArray(out, p + 148)
      out(p + 154) = 0
      out(p + 155) = ' '
      data.copyToArray(out, p + Block)
      p += Block * (1 + (data.length + Block - 1) / Block)
    }
    out
  }

  /** The deterministic demo members of one archive: doc_id%3 + 1
    * text files with closed-form names and sizes — the oracle
    * reconstructs this inventory independently in SQL, so the
    * builder and walker are differentially checked against a third
    * expression of the format's arithmetic.
    */
  def demoMembers(id: Long): Seq[(String, Array[Byte])] =
    (0 to (id % 3).toInt).map { j =>
      val size = 10 + ((id + j) % 50).toInt
      (s"doc$id/part$j.txt",
        Array.tabulate[Byte](size)(k => ('a' + (k + j) % 26).toByte))
    }

  /** f12 driver demo: synthesize one archive per document, walk every
    * member back out, and report the member inventory plus the
    * archive's structural size — all closed-form replayable.
    */
  def f12TarIntake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .flatMap { id =>
        val tar = buildTar(demoMembers(id))
        tarMembers(tar).zipWithIndex.map { case ((name, size, _), i) =>
          (id, i.toLong, name, size, tar.length.toLong)
        }
      }
      .toDF("doc_id", "idx", "name", "size", "tar_len")
      .orderBy("doc_id", "idx")
  }
}
