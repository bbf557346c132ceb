package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("x12 versioned publish: rollback reads, retention, pointer-loss fallback") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_snap").toString + "/t"
    def table(n: Int) = (1 to n).map(i => (i.toLong, s"gen$n")).toDF("id", "gen")

    assert(Snapshots.publish(table(2), path, keep = 2) == 1L)
    assert(Snapshots.publish(table(3), path, keep = 2) == 2L)
    assert(Snapshots.publish(table(4), path, keep = 2) == 3L)

    // latest is v3; v2 retained for rollback; v1 pruned by keep=2
    assert(Snapshots.latestVersion(spark, path).contains(3L))
    assert(Snapshots.versions(spark, path) == Seq(2L, 3L))
    assert(Snapshots.readLatest(spark, path).count() == 4)
    assert(Snapshots.readLatest(spark, path)
      .agg(max("gen")).head.getString(0) == "gen4")
    assert(Snapshots.readVersion(spark, path, 2L).count() == 3)

    // pointer loss (the mid-swap crash window): fallback to the
    // highest COMPLETE version — still v3
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_LATEST"), false)
    assert(Snapshots.latestVersion(spark, path).contains(3L))
    assert(Snapshots.readLatest(spark, path).count() == 4)

    // a stray staging dir (crash mid-version-write) is never read
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "_v9.staging"))
    assert(Snapshots.versions(spark, path) == Seq(2L, 3L))
    // and the next publish continues from the pointer lineage
    assert(Snapshots.publish(table(5), path, keep = 2) == 4L)
    assert(Snapshots.readLatest(spark, path).count() == 5)

    // orphaned version ABOVE the pointer (crash after the version
    // rename, before the pointer swap): the next publish must number
    // past it, never rename onto it
    fs.rename(new org.apache.hadoop.fs.Path(path, "_v4"),
      new org.apache.hadoop.fs.Path(path, "_v7"))
    // pointer still says 4 but only _v3/_v7 exist; fallback serves 7
    assert(Snapshots.publish(table(6), path, keep = 2) == 8L)
    assert(Snapshots.readLatest(spark, path).count() == 6)
    assert(Snapshots.versions(spark, path) == Seq(7L, 8L))
  }
}
