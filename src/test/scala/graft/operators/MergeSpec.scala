package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("upsert updates matched keys and inserts new ones") {
    import spark.implicits._
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "v")
    val updates = Seq((2L, "b2", 21), (4L, "d", 40)).toDF("id", "name", "v")
    val merged = Merge.upsert(target, updates, "id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(merged == Map(
      1L -> ("a", 10), 2L -> ("b2", 21), 3L -> ("c", 30), 4L -> ("d", 40)))
  }

  test("upsert is idempotent (replay-safe)") {
    import spark.implicits._
    val target = Seq((1L, "a", 10)).toDF("id", "name", "v")
    val updates = Seq((1L, "a2", 11), (2L, "b", 20)).toDF("id", "name", "v")
    val once = Merge.upsert(target, updates, "id")
    val twice = Merge.upsert(once, updates, "id")
    assert(once.collect().map(_.toString).sorted
      .sameElements(twice.collect().map(_.toString).sorted))
  }

  test("delete removes exactly the listed keys") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val doomed = Seq(Tuple1(2L)).toDF("id")
    val left = Merge.delete(target, doomed, "id")
      .collect().map(_.getLong(0)).toSet
    assert(left == Set(1L, 3L))
  }
}
