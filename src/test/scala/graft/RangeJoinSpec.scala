package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("inclusive lo, exclusive hi, multi-bucket spans, empty intervals dropped") {
    val points = Seq(0.0, 1.0, 5.5, 6.0, 9.99, 10.0, 42.0)
      .toDF("v")
    val intervals = Seq(
      ("a", 1L, 6L),    // spans buckets 0..3 at width 2
      ("b", 6L, 10L),   // hi exclusive: 10.0 must NOT match
      ("c", 5L, 7L),    // overlaps a and b around 5.5/6.0
      ("d", 8L, 8L))    // empty: hi <= lo
      .toDF("name", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals,
        "v", "lo", "hi", bucketWidth = 2.0)
      .select("v", "name").as[(Double, String)].collect().toSet
    val expected = Set(
      1.0 -> "a", 5.5 -> "a", 5.5 -> "c",
      6.0 -> "b", 6.0 -> "c", 9.99 -> "b")
    assert(out == expected)
  }

  test("matches the naive non-equi join on random data") {
    val points = (0 until 500).map(i => (i, (i * 37 % 997) / 10.0)).toDF("pid", "v")
    val intervals = (0 until 60).map(i => (i, (i * 13 % 80).toLong, (i * 13 % 80 + i % 11).toLong))
      .toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 4.0)
      .select("pid", "iid").as[(Int, Int)].collect().toSet
    val naive = points.join(intervals,
        points("v") >= intervals("lo") && points("v") < intervals("hi"))
      .select("pid", "iid").as[(Int, Int)].collect().toSet
    assert(fast == naive)
  }

  test("intervalOverlap: half-open semantics, one row per pair, no dups") {
    val left = Seq(
      ("l1", 0L, 5L),    // overlaps r1, r2
      ("l2", 5L, 10L),   // touches l1 at 5 (no self-side issue), overlaps r2, r3
      ("l3", 20L, 21L),  // overlaps nothing
      ("l4", 0L, 100L))  // spans many buckets; overlaps r1, r2, r3
      .toDF("lname", "llo", "lhi")
    val right = Seq(
      ("r1", 3L, 4L),
      ("r2", 4L, 6L),
      ("r3", 9L, 12L),
      ("r4", 21L, 21L))  // empty interval: dropped
      .toDF("rname", "rlo", "rhi")
    val out = RangeJoin.intervalOverlap(left, right,
        "llo", "lhi", "rlo", "rhi", bucketWidth = 3.0)
      .select("lname", "rname").as[(String, String)].collect().toList
    // exactly-once check: list, not set
    assert(out.size == out.toSet.size, s"duplicate pairs in $out")
    val expected = Set(
      "l1" -> "r1", "l1" -> "r2",
      "l2" -> "r2", "l2" -> "r3",
      "l4" -> "r1", "l4" -> "r2", "l4" -> "r3")
    assert(out.toSet == expected)
  }

  test("intervalOverlap matches the naive inequality join on random data") {
    val left = (0 until 80).map(i =>
      (i, (i * 31 % 200).toLong, (i * 31 % 200 + 1 + i % 17).toLong))
      .toDF("lid", "llo", "lhi")
    val right = (0 until 70).map(i =>
      (i, (i * 43 % 200).toLong, (i * 43 % 200 + 1 + i % 13).toLong))
      .toDF("rid", "rlo", "rhi")
    val fast = RangeJoin.intervalOverlap(left, right,
        "llo", "lhi", "rlo", "rhi", bucketWidth = 8.0)
      .select("lid", "rid").as[(Int, Int)].collect()
    assert(fast.length == fast.toSet.size, "emitted a pair more than once")
    val naive = left.join(right,
        left("llo") < right("rhi") && right("rlo") < left("lhi"))
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    assert(fast.toSet == naive)
  }
}
