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
}
