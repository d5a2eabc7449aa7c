package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Hilbert

/** Hilbert index: pinned xy2d reference values, the unit-step adjacency
  * property that distinguishes it from Morton, and quantization edges. */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bits=2 grid matches the canonical xy2d table") {
    val grid = (for { x <- 0 to 3; y <- 0 to 3 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val got = Hilbert.index(grid, "x", "y", 2, "d")
      .as[(Long, Long, Long)].collect().map { case (x, y, dd) => ((x, y), dd) }
      .toMap
    val want = Map( // pinned from the reference xy2d implementation
      (0L, 0L) -> 0L, (0L, 1L) -> 3L, (0L, 2L) -> 4L, (0L, 3L) -> 5L,
      (1L, 0L) -> 1L, (1L, 1L) -> 2L, (1L, 2L) -> 7L, (1L, 3L) -> 6L,
      (2L, 0L) -> 14L, (2L, 1L) -> 13L, (2L, 2L) -> 8L, (2L, 3L) -> 9L,
      (3L, 0L) -> 15L, (3L, 1L) -> 12L, (3L, 2L) -> 11L, (3L, 3L) -> 10L)
    assert(got == want)
  }

  test("bits=8 corners and an interior point match the reference") {
    val pts = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (100L, 200L)).toDF("x", "y")
    val got = Hilbert.index(pts, "x", "y", 8, "d")
      .as[(Long, Long, Long)].collect().map { case (x, y, dd) => ((x, y), dd) }
      .toMap
    assert(got == Map((0L, 0L) -> 0L, (255L, 0L) -> 65535L,
      (0L, 255L) -> 21845L, (255L, 255L) -> 43690L, (100L, 200L) -> 28272L))
  }

  test("unit-step adjacency: consecutive indexes are grid neighbors") {
    // the property Morton lacks — it is WHY hilbert files prune tighter
    val grid = (for { x <- 0 to 7; y <- 0 to 7 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val cells = Hilbert.index(grid, "x", "y", 3, "d")
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, dd) => dd -> (x, y) }.toMap
    assert(cells.size == 64 && cells.keySet == (0L until 64L).toSet,
      "index must be a bijection onto 0..63")
    (0L until 63L).foreach { i =>
      val (x1, y1) = cells(i); val (x2, y2) = cells(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $i -> ${i + 1} is not a unit grid move")
    }
  }

  test("quantize: endpoints, interior floor, degenerate range") {
    val df = Seq((0L, 0L, 100L), (100L, 0L, 100L), (37L, 0L, 100L),
      (5L, 5L, 5L)).toDF("v", "lo", "hi")
    val got = df.select(
      Hilbert.quantize(col("v"), col("lo"), col("hi"), 8).as("q"))
      .as[Long].collect()
    assert(got.toSeq == Seq(0L, 255L, (37L * 255L) / 100L, 0L))
  }
}
