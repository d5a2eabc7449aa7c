package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits: a at even positions, b at odd") {
    val got = Seq((3L, 1L), (0L, 0L), (5L, 2L), (1023L, 1023L))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, z) => (a, b) -> z }.toMap
    def interleave(a: Long, b: Long): Long =
      (0 until 10).map(i => (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).sum
    assert(got((3L, 1L)) == interleave(3, 1) && got((3L, 1L)) == 7L)
    assert(got((0L, 0L)) == 0L)
    assert(got((5L, 2L)) == interleave(5, 2))
    assert(got((1023L, 1023L)) == (1L << 20) - 1)
  }

  test("file layout is equal-frequency and deterministic under repartition") {
    val df = spark.range(1000).select(col("id"), (col("id") * 7 % 100).as("a"))
    val l1 = ZOrder.fileLayout(df, Seq(col("a"), col("id")), 100)
      .select("id", "file_id").as[(Long, Long)].collect().toMap
    val l2 = ZOrder.fileLayout(df.repartition(13), Seq(col("a"), col("id")), 100)
      .select("id", "file_id").as[(Long, Long)].collect().toMap
    assert(l1 == l2)
    val sizes = l1.values.groupBy(identity).map(_._2.size).toSet
    assert(sizes == Set(100))
  }

  test("scale-path ranged layout assigns bit-identical file ids to the demo window") {
    val df = spark.range(5000).select(col("id"),
      (col("id") * 131 % 997).as("a"), (col("id") * 17 % 64).as("b"))
    val order = Seq(ZOrder.zValue(col("a"), col("b"), 10), col("id"))
    val demo = ZOrder.fileLayout(df, order, 256)
      .select("id", "file_id").as[(Long, Long)].collect().toMap
    // several partition counts, including 1 (degenerate = demo shape) and
    // more partitions than files
    for (parts <- Seq(1, 7, 32)) {
      val ranged = ZOrder.fileLayoutRanged(df, order, 256, numPartitions = parts)
        .select("id", "file_id").as[(Long, Long)].collect().toMap
      assert(ranged == demo, s"parts=$parts diverged from demo layout")
    }
    // and therefore identical pruning stats
    val sDemo = ZOrder.fileStats(ZOrder.fileLayout(df, order, 256), Seq("a", "b"))
      .collect().toSet
    val sRanged = ZOrder.fileStats(
      ZOrder.fileLayoutRanged(df, order, 256), Seq("a", "b"))
      .select(sDemo.head.schema.fieldNames.map(col): _*).collect().toSet
    assert(sDemo == sRanged)
  }

  test("z layout prunes second-dim box queries; linear layout cannot") {
    // 64x64 grid, one row per cell — second-dim predicate b in [8, 15]
    val grid = spark.range(4096).select(
      col("id"), (col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    def scanned(layout: org.apache.spark.sql.DataFrame): Long =
      ZOrder.fileStats(layout, Seq("a", "b"))
        .filter(col("min_b") <= 15 && col("max_b") >= 8)
        .count()
    val z = ZOrder.fileLayout(grid,
      Seq(ZOrder.zValue(col("a"), col("b"), 6), col("id")), 256)
    val lin = ZOrder.fileLayout(grid, Seq(col("a"), col("id")), 256)
    val (zs, ls) = (scanned(z), scanned(lin))
    // 16 files of 256; the b-range covers 1/8 of the space: z-order
    // should touch a small fraction, linear-by-a touches every file
    assert(ls == 16L, s"linear scanned $ls")
    assert(zs <= 4L, s"zorder scanned $zs")
  }
}
