package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Kmv

class KmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val rows = spark.range(30000).select(
    (col("id") % 3).cast("string").as("grp"),
    // ~5000 distinct keys per group, with repeats
    concat(col("id") % 3, lit(":"), col("id") % 15000).as("key"))

  test("estimate within the KMV error envelope of the exact count") {
    val est = Kmv.estimate(Kmv.sketch(rows, "grp", "key", 256), "grp", 256)
      .as[(String, Double)].collect().toMap
    // 5000 distinct per group; 1/sqrt(k-2) ~ 6.3%, allow 4 sigma
    est.foreach { case (g, e) =>
      assert(math.abs(e - 5000) / 5000 < 0.25, s"grp $g: est $e vs 5000")
    }
  }

  test("small groups (n < k) are exact") {
    val small = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z"))
      .toDF("grp", "key")
    val est = Kmv.estimate(Kmv.sketch(small, "grp", "key", 64), "grp", 64)
      .as[(String, Double)].collect().toMap
    assert(est == Map("a" -> 2.0, "b" -> 1.0))
  }

  test("merge law: merge(sketch(A), sketch(B)) == sketch(A union B)") {
    val a = rows.filter(col("id") % 2 === 0)
    val b = rows.filter(col("id") % 2 === 1)
    val merged = Kmv.merge(
      Kmv.sketch(a, "grp", "key", 128),
      Kmv.sketch(b, "grp", "key", 128), "grp", 128)
      .as[(String, Long)].collect().toSet
    val mono = Kmv.sketch(rows, "grp", "key", 128)
      .as[(String, Long)].collect().toSet
    assert(merged == mono)
  }

  test("sketch is deterministic under repartitioning") {
    val s1 = Kmv.sketch(rows, "grp", "key", 64)
      .as[(String, Long)].collect().toSet
    val s2 = Kmv.sketch(rows.repartition(17), "grp", "key", 64)
      .as[(String, Long)].collect().toSet
    assert(s1 == s2)
  }
}
