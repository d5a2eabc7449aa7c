package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed-ish values, two groups, unique row key
  private lazy val rows = spark.range(4000).select(
    col("id"),
    (col("id") % 2).cast("string").as("grp"),
    (pow(col("id") % 97, 1.5) + col("id") % 13).as("v"))

  test("merge law: sample(A union B) == merge(sample(A), sample(B))") {
    val a = rows.filter(col("id") < 1500)
    val b = rows.filter(col("id") >= 1500)
    val whole = QuantileSketch.sample(rows, "grp", "id", "v", 64)
      .as[(String, Long, Double)].collect().toSet
    val merged = QuantileSketch.merge(
      QuantileSketch.sample(a, "grp", "id", "v", 64),
      QuantileSketch.sample(b, "grp", "id", "v", 64), "grp", 64)
      .as[(String, Long, Double)].collect().toSet
    assert(merged == whole)
  }

  test("sample is capped at k and is a subset of the group's rows") {
    val sk = QuantileSketch.sample(rows, "grp", "id", "v", 100)
    val sizes = sk.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 100))
    // every sampled v exists in the source group
    val bad = sk.join(
      rows.select(col("grp"), col("v")).distinct(), Seq("grp", "v"),
      "left_anti").count()
    assert(bad == 0)
  }

  test("estimates bracket the exact quantile within the rank-error bound") {
    val sk = QuantileSketch.sample(rows, "grp", "id", "v", 256)
    val est = QuantileSketch.quantiles(sk, "grp", Seq(0.5))
      .as[(String, Double)].collect().toMap
    val exact = rows.groupBy("grp")
      .agg(expr("percentile(v, 0.5D)").as("ex"))
      .as[(String, Double)].collect().toMap
    // 256-sample median: rank error ~1/sqrt(256) ≈ 6%; the VALUE error
    // bound depends on density, so assert via quantile brackets instead:
    // est must lie between the exact p35 and p65
    val brackets = rows.groupBy("grp")
      .agg(expr("percentile(v, 0.35D)").as("lo"),
        expr("percentile(v, 0.65D)").as("hi"))
      .as[(String, Double, Double)].collect()
      .map { case (g, lo, hi) => g -> (lo, hi) }.toMap
    for ((g, e) <- est) {
      val (lo, hi) = brackets(g)
      assert(e >= lo && e <= hi,
        s"grp $g: median est $e outside [$lo, $hi] (exact ${exact(g)})")
    }
  }

  test("q=0 and q=1 return the sample's min and max") {
    val sk = QuantileSketch.sample(rows, "grp", "id", "v", 32)
    val got = QuantileSketch.quantiles(sk, "grp", Seq(0.0, 1.0))
      .as[(String, Double, Double)].collect()
      .map { case (g, p0, p100) => g -> (p0, p100) }.toMap
    val direct = sk.groupBy("grp")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .as[(String, Double, Double)].collect()
    for ((g, mn, mx) <- direct) {
      val (emn, emx) = got(g)
      assert(emn == mn && emx == mx)
    }
  }
}
