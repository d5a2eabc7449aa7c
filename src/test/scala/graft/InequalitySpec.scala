package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Inequality

class InequalitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naiveGini(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    val t = s.sum
    val sr = s.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    2.0 * sr / (n * t) - (n + 1.0) / n
  }

  test("matches the naive rank formula, incl. ties across buckets") {
    val xs = Seq(10.0, 10.0, 20.0, 35.5, 35.5, 35.5, 100.0, 250.0, 0.25,
      74.75, 74.75, 5000.0)
    val (n, total, g) = Inequality.gini(xs.toDF("v"), "v", bucketWidth = 30.0)
      .as[(Long, Double, Double)].collect().head
    assert(n == xs.size)
    assert(math.abs(total - xs.sum) < 1e-9)
    assert(math.abs(g - naiveGini(xs)) < 1e-12, s"got $g vs ${naiveGini(xs)}")
  }

  test("extremes: all-equal → 0, one-holds-all → (n-1)/n") {
    val eq = Inequality.gini(Seq.fill(50)(7.0).toDF("v"), "v", 5.0)
      .as[(Long, Double, Double)].collect().head._3
    assert(math.abs(eq) < 1e-12)
    val onehot = (Seq.fill(99)(0.0) :+ 1000.0).toDF("v")
    val g = Inequality.gini(onehot, "v", 5.0)
      .as[(Long, Double, Double)].collect().head._3
    assert(math.abs(g - 99.0 / 100.0) < 1e-12, s"got $g")
  }
}
