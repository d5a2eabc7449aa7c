package graft

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the revenue-analytics family. */
class RevenueOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("drawdown: nonnegative, peak monotone, max_drawdown is the max") {
    val rows = SparkEntry.queries("w_max_drawdown")(spark, sf)
      .select("peak", "drawdown", "max_drawdown")
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val mdd = rows.head._3
    var lastPeak = Double.MinValue
    rows.foreach { case (p, dd, m) =>
      assert(dd >= 0 && m == mdd)
      assert(p >= lastPeak - 1e-6); lastPeak = p
    }
    assert(math.abs(rows.map(_._2).max - mdd) < 1e-6)
  }

  test("segment migration: shares sum to 1 within each early band") {
    val rows = SparkEntry.queries("a_segment_migration")(spark, sf)
      .select("band_early", "n", "share_of_early")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (b, g) =>
      val total = g.map(_._3).sum
      assert(math.abs(total - 1.0) < 1e-4, s"band $b shares sum to $total")
    }
  }

  test("cohort LTV: cumulative revenue is monotone within each cohort") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf)
      .select("cohort_ym", "age_months", "cum_revenue")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (c, g) =>
      val sorted = g.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => b >= a - 1e-6 },
        s"cohort $c LTV not monotone")
    }
  }
}
