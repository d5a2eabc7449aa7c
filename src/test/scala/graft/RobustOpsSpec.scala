package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Specs for the robust-stats / pattern / diversity family. */
class RobustOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def runQuery(name: String) =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")

  test("huber mean resists an outlier that drags the plain mean") {
    // build a tight cluster + one huge outlier through the same math the
    // query uses: clip at 1.345 sigma for two rounds
    val xs = (Seq.fill(99)(10.0) :+ 10000.0)
    val n = xs.length
    val mean = xs.sum / n
    val s = math.sqrt(xs.map(x => x * x).sum / n - mean * mean)
    val k = 1.345 * s
    def step(m: Double) =
      m + xs.map(x => math.max(-k, math.min(k, x - m))).sum / n
    val huber = step(step(mean))
    // the two-round estimate must sit far below the outlier-dragged mean
    assert(mean > 100.0 && huber < mean * 0.8,
      s"mean=$mean huber=$huber")
  }

  test("a_huber_mean: huber <= mean on the right-skewed event values") {
    val rows = runQuery("a_huber_mean")
      .select("event_type", "mean", "huber_mean", "n_clipped")
      .as[(String, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, m, h, nc) =>
      assert(nc >= 0)
      // value is bounded below at 0 with occasional large values →
      // clipping can only pull the location down or hold it
      assert(h <= m + 1e-6, s"$t: huber $h above mean $m")
    }
  }

  test("a_ratio_delta_ci: CI brackets the ratio with positive width") {
    val rows = runQuery("a_ratio_delta_ci")
      .select("ratio", "se", "ci_lo", "ci_hi")
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (r, se, lo, hi) =>
      assert(se > 0 && lo < r && r < hi)
    }
  }

  test("pattern match counts the conversion motif exactly") {
    // hand-check the regex semantics both engines must share:
    // v c c p  v p  v e  -> two conversions, no trailing error streak
    val df = Seq(Tuple1("vccpvpve")).toDF("seq")
      .selectExpr("size(regexp_extract_all(seq, 'v[ce]*p', 0)) AS n",
        "seq rlike 'e{2}$' AS streak")
      .as[(Int, Boolean)].head()
    assert(df._1 === 2 && !df._2)
    val streak = Seq(Tuple1("vpee")).toDF("seq")
      .selectExpr("seq rlike 'e{2}$' AS s").as[Boolean].head()
    assert(streak)
  }

  test("a_l_diversity: a homogeneous cell is never diverse") {
    val rows = runQuery("a_l_diversity")
      .select("l", "p_max", "is_diverse")
      .as[(Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (l, pmax, d) =>
      if (d) assert(l >= 3 && pmax <= 0.5 + 1e-9)
      if (l < 3 || pmax > 0.5 + 1e-9) assert(!d)
    }
  }
}
