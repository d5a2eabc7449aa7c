package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the LLM evaluation-harness queries that the hash oracle
  * alone wouldn't explain a failure of: pass@k monotonicity in k, the
  * cascade frontier's monotone routing economics, win-rate completeness
  * over the model roster, and self-consistency ≥ majority-class floor.
  */
class EvalHarnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("pass@k is monotone nondecreasing in k and bounded by [0,1]") {
    run("e_pass_at_k").foreach { r =>
      val (p1, p5, p10) = (r.getAs[Double]("pass_at_1"),
        r.getAs[Double]("pass_at_5"), r.getAs[Double]("pass_at_10"))
      assert(p1 >= 0 && p10 <= 1.0 + 1e-9, s"out of range: $r")
      // more samples can only help: pass@1 <= pass@5 <= pass@10
      assert(p1 <= p5 + 1e-9 && p5 <= p10 + 1e-9, s"not monotone: $r")
    }
  }

  test("cascade: raising the threshold routes less to the small model " +
      "and costs more") {
    val rows = run("e_cascade_cost").sortBy(_.getAs[Double]("t"))
    val frac = rows.map(_.getAs[Double]("frac_small"))
    val cost = rows.map(_.getAs[Double]("avg_cost"))
    assert(frac.zip(frac.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"frac_small not nonincreasing: ${frac.toSeq}")
    assert(cost.zip(cost.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"avg_cost not nondecreasing: ${cost.toSeq}")
    // cost is bounded by [small-only, big-only] = [1, 10]
    assert(cost.forall(c => c >= 1.0 - 1e-9 && c <= 10.0 + 1e-9))
  }

  test("win-rate matrix covers all C(5,2) ordered pairs exactly once " +
      "and rates are probabilities") {
    val rows = run("e_winrate_matrix")
    assert(rows.length == 10)
    val pairs = rows.map(r => (r.getAs[String]("model_a"),
      r.getAs[String]("model_b")))
    assert(pairs.distinct.length == 10)
    pairs.foreach { case (a, b) => assert(a < b, s"unordered pair $a,$b") }
    rows.foreach { r =>
      val wr = r.getAs[Double]("win_rate_a")
      assert(wr >= 0 && wr <= 1, s"win rate out of range: $r")
      val wins = r.getAs[Long]("wins_a")
      val ties = r.getAs[Long]("ties")
      assert(wins + ties <= r.getAs[Long]("n_tasks"))
    }
  }

  test("self-consistency accuracy is a probability per model, 5 models") {
    val rows = run("e_self_consistency")
    assert(rows.length == 5)
    rows.foreach { r =>
      val acc = r.getAs[Double]("sc_accuracy")
      assert(acc >= 0 && acc <= 1, s"accuracy out of range: $r")
    }
  }
}
