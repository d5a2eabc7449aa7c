package graft

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the analysis family: absorption, hard negatives, moment
  * merge, LOO valuation. */
class AnalysisOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("absorption: purchase absorbs at 1; probability grows with horizon") {
    val rows = SparkEntry.queries("q_absorption_prob")(spark, sf)
      .as[(String, Double, Double, Double, Double)].collect()
    assert(rows.map(_._1).contains("purchase"))
    rows.foreach { case (s, p1, p2, p3, p4) =>
      if (s == "purchase") assert(p1 == 1.0 && p4 == 1.0)
      else {
        assert(p1 >= 0 && p4 <= 1.0 + 1e-9)
        // value iteration toward an absorbing state is monotone in k
        assert(p2 >= p1 - 1e-9 && p3 >= p2 - 1e-9 && p4 >= p3 - 1e-9,
          s"$s: $p1 $p2 $p3 $p4")
      }
    }
  }

  test("hard negatives stay inside the (0.2, 0.8) band, max 5 per query") {
    val rows = SparkEntry.queries("sim_hard_negatives")(spark, sf)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, v, c) =>
      assert(v != q)
      assert(c >= 0.2 && c < 0.8, s"q=$q v=$v cos=$c outside band")
    }
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.length <= 5, s"query $q got ${g.length} negatives")
    }
  }

  test("moment merge: merged and direct global rows are identical") {
    val rows = SparkEntry.queries("a_moments_merge")(spark, sf)
      .select("source", "n", "mean", "variance")
      .as[(String, Long, Double, Double)].collect()
    val m = rows.find(_._1 == "ALL_merged").get
    val d = rows.find(_._1 == "ALL_direct").get
    assert(m._2 == d._2 && m._3 == d._3 && m._4 == d._4,
      s"merge law violated: $m vs $d")
  }

  test("kfold CV: holdout means exclude the fold; rmse consistent") {
    val rows = SparkEntry.queries("a_kfold_cv")(spark, "/root/testdata/sf0.01")
      .select("fold", "n", "mse", "rmse", "mean_mse")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.length == 5)
    val meanMse = rows.map(_._3).sum / 5
    rows.foreach { case (_, n, mse, rmse, mm) =>
      assert(n > 0 && mse > 0)
      assert(math.abs(rmse - math.floor(math.sqrt(mse) * 1e6 + 0.5) / 1e6)
        < 1e-6)
      assert(math.abs(mm - meanMse) < 1.0)
    }
  }

  test("rank fusion: fused candidates come from at least one top-20 pool") {
    val rows = SparkEntry.queries("sim_rank_fusion")(spark, sf)
      .select("query_id", "rrf").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    // minimum possible rrf: rank-20 in exactly one ranking
    val minRrf = 1.0 / 80
    rows.foreach { case (_, r) => assert(r >= minRrf - 1e-9) }
    rows.groupBy(_._1).foreach { case (_, g) => assert(g.length <= 10) }
  }

  test("knn vote: accuracies well-formed, counts cover the corpus") {
    val rows = SparkEntry.queries("sim_knn_vote")(spark, sf)
      .select("n", "n_correct", "accuracy")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, c, a) =>
      assert(c <= n && a >= 0 && a <= 1)
      assert(math.abs(a - c.toDouble / n) < 1e-6)
    }
  }

  test("LOO valuation: removing a below-average source raises the mean") {
    val docs = graft.engine.Tables.documents(spark, sf)
    val corpusMean = docs.agg(org.apache.spark.sql.functions.avg("n_chars"))
      .as[Double].head()
    val perSource = docs.groupBy("source")
      .agg(org.apache.spark.sql.functions.avg("n_chars").as("m"))
      .as[(String, Double)].collect().toMap
    val rows = SparkEntry.queries("t_loo_source_impact")(spark, sf)
      .select("source", "delta_mean").as[(String, Double)].collect()
    rows.foreach { case (src, delta) =>
      val srcMean = perSource(src)
      if (srcMean < corpusMean - 1.0) assert(delta > 0, s"$src: $delta")
      if (srcMean > corpusMean + 1.0) assert(delta < 0, s"$src: $delta")
    }
  }
}
