package graft

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the evaluation/balancing family. */
class EvalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("AUC equals the exact pair statistic on the fixture") {
    // recompute AUC from raw pairs on the small fixture and compare to
    // the histogram identity the query uses
    val rows = graft.engine.Tables.documents(spark, sf)
      .selectExpr("least(n_chars, 500) AS s",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y")
      .as[(Long, Int)].collect()
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val u = (for (p <- pos; n <- neg) yield {
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    }).sum
    val expected = u / (pos.length.toDouble * neg.length)
    val auc = SparkEntry.queries("a_auc_roc")(spark, sf)
      .select("auc").as[Double].head()
    assert(math.abs(auc - math.floor(expected * 1e6 + 0.5) / 1e6) < 1e-9,
      s"query auc=$auc brute=$expected")
  }

  test("PR-AUC lies in (0, 1] and recall curve is monotone") {
    val rows = SparkEntry.queries("a_pr_auc")(spark, sf)
      .select("rec", "pr_auc").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    val auc = rows.head._2
    assert(auc > 0.0 && auc <= 1.0)
    // output is ordered score DESC → recall non-decreasing down the rows
    val recs = rows.map(_._1).toSeq
    assert(recs == recs.sorted, "recall must be monotone in rank order")
  }

  test("class balance brings every class near the majority size") {
    val rows = SparkEntry.queries("t_class_balance")(spark, sf)
      .select("lang", "n_before", "target", "n_after")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val target = rows.head._3
    rows.foreach { case (lang, nb, t, na) =>
      assert(t === target)
      // h56-modular remainder selection is approximately exact: the base
      // replication alone guarantees >= floor(target/n)*n, and the extra
      // slice can only add
      assert(na >= (t / nb) * nb, s"$lang: $na below base replication")
      assert(na <= 2L * t, s"$lang: $na wildly above target $t")
    }
  }

  test("conformal: empirical coverage honors the 90% guarantee band") {
    val rows = SparkEntry.queries("a_conformal_interval")(spark,
        "/root/testdata/sf0.01")
      .select("n_cal", "n_test", "coverage")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nCal, nTest, cov) =>
      assert(nCal >= 9, "calibration split too small for k-selection")
      // finite-sample: coverage ~ Binomial(n_test, >=0.9); allow 4 sigma
      val slack = 4 * math.sqrt(0.9 * 0.1 / nTest)
      assert(cov >= 0.9 - slack, s"coverage $cov below band (n=$nTest)")
    }
  }

  test("dim truncation: recall in (0,1], self-consistent with overlap") {
    val rows = SparkEntry.queries("sim_dim_truncation_recall")(spark, sf)
      .select("n_overlap", "recall_at_10").as[(Long, Double)].collect()
    assert(rows.length == 8)
    rows.foreach { case (n, r) =>
      assert(n >= 0 && n <= 10)
      assert(math.abs(r - n / 10.0) < 1e-9)
    }
  }

  test("mcnemar and kappa are internally consistent") {
    val (n, b, c, both) = SparkEntry.queries("a_mcnemar")(spark, sf)
      .select("n", "b", "c", "both_right")
      .as[(Long, Long, Long, Long)].head()
    assert(b + c + both <= n && b >= 0 && c >= 0)
    val (kn, po, pe, kappa) = SparkEntry.queries("a_cohen_kappa")(spark, sf)
      .select("n", "po", "pe", "kappa").as[(Long, Double, Double, Double)]
      .head()
    assert(kn == n)
    assert(po >= 0 && po <= 1 && pe >= 0 && pe <= 1)
    assert(kappa <= 1.0 + 1e-9 && kappa >= -1.0 - 1e-9)
  }

  test("feature importance: Gini reduction is never negative") {
    val rows = SparkEntry.queries("a_feature_importance")(spark, sf)
      .select("feature", "gini_parent", "gini_split", "importance")
      .as[(String, Double, Double, Double)].collect()
    assert(rows.length == 3)
    rows.foreach { case (f, gp, gs, imp) =>
      // a split can only reduce (or preserve) Gini impurity
      assert(imp >= -1e-9, s"$f: negative importance $imp")
      assert(math.abs(gp - gs - imp) < 1e-6)
    }
  }

  test("type sniff: corrupted RIFF rows fall out invalid, others valid") {
    val rows = SparkEntry.queries("mm_type_sniff")(spark, sf)
      .select("doc_id", "kind", "is_valid")
      .as[(Long, String, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, kind, valid) =>
      val expectedKind = (id % 4) match {
        case 0 => "png"
        case 1 => "jpeg"
        case 2 => "riff"
        case _ => "unknown"
      }
      assert(kind === expectedKind, s"doc $id sniffed $kind")
      if (kind == "riff")
        assert(valid === (id % 7 != 0), s"doc $id riff validity")
      if (kind == "unknown") assert(!valid)
    }
  }
}
