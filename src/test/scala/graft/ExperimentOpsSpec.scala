package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.ExperimentOps

/** Invariant specs for the ExperimentOps family on the sf0.001 fixture
  * (the DuckDB hash-compare at sf0.01 is the exactness gate; these pin
  * the statistical shape: p-value ranges, rank-prefix rejection, CDF
  * approximation accuracy, injection/detection round-trip). */
class ExperimentOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("pTwoSided matches the normal tail to the A-S 7.1.26 error bound") {
    // two-sided p for |z| = 0, 1, 1.959964, 2.575829, 3
    val zs = Seq(0.0, 1.0, 1.959964, 2.575829, 3.0)
    val expected = Seq(1.0, 0.3173105, 0.05, 0.01, 0.0026998)
    val got = zs.map(z => spark.range(1)
      .select(ExperimentOps.pTwoSided(lit(z)).as("p"))
      .as[Double].head())
    got.zip(expected).foreach { case (g, e) =>
      // A-S 7.1.26: |erf err| < 1.5e-7, two-sided doubles it
      assert(math.abs(g - e) < 1e-6, s"p mismatch: got $g want $e")
    }
  }

  test("ks test: D and p in range, counts partition the orders") {
    val Array((nHi, nLo, d, lam, p)) = run("a_ks_test")
      .as[(Long, Long, Double, Double, Double)].collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(nHi + nLo == total)
    assert(d >= 0.0 && d <= 1.0)
    assert(lam >= 0.0)
    assert(p >= 0.0 && p <= 1.0)
  }

  test("mann-whitney: U within [0, nA*nB], p in range") {
    val Array((nA, nB, u, z, p)) = run("a_mann_whitney")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(u >= 0.0 && u <= nA.toDouble * nB)
    assert(p >= 0.0 && p <= 1.0)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("bh-fdr: ranks are a permutation, p monotone, rejections a prefix") {
    val rows = run("a_bh_fdr")
      .select("p_value", "p_rank", "rejected")
      .as[(Double, Long, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sorted.sameElements(1L to rows.length))
    rows.sortBy(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a._1 <= b._1, "p not monotone in rank")
      case _ => ()
    }
    // step-up rejection region is a prefix of the p-sorted list
    val sorted = rows.sortBy(_._2).map(_._3)
    val lastReject = sorted.lastIndexOf(1)
    assert(sorted.take(lastReject + 1).forall(_ == 1))
    rows.foreach(r => assert(r._1 >= 0.0 && r._1 <= 1.0))
  }

  test("cuped: variance reduction in [0,100], both lifts finite") {
    val Array((nT, nC, theta, raw, adj, vr)) = run("a_cuped")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(nT > 0 && nC > 0)
    assert(vr >= 0.0 && vr <= 100.0)
    Seq(theta, raw, adj).foreach(x => assert(!x.isNaN && !x.isInfinite))
  }

  test("ipw: propensities clipped to [0.05, 0.95], strata bounded") {
    val Array((n, strata, ate, naive, minE, maxE)) = run("a_ipw_estimate")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(minE >= 0.05 - 1e-9 && maxE <= 0.95 + 1e-9 && minE <= maxE)
    assert(strata <= 25 && n > 0)
    Seq(ate, naive).foreach(x => assert(!x.isNaN && !x.isInfinite))
  }

  test("randomization test: add-one p in (0,1], extremes within B") {
    val Array((nA, nB, dObs, b, ext, p)) = run("a_randomization_test")
      .as[(Long, Long, Double, Int, Long, Double)].collect()
    assert(b == 64)
    assert(ext >= 0 && ext <= 64)
    assert(p > 0.0 && p <= 1.0)
    assert(math.abs(p - (1.0 + ext) / 65.0) < 1e-6)
  }

  test("encoding anomaly: flags exactly the h56-injected docs") {
    val rows = run("t_encoding_anomaly")
      .select("doc_id", "n_repl", "n_ctrl", "n_moji", "status")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.length == 500)
    val byClass = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        (graft.engine.Det.h56(concat(lit("enc:"),
          col("doc_id").cast("string"))) % 10).cast("int").as("r"))
      .as[(Long, Int)].collect().toMap
    rows.foreach { case (id, nRepl, nCtrl, nMoji, status) =>
      byClass(id) match {
        case 0 => assert(status == "mojibake" && nMoji >= 3 && nRepl == 0,
          s"doc $id class 0 mis-flagged as $status")
        case 1 => assert(status == "corrupt" && nRepl == 1 && nCtrl == 1,
          s"doc $id class 1 mis-flagged as $status")
        case _ => assert(status == "clean" &&
          nRepl == 0 && nCtrl == 0 && nMoji == 0,
          s"doc $id clean doc flagged as $status")
      }
    }
  }

  test("isotonic calibration: fit is monotone and mean-preserving") {
    val rows = run("a_isotonic_calibration")
      .select("bin", "n", "raw_acc", "iso_acc")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 <= b._4 + 1e-9, s"iso not monotone at bin ${b._1}")
      case _ => ()
    }
    // isotonic regression preserves the weighted mean of the response
    val totN = rows.map(_._2).sum.toDouble
    val rawMean = rows.map(r => r._3 * r._2).sum / totN
    val isoMean = rows.map(r => r._4 * r._2).sum / totN
    assert(math.abs(rawMean - isoMean) < 1e-4,
      s"mean not preserved: raw $rawMean iso $isoMean")
    rows.foreach(r => assert(r._4 >= -1e-9 && r._4 <= 1.0 + 1e-9))
  }

  test("mantel-haenszel: CI brackets the OR, se positive") {
    val Array((strata, or, lnOr, se, lo, hi)) = run("a_mantel_haenszel")
      .as[(Long, Double, Double, Double, Double, Double)].collect()
    assert(strata > 0 && strata <= 25)
    assert(or > 0 && se > 0)
    assert(lo <= or && or <= hi)
    assert(math.abs(math.log(or) - lnOr) < 1e-4)
  }

  test("power/mde: required n shrinks as target MDE grows") {
    val rows = run("a_power_mde")
      .select("n_name", "target_mde", "n_per_arm_required", "mde_now")
      .as[(String, Double, Long, Double)].collect()
    assert(rows.length % 3 == 0)
    rows.groupBy(_._1).foreach { case (nation, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 > b._3,
          s"$nation: n_req not decreasing in MDE")
        case _ => ()
      }
      rs.foreach(r => assert(r._4 > 0 && r._3 > 0))
    }
  }

  test("modularity: score in valid range over LP communities") {
    val Array((nodes, edges, comms, q)) = run("g_modularity")
      .as[(Long, Long, Long, Double)].collect()
    assert(nodes == 500 || nodes == 50) // sf0.001 has 50 docs
    assert(edges > 0 && comms > 0 && comms <= nodes)
    assert(q >= -0.5 && q <= 1.0)
  }

  test("ngram novelty: bounds hold and unique <= total shingles") {
    val rows = run("t_ngram_novelty")
      .select("n_shingles", "n_unique", "novelty")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, u, nov) =>
      assert(u >= 0 && u <= n)
      assert(nov >= 0.0 && nov <= 1.0)
      assert(math.abs(nov - u.toDouble / n) < 1e-5)
    }
  }
}
