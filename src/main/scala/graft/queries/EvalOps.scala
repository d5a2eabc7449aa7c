package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}
import graft.engine.Stage.syntax._

/** The model/data evaluation layer: classifier quality (exact tie-corrected
  * ROC-AUC, trapezoidal PR-AUC) computed entirely from score histograms —
  * never from per-row global ranks — plus deterministic class balancing
  * (fractional oversampling) and multimodal type sniffing for ingest
  * routing.
  *
  * The histogram discipline is the 100 TB story: every curve statistic here
  * reduces to one groupBy over the VALUE-bounded score domain + windows
  * over that bounded relation. A per-row `row_number() OVER (ORDER BY
  * score)` — the naive AUC — is a single-reducer sort; the histogram form
  * is exact (integer pair counts) and corpus-size-free above the scan.
  */
object EvalOps {

  private val roundN = Det.roundNSql _
  private def r12s(e: String) = Det.roundNSql(e, 12)

  val defs: Seq[QueryDef] = Seq(

    // Exact ROC-AUC for the "is-English" length classifier, tie-corrected
    // via the pair-count identity 2U = Σ_v (2·c1(v)·C0(<v) + c1(v)·c0(v)),
    // all integers until the final division — the a_mann_whitney trick
    // pointed at classifier evaluation. ROC operating points at the 10
    // fixed length thresholds ride along, each from the same histogram.
    QueryDef.sql(
      "a_auc_roc",
      s"""WITH f AS (
         |  SELECT CASE WHEN n_chars > 500 THEN 500 ELSE n_chars END AS s,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents),
         |h AS (
         |  SELECT s, COUNT(CASE WHEN y = 1 THEN 1 END) AS c1,
         |    COUNT(CASE WHEN y = 0 THEN 1 END) AS c0
         |  FROM f GROUP BY 1),
         |cum AS (
         |  SELECT s, c1, c0,
         |    SUM(c0) OVER (ORDER BY s) - c0 AS c0_below,
         |    SUM(c1) OVER (ORDER BY s) - c1 AS c1_below
         |  FROM h),
         |tot AS (
         |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c0) AS BIGINT) AS n0,
         |    CAST(SUM(2 * c1 * c0_below + c1 * c0) AS BIGINT) AS u2
         |  FROM cum),
         |thr AS (SELECT unnest(range(1, 11)) * 50 AS t),
         |pts AS (
         |  SELECT t.t,
         |    CAST(SUM(CASE WHEN c.s >= t.t THEN c.c1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN c.s >= t.t THEN c.c0 ELSE 0 END) AS BIGINT) AS fp
         |  FROM thr t, cum c GROUP BY 1)
         |SELECT p.t AS threshold, p.tp, p.fp,
         |  ${roundN("p.tp * 1.0 / n1", 6)} AS tpr,
         |  ${roundN("p.fp * 1.0 / n0", 6)} AS fpr,
         |  ${roundN("u2 * 1.0 / (2.0 * n1 * n0)", 6)} AS auc
         |FROM pts p, tot ORDER BY threshold""".stripMargin) { (s, d) =>
      val f = Tables.documents(s, d).select(
        when(col("n_chars") > 500, 500).otherwise(col("n_chars")).as("s"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
      val h = f.groupBy("s").agg(
        count(when(col("y") === 1, 1)).as("c1"),
        count(when(col("y") === 0, 1)).as("c0"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("s")
      val cum = h
        .withColumn("c0_below", sum("c0").over(w) - col("c0"))
        .withColumn("c1_below", sum("c1").over(w) - col("c1"))
      val tot = cum.agg(
        sum("c1").as("n1"), sum("c0").as("n0"),
        sum(lit(2) * col("c1") * col("c0_below") + col("c1") * col("c0"))
          .as("u2"))
      val thr = s.range(1, 11).select((col("id") * 50).as("t"))
      val pts = cum.crossJoin(broadcast(thr)).groupBy("t").agg(
        sum(when(col("s") >= col("t"), col("c1")).otherwise(0)).as("tp"),
        sum(when(col("s") >= col("t"), col("c0")).otherwise(0)).as("fp"))
      pts.crossJoin(broadcast(tot))
        .select(col("t").as("threshold"), col("tp"), col("fp"),
          Det.roundN(col("tp") * 1.0 / col("n1"), 6).as("tpr"),
          Det.roundN(col("fp") * 1.0 / col("n0"), 6).as("fpr"),
          Det.roundN(col("u2") * 1.0 / (lit(2.0) * col("n1") * col("n0")), 6)
            .as("auc"))
        .orderBy("threshold")
    },

    // Trapezoidal PR-AUC over score blocks (descending): precision/recall
    // at each distinct score, interpolated block-to-block — the standard
    // tie-robust PR curve that needs no per-row ranking. The running
    // trapezoid sum is a window over the score histogram; recall steps
    // are exact rationals.
    QueryDef.sql(
      "a_pr_auc",
      s"""WITH f AS (
         |  SELECT CASE WHEN n_chars > 500 THEN 500 ELSE n_chars END AS s,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents),
         |h AS (
         |  SELECT s, COUNT(CASE WHEN y = 1 THEN 1 END) AS c1,
         |    COUNT(*) AS c FROM f GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1 FROM h),
         |cum AS (
         |  SELECT s, SUM(c1) OVER (ORDER BY s DESC) AS ctp,
         |    SUM(c) OVER (ORDER BY s DESC) AS cn
         |  FROM h),
         |pr AS (
         |  SELECT s, CAST(ctp AS BIGINT) AS ctp, CAST(cn AS BIGINT) AS cn,
         |    ctp * 1.0 / cn AS prec, ctp * 1.0 / n1 AS rec,
         |    LAG(ctp * 1.0 / cn, 1, 1.0) OVER (ORDER BY s DESC) AS prec_prev,
         |    LAG(ctp * 1.0 / n1, 1, 0.0) OVER (ORDER BY s DESC) AS rec_prev
         |  FROM cum, tot)
         |SELECT s AS score, ctp, cn, ${roundN("prec", 6)} AS prec,
         |  ${roundN("rec", 6)} AS rec,
         |  ${roundN(
             "SUM((rec - rec_prev) * (prec + prec_prev) / 2.0) OVER ()", 6)}
         |    AS pr_auc
         |FROM pr ORDER BY score DESC""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.documents(s, d).select(
        when(col("n_chars") > 500, 500).otherwise(col("n_chars")).as("s"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
      val h = f.groupBy("s").agg(
        count(when(col("y") === 1, 1)).as("c1"), count(lit(1)).as("c"))
      val tot = h.agg(sum("c1").as("n1"))
      val wd = Window.orderBy(desc("s"))
      val cum = h
        .withColumn("ctp", sum("c1").over(wd))
        .withColumn("cn", sum("c").over(wd))
      val pr = cum.crossJoin(broadcast(tot))
        .withColumn("prec", col("ctp") * 1.0 / col("cn"))
        .withColumn("rec", col("ctp") * 1.0 / col("n1"))
        .withColumn("prec_prev", lag(col("prec"), 1, 1.0).over(wd))
        .withColumn("rec_prev", lag(col("rec"), 1, 0.0).over(wd))
      pr.select(col("s").as("score"), col("ctp"), col("cn"),
          Det.roundN(col("prec"), 6).as("prec"),
          Det.roundN(col("rec"), 6).as("rec"),
          Det.roundN(sum((col("rec") - col("rec_prev"))
            * (col("prec") + col("prec_prev")) / 2.0)
            .over(Window.partitionBy()), 6).as("pr_auc"))
        .orderBy(desc("score"))
    },

    // Deterministic class balancing: oversample every language to the
    // majority class size with fractional replication — base = target DIV n,
    // plus one extra copy for the h56-modular slice covering the remainder
    // (membership by hash value, NOT by rank: no per-class ranking window,
    // so the plan is corpus-size-free above the scan; counts are
    // approximately exact and fully reproducible by any engine). The copies
    // are actually GENERATED (map-side sequence explode) and re-counted, so
    // the hash check covers the materialized plan, not just the arithmetic.
    QueryDef.sql(
      "t_class_balance",
      s"""WITH n AS (
         |  SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY 1),
         |t AS (SELECT MAX(n_before) AS target FROM n),
         |plan0 AS (
         |  SELECT d.doc_id, d.lang, n.n_before, t.target,
         |    t.target // n.n_before
         |      + CASE WHEN ${Det.h56Sql("CAST(d.doc_id AS VARCHAR)")} % n.n_before
         |                  < t.target % n.n_before THEN 1 ELSE 0 END AS copies
         |  FROM documents d JOIN n USING (lang), t),
         |gen AS (
         |  SELECT doc_id, lang, n_before, target,
         |    unnest(range(1, CAST(copies AS INT) + 1)) AS copy_idx
         |  FROM plan0)
         |SELECT lang, n_before, target,
         |  COUNT(*) AS n_after,
         |  CAST(SUM((doc_id * copy_idx) % 1000000007) % 1000000007
         |       AS BIGINT) AS checksum
         |FROM gen GROUP BY 1, 2, 3 ORDER BY lang""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val n = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      val t = n.agg(max("n_before").as("target"))
      val plan = docs.join(broadcast(n), "lang").crossJoin(broadcast(t))
        .withColumn("copies",
          expr("target DIV n_before") +
            when(Det.h56(col("doc_id").cast("string")) % col("n_before")
              < col("target") % col("n_before"), 1).otherwise(0))
      plan.select(col("doc_id"), col("lang"), col("n_before"), col("target"),
          explode(sequence(lit(1), col("copies").cast("int"))).as("copy_idx"))
        .groupBy("lang", "n_before", "target")
        .agg(count(lit(1)).as("n_after"),
          // per-row modulus, then a decimal sum, then the final modulus:
          // exact at any corpus size (an int64 sum of %-reduced terms
          // would wrap past ~9e9 rows under non-ANSI mode)
          (sum(((col("doc_id") * col("copy_idx")) % 1000000007L)
              .cast("decimal(38,0)")) % 1000000007L)
            .cast("long").as("checksum"))
        .orderBy("lang")
    },

    // Multimodal ingest routing: magic-byte type sniffing over a
    // deterministic synthetic header column (hex-encoded — the binary
    // decode itself is the Multimodal.scala stub seam; ROUTING on the
    // sniffed type is the part an engine must get right). PNG/JPEG/WAV
    // magics plus container validation (RIFF must carry WAVE at offset 8);
    // corrupt rows (doc_id % 7 = 0 flips the payload) must fall out as
    // invalid. Pure map-side string work + the routing rollup.
    QueryDef.sql(
      "mm_type_sniff",
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 4 AS INT)
         |      WHEN 0 THEN '89504E470D0A1A0A' || upper(substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |      WHEN 1 THEN 'FFD8FFE0' || upper(substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
         |      WHEN 2 THEN '52494646' || upper(substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |        || '57415645'
         |      ELSE upper(substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))
         |    END AS hdr
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 AND doc_id % 4 = 2
         |         THEN substring(hdr, 1, 16) || '58585858'
         |         ELSE hdr END AS hdr
         |  FROM b),
         |s AS (
         |  SELECT doc_id, hdr,
         |    CASE WHEN substring(hdr, 1, 16) = '89504E470D0A1A0A' THEN 'png'
         |         WHEN substring(hdr, 1, 6) = 'FFD8FF' THEN 'jpeg'
         |         WHEN substring(hdr, 1, 8) = '52494646' THEN 'riff'
         |         ELSE 'unknown' END AS kind
         |  FROM c)
         |SELECT doc_id, kind,
         |  CASE WHEN kind = 'riff'
         |       THEN substring(hdr, 17, 8) = '57415645'
         |       WHEN kind = 'unknown' THEN FALSE
         |       ELSE TRUE END AS is_valid,
         |  substring(hdr, 1, 8) AS magic4
         |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      val payload8 = upper(md5(id.cast("string")).substr(1, 8))
      val hdr0 = when(id % 4 === 0,
          concat(lit("89504E470D0A1A0A"), payload8))
        .when(id % 4 === 1,
          concat(lit("FFD8FFE0"), upper(md5(id.cast("string")).substr(1, 12))))
        .when(id % 4 === 2,
          concat(lit("52494646"), payload8, lit("57415645")))
        .otherwise(upper(md5(id.cast("string")).substr(1, 16)))
      val hdr = when(id % 7 === 0 && id % 4 === 2,
          concat(substring(hdr0, 1, 16), lit("58585858")))
        .otherwise(hdr0)
      val kind = when(substring(hdr, 1, 16) === "89504E470D0A1A0A", "png")
        .when(substring(hdr, 1, 6) === "FFD8FF", "jpeg")
        .when(substring(hdr, 1, 8) === "52494646", "riff")
        .otherwise("unknown")
      Tables.documents(s, d)
        .select(col("doc_id"), hdr.as("hdr"), kind.as("kind"))
        .select(col("doc_id"), col("kind"),
          when(col("kind") === "riff",
            substring(col("hdr"), 17, 8) === "57415645")
            .when(col("kind") === "unknown", lit(false))
            .otherwise(lit(true)).as("is_valid"),
          substring(col("hdr"), 1, 8).as("magic4"))
        .orderBy("doc_id")
    },

    // McNemar's paired test between two rule classifiers on the SAME
    // docs (marker-based langId vs a stopword-hit threshold, truth =
    // declared lang): the discordant-pair counts b/c and the
    // continuity-corrected statistic — the correct way to compare two
    // models evaluated on one dataset (a two-proportion z-test on the
    // same rows is wrong; only disagreements carry information). One
    // map-side scoring pass + one scalar aggregate.
    QueryDef.sql(
      "a_mcnemar", {
        def hits(ws: Seq[String]) =
          raw"len(list_filter(str_split_regex(trim(lower(text)), '\s+'), t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
        val m = graft.functions.TextFunctions.langMarkers.toMap
        s"""WITH h AS (
           |  SELECT lang = 'en' AS truth,
           |    ${hits(m("en"))} AS en, ${hits(m("es"))} AS es,
           |    ${hits(m("de"))} AS de, ${hits(m("fr"))} AS fr
           |  FROM documents),
           |p AS (
           |  SELECT truth,
           |    (en >= es AND en >= de AND en >= fr) AS pred_a,
           |    en >= 2 AS pred_b
           |  FROM h),
           |m AS (
           |  SELECT COUNT(*) AS n,
           |    COUNT(CASE WHEN pred_a = truth AND pred_b <> truth THEN 1 END) AS b,
           |    COUNT(CASE WHEN pred_a <> truth AND pred_b = truth THEN 1 END) AS c,
           |    COUNT(CASE WHEN pred_a = truth AND pred_b = truth THEN 1 END) AS both_right
           |  FROM p)
           |SELECT n, b, c, both_right,
           |  CASE WHEN b + c > 0 THEN ${roundN(
               "(abs(b - c) - 1) * (abs(b - c) - 1) * 1.0 / (b + c)", 6)}
           |       ELSE 0.0 END AS mcnemar_stat
           |FROM m ORDER BY n""".stripMargin
      }) { (s, d) =>
      import graft.functions.TextFunctions
      val feats = TextFunctions.tokenFeatures(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(feats, "doc_id")
      val h = TextFunctions.langMarkers
        .map { case (l, _) => l -> col(s"hits_$l") }.toMap
      val p = docs.select((col("lang") === "en").as("truth"),
        (h("en") >= h("es") && h("en") >= h("de") && h("en") >= h("fr"))
          .as("pred_a"),
        (h("en") >= 2).as("pred_b"))
      p.agg(count(lit(1)).as("n"),
          count(when(col("pred_a") === col("truth")
            && col("pred_b") =!= col("truth"), 1)).as("b"),
          count(when(col("pred_a") =!= col("truth")
            && col("pred_b") === col("truth"), 1)).as("c"),
          count(when(col("pred_a") === col("truth")
            && col("pred_b") === col("truth"), 1)).as("both_right"))
        .select(col("n"), col("b"), col("c"), col("both_right"),
          when(col("b") + col("c") > 0,
            Det.roundN((abs(col("b") - col("c")) - 1)
              * (abs(col("b") - col("c")) - 1) * 1.0
              / (col("b") + col("c")), 6))
            .otherwise(0.0).as("mcnemar_stat"))
        .orderBy("n")
    },

    // Cohen's kappa between the same two raters: observed agreement
    // corrected for the agreement their marginals would produce by
    // chance — the inter-annotator metric every labeling pipeline
    // reports before trusting its labels.
    QueryDef.sql(
      "a_cohen_kappa", {
        def hits(ws: Seq[String]) =
          raw"len(list_filter(str_split_regex(trim(lower(text)), '\s+'), t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
        val m = graft.functions.TextFunctions.langMarkers.toMap
        s"""WITH h AS (
           |  SELECT ${hits(m("en"))} AS en, ${hits(m("es"))} AS es,
           |    ${hits(m("de"))} AS de, ${hits(m("fr"))} AS fr
           |  FROM documents),
           |p AS (
           |  SELECT (en >= es AND en >= de AND en >= fr) AS ra,
           |    en >= 2 AS rb
           |  FROM h),
           |m AS (
           |  SELECT COUNT(*) AS n,
           |    COUNT(CASE WHEN ra AND rb THEN 1 END) AS n11,
           |    COUNT(CASE WHEN ra AND NOT rb THEN 1 END) AS n10,
           |    COUNT(CASE WHEN NOT ra AND rb THEN 1 END) AS n01,
           |    COUNT(CASE WHEN NOT ra AND NOT rb THEN 1 END) AS n00
           |  FROM p),
           |k AS (
           |  SELECT n, n11, n10, n01, n00,
           |    (n11 + n00) * 1.0 / n AS po,
           |    ((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
           |      + ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n) AS pe
           |  FROM m)
           |SELECT n, n11, n10, n01, n00, ${roundN("po", 6)} AS po,
           |  ${roundN("pe", 6)} AS pe,
           |  CASE WHEN pe < 1.0 THEN ${roundN("(po - pe) / (1.0 - pe)", 6)}
           |       ELSE 1.0 END AS kappa
           |FROM k ORDER BY n""".stripMargin
      }) { (s, d) =>
      import graft.functions.TextFunctions
      val feats = TextFunctions.tokenFeatures(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text")
      val h = TextFunctions.langMarkers
        .map { case (l, _) => l -> col(s"hits_$l") }.toMap
      val p = feats.select(
        (h("en") >= h("es") && h("en") >= h("de") && h("en") >= h("fr"))
          .as("ra"),
        (h("en") >= 2).as("rb"))
      val m = p.agg(count(lit(1)).as("n"),
        count(when(col("ra") && col("rb"), 1)).as("n11"),
        count(when(col("ra") && !col("rb"), 1)).as("n10"),
        count(when(!col("ra") && col("rb"), 1)).as("n01"),
        count(when(!col("ra") && !col("rb"), 1)).as("n00"))
      val k = m.select(col("*"),
        ((col("n11") + col("n00")) * 1.0 / col("n")).as("po"),
        (((col("n11") + col("n10")) * 1.0 / col("n"))
          * ((col("n11") + col("n01")) * 1.0 / col("n"))
          + ((col("n01") + col("n00")) * 1.0 / col("n"))
            * ((col("n10") + col("n00")) * 1.0 / col("n"))).as("pe"))
      k.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          Det.roundN(col("po"), 6).as("po"),
          Det.roundN(col("pe"), 6).as("pe"),
          when(col("pe") < 1.0,
            Det.roundN((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6))
            .otherwise(1.0).as("kappa"))
        .orderBy("n")
    },

    // Decision-stump feature importance by Gini impurity reduction: for
    // each candidate feature (length band, source, stopword-hit band),
    // the parent impurity minus the value-weighted split impurity for
    // predicting lang = 'en' — the EDA pass that ranks features before
    // any model exists. Each feature is one bounded-domain aggregate;
    // the weighted sum is r12-pinned and DECIMAL-summed.
    QueryDef.sql(
      "a_feature_importance", {
        def hits(ws: Seq[String]) =
          raw"len(list_filter(str_split_regex(trim(lower(text)), '\s+'), t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
        val en = graft.functions.TextFunctions.langMarkers.toMap.apply("en")
        def splitSql(feat: String, fexpr: String) =
          s"""SELECT '$feat' AS feature, $fexpr AS v,
             |    COUNT(*) AS nv,
             |    COUNT(CASE WHEN lang = 'en' THEN 1 END) AS c1
             |  FROM f GROUP BY 1, 2""".stripMargin
        s"""WITH f AS (
           |  SELECT lang, source, n_chars, ${hits(en)} AS sh
           |  FROM documents),
           |tot AS (
           |  SELECT COUNT(*) AS n_tot,
           |    COUNT(CASE WHEN lang = 'en' THEN 1 END) AS c1_tot
           |  FROM f),
           |sp AS (
           |  ${splitSql("len_band",
              "CAST(CASE WHEN n_chars < 150 THEN 0 WHEN n_chars < 300 THEN 1 WHEN n_chars < 450 THEN 2 ELSE 3 END AS VARCHAR)")}
           |  UNION ALL
           |  ${splitSql("source", "source")}
           |  UNION ALL
           |  ${splitSql("stop_band",
              "CAST(CASE WHEN sh = 0 THEN 0 WHEN sh <= 2 THEN 1 ELSE 2 END AS VARCHAR)")}),
           |g AS (
           |  SELECT feature, COUNT(*) AS n_values,
           |    CAST(SUM(CAST(${r12s(
               "nv * 1.0 / n_tot * 2.0 * (c1 * 1.0 / nv) * (1.0 - c1 * 1.0 / nv)")} AS DECIMAL(38,18))) AS DOUBLE) AS gini_split
           |  FROM sp, tot GROUP BY 1)
           |SELECT g.feature, g.n_values,
           |  ${roundN("2.0 * (t.c1_tot * 1.0 / t.n_tot) * (1.0 - t.c1_tot * 1.0 / t.n_tot)", 6)}
           |    AS gini_parent,
           |  ${roundN("g.gini_split", 6)} AS gini_split,
           |  ${roundN(
             "2.0 * (t.c1_tot * 1.0 / t.n_tot) * (1.0 - t.c1_tot * 1.0 / t.n_tot) - g.gini_split",
             6)} AS importance
           |FROM g, tot t ORDER BY feature""".stripMargin
      }) { (s, d) =>
      import graft.functions.TextFunctions
      import org.apache.spark.sql.types.DecimalType
      val feats = TextFunctions.tokenFeatures(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text")
      // staged: consumed by tot + three split aggregates — unstaged,
      // each consumer re-ran the documents⋈tokenFeatures subtree (10
      // documents scans in the plan; PlanAudit's rescan rule)
      val f = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .join(feats.select(col("doc_id"), col("hits_en").as("sh")),
          "doc_id")
        .staged
      val tot = f.agg(count(lit(1)).as("n_tot"),
        count(when(col("lang") === "en", 1)).as("c1_tot"))
      def split(feat: String, v: org.apache.spark.sql.Column) =
        f.select(lit(feat).as("feature"), v.cast("string").as("v"),
            col("lang"))
          .groupBy("feature", "v")
          .agg(count(lit(1)).as("nv"),
            count(when(col("lang") === "en", 1)).as("c1"))
      val sp = split("len_band",
          when(col("n_chars") < 150, 0).when(col("n_chars") < 300, 1)
            .when(col("n_chars") < 450, 2).otherwise(3))
        .unionByName(split("source", col("source")))
        .unionByName(split("stop_band",
          when(col("sh") === 0, 0).when(col("sh") <= 2, 1).otherwise(2)))
      val g = sp.crossJoin(broadcast(tot))
        .groupBy("feature")
        .agg(count(lit(1)).as("n_values"),
          sum(Det.roundN(col("nv") * 1.0 / col("n_tot") * 2.0
            * (col("c1") * 1.0 / col("nv"))
            * (lit(1.0) - col("c1") * 1.0 / col("nv")), 12)
            .cast(DecimalType(38, 18))).cast("double").as("gini_split"))
      val parent = (lit(2.0) * (col("c1_tot") * 1.0 / col("n_tot"))
        * (lit(1.0) - col("c1_tot") * 1.0 / col("n_tot")))
      g.crossJoin(broadcast(tot))
        .select(col("feature"), col("n_values"),
          Det.roundN(parent, 6).as("gini_parent"),
          Det.roundN(col("gini_split"), 6).as("gini_split"),
          Det.roundN(parent - col("gini_split"), 6).as("importance"))
        .orderBy("feature")
    },

    // Split-conformal prediction intervals per order priority: h56 thirds
    // give train/calibration/test; the "model" is the train-split group
    // mean (DECIMAL-exact); q-hat is the ⌈(n_cal+1)·0.9⌉-th smallest
    // calibration residual (EXACT rank selection, integer k); coverage is
    // measured on the held-out test split — the distribution-free ≥90%
    // guarantee, hash-checked end to end. Rank selection runs per group
    // over the calibration slice (a window per priority — at corpus scale
    // the same k-th statistic comes from a bottom-k sketch; the quantile
    // contract is identical).
    QueryDef.sql(
      "a_conformal_interval",
      s"""WITH f AS (
         |  SELECT o_orderkey, o_orderpriority AS grp, o_totalprice AS y,
         |    ${Det.h56Sql("CAST(o_orderkey AS VARCHAR)")} % 3 AS fold
         |  FROM orders),
         |m AS (
         |  SELECT grp, ${Det.dsumSql("y")} / COUNT(*) AS yhat,
         |    COUNT(*) AS n_train
         |  FROM f WHERE fold = 0 GROUP BY 1),
         |cal AS (
         |  SELECT f.grp, abs(f.y - m.yhat) AS score, f.o_orderkey
         |  FROM f JOIN m USING (grp) WHERE f.fold = 1),
         |ranked AS (
         |  SELECT grp, score,
         |    row_number() OVER (PARTITION BY grp ORDER BY score, o_orderkey) AS rn,
         |    COUNT(*) OVER (PARTITION BY grp) AS n_cal
         |  FROM cal),
         |qh AS (
         |  SELECT grp, n_cal, score AS qhat
         |  FROM ranked
         |  WHERE rn = ((n_cal + 1) * 9 + 9) // 10),
         |tst AS (
         |  SELECT f.grp, COUNT(*) AS n_test,
         |    COUNT(CASE WHEN abs(f.y - m.yhat) <= q.qhat THEN 1 END) AS covered
         |  FROM f JOIN m USING (grp) JOIN qh q USING (grp)
         |  WHERE f.fold = 2 GROUP BY 1)
         |SELECT t.grp AS o_orderpriority, m.n_train, q.n_cal, t.n_test,
         |  ${roundN("m.yhat", 6)} AS yhat, ${roundN("q.qhat", 6)} AS qhat,
         |  ${roundN("t.covered * 1.0 / t.n_test", 6)} AS coverage
         |FROM tst t JOIN m USING (grp) JOIN qh q USING (grp)
         |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderpriority").as("grp"), col("o_totalprice").as("y"),
        (Det.h56(col("o_orderkey").cast("string")) % 3).as("fold"))
      val m = f.filter(col("fold") === 0).groupBy("grp")
        .agg((Det.dsum(col("y")) / count(lit(1))).as("yhat"),
          count(lit(1)).as("n_train"))
      val cal = f.filter(col("fold") === 1).join(broadcast(m), "grp")
        .select(col("grp"), abs(col("y") - col("yhat")).as("score"),
          col("o_orderkey"))
      val wr = Window.partitionBy("grp").orderBy(col("score"),
        col("o_orderkey"))
      val qh = cal
        .withColumn("rn", row_number().over(wr).cast("long"))
        .withColumn("n_cal", count(lit(1)).over(Window.partitionBy("grp")))
        .filter(col("rn") === expr("((n_cal + 1) * 9 + 9) DIV 10"))
        .select(col("grp"), col("n_cal"), col("score").as("qhat"))
      val tst = f.filter(col("fold") === 2).join(broadcast(m), "grp")
        .join(broadcast(qh), "grp")
        .groupBy("grp").agg(count(lit(1)).as("n_test"),
          count(when(abs(col("y") - col("yhat")) <= col("qhat"), 1))
            .as("covered"))
      tst.join(broadcast(m.select(col("grp"), col("yhat"), col("n_train"))),
          "grp")
        .join(broadcast(qh.select(col("grp"), col("n_cal"), col("qhat"))),
          "grp")
        .select(col("grp").as("o_orderpriority"), col("n_train"),
          col("n_cal"), col("n_test"),
          Det.roundN(col("yhat"), 6).as("yhat"),
          Det.roundN(col("qhat"), 6).as("qhat"),
          Det.roundN(col("covered") * 1.0 / col("n_test"), 6).as("coverage"))
        .orderBy("o_orderpriority")
    },

    // Matryoshka-style dimension-truncation audit: per query, top-10 by
    // full 64-dim cosine vs top-10 using only the FIRST 16 dimensions —
    // overlap@10 measures how much retrieval quality a 4× cheaper index
    // keeps. Both rankings are brute-force over the broadcast query
    // batch (the exact baseline), windows partitioned per query.
    QueryDef.sql(
      "sim_dim_truncation_recall", {
        def cos(a: String, b: String) =
          s"CASE WHEN sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b)) > 0" +
            s" THEN list_dot_product($a,$b) / (sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b)))" +
            s" ELSE 0.0 END"
        s"""WITH e AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS emb,
           |    (embedding::DOUBLE[])[1:16] AS emb16
           |  FROM embeddings),
           |qs AS (SELECT vec_id AS query_id, emb AS qe, emb16 AS qe16
           |  FROM e WHERE vec_id < 8),
           |full_rank AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT q.query_id, e.vec_id,
           |      row_number() OVER (PARTITION BY q.query_id
           |        ORDER BY ${roundN(cos("e.emb", "q.qe"), 6)} DESC, e.vec_id) AS rk
           |    FROM e CROSS JOIN qs q WHERE e.vec_id <> q.query_id)
           |  WHERE rk <= 10),
           |trunc_rank AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT q.query_id, e.vec_id,
           |      row_number() OVER (PARTITION BY q.query_id
           |        ORDER BY ${roundN(cos("e.emb16", "q.qe16"), 6)} DESC, e.vec_id) AS rk
           |    FROM e CROSS JOIN qs q WHERE e.vec_id <> q.query_id)
           |  WHERE rk <= 10)
           |SELECT f.query_id,
           |  CAST(COUNT(t.vec_id) AS BIGINT) AS n_overlap,
           |  ${roundN("COUNT(t.vec_id) * 1.0 / 10", 6)} AS recall_at_10
           |FROM full_rank f LEFT JOIN trunc_rank t
           |  ON t.query_id = f.query_id AND t.vec_id = f.vec_id
           |GROUP BY 1 ORDER BY f.query_id""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      graft.expressions.GraftFunctions.register(s)
      import graft.expressions.GraftFunctions.cosine_sim
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          slice(col("embedding"), 1, 16).as("qe16"))
      def topk(simCol: org.apache.spark.sql.Column) = {
        val w = Window.partitionBy("query_id")
          .orderBy(desc("__sim"), col("vec_id"))
        e.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("__sim", Det.roundN(simCol, 6))
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= 10)
          .select(col("query_id"), col("vec_id"))
      }
      val full = topk(cosine_sim(col("embedding"), col("qe")))
      val trunc = topk(
        cosine_sim(slice(col("embedding"), 1, 16), col("qe16")))
        .withColumnRenamed("vec_id", "t_vec")
        .withColumnRenamed("query_id", "t_qid")
      full.join(trunc,
          col("query_id") === col("t_qid") && col("vec_id") === col("t_vec"),
          "left")
        .groupBy("query_id")
        .agg(count(col("t_vec")).as("n_overlap"),
          Det.roundN(count(col("t_vec")) * 1.0 / 10, 6).as("recall_at_10"))
        .orderBy("query_id")
    },

    // ---- LLM evaluation harness --------------------------------------
    // A deterministic synthetic eval run derived from the events table:
    // task = event_id mod 200, "model" = event_type (5 models), each
    // event one sample whose correctness/confidence draws come from the
    // cross-engine h56 hash with per-model accuracy thresholds. The four
    // queries below are the aggregate layer every model-eval pipeline
    // needs; all reduce to bounded groupBys (tasks × models × small
    // constants) over one scan.

    // pass@k with the exact unbiased estimator 1 − C(n−c,k)/C(n,k),
    // expanded as a product of k rational terms (all-double, identical
    // operation order on both engines; n−c<k short-circuits to 1).
    // Per-(model,task) n and c are one keyed aggregate; the per-model
    // average is a 6-dp-rounded decimal mean, order-free.
    QueryDef.sql(
      "e_pass_at_k", {
        def passK(k: Int) =
          if (k == 1) "CAST(c AS DOUBLE) / n"
          else s"CASE WHEN n - c < $k THEN 1.0 ELSE 1.0 - " +
            (0 until k).map(i => s"(CAST(n - c - $i AS DOUBLE) / (n - $i))")
              .mkString(" * ") + " END"
        s"""WITH runs AS (
           |  SELECT event_id % 200 AS task_id, event_type AS model,
           |    CASE WHEN ${Det.h56Sql("'c:' || CAST(event_id AS VARCHAR)")} % 1000
           |      < CASE event_type WHEN 'click' THEN 300 WHEN 'error' THEN 150
           |             WHEN 'purchase' THEN 500 WHEN 'signup' THEN 650
           |             ELSE 400 END
           |    THEN 1 ELSE 0 END AS correct
           |  FROM events),
           |pt AS (
           |  SELECT model, task_id, COUNT(*) AS n,
           |    CAST(SUM(correct) AS BIGINT) AS c
           |  FROM runs GROUP BY 1, 2),
           |pp AS (
           |  SELECT model, ${roundN(passK(1), 6)} AS p1,
           |    ${roundN(passK(5), 6)} AS p5, ${roundN(passK(10), 6)} AS p10
           |  FROM pt)
           |SELECT model, COUNT(*) AS n_tasks,
           |  ${roundN(s"CAST(SUM(CAST(p1 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)", 6)} AS pass_at_1,
           |  ${roundN(s"CAST(SUM(CAST(p5 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)", 6)} AS pass_at_5,
           |  ${roundN(s"CAST(SUM(CAST(p10 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)", 6)} AS pass_at_10
           |FROM pp GROUP BY 1 ORDER BY model""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val runs = evalRuns(s, d)
      val pt = runs.groupBy("model", "task_id")
        .agg(count(lit(1)).as("n"), sum("correct").cast("long").as("c"))
      def passK(k: Int) =
        if (k == 1) col("c").cast("double") / col("n")
        else when(col("n") - col("c") < k, lit(1.0)).otherwise(
          lit(1.0) - (0 until k).map(i =>
            (col("n") - col("c") - i).cast("double") / (col("n") - i))
            .reduce(_ * _))
      val pp = pt.select(col("model"), Det.roundN(passK(1), 6).as("p1"),
        Det.roundN(passK(5), 6).as("p5"), Det.roundN(passK(10), 6).as("p10"))
      def davg6(c: org.apache.spark.sql.Column) =
        Det.roundN(sum(c.cast(DecimalType(18, 6))).cast("double")
          / count(lit(1)), 6)
      pp.groupBy("model").agg(count(lit(1)).as("n_tasks"),
          davg6(col("p1")).as("pass_at_1"), davg6(col("p5")).as("pass_at_5"),
          davg6(col("p10")).as("pass_at_10"))
        .orderBy("model")
    },

    // Self-consistency: majority-vote answer per (model, task) over the
    // task's samples (answer = gold when the correctness draw passes,
    // else a hash-drawn distractor), then per-model accuracy of the
    // modal answer. The vote window is bounded by the 4-answer domain.
    QueryDef.sql(
      "e_self_consistency",
      s"""WITH runs AS (
         |  SELECT event_id % 200 AS task_id, event_type AS model,
         |    CAST(event_id % 200 AS BIGINT) % 4 AS gold,
         |    CASE WHEN ${Det.h56Sql("'c:' || CAST(event_id AS VARCHAR)")} % 1000
         |      < CASE event_type WHEN 'click' THEN 300 WHEN 'error' THEN 150
         |             WHEN 'purchase' THEN 500 WHEN 'signup' THEN 650
         |             ELSE 400 END
         |    THEN CAST(event_id % 200 AS BIGINT) % 4
         |    ELSE ${Det.h56Sql("'a:' || CAST(event_id AS VARCHAR)")} % 4
         |    END AS answer
         |  FROM events),
         |votes AS (
         |  SELECT model, task_id, gold, answer, COUNT(*) AS cnt
         |  FROM runs GROUP BY 1, 2, 3, 4),
         |modal AS (
         |  SELECT model, task_id, gold, answer,
         |    row_number() OVER (PARTITION BY model, task_id
         |                       ORDER BY cnt DESC, answer) AS rk
         |  FROM votes)
         |SELECT model, COUNT(*) AS n_tasks,
         |  ${roundN(
           "CAST(COUNT(CASE WHEN answer = gold THEN 1 END) AS DOUBLE) / COUNT(*)",
           6)} AS sc_accuracy
         |FROM modal WHERE rk = 1
         |GROUP BY 1 ORDER BY model""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val runs = evalRuns(s, d)
        .withColumn("gold", (col("task_id").cast("long")) % 4)
        .withColumn("answer", when(col("correct") === 1, col("gold"))
          .otherwise(Det.h56(concat(lit("a:"),
            col("event_id").cast("string"))) % 4))
      val votes = runs.groupBy("model", "task_id", "gold", "answer")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("model", "task_id")
        .orderBy(desc("cnt"), col("answer"))
      votes.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .groupBy("model")
        .agg(count(lit(1)).as("n_tasks"),
          Det.roundN(count(when(col("answer") === col("gold"), 1))
            .cast("double") / count(lit(1)), 6).as("sc_accuracy"))
        .orderBy("model")
    },

    // Model-cascade routing economics: a confidence-threshold sweep (the
    // 5-point grid broadcasts, constant fanout) — below the threshold
    // the sample routes to the 10×-cost big model. One conditional
    // aggregate per threshold: routed fraction, end-to-end accuracy,
    // mean cost — the cost/quality frontier a router is tuned on.
    QueryDef.sql(
      "e_cascade_cost",
      s"""WITH runs AS (
         |  SELECT event_id,
         |    CASE WHEN ${Det.h56Sql("'c:' || CAST(event_id AS VARCHAR)")} % 1000 < 350
         |         THEN 1 ELSE 0 END AS small_ok,
         |    CASE WHEN ${Det.h56Sql("'b:' || CAST(event_id AS VARCHAR)")} % 1000 < 750
         |         THEN 1 ELSE 0 END AS big_ok,
         |    CAST(${Det.h56Sql("'s:' || CAST(event_id AS VARCHAR)")} % 10000 AS DOUBLE)
         |      / 10000.0 AS conf
         |  FROM events),
         |grid(t) AS (VALUES (0.0), (0.25), (0.5), (0.75), (0.9))
         |SELECT t, COUNT(*) AS n,
         |  ${roundN("CAST(COUNT(CASE WHEN conf >= t THEN 1 END) AS DOUBLE) / COUNT(*)", 6)}
         |    AS frac_small,
         |  ${roundN(
           "CAST(SUM(CASE WHEN conf >= t THEN small_ok ELSE big_ok END) AS DOUBLE) / COUNT(*)",
           6)} AS accuracy,
         |  ${roundN(
           "CAST(SUM(CASE WHEN conf >= t THEN 10 ELSE 100 END) AS DOUBLE) / (10.0 * COUNT(*))",
           6)} AS avg_cost
         |FROM runs, grid GROUP BY t ORDER BY t""".stripMargin) { (s, d) =>
      import s.implicits._
      val runs = Tables.events(s, d).select(
        when(Det.h56(concat(lit("c:"), col("event_id").cast("string")))
          % 1000 < 350, 1).otherwise(0).as("small_ok"),
        when(Det.h56(concat(lit("b:"), col("event_id").cast("string")))
          % 1000 < 750, 1).otherwise(0).as("big_ok"),
        ((Det.h56(concat(lit("s:"), col("event_id").cast("string")))
          % 10000).cast("double") / 10000.0).as("conf"))
      val grid = Seq(0.0, 0.25, 0.5, 0.75, 0.9).toDF("t")
      runs.crossJoin(broadcast(grid))
        .groupBy("t")
        .agg(count(lit(1)).as("n"),
          Det.roundN(count(when(col("conf") >= col("t"), 1))
            .cast("double") / count(lit(1)), 6).as("frac_small"),
          Det.roundN(sum(when(col("conf") >= col("t"), col("small_ok"))
            .otherwise(col("big_ok"))).cast("double") / count(lit(1)), 6)
            .as("accuracy"),
          Det.roundN(sum(when(col("conf") >= col("t"), 10).otherwise(100))
            .cast("double") / (lit(10.0) * count(lit(1))), 6).as("avg_cost"))
        .orderBy("t")
    },

    // Pairwise win-rate matrix over the 5-model roster: per-(task,model)
    // INTEGER quality score (1000·wins + confidence draw — exact, no
    // float compare), task-keyed self-join under model_a < model_b
    // (bounded 10-pair fanout per task), win/tie counts as integers.
    QueryDef.sql(
      "e_winrate_matrix",
      s"""WITH runs AS (
         |  SELECT event_id % 200 AS task_id, event_type AS model,
         |    CASE WHEN ${Det.h56Sql("'c:' || CAST(event_id AS VARCHAR)")} % 1000
         |      < CASE event_type WHEN 'click' THEN 300 WHEN 'error' THEN 150
         |             WHEN 'purchase' THEN 500 WHEN 'signup' THEN 650
         |             ELSE 400 END
         |    THEN 1 ELSE 0 END AS correct,
         |    ${Det.h56Sql("'s:' || CAST(event_id AS VARCHAR)")} % 1000 AS draw
         |  FROM events),
         |q AS (
         |  SELECT model, task_id,
         |    CAST(SUM(correct) * 1000 + MAX(draw) AS BIGINT) AS s
         |  FROM runs GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a.model AS model_a, b.model AS model_b,
         |    COUNT(*) AS n_tasks,
         |    COUNT(CASE WHEN a.s > b.s THEN 1 END) AS wins_a,
         |    COUNT(CASE WHEN a.s = b.s THEN 1 END) AS ties
         |  FROM q a JOIN q b ON a.task_id = b.task_id AND a.model < b.model
         |  GROUP BY 1, 2)
         |SELECT model_a, model_b, n_tasks, wins_a, ties,
         |  ${roundN(
           "CASE WHEN n_tasks - ties > 0 THEN CAST(wins_a AS DOUBLE) / (n_tasks - ties) ELSE 0.5 END",
           6)} AS win_rate_a
         |FROM pairs ORDER BY model_a, model_b""".stripMargin) { (s, d) =>
      val runs = evalRuns(s, d)
        .withColumn("draw",
          Det.h56(concat(lit("s:"), col("event_id").cast("string"))) % 1000)
      val q = runs.groupBy("model", "task_id")
        .agg((sum("correct") * 1000 + max("draw")).cast("long").as("s"))
      val a = q.select(col("model").as("model_a"), col("task_id"),
        col("s").as("sa"))
      val b = q.select(col("model").as("model_b"),
        col("task_id").as("tb"), col("s").as("sb"))
      a.join(b, col("task_id") === col("tb")
          && col("model_a") < col("model_b"))
        .groupBy("model_a", "model_b")
        .agg(count(lit(1)).as("n_tasks"),
          count(when(col("sa") > col("sb"), 1)).as("wins_a"),
          count(when(col("sa") === col("sb"), 1)).as("ties"))
        .select(col("model_a"), col("model_b"), col("n_tasks"),
          col("wins_a"), col("ties"),
          Det.roundN(when(col("n_tasks") - col("ties") > 0,
            col("wins_a").cast("double") / (col("n_tasks") - col("ties")))
            .otherwise(0.5), 6).as("win_rate_a"))
        .orderBy("model_a", "model_b")
    },
    // LLM-judge LENGTH-BIAS audit — the standard sanity check on any
    // pairwise preference dataset: bucket judgments by the response
    // length difference and report the win rate per bucket plus the
    // global P(longer side wins). The synthetic judge mixes a quality
    // draw with a deliberate +150 bump for the longer response, so the
    // report MUST show the planted monotone bias — an audit that can't
    // detect its own plant would be worthless. One scan, bounded
    // 9-bucket output.
    QueryDef.sql(
      "e_judge_length_bias",
      s"""WITH p AS (
         |  SELECT event_id,
         |    ${Det.h56Sql("'la:' || CAST(event_id AS VARCHAR)")} % 900 + 100
         |      AS len_a,
         |    ${Det.h56Sql("'lb:' || CAST(event_id AS VARCHAR)")} % 900 + 100
         |      AS len_b,
         |    ${Det.h56Sql("'qa:' || CAST(event_id AS VARCHAR)")} % 1000 AS qa,
         |    ${Det.h56Sql("'qb:' || CAST(event_id AS VARCHAR)")} % 1000 AS qb
         |  FROM events),
         |v AS (
         |  SELECT len_a - len_b AS dlen,
         |    CASE WHEN qa + CASE WHEN len_a > len_b THEN 150 ELSE 0 END
         |           >= qb + CASE WHEN len_b > len_a THEN 150 ELSE 0 END
         |         THEN 1 ELSE 0 END AS a_wins
         |  FROM p),
         |b AS (
         |  SELECT LEAST(GREATEST(CAST(FLOOR(dlen / 200.0) AS INT), -4), 3)
         |      AS bucket,
         |    a_wins, CASE WHEN (dlen > 0) = (a_wins = 1) AND dlen <> 0
         |      THEN 1 ELSE 0 END AS longer_won
         |  FROM v)
         |SELECT CAST(bucket AS BIGINT) AS dlen_bucket, COUNT(*) AS n,
         |  ${roundN("CAST(SUM(a_wins) AS DOUBLE) / COUNT(*)", 6)}
         |    AS win_rate_a,
         |  ${roundN("CAST(SUM(longer_won) AS DOUBLE) / COUNT(*)", 6)}
         |    AS p_longer_wins
         |FROM b GROUP BY 1 ORDER BY dlen_bucket""".stripMargin) { (s, d) =>
      def h(p: String) = Det.h56(concat(lit(p),
        col("event_id").cast("string")))
      val p = Tables.events(s, d).select(
        (h("la:") % 900 + 100).as("len_a"), (h("lb:") % 900 + 100).as("len_b"),
        (h("qa:") % 1000).as("qa"), (h("qb:") % 1000).as("qb"))
      val v = p.select((col("len_a") - col("len_b")).as("dlen"),
        when(col("qa") + when(col("len_a") > col("len_b"), 150).otherwise(0)
          >= col("qb") + when(col("len_b") > col("len_a"), 150).otherwise(0),
          1).otherwise(0).as("a_wins"))
      v.select(
          least(greatest(floor(col("dlen") / 200.0).cast("int"), lit(-4)),
            lit(3)).as("bucket"),
          col("a_wins"),
          when((col("dlen") > 0) === (col("a_wins") === 1) && col("dlen") =!= 0,
            1).otherwise(0).as("longer_won"))
        .groupBy(col("bucket").cast("long").as("dlen_bucket"))
        .agg(count(lit(1)).as("n"),
          Det.roundN(sum("a_wins").cast("double") / count(lit(1)), 6)
            .as("win_rate_a"),
          Det.roundN(sum("longer_won").cast("double") / count(lit(1)), 6)
            .as("p_longer_wins"))
        .orderBy("dlen_bucket")
    },
    // Benchmark-contamination INFLATION report — the measurement that
    // links the curation layer (t_contamination finds the overlap) to
    // the eval layer: per model, accuracy on contaminated vs clean
    // tasks and the inflation delta. Contaminated tasks (membership =
    // every 10th task, the stand-in for the n-gram-overlap verdict)
    // carry a planted +250 correctness boost, and the report must
    // surface it per model — the evidence an eval audit needs before
    // trusting a leaderboard number. One conditional-sum scan.
    QueryDef.sql(
      "e_contamination_delta",
      s"""WITH runs AS (
         |  SELECT event_type AS model,
         |    CASE WHEN event_id % 200 % 10 = 0 THEN 1 ELSE 0 END AS contam,
         |    CASE WHEN ${Det.h56Sql("'c:' || CAST(event_id AS VARCHAR)")} % 1000
         |      < CASE event_type WHEN 'click' THEN 300 WHEN 'error' THEN 150
         |             WHEN 'purchase' THEN 500 WHEN 'signup' THEN 650
         |             ELSE 400 END
         |        + CASE WHEN event_id % 200 % 10 = 0 THEN 250 ELSE 0 END
         |    THEN 1 ELSE 0 END AS correct
         |  FROM events)
         |SELECT model,
         |  CAST(COUNT(CASE WHEN contam = 0 THEN 1 END) AS BIGINT) AS n_clean,
         |  CAST(COUNT(CASE WHEN contam = 1 THEN 1 END) AS BIGINT) AS n_contam,
         |  ${roundN(
           "CAST(SUM(CASE WHEN contam = 0 THEN correct ELSE 0 END) AS DOUBLE)" +
             " / COUNT(CASE WHEN contam = 0 THEN 1 END)", 6)} AS acc_clean,
         |  ${roundN(
           "CAST(SUM(CASE WHEN contam = 1 THEN correct ELSE 0 END) AS DOUBLE)" +
             " / COUNT(CASE WHEN contam = 1 THEN 1 END)", 6)} AS acc_contam,
         |  ${roundN(
           "CAST(SUM(CASE WHEN contam = 1 THEN correct ELSE 0 END) AS DOUBLE)" +
             " / COUNT(CASE WHEN contam = 1 THEN 1 END) - " +
             "CAST(SUM(CASE WHEN contam = 0 THEN correct ELSE 0 END) AS DOUBLE)" +
             " / COUNT(CASE WHEN contam = 0 THEN 1 END)", 6)} AS inflation
         |FROM runs GROUP BY 1 ORDER BY model""".stripMargin) { (s, d) =>
      val thr = when(col("event_type") === "click", 300)
        .when(col("event_type") === "error", 150)
        .when(col("event_type") === "purchase", 500)
        .when(col("event_type") === "signup", 650)
        .otherwise(400)
      val contam = when(col("event_id") % 200 % 10 === 0, 1).otherwise(0)
      val runs = Tables.events(s, d).select(
        col("event_type").as("model"), contam.as("contam"),
        when(Det.h56(concat(lit("c:"), col("event_id").cast("string")))
          % 1000 < thr + contam * 250, 1).otherwise(0).as("correct"))
      def accOf(c: Int) =
        sum(when(col("contam") === c, col("correct")).otherwise(0))
          .cast("double") / count(when(col("contam") === c, 1))
      runs.groupBy("model")
        .agg(count(when(col("contam") === 0, 1)).as("n_clean"),
          count(when(col("contam") === 1, 1)).as("n_contam"),
          Det.roundN(accOf(0), 6).as("acc_clean"),
          Det.roundN(accOf(1), 6).as("acc_contam"),
          Det.roundN(accOf(1) - accOf(0), 6).as("inflation"))
        .orderBy("model")
    },
  )

  /** Shared synthetic eval-run relation: task = event_id mod 200,
    * model = event_type, per-sample correctness from the h56 draw under
    * per-model accuracy thresholds. */
  private def evalRuns(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val thr = when(col("event_type") === "click", 300)
      .when(col("event_type") === "error", 150)
      .when(col("event_type") === "purchase", 500)
      .when(col("event_type") === "signup", 650)
      .otherwise(400)
    Tables.events(s, d).select(
      (col("event_id") % 200).as("task_id"),
      col("event_type").as("model"),
      col("event_id"),
      when(Det.h56(concat(lit("c:"), col("event_id").cast("string")))
        % 1000 < thr, 1).otherwise(0).as("correct"))
  }
}
