package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Det, Quality, Tables}
import graft.engine.Stage.syntax._

/** The reference's 12-check validation suite (validate_silver.py:317-338)
  * re-expressed through the config-driven [[graft.engine.Quality]] engine:
  * 4 null checks, a format check, 2 range checks, 2 business rules, a
  * referential-integrity check, 2 uniqueness checks (one deliberately
  * failing), and 2 freshness checks — same families, same
  * data_quality_logs output shape. The events freshness cutoff is
  * deliberately in the future so the FAIL branch is exercised (the
  * reference likewise records failing checks without aborting — SURVEY §5).
  */
object QualityQueries {

  private def suite(s: org.apache.spark.sql.SparkSession, d: String) = {
    import Quality._
    val checks = Seq(
      NotNull("lineitem", "l_quantity"),
      NotNull("orders", "o_custkey"),
      NotNull("customer", "c_name"),
      NotNull("events", "event_type"),
      Format("customer", "c_name", "^Customer#[0-9]+$"),
      Bounds("orders", "o_totalprice", lit(0.0), lit(1000000.0)),
      Bounds("lineitem", "l_discount", lit(0.0), lit(0.1)),
      Rule("lineitem", "business_rule_tax_exceeds_discount",
        col("l_tax") > col("l_discount")),
      Rule("orders", "business_rule_nonpositive_price",
        col("o_totalprice") <= 0),
      Referential("orders", "o_custkey", "customer", "c_custkey"),
      Unique("customer", "c_custkey"),
      Unique("events", "event_type"), // deliberately non-unique → FAIL path
      Freshness("orders", "o_orderdate", lit("1995-01-01").cast("timestamp")),
      Freshness("events", "ts", lit("2030-01-01").cast("timestamp")))
    Quality.run(Tables(s, d, _), checks)
  }

  private val rawSql =
    """raw AS (
      |  SELECT 'lineitem' AS table_name, 'null_check_l_quantity' AS quality_check,
      |         COUNT(*) AS records_checked,
      |         COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS records_failed
      |  FROM lineitem
      |  UNION ALL SELECT 'orders', 'null_check_o_custkey', COUNT(*),
      |    COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) FROM orders
      |  UNION ALL SELECT 'customer', 'null_check_c_name', COUNT(*),
      |    COUNT(CASE WHEN c_name IS NULL THEN 1 END) FROM customer
      |  UNION ALL SELECT 'events', 'null_check_event_type', COUNT(*),
      |    COUNT(CASE WHEN event_type IS NULL THEN 1 END) FROM events
      |  UNION ALL SELECT 'customer', 'format_check_c_name', COUNT(*),
      |    COUNT(CASE WHEN c_name IS NULL
      |               OR NOT regexp_full_match(c_name, '^Customer#[0-9]+$') THEN 1 END)
      |  FROM customer
      |  UNION ALL SELECT 'orders', 'range_check_o_totalprice', COUNT(*),
      |    COUNT(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 1000000.0 THEN 1 END)
      |  FROM orders
      |  UNION ALL SELECT 'lineitem', 'range_check_l_discount', COUNT(*),
      |    COUNT(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 END)
      |  FROM lineitem
      |  UNION ALL SELECT 'lineitem', 'business_rule_tax_exceeds_discount', COUNT(*),
      |    COUNT(CASE WHEN l_tax > l_discount THEN 1 END) FROM lineitem
      |  UNION ALL SELECT 'orders', 'business_rule_nonpositive_price', COUNT(*),
      |    COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) FROM orders
      |  UNION ALL SELECT 'orders', 'referential_check_o_custkey',
      |    (SELECT COUNT(*) FROM orders), COUNT(o.o_orderkey)
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NULL
      |  UNION ALL SELECT 'customer', 'unique_check_c_custkey',
      |    CAST(SUM(gn) AS BIGINT), CAST(SUM(CASE WHEN gn > 1 THEN gn ELSE 0 END) AS BIGINT)
      |  FROM (SELECT COUNT(*) AS gn FROM customer GROUP BY c_custkey)
      |  UNION ALL SELECT 'events', 'unique_check_event_type',
      |    CAST(SUM(gn) AS BIGINT), CAST(SUM(CASE WHEN gn > 1 THEN gn ELSE 0 END) AS BIGINT)
      |  FROM (SELECT COUNT(*) AS gn FROM events GROUP BY event_type)
      |  UNION ALL SELECT 'orders', 'freshness_check_o_orderdate',
      |    CAST(1 AS BIGINT),
      |    CAST(CASE WHEN MAX(o_orderdate) < TIMESTAMP '1995-01-01'
      |              OR MAX(o_orderdate) IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |  FROM orders
      |  UNION ALL SELECT 'events', 'freshness_check_ts', CAST(1 AS BIGINT),
      |    CAST(CASE WHEN MAX(ts) < TIMESTAMP '2030-01-01'
      |              OR MAX(ts) IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |  FROM events)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q_quality_report",
      s"""WITH $rawSql
         |SELECT table_name, quality_check, records_checked, records_failed,
         |  CASE WHEN records_checked > 0
         |       THEN ${Det.roundNSql("records_failed * 100.0 / records_checked", 2)}
         |       ELSE 0.0 END AS failure_rate,
         |  CASE WHEN records_failed = 0 THEN 'PASS' ELSE 'FAIL' END AS status
         |FROM raw ORDER BY table_name, quality_check""".stripMargin) { (s, d) =>
      suite(s, d).orderBy("table_name", "quality_check")
    },

    QueryDef.sql(
      "q_quality_score",
      s"""WITH $rawSql
         |SELECT COUNT(*) AS checks_total,
         |  COUNT(CASE WHEN records_failed = 0 THEN 1 END) AS checks_passed,
         |  ${Det.roundNSql("COUNT(CASE WHEN records_failed = 0 THEN 1 END) * 100.0 / COUNT(*)", 2)} AS quality_score
         |FROM raw""".stripMargin) { (s, d) =>
      Quality.score(suite(s, d))
    },

    // Per-group winsorization — outlier clamping at the [p05, p95]
    // exact-percentile band, the standard numeric-cleaning companion to
    // the range checks above: one percentile aggregate per group
    // (broadcast back), then a map-only clamp — no second shuffle, holds
    // on any fact-table size. Thresholds pinned via roundN so both
    // engines clamp against identical bounds; rows falling outside the
    // band carry a clipped flag for the quality log.
    QueryDef.sql(
      "q_winsorize",
      s"""WITH th AS (
         |  SELECT event_type,
         |    ${Det.roundNSql("quantile_cont(value, 0.05)", 4)} AS lo,
         |    ${Det.roundNSql("quantile_cont(value, 0.95)", 4)} AS hi
         |  FROM events GROUP BY 1)
         |SELECT e.event_id, e.value,
         |  CASE WHEN e.value IS NULL THEN NULL
         |    ELSE GREATEST(th.lo, LEAST(th.hi, e.value)) END AS value_w,
         |  CASE WHEN e.value IS NULL THEN NULL
         |    ELSE e.value < th.lo OR e.value > th.hi END AS clipped
         |FROM events e JOIN th USING (event_type)
         |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val th = ev.groupBy("event_type").agg(
        Det.roundN(expr("percentile(value, 0.05D)"), 4).as("lo"),
        Det.roundN(expr("percentile(value, 0.95D)"), 4).as("hi"))
      ev.join(broadcast(th), Seq("event_type"))
        .select(col("event_id"), col("value"),
          when(col("value").isNull, lit(null).cast("double"))
            .otherwise(greatest(col("lo"), least(col("hi"), col("value"))))
            .as("value_w"),
          when(col("value").isNull, lit(null).cast("boolean"))
            .otherwise(col("value") < col("lo") || col("value") > col("hi"))
            .as("clipped"))
        .orderBy("event_id")
    },

    // Robust per-group anomaly detection — median + MAD (median absolute
    // deviation), the outlier test that survives the outliers it hunts
    // (mean/stddev gates are dragged by the very tail they should flag).
    // Two percentile aggregates per group, each broadcast back; the flag
    // itself is a map-only comparison, so the shape is two small
    // shuffles + zero wide rows regardless of fact-table size. 4.4478 =
    // 3·1.4826 (3 sigma under the normal-consistency MAD scale). MAD=0
    // groups (constant-valued) flag any deviation, which is the desired
    // degenerate behavior — no division anywhere. Thresholds pinned via
    // roundN so both engines compare against identical doubles.
    QueryDef.sql(
      "q_anomaly_mad",
      s"""WITH med AS (
         |  SELECT event_type,
         |    ${Det.roundNSql("quantile_cont(value, 0.5)", 4)} AS med
         |  FROM events GROUP BY 1),
         |mad AS (
         |  SELECT e.event_type,
         |    ${Det.roundNSql("quantile_cont(ABS(e.value - med.med), 0.5)", 4)} AS mad
         |  FROM events e JOIN med USING (event_type) GROUP BY 1)
         |SELECT e.event_id, e.value, med.med, mad.mad,
         |  CASE WHEN e.value IS NULL THEN NULL
         |    ELSE ABS(e.value - med.med) > 4.4478 * mad.mad END AS is_outlier
         |FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
         |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val med = ev.groupBy("event_type").agg(
        Det.roundN(expr("percentile(value, 0.5D)"), 4).as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
      val mad = dev.groupBy("event_type").agg(
        Det.roundN(expr("percentile(abs(value - med), 0.5D)"), 4).as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .select(col("event_id"), col("value"), col("med"), col("mad"),
          when(col("value").isNull, lit(null).cast("boolean"))
            .otherwise(abs(col("value") - col("med")) > lit(4.4478) * col("mad"))
            .as("is_outlier"))
        .orderBy("event_id")
    },

    // Row-level quarantine routing — the productionized sibling of the
    // check-suite log (q_quality_report counts failures; this ROUTES the
    // failing rows, each carrying every reason it tripped, so the main
    // pipeline stays clean and the quarantine relation is re-processable
    // after a fix). Reasons are a sorted comma-joined string — a stable
    // scalar encoding both engines produce byte-identically. One scan,
    // predicate evaluation inline, no joins.
    QueryDef.sql(
      "q_quarantine_rows",
      s"""WITH flagged AS (
         |  SELECT event_id, user_id, event_type, value,
         |    concat_ws(',',
         |      CASE WHEN value IS NULL THEN 'null_value' END,
         |      CASE WHEN value < 0 THEN 'negative_value' END,
         |      CASE WHEN event_type NOT IN ('view', 'click', 'purchase',
         |        'signup', 'share') THEN 'unknown_type' END,
         |      CASE WHEN user_id IS NULL OR user_id < 0 THEN 'bad_user' END)
         |      AS reasons
         |  FROM events)
         |SELECT event_id, user_id, event_type, value, reasons
         |FROM flagged WHERE reasons <> ''
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val reasons = concat_ws(",",
        when(col("value").isNull, "null_value"),
        when(col("value") < 0, "negative_value"),
        when(!col("event_type").isin("view", "click", "purchase",
          "signup", "share"), "unknown_type"),
        when(col("user_id").isNull || col("user_id") < 0, "bad_user"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), reasons.as("reasons"))
        .filter(col("reasons") =!= "")
        .orderBy("event_id")
    },

    // k-anonymity suppression (k=10) over the (segment, nation)
    // quasi-identifier — the governance gate before publishing a
    // grouped extract: any cell smaller than k re-identifies, so small
    // cells collapse into one '*' row carrying their total. One grouped
    // count + a partitioned union; the suppressed mass is preserved
    // (column sums unchanged), just de-identified.
    QueryDef.sql(
      "a_kanon_report",
      s"""WITH g AS (
         |  SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
         |  FROM customer GROUP BY 1, 2),
         |big AS (
         |  SELECT c_mktsegment, c_nationkey, n, FALSE AS is_suppressed
         |  FROM g WHERE n >= 10),
         |small AS (
         |  SELECT '*' AS c_mktsegment, CAST(-1 AS BIGINT) AS c_nationkey,
         |    CAST(SUM(n) AS BIGINT) AS n, TRUE AS is_suppressed
         |  FROM g WHERE n < 10 HAVING COUNT(*) > 0)
         |SELECT * FROM big UNION ALL SELECT * FROM small
         |ORDER BY c_mktsegment, c_nationkey""".stripMargin) { (s, d) =>
      val g = Tables.customer(s, d)
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n"))
        .staged
      val big = g.filter(col("n") >= 10)
        .withColumn("is_suppressed", lit(false))
      val small = g.filter(col("n") < 10)
        .agg(sum(col("n")).as("n"), count(lit(1)).as("__cells"))
        .filter(col("__cells") > 0)
        .select(lit("*").as("c_mktsegment"),
          lit(-1L).as("c_nationkey"), col("n"), lit(true).as("is_suppressed"))
      big.unionByName(small)
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // Benford first-significant-digit forensics over order totals — the
    // classic fabricated-data / unit-mixing screen: natural multi-scale
    // money amounts follow P(d) = log10(1 + 1/d); a synthetic-uniform or
    // truncated source deviates loudly. Digit extraction is string-based
    // (FLOOR first: DuckDB CAST(double AS BIGINT) rounds, Spark
    // truncates) and the nine expected frequencies are interpolated from
    // the SAME Scala doubles into both programs, so every downstream
    // IEEE op (freqs, χ² terms) is bit-identical. One hash-aggregate +
    // a 1-row broadcast total; 9-row output at any corpus size.
    QueryDef.sql(
      "a_benford_digits", {
        val exp = (1 to 9).map(dd => dd -> math.log10(1 + 1.0 / dd))
        val expCase = exp.map { case (dd, p) => s"WHEN $dd THEN $p" }
          .mkString(" ")
        s"""WITH digits AS (
           |  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           |  FROM orders WHERE o_totalprice > 0),
           |counts AS (
           |  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
           |tot AS (SELECT COUNT(*) AS total FROM digits)
           |SELECT c.digit, c.n,
           |  ${Det.roundNSql("c.n / CAST(t.total AS DOUBLE)", 9)} AS obs_freq,
           |  ${Det.roundNSql(s"CASE c.digit $expCase END", 9)} AS exp_freq,
           |  ${Det.roundNSql(
               s"POWER(c.n - t.total * (CASE c.digit $expCase END), 2)" +
                 s" / (t.total * (CASE c.digit $expCase END))", 6)} AS chi2_term
           |FROM counts c CROSS JOIN tot t
           |ORDER BY c.digit""".stripMargin
      }) { (s, d) =>
      val exp = (1 to 9).map(dd => dd -> math.log10(1 + 1.0 / dd))
      val expCol = exp.foldLeft(lit(null).cast("double")) {
        case (acc, (dd, p)) => when(col("digit") === dd, lit(p)).otherwise(acc)
      }
      val digits = Tables.orders(s, d)
        .filter(col("o_totalprice") > 0)
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
      val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = digits.agg(count(lit(1)).as("total"))
      counts.crossJoin(broadcast(tot))
        .withColumn("exp_freq_raw", expCol)
        .select(col("digit"), col("n"),
          Det.roundN(col("n") / col("total").cast("double"), 9).as("obs_freq"),
          Det.roundN(col("exp_freq_raw"), 9).as("exp_freq"),
          Det.roundN(pow(col("n") - col("total") * col("exp_freq_raw"), 2)
            / (col("total") * col("exp_freq_raw")), 6).as("chi2_term"))
        .orderBy("digit")
    },
  )
}
