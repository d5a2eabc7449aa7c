package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{Det, Tables}

/** Robust statistics + sequence-pattern + privacy-diversity operators:
  * l-diversity auditing (the sensitive-attribute axis k-anonymity misses),
  * delta-method confidence intervals for ratio metrics (the correct CI for
  * revenue-per-unit style KPIs, where naive per-row variance is wrong),
  * MATCH_RECOGNIZE-style event-sequence regex detection (a SQL-standard
  * feature Spark lacks natively), and an iterated Huber M-estimator
  * (outlier-robust location, the M-estimation workhorse).
  */
object RobustOps {

  private val roundN = Det.roundNSql _
  private def r12s(e: String) = Det.roundNSql(e, 12)
  private def r12(c: org.apache.spark.sql.Column) = Det.roundN(c, 12)

  val defs: Seq[QueryDef] = Seq(

    // l-diversity audit: k-anonymity (a_kanon_report) bounds GROUP SIZE,
    // but a large group whose members all share one sensitive value still
    // leaks it — l-diversity requires each quasi-identifier cell to carry
    // >= l distinct sensitive values, and the max-share bound blocks
    // near-homogeneous cells. Sensitive attribute here: the account-balance
    // band. Two nested aggregates — (QI, band) counts, then per-QI rollup —
    // both map-side combinable.
    QueryDef.sql(
      "a_l_diversity",
      """WITH b AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS band
        |  FROM customer),
        |cnt AS (
        |  SELECT c_mktsegment, c_nationkey, band, COUNT(*) AS c
        |  FROM b GROUP BY 1, 2, 3),
        |cell AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS l, MAX(c) AS max_c
        |  FROM cnt GROUP BY 1, 2)
        |SELECT c_mktsegment, c_nationkey, n, l,
        |  """.stripMargin +
        s"""${roundN("max_c * 1.0 / n", 6)} AS p_max,
           |  l >= 3 AND max_c * 2 <= n AS is_diverse
           |FROM cell ORDER BY c_mktsegment, c_nationkey""".stripMargin) { (s, d) =>
      val b = Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 2000).cast("long").as("band"))
      val cnt = b.groupBy("c_mktsegment", "c_nationkey", "band")
        .agg(count(lit(1)).as("c"))
      cnt.groupBy("c_mktsegment", "c_nationkey")
        .agg(sum("c").as("n"), count(lit(1)).as("l"), max("c").as("max_c"))
        .select(col("c_mktsegment"), col("c_nationkey"), col("n"), col("l"),
          Det.roundN(col("max_c") * 1.0 / col("n"), 6).as("p_max"),
          (col("l") >= 3 && col("max_c") * 2 <= col("n")).as("is_diverse"))
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // Delta-method CI for a RATIO metric — revenue per unit shipped, by
    // supplier nation. Var(x̄/ȳ) ≈ (σx² − 2Rσxy + R²σy²) / (n·ȳ²); the
    // covariance term is what naive treatments drop, and it flips the CI
    // width whenever numerator and denominator correlate (they always do).
    // One broadcast-dim star join + one DECIMAL-summed aggregate; the CI
    // math is closed-form per group.
    QueryDef.sql(
      "a_ratio_delta_ci",
      s"""WITH j AS (
         |  SELECT n.n_name,
         |    l.l_extendedprice * (1 - l.l_discount) AS x,
         |    CAST(l.l_quantity AS DOUBLE) AS y
         |  FROM lineitem l
         |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |  JOIN nation n ON n.n_nationkey = s.s_nationkey),
         |m AS (
         |  SELECT n_name, COUNT(*) AS n,
         |    ${Det.dsumSql("x", 6)} AS sx, ${Det.dsumSql("y", 6)} AS sy,
         |    ${Det.dsumSql("x * x", 4)} AS sxx,
         |    ${Det.dsumSql("y * y", 4)} AS syy,
         |    ${Det.dsumSql("x * y", 4)} AS sxy
         |  FROM j GROUP BY 1),
         |g AS (
         |  SELECT n_name, n, sx / sy AS ratio,
         |    sx / n AS mx, sy / n AS my,
         |    sxx / n - (sx / n) * (sx / n) AS vx,
         |    syy / n - (sy / n) * (sy / n) AS vy,
         |    sxy / n - (sx / n) * (sy / n) AS cxy
         |  FROM m),
         |se AS (
         |  SELECT n_name, n, ratio,
         |    sqrt(GREATEST(vx - 2 * ratio * cxy + ratio * ratio * vy, 0.0)
         |      / n) / my AS se
         |  FROM g)
         |SELECT n_name, n, ${roundN("ratio", 6)} AS ratio,
         |  ${roundN("se", 6)} AS se,
         |  ${roundN("ratio - 1.96 * se", 6)} AS ci_lo,
         |  ${roundN("ratio + 1.96 * se", 6)} AS ci_hi
         |FROM se ORDER BY n_name""".stripMargin) { (s, d) =>
      val j = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("n_name"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("x"),
          col("l_quantity").cast("double").as("y"))
      val m = j.groupBy("n_name").agg(
        count(lit(1)).as("n"),
        Det.dsum(col("x"), 6).as("sx"), Det.dsum(col("y"), 6).as("sy"),
        Det.dsum(col("x") * col("x"), 4).as("sxx"),
        Det.dsum(col("y") * col("y"), 4).as("syy"),
        Det.dsum(col("x") * col("y"), 4).as("sxy"))
      val g = m.select(col("n_name"), col("n"),
        (col("sx") / col("sy")).as("ratio"),
        (col("sx") / col("n")).as("mx"), (col("sy") / col("n")).as("my"),
        (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))).as("vx"),
        (col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n"))).as("vy"),
        (col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))).as("cxy"))
      val se = g.select(col("n_name"), col("n"), col("ratio"),
        (sqrt(greatest(col("vx") - lit(2) * col("ratio") * col("cxy")
          + col("ratio") * col("ratio") * col("vy"), lit(0.0)) / col("n"))
          / col("my")).as("se"))
      se.select(col("n_name"), col("n"),
          Det.roundN(col("ratio"), 6).as("ratio"),
          Det.roundN(col("se"), 6).as("se"),
          Det.roundN(col("ratio") - lit(1.96) * col("se"), 6).as("ci_lo"),
          Det.roundN(col("ratio") + lit(1.96) * col("se"), 6).as("ci_hi"))
        .orderBy("n_name")
    },

    // MATCH_RECOGNIZE-style sequence pattern detection — the SQL-standard
    // row-pattern feature Spark has no native operator for, expressed as
    // ordered per-group reassembly + regex. Each (user, day)'s events
    // collapse to an initials string in (ts, event_id) order; the regex
    // 'v[ce]*p' counts view→purchase conversions with clicks/errors
    // between (both engines resolve it identically — the character class
    // excludes 'v'/'p', so match boundaries are unambiguous), and 'e{2}$'
    // flags sessions that END in an error streak. The per-group state is
    // one day of one user's events — bounded — and groups shuffle as
    // (user, day) keys, so the shape is corpus-linear.
    QueryDef.sql(
      "w_pattern_match",
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      ELSE 'e' END AS ini
        |  FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    string_agg(ini, '' ORDER BY ts, event_id) AS seq
        |  FROM e GROUP BY 1, 2)
        |SELECT user_id, day, seq,
        |  CAST(len(seq) AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'v[ce]*p')) AS BIGINT)
        |    AS n_conversions,
        |  regexp_matches(seq, 'e{2}$') AS ends_in_error_streak
        |FROM g ORDER BY user_id, day""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"),
          when(col("event_type") === "view", "v")
            .when(col("event_type") === "click", "c")
            .when(col("event_type") === "purchase", "p")
            .when(col("event_type") === "signup", "s")
            .otherwise("e").as("ini"))
      e.groupBy("user_id", "day")
        .agg(collect_list(struct(col("ts"), col("event_id"), col("ini")))
          .as("__evs"))
        .withColumn("seq",
          expr("array_join(transform(array_sort(__evs), x -> x.ini), '')"))
        .select(col("user_id"), col("day"), col("seq"),
          length(col("seq")).cast("long").as("n_events"),
          expr("CAST(size(regexp_extract_all(seq, 'v[ce]*p', 0)) AS BIGINT)")
            .as("n_conversions"),
          col("seq").rlike("e{2}$").as("ends_in_error_streak"))
        .orderBy("user_id", "day")
    },

    // Iterated Huber M-estimator of location per event type: mean-start,
    // fixed MAD-free scale (population σ), two ψ-clip update rounds at
    // k = 1.345σ — the robust mean that shrugs off heavy tails where the
    // plain mean chases them. Every update is a broadcast of 5 per-type
    // scalars back onto the scan + one DECIMAL-summed aggregate; the
    // clipped deltas are r12-pinned so both engines walk identical
    // iterates. n_clipped reports how many rows the final ψ saturated.
    QueryDef.sql(
      "a_huber_mean", {
        val k = "1.345"
        s"""WITH v AS (
           |  SELECT event_type, value AS x FROM events WHERE value IS NOT NULL),
           |st AS MATERIALIZED (
           |  SELECT event_type, COUNT(*) AS n,
           |    ${Det.dsumSql("x", 6)} / COUNT(*) AS m0,
           |    sqrt(GREATEST(${Det.dsumSql("x * x", 4)} / COUNT(*)
           |      - (${Det.dsumSql("x", 6)} / COUNT(*))
           |        * (${Det.dsumSql("x", 6)} / COUNT(*)), 0.0)) AS s
           |  FROM v GROUP BY 1),
           |i1 AS MATERIALIZED (
           |  SELECT v.event_type, st.n, st.m0, st.s,
           |    st.m0 + CAST(SUM(CAST(${r12s(s"GREATEST(-$k * st.s, LEAST($k * st.s, v.x - st.m0))")} AS DECIMAL(38,18))) AS DOUBLE) / st.n AS m1
           |  FROM v JOIN st USING (event_type)
           |  GROUP BY 1, 2, 3, 4),
           |i2 AS MATERIALIZED (
           |  SELECT v.event_type, i1.n, i1.m0, i1.s, i1.m1,
           |    i1.m1 + CAST(SUM(CAST(${r12s(s"GREATEST(-$k * i1.s, LEAST($k * i1.s, v.x - i1.m1))")} AS DECIMAL(38,18))) AS DOUBLE) / i1.n AS m2,
           |    COUNT(CASE WHEN abs(v.x - i1.m1) > $k * i1.s THEN 1 END) AS n_clipped
           |  FROM v JOIN i1 USING (event_type)
           |  GROUP BY 1, 2, 3, 4, 5)
           |SELECT event_type, n, ${roundN("m0", 6)} AS mean,
           |  ${roundN("s", 6)} AS scale, ${roundN("m2", 6)} AS huber_mean,
           |  n_clipped
           |FROM i2 ORDER BY event_type""".stripMargin
      }) { (s, d) =>
      val kk = lit(1.345)
      val v = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), col("value").as("x"))
      val st = v.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          (Det.dsum(col("x"), 6) / count(lit(1))).as("m0"),
          sqrt(greatest(Det.dsum(col("x") * col("x"), 4) / count(lit(1))
            - (Det.dsum(col("x"), 6) / count(lit(1)))
              * (Det.dsum(col("x"), 6) / count(lit(1))), lit(0.0))).as("s"))
      val i1 = v.join(broadcast(st), Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("m0"), col("s"))
        .agg((col("m0") + sum(r12(greatest(-kk * col("s"),
            least(kk * col("s"), col("x") - col("m0"))))
            .cast(DecimalType(38, 18))).cast("double") / col("n")).as("m1"))
      val i2 = v.join(broadcast(i1), Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("m0"), col("s"), col("m1"))
        .agg(
          (col("m1") + sum(r12(greatest(-kk * col("s"),
            least(kk * col("s"), col("x") - col("m1"))))
            .cast(DecimalType(38, 18))).cast("double") / col("n")).as("m2"),
          count(when(abs(col("x") - col("m1")) > kk * col("s"), 1))
            .as("n_clipped"))
      i2.select(col("event_type"), col("n"),
          Det.roundN(col("m0"), 6).as("mean"),
          Det.roundN(col("s"), 6).as("scale"),
          Det.roundN(col("m2"), 6).as("huber_mean"),
          col("n_clipped"))
        .orderBy("event_type")
    }
  )
}
