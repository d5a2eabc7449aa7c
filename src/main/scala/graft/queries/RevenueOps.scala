package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{Det, Tables}

/** Revenue-analytics depth: running-peak drawdown, period-over-period
  * segment migration, cohort lifetime-value curves. All running sums stay
  * in DECIMAL end to end (windows included), so every cumulative figure
  * is bit-exact and order-independent; doubles appear only in the final
  * rounded projection.
  */
object RevenueOps {

  private val roundN = Det.roundNSql _
  private val dec2 = DecimalType(18, 2)

  val defs: Seq[QueryDef] = Seq(

    // Max drawdown of the cumulative daily revenue curve: running sum →
    // running peak → peak-minus-current, plus the global maximum — the
    // risk-report shape (how far below the best-ever have we fallen).
    // The series is CALENDAR-bounded (one row per order day), so the
    // unpartitioned windows run over a ~2.4k-row relation regardless of
    // corpus size; the only corpus-sized work is the daily aggregate.
    QueryDef.sql(
      "w_max_drawdown",
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
         |  FROM orders GROUP BY 1),
         |c AS (
         |  SELECT d, rev,
         |    SUM(rev) OVER (ORDER BY d) AS cum
         |  FROM daily),
         |p AS (
         |  SELECT d, rev, cum, MAX(cum) OVER (ORDER BY d) AS peak
         |  FROM c)
         |SELECT d, ${roundN("CAST(rev AS DOUBLE)", 2)} AS revenue,
         |  ${roundN("CAST(cum AS DOUBLE)", 2)} AS cum_revenue,
         |  ${roundN("CAST(peak AS DOUBLE)", 2)} AS peak,
         |  ${roundN("CAST(peak - cum AS DOUBLE)", 2)} AS drawdown,
         |  ${roundN("CAST(MAX(peak - cum) OVER () AS DOUBLE)", 2)}
         |    AS max_drawdown
         |FROM p ORDER BY d""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(col("o_totalprice").cast(dec2)).as("rev"))
      val c = daily.withColumn("cum", sum("rev").over(Window.orderBy("d")))
      val p = c.withColumn("peak", max("cum").over(Window.orderBy("d")))
      p.select(col("d"),
          Det.roundN(col("rev").cast("double"), 2).as("revenue"),
          Det.roundN(col("cum").cast("double"), 2).as("cum_revenue"),
          Det.roundN(col("peak").cast("double"), 2).as("peak"),
          Det.roundN((col("peak") - col("cum")).cast("double"), 2)
            .as("drawdown"),
          Det.roundN(max(col("peak") - col("cum"))
            .over(Window.partitionBy()).cast("double"), 2)
            .as("max_drawdown"))
        .orderBy("d")
    },

    // Period-over-period segment migration matrix: customers banded by
    // total spend before/after 1998 (fixed DECIMAL-exact thresholds, so
    // band edges are engine-identical), counted per (early, late) cell
    // with each cell's share of its early band — who upgraded, who
    // churned toward 'none'. One customer-keyed aggregate + a 16-cell
    // matrix rollup.
    QueryDef.sql(
      "a_segment_migration",
      s"""WITH s AS (
         |  SELECT o_custkey,
         |    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
         |      THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS early,
         |    CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
         |      THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS late
         |  FROM orders GROUP BY 1),
         |b AS (
         |  SELECT o_custkey,
         |    CASE WHEN early = 0 THEN 'none' WHEN early < 700000 THEN 'low'
         |         WHEN early < 1200000 THEN 'mid' ELSE 'high' END AS band_early,
         |    CASE WHEN late = 0 THEN 'none' WHEN late < 700000 THEN 'low'
         |         WHEN late < 1200000 THEN 'mid' ELSE 'high' END AS band_late
         |  FROM s),
         |m AS (
         |  SELECT band_early, band_late, COUNT(*) AS n
         |  FROM b GROUP BY 1, 2)
         |SELECT band_early, band_late, n,
         |  ${roundN("n * 1.0 / SUM(n) OVER (PARTITION BY band_early)", 6)}
         |    AS share_of_early
         |FROM m ORDER BY band_early, band_late""".stripMargin) { (s, d) =>
      val zero = lit(0).cast(dec2)
      val cut = lit("1998-01-01").cast("timestamp")
      val sp = Tables.orders(s, d).groupBy("o_custkey").agg(
        sum(when(col("o_orderdate") < cut,
          col("o_totalprice").cast(dec2)).otherwise(zero))
          .cast("double").as("early"),
        sum(when(col("o_orderdate") >= cut,
          col("o_totalprice").cast(dec2)).otherwise(zero))
          .cast("double").as("late"))
      def band(c: org.apache.spark.sql.Column) =
        when(c === 0, "none").when(c < 700000, "low")
          .when(c < 1200000, "mid").otherwise("high")
      val m = sp.select(band(col("early")).as("band_early"),
          band(col("late")).as("band_late"))
        .groupBy("band_early", "band_late").agg(count(lit(1)).as("n"))
      m.select(col("band_early"), col("band_late"), col("n"),
          Det.roundN(col("n") * 1.0 /
            sum("n").over(Window.partitionBy("band_early")), 6)
            .as("share_of_early"))
        .orderBy("band_early", "band_late")
    },

    // Cohort LTV curves: customers grouped by first-order month, revenue
    // accumulated by cohort age in months — the retention-economics view
    // (does a cohort keep paying?). Cohort assignment is one keyed join
    // of orders against the per-customer first-order relation; the LTV
    // running sum is a per-cohort window over the (cohort × age) grid,
    // which is calendar² bounded.
    QueryDef.sql(
      "q_cohort_ltv",
      s"""WITH first_o AS (
         |  SELECT o_custkey, MIN(o_orderdate) AS first_dt
         |  FROM orders GROUP BY 1),
         |aged AS (
         |  SELECT o.o_custkey,
         |    year(f.first_dt) * 100 + month(f.first_dt) AS cohort_ym,
         |    (year(o.o_orderdate) * 12 + month(o.o_orderdate))
         |      - (year(f.first_dt) * 12 + month(f.first_dt)) AS age_months,
         |    CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
         |  FROM orders o JOIN first_o f ON f.o_custkey = o.o_custkey),
         |cell AS (
         |  SELECT cohort_ym, age_months,
         |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
         |    SUM(rev) AS rev
         |  FROM aged GROUP BY 1, 2)
         |SELECT CAST(cohort_ym AS BIGINT) AS cohort_ym,
         |  CAST(age_months AS BIGINT) AS age_months, n_active,
         |  ${roundN("CAST(rev AS DOUBLE)", 2)} AS revenue,
         |  ${roundN(
             "CAST(SUM(rev) OVER (PARTITION BY cohort_ym ORDER BY age_months) AS DOUBLE)",
             2)} AS cum_revenue
         |FROM cell ORDER BY cohort_ym, age_months""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val firstO = o.groupBy("o_custkey")
        .agg(min("o_orderdate").as("first_dt"))
      val aged = o.join(firstO, "o_custkey")
        .select(col("o_custkey"),
          (year(col("first_dt")) * 100 + month(col("first_dt")))
            .as("cohort_ym"),
          ((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            - (year(col("first_dt")) * 12 + month(col("first_dt"))))
            .as("age_months"),
          col("o_totalprice").cast(dec2).as("rev"))
      val cell = aged.groupBy("cohort_ym", "age_months")
        .agg(countDistinct("o_custkey").as("n_active"),
          sum("rev").as("rev"))
      cell.select(col("cohort_ym").cast("long").as("cohort_ym"),
          col("age_months").cast("long").as("age_months"), col("n_active"),
          Det.roundN(col("rev").cast("double"), 2).as("revenue"),
          Det.roundN(sum("rev").over(Window.partitionBy("cohort_ym")
            .orderBy("age_months")).cast("double"), 2).as("cum_revenue"))
        .orderBy("cohort_ym", "age_months")
    }
  )
}
