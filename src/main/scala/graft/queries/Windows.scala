package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}

/** Window functions, sorts/top-k, and set ops (SURVEY §2.6–§2.8) over the
  * `events` table treated as the covid-style time series: user_id ≈ country,
  * day(ts) ≈ record_date, value ≈ case counts.
  *
  * Every window here partitions by a real key (user_id) so the plan is a
  * single shuffle on the partition key — linear at 100 TB. The only global
  * window (w3 ranking) runs over an already-aggregated, cardinality-bounded
  * input (one row per customer), mirroring the reference's country-level
  * rank (model_gold.py:319-330).
  */
object Windows {

  /** Shared daily-rollup base: one row per (user_id, day). */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(Det.dsum(col("value")).as("v"))

  private val dailySql =
    """daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // W1 per-group diff with first-row→0 (pandas groupby().diff().fillna(0)).
    // Ref: transform_silver.py:312-314; SURVEY §7.4.1.
    QueryDef.sql(
      "w1_group_diff",
      s"""WITH $dailySql
         |SELECT user_id, d, v,
         |  ${Det.roundNSql("COALESCE(v - lag(v, 1) OVER (PARTITION BY user_id ORDER BY d), 0)", 2)} AS daily_delta
         |FROM daily ORDER BY user_id, d""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("d")
      daily(s, d)
        .withColumn("daily_delta",
          Det.roundN(coalesce(col("v") - lag(col("v"), 1).over(w), lit(0)), 2))
        .orderBy("user_id", "d")
    },

    // W2 trailing 7-row mean with shrinking frame at group start
    // (pandas rolling(7, min_periods=1) ≡ rowsBetween(-6, 0)).
    // Ref: transform_silver.py:316-317; SURVEY §7.4.2.
    QueryDef.sql(
      "w2_rolling_avg",
      s"""WITH $dailySql
         |SELECT user_id, d, v,
         |  ${Det.roundNSql("AVG(v) OVER (PARTITION BY user_id ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 2)} AS weekly_avg
         |FROM daily ORDER BY user_id, d""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("d").rowsBetween(-6, 0)
      daily(s, d)
        .withColumn("weekly_avg", Det.roundN(avg(col("v")).over(w), 2))
        .orderBy("user_id", "d")
    },

    // W3 + O3 ranking then top-k. TakeOrdered form: orderBy+limit compiles
    // to TakeOrderedAndProject — a per-partition top-5 then a 5-row merge,
    // no single-partition exchange of the full per-customer aggregate
    // (unbounded cardinality at 100×). The rank window runs AFTER the
    // limit, over 5 rows. Ref: model_gold.py:319-335.
    QueryDef.sql(
      "w3_rank_topk",
      s"""SELECT o_custkey, total_spent, rank FROM (
         |  SELECT o_custkey,
         |    ${Det.dsumSql("o_totalprice")} AS total_spent,
         |    row_number() OVER (ORDER BY ${Det.dsumSql("o_totalprice")} DESC, o_custkey) AS rank
         |  FROM orders GROUP BY o_custkey)
         |WHERE rank <= 5 ORDER BY rank""".stripMargin) { (s, d) =>
      val ord = Seq(desc("total_spent"), asc("o_custkey"))
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(Det.dsum(col("o_totalprice")).as("total_spent"))
        .orderBy(ord: _*)
        .limit(5)
        .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
        .orderBy("rank")
    },

    // W4 lag(1) / lag(7) growth metrics with zero-guard → NULL (the
    // reference's weekly_growth uses NULL, not 0 — SURVEY §7.4.5).
    // Ref: aggregate_gold.py:220-245.
    QueryDef.sql(
      "w4_lag_growth",
      s"""WITH g AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT d, v,
        |    lag(v, 1) OVER (ORDER BY d) AS prev_day,
        |    lag(v, 7) OVER (ORDER BY d) AS week_ago
        |  FROM g)
         |SELECT d, v, prev_day, week_ago,
         |  ${Det.roundNSql("v - prev_day", 2)} AS daily_increase,
         |  CASE WHEN week_ago > 0 THEN ${Det.roundNSql("(v - week_ago) / week_ago * 100", 2)} END AS weekly_growth_pct
         |FROM lagged ORDER BY d""".stripMargin) { (s, d) =>
      val g = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(Det.dsum(col("value")).as("v"))
      val w = Window.orderBy("d")
      g.withColumn("prev_day", lag(col("v"), 1).over(w))
        .withColumn("week_ago", lag(col("v"), 7).over(w))
        .withColumn("daily_increase", Det.roundN(col("v") - col("prev_day"), 2))
        .withColumn("weekly_growth_pct",
          when(col("week_ago") > 0,
            Det.roundN((col("v") - col("week_ago")) / col("week_ago") * 100, 2)))
        .orderBy("d")
    },

    // W5 last-7-vs-rest trend classifier with the reference's edge cases:
    // <2 rows → STABLE; no earlier rows / earlier mean 0 → STABLE; ±10%
    // thresholds. Ref: model_gold.py:463-492; SURVEY §7.4.8.
    QueryDef.sql(
      "w5_trend_classifier",
      s"""WITH $dailySql,
         |ranked AS (
         |  SELECT user_id, v,
         |    row_number() OVER (PARTITION BY user_id ORDER BY d DESC) AS rn
         |  FROM daily),
         |stats AS (
         |  SELECT user_id, COUNT(*) AS n_days,
         |    AVG(CASE WHEN rn <= 7 THEN v END) AS recent_avg,
         |    AVG(CASE WHEN rn > 7 THEN v END) AS earlier_avg
         |  FROM ranked GROUP BY user_id)
         |SELECT user_id, n_days,
         |  ${Det.roundNSql("recent_avg", 2)} AS recent_avg,
         |  ${Det.roundNSql("earlier_avg", 2)} AS earlier_avg,
         |  CASE
         |    WHEN n_days < 2 OR earlier_avg IS NULL OR earlier_avg = 0 THEN 'STABLE'
         |    WHEN (recent_avg - earlier_avg) / earlier_avg * 100 > 10 THEN 'INCREASING'
         |    WHEN (recent_avg - earlier_avg) / earlier_avg * 100 < -10 THEN 'DECREASING'
         |    ELSE 'STABLE' END AS trend_direction
         |FROM stats ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(desc("d"))
      val stats = daily(s, d)
        .withColumn("rn", row_number().over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          avg(when(col("rn") <= 7, col("v"))).as("recent_avg"),
          avg(when(col("rn") > 7, col("v"))).as("earlier_avg"))
      val pct = (col("recent_avg") - col("earlier_avg")) / col("earlier_avg") * 100
      stats.select(
        col("user_id"), col("n_days"),
        Det.roundN(col("recent_avg"), 2).as("recent_avg"),
        Det.roundN(col("earlier_avg"), 2).as("earlier_avg"),
        when(col("n_days") < 2 || col("earlier_avg").isNull ||
          col("earlier_avg") === 0, "STABLE")
          .when(pct > 10, "INCREASING")
          .when(pct < -10, "DECREASING")
          .otherwise("STABLE").as("trend_direction"))
        .orderBy("user_id")
    },

    // Per-group top-k (every customer's 3 largest orders): rank-filter
    // over a KEYED window. Safe at scale unlike a global rank — the
    // partition key bounds each window, and Spark 4's WindowGroupLimit
    // pushes the k-filter into the shuffle (per-partition top-k before
    // the exchange, like TakeOrdered but per group).
    QueryDef.sql(
      "o_topk_per_group",
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")
    },

    // O2 presentation sort (DESC with tiebreak). Ref: model_gold.py:116,127.
    QueryDef.sql(
      "o2_presentation_sort",
      """SELECT n_name, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_customers DESC, n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
        .orderBy(desc("n_customers"), asc("n_name"))
    },

    // O3 top-5 / bottom-5 extraction. Ref: model_gold.py:334-335.
    QueryDef.sql(
      "o3_top_bottom_k",
      s"""WITH totals AS (
         |  SELECT o_custkey, ${Det.dsumSql("o_totalprice")} AS total_spent
         |  FROM orders GROUP BY o_custkey)
         |SELECT * FROM (
         |  (SELECT 'TOP' AS bucket, o_custkey, total_spent FROM totals
         |   ORDER BY total_spent DESC, o_custkey LIMIT 5)
         |  UNION ALL
         |  (SELECT 'BOTTOM', o_custkey, total_spent FROM totals
         |   ORDER BY total_spent ASC, o_custkey LIMIT 5))
         |ORDER BY bucket, o_custkey""".stripMargin) { (s, d) =>
      val totals = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(Det.dsum(col("o_totalprice")).as("total_spent"))
      val top = totals.orderBy(desc("total_spent"), asc("o_custkey")).limit(5)
        .withColumn("bucket", lit("TOP"))
      val bottom = totals.orderBy(asc("total_spent"), asc("o_custkey")).limit(5)
        .withColumn("bucket", lit("BOTTOM"))
      top.unionByName(bottom)
        .select("bucket", "o_custkey", "total_spent")
        .orderBy("bucket", "o_custkey")
    },

    // U1 UNION ALL of heterogeneous sources, name-aligned.
    // Ref: validate_silver.py:245-250.
    QueryDef.sql(
      "u1_union_all",
      """SELECT * FROM (
        |  SELECT DISTINCT event_type AS name, 'events' AS src FROM events
        |  UNION ALL
        |  SELECT r_name, 'region' FROM region)
        |ORDER BY src, name""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_type").as("name")).distinct()
        .withColumn("src", lit("events"))
      val r = Tables.region(s, d)
        .select(col("r_name").as("name"))
        .withColumn("src", lit("region"))
      e.unionByName(r).orderBy("src", "name")
    },
  )
}
