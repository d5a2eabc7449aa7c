package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{Det, Tables}

/** Applied composite surfaces: floored running state via the prefix-min
  * identity (the "can't go below zero" balance no plain window seems to
  * express), edit-distance blocking dedup, and nearest-entity assignment
  * against a broadcast anchor set.
  */
object AppliedOps {

  private val roundN = Det.roundNSql _

  val defs: Seq[QueryDef] = Seq(

    // Running balance FLOORED AT ZERO per user — credits (purchase,
    // signup) add, debits (error, click) subtract, and the balance
    // saturates at 0 instead of going negative. The recurrence
    // B_n = max(0, B_{n-1} + x_n) looks inherently sequential, but it has
    // the closed form B_n = cum_n − min(0, min_{k≤n} cum_k) … on a zero
    // start — two stock windows (running sum + running min), no recursion,
    // no UDAF, fully parallel per user. DECIMAL throughout.
    QueryDef.sql(
      "w_capped_running_sum",
      s"""WITH x AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN event_type IN ('purchase', 'signup')
         |         THEN CAST(value AS DECIMAL(18,2))
         |         ELSE -CAST(value AS DECIMAL(18,2)) END AS delta
         |  FROM events),
         |c0 AS (
         |  SELECT user_id, ts, event_id, delta,
         |    SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                     ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM x),
         |c AS (
         |  SELECT user_id, ts, event_id, delta, cum,
         |    MIN(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                   ROWS UNBOUNDED PRECEDING) AS run_min
         |  FROM c0)
         |SELECT user_id, event_id, ${roundN("CAST(delta AS DOUBLE)", 2)} AS delta,
         |  ${roundN("CAST(cum AS DOUBLE)", 2)} AS cum,
         |  ${roundN(
             "CAST(cum - LEAST(CAST(0 AS DECIMAL(18,2)), run_min) AS DOUBLE)",
             2)} AS balance
         |FROM c ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      val dec2 = DecimalType(18, 2)
      val x = Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"),
        when(col("event_type").isin("purchase", "signup"),
          col("value").cast(dec2))
          .otherwise(-col("value").cast(dec2)).as("delta"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = x.withColumn("cum", sum("delta").over(w))
        .withColumn("run_min", min("cum").over(w))
      c.select(col("user_id"), col("event_id"),
          Det.roundN(col("delta").cast("double"), 2).as("delta"),
          Det.roundN(col("cum").cast("double"), 2).as("cum"),
          Det.roundN((col("cum")
            - least(lit(0).cast(dec2), col("run_min"))).cast("double"), 2)
            .as("balance"),
          col("ts"))
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    },

    // Edit-distance dedup surface: within each nation block, supplier
    // names whose Levenshtein distance is <= 2 under the '<' self-join —
    // the classic blocked fuzzy-match shape with the canonical metric
    // (exact DP distance, integer, engine-identical) instead of the
    // q-gram approximations. Block sizes are nation-bounded, so the
    // quadratic term is per-block, never corpus-wide.
    QueryDef.sql(
      "f_levenshtein_dedup",
      """WITH s AS (
        |  SELECT s_suppkey, s_nationkey,
        |    lower(trim(s_name)) || CASE WHEN s_suppkey % 9 = 0
        |      THEN 'x' ELSE '' END AS nm
        |  FROM supplier)
        |SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
        |  a.nm AS name_a, b.nm AS name_b,
        |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
        |FROM s a JOIN s b
        |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.nm, b.nm) <= 2
        |ORDER BY key_a, key_b""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d).select(col("s_suppkey"),
        col("s_nationkey"),
        concat(lower(trim(col("s_name"))),
          when(col("s_suppkey") % 9 === 0, "x").otherwise(""))
          .as("nm"))
      val a = sup.select(col("s_suppkey").as("key_a"),
        col("s_nationkey").as("nk_a"), col("nm").as("name_a"))
      val b = sup.select(col("s_suppkey").as("key_b"),
        col("s_nationkey").as("nk_b"), col("nm").as("name_b"))
      a.join(b, col("nk_a") === col("nk_b") && col("key_a") < col("key_b"))
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 2)
        .select("key_a", "key_b", "name_a", "name_b", "dist")
        .orderBy("key_a", "key_b")
    },

    // Nearest-anchor assignment: every customer lands on its closest of
    // 25 anchor points in a synthetic 2-D plane (h56 coordinates — the
    // multi-warehouse / nearest-POP assignment shape). Distance is
    // squared-Euclidean (no trig: libm sin/cos are not cross-engine
    // bit-stable, squared distance is) and the argmin is a max_by over
    // the broadcast anchor set — corpus × 25, map-side only, followed by
    // one rollup per anchor.
    QueryDef.sql(
      "j_geo_nearest",
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    CAST(${Det.h56Sql("CAST(c_custkey AS VARCHAR)")} % 1000 AS DOUBLE) / 10.0 AS x,
         |    CAST(${Det.h56Sql("CAST(c_custkey AS VARCHAR)", 17)} % 1000 AS DOUBLE) / 10.0 AS y
         |  FROM customer),
         |anchors AS (
         |  SELECT n_nationkey AS anchor_id,
         |    CAST(${Det.h56Sql("CAST(n_nationkey AS VARCHAR)")} % 1000 AS DOUBLE) / 10.0 AS ax,
         |    CAST(${Det.h56Sql("CAST(n_nationkey AS VARCHAR)", 17)} % 1000 AS DOUBLE) / 10.0 AS ay
         |  FROM nation),
         |scored AS (
         |  SELECT p.c_custkey, a.anchor_id,
         |    (p.x - a.ax) * (p.x - a.ax) + (p.y - a.ay) * (p.y - a.ay) AS d2
         |  FROM pts p CROSS JOIN anchors a),
         |best AS (
         |  SELECT c_custkey, anchor_id, d2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY c_custkey
         |      ORDER BY d2, anchor_id) AS rn
         |    FROM scored) WHERE rn = 1)
         |SELECT anchor_id, COUNT(*) AS n_assigned,
         |  ${roundN("MIN(d2)", 6)} AS min_d2,
         |  ${roundN("MAX(d2)", 6)} AS max_d2,
         |  ${roundN(
             "CAST(SUM(CAST(d2 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)", 6)}
         |    AS mean_d2
         |FROM best GROUP BY 1 ORDER BY anchor_id""".stripMargin) { (s, d) =>
      def coord(key: org.apache.spark.sql.Column, pos: Int) =
        (Det.h56(key.cast("string"), pos) % 1000) / 10.0
      val pts = Tables.customer(s, d).select(col("c_custkey"),
        coord(col("c_custkey"), 1).as("x"),
        coord(col("c_custkey"), 17).as("y"))
      val anchors = Tables.nation(s, d).select(
        col("n_nationkey").as("anchor_id"),
        coord(col("n_nationkey"), 1).as("ax"),
        coord(col("n_nationkey"), 17).as("ay"))
      val scored = pts.crossJoin(broadcast(anchors))
        .withColumn("d2",
          (col("x") - col("ax")) * (col("x") - col("ax"))
            + (col("y") - col("ay")) * (col("y") - col("ay")))
      // per-row argmin over the broadcast anchors: min_by via struct
      // ordering (d2, anchor_id) — no window over the corpus
      val best = scored.groupBy("c_custkey")
        .agg(min(struct(col("d2"), col("anchor_id"))).as("__b"))
        .select(col("c_custkey"),
          col("__b").getField("anchor_id").as("anchor_id"),
          col("__b").getField("d2").as("d2"))
      best.groupBy("anchor_id").agg(
          count(lit(1)).as("n_assigned"),
          Det.roundN(min("d2"), 6).as("min_d2"),
          Det.roundN(max("d2"), 6).as("max_d2"),
          Det.roundN(sum(col("d2").cast(DecimalType(18, 6))).cast("double")
            / count(lit(1)), 6).as("mean_d2"))
        .orderBy("anchor_id")
    }
  )
}
