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
    // q-gram approximations.
    //
    // SKEW NOTE (round-13): nationkey alone is a FIXED 25 blocks, so
    // candidates grew O(n²/25) regardless of true near-dup density — the
    // r12 sf1 sweep measured 35.9× wall for 10× data, the worst ratio in
    // the suite. A name-prefix second key (the j_record_linkage fix)
    // degenerates here: every name shares the constant 'supplier#'
    // prefix, so any prefix short enough to be edit-safe is one block.
    // Candidates now come from FastSS deletion neighborhoods instead:
    // lev(a,b) <= 2 implies a and b share a string reachable by deleting
    // <= 2 chars from each (delete a's edited/deleted positions, b's
    // edited/inserted ones), so an equi-join on (nation, variant) over
    // the depth-<=2 neighborhoods is COMPLETE for the threshold with no
    // error-model assumption — the content-defined variant key makes
    // bucket sizes track near-dup density (a bucket only holds names
    // within deletion distance 2 of its variant), never corpus size.
    // False positives reach lev 4 at most and die in the exact verify.
    // Shuffle is rows × O(len²/2) short variants — corpus-LINEAR — vs
    // the old n²/25 pair stream. The oracle stays the exhaustive
    // within-nation join, so any recall loss would fail the hash check.
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
      // depth-<=2 deletion neighborhood: the string itself, every
      // 1-deletion, every 2-deletion (i < j). array_distinct collapses
      // the repeats a run of equal chars produces (the zero-heavy digit
      // block dedups hard). The 2-deletion leg is guarded so a 1-char
      // name doesn't hit sequence()'s descending-range behavior.
      val del2 = expr(
        """array_distinct(concat(
          |  array(nm),
          |  transform(sequence(1, length(nm)), i ->
          |    concat(substring(nm, 1, i - 1),
          |           substring(nm, i + 1, length(nm)))),
          |  CASE WHEN length(nm) >= 2 THEN
          |    flatten(transform(sequence(1, length(nm) - 1), i ->
          |      transform(sequence(i + 1, length(nm)), j ->
          |        concat(substring(nm, 1, i - 1),
          |               substring(nm, i + 1, j - i - 1),
          |               substring(nm, j + 1, length(nm))))))
          |  ELSE array() END))""".stripMargin)
      // the exploded relation carries only (key, nation, hash(variant)):
      // a long hash key sorts/joins far cheaper than a 17-char string
      // and a collision can only ADD a candidate the exact verify kills;
      // names re-attach to the candidate PAIRS via two broadcasts of the
      // slim dim (suppliers are dim-sized at any corpus scale)
      val variants = sup.select(col("s_suppkey"), col("s_nationkey"),
        explode(del2).as("v"))
        .select(col("s_suppkey"), col("s_nationkey"),
          xxhash64(col("v")).as("vh"))
      val a = variants.select(col("s_suppkey").as("key_a"),
        col("s_nationkey").as("nk_a"), col("vh").as("vh_a"))
      val b = variants.select(col("s_suppkey").as("key_b"),
        col("s_nationkey").as("nk_b"), col("vh").as("vh_b"))
      val cand = a.join(b,
          col("nk_a") === col("nk_b") && col("vh_a") === col("vh_b")
            && col("key_a") < col("key_b"))
        .select("key_a", "key_b").distinct()
      val dimA = broadcast(sup.select(col("s_suppkey").as("key_a"),
        col("nm").as("name_a")))
      val dimB = broadcast(sup.select(col("s_suppkey").as("key_b"),
        col("nm").as("name_b")))
      cand.join(dimA, "key_a").join(dimB, "key_b")
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 2)
        .select("key_a", "key_b", "name_a", "name_b", "dist")
        .orderBy("key_a", "key_b")
    },

    // Peak concurrency per day — the classic interval-overlap maximum
    // (how many users were simultaneously active), computed the sweep
    // way: +1 at each user's first event of the day, -1 at the last,
    // running sum per day (starts sort before ends at an instant so a
    // single-event user still counts), daily max. No interval self-join;
    // the sweep relation is 2 rows per (user, day).
    QueryDef.sql(
      "w_max_concurrency",
      """WITH span AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    MIN(ts) AS lo, MAX(ts) AS hi
        |  FROM events GROUP BY 1, 2),
        |sweep AS (
        |  SELECT day, lo AS t, 1 AS delta, user_id FROM span
        |  UNION ALL
        |  SELECT day, hi AS t, -1 AS delta, user_id FROM span),
        |run AS (
        |  SELECT day,
        |    SUM(delta) OVER (PARTITION BY day ORDER BY t, delta DESC, user_id
        |                     ROWS UNBOUNDED PRECEDING) AS conc
        |  FROM sweep)
        |SELECT day, CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
        |  CAST(COUNT(*) / 2 AS BIGINT) AS n_users
        |FROM run GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      val span = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min("ts").as("lo"), max("ts").as("hi"))
      val sweep = span.select(col("day"), col("lo").as("t"),
          lit(1).as("delta"), col("user_id"))
        .unionAll(span.select(col("day"), col("hi").as("t"),
          lit(-1).as("delta"), col("user_id")))
      val run = sweep.withColumn("conc",
        sum("delta").over(Window.partitionBy("day")
          .orderBy(col("t"), col("delta").desc, col("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      run.groupBy("day")
        .agg(max("conc").cast("long").as("peak_concurrency"),
          (count(lit(1)) / 2).cast("long").as("n_users"))
        .orderBy("day")
    },

    // Sample-ratio-mismatch guardrail: the first thing a trustworthy
    // experiment pipeline checks — do the EXPOSURE counts actually split
    // 50/50 per experiment? One-degree χ² reduces to (na−nb)²/n; flag at
    // the 3.841 (95%) bar. On this fixture the flag legitimately FIRES:
    // assignment is per user but exposure is per event, and 150 users'
    // unlucky-but-fair 61/89 hash draw is amplified by activity
    // weighting — exactly the unit-of-analysis mismatch this check
    // exists to surface before anyone reads a p-value.
    QueryDef.sql(
      "a_srm_check",
      s"""WITH v AS (
         |  SELECT event_type,
         |    ${Det.h56Sql("CAST(user_id AS VARCHAR)")} % 2 AS variant
         |  FROM events),
         |m AS (
         |  SELECT event_type,
         |    COUNT(CASE WHEN variant = 0 THEN 1 END) AS na,
         |    COUNT(CASE WHEN variant = 1 THEN 1 END) AS nb
         |  FROM v GROUP BY 1)
         |SELECT event_type, na, nb,
         |  ${roundN("(na - nb) * (na - nb) * 1.0 / (na + nb)", 6)} AS chi2,
         |  (na - nb) * (na - nb) * 1.0 / (na + nb) > 3.841 AS srm_flag
         |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d).select(col("event_type"),
        (Det.h56(col("user_id").cast("string")) % 2).as("variant"))
      v.groupBy("event_type").agg(
          count(when(col("variant") === 0, 1)).as("na"),
          count(when(col("variant") === 1, 1)).as("nb"))
        .select(col("event_type"), col("na"), col("nb"),
          Det.roundN((col("na") - col("nb")) * (col("na") - col("nb")) * 1.0
            / (col("na") + col("nb")), 6).as("chi2"),
          ((col("na") - col("nb")) * (col("na") - col("nb")) * 1.0
            / (col("na") + col("nb")) > 3.841).as("srm_flag"))
        .orderBy("event_type")
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
