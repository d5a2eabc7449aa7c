package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{Det, Tables}
import graft.operators.Similarity

/** Analysis depth: Markov absorption probabilities over the event
  * transition matrix, hard-negative mining for retrieval training,
  * the distributed moment-merge law made visible, and leave-one-out
  * source valuation.
  */
object AnalysisOps {

  private val roundN = Det.roundNSql _
  private def r12s(e: String) = Det.roundNSql(e, 12)

  private def cosSql(a: String, b: String) =
    s"CASE WHEN sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b)) > 0" +
      s" THEN list_dot_product($a,$b) / (sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b)))" +
      s" ELSE 0.0 END"

  /** 4 unrolled value-iteration steps for purchase absorption, each a
    * join of the 5x5 transition relation with the previous vector —
    * MATERIALIZED so DuckDB doesn't re-expand the chain. */
  private def absorbIterCtes(rounds: Int): String =
    (1 to rounds).map { k =>
      val prev = s"v${k - 1}"
      s"""v$k AS MATERIALIZED (
         |  SELECT p.from_type AS state,
         |    CASE WHEN p.from_type = 'purchase' THEN 1.0
         |         ELSE CAST(SUM(CAST(${r12s("p.p * v.p_abs")} AS DECIMAL(38,18))) AS DOUBLE)
         |    END AS p_abs
         |  FROM probs p JOIN $prev v ON v.state = p.to_type
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")

  val defs: Seq[QueryDef] = Seq(

    // Markov absorption: probability a user reaches 'purchase' within k
    // steps from each state, by k=4 value-iteration rounds over the
    // event-type transition matrix — funnel analysis upgraded from
    // counting to dynamics. The matrix is STATE-bounded (5x5), so every
    // iteration is constant-size regardless of corpus; the only
    // corpus-sized work is the one LEAD window + count that
    // q_event_transitions already shapes. Probabilities are r12-pinned
    // and DECIMAL-summed, so both engines walk identical iterates.
    QueryDef.sql(
      "q_absorption_prob",
      s"""WITH steps AS (
         |  SELECT event_type AS from_type,
         |    LEAD(event_type) OVER (PARTITION BY user_id
         |                           ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |counts AS MATERIALIZED (
         |  SELECT from_type, to_type, COUNT(*) AS n
         |  FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |probs AS MATERIALIZED (
         |  SELECT from_type, to_type,
         |    ${r12s("n * 1.0 / SUM(n) OVER (PARTITION BY from_type)")} AS p
         |  FROM counts),
         |v0 AS MATERIALIZED (
         |  SELECT DISTINCT from_type AS state,
         |    CASE WHEN from_type = 'purchase' THEN 1.0 ELSE 0.0 END AS p_abs
         |  FROM probs),
         |${absorbIterCtes(4)}
         |SELECT v1.state, ${roundN("v1.p_abs", 6)} AS p_abs_1,
         |  ${roundN("v2.p_abs", 6)} AS p_abs_2,
         |  ${roundN("v3.p_abs", 6)} AS p_abs_3,
         |  ${roundN("v4.p_abs", 6)} AS p_abs_4
         |FROM v1 JOIN v2 USING (state) JOIN v3 USING (state)
         |  JOIN v4 USING (state)
         |ORDER BY state""".stripMargin) { (s, d) =>
      def r12(c: org.apache.spark.sql.Column) = Det.roundN(c, 12)
      val steps = Tables.events(s, d).select(
        col("event_type").as("from_type"),
        lead("event_type", 1).over(Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))).as("to_type"))
      val counts = steps.filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      // staged: four value-iteration rounds each read the matrix, and
      // without the cut the corpus-sized LEAD window would re-run per round
      val probs = graft.engine.Stage.materialize(
        counts.withColumn("p",
          r12(col("n") * 1.0 /
            sum("n").over(Window.partitionBy("from_type")))))
      var v = probs.select(col("from_type").as("state")).distinct()
        .withColumn("p_abs",
          when(col("state") === "purchase", 1.0).otherwise(0.0))
      val vs = (1 to 4).map { _ =>
        v = probs
          .join(v.select(col("state").as("to_type"), col("p_abs")),
            "to_type")
          .groupBy("from_type")
          .agg(when(col("from_type") === "purchase", 1.0)
            .otherwise(sum(r12(col("p") * col("p_abs"))
              .cast(DecimalType(38, 18))).cast("double")).as("p_abs"))
          .select(col("from_type").as("state"), col("p_abs"))
        v
      }
      vs.zipWithIndex
        .map { case (df, i) =>
          df.select(col("state"),
            Det.roundN(col("p_abs"), 6).as(s"p_abs_${i + 1}"))
        }
        .reduce((a, b) => a.join(b, "state"))
        .orderBy("state")
    },

    // Hard-negative mining for retrieval training: per query, the
    // top-5 most-similar vectors INSIDE the (0.2, 0.8) band — similar
    // enough to be confusable, dissimilar enough to not be near-dups.
    // Composed from the IVF range search (band filter before any
    // ranking) + a per-query top-k window over the band survivors only.
    QueryDef.sql(
      "sim_hard_negatives",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |cent AS (SELECT vec_id AS cell, emb AS ce FROM e WHERE vec_id < 16),
         |qs AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 8),
         |probes AS (
         |  SELECT query_id, cell, qe FROM (
         |    SELECT q.query_id, c.cell, q.qe,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY (${cosSql("c.ce", "q.qe")}) DESC, c.cell) AS rk
         |    FROM cent c CROSS JOIN qs q) WHERE rk <= 4),
         |scored AS (
         |  SELECT e.vec_id, e.emb, cent.cell, ${cosSql("e.emb", "ce")} AS sim
         |  FROM e CROSS JOIN cent),
         |assigned AS (
         |  SELECT vec_id, emb, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
         |    FROM scored) WHERE rn = 1),
         |band AS (
         |  SELECT p.query_id, a.vec_id, a.cell,
         |    ${roundN(cosSql("a.emb", "p.qe"), 6)} AS cosine
         |  FROM assigned a JOIN probes p USING (cell)
         |  WHERE ${roundN(cosSql("a.emb", "p.qe"), 6)} >= 0.2
         |    AND ${roundN(cosSql("a.emb", "p.qe"), 6)} < 0.8
         |    AND a.vec_id <> p.query_id)
         |SELECT query_id, vec_id, cell, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, vec_id) AS rk FROM band)
         |WHERE rk <= 5
         |ORDER BY query_id, cosine DESC, vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val band = Similarity.ivfRangeSearch(emb, centroids, qs,
          tau = 0.2, nProbe = 4)
        .filter(col("cosine") < 0.8)
      band.withColumn("__rk", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(desc("cosine"), col("vec_id"))))
        .filter(col("__rk") <= 5)
        .select("query_id", "vec_id", "cell", "cosine")
        .orderBy(col("query_id"), desc("cosine"), col("vec_id"))
    },

    // The distributed moment-merge law made visible: per-source partial
    // (n, Σx, Σx²) in DECIMAL merge to the global moments EXACTLY — the
    // map-side-combine guarantee every aggregate in this engine leans on.
    // The output carries each source's moments plus BOTH global rows
    // ('ALL_merged' from summed partials, 'ALL_direct' from a flat
    // re-aggregation); the hash check proves them identical to the last
    // bit.
    QueryDef.sql(
      "a_moments_merge",
      s"""WITH per AS (
         |  SELECT source, COUNT(*) AS n,
         |    SUM(CAST(n_chars AS DECIMAL(18,2))) AS s1,
         |    SUM(CAST(CAST(n_chars AS DOUBLE) * n_chars AS DECIMAL(18,2))) AS s2
         |  FROM documents GROUP BY 1),
         |merged AS (
         |  SELECT 'ALL_merged' AS source, CAST(SUM(n) AS BIGINT) AS n,
         |    SUM(s1) AS s1, SUM(s2) AS s2
         |  FROM per),
         |direct AS (
         |  SELECT 'ALL_direct' AS source, COUNT(*) AS n,
         |    SUM(CAST(n_chars AS DECIMAL(18,2))) AS s1,
         |    SUM(CAST(CAST(n_chars AS DOUBLE) * n_chars AS DECIMAL(18,2))) AS s2
         |  FROM documents),
         |u AS (
         |  SELECT source, n, s1, s2 FROM per
         |  UNION ALL SELECT * FROM merged
         |  UNION ALL SELECT * FROM direct)
         |SELECT source, n,
         |  ${roundN("CAST(s1 AS DOUBLE) / n", 6)} AS mean,
         |  ${roundN(
             "CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)",
             6)} AS variance
         |FROM u ORDER BY source""".stripMargin) { (s, d) =>
      val dec2 = DecimalType(18, 2)
      val docs = Tables.documents(s, d)
      val per = docs.groupBy("source").agg(
        count(lit(1)).as("n"),
        sum(col("n_chars").cast(dec2)).as("s1"),
        sum((col("n_chars").cast("double") * col("n_chars")).cast(dec2))
          .as("s2"))
      val merged = per.agg(sum("n").as("n"), sum("s1").as("s1"),
          sum("s2").as("s2"))
        .select(lit("ALL_merged").as("source"), col("n"), col("s1"),
          col("s2"))
      val direct = docs.agg(
          count(lit(1)).as("n"),
          sum(col("n_chars").cast(dec2)).as("s1"),
          sum((col("n_chars").cast("double") * col("n_chars")).cast(dec2))
            .as("s2"))
        .select(lit("ALL_direct").as("source"), col("n"), col("s1"),
          col("s2"))
      per.select(col("source"), col("n"), col("s1"), col("s2"))
        .unionByName(merged).unionByName(direct)
        .select(col("source"), col("n"),
          Det.roundN(col("s1").cast("double") / col("n"), 6).as("mean"),
          Det.roundN(col("s2").cast("double") / col("n")
            - (col("s1").cast("double") / col("n"))
              * (col("s1").cast("double") / col("n")), 6).as("variance"))
        .orderBy("source")
    },

    // Leave-one-out source valuation: each source's marginal effect on
    // the corpus mean length and English share, in closed form from the
    // global and per-source sums — the cheap end of data-valuation
    // (no retraining, no resampling), exact and rankable. One aggregate
    // + a 1-row broadcast; deltas are pure arithmetic.
    QueryDef.sql(
      "t_loo_source_impact",
      s"""WITH per AS (
         |  SELECT source, COUNT(*) AS n,
         |    SUM(CAST(n_chars AS DECIMAL(18,2))) AS s1,
         |    COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_en
         |  FROM documents GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS nn, SUM(s1) AS ss,
         |    CAST(SUM(n_en) AS BIGINT) AS ee
         |  FROM per)
         |SELECT source, n,
         |  ${roundN("CAST(ss - s1 AS DOUBLE) / (nn - n)", 6)} AS mean_without,
         |  ${roundN(
             "CAST(ss - s1 AS DOUBLE) / (nn - n) - CAST(ss AS DOUBLE) / nn", 6)}
         |    AS delta_mean,
         |  ${roundN("(ee - n_en) * 1.0 / (nn - n)", 6)} AS en_share_without,
         |  ${roundN("(ee - n_en) * 1.0 / (nn - n) - ee * 1.0 / nn", 6)}
         |    AS delta_en_share
         |FROM per, tot ORDER BY source""".stripMargin) { (s, d) =>
      val dec2 = DecimalType(18, 2)
      val per = Tables.documents(s, d).groupBy("source").agg(
        count(lit(1)).as("n"),
        sum(col("n_chars").cast(dec2)).as("s1"),
        count(when(col("lang") === "en", 1)).as("n_en"))
      val tot = per.agg(sum("n").as("nn"), sum("s1").as("ss"),
        sum("n_en").as("ee"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n"),
          Det.roundN((col("ss") - col("s1")).cast("double")
            / (col("nn") - col("n")), 6).as("mean_without"),
          Det.roundN((col("ss") - col("s1")).cast("double")
            / (col("nn") - col("n"))
            - col("ss").cast("double") / col("nn"), 6).as("delta_mean"),
          Det.roundN((col("ee") - col("n_en")) * 1.0
            / (col("nn") - col("n")), 6).as("en_share_without"),
          Det.roundN((col("ee") - col("n_en")) * 1.0
            / (col("nn") - col("n"))
            - col("ee") * 1.0 / col("nn"), 6).as("delta_en_share"))
        .orderBy("source")
    }
  )
}
