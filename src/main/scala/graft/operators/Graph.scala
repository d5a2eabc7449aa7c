package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Det, Stage}

/** Iterative graph algorithms as pregel-by-join — the quality-propagation
  * family a crawl-scale curation pipeline runs over its link graph
  * (PageRank-style centrality is the classic web-corpus quality prior).
  *
  * Scale shape: one round = one equi-join of the rank relation against
  * the edge relation + one map-side-combinable aggregate by destination —
  * the standard message-passing-by-shuffle decomposition. No adjacency
  * matrices, no driver-side graph object; the edge relation can be
  * billions of rows and partitions by `dst` like any fact table.
  * [[Stage.materializeAlways]] cuts lineage every round (the same
  * discipline as the connected-components loop in [[Dedup]]): without it
  * round r's plan embeds r−1's and goes exponential.
  *
  * Determinism (the oracle-parity contract): per-round contribution sums
  * go through [[Det.dsum]] (decimal cast — order-independent, so shuffle
  * nondeterminism can't flip low bits) and each round's rank is pinned
  * through [[Det.roundN]] before feeding the next round, so every engine
  * computes bit-identical trajectories. The unrolled-CTE oracle replays
  * the exact loop.
  */
object Graph {

  /** Simplified PageRank (no dangling-mass redistribution: a node with no
    * out-edges simply stops forwarding its mass — the usual choice when
    * the graph is a sampled subweb and absolute calibration doesn't
    * matter, only the ranking). Returns (idCol, pagerank) for every node.
    *
    * `edges`: (src, dst), self-loops and duplicates tolerated (both are
    * normalized away). `nodes`: one row per node id (column `idCol`) —
    * nodes absent from `edges` still receive the base rank.
    */
  def pagerank(nodes: DataFrame, edges: DataFrame, idCol: String,
      iterations: Int, damping: Double = 0.85,
      scale: Int = 12): DataFrame = {
    require(iterations >= 1 && iterations <= 50, s"iterations: $iterations")
    val e = Stage.materialize(
      edges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst")).distinct())
    val od = Stage.materialize(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")))
    // node count enters as a broadcast 1-row relation, not a driver-side
    // collect — the loop stays one declarative plan per round
    val n = nodes.agg(count(lit(1)).as("__n"))
    val ids = Stage.materialize(
      nodes.select(col(idCol).as("__id")).crossJoin(broadcast(n)))
    val base = 1.0 - damping
    var pr = ids.select(col("__id"),
      (lit(1.0) / col("__n")).as("pr"))
    for (_ <- 1 to iterations) {
      val contrib = pr
        .join(e, pr("__id") === e("src"))
        .join(od, Seq("src"))
        .groupBy(col("dst"))
        .agg(Det.dsum(col("pr") / col("outdeg"), scale).as("__c"))
      pr = Stage.materializeAlways(
        ids.join(contrib, ids("__id") === contrib("dst"), "left")
          .select(col("__id"),
            Det.roundN(
              lit(base) / col("__n")
                + lit(damping) * coalesce(col("__c"), lit(0.0)),
              scale).as("pr")))
    }
    pr.select(col("__id").as(idCol), col("pr").as("pagerank"))
  }

  /** DuckDB mirror of [[pagerank]] as unrolled CTEs over an `e(src,dst)`
    * CTE (already self-loop-free and distinct) and a node CTE
    * `nd(<idCol>)`. Returns CTE text ending in `prK` with (id, pr). */
  def pagerankSql(idCol: String, iterations: Int, damping: Double = 0.85,
      scale: Int = 12): String = {
    val base = (1.0 - damping).toString
    val rounds = (1 to iterations).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS id,
         |    ${Det.dsumSql(s"pr${i - 1}.pr / od.outdeg", scale)} AS c
         |  FROM e JOIN pr${i - 1} ON pr${i - 1}.id = e.src
         |  JOIN od ON od.src = e.src
         |  GROUP BY 1),
         |pr$i AS (
         |  SELECT nd.id, ${Det.roundNSql(
            s"$base / nd.n + $damping * COALESCE(c$i.c, 0.0)", scale)} AS pr
         |  FROM ndn nd LEFT JOIN c$i ON c$i.id = nd.id)""".stripMargin
    }.mkString(",\n")
    s"""od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
       |ndn AS (SELECT $idCol AS id, (SELECT COUNT(*) FROM nd) AS n FROM nd),
       |pr0 AS (SELECT id, 1.0 / n AS pr FROM ndn),
       |$rounds""".stripMargin
  }
}
