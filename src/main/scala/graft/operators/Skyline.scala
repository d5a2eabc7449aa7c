package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (pareto frontier) per group: the rows no other same-group row
  * dominates on (smaller `xCol`, larger `yCol`) — "cheapest for its
  * size class" style queries, the classic skyline operator of the OLAP
  * literature.
  *
  * Sort-based formulation instead of the naive dominance self-join:
  * collapse to one (x → max y) row per distinct x (map-side-combinable
  * aggregate), then one running-max window over the x order per group
  * marks exactly the x values whose max y beats every strictly-smaller
  * x; joining the surviving (group, x, y) triples back to the input
  * recovers all tied frontier rows. O(n log n) with the window running
  * over the DISTINCT-x relation only — the self-join is O(n²) and the
  * raw-row window would serialize whole groups through one task.
  */
object Skyline {

  /** Returns the input rows on the (min `xCol`, max `yCol`) frontier of
    * their `grpCol` group, with the input's columns preserved. */
  def frontier(df: DataFrame, grpCol: String, xCol: String,
      yCol: String): DataFrame = {
    val g1 = df.groupBy(col(grpCol).as("__g"), col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__y"))
    val w = Window.partitionBy("__g").orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val fr = g1.withColumn("__best", max(col("__y")).over(w))
      .filter(col("__best").isNull || col("__y") > col("__best"))
      .select(col("__g"), col("__x"), col("__y"))
    df.join(fr,
        col(grpCol) === col("__g") && col(xCol) === col("__x") &&
          col(yCol) === col("__y"))
      .select(df.columns.map(col): _*)
  }
}
