package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * the same key whose timestamp is <= the left timestamp (the standard
  * time-series enrichment join — trades to quotes, events to latest
  * dimension version).
  *
  * Spark has no built-in as-of join. Preference ladder (SURVEY §7.3 /
  * build guide): this is case (a) — composable from built-ins with the
  * union + last-non-null-window trick, so no custom SparkPlan is needed:
  *
  *   1. tag left rows 1, right rows 0; union on (key, ts, tag, payload);
  *   2. one window per key ordered by (ts, tag): `last(payload,
  *      ignoreNulls=true)` over unbounded-preceding..current carries the
  *      latest right payload forward (tag order makes a right row at
  *      exactly ts visible to the left row — inclusive <= semantics);
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle of |L|+|R| on the key (same as a sort-merge join's
  * shuffle) and one sorted window pass — no range cross-products, no
  * per-row probes. Skew behaves like any keyed window (AQE handles
  * moderate skew; salt the key upstream for pathological keys).
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      lookup rows (key, ts, payload columns)
    * @param leftKey    join key column name on the left
    * @param rightKey   join key column name on the right
    * @param leftTs     event-time column on the left
    * @param rightTs    event-time column on the right
    * @param payload    right columns to carry (must not clash with left)
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
    val lAligned = payload.foldLeft(l)((d, p) =>
      d.withColumn(p, lit(null).cast(right.schema(p).dataType)))
    val r0 = right
      .withColumn("__k", col(rightKey))
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
    val rAligned = leftCols.foldLeft(r0)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.select(
      (leftCols ++ payload ++ Seq("__k", "__ts", "__tag")).map(col): _*)
      .unionByName(rAligned.select(
        (leftCols ++ payload ++ Seq("__k", "__ts", "__tag")).map(col): _*))
    // right rows (tag 0) sort before left rows at equal ts → inclusive <=
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((d, p) =>
      d.withColumn(p, last(col(p), ignoreNulls = true).over(w)))
    carried.filter(col("__tag") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
