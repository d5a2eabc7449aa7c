package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Det

/** Per-group mean-shift drift detection — the corpus-monitoring check a
  * production pipeline runs per ingest: does any group (source, day,
  * shard) have a metric mean far from the corpus mean, where "far" is
  * scaled by corpus variance and group size? The statistic is the squared
  * z-score of the group mean under the corpus distribution:
  *
  *   stat = n_g · (mean_g − mean_all)² / var_all      (flag: stat > z²)
  *
  * Square form on purpose: no sqrt/abs on the flag path and no libm —
  * with decimal-summed integer inputs the whole computation is plain IEEE
  * arithmetic, bit-identical across engines, so the report hash-matches a
  * SQL oracle.
  *
  * Shape: ONE scan — a per-group hash aggregate (sum, sum-of-squares,
  * count in DECIMAL); corpus totals are re-aggregated FROM the group rows
  * (group-count-sized, not another corpus scan) and broadcast back as a
  * 1-row relation. Shuffle O(groups), no windows.
  *
  * Returns (keyCol, n_docs, mean_val, drift_stat, is_drifted) for every
  * group; a zero-variance corpus flags nothing (stat 0). */
object Drift {

  def meanShift(df: DataFrame, keyCol: String, valCol: String,
      z: Double = 2.0): DataFrame = {
    val dec = col(valCol).cast("double").cast(DecimalType(28, 6))
    // staged once (group-count-sized): feeds both the corpus rollup and
    // the final select — otherwise the corpus scan behind it runs twice
    val perGroup = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(dec).cast("double").as("__sum"),
        sum(dec * dec).cast("double").as("__sumsq"))
      .localCheckpoint()
    val corpus = perGroup
      .agg(sum(col("n_docs")).as("__n_all"),
        sum(col("__sum").cast(DecimalType(28, 6))).cast("double").as("__sum_all"),
        sum(col("__sumsq").cast(DecimalType(28, 6))).cast("double").as("__sumsq_all"))
    val meanAll = col("__sum_all") / col("__n_all")
    val varAll = col("__sumsq_all") / col("__n_all") - meanAll * meanAll
    val meanG = col("__sum") / col("n_docs")
    val stat = when(varAll > 0,
      Det.roundN(col("n_docs") * (meanG - meanAll) * (meanG - meanAll) / varAll, 6))
      .otherwise(0.0)
    perGroup.crossJoin(broadcast(corpus))
      .select(col(keyCol), col("n_docs"),
        Det.roundN(meanG, 4).as("mean_val"),
        stat.as("drift_stat"),
        (stat > z * z).as("is_drifted"))
  }

  /** Reference moments of a metric — (ref_mean, ref_var) as a 1-row
    * relation, decimal-summed. Compute ONCE over the training-time
    * corpus and persist; [[meanShiftAgainst]] checks arriving data
    * against it. */
  def referenceMoments(df: DataFrame, valCol: String): DataFrame = {
    val dec = col(valCol).cast("double").cast(DecimalType(28, 6))
    df.agg(count(lit(1)).as("ref_n"),
        sum(dec).cast("double").as("__s"),
        sum(dec * dec).cast("double").as("__sq"))
      .select(col("ref_n"),
        (col("__s") / col("ref_n")).as("ref_mean"),
        (col("__sq") / col("ref_n") -
          (col("__s") / col("ref_n")) * (col("__s") / col("ref_n")))
          .as("ref_var"))
  }

  /** Drift against a FROZEN baseline — the production monitoring shape:
    * the reference moments come from training time (persisted once via
    * [[referenceMoments]]), and each arriving batch/group is tested
    * against THEM, not against itself — so a corpus-wide shift is
    * detected rather than absorbed into the same batch's own mean (the
    * blind spot of the self-referential [[meanShift]], which this
    * complements). Same squared-z statistic and flag:
    *   stat = n_g · (mean_g − ref_mean)² / ref_var   (flag: stat > z²)
    *
    * One per-group aggregate + a broadcast of the 1-row reference.
    * Returns (keyCol, n_docs, mean_val, drift_stat, is_drifted). */
  def meanShiftAgainst(df: DataFrame, keyCol: String, valCol: String,
      reference: DataFrame, z: Double = 2.0): DataFrame = {
    val dec = col(valCol).cast("double").cast(DecimalType(28, 6))
    val perGroup = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(dec).cast("double").as("__sum"))
    val meanG = col("__sum") / col("n_docs")
    val stat = when(col("ref_var") > 0,
      Det.roundN(col("n_docs") * (meanG - col("ref_mean")) *
        (meanG - col("ref_mean")) / col("ref_var"), 6))
      .otherwise(0.0)
    perGroup.crossJoin(broadcast(reference))
      .select(col(keyCol), col("n_docs"),
        Det.roundN(meanG, 4).as("mean_val"),
        stat.as("drift_stat"),
        (stat > z * z).as("is_drifted"))
  }
}
