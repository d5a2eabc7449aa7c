package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose point value falls inside a
  * right-side interval `[lo, hi)`.
  *
  * Spark has no native range join — a plain non-equi join compiles to
  * BroadcastNestedLoopJoin (all-pairs), which is a cross product at scale.
  * This operator makes the join an EQUI-join on a derived bucket key:
  *
  *   1. explode each interval to the buckets it overlaps
  *      (`floor(lo/w) .. floor(hi/w)`);
  *   2. map each point to its bucket `floor(v/w)`;
  *   3. hash-join on the bucket, then apply the residual
  *      `lo <= v < hi` predicate inside the join.
  *
  * Shuffle volume is O(|points| + |intervals| × avgSpan/w) — linear, no
  * cross product, partitioned by bucket (co-locatable / AQE-skew-safe like
  * any equi-join). Choose `bucketWidth` near the typical interval span: too
  * small explodes the interval side, too large degrades each bucket toward
  * a mini cross-product. The boundary bucket `floor(hi/w)` is included even
  * when `hi` is exclusive — over-generated candidates are removed by the
  * residual predicate, which keeps the arithmetic valid for real-valued
  * points against integer bounds.
  *
  * Works on any numeric domain; timestamps range-join via their epoch
  * value. Interval rows with `hi <= lo` are empty by definition and
  * dropped up front (a descending `sequence()` would otherwise generate
  * phantom buckets).
  */
object RangeJoin {

  /** @param points      left rows
    * @param intervals   right rows carrying [loCol, hiCol) bounds
    * @param pointCol    numeric column on `points`
    * @param loCol       inclusive lower bound on `intervals`
    * @param hiCol       exclusive upper bound on `intervals`
    * @param bucketWidth positive bucket size in the value domain
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def bucket(c: Column): Column = floor(c / bucketWidth).cast("long")
    val b = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__b",
        explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    points.withColumn("__b", bucket(col(pointCol)))
      .join(b, Seq("__b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__b")
  }

  /** Interval × interval overlap join: rows from `left` and `right` whose
    * half-open intervals `[lo, hi)` intersect (`l.lo < r.hi && r.lo < l.hi`).
    *
    * Same bucket-decomposition idea as [[pointInInterval]], with both
    * sides exploded to the buckets they touch. A pair of overlapping
    * intervals can share MANY buckets; emitting the match once per shared
    * bucket would need a `distinct` shuffle to repair, so instead each
    * match is kept only in its canonical first shared bucket —
    * `max(floor(l.lo/w), floor(r.lo/w))`, the bucket where the
    * later-starting interval begins. Every overlapping pair shares exactly
    * that bucket (the later start lies inside the earlier interval's
    * bucket span), so the output has exactly one row per qualifying pair
    * with no dedup pass.
    *
    * Shuffle volume is O(Σ spans / w) per side; `bucketWidth` near the
    * typical interval span keeps the explode factor ~2. Column names must
    * be disjoint between the two inputs (alias before calling).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def bucket(c: Column): Column = floor(c / bucketWidth).cast("long")
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(hi) > col(lo))
      .withColumn("__b", explode(sequence(bucket(col(lo)), bucket(col(hi)))))
    exploded(left, lLo, lHi)
      .join(exploded(right, rLo, rHi), Seq("__b"))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(col("__b") === greatest(bucket(col(lLo)), bucket(col(rLo))))
      .drop("__b")
  }
}
