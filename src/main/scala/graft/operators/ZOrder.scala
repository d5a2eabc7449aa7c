package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout + file-level min/max pruning stats — the
  * multi-dimensional data-skipping story at 100 TB.
  *
  * A table sorted by one column prunes scans on THAT column only; a
  * predicate on any other dimension reads every file. Interleaving the
  * bits of two dimensions into a Z-value and laying files out in Z order
  * gives every dimension locality ∝ √(files), so box predicates on either
  * dim (or both) skip most files — this is what Delta/Iceberg `OPTIMIZE
  * ZORDER BY` does, reconstructed here as plain relational steps:
  * z-value (pure bit math) → equal-frequency file assignment → per-file
  * min/max stats → overlap pruning. Every step is deterministic and
  * mirrored in oracle SQL, so the pruning COUNTS themselves are
  * hash-checked against DuckDB.
  *
  * At rest the file assignment is `repartitionByRange(zCol)` + one file
  * per partition (a distributed range sort); the `row_number` used here
  * computes the same equal-frequency boundaries deterministically so the
  * demo's file population is engine-identical. Pruning correctness never
  * depends on the z-math: files are pruned on REAL min/max stats, so a
  * dimension overflowing `bitsPer` only degrades locality, never results.
  */
object ZOrder {

  /** Morton interleave of the low `bitsPer` bits of two non-negative
    * dimensions: bit i of `a` lands at 2i, bit i of `b` at 2i+1. */
  def zValue(a: Column, b: Column, bitsPer: Int): Column = {
    require(bitsPer >= 1 && bitsPer <= 28, s"bitsPer out of range: $bitsPer")
    (0 until bitsPer).map(i =>
      shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i)
        + shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
      .reduce(_ + _)
  }

  /** DuckDB mirror of [[zValue]]: `a`/`b` are SQL expressions. */
  def zValueSql(a: String, b: String, bitsPer: Int): String =
    (0 until bitsPer).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")

  /** Equal-frequency file assignment in `order` order: adds `file_id`
    * (0-based, `rowsPerFile` rows each). `order` must totally order the
    * rows (end with a unique id) or file boundaries are nondeterministic. */
  def fileLayout(df: DataFrame, order: Seq[Column],
      rowsPerFile: Int): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    df.withColumn("file_id",
      ((row_number().over(Window.orderBy(order: _*)) - 1) / rowsPerFile)
        .cast("long"))
  }

  /** Per-file stats over the given dims: (file_id, n_rows,
    * min_<dim>, max_<dim> …) — the skipping manifest a reader prunes on. */
  def fileStats(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      dims.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy("file_id").agg(aggs.head, aggs.tail: _*)
  }
}
