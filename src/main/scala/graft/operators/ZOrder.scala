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
  * File assignment ships in two equivalent forms: [[fileLayout]] (one
  * global `row_number` window — fine for a demo/fixture, but a
  * single-reducer sort at corpus scale) and [[fileLayoutRanged]], the
  * scale path — `repartitionByRange` on the layout order, per-partition
  * ranks, then broadcast cumulative partition counts to rebuild the EXACT
  * global rank. Same total order → bit-identical `file_id` assignment
  * (ZOrderSpec proves it), but the sort is a distributed range shuffle
  * and no row ever funnels through one reducer. Pruning correctness never
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
    * rows (end with a unique id) or file boundaries are nondeterministic.
    *
    * DEMO-SCALE ONLY: the unpartitioned window is a single-reducer global
    * sort. Production layout jobs use [[fileLayoutRanged]], which computes
    * the identical assignment distributed. */
  def fileLayout(df: DataFrame, order: Seq[Column],
      rowsPerFile: Int): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    df.withColumn("file_id",
      ((row_number().over(Window.orderBy(order: _*)) - 1) / rowsPerFile)
        .cast("long"))
  }

  /** Scale-path [[fileLayout]]: the same equal-frequency assignment,
    * computed without a global window. Classic two-phase global rank:
    *
    *   1. `repartitionByRange(order)` — a distributed range sort; equal
    *      keys co-locate, so per-partition order is a contiguous slice of
    *      the global order (`order` must still end with a unique id).
    *   2. per-partition `row_number` (window is partitioned — no funnel),
    *   3. cumulative partition counts (numPartitions rows — driver-tiny,
    *      the one remaining global window runs over THAT, the same
    *      caller-bounded discipline as Shards.assign) broadcast back to
    *      convert local ranks to exact global ranks.
    *
    * Bit-identical `file_id`s to [[fileLayout]] (ZOrderSpec), so oracle
    * SQL mirroring the global `row_number` stays valid for either path.
    * The ranged relation is staged once: ranks and counts both read it. */
  def fileLayoutRanged(df: DataFrame, order: Seq[Column], rowsPerFile: Int,
      numPartitions: Int = 0): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = graft.engine.Stage.materialize(
      df.repartitionByRange(parts, order: _*)
        .withColumn("__pid", spark_partition_id()))
    val local = ranged.withColumn("__rn", row_number().over(
      Window.partitionBy(col("__pid")).orderBy(order: _*)))
    val offsets = ranged.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("file_id",
        ((col("__off") + col("__rn") - 1) / rowsPerFile).cast("long"))
      .drop("__pid", "__rn", "__off")
  }

  /** Per-file stats over the given dims: (file_id, n_rows,
    * min_<dim>, max_<dim> …) — the skipping manifest a reader prunes on. */
  def fileStats(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      dims.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy("file_id").agg(aggs.head, aggs.tail: _*)
  }
}
