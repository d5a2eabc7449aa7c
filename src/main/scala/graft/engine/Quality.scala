package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven data-quality checks.
  *
  * The reference hardcodes 12 checks (validate_silver.py:62-270) and ignores
  * its own config-declared rules (config/config.yaml:1-5) — SURVEY §5 calls
  * that a gap to fix. Here checks are data: an ADT the caller composes, so
  * the suite in config drives execution.
  *
  * Scale design: all row-level checks against one table collapse into ONE
  * aggregate pass over that table (a single scan + partial agg, no matter
  * how many checks), then the 1-row result is unpivoted to per-check rows.
  * Referential checks are anti-join counts (broadcast when the key side is
  * small); freshness is a max() scan. Nothing materializes per-row flags.
  *
  * Output shape mirrors silver.data_quality_logs
  * (transform_silver.py:120-129): table_name, quality_check,
  * records_checked, records_failed, failure_rate, status.
  */
object Quality {

  sealed trait Check { def table: String; def name: String }

  /** Fail when the column is NULL. Ref: validate_silver.py:62-111. */
  final case class NotNull(table: String, column: String) extends Check {
    def name = s"null_check_$column"
  }

  /** Fail when the column does NOT match the regex (nulls fail too).
    * Ref: validate_silver.py:113-136 (email format). */
  final case class Format(table: String, column: String, regex: String)
      extends Check {
    def name = s"format_check_$column"
  }

  /** Fail when the column is outside [lo, hi]. Ref: validate_silver.py:138-158. */
  final case class Bounds(table: String, column: String, lo: Column, hi: Column)
      extends Check {
    def name = s"range_check_$column"
  }

  /** Fail when the predicate holds (business rules).
    * Ref: validate_silver.py:186-233. */
  final case class Rule(table: String, ruleName: String, failWhen: Column)
      extends Check {
    def name = ruleName
  }

  /** Fail (table-level, 1 record checked) when max(column) < cutoff.
    * Ref: validate_silver.py:235-270. */
  final case class Freshness(table: String, column: String, cutoff: Column)
      extends Check {
    def name = s"freshness_check_$column"
  }

  /** Orphan keys: fail-count = rows of `table` whose `column` has no match
    * in refTable.refColumn. Ref: validate_silver.py:160-184. */
  final case class Referential(table: String, column: String,
      refTable: String, refColumn: String) extends Check {
    def name = s"referential_check_$column"
  }

  /** Duplicate keys: fail-count = rows sharing their key value with
    * another row (rows in groups of size > 1). One hash aggregate on the
    * key + one 1-row rollup — no window, no self-join. */
  final case class Unique(table: String, column: String) extends Check {
    def name = s"unique_check_$column"
  }

  private def failCond(c: Check): Column = c match {
    case NotNull(_, col0) => col(col0).isNull
    case Format(_, col0, re) => !col(col0).rlike(re) || col(col0).isNull
    case Bounds(_, col0, lo, hi) => col(col0) < lo || col(col0) > hi
    case Rule(_, _, f) => f
    case _ => throw new IllegalArgumentException(s"not a row-level check: $c")
  }

  /** Run a check suite. `tables` resolves a table name to its DataFrame.
    * The config-driven design invites an empty (or fully filtered-out)
    * suite — reject it loudly rather than throwing an opaque
    * `reduce` UnsupportedOperationException. */
  def run(tables: String => DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty,
      "Quality.run: empty check suite — nothing to validate (did config filtering drop every check?)")
    val perTable = checks.collect {
      case c @ (_: NotNull | _: Format | _: Bounds | _: Rule) => c
    }.groupBy(_.table).toSeq.sortBy(_._1).map { case (t, cs) =>
      val df = tables(t)
      val aggs = count(lit(1)).as("__n") +:
        cs.zipWithIndex.map { case (c, i) =>
          count(when(failCond(c), 1)).as(s"__f$i")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val entries = cs.zipWithIndex.map { case (c, i) =>
        struct(lit(t).as("table_name"), lit(c.name).as("quality_check"),
          col("__n").as("records_checked"), col(s"__f$i").as("records_failed"))
      }
      one.select(explode(array(entries: _*)).as("r")).select("r.*")
    }

    val referential = checks.collect { case c: Referential => c }.map { c =>
      val base = tables(c.table)
      val ref = tables(c.refTable).select(col(c.refColumn).as(c.column))
      val orphans = base.select(col(c.column))
        .join(ref, Seq(c.column), "left_anti")
        .agg(count(lit(1)).as("records_failed"))
      val n = base.agg(count(lit(1)).as("records_checked"))
      n.crossJoin(orphans).select(
        lit(c.table).as("table_name"), lit(c.name).as("quality_check"),
        col("records_checked"), col("records_failed"))
    }

    val unique = checks.collect { case c: Unique => c }.map { c =>
      tables(c.table)
        .groupBy(col(c.column)).agg(count(lit(1)).as("__gn"))
        .agg(sum(col("__gn")).as("records_checked"),
          sum(when(col("__gn") > 1, col("__gn")).otherwise(0L))
            .as("records_failed"))
        .select(lit(c.table).as("table_name"),
          lit(c.name).as("quality_check"),
          coalesce(col("records_checked"), lit(0L)).cast("long")
            .as("records_checked"),
          coalesce(col("records_failed"), lit(0L)).cast("long")
            .as("records_failed"))
    }

    val freshness = checks.collect { case c: Freshness => c }.map { c =>
      tables(c.table).agg(max(col(c.column)).as("__mx")).select(
        lit(c.table).as("table_name"), lit(c.name).as("quality_check"),
        lit(1L).as("records_checked"),
        when(col("__mx") < c.cutoff || col("__mx").isNull, 1L).otherwise(0L)
          .as("records_failed"))
    }

    (perTable ++ referential ++ unique ++ freshness)
      .reduce(_ unionByName _)
      .withColumn("failure_rate",
        when(col("records_checked") > 0,
          Det.roundN(col("records_failed") * 100.0 / col("records_checked"), 2))
          .otherwise(0.0))
      .withColumn("status",
        when(col("records_failed") === 0, "PASS").otherwise("FAIL"))
  }

  /** Aggregate quality score = % of checks passed (validate_silver.py:48-53). */
  def score(report: DataFrame): DataFrame =
    report.agg(
      count(lit(1)).as("checks_total"),
      count(when(col("records_failed") === 0, 1)).as("checks_passed"),
      Det.roundN(count(when(col("records_failed") === 0, 1)) * 100.0 /
        count(lit(1)), 2).as("quality_score"))
}
