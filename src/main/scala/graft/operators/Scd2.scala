package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge: fold an updated snapshot into a
  * versioned dimension history. The warehouse-side upsert the reference's
  * keyed loads (SURVEY K4) stop short of — K4 overwrites in place, losing
  * history; SCD2 closes the old version and opens a new one, so any fact
  * row can be joined to the dimension attributes that were true AT ITS
  * TIMESTAMP (via [[AsOfJoin]] on valid_from, or a BETWEEN valid_from AND
  * valid_to range join).
  *
  * Contract: `current` is the full history table with meta columns
  * `valid_from`, `valid_to` (NULL = open) and `is_current`; `updates` is a
  * key + attrs snapshot as of `asOf`. Per key:
  *   - update with changed attrs  → close the open row (valid_to = asOf,
  *     is_current = false) AND append a new open row (valid_from = asOf);
  *   - update with equal attrs    → open row passes through unchanged;
  *   - key absent from updates    → open row passes through unchanged;
  *   - key absent from current    → brand-new open row;
  *   - already-closed history rows are immutable and pass through.
  *
  * Scale shape: ONE full-outer sort-merge/hash join of open-rows vs
  * updates on the key (both sides shuffle once), then a per-row CASE
  * emitting 1 or 2 output rows via explode — no second pass over the join,
  * no driver-side diffing. History rows ride along with a union (no
  * shuffle). At rest, pair this with dynamic partition overwrite on a
  * valid_from date partition (see engine.Pipeline.upsertByDate) so a merge
  * rewrites only touched partitions. NULL-safe comparison (`<=>`) means a
  * NULL→value or value→NULL attr transition counts as a change.
  */
object Scd2 {

  def merge(current: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], asOf: Column): DataFrame = {
    val vfType = current.schema("valid_from").dataType
    val vtType = current.schema("valid_to").dataType
    val history = current.filter(!col("is_current"))
    val open = current.filter(col("is_current")).alias("c")
    // a duplicated key in the update batch would emit duplicate open rows
    // through the full-outer join (silent history corruption); collapse to
    // one row per key deterministically — greatest attrs tuple wins, the
    // same tiebreak on every run/partitioning
    val updDedup = updates
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(key)
          .orderBy(attrs.map(a => col(a).desc_nulls_last): _*)))
      .filter(col("__rn") === 1).drop("__rn")
    val upd = updDedup.alias("u")
    val ck = col(s"c.$key")
    val uk = col(s"u.$key")
    val changed = attrs.map(a => !(col(s"c.$a") <=> col(s"u.$a"))).reduce(_ || _)
    def row(keyC: Column, attr: String => Column, vf: Column, vt: Column,
        cur: Boolean): Column =
      struct(keyC.as(key) +: attrs.map(a => attr(a).as(a)) :+
        vf.cast(vfType).as("valid_from") :+ vt.cast(vtType).as("valid_to") :+
        lit(cur).as("is_current"): _*)
    val keep = row(ck, a => col(s"c.$a"), col("c.valid_from"), col("c.valid_to"),
      cur = true)
    val rows =
      when(uk.isNull, array(keep)) // no update for this key
        .when(ck.isNull, // brand-new key
          array(row(uk, a => col(s"u.$a"), asOf, lit(null), cur = true)))
        .when(changed, array( // close the old version, open the new one
          row(ck, a => col(s"c.$a"), col("c.valid_from"), asOf, cur = false),
          row(ck, a => col(s"u.$a"), asOf, lit(null), cur = true)))
        .otherwise(array(keep)) // update carried identical attrs
    val merged = open.join(upd, ck === uk, "full_outer")
      .select(explode(rows).as("__r"))
      .select(col("__r.*"))
    history.select(merged.columns.map(col): _*).unionByName(merged)
  }
}
