package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive: given two
  * snapshots of a document table, classify every id as added / removed /
  * changed / unchanged by content hash. A training-data pipeline uses
  * this to audit what a re-crawl or re-filter actually changed, to build
  * incremental processing lists (only `added`+`changed` need re-tokenizing
  * / re-embedding), and to keep dataset lineage honest between releases.
  *
  * Scale shape: each side is reduced MAP-SIDE to (id, sha256) before the
  * join — document bytes never cross the exchange, so the shuffle is two
  * slim hash columns regardless of corpus size; the full-outer join is a
  * plain keyed shuffle join (or exchange-free if both snapshots are
  * bucketed by id at rest). Same narrow-join discipline as
  * [[graft.functions.TextFunctions]]' quality features.
  */
object Snapshot {

  /** Per-id diff: (id, status) for every id in either snapshot, status ∈
    * added | removed | changed | unchanged (relative to `oldDf`). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val oh = oldDf.select(col(idCol).as("id"),
      sha2(col(contentCol), 256).as("__old_hash"))
    val nh = newDf.select(col(idCol).as("id"),
      sha2(col(contentCol), 256).as("__new_hash"))
    oh.join(nh, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__old_hash").isNull, "added")
          .when(col("__new_hash").isNull, "removed")
          .when(col("__old_hash") =!= col("__new_hash"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Release-note rollup of [[diff]]: one row per status with counts. */
  def summary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCol: String): DataFrame =
    diff(oldDf, newDf, idCol, contentCol)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
}
