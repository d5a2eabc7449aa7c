package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — concatenating short documents into fixed-budget
  * training sequences so context windows aren't wasted on padding (the
  * standard pre-training batching trick). Contiguous-fill assignment:
  * documents in deterministic id order go to the sequence where their
  * FIRST token would land,
  *
  *   seq_id = floor(tokens_before / maxTokens)
  *
  * so a sequence can overflow by at most one document's tail (greedy
  * contiguous packing; exact bin packing is NP-hard and order-dependent —
  * this is the deterministic, restart-stable approximation production
  * pipelines use). `offset` (= tokens_before − seq start) tells the
  * tokenizer where the doc begins inside its sequence.
  *
  * Scale: the running token total is a window cumulative sum. An
  * UNPARTITIONED cumulative sum is a single-reducer scan, so packing is
  * always partitioned by a shard column ([[Shards.assign]] upstream, or
  * any corpus partition key): each shard packs independently in one
  * window pass, which is exactly how shard-local training files are laid
  * out anyway.
  */
object Packing {

  /** Assign (seqCol, offsetCol) within each `shardCol` partition.
    * `tokensCol` is the per-doc token count; order inside a shard is by
    * `idCol` (must be unique per shard). */
  def contiguous(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(tokensCol)).over(w), lit(0L))
    df.withColumn("__before", before)
      .withColumn("seq_id",
        floor(col("__before") / lit(maxTokens.toDouble)).cast("long"))
      .withColumn("offset",
        (col("__before") - col("seq_id") * maxTokens).cast("long"))
      .drop("__before")
  }
}
