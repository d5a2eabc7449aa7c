package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Dedup
import graft.operators.Dedup.MinhashLshIndex
import graft.engine.Stage.syntax._

/** Streaming near-duplicate ingest — the ingest-time dedup loop at rest:
  * every micro-batch (1) probes the PERSISTENT MinHash band index for
  * near-dups against everything that arrived before it (plus itself),
  * landing flagged pairs, then (2) appends its own band buckets / shingle
  * relation / set sizes to the index. A pair (a, b) is therefore reported
  * exactly once — by whichever batch arrives later — and no batch ever
  * re-runs corpus×corpus LSH: per-batch work is O(|batch| + touched
  * buckets), the [[Dedup.minhashProbe]] contract.
  *
  * Probe strictly BEFORE append: the probe unions batch and corpus bucket
  * members, so a batch already present in the index would double its size
  * rows and corrupt the Jaccard join.
  *
  * All writes go through dynamic partition overwrite on batch_id — a
  * replayed micro-batch rewrites exactly its own partitions with the same
  * rows (same contract as the Pipeline lake sink), so checkpoint-restart
  * stays exactly-once at the index level too.
  */
object NearDupIngest {

  /** Load the at-rest index from `dir`; missing subdirs (cold start)
    * yield empty relations whose schemas derive from an empty slice of
    * the batch itself, so the first micro-batch bootstraps the index. */
  def loadIndex(spark: SparkSession, dir: String, like: DataFrame,
      idCol: String, textCol: String, numHashes: Int, bands: Int,
      shingleSize: Int): MinhashLshIndex = {
    val empty = Dedup.minhashIndex(like.limit(0), idCol, textCol,
      numHashes, bands, shingleSize)
    def load(name: String, fallback: DataFrame): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) spark.read.parquet(p.toString).drop("batch_id")
      else fallback
    }
    MinhashLshIndex(load("buckets", empty.buckets),
      load("shingles", empty.shingles), load("sizes", empty.sizes),
      numHashes, bands, shingleSize)
  }

  /** Run the ingest loop over a streaming `docs` relation until the
    * source drains (processAllAvailable — in production attach a
    * checkpointLocation and leave the query running). Pairs land under
    * `pairsDir`, the index under `indexDir/{buckets,shingles,sizes}`. */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, pairsDir: String, threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      maxBucket: Int = 64): Unit = {
    // replay idempotency depends on overwriting ONLY the replayed batch's
    // partitions (same setting the Pipeline lake sink runs under)
    docs.sparkSession.conf.set(
      "spark.sql.sources.partitionOverwriteMode", "dynamic")
    val q = docs.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // staged once: consumed by the probe (twice: buckets + verify)
        // and by the index-entry build
        val b = batch.staged
        val idx0 = loadIndex(spark, indexDir, b, idCol, textCol,
          numHashes, bands, shingleSize)
        // SELF-EXCLUSION: a replayed batch (checkpoint restart after a
        // failure between the pairs write and the index append) finds its
        // own entries already in the index — probing against them doubles
        // every shingle row and corrupts the Jaccard denominators. Anti-
        // joining the batch's ids out (broadcast — ids are batch-sized)
        // makes replay exact, and is also the right semantics for
        // re-ingesting updated documents.
        val ids = b.select(col(idCol).as("id")).distinct()
        val idx = MinhashLshIndex(
          idx0.buckets.join(broadcast(ids), Seq("id"), "left_anti"),
          idx0.shingles.join(broadcast(ids), Seq("id"), "left_anti"),
          idx0.sizes.join(broadcast(ids), Seq("id"), "left_anti"),
          numHashes, bands, shingleSize)
        // the batch's own index is built ONCE (staged: buckets feed the
        // probe twice — touched + members — plus the store append) and
        // serves both the probe and the append; rebuilding the
        // shingle→minhash family inside the probe doubled per-batch cost
        val mine0 = Dedup.minhashIndex(b, idCol, textCol,
          numHashes, bands, shingleSize)
        val mine = MinhashLshIndex(mine0.buckets.staged, mine0.shingles,
          mine0.sizes.staged, numHashes, bands, shingleSize)
        val pairs = Dedup.minhashProbeIndexed(mine, idx, threshold, maxBucket)
        write(pairs, batchId, pairsDir)
        write(mine.buckets, batchId, s"$indexDir/buckets")
        write(mine.shingles, batchId, s"$indexDir/shingles")
        write(mine.sizes, batchId, s"$indexDir/sizes")
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  private def write(df: DataFrame, batchId: Long, path: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite).partitionBy("batch_id").parquet(path)
}
