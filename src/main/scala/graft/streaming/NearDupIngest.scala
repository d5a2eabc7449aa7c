package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Dedup
import graft.operators.Dedup.MinhashLshIndex

/** Streaming near-duplicate ingest — the ingest-time dedup loop at rest:
  * every micro-batch (1) probes the PERSISTENT MinHash band index for
  * near-dups against everything that arrived before it (plus itself),
  * landing flagged pairs, then (2) appends its own band buckets / shingle
  * relation / set sizes to the index. A pair (a, b) is therefore reported
  * exactly once — by whichever batch arrives later — and no batch ever
  * re-runs corpus×corpus LSH: per-batch work is O(|batch| + touched
  * buckets), the [[Dedup.minhashProbe]] contract.
  *
  * Append lands BEFORE the probe (the store doubles as the batch's
  * staging layer — see the body), so the corpus side must anti-join the
  * batch's own ids out: a batch present in the index would otherwise
  * double its size rows and corrupt the Jaccard join. That same
  * self-exclusion is what makes checkpoint-restart replay exact.
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
        // NOT staged: the batch is a file-source parquet slice, and the
        // only consumers that re-scan it are the (already-staged) shingle
        // explode inside minhashIndex and the tiny id projection below —
        // two scans of one small file cost less than the eager
        // localCheckpoint job staging would add per micro-batch
        // (StreamFloor: harness floor is job-count-bound at replay scale)
        val b = batch
        // THE STORE IS THE STAGE: the batch's index relations are written
        // to the store FIRST and the probe reads them back — one write
        // job per relation instead of localCheckpoint staging plus a
        // separate append, and every probe input is then parquet with
        // REAL size stats, so the probe's joins get honest broadcast
        // decisions instead of a stats-less staged frame's "huge"
        // default.
        val mine0 = Dedup.minhashIndex(b, idCol, textCol,
          numHashes, bands, shingleSize)
        // the three appends are independent reads of the (already
        // materialized) staged shingle relation — submit them as
        // CONCURRENT Spark jobs so the batch pays max(write) wall, not
        // sum(write): the replay's micro-batch cost is job-count-bound
        // (StreamFloor), and on a cluster concurrent small writes are
        // the standard foreachBatch shape
        parWrites(Seq(
          () => write(mine0.buckets, batchId, s"$indexDir/buckets"),
          () => write(mine0.shingles, batchId, s"$indexDir/shingles"),
          () => write(mine0.sizes, batchId, s"$indexDir/sizes")))
        // the index is loaded AFTER the append so the captured file
        // listing is current — a replayed batch's dynamic partition
        // overwrite would otherwise delete files a pre-append listing
        // still references. The corpus side must then exclude the batch
        // itself: SELF-EXCLUSION anti-joins the batch's ids out
        // (broadcast — ids are batch-sized), which simultaneously makes
        // checkpoint-restart replay exact (a replayed batch finds its own
        // entries in the store; probing against them would double every
        // shingle row and corrupt the Jaccard denominators) and is the
        // right semantics for re-ingesting updated documents.
        val ids = b.select(col(idCol).as("id")).distinct()
        val idx0 = loadIndex(spark, indexDir, b, idCol, textCol,
          numHashes, bands, shingleSize)
        val idx = MinhashLshIndex(
          idx0.buckets.join(broadcast(ids), Seq("id"), "left_anti"),
          idx0.shingles.join(broadcast(ids), Seq("id"), "left_anti"),
          idx0.sizes.join(broadcast(ids), Seq("id"), "left_anti"),
          numHashes, bands, shingleSize)
        def mineBack(name: String) = spark.read
          .parquet(s"$indexDir/$name")
          .filter(col("batch_id") === batchId).drop("batch_id")
        val mine = MinhashLshIndex(mineBack("buckets"), mineBack("shingles"),
          mineBack("sizes"), numHashes, bands, shingleSize)
        val pairs = Dedup.minhashProbeIndexed(mine, idx, threshold, maxBucket)
        write(pairs, batchId, pairsDir)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Same file-count discipline as Pipeline.upsertByDate: repartition by
    * the partition column so each batch partition lands as one file, not
    * tasks × partitions slivers — at ingest rates the index store's file
    * count tracks batches, and every later loadIndex reads fewer
    * footers. (8 writes per 2-batch replay also shed ~15 write tasks
    * each at fixture scale.) */
  private def write(df: DataFrame, batchId: Long, path: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .repartition(col("batch_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("batch_id").parquet(path)

  /** Run independent write jobs concurrently and propagate the first
    * failure. Spark's scheduler multiplexes concurrent jobs across the
    * same executors; inputs must already be materialized (staged blocks
    * or parquet) so no shared lazy subtree races its own evaluation. */
  private[streaming] def parWrites(jobs: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(jobs.map(j => Future(j()))), Duration.Inf)
    ()
  }
}
