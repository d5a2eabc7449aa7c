package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Contamination, Dedup, Shards}

/** Dev utility: scale-probe the corpus operators beyond the fixtures.
  * Replicates the sfDir documents table k× with offset ids (each doc
  * gains k−1 exact duplicates — a worst-ish case for dedup/contamination
  * candidate volume), writes it as parquet so scans are realistic, and
  * times the corpus operators on it. Usage:
  *   runMain graft.ScaleProbe [sfDir] [k]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(11)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.engine.Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    (0 until k).map(i => docs.withColumn("doc_id",
        col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents")
    val corpus = spark.read.parquet(s"$dir/documents")
    println(s"[scale] corpus: ${corpus.count()} docs (k=$k) at $dir")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"[scale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$c")
      spark.catalog.clearCache()
    }

    time("chunking")(
      Chunking.byTokens(corpus, "doc_id", "text", chunk = 32, overlap = 8))
    time("shard_pack") {
      Shards.summary(
        Shards.assign(corpus, "doc_id", "n_chars", nShards = 64,
          heavyCutoff = 500), "n_chars")
    }
    time("contamination") {
      Contamination.ngramOverlap(
        corpus.filter(col("doc_id") % 20 =!= 0),
        corpus.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleSize = 3, threshold = 0.5)
    }
    time("minhash_pairs")(
      Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.8))
    spark.stop()
  }
}
