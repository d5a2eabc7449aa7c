package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Contamination, Shards}

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("contamination flags the planted benchmark copy, not clean docs") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim copy with a prefix → contains every benchmark shingle
      (1L, "breaking news the quick brown fox jumps over the lazy dog tonight"),
      // partial overlap below threshold
      (2L, "the quick brown fox sleeps"),
      // clean
      (3L, "completely unrelated text about spark engines and parquet files"))
      .toDF("doc_id", "text")
    val out = Contamination.ngramOverlap(corpus, bench, "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toList
    assert(out.map(_._1) === List(1L), s"got $out")
    assert(out.head._3 === 1.0, "verbatim copy carries every shingle")
  }

  test("shard assignment partitions the corpus and balances weight") {
    val docs = spark.range(2000).select(
      col("id").as("doc_id"),
      // heavy tail: 10 docs carry 50x weight
      when(col("id") < 10, 5000L).otherwise(lit(100L)).as("tokens"))
    val a = Shards.assign(docs, "doc_id", "tokens", nShards = 4,
      heavyCutoff = 1000)
    // complete + disjoint: every doc exactly once
    assert(a.count() === 2000)
    assert(a.select("doc_id").distinct().count() === 2000)
    assert(a.filter(col("shard") < 0 || col("shard") >= 4).count() === 0)
    // deterministic under repartitioning
    val b = Shards.assign(docs.repartition(13), "doc_id", "tokens",
      nShards = 4, heavyCutoff = 1000)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the 10 heavies deal 3-3-2-2 round-robin; with hash placement alone
    // a shard could have drawn 4+ of them
    val heavyPerShard = a.filter(col("tokens") === 5000L)
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(heavyPerShard.values.max <= 3, s"got $heavyPerShard")
    // total-weight imbalance stays tight
    val imb = Shards.summary(a, "tokens")
      .agg(max("imbalance")).as[Double].collect().head
    assert(imb < 1.25, s"max shard carries ${imb}x the ideal share")
  }
}
