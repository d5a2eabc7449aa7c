package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Pq, Similarity}

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 2-dim vectors, m=2 → 1-dim subspaces, k=2 codes seeded from vectors
  // 0 and 1. Hand-computed: sub-0 codes are c0=1.0, c1=0.0; sub-1 codes
  // c0=0.0, c1=1.0.
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f)),
    (2L, Array(0.9f, 0.1f)),   // encodes as (code0, code0)
    (3L, Array(0.1f, 0.9f)))   // encodes as (code1, code1)
    .toDF("vec_id", "embedding")

  test("subvector split, seeding, and encoding match hand computation") {
    val cb = Pq.seedCodebooks(vecs, m = 2, dims = 2, k = 2)
    val cbMap = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).head).toMap
    assert(cbMap === Map((0, 0) -> 1.0f, (0, 1) -> 0.0f,
      (1, 0) -> 0.0f, (1, 1) -> 1.0f))
    val enc = Pq.encode(Pq.subVectors(vecs, 2, 2), cb)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // v2 = (0.9, 0.1): sub0 nearest 1.0 → code 0; sub1 nearest 0.0 → code 0
    assert(enc((2L, 0)) === 0 && enc((2L, 1)) === 0)
    // v3 = (0.1, 0.9): sub0 nearest 0.0 → code 1; sub1 nearest 1.0 → code 1
    assert(enc((3L, 0)) === 1 && enc((3L, 1)) === 1)
  }

  test("one refine step moves codes to member means; dead codes survive") {
    val cb = Pq.seedCodebooks(vecs, m = 2, dims = 2, k = 2)
    val refined = Pq.pqStep(Pq.subVectors(vecs, 2, 2), cb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getSeq[Float](2).head, r.getLong(3))).toMap
    // sub0 code0 members: v0 (1.0), v2 (0.9) → mean 0.95
    assert(math.abs(refined((0, 0))._1 - 0.95f) < 1e-6)
    assert(refined((0, 0))._2 === 2L)
    // sub0 code1 members: v1 (0.0), v3 (0.1) → mean 0.05
    assert(math.abs(refined((0, 1))._1 - 0.05f) < 1e-6)
  }

  test("dead code keeps previous centroid with zero members") {
    // all four vectors' sub-0 values sit at >= 0.9 or so close to code 0
    // that code 1 (seeded far away) attracts nothing
    val clustered = Seq(
      (0L, Array(1.0f)), (1L, Array(-5.0f)),
      (2L, Array(0.9f)), (3L, Array(0.95f))).toDF("vec_id", "embedding")
    val cb = Pq.seedCodebooks(clustered.filter($"vec_id" =!= 1), m = 1,
      dims = 1, k = 2)
    // drop the only vector near code 1's seed... seed k=2 comes from ids
    // 0 and 2 → codes at 1.0 and 0.9; far vector 1 goes to 0.9's code
    val refined = Pq.pqStep(Pq.subVectors(clustered, 1, 1), cb)
      .collect().map(r => (r.getInt(1), (r.getSeq[Float](2).head, r.getLong(3)))).toMap
    assert(refined.values.map(_._2).sum === 4L, "every vector assigned")
  }

  test("IVF-PQ with all cells probed matches flat ADC search") {
    val emb = (1L to 100L).map { i =>
      (i, Array.tabulate(4)(j => ((i * 7 + j * 13) % 17 - 8).toFloat / 8f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    val centroids = emb.filter($"vec_id" <= 4)
      .select($"vec_id".as("cell"), $"embedding".as("c_emb"))
    val cb = Pq.train(emb, m = 2, dims = 4, k = 8, iters = 1)
    val q = emb.filter($"vec_id" === 1).select($"embedding".as("q_emb"))
    val flat = Pq.adcTopK(emb, cb, q, kTop = 5, m = 2, dims = 4,
        rescoreFactor = 4)
      .select("vec_id").as[Long].collect().toSeq
    val ivfpq = Pq.ivfPqTopK(emb, centroids, cb, q, kTop = 5, nProbe = 4,
        m = 2, dims = 4, rescoreFactor = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivfpq === flat, "probing every cell must equal the flat scan")
  }

  test("ADC with exact rescore: recall@10 >= 0.9 vs brute force") {
    val docs = (1L to 300L).map { i =>
      (i, s"doc $i " + ("word " * (i % 17).toInt) + ("x" * (i % 13).toInt) +
        (if (i % 3 == 0) " the quick brown fox" else " lazy dog jumps"))
    }.toDF("doc_id", "text")
    val media = Multimodal.toMediaTable(docs, "doc_id", "text")
    val emb = Multimodal.pseudoEmbed(Multimodal.extractFeatures(spark, media).toDF())
      .select($"id".as("vec_id"), $"embedding")
      .localCheckpoint()
    val cb = Pq.train(emb, m = 2, dims = 8, k = 16, iters = 2)
    val q = emb.filter($"vec_id" === 1).select($"embedding".as("q_emb"))
    val pq = Pq.adcTopK(emb, cb, q, kTop = 10, m = 2, dims = 8,
        rescoreFactor = 5)
      .select("vec_id").as[Long].collect().toSet
    val bf = Similarity.bruteForceTopK(emb, q, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = pq.intersect(bf).size / 10.0
    assert(recall >= 0.9, s"recall@10 $recall (pq=$pq bf=$bf)")
  }
}
