package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.Det

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the query vector, one map-only
  *    pass computing cosine (double-precision fold over zip_with), then a
  *    TakeOrderedAndProject top-k. Exact; the O(N) baseline.
  *  - IVF (inverted-file) top-k: the 100 TB path. Vectors are assigned to
  *    their nearest centroid once (a broadcast join against a small
  *    codebook — at rest this becomes the partitioning key), and a query
  *    probes only the nProbe nearest cells. Recall < 1 is traded for
  *    scanning nProbe/nCells of the data.
  *  - embeddingNearDups: sign-LSH (deterministic Rademacher hyperplanes
  *    seeded by xxhash64) → banded buckets → exact cosine verification.
  *
  * All cosine math is done in DOUBLE after casting the float elements, with
  * left-to-right folds — the same association an oracle computes, so
  * results are bit-comparable.
  */
object Similarity {

  /** Cast array<float> → array<double>. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(0.0)
  }

  /** Exact top-k by cosine against one query vector (given as a 1-row
    * DataFrame with column `q_emb`, broadcast). */
  def bruteForceTopK(vectors: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    vectors
      .crossJoin(broadcast(query))
      .withColumn("cosine",
        Det.roundN(cosine(asDouble(col(embCol)), col("q_emb")), 6))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))

  /** Assign each vector to its nearest centroid (broadcast codebook).
    * Returns the input plus `cell` (centroid id). */
  def assignCells(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val scored = vectors
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine(asDouble(col(embCol)), col("c_emb")))
    scored
      .groupBy(col(idCol))
      .agg(
        max_by(col("cell"), struct(col("__sim"), -col("cell"))).as("cell"),
        first(col(embCol)).as(embCol))
  }

  /** IVF top-k: probe the nProbe cells nearest to the query, brute-force
    * only within them. `centroids` has (cell, c_emb: array<double>). */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, query: DataFrame,
      k: Int, nProbe: Int, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val probes = centroids
      .crossJoin(broadcast(query))
      .withColumn("__sim", cosine(col("c_emb"), col("q_emb")))
      .orderBy(desc("__sim"), col("cell"))
      .limit(nProbe)
      .select("cell")
    val assigned = assignCells(vectors, centroids, idCol, embCol)
    assigned
      .join(broadcast(probes), Seq("cell"))
      .crossJoin(broadcast(query))
      .withColumn("cosine",
        Det.roundN(cosine(asDouble(col(embCol)), col("q_emb")), 6))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
      .select(col(idCol), col("cell"), col("cosine"))
  }

  /** Near-duplicate vector pairs: banded sign-LSH candidates + exact
    * cosine ≥ threshold. Returns (id_a, id_b, cosine). */
  def embeddingNearDups(vectors: DataFrame, threshold: Double,
      nBits: Int = 16, bands: Int = 4, maxBucket: Int = 256,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val bits = nBits / bands
    val base = vectors.select(col(idCol).as("id"), col(embCol))
      .withColumn("__e", asDouble(col(embCol)))
      .withColumn("__bits",
        transform(sequence(lit(0), lit(nBits - 1)),
          p => when(
            aggregate(
              zip_with(col("__e"), sequence(lit(0), size(col("__e")) - 1),
                (x, i) => x * when(xxhash64(p, i).bitwiseAND(1) === 1, 1.0)
                  .otherwise(-1.0)),
              lit(0.0), (a2, v) => a2 + v) >= 0, 1).otherwise(0)))
      .withColumn("__bands",
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws("",
            transform(sequence(lit(1), lit(bits)),
              r => element_at(col("__bits"), b * bits + r).cast("string"))))))
    val keyed = base.select(col("id"),
      posexplode(col("__bands")).as(Seq("band_id", "band_hash")))
    val sized = keyed
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band_id", "band_hash")))
      .filter(col("__bn") <= maxBucket)
    val l = sized.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
    val r = sized.select(col("band_id"), col("band_hash"), col("id").as("id_b"))
    val cands = l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val embs = base.select(col("id"), col("__e"))
    cands
      .join(embs.withColumnsRenamed(Map("id" -> "id_a", "__e" -> "e_a")), Seq("id_a"))
      .join(embs.withColumnsRenamed(Map("id" -> "id_b", "__e" -> "e_b")), Seq("id_b"))
      .withColumn("cosine", Det.roundN(cosine(col("e_a"), col("e_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
