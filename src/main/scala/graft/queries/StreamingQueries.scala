package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}
import graft.streaming.{BloomIngest, NearDupIngest}

/** Batch-driven, oracle-checked replays of the streaming ingest loops.
  *
  * The streaming family (graft.streaming) is spec-proven — replay
  * exactness, batch parity, no-false-negative — but specs only assert
  * properties. The END STATE of an ingest over a DETERMINISTIC batch
  * sequence is a pure function of the data: slice the documents table
  * into fixed batches, drive the real Structured Streaming query
  * (file source, maxFilesPerTrigger=1, mtime-ordered), read the lake it
  * wrote, and hash-check every per-doc flag against a DuckDB
  * re-derivation of the whole loop — the Bloom probe against
  * strictly-earlier batches' bits, the within-batch canonical choice,
  * and the novelty verdict. The streaming family's first oracle entry.
  */
object StreamingQueries {

  private val NumBatches = 4

  /** Write each batch slice as a single deterministically-named and
    * -timestamped parquet file so the file source's mtime ordering is the
    * batch order by construction. */
  private def stageBatches(docs: org.apache.spark.sql.DataFrame,
      srcDir: Path, nBatches: Int = NumBatches): Unit = {
    (0 until nBatches).foreach { i =>
      val tmp = Files.createTempDirectory(s"replay-b$i")
      docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString
        .startsWith("part-")).findFirst().get()
      val dst = srcDir.resolve(f"batch-$i%02d.parquet")
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1000000000000L + i * 60000L))
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // End state of the Bloom-prefiltered exact-dedup ingest after 4
    // deterministic micro-batches (batch b = doc_id mod 4). The oracle
    // re-derives, per doc: maybe_present — the k=5 affine-md5 bit probe
    // against the OR of strictly-earlier batches' filter words (bit p set
    // in the merged filter ⟺ some earlier key hashed to p: word/bit ↔
    // position is bijective, so no bit_or needed in SQL) — plus the
    // within-batch canonical flag and the novelty verdict (first batch to
    // carry the content hash). A Bloom false positive shows up as
    // maybe_present=true with is_new=true — the exact-verify path the
    // filter exists to bound, visible and hash-checked in the artifact.
    QueryDef.sql(
      "q_stream_replay",
      raw"""WITH hashed AS (
         |  SELECT doc_id, doc_id % $NumBatches AS batch_id,
         |    sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS ch
         |  FROM documents),
         |keys AS (SELECT DISTINCT batch_id, ch FROM hashed),
         |jj AS (SELECT unnest(generate_series(0, 4)) AS j),
         |pos AS (
         |  SELECT batch_id, ch, j,
         |    (${Det.h56Sql("ch")} + j * ${Det.h56Sql("ch", 17)}) % 65536 AS p
         |  FROM keys, jj),
         |epos AS (SELECT DISTINCT batch_id, p FROM pos),
         |hit AS (
         |  SELECT q.batch_id, q.ch, q.j,
         |    MAX(CASE WHEN e.p IS NOT NULL THEN 1 ELSE 0 END) AS hit
         |  FROM pos q LEFT JOIN epos e
         |    ON e.p = q.p AND e.batch_id < q.batch_id
         |  GROUP BY 1, 2, 3),
         |mp AS (
         |  SELECT batch_id, ch, MIN(hit) = 1 AS maybe_present
         |  FROM hit GROUP BY 1, 2),
         |fb AS (SELECT ch, MIN(batch_id) AS first_batch FROM keys GROUP BY 1)
         |SELECT h.doc_id, h.batch_id, mp.maybe_present,
         |  row_number() OVER (PARTITION BY h.batch_id, h.ch
         |                     ORDER BY h.doc_id) = 1 AS batch_canonical,
         |  h.batch_id = fb.first_batch AS is_new
         |FROM hashed h
         |JOIN mp ON mp.batch_id = h.batch_id AND mp.ch = h.ch
         |JOIN fb ON fb.ch = h.ch
         |ORDER BY h.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val srcDir = Files.createTempDirectory("replay-src")
      val stateDir = Files.createTempDirectory("replay-state").toString
      val outDir = Files.createTempDirectory("replay-out").toString
      stageBatches(docs, srcDir)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      BloomIngest.start(stream, "doc_id", "text", stateDir, outDir)
      s.read.parquet(outDir)
        .select(col("doc_id"), col("batch_id").cast("long").as("batch_id"),
          col("maybe_present"), col("batch_canonical"), col("is_new"))
        .orderBy("doc_id")
    },

    // End state of the MinHash near-dup ingest after 2 deterministic
    // micro-batches (batch b = doc_id mod 2). The streamed pair lake
    // must equal the one-shot corpus LSH run EXACTLY (the probe caps
    // buckets at the combined corpus+batch population, so prefix caps
    // can only be tighter; on these corpora no bucket approaches the cap
    // — max population 8 at sf0.1), with each pair attributed to the
    // batch where its LATER member arrived (exactly-once reporting).
    // Oracle = the same banded-LSH + exact-Jaccard re-derivation that
    // checks dedup_minhash_lsh, plus the arrival attribution.
    QueryDef.sql(
      "q_stream_neardup_replay",
      s"""${Extensions.minhashPairsCte}
         |SELECT id_a, id_b, jaccard,
         |  GREATEST(id_a % 2, id_b % 2) AS reported_batch
         |FROM mh_pairs WHERE jaccard >= 0.8
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val srcDir = Files.createTempDirectory("neardup-replay-src")
      val idxDir = Files.createTempDirectory("neardup-replay-idx").toString
      val pairsDir = Files.createTempDirectory("neardup-replay-out").toString
      stageBatches(docs, srcDir, nBatches = 2)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      NearDupIngest.start(stream, "doc_id", "text", idxDir, pairsDir,
        threshold = 0.8)
      s.read.parquet(pairsDir)
        .select(col("id_a"), col("id_b"), col("jaccard"),
          col("batch_id").cast("long").as("reported_batch"))
        .orderBy("id_a", "id_b")
    },
  )
}
