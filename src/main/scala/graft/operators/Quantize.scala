package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization of an embedding column — the
  * storage-scale play for vector corpora: 4× fewer bytes at rest and on
  * the wire than float32 (a 100 TB embedding store becomes 25 TB), at a
  * recall cost ANN rescoring absorbs. Complements [[Pq]] (which
  * compresses harder but needs trained codebooks): int8 is codebook-free,
  * so it survives distribution drift without retraining.
  *
  *   scale(v) = max_i |v_i| / 127
  *   q_i      = clamp(floor(v_i / scale + 0.5), -127, 127)   (int8 range)
  *   v̂_i      = float(q_i · scale)
  *
  * floor(x + 0.5) instead of round(): pure IEEE arithmetic, so the
  * quantized codes are bit-identical across engines (Spark round()
  * routes through BigDecimal; DuckDB rounds in float math — they
  * disagree on ties). All-zero vectors get scale 0 and all-zero codes.
  *
  * The per-element transform is a single non-nested HOF evaluated once
  * per vector at index-build time (not per query); search then runs on
  * the dequantized column through the codegen'd
  * [[graft.expressions.CosineSim]] scan exactly like the flat path.
  */
object Quantize {

  /** Adds (scaleCol, qCol: array<int> in [-127, 127]) to the frame. */
  def int8(df: DataFrame, embCol: String, qCol: String = "q_emb8",
      scaleCol: String = "q_scale"): DataFrame =
    df.withColumn(scaleCol,
        (array_max(transform(col(embCol), x => abs(x))) / lit(127.0))
          .cast("double"))
      .withColumn(qCol,
        when(col(scaleCol) > 0,
          transform(col(embCol), x =>
            least(greatest(floor(x / col(scaleCol) + lit(0.5)), lit(-127.0)),
              lit(127.0)).cast("int")))
          .otherwise(transform(col(embCol), _ => lit(0))))

  /** Reconstruct the float vector from codes + scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, i => (i.cast("double") * scale).cast("float"))
}
