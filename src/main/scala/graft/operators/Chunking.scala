package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document chunking: split each document into fixed-size token windows
  * with overlap — the step that turns variable-length documents into
  * training-context-sized rows (and retrieval passages). A doc with n
  * tokens yields ceil(n / (chunk - overlap)) chunks; consecutive chunks
  * share `overlap` tokens so no span longer than the overlap is ever cut
  * without appearing whole in some chunk.
  *
  * Shape: tokenize once, generate chunk starts with `sequence` (a pure
  * expression — chunk count derives from the token count, no window, no
  * shuffle at all: this is a map-side generator, embarrassingly parallel
  * at any scale), then one explode and an O(chunk) slice per output row.
  */
object Chunking {

  /** Returns (id, chunk_id, chunk_text, n_tokens), chunk_id counting from
    * 0 per document. `overlap` must be < `chunk`. */
  def byTokens(df: DataFrame, idCol: String, textCol: String,
      chunk: Int, overlap: Int = 0): DataFrame =
    // spread BEFORE tokenizing so the regex split runs parallel too
    // (byArray's own spread then no-ops on the already-spread input)
    byArray(graft.engine.Stage
      .spread(df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("__chunk_toks")),
      idCol, "__chunk_toks", chunk, overlap)

  /** Same chunking over an ALREADY-tokenized array column — the seam that
    * lets a learned tokenizer (e.g. [[graft.functions.Bpe]]) feed context
    * windows counted in its own subword units instead of whitespace
    * words. Same zero-shuffle map-side generator shape. */
  def byArray(df: DataFrame, idCol: String, toksCol: String,
      chunk: Int, overlap: Int = 0): DataFrame = {
    require(chunk > 0 && overlap >= 0 && overlap < chunk,
      s"need 0 <= overlap < chunk, got chunk=$chunk overlap=$overlap")
    val step = chunk - overlap
    // spread before the generator: chunk slicing is map-side and
    // embarrassingly parallel, but a single-file scan feeds it one task
    // (guide §2.5); no-op when the source is already well-split
    val toks = graft.engine.Stage.spread(
      df.select(col(idCol).as("id"), col(toksCol).as("toks")), col("id"))
    toks
      .select(col("id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(step))).as("start"))
      .select(col("id"),
        (col("start") / step).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("toks"), col("start") + lit(1), lit(chunk)))
          .as("chunk_text"),
        size(slice(col("toks"), col("start") + lit(1), lit(chunk))).cast("long")
          .as("n_tokens"))
  }
}
