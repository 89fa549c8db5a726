package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-window chunking: split each row's token stream into
  * fixed-size windows with overlap (stride < winSize keeps a
  * winSize−stride token overlap between consecutive chunks) — the
  * operator that turns a long-document corpus into model-sized training
  * pieces.
  *
  * Shape: row-local fan-out (sequence+explode over chunk starts, slice
  * per chunk) — no shuffle; a document's chunks are produced where the
  * document lives. The last chunk may be partial; a document shorter
  * than one stride still yields exactly one chunk.
  */
object Chunking {

  /** All input columns are kept; adds `chunk_idx`, `start_token`,
    * `chunk_tokens`, `chunk_text`. */
  def chunk(df: DataFrame, textCol: String, winSize: Int, stride: Int): DataFrame = {
    require(winSize > 0 && stride > 0 && stride <= winSize,
      "need 0 < stride <= winSize")
    val nTok: Column = size(col("__toks"))
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(lit(0), floor((nTok - 1) / stride)).cast("int"))))
      .withColumn("start_token", col("chunk_idx") * stride)
      .withColumn("chunk_tokens",
        least(lit(winSize), nTok - col("start_token")))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), col("start_token") + 1, lit(winSize)), " "))
      .drop("__toks")
  }
}
