package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-token-budget
  * training sequences — the standard pre-tokenization packing pass that
  * turns a document corpus into context-window-sized examples.
  *
  * Documents are laid end-to-end in a deterministic order within each
  * stream (source, shard, date — whatever the caller keys on); a document
  * starts in sequence `floor(tokens_before / budget)` at offset
  * `tokens_before % budget`. Pure integer math, so the layout is exactly
  * reproducible on any engine.
  *
  * Scale design: packing is inherently sequential PER STREAM — the
  * running total is a `sum() over (partition by stream order by ord)`
  * window, which shuffles once on the stream key and never collapses to a
  * single partition as long as the caller's stream key has enough
  * cardinality (at 100 TB: shard the stream key, e.g. (source,
  * xxhash64(doc_id) % nShards), and pack each shard independently —
  * packing quality is unaffected because sequences never span streams).
  */
object Packing {

  /** Overlapping token-window chunking: split each document into
    * `chunkSize`-token windows starting every `stride` tokens (stride <
    * chunkSize ⇒ adjacent chunks overlap by chunkSize - stride tokens —
    * the standard context-window prep for RAG / long-doc training).
    * Purely narrow: tokens stay inside the row until one explode over
    * the chunk starts, no shuffle anywhere, so a 100 TB corpus chunks in
    * a single map stage. Token-less documents produce no chunks; a final
    * partial window is kept (its `n_chunk_tokens` says how short it is). */
  def chunkTokens(docs: DataFrame, id: Column, text: Column,
      chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got stride=$stride chunk=$chunkSize")
    docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col("doc_id"), col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - 1, lit(stride)))
          .as("st"))
      .select(col("doc_id"),
        (col("st") / lit(stride)).cast("long").as("chunk_id"),
        size(slice(col("_toks"), col("st") + 1, lit(chunkSize)))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("_toks"), col("st") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Sequence assignment per document: `seq_id` (0-based within the
    * stream) and `seq_offset` (token offset where the document starts in
    * its sequence). Documents longer than `budget` span sequences —
    * downstream splitting is a narrow map; they still advance the layout
    * exactly. */
  def greedyPack(docs: DataFrame, id: Column, stream: Column,
      nTokens: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col("stream")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(id.as("doc_id"), stream.as("stream"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("stream"), col("n_tokens"),
        floor(col("tokens_before").cast("double") / lit(budget.toDouble))
          .cast("long").as("seq_id"),
        (col("tokens_before") % budget).as("seq_offset"))
  }
}
