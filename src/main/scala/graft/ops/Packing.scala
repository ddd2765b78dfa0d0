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

  /** Best-first selection under a per-group token BUDGET: within each
    * group (source, language, domain), take documents in descending
    * `score` order (ties broken by ascending `tieBreak` — pass the doc
    * id, never leave ordering to chance) until the cumulative `cost`
    * (token count) would exceed `budget`. The standard "fill the data
    * mix with the best N tokens per domain" curation move.
    *
    * INCLUSIVE of the document that exactly reaches the budget, exclusive
    * of the one that would cross it; a single document larger than the
    * whole budget is never selected (its own cost already crosses).
    *
    * Scale shape: one window `sum() over (partition by group order by
    * score desc, tie)` — shuffles once on the group key; per-group
    * sequential scan is unavoidable (selection is order-dependent) but
    * groups process in parallel. Skewed groups: pre-shard the group key
    * and merge budgets, same note as [[greedyPack]]. */
  def budgetSelect(docs: DataFrame, group: Column, id: Column,
      score: Column, cost: Column, budget: Long,
      tieBreak: Column): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col("group"))
      .orderBy(col("score").desc, col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(group.as("group"), id.as("doc_id"),
        score.as("score"), cost.cast("long").as("cost"),
        tieBreak.as("_tie"))
      .withColumn("cum_cost", sum(col("cost")).over(w))
      .filter(col("cum_cost") <= budget)
      .drop("_tie")
  }

  /** Curriculum INTERLEAVE key: spread each group (language, domain,
    * source) evenly through the epoch instead of concatenating blocks —
    * row r of group g (0-based, ordered by `order` within the group)
    * gets key `r * G + gidx`, so sorting by the key round-robins the
    * groups. The key is an ORDERING KEY, not a global sort here: the
    * caller hands it to [[Sharding.layout]]'s `order` (sorts within
    * shards) or a local writer — the interleave itself is one window
    * per group plus a broadcast join of the (tiny) group-index dim.
    * Groups of different sizes stay correct: a group that runs out
    * simply stops occupying its residue slots. */
  def interleaveKey(docs: DataFrame, group: Column, id: Column,
      order: Column): DataFrame = {
    val base = docs.select(group.as("group"), id.as("doc_id"),
      order.as("_o"))
    // dense 0-based group index over the DISTINCT groups — G rows, so
    // the single-partition window is bounded by group cardinality, not
    // data size
    val gidx = base.select(col("group")).distinct()
      .withColumn("_gidx", row_number().over(
        Window.orderBy(col("group"))).cast("long") - 1L)
    val nGroups = gidx.count()
    val rn = row_number().over(
      Window.partitionBy(col("group")).orderBy(col("_o"))).cast("long") - 1L
    base
      .withColumn("_rn", rn)
      .join(broadcast(gidx), "group")
      .select(col("group"), col("doc_id"),
        (col("_rn") * lit(nGroups) + col("_gidx")).as("interleave_key"))
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
