package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * token n-gram with an evaluation/benchmark set — the standard guard
  * against test-set leakage in LLM training corpora (the 13-gram overlap
  * rule popularized by GPT-3's appendix; n is a parameter here because
  * fixture documents are short).
  *
  * Scale design: the eval side of the join is the BENCHMARK — thousands
  * of documents, not billions — so its distinct gram set is broadcast and
  * the 100 TB training side is ONE narrow scan + broadcast-hash semi-join;
  * the only aggregation keys on doc_id (map-side combined). No shuffle of
  * the corpus at all unless the benchmark outgrows the broadcast
  * threshold, in which case the same plan degrades gracefully to a
  * sort-merge join on the gram string.
  */
object Decontaminate {

  /** n-gram build as a zip_with CHAIN: step k pairs each running gram
    * with the token k-1 positions ahead. Crucially no lambda body ever
    * references the token array itself — higher-order functions are
    * interpreted (no codegen), so a captured subexpression like
    * `tokens(text)` is re-evaluated once per array ELEMENT; the earlier
    * `transform(sequence(...), i => concat_ws(slice(toks, ...)))` form
    * re-ran the tokenizing regex split ~L times per document (~1 ms/doc
    * — the hot cost of every n-gram query). Here operands are evaluated
    * once per row, lambdas only touch elements, and concat's null
    * propagation marks the incomplete tail grams, compacted at the end. */
  private def ngramChain(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val grams = (2 to n).foldLeft(toks) { (acc, k) =>
      zip_with(acc,
        slice(toks, lit(k), greatest(size(toks) - k + 1, lit(0))),
        (x, y) => concat(x, lit(" "), y))
    }
    array_compact(grams)
  }

  /** Distinct whitespace-token n-grams per document, as strings (joined
    * with single spaces) so an external engine can reproduce them; docs
    * with fewer than `n` tokens contribute nothing. Stays inside the row
    * until the final explode. */
  def ngrams(text: Column, n: Int): Column =
    array_distinct(ngramChain(text, n))

  /** ALL whitespace-token n-grams per document (every position, not
    * deduplicated) — the frequency-counting twin of [[ngrams]]. */
  def ngramsAll(text: Column, n: Int): Column = ngramChain(text, n)

  /** Per-training-document contamination report: how many distinct
    * n-grams of the doc also appear anywhere in `eval`. Only contaminated
    * docs (n_shared > 0) are returned — at scale the complement (the
    * clean corpus) is the same join with `left_anti`. */
  def ngramOverlap(train: DataFrame, eval_ : DataFrame, id: Column,
      text: Column, n: Int): DataFrame = {
    val evalGrams = eval_.select(explode(ngrams(text, n)).as("gram"))
      .distinct()
    train.select(id.as("doc_id"), explode(ngrams(text, n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[ngramOverlap]] for when the eval gram set outgrows an EXACT
    * broadcast: a Bloom filter over the eval grams (built with a
    * distributed tree-aggregate, a few MB at fpp=1%) pre-filters the
    * corpus gram stream in a NARROW codegen'd map, so only the matching
    * ~fpp fraction ever reaches the exact verify join — the corpus is
    * never shuffled at volume, and the verify join (non-broadcast: the
    * premise is that eval grams don't fit a broadcast) moves only
    * survivors. Bloom filters have no false negatives and the verify
    * join drops false positives, so the result is IDENTICAL to
    * [[ngramOverlap]] — same oracle, different scale envelope. */
  def ngramOverlapBloom(train: DataFrame, eval_ : DataFrame, id: Column,
      text: Column, n: Int, fpp: Double = 0.01): DataFrame = {
    val evalGrams = eval_.select(explode(ngrams(text, n)).as("gram"))
      .distinct()
      .localCheckpoint() // gram build runs once: sizing count + filter + join
    val bloom = graft.functions.BloomFilters.buildString(
      evalGrams, "gram", evalGrams.count(), fpp)
    train.select(id.as("doc_id"), explode(ngrams(text, n)).as("gram"))
      .filter(graft.functions.BloomFilters.bloomMightContain(
        col("gram"), bloom))
      .join(evalGrams.hint("shuffle_hash"), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
