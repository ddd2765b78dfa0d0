package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — the tokenizer-training step of a
  * data pipeline (qd22's `charPairs` is round 0 of this loop; see
  * Sennrich et al., "Neural Machine Translation of Rare Words with
  * Subword Units", for the algorithm).
  *
  * Each round: (1) count adjacent symbol pairs across the corpus
  * vocabulary, weighted by word frequency — one map-side-combined
  * aggregation over the symbol table; (2) pick the max-count pair
  * (count desc, pair lexicographic — deterministic); (3) apply the
  * greedy LEFT-TO-RIGHT NON-OVERLAPPING merge everywhere. The classic
  * sequential scan in (3) becomes a window computation via RUN PARITY:
  * within a maximal run of consecutive matching positions, exactly the
  * even offsets merge (a merge consumes its right neighbor, so the next
  * possible merge starts two symbols later; runs longer than one only
  * occur for self-pairs x==y). That rule is pure `lag`/`last` window
  * algebra over (word, pos) — reproducible in any SQL engine, which is
  * what makes the whole learned state oracle-checkable.
  *
  * Scale shape: the state is a (word, pos, sym) table of the DISTINCT
  * vocabulary (not the corpus — frequencies are carried, so the heavy
  * corpus pass happens once in [[initialSymbols]]); each round is one
  * aggregation + one windowed rewrite partitioned by word, both keyed
  * shuffles with no global sort, checkpointed so round r+1 doesn't
  * replay round r's windows. The top-pair pick collects ONE row per
  * round (the same bounded driver round-trip as k-means centroid
  * updates). ASCII/BMP input assumed (fixture corpora are ASCII);
  * a production tokenizer would pre-normalize unicode.
  */
object Bpe {

  /** (word, freq, pos, sym) with single-character symbols: the round-0
    * state. One corpus scan + one vocabulary aggregation. */
  def initialSymbols(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      // positional substring, not split(word, "") — the latter appends a
      // trailing empty token under Java's limit=-1 semantics
      .select(col("word"), col("freq"), posexplode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .as(Seq("pos", "sym")))

  /** Adjacent-pair frequencies of a symbol table, weighted by word
    * frequency (overlapping adjacencies all count — the classic
    * `get_stats`). */
  def pairCounts(syms: DataFrame): DataFrame =
    syms
      .withColumn("nxt", lead(col("sym"), 1).over(
        Window.partitionBy(col("word")).orderBy(col("pos"))))
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("x"), col("nxt").as("y"))
      .agg(sum(col("freq")).as("n"))

  /** Apply ONE learned merge (x, y) → xy with the greedy non-overlap
    * rule, returning the rewritten dense-positioned symbol table. */
  def applyMerge(syms: DataFrame, x: String, y: String): DataFrame = {
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    syms
      .withColumn("nxt", lead(col("sym"), 1).over(w))
      .withColumn("m", col("sym") === lit(x) && col("nxt") === lit(y))
      // first position of each maximal run of consecutive matches …
      .withColumn("rs", when(col("m") &&
        !coalesce(lag(col("m"), 1).over(w), lit(false)), col("pos")))
      .withColumn("run", last(col("rs"), ignoreNulls = true).over(cum))
      // … and within a run, even offsets merge (each consumes its right
      // neighbor, so odd offsets are already eaten)
      .withColumn("mg", col("m") && (col("pos") - col("run")) % 2 === 0)
      .withColumn("eaten", coalesce(lag(col("mg"), 1).over(w), lit(false)))
      .filter(!col("eaten"))
      .select(col("word"), col("freq"),
        (row_number().over(w) - 1).as("pos2"),
        when(col("mg"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym2"))
      .withColumnRenamed("pos2", "pos").withColumnRenamed("sym2", "sym")
  }

  /** Run `rounds` merge rounds. Returns the learned merge list
    * (round, x, y, pair count at pick time) and the final symbol
    * table. */
  def learn(docs: DataFrame, text: Column,
      rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1, s"rounds must be positive: $rounds")
    var syms = initialSymbols(docs, text).localCheckpoint(eager = false)
    val merges = (1 to rounds).map { r =>
      val top = pairCounts(syms)
        .orderBy(col("n").desc, col("x"), col("y")).limit(1).head()
      val (x, y, n) = (top.getString(0), top.getString(1), top.getLong(2))
      syms = applyMerge(syms, x, y).localCheckpoint(eager = false)
      (r, x, y, n)
    }
    (merges, syms)
  }
}
