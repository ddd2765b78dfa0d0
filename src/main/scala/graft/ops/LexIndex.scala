package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 postings/stats index — the LEXICAL twin of the vector
  * index family in [[AnnIndex]]. The in-memory
  * [[TextAnalysis.bm25TopK]] takes literal terms and rescans the corpus
  * per query set — fine for one-off analytics, wrong for a retrieval
  * service: at 100 TB the corpus is tokenized ONCE into a stored
  * postings table and every query is a partition-pruned probe bounded
  * by its own terms' posting lists.
  *
  * Layout (plain parquet):
  *   `<path>/postings/`  term, doc_id, tf, dl — partitioned by `tpfx`
  *                       ("x" + first 2 md5 hex chars of the term, 256
  *                       directories) so a probe prunes to the
  *                       directories its own terms name; `dl` (the
  *                       document token count) is denormalized onto the
  *                       posting row so scoring needs NO doc-side join
  *   `<path>/stats/`     n_docs, total_dl — one PARTIAL row per
  *                       appended batch; both fields sum associatively,
  *                       so `avgdl = Σtotal_dl / Σn_docs` at read time
  *                       and appends never read history (the
  *                       [[SketchStore]] merge-on-read discipline)
  *
  * A term's full posting list lives inside its own partition, so
  * per-term document frequency is computable from the pruned read alone
  * — probes never touch global state beyond the tiny stats sidecar.
  * [[appendBm25Index]] makes the lifecycle incremental: a new batch's
  * postings land in their prefix directories and its stats partial
  * appends blindly; a probe over the appended index is byte-identical
  * to one over a single whole-corpus build (df derives from the pruned
  * posting lists themselves, which are the same rows either way —
  * spec-pinned, and qd81 shares qd76's oracle verbatim). */
object LexIndex {

  /** Prefix partition key: "x" + first 2 term-md5 hex chars (the letter
    * guard keeps Hive partition-type inference string-stable, same as
    * [[DedupIndex]]'s fingerprint prefixes). */
  private def tpfx(term: Column): Column =
    concat(lit("x"), substring(md5(term), 1, 2))

  /** Build + persist the index: ONE corpus tokenization feeds both the
    * postings table and the stats sidecar. The pre-write
    * `repartition(tpfx)` clusters each prefix into one file per shuffle
    * partition (without it a wide scan writes tasks × 256 tiny files).
    *
    * `positions = true` additionally writes `<path>/positions/`
    * (term, doc_id, pos — the 0-based token index), term-prefix
    * partitioned like the postings, enabling exact-PHRASE probes
    * ([[phraseTopKIndexed]]). BM25 probes never read it; the setting
    * must be consistent across a store's builds and appends. */
  def writeBm25Index(docs: DataFrame, id: Column, text: Column,
      path: String, positions: Boolean = false): Unit =
    writeBatch(docs, id, text, path, mode = "overwrite", positions)

  /** Append a new batch: postings rows land in their term-prefix
    * directories, the stats partial appends blindly — no history read,
    * no rebuild. Identical probe results to a fresh whole-corpus build
    * because postings(A ∪ B) IS postings(A) ∪ postings(B) row-for-row
    * (doc_ids are disjoint across batches) and the stats sums are
    * associative. Position rows (when the store carries them) append
    * under the same argument. */
  def appendBm25Index(batch: DataFrame, id: Column, text: Column,
      path: String, positions: Boolean = false): Unit =
    writeBatch(batch, id, text, path, mode = "append", positions)

  private def tokenized(docs: DataFrame, id: Column,
      text: Column): DataFrame =
    docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .localCheckpoint(eager = false)

  private def postingsOf(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tpfx", tpfx(col("term")))

  private def positionsOf(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))
      .withColumn("tpfx", tpfx(col("term")))

  private def statsOf(toks: DataFrame): DataFrame =
    toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))

  private def writeBatch(docs: DataFrame, id: Column, text: Column,
      path: String, mode: String, positions: Boolean): Unit = {
    val toks = tokenized(docs, id, text)
    postingsOf(toks).repartition(col("tpfx"))
      .write.mode(mode).partitionBy("tpfx").parquet(s"$path/postings")
    if (positions)
      positionsOf(toks).repartition(col("tpfx"))
        .write.mode(mode).partitionBy("tpfx").parquet(s"$path/positions")
    statsOf(toks).write.mode(mode).parquet(s"$path/stats")
  }

  // ---- batch-keyed writes: the exactly-once streaming layout ----
  //
  // [[appendBm25Index]] is append-only rows + blind stats partials, so
  // a replayed micro-batch would DOUBLE its docs' posting rows (they'd
  // score twice) and over-count the stats sums. Keying every batch's
  // rows by a leading `batch_id` partition and writing with dynamic
  // partition overwrite makes the write idempotent — the [[SketchStore]]
  // / [[AnnIndex.putIvfBatch]] discipline for the lexical index. A
  // store is either batch-keyed (built by [[writeBm25IndexBatchKeyed]],
  // grown by [[putBm25Batch]]) or plain; the layouts don't mix under
  // one path. Probes are layout-agnostic: they name their columns and
  // `tpfx` prunes partitions at either nesting depth.

  /** Base build of a BATCH-KEYED index: everything lands under
    * batch_id = −1 so streamed batches' dynamic overwrites compose. */
  def writeBm25IndexBatchKeyed(docs: DataFrame, id: Column, text: Column,
      path: String, positions: Boolean = false): Unit = {
    val toks = tokenized(docs, id, text)
    postingsOf(toks).withColumn("batch_id", lit(-1L))
      .repartition(col("tpfx"))
      .write.mode("overwrite").partitionBy("batch_id", "tpfx")
      .parquet(s"$path/postings")
    if (positions)
      positionsOf(toks).withColumn("batch_id", lit(-1L))
        .repartition(col("tpfx"))
        .write.mode("overwrite").partitionBy("batch_id", "tpfx")
        .parquet(s"$path/positions")
    statsOf(toks).withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(s"$path/stats")
  }

  /** Idempotently (re)write one micro-batch's postings/positions/stats
    * under its own batch_id partitions: a replay rewrites byte-for-byte
    * (the tokenization is deterministic) instead of doubling posting
    * rows and stats sums, and batch 0 after a checkpoint reset
    * overwrites only partition 0, never the base build at −1. Writes
    * the positional half exactly when the store carries one. */
  def putBm25Batch(batch: DataFrame, id: Column, text: Column,
      path: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val toks = tokenized(batch, id, text)
    def put(df: DataFrame, dir: String, pcols: Seq[String]): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(pcols: _*).parquet(dir)
    put(postingsOf(toks).repartition(col("tpfx")),
      s"$path/postings", Seq("batch_id", "tpfx"))
    if (StoreFiles.exists(spark, s"$path/positions"))
      put(positionsOf(toks).repartition(col("tpfx")),
        s"$path/positions", Seq("batch_id", "tpfx"))
    put(statsOf(toks), s"$path/stats", Seq("batch_id"))
  }

  /** Fold a batch-keyed index's COMMITTED batches (batch_id < keepFrom,
    * including earlier folds at −1) into the base partition −1;
    * partitions ≥ keepFrom stay untouched so a replay of the one
    * in-flight batch still overwrites only its own partitions —
    * [[SketchStore.compactBatches]]' streaming-safe contract. Posting/
    * position rows concatenate; the stats partials SUM (associative). */
  def compactBm25Batches(spark: SparkSession, path: String,
      keepFrom: Long): Unit = {
    def sub(name: String, pcols: Seq[String],
        fold: DataFrame => DataFrame): Unit =
      if (StoreFiles.exists(spark, s"$path/$name"))
        StoreFiles.replaceDir(spark, s"$path/$name") { tmp =>
          val all = spark.read.parquet(s"$path/$name")
          fold(all.filter(col("batch_id") < keepFrom).drop("batch_id"))
            .withColumn("batch_id", lit(-1L))
            .unionByName(all.filter(col("batch_id") >= keepFrom))
            .repartition(col(pcols.last))
            .write.partitionBy(pcols: _*).parquet(tmp)
        }
    sub("postings", Seq("batch_id", "tpfx"), identity)
    sub("positions", Seq("batch_id", "tpfx"), identity)
    if (StoreFiles.exists(spark, s"$path/stats"))
      StoreFiles.replaceDir(spark, s"$path/stats") { tmp =>
        val all = spark.read.parquet(s"$path/stats")
        all.filter(col("batch_id") < keepFrom)
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("total_dl")).as("total_dl"))
          .withColumn("batch_id", lit(-1L))
          .unionByName(all.filter(col("batch_id") >= keepFrom))
          .coalesce(1)
          .write.partitionBy("batch_id").parquet(tmp)
      }
  }

  /** Merged global stats over all appended partials: `(n_docs, avgdl)`.
    * Both partial fields are exact longs, so the one division equals a
    * whole-corpus `avg(dl)` bit-for-bit — including across the NEGATIVE
    * partials [[deleteFromBm25Index]] appends (sums are associative in
    * both directions). */
  def readStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_dl")).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))

  /** Tombstone-delete documents from the index. Two sidecar writes, no
    * posting rewrite: the doc ids land in `<path>/tombstones/` (probes
    * anti-join it) and the global stats SUBTRACT via a negative partial
    * — `(−n_deleted, −Σdl)` appended to the stats table, exact because
    * both fields are associative long sums. Each deleted doc's `dl`
    * comes from the stored postings themselves (every posting row of a
    * doc carries its denormalized dl), so no original text is needed;
    * that derivation is the lifecycle's one unpruned postings read, and
    * it reads two pruned COLUMNS (doc_id, dl), never the term lists.
    * Ids already tombstoned (or never indexed) are ignored, so the call
    * is idempotent — a re-delete can't double-subtract. Probe results
    * after a delete equal a from-scratch build without the docs
    * (StoreSpec pins this); the dead rows leave disk at [[compact]]. */
  def deleteFromBm25Index(spark: SparkSession, path: String,
      ids: DataFrame, id: Column): Unit = {
    val del0 = ids.select(id.as("doc_id")).distinct()
    val del = (if (StoreFiles.exists(spark, s"$path/tombstones"))
        del0.join(spark.read.parquet(s"$path/tombstones"),
          Seq("doc_id"), "left_anti")
      else del0).localCheckpoint()
    val perDoc = spark.read.parquet(s"$path/postings")
      .select(col("doc_id"), col("dl"))
      .join(del, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .localCheckpoint() // one postings read serves both writes below
    // tombstones FIRST: a crash between the two writes then leaves
    // probes already correct (docs excluded) with stats merely stale —
    // and the retry is a no-op (anti-join above), so it can't
    // double-subtract. The reverse order would subtract on every retry.
    // The tombstone row-set is the semi-joined set, not the request, so
    // it covers exactly the docs whose stats get subtracted.
    perDoc.select(col("doc_id"))
      .write.mode("append").parquet(s"$path/tombstones")
    val neg = perDoc
      .agg((count(lit(1)) * lit(-1L)).as("n_docs"),
        coalesce(sum(col("dl")) * lit(-1L), lit(0L)).as("total_dl"))
    // batch-keyed stats keep their layout: negative partials append
    // under the reserved batch_id = -2 partition (never a batch id, so
    // replays and folds can't collide with it)
    if (spark.read.parquet(s"$path/stats").columns.contains("batch_id"))
      neg.withColumn("batch_id", lit(-2L))
        .write.mode("append").partitionBy("batch_id")
        .parquet(s"$path/stats")
    else neg.write.mode("append").parquet(s"$path/stats")
  }

  /** Compact the index: physically drop tombstoned postings, collapse
    * the per-batch small files each append left in every term-prefix
    * directory (one file per prefix after the repartition), fold the
    * stats partials — positives and negatives — into one canonical row,
    * and clear the tombstone sidecar. Probe results are unchanged
    * (StoreSpec pre/post equality); probe COST drops because the
    * pruned read opens one file per prefix and skips the anti-join.
    * Contract: writers quiesced during the rename swaps
    * ([[StoreFiles.replaceDir]]). */
  def compactBm25Index(spark: SparkSession, path: String): Unit = {
    val hasTombs = StoreFiles.exists(spark, s"$path/tombstones")
    def prefixSub(name: String): Unit =
      if (StoreFiles.exists(spark, s"$path/$name"))
        StoreFiles.replaceDir(spark, s"$path/$name") { tmp =>
          val live0 = spark.read.parquet(s"$path/$name")
          val live = if (!hasTombs) live0
            else live0.join(spark.read.parquet(s"$path/tombstones"),
              Seq("doc_id"), "left_anti")
          // batch-keyed stores keep their layout (everything folds to
          // partition -1) so later per-batch overwrites still compose
          if (live.columns.contains("batch_id"))
            live.drop("batch_id").withColumn("batch_id", lit(-1L))
              .repartition(col("tpfx"))
              .write.partitionBy("batch_id", "tpfx").parquet(tmp)
          else live.repartition(col("tpfx"))
            .write.partitionBy("tpfx").parquet(tmp)
        }
    prefixSub("postings")
    prefixSub("positions")
    StoreFiles.replaceDir(spark, s"$path/stats") { tmp =>
      val all = spark.read.parquet(s"$path/stats")
      val folded = all
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("total_dl")).as("total_dl"))
      if (all.columns.contains("batch_id"))
        folded.withColumn("batch_id", lit(-1L)).coalesce(1)
          .write.partitionBy("batch_id").parquet(tmp)
      else folded.coalesce(1).write.parquet(tmp)
    }
    StoreFiles.delete(spark, s"$path/tombstones")
  }

  /** BM25 (Okapi, `ln(1 + (N - df + 0.5)/(df + 0.5))` idf) top-k against
    * the PERSISTED index, with query terms AS A TABLE — the
    * parameterized service shape ([[TextAnalysis.bm25TopK]]'s literal
    * list becomes a probe join).
    *
    * Scale shape: the terms' distinct prefixes (≤ |terms|, a
    * driver-sized set by construction) become a static partition filter
    * on the postings read, so a probe touches only the directories its
    * own terms name; df comes from the pruned lists themselves, the
    * one-row stats sidecar broadcasts, and the top-k is a TakeOrdered
    * over match-bounded rows. Nothing corpus-sized is read or shuffled.
    *
    * Scoring: each (doc, term) contribution floors to 1e-4 units (long)
    * BEFORE the per-doc sum, so the score is exact integer math —
    * independent of aggregation order and engine (the float-sum
    * discipline of the oracle family). Only documents containing at
    * least one query term are scored: an index probe never enumerates
    * the rest of the corpus — that is the point of the index. Output:
    * (doc_id, score_e4), score desc / id asc, k rows. */
  def bm25TopKIndexed(spark: SparkSession, path: String, terms: DataFrame,
      term: Column, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tq = terms.select(term.as("term")).distinct()
      .withColumn("tpfx", tpfx(col("term")))
      .localCheckpoint(eager = false)
    val pfxs = tq.select(col("tpfx")).distinct().collect()
      .map(_.getString(0)).toSeq
    val post0 = spark.read.parquet(s"$path/postings")
      .filter(col("tpfx").isin(pfxs: _*))
      .join(broadcast(tq.select(col("term"))), Seq("term"))
    // tombstoned docs drop BEFORE the df window, so both df and the
    // scored set equal a from-scratch build without the deleted docs
    val post = if (!StoreFiles.exists(spark, s"$path/tombstones")) post0
      else post0.join(spark.read.parquet(s"$path/tombstones"),
        Seq("doc_id"), "left_anti")
    // df = the term's posting-list length, derived as a window over the
    // SAME pruned rows the scoring consumes — one parquet read feeds
    // both (the earlier separate groupBy + join-back executed the scan
    // and broadcast join twice). The window shuffles by term, but probe
    // rows are bounded by the query terms' own posting lists, never the
    // corpus.
    val stats = readStats(spark, path)
    val df_ = count(lit(1)).over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))).cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
    val contrib = idf * col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    post.withColumn("df", df_)
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(contrib * lit(10000.0)).cast("long").as("c_e4"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c_e4")).as("score_e4"))
      .orderBy(col("score_e4").desc, col("doc_id"))
      .limit(k)
  }

  /** MULTI-query BM25 top-k against the persisted index: queries
    * arrive as a (query_id, term) TABLE and every query's top-k is
    * answered in ONE probe — the batch-serving twin of
    * [[bm25TopKIndexed]] (one query's terms) and the lexical twin of
    * [[AnnIndex.ivfKnnJoinIndexed]]'s multi-query vector probe.
    *
    * Scale shape: the UNION of all queries' term prefixes (driver-
    * sized — a query batch is bounded by contract, like the vector
    * side's collected qRows) becomes one static partition filter, so
    * the postings read is pruned once for the whole batch and each
    * stored row is read ONCE no matter how many queries share a term.
    * df derives from the pruned lists over DISTINCT terms (computed
    * BEFORE the per-query fan-out, so a term shared by many queries
    * is not over-counted), the query fan-out is a broadcast join of
    * the tiny (query_id, term) frame, and the per-query top-k is a
    * bounded `topk_agg` — no corpus-sized shuffle, no Window over the
    * fanned-out rows.
    *
    * Scoring is [[bm25TopKIndexed]]'s exact-integer math verbatim
    * (per-(doc, term) contributions floored to 1e-4 units before the
    * per-(query, doc) sum). Output: (query_id, doc_id, score_e4,
    * rank), rank 1-based per query (score desc, doc_id asc). */
  def bm25KnnJoinIndexed(spark: SparkSession, path: String,
      queries: DataFrame, qid: Column, term: Column, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queries.select(qid.cast("long").as("query_id"),
        term.as("term")).distinct()
      .localCheckpoint() // read once, serve prefixes + fan-out
    val tq = qt.select(col("term")).distinct()
      .withColumn("tpfx", tpfx(col("term")))
      .localCheckpoint(eager = false)
    val pfxs = tq.select(col("tpfx")).distinct().collect()
      .map(_.getString(0)).toSeq
    val post0 = spark.read.parquet(s"$path/postings")
      .filter(col("tpfx").isin(pfxs: _*))
      .join(broadcast(tq.select(col("term"))), Seq("term"))
    val post = if (!StoreFiles.exists(spark, s"$path/tombstones")) post0
      else post0.join(spark.read.parquet(s"$path/tombstones"),
        Seq("doc_id"), "left_anti")
    val stats = readStats(spark, path)
    // df over the DISTINCT pruned posting rows — the window runs
    // before the query fan-out, so its input is each term's posting
    // list exactly once (the bm25TopKIndexed derivation, unchanged)
    val df_ = count(lit(1)).over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))).cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
    val contrib = idf * col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    post.withColumn("df", df_)
      .crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"),
        floor(contrib * lit(10000.0)).cast("long").as("c_e4"))
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c_e4")).as("score_e4"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate
        .topk(col("score_e4").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "p")))
      .select(col("query_id"), col("p.id").as("doc_id"),
        col("p.score").cast("long").as("score_e4"),
        (col("r") + 1).cast("long").as("rank"))
  }

  /** Exact-PHRASE search against the positional index: documents
    * containing the token sequence `phrase` verbatim, ranked by
    * occurrence count (ties to the lower doc_id). The classic
    * positional-postings algorithm as one aggregation: each term's
    * stored (doc_id, pos) rows shift to the phrase start they would
    * witness (`start = pos − offset`), and a start where ALL
    * `phrase.length` distinct offsets appear is a match — repeated
    * phrase words work because the count is per DISTINCT offset.
    *
    * Scale shape: the phrase's term prefixes prune the positions read
    * to the directories its own words name (the [[bm25TopKIndexed]]
    * discipline), and the intersection runs RAREST-term-first: the
    * phrase term with the smallest stored df (read from the postings
    * half — a pruned, ≤ |phrase|-row aggregate) anchors the candidate
    * (doc_id, start) set, and every other term's shifted positions
    * semi-join that broadcast set BEFORE the offset-counting
    * aggregation. A full match must witness the rare term at its
    * offset, so the semi-join loses nothing — but a phrase containing
    * a near-ubiquitous token no longer shuffles that token's
    * corpus-scale position list into the group-by: only rows landing
    * on a rare-anchored start survive the (broadcast) semi-join. The
    * candidate set is bounded by the MINIMUM df over the phrase's
    * terms — the broadcast contract; a phrase whose rarest term is
    * still corpus-scale has no selective plan in any engine, and the
    * absent-term case (df 0) short-circuits to an empty result. The
    * final rank is a TakeOrdered over match-bearing docs only.
    * Tombstoned docs drop before grouping, so a probe equals one over
    * an index built without them. */
  def phraseTopKIndexed(spark: SparkSession, path: String,
      phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    import spark.implicits._
    val ph = phrase.zipWithIndex.map { case (w, i) => (w, i.toLong) }
      .toDF("term", "off")
      .withColumn("tpfx", tpfx(col("term")))
      .localCheckpoint(eager = false)
    val pfxs = ph.select(col("tpfx")).distinct().collect()
      .map(_.getString(0)).toIndexedSeq
    // rarest term from the postings half: per-term posting-list length
    // over the SAME pruned prefixes (a ≤ |phrase|-row collect). Terms
    // absent from the corpus get df 0 — and win, correctly: the
    // anchor set is then empty and so is the result.
    val dfByTerm = spark.read.parquet(s"$path/postings")
      .filter(col("tpfx").isin(pfxs: _*))
      .join(broadcast(ph.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val (rareTerm, rareOff) = phrase.zipWithIndex
      .map { case (w, i) => (w, i.toLong) }
      .minBy { case (w, i) => (dfByTerm.getOrElse(w, 0L), i) }
    val pos0 = spark.read.parquet(s"$path/positions")
      .filter(col("tpfx").isin(pfxs: _*))
      .join(broadcast(ph.select(col("term"), col("off"))), Seq("term"))
    val pos = if (!StoreFiles.exists(spark, s"$path/tombstones")) pos0
      else pos0.join(spark.read.parquet(s"$path/tombstones"),
        Seq("doc_id"), "left_anti")
    val shifted = pos.select(col("doc_id"),
      (col("pos") - col("off")).as("start"), col("off"))
    // the rare term IS the off === rareOff row set: ph maps each
    // offset to exactly one (term, off) pair, so filtering the shifted
    // frame by the rare offset selects exactly the rare term's
    // occurrences (rareTerm documents WHICH term that is)
    val anchors = shifted.filter(col("off") === lit(rareOff))
      .select(col("doc_id"), col("start")).distinct()
    shifted
      .join(broadcast(anchors), Seq("doc_id", "start"), "left_semi")
      .groupBy(col("doc_id"), col("start"))
      .agg(countDistinct(col("off")).as("n_off"))
      .filter(col("n_off") === phrase.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col("doc_id"))
      .limit(k)
  }
}
