package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState,
  GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface.
  *
  * The reference's only "streaming" construct is the Watcher daemon — a
  * polling work queue that picks up dropped uploads (spawn.py:40-430).
  * SURVEY §2.10's translation decision: a file-source stream with
  * `Trigger.AvailableNow` reproduces those semantics exactly (append-only
  * arrival, exactly-once per file, drains whatever is present and stops).
  * The windowed rollup is the streaming twin of
  * [[graft.ops.Events.hourlyRollup]] for always-on event feeds.
  */
object StreamingIngest {

  /** Watch a drop directory of parquet files (the Watcher's inbox). */
  def watchParquetDir(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window rollup with a watermark: per (window, event_type)
    * counts/sums. State is bounded by the watermark — safe for an
    * unbounded 100 TB/day feed. `ts` must be a TimestampType column. */
  def windowedRollup(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))

  /** Streaming per-window DISTINCT estimate — watermarked windowed HLL
    * over `value` via the native one-buffer register aggregate
    * ([[graft.functions.HllRegistersAgg]]). Exact streaming distinct
    * needs per-key state proportional to the number of distinct values;
    * the HLL buffer is a fixed 256 bytes per (window, type) group in
    * the state store no matter how many values arrive, which is the
    * only shape that survives an unbounded high-cardinality feed
    * (distinct users/urls per hour at production volume). Estimates are
    * byte-identical to the batch [[graft.ops.Sketches.hllDistinct]]
    * family — spec-pinned against the batch twin. */
  def windowedDistinct(events: DataFrame,
      value: org.apache.spark.sql.Column, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(graft.functions.HllRegistersAgg.hllRegisters(value).as("regs"))
      .select(col("window"), col("event_type"),
        graft.ops.Sketches.hllEstimateFromRegisters(col("regs"))
          .as("est_distinct"))

  /** Streaming per-window QUANTILE estimates — watermarked windowed
    * log-bucket histogram over `measure` (the streaming face of
    * [[graft.ops.Sketches.histSketch]]/`histQuantiles`, completing the
    * streaming sketch triad: distinct, heavy hitters, distribution).
    * State is 64 bucket counters — 512 bytes per (window, type) group
    * no matter how many rows arrive, the only shape that survives an
    * unbounded feed (exact streaming quantiles need all values).
    * Estimates are doubling-bounded ceilings (v ≤ est < 2v) computed
    * by the same pure-bigint rank test as the batch path, so the
    * streamed profile EQUALS the batch twin's — spec-pinned. The
    * quantile extraction is a stateless 64-element fold in the
    * finishing projection ([[graft.ops.Sketches.histQuantileFromCounts]]),
    * legal downstream of the one streaming aggregation. */
  def windowedQuantiles(events: DataFrame,
      measure: org.apache.spark.sql.Column,
      quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      window_ : String = "1 hour", watermark: String = "2 hours")
      : DataFrame = {
    // project the bucket ONCE per row; the 64 conditional sums then
    // compare a ready int instead of re-evaluating the md5-free but
    // still multi-op bucket expression per counter
    val bucketAggs = (0 until 64).map(b =>
      sum(when(col("_b") === b, 1L).otherwise(0L)).as(s"_c$b"))
    val counts = array((0 until 64).map(b => col(s"_c$b")): _*)
    events
      .withWatermark("ts", watermark)
      .withColumn("_b", graft.ops.Sketches.histBucket(measure))
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(bucketAggs.head, bucketAggs.tail: _*)
      .withColumn("_counts", counts)
      .select(Seq(col("window"), col("event_type"),
        aggregate(col("_counts"), lit(0L), (a, c) => a + c).as("n_rows")) ++
        quantiles.map(q => graft.ops.Sketches
          .histQuantileFromCounts(col("_counts"), q)
          .as(graft.ops.Sketches.quantileLabel(q))): _*)
  }

  /** Streaming per-window heavy hitters: watermarked windowed
    * Misra-Gries ([[graft.functions.HeavyHittersAggregate]]) over
    * `item` — m counters of fixed state per window in the state store,
    * independent of item cardinality (an exact per-item count needs a
    * counter per distinct item). MG estimates are arrival-order-
    * dependent LOWER bounds, but the membership guarantee is order-free:
    * every item with true window frequency > n/(m+1) is in the summary
    * — that guarantee (not estimate equality) is what the spec pins
    * against a batch recount, the same contract the batch qd40/qd41
    * exact-recount composition builds on. */
  def windowedHeavyHitters(events: DataFrame,
      item: org.apache.spark.sql.Column, m: Int,
      window_ : String = "1 hour", watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(graft.functions.HeavyHittersAggregate.heavyHitters(item, m)
          .as("hh"),
        count(lit(1)).as("n"))

  /** Streaming exact-dedup: drop documents whose content fingerprint was
    * already seen, across micro-batches. The watermark bounds the
    * dedup state — a duplicate arriving later than `retention` after the
    * original can slip through, which is the standard state/recall trade
    * for an unbounded feed (state never grows past one fingerprint per
    * distinct doc inside the retention horizon). `ts` must be a
    * TimestampType event-time column; `text` is fingerprinted with the
    * same normalization as the batch [[graft.ops.Dedup.exact]], so a
    * backfill dedup and the live stream agree on what is a duplicate. */
  def dedupStream(docs: DataFrame, retention: String = "24 hours"): DataFrame =
    docs
      .withColumn("fp", graft.ops.TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", retention)
      .dropDuplicatesWithinWatermark("fp")

  /** Incremental dedup ingest against the PERSISTED fingerprint index
    * ([[graft.ops.DedupIndex]]): each micro-batch is probed with a
    * partition-pruned anti-join, only genuinely-new documents land in
    * the corpus sink, and their fingerprints are appended to the index
    * so later batches (and later runs) see them. This is the unbounded
    * twin of [[dedupStream]] with NO retention horizon: state lives in
    * the index parquet, not the state store, so it never expires and
    * never occupies executor memory.
    *
    * Failure semantics: `foreachBatch` may replay a batch after a
    * crash, but the index makes the replay IDEMPOTENT at the content
    * level — re-probing a batch whose fingerprints were already
    * appended yields zero new docs, so the corpus sink sees no
    * duplicates (the classic dedup-sink answer to at-least-once
    * delivery). */
  /** The store sinks' compaction trigger: fold committed history when
    * the blind every-N cadence trips, OR when `maxBatchParts` > 0 and
    * the store's PHYSICAL count of UNFOLDED batch partitions exceeds
    * it ([[graft.ops.StoreFiles.needsBatchCompaction]] — a
    * depth-bounded directory listing, O(sub-dirs + batch-dirs) and
    * short-circuited, never a recursive walk of the data files, so
    * the per-micro-batch cost stays flat on an object store holding
    * millions of files; the −1 base fold and −2 reserved partitions
    * never count, so the post-fold steady state cannot re-trigger).
    * The introspection form is the mechanized policy: it reflects
    * what actually accumulated (robust to checkpoint resets and
    * manual folds, which a modulo cadence drifts from). Both compose
    * with exactly-once: only COMMITTED batches (before the one just
    * written) ever fold. */
  private def shouldCompact(spark: SparkSession, path: String,
      batchId: Long, compactEvery: Int, maxBatchParts: Int): Boolean =
    (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) ||
      (maxBatchParts > 0 &&
        graft.ops.StoreFiles.needsBatchCompaction(spark, path,
          maxBatchParts))

  /** Streaming corpus PROFILING into the persisted [[graft.ops
    * .SketchStore]]: each micro-batch is sketched once — per-group HLL
    * registers (distinct tokens), CMS counters (token frequency) and
    * histogram buckets (token-count distribution) — and the partials
    * land as that batch's OWN `batch_id` partition via dynamic
    * partition overwrite, so the sink is EXACTLY-once under
    * foreachBatch's at-least-once contract: a replayed batch rewrites
    * its own partition byte-for-byte instead of re-appending (linear
    * counters never over-count), and batch 0 after a checkpoint reset
    * overwrites only partition 0, never a pre-existing store. Reads
    * merge all partitions associatively, so the store's profile always
    * covers everything that has streamed through while the stream
    * itself is never retained — profile reads cost `groups ×
    * sketch-size × n_batches`, never the corpus.
    *
    * `compactEvery` > 0 folds history into one canonical partial
    * (partition −1) every that-many batches, bounding n_batches:
    * [[graft.ops.SketchStore.compactBatches]] folds only COMMITTED
    * batches (everything before the one just written), which replays
    * can no longer touch, so compaction and exactly-once compose.
    *
    * `group`/`value`/`measure` are column-expression parameters so the
    * same sink profiles any feed: by source, language, day, shard. */
  def profileIngestTo(docs: DataFrame, group: Column, value: Column,
      measure: Column, storePath: String, cmsWidth: Int,
      checkpoint: String, compactEvery: Int = 0, maxBatchParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.localCheckpoint() // sketch thrice, scan once
        graft.ops.SketchStore.putHllBatch(b, group, value, storePath,
          batchId)
        graft.ops.SketchStore.putCmsBatch(b, value, storePath, batchId,
          cmsWidth)
        graft.ops.SketchStore.putHistBatch(b, group, measure, storePath,
          batchId)
        if (shouldCompact(b.sparkSession, storePath, batchId,
            compactEvery, maxBatchParts))
          graft.ops.SketchStore.compactBatches(b.sparkSession, storePath,
            keepFrom = batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming VECTOR ingest into a persisted BATCH-KEYED IVF index
    * ([[graft.ops.AnnIndex.writeIvfIndex]] with `batchKeyed = true`):
    * each micro-batch's embeddings are assigned with the STORED
    * centroids (a frozen model — no retraining, no corpus re-read;
    * retrain via a fresh build when drift warrants) and land under
    * their own (batch_id, cell) partitions via dynamic partition
    * overwrite — EXACTLY-once under foreachBatch's at-least-once
    * contract: a replayed batch rewrites its own partitions
    * byte-for-byte instead of appending duplicate vector rows (which
    * would surface twice in every probe ranking), and batch 0 after a
    * checkpoint reset overwrites only partition 0, never the base
    * build at −1. Every probe path reads base + batches transparently
    * and keeps its `cell` partition pruning.
    *
    * `compactEvery` > 0 folds COMMITTED batches (everything before the
    * one just written — the only replayable partition is untouched)
    * into the base partition every that-many batches
    * ([[graft.ops.AnnIndex.compactIvfBatches]]), bounding the
    * small-file count the per-trigger cadence would otherwise grow. */
  def vectorIngestTo(vecs: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 0, maxBatchParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.AnnIndex.putIvfBatch(batch, col("vec_id"),
          col("embedding"), indexPath, batchId)
        if (shouldCompact(batch.sparkSession, indexPath, batchId,
            compactEvery, maxBatchParts))
          graft.ops.AnnIndex.compactIvfBatches(batch.sparkSession,
            indexPath, keepFrom = batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming vector ingest into a persisted BATCH-KEYED LSH index
    * ([[graft.ops.AnnIndex.writeLshIndex]] with `batchKeyed = true`):
    * the stored meta sidecar re-derives the frozen hyperplanes per
    * batch and each batch's rows land under their own
    * (batch_id, bucket) partitions via dynamic partition overwrite —
    * EXACTLY-once under foreachBatch's at-least-once contract (the
    * [[vectorIngestTo]] argument, bucket for cell). Probes keep their
    * `bucket` partition pruning at the deeper nesting. */
  def lshIngestTo(vecs: DataFrame, indexPath: String, checkpoint: String,
      compactEvery: Int = 0, maxBatchParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.AnnIndex.putLshBatch(batch, col("vec_id"),
          col("embedding"), indexPath, batchId)
        if (shouldCompact(batch.sparkSession, indexPath, batchId,
            compactEvery, maxBatchParts))
          graft.ops.AnnIndex.compactLshBatches(batch.sparkSession,
            indexPath, keepFrom = batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming vector ingest into a persisted BATCH-KEYED IVF-PQ index
    * ([[graft.ops.AnnIndex.writeIvfPqIndex]] with `batchKeyed = true`):
    * the frozen stored model (centroids + residual codebook) encodes
    * each batch deterministically and BOTH layout halves — codes under
    * (batch_id, cell), full-precision rerank vectors under (batch_id) —
    * land via dynamic partition overwrite, EXACTLY-once under
    * foreachBatch's at-least-once contract: a replayed batch rewrites
    * its own partitions instead of appending duplicate code/vector
    * rows into every ADC ranking. ADC probes keep their `cell`
    * partition pruning; the stage-2 literal-IN rerank keeps its
    * row-group pruning (vectors sort by vec_id within files). */
  def ivfPqIngestTo(vecs: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 0, maxBatchParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.AnnIndex.putIvfPqBatch(batch, col("vec_id"),
          col("embedding"), indexPath, batchId)
        if (shouldCompact(batch.sparkSession, indexPath, batchId,
            compactEvery, maxBatchParts))
          graft.ops.AnnIndex.compactIvfPqBatches(batch.sparkSession,
            indexPath, keepFrom = batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming vector ingest into a persisted BATCH-KEYED plain-PQ
    * index ([[graft.ops.AnnIndex.writePqIndex]] with
    * `batchKeyed = true`): the frozen stored codebook encodes each
    * batch deterministically and the rows land under their own
    * `batch_id` partitions via dynamic partition overwrite —
    * EXACTLY-once under foreachBatch's at-least-once contract (the
    * [[ivfPqIngestTo]] argument, minus the cell partitioning: plain
    * PQ is the compressed full scan). On a `keepVectors` store the q4
    * vectors and drift-state sidecar ingest the same way, so the
    * store keeps its monitor + retrain lifecycle under streaming
    * arrivals. */
  def pqIngestTo(vecs: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 0, maxBatchParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.AnnIndex.putPqBatch(batch, col("vec_id"),
          col("embedding"), indexPath, batchId)
        if (shouldCompact(batch.sparkSession, indexPath, batchId,
            compactEvery, maxBatchParts))
          graft.ops.AnnIndex.compactPqBatches(batch.sparkSession,
            indexPath, keepFrom = batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming LEXICAL ingest into a persisted BATCH-KEYED BM25 index
    * ([[graft.ops.LexIndex.writeBm25IndexBatchKeyed]]): each
    * micro-batch is tokenized once and its postings (+ positions, when
    * the store carries them) and stats partial land under their own
    * batch_id partitions via dynamic partition overwrite — EXACTLY-once
    * under foreachBatch's at-least-once contract, where a blind
    * [[graft.ops.LexIndex.appendBm25Index]] replay would DOUBLE the
    * batch's posting rows (its docs would score twice) and over-count
    * the stats sums. BM25 and phrase probes read base + batches
    * transparently and keep their term-prefix pruning. `compactEvery`
    * folds committed batches into the base partition every that-many
    * batches ([[graft.ops.LexIndex.compactBm25Batches]]). */
  def lexIngestTo(docs: DataFrame, indexPath: String, checkpoint: String,
      compactEvery: Int = 0, maxBatchParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.LexIndex.putBm25Batch(batch, col("doc_id"),
          col("text"), indexPath, batchId)
        if (shouldCompact(batch.sparkSession, indexPath, batchId,
            compactEvery, maxBatchParts))
          graft.ops.LexIndex.compactBm25Batches(batch.sparkSession,
            indexPath, keepFrom = batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming fingerprint ingest into a persisted BATCH-KEYED
    * Hamming fingerprint store
    * ([[graft.ops.FingerprintIndex.writeHammingIndex]] with
    * `batchKeyed = true`): the store's meta-pinned radius bands each
    * batch, and each batch's rows land under their own
    * (batch_id, bpfx) partitions via dynamic partition overwrite —
    * EXACTLY-once under foreachBatch's at-least-once contract, the
    * [[vectorIngestTo]] argument with bpfx for cell. The stream's
    * schema is (doc_id, sh): fingerprints are computed upstream (the
    * decode → window-fold → dhash64 stages run inside the streaming
    * select, never on the driver). */
  def fingerprintIngestTo(sigs: DataFrame, indexPath: String,
      checkpoint: String, compactEvery: Int = 0, maxBatchParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    sigs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.FingerprintIndex.putHammingBatch(batch,
          col("doc_id"), col("sh"), indexPath, batchId)
        if (shouldCompact(batch.sparkSession, indexPath, batchId,
            compactEvery, maxBatchParts))
          graft.ops.FingerprintIndex.compactHammingBatches(
            batch.sparkSession, indexPath, keepFrom = batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  def dedupIngestTo(docs: DataFrame, indexPath: String, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = graft.ops.DedupIndex.newOnly(spark, batch,
          col("doc_id"), col("text"), indexPath)
          .select(col("doc_id"))
          .join(batch, Seq("doc_id"))
          .localCheckpoint() // probe once: the write below mutates the index
        fresh.write.mode("append").parquet(outPath)
        graft.ops.DedupIndex.appendExact(fresh, col("doc_id"),
          col("text"), indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** NEAR-dup-rejecting incremental ingest: the minhash-index twin of
    * [[dedupIngestTo]]. Each micro-batch is probed against the persisted
    * band index ([[graft.ops.DedupIndex.nearDupAgainstIndex]]) and a doc
    * is rejected when any indexed doc's estimated similarity reaches
    * `minEstimate`; in-batch twins are resolved by the keep-lowest-id
    * rule BEFORE the index probe (the batch's own near-dups never reach
    * the corpus either). Survivors land in the corpus sink and their
    * lanes/bands are appended, so later batches — and later RUNS — see
    * them.
    *
    * Replay idempotency is CONTENT-level, same argument as the exact
    * path, with one twist: a replayed doc matches ITSELF in the index
    * (all lanes agree → estimate 1.0 ≥ any sane threshold), so the
    * re-probed batch yields zero survivors and the sink stays clean.
    * State lives entirely in index parquet — nothing in the state
    * store, nothing expiring, probes bounded by the batch's own bands. */
  def nearDupIngestTo(docs: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, minEstimate: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.localCheckpoint() // one source read per batch
        // keep-lowest-id within the batch (tiny pair set: batch-sized)
        val inBatchDups = graft.ops.Dedup.minhashNearDupPortable(b,
          col("doc_id"), lit(true), col("text"), threshold = minEstimate)
          .select(col("doc_b").as("doc_id")).distinct()
        val solo = b.join(inBatchDups, Seq("doc_id"), "left_anti")
        val hit = graft.ops.DedupIndex.nearDupAgainstIndex(spark, solo,
          col("doc_id"), col("text"), indexPath, minEstimate)
          .select(col("batch_doc").as("doc_id")).distinct()
        val fresh = solo.join(hit, Seq("doc_id"), "left_anti")
          .localCheckpoint() // probe once: the append below mutates the index
        fresh.write.mode("append").parquet(outPath)
        graft.ops.DedupIndex.appendMinhash(fresh, col("doc_id"),
          col("text"), indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming EMBEDDING near-dup ingest against a persisted binary
    * sign-bit index ([[graft.ops.AnnIndex.writeBinaryIndex]] layout):
    * the vector twin of [[nearDupIngestTo]]. Per micro-batch —
    * (1) normalize + pack sign bits once; (2) in-batch keep-lowest-id:
    * candidates share one of the 4×16-bit sign blocks, verified with
    * exact rounded cosine ≥ `threshold`; (3) surviving vectors probe
    * the INDEX's bits by the same block equi-join, verified against the
    * index's stored normalized vectors; (4) fresh vectors land in the
    * sink and their bits + vectors append to the index, so later
    * batches and later RUNS see them.
    *
    * Recall contract (be honest about what the screen catches): a
    * shared 16-bit block is guaranteed at sign-Hamming ≤ 3, and a
    * cosine-c pair flips each sign bit with p = acos(c)/π — at
    * c = 0.99 the expected Hamming is ~2 and the screen catches ~93%
    * of pairs; at c = 0.9 expected Hamming is ~9 and most pairs pass.
    * This operator is the streaming guard against RE-INGESTED /
    * near-identical embeddings (the default 0.99); for looser SEMANTIC
    * dedup block by k-means cell ([[graft.ops.Clustering]]) instead.
    * Replay idempotency: a replayed vector matches itself in the index
    * (cosine 1.0, identical blocks), so re-probes yield zero survivors.
    * State lives entirely in the index parquet — nothing in the state
    * store; candidates are bounded by the batch's own blocks. */
  def vectorNearDupIngestTo(vecs: DataFrame, indexPath: String,
      outPath: String, checkpoint: String, threshold: Double = 0.99)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import graft.ops.Similarity
        val b = batch.localCheckpoint() // one source read per batch
        val sig = b.select(col("vec_id"),
            Similarity.l2Normalize(col("embedding")).as("v"),
            Similarity.signBits(col("embedding"), 0).as("lo"),
            Similarity.signBits(col("embedding"), 32).as("hi"))
          .localCheckpoint() // sign/normalize once per batch
        def blocksOf(df: DataFrame, idAs: String): DataFrame =
          df.select(col("vec_id").as(idAs),
            posexplode(Similarity.signBlockArray(col("lo"), col("hi")))
              .as(Seq("bidx", "bval")))
        val bBlocks = blocksOf(sig, "vec_id")
        // in-batch keep-lowest-id (candidate set bounded by blocks)
        val cand = bBlocks.as("a")
          .join(bBlocks.as("b"),
            col("a.bidx") === col("b.bidx") &&
              col("a.bval") === col("b.bval") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .distinct()
        val inDup = cand
          .join(sig.select(col("vec_id").as("id_a"), col("v").as("va")),
            "id_a")
          .join(sig.select(col("vec_id").as("id_b"), col("v").as("vb")),
            "id_b")
          .filter(round(Similarity.dot(col("va"), col("vb")), 4)
            >= threshold)
          .select(col("id_b").as("vec_id")).distinct()
        val solo = sig.join(inDup, Seq("vec_id"), "left_anti")
        // probe the persisted index: block equi-join, exact verify
        val iBits = spark.read.parquet(s"$indexPath/bits")
        val iBlocks = iBits.select(col("vec_id").as("idx_id"),
          posexplode(Similarity.signBlockArray(col("lo"), col("hi")))
            .as(Seq("bidx", "bval")))
        val hit = blocksOf(solo, "vec_id")
          .join(iBlocks, Seq("bidx", "bval"))
          .select(col("vec_id"), col("idx_id")).distinct()
          .join(solo.select(col("vec_id"), col("v").as("bv")), "vec_id")
          .join(spark.read.parquet(s"$indexPath/vectors")
            .select(col("vec_id").as("idx_id"), col("v").as("iv")),
            "idx_id")
          .filter(round(Similarity.dot(col("bv"), col("iv")), 4)
            >= threshold)
          .select(col("vec_id")).distinct()
        val fresh = solo.join(hit, Seq("vec_id"), "left_anti")
          .localCheckpoint() // probe once: the appends mutate the index
        // Append order is the crash-safety contract: foreachBatch is
        // at-least-once, and the three appends are not atomic. Index
        // parts go FIRST (vectors, then bits — the probe keys off bits,
        // so a vectors-only remnant is invisible), sink LAST: a crash
        // before the bits append replays cleanly (at worst duplicate
        // index rows, absorbed by the probe's distinct); a crash after
        // bits but before the sink write makes the replay see its own
        // rows as index dups and DROP them from the sink — never
        // duplicate sink rows, which downstream dedup semantics can't
        // repair, at the cost of possibly missing sink rows after a
        // mid-batch crash (recoverable by re-ingesting the source file).
        fresh.select(col("vec_id"), col("v"))
          .sortWithinPartitions(col("vec_id"))
          .write.mode("append").parquet(s"$indexPath/vectors")
        fresh.select(col("vec_id"), col("lo"), col("hi"))
          .write.mode("append").parquet(s"$indexPath/bits")
        b.join(fresh.select("vec_id"), Seq("vec_id"), "left_semi")
          .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Enrich a stream with a static dimension table (stream-static join).
    * The dim side is broadcast, so each micro-batch joins partition-
    * locally — no stream-side shuffle, no state store; the standard
    * attach-metadata step of an always-on ingest (the batch twin is the
    * broadcast dim join used throughout the views). */
  def enrichStream(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Stream-stream event-time INTERVAL join: attribute each purchase to
    * every click by the same user within the preceding `horizonSeconds`.
    * Both sides carry watermarks and the join condition bounds c_ts to
    * [p_ts - horizon, p_ts], so Spark can expire join state as the
    * watermark advances — state stays proportional to the horizon, not
    * the stream history; without the time bounds a stream-stream join
    * must buffer both sides forever. `ts` must be TimestampType on both
    * inputs. */
  def attributeStream(purchases: DataFrame, clicks: DataFrame,
      horizonSeconds: Long, watermark: String = "2 hours"): DataFrame = {
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") -
          expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** Drain-everything-then-stop runner (Watcher semantics): processes
    * all files currently in the source, exactly once, then returns. */
  def drainToMemory(df: DataFrame, queryName: String,
      outputMode: String = "append"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Continuous ingest into a parquet catalog table with checkpointing —
    * the production path of the upload watcher. */
  def ingestTo(df: DataFrame, path: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())

  /** Streaming SPLIT ROUTER: assign each arriving document its
    * deterministic train/val/test label ([[graft.ops.Sampling
    * .splitAssign]] — a pure codegen'd expression, so it runs inside the
    * stream with no state) and write one hive partition per split. A
    * loader then reads `path/split=train` with partition pruning; the
    * assignment is content-hashed, so replays and backfills route every
    * document identically — the streaming twin of the batch split. */
  def splitRouter(docs: DataFrame, key: org.apache.spark.sql.Column,
      splits: Seq[(String, Double)], path: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.withColumn("split", graft.ops.Sampling.splitAssign(key, splits))
      .writeStream
      .format("parquet")
      .partitionBy("split")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())

  /** Streaming DECONTAMINATION router: screen every arriving document
    * against a pre-built Bloom filter of eval-benchmark n-grams
    * ([[graft.functions.BloomFilters.buildString]] — built ONCE, batch,
    * from the eval corpus) and route it by `suspect`: `false` means
    * PROVABLY clean (Bloom has no false negatives), `true` means at
    * least one gram might overlap and the doc goes to the quarantine
    * partition for the exact batch verify
    * ([[graft.ops.Decontaminate.ngramOverlapBloom]]). The screen is one
    * codegen'd `exists` over the per-row gram array — STATELESS, so the
    * stream needs no watermark, no shuffle, and replays route
    * identically. This is the scale shape for continuous ingest: the
    * cheap sound filter runs in-stream; the expensive exact join runs
    * only on the (tiny) suspect partition. */
  def decontaminationRouter(docs: DataFrame, text: org.apache.spark.sql.Column,
      bloomBytes: Array[Byte], n: Int, path: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.withColumn("suspect",
        exists(graft.ops.Decontaminate.ngrams(text, n),
          g => graft.functions.BloomFilters.bloomMightContain(g, bloomBytes)))
      .writeStream
      .format("parquet")
      .partitionBy("suspect")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())

  /** One event on the stateful-sessionization input stream. */
  case class SessionEvent(userId: Long, eventId: Long, secs: Long,
      value: Double)

  /** A closed (or flushed) session emitted by the stateful operator. */
  case class SessionSummary(userId: Long, sessionStart: Long,
      sessionEnd: Long, nEvents: Long, sessionValue: Double)

  /** Internal per-user running-session state (public: the codegen'd
    * state encoder instantiates it from generated Java). */
  case class SessionState(start: Long, last: Long, n: Long,
      total: Double)

  /** Streaming gap-based sessionization with explicit per-key state —
    * the `flatMapGroupsWithState` twin of [[graft.ops.Events.sessionize]].
    * A session closes when `gapSeconds` pass without events for the user
    * (enforced via processing-time timeout, so state is bounded); closed
    * sessions are emitted downstream. Batches within one trigger also
    * close sessions inline when a gap appears inside the batch. */
  def sessionizeStream(events: Dataset[SessionEvent],
      gapSeconds: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionSummary(userId, s.start, s.last, s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.secs, e.eventId))
            val closed = Seq.newBuilder[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.secs - s.last <= gapSeconds =>
                  cur = Some(SessionState(s.start, e.secs, s.n + 1,
                    s.total + e.value))
                case Some(s) =>
                  closed += SessionSummary(userId, s.start, s.last, s.n,
                    s.total)
                  cur = Some(SessionState(e.secs, e.secs, 1L, e.value))
                case None =>
                  cur = Some(SessionState(e.secs, e.secs, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapSeconds * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
