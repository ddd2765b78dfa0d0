package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Clustering, Decontaminate, Dedup, Events, Packing,
  Sampling, Similarity, Skew, TextAnalysis}

/** LLM-training-data pipeline operators (beyond-reference surface) bound
  * to the driver's `documents` / `embeddings` / `events` tables. */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Session-lifetime memo of the corpus near-dup CLUSTER MAP, one per
    * scale-factor directory: built and PERSISTED once via
    * [[graft.ops.DedupIndex.writeClusterMap]] (df-capped word-set
    * Jaccard pairs at the standard 0.8 operating point → min-label
    * connected components), then PROBED by every cluster-consuming
    * query (qd42 star variant reads the stored pairs; qd14 curation,
    * qd45 leak-free split, qd62 canonical selection and qd64 sizes
    * join the stored labels). This is the honest 100 TB shape — nobody
    * re-runs pair generation + connected components per downstream
    * query; the map is a write-once corpus artifact like the dedup and
    * ANN indexes. */
  private val clusterMapPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def corpusClusterMapPath(s: SparkSession, dir: String): String =
    clusterMapPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_clmap").toString
      val d = t(s, dir, "documents")
      graft.ops.DedupIndex.writeClusterMap(
        Dedup.ngramJaccardPairs(d, col("doc_id"), col("source"),
          col("text"), threshold = 0.8, maxDocFreq = 256),
        col("doc_a"), col("doc_b"), path)
      path
    })

  private def corpusClusterMap(s: SparkSession, dir: String): DataFrame =
    graft.ops.DedupIndex.readClusterMap(s, corpusClusterMapPath(s, dir))

  /** Session-lifetime memos of the PERSISTED dedup indexes (one per
    * scale-factor directory) — the same write-once/probe-many split as
    * the cluster map: the build-side declared queries (qd71 exact,
    * qd72 minhash) price one honest even-doc index build per run and
    * publish the path; the probe-side twins (qd29 incremental-new,
    * qd30 index-near-dup) consume the stored index the way a 100 TB
    * deployment does — per-arrival probes against an index the corpus
    * already paid for once, with scans bounded by the batch. */
  private val exactIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val minhashIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def exactIndexPath(s: SparkSession, dir: String): String =
    exactIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_exidx").toString
      graft.ops.DedupIndex.writeExactIndex(
        t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        col("doc_id"), col("text"), path)
      path
    })

  private def minhashIndexPath(s: SparkSession, dir: String): String =
    minhashIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_mhidx").toString
      graft.ops.DedupIndex.writeMinhashIndex(
        t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        col("doc_id"), col("text"), path)
      path
    })

  /** qd71: the honest BUILD side of the persisted exact-fingerprint
    * dedup index — one even-doc corpus scan, content fingerprints
    * written prefix-partitioned
    * ([[graft.ops.DedupIndex.writeExactIndex]]), then read BACK so the
    * oracle pins the stored bytes, not an in-memory intermediate.
    * Exactly one query prices this; qd29 (and any future arrival)
    * probes the published path. */
  def exactIndexBuild(s: SparkSession, dir: String): DataFrame = {
    val path =
      java.nio.file.Files.createTempDirectory("graft_exidx").toString
    graft.ops.DedupIndex.writeExactIndex(
      t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), path)
    exactIndexPaths.putIfAbsent(dir, path)
    s.read.parquet(s"$path/exact")
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  /** qd72: the honest BUILD side of the persisted MinHash band index —
    * one even-doc scan feeds the lanes + banded-bucket tables
    * ([[graft.ops.DedupIndex.writeMinhashIndex]]); the stored portable
    * lane table is read back so the oracle pins the persisted sketch
    * content. Exactly one query prices this; qd30 probes the published
    * path. */
  def minhashIndexBuild(s: SparkSession, dir: String): DataFrame = {
    val path =
      java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    graft.ops.DedupIndex.writeMinhashIndex(
      t(s, dir, "documents").filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), path)
    minhashIndexPaths.putIfAbsent(dir, path)
    s.read.parquet(s"$path/lanes")
      .select(col("doc_id") +: (0 until 8).map(i => col(s"l$i")): _*)
      .orderBy(col("doc_id"))
  }

  /** Per-document text profile: chars, tokens, punct ratio, fingerprint. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(
      col("doc_id"),
      length(col("text")).cast("long").as("chars"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      graft.ops.Num.floor4(TextAnalysis.punctRatio(col("text")))
        .as("punct_ratio"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID + quality score per document. */
  def langQuality(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(
      col("doc_id"),
      TextAnalysis.languageId(col("text")).as("lang_pred"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Exact dedup by normalized-content fingerprint. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("fp"))

  /** Word-set Jaccard near-dup pairs blocked by source. The df cap
    * (tokens in > 256 docs of a block leave the inverted index before
    * the self-join) is ON here so the benched plan is the scale-safe
    * one — without it one stopword's posting list makes the join
    * quadratic; the oracle SQL models the same cap. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), col("doc_id"),
      col("source"), col("text"), threshold = 0.8, maxDocFreq = 256)
      .orderBy(col("doc_a"), col("doc_b"))

  /** MinHash+LSH near-dup, blocked by source like the exact-Jaccard
    * twin. Engine-portable md5 lanes (so the WHOLE sketch is
    * oracle-checked, candidates included) at the HIGH-PRECISION banding
    * point: 16 lanes in 4 bands of 4 — longer bands mean a candidate
    * must agree on 4 consecutive lanes, so far fewer false candidates
    * reach the verify join than qd24's 8-lane/2-row recall-oriented
    * config (the standard bands-vs-rows LSH trade, both ends declared).
    * The xxhash64 fast path ([[Dedup.minhashNearDup]]) stays in the
    * library, spec-tested, for engine-internal runs. */
  def minhashNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPortable(t(s, dir, "documents"), col("doc_id"),
      col("source"), col("text"), threshold = 0.8, numLanes = 16,
      rowsPerBand = 4)
      .orderBy(col("doc_a"), col("doc_b"))

  /** SimHash near-dup at the STRICT operating point (radius 2) via the
    * engine-portable md5-lane signatures — fully oracle-checked, the
    * tighter twin of qd51's radius-3 run. Radius 8 on 64-bit signatures
    * is not a useful near-dup threshold on this corpus — at sf0.1 it
    * marks ~13% of ALL pairs "near-duplicate" (1.6M output rows), so no
    * blocking scheme can keep the query small; the xxhash64 fast path
    * ([[Dedup.simhashNearDup]], spec-tested) still supports large radii
    * via block-combination keys. */
  def simhashNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPortable(t(s, dir, "documents"), col("doc_id"),
      col("text"), maxHamming = 2)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Top-5 tokens per source by raw frequency: the corpus-vocabulary
    * profile pass (explode → two-level agg → per-group top-k). */
  def tokenTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("n"))
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("n").desc, col("w"))
    counts.withColumn("rank", row_number().over(bySource).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy(col("source"), col("rank"))
  }

  /** BPE-ish token budget per document: whitespace tokens vs subword
    * segments (GPT-2 pre-tokenizer pattern, ASCII-restricted). */
  def bpeTokenCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
      TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprints at the MOSS-style operating point (5-token
    * shingles, window 4 — guarantee threshold k+w-1 = 8 tokens) via the
    * engine-portable md5 shingle hashes, so the selection is
    * oracle-exact; qd61 declares the complementary (k=4, w=5) point.
    * The native rolling-hash expression ([[TextAnalysis
    * .winnowFingerprints]], spec-tested) remains the engine-internal
    * fast path. */
  def winnowFingerprints(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprintsPortable(t(s, dir, "documents"),
      col("doc_id"), col("text"), k = 5, w = 4)
      .orderBy(col("doc_id"), col("pos"))

  /** Brute-force cosine top-10 against the vec_id=0 embedding. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"), q, k = 10)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** LSH-bucketed ANN against the vec_id=0 embedding, multi-probe with
    * one bit flip — own bucket + 6 adjacent. Approximate but fully
    * DETERMINISTIC: the splitmix64 planes are literals, so the oracle
    * SQL re-derives the same buckets and the result is hash-checked. */
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    Similarity.annTopK(e, col("vec_id"), col("embedding"), q, k = 10,
      numPlanes = 6, probeFlips = 1)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** IVF ANN against the vec_id=0 embedding: 16 sampled centroids,
    * probe the best 4 cells. Approximate but fully DETERMINISTIC: the
    * md5-ordered centroid sample is engine-portable, so the oracle SQL
    * re-derives the same cells and the result is hash-checked. */
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    Similarity.ivfTopK(e, col("vec_id"), col("embedding"), q, k = 10,
      nList = 16, nProbe = 4)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** Gopher-style repetition/symbol heuristics per document. */
  def repetitionStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(t(s, dir, "documents"), col("doc_id"),
      col("text"))
      .orderBy(col("doc_id"))

  /** The flagship curation pipeline, composed end-to-end from the
    * individual operators: (1) drop documents carrying PII or scoring
    * below the quality floor; (2) exact-dedup the survivors, keeping the
    * minimum doc id per content fingerprint; (3) PROBE the materialized
    * corpus cluster map and keep, per near-dup family, only the
    * smallest-id SURVIVING member. What remains is the training corpus.
    * Stage (3) clusters the RAW corpus once (the write-once map), so
    * near-dup chains that pass through filtered-out documents still
    * merge — and the expensive pair join never re-runs inside the
    * curation query. Every stage is the same code verified individually
    * (qd12, qd02, qd03, qd13/qd64) — this query checks they COMPOSE
    * correctly against one oracle. */
  def curatedCorpus(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val pii = TextAnalysis.piiFlags(d, col("doc_id"), col("text"))
      .select(col("doc_id"), col("has_pii"))
    val passed = d.join(pii, "doc_id")
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(!col("has_pii") && col("quality") >= 0.5)
      .select(col("doc_id"), col("source"), col("text"), col("quality"))
    val keptExact = passed
      .withColumn("_keep", col("doc_id") === min(col("doc_id")).over(
        Window.partitionBy(TextAnalysis.fingerprint(col("text")))))
      .filter(col("_keep")).drop("_keep")
    keptExact
      .join(corpusClusterMap(s, dir), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("_m",
        min(col("doc_id")).over(Window.partitionBy(col("cluster"))))
      .filter(col("doc_id") === col("_m"))
      .select(col("doc_id"), col("source"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Duplicate clusters: the WRITE side of the materialized cluster
    * map — pair generation + min-label connected components persisted
    * via [[graft.ops.DedupIndex.writeClusterMap]], then read back (so
    * this query honestly prices the full build every run; the other
    * cluster consumers probe the session's memoized map instead). */
  def dupClusters(s: SparkSession, dir: String): DataFrame = {
    val path =
      java.nio.file.Files.createTempDirectory("graft_clmap").toString
    val d = t(s, dir, "documents")
    graft.ops.DedupIndex.writeClusterMap(
      Dedup.ngramJaccardPairs(d, col("doc_id"), col("source"),
        col("text"), threshold = 0.8, maxDocFreq = 256),
      col("doc_a"), col("doc_b"), path)
    clusterMapPaths.putIfAbsent(dir, path)
    graft.ops.DedupIndex.readClusterMap(s, path).orderBy(col("doc_id"))
  }

  /** qd90: INCREMENTAL cluster-map merge — yesterday's map covers the
    * even docs (base build from even-only near-dup pairs), today's
    * arrival brings the odd docs and with them every pair touching an
    * odd end (new-vs-stored and new-vs-new edges — the
    * [[graft.ops.DedupIndex.nearDupAgainstIndex]] output shape);
    * [[graft.ops.DedupIndex.mergeClusterMap]] folds them in by
    * contracting stored components to their labels and propagating
    * over the ARRIVAL-SIZED graph only — never re-running connected
    * components over the untouched corpus (the scale-safe alternative
    * to refreshClusterMap's full rebuild). The merged labels must
    * equal a map rebuilt from the union of pair sets, so the oracle
    * is qd13's recursive transitive closure VERBATIM — bridging,
    * new-doc, and no-op arrivals all land on the full-rebuild
    * fixpoint. */
  def clusterMapMerge(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"),
        col("doc_id"), col("source"), col("text"), threshold = 0.8,
        maxDocFreq = 256)
      .localCheckpoint(eager = false)
    val path =
      java.nio.file.Files.createTempDirectory("graft_clmerge").toString
    graft.ops.DedupIndex.writeClusterMap(
      pairs.filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0),
      col("doc_a"), col("doc_b"), path)
    graft.ops.DedupIndex.mergeClusterMap(s, path,
      pairs.filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1),
      col("doc_a"), col("doc_b"))
    graft.ops.DedupIndex.readClusterMap(s, path).orderBy(col("doc_id"))
  }

  /** Duplicate clusters via large-star/small-star contraction over the
    * STORED pair table of the materialized cluster map — same pairs,
    * same labels as [[dupClusters]] (one shared oracle), but
    * log(diameter) shuffle rounds: the variant to reach for when dup
    * chains run deep. Reading persisted edges instead of regenerating
    * them is the point of storing `pairs/` alongside the labels. */
  def dupClustersStar(s: SparkSession, dir: String): DataFrame =
    Dedup.dupClustersStar(
      graft.ops.DedupIndex.readClusterPairs(s,
        corpusClusterMapPath(s, dir)),
      col("doc_a"), col("doc_b"))
      .orderBy(col("doc_id"))

  /** Dup-family size profile served from the PERSISTED cluster map —
    * the probe-side declared twin of [[dupClusters]]'s write side: how
    * many members each duplicate family has and its id span, the
    * dashboard that prices how much a dedup pass will remove. */
  def clusterSizes(s: SparkSession, dir: String): DataFrame =
    corpusClusterMap(s, dir)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"), max(col("doc_id")).as("max_id"))
      .orderBy(col("cluster"))

  /** PII content flags per document (emails / phones / SSNs). */
  def piiFlags(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.piiFlags(t(s, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))

  /** Top-3 TF-IDF terms per document (characteristic-keyword pass). */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    TextAnalysis.tfidfTopTerms(d, col("doc_id"), col("text"),
      nDocs = d.count(), k = 3)
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Persisted-LSH-index top-10: build the partitioned parquet index,
    * then query it probing EVERY bucket — exact, so the brute-force
    * oracle applies; exercises the write + partition-pruned read path
    * end-to-end. */
  def annIndexTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val path = java.nio.file.Files.createTempDirectory("graft_ann").toString
    graft.ops.AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"),
      path, numPlanes = 4)
    graft.ops.AnnIndex.queryLshIndex(s, path, q, k = 10, probeFlips = 4)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** Embedding-cosine near-dup pairs blocked by label. */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(t(s, dir, "embeddings"), col("vec_id"),
      col("label"), col("embedding"), threshold = 0.3)
      .orderBy(col("vec_a"), col("vec_b"))

  /** Deterministic spherical k-means (md5 seeds, 2 Lloyd rounds with
    * 1e-6-rounded means): every step engine-portable, so the full
    * iterative clustering is hash-checked against the DuckDB oracle. */
  def kmeansClusters(s: SparkSession, dir: String): DataFrame =
    Clustering.kmeansAssign(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), k = 8, iters = 2)
      .orderBy(col("vec_id"))

  /** SemDeDup-style semantic dedup: k-means cells as the blocking key,
    * drop every vector with a >= 0.3-cosine twin of smaller id in its
    * cell (keep-lowest-id policy). Oracle-exact end to end. */
  def semanticDedupQ(s: SparkSession, dir: String): DataFrame =
    Clustering.semanticDedup(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), k = 8, iters = 2, threshold = 0.3)
      .orderBy(col("vec_id"))

  /** Cluster-balanced (semantic-diversity) sampling: k-means cells as
    * the mix group, each cell downsampled toward the uniform share via
    * the md5-threshold keep — the embedding-space twin of qd19's
    * language rebalance. Pure composition of [[Clustering.kmeansAssign]]
    * and [[Sampling.mixBalancedSample]]; oracle-exact end to end. */
  def clusterBalancedSample(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // mixBalancedSample consumes the assignment TWICE (group-count pass
    // + keep-join pass); without the checkpoint each pass re-executes
    // the full corpus scan (l2-normalize + k literal-centroid dots) —
    // at 100 TB that is one redundant corpus read per downstream pass.
    // Same discipline as Clustering.semanticDedup's assignment.
    val cells = Clustering.kmeansAssign(e, col("vec_id"),
      col("embedding"), k = 8, iters = 2)
      .select(col("vec_id"), col("cell"))
      .localCheckpoint(eager = false)
    Sampling.mixBalancedSample(cells, col("cell"), col("vec_id"))
      .select(col("vec_id"), col("cell"), col("rate"))
      .orderBy(col("vec_id"))
  }

  /** Tumbling-hour rollup of events per type (hour as epoch seconds for
    * cross-engine timestamp stability). */
  def eventHourly(s: SparkSession, dir: String): DataFrame =
    Events.hourlyRollup(Tables.loadEvents(s, dir))
      .orderBy(col("hour_secs"), col("event_type"))

  /** Gap-based sessionization (30-minute inactivity gap). */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    Events.sessionize(Tables.loadEvents(s, dir), gapSeconds = 1800)
      .orderBy(col("event_id"))

  /** Salted per-user event totals: the skew-mitigation path (two-phase
    * aggregation over hashed sub-keys) — result must equal a plain
    * GROUP BY, which is exactly what the oracle checks. Integer-cents
    * sum keeps it order-independent across engines. */
  def saltedUserTotals(s: SparkSession, dir: String): DataFrame =
    Skew.saltedCountSum(Tables.loadEvents(s, dir), col("user_id"),
      floor(col("value") * lit(100.0)).cast("long"),
      rowId = col("event_id"), buckets = 8)
      .withColumnRenamed("k", "user_id")
      .orderBy(col("user_id"))

  /** Per-session volume/span stats. */
  def sessionStats(s: SparkSession, dir: String): DataFrame =
    Events.sessionStats(Tables.loadEvents(s, dir), gapSeconds = 1800)
      .orderBy(col("user_id"), col("session_id"))

  /** Benchmark decontamination: every 97th document plays the eval set;
    * the rest is the training corpus. Flags training docs sharing any
    * 4-token n-gram with an eval doc (4, not 13, because fixture docs are
    * short — the operator takes n as a parameter). */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Decontaminate.ngramOverlap(
      d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0),
      col("doc_id"), col("text"), n = 4)
      .orderBy(col("doc_id"))
  }

  /** Decontamination through the Bloom-prefilter scale path: identical
    * report to qd15 (one shared oracle) with the corpus gram stream
    * pre-pruned by a codegen'd Bloom probe before the exact verify
    * join — the shape for eval sets too large to broadcast exactly. */
  def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Decontaminate.ngramOverlapBloom(
      d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0),
      col("doc_id"), col("text"), n = 4)
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified sample: quality >= 0.5 docs keep at 75%,
    * the rest at 25%, keyed on md5(doc_id) so the sample is identical on
    * any engine, partitioning, or cluster size. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("stratum",
        when(col("quality") >= 0.5, lit("high")).otherwise(lit("low")))
    d.filter(Sampling.stratifiedKeep(col("doc_id"), col("stratum"),
        Seq("high" -> 0.75, "low" -> 0.25), defaultRate = 0.0))
      .select(col("doc_id"), col("stratum"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Greedy sequence packing: documents laid end-to-end per source into
    * 512-token training sequences, deterministic doc_id order. */
  def seqPacking(s: SparkSession, dir: String): DataFrame =
    Packing.greedyPack(t(s, dir, "documents"), col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")), budget = 512)
      .orderBy(col("stream"), col("doc_id"))

  /** Per-label embedding centroids as exact integer element sums. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidSums(t(s, dir, "embeddings"), col("label"),
      col("embedding"))
      .orderBy(col("label"), col("dim"))

  /** Unigram NLL (perplexity-proxy) quality signal per document. */
  def unigramNll(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramNll(t(s, dir, "documents"), col("doc_id"),
      col("text"))
      .orderBy(col("doc_id"))

  /** Int8 scalar quantization of the embedding corpus (per-dim linear). */
  def quantizeEmbeddings(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"))
      .orderBy(col("vec_id"), col("dim"))

  /** Language-mix rebalancing: downsample over-represented languages to
    * the uniform share, deterministically (md5-threshold on doc_id). */
  def mixRebalance(s: SparkSession, dir: String): DataFrame =
    Sampling.mixBalancedSample(t(s, dir, "documents"), col("lang"),
      col("doc_id"))
      .select(col("doc_id"), col("lang"), col("rate"))
      .orderBy(col("doc_id"))

  /** Per-event-type value histogram ($10 bins, exact integer cents). */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.centsHistogram(Tables.loadEvents(s, dir),
      col("event_type"), col("value"), widthCents = 1000L)
      .withColumnRenamed("grp", "event_type")
      .select(col("event_type"), col("bin"), col("bin_lo_cents"),
        col("n"), col("min_cents"), col("max_cents"))
      .orderBy(col("event_type"), col("bin"))

  /** Temperature (sqrt) language-mix sampling: kept docs + group rate. */
  def temperatureMix(s: SparkSession, dir: String): DataFrame =
    Sampling.sqrtTemperatureSample(t(s, dir, "documents"), col("lang"),
      col("doc_id"))
      .select(col("doc_id"), col("lang"), col("rate"))
      .orderBy(col("doc_id"))

  /** Overlapping 64-token chunks every 48 tokens (16-token overlap). */
  def chunkDocs(s: SparkSession, dir: String): DataFrame =
    Packing.chunkTokens(t(s, dir, "documents"), col("doc_id"), col("text"),
      chunkSize = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Per-user rolling window analytics (lag, gap, 3-event moving sum). */
  def rollingStats(s: SparkSession, dir: String): DataFrame =
    Events.rollingStats(Tables.loadEvents(s, dir))
      .orderBy(col("event_id"))

  /** As-of join: every purchase annotated with the user's latest click
    * at-or-before it (null when none) — the composed merge-shape as-of. */
  def asofPurchaseClick(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("ts div 1000").as("ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        expr("ts div 1000").as("click_ts_us"),
        floor(col("value") * lit(100.0)).cast("long").as("click_cents"))
    graft.ops.AsOf.asofJoin(purchases, clicks, "user_id", "ts",
      payload = Seq("click_ts_us", "click_cents"),
      tieBreak = Seq("click_ts_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_click_ts_us").as("click_ts_us"),
        col("asof_click_cents").as("click_cents"))
      .orderBy(col("event_id"))
  }

  /** The same purchase←click as-of join through the NATIVE
    * AsOfJoinExec (custom LogicalPlan + Strategy + merge-scan SparkPlan)
    * — answer-identical to qv06's composed form, same DuckDB ASOF JOIN
    * oracle. */
  def asofNative(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("ts div 1000").as("ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        expr("ts div 1000").as("click_ts_us"),
        floor(col("value") * lit(100.0)).cast("long").as("click_cents"))
    graft.plans.AsOfNative.asofJoin(purchases, clicks, "user_id", "ts",
        payload = Seq("click_ts_us", "click_cents"),
        tieBreak = Seq("click_ts_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_click_ts_us").as("click_ts_us"),
        col("asof_click_cents").as("click_cents"))
      .orderBy(col("event_id"))
  }

  /** Exact per-type lower-median event value (order statistic, no global
    * sort). */
  def medianByType(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.groupMedian(Tables.loadEvents(s, dir),
      col("event_type"), floor(col("value") * lit(100.0)).cast("long"),
      col("event_id"))
      .select(col("grp").as("event_type"), col("n").as("n_events"),
        col("median_v").as("median_cents"))
      .orderBy(col("event_type"))

  /** Corpus dashboard: (lang × source) CUBE of doc counts and token
    * sums — all four grouping-set levels in one pass (partial agg per
    * set, one shuffle). NULL grouping labels render as 'ALL' so the
    * result is unambiguous (fixture columns are never null). */
  def cubeProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("sum_tokens"))
      .orderBy(col("lang"), col("source"))

  /** Engine-portable MinHash+LSH near-dup (md5 lanes — fully
    * oracle-checkable, unlike the xxhash64 fast path of qd05). */
  def minhashPortable(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPortable(t(s, dir, "documents"), col("doc_id"),
      col("source"), col("text"), threshold = 0.8)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Shared 6-token passages (df-capped inverted index, cap mirrored by
    * the oracle — exact). */
  def sharedPassages(s: SparkSession, dir: String): DataFrame =
    Dedup.sharedPassages(t(s, dir, "documents"), col("doc_id"), col("text"),
      n = 6, maxDocFreq = 50, minShared = 2)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Top-50 adjacent char pairs (the first BPE merge candidates). */
  def charPairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charPairCounts(t(s, dir, "documents"), col("text"), k = 50)
      .orderBy(col("rank"))

  /** signup → click → purchase funnel stages per user. */
  def funnelStages(s: SparkSession, dir: String): DataFrame =
    Events.funnel(Tables.loadEvents(s, dir))
      .orderBy(col("user_id"))

  /** Weekly retention cohort matrix. */
  def retention(s: SparkSession, dir: String): DataFrame =
    Events.retentionCohorts(Tables.loadEvents(s, dir))
      .orderBy(col("cohort_week"), col("week_offset"))

  /** Zero-filled (hour × type) counts — the resampled time series. */
  def denseHourly(s: SparkSession, dir: String): DataFrame =
    Events.denseHourlyCounts(Tables.loadEvents(s, dir))
      .orderBy(col("hour_secs"), col("event_type"))

  /** LSH-blocked embedding near-dup — subquadratic without any caller
    * blocking key (rows-only: bucket boundaries are Spark-plane
    * specific; precision proven exact in OpsSpec). */
  def embeddingNearDupLshQ(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), threshold = 0.3, numPlanes = 6)
      .orderBy(col("vec_a"), col("vec_b"))

  /** Persisted int8 codes index: write codes/stats/vectors, query via
    * the literal-weight ADC scan + exact rerank. Hash-checked against
    * the shared ADC oracle (exact integer quantization math). */
  def quantizedIndexTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val path = java.nio.file.Files.createTempDirectory("graft_q8").toString
    graft.ops.AnnIndex.writeQuantizedIndex(e, col("vec_id"),
      col("embedding"), path)
    graft.ops.AnnIndex.queryQuantizedIndex(s, path, q, k = 10, rerank = 50)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** Int8 ADC two-stage retrieval. Hash-checked against the shared ADC
    * oracle: quantization is exact integer math, and stage-1 float
    * summation noise (~1e-13) never straddles real score gaps. */
  def quantizedTopKQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    Similarity.quantizedTopK(e, col("vec_id"), col("embedding"), q,
      k = 10, rerank = 50)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** Semi-structured extraction: per-type stats over the JSON `props.k`
    * field — one narrow codegen'd get_json_object, one aggregation. */
  def jsonPropsStats(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** C4-style boilerplate pruning: drop every token covered by a
    * 3-shingle shared by more than 5 documents. */
  def prunedPassages(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.prunePassages(t(s, dir, "documents"), col("doc_id"),
      col("text"), k = 3, maxDocFreq = 5)
      .orderBy(col("doc_id"))

  /** Linear bag-of-words classifier scoring against a deterministic
    * md5-derived weight table (stands in for a trained fastText-style
    * quality model; the weights frame is the model-loading seam). */
  def linearScoreQ(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val weights = d
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .distinct()
      .withColumn("weight", expr(
        "CAST(locate(substring(md5(w), 1, 1), '0123456789abcdef') - 9 AS BIGINT)"))
    TextAnalysis.linearScore(d, col("doc_id"), col("text"), weights)
      .orderBy(col("doc_id"))
  }

  /** Bigram-LM NLL quality signal (the step up from qd18's unigrams). */
  def bigramNllQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramNll(t(s, dir, "documents"), col("doc_id"),
      col("text"))
      .orderBy(col("doc_id"))

  /** Per-source lexical-diversity dashboard. */
  def vocabProfileQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabProfile(t(s, dir, "documents"), col("source"),
      col("text"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))

  /** JL random projection 64 → 16 dims, exact integer output. */
  def randomProjectionQ(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProjection(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), outDims = 16, inDims = 64)
      .orderBy(col("vec_id"), col("dim"))

  /** Global point-in-interval join with NO equi-key: every error event
    * opens a 5-minute incident window; count the view events landing in
    * each window. Binned range join (bucket = window length) — a naive
    * range predicate here is a BroadcastNestedLoopJoin. */
  def intervalJoinQ(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
    val win = 300L * 1000L * 1000L * 1000L // 5 min in nanos
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("w_start"),
        (col("ts") + lit(win)).as("w_end"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts"))
    graft.ops.RangeJoin.pointInInterval(
      views, col("view_id"), col("ts"),
      errors, col("err_id"), col("w_start"), col("w_end"),
      bucketWidth = win)
      .groupBy(col("interval_id").as("err_event_id"))
      .agg(count(lit(1)).as("n_views"))
      .orderBy(col("err_event_id"))
  }

  /** PII redaction pass over the corpus: typed placeholders substituted
    * in-text, per-type occurrence counts alongside. */
  def piiRedactQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.piiRedact(t(s, dir, "documents"), col("doc_id"),
      col("text"))
      .orderBy(col("doc_id"))

  /** Leakage-free train/val/test split: near-duplicate documents travel
    * together, keyed on their cluster representative — the contamination
    * fix [[curatedSplits]]'s per-doc split doesn't have. The cluster
    * labels come from the materialized map (write once, probe many),
    * not a per-query re-clustering. */
  def leakFreeSplit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Sampling.leakFreeSplitAssign(d, col("doc_id"),
      corpusClusterMap(s, dir), col("doc_id"), col("cluster"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic epoch shuffle: every document's position in the
    * seed-"ep7" global permutation, via sharded two-phase ranking (no
    * single global sort partition). */
  def epochShuffleQ(s: SparkSession, dir: String): DataFrame =
    Sampling.epochShuffle(t(s, dir, "documents"), col("doc_id"),
      seed = "ep7")
      .select(col("doc_id"), col("pos"))
      .orderBy(col("doc_id"))

  /** Within-document repeated-line removal (boilerplate scrub). The
    * fixture corpus is single-line, so this run exercises the identity
    * path end-to-end (split/distinct/rejoin must reproduce the text
    * byte-exactly); the removal semantics are spec-pinned on multi-line
    * docs in OpsSpec. */
  def lineDedupQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dedupLines(t(s, dir, "documents"), col("doc_id"),
      col("text"))
      .orderBy(col("doc_id"))

  /** FILTERED vector search: top-10 among label=3 vectors only, served
    * from the persisted LSH index with the label stored as an index
    * attribute — the predicate prunes candidates inside the index scan
    * (next to the bucket partition pruning), not by post-filtering the
    * top-k. Every bucket probed ⇒ exact, so the brute-force oracle
    * applies. */
  def filteredAnnQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val path = java.nio.file.Files.createTempDirectory("graft_fann").toString
    graft.ops.AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"),
      path, numPlanes = 4, attrs = Seq(col("label")))
    graft.ops.AnnIndex.queryLshIndex(s, path, q, k = 10, probeFlips = 4,
      attrFilter = Some(col("label") === 3))
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** Deterministic weighted sample of 100 docs, weight = n_chars
    * (longer documents proportionally likelier — the length-weighted
    * draw of a token-budgeted mix). */
  def weightedSampleQ(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(t(s, dir, "documents"), col("doc_id"),
      col("n_chars"), k = 100)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Cross-source duplication matrix on shared 5-grams. */
  def sourceOverlapQ(s: SparkSession, dir: String): DataFrame =
    Dedup.sourceOverlap(t(s, dir, "documents"), col("source"),
      col("text"), n = 5)
      .orderBy(col("source_a"), col("source_b"))

  /** Per-source quality gate: keep the best 60% of every source by the
    * composite quality score (deterministic tie-break on doc_id). */
  def qualityGateQ(s: SparkSession, dir: String): DataFrame =
    Sampling.percentileGate(t(s, dir, "documents"), col("source"),
      TextAnalysis.qualityScore(col("text")), col("doc_id"),
      fraction = 0.6)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** Embedding outliers vs their own label centroid (cos < 0). */
  def centroidOutliersQ(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidOutliers(t(s, dir, "embeddings"), col("vec_id"),
      col("label"), col("embedding"), threshold = 0.0)
      .orderBy(col("vec_id"))

  /** Engine-portable SimHash near-dup pairs (md5-lane token hashes,
    * radius 3, 4×16-bit pigeonhole blocks) — fully oracle-checkable,
    * unlike qd06's xxhash64 signatures. */
  def simhashPortableQ(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPortable(t(s, dir, "documents"), col("doc_id"),
      col("text"), maxHamming = 3)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Epoch upsampling: 2.5 epochs of src0, 2.0 of src1, 0.5 of src2,
    * 1.0 of everything else — deterministic fractional copies. */
  def epochUpsampleQ(s: SparkSession, dir: String): DataFrame =
    Sampling.epochUpsample(t(s, dir, "documents"), col("doc_id"),
      col("source"),
      Seq("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.5),
      defaultFactor = 1.0)
      .select(col("doc_id"), col("source"), col("copy"))
      .orderBy(col("doc_id"), col("copy"))

  /** Source-priority exact dedup: src0 beats src1 beats everything. */
  def priorityDedupQ(s: SparkSession, dir: String): DataFrame =
    Dedup.priorityDedup(t(s, dir, "documents"), col("doc_id"),
      col("source"), col("text"), priority = Seq("src0", "src1"))
      .select(col("fp"), col("doc_id"), col("source"))
      .orderBy(col("fp"))

  /** Per-source weighted sample: 10 length-weighted docs per source. */
  def groupWeightedSampleQ(s: SparkSession, dir: String): DataFrame =
    Sampling.groupWeightedSample(t(s, dir, "documents"), col("doc_id"),
      col("source"), col("n_chars"), k = 10)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** Budget-mix sampler: 30k chars of budget at 50/30/20 across
    * src0/src1/src2 (other sources get no share → dropped). */
  def budgetMixQ(s: SparkSession, dir: String): DataFrame =
    Sampling.budgetMixSample(t(s, dir, "documents"), col("doc_id"),
      col("source"), col("n_chars"),
      Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
      budget = 30000L)
      .select(col("doc_id"), col("source"), col("rate"))
      .orderBy(col("doc_id"))

  /** MMR-diversified top-5 from the 30-candidate pool (λ = 0.7),
    * against the vec_id=0 query. */
  def mmrTopKQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    Similarity.mmrTopK(e, col("vec_id"), col("embedding"), q,
      k = 5, poolSize = 30, lambda = 0.7)
      .orderBy(col("mmr_rank"))
  }

  /** First 2 learned BPE merges over the corpus vocabulary. */
  def bpeMergesQ(s: SparkSession, dir: String): DataFrame = {
    val (merges, _) = graft.ops.Bpe.learn(t(s, dir, "documents"),
      col("text"), rounds = 2)
    import s.implicits._
    merges.map { case (r, x, y, n) => (r.toLong, x, y, n) }
      .toDF("round", "left_sym", "right_sym", "pair_freq")
      .orderBy(col("round"))
  }

  /** Top-30 symbols (by weighted frequency) after 2 BPE merge rounds —
    * the end-to-end check that the rewritten symbol state matches. */
  def bpeVocabQ(s: SparkSession, dir: String): DataFrame = {
    val (_, syms) = graft.ops.Bpe.learn(t(s, dir, "documents"),
      col("text"), rounds = 2)
    syms.groupBy(col("sym"))
      .agg(sum(col("freq")).as("total_freq"))
      .orderBy(col("total_freq").desc, col("sym")).limit(30)
  }

  /** PQ-compressed ADC top-10 against the vec_id=0 query (8 subspaces ×
    * 16 codes, exact integer distances). */
  def pqTopKQ(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), queryId = 0L, k = 10)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))

  /** Interval×interval overlap join with NO equi-key: 5-minute error
    * incident windows × 3-minute purchase activity windows, counted per
    * incident. Binned with first-shared-bucket dedup — a naive overlap
    * predicate is a BroadcastNestedLoopJoin. */
  def intervalOverlapQ(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
    val win5 = 300L * 1000L * 1000L * 1000L
    val win3 = 180L * 1000L * 1000L * 1000L
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("e_start"),
        (col("ts") + lit(win5)).as("e_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_start"),
        (col("ts") + lit(win3)).as("p_end"))
    graft.ops.RangeJoin.intervalOverlap(
      errors, col("err_id"), col("e_start"), col("e_end"),
      purchases, col("p_id"), col("p_start"), col("p_end"),
      bucketWidth = win5)
      .groupBy(col("a_id").as("err_event_id"))
      .agg(count(lit(1)).as("n_purchase_windows"))
      .orderBy(col("err_event_id"))
  }

  /** ADC top-10 served from the PERSISTED PQ codes index — identical
    * results to qe20 (same exact-integer contract), exercising the
    * write + codes-only scan path. */
  def pqIndexTopKQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graft_pq").toString
    graft.ops.AnnIndex.writePqIndex(e, col("vec_id"), col("embedding"),
      path)
    val q = e.filter(col("vec_id") === 0).select(col("embedding"))
    graft.ops.AnnIndex.queryPqIndex(s, path, q, k = 10)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** Per-document token counts under the learned 2-merge BPE — the
    * budget estimator upgraded from qd08's merge-free approximation. */
  def bpeTokenizeQ(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val (_, syms) = graft.ops.Bpe.learn(d, col("text"), rounds = 2)
    val wordLen = syms.groupBy("word").agg(count(lit(1)).as("n_syms"))
    d.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
      .join(wordLen, "word")
      .groupBy("doc_id").agg(sum("n_syms").as("n_bpe2_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Binary sign-bit ANN: two packed sign longs per vector (32×
    * compression), 50-candidate Hamming shortlist, exact cosine rerank
    * to top-10. */
  def binaryTopKQ(s: SparkSession, dir: String): DataFrame =
    Similarity.binaryTopK(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), queryId = 0L, k = 10, shortlist = 50)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))

  /** Persisted-binary-index top-10: build the 16-byte-per-vector sign
    * index, stage-1 Hamming scan over `bits/` only, rerank from the
    * row-group-pruned `vectors/` read — identical results to qe23
    * (same two deterministic stages), exercising the write + codes-only
    * scan path. */
  def binaryIndexTopKQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graft_bq").toString
    graft.ops.AnnIndex.writeBinaryIndex(e, col("vec_id"),
      col("embedding"), path)
    graft.ops.AnnIndex.queryBinaryIndex(s, path, queryId = 0L, k = 10,
      shortlist = 50)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** Matryoshka coarse-to-fine: 16-dim-prefix cosine shortlist of 50,
    * full 64-dim exact rerank to top-10. */
  def matryoshkaTopKQ(s: SparkSession, dir: String): DataFrame =
    Similarity.matryoshkaTopK(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), queryId = 0L, k = 10, prefixDims = 16,
      shortlist = 50)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))

  /** Canonical (highest-quality, ties to lowest id) representative per
    * near-dup cluster — the "keep the cleanest copy" resolution policy
    * on top of qd13's clusters, probing the materialized map instead of
    * re-clustering. */
  def clusterCanonicalQ(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Dedup.clusterCanonical(corpusClusterMap(s, dir),
      d.withColumn("quality", TextAnalysis.qualityScore(col("text"))),
      col("doc_id"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Per-source chars-per-BPE-token under the learned 2-merge
    * tokenizer — the tokenizer-economics profile that prices each
    * source's share of a token budget (docs with zero tokens carry no
    * chars into the ratio). */
  def bpeFertilityQ(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val (_, syms) = graft.ops.Bpe.learn(d, col("text"), rounds = 2)
    val wordLen = syms.groupBy("word").agg(count(lit(1)).as("n_syms"))
    val perDoc = d.select(col("doc_id"), col("source"), col("n_chars"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
      .join(wordLen, "word")
      .groupBy(col("doc_id"), col("source"), col("n_chars"))
      .agg(sum("n_syms").as("n_bpe"))
    perDoc.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("total_chars"),
        sum(col("n_bpe")).as("total_bpe_tokens"))
      .withColumn("chars_per_token",
        graft.ops.Num.floor4(col("total_chars").cast("double") /
          col("total_bpe_tokens").cast("double")))
      .orderBy(col("source"))
  }

  /** Multi-query binary kNN join: 5 broadcast query signatures × one
    * corpus scan, per query the 5 Hamming-nearest vectors reranked
    * with exact cosine — the batched form of qe23. */
  def hammingKnnJoinQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.hammingKnnJoin(e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Consistent-hash reshard plan: 16-shard ring vs the same ring
    * shrunk to 12 — only keys on the removed shards move. */
  def consistentShardQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
        graft.ops.Sharding.consistentShard(col("doc_id"), 16)
          .as("shard_before"),
        graft.ops.Sharding.consistentShard(col("doc_id"), 12)
          .as("shard_after"))
      .withColumn("moved", col("shard_before") =!= col("shard_after"))
      .orderBy(col("doc_id"))

  /** Coarse-to-fine: PQ-ADC 50-candidate shortlist, exact cosine
    * rerank to top-10. */
  def pqRerankQ(s: SparkSession, dir: String): DataFrame =
    Similarity.pqRerankTopK(t(s, dir, "embeddings"), col("vec_id"),
      col("embedding"), queryId = 0L, k = 10, shortlist = 50)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))

  /** Hourly traffic spikes per event type (k = 3 exact-integer
    * z-test, spike side only). */
  def hourlyAnomaliesQ(s: SparkSession, dir: String): DataFrame =
    Events.hourlyAnomalies(Tables.loadEvents(s, dir), k = 3.0)
      .orderBy(col("event_type"), col("hour_secs"))

  /** Per-doc OOV rate vs the corpus top-1000 vocabulary. */
  def oovRateQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.oovRate(t(s, dir, "documents"), col("doc_id"),
      col("text"), vocabSize = 1000)
      .orderBy(col("doc_id"))

  /** Forward as-of: each purchase's NEXT click (same user, at or after
    * the purchase), matched purchases only. */
  def nextClickQ(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.ops.AsOf.asofJoinForward(purchases, clicks, "user_id", "ts",
      Seq("click_id"), tieBreak = Seq("click_id"))
      .filter(col("next_click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("next_click_id"))
      .orderBy(col("purchase_id"))
  }

  /** Engine-portable winnowing fingerprints (md5 shingle hashes,
    * window-min selection) — the oracle-checkable twin of qd09. */
  def winnowPortableQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprintsPortable(t(s, dir, "documents"),
      col("doc_id"), col("text"))
      .orderBy(col("doc_id"), col("pos"))

  /** Top-20 session event-type paths (30-minute gap sessions). */
  def topPathsQ(s: SparkSession, dir: String): DataFrame =
    Events.topPaths(Tables.loadEvents(s, dir), gapSeconds = 1800, k = 20)
      .orderBy(col("rank"))

  /** Incremental exact dedup, PROBE side: odd doc_ids arrive as a batch
    * and anti-join the PERSISTED even-doc fingerprint index (partition
    * pruned to the batch's own prefixes); result = batch docs with
    * genuinely new content. The index build is priced once by qd71 —
    * this query costs what every subsequent arrival costs. */
  def incrementalNew(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.ops.DedupIndex.newOnly(s,
      d.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
      exactIndexPath(s, dir))
      .orderBy(col("doc_id"))
  }

  /** Multi-query kNN join: 5 query vectors against the whole corpus,
    * top-5 each, via the bounded topk_agg (corpus scanned once, never
    * shuffled). */
  def knnJoinQ(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.knnJoin(e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic 80/10/10 train/val/test split assignment per doc. */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
        Sampling.splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .orderBy(col("doc_id"))

  /** Best-first corpus selection: per source, highest-`n_chars` docs
    * until 20k whitespace tokens are spent. */
  def budgetSelect(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Packing.budgetSelect(d, col("source"), col("doc_id"),
        col("n_chars"), TextAnalysis.tokenCount(col("text")),
        budget = 20000L, tieBreak = col("doc_id"))
      .withColumnRenamed("group", "src")
      .orderBy(col("src"), col("cum_cost"))
  }

  /** Exact per-type value percentiles (p50/p90/p99) on integer cents. */
  def groupQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.groupQuantiles(Tables.loadEvents(s, dir),
        col("event_type"),
        floor(col("value") * lit(100.0)).cast("long"),
        col("event_id"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .orderBy(col("grp"))

  /** Training-shard balance report: 16 portable-hash shards over docs. */
  def shardBalance(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sharding.balance(t(s, dir, "documents"), col("doc_id"),
        col("n_chars"), numShards = 16)
      .orderBy(col("shard"))

  /** Curriculum interleave: languages round-robined through the epoch. */
  def interleave(s: SparkSession, dir: String): DataFrame =
    Packing.interleaveKey(t(s, dir, "documents"), col("lang"),
        col("doc_id"), col("doc_id"))
      .orderBy(col("interleave_key"))

  /** Markup strip + encoding-damage flags per document. */
  def cleanProfile(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val flags = TextAnalysis.encodingFlags(d, col("doc_id"), col("text"))
    d.select(col("doc_id"),
        length(TextAnalysis.stripMarkup(col("text"))).cast("long")
          .as("clean_len"))
      .join(flags, "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Per-language quality-decile assignment (calibration buckets). */
  def scoreDeciles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.quantileBuckets(t(s, dir, "documents"), col("lang"),
        col("doc_id"), col("n_chars"), col("doc_id"), n = 10)
      .orderBy(col("grp"), col("doc_id"))

  /** Per-user spend outliers at k=3 via the exact z-score test. */
  def spendOutliers(s: SparkSession, dir: String): DataFrame =
    Events.spendOutliers(Tables.loadEvents(s, dir), k = 3.0)
      .orderBy(col("event_id"))

  /** Corpus snapshot diff: old = ids not divisible by 3, new = even ids
    * with every 5th text amended — statuses added/removed/changed/same. */
  def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val oldSnap = d.filter(col("doc_id") % 3 =!= 0)
    val newSnap = d.filter(col("doc_id") % 2 === 0)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    graft.ops.Versioning.corpusDiff(oldSnap, newSnap, col("doc_id"),
        col("text"))
      .orderBy(col("doc_id"))
  }

  /** Per-label centroid drift between even- and odd-id embedding halves. */
  def centroidDrift(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.centroidDrift(
        e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
        col("label"), col("embedding"))
      .orderBy(col("label"))
  }

  /** Composed curation v2: markup-strip -> encoding + length gate ->
    * exact dedup on the CLEANED text -> deterministic split -> per-split
    * doc/token totals. One oracle covers the whole chain. */
  def curatedSplits(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val cleaned = d.select(col("doc_id"),
      TextAnalysis.stripMarkup(col("text")).as("clean"))
    val gated = cleaned
      .join(TextAnalysis.encodingFlags(d, col("doc_id"), col("text")),
        "doc_id")
      .filter(col("n_replacement") === 0 && col("n_control") === 0 &&
        length(col("clean")) >= 50)
    val keep = Dedup.exact(gated, col("doc_id"), col("clean"))
      .select(col("keep_id").as("doc_id"))
    gated.join(keep, "doc_id")
      .select(Sampling.splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"),
        TextAnalysis.tokenCount(col("clean")).cast("long").as("toks"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("total_tokens"))
      .orderBy(col("split"))
  }

  /** Heavy-hitter trigrams: Misra-Gries CANDIDATES (bounded state,
    * m = 4095 counters regardless of vocabulary) -> exact recount of
    * candidates only -> keep true frequency > n/(m+1). The final set is
    * deterministic (the sketch only has to contain it — guaranteed),
    * so one SQL oracle checks the whole sketch-then-verify pipeline. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val m = 4095
    val grams = t(s, dir, "documents")
      .select(explode(Decontaminate.ngramsAll(col("text"), 3)).as("g"))
    // sketch + stream length in ONE corpus pass (both bounded state);
    // the only other pass is the exact recount — nothing materializes.
    val sketch = grams
      .agg(graft.functions.HeavyHittersAggregate
          .heavyHitters(col("g"), m).as("hh"),
        count(lit(1)).as("total"))
      .localCheckpoint(eager = false)
    val total = sketch.select(col("total"))
    val cand = sketch
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("g"))
    grams.join(broadcast(cand), "g")
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * lit(m + 1) > col("total"))
      .select(col("g"), col("n"))
      .orderBy(col("n").desc, col("g"))
  }

  /** GROUPED heavy hitters: per-language frequent trigrams — the
    * sketch runs per group (independent m=2047 counter sets), candidates
    * recount exactly, threshold is each group's own n/(m+1). */
  def groupHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val m = 2047
    val grams = t(s, dir, "documents")
      .select(col("lang"),
        explode(Decontaminate.ngramsAll(col("text"), 3)).as("g"))
    // per-group sketch + group size in ONE corpus pass (see heavyHitters)
    val sketch = grams.groupBy(col("lang"))
      .agg(graft.functions.HeavyHittersAggregate
          .heavyHitters(col("g"), m).as("hh"),
        count(lit(1)).as("total"))
      .localCheckpoint(eager = false)
    val totals = sketch.select(col("lang"), col("total"))
    val cand = sketch
      .select(col("lang"), explode(col("hh")).as("e"))
      .select(col("lang"), col("e.item").as("g"))
    grams.join(broadcast(cand), Seq("lang", "g"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("n"))
      .join(broadcast(totals), "lang")
      .filter(col("n") * lit(m + 1) > col("total"))
      .select(col("lang"), col("g"), col("n"))
      .orderBy(col("lang"), col("n").desc, col("g"))
  }

  /** Incremental near-dup, PROBE side: the odd-doc batch sketches once
    * and band-joins the PERSISTED even-doc MinHash index, similarity
    * estimated from stored lane agreement (est >= 0.5). The index build
    * is priced once by qd72 — this query costs what every subsequent
    * arrival costs. */
  def indexNearDup(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.ops.DedupIndex.nearDupAgainstIndex(s,
      d.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
      minhashIndexPath(s, dir), minEstimate = 0.5)
      .orderBy(col("batch_doc"), col("index_doc"))
  }

  /** qd65: HyperLogLog distinct-token estimate per source — the
    * shuffle-bounded way to profile vocabulary breadth at corpus scale
    * (exact distinct shuffles every token; HLL shuffles ≤ 256 register
    * rows per source per partition). md5-register sketch, oracle-exact. */
  def hllDistinctTokens(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val toks = d.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    graft.ops.Sketches.hllDistinctFast(toks, col("source"), col("w"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** qd68: HLL MERGEABILITY — build per-(source, doc-parity) partial
    * sketches, then max-merge the register arrays per source. Registers
    * merge associatively, so the merged estimates are byte-identical to
    * the direct whole-corpus derivation and qd65's oracle applies
    * verbatim — the incremental shape: daily sketches roll up without
    * rescanning history. */
  def hllMergeParity(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val toks = d.select(col("source"), (col("doc_id") % 2).as("parity"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val partials = toks.groupBy(col("source"), col("parity"))
      .agg(graft.functions.HllRegistersAgg.hllRegisters(col("w"))
        .as("regs"))
    graft.ops.Sketches.hllMergeRegisters(partials, col("source"),
        col("regs"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** qd70: HLL SET ALGEBRA — per-source vocabulary overlap between two
    * md5-split halves of the corpus (doc_id parity CORRELATES with
    * source in the testdata, so the split key is a content hash, the
    * same discipline as the sampling family): union by register max,
    * intersection by inclusion–exclusion on the rounded estimates. The
    * two halves never co-shuffle; each contributes one 256-register
    * sketch per source. */
  def hllOverlapHalves(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val nibble = conv(
      substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
      .cast("int")
    def sketchOf(lo: Boolean) = d.filter(if (lo) nibble < 8 else nibble >= 8)
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("source").as("grp"))
      .agg(graft.functions.HllRegistersAgg.hllRegisters(col("w"))
        .as("regs"))
    graft.ops.Sketches.hllOverlap(sketchOf(true), sketchOf(false))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** Probe terms for the count-min sketch query: a fixed literal list
    * (common corpus words + one absent term exercising the zero path). */
  val cmsProbeTerms: Seq[String] = Seq(
    "the", "scan", "join", "spark", "hash", "window", "sort", "merge",
    "stream", "batch", "dup", "key", "absentterm")

  /** qd66: count-min sketch (depth 4 × width 1024, md5 lanes) over all
    * corpus tokens, probed with a literal term list; `exact_n` rides
    * along so the exact-or-over guarantee is visible in-row. */
  def cmsTokenFreq(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val words = d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val sketch = graft.ops.Sketches.cmsSketch(words, col("w"), width = 1024)
    cmsProbeReport(s, dir, sketch)
  }

  /** qd69: CMS MERGEABILITY — per-parity partial sketches summed
    * counter-wise equal the whole-corpus sketch exactly, so qd66's
    * oracle applies verbatim; the incremental shape for frequency
    * sketches (HLL merges by max, CMS by sum). */
  def cmsMergeFreq(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def words(f: DataFrame) =
      f.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val partials = Seq(0, 1).map(p =>
      graft.ops.Sketches.cmsSketch(words(d.filter(col("doc_id") % 2 === p)),
        col("w"), width = 1024))
    cmsProbeReport(s, dir,
      graft.ops.Sketches.cmsMergeSketches(partials.reduce(_.unionByName(_))))
  }

  /** md5-nibble half split of the documents table — the content-hash
    * split discipline (qd70's): doc_id PARITY correlates with `source`
    * in the testdata, so a parity split would give every source a
    * one-sided batch and a store "merge" that never exercises
    * cross-batch registers. The nibble split lands every source in both
    * halves. */
  private def docHalf(d: DataFrame, lo: Boolean): DataFrame = {
    val nibble = conv(
      substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
      .cast("int")
    d.filter(if (lo) nibble < 8 else nibble >= 8)
  }

  /** qd73: the PERSISTED HLL sketch store end-to-end — initialize the
    * store from one md5-split half of the corpus (one scan), APPEND the
    * other half as a later batch (no history rescan — the 100 TB
    * arrival shape; every source contributes registers to BOTH batches,
    * so the read-time max-merge does real work), then read the merged
    * per-source vocabulary profile. Register max-merge is exact, so the
    * output is byte-identical to qd65's direct whole-corpus derivation
    * and qd65's oracle applies verbatim. */
  def hllStoreProfile(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def toks(lo: Boolean) = docHalf(d, lo)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w"))
    val path = java.nio.file.Files.createTempDirectory("graft_hllst").toString
    graft.ops.SketchStore.writeHll(toks(true), col("source"), col("w"), path)
    graft.ops.SketchStore.appendHll(toks(false), col("source"), col("w"),
      path)
    graft.ops.SketchStore.readHllProfile(s, path)
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** qd74: the PERSISTED CMS sketch store end-to-end — initialize from
    * one md5-split half, APPEND the other (width pinned by the store's
    * own sidecar), probe the merged counters. Counter sums are exact,
    * so qd66's oracle applies verbatim. */
  def cmsStoreFreq(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def words(lo: Boolean) = docHalf(d, lo)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val path = java.nio.file.Files.createTempDirectory("graft_cmsst").toString
    graft.ops.SketchStore.writeCms(words(true), col("w"), width = 1024, path)
    graft.ops.SketchStore.appendCms(words(false), col("w"), path)
    cmsProbeReport(s, dir, graft.ops.SketchStore.readCms(s, path))
  }

  /** The histogram-sketch quantile levels shared by qd77/qd78/qd79. */
  private val histQs = Seq(0.5, 0.9, 0.99)

  /** qd77: per-source token-count QUANTILES from the log-bucket
    * histogram sketch — the distribution member of the sketch triad
    * (qd65 distinct, qd66 frequency). ≤ 64 counter rows per source
    * cross the shuffle regardless of corpus size; the quantile window
    * runs over the sketch, never the corpus; every step is bigint
    * math, so the p50/p90/p99 doubling-bounded estimates are
    * oracle-exact. */
  def histQuantileProfile(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sketch = graft.ops.Sketches.histSketch(d, col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long"))
    graft.ops.Sketches.histQuantiles(sketch, histQs)
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** qd78: histogram MERGEABILITY — per-half sketches (md5-nibble
    * split, qd70's discipline) sum-merged equal the whole-corpus
    * sketch exactly, so qd77's oracle applies verbatim; the
    * incremental shape for distribution profiles. */
  def histMergeQuantiles(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def sketchOf(lo: Boolean) =
      graft.ops.Sketches.histSketch(docHalf(d, lo), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long"))
    graft.ops.Sketches.histQuantiles(
      graft.ops.Sketches.histMergeSketches(
        sketchOf(true).unionByName(sketchOf(false))), histQs)
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** qd79: the PERSISTED histogram store end-to-end — initialize from
    * one md5-split half (one scan), APPEND the other (no history
    * rescan), read the merged per-source quantile profile. Counter
    * sums are exact, so qd77's oracle applies verbatim. */
  def histStoreQuantiles(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def half(lo: Boolean) = docHalf(d, lo)
    val measure = size(TextAnalysis.tokens(col("text"))).cast("long")
    val path =
      java.nio.file.Files.createTempDirectory("graft_histst").toString
    graft.ops.SketchStore.writeHist(half(true), col("source"), measure,
      path)
    graft.ops.SketchStore.appendHist(half(false), col("source"), measure,
      path)
    graft.ops.SketchStore.readHistProfile(s, path, histQs)
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** qd80: sketch-quality EVALUATION — recall of the portable banded
    * MinHash near-dup (qd24's 8×2 recall-oriented operating point)
    * against the exact capped-Jaccard truth (qd04's pairs). The QA
    * loop a dedup pipeline runs when tuning band/row parameters; both
    * sides are the engine's own pinned derivations, so the evaluation
    * row is itself oracle-exact. One row out; the heavy inputs are the
    * two existing pair derivations, nothing new shuffles. */
  def minhashRecall(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val truth = graft.ops.Dedup.ngramJaccardPairs(d, col("doc_id"),
      col("source"), col("text"), threshold = 0.8, maxDocFreq = 256)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(eager = false)
    val found = graft.ops.Dedup.minhashNearDupPortable(d, col("doc_id"),
      col("source"), col("text"), threshold = 0.8)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(eager = false)
    val hit = truth.join(found, Seq("doc_a", "doc_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_found"), col("n_hit"),
        round(col("n_hit") * lit(1.0) / col("n_true"), 4).as("recall"))
  }

  /** The evaluation query batch shared by the recall queries: the
    * first 100 corpus vectors (a fixed-size sample — the query count
    * does not grow with the corpus). n = 100 puts a ±~0.03 standard
    * error on a recall estimate instead of the ±0.3 an n = 1 probe
    * carries. */
  private def evalQueries(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 100)

  /** Brute-force per-query top-10 over the evaluation batch — the
    * TRUTH side of every recall measurement (the bounded `topk_agg`
    * kNN join: corpus scanned once, never shuffled). */
  private def evalTruth(e: DataFrame): DataFrame =
    Similarity.knnJoin(e, col("vec_id"), col("embedding"),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id"), col("vec_id"))

  /** One recall row over the evaluation batch: hits / (10 × queries).
    * Both sides are (query_id, vec_id) member sets of deterministic
    * derivations, so the measurement row is itself oracle-exact. */
  private def recallRow(truth: DataFrame, approx: DataFrame): DataFrame = {
    val tr = truth.localCheckpoint(eager = false)
    tr.join(approx.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
      .crossJoin(broadcast(
        tr.select(countDistinct(col("query_id")).as("n_queries"))))
      .select(lit(10L).as("k"), col("n_queries"), col("n_hit"),
        round(col("n_hit") * lit(1.0) /
          (col("n_queries") * lit(10)), 4).as("recall"))
  }

  /** qe28: retrieval-quality EVALUATION — recall@10 of the IVF probe
    * (qe04's operating point: nProbe 4 of 16 md5-seeded cells) against
    * brute-force truth, averaged over 100 query vectors (the multi-
    * query [[Similarity.ivfKnnJoin]]). Measures ~0.54: the honest
    * number for cell-probing on ISOTROPIC embeddings, where no cell
    * partition concentrates neighbors and recall is bounded by the
    * scanned fraction (qe31 pins the whole curve). */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(evalTruth(e),
      Similarity.ivfKnnJoin(e, col("vec_id"), col("embedding"),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10,
        nList = 16, nProbe = 4))
  }

  /** qe29: IVF with TRAINED cells — qe04's md5-seeded 16 cells refined
    * by 2 spherical Lloyd rounds before the same probe-4 → top-10 tail.
    * The improve half of the qe28 evaluation loop; means round to 1e-6
    * pre-normalization so the trained centroids re-derive in SQL. */
  def ivfTrainedTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    Similarity.ivfTopK(e, col("vec_id"), col("embedding"), q, k = 10,
      nList = 16, nProbe = 4, refineIters = 2)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** qe30: recall@10 of the TRAINED IVF probe (2 Lloyd rounds) over
    * the same 100-query batch — the re-measure half of the loop qe28
    * opened. Training lifts 0.54 → ~0.59: real but small, because the
    * embeddings carry no cluster structure for Lloyd to find (same-
    * label and cross-label cosine are identically distributed). The
    * conclusion the loop produces is therefore not "train harder" but
    * "change shapes" — qe32 is that shape. */
  def annRecallTrained(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(evalTruth(e),
      Similarity.ivfKnnJoin(e, col("vec_id"), col("embedding"),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10,
        nList = 16, nProbe = 4, refineIters = 2))
  }

  /** qe31: the recall-vs-scan-fraction CURVE — trained IVF recall@10
    * over the 100-query batch at nProbe ∈ {1, 2, 4, 8} of 16 cells,
    * with the average per-query candidate count alongside. One
    * training pass and ONE corpus scan serve all four levels (probe
    * frames carry an exploded level column; candidates fan out only
    * into the tiny per-level top-k states). The curve is the
    * evaluation instrument that SHOWS recall ≈ scanned fraction on
    * isotropic embeddings — the measurement that justifies the qe32
    * two-stage shape over raising nProbe forever. */
  def annProbeSweep(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val cents = Similarity.ivfCentroidsKMeans(e, col("vec_id"),
      col("embedding"), nList = 16, iters = 2)
    val q = evalQueries(e)
    val levels = s.createDataFrame(Seq(1L, 2L, 4L, 8L).map(Tuple1(_)))
      .toDF("n_probe")
    val probes = Similarity.probeCellRanks(q, col("vec_id"),
        col("embedding"), cents)
      .filter(col("crk") <= 8)
      .join(broadcast(levels), col("crk") <= col("n_probe"))
      .select(col("n_probe"), col("query_id"), col("qv"), col("cell"))
      .localCheckpoint(eager = false)
    val indexed = e.select(col("vec_id"),
        Similarity.l2Normalize(col("embedding")).as("v"))
      .withColumn("cell", Similarity.nearestCell(col("v"), cents))
      .localCheckpoint(eager = false)
    val approx = indexed.join(broadcast(probes), Seq("cell"))
      .select(col("n_probe"), col("query_id"), col("vec_id"),
        round(Similarity.dot(col("v"), col("qv")), 4).as("cos"))
      .groupBy(col("n_probe"), col("query_id"))
      .agg(graft.functions.TopKAggregate
        .topk(col("cos"), col("vec_id"), 10).as("top"))
      .select(col("n_probe"), col("query_id"),
        posexplode(col("top")).as(Seq("r", "p")))
      .select(col("n_probe"), col("query_id"), col("p.id").as("vec_id"))
    val hits = approx
      .join(evalTruth(e), Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("n_probe")).agg(count(lit(1)).as("n_hit"))
    val cellSizes = indexed.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_in_cell"))
    // anchor the output on the scanned side (every declared level has
    // probe rows by construction) with a LEFT join to hits, so a level
    // with zero hits still reports its row; the recall denominator is
    // k × the measured query count, not a hardcoded batch size (the
    // recallRow discipline — robust to a resized eval batch).
    val scanned = probes.join(cellSizes, Seq("cell"))
      .groupBy(col("n_probe"))
      .agg((sum(col("n_in_cell")) / countDistinct(col("query_id")))
          .as("avg_cand"),
        countDistinct(col("query_id")).as("n_queries"))
    scanned.join(hits, Seq("n_probe"), "left")
      .select(col("n_probe"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) * lit(1.0) /
          (col("n_queries") * lit(10)), 4).as("recall"),
        round(col("avg_cand"), 4).as("avg_cand"))
      .orderBy(col("n_probe"))
  }

  /** qe32: the ≥ 0.9 OPERATING POINT — recall@10 of the int8 two-stage
    * shape (compressed full scan → 50-candidate exact rerank,
    * [[Similarity.quantizedKnnJoin]]) over the same 100-query batch.
    * Measures ≥ 0.99: on isotropic embeddings the high-recall answer
    * is not probing more cells (qe31's curve caps recall at the
    * scanned fraction) but scanning EVERYTHING cheaply — 1 byte/dim in
    * stage 1, 50 full-precision rows per query in stage 2 (a 2.5%
    * full-precision read at sf0.1, shrinking with corpus size). The
    * closing measurement of the qe28 → qe30 → qe31 evaluation loop. */
  def annRerankRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(evalTruth(e),
      Similarity.quantizedKnnJoin(e, col("vec_id"), col("embedding"),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10,
        rerank = 50))
  }

  /** Session-lifetime memo of the TRAINED persisted IVF index (16
    * cells, 2 Lloyd rounds): built once by the qe33 build query,
    * probed by qe34 — the trained centroids now reach the artifact a
    * service actually probes, not only the ad-hoc qe29 derivation. */
  private val ivfTrainedIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfTrainedIndexPath(s: SparkSession, dir: String): String =
    ivfTrainedIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
      graft.ops.AnnIndex.writeIvfIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, nList = 16, refineIters = 2)
      path
    })

  /** qe33: the honest BUILD side of the TRAINED persisted IVF index —
    * 2 spherical Lloyd rounds (qe29's machinery) refine the md5-seeded
    * centroids, every vector is assigned partition-locally (centroids
    * are plan literals — the corpus never shuffles), and the index is
    * written partitioned by cell. The STORED table is read back and
    * profiled per cell, so the oracle pins the persisted assignment —
    * cell populations re-derived symbolically from the same 1e-6-
    * rounded Lloyd arithmetic. Exactly one query prices the build;
    * qe34 probes the published path. */
  def ivfTrainedIndexBuild(s: SparkSession, dir: String): DataFrame = {
    val path = ivfTrainedIndexPath(s, dir)
    s.read.parquet(s"$path/index")
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("cell"))
  }

  /** qe34: recall@10 of the STORED trained index ([[graft.ops.AnnIndex
    * .ivfKnnJoinIndexed]]: stored centroids ranked per query, probed
    * cells a static partition filter on the stored table) over the
    * same 100-query batch — byte-identical to qe30's in-memory trained
    * derivation (same oracle verbatim), proving the persisted artifact
    * serves exactly what the evaluation loop measured. */
  def ivfTrainedIndexRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(evalTruth(e),
      graft.ops.AnnIndex.ivfKnnJoinIndexed(s, ivfTrainedIndexPath(s, dir),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10,
        nProbe = 4))
  }

  /** qe35: IVF-PQ (IVFADC) top-10 — trained coarse cells prune the
    * scan to nProbe 4 of 16 cell partitions, residual product-
    * quantization (16 subspaces × 64 codes on the 1e-6 integer grid —
    * 96-bit codes) compresses what remains, exact-integer ADC ranks
    * it. The two approximations the engine already trusts separately
    * (qe29's trained cells, qe20's PQ codes), composed — stage-1 IO
    * becomes nProbe/nList of the corpus at code width. */
  def ivfPqAdc(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding"))
    Similarity.ivfPqTopK(e, col("vec_id"), col("embedding"), q, k = 10,
      nList = 16, nProbe = 4, numSub = 16, codebookSize = 64,
      refineIters = 2)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** Session-lifetime memo of the persisted IVF-PQ index (16 trained
    * cells, 16×64 residual codebook): built once by qe36, probed by
    * qe36 and qe37. */
  private val ivfPqIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfPqIndexPath(s: SparkSession, dir: String): String =
    ivfPqIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
      graft.ops.AnnIndex.writeIvfPqIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, nList = 16, numSub = 16,
        codebookSize = 64, refineIters = 2)
      path
    })

  /** qe36: ADC top-10 served from the PERSISTED IVF-PQ index —
    * identical results to qe35 (same oracle verbatim): stored
    * centroids rank the probe cells, the probed cells become a
    * partition-pruning filter on the stored `codes/`, and the scan
    * reads nothing else. The build is priced here (memoized path,
    * like qe33). */
  def ivfPqIndexTopK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding"))
    graft.ops.AnnIndex.queryIvfPqIndex(s, ivfPqIndexPath(s, dir), q,
      k = 10, nProbe = 4)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("rank"))
  }

  /** qe37: recall@10 of the persisted IVF-PQ TWO-STAGE probe over the
    * 100-query batch — per query, nProbe 8 of 16 stored cell
    * partitions are ADC-scanned at code width and a 100-candidate
    * shortlist is reranked with exact cosine. The operating point is
    * MEASURED (shortlist × code-resolution sweep over the oracle):
    * 8×16 codes at rerank 50 recover only 0.486 of the nProbe-8 cell
    * ceiling (0.810, qe31's curve) because 32-bit codes mis-rank true
    * neighbors out of the shortlist; 16×64 codes (96 bits) at rerank
    * 100 measure 0.802 ≈ the ceiling. Stage-1 reads 16 small codes
    * per vector instead of 64 doubles, stage-2 reads 100 full rows
    * per query — qe32's two-stage operating point with the compressed
    * scan PRUNED to nProbe/nList of the corpus. */
  def ivfPqRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(evalTruth(e),
      graft.ops.AnnIndex.ivfPqKnnJoinIndexed(s, ivfPqIndexPath(s, dir),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10,
        nProbe = 8, rerank = 100))
  }

  /** Shared probe/exact report over a CMS sketch frame (qd66/qd69). */
  private def cmsProbeReport(s: SparkSession, dir: String,
      sketchIn: DataFrame): DataFrame = {
    val d = t(s, dir, "documents")
    val words = d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val sketch = sketchIn.localCheckpoint(eager = false)
    val probes = s.createDataFrame(
      cmsProbeTerms.map(Tuple1(_))).toDF("term").distinct()
    val exact = words.groupBy(col("w").as("term"))
      .agg(count(lit(1)).as("exact_n"))
    graft.ops.Sketches.cmsEstimate(sketch, probes, col("term"), width = 1024)
      .join(broadcast(exact.join(broadcast(probes), Seq("term"))),
        Seq("term"), "left")
      .select(col("term"), coalesce(col("exact_n"), lit(0L)).as("exact_n"),
        col("cms_est"))
      .orderBy(col("term"))
  }

  /** Query terms for the BM25 / hybrid retrieval queries — a fixed
    * literal "search" over the corpus vocabulary. */
  val bm25QueryTerms: Seq[String] = Seq("spark", "merge", "window", "dup")

  /** Session-lifetime memo of the persisted BM25 postings/stats index
    * (whole corpus — retrieval serves everything), published by the
    * qd75 build query and probed by qd76 and qe27: the lexical twin of
    * the dedup/ANN index memos above. */
  private val bm25IndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bm25IndexPath(s: SparkSession, dir: String): String =
    bm25IndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_bm25").toString
      graft.ops.LexIndex.writeBm25Index(t(s, dir, "documents"),
        col("doc_id"), col("text"), path)
      path
    })

  /** qd75: the honest BUILD side of the persisted BM25 postings index —
    * one corpus tokenization writes the prefix-partitioned postings and
    * the stats sidecar ([[graft.ops.LexIndex.writeBm25Index]]); the
    * stored tables are read back and profiled so the oracle pins the
    * persisted content (doc count, 4-decimal avgdl, posting and term
    * cardinalities). Exactly one query prices this; qd76/qe27 probe the
    * published path. */
  def bm25IndexBuild(s: SparkSession, dir: String): DataFrame = {
    val path =
      java.nio.file.Files.createTempDirectory("graft_bm25").toString
    graft.ops.LexIndex.writeBm25Index(t(s, dir, "documents"),
      col("doc_id"), col("text"), path)
    bm25IndexPaths.putIfAbsent(dir, path)
    val post = s.read.parquet(s"$path/postings")
    val stats = graft.ops.LexIndex.readStats(s, path)
    post.agg(count(lit(1)).as("n_postings"),
        countDistinct(col("term")).as("n_terms"))
      .crossJoin(broadcast(stats.select(col("n_docs"),
        round(col("avgdl"), 4).as("avgdl_r4"))))
      .select(col("n_docs"), col("avgdl_r4"), col("n_postings"),
        col("n_terms"))
  }

  /** qd81: the BM25 index LIFECYCLE — build from one md5-split half,
    * APPEND the other (postings land in their prefix dirs, the stats
    * partial appends blindly — no history read), probe with qd76's
    * terms. Postings(A ∪ B) is the same row set as a whole-corpus
    * build and the stats sums are associative, so qd76's oracle
    * applies verbatim. */
  def bm25IndexAppendTopDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val path =
      java.nio.file.Files.createTempDirectory("graft_bm25ap").toString
    graft.ops.LexIndex.writeBm25Index(docHalf(d, lo = true),
      col("doc_id"), col("text"), path)
    graft.ops.LexIndex.appendBm25Index(docHalf(d, lo = false),
      col("doc_id"), col("text"), path)
    val terms = s.createDataFrame(bm25QueryTerms.map(Tuple1(_))).toDF("term")
    graft.ops.LexIndex.bm25TopKIndexed(s, path, terms, col("term"), k = 10)
      .orderBy(col("score_e4").desc, col("doc_id"))
  }

  /** qd82: the BM25 index DELETE lifecycle — build the whole-corpus
    * index fresh, tombstone-delete one md5-split half
    * ([[graft.ops.LexIndex.deleteFromBm25Index]]: tombstone sidecar +
    * a NEGATIVE stats partial, dl recovered from the stored postings —
    * no posting rewrite, no original text), then probe with qd76's
    * terms. The tombstoned probe must score exactly like an index
    * built from the surviving half alone (df derives from the
    * anti-joined posting rows; N/avgdl from the subtracted sums) —
    * that equivalence IS the oracle. Physical removal is `compact`'s
    * job, StoreSpec-pinned. */
  def bm25IndexDeleteTopDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val path =
      java.nio.file.Files.createTempDirectory("graft_bm25del").toString
    graft.ops.LexIndex.writeBm25Index(d, col("doc_id"), col("text"), path)
    graft.ops.LexIndex.deleteFromBm25Index(s, path,
      docHalf(d, lo = false).select(col("doc_id")), col("doc_id"))
    val terms = s.createDataFrame(bm25QueryTerms.map(Tuple1(_))).toDF("term")
    graft.ops.LexIndex.bm25TopKIndexed(s, path, terms, col("term"), k = 10)
      .orderBy(col("score_e4").desc, col("doc_id"))
  }

  /** qd83: the exact-index DELETE lifecycle — build qd71's even-doc
    * fingerprint index fresh, tombstone-delete its high md5-nibble
    * half ([[graft.ops.DedupIndex.deleteDocs]]), and probe with qd29's
    * odd-doc batch: a deleted doc stops blocking arrivals IMMEDIATELY
    * (the probe anti-joins the tombstone sidecar before the
    * fingerprint anti-join), so the result equals a probe of an index
    * built without the deleted docs — that equivalence is the oracle.
    * Content semantics stay fingerprint-level: an odd doc whose text
    * also survives in the live half is still blocked. */
  def incrementalNewAfterDelete(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val even = d.filter(col("doc_id") % 2 === 0)
    val path =
      java.nio.file.Files.createTempDirectory("graft_exdel").toString
    graft.ops.DedupIndex.writeExactIndex(even, col("doc_id"), col("text"),
      path)
    graft.ops.DedupIndex.deleteDocs(s, path,
      docHalf(even, lo = false).select(col("doc_id")), col("doc_id"))
    graft.ops.DedupIndex.newOnly(s, d.filter(col("doc_id") % 2 === 1),
      col("doc_id"), col("text"), path)
      .orderBy(col("doc_id"))
  }

  /** qd76: PROBE side of the BM25 index — query terms arrive AS A TABLE
    * and join the stored postings (partition-pruned to the terms' own
    * prefixes); per-(doc, term) contributions floor to 1e-4 units before
    * the per-doc sum so the score is exact integer math. Only docs
    * containing >= 1 query term are scored — the probe never enumerates
    * the corpus (that is the point of the index). */
  def bm25IndexTopDocs(s: SparkSession, dir: String): DataFrame = {
    val terms = s.createDataFrame(bm25QueryTerms.map(Tuple1(_))).toDF("term")
    graft.ops.LexIndex.bm25TopKIndexed(s, bm25IndexPath(s, dir), terms,
        col("term"), k = 10)
      .orderBy(col("score_e4").desc, col("doc_id"))
  }

  /** Session memo of the ATTR-carrying BM25 index probed by qd87: the
    * qd75 layout with `flag = doc_id % 2` denormalized onto every
    * posting row (the `dl` discipline) — the filtered-retrieval
    * layout, built once on first touch. */
  private val bm25AttrIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bm25AttrIndexPath(s: SparkSession, dir: String): String =
    bm25AttrIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_bm25attr").toString
      graft.ops.LexIndex.writeBm25Index(t(s, dir, "documents"),
        col("doc_id"), col("text"), path,
        attrs = Seq(pmod(col("doc_id"), lit(2)).cast("int").as("flag")))
      path
    })

  /** qd87: ATTRIBUTE-FILTERED BM25 serving — qd76's probe restricted
    * to even documents via the stored `flag` attribute: the predicate
    * rides the SAME prefix-pruned postings scan (no doc-table join at
    * serving time), candidates are restricted before the per-doc sum,
    * and idf stays GLOBAL (per-doc scores are independent, so the
    * oracle is the unfiltered score set re-cut over allowed docs —
    * standard filtered-retrieval semantics, the lexical twin of
    * qe45). */
  def bm25FilteredTopDocs(s: SparkSession, dir: String): DataFrame = {
    val terms = s.createDataFrame(bm25QueryTerms.map(Tuple1(_))).toDF("term")
    graft.ops.LexIndex.bm25TopKIndexed(s, bm25AttrIndexPath(s, dir),
        terms, col("term"), k = 10,
        attrFilter = Some(col("flag") === 0))
      .orderBy(col("score_e4").desc, col("doc_id"))
  }

  /** Session memo of the UPGRADED BM25 index probed by qd88: built
    * WITHOUT attributes (the legacy filtered-serving-less layout),
    * then backfilled at compaction ([[graft.ops.LexIndex
    * .compactBm25Index]] `backfillAttrs` — the no-rebuild upgrade
    * path). Probes must be row-identical to qd87's born-with-attrs
    * store; both build + upgrade are priced inside qd88 on first
    * touch. */
  private val bm25UpgradedIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bm25UpgradedIndexPath(s: SparkSession, dir: String): String =
    bm25UpgradedIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_bm25up").toString
      val docs = t(s, dir, "documents")
      graft.ops.LexIndex.writeBm25Index(docs, col("doc_id"),
        col("text"), path) // born WITHOUT attrs
      graft.ops.LexIndex.compactBm25Index(s, path,
        backfillAttrs = Some(docs.select(col("doc_id"),
          pmod(col("doc_id"), lit(2)).cast("int").as("flag"))))
      path
    })

  /** qd88: the STORE-UPGRADE path, oracle-pinned — qd87's filtered
    * probe served from a store that was built WITHOUT attributes and
    * gained them at compaction (one doc-keyed join during the rewrite
    * compaction already does — never a corpus rebuild, the only
    * upgrade a 100 TB store can afford). The oracle is qd87's SQL
    * verbatim: an upgraded store must be indistinguishable from a
    * born-with-attrs one at the probe surface. */
  def bm25UpgradedFilteredTopDocs(s: SparkSession, dir: String): DataFrame = {
    val terms = s.createDataFrame(bm25QueryTerms.map(Tuple1(_))).toDF("term")
    graft.ops.LexIndex.bm25TopKIndexed(s, bm25UpgradedIndexPath(s, dir),
        terms, col("term"), k = 10,
        attrFilter = Some(col("flag") === 0))
      .orderBy(col("score_e4").desc, col("doc_id"))
  }

  /** Session memo of the POSITIONAL index (postings + per-term token
    * positions, both term-prefix partitioned). A separate path from
    * the qd75 build so qd75/qd76's pricing is untouched. */
  private val posIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def posIndexPath(s: SparkSession, dir: String): String =
    posIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_posidx").toString
      graft.ops.LexIndex.writeBm25Index(t(s, dir, "documents"),
        col("doc_id"), col("text"), path, positions = true)
      path
    })

  /** The literal phrase probed by qd84 — a token trigram that occurs
    * verbatim in the corpus. */
  val phraseQuery: Seq[String] = Seq("row", "column", "sort")

  /** qd84: exact-PHRASE search over the PERSISTED positional index —
    * docs containing the query trigram verbatim, ranked by occurrence
    * count. The probe reads only the phrase's own term-prefix
    * directories and shifts each term's stored positions to the phrase
    * start they witness; a start covered by all three offsets is a
    * match (the classic positional-postings intersection as one
    * aggregation). The build (one extra posexplode pass alongside the
    * postings) is priced here via the memoized path. */
  def phraseSearch(s: SparkSession, dir: String): DataFrame =
    graft.ops.LexIndex.phraseTopKIndexed(s, posIndexPath(s, dir),
      phraseQuery, k = 10)

  /** qd67: BM25 top-10 documents for the literal query terms. */
  def bm25TopDocs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = TextAnalysis.bm25TopK(t(s, dir, "documents"), col("doc_id"),
      col("text"), bm25QueryTerms, k = 10)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .orderBy(col("rank"))
  }

  /** qv21: Morton z-codes over (user_id, event_id) low 12 bits — the
    * portable core of the z-ordered layout ([[graft.ops.Sharding
    * .writeZOrdered]], locality spec-pinned in LayoutSpec); the declared
    * query pins the interleave bit-exactly against the oracle. */
  def zorderCodes(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(s, dir)
    e.select(col("event_id"), col("user_id"),
        graft.ops.Sharding.zValue(col("user_id") % 4096,
          col("event_id") % 4096, 12).as("zval"))
      .orderBy(col("zval").desc, col("event_id"))
      .limit(20)
  }

  /** Session memo of the persisted int8-quantized index probed by the
    * hybrid query's vector half (qe10 deliberately keeps pricing its
    * own fresh build — this memo serves the service-shaped fusion). */
  private val quantIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def quantIdxPath(s: SparkSession, dir: String): String =
    quantIdxPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_q8idx").toString
      graft.ops.AnnIndex.writeQuantizedIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path)
      path
    })

  /** qe27: hybrid retrieval — reciprocal-rank fusion (k=60) of the BM25
    * top-50 lexical list and the vector top-50, fused on doc_id =
    * vec_id. BOTH lists are served from PERSISTED indexes — the full
    * service shape: the lexical half probes the qd75 postings index,
    * the vector half probes the stored int8 codes (qe10's two-stage:
    * compressed stage-1 scan, 50-candidate exact rerank). Both lists
    * are TakeOrdered-shaped; the fusion is a tiny outer join of two
    * ≤50-row frames. */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = s.createDataFrame(bm25QueryTerms.map(Tuple1(_))).toDF("term")
    val lex = graft.ops.LexIndex.bm25TopKIndexed(s, bm25IndexPath(s, dir),
        terms, col("term"), k = 50)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("score_e4").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"), col("rank_lex"))
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val vec = graft.ops.AnnIndex.queryQuantizedIndex(s,
        quantIdxPath(s, dir), q, k = 50, rerank = 50)
      .select(col("vec_id").as("id"), col("rank").cast("long").as("rank_vec"))
    val fused = lex.join(vec, Seq("id"), "full_outer")
      .select(col("id"), col("rank_lex"), col("rank_vec"),
        round(
          coalesce(lit(1.0) / (lit(60.0) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rank_vec")), lit(0.0)),
          6).as("rrf"))
    fused.withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 10)
      .orderBy(col("rank"))
  }

  /** The multi-query retrieval batch shared by qd85/qe38: the first 20
    * documents become queries, each query's terms its doc's first 3
    * tokens — a deterministic, oracle-expressible stand-in for a
    * service's query feed (20 queries with overlapping vocabularies,
    * so the shared-postings dedup in the batch probe actually fires). */
  private def lexQueryBatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"),
        explode(slice(TextAnalysis.tokens(col("text")), 1, 3)).as("term"))

  /** qd85: MULTI-query BM25 probe of the persisted postings index —
    * 20 queries' term tables answered in ONE partition-pruned probe
    * ([[graft.ops.LexIndex.bm25KnnJoinIndexed]]): the union of the
    * batch's term prefixes is a single static partition filter, each
    * stored posting row is read once however many queries share its
    * term, df derives before the query fan-out, and the per-query
    * top-5 is a bounded `topk_agg` — the batch-serving shape the
    * vector side has had since qe34, now on the lexical index. */
  def bm25BatchTopDocs(s: SparkSession, dir: String): DataFrame =
    graft.ops.LexIndex.bm25KnnJoinIndexed(s, bm25IndexPath(s, dir),
        lexQueryBatch(s, dir), col("query_id"), col("term"), k = 5)
      .orderBy(col("query_id"), col("rank"))

  /** qe38: MULTI-query hybrid retrieval — per-query reciprocal-rank
    * fusion (k=60) of the batch BM25 top-50 (qd85's one-probe shape)
    * and the trained-IVF top-50 ([[graft.ops.AnnIndex
    * .ivfKnnJoinIndexed]] over the same 20 query ids), fused on
    * doc_id = vec_id. Both halves serve a WHOLE query batch from
    * persisted indexes in one probe each; the fusion is a tiny
    * (≤ 20 × 100-row) outer join — qe27's service shape, batched. */
  /** Optional `lexAttrFilter`/`vecAttrFilter` compose filtered
    * serving through this fusion too (each half's predicate rides its
    * own pruned index scan — the [[hybridRrfPqFused]] contract for the
    * trained-IVF vector half); the declared qe38 runs unfiltered. */
  def hybridRrfJoin(s: SparkSession, dir: String,
      lexAttrFilter: Option[org.apache.spark.sql.Column] = None,
      vecAttrFilter: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    val lex = graft.ops.LexIndex.bm25KnnJoinIndexed(s,
        bm25IndexPath(s, dir), lexQueryBatch(s, dir), col("query_id"),
        col("term"), k = 50, attrFilter = lexAttrFilter)
      .select(col("query_id"), col("doc_id").as("id"),
        col("rank").as("rank_lex"))
    val e = t(s, dir, "embeddings")
    val vec = graft.ops.AnnIndex.ivfKnnJoinIndexed(s,
        ivfTrainedIndexPath(s, dir), e.filter(col("vec_id") < 20),
        col("vec_id"), col("embedding"), k = 50, nProbe = 4,
        attrFilter = vecAttrFilter)
      .select(col("query_id"), col("vec_id").as("id"),
        col("rank").as("rank_vec"))
    rrfFusePerQuery(lex, vec)
  }

  /** Per-query reciprocal-rank fusion (k=60) of a lexical and a vector
    * ranked list — the shared tail of every batch hybrid probe
    * (qe38/qe40/qe51): a tiny (≤ |queries| × 100-row) outer join on
    * (query_id, id), never a corpus-sized operation. Inputs carry
    * (query_id, id, rank_lex|rank_vec). */
  private def rrfFusePerQuery(lex: DataFrame, vec: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fused = lex.join(vec, Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"), col("rank_lex"),
        col("rank_vec"),
        round(
          coalesce(lit(1.0) / (lit(60.0) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rank_vec")), lit(0.0)),
          6).as("rrf"))
    fused.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Session memo of the LOW-resolution persisted IVF-PQ index (8
    * subspaces × 16 codes — 32-bit codes, the resolution qe39's grid
    * shows mis-ranks true neighbors out of the shortlist). Its build
    * is priced inside qe39, the grid query itself. */
  private val ivfPqSmallIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfPqSmallIndexPath(s: SparkSession, dir: String): String =
    ivfPqSmallIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_ivfpqs").toString
      graft.ops.AnnIndex.writeIvfPqIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, nList = 16, numSub = 8,
        codebookSize = 16, refineIters = 2)
      path
    })

  /** qe39: the IVF-PQ OPERATING-POINT GRID — recall@10 of the
    * persisted two-stage probe at every (code resolution × shortlist
    * size) point: {8×16 = 32-bit, 16×64 = 96-bit codes} ×
    * {rerank 25, 50, 100}, nProbe 8 throughout. The measurement that
    * JUSTIFIES qe37's operating point (16×64 @ 100 ≈ the 0.810
    * nProbe-8 cell ceiling; 8×16 @ 50 recovers barely half of it) —
    * previously narrated in ARCHITECTURE.md from an offline sweep,
    * now a declared query the oracle re-derives end-to-end (the qe31
    * curve pattern). One ADC scan + ONE pruned full-precision read
    * per resolution serves all three shortlist levels: the reranked
    * frame carries the ADC rank (`srk`), each level is a filter over
    * it, and the per-(level, query) top-10 is a bounded `topk_agg`. */
  def ivfPqOperatingGrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val truth = evalTruth(e).localCheckpoint(eager = false)
    val qRows = evalQueries(e).select(col("vec_id").cast("long"),
        Similarity.l2Normalize(col("embedding"))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val levels = Seq(25L, 50L, 100L).toDF("rerank")
      .localCheckpoint(eager = false)
    def gridHalf(path: String, numSub: Int, cbSize: Int): DataFrame = {
      val hits = graft.ops.AnnIndex.ivfPqRerankedFrame(s, path, qRows,
          nProbe = 8, rerank = 100)
        .join(broadcast(levels), col("srk") <= col("rerank"))
        .groupBy(col("rerank"), col("query_id"))
        .agg(graft.functions.TopKAggregate
          .topk(col("cos"), col("vec_id"), 10).as("top"))
        .select(col("rerank"), col("query_id"),
          explode(col("top")).as("p"))
        .select(col("rerank"), col("query_id"), col("p.id").as("vec_id"))
        .join(truth, Seq("query_id", "vec_id"), "left_semi")
        .groupBy(col("rerank")).agg(count(lit(1)).as("n_hit"))
      // anchor on the declared levels so a zero-hit grid point still
      // reports its row (the annProbeSweep discipline)
      levels.join(hits, Seq("rerank"), "left")
        .select(lit(numSub.toLong).as("num_sub"),
          lit(cbSize.toLong).as("cb_size"), col("rerank"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
    }
    gridHalf(ivfPqSmallIndexPath(s, dir), 8, 16)
      .unionByName(gridHalf(ivfPqIndexPath(s, dir), 16, 64))
      .select(col("num_sub"), col("cb_size"), col("rerank"), col("n_hit"),
        round(col("n_hit") * lit(1.0) / lit(qRows.length * 10L), 4)
          .as("recall"))
      .orderBy(col("num_sub"), col("rerank"))
  }

  /** The multi-phrase batch shared by qd86: the first 10 documents'
    * leading token trigrams become (query_id, off, term) phrase rows —
    * each doc trivially contains its own opening trigram, so every
    * query has ≥ 1 true match, and the 10 phrases share vocabulary
    * (so the one-scan batch shape actually deduplicates reads). */
  private def phraseQueryBatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        posexplode(slice(TextAnalysis.tokens(col("text")), 1, 3))
          .as(Seq("off", "term")))

  /** qd86: MULTI-query exact-phrase probe of the persisted positional
    * index — 10 trigram phrases answered in ONE partition-pruned
    * positions scan ([[graft.ops.LexIndex.phraseKnnJoinIndexed]]):
    * per-query rarest-term anchors from the df sidecar, the anchor
    * union broadcast-semi-joins all shifted positions before any
    * aggregation, per-query top-5 a bounded `topk_agg` — qd85's
    * batch-serving shape for qd84's intersection. */
  def phraseBatchSearch(s: SparkSession, dir: String): DataFrame =
    graft.ops.LexIndex.phraseKnnJoinIndexed(s, posIndexPath(s, dir),
        phraseQueryBatch(s, dir), col("query_id"), col("term"),
        col("off"), k = 5)
      .orderBy(col("query_id"), col("rank"))

  /** qe40: MULTI-query hybrid retrieval fusing the BEST persisted
    * vector probe — per-query reciprocal-rank fusion (k=60) of the
    * batch BM25 top-50 (qd85's one-probe shape) and the IVF-PQ
    * TWO-STAGE top-50 ([[graft.ops.AnnIndex.ivfPqKnnJoinIndexed]] at
    * qe37's measured operating point: 16×64 codes, nProbe 8, rerank
    * 100 — recall 0.802 per qe39's grid, vs the trained-IVF 0.593
    * that qe38 fuses). Both halves serve the whole 20-query batch
    * from persisted indexes in one probe each; the fusion is a tiny
    * (≤ 20 × 100-row) outer join. */
  def hybridRrfPqJoin(s: SparkSession, dir: String): DataFrame =
    hybridRrfPqFused(s, dir, bm25IndexPath(s, dir),
      ivfPqIndexPath(s, dir), lexAttrFilter = None, vecAttrFilter = None)

  /** The qe40 fusion with `attrFilter` plumbed through BOTH halves —
    * the composed filtered-serving shape ("best hybrid results among
    * docs with attribute X"): each half restricts its candidates in
    * its OWN already-pruned index scan ([[graft.ops.LexIndex
    * .bm25KnnJoinIndexed]] / [[graft.ops.AnnIndex.ivfPqKnnJoinIndexed]]
    * attrFilter contracts — predicate pushed beside the prefix/cell
    * pruning, scoring and idf global), so the filtered fusion adds NO
    * scan, NO join, and no post-filter re-cut of a fused list (which
    * would return < 10 rows and mis-rank: fusing filtered lists ≠
    * filtering a fused list). */
  private def hybridRrfPqFused(s: SparkSession, dir: String,
      bm25Path: String, pqPath: String,
      lexAttrFilter: Option[org.apache.spark.sql.Column],
      vecAttrFilter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val lex = graft.ops.LexIndex.bm25KnnJoinIndexed(s, bm25Path,
        lexQueryBatch(s, dir), col("query_id"), col("term"), k = 50,
        attrFilter = lexAttrFilter)
      .select(col("query_id"), col("doc_id").as("id"),
        col("rank").as("rank_lex"))
    val e = t(s, dir, "embeddings")
    val vec = graft.ops.AnnIndex.ivfPqKnnJoinIndexed(s, pqPath,
        e.filter(col("vec_id") < 20), col("vec_id"), col("embedding"),
        k = 50, nProbe = 8, rerank = 100, attrFilter = vecAttrFilter)
      .select(col("query_id"), col("vec_id").as("id"),
        col("rank").as("rank_vec"))
    rrfFusePerQuery(lex, vec)
  }

  /** qe51: ATTRIBUTE-FILTERED hybrid retrieval — qe40's fusion
    * restricted to EVEN documents on both halves, each through its own
    * stored attribute (the lexical index's `flag = doc_id % 2` — qd87's
    * artifact; the IVF-PQ index's `lang = vec_id % 4`, even ⇔ lang ∈
    * {0, 2} — qe45's artifact; same parameters as qe40's index, so the
    * probes differ only by the pushed predicate). Completes the
    * filtered-serving matrix at the composition level: per-family
    * filtered probes (qd87, qe45–qe50) compose into the fusion a real
    * tier serves most, at the cost of two pushed predicates — no new
    * scan, no join-back. Oracle: the qe40 re-derivation with each
    * half's candidate set cut to even ids BEFORE its rank
    * (fusing filtered lists, not filtering the fused list). */
  def hybridRrfPqFiltered(s: SparkSession, dir: String): DataFrame =
    hybridRrfPqFused(s, dir, bm25AttrIndexPath(s, dir),
      ivfPqAttrIndexPath(s, dir),
      lexAttrFilter = Some(col("flag") === 0),
      vecAttrFilter = Some(col("lang").isin(0, 2)))

  /** qm01: the MULTIMODAL decode surface, oracle-pinned — genuine
    * BMP/WAV/MP4/AVI/MKV/PNG/GIF/JPEG/AIFF/AU container bytes (plus
    * one deliberately-CORRUPT kind whose truth is the stub profile,
    * pinning the fall-through contract) are synthesized per document
    * id ([[graft.ops.Multimodal.synthBytes]] — the decoder walks in
    * reverse, parameters pure integer arithmetic in the id), decoded
    * back through the REAL parsers ([[graft.ops.Multimodal
    * .jdkDecoder]]: javax.imageio including the JPEG SOF scan,
    * javax.sound.sampled, and the zero-dependency ISO-BMFF/RIFF/EBML
    * walks) in one per-partition pass, and reported row-per-payload.
    * The DuckDB oracle re-derives every field from the SAME
    * arithmetic — so a wrong offset, endianness, or duration rounding
    * in EITHER direction of the byte walks breaks the hash match. */
  def mediaDecodeProfile(s: SparkSession, dir: String): DataFrame =
    decodedMedia(s, dir).orderBy(col("media_id"))

  /** Session memo of the persisted 6-plane LSH index probed by qe41
    * (build priced inside the query on first touch, the qe33/qe36
    * discipline). Six planes = 64 bucket partitions — the qe03 oracle
    * geometry, persisted. */
  private val lshEvalIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def lshEvalIndexPath(s: SparkSession, dir: String): String =
    lshEvalIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_lsheval").toString
      graft.ops.AnnIndex.writeLshIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, numPlanes = 6)
      path
    })

  /** qe41: recall@10 of the MULTI-query persisted-LSH probe over the
    * 100-query batch ([[graft.ops.AnnIndex.lshKnnJoinIndexed]],
    * probeFlips 1 → 7 of 64 bucket partitions per query) — the
    * batch-serving shape and its measured quality for the bucketed
    * family, completing the per-family symmetry (IVF qe34, IVF-PQ
    * qe37, BM25 qd85, phrases qd86). One pruned index scan serves all
    * 100 queries. */
  def lshIndexRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(evalTruth(e),
      graft.ops.AnnIndex.lshKnnJoinIndexed(s, lshEvalIndexPath(s, dir),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10,
        probeFlips = 1))
  }

  /** qe42: recall@10 of the MULTI-query persisted int8 two-stage probe
    * over the 100-query batch ([[graft.ops.AnnIndex
    * .quantizedKnnJoinIndexed]], rerank 50): one codes scan serves all
    * queries (exact-integer stage-1 scores, so the shortlist is
    * engine-bit-identical), one literal-IN rerank read — the
    * batch-serving shape for the unpartitioned compressed-scan family
    * (qe10's two-stage, batched like qe34/qe37/qe41/qd85). */
  def quantizedBatchRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(evalTruth(e),
      graft.ops.AnnIndex.quantizedKnnJoinIndexed(s, quantIdxPath(s, dir),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10,
        rerank = 50))
  }

  /** Session memo of the persisted plain-PQ index probed by qe44
    * (build priced inside the query on first touch; qe21 keeps pricing
    * its own fresh build). */
  private val pqIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pqIdxPath(s: SparkSession, dir: String): String =
    pqIdxPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_pqidx").toString
      graft.ops.AnnIndex.writePqIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path)
      path
    })

  /** qe44: MULTI-query ADC top-10 from the persisted plain-PQ index
    * ([[graft.ops.AnnIndex.pqKnnJoinIndexed]]) — 20 queries served by
    * ONE two-column codes scan, each query's exact-integer distance
    * table riding the broadcast; per-query ADC rankings are
    * hash-exact against the oracle (no float anywhere in stage 1). */
  def pqBatchAdc(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    graft.ops.AnnIndex.pqKnnJoinIndexed(s, pqIdxPath(s, dir),
        e.filter(col("vec_id") < 20), col("vec_id"), col("embedding"),
        k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Session memo of the persisted sign-bit index probed by qe43
    * (build priced inside the query on first touch). */
  private val binaryIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def binaryIdxPath(s: SparkSession, dir: String): String =
    binaryIdxPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_binidx").toString
      graft.ops.AnnIndex.writeBinaryIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path)
      path
    })

  /** qe43: recall@10 of the MULTI-query persisted binary two-stage
    * probe over the 100-query batch ([[graft.ops.AnnIndex
    * .binaryKnnJoinIndexed]], shortlist 50): the whole batch's Hamming
    * stage-1 is one 16-byte-per-row `bits/` scan, stage 2 one
    * literal-IN rerank read — the cheapest stored first-stage filter,
    * batched and quality-measured like qe41/qe42. */
  def binaryBatchRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(evalTruth(e),
      graft.ops.AnnIndex.binaryKnnJoinIndexed(s, binaryIdxPath(s, dir),
        evalQueries(e).select(col("vec_id")), col("vec_id"), k = 10,
        shortlist = 50))
  }

  /** qe46: the LSH OPERATING GRID — recall@10 and bucket partitions
    * touched at probeFlips {0, 1, 2} from the persisted 6-plane index
    * (qe41's store), one row per operating point: the qe39 measurement
    * discipline applied to the bucketed family, so the ladder's LSH
    * entry gets its whole recall-vs-IO curve instead of one point.
    * `n_buckets` counts the DISTINCT stored bucket partitions the
    * probe union actually touches (what one pruned scan reads for the
    * 100-query batch): flips 0 probes each query's own bucket, 1 adds
    * the 6 one-bit neighbors, 2 the 15 two-bit neighbors — the probed
    * fraction of the 2⁶ partitions is the IO knob, recall the return.
    * Truth is computed once and re-cut per level. */
  def lshOperatingGrid(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val path = lshEvalIndexPath(s, dir)
    val truth = evalTruth(e).localCheckpoint(eager = false)
    // driver-side probe geometry (the lshKnnJoinIndexed derivation):
    // 6 splitmix64 planes over dim 64, each query's bucket, and the
    // per-level flip-mask unions — all bounded by the serving batch
    val planes = graft.ops.Similarity.planeVectors(6, 64)
    val qBuckets = evalQueries(e)
      .select(graft.ops.Similarity.l2Normalize(col("embedding")))
      .collect().map { r =>
        val qv = r.getSeq[Double](0).toArray
        planes.zipWithIndex.foldLeft(0L) { case (acc, (pl, p)) =>
          var s0 = 0.0; var i = 0
          while (i < pl.length && i < qv.length) {
            s0 += pl(i) * qv(i); i += 1 }
          if (s0 >= 0) acc | (1L << p) else acc
        }
      }
    val stored = s.read.parquet(s"$path/index")
      .select(col("bucket").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet
    val levels = Seq(0, 1, 2).map { f =>
      val masks = (0 to f).flatMap(r => (0 until 6).combinations(r)
        .map(_.foldLeft(0L)((acc, p) => acc | (1L << p))))
      val touched = qBuckets.flatMap(qb => masks.map(_ ^ qb)).distinct
        .count(stored.contains)
      recallRow(truth,
        graft.ops.AnnIndex.lshKnnJoinIndexed(s, path, evalQueries(e),
          col("vec_id"), col("embedding"), k = 10, probeFlips = f))
        .select(lit(f.toLong).as("probe_flips"),
          lit(touched.toLong).as("n_buckets"), col("k"),
          col("n_queries"), col("n_hit"), col("recall"))
    }
    levels.reduce(_ unionByName _).orderBy(col("probe_flips"))
  }

  /** Session memo of the ATTR-carrying persisted IVF-PQ index probed
    * by qe45: qe36/qe37's trained model parameters (16 cells × 2 Lloyd
    * rounds, 16×64 residual codes) with a doc attribute
    * `lang = vec_id % 4` stored ON the code rows — the
    * filtered-vector-search layout (build priced inside the query on
    * first touch, the qe33/qe36 discipline). */
  private val ivfPqAttrIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfPqAttrIndexPath(s: SparkSession, dir: String): String =
    ivfPqAttrIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_ivfpqattr").toString
      graft.ops.AnnIndex.writeIvfPqIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, nList = 16, numSub = 16,
        codebookSize = 64, refineIters = 2,
        attrs = Seq(pmod(col("vec_id"), lit(4)).cast("int").as("lang"),
          pmod(col("vec_id"), lit(16)).cast("int").as("lang16")))
      path
    })

  /** qe45: ATTRIBUTE-FILTERED batch serving on the best probe —
    * recall@10 of the IVF-PQ two-stage probe restricted to documents
    * with `lang = 1` (a stored index attribute), measured against the
    * brute-force truth over the SAME filtered corpus. The predicate
    * rides the pruned stage-1 codes scan (pushed to parquet next to
    * the cell pruning — plan-pinned), so candidates are restricted
    * BEFORE the shortlist and the rerank inherits the filtered set:
    * "top-k among docs with lang=1" costs the same probe IO as the
    * unfiltered qe37, never a corpus join at serving time. */
  /** Brute-force truth restricted to `vec_id % mod = 1` — the filtered
    * twin of [[evalTruth]], shared by every filtered-recall row. */
  private def filteredEvalTruth(e: DataFrame, mod: Int): DataFrame =
    Similarity.knnJoin(e.filter(pmod(col("vec_id"), lit(mod)) === 1),
        col("vec_id"), col("embedding"),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id"), col("vec_id"))

  def ivfPqFilteredRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(filteredEvalTruth(e, 4),
      graft.ops.AnnIndex.ivfPqKnnJoinIndexed(s,
        ivfPqAttrIndexPath(s, dir), evalQueries(e), col("vec_id"),
        col("embedding"), k = 10, nProbe = 8, rerank = 100,
        attrFilter = Some(col("lang") === 1)))
  }

  /** qe47: filtered recall vs SELECTIVITY — qe45's probe against a
    * 1/16-selectivity attribute (`lang16 = 1`) at the same operating
    * point (nProbe 8, rerank 100). This measures the KNOWN failure
    * mode of filter-during-scan ANN: as the filter keeps fewer
    * candidates per probed cell, a fixed-depth shortlist drains and
    * recall falls — the number that tells an operator when to raise
    * nProbe/rerank (or pre-partition by the attribute) instead of
    * trusting qe45's 1/4-selectivity point. Same index artifact as
    * qe45 (both attrs ride the same code rows). */
  def ivfPqSelectiveRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(filteredEvalTruth(e, 16),
      graft.ops.AnnIndex.ivfPqKnnJoinIndexed(s,
        ivfPqAttrIndexPath(s, dir), evalQueries(e), col("vec_id"),
        col("embedding"), k = 10, nProbe = 8, rerank = 100,
        attrFilter = Some(col("lang16") === 1)))
  }

  /** Session memos of the remaining ATTR-carrying index families
    * (`lang = vec_id % 4` on the stage-1 tables): the filtered-recall
    * rows qe48/qe49/qe50 probe these, completing the filtered ladder
    * measurement across int8 / binary / LSH alongside IVF-PQ (qe45)
    * and BM25 (qd87). */
  private val quantAttrIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val binaryAttrIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val lshAttrIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def langAttr: Seq[org.apache.spark.sql.Column] =
    Seq(pmod(col("vec_id"), lit(4)).cast("int").as("lang"))

  private def quantAttrIdxPath(s: SparkSession, dir: String): String =
    quantAttrIdxPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_q8attr").toString
      graft.ops.AnnIndex.writeQuantizedIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, attrs = langAttr)
      path
    })

  private def binaryAttrIdxPath(s: SparkSession, dir: String): String =
    binaryAttrIdxPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_binattr").toString
      graft.ops.AnnIndex.writeBinaryIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, attrs = langAttr)
      path
    })

  private def lshAttrIdxPath(s: SparkSession, dir: String): String =
    lshAttrIdxPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_lshattr").toString
      graft.ops.AnnIndex.writeLshIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, numPlanes = 6,
        attrs = langAttr)
      path
    })

  /** qe48: filtered recall@10 of the int8 two-stage batch probe
    * (qe42's operating point, rerank 50) restricted to `lang = 1` —
    * the exact-integer stage-1 scans the same codes table with the
    * predicate pushed beside it, so the filtered shortlist is still
    * engine-bit-identical. Unlike the lossy families, the int8 probe
    * holds recall 1.0 under the filter: stage 1 ranks by a faithful
    * (quantized) dot over ALL allowed candidates, so the filtered
    * truth is inside the 50-deep shortlist just as the unfiltered one
    * was (qe42). */
  def quantizedFilteredRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(filteredEvalTruth(e, 4),
      graft.ops.AnnIndex.quantizedKnnJoinIndexed(s,
        quantAttrIdxPath(s, dir), evalQueries(e), col("vec_id"),
        col("embedding"), k = 10, rerank = 50,
        attrFilter = Some(col("lang") === 1)))
  }

  /** qe49: filtered recall@10 of the binary two-stage batch probe
    * (qe43's operating point, shortlist 50) restricted to `lang = 1`:
    * query signatures still come from the raw bits table by id (a
    * filtered-out query id may still query), only the candidate scan
    * filters. */
  def binaryFilteredRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(filteredEvalTruth(e, 4),
      graft.ops.AnnIndex.binaryKnnJoinIndexed(s,
        binaryAttrIdxPath(s, dir),
        evalQueries(e).select(col("vec_id")), col("vec_id"), k = 10,
        shortlist = 50, attrFilter = Some(col("lang") === 1)))
  }

  /** qe50: filtered recall@10 of the LSH batch probe (qe41's operating
    * point, probeFlips 1) restricted to `lang = 1` — the filter rides
    * the bucket-pruned scan, so the probed-partition IO is unchanged
    * while the candidate pool shrinks. */
  def lshFilteredRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(filteredEvalTruth(e, 4),
      graft.ops.AnnIndex.lshKnnJoinIndexed(s, lshAttrIdxPath(s, dir),
        evalQueries(e), col("vec_id"), col("embedding"), k = 10,
        probeFlips = 1, attrFilter = Some(col("lang") === 1)))
  }

  /** Session memo of the MULTI-TABLE LSH index probed by qe52: four
    * independent 6-plane tables over the eval corpus (storage ×4, the
    * multi-table trade), built once on first touch — build priced
    * inside the grid query, the qe41 discipline. */
  private val lshMultiIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def lshMultiIndexPath(s: SparkSession, dir: String): String =
    lshMultiIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_lshmulti").toString
      graft.ops.AnnIndex.writeLshMultiIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, numPlanes = 6,
        numTables = 4)
      path
    })

  /** qe52: the MULTI-TABLE LSH grid — recall@10 and (table, bucket)
    * partitions touched at L ∈ {1, 2, 4} tables, probeFlips 1
    * throughout (qe41's operating point). The second axis qe46's grid
    * asked for: single-table LSH tops out at 0.54 unfiltered
    * (22/64 partitions at flips 2); independent tables raise recall
    * as 1 − (1 − r)^L at probe IO ×L WITHOUT training — so the
    * untrained family's niche (streaming-appendable) finally has a
    * recall knob that scales, measured against the same truth as
    * every ladder row. ONE stored artifact serves all three levels:
    * probing fewer tables is just a tighter partition filter
    * ([[graft.ops.AnnIndex.lshMultiKnnJoinIndexed]] `tables`). */
  def lshMultiTableGrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val path = lshMultiIndexPath(s, dir)
    val truth = evalTruth(e).localCheckpoint(eager = false)
    // driver-side probe geometry (the lshMultiKnnJoinIndexed
    // derivation): 4 × 6 splitmix planes, per-(query, table) buckets,
    // flip-mask unions — all bounded by the serving batch
    val all = graft.ops.Similarity.planeVectors(24, 64)
    val qRows = evalQueries(e)
      .select(col("vec_id").cast("long"),
        graft.ops.Similarity.l2Normalize(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val masks = (0L +: (0 until 6).map(p => 1L << p)).toIndexedSeq
    // every (query, table, bucket) probe of the FULL L = 4 level —
    // level l's probe set is exactly the rows with tab < l
    val pairRows = qRows.toSeq.flatMap { case (q, qv) =>
      (0 until 4).flatMap { t =>
        val planes = all.slice(t * 6, (t + 1) * 6)
        val qb = planes.zipWithIndex.foldLeft(0L) {
          case (acc, (pl, p)) =>
            var s0 = 0.0; var i = 0
            while (i < pl.length && i < qv.length) {
              s0 += pl(i) * qv(i); i += 1 }
            if (s0 >= 0) acc | (1L << p) else acc
        }
        masks.map(m => (q, t, (t.toLong << 6) + (m ^ qb)))
      }
    }
    val stored = s.read.parquet(s"$path/index")
      .select(col("bucket").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet
    val nBuckets = Seq(1, 2, 4).map(l => l.toLong ->
      pairRows.filter(_._2 < l).map(_._3).distinct
        .count(stored.contains).toLong)
    // ONE pruned index scan serves all three levels (the qe39 srk-cut
    // discipline): candidates carry the MINIMUM table index that
    // reached them, level l's candidate set is min-table < l — the
    // same per-level sets the three per-level probes scanned, scored
    // by the identical rounded dot, cut by the identical topk_agg, so
    // every grid row is unchanged while two of the three probe scans
    // (and their recall rounds) drop out.
    val pairs = pairRows.toDF("query_id", "tab", "bucket")
    val probedAll = pairRows.map(_._3).distinct.toIndexedSeq
    val qvDf = qRows.toSeq.toDF("query_id", "qv")
    val cand = s.read.parquet(s"$path/index")
      .filter(col("bucket").isin(probedAll: _*))
      .join(broadcast(pairs), Seq("bucket"))
      .join(broadcast(qvDf), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.ops.Similarity.dot(col("v"), col("qv")), 4)
          .as("cos"), col("tab"))
      .groupBy(col("query_id"), col("vec_id"), col("cos"))
      .agg(min(col("tab")).as("mt"))
      .localCheckpoint()
    val lvls = nBuckets.toDF("l", "n_buckets")
      .localCheckpoint(eager = false)
    val hits = cand.join(broadcast(lvls.select(col("l"))),
        col("mt") < col("l"))
      .groupBy(col("l"), col("query_id"))
      .agg(graft.functions.TopKAggregate
        .topk(col("cos"), col("vec_id"), 10).as("top"))
      .select(col("l"), col("query_id"), explode(col("top")).as("p"))
      .select(col("l"), col("query_id"), col("p.id").as("vec_id"))
      .join(truth, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("l")).agg(count(lit(1)).as("n_hit"))
    lvls.join(hits, Seq("l"), "left")
      .crossJoin(broadcast(truth.select(
        countDistinct(col("query_id")).as("n_queries"))))
      .select(col("l").as("n_tables"), col("n_buckets"),
        lit(10L).as("k"), col("n_queries"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) * lit(1.0) /
          (col("n_queries") * lit(10)), 4).as("recall"))
      .orderBy(col("n_tables"))
  }

  /** Session memo of the ATTR-carrying multi-table LSH index probed by
    * qe53 (`lang = vec_id % 4` on every stored row; 4 tables × 6
    * planes — qe52's geometry). A separate artifact from qe52's so the
    * unfiltered grid's pricing is untouched. */
  private val lshMultiAttrIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def lshMultiAttrIndexPath(s: SparkSession, dir: String): String =
    lshMultiAttrIndexPaths.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_lshmultiattr").toString
      graft.ops.AnnIndex.writeLshMultiIndex(t(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), path, numPlanes = 6,
        numTables = 4, attrs = langAttr)
      path
    })

  /** qe53: FILTERED recall on the multi-table family — qe50's
    * measurement (lang = 1, flips 1) at L = 4 tables: does the L axis
    * lift the filtered floor the way it lifts the unfiltered one?
    * qe50 measured the single-table filtered floor at 0.223 (bucket
    * geometry ignores the attribute, so a shrunken candidate pool
    * starves a fixed probe set); four independent tables multiply the
    * chances a surviving true neighbor shares SOME probed bucket. The
    * filter rides the same pruned (table, bucket) scan — the
    * attrFilter contract unchanged under the combined key. */
  def lshMultiFilteredRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    recallRow(filteredEvalTruth(e, 4),
      graft.ops.AnnIndex.lshMultiKnnJoinIndexed(s,
        lshMultiAttrIndexPath(s, dir), evalQueries(e), col("vec_id"),
        col("embedding"), k = 10, probeFlips = 1,
        attrFilter = Some(col("lang") === 1)))
  }

  private def decodedMedia(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.decodeMeta(
      graft.ops.Multimodal.synthMedia(
        t(s, dir, "documents").select(col("doc_id")), "doc_id"),
      "media_id")

  /** qm02: resize planning over the DECODED media profile —
    * aspect-preserving bounding-box targets ([[graft.ops.Multimodal
    * .resizePlan]], pure column math, no UDF) computed from
    * dimensions that came out of the REAL byte decode, so the oracle
    * (same arithmetic over the synth parameters) cross-checks decode
    * + plan together. */
  def mediaResizePlan(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.resizePlan(decodedMedia(s, dir), 256, 256)
      .select(col("media_id"), col("width"), col("height"),
        col("target_width"), col("target_height"))
      .orderBy(col("media_id"))

  /** qm03: frame-sampling plan over the decoded media profile — one
    * row per sampled frame index (every 250th), a generator over the
    * DECODED frame count ([[graft.ops.Multimodal.frameSample]]);
    * downstream per-frame decode would stay distributed. */
  def mediaFrameSample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.frameSample(decodedMedia(s, dir), 250)
      .orderBy(col("media_id"), col("frame_idx"))

  /** The perceptual-hash frame shared by qm04/qm05: one genuine 8×8
    * pixel BMP per document id ([[graft.ops.Multimodal.pixelBmpBytes]]
    * — raw uncompressed pixels, parameters pure integer arithmetic in
    * the id), decoded back through the REAL ImageIO path
    * ([[graft.ops.Multimodal.decodeGray8x8]]), fingerprinted by the
    * codegen'd 64-bit average-hash
    * ([[graft.functions.VectorExpressions.ahash64]]: bit p set iff
    * pixel p is strictly brighter than the mean, exact integer
    * threshold `v·64 > Σv`). The id bound keeps the ORACLE's
    * brute-force pair verification quadratic-in-2000, not in the
    * corpus; the Spark side's banding never goes all-pairs anyway. */
  private def imageAHashFrame(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.decodeGray8x8(
      graft.ops.Multimodal.synthImages(
        t(s, dir, "documents").filter(col("doc_id") < 2000)
          .select(col("doc_id")), "doc_id"), "media_id")
      .select(col("media_id"),
        graft.functions.VectorExpressions.ahash64(col("grays")).as("sh"))

  /** qm04: the DECODED-pixel aHash per image, split into two unsigned
    * 32-bit halves (exact BIGINTs in any engine — bit 63 of a packed
    * long would overflow the oracle's integer arithmetic). The oracle
    * re-derives every pixel, the mean threshold, and both halves from
    * the same arithmetic — so a wrong pixel offset, row direction, or
    * channel order in the BMP writer OR the ImageIO read breaks the
    * hash match. */
  def imageAHash(s: SparkSession, dir: String): DataFrame =
    imageAHashFrame(s, dir)
      .select(col("media_id"),
        col("sh").bitwiseAND(lit(0xffffffffL)).as("ahash_lo"),
        shiftrightunsigned(col("sh"), 32).as("ahash_hi"))
      .orderBy(col("media_id"))

  /** qm05: IMAGE NEAR-DUP over the decoded-pixel aHashes — all pairs
    * within Hamming radius 10 via the generalized-pigeonhole banded
    * equi-join ([[graft.ops.Dedup.hammingNearDup]], the SimHash
    * machinery over any 64-bit fingerprint): exact at the radius
    * (recall 1.0), candidate volume cut by compound block keys, never
    * an all-pairs join. The oracle verifies against brute-force
    * Hamming over the same arithmetic-derived hashes — pinning decode,
    * fingerprint, and banding end-to-end. */
  def imageNearDup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.hammingNearDup(imageAHashFrame(s, dir),
        col("media_id"), col("sh"), maxHamming = 10)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming").cast("long").as("hamming"))
      .orderBy(col("media_a"), col("media_b"))

  /** The audio-fingerprint frame shared by qm06/qm07: one genuine
    * mono 16-bit PCM WAV per document id
    * ([[graft.ops.Multimodal.pcmWavBytes]] — 512 real sample frames,
    * values pure integer arithmetic in the id), decoded back through
    * the REAL `javax.sound.sampled` path
    * ([[graft.ops.Multimodal.decodePcm16]]), folded into 64
    * window energies with BUILT-IN higher-order functions
    * (`transform`/`slice`/`aggregate` — sum of |sample| over each
    * 8-frame window, exact integers), and fingerprinted by the
    * codegen'd circular difference-hash
    * ([[graft.functions.VectorExpressions.dhash64]]: bit w set iff
    * window w+1 (wrapping) is strictly louder than window w — the
    * spectral-flux-sign construction, local comparisons only, so a
    * perturbed window flips at most 2 bits). A malformed clip
    * (wrong frame count) fingerprints as NULL, never as a fake. The
    * id bound keeps the ORACLE's brute-force pair verification
    * quadratic-in-2000; the Spark side's banding never goes
    * all-pairs anyway. */
  private def audioFpFrame(s: SparkSession, dir: String): DataFrame = {
    val m = graft.ops.Multimodal
    val decoded = m.decodePcm16(
      m.synthAudio(
        t(s, dir, "documents").filter(col("doc_id") < 2000)
          .select(col("doc_id")), "doc_id"), "media_id")
    val perWindow = m.PcmFrames / m.PcmWindows
    val energies = transform(
      sequence(lit(0), lit(m.PcmWindows - 1)),
      w => aggregate(
        slice(col("samples"), w * perWindow + lit(1), lit(perWindow)),
        lit(0L), (acc, x) => acc + abs(x)))
    decoded.select(col("media_id"),
      graft.functions.VectorExpressions.dhash64(
        when(size(col("samples")) === m.PcmFrames, energies))
        .as("fp"))
  }

  /** qm06: the DECODED-sample audio fingerprint per clip, split into
    * two unsigned 32-bit halves (exact BIGINTs in any engine — bit
    * 63 of a packed long would overflow the oracle's integer
    * arithmetic). The oracle re-derives every sample, every window
    * energy, and both halves from the same arithmetic — so a wrong
    * byte order, sign convention, or window split in the WAV writer
    * OR the javax.sound read breaks the hash match. */
  def audioFingerprint(s: SparkSession, dir: String): DataFrame =
    audioFpFrame(s, dir)
      .select(col("media_id"),
        col("fp").bitwiseAND(lit(0xffffffffL)).as("fp_lo"),
        shiftrightunsigned(col("fp"), 32).as("fp_hi"))
      .orderBy(col("media_id"))

  /** qm07: AUDIO NEAR-DUP over the decoded-sample fingerprints — all
    * pairs within Hamming radius 10 via the generalized-pigeonhole
    * banded equi-join ([[graft.ops.Dedup.hammingNearDup]], the same
    * engine behind SimHash and image aHash pairing): exact at the
    * radius, candidate volume cut by compound block keys, never an
    * all-pairs join. The oracle verifies against brute-force Hamming
    * over the same arithmetic-derived fingerprints — pinning decode,
    * window fold, dHash, and banding end-to-end. */
  def audioNearDup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.hammingNearDup(audioFpFrame(s, dir),
        col("media_id"), col("fp"), maxHamming = 10)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming").cast("long").as("hamming"))
      .orderBy(col("media_a"), col("media_b"))

  /** Session memo of the persisted image-FINGERPRINT store probed by
    * qm08: the even-media decoded-pixel aHashes written banded at
    * radius 10 ([[graft.ops.FingerprintIndex.writeHammingIndex]] —
    * one banding pass, bpfx-partitioned). The build is priced on
    * first touch, the qd87/qd88 memo discipline. */
  private val fpIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def fpIndexPath(s: SparkSession, dir: String): String =
    fpIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_fpidx").toString
      // flag rides the banded rows at build so qm09's filtered probe
      // is the same pruned scan with one pushed predicate; qm08's
      // unfiltered probe on the attr-carrying store is identical to a
      // plain store's (StoreSpec identity)
      graft.ops.FingerprintIndex.writeHammingIndex(
        imageAHashFrame(s, dir).filter(col("media_id") % 2 === 0),
        col("media_id"), col("sh"), path, maxHamming = 10,
        attrs = Seq(pmod(col("media_id"), lit(4)).cast("int")
          .as("flag")))
      path
    })

  /** qm08: INCREMENTAL image near-dup — the odd-media batch probed
    * against the persisted even-media fingerprint store
    * ([[graft.ops.FingerprintIndex.hammingAgainstIndex]]): the batch
    * bands with the store's meta-pinned radius, its bpfx set prunes
    * the band scan, and the equi-join admits only band-matched
    * candidates — the per-arrival shape a 100 TB media corpus runs,
    * never a corpus rescan. Exact at the radius: the oracle verifies
    * against brute-force odd-vs-even Hamming over the same
    * arithmetic-derived hashes, pinning decode, fingerprint, store
    * layout, and banding end-to-end. */
  def imageFpAgainstIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.FingerprintIndex.hammingAgainstIndex(s,
        imageAHashFrame(s, dir).filter(col("media_id") % 2 === 1),
        col("media_id"), col("sh"), fpIndexPath(s, dir))
      .select(col("batch_doc").as("batch_media"),
        col("index_doc").as("index_media"),
        col("hamming").cast("long").as("hamming"))
      .orderBy(col("batch_media"), col("index_media"))

  /** qm09: the ATTRIBUTE-FILTERED incremental probe — qm08's batch
    * restricted to stored partners with flag = 0 (stored attrs ride
    * the banded rows; the predicate pushes into the same
    * bpfx-pruned scan, candidates restricted BEFORE verification —
    * the qd87/qe45 filtered-serving discipline on the fingerprint
    * family). Oracle: brute force with the index side cut to the
    * allowed subset. */
  def imageFpFilteredAgainstIndex(s: SparkSession, dir: String)
      : DataFrame =
    graft.ops.FingerprintIndex.hammingAgainstIndex(s,
        imageAHashFrame(s, dir).filter(col("media_id") % 2 === 1),
        col("media_id"), col("sh"), fpIndexPath(s, dir),
        attrFilter = Some(col("flag") === 0))
      .select(col("batch_doc").as("batch_media"),
        col("index_doc").as("index_media"),
        col("hamming").cast("long").as("hamming"))
      .orderBy(col("batch_media"), col("index_media"))

  /** qm12: RANKED top-k Hamming serving from the SAME fingerprint
    * store qm08 probes ([[graft.ops.FingerprintIndex.hammingTopK]]) —
    * each odd-media arrival's 3 best stored partners by (hamming asc,
    * media asc), pages under-filled when fewer than 3 partners exist
    * within the stored radius. One artifact now serves both the
    * set-shaped dedup gate and ranked retrieval — without this the
    * same signatures had to be written a second time into the binary
    * ANN family. Scale shape identical to qm08 (pruned band scan +
    * equi-join + bit_count) plus a bounded per-query top-k; the
    * oracle is brute-force Hamming cut at the radius, ranked with
    * the same tiebreak. */
  def imageFpTopK(s: SparkSession, dir: String): DataFrame =
    graft.ops.FingerprintIndex.hammingTopK(s,
        imageAHashFrame(s, dir).filter(col("media_id") % 2 === 1),
        col("media_id"), col("sh"), fpIndexPath(s, dir), k = 3)
      .select(col("batch_doc").as("batch_media"),
        col("index_doc").as("index_media"),
        col("hamming").cast("long").as("hamming"), col("rank"))
      .orderBy(col("batch_media"), col("rank"))

  /** The per-frame video-hash frame shared by qm13/qm14/qm10/qm11:
    * one genuine uncompressed-RGB RIFF/AVI per document id
    * ([[graft.ops.Multimodal.vidPixelAviBytes]] — 8 raw DIB frames,
    * every pixel pure integer arithmetic in (id, frame)), re-decoded
    * by the pure-JVM RIFF walk
    * ([[graft.ops.Multimodal.decodeDibFrames]] — uncompressed DIB
    * means the walk IS the decode), each frame fingerprinted by the
    * same codegen'd aHash the image family uses (applied INSIDE a
    * `transform` lambda — per-frame hashes never leave the stage).
    * The id bound keeps the oracle quadratic-in-2000, as for the
    * other media families. */
  private def videoFramesHashed(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.decodeDibFrames(
      graft.ops.Multimodal.synthVideos(
        t(s, dir, "documents").filter(col("doc_id") < 2000)
          .select(col("doc_id")), "doc_id"), "media_id")
      .select(col("media_id"),
        transform(col("frames"),
          fr => graft.functions.VectorExpressions.ahash64(fr)).as("fh"))

  /** The 64-bit TEMPORAL fingerprint per video: byte f of the packed
    * signature is byte f of frame f's aHash — per-frame locality, the
    * audio-dHash robustness argument on the time axis (a perturbed
    * frame corrupts only its own byte, ≤ 8 bits, so intra-group
    * distances stay inside the near-dup radius while cross-group
    * signatures are effectively random). A failed decode fingerprints
    * as NULL and bands nowhere. */
  private def videoTfpFrame(s: SparkSession, dir: String): DataFrame =
    videoFramesHashed(s, dir)
      .select(col("media_id"),
        (0 until graft.ops.Multimodal.VidFrames).map(f =>
            element_at(col("fh"), f + 1)
              .bitwiseAND(lit(0xffL << (8 * f))))
          .reduce(_.bitwiseOR(_)).as("tfp"))

  /** qm13: the DECODED-frame aHash per (video, frame), split into two
    * unsigned 32-bit halves — the qm04 discipline extended along the
    * time axis: the oracle re-derives every pixel of every frame, the
    * per-frame mean threshold, and both halves from the same
    * arithmetic, so a wrong chunk offset, row direction, or frame
    * order in the AVI writer OR the RIFF walk breaks the hash
    * match. */
  def videoFrameHash(s: SparkSession, dir: String): DataFrame =
    videoFramesHashed(s, dir)
      .select(col("media_id"),
        posexplode(col("fh")).as(Seq("frame_idx", "h")))
      .select(col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("h").bitwiseAND(lit(0xffffffffL)).as("fh_lo"),
        shiftrightunsigned(col("h"), 32).as("fh_hi"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Session memo of the persisted VIDEO fingerprint store probed by
    * qm14: even-media temporal fingerprints banded at radius 10 —
    * the third modality served by the same store family, no new scan
    * shape. */
  private val videoFpIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def videoFpIndexPath(s: SparkSession, dir: String): String =
    videoFpIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_vfpidx").toString
      graft.ops.FingerprintIndex.writeHammingIndex(
        videoTfpFrame(s, dir).filter(col("media_id") % 2 === 0),
        col("media_id"), col("tfp"), path, maxHamming = 10)
      path
    })

  /** qm14: INCREMENTAL video near-dup THROUGH THE FINGERPRINT STORE —
    * odd-media arrivals' temporal fingerprints probed against the
    * persisted even-media store (the qm08 shape on the third
    * modality): banded with the store's meta-pinned radius, bpfx
    * pruning, only band-matched candidates verified. Exact at the
    * radius, so the oracle is brute-force odd-vs-even Hamming over
    * the re-derived temporal fingerprints — pinning frame decode,
    * per-frame aHash, the byte-sampled packing, store layout, and
    * banding end-to-end. */
  def videoFpAgainstIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.FingerprintIndex.hammingAgainstIndex(s,
        videoTfpFrame(s, dir).filter(col("media_id") % 2 === 1),
        col("media_id"), col("tfp"), videoFpIndexPath(s, dir))
      .select(col("batch_doc").as("batch_media"),
        col("index_doc").as("index_media"),
        col("hamming").cast("long").as("hamming"))
      .orderBy(col("batch_media"), col("index_media"))

  /** qm10: CROSS-MODAL near-dup consensus over all THREE heavy
    * modalities — pairs whose image aHashes, audio fingerprints AND
    * video temporal fingerprints are each within Hamming radius 10
    * (the multimodal dedup gate a real media corpus runs: one
    * modality flagging alone is a weaker signal than all agreeing).
    * Each modality's pair set comes from its own banded equi-join;
    * the consensus joins are pair-set-sized, never corpus-sized. The
    * oracle re-derives all three fingerprint families and intersects
    * by brute force. */
  def crossModalNearDup(s: SparkSession, dir: String): DataFrame = {
    val img = graft.ops.Dedup.hammingNearDup(imageAHashFrame(s, dir),
        col("media_id"), col("sh"), maxHamming = 10)
      .select(col("doc_a"), col("doc_b"),
        col("hamming").cast("long").as("image_hamming"))
    val aud = graft.ops.Dedup.hammingNearDup(audioFpFrame(s, dir),
        col("media_id"), col("fp"), maxHamming = 10)
      .select(col("doc_a"), col("doc_b"),
        col("hamming").cast("long").as("audio_hamming"))
    val vid = graft.ops.Dedup.hammingNearDup(videoTfpFrame(s, dir),
        col("media_id"), col("tfp"), maxHamming = 10)
      .select(col("doc_a"), col("doc_b"),
        col("hamming").cast("long").as("video_hamming"))
    img.join(aud, Seq("doc_a", "doc_b"))
      .join(vid, Seq("doc_a", "doc_b"))
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("image_hamming"), col("audio_hamming"),
        col("video_hamming"))
      .orderBy(col("media_a"), col("media_b"))
  }

  /** qm11: MEDIA dup clusters — min-label propagation
    * ([[graft.ops.Dedup.dupClusters]], the qd13 machinery) over the
    * three-modality consensus pairs: the curation endpoint of the
    * content-fingerprint story ("keep one representative per media
    * family whose image, audio AND video all match"). The pair graph is
    * consensus-pair-sized, so every propagation round is an equi-join
    * + aggregation on a frame orders of magnitude below the corpus.
    * The oracle re-derives both fingerprint chains, intersects by
    * brute force, and closes transitively with a recursive CTE. */
  def crossModalClusters(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.dupClusters(
        crossModalNearDup(s, dir).select(col("media_a"), col("media_b")),
        col("media_a"), col("media_b"))
      .select(col("doc_id").as("media_id"), col("cluster"))
      .orderBy(col("media_id"))

  /** qm15: the PER-ARRIVAL MEDIA LOOP, composed end-to-end — the
    * steady-state a 100 TB media corpus actually runs, now as one
    * oracle-checked query: yesterday's corpus (even media) lives in a
    * persisted fingerprint store AND a persisted cluster map built
    * from its own banded pairs; today's arrival (odd media) probes
    * the store for its stored partners
    * ([[graft.ops.FingerprintIndex.hammingAgainstIndex]] — pruned
    * band scan, batch-sized), pairs internally
    * ([[graft.ops.Dedup.hammingNearDup]] — banded, batch-sized),
    * ingests ([[graft.ops.FingerprintIndex.appendHammingIndex]]),
    * and MERGES its pairs into the stored labels
    * ([[graft.ops.DedupIndex.mergeClusterMap]] — propagation bounded
    * by the arrival's neighborhood). Nothing in the loop re-scans
    * the stored corpus, yet the merged labels must land on the
    * full-rebuild fixpoint: the oracle is the recursive transitive
    * closure over ALL brute-force radius-10 pairs of the whole media
    * corpus. (A kept-only pipeline would insert
    * [[graft.ops.FingerprintIndex.newOnlyByHamming]] before the
    * ingest — the gate is oracle-covered at qm08's surface and
    * spec-pinned; here every arrival lands so the cluster map tracks
    * the duplicates.) */
  def mediaArrivalLoop(s: SparkSession, dir: String): DataFrame = {
    val FP = graft.ops.FingerprintIndex
    val DI = graft.ops.DedupIndex
    val sigs = imageAHashFrame(s, dir).localCheckpoint(eager = false)
    val even = sigs.filter(col("media_id") % 2 === 0)
    val odd = sigs.filter(col("media_id") % 2 === 1)
    val store =
      java.nio.file.Files.createTempDirectory("graft_maloop_fp").toString
    val map =
      java.nio.file.Files.createTempDirectory("graft_maloop_cm").toString
    FP.writeHammingIndex(even, col("media_id"), col("sh"), store,
      maxHamming = 10)
    DI.writeClusterMap(
      graft.ops.Dedup.hammingNearDup(even, col("media_id"), col("sh"),
        maxHamming = 10),
      col("doc_a"), col("doc_b"), map)
    // probePairs MATERIALIZES before the append below mutates the
    // store it scans: correctness must not hang on spark.read pinning
    // its file listing at frame-creation time (and a compacting append
    // would delete the listed files mid-query) — this loop is the
    // documented per-arrival exemplar, so the ordering is explicit
    val probePairs = FP.hammingAgainstIndex(s, odd, col("media_id"),
        col("sh"), store)
      .select(col("batch_doc").as("doc_a"),
        col("index_doc").as("doc_b"))
      .localCheckpoint()
    val innerPairs = graft.ops.Dedup.hammingNearDup(odd,
        col("media_id"), col("sh"), maxHamming = 10)
      .select(col("doc_a"), col("doc_b"))
    FP.appendHammingIndex(odd, col("media_id"), col("sh"), store)
    DI.mergeClusterMap(s, map, probePairs.unionByName(innerPairs),
      col("doc_a"), col("doc_b"))
    DI.readClusterMap(s, map)
      .select(col("doc_id").as("media_id"), col("cluster"))
      .orderBy(col("media_id"))
  }

  /** Portable simhash signatures packed hi‖lo into ONE 64-bit
    * fingerprint — disjoint bit ranges, so Hamming on the packed long
    * equals hamming(hi) + hamming(lo) and the oracle's two-half
    * arithmetic carries over exactly. */
  private def textSimhashSigs(s: SparkSession, dir: String,
      parity: Int): DataFrame =
    // doc_id < 4000 bounds the corpus like the qm-family oracles: the
    // DuckDB truth is an unbanded cross join, so without the bound its
    // cost grows quadratically with the scale factor
    graft.ops.Dedup.simhashSignaturesPortable(
        t(s, dir, "documents")
          .filter(col("doc_id") % 2 === parity && col("doc_id") < 4000),
        col("doc_id"), col("text"))
      .select(col("doc_id"),
        shiftleft(col("hi"), 32).bitwiseOR(col("lo")).as("sig"))

  /** Session memo of the persisted TEXT fingerprint store probed by
    * qd89: even-doc portable simhash signatures banded at radius 2 —
    * the store serving its original modality. */
  private val textFpIndexPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def textFpIndexPath(s: SparkSession, dir: String): String =
    textFpIndexPaths.computeIfAbsent(dir, _ => {
      val path =
        java.nio.file.Files.createTempDirectory("graft_tfpidx").toString
      graft.ops.FingerprintIndex.writeHammingIndex(
        textSimhashSigs(s, dir, parity = 0), col("doc_id"),
        col("sig"), path, maxHamming = 2)
      path
    })

  /** qd89: incremental TEXT near-dup through the persisted fingerprint
    * store — odd-doc simhash arrivals probed against the stored
    * even-doc corpus (the [[graft.ops.FingerprintIndex]] shape on the
    * modality the reference corpus actually has). The store's banding
    * (radius-2 pigeonhole over the packed 64-bit signature) differs
    * from qd06's fixed 4-block split, but both are EXACT at the
    * radius, so the oracle is plain brute force over the re-derived
    * two-half signatures — banding geometry provably doesn't leak
    * into results. */
  def textFpAgainstIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.FingerprintIndex.hammingAgainstIndex(s,
        textSimhashSigs(s, dir, parity = 1), col("doc_id"),
        col("sig"), textFpIndexPath(s, dir))
      .select(col("batch_doc"), col("index_doc"),
        col("hamming").cast("long").as("hamming"))
      .orderBy(col("batch_doc"), col("index_doc"))

  /** qd91: RANKED Hamming serving off the TEXT fingerprint store —
    * [[graft.ops.FingerprintIndex.hammingTopK]] on qd89's persisted
    * simhash store (the second modality the ranked probe serves,
    * beside qm12's image store): each odd-doc arrival's 3 best stored
    * partners by (hamming asc, doc asc) within the stored radius,
    * pages under-filled where fewer exist. Same pruned-scan shape as
    * the set probe plus the bounded per-query top-k; the oracle is
    * brute-force Hamming over the re-derived two-half signatures,
    * ranked with the same tiebreak. */
  def textFpTopK(s: SparkSession, dir: String): DataFrame =
    graft.ops.FingerprintIndex.hammingTopK(s,
        textSimhashSigs(s, dir, parity = 1), col("doc_id"),
        col("sig"), textFpIndexPath(s, dir), k = 3)
      .select(col("batch_doc"), col("index_doc"),
        col("hamming").cast("long").as("hamming"), col("rank"))
      .orderBy(col("batch_doc"), col("rank"))

  /** qd92: the MAINTENANCE SWEEP over a root of heterogeneous stores,
    * composed and oracle-closed — the nightly window a 100 TB
    * deployment actually runs, as one query: yesterday's corpus (even
    * docs) lives in a persisted text fingerprint store and a cluster
    * map of its own banded pairs; today's arrival merges its pairs in
    * (leaving a relabel-patch log pending materialization) and a
    * deletion request tombstones every tenth stored doc (pending
    * physical drop); a healthy BM25 store shares the root.
    * [[graft.ops.Maintenance.applyPlan]] must read exactly those
    * signals off [[graft.ops.StoreManifest]]'s registry, clear them
    * with each family's own compact, and leave the SERVED data on
    * closed-form truth: the post-sweep probe sees the post-delete
    * corpus, the cluster map sits on the full-rebuild fixpoint
    * (recursive closure over ALL brute radius-2 pairs — deletion
    * touches only the fingerprint store, never the labels), and a
    * re-plan finds nothing left to do. */
  def maintenanceSweep(s: SparkSession, dir: String): DataFrame = {
    val FP = graft.ops.FingerprintIndex
    val DI = graft.ops.DedupIndex
    val root =
      java.nio.file.Files.createTempDirectory("graft_msweep").toString
    val even = textSimhashSigs(s, dir, parity = 0)
      .localCheckpoint(eager = false)
    val odd = textSimhashSigs(s, dir, parity = 1)
      .localCheckpoint(eager = false)
    FP.writeHammingIndex(even, col("doc_id"), col("sig"),
      s"$root/fp", maxHamming = 2)
    DI.writeClusterMap(
      graft.ops.Dedup.hammingNearDup(even, col("doc_id"), col("sig"),
        maxHamming = 2),
      col("doc_a"), col("doc_b"), s"$root/clmap")
    graft.ops.LexIndex.writeBm25Index(
      t(s, dir, "documents").filter(col("doc_id") < 200),
      col("doc_id"), col("text"), s"$root/lex")
    // probePairs MATERIALIZES before the sweep below compacts the
    // store it scans (the qm15 ordering rule)
    val probePairs = FP.hammingAgainstIndex(s, odd, col("doc_id"),
        col("sig"), s"$root/fp")
      .select(col("batch_doc").as("doc_a"),
        col("index_doc").as("doc_b"))
      .localCheckpoint()
    val innerPairs = graft.ops.Dedup.hammingNearDup(odd,
        col("doc_id"), col("sig"), maxHamming = 2)
      .select(col("doc_a"), col("doc_b"))
    DI.mergeClusterMap(s, s"$root/clmap",
      probePairs.unionByName(innerPairs), col("doc_a"), col("doc_b"))
    FP.deleteDocs(s, s"$root/fp",
      even.filter(col("doc_id") % 10 === 0).select(col("doc_id")),
      col("doc_id"))
    // the registry's pre-sweep deletion signal — SQL-derivable, so it
    // rides in the oracle row (the patch-row count is layout-internal
    // and stays spec-side). ONE manifest walk serves both the signal
    // read and the sweep's plan (no store mutates in between — the
    // Maintenance.plan(manifest) freshness contract); the post-sweep
    // residual re-plan below still re-walks, as it must.
    val pre = graft.ops.StoreManifest.manifest(s, root)
    val tombBefore = pre.filter(col("store") === "fp")
      .select(col("tombstone_rows")).head().getLong(0)
    val swept = graft.ops.Maintenance.applyPlan(s, root, Some(pre))
    val compacted =
      swept.filter(col("action") === "compact").count()
    val residual = graft.ops.Maintenance.plan(s, root)
      .filter(col("action") =!= "none").count()
    val sweepRow = s.range(1).select(lit("sweep").as("phase"),
      lit(compacted).as("id_a"), lit(residual).as("id_b"),
      lit(tombBefore).as("val"))
    val fpRows = FP.hammingAgainstIndex(s, odd, col("doc_id"),
        col("sig"), s"$root/fp")
      .select(lit("fp_pairs").as("phase"),
        col("batch_doc").as("id_a"), col("index_doc").as("id_b"),
        col("hamming").cast("long").as("val"))
    val clRows = DI.readClusterMap(s, s"$root/clmap")
      .select(lit("cluster").as("phase"), col("doc_id").as("id_a"),
        col("cluster").as("id_b"), lit(null).cast("long").as("val"))
    sweepRow.unionByName(fpRows).unionByName(clRows)
      .orderBy(col("phase"), col("id_a"), col("id_b"))
  }

  /** The qe54 drift constant: every dimension of the appended half
    * shifts by this before normalization, tilting the arrivals into a
    * wide cap the natural-trained centroids never saw. 0.15 is the
    * measured sweet spot (sf0.1: recall 0.789 → 0.906 at flat scan
    * cost; larger shifts tighten the cap until the cram cells serve
    * it accidentally and the decay vanishes). Pinned here so the
    * DuckDB oracle re-derives the same drifted vectors. */
  private[graft] val RetrainShift = 0.15

  /** qe54: DRIFT → decay → RETRAIN-AT-COMPACT → recovery, measured
    * through the persisted store. Build the trained IVF index on the
    * natural half (even vec_ids, 16 cells, 2 Lloyd rounds), append
    * the drifted half (odd vec_ids shifted by [[RetrainShift]] per
    * dim) under the FROZEN model — the 100 TB steady state where
    * arrivals outgrow the model — then probe 100 drifted queries at
    * nProbe 4 against brute truth over the union, retrain IN the
    * store ([[graft.ops.AnnIndex.compactAnnIndex]] retrainIters — the
    * no-rebuild model refresh), and probe again. Each phase row
    * reports recall AND the average per-query candidate count (the
    * qe31 discipline): at the pinned shift the decay is the honest
    * kind — the drifted cap straddles cells whose natural centroids
    * rank badly for drifted queries, so true neighbors sit in
    * unprobed cells and recall drops ~12 points at FLAT scan cost
    * (sf0.1: 0.789 @ 865 cands → 0.906 @ 829 after retrain); at
    * larger shifts the cap crams into few cells and gets served
    * accidentally, which is why the constant is measured, not
    * guessed. Both phases are deterministic
    * end-to-end (md5-seeded sample, 1e-6-rounded Lloyd means), so
    * decay and recovery are oracle-exact rows, not a narrated
    * tendency. */
  def ivfRetrainRecall(s: SparkSession, dir: String): DataFrame =
    driftRecallRows(s, dir, sizesSub = "index",
      build = (nat, path) => graft.ops.AnnIndex.writeIvfIndex(nat,
        col("vec_id"), col("embedding"), path, nList = 16,
        refineIters = 2),
      append = (shifted, path) => graft.ops.AnnIndex.appendIvfIndex(
        shifted, col("vec_id"), col("embedding"), path),
      probe = (path, queries) => graft.ops.AnnIndex.ivfKnnJoinIndexed(
        s, path, queries, col("vec_id"), col("embedding"), k = 10,
        nProbe = 4))

  /** The shared drift fixture of qe54/qe55/qe56: the natural even
    * half, the odd half shifted +[[RetrainShift]]/dim
    * pre-normalization, their union, and the 100 drifted queries.
    * Frames are lazily checkpointed — a consumer that ignores one
    * (qe56 uses neither union nor queries) pays nothing for it. */
  private def driftFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val e = t(s, dir, "embeddings")
    val nat = e.filter(col("vec_id") % 2 === 0)
    val shifted = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => x.cast("double") + lit(RetrainShift)).as("embedding"))
      .localCheckpoint(eager = false)
    val union = nat.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double"))
          .as("embedding"))
      .unionByName(shifted)
      .localCheckpoint(eager = false)
    val queries = shifted.filter(col("vec_id") < 200)
      .localCheckpoint(eager = false)
    (nat, shifted, union, queries)
  }

  /** The shared decay/recovery driver of qe54/qe55: build on the
    * natural half, append the drifted half under the frozen model,
    * probe against brute truth over the union, retrain in the store,
    * probe again — one (phase, recall, avg_cand) row per phase. The
    * families differ only in their build/append/probe calls and the
    * stage-1 table the scan-cost column counts (`index/` for IVF,
    * `codes/` for IVF-PQ). Each phase row MATERIALIZES before the
    * store mutates under it (the probe frames are lazy over the
    * store's files). */
  private def driftRecallRows(s: SparkSession, dir: String,
      sizesSub: String,
      build: (DataFrame, String) => Unit,
      append: (DataFrame, String) => Unit,
      probe: (String, DataFrame) => DataFrame): DataFrame = {
    val (nat, shifted, union, queries) = driftFixture(s, dir)
    val path =
      java.nio.file.Files.createTempDirectory("graft_retr").toString
    build(nat, path)
    append(shifted, path)
    val truth = Similarity.knnJoin(union, col("vec_id"),
        col("embedding"), queries, col("vec_id"), col("embedding"),
        k = 10)
      .select(col("query_id"), col("vec_id")).localCheckpoint()
    def phaseRow(phase: String): DataFrame = {
      // the retrain flips the store to a new GENERATION root — read
      // the model/scan-cost tables where the probes read them
      val root = graft.ops.AnnIndex.currentRoot(s, path)
      val cents = s.read.parquet(s"$root/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy { case (cell, _) => cell }
      // avg_cand folds DRIVER-side from two bounded collects — the
      // per-cell sizes (≤ nList rows) and the probed (query, cell)
      // pairs (|queries| × nProbe rows); the former inner join +
      // aggregate + crossJoin cost ~4 exchanges per phase on frames
      // this small. The cell ranking itself stays IN Spark
      // (probeCellRanks — the oracle-pinned dot/tiebreak arithmetic);
      // only the trivial join-sum-divide-round moves, replicated
      // bit-exactly: long sum over the size-matched pairs, distinct
      // query count over the same, double divide, Spark's own Round
      // (via round(lit)) for the HALF_UP grid.
      val sizeByCell = s.read.parquet(s"$root/$sizesSub")
        .groupBy(col("cell")).agg(count(lit(1)).as("n_in_cell"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val probed = Similarity.probeCellRanks(queries, col("vec_id"),
          col("embedding"), cents)
        .filter(col("crk") <= 4)
        .select(col("query_id"), col("cell")).collect()
        .filter(r => sizeByCell.contains(r.getInt(1)))
      val candSum = probed.map(r => sizeByCell(r.getInt(1))).sum
      val nProbeQ = probed.map(_.getLong(0)).distinct.length
      val avgCand = candSum.toDouble / nProbeQ.toDouble
      recallRow(truth, probe(path, queries))
        .select(lit(phase).as("phase"), col("k"), col("n_queries"),
          col("n_hit"), col("recall"),
          round(lit(avgCand), 4).as("avg_cand"))
        .localCheckpoint()
    }
    val before = phaseRow("before_retrain")
    graft.ops.AnnIndex.compactAnnIndex(s, path,
      retrainIters = Some(2))
    val after = phaseRow("after_retrain")
    before.unionByName(after).orderBy(col("phase"))
  }

  /** qe55: the qe54 drift fixture on the SECOND trained family,
    * measured through the serving path that actually runs at 100 TB —
    * IVF-PQ ADC + exact rerank ([[graft.ops.AnnIndex
    * .ivfPqKnnJoinIndexed]], nProbe 4, rerank 100). Build on the
    * natural half (16 cells, 16x64 residual codes, 2 Lloyd rounds),
    * append the drifted half under the FROZEN model (frozen
    * centroids assign, frozen codebook encodes), probe 100 drifted
    * queries against brute truth over the union, retrain IN the
    * store (`compactAnnIndex(retrainIters)` — centroids AND the
    * residual codebook recomputed from the stored full-precision
    * vectors, codes re-encoded), probe again. The decay mechanism is
    * the same cell-miss as qe54 — rerank repairs ADC noise inside
    * the probed cells but cannot recover neighbors in unprobed
    * ones — so recall decays and recovers at flat scan cost, and the
    * oracle re-derives BOTH phases end to end: two Lloyd chains, two
    * residual grids, two md5-sampled codebooks, two per-query
    * exact-integer ADC rankings with their reranks. */
  def ivfPqRetrainRecall(s: SparkSession, dir: String): DataFrame =
    driftRecallRows(s, dir, sizesSub = "codes",
      build = (nat, path) => graft.ops.AnnIndex.writeIvfPqIndex(nat,
        col("vec_id"), col("embedding"), path, nList = 16,
        numSub = 16, codebookSize = 64, refineIters = 2),
      append = (shifted, path) => graft.ops.AnnIndex.appendIvfPqIndex(
        shifted, col("vec_id"), col("embedding"), path),
      probe = (path, queries) => graft.ops.AnnIndex
        .ivfPqKnnJoinIndexed(s, path, queries, col("vec_id"),
          col("embedding"), k = 10, nProbe = 4, rerank = 100))

  /** qe56: the DRIFT MONITOR the retrain loop needs — qe54/qe55
    * measured that drift decays recall and retrain recovers it, but
    * those rows need brute-force truth; production arrivals don't
    * have truth labels. [[graft.ops.AnnIndex.assignmentDrift]]
    * aggregates the spherical quantization error (1 − best centroid
    * dot) of a batch against the stored corpus's own error: an
    * in-distribution control batch (natural even docs) reads ratio
    * ≈ 1, the drifted batch (the qe54 shift) reads measurably above
    * — the label-free signal that says "run
    * `compactAnnIndex(retrainIters)` now". Both rows re-derive
    * externally: trained centroids from the Lloyd chain, per-vector
    * max dot, 1e-6-floored error sums as exact integers. */
  /** qe57: the VECTOR steady-state arrival loop composed as one row —
    * qm15's twin on the trained-vector side, exercising together what
    * qe54/qe55/qe56 pinned separately: an arrival batch (the drifted
    * odd half + 20 verbatim re-ingests of stored docs) runs the
    * near-dup GATE (the [[graft.streaming.StreamingIngest
    * .vectorNearDupIngestTo]] batch logic: in-batch keep-lowest-id on
    * shared 16-bit sign blocks verified at exact rounded cosine
    * ≥ 0.99, then the same screen against the stored gate index — the
    * re-ingests match themselves at cosine 1.0 and drop), survivors
    * INGEST into both stores (gate bits/vectors + the trained IVF-PQ
    * serving store under its frozen model, folding the memoized drift
    * state additively), the MONITOR reads one sidecar row + one batch
    * scan, the ratio trips the threshold and the conditional RETRAIN
    * flips a new generation, and the PROBE serves the drifted queries
    * through ADC + exact rerank at fresh-build recall. Four rows out —
    * gate counts, the monitor row, the retrain decision + generation,
    * the recall row — every number re-derived in closed-form SQL
    * (sign-block gate included); the monitor row in particular
    * re-verifies the ADDITIVE sidecar fold against an independent
    * whole-corpus error sum. */
  def vectorArrivalLoop(s: SparkSession, dir: String): DataFrame = {
    val AI = graft.ops.AnnIndex
    val (nat, shifted, _, queries) = driftFixture(s, dir)
    val serving = java.nio.file.Files
      .createTempDirectory("graft_valoop_pq").toString
    val gate = java.nio.file.Files
      .createTempDirectory("graft_valoop_bin").toString
    AI.writeIvfPqIndex(nat, col("vec_id"), col("embedding"), serving,
      nList = 16, numSub = 16, codebookSize = 64, refineIters = 2)
    AI.writeBinaryIndex(nat, col("vec_id"), col("embedding"), gate)
    val natD = nat.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val arrival = natD.filter(col("vec_id") < 40).unionByName(shifted)
      .localCheckpoint(eager = false)
    // --- the gate (vectorNearDupIngestTo's per-batch logic) ---
    val sig = arrival.select(col("vec_id"),
        Similarity.l2Normalize(col("embedding")).as("v"),
        Similarity.signBits(col("embedding"), 0).as("lo"),
        Similarity.signBits(col("embedding"), 32).as("hi"))
      .localCheckpoint()
    def blocksOf(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        posexplode(Similarity.signBlockArray(col("lo"), col("hi")))
          .as(Seq("bidx", "bval")))
    val bBlocks = blocksOf(sig, "vec_id")
    val inDup = bBlocks.as("a")
      .join(bBlocks.as("b"),
        col("a.bidx") === col("b.bidx") &&
          col("a.bval") === col("b.bval") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
      .join(sig.select(col("vec_id").as("id_a"), col("v").as("va")),
        "id_a")
      .join(sig.select(col("vec_id").as("id_b"), col("v").as("vb")),
        "id_b")
      .filter(round(Similarity.dot(col("va"), col("vb")), 4) >= 0.99)
      .select(col("id_b").as("vec_id")).distinct()
    val solo = sig.join(inDup, Seq("vec_id"), "left_anti")
    val iBlocks = s.read.parquet(s"$gate/bits")
      .select(col("vec_id").as("idx_id"),
        posexplode(Similarity.signBlockArray(col("lo"), col("hi")))
          .as(Seq("bidx", "bval")))
    val hit = blocksOf(solo, "vec_id")
      .join(iBlocks, Seq("bidx", "bval"))
      .select(col("vec_id"), col("idx_id")).distinct()
      .join(solo.select(col("vec_id"), col("v").as("bv")), "vec_id")
      .join(s.read.parquet(s"$gate/vectors")
        .select(col("vec_id").as("idx_id"), col("v").as("iv")),
        "idx_id")
      .filter(round(Similarity.dot(col("bv"), col("iv")), 4) >= 0.99)
      .select(col("vec_id")).distinct()
    val fresh = solo.join(hit, Seq("vec_id"), "left_anti")
      .localCheckpoint() // probe once: the ingests mutate both stores
    val nArrival = arrival.count()
    val nSurv = fresh.count()
    // --- ingest: gate parts first (the streaming crash order), then
    // the serving store (raw vectors — the append normalizes, keeping
    // stored v == l2Normalize(raw) for the retrain identity) ---
    fresh.select(col("vec_id"), col("v"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("append").parquet(s"$gate/vectors")
    fresh.select(col("vec_id"), col("lo"), col("hi"))
      .write.mode("append").parquet(s"$gate/bits")
    val freshRaw = arrival
      .join(fresh.select("vec_id"), Seq("vec_id"), "left_semi")
      .localCheckpoint(eager = false)
    AI.appendIvfPqIndex(freshRaw, col("vec_id"), col("embedding"),
      serving)
    // --- monitor (sidecar + one batch scan) → conditional retrain ---
    val mon = AI.assignmentDrift(s, serving, freshRaw, col("vec_id"),
      col("embedding")).head()
    val retrained = AI.retrainIfDrifted(s, serving, freshRaw,
      col("vec_id"), col("embedding"), maxRatio = 1.1,
      retrainIters = 2)
    val gen = AI.currentGeneration(s, serving)
    // --- probe through the serving path, recall vs brute truth over
    // the live corpus (stored natural half + ingested survivors) ---
    val truth = Similarity.knnJoin(natD.unionByName(freshRaw),
        col("vec_id"), col("embedding"), queries, col("vec_id"),
        col("embedding"), k = 10)
      .select(col("query_id"), col("vec_id"))
    val rec = recallRow(truth, AI.ivfPqKnnJoinIndexed(s, serving,
      queries, col("vec_id"), col("embedding"), k = 10, nProbe = 4,
      rerank = 100)).head()
    import s.implicits._
    Seq(
      ("a_gate", nArrival, nArrival - nSurv, Option(nSurv),
        Option.empty[Double]),
      ("b_monitor", mon.getLong(0), mon.getLong(1),
        Option(mon.getLong(3)), Option(mon.getDouble(4))),
      ("c_retrain", if (retrained) 1L else 0L, gen,
        Option.empty[Long], Option.empty[Double]),
      ("d_probe", rec.getLong(1), rec.getLong(2), Option.empty[Long],
        Option(rec.getDouble(3))))
      .toDF("step", "m1", "m2", "m3", "v")
      .orderBy(col("step"))
  }

  /** qe58: the drift fixture on the OPT-IN retrainable plain-PQ
    * family — [[graft.ops.AnnIndex.writePqIndex]] `keepVectors =
    * true`, the flag that turns the terminal-by-design family into a
    * full lifecycle citizen. Build the PQ store on the natural half
    * (8×16 codebook — an md5 SAMPLE, not a Lloyd chain, so the model
    * is codebook fit only), read the MONITOR at arrival time (the
    * number the loop acts on: the drifted batch's exact-integer PQ
    * residual against the natural store's memoized sidecar), append
    * the drifted half under the frozen codebook, probe 100 drifted
    * queries' ADC top-10 against brute cosine truth over the union,
    * RETRAIN in the store (`compactAnnIndex(retrainIters)` — codebook
    * re-drawn from the stored q4 vectors by the identical md5
    * ordering a fresh union build runs, generation-flipped), and
    * probe + monitor again. Two rows out: (phase, recall,
    * drift_ratio) — the before ratio is the arrival-time trigger
    * signal, the after ratio the quiesce signal (store = union,
    * codebook = union ⇒ ≈ 1); both phases deterministic end-to-end,
    * so the DuckDB oracle re-derives BOTH codebook samples, both
    * full-corpus encodes, both per-query exact-integer ADC rankings
    * and both residual-error ratios in closed form. */
  def pqRetrainRecall(s: SparkSession, dir: String): DataFrame = {
    val AI = graft.ops.AnnIndex
    val (nat, shifted, union, queries) = driftFixture(s, dir)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqretr").toString
    AI.writePqIndex(nat, col("vec_id"), col("embedding"), path,
      numSub = 8, codebookSize = 16, keepVectors = true)
    // arrival-time monitor read — BEFORE the batch ingests (store =
    // natural half, codebook natural): one sidecar read + one batch
    // scan, the retrainIfDrifted steady-state cost
    val ratioBefore = AI.assignmentDrift(s, path, shifted,
        col("vec_id"), col("embedding"))
      .select(col("drift_ratio")).localCheckpoint()
    AI.appendPqIndex(shifted, col("vec_id"), col("embedding"), path)
    val truth = Similarity.knnJoin(union, col("vec_id"),
        col("embedding"), queries, col("vec_id"), col("embedding"),
        k = 10)
      .select(col("query_id"), col("vec_id")).localCheckpoint()
    // each phase row materializes before the store mutates under it
    def phaseRow(phase: String, ratio: DataFrame): DataFrame =
      recallRow(truth, AI.pqKnnJoinIndexed(s, path, queries,
          col("vec_id"), col("embedding"), k = 10))
        .crossJoin(broadcast(ratio))
        .select(lit(phase).as("phase"), col("k"), col("n_queries"),
          col("n_hit"), col("recall"), col("drift_ratio"))
        .localCheckpoint()
    val before = phaseRow("before_retrain", ratioBefore)
    AI.compactAnnIndex(s, path, retrainIters = Some(1))
    val after = phaseRow("after_retrain",
      AI.assignmentDrift(s, path, shifted, col("vec_id"),
        col("embedding")).select(col("drift_ratio")))
    before.unionByName(after).orderBy(col("phase"))
  }

  def ivfDriftMonitor(s: SparkSession, dir: String): DataFrame = {
    val (nat, shifted, _, _) = driftFixture(s, dir)
    val path =
      java.nio.file.Files.createTempDirectory("graft_driftmon").toString
    graft.ops.AnnIndex.writeIvfIndex(nat, col("vec_id"),
      col("embedding"), path, nList = 16, refineIters = 2)
    def row(label: String, batch: DataFrame): DataFrame =
      graft.ops.AnnIndex.assignmentDrift(s, path, batch,
          col("vec_id"), col("embedding"))
        .select(lit(label).as("batch"), col("n_stored"),
          col("stored_sum_e6"), col("n_batch"), col("batch_sum_e6"),
          col("drift_ratio"))
    row("control", nat.filter(col("vec_id") < 400))
      .unionByName(row("drifted",
        shifted.filter(col("vec_id") < 400)))
      .orderBy(col("batch"))
  }
}
