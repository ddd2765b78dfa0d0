package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sampling, Similarity, TextAnalysis}

/** Executable assertions over PHYSICAL PLAN SHAPE — the properties that
  * decide whether an operator survives a 100 TB scale-up. Each test pins
  * one plan invariant so a refactor that silently de-optimizes (drops a
  * pushdown, loses a broadcast, re-introduces a global window) fails CI
  * instead of failing on a cluster. */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters reach the parquet scan (PushedFilters non-empty)") {
    val p = plan(SparkEntry.queries("q02_revenue_filter")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(2000))
  }

  test("column pruning: a 2-column projection reads a 2-column schema") {
    val p = plan(Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity")))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      p.take(2000))
  }

  test("dimension joins broadcast (no shuffle of the fact side per dim)") {
    val p = plan(SparkEntry.queries("q03_revenue_by_nation")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("top-k rank compiles to TakeOrderedAndProject, never a global window") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    // the k-row selection stage (pre-checkpoint: the final top-k plan
    // hides it behind topKRanked's localCheckpoint)
    val scored = Similarity.cosineScores(e, col("vec_id"),
      col("embedding"), q)
    val p1 = plan(scored.orderBy(col("cos").desc, col("vec_id")).limit(10))
    assert(p1.contains("TakeOrderedAndProject"), p1.take(2000))
    // and the full query never plans a window
    val p = plan(Similarity.bruteForceTopK(e, col("vec_id"),
      col("embedding"), q, k = 10))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("deterministic sampling and text profiling are shuffle-free") {
    val docs = Tables.load(spark, sf, "documents")
    val sampled = plan(docs.filter(Sampling.keep(col("doc_id"), 0.5)))
    assert(!sampled.contains("Exchange"), sampled.take(2000))
    val stats = plan(TextAnalysis.textStats(docs, col("doc_id"), col("text")))
    assert(!stats.contains("Exchange"), stats.take(2000))
  }

  test("random projection is one narrow map stage (no shuffle, no join)") {
    val embs = Tables.load(spark, sf, "embeddings")
    val p = plan(Similarity.randomProjection(embs, col("vec_id"),
      col("embedding"), outDims = 16, inDims = 64))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("knnJoin aggregates map-side (ObjectHashAggregate, no window, no sort of the product)") {
    val e = Tables.load(spark, sf, "embeddings")
    val p = plan(Similarity.knnJoin(e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 3), col("vec_id"), col("embedding"), k = 5))
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    assert(p.contains("partial_topk_agg"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(3000))
  }

  test("IVF-PQ multi-query probe: pruned codes broadcast-join the tables, bounded top-k, no window") {
    val e = Tables.load(spark, sf, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("ivfpqplan").toString
    graft.ops.AnnIndex.writeIvfPqIndex(e, col("vec_id"),
      col("embedding"), path, nList = 8, numSub = 8, codebookSize = 8,
      refineIters = 0)
    val queries = e.filter(col("vec_id") < 3)
    val qRows = queries.select(col("vec_id").cast("long"),
        Similarity.l2Normalize(col("embedding"))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // stage 1: the stored codes prune to the probed cells and join the
    // per-(query, cell) distance tables by BROADCAST — the codes never
    // shuffle; the shortlist top-k is a bounded map-side aggregate
    val p = plan(graft.ops.AnnIndex.ivfPqShortlistFrame(spark, path,
      qRows, nProbe = 3, rerank = 10))
    assert(p.matches("(?s).*PartitionFilters: \\[.*cell.*"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(p.contains("partial_topk_agg"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
    // stage 2: the collected shortlist must reach the full-precision
    // vectors/ scan as a LITERAL pushed filter (row-group min/max
    // pruning fires only on literals — a broadcast join would read
    // every row group of the corpus table at float width)
    val p2 = plan(graft.ops.AnnIndex.ivfPqKnnJoinIndexed(spark, path,
      queries, col("vec_id"), col("embedding"), k = 5, nProbe = 3,
      rerank = 10))
    assert(p2.matches("(?s).*PushedFilters: \\[In\\(vec_id.*"), p2.take(4000))
    assert(p2.contains("partial_topk_agg"), p2.take(4000))
    assert(!p2.contains("Window"), p2.take(4000))
    assert(!p2.contains("SortMergeJoin") && !p2.contains("ShuffledHashJoin"),
      p2.take(4000))
  }

  test("attr-filtered IVF-PQ probe: predicate pushed into the SAME pruned stage-1 scan") {
    val e = Tables.load(spark, sf, "embeddings")
    val path =
      java.nio.file.Files.createTempDirectory("ivfpqattrplan").toString
    graft.ops.AnnIndex.writeIvfPqIndex(e, col("vec_id"),
      col("embedding"), path, nList = 8, numSub = 8, codebookSize = 8,
      refineIters = 0,
      attrs = Seq(pmod(col("vec_id"), lit(4)).cast("int").as("lang")))
    val qRows = e.filter(col("vec_id") < 3)
      .select(col("vec_id").cast("long"),
        Similarity.l2Normalize(col("embedding"))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val p = plan(graft.ops.AnnIndex.ivfPqShortlistFrame(spark, path,
      qRows, nProbe = 3, rerank = 10,
      attrFilter = Some(col("lang") === 1)))
    // filtered vector search = the SAME pruned scan, one more pushed
    // predicate: cell partition pruning AND the attribute filter land
    // on the codes read together — no doc-table join, no second scan
    assert(p.matches("(?s).*PartitionFilters: \\[.*cell.*"), p.take(3000))
    assert(p.matches("(?s).*PushedFilters: \\[.*lang.*"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin") &&
      !p.contains("ShuffledHashJoin"), p.take(3000))
  }

  test("filtered hybrid RRF: both halves' predicates ride their own pruned index scans; no corpus join-back") {
    val docs = Tables.load(spark, sf, "documents")
    val e = Tables.load(spark, sf, "embeddings")
    val bm25Path =
      java.nio.file.Files.createTempDirectory("hybbm25attr").toString
    graft.ops.LexIndex.writeBm25Index(docs, col("doc_id"), col("text"),
      bm25Path, attrs = Seq(pmod(col("doc_id"), lit(2)).cast("int")
        .as("flag")))
    val pqPath =
      java.nio.file.Files.createTempDirectory("hybpqattr").toString
    graft.ops.AnnIndex.writeIvfPqIndex(e, col("vec_id"),
      col("embedding"), pqPath, nList = 8, numSub = 8, codebookSize = 8,
      refineIters = 0, attrs = Seq(pmod(col("vec_id"), lit(4))
        .cast("int").as("lang")))
    // query feeds as LOCAL frames, so every FileScan in the fused plan
    // is an index-table read — provable absence of a corpus join-back
    import spark.implicits._
    val qTerms = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(slice(TextAnalysis.tokens(col("text")), 1, 3)).as("term"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .toDF("query_id", "term")
    val qVecs = e.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .toDF("vec_id", "embedding")
    val lex = graft.ops.LexIndex.bm25KnnJoinIndexed(spark, bm25Path,
        qTerms, col("query_id"), col("term"), k = 5,
        attrFilter = Some(col("flag") === 0))
      .select(col("query_id"), col("doc_id").as("id"),
        col("rank").as("rank_lex"))
    val vec = graft.ops.AnnIndex.ivfPqKnnJoinIndexed(spark, pqPath,
        qVecs, col("vec_id"), col("embedding"), k = 5, nProbe = 3,
        rerank = 10, attrFilter = Some(col("lang").isin(0, 2)))
      .select(col("query_id"), col("vec_id").as("id"),
        col("rank").as("rank_vec"))
    val fused = lex.join(vec, Seq("query_id", "id"), "full_outer")
    val p = plan(fused)
    // lexical half: term-prefix partition pruning AND the attribute
    // predicate pushed on the SAME postings scan (the filter now sits
    // above the df join — Catalyst must still push it to parquet)
    assert(p.matches("(?s).*PartitionFilters: \\[.*tpfx.*"), p.take(4000))
    assert(p.matches("(?s).*PushedFilters: \\[.*flag.*"), p.take(4000))
    // vector half (stage 1 collected eagerly; its own pin is the
    // attr-filtered IVF-PQ test): the rerank reads by literal IN
    assert(p.matches("(?s).*PushedFilters: \\[In\\(vec_id.*"), p.take(4000))
    // no corpus join-back: every file read in the fused plan is one of
    // the two index stores (queries arrived as local relations)
    val fileScans = "FileScan [^\\n]*".r.findAllIn(p).toSeq
    assert(fileScans.nonEmpty && fileScans.forall(l =>
      l.contains("hybbm25attr") || l.contains("hybpqattr")), fileScans)
    assert(fused.count() > 0)
  }

  test("LSH multi-query probe: bucket-pruned scan, broadcast fan-out, bounded top-k, no window") {
    val e = Tables.load(spark, sf, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("lshplan").toString
    graft.ops.AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"),
      path, numPlanes = 6)
    val queries = e.filter(col("vec_id") < 3)
    val probe = graft.ops.AnnIndex.lshKnnJoinIndexed(spark, path,
      queries, col("vec_id"), col("embedding"), k = 5, probeFlips = 1)
    val p = plan(probe)
    // the probed-bucket union is ONE static partition filter; the
    // (query, bucket) pairs and query vectors ride broadcasts; the
    // per-query top-k is a bounded map-side aggregate
    assert(p.matches("(?s).*PartitionFilters: \\[.*bucket.*"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(p.contains("partial_topk_agg"), p.take(3000))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      p.take(3000))
    // and every query's rows equal its single-query probe exactly
    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = (0L until 3L).flatMap { qid =>
      val q = e.filter(col("vec_id") === qid)
        .select(graft.ops.Similarity.l2Normalize(col("embedding")))
      graft.ops.AnnIndex.queryLshIndex(spark, path, q, k = 5,
          probeFlips = 1)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("int8/binary multi-query indexed probes: literal-IN rerank; all-candidate probe == brute truth") {
    val e = Tables.load(spark, sf, "embeddings")
    val n = e.count().toInt
    val queries = e.filter(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // two-stage exactness identity: a shortlist covering the corpus
    // must reproduce brute-force truth exactly, through the stored
    // artifact
    val truth = rows(Similarity.knnJoin(e, col("vec_id"),
      col("embedding"), queries, col("vec_id"), col("embedding"), k = 5))
    val qpath = java.nio.file.Files.createTempDirectory("q8batch").toString
    graft.ops.AnnIndex.writeQuantizedIndex(e, col("vec_id"),
      col("embedding"), qpath)
    val gotQ = graft.ops.AnnIndex.quantizedKnnJoinIndexed(spark, qpath,
      queries, col("vec_id"), col("embedding"), k = 5, rerank = n)
    val pq = plan(gotQ)
    // stage 2 reads only the collected shortlist (literal pushed IN on
    // the vec_id-sorted vectors table); per-query top-k stays bounded
    assert(pq.matches("(?s).*PushedFilters: \\[In\\(vec_id.*"), pq.take(4000))
    assert(pq.contains("partial_topk_agg"), pq.take(4000))
    assert(!pq.contains("Window") && !pq.contains("SortMergeJoin"),
      pq.take(4000))
    assert(rows(gotQ) == truth && truth.nonEmpty)
    val bpath = java.nio.file.Files.createTempDirectory("binbatch").toString
    graft.ops.AnnIndex.writeBinaryIndex(e, col("vec_id"),
      col("embedding"), bpath)
    val gotB = graft.ops.AnnIndex.binaryKnnJoinIndexed(spark, bpath,
      queries.select(col("vec_id")), col("vec_id"), k = 5, shortlist = n)
    val pb = plan(gotB)
    assert(pb.matches("(?s).*PushedFilters: \\[In\\(vec_id.*"), pb.take(4000))
    assert(!pb.contains("Window") && !pb.contains("SortMergeJoin"),
      pb.take(4000))
    assert(rows(gotB) == truth)
  }

  test("PQ multi-query ADC: one codes scan, broadcast tables, bounded top-k, no window") {
    val e = Tables.load(spark, sf, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("pqbatch").toString
    graft.ops.AnnIndex.writePqIndex(e, col("vec_id"), col("embedding"),
      path)
    val probe = graft.ops.AnnIndex.pqKnnJoinIndexed(spark, path,
      e.filter(col("vec_id") < 3), col("vec_id"), col("embedding"), k = 5)
    val p = plan(probe)
    assert("/codes".r.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("partial_topk_agg"), p.take(3000))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      p.take(3000))
    // per-query equality against the single-query ADC probe
    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (0L until 3L).flatMap { qid =>
      graft.ops.AnnIndex.queryPqIndex(spark, path,
          e.filter(col("vec_id") === qid).select(col("embedding")), k = 5)
        .collect().map(r => (qid, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("dedup-index probe prunes to the batch's fingerprint partitions") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val path = java.nio.file.Files.createTempDirectory("dedupidx").toString
    graft.ops.DedupIndex.writeExactIndex(docs, col("doc_id"), col("text"),
      path)
    // one-doc batch -> the index scan must carry a pfx partition filter
    val batch = Seq((9999L, "a single probe document")).toDF("doc_id", "text")
    val probe = graft.ops.DedupIndex.newOnly(spark, batch, col("doc_id"),
      col("text"), path)
    val p = plan(probe)
    assert(p.contains("PartitionFilters: [pfx#") ||
      p.matches("(?s).*PartitionFilters: \\[.*pfx.*"), p.take(3000))
  }

  test("split assignment and shard balance stay narrow + single-shuffle") {
    val docs = Tables.load(spark, sf, "documents")
    // split label is a pure codegen'd compare: no shuffle at all
    val p1 = plan(docs.select(col("doc_id"), Sampling.splitAssign(
      col("doc_id"), Seq("train" -> 0.9, "test" -> 0.1)).as("s")))
    assert(!p1.contains("Exchange"), p1.take(2000))
    // balance is ONE hash-agg shuffle (partial + final), no sort
    val p2 = plan(graft.ops.Sharding.balance(docs, col("doc_id"),
      col("n_chars"), 16))
    assert(p2.split("Exchange").length == 2, p2.take(3000))
    assert(p2.contains("partial_count") || p2.contains("partial"),
      p2.take(3000))
  }

  test("budgetSelect shuffles once on the group key, never globally") {
    val docs = Tables.load(spark, sf, "documents")
    val p = plan(graft.ops.Packing.budgetSelect(docs, col("source"),
      col("doc_id"), col("n_chars"), TextAnalysis.tokenCount(col("text")),
      budget = 20000L, tieBreak = col("doc_id")))
    // exactly one exchange: hashpartitioning on the group key
    assert(p.split("Exchange hashpartitioning").length == 2, p.take(3000))
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
  }

  test("heavy hitters aggregates map-side (ObjectHashAggregate partials)") {
    val docs = Tables.load(spark, sf, "documents")
    val p = plan(docs
      .select(explode(graft.ops.Decontaminate.ngramsAll(col("text"), 3))
        .as("g"))
      .agg(graft.functions.HeavyHittersAggregate
        .heavyHitters(col("g"), 63).as("hh")))
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    assert(p.contains("partial_heavyhitters_agg"), p.take(3000))
    assert(!p.contains("Window") && !p.contains("Sort"), p.take(3000))
  }

  test("linear scoring broadcasts the model (fact side never re-shuffles for the join)") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val weights = Seq(("the", 1L), ("a", -1L)).toDF("w", "weight")
    val p = plan(TextAnalysis.linearScore(docs, col("doc_id"),
      col("text"), weights))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("epoch shuffle: sharded ranking, no single-partition global sort") {
    val docs = Tables.load(spark, sf, "documents")
    val p = plan(Sampling.epochShuffle(docs, col("doc_id"), "ep7"))
    // rows shuffle by the shard prefix (a hash exchange), never into ONE
    // range/single partition the way a global row_number would
    assert(p.contains("hashpartitioning(_shard"), p.take(3000))
    assert(!p.contains("rangepartitioning"), p.take(3000))
    assert(!p.contains("SinglePartition"), p.take(3000))
    // the 4096-row offset side broadcasts
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("weighted sample compiles to TakeOrderedAndProject, upsample stays narrow") {
    val docs = Tables.load(spark, sf, "documents")
    val pw = plan(Sampling.weightedSample(docs, col("doc_id"),
      col("n_chars"), k = 10))
    assert(pw.contains("TakeOrderedAndProject"), pw.take(2000))
    assert(!pw.contains("Window"), pw.take(2000))
    val pu = plan(Sampling.epochUpsample(docs, col("doc_id"),
      col("source"), Seq("src0" -> 2.5), 1.0))
    assert(!pu.contains("Exchange"), pu.take(2000))
  }

  test("centroid outliers: tiny centroid side broadcasts, corpus scored in one narrow pass") {
    val embs = Tables.load(spark, sf, "embeddings")
    val p = plan(Similarity.centroidOutliers(embs, col("vec_id"),
      col("label"), col("embedding"), 0.0))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("binary / matryoshka retrieval: TakeOrdered shortlist, broadcast semi-join rerank, no global window") {
    val embs = Tables.load(spark, sf, "embeddings")
    // stage 1 must be a distributed TakeOrderedAndProject over the
    // narrow signature/prefix scan — never a global sort or window
    val pb = plan(Similarity.binaryShortlist(embs, col("vec_id"),
      col("embedding"), qlo = 0L, qhi = 0L, shortlist = 20))
    assert(pb.contains("TakeOrderedAndProject"), pb.take(3000))
    assert(!pb.contains("Window"), pb.take(3000))
    val qp = embs.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(slice(col("embedding"), 1, 8))
        .as("qp"))
    val pm = plan(Similarity.matryoshkaShortlist(embs, col("vec_id"),
      col("embedding"), qp, prefixDims = 8, shortlist = 20))
    assert(pm.contains("TakeOrderedAndProject"), pm.take(3000))
    assert(!pm.contains("Window"), pm.take(3000))
    // stage 2: the full-precision read is a broadcast semi-join prune
    val short = Similarity.binaryShortlist(embs, col("vec_id"),
      col("embedding"), qlo = 0L, qhi = 0L, shortlist = 20)
    val pr = plan(Similarity.shortlistPrune(embs, col("vec_id"), short))
    assert(pr.contains("BroadcastHashJoin") && pr.contains("LeftSemi"),
      pr.take(3000))
  }

  test("HLL native aggregate partial-aggregates map-side (ObjectHashAggregate)") {
    val docs = Tables.load(spark, sf, "documents")
    val toks = docs.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val p = plan(graft.ops.Sketches.hllDistinctFast(toks, col("source"),
      col("w")))
    // one object-hash aggregate pair (partial before the exchange), so
    // only 256-byte buffers per (group, partition) cross the shuffle
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("CMS probe broadcasts the sketch; the probe side never shuffles") {
    val docs = Tables.load(spark, sf, "documents")
    val words = docs.select(explode(TextAnalysis.tokens(col("text")))
      .as("w"))
    val sketch = graft.ops.Sketches.cmsSketch(words, col("w"), 1024)
    import spark.implicits._
    val probes = Seq("the", "scan").toDF("term")
    val p = plan(graft.ops.Sketches.cmsEstimate(sketch, probes,
      col("term"), 1024))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("z-order codes are one narrow map + TakeOrdered (no exchange before the top-k)") {
    val p = plan(SparkEntry.queries("qv21_zorder_codes")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      p.take(3000))
  }

  test("pair stage expands in-partition: no join, pair agg fed by the block repartition") {
    // The group-pairs rewrite must keep the expansion OUT of the
    // shuffle: posting-list agg → repartition by block → nested
    // explodes → complete-combined pair agg. A join re-appearing here
    // means the self-join shape (one shuffled row per token-share
    // event) regressed.
    val pairs = ops.Dedup.ngramJaccardPairs(
      Tables.load(spark, sf, "documents"), col("doc_id"), col("source"),
      col("text"), threshold = 0.8, maxDocFreq = 256)
    val p = plan(pairs)
    assert(p.contains("Generate explode"), p.take(3000))
    // the old self-join shape pinned a shuffled-hash join of the
    // posting against itself; the rewrite must not bring it back
    // (sizes attach via ordinary small joins — those may plan as any
    // join type pre-AQE, so only the posting self-join hint's
    // signature is prohibited)
    assert(!p.contains("ShuffledHashJoin"), p.take(3000))
    assert(p.contains("REPARTITION_BY_NUM"), p.take(3000))
  }

  test("hot-block pair stage: a constant block salts into sub-blocks, output unchanged") {
    // The degenerate blocking key (every doc in ONE block) must not
    // serialize the expansion: with the posting-mass bound forced low,
    // the repartition key carries the token-hash salt, and the pair
    // output is identical to the unsalted plan (intersection counts
    // reassemble across sub-blocks exactly).
    val docs = Tables.load(spark, sf, "documents")
    // df cap above the corpus size: with every doc in ONE block even
    // mid-frequency tokens exceed a small cap and the fixture would
    // test an empty pair set
    def pairs(bound: Long) = ops.Dedup.ngramJaccardPairs(docs,
      col("doc_id"), lit("one"), col("text"), threshold = 0.5,
      maxDocFreq = 100000, hotBlockPostings = bound)
    val salted = pairs(100L)
    val p = plan(salted)
    assert(p.contains("salt"), p.take(3000))
    assert(!p.contains("ShuffledHashJoin"), p.take(3000))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(salted) == rows(pairs(Long.MaxValue)))
    assert(rows(salted).nonEmpty) // the fixture actually exercises pairs
  }

  test("batch BM25 probe: one pruned postings scan serves the whole query batch") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val path = java.nio.file.Files.createTempDirectory("bm25plan").toString
    graft.ops.LexIndex.writeBm25Index(docs, col("doc_id"), col("text"),
      path)
    val queries = Seq((0L, "table"), (0L, "hash"), (1L, "hash"),
      (1L, "merge"), (2L, "table")).toDF("query_id", "term")
    val p = plan(graft.ops.LexIndex.bm25KnnJoinIndexed(spark, path,
      queries, col("query_id"), col("term"), k = 5))
    // the batch's term-prefix union is ONE static partition filter and
    // the postings table is scanned exactly once for all queries
    assert(p.matches("(?s).*PartitionFilters: \\[.*tpfx.*"), p.take(3000))
    assert("/postings".r.findAllIn(p).size == 1, p.take(3000))
    // query fan-out rides a broadcast; per-query top-k is a bounded
    // map-side aggregate — never a corpus-sized shuffle or sort-merge
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(p.contains("partial_topk_agg"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    // df broadcast-joins in from the lifecycle-maintained sidecar: NO
    // window and NO exchange keyed by term anywhere in the probe — the
    // pre-sidecar derivation forced every posting row of a term onto
    // one reducer, so a near-ubiquitous query term ("the") serialized
    // the probe at corpus scale
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("hashpartitioning(term"), p.take(3000))
    // ... and the single-query probe carries the same shape
    val terms1 = Seq("table", "hash").map(Tuple1(_)).toDF("term")
    val p1 = plan(graft.ops.LexIndex.bm25TopKIndexed(spark, path,
      terms1, col("term"), k = 5))
    assert(!p1.contains("Window"), p1.take(3000))
    assert(!p1.contains("hashpartitioning(term"), p1.take(3000))
    assert(p1.matches("(?s).*PartitionFilters: \\[.*tpfx.*"), p1.take(3000))
  }

  test("batch phrase probe: one pruned positions scan, broadcast anchors, bounded top-k") {
    import spark.implicits._
    // skewed fixture: 'the' near-ubiquitous, the anchor terms rare —
    // the batch intersection must anchor per query on its rare term
    val docs = (0L until 200L).map { i =>
      val filler = Seq.fill(20)("the").mkString(" ")
      if (i % 50 == 0) (i, s"$filler the zebra runs $filler")
      else if (i % 50 == 1) (i, s"$filler gnu walks the $filler")
      else (i, s"$filler word$i $filler")
    }.toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("phbatch").toString
    graft.ops.LexIndex.writeBm25Index(docs, col("doc_id"), col("text"),
      path, positions = true)
    val phrases = Seq(
      (7L, 0L, "the"), (7L, 1L, "zebra"), (7L, 2L, "runs"),
      (9L, 0L, "gnu"), (9L, 1L, "walks"), (9L, 2L, "the"))
      .toDF("query_id", "off", "term")
    val probe = graft.ops.LexIndex.phraseKnnJoinIndexed(spark, path,
      phrases, col("query_id"), col("term"), col("off"), k = 50)
    val p = plan(probe)
    // one pruned positions read serves the whole batch; anchors and
    // the phrase frame ride broadcasts; per-query top-k is a bounded
    // map-side aggregate — no sort-merge join, no window
    assert("/positions".r.findAllIn(p).size <= 2, p.take(4000))
    assert(p.matches("(?s).*PartitionFilters: \\[.*tpfx.*"), p.take(4000))
    assert(p.contains("LeftSemi") && p.contains("BroadcastHashJoin"),
      p.take(4000))
    assert(p.contains("partial_topk_agg"), p.take(4000))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      p.take(4000))
    // and each query's rows equal its single-phrase probe exactly
    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Seq(
      7L -> Seq("the", "zebra", "runs"),
      9L -> Seq("gnu", "walks", "the")).flatMap { case (q, ws) =>
      graft.ops.LexIndex.phraseTopKIndexed(spark, path, ws, k = 50)
        .collect().map(r => (q, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("phrase probe: rare-term anchors broadcast-semi-join the common terms' positions") {
    import spark.implicits._
    // skewed fixture: 'the' is near-ubiquitous, 'zebra' rare — the
    // intersection must anchor on the rare term's starts, not shuffle
    // the ubiquitous term's whole position list into the group-by
    val docs = (0L until 200L).map { i =>
      val filler = Seq.fill(20)("the").mkString(" ")
      if (i % 50 == 0) (i, s"$filler the zebra runs $filler")
      else (i, s"$filler word$i $filler")
    }.toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("phraseplan").toString
    graft.ops.LexIndex.writeBm25Index(docs, col("doc_id"), col("text"),
      path, positions = true)
    val probe = graft.ops.LexIndex.phraseTopKIndexed(spark, path,
      Seq("the", "zebra", "runs"), k = 50)
    val p = plan(probe)
    assert(p.contains("BroadcastExchange"), p.take(4000))
    assert(p.contains("LeftSemi") && p.contains("BroadcastHashJoin"),
      p.take(4000))
    assert(p.matches("(?s).*PartitionFilters: \\[.*tpfx.*"), p.take(4000))
    // and the pruned intersection is still exactly right
    val got = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = graft.ops.TextAnalysis.phraseMatches(docs, col("doc_id"),
        col("text"), Seq("the", "zebra", "runs"))
      .orderBy(col("n_matches").desc, col("doc_id")).limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("fingerprint store probe: bpfx prunes the band scan; verification never plans all-pairs") {
    import spark.implicits._
    val sigs = (0L until 200L).map(i => (i, i * 2654435761L))
      .toDF("doc_id", "sh")
    val path =
      java.nio.file.Files.createTempDirectory("fpidxplan").toString
    // radius 3 → c = 1, 4 band keys per doc: a narrow batch's bpfx
    // set is far below the 64-way fan-out, so the partition column
    // must prune the scan (the directory lever of the incremental
    // probe)
    graft.ops.FingerprintIndex.writeHammingIndex(
      sigs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("sh"),
      path, maxHamming = 3)
    val probe = graft.ops.FingerprintIndex.hammingAgainstIndex(spark,
      sigs.filter(col("doc_id") === 1), col("doc_id"), col("sh"), path)
    val p = plan(probe)
    assert(p.matches("(?s).*PartitionFilters: \\[.*bpfx.*"), p.take(4000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    // the RANKED probe keeps the same pruned-scan shape — the top-k is
    // a bounded aggregate over band-matched candidates, never a wider
    // scan or an all-pairs plan
    val ranked = plan(graft.ops.FingerprintIndex.hammingTopK(spark,
      sigs.filter(col("doc_id") === 1), col("doc_id"), col("sh"), path,
      k = 5))
    assert(ranked.matches("(?s).*PartitionFilters: \\[.*bpfx.*"),
      ranked.take(4000))
    assert(ranked.contains("topk_agg"), ranked.take(4000))
    assert(!ranked.contains("CartesianProduct") &&
      !ranked.contains("BroadcastNestedLoopJoin"), ranked.take(4000))
  }

  test("histogram sketch aggregates map-side; quantile window runs over the sketch") {
    val p = plan(SparkEntry.queries("qd77_hist_quantiles")(spark, sf))
    // one hash agg pair for the bucket counts (partial + final) and a
    // window over grp — but NO exchange after the window's (the window
    // input is already grouped by grp)
    assert(p.contains("HashAggregate"), p.take(3000))
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }
}
