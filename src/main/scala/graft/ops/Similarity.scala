package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (tiny) query
  * side against the corpus, one narrow map + one top-k aggregation; scales
  * to any corpus size because the corpus is never shuffled.
  *
  * Scale path: random-hyperplane LSH — each vector hashed to a
  * `numPlanes`-bit bucket; at query time only matching (or near-matching)
  * buckets are scanned. Bucketing is a deterministic seeded projection, so
  * the bucket id can be a partition/cluster key for a 100 TB corpus.
  */
object Similarity {

  /** Elementwise dot product of two double-array columns: a native
    * Catalyst expression with `doGenCode` (graft.functions.DotProduct) —
    * the declarative `aggregate(zip_with(...))` form evaluates an
    * interpreted lambda per element, which dominates O(pairs × dim)
    * similarity workloads. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecDot(a, b)

  /** Cast a float vector to double and L2-normalize it. Normalizing once
    * at ingest makes every later similarity a plain dot product. A native
    * Catalyst expression with `doGenCode`
    * (graft.functions.L2Normalize) — the declarative
    * `transform(d, x => x / sqrt(vecDot(d, d)))` form evaluates two
    * interpreted lambdas per row (~6× the native cost on this, the
    * single most shared primitive in the engine); bit-equal by the
    * expression's exactness contract. */
  def l2Normalize(vec: Column): Column =
    graft.functions.VectorExpressions.l2normalize(vec)

  /** Brute-force cosine scores of every corpus vector against one query
    * vector (given as a 1-row DataFrame with column `qv`, pre-normalized).
    * The query side is broadcast; the corpus scan stays partition-local. */
  def cosineScores(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame): DataFrame =
    corpus.select(id.as("vec_id"), l2Normalize(vec).as("v"))
      .crossJoin(broadcast(query))
      .select(col("vec_id"), round(dot(col("v"), col("qv")), 4).as("cos"))

  /** Take the top `k` of a scored frame by (`cos` desc, `vec_id` asc) and
    * attach a 1-based `rank` — WITHOUT a global window. `orderBy().limit(k)`
    * compiles to a distributed `TakeOrderedAndProject` (per-partition top-k
    * then a k-row merge on the driver), so the corpus never collapses to a
    * single partition; `rank` is then derived over the k-row result by
    * counting strictly-better rows (a broadcast nested-loop over k×k rows),
    * which equals row_number because (cos, vec_id) is unique per row. The
    * k-row frame is localCheckpoint'ed so the corpus scan runs once, not
    * once per self-join side. */
  def topKRanked(scored: DataFrame, k: Int): DataFrame = {
    val top = scored.orderBy(col("cos").desc, col("vec_id")).limit(k)
      .localCheckpoint()
    val better = col("b.cos") > col("a.cos") ||
      (col("b.cos") === col("a.cos") && col("b.vec_id") < col("a.vec_id"))
    top.as("a").join(broadcast(top.as("b")), better, "left")
      .groupBy(col("a.vec_id").as("vec_id"), col("a.cos").as("cos"))
      .agg((count(col("b.vec_id")) + 1).cast("int").as("rank"))
      .orderBy(col("rank"))
  }

  /** Brute-force top-k: cosine scores ranked with a deterministic
    * (score desc, id asc) tiebreak via [[topKRanked]] — a distributed
    * TakeOrderedAndProject, never a single-partition window. */
  def bruteForceTopK(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int): DataFrame =
    topKRanked(cosineScores(corpus, id, vec, query), k)

  /** 0-row (vec_id, cos, rank) frame matching the top-k result schema —
    * returned when the query frame is empty instead of throwing. */
  private def emptyTopK(corpus: DataFrame, id: Column): DataFrame =
    corpus.select(id.as("vec_id"), lit(0.0d).as("cos"),
      lit(0).as("rank")).limit(0)

  /** 0-row (query_id, vec_id, cos, rank) frame matching the multi-query
    * kNN-join result schema — the empty-corpus/empty-stats short-circuit
    * for the join-shaped operators (their schema must match the normal
    * path's, unlike the single-query [[emptyTopK]]). */
  private def emptyKnnJoin(corpus: DataFrame, id: Column): DataFrame =
    corpus.select(lit(0L).as("query_id"), id.as("vec_id"),
      lit(0.0d).as("cos"), lit(0L).as("rank")).limit(0)

  /** Deterministic pseudo-random hyperplanes — splitmix64 of
    * (plane, dim, fixed seed) mapped to [-1, 1], materialized driver-side
    * (numPlanes × dim doubles, trivially small) so bucketing compiles to
    * a codegen'd dot against a literal instead of a per-element
    * interpreted lambda. Stable across runs, partitions, and cluster
    * sizes — the bucket id can key the stored index. */
  def planeVectors(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { d =>
        var z = p.toLong * 0x9E3779B97F4A7C15L +
          d.toLong * 0xBF58476D1CE4E5B9L + 20260812L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        z.toDouble / Long.MaxValue.toDouble
      }
    }

  /** Random-hyperplane LSH bucket id: one sign bit per plane. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val d = transform(vec, x => x.cast("double"))
    val bits = planes.zipWithIndex.map { case (pl, p) =>
      when(graft.functions.VectorExpressions.vecDot(d, lit(pl)) >= 0,
        lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN with MULTI-PROBE: scan the query's own bucket plus
    * every bucket within Hamming distance `probeFlips` of it (flipping the
    * least-confident sign bits first is the classical refinement; flipping
    * ALL r-subsets, as here, is strictly better recall at the same probe
    * budget bound). Single-probe recall decays as (1 - theta/pi)^numPlanes
    * — a near neighbor crossing ONE hyperplane is lost; probing the
    * C(numPlanes, <=probeFlips) adjacent buckets recovers those pairs while
    * the candidate scan stays |corpus| * probes / 2^numPlanes in
    * expectation. The probe-bucket list is built driver-side (tiny) and
    * broadcast, so the corpus side remains one partition-local scan + an
    * equi-join on the stored bucket key — at 100 TB the bucket is the
    * index's partition key and each probe prunes to its partition.
    * The query frame's FIRST column is taken as the (pre-normalized) query
    * vector; an empty query frame yields an empty result instead of
    * throwing. */
  def annTopK(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int, numPlanes: Int = 8,
      probeFlips: Int = 1): DataFrame = {
    val qvName = query.columns.head
    val qHead = query.select(size(col(qvName)).as("d")).head(1)
    if (qHead.isEmpty) return emptyTopK(corpus, id)
    val dim = qHead(0).getInt(0)
    val planes = planeVectors(numPlanes, dim)
    val bucketed = corpus.select(id.as("vec_id"), l2Normalize(vec).as("v"),
      lshBucket(vec, planes).as("bucket"))
    // All bit-masks with <= probeFlips of numPlanes bits set, 0 first —
    // XORing the query bucket with each yields the probe buckets.
    val flips = (0L until (1L << numPlanes))
      .filter(m => java.lang.Long.bitCount(m) <= probeFlips)
    val q = query.select(col(qvName).as("qv"))
      .withColumn("qbucket", lshBucket(col("qv"), planes))
      .select(col("qv"), explode(
        array(flips.map(m => col("qbucket").bitwiseXOR(lit(m))): _*))
        .as("qbucket"))
    topKRanked(
      bucketed.join(broadcast(q), col("bucket") === col("qbucket"))
        .select(col("vec_id"), round(dot(col("v"), col("qv")), 4).as("cos")),
      k)
  }

  /** Dot product of a vector column against a literal centroid — the
    * same codegen'd DotProduct expression over an array literal. */
  private def dotLit(v: Column, centroid: Array[Double]): Column =
    graft.functions.VectorExpressions.vecDot(v, lit(centroid))

  /** Per-group embedding centroid as EXACT integer sums: each element is
    * floored to 1e-4 resolution and summed as a long, so the result is
    * identical on any engine and any partitioning (float summation order
    * flips low bits; integer sums don't — the same discipline as the
    * cents-sum queries). The caller derives the mean as sum_e4 / (n·1e4).
    * Plan shape: posexplode (narrow, ×dim) then ONE hash aggregation on
    * (label, dim) with map-side partials — at 100 TB each partition
    * pre-reduces to at most |labels|×dim rows before the exchange. */
  def centroidSums(embs: DataFrame, group: Column, vec: Column): DataFrame =
    embs.select(group.as("label"), posexplode(vec).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * lit(10000.0)).cast("long"))
          .as("sum_e4"))

  /** Per-vector outlier score against the vector's OWN group centroid:
    * cosine(v, centroid(label)), flagged when below `threshold` — the
    * embedding-space mislabel/noise detector (a vector far from its
    * cluster is a labeling error or junk worth pruning before training).
    * The centroid comes from [[centroidSums]]' EXACT integer sums
    * (sum_e4 / (n·1e4) — identical doubles on any engine/partitioning),
    * assembled into a per-label array and broadcast back, so the scoring
    * pass is one narrow map over the corpus: no corpus shuffle, the only
    * wide op is the tiny (label, dim) aggregation. Cosine floors through
    * `round(·, 4)` like every similarity in this module. */
  def centroidOutliers(embs: DataFrame, id: Column, label: Column,
      vec: Column, threshold: Double): DataFrame = {
    val cents = centroidSums(embs, label, vec)
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"),
        (col("sum_e4").cast("double") /
          (col("n").cast("double") * lit(10000.0))).as("c")))),
        s => s.getField("c")).as("cv"))
    embs.select(id.as("vec_id"), label.as("label"),
        transform(vec, x => x.cast("double")).as("v"))
      .join(broadcast(cents), "label")
      .select(col("vec_id"), col("label"),
        round(dot(col("v"), col("cv")) /
          (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("cv"), col("cv")))),
          4).as("cos_centroid"))
      .withColumn("is_outlier", col("cos_centroid") < threshold)
  }

  /** MMR (maximal marginal relevance) DIVERSIFIED top-k: greedily pick
    * `k` results from the `poolSize` most-relevant candidates, each step
    * maximizing `λ·rel(v) − (1−λ)·max_{s∈selected} sim(v, s)` — the
    * standard rerank that stops a result page being five near-copies of
    * the same document. Scale shape: relevance is one corpus-wide
    * [[cosineScores]] pass + TakeOrdered into a `poolSize`-row pool
    * (checkpointed); the k greedy steps then run on the pool only, each
    * a narrow rescoring against the selected vectors AS LITERALS plus a
    * 1-row TakeOrdered — k bounded driver round-trips of one row each,
    * the corpus is never revisited (rerankers always run on the
    * retrieved page, not the corpus). Every cosine and every combined
    * score rounds to 4 decimals with vec_id tiebreaks, so the greedy
    * trajectory is engine-exact and fully oracle-checkable.
    *
    * `attrFilter` restricts the CANDIDATE corpus before the relevance
    * pool is drawn (the predicate pushes into the one corpus scan, the
    * index families' attrFilter contract): filtered MMR == MMR over
    * the allowed subset (spec-pinned) — post-filtering a diversified
    * page would both under-fill it and mis-rank it, since the greedy
    * trajectory of the full pool differs from the allowed pool's. */
  def mmrTopK(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int, poolSize: Int,
      lambda: Double, attrFilter: Option[Column] = None): DataFrame = {
    require(k >= 1 && poolSize >= k && lambda > 0 && lambda <= 1)
    val base = attrFilter.foldLeft(corpus)(_.filter(_))
    val vecs = base.select(id.as("_vid"), l2Normalize(vec).as("v2"))
    val pool = cosineScores(base, id, vec, query)
      .orderBy(col("cos").desc, col("vec_id")).limit(poolSize)
      .join(vecs, col("vec_id") === col("_vid")).drop("_vid")
      .localCheckpoint() // poolSize rows; greedy steps re-scan this only
    var selected = Vector.empty[(Long, Double, Array[Double])]
    var remaining = pool
    for (_ <- 1 to k) {
      val maxSim =
        if (selected.isEmpty) lit(0.0)
        else selected.map { case (_, _, sv) =>
          round(dot(col("v2"), lit(sv)), 4)
        }.reduce(greatest(_, _))
      val top = remaining
        .withColumn("mmr", round(lit(lambda) * col("cos") -
          lit(1.0 - lambda) * maxSim, 4))
        .orderBy(col("mmr").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("mmr"), col("v2")).head()
      selected :+= ((top.getLong(0), top.getDouble(1),
        top.getSeq[Double](2).toArray))
      remaining = remaining.filter(col("vec_id") =!= top.getLong(0))
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((vid, score, _), i) => (vid, i + 1L, score) }
      .toDF("vec_id", "mmr_rank", "mmr_score")
  }

  /** PRODUCT-QUANTIZATION ANN (ADC scoring) — the storage format that
    * makes 100 TB vector search affordable: each vector compresses to
    * `numSub` small codes (here 8 codes of 4 bits = 4 bytes per 64-dim
    * vector, a 64× reduction), and a query scans CODES ONLY, summing
    * per-subspace distances from a precomputed table (asymmetric
    * distance computation, Jégou et al.). Determinism discipline: all
    * element values floor to 1e-4 integers first, so every distance is
    * an EXACT integer (carried in doubles, values ≪ 2^53 — no float
    * rounding anywhere, any engine reproduces bit-for-bit); codebooks
    * are the md5-ordered corpus sample's subspace slices (the
    * `ivfCentroidsLiteral` seam — real PQ trains per-subspace k-means,
    * same plumbing); argmin ties break on the code index. Plan shape:
    * codebooks are `codebookSize` collected rows (bounded, like IVF
    * centroids), encode + score is ONE narrow codegen'd map over the
    * corpus (native `vecDot` against literals), then TakeOrdered —
    * no corpus shuffle. */
  def pqTopK(corpus: DataFrame, id: Column, vec: Column,
      queryId: Long, k: Int, numSub: Int = 8,
      codebookSize: Int = 16): DataFrame = {
    val codebook = pqCodebook(corpus, id, vec, numSub, codebookSize)
    val qRow = corpus.filter(id === queryId)
      .select(pqQ4(vec).as("v4")).head().getSeq[Double](0).toArray
    val qTable = pqAdcTable(qRow, codebook)
    // Three projection steps, each alias referenced many times by the
    // next: CollapseProject keeps them separate (it only inlines cheap
    // single-reference aliases), so the quantize lambda and the argmin
    // tree appear ONCE in the plan instead of numSub×codebookSize times
    // — the difference between a bounded codegen unit and a
    // planning/compile blow-up.
    pqRank(corpus.select(id.as("vec_id"), pqQ4(vec).as("_v4"))
      .select(col("vec_id"), pqCodesExpr(col("_v4"), codebook).as("_codes"))
      .select(col("vec_id"),
        pqScoreFromCodes(col("_codes"), qTable).cast("long").as("adc_score")),
      k)
  }

  /** COARSE-TO-FINE retrieval: PQ-ADC shortlist (`shortlist`
    * candidates, scanning 64×-compressed codes) then EXACT cosine
    * rerank of the shortlist only — the standard two-stage shape that
    * gives near-exact quality at compressed-scan cost. The rerank
    * touches `shortlist` full vectors (a broadcast semi-join prune of
    * the corpus scan), so the full-precision read is bounded no matter
    * the corpus size. Both stages are deterministic (exact-integer ADC,
    * rounded cosine with id tiebreaks) — the composition is
    * oracle-checkable end to end. */
  def pqRerankTopK(corpus: DataFrame, id: Column, vec: Column,
      queryId: Long, k: Int, shortlist: Int, numSub: Int = 8,
      codebookSize: Int = 16): DataFrame = {
    val short = pqTopK(corpus, id, vec, queryId, shortlist, numSub,
      codebookSize).select(col("vec_id").as("_short_id"))
    val sub = corpus.join(broadcast(short),
      id === col("_short_id"), "left_semi")
    val q = corpus.filter(id === queryId)
      .select(l2Normalize(vec).as("qv"))
    bruteForceTopK(sub, id, vec, q, k)
  }

  /** IVF-PQ (IVFADC — Jégou et al., "Product Quantization for Nearest
    * Neighbor Search"): the composed 100 TB retrieval layout. The two
    * approximations the engine already trusts separately are STACKED —
    * trained coarse cells PRUNE the scan (only `nProbe` of `nList`
    * cell partitions are touched, the [[ivfTopK]] contract) and
    * product-quantization of the RESIDUAL v − centroid(cell)
    * compresses what remains to `numSub` small codes (the [[pqTopK]]
    * contract, but over residuals — residuals are what PQ encodes
    * well, since the coarse cell already absorbed the vector's
    * direction). A query therefore scans nProbe/nList of the corpus at
    * ~code width instead of full precision; qe32's full-corpus
    * compressed scan becomes a PRUNED compressed scan.
    *
    * Determinism discipline (what makes the composition oracle-exact):
    * centroids are the 1e-6-rounded spherical-Lloyd cells of
    * [[ivfCentroidsKMeans]]; residuals floor to 1e-6 integer-valued
    * doubles BEFORE encoding, so every ADC distance is an exact
    * integer (values ≤ ~1e15 < 2^53 — no float rounding, engine-
    * portable); the residual codebook is the md5("pqr:")-ordered
    * sample's subspace slices; argmin ties break on the code index;
    * per-cell query tables are exact-integer driver arithmetic. */
  def ivfPqTopK(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int, nList: Int = 16, nProbe: Int = 4,
      numSub: Int = 8, codebookSize: Int = 16,
      refineIters: Int = 2): DataFrame = {
    val (cents, cb, coded) = ivfPqEncode(corpus, id, vec, nList, numSub,
      codebookSize, refineIters)
    val qv = query.select(l2Normalize(col(query.columns.head)).as("qv"))
      .head().getSeq[Double](0).toArray
    val tabs = ivfPqQueryTabs(qv, cents, cb, nProbe)
    pqRank(coded.filter(col("cell").isin(tabs.map(_._1).toIndexedSeq: _*))
      .select(col("vec_id"),
        ivfPqScoreExpr(col("codes"), tabs).cast("long").as("adc_score")),
      k)
  }

  /** The shared IVF-PQ ENCODE pass behind [[ivfPqTopK]] and the
    * persisted [[AnnIndex.writeIvfPqIndex]]: train cells (spherical
    * Lloyd over md5-seeded starts), assign every vector partition-
    * locally (centroids are plan literals — no corpus shuffle),
    * quantize the residual to the 1e-6 integer grid and encode it with
    * one codegen'd argmin map. Returns (cell-sorted centroids, residual
    * codebook, (vec_id, cell, codes) frame). */
  private[ops] def ivfPqEncode(corpus: DataFrame, id: Column, vec: Column,
      nList: Int, numSub: Int, codebookSize: Int, refineIters: Int)
      : (Array[(Int, Array[Double])], Array[Array[Array[Double]]],
         DataFrame) =
    ivfPqEncodePre(
      corpus.select(id.as("vec_id"), l2Normalize(vec).as("v")),
      nList, numSub, codebookSize, refineIters)

  /** [[ivfPqEncode]] over an ALREADY-NORMALIZED (vec_id, v) frame —
    * the retrain-from-stored-vectors seam: the persisted IVF-PQ
    * `vectors/` table holds exactly the normalized build inputs, so a
    * retrain at compact re-runs the identical Lloyd rounds, residual
    * quantization and codebook sample a fresh full-corpus build
    * would, producing a bit-identical model. */
  private[ops] def ivfPqEncodePre(normed: DataFrame,
      nList: Int, numSub: Int, codebookSize: Int, refineIters: Int)
      : (Array[(Int, Array[Double])], Array[Array[Array[Double]]],
         DataFrame) = {
    val cents = (if (refineIters > 0)
        ivfCentroidsKMeansPre(normed, nList, refineIters)
      else ivfCentroidsPre(normed, nList)).sortBy(_._1)
    // Three projection steps for the same reason as pqTopK: each alias
    // is multiply-referenced by the next, so CollapseProject keeps the
    // residual lambda and the argmin tree single-occurrence in the plan.
    val resid = normed
      .select(col("vec_id"), col("v"))
      .withColumn("cell", nearestCell(col("v"), cents))
      .select(col("vec_id"), col("cell"),
        residualE6(col("v"), col("cell"), cents).as("q"))
    val cb = pqCodebookFrom(resid, numSub, codebookSize, "pqr:")
    (cents, cb, resid.select(col("vec_id"), col("cell"),
      pqCodesExprWide(col("q"), cb).as("codes")))
  }

  /** Residual of a normalized vector from its cell's centroid, floored
    * to 1e-6 integer-valued doubles (|residual| ≤ 2 on the unit sphere,
    * so elements stay ≤ 2e6 and squared-distance sums ≤ ~1e15 — exact
    * in doubles AND in any other engine's). The centroid lookup is one
    * `element_at` into a literal array-of-arrays indexed by cell — a
    * narrow map, no join. `cents` must be cell-sorted 0..nList-1. */
  private[ops] def residualE6(v: Column, cell: Column,
      cents: Array[(Int, Array[Double])]): Column = {
    val centArr = array(cents.map { case (_, cv) => lit(cv) }: _*)
    zip_with(v, element_at(centArr, cell.cast("int") + lit(1)),
      (a, b) => floor((a - b) * lit(1000000.0)).cast("double"))
  }

  /** Codebook over an ALREADY-QUANTIZED (vec_id, q) frame: the
    * md5(seed)-ordered sample's subspace slices — [[pqCodebook]]'s
    * seam generalized so residual frames can feed it. */
  private[ops] def pqCodebookFrom(quant: DataFrame, numSub: Int,
      codebookSize: Int, seed: String): Array[Array[Array[Double]]] = {
    val sample = quant
      .orderBy(md5(concat(lit(seed), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(codebookSize)
      .select(col("q")).collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = sample(0).length
    require(dim % numSub == 0, s"dim $dim not divisible by $numSub")
    val subDim = dim / numSub
    Array.tabulate(numSub, codebookSize) { (m, c) =>
      sample(c).slice(m * subDim, (m + 1) * subDim)
    }
  }

  /** Per-probed-cell exact-integer ADC tables for one query: cells
    * ranked by query·centroid (ties to the lower cell — the probe
    * convention), the query's residual from EACH probed cell's centroid
    * floored to the same 1e-6 grid, one [[pqAdcTable]] each. */
  private[ops] def ivfPqQueryTabs(qv: Array[Double],
      cents: Array[(Int, Array[Double])],
      cb: Array[Array[Array[Double]]], nProbe: Int)
      : Array[(Int, Array[Array[Double]])] =
    cents.map { case (cell, cv) => (cell, cv, dotArr(cv, qv)) }
      .sortBy { case (cell, _, s) => (-s, cell) }
      .take(nProbe)
      .map { case (cell, cv, _) =>
        val qr = Array.tabulate(qv.length)(i =>
          math.floor((qv(i) - cv(i)) * 1000000.0))
        (cell, pqAdcTable(qr, cb))
      }

  /** ADC score of a stored codes column under the probed cell's own
    * table: a when-chain on the (partition) cell column — each branch a
    * [[pqScoreFromCodes]] lookup against that cell's literal table. */
  private[ops] def ivfPqScoreExpr(codes: Column,
      tabs: Array[(Int, Array[Array[Double]])]): Column =
    tabs.tail.foldLeft(when(col("cell") === tabs.head._1,
        pqScoreFromCodes(codes, tabs.head._2))) {
      case (acc, (c, tab)) =>
        acc.when(col("cell") === c, pqScoreFromCodes(codes, tab))
    }

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Sign bits of vector elements `from+1 .. from+32` packed into one
    * long (bit j set when element from+j+1 is >= 0). Out-of-range
    * elements contribute 0 bits: `try_element_at` yields NULL past the
    * array end (where plain `element_at` THROWS under the ANSI default
    * of Spark 4), and the null comparison folds to the otherwise-branch
    * — so dims < from+32 zero-pad, mirrored by the oracle's conditional
    * sum. */
  private[graft] def signBits(vec: Column, from: Int): Column =
    (0 until 32).map(j =>
      when(try_element_at(vec, lit(from + j + 1)).cast("double") >= 0,
        lit(1L << j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))

  /** The 4×16-bit pigeonhole blocks of a packed sign signature — the
    * same blocking the portable SimHash path uses: two signatures
    * within Hamming distance 3 are GUARANTEED to share a block, looser
    * pairs probabilistically. Returns the 4-element block-value array
    * (callers posexplode it into (bidx, bval)). */
  private[graft] def signBlockArray(lo: Column, hi: Column): Column =
    array(shiftrightunsigned(hi, 16), hi.bitwiseAND(lit(0xffffL)),
      shiftrightunsigned(lo, 16), lo.bitwiseAND(lit(0xffffL)))

  /** BINARY-QUANTIZATION retrieval: each vector compresses to its 64
    * SIGN BITS (two packed longs — a 32× reduction from float32, the
    * cheapest index format there is), stage 1 shortlists the
    * `shortlist` nearest by HAMMING distance between sign signatures
    * (`bit_count(xor)` per half, ascending, vec_id tiebreak — for
    * L2-normalized vectors sign-agreement is a monotone proxy for the
    * angle), stage 2 reranks the shortlist with exact cosine. The
    * signature scan is a narrow codegen'd map + distributed TakeOrdered
    * (no shuffle of the corpus); the exact pass reads `shortlist` full
    * vectors via a broadcast semi-join. Everything is deterministic —
    * sign bits, integer Hamming, rounded cosine — so the two-stage
    * composition is oracle-checkable end to end. Two 32-bit halves
    * rather than one 64-bit word keep `1 << bit` off the sign bit, the
    * same portability trick the SimHash path uses. */
  def binaryTopK(corpus: DataFrame, id: Column, vec: Column,
      queryId: Long, k: Int, shortlist: Int): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need 1 <= k <= shortlist: k=$k shortlist=$shortlist")
    val qRows = corpus.filter(id === queryId)
      .select(signBits(vec, 0).as("qlo"), signBits(vec, 32).as("qhi"))
      .head(1)
    if (qRows.isEmpty) return emptyTopK(corpus, id)
    val (qlo, qhi) = (qRows(0).getLong(0), qRows(0).getLong(1))
    val short = binaryShortlist(corpus, id, vec, qlo, qhi, shortlist)
    val q = corpus.filter(id === queryId)
      .select(l2Normalize(vec).as("qv"))
    bruteForceTopK(shortlistPrune(corpus, id, short), id, vec, q, k)
  }

  /** Hamming shortlist stage of [[binaryTopK]]: one narrow sign-bit
    * scan + distributed TakeOrdered (exposed as a seam so plan tests
    * can pin the shape past the rerank's checkpoint). */
  private[graft] def binaryShortlist(corpus: DataFrame, id: Column,
      vec: Column, qlo: Long, qhi: Long, shortlist: Int): DataFrame = {
    val ham = (bit_count(signBits(vec, 0).bitwiseXOR(lit(qlo))) +
      bit_count(signBits(vec, 32).bitwiseXOR(lit(qhi)))).cast("long")
    corpus.select(id.as("_short_id"), ham.as("_ham"))
      .orderBy(col("_ham"), col("_short_id")).limit(shortlist)
      .select(col("_short_id"))
  }

  /** Broadcast-semi-join prune of the corpus to a shortlist id frame
    * (column `_short_id`) — the bounded full-precision read both
    * two-stage retrievals share. */
  private[graft] def shortlistPrune(corpus: DataFrame, id: Column,
      short: DataFrame): DataFrame =
    corpus.join(broadcast(short), id === col("_short_id"), "left_semi")

  /** MATRYOSHKA (nested-embedding) coarse-to-fine retrieval: stage 1
    * scores only the first `prefixDims` dimensions (re-normalized — an
    * MRL-style embedding packs most of the signal into its prefix, and
    * a 4× shorter prefix is a 4× cheaper scan and store), shortlists
    * `shortlist` candidates by (rounded prefix cosine desc, vec_id),
    * stage 2 reranks them with the full-dimension exact cosine. The
    * prefix pass is one narrow map + distributed TakeOrdered; the full
    * vectors are touched only for the broadcast-semi-joined shortlist.
    * Deterministic at both stages — oracle-checkable end to end. */
  def matryoshkaTopK(corpus: DataFrame, id: Column, vec: Column,
      queryId: Long, k: Int, prefixDims: Int, shortlist: Int): DataFrame = {
    require(prefixDims >= 1 && k >= 1 && shortlist >= k,
      s"bad args: prefixDims=$prefixDims k=$k shortlist=$shortlist")
    val pre = l2Normalize(slice(vec, 1, prefixDims))
    val qp = corpus.filter(id === queryId).select(pre.as("qp"))
    if (qp.head(1).isEmpty) return emptyTopK(corpus, id)
    val short = matryoshkaShortlist(corpus, id, vec, qp, prefixDims,
      shortlist)
    val q = corpus.filter(id === queryId)
      .select(l2Normalize(vec).as("qv"))
    bruteForceTopK(shortlistPrune(corpus, id, short), id, vec, q, k)
  }

  /** Prefix-cosine shortlist stage of [[matryoshkaTopK]] (seam for
    * plan-shape tests, like [[binaryShortlist]]). */
  private[graft] def matryoshkaShortlist(corpus: DataFrame, id: Column,
      vec: Column, qp: DataFrame, prefixDims: Int,
      shortlist: Int): DataFrame = {
    val pre = l2Normalize(slice(vec, 1, prefixDims))
    corpus.select(id.as("_short_id"), pre.as("_p"))
      .crossJoin(broadcast(qp))
      .select(col("_short_id"),
        round(dot(col("_p"), col("qp")), 4).as("_pcos"))
      .orderBy(col("_pcos").desc, col("_short_id")).limit(shortlist)
      .select(col("_short_id"))
  }

  /** 1e-4 integer elements, exact in doubles (floor yields longs; carry
    * them as integer-valued doubles so native vecDot applies). */
  private[ops] def pqQ4(v: Column): Column = transform(v, x =>
    floor(x.cast("double") * lit(10000.0)).cast("double"))

  /** md5-ordered corpus sample → codebook[m][c][subDim] (bounded
    * collect, the ivfCentroidsLiteral seam). */
  private[ops] def pqCodebook(corpus: DataFrame, id: Column, vec: Column,
      numSub: Int, codebookSize: Int): Array[Array[Array[Double]]] = {
    val dim = corpus.select(size(vec)).head().getInt(0)
    require(dim % numSub == 0, s"dim $dim not divisible by $numSub")
    val subDim = dim / numSub
    val sample = corpus
      .orderBy(md5(concat(lit("pq:"), id.cast("string"))), id)
      .limit(codebookSize)
      .select(pqQ4(vec).as("v4")).collect()
      .map(_.getSeq[Double](0).toArray)
    Array.tabulate(numSub, codebookSize) { (m, c) =>
      sample(c).slice(m * subDim, (m + 1) * subDim)
    }
  }

  /** Exact integer ADC table [m][c] for one quantized query vector. */
  private[ops] def pqAdcTable(q4Row: Array[Double],
      codebook: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val subDim = codebook(0)(0).length
    Array.tabulate(codebook.length, codebook(0).length) { (m, c) =>
      val qs = q4Row.slice(m * subDim, (m + 1) * subDim)
      qs.zip(codebook(m)(c)).map { case (a, b) =>
        val d = a - b; d * d
      }.sum
    }
  }

  /** Per-subspace argmin codes of a quantized vector as `array<int>` —
    * one codegen'd expression (native dots against literals), ties to
    * the lower code index. Right for SMALL codebooks (qe20's 8×16 =
    * 128 branches); for wide ones use [[pqCodesExprWide]] — this form
    * unrolls numSub × codebookSize literal struct branches and its
    * generated code grows past what janino compiles quickly. */
  private[ops] def pqCodesExpr(v4: Column,
      codebook: Array[Array[Array[Double]]]): Column =
    graft.functions.VectorExpressions.pqEncode(v4, codebook)

  /** Historical alias of [[pqCodesExpr]] — the two forms existed only
    * because the unrolled when-chain encode hit a janino compile wall
    * on wide codebooks while the `transform`-lambda form evaluated
    * interpreted (~26 s per 1M rows on a 16×64 book). Both are now the
    * single native codegen'd argmin ([[graft.functions.PqArgmin]]):
    * one tight primitive loop, any codebook width, same exact integer
    * math and lower-code tiebreak — bit-identical codes, so every
    * stored-bytes oracle is untouched. */
  private[ops] def pqCodesExprWide(v4: Column,
      codebook: Array[Array[Array[Double]]]): Column =
    pqCodesExpr(v4, codebook)

  /** The PQ quantization error of an already-quantized vector — the
    * sum over subspaces of the MINIMUM exact-integer distance to any
    * codeword, i.e. exactly the residual [[pqCodesExprWide]]'s argmin
    * leaves behind. This is the plain-PQ analog of the trained
    * families' spherical quantization error: under a frozen codebook
    * it is per-row deterministic and integer-valued (1e-4-grid terms
    * squared), so error SUMS fold additively across batches — the
    * property the drift-state sidecar relies on. Both forms compute
    * Σ(a−b)² = ‖a‖² − 2a·b + ‖b‖² in exact integer doubles, so the
    * value is form-independent. This standalone form costs one argmin
    * pass (native codegen'd — [[graft.functions.PqArgmin]]); when the
    * store's codes table is joinable prefer [[pqErrFromCodes]], which
    * skips the min entirely. */
  private[ops] def pqMinDistExpr(v4: Column,
      codebook: Array[Array[Array[Double]]]): Column =
    graft.functions.VectorExpressions.pqMinDist(v4, codebook)

  /** The PQ quantization error RE-DERIVED from stored codes — no min:
    * each subspace's distance goes straight to its assigned codeword
    * (dist-to-argmin == min-dist by definition; ties picked SOME
    * argmin, whose distance equals the min). 8 native dots + literal
    * lookups per row instead of numSub × codebookSize interpreted
    * lambdas — the form the wholesale sidecar recompute uses, joining
    * the store's own codes table it just rewrote. */
  private[ops] def pqErrFromCodes(v4: Column, codes: Column,
      codebook: Array[Array[Array[Double]]]): Column = {
    val subDim = codebook(0)(0).length
    codebook.indices.map { m =>
      val sub = slice(v4, m * subDim + 1, subDim)
      val cbm = array(codebook(m).map(cb => lit(cb)): _*)
      val sel = element_at(cbm, element_at(codes, m + 1) + 1)
      val cbSq = lit(codebook(m).map(_.map(x => x * x).sum))
      dot(sub, sub) - lit(2.0) * dot(sub, sel) +
        element_at(cbSq, element_at(codes, m + 1) + 1)
    }.reduce(_ + _)
  }

  /** ADC score lookup over a STORED codes column. */
  private[ops] def pqScoreFromCodes(codes: Column,
      qTable: Array[Array[Double]]): Column =
    qTable.indices.map { m =>
      element_at(lit(qTable(m)), element_at(codes, m + 1) + 1)
    }.reduce(_ + _)

  /** TakeOrdered top-k by (adc_score, vec_id) + rank over the k rows. */
  private[ops] def pqRank(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("adc_score"), col("vec_id")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("adc_score"), col("vec_id"))))

  /** Per-group centroid DRIFT between two corpus snapshots (old batch vs
    * new batch, last week vs this week): for each group present in BOTH
    * frames, the L1 distance between centroids, computed EXACTLY by
    * cross-scaling the integer element sums —
    *   drift_num = Σ_dim |sumA_e4 · nB − sumB_e4 · nA|
    * (the per-dim mean difference times nA·nB·1e4, so no division and no
    * float accumulation; callers wanting the mean-L1 divide by
    * nA·nB·1e4 at the edge). Integer headroom: |sum_e4| · n must stay
    * under 2^63 — n·max|x|·n ≲ 9·10^14, comfortable for per-label
    * snapshots. Plan: two [[centroidSums]] aggregations (the only
    * corpus-sized work), a (group, dim)-keyed join of two tiny
    * centroid frames, one final reduce per group. */
  def centroidDrift(a: DataFrame, b: DataFrame, group: Column,
      vec: Column): DataFrame = {
    val ca = centroidSums(a, group, vec)
      .select(col("label"), col("dim"), col("n").as("n_a"),
        col("sum_e4").as("sum_a"))
    val cb = centroidSums(b, group, vec)
      .select(col("label"), col("dim"), col("n").as("n_b"),
        col("sum_e4").as("sum_b"))
    ca.join(cb, Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(abs(col("sum_a") * col("n_b") - col("sum_b") * col("n_a")))
          .as("drift_num"))
  }

  /** Scalar int8 quantization of an embedding column: each dimension
    * maps linearly from its corpus [min, max] onto 0..255 — the standard
    * index-compression pass before ANN (4× smaller than float32, and
    * distance kernels go integer). Elements are floored to 1e-4 longs
    * first, so min/max and the quantized code are EXACT integer math —
    * identical on any engine or partitioning. Two passes over the
    * corpus: per-dim stats (one hash agg, at most `dim` rows out) and a
    * broadcast join back — no corpus shuffle at all. A constant
    * dimension (max == min) quantizes to 0. */
  def quantizeInt8(embs: DataFrame, id: Column, vec: Column): DataFrame = {
    val e = embs.select(id.as("vec_id"), posexplode(vec).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        floor(col("x").cast("double") * lit(10000.0)).cast("long").as("x_e4"))
    val stats = e.groupBy(col("dim"))
      .agg(min(col("x_e4")).as("mn"), max(col("x_e4")).as("mx"))
    e.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim"),
        when(col("mx") === col("mn"), lit(0L)).otherwise(
          least(floor(((col("x_e4") - col("mn")) * lit(255)).cast("double") /
            (col("mx") - col("mn")).cast("double")), lit(255.0)).cast("long"))
          .as("q"))
  }

  /** Two-stage retrieval over int8 codes (asymmetric-distance rerank,
    * the ADC pattern): the corpus is stored as per-dim int8 codes (4×
    * smaller than float32 — at scale the stored index is the code bytes
    * plus a per-dim (min, max) dictionary); stage 1 scores the DECODED
    * code value (a per-dim affine reconstruction — raw offset codes are
    * NOT monotonic in cosine because each dim has its own offset/scale)
    * against the EXACT query vector and keeps `rerank` candidates via a
    * distributed TakeOrderedAndProject; stage 2 re-scores only those
    * candidates with exact float cosine and ranks the final k. The
    * candidate id set is tiny and broadcast, so the exact pass is a
    * broadcast semi-join — no corpus shuffle in either stage. Recall is
    * hurt only when quantization error pushes a true top-k member out
    * of the top-`rerank` approximate set; rerank/k of ~5-10× is the
    * standard safety margin. */
  def quantizedTopK(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int, rerank: Int): DataFrame = {
    val qvName = query.columns.head
    val qRows = query.select(col(qvName)).head(1)
    if (qRows.isEmpty) return emptyTopK(corpus, id)
    val qv = qRows(0).getSeq[Double](0).toArray
    val normed = corpus.select(id.as("vec_id"), l2Normalize(vec).as("v"))
    val (mn, mx) = int8Stats(normed)
    if (mn.isEmpty) return emptyTopK(corpus, id)
    // Stage 1 is ONE narrow map: per-dim (min, max) is a dim-sized
    // driver collect (the stored dictionary at scale), so encode +
    // affine decode + query dot fold into a literal-weighted expression
    // — no dim join, and crucially no groupBy(vec_id) reassembly
    // shuffle of the exploded corpus (2 shuffles of |corpus|·dim rows
    // gone; the only corpus-sized pass left is the narrow scan into
    // the TakeOrdered). Same double arithmetic as the exploded form —
    // all intermediates are integer-valued doubles — so scores are
    // bit-identical and the oracle is untouched.
    val ascore = mn.indices.map(i =>
      int8DecodedTerm(col("v"), i, mn(i), mx(i), qv(i))).reduce(_ + _)
    val candidates = normed.select(col("vec_id"), ascore.as("ascore"))
      .orderBy(col("ascore").desc, col("vec_id")).limit(rerank)
      .select(col("vec_id"))
    val exact = normed.join(broadcast(candidates), "vec_id")
      .crossJoin(broadcast(query.select(col(qvName).as("qv"))))
      .select(col("vec_id"), round(dot(col("v"), col("qv")), 4).as("cos"))
    topKRanked(exact, k)
  }

  /** Per-dim (min, max) of the 1e-4-floored normalized elements — the
    * int8 dictionary. One explode + map-side-combined aggregation, at
    * most `dim` rows collected. */
  private[ops] def int8Stats(
      normed: DataFrame): (Array[Long], Array[Long]) = {
    val rows = normed
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("dim"),
        floor(col("x") * lit(10000.0)).cast("long").as("x_e4"))
      .groupBy(col("dim"))
      .agg(min(col("x_e4")).as("mn"), max(col("x_e4")).as("mx"))
      .collect()
    if (rows.isEmpty) return (Array.empty, Array.empty)
    val d = rows.map(_.getInt(0)).max + 1
    val mn = new Array[Long](d); val mx = new Array[Long](d)
    rows.foreach { r =>
      mn(r.getInt(0)) = r.getLong(1); mx(r.getInt(0)) = r.getLong(2)
    }
    (mn, mx)
  }

  /** One stage-1 term: decode(int8(v_i)) · q_i with the dim's (mn, mx)
    * and the query element as literals. Constant dims quantize to code
    * 0 → the whole term folds to a literal. */
  private def int8DecodedTerm(v: Column, i: Int, mn: Long, mx: Long,
      q: Double): Column =
    if (mx == mn) lit(mn.toDouble / 10000.0 * q)
    else {
      val xi = floor(element_at(v, i + 1) * lit(10000.0))
      val code = least(floor((xi - lit(mn.toDouble)) * lit(255.0) /
        lit((mx - mn).toDouble)), lit(255.0))
      ((lit(mn.toDouble) + code * lit((mx - mn).toDouble) / lit(255.0)) /
        lit(10000.0)) * lit(q)
    }

  /** Deterministically sample `nList` corpus vectors as IVF centroids:
    * the nList ids sorting first by md5("ivf:" + id) — stable across
    * runs and partitionings, no RNG, and ENGINE-PORTABLE (md5 of the
    * decimal id string is reproducible in any SQL engine, unlike a
    * Spark-internal hash), so an external oracle can re-derive the same
    * centroid set. One small collect (nList × dim doubles). */
  def ivfCentroids(corpus: DataFrame, id: Column, vec: Column,
      nList: Int): Array[(Int, Array[Double])] =
    ivfCentroidsPre(
      corpus.select(id.as("vec_id"), l2Normalize(vec).as("v")), nList)

  /** [[ivfCentroids]] over an ALREADY-NORMALIZED (vec_id, v) frame —
    * the retrain-from-stored-rows seam ([[graft.ops.AnnIndex]]
    * retrain-at-compact): stored index rows hold `v` exactly as
    * [[l2Normalize]] produced it at build/append, and re-normalizing
    * is NOT bit-idempotent (the recomputed norm of a normalized
    * vector is 1±ulp), so taking the stored values as-is is what makes
    * a retrain reproduce a fresh full-corpus build bit-for-bit. */
  private[ops] def ivfCentroidsPre(normed: DataFrame,
      nList: Int): Array[(Int, Array[Double])] =
    normed.select(col("vec_id").as("cid"), col("v").as("cv"))
      .orderBy(md5(concat(lit("ivf:"), col("cid").cast("string"))),
        col("cid"))
      .limit(nList)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }

  /** Lloyd (k-means) refinement of the sampled IVF centroids: each
    * iteration assigns every vector partition-locally (centroids are
    * literals — no shuffle on the corpus), then recomputes the per-cell
    * mean via posexplode + ONE (cell, dim) aggregation (map-side combined
    * to at most nList x dim rows per partition before the exchange) and
    * re-normalizes to the unit sphere (spherical k-means — right for
    * cosine). The collected state per iteration is nList x dim doubles —
    * trivially driver-sized at any corpus scale. Empty cells keep their
    * previous centroid. Deterministic: seeded sample start, no RNG. */
  def ivfCentroidsKMeans(corpus: DataFrame, id: Column, vec: Column,
      nList: Int, iters: Int): Array[(Int, Array[Double])] =
    ivfCentroidsKMeansPre(
      corpus.select(id.as("vec_id"), l2Normalize(vec).as("v")),
      nList, iters)

  /** [[ivfCentroidsKMeans]] over an ALREADY-NORMALIZED (vec_id, v)
    * frame — the [[ivfCentroidsPre]] seam with the Lloyd refinement:
    * retraining from stored rows runs the identical iteration a fresh
    * build would, because the stored vectors ARE the build's
    * normalized inputs. */
  private[ops] def ivfCentroidsKMeansPre(normed0: DataFrame,
      nList: Int, iters: Int): Array[(Int, Array[Double])] = {
    var cents = ivfCentroidsPre(normed0, nList)
    if (iters <= 0 || cents.length <= 1) return cents
    val normed = normed0.select(col("v"))
    for (_ <- 0 until iters) {
      val sums = normed
        .withColumn("cell", nearestCell(col("v"), cents))
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.map { case (cell, old) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val mean = new Array[Double](old.length)
            rows.foreach { r =>
              // means round to 1e-6 BEFORE normalization (HALF_UP, the
              // graft.ops.Clustering contract) so the trained centroids
              // are reproducible in external SQL despite each engine's
              // own floating sum order — what makes the qe29 trained-IVF
              // query oracle-exact rather than merely deterministic.
              mean(r.getInt(1)) = new java.math.BigDecimal(
                r.getDouble(2) / r.getLong(3).toDouble)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            }
            val norm = math.sqrt(mean.map(x => x * x).sum)
            if (norm == 0.0) (cell, old)
            else (cell, mean.map(_ / norm))
          case None => (cell, old)
        }
      }
    }
    cents
  }

  /** Assign each vector to its nearest centroid without any shuffle:
    * the centroid list is embedded as literals, so assignment is a pure
    * per-row map over the corpus — the core IVF property that lets the
    * index build scan 100 TB once, partition-locally. Returns
    * (bestCell, bestScore) columns via a fold over the centroids. */
  private[graft] def nearestCell(v: Column,
      centroids: Array[(Int, Array[Double])]): Column =
    // the native argmax IS greatest() on (score, cell) structs: score
    // first, then cell id as the deterministic tiebreak (higher cell
    // wins ties) — with the centroids as a reference object instead of
    // unrolled literals, so the generated code (and its janino
    // compile) is shared across centroid sets. Single-centroid indexes
    // short-circuit as before.
    if (centroids.length == 1) lit(centroids.head._1)
    else graft.functions.VectorExpressions.cellArgmax(v, centroids)
      .getField("cell")

  /** The BEST-CELL SCORE of [[nearestCell]]'s assignment — max dot
    * against the centroid literals, the quantization-quality signal
    * the [[graft.ops.AnnIndex.assignmentDrift]] monitor aggregates
    * (1 − score is the spherical quantization error). Same fold, the
    * score field instead of the cell. */
  private[graft] def nearestCellScore(v: Column,
      centroids: Array[(Int, Array[Double])]): Column =
    if (centroids.length == 1) dotLit(v, centroids.head._2)
    else graft.functions.VectorExpressions.cellArgmax(v, centroids)
      .getField("score")

  /** IVF (inverted-file) ANN. Index build: one partition-local pass
    * assigning every vector to its nearest of `nList` sampled centroids —
    * at scale the `cell` column becomes the partition key of the stored
    * index. Query: score the centroids, probe the `nProbe` best cells,
    * scan only those cells' vectors. Expected candidate fraction
    * nProbe/nList of the corpus. */
  def ivfTopK(corpus: DataFrame, id: Column, vec: Column,
      query: DataFrame, k: Int, nList: Int = 16, nProbe: Int = 4,
      refineIters: Int = 0): DataFrame = {
    val qvName = query.columns.head
    if (query.select(col(qvName)).head(1).isEmpty) return emptyTopK(corpus, id)
    val q = query.select(col(qvName).as("qv"))
    val cents =
      if (refineIters > 0) ivfCentroidsKMeans(corpus, id, vec, nList,
        refineIters)
      else ivfCentroids(corpus, id, vec, nList)
    val indexed = corpus.select(id.as("vec_id"), l2Normalize(vec).as("v"))
      .withColumn("cell", nearestCell(col("v"), cents))
    // nProbe best cells for the query vector: explode the (tiny) centroid
    // list against the 1-row query frame; orderBy().limit() keeps even this
    // small rank window-free.
    val centDf = query.sparkSession.createDataFrame(
      cents.map { case (cell, cv) => (cell, cv) }.toSeq
    ).toDF("cell", "cv")
    val probeCells = centDf.crossJoin(broadcast(q))
      .select(col("cell"), col("qv"), dot(col("cv"), col("qv")).as("qscore"))
      .orderBy(col("qscore").desc, col("cell"))
      .limit(nProbe)
      .select(col("cell"), col("qv"))
    topKRanked(
      indexed.join(broadcast(probeCells), Seq("cell"))
        .select(col("vec_id"), round(dot(col("v"), col("qv")), 4).as("cos")),
      k)
  }

  /** Multi-query kNN join: for EACH query vector, the k nearest corpus
    * vectors by cosine — the batch-retrieval shape behind evaluation
    * sweeps, cluster assignment and hard-negative mining. The single-
    * query operators ([[bruteForceTopK]] and friends) rank one result
    * set; ranking per query needs per-group top-k, and the declarative
    * form (`row_number` over a (query) window) shuffles and sorts the
    * whole |corpus| × |queries| scored product. This uses the native
    * bounded [[graft.functions.TopKAgg]] instead: map-side partial
    * aggregation reduces each (query, partition) to k pairs BEFORE the
    * exchange, so the corpus is scanned once, never shuffled, and the
    * wire carries k × |queries| × |partitions| pairs.
    *
    * Queries broadcast (a query batch is dim-sized); scores round to 4
    * decimals with (cos DESC, vec_id ASC) tiebreak, so results are
    * deterministic and engine-reproducible. */
  def knnJoin(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int): DataFrame = {
    val c = corpus.select(id.as("vec_id"), l2Normalize(vec).as("v"))
    val q = queries.select(qid.as("query_id"), l2Normalize(qvec).as("qv"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("v"), col("qv")), 4).as("cos"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate
        .topk(col("cos"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "p")))
      .select(col("query_id"), col("p.id").as("vec_id"),
        col("p.score").as("cos"), (col("r") + 1).cast("long").as("rank"))
  }

  /** Per-query probe-cell ranks against a centroid set: for every
    * (query, cell) pair, the cell's rank by query-centroid dot (best
    * first, ties to the lower cell — the [[ivfTopK]] probe order).
    * The frame is |queries| × nList rows WITH the normalized query
    * vector attached, so downstream candidate joins need no second
    * query-side join; the rank window shuffles only this tiny frame,
    * never a corpus. */
  private[graft] def probeCellRanks(queries: DataFrame, qid: Column,
      qvec: Column, cents: Array[(Int, Array[Double])]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centDf = queries.sparkSession.createDataFrame(cents.toSeq)
      .toDF("cell", "cv")
    queries.select(qid.as("query_id"), l2Normalize(qvec).as("qv"))
      .crossJoin(broadcast(centDf))
      .select(col("query_id"), col("qv"), col("cell"),
        dot(col("cv"), col("qv")).as("qscore"))
      .withColumn("crk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("qscore").desc, col("cell"))).cast("long"))
      .select(col("query_id"), col("qv"), col("cell"), col("crk"))
  }

  /** Multi-query IVF kNN join: for EACH query vector, the k best
    * candidates from its own `nProbe` best cells — the batched form of
    * [[ivfTopK]], shaped like [[knnJoin]]: cells are literals, so corpus
    * assignment is one narrow map (no shuffle); the per-query probe-cell
    * frame (|queries| × nProbe rows, query vectors attached) broadcasts
    * into ONE candidate join; and the per-query top-k runs in the
    * bounded `topk_agg` (map-side k-row states — the corpus never
    * shuffles). Expected scanned-candidate fraction per query is
    * nProbe/nList of the corpus, the IVF contract. This is the
    * evaluation / batch-serving shape: recall measured over it is an
    * n = |queries| sample, not an n = 1 anecdote. */
  def ivfKnnJoin(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int,
      nList: Int = 16, nProbe: Int = 4, refineIters: Int = 0): DataFrame = {
    val cents =
      if (refineIters > 0) ivfCentroidsKMeans(corpus, id, vec, nList,
        refineIters)
      else ivfCentroids(corpus, id, vec, nList)
    ivfKnnJoinWith(corpus, id, vec, queries, qid, qvec, k, cents, nProbe)
  }

  /** [[ivfKnnJoin]] against an explicit centroid set — the seam that
    * lets one training pass feed several probe configurations (the
    * sweep shape) or a stored centroid table (the index probe shape). */
  def ivfKnnJoinWith(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int,
      cents: Array[(Int, Array[Double])], nProbe: Int): DataFrame = {
    val indexed = corpus.select(id.as("vec_id"), l2Normalize(vec).as("v"))
      .withColumn("cell", nearestCell(col("v"), cents))
    val probes = probeCellRanks(queries, qid, qvec, cents)
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    indexed.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("v"), col("qv")), 4).as("cos"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate
        .topk(col("cos"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "p")))
      .select(col("query_id"), col("p.id").as("vec_id"),
        col("p.score").as("cos"), (col("r") + 1).cast("long").as("rank"))
  }

  /** Multi-query BINARY (sign-bit) kNN join: for every query vector,
    * the `k` Hamming-nearest corpus vectors by packed sign signature
    * (ties to the lower id), reranked with exact cosine. The batched
    * form of [[binaryTopK]], shaped like [[knnJoin]]: the query batch
    * broadcasts, so ONE narrow corpus scan computes every (vector,
    * query) Hamming distance — two bit_count(xor) ops against in-row
    * longs, ~100× cheaper than a 64-dim float dot — and the per-query
    * top-k runs in the bounded `topk_agg` (map-side k-row states, no
    * window over the scan, the corpus never shuffles). Only the
    * ≤ k·|queries| shortlist rows are read at full precision. For
    * query sets too large to broadcast, this stops being a scan
    * problem and becomes pair mining — use the sign-block near-dup
    * path instead. Deterministic at every stage — oracle-checkable
    * end to end. */
  def hammingKnnJoin(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int,
      shortlist: Int = 0): DataFrame = {
    // Oversampled shortlist: stage 1 keeps `shortlist` (>= k) Hamming
    // candidates per query so the exact rerank can recover true
    // neighbors the 64-bit signature mis-ranks — the recall knob of the
    // two-stage shape (recall@k rises with shortlist while the full-
    // precision read stays `shortlist` rows per query). Default keeps
    // the historical shortlist == k behavior.
    val r = math.max(k, shortlist)
    val c = corpus.select(id.as("vec_id"), l2Normalize(vec).as("v"),
        signBits(vec, 0).as("lo"), signBits(vec, 32).as("hi"))
      .localCheckpoint(eager = false)
    val q = queries.select(qid.as("query_id"), l2Normalize(qvec).as("qv"),
        signBits(qvec, 0).as("qlo"), signBits(qvec, 32).as("qhi"))
      .localCheckpoint(eager = false)
    val ham = bit_count(col("lo").bitwiseXOR(col("qlo"))) +
      bit_count(col("hi").bitwiseXOR(col("qhi")))
    val shortIds = c.select(col("vec_id"), col("lo"), col("hi"))
      .crossJoin(broadcast(q.select(col("query_id"), col("qlo"),
        col("qhi"))))
      .select(col("query_id"), col("vec_id"),
        (-ham).cast("double").as("nham"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate
        .topk(col("nham"), col("vec_id"), r).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "p")))
      .select(col("query_id"), col("p.id").as("vec_id"))
    shortIds
      .join(c.select(col("vec_id"), col("v")), "vec_id")
      .join(q.select(col("query_id"), col("qv")), "query_id")
      .select(col("query_id"), col("vec_id"),
        round(dot(col("v"), col("qv")), 4).as("cos"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Multi-query INT8 two-stage kNN join: stage 1 ranks every corpus
    * row per query by the affine-decoded int8 approximation of its
    * cosine (the [[quantizedTopK]] arithmetic — all intermediates
    * integer-valued doubles, engine-reproducible), shortlists `rerank`
    * candidates per query in the bounded `topk_agg`, and stage 2
    * rescores ONLY the shortlist exactly. The batched form of
    * [[quantizedTopK]], shaped like [[hammingKnnJoin]].
    *
    * This is the high-recall ANN shape for embeddings WITHOUT cluster
    * structure: cell-probing (IVF/LSH) recall on isotropic vectors is
    * bounded by the scanned fraction (measured in the qe31 sweep —
    * recall ≈ nProbe/nList), while a compressed FULL scan loses almost
    * nothing to quantization — measured recall@10 ≥ 0.99 at
    * rerank = 50 over 100 queries. At scale stage 1 reads 1 byte/dim
    * (the stored `codes/` table of [[AnnIndex.writeQuantizedIndex]])
    * against 8 for float64 full precision, and stage 2 reads
    * `rerank` rows per query. The corpus never shuffles in either
    * stage. */
  def quantizedKnnJoin(corpus: DataFrame, id: Column, vec: Column,
      queries: DataFrame, qid: Column, qvec: Column, k: Int,
      rerank: Int): DataFrame = {
    val normed = corpus.select(id.as("vec_id"), l2Normalize(vec).as("v"))
    val (mn, mx) = int8Stats(normed)
    if (mn.isEmpty) return emptyKnnJoin(corpus, id)
    // decode is query-INDEPENDENT: one narrow map attaches the decoded
    // vector, and every query's approximate score is a plain dot
    // against it (sequential fold — the oracle's dim-ordered sum)
    val mnL = lit(mn.map(_.toDouble)); val mxL = lit(mx.map(_.toDouble))
    val dv = transform(col("v"), (x, i) => {
      val m = element_at(mnL, i + 1); val mM = element_at(mxL, i + 1)
      val xi = floor(x * lit(10000.0))
      val code = when(mM === m, lit(0.0)).otherwise(
        least(floor((xi - m) * lit(255.0) / (mM - m)), lit(255.0)))
      (m + code * (mM - m) / lit(255.0)) / lit(10000.0)
    })
    val c = normed.localCheckpoint(eager = false)
    val q = queries.select(qid.as("query_id"), l2Normalize(qvec).as("qv"))
      .localCheckpoint(eager = false)
    val shortIds = c.withColumn("dv", dv)
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        dot(col("dv"), col("qv")).as("ascore"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate
        .topk(col("ascore"), col("vec_id"), math.max(k, rerank)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "p")))
      .select(col("query_id"), col("p.id").as("vec_id"))
    shortIds
      .join(c.select(col("vec_id"), col("v")), "vec_id")
      .join(q.select(col("query_id"), col("qv")), "query_id")
      .select(col("query_id"), col("vec_id"),
        round(dot(col("v"), col("qv")), 4).as("cos"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 sign for the random-projection matrix: +1 when
    * the first hex digit of md5("j:i") is below '8'. md5 is the shared
    * deterministic randomness primitive across engines (same trick as
    * the portable MinHash lanes), so an oracle can rebuild the exact
    * matrix in SQL while Spark inlines it as literals. */
  def projectionSign(j: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$i".getBytes("UTF-8"))
    // first hex digit = high nibble of byte 0
    if (((d(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** Random projection (Johnson-Lindenstrauss with a ±1 sign matrix —
    * Achlioptas 2001): reduce `vec` to `outDims` components,
    * out[j] = Σ_i floor(vec[i]·1e4) · sign(j,i), emitted long-format
    * (vec_id, dim, out_e4). Elements are quantized to 1e-4 integers
    * BEFORE the sum, so results are exact integers — independent of
    * summation order and engine.
    *
    * Scale shape: the sign matrix is outDims×inDims literals baked into
    * the plan (a few KB — the classic dense-matmul-by-broadcast), and
    * the whole projection is ONE narrow codegen'd map stage: no
    * explode, no shuffle, no driver data motion. A 100 TB embedding
    * table projects at scan speed. */
  def randomProjection(embs: DataFrame, id: Column, vec: Column,
      outDims: Int, inDims: Int): DataFrame = {
    val q = transform(vec, v =>
      floor(v.cast("double") * lit(10000.0)).cast("long"))
    val outs = array((1 to outDims).map { j =>
      val signs = array((1 to inDims).map(i =>
        lit(projectionSign(j, i).toLong)): _*)
      aggregate(zip_with(q, signs, (v, s) => v * s),
        lit(0L), (acc, x) => acc + x)
    }: _*)
    embs.select(id.as("vec_id"), posexplode(outs).as(Seq("dim0", "out_e4")))
      .select(col("vec_id"), (col("dim0") + 1).cast("long").as("dim"),
        col("out_e4"))
  }
}
