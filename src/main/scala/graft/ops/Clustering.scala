package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means over an embedding column, and the SemDeDup-style
  * semantic dedup built on top of it (Abbas et al. 2023: cluster the
  * corpus, then near-duplicate pairs only WITHIN a cluster — the cluster
  * is the blocking key that keeps pairwise cosine sub-quadratic).
  *
  * Everything is deterministic and ENGINE-PORTABLE so the whole pipeline
  * is DuckDB-oracle-checkable end to end:
  *   - seeds: the k vectors ordering first by md5("km:" || vec_id) —
  *     no RNG, stable on any engine/partitioning (same discipline as
  *     the IVF centroid sample);
  *   - spherical k-means: vectors L2-normalized once, assignment is
  *     argmax dot with the HIGHER-cell tiebreak (mirrors `greatest` on
  *     (score, cell) structs);
  *   - each Lloyd update rounds the per-cell mean to 1e-6 per element
  *     BEFORE re-normalizing: double summation order differs across
  *     engines by ~1e-13 relative, so rounding at 1e-6 makes the
  *     centroid bytes equal on both sides and every later dot product
  *     bit-identical (the residual risk is a sum landing within 1e-12
  *     of a rounding boundary — the same measure-zero class as an
  *     exact dot-product tie in assignment).
  *
  * Scale shape: assignment embeds the k×dim centroids as plan literals —
  * a pure partition-local map over the corpus, NO shuffle; each Lloyd
  * update is posexplode + ONE (cell, dim) hash aggregation (map-side
  * combined to ≤ k·dim rows per partition) and a k·dim-double collect —
  * driver state is bounded by the model size, never the corpus. The
  * dedup's pairwise stage is an equi-join on `cell`.
  */
object Clustering {

  /** Seed centroids: the `k` normalized corpus vectors sorting first by
    * (md5("km:" || id), id). One bounded collect (k × dim doubles). */
  def kmeansSeeds(corpus: DataFrame, id: Column, vec: Column,
      k: Int): Array[(Int, Array[Double])] =
    corpus.select(id.as("cid"), Similarity.l2Normalize(vec).as("cv"))
      .orderBy(md5(concat(lit("km:"), col("cid").cast("string"))), col("cid"))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }

  private def round6(x: Double): Double =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** `iters` Lloyd rounds from the md5 seeds. Per round: shuffle-free
    * literal-centroid assignment, one (cell, dim) aggregation, means
    * rounded to 1e-6 and re-normalized (empty cell or zero norm keeps
    * the previous centroid — mirrored in the oracle SQL). */
  def kmeansCentroids(corpus: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int): Array[(Int, Array[Double])] = {
    var cents = kmeansSeeds(corpus, id, vec, k)
    if (cents.length <= 1) return cents
    val normed = corpus.select(Similarity.l2Normalize(vec).as("v"))
    for (_ <- 0 until iters) {
      val sums = normed
        .withColumn("cell", Similarity.nearestCell(col("v"), cents))
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
              mean(r.getInt(1)) = round6(r.getDouble(2) / r.getLong(3).toDouble)
            }
            // ascending-dim fold — the same order list_dot_product uses
            var ss = 0.0
            var i = 0
            while (i < mean.length) { ss += mean(i) * mean(i); i += 1 }
            val norm = math.sqrt(ss)
            if (norm == 0.0) (cell, old) else (cell, mean.map(_ / norm))
          case None => (cell, old)
        }
      }
    }
    cents
  }

  /** Cluster assignment after `iters` Lloyd rounds: one row per corpus
    * vector — (vec_id, cell, cos) with `cos` the rounded similarity to
    * the vector's centroid. The final pass is the same shuffle-free
    * literal-centroid map as the build. */
  def kmeansAssign(corpus: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int): DataFrame = {
    val cents = kmeansCentroids(corpus, id, vec, k, iters)
    val scored = corpus.select(id.as("vec_id"),
      Similarity.l2Normalize(vec).as("v"))
    // greatest() over (score, cell) structs, as the native reference-
    // object argmax (one janino compile shared across iterations and
    // centroid sets — [[graft.functions.CellArgmax]])
    val pick =
      if (cents.length == 1) struct(Similarity.dot(col("v"),
        lit(cents.head._2)).as("score"), lit(cents.head._1).as("cell"))
      else graft.functions.VectorExpressions.cellArgmax(col("v"), cents)
    scored
      .withColumn("_b", pick)
      .select(col("vec_id"), col("_b.cell").as("cell"),
        round(col("_b.score"), 4).as("cos"))
  }

  /** SemDeDup: cluster, then drop every vector with a ≥ `threshold`
    * cosine twin of SMALLER id in the SAME cluster (the deterministic
    * keep-lowest-id policy). Returns (vec_id, cell, kept). The pairwise
    * join is blocked by `cell` — candidate volume is Σ_cells n_c², not
    * n²; at 100 TB, k scales with the corpus so cells stay bounded and
    * the join is a plain equi-join on the cluster key. */
  def semanticDedup(corpus: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int, threshold: Double): DataFrame = {
    val cents = kmeansCentroids(corpus, id, vec, k, iters)
    val scored = corpus.select(id.as("vec_id"),
      Similarity.l2Normalize(vec).as("v"))
    val assigned = scored
      .withColumn("cell",
        (if (cents.length == 1) lit(cents.head._1)
         else graft.functions.VectorExpressions
           .cellArgmax(col("v"), cents).getField("cell")))
      .select(col("vec_id"), col("cell"), col("v"))
      .localCheckpoint(eager = false)
    val dropped = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id") &&
          round(Similarity.dot(col("a.v"), col("b.v")), 4) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assigned
      .join(dropped.withColumn("_drop", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("_drop").isNull.as("kept"))
  }
}
