package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** The keepVectors plain-PQ lifecycle (round 13): the opt-in that
  * turns the terminal-by-design family into a full lifecycle citizen —
  *  - keepVectors changes NOTHING about serving (probe parity with a
  *    plain build) and stores exactly the q4 grid;
  *  - the drift-state sidecar equals a from-scratch recompute over the
  *    live stored q4 vectors at every lifecycle point (build, append,
  *    batch-keyed put + replay, delete, batch fold, plain compact,
  *    retrain, append-after-retrain);
  *  - retrain-at-compact == fresh build over the live corpus BIT-exact
  *    (codebook, codes, probes), generation-pinned (whole-old or
  *    whole-new, crash convergence, reap);
  *  - a store built WITHOUT the flag refuses the monitor and the
  *    retrain loudly, naming the remedy. */
class AnnPqLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def halves = {
    val e = Tables.load(spark, sf, "embeddings")
    val nat = e.filter(col("vec_id") % 2 === 0)
    val drift = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") + lit(0.15))
          .as("embedding"))
    (nat, drift)
  }

  private def readCb(root: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$root/codebook").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val cb = Array.ofDim[Double](rows.map(_._1).max + 1,
      rows.map(_._2).max + 1, rows.map(_._3).max + 1)
    rows.foreach { case (m, c, d, x) => cb(m)(c)(d) = x }
    cb
  }

  /** Independent recompute of the PQ sidecar's contract: (live row
    * count, exact-integer PQ residual-error sum) over the current
    * generation's stored q4 vectors minus tombstones, under the
    * stored codebook. */
  private def recompute(path: String): (Long, Long) = {
    val root = AnnIndex.currentRoot(spark, path)
    val rows0 = spark.read.parquet(s"$root/vectors")
      .select(col("vec_id"), col("v"))
    val rows =
      if (!StoreFiles.exists(spark, s"$root/tombstones")) rows0
      else rows0.join(spark.read.parquet(s"$root/tombstones"),
        Seq("vec_id"), "left_anti")
    val r = rows.select(Similarity.pqMinDistExpr(col("v"),
        readCb(root)).cast("long").as("e"))
      .agg(count(lit(1)), coalesce(sum(col("e")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def sidecar(path: String): Option[(Long, Long)] =
    AnnIndex.readErrState(spark, AnnIndex.currentRoot(spark, path))

  private def assertMemoExact(path: String, at: String): Unit = {
    val want = recompute(path)
    assert(sidecar(path).contains(want),
      s"errstate != recompute after $at: sidecar=${sidecar(path)} " +
        s"recompute=$want")
  }

  private def probeOf(path: String, q: DataFrame): Seq[(Long, Long,
      Long, Long)] =
    AnnIndex.pqKnnJoinIndexed(spark, path, q, col("vec_id"),
        col("embedding"), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("keepVectors changes nothing about serving and stores the q4 grid; a flagless rebuild clears it") {
    val (nat, _) = halves
    val q = nat.filter(col("vec_id") < 10)
    val plain = tmp("pqkv_plain")
    val kept = tmp("pqkv_kept")
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"), plain,
      numSub = 8, codebookSize = 8)
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"), kept,
      numSub = 8, codebookSize = 8, keepVectors = true)
    val got = probeOf(kept, q)
    assert(got == probeOf(plain, q) && got.nonEmpty)
    // stored v IS pqQ4(raw) — the exact training/encode input
    val wantQ4 = nat.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(10000.0)).cast("double"))
          .as("v"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val gotQ4 = spark.read.parquet(s"$kept/vectors")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(gotQ4 == wantQ4)
    assertMemoExact(kept, "build")
    // rebuilding WITHOUT the flag over the same path must clear the
    // stale vectors + sidecar — they no longer match the codebook
    AnnIndex.writePqIndex(nat.limit(50), col("vec_id"),
      col("embedding"), kept, numSub = 8, codebookSize = 8)
    assert(!StoreFiles.exists(spark, s"$kept/vectors") &&
      !StoreFiles.exists(spark, s"$kept/errstate"))
  }

  test("PQ drift state: sidecar == recompute across build/append/delete/compact/retrain") {
    import spark.implicits._
    val (nat, drift) = halves
    val store = tmp("pqkv_life")
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"), store,
      numSub = 8, codebookSize = 8, keepVectors = true)
    assertMemoExact(store, "build")
    AnnIndex.appendPqIndex(drift, col("vec_id"), col("embedding"),
      store)
    assertMemoExact(store, "append")
    val ids = Seq(1L, 2L, 999999L).toDF("vec_id")
    AnnIndex.deleteVecs(spark, store, ids, col("vec_id"))
    assertMemoExact(store, "delete")
    AnnIndex.deleteVecs(spark, store, ids, col("vec_id"))
    assertMemoExact(store, "re-delete")
    AnnIndex.compactAnnIndex(spark, store)
    assertMemoExact(store, "plain compact")
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(1))
    assertMemoExact(store, "retrain")
    AnnIndex.appendPqIndex(drift.filter(col("vec_id") < 100)
        .select(col("vec_id") + 1000000L as "vec_id", col("embedding")),
      col("vec_id"), col("embedding"), store)
    assertMemoExact(store, "append after retrain")
  }

  test("PQ retrain == fresh build over the live corpus, generation-pinned, reaped") {
    import spark.implicits._
    val (nat, drift) = halves
    val store = tmp("pqkv_retr")
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"), store,
      numSub = 8, codebookSize = 8, keepVectors = true)
    AnnIndex.appendPqIndex(drift, col("vec_id"), col("embedding"),
      store)
    AnnIndex.deleteVecs(spark, store, Seq(3L, 4L).toDF("vec_id"),
      col("vec_id"))
    val union = nat.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double"))
          .as("embedding"))
      .unionByName(drift)
    val live = union.filter(!col("vec_id").isin(3L, 4L))
    val q = union.filter(col("vec_id") < 10)
    // a probe FRAME built now pins generation 0: evaluated after the
    // retrain it returns the whole-OLD result — never a mixed codebook
    val oldResult = probeOf(store, q)
    val pinnedFrame = AnnIndex.pqKnnJoinIndexed(spark, store, q,
      col("vec_id"), col("embedding"), k = 5)
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(1))
    assert(AnnIndex.currentGeneration(spark, store) == 1L)
    val pinnedAfter = pinnedFrame.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(pinnedAfter == oldResult && oldResult.nonEmpty)
    // retrain == fresh build over the live corpus: codebook, codes,
    // probes — bit-for-bit
    val fresh = tmp("pqkv_fresh")
    AnnIndex.writePqIndex(live, col("vec_id"), col("embedding"), fresh,
      numSub = 8, codebookSize = 8, keepVectors = true)
    val root = AnnIndex.currentRoot(spark, store)
    def cbRows(p: String) = spark.read.parquet(s"$p/codebook")
      .orderBy("m", "cidx", "dim").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSeq
    assert(cbRows(root) == cbRows(fresh))
    def codeRows(p: String) = spark.read.parquet(s"$p/codes")
      .select("vec_id", "codes").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(codeRows(root) == codeRows(fresh))
    assert(probeOf(store, q) == probeOf(fresh, q))
    assertMemoExact(store, "retrain")
    // crash-before-flip: new tables written, pointer still old — the
    // old generation serves; a re-run converges
    StoreFiles.delete(spark, s"$store/genptr")
    assert(AnnIndex.currentGeneration(spark, store) == 0L)
    assert(probeOf(store, q) == oldResult)
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(1))
    assert(AnnIndex.currentGeneration(spark, store) == 1L)
    val newResult = probeOf(store, q)
    assert(newResult == probeOf(fresh, q))
    // the next plain compact reaps the dead gen-0 dirs
    AnnIndex.compactAnnIndex(spark, store)
    assert(!StoreFiles.exists(spark, s"$store/codes") &&
      !StoreFiles.exists(spark, s"$store/codebook") &&
      !StoreFiles.exists(spark, s"$store/vectors") &&
      StoreFiles.exists(spark, s"$store/gens/g1/codes"))
    assert(probeOf(store, q) == newResult)
  }

  test("PQ batch-keyed puts are replay-idempotent; folds stay exact") {
    import spark.implicits._
    val (nat, drift) = halves
    val store = tmp("pqkv_put")
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"), store,
      numSub = 8, codebookSize = 8, keepVectors = true,
      batchKeyed = true)
    assertMemoExact(store, "build")
    val b0 = drift.filter(col("vec_id") % 4 === 1)
    val b1 = drift.filter(col("vec_id") % 4 === 3)
    AnnIndex.putPqBatch(b0, col("vec_id"), col("embedding"), store,
      batchId = 0L)
    assertMemoExact(store, "put 0")
    AnnIndex.putPqBatch(b1, col("vec_id"), col("embedding"), store,
      batchId = 1L)
    assertMemoExact(store, "put 1")
    val q = nat.filter(col("vec_id") < 10)
    val once = probeOf(store, q)
    // replay of batch 0: dynamic overwrite of codes, vectors AND the
    // errstate partition — nothing double-counts, probes unchanged
    AnnIndex.putPqBatch(b0, col("vec_id"), col("embedding"), store,
      batchId = 0L)
    assertMemoExact(store, "replayed put 0")
    assert(probeOf(store, q) == once)
    AnnIndex.compactPqBatches(spark, store, keepFrom = 1L)
    assertMemoExact(store, "batch fold")
    assert(spark.read.parquet(
        s"${AnnIndex.currentRoot(spark, store)}/errstate")
      .select(col("batch_id")).distinct().as[Long].collect().toSet ==
      Set(-1L, 1L))
    assert(probeOf(store, q) == once)
  }

  test("a flagless plain-PQ store refuses the monitor and the retrain, naming the remedy") {
    val (nat, drift) = halves
    val store = tmp("pqkv_term")
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"), store,
      numSub = 8, codebookSize = 8)
    val monEx = intercept[IllegalArgumentException] {
      AnnIndex.assignmentDrift(spark, store, drift, col("vec_id"),
        col("embedding")).head()
    }
    assert(monEx.getMessage.contains("keepVectors"))
    val retrEx = intercept[IllegalArgumentException] {
      AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(1))
    }
    assert(retrEx.getMessage.contains("keepVectors"))
  }

  test("PQ monitor: control quiesces, drift triggers once, the retrained store quiesces") {
    val (nat, drift) = halves
    val store = tmp("pqkv_mon")
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"), store,
      numSub = 8, codebookSize = 8, keepVectors = true)
    val control = nat.filter(col("vec_id") < 400)
    val drifted = drift.filter(col("vec_id") < 400)
    val rC = AnnIndex.assignmentDrift(spark, store, control,
      col("vec_id"), col("embedding")).head().getDouble(4)
    val rD = AnnIndex.assignmentDrift(spark, store, drifted,
      col("vec_id"), col("embedding")).head().getDouble(4)
    info(s"control ratio $rC, drifted ratio $rD")
    assert(rD > rC)
    // threshold between the two measured bands: control never
    // triggers, the drifted batch triggers exactly once, and after
    // the retrain (store still natural-only — the monitor is
    // pre-ingest) the drifted batch re-read reflects the SAME model
    // (nothing ingested, nothing changed) so the control still passes
    val mid = (rC + rD) / 2
    assert(!AnnIndex.retrainIfDrifted(spark, store, control,
      col("vec_id"), col("embedding"), maxRatio = mid))
    assert(AnnIndex.currentGeneration(spark, store) == 0L)
    assert(AnnIndex.retrainIfDrifted(spark, store, drifted,
      col("vec_id"), col("embedding"), maxRatio = mid))
    assert(AnnIndex.currentGeneration(spark, store) == 1L)
    // ingest the drifted half, retrain, and the drifted batch now
    // reads in-distribution — the loop quiesces
    AnnIndex.appendPqIndex(drift, col("vec_id"), col("embedding"),
      store)
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(1))
    val rQ = AnnIndex.assignmentDrift(spark, store, drifted,
      col("vec_id"), col("embedding")).head().getDouble(4)
    info(s"post-ingest post-retrain drifted ratio $rQ")
    assert(!AnnIndex.retrainIfDrifted(spark, store, drifted,
      col("vec_id"), col("embedding"), maxRatio = mid))
  }

  test("manifest: ann_pq rows surface the keep_vectors opt-in and the drift state") {
    val root = tmp("pqkv_man")
    def at(n: String) = s"$root/$n"
    val (nat, _) = halves
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"),
      at("plain"), numSub = 8, codebookSize = 8)
    AnnIndex.writePqIndex(nat, col("vec_id"), col("embedding"),
      at("kept"), numSub = 8, codebookSize = 8, keepVectors = true)
    val m = StoreManifest.manifest(spark, root)
      .select("store", "family", "meta", "has_drift_state").collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        r.getMap[String, String](2).toMap, r.getBoolean(3)))).toMap
    assert(m("plain")._1 == "ann_pq" &&
      m("plain")._2("keep_vectors") == "false" && !m("plain")._3)
    assert(m("kept")._1 == "ann_pq" &&
      m("kept")._2("keep_vectors") == "true" && m("kept")._3)
  }
}
