package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Round-13 trained-store lifecycle specs:
  *  - the memoized drift state (`errstate/`) equals a from-scratch
  *    recompute over the live stored rows at EVERY lifecycle point —
  *    build, append, batch-keyed put (+ replay), delete, batch fold,
  *    plain compact, retrain — for both trained families;
  *  - the monitor actually READS the sidecar (corrupting it changes
  *    the reported stored side; removing it falls back to the exact
  *    recompute scan — the legacy-store path);
  *  - generation-pinned retrain: a probe frame built before a retrain
  *    evaluates whole-OLD after it (the old generation keeps serving),
  *    a fresh probe serves whole-NEW ≡ fresh-build, a crash before the
  *    pointer flip leaves the old generation serving and a re-run
  *    converges, and a plain compact reaps dead generations. */
class AnnGenDriftSpec extends AnyFunSuite {

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

  /** Independent recompute of the sidecar's contract: (live row count,
    * 1e-6-floored quantization-error sum) over the CURRENT generation's
    * stored vectors minus tombstones, under the stored centroids. */
  private def recompute(path: String): (Long, Long) = {
    val root = AnnIndex.currentRoot(spark, path)
    val sub =
      if (StoreFiles.exists(spark, s"$root/vectors")) "vectors"
      else "index"
    val cents = spark.read.parquet(s"$root/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val rows0 = spark.read.parquet(s"$root/$sub")
      .select(col("vec_id"), col("v"))
    val rows =
      if (!StoreFiles.exists(spark, s"$root/tombstones")) rows0
      else rows0.join(spark.read.parquet(s"$root/tombstones"),
        Seq("vec_id"), "left_anti")
    val r = rows.select(floor((lit(1.0) -
        Similarity.nearestCellScore(col("v"), cents)) *
        lit(1000000.0)).cast("long").as("e"))
      .agg(count(lit(1)), coalesce(sum(col("e")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def sidecar(path: String): Option[(Long, Long)] =
    AnnIndex.readErrState(spark,
      AnnIndex.currentRoot(spark, path))

  private def assertMemoExact(path: String, at: String): Unit = {
    val want = recompute(path)
    assert(sidecar(path).contains(want),
      s"errstate != recompute after $at: sidecar=${sidecar(path)} " +
        s"recompute=$want")
  }

  test("IVF drift state: sidecar == recompute across build/append/delete/compact/retrain") {
    import spark.implicits._
    val (nat, drift) = halves
    val store = tmp("gd_ivf")
    AnnIndex.writeIvfIndex(nat, col("vec_id"), col("embedding"), store,
      nList = 8, refineIters = 1)
    assertMemoExact(store, "build")
    AnnIndex.appendIvfIndex(drift, col("vec_id"), col("embedding"),
      store)
    assertMemoExact(store, "append")
    // delete subtracts EXACTLY the newly-tombstoned live rows' error;
    // a second delete of the same ids (plus one absent id) subtracts
    // nothing — the call is idempotent on the sidecar
    val ids = Seq(1L, 2L, 999999L).toDF("vec_id")
    AnnIndex.deleteVecs(spark, store, ids, col("vec_id"))
    assertMemoExact(store, "delete")
    AnnIndex.deleteVecs(spark, store, ids, col("vec_id"))
    assertMemoExact(store, "re-delete")
    AnnIndex.compactAnnIndex(spark, store)
    assertMemoExact(store, "plain compact")
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(1))
    assertMemoExact(store, "retrain")
    // ... and appends under the RETRAINED model keep folding exactly
    AnnIndex.appendIvfIndex(drift.filter(col("vec_id") < 100)
        .select(col("vec_id") + 1000000L as "vec_id", col("embedding")),
      col("vec_id"), col("embedding"), store)
    assertMemoExact(store, "append after retrain")
  }

  test("IVF-PQ drift state: batch-keyed puts are replay-idempotent; folds and retrain stay exact") {
    import spark.implicits._
    val (nat, drift) = halves
    val store = tmp("gd_pq")
    AnnIndex.writeIvfPqIndex(nat, col("vec_id"), col("embedding"),
      store, nList = 4, numSub = 8, codebookSize = 8, refineIters = 1,
      batchKeyed = true)
    assertMemoExact(store, "build")
    val b0 = drift.filter(col("vec_id") % 4 === 1)
    val b1 = drift.filter(col("vec_id") % 4 === 3)
    AnnIndex.putIvfPqBatch(b0, col("vec_id"), col("embedding"), store,
      batchId = 0L)
    assertMemoExact(store, "put 0")
    AnnIndex.putIvfPqBatch(b1, col("vec_id"), col("embedding"), store,
      batchId = 1L)
    assertMemoExact(store, "put 1")
    // replay of batch 0: dynamic overwrite of both the data partition
    // AND the errstate partition — the sidecar must not double-count
    AnnIndex.putIvfPqBatch(b0, col("vec_id"), col("embedding"), store,
      batchId = 0L)
    assertMemoExact(store, "replayed put 0")
    // fold committed batches; the in-flight batch (>= keepFrom) keeps
    // its own partition so a later replay still composes
    AnnIndex.compactIvfPqBatches(spark, store, keepFrom = 1L)
    assertMemoExact(store, "batch fold")
    assert(spark.read.parquet(
        s"${AnnIndex.currentRoot(spark, store)}/errstate")
      .select(col("batch_id")).distinct().as[Long].collect().toSet ==
      Set(-1L, 1L))
    AnnIndex.deleteVecs(spark, store, Seq(3L).toDF("vec_id"),
      col("vec_id"))
    assertMemoExact(store, "delete")
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(1))
    assertMemoExact(store, "retrain")
  }

  test("assignmentDrift reads the sidecar when present and falls back exactly when absent") {
    val (nat, drift) = halves
    val store = tmp("gd_mon")
    AnnIndex.writeIvfIndex(nat, col("vec_id"), col("embedding"), store,
      nList = 8, refineIters = 1)
    val batch = drift.filter(col("vec_id") < 100)
    def monitorRow() = AnnIndex.assignmentDrift(spark, store, batch,
      col("vec_id"), col("embedding")).head()
    val honest = monitorRow()
    assert((honest.getLong(0), honest.getLong(1)) == recompute(store))
    // corrupt the sidecar: the monitor must REPORT the corrupted
    // numbers — proof the per-arrival path reads store state, not a
    // corpus rescan
    val root = AnnIndex.currentRoot(spark, store)
    spark.createDataFrame(Seq((-1L, 7L, 42L)))
      .toDF("batch_id", "n", "sum_e6").coalesce(1)
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(s"$root/errstate")
    val corrupted = monitorRow()
    assert(corrupted.getLong(0) == 7L && corrupted.getLong(1) == 42L)
    // remove it: the legacy fallback recomputes the honest numbers
    StoreFiles.delete(spark, s"$root/errstate")
    val fallback = monitorRow()
    assert((fallback.getLong(0), fallback.getLong(1)) ==
      (honest.getLong(0), honest.getLong(1)))
    assert(fallback.getDouble(4) == honest.getDouble(4))
    // ... and the store regains the sidecar at its next compact (the
    // legacy upgrade path), again exact
    AnnIndex.compactAnnIndex(spark, store)
    assertMemoExact(store, "upgrade compact")
  }

  test("vector arrival loop: gate screens re-ingests, ingest folds the sidecar exactly, replay quiesces") {
    import spark.implicits._
    val (nat, drift) = halves
    val natD = nat.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val serving = tmp("gd_loop_pq")
    val gate = tmp("gd_loop_bin")
    AnnIndex.writeIvfPqIndex(nat, col("vec_id"), col("embedding"),
      serving, nList = 4, numSub = 8, codebookSize = 8,
      refineIters = 1)
    AnnIndex.writeBinaryIndex(nat, col("vec_id"), col("embedding"),
      gate)
    // one loop pass: gate → ingest both stores → monitor → conditional
    // retrain; returns (survivor ids, retrained?)
    def loopOnce(arrival: org.apache.spark.sql.DataFrame)
        : (Set[Long], Boolean) = {
      val sig = arrival.select(col("vec_id"),
          Similarity.l2Normalize(col("embedding")).as("v"),
          Similarity.signBits(col("embedding"), 0).as("lo"),
          Similarity.signBits(col("embedding"), 32).as("hi"))
        .localCheckpoint()
      def blocksOf(df: org.apache.spark.sql.DataFrame, idAs: String) =
        df.select(col("vec_id").as(idAs),
          posexplode(Similarity.signBlockArray(col("lo"), col("hi")))
            .as(Seq("bidx", "bval")))
      val bB = blocksOf(sig, "vec_id")
      val inDup = bB.as("a").join(bB.as("b"),
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
      val iBlocks = spark.read.parquet(s"$gate/bits")
        .select(col("vec_id").as("idx_id"),
          posexplode(Similarity.signBlockArray(col("lo"), col("hi")))
            .as(Seq("bidx", "bval")))
      val hit = blocksOf(solo, "vec_id")
        .join(iBlocks, Seq("bidx", "bval"))
        .select(col("vec_id"), col("idx_id")).distinct()
        .join(solo.select(col("vec_id"), col("v").as("bv")), "vec_id")
        .join(spark.read.parquet(s"$gate/vectors")
          .select(col("vec_id").as("idx_id"), col("v").as("iv")),
          "idx_id")
        .filter(round(Similarity.dot(col("bv"), col("iv")), 4) >= 0.99)
        .select(col("vec_id")).distinct()
      val fresh = solo.join(hit, Seq("vec_id"), "left_anti")
        .localCheckpoint()
      fresh.select(col("vec_id"), col("v"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("append").parquet(s"$gate/vectors")
      fresh.select(col("vec_id"), col("lo"), col("hi"))
        .write.mode("append").parquet(s"$gate/bits")
      val freshRaw = arrival
        .join(fresh.select("vec_id"), Seq("vec_id"), "left_semi")
        .localCheckpoint(eager = false)
      if (!fresh.isEmpty) {
        AnnIndex.appendIvfPqIndex(freshRaw, col("vec_id"),
          col("embedding"), serving)
        info("monitor row: " + AnnIndex.assignmentDrift(spark,
          serving, freshRaw, col("vec_id"), col("embedding"))
          .head().toString)
      }
      // threshold inside the fixture's measured separation at this
      // tiny SF: the post-ingest drifted ratio reads 1.0724 here
      // (dilution: the stored side already holds the survivors), an
      // in-distribution batch ~1.0 — 1.05 splits them
      val retrained = AnnIndex.retrainIfDrifted(spark, serving,
        freshRaw, col("vec_id"), col("embedding"), maxRatio = 1.05,
        retrainIters = 1)
      (fresh.select("vec_id").as[Long].collect().toSet, retrained)
    }
    val arrival = natD.filter(col("vec_id") < 40).unionByName(drift)
      .localCheckpoint(eager = false)
    val reIngests = natD.filter(col("vec_id") < 40)
      .select("vec_id").as[Long].collect().toSet
    val (surv1, retr1) = loopOnce(arrival)
    // the gate screened every verbatim re-ingest; the drifted half
    // (plus any in-batch near-dup collapse) went through, the sidecar
    // folded exactly through gate → ingest → retrain, the drifted
    // arrival tripped the retrain, and the store is at generation 1
    assert((surv1 & reIngests).isEmpty && surv1.nonEmpty)
    assert(retr1 && AnnIndex.currentGeneration(spark, serving) == 1L)
    assertMemoExact(serving, "loop pass 1")
    // REPLAY the whole arrival: everything now matches itself in the
    // gate index (cosine 1.0) — zero survivors, no ingest, no retrain,
    // generation unchanged, sidecar untouched
    val before = sidecar(serving)
    val (surv2, retr2) = loopOnce(arrival)
    assert(surv2.isEmpty && !retr2)
    assert(AnnIndex.currentGeneration(spark, serving) == 1L)
    assert(sidecar(serving) == before)
    assertMemoExact(serving, "replayed loop pass")
  }

  test("generation-pinned retrain: whole-old or whole-new probes, crash convergence, reap") {
    val (nat, drift) = halves
    val union = nat.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double"))
          .as("embedding"))
      .unionByName(drift)
    val store = tmp("gd_gen")
    AnnIndex.writeIvfIndex(nat, col("vec_id"), col("embedding"), store,
      nList = 8, refineIters = 1)
    AnnIndex.appendIvfIndex(drift, col("vec_id"), col("embedding"),
      store)
    val q = union.filter(col("vec_id") < 5)
    def probe() = AnnIndex.ivfKnnJoinIndexed(spark, store, q,
        col("vec_id"), col("embedding"), k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    val oldResult = probe()
    // a probe FRAME built now pins generation 0 (the root resolves at
    // frame-construction time): evaluated after the retrain below, it
    // must return the whole-OLD result — never a mix
    val pinnedFrame = AnnIndex.ivfKnnJoinIndexed(spark, store, q,
      col("vec_id"), col("embedding"), k = 5, nProbe = 3)
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(2))
    assert(AnnIndex.currentGeneration(spark, store) == 1L)
    val pinnedAfter = pinnedFrame.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(pinnedAfter == oldResult && oldResult.nonEmpty)
    // a fresh probe serves the new generation ≡ a fresh full build
    val fresh = tmp("gd_gen_f")
    AnnIndex.writeIvfIndex(union, col("vec_id"), col("embedding"),
      fresh, nList = 8, refineIters = 2)
    def probeOf(p: String) = AnnIndex.ivfKnnJoinIndexed(spark, p, q,
        col("vec_id"), col("embedding"), k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    val newResult = probe()
    assert(newResult == probeOf(fresh))
    // crash-before-flip: the new generation's tables exist but the
    // pointer still names the old — the OLD model keeps serving
    StoreFiles.delete(spark, s"$store/genptr")
    assert(AnnIndex.currentGeneration(spark, store) == 0L)
    assert(probe() == oldResult)
    // re-running the retrain converges: the half-written (here:
    // fully-written but unflipped) next root is rebuilt and flipped
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(2))
    assert(AnnIndex.currentGeneration(spark, store) == 1L)
    assert(probe() == newResult)
    // a second retrain stacks another generation; the next plain
    // compact REAPS every dead generation (gen-0 data dirs at the
    // store root and gens/g1), leaving the current one serving
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(2))
    assert(AnnIndex.currentGeneration(spark, store) == 2L)
    AnnIndex.compactAnnIndex(spark, store)
    assert(!StoreFiles.exists(spark, s"$store/index") &&
      !StoreFiles.exists(spark, s"$store/centroids") &&
      !StoreFiles.exists(spark, s"$store/gens/g1") &&
      StoreFiles.exists(spark, s"$store/gens/g2/index"))
    assert(probe() == newResult)
  }
}
