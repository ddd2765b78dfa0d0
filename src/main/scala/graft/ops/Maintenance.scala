package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The maintenance PLANNER over [[StoreManifest]]'s health registry —
  * the closing step of the store-lifecycle discipline: the registry
  * says what state every store under a root is in; [[plan]] turns
  * those signals into dispatchable actions, and [[applyPlan]] runs
  * them with the right per-family compact. A 100 TB deployment's
  * nightly maintenance window is then two calls, not a hand-written
  * walk over seven family APIs.
  *
  * Signals → action (all registry-derived, no data scans beyond the
  * manifest's own footer reads):
  *  - `tombstone_rows > 0`    → compact (physical drop shrinks probes)
  *  - `pending_patches > 0`   → compact (materialize the relabel log)
  *  - `dead_generations > 0`  → compact (reap retired model roots)
  *  - retrainable family without `errstate/` → compact (writes the
  *    memoized drift sidecar — the legacy-store upgrade path)
  *  - family `unknown`        → inspect (describe, never auto-touch a
  *    directory the walk can't classify)
  *
  * Deliberately NOT planned here: drift-triggered RETRAINS. Drift is a
  * property of an arriving batch against the store's model
  * ([[AnnIndex.assignmentDrift]]) — the arrival loop owns that signal
  * and calls [[AnnIndex.retrainIfDrifted]] per batch; a root walk has
  * no arrival to measure, and retraining on a schedule instead of a
  * signal is exactly what the monitor exists to avoid.
  *
  * Quiesce contract: [[applyPlan]] runs plain compacts, so the
  * existing per-family rules apply — writers quiesced per store;
  * probes may keep running against every family EXCEPT a store whose
  * dead generations are being reaped while a probe is still pinned to
  * one (the documented reap grace period).
  */
object Maintenance {

  /** Retrainable = carries (or should carry) the drift sidecar: the
    * trained families, plus plain PQ only when built with
    * `keepVectors` (without it the family is terminal under drift by
    * design — a missing sidecar there is the contract, not a gap). */
  private def retrainable = col("family").isin("ann_ivf", "ann_ivfpq") ||
    (col("family") === "ann_pq" &&
      element_at(col("meta"), "keep_vectors") === "true")

  /** One row per store under `root`: (store, family, action, reasons)
    * with action ∈ compact | inspect | none and `reasons` the
    * triggering signals (empty for none). The frame is
    * manifest-derived, so its cost class is the manifest's (explicit
    * operator — not a per-micro-batch trigger). */
  def plan(spark: SparkSession, root: String): DataFrame =
    plan(StoreManifest.manifest(spark, root))

  /** [[plan]] over an ALREADY-BUILT manifest frame — the reuse seam for
    * callers that read registry signals AND dispatch off the same walk
    * (one manifest walk instead of two; the walk is the operator's
    * whole cost: per-store directory listings + footer reads). The
    * caller owns freshness: the plan reflects store state AS OF the
    * manifest's walk. */
  def plan(m: DataFrame): DataFrame = {
    val reasons = array_compact(array(
      when(col("tombstone_rows") > 0,
        concat(col("tombstone_rows").cast("string"),
          lit(" tombstoned rows pending physical drop"))),
      when(col("pending_patches") > 0,
        concat(col("pending_patches").cast("string"),
          lit(" relabel patches pending materialization"))),
      when(col("dead_generations") > 0,
        concat(col("dead_generations").cast("string"),
          lit(" dead generation roots pending reap"))),
      when(retrainable && !col("has_drift_state"),
        lit("drift sidecar missing — compact writes it " +
          "(legacy-store upgrade)"))))
    m.select(col("store"), col("family"),
        when(col("family") === "unknown", lit("inspect"))
          .when(size(reasons) > 0, lit("compact"))
          .otherwise(lit("none")).as("action"),
        when(col("family") === "unknown",
            array(lit("unclassified directory — describe, don't touch")))
          .otherwise(reasons).as("reasons"))
      .orderBy(col("store"))
  }

  /** Run [[plan]] and execute its `compact` rows with each family's
    * own compact (`inspect` rows are returned, never touched), then
    * return the executed plan. The collect is bounded by construction:
    * one row per child directory of `root` — the manifest's own walk
    * size, not data-sized. */
  def applyPlan(spark: SparkSession, root: String,
      manifest: Option[DataFrame] = None): DataFrame = {
    val p = manifest.fold(plan(spark, root))(plan).localCheckpoint()
    p.filter(col("action") === "compact")
      .select(col("store"), col("family")).collect()
      .foreach { r =>
        val path = s"$root/${r.getString(0)}"
        r.getString(1) match {
          case f if f.startsWith("ann_") =>
            AnnIndex.compactAnnIndex(spark, path)
          case "fingerprint" => FingerprintIndex.compact(spark, path)
          case "lexical" => LexIndex.compactBm25Index(spark, path)
          case "dedup" => DedupIndex.compact(spark, path)
          case "cluster_map" => DedupIndex.compactClusterMap(spark, path)
          case "sketch" => SketchStore.compact(spark, path)
          case other =>
            // a family the dispatch doesn't know is a bug in THIS
            // file (classify and plan agreed it needs work) — loud,
            // not skipped
            throw new IllegalStateException(
              s"no compact dispatch for family '$other' at $path")
        }
      }
    p
  }
}
