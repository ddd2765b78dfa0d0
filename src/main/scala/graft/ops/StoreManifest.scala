package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unified introspection over the persisted store families — the
  * operational table-stakes of a real deployment: a 100 TB lakehouse
  * root accumulates sketch stores, dedup indexes, ANN indexes of six
  * layouts, lexical indexes, fingerprint stores and cluster maps, each
  * with its own sidecars, and "what lives under this root" must be one
  * call, not seven per-family `readMeta` idioms.
  *
  * [[StoreManifest.manifest]] walks ONE level below the root, classifies
  * each child directory by the sub-table layout its family writes
  * (`sigs/`+`bands/` → fingerprint; `postings/` → lexical;
  * `codes/`+`centroids/` → IVF-PQ; …), reads the family's tiny meta
  * sidecar when it has one, derives the attribute columns from the
  * stage-1 table's parquet schema (schema footer reads only — no data
  * scan), and reports whether the store is batch-keyed and whether a
  * tombstone sidecar is pending compaction. Unrecognized directories
  * report family "unknown" rather than erroring — a manifest of a dirty
  * root should describe it, not die on it.
  *
  * Cost shape: O(child stores) directory listings + one parquet footer
  * read per classified store (sidecars are single-row tables; centroid
  * counts are nList-row reads). An explicit-operator cost, same class
  * as [[StoreFiles.storeStats]] — not for a per-micro-batch trigger.
  */
object StoreManifest {

  /** One classified store: `store` (directory name under the root),
    * `family`, `meta` (the family's sidecar fields, stringified),
    * `attr_columns` (filtered-serving attrs denormalized onto the
    * stage-1 table), `batch_keyed`, `has_tombstones` — plus the
    * HEALTH REGISTRY signals a deployment schedules maintenance from:
    * `generation` (trained ANN stores — how many retrains this store
    * has served through; classification follows the pointer, so a
    * retrained store still manifests by its family), `tombstone_rows`
    * (> 0 ⇒ a compact will shrink probes), `pending_patches` (cluster
    * maps: relabel-log rows awaiting [[DedupIndex.compactClusterMap]]),
    * `has_drift_state` (trained ANN stores: the memoized
    * quantization-error sidecar is present, so the drift monitor's
    * per-arrival check is batch-sized — absent means a legacy store
    * that upgrades at its next compact), `dead_generations`
    * (generation roots a retrain left behind that the next plain
    * compact will reap — storage pending reclaim, counted as ROOTS:
    * the store-level gen-0 data dirs count as one when any remain).
    * "What needs compact/retrain under this root" is then one
    * DataFrame filter — and [[Maintenance.plan]] derives the dispatch.
    */
  case class StoreEntry(store: String, family: String,
      meta: Map[String, String], attr_columns: Seq[String],
      batch_keyed: Boolean, has_tombstones: Boolean,
      generation: Long, tombstone_rows: Long, pending_patches: Long,
      has_drift_state: Boolean, dead_generations: Long)

  // per-family reserved (non-attr) columns of the stage-1 table
  private val FpReserved =
    Set("doc_id", "sh", "block_idx", "block_val", "bpfx", "batch_id")
  private val VecReserved =
    Set("vec_id", "v", "bucket", "cell", "codes", "lo", "hi", "batch_id")
  private val LexReserved =
    Set("term", "doc_id", "dl", "tf", "tpfx", "batch_id")

  /** Classify every immediate child of `root` — see object doc. */
  def manifest(spark: SparkSession, root: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries: Seq[StoreEntry] =
      if (!fs.exists(rootPath)) Nil
      else fs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName)
        .map(s => classify(spark, fs, s.getPath))
    import spark.implicits._
    entries.toDS().toDF()
  }

  private def classify(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      store: org.apache.hadoop.fs.Path): StoreEntry = {
    // trained ANN stores serve from a generation root after a retrain
    // — classify what the PROBES read, not the pointer plumbing. A
    // corrupt pointer degrades to generation 0 (describe, don't die).
    val generation =
      try AnnIndex.currentGeneration(spark, store.toString)
      catch { case scala.util.control.NonFatal(_) => 0L }
    val root = new org.apache.hadoop.fs.Path(
      if (generation == 0L) store.toString
      else s"$store/gens/g$generation")
    val subs =
      try fs.listStatus(root)
        .filter(_.isDirectory).map(_.getPath.getName).toSet
      catch { case scala.util.control.NonFatal(_) => Set.empty[String] }
    // dead generation ROOTS pending reap (listing-only): earlier
    // gens/g* plus — when any survive — the store-level gen-0 data
    // dirs, which count as one root together
    val deadGens =
      if (generation == 0L) 0L
      else {
        def dirExists(p: String) =
          try fs.exists(new org.apache.hadoop.fs.Path(p))
          catch { case scala.util.control.NonFatal(_) => false }
        val gen0 = Seq("index", "codes", "bits", "vectors", "centroids",
          "codebook", "stats", "tombstones", "errstate")
          .exists(d => dirExists(s"$store/$d"))
        (if (gen0) 1L else 0L) +
          (1L until generation).count(g => dirExists(s"$store/gens/g$g"))
      }
    def p(sub: String) = s"$root/$sub"
    // schema reads are memoized per sub-table: a classification asks
    // for the stage-1 columns twice (attrs + batch_keyed), and each
    // read re-lists the table's partition directories — on a 64-way
    // band fan-out that is a distributed listing job per call
    val colsMemo = scala.collection.mutable.Map.empty[String, Seq[String]]
    def cols(sub: String): Seq[String] =
      colsMemo.getOrElseUpdate(sub,
        spark.read.parquet(p(sub)).columns.toIndexedSeq)
    // the single-row sidecar, stringified field-by-field
    def sidecar(sub: String): Map[String, String] =
      if (!subs.contains(sub)) Map.empty
      else {
        val df = spark.read.parquet(p(sub))
        df.head(1).headOption.fold(Map.empty[String, String]) { r =>
          df.columns.zipWithIndex
            .map { case (c, i) => c -> String.valueOf(r.get(i)) }.toMap
        }
      }
    // count-shaped signals read parquet FOOTERS driver-side (equal to
    // .count() by the parquet contract) — no job launch per signal
    def count(sub: String): String =
      StoreFiles.parquetRowCount(spark, p(sub)).toString
    // codebook shape: (numSub, codebookSize) from the max indices
    def codebookMeta: Map[String, String] = {
      val r = spark.read.parquet(p("codebook"))
        .agg(org.apache.spark.sql.functions.max("m"),
          org.apache.spark.sql.functions.max("cidx")).head()
      Map("num_sub" -> (r.getInt(0) + 1).toString,
        "codebook_size" -> (r.getInt(1) + 1).toString)
    }
    def attrsOf(sub: String, reserved: Set[String]): Seq[String] =
      cols(sub).filterNot(reserved)
    def entry(family: String, meta: Map[String, String],
        attrs: Seq[String], stage1: Option[String]): StoreEntry = {
      val tombSub = Seq("tombstones", "hll_tombstones").find(subs)
      StoreEntry(store.getName, family, meta, attrs,
        batch_keyed = stage1.exists(s => cols(s).contains("batch_id")),
        has_tombstones = tombSub.nonEmpty,
        generation = generation,
        tombstone_rows = tombSub.fold(0L)(t =>
          StoreFiles.parquetRowCount(spark, p(t))),
        pending_patches =
          if (subs.contains("patches"))
            StoreFiles.parquetRowCount(spark, p("patches"))
          else 0L,
        has_drift_state = subs.contains("errstate"),
        dead_generations = deadGens)
    }
    try {
      if (subs("sigs") && subs("bands"))
        entry("fingerprint", sidecar("meta"),
          attrsOf("bands", FpReserved), Some("bands"))
      else if (subs("postings"))
        entry("lexical",
          Map("positions" -> subs("positions").toString),
          attrsOf("postings", LexReserved), Some("postings"))
      else if (subs("exact") || subs("lanes"))
        entry("dedup", sidecar("meta"), Nil,
          Seq("exact", "lanes").find(subs))
      else if (subs("pairs") && subs("clusters"))
        entry("cluster_map",
          Map("coverage" -> subs("coverage").toString), Nil, None)
      else if (subs("codes") && subs("centroids"))
        entry("ann_ivfpq",
          codebookMeta + ("n_list" -> count("centroids")),
          attrsOf("codes", VecReserved), Some("codes"))
      else if (subs("codes") && subs("codebook"))
        // keep_vectors marks the retrainability opt-in (writePqIndex
        // keepVectors): with it the store monitors + retrains like
        // the trained families; without it, terminal under drift
        entry("ann_pq",
          codebookMeta + ("keep_vectors" -> subs("vectors").toString),
          attrsOf("codes", VecReserved), Some("codes"))
      else if (subs("codes") && subs("stats"))
        entry("ann_int8", Map.empty, attrsOf("codes", VecReserved),
          Some("codes"))
      else if (subs("bits"))
        entry("ann_binary", Map.empty, attrsOf("bits", VecReserved),
          Some("bits"))
      else if (subs("index") && subs("centroids"))
        entry("ann_ivf", Map("n_list" -> count("centroids")),
          attrsOf("index", VecReserved), Some("index"))
      else if (subs("index"))
        entry(if (sidecar("meta").contains("num_tables")) "ann_lsh_multi"
          else "ann_lsh", sidecar("meta"),
          attrsOf("index", VecReserved), Some("index"))
      else if (subs("hll") || subs("cms") || subs("hist"))
        entry("sketch", sidecar("cms_meta"), Nil,
          Seq("hll", "cms", "hist").find(subs))
      else entry("unknown", Map.empty, Nil, None)
    } catch {
      // a half-written or foreign directory manifests as unknown —
      // constructed directly (no sidecar reads: a corrupt tombstone or
      // patch table must not turn the describe-don't-die contract into
      // a second exception)
      case scala.util.control.NonFatal(_) =>
        StoreEntry(store.getName, "unknown", Map.empty, Nil,
          batch_keyed = false,
          has_tombstones = subs.contains("tombstones") ||
            subs.contains("hll_tombstones"),
          generation = generation, tombstone_rows = -1L,
          pending_patches = -1L,
          has_drift_state = subs.contains("errstate"),
          dead_generations = deadGens)
    }
  }
}
