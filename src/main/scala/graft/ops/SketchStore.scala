package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted HLL / CMS sketch store: the "sketch once, merge forever"
  * path for corpus cardinality and frequency profiles.
  *
  * The in-memory operators in [[Sketches]] rebuild their sketches from
  * the corpus per query; at 100 TB a profile that rescans history per
  * batch is the cost that kills the dashboard. This store applies the
  * [[DedupIndex]] pattern to sketches: each batch is sketched ONCE into
  * tiny parquet tables (per-group 256-int HLL register arrays; depth×width
  * CMS counters), appends land as ADDITIONAL partial-sketch rows (a
  * blind `mode("append")` write — no read-modify-write, no locking), and
  * reads merge on the fly (HLL registers max-merge, CMS counters sum —
  * both associative, so the merged read equals the sketch of the union
  * EXACTLY, the property qd68/qd69 pin against the direct derivation).
  *
  * Layout (plain parquet):
  *   `<path>/hll/`   grp, regs (array<int>, 256 max-rank registers) —
  *                   one row per group per appended batch
  *   `<path>/cms/`   row, bucket, cnt — ≤ depth×width rows per batch
  *   `<path>/cms_meta/`  width sidecar so appends can't change the
  *                   sketch shape mid-store
  *   `<path>/hist/`  grp, bucket, cnt — ≤ 64 log-bucket counter rows
  *                   per group per batch (sum-merged quantile profile)
  *
  * Scale shape: a batch append writes `groups × 1` KB-sized rows (HLL)
  * or ≤ 4×width counters (CMS) regardless of batch size; a profile read
  * scans `groups × n_batches` sketch rows — never the corpus. Every
  * hash is the engine-portable md5 form, so stored register/counter
  * values are re-derivable in external SQL and the whole store is
  * oracle-checkable (qd73/qd74 share qd65/qd66's oracles verbatim).
  */
object SketchStore {

  /** Initialize (overwrite) the HLL half with one batch's per-group
    * register sketches: one batch scan, `groups` rows out. */
  def writeHll(df: DataFrame, group: Column, value: Column,
      path: String): Unit =
    hllPartials(df, group, value)
      .write.mode("overwrite").parquet(s"$path/hll")

  /** Append a new batch's per-group partial sketches — history is never
    * re-read; the merge happens at read time (register max is
    * associative, so append order does not matter). */
  def appendHll(batch: DataFrame, group: Column, value: Column,
      path: String): Unit =
    hllPartials(batch, group, value)
      .write.mode("append").parquet(s"$path/hll")

  private def hllPartials(df: DataFrame, group: Column,
      value: Column): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(graft.functions.HllRegistersAgg.hllRegisters(value).as("regs"))

  /** Merged per-group cardinality profile over ALL stored partials:
    * `grp, present_registers, zero_registers, est_distinct` — byte
    * identical to sketching the union corpus directly
    * ([[Sketches.hllDistinctFast]]), without rescanning any of it. */
  def readHllProfile(spark: SparkSession, path: String): DataFrame =
    Sketches.hllMergeRegisters(spark.read.parquet(s"$path/hll"),
      col("grp"), col("regs"))

  /** Initialize (overwrite) the CMS half: depth-4 × `width` md5-lane
    * counters of one batch's values, plus the width sidecar. */
  def writeCms(df: DataFrame, value: Column, width: Int,
      path: String): Unit = {
    Sketches.cmsSketch(df, value, width)
      .write.mode("overwrite").parquet(s"$path/cms")
    df.sparkSession.createDataFrame(Seq(Tuple1(width))).toDF("width")
      .write.mode("overwrite").parquet(s"$path/cms_meta")
  }

  /** Append a new batch's partial counter sketch. The width comes from
    * the store's own sidecar — callers can't accidentally append a
    * differently-shaped sketch. */
  def appendCms(batch: DataFrame, value: Column, path: String): Unit =
    Sketches.cmsSketch(batch, value, cmsWidth(batch.sparkSession, path))
      .write.mode("append").parquet(s"$path/cms")

  /** The store's counter width (from the sidecar). */
  def cmsWidth(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/cms_meta").head().getInt(0)

  /** Merged counters over ALL stored partials — counter-wise equal to
    * sketching the union corpus directly (CMS merges by sum). */
  def readCms(spark: SparkSession, path: String): DataFrame =
    Sketches.cmsMergeSketches(spark.read.parquet(s"$path/cms"))

  /** Point-estimate probe counts against the merged store (probes are
    * never shuffled; the merged sketch is ≤ 4×width rows, broadcast). */
  def probeCms(spark: SparkSession, path: String, probes: DataFrame,
      term: Column): DataFrame =
    Sketches.cmsEstimate(readCms(spark, path), probes, term,
      cmsWidth(spark, path))

  /** Initialize (overwrite) the HISTOGRAM half with one batch's
    * per-group log-bucket counters: one batch scan, ≤ 64 rows per
    * group out. The distribution member of the store's profiling triad
    * (HLL = distinct, CMS = frequency, histogram = quantiles). */
  def writeHist(df: DataFrame, group: Column, measure: Column,
      path: String): Unit =
    Sketches.histSketch(df, group, measure)
      .write.mode("overwrite").parquet(s"$path/hist")

  /** Append a new batch's partial histogram counters — history is never
    * re-read; counters ADD at read time (associative, append-order
    * free, like the CMS half). */
  def appendHist(batch: DataFrame, group: Column, measure: Column,
      path: String): Unit =
    Sketches.histSketch(batch, group, measure)
      .write.mode("append").parquet(s"$path/hist")

  /** Merged counters over ALL stored partials — counter-wise equal to
    * sketching the union corpus directly. */
  def readHist(spark: SparkSession, path: String): DataFrame =
    Sketches.histMergeSketches(spark.read.parquet(s"$path/hist"))

  /** Merged per-group quantile profile over all stored partials —
    * identical to [[Sketches.histQuantiles]] over the union's sketch,
    * without rescanning any batch. */
  def readHistProfile(spark: SparkSession, path: String,
      quantiles: Seq[Double]): DataFrame =
    Sketches.histQuantiles(readHist(spark, path), quantiles)
}
