package graft.mmeds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analysis-support operators (SURVEY §7 stage 7): the transforms MMEDS
  * applies to mapping/feature tables around its QIIME2/LEfSe pipelines —
  * re-expressed over long-format DataFrames so they scale.
  */
object AnalysisOps {

  /** QIIME mapping-file projection (util.py:962-1012): `RawDataID` leads
    * as `#SampleID`, Barcode/LinkerPrimer next, one row per sample. */
  def qiimeMapping(meta: DataFrame): DataFrame = {
    val lead = Seq("RawDataID", "BarcodeSequence", "LinkerPrimerSequence")
      .filter(meta.columns.contains)
    val rest = meta.columns.filterNot(lead.contains).toSeq
    meta
      .dropDuplicates("RawDataID")
      .select((lead ++ rest).map(col): _*)
      .withColumnRenamed("RawDataID", "#SampleID")
  }

  /** Per-run mapping subset (util.py:1413-1425). */
  def mappingForRun(meta: DataFrame, run: String): DataFrame =
    meta.filter(col("RawDataProtocolID") === run)

  /** Sample subset by id list (util.py:1777-1784). */
  def sampleSubset(meta: DataFrame, samples: Seq[String]): DataFrame =
    meta.filter(col("RawDataID").isin(samples: _*))

  /** Wide OTU table (header `OTU_id`, one column per sample) -> long
    * (otu_id, sample_id, count) — the engine-internal feature form
    * (summary.py:83-95 biom conversion, FIXTURES §5). */
  def otuWideToLong(wide: DataFrame, idCol: String = "OTU_id"): DataFrame = {
    val sampleCols = wide.columns.filterNot(_ == idCol)
    val entries = sampleCols.map(c =>
      s"'$c', cast(`$c` as double)").mkString(", ")
    wide.select(col(idCol).as("otu_id"), expr(
      s"stack(${sampleCols.length}, $entries) as (sample_id, count)"))
  }

  /** Long feature frame -> wide (pivot on sample), for export. */
  def otuLongToWide(long: DataFrame): DataFrame =
    long.groupBy(col("otu_id")).pivot("sample_id").sum("count")

  /** LEfSe table assembly (util.py:1698-1762): join long features with
    * per-sample class/subclass/subject metadata; the 2-3 leading class
    * rows of the TSV become ordinary columns here and pivot on export. */
  def lefseTable(featuresLong: DataFrame, mapping: DataFrame,
      classCol: String, subclassCol: Option[String],
      subjectCol: String): DataFrame = {
    val keep = Seq(Some(classCol), subclassCol, Some(subjectCol)).flatten
    featuresLong.join(
      mapping.select((col("RawDataID").as("sample_id") +:
        keep.map(col)): _*),
      Seq("sample_id"), "inner")
  }

  /** Frequency threshold filter (table_filtering.smk:1-15): drop samples
    * whose total feature count is below `depth` — aggregate + semi-join,
    * no collect. */
  def thresholdFilter(featuresLong: DataFrame, depth: Double): DataFrame = {
    val keep = featuresLong.groupBy(col("sample_id"))
      .agg(sum(col("count")).as("_total"))
      .filter(col("_total") >= depth)
      .select(col("sample_id"))
    featuresLong.join(keep, Seq("sample_id"), "left_semi")
  }

  /** Valid-column selection for analysis configs (util.py:414-465):
    * per-column profile — all-null, single-valued, all-unique
    * categorical — and the continuous/discrete classification. */
  def columnProfile(meta: DataFrame, cols: Seq[String]): DataFrame = {
    // ONE aggregation job for every column's stats (Catalyst plans the
    // multi-distinct via a single expand), then reshape to long
    val aggs = cols.flatMap { c =>
      Seq(countDistinct(col(c)).as(s"_d_$c"),
        count(col(c)).as(s"_p_$c"))
    } :+ count(lit(1)).as("_n")
    val wide = meta.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      val continuous = meta.schema(c).dataType match {
        case _: NumericType => true
        case _ => false
      }
      s"'$c', `_d_$c`, `_p_$c`, $continuous"
    }
    wide.select(col("_n"), expr(
      s"stack(${cols.length}, ${entries.mkString(", ")}) as " +
        "(column, n_distinct, n_present, continuous)"))
      .select(col("column"), col("n_distinct"), col("n_present"),
        col("_n").as("n_rows"),
        (col("n_present") === 0).as("all_null"),
        (col("n_distinct") === 1).as("single_valued"),
        (!col("continuous") && col("n_distinct") === col("n_present") &&
          col("n_present") > 0).as("all_unique"),
        col("continuous"))
      .withColumn("valid",
        !col("all_null") && !col("single_valued") &&
          (col("continuous") || !col("all_unique")))
  }
}
