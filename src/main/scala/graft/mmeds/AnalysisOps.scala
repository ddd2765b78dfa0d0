package graft.mmeds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analysis-support operators (SURVEY §7 stage 7): the transforms MMEDS
  * applies to mapping/feature tables around its QIIME2/LEfSe pipelines —
  * re-expressed over long-format DataFrames so they scale.
  */
object AnalysisOps {

  /** QIIME header order (util.py:962-991): `RawDataID` SWAPS with
    * position 0 and becomes `#SampleID` (the displaced header takes
    * RawDataID's old slot — swap, not move-to-front), `BarcodeSequence`
    * swaps to position 1, `LinkerPrimerSequence` to position 2, and the
    * MMEDS `SampleID` column is renamed `MmedsSampleID` so it can't
    * collide with QIIME's sample id. */
  def qiimeHeaders(cols: Seq[String]): Seq[String] = {
    val h = cols.toBuffer
    def swapTo(pos: Int, name: String, newName: String): Unit = {
      val di = h.indexOf(name)
      if (di >= 0 && pos < h.length) {
        val hold = h(pos)
        h(pos) = newName
        if (di != pos) h(di) = hold
      }
    }
    swapTo(0, "RawDataID", "#SampleID")
    swapTo(1, "BarcodeSequence", "BarcodeSequence")
    swapTo(2, "LinkerPrimerSequence", "LinkerPrimerSequence")
    val si = h.indexOf("SampleID")
    if (si >= 0) h(si) = "MmedsSampleID"
    h.toSeq
  }

  /** QIIME mapping-file projection (util.py:962-1012): columns reordered
    * per [[qiimeHeaders]], one row per sample (first occurrence of each
    * `RawDataID` wins, like the reference's seen-ids scan — pre-sort the
    * frame if a specific survivor matters). */
  def qiimeMapping(meta: DataFrame): DataFrame = {
    val srcFor = Map("#SampleID" -> "RawDataID", "MmedsSampleID" -> "SampleID")
    val projected = qiimeHeaders(meta.columns.toSeq)
      .map(hn => col(srcFor.getOrElse(hn, hn)).as(hn))
    val deduped =
      if (meta.columns.contains("RawDataID")) meta.dropDuplicates("RawDataID")
      else meta
    deduped.select(projected: _*)
  }

  /** QIIME mapping-file writer (util.py:992-1012): the projected frame as
    * a TSV with the `#SampleID ...` header row followed by the
    * `#q2:types` row (every metadata column declared categorical, as the
    * reference does — util.py:994). Rows stream through the driver
    * partition-by-partition; nulls print as the reference's pandas `nan`
    * string does via NA. */
  def writeQiimeMapping(mapping: DataFrame, path: String): Unit = {
    val out = java.nio.file.Files.newBufferedWriter(
      java.nio.file.Paths.get(path))
    try {
      out.write(mapping.columns.mkString("\t")); out.write('\n')
      out.write(("#q2:types" +:
        Seq.fill(mapping.columns.length - 1)("categorical")).mkString("\t"))
      out.write('\n')
      val it = mapping.toLocalIterator()
      while (it.hasNext) {
        out.write(it.next().toSeq
          .map(v => if (v == null) "NA" else String.valueOf(v))
          .mkString("\t"))
        out.write('\n')
      }
    } finally out.close()
  }

  /** Per-run mapping subset (util.py:1413-1425). */
  def mappingForRun(meta: DataFrame, run: String): DataFrame =
    meta.filter(col("RawDataProtocolID") === run)

  /** Grouped mapping file (util.py:1114-1123): the distinct categories
    * of one mapping column as a single `#SampleID` column, `#q2:types`
    * first, then categories in FIRST-APPEARANCE order (the reference
    * iterates rows and appends unseen cells). Order is reconstructed
    * distributedly: min row id per category, sort by it — no driver
    * pass over the data. */
  def groupedMappingFile(mapping: DataFrame, column: String): DataFrame = {
    val byFirstSeen = mapping
      .select(col(column).cast("string").as("cat"))
      .withColumn("_row", monotonically_increasing_id())
      .groupBy(col("cat")).agg(min(col("_row")).as("_first"))
      .orderBy(col("_first"))
      .select(col("cat").as("#SampleID"))
    byFirstSeen.sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("#q2:types")),
      byFirstSeen.schema
    ).unionAll(byFirstSeen)
  }

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
