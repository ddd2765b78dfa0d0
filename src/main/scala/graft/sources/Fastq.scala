package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTQ/barcode readers (util.py:1207-1282: regex-per-read scans of
  * gzipped fastq — SURVEY §2.1 notes them at the scope edge; included
  * because a sequencing catalog without a distributed fastq reader can't
  * scale its demultiplex step).
  *
  * A FASTQ record is 4 lines: `@id`, sequence, `+`, quality. Reading
  * distributes naturally: line-number every row once, group by
  * `line div 4`, pivot the 4 positions — one narrow pass + one shuffle
  * on the record id. Spark's text source reads .gz transparently.
  */
object Fastq {

  /** Parse fastq text file(s) into (record, read_id, sequence, quality,
    * file). Lines are numbered PER FILE (a glob or directory of fastq
    * files whose line counts aren't multiples of 4 would mis-align under
    * one global index), so records never straddle file boundaries.
    * `record` packs (file ordinal, in-file record) into one long —
    * single-file reads keep their old 0,1,2,... ids. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(sc.hadoopConfiguration)
    val stats = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
    val files: Seq[String] =
      if (stats.isEmpty) Seq(path)
      else stats.flatMap { s =>
        if (s.isDirectory)
          fs.listStatus(s.getPath).filter(_.isFile).map(_.getPath.toString)
        else Seq(s.getPath.toString)
      }.sorted
    val rdds = files.zipWithIndex.map { case (f, fi) =>
      sc.textFile(f).zipWithIndex().map { case (l, i) => (fi.toLong, i, f, l) }
    }
    sc.union(rdds.toIndexedSeq).toDF("file_idx", "idx", "file", "line")
      .withColumn("record",
        col("file_idx") * lit(1L << 40) + expr("idx div 4"))
      .withColumn("pos", col("idx") % 4)
      .groupBy(col("record"), col("file"))
      .pivot("pos", Seq(0, 1, 2, 3))
      .agg(first(col("line")))
      .select(col("record"),
        regexp_replace(col("0"), "^@", "").as("read_id"),
        col("1").as("sequence"), col("3").as("quality"), col("file"))
  }

  /** Per-read barcode match with error tolerance (util.py:1233-1234):
    * levenshtein distance against each known barcode, keep the best
    * match within `maxErrors`. Barcodes broadcast (tiny dim). */
  def demultiplex(reads: DataFrame, barcodes: DataFrame,
      maxErrors: Int): DataFrame = {
    val scored = reads.crossJoin(broadcast(barcodes))
      .withColumn("errors",
        levenshtein(col("sequence").substr(lit(1), length(col("barcode"))),
          col("barcode")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("record")).orderBy(col("errors"), col("barcode"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1 && col("errors") <= maxErrors)
      .drop("rank")
  }

  /** Embedded demultiplexer barcode pair of each read: pheniqs-style
    * headers end `...:0:FWD-REV` (util.py:1225 pattern). */
  private def barcodePair(readId: Column): Column =
    struct(
      regexp_extract(readId, ":0:([ACGTN]+)-([ACGTN]+)\\s*$", 1).as("bc_f"),
      regexp_extract(readId, ":0:([ACGTN]+)-([ACGTN]+)\\s*$", 2).as("bc_r"))

  /** Observed (forward, reverse) barcode-pair frequencies across read
    * files — the reference's `full_results` dict (util.py:1245-1282
    * parse_barcodes), as one hash aggregation. */
  def barcodePairCounts(reads: DataFrame): DataFrame =
    reads.select(barcodePair(col("read_id")).as("bc"))
      .select(col("bc.bc_f"), col("bc.bc_r"))
      .groupBy(col("bc_f"), col("bc_r"))
      .agg(count(lit(1)).as("n_reads"))

  /** Demultiplex validation report (util.py:1285-1412
    * create_barcode_mapfile + validate_demultiplex, minus the qiime1
    * shell-out): reconcile each demultiplexed file's read count against
    * the barcodes the mapping file assigns to its sample. A file maps
    * to the sample whose id equals its name's first underscore part or
    * first two parts (util.py:1299-1303); a read is `matched` when its
    * embedded barcode pair is within `maxErrors` total Levenshtein
    * distance of the sample's mapping barcodes (the same tolerance the
    * stripper uses, util.py:1231-1240). One row per (file, sample):
    * total reads, matched reads, match fraction, and distinct observed
    * pairs — mapping rows with no file at all surface with null file
    * and zero reads (the dropped-sample case a reconciliation must
    * catch).
    *
    * `reads` is [[read]] output over the demultiplexed directory;
    * `mapping` has (sample, barcode_fwd, barcode_rev). The mapping is
    * tiny and broadcast; the name-prefix match is a broadcast
    * nested-loop join, reads never shuffle until the per-file
    * aggregation. */
  def demuxValidationReport(reads: DataFrame, mapping: DataFrame,
      maxErrors: Int): DataFrame = {
    val base = reads.select(
      regexp_extract(col("file"), "([^/]+?)(\\.fastq)(\\.gz)?$", 1)
        .as("fname"),
      barcodePair(col("read_id")).as("bc"))
      .select(col("fname"), col("bc.bc_f"), col("bc.bc_r"))
    val parts = split(col("fname"), "_")
    val scored = base.join(broadcast(mapping),
        col("sample") === parts.getItem(0) ||
          col("sample") === concat_ws("_", slice(parts, 1, 2)),
        "right_outer")
      .withColumn("matched",
        col("fname").isNotNull &&
          levenshtein(col("bc_f"), col("barcode_fwd")) +
          levenshtein(col("bc_r"), col("barcode_rev")) <= maxErrors)
    scored.groupBy(col("sample"), col("fname"))
      .agg(count(col("bc_f")).as("n_reads"),
        sum(when(col("matched"), 1L).otherwise(0L)).as("n_matched"),
        countDistinct(col("bc_f"), col("bc_r")).as("n_distinct_pairs"))
      .withColumn("match_frac",
        when(col("n_reads") > 0,
          col("n_matched").cast("double") / col("n_reads"))
          .otherwise(lit(0.0)))
  }
}
