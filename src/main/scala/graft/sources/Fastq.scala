package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
