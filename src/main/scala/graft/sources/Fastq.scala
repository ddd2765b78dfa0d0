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

  /** Parse fastq text file(s) into (read_id, sequence, plus, quality). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.sparkContext.textFile(path).zipWithIndex()
      .map { case (l, i) => (i, l) }
    import spark.implicits._
    lines.toDF("idx", "line")
      .withColumn("record", expr("idx div 4"))
      .withColumn("pos", col("idx") % 4)
      .groupBy(col("record"))
      .pivot("pos", Seq(0, 1, 2, 3))
      .agg(first(col("line")))
      .select(col("record"),
        regexp_replace(col("0"), "^@", "").as("read_id"),
        col("1").as("sequence"), col("3").as("quality"))
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
