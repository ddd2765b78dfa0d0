package graft.mmeds

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ICD-10 code handling (util.py:553-610, sql/views.sql:69).
  *
  * Codes look like `A19.XXXX`: part before the dot is 1 letter + 2-char
  * category, part after is 3-char details + 1-char extension. Parsing is
  * pure string expressions — no UDF.
  */
object Icd {

  /** The reference fills missing codes with the "healthy" sentinel before
    * parsing (util.py:577 — scoped here to the ICD column only). */
  def filled(code: Column): Column = coalesce(code, lit("XXX.XXXX"))

  private def part0(code: Column): Column = split(filled(code), "\\.")(0)
  private def part1(code: Column): Column = split(filled(code), "\\.")(1)
  private def wellFormed(code: Column): Column =
    size(split(filled(code), "\\.")) >= 2 && length(part1(code)) >= 1

  /** First character of the code -> IllnessBroadCategory. */
  def firstCharacter(code: Column): Column =
    when(wellFormed(code), substring(part0(code), 1, 1))

  /** Numeric category (chars 2-3) -> IllnessCategory; null when `XX`
    * (the int-parse failure branch, util.py:592-598 — a long cast of a
    * non-numeric string is null). */
  def category(code: Column): Column =
    when(wellFormed(code), part0(code).substr(lit(2), length(part0(code)))
      .cast("long"))

  /** Details: all but the last char after the dot -> IllnessDetails. */
  def details(code: Column): Column =
    when(wellFormed(code),
      part1(code).substr(lit(1), length(part1(code)) - 1))

  /** Extension: last char after the dot -> IllnessDetails. */
  def extension(code: Column): Column =
    when(wellFormed(code), substring(part1(code), -1, 1))

  /** `CONCAT(first, category, '.', details, extension)` — the
    * reconstructed code exposed by SubjectTable (views.sql:69). Null
    * category nulls the whole concat, matching MySQL CONCAT. */
  def reassembled(first: Column, cat: Column, det: Column,
      ext: Column): Column =
    concat(first, cat.cast("string"), lit("."), det, ext)

  /** Load an ICD-10-CM code file (`load_ICD_codes`, util.py:553-572) into
    * a (category, detail) membership table. File format: one code per
    * line, `CODE description...`; the code is X-padded to 7 chars, the
    * first 3 become the category, the last 4 the detail. The reference's
    * built-in entries ride along: `XXX.XXXX` (healthy), `NA.NA`, and
    * every category present in the file implicitly accepts detail `XXXX`
    * (its defaultdict seeds `'XXXX': 'Unknown details'` on first touch).
    * The result is a few-MB dimension — broadcast it into the validation
    * join; never shuffle the metadata side. */
  def loadCodeTable(spark: SparkSession, path: String): DataFrame = {
    val parsed = spark.read.text(path)
      .select(rpad(split(trim(col("value")), " ")(0), 7, "X").as("_code"))
      .filter(length(col("_code")) === 7)
      .select(substring(col("_code"), 1, 3).as("category"),
        substring(col("_code"), 4, 4).as("detail"))
    val autoXXXX = parsed.select(col("category")).distinct()
      .select(col("category"), lit("XXXX").as("detail"))
    val builtIns = spark.createDataFrame(
      Seq(("XXX", "XXXX"), ("NA", "NA"))).toDF("category", "detail")
    parsed.union(autoXXXX).union(builtIns).distinct()
  }
}
