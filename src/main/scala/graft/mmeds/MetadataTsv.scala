package graft.mmeds

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column spec carried by the 3 spec header rows of a metadata TSV
  * (required/optional, declared type, unit/limit note —
  * util.py:281-296). */
case class ColumnSpec(table: String, column: String, required: Boolean,
    declaredType: String, note: String) {
  def flatName: String = s"${table}__$column"
  /** "Limit 45 Characters" -> Some(45) (validate.py COL_SIZES check). */
  def lengthLimit: Option[Int] =
    "Limit (\\d+)".r.findFirstMatchIn(note).map(_.group(1).toInt)
}

/** A loaded metadata sheet: typed DataFrame (columns `Table__Column` plus
  * a stable `_row` file-line index) + the column-spec sidecar. */
case class MetadataSheet(df: DataFrame, specs: Seq[ColumnSpec]) {
  def spec(table: String, column: String): Option[ColumnSpec] =
    specs.find(s => s.table == table && s.column == column)
  def tables: Seq[String] = specs.map(_.table).distinct
  def columnsOf(table: String): Seq[ColumnSpec] =
    specs.filter(_.table == table)
}

/** Reader/writer for the MMEDS metadata interchange format: TSV with a
  * 2-row (table, column) header + 3 spec rows, data from row 6, literal
  * `NA` as the ONLY null token (util.py:312-320 reader, 245-309 writer).
  *
  * The 2-level pandas MultiIndex becomes flat `Table__Column` names plus
  * the [[ColumnSpec]] sidecar (SURVEY §1.1 mapping). Cell values are
  * typed per the declared-type header row (TYPE_MAP, config.py:751-761).
  */
object MetadataTsv {

  val flatSep = "__"

  /** Read a metadata TSV keeping every cell as its raw string (no NA
    * handling, no casts) — the Validator's view of the file. */
  def readRaw(spark: SparkSession, path: String): MetadataSheet = {
    val lines = spark.sparkContext.textFile(path).zipWithIndex()
    val header = lines.filter(_._2 < 5).collect().sortBy(_._2).map(_._1)
    require(header.length == 5,
      s"metadata TSV needs 5 header rows, got ${header.length}")
    val Array(tRow, cRow, reqRow, typeRow, noteRow) =
      header.map(_.split("\t", -1))
    val specs = tRow.indices.map { i =>
      ColumnSpec(tRow(i), cRow(i), reqRow(i).trim == "Required",
        typeRow(i).trim, noteRow(i))
    }
    val n = specs.length
    val rows = lines.filter(_._2 >= 5).map { case (line, idx) =>
      val cells = line.split("\t", -1).padTo(n, "")
      Row.fromSeq((idx - 5) +: cells.take(n).toSeq)
    }
    // duplicate headers are a *finding*, not a crash: uniquify the
    // DataFrame field names; specs keep the original names
    val seen = scala.collection.mutable.Map[String, Int]()
    val fieldNames = specs.map { s =>
      val k = seen.getOrElse(s.flatName, 0)
      seen(s.flatName) = k + 1
      if (k == 0) s.flatName else s"${s.flatName}__dup$k"
    }
    val rawSchema = StructType(
      StructField("_row", LongType, nullable = false) +:
        fieldNames.map(f => StructField(f, StringType)))
    MetadataSheet(spark.createDataFrame(rows, rawSchema), specs)
  }

  /** Read a metadata TSV. Line order is captured into `_row` (the
    * reference's implicit row identity for findings and ID assignment). */
  def read(spark: SparkSession, path: String): MetadataSheet = {
    val MetadataSheet(raw, specs) = readRaw(spark, path)

    // `NA` is the only recognized null; then cast per declared type.
    val typed = raw.select(col("_row") +: specs.map { s =>
      val c = when(col(s.flatName) === "NA" || col(s.flatName) === "",
        lit(null)).otherwise(col(s.flatName))
      // lenient casts (ANSI-safe): unparseable cells become null here and
      // are reported by the Validator, mirroring the pandas reader
      val cast = Schema.sparkType(s.declaredType) match {
        case DoubleType => c.try_cast(DoubleType)
        case LongType => c.try_cast(LongType)
        case DateType => try_to_date(c)
        case _ => c
      }
      cast.as(s.flatName)
    }: _*)
    MetadataSheet(typed, specs)
  }

  /** Write a sheet back to the 5-header TSV format: columns sorted by
    * (table, column) (util.py:276-277), nulls as `NA`, tabs stripped and
    * non-ASCII scrubbed from cells (util.py:301-303).
    *
    * The TSV interchange format is inherently a single ordered file, so
    * rows stream through the driver (`toLocalIterator`, bounded memory);
    * at-rest data belongs in Parquet via the Catalog instead. */
  def write(sheet: MetadataSheet, path: String): Unit = {
    val ordered = sheet.specs.sortBy(s => (s.table, s.column))
    val df = sheet.df
    val cells = ordered.map { s =>
      regexp_replace(
        regexp_replace(coalesce(col(s.flatName).cast(StringType), lit("NA")),
          "\t", ""),
        "[^\\x00-\\x7f]", "")
    }
    val lineDf = df.orderBy(col("_row"))
      .select(concat_ws("\t", cells: _*).as("line"))

    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(path), true)
    val headerLines = Seq(
      ordered.map(_.table), ordered.map(_.column),
      ordered.map(s => if (s.table == "AdditionalMetaData") "Optional"
        else if (s.required) "Required" else "Optional"),
      ordered.map(s => if (s.table == "AdditionalMetaData") "Text"
        else s.declaredType),
      ordered.map(s => if (s.table == "AdditionalMetaData") "No Limit"
        else s.note))
    try {
      headerLines.foreach(h =>
        out.write((h.mkString("\t") + "\n").getBytes("UTF-8")))
      lineDf.toLocalIterator().forEachRemaining { r =>
        out.write((r.getString(0) + "\n").getBytes("UTF-8"))
      }
    } finally out.close()
  }

  /** (table, column) renames applied when expanding a SIMPLIFIED
    * specimen sheet: the simplified format names the sequencing columns
    * Specimen*, the full format RawData* (util.py:88-101). */
  private val simplifiedSpecimenSwaps: Map[String, String] = Map(
    "Specimen" -> "RawData",
    "SpecimenProtocol" -> "RawDataProtocol",
    "SpecimenProtocols" -> "RawDataProtocols",
    "SpecimenID" -> "RawDataID",
    "SpecimenNotes" -> "RawDataNotes",
    "SpecimenDatePerformed" -> "RawDataDatePerformed",
    "SpecimenProcessor" -> "RawDataProcessor")

  /** Expand a SIMPLIFIED metadata sheet (same 5-header TSV, just a
    * subset of columns with friendlier Specimen* names) into the full
    * format (util.py:74-128 simplified_to_full) — the easy-upload
    * on-ramp. Missing template columns are appended: required
    * *ProtocolID columns fill with the running row index, a required
    * RawDataID-derived SpecimenID fills as `Specimen_<RawDataID>`, and
    * optional columns fill NA; every fill is a narrow per-row
    * expression (no collect). `templatePath` is the full-format
    * template sheet for the metadata type (the reference hardcodes its
    * test templates; here it is a parameter like the ICD code table). */
  def simplifiedToFull(spark: SparkSession, simplifiedPath: String,
      templatePath: String, metadataType: String): MetadataSheet = {
    val simplified = readRaw(spark, simplifiedPath)
    val template = readRaw(spark, templatePath)
    val swaps: Map[String, String] =
      if (metadataType == "specimen") simplifiedSpecimenSwaps else Map.empty
    val renamedSpecs = simplified.specs.map { s =>
      s.copy(table = swaps.getOrElse(s.table, s.table),
        column = swaps.getOrElse(s.column, s.column))
    }
    var df = simplified.df
    renamedSpecs.zip(simplified.specs).foreach { case (ns, os) =>
      if (ns.flatName != os.flatName)
        df = df.withColumnRenamed(os.flatName, ns.flatName)
    }
    val have = renamedSpecs.map(_.flatName).toSet
    val missing = template.specs.filterNot(s => have.contains(s.flatName))
    missing.foreach { s =>
      val fill: org.apache.spark.sql.Column =
        if (s.required && s.column.contains("ProtocolID")) col("_row")
        else if (s.required && s.column == "SpecimenID")
          concat(lit("Specimen_"), col("RawData__RawDataID"))
        else lit(null)
      df = df.withColumn(s.flatName, fill.cast(StringType))
    }
    MetadataSheet(df, renamedSpecs ++ missing)
  }

  /** Full-outer join of subject and specimen sheets on the coalesced
    * subject id (util.py:166-182): human uses HostSubjectId, animal uses
    * AnimalSubjectID, mixed backfills across the two. */
  def joinMetadata(subject: MetadataSheet, specimen: MetadataSheet,
      subjectType: String): MetadataSheet = {
    val subjIdCol = subjectType match {
      case "human" => col("Subjects__HostSubjectId")
      case "animal" => col("AnimalSubjects__AnimalSubjectID")
      case "mixed" => coalesce(col("Subjects__HostSubjectId"),
        col("AnimalSubjects__AnimalSubjectID"))
      case t => throw new IllegalArgumentException(s"bad subject type: $t")
    }
    val subj = subject.df
      .withColumn("Subjects__SubjectIdCol", subjIdCol.cast(StringType))
      .drop("_row")
    val spec = specimen.df.withColumnRenamed("_row", "_row_spec")
    val joined = subj.join(spec,
      subj("Subjects__SubjectIdCol") <=>
        spec("AdditionalMetaData__SubjectIdCol"), "full_outer")
      .withColumnRenamed("_row_spec", "_row")
      .drop("Subjects__SubjectIdCol")
    val specs = (subject.specs ++
      specimen.specs.filterNot(s => subject.specs.exists(_.flatName == s.flatName)))
    MetadataSheet(joined, specs.filterNot(_.flatName == "Subjects__SubjectIdCol"))
  }

  /** Split a full sheet back into (subject, specimen) column sets
    * (util.py:185-236). With `uniquifyIds`, repeated RawDataIDs get a
    * `_{i}` suffix and subject rows are deduplicated — the meta-study
    * path (SURVEY §3.3). */
  def splitMetadata(full: MetadataSheet, subjectType: String,
      newStudyName: Option[String] = None): (MetadataSheet, MetadataSheet) = {
    val subjTables: Set[String] = subjectType match {
      case "human" => Schema.subjectTables - "AdditionalMetaData"
      case "animal" => Schema.animalSubjectTables - "AdditionalMetaData"
      case "mixed" => Schema.mixedSubjectTables - "AdditionalMetaData"
      case t => throw new IllegalArgumentException(s"bad subject type: $t")
    }
    val subjSpecs = full.specs.filter(s => subjTables.contains(s.table))
    val specSpecs = full.specs.filter(s =>
      Schema.specimenTables.contains(s.table))

    val idExpr = subjectType match {
      case "human" => col("Subjects__HostSubjectId")
      case "animal" => col("AnimalSubjects__AnimalSubjectID")
      case _ => coalesce(col("Subjects__HostSubjectId"),
        col("AnimalSubjects__AnimalSubjectID"))
    }

    val subjDf = full.df
      .select((col("_row") +: subjSpecs.map(s => col(s.flatName))): _*)
      .dropDuplicates(subjSpecs.map(_.flatName))
    val sidSpec = ColumnSpec("AdditionalMetaData", "SubjectIdCol", false,
      "Text", "Limit 256 Characters")

    var specDf = full.df.select(
      (col("_row") +: idExpr.cast(StringType)
        .as(sidSpec.flatName) +: specSpecs.map(s => col(s.flatName))): _*)
    // uniquify RawDataIDs across merged studies (util.py:222-227)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("RawData__RawDataID")).orderBy(col("_row"))
    val cnt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("RawData__RawDataID"))
    specDf = specDf
      .withColumn("_n", count(lit(1)).over(cnt))
      .withColumn("_i", row_number().over(w))
      .withColumn("RawData__RawDataID",
        when(col("_n") > 1, concat(col("RawData__RawDataID"), lit("_"),
          col("_i") - 1)).otherwise(col("RawData__RawDataID")))
      .drop("_n", "_i")
    val withStudy = newStudyName match {
      case Some(name) => specDf.withColumn("Study__StudyName", lit(name))
      case None => specDf
    }
    (MetadataSheet(subjDf, subjSpecs),
      MetadataSheet(withStudy, sidSpec +: specSpecs))
  }
}
