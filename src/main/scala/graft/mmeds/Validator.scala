package graft.mmeds

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One validation finding: `row` is the 0-based data row (-1 for
  * column/file-level findings), `column` the flat column name. The
  * error/warning taxonomy mirrors validate.py (SURVEY §2.12). */
case class Finding(row: Long, column: String, kind: String,
    message: String, isError: Boolean)

/** Metadata validator: the full cell/column/file-level check taxonomy of
  * the reference's `Validator` class (validate.py:100-736) as ONE Spark
  * pass over a long-format (row, table, column, value) frame + a handful
  * of aggregate checks.
  *
  * Scale shape: the melt is a narrow projection (no shuffle); per-cell
  * checks are codegen'd predicates over it; only the aggregate checks
  * (duplicates, outliers, multi-study) shuffle, each on its natural key.
  */
object Validator {

  /** Non-standard NA spellings — errors, not nulls (validate.py:15). */
  val nonStandardNAs: Seq[String] =
    Seq("n/a", "n.a.", "n_a", "na", "N/A", "N.A.", "N_A")

  /** PHI/HIPAA column names rejected outright (validate.py:17). */
  val hipaaHeaders: Seq[String] = Seq(
    "social_security", "social_security_number", "address", "phone",
    "phone_number")

  /** Chars illegal in a header (validate.py:20). */
  val illegalHeaderChars = "/\\ *?_.,"

  /** Validate a metadata file. Returns a Finding DataFrame. `icdCodes`
    * is an optional (category, detail) membership table from
    * [[Icd.loadCodeTable]]; when present, ICD cells are validated against
    * it (the reference's `check_ICD_codes`, validate.py:199-212) instead
    * of the shape-only fallback. */
  def validate(spark: SparkSession, path: String,
      subjectType: String = "human",
      template: Option[MetadataSheet] = None,
      icdCodes: Option[DataFrame] = None): DataFrame =
    validateSheet(spark, MetadataTsv.readRaw(spark, path), subjectType,
      template, icdCodes)

  def validateSheet(spark: SparkSession, sheet: MetadataSheet,
      subjectType: String,
      template: Option[MetadataSheet] = None,
      icdCodes: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._

    val specs = sheet.specs
    val df = sheet.df
    // positional alignment: df field names are uniquified when headers
    // repeat; specs keep the user-facing names
    val aligned: Seq[(ColumnSpec, String)] =
      specs.zip(df.columns.filter(_ != "_row"))

    // ---- file/header-level findings (driver-side: schema facts) ----
    val headerFindings = scala.collection.mutable.ArrayBuffer[Finding]()
    val expectedTables = subjectType match {
      case "human" => Schema.subjectTables
      case "animal" => Schema.animalSubjectTables
      case "mixed" => Schema.mixedSubjectTables
      case _ => Schema.specimenTables
    }
    val presentTables = specs.map(_.table).toSet
    // table-set reconciliation (validate.py:716-733)
    val optionalTables =
      Set("IllnessBroadCategory", "IllnessCategory", "IllnessDetails",
        "AdditionalMetaData")
    (expectedTables -- presentTables -- optionalTables).foreach(t =>
      headerFindings += Finding(-1, t, "Missing Table",
        s"Missing Table Error: $t", isError = true))
    (presentTables -- expectedTables).foreach(t =>
      headerFindings += Finding(-1, t, "Illegal Table",
        s"Illegal Table Error: $t", isError = true))

    specs.foreach { s =>
      val h = s.column
      if (h.nonEmpty && h.forall(_.isDigit))
        headerFindings += Finding(-1, s.flatName, "Number Header",
          s"Number Header Error: $h", isError = true)
      if (h == "NA" || nonStandardNAs.contains(h))
        headerFindings += Finding(-1, s.flatName, "NA Header",
          s"NA Header Error: $h", isError = true)
      if (h.exists(illegalHeaderChars.contains(_)))
        headerFindings += Finding(-1, s.flatName, "Illegal Header",
          s"Illegal Header Error: illegal character in $h", isError = true)
      if (hipaaHeaders.contains(h.toLowerCase))
        headerFindings += Finding(-1, s.flatName, "PHI Header",
          s"PHI Header Error: $h may hold protected health information",
          isError = true)
    }
    specs.groupBy(_.flatName).filter(_._2.size > 1).keys.foreach(dup =>
      headerFindings += Finding(-1, dup, "Duplicate Header",
        s"Duplicate Header Error: $dup", isError = true))
    // pandas-mangled duplicates arrive as `Col.1` next to `Col`
    // (validate.py:494-524 duplicate pattern)
    specs.foreach { s =>
      val m = "^(.+)\\.(\\d+)$".r.findFirstMatchIn(s.column)
      m.foreach { mm =>
        if (specs.exists(o => o.table == s.table &&
          o.column == mm.group(1)))
          headerFindings += Finding(-1, s.flatName, "Duplicate Header",
            s"Duplicate Header Error: ${s.column} duplicates " +
              mm.group(1), isError = true)
      }
    }

    // template column reconciliation (validate.py:456-462): missing vs
    // extra columns per shared table
    template.foreach { tpl =>
      val fileCols = specs.map(s => (s.table, s.column)).toSet
      val tplCols = tpl.specs.map(s => (s.table, s.column)).toSet
      tplCols.diff(fileCols).filter(_._1 != "AdditionalMetaData")
        .filter(c => presentTables.contains(c._1)).foreach { case (t, c) =>
          headerFindings += Finding(-1, s"${t}__$c", "Missing Column",
            s"Missing Column Error: $c missing from table $t",
            isError = true)
        }
      fileCols.diff(tplCols).filter(_._1 != "AdditionalMetaData")
        .filter(c => tpl.specs.exists(_.table == c._1)).foreach {
          case (t, c) =>
            headerFindings += Finding(-1, s"${t}__$c", "Illegal Column",
              s"Illegal Column Error: $c not allowed in table $t",
              isError = true)
        }
    }
    val headerDf = spark.createDataset(headerFindings.toSeq).toDF()

    // ---- melt to long format: one row per cell ----
    val entries = aligned.map { case (s, f) =>
      val lim = s.lengthLimit.map(_.toString).getOrElse("NULL")
      s"'${s.table}', '${s.flatName}', '${s.declaredType}', " +
        s"${s.required}, $lim, cast(`$f` as string)"
    }
    val long = df.select(col("_row"), expr(
      s"stack(${specs.length}, ${entries.mkString(", ")}) as " +
        "(tbl, colname, decl, required, lim, raw)"))
      .withColumn("isNA", col("raw").isNull || col("raw") === "NA")

    val d = col("decl")
    val raw = col("raw")
    val numeric = d.isin("Number", "Decimal", "Integer")
    val dateTyped = d === "Date"
    // pandas parses bare numbers as dates (Timestamp("1") -> 2001), so
    // the reference accepts them; match that leniency
    val dateOk = try_to_date(raw).isNotNull || raw.rlike("^\\d{1,4}$")

    def cellCheck(pred: Column, kind: String, msg: Column,
        isError: Boolean = true): DataFrame =
      long.filter(pred).select(
        col("_row").as("row"), col("colname").as("column"),
        lit(kind).as("kind"), msg.as("message"), lit(isError).as("isError"))

    // subject-id NA is allowed when the other species' id is present
    // (mixed sheets complement logic, validate.py check_column)
    val idCols = Set("Subjects__HostSubjectId",
      "AnimalSubjects__AnimalSubjectID")
    val complementOk = if (subjectType == "mixed" &&
      idCols.forall(df.columns.contains)) {
      val other = df.select(col("_row"),
        (col("Subjects__HostSubjectId").isNotNull &&
          col("Subjects__HostSubjectId") =!= "NA" ||
          col("AnimalSubjects__AnimalSubjectID").isNotNull &&
            col("AnimalSubjects__AnimalSubjectID") =!= "NA")
          .as("_any_id"))
      long.join(other, "_row")
        .withColumn("_complement_ok",
          col("colname").isin(idCols.toSeq: _*) && col("_any_id"))
    } else long.withColumn("_complement_ok", lit(false))

    val checks = Seq(
      complementOk.filter(col("isNA") && col("required") &&
          col("tbl") =!= "AdditionalMetaData" && !col("_complement_ok"))
        .select(col("_row").as("row"), col("colname").as("column"),
          lit("Missing Required Value").as("kind"),
          concat(lit("Missing Required Value Error: "), col("colname"))
            .as("message"),
          lit(true).as("isError")),
      cellCheck(raw === "", "Empty Cell",
        concat(lit("Empty Cell Error: empty cell value in column "),
          col("colname"))),
      cellCheck(raw.isin(nonStandardNAs: _*), "NA",
        concat(lit("NA Error: Non standard NA format "), raw)),
      cellCheck(!col("isNA") && raw =!= "" && raw =!= trim(raw),
        "Whitespace",
        concat(lit("Whitespace Error: preceding or trailing whitespace '"),
          raw, lit("'"))),
      cellCheck(!col("isNA") && col("tbl") =!= "AdditionalMetaData" &&
        col("lim").isNotNull && length(raw) > col("lim"), "Cell Length",
        concat(lit("Cell Length Error: cell value "), raw,
          lit(" is too long for the column"))),
      cellCheck(!col("isNA") && numeric && raw.try_cast("double").isNull,
        "Cell Wrong Type",
        concat(lit("Cell Wrong Type Error: cell "), raw,
          lit(" contains the wrong type of values"))),
      cellCheck(!col("isNA") && dateTyped && !dateOk,
        "Cell Wrong Type",
        concat(lit("Cell Wrong Type Error: cell "), raw,
          lit(" is not a valid date"))),
      cellCheck(!col("isNA") && dateTyped &&
        try_to_date(raw) > current_date(), "Future Date",
        concat(lit("Future Date Error: date "), raw,
          lit(" has not yet occurred"))),
      // DNA alphabet check for barcode cells (validate.py:187-197)
      cellCheck(!col("isNA") &&
        col("colname") === "RawData__BarcodeSequence" &&
        regexp_replace(raw, "[GATC]", "") =!= "", "Barcode",
        concat(lit("Barcode Error: non-GATC character in "), raw)),
      // ICD code validity (validate.py:199-212). With a code table the
      // check is MEMBERSHIP — split the cell on '.', anti-join the
      // broadcast (category, detail) dimension; a well-formed-but-unknown
      // code errors exactly like the reference. Without one (the
      // icd10cm_codes_2018.txt resource is absent from the snapshot),
      // fall back to the shape-only regex.
      (icdCodes match {
        case Some(codes) =>
          long.filter(!col("isNA") && col("colname") === "ICDCode__ICDCode")
            .withColumn("category", substring_index(raw, ".", 1))
            .withColumn("detail",
              when(raw.contains("."), substring_index(raw, ".", -1)))
            .join(broadcast(codes), Seq("category", "detail"), "left_anti")
            .select(col("_row").as("row"), col("colname").as("column"),
              lit("ICD Code").as("kind"),
              concat(lit("ICD Code Error: invalid code "), raw)
                .as("message"),
              lit(true).as("isError"))
        case None =>
          cellCheck(!col("isNA") && col("colname") === "ICDCode__ICDCode" &&
            !raw.rlike("^[A-Z][0-9X]{2}\\.[0-9A-ZX]{1,4}$"), "ICD Code",
            concat(lit("ICD Code Error: invalid code "), raw))
      }))

    // ---- aggregate checks ----
    val aggChecks = scala.collection.mutable.ArrayBuffer[DataFrame]()

    def dfCol(flatName: String): Option[String] =
      aligned.find(_._1.flatName == flatName).map(_._2)

    // one study per file (validate.py:355-358)
    dfCol("Study__StudyName").foreach { sc =>
      val n = df.filter(col(sc) =!= "NA" && col(sc).isNotNull)
        .select(sc).distinct().count()
      if (n > 1) aggChecks += spark.createDataset(Seq(Finding(-1,
        "Study__StudyName", "Multiple Studies",
        "Multiple Studies Error: multiple studies in one metadata file",
        isError = true))).toDF()
    }

    // duplicate values are checked only on the reference's identity
    // columns (validate.py:404-428): RawDataID, HostSubjectId,
    // AnimalSubjectID, IllnessInstanceID, and BarcodeSequence within a
    // sequencing run — NOT every "unique"-typed column (SpecimenID
    // legitimately repeats across aliquot rows)
    val dupCheckCols = Set("RawData__RawDataID", "Subjects__HostSubjectId",
      "AnimalSubjects__AnimalSubjectID", "Illness__IllnessInstanceID",
      "RawData__BarcodeSequence")
    val runColOpt = dfCol("RawDataProtocol__RawDataProtocolID")
    aligned.filter { case (s, _) => dupCheckCols.contains(s.flatName) }
      .foreach { case (s, f) =>
      val grouping =
        if (s.column == "BarcodeSequence" && runColOpt.isDefined)
          Seq(col(runColOpt.get), col(f))
        else Seq(col(f))
      aggChecks += df.filter(col(f).isNotNull && col(f) =!= "NA")
        .groupBy(grouping: _*)
        .agg(count(lit(1)).as("n"), min(col("_row")).as("row"))
        .filter(col("n") > 1)
        .select(col("row"), lit(s.flatName).as("column"),
          lit("Duplicate Value").as("kind"),
          concat(lit("Duplicate Value Error: value "), col(f),
            lit(" appears "), col("n"), lit(" times in unique column "),
            lit(s.column)).as("message"),
          lit(true).as("isError"))
    }

    // barcode length uniformity per sequencing run (validate.py:168-186)
    dfCol("RawData__BarcodeSequence").foreach { bc =>
      val grouped = runColOpt match {
        case Some(rc) => df.groupBy(col(rc))
        case None => df.groupBy(lit(1))
      }
      aggChecks += grouped
        .agg(countDistinct(length(col(bc))).as("n_lengths"),
          min(col("_row")).as("row"))
        .filter(col("n_lengths") > 1)
        .select(col("row"), lit("RawData__BarcodeSequence").as("column"),
          lit("Barcode Length").as("kind"),
          lit("Barcode Length Error: barcodes of differing lengths " +
            "within a sequencing run").as("message"),
          lit(true).as("isError"))
    }

    // start/end date ordering within a table (validate.py:365-377)
    aligned.filter(_._1.column.contains("StartDate")).foreach {
      case (s, fs) =>
        val endName = s.column.replace("StartDate", "EndDate")
        aligned.find { case (e, _) =>
          e.table == s.table && e.column == endName }.foreach {
          case (e, fe) =>
            aggChecks += df.filter(try_to_date(col(fs)).isNotNull &&
                try_to_date(col(fe)).isNotNull &&
                try_to_date(col(fe)) < try_to_date(col(fs)))
              .select(col("_row").as("row"), lit(e.flatName).as("column"),
                lit("Invalid Date Range").as("kind"),
                concat(lit("Invalid Date Range Error: end date "),
                  col(fe), lit(" is earlier than start date "),
                  col(fs)).as("message"),
                lit(true).as("isError"))
        }
    }

    // whole-column type mismatch by majority vote (util.py:505-550
    // get_col_type + validate.py Column Wrong Type): a declared-numeric
    // column whose present cells are MOSTLY non-numeric is mistyped as a
    // column (individual strays stay Cell Wrong Type)
    aligned.filter { case (s, _) => Set("Number", "Decimal", "Integer")
      .contains(s.declaredType) }.foreach { case (s, f) =>
      aggChecks += df.filter(col(f).isNotNull && col(f) =!= "NA")
        .agg(count(lit(1)).as("n"),
          count(when(col(f).try_cast("double").isNull, 1)).as("bad"))
        .filter(col("n") > 0 && col("bad") * 2 > col("n"))
        .select(lit(-1L).as("row"), lit(s.flatName).as("column"),
          lit("Column Wrong Type").as("kind"),
          lit(s"Column Wrong Type Error: column ${s.column} holds " +
            s"mostly non-${s.declaredType} values").as("message"),
          lit(true).as("isError"))
    }

    // numeric ±2σ outliers -> warnings (validate.py:137-151)
    aligned.filter { case (s, _) => Set("Number", "Decimal", "Integer")
      .contains(s.declaredType) }.foreach { case (s, f) =>
      val vals = df.select(col("_row"),
        col(f).try_cast("double").as("v")).filter(col("v").isNotNull)
      val stats = vals.agg(avg(col("v")).as("mu"),
        stddev_pop(col("v")).as("sigma"))
      aggChecks += vals.crossJoin(broadcast(stats))
        .filter(col("sigma") > 0 &&
          abs(col("v") - col("mu")) > lit(2.0) * col("sigma"))
        .select(col("_row").as("row"), lit(s.flatName).as("column"),
          lit("Outlier Value").as("kind"),
          concat(lit("Outlier Value Warning: value "), col("v"),
            lit(" is more than 2 standard deviations from the mean"))
            .as("message"),
          lit(false).as("isError"))
    }

    // categorical outliers: rare values (count < mean-std, count < 3)
    // -> warnings (validate.py:153-166)
    aligned.filter { case (s, _) =>
      Schema.sparkType(s.declaredType) == StringType &&
        s.column != "ICDCode" && s.table != "AdditionalMetaData" &&
        !s.declaredType.contains("unique") }.foreach { case (s, f) =>
      val counts = df.filter(col(f).isNotNull && col(f) =!= "NA")
        .groupBy(col(f)).agg(count(lit(1)).as("n"),
          min(col("_row")).as("row"))
      val stats = counts.agg(avg(col("n")).as("mu"),
        coalesce(stddev_pop(col("n")), lit(0.0)).as("sigma"))
      aggChecks += counts.crossJoin(broadcast(stats))
        .filter(col("n") < col("mu") - col("sigma") && col("n") < 3)
        .select(col("row"), lit(s.flatName).as("column"),
          lit("Categorical Data").as("kind"),
          concat(lit("Categorical Data Warning: value "), col(f),
            lit(" appears only "), col("n"), lit(" times in column "),
            lit(s.column)).as("message"),
          lit(false).as("isError"))
    }

    (Seq(headerDf) ++ checks ++ aggChecks)
      .reduce(_.unionByName(_))
      .orderBy(col("row"), col("column"), col("kind"))
  }

  /** Subject reconciliation between subject and specimen sheets
    * (validate.py:629-652): symmetric difference of subject IDs, each
    * orphan tagged with the side it came from. */
  def reconcileSubjects(subject: MetadataSheet, specimen: MetadataSheet,
      subjectType: String): DataFrame = {
    val subjId = subjectType match {
      case "animal" => col("AnimalSubjects__AnimalSubjectID")
      case "mixed" => coalesce(col("Subjects__HostSubjectId"),
        col("AnimalSubjects__AnimalSubjectID"))
      case _ => col("Subjects__HostSubjectId")
    }
    val a = subject.df.select(subjId.cast(StringType).as("id")).distinct()
      .filter(col("id").isNotNull && col("id") =!= "NA")
    val b = specimen.df.select(
      col("AdditionalMetaData__SubjectIdCol").cast(StringType).as("id"))
      .distinct().filter(col("id").isNotNull && col("id") =!= "NA")
    val onlySubject = a.join(b, Seq("id"), "left_anti")
      .select(lit(-1L).as("row"),
        lit("Subjects__HostSubjectId").as("column"),
        lit("Missing Subject").as("kind"),
        concat(lit("Missing Subject Error: subject "), col("id"),
          lit(" has no specimen rows")).as("message"),
        lit(true).as("isError"))
    val onlySpecimen = b.join(a, Seq("id"), "left_anti")
      .select(lit(-1L).as("row"),
        lit("AdditionalMetaData__SubjectIdCol").as("column"),
        lit("Missing Subject").as("kind"),
        concat(lit("Missing Subject Error: specimen subject "), col("id"),
          lit(" not present in the subject file")).as("message"),
        lit(true).as("isError"))
    onlySubject.unionByName(onlySpecimen)
  }

  /** Study-name consistency check (validate.py:654-659): when a sheet is
    * uploaded into a named study, every non-NA `StudyName` cell must
    * equal it. */
  def checkStudyName(sheet: MetadataSheet, expected: String): DataFrame = {
    val sc = "Study__StudyName"
    val df = sheet.df
    if (!df.columns.contains(sc))
      return df.sparkSession.emptyDataFrame
        .withColumn("row", lit(0L)).withColumn("column", lit(""))
        .withColumn("kind", lit("")).withColumn("message", lit(""))
        .withColumn("isError", lit(true)).limit(0)
    df.filter(col(sc).isNotNull && col(sc) =!= "NA" && col(sc) =!= expected)
      .select(col("_row").as("row"), lit(sc).as("column"),
        lit("Study Name").as("kind"),
        concat(lit("Study Name Error: study name "), col(sc),
          lit(s" does not match the target study $expected")).as("message"),
        lit(true).as("isError"))
  }

  /** Sequencing-run existence check (validate.py:254-274): every
    * `RawDataProtocolID` named in the sheet must be a known run (from
    * the docs catalog) or declared in this same sheet's
    * RawDataProtocols rows. */
  def checkSequencingRuns(sheet: MetadataSheet,
      knownRuns: Seq[String]): DataFrame = {
    val runCol = "RawDataProtocol__RawDataProtocolID"
    val df = sheet.df
    if (!df.columns.contains(runCol))
      return df.sparkSession.emptyDataFrame
        .withColumn("row", lit(0L)).withColumn("column", lit(""))
        .withColumn("kind", lit("")).withColumn("message", lit(""))
        .withColumn("isError", lit(true)).limit(0)
    df.filter(col(runCol).isNotNull && col(runCol) =!= "NA" &&
        !col(runCol).isin(knownRuns: _*))
      .groupBy(col(runCol))
      .agg(min(col("_row")).as("row"))
      .select(col("row"), lit(runCol).as("column"),
        lit("Sequencing Run").as("kind"),
        concat(lit("Sequencing Run Error: unknown sequencing run "),
          col(runCol)).as("message"),
        lit(true).as("isError"))
  }

  /** Errors only / warnings only convenience splits. */
  def errors(findings: DataFrame): DataFrame =
    findings.filter(col("isError"))
  def warnings(findings: DataFrame): DataFrame =
    findings.filter(!col("isError"))
}
