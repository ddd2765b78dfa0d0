package graft.mmeds

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture validation tests: each
  * `{subject,specimen}_validate_error_<kind>.tsv` under the reference's
  * validation_files/ must produce the matching error kind, and the clean
  * fixtures must produce zero errors (mirrors
  * mmeds/tests/unit/test_validate.py). */
class ValidatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/reference/test_files/validation_files"
  val fixtures = "/root/reference/test_files"

  def kinds(path: String, subjectType: String,
      template: Option[String] = None): Set[String] = {
    val tpl = template.map(t => MetadataTsv.readRaw(spark, t))
    Validator.errors(Validator.validate(spark, path, subjectType, tpl))
      .select("kind").distinct().collect().map(_.getString(0)).toSet
  }

  test("clean subject fixture has no errors") {
    val e = kinds(s"$fixtures/test_subject.tsv", "human",
      Some(s"$fixtures/test_subject.tsv"))
    assert(e.isEmpty, s"unexpected errors: $e")
  }

  test("clean specimen fixture has no errors") {
    val e = kinds(s"$fixtures/test_specimen.tsv", "specimen",
      Some(s"$fixtures/test_specimen.tsv"))
    assert(e.isEmpty, s"unexpected errors: $e")
  }

  // fixture suffix -> expected error kind, subject-file variants
  val subjectCases: Seq[(String, String)] = Seq(
    "cell_length" -> "Cell Length",
    "duplicate_value" -> "Duplicate Value",
    "empty_cell" -> "Empty Cell",
    "future_date" -> "Future Date",
    "illegal_header" -> "Illegal Header",
    "illegal_table" -> "Illegal Table",
    "invalid_date_range" -> "Invalid Date Range",
    "invalid_icd_code" -> "ICD Code",
    "missing_required_value" -> "Missing Required Value",
    "missing_table" -> "Missing Table",
    "na_header" -> "NA Header",
    "non_standard_na" -> "NA",
    "number_header" -> "Number Header",
    "phi_header" -> "PHI Header",
    "whitespace" -> "Whitespace",
    "wrong_type" -> "Cell Wrong Type")

  subjectCases.foreach { case (suffix, kind) =>
    test(s"subject fixture $suffix raises $kind") {
      val got = kinds(s"$dir/subject_validate_error_$suffix.tsv", "human")
      assert(got.contains(kind), s"expected $kind in $got")
    }
  }

  test("ICD code-table membership: unknown well-formed code errors, known pass") {
    val codes = Some(Icd.loadCodeTable(spark,
      getClass.getResource("/icd10cm_sample.txt").getPath))
    def icdKinds(path: String, tbl: Option[
        org.apache.spark.sql.DataFrame]): Set[String] =
      Validator.errors(Validator.validate(spark, path, "human", None, tbl))
        .filter(col("kind") === "ICD Code")
        .select("kind").distinct().collect().map(_.getString(0)).toSet
    // every code in the clean fixture is a known public ICD-10-CM code
    assert(icdKinds(s"$fixtures/test_subject.tsv", codes).isEmpty)
    // a WELL-FORMED but unknown code: passes the shape-only fallback,
    // caught only by the membership join (validate.py:199-212 semantics)
    val tampered = java.nio.file.Files.createTempFile("icd", ".tsv")
    java.nio.file.Files.writeString(tampered, java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$fixtures/test_subject.tsv"))
      .replace("A19.XXXX", "Q99.9999"))
    assert(icdKinds(tampered.toString, None).isEmpty)
    assert(icdKinds(tampered.toString, codes) == Set("ICD Code"))
  }

  val specimenCases: Seq[(String, String)] = Seq(
    "cell_length" -> "Cell Length",
    "duplicate_value" -> "Duplicate Value",
    "empty_cell" -> "Empty Cell",
    "future_date" -> "Future Date",
    "illegal_header" -> "Illegal Header",
    "illegal_table" -> "Illegal Table",
    "invalid_barcodesequence" -> "Barcode",
    "missing_required_value" -> "Missing Required Value",
    "missing_table" -> "Missing Table",
    "multiple_studies" -> "Multiple Studies",
    "na_header" -> "NA Header",
    "non_standard_na" -> "NA",
    "number_header" -> "Number Header",
    "whitespace" -> "Whitespace",
    "wrong_type" -> "Cell Wrong Type")

  specimenCases.foreach { case (suffix, kind) =>
    test(s"specimen fixture $suffix raises $kind") {
      val got = kinds(s"$dir/specimen_validate_error_$suffix.tsv",
        "specimen")
      assert(got.contains(kind), s"expected $kind in $got")
    }
  }

  test("template comparison catches missing and illegal columns") {
    val mc = kinds(s"$dir/subject_validate_error_missing_column.tsv",
      "human", Some(s"$fixtures/test_subject.tsv"))
    assert(mc.contains("Missing Column"), s"got $mc")
    val ic = kinds(s"$dir/subject_validate_error_illegal_column.tsv",
      "human", Some(s"$fixtures/test_subject.tsv"))
    assert(ic.contains("Illegal Column") || ic.contains("Missing Column"),
      s"got $ic")
  }

  test("duplicate header fixture raises Duplicate Header") {
    val got = kinds(s"$dir/subject_validate_error_duplicate_column.tsv",
      "human")
    assert(got.contains("Duplicate Header"), s"got $got")
  }

  test("study-name mismatch flags rows; matching name is clean") {
    val sheet = MetadataTsv.readRaw(spark, s"$fixtures/test_specimen.tsv")
    assert(Validator.checkStudyName(sheet, "Good_Study").count() == 0)
    val bad = Validator.checkStudyName(sheet, "Other_Study")
    assert(bad.count() > 0)
    assert(bad.select("kind").distinct().head().getString(0) == "Study Name")
  }

  test("majority non-numeric column raises Column Wrong Type") {
    // declared-Number column holding mostly words -> column-level error
    val tmp = java.nio.file.Files.createTempFile("cwt", ".tsv")
    val rows = Seq(
      "Subjects\tSubjects",
      "HostSubjectId\tHeight",
      "Required\tRequired",
      "Text\tNumber",
      "\t",
      "s1\ttall",
      "s2\tshort",
      "s3\t12.5")
    java.nio.file.Files.writeString(tmp, rows.mkString("\n"))
    val f = Validator.validate(spark, tmp.toString, "human")
    assert(Validator.errors(f)
      .filter(col("kind") === "Column Wrong Type").count() == 1)
    // and the stray numeric cells still get their cell-level errors
    assert(Validator.errors(f)
      .filter(col("kind") === "Cell Wrong Type").count() == 2)
  }

  test("warning fixtures produce warnings, not errors") {
    val f = Validator.validate(spark,
      s"$dir/subject_validate_warning_stddev_warning.tsv", "human")
    assert(Validator.warnings(f)
      .filter(col("kind") === "Outlier Value").count() > 0)
    val c = Validator.validate(spark,
      s"$dir/subject_validate_warning_categorical_data.tsv", "human")
    assert(Validator.warnings(c)
      .filter(col("kind") === "Categorical Data").count() > 0)
  }

  test("sequencing-run existence check flags unknown runs") {
    val specimen = MetadataTsv.readRaw(spark, s"$fixtures/test_specimen.tsv")
    val bad = Validator.checkSequencingRuns(specimen, Seq("NotARun"))
    assert(bad.count() > 0)
    val runs = specimen.df
      .select("RawDataProtocol__RawDataProtocolID").distinct()
      .collect().map(_.getString(0)).filter(_ != null).toSeq
    assert(Validator.checkSequencingRuns(specimen, runs).count() == 0)
  }

  test("findings render to an HTML report with cell + banner markup") {
    val path = s"$dir/subject_validate_error_empty_cell.tsv"
    val sheet = MetadataTsv.readRaw(spark, path)
    val f = Validator.validate(spark, path, "human")
    val html = FindingsHtml.render(sheet, f)
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("</table>"))
    // the empty-cell error is cell-level: highlighted cell with message
    assert(html.contains("bgcolor=\"red\""))
    assert(html.contains("-----------<br>"))
    // every data row renders
    val nRows = sheet.df.count()
    assert(html.sliding(4).count(_ == "<tr>") >= nRows + 2)
    // a clean sheet renders no highlights or banners
    val cleanPath = s"$fixtures/test_subject.tsv"
    val clean = FindingsHtml.render(MetadataTsv.readRaw(spark, cleanPath),
      Validator.validate(spark, cleanPath, "human",
        Some(MetadataTsv.readRaw(spark, cleanPath))))
    assert(!clean.contains("bgcolor=") && !clean.contains("<h3"))
  }

  test("subject reconciliation reports orphans on both sides") {
    val subject = MetadataTsv.readRaw(spark, s"$fixtures/test_subject.tsv")
    val specimen = MetadataTsv.readRaw(spark,
      s"$dir/specimen_validate_error_missing_subject.tsv")
    val f = Validator.reconcileSubjects(subject, specimen, "human")
    assert(f.count() > 0)
    assert(f.filter(col("kind") === "Missing Subject").count() == f.count())
  }
}
