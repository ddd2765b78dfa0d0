package graft.mmeds

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Analysis-config surface specs mirroring the reference's
  * test_g_load_config_file (tests/unit/test_util.py:123-147): defaults,
  * 'all' expansion, and the four failure classes; plus the
  * simplified-metadata expansion round-trip (test_a_simplified_to_full,
  * test_util.py:22-24). */
class AnalysisConfigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val fixtures = "/root/reference/test_files"
  val wf = "core_pipeline_taxonomic"

  lazy val metadata = AnalysisConfig.plainView(
    MetadataTsv.read(spark, s"$fixtures/test_metadata.tsv"))

  def cfg(path: String): Option[String] =
    Some(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  test("no config -> defaults, every workflow parameter present") {
    val config = AnalysisConfig.loadConfig(None, metadata, wf)
    AnalysisConfig.workflows(wf).foreach { p =>
      assert(config.contains(p) && config(p) != null, p)
    }
    // sequencing runs are injected from the metadata, not the file
    assert(config("sequencing_runs")
      .asInstanceOf[Seq[String]].nonEmpty)
  }

  test("'all' config expands taxa levels to 1..7 and metadata columns") {
    val config = AnalysisConfig.loadConfig(
      cfg(s"$fixtures/test_config_all.yaml"), metadata, wf)
    assert(config("taxa_levels") == (1 to 7).toList)
    assert(config("taxa_levels_all") == true)
    val cols = config("metadata").asInstanceOf[Seq[String]]
    assert(cols.nonEmpty)
    // the all-path skips degenerate columns instead of erroring
    val types = config("metadata_continuous")
      .asInstanceOf[Map[String, Boolean]]
    assert(cols.forall(types.contains))
  }

  test("missing parameter fails with the reference message") {
    val e = intercept[InvalidConfigException] {
      AnalysisConfig.loadConfig(
        cfg(s"$fixtures/test_config_file_fail1.yaml"), metadata, wf)
    }
    assert(e.message.contains("Missing parameter"), e.message)
  }

  test("invalid metadata column fails with the reference message") {
    val e = intercept[InvalidConfigException] {
      AnalysisConfig.loadConfig(
        cfg(s"$fixtures/test_config_file_fail2.yaml"), metadata, wf)
    }
    assert(e.message.contains("Invalid metadata column"), e.message)
  }

  test("unknown parameter fails with the reference message") {
    val e = intercept[InvalidConfigException] {
      AnalysisConfig.loadConfig(
        cfg(s"$fixtures/test_config_file_fail3.yaml"), metadata, wf)
    }
    assert(e.message.contains("Invalid parameter"), e.message)
  }

  test("non-YAML input fails with the YAML-format message") {
    val e = intercept[InvalidConfigException] {
      AnalysisConfig.loadConfig(
        cfg(s"$fixtures/test_metadata.tsv"), metadata, wf)
    }
    assert(e.message.contains("YAML format"), e.message)
  }

  test("ignore_bad_cols keeps going past bad explicit columns") {
    val config = AnalysisConfig.loadConfig(
      cfg(s"$fixtures/test_config_file_fail2.yaml"), metadata, wf,
      ignoreBadCols = true)
    val cols = config("metadata").asInstanceOf[Seq[String]]
    assert(cols.contains("SpecimenBodySite") && !cols.contains("Ethnici"))
  }

  test("write_config round-trips: derived keys dropped, 'all' restored") {
    val config = AnalysisConfig.loadConfig(
      cfg(s"$fixtures/test_config_all.yaml"), metadata, wf)
    val yaml = AnalysisConfig.writeConfig(config)
    assert(!yaml.contains("metadata_continuous"))
    assert(!yaml.contains("_all"))
    assert(yaml.contains("taxa_levels: all"))
    // reloading the rendered config parses clean
    val again = AnalysisConfig.loadConfig(Some(yaml), metadata, wf)
    assert(again("taxa_levels") == (1 to 7).toList)
  }

  test("getValidColumns: none/all/explicit semantics") {
    val (none, _) = AnalysisConfig.getValidColumns(metadata, "none")
    assert(none.isEmpty)
    val (cols, types) = AnalysisConfig.getValidColumns(metadata, "all")
    // RawDataID identifies every row -> all-unique categorical, excluded;
    // HostSubjectId has repeats in the fixture (40 rows, 34 distinct) so
    // it stays, matching the reference's nunique() < len test
    assert(!cols.contains("RawDataID"))
    assert(cols.contains("HostSubjectId"))
    assert(cols.forall(types.contains))
    val (expl, explTypes) = AnalysisConfig.getValidColumns(metadata,
      List("Ethnicity", "SpecimenBodySite"))
    assert(expl == Seq("Ethnicity", "SpecimenBodySite"))
    assert(explTypes.values.forall(_ == false))
  }

  test("simplified_to_full: subject + specimen expand and validate") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_simpl")
    val subj = MetadataTsv.simplifiedToFull(spark,
      s"$fixtures/test_subject_simplified.tsv",
      s"$fixtures/test_subject.tsv", "subject")
    // every template column now present
    val tmplSubj = MetadataTsv.readRaw(spark, s"$fixtures/test_subject.tsv")
    val subjCols = subj.specs.map(_.flatName).toSet
    assert(tmplSubj.specs.map(_.flatName).forall(subjCols.contains))

    val spec = MetadataTsv.simplifiedToFull(spark,
      s"$fixtures/test_specimen_simplified.tsv",
      s"$fixtures/test_specimen.tsv", "specimen")
    val specCols = spec.specs.map(_.flatName).toSet
    // simplified Specimen* names landed as full-format RawData* names
    // (the full template re-adds its own Specimen table, so
    // Specimen__SpecimenID legitimately reappears as a filled column)
    assert(specCols.contains("RawData__RawDataID"))
    assert(specCols.contains("RawData__BarcodeSequence"))
    assert(!specCols.contains("Specimen__BarcodeSequence"))
    val tmplSpec = MetadataTsv.readRaw(spark, s"$fixtures/test_specimen.tsv")
    assert(tmplSpec.specs.map(_.flatName).forall(specCols.contains))
    // required fills: SpecimenID derives from RawDataID, ProtocolIDs number
    import org.apache.spark.sql.functions.col
    val row = spec.df.orderBy(col("_row")).limit(1)
      .select(col("Specimen__SpecimenID"), col("RawData__RawDataID"),
        col("RawDataProtocol__RawDataProtocolID"))
      .collect()(0)
    assert(row.getString(0) == "Specimen_" + row.getString(1))
    assert(row.getString(2) == "0")

    // the expanded sheet writes as a full 5-header TSV and re-reads
    val out = tmp.resolve("specimen_full.tsv").toString
    MetadataTsv.write(spec, out)
    val back = MetadataTsv.readRaw(spark, out)
    assert(back.specs.map(_.flatName).toSet == specCols)
    assert(back.df.count() == spec.df.count())
  }
}
