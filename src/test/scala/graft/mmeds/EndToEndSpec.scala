package graft.mmeds

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY §7 minimum end-to-end slice: read the reference's own
  * fixture sheets, normalize to the snowflake, build the view stack, and
  * run the reference smoke query (tests/unit/test_database.py:156-164:
  * PrimaryInvestigator = 'Amy Poehler' against MetaAnalysisView). */
class EndToEndSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val fixtures = "/root/reference/test_files"

  lazy val subject = MetadataTsv.read(spark, s"$fixtures/test_subject.tsv")
  lazy val specimen = MetadataTsv.read(spark, s"$fixtures/test_specimen.tsv")

  test("metadata TSV reader parses fixtures") {
    assert(subject.specs.length == 23)
    assert(subject.specs.head.table == "Ethnicity")
    assert(subject.df.count() == 38)
    assert(specimen.df.count() == 40)
    // NA is the only null token; typed per declared type
    val birthYears = subject.df.select(col("Subjects__BirthYear"))
    assert(birthYears.schema.head.dataType.typeName == "long" ||
      birthYears.schema.head.dataType.typeName == "double")
    val heights = subject.df.select(col("Heights__HeightDateCollected"))
    assert(heights.schema.head.dataType.typeName == "date")
  }

  test("write/read round-trip preserves shape") {
    val out = java.nio.file.Files.createTempDirectory("mmeds").toString
    MetadataTsv.write(subject, s"$out/roundtrip.tsv")
    val back = MetadataTsv.read(spark, s"$out/roundtrip.tsv")
    assert(back.df.count() == subject.df.count())
    assert(back.specs.map(_.flatName).toSet ==
      subject.specs.map(_.flatName).toSet)
    // spot value: same distinct subject ids
    val a = subject.df.select("Subjects__HostSubjectId").distinct().count()
    val b = back.df.select("Subjects__HostSubjectId").distinct().count()
    assert(a == b)
  }

  test("join + split metadata round-trips the id linkage") {
    val full = MetadataTsv.joinMetadata(subject, specimen, "human")
    assert(full.df.count() >= 40) // every specimen row kept (full outer)
    val (subj2, spec2) = MetadataTsv.splitMetadata(full, "human")
    assert(subj2.df.count() <= 40) // dedup'd unique subjects
    assert(spec2.df.count() == full.df.count())
    assert(spec2.specs.exists(_.column == "SubjectIdCol"))
  }

  lazy val catalog: InMemoryCatalog = {
    val c = new InMemoryCatalog
    val full = MetadataTsv.joinMetadata(subject, specimen, "human")
    Normalizer.ingest(full, userId = 2L, c)
    c
  }

  test("normalizer populates the snowflake with FK integrity") {
    val subj = catalog.table("Subjects").get
    assert(subj.count() > 0)
    val specimenT = catalog.table("Specimen").get
    val experiment = catalog.table("Experiment").get
    // every Specimen FK resolves to an Experiment row
    val dangling = specimenT.join(experiment,
      specimenT(Schema.fkCol("Experiment")) ===
        experiment(Schema.idCol("Experiment")), "left_anti")
    assert(dangling.count() == 0)
    // junction populated (test_database.py:98-114)
    assert(catalog.table("Subjects_has_Ethnicity").get.count() > 0)
    // surrogate ids dense from 1
    val ids = subj.select(Schema.idCol("Subjects")).collect().map(_.getLong(0))
    assert(ids.min == 1L && ids.max == ids.length)
  }

  test("ingest is idempotent: re-running the same sheet adds nothing") {
    val before = catalog.table("Subjects").get.count()
    val full = MetadataTsv.joinMetadata(subject, specimen, "human")
    Normalizer.ingest(full, userId = 2L, catalog)
    assert(catalog.table("Subjects").get.count() == before)
    assert(catalog.table("Specimen").get.count() ==
      catalog.table("Specimen").get.dropDuplicates(
        Schema.idCol("Specimen")).count())
  }

  test("meta-analysis view answers the reference smoke query") {
    val engine = new Engine(spark, catalog)
    val session = engine.forUser(2L)
    val meta = session.views.metaAnalysisView(includeAnimal = false)
    val hits = meta.filter(col("PrimaryInvestigator") === "Amy Poehler")
    assert(hits.count() > 0)
    val grouped = session.queryMetaAnalysis(
      "PrimaryInvestigator = 'Amy Poehler'")
    val row = grouped.collect().head
    assert(row.getAs[String]("StudyName") != null)
    assert(row.getAs[scala.collection.Seq[String]]("RawDataIDs").nonEmpty)
  }

  test("row-level security hides other users' rows") {
    val engine = new Engine(spark, catalog)
    // user 2 ingested everything; user 7 owns nothing
    val mine = engine.forUser(2L).resolve("Subjects").count()
    val theirs = engine.forUser(7L).resolve("Subjects").count()
    assert(mine > 0)
    assert(theirs == 0) // nothing public (user 1) in this catalog
    assert(engine.forUser(7L, isAdmin = true).resolve("Subjects")
      .count() == mine)
  }

  test("restricted WHERE grammar rejects LIKE/IN, extracts columns") {
    val engine = new Engine(spark, catalog)
    val s = engine.forUser(2L)
    assert(s.extractWhereColumns(
      "PrimaryInvestigator = 'X' AND BirthYear > 1900") ==
      Seq("PrimaryInvestigator", "BirthYear"))
    intercept[IllegalArgumentException] {
      s.extractWhereColumns("StudyName LIKE 'T%'")
    }
    intercept[IllegalArgumentException] {
      s.extractWhereColumns("StudyName IN ('A', 'B')")
    }
  }
}
