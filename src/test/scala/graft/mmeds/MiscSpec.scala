package graft.mmeds

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Fastq

/** Specs for the docs catalog, scalar functions, derived weights, and
  * the fastq source. */
class MiscSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("camelCase and identifier validation") {
    import spark.implicits._
    val got = Seq("body_site", "rotator-cuff replacement", "a.b'c")
      .toDF("s").select(Functions.camelCase(col("s"))).as[String]
      .collect().toSeq
    assert(got == Seq("BodySite", "RotatorCuffReplacement", "ABC"))
    assert(Functions.validIdentifier("SpecimenWeight_1"))
    assert(!Functions.validIdentifier("drop table"))
    assert(!Functions.validIdentifier("1abc"))
    assert(!Functions.validIdentifier("a" * 67))
  }

  test("docs catalog: save, access-code lookup, file index, run ids") {
    val catalog = new InMemoryCatalog
    val docs = new Docs(spark, catalog)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    docs.save(Seq(
      MmedsDoc(1, "study", "alice", "a@x.org", "code-1", "StudyA", "",
        t0, Map("metadata" -> "/x/meta.tsv", "reads" -> "/x/r.fq.gz"),
        Map("approach" -> "qiime2")),
      MmedsDoc(2, "analysis", "alice", "a@x.org", "code-2", "StudyA",
        "qiime2", t0, Map.empty, Map.empty)))
    assert(docs.byAccessCode("alice", "code-1").exists(_.doc_id == 1))
    assert(docs.byAccessCode("bob", "code-1").isEmpty)
    assert(docs.forStudy("StudyA").count() == 2)
    assert(docs.fileIndex.filter(col("path").isNotNull).count() == 2)
    assert(docs.nextRunId("StudyA", "qiime2") == 1)
  }

  test("access-code generation: length, charset, seeded determinism") {
    val code = Functions.accessCode()
    assert(code.length == 10 && code.forall(c => c >= 'a' && c <= 'z'))
    // injectable RNG -> reproducible codes (and distinct across draws)
    val a = Functions.accessCode(rng = new java.util.Random(42L))
    val b = Functions.accessCode(rng = new java.util.Random(42L))
    val c = Functions.accessCode(12, new java.util.Random(43L))
    assert(a == b && c.length == 12 && a != c.take(10))
  }

  test("sequencing runs list distinct run names; run-name guard") {
    val catalog = new InMemoryCatalog
    val docs = new Docs(spark, catalog)
    def runDoc(id: Long, run: String, t: String) = MmedsDoc(id,
      "sequencing_run", "alice", "a@x.org", s"code-$id", run, "",
      java.sql.Timestamp.valueOf(s"2026-01-0$id 00:00:00"),
      Map.empty, Map.empty)
    docs.save(Seq(runDoc(1, "run_B", ""), runDoc(2, "run_A", ""),
      runDoc(3, "run_B", "")))
    // distinct run NAMES (not (study, analysis) groups), first-seen order
    val runs = docs.sequencingRuns.collect().map(_.getString(0)).toSeq
    assert(runs == Seq("run_B", "run_A"))
    assert(docs.checkSequencingRunName("run_B").exists(
      _.contains("already in use")))
    assert(docs.checkSequencingRunName("bad name!").exists(
      _.contains("alpha-numeric")))
    assert(docs.checkSequencingRunName("run_C_2026").isEmpty)
  }

  test("MIxS <-> MMEDS column mapping round-trips") {
    import spark.implicits._
    val mixs = Seq(("AmpliconSeq", "StudyX", "40.7 -74.0", "16S", "extra"))
      .toDF("investigation_type", "project_name", "lat_lon", "target_gene",
        "custom_field")
    val mmeds = Mixs.mixsToMmeds(mixs)
    assert(mmeds.columns.toSeq == Seq("Study__StudyType", "Study__StudyName",
      "CollectionSite__Latitude", "CollectionSite__Longitude",
      "RawDataProtocols__TargetGene", "AdditionalMetaData__custom_field"))
    val r = mmeds.head()
    assert(r.getString(2) == "40.7" && r.getString(3) == "-74.0")
    val back = Mixs.mmedsToMixs(mmeds)
    assert(back.columns.sorted.toSeq == mixs.columns.sorted.toSeq)
    assert(back.select(mixs.columns.map(col): _*).head() == mixs.head())
  }

  test("effective weights derive the trigger semantics") {
    val subject = MetadataTsv.read(spark,
      "/root/reference/test_files/test_subject.tsv")
    val specimen = MetadataTsv.read(spark,
      "/root/reference/test_files/test_specimen.tsv")
    val catalog = new InMemoryCatalog
    Normalizer.ingest(
      MetadataTsv.joinMetadata(subject, specimen, "human"), 2L, catalog)
    val w = Functions.effectiveSpecimenWeights(catalog)
    assert(w.count() == catalog.table("Specimen").get.count())
    // effective = initial - allocated, exactly
    assert(w.filter(col("effective_weight") =!=
      col("initial_weight") - col("allocated_weight")).count() == 0)
    // at least one specimen has multiple aliquots -> allocation > 0
    assert(w.filter(col("allocated_weight") > 0).count() > 0)
  }

  test("table-contents dump and query-result TSV sink respect RLS") {
    import spark.implicits._
    val catalog = new InMemoryCatalog
    catalog.append("Lab", Seq((1L, "LabA", 2L), (2L, "LabB", 3L))
      .toDF("idLab", "LabName", "user_id"))
    val engine = new Engine(spark, catalog)
    val mine = engine.forUser(2L)
    // user 2 sees only its own row (Lab is a protected table)
    val dump = mine.tableContents("Lab")
    assert(dump.contains("\"LabA\"") && !dump.contains("LabB"))
    val tsv = java.nio.file.Files.createTempFile("query", ".tsv").toString
    mine.executeToTsv("SELECT LabName FROM Lab ORDER BY LabName", tsv)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(tsv))
    assert(lines.get(0) == "LabName" && lines.get(1) == "LabA" &&
      lines.size == 2)
  }

  test("fastq reader groups 4-line records and demultiplexes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fq").toString
    val fq = Seq(
      "@r1", "GATCGATCAAAA", "+", "IIIIIIIIIIII",
      "@r2", "TTTTGATCGGGG", "+", "IIIIIIIIIIII",
      "@r3", "GATCGATCTTTT", "+", "IIIIIIIIIIII").mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/reads.fastq"), fq)
    val reads = Fastq.read(spark, s"$dir/reads.fastq")
    assert(reads.count() == 3)
    assert(reads.filter(col("read_id") === "r1")
      .head().getAs[String]("sequence") == "GATCGATCAAAA")

    val barcodes = Seq(("s1", "GATCGATC"), ("s2", "TTTTGATC"))
      .toDF("sample", "barcode")
    val demux = Fastq.demultiplex(reads, barcodes, maxErrors = 1)
    assert(demux.count() == 3)
    assert(demux.filter(col("read_id") === "r2")
      .head().getAs[String]("sample") == "s2")

    // multi-file alignment: a truncated first file must not shift the
    // records of the second file (per-file line numbering)
    val multi = java.nio.file.Files.createTempDirectory("fqm").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$multi/a.fastq"),
      Seq("@a1", "AAAA", "+", "IIII", "@trunc", "CCCC").mkString("\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$multi/b.fastq"),
      Seq("@b1", "GGGG", "+", "JJJJ").mkString("\n"))
    val m = Fastq.read(spark, s"$multi/*.fastq")
    val b1 = m.filter(col("read_id") === "b1").head()
    assert(b1.getAs[String]("sequence") == "GGGG" &&
      b1.getAs[String]("quality") == "JJJJ")
  }
}
