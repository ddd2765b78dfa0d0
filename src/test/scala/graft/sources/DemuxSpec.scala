package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demultiplex validation specs over the reference's own golden
  * stripped-output dirs (test_files/test_stripped_{0,1,2}, the fixtures
  * of tests/unit/test_demultiplex.py) and its dual-barcode qiime
  * mapping file. */
class DemuxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val fixtures = "/root/reference/test_files"

  /** (sample, fwd, rev) barcodes from the pheniqs qiime mapping file:
    * columns BarcodeSequence + BarcodeSequenceR, 2 header rows. */
  lazy val mapping = {
    val lines = scala.io.Source.fromFile(
      s"$fixtures/test_pheniqs_mapping_file.tsv")
    val rows = try lines.getLines().toVector finally lines.close()
    val header = rows.head.split("\t", -1)
    val iS = header.indexOf("#SampleID")
    val iF = header.indexOf("BarcodeSequence")
    val iR = header.indexOf("BarcodeSequenceR")
    import spark.implicits._
    rows.drop(2).map(_.split("\t", -1))
      .map(r => (r(iS), r(iF), r(iR)))
      .toDF("sample", "barcode_fwd", "barcode_rev")
  }

  test("stripped level-0 reconciles: every read matches its sample " +
      "barcodes exactly") {
    val reads = Fastq.read(spark, s"$fixtures/test_stripped_0")
    val report = Fastq.demuxValidationReport(reads, mapping, maxErrors = 0)
      .collect()
    // 8 mapped samples x R1+R2 = 16 files, all fully matched at 0 errors
    val withFiles = report.filter(_.getAs[String]("fname") != null)
    assert(withFiles.length == 16, report.mkString("\n"))
    withFiles.foreach { r =>
      assert(r.getAs[Long]("n_reads") > 0, r.toString)
      assert(r.getAs[Long]("n_matched") == r.getAs[Long]("n_reads"),
        r.toString)
      assert(r.getAs[Double]("match_frac") == 1.0, r.toString)
      // level-0 stripping keeps only the sample's own barcode pair
      assert(r.getAs[Long]("n_distinct_pairs") == 1L, r.toString)
    }
  }

  test("stripped level-2 contains near-miss barcodes: matched at 2 " +
      "errors, not at 0") {
    val reads = Fastq.read(spark, s"$fixtures/test_stripped_2")
    val strict = Fastq.demuxValidationReport(reads, mapping, 0).collect()
      .filter(_.getAs[String]("fname") != null)
    val loose = Fastq.demuxValidationReport(reads, mapping, 2).collect()
      .filter(_.getAs[String]("fname") != null)
    assert(loose.forall(r =>
      r.getAs[Long]("n_matched") == r.getAs[Long]("n_reads")))
    // the level-2 dirs exist precisely because error reads survive there
    val strictMatched = strict.map(r => r.getAs[Long]("n_matched")).sum
    val looseMatched = loose.map(r => r.getAs[Long]("n_matched")).sum
    assert(strictMatched < looseMatched)
    // read counts grow with the error budget: level0 <= level2 per file
    val l0 = Fastq.read(spark, s"$fixtures/test_stripped_0")
      .groupBy(col("file")).count().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    loose.foreach { r =>
      val f = r.getAs[String]("fname")
      val n0 = l0.collectFirst {
        case (k, v) if k.startsWith(f) => v / 4 }.getOrElse(0L)
      assert(r.getAs[Long]("n_reads") >= n0, s"$f: $r vs $n0")
    }
  }

  test("unmapped sample surfaces with zero reads; pair counts cover " +
      "all observed barcodes") {
    import spark.implicits._
    val reads = Fastq.read(spark, s"$fixtures/test_stripped_0")
    val withGhost = mapping.unionByName(
      Seq(("ghost_sample", "AAAAAAAA", "TTTTTTTT"))
        .toDF("sample", "barcode_fwd", "barcode_rev"))
    val report = Fastq.demuxValidationReport(reads, withGhost, 0)
    val ghost = report.filter(col("sample") === "ghost_sample").collect()
    assert(ghost.length == 1 && ghost(0).getAs[Long]("n_reads") == 0L)

    val pairs = Fastq.barcodePairCounts(reads).collect()
    assert(pairs.nonEmpty)
    val totalPairReads = pairs.map(_.getAs[Long]("n_reads")).sum
    assert(totalPairReads == reads.count())
  }
}
