package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** [[Maintenance]] — the planner over the store health registry:
  * every registry signal maps to the right action, [[Maintenance
  * .applyPlan]] clears all of them with the correct per-family
  * compact, and the data each store serves is IDENTICAL before and
  * after the sweep (maintenance must be invisible to probes). */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def docs = Tables.load(spark, sf, "documents")
  private def embs = Tables.load(spark, sf, "embeddings")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("plan maps every registry signal to its action; applyPlan " +
      "clears them all without changing what the stores serve") {
    import spark.implicits._
    val root = tmp("st_maint")
    def at(name: String) = s"$root/$name"

    // fp: fingerprint store with pending tombstones
    FingerprintIndex.writeHammingIndex(
      Dedup.simhashSignatures(docs.filter(col("doc_id") % 2 === 0),
        col("doc_id"), col("text")),
      col("doc_id"), col("sh"), at("fp"), maxHamming = 3)
    FingerprintIndex.deleteDocs(spark, at("fp"),
      Seq(Tuple1(0L)).toDF("d"), col("d"))

    // clmap: cluster map with a pending relabel-patch log
    DedupIndex.writeClusterMap(
      Seq((1L, 2L), (10L, 11L)).toDF("a", "b"), col("a"), col("b"),
      at("clmap"))
    DedupIndex.mergeClusterMap(spark, at("clmap"),
      Seq((2L, 10L)).toDF("a", "b"), col("a"), col("b"))

    // ivf: trained store whose drift sidecar is missing (legacy sim)
    AnnIndex.writeIvfIndex(embs, col("vec_id"), col("embedding"),
      at("ivf"), nList = 4)
    StoreFiles.delete(spark, s"${at("ivf")}/errstate")

    // ivfpq: retrained once — generation 1 serves, gen-0 roots dead
    AnnIndex.writeIvfPqIndex(embs, col("vec_id"), col("embedding"),
      at("ivfpq"), nList = 4, numSub = 8, codebookSize = 8,
      refineIters = 0)
    AnnIndex.compactAnnIndex(spark, at("ivfpq"),
      retrainIters = Some(1))

    // lex: healthy store — nothing to do
    LexIndex.writeBm25Index(docs.filter(col("doc_id") < 200),
      col("doc_id"), col("text"), at("lex"))

    // junk: unclassifiable — inspect, never auto-touch
    new java.io.File(s"$root/junk/whatever").mkdirs()

    val p = Maintenance.plan(spark, root).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getSeq[String](3)))
      .toMap
    assert(p("fp")._2 == "compact" &&
      p("fp")._3.exists(_.contains("tombstoned rows")))
    assert(p("clmap")._2 == "compact" &&
      p("clmap")._3.exists(_.contains("relabel patches")))
    assert(p("ivf")._2 == "compact" &&
      p("ivf")._3.exists(_.contains("drift sidecar missing")))
    assert(p("ivfpq")._2 == "compact" &&
      p("ivfpq")._3.exists(_.contains("dead generation roots")))
    assert(p("lex")._2 == "none" && p("lex")._3.isEmpty)
    assert(p("junk")._2 == "inspect")

    // what each store serves, captured BEFORE the sweep
    val probe = Dedup.simhashSignatures(
        docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 60),
        col("doc_id"), col("text")).localCheckpoint()
    val fpBefore = FingerprintIndex.hammingAgainstIndex(spark, probe,
      col("doc_id"), col("sh"), at("fp")).collect().toSet
    val clBefore = DedupIndex.readClusterMap(spark, at("clmap"))
      .collect().toSet
    val q = embs.filter(col("vec_id") === 7)
      .select(col("embedding")).limit(1)
    val pqBefore = AnnIndex.queryIvfPqIndex(spark, at("ivfpq"), q,
      k = 5, nProbe = 4).select("vec_id").collect().toSet

    val executed = Maintenance.applyPlan(spark, root)
      .filter(col("action") === "compact")
      .select("store").collect().map(_.getString(0)).toSet
    assert(executed == Set("fp", "clmap", "ivf", "ivfpq"))

    // every signal cleared; junk still inspect-only and untouched
    val p2 = Maintenance.plan(spark, root).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(p2 == Map("fp" -> "none", "clmap" -> "none",
      "ivf" -> "none", "ivfpq" -> "none", "lex" -> "none",
      "junk" -> "inspect"))
    assert(new java.io.File(s"$root/junk/whatever").exists())

    // maintenance is invisible to probes: identical served data
    assert(FingerprintIndex.hammingAgainstIndex(spark, probe,
      col("doc_id"), col("sh"), at("fp")).collect().toSet == fpBefore)
    assert(DedupIndex.readClusterMap(spark, at("clmap"))
      .collect().toSet == clBefore)
    assert(AnnIndex.queryIvfPqIndex(spark, at("ivfpq"), q, k = 5,
      nProbe = 4).select("vec_id").collect().toSet == pqBefore)

    // the ivf upgrade wrote a sidecar that matches a recompute
    assert(AnnIndex.readErrState(spark, at("ivf")).nonEmpty)
    val m = StoreManifest.manifest(spark, root).collect()
      .map(r => r.getString(0) ->
        (r.getLong(7), r.getLong(8), r.getBoolean(9), r.getLong(10)))
      .toMap
    assert(m("fp")._1 == 0L)      // tombstones dropped
    assert(m("clmap")._2 == 0L)   // patches materialized
    assert(m("ivf")._3)           // drift sidecar present
    assert(m("ivfpq")._4 == 0L)   // dead generations reaped
  }
}
