package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the bench tail: times sub-stages of the
  * heaviest queries so optimization targets are measured, not guessed.
  * Not part of the library surface. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan

    // qd24 stages
    val lanes = time("portableLanes agg") {
      val l = Dedup.portableLanes(docs, col("doc_id"),
        col("source"), col("text"), 8)
      l.count(); l
    }
    time("tokens explode only") {
      docs.select(col("doc_id"),
        explode(array_distinct(regexp_extract_all(lower(col("text")),
          lit("\\S+"), lit(0)))).as("w")).count()
    }
    time("md5x8 map only") {
      val w = docs.select(col("doc_id"),
        explode(array_distinct(regexp_extract_all(lower(col("text")),
          lit("\\S+"), lit(0)))).as("w"))
      w.select((0 until 8).map(s =>
        substring(md5(concat(lit(s + ":"), col("w"))), 1, 16).as(s"l$s")): _*)
        .agg(count(lit(1))).collect()
    }
    time("full qd24 pipeline") {
      Dedup.minhashNearDupPortable(docs, col("doc_id"),
        col("source"), col("text"), 0.5).count()
    }
    // composed (union + window) vs native (merge-scan exec) as-of join
    val events = graft.Tables.loadEvents(spark, sfDir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        floor(col("value") * lit(100.0)).cast("long").as("cents"))
    time("asof composed (union+window)") {
      graft.ops.AsOf.asofJoin(purchases, clicks, "user_id", "ts",
        Seq("cents")).count()
    }
    time("asof native (merge-scan exec)") {
      graft.plans.AsOfNative.asofJoin(purchases, clicks, "user_id", "ts",
        Seq("cents")).count()
    }

    time("qd30 full") {
      val path = java.nio.file.Files.createTempDirectory("graft_mh").toString
      DedupIndex.writeMinhashIndex(
        docs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"), path)
      DedupIndex.nearDupAgainstIndex(spark,
        docs.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"), path,
        minEstimate = 0.5).count()
    }
    spark.stop()
  }
}
