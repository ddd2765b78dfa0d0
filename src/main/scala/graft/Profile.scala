package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Dev tool: stage-level timing breakdown for the bench tail, used to
  * separate fixable plan cost from inherent output cost.
  *
  * Finding (sf0.1, local[32]): the documents corpus is heavily templated
  * — 5,000 docs contain 2.63M true near-dup pairs at jaccard >= 0.8 (21%
  * of all 12.5M pairs; largest identical-token-set group alone is 248
  * docs). Any operator whose CONTRACT is "emit all near-dup pairs" is
  * therefore quadratic on this data: qd05's ~12 s is ~210k
  * verified-emitted pairs/s, with LSH candidate precision at 64%
  * (4.1M candidates -> 2.6M true pairs). The scale-out answer for such
  * corpora is cluster-collapse (Dedup.dupClusters / curatedCorpus), not
  * a faster pair list.
  *
  * Run: `sbt "runMain graft.Profile"`.
  */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println("[profile] docs: " + docs.count())

    // duplicate structure: identical token-set groups
    val sets = docs.select(col("doc_id"),
      xxhash64(array_join(array_sort(array_distinct(
        TextAnalysis.tokens(col("text")))), " ")).as("fp"))
    val g = sets.groupBy("fp").count()
    println("[profile] distinct token-sets: " + g.count())
    g.agg(max("count").as("largest_group"),
      sum(col("count") * (col("count") - 1) / 2).as("identical_pairs")).show()

    // qd05 sub-steps
    time("minhash signatures")(
      Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 64).count())
    time("candidate pairs")(println("[profile] candidates: " +
      Dedup.minhashCandidatePairs(docs, col("doc_id"), col("text"), 8, 8)
        .count()))
    time("full minhashNearDup")(println("[profile] true pairs j>=0.8: " +
      Dedup.minhashNearDup(docs, col("doc_id"), col("text"), 0.8).count()))
    spark.stop()
  }
}
