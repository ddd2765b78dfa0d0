package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the persisted fingerprint store's SCALE claim —
  * the number the oracle-bounded qm08/qm09 media corpus (2 000 docs)
  * cannot show: probe cost versus corpus size at a fixed batch. Builds
  * a [[graft.ops.FingerprintIndex]] over N pseudo-random 64-bit
  * signatures (xxhash64 of the id — uniform, so band buckets load
  * evenly and near-dup pairs are the rare-background case, matching a
  * deduplicated corpus), then times `hammingAgainstIndex` for a
  * B-sized arrival batch (ids offset past the corpus; their neighbors
  * planted at Hamming distance 4 so every probe verifies real pairs,
  * not just empty buckets). Prints one JSON line per corpus size.
  *
  * Usage: runMain graft.FpScale [sizes=100000,1000000] [batch=1000]
  *        [radius=8]
  */
object FpScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("100000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val batchN = args.lift(1).map(_.toInt).getOrElse(1000)
    val radius = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.FingerprintIndex

    sizes.foreach { n =>
      val corpus = spark.range(0, n)
        .select(col("id").as("doc_id"),
          xxhash64(col("id")).as("sh"))
      val path = java.nio.file.Files
        .createTempDirectory(s"fpscale_$n").toString
      val t0 = System.nanoTime()
      FingerprintIndex.writeHammingIndex(corpus, col("doc_id"),
        col("sh"), path, maxHamming = radius)
      val buildSec = (System.nanoTime() - t0) / 1e9
      // arrival batch: each row is a distance-4 neighbor of a stored
      // signature, so the probe must verify genuine candidates
      val batch = spark.range(0, batchN.toLong)
        .select((col("id") + n).as("doc_id"),
          xxhash64(col("id") % n).bitwiseXOR(lit(0x8421L)).as("sh"))
        .localCheckpoint() // synth cost out of the probe timer
      val t1 = System.nanoTime()
      val pairs = FingerprintIndex.hammingAgainstIndex(spark, batch,
        col("doc_id"), col("sh"), path).count()
      val probeSec = (System.nanoTime() - t1) / 1e9
      // the RANKED probe off the same artifact: same banded candidate
      // stage plus the bounded per-query top-k — the qm12 serving
      // shape, measured at corpus scale
      val t2 = System.nanoTime()
      val ranked = FingerprintIndex.hammingTopK(spark, batch,
        col("doc_id"), col("sh"), path, k = 5).count()
      val topkSec = (System.nanoTime() - t2) / 1e9
      println(s"""{"metric":"fp_scale","corpus":$n,"batch":$batchN,""" +
        s""""radius":$radius,"build_sec":${f"$buildSec%.2f"},""" +
        s""""probe_sec":${f"$probeSec%.2f"},"pairs":$pairs,""" +
        s""""topk_sec":${f"$topkSec%.2f"},"topk_rows":$ranked}""")
      graft.ops.StoreFiles.delete(spark, path)
    }
    spark.stop()
  }
}
