package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the memoized drift state's scale claim — the number
  * the oracle-bounded qe56/qe57 fixtures cannot show: the per-arrival
  * monitor cost with the `errstate/` sidecar (one batch scan + a
  * sidecar read — should be CORPUS-FLAT) versus the legacy fallback
  * (one stored-vector scan per call — linear in the corpus, the cost
  * class the sidecar exists to remove from the arrival path). Builds a
  * deterministic synthetic IVF store per size, times
  * [[graft.ops.AnnIndex.assignmentDrift]] on a fixed 10k-vector
  * arrival with the sidecar present, then deletes the sidecar and
  * times the identical call on the fallback scan; both calls must
  * return the same row (checked), so the speedup is of two AGREEING
  * computations. One JSON line per size.
  *
  * The optional third arg picks the family: `ivf` (default) or `pq`
  * (a keepVectors plain-PQ store — same sidecar contract, the
  * family's own exact-integer residual error).
  *
  * Usage: runMain graft.DriftScale [sizes=1000000,4000000] [dim=16]
  *        [family=ivf|pq]
  */
object DriftScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val family = args.lift(2).getOrElse("ivf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{AnnIndex, StoreFiles}

    // deterministic pseudo-vectors: dim values in [-0.5, 0.5) hashed
    // from (id, d) — no RNG, rebuildable anywhere
    def vecsOf(ids: org.apache.spark.sql.DataFrame) =
      ids.select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          (pmod(xxhash64(col("id") * lit(dim) + d), lit(1000L))
            .cast("double") / lit(1000.0)) - lit(0.5)).as("embedding"))

    sizes.foreach { n =>
      val corpus = vecsOf(spark.range(0, n).toDF("id"))
      val path = java.nio.file.Files
        .createTempDirectory(s"driftscale_$n").toString
      if (family == "pq")
        AnnIndex.writePqIndex(corpus, col("vec_id"), col("embedding"),
          path, numSub = dim / 2, codebookSize = 16,
          keepVectors = true)
      else
        AnnIndex.writeIvfIndex(corpus, col("vec_id"), col("embedding"),
          path, nList = 16)
      val batch = vecsOf(spark.range(n, n + 10000).toDF("id"))
        .localCheckpoint()
      def monitorRow() = AnnIndex.assignmentDrift(spark, path, batch,
        col("vec_id"), col("embedding")).head()
      val t0 = System.nanoTime()
      val memo = monitorRow()
      val memoSec = (System.nanoTime() - t0) / 1e9
      StoreFiles.delete(spark, s"$path/errstate")
      val t1 = System.nanoTime()
      val scan = monitorRow()
      val scanSec = (System.nanoTime() - t1) / 1e9
      require(memo == scan,
        s"sidecar and fallback disagree: $memo vs $scan")
      println(s"""{"metric":"drift_scale","family":"$family",""" +
        s""""n_docs":$n,"dim":$dim,""" +
        s""""monitor_memo_sec":${f"$memoSec%.2f"},""" +
        s""""monitor_scan_sec":${f"$scanSec%.2f"},""" +
        s""""drift_ratio":${memo.getDouble(4)}}""")
      StoreFiles.delete(spark, path)
    }
    spark.stop()
  }
}
