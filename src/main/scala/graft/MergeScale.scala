package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the incremental cluster-map MERGE's scale claim —
  * the number the oracle-bounded qd90 corpus cannot show: merge cost
  * versus full-rebuild cost as the stored pair graph grows. Builds a
  * chain-structured pair graph (groups of 8 docs linked in a path, so
  * min-label propagation needs real rounds — diameter 7 inside every
  * group), persists the cluster map over the first (1 − frac) of it,
  * then times (a) [[graft.ops.DedupIndex.mergeClusterMap]] folding in
  * the remaining edges plus deterministic BRIDGE edges that join
  * adjacent stored groups (the relabel-the-stored-component case, not
  * just appended tails), and (b) a full rebuild over the union — the
  * cost [[graft.ops.DedupIndex.refreshClusterMap]] pays. Labels are
  * checksum-compared (count, distinct clusters, Σ xxhash64(doc,
  * cluster)) so the speedup is of two AGREEING computations. One JSON
  * line per size.
  *
  * Usage: runMain graft.MergeScale [sizes=1000000,4000000]
  *        [arrivalFrac=0.01] [bridges=1000]
  */
object MergeScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    val frac = args.lift(1).map(_.toDouble).getOrElse(0.01)
    val nBridges = args.lift(2).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.DedupIndex

    sizes.foreach { n =>
      // chain edges inside groups of 8: (i, i+1) unless i ends a group
      val edges = spark.range(0, n - 1)
        .filter(col("id") % 8 =!= 7)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val cutoff = (n * (1 - frac)).toLong / 8 * 8
      val base = edges.filter(col("doc_a") < cutoff)
        .localCheckpoint()
      // arrival: the appended tail's own chains PLUS bridges that
      // join adjacent STORED groups — the merge must relabel stored
      // components, not only add new ones
      val bridges = spark.range(0, nBridges.toLong)
        .select((pmod(col("id") * 8009, lit(cutoff / 8 - 1)) * 8 + 7)
          .as("doc_a"))
        .select(col("doc_a"), (col("doc_a") + 1).as("doc_b"))
      val arrival = edges.filter(col("doc_a") >= cutoff)
        .unionByName(bridges)
        .localCheckpoint()
      val mapPath = java.nio.file.Files
        .createTempDirectory(s"mergescale_$n").toString
      val t0 = System.nanoTime()
      DedupIndex.writeClusterMap(base, col("doc_a"), col("doc_b"),
        mapPath)
      val baseSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      DedupIndex.mergeClusterMap(spark, mapPath, arrival,
        col("doc_a"), col("doc_b"))
      val mergeSec = (System.nanoTime() - t1) / 1e9
      // per-arrival SEQUENCE cost — the relabel-patch claim: each
      // successive merge must cost arrival-sized work, corpus-flat,
      // because the label table is no longer rewritten per arrival
      // (the log materializes once, at the timed compact below)
      val seqSecs = (0 until 4).map { i =>
        val chunk = spark.range(0, nBridges.toLong)
          .select((pmod(col("id") * (8017 + i * 16), lit(cutoff / 8 - 1))
            * 8 + 7).as("doc_a"))
          .select(col("doc_a"), (col("doc_a") + 1).as("doc_b"))
          .localCheckpoint()
        val t = System.nanoTime()
        DedupIndex.mergeClusterMap(spark, mapPath, chunk,
          col("doc_a"), col("doc_b"))
        (System.nanoTime() - t) / 1e9
      }
      val tc = System.nanoTime()
      DedupIndex.compactClusterMap(spark, mapPath)
      val compactSec = (System.nanoTime() - tc) / 1e9
      println(s"""{"metric":"merge_seq","n_docs":$n,""" +
        s""""arrival_secs":[${seqSecs.map(s => f"$s%.2f").mkString(",")}],""" +
        s""""compact_sec":${f"$compactSec%.2f"}}""")
      // fold the sequence's bridge edges into the rebuild comparison
      // set so the checksum equality still compares the same graph
      val seqBridges = (0 until 4).map { i =>
        spark.range(0, nBridges.toLong)
          .select((pmod(col("id") * (8017 + i * 16), lit(cutoff / 8 - 1))
            * 8 + 7).as("doc_a"))
          .select(col("doc_a"), (col("doc_a") + 1).as("doc_b"))
      }.reduce(_ unionByName _)
      val rebuildPath = java.nio.file.Files
        .createTempDirectory(s"mergescale_rb_$n").toString
      val t2 = System.nanoTime()
      DedupIndex.writeClusterMap(
        base.unionByName(arrival).unionByName(seqBridges),
        col("doc_a"), col("doc_b"), rebuildPath)
      val rebuildSec = (System.nanoTime() - t2) / 1e9
      def sig(path: String): (Long, Long, Long) = {
        val r = DedupIndex.readClusterMap(spark, path)
          .agg(count(lit(1)), countDistinct(col("cluster")),
            coalesce(bit_xor(xxhash64(col("doc_id"), col("cluster"))),
              lit(0L)))
          .head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (merged, rebuilt) = (sig(mapPath), sig(rebuildPath))
      require(merged == rebuilt,
        s"merge and rebuild disagree: $merged vs $rebuilt")
      println(s"""{"metric":"merge_scale","n_docs":$n,""" +
        s""""base_sec":${f"$baseSec%.2f"},""" +
        s""""merge_sec":${f"$mergeSec%.2f"},""" +
        s""""rebuild_sec":${f"$rebuildSec%.2f"},""" +
        s""""labels":${merged._1},"clusters":${merged._2}}""")
      graft.ops.StoreFiles.delete(spark, mapPath)
      graft.ops.StoreFiles.delete(spark, rebuildPath)
    }
    spark.stop()
  }
}
