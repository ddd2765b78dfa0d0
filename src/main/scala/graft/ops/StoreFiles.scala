package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing shared by the persisted stores' compaction and
  * tombstone lifecycle ([[SketchStore]], [[LexIndex]], [[DedupIndex]]).
  *
  * Compaction uses rewrite-then-rename replacement: the folded row-set
  * is written to a temp sibling while the live directory keeps serving
  * reads, then the swap is delete + rename — two metadata operations,
  * not a long rewrite window. This is the classic log-structured
  * parquet-store discipline, not a transaction log: writers must be
  * quiesced during the swap (the compaction contract every store
  * documents), and a reader racing the two metadata ops can observe a
  * missing directory and should retry. At 100 TB the stores this
  * maintains are sketch/posting/fingerprint tables — orders of
  * magnitude smaller than the corpus — so the rewrite is cheap
  * relative to what merged reads save once per-batch partials stop
  * accumulating. */
private[graft] object StoreFiles {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir))

  def delete(spark: SparkSession, dir: String): Unit =
    fs(spark, dir).delete(new Path(dir), true)

  /** Replace `dir` with whatever `write` produces at a temp sibling.
    * `write` runs while the old directory still exists, so folds that
    * READ the old rows to produce the new ones materialize before
    * anything is deleted. Hadoop's delete/rename report failure by
    * RETURN VALUE, not exception — both are checked, because a rename
    * that silently fails after the delete would leave the store gone
    * with the caller none the wiser (the one data-losing outcome a
    * compaction must never have; the `.compact-tmp` sibling still
    * holds the folded rows if the require trips). */
  def replaceDir(spark: SparkSession, dir: String)(
      write: String => Unit): Unit = {
    val f = fs(spark, dir)
    val tmp = dir + ".compact-tmp"
    f.delete(new Path(tmp), true)
    write(tmp)
    require(!f.exists(new Path(dir)) || f.delete(new Path(dir), true),
      s"delete of live store dir $dir failed")
    require(f.rename(new Path(tmp), new Path(dir)),
      s"rename $tmp -> $dir failed; folded rows remain at $tmp")
  }

  /** Physical stats of one sub-store directory. `nBatches` counts
    * DISTINCT `batch_id=` partition directories holding data files
    * (0 for a plain layout); `nFiles` counts data files. */
  case class SubStoreStats(subStore: String, nFiles: Long,
      nBatches: Long)

  /** Per-sub-store physical introspection of a persisted store (sketch
    * store, ANN index, lexical index — anything laid out as
    * `<path>/<sub>/...parquet`): file and batch-partition counts from a
    * pure metadata LISTING (no data read — cheap enough to run per
    * micro-batch). This is what mechanizes the compaction trigger:
    * appends and batch puts are deliberately blind, so the number of
    * partials/batches a read must merge grows until someone compacts —
    * run the store's compact when `nBatches` (or files-per-sub) exceeds
    * a few dozen ([[needsBatchCompaction]] is that policy as a
    * predicate). */
  def storeStats(spark: SparkSession, path: String): Seq[SubStoreStats] = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return Nil
    f.listStatus(root).filter(_.isDirectory).toSeq.map { sub =>
      var nFiles = 0L
      val batches = scala.collection.mutable.Set.empty[String]
      val it = f.listFiles(sub.getPath, true)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
          nFiles += 1
          var p = st.getPath.getParent
          while (p != null && p.getName.nonEmpty &&
              p.toString != sub.getPath.toString) {
            if (p.getName.startsWith("batch_id=")) batches += p.getName
            p = p.getParent
          }
        }
      }
      SubStoreStats(sub.getPath.getName, nFiles, batches.size.toLong)
    }.sortBy(s => s.subStore)
  }

  /** The documented threshold policy as a predicate: true when any
    * sub-store holds more than `maxBatches` live batch partitions.
    * The streaming sinks call this per micro-batch (listing-only cost)
    * and fold committed history when it trips — the introspection-
    * driven alternative to a blind every-N-batches cadence (which
    * drifts from reality after checkpoint resets or manual folds). */
  def needsBatchCompaction(spark: SparkSession, path: String,
      maxBatches: Int): Boolean =
    storeStats(spark, path).exists(_.nBatches > maxBatches)
}
