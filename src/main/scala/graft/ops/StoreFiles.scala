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
    * anything is deleted. */
  def replaceDir(spark: SparkSession, dir: String)(
      write: String => Unit): Unit = {
    val f = fs(spark, dir)
    val tmp = dir + ".compact-tmp"
    f.delete(new Path(tmp), true)
    write(tmp)
    f.delete(new Path(dir), true)
    f.rename(new Path(tmp), new Path(dir))
  }
}
