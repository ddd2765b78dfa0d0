package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed managed tables — pay the shuffle ONCE at write time, then
  * every equi-join or aggregation on the bucket key runs exchange-free
  * forever after.
  *
  * At 100 TB the fact-to-fact join (documents ⋈ embeddings, events ⋈
  * sessions) is the shuffle that dominates a pipeline; bucketing both
  * sides on the join key with the same bucket count lets Spark plan a
  * SortMergeJoin with NO Exchange on either side (each task reads the
  * matching bucket files directly). `sortBy` additionally pre-sorts
  * within buckets so the merge needs no re-sort for single-file buckets.
  * Bucket pruning also serves point lookups on the key.
  *
  * Trade-offs, documented for operators: bucket count is fixed at write
  * time (pick for the target cluster's task size — e.g. total size /
  * 256 MB); both join sides must agree on it; and bucketed tables are
  * metastore tables (`saveAsTable`), not bare parquet paths.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by
    * `key` into `buckets` buckets. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
