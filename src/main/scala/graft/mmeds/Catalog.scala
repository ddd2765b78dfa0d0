package graft.mmeds

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage seam for the normalized snowflake. The reference's MySQL
  * MEMORY-engine tables (sql/tables.sql:35) become Parquet tables here;
  * an in-memory variant backs tests.
  */
trait Catalog {
  def table(name: String): Option[DataFrame]
  def append(name: String, df: DataFrame): Unit
  def overwrite(name: String, df: DataFrame): Unit
  def tableNames: Seq[String]

  /** Require a table, empty-safe: callers building views need a frame
    * even when nothing was ingested for a table yet. */
  def tableOrEmpty(spark: SparkSession, name: String,
      like: DataFrame): DataFrame =
    table(name).getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema))
}

/** Test/ephemeral catalog: plain map of DataFrames. */
class InMemoryCatalog extends Catalog {
  private val tables = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
  def table(name: String): Option[DataFrame] = tables.get(name)
  def append(name: String, df: DataFrame): Unit =
    tables(name) = tables.get(name).map(_.unionByName(df)).getOrElse(df)
  def overwrite(name: String, df: DataFrame): Unit = tables(name) = df
  def tableNames: Seq[String] = tables.keys.toSeq
}

/** Parquet warehouse catalog: one directory per table under `root`,
  * hive-partitioned by `user_id` wherever the table carries it (all
  * protected tables + junctions). The RLS predicate
  * `user_id ∈ {uid, public}` then resolves as PARTITION PRUNING — on a
  * 1000-executor cluster a user's session reads only its own partitions,
  * never scanning other tenants' data. At larger scale the same seam
  * registers metastore tables; the layout is identical. */
class ParquetCatalog(spark: SparkSession, root: String) extends Catalog {
  private def path(name: String) = s"$root/$name"
  private def exists(name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
  def table(name: String): Option[DataFrame] =
    if (exists(name)) Some(spark.read.parquet(path(name))) else None
  def append(name: String, df: DataFrame): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (df.columns.contains("user_id")) w.partitionBy("user_id") else w)
      .parquet(path(name))
  }
  def overwrite(name: String, df: DataFrame): Unit = {
    // self-referential overwrite needs a materialization barrier
    val tmp = path(name) + "__tmp"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (df.columns.contains("user_id")) w.partitionBy("user_id") else w)
      .parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path(name)), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path(name)))
  }
  def tableNames: Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }
}
