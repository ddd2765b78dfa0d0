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
  import org.apache.hadoop.fs.Path
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.types.{DataType, StructType}

  private def path(name: String) = s"$root/$name"
  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def exists(name: String): Boolean =
    fs(path(name)).exists(new Path(path(name)))

  /** Hive partition folders re-enter the read schema with an INFERRED type
    * (bigint user_id comes back int) and at the END of the column list —
    * so the written schema is persisted next to the data (underscore
    * files are invisible to the parquet scan, like _SUCCESS) and reads
    * are cast/reordered back to it. Round-tripping a table through the
    * warehouse is then schema-identical to the frame that was written:
    * typed Dataset reads and strict unions keep working. */
  private def schemaFile(name: String) = new Path(path(name), "_graft_schema.json")

  private def saveSchema(name: String, df: DataFrame): Unit = {
    val out = fs(path(name)).create(schemaFile(name), true)
    try out.write(df.schema.json.getBytes("UTF-8")) finally out.close()
  }

  private def savedSchema(name: String): Option[StructType] = {
    val f = schemaFile(name)
    val filesystem = fs(path(name))
    if (!filesystem.exists(f)) None
    else {
      val in = filesystem.open(f)
      try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        Some(DataType.fromJson(txt).asInstanceOf[StructType])
      } finally in.close()
    }
  }

  /** Read back with `mergeSchema` so files written before a schema
    * evolution (an append that added columns) still load — the scan's
    * schema is the union of all file footers. The saved schema (the
    * LAST writer's frame) then drives the projection: its columns are
    * cast back to their written types, and any of them missing from
    * older files surface as null via the merged scan. A column that
    * only ever existed in older files is dropped — last-writer-wins is
    * the catalog's schema contract. */
  def table(name: String): Option[DataFrame] =
    if (!exists(name)) None
    else {
      val raw = spark.read.option("mergeSchema", "true").parquet(path(name))
      Some(savedSchema(name) match {
        case Some(s) =>
          val present = raw.columns.toSet
          raw.select(s.fields.toIndexedSeq.map { f =>
            if (present.contains(f.name))
              col(f.name).cast(f.dataType).as(f.name)
            else lit(null).cast(f.dataType).as(f.name)
          }: _*)
        case _ => raw
      })
    }

  def append(name: String, df: DataFrame): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (df.columns.contains("user_id")) w.partitionBy("user_id") else w)
      .parquet(path(name))
    saveSchema(name, df)
  }

  def overwrite(name: String, df: DataFrame): Unit = {
    // self-referential overwrite needs a materialization barrier
    val tmp = path(name) + "__tmp"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (df.columns.contains("user_id")) w.partitionBy("user_id") else w)
      .parquet(tmp)
    val filesystem = fs(root)
    filesystem.delete(new Path(path(name)), true)
    filesystem.rename(new Path(tmp), new Path(path(name)))
    saveSchema(name, df)
  }

  def tableNames: Seq[String] = {
    val p = new Path(root)
    val filesystem = fs(root)
    if (!filesystem.exists(p)) Seq.empty
    else filesystem.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_.endsWith("__tmp")).toSeq
  }
}
