package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format of LLM training-data
  * pipelines (one JSON object per line, usually gzipped).
  *
  * The reader REQUIRES a schema: Spark's JSON schema inference is a full
  * extra pass over the data, which at 100 TB doubles the scan cost and
  * can silently widen types on dirty corpora. Pinning the schema makes
  * the read one pass and the types a contract. Corrupt lines land in
  * `_corrupt_record` (PERMISSIVE) instead of failing the job — a web
  * crawl always has a few. Note Spark's SPARK-21610 restriction: a
  * query may not reference ONLY the corrupt column on the raw scan —
  * project data columns alongside it (or persist the parsed frame)
  * when auditing rejects.
  */
object JsonLines {

  val corruptColumn = "_corrupt_record"

  /** Read JSONL under `path` with the pinned `schema` (plus the corrupt
    * -record column). `.gz`/`.zst` decompress transparently via the text
    * source codecs. */
  def read(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(corruptColumn)) schema
      else schema.add(corruptColumn, "string", nullable = true)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptColumn)
      .json(path)
  }

  /** Write as gzipped JSONL (one object per line, one file per
    * partition — pair with [[graft.ops.Sharding.layout]] for a
    * deterministic shard-per-file layout). */
  def write(df: DataFrame, path: String,
      compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
