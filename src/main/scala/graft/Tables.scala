package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory. At cluster
  * scale these would be partitioned/ bucketed catalog tables; the loader is
  * the single seam where that swap happens.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcast-join these. */
  val dims: Set[String] = Set("region", "nation", "supplier", "part", "customer")

  /** Analyzed-plan cache: a scan's schema read + file listing happen once
    * per (session, dir, table) instead of once per query — DataFrames are
    * immutable so reuse is free, and a bench/verify run over ~80 queries
    * stops paying the same footer reads 80 times. Keyed on the session's
    * identity so a stopped session's entries are simply never hit again. */
  private val scanCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    scanCache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  /** The events table's `ts` lands as nanos-since-epoch longs (column
    * `ts`, LongType) regardless of how the parquet stores it:
    * TIMESTAMP(NANOS) files have no native Spark type and read as int64
    * via the nanosAsLong escape; TIMESTAMP(MICROS) files (the refreshed
    * testdata) read as timestamps and are converted here. The session
    * timezone is pinned to UTC RIGHT HERE (not only via build.sbt
    * javaOptions) so an NTZ wall-clock reads as the same instant from
    * any launcher JVM — without the pin, a session created outside the
    * sbt harness would silently shift every event by its host tz. All
    * event-time operators do exact integer-nanosecond math on this one
    * normalized column; DuckDB reads the same file as TIMESTAMP either
    * way, so the oracle SQL is unaffected. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame =
    scanCache.computeIfAbsent(
      (System.identityHashCode(spark), dir, "events#nanosAsLong"), _ => {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        val raw = spark.read.parquet(s"$dir/events.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => raw
          case _ => raw.withColumn("ts",
            expr("unix_micros(cast(ts as timestamp)) * 1000"))
        }
      })

  /** Register every table as a temp view so `spark.sql` works on them. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
