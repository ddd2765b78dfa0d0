package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: mirrors the driver's t1 check — `entry()` must return >0
  * rows on sf0.001. Run: `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    assert(n > 0, "entry() returned 0 rows")
    spark.stop()
  }
}
