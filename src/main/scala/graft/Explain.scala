package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so the
  * pushdown/pruning/broadcast story can be inspected and kept honest.
  * Run: `sbt "runMain graft.Explain q02_revenue_filter ..."`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_revenue_filter", "q03_revenue_by_nation",
        "q04_flagship_multijoin", "qd01_text_stats")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .explain("formatted")
    }
    spark.stop()
  }
}
