package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-QUERY job breakdown — how many Spark jobs a declared
  * query launches, how long each takes, and how much wall time is spent
  * OUTSIDE any job (driver-side planning, codegen, collects, file
  * listing). The lifecycle fixtures (qe54/qe55/qe57/qe58, qd90/qd92,
  * qm15) run on tiny frames at sf0.1, so their cost is fixed overhead ×
  * job count plus driver gaps — this prints exactly that split, which
  * `bench` totals and the UI-less sandbox otherwise hide.
  *
  * Run: `sbt "runMain graft.JobProfile qe55_ivfpq_retrain_recall ..."`
  * (second run of each query is the reported one — same JIT-warm steady
  * state the bench's best-of-2 reports). */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, desc: String, start: Long, var end: Long = -1L)
    val jobs = mutable.ArrayBuffer.empty[Job]
    val byId = mutable.HashMap.empty[Int, Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          // the last stage's callsite names what the job computes
          // (collect at X / parquet at Y); keep them all for context —
          // and pull the first graft.* frame out of the long-form
          // callstack so AQE stage jobs attribute to an operator
          val d0 = e.stageInfos.map(_.name.takeWhile(_ != '\n'))
            .distinct.mkString(" | ")
          val g = e.stageInfos.flatMap(_.details.split('\n'))
            .find(l => l.contains("graft.") && !l.contains("JobProfile"))
            .map(_.trim).getOrElse("")
          val d = s"$d0 [$g]"
          val j = Job(e.jobId, d, e.time)
          jobs += j; byId(e.jobId) = j
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { byId.get(e.jobId).foreach(_.end = e.time) }
    })

    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    val names =
      if (args.nonEmpty) args.toSeq else Seq("qe55_ivfpq_retrain_recall")
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def cgSnap(): (Long, Long) =
      (cg.METRIC_COMPILATION_TIME.getCount,
        cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // run 1: cold (plans compile, stores build) — timed but not broken down
      val cg0 = cgSnap()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val cg1 = cgSnap()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
      jobs.synchronized { jobs.clear(); byId.clear() }
      // run 2: warm — the per-job breakdown
      val t1 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      val cg2 = cgSnap()
      org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
      val snap = jobs.synchronized { jobs.toIndexedSeq }
      val done = snap.filter(_.end > 0)
      val jobSum = done.map(j => (j.end - j.start) / 1e3).sum
      println(f"\n== $name: cold $cold%.2f s, warm $warm%.2f s, " +
        f"jobs ${snap.size}, in-job $jobSum%.2f s, " +
        f"driver-gap ${warm - jobSum}%.2f s")
      println(f"   codegen: cold ${cg1._1 - cg0._1} compiles " +
        f"(~${(cg1._2 - cg0._2) / 1e3}%.1f s histo-sum), " +
        f"warm ${cg2._1 - cg1._1} compiles " +
        f"(~${(cg2._2 - cg1._2) / 1e3}%.1f s histo-sum)")
      done.sortBy(j => -(j.end - j.start)).take(20).foreach { j =>
        println(f"   job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s  " +
          j.desc.take(160))
      }
      // aggregate by callsite: where do the many small jobs go?
      done.groupBy(_.desc.take(80)).toSeq
        .map { case (d, js) =>
          (d, js.size, js.map(j => (j.end - j.start) / 1e3).sum) }
        .sortBy(-_._3).take(15).foreach { case (d, n, s) =>
          println(f"   site n=$n%3d sum=$s%7.3f s  ${d.take(120)}")
        }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
