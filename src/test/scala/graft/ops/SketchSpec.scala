package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Specs for the portable sketches (HLL, count-min) and the BM25 /
  * hybrid-RRF retrieval family — accuracy properties the DuckDB oracle
  * can't express (the oracle pins exact output; these pin the sketch
  * ERROR GUARANTEES against exact recomputation). */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def tokens = {
    val d = Tables.load(spark, sf, "documents")
    d.select(col("source"),
      explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
  }

  test("HLL estimate within 3 standard errors of exact per-group distinct") {
    val est = Sketches.hllDistinct(tokens, col("source"), col("w"))
      .select(col("grp"), col("est_distinct"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = tokens.groupBy("source")
      .agg(countDistinct("w").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    // 1.04/sqrt(256) ≈ 6.5% standard error; allow 3σ ≈ 20%.
    exact.foreach { case (g, n) =>
      val e = est(g)
      assert(math.abs(e - n) <= math.max(3.0, 0.20 * n),
        s"group $g: est $e vs exact $n")
    }
  }

  test("HLL never reports more present registers than m and zero+present=m") {
    val rows = Sketches.hllDistinct(tokens, col("source"), col("w"))
      .collect()
    rows.foreach { r =>
      val present = r.getAs[Long]("present_registers")
      val zeros = r.getAs[Long]("zero_registers")
      assert(present >= 1 && present <= Sketches.HllM)
      assert(present + zeros == Sketches.HllM)
    }
  }

  test("CMS estimates are exact-or-over, never under") {
    val words = tokens.select("w")
    val sketch = Sketches.cmsSketch(words, col("w"), width = 1024)
    val probes = words.distinct().limit(200)
    val est = Sketches.cmsEstimate(sketch, probes, col("w"), width = 1024)
    val exact = words.groupBy(col("w").as("term"))
      .agg(count(lit(1)).as("n"))
    val joined = est.join(exact, Seq("term")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n"),
        s"term ${r.getAs[String]("term")} underestimated")
    }
  }

  test("CMS partial sketches sum-merge to the direct whole-corpus sketch") {
    val d = graft.Tables.load(spark, sf, "documents")
    def words(f: org.apache.spark.sql.DataFrame) =
      f.select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
    val partials = Seq(0, 1).map(p =>
      Sketches.cmsSketch(words(d.filter(col("doc_id") % 2 === p)),
        col("w"), 1024))
    val merged = Sketches.cmsMergeSketches(partials.reduce(_.unionByName(_)))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val direct = Sketches.cmsSketch(words(d), col("w"), 1024)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged == direct)
    assert(direct.nonEmpty)
  }

  test("CMS sketch is bounded by depth x width rows") {
    val sketch = Sketches.cmsSketch(tokens.select("w"), col("w"), 1024)
    assert(sketch.count() <= 4L * 1024)
  }

  test("BM25 ranks a term-dense doc above a term-free doc, k1/b defaults") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark merge window pipeline"),
      (2L, "unrelated words entirely different content"),
      (3L, "spark appears once here among many many many other tokens")
    ).toDF("doc_id", "text")
    val top = graft.ops.TextAnalysis.bm25TopK(docs, col("doc_id"),
      col("text"), Seq("spark", "merge", "window"), k = 3).collect()
    assert(top.head.getAs[Long]("doc_id") == 1L)
    // the no-hit doc scores exactly 0
    val zero = top.find(_.getAs[Long]("doc_id") == 2L).get
    assert(zero.getAs[Double]("score") == 0.0)
  }

  test("BM25 never shuffles the corpus: plan has no corpus-sized exchange") {
    val d = Tables.load(spark, sf, "documents")
    val plan = graft.ops.TextAnalysis.bm25TopK(d, col("doc_id"), col("text"),
      Seq("spark", "merge"), k = 10)
      .queryExecution.executedPlan.toString
    // top-k must be a TakeOrdered, not a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("native HLL aggregate is byte-identical to the composed register path") {
    val slow = Sketches.hllDistinct(tokens, col("source"), col("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val fast = Sketches.hllDistinctFast(tokens, col("source"), col("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(fast.toSeq == slow.toSeq)
  }

  test("HLL partial sketches max-merge to the direct whole-corpus result") {
    val d = graft.Tables.load(spark, sf, "documents")
    val byParity = d.select(col("source"), (col("doc_id") % 2).as("p"),
      explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
    val partials = byParity.groupBy(col("source"), col("p"))
      .agg(graft.functions.HllRegistersAgg.hllRegisters(col("w"))
        .as("regs"))
    val merged = Sketches.hllMergeRegisters(partials, col("source"),
        col("regs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val direct = Sketches.hllDistinctFast(
        byParity.select(col("source"), col("w")), col("source"), col("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(merged.toSeq == direct.toSeq)
  }

  test("HLL overlap: union <= a+b, inter tracks the exact intersection") {
    val d = graft.Tables.load(spark, sf, "documents")
    val nibble = conv(
      substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
      .cast("int")
    def half(p: Int) = d.filter(if (p == 0) nibble < 8 else nibble >= 8)
      .select(col("source"),
        explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
    def sketch(p: Int) = half(p).groupBy(col("source").as("grp"))
      .agg(graft.functions.HllRegistersAgg.hllRegisters(col("w"))
        .as("regs"))
    val ov = Sketches.hllOverlap(sketch(0), sketch(1)).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(ov.nonEmpty)
    // exact per-source intersection of the two vocabularies
    val exactInter = half(0).distinct()
      .join(half(1).distinct(), Seq("source", "w"))
      .groupBy("source").agg(countDistinct("w").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ov.foreach { case (src, (a, b, u, i)) =>
      assert(u <= a + b + 1e-6, s"$src union exceeds a+b")
      assert(math.abs(i - (a + b - u)) < 1e-6)
      val exact = exactInter.getOrElse(src, 0L).toDouble
      // inclusion-exclusion compounds three 6.5%-se estimates
      assert(math.abs(i - exact) <= math.max(15.0, 0.35 * exact),
        s"$src inter est $i vs exact $exact")
    }
  }

  test("streaming windowed HLL distinct matches the batch twin exactly") {
    val events = graft.Tables.loadEvents(spark, sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val dir = java.nio.file.Files.createTempDirectory("hllstream").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = graft.streaming.StreamingIngest.watchParquetDir(
      spark, s"$dir/in", events.schema)
    graft.streaming.StreamingIngest.drainToMemory(
      graft.streaming.StreamingIngest.windowedDistinct(
        stream, col("user_id").cast("string")),
      "hll_out", outputMode = "complete")
    val streamed = spark.table("hll_out")
      .select(col("window.start").as("ws"), col("event_type"),
        col("est_distinct"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.HllRegistersAgg
        .hllRegisters(col("user_id").cast("string")).as("regs"))
      .select(col("window.start").as("ws"), col("event_type"),
        Sketches.hllEstimateFromRegisters(col("regs")).as("est"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming windowed heavy hitters keep the n/(m+1) guarantee") {
    val m = 4
    val events = graft.Tables.loadEvents(spark, sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val dir = java.nio.file.Files.createTempDirectory("hhstream").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = graft.streaming.StreamingIngest.watchParquetDir(
      spark, s"$dir/in", events.schema)
    graft.streaming.StreamingIngest.drainToMemory(
      graft.streaming.StreamingIngest.windowedHeavyHitters(
        stream, col("event_type"), m),
      "hh_out", outputMode = "complete")
    val streamed = spark.table("hh_out")
      .select(col("window.start").as("ws"), col("hh"), col("n"))
      .collect()
      .map { r =>
        r.getTimestamp(0) ->
          (r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)).toSet,
            r.getLong(2))
      }.toMap
    assert(streamed.nonEmpty)
    // exact per-window counts: anything above n/(m+1) MUST be present
    val exact = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("ws"), col("event_type"), col("c"))
      .collect()
      .groupBy(_.getTimestamp(0))
    exact.foreach { case (ws, rows) =>
      val (candidates, n) = streamed(ws)
      rows.filter(r => r.getLong(2) * (m + 1) > n).foreach { r =>
        assert(candidates.contains(r.getString(1)),
          s"window $ws missing guaranteed hitter ${r.getString(1)}")
      }
    }
  }

  test("hybrid RRF fuses both lists: top result present in lex or vec list") {
    val fused = graft.queries.PipelineQueries.hybridRrf(spark, sf).collect()
    assert(fused.length == 10)
    // every fused row must carry at least one source rank
    fused.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("rank_lex")) ||
        !r.isNullAt(r.fieldIndex("rank_vec")))
    }
    // ranks are 1..10 dense
    assert(fused.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
  }

  test("HLL composed and native paths agree on all-null groups") {
    import spark.implicits._
    val df = Seq(("g1", Option.empty[String]), ("g2", Some("x")),
      ("g1", None)).toDF("g", "v")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("grp").collect().map(_.toSeq).toSeq
    val composed = rows(Sketches.hllDistinct(df, col("g"), col("v")))
    val native = rows(Sketches.hllDistinctFast(df, col("g"), col("v")))
    assert(composed == native)
    // the all-null group g1 still gets a row: empty sketch, estimate 0
    assert(composed.map(_.head) == Seq("g1", "g2"))
    assert(composed.head(3) == 0.0)
  }

  private def docMeasures = {
    val d = Tables.load(spark, sf, "documents")
    d.select(col("source"),
      size(graft.ops.TextAnalysis.tokens(col("text"))).cast("long")
        .as("m"))
  }

  test("histogram quantile estimates bracket the exact quantile: v <= est < 2v") {
    val sketch = Sketches.histSketch(docMeasures, col("source"), col("m"))
    val qs = Seq(0.5, 0.9, 0.99)
    val est = Sketches.histQuantiles(sketch, qs).collect()
      .map(r => r.getString(0) ->
        qs.map(q => r.getAs[Long](s"p${(q * 100).toInt}"))).toMap
    // exact q-quantile with the SAME rank definition: smallest value
    // whose cumulative count reaches ceil(q*n)
    val vals = docMeasures.collect()
      .groupBy(_.getString(0)).map { case (g, rows) =>
        g -> rows.map(_.getLong(1)).sorted.toSeq }
    assert(est.keySet == vals.keySet)
    vals.foreach { case (g, sorted) =>
      qs.zipWithIndex.foreach { case (q, i) =>
        // 1-based rank via the SAME integer arithmetic as the sketch
        // (ceil(n·q) with q quantized to 4 decimals — no doubles)
        val qq = math.round(q * 10000)
        val rank = ((sorted.size * qq + 9999) / 10000).toInt
        val v = sorted(rank - 1)
        val e = est(g)(i)
        assert(v <= e && (v == 0 || e < 2 * v),
          s"group $g q$q: exact $v est $e")
      }
    }
  }

  test("histogram sketch is tiny, sum-merges exactly, and the store round-trips") {
    val direct = Sketches.histSketch(docMeasures, col("source"), col("m"))
    // bounded: <= 64 buckets per group
    val perGroup = direct.groupBy("grp").count().collect()
    perGroup.foreach(r => assert(r.getLong(1) <= 64))
    // per-half sum-merge == direct (the qd78 claim); split by ROW on a
    // content hash so both halves hit every group
    val mh = conv(substring(md5(col("m").cast("string")), 1, 1), 16, 10)
      .cast("int")
    val lo = Sketches.histSketch(docMeasures.filter(mh < 8),
      col("source"), col("m"))
    val hi = Sketches.histSketch(docMeasures.filter(mh >= 8),
      col("source"), col("m"))
    val merged = Sketches.histMergeSketches(lo.unionByName(hi))
    assert(direct.as("a").join(merged.as("b"),
      col("a.grp") === col("b.grp") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.cnt") =!= col("b.cnt")).count() == 0)
    assert(direct.count() == merged.count())
    // persisted store write+append+read == direct (the qd79 claim)
    val path =
      java.nio.file.Files.createTempDirectory("graft_histspec").toString
    SketchStore.writeHist(docMeasures.filter(mh < 8), col("source"),
      col("m"), path)
    SketchStore.appendHist(docMeasures.filter(mh >= 8), col("source"),
      col("m"), path)
    val stored = SketchStore.readHist(spark, path)
    assert(direct.as("a").join(stored.as("b"),
      col("a.grp") === col("b.grp") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.cnt") =!= col("b.cnt")).count() == 0)
    assert(stored.count() == direct.count())
  }

  test("streaming windowed quantiles match the batch histogram twin exactly") {
    val events = graft.Tables.loadEvents(spark, sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val dir = java.nio.file.Files.createTempDirectory("histstream").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = graft.streaming.StreamingIngest.watchParquetDir(
      spark, s"$dir/in", events.schema)
    graft.streaming.StreamingIngest.drainToMemory(
      graft.streaming.StreamingIngest.windowedQuantiles(
        stream, col("value").cast("long")),
      "hist_out", outputMode = "complete")
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1))
    val streamed = spark.table("hist_out")
      .select(col("window.start"), col("event_type"), col("n_rows"),
        col("p50"), col("p90"), col("p99"))
      .collect()
      .map(r => key(r) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // batch twin: the sketch + window-function quantile path over the
    // same (hour, type) grouping
    val batch = Sketches.histQuantiles(
      Sketches.histSketch(
        events.select(
          struct(window(col("ts"), "1 hour").getField("start").as("ws"),
            col("event_type").as("et")).as("g"),
          col("value").cast("long").as("m")),
        col("g"), col("m")),
      Seq(0.5, 0.9, 0.99))
      .collect()
      .map { r =>
        val g = r.getStruct(0)
        (g.getTimestamp(0), g.getString(1)) ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("p50"),
            r.getAs[Long]("p90"), r.getAs[Long]("p99"))
      }.toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("histBucket: zero, one, and power-of-two boundaries") {
    import spark.implicits._
    val df = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L)
      .toDF("v").select(col("v"), Sketches.histBucket(col("v")).as("b"))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // bucket b covers [2^(b-1), 2^b - 1]
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3,
      7L -> 3, 8L -> 4, 1023L -> 10, 1024L -> 11))
  }
}
