package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.streaming.StreamingIngest

/** Specs for the streaming + multimodal plumbing and spot-checks of the
  * pipeline operators not covered by the DuckDB oracle. */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("streaming windowed rollup matches the batch rollup") {
    // batch twin
    val batch = graft.ops.Events.hourlyRollup(Tables.loadEvents(spark, sf))
    val batchTotal = batch.agg(sum("n_events")).head().getLong(0)

    // stream the same file through the watcher semantics
    val events = Tables.loadEvents(spark, sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val dir = java.nio.file.Files.createTempDirectory("stream").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = StreamingIngest.watchParquetDir(spark, s"$dir/in",
      events.schema)
    StreamingIngest.drainToMemory(
      StreamingIngest.windowedRollup(stream), "rollup_out",
      outputMode = "complete")
    val streamed = spark.table("rollup_out")
    assert(streamed.agg(sum("n_events")).head().getLong(0) == batchTotal)
    // same distinct (hour, type) buckets
    assert(streamed.count() == batch.count())
  }

  test("file watcher drains exactly once (AvailableNow)") {
    val dir = java.nio.file.Files.createTempDirectory("watch").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.limit(100).write.mode("overwrite").parquet(s"$dir/in")
    StreamingIngest.ingestTo(
      StreamingIngest.watchParquetDir(spark, s"$dir/in", docs.schema),
      s"$dir/out", s"$dir/ckpt").start().awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() == 100)
    // re-running with the same checkpoint ingests nothing new
    StreamingIngest.ingestTo(
      StreamingIngest.watchParquetDir(spark, s"$dir/in", docs.schema),
      s"$dir/out", s"$dir/ckpt").start().awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() == 100)
  }

  test("stream-stream interval join matches the batch twin") {
    val events = Tables.loadEvents(spark, sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val dir = java.nio.file.Files.createTempDirectory("ssjoin").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = StreamingIngest.watchParquetDir(spark, s"$dir/in",
      events.schema)
    val joined = StreamingIngest.attributeStream(
      stream.filter(col("event_type") === "purchase"),
      stream.filter(col("event_type") === "click"),
      horizonSeconds = 3600)
    StreamingIngest.drainToMemory(joined, "attr_out")
    val got = spark.table("attr_out").count()
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val batch = p.join(c,
      col("user_id") === col("c_user") && col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 3600 SECONDS")).count()
    assert(got == batch && got > 0)
  }

  test("stateful streaming sessionization closes sessions on gap") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingIngest.{SessionEvent, sessionizeStream}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = sessionizeStream(in.toDS(), gapSeconds = 1800)
    // NOTE: with ProcessingTimeTimeout the engine keeps scheduling
    // timeout-check batches, so processAllAvailable never settles —
    // throttle the trigger and poll the sink with a deadline instead.
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("200 milliseconds"))
      .start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis + 60000
      while (spark.table("sessions_out").count() < n &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
    }
    // one user: two events in one session, then an in-batch gap opens a
    // second session -> first must close within the same trigger
    in.addData(SessionEvent(1, 1, 0, 1.0), SessionEvent(1, 2, 100, 2.0),
      SessionEvent(1, 3, 10000, 4.0))
    awaitRows(1)
    val closed = spark.table("sessions_out").as[
      graft.streaming.StreamingIngest.SessionSummary].collect()
    assert(closed.length == 1)
    assert(closed.head.sessionStart == 0 && closed.head.sessionEnd == 100 &&
      closed.head.nEvents == 2 && closed.head.sessionValue == 3.0)
    // a later event for the same user extends the open session
    in.addData(SessionEvent(1, 4, 10100, 1.0))
    Thread.sleep(1500)
    assert(spark.table("sessions_out").count() == 1) // still open
    q.stop()
  }

  test("streaming dedup drops repeats across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("secs", "text")
      .withColumn("ts", timestamp_seconds(col("secs")))
    val out = StreamingIngest.dedupStream(docs, retention = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData((0L, "alpha doc"), (10L, "beta doc"), (20L, "alpha doc"))
    q.processAllAvailable()
    // in-batch duplicate dropped
    assert(spark.table("dedup_out").count() == 2)
    // cross-batch duplicate dropped, new doc kept
    in.addData((30L, "beta doc"), (40L, "gamma doc"))
    q.processAllAvailable()
    val texts = spark.table("dedup_out").select("text").as[String]
      .collect().sorted
    assert(texts.toSeq == Seq("alpha doc", "beta doc", "gamma doc"))
    q.stop()
  }

  test("multimodal decode plumbing: schema, determinism, partitioning") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
      .select(col("doc_id").as("media_id"))
    val media = Multimodal.withFakeMedia(docs, "media_id")
      .repartition(3)
    val decoded = Multimodal.decodeMeta(media, "media_id")
    assert(decoded.count() == 50)
    assert(decoded.schema.fieldNames.toSeq ==
      Seq("media_id", "format", "width", "height", "n_frames",
        "duration_ms"))
    // deterministic: same input -> same metadata
    val a = decoded.orderBy("media_id").collect()
    val b = Multimodal.decodeMeta(media, "media_id")
      .orderBy("media_id").collect()
    assert(a.sameElements(b))
    assert(decoded.rdd.getNumPartitions == 3) // partitioning preserved
  }

  test("multimodal frame sampling and fake embeddings") {
    val docs = Tables.load(spark, sf, "documents").limit(20)
      .select(col("doc_id").as("media_id"))
    val media = Multimodal.withFakeMedia(docs, "media_id")
    val decoded = Multimodal.decodeMeta(media, "media_id")
    val frames = Multimodal.frameSample(decoded, everyN = 10)
    val expected = decoded.select(
      sum(ceil(col("n_frames").cast("double") / 10.0))).head().getLong(0)
    assert(frames.count() == expected)

    val emb = media.select(col("media_id"),
      Multimodal.fakeEmbedding(col("content"), 16).as("v"))
    val row = emb.head()
    assert(row.getAs[scala.collection.Seq[Double]]("v").length == 16)

    // resize plan: fits the bounding box, preserves aspect, never zero
    val resized = Multimodal.resizePlan(decoded, maxW = 256, maxH = 256)
    assert(resized.filter(col("target_width") > 256 ||
      col("target_height") > 256 || col("target_width") < 1 ||
      col("target_height") < 1).count() == 0)
    // no upscaling: media already within bounds keep their dims
    assert(resized.filter(col("width") <= 256 && col("height") <= 256 &&
      (col("target_width") =!= col("width") ||
        col("target_height") =!= col("height"))).count() == 0)
  }

  test("multimodal REAL image decode: true PNG/JPEG dimensions via " +
      "javax.imageio, stub fallback for non-image bytes") {
    import spark.implicits._
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val rows = Seq(
      (1L, imageBytes("png", 37, 21)),
      (2L, imageBytes("jpg", 64, 48)),
      (3L, Array.fill[Byte](32)(7))) // not an image -> stub fallback
    val media = rows.toDF("media_id", "content").repartition(2)
    val decoded = Multimodal.decodeMeta(media, "media_id")
      .orderBy("media_id").collect()
    assert(decoded(0).getAs[String]("format") == "png")
    assert(decoded(0).getAs[Int]("width") == 37)
    assert(decoded(0).getAs[Int]("height") == 21)
    assert(decoded(1).getAs[String]("format").startsWith("jp")) // jpeg
    assert(decoded(1).getAs[Int]("width") == 64)
    assert(decoded(1).getAs[Int]("height") == 48)
    // the stub path is unchanged for unrecognized payloads
    val stub = Multimodal.stubDecoder(rows(2)._2)
    assert(decoded(2).getAs[String]("format") == stub.format)
    assert(decoded(2).getAs[Int]("width") == stub.width)
  }

  test("audio WAV headers decode for real via javax.sound.sampled") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wavBytes(sampleRate: Float, channels: Int, bits: Int,
        frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate, bits, channels, true, false)
      val data = new Array[Byte](frames * fmt.getFrameSize)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, wavBytes(8000f, 2, 16, 4000)),
      (2L, wavBytes(16000f, 1, 8, 1600)))
    val media = rows.toDF("media_id", "content").repartition(2)
    val decoded = Multimodal.decodeMeta(media, "media_id")
      .orderBy("media_id").collect()
    assert(decoded(0).getAs[String]("format") == "wav")
    assert(decoded(0).getAs[Int]("width") == 2)     // channels
    assert(decoded(0).getAs[Int]("height") == 16)   // sample bits
    assert(decoded(0).getAs[Int]("n_frames") == 4000)
    assert(decoded(0).getAs[Long]("duration_ms") == 500L) // 4000/8000 s
    assert(decoded(1).getAs[String]("format") == "wav")
    assert(decoded(1).getAs[Int]("width") == 1)
    assert(decoded(1).getAs[Long]("duration_ms") == 100L) // 1600/16000 s
  }

  test("minhash LSH candidates superset check on near-identical docs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base), (2L, base + " tail"), (3L, "completely different words"),
      (4L, base)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDup(docs, col("doc_id"), col("text"),
      threshold = 0.8).collect()
    // identical docs 1 and 4 must be found; doc 3 must pair with nobody
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 4L))
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("vec_dot: codegen expression matches interpreted HOF form; SQL-registered") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val native = df.select(
      graft.functions.VectorExpressions.vecDot(col("a"), col("b"))).head().getDouble(0)
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)).head().getDouble(0)
    assert(native == 32.0 && native == hof)
    // null propagation
    val n = df.select(graft.functions.VectorExpressions.vecDot(
      lit(null).cast("array<double>"), col("b"))).head()
    assert(n.isNullAt(0))
    // SQL registration via GraftExtensions descriptor
    spark.sessionState.functionRegistry.registerFunction(
      graft.GraftExtensions.vecDotDescriptor._1,
      graft.GraftExtensions.vecDotDescriptor._2,
      graft.GraftExtensions.vecDotDescriptor._3)
    val viaSql = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head().getDouble(0)
    assert(viaSql == 11.0)
  }

  test("l2_normalize: native expression is bit-equal to the declarative HOF form") {
    import spark.implicits._
    def declarative(vec: org.apache.spark.sql.Column) = {
      val d = transform(vec, x => x.cast("double"))
      val norm = sqrt(graft.functions.VectorExpressions.vecDot(d, d))
      transform(d, x => x / norm)
    }
    // float input (the parquet embedding type), incl. an empty array
    // (no element, no division — stays empty, no ANSI error)
    val f = Seq(
      (1L, Array(1.0f, -2.0f, 3.5f, 0.25f)),
      (3L, Array.empty[Float]),
      (4L, Array(7.25f))).toDF("id", "v")
    val both = f.select(col("id"),
      graft.functions.VectorExpressions.l2normalize(col("v")).as("nat"),
      declarative(col("v")).as("dec"))
    assert(both.schema("nat").dataType == both.schema("dec").dataType)
    both.collect().foreach { r =>
      val (nat, dec) = (r.getSeq[Any](1), r.getSeq[Any](2))
      assert(nat.length == dec.length, s"id=${r.getLong(0)}")
      nat.zip(dec).foreach { case (a, b) =>
        // bit-level equality, NaN included (0-vector rows divide by 0)
        assert(java.lang.Double.doubleToLongBits(a.asInstanceOf[Double]) ==
          java.lang.Double.doubleToLongBits(b.asInstanceOf[Double]),
          s"id=${r.getLong(0)}: $a != $b")
      }
    }
    // double input (re-normalize path) — same equality
    val d = Seq((1L, Array(0.125, -3.0, 9.75))).toDF("id", "v")
    val bd = d.select(
      graft.functions.VectorExpressions.l2normalize(col("v")).as("nat"),
      declarative(col("v")).as("dec")).head()
    assert(bd.getSeq[Double](0) == bd.getSeq[Double](1))
    // null vector -> null; null ELEMENT -> all-null array of input length
    // (the norm nulls, which nulls every transform output element)
    val n = Seq((1L, null: Array[java.lang.Double]),
      (2L, Array[java.lang.Double](1.0, null, 3.0)))
      .toDF("id", "v")
    val rows = n.select(col("id"),
      graft.functions.VectorExpressions.l2normalize(col("v")).as("nat"),
      declarative(col("v")).as("dec")).orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getSeq[Any](1) == Seq(null, null, null))
    assert(rows(1).getSeq[Any](1) == rows(1).getSeq[Any](2))
    // a zero vector raises the same ANSI divide-by-zero the
    // declarative transform form raises (Spark 4 default) — loud,
    // never a quiet NaN row
    val z = Seq((1L, Array(0.0, 0.0))).toDF("id", "v")
    val eNat = intercept[Exception] {
      z.select(graft.functions.VectorExpressions.l2normalize(col("v")))
        .collect()
    }
    val eDec = intercept[Exception] {
      z.select(declarative(col("v"))).collect()
    }
    assert(eNat.getMessage.contains("DIVIDE_BY_ZERO") &&
      eDec.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("signature aggregates and winnow are SQL-registered via extensions") {
    Seq(graft.GraftExtensions.minhashDescriptor,
      graft.GraftExtensions.simhashDescriptor,
      graft.GraftExtensions.winnowDescriptor)
      .foreach(d =>
        spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3))
    val docs = Tables.load(spark, sf, "documents").limit(50)
    docs.createOrReplaceTempView("docs_sqlreg")
    val viaSql = spark.sql(
      """WITH t AS (SELECT doc_id, explode(array_distinct(
           regexp_extract_all(lower(text), '\\S+', 0))) AS w
           FROM docs_sqlreg)
         SELECT doc_id, minhash_agg(w, 8) AS sig, simhash_agg(w) AS sh
         FROM t GROUP BY doc_id""")
    val api = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 8)
      .join(Dedup.simhashSignatures(docs, col("doc_id"), col("text")),
        "doc_id")
    assert(viaSql.as("a")
      .join(api.as("b"), col("a.doc_id") === col("b.doc_id"))
      .filter(col("a.sig") =!= col("b.sig") || col("a.sh") =!= col("b.sh"))
      .count() == 0)
    val winSql = spark.sql(
      """SELECT doc_id, shingle_winnow(
           regexp_extract_all(lower(text), '\\S+', 0), 5, 4) AS fps
         FROM docs_sqlreg""")
    val winApi = docs.select(col("doc_id"),
      graft.functions.ShingleWinnow.winnow(
        TextAnalysis.tokens(col("text")), 5, 4).as("fps"))
    assert(winSql.as("a")
      .join(winApi.as("b"), col("a.doc_id") === col("b.doc_id"))
      .filter(col("a.fps") =!= col("b.fps")).count() == 0)
    // round-6 registrations: the md5 winnow and the HLL register agg
    Seq(graft.GraftExtensions.winnowMd5Descriptor,
      graft.GraftExtensions.hllRegistersDescriptor)
      .foreach(d =>
        spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3))
    val wm5Sql = spark.sql(
      """SELECT doc_id, shingle_winnow_md5(
           regexp_extract_all(lower(text), '\\S+', 0), 4, 5) AS mks
         FROM docs_sqlreg""")
    val wm5Api = docs.select(col("doc_id"),
      graft.functions.ShingleWinnowMd5.winnow(
        TextAnalysis.tokens(col("text")), 4, 5).as("mks"))
    assert(wm5Sql.as("a")
      .join(wm5Api.as("b"), col("a.doc_id") === col("b.doc_id"))
      .filter(col("a.mks") =!= col("b.mks")).count() == 0)
    val hllSql = spark.sql(
      """WITH t AS (SELECT explode(regexp_extract_all(lower(text),
           '\\S+', 0)) AS w FROM docs_sqlreg)
         SELECT hll_registers_agg(w) AS regs FROM t""")
    val hllApi = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .agg(graft.functions.HllRegistersAgg.hllRegisters(col("w")).as("regs"))
    assert(hllSql.head().getSeq[Int](0) == hllApi.head().getSeq[Int](0))
  }

  test("persisted quantized index: self-match at rank 1, high recall") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val path = java.nio.file.Files.createTempDirectory("graft_q8").toString
    graft.ops.AnnIndex.writeQuantizedIndex(e, col("vec_id"),
      col("embedding"), path)
    val brute = Similarity.bruteForceTopK(e, col("vec_id"),
      col("embedding"), q, k = 10).collect().map(_.getLong(0)).toSet
    val got = graft.ops.AnnIndex.queryQuantizedIndex(spark, path, q,
      k = 10, rerank = 50).orderBy("rank").collect()
    assert(got.length == 10 && got.head.getLong(0) == 0L)
    assert(got.map(_.getLong(0)).toSet.intersect(brute).size >= 8)
    // empty query -> empty result, no throw
    assert(graft.ops.AnnIndex.queryQuantizedIndex(spark, path,
      q.limit(0), k = 10, rerank = 50).count() == 0)
  }

  test("quantized two-stage retrieval: self-match at rank 1, high recall") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val brute = Similarity.bruteForceTopK(e, col("vec_id"),
      col("embedding"), q, k = 10).collect().map(_.getLong(0)).toSet
    val got = Similarity.quantizedTopK(e, col("vec_id"), col("embedding"),
      q, k = 10, rerank = 50).orderBy("rank").collect()
    assert(got.length == 10 && got.head.getLong(0) == 0L)
    // exact rerank: any candidate surviving stage 1 scores exactly, so
    // overlap with brute force is high (8+/10 on this corpus)
    assert(got.map(_.getLong(0)).toSet.intersect(brute).size >= 8)
  }

  test("IVF with all cells probed equals brute-force top-k") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val brute = Similarity.bruteForceTopK(e, col("vec_id"),
      col("embedding"), q, k = 10).select("vec_id", "cos", "rank").collect()
    val ivf = Similarity.ivfTopK(e, col("vec_id"), col("embedding"), q,
      k = 10, nList = 8, nProbe = 8).select("vec_id", "cos", "rank").collect()
    assert(ivf.sameElements(brute))
    // partial probe still returns k rows and the self-match at rank 1
    val partial = Similarity.ivfTopK(e, col("vec_id"), col("embedding"), q,
      k = 10, nList = 8, nProbe = 2).collect()
    assert(partial.length == 10)
  }

  test("multi-query ANN joins agree with their single-query twins") {
    val e = Tables.load(spark, sf, "embeddings")
    val q3 = e.filter(col("vec_id") < 3)
    // ivfKnnJoin per-query slices == ivfTopK with the same parameters
    val multi = Similarity.ivfKnnJoin(e, col("vec_id"), col("embedding"),
        q3, col("vec_id"), col("embedding"), k = 5, nList = 8, nProbe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    for (qid <- 0L until 3L) {
      val q1 = e.filter(col("vec_id") === qid)
        .select(Similarity.l2Normalize(col("embedding")).as("qv"))
      val single = Similarity.ivfTopK(e, col("vec_id"), col("embedding"),
          q1, k = 5, nList = 8, nProbe = 3)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2).toLong))
      assert(multi(qid).sortBy(_._4).map(t => (t._2, t._3, t._4)).toSeq
        == single.toSeq, s"query $qid")
    }
    // quantizedKnnJoin per-query slice == quantizedTopK (same rerank)
    val multiQ = Similarity.quantizedKnnJoin(e, col("vec_id"),
        col("embedding"), q3, col("vec_id"), col("embedding"),
        k = 5, rerank = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    for (qid <- 0L until 3L) {
      val q1 = e.filter(col("vec_id") === qid)
        .select(Similarity.l2Normalize(col("embedding")).as("qv"))
      val single = Similarity.quantizedTopK(e, col("vec_id"),
          col("embedding"), q1, k = 5, rerank = 20)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2).toLong))
      assert(multiQ(qid).sortBy(_._4).map(t => (t._2, t._3, t._4)).toSeq
        == single.toSeq, s"quantized query $qid")
    }
    // hammingKnnJoin with an oversampled shortlist: top-k after rerank
    // is a (weak) superset-quality improvement — recall vs brute never
    // drops when the shortlist grows
    val truth = Similarity.knnJoin(e, col("vec_id"), col("embedding"),
        q3, col("vec_id"), col("embedding"), k = 5)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hamHits(shortlist: Int) = Similarity.hammingKnnJoin(e,
        col("vec_id"), col("embedding"), q3, col("vec_id"),
        col("embedding"), k = 5, shortlist)
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(truth).size
    assert(hamHits(100) >= hamHits(5))
  }

  test("trained persisted IVF index: stored probe equals in-memory trained join") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("ivf_tr").toString
    AnnIndex.writeIvfIndex(e, col("vec_id"), col("embedding"), dir,
      nList = 8, refineIters = 2)
    val stored = AnnIndex.ivfKnnJoinIndexed(spark, dir, q, col("vec_id"),
        col("embedding"), k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val cents = Similarity.ivfCentroidsKMeans(e, col("vec_id"),
      col("embedding"), nList = 8, iters = 2)
    val mem = Similarity.ivfKnnJoinWith(e, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), k = 5, cents, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(stored.toSeq == mem.toSeq)
    // the stored probe prunes to the probed cells at the scan
    val plan = AnnIndex.ivfKnnJoinIndexed(spark, dir, q, col("vec_id"),
        col("embedding"), k = 5, nProbe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[.*cell.*"),
      plan.take(3000))
  }

  test("winnowing fingerprints: identical docs share, short docs covered") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, base), (2L, base), (3L, "tiny doc"),
      (4L, "unrelated words entirely different content here today"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, col("doc_id"),
      col("text")).collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(fps(1L) == fps(2L)) // identical docs -> identical signature
    assert(fps(3L).size == 1) // shorter than k tokens -> one fingerprint
    assert((fps(1L) & fps(4L)).isEmpty) // disjoint docs don't collide
    // interpreted eval path (no codegen) agrees with the codegen path
    val toksLit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      base.toLowerCase.split("\\s+").toSeq,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    val interp = graft.functions.ShingleWinnow(toksLit, 5, 4)
      .eval(null).asInstanceOf[
        org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSet
    assert(interp == fps(1L))
  }

  test("simhash of identical docs is identical, hamming 0") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup(docs, col("doc_id"), col("text"),
      maxHamming = 0).collect()
    assert(pairs.length == 1 && pairs.head.getInt(2) == 0)
  }

  test("simhash pigeonhole banding finds EVERY pair within maxHamming") {
    import spark.implicits._
    // Word-substituted variants produce a spread of hamming distances with
    // flipped bits at arbitrary positions — including the top bits a
    // prefix-blocking scheme would rely on. Recall must be exactly 1.0:
    // the returned set equals the set computed from the raw signatures.
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    val alts = Seq("one", "two", "three", "four", "five", "six", "seven")
    val docs = (0 until 12).map { i =>
      val words = vocab.zipWithIndex.map { case (w, j) =>
        if (j < i % 5) alts((i + j) % alts.length) else w
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val maxH = 8
    val sigs = Dedup.simhashSignatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= maxH
    } yield (a, b)).toSet
    assert(expected.nonEmpty) // fixture sanity: something to find
    val got = Dedup.simhashNearDup(docs, col("doc_id"), col("text"),
      maxHamming = maxH).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("ngram jaccard df cap drops stopword-only pairs, keeps real dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the unique alpha beta gamma delta epsilon zeta"),
      (2L, "the unique alpha beta gamma delta epsilon eta"),
      (3L, "the red fish"),
      (4L, "the blue bird"),
      (5L, "the green tree")).toDF("doc_id", "text")
    // uncapped: docs 1/2 share 7 of 9 words -> jaccard 0.7777
    val uncapped = Dedup.ngramJaccardPairs(docs, col("doc_id"), lit(1),
      col("text"), threshold = 0.5).collect()
    assert(uncapped.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    // cap at df > 4 drops "the" (df 5): pair 1/2 survives (intersection
    // 6, denominator 8+8-6 = 10 -> 0.6), stopword-only pairs never join
    val capped = Dedup.ngramJaccardPairs(docs, col("doc_id"), lit(1),
      col("text"), threshold = 0.5, maxDocFreq = 4).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    assert(capped.head.getDouble(2) < uncapped.head.getDouble(2))
  }

  test("vec_dot nulls on length mismatch and null elements, not truncation") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0))).toDF("a", "b")
    // mismatched dims -> null (the HOF zip_with/aggregate form also nulls)
    assert(df.select(graft.functions.VectorExpressions.vecDot(
      col("a"), col("b"))).head().isNullAt(0))
    // null element -> null
    val withNull = df.select(
      array(lit(1.0), lit(null).cast("double")).as("a"),
      array(lit(2.0), lit(3.0)).as("b"))
    assert(withNull.select(graft.functions.VectorExpressions.vecDot(
      col("a"), col("b"))).head().isNullAt(0))
    // well-formed fast path unaffected
    assert(df.select(graft.functions.VectorExpressions.vecDot(
      array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))))
      .head().getDouble(0) == 11.0)
  }

  test("salted aggregation equals plain groupBy and is repartition-stable") {
    val ev = Tables.loadEvents(spark, sf)
    val cents = floor(col("value") * lit(100.0)).cast("long")
    def run(df: org.apache.spark.sql.DataFrame) =
      Skew.saltedCountSum(df, col("user_id"), cents,
        rowId = col("event_id"), buckets = 8).orderBy("k").collect()
    val a = run(ev)
    // deterministic salt -> identical result under any repartitioning
    // (a monotonically_increasing_id salt would shift bucket contents)
    assert(a.sameElements(run(ev.repartition(7))))
    val plain = ev.groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("n"), sum(cents).as("total_cents"))
      .orderBy("k").collect()
    assert(a.sameElements(plain))
  }

  test("ANN guards: empty query frame yields empty result, not a throw") {
    val e = Tables.load(spark, sf, "embeddings")
    val emptyQ = e.filter(col("vec_id") === -999)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    assert(Similarity.annTopK(e, col("vec_id"), col("embedding"), emptyQ,
      k = 5).count() == 0)
    assert(Similarity.ivfTopK(e, col("vec_id"), col("embedding"), emptyQ,
      k = 5, nList = 4, nProbe = 2).count() == 0)
    // single-centroid IVF exercises the greatest()-needs-2-args guard
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    assert(Similarity.ivfTopK(e, col("vec_id"), col("embedding"), q,
      k = 3, nList = 1, nProbe = 1).count() == 3)
  }

  test("multi-probe LSH: recall grows with probes; all-flips equals brute") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val planes = 4
    def ann(flips: Int) = Similarity.annTopK(e, col("vec_id"),
      col("embedding"), q, k = 5, numPlanes = planes, probeFlips = flips)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val p0 = ann(0); val p1 = ann(1); val pAll = ann(planes)
    // candidate sets are nested, so the k-th best cos never degrades
    assert(p0.length <= p1.length && p1.length <= pAll.length)
    if (p0.nonEmpty && p1.nonEmpty) assert(p1.head._2 >= p0.head._2)
    // probing every bucket == brute force, rank for rank
    val brute = Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
      q, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pAll.toSeq == brute.toSeq)
  }

  test("persisted ANN indexes: prune partitions, match in-memory results") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString

    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"),
      s"$dir/lsh", numPlanes = 4)
    // probing every bucket reproduces brute force exactly
    val brute = Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
      q, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val idxAll = AnnIndex.queryLshIndex(spark, s"$dir/lsh", q, k = 5,
      probeFlips = 4).collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getInt(2)))
    assert(idxAll.toSeq == brute.toSeq)
    // single-flip probe equals the in-memory multi-probe operator
    val mem = Similarity.annTopK(e, col("vec_id"), col("embedding"), q,
      k = 5, numPlanes = 4, probeFlips = 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val idx1 = AnnIndex.queryLshIndex(spark, s"$dir/lsh", q, k = 5,
      probeFlips = 1).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(idx1.toSeq == mem.toSeq)
    // the probe scan is partition-pruned, not a full read
    val idxFiles = new java.io.File(s"$dir/lsh/index").listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(idxFiles > 5) // enough buckets that pruning means something

    AnnIndex.writeIvfIndex(e, col("vec_id"), col("embedding"),
      s"$dir/ivf", nList = 8)
    val memIvf = Similarity.ivfTopK(e, col("vec_id"), col("embedding"), q,
      k = 5, nList = 8, nProbe = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val idxIvf = AnnIndex.queryIvfIndex(spark, s"$dir/ivf", q, k = 5,
      nProbe = 2).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(idxIvf.toSeq == memIvf.toSeq)
  }

  test("repetition stats: dup/top/symbol ratios on known docs") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, ""), (3L, "#|#|"),
      (4L, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 2)
    assert(r1.getDouble(3) == 0.5)    // dup_ratio: 1 - 2/4
    assert(r1.getDouble(4) == 0.75)   // top_share: 'a' 3 of 4
    val r2 = got(1)                   // empty doc -> all zeros
    assert(r2.getLong(1) == 0 && r2.getDouble(3) == 0.0 &&
      r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.0)
    assert(got(2).getDouble(5) == 1.0) // all-symbol doc
    assert(got(3).getDouble(3) == 0.0) // all-distinct doc
  }

  test("LSH-blocked embedding near-dup: exact precision, finds identicals") {
    val e = Tables.load(spark, sf, "embeddings")
    // duplicate vec_id 0 under a fresh id -> identical pair must be found
    val dup = e.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"),
        col("label"))
    val corpus = e.unionByName(dup)
    val got = Dedup.embeddingNearDupLsh(corpus, col("vec_id"),
      col("embedding"), threshold = 0.9, numPlanes = 4).collect()
    assert(got.exists(r => r.getLong(0) == 0L && r.getLong(1) == 100000L))
    // precision 1.0: every reported pair really has cos >= threshold
    // (verified against the exact all-pairs operator, block = constant)
    val exact = Dedup.embeddingNearDup(corpus, col("vec_id"), lit(1),
      col("embedding"), threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall(r => exact.contains((r.getLong(0), r.getLong(1)))))
  }

  test("IVF k-means refinement: objective never degrades, stays exact") {
    val e = Tables.load(spark, sf, "embeddings")
    def objective(cents: Array[(Int, Array[Double])]): Double = {
      val assigned = e.select(Similarity.l2Normalize(col("embedding"))
        .as("v"))
        .withColumn("cell", Similarity.nearestCell(col("v"), cents))
      val centDf = spark.createDataFrame(cents.toSeq).toDF("cell", "cv")
      assigned.join(broadcast(centDf), "cell")
        .select(avg(Similarity.dot(col("v"), col("cv"))))
        .head().getDouble(0)
    }
    val init = Similarity.ivfCentroids(e, col("vec_id"), col("embedding"), 8)
    val refined = Similarity.ivfCentroidsKMeans(e, col("vec_id"),
      col("embedding"), 8, iters = 3)
    assert(objective(refined) >= objective(init) - 1e-9)
    // deterministic across runs
    val refined2 = Similarity.ivfCentroidsKMeans(e, col("vec_id"),
      col("embedding"), 8, iters = 3)
    assert(refined.map(_._2.toSeq).toSeq == refined2.map(_._2.toSeq).toSeq)
    // refined centroids with every cell probed still reproduce brute force
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val brute = Similarity.bruteForceTopK(e, col("vec_id"),
      col("embedding"), q, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val ivf = Similarity.ivfTopK(e, col("vec_id"), col("embedding"), q,
      k = 5, nList = 8, nProbe = 8, refineIters = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("ANN index probes are partition-pruned at the scan") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val dir = java.nio.file.Files.createTempDirectory("annprune").toString
    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"),
      s"$dir/lsh", numPlanes = 4)
    val scan = AnnIndex.lshCandidates(spark, s"$dir/lsh", q,
      probeFlips = 0).get
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    // the scan carries a non-empty PartitionFilters clause on bucket
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert(!plan.contains("PartitionFilters: []"), plan.take(2000))
    // and the full query over the pruned scan still works
    assert(AnnIndex.queryLshIndex(spark, s"$dir/lsh", q, k = 5,
      probeFlips = 0).count() <= 5)
  }

  test("stream-static enrichment joins each micro-batch broadcast-local") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "alpha"), (2L, "beta")).toDF("user_id", "segment")
    val in = MemoryStream[(Long, Double)]
    val stream = in.toDF().toDF("user_id", "value")
    val q = StreamingIngest.enrichStream(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    in.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
    q.processAllAvailable()
    val got = spark.table("enrich_out").orderBy("user_id").collect()
    assert(got.length == 3)
    assert(got(0).getString(2) == "alpha" && got(1).getString(2) == "beta")
    assert(got(2).isNullAt(2)) // unknown key keeps the event (left join)
    q.stop()
  }

  test("k-means: total assignment, partitioning-invariant, dedup greedy-by-id") {
    val embs = Tables.load(spark, sf, "embeddings")
    val assign = Clustering.kmeansAssign(embs, col("vec_id"),
      col("embedding"), k = 4, iters = 2).collect()
    assert(assign.length == embs.count())
    assert(assign.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 4))
    // partitioning must not change the model or the assignment
    val reparted = Clustering.kmeansAssign(embs.repartition(7), col("vec_id"),
      col("embedding"), k = 4, iters = 2).collect()
    assert(assign.map(r => (r.getLong(0), r.getInt(1))).toSet ==
      reparted.map(r => (r.getLong(0), r.getInt(1))).toSet)

    // semantic dedup: kept set equals the brute-force greedy-by-id rule
    // computed per cell from the raw similarities
    val res = Clustering.semanticDedup(embs, col("vec_id"),
      col("embedding"), k = 4, iters = 2, threshold = 0.3)
    val byCell = res.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getBoolean(2)))
    val cells = byCell.groupBy(_._2)
    val vecs = embs.select(col("vec_id"),
        graft.ops.Similarity.l2Normalize(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double =
      math.rint(a.zip(b).map { case (x, y) => x * y }.sum * 1e4) / 1e4
    cells.values.foreach { members =>
      val ids = members.map(_._1).sorted
      val expectDropped = ids.filter(b =>
        ids.exists(a => a < b && cos(vecs(a), vecs(b)) >= 0.3)).toSet
      members.foreach { case (id, _, kept) =>
        assert(kept == !expectDropped.contains(id),
          s"vec $id kept=$kept, brute force disagrees")
      }
    }
  }

  test("tf-idf top terms: rare term outranks common term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared shared unique1"),
      (2L, "shared shared unique2"),
      (3L, "shared shared unique3")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"),
      nDocs = 3, k = 2).orderBy("doc_id", "rank").collect()
    // 'sharedx2' has tf 2 but df 3 -> idf 0 -> score 0; uniqueN wins
    assert(got.filter(_.getLong(1) == 1L).map(_.getString(2)).toSeq ==
      Seq("unique1", "unique2", "unique3"))
    got.filter(_.getLong(1) == 2L).foreach(r =>
      assert(r.getString(2) == "shared" && r.getDouble(5) == 0.0))
  }

  test("dup clusters: chains collapse to min-id components") {
    import spark.implicits._
    // 1-2-3 is a chain (1,3 never directly paired); 5-6 separate; 9-2
    // joins a high id into the first component
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (2L, 9L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs, col("doc_a"), col("doc_b"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L),
      (6L, 5L), (9L, 1L)))
  }

  test("binned range join equals brute force, pairs emitted once, boundaries inclusive") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // points and intervals across ~40 buckets (width 100), intervals up
    // to 3.5 buckets long, plus exact-boundary and zero-length cases
    val pts = (0L until 300L).map(i => (i, rnd.nextInt(4000).toLong)) ++
      Seq((1000L, 500L), (1001L, 700L)) // == start / == end of iv 9000
    val ivs = (0L until 60L).map { i =>
      val s = rnd.nextInt(3800).toLong; (i, s, s + rnd.nextInt(350).toLong)
    } ++ Seq((9000L, 500L, 700L), (9001L, 42L, 42L)) // boundary + zero-len
    val p = pts.toDF("pid", "t")
    val iv = ivs.toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(p, col("pid"), col("t"),
      iv, col("iid"), col("s"), col("e"), bucketWidth = 100L)
      .select(col("interval_id"), col("point_id"))
    val brute = p.join(iv, col("t") >= col("s") && col("t") <= col("e"))
      .select(col("iid").as("interval_id"), col("pid").as("point_id"))
    assert(got.count() === brute.count()) // once each: counts match sets
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
    // the boundary points hit interval 9000 (inclusive both ends)
    val hit9000 = got.filter(col("interval_id") === 9000L)
      .select("point_id").as[Long].collect().toSet
    assert(Set(1000L, 1001L).subsetOf(hit9000))
  }

  test("pii redact: typed placeholders substituted, counts per type, clean text unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail jane.doe+x@example.org and bob@x.io now"),
      (2L, "call 555-867-5309 or 555.123.4567; ssn 123-45-6789"),
      (3L, "a perfectly clean document 12345")).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == "mail <EMAIL> and <EMAIL> now")
    assert(got(0).getLong(2) == 2L)
    assert(got(1).getString(1) == "call <PHONE> or <PHONE>; ssn <SSN>")
    assert(got(1).getLong(3) == 2L && got(1).getLong(4) == 1L)
    assert(got(2).getString(1) == "a perfectly clean document 12345")
    assert(got(2).getLong(2) + got(2).getLong(3) + got(2).getLong(4) == 0L)
  }

  test("leak-free split: cluster members share the rep's split, singletons match plain assign") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val docs = (1L to 200L).toDF("doc_id")
    // two clusters (reps 5 and 40), members scattered across the id space
    val clusters = Seq((5L, 5L), (17L, 5L), (93L, 5L), (40L, 40L),
      (141L, 40L)).toDF("doc_id", "cluster")
    val got = Sampling.leakFreeSplitAssign(docs, col("doc_id"),
      clusters, col("doc_id"), col("cluster"), splits)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 200 &&
      got.values.toSet.subsetOf(Set("train", "val", "test")))
    // members inherit their representative's split — no straddling
    assert(got(17L) == got(5L) && got(93L) == got(5L))
    assert(got(141L) == got(40L))
    // singletons agree with the plain per-doc assignment
    val plain = docs.select(col("doc_id"),
      Sampling.splitAssign(col("doc_id"), splits).as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = Set(5L, 17L, 93L, 40L, 141L)
    (1L to 200L).filterNot(clustered).foreach(i => assert(got(i) == plain(i)))
  }

  test("epoch shuffle: exact permutation, matches global order, partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 300L).toDF("id")
    val got = Sampling.epochShuffle(df, col("id"), seed = "ep7")
      .select(col("id"), col("pos")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // positions are exactly 0..n-1 (a permutation, no gaps or dups)
    assert(got.values.toSeq.sorted == (0L until 300L).toSeq)
    // agrees with the naive single-window global ranking
    val expected = df.select(col("id"),
      org.apache.spark.sql.functions.md5(
        concat_ws(":", lit("ep7"), col("id").cast("string"))).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(got == expected)
    // same permutation from any input partitioning
    val re = Sampling.epochShuffle(df.repartition(7), col("id"), "ep7")
      .select(col("id"), col("pos")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got)
    // a different seed is a different permutation
    val other = Sampling.epochShuffle(df, col("id"), "ep8")
      .select(col("id"), col("pos")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other != got && other.values.toSeq.sorted == (0L until 300L))
  }

  test("line dedup: first occurrence kept in order, counts, identity on clean docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav bar\nreal content\nnav bar\nmore text\nreal content"),
      (2L, "single line no newlines"),
      (3L, ""),
      (4L, "a\na\na\na")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupLines(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == "nav bar\nreal content\nmore text")
    assert(got(0).getLong(2) == 5 && got(0).getLong(3) == 2)
    // no-newline and empty docs pass through byte-identical
    assert(got(1).getString(1) == "single line no newlines" &&
      got(1).getLong(3) == 0)
    assert(got(2).getString(1) == "" && got(2).getLong(2) == 1 &&
      got(2).getLong(3) == 0)
    assert(got(3).getString(1) == "a" && got(3).getLong(3) == 3)
  }

  test("filtered LSH index search: equals brute force over the filtered corpus") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val dir = java.nio.file.Files.createTempDirectory("fannidx").toString
    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"), dir,
      numPlanes = 4, attrs = Seq(col("label")))
    val lab = e.filter(col("vec_id") =!= 0).select(col("label")).head().getInt(0)
    // all buckets probed + attr filter == brute force over the subset
    val got = AnnIndex.queryLshIndex(spark, dir, q, k = 5, probeFlips = 4,
      attrFilter = Some(col("label") === lab)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = Similarity.bruteForceTopK(e.filter(col("label") === lab),
      col("vec_id"), col("embedding"), q, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.toSeq == brute.toSeq && got.nonEmpty)
    // every returned candidate satisfies the predicate
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall { case (id, _, _) => labels(id) == lab })
  }

  test("weighted sample: exact E-S priorities, partitioning-invariant, weight-proportional") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, if (i <= 100) 10000L else 1L))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, col("id"), col("w"), k = 50)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got.size == 50)
    // matches the local E-S computation exactly
    val expected = (1L to 200L).map { i =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(md5hex, 16) + 1.0) / 4294967296.0
      val w = if (i <= 100) 10000.0 else 1.0
      (math.floor(1e12 * -math.log(u) / w).toLong, i)
    }.sorted.take(50).map(_._2).toSet
    assert(got == expected)
    // same sample on any partitioning
    val re = Sampling.weightedSample(df.repartition(7), col("id"),
      col("w"), k = 50).select(col("id")).collect()
      .map(_.getLong(0)).toSet
    assert(re == got)
    // 10000x weights dominate the draw
    assert(got.count(_ <= 100) >= 45)
  }

  test("source overlap: shared distinct n-grams per source pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b c d e f"),     // grams: "a b c", "b c d", ...
      (2L, "s2", "a b c d x y"),     // shares "a b c", "b c d" with s1
      (3L, "s3", "z z z z z"),       // shares nothing
      (4L, "s2", "a b c q r s"))     // dup gram "a b c" in s2: counted once
      .toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(docs, col("source"), col("text"), n = 3)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("s1", "s2", 2L)))
  }

  test("percentile gate: ceil(f*n) kept per group, best scores, deterministic ties") {
    import spark.implicits._
    // g1: 5 rows scores 5,4,3,2,1 -> keep ceil(0.6*5)=3 (ids 1,2,3)
    // g2: 3 rows all score 7 (tie) -> keep ceil(0.6*3)=2 lowest ids
    val df = Seq((1L, "g1", 5.0), (2L, "g1", 4.0), (3L, "g1", 3.0),
      (4L, "g1", 2.0), (5L, "g1", 1.0),
      (6L, "g2", 7.0), (7L, "g2", 7.0), (8L, "g2", 7.0))
      .toDF("id", "g", "score")
    val got = Sampling.percentileGate(df, col("g"), col("score"),
      col("id"), fraction = 0.6)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 6L, 7L))
  }

  test("centroid outliers: opposite vector flagged, aligned vectors pass") {
    import spark.implicits._
    val embs = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(1.0f, 0.1f)),
      (3L, 0, Array(-1.0f, 0.0f)),   // opposite its label-0 centroid
      (4L, 1, Array(0.0f, 1.0f)), (5L, 1, Array(0.1f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidOutliers(embs, col("vec_id"),
      col("label"), col("embedding"), threshold = 0.0)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(3L) && !got(1L) && !got(2L) && !got(4L) && !got(5L))
    // schema carries the rounded cosine
    val cos = Similarity.centroidOutliers(embs, col("vec_id"),
      col("label"), col("embedding"), threshold = 0.0)
      .filter(col("vec_id") === 1L).head().getDouble(2)
    assert(cos > 0.9 && cos <= 1.0)
  }

  test("portable simhash: pairs match a local reference, dups at hamming 0, recall 1.0") {
    import spark.implicits._
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta", // exact dup
      3L -> "alpha beta gamma delta epsilon zeta eta iota",  // near dup
      4L -> "completely different words entirely unrelated content here now",
      5L -> "alpha beta gamma delta epsilon zeta eta theta extra",
      6L -> "one two three four five six seven eight nine ten")
    val docs = texts.toDF("doc_id", "text")
    // local reference: same md5-slice hashes, ±1 sums, ≥0 packing
    def sig(text: String): (Long, Long) = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
      val sums = Array.fill(64)(0)
      toks.foreach { w =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"0:$w".getBytes("UTF-8"))
        def u32(o: Int): Long = ((d(o) & 0xffL) << 24) |
          ((d(o + 1) & 0xffL) << 16) | ((d(o + 2) & 0xffL) << 8) |
          (d(o + 3) & 0xffL)
        val (c0, c1) = (u32(0), u32(4))
        (0 until 32).foreach { j =>
          sums(j) += (if (((c0 >> j) & 1L) == 1L) 1 else -1)
          sums(32 + j) += (if (((c1 >> j) & 1L) == 1L) 1 else -1)
        }
      }
      def pack(off: Int): Long = (0 until 32)
        .map(j => if (sums(off + j) >= 0) 1L << j else 0L)
        .reduce(_ | _)
      (pack(0), pack(32))
    }
    val sigs = texts.map { case (id, t) => id -> sig(t) }.toMap
    val expected = (for {
      (a, (ha, la)) <- sigs; (b, (hb, lb)) <- sigs if a < b
      ham = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if ham <= 3
    } yield (a, b, ham.toLong)).toSet
    val got = Dedup.simhashNearDupPortable(docs, col("doc_id"),
      col("text"), maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // the exact duplicate pair is present at hamming 0
    assert(got.contains((1L, 2L, 0L)))
  }

  test("epoch upsample: copy counts per factor, deterministic fractional draw") {
    import spark.implicits._
    val df = (1L to 400L).map(i =>
      (i, if (i <= 200) "a" else "b")).toDF("id", "g")
    val got = Sampling.epochUpsample(df, col("id"), col("g"),
      Seq("a" -> 2.5, "b" -> 0.25), defaultFactor = 1.0)
      .groupBy("g").agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("ids"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // group a: every id twice plus ~50% a third time -> n in [400, 600]
    val (na, idsA) = got("a")
    assert(idsA == 200 && na >= 2 * 200 && na <= 3 * 200)
    assert(math.abs(na - 500) < 60)  // ~2.5x on average
    // group b: ~25% keep one copy, rest dropped entirely
    val (nb, idsB) = got("b")
    assert(nb == idsB && math.abs(nb - 50) < 30)
    // copies are indexed 0..n_copies-1 and reproducible across partitioning
    val a = Sampling.epochUpsample(df, col("id"), col("g"),
      Seq("a" -> 2.5, "b" -> 0.25), 1.0)
      .select("id", "copy").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Sampling.epochUpsample(df.repartition(7), col("id"), col("g"),
      Seq("a" -> 2.5, "b" -> 0.25), 1.0)
      .select("id", "copy").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSet == b.toSet && a.length == b.length)
    assert(a.filter(_._1 == 1L).map(_._2).sorted.toSeq ==
      (0L until a.count(_._1 == 1L)).toSeq)
  }

  test("priority dedup: curated source wins the fingerprint, id breaks ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "crawl", "same text here"),
      (2L, "curated", "same  TEXT here"),   // same fingerprint, wins
      (3L, "crawl", "same text HERE "),     // same fingerprint, loses
      (4L, "other", "unique content a"),
      (5L, "crawl", "dup in one source"),
      (6L, "crawl", "dup in ONE source"))   // tie on rank -> lower id wins
      .toDF("doc_id", "source", "text")
    val got = Dedup.priorityDedup(docs, col("doc_id"), col("source"),
      col("text"), priority = Seq("curated", "crawl"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 4L, 5L))
  }

  test("bloom might_contain: no false negatives, few false positives, codegen path") {
    import spark.implicits._
    val members = (0 until 2000).map(i => s"member_$i")
    val bloom = graft.functions.BloomFilters.buildString(
      members.toDF("gram"), "gram", members.size, fpp = 0.01)
    val probe = (members ++ (0 until 2000).map(i => s"absent_$i")).toDF("gram")
      .withColumn("hit",
        graft.functions.BloomFilters.bloomMightContain(col("gram"), bloom))
    val hits = probe.filter(col("hit")).select("gram").as[String].collect().toSet
    assert(members.forall(hits.contains)) // no false negatives, ever
    val fps = hits.count(_.startsWith("absent_"))
    assert(fps < 100, s"false positives $fps out of 2000 at fpp=0.01")
  }

  test("ngramOverlapBloom equals the exact broadcast overlap") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val ev = docs.filter(col("doc_id") % 97 === 0)
    val exact = Decontaminate.ngramOverlap(train, ev,
      col("doc_id"), col("text"), n = 4)
    val bloomed = Decontaminate.ngramOverlapBloom(train, ev,
      col("doc_id"), col("text"), n = 4)
    assert(exact.count() > 0)
    assert(bloomed.exceptAll(exact).isEmpty && exact.exceptAll(bloomed).isEmpty)
  }

  test("dupClustersStar equals min-label propagation on fixture and random graphs") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("source"),
      col("text"), threshold = 0.8).localCheckpoint()
    val base = Dedup.dupClusters(pairs, col("doc_a"), col("doc_b"))
    val star = Dedup.dupClustersStar(pairs, col("doc_a"), col("doc_b"))
    assert(base.count() > 0)
    assert(star.exceptAll(base).isEmpty && base.exceptAll(star).isEmpty)
    // seeded random multigraph: mixed component shapes and sizes
    val rnd = new scala.util.Random(7)
    val redges = Seq.fill(400)((rnd.nextInt(120).toLong,
        rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2).distinct
    val rdf = redges.toDF("a", "b")
    val b2 = Dedup.dupClusters(rdf, col("a"), col("b"))
    val s2 = Dedup.dupClustersStar(rdf, col("a"), col("b"))
    assert(s2.exceptAll(b2).isEmpty && b2.exceptAll(s2).isEmpty)
  }

  test("dupClustersStar collapses a deep chain to the component min") {
    import spark.implicits._
    // path 0-1-...-150: diameter-many rounds for label propagation,
    // O(log n) star rounds; every node labels 0
    val chain = (0L until 150L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.dupClustersStar(chain, col("a"), col("b"))
    assert(out.count() == 151L)
    assert(out.filter(col("cluster") =!= 0L).count() == 0L)
  }

  test("materialized cluster map: stored pairs + labels round-trip, " +
      "probes equal fresh clustering") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("source"),
      col("text"), threshold = 0.8, maxDocFreq = 256).localCheckpoint()
    val path = java.nio.file.Files.createTempDirectory("clmap_spec").toString
    DedupIndex.writeClusterMap(pairs, col("doc_a"), col("doc_b"), path)
    // stored edges are exactly the input pairs (projection only)
    val storedPairs = DedupIndex.readClusterPairs(spark, path)
    val inPairs = pairs.select(col("doc_a"), col("doc_b"))
    assert(storedPairs.exceptAll(inPairs).isEmpty &&
      inPairs.exceptAll(storedPairs).isEmpty)
    // stored labels equal a fresh min-label clustering of the pairs
    val fresh = Dedup.dupClusters(pairs, col("doc_a"), col("doc_b"))
    val stored = DedupIndex.readClusterMap(spark, path)
    assert(stored.count() > 0)
    assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty)
    // the star variant over the STORED edges reproduces the same labels
    val star = Dedup.dupClustersStar(storedPairs, col("doc_a"), col("doc_b"))
    assert(star.exceptAll(stored).isEmpty && stored.exceptAll(star).isEmpty)
  }

  test("pii flags: emails, phones, ssns detected; clean text passes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at jane.doe+lab@example.org or bob@x.io"),
      (2L, "call 555-867-5309 or 555.123.4567 today"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "a perfectly clean document 12345")).toDF("doc_id", "text")
    val got = TextAnalysis.piiFlags(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 2 && got(0).getBoolean(4))
    assert(got(1).getLong(2) == 2 && got(1).getBoolean(4))
    assert(got(2).getLong(3) == 1 && got(2).getBoolean(4))
    assert(got(3).getLong(1) == 0 && got(3).getLong(2) == 0 &&
      got(3).getLong(3) == 0 && !got(3).getBoolean(4))
  }

  test("signature aggregates are bit-identical to the declarative forms") {
    // minhash_agg lane s must equal min(xxhash64(w, lit(s))); simhash_agg
    // must equal the 64-sign-sum construction. Checked over real docs so
    // partial aggregation + merge paths run (4 shuffle partitions).
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("w"))

    val n = 16
    val declMins = (0 until n).map(s =>
      min(xxhash64(col("w"), lit(s))).as(s"_m$s"))
    val decl = toks.groupBy(col("doc_id"))
      .agg(declMins.head, declMins.tail: _*)
      .select(col("doc_id"),
        array((0 until n).map(s => col(s"_m$s")): _*).as("sig"))
    val agg = toks.groupBy(col("doc_id"))
      .agg(graft.functions.SignatureAggregates.minhash(col("w"), n).as("sig"))
    assert(decl.join(agg.withColumnRenamed("sig", "sig2"), "doc_id")
      .filter(col("sig") =!= col("sig2")).count() == 0)

    val h = toks.withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"_b$i"))
    val declSh = h.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("sh"))
    val aggSh = Dedup.simhashSignatures(docs, col("doc_id"), col("text"))
    assert(declSh.join(aggSh.withColumnRenamed("sh", "sh2"), "doc_id")
      .filter(col("sh") =!= col("sh2")).count() == 0)
  }

  test("decontamination: only docs sharing an n-gram with eval are flagged") {
    import spark.implicits._
    val eval_ = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "zz alpha beta gamma delta yy"),    // shares "alpha beta gamma delta"
      (2L, "alpha beta gamma something else"), // shares none (3-gram only)
      (3L, "tiny doc"),                        // < n tokens: no grams at all
      (4L, "beta gamma delta epsilon")         // shares exactly 1
    ).toDF("doc_id", "text")
    val got = Decontaminate.ngramOverlap(train, eval_, col("doc_id"),
      col("text"), n = 4).orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (4L, 1L)))
  }

  test("deterministic sampling: partitioning-invariant, threshold exact") {
    assert(Sampling.rateThreshold(0.75) == "c0000000")
    assert(Sampling.rateThreshold(0.25) == "40000000")
    assert(Sampling.rateThreshold(0.0) == "00000000")
    assert(Sampling.rateThreshold(1.0) == "ffffffff")
    val docs = Tables.load(spark, sf, "documents")
    val a = docs.filter(Sampling.keep(col("doc_id"), 0.5))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = docs.repartition(7, col("source"))
      .filter(Sampling.keep(col("doc_id"), 0.5))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty && a.size < docs.count())
    // rate 0 keeps nothing, rate 1 keeps everything
    assert(docs.filter(Sampling.keep(col("doc_id"), 0.0)).count() == 0)
    assert(docs.filter(Sampling.keep(col("doc_id"), 1.0)).count() ==
      docs.count())
  }

  test("greedy packing: budget boundaries, offsets, stream independence") {
    import spark.implicits._
    val docs = Seq(
      // stream s1: 60+40 fill seq 0 exactly; 30 starts seq 1 at offset 0
      (1L, "s1", 60L), (2L, "s1", 40L), (3L, "s1", 30L),
      // oversized doc spans seqs; next doc lands mid-seq
      (4L, "s2", 250L), (5L, "s2", 10L),
      (6L, "s3", 5L)
    ).toDF("doc_id", "stream", "n")
    val got = Packing.greedyPack(docs, col("doc_id"), col("stream"),
      col("n"), budget = 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 60L), (3L, 1L, 0L),
      (4L, 0L, 0L), (5L, 2L, 50L), (6L, 0L, 0L)))
  }

  test("unigram NLL: exact term-floored sums on known counts") {
    import spark.implicits._
    // corpus counts: a=2, b=2, c=1, N=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramNll(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val t25 = math.floor(-math.log(2.0 / 5.0) * 10000.0).toLong // 9162
    val t15 = math.floor(-math.log(1.0 / 5.0) * 10000.0).toLong // 16094
    assert(got == Seq((1L, 3L, 3 * t25), (2L, 2L, t25 + t15)))
  }

  test("int8 quantization: per-dim linear map, constant dim -> 0") {
    import spark.implicits._
    val embs = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(1.0f, 1.0f)), (3L, Seq(0.5f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(embs, col("vec_id"), col("embedding"))
      .orderBy("vec_id", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // dim0 range [0,10000]: 0 -> 0, 10000 -> 255, 5000 -> floor(127.5)=127
    // dim1 constant -> 0
    assert(got == Seq((1L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 255L),
      (2L, 1L, 0L), (3L, 0L, 127L), (3L, 1L, 0L)))
  }

  test("decontamination plan broadcasts the eval gram set") {
    val d = Tables.load(spark, sf, "documents")
    val plan = Decontaminate.ngramOverlap(
      d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
      col("doc_id"), col("text"), n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast-hash join for the eval side, got:\n$plan")
  }

  test("mix rebalance: under-represented groups keep everything") {
    import spark.implicits._
    val docs = ((1L to 8L).map(i => (i, "A")) ++ Seq((9L, "B"), (10L, "B")))
      .toDF("doc_id", "grp")
    val got = Sampling.mixBalancedSample(docs, col("grp"), col("doc_id"))
      .select("doc_id", "grp", "rate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // rate_B = min(1, (10/2)/2) = 1.0 -> both B docs survive
    assert(got.filter(_._2 == "B").map(_._1).sorted.toSeq == Seq(9L, 10L))
    assert(got.filter(_._2 == "B").forall(_._3 == 1.0))
    // rate_A = min(1, 5/8) = 0.625, floored to 4 decimals; md5 of "1".."8"
    // puts exactly ids 6 and 7 under the a0000000 threshold
    assert(got.filter(_._2 == "A").forall(_._3 == 0.625))
    assert(got.filter(_._2 == "A").map(_._1).sorted.toSeq == Seq(6L, 7L))
  }

  test("centsHistogram: exact integer bins, occupied bins only") {
    import spark.implicits._
    val df = Seq(("a", 0.0), ("a", 9.99), ("a", 10.0), ("b", 25.5))
      .toDF("t", "value")
    val got = Stats.centsHistogram(df, col("t"), col("value"), 1000L)
      .orderBy("grp", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // a: 0 and 999 in bin 0; 1000 in bin 1. b: 2550 in bin 2.
    assert(got.toSeq == Seq(
      ("a", 0L, 2L, 0L, 999L, 0L), ("a", 1L, 1L, 1000L, 1000L, 1000L),
      ("b", 2L, 1L, 2550L, 2550L, 2000L)))
  }

  test("sqrt-temperature mix: smallest group keeps all, larger keeps sqrt share") {
    import spark.implicits._
    // |A| = 16, |B| = 4 -> rate_A = sqrt(4/16) = 0.5, rate_B = 1.0
    val docs = ((1L to 16L).map(i => (i, "A")) ++
      (17L to 20L).map(i => (i, "B"))).toDF("doc_id", "grp")
    val got = Sampling.sqrtTemperatureSample(docs, col("grp"),
      col("doc_id"))
      .select("doc_id", "grp", "rate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.filter(_._2 == "B").map(_._1).sorted.toSeq ==
      Seq(17L, 18L, 19L, 20L))
    assert(got.filter(_._2 == "B").forall(_._3 == 1.0))
    assert(got.filter(_._2 == "A").forall(_._3 == 0.5))
    // exact kept set: ids whose md5 first-8-hex < 80000000
    val expectA = (1L to 16L).filter { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf) < 8
    }
    assert(got.filter(_._2 == "A").map(_._1).sorted.toSeq == expectA)
  }

  test("token chunking: overlap, final partial window, empty docs dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, ""),
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val got = Packing.chunkTokens(docs, col("doc_id"), col("text"),
      chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"), (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"), (1L, 3L, 1L, "t10"),
      (3L, 0L, 3L, "a b c")))
  }

  test("as-of join: latest right at-or-before, equal ts visible, none -> null") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((10L, 100L, 7L), (10L, 200L, 8L), (20L, 60L, 9L))
      .toDF("user_id", "ts", "p")
    val got = AsOf.asofJoin(l, r, "user_id", "ts", Seq("p"))
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), Option(x.get(x.fieldIndex("asof_p")))))
    // e1: right row at exactly ts=100 is visible; e2: latest of {100,200};
    // e3: the only right row for user 20 is later -> null
    assert(got.toSeq == Seq((1L, Some(7L)), (2L, Some(8L)), (3L, None)))
  }

  test("bucketed tables co-locate the join: no exchange in the plan") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val embs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))
    spark.sql("DROP TABLE IF EXISTS graft_bucket_docs")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_embs")
    graft.sources.Bucketing.writeBucketed(docs, "graft_bucket_docs",
      "doc_id", 4)
    graft.sources.Bucketing.writeBucketed(embs, "graft_bucket_embs",
      "doc_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucket_docs")
        .join(spark.table("graft_bucket_embs"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected exchange-free bucketed join, got:\n$plan")
      assert(joined.count() == docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_docs")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_embs")
    }
  }

  test("funnel: ordering matters — pre-signup clicks don't count") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full ordered funnel -> stage 3
      (1L, 10000000000L, 1L, "signup"), (2L, 20000000000L, 1L, "click"),
      (3L, 30000000000L, 1L, "purchase"),
      // user 2: click BEFORE signup only -> stage 1
      (4L, 5000000000L, 2L, "click"), (5L, 10000000000L, 2L, "signup"),
      // user 3: purchase before the first post-signup click -> stage 2
      (6L, 10000000000L, 3L, "signup"), (7L, 20000000000L, 3L, "click"),
      (8L, 15000000000L, 3L, "purchase"),
      // user 4: never signed up -> absent from the funnel
      (9L, 10000000000L, 4L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.funnel(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(4))).toSeq
    assert(got == Seq((1L, 3), (2L, 1), (3L, 2)))
  }

  test("built-in sketches stay within error bounds vs exact aggregates") {
    // approx_count_distinct (HLL++) and approx_percentile (t-digest) are
    // the scale path for cardinality/quantiles; this pins their accuracy
    // on real data so a Spark upgrade that degrades them is caught.
    val docs = Tables.load(spark, sf, "documents")
    val exact = docs.select(countDistinct(col("doc_id"))).head().getLong(0)
    val approx = docs.select(approx_count_distinct(col("doc_id"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"HLL said $approx, exact $exact")
    val events = Tables.loadEvents(spark, sf)
      .select(floor(col("value") * 100).cast("long").as("cents"))
    val med = events.select(expr("approx_percentile(cents, 0.5, 1000)"))
      .head().getLong(0)
    val exactMed = events.select(expr("percentile(cents, 0.5)"))
      .head().getDouble(0)
    assert(math.abs(med - exactMed) / math.max(exactMed, 1.0) <= 0.05,
      s"approx median $med, exact $exactMed")
  }

  test("md5_lanes native expression equals the declarative hex-slice form") {
    import spark.implicits._
    // Tokens with ASCII, unicode, empty-ish and long strings — the lane
    // contract is over arbitrary UTF-8 token bytes.
    val words = (Seq("a", "the", "Ünïcodé", "日本語テキスト", "x" * 500,
      "mixed123!@#", " ", "\ttab") ++ (0 until 200).map(i => s"tok$i"))
      .toDF("w")
    val chunks = 3
    val native = words.select(col("w"),
      graft.functions.Md5Lanes.lanes(col("w"), chunks).as("lv"))
    // Declarative twin: unsigned-int parse of the md5 8-hex slices.
    val declared = words.select(col("w") +: (0 until chunks * 4).map { s =>
      conv(substring(md5(concat(lit(s / 4 + ":"), col("w"))),
        (s % 4) * 8 + 1, 8), 16, 10).cast("long").as(s"d$s")
    }: _*)
    val joined = native.join(declared, "w")
    val mismatches = joined.filter(
      (0 until chunks * 4).map(s => col("lv").getItem(s) =!= col(s"d$s"))
        .reduce(_ || _)).count()
    assert(mismatches == 0)
    // And %08x round-trips a lane back to the original hex substring.
    val hexBack = words.select(
      format_string("%08x",
        graft.functions.Md5Lanes.lanes(col("w"), 1).getItem(0)).as("h"),
      substring(md5(concat(lit("0:"), col("w"))), 1, 8).as("e"))
    assert(hexBack.filter(col("h") =!= col("e")).count() == 0)
  }

  test("portable minhash: exact-verified subset of exact jaccard pairs") {
    val docs = Tables.load(spark, sf, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("source"),
        col("text"), threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val port = Dedup.minhashNearDupPortable(docs, col("doc_id"),
        col("source"), col("text"), threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0 by construction (every candidate verified exactly)
    assert(port.subsetOf(exact))
    // LSH recall stays high at 4 bands x 2 rows for >= 0.8 similarity
    assert(exact.isEmpty || port.size * 10 >= exact.size * 8,
      s"recall ${port.size}/${exact.size}")
  }

  test("pipeline ops are total on empty input (no throw, empty result)") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Packing.chunkTokens(noDocs, col("doc_id"), col("text"),
      64, 48).count() == 0)
    assert(Packing.greedyPack(noDocs.withColumn("src", lit("s")),
      col("doc_id"), col("src"), lit(1L), 512).count() == 0)
    assert(TextAnalysis.unigramNll(noDocs, col("doc_id"),
      col("text")).count() == 0)
    assert(Decontaminate.ngramOverlap(noDocs, noDocs, col("doc_id"),
      col("text"), 4).count() == 0)
    assert(Similarity.quantizeInt8(noEmb, col("vec_id"),
      col("embedding")).count() == 0)
    assert(Similarity.centroidSums(noEmb, col("label"),
      col("embedding")).count() == 0)
    assert(Sampling.mixBalancedSample(noDocs.withColumn("g", lit("x")),
      col("g"), col("doc_id")).count() == 0)
    assert(Stats.groupMedian(noDocs, col("text"), col("doc_id"),
      col("doc_id")).count() == 0)
    assert(AsOf.asofJoin(noDocs.withColumn("ts", lit(0L)),
      noDocs.withColumn("ts", lit(0L)).withColumn("p", lit(0L)),
      "doc_id", "ts", Seq("p")).count() == 0)
    assert(TextAnalysis.prunePassages(noDocs, col("doc_id"), col("text"),
      3, 5).count() == 0)
    assert(TextAnalysis.linearScore(noDocs, col("doc_id"), col("text"),
      Seq(("a", 1L)).toDF("w", "weight")).count() == 0)
    assert(TextAnalysis.bigramNll(noDocs, col("doc_id"),
      col("text")).count() == 0)
    assert(TextAnalysis.vocabProfile(noDocs, col("doc_id"),
      col("text")).count() == 0)
    assert(Similarity.randomProjection(noEmb, col("vec_id"),
      col("embedding"), 4, 64).count() == 0)
    assert(Events.topPaths(Seq.empty[(Long, Long, Long, String)]
      .toDF("event_id", "user_id", "ts", "event_type"), 1800, 5)
      .count() == 0)
    // round-2 additions
    assert(noDocs.select(Sampling.splitAssign(col("doc_id"),
      Seq("a" -> 1.0, "b" -> 1.0)).as("s")).count() == 0)
    assert(Packing.budgetSelect(noDocs.withColumn("g", lit("x")),
      col("g"), col("doc_id"), col("doc_id"), col("doc_id"), 10L,
      col("doc_id")).count() == 0)
    assert(Packing.interleaveKey(noDocs, col("text"), col("doc_id"),
      col("doc_id")).count() == 0)
    assert(Stats.groupQuantiles(noDocs, col("text"), col("doc_id"),
      col("doc_id"), Seq("p50" -> 0.5)).count() == 0)
    assert(Stats.quantileBuckets(noDocs, col("text"), col("doc_id"),
      col("doc_id"), col("doc_id"), 10).count() == 0)
    assert(Sharding.balance(noDocs, col("doc_id"), col("doc_id"),
      8).count() == 0)
    assert(Versioning.corpusDiff(noDocs, noDocs, col("doc_id"),
      col("text")).count() == 0)
    assert(Similarity.centroidDrift(noEmb, noEmb, col("label"),
      col("embedding")).count() == 0)
    assert(TextAnalysis.encodingFlags(noDocs, col("doc_id"),
      col("text")).count() == 0)
    assert(Events.spendOutliers(Seq.empty[(Long, Long, Long, Double)]
      .toDF("event_id", "user_id", "ts", "value"), 3.0).count() == 0)
    assert(Skew.saltedEquiJoin(noDocs, col("doc_id"), col("doc_id"),
      Seq.empty[(Long, String)].toDF("k2", "label"), col("k2"), 4)
      .count() == 0)
  }

  test("exact dedup index: probe finds only new content; append closes it") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("dedupidx").toString
    val corpus = Seq((1L, "the quick fox"), (2L, "hello world"))
      .toDF("doc_id", "text")
    DedupIndex.writeExactIndex(corpus, col("doc_id"), col("text"), path)
    // batch: doc 10 duplicates doc 1 (same normalized content),
    // doc 11 is new
    val batch = Seq((10L, "  THE  QUICK   FOX "), (11L, "brand new doc"))
      .toDF("doc_id", "text")
    val fresh = DedupIndex.newOnly(spark, batch, col("doc_id"),
      col("text"), path)
    assert(fresh.select("doc_id").as[Long].collect().toSeq == Seq(11L))
    // accept the batch; re-probing the same batch now yields nothing
    DedupIndex.appendExact(fresh.join(batch, "doc_id"), col("doc_id"),
      col("text"), path)
    assert(DedupIndex.newOnly(spark, batch, col("doc_id"), col("text"),
      path).count() == 0)
  }

  test("minhash index probe: identical doc estimates 1.0, disjoint stays out") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("mhidx").toString
    val corpus = Seq(
      (2L, "alpha beta gamma delta epsilon zeta"),
      (4L, "one two three four five six")
    ).toDF("doc_id", "text")
    DedupIndex.writeMinhashIndex(corpus, col("doc_id"), col("text"), path)
    val batch = Seq(
      (11L, "alpha beta gamma delta epsilon zeta"), // == doc 2
      (13L, "totally unrelated words here now")
    ).toDF("doc_id", "text")
    val got = DedupIndex.nearDupAgainstIndex(spark, batch, col("doc_id"),
      col("text"), path, minEstimate = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((11L, 2L, 10000L)))
  }

  test("streaming dedup ingest vs persisted index admits only new content") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dedupingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"; val out = s"$root/out"
    // bootstrap: corpus already holds docs 1 and 2
    val corpus = Seq((1L, "seen before one"), (2L, "seen before two"))
      .toDF("doc_id", "text")
    DedupIndex.writeExactIndex(corpus, col("doc_id"), col("text"), idx)
    // batch 1 arrives: one dup of doc 1, one new doc
    Seq((10L, "seen  BEFORE   one"), (11L, "fresh content a"))
      .toDF("doc_id", "text").write.parquet(s"$in/f1")
    val schema = corpus.schema
    StreamingIngest.dedupIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", schema),
      idx, out, s"$root/ckpt").awaitTermination()
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().toSeq == Seq(11L))
    // batch 2: a dup of the doc admitted in batch 1, plus another new one
    Seq((20L, "fresh content a"), (21L, "fresh content b"))
      .toDF("doc_id", "text").write.parquet(s"$in/f2")
    StreamingIngest.dedupIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", schema),
      idx, out, s"$root/ckpt").awaitTermination()
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(11L, 21L))
  }

  test("streaming profile ingest: store profiles equal whole-corpus derivations") {
    val root = java.nio.file.Files.createTempDirectory("profingest").toString
    val store = s"$root/store"; val in = s"$root/in"
    val docs = Tables.load(spark, sf, "documents")
      .select(col("source"), col("text"))
    // two arrival batches split by a content hash (both carry every
    // source, so read-time merges do real cross-batch work)
    val nib = conv(substring(md5(col("text")), 1, 1), 16, 10).cast("int")
    docs.filter(nib < 8).write.parquet(s"$in/f1")
    def run() = StreamingIngest.profileIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", docs.schema),
      col("source"), col("text"), length(col("text")).cast("long"),
      store, cmsWidth = 256, s"$root/ckpt", compactEvery = 1)
      .awaitTermination()
    run()
    docs.filter(nib >= 8).write.parquet(s"$in/f2")
    run()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // HLL: merged store profile == direct whole-corpus derivation
    assert(rows(SketchStore.readHllProfile(spark, store)) ==
      rows(Sketches.hllDistinctFast(docs, col("source"), col("text"))))
    // CMS: merged counters == direct whole-corpus sketch
    assert(rows(SketchStore.readCms(spark, store)) ==
      rows(Sketches.cmsSketch(docs, col("text"), width = 256)))
    // histogram: merged quantile profile == direct sketch + window path
    val qs = Seq(0.5, 0.9)
    assert(rows(SketchStore.readHistProfile(spark, store, qs)) ==
      rows(Sketches.histQuantiles(Sketches.histSketch(docs, col("source"),
        length(col("text")).cast("long")), qs)))
  }

  test("streaming lexical ingest: probes equal a whole-corpus build") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("lexingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"
    val d = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val nib = conv(substring(md5(col("doc_id").cast("string")), 1, 1),
      16, 10).cast("int")
    LexIndex.writeBm25IndexBatchKeyed(d.filter(nib < 8), col("doc_id"),
      col("text"), idx, positions = true)
    d.filter(nib >= 8 && nib < 12).write.parquet(s"$in/f1")
    def run() = StreamingIngest.lexIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", d.schema),
      idx, s"$root/ckpt", compactEvery = 1).awaitTermination()
    run()
    d.filter(nib >= 12).write.parquet(s"$in/f2")
    run()
    val ref = s"$root/ref"
    LexIndex.writeBm25Index(d, col("doc_id"), col("text"), ref,
      positions = true)
    val terms = Seq("table", "hash", "merge").map(Tuple1(_)).toDF("term")
    def bm(p: String) = LexIndex.bm25TopKIndexed(spark, p, terms,
        col("term"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def ph(p: String) = LexIndex.phraseTopKIndexed(spark, p,
        Seq("row", "column", "sort"), k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bm(idx) == bm(ref) && ph(idx) == ph(ref))
  }

  test("streaming vector ingest: stored index equals whole-corpus assignment under the frozen model") {
    val root = java.nio.file.Files.createTempDirectory("vecingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"
    val e = Tables.load(spark, sf, "embeddings")
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    // bootstrap: the base build trains on the first half (batch-keyed
    // layout so the streamed batches' dynamic overwrites compose)
    AnnIndex.writeIvfIndex(e.filter(nib < 8), col("vec_id"),
      col("embedding"), idx, nList = 8, refineIters = 1,
      batchKeyed = true)
    // the second half arrives as two streamed files
    e.filter(nib >= 8 && nib < 12).write.parquet(s"$in/f1")
    def run() = StreamingIngest.vectorIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", e.schema),
      idx, s"$root/ckpt", compactEvery = 1).awaitTermination()
    run()
    e.filter(nib >= 12).write.parquet(s"$in/f2")
    run()
    // probes over the streamed index equal an in-memory assignment of
    // the whole corpus under the stored (frozen) model
    val cents = spark.read.parquet(s"$idx/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy { case (cell, _) => cell }
    val q5 = e.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSeq
    assert(rows(AnnIndex.ivfKnnJoinIndexed(spark, idx, q5,
        col("vec_id"), col("embedding"), k = 5, nProbe = 3)) ==
      rows(Similarity.ivfKnnJoinWith(e, col("vec_id"), col("embedding"),
        q5, col("vec_id"), col("embedding"), k = 5, cents, nProbe = 3)))
    // no duplicate vector rows across base + streamed batches
    assert(spark.read.parquet(s"$idx/index").count() == e.count())
  }

  test("streaming LSH ingest: frozen planes make the streamed index equal a whole-corpus build") {
    val root = java.nio.file.Files.createTempDirectory("lshingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"
    val e = Tables.load(spark, sf, "embeddings")
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    AnnIndex.writeLshIndex(e.filter(nib < 8), col("vec_id"),
      col("embedding"), idx, numPlanes = 6, batchKeyed = true)
    e.filter(nib >= 8 && nib < 12).write.parquet(s"$in/f1")
    def run() = StreamingIngest.lshIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", e.schema),
      idx, s"$root/ckpt", compactEvery = 1).awaitTermination()
    run()
    e.filter(nib >= 12).write.parquet(s"$in/f2")
    run()
    // hyperplanes are deterministic in (num_planes, dim), so the
    // streamed index probes exactly like one whole-corpus build
    val ref = s"$root/ref"
    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"), ref,
      numPlanes = 6)
    val q = e.filter(col("vec_id") === 3).select(
      Similarity.l2Normalize(col("embedding")).as("qv"))
    def probe(p: String) = AnnIndex.queryLshIndex(spark, p, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe(idx) == probe(ref) && probe(idx).nonEmpty)
    assert(spark.read.parquet(s"$idx/index").count() == e.count())
  }

  test("streaming fingerprint ingest: the streamed store probes equal a whole-corpus build") {
    val root =
      java.nio.file.Files.createTempDirectory("fpingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"
    // real decoded-pixel fingerprints (the qm04 frame) as the stream
    val sigs = Multimodal.decodeGray8x8(
        Multimodal.synthImages(
          spark.range(0, 64).toDF("doc_id"), "doc_id"), "media_id")
      .select(col("media_id").as("doc_id"),
        graft.functions.VectorExpressions.ahash64(col("grays")).as("sh"))
      .localCheckpoint(eager = false)
    FingerprintIndex.writeHammingIndex(
      sigs.filter(col("doc_id") % 4 === 0), col("doc_id"), col("sh"),
      idx, maxHamming = 10, batchKeyed = true)
    sigs.filter(col("doc_id") % 4 === 1).write.parquet(s"$in/f1")
    def run() = StreamingIngest.fingerprintIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", sigs.schema),
      idx, s"$root/ckpt", compactEvery = 1).awaitTermination()
    run()
    sigs.filter(col("doc_id") % 4 >= 2).write.parquet(s"$in/f2")
    run()
    // banding is deterministic in the meta-pinned radius, so the
    // streamed store probes exactly like one whole-corpus build
    val ref = s"$root/ref"
    FingerprintIndex.writeHammingIndex(sigs, col("doc_id"), col("sh"),
      ref, maxHamming = 10)
    def probe(p: String) = FingerprintIndex.hammingAgainstIndex(spark,
        sigs.filter(col("doc_id") < 8), col("doc_id"), col("sh"), p)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2))).toSet
    assert(probe(idx) == probe(ref) && probe(idx).nonEmpty)
    assert(spark.read.parquet(s"$idx/sigs").count() == 64)
  }

  test("streaming IVF-PQ ingest: frozen model encodes batches; introspection triggers the fold") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pqingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"
    val e = Tables.load(spark, sf, "embeddings")
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    AnnIndex.writeIvfPqIndex(e.filter(nib < 8), col("vec_id"),
      col("embedding"), idx, nList = 8, numSub = 8, codebookSize = 8,
      refineIters = 1, batchKeyed = true)
    e.filter(nib >= 8 && nib < 12).write.parquet(s"$in/f1")
    // no blind cadence here: the PHYSICAL batch-partition count drives
    // the fold (StoreFiles.needsBatchCompaction via maxBatchParts)
    def run() = StreamingIngest.ivfPqIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", e.schema),
      idx, s"$root/ckpt", maxBatchParts = 1).awaitTermination()
    run()
    e.filter(nib >= 12).write.parquet(s"$in/f2")
    run()
    // probes equal the same frozen model grown by the plain append path
    val ref = s"$root/ref"
    AnnIndex.writeIvfPqIndex(e.filter(nib < 8), col("vec_id"),
      col("embedding"), ref, nList = 8, numSub = 8, codebookSize = 8,
      refineIters = 1)
    AnnIndex.appendIvfPqIndex(e.filter(nib >= 8), col("vec_id"),
      col("embedding"), ref)
    val q5 = e.filter(col("vec_id") < 5)
    def probe(p: String) = AnnIndex.ivfPqKnnJoinIndexed(spark, p, q5,
        col("vec_id"), col("embedding"), k = 5, nProbe = 3, rerank = 20)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(probe(idx) == probe(ref) && probe(idx).nonEmpty)
    assert(spark.read.parquet(s"$idx/codes").count() == e.count())
    assert(spark.read.parquet(s"$idx/vectors").count() == e.count())
    // the introspection-driven fold actually fired: committed history
    // sits under -1 with at most the in-flight batch still keyed
    val live = spark.read.parquet(s"$idx/codes").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq
    assert(live.head == -1L && live.size <= 2, live.toString)
  }

  test("streaming plain-PQ ingest: frozen codebook encodes batches; keepVectors sidecar stays exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ppqingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"
    val e = Tables.load(spark, sf, "embeddings")
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    AnnIndex.writePqIndex(e.filter(nib < 8), col("vec_id"),
      col("embedding"), idx, numSub = 8, codebookSize = 8,
      keepVectors = true, batchKeyed = true)
    e.filter(nib >= 8 && nib < 12).write.parquet(s"$in/f1")
    def run() = StreamingIngest.pqIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", e.schema),
      idx, s"$root/ckpt", maxBatchParts = 1).awaitTermination()
    run()
    e.filter(nib >= 12).write.parquet(s"$in/f2")
    run()
    // probes equal the same frozen codebook grown by the plain append
    // path; the streamed sidecar equals a from-scratch recompute
    val ref = s"$root/ref"
    AnnIndex.writePqIndex(e.filter(nib < 8), col("vec_id"),
      col("embedding"), ref, numSub = 8, codebookSize = 8,
      keepVectors = true)
    AnnIndex.appendPqIndex(e.filter(nib >= 8), col("vec_id"),
      col("embedding"), ref)
    val q5 = e.filter(col("vec_id") < 5)
    def probe(p: String) = AnnIndex.pqKnnJoinIndexed(spark, p, q5,
        col("vec_id"), col("embedding"), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(probe(idx) == probe(ref) && probe(idx).nonEmpty)
    assert(spark.read.parquet(s"$idx/codes").count() == e.count())
    assert(spark.read.parquet(s"$idx/vectors").count() == e.count())
    assert(AnnIndex.readErrState(spark, idx) ==
      AnnIndex.readErrState(spark, ref))
    // the introspection-driven fold fired: committed history under -1
    val live = spark.read.parquet(s"$idx/codes").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq
    assert(live.head == -1L && live.size <= 2, live.toString)
  }

  test("streaming NEAR-dup ingest: index rejects, in-batch twins resolve, replay idempotent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("neardupingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"; val out = s"$root/out"
    // bootstrap corpus: one indexed doc
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    graft.ops.DedupIndex.writeMinhashIndex(corpus, col("doc_id"),
      col("text"), idx)
    // batch: a near-dup of indexed doc 1 (same word set), an in-batch
    // twin pair (20/21, same word set), and one genuinely new doc
    Seq(
      (10L, "zeta epsilon delta gamma beta alpha"),
      (20L, "totally different words over here"),
      (21L, "different totally words here over"),
      (30L, "nothing like anything else at all")
    ).toDF("doc_id", "text").write.parquet(s"$in/f1")
    val schema = corpus.schema
    StreamingIngest.nearDupIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", schema),
      idx, out, s"$root/ckpt", minEstimate = 0.8).awaitTermination()
    // 10 rejected (index), 21 rejected (in-batch twin of 20), 20+30 in
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(20L, 30L))
    // replay the same file with a FRESH checkpoint: every doc now
    // matches itself (or its twin) in the index -> zero new rows
    StreamingIngest.nearDupIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", schema),
      idx, out, s"$root/ckpt2", minEstimate = 0.8).awaitTermination()
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(20L, 30L))
  }

  test("topk_agg equals the window-rank form and is partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // scored pairs with score ties (groups g, ids 0..99)
    val scored = (0 until 200).map(i =>
      (s"g${i % 2}", (i % 7).toDouble, i.toLong))
      .toDF("g", "score", "id")
    def viaAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("g"))
      .agg(graft.functions.TopKAggregate
        .topk(col("score"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("r", "p")))
      .select(col("g"), col("p.score"), col("p.id"), col("r"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3))).toSeq.sortBy(x => (x._1, x._4))
    val viaWindow = scored
      .withColumn("rn", row_number().over(Window.partitionBy("g")
        .orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3) - 1)).toSeq.sortBy(x => (x._1, x._4))
    assert(viaAgg(scored) == viaWindow)
    // repartitioning must not change the result (merge-order invariance)
    assert(viaAgg(scored.repartition(7, col("id"))) == viaWindow)
    // groups smaller than k return all their rows
    val tiny = Seq(("g", 1.0, 1L), ("g", 2.0, 2L)).toDF("g", "score", "id")
    assert(viaAgg(tiny).map(_._3) == Seq(2L, 1L))
  }

  test("topk_agg SQL registration matches the API form") {
    import spark.implicits._
    spark.sessionState.functionRegistry.registerFunction(
      graft.GraftExtensions.topkDescriptor._1,
      graft.GraftExtensions.topkDescriptor._2,
      graft.GraftExtensions.topkDescriptor._3)
    val df = (0 until 50).map(i => ("g", i.toDouble % 5, i.toLong))
      .toDF("g", "score", "id")
    df.createOrReplaceTempView("scored_topk")
    val viaSql = spark.sql(
      "SELECT topk_agg(score, id, 3) AS top FROM scored_topk GROUP BY g")
      .select(explode(col("top")).as("p")).select("p.score", "p.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val viaApi = df.groupBy("g")
      .agg(graft.functions.TopKAggregate.topk(col("score"), col("id"), 3)
        .as("top"))
      .select(explode(col("top")).as("p")).select("p.score", "p.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(viaSql == viaApi && viaApi.nonEmpty)
  }

  test("knnJoin: each query's self-match ranks first with cos 1.0") {
    val e = Tables.load(spark, sf, "embeddings")
    val got = graft.ops.Similarity.knnJoin(e, col("vec_id"),
      col("embedding"), e.filter(col("vec_id") < 3), col("vec_id"),
      col("embedding"), k = 3)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, 1.0), (1L, 1L, 1.0), (2L, 2L, 1.0)))
  }

  test("prunePassages invariant: n_kept + n_removed == n_tokens (corpus)") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val bad = graft.ops.TextAnalysis.prunePassages(docs, col("doc_id"),
      col("text"), k = 3, maxDocFreq = 2)
      .join(docs.select(col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n")), "doc_id")
      .filter(col("n_kept") + col("n_removed") =!= col("n") ||
        col("n_kept") =!= size(split(col("text_pruned"), " ")) &&
          col("n_kept") =!= 0)
    assert(bad.count() == 0)
  }

  test("centroid sums: exact integer element sums per group") {
    import spark.implicits._
    val embs = Seq(
      (1L, Seq(1.0f, -0.5f), 0), (2L, Seq(0.25f, 0.5f), 0),
      (3L, Seq(2.0f, 2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidSums(embs, col("label"), col("embedding"))
      .orderBy("label", "dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // label 0 dim 0: 10000 + 2500; dim 1: -5000 + 5000
    assert(got == Seq((0, 0L, 2L, 12500L), (0, 1L, 2L, 0L),
      (1, 0L, 1L, 20000L), (1, 1L, 1L, 20000L)))
  }

  test("prunePassages removes only hot-shingle-covered tokens, in order") {
    import spark.implicits._
    // 'x y z' appears in 3 docs (> maxDocFreq 2); doc 4 shares no shingle
    val docs = Seq(
      (1L, "a b x y z c"), (2L, "x y z d e"), (3L, "f x y z"),
      (4L, "g h i j"), (5L, "x y z")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.prunePassages(docs, col("doc_id"),
      col("text"), k = 3, maxDocFreq = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a b c", 3L, 3L), (2L, "d e", 2L, 3L), (3L, "f", 1L, 3L),
      (4L, "g h i j", 4L, 0L),
      (5L, "", 0L, 3L))) // fully-boilerplate doc survives, empty
  }

  test("linearScore: broadcast model, OOV scores 0, exact integer sums") {
    import spark.implicits._
    val docs = Seq((1L, "a a b zz"), (2L, "zz zz")).toDF("doc_id", "text")
    val weights = Seq(("a", 3L), ("b", -5L)).toDF("w", "weight")
    val got = graft.ops.TextAnalysis.linearScore(docs, col("doc_id"),
      col("text"), weights)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1: 3+3-5+0 = 1 over 4 tokens -> floor(0.25*1e4) = 2500
    assert(got.toSeq == Seq((1L, 4L, 1L, 2500L), (2L, 2L, 0L, 0L)))
  }

  test("bigramNll: MLE bigram model, short docs report zero") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    // c(a,b)=2, c(b,a)=1, c(a,c)=1 -> c(a,.)=3, c(b,.)=1
    // doc1: -ln(2/3) - ln(1/1) - ln(1/3); doc2: -ln(2/3)
    val got = graft.ops.TextAnalysis.bigramNll(docs, col("doc_id"),
      col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def e4(p: Double) = math.floor(-math.log(p) * 10000).toLong
    assert(got.toSeq == Seq(
      (1L, 3L, e4(2.0 / 3.0) + e4(1.0) + e4(1.0 / 3.0)),
      (2L, 1L, e4(2.0 / 3.0)), (3L, 0L, 0L)))
  }

  test("vocabProfile: vocab, hapax and exact ratios per group") {
    import spark.implicits._
    val docs = Seq(("s1", "a a b"), ("s1", "a c"), ("s2", "d d"))
      .toDF("source", "text")
    val got = graft.ops.TextAnalysis.vocabProfile(docs, col("source"),
      col("text"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // s1: 5 tokens, vocab {a:3,b:1,c:1}, hapax 2, ttr=3/5, hapax/vocab=2/3
    assert(got.toSeq == Seq(
      ("s1", 2L, 5L, 3L, 2L, 6000L, 6666L),
      ("s2", 1L, 2L, 1L, 0L, 5000L, 0L)))
  }

  test("randomProjection: unit vectors read the sign matrix back exactly") {
    import spark.implicits._
    // e_i scaled by 1.0 -> out[j] = 10000 * sign(j, i)
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.randomProjection(embs, col("vec_id"),
      col("embedding"), outDims = 4, inDims = 3)
      .orderBy("vec_id", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = for (v <- Seq(1L, 2L); j <- 1 to 4) yield
      (v, j.toLong,
        10000L * graft.ops.Similarity.projectionSign(j, v.toInt))
    assert(got.toSeq == want)
  }

  test("topPaths orders events inside sessions and ranks deterministically") {
    import spark.implicits._
    val sec = 1000000000L // ns
    val events = Seq(
      // user 1, one session: a>b>c
      (1L, 1L, 1L * sec, "a"), (2L, 1L, 2L * sec, "b"),
      (3L, 1L, 3L * sec, "c"),
      // user 2, two sessions split by a 2000s gap: a>b>c then d
      (4L, 2L, 1L * sec, "a"), (5L, 2L, 2L * sec, "b"),
      (6L, 2L, 3L * sec, "c"),
      (7L, 2L, 2500L * sec, "d")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Events.topPaths(events, gapSeconds = 1800, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a>b>c", 2L, 1L), ("d", 1L, 2L)))
  }

  test("splitAssign is total, deterministic, and near the target mix") {
    val d = Tables.load(spark, sf, "documents")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = d.select(col("doc_id"),
      Sampling.splitAssign(col("doc_id"), splits).as("split"))
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == d.count(), "every row gets exactly one label")
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // ~80/10/10 within generous tolerance at this scale
    assert(math.abs(counts("train").toDouble / total - 0.8) < 0.05, counts)
    // repartitioning does not change any assignment
    val again = d.repartition(13).select(col("doc_id"),
      Sampling.splitAssign(col("doc_id"), splits).as("split"))
    assert(assigned.except(again).isEmpty && again.except(assigned).isEmpty)
    // integer weights normalize to the same assignment
    val ints = d.select(col("doc_id"), Sampling.splitAssign(col("doc_id"),
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0)).as("split"))
    assert(assigned.except(ints).isEmpty)
  }

  test("groupQuantiles selects the DuckDB quantile_disc ranks exactly") {
    import spark.implicits._
    // n=4: p=.25->rank1, .5->2, .75->3, .9->4 (probed against DuckDB)
    val df = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 30L, 3L),
      ("g", 40L, 4L)).toDF("grp0", "v0", "t0")
    val got = Stats.groupQuantiles(df, col("grp0"), col("v0"), col("t0"),
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9))
      .collect().head
    assert((got.getAs[Long]("p25"), got.getAs[Long]("p50"),
      got.getAs[Long]("p75"), got.getAs[Long]("p90")) == (10L, 20L, 30L, 40L))
    // p=0 clamps to rank 1; p=1 is rank n; odd n median
    val odd = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 30L, 3L),
      ("g", 40L, 4L), ("g", 50L, 5L)).toDF("grp0", "v0", "t0")
    val o = Stats.groupQuantiles(odd, col("grp0"), col("v0"), col("t0"),
        Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0)).collect().head
    assert((o.getAs[Long]("p0"), o.getAs[Long]("p50"),
      o.getAs[Long]("p100")) == (10L, 30L, 50L))
  }

  test("saltedEquiJoin equals the plain join and spreads the hot key") {
    import spark.implicits._
    // hot key: 100 of 101 rows share key 1
    val big = ((1 to 100).map(i => (i.toLong, 1L)) :+ (101L, 2L))
      .toDF("row_id", "k")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unused"))
      .toDF("sk", "label")
    val salted = Skew.saltedEquiJoin(big, col("k"), col("row_id"),
      small, col("sk"), buckets = 8)
    val plain = big.join(small, col("k") === col("sk"))
    assert(salted.select("row_id", "k", "sk", "label")
      .except(plain.select("row_id", "k", "sk", "label")).isEmpty)
    assert(plain.select("row_id", "k", "sk", "label")
      .except(salted.select("row_id", "k", "sk", "label")).isEmpty)
    assert(salted.count() == 101)
    // the hot key's rows really do land under multiple salt values
    val nSalts = big.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("row_id")), lit(8L)).as("s"))
      .distinct().count()
    assert(nSalts > 1, "salt must split the hot key")
  }

  test("sharding layout is deterministic, balanced, and prunable") {
    val d = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = Sharding.write(d, col("doc_id"), col("doc_id"),
      numShards = 8, path = dir)
    val counts = manifest.collect().map(r =>
      r.getAs[Long]("shard") -> r.getAs[Long]("n_rows")).toMap
    assert(counts.keySet == (0L until 8L).toSet, s"all shards present: $counts")
    assert(counts.values.sum == d.count())
    // hash spread: no shard more than 3x the ideal share
    val ideal = d.count().toDouble / 8
    assert(counts.values.forall(_ < ideal * 3), s"skewed shards: $counts")
    // re-running the assignment on a repartitioned input is identical
    val a1 = d.select(col("doc_id"), Sharding.shardId(col("doc_id"), 8)
      .as("s"))
    val a2 = d.repartition(17).select(col("doc_id"),
      Sharding.shardId(col("doc_id"), 8).as("s"))
    assert(a1.except(a2).isEmpty && a2.except(a1).isEmpty)
    // reading one shard prunes partitions: only shard=3 rows come back
    val one = spark.read.parquet(dir).filter(col("shard") === 3)
    assert(one.count() == counts(3L))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"),
      s"shard filter should prune partitions:\n$plan")
    // portable id matches the documented external-SQL formula
    val row = d.select(col("doc_id").cast("string").as("k"),
      Sharding.portableShardId(col("doc_id"), 16).as("s")).head()
    val expected = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        row.getString(0)).substring(0, 8), 16) % 16
    assert(row.getLong(1) == expected)
  }

  test("interleaveKey round-robins groups through the epoch") {
    import spark.implicits._
    val docs = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("c", 6L)).toDF("g", "doc_id")
    val keyed = Packing.interleaveKey(docs, col("g"), col("doc_id"),
      col("doc_id"))
    val inOrder = keyed.orderBy("interleave_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // G=3: a->gidx0, b->1, c->2; keys a:(0,3,6) b:(1,4) c:(2)
    assert(inOrder.toSeq == Seq(("a", 1L, 0L), ("b", 4L, 1L), ("c", 6L, 2L),
      ("a", 2L, 3L), ("b", 5L, 4L), ("a", 3L, 6L)))
    // keys are unique even with unequal groups
    assert(keyed.select("interleave_key").distinct().count() == 6)
  }

  test("stripMarkup removes tags/scripts/comments and decodes entities") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<html><body><p>Hello   <b>world</b></p></body></html>"),
      (2L, "<script type=\"text/js\">var x = 1 < 2;</script>keep"),
      (3L, "<!-- secret -->visible<style>p{color:red}</style>"),
      (4L, "a &amp; b &lt;tag&gt; &quot;q&quot; &apos;s&apos;"),
      (5L, "plain text untouched")
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.stripMarkup(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "Hello world")
    assert(got(2L) == "keep")
    assert(got(3L) == "visible")
    assert(got(4L) == "a & b <tag> \"q\" 's'")
    assert(got(5L) == "plain text untouched")
  }

  test("encodingFlags counts replacement and control characters") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text"),
      (2L, "bad � decode � twice"),
      (3L, "ctrl chars here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.encodingFlags(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (0L, 0L))
    assert(got(2L) == (2L, 0L))
    assert(got(3L) == (0L, 3L))
  }

  test("quantileBuckets follows standard NTILE remainder semantics") {
    import spark.implicits._
    // 7 rows into 3 buckets: sizes 3,2,2 (first buckets absorb remainder)
    val df = (1L to 7L).map(i => ("g", i, i)).toDF("grp0", "id0", "v0")
    val got = Stats.quantileBuckets(df, col("grp0"), col("id0"), col("v0"),
        col("id0"), n = 3)
      .orderBy("v").collect().map(_.getAs[Long]("bucket"))
    assert(got.toSeq == Seq(1L, 1L, 1L, 2L, 2L, 3L, 3L))
  }

  test("spendOutliers flags exactly the hand-computed outlier") {
    import spark.implicits._
    // user 1: cents 100,100,100,100,1000 -> mean 280, var large; check
    // the exact test (n·x−s)² > 9·(n·q−s²) by hand:
    // n=5 s=1400 q=1040000; for x=1000: (5000−1400)²=12,960,000;
    // 9·(5,200,000−1,960,000)=29,160,000 -> NOT flagged at k=3.
    // At k=1.5: 2.25·3,240,000=7,290,000 < 12,960,000 -> flagged.
    val ns = 1000000000L
    val events = Seq(
      (1L, 1L, 1.00), (2L, 1L, 1.00), (3L, 1L, 1.00), (4L, 1L, 1.00),
      (5L, 1L, 10.00),
      (6L, 2L, 5.00) // single-event user never flags
    ).map { case (e, u, v) => (e, u, e * ns, "t", v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(Events.spendOutliers(events, k = 3.0).count() == 0)
    val flagged = Events.spendOutliers(events, k = 1.5)
      .collect().map(_.getAs[Long]("event_id"))
    assert(flagged.toSeq == Seq(5L))
  }

  test("JSONL round-trips with pinned schema and isolates corrupt lines") {
    val d = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    graft.sources.JsonLines.write(d, s"$dir/docs")
    val back = graft.sources.JsonLines.read(spark, s"$dir/docs", d.schema)
      .drop(graft.sources.JsonLines.corruptColumn)
    assert(back.count() == d.count())
    assert(back.schema.fieldNames.toSeq == d.schema.fieldNames.toSeq)
    assert(back.exceptAll(d).isEmpty && d.exceptAll(back).isEmpty)
    // a corrupt line lands in _corrupt_record, not an exception
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.jsonl"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n".getBytes)
    // Spark disallows referencing ONLY _corrupt_record on a raw JSON
    // scan (SPARK-21610) — materialize whole rows, then inspect.
    val mixed = graft.sources.JsonLines.read(spark, s"$dir/bad.jsonl",
      d.schema).collect()
    assert(mixed.length == 2)
    assert(mixed.count(r => !r.isNullAt(
      r.fieldIndex(graft.sources.JsonLines.corruptColumn))) == 1)
  }

  test("corpusDiff classifies added/removed/changed/same exactly") {
    import spark.implicits._
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "beta"), (3L, "gamma CHANGED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = graft.ops.Versioning.corpusDiff(oldSnap, newSnap,
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "same", 3L -> "changed",
      4L -> "added"))
    // whitespace/case normalization: fingerprints match across it
    val aNorm = Seq((9L, "Hello   World")).toDF("doc_id", "text")
    val bNorm = Seq((9L, "hello world")).toDF("doc_id", "text")
    assert(graft.ops.Versioning.corpusDiff(aNorm, bNorm, col("doc_id"),
      col("text")).head().getString(1) == "same")
  }

  test("centroidDrift is zero for identical halves, exact otherwise") {
    import spark.implicits._
    val a = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.centroidDrift(a, a, col("label"), col("embedding"))
      .head().getAs[Long]("drift_num") == 0L)
    // hand case: A = {(1,0)}, B = {(0,1),(0,1)} under one label:
    // dim0: |10000·2 − 0·1| = 20000 ; dim1: |0·2 − 20000·1| = 20000
    val b = Seq((3L, Seq(0.0f, 1.0f), 0), (4L, Seq(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val one = Seq((1L, Seq(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidDrift(one, b, col("label"), col("embedding"))
      .head()
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("drift_num") == 40000L)
  }

  test("streaming split router writes prunable split partitions") {
    val d = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("router").toString
    d.write.mode("overwrite").parquet(s"$dir/in")
    val stream = StreamingIngest.watchParquetDir(spark, s"$dir/in", d.schema)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    StreamingIngest.splitRouter(stream, col("doc_id"), splits,
      s"$dir/out", s"$dir/chk").start().awaitTermination()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == d.count())
    // routed identically to the batch assignment
    val batch = d.select(col("doc_id"),
      graft.ops.Sampling.splitAssign(col("doc_id"), splits).as("split"))
    assert(out.select("doc_id", "split").except(batch).isEmpty)
    // replaying the same input adds nothing (checkpointed exactly-once)
    StreamingIngest.splitRouter(
      StreamingIngest.watchParquetDir(spark, s"$dir/in", d.schema),
      col("doc_id"), splits, s"$dir/out", s"$dir/chk")
      .start().awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() == d.count())
  }

  test("group weighted sample: k per group, matches per-group local E-S reference") {
    import spark.implicits._
    val df = (1L to 120L).map(i => (i, s"g${i % 3}", (i % 7 + 1) * 100L))
      .toDF("id", "g", "w")
    val got = Sampling.groupWeightedSample(df, col("id"), col("g"),
      col("w"), k = 10, seed = "gws")
      .select("id", "g").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 30 && got.groupBy(_._2).forall(_._2.length == 10))
    // matches the local per-group E-S ranking
    def pri(i: Long, w: Double): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"gws:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
      math.floor(1e12 * -math.log(u) / w).toLong
    }
    val expected = (1L to 120L).map(i => (i, s"g${i % 3}",
      pri(i, (i % 7 + 1) * 100.0))).groupBy(_._2).flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(10).map(r => (r._1, r._2))
    }.toSet
    assert(got.toSet == expected)
  }

  test("budget mix sample: rates from budget shares, unlisted groups dropped") {
    import spark.implicits._
    // g1: 100 docs x 100 tokens = 10000; g2: 50 x 100 = 5000; g3 unlisted
    val df = ((1L to 100L).map(i => (i, "g1", 100L)) ++
      (101L to 150L).map(i => (i, "g2", 100L)) ++
      (151L to 170L).map(i => (i, "g3", 100L))).toDF("id", "g", "tok")
    // budget 6000 at 50/50: g1 rate = 6000*0.5/10000 = 0.3,
    // g2 rate = 3000/5000 = 0.6
    val got = Sampling.budgetMixSample(df, col("id"), col("g"), col("tok"),
      Seq("g1" -> 0.5, "g2" -> 0.5), budget = 6000L)
      .select("id", "g", "rate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.forall(_._2 != "g3"))
    assert(got.filter(_._2 == "g1").forall(_._3 == 0.3))
    assert(got.filter(_._2 == "g2").forall(_._3 == 0.6))
    // md5 keeps land near the rates
    val n1 = got.count(_._2 == "g1"); val n2 = got.count(_._2 == "g2")
    assert(math.abs(n1 - 30) <= 15 && math.abs(n2 - 30) <= 15, (n1, n2))
    // a share the corpus can't fill caps at rate 1.0 and keeps all
    val capped = Sampling.budgetMixSample(df, col("id"), col("g"),
      col("tok"), Seq("g2" -> 1.0), budget = 100000L)
      .select("id").collect()
    assert(capped.length == 50)
  }

  test("streaming decontamination router: sound bloom screen, clean docs provably clean") {
    import spark.implicits._
    val evalDocs = Seq((900L, "secret eval question alpha beta gamma"),
      (901L, "held out benchmark prompt delta epsilon zeta"))
      .toDF("doc_id", "text")
    val contaminated = "prefix words secret eval question alpha beta gamma suffix"
    val docs = (Seq((1L, contaminated)) ++
      (2L to 40L).map(i => (i, s"clean document number $i with ordinary tokens")))
      .toDF("doc_id", "text")
    val evalGrams = evalDocs
      .select(explode(graft.ops.Decontaminate.ngrams(col("text"), 3))
        .as("gram")).distinct()
    val bloom = graft.functions.BloomFilters.buildString(evalGrams, "gram",
      evalGrams.count(), fpp = 0.01)
    val dir = java.nio.file.Files.createTempDirectory("deconrt").toString
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val stream = StreamingIngest.watchParquetDir(spark, s"$dir/in", docs.schema)
    StreamingIngest.decontaminationRouter(stream, col("text"), bloom, 3,
      s"$dir/out", s"$dir/chk").start().awaitTermination()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 40)
    // hive partition values read back as strings — cast at the edge
    val suspects = out.filter(col("suspect").cast("boolean"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // soundness: the contaminated doc is NEVER missed
    assert(suspects.contains(1L))
    // the screen routes identically to the batch expression (fp ~1%)
    val batchSuspects = docs.filter(exists(
      graft.ops.Decontaminate.ngrams(col("text"), 3),
      g => graft.functions.BloomFilters.bloomMightContain(g, bloom)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(suspects == batchSuspects)
  }

  test("filtered MMR == MMR over the allowed subset (never a post-filter of the diversified page)") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val allowed = pmod(col("vec_id"), lit(4)) === 1
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = rows(Similarity.mmrTopK(e, col("vec_id"),
      col("embedding"), q, k = 5, poolSize = 20, lambda = 0.5,
      attrFilter = Some(allowed)))
    val want = rows(Similarity.mmrTopK(e.filter(allowed), col("vec_id"),
      col("embedding"), q, k = 5, poolSize = 20, lambda = 0.5))
    assert(got == want && got.nonEmpty)
    // and it is genuinely a different page than post-filtering the
    // unfiltered trajectory would give (the greedy path diverges)
    val unfiltered = rows(Similarity.mmrTopK(e, col("vec_id"),
      col("embedding"), q, k = 5, poolSize = 20, lambda = 0.5))
    assert(got.map(_._1) != unfiltered.map(_._1))
  }

  test("mmr top-k: diversity demotes the near-duplicate, trajectory matches local greedy") {
    import spark.implicits._
    // q = (1,0); a b are near-copies along q, c is diverse
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)),             // query vector
      (1L, Array(1.0f, 0.0f)),             // rel 1.0
      (2L, Array(1.0f, 0.02f)),            // near-copy of 1
      (3L, Array(0.7f, 0.7f)),             // diverse
      (4L, Array(0.6f, 0.75f)))            // diverse-ish
      .toDF("vec_id", "embedding")
    val q = embs.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val got = Similarity.mmrTopK(embs, col("vec_id"), col("embedding"), q,
      k = 3, poolSize = 5, lambda = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // rank 1 is the most relevant (the query's twin, lowest id on the tie)
    assert(got(0)._1 == 0L || got(0)._1 == 1L)
    // at λ=0.3 diversity dominates: with the query's twin selected,
    // scores reduce to −0.4·rel, so the FARTHEST vector takes rank 2
    // and the near-copy of rank 1 (vec 2) sinks to last
    assert(got(1)._1 == 4L, got.mkString(","))
    assert(got.last._1 == 2L, got.mkString(","))
    // local greedy reference with the same 4-decimal rounding
    // Spark's round(x, 4): HALF_UP on the double's decimal expansion
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def norm(v: Array[Float]): Array[Double] = {
        val d = v.map(_.toDouble)
        val n = math.sqrt(d.map(x => x * x).sum)
        d.map(_ / n)
      }
      val (na, nb) = (norm(a), norm(b))
      r4(na.zip(nb).map(p => p._1 * p._2).sum)
    }
    val vecs = Seq(0L -> Array(1.0f, 0.0f), 1L -> Array(1.0f, 0.0f),
      2L -> Array(1.0f, 0.02f), 3L -> Array(0.7f, 0.7f),
      4L -> Array(0.6f, 0.75f)).toMap
    val qv = vecs(0L)
    var sel = Vector.empty[Long]
    (1 to 3).foreach { _ =>
      val cands = vecs.keys.toSeq.filterNot(sel.contains).sorted
      val best = cands.map { v =>
        val maxSim = if (sel.isEmpty) 0.0 else sel.map(s => cos(vecs(v), vecs(s))).max
        val m = r4(0.3 * cos(vecs(v), qv) - 0.7 * maxSim)
        (-m, v)
      }.min._2
      sel :+= best
    }
    assert(got.map(_._1).toSeq == sel)
  }

  test("bpe learn: hand-computed merges, greedy non-overlap on runs, weighted vocab") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa ab ab abc"), (2L, "aaa"))
      .toDF("doc_id", "text")
    val (merges, syms) = graft.ops.Bpe.learn(docs, col("text"), rounds = 2)
    // round 1: (a,a) count 3 (aaaa) + 2 (aaa) = 5 beats (a,b)=3
    // round 2: after merge, (a,b)=3 beats (aa,aa)=1 and (aa,a)=1
    assert(merges == Seq((1, "a", "a", 5L), (2, "a", "b", 3L)), merges)
    // greedy non-overlap: aaaa -> [aa, aa]; aaa -> [aa, a]
    val byWord = syms.orderBy("word", "pos").collect()
      .map(r => (r.getString(0), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byWord("aaaa") == Seq("aa", "aa"), byWord)
    assert(byWord("aaa") == Seq("aa", "a"), byWord)
    assert(byWord("ab") == Seq("ab") && byWord("abc") == Seq("ab", "c"))
    // weighted vocabulary: ab appears in 'ab' (freq 2) and 'abc' (freq 1)
    val vocab = syms.groupBy("sym").agg(sum("freq").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("aa" -> 3L, "a" -> 1L, "ab" -> 3L, "c" -> 1L), vocab)
  }

  test("pq adc: top-k matches a full local reference in exact integer math") {
    val e = Tables.load(spark, sf, "embeddings")
    val got = Similarity.pqTopK(e, col("vec_id"), col("embedding"),
      queryId = 0L, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // local reference: same md5-ordered codebook, argmin codes, ADC sums
    val all = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def q4(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000.0).toLong)
    val numSub = 8; val cbSize = 16
    val subDim = all.head._2.length / numSub
    val sample = all.sortBy { case (id, _) => (md5hex(s"pq:$id"), id) }
      .take(cbSize).map(p => q4(p._2))
    def codes(v: Array[Long]): Array[Int] = Array.tabulate(numSub) { m =>
      val sub = v.slice(m * subDim, (m + 1) * subDim)
      (0 until cbSize).map { c =>
        val cb = sample(c).slice(m * subDim, (m + 1) * subDim)
        (sub.zip(cb).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min._2
    }
    val qv = q4(all.toMap.apply(0L))
    val qTable = Array.tabulate(numSub, cbSize) { (m, c) =>
      val qs = qv.slice(m * subDim, (m + 1) * subDim)
      val cb = sample(c).slice(m * subDim, (m + 1) * subDim)
      qs.zip(cb).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val expected = all.map { case (id, v) =>
      val cs = codes(q4(v))
      (id, (0 until numSub).map(m => qTable(m)(cs(m))).sum)
    }.sortBy { case (id, s) => (s, id) }.take(5)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
    assert(got.toSeq == expected.toSeq, s"got=${got.toSeq}")
    // compression really happened: scores repeat across near-identical
    // vectors only through shared codes, and all scores are non-negative
    assert(got.forall(_._2 >= 0L))
  }

  test("interval overlap join: equals brute force, each pair exactly once, boundaries inclusive") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val as = (1L to 80L).map(i =>
      { val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(200)) })
    val bs = (1L to 120L).map(i =>
      { val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(100)) })
    val adf = as.toDF("id", "s", "e"); val bdf = bs.toDF("id", "s", "e")
    val got = graft.ops.RangeJoin.intervalOverlap(
      adf, col("id"), col("s"), col("e"),
      bdf, col("id"), col("s"), col("e"), bucketWidth = 64L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exactly once per overlapping pair
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    val expected = (for {
      (ai, s1, e1) <- as; (bi, s2, e2) <- bs
      if s1 <= e2 && s2 <= e1
    } yield (ai, bi)).toSet
    assert(got.toSet == expected)
    // inclusive boundary: touching endpoints overlap
    val t = graft.ops.RangeJoin.intervalOverlap(
      Seq((1L, 0L, 10L)).toDF("id", "s", "e"), col("id"), col("s"), col("e"),
      Seq((2L, 10L, 20L)).toDF("id", "s", "e"), col("id"), col("s"), col("e"),
      bucketWidth = 3L).count()
    assert(t == 1L)
  }

  test("pq index: persisted codes reproduce the in-memory ADC result, scan is join-free") {
    val e = Tables.load(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    AnnIndex.writePqIndex(e, col("vec_id"), col("embedding"), dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding"))
    val idx = AnnIndex.queryPqIndex(spark, dir, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val mem = Similarity.pqTopK(e, col("vec_id"), col("embedding"),
      queryId = 0L, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(idx.toSeq == mem.toSeq && idx.nonEmpty)
    // the query-time plan is a pure codes scan: no join, no shuffle
    // before the TakeOrdered
    val plan = AnnIndex.queryPqIndex(spark, dir, q, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("consistent shard: matches local ring lookup, reshard moves only removed arcs") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val got = df.select(col("id"),
        graft.ops.Sharding.consistentShard(col("id"), 16).as("s16"),
        graft.ops.Sharding.consistentShard(col("id"), 12).as("s12"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // local reference ring
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def ring(n: Int): Seq[(Long, Long)] =
      (for { s <- 0 until n; v <- 0 until 8 } yield
        (java.lang.Long.parseLong(md5hex(s"ring:$s:$v").substring(0, 8), 16),
          s.toLong)).sortBy(p => (p._1, p._2))
    def assign(id: Long, r: Seq[(Long, Long)]): Long = {
      val h = java.lang.Long.parseLong(md5hex(s"ch:$id").substring(0, 8), 16)
      r.find(_._1 >= h).getOrElse(r.head)._2
    }
    val (r16, r12) = (ring(16), ring(12))
    got.foreach { case (id, s16, s12) =>
      assert(s16 == assign(id, r16) && s12 == assign(id, r12), id)
    }
    // the consistent-hashing contract: keys NOT on removed shards stay put
    got.filter(_._2 < 12).foreach { case (id, s16, s12) =>
      assert(s12 == s16, s"key $id moved off a surviving shard")
    }
    // removed-shard keys all land somewhere valid, and some keys moved
    assert(got.forall(_._3 < 12))
    assert(got.exists(r => r._2 >= 12))
  }

  test("pq rerank: exact cosine over the ADC shortlist, matches manual composition") {
    val e = Tables.load(spark, sf, "embeddings")
    val got = Similarity.pqRerankTopK(e, col("vec_id"), col("embedding"),
      queryId = 0L, k = 5, shortlist = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // manual composition of the two independently-tested stages
    val shortIds = Similarity.pqTopK(e, col("vec_id"), col("embedding"),
      queryId = 0L, k = 20).collect().map(_.getLong(0)).toSet
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val expected = Similarity.bruteForceTopK(
      e.filter(col("vec_id").isin(shortIds.toSeq: _*)),
      col("vec_id"), col("embedding"), q, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.toSeq == expected.toSeq && got.nonEmpty)
    // every reranked hit came from the shortlist
    assert(got.forall(r => shortIds.contains(r._1)))
  }

  test("hourly anomalies: spike hour flags, flat hours and dips don't") {
    import spark.implicits._
    // type A: 9 flat hours of 10 events, 1 spike hour of 60, 1 dip of 1
    val base = 1700000000L
    def at(hour: Int, i: Int) =
      (base + hour * 3600L + i) * 1000000000L
    val rows =
      (0 until 9).flatMap(h => (0 until 10).map(i =>
        (at(h, i), "A"))) ++
      (0 until 60).map(i => (at(9, i), "A")) ++
      Seq.fill(1)((at(10, 0), "A")) ++
      (0 until 5).flatMap(h => (0 until 7).map(i => (at(h, i), "B")))
    val ev = rows.zipWithIndex
      .map { case ((ts, t), i) => (i.toLong, ts, t) }
      .toDF("event_id", "ts", "event_type")
    val got = Events.hourlyAnomalies(ev, k = 3.0).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    // only the spike hour of type A flags (dip is below mean; B is flat)
    assert(got.toSeq == Seq(("A", 60L)), got.mkString(","))
  }

  test("oov rate: vocabulary cut is deterministic, rates floor to 4 decimals") {
    import spark.implicits._
    // vocab of size 2 -> {'aa' (4 hits), 'bb' (3)}; 'cc'/'dd' are OOV
    val docs = Seq((1L, "aa aa bb cc"), (2L, "aa aa bb bb dd cc"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(docs, col("doc_id"), col("text"), 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((1L, 4L, 1L, 0.25)))
    assert(got(1) == ((2L, 6L, 2L, 0.3333)))
  }

  test("forward as-of: earliest right row at-or-after, ties by id, merge shape") {
    import spark.implicits._
    val left = Seq((10L, 1L, 100L), (11L, 1L, 200L), (12L, 2L, 50L),
      (13L, 3L, 10L)).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 100L, 900L), (1L, 150L, 901L), (1L, 150L, 902L),
      (2L, 40L, 903L), (3L, 5L, 904L))
      .toDF("user_id", "ts", "click_id")
    val got = AsOf.asofJoinForward(left, right, "user_id", "ts",
      Seq("click_id"), tieBreak = Seq("click_id"))
      .select("event_id", "next_click_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
      .toMap
    // same-ts right row IS visible (>=); ties pick the lower click_id
    assert(got(10L).contains(900L))
    // strictly-later rows: the earliest wins, tiebreak on id
    assert(got(11L).isEmpty)         // no click at/after 200 for user 1
    assert(got(12L).isEmpty)         // user 2's click is before
    assert(got(13L).isEmpty)         // user 3's click is before
    val got2 = AsOf.asofJoinForward(
      Seq((20L, 1L, 120L)).toDF("event_id", "user_id", "ts"), right,
      "user_id", "ts", Seq("click_id"), tieBreak = Seq("click_id"))
      .select("next_click_id").head().getLong(0)
    assert(got2 == 901L)             // two clicks at 150: lower id first
  }

  test("portable winnowing: matches local window-argmin reference, dedups selections") {
    import spark.implicits._
    val texts = Seq(
      1L -> "a b c d e f g h i j k l",
      2L -> "a b c d",                      // exactly one shingle, one window? no — needs w=5 complete windows
      3L -> "x y z a b c d e f g h i j")
    val docs = texts.toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprintsPortable(docs, col("doc_id"),
      col("text"), k = 4, w = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = texts.flatMap { case (id, t) =>
      val toks = t.split("\\s+")
      val shingles = toks.sliding(4).map(_.mkString(" ")).toArray
        .zipWithIndex.map { case (s, p) =>
          (p.toLong, java.lang.Long.parseLong(
            md5hex(s"wf:$s").substring(0, 8), 16)) }
      shingles.sliding(5).filter(_.length == 5).map { win =>
        val (p, h) = win.minBy { case (p, h) => h * 1048576L + p }
        (id, h, p)
      }
    }.toSet
    assert(got == expected, s"got=${got.size} exp=${expected.size}")
    // doc 2 has one shingle -> no complete 5-window -> contributes nothing
    assert(!got.exists(_._1 == 2L))
  }

  test("heavyhitters_agg: guarantee holds, state bounded, SQL-registered") {
    import spark.implicits._
    // 1000 items: "hot" x 400, "warm" x 200, 400 singletons; m = 9 ->
    // threshold n/(m+1) = 100: hot and warm MUST be present.
    val rows = (Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 400).map(i => s"rare$i"))
    val df = rows.toDF("w").repartition(7) // merge path exercised
    val hh = df.agg(graft.functions.HeavyHittersAggregate
        .heavyHitters(col("w"), 9).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh.size <= 9, s"state must stay bounded: ${hh.size}")
    assert(hh.contains("hot") && hh.contains("warm"), hh)
    // estimates are lower bounds within n/(m+1)
    assert(hh("hot") <= 400 && hh("hot") >= 400 - 100, hh("hot"))
    assert(hh("warm") <= 200 && hh("warm") >= 200 - 100, hh("warm"))
    // exact-recount composition: candidates always cover true HH set
    val counts = df.groupBy("w").count()
    val trueHH = counts.filter(col("count") * 10 > 1000)
      .collect().map(_.getString(0)).toSet
    assert(trueHH.subsetOf(hh.keySet))
    // SQL registration (GraftExtensions descriptor path)
    val d = graft.GraftExtensions.heavyHittersDescriptor
    spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    df.createOrReplaceTempView("hh_in")
    val viaSql = spark.sql(
      "SELECT explode(heavyhitters_agg(w, 9)) AS e FROM hh_in")
      .select("e.item").collect().map(_.getString(0)).toSet
    assert(Set("hot", "warm").subsetOf(viaSql))
  }

  test("budgetSelect keeps best-first within budget, never over") {
    import spark.implicits._
    val docs = Seq(
      // group g1: scores 5,4,3,2 with costs 4,3,2,1, budget 7 ->
      // take score 5 (cum 4), score 4 (cum 7 == budget, inclusive),
      // score 3 would hit 9 -> excluded, and selection STOPS there
      // (cum is monotone, so score 2 at cum 10 is out too).
      (1L, "g1", 5L, 4L), (2L, "g1", 4L, 3L),
      (3L, "g1", 3L, 2L), (4L, "g1", 2L, 1L),
      // g2: single doc bigger than the budget -> nothing selected
      (5L, "g2", 9L, 8L)
    ).toDF("doc_id", "grp", "score", "cost")
    val got = Packing.budgetSelect(docs, col("grp"), col("doc_id"),
        col("score"), col("cost"), budget = 7L, tieBreak = col("doc_id"))
      .orderBy("group", "cum_cost")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_cost")))
    assert(got.toSeq == Seq((1L, 4L), (2L, 7L)))
    // ties break by doc_id ascending: equal scores, budget fits one
    val tied = Seq((10L, "t", 1L, 5L), (11L, "t", 1L, 5L))
      .toDF("doc_id", "grp", "score", "cost")
    val winner = Packing.budgetSelect(tied, col("grp"), col("doc_id"),
        col("score"), col("cost"), budget = 5L, tieBreak = col("doc_id"))
      .collect().map(_.getAs[Long]("doc_id"))
    assert(winner.toSeq == Seq(10L))
  }

  test("binary topk: exact when shortlist covers corpus, sign bits match local packing") {
    val e = Tables.load(spark, sf, "embeddings")
    val n = e.count().toInt
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    // shortlist = whole corpus -> stage 2 sees everything -> brute force
    val got = Similarity.binaryTopK(e, col("vec_id"), col("embedding"),
      queryId = 0L, k = 5, shortlist = n).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = Similarity.bruteForceTopK(e, col("vec_id"),
      col("embedding"), q, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.toSeq == brute.toSeq && got.nonEmpty)
    // packed sign bits equal a local reference packing
    val packed = e.select(col("vec_id"),
      Similarity.signBits(col("embedding"), 0).as("lo"),
      Similarity.signBits(col("embedding"), 32).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val local = e.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](1)
      def pack(from: Int): Long = (0 until 32).foldLeft(0L) { (acc, j) =>
        if (from + j < v.length && v(from + j) >= 0) acc | (1L << j) else acc
      }
      r.getLong(0) -> (pack(0), pack(32))
    }.toMap
    assert(packed == local)
  }

  test("binary topk on sub-64-dim vectors: sign bits zero-pad instead " +
      "of throwing under ANSI") {
    import spark.implicits._
    // 40-dim corpus: lanes 41..64 are past the array end — try_element_at
    // must fold them to 0 bits (plain element_at throws INVALID_ARRAY_INDEX
    // under Spark 4's ANSI default)
    val rnd = new scala.util.Random(11)
    val e = (0L until 30L)
      .map(i => (i, Array.fill(40)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.binaryTopK(e, col("vec_id"), col("embedding"),
      queryId = 0L, k = 3, shortlist = 30).collect()
    assert(got.length == 3 && got.head.getLong(0) == 0L) // self is rank 1
    val bits = e.select(Similarity.signBits(col("embedding"), 32).as("hi"))
      .collect().map(_.getLong(0))
    // bits 8..31 of the hi word (dims 41..64) are always zero-padded
    assert(bits.forall(h => (h >> 8) == 0L))
  }

  test("matryoshka topk: full-width prefix equals brute force, narrow prefix stays k-sized") {
    val e = Tables.load(spark, sf, "embeddings")
    val n = e.count().toInt
    val q = e.filter(col("vec_id") === 0)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    // prefix = full dims AND shortlist = corpus -> identical to brute force
    val full = Similarity.matryoshkaTopK(e, col("vec_id"), col("embedding"),
      queryId = 0L, k = 5, prefixDims = dim, shortlist = n).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = Similarity.bruteForceTopK(e, col("vec_id"),
      col("embedding"), q, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(full.toSeq == brute.toSeq)
    // narrow prefix: still k rows, ranks 1..k, cosines are the EXACT
    // full-dim cosines of whatever the shortlist surfaced
    val narrow = Similarity.matryoshkaTopK(e, col("vec_id"),
      col("embedding"), queryId = 0L, k = 5, prefixDims = 8,
      shortlist = 20).collect()
    assert(narrow.length == 5 &&
      narrow.map(_.getInt(2)).toSeq == (1 to 5).toSeq)
  }

  test("binary index: persisted bits reproduce the in-memory result, absent query is empty") {
    val e = Tables.load(spark, sf, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graft_bqidx").toString
    AnnIndex.writeBinaryIndex(e, col("vec_id"), col("embedding"), path)
    val fromIndex = AnnIndex.queryBinaryIndex(spark, path, queryId = 0L,
      k = 5, shortlist = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val inMemory = Similarity.binaryTopK(e, col("vec_id"),
      col("embedding"), queryId = 0L, k = 5, shortlist = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(fromIndex.toSeq == inMemory.toSeq && fromIndex.nonEmpty)
    assert(AnnIndex.queryBinaryIndex(spark, path, queryId = -1L,
      k = 5, shortlist = 20).count() == 0)
  }

  test("streaming VECTOR near-dup ingest: index rejects re-ingested vectors, in-batch twins resolve, replay idempotent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vecingest").toString
    val idx = s"$root/idx"; val in = s"$root/in"; val out = s"$root/out"
    // ±scale sign-pattern vectors: cosine is 1.0 exactly for scaled
    // copies (same pattern), ≤ (64-2)/64 for any differing pattern —
    // cleanly on either side of the 0.99 threshold.
    def v(bits: Long, scale: Float = 1f): Array[Float] =
      Array.tabulate(64)(i =>
        if ((bits >> i & 1L) == 1L) scale else -scale)
    val corpus = Seq((1L, v(0x0123456789ABCDEFL)))
      .toDF("vec_id", "embedding")
    AnnIndex.writeBinaryIndex(corpus, col("vec_id"), col("embedding"), idx)
    Seq(
      (10L, v(0x0123456789ABCDEFL, 2f)), // scaled copy of indexed 1
      (20L, v(0xFEDCBA9876543210L)),     // new pattern
      (21L, v(0xFEDCBA9876543210L, 3f)), // in-batch twin of 20
      (30L, v(0x00000000FFFFFFFFL))      // new pattern
    ).toDF("vec_id", "embedding").write.parquet(s"$in/f1")
    val schema = corpus.schema
    StreamingIngest.vectorNearDupIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", schema),
      idx, out, s"$root/ckpt").awaitTermination()
    // 10 rejected (index), 21 rejected (twin of 20), 20+30 admitted
    assert(spark.read.parquet(out).select("vec_id").as[Long]
      .collect().sorted.toSeq == Seq(20L, 30L))
    // fresh checkpoint replay: every vector now matches itself (or its
    // twin) in the index -> no new rows
    StreamingIngest.vectorNearDupIngestTo(
      StreamingIngest.watchParquetDir(spark, s"$in/*", schema),
      idx, out, s"$root/ckpt2").awaitTermination()
    assert(spark.read.parquet(out).select("vec_id").as[Long]
      .collect().sorted.toSeq == Seq(20L, 30L))
  }

  test("hamming knn join: k rows per query, self-match at rank 1, matches local reference") {
    val e = Tables.load(spark, sf, "embeddings")
    val got = Similarity.hammingKnnJoin(e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 3), col("vec_id"), col("embedding"), k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // 3 queries × 4 ranks, every query's own vector at rank 1, cos 1.0
    assert(got.length == 12)
    (0L until 3L).foreach { qid =>
      val mine = got.filter(_._1 == qid).sortBy(_._4)
      assert(mine.map(_._4).toSeq == Seq(1L, 2L, 3L, 4L))
      assert(mine.head._2 == qid && mine.head._3 == 1.0)
    }
    // local reference: exact hamming shortlist then cosine rerank
    val vecs = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bits(v: Array[Float]): (Long, Long) = {
      def pack(from: Int): Long = (0 until 32).foldLeft(0L) { (acc, j) =>
        if (from + j < v.length && v(from + j) >= 0) acc | (1L << j)
        else acc
      }
      (pack(0), pack(32))
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      def n(x: Array[Double]) = { val s = math.sqrt(x.map(y => y * y).sum)
        x.map(_ / s) }
      val (na, nb) = (n(ad), n(bd))
      val d = na.zip(nb).map { case (x, y) => x * y }.sum
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (0L until 3L).foreach { qid =>
      val (qlo, qhi) = bits(vecs(qid))
      val short = vecs.toSeq.map { case (id2, v) =>
        val (lo, hi) = bits(v)
        (id2, java.lang.Long.bitCount(lo ^ qlo) +
          java.lang.Long.bitCount(hi ^ qhi))
      }.sortBy { case (id2, h) => (h, id2) }.take(4).map(_._1)
      val expect = short.map(id2 => (id2, cos(vecs(qid), vecs(id2))))
        .sortBy { case (id2, c) => (-c, id2) }
        .zipWithIndex.map { case ((id2, c), i) => (id2, c, i + 1L) }
      val mine = got.filter(_._1 == qid).sortBy(_._4)
        .map(t => (t._2, t._3, t._4))
      assert(mine.toSeq == expect, s"query $qid")
    }
  }

  test("clusterCanonical: highest score wins, ties to lowest id, all members mapped") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "cluster")
    val scored = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (7L, 0.5), (8L, 0.5))
      .toDF("doc_id", "q")
    val got = Dedup.clusterCanonical(clusters, scored, col("doc_id"),
        col("q")).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // cluster 1: 2 and 3 tie at 0.9 -> canonical 2; cluster 7: tie at
    // 0.5 -> canonical 7. Every member row appears with its mapping.
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 0.9), (2L, 1L, 2L, 0.9), (3L, 1L, 2L, 0.9),
      (7L, 7L, 7L, 0.5), (8L, 7L, 7L, 0.5)))
  }
}
