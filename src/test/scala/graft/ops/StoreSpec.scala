package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Round-6 persisted-store + native-expression specs:
  *  - SketchStore: write + append + merged read is byte-identical to
  *    sketching the union corpus directly (the merge-exactness claim the
  *    qd73/qd74 oracles also pin);
  *  - LexIndex: the partition-pruned BM25 probe matches an independent
  *    in-memory reference, and the probe plan really prunes;
  *  - ShingleWinnowMd5: the native single-pass winnow is byte-identical
  *    to the composed window-algebra form;
  *  - DedupIndex cluster-map lifecycle: coverage-based staleness detects
  *    appends/edits and refreshClusterMap rebuilds exactly when stale;
  *  - Multimodal.videoHeader: real MP4 box-walk metadata from
  *    synthesized container bytes, stub fallback only for non-ISO bytes.
  */
class StoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def docs = Tables.load(spark, sf, "documents")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  // md5-nibble half split — doc_id PARITY correlates with `source` in
  // the testdata, so a parity split would give each source a one-sided
  // batch and the store merge would never combine cross-batch state
  private def half(lo: Boolean) = {
    val nibble = conv(
      substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
      .cast("int")
    docs.filter(if (lo) nibble < 8 else nibble >= 8)
  }

  test("HLL sketch store: write + append + merged read == direct union sketch") {
    def toks(lo: Boolean) = half(lo)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w"))
    val all = docs
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w"))
    val path = tmp("st_hll")
    SketchStore.writeHll(toks(true), col("source"), col("w"), path)
    SketchStore.appendHll(toks(false), col("source"), col("w"), path)
    val got = SketchStore.readHllProfile(spark, path)
      .orderBy("grp").collect().toSeq
    val want = Sketches.hllDistinctFast(all, col("source"), col("w"))
      .orderBy("grp").collect().toSeq
    assert(got == want)
    // at least one group stored partials from BOTH batches, so the
    // read-time register max-merge genuinely combined cross-batch state
    val partials = spark.read.parquet(s"$path/hll")
      .groupBy("grp").count().collect()
    assert(partials.forall(_.getLong(1) <= 2L))
    assert(partials.exists(_.getLong(1) == 2L))
  }

  test("CMS sketch store: width sidecar pins shape; merged == direct") {
    def words(lo: Boolean) = half(lo)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val all = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val path = tmp("st_cms")
    SketchStore.writeCms(words(true), col("w"), width = 512, path)
    assert(SketchStore.cmsWidth(spark, path) == 512)
    SketchStore.appendCms(words(false), col("w"), path)
    val got = SketchStore.readCms(spark, path)
      .orderBy("row", "bucket").collect().toSeq
    val want = Sketches.cmsSketch(all, col("w"), width = 512)
      .orderBy("row", "bucket").collect().toSeq
    assert(got == want)
    // probe through the store (never-under on a known-present term)
    val probes = spark.createDataFrame(Seq(Tuple1("the"), Tuple1("zzzznope")))
      .toDF("term")
    val est = SketchStore.probeCms(spark, path, probes, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = all.filter(col("w") === "the").count()
    assert(est("the") >= exact)
    assert(est("zzzznope") >= 0L)
  }

  test("BM25 index append: probe equals a single whole-corpus build") {
    val whole = tmp("st_bm25w")
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), whole)
    val inc = tmp("st_bm25i")
    // split by a doc_id content hash so both batches carry every term
    val nib = conv(substring(md5(col("doc_id").cast("string")), 1, 1),
      16, 10).cast("int")
    LexIndex.writeBm25Index(docs.filter(nib < 8), col("doc_id"),
      col("text"), inc)
    LexIndex.appendBm25Index(docs.filter(nib >= 8), col("doc_id"),
      col("text"), inc)
    // merged stats are exact sums — identical either way
    assert(LexIndex.readStats(spark, whole).collect().toSeq ==
      LexIndex.readStats(spark, inc).collect().toSeq)
    val termsDf = spark.createDataFrame(
      Seq("spark", "merge", "window", "dup").map(Tuple1(_))).toDF("term")
    def top(path: String) = LexIndex
      .bm25TopKIndexed(spark, path, termsDf, col("term"), k = 10)
      .orderBy(col("score_e4").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(inc) == top(whole))
  }

  test("BM25 index probe matches the in-memory integer-exact reference") {
    val path = tmp("st_bm25")
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), path)
    val terms = Seq("spark", "merge", "window", "dup")
    val termsDf = spark.createDataFrame(terms.map(Tuple1(_))).toDF("term")
    val got = LexIndex
      .bm25TopKIndexed(spark, path, termsDf, col("term"), k = 10)
      .orderBy(col("score_e4").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // independent reference: same tokenizer (lower + \S+ runs), same
    // floored-contribution arithmetic, computed driver-side
    val corpus = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        "\\S+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    val n = corpus.length.toDouble
    val avgdl = corpus.map(_._2.length.toLong).sum.toDouble / n
    val dfByTerm = terms.map(t =>
      t -> corpus.count(_._2.contains(t)).toDouble).toMap
    val scored = corpus.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val df = dfByTerm(t)
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          Some(math.floor(idf * tf * 2.2 /
            (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 10000.0).toLong)
        }
      }
      if (contribs.isEmpty) None else Some(id -> contribs.sum)
    }
    val want = scored.sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    assert(got == want)
  }

  test("BM25 index probe prunes postings partitions to the query's terms") {
    val path = tmp("st_bm25p")
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), path)
    val termsDf = spark.createDataFrame(Seq(Tuple1("spark"))).toDF("term")
    val probe = LexIndex.bm25TopKIndexed(spark, path, termsDf,
      col("term"), k = 5)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.matches("(?s).*PartitionFilters: \\[.*tpfx.*"), p.take(3000))
    // df derives from a window over the SAME pruned rows the scoring
    // consumes: the postings table is scanned exactly once per probe
    assert("/postings".r.findAllIn(p).size == 1, p.take(3000))
    // the FILTERED probe (qd87's shape) keeps the same single pruned
    // scan with the attribute predicate PUSHED beside the prefix
    // pruning — filtered retrieval adds a parquet filter, not a join
    // or a second scan
    val aPath = tmp("st_bm25pf")
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), aPath,
      attrs = Seq(pmod(col("doc_id"), lit(2)).cast("int").as("flag")))
    val pf = LexIndex.bm25TopKIndexed(spark, aPath, termsDf,
        col("term"), k = 5, attrFilter = Some(col("flag") === 0))
      .queryExecution.executedPlan.toString
    assert(pf.matches("(?s).*PartitionFilters: \\[.*tpfx.*"), pf.take(3000))
    assert(pf.matches("(?s).*PushedFilters: \\[.*flag.*"), pf.take(3000))
    assert("/postings".r.findAllIn(pf).size == 1, pf.take(3000))
  }

  test("native md5 winnow is byte-identical to the composed window form") {
    for ((k, w) <- Seq((5, 4), (4, 5), (2, 3))) {
      val a = TextAnalysis.winnowFingerprintsPortable(docs, col("doc_id"),
          col("text"), k, w)
        .orderBy("doc_id", "pos", "fp").collect().toSeq
      val b = TextAnalysis.winnowFingerprintsComposed(docs, col("doc_id"),
          col("text"), k, w)
        .orderBy("doc_id", "pos", "fp").collect().toSeq
      assert(a == b, s"k=$k w=$w: native ${a.size} rows vs composed ${b.size}")
      assert(a.nonEmpty)
    }
  }

  test("native md5 winnow: short docs emit nothing, like the composed form") {
    import spark.implicits._
    // k=4,w=5 needs k+w-1 = 8 tokens for one complete window
    val tiny = Seq((1L, "a b c"), (2L, ""), (3L, "t1 t2 t3 t4 t5 t6 t7"),
      (4L, "t1 t2 t3 t4 t5 t6 t7 t8")).toDF("doc_id", "text")
    val native = TextAnalysis.winnowFingerprintsPortable(tiny, col("doc_id"),
      col("text"), k = 4, w = 5)
    val composed = TextAnalysis.winnowFingerprintsComposed(tiny, col("doc_id"),
      col("text"), k = 4, w = 5)
    assert(native.orderBy("doc_id", "pos").collect().toSeq ==
      composed.orderBy("doc_id", "pos").collect().toSeq)
    assert(native.filter(col("doc_id") =!= 4L).count() == 0)
    assert(native.filter(col("doc_id") === 4L).count() == 1)
  }

  test("cluster-map lifecycle: coverage staleness + refresh-only-when-stale") {
    import spark.implicits._
    val corpusA = Seq((1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "gamma delta")).toDF("doc_id", "text")
    val corpusB = corpusA.unionByName(
      Seq((4L, "gamma delta")).toDF("doc_id", "text"))
    def sig = concat(col("doc_id").cast("string"), lit(":"), col("text"))
    def pairsOf(c: org.apache.spark.sql.DataFrame) =
      Dedup.ngramJaccardPairs(c, col("doc_id"), lit("all"), col("text"),
        threshold = 0.8, maxDocFreq = 256)
    val path = tmp("st_clmap")
    var builds = 0
    // no coverage yet -> stale by definition -> first refresh builds
    assert(DedupIndex.refreshClusterMap(corpusA, sig, path,
      col("doc_a"), col("doc_b")) { builds += 1; pairsOf(corpusA) })
    assert(builds == 1)
    // same corpus -> fresh; the by-name pair generator must NOT run
    assert(!DedupIndex.refreshClusterMap(corpusA, sig, path,
      col("doc_a"), col("doc_b")) { builds += 1; pairsOf(corpusA) })
    assert(builds == 1)
    // appended doc -> stale -> refresh rebuilds and covers the new corpus
    assert(DedupIndex.clusterMapIsStale(spark, corpusB, sig, path))
    assert(DedupIndex.refreshClusterMap(corpusB, sig, path,
      col("doc_a"), col("doc_b")) { builds += 1; pairsOf(corpusB) })
    assert(builds == 2)
    assert(!DedupIndex.clusterMapIsStale(spark, corpusB, sig, path))
    val clusters = DedupIndex.readClusterMap(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(4L) == 3L) // new doc joined doc 3's family
    // content EDIT (same ids) is detected because sig hashes the text
    val edited = corpusB.withColumn("text",
      when(col("doc_id") === 1L, lit("edited text")).otherwise(col("text")))
    assert(DedupIndex.clusterMapIsStale(spark, edited, sig, path))
  }

  // ---- MP4 / QuickTime box-walk fixtures ----

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  private def mp4Fixture: Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(1) ++ "isom".getBytes("US-ASCII"))
    // mvhd v0: version/flags, creation, modification, timescale=1000,
    // duration=90000 -> 90_000 ms
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(90000))
    // tkhd v0: 84-byte payload, width 1920.0 / height 1080.0 in 16.16
    val tkhd = box("tkhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(90000) ++
        new Array[Byte](8) ++ new Array[Byte](8) ++ // reserved+layer/alt/vol
        new Array[Byte](36) ++                      // matrix
        be32(1920L << 16) ++ be32(1080L << 16))
    // stsd: entry_count 1, one 16-byte sample entry with fourcc avc1
    val stsd = box("stsd",
      be32(0) ++ be32(1) ++
        (be32(16) ++ "avc1".getBytes("US-ASCII") ++ new Array[Byte](8)))
    // stsz: sample_size 0, sample_count 2400
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(2400))
    val stbl = box("stbl", stsd ++ stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }

  test("videoHeader: real duration/codec/dimensions/frames from MP4 boxes") {
    val meta = Multimodal.videoHeader(mp4Fixture)
    assert(meta.contains(Multimodal.MediaMeta("mp4:avc1", 1920, 1080,
      2400, 90000L)))
    // jdkDecoder routes MP4 bytes through the real parser
    assert(Multimodal.jdkDecoder(mp4Fixture) ==
      Multimodal.MediaMeta("mp4:avc1", 1920, 1080, 2400, 90000L))
  }

  test("videoHeader: header-only container falls back to trak count; non-ISO bytes chain to stub") {
    // moov with mvhd + two sample-table-less traks
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(1200))
    val bareTrak = box("trak", Array.emptyByteArray)
    val hdrOnly = box("ftyp", "qt  ".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", mvhd ++ bareTrak ++ bareTrak)
    val meta = Multimodal.videoHeader(hdrOnly)
    assert(meta.contains(Multimodal.MediaMeta("mp4", 0, 0, 2, 2000L)))
    // a RIFF shell with no hdrl header list satisfies NO parser: every
    // videoHeader/aviHeader/mkvHeader returns None and the chain stubs
    val avi = "RIFF".getBytes("US-ASCII") ++ be32(128) ++
      "AVI LIST".getBytes("US-ASCII") ++ new Array[Byte](64)
    assert(Multimodal.videoHeader(avi).isEmpty)
    assert(Multimodal.aviHeader(avi).isEmpty)
    assert(Multimodal.videoHeader("garbage".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.jdkDecoder(avi) == Multimodal.stubDecoder(avi))
  }

  test("videoHeader: truncated mvhd/tkhd payloads ending at the buffer edge never throw") {
    // an mvhd whose (empty) payload ends EXACTLY at the buffer end:
    // p == bytes.length, so any version-byte read before the length
    // guard is an ArrayIndexOutOfBoundsException — the corrupt shape a
    // 100 TB binary scan will contain
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(1) ++ "isom".getBytes("US-ASCII"))
    val emptyMvhd = ftyp ++ box("moov", box("mvhd", Array.emptyByteArray))
    assert(Multimodal.videoHeader(emptyMvhd)
      .contains(Multimodal.MediaMeta("mp4", 0, 0, 0, 0L)))
    // same for tkhd: a trak with a VALID sample table (so the tkhd
    // dimension read genuinely executes) whose empty tkhd is the last
    // box in the file
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      (be32(16) ++ "avc1".getBytes("US-ASCII") ++ new Array[Byte](8)))
    val mdia = box("mdia", box("minf", box("stbl", stsd)))
    val emptyTkhd = ftyp ++
      box("moov", box("trak", mdia ++ box("tkhd", Array.emptyByteArray)))
    assert(Multimodal.videoHeader(emptyTkhd)
      .contains(Multimodal.MediaMeta("mp4:avc1", 0, 0, 1, 0L)))
    // short (< v0 minimum) but non-empty payloads fall through too
    val shortMvhd = ftyp ++ box("moov", box("mvhd", be32(0) ++ be32(0)))
    assert(Multimodal.videoHeader(shortMvhd)
      .contains(Multimodal.MediaMeta("mp4", 0, 0, 0, 0L)))
    // the decoder chain routes them to the real parser without throwing
    assert(Multimodal.jdkDecoder(emptyMvhd).format == "mp4")
  }

  // ---- RIFF / AVI fixtures (little-endian) ----

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val base = id.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++
      payload
    if (payload.length % 2 == 1) base :+ 0.toByte else base
  }

  private def riffList(typ: String, children: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("US-ASCII") ++ children)

  test("aviHeader: real frames/codec/dimensions/duration from RIFF chunks") {
    // avih: 33333 µs/frame, 750 total frames, 640x480
    val avih = riffChunk("avih",
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(750) ++
        le32(0) ++ le32(1) ++ le32(0) ++ le32(640) ++ le32(480) ++
        new Array[Byte](16))
    // one audio stream BEFORE the video stream: the codec pick must
    // skip non-vids strh entries
    val auds = riffList("strl", riffChunk("strh",
      "audspcm ".getBytes("US-ASCII") ++ new Array[Byte](48)))
    val vids = riffList("strl", riffChunk("strh",
      "vidsmjpg".getBytes("US-ASCII") ++ new Array[Byte](48)))
    val hdrl = riffList("hdrl", avih ++ auds ++ vids)
    val fixture = "RIFF".getBytes("US-ASCII") ++
      le32((4 + hdrl.length).toLong) ++ "AVI ".getBytes("US-ASCII") ++ hdrl
    val expected = Multimodal.MediaMeta("avi:mjpg", 640, 480, 750,
      750L * 33333L / 1000L)
    assert(Multimodal.aviHeader(fixture).contains(expected))
    assert(Multimodal.jdkDecoder(fixture) == expected)
    // ISO walk must NOT claim RIFF bytes (and vice versa: AVI walk
    // rejects the MP4 fixture)
    assert(Multimodal.videoHeader(fixture).isEmpty)
    assert(Multimodal.aviHeader(mp4Fixture).isEmpty)
  }

  // ---- EBML / Matroska fixtures ----

  private def ebmlId(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (n - 1 to 0 by -1).map(i => ((id >> (8 * i)) & 0xff).toByte).toArray
  }

  // 2-byte size form (0x40xx): valid for payloads up to 16382 bytes
  private def ebml(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ Array((0x40 | (payload.length >> 8)).toByte,
      (payload.length & 0xff).toByte) ++ payload

  test("mkvHeader: real duration/codec/dimensions from EBML elements") {
    val hdr = ebml(0x1A45DFA3L, Array.emptyByteArray)
    val info = ebml(0x1549A966L,
      ebml(0x2AD7B1L, Array(0x0f.toByte, 0x42.toByte, 0x40.toByte)) ++
        ebml(0x4489L, // Duration 120000.0f ticks of 1 ms -> 120 s
          be32(java.lang.Float.floatToIntBits(120000.0f).toLong &
            0xffffffffL)))
    val videoTrack = ebml(0xAEL,
      ebml(0x83L, Array(1.toByte)) ++
        ebml(0x86L, "V_MPEG4/ISO/AVC".getBytes("US-ASCII")) ++
        ebml(0xE0L,
          ebml(0xB0L, Array(0x05.toByte, 0x00.toByte)) ++ // 1280
            ebml(0xBAL, Array(0x02.toByte, 0xd0.toByte)))) // 720
    // a non-video track first: codec pick must skip TrackType != 1
    val audioTrack = ebml(0xAEL,
      ebml(0x83L, Array(2.toByte)) ++
        ebml(0x86L, "A_OPUS".getBytes("US-ASCII")))
    val tracks = ebml(0x1654AE6BL, audioTrack ++ videoTrack)
    val fixture = hdr ++ ebml(0x18538067L, info ++ tracks)
    val expected = Multimodal.MediaMeta("mkv:V_MPEG4/ISO/AVC", 1280, 720,
      2, 120000L)
    assert(Multimodal.mkvHeader(fixture).contains(expected))
    assert(Multimodal.jdkDecoder(fixture) == expected)
    // an unknown-length Segment (all-ones size varint, the live-muxed
    // form) extends to the end of the payload and still parses
    val streamed = hdr ++ ebmlId(0x18538067L) ++ Array(0xff.toByte) ++
      info ++ tracks
    assert(Multimodal.mkvHeader(streamed).contains(expected))
    // foreign containers are rejected, not misparsed
    assert(Multimodal.mkvHeader(mp4Fixture).isEmpty)
    assert(Multimodal.mkvHeader("garbage".getBytes("US-ASCII")).isEmpty)
  }

  // ---- round-7 lifecycle specs: compaction / tombstones / replay ----

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def srcToks(lo: Boolean) = half(lo)
    .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w"))

  private val docLen = length(col("text")).cast("long")

  test("sketch store compact: merged profiles unchanged, partials fold to one row-set") {
    val path = tmp("st_cmp")
    SketchStore.writeHll(srcToks(true), col("source"), col("w"), path)
    SketchStore.appendHll(srcToks(false), col("source"), col("w"), path)
    SketchStore.writeCms(srcToks(true), col("w"), 128, path)
    SketchStore.appendCms(srcToks(false), col("w"), path)
    SketchStore.writeHist(half(true), col("source"), docLen, path)
    SketchStore.appendHist(half(false), col("source"), docLen, path)
    val qs = Seq(0.5, 0.9)
    val before = (rows(SketchStore.readHllProfile(spark, path)),
      rows(SketchStore.readCms(spark, path)),
      rows(SketchStore.readHistProfile(spark, path, qs)))
    SketchStore.compact(spark, path)
    assert(rows(SketchStore.readHllProfile(spark, path)) == before._1)
    assert(rows(SketchStore.readCms(spark, path)) == before._2)
    assert(rows(SketchStore.readHistProfile(spark, path, qs)) == before._3)
    // folded: exactly one partial row per group / counter cell
    assert(spark.read.parquet(s"$path/hll").groupBy("grp").count()
      .filter(col("count") > 1).count() == 0)
    assert(spark.read.parquet(s"$path/cms").groupBy("row", "bucket")
      .count().filter(col("count") > 1).count() == 0)
    assert(spark.read.parquet(s"$path/hist").groupBy("grp", "bucket")
      .count().filter(col("count") > 1).count() == 0)
  }

  test("sketch store tombstones: HLL group drop; CMS/hist negative partials subtract exactly") {
    val path = tmp("st_del")
    val allToks = docs.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    SketchStore.writeHll(allToks, col("source"), col("w"), path)
    SketchStore.writeCms(allToks, col("w"), 128, path)
    SketchStore.writeHist(docs, col("source"), docLen, path)
    // delete half(false)'s contribution: merged counters must equal a
    // store built from half(true) alone (linear-sketch subtraction)
    SketchStore.deleteCms(srcToks(false), col("w"), path)
    SketchStore.deleteHist(half(false), col("source"), docLen, path)
    val ref = tmp("st_delref")
    SketchStore.writeCms(srcToks(true), col("w"), 128, ref)
    SketchStore.writeHist(half(true), col("source"), docLen, ref)
    def nonZero(df: org.apache.spark.sql.DataFrame) =
      rows(df.filter(col("cnt") =!= 0))
    assert(nonZero(SketchStore.readCms(spark, path)) ==
      nonZero(SketchStore.readCms(spark, ref)))
    val qs = Seq(0.5, 0.9)
    assert(rows(SketchStore.readHistProfile(spark, path, qs)) ==
      rows(SketchStore.readHistProfile(spark, ref, qs)))
    // HLL: group tombstone hides the group; compact makes it physical
    val g = docs.select(col("source")).distinct()
      .orderBy(col("source")).head().getString(0)
    val keep = rows(SketchStore.readHllProfile(spark, path)
      .filter(col("grp") =!= g))
    SketchStore.deleteHllGroups(spark, path,
      spark.createDataFrame(Seq(Tuple1(g))).toDF("g"), col("g"))
    assert(rows(SketchStore.readHllProfile(spark, path)) == keep)
    SketchStore.compact(spark, path)
    assert(rows(SketchStore.readHllProfile(spark, path)) == keep)
    assert(spark.read.parquet(s"$path/hll")
      .filter(col("grp") === g).count() == 0)
    assert(!StoreFiles.exists(spark, s"$path/hll_tombstones"))
    assert(nonZero(SketchStore.readCms(spark, path)) ==
      nonZero(SketchStore.readCms(spark, ref)))
  }

  test("BM25 tombstone delete: probe equals a from-scratch build without the docs; compact preserves") {
    val full = tmp("st_bmdel")
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), full)
    val nib = conv(substring(md5(col("doc_id").cast("string")), 1, 1),
      16, 10).cast("int")
    val delIds = docs.filter(nib >= 12).select(col("doc_id"))
    LexIndex.deleteFromBm25Index(spark, full, delIds, col("doc_id"))
    val ref = tmp("st_bmdelref")
    LexIndex.writeBm25Index(docs.filter(nib < 12), col("doc_id"),
      col("text"), ref)
    def stats(p: String) = LexIndex.readStats(spark, p).collect().toSeq
    assert(stats(full) == stats(ref))
    val termsDf = spark.createDataFrame(
      Seq("spark", "merge", "window", "dup").map(Tuple1(_))).toDF("term")
    def top(p: String) = LexIndex
      .bm25TopKIndexed(spark, p, termsDf, col("term"), k = 10)
      .orderBy(col("score_e4").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(full) == top(ref))
    // idempotent: re-deleting the same ids changes nothing
    LexIndex.deleteFromBm25Index(spark, full, delIds, col("doc_id"))
    assert(stats(full) == stats(ref))
    // compact: physical drop, one canonical stats row, probe unchanged
    LexIndex.compactBm25Index(spark, full)
    assert(top(full) == top(ref))
    assert(stats(full) == stats(ref))
    assert(spark.read.parquet(s"$full/stats").count() == 1)
    assert(!StoreFiles.exists(spark, s"$full/tombstones"))
    assert(spark.read.parquet(s"$full/postings")
      .join(delIds, Seq("doc_id"), "left_semi").count() == 0)
  }

  test("positional index: phrase probe == in-memory twin; prunes; tombstones + compact") {
    val path = tmp("st_phrase")
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), path,
      positions = true)
    val phrase = Seq("row", "column", "sort")
    def probe() = LexIndex.phraseTopKIndexed(spark, path, phrase, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def twin(dd: org.apache.spark.sql.DataFrame) =
      TextAnalysis.phraseMatches(dd, col("doc_id"), col("text"), phrase)
        .orderBy(col("n_matches").desc, col("doc_id")).limit(100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probe().nonEmpty && probe() == twin(docs))
    // the probe prunes the positions read to the phrase's own prefixes
    val p = LexIndex.phraseTopKIndexed(spark, path, phrase, 10)
      .queryExecution.executedPlan.toString
    assert(p.matches("(?s).*PartitionFilters: \\[.*tpfx.*"), p.take(3000))
    // tombstoned docs drop from phrase results; compact preserves and
    // physically removes their position rows
    LexIndex.deleteFromBm25Index(spark, path,
      half(lo = true).select(col("doc_id")), col("doc_id"))
    assert(probe() == twin(half(lo = false)))
    LexIndex.compactBm25Index(spark, path)
    assert(probe() == twin(half(lo = false)))
    assert(spark.read.parquet(s"$path/positions")
      .join(half(lo = true).select(col("doc_id")), Seq("doc_id"),
        "left_semi").count() == 0)
  }

  test("attribute-filtered phrase probe == index of allowed docs; attrs survive append + replay") {
    import spark.implicits._
    val attr = Seq(pmod(col("doc_id"), lit(2)).cast("int").as("flag"))
    val phrase = Seq("row", "column", "sort")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // attr-carrying store assembled by build + append; the filtered
    // probe must equal a probe of an index holding ONLY the allowed
    // docs (position rows of filtered-out docs vanish in the scan;
    // n_matches is per-doc, so nothing else can change)
    val path = tmp("st_phattr")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      path, positions = true, attrs = attr)
    LexIndex.appendBm25Index(half(lo = false), col("doc_id"),
      col("text"), path, positions = true, attrs = attr)
    val ref = tmp("st_phref")
    LexIndex.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), ref, positions = true)
    val want = rows(LexIndex.phraseTopKIndexed(spark, ref, phrase,
      k = 100))
    val got = rows(LexIndex.phraseTopKIndexed(spark, path, phrase,
      k = 100, attrFilter = Some(col("flag") === 0)))
    assert(got == want && got.nonEmpty)
    // the batch phrase probe filters identically
    val batch = phrase.zipWithIndex
      .map { case (w, i) => (5L, w, i.toLong) }
      .toDF("query_id", "term", "off")
    val gotBatch = LexIndex.phraseKnnJoinIndexed(spark, path, batch,
        col("query_id"), col("term"), col("off"), k = 100,
        attrFilter = Some(col("flag") === 0))
      .select(col("doc_id"), col("n_matches"))
    assert(rows(gotBatch) == want)
    // batch-keyed stream with attrs: an exactly-once replay keeps the
    // filtered probe single-counted
    val bk = tmp("st_phbk")
    LexIndex.writeBm25IndexBatchKeyed(half(lo = true), col("doc_id"),
      col("text"), bk, positions = true, attrs = attr)
    LexIndex.putBm25Batch(half(lo = false), col("doc_id"), col("text"),
      bk, 0L, attrs = attr)
    LexIndex.putBm25Batch(half(lo = false), col("doc_id"), col("text"),
      bk, 0L, attrs = attr) // replay
    assert(rows(LexIndex.phraseTopKIndexed(spark, bk, phrase, k = 100,
      attrFilter = Some(col("flag") === 0))) == want)
  }

  test("batch-keyed BM25 index: replays rewrite; probes match a whole-corpus build; folds keep layout") {
    import spark.implicits._
    val path = tmp("st_bm25bk"); val ref = tmp("st_bm25ref")
    val base = half(lo = true); val batch = half(lo = false)
    val b1 = batch.filter(col("doc_id") % 2 === 0)
    val b2 = batch.filter(col("doc_id") % 2 =!= 0)
    LexIndex.writeBm25IndexBatchKeyed(base, col("doc_id"), col("text"),
      path, positions = true)
    LexIndex.putBm25Batch(b1, col("doc_id"), col("text"), path, 0L)
    LexIndex.putBm25Batch(b2, col("doc_id"), col("text"), path, 1L)
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), ref,
      positions = true)
    val terms = Seq("table", "hash", "merge").map(Tuple1(_)).toDF("term")
    def bm(p: String) = LexIndex.bm25TopKIndexed(spark, p, terms,
        col("term"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def ph(p: String) = LexIndex.phraseTopKIndexed(spark, p,
        Seq("row", "column", "sort"), k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // base + streamed batches probe exactly like one whole-corpus build
    assert(bm(path) == bm(ref) && ph(path) == ph(ref))
    // a REPLAY of the last batch rewrites its partitions — posting rows
    // and stats sums stay single-counted
    LexIndex.putBm25Batch(b2, col("doc_id"), col("text"), path, 1L)
    assert(bm(path) == bm(ref) && ph(path) == ph(ref))
    assert(LexIndex.readStats(spark, path).head().getLong(0) ==
      LexIndex.readStats(spark, ref).head().getLong(0))
    // folding committed batches keeps probes and the keyed layout
    LexIndex.compactBm25Batches(spark, path, keepFrom = 1L)
    assert(bm(path) == bm(ref) && ph(path) == ph(ref))
    assert(spark.read.parquet(s"$path/postings").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-1L, 1L))
    // tombstone delete + FULL compact: equals a plain build without the
    // deleted docs, layout still batch-keyed
    LexIndex.deleteFromBm25Index(spark, path, b2.select(col("doc_id")),
      col("doc_id"))
    LexIndex.compactBm25Index(spark, path)
    val ref2 = tmp("st_bm25ref2")
    LexIndex.writeBm25Index(base.unionByName(b1), col("doc_id"),
      col("text"), ref2, positions = true)
    assert(bm(path) == bm(ref2) && ph(path) == ph(ref2))
    assert(spark.read.parquet(s"$path/postings").select("batch_id")
      .distinct().as[Long].collect().toSeq == Seq(-1L))
  }

  test("dedup index tombstones: deleted docs stop blocking probes; compact drops their rows") {
    import spark.implicits._
    val path = tmp("st_dxdel")
    val corpus = Seq((1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    DedupIndex.writeExactIndex(corpus, col("doc_id"), col("text"), path)
    DedupIndex.writeMinhashIndex(corpus, col("doc_id"), col("text"), path)
    val batch = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    def fresh() = DedupIndex.newOnly(spark, batch, col("doc_id"),
      col("text"), path).count()
    def nearHits() = DedupIndex.nearDupAgainstIndex(spark, batch,
      col("doc_id"), col("text"), path, minEstimate = 0.8)
      .filter(col("index_doc") === 1L).count()
    assert(fresh() == 0 && nearHits() == 1) // doc 1 blocks its twin
    DedupIndex.deleteDocs(spark, path,
      Seq(Tuple1(1L)).toDF("doc_id"), col("doc_id"))
    assert(fresh() == 1 && nearHits() == 0) // tombstone unblocks it
    // the tombstone anti-join must not cost the probe its partition
    // pruning: the scan still prunes to the batch's own fp prefixes
    val p = DedupIndex.newOnly(spark, batch, col("doc_id"), col("text"),
      path).queryExecution.executedPlan.toString
    assert(p.matches("(?s).*PartitionFilters: \\[.*pfx.*"), p.take(3000))
    DedupIndex.compact(spark, path)
    assert(fresh() == 1 && nearHits() == 0) // physical drop, same answer
    for (sub <- Seq("exact", "lanes", "bands"))
      assert(spark.read.parquet(s"$path/$sub")
        .filter(col("doc_id") === 1L).count() == 0, sub)
    assert(!StoreFiles.exists(spark, s"$path/tombstones"))
  }

  test("ANN index lifecycle: appends assign with the stored model; tombstones + compact") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    val a = e.filter(nib < 8); val b = e.filter(nib >= 8)
    // LSH: hyperplanes re-derive from the meta sidecar, so an appended
    // index probes byte-identically to a whole-corpus build
    val lshApp = tmp("st_lshapp"); val lshWhole = tmp("st_lshw")
    AnnIndex.writeLshIndex(a, col("vec_id"), col("embedding"), lshApp,
      numPlanes = 4)
    AnnIndex.appendLshIndex(b, col("vec_id"), col("embedding"), lshApp)
    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"), lshWhole,
      numPlanes = 4)
    val q = e.filter(col("vec_id") === 0L)
      .select(Similarity.l2Normalize(col("embedding")).as("qv"))
    def lshTop(p: String) = AnnIndex
      .queryLshIndex(spark, p, q, k = 5, probeFlips = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSeq
    assert(lshTop(lshApp) == lshTop(lshWhole))
    // IVF: the STORED centroids (a frozen model from the first build)
    // assign appended vectors; probes equal an in-memory assignment of
    // the union corpus under the same centroids
    val ivf = tmp("st_ivfapp")
    AnnIndex.writeIvfIndex(a, col("vec_id"), col("embedding"), ivf,
      nList = 8)
    AnnIndex.appendIvfIndex(b, col("vec_id"), col("embedding"), ivf)
    val cents = Similarity.ivfCentroids(a, col("vec_id"),
      col("embedding"), nList = 8)
    val q5 = e.filter(col("vec_id") < 5)
    def storedTop() = AnnIndex.ivfKnnJoinIndexed(spark, ivf, q5,
        col("vec_id"), col("embedding"), k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    def memTop(corpus: org.apache.spark.sql.DataFrame) = Similarity
      .ivfKnnJoinWith(corpus, col("vec_id"), col("embedding"), q5,
        col("vec_id"), col("embedding"), k = 5, cents, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(storedTop() == memTop(e))
    // tombstone: the deleted vector vanishes from every result set
    AnnIndex.deleteVecs(spark, ivf,
      Seq(Tuple1(0L)).toDF("vec_id"), col("vec_id"))
    val without0 = memTop(e.filter(col("vec_id") =!= 0L))
    assert(storedTop() == without0)
    // compact: physical drop, probes unchanged, sidecar cleared
    AnnIndex.compactAnnIndex(spark, ivf)
    assert(storedTop() == without0)
    assert(spark.read.parquet(s"$ivf/index")
      .filter(col("vec_id") === 0L).count() == 0)
    assert(!StoreFiles.exists(spark, s"$ivf/tombstones"))
  }

  test("IVF-PQ index: stored probe == in-memory; pruning; all-cells rerank == truth; tombstones") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val path = tmp("st_ivfpq")
    AnnIndex.writeIvfPqIndex(e, col("vec_id"), col("embedding"), path,
      nList = 8, numSub = 8, codebookSize = 8, refineIters = 1)
    val q = e.filter(col("vec_id") === 0L).select(col("embedding"))
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq
    // the stored artifact serves the in-memory derivation byte-for-byte
    assert(top(AnnIndex.queryIvfPqIndex(spark, path, q, k = 5,
        nProbe = 3)) ==
      top(Similarity.ivfPqTopK(e, col("vec_id"), col("embedding"), q,
        k = 5, nList = 8, nProbe = 3, numSub = 8, codebookSize = 8,
        refineIters = 1)))
    // the probe prunes the stored codes to the probed cell partitions
    val p = AnnIndex.queryIvfPqIndex(spark, path, q, k = 5, nProbe = 3)
      .queryExecution.executedPlan.toString
    assert(p.matches("(?s).*PartitionFilters: \\[.*cell.*"), p.take(3000))
    // probing ALL cells with a corpus-sized rerank makes the two-stage
    // shape EXACT: every vector is shortlisted, the rerank is the true
    // cosine — must equal brute-force knnJoin truth
    val q5 = e.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSeq
    assert(rows(AnnIndex.ivfPqKnnJoinIndexed(spark, path, q5,
        col("vec_id"), col("embedding"), k = 5, nProbe = 8,
        rerank = 1000)) ==
      rows(Similarity.knnJoin(e, col("vec_id"), col("embedding"), q5,
        col("vec_id"), col("embedding"), k = 5)))
    // append under the STORED (frozen) model: build on one half, append
    // the other — the all-cells corpus-rerank identity must still hold
    // over the union (it is model-independent, so it pins exactly that
    // the appended rows landed complete and unduplicated)
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    val path2 = tmp("st_ivfpq2")
    AnnIndex.writeIvfPqIndex(e.filter(nib < 8), col("vec_id"),
      col("embedding"), path2, nList = 8, numSub = 8, codebookSize = 8,
      refineIters = 1)
    AnnIndex.appendIvfPqIndex(e.filter(nib >= 8), col("vec_id"),
      col("embedding"), path2)
    assert(rows(AnnIndex.ivfPqKnnJoinIndexed(spark, path2, q5,
        col("vec_id"), col("embedding"), k = 5, nProbe = 8,
        rerank = 1000)) ==
      rows(Similarity.knnJoin(e, col("vec_id"), col("embedding"), q5,
        col("vec_id"), col("embedding"), k = 5)))
    assert(spark.read.parquet(s"$path2/codes").count() == e.count())
    // tombstone: the deleted vector vanishes from the ADC ranking
    AnnIndex.deleteVecs(spark, path,
      Seq(Tuple1(1L)).toDF("vec_id"), col("vec_id"))
    val ranked = AnnIndex.queryIvfPqIndex(spark, path, q, k = 1000,
      nProbe = 8).collect().map(_.getLong(0))
    assert(!ranked.contains(1L) && ranked.length > 1)
    // compact: physical drop, sidecar cleared, probe unchanged
    val before = top(AnnIndex.queryIvfPqIndex(spark, path, q, k = 5,
      nProbe = 3))
    AnnIndex.compactAnnIndex(spark, path)
    assert(top(AnnIndex.queryIvfPqIndex(spark, path, q, k = 5,
      nProbe = 3)) == before)
    assert(spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") === 1L).count() == 0)
    assert(!StoreFiles.exists(spark, s"$path/tombstones"))
  }

  test("batch-keyed IVF index: replayed batches rewrite; compaction keeps the layout") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    val base = e.filter(nib < 8)
    val b1 = e.filter(nib >= 8 && nib < 12)
    val b2 = e.filter(nib >= 12)
    val path = tmp("st_ivfbk")
    AnnIndex.writeIvfIndex(base, col("vec_id"), col("embedding"), path,
      nList = 8, refineIters = 1, batchKeyed = true)
    AnnIndex.putIvfBatch(b1, col("vec_id"), col("embedding"), path, 1L)
    AnnIndex.putIvfBatch(b2, col("vec_id"), col("embedding"), path, 2L)
    val q5 = e.filter(col("vec_id") < 5)
    def stored() = AnnIndex.ivfKnnJoinIndexed(spark, path, q5,
        col("vec_id"), col("embedding"), k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    val full = stored()
    // base + batches probe like an in-memory assignment of the union
    // corpus under the same stored (frozen) model
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy { case (cell, _) => cell }
    assert(full == Similarity
      .ivfKnnJoinWith(e, col("vec_id"), col("embedding"), q5,
        col("vec_id"), col("embedding"), k = 5, cents, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq)
    // a replay REWRITES batch 2's partitions — no duplicate vector rows
    AnnIndex.putIvfBatch(b2, col("vec_id"), col("embedding"), path, 2L)
    assert(stored() == full)
    assert(spark.read.parquet(s"$path/index").count() == e.count())
    // folding committed batches keeps probes and the keyed layout
    AnnIndex.compactIvfBatches(spark, path, keepFrom = 2L)
    assert(stored() == full)
    assert(spark.read.parquet(s"$path/index").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-1L, 2L))
    // the full tombstone compact also preserves the keyed layout
    AnnIndex.compactAnnIndex(spark, path)
    assert(stored() == full)
    assert(spark.read.parquet(s"$path/index").select("batch_id")
      .distinct().as[Long].collect().toSeq == Seq(-1L))
  }

  test("batch-keyed sketch store: replays rewrite (not re-append); committed history folds") {
    val path = tmp("st_bk")
    def put(lo: Boolean, b: Long): Unit = {
      SketchStore.putHllBatch(srcToks(lo), col("source"), col("w"), path, b)
      SketchStore.putCmsBatch(srcToks(lo), col("w"), path, b, 128)
      SketchStore.putHistBatch(half(lo), col("source"), docLen, path, b)
    }
    put(lo = true, 0L); put(lo = false, 1L)
    val qs = Seq(0.5, 0.9)
    def profile() = (rows(SketchStore.readHllProfile(spark, path)),
      rows(SketchStore.readCms(spark, path)),
      rows(SketchStore.readHistProfile(spark, path, qs)))
    val before = profile()
    // the whole point: a replayed batch leaves the store unchanged
    put(lo = false, 1L)
    assert(profile() == before)
    // and the merged profile equals the direct whole-corpus derivation
    val allToks = docs.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    assert(before._1 ==
      rows(Sketches.hllDistinctFast(allToks, col("source"), col("w"))))
    assert(before._2 ==
      rows(Sketches.cmsSketch(allToks, col("w"), width = 128)))
    // fold committed history (batch 0) under -1; batch 1 stays live
    SketchStore.compactBatches(spark, path, keepFrom = 1L)
    assert(profile() == before)
    import spark.implicits._
    assert(spark.read.parquet(s"$path/hll").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-1L, 1L))
    // a replay of the still-uncommitted batch stays idempotent
    put(lo = false, 1L)
    assert(profile() == before)
    // a FULL compact on a batch-keyed store keeps the partitioned
    // layout (everything folds to partition -1), so later per-batch
    // dynamic overwrites still compose
    SketchStore.compact(spark, path)
    assert(profile() == before)
    assert(spark.read.parquet(s"$path/hll").select("batch_id")
      .distinct().as[Long].collect().toSeq == Seq(-1L))
    put(lo = false, 2L) // a later batch still lands cleanly
    assert(spark.read.parquet(s"$path/hll").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-1L, 2L))
  }

  test("batch-keyed LSH index: replays rewrite; probes match a whole-corpus build; folds keep layout") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    val base = e.filter(nib < 8)
    val b1 = e.filter(nib >= 8 && nib < 12)
    val b2 = e.filter(nib >= 12)
    val path = tmp("st_lshbk"); val ref = tmp("st_lshref")
    AnnIndex.writeLshIndex(base, col("vec_id"), col("embedding"), path,
      numPlanes = 6, batchKeyed = true)
    AnnIndex.putLshBatch(b1, col("vec_id"), col("embedding"), path, 0L)
    AnnIndex.putLshBatch(b2, col("vec_id"), col("embedding"), path, 1L)
    // hyperplanes are frozen by construction (deterministic in
    // (num_planes, dim)), so a plain whole-corpus build IS the
    // reference — no model drift between base and batches
    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"), ref,
      numPlanes = 6)
    val q = e.filter(col("vec_id") === 3).select(
      Similarity.l2Normalize(col("embedding")).as("qv"))
    def probe(p: String) = AnnIndex.queryLshIndex(spark, p, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = probe(ref)
    assert(want.nonEmpty && probe(path) == want)
    // a replay REWRITES batch 1's partitions — no duplicate vectors
    AnnIndex.putLshBatch(b2, col("vec_id"), col("embedding"), path, 1L)
    assert(probe(path) == want)
    assert(spark.read.parquet(s"$path/index").count() == e.count())
    // folding committed batches keeps probes and the keyed layout
    AnnIndex.compactLshBatches(spark, path, keepFrom = 1L)
    assert(probe(path) == want)
    assert(spark.read.parquet(s"$path/index").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-1L, 1L))
    // the full tombstone compact also preserves the keyed layout
    AnnIndex.compactAnnIndex(spark, path)
    assert(probe(path) == want)
    assert(spark.read.parquet(s"$path/index").select("batch_id")
      .distinct().as[Long].collect().toSeq == Seq(-1L))
  }

  test("batch-keyed IVF-PQ index: replays rewrite both halves; folds keep layout and rerank pruning") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val nib = conv(substring(md5(col("vec_id").cast("string")), 1, 1),
      16, 10).cast("int")
    val base = e.filter(nib < 8)
    val b1 = e.filter(nib >= 8 && nib < 12)
    val b2 = e.filter(nib >= 12)
    val path = tmp("st_pqbk"); val ref = tmp("st_pqref")
    AnnIndex.writeIvfPqIndex(base, col("vec_id"), col("embedding"), path,
      nList = 8, numSub = 8, codebookSize = 8, refineIters = 1,
      batchKeyed = true)
    AnnIndex.putIvfPqBatch(b1, col("vec_id"), col("embedding"), path, 0L)
    AnnIndex.putIvfPqBatch(b2, col("vec_id"), col("embedding"), path, 1L)
    // reference: the SAME frozen model grown by the plain append path
    // (already spec-pinned) — base + batches must probe identically
    AnnIndex.writeIvfPqIndex(base, col("vec_id"), col("embedding"), ref,
      nList = 8, numSub = 8, codebookSize = 8, refineIters = 1)
    AnnIndex.appendIvfPqIndex(b1, col("vec_id"), col("embedding"), ref)
    AnnIndex.appendIvfPqIndex(b2, col("vec_id"), col("embedding"), ref)
    val q5 = e.filter(col("vec_id") < 5)
    def probe(p: String) = AnnIndex.ivfPqKnnJoinIndexed(spark, p, q5,
        col("vec_id"), col("embedding"), k = 5, nProbe = 3, rerank = 20)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    val want = probe(ref)
    assert(want.nonEmpty && probe(path) == want)
    // a replay REWRITES batch 1's partitions in BOTH halves — no
    // duplicate code rows (ADC) and no duplicate rerank vectors
    AnnIndex.putIvfPqBatch(b2, col("vec_id"), col("embedding"), path, 1L)
    assert(probe(path) == want)
    assert(spark.read.parquet(s"$path/codes").count() == e.count())
    assert(spark.read.parquet(s"$path/vectors").count() == e.count())
    // folding committed batches keeps probes and BOTH keyed layouts
    AnnIndex.compactIvfPqBatches(spark, path, keepFrom = 1L)
    assert(probe(path) == want)
    assert(spark.read.parquet(s"$path/codes").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-1L, 1L))
    assert(spark.read.parquet(s"$path/vectors").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-1L, 1L))
  }

  test("storeStats: listing-only batch counts drive the compaction predicate") {
    val path = tmp("st_stats")
    SketchStore.putCmsBatch(half(lo = true)
        .select(explode(TextAnalysis.tokens(col("text"))).as("w")),
      col("w"), path, 0L, 128)
    SketchStore.putCmsBatch(half(lo = false)
        .select(explode(TextAnalysis.tokens(col("text"))).as("w")),
      col("w"), path, 1L, 128)
    val stats = StoreFiles.storeStats(spark, path)
    val cms = stats.find(_.subStore == "cms").get
    assert(cms.nBatches == 2 && cms.nFiles >= 2)
    assert(StoreFiles.needsBatchCompaction(spark, path, maxBatches = 1))
    assert(!StoreFiles.needsBatchCompaction(spark, path, maxBatches = 2))
    SketchStore.compactBatches(spark, path, keepFrom = 2L)
    val after = StoreFiles.storeStats(spark, path)
      .find(_.subStore == "cms").get
    // everything folded under -1 — the base fold is steady state, not
    // backlog, so it must NOT count toward the batch threshold
    assert(after.nBatches == 0)
    assert(!StoreFiles.needsBatchCompaction(spark, path, maxBatches = 1))
    // post-fold steady state (-1 plus ONE in-flight batch) must not
    // re-trigger a full-store rewrite on every micro-batch
    SketchStore.putCmsBatch(half(lo = true)
        .select(explode(TextAnalysis.tokens(col("text"))).as("w")),
      col("w"), path, 2L, 128)
    assert(!StoreFiles.needsBatchCompaction(spark, path, maxBatches = 1))
    // a missing store reports empty, not an error
    assert(StoreFiles.storeStats(spark, path + "_nope").isEmpty)
    assert(!StoreFiles.needsBatchCompaction(spark, path + "_nope", 1))
  }

  test("synthesized container bytes decode back to their arithmetic truth") {
    // every kind × many ids: the byte walks in reverse must round-trip
    // through the REAL decoders (imageio, sampled-audio, the ISO
    // BMFF/RIFF/EBML walks) to the exact synthParams arithmetic — the
    // in-process half of the qm01 oracle cross-check
    (0L until 100L).foreach { id =>
      val got = Multimodal.jdkDecoder(Multimodal.synthBytes(id))
      assert(got == Multimodal.synthParams(id), s"id=$id got=$got")
    }
    // and the distributed form carries the same bytes
    import spark.implicits._
    val decoded = Multimodal.decodeMeta(
      Multimodal.synthMedia(spark.range(0, 25).toDF("id"), "id"),
      "media_id")
      .collect().map(r => (r.getLong(0),
        Multimodal.MediaMeta(r.getString(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getLong(5)))).toMap
    (0L until 25L).foreach { id =>
      assert(decoded(id) == Multimodal.synthParams(id), s"dist id=$id")
    }
  }

  test("df sidecar tracks live frequencies through append + delete + compact") {
    import spark.implicits._
    val path = tmp("st_df")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      path)
    LexIndex.appendBm25Index(half(lo = false), col("doc_id"), col("text"),
      path)
    // the sidecar's merged sums equal an independent recount of the
    // stored posting lists (one row per (term, doc))
    def sidecar() = spark.read.parquet(s"$path/df")
      .groupBy("term").agg(sum("df").as("df"))
      .filter(col("df") =!= 0L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def recount() = {
      val p0 = spark.read.parquet(s"$path/postings")
      val p = if (!StoreFiles.exists(spark, s"$path/tombstones")) p0
        else p0.join(spark.read.parquet(s"$path/tombstones"),
          Seq("doc_id"), "left_anti")
      p.groupBy("term").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    assert(sidecar() == recount() && sidecar().nonEmpty)
    // delete writes per-term NEGATIVE partials: live df drops without
    // touching the posting rows
    val victims = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"))
    LexIndex.deleteFromBm25Index(spark, path, victims, col("doc_id"))
    assert(sidecar() == recount())
    // compact folds the partials to one canonical row per LIVE term
    LexIndex.compactBm25Index(spark, path)
    assert(sidecar() == recount())
    val partialsPerTerm = spark.read.parquet(s"$path/df")
      .groupBy("term").count().agg(max("count")).head().getLong(0)
    assert(partialsPerTerm == 1L)
  }

  test("legacy stores (no df sidecar) never grow a partial-history df/") {
    import spark.implicits._
    val path = tmp("st_legacy")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      path)
    // simulate a store built before the sidecar existed
    StoreFiles.delete(spark, s"$path/df")
    val terms = Seq("the", "scan").map(Tuple1(_)).toDF("term")
    def probe() = LexIndex.bm25TopKIndexed(spark, path, terms,
      col("term"), k = 10).collect().toSeq
    val beforeAppend = probe()
    // append + delete must NOT create df/ (a partial-history sidecar
    // would silently corrupt every later probe's idf)
    LexIndex.appendBm25Index(half(lo = false), col("doc_id"), col("text"),
      path)
    assert(!StoreFiles.exists(spark, s"$path/df"))
    LexIndex.deleteFromBm25Index(spark, path,
      docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")),
      col("doc_id"))
    assert(!StoreFiles.exists(spark, s"$path/df"))
    // the window fallback keeps probes exactly right: equal to a
    // sidecar-carrying rebuild of the same live corpus
    val refPath = tmp("st_legacy_ref")
    LexIndex.writeBm25Index(docs.filter(col("doc_id") % 7 =!= 0),
      col("doc_id"), col("text"), refPath)
    assert(StoreFiles.exists(spark, s"$refPath/df"))
    val got = probe()
    val want = LexIndex.bm25TopKIndexed(spark, refPath, terms,
      col("term"), k = 10).collect().toSeq
    assert(got == want && got.nonEmpty && beforeAppend != got)
    // one compact UPGRADES the legacy store: the df recount creates
    // the sidecar from the live postings, probes unchanged and now
    // off the window fallback
    LexIndex.compactBm25Index(spark, path)
    assert(StoreFiles.exists(spark, s"$path/df"))
    assert(probe() == want)
  }

  test("needsFileCompaction: plain appends accumulate; the append-time policy folds them") {
    val path = tmp("st_files")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      path)
    // blind plain appends leave one more file per touched prefix
    LexIndex.appendBm25Index(half(lo = false), col("doc_id"), col("text"),
      path)
    assert(StoreFiles.needsFileCompaction(spark, path, maxFilesPerDir = 1))
    assert(!StoreFiles.needsFileCompaction(spark, path,
      maxFilesPerDir = 1000000))
    assert(!StoreFiles.needsFileCompaction(spark, path + "_nope", 1))
    import spark.implicits._
    val terms = Seq("the", "scan").map(Tuple1(_)).toDF("term")
    val want = LexIndex.bm25TopKIndexed(spark, path, terms, col("term"),
      k = 10).collect().toSeq
    // an append carrying the policy compacts in place once over the
    // threshold: files fold to one per prefix, probe results unchanged
    val extra = docs.filter(col("doc_id") === -1L) // empty batch
    LexIndex.appendBm25Index(extra, col("doc_id"), col("text"), path,
      maxFilesPerDir = 1)
    assert(!StoreFiles.needsFileCompaction(spark, path,
      maxFilesPerDir = 300))
    assert(LexIndex.bm25TopKIndexed(spark, path, terms, col("term"),
      k = 10).collect().toSeq == want)
  }

  test("serving-batch guards fail loudly, naming the ceiling") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val path = tmp("st_guard")
    AnnIndex.writeIvfPqIndex(e, col("vec_id"), col("embedding"), path,
      nList = 4, numSub = 8, codebookSize = 8, refineIters = 0)
    val err = intercept[IllegalArgumentException] {
      AnnIndex.ivfPqKnnJoinIndexed(spark, path,
        e.filter(col("vec_id") < 2), col("vec_id"), col("embedding"),
        k = 5, nProbe = 2, rerank = (AnnIndex.MaxShortlistIds / 2).toInt + 1)
    }
    assert(err.getMessage.contains("serving-batch ceiling")
      && err.getMessage.contains("split the query batch"))
    val lexPath = tmp("st_guard_lex")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      lexPath, positions = true)
    val bigBatch = spark.range(0, 10)
      .select((col("id") / 3).cast("long").as("query_id"),
        lit("the").as("term"), (col("id") % 3).as("off"))
    val err2 = intercept[IllegalArgumentException] {
      LexIndex.phraseKnnJoinIndexed(spark, lexPath, bigBatch,
        col("query_id"), col("term"), col("off"), k = 5, maxBatchRows = 4)
    }
    assert(err2.getMessage.contains("serving-batch ceiling")
      && err2.getMessage.contains("split the batch"))
  }

  test("every vector batch probe caps its query collect before the transfer") {
    // guard SYMMETRY: all four remaining batch probes adopt the phrase
    // probe's limit-before-collect shape — an over-contract batch
    // fails loudly at the ceiling (at most maxRows + 1 rows ever
    // transfer), never as a driver OOM after a full collect
    val e = Tables.load(spark, sf, "embeddings")
    val big = (AnnIndex.MaxShortlistIds / 2).toInt + 1
    val two = e.filter(col("vec_id") < 2)
    def trips(body: => Unit): Unit = {
      val err = intercept[IllegalArgumentException](body)
      assert(err.getMessage.contains("serving-batch ceiling")
        && err.getMessage.contains("split the query batch"))
    }
    val lshPath = tmp("st_glsh")
    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"), lshPath,
      numPlanes = 4)
    trips(AnnIndex.lshKnnJoinIndexed(spark, lshPath, two,
      col("vec_id"), col("embedding"), k = big))
    val pqPath = tmp("st_gpq")
    AnnIndex.writePqIndex(e, col("vec_id"), col("embedding"), pqPath,
      numSub = 8, codebookSize = 8)
    trips(AnnIndex.pqKnnJoinIndexed(spark, pqPath, two,
      col("vec_id"), col("embedding"), k = big))
    val qPath = tmp("st_gq8")
    AnnIndex.writeQuantizedIndex(e, col("vec_id"), col("embedding"),
      qPath)
    trips(AnnIndex.quantizedKnnJoinIndexed(spark, qPath, two,
      col("vec_id"), col("embedding"), k = 5, rerank = big))
    val bPath = tmp("st_gbin")
    AnnIndex.writeBinaryIndex(e, col("vec_id"), col("embedding"), bPath)
    trips(AnnIndex.binaryKnnJoinIndexed(spark, bPath,
      two.select(col("vec_id")), col("vec_id"), k = 5, shortlist = big))
  }

  test("file policy: touched-dir walk, flat-dir cap, hidden dirs") {
    def mkFiles(root: String, rel: String, names: Range): Unit = {
      val dir = java.nio.file.Paths.get(root, rel)
      java.nio.file.Files.createDirectories(dir)
      names.foreach(i => java.nio.file.Files.write(
        dir.resolve(s"part-$i.parquet"), Array[Byte](1)))
    }
    val path = tmp("st_touch")
    mkFiles(path, "postings/tpfx=xaa", 0 until 5) // untouched, over
    mkFiles(path, "postings/tpfx=xbb", 0 until 1) // touched, under
    // the full walk sees the over-threshold untouched prefix
    assert(StoreFiles.needsFileCompaction(spark, path, 3))
    // the touched-dir walk consults ONLY the touched prefix: the
    // policy must not fire off a directory this append never grew
    assert(!StoreFiles.needsFileCompaction(spark, path, 3,
      Seq("postings/tpfx=xbb")))
    // ...until the touched prefix itself goes over
    mkFiles(path, "postings/tpfx=xbb", 1 until 4)
    assert(StoreFiles.needsFileCompaction(spark, path, 3,
      Seq("postings/tpfx=xbb")))
    // a touched dir that does not exist (positional sidecar of a
    // non-positional store) is skipped, not an error
    assert(!StoreFiles.needsFileCompaction(spark, path, 3,
      Seq("positions/tpfx=xbb")))
    // FLAT table dirs (no '=' in the name) compare against
    // max(threshold, flatDirCap): compaction itself re-clusters them
    // into flatDirCap files, so a plain per-dir threshold below that
    // would re-trip on every append after a compact
    val flat = tmp("st_flat")
    mkFiles(flat, "vectors", 0 until 4)
    assert(StoreFiles.needsFileCompaction(spark, flat, 3))
    assert(!StoreFiles.needsFileCompaction(spark, flat, 3,
      flatDirCap = 4))
    mkFiles(flat, "vectors", 4 until 5)
    assert(StoreFiles.needsFileCompaction(spark, flat, 3,
      flatDirCap = 4))
    // partition dirs keep the plain threshold even with a flat cap
    val part = tmp("st_part")
    mkFiles(part, "codes/cell=1", 0 until 4)
    assert(StoreFiles.needsFileCompaction(spark, part, 3,
      flatDirCap = 8))
    // hidden/metadata DIRECTORIES are neither counted nor descended —
    // a leftover .compact-tmp or _spark_metadata full of files must
    // not trigger spurious full-store compactions
    val hid = tmp("st_hidden")
    mkFiles(hid, "vectors/_spark_metadata", 0 until 10)
    mkFiles(hid, "vectors/.compact-tmp", 0 until 10)
    mkFiles(hid, "vectors", 0 until 2)
    assert(!StoreFiles.needsFileCompaction(spark, hid, 3))
    // partition dirs are matched by LAYOUT, not a bare '=' check: a
    // depth-1 sub-store whose NAME merely contains '=' keeps the flat
    // cap (a bare contains() would hand it the stricter partition cap
    // and re-trip the policy after every compact), and the store root
    // itself may live under an '='-bearing user path
    val eqName = tmp("st_eq") + "/sub=dir"
    mkFiles(eqName, ".", 0 until 4)
    assert(!StoreFiles.needsFileCompaction(spark,
      eqName.stripSuffix("/sub=dir"), 3, flatDirCap = 8))
    // ...while a REAL partition dir at depth 2 keeps the strict cap
    // even under an '='-named store root
    val eqRoot = tmp("st_eqroot") + "/store=a"
    mkFiles(eqRoot, "codes/cell=1", 0 until 4)
    assert(StoreFiles.needsFileCompaction(spark, eqRoot, 3,
      flatDirCap = 8))
  }

  test("attribute-filtered probes restrict candidates, scoring unchanged") {
    import spark.implicits._
    // IVF with every cell probed == brute force over the corpus, so
    // the attr-filtered form must equal brute force over the ALLOWED
    // subset — candidates restricted, distances and ranking untouched
    val e = Tables.load(spark, sf, "embeddings")
    val path = tmp("st_attrivf")
    AnnIndex.writeIvfIndex(e, col("vec_id"), col("embedding"), path,
      nList = 8,
      attrs = Seq(pmod(col("vec_id"), lit(4)).cast("int").as("lang")))
    val queries = e.filter(col("vec_id") < 3)
    val got = AnnIndex.ivfKnnJoinIndexed(spark, path, queries,
        col("vec_id"), col("embedding"), k = 5, nProbe = 8,
        attrFilter = Some(col("lang") === 1))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val want = Similarity.knnJoin(
        e.filter(pmod(col("vec_id"), lit(4)) === 1),
        col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(got == want)
    // BM25: per-doc scores are independent and idf stays GLOBAL, so
    // the filtered top-k must equal the unfiltered FULL ranking
    // restricted to allowed docs and re-cut at k
    val lexPath = tmp("st_attrlex")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      lexPath, attrs = Seq(pmod(col("doc_id"), lit(2)).cast("int")
        .as("flag")))
    val terms = Seq("the", "of", "and").toDF("term")
    val gotLex = LexIndex.bm25TopKIndexed(spark, lexPath, terms,
        col("term"), k = 5, attrFilter = Some(col("flag") === 0))
      .collect().toSeq
    val wantLex = LexIndex.bm25TopKIndexed(spark, lexPath, terms,
        col("term"), k = 1000000)
      .filter(pmod(col("doc_id"), lit(2)) === 0)
      .orderBy(col("score_e4").desc, col("doc_id")).limit(5)
      .collect().toSeq
    assert(gotLex == wantLex && gotLex.nonEmpty)
    // and the batch form agrees with the single-query form per query
    val batch = Seq((7L, "the"), (7L, "of"), (9L, "and"))
      .toDF("query_id", "term")
    val gotBatch = LexIndex.bm25KnnJoinIndexed(spark, lexPath, batch,
        col("query_id"), col("term"), k = 5,
        attrFilter = Some(col("flag") === 0))
      .filter(col("query_id") === 7L)
      .select(col("doc_id"), col("score_e4")).collect().toSeq
    val gotSingle = LexIndex.bm25TopKIndexed(spark, lexPath,
        Seq("the", "of").toDF("term"), col("term"), k = 5,
        attrFilter = Some(col("flag") === 0))
      .select(col("doc_id"), col("score_e4")).collect().toSeq
    assert(gotBatch == gotSingle)
  }

  test("attribute filters cover the int8/binary/PQ families too") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val attr = Seq(pmod(col("vec_id"), lit(4)).cast("int").as("lang"))
    val allowed = pmod(col("vec_id"), lit(4)) === 1
    val queries = e.filter(col("vec_id") < 3)
    val n = e.count().toInt
    // brute-force truth over the ALLOWED subset — what every filtered
    // two-stage probe must equal at an all-candidate shortlist
    val want = Similarity.knnJoin(e.filter(allowed),
        col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val qPath = tmp("st_fq8")
    AnnIndex.writeQuantizedIndex(e, col("vec_id"), col("embedding"),
      qPath, attrs = attr)
    val gotQ = AnnIndex.quantizedKnnJoinIndexed(spark, qPath, queries,
        col("vec_id"), col("embedding"), k = 5, rerank = n,
        attrFilter = Some(col("lang") === 1))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(gotQ == want)
    val bPath = tmp("st_fbin")
    AnnIndex.writeBinaryIndex(e, col("vec_id"), col("embedding"), bPath,
      attrs = attr)
    val gotB = AnnIndex.binaryKnnJoinIndexed(spark, bPath,
        queries.select(col("vec_id")), col("vec_id"), k = 5,
        shortlist = n, attrFilter = Some(col("lang") === 1))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(gotB == want)
    // PQ: the filtered ADC ranking equals the unfiltered full ranking
    // restricted to allowed ids and re-cut (per-row scores are
    // independent of other rows)
    val pPath = tmp("st_fpq")
    AnnIndex.writePqIndex(e, col("vec_id"), col("embedding"), pPath,
      numSub = 8, codebookSize = 8, attrs = attr)
    val gotP = AnnIndex.pqKnnJoinIndexed(spark, pPath, queries,
        col("vec_id"), col("embedding"), k = 5,
        attrFilter = Some(col("lang") === 1))
      .select(col("query_id"), col("vec_id"), col("adc_score"))
      .orderBy(col("query_id"), col("adc_score"), col("vec_id"))
      .collect().toSeq
    val wantP = AnnIndex.pqKnnJoinIndexed(spark, pPath, queries,
        col("vec_id"), col("embedding"), k = n)
      .filter(pmod(col("vec_id"), lit(4)) === 1)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("adc_score"), col("vec_id"))))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id"), col("adc_score"))
      .orderBy(col("query_id"), col("adc_score"), col("vec_id"))
      .collect().toSeq
    assert(gotP == wantP && gotP.nonEmpty)
    // single-query twins share the mechanism: spot-check IVF-PQ's
    // single-query form against its own batch probe
    val ivfPath = tmp("st_fivfpq")
    AnnIndex.writeIvfPqIndex(e, col("vec_id"), col("embedding"),
      ivfPath, nList = 4, numSub = 8, codebookSize = 8,
      refineIters = 0, attrs = attr)
    val single = AnnIndex.queryIvfPqIndex(spark, ivfPath,
        e.filter(col("vec_id") === 0).select(col("embedding")),
        k = 5, nProbe = 4, attrFilter = Some(col("lang") === 1))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(single.nonEmpty && single.forall(_ % 4 == 1))
  }

  test("compaction preserves attribute columns and filtered probe results") {
    import spark.implicits._
    val attr = Seq(pmod(col("vec_id"), lit(4)).cast("int").as("lang"))
    val e = Tables.load(spark, sf, "embeddings")
    // vector side: delete + compact an attr-carrying IVF-PQ store;
    // the filtered probe must survive the rewrite unchanged for the
    // remaining docs (the codes fold keeps every column)
    val vPath = tmp("st_cattr")
    AnnIndex.writeIvfPqIndex(e, col("vec_id"), col("embedding"), vPath,
      nList = 4, numSub = 8, codebookSize = 8, refineIters = 0,
      attrs = attr)
    val queries = e.filter(col("vec_id") < 3)
    def probe() = AnnIndex.ivfPqKnnJoinIndexed(spark, vPath, queries,
        col("vec_id"), col("embedding"), k = 5, nProbe = 4,
        rerank = 50, attrFilter = Some(col("lang") === 1))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    AnnIndex.deleteVecs(spark, vPath,
      e.filter(col("vec_id") % 8 === 5).select(col("vec_id")),
      col("vec_id"))
    val afterDelete = probe()
    AnnIndex.compactAnnIndex(spark, vPath)
    assert(probe() == afterDelete && afterDelete.nonEmpty)
    assert(spark.read.parquet(s"$vPath/codes").columns.contains("lang"))
    // lexical side: the BM25 compact rewrites postings/positions
    // generically and recounts df — attrs and the filtered probes
    // must come through intact
    val lPath = tmp("st_cattrlex")
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), lPath,
      positions = true,
      attrs = Seq(pmod(col("doc_id"), lit(2)).cast("int").as("flag")))
    val terms = Seq("the", "of").toDF("term")
    def bmP() = LexIndex.bm25TopKIndexed(spark, lPath, terms,
        col("term"), k = 5, attrFilter = Some(col("flag") === 0))
      .collect().toSeq
    def phP() = LexIndex.phraseTopKIndexed(spark, lPath,
        Seq("row", "column", "sort"), k = 20,
        attrFilter = Some(col("flag") === 0)).collect().toSeq
    LexIndex.deleteFromBm25Index(spark, lPath,
      docs.filter(col("doc_id") % 8 === 5).select(col("doc_id")),
      col("doc_id"))
    val (bmAfter, phAfter) = (bmP(), phP())
    LexIndex.compactBm25Index(spark, lPath)
    assert(bmP() == bmAfter && phP() == phAfter && bmAfter.nonEmpty)
    assert(spark.read.parquet(s"$lPath/postings").columns
      .contains("flag"))
    assert(spark.read.parquet(s"$lPath/positions").columns
      .contains("flag"))
  }

  test("multi-table LSH: L=1 == single-table; append == fresh build; all-bucket probe == brute truth") {
    val e = Tables.load(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("query_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mPath = tmp("st_mlsh")
    AnnIndex.writeLshMultiIndex(e, col("vec_id"), col("embedding"),
      mPath, numPlanes = 6, numTables = 3)
    // table 0 uses planes [0, 6) of the same generator the
    // single-table build uses — so probing ONE table of the
    // multi-table store must equal the single-table probe exactly
    val sPath = tmp("st_slsh")
    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"), sPath,
      numPlanes = 6)
    assert(rows(AnnIndex.lshMultiKnnJoinIndexed(spark, mPath, queries,
        col("vec_id"), col("embedding"), k = 5, probeFlips = 1,
        tables = 1)) ==
      rows(AnnIndex.lshKnnJoinIndexed(spark, sPath, queries,
        col("vec_id"), col("embedding"), k = 5, probeFlips = 1)))
    // probing every bucket of every table reaches the whole corpus
    // exactly once (the distinct) — must equal brute-force truth
    val brute = rows(Similarity.knnJoin(e, col("vec_id"),
      col("embedding"), queries, col("vec_id"), col("embedding"), k = 5))
    assert(rows(AnnIndex.lshMultiKnnJoinIndexed(spark, mPath, queries,
      col("vec_id"), col("embedding"), k = 5, probeFlips = 6)) == brute)
    // appends land in the buckets a rebuild would assign: build on an
    // id split + append the rest == the one-shot build, row-for-row
    val aPath = tmp("st_mlsha")
    AnnIndex.writeLshMultiIndex(e.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), aPath, numPlanes = 6,
      numTables = 3)
    AnnIndex.appendLshMultiIndex(e.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), aPath)
    def probe(p: String) = rows(AnnIndex.lshMultiKnnJoinIndexed(spark,
      p, queries, col("vec_id"), col("embedding"), k = 5,
      probeFlips = 1))
    assert(probe(aPath) == probe(mPath) && probe(mPath).nonEmpty)
    // batch-keyed lifecycle: base + put + REPLAY == the one-shot
    // build; a committed fold keeps the layout and the results
    val bkPath = tmp("st_mlshbk")
    AnnIndex.writeLshMultiIndex(e.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), bkPath, numPlanes = 6,
      numTables = 3, batchKeyed = true)
    AnnIndex.putLshMultiBatch(e.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), bkPath, batchId = 0L)
    AnnIndex.putLshMultiBatch(e.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), bkPath, batchId = 0L) // replay
    assert(probe(bkPath) == probe(mPath))
    AnnIndex.compactLshBatches(spark, bkPath, keepFrom = 1L)
    assert(probe(bkPath) == probe(mPath))
    assert(spark.read.parquet(s"$bkPath/index").columns
      .contains("batch_id"))
  }

  test("pixel BMPs decode to their arithmetic grays; ahash + banded near-dup match brute force") {
    import spark.implicits._
    val ids = spark.range(0, 64).toDF("doc_id")
    val grays = Multimodal.decodeGray8x8(
      Multimodal.synthImages(ids, "doc_id"), "media_id")
      .localCheckpoint(eager = false)
    // the REAL ImageIO read of the synthesized raw-pixel BMP must
    // reproduce the generating arithmetic pixel-for-pixel (row
    // direction, channel order, offsets all cross-checked)
    val got = grays.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    (0L until 64L).foreach { id =>
      assert(got(id) ==
        (0 until 64).map(p => Multimodal.grayAt(id, p).toLong),
        s"id $id")
    }
    // the codegen'd ahash64 == an independent scalar re-derivation
    val sh = grays.select(col("media_id"),
      graft.functions.VectorExpressions.ahash64(col("grays")).as("sh"))
    val gotH = sh.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def refHash(g: Seq[Long]): Long = {
      val tot = g.sum
      g.zipWithIndex.foldLeft(0L) { case (h, (v, p)) =>
        if (v * g.length > tot) h | (1L << p) else h
      }
    }
    got.foreach { case (id, g) => assert(gotH(id) == refHash(g)) }
    // banded near-dup == brute-force Hamming at the radius (the
    // pigeonhole banding is exact, not approximate)
    val gotPairs = Dedup.hammingNearDup(sh, col("media_id"), col("sh"),
        maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2))).toSet
    val hs = gotH.toSeq.sortBy(_._1)
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 10
    } yield (a, b, d)).toSet
    assert(gotPairs == brute && brute.nonEmpty)
    // a payload that fails to decode surfaces a NULL fingerprint,
    // never a fake one
    val bad = Multimodal.decodeGray8x8(
      Seq((1L, Array[Byte](1, 2, 3))).toDF("media_id", "content"),
      "media_id")
    assert(bad.head().isNullAt(1))
    assert(bad.select(graft.functions.VectorExpressions
      .ahash64(col("grays"))).head().isNullAt(0))
  }

  test("PCM WAVs decode to their arithmetic samples; dhash + banded near-dup match brute force") {
    import spark.implicits._
    val ids = spark.range(0, 64).toDF("doc_id")
    val decoded = Multimodal.decodePcm16(
      Multimodal.synthAudio(ids, "doc_id"), "media_id")
      .localCheckpoint(eager = false)
    // the REAL javax.sound read of the synthesized PCM WAV must
    // reproduce the generating arithmetic sample-for-sample (byte
    // order, sign convention, header offset all cross-checked)
    val got = decoded.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    (0L until 64L).foreach { id =>
      assert(got(id) ==
        (0 until Multimodal.PcmFrames)
          .map(t => Multimodal.sampleAt(id, t).toLong), s"id $id")
    }
    // the codegen'd circular dhash64 over the window energies == an
    // independent scalar re-derivation
    val perWindow = Multimodal.PcmFrames / Multimodal.PcmWindows
    val energies = transform(
      sequence(lit(0), lit(Multimodal.PcmWindows - 1)),
      w => aggregate(
        slice(col("samples"), w * perWindow + lit(1), lit(perWindow)),
        lit(0L), (acc, x) => acc + abs(x)))
    val fp = decoded.select(col("media_id"),
      graft.functions.VectorExpressions.dhash64(energies).as("fp"))
    val gotH = fp.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def refEnergies(id: Long): Seq[Long] =
      (0 until Multimodal.PcmWindows).map(w =>
        (0 until perWindow).map(i =>
          math.abs(Multimodal.sampleAt(id, w * perWindow + i).toLong))
          .sum)
    def refHash(e: Seq[Long]): Long =
      e.indices.foldLeft(0L) { (h, w) =>
        if (e((w + 1) % e.length) > e(w)) h | (1L << w) else h
      }
    (0L until 64L).foreach { id =>
      assert(gotH(id) == refHash(refEnergies(id)), s"id $id")
    }
    // banded near-dup == brute-force Hamming at the radius; the id%4
    // perturbation triples k windows, flipping ≤ 2 bits each, so
    // intra-group pairs exist by construction
    val gotPairs = Dedup.hammingNearDup(fp, col("media_id"), col("fp"),
        maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2))).toSet
    val hs = gotH.toSeq.sortBy(_._1)
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 10
    } yield (a, b, d)).toSet
    assert(gotPairs == brute && brute.nonEmpty)
    // a payload that fails to decode surfaces NULL samples, and a
    // wrong frame count surfaces a NULL fingerprint — never a fake
    val bad = Multimodal.decodePcm16(
      Seq((1L, Array[Byte](1, 2, 3))).toDF("media_id", "content"),
      "media_id")
    assert(bad.head().isNullAt(1))
    assert(bad.select(graft.functions.VectorExpressions
      .dhash64(when(size(col("samples")) === Multimodal.PcmFrames,
        energies))).head().isNullAt(0))
    // dhash64 guards: a null element nulls the hash; > 64 values is a
    // loud error, not a silent truncation
    assert(spark.range(1).select(graft.functions.VectorExpressions
        .dhash64(array(lit(1L), lit(null).cast("long"), lit(2L))))
      .head().isNullAt(0))
    val tooMany = intercept[org.apache.spark.SparkException] {
      spark.range(1).select(graft.functions.VectorExpressions
        .dhash64(transform(sequence(lit(0), lit(64)),
          i => i.cast("long")))).collect()
    }
    assert(tooMany.getMessage.contains("dhash64") ||
      Option(tooMany.getCause).exists(_.getMessage.contains("dhash64")))
  }

  test("fingerprint store: banded probe == brute force, through append, delete + compact, attrs, radius pinning") {
    import spark.implicits._
    val FP = graft.ops.FingerprintIndex
    // real decoded-pixel aHashes (the qm04 frame) so the store is
    // exercised with genuine fingerprints, not toy longs
    val sigs = Multimodal.decodeGray8x8(
        Multimodal.synthImages(spark.range(0, 64).toDF("doc_id"),
          "doc_id"), "media_id")
      .select(col("media_id"),
        graft.functions.VectorExpressions.ahash64(col("grays")).as("sh"))
      .localCheckpoint(eager = false)
    val even = sigs.filter(col("media_id") % 2 === 0)
    val odd = sigs.filter(col("media_id") % 2 === 1)
    val sigMap = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    def brute(idxIds: Long => Boolean, r: Int) =
      (for {
        (a, ha) <- sigMap.filter(_._1 % 2 == 1)
        (b, hb) <- sigMap.filter(t => t._1 % 2 == 0 && idxIds(t._1))
        d = java.lang.Long.bitCount(ha ^ hb) if d <= r
      } yield (a, b, d)).toSet
    def probe(path: String,
        f: Option[org.apache.spark.sql.Column] = None) =
      FP.hammingAgainstIndex(spark, odd, col("media_id"), col("sh"),
          path, f)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getInt(2))).toSet
    // one-shot build: probe == brute-force odd-vs-even Hamming
    val p0 = tmp("st_fpidx")
    FP.writeHammingIndex(even, col("media_id"), col("sh"), p0,
      maxHamming = 10)
    assert(probe(p0) == brute(_ => true, 10) && probe(p0).nonEmpty)
    // append lands where a rebuild would: quarter build + append the
    // rest == the one-shot build, row-for-row
    val pA = tmp("st_fpap")
    FP.writeHammingIndex(even.filter(col("media_id") % 4 === 0),
      col("media_id"), col("sh"), pA, maxHamming = 10)
    FP.appendHammingIndex(even.filter(col("media_id") % 4 === 2),
      col("media_id"), col("sh"), pA)
    assert(probe(pA) == probe(p0))
    // tombstone delete: probe == an index rebuilt without the docs;
    // compact preserves results and clears the sidecar
    FP.deleteDocs(spark, pA, spark.range(0, 64, 8).toDF("id"),
      col("id"))
    assert(probe(pA) == brute(_ % 8 != 0, 10) && probe(pA).nonEmpty)
    FP.compact(spark, pA)
    assert(probe(pA) == brute(_ % 8 != 0, 10))
    assert(!graft.ops.StoreFiles.exists(spark, s"$pA/tombstones"))
    // attrs: the filtered probe == brute force over the allowed
    // subset — one more pushed predicate, same store
    val pF = tmp("st_fpat")
    FP.writeHammingIndex(even, col("media_id"), col("sh"), pF,
      maxHamming = 10,
      attrs = Seq(pmod(col("media_id"), lit(4)).cast("int").as("flag")))
    assert(probe(pF, Some(col("flag") === 0)) == brute(_ % 4 == 0, 10))
    assert(probe(pF) == probe(p0))
    // attr BACKFILL at compact: a store born WITHOUT attrs upgrades
    // to filtered serving identical to the born-with store, through a
    // subsequent attr-carrying append (the store-family upgrade path)
    val pUp = tmp("st_fpup")
    FP.writeHammingIndex(even.filter(col("media_id") < 32),
      col("media_id"), col("sh"), pUp, maxHamming = 10)
    FP.compact(spark, pUp, backfillAttrs = Some(
      even.filter(col("media_id") < 32)
        .select(col("media_id").as("doc_id"),
          pmod(col("media_id"), lit(4)).cast("int").as("flag"))))
    FP.appendHammingIndex(even.filter(col("media_id") >= 32),
      col("media_id"), col("sh"), pUp,
      attrs = Seq(pmod(col("media_id"), lit(4)).cast("int").as("flag")))
    assert(probe(pUp, Some(col("flag") === 0)) ==
      probe(pF, Some(col("flag") === 0)))
    assert(probe(pUp) == probe(p0))
    // radius is meta-pinned: a store built at radius 3 serves radius-3
    // truth (the c = 1 banding branch) without the caller restating it
    val p3 = tmp("st_fpr3")
    FP.writeHammingIndex(even, col("media_id"), col("sh"), p3,
      maxHamming = 3)
    assert(probe(p3) == brute(_ => true, 3))
    // the partition fan-out is meta-pinned like the radius: a store
    // built with a non-default fan-out probes identically (prefixes
    // derive under the store's own constant, never the library's)
    val p8 = tmp("st_fppfx")
    FP.writeHammingIndex(even, col("media_id"), col("sh"), p8,
      maxHamming = 10, pfxBuckets = 8)
    assert(probe(p8) == probe(p0))
    // the small-file policy: an append carrying maxFilesPerDir
    // compacts in place once a touched directory crosses the
    // threshold — probe results unchanged (duplicate sig rows from
    // the re-append are absorbed by the probe's distinct)
    FP.appendHammingIndex(even, col("media_id"), col("sh"), p3)
    assert(graft.ops.StoreFiles.needsFileCompaction(spark, p3,
      maxFilesPerDir = 1))
    FP.appendHammingIndex(odd.limit(0), col("media_id"), col("sh"), p3,
      maxFilesPerDir = 1)
    assert(!graft.ops.StoreFiles.needsFileCompaction(spark, p3,
      maxFilesPerDir = 300))
    assert(probe(p3) == brute(_ => true, 3))
    // the arrival gate: accepted rows have NO stored partner within
    // the radius — gate + probe partition the batch exactly. The
    // store holds only the first 8 groups, so odd ids of the stored
    // groups gate out (their even groupmates sit within 10) while
    // odd ids of unstored groups pass (inter-group distance ~32)
    val pGate = tmp("st_fpgate")
    FP.writeHammingIndex(even.filter(col("media_id") < 32),
      col("media_id"), col("sh"), pGate, maxHamming = 10)
    val accepted = FP.newOnlyByHamming(spark, odd, col("media_id"),
        col("sh"), pGate)
      .select(col("media_id")).collect().map(_.getLong(0)).toSet
    val gatedOut = brute(_ < 32, 10).map(_._1)
    assert(accepted ==
      sigMap.collect { case (i, _) if i % 2 == 1 => i }.toSet -- gatedOut)
    assert(accepted.nonEmpty && gatedOut.nonEmpty)
    // batch-keyed lifecycle: base + put + REPLAY == the one-shot
    // build (exactly-once under at-least-once); the fold keeps the
    // layout and the results
    val pBk = tmp("st_fpbk")
    FP.writeHammingIndex(even.filter(col("media_id") % 4 === 0),
      col("media_id"), col("sh"), pBk, maxHamming = 10,
      batchKeyed = true)
    FP.putHammingBatch(even.filter(col("media_id") % 4 === 2),
      col("media_id"), col("sh"), pBk, batchId = 0L)
    FP.putHammingBatch(even.filter(col("media_id") % 4 === 2),
      col("media_id"), col("sh"), pBk, batchId = 0L) // replay
    assert(probe(pBk) == probe(p0))
    FP.compactHammingBatches(spark, pBk, keepFrom = 1L)
    assert(probe(pBk) == probe(p0))
    assert(spark.read.parquet(s"$pBk/bands").columns
      .contains("batch_id"))
    // the RANKED probe is layout-agnostic too: same pages off the
    // batch-keyed store as off the plain one-shot build
    def ranked(path: String) =
      FP.hammingTopK(spark, odd, col("media_id"), col("sh"), path,
          k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3))).toSet
    assert(ranked(pBk) == ranked(p0) && ranked(pBk).nonEmpty)
    // attr name collisions die loudly, never corrupt the layout —
    // including batch_id, which the batch-keyed layout writes as a
    // partition column (an attr by that name would be clobbered
    // there, and would flip compact's layout detection on a plain
    // store)
    val bad = intercept[IllegalArgumentException] {
      FP.writeHammingIndex(even, col("media_id"), col("sh"),
        tmp("st_fpbad"), maxHamming = 3,
        attrs = Seq(lit(1).as("block_val")))
    }
    assert(bad.getMessage.contains("block_val"))
    val badBatch = intercept[IllegalArgumentException] {
      FP.writeHammingIndex(even, col("media_id"), col("sh"),
        tmp("st_fpbadb"), maxHamming = 3,
        attrs = Seq(lit(1L).as("batch_id")))
    }
    assert(badBatch.getMessage.contains("batch_id"))
  }

  test("attr backfill at compact: a born-without-attrs store upgrades to filtered serving, through append + replay") {
    import spark.implicits._
    val terms = Seq("the", "of", "and").toDF("term")
    val flagAttr = Seq(pmod(col("doc_id"), lit(2)).cast("int").as("flag"))
    def flagFrame(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"),
        pmod(col("doc_id"), lit(2)).cast("int").as("flag"))
    def bmF(path: String) = LexIndex.bm25TopKIndexed(spark, path, terms,
        col("term"), k = 5, attrFilter = Some(col("flag") === 0))
      .collect().toSeq
    // --- lexical, plain layout: base build WITHOUT attrs, upgraded at
    // compact, then grown by an attr-carrying append — must serve
    // filtered probes identically to a store born with attrs and
    // grown the same way
    val born = tmp("st_bfborn")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      born, attrs = flagAttr)
    LexIndex.appendBm25Index(half(lo = false), col("doc_id"),
      col("text"), born, attrs = flagAttr)
    val up = tmp("st_bfup")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      up) // no attrs — the legacy layout
    LexIndex.compactBm25Index(spark, up,
      backfillAttrs = Some(flagFrame(half(lo = true))))
    LexIndex.appendBm25Index(half(lo = false), col("doc_id"),
      col("text"), up, attrs = flagAttr)
    assert(bmF(up) == bmF(born) && bmF(born).nonEmpty)
    // --- lexical, batch-keyed: upgrade at compact, then an
    // attr-carrying put REPLAYED (exactly-once) — still identical
    val bk = tmp("st_bfbk")
    LexIndex.writeBm25IndexBatchKeyed(half(lo = true), col("doc_id"),
      col("text"), bk) // no attrs
    LexIndex.compactBm25Index(spark, bk,
      backfillAttrs = Some(flagFrame(half(lo = true))))
    LexIndex.putBm25Batch(half(lo = false), col("doc_id"), col("text"),
      bk, batchId = 1L, attrs = flagAttr)
    LexIndex.putBm25Batch(half(lo = false), col("doc_id"), col("text"),
      bk, batchId = 1L, attrs = flagAttr) // replay
    assert(bmF(bk) == bmF(born))
    // a duplicate-doc_id attr frame must be rejected loudly (it would
    // multiply posting rows and corrupt the df recount)
    val dup = intercept[IllegalArgumentException] {
      LexIndex.compactBm25Index(spark, tmp("st_bfdup"),
        backfillAttrs = Some(
          flagFrame(half(lo = true)).unionAll(flagFrame(half(lo = true)))))
    }
    assert(dup.getMessage.contains("duplicate doc_id"))
    // --- vector: IVF-PQ born-with vs backfilled-at-compact — the
    // deterministic build makes the two stores' models identical, so
    // the filtered probes must agree row-for-row
    val e = Tables.load(spark, sf, "embeddings")
    val attr = Seq(pmod(col("vec_id"), lit(4)).cast("int").as("lang"))
    val queries = e.filter(col("vec_id") < 3)
    def pqF(path: String) = AnnIndex.ivfPqKnnJoinIndexed(spark, path,
        queries, col("vec_id"), col("embedding"), k = 5, nProbe = 4,
        rerank = 50, attrFilter = Some(col("lang") === 1))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val vBorn = tmp("st_bfvb")
    AnnIndex.writeIvfPqIndex(e, col("vec_id"), col("embedding"), vBorn,
      nList = 4, numSub = 8, codebookSize = 8, refineIters = 0,
      attrs = attr)
    val vUp = tmp("st_bfvu")
    AnnIndex.writeIvfPqIndex(e, col("vec_id"), col("embedding"), vUp,
      nList = 4, numSub = 8, codebookSize = 8, refineIters = 0)
    AnnIndex.compactAnnIndex(spark, vUp, backfillAttrs = Some(
      e.select(col("vec_id"),
        pmod(col("vec_id"), lit(4)).cast("int").as("lang"))))
    assert(pqF(vUp) == pqF(vBorn) && pqF(vBorn).nonEmpty)
    // the rerank vectors/ stays two-column after the upgrade
    assert(spark.read.parquet(s"$vUp/vectors").columns.toSeq ==
      Seq("vec_id", "v"))
  }

  test("filtered probes score with GLOBAL df on the legacy window layout too") {
    import spark.implicits._
    // the sidecar path broadcasts corpus-wide df; the legacy fallback
    // must WINDOW-count the unfiltered pruned postings (filter applied
    // above the df derivation) — the same filtered query must score
    // identically on both layouts
    val terms = Seq("the", "of", "and").toDF("term")
    val path = tmp("st_gdf")
    LexIndex.writeBm25Index(docs, col("doc_id"), col("text"), path,
      attrs = Seq(pmod(col("doc_id"), lit(2)).cast("int").as("flag")))
    def probeF() = LexIndex.bm25TopKIndexed(spark, path, terms,
        col("term"), k = 5, attrFilter = Some(col("flag") === 0))
      .collect().toSeq
    def batchF() = LexIndex.bm25KnnJoinIndexed(spark, path,
        Seq((1L, "the"), (1L, "of"), (2L, "and")).toDF("query_id", "term"),
        col("query_id"), col("term"), k = 5,
        attrFilter = Some(col("flag") === 0))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val (sidecar, sidecarBatch) = (probeF(), batchF())
    StoreFiles.delete(spark, s"$path/df") // → pre-sidecar legacy layout
    assert(probeF() == sidecar && sidecar.nonEmpty)
    assert(batchF() == sidecarBatch && sidecarBatch.nonEmpty)
  }

  test("legacy df-window fallback warns once per store, sidecar stores never") {
    import spark.implicits._
    val terms = Seq("the", "of", "and").toDF("term")
    val path = tmp("st_warn")
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      path)
    // sidecar store: broadcast-join path, no warning recorded
    LexIndex.bm25TopKIndexed(spark, path, terms, col("term"), k = 5)
      .collect()
    assert(!LexIndex.legacyDfWindowWarned.contains(path))
    // strip the sidecar -> the pre-sidecar legacy layout; the probe
    // falls back to the per-term window AND nudges loudly, once
    StoreFiles.delete(spark, s"$path/df")
    LexIndex.bm25TopKIndexed(spark, path, terms, col("term"), k = 5)
      .collect()
    assert(LexIndex.legacyDfWindowWarned.contains(path))
  }

  test("HLL append to a tombstoned group fails loudly until compact re-admits it") {
    def toks(lo: Boolean) = half(lo)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w"))
    val path = tmp("st_hllguard")
    SketchStore.writeHll(toks(lo = true), col("source"), col("w"), path)
    val victim = toks(lo = true).select(col("source")).distinct()
      .orderBy(col("source")).limit(1)
    SketchStore.deleteHllGroups(spark, path, victim, col("source"))
    // appending the tombstoned group now would hide the partial until
    // compact and then resurrect deleted history with it — rejected
    val err = intercept[IllegalArgumentException] {
      SketchStore.appendHll(toks(lo = false), col("source"), col("w"), path)
    }
    assert(err.getMessage.contains("tombstoned"))
    // compact drops the dead partials and clears the sidecar; the same
    // append then succeeds and the store profiles exactly the re-added
    // rows (the deleted history stays gone)
    SketchStore.compact(spark, path)
    SketchStore.appendHll(toks(lo = false), col("source"), col("w"), path)
    val vic = victim.collect().map(_.getString(0)).toSeq
    val want = Sketches.hllDistinctFast(
        toks(lo = true).filter(!col("source").isin(vic: _*))
          .unionByName(toks(lo = false)),
        col("source"), col("w"))
      .orderBy("grp").collect().toSeq
    assert(SketchStore.readHllProfile(spark, path)
      .orderBy("grp").collect().toSeq == want)
  }

  test("CMS/hist deletes on a batch-keyed store land under the reserved -2 partition") {
    import spark.implicits._
    def words(lo: Boolean) = half(lo)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val path = tmp("st_negbk")
    SketchStore.putCmsBatch(words(lo = true), col("w"), path, 0L, 128)
    SketchStore.putCmsBatch(words(lo = false), col("w"), path, 1L, 128)
    SketchStore.putHistBatch(half(lo = true), col("source"), docLen,
      path, 0L)
    SketchStore.putHistBatch(half(lo = false), col("source"), docLen,
      path, 1L)
    SketchStore.deleteCms(words(lo = false), col("w"), path)
    SketchStore.deleteHist(half(lo = false), col("source"), docLen, path)
    // the negative partials keep the partitioned layout (reserved -2,
    // never a real batch id) instead of corrupting it with flat files
    assert(spark.read.parquet(s"$path/cms").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-2L, 0L, 1L))
    assert(spark.read.parquet(s"$path/hist").select("batch_id")
      .distinct().as[Long].collect().sorted.toSeq == Seq(-2L, 0L, 1L))
    // merged reads subtract exactly: only the lo half remains
    assert(rows(SketchStore.readCms(spark, path)) ==
      rows(Sketches.cmsSketch(words(lo = true), col("w"), width = 128)))
    val refHist = tmp("st_negbk_ref") // direct twin over the lo half
    SketchStore.writeHist(half(lo = true), col("source"), docLen, refHist)
    assert(rows(SketchStore.readHistProfile(spark, path, Seq(0.5))) ==
      rows(SketchStore.readHistProfile(spark, refHist, Seq(0.5))))
    // a later fold collapses the negatives with everything committed
    SketchStore.compactBatches(spark, path, keepFrom = 2L)
    assert(rows(SketchStore.readCms(spark, path)) ==
      rows(Sketches.cmsSketch(words(lo = true), col("w"), width = 128)))
    assert(spark.read.parquet(s"$path/cms").select("batch_id")
      .distinct().as[Long].collect().toSeq == Seq(-1L))
  }

  test("store manifest: one call classifies every persisted family under a root") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings")
    val root = tmp("st_manifest")
    def at(name: String) = s"$root/$name"
    // one store per family, smallest honest builds
    FingerprintIndex.writeHammingIndex(
      Dedup.simhashSignatures(half(lo = true), col("doc_id"),
        col("text")),
      col("doc_id"), col("sh"), at("fp"), maxHamming = 3,
      attrs = Seq(col("doc_id").mod(2).cast("int").as("flag")))
    LexIndex.writeBm25Index(half(lo = true), col("doc_id"), col("text"),
      at("lex"), positions = true,
      attrs = Seq(col("source").as("src")))
    DedupIndex.writeExactIndex(half(lo = true), col("doc_id"),
      col("text"), at("dedup"))
    DedupIndex.writeClusterMap(Seq((1L, 2L)).toDF("a", "b"), col("a"),
      col("b"), at("clmap"))
    AnnIndex.writeIvfPqIndex(e, col("vec_id"), col("embedding"),
      at("ivfpq"), nList = 4, numSub = 8, codebookSize = 8,
      refineIters = 0)
    AnnIndex.writePqIndex(e, col("vec_id"), col("embedding"), at("pq"),
      numSub = 8, codebookSize = 8)
    AnnIndex.writeQuantizedIndex(e, col("vec_id"), col("embedding"),
      at("int8"))
    AnnIndex.writeBinaryIndex(e, col("vec_id"), col("embedding"),
      at("bin"))
    AnnIndex.writeIvfIndex(e, col("vec_id"), col("embedding"),
      at("ivf"), nList = 4)
    AnnIndex.writeLshIndex(e, col("vec_id"), col("embedding"),
      at("lsh"), numPlanes = 4, batchKeyed = true)
    AnnIndex.writeLshMultiIndex(e, col("vec_id"), col("embedding"),
      at("lshm"), numPlanes = 4, numTables = 2)
    SketchStore.writeHll(
      half(lo = true).select(col("source"), col("text").as("w")),
      col("source"), col("w"), at("sketch"))
    val m = StoreManifest.manifest(spark, root).collect()
      .map(r => r.getString(0) -> (r.getString(1),
        r.getMap[String, String](2),
        r.getSeq[String](3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(m.keySet == Set("fp", "lex", "dedup", "clmap", "ivfpq",
      "pq", "int8", "bin", "ivf", "lsh", "lshm", "sketch"))
    assert(m("fp")._1 == "fingerprint" &&
      m("fp")._2("max_hamming") == "3" && m("fp")._3 == Seq("flag"))
    assert(m("lex")._1 == "lexical" &&
      m("lex")._2("positions") == "true" && m("lex")._3 == Seq("src"))
    assert(m("dedup")._1 == "dedup")
    assert(m("clmap")._1 == "cluster_map" &&
      m("clmap")._2("coverage") == "false")
    assert(m("ivfpq")._1 == "ann_ivfpq" &&
      m("ivfpq")._2("n_list") == "4" && m("ivfpq")._2("num_sub") == "8")
    assert(m("pq")._1 == "ann_pq" &&
      m("pq")._2("codebook_size") == "8")
    assert(m("int8")._1 == "ann_int8")
    assert(m("bin")._1 == "ann_binary")
    assert(m("ivf")._1 == "ann_ivf" && m("ivf")._2("n_list") == "4")
    assert(m("lsh")._1 == "ann_lsh" &&
      m("lsh")._2("num_planes") == "4" && m("lsh")._4) // batch-keyed
    assert(m("lshm")._1 == "ann_lsh_multi" &&
      m("lshm")._2("num_tables") == "2")
    assert(m("sketch")._1 == "sketch")
    assert(!m("ivf")._4 && !m("ivf")._5)
    // tombstones surface in the manifest until compact clears them
    AnnIndex.deleteVecs(spark, at("ivf"), Seq(Tuple1(0L)).toDF("v"),
      col("v"))
    val m2 = StoreManifest.manifest(spark, root).collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(m2("ivf"))
    // an unrecognized directory reports unknown, never an error
    new java.io.File(s"$root/junk/whatever").mkdirs()
    val m3 = StoreManifest.manifest(spark, root).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m3("junk") == "unknown")
    // HEALTH REGISTRY: stage maintenance-pending state on three stores
    // — a tombstoned ANN store, a cluster map with a pending patch
    // log, and a retrained (generation > 0) trained store — and read
    // all of it back as one frame
    DedupIndex.mergeClusterMap(spark, at("clmap"),
      Seq((2L, 3L), (10L, 11L), (11L, 1L)).toDF("a", "b"),
      col("a"), col("b"))
    AnnIndex.compactAnnIndex(spark, at("ivfpq"), retrainIters = Some(1))
    val h = StoreManifest.manifest(spark, root).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getBoolean(9))).toMap
    // (family, generation, tombstone_rows, pending_patches, drift)
    assert(h("ivf") == (("ann_ivf", 0L, 1L, 0L, true)))
    assert(h("clmap")._1 == "cluster_map" && h("clmap")._4 > 0L)
    // the retrained store still classifies by family, one generation up,
    // with the memoized drift sidecar present in the serving root
    assert(h("ivfpq") == (("ann_ivfpq", 1L, 0L, 0L, true)))
    // untrained families carry no drift sidecar — nothing to monitor
    assert(h("lsh")._5 == false && h("bin")._5 == false)
    // "what needs compact under this root" is one filter
    val needs = StoreManifest.manifest(spark, root)
      .filter(col("tombstone_rows") > 0 || col("pending_patches") > 0)
      .select("store").collect().map(_.getString(0)).toSet
    assert(needs == Set("ivf", "clmap"))
    // compacts clear both signals
    AnnIndex.compactAnnIndex(spark, at("ivf"))
    DedupIndex.compactClusterMap(spark, at("clmap"))
    val h2 = StoreManifest.manifest(spark, root).collect()
      .map(r => r.getString(0) -> (r.getLong(7), r.getLong(8))).toMap
    assert(h2("ivf") == ((0L, 0L)) && h2("clmap") == ((0L, 0L)))
  }

  test("pixel AVI synth + DIB frame decode round-trip; corrupt payloads decode NULL") {
    val m = Multimodal
    // round-trip: the pure-JVM RIFF walk recovers exactly the
    // generating arithmetic for every pixel of every frame
    val got = m.decodeDibFrames(
      m.synthVideos(spark.range(0, 8).toDF("doc_id"), "doc_id"),
      "media_id").collect()
    assert(got.length == 8)
    got.foreach { r =>
      val id = r.getLong(0)
      val frames = r.getSeq[scala.collection.Seq[Long]](1)
      assert(frames.length == m.VidFrames)
      for (f <- 0 until m.VidFrames; p <- 0 until 64)
        assert(frames(f)(p) == m.vidGrayAt(id, f, p).toLong,
          s"id=$id f=$f p=$p")
    }
    // the existing AVI header walk reads the same container (the
    // synth composes with decodeMeta's dispatch)
    val meta = m.aviHeader(m.vidPixelAviBytes(5L))
    assert(meta.exists(mm => mm.width == 8 && mm.height == 8 &&
      mm.nFrames == m.VidFrames))
    // malformed payloads decode NULL, never fake frames: wrong RIFF
    // form, truncated movi, garbage bytes
    assert(m.dibFramesOf(m.pcmWavBytes(1L)) == null)
    assert(m.dibFramesOf(m.vidPixelAviBytes(1L).dropRight(10)) == null)
    assert(m.dibFramesOf(Array[Byte](1, 2, 3)) == null)
  }

  test("cluster map MERGE == rebuild from the union of pairs; bridging arrivals; idempotent; coverage") {
    import spark.implicits._
    val DI = graft.ops.DedupIndex
    // stored map: components {1,2,3} (label 1), {10,11}, {20,21}
    val basePairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("a", "b")
    val path = tmp("st_cmerge")
    DI.writeClusterMap(basePairs, col("a"), col("b"), path)
    // the HARD case: the arrival BRIDGES components 1 and 10 through a
    // brand-new doc 30 (two hops — the contracted propagation must
    // close transitively), adds an unrelated fresh pair (40,41), and
    // replays an intra-cluster no-op edge (20,21)
    val arrival = Seq((3L, 30L), (30L, 11L), (40L, 41L), (20L, 21L))
      .toDF("a", "b")
    DI.mergeClusterMap(spark, path, arrival, col("a"), col("b"))
    def labels(p: String) = DI.readClusterMap(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = tmp("st_cmerge_ref")
    DI.writeClusterMap(basePairs.unionByName(arrival), col("a"),
      col("b"), ref)
    val want = labels(ref)
    assert(labels(path) == want && want.nonEmpty)
    // the bridged family carries the JOINT minimum as its label
    assert(labels(path).contains((11L, 1L)) &&
      labels(path).contains((30L, 1L)) &&
      labels(path).contains((41L, 40L)) &&
      labels(path).contains((21L, 20L)))
    // idempotent on labels: replaying the same arrival changes nothing
    DI.mergeClusterMap(spark, path, arrival, col("a"), col("b"))
    assert(labels(path) == want)
    // pairs/ holds the union (a rebuild from the stored edges agrees)
    assert(labels(path) ==
      graft.ops.Dedup.dupClusters(DI.readClusterPairs(spark, path),
          col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // merge with a coverage snapshot clears staleness for that corpus
    val docsNow = (Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 30L, 40L, 41L))
      .toDF("doc_id")
    DI.mergeClusterMap(spark, path, arrival.limit(0), col("a"),
      col("b"), coverage = Some((docsNow, col("doc_id"))))
    assert(!DI.clusterMapIsStale(spark, docsNow, col("doc_id"), path))
    assert(labels(path) == want)
  }

  test("cluster map relabel-patch log: N successive merges == rebuild at every step; depth-1 reads; compact materializes") {
    import spark.implicits._
    val DI = graft.ops.DedupIndex
    val path = tmp("st_cpatch")
    DI.writeClusterMap(Seq((1L, 2L), (10L, 11L), (20L, 21L),
        (30L, 31L)).toDF("a", "b"),
      col("a"), col("b"), path)
    def labels(p: String) = DI.readClusterMap(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // a CHAINING sequence: each arrival relabels the component the
    // previous merge just built — exactly the case where a naive
    // append-only log would grow chains (20→10 then 10→1), and the
    // re-point discipline must keep every read one hop deep
    val arrivals = Seq(
      Seq((21L, 30L)),             // {20,21,30,31} → label 20
      Seq((11L, 20L)),             // ... ∪ {10,11} → label 10
      Seq((2L, 10L)),              // ... ∪ {1,2} → label 1 (20→1, 10→1)
      Seq((50L, 51L), (51L, 2L)))  // new docs straight into label 1
    var sofar = Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L))
    arrivals.zipWithIndex.foreach { case (arr, i) =>
      DI.mergeClusterMap(spark, path, arr.toDF("a", "b"), col("a"),
        col("b"))
      sofar = sofar ++ arr
      val ref = tmp(s"st_cpatch_ref$i")
      DI.writeClusterMap(sofar.toDF("a", "b"), col("a"), col("b"), ref)
      assert(labels(path) == labels(ref),
        s"sequence step $i diverged from rebuild")
    }
    // every doc resolves to label 1 through the folded log
    assert(labels(path).forall(_._2 == 1L) && labels(path).size == 10)
    // depth-1 invariant on the LOG itself: after folding, no target is
    // also a source — a read never needs a second hop
    val folded = spark.read.parquet(s"$path/patches")
      .groupBy(col("old_lab"))
      .agg(max_by(col("new_lab"), col("seq")).as("new_lab"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sources = folded.map(_._1).toSet
    assert(folded.nonEmpty && folded.forall { case (_, t) =>
      !sources.contains(t) })
    // the base table was NOT rewritten by the merges: it still holds
    // the original labels (the per-arrival cost claim, observable)
    val rawBase = spark.read.parquet(s"$path/clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rawBase.contains((21L, 20L)) && rawBase.contains((11L, 10L)))
    // compact materializes the effective labels and clears the log;
    // reads are unchanged
    val before = labels(path)
    DI.compactClusterMap(spark, path)
    assert(!StoreFiles.exists(spark, s"$path/patches"))
    assert(labels(path) == before)
    assert(spark.read.parquet(s"$path/clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == before)
    // ... and merging continues cleanly on the compacted base
    DI.mergeClusterMap(spark, path, Seq((31L, 60L)).toDF("a", "b"),
      col("a"), col("b"))
    assert(labels(path).contains((60L, 1L)))
  }

  test("fingerprint store hammingTopK: ranked == brute cut at the radius; under-filled pages; filtered") {
    val FP = graft.ops.FingerprintIndex
    val sigs = Multimodal.decodeGray8x8(
        Multimodal.synthImages(spark.range(0, 64).toDF("doc_id"),
          "doc_id"), "media_id")
      .select(col("media_id"),
        graft.functions.VectorExpressions.ahash64(col("grays")).as("sh"))
      .localCheckpoint(eager = false)
    val even = sigs.filter(col("media_id") % 2 === 0)
    val odd = sigs.filter(col("media_id") % 2 === 1)
    val sigMap = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val path = tmp("st_fptopk")
    FP.writeHammingIndex(even, col("media_id"), col("sh"), path,
      maxHamming = 10,
      attrs = Seq(pmod(col("media_id"), lit(4)).cast("int").as("flag")))
    // brute ranked truth: per odd query, stored partners within the
    // radius ordered (hamming asc, id asc), cut at k
    def brute(k: Int, allow: Long => Boolean) =
      sigMap.filter(_._1 % 2 == 1).flatMap { case (a, ha) =>
        sigMap.filter(t => t._1 % 2 == 0 && allow(t._1)).toSeq
          .map { case (b, hb) =>
            (b, java.lang.Long.bitCount(ha ^ hb)) }
          .filter(_._2 <= 10)
          .sortBy { case (b, d) => (d, b) }
          .take(k).zipWithIndex
          .map { case ((b, d), i) => (a, b, d, (i + 1).toLong) }
      }.toSet
    def topk(k: Int, f: Option[org.apache.spark.sql.Column] = None) =
      FP.hammingTopK(spark, odd, col("media_id"), col("sh"), path, k, f)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3))).toSet
    assert(topk(3) == brute(3, _ => true) && topk(3).nonEmpty)
    // pages under-fill where < k partners exist within the radius —
    // present in this corpus (groups of 4 hold 2 even members), and
    // served as-is rather than padded with beyond-radius rows
    val pageSizes = brute(3, _ => true).groupBy(_._1).map(_._2.size)
    assert(pageSizes.exists(_ < 3) && pageSizes.nonEmpty)
    // filtered ranked serving: same pruned scan, one pushed predicate
    assert(topk(3, Some(col("flag") === 0)) == brute(3, _ % 4 == 0))
    assert(topk(3, Some(col("flag") === 0)).nonEmpty)
  }

  // drifted odd half for the retrain specs: +0.15/dim pre-normalization
  // (the qe54 fixture) — appends land under the frozen natural-half
  // model, then retrain-at-compact must reproduce a fresh build
  private def retrainHalves = {
    val e = Tables.load(spark, sf, "embeddings")
    val nat = e.filter(col("vec_id") % 2 === 0)
    val drift = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") + lit(0.15))
          .as("embedding"))
    val union = nat.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double"))
          .as("embedding"))
      .unionByName(drift)
    (nat, drift, union)
  }

  test("IVF retrain at compact == fresh build on the live corpus (model, assignment, probes)") {
    import spark.implicits._
    val (nat, drift, union) = retrainHalves
    val store = tmp("st_retrivf")
    AnnIndex.writeIvfIndex(nat, col("vec_id"), col("embedding"), store,
      nList = 8, refineIters = 2)
    AnnIndex.appendIvfIndex(drift, col("vec_id"), col("embedding"),
      store)
    // tombstone one appended vector: the retrain must train WITHOUT it
    // and drop it physically — live corpus = union minus the delete
    AnnIndex.deleteVecs(spark, store, Seq(Tuple1(1L)).toDF("vec_id"),
      col("vec_id"))
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(2))
    val fresh = tmp("st_retrivf_f")
    AnnIndex.writeIvfIndex(union.filter(col("vec_id") =!= 1L),
      col("vec_id"), col("embedding"), fresh, nList = 8,
      refineIters = 2)
    // the retrained MODEL is bit-identical to the fresh build's (the
    // stored vectors ARE the normalized build inputs, and the
    // md5-seeded sample + 1e-6-rounded Lloyd rounds are deterministic);
    // post-retrain tables live under the flipped GENERATION root
    def centsOf(p: String) = spark.read
      .parquet(s"${AnnIndex.currentRoot(spark, p)}/centroids")
      .orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    assert(centsOf(store) == centsOf(fresh))
    // ... as is the re-assigned cell of every live row
    def cellsOf(p: String) = spark.read
      .parquet(s"${AnnIndex.currentRoot(spark, p)}/index")
      .select(col("vec_id"), col("cell")).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(cellsOf(store) == cellsOf(fresh) && cellsOf(store).nonEmpty)
    assert(!cellsOf(store).exists { case (id, _) => id == 1L })
    // ... and the probe surface
    val q = union.filter(col("vec_id") < 5)
    def top(p: String) = AnnIndex.ivfKnnJoinIndexed(spark, p, q,
        col("vec_id"), col("embedding"), k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(top(store) == top(fresh) && top(store).nonEmpty)
    // the NEW generation starts with no tombstone sidecar (trained
    // without the deleted rows); the old root keeps its sidecar for
    // probes still pinned to it, and both die at the next compact's
    // generation reap
    val newRoot = AnnIndex.currentRoot(spark, store)
    assert(newRoot != store &&
      !StoreFiles.exists(spark, s"$newRoot/tombstones") &&
      StoreFiles.exists(spark, s"$store/tombstones"))
    AnnIndex.compactAnnIndex(spark, store)
    assert(!StoreFiles.exists(spark, s"$store/tombstones") &&
      !StoreFiles.exists(spark, s"$store/index"))
    assert(top(store) == top(fresh))
  }

  test("retrainIfDrifted: control batch never triggers, drifted batch retrains once and quiesces") {
    val (nat, drift, _) = retrainHalves
    val store = tmp("st_retrdm")
    AnnIndex.writeIvfIndex(nat, col("vec_id"), col("embedding"), store,
      nList = 8, refineIters = 2)
    AnnIndex.appendIvfIndex(drift, col("vec_id"), col("embedding"),
      store)
    def check(batch: org.apache.spark.sql.DataFrame, max: Double) =
      AnnIndex.retrainIfDrifted(spark, store, batch, col("vec_id"),
        col("embedding"), maxRatio = max)
    // a control (in-distribution) batch sits near ratio 1 — no retrain
    def cents() = spark.read
      .parquet(s"${AnnIndex.currentRoot(spark, store)}/centroids")
      .orderBy("cell").collect().toSeq
    val centsBefore = cents()
    assert(!check(nat.limit(20), max = 1.1))
    assert(cents() == centsBefore)
    // the drifted batch exceeds the threshold — the retrain runs and
    // the model moves (to a new generation root)
    assert(check(drift, max = 1.1))
    assert(cents() != centsBefore)
    // ... and converges: the SAME drifted batch no longer triggers
    // against the refitted model
    assert(!check(drift, max = 1.1))
    // an empty arrival (everything gated upstream) carries no drift
    // evidence: false, never an NPE on the NULL ratio
    assert(!check(nat.limit(0), max = 1.1))
  }

  test("IVF-PQ retrain at compact == fresh build; attrs carry over; batch-keyed folds") {
    val (nat, drift, union) = retrainHalves
    val attrOf = (df: org.apache.spark.sql.DataFrame) =>
      pmod(col("vec_id"), lit(4)).cast("int").as("lang")
    val store = tmp("st_retrpq")
    AnnIndex.writeIvfPqIndex(nat, col("vec_id"), col("embedding"),
      store, nList = 4, numSub = 8, codebookSize = 8, refineIters = 2,
      attrs = Seq(attrOf(nat)))
    AnnIndex.appendIvfPqIndex(drift, col("vec_id"), col("embedding"),
      store, attrs = Seq(attrOf(drift)))
    // the drift monitor reads the IVF-PQ store's vectors/ table: the
    // drifted batch's quantization-error ratio must DROP once the
    // retrain refits the model to the union
    def driftRatio() = AnnIndex.assignmentDrift(spark, store, drift,
        col("vec_id"), col("embedding"))
      .head().getDouble(4)
    val ratioBefore = driftRatio()
    AnnIndex.compactAnnIndex(spark, store, retrainIters = Some(2))
    assert(driftRatio() < ratioBefore && ratioBefore > 0.0)
    val fresh = tmp("st_retrpq_f")
    AnnIndex.writeIvfPqIndex(union, col("vec_id"), col("embedding"),
      fresh, nList = 4, numSub = 8, codebookSize = 8, refineIters = 2,
      attrs = Seq(attrOf(union)))
    // model: centroids AND the residual codebook re-derive identically
    // (post-retrain tables live under the flipped generation root)
    def centsOf(p: String) = spark.read
      .parquet(s"${AnnIndex.currentRoot(spark, p)}/centroids")
      .orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    assert(centsOf(store) == centsOf(fresh))
    def cbOf(p: String) = spark.read
      .parquet(s"${AnnIndex.currentRoot(spark, p)}/codebook")
      .orderBy("m", "cidx", "dim").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getDouble(3))).toSeq
    assert(cbOf(store) == cbOf(fresh))
    // codes re-encode under the new model, attr columns intact
    def codesOf(p: String) = spark.read
      .parquet(s"${AnnIndex.currentRoot(spark, p)}/codes")
      .select(col("vec_id"), col("cell"), col("codes"), col("lang"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2),
        r.getInt(3))).toSeq
    assert(codesOf(store) == codesOf(fresh) && codesOf(store).nonEmpty)
    // probe surface, filtered and unfiltered
    val q = union.filter(col("vec_id") < 3)
    def top(p: String, f: Option[org.apache.spark.sql.Column]) =
      AnnIndex.ivfPqKnnJoinIndexed(spark, p, q, col("vec_id"),
          col("embedding"), k = 5, nProbe = 4, rerank = 20,
          attrFilter = f)
        .orderBy("query_id", "rank").collect().toSeq
    assert(top(store, None) == top(fresh, None))
    assert(top(store, Some(col("lang") === 1)) ==
      top(fresh, Some(col("lang") === 1)))
    assert(top(store, Some(col("lang") === 1)).nonEmpty)
    // batch-keyed store: the retrain folds to batch_id = -1 and keeps
    // the partitioned layout (later dynamic overwrites still compose)
    val bk = tmp("st_retrpq_bk")
    AnnIndex.writeIvfPqIndex(nat, col("vec_id"), col("embedding"), bk,
      nList = 4, numSub = 8, codebookSize = 8, refineIters = 2,
      batchKeyed = true)
    AnnIndex.putIvfPqBatch(drift, col("vec_id"), col("embedding"), bk,
      batchId = 0L)
    AnnIndex.compactAnnIndex(spark, bk, retrainIters = Some(2))
    import spark.implicits._
    val bkRoot = AnnIndex.currentRoot(spark, bk)
    assert(spark.read.parquet(s"$bkRoot/codes").select("batch_id")
      .distinct().as[Long].collect().toSeq == Seq(-1L))
    assert(spark.read.parquet(s"$bkRoot/vectors").select("batch_id")
      .distinct().as[Long].collect().toSeq == Seq(-1L))
    def topPlain(p: String) =
      AnnIndex.ivfPqKnnJoinIndexed(spark, p, q, col("vec_id"),
          col("embedding"), k = 5, nProbe = 4, rerank = 20)
        .orderBy("query_id", "rank").collect().toSeq
    // the batch-keyed retrain probes identically to the plain fresh
    // build (attrs aside): same live corpus, same deterministic model
    val freshPlain = tmp("st_retrpq_fp")
    AnnIndex.writeIvfPqIndex(union, col("vec_id"), col("embedding"),
      freshPlain, nList = 4, numSub = 8, codebookSize = 8,
      refineIters = 2)
    assert(topPlain(bk) == topPlain(freshPlain) && topPlain(bk).nonEmpty)
    // retrain on an untrained family fails loudly
    val lsh = tmp("st_retrlsh")
    AnnIndex.writeLshIndex(nat, col("vec_id"), col("embedding"), lsh,
      numPlanes = 4)
    val err = intercept[IllegalArgumentException] {
      AnnIndex.compactAnnIndex(spark, lsh, retrainIters = Some(2))
    }
    assert(err.getMessage.contains("trained store"))
  }
}
