package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: every pairwise method goes through a BLOCKING key
  * (LSH band bucket, simhash prefix, or a caller-supplied block column)
  * so the candidate join is an equi-join on the block — never an O(n²)
  * cross join. At 100 TB the block key is also the shuffle key, so one
  * exchange feeds signature, candidate generation, and verification.
  */
object Dedup {

  /** Exact dedup: group on a content fingerprint, keep the smallest id as
    * the canonical representative (deterministic). Pure hash-aggregate —
    * one shuffle on the fingerprint. */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(TextAnalysis.fingerprint(text).as("fp"), id.as("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, block, token) triples — the shared explode for the
    * set-similarity methods. */
  private def wordSet(docs: DataFrame, id: Column, block: Column,
      text: Column): DataFrame =
    docs.select(id.as("doc_id"), block.as("block"),
        explode(array_distinct(TextAnalysis.tokens(text))).as("w"))

  /** Exact n-gram (word-set) Jaccard similarity for all pairs within a
    * block, keeping pairs with similarity >= threshold.
    *
    * The block column bounds the candidate space (same role the LSH
    * bucket plays for MinHash); inverted-index self-join on token —
    * shuffles on (block, token), never materializes the cross product. */
  def ngramJaccardPairs(docs: DataFrame, id: Column, block: Column,
      text: Column, threshold: Double): DataFrame = {
    val words = wordSet(docs, id, block, text)
    val sizes = words.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val inter = words.as("a")
      .join(words.as("b"),
        col("a.w") === col("b.w") && col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        Num.floor4(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the document's token hashes. One array column — no
    * explode, no shuffle (xxhash64 is codegen'd). */
  def minhashSignature(text: Column, numHashes: Int): Column = {
    val toks = array_distinct(TextAnalysis.tokens(text))
    val sigs = (0 until numHashes).map { seed =>
      array_min(transform(toks, t => xxhash64(t, lit(seed))))
    }
    array(sigs: _*)
  }

  /** LSH banding over a MinHash signature: `numBands` buckets of
    * `rowsPerBand` signature entries each, hashed to a bucket id.
    * Docs sharing any (band, bucket) become candidate pairs. */
  def minhashCandidatePairs(docs: DataFrame, id: Column, text: Column,
      numBands: Int, rowsPerBand: Int): DataFrame = {
    val sig = minhashSignature(text, numBands * rowsPerBand)
    val banded = docs.select(id.as("doc_id"), sig.as("sig"))
      .select(col("doc_id"), posexplode(
        array((0 until numBands).map(b =>
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*))
        .as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash near-dup: LSH candidates verified with exact word-set
    * Jaccard (candidates only — the verify join is semi-bounded by LSH). */
  def minhashNearDup(docs: DataFrame, id: Column, text: Column,
      threshold: Double, numBands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val cands = minhashCandidatePairs(docs, id, text, numBands, rowsPerBand)
    val words = docs.select(id.as("doc_id"),
      array_distinct(TextAnalysis.tokens(text)).as("toks"))
    cands
      .join(words.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(words.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
      .withColumn("jaccard", Num.floor4(
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over token hashes: sign-sum each bit position of
    * xxhash64(token), weighted by token frequency 1. Expressed with array
    * ops (no UDF): for bit i, count tokens with bit set minus tokens with
    * bit clear; simhash bit i = 1 if positive. */
  def simhash64(text: Column): Column = {
    val hashes = transform(array_distinct(TextAnalysis.tokens(text)),
      t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val ones = size(filter(hashes,
        h => shiftright(h, i).bitwiseAND(lit(1L)) === 1L))
      val setBit = (ones * 2) > size(hashes)
      when(setBit, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup: block on the top `prefixBits` bits (near-dups
    * almost always share the high prefix), verify with full Hamming
    * distance <= maxHamming. Equi-join on the prefix — no cross join. */
  def simhashNearDup(docs: DataFrame, id: Column, text: Column,
      maxHamming: Int, prefixBits: Int = 12): DataFrame = {
    val sigs = docs.select(id.as("doc_id"), simhash64(text).as("sh"))
      .withColumn("prefix", shiftrightunsigned(col("sh"), 64 - prefixBits))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.prefix") === col("b.prefix") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", bit_count(col("a.sh").bitwiseXOR(col("b.sh"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
  }

  /** Embedding-cosine near-dup: pairs within a blocking key whose cosine
    * similarity >= threshold. Vectors are L2-normalized once up front so
    * the pair step is a pure dot product. */
  def embeddingNearDup(embs: DataFrame, id: Column, block: Column,
      vec: Column, threshold: Double): DataFrame = {
    val normed = embs.select(id.as("vec_id"), block.as("block"),
      Similarity.l2Normalize(vec).as("v"))
    normed.as("a")
      .join(normed.as("b"),
        col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(Similarity.dot(col("a.v"), col("b.v")), 4))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("cos"))
  }
}
