package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz for BM25 against a straight-line in-memory
  * reference implementation — random corpora exercise the formula
  * corners a fixed fixture under-samples (df = 0, df = N, empty docs,
  * repeated terms, tie ranks). Fixed seeds so failures reproduce. */
class RetrievalFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")

  /** Reference BM25 identical in math (and operation order) to
    * TextAnalysis.bm25TopK. */
  private def refBm25(docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double, b: Double): Map[Long, Double] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfs = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble)
      .toMap
    toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      val score = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
        idf * tf * (k1 + 1.0) /
          (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.sum
      id -> BigDecimal(score).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
  }

  test("bm25TopK matches the in-memory reference on random corpora") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val nDocs = 12 + seed
      val docGen = Gen.chooseNum(0, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
      val texts = sample(docGen, nDocs, seed.toLong * 31)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // drop corpora that are all-empty (avgdl = 0 is undefined BM25)
      if (docs.exists(_._2.trim.nonEmpty)) {
        val terms = sample(Gen.oneOf(vocab), 3, seed + 77L).distinct
        val expected = refBm25(docs, terms, 1.2, 0.75)
        val got = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"),
            col("doc_id"), col("text"), terms, k = nDocs)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got.keySet == expected.keySet, s"seed $seed ids differ")
        got.foreach { case (id, s) =>
          assert(math.abs(s - expected(id)) <= 1e-4,
            s"seed $seed doc $id: spark $s vs ref ${expected(id)}")
        }
        // ranking order: rounded score desc, id asc — verify the top row
        val top = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"),
            col("doc_id"), col("text"), terms, k = 1)
          .head()
        val bestRef = expected.toSeq.sortBy { case (id, s) => (-s, id) }.head
        assert(top.getLong(0) == bestRef._1, s"seed $seed top-1 differs")
      }
    }
  }
}
