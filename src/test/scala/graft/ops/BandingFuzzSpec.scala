package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz for the generalized-pigeonhole Hamming banding —
  * the exactness guarantee every 64-bit fingerprint surface rides
  * (SimHash near-dup, image aHash and audio dHash pairing, the
  * persisted [[FingerprintIndex]]). Random signatures with planted
  * neighbors at distances r−1, r, r+1 exercise both sides of the
  * radius at every compound-key branch: c = 1 (r = 1, 3), c = 2
  * (r = 8), and c = 3 (r = 10). Fixed seed so failures reproduce. */
class BandingFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def flip(x: Long, bits: Seq[Int]): Long =
    bits.foldLeft(x)((v, b) => v ^ (1L << b))

  test("banded Hamming near-dup equals brute force at every compound-key branch") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (r <- Seq(1, 3, 8, 10)) {
      val sigs = Seq.tabulate(40) { i =>
        (i, rnd.nextLong())
      }.flatMap { case (i, base) =>
        val id0 = i.toLong * 10
        // planted neighbors at exact distances r-1, r, r+1: distinct
        // flipped bits make the distance exact, so the fixture holds
        // pairs just inside, on, and just outside the radius
        (id0, base) +: Seq(r - 1, r, r + 1).filter(_ >= 0).zipWithIndex
          .map { case (d, j) =>
            (id0 + j + 1,
              flip(base, rnd.shuffle((0 until 64).toList).take(d)))
          }
      }
      val got = Dedup.hammingNearDup(sigs.toDF("doc_id", "sh"),
          col("doc_id"), col("sh"), maxHamming = r)
        .collect().map(x => (x.getLong(0), x.getLong(1),
          x.getInt(2))).toSet
      val brute = (for {
        (a, ha) <- sigs; (b, hb) <- sigs if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= r
      } yield (a, b, d)).toSet
      assert(got == brute, s"radius $r")
      assert(brute.nonEmpty, s"radius $r fixture")
    }
  }

  test("the persisted store serves the same exactness: probe == brute at a non-default radius") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sigs = Seq.tabulate(30) { i =>
      (i, rnd.nextLong())
    }.flatMap { case (i, base) =>
      val id0 = i.toLong * 4
      Seq((id0, base),
        (id0 + 1, flip(base, rnd.shuffle((0 until 64).toList).take(8))))
    }
    val df = sigs.toDF("doc_id", "sh")
    val path =
      java.nio.file.Files.createTempDirectory("fpfuzz").toString
    FingerprintIndex.writeHammingIndex(
      df.filter(col("doc_id") % 2 === 0), col("doc_id"), col("sh"),
      path, maxHamming = 8)
    val got = FingerprintIndex.hammingAgainstIndex(spark,
        df.filter(col("doc_id") % 2 === 1), col("doc_id"), col("sh"),
        path)
      .collect().map(x => (x.getLong(0), x.getLong(1),
        x.getInt(2))).toSet
    val brute = (for {
      (a, ha) <- sigs if a % 2 == 1
      (b, hb) <- sigs if b % 2 == 0
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 8
    } yield (a, b, d)).toSet
    assert(got == brute && brute.nonEmpty)
  }
}
