package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: interleave correctness against a reference bit-twiddle
  * and the 2-D locality claim (files prune on BOTH dimensions). */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def refZ(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the reference interleave bit for bit") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (4095L, 0L),
      (0L, 4095L), (2731L, 1365L), (4095L, 4095L), (123L, 987L))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Sharding.zValue(col("a"), col("b"), 12)
        .as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == refZ(a, b, 12), s"($a, $b)")
    }
  }

  test("z-ordered files have 2-D locality; single-dim sort does not") {
    // full 256×256 grid — a uniform 2-D key space (the sf0.001 events
    // table has only 15 distinct users, too narrow to exercise layout)
    val e = spark.range(65536L).toDF("id")
      .select(col("id"), (col("id") % 256).as("da"),
        ((col("id") / 256).cast("long") % 256).as("db"))
    val numFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    Sharding.writeZOrdered(e, col("da"), col("db"), 8, numFiles, zDir)
    // contrast: range-layout on db ONLY (the single-column sort answer)
    val bDir = java.nio.file.Files.createTempDirectory("bord").toString
    e.repartitionByRange(numFiles, col("db"))
      .sortWithinPartitions(col("db"))
      .write.mode("overwrite").parquet(bDir)

    // fraction of files whose [min(da), max(da)] intersects da < 64
    // (a quarter of dimension a) — what parquet row-group stats prune on
    def filesIntersecting(dir: String): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("da")), max(col("da"))).head()
        r.getLong(0) < 64
      }
    }
    val zHit = filesIntersecting(zDir)
    val bHit = filesIntersecting(bDir)
    // db-only layout scatters da uniformly: every file intersects.
    // z-order confines the low-da quarter to ~half the z-range.
    assert(zHit < bHit, s"z-order $zHit files vs single-dim $bHit")
    assert(zHit <= numFiles / 2, s"z-order locality too weak: $zHit")
  }
}
