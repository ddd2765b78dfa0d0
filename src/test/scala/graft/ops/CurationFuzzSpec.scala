package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz over the round-2 curation operators: properties a
  * hand-written fixture under-samples (weight shapes, budget boundary
  * collisions, remainder buckets, diff status partitions). Fixed seeds
  * (`pureApply`, same pattern as AsOfFuzzSpec) so failures reproduce. */
class CurationFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  test("splitAssign: total, scale-invariant weights, exact region edges") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val ws = sample(Gen.choose(1, 50), 4, seed.toLong).map(_.toDouble)
      val labels = Seq("a", "b", "c", "d")
      val splits = labels.zip(ws)
      val scaled = labels.zip(ws.map(_ * 7.0)) // same ratios
      val ids = sample(Gen.choose(0L, 100000L), 300, seed + 100L).distinct
      val df = ids.toDF("id")
      val s1 = df.select(col("id"),
        Sampling.splitAssign(col("id"), splits).as("s"))
      val s2 = df.select(col("id"),
        Sampling.splitAssign(col("id"), scaled).as("s"))
      // totality: every row gets a label from the declared set
      val got = s1.collect().map(r => r.getLong(0) -> r.getString(1))
      assert(got.length == ids.length)
      assert(got.forall(kv => labels.contains(kv._2)))
      // weight scaling does not move any assignment
      assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty)
    }
  }

  test("budgetSelect: never exceeds budget; selection is prefix-closed") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rows = sample(Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 30L),
        Gen.choose(1L, 15L)), 60, seed.toLong)
        .zipWithIndex.map { case ((g, sc, c), i) => (i.toLong, s"g$g", sc, c) }
      val df = rows.toDF("id", "grp", "score", "cost")
      val budget = 40L
      val got = Packing.budgetSelect(df, col("grp"), col("id"),
        col("score"), col("cost"), budget, col("id"))
      // per group: the cumulative cost of the selection stays <= budget
      val sums = got.groupBy("group").agg(sum("cost").as("c")).collect()
      assert(sums.forall(_.getAs[Long]("c") <= budget), sums.mkString(","))
      // prefix-closed: everything (score desc, id) BEFORE a selected row
      // whose own cum fits is also selected — reconstruct in Scala
      val byGroup = rows.groupBy(_._2)
      val sel = got.collect()
        .map(r => (r.getAs[String]("group"), r.getAs[Long]("doc_id"))).toSet
      byGroup.foreach { case (g, rs) =>
        val ordered = rs.sortBy(r => (-r._3, r._1))
        var cum = 0L
        ordered.foreach { r =>
          cum += r._4
          val expectSelected = cum <= budget
          assert(sel.contains((g, r._1)) == expectSelected,
            s"group $g doc ${r._1} cum $cum")
        }
      }
    }
  }

  test("quantileBuckets: sizes differ by at most 1, ordered by value") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val n = 37 + seed
      val vals = sample(Gen.choose(0L, 20L), n, seed.toLong) // heavy ties
        .zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      val df = vals.toDF("grp0", "id0", "v0")
      val k = 7
      val got = Stats.quantileBuckets(df, col("grp0"), col("id0"),
        col("v0"), col("id0"), k).collect()
      val sizes = got.groupBy(_.getAs[Long]("bucket")).view
        .mapValues(_.length).toMap
      assert(sizes.keySet == (1L to k.toLong).toSet)
      assert(sizes.values.max - sizes.values.min <= 1, sizes)
      // buckets are monotone in (value, tie) order
      val ordered = got.sortBy(r => (r.getAs[Long]("v"),
        r.getAs[Long]("doc_id"))).map(_.getAs[Long]("bucket"))
      assert(ordered.sameElements(ordered.sorted))
    }
  }

  test("corpusDiff: statuses partition the union of ids") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val oldRows = sample(Gen.zip(Gen.choose(0L, 40L),
        Gen.oneOf("x", "y", "z")), 30, seed.toLong)
        .distinctBy(_._1)
      val newRows = sample(Gen.zip(Gen.choose(0L, 40L),
        Gen.oneOf("x", "y", "w")), 30, seed + 50L)
        .distinctBy(_._1)
      val o = oldRows.toDF("doc_id", "text")
      val n = newRows.toDF("doc_id", "text")
      val got = Versioning.corpusDiff(o, n, col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val oldM = oldRows.toMap
      val newM = newRows.toMap
      assert(got.keySet == oldM.keySet ++ newM.keySet)
      got.foreach { case (id, st) =>
        val expected = (oldM.get(id), newM.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a == b => "same"
          case _ => "changed"
        }
        assert(st == expected, s"id $id: $st vs $expected")
      }
    }
  }
}
