package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz for the composed as-of join: on random datasets
  * dense with key collisions and EQUAL timestamps (the tie cases a
  * hand-written fixture under-samples), `AsOf.asofJoin` must equal a
  * brute-force per-row reference computed in plain Scala. Seeds are
  * fixed (`pureApply`, same pattern as GuardFuzzSpec) so failures
  * reproduce exactly. */
class AsOfFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  test("asofJoin equals the brute-force reference on random tie-heavy data") {
    import spark.implicits._
    val keyGen = Gen.choose(0L, 4L)
    val tsGen = Gen.choose(0L, 20L) // tiny domain -> many equal-ts ties
    for (seed <- 1 to 8) {
      val leftRows = sample(Gen.zip(keyGen, tsGen), 40, seed.toLong)
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rightRows = sample(Gen.zip(keyGen, tsGen), 40, seed.toLong + 1000)
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val l = leftRows.toDF("event_id", "user_id", "ts")
      val r = rightRows.toDF("user_id", "ts", "p")
      val got = AsOf.asofJoin(l, r, "user_id", "ts", Seq("p"),
          tieBreak = Seq("p"))
        .select("event_id", "asof_p").collect()
        .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      val expected = leftRows.map { case (id, k, t) =>
        val cands = rightRows.filter(rr => rr._1 == k && rr._2 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(rr => (rr._2, rr._3))._3))
      }.toMap
      assert(got == expected, s"mismatch at seed $seed")
    }
  }

  test("NATIVE as-of exec equals the composed form on tie-heavy fuzz data") {
    import spark.implicits._
    val keyGen = Gen.choose(0L, 4L)
    val tsGen = Gen.choose(0L, 20L)
    for (seed <- 1 to 8) {
      val leftRows = sample(Gen.zip(keyGen, tsGen), 40, seed.toLong + 7000)
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rightRows = sample(Gen.zip(keyGen, tsGen), 40, seed.toLong + 8000)
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val l = leftRows.toDF("event_id", "user_id", "ts").repartition(5)
      val r = rightRows.toDF("user_id", "ts", "p").repartition(3)
      def collectMap(df: org.apache.spark.sql.DataFrame) =
        df.select("event_id", "asof_p").collect()
          .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
          .toMap
      val composed = collectMap(AsOf.asofJoin(l, r, "user_id", "ts",
        Seq("p"), tieBreak = Seq("p")))
      val native = collectMap(graft.plans.AsOfNative.asofJoin(l, r,
        "user_id", "ts", Seq("p"), tieBreak = Seq("p")))
      assert(native == composed, s"native != composed at seed $seed")
      // STRING keys: buffered key values must survive the sort
      // iterator's row-buffer reuse (copyValue discipline)
      val ls = l.withColumn("user_id",
        concat(lit("u"), col("user_id").cast("string")))
      val rs = r.withColumn("user_id",
        concat(lit("u"), col("user_id").cast("string")))
      val composedS = collectMap(AsOf.asofJoin(ls, rs, "user_id", "ts",
        Seq("p"), tieBreak = Seq("p")))
      val nativeS = collectMap(graft.plans.AsOfNative.asofJoin(ls, rs,
        "user_id", "ts", Seq("p"), tieBreak = Seq("p")))
      assert(nativeS == composedS, s"string-key native != composed, seed $seed")
    }
  }

  test("native as-of plans as AsOfJoinExec with left filters pushed below") {
    import spark.implicits._
    val l = Seq((1L, 1L, 5L), (2L, 2L, 6L)).toDF("event_id", "user_id", "ts")
    val r = Seq((1L, 4L, 9L)).toDF("user_id", "ts", "p")
    val joinedPlan = graft.plans.AsOfNative.asofJoin(l, r, "user_id", "ts",
      Seq("p")).queryExecution.executedPlan.toString
    // TreeNode renders AsOfJoinExec as "AsOfJoin" (Exec suffix stripped)
    assert(joinedPlan.contains("AsOfJoin"), joinedPlan)
    assert(!joinedPlan.contains("Window"), joinedPlan)
    // a filter on left columns lands BELOW the exec (pushdown rule)
    val filtered = graft.plans.AsOfNative.asofJoin(l, r, "user_id", "ts",
        Seq("p")).filter(col("event_id") === 1L)
    val opt = filtered.queryExecution.optimizedPlan.toString
    val nodeIdx = opt.indexOf("AsOfJoinNode")
    val filterIdx = opt.indexOf("Filter")
    assert(nodeIdx >= 0 && filterIdx > nodeIdx,
      s"left-only filter should sit below the as-of node:\n$opt")
    assert(filtered.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
