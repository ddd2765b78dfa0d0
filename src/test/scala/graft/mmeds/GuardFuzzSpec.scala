package graft.mmeds

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style fuzz of the two SQL-guard surfaces: the identifier
  * validator behind quote_sql and the restricted-WHERE grammar walk.
  * Deterministic ScalaCheck sampling (fixed seed) so failures reproduce.
  */
class GuardFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  // ---- validIdentifier ----

  test("fuzz: validIdentifier accepts exactly the declared shape") {
    val anyString = Gen.listOfN(8,
      Gen.frequency(
        6 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('_', ' ', '-', '\'', '"', ';', '.', '('),
        1 -> Gen.choose(128.toChar, 255.toChar))).map(_.mkString)
    sample(anyString, 500, 11L).foreach { s =>
      val expected = s.nonEmpty && s.length <= 66 &&
        s.head.isLetter && s.forall(c => c.isLetterOrDigit || c == '_')
      assert(Functions.validIdentifier(s) == expected, s"on <$s>")
    }
    // quote-bearing and statement-separator strings never validate
    Seq("a'b", "a;b", "a\"b", "a b", "1ab", "", "a-b", "Robert'); DROP")
      .foreach(s => assert(!Functions.validIdentifier(s), s"on <$s>"))
  }

  // ---- restricted WHERE walk ----

  private val colGen = Gen.oneOf("BodySite", "StudyName", "SpecimenWeight",
    "Nationality", "SubjectIdCol")
  private val litGen = Gen.oneOf("'stool'", "42", "3.5", "'O''Brien'")
  private val cmpGen = for {
    c <- colGen
    op <- Gen.oneOf("=", "!=", "<", ">", "<=", ">=")
    l <- litGen
  } yield s"$c $op $l"

  private def exprGen(depth: Int): Gen[String] =
    if (depth <= 0) cmpGen
    else Gen.frequency(
      3 -> cmpGen,
      2 -> (for {
        a <- exprGen(depth - 1); b <- exprGen(depth - 1)
        j <- Gen.oneOf("AND", "OR")
      } yield s"($a $j $b)"),
      1 -> exprGen(depth - 1).map(e => s"NOT ($e)"))

  test("fuzz: every expression from the allowed grammar walks clean") {
    val sess = new Engine(spark, new InMemoryCatalog).forUser(1L)
    sample(exprGen(3), 200, 17L).foreach { w =>
      val cols = sess.extractWhereColumns(w)
      assert(cols.nonEmpty, s"on <$w>")
      assert(cols.forall(c => Seq("BodySite", "StudyName", "SpecimenWeight",
        "Nationality", "SubjectIdCol").contains(c)), s"on <$w>")
    }
  }

  test("fuzz: injections and disallowed constructs always throw") {
    val sess = new Engine(spark, new InMemoryCatalog).forUser(1L)
    val nasty = Seq(
      "BodySite IN ('a','b')",
      "BodySite LIKE '%x%'",
      "SpecimenWeight BETWEEN 1 AND 2",
      "(SELECT max(x) FROM Subjects) = 1",
      "rand() > 0.5",
      "BodySite = 'a'; DROP TABLE Subjects",
      "CASE WHEN BodySite = 'a' THEN 1 ELSE 0 END = 1",
      "EXISTS (SELECT 1)",
      "BodySite = (SELECT 1)",
      "substring(StudyName, 1, 1) = 'x'",
      "StudyName || 'x' = 'ax'",
      "SpecimenWeight + 1 > 2",
      "BodySite IS NULL")
    nasty.foreach { w =>
      assertThrows[Exception](sess.extractWhereColumns(w))
    }
    // and any valid expression with a nasty tail still throws
    sample(exprGen(2), 50, 23L).zip(Iterator.continually(nasty).flatten.take(50).toSeq)
      .foreach { case (ok, bad) =>
        assertThrows[Exception](
          sess.extractWhereColumns(s"($ok) OR ($bad)"))
      }
  }
}
