package graft.mmeds

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet warehouse catalog: durability, append semantics, and the
  * scale property that matters — RLS resolving to partition pruning. */
class ParquetCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("append/table round-trip, user_id partition layout, RLS pruning") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("warehouse").toString
    val cat = new ParquetCatalog(spark, root)
    cat.append("Lab", Seq((1L, "LabA", 2L), (2L, "LabB", 3L))
      .toDF("idLab", "LabName", "user_id"))
    cat.append("Lab", Seq((3L, "LabC", 2L))
      .toDF("idLab", "LabName", "user_id"))
    assert(cat.table("Lab").get.count() == 3)
    assert(cat.tableNames == Seq("Lab"))
    // hive partition dirs exist per user
    val dirs = new java.io.File(s"$root/Lab").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("user_id=2", "user_id=3"))

    // the RLS filter becomes partition pruning, not a data scan filter
    val engine = new Engine(spark, cat)
    val visible = engine.forUser(3L).resolve("Lab")
    assert(visible.collect().map(_.getAs[String]("LabName")).toSeq ==
      Seq("LabB"))
    val physical = visible.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("user_id"))

    // overwrite keeps partitioning and survives self-reference
    val without3 = cat.table("Lab").get.filter(col("user_id") =!= 3L)
    cat.overwrite("Lab", without3)
    assert(cat.table("Lab").get.count() == 2)
  }

  test("schema evolution: append with a new column null-fills old rows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("warehouse").toString
    val cat = new ParquetCatalog(spark, root)
    cat.append("Study", Seq((1L, "s1")).toDF("idStudy", "StudyName"))
    // evolved append: a column the first write never had
    cat.append("Study",
      Seq((2L, "s2", "code2")).toDF("idStudy", "StudyName", "StudyCode"))
    val got = cat.table("Study").get.orderBy("idStudy").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // old row reads null for the evolved column; new row carries it
    assert(got(0).isNullAt(got(0).fieldIndex("StudyCode")))
    assert(got(1).getAs[String]("StudyCode") == "code2")
  }

  test("round-trip preserves column order and types despite hive partitioning") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("warehouse2").toString
    val cat = new ParquetCatalog(spark, root)
    val written = Seq((1L, 10L, "A"), (2L, 11L, "B"))
      .toDF("idLab", "user_id", "LabName")
    cat.append("Lab", written)
    val back = cat.table("Lab").get
    // hive inference alone would type user_id int and move it to the end;
    // the persisted schema restores names, order, and types as written
    // (nullability is always relaxed on a parquet read — expected)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      written.schema.map(f => (f.name, f.dataType)))
    // so typed Dataset reads and strict unions keep working
    assert(written.unionByName(back).count() == 4)
    assert(back.as[(Long, Long, String)].collect().sorted.toSeq ==
      Seq((1L, 10L, "A"), (2L, 11L, "B")))
  }
}
