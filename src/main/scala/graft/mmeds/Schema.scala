package graft.mmeds

import org.apache.spark.sql.types._

/** Static schema registry for the MMEDS 41-table snowflake.
  *
  * The reference introspects MySQL at import time (`DESCRIBE` per table,
  * config.py:695-741) to build TABLE_COLS/COL_SIZES; here the registry is
  * pure data — no round trips. Table lists transcribed from
  * config.py:541-673; FK graph from sql/tables.sql:28-729.
  */
object Schema {

  /** Topological parent-before-child processing order
    * (config.py:541-584). */
  val tableOrder: Seq[String] = Seq(
    "Lab", "SampleProtocols", "RawDataProtocols", "ResultsProtocols",
    "ICDCode", "IllnessBroadCategory", "IllnessCategory", "IllnessDetails",
    "Interventions", "BodySite", "Type", "CollectionSite", "Study",
    "Experiment", "Genotypes", "Ethnicity", "Subjects", "Heights",
    "Weights", "Illness", "Intervention", "Chow", "ChowDates", "Species",
    "Strain", "Facility", "Housing", "Husbandry", "Vendor",
    "AnimalSubjects", "HousingDates", "SubjectType", "StorageLocation",
    "Specimen", "Aliquot", "SampleProtocol", "Sample", "RawDataProtocol",
    "RawData", "ResultsProtocol", "Results", "AdditionalMetaData")

  /** Tables expected in human-subject metadata (config.py:588-603). */
  val subjectTables: Set[String] = Set(
    "ICDCode", "IllnessBroadCategory", "IllnessCategory", "IllnessDetails",
    "Interventions", "Genotypes", "Ethnicity", "Subjects", "SubjectType",
    "Heights", "Weights", "Illness", "Intervention", "AdditionalMetaData")

  /** Tables expected in animal-subject metadata (config.py:605-618). */
  val animalSubjectTables: Set[String] = Set(
    "Chow", "ChowDates", "Species", "Strain", "Facility", "Housing",
    "HousingDates", "Husbandry", "Vendor", "AnimalSubjects", "SubjectType",
    "AdditionalMetaData")

  val mixedSubjectTables: Set[String] = subjectTables ++ animalSubjectTables

  /** Tables expected in specimen metadata (config.py:623). */
  val specimenTables: Set[String] =
    (tableOrder.toSet -- subjectTables -- animalSubjectTables) +
      "AdditionalMetaData"

  /** Row-level-security scope (config.py:628-650): only these tables get
    * `protected_` views; the rest are public. */
  val protectedTables: Set[String] = Set(
    "Aliquot", "Experiment", "Heights", "Illness", "Intervention", "Lab",
    "RawData", "RawDataProtocol", "Results", "ResultsProtocol", "Sample",
    "SampleProtocol", "Specimen", "Study", "Subjects", "Weights",
    "ChowDates", "HousingDates", "Husbandry", "AnimalSubjects",
    "SubjectType")

  /** M:N junction tables (config.py:652-656): (name, left parent, right
    * parent). */
  val junctionTables: Seq[(String, String, String)] = Seq(
    ("Subjects_has_Ethnicity", "Subjects", "Ethnicity"),
    ("SubjectType_has_Experiment", "SubjectType", "Experiment"),
    ("Subjects_has_Genotypes", "Subjects", "Genotypes"))

  /** Tables holding the parsed ICD-code fragments (config.py ICD_TABLES);
    * their columns come from parsing `ICDCode.ICDCode`, not the sheet. */
  val icdTables: Set[String] =
    Set("IllnessBroadCategory", "IllnessCategory", "IllnessDetails")

  /** FK graph: child table -> parent tables, in sheet-processing order
    * (sql/tables.sql FK indexes; e.g. Specimen's six parents at
    * tables.sql:295-317). The engine names every FK column
    * `<Parent>_id<Parent>`; the reference's lone deviation
    * (`Results.RawData_Sample_idSample`, tables.sql:606) is normalized
    * to `RawData_idRawData`. */
  val parents: Map[String, Seq[String]] = Map(
    "Study" -> Seq("Lab"),
    "Experiment" -> Seq("Study"),
    "IllnessCategory" -> Seq("IllnessBroadCategory"),
    "IllnessDetails" -> Seq("IllnessCategory"),
    "Illness" -> Seq("Subjects", "IllnessDetails"),
    "Intervention" -> Seq("Subjects", "Interventions"),
    "Heights" -> Seq("Subjects"),
    "Weights" -> Seq("Subjects"),
    "ChowDates" -> Seq("Chow"),
    "Strain" -> Seq("Species"),
    "AnimalSubjects" -> Seq(
      "ChowDates", "Strain", "Facility", "Husbandry", "Vendor"),
    "HousingDates" -> Seq("AnimalSubjects", "Housing"),
    "SubjectType" -> Seq("Subjects", "AnimalSubjects"),
    "Specimen" -> Seq("Type", "BodySite", "Experiment", "CollectionSite",
      "SubjectType", "StorageLocation"),
    "Aliquot" -> Seq("Specimen", "StorageLocation"),
    "SampleProtocol" -> Seq("SampleProtocols"),
    "Sample" -> Seq("SampleProtocol", "Aliquot", "StorageLocation"),
    "RawDataProtocol" -> Seq("RawDataProtocols"),
    "RawData" -> Seq("Sample", "RawDataProtocol"),
    "ResultsProtocol" -> Seq("ResultsProtocols"),
    "Results" -> Seq("RawData", "ResultsProtocol"))

  def idCol(table: String): String = s"id$table"
  def fkCol(parent: String): String = s"${parent}_id$parent"

  /** Declared metadata type name -> Spark type (TYPE_MAP,
    * config.py:751-761). MySQL TIME has no Spark type: kept as
    * StringType "HH:MM:SS" (SURVEY §1.3). */
  def sparkType(declared: String): DataType = declared match {
    case "Decimal" | "Number" => DoubleType
    case "Integer" => LongType
    case "Date" => DateType
    case "Time" => StringType
    case _ => StringType // Text / Text: Must be unique / Email / Web Address
  }

  /** The public-user sentinel: rows with user_id = 1 are visible to
    * everyone (sql/functions.sql:33-50, sql_builder.py:190-193). */
  val publicUserId: Long = 1L
}
