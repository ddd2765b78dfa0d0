package graft.mmeds

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A study/analysis document — the Mongo `MMEDSDoc`
  * (database/documents.py:12-48) as a typed row: `files` and `config`
  * are the reference's only MapType data (SURVEY §1.3). */
case class MmedsDoc(
    doc_id: Long,
    doc_type: String, // study | analysis | sequencing_run
    owner: String,
    email: String,
    study_code: String, // access code (config.py:863-865 random gen)
    study_name: String,
    analysis_type: String,
    created: java.sql.Timestamp,
    files: Map[String, String],
    config: Map[String, String])

/** The document catalog replacing MongoDB (SURVEY §1.1, §7 stage 8):
  * access-code lookups, per-study listings, file maps — plain DataFrame
  * filters over one `docs` table instead of mongoengine queries
  * (database.py:815-1120). */
class Docs(spark: SparkSession, catalog: Catalog) {
  import spark.implicits._

  val tableName = "docs"

  def all: Dataset[MmedsDoc] =
    catalog.table(tableName)
      .map(_.as[MmedsDoc])
      .getOrElse(spark.emptyDataset[MmedsDoc])

  def save(docs: Seq[MmedsDoc]): Unit =
    catalog.append(tableName, docs.toDF())

  /** Access-code lookup (database.py:839,856: `.first()` on filtered
    * docs -> limit(1)). */
  def byAccessCode(owner: String, code: String): Option[MmedsDoc] =
    all.filter(d => d.owner == owner && d.study_code == code)
      .limit(1).collect().headOption

  /** All docs of a study, newest first. */
  def forStudy(studyName: String): Dataset[MmedsDoc] =
    all.filter(_.study_name == studyName)
      .orderBy(col("created").desc)

  /** Distinct sequencing-run NAMES in first-seen order — a run doc
    * stores its run name in `study_name`
    * (database/database.py:1030-1043: the run list is distinct
    * RawDataProtocolID values, each resolved to the sequencing_run doc
    * with that study_name). */
  def sequencingRuns: DataFrame =
    all.filter(_.doc_type == "sequencing_run")
      .groupBy(col("study_name"))
      .agg(min(col("created")).as("first_seen"))
      .orderBy(col("first_seen"))

  /** Run-name guard (database/database.py:1023-1028): alphanumeric/_
    * only and not already in use. Returns the rejection reason. */
  def checkSequencingRunName(name: String): Option[String] =
    if (!Functions.validRunName(name))
      Some("Only alpha-numeric characters and '_' are allowed in the " +
        "sequencing run name")
    else if (!all.filter(d => d.doc_type == "sequencing_run" &&
        d.study_name == name).isEmpty)
      Some(s"Sequencing Run name $name already in use")
    else None

  /** The per-doc file index (documents.py:52-70 writes file_index.tsv on
    * each save): exploded (doc_id, file_key, path) rows. */
  def fileIndex: DataFrame =
    all.toDF().select(col("doc_id"), col("study_name"),
      explode_outer(col("files")).as(Seq("file_key", "path")))

  /** Analysis directory numbering (documents.py:109-115:
    * `{name}_{analysis}_{run_id}` incrementing until free): next free
    * run id per (study, analysis). */
  def nextRunId(studyName: String, analysisType: String): Long =
    all.filter(d => d.study_name == studyName &&
        d.analysis_type == analysisType)
      .count()
}
