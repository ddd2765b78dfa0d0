package graft.mmeds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Human-readable hierarchical ID generation
  * (database.py:623-719: `{SpecimenID}-Aliquot{n}`,
  * `{AliquotID}-Sample{n}`).
  *
  * The reference runs one COUNT query per new child under a global DB
  * lock (server.py:1404-1406). Set-based translation: number a whole
  * batch of new children with `row_number` per parent (ordered by a
  * caller-supplied deterministic column), offset by the parent's current
  * child count — one shuffle on the parent key, no lock. */
object IdGen {

  /** Assign IDs to `newChildren`: parent key in `parentKey`, the parent's
    * display id in `parentIdCol`, ordering within a parent by `orderBy`.
    * `existing` (same parent key) provides the continuation offsets.
    * Adds `<idColName> = {parentId}-{label}{n}` (n starts at the current
    * count, matching the reference's zero-based naming). */
  def assignChildIds(newChildren: DataFrame, existing: Option[DataFrame],
      parentKey: String, parentIdCol: String, orderBy: Column,
      label: String, idColName: String): DataFrame = {
    val offsets = existing match {
      case Some(ex) => ex.groupBy(col(parentKey))
        .agg(count(lit(1)).as("_offset"))
      case None => newChildren.sparkSession.emptyDataFrame
        .withColumn(parentKey, lit(null).cast("long"))
        .withColumn("_offset", lit(0L))
    }
    val w = Window.partitionBy(col(parentKey)).orderBy(orderBy)
    newChildren
      .join(broadcast(offsets), Seq(parentKey), "left_outer")
      .withColumn("_n",
        row_number().over(w).cast("long") - 1 +
          coalesce(col("_offset"), lit(0L)))
      .withColumn(idColName,
        concat(col(parentIdCol), lit(s"-$label"), col("_n")))
      .drop("_offset", "_n")
  }

  /** Export the per-study ID table (database.py:774-810
    * `create_ids_file`): SpecimenID -> AliquotID -> SampleID. */
  def idsForStudy(catalog: Catalog, studyName: String): DataFrame = {
    val specimen = catalog.table("Specimen").get
    val aliquot = catalog.table("Aliquot").get
    val sample = catalog.table("Sample").get
    val experiment = catalog.table("Experiment").get
    val study = catalog.table("Study").get
      .filter(col("StudyName") === studyName)
    specimen
      .join(broadcast(experiment),
        col(Schema.fkCol("Experiment")) === col(Schema.idCol("Experiment")))
      .join(broadcast(study),
        col(Schema.fkCol("Study")) === col(Schema.idCol("Study")))
      .join(aliquot,
        specimen(Schema.idCol("Specimen")) === aliquot(Schema.fkCol("Specimen")))
      .join(sample,
        aliquot(Schema.idCol("Aliquot")) === sample(Schema.fkCol("Aliquot")),
        "left_outer")
      .select(col("StudyName"), col("SpecimenID"), col("AliquotID"),
        col("SampleID"))
      .distinct()
  }
}
