package graft.mmeds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wide metadata sheet -> normalized snowflake with deterministic
  * surrogate keys.
  *
  * The reference runs a recursive find-or-create match query per row per
  * table (sql_builder.py:44-194, metadata_uploader.py:265-311: O(rows ×
  * tables) round trips, memoized). Here that collapses into one set-based
  * pass per table (SURVEY §3.2): distinct natural-key tuples, NULL-safe
  * left join against the existing dimension for known keys, then
  * `row_number` over a total order of the tuple columns + current max id
  * for new keys. Deterministic across partitions and re-ingests
  * (idempotent: re-running the same sheet allocates nothing new).
  *
  * Scale: per-table tuple sets are small relative to the fact sheet;
  * each attach-join broadcasts the dimension back onto the sheet.
  */
object Normalizer {

  /** Result of one ingest: per-table rows appended (new tuples only). */
  case class Ingested(appended: Map[String, DataFrame])

  private def flat(table: String, column: String) = s"${table}__$column"

  /** Derive the parsed ICD columns onto the sheet (util.py:575-610):
    * ICDCode.ICDCode -> IllnessBroadCategory.ICDFirstCharacter,
    * IllnessCategory.ICDCategory, IllnessDetails.{ICDDetails,
    * ICDExtension}. */
  def parseIcdCodes(df: DataFrame): DataFrame = {
    val codeCol = flat("ICDCode", "ICDCode")
    if (!df.columns.contains(codeCol)) df
    else {
      val c = col(codeCol)
      df.withColumn(codeCol, Icd.filled(c))
        .withColumn(flat("IllnessBroadCategory", "ICDFirstCharacter"),
          Icd.firstCharacter(c))
        .withColumn(flat("IllnessCategory", "ICDCategory"), Icd.category(c))
        .withColumn(flat("IllnessDetails", "ICDDetails"), Icd.details(c))
        .withColumn(flat("IllnessDetails", "ICDExtension"), Icd.extension(c))
    }
  }

  /** Natural (user-facing) columns of `table` present on the sheet,
    * including ICD-derived ones. */
  private def naturalCols(sheet: MetadataSheet, df: DataFrame,
      table: String): Seq[String] = {
    val declared = sheet.columnsOf(table).map(_.flatName)
    val icdDerived = table match {
      case "IllnessBroadCategory" => Seq(flat(table, "ICDFirstCharacter"))
      case "IllnessCategory" => Seq(flat(table, "ICDCategory"))
      case "IllnessDetails" =>
        Seq(flat(table, "ICDDetails"), flat(table, "ICDExtension"))
      case _ => Seq.empty
    }
    (declared ++ icdDerived).distinct.filter(df.columns.contains)
  }

  /** Ingest one full (joined) sheet for `userId` into `catalog`.
    *
    * For each table in topological order: assign/reuse surrogate keys
    * over (natural cols + parent FK ids), append only new tuples, and
    * attach the key back onto the sheet so children can reference it.
    * Junction tables fill from the attached key pairs
    * (metadata_uploader.py:377-426). */
  def ingest(sheet: MetadataSheet, userId: Long,
      catalog: Catalog): Ingested = {
    var annotated = parseIcdCodes(sheet.df)
    val appended = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    var tablesDone = 0

    for (table <- Schema.tableOrder if table != "AdditionalMetaData") {
      val nats = naturalCols(sheet, annotated, table)
      val fkParents = Schema.parents.getOrElse(table, Seq.empty)
        .filter(p => annotated.columns.contains(Schema.idCol(p)))
      val keyCols = nats ++ fkParents.map(Schema.idCol)
      if (keyCols.nonEmpty) {
        val id = Schema.idCol(table)
        // entity exists on a row iff any natural col (or, for pure
        // link tables, any parent key) is non-null — all-null tuples
        // are "no entity" and keep a null FK (sql_builder.py:120-124)
        val present =
          (if (nats.nonEmpty) nats else keyCols)
            .map(col(_).isNotNull).reduce(_ || _)
        val tuples = annotated.filter(present)
          .select(keyCols.map(col): _*).distinct()

        // stored tables carry bare natural names and FK-named parent ids;
        // rename back to the sheet's flat/attached names for matching
        val existing = catalog.table(table).map(_.withColumnsRenamed(
          nats.map(n => n.stripPrefix(s"${table}__") -> n).toMap ++
            fkParents.map(p => Schema.fkCol(p) -> Schema.idCol(p)).toMap))
        val known: Option[DataFrame] = existing.map { ex =>
          ex.select((id +: keyCols).map(col): _*)
        }
        val joined = known match {
          case Some(ex) =>
            val cond = keyCols.map(c => tuples(c) <=> ex(c)).reduce(_ && _)
            tuples.join(ex.withColumnRenamed(id, "_known_id"), cond,
              "left_outer")
              .select((keyCols.map(tuples(_)) :+ col("_known_id")): _*)
          case None => tuples.withColumn("_known_id", lit(null).cast("long"))
        }
        val maxId = existing
          .map(_.agg(coalesce(max(col(id)), lit(0L))).head().getLong(0))
          .getOrElse(0L)
        val newIdW = Window.orderBy(keyCols.map(col): _*)
        val newRows = joined.filter(col("_known_id").isNull)
          .withColumn(id, row_number().over(newIdW).cast("long") + maxId)
          .drop("_known_id")
        val dim = joined.filter(col("_known_id").isNotNull)
          .withColumn(id, col("_known_id")).drop("_known_id")
          .unionByName(newRows)
          // dims are tuple-distinct and small; cache for the attach join
          .localCheckpoint(eager = false)

        // stored tables use bare column names (HostSubjectId, not
        // Subjects__HostSubjectId) so the view stack reads naturally
        val stored = newRows
          .withColumn("user_id", lit(userId))
          .withColumnsRenamed(
            nats.map(n => n -> n.stripPrefix(s"${table}__")).toMap ++
              fkParents.map(p => Schema.idCol(p) -> Schema.fkCol(p)).toMap)
        if (!stored.isEmpty) {
          catalog.append(table, stored)
          appended(table) = stored
        }

        // attach idT back onto every sheet row (null where absent)
        val dimK = dim.select((id +: keyCols).map(col): _*)
        val cond = keyCols.map(c => annotated(c) <=> dimK(c)).reduce(_ && _)
        annotated = annotated.join(broadcast(dimK.select(
          (col(id) +: keyCols.map(c => col(c).as(s"_k_$c"))): _*)),
          keyCols.map(c => annotated(c) <=> col(s"_k_$c")).reduce(_ && _),
          "left_outer")
          .drop(keyCols.map(c => s"_k_$c"): _*)

        // ~40 chained joins would grow an unanalyzable plan: cut the
        // lineage every few tables (sheet-sized data, cheap)
        tablesDone += 1
        if (tablesDone % 8 == 0) annotated = annotated.localCheckpoint()
      }
    }

    // junction tables: distinct attached key pairs per sheet row
    for ((jt, l, r) <- Schema.junctionTables) {
      val (lid, rid) = (Schema.idCol(l), Schema.idCol(r))
      if (annotated.columns.contains(lid) && annotated.columns.contains(rid)) {
        val pairs = annotated
          .filter(col(lid).isNotNull && col(rid).isNotNull)
          .select(col(lid).as(Schema.fkCol(l)), col(rid).as(Schema.fkCol(r)))
          .distinct()
          .withColumn("user_id", lit(userId))
        val fresh = catalog.table(jt) match {
          case Some(ex) => pairs.join(ex,
            Seq(Schema.fkCol(l), Schema.fkCol(r)), "left_anti")
          case None => pairs
        }
        if (!fresh.isEmpty) {
          catalog.append(jt, fresh)
          appended(jt) = fresh
        }
      }
    }

    // AdditionalMetaData: dynamic per-study columns kept long-format
    // (SURVEY §7 "hard parts": schema varies per study)
    val amdCols = sheet.columnsOf("AdditionalMetaData").map(_.flatName)
      .filter(annotated.columns.contains)
    if (amdCols.nonEmpty) {
      val long = annotated.select(col("_row") +: amdCols.map(col): _*)
        .select(col("_row"), expr(
          "stack(" + amdCols.length + ", " + amdCols.map(c =>
            s"'${c.stripPrefix("AdditionalMetaData__")}', cast(`$c` as string)")
            .mkString(", ") + ") as (col_name, col_value)"))
        .withColumn("user_id", lit(userId))
      catalog.append("AdditionalMetaData", long)
      appended("AdditionalMetaData") = long
    }

    Ingested(appended.toMap)
  }
}
