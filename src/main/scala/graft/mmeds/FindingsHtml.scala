package graft.mmeds

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** HTML error-report renderer: the reference's presentation layer for
  * validation findings (`generate_error_html` + `build_error_rows`,
  * util.py:683-754, 654-680) re-expressed over the Spark-native
  * [[Finding]] frame.
  *
  * Semantics mirrored from the reference:
  *   - file-level findings (row == -1, no matching column) render as
  *     `<h3>` banners above the table — red for errors, orange for
  *     warnings, deduplicated;
  *   - column-level findings (row == -1, matching column) highlight the
  *     (table, column) header cells;
  *   - cell-level findings (row >= 0) highlight the data cell and append
  *     the message below a `-----------` separator inside the cell;
  *   - the table carries the 2-row (table, column) header of the
  *     interchange format.
  *
  * Scale shape: findings are a report (human-bounded — thousands, not
  * billions) so they collect; the metadata rows STREAM through
  * `toLocalIterator` like every other TSV/report sink in the library —
  * the renderer never materializes the full sheet on the driver. */
object FindingsHtml {

  private def esc(s: String): String =
    if (s == null) "" else s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def color(isError: Boolean): String =
    if (isError) "red" else "orange"

  /** Render the error page for a validated sheet. `findings` is the
    * output of [[Validator.validate]] (schema: row, column, kind,
    * message, isError). */
  def render(sheet: MetadataSheet, findings: DataFrame): String = {
    val all = findings
      .select(col("row"), col("column"), col("message"), col("isError"))
      .collect()
      .map(r => Finding(r.getLong(0), r.getString(1), "", r.getString(2),
        r.getBoolean(3)))
    val flatNames = sheet.specs.map(_.flatName)
    val (structural, fileLevel) = all.partition(f =>
      f.row >= 0 || flatNames.contains(f.column))
    val byCell: Map[(Long, String), Finding] = structural
      .filter(_.row >= 0).map(f => (f.row, f.column) -> f).toMap
    val byColumn: Map[String, Finding] = structural
      .filter(_.row < 0).map(f => f.column -> f).toMap

    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html>\n<html>\n<title>Metadata Findings</title>\n<body>\n"
    // general banners, deduplicated, errors first (util.py:725-727)
    fileLevel.map(f => (f.isError, f.message)).distinct
      .sortBy { case (isError, m) => (!isError, m) }
      .foreach { case (isError, m) =>
        sb ++= s"""<h3 style="color:${color(isError)}">${esc(m)}</h3>\n"""
      }
    sb ++= "<table>\n<tr>"
    sheet.specs.foreach { s =>
      byColumn.get(s.flatName) match {
        case Some(f) => sb ++= s"""<th style="color:${color(f.isError)}">""" +
          s"${esc(s.table)}\n${esc(f.message)}</th>\n"
        case None => sb ++= s"<th>${esc(s.table)}</th>\n"
      }
    }
    sb ++= "</tr>\n<tr>"
    sheet.specs.foreach { s =>
      byColumn.get(s.flatName) match {
        case Some(f) => sb ++= s"""<th style="color:${color(f.isError)}">""" +
          s"${esc(s.column)}\n${esc(f.message)}</th>\n"
        case None => sb ++= s"<th>${esc(s.column)}</th>\n"
      }
    }
    sb ++= "</tr>\n"

    // stream data rows; _row is first, flat columns follow in spec order
    val ordered = sheet.df.orderBy(col("_row"))
    val it = ordered.toLocalIterator()
    while (it.hasNext) {
      val row: Row = it.next()
      val rowIdx = row.getLong(0)
      sb ++= "<tr>"
      flatNames.zipWithIndex.foreach { case (fn, i) =>
        val cell = Option(row.get(i + 1)).map(_.toString).getOrElse("NA")
        byCell.get((rowIdx, fn)) match {
          case Some(f) =>
            sb ++= s"""<td style="color:black" bgcolor="${color(f.isError)}">""" +
              s"""${esc(cell)}<div style="font-weight:bold">""" +
              s"<br>-----------<br>${esc(f.message)}</div></td>\n"
          case None =>
            sb ++= s"""<td style="color:black">${esc(cell)}</td>\n"""
        }
      }
      sb ++= "</tr>\n"
    }
    sb ++= "</table>\n</body>\n</html>"
    sb.toString
  }
}
