package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the LATEST right row with
  * `right.ts <= left.ts` within the same key (the time-series lookup
  * Spark has no native operator for).
  *
  * Implemented as the MERGE shape rather than a range join: tag both
  * sides, union them, and carry the last-seen right payload forward with
  * one `last(..., ignoreNulls)` window over (key, ts) — then keep only
  * left rows. That is ONE shuffle on the key, no per-row range scan, no
  * candidate explosion, and no broadcast requirement on either side —
  * exactly how you'd merge two sorted 100 TB streams: both sides
  * co-partition on the key, the window sort is the only per-partition
  * work. (The equivalent range-join formulation explodes to
  * |left|×|right| candidate pairs per key before taking the max.)
  *
  * Ties: a right row at exactly `left.ts` IS visible (<= semantics) —
  * right sorts before left at equal ts. Among right rows with identical
  * (key, ts), `tieBreak` orders them (last one wins); pass the right
  * side's unique id for full determinism.
  */
object AsOf {

  /** Left rows + `asof_<payload>` columns from the latest right row at or
    * before the left row's `ts` (null when no such row). `left` keeps all
    * its columns; `right` contributes `payload` columns. Both frames must
    * contain `key` and `ts` columns with those names. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val pStruct = struct(payload.map(col): _*)
    val r = right.select(col(key), col(ts),
      lit(0).as("_side"), pStruct.as("_p"),
      struct(tieBreak.map(col): _*).as("_tb"))
    val l = left.withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(r.schema("_p").dataType))
      .withColumn("_tb", lit(null).cast(r.schema("_tb").dataType))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = payload.foldLeft(carried) { (df, p) =>
      df.withColumn(s"asof_$p", col("_asof").getField(p))
    }
    out.drop("_side", "_p", "_tb", "_asof")
  }

  /** FORWARD as-of join — for every left row, the EARLIEST right row
    * with `right.ts >= left.ts` within the same key (next-touch
    * attribution: "the first click after this purchase"). The mirror of
    * [[asofJoin]]'s merge shape: same single shuffle on the key, the
    * carry runs BACKWARD via `first(..., ignoreNulls)` over
    * (currentRow, unboundedFollowing). A right row at exactly `left.ts`
    * IS visible (>= semantics) — left sorts before right at equal ts,
    * and the window starts at the current row. Among right rows with
    * identical (key, ts), `tieBreak` picks the FIRST (pass the right
    * side's unique id for determinism). */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val pStruct = struct(payload.map(col): _*)
    val r = right.select(col(key), col(ts),
      lit(1).as("_side"), pStruct.as("_p"),
      struct(tieBreak.map(col): _*).as("_tb"))
    val l = left.withColumn("_side", lit(0))
      .withColumn("_p", lit(null).cast(r.schema("_p").dataType))
      .withColumn("_tb", lit(null).cast(r.schema("_tb").dataType))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_tb"))
      .rowsBetween(0, Window.unboundedFollowing)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof", first(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    val out = payload.foldLeft(carried) { (df, p) =>
      df.withColumn(s"next_$p", col("_asof").getField(p))
    }
    out.drop("_side", "_p", "_tb", "_asof")
  }
}
