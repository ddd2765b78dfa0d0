package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the pipeline operators. */
object Num {

  /** Truncate to 4 decimal places via floor-scaling.
    *
    * For values the oracle computes through the IDENTICAL arithmetic
    * (int/int ratios, same-order sums) the doubles are bit-equal across
    * engines, so floor is exact-safe — unlike `round`, whose half-way
    * tie-breaking differs between Spark (BigDecimal HALF_UP on the exact
    * binary value) and DuckDB (scaled std::round), which flips the last
    * digit on .xxxx5 boundaries. */
  def floor4(c: Column): Column = floor(c * lit(10000.0)) / lit(10000.0)
}
