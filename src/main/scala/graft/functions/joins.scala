package graft.functions

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Join operators beyond Spark's built-in set, composed from built-ins
  * (preference (a) of the custom-operator ladder: no custom physical plan
  * needed). */
object joins {

  /** Backward as-of join: for every left row, the latest right row with
    * `rightTs <= leftTs` within the same `by` keys; unmatched left rows
    * keep nulls (left-join semantics).
    *
    * Plan shape: tag both sides, union, ONE shuffle+sort on
    * (by, ts, side), then `last(_, ignoreNulls)` over the growing window
    * carries the most recent right values forward. This is the
    * sort-merge-shaped as-of plan — linear after one shuffle, no range
    * explosion, skew-safe under AQE — rather than a range join.
    *
    * @param rightVals right columns to carry (exposed under the same
    *        names; must not clash with left column names)
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, by: Seq[String],
      rightVals: Seq[String]): DataFrame = {
    val clash = rightVals.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asofBackward: right value columns clash with left: $clash")
    val lt = left
      .withColumn("__ats", F.col(leftTs))
      .withColumn("__side", F.lit(0))
    val rt = right.select(
      (by.map(F.col) :+ F.col(rightTs).as("__ats") :+ F.lit(1).as("__side")) ++
        rightVals.map(n => F.col(n).as(s"__rv_$n")): _*)
    val tagged = lt.unionByName(rt, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (side desc) so `>=`
    // matches; the frame grows from the partition start to the current row
    val w = Window.partitionBy(by.map(F.col): _*)
      .orderBy(F.col("__ats").asc, F.col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(tagged) { (df, n) =>
      df.withColumn(n, F.last(F.col(s"__rv_$n"), ignoreNulls = true).over(w))
    }
    carried.filter(F.col("__side") === 0)
      .drop(("__ats" +: "__side" +: rightVals.map(n => s"__rv_$n")): _*)
  }
}
