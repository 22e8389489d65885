package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Corpus profiling: the one-pass dataset health report every ingest
  * step of a training pipeline runs before expensive processing —
  * row/null/distinct counts and value ranges per column.
  *
  * Scale shape: a single Aggregate over the table (multi count-distinct
  * compiles to Catalyst's Expand — still one scan), producing ONE row
  * that is then unpivoted driver-free into a row per column. With
  * `approx = true` the distinct counts switch to HyperLogLog++
  * (`approx_count_distinct`) — the 100 TB setting, where exact
  * per-column distincts would shuffle every value; exact is the default
  * so results stay engine-checkable. */
object profile {

  /** Per-column stats: `(col_name, n_rows, n_nulls, n_distinct,
    * min_str, max_str)`. Min/max are computed in the column's native
    * ordering and cast to string afterwards (portable output schema
    * without string-ordering artifacts). */
  def columnProfile(df: DataFrame, cols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        F.count(F.col(c)).as(s"${c}__nn"),
        (if (approx) F.approx_count_distinct(c)
         else F.countDistinct(F.col(c))).as(s"${c}__nd"),
        F.min(F.col(c)).cast(StringType).as(s"${c}__mn"),
        F.max(F.col(c)).cast(StringType).as(s"${c}__mx"))
    } :+ F.count(F.lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(F.explode(F.array(cols.map { c =>
        F.struct(
          F.lit(c).as("col_name"),
          F.col("__n").as("n_rows"),
          (F.col("__n") - F.col(s"${c}__nn")).as("n_nulls"),
          F.col(s"${c}__nd").as("n_distinct"),
          F.col(s"${c}__mn").as("min_str"),
          F.col(s"${c}__mx").as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
  }
}
