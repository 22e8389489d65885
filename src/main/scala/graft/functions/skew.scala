package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Skew remedies for pathological key distributions. AQE's skew-join
  * split handles moderate skew automatically (enabled in all graft
  * sessions); these are the explicit tools for keys hot enough that a
  * single task cannot hold them. */
object skew {

  /** Salted equi-join: left rows get a uniform salt in [0, factor), the
    * right side is replicated `factor` times, and the join key becomes
    * (keys…, salt) — spreading each hot key over `factor` tasks at the
    * cost of a `factor`× blow-up of the (small) right side. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, how: String = "inner"): DataFrame = {
    require(factor > 0, "saltedJoin: factor must be positive")
    // right/full outer would emit each unmatched right row `factor` times
    // (the replicas have no left partner to collapse against)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti", "semi", "anti").contains(how),
      s"saltedJoin: right-preserving join type `$how` is not supported " +
        "(the replicated right side would duplicate unmatched right rows)")
    val salted = left.withColumn("__salt",
      F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(factor)).cast(IntegerType))
    val replicated = right.withColumn("__salt",
      F.explode(F.array((0 until factor).map(i => F.lit(i)): _*)))
    salted.join(replicated, keys :+ "__salt", how).drop("__salt")
  }

  /** Two-level aggregation for skewed group keys: aggregate per
    * (keys…, salt) first, then merge partials per key. Spark already does
    * map-side partial aggregation; this adds a full extra reduce level
    * for when one key dominates entire partitions.
    * Each spec is (outName, inputCol, fn) with fn ∈ sum|count|min|max. */
  def saltedAgg(df: DataFrame, keys: Seq[String], factor: Int,
      specs: Seq[(String, String, String)]): DataFrame = {
    val salted = df.withColumn("__salt",
      F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(factor)).cast(IntegerType))
    def partialOf(fn: String, c: String) = fn match {
      case "sum" => F.sum(F.col(c))
      case "count" => F.count(F.col(c))
      case "min" => F.min(F.col(c))
      case "max" => F.max(F.col(c))
      case other => throw new IllegalArgumentException(s"saltedAgg: unsupported fn $other")
    }
    def mergeOf(fn: String, c: String) = fn match {
      case "sum" | "count" => F.sum(F.col(c))
      case "min" => F.min(F.col(c))
      case "max" => F.max(F.col(c))
    }
    val pCols = specs.map { case (out, c, fn) => partialOf(fn, c).as(s"__p_$out") }
    val partial = salted.groupBy((keys :+ "__salt").map(F.col): _*)
      .agg(pCols.head, pCols.tail: _*)
    val mCols = specs.map { case (out, _, fn) => mergeOf(fn, s"__p_$out").as(out) }
    partial.groupBy(keys.map(F.col): _*).agg(mCols.head, mCols.tail: _*)
  }
}
