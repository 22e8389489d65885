package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Skew remedies for pathological key distributions. AQE's skew-join
  * split handles moderate skew automatically (enabled in all graft
  * sessions); these are the explicit tools for keys hot enough that a
  * single task cannot hold them. */
object skew {

  /** Rebalance a DRASTICALLY under-split input before a compute-heavy
    * scan. The inverse of the hot-key problem: a corpus that arrives as
    * fewer splits than the cluster has cores (one monolithic parquet
    * row group, one giant gzip member, a single kafka partition)
    * serializes every downstream per-row pass — tokenization, shingle
    * hashing, signature folds — onto a handful of cores no matter how
    * wide the cluster is, and Spark cannot split below a row-group
    * boundary on its own. The gate is MEASURED, not assumed: only when
    * the scan's actual split count is below `minFrac` of
    * `defaultParallelism` does the input pay one round-robin shuffle to
    * fan out; a production-scale corpus arrives thousands-of-splits
    * wide and passes through untouched, so the extra exchange exists
    * only in exactly the runs that need it.
    *
    * The split probe (`df.rdd.getNumPartitions`) is only safe at source
    * grain: under AQE, materializing the RDD of a plan that already
    * contains exchanges would eagerly run those stages at call time.
    * The gate is therefore an ALLOWLIST — the probe runs only when the
    * optimized plan is a pure scan/project/filter/generate tree, whose
    * partitioning is decided by the source layout and whose RDD costs
    * nothing to build. Anything else (joins, aggregates, windows,
    * repartitions — and equally the typed-API operators a blocklist
    * would forget: MapGroups, CoGroup, FlatMapGroupsIn*, REBALANCE
    * hints) is returned untouched: its partitioning was decided by its
    * own operators, not by the source, and probing it could eagerly
    * submit upstream shuffle stages. */
  def rebalanceUnderSplit(df: DataFrame, minFrac: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    // allowlist = every shuffle-free narrow shape: scans, row-local
    // operators, unions of scans, samples, and the typed-API narrow
    // trio (a Dataset .map/.filter desugars to Deserialize/Map*/
    // Serialize). Anything not listed may plan an exchange, so it is
    // returned untouched rather than probed.
    val sourceGrain = !df.queryExecution.optimizedPlan.exists {
      case _: LeafNode | _: Project | _: Filter | _: Generate |
           _: SubqueryAlias | _: Union | _: Sample => false
      case _: DeserializeToObject | _: SerializeFromObject |
           _: MapElements | _: TypedFilter => false
      case _ => true
    }
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (sourceGrain && df.rdd.getNumPartitions < math.max(1.0, target * minFrac))
      df.repartition(target)
    else df
  }

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
