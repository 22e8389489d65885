package graft.functions

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout tools for repeated large joins/aggregations: bucketing
  * co-locates both sides of an equi-join by key hash at write time, so
  * subsequent joins and groupBys on the bucket keys run with NO shuffle
  * exchange — the difference between re-shuffling 100 TB per query and
  * reading pre-placed data. */
object layout {

  /** Persist `df` hash-bucketed (and bucket-sorted) by `keys`. */
  def bucketize(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables previously bucketized on the same keys with the same
    * bucket count: Catalyst sees the matching output partitioning and
    * plans a shuffle-free sort-merge join. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], how: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, how)

  /** Count shuffle exchanges in a plan (diagnostic for tests/tuning). */
  def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
}
