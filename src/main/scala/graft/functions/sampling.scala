package graft.functions

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Reproducible sampling for training-data pipelines. Hash-based
  * selection (not RNG) so the sample is a pure function of the row key:
  * stable across runs, cluster sizes, partitionings, and engines —
  * exactly what dataset versioning needs at 100 TB.
  */
object sampling {

  /** md5-derived bucket in [0, 10000) — portable to any engine with md5
    * (the DuckDB oracle computes the identical expression). */
  def hashBucket(key: Column): Column =
    F.conv(F.substring(F.md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % 10000L

  /** Keep ~`permille`/10000 of rows, keyed by `key`. Deterministic and
    * engine-portable; complement of the sample is the exact remainder. */
  def hashSample(df: DataFrame, key: String, permille: Int): DataFrame =
    df.filter(hashBucket(F.col(key)) < permille)

  /** Per-stratum hash sampling: different rates per value of `strataCol`
    * (e.g. downsample the dominant language, keep the rest). */
  def stratifiedHashSample(df: DataFrame, key: String, strataCol: String,
      rates: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = rates.foldLeft(F.lit(defaultPermille)) { case (acc, (v, p)) =>
      F.when(F.col(strataCol) === v, F.lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(F.col(key)) < rate)
  }
}
