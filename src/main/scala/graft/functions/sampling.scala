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

  /** Token-budget corpus mixing: keep, per source, a deterministic
    * subset holding at most `budget(source)` whitespace tokens — training
    * mixtures are specified in tokens, not documents. Two-pass and
    * bucket-granular: documents land in one of 10000 hash buckets per
    * source, pass 1 aggregates per-(source, bucket) token sums (≤ 10000
    * rows per source — never corpus-sized, so the cumulative-sum window
    * over buckets is a tiny frame, not a per-source sort of the data),
    * and a document is kept iff its whole bucket's running total fits
    * the budget. Granularity is one bucket (~1/10000 of a source);
    * under- never over-shoots. The kept bucket list is broadcast back —
    * the corpus itself is filtered map-side. */
  def tokenBudgetSample(df: DataFrame, key: String, textCol: String,
      sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withB = df.withColumn("_tb_bucket", hashBucket(F.col(key)))
    val budget = budgets.foldLeft(F.lit(defaultBudget)) { case (acc, (s, v)) =>
      F.when(F.col(sourceCol) === s, F.lit(v)).otherwise(acc)
    }
    val kept = withB
      .groupBy(sourceCol, "_tb_bucket")
      .agg(F.sum(text.tokenCount(F.col(textCol))).as("_tb_toks"))
      .withColumn("_tb_cum", F.sum("_tb_toks")
        .over(Window.partitionBy(sourceCol).orderBy("_tb_bucket")))
      .filter(F.col("_tb_cum") <= budget)
      .select(F.col(sourceCol), F.col("_tb_bucket"))
    withB.join(F.broadcast(kept), Seq(sourceCol, "_tb_bucket"))
      .drop("_tb_bucket")
  }
}
