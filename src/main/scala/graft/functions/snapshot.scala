package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}

/** Crawl-snapshot reconciliation: what changed between two crawls of
  * the same corpus. The recrawl planner and incremental-processing
  * steps of a web pipeline both start from this delta.
  *
  * Scale shape: ONE full-outer join co-partitioned on the document id;
  * contents are compared by 16-byte md5 fingerprint, so the shuffle
  * never carries two copies of the text. No skew risk — ids are unique
  * on each side.
  */
object snapshot {

  /** Per-document status between `oldDf` and `newDf`:
    * `added` / `removed` / `changed` / `unchanged`. Presence is tracked
    * by an explicit flag (not fingerprint nullity), and fingerprints
    * compare null-safely, so documents with NULL text classify
    * correctly (null vs null = unchanged, null vs text = changed). */
  def diffStatus(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String) =
      df.select(F.col(idCol), F.md5(F.col(textCol)).as(s"_fp_$side"),
        F.lit(true).as(s"_in_$side"))
    fp(oldDf, "old").join(fp(newDf, "new"), Seq(idCol), "full_outer")
      .select(F.col(idCol),
        F.when(F.col("_in_old").isNull, "added")
          .when(F.col("_in_new").isNull, "removed")
          .when(!(F.col("_fp_old") <=> F.col("_fp_new")), "changed")
          .otherwise("unchanged").as("status"))
  }
}
