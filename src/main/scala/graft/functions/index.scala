package graft.functions

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.spark.sql.types._

/** Persistent near-duplicate index for INCREMENTAL crawls: signature
  * tables written once, bucket-placed on disk, probed by every future
  * batch without reshuffling the existing corpus. The batch-vs-corpus
  * shape of [[dedup.jaccardPairsLshCross]] recomputes the reference
  * side's signatures per run — fine for one-off comparisons, wrong for
  * a crawl that ingests daily against a 100 TB history. Here the
  * history's MinHash band keys and shingle-hash sets are computed ONCE
  * and persisted hash-bucketed ([[layout.bucketize]] posture), so a
  * probe plan shuffles only the (small) new batch:
  *
  *  - `<name>_buckets`, bucketed by (band, band_hash): candidate
  *    generation joins the new batch's exploded band keys against it —
  *    the index side reads pre-placed, no exchange;
  *  - `<name>_sigs`, bucketed by id: exact-Jaccard verification joins
  *    candidate pairs back to the stored shingle sets — again no
  *    exchange on the index side.
  */
object index {

  /** Build (SaveMode.Overwrite) or extend (SaveMode.Append) the
    * two-table index under `name`. Appending batches over time is the
    * intended lifecycle: today's verified-new documents become
    * tomorrow's index. */
  def buildJaccardIndex(df: DataFrame, idCol: String, textCol: String,
      name: String, k: Int = 3, numPerm: Int = 64, bands: Int = 32,
      buckets: Int = 64, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val rowsPerBand = numPerm / bands
    val sh = df.select(F.col(idCol).cast(LongType).as("id"),
        dedup.shingleHashes(F.col(textCol), k).as("sh"))
      .withColumn("sig", dedup.minhashFromHashes(F.col("sh"), numPerm))
    sh.select(F.col("id"),
        F.posexplode(dedup.lshBandKeys(F.col("sig"), bands, rowsPerBand))
          .as(Seq("band", "band_hash")))
      .write.mode(mode).bucketBy(buckets, "band", "band_hash")
      .format("parquet").saveAsTable(s"${name}_buckets")
    sh.select(F.col("id"), F.col("sh"),
        F.size(F.col("sh")).cast(DoubleType).as("n"))
      .write.mode(mode).bucketBy(buckets, "id")
      .format("parquet").saveAsTable(s"${name}_sigs")
  }

  /** Probe the index with a new batch: exact k-shingle Jaccard ≥ `minJ`
    * pairs (id_new, id_indexed, jaccard) between the batch and the
    * indexed corpus. Parameters k/numPerm/bands must match the build.
    * The new side is exploded and shuffled to meet each bucketed index
    * table in place; the index side never moves. */
  def probeJaccardIndex(spark: SparkSession, dfNew: DataFrame,
      idCol: String, textCol: String, name: String, k: Int = 3,
      numPerm: Int = 64, bands: Int = 32, minJ: Double = 0.8): DataFrame = {
    val rowsPerBand = numPerm / bands
    val sh = dedup.cached(dfNew.select(F.col(idCol).cast(LongType).as("id"),
        dedup.shingleHashes(F.col(textCol), k).as("sh"))
      .withColumn("sig", dedup.minhashFromHashes(F.col("sh"), numPerm))
      .withColumn("n", F.size(F.col("sh")).cast(DoubleType)))
    val newKeys = sh.select(F.col("id").as("id_new"), F.col("sh").as("sh_new"),
      F.col("n").as("n_new"),
      F.posexplode(dedup.lshBandKeys(F.col("sig"), bands, rowsPerBand))
        .as(Seq("band", "band_hash")))
    val cand = newKeys
      .join(spark.table(s"${name}_buckets"), Seq("band", "band_hash"))
      .select(F.col("id_new"), F.col("sh_new"), F.col("n_new"),
        F.col("id").as("id_indexed"))
      .dropDuplicates("id_new", "id_indexed")
    val inter = F.call_function("graft_intersect_count",
      F.col("sh_new"), F.col("sh")).cast(DoubleType)
    cand.join(spark.table(s"${name}_sigs"),
        F.col("id_indexed") === F.col("id"))
      .select(F.col("id_new"), F.col("id_indexed"),
        (inter / (F.col("n_new") + F.col("n") - inter)).as("jaccard"))
      .filter(F.col("jaccard") >= minJ)
  }
}
