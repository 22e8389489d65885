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
  *    exchange on the index side;
  *  - `<name>_stats`, per-(band, band_hash) row counts: lets the probe
  *    cap hot buckets (`maxBucket`) WITHOUT scanning the corpus to
  *    discover overflow.
  *
  * The hash parameters (k, numPerm, bands) are recorded as table
  * properties at build time and READ BACK by the probe — a probe can
  * never silently use mismatched parameters and miss pairs.
  */
object index {

  /** Build (SaveMode.Overwrite) or extend (SaveMode.Append) the index
    * tables under `name`. Appending batches over time is the intended
    * lifecycle: today's verified-new documents become tomorrow's index.
    * Append validates (k, numPerm, bands) against the stored build
    * parameters — extending an index with different hashing would
    * silently corrupt it. */
  def buildJaccardIndex(df: DataFrame, idCol: String, textCol: String,
      name: String, k: Int = 3, numPerm: Int = 64, bands: Int = 32,
      buckets: Int = 64, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(k >= 1, s"index: k must be >= 1 (got $k)")
    require(bands >= 1 && numPerm % bands == 0,
      s"index: bands must be >= 1 and divide numPerm " +
        s"(got numPerm=$numPerm, bands=$bands)")
    val spark = df.sparkSession
    if (mode == SaveMode.Append && spark.catalog.tableExists(s"${name}_buckets")) {
      val stored = readParams(spark, name)
      require(stored == ((k, numPerm, bands)),
        s"index: append parameters (k=$k, numPerm=$numPerm, bands=$bands) " +
          s"do not match the build (k=${stored._1}, numPerm=${stored._2}, " +
          s"bands=${stored._3})")
    }
    val rowsPerBand = numPerm / bands
    // signatures + band keys are each read by two writers below —
    // persist for the duration of the (synchronous) build
    val sh = df.select(F.col(idCol).cast(LongType).as("id"),
        dedup.shingleHashes(F.col(textCol), k).as("sh"))
      .withColumn("sig", dedup.minhashFromHashes(F.col("sh"), numPerm))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keys = sh.select(F.col("id"),
        F.posexplode(dedup.lshBandKeys(F.col("sig"), bands, rowsPerBand))
          .as(Seq("band", "band_hash")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      keys.write.mode(mode).bucketBy(buckets, "band", "band_hash")
        .format("parquet").saveAsTable(s"${name}_buckets")
      // per-bucket counts: appended parts are re-aggregated at probe
      // time, so Append just adds this batch's counts
      keys.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).as("cnt"))
        .write.mode(mode).format("parquet").saveAsTable(s"${name}_stats")
      sh.select(F.col("id"), F.col("sh"),
          F.size(F.col("sh")).cast(DoubleType).as("n"))
        .write.mode(mode).bucketBy(buckets, "id")
        .format("parquet").saveAsTable(s"${name}_sigs")
      spark.sql(s"ALTER TABLE ${name}_buckets SET TBLPROPERTIES(" +
        s"'graft.k'='$k','graft.numPerm'='$numPerm','graft.bands'='$bands')")
    } finally {
      keys.unpersist(blocking = false)
      sh.unpersist(blocking = false)
    }
  }

  /** The hash parameters recorded at build time: (k, numPerm, bands). */
  def readParams(spark: SparkSession, name: String): (Int, Int, Int) = {
    val props = spark.sql(s"SHOW TBLPROPERTIES ${name}_buckets").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def p(key: String): Int = props.getOrElse(key, throw new IllegalArgumentException(
      s"index: table ${name}_buckets has no '$key' property — " +
        "not built by buildJaccardIndex?")).toInt
    (p("graft.k"), p("graft.numPerm"), p("graft.bands"))
  }

  /** Probe the index with a new batch: exact k-shingle Jaccard ≥ `minJ`
    * pairs (id_new, id_indexed, jaccard) between the batch and the
    * indexed corpus. Hash parameters come from the index's own table
    * properties — they cannot drift from the build. The new side is
    * exploded and shuffled to meet each bucketed index table in place;
    * the index side never moves, except that with `maxBucket` > 0 the
    * rows of OVERSIZED buckets (found from the persisted `_stats`
    * counts, never by scanning the corpus) are grid-salted: an
    * m_idx-row hot bucket splits into R = ⌈m_idx/cap⌉ row-groups and
    * the new side's m_new rows into S = ⌈m_new/cap⌉ groups, each side
    * replicated across the other's groups so every (new, indexed) pair
    * meets in exactly one ~cap × cap cell — per-task candidate
    * generation is bounded at ANY skew and NO pair is lost (the
    * [[dedup.jaccardPairsLshCross]] gridSalt guarantee). Candidate
    * pairs carry only (id_new, id_indexed); the shingle arrays are
    * rejoined once for verification — a wide batch document's array is
    * never replicated per surviving candidate. */
  def probeJaccardIndex(spark: SparkSession, dfNew: DataFrame,
      idCol: String, textCol: String, name: String,
      minJ: Double = 0.8, maxBucket: Int = 0): DataFrame = {
    val (k, numPerm, bands) = readParams(spark, name)
    val rowsPerBand = numPerm / bands
    val sh = dedup.cached(dfNew.select(F.col(idCol).cast(LongType).as("id"),
        dedup.shingleHashes(F.col(textCol), k).as("sh"))
      .withColumn("sig", dedup.minhashFromHashes(F.col("sh"), numPerm))
      .withColumn("n", F.size(F.col("sh")).cast(DoubleType)))
    // candidates are (id_new, id_indexed) ONLY — shingles rejoin later
    val newKeys = sh.select(F.col("id").as("id_new"),
      F.posexplode(dedup.lshBandKeys(F.col("sig"), bands, rowsPerBand))
        .as(Seq("band", "band_hash")))
    val idx = spark.table(s"${name}_buckets")
    val bucketCols = Seq("band", "band_hash")
    val cand0 =
      if (maxBucket <= 0)
        newKeys.join(idx, bucketCols)
          .select(F.col("id_new"), F.col("id").as("id_indexed"))
      else {
        val idxCnt = spark.table(s"${name}_stats")
          .groupBy(bucketCols.map(F.col): _*)
          .agg(F.sum("cnt").as("_mi")).filter(F.col("_mi") > maxBucket)
        // cool buckets: the bucketed join, index side never moves
        val coolCand = newKeys
          .join(F.broadcast(idxCnt), bucketCols, "left_anti")
          .join(idx, bucketCols)
          .select(F.col("id_new"), F.col("id").as("id_indexed"))
        // hot buckets: grid-salt both sides (pair-complete, see above).
        // New-side counts come from the probe batch itself (small);
        // buckets the batch never touches produce no pairs (inner join).
        val newCnt = newKeys.join(F.broadcast(idxCnt), bucketCols)
          .groupBy(bucketCols.map(F.col): _*)
          .agg(F.count(F.lit(1)).as("_mn"))
        val hotBoth = F.broadcast(idxCnt.join(newCnt, bucketCols))
        val nIdx = F.ceil(F.col("_mi").cast(DoubleType) / maxBucket).cast(IntegerType)
        val nNew = F.ceil(F.col("_mn").cast(DoubleType) / maxBucket).cast(IntegerType)
        val idxHot = idx.join(hotBoth, bucketCols)
          .withColumn("salt_own",
            F.pmod(F.xxhash64(F.col("id")), nIdx).cast(IntegerType))
          .withColumn("salt_rep",
            F.explode(F.sequence(F.lit(0), nNew - 1)))
        val newHot = newKeys.join(hotBoth, bucketCols)
          .withColumn("salt_own",
            F.pmod(F.xxhash64(F.col("id_new")), nNew).cast(IntegerType))
          .withColumn("salt_rep",
            F.explode(F.sequence(F.lit(0), nIdx - 1)))
        val hotCand = newHot.as("a").join(idxHot.as("b"),
            F.col("a.band") === F.col("b.band") &&
            F.col("a.band_hash") === F.col("b.band_hash") &&
            F.col("a.salt_own") === F.col("b.salt_rep") &&
            F.col("a.salt_rep") === F.col("b.salt_own"))
          .select(F.col("a.id_new"), F.col("b.id").as("id_indexed"))
        coolCand.unionByName(hotCand)
      }
    val cand = cand0.dropDuplicates("id_new", "id_indexed")
    // verification: stored shingle sets via the id-bucketed sigs table
    // (no exchange on the index side), batch shingles from the cache
    val inter = F.call_function("graft_intersect_count",
      F.col("sh_new"), F.col("sh")).cast(DoubleType)
    cand.join(spark.table(s"${name}_sigs"),
        F.col("id_indexed") === F.col("id"))
      .join(sh.select(F.col("id").as("id_new"), F.col("sh").as("sh_new"),
        F.col("n").as("n_new")), Seq("id_new"))
      .select(F.col("id_new"), F.col("id_indexed"),
        (inter / (F.col("n_new") + F.col("n") - inter)).as("jaccard"))
      .filter(F.col("jaccard") >= minJ)
  }
}
