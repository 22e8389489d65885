package graft.functions

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout tools for repeated large joins/aggregations: bucketing
  * co-locates both sides of an equi-join by key hash at write time, so
  * subsequent joins and groupBys on the bucket keys run with NO shuffle
  * exchange — the difference between re-shuffling 100 TB per query and
  * reading pre-placed data. */
object layout {

  /** Persist `df` hash-bucketed (and bucket-sorted) by `keys`. The
    * pre-write repartition puts each bucket's rows in exactly one task
    * (repartition and the bucket spec share the pmod(murmur3)
    * placement), so the table gets one file per bucket instead of one
    * per (task × bucket) — without it a 32-task write of a 64-bucket
    * table emits up to 2048 near-empty files, and at cluster scale
    * every write litters the filesystem with tasks × buckets files. */
  def bucketize(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    import org.apache.spark.sql.{functions => FF}
    df.repartition(buckets, keys.map(FF.col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two tables previously bucketized on the same keys with the same
    * bucket count: Catalyst sees the matching output partitioning and
    * plans a shuffle-free sort-merge join. `forceMerge` adds the MERGE
    * hint — at small test scale the optimizer would otherwise pick a
    * broadcast join (fine, but it hides the co-location), while at
    * production scale neither side broadcasts and the hint is what the
    * planner does anyway. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], how: String = "inner",
      forceMerge: Boolean = false): DataFrame = {
    val left = spark.table(leftTable)
    val l = if (forceMerge) left.hint("merge") else left
    l.join(spark.table(rightTable), keys, how)
  }

  /** Count shuffle exchanges in a plan (diagnostic for tests/tuning). */
  def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  /** Write a training corpus as deterministic, size-bounded parquet
    * shards — the export layout downstream trainers want: exactly
    * `nShards` hash-assigned shard directories (stable under re-runs and
    * cluster size — shard membership is a pure function of the key),
    * each file capped at `maxRecordsPerFile` rows so no reader ever
    * pulls a monster file, and rows sorted within each shard by
    * `sortCols` (sorted columns run-length/dictionary encode far
    * smaller, and ordered reads warm caches). One exchange total: the
    * repartition to shard directories; the within-shard sort is
    * spill-safe local work. */
  def writeSharded(df: DataFrame, path: String, keyCol: String,
      nShards: Int, maxRecordsPerFile: Long = 5000000L,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(nShards >= 1 && maxRecordsPerFile >= 1,
      "writeSharded: nShards and maxRecordsPerFile must be >= 1")
    import org.apache.spark.sql.{functions => FF}
    val sharded = df
      .withColumn("shard",
        sampling.hashBucket(FF.col(keyCol), nShards.toLong)
          .cast(org.apache.spark.sql.types.IntegerType))
      .repartition(nShards, FF.col("shard"))
    // The dynamic-partition writer requires rows ordered by the partition
    // column and will insert its own (unstable) sort if they aren't —
    // which would scramble `sortCols`. Sorting by (shard, sortCols...)
    // satisfies that requirement as a prefix, so the writer adds nothing
    // and the secondary order reaches the files.
    val sorted =
      if (sortCols.nonEmpty)
        sharded.sortWithinPartitions(
          (FF.col("shard") +: sortCols.map(FF.col)): _*)
      else sharded
    sorted.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Morton (Z-order) interleave of `cols`: bit b of column i lands at
    * output bit `b * cols.size + i`, so rows close in EVERY dimension
    * get close keys — the multi-column clustering key behind Z-ordered
    * data skipping. Inputs must already be in [0, 2^bits) (pre-bucket
    * with modulo / range mapping); `bits * cols.size` ≤ 62 keeps the
    * key in a positive Long. Pure bit arithmetic (shift/and/or) — one
    * codegen'd expression, replayable in any engine with integer bit
    * ops. */
  def zorderKey(cols: Seq[org.apache.spark.sql.Column],
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.{functions => FF}
    val n = cols.size
    require(n >= 1 && bits >= 1 && bits * n <= 62,
      s"zorderKey: need >= 1 column and 1 <= bits * cols <= 62 " +
        s"(got $n cols, $bits bits)")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield FF.shiftleft(
      FF.shiftrightunsigned(c.cast(org.apache.spark.sql.types.LongType), b)
        .bitwiseAND(FF.lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` on the Z-order curve of `cols` (each pre-mapped to
    * [0, 2^bits)): range-partition on the interleaved key, then sort
    * within partitions — so every output file covers a small hyper-box
    * of the key space and a reader filtering on ANY prefix-dimension
    * subset skips most files via parquet min/max stats. This is the
    * write-side move for multi-column selective scans, complementing
    * [[bucketize]] (which serves equi-joins, not range predicates).
    * One exchange (the range partitioning, driven by a key sample);
    * the sort is spill-safe local work. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.{functions => FF}
    val zed = df.withColumn("_zo", zorderKey(cols.map(FF.col), bits))
    val parted =
      if (numPartitions > 0) zed.repartitionByRange(numPartitions, FF.col("_zo"))
      else zed.repartitionByRange(FF.col("_zo"))
    parted.sortWithinPartitions("_zo").drop("_zo")
  }

  /** Classify a new crawl snapshot against the previous one, emitting
    * ONLY what moved: `added` (key only in new), `removed` (key only in
    * old), `changed` (key in both, any compared column differs).
    * Unchanged rows — the overwhelming bulk of a 100 TB re-crawl — are
    * dropped, so downstream incremental work (index appends,
    * re-embedding, cache invalidation) is sized by the diff, not the
    * corpus. The compared columns are reduced MAP-SIDE to a 16-byte md5
    * of their JSON struct encoding (injective per column order: null
    * fields are omitted, strings escaped), so the full-outer join
    * carries (key, 16 bytes) per row, never the documents; one shuffle
    * per side on the key, or ZERO when both snapshots are
    * [[bucketize]]d on it. Keys must be unique per snapshot (a crawl
    * primary key); fingerprints are only ever compared within a key, so
    * cross-key md5 collisions are irrelevant. */
  def snapshotDiff(old: DataFrame, nw: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: need >= 1 compare column")
    import org.apache.spark.sql.{functions => FF}
    def fp(df: DataFrame, as: String): DataFrame =
      df.select(FF.col(keyCol),
        FF.md5(FF.to_json(FF.struct(compareCols.map(FF.col): _*))).as(as))
    fp(old, "_fp_old").join(fp(nw, "_fp_new"), Seq(keyCol), "full_outer")
      .withColumn("change",
        FF.when(FF.col("_fp_old").isNull, "added")
          .when(FF.col("_fp_new").isNull, "removed")
          .when(FF.col("_fp_old") =!= FF.col("_fp_new"), "changed"))
      .filter(FF.col("change").isNotNull)
      .select(FF.col(keyCol), FF.col("change"))
  }

  /** Read back a [[writeSharded]] corpus, optionally restricted to a set
    * of shards. The shard restriction is a PARTITION filter — Spark
    * prunes the other shard directories at file-listing time, so a
    * 1-of-N shard read lists and scans 1/N of the corpus (assert-able
    * via PartitionFilters in the scan node). Because shard membership is
    * a pure hash of the key, a sharded consumer (trainer rank, backfill
    * worker) can claim `shards` deterministically across runs. */
  def readSharded(spark: SparkSession, path: String,
      shards: Seq[Int] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    if (shards.isEmpty) df
    else df.filter(org.apache.spark.sql.functions.col("shard")
      .isin(shards.map(Integer.valueOf): _*))
  }
}
