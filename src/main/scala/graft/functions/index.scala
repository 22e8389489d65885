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
  *
  * SINGLE-WRITER CONTRACT: the lifecycle mutators (build/append,
  * removeFrom*, compactTakedowns, compactIndex) assume one writer per
  * index name and a maintenance window with no concurrent probes on
  * the same SparkSession — they swap tables through catalog renames
  * (two renames, not one atomic step) and pin per-statement writer
  * confs session-wide for their duration ([[withConf]]). Probes racing
  * a physical takedown can observe a missing-table window; concurrent
  * statements can inherit a flipped conf. Deployments needing live
  * probe traffic during maintenance should prefer [[deferTakedown]]
  * (an append, no swap — probes filter pending ids without any window)
  * and schedule the physical compaction inside the window.
  *
  * The one exception to "no writes outside the window" is the pending
  * set itself: [[deferTakedown]] appends to `<name>_dels` under live
  * traffic by design, so its writers coordinate through an in-process
  * per-index lock ([[delsLock]]) — within one JVM, defers racing a
  * [[compactTakedowns]] shrink are never lost at any interleaving.
  */
object index {

  /** In-process writer locks, one per `<name>_dels` table: the pending
    * set is the ONE index table written outside the maintenance window
    * (every [[deferTakedown]] appends to it under live traffic), so
    * unlike the swap-based rewrites its writers must coordinate. The
    * lock serializes dels APPENDS against the [[compactTakedowns]]
    * shrink-and-swap, which closes the lost-defer window completely
    * for the tested topology (every writer in one JVM — Spark local,
    * or a driver-side maintenance service): a defer landing during the
    * long purge phase survives the shrink via the anti-join against
    * the pinned purge set, and a defer racing the shrink itself blocks
    * for the milliseconds the swap takes. Writers in SEPARATE driver
    * processes remain under the module's single-writer contract. */
  private val delsLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def delsLock(delsTable: String): Object =
    delsLocks.computeIfAbsent(delsTable.toLowerCase, _ => new Object)

  /** Cached pending-set row count per (session, dels table) — the
    * [[minusPending]] broadcast gate used to run one count job per
    * probe CONSTRUCTION, measurable overhead at streaming micro-batch
    * cadence. Every in-process dels writer refreshes or invalidates
    * the entry (deferTakedown, compactTakedowns, any Overwrite build's
    * [[resetManagedTable]]), so probes read the gate for free; a count
    * that somehow went stale (an out-of-contract external writer)
    * could only flip the JOIN STRATEGY, never the result — both sides
    * of the gate produce identical rows. */
  private val pendingCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def pendingKey(spark: SparkSession, delsTable: String): String =
    System.identityHashCode(spark).toString + "/" + delsTable.toLowerCase
  private def refreshPendingCount(spark: SparkSession,
      delsTable: String): Long = {
    val c = spark.table(delsTable).count()
    pendingCounts.put(pendingKey(spark, delsTable), c)
    c
  }
  private def invalidatePendingCount(delsTable: String): Unit = {
    // all sessions' entries: the table is gone on disk for everyone
    val suffix = "/" + delsTable.toLowerCase
    pendingCounts.keySet.removeIf(_.endsWith(suffix))
    ()
  }

  /** Make an Overwrite build idempotent ACROSS sessions: drop the
    * catalog entry and clear any leftover managed-table directory from a
    * previous session whose metastore is gone (a fresh in-memory
    * catalog refuses `saveAsTable` onto an existing managed location —
    * LOCATION_ALREADY_EXISTS). A daily index rebuild must not depend on
    * the previous builder's metastore surviving. */
  private[graft] def resetManagedTable(spark: SparkSession, table: String): Unit = {
    // A PARTITIONED table's per-partition locations go STALE after a
    // catalog rename (the table directory moves, the partition entries
    // keep their absolute pre-rename paths — i.e. they alias ANOTHER
    // table's live data after a rename-aside swap). DROP TABLE deletes
    // managed-partition data at those registered locations, so dropping
    // a renamed-aside generation would eat the PROMOTED table's
    // directories. Purge the partition METADATA first (retainData —
    // catalog-only), so the drop below can only ever delete this
    // table's own directory.
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (cat.tableExists(ident) &&
        cat.getTableMetadata(ident).partitionColumnNames.nonEmpty) {
      val specs = cat.listPartitions(ident).map(_.spec)
      if (specs.nonEmpty)
        cat.dropPartitions(ident, specs, ignoreIfNotExists = true,
          purge = false, retainData = true)
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    if (table.toLowerCase.endsWith("_dels")) invalidatePendingCount(table)
    ()
  }

  /** Rewrite a managed table under the rename-aside swap discipline
    * ([[rewriteBucketedMinus]]'s shape for the flat tables — `_dels`,
    * `_stats`, the component-map family — and, with `partitioned`,
    * the retrain ops' cell tables): the new generation is written ONCE
    * to `<table>_stage` (both stage and the `_old` name are reset
    * first, so a crash-orphaned directory from a dead session can
    * never fail the write — the [[resetManagedTable]] cross-session
    * contract), the old generation is renamed aside before promotion
    * so there is never a no-table-on-disk state, and a crash at any
    * step leaves a complete generation recoverable under a
    * deterministic name (a crashed PARTITIONED generation additionally
    * needs `RECOVER PARTITIONS` after its rescue rename — renames
    * leave partition metadata stale, see below and
    * [[resetManagedTable]]). Replaces the old stage-then-Overwrite
    * shape, which wrote the data TWICE and recreated the table in
    * place. */
  private def swapViaRename(spark: SparkSession, table: String,
      partitioned: Boolean = false)(writeStage: String => Unit): Unit = {
    val stage = s"${table}_stage"
    val old = s"${table}_old"
    resetManagedTable(spark, stage)
    resetManagedTable(spark, old)
    writeStage(stage)
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    spark.sql(s"ALTER TABLE $stage RENAME TO $table")
    // renaming a PARTITIONED managed table moves its directory but the
    // catalog's per-partition locations keep pointing at the old path —
    // every read would silently scan nothing. Rebuild them from the
    // directory layout (≤ nlist partitions — one cheap listing).
    if (partitioned) spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
    resetManagedTable(spark, old)
  }

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
    if (mode == SaveMode.Overwrite)
      // _dels too: a fresh build is a fresh corpus — stale pending
      // logical takedowns against the OLD build must not filter it
      Seq(s"${name}_buckets", s"${name}_stats", s"${name}_sigs",
          s"${name}_dels")
        .foreach(resetManagedTable(spark, _))
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
      // Repartition onto the bucket grid BEFORE the bucketed write:
      // Spark's writer otherwise emits one file per (task × bucket) —
      // measured at 2048 near-empty parquet files and ~4.5 s per append
      // at 32 tasks × 64 buckets, and at cluster scale a small-file
      // explosion on every daily append. repartition(buckets, cols)
      // uses the SAME pmod(murmur3) placement as the bucket spec, so
      // each task holds exactly one bucket and writes exactly one file.
      keys.repartition(buckets, F.col("band"), F.col("band_hash"))
        .write.mode(mode).bucketBy(buckets, "band", "band_hash")
        .format("parquet").saveAsTable(s"${name}_buckets")
      // per-bucket counts: appended parts are re-aggregated at probe
      // time, so Append just adds this batch's counts
      keys.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).as("cnt"))
        .write.mode(mode).format("parquet").saveAsTable(s"${name}_stats")
      sh.select(F.col("id"), F.col("sh"),
          F.size(F.col("sh")).cast(DoubleType).as("n"))
        .repartition(buckets, F.col("id"))
        .write.mode(mode).bucketBy(buckets, "id")
        .format("parquet").saveAsTable(s"${name}_sigs")
      spark.sql(s"ALTER TABLE ${name}_buckets SET TBLPROPERTIES(" +
        s"'graft.k'='$k','graft.numPerm'='$numPerm','graft.bands'='$bands')")
    } finally {
      keys.unpersist(blocking = false)
      sh.unpersist(blocking = false)
    }
  }

  // ---------------- index takedown (right-to-be-forgotten) ----------------

  /** Run `body` with a session conf pinned, restoring the previous
    * value (or unsetting) afterwards — the lifecycle ops below flip
    * writer/scan behavior for one statement only. The flip is
    * session-WIDE while `body` runs (Spark has no per-statement scope
    * for these writer confs): a concurrent statement on the same
    * session would inherit it — part of the module's single-writer
    * maintenance-window contract (see the object doc). */
  private def withConf[T](spark: SparkSession, key: String,
      value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The bucket count of a bucketed managed table, from the catalog —
    * a takedown rewrite must re-place survivors on the SAME grid or
    * every future probe's exchange-free bucket join silently breaks. */
  private def numBuckets(spark: SparkSession, table: String): Int =
    spark.sql(s"DESCRIBE FORMATTED $table").collect()
      .find(_.getString(0).trim == "Num Buckets")
      .map(_.getString(1).trim.toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"index: table $table has no bucket spec — not a graft index table?"))

  /** Normalized deletion set: one `_ix_del` LongType column, distinct. */
  private def delFrame(ids: DataFrame, idCol: String): DataFrame =
    ids.select(F.col(idCol).cast(LongType).as("_ix_del")).distinct()

  /** Whether a deletion set is small enough to broadcast into the
    * takedown joins — the [[minusPending]] gate applied to the PHYSICAL
    * path: a compaction folding a pathological pending set (a skipped
    * cadence at 10B-doc scale) must not OOM the rewrite either. Callers
    * pass a pinned/cached frame, so the count is one cheap job. */
  private def delIsSmall(spark: SparkSession, del: DataFrame): Boolean =
    del.count() <= spark.conf
      .get("spark.graft.index.pendingBroadcastThreshold", "10000000").toLong

  /** `df` minus / restricted-to the deletion set: broadcast below the
    * gate; hinted shuffled-hash above it (the anti/semi join then
    * exchanges the scanned rows, and the fallback rewrite repartitions
    * back onto its grid — at that pending size, one exchange of a
    * table being 100%-rewritten anyway). */
  private def delJoin(df: DataFrame, del: DataFrame, idColName: String,
      how: String, small: Boolean): DataFrame = {
    val side = if (small) F.broadcast(del) else del.hint("shuffle_hash")
    df.join(side, F.col(idColName) === F.col("_ix_del"), how)
  }

  /** Rewrite bucketed index table `table` minus the rows whose
    * `idColName` is in `del`, preserving the bucket spec and every
    * graft.* table property. Scale shape: the table is SCANNED once
    * with its bucket alignment forced (autoBucketedScan off → one task
    * per bucket), the deletion set broadcast anti-joins in place, and
    * the bucketBy write emits one file per bucket with NO exchange —
    * the index is never shuffled.
    *
    * Swap discipline: the old generation is renamed ASIDE
    * (`<table>_takedown_old`) before the staged survivors are promoted
    * — never a drop-first window where no data exists on disk, and a
    * crash anywhere leaves a complete generation recoverable under a
    * deterministic name (`_takedown_old` holds the pre-takedown data
    * until the final drop; `_takedown_stage` holds survivors until
    * promotion). The two catalog renames are still not one atomic
    * step, hence the module-level single-writer contract (object doc). */
  private def rewriteBucketedMinus(spark: SparkSession, table: String,
      idColName: String, del: DataFrame, bucketCols: Seq[String]): Unit = {
    val nb = numBuckets(spark, table)
    val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._1.startsWith("graft."))
    val stage = s"${table}_takedown_stage"
    val old = s"${table}_takedown_old"
    resetManagedTable(spark, stage)
    resetManagedTable(spark, old)
    // above the broadcast gate the anti-join shuffles the scanned rows,
    // so the fallback repartitions them back onto the bucket grid —
    // one exchange of a table being fully rewritten anyway; below it
    // the bucket-aligned scan flows into the write with NO exchange
    val small = delIsSmall(spark, del)
    val minus = delJoin(spark.table(table), del, idColName, "left_anti",
      small)
    val survivors =
      if (small) minus
      else minus.repartition(nb, bucketCols.map(F.col): _*)
    withConf(spark, "spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false") {
      survivors.write.mode(SaveMode.Overwrite)
        .bucketBy(nb, bucketCols.head, bucketCols.tail: _*)
        .format("parquet").saveAsTable(stage)
    }
    if (props.nonEmpty)
      spark.sql(s"ALTER TABLE $stage SET TBLPROPERTIES(" +
        props.map { case (k, v) => s"'$k'='$v'" }.mkString(",") + ")")
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    spark.sql(s"ALTER TABLE $stage RENAME TO $table")
    resetManagedTable(spark, old)
  }

  /** Purge deleted ids from a cell-PARTITIONED index table (`_cells` /
    * `_pqcells`): only the directories of AFFECTED cells are rewritten
    * (dynamic partition overwrite), everything else is untouched on
    * disk — at 100 TB a takedown batch touches its ≤ nlist cells, not
    * the corpus. The affected-cell list is driver-sized by construction
    * (≤ nlist ints — the same bound as the centroid bank every probe
    * already collects). A cell whose every row was deleted is absent
    * from the dynamic overwrite and would keep its ghost directory —
    * those partitions are dropped explicitly. */
  private def removeFromCellTable(spark: SparkSession, table: String,
      del0: DataFrame): Unit = {
    // the deletion set is consumed three times (count gate, affected
    // semi-join, survivor anti-join) — pin it for the op
    val del = dedup.cachedPinned(del0)
    try removeFromCellTablePinned(spark, table, del)
    finally { del.unpersist(blocking = false); () }
  }

  private def removeFromCellTablePinned(spark: SparkSession, table: String,
      del: DataFrame): Unit = {
    val small = delIsSmall(spark, del)
    val aff = delJoin(spark.table(table), del, "n_id", "left_semi", small)
      .select("cell").distinct().collect().map(_.getInt(0))
    if (aff.isEmpty) return
    val affSet = aff.map(Integer.valueOf).toSeq
    val survivors = delJoin(
      spark.table(table).filter(F.col("cell").isin(affSet: _*)),
      del, "n_id", "left_anti", small)
    // cells every one of whose rows is deleted are ABSENT from the
    // dynamic overwrite (it only replaces partitions present in the
    // written data) and would keep their ghost directories — find them
    // BEFORE the write (re-evaluating this plan afterwards would read
    // the rewritten table) and drop those partitions explicitly
    val survivorCells = survivors
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
      // one task per rewritten cell = one file per cell (the
      // buildIvfIndex small-file posture)
      survivors.repartition(F.col("cell"))
        .write.mode(SaveMode.Overwrite).insertInto(table)
    }
    (aff.toSet -- survivorCells).foreach { c =>
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (cell=$c)")
    }
  }

  /** DEFERRED (logical) takedown — the 100 TB posture: the physical
    * removeFrom* ops below rewrite their index tables, so a daily 0.1%
    * takedown batch would rewrite 100% of a 100 TB index every day.
    * This appends the ids to a tiny `<name>_dels` table instead
    * (O(batch), one small write); EVERY probe of any signature index
    * family under `name` excludes pending ids immediately via one
    * broadcast anti-join, and [[compactTakedowns]] folds the pending
    * set into the physical purge on the deployment's compaction cadence
    * — deletion-vector semantics: takedown is effective NOW, the
    * rewrite is amortized.
    *
    * Signature families only (Jaccard buckets/sigs, exact fps, IVF
    * cells, PQ codes — where exclusion is a row filter). The COMPONENT
    * MAP is refused: deleting a bridge document SPLITS its family,
    * which no row filter can express — use [[removeComponentIds]],
    * which is already batch-scaled and needs no deferral.
    *
    * RE-INGEST CONTRACT — takedown wins until compaction: an `Append`
    * of a pending id (a re-crawl of a taken-down page) stays hidden
    * from probes while the id is pending, and [[compactTakedowns]]
    * purges BOTH generations. This is deliberate: a
    * right-to-be-forgotten id must not silently resurrect through the
    * crawl pipeline inside the same compaction epoch. Re-ingesting the
    * id AFTER a compaction indexes it normally (the pending set is
    * empty then). Pinned by IndexTakedownSpec and the x136 oracle.
    *
    * When `spark.graft.index.autoCompactPendingThreshold` is set > 0
    * and the pending set exceeds it after this append,
    * [[compactTakedowns]] runs inline — a hard ceiling on the pending
    * set for deployments that don't want to trust cadence alone
    * (probes past [[minusPending]]'s broadcast gate stay correct
    * either way, via the shuffled fallback). Default 0 = off: the
    * deferred write stays O(batch). CAVEAT: the inline compaction's
    * physical purges swap index tables through catalog renames, i.e.
    * it runs under the module's single-writer MAINTENANCE-WINDOW
    * contract — a probe racing the triggered compaction can observe
    * the rename window. Do not enable the ceiling on an index probed
    * by live traffic while defers land; the defer-only path (ceiling
    * off) has no swap and no window. */
  def deferTakedown(ids: DataFrame, idCol: String, name: String): Unit = {
    similarity.requireIntegralId(ids, idCol, "index.deferTakedown")
    val spark = ids.sparkSession
    require(!spark.catalog.tableExists(s"${name}_cmap"),
      s"index.deferTakedown: '$name' has a component map — map deletions " +
        "can SPLIT families, which probe-time filtering cannot express; " +
        "call removeComponentIds (already O(batch)) for the map")
    // the append and the count refresh run under the in-process dels
    // writer lock: a concurrently running compactTakedowns shrink can
    // neither lose this batch nor publish a stale gate count over the
    // refresh (see [[delsLock]]); the count itself is one cheap job
    // over the small pending parquet and is what lets every future
    // probe read the broadcast gate for free ([[minusPending]])
    val cnt = delsLock(s"${name}_dels").synchronized {
      delFrame(ids, idCol).select(F.col("_ix_del").as("id"))
        .write.mode(SaveMode.Append).format("parquet")
        .saveAsTable(s"${name}_dels")
      refreshPendingCount(spark, s"${name}_dels")
    }
    val autoCap = spark.conf
      .get("spark.graft.index.autoCompactPendingThreshold", "0").toLong
    if (autoCap > 0 && cnt > autoCap)
      compactTakedowns(spark, name)
  }

  /** Fold every pending logical takedown under `name` into the physical
    * purge, across whichever signature index families exist, then
    * remove exactly the PURGED ids from `<name>_dels`. Run on the
    * compaction cadence (weekly, monthly — whenever one index rewrite
    * is worth reclaiming the space); reads are identical before and
    * after, because probes already exclude pending ids.
    *
    * The final shrink is an anti-join of the CURRENT dels against the
    * pinned set, not a blind truncate: a [[deferTakedown]] that lands
    * between the pin and this rewrite was never purged, and wiping it
    * here would silently resurrect that id — it must stay pending for
    * the next compaction. The shrink itself (re-read, anti-join,
    * rename-aside swap) runs under the in-process dels writer lock
    * ([[delsLock]]), so a defer racing the swap blocks instead of
    * appending into a table about to be renamed out from under it —
    * within one JVM no defer can be lost at ANY interleaving (pinned
    * by ConcurrencySpec's defers-during-compaction arm); writers in
    * separate driver processes stay under the single-writer contract. */
  def compactTakedowns(spark: SparkSession, name: String): Unit = {
    if (!spark.catalog.tableExists(s"${name}_dels")) return
    // pin the pending set OUTSIDE the dels table: the purges below run
    // while it is being consumed, and the final rewrite would yank a
    // lazy plan's source out from under a late re-read
    val ids = spark.table(s"${name}_dels").select("id").localCheckpoint(true)
    if (spark.catalog.tableExists(s"${name}_buckets"))
      removeFromJaccardIndex(ids, "id", name)
    if (spark.catalog.tableExists(s"${name}_fps"))
      removeFromExactIndex(ids, "id", name)
    if (spark.catalog.tableExists(s"${name}_cells"))
      removeFromIvfIndex(ids, "id", name)
    if (spark.catalog.tableExists(s"${name}_pqcells"))
      removeFromPqIndex(ids, "id", name)
    shrinkDels(spark, name, ids)
  }

  /** Remove exactly `purged0`'s ids from `<name>_dels` — the tail of
    * every op that folds pending takedowns into a physical rewrite
    * ([[compactTakedowns]], the retrain ops). Keeps only ids deferred
    * AFTER the caller's pin; the purge set is pending-set-sized, so
    * its join is gated like every other deletion join ([[delJoin]]
    * discipline). Runs under the dels writer lock — see
    * [[compactTakedowns]]'s contract note. */
  private def shrinkDels(spark: SparkSession, name: String,
      purged0: DataFrame): Unit = {
    val purged = purged0.withColumnRenamed("id", "_ix_purged")
    val purgedSide =
      if (delIsSmall(spark, purged)) F.broadcast(purged)
      else purged.hint("shuffle_hash")
    delsLock(s"${name}_dels").synchronized {
      swapViaRename(spark, s"${name}_dels") { stage =>
        spark.table(s"${name}_dels")
          .join(purgedSide, F.col("id") === F.col("_ix_purged"), "left_anti")
          .write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(stage)
      }
      refreshPendingCount(spark, s"${name}_dels")
      ()
    }
  }

  /** Standing FILE compaction across every index family under `name` —
    * no deletion involved. Each daily Append writes one file per
    * bucket (the build ops' repartition-onto-the-grid posture), so a
    * year of appends is ~365 files per bucket and every probe pays
    * open/footer cost per file; until now only a takedown rewrite
    * compacted, and only when deletions were pending. This rewrites
    * each bucketed table onto its own grid (one file per bucket, no
    * exchange — the [[rewriteBucketedMinus]] scan shape with an empty
    * deletion set), rewrites each cell-partitioned table to one file
    * per cell, and folds the `_stats` append log (one row per
    * build/append/takedown per bucket) into one row per live bucket.
    * Reads are identical before and after — only the file layout
    * moves. Pending logical takedowns are NOT folded (that is
    * [[compactTakedowns]]'s job); `<name>_dels` is untouched. Runs
    * under the module's single-writer maintenance-window contract. */
  def compactIndex(spark: SparkSession, name: String): Unit = {
    val none = spark.range(0).select(F.col("id").as("_ix_del"))
    if (spark.catalog.tableExists(s"${name}_buckets")) {
      rewriteBucketedMinus(spark, s"${name}_buckets", "id", none,
        Seq("band", "band_hash"))
      rewriteBucketedMinus(spark, s"${name}_sigs", "id", none, Seq("id"))
      // zero-sum buckets (fully taken down) drop out; a bucket absent
      // from _stats reads as count 0 either way, so probes see no change
      swapViaRename(spark, s"${name}_stats") { stage =>
        spark.table(s"${name}_stats")
          .groupBy("band", "band_hash").agg(F.sum("cnt").as("cnt"))
          .filter(F.col("cnt") =!= 0L)
          .write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(stage)
      }
    }
    if (spark.catalog.tableExists(s"${name}_fps"))
      rewriteBucketedMinus(spark, s"${name}_fps", "id", none, Seq("fp"))
    Seq(s"${name}_cells", s"${name}_pqcells")
      .filter(spark.catalog.tableExists).foreach { t =>
        // one task per cell = one file per cell; the dynamic overwrite
        // replaces exactly the cells present — here, all of them (the
        // removeFromCellTable write shape, minus the deletion)
        withConf(spark, "spark.sql.sources.partitionOverwriteMode",
            "dynamic") {
          spark.table(t).repartition(F.col("cell"))
            .write.mode(SaveMode.Overwrite).insertInto(t)
        }
      }
  }

  /** RE-BAND the Jaccard index: rebuild `_buckets` and `_stats` at NEW
    * (numPerm, bands) from the STORED shingle-hash sets — the banding
    * budget is recall tuning (more bands at the same numPerm catch
    * lower-similarity pairs; a different numPerm re-prices the
    * signature), and a standing 100 TB index must be able to move it
    * WITHOUT re-reading the corpus text. `_sigs` already persists each
    * document's full k-shingle hash set, so the re-band is ONE scan of
    * sigs (minhash + band keys re-derived in a codegen pass) and two
    * grid writes; the text is never touched and `_sigs` itself is
    * parameter-independent and unchanged. `k` is immutable — the
    * stored sets ARE k-shingle hashes (changing k is a rebuild from
    * text, by construction). The new parameters land in TBLPROPERTIES,
    * so every future probe and append reads the re-banded contract;
    * pending takedowns (`_dels`) are untouched and keep filtering.
    * This is the no-trained-state family's [[retrainPqIndex]]: the
    * signature family's "geometry" is its hash parameters.
    *
    * Swap discipline and single-writer contract as everywhere
    * ([[swapViaRename]]). Re-banding to FINER bands (more bands, same
    * numPerm) can only widen candidate generation, so exact-verified
    * probe results are preserved or improved — the x146 oracle pins
    * the preserved case. */
  def rehashJaccardIndex(spark: SparkSession, name: String,
      numPerm: Int, bands: Int): Unit = {
    require(bands >= 1 && numPerm % bands == 0,
      s"index: bands must be >= 1 and divide numPerm " +
        s"(got numPerm=$numPerm, bands=$bands)")
    val (k, _, _) = readParams(spark, name)
    val nb = numBuckets(spark, s"${name}_buckets")
    val rowsPerBand = numPerm / bands
    // re-derived keys feed both grid writes — persist for the call
    // (the build's own two-writer posture)
    val keys = dedup.cachedPinned(
      spark.table(s"${name}_sigs").select(F.col("id"),
        F.posexplode(dedup.lshBandKeys(
          dedup.minhashFromHashes(F.col("sh"), numPerm),
          bands, rowsPerBand)).as(Seq("band", "band_hash"))))
    try {
      swapViaRename(spark, s"${name}_buckets") { stage =>
        // one task per bucket = one file per bucket (the build posture)
        keys.repartition(nb, F.col("band"), F.col("band_hash"))
          .write.mode(SaveMode.Overwrite).bucketBy(nb, "band", "band_hash")
          .format("parquet").saveAsTable(stage)
        spark.sql(s"ALTER TABLE $stage SET TBLPROPERTIES(" +
          s"'graft.k'='$k','graft.numPerm'='$numPerm'," +
          s"'graft.bands'='$bands')")
      }
      swapViaRename(spark, s"${name}_stats") { stage =>
        keys.groupBy("band", "band_hash")
          .agg(F.count(F.lit(1)).as("cnt"))
          .write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(stage)
      }
    } finally { keys.unpersist(blocking = false); () }
  }

  // ---------------- codebook / centroid RETRAIN ----------------

  /** The pinned pending set of `name` (None when no `_dels` table): an
    * eager, lineage-severed copy, because retrain both consumes it
    * (training/encode exclusion) and then folds it into `_dels` via
    * [[shrinkDels]] — a lazy plan would re-read a table being swapped. */
  private def pinnedPending(spark: SparkSession,
      name: String): Option[DataFrame] =
    if (!spark.catalog.tableExists(s"${name}_dels")) None
    else Some(spark.table(s"${name}_dels").select("id").localCheckpoint(true))

  /** `df` minus a pinned pending set on `idColName` — the [[delJoin]]
    * gate applied to the retrain exclusion joins. No distinct: an
    * anti-join ignores duplicate build keys, and deduplicating would
    * put an extra exchange inside the rewrite's one-exchange plan (the
    * ScaleSmoke receipt); re-deferred ids only overcount the gate,
    * which errs toward the safe (shuffled) side. */
  private def minusPinned(spark: SparkSession, df: DataFrame,
      pend: Option[DataFrame], idColName: String): DataFrame = pend match {
    case None => df
    case Some(p) =>
      val del = p.select(F.col("id").cast(LongType).as("_ix_del"))
      delJoin(df, del, idColName, "left_anti", delIsSmall(spark, del))
  }

  /** RETRAIN the IVF coarse quantizer of index `name` — the index
    * lifecycle op for a DRIFTING corpus: [[buildIvfIndex]]'s Append
    * deliberately assigns new batches against the day-1 centroid bank
    * (cell ids must stay stable mid-lifecycle), so after months of
    * appends the cell geometry no longer matches the data and probe
    * recall decays at a fixed nprobe budget. This trains a FRESH bank
    * on the current live corpus (the same Lloyd-as-Spark-jobs path as
    * the build — `portableSeed` keeps the iters = 0 seed path exactly
    * replayable, the x143 oracle gate), re-assigns every live vector
    * in one codegen pass, and swaps both tables under the rename-aside
    * discipline. Self-contained: `_cells` stores the vectors, so no
    * external source is needed (contrast [[retrainPqIndex]]). Passing
    * `nlist` > 0 RESIZES the cell geometry in the same pass — the
    * growth path an append-only corpus eventually needs (see the
    * inline note below).
    *
    * Pending logical takedowns are handled the right-to-be-forgotten
    * way: pending ids are EXCLUDED from both the training sample and
    * the re-encode (the rewrite is their physical purge — deleted data
    * must not shape the new geometry either), and the pinned pending
    * set is folded out of `_dels` afterwards ([[shrinkDels]] — a defer
    * landing mid-retrain stays pending, the compactTakedowns
    * contract). Probe results change ONLY through candidate geometry:
    * with nprobe = nlist a post-retrain probe is still exactly the
    * brute force over survivors.
    *
    * Scale shape: training touches a ≤ sampleN hash sample; the
    * re-encode is ONE scan of the live cells (codegen argmax against
    * the broadcast-literal new bank) plus the one exchange every cell
    * rewrite pays (repartition onto the new cell grid → one file per
    * cell); the corpus is never joined or shuffled otherwise. Runs
    * under the module's single-writer maintenance-window contract. */
  def retrainIvfIndex(spark: SparkSession, name: String, iters: Int = 5,
      sampleN: Int = 20000, sampleOneIn: Long = 0L,
      portableSeed: Boolean = false, nlist: Int = 0): Unit = {
    val dim = readIvfDim(spark, name)
    // nlist > 0 RESIZES the cell geometry — the growth path an
    // append-only corpus eventually needs (cells sized for day 1 go
    // hot as the corpus grows; nlist ∝ √n keeps probe cost flat).
    // Safe here precisely because retrain re-assigns EVERY live row:
    // unlike append-time cell ids, nothing persisted refers to the old
    // geometry after the swap. 0 (default) keeps the stored width.
    val nlistEff =
      if (nlist > 0) nlist
      else readIvfBank(spark, name).length / (dim + 1)
    val pend = pinnedPending(spark, name)
    val live = minusPinned(spark, spark.table(s"${name}_cells"), pend, "n_id")
    val bank = similarity.trainIvfCentroids(live, "n_id", "n_vec", nlistEff,
      iters, sampleN, sampleOneIn, portableSeed)
    require(bank.nonEmpty,
      s"index.retrainIvfIndex: '$name' has no live vectors to retrain on")
    val bankLit = F.typedlit(bank.toSeq)
    swapViaRename(spark, s"${name}_cells", partitioned = true) { stage =>
      live.select(F.col("n_id"), F.col("n_vec"), F.col("n_nrm"),
          F.element_at(F.call_function("graft_centroid_topk",
            F.col("n_vec"), bankLit, F.lit(1)), 1).as("cell"))
        .repartition(F.col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .format("parquet").saveAsTable(stage)
      spark.sql(s"ALTER TABLE $stage SET TBLPROPERTIES(" +
        s"'graft.dim'='$dim')")
    }
    swapViaRename(spark, s"${name}_centroids") { stage =>
      import spark.implicits._
      bank.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
        .toDF("pos", "v").coalesce(1)
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(stage)
    }
    pend.foreach(p => shrinkDels(spark, name, p))
  }

  /** RETRAIN both quantizer banks of PQ index `name` (IVF centroids +
    * PQ codebooks, raw or residual per the index's own stored flag) —
    * [[retrainIvfIndex]]'s sibling for the code-storing layout, and
    * the remedy for the recall decay [[buildPqIndex]]'s
    * stored-bank-append contract accumulates on a drifting corpus.
    *
    * PQ codes are LOSSY — the original vectors are deliberately not
    * persisted — so re-encoding needs the authoritative vector store:
    * `df` (any frame holding at least every live indexed id's current
    * vector; extra rows are ignored). The live set is exactly the ids
    * physically in `_pqcells` minus the pinned pending takedowns —
    * rows `df` carries for already-removed ids can never resurrect
    * (the takedown contract), and the rewrite must cover ALL live ids:
    * coverage is enforced by counting the staged table against the
    * live set before the swap, so a partial vector store aborts with
    * the index untouched rather than silently shrinking it.
    *
    * The storage contract holds by default: nlist, m, ksub (inferred
    * from the stored banks' shapes) and the residual flag stay fixed —
    * retrain refreshes bank VALUES, not the code-space shape, so
    * probes and appends keep working unchanged against the new banks.
    * Because the rewrite re-encodes EVERY live row, the shape can
    * also be RESIZED in the same pass when the corpus has outgrown it:
    * `nlist`/`m`/`ksub` > 0 override the stored widths (nlist ∝ √n
    * keeps probe cost flat; a larger m buys recall at more ints per
    * row) — nothing persisted refers to the old geometry after the
    * swap, and the updated widths land in TBLPROPERTIES/`_pqbank` so
    * later appends and probes read the resized contract. The residual
    * flag alone is immutable (it is a semantic, not a width). Pending
    * ids are excluded from training and encode and folded out of
    * `_dels` (see [[retrainIvfIndex]]).
    *
    * Scale shape: training touches hash samples; the rewrite pays one
    * id semi-join of `df` against the live id set (the one join the
    * lossy layout forces — O(corpus), like the rewrite itself) plus
    * the cell-grid exchange; no other shuffle. Single-writer
    * maintenance-window contract. */
  def retrainPqIndex(df: DataFrame, idCol: String, vecCol: String,
      name: String, ivfIters: Int = 2, pqIters: Int = 0,
      sampleN: Int = 20000, sampleOneIn: Long = 0L,
      portableSeed: Boolean = false, nlist: Int = 0, m: Int = 0,
      ksub: Int = 0): Unit = {
    val spark = df.sparkSession
    similarity.requireIntegralId(df, idCol, "index.retrainPqIndex")
    val dim = readPqProp(spark, name, "graft.dim").toInt
    val mEff =
      if (m > 0) m else readPqProp(spark, name, "graft.m").toInt
    require(dim % mEff == 0,
      s"index.retrainPqIndex: m=$mEff must divide dim=$dim")
    val residual =
      readPqPropOr(spark, name, "graft.residual", "false").toBoolean
    val nlistEff =
      if (nlist > 0) nlist
      else readPqBank(spark, name, "ivf").length / (dim + 1)
    // cb layout is m × ksub × (dim/m) doubles → ksub = |cb| / dim; a
    // tiny build that trained kEff < ksub codewords retrains at kEff —
    // the effective budget the stored codes were paid at
    val ksubEff =
      if (ksub > 0) ksub
      else readPqBank(spark, name, "cb").length / dim
    val pend = pinnedPending(spark, name)
    val liveIds = minusPinned(spark,
      spark.table(s"${name}_pqcells").select("n_id"), pend, "n_id")
    val nLive = liveIds.count()
    require(nLive > 0,
      s"index.retrainPqIndex: '$name' has no live vectors to retrain on")
    val src = df.select(F.col(idCol).cast(LongType).as("n_id"),
      F.col(vecCol).as("n_vec"))
    val liveVecs = src.join(liveIds, Seq("n_id"), "left_semi")
    val bank = similarity.trainIvfCentroids(liveVecs, "n_id", "n_vec",
      nlistEff, ivfIters, sampleN, sampleOneIn, portableSeed)
    val cb =
      if (residual) similarity.trainPqCodebooks(
        residualFrame(similarity.cleanDim(liveVecs, "n_vec", dim),
          "n_id", "n_vec", bank, dim), "n_id", "_rc_r",
        mEff, ksubEff, pqIters, sampleN, sampleOneIn, portableSeed)
      else similarity.trainPqCodebooks(liveVecs, "n_id", "n_vec", mEff,
        ksubEff, pqIters, sampleN, sampleOneIn, portableSeed)
    swapViaRename(spark, s"${name}_pqcells", partitioned = true) { stage =>
      encodeCells(similarity.cleanDim(liveVecs, "n_vec", dim),
          "n_id", "n_vec", bank, cb, mEff, dim, residual)
        .repartition(F.col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .format("parquet").saveAsTable(stage)
      // coverage gate BEFORE any rename: a vector store missing live
      // ids (or carrying duplicates / ragged vectors for them) must
      // abort with the standing index intact, not swap in a shrunken
      // generation. Throwing here leaves only a stage orphan, which
      // the next retrain's reset clears.
      val staged = spark.table(stage).count()
      require(staged == nLive,
        s"index.retrainPqIndex: vector source re-encoded $staged of " +
          s"$nLive live indexed ids — it must cover every live id " +
          "exactly once at the trained width")
      spark.sql(s"ALTER TABLE $stage SET TBLPROPERTIES(" +
        s"'graft.dim'='$dim', 'graft.m'='$mEff', " +
        s"'graft.residual'='$residual')")
    }
    swapViaRename(spark, s"${name}_pqbank") { stage =>
      import spark.implicits._
      val rows = bank.zipWithIndex.map { case (v, i) => ("ivf", i, v) } ++
        cb.zipWithIndex.map { case (v, i) => ("cb", i, v) }
      rows.toSeq.toDF("kind", "pos", "v").coalesce(1)
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(stage)
    }
    pend.foreach(p => shrinkDels(spark, name, p))
  }

  /** One-row-per-physical-table inventory of everything under index
    * `name` — the observability surface of the index lifecycle: every
    * mutator (build/append/defer/takedown/compact/retrain) moves state
    * a production deployment needs to SEE before trusting a
    * maintenance run. Columns: `part` (the table suffix), `n_rows`,
    * and `params` — the stored `graft.*` TBLPROPERTIES rendered
    * `k=v,k=v` in key order, i.e. the SAME values every probe reads
    * back, so parameter drift between what was built and what ops
    * believe is visible in one query. The pending-takedown depth is
    * the `dels` row; signature families with no trained state
    * (Jaccard, exact) have no retrain op by construction — their
    * params ARE the geometry, so rebuild ≡ retrain.
    *
    * Scale shape: one metadata-cheap count per table (parquet
    * row-group stats — no data columns scanned) plus catalog property
    * reads, over a fixed ≤ 12-suffix inventory — driver-bounded by
    * construction. */
  def describeIndex(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val suffixes = Seq("buckets", "sigs", "stats", "fps", "cells",
      "centroids", "pqcells", "pqbank", "dels", "cmap", "cremap",
      "cedges")
    suffixes.flatMap { sfx =>
      val t = s"${name}_$sfx"
      if (!spark.catalog.tableExists(t)) None
      else {
        val params = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
          .map(r => r.getString(0) -> r.getString(1))
          .filter(_._1.startsWith("graft."))
          .sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(",")
        Some((sfx, spark.table(t).count(), params))
      }
    }.toDF("part", "n_rows", "params")
  }

  /** `df` minus index `name`'s PENDING logical takedowns on `idColName`
    * — a no-op when `<name>_dels` doesn't exist. Every probe's index
    * side passes through here, so a [[deferTakedown]] is effective from
    * the next query on.
    *
    * The anti-join is COUNT-GATED: below
    * `spark.graft.index.pendingBroadcastThreshold` (default 10M ids ≈
    * 80 MB — the same posture as `cmap.localAffectedThreshold`) the
    * pending set broadcasts, keeping the probe shuffle-free; above it
    * the join falls back to a shuffled anti-join, because the pending
    * set's size is bounded only by the deployment's compaction
    * discipline (a skipped month of daily 0.1% takedowns on a 10B-doc
    * corpus is ~300M ids — multi-GB, executor-OOM territory as a
    * broadcast). The gate count comes from the [[pendingCounts]] cache
    * maintained by every dels writer (defer/compact/rebuild), so probe
    * construction normally costs NO job; the count() is the cold-start
    * fallback for a session that has not written yet. Results are
    * identical on either side of the gate — only the physical join
    * strategy moves, so even an out-of-contract stale count cannot
    * change rows. */
  private[graft] def minusPending(spark: SparkSession, name: String,
      df: DataFrame, idColName: String): DataFrame =
    if (!spark.catalog.tableExists(s"${name}_dels")) df
    else {
      val dels = spark.table(s"${name}_dels")
        .select(F.col("id").as("_ix_pending"))
      val cap = spark.conf
        .get("spark.graft.index.pendingBroadcastThreshold", "10000000").toLong
      val cnt: Long = pendingCounts.computeIfAbsent(
        pendingKey(spark, s"${name}_dels"),
        _ => spark.table(s"${name}_dels").count())
      val side =
        if (cnt <= cap) F.broadcast(dels)
        // hint the shuffled-hash strategy explicitly: without it AQE
        // could still promote a just-over-threshold set to a broadcast
        else dels.hint("shuffle_hash")
      df.join(side, F.col(idColName) === F.col("_ix_pending"), "left_anti")
    }

  /** TAKEDOWN for the Jaccard index — the [[removeComponentIds]]
    * lifecycle op for the `_buckets`/`_sigs`/`_stats` family: deleted
    * documents' band keys and shingle sets are physically PURGED (a
    * tombstone would not satisfy a legal-removal request, and a ghost
    * row would keep matching future probes as a dup verdict). After the
    * call, probes behave exactly as if the index had been rebuilt on
    * the survivors — the build's hash parameters are untouched, so
    * that equality is literal (the x127 oracle). `_stats` is never
    * rewritten: the probe aggregates stats with SUM, so the takedown
    * appends one NEGATIVE count row per affected bucket (computed from
    * the same single scan posture — the corpus is never shuffled). */
  def removeFromJaccardIndex(ids: DataFrame, idCol: String,
      name: String): Unit = {
    similarity.requireIntegralId(ids, idCol, "index.removeFromJaccardIndex")
    val spark = ids.sparkSession
    val del = dedup.cachedPinned(delFrame(ids, idCol))
    try {
      // the decrement is computed from the PRE-rewrite buckets table,
      // pinned eagerly (localCheckpoint — the source is about to be
      // swapped), but APPENDED only after the rewrite commits: a retry
      // after a mid-takedown failure then finds the rows already gone
      // and appends nothing, instead of decrementing the same buckets
      // twice and dragging _stats sums below live counts (maxBucket
      // pruning misclassifies on understated counts; an overstated
      // count — crash between rewrite and append — only errs hot-ward,
      // which is pair-complete)
      val dec = delJoin(spark.table(s"${name}_buckets"), del, "id",
          "left_semi", delIsSmall(spark, del))
        .groupBy("band", "band_hash")
        .agg((-F.count(F.lit(1))).as("cnt"))
        .localCheckpoint(true)
      rewriteBucketedMinus(spark, s"${name}_buckets", "id", del,
        Seq("band", "band_hash"))
      rewriteBucketedMinus(spark, s"${name}_sigs", "id", del, Seq("id"))
      dec.write.mode(SaveMode.Append).format("parquet")
        .saveAsTable(s"${name}_stats")
    } finally { del.unpersist(blocking = false); () }
  }

  /** TAKEDOWN for the exact-dedup index: deleted documents'
    * fingerprints are physically purged from `_fps`; probes stop
    * matching them immediately (rebuild-equality is the x128 oracle).
    * The canonicalize property survives the rewrite. */
  def removeFromExactIndex(ids: DataFrame, idCol: String,
      name: String): Unit = {
    similarity.requireIntegralId(ids, idCol, "index.removeFromExactIndex")
    val spark = ids.sparkSession
    // pinned: the rewrite consumes the set twice (count gate + join)
    val del = dedup.cachedPinned(delFrame(ids, idCol))
    try rewriteBucketedMinus(spark, s"${name}_fps", "id", del, Seq("fp"))
    finally { del.unpersist(blocking = false); () }
  }

  /** TAKEDOWN for the IVF ANN index: deleted vectors leave `_cells`;
    * only their cells' directories are rewritten. The trained centroid
    * bank is deliberately KEPT — cell geometry is training state, not
    * per-document data, and retraining would silently shift every
    * surviving assignment (the append contract in [[buildIvfIndex]]).
    * With nprobe = nlist a post-takedown probe is provably the brute
    * force over survivors — the x129 oracle. */
  def removeFromIvfIndex(ids: DataFrame, idCol: String,
      name: String): Unit = {
    similarity.requireIntegralId(ids, idCol, "index.removeFromIvfIndex")
    val spark = ids.sparkSession
    removeFromCellTable(spark, s"${name}_cells", delFrame(ids, idCol))
  }

  /** TAKEDOWN for the PQ index (raw or residual — the stored codes are
    * rows either way): deleted vectors' codes leave `_pqcells`; only
    * their cells' directories are rewritten; the persisted quantizer
    * banks are kept (see [[removeFromIvfIndex]] — and for PQ the codes
    * of every surviving row were computed against THOSE banks, so
    * replacing them would corrupt the survivors too). Post-takedown
    * probes rank exactly the stored survivor codes — the x130 oracle
    * replays the full build-time training and restricts the ranking to
    * survivors. */
  def removeFromPqIndex(ids: DataFrame, idCol: String,
      name: String): Unit = {
    similarity.requireIntegralId(ids, idCol, "index.removeFromPqIndex")
    val spark = ids.sparkSession
    removeFromCellTable(spark, s"${name}_pqcells", delFrame(ids, idCol))
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
    val idx = minusPending(spark, name, spark.table(s"${name}_buckets"), "id")
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

  // ---------------- persistent exact-dedup index ----------------

  /** Build (Overwrite) or extend (Append) a persistent EXACT-dedup
    * index: one md5 fingerprint row per document, bucketed by
    * fingerprint — the byte-identity sibling of [[buildJaccardIndex]]
    * for the daily-crawl lifecycle. A probe joins the new batch's
    * fingerprints against the pre-placed table, so discovering which of
    * today's documents already exist in a 100 TB history shuffles only
    * the batch (16-byte keys), never the history. `canonicalize`
    * fingerprints the folded text ([[text.foldedText]]) so re-crawl
    * variants (composition, casing, spacing) also hit; it is recorded
    * as a table property and enforced at probe/append time — mixing
    * folded and raw fingerprints in one index would silently miss. */
  def buildExactIndex(df: DataFrame, idCol: String, textCol: String,
      name: String, canonicalize: Boolean = false, buckets: Int = 64,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    if (mode == SaveMode.Append && spark.catalog.tableExists(s"${name}_fps")) {
      val stored = readExactCanonicalize(spark, name)
      require(stored == canonicalize,
        s"index: append canonicalize=$canonicalize does not match the " +
          s"build's canonicalize=$stored")
    }
    if (mode == SaveMode.Overwrite)
      Seq(s"${name}_fps", s"${name}_dels").foreach(resetManagedTable(spark, _))
    val key = if (canonicalize) text.foldedText(F.col(textCol))
      else F.col(textCol)
    df.select(F.col(idCol).cast(LongType).as("id"),
        text.fingerprintMd5(key).as("fp"))
      // one task per bucket = one file per bucket per append (see the
      // [[buildJaccardIndex]] small-file note)
      .repartition(buckets, F.col("fp"))
      .write.mode(mode).bucketBy(buckets, "fp")
      .format("parquet").saveAsTable(s"${name}_fps")
    if (mode == SaveMode.Overwrite)
      spark.sql(s"ALTER TABLE ${name}_fps SET TBLPROPERTIES(" +
        s"'graft.canonicalize'='$canonicalize')")
  }

  private def readExactCanonicalize(spark: SparkSession, name: String): Boolean = {
    val props = spark.sql(s"SHOW TBLPROPERTIES ${name}_fps").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    props.getOrElse("graft.canonicalize", throw new IllegalArgumentException(
      s"index: table ${name}_fps has no 'graft.canonicalize' property — " +
        "not built by buildExactIndex?")).toBoolean
  }

  /** The fingerprint key an exact index `name` was built with, applied
    * to `textCol` — folded or raw per the stored property, so a caller
    * (batch probe or streaming probe) can never hash differently from
    * the build. */
  def exactIndexKey(spark: SparkSession, name: String,
      textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    if (readExactCanonicalize(spark, name)) text.foldedText(textCol)
    else textCol

  /** The indexed fingerprint set of exact index `name`, as a one-column
    * (`fp`) frame — the static side of a stream-static probe. */
  def probeExactIndexFingerprints(spark: SparkSession,
      name: String): DataFrame =
    minusPending(spark, name, spark.table(s"${name}_fps"), "id")
      .select("fp")

  /** Probe the exact index: every (id_new, id_indexed, fingerprint)
    * match between the batch and the indexed history. The fold mode
    * comes from the index's own table property — probe and build cannot
    * drift. Only the batch side shuffles (to meet the fp-bucketed table
    * in place); use a `left_anti` of the batch against
    * `probeExactIndex(...)` ids — or [[dedupAgainstExactIndex]] — to
    * keep just the genuinely-new documents. */
  def probeExactIndex(spark: SparkSession, dfNew: DataFrame,
      idCol: String, textCol: String, name: String): DataFrame = {
    val key = exactIndexKey(spark, name, F.col(textCol))
    val newFps = dfNew.select(F.col(idCol).cast(LongType).as("id_new"),
      text.fingerprintMd5(key).as("fp"))
    newFps.join(minusPending(spark, name, spark.table(s"${name}_fps"), "id"),
        "fp")
      .select(F.col("id_new"), F.col("id").as("id_indexed"),
        F.col("fp").as("fingerprint"))
  }

  /** The batch minus everything the index has seen: the one-call
    * incremental exact dedup (schema of `dfNew`, unchanged). */
  def dedupAgainstExactIndex(spark: SparkSession, dfNew: DataFrame,
      idCol: String, textCol: String, name: String): DataFrame = {
    val seen = probeExactIndex(spark, dfNew, idCol, textCol, name)
      .select(F.col("id_new").cast(LongType).as("_ei_id")).distinct()
    dfNew.join(seen, F.col(idCol).cast(LongType) === F.col("_ei_id"),
      "left_anti")
  }

  // ---------------- persistent IVF ANN index ----------------

  /** Build (Overwrite) or extend (Append) a persistent IVF ANN index —
    * the embedding-space sibling of [[buildJaccardIndex]] for the
    * daily-crawl lifecycle: centroids trained ONCE
    * ([[similarity.trainIvfCentroids]] — Lloyd passes as Spark jobs),
    * every corpus vector assigned to its nearest cell in one codegen
    * pass, and the assignments persisted PARTITIONED BY CELL so a probe
    * reads only the directories of the cells it targets (static or
    * dynamic partition pruning) instead of the whole corpus.
    *
    * Append assigns the new batch with the STORED centroid bank (cell
    * ids must stay stable — retraining would silently shift every
    * boundary) and validates the dimension. The centroid table holds
    * nlist × (dim + 1) doubles — driver-sized by construction.
    *
    * Reference model: pydiverse.transform has no ANN surface; this is
    * part of graft's training-data-pipeline extension family. */
  def buildIvfIndex(df: DataFrame, idCol: String, vecCol: String,
      name: String, nlist: Int = 64, iters: Int = 5, sampleN: Int = 20000,
      sampleOneIn: Long = 0L, mode: SaveMode = SaveMode.Overwrite,
      portableSeed: Boolean = false): Unit = {
    require(nlist >= 1, s"index: nlist must be >= 1 (got $nlist)")
    val spark = df.sparkSession
    val dim = df.select(F.size(F.col(vecCol))).head().getInt(0)
    val appending =
      mode == SaveMode.Append && spark.catalog.tableExists(s"${name}_cells")
    if (!appending)
      Seq(s"${name}_cells", s"${name}_centroids", s"${name}_dels")
        .foreach(resetManagedTable(spark, _))
    val bank: Array[Double] =
      if (appending) {
        val stored = readIvfBank(spark, name)
        val storedDim = readIvfDim(spark, name)
        require(storedDim == dim,
          s"index: append dim $dim does not match the build's $storedDim")
        stored
      } else similarity.trainIvfCentroids(
        df, idCol, vecCol, nlist, iters, sampleN, sampleOneIn, portableSeed)
    val bankLit = F.typedlit(bank.toSeq)
    val cells = df.select(
      F.col(idCol).cast(LongType).as("n_id"),
      F.col(vecCol).as("n_vec"),
      similarity.norm(F.col(vecCol)).as("n_nrm"),
      F.element_at(F.call_function("graft_centroid_topk",
        F.col(vecCol), bankLit, F.lit(1)), 1).as("cell"))
    // co-locate each cell's rows in one task before the dynamic-
    // partition write: one file per cell per append instead of one per
    // (task × cell) — same small-file explosion as the bucketed writes
    // (see [[buildJaccardIndex]]); the writer's own partition-column
    // sort handles a task holding several cells
    cells.repartition(F.col("cell"))
      .write.mode(mode).partitionBy("cell")
      .format("parquet").saveAsTable(s"${name}_cells")
    if (!appending) {
      import spark.implicits._
      bank.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
        .toDF("pos", "v").coalesce(1)
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${name}_centroids")
      spark.sql(s"ALTER TABLE ${name}_cells SET TBLPROPERTIES(" +
        s"'graft.dim'='$dim')")
    }
  }

  /** The flat centroid bank recorded at build time (layout of
    * [[similarity.trainIvfCentroids]]: centroids ++ norms). */
  def readIvfBank(spark: SparkSession, name: String): Array[Double] =
    spark.table(s"${name}_centroids").orderBy("pos")
      .collect().map(_.getDouble(1))

  private def readIvfDim(spark: SparkSession, name: String): Int = {
    val props = spark.sql(s"SHOW TBLPROPERTIES ${name}_cells").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    props.getOrElse("graft.dim", throw new IllegalArgumentException(
      s"index: table ${name}_cells has no 'graft.dim' property — " +
        "not built by buildIvfIndex?")).toInt
  }

  /** Probe the IVF index: exact cosine top-k of each query over the
    * vectors in its `nprobe` nearest cells. The centroid bank comes from
    * the index's own table — probe and build cannot drift. With
    * `broadcastQueries` (the queries ≪ corpus norm) the probe is
    * shuffle-FREE: the query batch broadcasts, the cell equi-join prunes
    * the partitioned index to only the probed cells' directories
    * (dynamic partition pruning), and ranking is the bounded
    * [[similarity.twoStageTopK]]. With nprobe ≥ nlist the result is
    * exactly [[similarity.bruteForceTopK]] (the x56 oracle gate). */
  def probeIvfIndex(spark: SparkSession, queries: DataFrame,
      idCol: String, vecCol: String, name: String, k: Int,
      nprobe: Int = 8, broadcastQueries: Boolean = true): DataFrame = {
    require(k >= 1 && nprobe >= 1, "index: k and nprobe must be >= 1")
    val bankLit = F.typedlit(readIvfBank(spark, name).toSeq)
    val q0 = queries.select(F.col(idCol).cast(LongType).as("q_id"),
      F.col(vecCol).as("q_vec"),
      similarity.norm(F.col(vecCol)).as("q_nrm"),
      F.explode(F.call_function("graft_centroid_topk",
        F.col(vecCol), bankLit, F.lit(nprobe))).as("cell"))
    val q = if (broadcastQueries) F.broadcast(q0) else q0
    val c0 = minusPending(spark, name, spark.table(s"${name}_cells"), "n_id")
    // Under the broadcast contract the query batch is small, so one tiny
    // job collects its distinct probed cells and turns them into a
    // STATIC partition filter: the scan reads only nprobe-ish of nlist
    // directories. (Dynamic partition pruning won't fire here on its
    // own — its selectivity heuristic wants a filtered build side, and
    // the exploded query stream has no such predicate.) Large
    // non-broadcast probes skip this and scan all cells once.
    val c = if (broadcastQueries) {
      val cells = q0.select("cell").distinct().collect().map(_.getInt(0))
      c0.filter(F.col("cell").isin(cells.map(Integer.valueOf).toSeq: _*))
    } else c0
    val scored = c.join(q, "cell")
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (similarity.dot(F.col("q_vec"), F.col("n_vec"))
          / F.col("q_nrm") / F.col("n_nrm")).as("cos"))
    similarity.twoStageTopK(scored, k)
  }

  /** Persistent IVF-PQ index — the disk layout of billion-vector ANN:
    * `<name>_pqcells` stores each corpus vector as its IVF cell plus m
    * PQ codeword ints (8 ints for a 64-float vector — the vectors
    * themselves are NOT persisted), partitioned by cell so a probe
    * reads only its nprobe directories; `<name>_pqbank` stores both
    * trained banks (the IVF centroid bank and the flat PQ codebook).
    * Append re-reads the stored banks, so daily batches encode against
    * the SAME quantizers and land in stable cells — the
    * [[buildIvfIndex]] lifecycle, at m-int-per-row storage cost.
    * On append the STORED parameters govern: the training arguments
    * (nlist, m, ksub, iters, sample, seed) are ignored in favor of the
    * banks persisted at build time — passing different values is not an
    * error, because re-deriving quantizers mid-lifecycle would split
    * the index into incompatible code spaces. An empty append batch is
    * a no-op (a zero-vector day must not crash the daily job); an
    * empty FRESH build is refused, since quantizers cannot be trained
    * on nothing.
    *
    * `residual = true` stores RESIDUAL codes — each vector quantized as
    * v − centroid(cell) against residual-trained codebooks (Jégou
    * §IV-A, see [[similarity.ivfPqResidualTopK]]) — materially better
    * recall at the same m-int storage cost; the flag persists in
    * TBLPROPERTIES and governs appends and probes. */
  def buildPqIndex(df: DataFrame, idCol: String, vecCol: String,
      name: String, nlist: Int = 64, m: Int = 8, ksub: Int = 16,
      ivfIters: Int = 2, pqIters: Int = 0, sampleN: Int = 20000,
      sampleOneIn: Long = 0L, portableSeed: Boolean = false,
      mode: SaveMode = SaveMode.Overwrite,
      residual: Boolean = false): Unit = {
    require(nlist >= 1 && m >= 1 && ksub >= 1)
    val spark = df.sparkSession
    val appending =
      mode == SaveMode.Append && spark.catalog.tableExists(s"${name}_pqcells")
    val dimRow = df.select(F.size(F.col(vecCol))).head(1)
    if (dimRow.isEmpty) {
      require(appending,
        "index: cannot build a PQ index from an empty corpus " +
          "(quantizers need training data); empty APPEND batches no-op")
      return
    }
    val dim = dimRow.head.getInt(0)
    if (!appending)
      Seq(s"${name}_pqcells", s"${name}_pqbank", s"${name}_dels")
        .foreach(resetManagedTable(spark, _))
    // stored parameters govern appends — including the RESIDUAL flag: a
    // batch encoded raw into a residual index (or vice versa) would
    // land in an incompatible code space. Indexes built before the flag
    // existed are raw-coded by construction, hence the "false" default.
    val resEff =
      if (appending)
        readPqPropOr(spark, name, "graft.residual", "false").toBoolean
      else residual
    val (bank, cb) =
      if (appending) {
        val storedDim = readPqProp(spark, name, "graft.dim").toInt
        require(storedDim == dim,
          s"index: append dim $dim does not match the build's $storedDim")
        (readPqBank(spark, name, "ivf"), readPqBank(spark, name, "cb"))
      } else {
        val ivf = similarity.trainIvfCentroids(df, idCol, vecCol, nlist,
          ivfIters, sampleN, sampleOneIn, portableSeed)
        // residual mode trains the codebooks on v − centroid(cell)
        // (Jégou §IV-A) — the training frame mirrors the encode path
        val cbTrain =
          if (resEff)
            similarity.trainPqCodebooks(
              residualFrame(similarity.cleanDim(df, vecCol, dim),
                idCol, vecCol, ivf, dim), "n_id", "_rc_r",
              m, ksub, pqIters, sampleN, sampleOneIn, portableSeed)
          else similarity.trainPqCodebooks(df, idCol, vecCol, m, ksub,
            pqIters, sampleN, sampleOneIn, portableSeed)
        (ivf, cbTrain)
      }
    val mEff = if (appending) readPqProp(spark, name, "graft.m").toInt else m
    // ragged-row hygiene (the hammingTopK posture): a vector that isn't
    // exactly `dim` wide has no defined code — exclude it rather than
    // persist a NULL/misaligned encoding into the index
    val clean = similarity.cleanDim(df, vecCol, dim)
    val cells = encodeCells(clean, idCol, vecCol, bank, cb, mEff, dim, resEff)
    // one file per cell per append, not per (task × cell) — see
    // [[buildIvfIndex]]'s small-file note
    cells.repartition(F.col("cell"))
      .write.mode(mode).partitionBy("cell")
      .format("parquet").saveAsTable(s"${name}_pqcells")
    if (!appending) {
      import spark.implicits._
      val rows = bank.zipWithIndex.map { case (v, i) => ("ivf", i, v) } ++
        cb.zipWithIndex.map { case (v, i) => ("cb", i, v) }
      rows.toSeq.toDF("kind", "pos", "v").coalesce(1)
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${name}_pqbank")
      spark.sql(s"ALTER TABLE ${name}_pqcells SET TBLPROPERTIES(" +
        s"'graft.dim'='$dim', 'graft.m'='$m', 'graft.residual'='$resEff')")
    }
  }

  /** Persistent near-dup COMPONENT MAP with incremental appends — the
    * round-9 verdict's x98 gap: the daily lifecycle used to re-run
    * connected components over the whole accumulated pair set; this
    * maintains the component assignment as index state and resolves
    * each day's edges against it, so the iterative CC work scales with
    * the BATCH, never the corpus.
    *
    * Tables: `<name>_cmap` (id, rep0) is APPEND-ONLY — rep0 is the
    * component representative (global min id, graft's keep rule) as of
    * the row's insertion day; `<name>_cremap` (rep0, rep) is the small,
    * FLAT remap for representatives that later merged away. The current
    * component of any id is coalesce(remap[rep0], rep0)
    * ([[readComponentMap]]). The remap is kept flat by construction —
    * every append re-points existing entries through that day's
    * changes — so resolution is ONE broadcast hash join, never a chain
    * walk.
    *
    * Append-day work ([[appendComponentEdges]]): resolve the batch
    * edges' old endpoints via one broadcast semi-join against the map
    * (a scan, no shuffle of the corpus), CONTRACT each edge to current
    * representatives, run [[dedup.connectedComponents]] over the
    * contracted edges only (batch-sized — merging two million-row
    * components costs one 2-node edge), then append the batch's rows
    * and rewrite the small remap. Day-by-day appends provably equal
    * the full recompute over the union of all edges — that equality IS
    * the x123 oracle, and the batch-bounded shuffle is pinned in
    * ScaleSmokeSpec.
    *
    * Contract: `nodes` ids must be NEW (never inserted before); edges
    * may touch any already-mapped id. An edge endpoint that is neither
    * new nor mapped joins as itself but gets no map row (document
    * probes against an index should not invent corpus rows). */
  def buildComponentMap(nodes: DataFrame, pairs: DataFrame, idCol: String,
      name: String): Unit = {
    requireComponentIds(nodes, idCol, pairs, "index.buildComponentMap")
    val spark = nodes.sparkSession
    Seq(s"${name}_cmap", s"${name}_cremap", s"${name}_cedges")
      .foreach(resetManagedTable(spark, _))
    // the pair frame is often an expensive pipeline (an LSH pair join,
    // a probe) and is consumed twice (CC + the edge log) — pin it for
    // the call (cachedPinned: dedup.cached would auto-release after the
    // FIRST consuming query; the finally block unpersists)
    val e = dedup.cachedPinned(pairs.select(
      F.col("id_a").cast(LongType).as("id_a"),
      F.col("id_b").cast(LongType).as("id_b")))
    val comp = dedup.cached(dedup.connectedComponents(e))
    try {
      nodes.select(F.col(idCol).cast(LongType).as("id"))
        .join(comp.withColumnRenamed("component", "_cm_c"), Seq("id"), "left")
        .select(F.col("id"), F.coalesce(F.col("_cm_c"), F.col("id")).as("rep0"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${name}_cmap")
      // the edge LOG, labeled with the edge's component at insert time
      // (same resolution invariant as cmap rows) — what makes DELETION
      // possible: a removal re-solves only the affected components'
      // edges, found by a broadcast filter on the label, never by
      // re-resolving every endpoint (see removeComponentIds)
      e.join(comp.select(F.col("id").as("id_a"),
          F.col("component").as("_cm_c")), Seq("id_a"), "left")
        .select(F.col("id_a"), F.col("id_b"),
          F.coalesce(F.col("_cm_c"), F.col("id_a")).as("rep0"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${name}_cedges")
    } finally {
      comp.unpersist(blocking = false)
      e.unpersist(blocking = false)
      ()
    }
    spark.emptyDataFrame
      .select(F.lit(0L).as("rep0"), F.lit(0L).as("rep")).where(F.lit(false))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${name}_cremap")
  }

  /** One incremental day: insert `nodes` (new ids) and connect `pairs`
    * (edges touching new and/or mapped ids). See [[buildComponentMap]]
    * for the state layout and scale contract. */
  def appendComponentEdges(nodes: DataFrame, pairs: DataFrame,
      idCol: String, name: String): Unit = {
    requireComponentIds(nodes, idCol, pairs, "index.appendComponentEdges")
    val spark = nodes.sparkSession
    val cmap = spark.table(s"${name}_cmap")
    val remap = spark.table(s"${name}_cremap")
    // the batch's pair frame is typically an expensive near-dup
    // pipeline (LSH pairs ∪ index-probe hits) and is consumed THREE
    // times below (endpoint set, contraction/CC, the edge log) — pin
    // it for the call instead of re-running the pipeline per consumer
    // (cachedPinned, NOT cached: cached auto-releases after the first
    // consuming query; the finally block unpersists)
    val e = dedup.cachedPinned(pairs.select(
      F.col("id_a").cast(LongType).as("id_a"),
      F.col("id_b").cast(LongType).as("id_b")))
    val newIds = nodes.select(F.col(idCol).cast(LongType).as("id"))
    // current rep of every OLD endpoint: one broadcast semi-join into
    // the map scan + one broadcast hash join with the small remap —
    // the corpus is read, never shuffled
    val ends = e.select(F.explode(F.array(F.col("id_a"), F.col("id_b")))
      .as("id")).distinct()
    val oldRes = cmap.join(F.broadcast(ends), Seq("id"), "left_semi")
      .join(F.broadcast(remap), Seq("rep0"), "left")
      .select(F.col("id"), F.coalesce(F.col("rep"), F.col("rep0")).as("_cm_r"))
    // contract edges to current representatives (new ids stand for
    // themselves); the contracted graph is batch-sized by construction
    val withReps = e
      .join(oldRes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("_cm_r", "_cm_ra"), Seq("id_a"), "left")
      .join(oldRes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("_cm_r", "_cm_rb"), Seq("id_b"), "left")
      .select(F.col("id_a"), F.col("id_b"),
        F.coalesce(F.col("_cm_ra"), F.col("id_a")).as("_cm_ca"),
        F.coalesce(F.col("_cm_rb"), F.col("id_b")).as("_cm_cb"))
    val contracted = withReps
      .select(F.col("_cm_ca").as("id_a"), F.col("_cm_cb").as("id_b"))
      .filter(F.col("id_a") =!= F.col("id_b"))
    val comp = dedup.cached(dedup.connectedComponents(contracted))
    try {
      // edge log: today's edges labeled with their component after
      // today's merges (the contracted endpoint's component; a
      // within-component edge keeps the endpoint's current rep) — see
      // buildComponentMap / removeComponentIds
      withReps
        .join(comp.select(F.col("id").as("_cm_ca"),
          F.col("component").as("_cm_c")), Seq("_cm_ca"), "left")
        .select(F.col("id_a"), F.col("id_b"),
          F.coalesce(F.col("_cm_c"), F.col("_cm_ca")).as("rep0"))
        .write.mode(SaveMode.Append).format("parquet")
        .saveAsTable(s"${name}_cedges")
      // new rows: each batch id's rep0 is its component in the
      // contracted graph (current-rep values ARE global min ids, so the
      // min over a merged set is the true global min — the keep rule
      // stays stable across days)
      newIds
        .join(comp.withColumnRenamed("component", "_cm_c"), Seq("id"), "left")
        .select(F.col("id"), F.coalesce(F.col("_cm_c"), F.col("id")).as("rep0"))
        .write.mode(SaveMode.Append).format("parquet")
        .saveAsTable(s"${name}_cmap")
      // remap rewrite: old reps whose component changed re-point every
      // rep0 that currently resolves to them; existing entries are
      // composed through today's changes so the table stays FLAT
      val changed = comp
        .join(F.broadcast(newIds), Seq("id"), "left_anti") // old reps only
        .filter(F.col("component") =!= F.col("id"))
        .select(F.col("id").as("_cm_from"), F.col("component").as("_cm_to"))
      // accretion days (new docs joining existing families, no
      // cross-component merge) change NO representative — skip the
      // remap rewrite entirely; the emptiness probe is one tiny job
      // over the already-cached contracted components
      if (!changed.isEmpty) {
        val newRemap = remap
          .join(F.broadcast(changed), F.col("rep") === F.col("_cm_from"), "left")
          .select(F.col("rep0"),
            F.coalesce(F.col("_cm_to"), F.col("rep")).as("rep"))
          .unionByName(changed.select(F.col("_cm_from").as("rep0"),
            F.col("_cm_to").as("rep")))
        // the remap table is overwritten while also being read: break
        // the read-write cycle through the stage-write-then-rename swap
        // (distributed — no driver materialization, whatever the merge
        // history's size; one write, not stage-then-copy)
        swapViaRename(spark, s"${name}_cremap") { stage =>
          newRemap.write.mode(SaveMode.Overwrite).format("parquet")
            .saveAsTable(stage)
        }
      }
    } finally {
      comp.unpersist(blocking = false)
      e.unpersist(blocking = false)
      ()
    }
  }

  /** Fold the remap back into the map: rewrite `<name>_cmap` with every
    * rep0 resolved to its current rep and truncate `<name>_cremap`.
    * The remap grows by the day's merged-away representatives per
    * append; run this periodically (one corpus scan + write) to keep
    * the broadcast-joined remap small on long-lived indexes. Read
    * results are identical before and after — compaction only moves
    * where the resolution happens. */
  def compactComponentMap(spark: SparkSession, name: String): Unit = {
    swapViaRename(spark, s"${name}_cmap") { stage =>
      readComponentMap(spark, name)
        .select(F.col("id"), F.col("component").as("rep0"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(stage)
    }
    // the edge log shares the rep0 resolution invariant — fold the
    // remap into it too before truncating
    swapViaRename(spark, s"${name}_cedges") { stage =>
      spark.table(s"${name}_cedges")
        .join(F.broadcast(spark.table(s"${name}_cremap")), Seq("rep0"), "left")
        .select(F.col("id_a"), F.col("id_b"),
          F.coalesce(F.col("rep"), F.col("rep0")).as("rep0"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(stage)
    }
    spark.emptyDataFrame
      .select(F.lit(0L).as("rep0"), F.lit(0L).as("rep")).where(F.lit(false))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${name}_cremap")
  }

  /** TAKEDOWN — remove documents from the component map (the
    * right-to-be-forgotten / legal-removal lifecycle op a long-lived
    * corpus needs): deleted ids lose their rows, and their components
    * are RE-SOLVED from the persisted edge log restricted to surviving
    * members — a deletion can legitimately SPLIT a family (removing
    * the bridge document separates the two halves), which no
    * label-rewrite shortcut can express. The result equals the full
    * recompute over every surviving edge — the x126 oracle.
    *
    * Scale shape: the affected-component set is batch-bounded
    * (≤ one component per deleted id) and broadcasts; the map and the
    * edge log are each SCANNED once with broadcast-filter semi/anti
    * joins (never shuffled); the CC loop runs only over the affected
    * components' surviving edges. Remap entries resolving into an
    * affected component are dropped — their rows get fresh labels. */
  def removeComponentIds(ids: DataFrame, idCol: String,
      name: String): Unit = {
    similarity.requireIntegralId(ids, idCol, "index.removeComponentIds")
    val spark = ids.sparkSession
    val del = ids.select(F.col(idCol).cast(LongType).as("id")).distinct()
    val remap = spark.table(s"${name}_cremap")
    val cmap = spark.table(s"${name}_cmap")
    val cedges = spark.table(s"${name}_cedges")
    def resolve(df: DataFrame): DataFrame = df
      .join(F.broadcast(remap), Seq("rep0"), "left")
      .withColumn("_cm_cur", F.coalesce(F.col("rep"), F.col("rep0")))
      .drop("rep")
    // affected components: current labels of any deleted id's row.
    // MATERIALIZED eagerly (batch-bounded: ≤ one component per deleted
    // id) — every later step filters by it, and some of those steps run
    // AFTER the map table has been rewritten, so a lazy plan over the
    // old table would silently re-read the new one. Materialization is
    // count-gated like connectedComponents' local shortcut: a takedown
    // of ~100M ids would otherwise collect() ~800 MB onto the driver,
    // so above `spark.graft.cmap.localAffectedThreshold` (default 1M
    // labels ≈ 8 MB) the set is pinned DISTRIBUTEDLY (localCheckpoint —
    // eager, severs the lineage from the about-to-be-rewritten table)
    // and only ever consumed as the broadcast side of the filters.
    import spark.implicits._
    val affCap = spark.conf
      .get("spark.graft.cmap.localAffectedThreshold", "1000000").toLong
    val affDistinct = resolve(cmap.join(F.broadcast(del), Seq("id"), "left_semi"))
      .select(F.col("_cm_cur").as("_cm_aff")).distinct()
    val aff =
      if (affDistinct.count() <= affCap)
        affDistinct.collect().map(_.getLong(0)).toSeq.toDF("_cm_aff")
      else affDistinct.localCheckpoint(true)
    val rc = resolve(cmap)
    val keepRows = rc.join(F.broadcast(aff),
        F.col("_cm_cur") === F.col("_cm_aff"), "left_anti")
      .select("id", "rep0")
    val affRows = rc.join(F.broadcast(aff),
        F.col("_cm_cur") === F.col("_cm_aff"), "left_semi")
      .select("id", "rep0")
    val re = resolve(cedges)
    val keepEdges = re.join(F.broadcast(aff),
        F.col("_cm_cur") === F.col("_cm_aff"), "left_anti")
      .select("id_a", "id_b", "rep0")
    val survEdges = re.join(F.broadcast(aff),
        F.col("_cm_cur") === F.col("_cm_aff"), "left_semi")
      .join(F.broadcast(del.withColumnRenamed("id", "id_a")),
        Seq("id_a"), "left_anti")
      .join(F.broadcast(del.withColumnRenamed("id", "id_b")),
        Seq("id_b"), "left_anti")
      .select("id_a", "id_b")
    val comp2 = dedup.cached(dedup.connectedComponents(survEdges))
    try {
      val survivors = affRows
        .join(F.broadcast(del), Seq("id"), "left_anti")
        .join(comp2.withColumnRenamed("component", "_cm_c"), Seq("id"), "left")
        .select(F.col("id"), F.coalesce(F.col("_cm_c"), F.col("id")).as("rep0"))
      swapViaRename(spark, s"${name}_cmap") { stage =>
        keepRows.unionByName(survivors)
          .write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(stage)
      }
      val relabeled = survEdges
        .join(comp2.select(F.col("id").as("id_a"),
          F.col("component").as("_cm_c")), Seq("id_a"), "left")
        .select(F.col("id_a"), F.col("id_b"),
          F.coalesce(F.col("_cm_c"), F.col("id_a")).as("rep0"))
      swapViaRename(spark, s"${name}_cedges") { stage =>
        keepEdges.unionByName(relabeled)
          .write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(stage)
      }
      // remap entries resolving into affected components point at rows
      // that just got fresh labels — drop them; others are untouched
      swapViaRename(spark, s"${name}_cremap") { stage =>
        remap.join(F.broadcast(aff),
            F.col("rep") === F.col("_cm_aff"), "left_anti")
          .write.mode(SaveMode.Overwrite).format("parquet")
          .saveAsTable(stage)
      }
    } finally { comp2.unpersist(blocking = false); () }
  }

  /** The component-map ops `cast(.., LongType)` their id columns — a
    * string/UUID id would cast to NULL and silently corrupt the
    * persisted map instead of failing (the hammingTopK guard, applied
    * to both the node frame and the pair frame's endpoints). */
  private def requireComponentIds(nodes: DataFrame, idCol: String,
      pairs: DataFrame, op: String): Unit = {
    similarity.requireIntegralId(nodes, idCol, op)
    similarity.requireIntegralId(pairs, "id_a", op)
    similarity.requireIntegralId(pairs, "id_b", op)
  }

  /** The current component assignment: `(id, component)` — component =
    * the global min id of the near-dup family (graft's keep rule),
    * exactly what a full [[dedup.connectedComponents]] recompute over
    * every edge ever appended would return. One broadcast join; the map
    * is never shuffled. */
  def readComponentMap(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_cmap")
      .join(F.broadcast(spark.table(s"${name}_cremap")), Seq("rep0"), "left")
      .select(F.col("id"),
        F.coalesce(F.col("rep"), F.col("rep0")).as("component"))

  /** `(n_id, cell, _rc_r = v − centroid(cell))` over a width-clean
    * frame: the residual-encode plumbing shared by build/probe/train —
    * one codegen'd argmax + one graft_vec_sub per row against the
    * broadcast nlist-row centroid frame. `ivfBank` is the flat
    * centroids-++-norms layout; centroid ROWS are sliced back out of it
    * (nlist × dim doubles, driver-sized). */
  private def residualFrame(clean: DataFrame, idCol: String,
      vecCol: String, ivfBank: Array[Double], dim: Int): DataFrame = {
    val spark = clean.sparkSession
    import spark.implicits._
    val nlist = ivfBank.length / (dim + 1)
    val cents = Array.tabulate(nlist)(c =>
      ivfBank.slice(c * dim, (c + 1) * dim))
    val cdf = F.broadcast(cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "_rc_cent"))
    val bankLit = F.typedlit(ivfBank.toSeq)
    clean.select(F.col(idCol).as("n_id"), F.col(vecCol).as("_rc_v"),
        F.element_at(F.call_function("graft_centroid_topk",
          F.col(vecCol), bankLit, F.lit(1)), 1).as("cell"))
      .join(cdf, "cell")
      .select(F.col("n_id"), F.col("cell"),
        F.call_function("graft_vec_sub", F.col("_rc_v"), F.col("_rc_cent"))
          .as("_rc_r"))
  }

  /** `(n_id, codes, cell)` for a width-clean vector frame under the
    * given banks — the encode shared by build, append and retrain: a
    * residual index codes v − centroid(cell) against the residual
    * codebooks, a raw index codes v directly; either way one codegen
    * pass against broadcast-literal banks, no shuffle. */
  private def encodeCells(clean: DataFrame, idCol: String, vecCol: String,
      bank: Array[Double], cb: Array[Double], m: Int, dim: Int,
      residual: Boolean): DataFrame = {
    val cbLit = F.typedlit(cb.toSeq)
    if (residual)
      residualFrame(clean, idCol, vecCol, bank, dim)
        .select(F.col("n_id").cast(LongType).as("n_id"),
          F.call_function("graft_pq_encode", F.col("_rc_r"), cbLit,
            F.lit(m)).as("codes"),
          F.col("cell"))
    else {
      val bankLit = F.typedlit(bank.toSeq)
      clean.select(
        F.col(idCol).cast(LongType).as("n_id"),
        F.call_function("graft_pq_encode", F.col(vecCol), cbLit, F.lit(m))
          .as("codes"),
        F.element_at(F.call_function("graft_centroid_topk",
          F.col(vecCol), bankLit, F.lit(1)), 1).as("cell"))
    }
  }

  private def readPqBank(spark: SparkSession, name: String,
      kind: String): Array[Double] =
    spark.table(s"${name}_pqbank").filter(F.col("kind") === kind)
      .orderBy("pos").select("v").collect().map(_.getDouble(0))

  private def readPqProp(spark: SparkSession, name: String,
      key: String): String = {
    val props = spark.sql(s"SHOW TBLPROPERTIES ${name}_pqcells").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    props.getOrElse(key, throw new IllegalArgumentException(
      s"index: table ${name}_pqcells has no '$key' property — " +
        "not built by buildPqIndex?"))
  }

  private def readPqPropOr(spark: SparkSession, name: String,
      key: String, default: String): String =
    spark.sql(s"SHOW TBLPROPERTIES ${name}_pqcells").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .getOrElse(key, default)

  /** Probe the PQ index: ADC top-k of each query over the stored CODES
    * of its `nprobe` nearest cells — the scan reads only the probed
    * cell directories (same static partition filter as
    * [[probeIvfIndex]]) and only (n_id, codes) columns; the floats of
    * the corpus are never touched, or even stored. Output
    * `(q_id, n_id, adc_dist, rank)`, smallest approximate squared L2
    * first, ties by id. A residual-coded index (see [[buildPqIndex]])
    * is probed with one distance table per (query, probed cell), built
    * from q − centroid(cell) — the flag comes from the index's own
    * properties, so probe and build cannot drift. */
  def probePqIndex(spark: SparkSession, queries: DataFrame,
      idCol: String, vecCol: String, name: String, k: Int,
      nprobe: Int = 8, broadcastQueries: Boolean = true): DataFrame = {
    require(k >= 1 && nprobe >= 1, "index: k and nprobe must be >= 1")
    val ivfBank = readPqBank(spark, name, "ivf")
    val bankLit = F.typedlit(ivfBank.toSeq)
    val cbLit = F.typedlit(readPqBank(spark, name, "cb").toSeq)
    val m = readPqProp(spark, name, "graft.m").toInt
    val storedDim = readPqProp(spark, name, "graft.dim").toInt
    val residual =
      readPqPropOr(spark, name, "graft.residual", "false").toBoolean
    // queries that don't match the index's trained width have no
    // defined distance table — exclude, don't crash (see buildPqIndex)
    val clean = similarity.cleanDim(queries, vecCol, storedDim)
    val q0 =
      if (residual) {
        // residual index: the stored codes quantize v − centroid(cell),
        // so each probed cell gets its OWN table from q − centroid(cell)
        import spark.implicits._
        val nlist = ivfBank.length / (storedDim + 1)
        val cents = Array.tabulate(nlist)(c =>
          ivfBank.slice(c * storedDim, (c + 1) * storedDim))
        val cdf = F.broadcast(cents.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) }.toSeq
          .toDF("cell", "_rc_cent"))
        clean.select(F.col(idCol).cast(LongType).as("q_id"),
            F.col(vecCol).as("_rc_qv"),
            F.explode(F.call_function("graft_centroid_topk",
              F.col(vecCol), bankLit, F.lit(nprobe))).as("cell"))
          .join(cdf, "cell")
          .select(F.col("q_id"), F.col("cell"),
            F.call_function("graft_pq_dists",
              F.call_function("graft_vec_sub",
                F.col("_rc_qv"), F.col("_rc_cent")),
              cbLit, F.lit(m)).as("dt"))
      } else clean.select(F.col(idCol).cast(LongType).as("q_id"),
        F.explode(F.call_function("graft_centroid_topk",
          F.col(vecCol), bankLit, F.lit(nprobe))).as("cell"),
        F.call_function("graft_pq_dists", F.col(vecCol), cbLit, F.lit(m))
          .as("dt"))
    val q = if (broadcastQueries) F.broadcast(q0) else q0
    val c0 = minusPending(spark, name, spark.table(s"${name}_pqcells"), "n_id")
    val c = if (broadcastQueries) {
      val cells = q0.select("cell").distinct().collect().map(_.getInt(0))
      c0.filter(F.col("cell").isin(cells.map(Integer.valueOf).toSeq: _*))
    } else c0
    val scored = c.join(q, "cell")
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (-F.call_function("graft_pq_adc", F.col("codes"), F.col("dt")))
          .as("cos"))
    similarity.twoStageTopK(scored, k)
      .select(F.col("q_id"), F.col("n_id"),
        (-F.col("cos")).as("adc_dist"), F.col("rank"))
  }
}
