package graft.functions

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Deduplication operators for web-scale corpora. Scale design:
  *
  *  - exact dedup = one hash-shuffle groupBy on a fingerprint (never on
  *    the raw text — the shuffle key is 16 bytes, not the document);
  *  - MinHash-LSH = signatures computed expression-side (no shuffle),
  *    then ONE shuffle on (band, bandHash) buckets; candidate pairs are
  *    generated inside buckets only — O(n) + bucket-local joins instead
  *    of the O(n²) all-pairs cross join;
  *  - SimHash = 64-bit signature per doc, Hamming-distance candidates
  *    inside cheap blocking buckets;
  *  - n-gram Jaccard = exact verification measure, run only on candidate
  *    pairs (or small blocking buckets), never all-pairs at scale.
  */
object dedup {

  /** Signature frames persisted by the pairs functions (signatures are
    * referenced by BOTH sides of the candidate self-join, and exchange
    * reuse cannot kick in: higher-order-function lambdas defeat plan
    * canonicalization, so without a cache Spark computes the expensive
    * signature expressions once per join side). Lifecycle is automatic:
    * a [[org.apache.spark.sql.util.QueryExecutionListener]] unpersists a
    * frame as soon as the first query CONSUMING it completes — executor
    * storage never outlives the candidate query, and a library user
    * looping these generators cannot accumulate pinned blocks. (A later
    * re-materialization of the same result recomputes the signatures,
    * cached again for the duration of that query — correct, just not
    * cross-query cached.) [[unpersistAll]] remains as the manual valve. */
  /** (cached frame, release trigger): the cached frame is unpersisted
    * when a query consuming the TRIGGER's plan completes. For [[cached]]
    * the trigger is the frame itself (release on first consumption); for
    * [[releaseWhenConsumed]] it is a downstream result, so intermediate
    * stages (e.g. a composite's eager component-resolution jobs) can
    * read the cache without releasing it. */
  private val persistedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[(DataFrame, DataFrame)]()
  private val hookedSessions =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()

  private[graft] def cached(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persistedFrames.add((p, p))
    autoRelease(df.sparkSession)
    p
  }

  /** Persist `df` WITHOUT auto-release tracking; pair with
    * [[releaseWhenConsumed]] once the downstream result frame exists. */
  private[graft] def cachedPinned(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Arm auto-release for a [[cachedPinned]] frame: unpersist `cachedDf`
    * as soon as a query consuming `trigger`'s plan completes (the
    * trigger being the final output derived from the cache, any earlier
    * query that merely READS the cache — e.g. the eager connected-
    * components loop inside a composite — leaves it in place). */
  private[functions] def releaseWhenConsumed(cachedDf: DataFrame,
      trigger: DataFrame): Unit = {
    persistedFrames.add((cachedDf, trigger))
    autoRelease(cachedDf.sparkSession)
  }

  /** Register (once per session) the release hook: after any query
    * execution finishes, every tracked frame whose analyzed plan occurs
    * inside the finished query's plan is unpersisted. Matching uses
    * Catalyst's canonicalized `sameResult`, the same test CacheManager
    * applies, so the frame is released exactly when a query that could
    * have hit its cache has run. */
  private def autoRelease(spark: org.apache.spark.sql.SparkSession): Unit =
    if (hookedSessions.add(spark))
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        private def release(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
          if (!persistedFrames.isEmpty) {
            val it = persistedFrames.iterator()
            while (it.hasNext) {
              val (p, trigger) = it.next()
              val used = try {
                val pa = trigger.queryExecution.analyzed
                qe.analyzed.find(_.sameResult(pa)).isDefined
              } catch { case scala.util.control.NonFatal(_) => false }
              if (used) { p.unpersist(blocking = false); it.remove() }
            }
          }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          release(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
          release(qe)
      })

  /** Release every signature frame persisted by the pairs functions. */
  def unpersistAll(): Unit = {
    var d = persistedFrames.poll()
    while (d != null) { d._1.unpersist(blocking = false); d = persistedFrames.poll() }
  }

  /** Salt-split oversized LSH buckets (the hot-bucket cap): a bucket
    * with m > `cap` rows is deterministically hash-split into
    * nSub = ⌈m/cap⌉ sub-buckets (salt = xxhash64(id) mod nSub, ~cap rows
    * each whp), and the min-id row of every sub-bucket is RE-EMITTED
    * into the NEXT sub-bucket ((salt+1) mod nSub) so the sub-buckets
    * form one connected ring for connected-component dedup. Per-task
    * pair generation is bounded by ~(cap+1)²/2 for EVERY task — ring
    * chaining has no shared representatives bucket, so the bound holds
    * at any skew (a 10M-row bucket at cap=1000 yields 10k sub-buckets
    * of ~1000, not a 10k-row rep bucket), and the oversized bucket's
    * candidate output degrades gracefully from quadratic (m²/2) to
    * linear (~m·cap/2) — the production posture for boilerplate-heavy
    * web corpora. Plan shape: bucket sizes come from a partial-agg
    * groupBy whose >cap survivors are BROADCAST back (the big side is
    * never shuffled to discover overflow), and the min-id window for
    * representatives runs only over overflow rows in ≤ ~cap-row groups.
    * Buckets at or under `cap` are untouched (salt 0, no
    * representatives), so results on non-skewed data are identical to
    * the uncapped plan; with a cap, candidate generation inside an
    * oversized bucket is intentionally NOT all-pairs any more (each row
    * still pairs with ~cap neighbours and every sub-group stays linked
    * via the ring). cap = 0 disables capping. */
  private[graft] def saltOversized(df: DataFrame, bucketCols: Seq[String],
      cap: Int): DataFrame = {
    if (cap <= 0) df.withColumn("salt", F.lit(0))
    else {
      val counts = df.groupBy(bucketCols.map(F.col): _*)
        .agg(F.count(F.lit(1)).as("_m"))
        .filter(F.col("_m") > cap)
      val nSub = F.ceil(F.col("_m").cast(DoubleType) / cap).cast(IntegerType)
      val salted = df.join(F.broadcast(counts), bucketCols, "left")
        .withColumn("salt",
          F.when(F.col("_m").isNull, F.lit(0))
            .otherwise(F.pmod(F.xxhash64(F.col("id")), nSub).cast(IntegerType)))
      val part = Window.partitionBy((bucketCols :+ "salt").map(F.col): _*)
      val reps = salted.filter(F.col("_m").isNotNull)
        .withColumn("_min", F.min(F.col("id")).over(part))
        .filter(F.col("id") === F.col("_min"))
        .withColumn("salt", (F.col("salt") + 1) % nSub)
        .drop("_min")
      salted.unionByName(reps).drop("_m")
    }
  }

  /** C4-style line-level dedup: keep only the FIRST corpus-wide
    * occurrence of every distinct line (first = smallest (doc id, line
    * position)), drop repeats, and reassemble each document from its
    * surviving lines in original order. Documents whose every line was
    * seen earlier disappear (C4 drops emptied docs).
    *
    * Scale shape: one map-side explode; the keeper per line comes from
    * a `min(struct(id, pos))` groupBy — partial aggregation combines
    * map-side, so a boilerplate line repeated in billions of documents
    * reduces to one row per input partition BEFORE the shuffle (a
    * `row_number` window keyed on the line would funnel that hot line
    * into a single task instead). Occurrences then rejoin the keeper set
    * on (line, id, pos) — a unique key, so that shuffle cannot skew.
    * Reassembly is a bounded per-document sort (`sort_array` over one
    * doc's lines). The shuffle key is the line FINGERPRINT (16-byte
    * md5), never the line text. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df
      .select(F.col(idCol), F.posexplode(F.split(F.col(textCol), "\n"))
        .as(Seq("_dl_pos", "_dl_line")))
      .withColumn("_dl_fp", F.md5(F.col("_dl_line")))
    val keepers = lines
      .groupBy("_dl_fp")
      .agg(F.min(F.struct(F.col(idCol), F.col("_dl_pos"))).as("_dl_keep"))
      .select(F.col("_dl_fp"), F.col(s"_dl_keep.$idCol").as(idCol),
        F.col("_dl_keep._dl_pos").as("_dl_pos"))
    lines.join(keepers, Seq("_dl_fp", idCol, "_dl_pos"))
      .groupBy(idCol)
      .agg(
        F.count(F.lit(1)).as("n_lines"),
        F.array_join(
          F.transform(
            F.sort_array(F.collect_list(
              F.struct(F.col("_dl_pos"), F.col("_dl_line")))),
            s => s.getField("_dl_line")),
          "\n").as(textCol))
      .select(F.col(idCol), F.col(textCol), F.col("n_lines"))
  }

  /** Exact dedup: group by md5 fingerprint, keep the smallest id.
    * The groupBy shuffles only (fingerprint, id) — scales to any corpus.
    * `canonicalize` fingerprints [[text.foldedText]] instead of the raw
    * bytes (NFC, accents stripped, lower-cased, whitespace collapsed),
    * so the same document re-crawled with different composition, casing
    * or spacing still collapses — byte-exact dedup misses most
    * cross-site boilerplate. Costs one extra codegen'd pass per row
    * (~free on ASCII — see [[graft.plans.UnicodeNormalizeExpr]]). */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String,
      canonicalize: Boolean = false): DataFrame = {
    val key = if (canonicalize) text.foldedText(F.col(textCol)) else F.col(textCol)
    df.select(text.fingerprintMd5(key).as("fingerprint"), F.col(idCol))
      .groupBy("fingerprint")
      .agg(F.min(idCol).as("keep_id"), F.count(F.lit(1)).as("n_copies"))
  }

  /** k-word shingles of a document, in order with duplicates — computed
    * by the codegen'd [[graft.plans.ShingleStringsExpr]] (one tokenize
    * pass per row). */
  def shingleStrings(c: Column, k: Int): Column =
    F.call_function("graft_shingles", c, F.lit(k))

  /** Built-ins-only shingles with identical semantics (interpreted — the
    * lambda re-evaluates the token split per element; used to cross-check
    * the native expression and wherever k is not a literal). */
  def shingles(c: Column, k: Int): Column = {
    val toks = text.tokens(c)
    val n = F.size(toks)
    F.when(n < k, F.array(F.concat_ws(" ", toks)))
      .otherwise(F.transform(F.sequence(F.lit(0), n - k),
        i => F.concat_ws(" ", F.slice(toks, i + 1, F.lit(k)))))
  }

  /** hashed distinct shingle set, sorted — the canonical per-document
    * representation: set sizes (hence Jaccard) are unchanged absent
    * 64-bit collisions (~1e-15 for 1k-shingle docs), and sorted arrays
    * let the per-pair intersection be a codegen'd linear merge. Computed
    * by the compiled [[graft.plans.ShingleHashesExpr]] — the built-ins
    * pipeline it replaces ran as an interpreted Project re-evaluating
    * the tokenizing split per lambda and dominated every LSH query. */
  def shingleHashes(c: Column, k: Int): Column =
    F.call_function("graft_shingle_hashes", c, F.lit(k))

  /** Built-ins-only shingle hashing with identical semantics (used to
    * cross-check the native expression). */
  def shingleHashesPortable(c: Column, k: Int): Column =
    F.array_sort(F.array_distinct(F.transform(shingles(c, k), s => F.xxhash64(s))))

  /** MinHash signature from a pre-hashed shingle array: `numPerm`
    * permutations approximated by seeded integer re-hashes, computed by
    * the codegen'd [[graft.plans.MinHashFromHashes]] — one tight
    * numPerm × shingles loop per row with precomputed per-permutation
    * seeds. Shuffle-free; one expression, so Catalyst's
    * project-collapsing cannot duplicate the work. */
  def minhashFromHashes(hashes: Column, numPerm: Int): Column =
    F.call_function("graft_minhash", hashes, F.lit(numPerm))

  /** Built-ins-only MinHash with identical semantics (interpreted
    * aggregate/zip_with fold; used to cross-check the native
    * expression). */
  def minhashFromHashesPortable(hashes: Column, numPerm: Int): Column =
    F.aggregate(
      hashes,
      F.array_repeat(F.lit(Long.MaxValue), numPerm),
      (acc, h) => F.zip_with(acc,
        F.array((0 until numPerm).map(i => F.xxhash64(F.lit(i), h)): _*),
        (a, b) => F.least(a, b)))

  /** MinHash signature of a document's k-word shingle set. */
  def minhashSignature(c: Column, k: Int, numPerm: Int): Column =
    minhashFromHashes(shingleHashes(c, k), numPerm)

  /** Sorted distinct 60-bit md5-prefix shingle fingerprints — the
    * cross-engine REPLAYABLE shingle representation (same fingerprint
    * definition as [[text.fingerprint64]]; computed by the codegen'd
    * [[graft.plans.ShingleFp64Expr]]). Any engine with md5 reproduces
    * these bit-for-bit. */
  def shingleFp64(c: Column, k: Int): Column =
    F.call_function("graft_shingle_fp64", c, F.lit(k))

  /** REPLAYABLE MinHash signature: Carter-Wegman permutation hashes
    * ((a_i·h + b_i) mod 2^61−1, md5-derived constants — see
    * [[graft.plans.MinHashPortableExpr]]) over [[shingleFp64]]
    * fingerprints. Exactly reproducible in any engine with md5 and
    * 128-bit integer arithmetic (DuckDB: HUGEINT), which is what puts
    * MinHash-LSH dedup under a cross-engine oracle; the xxhash64
    * default is faster but engine-native. */
  def minhashReplayable(hashes: Column, numPerm: Int): Column =
    F.call_function("graft_minhash_portable", hashes, F.lit(numPerm))

  /** REPLAYABLE SimHash: the same bit-vote packing as [[simhash64]] but
    * over [[shingleFp64]] token fingerprints (k = 1) instead of
    * xxhash64 token hashes. Fingerprints are 60-bit, so bits 60..63 of
    * the signature are always 0 — Hamming distances live in the low 60
    * bits, identically in every engine with md5. */
  def simhash64Replayable(c: Column): Column =
    F.call_function("graft_simhash64", shingleFp64(c, 1))

  /** LSH band keys over a MinHash signature: `bands` hashes of
    * signature slices of `rowsPerBand`. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    F.array((0 until bands).map(b =>
      F.xxhash64(F.lit(b) +: (0 until rowsPerBand)
        .map(r => F.element_at(sig, b * rowsPerBand + r + 1)): _*)): _*)

  /** MinHash-LSH near-duplicate candidate pairs with estimated Jaccard
    * ≥ `threshold`. One shuffle on band buckets; pairs generated
    * bucket-locally; signatures ride along with the explode.
    * `maxBucket` > 0 salt-splits oversized band buckets (see
    * [[saltOversized]]) to bound per-task pair generation on
    * boilerplate-heavy corpora. `replayable` switches the signature to
    * the md5-based [[minhashReplayable]] family so the whole query can
    * be replayed by another engine (slower per row; results differ from
    * the xxhash64 default only in WHICH near-miss estimates clear the
    * threshold — both are valid MinHash estimators). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numPerm: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucket: Int = 0,
      replayable: Boolean = false): DataFrame = {
    val rowsPerBand = numPerm / bands
    // signatures persisted (tracked — see unpersistAll): both sides of
    // the candidate self-join read them, and at full scale this is the
    // signature table a real pipeline would checkpoint anyway
    val sigExpr =
      if (replayable) minhashReplayable(shingleFp64(F.col(textCol), k), numPerm)
      else minhashSignature(F.col(textCol), k, numPerm)
    // under-split inputs serialize the signature pass — fan out first
    val sigs = cached(skew.rebalanceUnderSplit(df)
      .select(F.col(idCol).as("id"), sigExpr.as("sig")))
    // signatures ride along through the explode: no join-back needed
    val buckets = saltOversized(sigs
      .select(F.col("id"), F.col("sig"),
        F.posexplode(lshBandKeys(F.col("sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_hash"))),
      Seq("band_idx", "band_hash"), maxBucket)
    val est = F.aggregate(F.zip_with(F.col("a.sig"), F.col("b.sig"),
        (x, y) => F.when(x === y, 1).otherwise(0)),
      F.lit(0), (acc, v) => acc + v).cast(DoubleType) / F.lit(numPerm.toDouble)
    buckets.as("a").join(buckets.as("b"),
        F.col("a.band_idx") === F.col("b.band_idx") &&
        F.col("a.band_hash") === F.col("b.band_hash") &&
        F.col("a.salt") === F.col("b.salt") &&
        F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        est.as("est_jaccard"))
      .filter(F.col("est_jaccard") >= threshold)
      .distinct() // a pair can match in several bands; est is identical
  }

  /** 64-bit SimHash over the token set: per-token xxhash64 bit votes,
    * sign-packed by the codegen'd [[graft.plans.SimHash64FromHashes]]
    * expression over the compiled token-hash set (k=1 shingles; the
    * vote is order-independent, so the sorted set is equivalent to the
    * first-occurrence order the interpreted pipeline produced). One
    * array pass per row, shuffle-free. */
  def simhash64(c: Column): Column =
    F.call_function("graft_simhash64", shingleHashes(c, 1))

  /** Built-ins-only SimHash with identical semantics (slower; used to
    * cross-check the native expression). */
  def simhash64Portable(c: Column): Column = {
    val hashes = F.transform(F.array_distinct(text.tokens(c)), t => F.xxhash64(t))
    val bitArrays = F.transform(hashes, h =>
      F.array((0 until 64).map(j =>
        (F.shiftright(h, j).bitwiseAND(F.lit(1L)) * 2 - 1).cast(IntegerType)): _*))
    val votes = F.aggregate(bitArrays,
      F.array_repeat(F.lit(0), 64),
      (acc, bits) => F.zip_with(acc, bits, (a, b) => a + b))
    (0 until 64).map(j =>
      F.when(F.element_at(votes, j + 1) > 0, F.shiftleft(F.lit(1L), j)).otherwise(F.lit(0L)))
      .reduce(_ bitwiseOR _)
  }

  /** SimHash near-duplicate pairs via exact multi-index blocking. Two
    * index shapes, both EXACT (result ≡ the all-pairs Hamming scan):
    *
    *  - `pairBlocking = true` (default): the signature is split into
    *    `maxDist + 2` bit chunks and rows are indexed under every chunk
    *    PAIR — C(maxDist+2, 2) indexes whose keys concatenate two
    *    chunks. Pigeonhole: ≤ maxDist flipped bits dirty at most
    *    maxDist chunks, so ≥ 2 chunks are clean and the pair of those
    *    two agrees. Key cardinality is the SQUARE of the single-chunk
    *    index (~2^16 vs ~2^9 at maxDist = 6), so block occupancy stays
    *    sub-quadratic even at multi-billion-document corpus sizes —
    *    the beyond-100 TB shape, at the cost of C(8,2) = 28 index
    *    entries per row instead of 7.
    *  - `pairBlocking = false`: the classic `maxDist + 1`-chunk single
    *    index (any close pair agrees on ≥ 1 chunk). Fewer index
    *    entries, much smaller key space — fine when the corpus is
    *    small relative to 2^(64/(maxDist+1)).
    *
    * One shuffle on the block buckets plus bucket-local pairing either
    * way. `maxBucket` > 0 salt-splits oversized buckets (see
    * [[saltOversized]]); with a cap the guarantee weakens from exact to
    * "every row is compared against ~cap block neighbours, sub-buckets
    * linked in a ring" inside the (boilerplate) buckets that
    * overflow. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, maxBucket: Int = 0,
      pairBlocking: Boolean = true,
      replayable: Boolean = false): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      "simhashPairs: maxDist must be in [0, 64)")
    // pair blocking needs ≥ 2 clean chunks → maxDist + 2 ≤ 64
    val usePairs = pairBlocking && maxDist <= 62
    val nChunks = if (usePairs) maxDist + 2 else maxDist + 1
    val widths = {
      val base = 64 / nChunks; val rem = 64 % nChunks
      (0 until nChunks).map(i => if (i < rem) base + 1 else base)
    }
    val offsets = widths.scanLeft(0)(_ + _)
    // replayable = md5-fingerprint token hashes (cross-engine oracle-
    // able; see simhash64Replayable) instead of the xxhash64 default
    val sigs = cached(df.select(F.col(idCol).as("id"),
      (if (replayable) simhash64Replayable(F.col(textCol))
       else simhash64(F.col(textCol))).as("sim")))
    def chunk(i: Int): Column = {
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      F.shiftrightunsigned(F.col("sim"), offsets(i)).bitwiseAND(F.lit(mask))
    }
    val chunkVals =
      if (usePairs)
        // block key bijectively concatenates the two chunk values
        // (w_i + w_j ≤ 64 bits); posexplode position = pair index
        F.array((for { i <- 0 until nChunks; j <- (i + 1) until nChunks }
          yield F.shiftleft(chunk(i), widths(j)).bitwiseOR(chunk(j))): _*)
      else
        F.array((0 until nChunks).map(chunk): _*)
    val blocks = saltOversized(
      sigs.select(F.col("id"), F.col("sim"),
        F.posexplode(chunkVals).as(Seq("chunk_idx", "chunk_val"))),
      Seq("chunk_idx", "chunk_val"), maxBucket)
    blocks.as("a").join(blocks.as("b"),
        F.col("a.chunk_idx") === F.col("b.chunk_idx") &&
        F.col("a.chunk_val") === F.col("b.chunk_val") &&
        F.col("a.salt") === F.col("b.salt") &&
        F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).as("hamming"))
      .filter(F.col("hamming") <= maxDist)
      .distinct() // a pair may agree on several chunks
  }

  /** All-pairs SimHash Hamming scan inside caller-supplied blocking
    * buckets — the quadratic verification stage; use [[simhashPairs]]'s
    * multi-index blocking at scale. */
  def simhashPairsWithin(df: DataFrame, idCol: String, textCol: String,
      bucketCol: String, maxDist: Int): DataFrame = {
    val sigs = df.select(F.col(idCol).as("id"), F.col(bucketCol).as("bucket"),
      simhash64(F.col(textCol)).as("sim"))
    sigs.as("a").join(sigs.as("b"),
        F.col("a.bucket") === F.col("b.bucket") && F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).as("hamming"))
      .filter(F.col("hamming") <= maxDist)
  }

  /** Cross-corpus exact duplicates — the incremental-crawl shape: for
    * every document of `dfNew` whose fingerprint already occurs in
    * `dfRef`, emit `(new_id, ref_id)` with ref_id the smallest matching
    * id. Shuffles only (fingerprint, id) on both sides. */
  def exactDuplicatesCross(dfNew: DataFrame, dfRef: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val n = dfNew.select(F.col(idCol).as("new_id"),
      text.fingerprintMd5(F.col(textCol)).as("fp"))
    val r = dfRef.select(text.fingerprintMd5(F.col(textCol)).as("fp"),
        F.col(idCol).as("rid"))
      .groupBy("fp").agg(F.min("rid").as("ref_id"))
    n.join(r, "fp").select("new_id", "ref_id")
  }

  /** Grid-salt one LSH bucket stream for a CROSS join: ref rows land in
    * one of R = ⌈m_ref/cap⌉ row-groups and are replicated across all
    * S = ⌈m_new/cap⌉ column-groups (and vice versa for new rows), so
    * every (new, ref) pair meets in exactly one (bucket, r, s) cell of
    * ~cap × cap rows — per-task pair generation is bounded at ANY skew
    * and NO pair is lost (unlike the self-join ring cap, completeness
    * here is free: total work is still m_ref × m_new, only bounded per
    * task). Bucket sizes come from partial-agg counts of BOTH sides,
    * broadcast back; buckets at or under `cap` on both sides pay
    * nothing. */
  private def gridSalt(side: DataFrame, own: DataFrame, other: DataFrame,
      bucketCols: Seq[String], cap: Int): DataFrame = {
    if (cap <= 0)
      side.withColumn("salt_own", F.lit(0)).withColumn("salt_rep", F.lit(0))
    else {
      def counts(df: DataFrame, name: String) =
        df.groupBy(bucketCols.map(F.col): _*)
          .agg(F.count(F.lit(1)).as(name)).filter(F.col(name) > cap)
      val joined = side
        .join(F.broadcast(counts(own, "_mo")), bucketCols, "left")
        .join(F.broadcast(counts(other, "_mt")), bucketCols, "left")
      val nOwn = F.ceil(F.coalesce(F.col("_mo"), F.lit(0L))
        .cast(DoubleType) / cap).cast(IntegerType)
      val nRep = F.ceil(F.coalesce(F.col("_mt"), F.lit(0L))
        .cast(DoubleType) / cap).cast(IntegerType)
      joined
        .withColumn("salt_own", F.when(F.col("_mo").isNull, F.lit(0))
          .otherwise(F.pmod(F.xxhash64(F.col("id")), nOwn).cast(IntegerType)))
        .withColumn("salt_rep", F.explode(
          F.sequence(F.lit(0), F.greatest(nRep - 1, F.lit(0)))))
        .drop("_mo", "_mt")
    }
  }

  /** Cross-corpus MinHash-LSH near-dedup with exact Jaccard verification:
    * which documents of `dfNew` near-duplicate the existing corpus
    * `dfRef` (J ≥ `minJ` on k-shingles) — the job every incremental
    * crawl runs before admitting new documents. Same candidate scheme as
    * [[jaccardPairsLsh]] (any band-bucket collision; no estimate
    * pre-filter, the exact measure decides) but the band join pairs the
    * two corpora instead of self-joining one. `maxBucket` > 0 bounds
    * per-task pair generation in hot buckets via [[gridSalt]] — unlike
    * the self-join ring cap this loses NO pairs. Candidate generation
    * shuffles only (id, band_hash); shingle sets travel once, through
    * the verification joins. */
  def jaccardPairsLshCross(dfNew: DataFrame, dfRef: DataFrame,
      idCol: String, textCol: String,
      k: Int = 3, numPerm: Int = 64, bands: Int = 32,
      minJ: Double = 0.8, maxBucket: Int = 0): DataFrame = {
    val rowsPerBand = numPerm / bands
    def prep(df: DataFrame) = cached(df.select(F.col(idCol).as("id"),
        shingleHashes(F.col(textCol), k).as("sh"))
      .withColumn("n", F.size(F.col("sh")).cast(DoubleType)))
    def bucketsOf(sh: DataFrame) = sh
      .select(F.col("id"), minhashFromHashes(F.col("sh"), numPerm).as("sig"))
      .select(F.col("id"),
        F.posexplode(lshBandKeys(F.col("sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_hash")))
    val shN = prep(dfNew); val shR = prep(dfRef)
    val bN = bucketsOf(shN); val bR = bucketsOf(shR)
    val keys = Seq("band_idx", "band_hash")
    val sN = gridSalt(bN, bN, bR, keys, maxBucket)
    val sR = gridSalt(bR, bR, bN, keys, maxBucket)
    val cand = sN.as("a").join(sR.as("b"),
        F.col("a.band_idx") === F.col("b.band_idx") &&
        F.col("a.band_hash") === F.col("b.band_hash") &&
        // new row's own group pairs with the ref replica addressed to it
        F.col("a.salt_own") === F.col("b.salt_rep") &&
        F.col("a.salt_rep") === F.col("b.salt_own"))
      .select(F.col("a.id").as("new_id"), F.col("b.id").as("ref_id"))
      .distinct()
    val inter = F.call_function("graft_intersect_count",
      F.col("a.sh"), F.col("b.sh")).cast(DoubleType)
    cand.join(shN.as("a"), F.col("new_id") === F.col("a.id"))
      .join(shR.as("b"), F.col("ref_id") === F.col("b.id"))
      // length filter before the O(|A|+|B|) merge: J ≤ min/max, so
      // J ≥ minJ forces min(n) ≥ minJ·max(n); 0.5 slack is ulp-safe on
      // integral sizes. One hand-built And, cheap guard LEFT so the
      // short-circuit skips the merge (see probeJaccardIndex).
      .filter((F.least(F.col("a.n"), F.col("b.n")) >=
          F.lit(minJ) * F.greatest(F.col("a.n"), F.col("b.n")) - F.lit(0.5)) &&
        (inter / (F.col("a.n") + F.col("b.n") - inter)) >= minJ)
      .select(F.col("new_id"), F.col("ref_id"),
        (inter / (F.col("a.n") + F.col("b.n") - inter)).as("jaccard"))
  }

  /** Connected components of the undirected pair graph produced by the
    * candidate generators — the pairs → duplicate-groups resolution step
    * every real dedup pipeline runs after pair generation (keep one
    * canonical document per component, drop the rest). Returns one row
    * per distinct node id in `pairs`: `(id, component)` with `component`
    * = the smallest node id reachable from `id` (the canonical
    * representative). Nodes with no pair never appear — they are their
    * own component by definition.
    *
    * Algorithm: alternating large-star / small-star contraction (the
    * MapReduce-native CC of Kiveris et al., "Connected Components in
    * MapReduce and Beyond") — large-star points every node's larger
    * neighbors at its neighborhood minimum, small-star flattens the
    * smaller neighbors, and the fixed point is a star forest rooted at
    * each component's minimum. Scale shape: each half-step is ONE
    * groupBy-min over the current edge set plus a hash join back — no
    * windows, no driver-side data, and the driver loop runs O(log n)
    * iterations (each round at least halves path lengths), so even the
    * ring-chained sub-buckets [[saltOversized]] emits for a hot bucket
    * (a path of length m/cap) resolve in ~log₂(m/cap) rounds, not
    * m/cap. Per round the edge frame is re-rooted on its materialized
    * RDD (`createDataFrame(rdd, schema)`) so the Catalyst plan stays
    * constant-size across iterations; the previous round's cache is
    * released as soon as the next is materialized, and the final frame
    * is tracked by the same auto-release listener the signature caches
    * use — executor storage does not outlive the consuming query.
    * Convergence is detected by an (edge-count, xxhash64-sum) checksum
    * — the same aggregate job that materializes the round's cache.
    *
    * Driver-local shortcut: the first settle job already counts the
    * deduplicated edge set; when it is at most the local-edge threshold
    * rows of Long ids, ONE collect + an in-memory union-find replaces
    * the whole O(log n) round loop — the result is identical (component
    * = min reachable id) and the per-round fixed job cost disappears.
    * The threshold is cluster-tunable: `localEdgeThreshold < 0` (the
    * default) reads `spark.graft.cc.localEdgeThreshold` from the
    * session conf (default 1,000,000 edges), so every caller
    * (semanticDedup, keepCanonical, keepBest) follows one knob without
    * plumbing a parameter; an explicit non-negative argument overrides
    * the conf, and 0 forces the distributed loop. DRIVER MEMORY: the
    * collected rows, parent map and result rows are transient driver
    * allocation of roughly 100–150 bytes per edge — ≈150 MB at the 1M
    * default, so size the threshold to the driver heap (a default 1g
    * driver should stay ≤1M; raise the conf only alongside
    * `spark.driver.memory`). Pair generators upstream are capped
    * (saltOversized), but a 100 TB corpus still yields far more
    * candidate pairs than any sane threshold — those runs take the
    * distributed loop, which remains the scale path. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 64,
      localEdgeThreshold: Long = -1L): DataFrame = {
    val spark = pairs.sparkSession
    val localEdgeCap: Long =
      if (localEdgeThreshold >= 0L) localEdgeThreshold
      else spark.conf.get("spark.graft.cc.localEdgeThreshold", "1000000").toLong
    import org.apache.spark.storage.StorageLevel
    // orient (large, small), drop self-loops and duplicates
    def canon(e: DataFrame): DataFrame = e
      .filter(F.col("u") =!= F.col("v"))
      .select(F.greatest(F.col("u"), F.col("v")).as("u"),
        F.least(F.col("u"), F.col("v")).as("v"))
      .distinct()
    // large-star: for every node n, point each LARGER neighbor at the
    // minimum of n's closed neighborhood (emits (larger, min), still
    // oriented large→small since min ≤ n < larger)
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(F.col("v").as("u"), F.col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).as("m"))
      canon(sym.join(mins, "u").filter(F.col("v") > F.col("u"))
        .select(F.col("v").as("u"), F.col("m").as("v")))
    }
    // small-star: for every node n, re-point n and all its SMALLER
    // neighbors at the minimum among them
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(F.min("v").as("m"))
      val joined = e.join(mins, "u")
      canon(joined.select(F.col("v").as("u"), F.col("m").as("v"))
        .unionByName(mins.select(F.col("u"), F.col("m").as("v"))))
    }
    // materialize + checksum in ONE job; re-root the plan on the cached
    // RDD so per-iteration Catalyst analysis stays O(1)
    def settle(e: DataFrame): (DataFrame, (Long, Long)) = {
      val p = spark.createDataFrame(e.rdd, e.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val r = p.agg(F.count(F.lit(1)),
        F.coalesce(F.sum(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0L))).head()
      (p, (r.getLong(0), r.getLong(1)))
    }
    var (edges, sum) = settle(canon(
      pairs.select(F.col(aCol).as("u"), F.col(bCol).as("v"))))
    // Long-typed ids only: the shortcut's output schema must equal the
    // distributed path's (every graft generator emits Long ids)
    if (sum._1 > 0L && sum._1 <= localEdgeCap &&
        edges.schema.fields.forall(_.dataType == LongType)) {
      val collected = edges.collect()
      edges.unpersist(blocking = false)
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      collected.foreach { row =>
        val u = row.getLong(0); val v = row.getLong(1)
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val ru = find(u); val rv = find(v)
        if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
      }
      // ship the result as a parallelized RDD: keepCanonical/keepBest
      // JOIN this frame, and a node-count LocalRelation embedded in
      // their plans would ride along with every task binary
      val out = new Array[org.apache.spark.sql.Row](parent.size)
      var idx = 0
      val it = parent.keysIterator
      while (it.hasNext) {
        val node = it.next()
        out(idx) = org.apache.spark.sql.Row(node, find(node))
        idx += 1
      }
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("component", LongType, nullable = false)))
      return spark.createDataFrame(spark.sparkContext.parallelize(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)), schema)
    }
    var it = 0
    var done = sum._1 == 0L
    while (!done && it < maxIter) {
      val (next, nextSum) = settle(smallStar(largeStar(edges)))
      edges.unpersist(blocking = false)
      done = nextSum == sum
      edges = next; sum = nextSum; it += 1
    }
    require(done, s"connectedComponents did not converge in $maxIter iterations")
    // fixed point is a star forest: every non-root points at its root
    persistedFrames.add((edges, edges)); autoRelease(spark)
    edges.select(F.col("u").as("id"), F.col("v").as("component"))
      .unionByName(edges.select(F.col("v").as("id"), F.col("v").as("component")))
      .distinct()
  }

  /** Drop every non-canonical member of each duplicate component: keeps
    * the smallest id per connected component of `pairs` (plus every row
    * with no pair at all). The principled keep-rule — transitive, order-
    * independent, stable under pair discovery order — unlike dropping
    * `id_b` of each pair, which over-drops when A~B, B~C but A≁C
    * (dropping C strands evidence linking it only through B). */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(F.col("id") =!= F.col("component"))
      .select(F.col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep the BEST member of each duplicate component instead of the
    * smallest id: the survivor maximizes `score` (ties broken by the
    * smaller id), so a re-crawl dedup keeps the longest or
    * highest-quality copy rather than whichever copy happened to be
    * crawled first. Same transitive component resolution as
    * [[keepCanonical]] (A~B~C collapses to ONE survivor even when A≁C);
    * `score` must be numeric and deterministic.
    *
    * Scale shape: only rows that appear in `pairs` ever carry their
    * score through a shuffle — the winner per component is a map-side-
    * combining `min(struct(-score, id))` aggregate over the component
    * members (duplicate-set sized, not corpus sized), and the no-dup
    * bulk of the corpus is touched once by the final left_anti on ids. */
  def keepBest(df: DataFrame, idCol: String, pairs: DataFrame,
      score: Column, aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    val members = df.select(F.col(idCol).as("_kb_id"), score.as("_kb_s"))
      .join(comp, F.col("_kb_id") === F.col("id"))
    val winners = members.groupBy("component")
      .agg(F.min(F.struct((-F.col("_kb_s")).as("_kb_ns"),
        F.col("_kb_id"))).as("_kb_w"))
      .select(F.col("_kb_w._kb_id").as("_kb_keep"))
    val losers = members.select(F.col("_kb_id").as(idCol))
      .join(winners, F.col(idCol) === F.col("_kb_keep"), "left_anti")
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep the best row per exact KEY, no pair graph: for every value of
    * `keyCol` the row maximizing `score` survives (ties → smaller id) —
    * the canonical-URL rule "one page per normalized URL, keep the
    * fullest copy", or one doc per (source, partition-date), etc.
    * NULL keys form their own group (SQL GROUP BY style); NULL scores
    * lose to any non-null score.
    *
    * Scale shape: one map-side-combining `min(struct(-score, id))`
    * groupBy on the key — a hot key collapses per input partition
    * BEFORE the shuffle — then a semi-join on the UNIQUE id, which
    * cannot skew. The full rows never move. */
  def keepBestByKey(df: DataFrame, idCol: String, keyCol: String,
      score: Column): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val winners = df
      .select(F.col(keyCol).as("_kk_k"), F.col(idCol).as("_kk_id"),
        F.coalesce((-score).cast(DoubleType),
          F.lit(Double.MaxValue)).as("_kk_ns"))
      .groupBy("_kk_k")
      .agg(F.min(F.struct(F.col("_kk_ns"), F.col("_kk_id"))).as("_kk_w"))
      .select(F.col("_kk_w._kk_id").as("_kk_keep"))
    df.join(winners, F.col(idCol) === F.col("_kk_keep"), "left_semi")
  }

  /** Exact token-set Jaccard similarity between two token arrays —
    * deterministic integer set sizes, double division. */
  def tokenJaccard(a: Column, b: Column): Column = {
    val inter = F.size(F.array_intersect(a, b)).cast(DoubleType)
    val union = F.size(a).cast(DoubleType) + F.size(b).cast(DoubleType) - inter
    inter / union
  }

  /** Exact k-shingle Jaccard pairs ≥ `minJ`, with candidate pairs from
    * MinHash-LSH banding instead of a quadratic scan — the scale-safe
    * composition (LSH candidates → exact verification). Candidates are
    * any pair sharing at least one band bucket (no estimate pre-filter:
    * the exact measure decides), so a J ≥ minJ pair is missed only with
    * probability (1-minJ^r)^bands — ~1e-14 at the defaults for J ≥ 0.8.
    * Candidate generation shuffles only (id, band_hash); the shingle
    * arrays travel once, through the verification joins. `maxBucket` > 0
    * salt-splits oversized band buckets (see [[saltOversized]]). */
  def jaccardPairsLsh(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numPerm: Int = 64, bands: Int = 32,
      minJ: Double = 0.8, maxBucket: Int = 0): DataFrame = {
    val rowsPerBand = numPerm / bands
    // hashed shingles persisted once (tracked — see unpersistAll): the
    // MinHash signature derives from them AND both verification joins
    // read them — 3 consumers of one expensive pass over the text.
    // sig must still cross a projection boundary as a NAMED column:
    // inlining it into the 32 band-key expressions would duplicate the
    // whole minhash fold 64× in the expression tree
    val sh = cached(df.select(F.col(idCol).as("id"),
        shingleHashes(F.col(textCol), k).as("sh"))
      .withColumn("n", F.size(F.col("sh")).cast(DoubleType)))
    val buckets = saltOversized(sh
      .select(F.col("id"), minhashFromHashes(F.col("sh"), numPerm).as("sig"))
      .select(F.col("id"),
        F.posexplode(lshBandKeys(F.col("sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_hash"))),
      Seq("band_idx", "band_hash"), maxBucket)
    val cand = buckets.as("a").join(buckets.as("b"),
        F.col("a.band_idx") === F.col("b.band_idx") &&
        F.col("a.band_hash") === F.col("b.band_hash") &&
        F.col("a.salt") === F.col("b.salt") &&
        F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"))
      .distinct()
    val inter = F.call_function("graft_intersect_count",
      F.col("a.sh"), F.col("b.sh")).cast(DoubleType)
    cand.join(sh.as("a"), F.col("id_a") === F.col("a.id"))
      .join(sh.as("b"), F.col("id_b") === F.col("b.id"))
      // length filter before the O(|A|+|B|) merge: J ≤ min/max, so
      // J ≥ minJ forces min(n) ≥ minJ·max(n); 0.5 slack is ulp-safe on
      // integral sizes. One hand-built And, cheap guard LEFT so the
      // short-circuit skips the merge (see probeJaccardIndex).
      .filter((F.least(F.col("a.n"), F.col("b.n")) >=
          F.lit(minJ) * F.greatest(F.col("a.n"), F.col("b.n")) - F.lit(0.5)) &&
        (inter / (F.col("a.n") + F.col("b.n") - inter)) >= minJ)
      .select(F.col("id_a"), F.col("id_b"),
        (inter / (F.col("a.n") + F.col("b.n") - inter)).as("jaccard"))
  }

  /** Exact k-shingle CONTAINMENT pairs: ordered (id_a, id_b) with
    * C(a→b) = |Sa ∩ Sb| / |Sa| ≥ `minC` — the asymmetric measure that
    * finds a short document (a quote, an excerpt, a syndicated article)
    * inside a longer one, which Jaccard structurally misses (a 12-token
    * quote of a 200-token page has J ≈ 0.05 at ANY containment).
    *
    * Candidates come from a bottom-`sketch` probe against a shingle
    * inverted index: each document contributes its `sketch` SMALLEST
    * shingle hashes as probe keys (the [[shingleHashes]] arrays are
    * sorted, so the sketch is a free slice) and its full hash set as
    * postings. A pair with C(a→b) ≥ minC shares ≥ minC·|Sa| shingles,
    * so all probe keys miss only if every one of a's `sketch` smallest
    * hashes falls in the < (1-minC) non-shared fraction — probability
    * ≲ (1-minC)^sketch (~1e-8 at minC = 0.9, sketch = 8) under the
    * hash-uniform order. Verification is the exact codegen'd linear
    * merge ([[graft.plans.SortedLongIntersectCount]]).
    *
    * Scale shape: the postings explode shuffles (hash, id) pairs — the
    * inverted-index posture of [[repeatedWindows]], 16 bytes per
    * shingle, never the text; the probe side is `sketch` rows per
    * document. `maxPosting` > 0 drops shingles whose posting list
    * exceeds it from CANDIDATE GENERATION (verification still uses
    * full sets): a boilerplate shingle shared by millions of documents
    * would otherwise make one join key quadratic. A pair can then be
    * missed only if ALL `sketch` of the contained side's probe shingles
    * are corpus-hot — the bounded-work/recall trade of the LSH
    * hot-bucket cap, and the right default posture on a web corpus. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, sketch: Int = 8, minC: Double = 0.9,
      maxPosting: Int = 0): DataFrame = {
    require(sketch >= 1, s"containmentPairs: sketch must be >= 1 (got $sketch)")
    val sh = cached(df.select(F.col(idCol).as("id"),
        shingleHashes(F.col(textCol), k).as("sh"))
      .withColumn("n", F.size(F.col("sh")).cast(DoubleType)))
    val postings0 = sh.select(F.col("id").as("id_b"),
      F.explode(F.col("sh")).as("h"))
    // hot-shingle cap: the overflow set is tiny relative to the corpus
    // (≤ total-shingles / maxPosting keys) — the anti join is AQE's
    // call (broadcast at any realistic cap)
    val postings = if (maxPosting <= 0) postings0 else {
      val hot = postings0.groupBy("h")
        .agg(F.count(F.lit(1)).as("_pc")).filter(F.col("_pc") > maxPosting)
        .select("h")
      postings0.join(hot, Seq("h"), "left_anti")
    }
    val probe = sh.select(F.col("id").as("id_a"),
      F.explode(F.slice(F.col("sh"), 1, sketch)).as("h"))
    val cand = probe.join(postings, "h")
      .filter(F.col("id_a") =!= F.col("id_b"))
      .select("id_a", "id_b").distinct()
    val inter = F.call_function("graft_intersect_count",
      F.col("a.sh"), F.col("b.sh")).cast(DoubleType)
    cand.join(sh.as("a"), F.col("id_a") === F.col("a.id"))
      .join(sh.as("b"), F.col("id_b") === F.col("b.id"))
      // asymmetric length filter before the merge: C(a→b) = i/|Sa| with
      // i ≤ min(na, nb), so C ≥ minC forces nb ≥ minC·na; 0.5 slack is
      // ulp-safe on integral sizes. One hand-built And, cheap guard
      // LEFT so the short-circuit skips the merge (two stacked Filters
      // recombined expensive-first here — see probeJaccardIndex).
      .filter((F.col("b.n") >= F.lit(minC) * F.col("a.n") - F.lit(0.5)) &&
        (inter / F.col("a.n")) >= minC)
      .select(F.col("id_a"), F.col("id_b"),
        (inter / F.col("a.n")).as("containment"))
  }

  /** Duplicated token windows: every n-token window whose fingerprint
    * occurs somewhere EARLIER in the corpus (earlier = smaller
    * (doc id, position); the first occurrence is the keeper and is NOT
    * reported). This is the relational core of exact-substring dedup
    * (the "remove any 50-token span that appears verbatim elsewhere"
    * rule used for LLM training corpora — reference north-star; window
    * fingerprints stand in for the suffix array). Returns
    * (id, pos, n_tokens) of non-keeper duplicated windows; `pos` is the
    * 0-based token offset. A document shorter than `n` tokens forms one
    * whole-document window (mirrors [[shingleStrings]]).
    *
    * Scale shape: windows are fingerprinted map-side (md5 of the joined
    * window, 16-byte shuffle key — the text itself is never shuffled);
    * the keeper per fingerprint comes from a `min(struct(id, pos))`
    * groupBy, so partial aggregation collapses a boilerplate window
    * repeated in billions of documents to one row per input partition
    * BEFORE the shuffle; occurrences then rejoin the keeper set on the
    * (fp, id, pos) triple — unique on both sides, so that shuffle
    * cannot skew no matter how hot a fingerprint is. Rows that match
    * are first occurrences; the survivors of the anti filter are the
    * duplicated spans. */
  def repeatedWindows(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, "repeatedWindows: n must be >= 2")
    // materialize the per-document expressions BELOW the generate:
    // selected alongside the posexplode, ExtractGenerator would park
    // n_tokens in the Project ABOVE the Generate and re-run the whole
    // tokenize once per OUTPUT window (the bm25TopK re-tokenize bug)
    val wins = df.select(F.col(idCol).as("id"),
        F.size(text.tokens(F.col(textCol))).as("n_tokens"),
        F.transform(shingleStrings(F.col(textCol), n), w => F.md5(w))
          .as("_rw_fps"))
      .select(F.col("id"), F.col("n_tokens"),
        F.posexplode(F.col("_rw_fps")).as(Seq("pos", "fp")))
    val keepers = wins.groupBy("fp")
      .agg(F.min(F.struct(F.col("id"), F.col("pos"))).as("k"))
      .select(F.col("fp"), F.col("k.id").as("id"), F.col("k.pos").as("pos"),
        F.lit(1).as("_keep"))
    wins.join(keepers, Seq("fp", "id", "pos"), "left")
      .filter(F.col("_keep").isNull)
      .select(F.col("id"), F.col("pos"), F.col("n_tokens"))
  }

  /** Exact-substring span dedup (Lee et al. 2022 posture, keep-first):
    * drop every token covered by an n-token window that appeared
    * earlier in the corpus, and reassemble each document from its
    * surviving tokens in order. Documents reduced to nothing keep an
    * empty string. Returns (id, n_tokens, n_dup_tokens, dup_fraction,
    * cleaned text). Typical production n is 50; any n ≥ 2 works.
    *
    * Scale shape on top of [[repeatedWindows]]: window→token coverage
    * is a bounded per-window explode (≤ n positions) deduplicated on
    * the unique (id, token position) key; surviving tokens come from a
    * left-anti join on that same unique key; reassembly is a bounded
    * per-document `sort_array`. No stage carries a corpus-wide window
    * or a skewable join key. */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, "dedupSpans: n must be >= 2")
    val dups = repeatedWindows(df, idCol, textCol, n)
    val covered = dups.select(F.col("id"), F.explode(F.sequence(F.col("pos"),
        F.least(F.col("pos") + (n - 1), F.col("n_tokens") - 1))).as("cpos"))
      .distinct()
    val toks = df.select(F.col(idCol).as("id"),
      F.posexplode(text.tokens(F.col(textCol))).as(Seq("cpos", "tok")))
    val kept = toks.join(covered, Seq("id", "cpos"), "left_anti")
      .groupBy("id").agg(
        F.count(F.lit(1)).as("_n_kept"),
        F.array_join(F.transform(F.sort_array(F.collect_list(
            F.struct(F.col("cpos"), F.col("tok")))),
          s => s.getField("tok")), " ").as("_clean"))
      // internal name: a user id column itself named "id" must not
      // become ambiguous in the final join
      .withColumnRenamed("id", "_sd_id")
    val nDup = F.col("_nt") - F.coalesce(F.col("_n_kept"), F.lit(0L))
    // null text contributes no windows/tokens upstream; count it as 0
    // tokens (null dup_fraction), not size(null) = -1 under non-ANSI
    df.select(F.col(idCol), F.when(F.col(textCol).isNull, F.lit(0L))
        .otherwise(F.size(text.tokens(F.col(textCol))).cast(LongType)).as("_nt"))
      .join(kept, F.col(idCol) === F.col("_sd_id"), "left")
      .select(F.col(idCol),
        F.col("_nt").as("n_tokens"),
        nDup.as("n_dup_tokens"),
        F.round(nDup.cast(DoubleType) / F.col("_nt").cast(DoubleType), 9)
          .as("dup_fraction"),
        F.coalesce(F.col("_clean"), F.lit("")).as(textCol))
  }

  /** All-pairs-within-bucket exact token Jaccard ≥ `minJ`. The bucket
    * column bounds the quadratic blow-up (use [[jaccardPairsLsh]] at
    * full scale). */
  def tokenJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      bucketCol: String, minJ: Double): DataFrame = {
    // tokens hashed to 64-bit longs and SORTED once per row: set sizes
    // (and hence Jaccard) are unchanged absent collisions (~1e-15 for
    // 1k-token docs), and the per-pair intersection is a codegen'd linear
    // merge (graft_intersect_count) — no per-pair hash set
    val toks = df.select(F.col(idCol).as("id"), F.col(bucketCol).as("bucket"),
      shingleHashes(F.col(textCol), 1).as("toks"))
      .withColumn("n", F.size(F.col("toks")).cast(DoubleType))
    val inter = F.call_function("graft_intersect_count",
      F.col("a.toks"), F.col("b.toks")).cast(DoubleType)
    toks.as("a").join(toks.as("b"),
        F.col("a.bucket") === F.col("b.bucket") && F.col("a.id") < F.col("b.id") &&
        // length filter before the O(|A|+|B|) merge: J ≤ min/max, so
        // J ≥ minJ forces min(n) ≥ minJ·max(n); 0.5 slack is ulp-safe
        // on integral sizes (see probeJaccardIndex)
        F.least(F.col("a.n"), F.col("b.n")) >=
          F.lit(minJ) * F.greatest(F.col("a.n"), F.col("b.n")) - F.lit(0.5))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        (inter / (F.col("a.n") + F.col("b.n") - inter)).as("jaccard"))
      .filter(F.col("jaccard") >= minJ)
  }

  /** Edit-distance (Levenshtein) blocked fuzzy-dup pairs — the classic
    * record-linkage complement to shingle Jaccard: catches small
    * character-level edits (typos, re-crawled titles, OCR noise) that
    * token shingles dilute. Each document is reduced to a bounded
    * `keyLen`-char NEAR-DUP KEY (printable-ASCII-only, lower-cased,
    * whitespace-collapsed prefix — non-ASCII is stripped BEFORE
    * lower-casing so both the engine and any ASCII replayer agree; JVM
    * and other engines' unicode lowercase tables legitimately differ),
    * then blocked on (first `prefixLen` chars, length ÷ `lenBand`) and
    * compared all-pairs WITHIN a block with the threshold-bounded
    * Levenshtein (early exit past `maxDist` — O(maxDist·keyLen), not
    * O(keyLen²)).
    *
    * Scale: one shuffle on the block key carrying (id, ≤keyLen-byte
    * key); the quadratic pair expansion is bounded by `maxBlock`
    * (deterministic smallest-id winners, same rule as the LSH hot-bucket
    * cap) so a degenerate corpus (a million identical titles) costs
    * maxBlock² per block, not corpus². The row_number cap compiles to
    * Spark's WindowGroupLimit with a PARTIAL pre-shuffle phase, so each
    * map partition ships at most maxBlock rows per block — the hot
    * block never crosses the wire uncapped, and the self-join reuses
    * the same exchange (both SQLMetrics-proven in ScaleSmokeSpec). Recall bounds are the usual
    * blocking trade: pairs whose keys differ in the first `prefixLen`
    * chars or straddle a length band are missed — tighten with more
    * passes at different prefixes if needed.
    *
    * Reference analogue: pydiverse pipelines express this as
    * group-by-block + cross-join + filter; here it is one equi-join the
    * optimizer plans as a shuffled hash join. */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, prefixLen: Int = 2, lenBand: Int = 8,
      keyLen: Int = 64, maxBlock: Int = 0): DataFrame = {
    require(maxDist >= 0 && prefixLen > 0 && lenBand > 0 && keyLen > 0)
    val key = F.substring(
      F.trim(F.regexp_replace(
        F.lower(F.regexp_replace(F.col(textCol), "[^ -~]", "")),
        "\\s+", " ")), 1, keyLen)
    val keyed0 = df
      .select(F.col(idCol).as("id"), key.as("k"))
      .where(F.length(F.col("k")) > 0)
      .withColumn("pfx", F.substring(F.col("k"), 1, prefixLen))
      .withColumn("lb", F.floor(F.length(F.col("k")) / lenBand))
    val keyed =
      if (maxBlock <= 0) keyed0
      else keyed0
        .withColumn("_ed_rn", F.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("pfx", "lb").orderBy("id")))
        .where(F.col("_ed_rn") <= maxBlock)
        .drop("_ed_rn")
    val a = keyed.select(F.col("id").as("id_a"), F.col("k").as("k_a"),
      F.col("pfx"), F.col("lb"))
    val b = keyed.select(F.col("id").as("id_b"), F.col("k").as("k_b"),
      F.col("pfx"), F.col("lb"))
    a.join(b, Seq("pfx", "lb"))
      .where(F.col("id_a") < F.col("id_b"))
      .withColumn("dist", F.levenshtein(F.col("k_a"), F.col("k_b"), maxDist))
      .where(F.col("dist") >= 0)
      .select(F.col("id_a"), F.col("id_b"), F.col("dist"))
  }

  /** EXACT all-pairs set-similarity join — every pair with k-shingle
    * Jaccard ≥ `minJ`, COMPLETE (no LSH recall loss) and without the
    * quadratic scan, via global-frequency PREFIX FILTERING (the public
    * algorithm family of Chaudhuri/Bayardo's prefix filter and Vernica
    * et al.'s MapReduce set-similarity join, SIGMOD 2010).
    *
    * Method: each document's distinct shingle set (size n) is ordered
    * rarest-first by corpus document frequency (ties by hash value — a
    * total order every document agrees on). A pair with J ≥ minJ must
    * overlap in o = ⌈minJ·n⌉ elements (J = i/(na+nb−i) ≥ t ⇒
    * i ≥ t·na and i ≥ t·nb), so its FIRST shared element in the global
    * order sits within the first n−o+1 elements of BOTH sets: emitting
    * only that prefix as postings and equi-joining on the shingle finds
    * every qualifying pair. Candidates are deduplicated, length-filtered
    * (min(na,nb) ≥ minJ·max(na,nb) is necessary), and verified with the
    * codegen'd sorted-merge intersection — exactly the all-pairs
    * Jaccard, computed on the few pairs that could qualify. The ⌈·⌉
    * bounds subtract 1e-6 before ceiling so a floating product landing
    * just ABOVE an exact integer (0.4·5 = 2.0000000000000004) cannot
    * shorten a prefix below the real bound — a one-longer prefix only
    * adds candidates, never drops pairs.
    *
    * Scale: shuffles are (1) shingle-grain for the document-frequency
    * count, (2) id-grain to assemble the rarest-first order, (3)
    * prefix-posting-grain for the candidate join, (4) candidate/id-grain
    * for verification — each linear in its input; nothing is quadratic
    * except the per-shingle posting join, which rarest-first ordering
    * keeps small (a shingle appearing in d prefixes costs d² candidate
    * rows — frequent shingles are precisely the ones pushed OUT of
    * prefixes). A degenerate corpus (millions of identical documents)
    * still concentrates one posting list: `maxPosting` > 0 caps each
    * prefix-shingle's posting list at the smallest-id members (the
    * deterministic rule the LSH hot-bucket and edit-distance block caps
    * use, compiled to the partial-phase WindowGroupLimit so the hot
    * posting never crosses the wire uncapped), trading completeness on
    * ONLY the capped shingles' pairs — uncapped (the default) the join
    * is exhaustively complete.
    *
    * Reference analogue: pydiverse pipelines express threshold joins as
    * group/cross/filter compositions; this is the engine-native complete
    * variant (vs [[jaccardPairsLsh]], the probabilistic one).
    * @return (id_a, id_b, jaccard) with id_a < id_b */
  def similarityJoinPrefix(df: DataFrame, idCol: String, textCol: String,
      k: Int, minJ: Double, maxPosting: Int = 0): DataFrame = {
    require(minJ > 0.0 && minJ <= 1.0,
      s"similarityJoinPrefix: minJ must be in (0, 1] (got $minJ)")
    require(k >= 1, s"similarityJoinPrefix: k must be >= 1 (got $k)")
    val toks = cached(df
      .select(F.col(idCol).as("id"), shingleHashes(F.col(textCol), k).as("toks"))
      .where(F.size(F.col("toks")) > 0)
      .withColumn("n", F.size(F.col("toks"))))
    val freq = toks.select(F.explode(F.col("toks")).as("tok"))
      .groupBy("tok").agg(F.count(F.lit(1)).as("tdf"))
    // prefix length n - ceil(minJ*n) + 1 over the (tdf, tok) total order
    val prefLen = (F.col("n") -
      F.ceil(F.col("n").cast(DoubleType) * minJ - 1e-6) + 1).cast(IntegerType)
    val pref0 = toks
      .select(F.col("id"), F.col("n"), F.explode(F.col("toks")).as("tok"))
      .join(freq, "tok")
      .groupBy("id")
      .agg(F.max("n").as("n"),
        F.sort_array(F.collect_list(F.struct(F.col("tdf"), F.col("tok"))))
          .as("ord"))
      .select(F.col("id"), F.col("n"),
        F.explode(F.transform(F.slice(F.col("ord"), F.lit(1), prefLen),
          e => e.getField("tok"))).as("tok"))
    val pref =
      if (maxPosting <= 0) pref0
      else pref0
        .withColumn("_pp_rn", F.row_number().over(
          Window.partitionBy("tok").orderBy("id")))
        .where(F.col("_pp_rn") <= maxPosting)
        .drop("_pp_rn")
    val cand = pref.select(F.col("tok"), F.col("id").as("id_a"), F.col("n").as("na"))
      .join(pref.select(F.col("tok"), F.col("id").as("id_b"), F.col("n").as("nb")),
        Seq("tok"))
      .where(F.col("id_a") < F.col("id_b") &&
        F.col("nb").cast(DoubleType) >= F.col("na").cast(DoubleType) * minJ - 1e-6 &&
        F.col("na").cast(DoubleType) >= F.col("nb").cast(DoubleType) * minJ - 1e-6)
      .select("id_a", "id_b").distinct()
    val inter = F.call_function("graft_intersect_count",
      F.col("_ta"), F.col("_tb")).cast(DoubleType)
    cand
      .join(toks.select(F.col("id").as("id_a"), F.col("toks").as("_ta"),
        F.col("n").as("_na")), Seq("id_a"))
      .join(toks.select(F.col("id").as("id_b"), F.col("toks").as("_tb"),
        F.col("n").as("_nb")), Seq("id_b"))
      .select(F.col("id_a"), F.col("id_b"),
        (inter / (F.col("_na").cast(DoubleType) + F.col("_nb").cast(DoubleType)
          - inter)).as("jaccard"))
      .filter(F.col("jaccard") >= minJ)
  }
}
