package graft.functions

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Benchmark decontamination: flag training documents that share k-token
  * n-grams with an evaluation/benchmark set — the overlap check every
  * training-data pipeline runs before a corpus ships.
  *
  * Scale design: the benchmark side is tiny relative to the corpus
  * (thousands of eval documents vs billions of training documents), so
  * its distinct shingle-fingerprint set is BROADCAST and the corpus-side
  * probe is a map-side hash join — the 100 TB corpus is never shuffled
  * to discover overlap. The only shuffle is the per-document aggregation
  * of (doc_id, shingle-fingerprint) pairs, whose key is 16 bytes, never
  * the text. Shingles travel as 60-bit md5-prefix fingerprints
  * ([[text.fingerprint64]]) — an 8-byte join key, portable to any engine
  * with md5, and identical across engines so overlap COUNTS match
  * bit-for-bit (a fingerprint collision, ~1e-14 per corpus, would be
  * the same collision in the oracle).
  */
object contamination {

  /** Distinct k-token shingle fingerprints of a text column, computed by
    * the codegen'd [[graft.plans.ShingleFp64Expr]] — one tokenize + md5
    * pass per row. */
  private def shingleFps(c: Column, k: Int): Column =
    F.call_function("graft_shingle_fp64", c, F.lit(k))

  /** Built-ins-only version with identical semantics (interpreted; used
    * to cross-check the native expression). */
  private[graft] def shingleFpsPortable(c: Column, k: Int): Column =
    F.array_sort(F.array_distinct(F.transform(dedup.shingles(c, k),
      s => text.fingerprint64(s))))

  /** Per-training-document overlap stats against a benchmark corpus:
    * `(idCol, n_shingles, n_overlap, contaminated)` where `n_shingles`
    * counts the document's distinct k-token shingles, `n_overlap` those
    * that occur in ANY benchmark document, and `contaminated` is true
    * when the overlapping fraction is ≥ `minOverlap` (n-gram-overlap
    * decontamination à la GPT-3 appendix C / the Pile). Every training
    * row appears in the output, including zero-overlap ones. */
  def overlapStats(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 8,
      minOverlap: Double = 0.1, broadcastBench: Boolean = true): DataFrame = {
    val tSh = train.select(F.col(idCol),
        F.explode(shingleFps(F.col(textCol), k)).as("h"))
    val bSh = bench
      .select(F.explode(shingleFps(F.col(benchTextCol), k)).as("h"))
      .distinct()
    // broadcastBench = false: a benchmark set too large for executor
    // memory falls back to a shuffle join on the 8-byte fingerprint —
    // still never the text
    val bHits = bSh.withColumn("_hit", F.lit(1))
    tSh.join(if (broadcastBench) F.broadcast(bHits) else bHits, Seq("h"), "left")
      .groupBy(idCol)
      .agg(
        F.count(F.lit(1)).as("n_shingles"),
        F.count(F.col("_hit")).as("n_overlap"))
      .withColumn("contaminated",
        F.col("n_overlap").cast(DoubleType) /
          F.col("n_shingles").cast(DoubleType) >= minOverlap)
  }

  /** The decontaminated corpus: training rows whose benchmark n-gram
    * overlap stays below `minOverlap`. */
  def decontaminate(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 8,
      minOverlap: Double = 0.1): DataFrame = {
    val flagged = overlapStats(train, idCol, textCol, bench, benchTextCol,
        k, minOverlap)
      .filter(F.col("contaminated"))
      .select(F.col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Per-benchmark-DOCUMENT containment against the corpus: a training
    * document is contaminated when ANY single benchmark document has
    * ≥ `minContain` of ITS OWN shingles inside it — the leak
    * [[overlapStats]] structurally misses. A 20-shingle eval item
    * pasted into a 2000-shingle page is 1% of the PAGE (invisible to
    * the overlap fraction at any sane threshold) but 100% of the ITEM;
    * the denominator must be the benchmark document, not the training
    * document. Returns every training row as
    * `(idCol, n_bench_hits, max_containment, contaminated)` —
    * n_bench_hits counts benchmark documents at ≥ minContain,
    * max_containment the best ratio over all of them (0.0 when no
    * shingle overlaps at all).
    *
    * Scale shape: the benchmark's (fingerprint, bench-doc, set-size)
    * triples broadcast like [[overlapStats]]' set; the corpus-side
    * probe is a map-side INNER hash join, so only training shingles
    * that actually hit a benchmark document are ever shuffled (keyed
    * (train-id, bench-doc) — 16 bytes), and the zero-overlap bulk of
    * the corpus rejoins via the final left join on the unique id. */
  def containmentStats(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 8,
      minContain: Double = 0.8, broadcastBench: Boolean = true): DataFrame = {
    val b = bench.select(F.monotonically_increasing_id().as("_bid"),
      shingleFps(F.col(benchTextCol), k).as("_bfps"))
    val bPairs0 = b.select(F.col("_bid"),
      F.size(F.col("_bfps")).cast(DoubleType).as("_nb"),
      F.explode(F.col("_bfps")).as("h"))
    val bPairs = if (broadcastBench) F.broadcast(bPairs0) else bPairs0
    val perPair = train
      .select(F.col(idCol), F.explode(shingleFps(F.col(textCol), k)).as("h"))
      .join(bPairs, "h")
      .groupBy(idCol, "_bid")
      .agg(F.count(F.lit(1)).as("_inter"), F.first("_nb").as("_nb"))
      .withColumn("_c", F.col("_inter").cast(DoubleType) / F.col("_nb"))
    val perDoc = perPair.groupBy(idCol).agg(
      F.sum(F.when(F.col("_c") >= minContain, 1L).otherwise(0L))
        .as("n_bench_hits"),
      F.max(F.col("_c")).as("max_containment"))
    train.select(F.col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(F.col(idCol),
        F.coalesce(F.col("n_bench_hits"), F.lit(0L)).as("n_bench_hits"),
        F.coalesce(F.col("max_containment"), F.lit(0.0))
          .as("max_containment"))
      .withColumn("contaminated", F.col("n_bench_hits") > 0L)
  }

  /** The corpus minus every document some benchmark item is contained
    * in ([[containmentStats]] ≥ `minContain`) — run it alongside
    * [[decontaminate]]: overlap catches wholesale copies, containment
    * catches embedded items. */
  def decontaminateContained(train: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String, k: Int = 8,
      minContain: Double = 0.8): DataFrame = {
    val flagged = containmentStats(train, idCol, textCol, bench,
        benchTextCol, k, minContain)
      .filter(F.col("contaminated"))
      .select(F.col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** [[overlapStats]] for benchmark sets too large to broadcast as an
    * exact fingerprint set (hundreds of millions of n-grams — an exact
    * long set is gigabytes; the Bloom filter is ~1.2 bytes/item at 1%
    * fpp). Same EXACT output: a map-side Bloom pass
    * ([[graft.plans.LongArrayBloomCount]], no false negatives) proves
    * most of the corpus overlap-free without exploding or shuffling it;
    * only might-contain suspects (true overlaps + ~fpp of clean rows)
    * take the explode + SHUFFLE fingerprint join — broadcast is exactly
    * what this path exists to avoid — for exact counts that cancel the
    * false positives. At fpp = 1% the shuffled volume drops ~99% vs
    * running the join over everything.
    *
    * `expectedItems` sizes the filter; 0 (default) counts the distinct
    * benchmark fingerprints first (one extra small job over the BENCH
    * side only — never the corpus). */
  def overlapStatsBloom(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 8,
      minOverlap: Double = 0.1, fpp: Double = 0.01,
      expectedItems: Long = 0L): DataFrame = {
    import org.apache.spark.sql.graftbridge.{columnExpr, exprColumn}
    require(fpp > 0.0 && fpp < 1.0, "overlapStatsBloom: fpp must be in (0,1)")
    // pinned, not auto-released: the sizing count and the filter build
    // both read it before the exact join; released when the RETURNED
    // frame is consumed (releaseWhenConsumed below)
    val bFps = dedup.cachedPinned(bench
      .select(F.explode(shingleFps(F.col(benchTextCol), k)).as("h"))
      .distinct())
    val items = if (expectedItems > 0L) expectedItems else bFps.count()
    // empty benchmark: Spark's bloomFilter aggregate returns a null
    // buffer for zero input rows (NPE in readFrom), and the right answer
    // needs no filter at all — every train row is provably clean. The
    // NPE catch also covers a caller passing expectedItems > 0 for a
    // bench that turns out empty (the sizing-count skip is a 100 TB
    // path; being lied to should degrade to correct, not crash).
    val bfOpt =
      if (items == 0L) None
      else try Some(bFps.stat.bloomFilter("h", items, fpp))
      catch { case _: NullPointerException => None }
    if (bfOpt.isEmpty) {
      // NULL-text rows are dropped here to match the normal path (a
      // null `_fps` fails both suspect filters there) and
      // [[overlapStats]] (explode of a null array). Non-null text
      // always has ≥ 1 shingle (texts shorter than k tokens yield the
      // whole text as one shingle), so n_shingles = 0 cannot occur and
      // `contaminated` is uniformly false, never 0/0.
      val out = train.filter(F.col(textCol).isNotNull)
        .select(F.col(idCol),
          F.size(shingleFps(F.col(textCol), k)).cast(LongType).as("n_shingles"),
          F.lit(0L).as("n_overlap"))
        .withColumn("contaminated", F.lit(false))
      dedup.releaseWhenConsumed(bFps, out)
      return out
    }
    val bf = bfOpt.get
    val bfBytes = {
      val os = new java.io.ByteArrayOutputStream()
      bf.writeTo(os); os.toByteArray
    }
    val scored = train.select(F.col(idCol),
        shingleFps(F.col(textCol), k).as("_fps"))
      .withColumn("n_shingles", F.size(F.col("_fps")).cast(LongType))
      .withColumn("_maybe", exprColumn(graft.plans.LongArrayBloomCount(
        columnExpr(F.col("_fps")), bfBytes)))
    // count == 0 is PROOF of zero overlap (no false negatives)
    val clean = scored.filter(F.col("_maybe") === 0)
      .select(F.col(idCol), F.col("n_shingles"), F.lit(0L).as("n_overlap"))
    val exact = scored.filter(F.col("_maybe") > 0)
      .select(F.col(idCol), F.col("n_shingles"),
        F.explode(F.col("_fps")).as("h"))
      .join(bFps.withColumn("_hit", F.lit(1)), Seq("h"), "left")
      .groupBy(idCol, "n_shingles")
      .agg(F.count(F.col("_hit")).as("n_overlap"))
      .select(F.col(idCol), F.col("n_shingles"), F.col("n_overlap"))
    val out = clean.unionByName(exact)
      .withColumn("contaminated",
        F.col("n_overlap").cast(DoubleType) /
          F.col("n_shingles").cast(DoubleType) >= minOverlap)
    dedup.releaseWhenConsumed(bFps, out)
    out
  }

  /** [[decontaminate]] on the Bloom pre-filtered path — same exact
    * surviving corpus, built for un-broadcastable benchmark sets. */
  def decontaminateBloom(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 8,
      minOverlap: Double = 0.1, fpp: Double = 0.01): DataFrame = {
    require(minOverlap > 0.0,
      "decontaminateBloom: minOverlap must be > 0 (0 would flag every row)")
    val flagged = overlapStatsBloom(train, idCol, textCol, bench,
        benchTextCol, k, minOverlap, fpp)
      .filter(F.col("contaminated"))
      .select(F.col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Embedding-space decontamination: drop training rows whose vector
    * sits within cosine ≥ `minCos` of ANY benchmark vector — the layer
    * that catches paraphrased or re-formatted eval leakage the n-gram
    * fingerprints of [[decontaminate]]/[[decontaminateContained]]
    * structurally miss (no shingle survives a paraphrase; the embedding
    * does).
    *
    * Scale shape: the benchmark (thousands of vectors — eval sets, not
    * corpora) broadcasts once with precomputed norms, and the corpus
    * side is a broadcast nested-loop ANTI join — a pure map-side scan
    * that short-circuits on the first contaminated hit, so the corpus
    * is never shuffled, sorted, or persisted and the plan has ZERO
    * exchanges on the 100 TB side. Cosines use the order-deterministic
    * per-row fold ([[similarity.dot]]), so the decision replays exactly
    * in the x74 DuckDB oracle. */
  def semanticDecontaminate(train: DataFrame, idCol: String,
      vecCol: String, bench: DataFrame, benchVecCol: String,
      minCos: Double = 0.9): DataFrame = {
    require(minCos > 0.0,
      "semanticDecontaminate: minCos must be > 0 (a zero/negative " +
        "threshold would flag effectively every row)")
    val b = F.broadcast(bench.select(
      F.col(benchVecCol).as("_sd_bvec"),
      similarity.norm(F.col(benchVecCol)).as("_sd_bnrm")))
    // train-side norm precomputed ONCE per row in a projection — inside
    // the join condition it would re-evaluate per benchmark vector
    val t = train.withColumn("_sd_tnrm", similarity.norm(F.col(vecCol)))
    val contaminated =
      similarity.dot(F.col(vecCol), F.col("_sd_bvec")) /
        F.col("_sd_tnrm") / F.col("_sd_bnrm") >= minCos
    t.join(b, contaminated, "left_anti").drop("_sd_tnrm")
  }
}
