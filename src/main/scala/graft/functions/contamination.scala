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
}
