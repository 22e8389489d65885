package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.storage.StorageLevel

/** In-engine BPE (byte-pair-encoding) tokenizer-vocabulary training —
  * the learn-the-merges half of the tokenizer every LLM pipeline ships
  * (Sennrich et al. 2016). The classic formulation is a driver-bound
  * loop over a corpus; the scale observation (same as fastText-style
  * classifier training, [[quality.trainHashedClassifier]]) is that BPE
  * never needs the corpus after ONE pass: merges are a function of the
  * WORD-FREQUENCY table, whose cardinality is the vocabulary (≤ a few
  * million rows at any corpus size), not the corpus.
  *
  * Shape: ONE distributed pass builds the word-frequency table (explode
  * + map-side-combined count), which is then collected and the whole
  * merge loop runs driver-local — pair counting, the deterministic
  * argmax (count desc, then lexicographic), and the greedy
  * left-to-right merge are all in-memory array walks over vocab-bounded
  * state, so `numMerges` costs zero further Spark jobs. The driver
  * state is the same class as k-means centroids or a collected Bloom
  * filter: bounded by the VOCABULARY, never by the corpus — and the
  * bound is ENFORCED by a measured count, not assumed: a vocabulary
  * over `localVocabThreshold` (or `distributedLoop = true`) runs every
  * merge step on the cluster (two jobs per merge) instead of
  * collecting.
  *
  * Engine-portable by construction: counts are exact Longs, the argmax
  * tie-break is total, and the greedy merge is a string fold
  * (`acc ends-with "|" + lhs && next == rhs → concatenate`) that
  * replays verbatim as a DuckDB `list_reduce` — the x83 oracle replays
  * every merge step.
  *
  * Reference model: pydiverse.transform has no tokenizer surface; this
  * extends graft's training-data family. Training is restricted to
  * lowercase-alpha words (`^[a-z]+$`) so symbols never collide with
  * the fold's `|` separator — the standard pre-tokenization move.
  */
object bpe {

  /** Learn `numMerges` merges over the whitespace-token stream of
    * `textCol`. Returns (lhs, rhs, pairCount) per step, in merge
    * order; stops early if no adjacent pair remains.
    *
    * The choice of loop is gated on the MEASURED vocabulary size, not
    * on caller faith: the word-frequency table is persisted and counted
    * (the one corpus pass both loops need anyway), and only a vocabulary
    * at or under `localVocabThreshold` distinct words is collected for
    * the driver-local loop — a larger one (or `distributedLoop = true`)
    * runs every merge on the cluster. The default 1M words ≈ a few
    * hundred MB of collected symbol arrays. */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      distributedLoop: Boolean = false,
      localVocabThreshold: Long = 1000000L): Seq[(String, String, Long)] = {
    require(numMerges >= 1, s"bpe: numMerges must be >= 1 (got $numMerges)")
    val words = df
      .select(F.explode(text.tokens(F.col(textCol))).as("w"))
      // \A..\z for char-exactness (see [[segment]]'s gate); moot for
      // whitespace-split tokens, which cannot carry a trailing newline
      .filter(F.col("w").rlike("\\A[a-z]+\\z"))
      .groupBy("w").agg(F.count(F.lit(1)).as("cnt"))
      .select(F.regexp_extract_all(F.col("w"), F.lit("[a-z]"), F.lit(0))
        .as("syms"), F.col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val vocabSize = words.count()
      if (!distributedLoop && vocabSize <= localVocabThreshold)
        trainMergesLocal(words, numMerges)
      else trainMergesDistributed(words, numMerges)
    } finally words.unpersist(blocking = false)
  }

  /** Driver-local merge loop over the collected word-frequency table.
    * Exactly the distributed loop's semantics: pair counts are exact
    * Long sums; argmax is (count desc, lhs asc, rhs asc); the merge is
    * greedy left-to-right and a just-merged tail never re-matches as
    * lhs in the same pass (tail == lhs is checked against the WHOLE
    * current tail symbol, which after a merge is lhs+rhs ≠ lhs). */
  private def trainMergesLocal(words: DataFrame,
      numMerges: Int): Seq[(String, String, Long)] = {
    // vocab-bounded collect: (symbol array, count) per distinct word
    val vocab: Array[(Array[String], Long)] = words.collect().map { r =>
      (r.getSeq[String](0).toArray, r.getLong(1))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        var w = 0
        while (w < vocab.length) {
          val (syms, cnt) = vocab(w)
          // fast containment probe before allocating the merged array
          var hit = false
          var i = 0
          while (!hit && i < syms.length - 1) {
            if (syms(i) == a && syms(i + 1) == b) hit = true
            i += 1
          }
          if (hit) {
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (merged.nonEmpty && merged.last == a && syms(j) == b)
                merged(merged.length - 1) = a + b
              else merged += syms(j)
              j += 1
            }
            vocab(w) = (merged.toArray, cnt)
          }
          w += 1
        }
        step += 1
      }
    }
    out.toSeq
  }

  /** The all-on-cluster merge loop (two Spark jobs per merge): only for
    * vocabularies too large to collect to the driver. */
  private def trainMergesDistributed(words: DataFrame,
      numMerges: Int): Seq[(String, String, Long)] = {
    var state = words.persist(StorageLevel.MEMORY_AND_DISK)
    state.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    try {
      var step = 0
      var done = false
      while (step < numMerges && !done) {
        val sz = F.size(F.col("syms"))
        val top = state.select(F.explode(F.zip_with(
              F.slice(F.col("syms"), F.lit(1), F.greatest(sz - 1, F.lit(0))),
              F.slice(F.col("syms"), F.lit(2), F.greatest(sz - 1, F.lit(0))),
              (a, b) => F.struct(a.as("a"), b.as("b")))).as("p"),
            F.col("cnt"))
          .groupBy(F.col("p.a").as("a"), F.col("p.b").as("b"))
          .agg(F.sum("cnt").as("c"))
          .orderBy(F.col("c").desc, F.col("a"), F.col("b"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (a, b, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          out += ((a, b, c))
          // greedy left-to-right merge as a string fold: the seed-empty
          // first step appends the first symbol bare, so the fold equals
          // DuckDB's first-element-seeded list_reduce — the oracle
          // replays it verbatim. A just-merged tail never re-matches as
          // lhs in the same pass (standard BPE non-overlap rule).
          val merged = state.select(
            F.split(F.aggregate(F.col("syms"), F.lit(""),
              (acc, x) => F.when(acc === "", x)
                .otherwise(F.when(
                  (acc === a || acc.endsWith(F.lit("|" + a))) && x === b,
                  F.concat(acc, x))
                  .otherwise(F.concat(acc, F.lit("|"), x)))), "\\|")
              .as("syms"),
            F.col("cnt"))
          val next = merged.persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
          state.unpersist(blocking = false)
          state = next
          step += 1
        }
      }
    } finally state.unpersist(blocking = false)
    out.toSeq
  }

  /** Apply learned merges to a token column: each lowercase-alpha token
    * becomes its BPE symbol array (other tokens pass through as a
    * single symbol). One codegen'd expression chain per merge — no
    * shuffle, no UDF; the segmenter half of the tokenizer. */
  def segment(tok: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val chars = F.regexp_extract_all(tok, F.lit("[a-z]"), F.lit(0))
    val folded = merges.foldLeft(chars) { case (syms, (a, b)) =>
      F.split(F.aggregate(syms, F.lit(""),
        (acc, x) => F.when(acc === "", x)
          .otherwise(F.when(
            (acc === a || acc.endsWith(F.lit("|" + a))) && x === b,
            F.concat(acc, x))
            .otherwise(F.concat(acc, F.lit("|"), x)))), "\\|")
    }
    // \A..\z, not ^..$: Java's $ also matches before a trailing
    // newline, so "abc\n" would take the merge path here while
    // [[segmentFast]]'s char-exact gate (and RE2-based oracle replays,
    // where $ is end-of-text) pass it through whole
    F.when(tok.rlike("\\A[a-z]+\\z"), folded).otherwise(F.array(tok))
  }

  /** [[segment]] against a RUNTIME merge table — identical semantics
    * (one greedy left-to-right pass per merge, in rank order;
    * cross-checked against the chained form in ExtensionsSpec), carried
    * by ONE codegen'd expression
    * ([[graft.plans.BpeSegmentExpr]]) holding the rules as a broadcast
    * reference object. [[segment]]'s chain is fine for the handful of
    * merges an oracled query trains; a production tokenizer's 1k–32k
    * rules would explode the expression tree (Janino method limits,
    * quadratic analysis) — here the rule count never touches plan
    * size, and per token only ranks whose pair actually occurs run a
    * pass. Shuffle-free map either way. */
  def segmentFast(tok: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    F.call_function("graft_bpe_segment", tok,
      F.typedlit(merges.flatMap(p => Seq(p._1, p._2))))
}
