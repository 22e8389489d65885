package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Sparse lexical retrieval for data selection: BM25 in relational form.
  * Training-data pipelines use it to pull task-relevant subsets out of a
  * web corpus (and as the lexical arm of contamination sweeps) — the
  * inverted index is not a special data structure here, it IS the
  * `(token, doc, tf)` relation, so Catalyst plans the probe as ordinary
  * joins.
  *
  * Scale shape: term frequencies aggregate map-side; the query-token →
  * postings join is keyed on the token, touching only documents sharing
  * a query term (never a corpus scan per query); per-key fan-out is
  * bounded by a term's document frequency, with AQE skew-split covering
  * stopword-grade terms; ranking is the bounded two-stage top-k — no
  * task ever sorts one query's whole candidate set.
  *
  * Determinism: per-term contributions are rounded to 7 digits and
  * summed as DECIMAL, so scores (and therefore ranks, tie-broken by doc
  * id) are order-independent and engine-portable.
  */
object retrieval {

  /** Top-k BM25 matches per query row: `(q_id, n_id, score, rank)`.
    * `k1`/`b` are the standard Robertson parameters; idf is the
    * BM25+ always-positive form `ln((N - df + 0.5)/(df + 0.5) + 1)`.
    *
    * `maxDfFrac` < 1 drops terms whose document frequency exceeds
    * `maxDfFrac · N` from scoring — classic stopword pruning. At corpus
    * scale a stopword's postings list is O(N), so its probe-join fan-out
    * alone dominates the query; since such terms carry near-zero idf,
    * the recall cost of pruning them is negligible while the join cost
    * they impose is unbounded. The comparison runs in DOUBLE on both
    * engines (`CAST(dfr AS DOUBLE) <= maxDfFrac * CAST(nd AS DOUBLE)`)
    * so an oracle replays the cut bit-identically.
    *
    * Plan shape (cache-free, skew-free, ONE token-grain shuffle): the
    * corpus text column is scanned three times, but each derived input
    * is computed at the cheapest possible grain rather than re-running
    * the inverted-index aggregate —
    *
    *  - `tf` (the `(id, dl, token)` postings relation) is the only
    *    token-grain shuffle in the plan;
    *  - `dfreq` explodes `array_distinct(tokens)` and counts per token:
    *    the map-side combine collapses every task's output to at most
    *    vocabulary-many rows, so its shuffle is vocabulary-sized, never
    *    corpus-sized;
    *  - the corpus stats (N, avgdl) need no explode at all — `dl` is
    *    `size(tokens)` per corpus ROW, so they are a scan-level scalar
    *    aggregate (one partial row per task).
    *
    * Why not share one pass? Exchange reuse cannot unify consumers of a
    * common `tf` subtree — column pruning drops the count column from
    * the derived branches, so their partial aggregates never
    * canonicalize equal — and persisting `tf` for the query's duration
    * was measured SLOWER than recompute (columnar cache serialization of
    * the whole postings relation costs more than re-tokenizing), besides
    * pinning corpus-scale executor storage at 100 TB. Three cheap scans
    * with one bounded shuffle is the shape that survives scale-up; a
    * caller issuing repeated query batches over the same corpus should
    * build the persistent index once ([[graft.functions.index]]) instead
    * of re-deriving it per call. `dfreq` is attached back by an
    * equi-join rather than a `count() over (partition by token)` window:
    * the window would drag a hot token's entire postings list through
    * ONE task (the per-key skew a stopword creates at corpus scale),
    * whereas the join's small side (vocabulary-sized) broadcasts at
    * runtime via AQE.
    *
    * Corpus rows are assumed to carry distinct `idCol` values (it is a
    * document id): `nd`/`avgdl`/`dfr` count corpus ROWS, while the `tf`
    * aggregate merges duplicate ids — input with duplicate ids is
    * invalid and would score inconsistently between the two grains.
    * The precondition is deliberately NOT checked (a check would cost
    * its own corpus pass); callers with uncertain provenance should
    * dedup ids first (e.g. [[dedup.keepBestByKey]]). */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFrac: Double = 1.0): DataFrame = {
    // lambda-free empty-token drop: split on the trimmed text only ever
    // yields "" for the all-whitespace input, and array_remove — unlike a
    // higher-order F.filter lambda — stays fully codegen'd and
    // canonicalizable
    val toks = F.array_remove(text.tokens(F.col(textCol)), "")
    // an under-split corpus serializes all three tokenizing scans — fan
    // out once; the rebalance exchange is reused by every branch
    val src = skew.rebalanceUnderSplit(corpus)
    // (id, dl, token) -> tf: dl is functionally dependent on the id, so
    // carrying it as a grouping key costs nothing and saves the lens join.
    // Materialize the token array through its OWN projection first:
    // size() lands in a Project and explode() in a Generate — two
    // operators, no cross-operator subexpression elimination — so
    // inlining `toks` would run the whole regex split twice per row
    // (CollapseProject keeps the boundary: split is not a cheap
    // expression and is referenced twice, so it is never re-inlined).
    val tf = src
      .select(F.col(idCol), toks.as("_bm_toks"))
      .select(F.col(idCol), F.size(F.col("_bm_toks")).as("dl"),
        F.explode(F.col("_bm_toks")).as("token"))
      .groupBy(idCol, "dl", "token").agg(F.count(F.lit(1)).as("tf"))
    // doc frequency straight off the corpus row (distinct tokens per
    // doc), one count per token after map-side combine; no broadcast
    // HINT — at a 100M-term vocabulary forcing a broadcast would OOM
    // the driver, so the runtime (AQE) picks broadcast when the actual
    // size allows
    val dfreq = src
      .select(F.explode(F.array_distinct(toks)).as("token"))
      .groupBy("token").agg(F.count(F.lit(1)).as("dfr"))
    // nd counts docs with >= 1 token (dl = size(tokens) per corpus row,
    // no explode), matching the oracle's len-table semantics; avg is
    // computed as sum/count in DOUBLE, deterministic vs doc order
    val stats = src.select(F.size(toks).as("dl"))
      .filter(F.col("dl") > 0)
      .agg(F.count(F.lit(1)).as("nd"),
        (F.sum("dl").cast(DoubleType) /
          F.count(F.lit(1)).cast(DoubleType)).as("avgdl"))
    val qTok = queries.select(F.col(qIdCol).as("q_id"),
        F.explode(text.tokens(F.col(qTextCol))).as("token"))
      .filter(F.length(F.col("token")) > 0)
      .distinct()
    val postings = tf.join(dfreq, "token").crossJoin(F.broadcast(stats))
    // prune stopword-grade postings BEFORE the query-token join: the cut
    // happens where the rows are, never after the hot-token fan-out
    val pruned =
      if (maxDfFrac < 1.0)
        postings.filter(F.col("dfr").cast(DoubleType) <=
          F.lit(maxDfFrac) * F.col("nd").cast(DoubleType))
      else postings
    val termScore = F.round(
      F.log((F.col("nd") - F.col("dfr") + 0.5) / (F.col("dfr") + 0.5) + 1) *
        F.col("tf") * (k1 + 1) /
        (F.col("tf") +
          F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))),
      7).cast(DecimalType(28, 7))
    val scored = pruned
      .join(F.broadcast(qTok), "token")
      .groupBy(F.col("q_id"), F.col(idCol).as("n_id"))
      .agg(F.sum(termScore).as("cos"))
    similarity.twoStageTopK(scored, k)
      .select(F.col("q_id"), F.col("n_id"),
        F.col("cos").cast(DoubleType).as("score"), F.col("rank"))
  }

  /** Reciprocal-rank fusion of per-query rankings — the standard hybrid
    * retrieval combiner (lexical [[bm25TopK]] + semantic
    * [[similarity.bruteForceTopK]]/ivfTopK arms): each system
    * contributes `1/(k0 + rank)` per (query, doc) and the fused score is
    * the sum, so systems need no score calibration — only ranks matter.
    * Inputs are any frames with `(q_id, n_id, rank)`; returns
    * `(q_id, n_id, rrf, rank)` re-ranked to the fused top-k.
    *
    * Determinism: contributions are rounded to 9 digits and summed as
    * DECIMAL — order-independent and engine-portable (the [[bm25TopK]]
    * posture). Scale shape: each arm is already bounded to k rows per
    * query, so the union + (q_id, n_id) aggregation touches ≤ arms × k
    * rows per query, and re-ranking is the bounded two-stage top-k. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k0 >= 0, "rrfFuse: k0 must be non-negative")
    val contrib = rankings.map(_.select(F.col("q_id"), F.col("n_id"),
        F.round(F.lit(1.0) /
            (F.lit(k0).cast(DoubleType) + F.col("rank").cast(DoubleType)), 9)
          .cast(DecimalType(18, 9)).as("_rrf_c")))
      .reduce(_ unionByName _)
    val scored = contrib.groupBy("q_id", "n_id")
      .agg(F.sum("_rrf_c").as("cos"))
    similarity.twoStageTopK(scored, k)
      .select(F.col("q_id"), F.col("n_id"),
        F.col("cos").cast(DoubleType).as("rrf"), F.col("rank"))
  }

  /** Generic "top k rows per group by score" — the daily carve ("top
    * 10 documents per domain by quality", "best k chunks per page")
    * exposed over the k-bounded [[graft.plans.BoundedTopK]] heap
    * aggregate: each map task contributes at most k (group, id) pairs
    * per group to the one shuffle and no task ever sorts a group whole,
    * where the equivalent `row_number().over(partitionBy(group))`
    * window must ship and sort every row of every group (a mega-domain
    * becomes one task's sort). Highest score first, ties by id
    * ascending; NULL scores are excluded (a window would rank them —
    * with a heap there is nothing meaningful to rank them BY).
    * Output: groupCols + `(id, score, rank)`. */
  def groupTopK(df: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    require(k >= 1, s"retrieval: k must be >= 1 (got $k)")
    require(groupCols.nonEmpty, "retrieval: need at least one group col")
    val gs = groupCols.map(F.col)
    df.filter(F.col(scoreCol).isNotNull &&
        !F.isnan(F.col(scoreCol).cast(DoubleType)))
      .groupBy(gs: _*)
      .agg(F.call_function("graft_topk",
        F.col(scoreCol).cast(DoubleType), F.col(idCol).cast(LongType),
        F.lit(k)).as("_tk"))
      .select(gs :+ F.posexplode(F.col("_tk")).as(Seq("_pos", "_s")): _*)
      .select(gs ++ Seq(F.col("_s.id").as("id"),
        F.col("_s.score").as("score"),
        (F.col("_pos") + 1).cast(LongType).as("rank")): _*)
  }
}
