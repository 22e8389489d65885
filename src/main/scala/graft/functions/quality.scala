package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Dynamic-threshold filtering: cut a corpus to the rows whose score
  * lies between two quantiles of the score's own distribution — the
  * CCNet posture (both perplexity tails are bad: one is rare-token
  * soup, the other repetitive boilerplate).
  *
  * Scale design: an exact global order statistic needs a corpus-wide
  * sort (or 10% of the corpus on the driver via top-k selection);
  * instead the quantiles are resolved at BUCKET granularity — scores
  * round to `decimals` digits, a histogram aggregation (map-side
  * combining) produces one row per distinct bucket, a cumulative sum
  * over that tiny frame finds the threshold buckets, and the corpus is
  * filtered map-side against two broadcast literals-to-be. Exact
  * integer logic after the rounding, hence engine-portable; threshold
  * resolution is 10^-decimals, the same trade CCNet's bucketed
  * perplexity cutoffs make. */
object quality {

  /** Keep rows whose `round(scoreCol, decimals)` falls in the
    * [pLo, pHi] quantile band of the rounded-score distribution.
    * Threshold buckets are the smallest buckets whose cumulative count
    * reaches `ceil(p * n)`. */
  def quantileBandFilter(df: DataFrame, scoreCol: String,
      pLo: Double, pHi: Double, decimals: Int = 2): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi, "quality: need 0<=pLo<=pHi<=1")
    // Two passes over the input, NOTHING persisted: pass 1 (the
    // histogram) projects only the rounded score — column pruning keeps
    // its scan narrow — and pass 2 recomputes the score map-side in the
    // final filter. Recomputing one scorer expression twice is the
    // 100 TB-safe trade: the alternative (persisting the input so the
    // scorer runs once) pins the ENTIRE corpus in MEMORY_AND_DISK for
    // the sake of a single-column aggregation.
    val b = F.round(F.col(scoreCol), decimals)
    val hist = df.select(b.as("_qb_bucket")).groupBy("_qb_bucket")
      .agg(F.count(F.lit(1)).as("_qb_cnt"))
    val cum = hist.withColumn("_qb_cum", F.sum("_qb_cnt").over(
      // ≤ 10^decimals·range buckets: a deliberately single-task window
      // over histogram metadata, never over corpus rows
      org.apache.spark.sql.expressions.Window.partitionBy(F.lit(0))
        .orderBy("_qb_bucket")))
    val n = F.col("_qb_n")
    val total = hist.agg(F.sum("_qb_cnt").as("_qb_n"))
    val bounds = cum.crossJoin(F.broadcast(total))
      .agg(
        F.min(F.when(F.col("_qb_cum") >= F.ceil(F.lit(pLo) * n),
          F.col("_qb_bucket"))).as("_qb_lo"),
        F.min(F.when(F.col("_qb_cum") >= F.ceil(F.lit(pHi) * n),
          F.col("_qb_bucket"))).as("_qb_hi"))
    df.crossJoin(F.broadcast(bounds))
      .filter(b >= F.col("_qb_lo") && b <= F.col("_qb_hi"))
      .drop("_qb_lo", "_qb_hi")
  }

  /** Per-group [[quantileBandFilter]] — the CCNet posture applied the
    * way CCNet actually applies it: thresholds resolved PER LANGUAGE
    * (or per source), because one language's perplexity scale is
    * another's tail. Same bucket-granular scheme as the global variant:
    * the histogram aggregation produces (group, bucket) rows — map-side
    * combining, cardinality = groups × distinct buckets — the
    * cumulative/total windows run per group over that tiny frame, and
    * the corpus is filtered map-side against the broadcast per-group
    * bounds. The corpus itself is never sorted, windowed, or
    * persisted. */
  def quantileBandFilterGrouped(df: DataFrame, scoreCol: String,
      groupCol: String, pLo: Double, pHi: Double,
      decimals: Int = 2): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi, "quality: need 0<=pLo<=pHi<=1")
    import org.apache.spark.sql.expressions.Window
    val b = F.round(F.col(scoreCol), decimals)
    val hist = df.select(F.col(groupCol).as("_qb_g"), b.as("_qb_bucket"))
      .groupBy("_qb_g", "_qb_bucket").agg(F.count(F.lit(1)).as("_qb_cnt"))
    val cum = hist
      .withColumn("_qb_cum", F.sum("_qb_cnt").over(
        Window.partitionBy("_qb_g").orderBy("_qb_bucket")))
      .withColumn("_qb_n", F.sum("_qb_cnt").over(Window.partitionBy("_qb_g")))
    val bounds = cum.groupBy("_qb_g").agg(
      F.min(F.when(F.col("_qb_cum") >= F.ceil(F.lit(pLo) * F.col("_qb_n")),
        F.col("_qb_bucket"))).as("_qb_lo"),
      F.min(F.when(F.col("_qb_cum") >= F.ceil(F.lit(pHi) * F.col("_qb_n")),
        F.col("_qb_bucket"))).as("_qb_hi"))
    df.join(F.broadcast(bounds), F.col(groupCol) === F.col("_qb_g"))
      .filter(b >= F.col("_qb_lo") && b <= F.col("_qb_hi"))
      .drop("_qb_g", "_qb_lo", "_qb_hi")
  }

  /** The Gopher document-quality rule battery (Rae et al. 2021, §A1.1):
    * the standard first-pass heuristic filter of large-scale web-corpus
    * curation. Returns a struct of the per-document metrics plus the
    * combined `pass` flag so pipelines can either filter on `pass` or
    * keep the metrics as features. All rules are rational arithmetic
    * over one tokenize + one line-split — a single shuffle-free codegen
    * pass per row, and every rule replays exactly in SQL (oracled).
    *
    * Rules (defaults = the published thresholds): word count in
    * [minWords, maxWords]; mean word length in [minMeanWordLen,
    * maxMeanWordLen]; (# + "...") symbol-to-word ratio <= maxSymbolRatio;
    * fraction of bullet-led lines <= maxBulletLineFrac; fraction of
    * ellipsis-ended lines <= maxEllipsisLineFrac; fraction of words with
    * an alphabetic character >= minAlphaWordFrac; at least minStopwords
    * distinct common-English stopwords present. */
  def gopherRules(c: org.apache.spark.sql.Column,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopwords: Int = 2): org.apache.spark.sql.Column = {
    // all counters come from ONE codegen'd scan
    // ([[graft.plans.GopherStatsExpr]]); the many references below
    // collapse to a single per-row invoke under whole-stage
    // subexpression elimination. Only the symbol counts and stopword
    // probes stay as (codegen'd) regex builtins.
    val st = F.call_function("graft_gopher_stats", c)
    val nWords = st.getField("n_words")
    val nW = nWords.cast(DoubleType)
    val meanLen = F.round(st.getField("sum_word_len").cast(DoubleType) / nW, 6)
    val symbols = F.regexp_count(c, F.lit("#")) +
      F.regexp_count(c, F.lit("\\.\\.\\."))
    val symbolRatio = F.round(symbols.cast(DoubleType) / nW, 6)
    val nL = st.getField("n_lines").cast(DoubleType)
    val bulletFrac = F.round(
      st.getField("n_bullet_lines").cast(DoubleType) / nL, 6)
    val ellipsisFrac = F.round(
      st.getField("n_ellipsis_lines").cast(DoubleType) / nL, 6)
    val alphaFrac = F.round(
      st.getField("n_alpha_words").cast(DoubleType) / nW, 6)
    val nStop = GopherStopwords
      .map(w => F.when(F.lower(c).rlike(s"\\b$w\\b"), 1).otherwise(0))
      .reduce(_ + _)
    // NO conditional wrapper: a CASE would exclude every branch subtree
    // from codegen subexpression elimination and re-run the stats scan
    // and regexes once per referencing field. Empty documents fall out
    // naturally — nW = 0 makes the ratio metrics null (non-ANSI x/0),
    // while `n_words >= minWords` is a non-null FALSE, so `pass` is
    // false, never null.
    val pass = nWords >= minWords && nWords <= maxWords &&
      meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
      symbolRatio <= maxSymbolRatio &&
      bulletFrac <= maxBulletLineFrac &&
      ellipsisFrac <= maxEllipsisLineFrac &&
      alphaFrac >= minAlphaWordFrac &&
      nStop >= minStopwords
    F.struct(
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      nStop.as("n_stop"), pass.as("pass"))
  }

  /** Gopher's required-stopword list (presence of >= 2 distinct). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Keep only the documents that pass [[gopherRules]]. */
  def filterGopher(df: DataFrame, textCol: String): DataFrame =
    df.filter(gopherRules(F.col(textCol)).getField("pass"))

  /** Per-domain mean-score statistics: one row per domain with the
    * document count and the mean of `round(score, decimals)` — summed
    * as DECIMAL so the mean is addition-order-independent and replays
    * exactly in any engine (the portable-aggregate posture). The
    * aggregation combines map-side, so the shuffle carries one partial
    * row per (task, domain), never corpus rows. */
  def domainQualityStats(df: DataFrame, domainCol: String,
      score: org.apache.spark.sql.Column, decimals: Int = 6): DataFrame =
    df.groupBy(F.col(domainCol).as("domain"))
      .agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum(F.round(score, decimals).cast(DecimalType(28, decimals)))
          .as("sum_score"))
      .withColumn("mean_score",
        F.round(F.col("sum_score").cast(DoubleType) /
          F.col("n_docs").cast(DoubleType), decimals))

  /** Domain-level quality gate (the C4/RefinedWeb move): drop EVERY
    * document from a domain whose MEAN quality score falls below
    * `minMean`, on the observation that page-level scores are noisy but
    * spam/SEO farms are consistently bad — a per-page filter keeps a
    * content farm's occasional fluent page, the domain gate doesn't.
    *
    * Scale shape: pass 1 aggregates (domain → decimal sum, count)
    * with map-side combining — output cardinality is the domain count,
    * not the corpus; the admitted-domain list then broadcasts back as a
    * left-semi filter, so the corpus itself is never shuffled. The
    * pass/fail rule compares `sum >= minMean * n` (one double multiply
    * per DOMAIN) rather than materializing a divided mean, sidestepping
    * engines' divergent decimal-division scale rules — the decision
    * replays exactly in the x75 DuckDB oracle. */
  def domainQualityFilter(df: DataFrame, domainCol: String,
      score: org.apache.spark.sql.Column, minMean: Double,
      decimals: Int = 6): DataFrame = {
    val good = domainQualityStats(df, domainCol, score, decimals)
      .filter(F.col("sum_score").cast(DoubleType) >=
        F.lit(minMean) * F.col("n_docs").cast(DoubleType))
      .select(F.col("domain").as("_dq_domain"))
    df.join(F.broadcast(good),
      F.col(domainCol) === F.col("_dq_domain"), "left_semi")
  }

  /** Hashing-trick linear classifier score (the fastText-style quality
    * model every modern curation pipeline runs): tokens hash into a
    * `weights.length`-dimensional table (md5-derived — engine-portable),
    * the document embedding is the MEAN of its tokens' weights, and the
    * score is the logistic of (bias + mean). Training happens offline;
    * this applies a given model at corpus scale: one shuffle-free
    * codegen'd expression per row, weights riding along as a plan
    * literal (suits the ≤10^5-dim tables these classifiers use; ship
    * larger tables as a broadcast join on the hash id instead).
    * Rounded to 6 decimals so the transcendental tail is cross-engine
    * comparable. */
  def hashedLinearScore(text: org.apache.spark.sql.Column,
      weights: Array[Double], bias: Double): org.apache.spark.sql.Column = {
    require(weights.nonEmpty, "quality: weights must be non-empty")
    val dim = weights.length
    val w = F.typedlit(weights.toSeq)
    val toks = graft.functions.text.tokens(text)
    val mean = F.aggregate(toks, F.lit(0.0),
      (acc, t) => acc + F.element_at(w,
        (sampling.hashBucket(t, dim) + 1).cast(IntegerType))) /
      F.size(toks).cast(DoubleType)
    F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(bias) + mean))), 6)
  }

  /** Train the [[hashedLinearScore]] classifier IN the engine: batch
    * gradient descent on logistic loss over hashed token buckets, the
    * label-supervised sibling of [[similarity.trainIvfCentroids]]'s
    * Lloyd loop. Each iteration is ONE Spark job: every document emits
    * (bucket, contribution) entries — its tokens' weight-gradient
    * shares plus two synthetic rows for the bias gradient and the row
    * count — and a map-side-combined DECIMAL aggregation reduces them
    * to `dim` + 2 rows on the driver, which applies the update. The
    * corpus is scanned once per iteration and the scan itself is never
    * shuffled (the gradient exchange carries ≤ tasks × (dim+2) partial
    * rows); driver state is one double[dim] — the IVF-centroid
    * posture, so training the quality model needs no exit from the
    * engine and no second system. Exception: a drastically UNDER-SPLIT
    * corpus pays one rebalance shuffle before the loop (the measured
    * gate below), pinned across iterations when iters > 1 so the
    * fan-out is paid once, not once per gradient job.
    *
    * Engine-portable by construction: the only float rounding in the
    * loop is the sigmoid (6 digits — the established cross-engine
    * grain). The gradient path is EXACT integer arithmetic: the error
    * becomes the integer `err6 = round(err·10⁶)`, each token
    * contributes `err6·10¹² div n` (truncating integer division —
    * identical in every engine, unlike ROUND(double) whose tie
    * behavior diverges), sums are DECIMAL, and the driver update
    * `w − lr·(sum/10¹⁸/n)` is fixed-order IEEE on those exact sums —
    * bit-equal anywhere, with no rounding of the parameters
    * themselves. An oracle can therefore replay every iteration
    * exactly (x76). Returns (weights, bias), ready for
    * [[hashedLinearScore]]. */
  def trainHashedClassifier(df: DataFrame, textCol: String,
      label: org.apache.spark.sql.Column, dim: Int, iters: Int = 2,
      lr: Double = 1.0): (Array[Double], Double) = {
    require(dim >= 1 && iters >= 0 && lr > 0,
      "quality: need dim >= 1, iters >= 0, lr > 0")
    val dec0 = DecimalType(38, 0)
    var w = Array.fill(dim)(0.0)
    var b = 0.0
    // under-split inputs serialize the per-token gradient fold onto
    // one core for EVERY iteration (census at sf0.1: the gradient
    // stage ran 1 task × 2.65 s) — fan out once before the loop
    // (measured gate, the bm25/minhash posture; gradient sums are
    // exact DECIMAL, so partitioning cannot move the result). When the
    // gate fires AND the loop runs more than one job, pin the
    // rebalanced frame: exchange reuse does not span jobs, so an
    // uncached repartition would re-shuffle the corpus every iteration.
    val rebalanced = skew.rebalanceUnderSplit(df)
    val pinned = (rebalanced ne df) && iters > 1
    val src = if (pinned) rebalanced.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else rebalanced
    try {
    for (_ <- 0 until iters) {
      val wLit = F.typedlit(w.toSeq)
      val toks = graft.functions.text.tokens(F.col(textCol))
      val mean = F.aggregate(toks, F.lit(0.0),
        (acc, t) => acc + F.element_at(wLit,
          (sampling.hashBucket(t, dim) + 1).cast(IntegerType))) /
        F.size(toks).cast(DoubleType)
      val p = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(b) + mean))), 6)
      // err6 = round(err·10⁶): exactly integer after the 6-digit round,
      // so the cast is value-preserving. The projection is a real
      // boundary (the mean fold is expensive and multiply-referenced,
      // so CollapseProject keeps it); inlining err into the per-token
      // lambda would re-run the whole fold once per token.
      val base = src.select(toks.as("_tc_toks"),
          F.size(toks).cast(LongType).as("_tc_n"),
          F.round((F.round(p - label.cast(DoubleType), 6)) * 1000000L)
            .cast(LongType).as("_tc_err6"))
        // per-token gradient in 10⁻¹⁸ units of err/n — exact integers
        // (|err6| ≤ 10⁶, ×10¹² < Long.MaxValue), constant per doc
        .withColumn("_tc_gtok",
          F.expr("_tc_err6 * 1000000000000 div _tc_n"))
      val entries = F.concat(
        F.array(
          F.struct(F.lit(-2).as("bucket"), F.lit(1L).cast(dec0).as("g")),
          F.struct(F.lit(-1).as("bucket"),
            F.col("_tc_err6").cast(dec0).as("g"))),
        F.transform(F.col("_tc_toks"), t => F.struct(
          sampling.hashBucket(t, dim).cast(IntegerType).as("bucket"),
          F.col("_tc_gtok").cast(dec0).as("g"))))
      val sums = base.select(F.explode(entries).as("e"))
        .groupBy(F.col("e.bucket").as("bucket"))
        .agg(F.sum(F.col("e.g")).as("gsum"))
        .collect()
        .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue()).toMap
      // empty corpus: no gradient rows at all — the model stays as-is
      // (the zero model on the first iteration) instead of crashing on
      // the missing doc-count bucket
      if (sums.isEmpty) return (w, b)
      val n = sums(-2)
      b = b - lr * (sums(-1) / 1.0e6 / n)
      w = w.zipWithIndex.map { case (wk, k) =>
        wk - lr * (sums.getOrElse(k, 0.0) / 1.0e18 / n) }
    }
    (w, b)
    } finally { if (pinned) { src.unpersist(blocking = false); () } }
  }
}
