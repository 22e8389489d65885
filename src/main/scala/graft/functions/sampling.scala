package graft.functions

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Reproducible sampling for training-data pipelines. Hash-based
  * selection (not RNG) so the sample is a pure function of the row key:
  * stable across runs, cluster sizes, partitionings, and engines —
  * exactly what dataset versioning needs at 100 TB.
  */
object sampling {

  /** md5-derived bucket in [0, mod) — portable to any engine with md5
    * (oracle: `CAST(concat('0x', substring(md5(x), 1, 8)) AS BIGINT)
    * % mod`). The single home of the 8-hex-digit hash core every
    * hash-keyed sampler/sharder/classifier shares. */
  def hashBucket(key: Column, mod: Long): Column =
    F.conv(F.substring(F.md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % mod

  /** The canonical 10000-bucket space used by the permille samplers. */
  def hashBucket(key: Column): Column = hashBucket(key, 10000L)

  /** Keep ~`permille`/10000 of rows, keyed by `key`. Deterministic and
    * engine-portable; complement of the sample is the exact remainder. */
  def hashSample(df: DataFrame, key: String, permille: Int): DataFrame =
    df.filter(hashBucket(F.col(key)) < permille)

  /** EXACTLY-n deterministic global sample: the n rows smallest by
    * (md5(key), key) — a pure function of the keys, so the same n rows
    * come back on any run, partitioning, cluster size, or engine
    * (md5 order is portable; an RNG or xxhash order is not), and the
    * hash makes membership ≈ uniform. The eval-set carve: "hold out
    * exactly 50k documents, reproducibly".
    *
    * Scale shape: a bare ORDER BY hash LIMIT n is a global sort of the
    * corpus; instead each input partition keeps its local n smallest
    * (partition-local row_number), and only ≤ n × partitions survivors
    * enter the single-task global ranking — the bounded two-stage
    * top-k posture ([[graft.functions.similarity]]'s ANN ranking). For
    * n × partitions too large for one task, cut first with
    * [[hashSample]] at ~10× the target rate, then exact-rank the
    * survivors. */
  def deterministicSample(df: DataFrame, key: String, n: Int): DataFrame = {
    require(n >= 1, s"deterministicSample: n must be >= 1 (got $n)")
    import org.apache.spark.sql.expressions.Window
    val h = F.md5(F.col(key).cast(StringType))
    val local = Window.partitionBy(F.col("_ds_pid"))
      .orderBy(F.col("_ds_h").asc, F.col(key).asc)
    val global = Window.orderBy(F.col("_ds_h").asc, F.col(key).asc)
    df.withColumn("_ds_h", h)
      .withColumn("_ds_pid", F.spark_partition_id())
      .withColumn("_ds_lr", F.row_number().over(local))
      .filter(F.col("_ds_lr") <= n)
      .withColumn("_ds_gr", F.row_number().over(global))
      .filter(F.col("_ds_gr") <= n)
      .drop("_ds_h", "_ds_pid", "_ds_lr", "_ds_gr")
  }

  /** Per-stratum hash sampling: different rates per value of `strataCol`
    * (e.g. downsample the dominant language, keep the rest). */
  def stratifiedHashSample(df: DataFrame, key: String, strataCol: String,
      rates: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = rates.foldLeft(F.lit(defaultPermille)) { case (acc, (v, p)) =>
      F.when(F.col(strataCol) === v, F.lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(F.col(key)) < rate)
  }

  /** Exact per-group document cap — crawl curation's "at most `cap`
    * pages per domain", deterministic and scale-safe. Order within a
    * group is hash order (bucket, then key): reproducible across runs
    * and engines, and ≈ random, so the kept subset is an unbiased
    * sample of the group.
    *
    * A plain `row_number().over(partitionBy(group))` ranks a hot domain
    * inside ONE task — billions of rows for a mega-domain at 100 TB.
    * Instead: pass 1 counts rows per (group, bucket) over 10000 hash
    * buckets and turns them into per-bucket base ranks (a window over
    * ≤ 10000 rows per group, joined back); pass 2 ranks only WITHIN
    * a bucket (~1/10000 of the group per task) and keeps a row iff
    * `base + rank ≤ cap`. Exact: (bucket, key) is a total order when
    * `key` is unique per row — REQUIRED for the determinism guarantee
    * (duplicate keys tie arbitrarily inside a bucket).
    *
    * The bases side holds ≤ min(cap, 10000) buckets per group — small
    * for a handful of groups, but web-scale group cardinality (every
    * registered domain) makes it corpus-shaped, so the join strategy is
    * left to AQE: broadcast when the filtered bases fit, shuffle keyed
    * on (group, bucket) otherwise. Join keys are null-safe — rows with
    * a NULL group (or key) form their own capped group, SQL GROUP BY
    * style, instead of silently vanishing. */
  def groupCapSample(df: DataFrame, key: String, groupCol: String,
      cap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap >= 0, "groupCapSample: cap must be non-negative")
    val withB = df.withColumn("_gc_bucket", hashBucket(F.col(key)))
    val bases = withB
      .groupBy(groupCol, "_gc_bucket")
      .agg(F.count(F.lit(1)).as("_gc_cnt"))
      .withColumn("_gc_base", F.coalesce(F.sum("_gc_cnt")
        .over(Window.partitionBy(groupCol).orderBy("_gc_bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), F.lit(0L)))
      // buckets entirely past the cap never rejoin the corpus
      .filter(F.col("_gc_base") < cap)
      .select(F.col(groupCol).as("_gc_grp"),
        F.col("_gc_bucket").as("_gc_bkt"), F.col("_gc_base"))
    val inBucket = Window.partitionBy(groupCol, "_gc_bucket")
      .orderBy(key)
    withB.join(bases,
        F.col(groupCol) <=> F.col("_gc_grp") &&
          F.col("_gc_bucket") <=> F.col("_gc_bkt"))
      .withColumn("_gc_rank", F.row_number().over(inBucket))
      .filter(F.col("_gc_base") + F.col("_gc_rank") <= cap)
      .drop("_gc_grp", "_gc_bkt", "_gc_bucket", "_gc_base", "_gc_rank")
  }

  /** Leakage-free dataset splitting: assign every row to a named split
    * by hashing its GROUP (domain, cluster id, …), so all rows of a
    * group — near-duplicates included — land in the same split and
    * can never straddle train/validation/test. `weights` are permille
    * cut points over the 10000-bucket hash space (e.g. 9800/100/100);
    * deterministic, engine-portable, shuffle-free (one codegen'd
    * expression). */
  def splitByGroup(df: DataFrame, groupCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum == 10000,
      "splitByGroup: weights must be non-negative permille-of-10000 summing to 10000")
    val b = hashBucket(F.col(groupCol))
    val cuts = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val expr = splits.zip(cuts).init.foldRight(
      F.lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
      F.when(b < hi, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Near-dup-leakage-free dataset splitting: the split group is the
    * CONNECTED COMPONENT of the near-duplicate graph
    * ([[dedup.jaccardPairsLsh]] at `minJ`, exact-Jaccard-verified), so
    * no family of near-duplicates — including exact re-crawls, which
    * sit at J = 1 — can straddle train/validation/test. This is the
    * leak [[splitByGroup]] on a metadata column (domain, source)
    * cannot see: a benchmark answer paraphrased across two sources
    * still lands wholly in ONE split. Documents with no near-dup
    * partner are singleton groups keyed by their own id. Cost shape at
    * 100 TB: one LSH banding pass + the large/small-star CC loop +
    * an id-keyed join of the (sparse — only docs that HAVE a partner)
    * component map back onto the corpus + the codegen'd permille hash;
    * the corpus is never collected or broadcast. */
  def leakageSafeSplits(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Int)], k: Int = 3, numPerm: Int = 64,
      bands: Int = 32, minJ: Double = 0.8,
      maxBucket: Int = 0): DataFrame = {
    val pairs = dedup.jaccardPairsLsh(df, idCol, textCol, k, numPerm,
      bands, minJ, maxBucket)
    val comps = dedup.connectedComponents(pairs)
      .select(F.col("id").as("_ls_id"), F.col("component").as("_ls_comp"))
    val grouped = df.join(comps, F.col(idCol) === F.col("_ls_id"), "left")
      .withColumn("_ls_grp", F.coalesce(F.col("_ls_comp"), F.col(idCol)))
      .drop("_ls_id", "_ls_comp")
    splitByGroup(grouped, "_ls_grp", splits).drop("_ls_grp")
  }

  /** Deterministic training-shard assignment: `shard` in [0, nShards)
    * and a `shard_order` sort key, both pure functions of (seed, row
    * key) — the final global shuffle before writing training shards.
    * Changing the seed is a fresh permutation; a given (seed, key)
    * lands in the same shard on any cluster size, partitioning, or
    * engine (md5-derived, like [[hashBucket]]). Shuffle-free: both
    * columns are codegen'd expressions. To materialize:
    * `.repartition(F.col("shard")).sortWithinPartitions("shard",
    * "shard_order")` then `write.partitionBy("shard")` — within-shard
    * order is the hash, i.e. a reproducible random shuffle of the
    * corpus (what sequence-packing and curriculum-free training want). */
  def shardAssign(df: DataFrame, key: String, nShards: Int,
      seed: Int = 0): DataFrame = {
    require(nShards >= 1, "shardAssign: nShards must be >= 1")
    val tagged = F.concat(F.lit(s"$seed:"), F.col(key).cast(StringType))
    df.withColumn("shard", hashBucket(tagged, nShards).cast(IntegerType))
      .withColumn("shard_order", F.md5(F.concat(F.lit("o:"), tagged)))
  }

  /** Temperature-flattened source mixing (the multilingual / DoReMi-ish
    * `p(s) ∝ n_s^alpha` rule): sample each source at a rate that makes
    * the kept corpus of ~`targetRows` rows follow the temperature
    * distribution — alpha = 1 keeps natural proportions, alpha = 0
    * equalizes sources, in between up-weights the tail. Rates are
    * clamped at 1 (a small source cannot be over-sampled; the kept
    * total then undershoots `targetRows`, the standard posture).
    *
    * Deterministic and engine-portable BY CONSTRUCTION: the only
    * floating-point step is `w_s = round(n_s^alpha · 1e6)` per source;
    * the keep rule `bucket · W · n_s < 10000 · targetRows · w_s` is
    * exact integer arithmetic with no division, so there is no rounding
    * boundary to disagree on. Scale shape: one count aggregation at
    * source cardinality; the per-source thresholds are computed exactly
    * (BigInt) on the driver — mixtures are specified over languages /
    * dumps / provenance classes, so source cardinality is driver-sized
    * by definition (for unbounded group counts use [[groupCapSample]] /
    * [[tokenBudgetSample]]) — and folded into ONE literal CASE filter:
    * the corpus is filtered map-side with no join and no extra
    * shuffle. */
  def temperatureSample(df: DataFrame, key: String, sourceCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha >= 0.0 && targetRows >= 0,
      "temperatureSample: alpha and targetRows must be non-negative")
    val stats = df.groupBy(sourceCol).agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => (r.get(0), r.getLong(1)))
    val w = stats.map { case (s, n) =>
      (s, n, math.round(math.pow(n.toDouble, alpha) * 1e6)) }
    val bigW = w.map(t => BigInt(t._3)).sum
    // bucket < (10000·T·w)/(W·n) over exact rationals ⇔
    // bucket < ceilDiv(10000·T·w, W·n); clamp to the full bucket space
    val thr: Seq[(Any, Long)] = w.map { case (s, n, ws) =>
      val c = BigInt(10000) * BigInt(targetRows) * BigInt(ws)
      val d = bigW * BigInt(n)
      (s, ((c + d - 1) / d).min(BigInt(10000)).toLong)
    }.toSeq
    val bucket = hashBucket(F.col(key))
    // per-source threshold via a MAP-literal lookup, not an N-branch
    // CASE: element_at evaluates `sourceCol` ONCE, where a when-chain
    // re-inlines it per branch (when-branches are invisible to codegen
    // subexpression elimination) — with a computed source key (e.g.
    // [[similarity.clusterBalancedSample]]'s nearest-centroid
    // assignment) the duplicated branches blow Janino's 64 KB method
    // limit and the whole filter stage silently runs interpreted. An
    // unseen source value looks up null → `bucket < null` is null →
    // filtered out, exactly like the old fold's `false` default.
    val nonNull = thr.filter(_._1 != null)
    val nullThr = thr.collectFirst { case (null, t) => t }
    val thrCol =
      if (nonNull.isEmpty) F.lit(null).cast(LongType)
      else F.element_at(
        F.map(nonNull.flatMap { case (s, t) => Seq(F.lit(s), F.lit(t)) }: _*),
        F.col(sourceCol))
    val keep = nullThr match {
      case Some(t) => F.when(F.col(sourceCol).isNull, bucket < t)
        .otherwise(bucket < thrCol)
      case None => bucket < thrCol
    }
    df.filter(keep)
  }

  /** Epoch-weighted mixture expansion: materialize a training mix whose
    * per-source weights may exceed 1 — weight 2.5 repeats every row of
    * that source twice and a deterministic 50% hash-slice a third time,
    * weight 0.25 keeps a 25% slice once. The fractional slice is
    * hash-keyed (not RNG): the same rows are the "extra epoch" on every
    * run, cluster size, and engine. Output gains an `epoch` column
    * (0-based copy ordinal) so downstream shuffles/shards can keep the
    * copies apart. Pure map-side work: a literal CASE weight, a
    * `sequence` + one explode — no join, no shuffle, no driver
    * statistics; output size is exactly Σ n_source · weight_source. */
  def epochExpand(df: DataFrame, key: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0 && w <= 1000.0),
      "epochExpand: weights must be in [0, 1000]")
    val w = weights.foldLeft(F.lit(defaultWeight)) { case (acc, (v, wt)) =>
      F.when(F.col(sourceCol) === v, F.lit(wt)).otherwise(acc)
    }
    val frac = w - F.floor(w)
    val extra = F.when(
      hashBucket(F.col(key), 1000000L).cast(DoubleType) < frac * 1e6,
      F.lit(1)).otherwise(F.lit(0))
    val n = F.floor(w).cast(IntegerType) + extra
    df.withColumn("_ep_n", n)
      .filter(F.col("_ep_n") > 0)
      .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_ep_n") - 1)))
      .drop("_ep_n")
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-unigram bag is under a
    * TARGET corpus' bag-of-words model than under the raw corpus' own —
    * the standard "find more data that looks like my curated set" move.
    *
    * [[dsirLogRatios6]] fits both models: token counts over `dim` hash
    * buckets ([[hashBucket]] — md5-derived, engine-portable), Laplace
    * smoothing, and per-bucket log-probability ratios in integer
    * micro-units (`round(ln((c+1)/(n+dim))·1e6)` per corpus, then an
    * EXACT Long subtraction) so document scores are integer sums with
    * no addition-order or accumulation divergence anywhere — only the
    * per-bucket `ln` itself touches floating point, at the established
    * 6-digit cross-engine grain. Scale shape: one map-side-combined
    * token-count aggregation per corpus (shuffle carries ≤ tasks × dim
    * partial rows); the driver holds 2 × dim Longs — the
    * [[quality.trainHashedClassifier]] posture. */
  def dsirLogRatios6(raw: DataFrame, target: DataFrame, textCol: String,
      dim: Int): Array[Long] = {
    require(dim >= 1, s"dsir: dim must be >= 1 (got $dim)")
    def counts(df: DataFrame): (Map[Int, Long], Long) = {
      val rows = df
        .select(F.explode(text.tokens(F.col(textCol))).as("_t"))
        .groupBy(hashBucket(F.col("_t"), dim).cast(IntegerType).as("b"))
        .agg(F.count(F.lit(1)).as("c"))
        .collect()
      val m = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
      (m, m.values.sum)
    }
    val (ct, nt) = counts(target)
    val (cr, nr) = counts(raw)
    def l6(c: Long, n: Long): Long =
      math.round(math.log((c + 1).toDouble / (n + dim).toDouble) * 1e6)
    Array.tabulate(dim)(b =>
      l6(ct.getOrElse(b, 0L), nt) - l6(cr.getOrElse(b, 0L), nr))
  }

  /** Per-document DSIR importance weight in 1e-6 log units: the Long
    * sum of the document's tokens' bucket log-ratios — one shuffle-free
    * codegen'd fold per row, ratios riding along as a plan literal. */
  def dsirWeight6(textC: Column, ratios6: Array[Long], dim: Int): Column = {
    require(ratios6.length == dim, "dsir: ratios6.length must equal dim")
    val r = F.typedlit(ratios6.toSeq)
    F.aggregate(text.tokens(textC), F.lit(0L),
      (acc, t) => acc +
        F.element_at(r, (hashBucket(t, dim) + 1).cast(IntegerType)))
  }

  /** Select the `n` raw documents most target-like by DSIR importance
    * weight (ties broken by id — fully deterministic). With
    * `gumbel = true` the selection is importance RESAMPLING as the
    * paper frames it — Gumbel-top-k over the log weights — with the
    * Gumbel noise hash-derived from (seed, id): `u = (bucket(id) +
    * 0.5)/1e6`, `g = -ln(-ln(u))`, integer micro-units again, so the
    * "randomness" is a pure function of the keys and replays in any
    * engine. Selection is a global top-n over a codegen'd scored scan
    * (TakeOrderedAndProject: per-partition bounded top-n, driver merges
    * n × partitions rows — no full sort, no corpus shuffle). Output
    * gains the `dsir_w6` score column. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int, dim: Int = 4096,
      gumbel: Boolean = false, seed: Int = 0): DataFrame = {
    require(n >= 1, s"dsir: n must be >= 1 (got $n)")
    val ratios = dsirLogRatios6(raw, target, textCol, dim)
    val w = dsirWeight6(F.col(textCol), ratios, dim)
    val score =
      if (!gumbel) w
      else {
        val u = (hashBucket(F.concat(F.lit(s"g$seed:"),
          F.col(idCol).cast(StringType)), 1000000L).cast(DoubleType)
          + 0.5) / 1e6
        w + F.round(-F.log(-F.log(u)) * 1e6).cast(LongType)
      }
    raw.withColumn("dsir_w6", score)
      .orderBy(F.col("dsir_w6").desc, F.col(idCol))
      .limit(n)
  }

  /** Token-budget corpus mixing: keep, per source, a deterministic
    * subset holding at most `budget(source)` whitespace tokens — training
    * mixtures are specified in tokens, not documents. Two-pass and
    * bucket-granular: documents land in one of 10000 hash buckets per
    * source, pass 1 aggregates per-(source, bucket) token sums (≤ 10000
    * rows per source — never corpus-sized, so the cumulative-sum window
    * over buckets is a tiny frame, not a per-source sort of the data),
    * and a document is kept iff its whole bucket's running total fits
    * the budget. Granularity is one bucket (~1/10000 of a source);
    * under- never over-shoots. The kept bucket list is broadcast back —
    * the corpus itself is filtered map-side. */
  def tokenBudgetSample(df: DataFrame, key: String, textCol: String,
      sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withB = df.withColumn("_tb_bucket", hashBucket(F.col(key)))
    val budget = budgets.foldLeft(F.lit(defaultBudget)) { case (acc, (s, v)) =>
      F.when(F.col(sourceCol) === s, F.lit(v)).otherwise(acc)
    }
    val kept = withB
      .groupBy(sourceCol, "_tb_bucket")
      .agg(F.sum(text.tokenCount(F.col(textCol))).as("_tb_toks"))
      .withColumn("_tb_cum", F.sum("_tb_toks")
        .over(Window.partitionBy(sourceCol).orderBy("_tb_bucket")))
      .filter(F.col("_tb_cum") <= budget)
      .select(F.col(sourceCol), F.col("_tb_bucket"))
    withB.join(F.broadcast(kept), Seq(sourceCol, "_tb_bucket"))
      .drop("_tb_bucket")
  }

  /** The Efraimidis–Spirakis race key −ln(u)/w over the md5-derived
    * 52-bit uniform (u = (h+1)/2^52 is bit-exact in any engine with
    * md5: a mantissa-sized integer over a power of two). Smallest key
    * wins; shared by [[weightedSample]]/[[weightedSampleByGroup]]. */
  private[graft] def esKey(key: String, weightCol: String): Column = {
    val h = F.conv(F.substring(F.md5(F.col(key).cast(StringType)), 1, 13),
      16, 10).cast(LongType)
    val u = (h + 1).cast(DoubleType) / F.lit(4503599627370496.0) // 2^52
    -F.log(u) / F.col(weightCol).cast(DoubleType)
  }

  /** WEIGHTED sampling without replacement — n rows where a row's
    * inclusion odds are proportional to `weightCol` (e.g. sample
    * documents by token count so the sample's token mass mirrors the
    * corpus). The public Efraimidis–Spirakis exponential-race scheme
    * (IPL 2006): each row draws key = −ln(u)/w and the n SMALLEST keys
    * win, which is distributionally identical to sequential
    * weighted draws without replacement.
    *
    * Determinism/portability: u is not RNG but md5-derived — the first
    * 13 hex digits (52 bits, exactly a double mantissa) of md5(key),
    * so u = (h+1)/2^52 ∈ (0,1] is bit-exact in any engine with md5:
    * the integer fits the mantissa and the divisor is a power of two,
    * so no rounding occurs before the single ln. An oracle replays the
    * selection with `ORDER BY -ln((CAST(concat('0x', substring(md5(x),
    * 1, 13)) AS BIGINT) + 1) / 4503599627370496.0) / w LIMIT n`.
    *
    * Scale: the same no-global-sort shape as [[deterministicSample]] —
    * partition-local top-n (a bounded per-partition window), then a
    * global rank over the ≤ n·partitions survivors; the full corpus is
    * never sorted or shuffled whole. Rows with NULL or non-positive
    * weight are excluded (their inclusion probability is 0; −ln(u)/w
    * would be negative or undefined). */
  def weightedSample(df: DataFrame, key: String, weightCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"weightedSample: n must be >= 1 (got $n)")
    import org.apache.spark.sql.expressions.Window
    val es = esKey(key, weightCol)
    val local = Window.partitionBy(F.col("_ws_pid"))
      .orderBy(F.col("_ws_k").asc, F.col(key).asc)
    val global = Window.orderBy(F.col("_ws_k").asc, F.col(key).asc)
    df.filter(F.col(weightCol).isNotNull && F.col(weightCol) > 0)
      .withColumn("_ws_k", es)
      .withColumn("_ws_pid", F.spark_partition_id())
      .withColumn("_ws_lr", F.row_number().over(local))
      .filter(F.col("_ws_lr") <= n)
      .withColumn("_ws_gr", F.row_number().over(global))
      .filter(F.col("_ws_gr") <= n)
      .drop("_ws_k", "_ws_pid", "_ws_lr", "_ws_gr")
  }

  /** [[weightedSample]] per group: `nPerGroup` rows from every value of
    * `groupCol`, inclusion odds ∝ `weightCol` within the group — the
    * per-source/per-language carve (an eval set of 1 000 docs per
    * language, sampled by token mass) done in one pass.
    *
    * Scale: ONE shuffle on the group key; the `row_number ≤ n` filter
    * compiles to Spark's WindowGroupLimit with a PARTIAL pre-shuffle
    * phase, so each map partition ships at most nPerGroup rows per
    * group — a mega-group never crosses the wire whole (the
    * editDistancePairs block-cap plan shape, asserted in
    * WeightedSampleSpec). Null-group rows form their own group, the
    * usual window convention; null/non-positive weights are excluded. */
  /** [[weightedSampleByGroup]]'s ranked core: eligible rows with their
    * per-group race rank in `_wg_rn`, capped at the LITERAL `nPerGroup`
    * so the filter compiles to the map-side WindowGroupLimit. Kept
    * separate so [[weightedSampleQuota]] can reuse the rank instead of
    * paying a second window. */
  private def rankedByGroup(df: DataFrame, key: String, weightCol: String,
      groupCol: String, nPerGroup: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.filter(F.col(weightCol).isNotNull && F.col(weightCol) > 0)
      .withColumn("_wg_k", esKey(key, weightCol))
      .withColumn("_wg_rn", F.row_number().over(
        Window.partitionBy(groupCol)
          .orderBy(F.col("_wg_k").asc, F.col(key).asc)))
      .filter(F.col("_wg_rn") <= nPerGroup)
      .drop("_wg_k")
  }

  def weightedSampleByGroup(df: DataFrame, key: String, weightCol: String,
      groupCol: String, nPerGroup: Int): DataFrame = {
    require(nPerGroup >= 1,
      s"weightedSampleByGroup: nPerGroup must be >= 1 (got $nPerGroup)")
    rankedByGroup(df, key, weightCol, groupCol, nPerGroup).drop("_wg_rn")
  }

  /** Exact-total stratified carve: sample EXACTLY `total` rows overall
    * (fewer only if a stratum runs dry), allocated across the values of
    * `groupCol` in proportion to each group's total `weightCol` mass by
    * the largest-remainder (Hamilton) method, then drawn within each
    * group by the same deterministic Efraimidis–Spirakis race as
    * [[weightedSample]]. "500k eval documents, split across languages
    * by token mass, exact to the row" in one call.
    *
    * Exactness: quotas are computed in exact decimal arithmetic —
    * floor((mass_g × total) div M) and its remainder over
    * DECIMAL(38,12) masses (integer weights stay integers; fractional
    * weights are honored to 12 fractional digits; a 100 TB corpus's
    * token mass times any total stays under 10²⁶ where int64 would
    * overflow), ties broken by group value — so the allocation replays
    * bit-identically in any engine with exact decimal division. ⌊·⌋
    * quotas sum to ≤ total and the deficit is < #groups, so topping up
    * the largest remainders lands the sum EXACTLY on `total`. A group
    * smaller than its quota contributes everything it has and the
    * shortfall is NOT redistributed (re-running Hamilton on the
    * residue would change every group's draw; callers who need
    * backfill can re-carve the complement).
    *
    * Scale: one corpus-grain aggregate for the masses (#groups rows
    * out), one corpus-grain group window whose FIXED `total` cap
    * compiles to the map-side WindowGroupLimit (so ≤ total rows per
    * group per map partition cross the wire), then the per-group
    * quota — a column, which WindowGroupLimit cannot cap by — is
    * applied by re-ranking the ≤ total×#groups survivors against the
    * broadcast quota table. The variable-limit filter touches only the
    * tiny intermediate, never the corpus. */
  def weightedSampleQuota(df: DataFrame, key: String, weightCol: String,
      groupCol: String, total: Int): DataFrame = {
    require(total >= 1,
      s"weightedSampleQuota: total must be >= 1 (got $total)")
    import org.apache.spark.sql.expressions.Window
    val w = F.col(weightCol)
    val elig = df.filter(w.isNotNull && w > 0)
    // scale 12 honors fractional weights (weightedSample's contract is
    // double weights) while staying exact BigDecimal arithmetic; the
    // div/% pair below is exact integer floor/remainder at any scale
    val masses = elig.groupBy(F.col(groupCol).as("_qg"))
      .agg(F.sum(w.cast(DecimalType(38, 12))).as("_m"))
    val all = Window.partitionBy() // #groups rows: one tiny partition
    val byRem = Window.partitionBy()
      .orderBy(F.col("_rem").desc, F.col("_qg").asc)
    val quotas = masses
      // the product must KEEP scale 12: DECIMAL(38,12) × DECIMAL(10,0)
      // would need precision 49, so Spark rescales the result to
      // DECIMAL(38,6) — silently ROUNDING weights with >6 fractional
      // digits, which can flip a floor quota or the remainder order vs
      // the exact-decimal contract. DECIMAL(27,12) × DECIMAL(10,0) fits
      // precision 38 exactly, so scale 12 survives. The narrower mass
      // cast caps |Σw| per group at 10¹⁵ — a 100 TB corpus's token mass
      // is ~10¹⁴, comfortably inside; a mass beyond it overflows to
      // NULL (ANSI off), which would silently carve the group a quota
      // of 0 — FAIL FAST instead: every eligible group has a non-null
      // positive mass, so a null product can only be the overflow.
      .withColumn("_prod",
        F.when((F.col("_m").cast(DecimalType(27, 12)) *
            F.lit(total).cast(DecimalType(10, 0))).isNotNull,
          F.col("_m").cast(DecimalType(27, 12)) *
            F.lit(total).cast(DecimalType(10, 0)))
        .otherwise(F.raise_error(F.concat(
          F.lit("weightedSampleQuota: group weight mass exceeds the " +
            "exact DECIMAL(27,12) range (>= 1e15) for group "),
          F.col("_qg").cast(StringType),
          F.lit(" — rescale the weight column (quotas are " +
            "scale-invariant) and retry")))))
      .withColumn("_M", F.sum("_m").over(all))
      // sub-10⁻¹² weights can round a group's mass (even the whole
      // corpus's) to 0 — degrade to "no quota" rather than divide-by-0
      .filter(F.col("_M") > 0)
      .withColumn("_fl", F.expr("_prod div _M"))
      .withColumn("_rem", F.expr("_prod % _M"))
      .withColumn("_deficit", F.lit(total.toLong) - F.sum("_fl").over(all))
      .withColumn("_rr", F.row_number().over(byRem))
      .select(F.col("_qg"), (F.col("_fl") +
        F.when(F.col("_rr") <= F.col("_deficit"), 1L).otherwise(0L)).as("_n"))
    // phase 1: fixed-limit ranked pass — no group needs more than
    // `total` rows, and the literal cap is what lets WindowGroupLimit
    // bound the shuffle. phase 2 applies the per-group quota column to
    // the already-computed ranks of the ≤ total×#groups survivors.
    rankedByGroup(elig, key, weightCol, groupCol, total)
      .join(F.broadcast(quotas), F.col(groupCol) <=> F.col("_qg"))
      .filter(F.col("_wg_rn") <= F.col("_n"))
      .drop("_qg", "_n", "_wg_rn")
  }
}
