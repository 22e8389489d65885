package graft.functions

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * scans the corpus once — the right plan when queries ≪ corpus; the
  * LSH variant buckets by random-hyperplane sign bits so each query only
  * scans its bucket — the scale path when both sides are large.
  * Dot products are computed with double accumulation in index order,
  * which is deterministic and matches a sequential oracle.
  */
object similarity {

  /** Sequential double-accumulation dot product via the codegen'd
    * [[graft.plans.ArrayDotProduct]] expression (sessions built by graft
    * register it through GraftExtensions). */
  def dot(a: Column, b: Column): Column = F.call_function("graft_dot", a, b)

  /** Portable fallback with identical semantics, built-ins only —
    * interpreted higher-order functions, ~5× slower in the hot path. */
  def dotPortable(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      F.lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = F.sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / norm(a) / norm(b)

  /** Exact top-k per query over a `(q_id, n_id, cos)` scored frame via
    * the bounded-heap aggregate [[graft.plans.BoundedTopK]] — the
    * scale-right replacement for `row_number().over(partitionBy(q_id))`:
    * the window must shuffle EVERY scored candidate to its query's task
    * and sort there, while the aggregate map-side-combines, so each
    * input task contributes at most k pairs per query to the one
    * shuffle, and no task ever sorts more than k kept elements per
    * group (past ObjectHashAggregate's fallback threshold of distinct
    * groups per task, the partial sorts its input BY GROUP KEY — the
    * k-bounded buffers and shuffle volume hold regardless). Exact and
    * deterministic: `(cos DESC, n_id ASC)` is a strict total order
    * evaluated in the score's own type (Double, or exact Decimal for
    * the BM25/RRF decimal scores), so ranks are identical to the
    * window plan an oracle replays with ROW_NUMBER — for non-null
    * scores. Null scores are EXCLUDED from the ranking (a window would
    * rank them last; no graft scorer produces null: dot/norm of
    * non-null vectors and DECIMAL term sums are always defined). */
  private[functions] def twoStageTopK(scored: DataFrame, k: Int): DataFrame = {
    // NaN guard: a NaN score (a NaN-component embedding survives the
    // norm as NaN; zero-norm vectors already become NULL via Spark's
    // null-on-zero-divisor division) would OUTRANK every real match —
    // double ordering puts NaN greatest — so a single corrupt vector
    // would own a top-k slot of every query. NULL scores are skipped by
    // the aggregate itself (see BoundedTopK); NaN must be dropped here.
    scored.filter(!F.isnan(F.col("cos")))
      .groupBy("q_id")
      .agg(F.call_function("graft_topk",
        F.col("cos"), F.col("n_id"), F.lit(k)).as("_tk"))
      .select(F.col("q_id"), F.posexplode(F.col("_tk")).as(Seq("_pos", "_s")))
      .select(F.col("q_id"), F.col("_s.id").as("n_id"),
        F.col("_s.score").as("cos"),
        (F.col("_pos") + 1).cast(LongType).as("rank"))
  }

  /** Brute-force cosine top-k: for every row of `queries`, the k nearest
    * rows of `corpus` (excluding self-matches by id), deterministic
    * tie-break by corpus id. Queries are broadcast; ranking is the
    * bounded [[twoStageTopK]], so no task ever sorts more than one
    * corpus partition's candidates. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(F.col(idCol).as("n_id"), F.col(vecCol).as("n_vec"),
      norm(F.col(vecCol)).as("n_nrm"))
    val q = queries.select(F.col(idCol).as("q_id"), F.col(vecCol).as("q_vec"),
      norm(F.col(vecCol)).as("q_nrm"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (dot(F.col("q_vec"), F.col("n_vec")) / F.col("q_nrm") / F.col("n_nrm")).as("cos"))
    twoStageTopK(scored, k)
  }

  /** The pinned hyperplane sign bank, SINGLE source of truth: true =
    * +1 for plane `j`, dimension `i` under `seed`. Every consumer
    * (literal planes in [[lshBucket]], the packed words of
    * [[packedPlaneSigns]], the generated x07 oracle SQL) derives its
    * signs from here, so the bank cannot drift between engine and
    * oracle. productHash is pinned deliberately: the bank must stay
    * bit-identical across Scala releases or every persisted LSH bucket
    * assignment silently shifts. */
  private[graft] def planeSignPositive(seed: Int, j: Int, i: Int): Boolean = {
    val h: Int = (scala.util.hashing.MurmurHash3.productHash((seed, j, i)): @scala.annotation.nowarn("cat=deprecation"))
    (h & 1) == 0
  }

  /** Random-hyperplane sign bucket: `nPlanes` sign bits of dot products
    * with deterministic ±1 hyperplanes (seeded, driver-computed,
    * [[planeSignPositive]]). Plane projections go through the codegen'd
    * graft_dot — identical double accumulation to the portable
    * zip_with/aggregate form, ~6× faster. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int, seed: Int = 42): Column = {
    require(nPlanes >= 0 && nPlanes <= 62, "similarity: nPlanes must be in [0, 62]")
    def planeSigns(j: Int): Seq[Double] =
      (0 until dim).map(i => if (planeSignPositive(seed, j, i)) 1.0 else -1.0)
    // nPlanes = 0 → one global bucket: the LSH machinery degenerates to
    // an exact scan, which lets an oracle prove the bucketed pipeline
    // end-to-end (x61), mirroring IVF's nprobe = nlist trick (x21)
    if (nPlanes == 0) F.lit(0L)
    else (0 until nPlanes).map { j =>
      val d = dot(vec, F.typedlit(planeSigns(j)))
      F.when(d >= 0, F.shiftleft(F.lit(1L), j)).otherwise(F.lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** IVF/LSH-bucketed ANN top-k: both sides bucketed by hyperplane signs;
    * each query is compared only against corpus vectors in its bucket.
    * One shuffle on the bucket key — the 100-TB-shaped plan. Recall is
    * tunable via nPlanes (fewer planes = bigger buckets = higher recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, nPlanes: Int = 8): DataFrame = {
    val c = corpus.select(F.col(idCol).as("n_id"), F.col(vecCol).as("n_vec"),
      norm(F.col(vecCol)).as("n_nrm"), lshBucket(F.col(vecCol), dim, nPlanes).as("bucket"))
    val q = queries.select(F.col(idCol).as("q_id"), F.col(vecCol).as("q_vec"),
      norm(F.col(vecCol)).as("q_nrm"), lshBucket(F.col(vecCol), dim, nPlanes).as("bucket"))
    val scored = c.join(q, "bucket")
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (dot(F.col("q_vec"), F.col("n_vec")) / F.col("q_nrm") / F.col("n_nrm")).as("cos"))
    twoStageTopK(scored, k)
  }

  /** Train IVF coarse-quantizer centroids with Lloyd iterations run as
    * Spark jobs over a deterministic hash sample — never a driver-side
    * loop over vectors. Scale shape: the corpus is filtered by a hash
    * range (no global sort), only the ≤ `sampleN`-row sample is ever
    * sorted (for deterministic seeding by smallest xxhash64(id)), each
    * iteration is one assignment pass (codegen'd
    * [[graft.plans.CentroidTopK]] against the broadcast-literal bank)
    * plus a per-dimension avg aggregated via posexplode — and only
    * nlist × dim aggregate rows ever reach the driver. Empty clusters
    * keep their previous centroid. Returns the flat bank (centroids ++
    * norms) for [[graft.plans.CentroidTopK]]. */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5, sampleN: Int = 20000,
      sampleOneIn: Long = 0L, portableSeed: Boolean = false): Array[Double] =
    bankOf(trainIvfCentroidArrays(corpus, idCol, vecCol, nlist, iters,
      sampleN, sampleOneIn, portableSeed))

  /** The flat [[graft.plans.CentroidTopK]] bank layout: centroid rows
    * concatenated, then the per-centroid L2 norms. */
  private[functions] def bankOf(cs: Array[Array[Double]]): Array[Double] =
    cs.flatten ++ cs.map(c => math.sqrt(c.map(x => x * x).sum))

  /** [[trainIvfCentroids]] returning the centroid ROWS (for operators
    * that need the vectors themselves, e.g. [[clusterEmbeddings]]'
    * per-cluster affinity join — driver-sized: nlist × dim doubles).
    * `portableSeed` orders the deterministic seeding by
    * `(md5(id), id)` instead of `(xxhash64(id), id)`: the same seeds
    * come back from ANY engine with md5 (the [[sampling]] posture), so
    * an iters = 0 assignment is exactly replayable in SQL — the x69
    * oracle gate. xxhash64 stays the default only because existing
    * persisted IVF layouts were seeded with it. */
  private[functions] def trainIvfCentroidArrays(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, sampleN: Int,
      sampleOneIn: Long, portableSeed: Boolean): Array[Array[Double]] = {
    require(nlist >= 1 && iters >= 0)
    // sampleOneIn > 0 skips the sizing count — at 100 TB pass the known
    // corpus-to-sample ratio instead of paying a full scan to learn it
    val keepOneIn =
      if (sampleOneIn > 0) sampleOneIn
      else math.max(1L, corpus.count() / math.max(1L, sampleN.toLong))
    val samp = corpus.select(F.col(idCol).as("id"),
        F.col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
      .filter(F.pmod(F.xxhash64(F.col("id")), F.lit(keepOneIn)) === 0)
      .persist()
    try {
      val seedOrd =
        if (portableSeed) Seq(F.md5(F.col("id").cast(StringType)).asc,
          F.col("id").asc)
        else Seq(F.xxhash64(F.col("id")).asc, F.col("id").asc)
      val init0 = samp.orderBy(seedOrd: _*).limit(nlist)
        .select("vec").collect().map(_.getSeq[Double](0).toArray)
      // empty corpus (an empty shard, a drained filter): no centroids —
      // bankOf(empty) is the empty bank, which CentroidTopK resolves to
      // an empty cell list, so every downstream consumer yields 0 rows
      if (init0.isEmpty) return Array.empty[Array[Double]]
      // ragged-sample hygiene (the trainPqCodebooksDim posture): a seed
      // of a different width would make the Lloyd mean lookup throw on
      // a cell it solely occupies; the trained dim is the first seed's
      val init = init0.filter(_.length == init0.head.length)
      val dim = init.head.length
      val lloydSamp = samp.filter(F.size(F.col("vec")) === dim)
      var cents: Array[Array[Double]] = init
      for (_ <- 0 until iters) {
        val bank = F.typedlit(bankOf(cents).toSeq)
        val assigned = lloydSamp.select(
          F.element_at(F.call_function("graft_centroid_topk",
            F.col("vec"), bank, F.lit(1)), 1).as("cell"),
          F.posexplode(F.col("vec")).as(Seq("pos", "x")))
        val means = assigned.groupBy("cell", "pos").agg(F.avg("x").as("m"))
          .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
        // cents.length, not nlist: a sample smaller than nlist trains
        // fewer (still valid) centroids
        cents = Array.tabulate(cents.length) { c =>
          if (means.contains((c, 0))) Array.tabulate(dim)(d => means((c, d)))
          else cents(c) // empty cluster: keep the old centroid
        }
      }
      cents
    } finally { samp.unpersist(blocking = false); () }
  }

  /** IVF ANN top-k: corpus vectors are assigned to their nearest
    * centroid cell ONCE (codegen'd argmax over the broadcast-literal
    * bank — no shuffle), queries probe their `nprobe` nearest cells, and
    * candidates meet in ONE equi-join on the cell id followed by exact
    * cosine rescoring through the bounded [[twoStageTopK]]. The
    * 100 TB shape: cell assignment is embarrassingly parallel, the only
    * shuffle is the cell join, and recall is tunable per-query via
    * nprobe with cost ∝ nprobe/nlist of the corpus scanned. With
    * nprobe = nlist every cell is probed and the result is EXACTLY
    * [[bruteForceTopK]] (the x21 oracle). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int = 64,
      nprobe: Int = 8, iters: Int = 5, sampleN: Int = 20000,
      sampleOneIn: Long = 0L): DataFrame = {
    val bank = F.typedlit(trainIvfCentroids(
      corpus, idCol, vecCol, nlist, iters, sampleN, sampleOneIn).toSeq)
    val c = corpus.select(F.col(idCol).as("n_id"), F.col(vecCol).as("n_vec"),
      norm(F.col(vecCol)).as("n_nrm"),
      F.element_at(F.call_function("graft_centroid_topk",
        F.col(vecCol), bank, F.lit(1)), 1).as("cell"))
    val q = queries.select(F.col(idCol).as("q_id"), F.col(vecCol).as("q_vec"),
      norm(F.col(vecCol)).as("q_nrm"),
      F.explode(F.call_function("graft_centroid_topk",
        F.col(vecCol), bank, F.lit(nprobe))).as("cell"))
    val scored = c.join(q, "cell")
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (dot(F.col("q_vec"), F.col("n_vec")) / F.col("q_nrm") / F.col("n_nrm")).as("cos"))
    twoStageTopK(scored, k)
  }

  /** The ±1 hyperplane sign bank for [[cosinePairsLsh]], bit-packed for
    * [[graft.plans.HyperplaneBuckets]]: layout `[table][plane][word]`,
    * bit i of word i>>6 set = +1 for vector element i. Signs use the
    * exact [[lshBucket]] formula with per-table seed `seed + 7919·t`. */
  private[graft] def packedPlaneSigns(dim: Int, nPlanes: Int, nTables: Int,
      seed: Int): Array[Long] = {
    val words = (dim + 63) >> 6
    val out = new Array[Long](nTables * nPlanes * words)
    for (t <- 0 until nTables; j <- 0 until nPlanes; i <- 0 until dim)
      if (planeSignPositive(seed + 7919 * t, j, i))
        out((t * nPlanes + j) * words + (i >> 6)) |= 1L << (i & 63)
    out
  }

  /** Embedding-cosine near-duplicate pairs with candidates from
    * hyperplane-LSH buckets, OR-amplified over `nTables` independent
    * tables of `nPlanes` sign bits each (AND within a table, OR across
    * tables — the standard LSH amplification). A pair at angle θ
    * collides in one table with p = (1-θ/π)^nPlanes and escapes all
    * tables with (1-p)^nTables: at cos ≥ 0.997 with 16 planes × 32
    * tables that is ~1e-16, so the LSH-fed result equals the all-pairs
    * exact scan on any realistic near-dup corpus (the oracle for
    * x05_dedup_embedding_cosine checks exactly that).
    *
    * Scale shape: the candidate stream that rides the ×nTables explode,
    * the (table, bucket) pairing shuffle and the candidate-dedup shuffle
    * carries only `(id, nrm)` — never the vector — and the plane bank is
    * a bit-packed array<bigint> (4 KiB at 32×16×64) evaluated by the
    * codegen'd [[graft.plans.HyperplaneBuckets]] in ONE pass per row,
    * not 512 inlined literal arrays. Vectors are joined back from the
    * source exactly once, for a single exact-cosine verification per
    * DISTINCT candidate pair. If `df` is expensive to recompute (it is
    * read once for buckets and once per verification side), persist it
    * before calling. */
  def cosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int, minCos: Double,
      nTables: Int = 1, seed: Int = 42): DataFrame = {
    require(nTables >= 1, "nTables must be >= 1")
    require(nPlanes >= 1 && nPlanes <= 63, "nPlanes must be in [1, 63]")
    val signs = F.typedlit(packedPlaneSigns(dim, nPlanes, nTables, seed).toSeq)
    val buckets = F.call_function("graft_hyperplane_buckets",
      F.col(vecCol), signs, F.lit(nPlanes))
    // an under-split input serializes the bucket/norm pass and both
    // verification scans — fan out once (no-op on multi-split inputs)
    val src = skew.rebalanceUnderSplit(df)
    // light stream: no vector payload on the explode or either shuffle
    val light = src.select(F.col(idCol).as("id"), norm(F.col(vecCol)).as("nrm"),
      F.posexplode(buckets).as(Seq("tbl", "bucket")))
    val cand = light.as("a").join(light.as("b"),
        F.col("a.tbl") === F.col("b.tbl") &&
          F.col("a.bucket") === F.col("b.bucket") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        F.col("a.nrm").as("nrm_a"), F.col("b.nrm").as("nrm_b"))
      .dropDuplicates("id_a", "id_b")
    val va = src.select(F.col(idCol).as("_ia"), F.col(vecCol).as("vec_a"))
    val vb = src.select(F.col(idCol).as("_ib"), F.col(vecCol).as("vec_b"))
    cand.join(va, F.col("id_a") === F.col("_ia"))
      .join(vb, F.col("id_b") === F.col("_ib"))
      .select(F.col("id_a"), F.col("id_b"),
        (dot(F.col("vec_a"), F.col("vec_b")) / F.col("nrm_a") / F.col("nrm_b")).as("cos"))
      .filter(F.col("cos") >= minCos)
  }

  /** L2-normalize an embedding to unit length (double arithmetic;
    * IEEE-exact, so it reproduces bit-for-bit in any engine). Codegen'd
    * single pass ([[graft.plans.UnitNormalizeExpr]]) — the `transform`
    * form re-inlines the captured norm into the lambda and recomputes
    * the full dot product per element when interpreted. */
  def l2Normalize(vec: Column): Column =
    F.call_function("graft_l2_normalize", vec)

  /** Built-ins-only form with identical semantics (cross-checked in
    * ExtensionsSpec; O(dim²) interpreted — not for hot paths). */
  private[graft] def l2NormalizePortable(vec: Column): Column = {
    val n = norm(vec)
    F.transform(vec, x => x.cast(DoubleType) / n)
  }

  /** Per-vector scalar int8 quantization: affine-map [min, max] onto
    * [-127, 127] with round-half-up (both engines round half away from
    * zero on the non-negative scaled operand, so outputs are exact
    * integers cross-engine). Degenerate constant vectors map to 0. The
    * standard 4× storage shrink before ANN indexing — elementwise,
    * shuffle-free, one codegen'd min/max + map pass
    * ([[graft.plans.Int8QuantizeExpr]]). */
  def quantizeInt8(vec: Column): Column =
    F.call_function("graft_quantize_int8", vec)

  /** Built-ins-only form with identical semantics (cross-checked in
    * ExtensionsSpec; recomputes array_min/array_max per element when
    * interpreted — not for hot paths). Non-finite policy matches the
    * native expression: range over finite elements only, NaN → null,
    * ±Infinity clamp to ±127. */
  private[graft] def quantizeInt8Portable(vec: Column): Column = {
    val finite = F.filter(vec.cast(ArrayType(DoubleType)),
      x => !F.isnan(x) && x =!= Double.PositiveInfinity &&
        x =!= Double.NegativeInfinity)
    val mn = F.array_min(finite)
    val mx = F.array_max(finite)
    F.transform(vec, x0 => {
      val x = x0.cast(DoubleType)
      F.when(F.isnan(x), F.lit(null))
        .when(x === Double.PositiveInfinity, F.lit(127))
        .when(x === Double.NegativeInfinity, F.lit(-127))
        .when(mx === mn, F.lit(0))
        .otherwise(F.round((x - mn) / (mx - mn) * 254, 0)
          .cast(IntegerType) - 127)
    })
  }

  /** Per-group embedding centroid affinity: for every row, the cosine
    * between its vector and its group's mean vector — the standard
    * mislabeled-document / domain-drift signal (low affinity = the
    * document doesn't look like its source). Returns
    * (id, group, centroid_cos).
    *
    * Scale shape: ONE shuffle — a groupBy on the group key whose `dim`
    * component sums combine map-side, so the exchange carries
    * #groups × dim doubles, not vectors. The per-group sums broadcast
    * back and the score is a per-row codegen'd fold. The 1/n centroid
    * scaling cancels inside the cosine (cos(v, S/n) = cos(v, S)), so the
    * score is computed against the SUM vector directly: with
    * integer-valued inputs (e.g. [[quantizeInt8]] codes) every
    * cross-row sum is exact integer arithmetic — order-independent and
    * engine-portable (oracled in x59). Float inputs work too, with the
    * usual reduction-order caveat on the last ulp.
    *
    * Width note: the aggregate carries `dim` buffer columns; past
    * `spark.sql.codegen.maxFields` (default 100) Spark plans that stage
    * without whole-stage codegen. Map-side partial aggregation — the
    * property that bounds the shuffle — is unaffected; for very wide
    * embeddings raise the conf or accept the interpreted agg stage. */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String, dim: Int): DataFrame = {
    require(dim >= 1, "similarity: dim must be >= 1")
    val v = F.col(vecCol)
    val sums = (0 until dim).map(j =>
      F.sum(F.element_at(v, j + 1).cast(DoubleType)).as(s"_co_s$j"))
    val cents = df.groupBy(groupCol).agg(sums.head, sums.tail: _*)
    val sumVec = F.array((0 until dim).map(j => F.col(s"_co_s$j")): _*)
    val cf = cents.select(F.col(groupCol), sumVec.as("_co_sum"))
    df.join(F.broadcast(cf), Seq(groupCol))
      .select(F.col(idCol), F.col(groupCol),
        F.round(cosine(F.transform(v, x => x.cast(DoubleType)),
          F.col("_co_sum")), 6).as("centroid_cos"))
  }

  /** SemDeDup-style semantic dedup (cluster-then-compare): k-means
    * cluster the embedding space with the IVF coarse quantizer
    * ([[trainIvfCentroids]] — Lloyd iterations as Spark jobs over a hash
    * sample), assign every row to its nearest centroid in one codegen
    * pass, find cosine ≥ `minCos` pairs WITHIN each cluster only,
    * resolve the pair graph into duplicate groups with
    * [[dedup.connectedComponents]], and keep the smallest id per group
    * (graft's uniform keep rule). Returns one row per input:
    * (id, component, kept).
    *
    * Scale shape: clustering replaces the corpus-wide quadratic scan
    * with per-cluster quadratic work — at balanced cells the pair stage
    * costs ~n²/nlist split across nlist independent buckets, and the
    * only wide exchanges are the cell-key self-join and the O(log n)
    * component rounds. nlist tunes the recall/cost trade exactly as in
    * the SemDeDup paper (dups straddling a cell boundary are missed;
    * raise nlist for cost, lower for recall). With `nlist = 1` the
    * result is provably the exact all-pairs semantic dedup — the x43
    * oracle gate. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, minCos: Double, iters: Int = 5, sampleN: Int = 20000,
      sampleOneIn: Long = 0L): DataFrame = {
    val bank = F.typedlit(trainIvfCentroids(
      df, idCol, vecCol, nlist, iters, sampleN, sampleOneIn).toSeq)
    val cells = df.select(F.col(idCol).as("id"), F.col(vecCol).as("vec"),
      F.element_at(F.call_function("graft_centroid_topk",
        F.col(vecCol), bank, F.lit(1)), 1).as("cell"))
    val pairs = cosinePairs(cells, "id", "vec", "cell", minCos)
      .select("id_a", "id_b")
    val comp = dedup.connectedComponents(pairs)
    val cid = F.coalesce(F.col("component"), F.col("id"))
    df.select(F.col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(F.col("id").as(idCol), cid.as("component"),
        (cid === F.col("id")).as("kept"))
  }

  /** First-class k-means document clustering over an embedding column —
    * the topic-map / mixture-design primitive (SemDeDup's quantizer
    * exposed as its own operator). Trains `nlist` centroids with Lloyd
    * iterations as Spark jobs ([[trainIvfCentroidArrays]]), assigns
    * every row to its nearest centroid by cosine in ONE codegen pass
    * against the broadcast-literal bank, and returns
    * `(idCol, cluster, cluster_cos)` — the cluster ordinal and the
    * row's cosine affinity to its own centroid (rounded to 6, the
    * mislabel/drift signal per cluster).
    *
    * Scale shape: training touches only the hash sample; assignment is
    * embarrassingly parallel (no shuffle — the bank rides the closure,
    * nlist × dim doubles); the affinity join broadcasts an
    * nlist-row centroid frame. With `iters = 0` and `portableSeed`
    * the assignment is a pure function of the input replayable in any
    * engine with md5 — the x69 oracle proves the full
    * train-seed/assign/affinity machinery end-to-end. */
  def clusterEmbeddings(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5, sampleN: Int = 20000,
      sampleOneIn: Long = 0L, portableSeed: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = trainIvfCentroidArrays(df, idCol, vecCol, nlist, iters,
      sampleN, sampleOneIn, portableSeed)
    val bank = F.typedlit(bankOf(cents).toSeq)
    val cdf = cents.zipWithIndex.map { case (c, i) =>
      (i, c.toSeq, math.sqrt(c.map(x => x * x).sum))
    }.toSeq.toDF("cluster", "_ce_c", "_ce_cnrm")
    df.select(F.col(idCol), F.col(vecCol).as("_ce_v"),
        F.element_at(F.call_function("graft_centroid_topk",
          F.col(vecCol), bank, F.lit(1)), 1).as("cluster"))
      .join(F.broadcast(cdf), Seq("cluster"))
      .select(F.col(idCol), F.col("cluster"),
        F.round(dot(F.col("_ce_v"), F.col("_ce_c"))
          / norm(F.col("_ce_v")) / F.col("_ce_cnrm"), 6).as("cluster_cos"))
  }

  /** Hard-negative mining for contrastive training data: for every
    * query row, the k most cosine-similar corpus rows with a DIFFERENT
    * `labelCol` value (the near-miss negatives that actually teach a
    * bi-encoder; same-label rows are the positives and are excluded,
    * as are id self-matches). Returns `(q_id, n_id, cos, rank)`,
    * deterministic tie-break by corpus id; null labels count as their
    * own class (null vs null is "same", excluded — null-safe
    * comparison, never null-propagating).
    *
    * Scale shape: identical to [[bruteForceTopK]] — the query set
    * (anchor batch) broadcasts, the corpus is scanned once with the
    * label filter fused map-side, and ranking is the bounded
    * [[twoStageTopK]]. For corpus-sized anchor sets, pre-bucket both
    * sides with [[clusterEmbeddings]] and mine within clusters. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(F.col(idCol).as("n_id"), F.col(vecCol).as("n_vec"),
      norm(F.col(vecCol)).as("n_nrm"), F.col(labelCol).as("_hn_nl"))
    val q = queries.select(F.col(idCol).as("q_id"), F.col(vecCol).as("q_vec"),
      norm(F.col(vecCol)).as("q_nrm"), F.col(labelCol).as("_hn_ql"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("n_id") =!= F.col("q_id") &&
        !(F.col("_hn_nl") <=> F.col("_hn_ql")))
      .select(F.col("q_id"), F.col("n_id"),
        (dot(F.col("q_vec"), F.col("n_vec")) / F.col("q_nrm") / F.col("n_nrm")).as("cos"))
    twoStageTopK(scored, k)
  }

  /** Cluster-balanced corpus subsampling: k-means the embedding space
    * ([[clusterEmbeddings]]) and temperature-sample over the CLUSTER as
    * the source key ([[sampling.temperatureSample]] — `p(c) ∝ n_c^alpha`,
    * alpha = 0 equalizes topics, alpha = 1 keeps natural proportions).
    * The topic-diversity counterweight to raw web proportions: boilerplate
    * mega-clusters are flattened toward the tail instead of dominating
    * the training mix. Returns the kept rows with a `cluster` column.
    *
    * Scale shape: centroid training on the hash sample, assignment
    * map-side against the broadcast-literal bank (no join — the cluster
    * id is computed directly on the full frame), then the temperature
    * filter is one literal CASE over nlist driver-computed exact-integer
    * thresholds: the corpus is scanned once and never shuffled. */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, alpha: Double, targetRows: Long, iters: Int = 5,
      sampleN: Int = 20000, sampleOneIn: Long = 0L,
      portableSeed: Boolean = false): DataFrame = {
    val cents = trainIvfCentroidArrays(df, idCol, vecCol, nlist, iters,
      sampleN, sampleOneIn, portableSeed)
    val bank = F.typedlit(bankOf(cents).toSeq)
    val assigned = df.withColumn("cluster",
      F.element_at(F.call_function("graft_centroid_topk",
        F.col(vecCol), bank, F.lit(1)), 1))
    sampling.temperatureSample(assigned, idCol, "cluster", alpha, targetRows)
  }

  /** Train product-quantization codebooks (the public PQ scheme of
    * Jégou et al., TPAMI 2011): the vector space is split into `m`
    * contiguous subspaces of dim/m components and each gets its own
    * `ksub`-codeword codebook, trained by Lloyd iterations over a
    * deterministic hash sample. Returns the flat bank consumed by
    * [[graft.plans.PqEncodeExpr]]/[[graft.plans.PqDistTableExpr]]:
    * entry ((s,c),d) at `(s*ksub + c)*dsub + d`.
    *
    * Scale/determinism posture mirrors [[trainIvfCentroidArrays]]: the
    * corpus is hash-FILTERED (never sorted) down to ≤ `sampleN` rows,
    * only the sample is ordered for seeding (`portableSeed` = the
    * md5 order any engine replays — with iters = 0 the codebooks are
    * therefore EXACTLY the first ksub sample vectors sliced per
    * subspace, the x109 oracle gate). Lloyd runs DRIVER-side over the
    * collected sample — bounded at sampleN × dim doubles (the same
    * driver-state class as the IVF centroid matrix; 20k × 64 ≈ 10 MB),
    * never over the corpus; codeword ties keep the smallest index and
    * empty cells keep their previous codeword, so training is
    * deterministic for a fixed sample. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 0, sampleN: Int = 20000,
      sampleOneIn: Long = 0L, portableSeed: Boolean = false): Array[Double] =
    trainPqCodebooksDim(corpus, idCol, vecCol, m, ksub, iters, sampleN,
      sampleOneIn, portableSeed)._1

  /** [[trainPqCodebooks]] plus the trained dimension (0 for an empty
    * corpus) — consumers use it to filter ragged rows out of the encode
    * and probe paths (`size(vec) === dim`, the hammingTopK hygiene): a
    * wrong-width vector has no defined code and must be excluded, not
    * crash generated code or read misaligned codewords. */
  private[functions] def trainPqCodebooksDim(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 0, sampleN: Int = 20000,
      sampleOneIn: Long = 0L, portableSeed: Boolean = false): (Array[Double], Int) = {
    require(m >= 1 && ksub >= 1 && iters >= 0)
    val keepOneIn =
      if (sampleOneIn > 0) sampleOneIn
      else math.max(1L, corpus.count() / math.max(1L, sampleN.toLong))
    val samp = corpus.select(F.col(idCol).as("id"),
        F.col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
      .filter(F.pmod(F.xxhash64(F.col("id")), F.lit(keepOneIn)) === 0)
    val seedOrd =
      if (portableSeed) Seq(F.md5(F.col("id").cast(StringType)).asc,
        F.col("id").asc)
      else Seq(F.xxhash64(F.col("id")).asc, F.col("id").asc)
    if (iters == 0) {
      // ragged rows in the SAMPLE would corrupt the bank layout (codes
      // read as (s*ksub+c)*dsub+d offsets): keep only seeds matching
      // the first seed's width — the trained dim. A corpus whose FIRST
      // md5-ordered seed is itself corrupt fails the m|dim require
      // below, loudly.
      val seeds0 = samp.orderBy(seedOrd: _*).limit(ksub)
        .select("vec").collect().map(_.getSeq[Double](0).toArray)
      if (seeds0.isEmpty) return (Array.empty[Double], 0)
      val seeds = seeds0.filter(_.length == seeds0.head.length)
      val dim = seeds.head.length
      require(dim % m == 0, s"trainPqCodebooks: m=$m must divide dim=$dim")
      val dsub = dim / m
      // fewer seeds than ksub (a tiny corpus) trains a smaller, still
      // valid codebook — consumers infer ksub from the bank length
      val kEff = seeds.length
      val out = new Array[Double](m * kEff * dsub)
      for (s <- 0 until m; c <- 0 until kEff; d <- 0 until dsub)
        out((s * kEff + c) * dsub + d) = seeds(c)(s * dsub + d)
      (out, dim)
    } else {
      // sample collected once (bounded); Lloyd per subspace on the driver
      val rows0 = samp.orderBy(seedOrd: _*).limit(math.max(sampleN, ksub))
        .select("vec").collect().map(_.getSeq[Double](0).toArray)
      if (rows0.isEmpty) return (Array.empty[Double], 0)
      // same ragged-sample hygiene as the iters = 0 branch
      val rows = rows0.filter(_.length == rows0.head.length)
      val dim = rows.head.length
      require(dim % m == 0, s"trainPqCodebooks: m=$m must divide dim=$dim")
      val dsub = dim / m
      val kEff = math.min(ksub, rows.length)
      val out = new Array[Double](m * kEff * dsub)
      for (s <- 0 until m) {
        var cents = Array.tabulate(kEff, dsub)((c, d) => rows(c)(s * dsub + d))
        for (_ <- 0 until iters) {
          val sums = Array.fill(kEff, dsub)(0.0)
          val counts = new Array[Long](kEff)
          rows.foreach { x =>
            var best = -1; var bestD = Double.PositiveInfinity
            for (c <- 0 until kEff) {
              var d2 = 0.0
              for (d <- 0 until dsub) {
                val diff = x(s * dsub + d) - cents(c)(d); d2 += diff * diff
              }
              if (d2 < bestD) { best = c; bestD = d2 }
            }
            if (best < 0) best = 0
            counts(best) += 1
            for (d <- 0 until dsub) sums(best)(d) += x(s * dsub + d)
          }
          cents = Array.tabulate(kEff, dsub)((c, d) =>
            if (counts(c) > 0) sums(c)(d) / counts(c) else cents(c)(d))
        }
        for (c <- 0 until kEff; d <- 0 until dsub)
          out((s * kEff + c) * dsub + d) = cents(c)(d)
      }
      (out, dim)
    }
  }

  /** Rows with a defined code under the trained geometry: non-null,
    * exactly `dim` wide. The shared ragged-row hygiene of every PQ /
    * Hamming path (a wrong-width vector must be excluded, not crash or
    * alias into someone else's codewords). */
  private[functions] def cleanDim(df: DataFrame, vecCol: String,
      dim: Int): DataFrame =
    df.filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === dim)

  /** PQ-compressed corpus: `(id, codes)` where codes is the m-int
    * [[graft.plans.PqEncodeExpr]] encoding against `cbFlat`. The
    * persisted form of a 100 TB ANN corpus — m bytes/ints per vector
    * instead of dim floats; encoding is embarrassingly parallel
    * (broadcast-literal codebook, no shuffle). Rows whose vector width
    * doesn't divide into m subspaces of the codebook's dsub get NULL
    * codes (the expression's ragged-row contract) — callers that need
    * them dropped filter `size(vec) === dim` first ([[cleanDim]]). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      cbFlat: Array[Double], m: Int): DataFrame =
    corpus.select(F.col(idCol).as("id"),
      F.call_function("graft_pq_encode", F.col(vecCol),
        F.typedlit(cbFlat.toSeq), F.lit(m)).as("codes"))

  /** PQ-ADC approximate top-k: codebooks trained on the corpus, corpus
    * encoded to m-int codes, and each query ranked against the CODES —
    * one [[graft.plans.PqDistTableExpr]] distance table per query, one
    * m-lookup [[graft.plans.PqAdcExpr]] sum per candidate — smallest
    * approximate squared-L2 wins, ties by id. The asymmetric-distance
    * PQ probe: the corpus is scanned as integers (m ints/row), never
    * as float vectors.
    *
    * Scale: encoding and scoring are map-side against broadcast
    * literals/queries; the only shuffle is [[twoStageTopK]]'s bounded
    * k-per-(query, task) aggregate. Unlike IVF at nprobe = nlist, the
    * ADC ranking is approximate BY CONSTRUCTION (quantization error),
    * so its oracle replays the whole machinery — seeding, codebooks,
    * encoding argmins, table sums — rather than comparing against
    * brute force; recall against brute force is asserted separately in
    * PqAnnSpec. Compose with IVF cells for the full IVF-PQ layout. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, m: Int, ksub: Int, k: Int,
      iters: Int = 0, sampleN: Int = 20000, sampleOneIn: Long = 0L,
      portableSeed: Boolean = false): DataFrame = {
    require(k >= 1)
    val (cb, dim) = trainPqCodebooksDim(corpus, idCol, vecCol, m, ksub,
      iters, sampleN, sampleOneIn, portableSeed)
    if (cb.isEmpty)
      return corpus.sparkSession.emptyDataFrame
        .select(F.lit(0L).as("q_id"), F.lit(0L).as("n_id"),
          F.lit(0.0).as("adc_dist"), F.lit(0L).as("rank"))
        .where(F.lit(false))
    val cbLit = F.typedlit(cb.toSeq)
    val enc = cleanDim(corpus, vecCol, dim).select(F.col(idCol).as("n_id"),
      F.call_function("graft_pq_encode", F.col(vecCol), cbLit, F.lit(m))
        .as("codes"))
    val qdt = cleanDim(queries, vecCol, dim).select(F.col(idCol).as("q_id"),
      F.call_function("graft_pq_dists", F.col(vecCol), cbLit, F.lit(m))
        .as("dt"))
    val scored = enc.crossJoin(F.broadcast(qdt))
      .filter(F.col("n_id") =!= F.col("q_id"))
      // negate: twoStageTopK keeps the LARGEST scores; smallest ADC
      // distance must win. -0.0 cannot arise into the output (dist is
      // re-negated below only for presentation)
      .select(F.col("q_id"), F.col("n_id"),
        (-F.call_function("graft_pq_adc", F.col("codes"), F.col("dt")))
          .as("cos"))
    twoStageTopK(scored, k)
      .select(F.col("q_id"), F.col("n_id"),
        (-F.col("cos")).as("adc_dist"), F.col("rank"))
  }

  /** The full IVF-PQ probe — the production billion-vector ANN layout:
    * IVF cells prune WHICH corpus rows are scanned (cost ∝
    * nprobe/nlist), PQ codes decide HOW each candidate is scored (m
    * table lookups on ints, never a float scan). Corpus rows carry
    * (cell, codes); queries explode to their nprobe nearest cells with
    * a precomputed ADC table; candidates meet in ONE cell equi-join
    * (the [[ivfTopK]] shape) and rank through the bounded
    * [[twoStageTopK]]. Codes quantize the RAW vectors against global
    * codebooks (not per-cell residuals), so with nprobe = nlist the
    * cell pruning is a no-op and the result is EXACTLY [[pqTopK]] —
    * the oracle gate (x110), same family as IVF's nprobe = nlist
    * trick; partial-nprobe recall is a spec property. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int, nprobe: Int,
      m: Int, ksub: Int, pqIters: Int = 0, ivfIters: Int = 2,
      sampleN: Int = 20000, sampleOneIn: Long = 0L,
      portableSeed: Boolean = false): DataFrame = {
    require(k >= 1 && nprobe >= 1)
    val cents = trainIvfCentroidArrays(corpus, idCol, vecCol, nlist,
      ivfIters, sampleN, sampleOneIn, portableSeed)
    val (cb, dim) = trainPqCodebooksDim(corpus, idCol, vecCol, m, ksub,
      pqIters, sampleN, sampleOneIn, portableSeed)
    if (cents.isEmpty || cb.isEmpty)
      return corpus.sparkSession.emptyDataFrame
        .select(F.lit(0L).as("q_id"), F.lit(0L).as("n_id"),
          F.lit(0.0).as("adc_dist"), F.lit(0L).as("rank"))
        .where(F.lit(false))
    val bank = F.typedlit(bankOf(cents).toSeq)
    val cbLit = F.typedlit(cb.toSeq)
    val enc = cleanDim(corpus, vecCol, dim).select(F.col(idCol).as("n_id"),
      F.element_at(F.call_function("graft_centroid_topk",
        F.col(vecCol), bank, F.lit(1)), 1).as("cell"),
      F.call_function("graft_pq_encode", F.col(vecCol), cbLit, F.lit(m))
        .as("codes"))
    val qs = cleanDim(queries, vecCol, dim).select(F.col(idCol).as("q_id"),
      F.explode(F.call_function("graft_centroid_topk",
        F.col(vecCol), bank, F.lit(nprobe))).as("cell"),
      F.call_function("graft_pq_dists", F.col(vecCol), cbLit, F.lit(m))
        .as("dt"))
    val scored = enc.join(F.broadcast(qs), "cell")
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (-F.call_function("graft_pq_adc", F.col("codes"), F.col("dt")))
          .as("cos"))
    twoStageTopK(scored, k)
      .select(F.col("q_id"), F.col("n_id"),
        (-F.col("cos")).as("adc_dist"), F.col("rank"))
  }

  /** ANN recall report — the eval harness every ANN deployment needs:
    * for each `nprobe` configuration, recall@k of the IVF probe against
    * the exact brute-force cosine top-k over the SAME corpus/queries.
    * Returns one row per configuration:
    * `(nprobe, hits, truth_n, recall)` where hits = |ivf@k ∩ exact@k|
    * over all queries, truth_n = |exact@k|, recall = hits / truth_n
    * (one exact integer division to double — engine-portable). At
    * nprobe ≥ nlist the probe IS brute force, so the report's last row
    * reads recall = 1.0 — a built-in self-check that the harness
    * itself is wired right.
    *
    * Scale shape: the ground truth is ONE brute-force pass (the honest,
    * unavoidable cost of measuring recall — sample the query set, not
    * the corpus, to bound it); centroids are trained ONCE and the
    * corpus is assigned ONCE, with the per-arm probes differing only in
    * the query-side explode width. Intermediates are persisted for the
    * duration of the call (this is an EAGER report — per-arm hit counts
    * are collected; driver state is #configurations longs). */
  def annRecallReport(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int,
      nprobes: Seq[Int], iters: Int = 5, sampleN: Int = 20000,
      sampleOneIn: Long = 0L, portableSeed: Boolean = false): DataFrame = {
    require(k >= 1 && nprobes.nonEmpty && nprobes.forall(_ >= 1))
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = trainIvfCentroidArrays(corpus, idCol, vecCol, nlist,
      iters, sampleN, sampleOneIn, portableSeed)
    if (cents.isEmpty)
      return Seq.empty[(Int, Long, Long, Double)]
        .toDF("nprobe", "hits", "truth_n", "recall")
    // ragged-row hygiene (the ivfPqTopK posture): a wrong-width vector
    // would derive cell ids from its own length and silently pollute
    // hits/truth_n — both frames are filtered to the trained width, so
    // the nprobe = nlist self-check row stays a true 1.0
    val corpusC = cleanDim(corpus, vecCol, cents.head.length)
    val queriesC = cleanDim(queries, vecCol, cents.head.length)
    val bank = F.typedlit(bankOf(cents).toSeq)
    val truth = bruteForceTopK(corpusC, queriesC, idCol, vecCol, k)
      .select("q_id", "n_id").persist()
    val c = corpusC.select(F.col(idCol).as("n_id"), F.col(vecCol).as("n_vec"),
      norm(F.col(vecCol)).as("n_nrm"),
      F.element_at(F.call_function("graft_centroid_topk",
        F.col(vecCol), bank, F.lit(1)), 1).as("cell")).persist()
    try {
      val truthN = truth.count()
      val rows = nprobes.map { p =>
        val q = queriesC.select(F.col(idCol).as("q_id"),
          F.col(vecCol).as("q_vec"), norm(F.col(vecCol)).as("q_nrm"),
          F.explode(F.call_function("graft_centroid_topk",
            F.col(vecCol), bank, F.lit(p))).as("cell"))
        val scored = c.join(q, "cell")
          .filter(F.col("n_id") =!= F.col("q_id"))
          .select(F.col("q_id"), F.col("n_id"),
            (dot(F.col("q_vec"), F.col("n_vec"))
              / F.col("q_nrm") / F.col("n_nrm")).as("cos"))
        val hits = twoStageTopK(scored, k).select("q_id", "n_id")
          .join(truth, Seq("q_id", "n_id")).count()
        (p, hits, truthN,
          if (truthN == 0L) 0.0 else hits.toDouble / truthN)
      }
      rows.toDF("nprobe", "hits", "truth_n", "recall")
    } finally {
      truth.unpersist(blocking = false)
      c.unpersist(blocking = false)
      ()
    }
  }

  /** Quantization-LADDER recall report — [[annRecallReport]]'s sibling
    * across STORAGE TIERS instead of probe widths: recall@k of every
    * ANN tier the library ships, at equal k over the same
    * corpus/queries, against exact float32 brute force. One row per
    * tier, `(tier, hits, truth_n, recall)`:
    *
    *  - `1_brute_f32` — the truth itself (recall = 1.0, the wired-in
    *    self-check that the harness compares like with like);
    *  - `2_int8` — [[int8TopK]]: 4× smaller, exact integer-dot rescore;
    *  - `3_ivfpq_global` / `4_ivfpq_residual` — [[ivfPqTopK]] /
    *    [[ivfPqResidualTopK]] at the SAME m/ksub/nlist/nprobe budget
    *    and the same IVF geometry, so the pair isolates what residual
    *    coding buys: identical candidate sets, different scoring.
    *    With TRAINED codebooks on clustered data residual ≥ global at
    *    equal budget (Jégou §IV-A — asserted with real Lloyd
    *    iterations in PqAnnSpec); with degenerate seed-only training
    *    on unstructured data both tiers sit at noise level and the gap
    *    is not meaningful — this report is how a deployment finds that
    *    out before committing to a layout;
    *  - `5_hamming_binary` — [[hammingTopK]]: 32× smaller sign-bit
    *    codes, the cheap prefilter tier.
    *
    * This is the table an ANN deployment reads before picking its
    * storage tier — storage cost per tier is static (32/8/m/m/1 bits
    * per dim ÷ by nothing), recall is what must be measured. Scale
    * shape: truth is ONE brute-force pass (sample the query set to
    * bound it); each tier is its operator's own bounded plan; hit
    * counting is k·|queries|-row joins. Eager like [[annRecallReport]]
    * (driver state = 5 longs). */
  def annLadderReport(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, nlist: Int,
      nprobe: Int, m: Int, ksub: Int, pqIters: Int = 0,
      ivfIters: Int = 0, sampleN: Int = 20000, sampleOneIn: Long = 0L,
      portableSeed: Boolean = false): DataFrame = {
    require(k >= 1 && dim >= 1 && nlist >= 1 && nprobe >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    val truth = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select("q_id", "n_id").persist()
    try {
      val truthN = truth.count()
      val tiers: Seq[(String, DataFrame)] = Seq(
        ("1_brute_f32", truth),
        ("2_int8", int8TopK(corpus, queries, idCol, vecCol, k)),
        ("3_ivfpq_global", ivfPqTopK(corpus, queries, idCol, vecCol, k,
          nlist, nprobe, m, ksub, pqIters, ivfIters, sampleN,
          sampleOneIn, portableSeed)),
        ("4_ivfpq_residual", ivfPqResidualTopK(corpus, queries, idCol,
          vecCol, k, nlist, nprobe, m, ksub, pqIters, ivfIters, sampleN,
          sampleOneIn, portableSeed)),
        ("5_hamming_binary", hammingTopK(corpus, queries, idCol, vecCol,
          k, dim)))
      val rows = tiers.map { case (tier, df) =>
        val hits = df.select("q_id", "n_id")
          .join(truth, Seq("q_id", "n_id")).count()
        (tier, hits, truthN,
          if (truthN == 0L) 0.0 else hits.toDouble / truthN)
      }
      rows.toDF("tier", "hits", "truth_n", "recall")
    } finally { truth.unpersist(blocking = false); () }
  }

  /** RESIDUAL IVF-PQ — the production billion-vector layout (Jégou et
    * al. TPAMI 2011 §IV-A: quantize the residual r = v − q₁(v), not the
    * raw vector): each corpus vector is assigned to its IVF cell, the
    * PQ codebooks are trained on (and codes computed from) the
    * residuals v − centroid(cell), and a query probing cell c scores
    * candidates with an ADC table built from ITS residual q − centroid(c)
    * — one table per (query, probed cell). Residuals concentrate near
    * the origin, so the same m × ksub code budget spends its codewords
    * on a much smaller ball than raw-vector quantization: materially
    * better recall at equal code size (asserted vs the global-codebook
    * [[ivfPqTopK]] in PqAnnSpec).
    *
    * Scale shape: identical to [[ivfPqTopK]] — assignment and encoding
    * are map-side against broadcast banks, the nlist-row centroid frame
    * broadcast-joins onto both sides, candidates meet in ONE cell
    * equi-join, ranking is the bounded [[twoStageTopK]]. The extra cost
    * over global codebooks is one vector subtraction per corpus row
    * (codegen'd graft_vec_sub) and nprobe distance tables per query
    * instead of one.
    *
    * Determinism/oracle: every step is the [[pqTopK]] replay machinery
    * plus exact double subtraction — with iters = 0 + `portableSeed` +
    * `sampleOneIn = 1` the centroid seeding, cell argmax, residuals,
    * codebook seeding (first ksub RESIDUAL vectors in md5 order),
    * encode argmins, per-(query, cell) tables and index-order ADC sums
    * all replay bit-strict in DuckDB (the x120 oracle — which also
    * replays the REAL nprobe < nlist pruning, since the probed cells
    * per query are themselves a deterministic ORDER BY ... LIMIT). */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int, nprobe: Int,
      m: Int, ksub: Int, pqIters: Int = 0, ivfIters: Int = 2,
      sampleN: Int = 20000, sampleOneIn: Long = 0L,
      portableSeed: Boolean = false): DataFrame = {
    require(k >= 1 && nprobe >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = trainIvfCentroidArrays(corpus, idCol, vecCol, nlist,
      ivfIters, sampleN, sampleOneIn, portableSeed)
    def emptyResult = corpus.sparkSession.emptyDataFrame
      .select(F.lit(0L).as("q_id"), F.lit(0L).as("n_id"),
        F.lit(0.0).as("adc_dist"), F.lit(0L).as("rank"))
      .where(F.lit(false))
    if (cents.isEmpty) return emptyResult
    val dim = cents.head.length
    val bank = F.typedlit(bankOf(cents).toSeq)
    // nlist × dim doubles: driver-sized by construction, broadcast-joined
    val cdf = F.broadcast(cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "_rc_cent"))
    // corpus residuals: one argmax + one subtraction per row, map-side
    val resid = cleanDim(corpus, vecCol, dim)
      .select(F.col(idCol).as("n_id"),
        F.col(vecCol).as("_rc_v"),
        F.element_at(F.call_function("graft_centroid_topk",
          F.col(vecCol), bank, F.lit(1)), 1).as("cell"))
      .join(cdf, "cell")
      .select(F.col("n_id"), F.col("cell"),
        F.call_function("graft_vec_sub", F.col("_rc_v"), F.col("_rc_cent"))
          .as("_rc_r"))
    // codebooks trained on the RESIDUALS (same sampling/seeding
    // machinery — the sample filter and md5 order key on the id column,
    // which the residual frame preserves)
    val (cb, _) = trainPqCodebooksDim(resid, "n_id", "_rc_r", m, ksub,
      pqIters, sampleN, sampleOneIn, portableSeed)
    if (cb.isEmpty) return emptyResult
    val cbLit = F.typedlit(cb.toSeq)
    val enc = resid.select(F.col("n_id"), F.col("cell"),
      F.call_function("graft_pq_encode", F.col("_rc_r"), cbLit, F.lit(m))
        .as("codes"))
    // queries: nprobe cells each, residualized against EACH probed
    // cell's centroid — the per-(query, cell) ADC table
    val qs = cleanDim(queries, vecCol, dim)
      .select(F.col(idCol).as("q_id"), F.col(vecCol).as("_rc_qv"),
        F.explode(F.call_function("graft_centroid_topk",
          F.col(vecCol), bank, F.lit(nprobe))).as("cell"))
      .join(cdf, "cell")
      .select(F.col("q_id"), F.col("cell"),
        F.call_function("graft_pq_dists",
          F.call_function("graft_vec_sub", F.col("_rc_qv"), F.col("_rc_cent")),
          cbLit, F.lit(m)).as("dt"))
    val scored = enc.join(F.broadcast(qs), "cell")
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (-F.call_function("graft_pq_adc", F.col("codes"), F.col("dt")))
          .as("cos"))
    twoStageTopK(scored, k)
      .select(F.col("q_id"), F.col("n_id"),
        (-F.col("cos")).as("adc_dist"), F.col("rank"))
  }

  /** INT8 quantized-rescore ANN top-k — the 4×-compression tier of the
    * quantization ladder (float32 → int8 → PQ → binary): both sides are
    * per-vector affine int8 codes ([[quantizeInt8]]) plus their (mn, mx)
    * range, and ranking is the cosine of the DEQUANTIZED vectors —
    * computed without ever materializing them. With â_i = mn_a +
    * (q_i + 127)·s_a and s = (mx − mn)/254, the dot expands to
    *
    *   dot(â, b̂) = n·mn_a·mn_b + mn_a·s_b·T_b + mn_b·s_a·T_a
    *             + s_a·s_b·D_ab
    *
    * where T = Σ(q_i + 127) and D_ab = Σ(q_a,i + 127)(q_b,i + 127) are
    * EXACT integer sums precomputed per vector (T, D_aa) or computed
    * per pair as ONE codegen'd graft_dot over small-integer-valued
    * doubles (D_ab) — the int8 trick: the pair loop is an integer dot,
    * the affine correction is four flops. Every term is exact integer
    * arithmetic or IEEE-deterministic double ops in a fixed
    * parenthesization, so the whole ranking replays bit-strict in any
    * engine (the x125 oracle). Non-finite vectors are excluded (their
    * quantized range is undefined); zero-range zero vectors rank as
    * NULL and are skipped. Output `(q_id, n_id, cos8, rank)`. */
  def int8TopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1)
    def prep(df: DataFrame, idAs: String, p: String): DataFrame = {
      val vd = F.transform(F.col(vecCol), _.cast(DoubleType))
      df.select(F.col(idCol).as(idAs), vd.as("_i8v"))
        .filter(!F.exists(F.col("_i8v"), x => F.isnan(x) ||
          x === F.lit(Double.PositiveInfinity) ||
          x === F.lit(Double.NegativeInfinity)))
        .select(F.col(idAs), F.col("_i8v"),
          quantizeInt8(F.col("_i8v")).as("_i8q"))
        // shifted codes as doubles: values in [0, 254] — exact — so the
        // codegen'd graft_dot computes the integer pair sum exactly
        .select(F.col(idAs),
          F.transform(F.col("_i8q"), c => (c + F.lit(127)).cast(DoubleType))
            .as(s"${p}sh"),
          F.size(F.col("_i8q")).cast(DoubleType).as(s"${p}n"),
          F.array_min(F.col("_i8v")).as(s"${p}mn"),
          ((F.array_max(F.col("_i8v")) - F.array_min(F.col("_i8v")))
            / F.lit(254.0)).as(s"${p}s"),
          F.aggregate(F.col("_i8q"), F.lit(0L),
            (a, x) => a + x + F.lit(127L)).cast(DoubleType).as(s"${p}t"))
    }
    // the expanded dequantized dot — FIXED left-associative shape, the
    // exact formula the oracle replays term by term
    def deqDot(an: Column, amn: Column, as_ : Column, at: Column,
        bmn: Column, bs: Column, bt: Column, dab: Column): Column =
      an * amn * bmn + amn * bs * bt + bmn * as_ * at + as_ * bs * dab
    val c = prep(corpus, "n_id", "a")
    val q = prep(queries, "q_id", "b")
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (deqDot(F.col("an"), F.col("amn"), F.col("as"), F.col("at"),
          F.col("bmn"), F.col("bs"), F.col("bt"),
          dot(F.col("ash"), F.col("bsh")))
          / F.sqrt(deqDot(F.col("an"), F.col("amn"), F.col("as"),
            F.col("at"), F.col("amn"), F.col("as"), F.col("at"),
            dot(F.col("ash"), F.col("ash"))))
          / F.sqrt(deqDot(F.col("bn"), F.col("bmn"), F.col("bs"),
            F.col("bt"), F.col("bmn"), F.col("bs"), F.col("bt"),
            dot(F.col("bsh"), F.col("bsh"))))).as("cos"))
    twoStageTopK(scored, k)
      .select(F.col("q_id"), F.col("n_id"),
        F.col("cos").as("cos8"), F.col("rank"))
  }

  /** Sign-bit binary quantization: a dim-float embedding becomes
    * ceil(dim/32) long words, bit i of word w set iff component
    * 32·w + i is strictly positive — 32× smaller than float32 and
    * Hamming-comparable with two instructions per word (xor +
    * popcount), the standard cheap prefilter in front of exact
    * rescoring. 32 bits per 64-bit word keeps every value (and every
    * xor of values) in [0, 2³²), so no engine's shift/xor sign or
    * overflow semantics are ever exercised — the codes replay
    * bit-identically in DuckDB. NULL components quantize to 0, like
    * non-positive values; NaN quantizes to 1, because Spark and DuckDB
    * BOTH order NaN above every real, so `NaN > 0` is true in each.
    * A NULL VECTOR yields a NULL code (there is nothing to quantize —
    * distinct from a vector OF nulls, whose components quantize to 0);
    * operators pre-filter NULL vectors ([[cleanDim]]), so the NULL
    * only surfaces to direct expression users. */
  def binaryQuantize(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"similarity: dim must be >= 1 (got $dim)")
    F.call_function("graft_binquant", vec, F.lit(0), F.lit(dim))
  }

  /** Built-ins-only form with identical semantics (cross-checked in
    * HammingSpec over NULL/NaN-component, NULL-vector, short and long
    * vectors) — the interpreted aggregate/transform chain evaluates
    * ~dim×32 lambda closures per row; the codegen'd
    * [[graft.plans.BinaryQuantizeExpr]] above does a word-at-a-time
    * loop. Not for hot paths. */
  private[graft] def binaryQuantizePortable(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"similarity: dim must be >= 1 (got $dim)")
    val words = (dim + 31) / 32
    // transform(NULL, ...) is NULL, matching the native form's
    // nullSafeEval NULL-vector contract with no extra branch
    F.transform(F.slice(F.sequence(F.lit(0), F.lit(words - 1)),
        F.when(vec.isNotNull, F.lit(1)), F.lit(words)), w =>
      F.aggregate(F.sequence(F.lit(0), F.lit(31)), F.lit(0L), (acc, i) => {
        val pos = w * 32 + i
        acc + F.when(pos < F.lit(dim) &&
            F.element_at(vec, pos + 1).cast(DoubleType) > F.lit(0d),
          F.call_function("shiftleft", F.lit(1L), i)).otherwise(F.lit(0L))
      }))
  }

  /** Hamming distance between two [[binaryQuantize]] codes: Σ popcount
    * of the per-word xor (codegen'd [[graft.plans.HammingDistExpr]] —
    * one xor + popcount per word). Unequal-length codes yield NULL. */
  def hamming(a: Column, b: Column): Column =
    F.call_function("graft_hamming", a, b)

  /** Built-ins-only form with identical semantics (cross-checked in
    * HammingSpec; interpreted lambda fold — not for hot paths). */
  private[graft] def hammingPortable(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => F.bit_count(x.bitwiseXOR(y)).cast(LongType)),
      F.lit(0L), (acc, d) => acc + d)

  /** Exact Hamming top-k over sign-bit codes: for every query row the k
    * corpus rows with the smallest code distance (ties by id). The
    * corpus is scanned once as codes — 2 longs per 64-float row —
    * against the broadcast query codes, and ranking is the k-bounded
    * [[twoStageTopK]] heap, so the one shuffle carries ≤ k pairs per
    * (task, query). Output `(q_id, n_id, hamming_dist, rank)`. */
  def hammingTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int): DataFrame = {
    requireIntegralId(corpus, idCol, "similarity.hammingTopK")
    requireIntegralId(queries, idCol, "similarity.hammingTopK")
    // NULL / wrong-size vectors are excluded, not ranked: they would
    // quantize to the all-zero code, whose distance to a sparse query
    // is tiny — one corrupt row would own a top-k slot of every such
    // query (the twoStageTopK NaN-guard hazard, in Hamming form)
    def clean(df: DataFrame) =
      df.filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === dim)
    val c = clean(corpus).select(F.col(idCol).cast(LongType).as("n_id"),
      binaryQuantize(F.col(vecCol), dim).as("n_code"))
    val q = clean(queries).select(F.col(idCol).cast(LongType).as("q_id"),
      binaryQuantize(F.col(vecCol), dim).as("q_code"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("n_id") =!= F.col("q_id"))
      .select(F.col("q_id"), F.col("n_id"),
        (-hamming(F.col("q_code"), F.col("n_code"))).cast(DoubleType).as("cos"))
    twoStageTopK(scored, k)
      .select(F.col("q_id"), F.col("n_id"),
        (-F.col("cos")).cast(LongType).as("hamming_dist"), F.col("rank"))
  }

  /** EXACT Hamming radius self-join by pigeonhole banding: every pair
    * of rows whose sign-bit codes differ in ≤ `radius` positions. The
    * bit positions are split into radius + 1 near-equal disjoint bands
    * (band j covers [⌊j·dim/b⌋, ⌊(j+1)·dim/b⌋)); two codes within the
    * radius differ in at most radius = b − 1 bands, so at least one
    * band matches verbatim — candidates are generated by ONE equi-join
    * on (band index, band bits) and verified with the true distance.
    * Unlike MinHash-LSH this misses nothing: the guarantee is the
    * pigeonhole principle, not probability.
    *
    * Scale: rows explode ×(radius+1), the join shuffles on the band
    * key, and selectivity comes from band width dim/(radius+1) — at
    * radius 5 over 64 bits each band carries ~10-11 bits, so random
    * codes land in ~2¹⁰ buckets per band. Skewed corpora (many
    * identical sign patterns) concentrate band buckets exactly like
    * LSH bands; the [[graft.functions.dedup]] ring-salt cap composes on
    * top if a corpus needs it. Output `(id_a, id_b, hamming_dist)`,
    * id_a < id_b. Rows with NULL or wrong-size vectors are excluded
    * (their sign pattern is undefined). */
  def hammingPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, radius: Int): DataFrame = {
    require(radius >= 0 && radius < dim,
      s"similarity: radius must be in [0, dim) (got $radius, dim $dim)")
    requireIntegralId(df, idCol, "similarity.hammingPairs")
    val b = radius + 1
    // band key = the band's sign bits packed 32-per-long, same
    // convention as the full code — integer equi-join keys (1-2 longs
    // per band at embedding dims), no string materialization; the
    // codegen'd slice form of [[graft.plans.BinaryQuantizeExpr]]
    def packBits(from: Int, until: Int): Column =
      F.call_function("graft_binquant", F.col(vecCol), F.lit(from), F.lit(until))
    val bands = F.array((0 until b).map { j =>
      packBits(j * dim / b, (j + 1) * dim / b)
    }: _*)
    val v = df
      .filter(F.col(vecCol).isNotNull && F.size(F.col(vecCol)) === dim)
      .select(F.col(idCol).cast(LongType).as("id"),
        binaryQuantize(F.col(vecCol), dim).as("code"),
        F.posexplode(bands).as(Seq("band", "bv")))
    v.as("a").join(v.as("b"),
        F.col("a.band") === F.col("b.band") && F.col("a.bv") === F.col("b.bv") &&
          F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        hamming(F.col("a.code"), F.col("b.code")).as("hamming_dist"))
      .filter(F.col("hamming_dist") <= radius)
      .distinct()
  }

  /** Guard for operators that `cast(idCol, LongType)` internally: a
    * string/UUID id would cast to NULL, every `n_id =!= q_id` filter
    * would then drop the row, and the call would return an EMPTY frame
    * instead of erroring — fail loudly at plan time instead. */
  private[functions] def requireIntegralId(df: DataFrame, idCol: String,
      op: String): Unit = {
    val dt = df.schema(df.schema.fieldIndex(idCol)).dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok,
      s"$op: id column '$idCol' must be an integral type " +
        s"(it is cast to BIGINT internally); got $dt — map string/UUID " +
        "ids to a surrogate key first (e.g. xxhash64)")
  }

  /** Embedding-cosine near-duplicate pairs within blocking buckets. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      bucketCol: String, minCos: Double): DataFrame = {
    // norms computed once per row, not once per pair; division order
    // (dot / nrm_a / nrm_b) matches the sequential oracle exactly
    val v = df.select(F.col(idCol).as("id"), F.col(bucketCol).as("bucket"),
      F.col(vecCol).as("vec"), norm(F.col(vecCol)).as("nrm"))
    v.as("a").join(v.as("b"),
        F.col("a.bucket") === F.col("b.bucket") && F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id_a"), F.col("b.id").as("id_b"),
        (dot(F.col("a.vec"), F.col("b.vec")) / F.col("a.nrm") / F.col("b.nrm")).as("cos"))
      .filter(F.col("cos") >= minCos)
  }
}
