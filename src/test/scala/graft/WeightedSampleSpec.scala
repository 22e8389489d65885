package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.sampling

/** [[graft.functions.sampling.weightedSample]] — Efraimidis–Spirakis
  * weighted sampling without replacement over deterministic md5 draws:
  * equivalence to the brute-force global sort, weight monotonicity,
  * hygiene on degenerate weights, and partitioning invariance. */
class WeightedSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()

  /** the ES key exactly as the operator computes it */
  private def esKey(key: String, w: String) = {
    val h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 13),
      16, 10).cast("long")
    -F.log((h + 1).cast("double") / F.lit(4503599627370496.0)) /
      F.col(w).cast("double")
  }

  test("equals the brute-force global ORDER BY key LIMIT n") {
    val got = sampling.weightedSample(docs, "doc_id", "n_chars", 150)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.filter(F.col("n_chars") > 0)
      .withColumn("_k", esKey("doc_id", "n_chars"))
      .orderBy(F.col("_k").asc, F.col("doc_id").asc)
      .limit(150).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"selection diverges from the global sort " +
      s"(sym diff ${(got -- want) ++ (want -- got)})")
  }

  test("partitioning does not change the sample") {
    val a = sampling.weightedSample(docs.repartition(17), "doc_id", "n_chars", 80)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = sampling.weightedSample(docs.coalesce(1), "doc_id", "n_chars", 80)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("weights drive inclusion odds: the heavy stratum dominates") {
    import spark.implicits._
    // 1000 rows, half weight 9, half weight 1 — a 200-row sample should
    // hold ~9x more heavy rows than light (deterministic given md5;
    // binomial fluctuation bounds are loose on purpose)
    val df = (0L until 1000L)
      .map(i => (i, if (i % 2 == 0) 9L else 1L)).toDF("id", "w")
    val sample = sampling.weightedSample(df, "id", "w", 200).collect()
    val heavy = sample.count(_.getLong(1) == 9L)
    assert(heavy > 140 && heavy < 200,
      s"heavy stratum got $heavy of 200 — expected ~90% under 9:1 weights")
    // a single overwhelming weight is effectively always selected
    val spiked = df.union(Seq((100000L, 1000000000L)).toDF("id", "w"))
    val top = sampling.weightedSample(spiked, "id", "w", 5)
      .collect().map(_.getLong(0)).toSet
    assert(top.contains(100000L), "the 1e9-weight row must be sampled")
  }

  test("per-group sampling: n per group, brute-force agreement, map-side cap plan") {
    val got = sampling.weightedSampleByGroup(docs, "doc_id", "n_chars",
      "source", 25)
    val bySource = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.filter(F.col("n_chars") > 0).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(bySource(src) == math.min(25L, n), s"$src: got ${bySource(src)}")
    }
    // equals the per-group brute-force window
    import org.apache.spark.sql.expressions.Window
    val want = docs.filter(F.col("n_chars") > 0)
      .withColumn("_k", esKey("doc_id", "n_chars"))
      .withColumn("_rn", F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("_k").asc, F.col("doc_id").asc)))
      .filter(F.col("_rn") <= 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == want)
    // the rank filter must compile to the map-side-capped WindowGroupLimit
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a WindowGroupLimit partial phase in:\n$plan")
  }

  test("quota sampling: Hamilton allocation exact, total exact, saturation not redistributed") {
    val got = sampling.weightedSampleQuota(docs, "doc_id", "n_chars",
      "source", 137)
    assert(got.count() == 137, "no stratum is dry, so the total is exact")
    // per-group counts must equal the largest-remainder allocation
    // recomputed independently with BigInt arithmetic
    val masses = docs.filter(F.col("n_chars") > 0)
      .groupBy("source").agg(F.sum("n_chars").as("m")).collect()
      .map(r => r.getString(0) -> BigInt(r.getLong(1))).toMap
    val mm = masses.values.sum
    val fl = masses.map { case (g, m) => g -> (m * 137 / mm) }
    val deficit = (137 - fl.values.sum).toInt
    val topped = masses.toSeq
      .map { case (g, m) => (g, m * 137 % mm) }
      .sortBy { case (g, r) => (-r, g) }.take(deficit).map(_._1).toSet
    val want = fl.map { case (g, f) =>
      g -> (f + (if (topped(g)) 1 else 0)).toLong }
    val byGroup = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == want.filter(_._2 > 0L))
    // WITHIN each group the draw is the same race as the per-group
    // sampler, so the quota sample is a prefix of it
    val perGroup = sampling.weightedSampleByGroup(docs, "doc_id", "n_chars",
      "source", 137).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.select("doc_id").collect().map(_.getLong(0))
      .foreach(id => assert(perGroup.contains(id)))
    // saturation: one two-row group with overwhelming mass gets capped
    // at its size; the shortfall is NOT redistributed
    import spark.implicits._
    val skewed = Seq(
      (1L, "tiny", 1000000L), (2L, "tiny", 1000000L),
      (3L, "big", 1L), (4L, "big", 1L), (5L, "big", 1L),
      (6L, "big", 1L), (7L, "big", 1L), (8L, "big", 1L))
      .toDF("id", "grp", "w")
    val sk = sampling.weightedSampleQuota(skewed, "id", "w", "grp", 6)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tiny's quota is ~6 but it only has 2 rows; big keeps its own
    // quota (0 after flooring+remainder — mass share ~3e-6), so the
    // result undershoots the total instead of silently re-carving
    assert(sk.getOrElse("tiny", 0L) == 2L, sk.toString)
    assert(sk.values.sum < 6, s"shortfall must not be redistributed: $sk")
  }

  test("quota sampling honors fractional double weights") {
    import spark.implicits._
    // group f's mass is 4 x 0.25 = 1.0, group t's is 4 x 0.75 = 3.0:
    // Hamilton on total 4 must allocate 1 and 3 — truncating the
    // fractional weights to integers would give 0/4 (or all-zero mass)
    val df = ((1L to 4L).map(i => (i, "f", 0.25)) ++
      (5L to 8L).map(i => (i, "t", 0.75))).toDF("id", "grp", "w")
    val got = sampling.weightedSampleQuota(df, "id", "w", "grp", 4)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("f" -> 1L, "t" -> 3L), got.toString)
    // sub-10^-12 weights round to zero mass: degrade to empty, not a
    // divide-by-null wipeout of unrelated behavior
    val tiny = Seq((1L, "g", 1e-14), (2L, "g", 2e-14)).toDF("id", "grp", "w")
    assert(sampling.weightedSampleQuota(tiny, "id", "w", "grp", 1).count() == 0)
  }

  test("quota sampling keeps 12 fractional digits through the product (round-10 fix)") {
    import spark.implicits._
    // weights of 2^-12 = 0.000244140625 (exactly 12 fractional decimal
    // digits, dyadic so the double and the DECIMAL(38,12) cast are both
    // exact). Group a: 1 row, group b: 3 rows, total 2. Exact Hamilton:
    // fl_a = 0, fl_b = 1, and the remainders TIE (2·1 ≡ 2·3 mod 4), so
    // the group-value tie-break gives 'a' the top-up → (a:1, b:1).
    // The pre-fix DECIMAL(38,6)-rescaled product perturbed the tied
    // remainders unevenly (ε_a < 0 < ε_b) and flipped the top-up to b
    // → (a:0, b:2).
    val w = math.pow(2, -12)
    val df = (Seq((1L, "a", w)) ++ (2L to 4L).map(i => (i, "b", w)))
      .toDF("id", "grp", "w")
    val got = sampling.weightedSampleQuota(df, "id", "w", "grp", 2)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L),
      s"12-digit weights must allocate by exact arithmetic: $got")
  }

  test("quota sampling fails fast when a group's mass exceeds the exact-decimal range") {
    // Σw ≥ 1e15 overflows the DECIMAL(27,12) product to NULL (ANSI
    // off); pre-round-11 that silently carved the group quota 0 — now
    // the plan raises with the offending group named
    import spark.implicits._
    val df = Seq((1L, "big", 6e14), (2L, "big", 6e14), (3L, "ok", 1.0))
      .toDF("id", "grp", "w")
    val e = intercept[Exception] {
      sampling.weightedSampleQuota(df, "id", "w", "grp", 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("weightedSampleQuota") &&
      m.contains("big")), s"expected a loud overflow error, got: $e")
  }

  test("null and non-positive weights are excluded; n > corpus returns all eligible") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(-2L)),
      (5L, Some(1L))).toDF("id", "w")
    val got = sampling.weightedSample(df, "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L))
    assert(sampling.weightedSample(df.where(F.lit(false)), "id", "w", 10)
      .count() == 0L)
  }
}
