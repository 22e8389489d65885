package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.{dedup, similarity}

/** Opt-in scale smoke (set GRAFT_SCALE_SMOKE=1): synthetic corpora far
  * above the fixture sizes, exercising the paths whose SHAPE matters at
  * 100 TB — a boilerplate mega-cluster that only completes because the
  * hot-bucket cap bounds per-task pair generation, and IVF ANN over a
  * corpus that would be infeasible to scan per-query. Assertions are on
  * completion + structural properties, not timings. */
class ScaleSmokeSpec extends SparkSpec {
  private val on = sys.env.get("GRAFT_SCALE_SMOKE").contains("1")

  test("capped LSH dedup survives a 20k-copy boilerplate cluster in a 300k corpus") {
    assume(on, "set GRAFT_SCALE_SMOKE=1 to run")
    import spark.implicits._
    // 280k distinct docs (8 words drawn from the id) + 20k exact copies
    // of one boilerplate doc: the boilerplate band buckets hold 20k rows,
    // so the uncapped plan would generate 20k²/2 = 200M pairs per band —
    // the cap bounds it to ~20k·cap/2 per band and keeps going.
    val distinctDocs = spark.range(0, 280000).select(
      F.col("id").as("doc_id"),
      F.concat_ws(" ", (0 until 8).map(i =>
        F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id") + i), F.lit(50000)))): _*).as("text"))
    val boiler = spark.range(280000, 300000).select(
      F.col("id").as("doc_id"),
      F.lit("terms of service apply to all content on this site").as("text"))
    val corpus = distinctDocs.unionByName(boiler)
    val pairs = dedup.jaccardPairsLsh(corpus, "doc_id", "text",
      k = 3, numPerm = 32, bands = 16, minJ = 0.9, maxBucket = 100)
    val n = pairs.count()
    // every surviving pair is within the boilerplate cluster (distinct
    // docs share ~no 3-shingles at J ≥ 0.9), and the cap keeps each
    // row's candidate fan-out ~cap per band instead of cluster-sized
    assert(n > 0, "boilerplate cluster must produce near-dup pairs")
    val ids = pairs.agg(F.min("id_a"), F.max("id_b")).head()
    assert(ids.getLong(0) >= 280000L && ids.getLong(1) < 300000L)
  }

  test("IVF ANN answers 100 queries against a 200k-vector corpus via cell probing") {
    assume(on, "set GRAFT_SCALE_SMOKE=1 to run")
    // deterministic pseudo-random 16-dim vectors from the id
    val vecs = spark.range(0, 200000).select(
      F.col("id").as("vec_id"),
      F.array((0 until 16).map(i =>
        (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(2000)) - 1000)
          .cast("double") / 1000.0): _*).as("embedding"))
    val out = similarity.ivfTopK(vecs, vecs.filter(F.col("vec_id") < 100),
      "vec_id", "embedding", k = 10, nlist = 64, nprobe = 4, iters = 3,
      sampleOneIn = 20)
    assert(out.count() == 100L * 10)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
