package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.skew

/** Skew remedies must be result-equivalent to the plain operators. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // 1000 rows of one hot key + a long tail
    val hot = (1 to 1000).map(i => (1L, i.toDouble))
    val tail = (2 to 50).map(k => (k.toLong, k.toDouble))
    (hot ++ tail).toDF("k", "v")
  }
  private def dim = Seq((1L, "hot"), (2L, "two"), (99L, "absent")).toDF("k", "label")

  test("saltedJoin equals plain join (inner and left)") {
    for (how <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), how)
        .orderBy("k", "v").collect().map(_.toSeq).toSeq
      val salted = skew.saltedJoin(skewed, dim, Seq("k"), factor = 8, how = how)
        .select("k", "v", "label")
        .orderBy("k", "v").collect().map(_.toSeq).toSeq
      assert(salted == plain, s"how=$how")
    }
  }

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(F.sum("v").as("s"), F.count("v").as("n"), F.max("v").as("mx"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val salted = skew.saltedAgg(skewed, Seq("k"), factor = 8,
        Seq(("s", "v", "sum"), ("n", "v", "count"), ("mx", "v", "max")))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("rebalanceUnderSplit fans out an under-split scan and nothing else") {
    val target = spark.sparkContext.defaultParallelism
    // a 1-split parquet scan: the gate fires and fans out to the cores
    val dir = java.nio.file.Files.createTempDirectory("graft_rebal_").toString
    spark.range(0, 1000).coalesce(1).write.mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir)
    assert(one.rdd.getNumPartitions == 1)
    val fanned = skew.rebalanceUnderSplit(one)
    assert(fanned.rdd.getNumPartitions == target,
      s"gate must fan a 1-split scan out to defaultParallelism=$target")
    assert(fanned.count() == 1000L)
    // a well-split input passes through IDENTICALLY (no added exchange)
    val wide = spark.range(0, 1000, 1, numPartitions = target).toDF()
    assert(skew.rebalanceUnderSplit(wide) eq wide,
      "multi-split inputs must pass through untouched") // eq: same frame, no wrap
    // an input whose plan already shuffles is returned untouched even at
    // 1 partition — probing its RDD would eagerly run AQE stages, and
    // its partitioning was decided by that shuffle, not the source
    val shuffled = one.groupBy((F.col("id") % 10).as("g"))
      .agg(F.count(F.lit(1)).as("n"))
    assert(skew.rebalanceUnderSplit(shuffled) eq shuffled,
      "shuffled inputs must pass through untouched")
    // scan + filter + project stays ELIGIBLE (the allowlist's point is
    // to keep exactly these source-grain shapes probeable)
    val narrowed = one.filter(F.col("id") > 10).select(F.col("id"))
    assert(skew.rebalanceUnderSplit(narrowed).rdd.getNumPartitions == target,
      "a filtered/projected 1-split scan must still fan out")
    // typed-API plans (MapGroups etc.) are exactly what a shuffle-node
    // BLOCKLIST forgot: the allowlist must leave them untouched rather
    // than probe them (probing would eagerly submit the groupByKey
    // shuffle as real jobs under AQE)
    val sp = spark; import sp.implicits._
    val typed = one.as[Long].groupByKey(_ % 10)
      .mapGroups((k, it) => (k, it.size)).toDF("g", "n")
    assert(skew.rebalanceUnderSplit(typed) eq typed,
      "typed mapGroups plans must pass through untouched")
    val hinted = one.hint("rebalance")
    assert(skew.rebalanceUnderSplit(hinted) eq hinted,
      "REBALANCE-hinted plans must pass through untouched")
    // shuffle-free narrow shapes beyond plain scans stay ELIGIBLE:
    // a union of two 1-split scans and a typed .map over a scan are
    // exactly the corpus shapes dedup/retrieval callers hand over
    // 2 union branches = 2 splits, exactly AT the default 0.5 threshold
    // (not under it) — raise minFrac to prove the shape is ELIGIBLE
    val unioned = one.union(one)
    assert(skew.rebalanceUnderSplit(unioned, minFrac = 1.0)
      .rdd.getNumPartitions == target,
      "a union of under-split scans must fan out")
    val typedMap = one.as[Long].map(_ + 1L).toDF("id")
    assert(skew.rebalanceUnderSplit(typedMap).rdd.getNumPartitions == target,
      "a typed narrow map over an under-split scan must fan out")
  }
}
