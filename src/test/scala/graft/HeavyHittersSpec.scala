package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.{dedup, text}

/** Misra–Gries heavy-hitters sketch ([[graft.plans.HeavyHitters]] /
  * `graft_heavy_hitters`): exact regime vs the plain GROUP BY, the
  * published error bounds in the approximate regime, merge correctness
  * across partitionings, and input hygiene. */
class HeavyHittersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  /** (item, true count) of every 3-shingle occurrence in the corpus. */
  private lazy val exactCounts: Map[String, Long] = {
    docs.select(F.explode(dedup.shingleStrings(F.col("text"), 3)).as("item"))
      .groupBy("item").agg(F.count(F.lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact regime: capacity >= distinct items reproduces GROUP BY top-k") {
    val items = docs.select(
      F.explode(dedup.shingleStrings(F.col("text"), 3)).as("item"))
    val got = text.heavyHitters(items, "item", capacity = 65536, topK = 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = exactCounts.toSeq
      .sortBy { case (it, c) => (-c, it) }.take(25)
      .zipWithIndex.map { case ((it, c), i) => (i + 1L, it, c) }
    assert(got.toSeq == want,
      s"sketch top-25 must equal exact top-25\ngot:  ${got.toSeq.take(5)}\nwant: ${want.take(5)}")
  }

  test("exact regime is partitioning-invariant (merge path)") {
    val items = docs.select(
      F.explode(dedup.shingleStrings(F.col("text"), 3)).as("item"))
    val one = text.heavyHitters(items.coalesce(1), "item", 65536, 10).collect()
    val many = text.heavyHitters(items.repartition(13), "item", 65536, 10).collect()
    assert(one.toSeq == many.toSeq,
      "sketch result must not depend on the partitioning in the exact regime")
  }

  test("approximate regime: Misra-Gries bounds hold under a tiny capacity") {
    // skewed synthetic stream: item "h0" dominates, a long tail of rare
    // items forces constant decrements at capacity 8
    import spark.implicits._
    val rows = (0 until 2000).flatMap { i =>
      val heavy = Seq.fill(3)(s"h${i % 2}") // h0/h1: 3000 each
      val tail = Seq(s"t${i % 500}")        // 500 items, 4 each
      heavy ++ tail
    }
    val n = rows.size.toLong
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cap = 8
    val got = text.heavyHitters(rows.toDF("item").repartition(7), "item",
      capacity = cap, topK = cap).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // every reported count is a lower bound within N/(cap+1)
    got.foreach { case (item, c) =>
      val t = truth(item)
      assert(c <= t, s"$item: reported $c exceeds true $t")
      assert(t - c <= n / (cap + 1),
        s"$item: error ${t - c} exceeds N/(cap+1) = ${n / (cap + 1)}")
    }
    // any item with true frequency > N/(cap+1) must survive
    truth.filter(_._2 > n / (cap + 1)).keys.foreach { item =>
      assert(got.contains(item), s"heavy item $item missing from sketch")
    }
  }

  test("null items are skipped; empty input yields zero rows") {
    import spark.implicits._
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
    val got = text.heavyHitters(withNulls, "item", 16, 5).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
    val empty = text.heavyHitters(withNulls.where(F.lit(false)), "item", 16, 5)
    assert(empty.count() == 0L)
  }

  test("SQL surface: arity and type errors are analysis-time") {
    import spark.implicits._
    Seq("a").toDF("item").createOrReplaceTempView("hh_in")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_heavy_hitters(item, 4) FROM hh_in").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      // capacity must be a literal INT
      spark.sql("SELECT graft_heavy_hitters(item, item, 4) FROM hh_in").collect()
    }
    spark.catalog.dropTempView("hh_in")
  }

  test("grouped sketches: per-source heavy hitters stay bounded and exact") {
    val items = docs.select(F.col("source"),
      F.explode(dedup.shingleStrings(F.col("text"), 3)).as("item"))
    val got = items.groupBy("source")
      .agg(F.call_function("graft_heavy_hitters",
        F.col("item"), F.lit(65536), F.lit(3)).as("hh"))
      .select(F.col("source"), F.explode(F.col("hh")).as("e"))
      .select(F.col("source"), F.col("e.item"), F.col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = items.groupBy("source", "item")
      .agg(F.count(F.lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, it, c) => (-c, it) }.take(3).toSeq
      }.toSet
    assert(got.toSet == want,
      "per-group sketch top-3 must equal per-group exact top-3")
  }
}
