package graft

import org.apache.spark.sql.{functions => F, DataFrame}
import graft.functions.dedup

/** [[graft.functions.dedup.similarityJoinPrefix]] — exact set-similarity
  * join via prefix filtering. The load-bearing property is COMPLETENESS:
  * at any threshold the result must equal the quadratic all-pairs scan
  * (here [[dedup.tokenJaccardPairs]] with a constant bucket), which is
  * exactly what the prefix-filter theorem promises. */
class PrefixSimilarityJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
    .limit(120).cache()

  /** quadratic unigram-Jaccard reference: constant bucket => every pair
    * compared by [[dedup.tokenJaccardPairs]] (which shingles at k=1). */
  private def allPairs(df: DataFrame, minJ: Double): Set[(Long, Long)] =
    dedup.tokenJaccardPairs(df.withColumn("b", F.lit(1)),
      "doc_id", "text", "b", minJ)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("k=1: equals the quadratic all-pairs scan at several thresholds") {
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val got = dedup.similarityJoinPrefix(docs, "doc_id", "text", 1, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = allPairs(docs, t)
      assert(got == want,
        s"minJ=$t: prefix join must be complete and precise " +
          s"(got ${got.size}, want ${want.size}; " +
          s"missing ${(want -- got).take(3)}, extra ${(got -- want).take(3)})")
    }
  }

  test("k=3: jaccard values match the direct pairwise computation") {
    val got = dedup.similarityJoinPrefix(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // direct: intersect the hashed shingle sets of every returned pair
    val sets = docs.select(F.col("doc_id"),
        dedup.shingleHashes(F.col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    got.foreach { case ((a, b), j) =>
      val (sa, sb) = (sets(a), sets(b))
      val i = (sa & sb).size.toDouble
      val expect = i / (sa.size + sb.size - i)
      assert(j == expect && j >= 0.5, s"pair ($a,$b): jaccard $j != $expect")
    }
  }

  test("minJ = 1.0 finds exactly the identical-set pairs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "c b a"), // same token set
      (4L, "a b"), (5L, "a b c d")
    ).toDF("doc_id", "text")
    val got = dedup.similarityJoinPrefix(df, "doc_id", "text", 1, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("degenerate corpus: maxPosting caps candidate generation, subset stays correct") {
    import spark.implicits._
    val clones = (0L until 200L).map(i => (i, "x y z w v")).toDF("doc_id", "text")
    val capped = dedup.similarityJoinPrefix(clones, "doc_id", "text", 1, 0.9,
      maxPosting = 10)
    val rows = capped.collect()
    // completeness is traded only on capped postings: all returned pairs
    // must still be REAL J >= 0.9 pairs, and the smallest-id members
    // (which every posting keeps) must pair among themselves
    assert(rows.forall(_.getDouble(2) == 1.0))
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (a <- 0L until 10L; b <- (a + 1) until 10L)
      assert(got.contains((a, b)), s"capped join lost smallest-id pair ($a,$b)")
    // and the uncapped run returns all 200*199/2 pairs
    val full = dedup.similarityJoinPrefix(clones, "doc_id", "text", 1, 0.9)
    assert(full.count() == 200L * 199 / 2)
  }

  test("empty and single-document corpora yield zero pairs") {
    val empty = docs.where(F.lit(false))
    assert(dedup.similarityJoinPrefix(empty, "doc_id", "text", 3, 0.5)
      .count() == 0L)
    assert(dedup.similarityJoinPrefix(docs.limit(1), "doc_id", "text", 3, 0.5)
      .count() == 0L)
  }
}
