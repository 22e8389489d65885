package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.similarity

/** [[graft.functions.similarity.binaryQuantize]] /
  * [[graft.functions.similarity.hammingTopK]] /
  * [[graft.functions.similarity.hammingPairs]] — sign-bit codes,
  * Hamming ranking, and the pigeonhole-banded exact radius join. */
class HammingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  /** the quantizer's contract, recomputed independently in Scala */
  private def refCode(v: Seq[Double], dim: Int): Seq[Long] =
    (0 until (dim + 31) / 32).map { w =>
      (0 until 32).foldLeft(0L) { (acc, i) =>
        val pos = w * 32 + i
        // NaN > 0 is TRUE in Spark and DuckDB alike (both order NaN
        // above every real), so a NaN component sets its bit
        if (pos < dim && pos < v.length && (v(pos).isNaN || v(pos) > 0))
          acc | (1L << i)
        else acc
      }
    }

  test("binaryQuantize packs sign bits little-endian in 32-bit words") {
    // dim 40: two words, second word uses only 8 bits; exercises
    // positive/negative/zero/NaN components (NaN sets its bit — both
    // engines order NaN above 0)
    val v: Seq[Double] = (0 until 40).map {
      case i if i % 7 == 0 => -1.5
      case i if i % 7 == 1 => 0.0
      case i if i % 7 == 2 => Double.NaN
      case i               => 0.25 + i
    }
    val got = Seq(Tuple1(v)).toDF("v")
      .select(similarity.binaryQuantize(F.col("v"), 40).as("c"))
      .head().getSeq[Long](0)
    assert(got == refCode(v, 40))
    assert(got.forall(w => w >= 0L && w < (1L << 32)),
      "words must stay in [0, 2^32) so xor never touches the sign bit")
    // a NULL component quantizes to 0, like NaN and non-positives
    val withNull = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), -1.0D, 2.0D) AS v")
      .select(similarity.binaryQuantize(F.col("v"), 4).as("c"))
      .head().getSeq[Long](0)
    assert(withNull == Seq(1L | 8L))
  }

  test("hammingTopK equals the brute-force recompute on real embeddings") {
    val got = similarity.hammingTopK(embs, embs.filter(F.col("vec_id") < 8),
        "vec_id", "embedding", k = 5, dim = 64)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val codes = embs.select(F.col("vec_id").cast("long"),
        similarity.binaryQuantize(F.col("embedding"), 64))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def dist(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    val want = codes.keys.filter(_ < 8).toSeq.sorted.flatMap { qid =>
      codes.toSeq.filter(_._1 != qid)
        .map { case (nid, c) => (nid, dist(codes(qid), c)) }
        .sortBy { case (nid, d) => (d, nid) }.take(5).zipWithIndex
        .map { case ((nid, d), i) => (qid, nid, d, i + 1L) }
    }
    assert(got.toSeq == want)
  }

  test("hammingPairs: pigeonhole completeness at the radius boundary") {
    // base vector all-positive; flip(r) flips exactly r signs spread
    // across different 16-bit bands (radius 3 → 4 bands), so the pair
    // (base, flip(r)) has hamming distance exactly r
    val base = (0 until 64).map(_ => 1.0)
    def flip(r: Int): Seq[Double] =
      base.zipWithIndex.map { case (x, i) =>
        if ((0 until r).map(j => j * 17 + 1).contains(i)) -x else x }
    val df = Seq(
      (0L, base), (1L, flip(1)), (2L, flip(2)), (3L, flip(3)), (4L, flip(4)))
      .toDF("id", "v")
    val got = similarity.hammingPairs(df, "id", "v", dim = 64, radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force truth over ALL pairs — the banded join may miss
    // nothing and add nothing
    val vecs = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def hd(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }.toLong
    val want = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
      d = hd(vecs(a), vecs(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == want)
    assert(got.contains((0L, 3L, 3L)), "distance == radius must be found")
    assert(!got.exists(p => p._1 == 0L && p._2 == 4L),
      "distance radius + 1 must be excluded")
    // malformed rows (null / wrong-size vectors) are excluded, not crashed
    val dirty = df.unionByName(Seq(
      (90L, null.asInstanceOf[Seq[Double]]), (91L, Seq(1.0, -1.0)))
      .toDF("id", "v"))
    val cleaned = similarity.hammingPairs(dirty, "id", "v", dim = 64, radius = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cleaned == want)
  }

  test("hammingPairs is an equi-join plan: no cartesian, no BNLJ") {
    val plan = similarity.hammingPairs(embs.limit(50), "vec_id", "embedding",
      dim = 64, radius = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("empty input yields empty output for all three entry points") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(similarity.hammingTopK(empty, empty, "id", "v", 3, 64).count() == 0)
    assert(similarity.hammingPairs(empty, "id", "v", 64, 3).count() == 0)
  }

  test("hammingTopK excludes NULL and wrong-size corpus rows from the ranking") {
    // an all-negative query has an all-zero code; a NULL/short corpus
    // row would also quantize all-zero (distance 0) and steal rank 1
    val clean = (1L to 6L).map(i =>
      (i, (0 until 64).map(j => if ((i + j) % 3 == 0) 1.0 else -1.0)))
    val dirty = clean.toDF("id", "v").unionByName(Seq(
      (90L, null.asInstanceOf[Seq[Double]]), (91L, Seq(1.0)))
      .toDF("id", "v"))
    val q = Seq((100L, (0 until 64).map(_ => -1.0))).toDF("id", "v")
    val got = similarity.hammingTopK(dirty, q, "id", "v", k = 3, dim = 64)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(!got.contains(90L) && !got.contains(91L),
      s"corrupt rows must not hold top-k slots: $got")
    assert(got.subsetOf((1L to 6L).toSet))
  }

  test("native binquant/hamming ≡ the portable built-ins forms (round-10 codegen)") {
    // adversarial component domain: NaN (sets its bit — Spark orders
    // NaN above 0 even though Java's primitive > does not), ±0.0,
    // ±Inf, NULL, denormals; plus vectors SHORTER and LONGER than dim
    val rnd = new scala.util.Random(20260815L)
    val vecs: Seq[Seq[java.lang.Double]] = (0 until 60).map { i =>
      val n = Seq(40, 64, 17, 96)(i % 4) // vs dim 64: short, exact, long
      (0 until n).map { _ =>
        rnd.nextInt(10) match {
          case 0 => java.lang.Double.valueOf(Double.NaN)
          case 1 => java.lang.Double.valueOf(0.0)
          case 2 => java.lang.Double.valueOf(-0.0)
          case 3 => null.asInstanceOf[java.lang.Double]
          case 4 => java.lang.Double.valueOf(Double.PositiveInfinity)
          case 5 => java.lang.Double.valueOf(Double.NegativeInfinity)
          case 6 => java.lang.Double.valueOf(Double.MinPositiveValue)
          case _ => java.lang.Double.valueOf(rnd.nextGaussian())
        }
      }
    }
    // plus an entirely-NULL vector (id 60): both forms must yield a
    // NULL code — distinct from a vector OF nulls, which codes to 0s
    val df = (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) } :+
        (60L, null.asInstanceOf[Seq[java.lang.Double]]))
      .toDF("id", "v").cache()
    val both = df.select(F.col("id"),
      similarity.binaryQuantize(F.col("v"), 64).as("n"),
      similarity.binaryQuantizePortable(F.col("v"), 64).as("p"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"native/portable NULL-code disagreement for id ${r.getLong(0)}")
      assert(r.isNullAt(1) || r.getSeq[Long](1) == r.getSeq[Long](2),
        s"native != portable code for id ${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 60L).exists(_.isNullAt(1)),
      "a NULL vector must quantize to a NULL code in both forms")
    // hamming over every pair of codes, incl. a deliberately unequal-
    // length code pair (both forms must yield NULL)
    val codes = df.select(F.col("id"),
      similarity.binaryQuantize(F.col("v"), 64).as("c"))
    val pairs = codes.as("a").crossJoin(codes.as("b"))
      .select(similarity.hamming(F.col("a.c"), F.col("b.c")).as("n"),
        similarity.hammingPortable(F.col("a.c"), F.col("b.c")).as("p"))
      .collect()
    pairs.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getLong(0) == r.getLong(1)))
    }
    val uneq = spark.sql(
      "SELECT array(1L, 2L) AS a, array(1L) AS b")
      .select(similarity.hamming(F.col("a"), F.col("b")).as("n"),
        similarity.hammingPortable(F.col("a"), F.col("b")).as("p"))
      .head()
    assert(uneq.isNullAt(0) && uneq.isNullAt(1),
      "unequal-length codes must yield NULL in both forms")
    df.unpersist()
  }

  test("non-integral id columns fail loudly instead of returning empty") {
    // a string id would cast to NULL long, every self-match filter
    // would drop the row, and the call would silently return nothing
    val strId = Seq(("a", (0 until 64).map(_ => 1.0))).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      similarity.hammingTopK(strId, strId, "id", "v", 3, 64)
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      similarity.hammingPairs(strId, "id", "v", 64, 3)
    }
    assert(e2.getMessage.contains("integral"))
  }
}
