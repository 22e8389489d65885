package graft

import org.apache.spark.sql.{functions => F}
import graft.functions._

/** Adversarial embeddings through the similarity/ANN stack — what a
  * real embedding pipeline actually ships: zero vectors (failed
  * encodes), NaN/±Infinity components (overflowed float math),
  * dimension mismatches, null vectors. The stack must not crash, and a
  * corrupt vector must never OUTRANK real matches (a NaN cosine sorts
  * greatest under Spark's double ordering — the twoStageTopK guard
  * exists exactly for this). */
class PathologicalVectorSpec extends SparkSpec {

  import spark.implicits._

  private val nan = Float.NaN
  private val inf = Float.PositiveInfinity

  private lazy val corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f, 0.0f)),      // zero vector
    (5L, Array(nan, 0.5f, 0.5f, 0.5f)),       // NaN component
    (6L, Array(inf, 1.0f, 0.0f, 0.0f)),       // +inf component
    (7L, Array(-inf, -1.0f, 0.0f, 0.0f)),     // -inf component
    (8L, Array(nan, nan, nan, nan)),          // all NaN
    (9L, Array(1e30f, 1e30f, 1e30f, 1e30f))   // norm overflows float
  ).toDF("vec_id", "embedding")

  test("brute-force top-k: corrupt vectors never crash or outrank real matches") {
    val q = Seq((100L, Array(1.0f, 0.05f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val res = similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 5)
      .orderBy("rank").collect()
    assert(res.nonEmpty, "real neighbors found despite corrupt rows")
    val ids = res.map(_.getLong(1)).toSet
    assert(!ids.contains(4L), "zero vector (null cosine) excluded")
    assert(!ids.contains(5L) && !ids.contains(8L),
      "NaN-component vectors (NaN cosine) excluded")
    assert(res.head.getLong(1) == 1L || res.head.getLong(1) == 2L,
      s"nearest real vector ranks first, got ${res.head.getLong(1)}")
    res.foreach(r => assert(!r.getDouble(2).isNaN, "no NaN scores in output"))
  }

  test("corrupt QUERY vectors yield empty-or-clean results, never a crash") {
    val badQ = Seq(
      (200L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (201L, Array(nan, nan, nan, nan))).toDF("vec_id", "embedding")
    val res = similarity.bruteForceTopK(corpus, badQ, "vec_id", "embedding", k = 3)
      .collect()
    assert(res.forall(r => !r.getDouble(2).isNaN))
  }

  test("graft_dot: dimension mismatch and specials are total, not crashes") {
    val pairs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 1.0f)),       // dim mismatch
      (Array(1.0f), Array(inf)),                          // inf product
      (Array(nan), Array(1.0f))                           // nan product
    ).toDF("a", "b")
    val r = pairs.select(similarity.dot(F.col("a"), F.col("b")).as("d")).collect()
    assert(r(0).getDouble(0) == 3.0, "mismatched dims: documented min-dim loop")
    assert(r(1).getDouble(0).isInfinite && r(2).getDouble(0).isNaN)
    val nullRow = Seq((Option.empty[Array[Float]], Array(1.0f)))
      .toDF("a", "b")
      .select(similarity.dot(F.col("a"), F.col("b"))).collect()
    assert(nullRow.head.isNullAt(0), "null vector propagates null")
  }

  test("l2 normalize: zero and corrupt vectors follow the documented semantics") {
    val r = corpus.select(F.col("vec_id"),
        similarity.l2Normalize(F.col("embedding")).as("u"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Double](1)).toMap
    assert(math.abs(r(1L).map(x => x * x).sum - 1.0) < 1e-12)
    assert(r(4L).forall(_.isNaN), "zero vector: 0/0 = NaN per scaladoc")
    assert(r(9L).forall(_ == 0.0) || r(9L).exists(x => x.isNaN || x != 0.0),
      "float-overflow norm handled without crash")
  }

  test("int8 quantization: NaN -> null, ±inf clamp, native == portable") {
    val native = corpus.select(F.col("vec_id"),
        similarity.quantizeInt8(F.col("embedding")).as("q"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Any](1)).toMap
    val portable = corpus.select(F.col("vec_id"),
        similarity.quantizeInt8Portable(F.col("embedding")).as("q"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Any](1)).toMap
    corpus.collect().map(_.getLong(0)).foreach { id =>
      assert(native(id) == portable(id), s"native != portable for vec $id")
    }
    assert(native(5L).head == null, "NaN element quantizes to null")
    assert(native(6L).head == 127, "+inf clamps to 127")
    assert(native(7L).head == -127, "-inf clamps to -127")
    assert(native(4L).forall(_ == 0), "constant (zero) vector maps to 0")
    assert(native(8L).forall(_ == null), "all-NaN vector: all null")
  }

  test("k-means and hyperplane bucketing survive corrupt vectors") {
    val assigned = similarity.clusterEmbeddings(corpus, "vec_id", "embedding",
      nlist = 2, iters = 2)
    assert(assigned.count() == corpus.count(), "every row assigned, no crash")
    val bank = (1 to 8).map(i => if (i % 2 == 0) 1L else -1L)
    val buckets = corpus.select(F.call_function("graft_hyperplane_buckets",
      F.col("embedding"), F.typedlit(bank), F.lit(2))).collect()
    assert(buckets.length == corpus.count().toInt, "bucketing is total")
  }

  test("semantic dedup keeps corrupt vectors (no false drops) and does not crash") {
    val out = similarity.semanticDedup(corpus, "vec_id", "embedding",
      nlist = 2, minCos = 0.95, iters = 1)
    val kept = out.select("vec_id").as[Long].collect().toSet
    // corrupt vectors can never produce a cos >= minCos pair, so they
    // must all survive dedup
    assert(Set(4L, 5L, 6L, 7L, 8L).subsetOf(kept),
      s"corrupt vectors survive, kept=$kept")
  }
}
