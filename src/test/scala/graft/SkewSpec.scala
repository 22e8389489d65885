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
}
