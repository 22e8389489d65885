package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.layout

/** Bucketing must remove the join shuffle entirely. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized tables join with zero shuffle exchanges") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    val dims = (0 to 49).map(i => (i.toLong, s"d$i")).toDF("k", "label")
    // AQE rewrites can hide exchanges in compiled stages; keep the
    // assertion on the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      layout.bucketize(facts, "graft_facts_b", Seq("k"), buckets = 8)
      layout.bucketize(dims, "graft_dims_b", Seq("k"), buckets = 8)
      val joined = layout.coLocatedJoin(spark, "graft_facts_b", "graft_dims_b", Seq("k"))
      assert(layout.shuffleCount(joined) == 0, joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 1000)
      // the same join on unbucketed frames shuffles both sides
      val plain = facts.join(dims, Seq("k"))
      assert(layout.shuffleCount(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }
}
