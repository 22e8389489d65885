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

  test("near-dup index: probe matches the cross-corpus scan and never shuffles the index side") {
    import graft.functions.{dedup, index}
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an entirely different document about spark and scala"),
      (3L, "yet another unrelated piece of training text here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (11L, "nothing like anything stored in the index today")
    ).toDF("doc_id", "text")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      index.buildJaccardIndex(corpus, "doc_id", "text", "graft_ndx",
        k = 3, numPerm = 64, bands = 32, buckets = 4)
      val probe = index.probeJaccardIndex(spark, batch, "doc_id", "text",
        "graft_ndx", k = 3, numPerm = 64, bands = 32, minJ = 0.5)
      val got = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((10L, 1L)), s"got $got")
      // same semantics as the batch cross-corpus scan on the same data
      val cross = dedup.jaccardPairsLshCross(batch, corpus, "doc_id", "text",
          k = 3, numPerm = 64, bands = 32, minJ = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == cross)
      // every shuffle in the probe plan moves the NEW side or candidate
      // pairs: no exchange DIRECTLY repartitions an index-table scan
      // (only unary ops between an exchange and the scan would mean the
      // index side itself is being reshuffled)
      val plan = probe.queryExecution.executedPlan
      def unaryLeaf(p: org.apache.spark.sql.execution.SparkPlan):
          org.apache.spark.sql.execution.SparkPlan =
        if (p.children.size == 1) unaryLeaf(p.children.head) else p
      val reshuffledIndexScans = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          unaryLeaf(e.child) match {
            case s: org.apache.spark.sql.execution.FileSourceScanExec
                if s.tableIdentifier.exists(_.table.startsWith("graft_ndx")) => 1
            case _ => 0
          }
      }.sum
      assert(reshuffledIndexScans == 0, s"index side reshuffled:\n$plan")
      // appending a batch extends the index in place
      index.buildJaccardIndex(batch, "doc_id", "text", "graft_ndx",
        k = 3, numPerm = 64, bands = 32, buckets = 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      val again = index.probeJaccardIndex(spark,
        Seq((20L, "the quick brown fox jumps over the lazy cat"))
          .toDF("doc_id", "text"),
        "doc_id", "text", "graft_ndx", k = 3, numPerm = 64, bands = 32,
        minJ = 0.5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(again == Set((20L, 1L), (20L, 10L)), s"got $again")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_ndx_buckets")
      spark.sql("DROP TABLE IF EXISTS graft_ndx_sigs")
    }
  }
}
