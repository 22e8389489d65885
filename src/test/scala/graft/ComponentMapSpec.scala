package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.{dedup, index}

/** Incremental connected components as index state
  * ([[graft.functions.index.buildComponentMap]] /
  * `appendComponentEdges` / `readComponentMap` / `compactComponentMap`):
  * day-by-day appends must EXACTLY equal the full recompute over the
  * union of all edges — merges across days included — and compaction
  * must be invisible to readers. */
class ComponentMapSpec extends SparkSpec {
  import spark.implicits._

  /** deterministic scattered edge stream over ids [0, n): chains,
    * stars, and cross-day bridges (edge day = max endpoint day, the
    * arrival order of a daily pipeline) */
  private def syntheticGraph(n: Int): (Seq[Long], Seq[(Long, Long)]) = {
    val rnd = new scala.util.Random(20260815L)
    val nodes = (0L until n.toLong)
    val edges = Seq.newBuilder[(Long, Long)]
    nodes.foreach { i =>
      if (i % 7 == 0 && i + 3 < n) edges += ((i, i + 3)) // chains
      if (i % 11 == 0 && i + 9 < n) edges += ((i + 9, i)) // reversed
      if (rnd.nextInt(5) == 0) { // random bridges (the merge fuel)
        val j = rnd.nextInt(n).toLong
        if (j != i) edges += ((i, j))
      }
    }
    (nodes, edges.result())
  }

  private def day(id: Long): Int = (id % 3).toInt

  test("3-day incremental replay equals the full recompute (that IS the contract)") {
    val (nodes, edges) = syntheticGraph(600)
    val nodesDf = nodes.toDF("id").cache()
    val edgesDf = edges.toDF("id_a", "id_b").cache()
    // day d inserts nodes with id % 3 = d and the edges whose LATEST
    // endpoint arrives that day — every edge appended exactly once
    index.buildComponentMap(
      nodesDf.filter(F.col("id") % 3 === 0),
      edgesDf.filter(F.greatest(F.col("id_a") % 3, F.col("id_b") % 3) === 0),
      "id", "cmspec")
    (1 to 2).foreach { d =>
      index.appendComponentEdges(
        nodesDf.filter(F.col("id") % 3 === d),
        edgesDf.filter(
          F.greatest(F.col("id_a") % 3, F.col("id_b") % 3) === d),
        "id", "cmspec")
    }
    val got = index.readComponentMap(spark, "cmspec").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = dedup.connectedComponents(edgesDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = nodes.map(i => i -> full.getOrElse(i, i)).toMap
    assert(got == want,
      s"incremental != full recompute; diffs: ${
        (got.toSet diff want.toSet).take(5)} / ${
        (want.toSet diff got.toSet).take(5)}")
    // the keep rule: every component label is the component's min id
    got.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"component $c is not its min id")
    }
    // compaction folds the remap into the map without changing reads
    val remapBefore = spark.table("cmspec_cremap").count()
    assert(remapBefore > 0, "the replay must have produced real merges")
    index.compactComponentMap(spark, "cmspec")
    val afterCompact = index.readComponentMap(spark, "cmspec").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterCompact == want, "compaction changed the resolution")
    assert(spark.table("cmspec_cremap").count() == 0L)
    // and appends keep working after a compaction: bridge two existing
    // components with a fresh node and check the merged label
    val bigNode = 100000L
    val reps = afterCompact.values.toSeq.distinct.sorted.takeRight(2)
    index.appendComponentEdges(
      Seq(bigNode).toDF("id"),
      Seq((bigNode, reps(0)), (bigNode, reps(1))).toDF("id_a", "id_b"),
      "id", "cmspec")
    val merged = index.readComponentMap(spark, "cmspec").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectRep = math.min(reps(0), reps(1)) // bigNode is larger
    val family = want.filter(kv => reps.contains(kv._2)).keys.toSet + bigNode
    family.foreach(idv => assert(merged(idv) == expectRep,
      s"post-compaction merge wrong for $idv: ${merged(idv)} != $expectRep"))
    nodesDf.unpersist(); edgesDf.unpersist()
  }

  test("empty day is a no-op; edges to unmapped ids don't invent rows") {
    index.buildComponentMap(Seq(1L, 2L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), "id", "cmspec2")
    index.appendComponentEdges(
      Seq.empty[Long].toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id", "cmspec2")
    val got = index.readComponentMap(spark, "cmspec2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
    // an edge to an id that was never inserted resolves the known side
    // but does not add a row for the stranger
    index.appendComponentEdges(Seq(5L).toDF("id"),
      Seq((5L, 999L)).toDF("id_a", "id_b"), "id", "cmspec2")
    val got2 = index.readComponentMap(spark, "cmspec2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2.keySet == Set(1L, 2L, 5L))
  }
}
