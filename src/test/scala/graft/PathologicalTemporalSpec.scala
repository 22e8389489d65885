package graft

import java.time.LocalDateTime
import org.apache.spark.sql.{functions => F}
import graft.functions._

/** Adversarial temporal data through the time-axis operators: inverted
  * intervals (hi < lo — sensor glitches, bad joins upstream), zero-width
  * intervals, duplicate as-of timestamps (tie semantics must be
  * deterministic), pre-epoch and far-future timestamps, and unsorted
  * input. Pins the committed behaviors: an inverted interval matches
  * NOTHING (same as the reference's cross-join + between filter, where
  * `lo <= x <= hi` is unsatisfiable), and binned explosion never runs
  * Spark's descending `sequence` on it. */
class PathologicalTemporalSpec extends SparkSpec {

  import spark.implicits._

  test("rangeJoin: inverted and zero-width intervals match like the naive filter") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 15L)).toDF("pid", "ts")
    val iv = Seq(
      (10L, 4L, 6L),    // normal: catches ts=5
      (11L, 10L, 10L),  // zero-width: catches ts=10 exactly
      (12L, 20L, 2L),   // INVERTED: must match nothing, not explode 20..2
      (13L, 14L, 16L)   // normal: catches ts=15
    ).toDF("iid", "lo", "hi")
    val got = joins.rangeJoin(points, iv, "ts", "lo", "hi", binWidth = 4)
      .select("pid", "iid_iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(iv)
      .filter(F.col("ts").between(F.col("lo"), F.col("hi")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got == Set((1L, 10L), (2L, 11L), (3L, 13L)))
  }

  test("overlapJoin: inverted intervals on either side match nothing") {
    val a = Seq((1L, 0L, 10L), (2L, 30L, 20L)).toDF("aid", "lo", "hi")
    val b = Seq((7L, 5L, 15L), (8L, 50L, 40L)).toDF("bid", "lo", "hi")
    val got = joins.overlapJoin(a, b, "lo", "hi", "lo", "hi", binWidth = 8)
      .select("aid", "bid_iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the two VALID intervals overlap; every pair involving an
    // inverted interval is absent
    assert(got == Set((1L, 7L)), s"got $got")
  }

  test("asofBackward: duplicate right timestamps resolve deterministically") {
    val l = Seq((1L, 10L)).toDF("lid", "ts")
    // three right rows share ts = 10 (all <= left ts, all equally "latest")
    val r = Seq((10L, "a"), (10L, "b"), (10L, "c"), (5L, "old"))
      .toDF("rts", "v")
    val out1 = joins.asofBackward(l, r, "ts", "rts", Nil, Seq("v")).collect()
    val out2 = joins.asofBackward(l, r, "ts", "rts", Nil, Seq("v")).collect()
    assert(out1.length == 1, "as-of emits exactly one row per left row, even on ties")
    assert(out1.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq,
      "tie resolution is deterministic across runs")
  }

  test("datetime extractors handle pre-epoch and far-future timestamps") {
    val rows = Seq(
      (1L, LocalDateTime.of(1920, 2, 29, 23, 59, 59)),   // pre-epoch leap day
      (2L, LocalDateTime.of(1969, 12, 31, 23, 59, 59)),  // second before epoch
      (3L, LocalDateTime.of(2262, 4, 11, 0, 0, 0)),      // beyond ns-range lore
      (4L, LocalDateTime.of(9999, 12, 31, 23, 59, 59))   // far future
    ).toDF("id", "ts")
    val r = rows.select(F.col("id"),
        F.year(F.col("ts")).as("y"), F.dayofyear(F.col("ts")).as("doy"))
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2))).toMap
    assert(r(1L) == (1920, 60), "1920 is a leap year; Feb 29 is day 60")
    assert(r(2L)._1 == 1969 && r(4L)._1 == 9999)
  }

  test("sessionize-style gap logic survives unsorted and duplicate event times") {
    // events arrive unsorted with exact-duplicate timestamps; the window
    // ordering inside the operator must not depend on input order
    val ev = Seq(
      (1L, 100L, 30L), (1L, 10L, 10L), (1L, 100L, 31L), (1L, 12L, 11L)
    ).toDF("user_id", "t", "event_id")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
      df.withColumn("gap",
          F.col("t") - F.lag("t", 1).over(w))
        .withColumn("newsess",
          (F.col("gap").isNull || F.col("gap") > 50L).cast("long"))
        .withColumn("sess", F.sum("newsess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("event_id", "sess").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    val sorted = run(ev.orderBy("t"))
    val shuffled = run(ev.orderBy(F.rand(42)))
    assert(sorted == shuffled, "session ids independent of arrival order")
    assert(sorted.map(_._2).distinct.size == 2, "two sessions split at gap > 50")
  }
}
