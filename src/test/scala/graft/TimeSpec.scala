package graft

import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._

/** `Time` scalar type (reference types.py:258,292,332 — COMPARABLE-only:
  * compare/sort/min/max/clip/fill_null/shift; no casts, no arithmetic,
  * no extraction). Maps to Spark 4's TimeType behind
  * `spark.sql.timeType.enabled` (on in every graft session entry point). */
class TimeSpec extends SparkSpec {

  private def lt(h: Int, m: Int, s: Int = 0) = java.time.LocalTime.of(h, m, s)

  private def timesDf = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, lt(8, 30)), Row(2L, lt(17, 45, 30)), Row(3L, lt(0, 5)),
      Row(4L, null)),
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("t", TimeType.apply()))))

  test("Time: compare/filter/arrange with time literals") {
    val tb = tbl(timesDf, "times")
    assert(rows(tb.filter(C("t") > time("08:00:00")).arrange(C("t"))
      .select(C("id"))) == Seq(Seq(1L), Seq(2L)))
    // arrange: nulls and order
    assert(rows(tb.arrange(C("t").desc.nullsLast).select(C("id"))) ==
      Seq(Seq(2L), Seq(1L), Seq(3L), Seq(4L)))
  }

  test("Time: min/max aggregate, clip, fill_null, shift, when/lca") {
    val tb = tbl(timesDf, "times")
    assert(rows(tb.summarize("mn" -> C("t").min(), "mx" -> C("t").max())) ==
      Seq(Seq(lt(0, 5), lt(17, 45, 30))))
    assert(rows(tb.filter(C("t").isNotNull)
      .mutate("c" -> C("t").clip(time("06:00"), time("12:00")))
      .arrange(C("id")).select(C("c"))) ==
      Seq(Seq(lt(8, 30)), Seq(lt(12, 0)), Seq(lt(6, 0))))
    assert(rows(tb.mutate("f" -> C("t").fillNull(time("12:00")))
      .arrange(C("id")).select(C("f"))) ==
      Seq(Seq(lt(8, 30)), Seq(lt(17, 45, 30)), Seq(lt(0, 5)), Seq(lt(12, 0))))
    assert(rows(tb.arrange(C("id")).mutate("p" -> C("t").shift(1))
      .arrange(C("id")).select(C("p"))) ==
      Seq(Seq(null), Seq(lt(8, 30)), Seq(lt(17, 45, 30)), Seq(lt(0, 5))))
    // when-branch lca(Time, Time) = Time; union keeps it
    val w = tb.mutate("b" -> when(C("id") < lit(3L)).then_(time("01:00"))
      .otherwise(C("t")))
    assert(rows(w.arrange(C("id")).select(C("b"))).head == Seq(lt(1, 0)))
    assert(tb.select(C("t")).union(tb.select(C("t"))).count() == 8)
  }

  test("Time: arithmetic, casts, and dt extraction are rejected (reference posture)") {
    val tb = tbl(timesDf, "times")
    intercept[GraftTypeError] { tb.mutate("x" -> (C("t") + lit(1L))) }
    intercept[GraftTypeError] { tb.mutate("x" -> (C("t") - C("t"))) }
    intercept[GraftTypeError] { tb.mutate("x" -> C("t").dt.hour) }
    intercept[GraftTypeError] { tb.mutate("x" -> C("t").cast(StringType)) }
    intercept[GraftTypeError] { tb.mutate("x" -> C("id").cast(TimeType.apply())) }
    // Time never unifies with Datetime/Date
    intercept[GraftTypeError] {
      tb.mutate("x" -> C("t").fillNull(timestamp("2024-01-01 00:00:00")))
    }
  }

  test("Time: SQL text path (build_query) executes and matches the DF path") {
    // parquet-backed source so the pipeline has a SQL rendering (and the
    // TIME column round-trips through parquet on the way)
    val dir = java.nio.file.Files.createTempDirectory("graft_time").toString
    timesDf.write.mode("overwrite").parquet(s"$dir/times.parquet")
    val tb = graft.table.Table.source(spark, dir, "times")
    val q = tb.filter(C("t") >= time("08:30:00"))
      .mutate("c" -> C("t").clip(time("06:00"), time("12:00")))
      .arrange(C("t"))
    val sqlRows = spark.sql(q.buildQuerySql).collect()
      .map(r => (r.getLong(r.fieldIndex("id")), r.getAs[Any]("c"))).toSeq
    val dfRows = q.select(C("id"), C("c")).collect()
      .map(r => (r.getLong(0), r.getAs[Any](1))).toSeq
    assert(sqlRows == dfRows && dfRows.nonEmpty)
  }
}
