package graft

import graft.core._
import graft.dsl._

/** Join suffixing/validation, union typing, alias/self-join, window ops. */
class JoinWindowSpec extends SparkSpec {
  import spark.implicits._

  private def left = tbl(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "lv"), "l")
  private def right = tbl(Seq((1L, 10.0), (1L, 11.0), (4L, 40.0)).toDF("k", "rv"), "r")

  test("inner join + clashing right columns get suffix (verbs.py:1115-1208)") {
    val l = left; val r = right
    val j = l.innerJoin(r, C("k") === r.col("k"))
    assert(j.columns == Seq("k", "lv", "k_r", "rv"))
    assert(j.count() == 2)
  }

  test("left join keeps unmatched; full join both") {
    val la = left; val ra = right
    val lj = la.leftJoin(ra, C("k") === ra.col("k"), suffix = Some("_b"))
    assert(lj.count() == 4)
    assert(lj.columns.contains("k_b"))
    val lb = left; val rb = right
    val f = lb.fullJoin(rb, C("k") === rb.col("k"))
    assert(f.count() == 5)
  }

  test("cross join") {
    assert(left.crossJoin(right).count() == 9)
  }

  test("join validate= cardinality checks (verbs.py:1016)") {
    // right keys NOT unique (two 1s) → m:1 must fail, 1:m must pass
    val l = left; val r = right
    intercept[GraftError] {
      l.join(r, C("k") === r.col("k"), "inner", validate = "m:1")
    }
    val l2 = left; val r2 = right
    assert(l2.join(r2, C("k") === r2.col("k"), "inner", validate = "1:m").count() == 2)
  }

  test("self-join requires alias; alias resets uuids (verbs.py:100-160)") {
    intercept[GraftError] { left.join(left, C("k") === left.col("k"), "inner") }
    val l2 = left.alias("l2")
    val j = left.innerJoin(l2, C("k") === l2.col("k"))
    assert(j.count() == 3)
    assert(j.columns == Seq("k", "lv", "k_l2", "lv_l2"))
  }

  test("theta join (non-equi)") {
    val l = left; val r = right
    val j = l.innerJoin(r, (C("k") < r.col("k")))
    assert(j.count() == 3) // left {1,2,3} × right {1,1,4}: only the 4 matches
  }

  test("union requires same columns; distinct dedups; lca types") {
    val a = tbl(Seq(1L, 2L).toDF("x"))
    val b = tbl(Seq(2.5, 2.0).toDF("x"))
    val u = a.union(b) // Long ∪ Double → Double
    assert(u.count() == 4)
    val d = tbl(Seq(1L, 1L).toDF("x")).union(tbl(Seq(1L).toDF("x")), distinct = true)
    assert(d.count() == 1)
    intercept[GraftError] { a.union(tbl(Seq(1L).toDF("y"))) }
  }

  test("window: shift with fill, row_number/rank/dense_rank (window.py goldens)") {
    val t = tbl(Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 30.0), ("b", 1L, 5.0))
      .toDF("g", "i", "v"))
    val m = t.mutate(
      "prev" -> C("v").shift(1, fill = lit(-1.0),
        partitionBy = Seq(C("g")), arrange = Seq(C("i"))),
      "rn" -> rowNumber(arrange = Seq(C("v"), C("i")), partitionBy = Seq(C("g"))),
      "rk" -> rank(arrange = Seq(C("v")), partitionBy = Seq(C("g"))),
      "dr" -> denseRank(arrange = Seq(C("v")), partitionBy = Seq(C("g"))))
      .arrange(C("g"), C("i"))
    assert(rows(m.select(C("prev"), C("rn"), C("rk"), C("dr"))) == Seq(
      Seq(-1.0, 1L, 1L, 1L),
      Seq(10.0, 2L, 1L, 1L),
      Seq(10.0, 3L, 3L, 2L),
      Seq(-1.0, 1L, 1L, 1L)))
  }

  test("cum_sum: row frame, nulls carry forward (window.py:209)") {
    val t = tbl(Seq[(Long, java.lang.Double)]((1L, 1.0), (2L, null), (3L, 2.0))
      .toDF("i", "v"))
    val m = t.mutate("cs" -> C("v").cumSum(arrange = Seq(C("i")))).arrange(C("i"))
    assert(rows(m.select(C("cs"))) == Seq(Seq(1.0), Seq(1.0), Seq(3.0)))
  }

  test("str.join ordered aggregation + list.agg (aggregation.py:101)") {
    val t = tbl(Seq(("g1", "b"), ("g1", "a"), ("g2", "c")).toDF("g", "s"))
    val j = t.groupBy(C("g")).summarize(
      "joined" -> C("s").str.join(",", arrange = Seq(C("s"))),
      "lst" -> listAgg(C("s"), arrange = Seq(C("s").desc)))
      .arrange(C("g"))
    assert(rows(j.select(C("joined"))) == Seq(Seq("a,b"), Seq("c")))
    assert(rows(j.select(C("lst"))) == Seq(Seq(Seq("b", "a")), Seq(Seq("c"))))
  }

  test("ordered string agg as a window (mutate under grouping)") {
    val t = tbl(Seq(("g1", 2L, "b"), ("g1", 1L, "a"), ("g2", 1L, "c")).toDF("g", "i", "s"))
    val m = t.groupBy(C("g"))
      .mutate("all_s" -> C("s").str.join("|", arrange = Seq(C("i"))))
      .ungroup.arrange(C("g"), C("i"))
    assert(rows(m.select(C("all_s"))) == Seq(Seq("a|b"), Seq("a|b"), Seq("c")))
  }

  test("window inside summarize / agg in join condition are rejected") {
    val t = tbl(Seq(1.0).toDF("v"))
    intercept[GraftFunctionTypeError] {
      t.groupBy(C("v")).summarize("x" -> rowNumber(arrange = Seq(C("v"))))
    }
    val l = left; val r = right
    intercept[GraftFunctionTypeError] {
      l.innerJoin(r, C("k") === r.col("rv").sum())
    }
  }
}
