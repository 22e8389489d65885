package graft

import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._

/** Golden suite ported from the reference's operator doctests: each test
  * builds the doctest's literal table, runs the documented expression
  * through the graft DSL, and asserts the exact cells the reference's
  * docs print. Provenance per test: reference file:line of the doctest.
  *
  * Rows are collected `arrange`d by an explicit id column so the
  * assertions are order-stable regardless of partitioning.
  */
class DoctestGoldenSpec extends SparkSpec {
  import spark.implicits._

  private def col[A](t: table.Table, names: String*): Seq[Seq[Any]] =
    rows(t.arrange(C("_i")).select(names.map(C): _*))

  // the doctests' shared 4/5-row string fixture (string.py:29-34 et al.)
  private def strTable4 = tbl(Seq(
    (1L, "  BCD ", "12431"), (2L, "-- 00", "transform"),
    (3L, " A^^u", "12__*m"), (4L, "-O2", "   ")
  ).toDF("_i", "a", "b"))

  private def strTable5 = tbl(Seq(
    (1L, "  BCD ", "12431"), (2L, "-- 00", "transform"),
    (3L, " A^^u", "12__*m"), (4L, "-O2", "   "), (5L, "", "abbabbabba")
  ).toDF("_i", "a", "b"))

  test("str.strip / str.upper / str.lower / str.len (string.py:26-141)") {
    val t = strTable4.mutate(
      "st_a" -> C("a").str.strip, "st_b" -> C("b").str.strip,
      "up_a" -> C("a").str.upper, "up_b" -> C("b").str.upper,
      "lo_a" -> C("a").str.lower, "lo_b" -> C("b").str.lower,
      "ln_a" -> C("a").str.len, "ln_b" -> C("b").str.len)
    assert(col(t, "st_a", "st_b") == Seq(
      Seq("BCD", "12431"), Seq("-- 00", "transform"),
      Seq("A^^u", "12__*m"), Seq("-O2", "")))
    assert(col(t, "up_a", "up_b") == Seq(
      Seq("  BCD ", "12431"), Seq("-- 00", "TRANSFORM"),
      Seq(" A^^U", "12__*M"), Seq("-O2", "   ")))
    assert(col(t, "lo_a", "lo_b") == Seq(
      Seq("  bcd ", "12431"), Seq("-- 00", "transform"),
      Seq(" a^^u", "12__*m"), Seq("-o2", "   ")))
    assert(col(t, "ln_a", "ln_b") == Seq(
      Seq(6L, 5L), Seq(5L, 9L), Seq(5L, 6L), Seq(3L, 3L)))
  }

  test("str.replace_all replaces every literal occurrence (string.py:143-190)") {
    val t = strTable5.mutate(
      "r" -> C("a").str.replaceAll("-", "?"),
      "s" -> C("b").str.replaceAll("ansf", "[---]"),
      "u" -> C("b").str.replaceAll("abba", "#"))
    assert(col(t, "r", "s", "u") == Seq(
      Seq("  BCD ", "12431", "12431"),
      Seq("?? 00", "tr[---]orm", "transform"),
      Seq(" A^^u", "12__*m", "12__*m"),
      Seq("?O2", "   ", "   "),
      // non-overlapping scan: "abbabbabba" -> "#bb#"
      Seq("", "abbabbabba", "#bb#")))
  }

  test("str.starts_with / str.ends_with (string.py:192-260)") {
    val t = strTable5.mutate(
      "j" -> C("a").str.startsWith("-"), "k" -> C("b").str.startsWith("12"),
      "e" -> C("a").str.endsWith(""), "m" -> C("b").str.endsWith("m"),
      "l" -> C("a").str.endsWith("^u"))
    assert(col(t, "j", "k") == Seq(
      Seq(false, true), Seq(true, false), Seq(false, true),
      Seq(true, false), Seq(false, false)))
    assert(col(t, "e", "m", "l") == Seq(
      Seq(true, false, false), Seq(true, true, false),
      Seq(true, true, true), Seq(true, false, false),
      Seq(true, false, false)))
  }

  test("str.contains, incl. the empty pattern (string.py:283-334)") {
    val t = strTable5.mutate(
      "j" -> C("a").str.contains(" "),
      "k" -> C("b").str.contains("a"),
      "l" -> C("b").str.contains(""))
    assert(col(t, "j", "k", "l") == Seq(
      Seq(true, false, true), Seq(true, true, true),
      Seq(true, false, true), Seq(false, false, true),
      Seq(false, true, true)))
  }

  test("str.slice is 0-based and length-clamped (string.py:336-380)") {
    val t = strTable5.mutate(
      "j" -> C("a").str.slice(lit(0L), lit(2L)),
      "k" -> C("b").str.slice(lit(4L), lit(10L)))
    assert(col(t, "j", "k") == Seq(
      Seq("  ", "1"), Seq("--", "sform"), Seq(" A", "*m"),
      Seq("-O", ""), Seq("", "bbabba")))
  }

  test("// and % follow C sign conventions (arithmetic.py:68-127)") {
    val t = tbl(Seq((1L, 65L, 7L), (2L, -65L, 7L), (3L, 65L, -7L),
        (4L, -65L, -7L)).toDF("_i", "a", "b"))
      .mutate("fd" -> C("a").floorDiv(C("b")), "md" -> C("a") % C("b"))
    assert(col(t, "fd", "md") == Seq(
      Seq(9L, 2L), Seq(-9L, -2L), Seq(-9L, 2L), Seq(9L, -2L)))
  }

  test("&&, ||, ^, ! are Kleene three-valued (logical.py)") {
    val t = tbl(Seq[(Long, java.lang.Boolean, java.lang.Boolean)](
        (1L, true, true), (2L, true, false), (3L, true, null),
        (4L, false, false), (5L, false, null), (6L, null, null))
      .toDF("_i", "a", "b"))
      .mutate("and" -> (C("a") && C("b")), "or" -> (C("a") || C("b")),
        "xor" -> (C("a") ^ C("b")), "not" -> !C("a"))
    assert(col(t, "and") == Seq(Seq(true), Seq(false), Seq(null),
      Seq(false), Seq(false), Seq(null)))
    assert(col(t, "or") == Seq(Seq(true), Seq(true), Seq(true),
      Seq(false), Seq(null), Seq(null)))
    assert(col(t, "xor") == Seq(Seq(false), Seq(true), Seq(null),
      Seq(false), Seq(null), Seq(null)))
    assert(col(t, "not") == Seq(Seq(false), Seq(false), Seq(false),
      Seq(true), Seq(true), Seq(null)))
  }

  test("shift with fill value and arranged shift (window.py:56-86)") {
    val t = tbl(Seq[(Long, java.lang.Long, String)](
        (1L, 5L, "r"), (2L, -1L, "True"), (3L, 435L, "??"),
        (4L, -34L, ".  ."), (5L, 8L, "-1/12"), (6L, null, "abc"),
        (7L, 0L, "#"))
      .toDF("_i", "a", "b"))
      .mutate(
        "x" -> C("a").shift(2, lit(-40L), arrange = Seq(C("_i"))),
        "y" -> C("b").shift(1, arrange = Seq(C("a").nullsLast)))
    assert(col(t, "x") == Seq(Seq(-40L), Seq(-40L), Seq(5L), Seq(-1L),
      Seq(435L), Seq(-34L), Seq(8L)))
    assert(col(t, "y") == Seq(Seq("#"), Seq(".  ."), Seq("-1/12"),
      Seq(null), Seq("r"), Seq("??"), Seq("True")))
  }

  test("row_number plain and arranged (window.py:102-135)") {
    val t = tbl(Seq[(Long, java.lang.Long)](
        (1L, 5L), (2L, -1L), (3L, 435L), (4L, -34L), (5L, 8L),
        (6L, null), (7L, 0L))
      .toDF("_i", "a"))
      .mutate(
        "x" -> rowNumber(arrange = Seq(C("_i"))),
        "y" -> rowNumber(arrange = Seq(C("a").nullsFirst)))
    assert(col(t, "x") == Seq(Seq(1L), Seq(2L), Seq(3L), Seq(4L),
      Seq(5L), Seq(6L), Seq(7L)))
    assert(col(t, "y") == Seq(Seq(5L), Seq(3L), Seq(7L), Seq(2L),
      Seq(6L), Seq(1L), Seq(4L)))
  }

  test("rank and dense_rank over duplicates and null (window.py:142-210)") {
    val t = tbl(Seq[(Long, java.lang.Long)](
        (1L, 5L), (2L, -1L), (3L, 435L), (4L, -1L), (5L, 8L),
        (6L, null), (7L, 8L))
      .toDF("_i", "a"))
      .mutate(
        "x" -> rank(arrange = Seq(C("a").nullsFirst)),
        "y" -> denseRank(arrange = Seq(C("a").nullsFirst)))
    assert(col(t, "x") == Seq(Seq(4L), Seq(2L), Seq(7L), Seq(2L),
      Seq(5L), Seq(1L), Seq(5L)))
    assert(col(t, "y") == Seq(Seq(3L), Seq(2L), Seq(5L), Seq(2L),
      Seq(4L), Seq(1L), Seq(4L)))
  }

  test("horizontal max/min are null-skipping, null only if all null (horizontal.py:35-90)") {
    val t = tbl(Seq[(Long, java.lang.Long, java.lang.Long, java.lang.Long)](
        (1L, 5L, -45L, 10L), (2L, null, null, null), (3L, 435L, 6L, 2L),
        (4L, -1L, 23L, null), (5L, 8L, -1L, -53L), (6L, null, 0L, 3L))
      .toDF("_i", "a", "b", "c"))
      .mutate("mx" -> hmax(C("a"), C("b"), C("c")),
        "mn" -> hmin(C("a"), C("b"), C("c")))
    assert(col(t, "mx") == Seq(Seq(10L), Seq(null), Seq(435L), Seq(23L),
      Seq(8L), Seq(3L)))
    assert(col(t, "mn") == Seq(Seq(-45L), Seq(null), Seq(2L), Seq(-1L),
      Seq(-53L), Seq(0L)))
  }

  test("coalesce takes the first non-null in argument order (horizontal.py:93-136)") {
    val t = tbl(Seq[(Long, java.lang.Long, java.lang.Long, java.lang.Long)](
        (1L, 5L, -45L, 10L), (2L, null, null, 2L), (3L, 435L, 6L, null),
        (4L, -1L, 23L, null), (5L, 8L, 1L, null), (6L, null, 0L, null))
      .toDF("_i", "a", "b", "c"))
      .mutate("x" -> coalesce(C("a"), C("b"), C("c")),
        "y" -> coalesce(C("c"), C("b"), C("a")))
    assert(col(t, "x") == Seq(Seq(5L), Seq(2L), Seq(435L), Seq(-1L),
      Seq(8L), Seq(0L)))
    assert(col(t, "y") == Seq(Seq(10L), Seq(2L), Seq(6L), Seq(23L),
      Seq(1L), Seq(0L)))
  }

  test("map routes listed keys, default for the rest (col_expr.py:258-277)") {
    val t = tbl(Seq((1L, 4L), (2L, 3L), (3L, -35L), (4L, 24L), (5L, 105L))
      .toDF("_i", "a"))
      .mutate("map" -> C("a").map(Map[ColExpr, ColExpr](
        lit(4L) -> lit(true), lit(3L) -> lit(true),
        lit(-35L) -> lit(false), lit(105L) -> lit(false))))
    assert(col(t, "map") == Seq(Seq(true), Seq(true), Seq(false),
      Seq(null), Seq(false)))
  }

  test("cast Float64 -> Int32 truncates toward zero (col_expr.py:355-371)") {
    val t = tbl(Seq((1L, 3.5), (2L, 10.3), (3L, -434.4), (4L, -0.2))
      .toDF("_i", "a"))
      .mutate("b" -> C("a").cast(IntegerType))
    assert(col(t, "b") == Seq(Seq(3), Seq(10), Seq(-434), Seq(0)))
  }

  // ---------------- verb doctests (pipe/verbs.py) ----------------

  test("arrange: multi-key with null placement and descending (verbs.py:707-743)") {
    val t = tbl(Seq[(java.lang.Long, String, java.lang.Double)](
        (2L, "l", 0.655), (7L, "o", -4.33), (3L, "a", null),
        (2L, "c", 143.6), (6L, "s", 0.0), (null, "---", 1.0),
        (4L, "3", 4.5))
      .toDF("r", "s", "p"))
    assert(rows(t.arrange(C("r").nullsFirst, C("p")).select(C("s"))) ==
      Seq(Seq("---"), Seq("l"), Seq("c"), Seq("a"), Seq("3"), Seq("s"), Seq("o")))
    assert(rows(t.arrange(C("p").desc.nullsLast, C("s")).select(C("s"))) ==
      Seq(Seq("c"), Seq("3"), Seq("---"), Seq("l"), Seq("s"), Seq("o"), Seq("a")))
  }

  test("slice_head selects n rows from an offset (verbs.py:968-984)") {
    val t = tbl(Seq((1L, 65L, "l"), (2L, 5L, "r"), (3L, 312L, "srq"),
        (4L, -55L, "---"), (5L, 0L, " "))
      .toDF("_i", "a", "b"))
      .arrange(C("_i")).sliceHead(3, offset = 1)
    assert(col(t, "a", "b") == Seq(
      Seq(5L, "r"), Seq(312L, "srq"), Seq(-55L, "---")))
  }

  test("left join keeps unmatched left rows, suffixes clashing right columns (verbs.py:1073-1092)") {
    val t1 = tbl(Seq(3L, 1L, 4L, 1L, 5L, 9L, 4L).toDF("a"), "t1")
    val t2 = tbl(Seq((4L, "f"), (4L, "g"), (1L, "h"), (7L, "i"))
      .toDF("a", "b"), "t2")
    val j = t1.leftJoin(t2, t1.col("a") === t2.col("a"))
    // the doctest prints `b` as `b_t2`, but the reference's own rename
    // rule (verbs.py:1201-1204) suffixes ONLY clashing columns when
    // nothing except join columns clashes — the printed frame predates
    // that rule; we match the implemented semantics
    assert(j.columns == Seq("a", "a_t2", "b"))
    val got = rows(j).map(r => (r(0), r(1), r(2)))
      .sortBy(x => (x._1.asInstanceOf[Long],
        Option(x._3).map(_.toString).getOrElse("")))
    assert(got == Seq(
      (1L, 1L, "h"), (1L, 1L, "h"), (3L, null, null),
      (4L, 4L, "f"), (4L, 4L, "f"), (4L, 4L, "g"), (4L, 4L, "g"),
      (5L, null, null), (9L, null, null)))
  }

  test("union concatenates matching-schema tables (verbs.py:1445-1462)") {
    val t1 = tbl(Seq((1L, 4L), (2L, 5L), (3L, 6L)).toDF("a", "b"), "t1")
    val t2 = tbl(Seq((7L, 9L), (8L, 10L)).toDF("a", "b"), "t2")
    val u = t1.union(t2)
    assert(rows(u.arrange(C("a"))) == Seq(
      Seq(1L, 4L), Seq(2L, 5L), Seq(3L, 6L), Seq(7L, 9L), Seq(8L, 10L)))
  }

  test("alias enables a self join; suffix disambiguates (verbs.py:120-147)") {
    val t = tbl(Seq((4L, "l"), (2L, "g"), (1L, "uu"), (4L, "--   r"))
      .toDF("a", "b"), "t")
    val s = t.alias("s")
    val j = t.innerJoin(s, t.col("a") === s.col("a"),
      suffix = Some("_right"))
    assert(j.columns == Seq("a", "b", "a_right", "b_right"))
    val got = rows(j).map(r => (r(0), r(1), r(3)))
      .sortBy(x => (x._1.asInstanceOf[Long], x._2.toString, x._3.toString))
    assert(got == Seq(
      (1L, "uu", "uu"), (2L, "g", "g"),
      (4L, "--   r", "--   r"), (4L, "--   r", "l"),
      (4L, "l", "--   r"), (4L, "l", "l")))
  }

  test("grouped mutate broadcasts per-group aggregates (verbs.py:818-845)") {
    val t = tbl(Seq[(Long, Double, String, java.lang.Boolean, Long)](
        (1L, 1.2, "a  ", true, 4L), (2L, 5.077, "transform", false, 4L),
        (3L, -2.29, "pipedag", null, 2L), (4L, -0.0, "cdegh", null, 0L),
        (5L, 3.0, "  -ade ", true, 1L), (6L, -7.7, "  pq", true, 0L))
      .toDF("_i", "a", "b", "c", "d"))
      .groupBy(C("c"))
      .mutate(
        "u" -> (C("b").str.len.max() + C("a").min()),
        "v" -> C("d").mean(filter = C("a") >= lit(0.0)))
      .ungroup
    def r6(vs: Seq[Seq[Any]]): Seq[Seq[Any]] = vs.map(_.map {
      case d: Double => math.rint(d * 1e6) / 1e6
      case v => v
    })
    assert(r6(col(t, "u")) == Seq(Seq(-0.7), Seq(14.077), Seq(4.71),
      Seq(4.71), Seq(-0.7), Seq(-0.7)))
    assert(r6(col(t, "v")) == Seq(Seq(2.5), Seq(4.0), Seq(0.0),
      Seq(0.0), Seq(2.5), Seq(2.5)))
  }

  test("summarize: grouped aggregates with filter kwarg (verbs.py:881-907)") {
    val t = tbl(Seq[(Long, Double, String, java.lang.Boolean)](
        (1L, 1.2, "a  ", true), (2L, 5.077, "transform", false),
        (3L, -2.29, "pipedag", null), (4L, -0.0, "cdegh", null),
        (5L, 3.0, "  -ade ", true), (6L, -7.7, "  pq", true))
      .toDF("_i", "a", "b", "c"))
      .groupBy(C("c"))
      .summarize(
        "u" -> C("b").str.len.mean(),
        "v" -> C("a").sum(filter = C("a") >= lit(0.0)))
    val got = rows(t).map(r => (r(0),
      math.rint(r(1).asInstanceOf[Double] * 1e6) / 1e6,
      math.rint(r(2).asInstanceOf[Double] * 1e6) / 1e6)).toSet
    assert(got == Set(
      (true, 4.666667, 4.2), (null, 6.0, 0.0), (false, 9.0, 5.077)))
  }

  test("collect materializes mid-pipeline; downstream verbs still apply (verbs.py:113-137)") {
    val t = tbl(Seq((1L, 4L, "l"), (2L, 2L, "g"), (3L, 1L, "uu"),
        (4L, 4L, "--   r"))
      .toDF("_i", "a", "b"))
      .mutate("z" -> (C("a") + C("b").str.len))
      .collectNow()
      .arrange(C("z"), C("a"), C("_i"))
    assert(rows(t.select(C("a"), C("z"))) == Seq(
      Seq(1L, 3L), Seq(2L, 3L), Seq(4L, 5L), Seq(4L, 10L)))
  }
}
