package graft

import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._

/** Scalar operator semantics: Kleene logic, null propagation, C-style
  * division, casts — golden truth tables from the reference
  * (ops/ops/logical.py, comparison.py, arithmetic.py). */
class ExprOpsSpec extends SparkSpec {
  import spark.implicits._

  private def boolT = tbl(Seq[(java.lang.Boolean, java.lang.Boolean)](
    (true, true), (true, false), (true, null),
    (false, true), (false, false), (false, null),
    (null, true), (null, false), (null, null)).toDF("a", "b"))

  test("three-valued AND/OR/XOR/NOT (logical.py truth tables)") {
    val m = boolT.mutate(
      "and" -> (C("a") && C("b")),
      "or" -> (C("a") || C("b")),
      "xor" -> (C("a") ^ C("b")),
      "not" -> !C("a"))
    val got = rows(m.select(C("and"), C("or"), C("xor"), C("not")))
    assert(got == Seq(
      Seq(true, true, false, false),
      Seq(false, true, true, false),
      Seq(null, true, null, false),
      Seq(false, true, true, true),
      Seq(false, false, false, true),
      Seq(false, null, null, true),
      Seq(null, true, null, null),
      Seq(false, null, null, null),
      Seq(null, null, null, null)))
  }

  test("is_in propagates null like chained equality (comparison.py:55-67)") {
    val t = tbl(Seq[java.lang.Long](1L, 2L, null).toDF("x"))
    val m = t.mutate("in" -> C("x").isIn(lit(1L), lit(5L)))
    assert(rows(m.select(C("in"))) == Seq(Seq(true), Seq(false), Seq(null)))
  }

  test("fill_null / clip / coalesce") {
    val t = tbl(Seq[java.lang.Double](null, -5.0, 0.5, 9.0).toDF("x"))
    val m = t.mutate(
      "f" -> C("x").fillNull(lit(0.0)),
      "c" -> C("x").clip(lit(0.0), lit(1.0)),
      "co" -> coalesce(C("x"), lit(-1.0)))
    assert(rows(m.select(C("f"), C("c"), C("co"))) == Seq(
      Seq(0.0, null, -1.0), Seq(-5.0, 0.0, -5.0),
      Seq(0.5, 0.5, 0.5), Seq(9.0, 1.0, 9.0)))
  }

  test("floordiv truncates toward zero; mod takes dividend sign (C convention)") {
    val t = tbl(Seq((7L, 2L), (-7L, 2L), (7L, -2L), (-7L, -2L)).toDF("a", "b"))
    val m = t.mutate("d" -> C("a").floorDiv(C("b")), "m" -> (C("a") % C("b")))
    assert(rows(m.select(C("d"), C("m"))) == Seq(
      Seq(3L, 1L), Seq(-3L, -1L), Seq(-3L, 1L), Seq(3L, -1L)))
  }

  test("int/int division yields double (arithmetic.py:42)") {
    val t = tbl(Seq((7L, 2L)).toDF("a", "b"))
    assert(rows(t.mutate("q" -> (C("a") / C("b"))).select(C("q"))) == Seq(Seq(3.5)))
  }

  test("string + is concat; bool sum pre-casts to int") {
    val t = tbl(Seq(("ab", "cd", true), ("e", "f", false)).toDF("x", "y", "p"))
    assert(rows(t.mutate("c" -> (C("x") + C("y"))).select(C("c"))) ==
      Seq(Seq("abcd"), Seq("ef")))
    assert(rows(t.summarize("n" -> C("p").sum())) == Seq(Seq(1L)))
  }

  test("cast: float→int truncates toward zero; strict vs try") {
    val t = tbl(Seq(2.7, -2.7).toDF("x"))
    assert(rows(t.mutate("i" -> C("x").cast(LongType)).select(C("i"))) ==
      Seq(Seq(2L), Seq(-2L)))
    val s = tbl(Seq("12", " 34 ", "xx").toDF("x"))
    assert(rows(s.mutate("i" -> C("x").tryCast(LongType)).select(C("i"))) ==
      Seq(Seq(12L), Seq(34L), Seq(null)))
  }

  test("case/when + map sugar (col_expr.py:236-293)") {
    val t = tbl(Seq(1L, 2L, 3L).toDF("x"))
    val m = t.mutate(
      "c" -> when(C("x") === lit(1L)).then_(lit("one"))
        .when(C("x") === lit(2L)).then_(lit("two")).otherwise(lit("many")),
      "m" -> C("x").map(Map((lit(1L): ColExpr) -> lit("I")), default = lit("?")))
    assert(rows(m.select(C("c"), C("m"))) == Seq(
      Seq("one", "I"), Seq("two", "?"), Seq("many", "?")))
  }

  test("string ops: slice is 0-based, replace_all literal, len") {
    val t = tbl(Seq("Hello%World").toDF("s"))
    val m = t.mutate(
      "sl" -> C("s").str.slice(lit(1), lit(4)),
      "rp" -> C("s").str.replaceAll("%", "_"),
      "ln" -> C("s").str.len,
      "up" -> C("s").str.upper,
      "ct" -> C("s").str.contains("%", allowRegex = false))
    assert(rows(m.select(C("sl"), C("rp"), C("ln"), C("up"), C("ct"))) ==
      Seq(Seq("ello", "Hello_World", 11L, "HELLO%WORLD", true)))
  }

  test("datetime parts + ISO day_of_week (datetime.py:49-56)") {
    // 2024-01-01 is a Monday → ISO dow 1; 2024-01-07 Sunday → 7
    val t = tbl(Seq("2024-01-01 10:30:15", "2024-01-07 23:59:59").toDF("s"))
      .mutate("ts" -> C("s").str.toDatetime)
    val m = t.mutate(
      "dow" -> C("ts").dt.dayOfWeek, "y" -> C("ts").dt.year,
      "h" -> C("ts").dt.hour, "doy" -> C("ts").dt.dayOfYear)
    assert(rows(m.select(C("dow"), C("y"), C("h"), C("doy"))) == Seq(
      Seq(1L, 2024L, 10L, 1L), Seq(7L, 2024L, 23L, 7L)))
  }

  test("duration subtraction in μs + extractors") {
    val t = tbl(Seq(("2024-01-03 00:00:01", "2024-01-01 00:00:00")).toDF("a", "b"))
      .mutate("ta" -> C("a").str.toDatetime, "tb" -> C("b").str.toDatetime)
      .mutate("d" -> (C("ta") - C("tb")))
    val m = t.mutate("days" -> C("d").dur.days, "secs" -> C("d").dur.seconds)
    assert(rows(m.select(C("days"), C("secs"))) == Seq(Seq(2L, 172801L)))
  }

  test("horizontal max/min skip nulls (horizontal.py:27,60)") {
    val t = tbl(Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (null, 3.0), (null, null)).toDF("a", "b"))
    val m = t.mutate("mx" -> hmax(C("a"), C("b")), "mn" -> hmin(C("a"), C("b")))
    assert(rows(m.select(C("mx"), C("mn"))) == Seq(
      Seq(2.0, 1.0), Seq(3.0, 3.0), Seq(null, null)))
  }

  test("ftype composition errors (col_expr.py:2478-2533)") {
    val t = tbl(Seq(1.0, 2.0).toDF("v"))
    intercept[GraftFunctionTypeError] { t.summarize("x" -> C("v").sum().sum()) }
    intercept[GraftFunctionTypeError] {
      t.mutate("x" -> C("v").shift(1, arrange = Seq(C("v"))).sum())
    }
  }

  test("strict cast raises on conversion failure (col_expr.py:295-377)") {
    val t = tbl(Seq("12", "abc", "7").toDF("s"))
    val e = intercept[Exception] {
      t.mutate("n" -> C("s").cast(LongType)).collect()
    }
    assert(e.getMessage.contains("strict cast"))
  }

  test("try_cast nulls on failure; strict passes nulls and valid input through") {
    val t = tbl(Seq("12", "abc", "7").toDF("s"))
    assert(rows(t.mutate("n" -> C("s").tryCast(LongType)).select(C("n"))) ==
      Seq(Seq(12L), Seq(null), Seq(7L)))
    // strict cast of NULL input stays null — only non-null failures raise
    val tn = tbl(Seq[(String, String)](("3", null)).toDF("a", "b"))
    assert(rows(tn.mutate("x" -> C("b").cast(LongType)).select(C("x"))) ==
      Seq(Seq(null)))
    // all-valid strict casts still succeed
    assert(rows(t.filter(C("s") =!= lit("abc"))
      .mutate("n" -> C("s").cast(LongType)).select(C("n"))) ==
      Seq(Seq(12L), Seq(7L)))
  }

  test("enum cast: strict raises on out-of-set, try_cast nulls, metadata survives verbs") {
    val oenum = EnumType(Seq("x", "y"))
    val t = tbl(Seq("x", "y", "z").toDF("s"))
    // strict: 'z' is out of set → raise
    val e = intercept[Exception] {
      t.mutate("en" -> C("s").cast(oenum)).collect()
    }
    assert(e.getMessage.contains("strict cast"))
    // try_cast: out-of-set → null; enum survives filter/select and
    // still feeds Str-typed ops + membership-checked literal compares
    val te = t.mutate("en" -> C("s").tryCast(oenum))
    assert(rows(te.select(C("en"))) == Seq(Seq("x"), Seq("y"), Seq(null)))
    assert(rows(te.filter(C("en").isNotNull)
      .mutate("u" -> C("en").str.upper).select(C("u"))) ==
      Seq(Seq("X"), Seq("Y")))
    intercept[GraftTypeError] {
      te.filter(C("en") === lit("not-a-member"))
    }
    // enum → plain string cast is the identity on values
    assert(rows(te.mutate("s2" -> C("en").cast(StringType)).select(C("s2"))) ==
      Seq(Seq("x"), Seq("y"), Seq(null)))
  }

  test("Enum dispatches as String: concat via +, h.sum; union keeps enum-ness") {
    val en = EnumType(Seq("x", "y"))
    val te = tbl(Seq("x", "y").toDF("s")).mutate("en" -> C("s").cast(en))
    // enum + str → concat (NOT numeric reduce silently nulling)
    assert(rows(te.mutate("c" -> (C("en") + lit("!"))).arrange(C("s"))
      .select(C("c"))) == Seq(Seq("x!"), Seq("y!")))
    // h.sum over (enum, str) → concat
    assert(rows(te.mutate("h" -> hsum(C("en"), C("s"))).arrange(C("s"))
      .select(C("h"))) == Seq(Seq("xx"), Seq("yy")))
    // union of two identical-enum sides keeps the enum: out-of-set
    // literal compares must still be rejected afterwards
    val u = te.select(C("en")).union(te.select(C("en")))
    intercept[GraftTypeError] { u.filter(C("en") === lit("zzz")) }
    assert(rows(u.filter(C("en") === lit("x"))).size == 2)
  }

  test("build_query emits the same strict-cast raise guard (SQL = DF)") {
    val part = graft.table.Table.source(spark, "/root/testdata/sf0.001", "part")
    val q = part.mutate("n" -> C("p_name").cast(LongType))
      .select(C("n")).buildQuerySql
    val sqlErr = intercept[Exception] { spark.sql(q).collect() }
    assert(sqlErr.getMessage.contains("strict cast"))
  }
}
