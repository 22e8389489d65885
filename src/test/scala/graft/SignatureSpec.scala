package graft

import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._

/** Eager signature checking: ill-typed expressions must raise
  * GraftTypeError at verb application, before Spark sees the plan
  * (mirrors reference tests/test_core.py type-error cases and the
  * backend-equivalence error tests). */
class SignatureSpec extends SparkSpec {
  import spark.implicits._

  private def t = tbl(Seq((1L, "a", 1.5, true)).toDF("i", "s", "d", "b"))
  private def err(body: => Any): GraftTypeError =
    intercept[GraftTypeError](body)

  // ---- string ops on non-strings ----
  test("str.upper on Int is rejected at construction") {
    val e = err(t.mutate("x" -> C("i").str.upper))
    assert(e.getMessage.contains("str.upper") && e.getMessage.contains("bigint"))
  }
  test("str.len / strip / replace_all on numeric are rejected") {
    err(t.mutate("x" -> C("d").str.len))
    err(t.mutate("x" -> C("i").str.strip))
    err(t.mutate("x" -> C("i").str.replaceAll("a", "b")))
  }

  // ---- comparisons across incompatible types ----
  test("eq/ne between Int and String are rejected") {
    err(t.filter(C("i") === C("s")))
    err(t.filter(C("i") =!= C("s")))
  }
  test("lt between Bool and Int, and String vs Float, are rejected") {
    err(t.filter(C("b") < C("i")))
    err(t.filter(C("s") >= C("d")))
  }
  test("numeric comparisons still accept Int vs Float") {
    assert(rows(t.filter(C("i") <= C("d"))).nonEmpty)
  }

  // ---- logical ops require Bool ----
  test("and/or/not on non-Bool are rejected") {
    err(t.filter(C("i") && C("b")))
    err(t.filter(C("b") || C("s")))
    err(t.filter(!C("i")))
  }

  // ---- arithmetic ----
  test("add between Int and String is rejected; String+String concats") {
    err(t.mutate("x" -> (C("i") + C("s"))))
    assert(rows(t.mutate("x" -> (C("s") + C("s"))).select(C("x"))) ==
      Seq(Seq("aa")))
  }
  test("floordiv/mod require integral args") {
    err(t.mutate("x" -> C("d").floorDiv(C("i"))))
    err(t.mutate("x" -> (C("d") % C("i"))))
    assert(rows(t.mutate("x" -> (C("i") % C("i"))).select(C("x"))) == Seq(Seq(0L)))
  }
  test("unary pos is the numeric identity and rejects strings") {
    assert(rows(t.mutate("x" -> +C("d")).select(C("x"))) == Seq(Seq(1.5)))
    err(t.mutate("x" -> +C("s")))
  }

  // ---- float-only transcendentals accept Int via implicit conversion ----
  test("log/sqrt accept Int (Int→Float) but reject String/Bool") {
    assert(rows(t.mutate("x" -> C("i").log).select(C("x"))).nonEmpty)
    err(t.mutate("x" -> C("s").sqrt))
    err(t.mutate("x" -> C("b").sin))
  }

  // ---- datetime namespaces ----
  test("dt extractors reject non-datetime; dur extractors accept Long") {
    err(t.mutate("x" -> C("s").dt.year))
    err(t.mutate("x" -> C("d").dt.hour))
    assert(rows(t.mutate("x" -> C("i").dur.days).select(C("x"))) == Seq(Seq(0L)))
  }
  test("hour/minute on Date are rejected, year/month accepted") {
    val td = tbl(Seq(Tuple1(java.sql.Date.valueOf("2024-03-01"))).toDF("dt"))
    assert(rows(td.mutate("y" -> C("dt").dt.year).select(C("y"))) == Seq(Seq(2024L)))
    err(td.mutate("h" -> C("dt").dt.hour))
  }

  // ---- aggregations ----
  test("sum on String and any on Int are rejected") {
    err(t.summarize("x" -> C("s").sum()))
    err(t.summarize("x" -> C("i").any()))
    assert(rows(t.summarize("x" -> C("b").sum())) == Seq(Seq(1L)))
  }
  test("mean/median reject non-numeric") {
    err(t.summarize("x" -> C("s").mean()))
    err(t.summarize("x" -> C("b").median()))
  }

  // ---- Const enforcement ----
  test("clip bounds must be literals (Const), matching the reference") {
    assert(rows(t.mutate("x" -> C("d").clip(lit(0.0), lit(1.0))).select(C("x"))) ==
      Seq(Seq(1.0)))
    val e = err(t.mutate("x" -> C("d").clip(C("d"), lit(1.0))))
    assert(e.getMessage.contains("Const"))
  }
  test("shift n and fill must be literals; fill must unify with the column") {
    err(t.mutate("x" -> C("i").shift(1, fill = C("i"),
      arrange = Seq(C("i")))))
    err(t.mutate("x" -> C("i").shift(1, fill = lit("z"),
      arrange = Seq(C("i")))))
  }

  // ---- horizontal / varargs ----
  test("h.any requires all-Bool; coalesce requires unifiable args") {
    err(t.mutate("x" -> hany(C("b"), C("i"))))
    err(t.mutate("x" -> coalesce(C("i"), C("s"))))
    assert(rows(t.mutate("x" -> coalesce(C("i"), lit(0L))).select(C("x"))) ==
      Seq(Seq(1L)))
  }
  test("h.sum concatenates strings (reference String signature)") {
    assert(rows(t.mutate("x" -> hsum(C("s"), C("s"), C("s"))).select(C("x"))) ==
      Seq(Seq("aaa")))
  }

  // ---- fill_null / is_in unification ----
  test("fill_null with a non-unifiable replacement is rejected") {
    err(t.mutate("x" -> C("i").fillNull(lit("zero"))))
  }
  test("is_in mixes only unifiable types; null literal always fits") {
    err(t.filter(C("i").isIn(lit(1L), lit("x"))))
    assert(rows(t.filter(C("i").isIn(lit(1L), lit(null)))).nonEmpty)
  }

  // ---- Enum (reference types.py Enum: String + value-set check) ----
  test("comparing an Enum column to an out-of-set literal is rejected") {
    val abc = EnumType(Seq("a", "b"))
    val te = t.mutate("e" -> C("s").cast(abc))
    val e1 = err(te.filter(C("e") === lit("zzz")))
    assert(e1.getMessage.contains("not a member") &&
      e1.getMessage.contains("enum(a, b)"))
    err(te.mutate("x" -> C("e").isIn(lit("a"), lit("nope"))))
    err(te.mutate("x" -> C("e").fillNull(lit("q"))))
    // in-set literals pass
    assert(rows(te.filter(C("e") === lit("a"))).nonEmpty)
  }
  test("only String casts to Enum; Enum lca follows the reference") {
    err(t.mutate("x" -> C("i").cast(EnumType(Seq("a")))))
    assert(DTypes.lca(EnumType(Seq("a")), StringType) == StringType)
    assert(DTypes.lca(EnumType(Seq("a")), EnumType(Seq("b"))) == StringType)
    assert(DTypes.lca(EnumType(Seq("a")), EnumType(Seq("a"))) ==
      EnumType(Seq("a")))
    intercept[GraftTypeError](DTypes.lca(EnumType(Seq("a")), LongType))
  }

  test("decimal arithmetic typing matches Spark's runtime schema (carry digit)") {
    import graft.compile.Typing
    import org.apache.spark.sql.functions.{col => scol}
    val df = Seq(("1.25", "3.5012")).toDF("sa", "sb")
      .select(scol("sa").cast(DecimalType(12, 2)).as("a"),
        scol("sb").cast(DecimalType(10, 4)).as("b"))
    val td = tbl(df, "dec")
    val m = td.mutate("s" -> (C("a") + C("b")), "p" -> (C("a") * C("b")),
      "l" -> (C("a") + lit(7L)))
    val sch = m.toDF.schema
    val (a, b) = (td.col("a"), td.col("b"))
    val look: Long => DataType =
      Map(a.uuid -> DecimalType(12, 2), b.uuid -> DecimalType(10, 4))
    // typed dtype == runtime schema dtype, carry digit included
    assert(Typing.dtypeOf(a + b, look) == sch("s").dataType)
    assert(Typing.dtypeOf(a * b, look) == sch("p").dataType)
    assert(Typing.dtypeOf(a + lit(7L), look) == sch("l").dataType)
    assert(sch("s").dataType == DecimalType(15, 4)) // max(10,6)+4+1
    assert(sch("p").dataType == DecimalType(23, 6)) // 12+10+1, 2+4
  }

  // ---- Decimal lca (reference types.py:208-216) ----
  test("Decimal lca widens precision/scale instead of collapsing to Double") {
    assert(DTypes.lca(DecimalType(10, 2), DecimalType(12, 4)) == DecimalType(12, 4))
    assert(DTypes.lca(DecimalType(10, 2), DecimalType(20, 0)) == DecimalType(22, 2))
    assert(DTypes.lca(DecimalType(10, 2), LongType) == DecimalType(22, 2))
    assert(DTypes.lca(DecimalType(10, 2), DoubleType) == DoubleType)
  }

  // ---- UInt types (reference types.py UInt8..UInt64; SURVEY §1.2) ----
  test("UInt carriers follow the SURVEY mapping and widths unify upward") {
    assert(UIntType(8).carrier == ShortType)
    assert(UIntType(16).carrier == IntegerType)
    assert(UIntType(32).carrier == LongType)
    assert(UIntType(64).carrier == DecimalType(20, 0))
    intercept[IllegalArgumentException](UIntType(12))
    // lca: widths unify upward; vs other types the carrier decides
    assert(DTypes.lca(UIntType(8), UIntType(32)) == UIntType(32))
    assert(DTypes.lca(UIntType(8), IntegerType) == IntegerType)
    assert(DTypes.lca(UIntType(32), DoubleType) == DoubleType)
    // Decimal(20,0) already covers Long's 19 digits — no widening needed
    assert(DTypes.lca(UIntType(64), LongType) == DecimalType(20, 0))
  }

  test("UInt cast: strict raises out-of-range, try_cast nulls, metadata survives") {
    val t2 = tbl(Seq((200L, -5L, "77"), (300L, 3L, "bad"))
      .toDF("big", "sgn", "st"), "u")
    // try_cast: out-of-range → null, in-range → carrier value
    val got = t2.mutate(
        "u8" -> C("big").tryCast(UIntType(8)),
        "un" -> C("sgn").tryCast(UIntType(8)),
        "us" -> C("st").tryCast(UIntType(16)))
      .toDF.collect().map(r => (r.get(3), r.get(4), r.get(5))).toSeq
    assert(got == Seq((200.toShort, null, 77), (null, 3.toShort, null)))
    // strict: raises on the 300 row (raise_error → SparkRuntimeException)
    val ex = intercept[Exception] {
      t2.mutate("u8" -> C("big").cast(UIntType(8))).toDF.collect()
    }
    assert(ex.getMessage.contains("strict cast"))
    // typing: non-numeric sources are rejected eagerly
    val t3 = tbl(Seq(Tuple1(java.sql.Date.valueOf("2024-01-01"))).toDF("d"))
    err(t3.mutate("x" -> C("d").cast(UIntType(16))))
    // uint-ness survives verbs as metadata; arithmetic dissolves to the
    // carrier (Short + Long literal → Long)
    val m = t2.mutate("u8" -> C("big").tryCast(UIntType(8)))
      .select(C("u8")).mutate("y" -> (C("u8") + lit(1L)))
    assert(m.col("u8").dtype == UIntType(8))
    assert(m.toDF.schema("y").dataType == LongType)
  }
}
