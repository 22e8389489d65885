package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._
import graft.table.Table

/** Port of the reference's backend-equivalence fixtures
  * (tests/test_backend_equivalence/conftest.py:13-252): adversarial
  * values — negative zero, 1e50/1e-51 doubles, 30k-char strings, int
  * boundaries, nulls everywhere. Each pipeline runs through BOTH
  * compilation paths (DataFrame compiler and build_query SQL text) and
  * must agree; goldens where the reference fixes exact semantics. */
class FixturesSpec extends SparkSpec {
  import spark.implicits._

  private def toParquetTable(df: DataFrame, name: String): Table = {
    val dir = Files.createTempDirectory(s"graft_fx_$name").toString
    df.write.mode("overwrite").parquet(dir)
    Table.fromParquet(spark, dir, name)
  }

  // df_num (conftest.py:195): ±0.0, 1e50, 1e-51, nulls
  private lazy val dfNum = toParquetTable(Seq[(java.lang.Long, java.lang.Double, java.lang.Double)](
    (1L, 0.0, -0.0), (2L, -0.0, 1e50), (3L, 1e-51, -1.2e-39),
    (4L, null, 2.5), (5L, 3.14, null)).toDF("id", "a", "b"), "df_num")

  // df_int (conftest.py:228): 1<<31 boundaries, near-all-null col
  private lazy val dfInt = toParquetTable(Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
    (1L, (1L << 31) - 1, null), (2L, -(1L << 31), null), (3L, 1L << 31, 7L),
    (4L, null, null)).toDF("id", "a", "null_s"), "df_int")

  // df_strings (conftest.py:64): empty/whitespace/LIKE metachars/numeric-with-ws
  private lazy val dfStrings = toParquetTable(Seq[(java.lang.Long, String, String)](
    (1L, "", "g1"), (2L, "   ", "g1"), (3L, "%_%", "g1"),
    (4L, " 42 ", "g2"), (5L, "MiXeD", "g2"), (6L, null, "g2"),
    (7L, "x" * 30000, "g3")).toDF("id", "s", "gb"), "df_strings")

  private def bothPathsEqual(t: Table): Unit = {
    val viaDf = t.collect().map(_.toSeq).toSeq
    val viaSql = spark.sql(t.buildQuerySql).collect().map(_.toSeq).toSeq
    assert(viaDf == viaSql, s"paths diverged:\n${t.buildQuerySql}")
  }

  test("adversarial doubles: arithmetic/compare/clip survive both paths") {
    bothPathsEqual(dfNum
      .mutate(
        "sum" -> (C("a") + C("b")),
        "prod" -> (C("a") * C("b")),
        "cmp" -> (C("a") < C("b")),
        "cl" -> C("a").clip(lit(-1.0), lit(1.0)),
        "mx" -> hmax(C("a"), C("b")))
      .arrange(C("id")))
  }

  test("negative zero sorts/compares like zero; 1e50 survives round-trip") {
    val r = dfNum.filter(C("a") === lit(0.0)).arrange(C("id"))
      .select(C("id")).collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 2L)) // both 0.0 and -0.0 match
    val big = dfNum.filter(C("b") === lit(1e50)).select(C("b")).collect()
    assert(big.head.getDouble(0) == 1e50)
  }

  test("int boundaries: 1<<31 arithmetic is 64-bit; near-all-null aggregates") {
    bothPathsEqual(dfInt
      .mutate("twice" -> (C("a") + C("a")), "m" -> (C("a") % lit(1000L)))
      .arrange(C("id")))
    val agg = dfInt.summarize(
      "s" -> C("null_s").sum(), "n" -> C("null_s").count(), "mx" -> C("null_s").max())
    assert(rows(agg) == Seq(Seq(7L, 1L, 7L)))
  }

  test("adversarial strings: empty/whitespace/metachars/30k chars") {
    bothPathsEqual(dfStrings
      .mutate(
        "ln" -> C("s").str.len,
        "tr" -> C("s").str.strip,
        "up" -> C("s").str.upper,
        "has_pct" -> C("s").str.contains("%", allowRegex = false),
        "sl" -> C("s").str.slice(lit(0), lit(3)))
      .arrange(C("id")))
    // contains with a literal % must NOT behave like LIKE (sql.py:734-740)
    val pct = dfStrings.filter(C("s").str.contains("%", allowRegex = false))
      .select(C("id")).collect().map(_.getLong(0)).toSeq
    assert(pct == Seq(3L))
    // numeric cast strips whitespace first (polars.py:227-230)
    val casted = dfStrings.filter(C("id") === lit(4L))
      .mutate("n" -> C("s").tryCast(LongType)).select(C("n"))
    assert(rows(casted) == Seq(Seq(42L)))
    // 30k-char strings survive grouping and length
    val g3 = dfStrings.filter(C("gb") === lit("g3"))
      .groupBy(C("s")).summarize("n" -> count(), "l" -> C("s").str.len.max())
    assert(rows(g3.select(C("n"), C("l"))) == Seq(Seq(1L, 30000L)))
  }

  test("window functions over null-heavy columns (test_window_function.py)") {
    bothPathsEqual(dfInt
      .mutate(
        "rn" -> rowNumber(arrange = Seq(C("null_s").nullsLast, C("id"))),
        "prev" -> C("null_s").shift(1, arrange = Seq(C("id"))))
      .arrange(C("id")))
  }

  test("grouped aggregates over adversarial groups both paths") {
    bothPathsEqual(dfStrings
      .groupBy(C("gb"))
      .summarize(
        "n" -> count(),
        "n_nonnull" -> C("s").count(),
        "mx" -> C("s").max())
      .arrange(C("gb")))
  }
}
