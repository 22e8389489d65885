package graft

import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._
import graft.table.Table

/** build_query (SQL text) ≡ the DataFrame compiler: for representative
  * pipelines, running the emitted Spark SQL must reproduce the Table's
  * own result exactly. */
class SqlGenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def li = Table.source(spark, dir, "lineitem")
  private def orders = Table.source(spark, dir, "orders")
  private def nation = Table.source(spark, dir, "nation")

  private def assertSqlEq(t: Table): Unit = {
    val sql = t.buildQuerySql
    val viaSql = spark.sql(sql).collect().map(_.toSeq).toSeq
    val viaDf = t.collect().map(_.toSeq).toSeq
    assert(viaDf == viaSql, s"\nSQL was:\n$sql")
  }

  test("filter + mutate + arrange emits runnable SQL") {
    assertSqlEq(li
      .filter(C("l_quantity") > lit(45.0))
      .mutate("net" -> (C("l_extendedprice") * (lit(1.0) - C("l_discount"))))
      .select(C("l_orderkey"), C("l_linenumber"), C("net"))
      .arrange(C("l_orderkey"), C("l_linenumber")))
  }

  test("group_by + summarize with filter kwarg emits SQL") {
    assertSqlEq(li
      .groupBy(C("l_returnflag"))
      .summarize(
        "n" -> count(),
        "cheap" -> count(filter = C("l_extendedprice") < lit(10000.0)),
        "sq" -> C("l_quantity").cast(DecimalType(18, 4)).sum().cast(DoubleType))
      .arrange(C("l_returnflag")))
  }

  test("grouped mutate (agg-as-window) + rank emits SQL") {
    assertSqlEq(orders
      .groupBy(C("o_custkey"))
      .mutate("total" -> C("o_totalprice").cast(DecimalType(18, 4)).sum().cast(DoubleType))
      .ungroup
      .mutate("rn" -> rowNumber(
        arrange = Seq(C("o_totalprice").desc, C("o_orderkey")),
        partitionBy = Seq(C("o_custkey"))))
      .filter(C("rn") <= lit(2L))
      .select(C("o_custkey"), C("o_orderkey"), C("total"), C("rn"))
      .arrange(C("o_custkey"), C("rn")))
  }

  test("join + slice emits SQL") {
    val n2 = nation.alias("n2")
    assertSqlEq(nation
      .innerJoin(n2, (C("n_regionkey") === n2.col("n_regionkey")) &&
        (C("n_nationkey") < n2.col("n_nationkey")))
      .select(C("n_name"), C("n_name_n2"))
      .arrange(C("n_name"), C("n_name_n2"))
      .sliceHead(10, offset = 2))
  }

  test("union all emits SQL") {
    val a = nation.select(C("n_regionkey")).rename(Map("n_regionkey" -> "k"))
    val b = nation.alias("n3").select(C("n_nationkey")).rename(Map("n_nationkey" -> "k"))
    assertSqlEq(a.union(b).groupBy(C("k")).summarize("n" -> count()).arrange(C("k")))
  }

  test("rename/drop/case/cast/string ops emit SQL") {
    assertSqlEq(orders
      .mutate(
        "lab" -> when(C("o_totalprice") < lit(100000.0)).then_(lit("lo")).otherwise(lit("hi")),
        "pk" -> C("o_orderkey").cast(StringType),
        "p1" -> C("o_orderpriority").str.slice(lit(0), lit(1)).tryCast(LongType))
      .rename(Map("o_orderkey" -> "id"))
      .drop(C("o_orderstatus"), C("o_custkey"), C("o_orderdate"), C("o_totalprice"),
        C("o_orderpriority"))
      .arrange(C("id")))
  }

  test("ordered str.join emits LISTAGG WITHIN GROUP") {
    assertSqlEq(nation
      .groupBy(C("n_regionkey"))
      .summarize(
        "names" -> C("n_name").str.join(",", arrange = Seq(C("n_name"))),
        "keys_desc" -> C("n_nationkey").cast(StringType)
          .str.join("|", arrange = Seq(C("n_nationkey").desc)),
        // filter that empties some groups: LISTAGG must yield NULL,
        // matching the compiler's STRING_AGG-parity semantics
        "big" -> C("n_name").str.join(",", arrange = Seq(C("n_name")),
          filter = C("n_nationkey") > lit(20L)))
      .arrange(C("n_regionkey")))
  }

  test("str.join without arrange degrades to non-SQL-expressible") {
    // no row-id surrogate exists in SQL text to pin the element order,
    // so the unordered form must degrade (not silently emit
    // nondeterministic SQL)
    val e = intercept[GraftError] {
      nation.groupBy(C("n_regionkey"))
        .summarize("names" -> C("n_name").str.join(","))
        .buildQuerySql
    }
    assert(e.getMessage.contains("build_query"))
  }

  test("non-SQL-expressible pipelines raise a clear error") {
    val e = intercept[GraftError] {
      tbl(spark.range(3).toDF("x"), "r").buildQuerySql // non-parquet source
    }
    assert(e.getMessage.contains("build_query"))
  }
}
