package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._
import graft.table.Table

/** Construction sources (csv/json/orc/catalog/sql) and sinks
  * (parquet/orc/csv/json, partitioned, bucketed catalog tables) —
  * the Spark-first analog of the reference's host-engine source layer
  * (table_impl.py:55-115). */
class SourceSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  private def t = tbl(Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
    .toDF("id", "grp", "v"))

  test("csv round-trip with explicit schema keeps types") {
    val p = tmp("graft_csv")
    t.writeCsv(p)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("grp", StringType), StructField("v", DoubleType)))
    val back = Table.fromCsv(spark, p, "t_csv", schema = Some(schema))
    assert(back.columns == Seq("id", "grp", "v"))
    assert(rows(back.arrange(C("id")).select(C("id"), C("v"))) ==
      Seq(Seq(1L, 1.5), Seq(2L, 2.5), Seq(3L, 3.5)))
  }

  test("json round-trip and the full verb surface over a json source") {
    val p = tmp("graft_json")
    t.writeJson(p)
    val back = Table.fromJson(spark, p, "t_json")
    val agg = back.groupBy(C("grp"))
      .summarize("s" -> C("v").sum())
      .arrange(C("grp"))
    assert(rows(agg) == Seq(Seq("a", 5.0), Seq("b", 2.5)))
  }

  test("orc round-trip") {
    val p = tmp("graft_orc")
    t.writeOrc(p)
    assert(Table.fromOrc(spark, p, "t_orc").count() == 3)
  }

  test("partitioned parquet write prunes partitions on read") {
    val p = tmp("graft_part")
    t.writeParquet(p, partitionCols = Seq("grp"))
    // partition dirs exist…
    val dirs = new java.io.File(p).listFiles().map(_.getName).filter(_.startsWith("grp="))
    assert(dirs.toSet == Set("grp=a", "grp=b"))
    // …and a filtered scan only reads the matching partition
    val back = Table.fromParquet(spark, p, "t_part").filter(C("grp") === lit("a"))
    val plan = back.toDF.queryExecution.executedPlan.toString
    assert(back.count() == 2)
    assert(!plan.contains("grp=b"))
  }

  test("bucketed saveAsTable + catalog source reads back shuffle-free joins") {
    spark.sql("DROP TABLE IF EXISTS graft_bucketed")
    t.saveAsTable("graft_bucketed", bucketBy = Some((4, Seq("id"))),
      mode = "overwrite")
    val back = Table.fromTable(spark, "graft_bucketed")
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("id", "grp", "v"))
    spark.sql("DROP TABLE IF EXISTS graft_bucketed")
  }

  test("fromSql source") {
    t.toDF.createOrReplaceTempView("graft_sql_src")
    val s = Table.fromSql(spark,
      "SELECT id * 10 AS id10 FROM graft_sql_src WHERE id <= 2", "sq")
    assert(rows(s.arrange(C("id10"))) == Seq(Seq(10L), Seq(20L)))
  }
}
