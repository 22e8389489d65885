package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.table.Table

/** Shared session per JVM (one per test run). */
object SparkSpec {
  lazy val session: SparkSession = {
    // Per-run warehouse + metastore so catalog tests are idempotent:
    // a managed table's directory must not outlive the Derby metastore
    // that knows about it (otherwise saveAsTable hits
    // LOCATION_ALREADY_EXISTS on the next JVM).
    val runDir = java.nio.file.Files.createTempDirectory("graft_test_")
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", runDir.resolve("warehouse").toString)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${runDir.resolve("metastore_db")};create=true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.timeType.enabled", "true") // Spark 4 TIME — graft Time type
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  def tbl(df: DataFrame, name: String = "t"): Table = Table.fromDF(df, name)

  /** rows of the visible projection, as Seq of Seq (null-safe). */
  def rows(t: Table): Seq[Seq[Any]] =
    t.collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))
  def rowsDF(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))

  def assertRows(t: Table, expected: Seq[Seq[Any]]): Unit =
    assert(rows(t) == expected)
}
