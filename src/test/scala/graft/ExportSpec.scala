package graft

import graft.core._
import graft.dsl._

/** Export targets + eval_aligned escape hatch. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def t = tbl(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))

  test("exportScalar / exportMaps / exportColumns / toLocalIterator") {
    assert(t.summarize("n" -> count()).exportScalar == 2L)
    intercept[GraftError] { t.exportScalar }
    val maps = t.arrange(C("id")).exportMaps
    assert(maps == Seq(Map("id" -> 1L, "s" -> "a"), Map("id" -> 2L, "s" -> "b")))
    val cols = t.arrange(C("id")).exportColumns
    assert(cols("s") == Seq("a", "b"))
    assert(t.toLocalIterator.size == 2)
    assert(t.backend == "spark" && t.isSqlBacked)
  }

  test("evalAligned splices a column from another table by row position") {
    val other = tbl(Seq(10.0, 20.0).toDF("v"), "o")
    val j = t.arrange(C("id")).evalAligned(other, "v2" -> (C("v") * lit(3.0)))
    assert(j.columns == Seq("id", "s", "v2"))
    assert(rows(j.arrange(C("id")).select(C("v2"))) == Seq(Seq(30.0), Seq(60.0)))
    intercept[GraftError] { t.evalAligned(other, "s" -> C("v")) }
  }

  test("withColumnFromSeq splices external local data positionally") {
    val j = t.arrange(C("id")).withColumnFromSeq("w", Seq(0.5, 0.7))
    assert(j.columns == Seq("id", "s", "w"))
    assert(rows(j.arrange(C("id")).select(C("w"))) == Seq(Seq(0.5), Seq(0.7)))
  }

  test("collectNow materializes and keeps pipelining") {
    val c = t.mutate("x" -> (C("id") * lit(2L))).collectNow()
    assert(c.filter(C("x") > lit(2L)).count() == 1)
  }

  test("buildQuery returns the optimized plan text") {
    assert(t.buildQuery.nonEmpty)
    assert(t.astRepr.contains("id"))
  }
}
