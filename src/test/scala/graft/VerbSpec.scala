package graft

import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._

/** Verb semantics on tiny literal frames — golden cases derived from the
  * reference's docstring examples (pipe/verbs.py). */
class VerbSpec extends SparkSpec {
  import spark.implicits._

  private def t1 = tbl(Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "b", 40.0)
  ).toDF("id", "g", "v"))

  test("select keeps subset and order; hidden cols stay addressable") {
    val t = t1
    val sel = t.select(C("v"), C("id"))
    assert(sel.columns == Seq("v", "id"))
    // hidden col g still usable through a pre-select handle
    val g = t.col("g")
    assert(sel.mutate("g2" -> g).columns == Seq("v", "id", "g2"))
  }

  test("drop is the complement of select") {
    assert(t1.drop(C("g")).columns == Seq("id", "v"))
  }

  test("rename is metadata-only and supports swaps") {
    val sw = t1.rename(Map("id" -> "g", "g" -> "id"))
    assert(sw.columns == Seq("g", "id", "v"))
    // after the swap, `g` carries the Long ids and `id` the strings
    assert(rows(sw.arrange(C("g")).select(C("id"))) ==
      Seq(Seq("a"), Seq("b"), Seq("a"), Seq("b")))
    intercept[GraftError] { t1.rename(Map("id" -> "g")) }
  }

  test("mutate adds and overwrites; old column stays via handle") {
    val t = t1
    val old = t.col("v")
    val m = t.mutate("v" -> (C("v") * lit(2.0)))
    assert(m.columns == Seq("id", "g", "v"))
    val both = m.mutate("v_old" -> old).arrange(C("id"))
    assert(rows(both.select(C("v"), C("v_old"))).head == Seq(20.0, 10.0))
  }

  test("mutate cannot reference columns created in the same call") {
    intercept[GraftColumnNotFoundError] {
      t1.mutate("x" -> C("v"), "y" -> C("x"))
    }
  }

  test("filter conjunctions + error on non-bool") {
    assert(t1.filter(C("v") > lit(15.0), C("g") === lit("a")).count() == 1)
    intercept[GraftTypeError] { t1.filter(C("v") + lit(1.0)) }
  }

  test("filter rejects aggregates and windows") {
    intercept[GraftFunctionTypeError] { t1.filter(C("v").sum() > lit(1.0)) }
    intercept[GraftFunctionTypeError] {
      t1.filter(rowNumber(arrange = Seq(C("id"))) === lit(1L))
    }
  }

  test("arrange with desc and nulls placement") {
    val t = tbl(Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.0), (2L, null), (3L, 1.0)).toDF("id", "v"))
    assert(rows(t.arrange(C("v").desc).select(C("id"))) == Seq(Seq(2L), Seq(1L), Seq(3L)))
    assert(rows(t.arrange(C("v").desc.nullsLast).select(C("id"))) == Seq(Seq(1L), Seq(3L), Seq(2L)))
    assert(rows(t.arrange(C("v").nullsFirst).select(C("id"))) == Seq(Seq(2L), Seq(3L), Seq(1L)))
  }

  test("summarize: grouped, global, and leaf-rule error") {
    val s = t1.groupBy(C("g")).summarize("n" -> count(), "sv" -> C("v").sum())
      .arrange(C("g"))
    assert(rows(s) == Seq(Seq("a", 2L, 40.0), Seq("b", 2L, 60.0)))
    val g = t1.summarize("n" -> count())
    assert(rows(g) == Seq(Seq(4L)))
    intercept[GraftFunctionTypeError] {
      t1.groupBy(C("g")).summarize("bad" -> C("v"))
    }
    intercept[GraftFunctionTypeError] {
      t1.groupBy(C("g")).summarize("bad" -> rowNumber(arrange = Seq(C("id"))))
    }
  }

  test("summarize with filter kwarg (reference verbs.py:880-906)") {
    val s = t1.groupBy(C("g"))
      .summarize("big" -> C("v").sum(filter = C("v") > lit(15.0)))
      .arrange(C("g"))
    assert(rows(s) == Seq(Seq("a", 30.0), Seq("b", 60.0)))
  }

  test("aggregate over empty/all-null input yields null, count yields 0") {
    val t = tbl(Seq[(Long, java.lang.Double)]((1L, null), (2L, null)).toDF("id", "v"))
    val s = t.summarize("sv" -> C("v").sum(), "mx" -> C("v").max(), "n" -> C("v").count())
    assert(rows(s) == Seq(Seq(null, null, 0L)))
  }

  test("statistical aggregates: n_unique, median, quantile, approx distinct") {
    val t = tbl(Seq(("a", 1L), ("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L))
      .toDF("g", "v"))
    val s = t.groupBy(C("g")).summarize(
      "nu" -> C("v").nUnique(),
      "med" -> C("v").median(),
      "q50" -> C("v").quantile(0.5),
      "anu" -> C("v").approxNUnique())
      .arrange(C("g"))
    assert(rows(s.select(C("nu"), C("med"), C("q50"))) ==
      Seq(Seq(2L, 1.0, 1.0), Seq(2L, 3.0, 3.0)))
    assert(rows(s.select(C("anu"))).flatten.forall(_.asInstanceOf[Long] == 2L))
    // as windows under grouping
    val w = t.groupBy(C("g")).mutate("nu" -> C("v").nUnique()).ungroup
    assert(w.filter(C("nu") === lit(2L)).count() == 5)
  }

  test("slice_head with offset; forbidden when grouped") {
    val s = t1.arrange(C("v").desc).sliceHead(2, offset = 1)
    assert(rows(s.select(C("id"))) == Seq(Seq(3L), Seq(2L)))
    intercept[GraftError] { t1.groupBy(C("g")).sliceHead(1) }
  }

  test("group_by add=true extends; ungroup clears") {
    val t = t1.groupBy(C("g")).groupByAdd(add = true, C("id"))
    val s = t.summarize("n" -> count())
    assert(s.count() == 4)
    assert(t.ungroup.summarize("n" -> count()).count() == 1)
  }

  test("grouped mutate turns aggregates into windows (verbs.py:1605-1611)") {
    val m = t1.groupBy(C("g"))
      .mutate("gsum" -> C("v").sum(), "gn" -> count())
      .ungroup.arrange(C("id"))
    assert(rows(m.select(C("gsum"), C("gn"))) ==
      Seq(Seq(40.0, 2L), Seq(60.0, 2L), Seq(40.0, 2L), Seq(60.0, 2L)))
  }

  test("pipe chains user verbs") {
    val double = (t: graft.table.Table) => t.mutate("v" -> (C("v") * lit(2.0)))
    assert(rows(t1.pipe(double).arrange(C("id")).select(C("v"))).head == Seq(20.0))
  }

  test("column-not-found carries suggestions") {
    val e = intercept[GraftColumnNotFoundError] { t1.select(C("vv")) }
    assert(e.getMessage.contains("available"))
  }
}
