package graft

import graft.core._

/** User-facing DSL surface: free functions and literal conversions, the
  * analog of the reference's `pipe/functions.py` + `pipe/c.py`. */
package object dsl {

  // literals
  def lit(v: Any): Lit = Lit(v)
  def date(s: String): Lit = Lit(java.sql.Date.valueOf(s))
  /** NTZ timestamp literal — parquet timestamps read as TimestampNTZ. */
  def timestamp(s: String): Lit =
    Lit(java.time.LocalDateTime.parse(s.replace(' ', 'T')))
  /** Time-of-day literal, e.g. time("08:30:00") — Spark 4 TIME. */
  def time(s: String): Lit = Lit(java.time.LocalTime.parse(s))

  /** Late-bound column by name — the reference's `C.x` (pipe/c.py:7-20). */
  def C(n: String): CName = CName(n)

  /** `when(cond).then_(v).when(...).otherwise(d)` (functions.py:35-40). */
  def when(cond: ColExpr): WhenClause = new WhenClause(Nil, cond)

  /** count() = COUNT(*) (functions.py:115-124). */
  def count(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    Fn(ops.countStar, Nil,
      partitionBy = Option(partitionBy).getOrElse(Nil), filterC = Option(filter))

  def rand(): ColExpr = Fn(ops.rand, Nil)

  // window free functions (functions.py:127,342,386)
  def rowNumber(arrange: Seq[ColExpr] = Nil, partitionBy: Seq[ColExpr] = Nil): ColExpr =
    Fn(ops.rowNumber, Nil, partitionBy = partitionBy, arrange = arrange.map(Ord.of))
  def rank(arrange: Seq[ColExpr], partitionBy: Seq[ColExpr] = Nil): ColExpr =
    Fn(ops.rank, Nil, partitionBy = partitionBy, arrange = arrange.map(Ord.of))
  def denseRank(arrange: Seq[ColExpr], partitionBy: Seq[ColExpr] = Nil): ColExpr =
    Fn(ops.denseRank, Nil, partitionBy = partitionBy, arrange = arrange.map(Ord.of))

  /** list aggregation (ops/ops/list.py:9-20). */
  def listAgg(e: ColExpr, arrange: Seq[ColExpr] = Nil, filter: ColExpr = null,
      partitionBy: Seq[ColExpr] = null): ColExpr =
    Fn(ops.listAgg, Seq(e), partitionBy = Option(partitionBy).getOrElse(Nil),
      arrange = arrange.map(Ord.of), filterC = Option(filter))

  // horizontal (row-wise variadic) fns (ops/ops/horizontal.py)
  def hmax(es: ColExpr*): ColExpr = Fn(ops.hMax, es)
  def hmin(es: ColExpr*): ColExpr = Fn(ops.hMin, es)
  def coalesce(es: ColExpr*): ColExpr = Fn(ops.coalesce, es)
  def hany(es: ColExpr*): ColExpr = Fn(ops.hAny, es)
  def hall(es: ColExpr*): ColExpr = Fn(ops.hAll, es)
  def hsum(es: ColExpr*): ColExpr = Fn(ops.hSum, es)

  // implicit literal lifting for ergonomic expressions: t("x") + 1
  import scala.language.implicitConversions
  implicit def intToLit(i: Int): ColExpr = Lit(i)
  implicit def longToLit(l: Long): ColExpr = Lit(l)
  implicit def doubleToLit(d: Double): ColExpr = Lit(d)
  implicit def stringToLit(s: String): ColExpr = Lit(s)
  implicit def boolToLit(b: Boolean): ColExpr = Lit(b)
}
