package graft.core

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.types._

/** Lazy scalar-expression tree, the analog of the reference's `ColExpr`
  * (reference: _internal/tree/col_expr.py:81). Compiled once to
  * [[org.apache.spark.sql.Column]] by [[graft.compile.ExprCompiler]];
  * Catalyst then performs all optimization.
  */
sealed trait ColExpr {
  // ---- operator sugar (the reference code-generates these; we hand-write) ----
  def +(other: ColExpr): ColExpr = Fn(ops.add, Seq(this, other))
  def -(other: ColExpr): ColExpr = Fn(ops.sub, Seq(this, other))
  def *(other: ColExpr): ColExpr = Fn(ops.mul, Seq(this, other))
  def /(other: ColExpr): ColExpr = Fn(ops.trueDiv, Seq(this, other))
  def floorDiv(other: ColExpr): ColExpr = Fn(ops.floorDiv, Seq(this, other))
  def %(other: ColExpr): ColExpr = Fn(ops.mod, Seq(this, other))
  def pow(other: ColExpr): ColExpr = Fn(ops.pow, Seq(this, other))
  def unary_- : ColExpr = Fn(ops.neg, Seq(this))
  def unary_+ : ColExpr = Fn(ops.pos, Seq(this))
  def unary_! : ColExpr = Fn(ops.not, Seq(this))

  def ===(other: ColExpr): ColExpr = Fn(ops.eq, Seq(this, other))
  def =!=(other: ColExpr): ColExpr = Fn(ops.ne, Seq(this, other))
  def <(other: ColExpr): ColExpr = Fn(ops.lt, Seq(this, other))
  def <=(other: ColExpr): ColExpr = Fn(ops.le, Seq(this, other))
  def >(other: ColExpr): ColExpr = Fn(ops.gt, Seq(this, other))
  def >=(other: ColExpr): ColExpr = Fn(ops.ge, Seq(this, other))

  def &&(other: ColExpr): ColExpr = Fn(ops.and, Seq(this, other))
  def ||(other: ColExpr): ColExpr = Fn(ops.or, Seq(this, other))
  def ^(other: ColExpr): ColExpr = Fn(ops.xor, Seq(this, other))

  def isNull: ColExpr = Fn(ops.isNull, Seq(this))
  def isNotNull: ColExpr = Fn(ops.isNotNull, Seq(this))
  def fillNull(v: ColExpr): ColExpr = Fn(ops.fillNull, Seq(this, v))
  def isIn(vs: ColExpr*): ColExpr = Fn(ops.isIn, this +: vs)
  def clip(lo: ColExpr, hi: ColExpr): ColExpr = Fn(ops.clip, Seq(this, lo, hi))

  def abs: ColExpr = Fn(ops.abs, Seq(this))
  def round(decimals: Int = 0): ColExpr = Fn(ops.round, Seq(this, Lit(decimals)))
  def floor: ColExpr = Fn(ops.floor, Seq(this))
  def ceil: ColExpr = Fn(ops.ceil, Seq(this))
  def log: ColExpr = Fn(ops.log, Seq(this))
  def log10: ColExpr = Fn(ops.log10, Seq(this))
  def exp: ColExpr = Fn(ops.exp, Seq(this))
  def sqrt: ColExpr = Fn(ops.sqrt, Seq(this))
  def cbrt: ColExpr = Fn(ops.cbrt, Seq(this))
  def sin: ColExpr = Fn(ops.sin, Seq(this))
  def cos: ColExpr = Fn(ops.cos, Seq(this))
  def tan: ColExpr = Fn(ops.tan, Seq(this))
  def asin: ColExpr = Fn(ops.asin, Seq(this))
  def acos: ColExpr = Fn(ops.acos, Seq(this))
  def atan: ColExpr = Fn(ops.atan, Seq(this))
  def isInf: ColExpr = Fn(ops.isInf, Seq(this))
  def isNotInf: ColExpr = !isInf
  def isNan: ColExpr = Fn(ops.isNan, Seq(this))
  def isNotNan: ColExpr = !isNan

  /** Dict-map sugar over CASE + is_in (reference: col_expr.py:236-293). */
  def map(mapping: Map[ColExpr, ColExpr], default: ColExpr = Lit(null)): ColExpr =
    CaseE(mapping.toSeq.map { case (k, v) => (this === k, v) }, Some(default))

  def cast(to: DataType, strict: Boolean = true): ColExpr = CastE(this, to, strict)
  def tryCast(to: DataType): ColExpr = CastE(this, to, strict = false)

  // ---- namespaced accessors, mirroring the reference's `.str` / `.dt` ----
  def str: StrNs = new StrNs(this)
  def dt: DtNs = new DtNs(this)
  def dur: DurNs = new DurNs(this)

  // ---- aggregations (context kwargs: partitionBy / filter / arrange) ----
  def sum(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.sum, filter, partitionBy)
  def min(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.min, filter, partitionBy)
  def max(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.max, filter, partitionBy)
  def mean(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.mean, filter, partitionBy)
  def any(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.any, filter, partitionBy)
  def all(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.all, filter, partitionBy)
  def count(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.count, filter, partitionBy)
  def nUnique(partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.nUnique, null, partitionBy)
  def median(filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.median, filter, partitionBy)
  def quantile(p: Double, filter: ColExpr = null, partitionBy: Seq[ColExpr] = null): ColExpr =
    Fn(ops.quantile, Seq(this, Lit(p)),
      partitionBy = Option(partitionBy).getOrElse(Nil), filterC = Option(filter))
  def approxNUnique(partitionBy: Seq[ColExpr] = null): ColExpr =
    agg(ops.approxNUnique, null, partitionBy)

  private def agg(op: Op, filter: ColExpr, partitionBy: Seq[ColExpr]): ColExpr =
    Fn(op, Seq(this),
      partitionBy = Option(partitionBy).getOrElse(Nil),
      filterC = Option(filter))

  // ---- window ----
  /** lag/lead; negative n shifts forward (reference: ops/ops/window.py:38). */
  def shift(n: Int, fill: ColExpr = Lit(null), partitionBy: Seq[ColExpr] = null,
            arrange: Seq[ColExpr] = null): ColExpr =
    Fn(ops.shift, Seq(this, Lit(n), fill),
      partitionBy = Option(partitionBy).getOrElse(Nil),
      arrange = Option(arrange).getOrElse(Nil).map(Ord.of))
  def cumSum(partitionBy: Seq[ColExpr] = null, arrange: Seq[ColExpr] = null): ColExpr =
    Fn(ops.cumSum, Seq(this),
      partitionBy = Option(partitionBy).getOrElse(Nil),
      arrange = Option(arrange).getOrElse(Nil).map(Ord.of))

  // ---- sort-direction markers (reference: ops/ops/markers.py:22-62) ----
  def asc: ColExpr = Marker(this, isDesc = false, nullsLastOpt = None)
  def desc: ColExpr = Marker(this, isDesc = true, nullsLastOpt = None)
  def nullsFirst: ColExpr = this match {
    case Marker(e, d, _) => Marker(e, d, Some(false))
    case e => Marker(e, isDesc = false, nullsLastOpt = Some(false))
  }
  def nullsLast: ColExpr = this match {
    case Marker(e, d, _) => Marker(e, d, Some(true))
    case e => Marker(e, isDesc = false, nullsLastOpt = Some(true))
  }
}

object ColIds { val next = new AtomicLong(0L) }

/** Resolved column handle: stable identity by uuid, like the reference's
  * `Col` (col_expr.py:2303) / Catalyst's AttributeReference exprId. */
final case class ColRef(uuid: Long, name: String, dtype: DataType) extends ColExpr

/** Late-bound column-by-name, the reference's `C.x`
  * (col_expr.py:2318, pipe/c.py:7-20). Resolved at verb application. */
final case class CName(name: String) extends ColExpr

final case class Lit(value: Any, dtype: Option[DataType] = None) extends ColExpr

/** Operator application; `partitionBy`/`arrange`/`filterC` are the
  * reference's context kwargs (col_expr.py:2358). */
final case class Fn(op: Op, args: Seq[ColExpr],
    partitionBy: Seq[ColExpr] = Nil,
    arrange: Seq[Ord] = Nil,
    filterC: Option[ColExpr] = None) extends ColExpr

final case class CaseE(branches: Seq[(ColExpr, ColExpr)], otherwise: Option[ColExpr])
    extends ColExpr {
  def when(cond: ColExpr): WhenClause = new WhenClause(branches, cond)
  def otherwise(v: ColExpr): CaseE = CaseE(branches, Some(v))
}
final class WhenClause(prev: Seq[(ColExpr, ColExpr)], cond: ColExpr) {
  def then_(v: ColExpr): CaseE = CaseE(prev :+ ((cond, v)), None)
}

final case class CastE(e: ColExpr, to: DataType, strict: Boolean) extends ColExpr

/** Sort-direction marker, stripped into [[Ord]] at verb boundaries. */
final case class Marker(inner: ColExpr, isDesc: Boolean, nullsLastOpt: Option[Boolean]) extends ColExpr

/** A sort key (reference `Order`, col_expr.py:2818). Default null placement
  * follows the reference/Polars: nulls last when ascending, first when
  * descending is NOT the polars default — polars puts nulls last in both;
  * we match SQL ORDER BY default (nulls first asc, last desc) only when
  * explicitly requested; default = nulls last (polars maintain parity). */
final case class Ord(e: ColExpr, desc: Boolean, nullsLast: Boolean)
object Ord {
  def of(e: ColExpr): Ord = e match {
    case Marker(inner, d, nl) => Ord(inner, d, nl.getOrElse(!d))
    case other => Ord(other, desc = false, nullsLast = true)
  }
}

// ---------------- namespaces ----------------

final class StrNs(e: ColExpr) {
  def strip: ColExpr = Fn(ops.strStrip, Seq(e))
  def upper: ColExpr = Fn(ops.strUpper, Seq(e))
  def lower: ColExpr = Fn(ops.strLower, Seq(e))
  def len: ColExpr = Fn(ops.strLen, Seq(e))
  /** literal (non-regex) replacement (reference: string.py:143). */
  def replaceAll(find: String, repl: String): ColExpr =
    Fn(ops.strReplaceAll, Seq(e, Lit(find), Lit(repl)))
  def startsWith(p: String): ColExpr = Fn(ops.strStartsWith, Seq(e, Lit(p)))
  def endsWith(p: String): ColExpr = Fn(ops.strEndsWith, Seq(e, Lit(p)))
  def contains(p: String, allowRegex: Boolean = true): ColExpr =
    Fn(if (allowRegex) ops.strContainsRegex else ops.strContains, Seq(e, Lit(p)))
  /** 0-based slice (reference: string.py:336). */
  def slice(offset: ColExpr, n: ColExpr): ColExpr = Fn(ops.strSlice, Seq(e, offset, n))
  def toDatetime: ColExpr = Fn(ops.strToDatetime, Seq(e))
  def toDate: ColExpr = Fn(ops.strToDate, Seq(e))
  /** ordered string aggregation (reference: aggregation.py:101-116). */
  def join(delim: String, arrange: Seq[ColExpr] = Nil, filter: ColExpr = null,
           partitionBy: Seq[ColExpr] = null): ColExpr =
    Fn(ops.strJoin, Seq(e, Lit(delim)),
      partitionBy = Option(partitionBy).getOrElse(Nil),
      arrange = arrange.map(Ord.of), filterC = Option(filter))
}

final class DtNs(e: ColExpr) {
  def year: ColExpr = Fn(ops.dtYear, Seq(e))
  def month: ColExpr = Fn(ops.dtMonth, Seq(e))
  def day: ColExpr = Fn(ops.dtDay, Seq(e))
  def hour: ColExpr = Fn(ops.dtHour, Seq(e))
  def minute: ColExpr = Fn(ops.dtMinute, Seq(e))
  def second: ColExpr = Fn(ops.dtSecond, Seq(e))
  def millisecond: ColExpr = Fn(ops.dtMillisecond, Seq(e))
  def microsecond: ColExpr = Fn(ops.dtMicrosecond, Seq(e))
  /** ISO day-of-week Mon=1..Sun=7 (reference: datetime.py:49-56). */
  def dayOfWeek: ColExpr = Fn(ops.dtDayOfWeek, Seq(e))
  def dayOfYear: ColExpr = Fn(ops.dtDayOfYear, Seq(e))
}

final class DurNs(e: ColExpr) {
  def days: ColExpr = Fn(ops.durDays, Seq(e))
  def hours: ColExpr = Fn(ops.durHours, Seq(e))
  def minutes: ColExpr = Fn(ops.durMinutes, Seq(e))
  def seconds: ColExpr = Fn(ops.durSeconds, Seq(e))
  def milliseconds: ColExpr = Fn(ops.durMilliseconds, Seq(e))
  def microseconds: ColExpr = Fn(ops.durMicroseconds, Seq(e))
}

// ---------------- operator registry ----------------

/** An operator: name + function-type. Compilation rules live in
  * [[graft.compile.ExprCompiler]]; dtype rules in [[graft.compile.Typing]].
  * (reference: _internal/ops/op.py:25-109 + the ops/ops modules). */
final case class Op(name: String, ftype: FType)

object ops {
  import FType._
  // arithmetic (reference: ops/ops/arithmetic.py)
  val add = Op("add", ElementWise)
  val sub = Op("sub", ElementWise)
  val mul = Op("mul", ElementWise)
  val trueDiv = Op("truediv", ElementWise)
  val floorDiv = Op("floordiv", ElementWise)
  val mod = Op("mod", ElementWise)
  // numeric (reference: ops/ops/numeric.py)
  val pow = Op("pow", ElementWise)
  val neg = Op("neg", ElementWise)
  val pos = Op("pos", ElementWise)
  val abs = Op("abs", ElementWise)
  val round = Op("round", ElementWise)
  val floor = Op("floor", ElementWise)
  val ceil = Op("ceil", ElementWise)
  val log = Op("log", ElementWise)
  val log10 = Op("log10", ElementWise)
  val exp = Op("exp", ElementWise)
  val sqrt = Op("sqrt", ElementWise)
  val cbrt = Op("cbrt", ElementWise)
  val sin = Op("sin", ElementWise)
  val cos = Op("cos", ElementWise)
  val tan = Op("tan", ElementWise)
  val asin = Op("asin", ElementWise)
  val acos = Op("acos", ElementWise)
  val atan = Op("atan", ElementWise)
  val isInf = Op("is_inf", ElementWise)
  val isNan = Op("is_nan", ElementWise)
  val rand = Op("rand", ElementWise)
  // comparison (reference: ops/ops/comparison.py)
  val eq = Op("eq", ElementWise)
  val ne = Op("ne", ElementWise)
  val lt = Op("lt", ElementWise)
  val le = Op("le", ElementWise)
  val gt = Op("gt", ElementWise)
  val ge = Op("ge", ElementWise)
  val isNull = Op("is_null", ElementWise)
  val isNotNull = Op("is_not_null", ElementWise)
  val fillNull = Op("fill_null", ElementWise)
  val isIn = Op("is_in", ElementWise)
  val clip = Op("clip", ElementWise)
  // logical (reference: ops/ops/logical.py) — Kleene
  val and = Op("and", ElementWise)
  val or = Op("or", ElementWise)
  val xor = Op("xor", ElementWise)
  val not = Op("not", ElementWise)
  // string (reference: ops/ops/string.py)
  val strStrip = Op("str.strip", ElementWise)
  val strUpper = Op("str.upper", ElementWise)
  val strLower = Op("str.lower", ElementWise)
  val strLen = Op("str.len", ElementWise)
  val strReplaceAll = Op("str.replace_all", ElementWise)
  val strStartsWith = Op("str.starts_with", ElementWise)
  val strEndsWith = Op("str.ends_with", ElementWise)
  val strContains = Op("str.contains", ElementWise)
  val strContainsRegex = Op("str.contains_regex", ElementWise)
  val strSlice = Op("str.slice", ElementWise)
  val strToDatetime = Op("str.to_datetime", ElementWise)
  val strToDate = Op("str.to_date", ElementWise)
  // datetime (reference: ops/ops/datetime.py)
  val dtYear = Op("dt.year", ElementWise)
  val dtMonth = Op("dt.month", ElementWise)
  val dtDay = Op("dt.day", ElementWise)
  val dtHour = Op("dt.hour", ElementWise)
  val dtMinute = Op("dt.minute", ElementWise)
  val dtSecond = Op("dt.second", ElementWise)
  val dtMillisecond = Op("dt.millisecond", ElementWise)
  val dtMicrosecond = Op("dt.microsecond", ElementWise)
  val dtDayOfWeek = Op("dt.day_of_week", ElementWise)
  val dtDayOfYear = Op("dt.day_of_year", ElementWise)
  val durDays = Op("dur.days", ElementWise)
  val durHours = Op("dur.hours", ElementWise)
  val durMinutes = Op("dur.minutes", ElementWise)
  val durSeconds = Op("dur.seconds", ElementWise)
  val durMilliseconds = Op("dur.milliseconds", ElementWise)
  val durMicroseconds = Op("dur.microseconds", ElementWise)
  // aggregation (reference: ops/ops/aggregation.py)
  val min = Op("min", Aggregate)
  val max = Op("max", Aggregate)
  val mean = Op("mean", Aggregate)
  val sum = Op("sum", Aggregate)
  val any = Op("any", Aggregate)
  val all = Op("all", Aggregate)
  val count = Op("count", Aggregate)
  val countStar = Op("count_star", Aggregate)
  val strJoin = Op("str.join", Aggregate)
  val listAgg = Op("list.agg", Aggregate)
  // statistical extensions (SURVEY §2.2 note: trivial on Spark)
  val nUnique = Op("n_unique", Aggregate)
  val median = Op("median", Aggregate)
  val quantile = Op("quantile", Aggregate)
  val approxNUnique = Op("approx_n_unique", Aggregate)
  // window (reference: ops/ops/window.py)
  val shift = Op("shift", Window)
  val rowNumber = Op("row_number", Window)
  val rank = Op("rank", Window)
  val denseRank = Op("dense_rank", Window)
  val cumSum = Op("cum_sum", Window)
  // horizontal (reference: ops/ops/horizontal.py)
  val hMax = Op("h.max", ElementWise)
  val hMin = Op("h.min", ElementWise)
  val coalesce = Op("coalesce", ElementWise)
  val hAny = Op("h.any", ElementWise)
  val hAll = Op("h.all", ElementWise)
  val hSum = Op("h.sum", ElementWise)
}
