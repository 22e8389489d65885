package graft.compile

import org.apache.spark.sql.types._
import graft.core._

/** Eager per-operator argument validation — the analog of the reference's
  * signature system (ops/signature.py:31-125 trie matching, tree/types.py:
  * 284-311 implicit-conversion lattice, types.py:42-95 Const enforcement).
  *
  * Every `Fn` is checked at verb-application time, BEFORE Catalyst sees
  * anything: an ill-typed expression (`.str.upper` on an Int column, `==`
  * between Int and String) raises [[GraftTypeError]] with the expected
  * signatures, instead of falling through to Spark's implicit coercion.
  *
  * Differences from the reference, forced by the Spark-native data model:
  *  - `Duration` is structurally `Long` (microseconds), so duration
  *    parameters accept any integral column — the reference's nominal
  *    Duration/Int distinction cannot be represented;
  *  - the reference rejects Date-vs-Datetime mixing; graft's
  *    [[DTypes.lca]] deliberately widens Date to Datetime (documented
  *    Spark-parity convenience), so type-variable unification follows lca;
  *  - `Time` (time-of-day) maps to Spark 4's `TimeType` (behind
  *    `spark.sql.timeType.enabled`, which graft's session entry points
  *    switch on). Faithful to the reference it is COMPARABLE-only:
  *    compare/sort/min/max/clip/fill_null/shift — no casts, no
  *    arithmetic, no extraction ops (types.py:258,292,332; Time appears
  *    in no ops/ops/ *.py signature).
  */
object Signatures {

  /** Abstract parameter type (reference types.py SIMPLE_TYPES, collapsed
    * onto the Spark lattice). */
  sealed trait P { def show: String }
  /** any integral (Byte/Short/Int/Long) — reference `Int` + `Duration`. */
  case object I extends P { val show = "Int" }
  /** any floating (Float/Double) — integrals and decimals convert in. */
  case object Fl extends P { val show = "Float" }
  /** any decimal — integrals convert in. */
  case object Dec extends P { val show = "Decimal" }
  case object Str extends P { val show = "String" }
  case object B extends P { val show = "Bool" }
  /** Timestamp / TimestampNTZ. */
  case object Dt extends P { val show = "Datetime" }
  case object D extends P { val show = "Date" }
  /** Spark 4 TimeType (time-of-day). */
  case object T extends P { val show = "Time" }
  /** type variable: all S positions must unify to a common type. */
  case object S extends P { val show = "S" }

  /** One formal parameter; `const = true` requires a literal argument
    * (the reference's `Const` wrapper, types.py:42-95). */
  final case class Param(p: P, const: Boolean = false) {
    def show: String = if (const) s"Const(${p.show})" else p.show
  }
  import scala.language.implicitConversions
  implicit def pToParam(p: P): Param = Param(p)
  def c(p: P): Param = Param(p, const = true)

  /** One overload; `vararg` repeats the last parameter ≥ 0 more times. */
  final case class Sig(params: Seq[Param], vararg: Boolean = false) {
    def show: String =
      params.map(_.show).mkString("(", ", ", if (vararg) ", ...)" else ")")
  }
  def sig(ps: Param*): Sig = Sig(ps)
  def vararg(ps: Param*): Sig = Sig(ps, vararg = true)

  private val numeric: Seq[Sig] = Seq(sig(I, I), sig(Fl, Fl), sig(Dec, Dec))
  // reference COMPARABLE (types.py): Int Float String Datetime Duration Date Bool
  private val comparable2: Seq[Sig] =
    Seq(sig(I, I), sig(Fl, Fl), sig(Dec, Dec), sig(Str, Str), sig(Dt, Dt),
      sig(D, D), sig(B, B), sig(T, T), sig(Dt, D), sig(D, Dt))
  private val comparable1: Seq[Sig] =
    Seq(sig(I), sig(Fl), sig(Dec), sig(Str), sig(Dt), sig(D), sig(B), sig(T))
  private val floatUnary: Seq[Sig] = Seq(sig(Fl))
  private val numUnary: Seq[Sig] = Seq(sig(I), sig(Fl), sig(Dec))

  /** op name → allowed signatures (reference ops/ops/<family>.py). */
  val table: Map[String, Seq[Sig]] = Map(
    // arithmetic (arithmetic.py)
    "add" -> (numeric ++ Seq(sig(Str, Str), sig(B, B),
      sig(Dt, I), sig(I, Dt), sig(D, I), sig(I, D))),
    "sub" -> (numeric ++ Seq(sig(Dt, Dt), sig(D, D), sig(Dt, D), sig(D, Dt))),
    "mul" -> numeric,
    "truediv" -> Seq(sig(I, I), sig(Fl, Fl), sig(Dec, Dec)),
    "floordiv" -> Seq(sig(I, I)),
    "mod" -> Seq(sig(I, I)),
    // numeric (numeric.py)
    "pow" -> Seq(sig(I, I), sig(Fl, Fl)),
    "neg" -> numUnary, "pos" -> numUnary, "abs" -> numUnary,
    "round" -> Seq(sig(I, c(I)), sig(Fl, c(I)), sig(Dec, c(I))),
    "floor" -> floatUnary, "ceil" -> floatUnary,
    "log" -> floatUnary, "log10" -> floatUnary, "exp" -> floatUnary,
    "sqrt" -> floatUnary, "cbrt" -> floatUnary,
    "sin" -> floatUnary, "cos" -> floatUnary, "tan" -> floatUnary,
    "asin" -> floatUnary, "acos" -> floatUnary, "atan" -> floatUnary,
    "is_inf" -> floatUnary, "is_nan" -> floatUnary,
    "rand" -> Seq(sig()),
    // comparison (comparison.py)
    "eq" -> Seq(sig(S, S)), "ne" -> Seq(sig(S, S)),
    "lt" -> comparable2, "le" -> comparable2,
    "gt" -> comparable2, "ge" -> comparable2,
    "is_null" -> Seq(sig(S)), "is_not_null" -> Seq(sig(S)),
    "fill_null" -> Seq(sig(S, S)),
    "is_in" -> Seq(vararg(S, S)),
    "clip" -> comparable1.map(s => Sig(Seq(s.params.head,
      c(s.params.head.p), c(s.params.head.p)))),
    // logical (logical.py) — Kleene
    "and" -> Seq(sig(B, B)), "or" -> Seq(sig(B, B)), "xor" -> Seq(sig(B, B)),
    "not" -> Seq(sig(B)),
    // string (string.py)
    "str.strip" -> Seq(sig(Str)), "str.upper" -> Seq(sig(Str)),
    "str.lower" -> Seq(sig(Str)), "str.len" -> Seq(sig(Str)),
    "str.replace_all" -> Seq(sig(Str, c(Str), c(Str))),
    "str.starts_with" -> Seq(sig(Str, c(Str))),
    "str.ends_with" -> Seq(sig(Str, c(Str))),
    "str.contains" -> Seq(sig(Str, c(Str))),
    "str.contains_regex" -> Seq(sig(Str, c(Str))),
    "str.slice" -> Seq(sig(Str, I, I)),
    "str.to_datetime" -> Seq(sig(Str)), "str.to_date" -> Seq(sig(Str)),
    // datetime (datetime.py): year/month/day/dow/doy accept Date too
    "dt.year" -> Seq(sig(Dt), sig(D)), "dt.month" -> Seq(sig(Dt), sig(D)),
    "dt.day" -> Seq(sig(Dt), sig(D)),
    "dt.hour" -> Seq(sig(Dt)), "dt.minute" -> Seq(sig(Dt)),
    "dt.second" -> Seq(sig(Dt)), "dt.millisecond" -> Seq(sig(Dt)),
    "dt.microsecond" -> Seq(sig(Dt)),
    "dt.day_of_week" -> Seq(sig(Dt), sig(D)),
    "dt.day_of_year" -> Seq(sig(Dt), sig(D)),
    // durations are Long μs — see scaladoc
    "dur.days" -> Seq(sig(I)), "dur.hours" -> Seq(sig(I)),
    "dur.minutes" -> Seq(sig(I)), "dur.seconds" -> Seq(sig(I)),
    "dur.milliseconds" -> Seq(sig(I)), "dur.microseconds" -> Seq(sig(I)),
    // aggregation (aggregation.py)
    "min" -> comparable1, "max" -> comparable1,
    "mean" -> Seq(sig(I), sig(Fl), sig(Dec)),
    "sum" -> Seq(sig(I), sig(Fl), sig(Dec), sig(B)),
    "any" -> Seq(sig(B)), "all" -> Seq(sig(B)),
    "count" -> Seq(sig(S)), "count_star" -> Seq(sig()),
    "str.join" -> Seq(sig(Str, c(Str))),
    "list.agg" -> Seq(sig(S)),
    // statistical extensions (graft, SURVEY §2.2)
    "n_unique" -> Seq(sig(S)),
    "median" -> Seq(sig(I), sig(Fl), sig(Dec)),
    "quantile" -> Seq(sig(I, c(Fl)), sig(Fl, c(Fl)), sig(Dec, c(Fl))),
    "approx_n_unique" -> Seq(sig(S)),
    // window (window.py)
    "shift" -> Seq(Sig(Seq(Param(S), c(I), c(S)))),
    "row_number" -> Seq(sig()), "rank" -> Seq(sig()), "dense_rank" -> Seq(sig()),
    "cum_sum" -> Seq(sig(I), sig(Fl), sig(Dec), sig(B)),
    // horizontal (horizontal.py)
    "h.max" -> comparable1.map(s => Sig(s.params ++ s.params, vararg = true)),
    "h.min" -> comparable1.map(s => Sig(s.params ++ s.params, vararg = true)),
    "coalesce" -> Seq(vararg(S, S)),
    "h.any" -> Seq(vararg(B, B)), "h.all" -> Seq(vararg(B, B)),
    "h.sum" -> Seq(vararg(I, I), vararg(Fl, Fl), vararg(Dec, Dec),
      vararg(Str, Str)))

  private def converts(t: DataType, p: P): Boolean = p match {
    case _ if t == NullType => true // untyped null fits anywhere (types.py:295-298)
    case I => DTypes.isIntegral(t)
    case Fl => DTypes.isFloating(t) || DTypes.isIntegral(t) ||
      t.isInstanceOf[DecimalType] // Int→Float (1,0); Decimal→Float (0,1)
    case Dec => t.isInstanceOf[DecimalType] || DTypes.isIntegral(t) // Int→Decimal (2,0)
    case Str => t == StringType || t.isInstanceOf[EnumType] // Enum→String implicit
    case B => t == BooleanType
    case Dt => t == TimestampType || t == TimestampNTZType
    case D => t == DateType
    case T => t.isInstanceOf[TimeType]
    case S => true
  }

  private def isLiteral(e: ColExpr): Boolean = e match {
    case _: Lit => true
    case Marker(inner, _, _) => isLiteral(inner)
    case CastE(inner, _, _) => isLiteral(inner)
    case _ => false
  }

  /** Does `sig` accept arguments of types `at`? Checks arity (with
    * vararg), per-param convertibility, Const literal-ness, and S
    * unification (all S positions must share an lca). */
  private def accepts(s: Sig, at: Seq[DataType], args: Seq[ColExpr]): Boolean = {
    val n = at.length
    if (s.vararg) { if (n < s.params.length - 1) return false }
    else if (n != s.params.length) return false
    val formals: Seq[Param] =
      if (n <= s.params.length) s.params.take(n)
      else s.params ++ Seq.fill(n - s.params.length)(s.params.last)
    val ok = formals.zip(at).forall { case (prm, t) => converts(t, prm.p) } &&
      formals.zipWithIndex.forall { case (prm, i) =>
        !prm.const || i >= args.length || isLiteral(args(i))
      }
    if (!ok) return false
    // S positions unify iff a least common ancestor exists
    val sTypes = formals.zip(at).collect { case (Param(S, _), t) => t }
    sTypes.isEmpty || (try { DTypes.lcaAll(sTypes); true }
      catch { case _: GraftTypeError => false })
  }

  /** Validate `op(at...)`; throws [[GraftTypeError]] with the expected
    * signatures on mismatch. Ops absent from the table (internal ones)
    * pass through unchecked. */
  def validate(op: Op, at: Seq[DataType], args: Seq[ColExpr]): Unit = {
    table.get(op.name).foreach { sigs =>
      if (!sigs.exists(s => accepts(s, at, args))) {
        val got = at.map(_.simpleString).mkString("(", ", ", ")")
        throw new GraftTypeError(
          s"${op.name}: no matching signature for argument types $got; " +
            s"expected one of: ${sigs.map(_.show).mkString(", ")}" +
            (if (sigs.exists(_.params.exists(_.const)))
              " (Const(...) parameters require literal arguments)" else ""))
      }
    }
    checkEnumLiterals(op, at, args)
  }

  /** Comparison ops that confront an Enum-typed argument with string
    * literals — the static membership check (reference: polars enum cast
    * raises on out-of-set; graft enforces it at expression build). */
  private val enumLitOps =
    Set("eq", "ne", "lt", "le", "gt", "ge", "is_in", "fill_null")

  private def litStringOf(e: ColExpr): Option[String] = e match {
    case Lit(s: String, _) => Some(s)
    case Marker(inner, _, _) => litStringOf(inner)
    case _ => None
  }

  private def checkEnumLiterals(op: Op, at: Seq[DataType],
      args: Seq[ColExpr]): Unit = {
    if (!enumLitOps.contains(op.name)) return
    val enums = at.collect { case e: EnumType => e }
    if (enums.isEmpty) return
    args.foreach { a =>
      litStringOf(a).foreach { s =>
        enums.find(!_.contains(s)).foreach { e =>
          throw new GraftTypeError(
            s"${op.name}: literal '$s' is not a member of ${e.simpleString}")
        }
      }
    }
  }
}
