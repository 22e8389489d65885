package graft.compile

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.types._
import graft.core._

/** Compilation context for one verb application.
  *
  * @param resolve   uuid → bound [[Column]] in the current DataFrame(s)
  * @param dtype     uuid → Spark type
  * @param ambient   ambient grouping (compiled), injected as the window
  *                  partition for aggregates used inside `mutate`
  *                  (reference: pipe/verbs.py:1605-1611)
  * @param rowId     the hidden stable-row-order surrogate, used as the
  *                  implicit window order when no `arrange` is given
  *                  (SURVEY §7.4 hard part 1)
  * @param mode      verb context: Project = mutate (agg→window),
  *                  Agg = summarize, Simple = filter/join/arrange
  */
final case class Ctx(
    resolve: Long => Column,
    dtype: Long => DataType,
    ambient: Seq[Column],
    rowId: Option[Column],
    mode: Mode)

sealed trait Mode
object Mode {
  case object Project extends Mode
  case object Agg extends Mode
  case object Simple extends Mode
}

/** Static typing of expressions — eager validation before Catalyst sees
  * anything, mirroring the reference's ctor-time `dtype()` resolution
  * (col_expr.py:2386-2387). Types are Spark types (SURVEY §1.2 table). */
object Typing {
  import DTypes._

  def litType(v: Any): DataType = v match {
    case null => NullType
    case _: Boolean => BooleanType
    case _: Int => IntegerType
    case _: Long => LongType
    case _: Float => FloatType
    case _: Double => DoubleType
    case _: String => StringType
    case _: java.sql.Date | _: java.time.LocalDate => DateType
    case _: java.sql.Timestamp | _: java.time.Instant => TimestampType
    case _: java.time.LocalDateTime => TimestampNTZType
    case _: java.time.LocalTime => TimeType.apply() // TIME(6), Spark 4 flagged type
    case _: java.math.BigDecimal => DecimalType(38, 18)
    case _: Array[Byte] => BinaryType
    case other => throw new GraftTypeError(s"unsupported literal: $other (${other.getClass})")
  }

  def dtypeOf(e: ColExpr, lookup: Long => DataType): DataType = {
    def go(e: ColExpr): DataType = e match {
      case ColRef(u, _, _) => lookup(u)
      case CName(n) =>
        throw new GraftError(s"unresolved column C($n) reached typing — preprocess first")
      case Lit(v, dt) => dt.getOrElse(litType(v))
      case Marker(inner, _, _) => go(inner)
      case CastE(inner, to, _) =>
        val from = go(inner)
        to match {
          case e: EnumType =>
            // only String-family values cast to Enum (col_expr.py:2720)
            if (from != StringType && from != NullType &&
                !from.isInstanceOf[EnumType])
              throw new GraftTypeError(
                s"cannot cast ${from.simpleString} to ${e.simpleString}: " +
                  "only String casts to Enum")
          case u: UIntType =>
            // UInt admits the Int cast family (numeric, bool, string);
            // range [0, 2^bits) is enforced at runtime by compileCast
            val f = DTypes.dissolveUInt(from)
            if (!(DTypes.isNumeric(f) || f == BooleanType ||
                f == StringType || f == NullType))
              throw new GraftTypeError(
                s"cannot cast ${from.simpleString} to ${u.simpleString}: " +
                  "UInt casts from numeric, boolean and string only")
          // Time is COMPARABLE-only in the reference: VALID_CASTS
          // (col_expr.py:2688-2722) lists no cast to or from Time
          case _: TimeType if !from.isInstanceOf[TimeType] && from != NullType =>
            throw new GraftTypeError(
              s"cannot cast ${from.simpleString} to TIME: Time admits no casts")
          case _ if from.isInstanceOf[TimeType] && !to.isInstanceOf[TimeType] =>
            throw new GraftTypeError(
              s"cannot cast TIME to ${to.simpleString}: Time admits no casts")
          case _ => ()
        }
        to
      case CaseE(branches, otherwise) =>
        lcaAll(branches.map(b => go(b._2)) ++ otherwise.map(go))
      case Fn(op, args, _, _, _) => fnType(op, args.map(go), args)
    }
    go(e)
  }

  import DTypes.isTimeLike

  private def fnType(op: Op, at0: Seq[DataType], args: Seq[ColExpr]): DataType = {
    // UInt dissolves to its signed carrier for ALL operator typing
    // (DTypes.dissolveUInt): unsigned columns feed every numeric op as
    // the carrier, so the typed result always equals the runtime schema
    val at = at0.map(DTypes.dissolveUInt)
    // eager signature check (reference signature.py trie + conversion
    // lattice): ill-typed arguments raise here, at verb application,
    // never reaching Spark's implicit coercion
    Signatures.validate(op, at, args)
    def a0 = at.head
    // Spark's DecimalPrecision arithmetic rules (Add/Subtract carry digit,
    // Multiply p1+p2+1, Mod min-int-digits), with the 38-cap scale
    // adjustment — so the TYPED dtype matches the runtime schema exactly
    // instead of the plain lca (which lacks the carry digit).
    def asDec(t: DataType, e: ColExpr): DecimalType = (t, e) match {
      case (d: DecimalType, _) => d
      // Spark promotes an integral LITERAL to its minimal decimal
      // (DecimalPrecision: Literal(7L) → Decimal(1,0)), not the full
      // width of its integral type
      case (t, Lit(v, None)) if isIntegral(t) =>
        val p = new java.math.BigDecimal(v.toString).precision
        DecimalType(p, 0)
      case (ByteType, _) => DecimalType(3, 0)
      case (ShortType, _) => DecimalType(5, 0)
      case (IntegerType, _) => DecimalType(10, 0)
      case (LongType, _) => DecimalType(20, 0)
      case (other, _) => throw new GraftTypeError(s"${op.name}: cannot widen $other to decimal")
    }
    def decBin(l: DecimalType, r: DecimalType): DataType = {
      val (p1, s1, p2, s2) = (l.precision, l.scale, r.precision, r.scale)
      val (p, s) = op.name match {
        case "add" | "sub" =>
          val sc = math.max(s1, s2)
          (math.max(p1 - s1, p2 - s2) + sc + 1, sc)
        case "mul" => (p1 + p2 + 1, s1 + s2)
        case "mod" =>
          val sc = math.max(s1, s2)
          (math.min(p1 - s1, p2 - s2) + sc, sc)
        case _ => return lcaAll(at)
      }
      if (p <= 38) DecimalType(p, s)
      else { // adjustPrecisionScale under allowPrecisionLoss (the default)
        val intDigits = p - s
        DecimalType(38, math.max(38 - intDigits, math.min(s, 6)))
      }
    }
    def numBin(): DataType = {
      val t = lcaAll(at)
      if (!isNumeric(t)) throw new GraftTypeError(s"${op.name}: expected numeric args, got $at")
      if (at.length == 2 && at.exists(_.isInstanceOf[DecimalType]) &&
          !at.exists(isFloating))
        decBin(asDec(at(0), args(0)), asDec(at(1), args(1)))
      else t
    }
    op.name match {
      case "add" =>
        // Datetime + Duration(μs Long) → Datetime; durations are carried
        // as Long microseconds (deterministic, oracle-friendly).
        // Enum operands act as String (physical type) → concat → String.
        if (at.forall(DTypes.physical(_) == StringType)) StringType
        else if (at.exists(isTimeLike)) at.find(isTimeLike).get
        else if (at.forall(_ == BooleanType)) LongType
        else numBin()
      case "sub" =>
        if (at.forall(isTimeLike)) LongType // μs duration
        else numBin()
      case "mul" => numBin()
      case "truediv" => DoubleType
      case "floordiv" =>
        if (at.forall(isIntegral)) LongType else DoubleType
      case "mod" => numBin()
      case "pow" | "log" | "log10" | "exp" | "sqrt" | "cbrt" | "sin" | "cos" |
          "tan" | "asin" | "acos" | "atan" | "floor" | "ceil" => DoubleType
      case "neg" | "pos" | "abs" | "round" => a0
      case "rand" => DoubleType
      case "is_inf" | "is_nan" | "is_null" | "is_not_null" | "is_in" |
          "eq" | "ne" | "lt" | "le" | "gt" | "ge" |
          "and" | "or" | "xor" | "not" |
          "str.starts_with" | "str.ends_with" | "str.contains" |
          "str.contains_regex" | "h.any" | "h.all" | "any" | "all" => BooleanType
      case "fill_null" | "clip" | "h.max" | "h.min" | "coalesce" | "h.sum" => lcaAll(at)
      case "str.strip" | "str.upper" | "str.lower" | "str.replace_all" |
          "str.slice" | "str.join" => StringType
      case "str.len" => LongType
      case "str.to_datetime" => TimestampType
      case "str.to_date" => DateType
      case n if n.startsWith("dt.") || n.startsWith("dur.") => LongType
      case "min" | "max" => a0
      case "mean" => DoubleType
      case "sum" | "cum_sum" =>
        if (a0 == BooleanType) LongType
        else if (isIntegral(a0)) LongType
        else a0 match {
          // Spark widens sum-of-decimal by 10 integer digits
          case d: DecimalType => DecimalType(math.min(d.precision + 10, 38), d.scale)
          case t => t
        }
      case "count" | "count_star" | "row_number" | "rank" | "dense_rank" |
          "n_unique" | "approx_n_unique" => LongType
      case "median" | "quantile" => DoubleType
      case "shift" => a0
      case "list.agg" => ArrayType(a0)
      case other => throw new GraftError(s"no typing rule for op $other")
    }
  }

  /** ftype composition rules (reference: col_expr.py:2478-2533):
    * elementwise-of-aggregate = aggregate, elementwise-of-window = window,
    * aggregate-of-aggregate / window-in-agg-or-window = error. */
  def ftypeOf(e: ColExpr): FType = e match {
    case Fn(op, args, pb, _, filterC) =>
      val argF = (args ++ filterC).map(ftypeOf)
      op.ftype match {
        case FType.ElementWise =>
          if (argF.contains(FType.Aggregate) && argF.contains(FType.Window))
            throw new GraftFunctionTypeError(
              s"${op.name}: cannot mix aggregate and window arguments")
          if (argF.contains(FType.Window)) FType.Window
          else if (argF.contains(FType.Aggregate)) FType.Aggregate
          else FType.ElementWise
        case FType.Aggregate =>
          if (argF.exists(_ != FType.ElementWise))
            throw new GraftFunctionTypeError(
              s"${op.name}: nested aggregate/window inside an aggregation is not allowed")
          if (pb.nonEmpty) FType.Window else FType.Aggregate
        case FType.Window =>
          if (argF.exists(_ != FType.ElementWise))
            throw new GraftFunctionTypeError(
              s"${op.name}: nested aggregate/window inside a window function is not allowed")
          FType.Window
      }
    case CaseE(branches, otherwise) =>
      val fs = (branches.flatMap(b => Seq(b._1, b._2)) ++ otherwise).map(ftypeOf)
      if (fs.contains(FType.Aggregate) && fs.contains(FType.Window))
        throw new GraftFunctionTypeError("case: cannot mix aggregate and window branches")
      if (fs.contains(FType.Window)) FType.Window
      else if (fs.contains(FType.Aggregate)) FType.Aggregate
      else FType.ElementWise
    case CastE(inner, _, _) => ftypeOf(inner)
    case Marker(inner, _, _) => ftypeOf(inner)
    case _ => FType.ElementWise
  }
}

/** The single expression compiler `ColExpr → Column` (the analog of both
  * reference backends' `compile_col_expr`, polars.py:124-246 /
  * sql.py:... — Spark-first there is only one). */
object ExprCompiler {
  import DTypes._

  def compile(e: ColExpr, ctx: Ctx): Column = e match {
    case ColRef(u, _, _) => ctx.resolve(u)
    case CName(n) => throw new GraftError(s"unresolved C($n) reached compiler")
    case Lit(null, None) => F.lit(null)
    // typed literals cast to the PHYSICAL type (Enum → String, UInt →
    // carrier): the typing-layer types are not Spark runtime types
    case Lit(null, Some(dt)) => F.lit(null).cast(DTypes.physical(dt))
    case Lit(v, Some(dt)) => F.lit(v).cast(DTypes.physical(dt))
    case Lit(v, None) => F.lit(v)
    case Marker(inner, _, _) => compile(inner, ctx)
    case CastE(inner, to, strict) =>
      val c = compile(inner, ctx)
      val from = Typing.dtypeOf(inner, ctx.dtype)
      compileCast(c, from, to, strict)
    case CaseE(branches, otherwise) =>
      // untyped null conditions coerce to Boolean (types.py:295-298)
      def cond(e: ColExpr): Column = {
        val c = compile(e, ctx)
        if (Typing.dtypeOf(e, ctx.dtype) == NullType) c.cast(BooleanType) else c
      }
      val start = F.when(cond(branches.head._1), compile(branches.head._2, ctx))
      val chained = branches.tail.foldLeft(start) { case (acc, (c, v)) =>
        acc.when(cond(c), compile(v, ctx))
      }
      otherwise.map(o => chained.otherwise(compile(o, ctx))).getOrElse(chained)
    case fn @ Fn(op, _, _, _, _) =>
      op.ftype match {
        case FType.ElementWise => compileElementwise(fn, ctx)
        case FType.Aggregate => compileAggLike(fn, ctx)
        case FType.Window => compileWindow(fn, ctx)
      }
  }

  /** Cast semantics (reference cast matrix col_expr.py:2686-2722):
    * float→int truncates toward zero (Spark native); non-strict = try_cast
    * (null on failure); String→numeric strips whitespace first.
    * strict=true RAISES on conversion failure (reference col_expr.py:
    * 295-377) even under non-ANSI sessions: fallible casts compile to
    * try_cast plus a raise_error guard on rows where a non-null input
    * became null. Infallible casts (Catalyst up-casts) skip the guard
    * and stay a bare cast. */
  private def compileCast(c: Column, from0: DataType, to: DataType, strict: Boolean): Column = {
    // Enum target: runtime stays String; cast = membership check
    // (strict → raise on out-of-set non-null, try_cast → null)
    to match {
      case e: EnumType =>
        if (from0 == to) return c
        val member = c.isin(e.values: _*)
        return if (strict)
          F.when(c.isNotNull && !member,
              F.raise_error(F.lit(strictCastErrorMsg(e))))
            .otherwise(c)
          else F.when(member, c) // no otherwise → null
      case u: UIntType =>
        // UInt cast = carrier cast + range check [0, 2^bits): strict
        // raises on conversion failure OR out-of-range, try_cast nulls
        if (from0 == to) return c
        val fromPhys = DTypes.physical(from0)
        val src = if (fromPhys == StringType) F.trim(c) else c
        val tried = src.try_cast(u.carrier)
        val inRange = tried >= F.lit(0) && tried <= F.lit(u.maxValue)
        return if (strict)
          F.when(src.isNotNull && (tried.isNull || !inRange),
              F.raise_error(F.lit(strictCastErrorMsg(u))))
            .otherwise(tried)
          else F.when(inRange, tried) // no otherwise → null
      case _ => ()
    }
    // Enum source behaves as its physical String for every other target
    val from = DTypes.physical(from0)
    val src =
      if (from == StringType && isNumeric(to)) F.trim(c)
      else if (isFloating(from) && to == StringType)
        // render nan/inf like the reference (polars.py:235-237)
        F.when(F.isnan(c), F.lit("nan"))
          .when(c === Double.PositiveInfinity, F.lit("inf"))
          .when(c === Double.NegativeInfinity, F.lit("-inf"))
          .otherwise(c.cast(StringType))
      else c
    if (from == StringType && to == StringType) c
    else if (isFloating(from) && to == StringType) src
    else if (strict) {
      if (!castIsFallible(from, to)) src.cast(to)
      else {
        val tried = src.try_cast(to)
        F.when(src.isNotNull && tried.isNull,
            F.raise_error(F.lit(strictCastErrorMsg(to))))
          .otherwise(tried)
      }
    } else src.try_cast(to)
  }

  /** Shared with SqlGen so build_query emits the identical guard. */
  private[graft] def strictCastErrorMsg(to: DataType): String =
    s"graft: strict cast to ${to.sql} failed on a non-null value; use try_cast for null-on-failure"

  /** A cast can fail at runtime unless it is a Catalyst up-cast (or a
    * trivial same-type / from-null cast). */
  private[graft] def castIsFallible(from: DataType, to: DataType): Boolean =
    from != NullType && from != to &&
      !org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to)

  private def compileElementwise(fn: Fn, ctx: Ctx): Column = {
    val Fn(op, args, _, _, _) = fn
    lazy val rawAt = args.map(a => Typing.dtypeOf(a, ctx.dtype))
    // NullType (untyped null literal) coerces to the sibling-arg type —
    // the reference's implicit-conversion rule (types.py:295-298); for
    // logical ops the target is Boolean. Keeps Column-API analysis happy
    // where the SQL parser would have coerced.
    lazy val nullTarget: DataType = op.name match {
      case "and" | "or" | "xor" | "not" => BooleanType
      case _ =>
        val sib = rawAt.filterNot(_ == NullType)
        if (sib.isEmpty) StringType else sib.reduceLeft(DTypes.lca)
    }
    // dispatch on PHYSICAL types: EnumType executes as String, so every
    // `== StringType` branch (concat for add/h.sum) must see it as one
    lazy val at = rawAt.map(t =>
      DTypes.physical(if (t == NullType) nullTarget else t))
    lazy val c = args.zip(rawAt).map { case (a, t) =>
      val col = compile(a, ctx)
      if (t == NullType) col.cast(DTypes.physical(nullTarget)) else col
    }
    def a0 = c(0); def a1 = c(1)
    def boolToLong(i: Int): Column =
      if (at(i) == BooleanType) c(i).cast(LongType) else c(i)

    op.name match {
      case "add" =>
        if (at.forall(_ == StringType)) F.concat(a0, a1)
        else if (isTimeLike(at(0)))
          F.timestamp_micros(F.unix_micros(a0.cast(TimestampType)) + a1)
            .cast(if (at(0) == DateType) TimestampNTZType else at(0))
        else if (isTimeLike(at(1)))
          F.timestamp_micros(F.unix_micros(a1.cast(TimestampType)) + a0)
            .cast(if (at(1) == DateType) TimestampNTZType else at(1))
        else boolToLong(0) + boolToLong(1)
      case "sub" =>
        if (at.forall(isTimeLike))
          F.unix_micros(a0.cast(TimestampType)) - F.unix_micros(a1.cast(TimestampType))
        else a0 - a1
      case "mul" => a0 * a1
      case "truediv" => a0.cast(DoubleType) / a1.cast(DoubleType)
      case "floordiv" =>
        // truncation toward zero — C/SQL convention (arithmetic.py:49-87).
        // IntegralDivide (`a DIV b`) is native 64-bit trunc-toward-zero.
        if (at.forall(isIntegral))
          F.call_function("div", a0.cast(LongType), a1.cast(LongType))
        else F.floor(a0 / a1)
      case "mod" => a0 % a1 // dividend sign — Spark native (arithmetic.py:89-128)
      case "pow" => F.pow(a0, a1)
      case "neg" => -a0
      case "pos" => a0 // unary + is the identity (numeric.py:35)
      case "abs" => F.abs(a0)
      case "round" =>
        val d = fn.args(1) match {
          case Lit(i: Int, _) => i
          case other => throw new GraftTypeError(s"round: decimals must be a literal Int, got $other")
        }
        F.round(a0, d)
      case "floor" => F.floor(a0).cast(DoubleType)
      case "ceil" => F.ceil(a0).cast(DoubleType)
      case "log" => F.log(a0)
      case "log10" => F.log10(a0)
      case "exp" => F.exp(a0)
      case "sqrt" => F.sqrt(a0)
      case "cbrt" => F.cbrt(a0)
      case "sin" => F.sin(a0)
      case "cos" => F.cos(a0)
      case "tan" => F.tan(a0)
      case "asin" => F.asin(a0)
      case "acos" => F.acos(a0)
      case "atan" => F.atan(a0)
      case "is_inf" => a0 === Double.PositiveInfinity || a0 === Double.NegativeInfinity
      // null-propagating like the reference (duckdb.py:101-103 isnan,
      // polars.py:714-716 is_nan): Spark's IsNaN alone returns FALSE for
      // NULL input (the expression is non-nullable), which would diverge
      case "is_nan" =>
        F.when(a0.isNull, F.lit(null)).otherwise(F.isnan(a0))
      case "rand" => F.rand()
      case "eq" => a0 === a1
      case "ne" => a0 =!= a1
      case "lt" => a0 < a1
      case "le" => a0 <= a1
      case "gt" => a0 > a1
      case "ge" => a0 >= a1
      case "is_null" => a0.isNull
      case "is_not_null" => a0.isNotNull
      case "fill_null" => F.coalesce(a0, a1)
      case "is_in" =>
        // null propagates like chained `== OR ==` (comparison.py:55-67);
        // empty value list = false for non-null input, null for null input
        if (c.size <= 1)
          F.when(a0.isNull, F.lit(null).cast(BooleanType)).otherwise(F.lit(false))
        else c.tail.map(v => a0 === v).reduce(_ || _)
      case "clip" =>
        F.when(a0.isNull || a1.isNull || c(2).isNull, F.lit(null))
          .otherwise(F.least(F.greatest(a0, a1), c(2)))
      case "and" => a0 && a1 // Kleene natively (logical.py:8-138)
      case "or" => a0 || a1
      case "xor" => a0 =!= a1
      case "not" => !a0
      case "str.strip" => F.trim(a0)
      case "str.upper" => F.upper(a0)
      case "str.lower" => F.lower(a0)
      case "str.len" => F.length(a0).cast(LongType)
      case "str.replace_all" => F.replace(a0, a1, c(2)) // literal, not regex
      case "str.starts_with" => a0.startsWith(a1)
      case "str.ends_with" => a0.endsWith(a1)
      case "str.contains" => a0.contains(a1)
      case "str.contains_regex" => a0.rlike(litStr(fn.args(1)))
      case "str.slice" => a0.substr(a1 + F.lit(1), c(2)) // 0-based → 1-based (sql.py:742-745)
      case "str.to_datetime" => F.to_timestamp(a0)
      case "str.to_date" => F.to_date(a0)
      case "dt.year" => F.year(a0).cast(LongType)
      case "dt.month" => F.month(a0).cast(LongType)
      case "dt.day" => F.dayofmonth(a0).cast(LongType)
      case "dt.hour" => F.hour(a0).cast(LongType)
      case "dt.minute" => F.minute(a0).cast(LongType)
      case "dt.second" => F.second(a0).cast(LongType)
      case "dt.millisecond" =>
        (F.unix_micros(a0.cast(TimestampType)) % 1000000L / 1000L).cast(LongType)
      case "dt.microsecond" =>
        (F.unix_micros(a0.cast(TimestampType)) % 1000000L).cast(LongType)
      // ISO: Mon=1..Sun=7 (datetime.py:49-56; same fixup as duckdb.py:117-119)
      case "dt.day_of_week" => ((F.dayofweek(a0) + F.lit(5)) % 7 + F.lit(1)).cast(LongType)
      case "dt.day_of_year" => F.dayofyear(a0).cast(LongType)
      // durations are Long microseconds (from Datetime subtraction);
      // extractors are plain integer division (datetime.py:68-83)
      case "dur.days" => intDiv(a0, 86400000000L)
      case "dur.hours" => intDiv(a0, 3600000000L)
      case "dur.minutes" => intDiv(a0, 60000000L)
      case "dur.seconds" => intDiv(a0, 1000000L)
      case "dur.milliseconds" => intDiv(a0, 1000L)
      case "dur.microseconds" => a0
      case "h.max" => F.greatest(c: _*) // null-skipping natively (horizontal.py:27)
      case "h.min" => F.least(c: _*)
      case "coalesce" => F.coalesce(c: _*)
      case "h.any" => c.reduce(_ || _)
      case "h.all" => c.reduce(_ && _)
      case "h.sum" =>
        if (at.forall(_ == StringType)) F.concat(c: _*) else c.reduce(_ + _)
      case other => throw new GraftError(s"no compile rule for elementwise op $other")
    }
  }

  /** truncating-toward-zero integer division by a positive constant —
    * native IntegralDivide, far cheaper codegen than a decimal round-trip. */
  private def intDiv(c: Column, d: Long): Column =
    F.call_function("div", c, F.lit(d))

  private def litStr(e: ColExpr): String = e match {
    case Lit(s: String, _) => s
    case other => throw new GraftTypeError(s"expected a String literal, got $other")
  }

  /** An aggregate op: plain aggregation in summarize, windowed over the
    * (explicit or ambient) partition in mutate (verbs.py:1605-1611).
    * `.over` is applied to the aggregate FUNCTION itself; ordered-collect
    * post-processing (array_sort/transform) wraps outside the window. */
  private def compileAggLike(fn: Fn, ctx: Ctx): Column = {
    val w: Option[org.apache.spark.sql.expressions.WindowSpec] = ctx.mode match {
      case Mode.Agg => None
      case Mode.Project =>
        val part =
          if (fn.partitionBy.nonEmpty) fn.partitionBy.map(p => compile(p, ctx))
          else ctx.ambient
        // no orderBy: ordering for order-sensitive aggs is applied by the
        // post-sort, so the frame is always the whole partition
        Some(if (part.nonEmpty) Window.partitionBy(part: _*) else Window.partitionBy())
      case Mode.Simple =>
        throw new GraftFunctionTypeError(
          s"${fn.op.name}: aggregation not allowed in this context (filter/join/arrange)")
    }
    aggColumn(fn, ctx, w)
  }

  /** Build the aggregate Column (optionally windowed), applying the
    * `filter=` kwarg as the CASE-wrap desugaring (col_expr.py:2371-2383).
    * Empty/all-null input yields null (not 0/false) natively except count. */
  private def aggColumn(fn: Fn, ctx: Ctx,
      w: Option[org.apache.spark.sql.expressions.WindowSpec]): Column = {
    val Fn(op, args, _, arrange, filterC) = fn
    def fin(agg: Column): Column = w.map(agg.over).getOrElse(agg)
    def arg(i: Int): Column = {
      val raw = compile(args(i), ctx)
      filterC match {
        case Some(cond) if i == 0 => F.when(compile(cond, ctx), raw)
        case _ => raw
      }
    }
    lazy val at = args.map(a => Typing.dtypeOf(a, ctx.dtype))
    op.name match {
      case "min" => fin(F.min(arg(0)))
      case "max" => fin(F.max(arg(0)))
      case "mean" => fin(F.avg(arg(0).cast(DoubleType)))
      case "sum" =>
        if (at.head == BooleanType) fin(F.sum(arg(0).cast(LongType))) else fin(F.sum(arg(0)))
      case "any" => fin(F.max(arg(0))) // bool max = any (sql.py:815-821)
      case "all" => fin(F.min(arg(0)))
      case "count" => fin(F.count(arg(0)))
      case "count_star" =>
        filterC match {
          case Some(cond) => fin(F.count(F.when(compile(cond, ctx), F.lit(1))))
          case None => fin(F.count(F.lit(1)))
        }
      case "n_unique" => w match {
        // DISTINCT window functions are unsupported — count via collect_set
        case Some(ws) =>
          F.size(F.collect_set(compile(args.head, ctx)).over(ws)).cast(LongType)
        case None => F.count_distinct(compile(args.head, ctx))
      }
      // median/quantile are EXACT (the reference's semantics demand it):
      // Spark's percentile aggregate buffers every group value in the
      // aggregation buffer — the one aggregate here that does not stream
      // at scale. Billion-row groups should use approx_quantile-style
      // sketches instead; exactness is the contract these two keep.
      case "median" => fin(F.median(arg(0)).cast(DoubleType))
      case "quantile" =>
        val p = args(1) match {
          case Lit(d: Double, _) => d
          case other => throw new GraftTypeError(s"quantile: p must be a Double literal, got $other")
        }
        fin(F.percentile(arg(0), F.lit(p)).cast(DoubleType))
      case "approx_n_unique" => fin(F.approx_count_distinct(arg(0)))
      case "str.join" =>
        // reference semantics = STRING_AGG (backend/sql.py:892-894): null
        // values don't contribute, and a group with NO non-null values
        // (empty, all-null, or emptied by filter=) yields NULL — while
        // array_join over an empty collect would yield '' (found by the
        // q39 ordered-agg fuzz battery)
        val vals = F.filter(orderedCollect(arg(0), arrange, ctx, fin),
          v => v.isNotNull)
        F.when(F.size(vals) === 0, F.lit(null).cast(StringType))
          .otherwise(F.array_join(vals, litStr(args(1))))
      case "list.agg" => orderedCollect(arg(0), arrange, ctx, fin)
      case other => throw new GraftError(s"no compile rule for aggregate op $other")
    }
  }

  /** collect_list with deterministic ordering: collect (sortKeys..., v)
    * structs, array_sort with a desc/nulls-aware comparator, then project
    * the value back out. Distributed-safe: ordering is applied after the
    * shuffle, not assumed from it. */
  private def orderedCollect(value: Column, arrange: Seq[Ord], ctx: Ctx,
      fin: Column => Column): Column = {
    if (arrange.isEmpty) {
      // deterministic even without arrange: sort by the row-id surrogate
      // (collect_list order after a shuffle is otherwise unspecified)
      ctx.rowId match {
        case Some(rid) =>
          F.transform(
            F.array_sort(fin(F.collect_list(F.struct(rid.as("k0"), value.as("v"))))),
            x => x.getField("v"))
        case None => fin(F.collect_list(value))
      }
    } else {
      val keys = arrange.zipWithIndex.map { case (o, i) => compile(o.e, ctx).as(s"k$i") }
      val structs = fin(F.collect_list(F.struct(keys :+ value.as("v"): _*)))
      val cmp = (x: Column, y: Column) =>
        // pairwise field compare honoring desc / nullsLast per key
        arrange.zipWithIndex.foldRight(F.lit(0)) { case ((o, i), tail) =>
          val xf = x.getField(s"k$i"); val yf = y.getField(s"k$i")
          F.when(xf.isNull && yf.isNull, tail)
            .when(xf.isNull, F.lit(if (o.nullsLast) 1 else -1))
            .when(yf.isNull, F.lit(if (o.nullsLast) -1 else 1))
            .when(xf < yf, F.lit(if (o.desc) 1 else -1))
            .when(xf > yf, F.lit(if (o.desc) -1 else 1))
            .otherwise(tail)
        }
      F.transform(F.array_sort(structs, cmp), x => x.getField("v"))
    }
  }

  private def orderCol(o: Ord, ctx: Ctx): Column = {
    val c = compile(o.e, ctx)
    (o.desc, o.nullsLast) match {
      case (false, false) => c.asc_nulls_first
      case (false, true) => c.asc_nulls_last
      case (true, false) => c.desc_nulls_first
      case (true, true) => c.desc_nulls_last
    }
  }

  def orderColumns(ords: Seq[Ord], ctx: Ctx): Seq[Column] = ords.map(o => orderCol(o, ctx))

  /** Window-native ops (rank family, shift, cum_sum). Frames are implied
    * (no rowsBetween surface in the reference, ops/ops/window.py). */
  private def compileWindow(fn: Fn, ctx: Ctx): Column = {
    val Fn(op, args, partitionBy, arrange, _) = fn
    if (ctx.mode == Mode.Simple)
      throw new GraftFunctionTypeError(s"${op.name}: window function not allowed here")
    if (ctx.mode == Mode.Agg)
      throw new GraftFunctionTypeError(
        s"${op.name}: window functions are not allowed inside summarize (verbs.py:928-944)")
    val part = if (partitionBy.nonEmpty) partitionBy.map(p => compile(p, ctx)) else ctx.ambient
    val orders: Seq[Column] =
      if (arrange.nonEmpty) arrange.map(o => orderCol(o, ctx))
      else ctx.rowId.map(_.asc).toSeq
    if (orders.isEmpty)
      throw new GraftError(s"${op.name}: needs `arrange` (no implicit row order available)")
    val w: WindowSpec = (if (part.nonEmpty) Window.partitionBy(part: _*)
                         else Window.partitionBy()).orderBy(orders: _*)
    op.name match {
      case "row_number" => F.row_number().over(w).cast(LongType)
      case "rank" => F.rank().over(w).cast(LongType)
      case "dense_rank" => F.dense_rank().over(w).cast(LongType)
      case "shift" =>
        val n = fn.args(1) match {
          case Lit(i: Int, _) => i
          case other => throw new GraftTypeError(s"shift: n must be a literal Int, got $other")
        }
        val fill: Any = fn.args(2) match {
          case Lit(v, _) => v
          case other => throw new GraftTypeError(s"shift: fill must be a literal, got $other")
        }
        val c = compile(fn.args.head, ctx)
        if (n >= 0) F.lag(c, n, fill).over(w)
        else F.lead(c, -n, fill).over(w)
      case "cum_sum" =>
        val c = compile(args.head, ctx)
        F.sum(c).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      case other => throw new GraftError(s"no compile rule for window op $other")
    }
  }
}
