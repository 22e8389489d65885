package graft.sqlgen

import org.apache.spark.sql.types._
import graft.core._

/** Expression → ANSI/Spark SQL text emitter (the reference's `build_query`
  * idea, sql.py; here used for query inspection and as the independent
  * compilation path in the differential fuzzer — the same ColExpr is run
  * through ExprCompiler AND through Spark's SQL parser and must agree). */
object SqlGen {

  def litSql(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case d: Double => if (d.isNaN) "double('nan')"
      else if (d.isPosInfinity) "double('inf')"
      else if (d.isNegInfinity) "double('-inf')"
      else s"CAST($d AS DOUBLE)"
    case f: Float => s"CAST($f AS FLOAT)"
    case i: Int => s"$i"
    case l: Long => s"${l}L"
    case d: java.sql.Date => s"DATE'$d'"
    case t: java.time.LocalDateTime => s"TIMESTAMP_NTZ'$t'"
    case t: java.sql.Timestamp => s"TIMESTAMP'$t'"
    case t: java.time.LocalTime => // full precision, unambiguous parse
      s"TIME'${t.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS"))}'"
    case other => throw new GraftError(s"sqlgen: unsupported literal $other")
  }

  def typeSql(t: DataType): String = DTypes.physical(t).sql

  sealed trait Mode
  object Mode {
    case object Project extends Mode // mutate: aggregates become windows
    case object Agg extends Mode // summarize: plain aggregation
    case object Simple extends Mode // filter/join/arrange
  }

  /** Emit SQL for an expression; `nameOf` resolves column uuids to
    * (unquoted) source column names; `ambient` is the ambient grouping
    * (already rendered) injected as the window partition in Project mode. */
  def exprSql(e: ColExpr, nameOf: Long => String,
      mode: Mode = Mode.Simple, ambient: Seq[String] = Nil,
      typeOf: ColExpr => Option[DataType] = _ => None): String = {
    def ty(x: ColExpr): Option[DataType] = typeOf(x)
    def isTime(x: ColExpr): Boolean =
      ty(x).exists(t => t == TimestampType || t == TimestampNTZType || t == DateType)
    // physicalized: Enum executes as String, so enum-typed args take the
    // string branches exactly as the DataFrame compiler does
    def isStr(x: ColExpr): Boolean =
      ty(x).map(DTypes.physical).contains(StringType)
    def isInt(x: ColExpr): Boolean = ty(x).exists(DTypes.isIntegral)
    def go(e: ColExpr): String = e match {
      case ColRef(u, _, _) => s"`${nameOf(u)}`"
      case CName(n) => s"`$n`"
      case Lit(v, None) => litSql(v)
      case Lit(v, Some(t)) => s"CAST(${litSql(v)} AS ${typeSql(t)})"
      case Marker(inner, _, _) => go(inner)
      case CastE(inner, to: EnumType, strict) =>
        // enum cast = string membership check (mirrors compileCast)
        val x = go(inner)
        if (ty(inner).contains(to)) x
        else {
          val set = to.values.map(litSql).mkString("(", ", ", ")")
          if (strict) {
            val msg = graft.compile.ExprCompiler
              .strictCastErrorMsg(to).replace("'", "''")
            s"(CASE WHEN ($x) IS NOT NULL AND ($x) NOT IN $set " +
              s"THEN RAISE_ERROR('$msg') ELSE $x END)"
          } else s"(CASE WHEN ($x) IN $set THEN $x END)"
        }
      case CastE(inner, to: UIntType, strict) =>
        // uint cast = carrier cast + range guard (mirrors compileCast)
        val x0 = go(inner)
        if (ty(inner).contains(to)) x0
        else {
          val x = if (ty(inner).map(DTypes.physical).contains(StringType))
            s"TRIM($x0)" else x0
          val t = typeSql(to.carrier)
          val tc = s"TRY_CAST($x AS $t)"
          val max = to.maxValue.toPlainString
          if (strict) {
            val msg = graft.compile.ExprCompiler
              .strictCastErrorMsg(to).replace("'", "''")
            s"(CASE WHEN ($x) IS NOT NULL AND ($tc IS NULL OR $tc < 0 " +
              s"OR $tc > $max) THEN RAISE_ERROR('$msg') ELSE $tc END)"
          } else s"(CASE WHEN $tc >= 0 AND $tc <= $max THEN $tc END)"
        }
      case CastE(inner, to, strict) =>
        val x = go(inner); val t = typeSql(to)
        if (!strict) s"TRY_CAST($x AS $t)"
        else if (ty(inner).map(DTypes.physical).exists(f =>
            graft.compile.ExprCompiler.castIsFallible(f, to) &&
            !(f == StringType && to == StringType) &&
            !(DTypes.isFloating(f) && to == StringType))) {
          // mirror the compiler's strict-cast raise guard exactly
          val msg = graft.compile.ExprCompiler.strictCastErrorMsg(to).replace("'", "''")
          s"(CASE WHEN ($x) IS NOT NULL AND TRY_CAST($x AS $t) IS NULL " +
            s"THEN RAISE_ERROR('$msg') ELSE TRY_CAST($x AS $t) END)"
        } else s"CAST($x AS $t)"
      case CaseE(branches, otherwise) =>
        val whens = branches.map { case (c, v) => s"WHEN ${go(c)} THEN ${go(v)}" }
        val els = otherwise.map(o => s" ELSE ${go(o)}").getOrElse("")
        s"CASE ${whens.mkString(" ")}$els END"
      case fn @ Fn(op, args, _, _, _) => op.ftype match {
        case FType.ElementWise => elemSql(fn, go)
        case FType.Aggregate => aggSql(fn, go)
        case FType.Window => windowSql(fn, go)
      }
    }

    // type-sensitive elementwise cases mirror the compiler exactly
    def elemSql(fn: Fn, go: ColExpr => String): String = {
      val Fn(op, args, _, _, _) = fn
      lazy val a = args.map(go)
      op.name match {
        case "add" if args.forall(isStr) => s"CONCAT(${a(0)}, ${a(1)})"
        case "add" if isTime(args(0)) =>
          s"CAST(TIMESTAMP_MICROS(UNIX_MICROS(CAST(${a(0)} AS TIMESTAMP)) + ${a(1)}) AS TIMESTAMP_NTZ)"
        case "add" if isTime(args(1)) =>
          s"CAST(TIMESTAMP_MICROS(UNIX_MICROS(CAST(${a(1)} AS TIMESTAMP)) + ${a(0)}) AS TIMESTAMP_NTZ)"
        case "sub" if args.forall(isTime) =>
          s"(UNIX_MICROS(CAST(${a(0)} AS TIMESTAMP)) - UNIX_MICROS(CAST(${a(1)} AS TIMESTAMP)))"
        case "floordiv" if args.forall(isInt) =>
          s"(CAST(${a(0)} AS BIGINT) DIV CAST(${a(1)} AS BIGINT))"
        case "floordiv" => s"FLOOR(${a(0)} / ${a(1)})"
        case _ => fnSql(op, a, args, go)
      }
    }

    def ordSql(o: Ord): String = {
      val d = if (o.desc) "DESC" else "ASC"
      val nl = if (o.nullsLast) "NULLS LAST" else "NULLS FIRST"
      s"${go(o.e)} $d $nl"
    }

    def overClause(pb: Seq[ColExpr], arrange: Seq[Ord], frame: String = ""): String = {
      val part = (if (pb.nonEmpty) pb.map(go) else ambient) match {
        case Nil => ""
        case ps => s"PARTITION BY ${ps.mkString(", ")}"
      }
      val ord = if (arrange.nonEmpty) s"ORDER BY ${arrange.map(ordSql).mkString(", ")}" else ""
      s"OVER (${Seq(part, ord, frame).filter(_.nonEmpty).mkString(" ")})"
    }

    def aggSql(fn: Fn, go: ColExpr => String): String = {
      val Fn(op, args, pb, arrange, filterC) = fn
      // filter= kwarg desugars to CASE-wrap, exactly like the compiler
      def a0: String = filterC match {
        case Some(c) => s"CASE WHEN ${go(c)} THEN ${go(args.head)} END"
        case None => go(args.head)
      }
      val base = op.name match {
        case "min" => s"MIN($a0)"
        case "max" => s"MAX($a0)"
        case "mean" => s"AVG(CAST($a0 AS DOUBLE))"
        case "sum" => s"SUM($a0)"
        case "any" => s"MAX($a0)"
        case "all" => s"MIN($a0)"
        case "count" => s"COUNT($a0)"
        case "n_unique" => s"COUNT(DISTINCT ${go(args.head)})"
        case "median" => s"CAST(MEDIAN($a0) AS DOUBLE)"
        case "quantile" =>
          val p = args(1) match { case Lit(d: Double, _) => d; case _ => 0.5 }
          s"CAST(PERCENTILE($a0, $p) AS DOUBLE)"
        case "count_star" => filterC match {
          case Some(c) => s"COUNT(CASE WHEN ${go(c)} THEN 1 END)"
          case None => "COUNT(*)"
        }
        // Spark 4 LISTAGG: skips nulls and returns NULL on an empty
        // group — exactly the compiler's STRING_AGG-parity semantics.
        // Without arrange= the SQL text has no row-id surrogate to pin
        // the element order (the DataFrame compiler sorts by one), so
        // only the ordered form is expressible deterministically.
        case "str.join" =>
          if (arrange.isEmpty)
            throw new GraftError("sqlgen: str.join without arrange= has no " +
              "deterministic SQL rendering; pass arrange=")
          s"LISTAGG($a0, ${go(args(1))}) WITHIN GROUP " +
            s"(ORDER BY ${arrange.map(ordSql).mkString(", ")})"
        case other => throw new GraftError(s"sqlgen: no SQL rule for aggregate `$other`")
      }
      mode match {
        case Mode.Agg => base
        case Mode.Project =>
          if (arrange.nonEmpty)
            throw new GraftError("sqlgen: ordered aggregate-as-window not supported")
          s"$base ${overClause(pb, Nil)}"
        case Mode.Simple =>
          throw new GraftError("sqlgen: aggregate not allowed in this context")
      }
    }

    def windowSql(fn: Fn, go: ColExpr => String): String = {
      if (mode != Mode.Project)
        throw new GraftError("sqlgen: window function not allowed in this context")
      val Fn(op, args, pb, arrange, _) = fn
      if (arrange.isEmpty)
        throw new GraftError(s"sqlgen: ${op.name} needs explicit arrange for SQL text")
      op.name match {
        case "row_number" => s"CAST(ROW_NUMBER() ${overClause(pb, arrange)} AS BIGINT)"
        case "rank" => s"CAST(RANK() ${overClause(pb, arrange)} AS BIGINT)"
        case "dense_rank" => s"CAST(DENSE_RANK() ${overClause(pb, arrange)} AS BIGINT)"
        case "shift" =>
          val n = fn.args(1) match { case Lit(i: Int, _) => i; case _ => throw new GraftError("shift n") }
          val fill = go(fn.args(2))
          val c = go(fn.args.head)
          if (n >= 0) s"LAG($c, $n, $fill) ${overClause(pb, arrange)}"
          else s"LEAD($c, ${-n}, $fill) ${overClause(pb, arrange)}"
        case "cum_sum" =>
          s"SUM(${go(args.head)}) ${overClause(pb, arrange,
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")}"
        case other => throw new GraftError(s"sqlgen: no SQL rule for window `$other`")
      }
    }

    go(e)
  }

  def ordKeySql(o: Ord, nameOf: Long => String,
      typeOf: ColExpr => Option[DataType] = _ => None): String = {
    val d = if (o.desc) "DESC" else "ASC"
    val nl = if (o.nullsLast) "NULLS LAST" else "NULLS FIRST"
    // typeOf MUST be threaded: a strict cast inside a sort key renders
    // its raise guard only when the source type is known-fallible
    s"${exprSql(o.e, nameOf, Mode.Simple, Nil, typeOf)} $d $nl"
  }

  private def fnSql(op: Op, a: Seq[String], raw: Seq[ColExpr], go: ColExpr => String): String =
    op.name match {
      case "add" => s"(${a(0)} + ${a(1)})"
      case "sub" => s"(${a(0)} - ${a(1)})"
      case "mul" => s"(${a(0)} * ${a(1)})"
      case "truediv" => s"(CAST(${a(0)} AS DOUBLE) / CAST(${a(1)} AS DOUBLE))"
      case "mod" => s"(${a(0)} % ${a(1)})"
      case "pow" => s"POW(${a(0)}, ${a(1)})"
      case "neg" => s"(- ${a(0)})"
      case "pos" => a(0)
      case "abs" => s"ABS(${a(0)})"
      case "floor" => s"CAST(FLOOR(${a(0)}) AS DOUBLE)"
      case "ceil" => s"CAST(CEIL(${a(0)}) AS DOUBLE)"
      case "sqrt" => s"SQRT(${a(0)})"
      case "exp" => s"EXP(${a(0)})"
      case "log" => s"LN(${a(0)})"
      case "log10" => s"LOG10(${a(0)})"
      case "cbrt" => s"CBRT(${a(0)})"
      case "sin" => s"SIN(${a(0)})"
      case "cos" => s"COS(${a(0)})"
      case "tan" => s"TAN(${a(0)})"
      case "asin" => s"ASIN(${a(0)})"
      case "acos" => s"ACOS(${a(0)})"
      case "atan" => s"ATAN(${a(0)})"
      case "round" => s"ROUND(${a(0)}, ${raw(1) match { case Lit(i: Int, _) => i; case _ => 0 }})"
      // null-propagating, matching the compiler (Spark's ISNAN alone is
      // false for NULL input)
      case "is_nan" =>
        s"(CASE WHEN ${a(0)} IS NULL THEN NULL ELSE ISNAN(${a(0)}) END)"
      case "is_inf" =>
        s"(${a(0)} = double('inf') OR ${a(0)} = double('-inf'))"
      case "eq" => s"(${a(0)} = ${a(1)})"
      case "ne" => s"(${a(0)} != ${a(1)})"
      case "lt" => s"(${a(0)} < ${a(1)})"
      case "le" => s"(${a(0)} <= ${a(1)})"
      case "gt" => s"(${a(0)} > ${a(1)})"
      case "ge" => s"(${a(0)} >= ${a(1)})"
      case "is_null" => s"(${a(0)} IS NULL)"
      case "is_not_null" => s"(${a(0)} IS NOT NULL)"
      case "fill_null" => s"COALESCE(${a(0)}, ${a(1)})"
      case "is_in" =>
        if (a.size <= 1)
          s"(CASE WHEN ${a(0)} IS NULL THEN CAST(NULL AS BOOLEAN) ELSE FALSE END)"
        else a.tail.map(v => s"(${a(0)} = $v)").mkString("(", " OR ", ")")
      case "and" => s"(${a(0)} AND ${a(1)})"
      case "or" => s"(${a(0)} OR ${a(1)})"
      case "xor" => s"(${a(0)} != ${a(1)})"
      case "not" => s"(NOT ${a(0)})"
      case "clip" =>
        s"(CASE WHEN ${a(0)} IS NULL OR ${a(1)} IS NULL OR ${a(2)} IS NULL THEN NULL " +
          s"ELSE LEAST(GREATEST(${a(0)}, ${a(1)}), ${a(2)}) END)"
      case "str.strip" => s"TRIM(${a(0)})"
      case "str.upper" => s"UPPER(${a(0)})"
      case "str.lower" => s"LOWER(${a(0)})"
      case "str.len" => s"CAST(LENGTH(${a(0)}) AS BIGINT)"
      case "str.starts_with" => s"STARTSWITH(${a(0)}, ${a(1)})"
      case "str.ends_with" => s"ENDSWITH(${a(0)}, ${a(1)})"
      case "str.contains" => s"CONTAINS(${a(0)}, ${a(1)})"
      case "str.slice" => s"SUBSTRING(${a(0)}, ${a(1)} + 1, ${a(2)})"
      case "str.replace_all" => s"REPLACE(${a(0)}, ${a(1)}, ${a(2)})"
      case "str.contains_regex" => s"(${a(0)} RLIKE ${a(1)})"
      case "str.to_datetime" => s"TO_TIMESTAMP(${a(0)})"
      case "str.to_date" => s"TO_DATE(${a(0)})"
      case "dt.year" => s"CAST(YEAR(${a(0)}) AS BIGINT)"
      case "dt.month" => s"CAST(MONTH(${a(0)}) AS BIGINT)"
      case "dt.day" => s"CAST(DAY(${a(0)}) AS BIGINT)"
      case "dt.hour" => s"CAST(HOUR(${a(0)}) AS BIGINT)"
      case "dt.minute" => s"CAST(MINUTE(${a(0)}) AS BIGINT)"
      case "dt.second" => s"CAST(SECOND(${a(0)}) AS BIGINT)"
      case "dt.day_of_week" => s"CAST(((DAYOFWEEK(${a(0)}) + 5) % 7) + 1 AS BIGINT)"
      case "dt.day_of_year" => s"CAST(DAYOFYEAR(${a(0)}) AS BIGINT)"
      case "dt.millisecond" =>
        s"CAST(UNIX_MICROS(CAST(${a(0)} AS TIMESTAMP)) % 1000000 DIV 1000 AS BIGINT)"
      case "dt.microsecond" =>
        s"CAST(UNIX_MICROS(CAST(${a(0)} AS TIMESTAMP)) % 1000000 AS BIGINT)"
      // durations are Long microseconds; extractors are trunc-toward-zero
      // integer division, same as the compiler's intDiv
      case "dur.days" => s"(${a(0)} DIV 86400000000)"
      case "dur.hours" => s"(${a(0)} DIV 3600000000)"
      case "dur.minutes" => s"(${a(0)} DIV 60000000)"
      case "dur.seconds" => s"(${a(0)} DIV 1000000)"
      case "dur.milliseconds" => s"(${a(0)} DIV 1000)"
      case "dur.microseconds" => a(0)
      case "h.max" => s"GREATEST(${a.mkString(", ")})"
      case "h.min" => s"LEAST(${a.mkString(", ")})"
      case "coalesce" => s"COALESCE(${a.mkString(", ")})"
      case "h.any" => a.mkString("(", " OR ", ")")
      case "h.all" => a.mkString("(", " AND ", ")")
      case "h.sum" => a.mkString("(", " + ", ")")
      case other => throw new GraftError(s"sqlgen: no SQL rule for op `$other`")
    }
}
