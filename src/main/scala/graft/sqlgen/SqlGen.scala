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
    case other => throw new GraftError(s"sqlgen: unsupported literal $other")
  }

  def typeSql(t: DataType): String = t.sql

  /** Emit SQL for an elementwise expression; `nameOf` resolves column
    * uuids to (quoted) source column names. */
  def exprSql(e: ColExpr, nameOf: Long => String): String = {
    def go(e: ColExpr): String = e match {
      case ColRef(u, _, _) => s"`${nameOf(u)}`"
      case CName(n) => s"`$n`"
      case Lit(v, None) => litSql(v)
      case Lit(v, Some(t)) => s"CAST(${litSql(v)} AS ${typeSql(t)})"
      case Marker(inner, _, _) => go(inner)
      case CastE(inner, to, strict) =>
        val fn = if (strict) "CAST" else "TRY_CAST"
        s"$fn(${go(inner)} AS ${typeSql(to)})"
      case CaseE(branches, otherwise) =>
        val whens = branches.map { case (c, v) => s"WHEN ${go(c)} THEN ${go(v)}" }
        val els = otherwise.map(o => s" ELSE ${go(o)}").getOrElse("")
        s"CASE ${whens.mkString(" ")}$els END"
      case Fn(op, args, _, _, _) => fnSql(op, args.map(go), args, go)
    }
    go(e)
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
      case "abs" => s"ABS(${a(0)})"
      case "floor" => s"CAST(FLOOR(${a(0)}) AS DOUBLE)"
      case "ceil" => s"CAST(CEIL(${a(0)}) AS DOUBLE)"
      case "sqrt" => s"SQRT(${a(0)})"
      case "exp" => s"EXP(${a(0)})"
      case "eq" => s"(${a(0)} = ${a(1)})"
      case "ne" => s"(${a(0)} != ${a(1)})"
      case "lt" => s"(${a(0)} < ${a(1)})"
      case "le" => s"(${a(0)} <= ${a(1)})"
      case "gt" => s"(${a(0)} > ${a(1)})"
      case "ge" => s"(${a(0)} >= ${a(1)})"
      case "is_null" => s"(${a(0)} IS NULL)"
      case "is_not_null" => s"(${a(0)} IS NOT NULL)"
      case "fill_null" => s"COALESCE(${a(0)}, ${a(1)})"
      case "is_in" => a.tail.map(v => s"(${a(0)} = $v)").mkString("(", " OR ", ")")
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
      case "h.max" => s"GREATEST(${a.mkString(", ")})"
      case "h.min" => s"LEAST(${a.mkString(", ")})"
      case "coalesce" => s"COALESCE(${a.mkString(", ")})"
      case "h.any" => a.mkString("(", " OR ", ")")
      case "h.all" => a.mkString("(", " AND ", ")")
      case "h.sum" => a.mkString("(", " + ", ")")
      case other => throw new GraftError(s"sqlgen: no SQL rule for op `$other`")
    }
}
