package graft.sqlgen

import scala.util.Try
import org.apache.spark.sql.types.DataType
import graft.core._

/** Incrementally-maintained SQL text for a Table pipeline — the analog of
  * the reference's `Query` record (sql.py:48-57) behind `build_query`.
  * Each verb either extends the current SELECT or nests it as a subquery
  * (auto-nesting replaces the reference's explicit alias() requirement,
  * since we never need the user to mark subquery boundaries). Tables whose
  * pipeline uses a non-SQL-expressible construct carry `None` and
  * `buildQuerySql` raises a clear error.
  *
  * Expressions are rendered by [[SqlGen]]; columns keep their internal
  * `_g<uuid>` names between layers and user names only in the final
  * projection, mirroring the DataFrame compiler exactly.
  */
final case class SqlQuery(sql: String) {

  private def nest: String = s"(\n$sql\n)"

  def mutate(defs: Seq[(Long, String)]): SqlQuery =
    SqlQuery(s"SELECT *, ${defs.map { case (u, e) => s"$e AS ${SqlQuery.in(u)}" }.mkString(", ")} FROM $nest")

  def filter(preds: Seq[String]): SqlQuery =
    SqlQuery(s"SELECT * FROM $nest WHERE ${preds.mkString(" AND ")}")

  def orderBy(keys: Seq[String]): SqlQuery =
    SqlQuery(s"SELECT * FROM $nest ORDER BY ${keys.mkString(", ")}")

  def limit(n: Int, offset: Int): SqlQuery =
    SqlQuery(s"SELECT * FROM $nest LIMIT $n" + (if (offset > 0) s" OFFSET $offset" else ""))

  def summarize(keys: Seq[Long], aggs: Seq[(Long, String)]): SqlQuery = {
    val sel = keys.map(SqlQuery.in) ++ aggs.map { case (u, e) => s"$e AS ${SqlQuery.in(u)}" }
    val grp = if (keys.isEmpty) "" else s" GROUP BY ${keys.map(SqlQuery.in).mkString(", ")}"
    SqlQuery(s"SELECT ${sel.mkString(", ")} FROM $nest$grp")
  }

  def join(right: SqlQuery, how: String, cond: Option[String]): SqlQuery = {
    val kw = how match {
      case "inner" => "JOIN"
      case "left" => "LEFT JOIN"
      case "full" => "FULL OUTER JOIN"
      case "cross" => "CROSS JOIN"
      case other => throw new GraftError(s"sqlgen: join type $other")
    }
    val on = cond.map(c => s" ON $c").getOrElse("")
    SqlQuery(s"SELECT * FROM $nest ${kw} (\n${right.sql}\n)$on")
  }

  /** union with per-side projections `(uuid, cast-type)` aligned by
    * position; output uses fresh uuids. */
  def union(right: SqlQuery, leftCols: Seq[(Long, DataType)],
      rightCols: Seq[(Long, DataType)], outUuids: Seq[Long], distinct: Boolean): SqlQuery = {
    def side(q: SqlQuery, cols: Seq[(Long, DataType)]): String = {
      val sel = cols.zip(outUuids).map { case ((u, t), ou) =>
        s"CAST(${SqlQuery.in(u)} AS ${t.sql}) AS ${SqlQuery.in(ou)}"
      }
      s"SELECT ${sel.mkString(", ")} FROM (\n${q.sql}\n)"
    }
    val op = if (distinct) "UNION" else "UNION ALL"
    SqlQuery(s"${side(this, leftCols)}\n$op\n${side(right, rightCols)}")
  }

  /** final projection to user-facing names. */
  def render(visible: Seq[(Long, String)]): String = {
    val sel = visible.map { case (u, n) => s"${SqlQuery.in(u)} AS `$n`" }
    s"SELECT ${sel.mkString(", ")} FROM $nest"
  }
}

object SqlQuery {
  private[sqlgen] def in(uuid: Long): String = s"_g$uuid"

  /** seed from a parquet source: internal names from day one. */
  def fromParquet(path: String, cols: Seq[(Long, String)]): SqlQuery =
    SqlQuery(s"SELECT ${cols.map { case (u, n) => s"`$n` AS ${in(u)}" }.mkString(", ")} " +
      s"FROM parquet.`$path`")

  /** Try-wrapper: verbs keep SQL tracking only while every expression is
    * SqlGen-expressible. */
  def attempt(prev: Option[SqlQuery])(f: SqlQuery => SqlQuery): Option[SqlQuery] =
    prev.flatMap(q => Try(f(q)).toOption)
}
