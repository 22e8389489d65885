package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow bridge into Spark's `private[sql]` Column↔Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`), needed
  * for the one expression family that carries NON-CHILD state — a
  * serialized Bloom filter — and therefore cannot be constructed
  * through the `FunctionRegistry` path (`F.call_function`), whose
  * builders only receive child `Expression`s. Everything else in graft
  * goes through registered functions; keep it that way — this bridge is
  * for constructor-state expressions only.
  *
  * Lives in package `org.apache.spark.sql` to satisfy the `private[sql]`
  * access qualifier — the standard interop pattern used by typed-Spark
  * libraries. No Spark internals are modified.
  */
package object graftbridge {

  /** Column wrapping a raw Catalyst expression. */
  def exprColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a (classic) Column. */
  def columnExpr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
