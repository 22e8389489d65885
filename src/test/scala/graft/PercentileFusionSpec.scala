package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate

/** [[graft.plans.PercentileFusion]]: sibling exact percentiles over one
  * operand must share ONE array-percentage buffer, with every reported
  * value bit-identical to the scalar calls'. */
class PercentileFusionSpec extends SparkSpec {
  import spark.implicits._

  private def percentileAggs(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate =>
      a.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression
            if ae.aggregateFunction.isInstanceOf[Percentile] => ae
      })
    }.flatten.distinct

  test("same-operand quantiles and median fuse to one buffer") {
    val df = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("g", "x")
    val q = df.groupBy("g").agg(
      F.percentile($"x", F.lit(0.2)).as("p20"),
      F.percentile($"x", F.lit(0.8)).as("p80"),
      F.median($"x").as("med"),
      // different operand — must NOT merge into the x-buffer
      F.percentile($"x" * 2, F.lit(0.5)).as("p50x2"))
    val aggs = percentileAggs(q)
    assert(aggs.size == 2, s"expected fused x-buffer + the x*2 one: $aggs")
    // values = Spark's OWN scalar percentiles, each computed in its own
    // single-percentile aggregation (which the rule provably leaves
    // alone — third test). Bit-identity against these is the rule's
    // actual claim; a hand-rolled interpolation would differ in the
    // last ulp (Spark evaluates (hi-pos)*lo + (pos-lo)*hi, not
    // lo + frac*(hi-lo)).
    val got = q.orderBy("g").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    def scalar(c: org.apache.spark.sql.Column, p: Double): Map[Int, Double] = {
      val lone = df.groupBy("g").agg(F.percentile(c, F.lit(p)).as("v"))
      assert(percentileAggs(lone).head.aggregateFunction
        .asInstanceOf[Percentile].percentageExpression.dataType ==
        org.apache.spark.sql.types.DoubleType,
        "control aggregation must stay scalar (unfused)")
      lone.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    }
    val (p20, p80, med, p50x2) = (scalar($"x", 0.2), scalar($"x", 0.8),
      scalar($"x", 0.5), scalar($"x" * 2, 0.5))
    got.foreach { case (g, a, b, c, d) =>
      val e = (g, p20(g), p80(g), med(g), p50x2(g))
      assert((g, a, b, c, d) == e,
        s"fused values must equal scalar percentiles: ${(g, a, b, c, d)} vs $e")
    }
  }

  test("empty and drained groups stay NULL through the fusion") {
    val df = Seq((0, Some(1.0)), (0, Some(2.0)), (1, None), (1, None))
      .toDF("g", "x")
    val q = df.groupBy("g").agg(
      F.percentile($"x", F.lit(0.25)).as("p25"),
      F.percentile($"x", F.lit(0.75)).as("p75"))
    assert(percentileAggs(q).size == 1, "all-null group must not block fusion")
    val rows = q.orderBy("g").collect()
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2),
      "an all-null group's percentiles must be NULL, as the scalar calls return")
  }

  test("distinct or single percentiles are left alone") {
    val df = (1 to 10).map(i => (i % 2, i.toDouble)).toDF("g", "x")
    val single = df.groupBy("g").agg(F.percentile($"x", F.lit(0.5)).as("p"))
    assert(percentileAggs(single).size == 1)
    assert(percentileAggs(single).head.aggregateFunction
      .asInstanceOf[Percentile].percentageExpression.dataType ==
      org.apache.spark.sql.types.DoubleType,
      "a lone percentile must keep its scalar percentage")
  }
}
