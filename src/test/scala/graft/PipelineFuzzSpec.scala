package graft

import scala.util.Random
import org.apache.spark.sql.types._
import graft.core._
import graft.dsl._
import graft.table.Table

/** Verb-pipeline fuzzing: random chains of filter/mutate/summarize/
  * arrange/slice over a parquet source; the SQL text from buildQuerySql
  * must reproduce the DataFrame compiler's rows exactly. Aggregates are
  * restricted to order-independent ones (count/min/max/sum-of-long) so
  * both plans are deterministic. */
class PipelineFuzzSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  sealed trait Ty
  case object TLong extends Ty; case object TDouble extends Ty
  case object TBool extends Ty; case object TStr extends Ty

  private def tyOf(t: Table, n: String): Option[Ty] = t.col(n).dtype match {
    case LongType | IntegerType => Some(TLong)
    case DoubleType => Some(TDouble)
    case BooleanType => Some(TBool)
    case StringType => Some(TStr)
    case _ => None
  }
  private def colsOf(t: Table): Map[Ty, Seq[String]] =
    t.columns.flatMap(n => tyOf(t, n).map(ty => (ty, n))).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.length))

  private def rndExpr(r: Random, cols: Map[Ty, Seq[String]], t: Ty, d: Int): ColExpr = {
    def leaf(ty: Ty): ColExpr = {
      val useCol = cols.contains(ty) && r.nextInt(4) > 0
      if (useCol) C(pick(r, cols(ty)))
      else ty match {
        case TLong => lit(r.nextInt(11).toLong - 5L)
        case TDouble => lit((r.nextInt(17) - 8) / 2.0)
        case TBool => lit(r.nextBoolean())
        case TStr => lit(pick(r, Seq("x", "yy", "")))
      }
    }
    if (d <= 0) leaf(t)
    else {
      def sub(ty: Ty) = rndExpr(r, cols, ty, d - 1)
      t match {
        case TLong => r.nextInt(5) match {
          case 0 => sub(TLong) + sub(TLong)
          case 1 => sub(TLong) - sub(TLong)
          case 2 => sub(TLong).abs
          case 3 => sub(TStr).str.len
          case _ => when(sub(TBool)).then_(sub(TLong)).otherwise(sub(TLong))
        }
        case TDouble => r.nextInt(4) match {
          case 0 => sub(TDouble) + sub(TDouble)
          case 1 => sub(TDouble) * sub(TDouble)
          case 2 => hmax(sub(TDouble), sub(TDouble))
          case _ => when(sub(TBool)).then_(sub(TDouble)).otherwise(sub(TDouble))
        }
        case TBool => r.nextInt(6) match {
          case 0 => sub(TLong) < sub(TLong)
          case 1 => sub(TDouble) >= sub(TDouble)
          case 2 => sub(TStr) === sub(TStr)
          case 3 => sub(TBool) && sub(TBool)
          case 4 => sub(TBool) || sub(TBool)
          case _ => sub(TLong).isNull
        }
        case TStr => r.nextInt(3) match {
          case 0 => sub(TStr).str.upper
          case 1 => sub(TStr).str.lower
          case _ => when(sub(TBool)).then_(sub(TStr)).otherwise(sub(TStr))
        }
      }
    }
  }

  private def arrangeAll(t: Table): Table =
    t.arrange(t.columns.map(n => C(n): ColExpr): _*)

  private val iterations = sys.env.getOrElse("GRAFT_PIPE_FUZZ_N", "60").toInt

  test(s"fuzz: $iterations random verb pipelines — SQL text == DataFrame compiler") {
    (0 until iterations).foreach { i =>
      val r = new Random(1000 + i)
      var t: Table = Table.source(spark, dir, "orders").drop(C("o_orderdate"))
      var summarized = false
      var joined = false
      // determinism invariant: original source columns are never dropped,
      // so rows stay unique on the surviving key columns and every
      // arrangeAll is a total order EXCEPT across union-duplicated rows —
      // which are identical in every column, so slice boundaries and
      // row_number ties cannot change the collected multiset
      val steps = 2 + r.nextInt(4)
      (0 until steps).foreach { s =>
        val cols = colsOf(t)
        val choices = Seq.newBuilder[() => Unit]
        choices += (() => t = t.filter(rndExpr(r, cols, TBool, 2)))
        choices += (() => {
          val ty = pick(r, Seq[Ty](TLong, TDouble, TBool, TStr))
          t = t.mutate(s"m$s" -> rndExpr(r, cols, ty, 2))
        })
        choices += (() =>
          t = arrangeAll(t).sliceHead(5 + r.nextInt(40), offset = r.nextInt(4)))
        // rename a random column (uuid identity: old refs keep working)
        choices += (() => t = t.rename(Map(pick(r, t.columns) -> s"rn$s")))
        // window over a total order, partitioned by a random key
        if (cols.contains(TLong)) choices += (() => {
          val key = pick(r, cols.getOrElse(TStr, Nil) ++ cols(TLong))
          t = t.mutate(s"w$s" -> rowNumber(
            arrange = t.columns.map(n => C(n): ColExpr),
            partitionBy = Seq(C(key))))
        })
        // union with a filtered copy of itself (duplicates are identical
        // rows — harmless for determinism, see invariant above)
        choices += (() => t = t.union(
          t.filter(rndExpr(r, cols, TBool, 2)), distinct = r.nextBoolean()))
        if (!joined && cols.contains(TLong)) choices += (() => {
          val n = Table.source(spark, dir, "nation")
          val on = C(pick(r, cols(TLong))) % lit(25L) === n.col("n_nationkey")
          t = if (r.nextBoolean()) t.innerJoin(n, on) else t.leftJoin(n, on)
          joined = true
        })
        if (!summarized && cols.contains(TLong)) choices += (() => {
          val key = pick(r, cols.getOrElse(TStr, Nil) ++ cols(TLong))
          val aggs = Seq.newBuilder[(String, ColExpr)]
          aggs += ("n" -> count())
          aggs += ("mx" -> C(pick(r, cols(TLong))).max())
          aggs += ("sl" -> C(pick(r, cols(TLong))).sum())
          // ordered string aggregation (LISTAGG WITHIN GROUP in the SQL
          // text): arrange over ALL columns is total up to identical
          // union-duplicated rows, whose contributions are equal
          if (cols.contains(TStr)) aggs += ("sj" ->
            C(pick(r, cols(TStr))).str.join("|",
              arrange = t.columns.map(n => C(n): ColExpr)))
          t = t.groupBy(C(key)).summarize(aggs.result(): _*)
          summarized = true
        })
        val cs = choices.result()
        cs(r.nextInt(cs.length))()
      }
      t = arrangeAll(t)
      val sql = t.buildQuerySql
      val viaSql = spark.sql(sql).collect().map(_.toSeq).toSeq
      val viaDf = t.collect().map(_.toSeq).toSeq
      assert(viaDf == viaSql, s"pipeline $i diverged\nSQL:\n$sql")
    }
  }
}
