package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Sequence packing for pretraining: lay the corpus out as one
  * concatenated token stream cut into fixed-length training sequences
  * ("concat-and-chunk" — documents are not padded, and a document may
  * span a sequence boundary).
  *
  * Scale design: the assignment needs every document's offset in the
  * global stream, but a single corpus-wide cumulative-sum window would
  * put the whole corpus in one task. Instead the offset is computed in
  * two bounded passes, the same scheme [[sampling.tokenBudgetSample]]
  * uses: documents land in one of 10000 deterministic hash buckets,
  * pass 1 aggregates per-bucket token sums and turns them into bucket
  * base offsets (a window over ≤ 10000 rows, broadcast back), pass 2
  * computes each document's offset within its bucket (a window bounded
  * by one bucket's rows, ~1/10000 of the corpus). The resulting order —
  * by (bucket, id) — is deterministic, reproducible across runs,
  * cluster sizes and engines, and doubles as the corpus shuffle
  * pretraining wants (hash order ≈ random order).
  */
object packing {

  /** Per-document packing assignment: `(idCol…, n_tokens, offset,
    * seq_id, seq_off)` where `offset` is the document's start in the
    * concatenated token stream (ordered by (hash bucket, id)), `seq_id =
    * offset / seqLen` the training sequence its first token lands in,
    * and `seq_off = offset % seqLen` the position inside it. A document
    * with `seq_off + n_tokens > seqLen` continues into the next
    * sequence(s) — concat-and-chunk never pads. */
  def concatChunkOffsets(df: DataFrame, idCol: String, textCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, "packing: seqLen must be positive")
    val withB = df.select(F.col(idCol),
        text.tokenCount(F.col(textCol)).as("n_tokens"))
      .withColumn("_pk_bucket", sampling.hashBucket(F.col(idCol)))
    // pass 1: bucket base offsets (tiny frame: ≤ 10000 rows)
    val bases = withB.groupBy("_pk_bucket")
      .agg(F.sum("n_tokens").as("_pk_sum"))
      .withColumn("_pk_base",
        F.coalesce(F.sum("_pk_sum").over(
          // constant partition key: the whole ≤10000-row frame is ONE
          // task by design (bounded metadata, not corpus data); the
          // explicit spec documents that and keeps WindowExec from
          // warning about a missing partition.
          Window.partitionBy(F.lit(0)).orderBy("_pk_bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), F.lit(0L)))
      .select("_pk_bucket", "_pk_base")
    // pass 2: offset within the bucket (window bounded by one bucket)
    val inBucket = Window.partitionBy("_pk_bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(F.broadcast(bases), Seq("_pk_bucket"))
      .withColumn("offset",
        F.col("_pk_base") +
          F.coalesce(F.sum("n_tokens").over(inBucket), F.lit(0L)))
      .withColumn("seq_id", F.floor(F.col("offset") / seqLen))
      .withColumn("seq_off", F.pmod(F.col("offset"), F.lit(seqLen)))
      .select(F.col(idCol), F.col("n_tokens"), F.col("offset"),
        F.col("seq_id"), F.col("seq_off"))
  }
}
