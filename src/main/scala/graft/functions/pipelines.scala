package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}

/** End-to-end corpus curation: the extension operators composed into the
  * shape of a real training-data preparation job. Each stage is a lazy
  * DataFrame transform, so Catalyst plans the whole pipeline as one job
  * graph; the only shuffles are the two dedup stages' hash/band groupings.
  */
object pipelines {

  final case class CurationReport(
      input: Long, afterQuality: Long, afterLang: Long,
      afterExact: Long, afterNear: Long)

  /** Curate a documents table:
    * 1. quality-score filter,
    * 2. language allow-list (heuristic language-ID),
    * 3. exact dedup (md5 fingerprint, keep smallest id),
    * 4. MinHash-LSH near-dedup (drop the higher id of each pair),
    * 5. deterministic hash sample.
    * Returns the curated frame (same schema as input + quality/pred_lang).
    */
  def curateDocuments(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en"),
      nearDupThreshold: Double = 0.7,
      samplePermille: Int = 10000): DataFrame = {
    val scored = docs
      .withColumn("quality", text.qualityScore(F.col(textCol)))
      .withColumn("pred_lang", text.languageId(F.col(textCol)))
      .filter(F.col("quality") >= minQuality)
      .filter(F.col("pred_lang").isin(langs: _*))

    // exact dedup: keep the smallest id per fingerprint
    val keepExact = dedup.exactDuplicates(scored, idCol, textCol)
      .select(F.col("keep_id").as(idCol))
    val exactDeduped = scored.join(keepExact, idCol)

    // near-dedup: drop the larger id of every LSH-confirmed pair
    val dropNear = dedup.minhashPairs(exactDeduped, idCol, textCol,
        threshold = nearDupThreshold)
      .select(F.col("id_b").as(idCol)).distinct()
    val nearDeduped = exactDeduped.join(dropNear, Seq(idCol), "left_anti")

    if (samplePermille >= 10000) nearDeduped
    else sampling.hashSample(nearDeduped, idCol, samplePermille)
  }
}
