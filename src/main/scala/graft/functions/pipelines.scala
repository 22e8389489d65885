package graft.functions

import org.apache.spark.sql.{Column, DataFrame, functions => F}

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
    * 4. MinHash-LSH near-dedup resolved through connected components
    *    (keep the smallest id per duplicate GROUP — transitive and
    *    discovery-order-independent, unlike dropping `id_b` of each
    *    pair, which over-drops on chains A~B~C where A≁C; pass
    *    `keepBestBy` to keep the highest-scoring member instead),
    * 5. history near-dedup (optional: `indexName` names a persistent
    *    [[index]] built from previous crawls — batch documents that
    *    near-duplicate the INDEXED corpus are dropped without ever
    *    reshuffling it; the daily-crawl story in one call, with the
    *    caller appending survivors via [[index.buildJaccardIndex]]
    *    (SaveMode.Append) when the batch is admitted),
    * 6. benchmark decontamination (optional: n-gram overlap vs `bench`),
    * 7. deterministic hash sample.
    * Returns the curated frame (same schema as input + quality/pred_lang).
    * Stages 1-3 and 5-6 are lazy transforms; stage 4's component
    * resolution runs eagerly when called (a short driver loop of
    * O(log n) Spark jobs).
    */
  def curateDocuments(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en"),
      nearDupThreshold: Double = 0.7,
      nearDupExact: Boolean = false,
      nearDupMaxBucket: Int = 1000,
      keepBestBy: Option[Column] = None,
      indexName: Option[String] = None,
      bench: Option[DataFrame] = None,
      benchTextCol: String = "text",
      benchNgram: Int = 8,
      samplePermille: Int = 10000): DataFrame = {
    // The scored frame feeds every later stage (exact-dedup agg, its
    // rejoin, near-dup signatures, canonical filter, final output) and
    // its quality/language regexes are the most expensive per-row work
    // in the pipeline — cache it so the regex pass runs once, not once
    // per consumer. Release is deferred until the RETURNED frame is
    // consumed (releaseWhenConsumed below): the eager connected-
    // components jobs inside this composite read the cache without
    // dropping it, so the final output query reads the cached columnar
    // batches too. That also keeps the flagship pipeline's generated
    // code well under Janino's 64 KB method limit: the cache boundary
    // splits the quality/language regex stage from the dedup-join +
    // decontamination stage, instead of fusing them all into one
    // whole-stage-codegen method that would silently fall back to
    // interpreted execution.
    val scored = dedup.cachedPinned(docs
      .withColumn("quality", text.qualityScore(F.col(textCol)))
      .withColumn("pred_lang", text.languageId(F.col(textCol)))
      .filter(F.col("quality") >= minQuality)
      .filter(F.col("pred_lang").isin(langs: _*)))

    // exact dedup: keep the smallest id per fingerprint
    val keepExact = dedup.exactDuplicates(scored, idCol, textCol)
      .select(F.col("keep_id").as(idCol))
    val exactDeduped = scored.join(keepExact, idCol)

    // near-dedup: one canonical survivor per duplicate component.
    // nearDupExact = true verifies candidates with EXACT 3-shingle
    // Jaccard (cross-engine reproducible — the oracled x50 path);
    // default keeps the cheaper MinHash-estimate threshold. Either path
    // runs under the hot-bucket cap (`nearDupMaxBucket`, saltOversized):
    // a boilerplate-heavy band bucket is ring-split into ~cap-row
    // sub-buckets, bounding per-task pair generation at any skew — the
    // production default, since a real web corpus always has such
    // buckets. Set nearDupMaxBucket = 0 to force exact all-pairs
    // candidate generation inside every bucket regardless of size.
    val nearPairs =
      if (nearDupExact) dedup.jaccardPairsLsh(exactDeduped, idCol, textCol,
        minJ = nearDupThreshold, maxBucket = nearDupMaxBucket)
      else dedup.minhashPairs(exactDeduped, idCol, textCol,
        threshold = nearDupThreshold, maxBucket = nearDupMaxBucket)
    // survivor rule: min id by default; `keepBestBy` keeps the member
    // maximizing the given score instead (e.g. token count — the
    // fullest copy of a re-crawled page), via [[dedup.keepBest]]
    val nearDeduped = keepBestBy match {
      case Some(score) => dedup.keepBest(exactDeduped, idCol, nearPairs, score)
      case None => dedup.keepCanonical(exactDeduped, idCol, nearPairs)
    }

    // incremental path: drop batch documents near-duplicating the
    // persistent index (hash parameters come from the index itself; the
    // indexed corpus is probed in place, never reshuffled — see
    // [[index.probeJaccardIndex]])
    val afterIndex = indexName match {
      case Some(nm) =>
        val hits = index.probeJaccardIndex(docs.sparkSession, nearDeduped,
            idCol, textCol, nm, minJ = nearDupThreshold,
            maxBucket = nearDupMaxBucket)
          .select(F.col("id_new").as(idCol)).distinct()
        nearDeduped.join(hits, Seq(idCol), "left_anti")
      case None => nearDeduped
    }

    val clean = bench match {
      case Some(b) => contamination.decontaminate(
        afterIndex, idCol, textCol, b, benchTextCol, k = benchNgram)
      case None => afterIndex
    }
    val result =
      if (samplePermille >= 10000) clean
      else sampling.hashSample(clean, idCol, samplePermille)
    dedup.releaseWhenConsumed(scored, result)
    result
  }

  /** Per-document drop PROVENANCE over [[curateDocuments]]'s oracled
    * stage chain — the audit trail a production pipeline needs for
    * debugging and takedown appeals: one row per INPUT document with
    * each stage's verdict and the first stage that dropped it.
    *
    * Columns: `quality_pass` / `lang_pass` (always defined — pure
    * per-row predicates), `exact_keep` / `near_keep` / `sample_keep`
    * (NULL when the document never REACHED the stage — a doc dropped
    * by the quality filter has no exact-dedup verdict),
    * `dropped_at` ∈ {quality, language, exact_dup, near_dup, sample,
    * kept} — the first failing stage — and `dup_of`: the CANONICAL
    * surviving id a duplicate folded into (its fingerprint group's
    * keeper for exact_dup, its near-dup component's representative for
    * near_dup; NULL otherwise) — what a takedown appeal or a dedup
    * debug needs to answer "duplicate of WHAT". The kept set is exactly
    * [[curateDocuments]] with `nearDupExact = true` on the same
    * parameters (the x50 path), so the audit is a strict refinement:
    * `dropped_at = 'kept'` ⟺ membership in the curated output.
    *
    * Scale shape: the stage predicates are pure expressions; the only
    * additional work over the pipeline itself is the fingerprint-group
    * keeper join (same key grain the exact-dedup stage already
    * shuffles) and the component-frame left join — no new shuffle
    * classes beyond what the dedup stages already do. */
  def curationAudit(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en"),
      nearDupThreshold: Double = 0.7,
      nearDupMaxBucket: Int = 1000,
      samplePermille: Int = 10000): DataFrame = {
    val scored = dedup.cachedPinned(docs
      .withColumn("quality", text.qualityScore(F.col(textCol)))
      .withColumn("pred_lang", text.languageId(F.col(textCol))))
    val qPass = F.col("quality") >= minQuality
    val lPass = F.col("pred_lang").isin(langs: _*)
    val filt = scored.filter(qPass && lPass)
    // id → its fingerprint group's keeper (non-NULL ⟺ reached the
    // exact stage; keeper ⟺ _ca_keep = id) — carrying the keeper id
    // instead of a boolean is what makes dup_of derivable
    val exMap = filt.select(F.col(idCol),
        text.fingerprintMd5(F.col(textCol)).as("_ca_fp"))
      .join(dedup.exactDuplicates(filt, idCol, textCol)
        .select(F.col("fingerprint").as("_ca_fp"),
          F.col("keep_id").as("_ca_keep")), Seq("_ca_fp"))
      .select(F.col(idCol), F.col("_ca_keep"))
    val exactDeduped = filt.join(
      exMap.filter(F.col("_ca_keep") === F.col(idCol)).select(F.col(idCol)),
      Seq(idCol))
    val nearPairs = dedup.jaccardPairsLsh(exactDeduped, idCol, textCol,
      minJ = nearDupThreshold, maxBucket = nearDupMaxBucket)
    // the component frame (id, representative) rather than the survivor
    // set: a near-dup loser's dup_of IS its component representative
    val comp = dedup.connectedComponents(nearPairs)
      .select(F.col("id").as(idCol), F.col("component").as("_ca_comp"))
    val keeper = F.col("_ca_keep") === F.col(idCol)
    val nearSurvives = F.col("_ca_comp").isNull ||
      F.col("_ca_comp") === F.col(idCol)
    val samplePass = sampling.hashBucket(F.col(idCol)) < samplePermille
    val result = scored
      .join(exMap, Seq(idCol), "left")
      .join(comp, Seq(idCol), "left")
      .select(
        F.col(idCol),
        qPass.as("quality_pass"),
        lPass.as("lang_pass"),
        F.when(qPass && lPass, keeper).as("exact_keep"),
        F.when(qPass && lPass && keeper, nearSurvives).as("near_keep"),
        F.when(qPass && lPass && keeper && nearSurvives, samplePass)
          .as("sample_keep"),
        F.when(!qPass, F.lit("quality"))
          .when(!lPass, F.lit("language"))
          .when(!keeper, F.lit("exact_dup"))
          .when(!nearSurvives, F.lit("near_dup"))
          .when(!samplePass, F.lit("sample"))
          .otherwise(F.lit("kept")).as("dropped_at"),
        F.when(qPass && lPass && !keeper, F.col("_ca_keep"))
          .when(!nearSurvives, F.col("_ca_comp")).as("dup_of"))
    dedup.releaseWhenConsumed(scored, result)
    result
  }
}
