package graft.functions

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure Column expressions — codegen'd, shuffle-free,
  * linear in input size, so they scale to arbitrary data volumes.
  */
object text {

  /** ALL leading/trailing whitespace removed. Spark's `trim` strips only
    * ASCII spaces, so a tab- or newline-edged document (routine in web
    * text) would otherwise produce phantom "" tokens at the edges —
    * found by PathologicalTextSpec (a "\t\r\n" document counted 2
    * tokens). The regex trim matches the `\s` class the splitter uses.
    * Oracle-safe: the driver fixtures have no tab/newline-edged
    * documents, so every trim-replaying oracle hashes identically. */
  private[graft] def wsTrim(c: Column): Column =
    F.regexp_replace(c, "^\\s+|\\s+$", "")

  def tokens(c: Column): Column = F.split(wsTrim(c), "\\s+")

  /** whitespace-separated token count. */
  def tokenCount(c: Column): Column =
    F.when(F.length(wsTrim(c)) === 0, F.lit(0L))
      .otherwise(F.size(tokens(c)).cast(LongType))

  def charCount(c: Column): Column = F.length(c).cast(LongType)

  def distinctTokenCount(c: Column): Column =
    F.size(F.array_distinct(tokens(c))).cast(LongType)

  /** BPE-ish subword pre-tokenization: word pieces OR single non-space
    * symbols (the GPT-2-style pre-tokenizer shape, simplified to an
    * RE2/Java-portable pattern). */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokens(c: Column): Column =
    F.regexp_extract_all(c, F.lit(BpeTokenPattern), F.lit(0))

  def bpeTokenCount(c: Column): Column = F.size(bpeTokens(c)).cast(LongType)

  /** count of regex matches (Spark regexp_count; oracle:
    * len(regexp_extract_all(...))). */
  def patternCount(c: Column, pattern: String): Column =
    F.regexp_count(c, F.lit(pattern)).cast(LongType)

  val EnStopwords = Seq("the", "a", "of", "to", "in", "and", "is")
  val DeStopwords = Seq("der", "die", "und", "das", "ist", "nicht")
  val FrStopwords = Seq("le", "la", "et", "les", "des", "est")
  val EsStopwords = Seq("el", "los", "y", "que", "una", "es")

  private def wordAlt(ws: Seq[String]): String = s"\\b(${ws.mkString("|")})\\b"

  def stopwordCount(c: Column, words: Seq[String]): Column =
    patternCount(F.lower(c), wordAlt(words))

  /** Heuristic quality score in [0,1]: stopword density + low punctuation
    * noise + length prior. Deterministic double arithmetic, written
    * identically in the DuckDB oracle. */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast(DoubleType)
    val nChar = charCount(c).cast(DoubleType)
    val punct = patternCount(c, "[^A-Za-z0-9\\s]").cast(DoubleType)
    val stops = stopwordCount(c, EnStopwords).cast(DoubleType)
    val stopRatio = stops / (nTok + F.lit(1.0))
    val punctRatio = punct / (nChar + F.lit(1.0))
    val lenPrior = F.least(nTok / F.lit(100.0), F.lit(1.0))
    stopRatio * F.lit(0.4) + (F.lit(1.0) - punctRatio) * F.lit(0.3) + lenPrior * F.lit(0.3)
  }

  /** n-gram/stopword language-ID heuristic over {en,de,fr,es,zh}:
    * CJK characters short-circuit to zh, otherwise argmax of per-language
    * stopword hit counts with a fixed tie-break order. */
  def languageId(c: Column): Column = {
    val lc = F.lower(c)
    val en = stopwordCount(lc, EnStopwords)
    val de = stopwordCount(lc, DeStopwords)
    val fr = stopwordCount(lc, FrStopwords)
    val es = stopwordCount(lc, EsStopwords)
    val hasCjk = F.regexp_count(c, F.lit("[\\x{4e00}-\\x{9fff}]")) > 0
    F.when(hasCjk, F.lit("zh"))
      .when(en >= de && en >= fr && en >= es, F.lit("en"))
      .when(de >= fr && de >= es, F.lit("de"))
      .when(fr >= es, F.lit("fr"))
      .otherwise(F.lit("es"))
  }

  /** full-document fingerprint (md5 hex). */
  /** PII scrubbing patterns — deliberately RE2/Java-portable (no
    * lookarounds, no backrefs) so the DuckDB oracle runs the identical
    * regexes. Ordered: emails first (an address contains dots that the
    * IP pattern must not see), then IPv4, then phone. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"

  /** Redact emails / IPv4s / phone-shaped numbers to typed placeholder
    * tags. Pure codegen'd expression chain — linear, shuffle-free, the
    * shape a 100 TB scrub pass needs. */
  def redactPii(c: Column): Column =
    F.regexp_replace(
      F.regexp_replace(
        F.regexp_replace(c, F.lit(EmailPattern), F.lit("<EMAIL>")),
        F.lit(Ipv4Pattern), F.lit("<IP>")),
      F.lit(PhonePattern), F.lit("<PHONE>"))

  /** Per-category PII match counts. Inputs mirror [[redactPii]]'s
    * cascade so counts reconcile with the emitted tags: emails and
    * phones are counted on the raw text, IPv4s on the email-redacted
    * text (an address's dotted host must not double-count as an IP). */
  def piiCounts(c: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> patternCount(c, EmailPattern),
    "n_ips" -> patternCount(F.regexp_replace(c, F.lit(EmailPattern),
      F.lit("<EMAIL>")), Ipv4Pattern),
    "n_phones" -> patternCount(c, PhonePattern))

  /** Luhn checksum over the digits of a candidate string (separators
    * ignored): true iff 13–19 digits and the mod-10 check passes — the
    * validation that separates real card numbers from digit soup, as a
    * pure builtin expression (no UDF). Engine-portable: split-to-chars,
    * right-to-left doubling fold. */
  def luhnValid(cand: Column): Column = {
    val chars = F.split(F.regexp_replace(cand, "[^0-9]", ""), "")
    val n = F.size(chars)
    val total = F.aggregate(F.sequence(F.lit(1), n), F.lit(0),
      (acc, i) => {
        val d = F.element_at(chars, (n - i + 1).cast(IntegerType))
          .cast(IntegerType)
        acc + F.when(F.pmod(i, F.lit(2)) === 0,
          F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    n >= 13 && n <= 19 && F.pmod(total, F.lit(10)) === 0
  }

  /** 13–19-digit runs (spaces/dashes allowed) that could be card
    * numbers, before Luhn validation. */
  val CcPattern = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"

  /** Candidate and Luhn-VALID card-number counts per document as a
    * struct `(n_candidates, n_valid_cards)` — the PII audit signal
    * [[redactPii]]'s regex cascade cannot give (a regex alone cannot
    * checksum). One extraction pass, one counting fold: name the result
    * once and project both fields, so the regex never runs twice. */
  def creditCardStats(c: Column): Column = {
    // group 0 = the whole match (Spark defaults to group 1; DuckDB to 0)
    val cands = F.regexp_extract_all(c, F.lit(CcPattern), F.lit(0))
    F.aggregate(cands,
      F.struct(F.lit(0L).as("n_candidates"), F.lit(0L).as("n_valid_cards")),
      (acc, x) => F.struct(
        (acc.getField("n_candidates") + 1L).as("n_candidates"),
        (acc.getField("n_valid_cards") +
          F.when(luhnValid(x), 1L).otherwise(0L)).as("n_valid_cards")))
  }

  /** Unicode normalization ([[graft.plans.UnicodeNormalizeExpr]]):
    * form ∈ NFC/NFD/NFKC/NFKD. Run before fingerprinting/dedup — the
    * same text arrives composed from one site and decomposed from
    * another, and un-normalized they hash apart. */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    F.call_function("graft_normalize", c, F.lit(form))

  /** NFD-decompose, drop combining marks, NFC-recompose
    * ([[graft.plans.StripAccentsExpr]]): `café` → `cafe`. */
  def stripAccents(c: Column): Column =
    F.call_function("graft_strip_accents", c)

  /** Canonical match key for cross-site text comparison: NFC, accents
    * stripped, lower-cased, whitespace collapsed. The folding every
    * fuzzy-matching stage (dedup keys, blocklists, contamination
    * n-grams) should share so "Café  Noir" and "cafe noir" collide. */
  def foldedText(c: Column): Column =
    F.regexp_replace(wsTrim(F.lower(stripAccents(normalizeUnicode(c, "NFC")))),
      "\\s+", " ")

  def fingerprintMd5(c: Column): Column = F.md5(c)

  /** 60-bit integer fingerprint: first 15 hex digits of md5 — portable to
    * any engine with md5 (oracle: CAST(concat('0x', substring(md5(x),1,15))
    * AS BIGINT)). */
  def fingerprint64(c: Column): Column =
    F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast(LongType)

  /** rolling polynomial hash over tokens (base-31, 61-bit prime modulus) —
    * order-sensitive document fingerprint computed in one array pass.
    * Spark-native (xxhash64 per token), no cross-engine oracle. */
  def rollingTokenHash(c: Column): Column = {
    // 31-bit prime modulus keeps acc*31 + h inside Long under ANSI mode
    val p = F.lit(1000000007L)
    F.aggregate(tokens(c), F.lit(0L),
      (acc, t) => F.pmod(acc * F.lit(31L) + F.pmod(F.xxhash64(t), p), p))
  }

  /** Extract readable text from HTML markup — the ingest step a web
    * corpus runs before any quality/dedup stage: script, style and
    * comment blocks dropped whole, block-level tags turned into line
    * breaks, every remaining tag stripped, the common named entities
    * unescaped, whitespace collapsed. A pure regexp_replace chain over
    * RE2-compatible patterns (no backreferences, flags inline), so the
    * extraction replays verbatim in any RE2 engine (the x73 DuckDB
    * oracle) and stays one shuffle-free codegen pass per row — at
    * 100 TB the extractor IS the scan, which is exactly where it
    * belongs. A DOM-accurate boilerplate model (trafilatura-class)
    * is out of scope; this is the regex tier such pipelines run first. */
  def extractHtmlText(c: Column): Column = {
    val noScript = F.regexp_replace(c,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = F.regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = F.regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = F.regexp_replace(noComment,
      "(?i)</?(?:p|br|div|li|h[1-6]|tr|table|ul|ol|blockquote|section|" +
        "article|header|footer|nav|pre)\\b[^>]*>", "\n")
    val noTags = F.regexp_replace(blocks, "<[^>]*>", " ")
    // &amp; must unescape LAST: "&amp;lt;" is the ESCAPED "&lt;" and a
    // single pass must yield "&lt;", not "<"
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col, (e, r)) =>
        F.regexp_replace(col, e, r) }
    val oneLine = F.regexp_replace(ent, "[ \\t\\x0B\\f\\r]+", " ")
    val tidy = F.regexp_replace(oneLine, " ?\\n[ \\n]*", "\n")
    // trim() strips only spaces; edge newlines need their own anchor
    F.trim(F.regexp_replace(tidy, "^\\n+|\\n+$", ""))
  }

  // ---- repetition / boilerplate signals (Gopher-style quality rules) ----

  /** zlib compression ratio of the text (compressed/raw bytes) — the
    * Gopher-family redundancy signal, computed by the codegen'd
    * [[graft.plans.DeflateRatioExpr]]. Repetitive boilerplate sits far
    * below natural prose; random soup approaches 1. Engine-native (no
    * SQL oracle). */
  def compressionRatio(c: Column): Column =
    F.call_function("graft_deflate_ratio", c)

  /** Remove repeated lines WITHIN a document, keeping each line's first
    * occurrence in order — the in-page companion to the corpus-wide
    * [[graft.functions.dedup.dedupLines]] (a nav bar repeated down one
    * page is in-doc noise even before any cross-document pass).
    * `array_distinct` preserves first-occurrence order, so this is one
    * shuffle-free scalar expression per row. */
  def dropRepeatedLines(c: Column): Column =
    F.array_join(F.array_distinct(F.split(c, "\n")), "\n")

  /** Fraction of lines that repeat an earlier line — the classic
    * boilerplate signal for scraped pages (nav bars, footers). */
  def duplicateLineFraction(c: Column): Column = {
    val lines = F.split(c, "\n")
    F.lit(1.0) - F.size(F.array_distinct(lines)).cast(DoubleType) /
      F.size(lines).cast(DoubleType)
  }

  /** Fraction of tokens that repeat an earlier token. */
  def duplicateTokenFraction(c: Column): Column = {
    val toks = tokens(c)
    F.lit(1.0) - F.size(F.array_distinct(toks)).cast(DoubleType) /
      F.size(toks).cast(DoubleType)
  }

  /** Share of the document's n-grams taken by its single most frequent
    * n-gram (Gopher's top-n-gram fraction, over counts). One codegen'd
    * tokenize + count pass per row ([[graft.plans.TopNgramShareExpr]]) —
    * no explode, no shuffle, so the signal costs the same as any other
    * scalar quality column at corpus scale. */
  def topNgramShare(c: Column, n: Int): Column =
    F.call_function("graft_top_ngram_share", c, F.lit(n))

  /** Built-ins-only version with identical semantics (sort the n-grams,
    * run-length fold for the longest run; interpreted — used to
    * cross-check the native expression). */
  private[graft] def topNgramSharePortable(c: Column, n: Int): Column = {
    val sorted = F.array_sort(dedup.shingles(c, n))
    val st = F.aggregate(sorted,
      F.struct(F.lit("").as("prev"), F.lit(0L).as("run"), F.lit(0L).as("best")),
      (acc, x) => {
        val run = F.when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(F.lit(1L))
        F.struct(x.as("prev"), run.as("run"),
          F.greatest(acc.getField("best"), run).as("best"))
      })
    st.getField("best").cast(DoubleType) / F.size(sorted).cast(DoubleType)
  }

  /** Corpus-wide top-`k` n-grams by occurrence count (vocabulary / stop-
    * phrase mining), ties broken by n-gram text. Scale shape: explode +
    * map-side partial aggregation onto the n-gram key (cardinality ≈
    * vocabulary, ≪ corpus), then Spark's TakeOrderedAndProject — a
    * bounded per-partition top-k merged on the driver, never a global
    * sort of the vocabulary. */
  def topNgrams(df: org.apache.spark.sql.DataFrame, textCol: String,
      n: Int, k: Int): org.apache.spark.sql.DataFrame =
    df.select(F.explode(dedup.shingleStrings(F.col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(F.count(F.lit(1)).as("n_occurrences"))
      .orderBy(F.col("n_occurrences").desc, F.col("ngram").asc)
      .limit(k)

  /** Corpus-level TF-IDF: the `topK` highest-scoring tokens per document
    * with smoothed idf (`ln((N+1)/(df+1)) + 1`), deterministic tie-break
    * by token, scores rounded to 9 decimals BEFORE ranking so ordering
    * is reproducible across engines. Scale shape: one shuffle to count
    * (doc, token), one vocabulary-keyed aggregation for document
    * frequencies (vocabulary ≪ corpus), the scalar document count
    * broadcast, and the per-document ranking window is bounded by a
    * single document's distinct tokens — never a corpus-wide sort. */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, topK: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(F.col(idCol),
        F.explode(tokens(F.col(textCol))).as("token"))
      .filter(F.length(F.col("token")) > 0)
    val tf = toks.groupBy(idCol, "token").agg(F.count(F.lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).as("df"))
    val nDocs = df.agg(F.count(F.lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(F.broadcast(nDocs))
      .withColumn("tfidf", F.round(
        F.col("tf").cast(DoubleType) *
          (F.log((F.col("n_docs").cast(DoubleType) + 1.0) /
            (F.col("df").cast(DoubleType) + 1.0)) + 1.0), 9))
    val w = Window.partitionBy(idCol)
      .orderBy(F.col("tfidf").desc, F.col("token").asc)
    scored.withColumn("rank", F.row_number().over(w).cast(LongType))
      .filter(F.col("rank") <= topK)
      .select(F.col(idCol), F.col("token"), F.col("tf"),
        F.col("tfidf"), F.col("rank"))
  }

  /** URL decomposition for crawl curation — regex-only (portable to any
    * engine; Spark's parse_url exists but has no DuckDB counterpart).
    * All shuffle-free codegen'd expressions. */
  val UrlHostPattern = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  val UrlPathPattern = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** raw authority component (may carry user@, port, mixed case). */
  def urlHost(c: Column): Column = F.regexp_extract(c, UrlHostPattern, 1)

  /** canonical host: lowercase, user-info and port stripped, one
    * leading `www.` dropped — the key crawl dedup/cap pipelines group
    * by. */
  def urlNormHost(c: Column): Column =
    F.regexp_replace(
      F.regexp_replace(
        F.regexp_replace(F.lower(urlHost(c)), "^[^@]*@", ""),
        ":[0-9]+$", ""),
      "^www\\.", "")

  /** registered domain ≈ last two dot-labels of the normalized host
    * (public-suffix lists need a table, not a regex; last-two is the
    * standard approximation for synthetic/test pipelines). */
  def urlDomain(c: Column): Column =
    F.regexp_extract(urlNormHost(c), "([^.]+\\.[^.]+)$", 1)

  def urlPath(c: Column): Column = F.regexp_extract(c, UrlPathPattern, 1)

  /** Dot-suffix chain of a host: `a.b.example.com` →
    * [a.b.example.com, b.example.com, example.com, com] — every level a
    * domain blocklist entry could match at. */
  def hostSuffixes(host: Column): Column = {
    val parts = F.split(host, "\\.")
    F.transform(F.sequence(F.lit(1), F.greatest(F.size(parts), F.lit(1))),
      i => F.array_join(F.slice(parts, i, F.size(parts)), "."))
  }

  /** True iff the url's canonical host ([[urlNormHost]]) matches a
    * blocklist domain at ANY suffix level (`spam.example.com` is blocked
    * by an `example.com` entry). The blocklist folds once into a
    * plan-resident hash set ([[graft.plans.StringArrayAnyInSet]]) —
    * the whole test is shuffle-free codegen'd per-row work, the right
    * shape for a few-thousand-entry blocklist against a 100 TB scan. */
  def blockedHost(url: Column, domains: Seq[String]): Column =
    F.call_function("graft_any_in_set",
      hostSuffixes(urlNormHost(url)),
      F.array(domains.map(d => F.lit(d.toLowerCase(java.util.Locale.ROOT))): _*))

  /** Drop rows whose url matches the blocklist ([[blockedHost]]). */
  def filterBlockedDomains(df: org.apache.spark.sql.DataFrame, urlCol: String,
      domains: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(!blockedHost(F.col(urlCol), domains))

  /** Blocklist filter for lists too large to ride the plan (millions of
    * domains): explode each row's suffix chain (≤ ~5 labels), hash
    * semi-join against the blocklist table (column `domain`), anti-join
    * the hit keys back. `keyCol` must be unique per row. The blocklist
    * and the hit set are both domain-cardinality — AQE broadcasts them
    * when they fit, falls back to shuffle joins when they don't. */
  def filterBlockedDomainsLarge(df: org.apache.spark.sql.DataFrame,
      urlCol: String, keyCol: String,
      blocked: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val hits = df
      .select(F.col(keyCol).as("_bl_key"),
        F.explode(hostSuffixes(urlNormHost(F.col(urlCol)))).as("_bl_sfx"))
      .join(blocked.select(F.lower(F.col("domain")).as("_bl_sfx")),
        Seq("_bl_sfx"), "left_semi")
      .select(F.col("_bl_key")).distinct()
    df.join(hits, F.col(keyCol) === F.col("_bl_key"), "left_anti")
  }

  /** Sliding-window token chunking (RAG / context-window ingestion):
    * split each document into `size`-token chunks starting every
    * `stride` tokens (overlap = size − stride). Pure per-row builtin
    * expressions (tokenize once, `sequence` of starts, `slice` +
    * `array_join` per chunk, one explode) — codegen'd, shuffle-free,
    * linear in corpus size. Chunk ids are `(doc, ordinal)`; the last
    * chunk may be short; empty docs yield no chunks. */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "chunkTokens: need 0 < stride <= size")
    val toks = F.col("_ck_toks")
    // k = ceil(max(n-size,0)/stride) + 1 chunks; last may be short
    val k = ((F.greatest(F.size(toks) - size, F.lit(0)) + (stride - 1)) /
      stride).cast(IntegerType) + 1
    val lastStart = (k - 1) * stride + 1
    df.select(F.col(idCol), tokens(F.col(textCol)).as("_ck_toks"))
      .filter(F.size(toks) > 0 && F.length(F.element_at(toks, 1)) > 0)
      .select(F.col(idCol), F.posexplode(F.transform(
        F.sequence(F.lit(1), lastStart, F.lit(stride)),
        s => F.array_join(F.slice(toks, s, F.lit(size)), " ")))
        .as(Seq("chunk_id", "chunk_text")))
      .withColumn("chunk_id", F.col("chunk_id").cast(LongType))
      .withColumn("n_tokens", tokenCount(F.col("chunk_text")))
  }

  /** Bigram language-model scoring (the KenLM-shaped upgrade of
    * [[unigramNll]]): train conditional bigram probabilities
    * `p(cur | prev) = C(prev, cur) / C(prev)` on the corpus itself and
    * score every document by its mean per-bigram negative
    * log-likelihood. Both context and bigram counts come from the data,
    * so every observed bigram has p ∈ (0, 1] — no smoothing needed for
    * self-scoring. Documents with fewer than two tokens get
    * n_bigrams = 0 and a null score.
    *
    * Scale shape mirrors [[unigramNll]]: per-(doc, bigram) frequencies
    * first (map-side combine collapses hot bigrams per doc before any
    * join), bigram and context tables are vocabulary-sized aggregations
    * of each other, and both joins are key-bounded (AQE splits the
    * "the"-context skew). Bigrams are extracted by the codegen'd
    * 2-shingle pass — one tokenize per row, no per-lambda re-split.
    * Determinism: the x34 scheme — per-bigram nll rounded to 7 digits,
    * DECIMAL-summed, mean rounded to 5. */
  def bigramNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val bg = df.filter(F.size(tokens(F.col(textCol))) >= 2)
      .select(F.col(idCol), F.explode(
        dedup.shingleStrings(F.col(textCol), 2)).as("_bg"))
      .select(F.col(idCol),
        F.substring_index(F.col("_bg"), " ", 1).as("prev"),
        F.substring_index(F.col("_bg"), " ", -1).as("cur"))
    val tf = bg.groupBy(idCol, "prev", "cur").agg(F.count(F.lit(1)).as("tf"))
    val bc = tf.groupBy("prev", "cur").agg(F.sum("tf").as("cb"))
    val cc = bc.groupBy("prev").agg(F.sum("cb").as("cp"))
    val scored = tf.join(bc, Seq("prev", "cur")).join(cc, Seq("prev"))
      .withColumn("_nll", F.round(-F.log(F.col("cb").cast(DoubleType) /
        F.col("cp").cast(DoubleType)), 7).cast(DecimalType(28, 7)))
      .groupBy(idCol)
      .agg(F.sum("tf").cast(LongType).as("n_bigrams"),
        F.round(F.sum(F.col("tf").cast(DecimalType(9, 0)) * F.col("_nll"))
          .cast(DoubleType) / F.sum("tf").cast(DoubleType), 5).as("nll"))
    df.select(F.col(idCol)).join(scored, Seq(idCol), "left")
      .select(F.col(idCol),
        F.coalesce(F.col("n_bigrams"), F.lit(0L)).as("n_bigrams"),
        F.col("nll"))
  }

  /** CCNet-style unigram language-model scoring: train a unigram LM on
    * the corpus itself (one aggregation) and score every document by its
    * mean per-token negative log-likelihood — the classic
    * perplexity-proxy quality filter (high nll = rare-token soup, low
    * nll = repetitive boilerplate; both tails get cut in curation).
    *
    * Scale shape: per-(doc, token) term frequencies FIRST (map-side
    * combine shrinks a hot token to one row per containing doc before
    * any join), then one token-keyed join tf↔vocab whose per-key row
    * count is bounded by the number of documents, not occurrences —
    * AQE's skew split handles "the". No broadcast of the vocabulary is
    * assumed: at 100 TB the vocab itself is join-sized, not
    * driver-sized.
    *
    * Determinism: per-token nll is rounded to 7 digits and summed as
    * DECIMAL (order-independent), so the result hash-matches any engine
    * computing the same expression. */
  def unigramNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(F.col(idCol),
        F.explode(tokens(F.col(textCol))).as("token"))
      .filter(F.length(F.col("token")) > 0)
    val tf = toks.groupBy(idCol, "token").agg(F.count(F.lit(1)).as("tf"))
    val vocab = tf.groupBy("token").agg(F.sum("tf").as("cnt"))
    val total = vocab.agg(F.sum("cnt").as("n"))
    tf.join(vocab, "token")
      .crossJoin(F.broadcast(total))
      .withColumn("_nll", F.round(-F.log(F.col("cnt").cast(DoubleType) /
        F.col("n").cast(DoubleType)), 7).cast(DecimalType(28, 7)))
      .groupBy(idCol)
      .agg(F.sum("tf").cast(LongType).as("n_tokens"),
        // tf as Decimal(9,0) keeps the product at scale 7 — a bare Long
        // would type the multiply (38,6) under allowPrecisionLoss and
        // silently drop the 7th digit the portability contract needs
        F.round(F.sum(F.col("tf").cast(DecimalType(9, 0)) * F.col("_nll"))
          .cast(DoubleType) / F.sum("tf").cast(DoubleType), 5).as("nll"))
  }

  /** Corpus-wide heavy hitters over an item-grain column (one row per
    * token/domain/shingle occurrence) via the Misra–Gries sketch
    * aggregate [[graft.plans.HeavyHitters]]. Returns
    * `(rank, item, cnt)` — the `topK` largest surviving counters,
    * rank 1 = most frequent, ties broken by item ascending.
    *
    * Scale: the plan is a single global aggregate whose PARTIAL buffers
    * are bounded at `capacity` counters, so the shuffle moves
    * ≤ capacity rows per input task — a `GROUP BY item ... LIMIT k`
    * would shuffle the full distinct vocabulary instead. Counts are
    * exact while the corpus' distinct-item count stays ≤ capacity
    * (the oracle regime) and otherwise are lower bounds within
    * N/(capacity+1), with every item above that frequency guaranteed
    * present. */
  def heavyHitters(df: org.apache.spark.sql.DataFrame, itemCol: String,
      capacity: Int, topK: Int): org.apache.spark.sql.DataFrame = {
    require(capacity >= 1 && topK >= 1,
      s"heavyHitters: capacity and topK must be >= 1 (got $capacity, $topK)")
    df.agg(F.call_function("graft_heavy_hitters",
        F.col(itemCol), F.lit(capacity), F.lit(topK)).as("_hh"))
      .select(F.posexplode(F.col("_hh")).as(Seq("_pos", "_e")))
      .select((F.col("_pos") + 1).cast(LongType).as("rank"),
        F.col("_e.item").as("item"), F.col("_e.cnt").as("cnt"))
  }
}
