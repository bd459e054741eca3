package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification and
  * document fingerprinting.
  *
  * All operators are pure Column expressions over built-in functions —
  * embarrassingly parallel, no shuffle, no UDFs; everything computes in
  * one projection over the columnar scan with full column pruning.
  * (The higher-order-function pieces — stopword `filter` lambdas — are
  * interpreted rather than codegen'd, a Spark limitation on HOFs; the
  * scalar pieces stay in whole-stage codegen.) At 100 TB these run at
  * parquet-scan speed.
  */
object TextAnalysis {

  /** Whitespace tokenization (the BPE-ish regex variant is
    * [[bpeTokenCount]]). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    graft.functions.WsTokens.countOf(text)

  /** A BPE-flavored token estimate: words and punctuation split like a
    * byte-pair pre-tokenizer would (letters+digits runs, single
    * punctuation marks). Any whitespace char is a separator, never a
    * token. One codegen'd kernel pass
    * ([[graft.functions.TextStats.bpeTokenCount]] — the HOF `filter`
    * it replaces kept `analyze()`'s projection out of whole-stage
    * codegen). */
  def bpeTokenCount(text: Column): Column =
    graft.functions.TextStats.bpeTokenCountOf(text)

  def charCount(text: Column): Column = length(text)

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text))

  /** Fraction of characters that are uppercase letters. */
  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double")
        / length(text))

  /** Mean word length — long-words-heavy or fragmenty text scores off
    * the typical 3–10 band. */
  def meanWordLength(text: Column): Column =
    when(tokenCount(text) === 0, 0.0)
      .otherwise(length(regexp_replace(trim(text), "\\s+", "")).cast("double")
        / tokenCount(text))

  /** Tiny per-language stopword lists — enough signal for an n-gram /
    * stopword heuristic; not a full langdetect. */
  val StopwordLists: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "que", "una", "por", "con", "para")
  )

  /** Per-language stopword hit counts via the one-pass codegen kernel
    * ([[graft.functions.TextStats.stopwordCounts]] — the HOF `filter`
    * formulation this replaces evicted every containing projection
    * from whole-stage codegen and re-tokenized per language). */
  private def stopwordHits(text: Column, lang: String): Column =
    graft.functions.TextStats
      .stopwordCountsOf(text, Seq(lang -> StopwordLists(lang)))
      .getField(lang)

  /** Fraction of tokens that are stopwords of the given language. */
  def stopwordRatio(text: Column, lang: String = "en"): Column =
    when(tokenCount(text) === 0, 0.0)
      .otherwise(stopwordHits(text, lang).cast("double") / tokenCount(text))

  /** Language ID: argmax of per-language stopword hit counts, 'und'
    * (undetermined) when nothing hits. Deterministic tie-break by
    * language code order. All languages are counted in ONE kernel pass
    * (one tokenization instead of one interpreted filter per
    * language). */
  def langId(text: Column): Column = {
    val langs = StopwordLists.toSeq.sortBy(_._1)
    val counts = graft.functions.TextStats.stopwordCountsOf(text, langs)
    val scored = langs.map { case (langCode, _) =>
      struct(counts.getField(langCode).as("hits"), lit(langCode).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Real multi-language ID: the Cavnar–Trenkle character n-gram
    * rank-profile classifier over ~55 languages
    * ([[graft.functions.LangId]] — one codegen kernel pass, profiles
    * are deterministic embedded data). `und` for letter-less or NULL
    * text. The 4-language stopword heuristic above ([[langId]]) stays
    * as the cheap English-centric fallback. */
  def langIdProfiles(text: Column): Column =
    coalesce(
      graft.functions.LangId.langIdProfilesScored(text).getField("lang"),
      lit("und"))

  /** [[langIdProfiles]] with the winning out-of-place distance kept —
    * the confidence signal (smaller = closer to the profile; compare
    * against `ProfileSize * doc grams` for a normalized score). */
  def langIdProfilesScored(text: Column): Column =
    graft.functions.LangId.langIdProfilesScored(text)

  /** Composite quality score in [0, 1]: rewards reasonable length,
    * moderate punctuation, presence of stopwords, typical word length.
    * Weights are heuristic; the VALUE is being cheap enough to run on
    * every document of a 100 TB corpus in the scan stage.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 20.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val wordLenScore = when(meanWordLength(text).between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + wordLenScore * 0.2, 6)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * Identical in DuckDB (`md5(...)`) — exact-dedup hashes and oracle
    * checks line up across engines. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling-style fingerprint using xxhash64 — the cheap
    * numeric variant for joins/bucketing at scale. */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Fraction of non-blank lines that duplicate an earlier line — the
    * Gopher/RefinedWeb-style repetition signal (boilerplate, scraped
    * nav menus, log spam). Pure scan-side list algebra; replays in
    * DuckDB as `list_filter(string_split(text, chr(10)), ...)` +
    * `list_distinct`. */
  def dupLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    when(size(lines) === 0, 0.0).otherwise(
      (size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
  }

  /** Fraction of tokens that duplicate an earlier token (lowercased).
    * High values flag keyword-stuffed or looping generations. */
  def dupWordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(tokenCount(text) === 0, 0.0).otherwise(
      (size(toks) - size(array_distinct(toks))).cast("double") / size(toks))
  }

  /** Sliding word n-grams of the token array, joined by single spaces.
    * Caller guards `size(toks) >= n` (an unguarded
    * `sequence(1, len-n+1)` would run DESCENDING when len < n). */
  private def wordNgrams(toks: Column, n: Int): Column =
    transform(sequence(lit(1), size(toks) - (n - 1)),
      i => array_join(slice(toks, i, lit(n)), " "))

  /** Denominator for the repetition fractions: characters of the
    * whitespace-normalized lowercased text — the same normal form the
    * n-grams are built from, so a fully-repeated doc scores exactly 1. */
  private def normCharCount(toks: Column): Column =
    length(array_join(toks, " "))

  // The two Gopher repetition signals below both need per-gram
  // frequencies. Naive count-each-distinct-gram is O(distinct × total)
  // per document — billions of comparisons for 100k-token docs. Instead:
  // sort the gram list once (O(G log G)) and fold a single pass over it,
  // counting adjacent-equal runs with a struct accumulator (O(G)). All
  // arithmetic is 64-bit so count×length can't wrap on huge documents.

  /** One sorted pass → struct(bestCnt, bestLen): the highest run count
    * and, among tied runs, the longest gram (ties on count break toward
    * the longer gram — maximizes the fraction and stays
    * engine-independent without a string tie-break). */
  private def topRunStats(grams: Column): Column = {
    val zero = struct(
      lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("bestCnt"), lit(0L).as("bestLen"))
    def close(acc: Column): (Column, Column) = {
      val better = acc.getField("run") > acc.getField("bestCnt") ||
        (acc.getField("run") === acc.getField("bestCnt") &&
          length(acc.getField("prev")).cast("long") > acc.getField("bestLen"))
      (when(better, acc.getField("run")).otherwise(acc.getField("bestCnt")),
        when(better, length(acc.getField("prev")).cast("long"))
          .otherwise(acc.getField("bestLen")))
    }
    aggregate(array_sort(grams), zero,
      (acc, g) => {
        val (cnt, len) = close(acc)
        when(acc.getField("run") > 0 && g === acc.getField("prev"),
          struct(acc.getField("prev").as("prev"),
            (acc.getField("run") + 1L).as("run"),
            acc.getField("bestCnt").as("bestCnt"),
            acc.getField("bestLen").as("bestLen")))
        .otherwise(
          struct(g.as("prev"), lit(1L).as("run"),
            cnt.as("bestCnt"), len.as("bestLen")))
      },
      acc => {
        val (cnt, len) = close(acc)
        struct(cnt.as("bestCnt"), len.as("bestLen"))
      })
  }

  /** Gopher A1.1 repetition signal: fraction of characters contained
    * in the occurrences of the MOST FREQUENT word n-gram (n = 2, 3, 4
    * in the paper; thresholds 0.20 / 0.18 / 0.16). Occurrence
    * characters may overlap ("a a a" at n=2), so the fraction is
    * capped at 1. One array_sort + one fold per document — O(G log G),
    * no shuffle, no UDF. */
  def topNgramCharFraction(text: Column, n: Int): Column = {
    require(n >= 2, s"topNgramCharFraction wants n >= 2, got $n")
    val toks = tokens(lower(text))
    val best = topRunStats(wordNgrams(toks, n))
    when(tokenCount(text) < n || normCharCount(toks) === 0, 0.0).otherwise(
      least(lit(1.0),
        (best.getField("bestCnt") * best.getField("bestLen")).cast("double")
          / normCharCount(toks)))
  }

  /** Gopher A1.1 repetition signal: fraction of characters contained
    * in word n-grams that occur MORE THAN ONCE (n = 5..10 in the
    * paper; thresholds 0.15 down to 0.10). Like the open
    * reimplementations (RedPajama, Dolma) this sums `count × length`
    * over duplicated grams without overlap accounting, capped at 1 —
    * the paper's "not counting characters twice" refinement needs
    * per-position bookkeeping that buys little at these thresholds.
    * Same sorted-run fold as [[topNgramCharFraction]]: O(G log G),
    * 64-bit accumulation. */
  def dupNgramCharFraction(text: Column, n: Int): Column = {
    require(n >= 2, s"dupNgramCharFraction wants n >= 2, got $n")
    val toks = tokens(lower(text))
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dup"))
    def closed(acc: Column): Column =
      acc.getField("dup") + when(acc.getField("run") > 1,
        acc.getField("run") * length(acc.getField("prev")).cast("long"))
        .otherwise(0L)
    val dupChars = aggregate(array_sort(wordNgrams(toks, n)), zero,
      (acc, g) =>
        when(acc.getField("run") > 0 && g === acc.getField("prev"),
          struct(acc.getField("prev").as("prev"),
            (acc.getField("run") + 1L).as("run"),
            acc.getField("dup").as("dup")))
        .otherwise(
          struct(g.as("prev"), lit(1L).as("run"), closed(acc).as("dup"))),
      acc => closed(acc))
    when(tokenCount(text) < n || normCharCount(toks) === 0, 0.0).otherwise(
      least(lit(1.0), dupChars.cast("double") / normCharCount(toks)))
  }

  // PII patterns kept to constructs with IDENTICAL semantics in Java
  // regex and RE2 (DuckDB): char classes, bounded quantifiers, \d, \b.
  // No lookarounds, no backrefs — those diverge across engines.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Count of PII-looking spans (emails + IPv4 literals). */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0)))

  /** Replace PII-looking spans with a placeholder token. Emails are
    * scrubbed FIRST so an address like a@1.2.3.4 cannot leave a bare
    * IP behind. Scan-side, codegen'd — the shape of every
    * redact-before-training pass at corpus scale. */
  def scrubPii(text: Column, replacement: String = "<PII>"): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, replacement),
      Ipv4Pattern, replacement)

  /** NANP-shaped phone numbers with an optional +country prefix:
    * `(555) 123-4567`, `555-123-4567`, `+1 555.123.4567`. The word
    * boundary sits only on the bare-digits branch — there is no \b
    * between a space and '(' or '+'. Verified cross-engine: does NOT
    * match 16-digit card groups, dotted IPv4 quads, or unbroken digit
    * runs. */
  val PhonePattern =
    "(\\+\\d{1,3}[ .-]?)?(\\(\\d{3}\\)[ .-]?|\\b\\d{3}[ .-])\\d{3}[ .-]\\d{4}\\b"

  /** US SSN shape `ddd-dd-dddd`. */
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Which PII families to detect/scrub. The default is EXACTLY the
    * original [[scrubPii]]/[[piiCount]] surface (emails + IPv4) — the
    * extended families are opt-in flags, so existing pipelines keep
    * their bytes. Credit cards are candidate-shape + Luhn checksum
    * ([[graft.functions.Pii]] — the one family regex alone cannot
    * decide). */
  case class PiiConfig(
      emails: Boolean = true,
      ipv4: Boolean = true,
      phones: Boolean = false,
      ssns: Boolean = false,
      creditCards: Boolean = false,
      replacement: String = "<PII>")

  /** Count of PII spans under `cfg` — each family counted on the
    * ORIGINAL text (the [[piiCount]] convention), cards Luhn-gated. */
  def piiCountExtended(text: Column, cfg: PiiConfig = PiiConfig()): Column = {
    val parts =
      (if (cfg.emails) Seq(size(regexp_extract_all(text, lit(EmailPattern), lit(0)))) else Nil) ++
      (if (cfg.ipv4) Seq(size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0)))) else Nil) ++
      (if (cfg.creditCards) Seq(graft.functions.Pii.cardCountCol(text)) else Nil) ++
      (if (cfg.ssns) Seq(size(regexp_extract_all(text, lit(SsnPattern), lit(0)))) else Nil) ++
      (if (cfg.phones) Seq(size(regexp_extract_all(text, lit(PhonePattern), lit(0)))) else Nil)
    if (parts.isEmpty) lit(0) else parts.reduce(_ + _)
  }

  /** Scrub PII spans under `cfg`, sequentially: emails → IPv4 →
    * cards (Luhn-gated kernel) → SSNs → phones. Emails first for the
    * same reason as [[scrubPii]]; IPv4 before phones so a dotted quad
    * can never be half-eaten as a phone; cards before phones so a
    * card's digit groups are gone before the phone shapes run. With
    * the default config this is byte-identical to [[scrubPii]]
    * (OpsSpec-pinned). All families are scan-side codegen — one
    * projection over the scan at any corpus scale. */
  def scrubPiiExtended(text: Column, cfg: PiiConfig = PiiConfig()): Column = {
    var t = text
    if (cfg.emails) t = regexp_replace(t, EmailPattern, cfg.replacement)
    if (cfg.ipv4) t = regexp_replace(t, Ipv4Pattern, cfg.replacement)
    if (cfg.creditCards) t = graft.functions.Pii.cardScrubCol(t, cfg.replacement)
    if (cfg.ssns) t = regexp_replace(t, SsnPattern, cfg.replacement)
    if (cfg.phones) t = regexp_replace(t, PhonePattern, cfg.replacement)
    t
  }

  /** Corpus document-frequency table: one row per distinct token with
    * the number of documents containing it. One map-side-combined
    * aggregation over exploded distinct-per-doc tokens — the input for
    * IDF weighting and for choosing [[Dedup.ngramJaccardPairs]]'s
    * `maxDf` cut empirically instead of by guess. */
  def documentFrequency(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"))

  /** Top-k TF-IDF terms per document — the routing/keyword signal
    * behind corpus clustering, topic quotas and per-domain keyword
    * reports: tf = the term's count in the document (lowercased
    * whitespace tokens), idf = ln((N+1)/(df+1)) + 1 (the smoothed
    * form, never zero or negative), score rounded to 6 decimals so
    * the ranking replays bit-exactly across engines whose libm `ln`
    * may differ in the last ulp. Ties break toward the
    * lexicographically smaller term.
    *
    * Plan shape at scale: one explode into a MAP-SIDE combined
    * (doc, term) count — only distinct (doc, term) pairs shuffle —
    * document frequency as a second aggregate over that same grain,
    * a shuffle join back on the term key (vocabulary-sized — inherent
    * to IDF; no broadcast assumption, a web-scale vocab doesn't fit
    * one), the corpus size attached as a broadcast 1-row cross join
    * (never a driver action), and the per-document top-k as a plain
    * rank window that Catalyst plans with a partial WindowGroupLimit
    * below the exchange. */
  def tfIdfTerms(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 10): DataFrame = {
    require(k >= 1, s"tfIdfTerms wants k >= 1, got $k")
    val terms = graft.functions.WsTokens.lowerOf(col(textCol))
    val pairs = df
      .select(col(idCol).as("doc_id"), explode(terms).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = pairs.groupBy("term").agg(count(lit(1)).as("df_t"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    pairs.join(dfreq, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("tf_idf", round(
        col("tf") * (log((col("n_docs") + 1.0) / (col("df_t") + 1.0)) + 1.0), 6))
      .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("tf_idf").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df_t"),
        col("tf_idf"), col("rank"))
  }

  /** The k most frequent word n-grams of a corpus, with occurrence and
    * document counts — the discovery report behind every boilerplate /
    * contamination / template hunt ("which exact phrases dominate this
    * crawl?"). One explode pass over the [[graft.functions.Shingles
    * .allShingles]] codegen kernel (tokenize ONCE per document — the
    * lambda formulation this replaced re-split the text inside every
    * `element_at`, Catalyst performing no CSE in lambda bodies, and
    * measured ~10s for a 5,000-doc report), feeding TWO stacked exact
    * aggregations: per-(ngram, doc) occurrence counts collapse
    * MAP-SIDE over the exploded stream (one hash aggregate, no
    * Expand), so only distinct (ngram, doc, count) triples ever
    * shuffle; the second aggregate reads n_occurrences as a sum and
    * n_docs as a plain count of those triples. Both counts stay exact
    * — the same answer the textbook `count + countDistinct` single
    * aggregate gives, minus its Expand operator, which would DOUBLE
    * the exploded n-gram stream before partial aggregation. The top-k
    * cut plans as TakeOrderedAndProject, so corpus-wide counts are
    * never globally sorted or collected. Ties break toward the
    * lexicographically smaller n-gram (deterministic output).
    *
    * `idCol` keys the document count; omitted, the text fingerprint
    * stands in — byte-identical documents then count as ONE (fine for
    * post-dedup corpora, undercounts raw crawls with exact repeats). */
  def topNgrams(df: DataFrame, n: Int = 3, k: Int = 20,
      textCol: String = "text", idCol: Option[String] = None): DataFrame = {
    require(n >= 1, s"topNgrams wants n >= 1, got $n")
    require(k >= 1, s"topNgrams wants k >= 1, got $k")
    val grams = graft.functions.Shingles.allShingles(col(textCol), n)
    val docKey = idCol.map(col).getOrElse(md5(col(textCol)))
    df.select(docKey.as("__doc"), explode(grams).as("ngram"))
      .groupBy("ngram", "__doc")
      .agg(count(lit(1)).as("__in_doc"))
      .groupBy("ngram")
      .agg(sum(col("__in_doc")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Strip HTML to text — the first step of every web-crawl pipeline:
    * drop `<script>`/`<style>` blocks with their contents, replace
    * every remaining tag with a space (so `</p><p>` cannot weld
    * words), unescape the six ubiquitous named entities (`&amp;`
    * LAST, so a double-escaped `&amp;lt;` yields the literal `&lt;`
    * exactly like a single-pass decoder), and collapse whitespace
    * runs. Line structure is NOT preserved — run line-level filters
    * (C4, boilerplate) before stripping, or per extracted line.
    * Pure scan-side `regexp_replace` chain: every pattern is shared
    * RE2/Java syntax (no backreferences, no lookarounds), so the
    * whole transform replays in the cross-engine oracle. */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** One-pass per-stratum corpus profile — the observability report a
    * pipeline run starts and ends with: per `groupCol` value plus a
    * ROLLUP total row (`is_total = 1`), document / distinct-text /
    * token / char counts and doc-token min/max/mean. ONE aggregation
    * over the scan (the exact-distinct on the text fingerprint rides
    * the same shuffle as exact dedup — md5 values, not documents,
    * move); `avg_doc_tokens` is computed sum/count rather than `avg()`
    * so it divides one exact integer sum (bit-stable across partition
    * orders) instead of accumulating doubles. */
  def corpusProfile(df: DataFrame, groupCol: String = "source",
      textCol: String = "text", tokens: Option[Column] = None): DataFrame = {
    // tokens overrides the whitespace default with a real count (e.g.
    // Tokenizer.tokenCount) so the profile measures the unit the
    // trainer consumes — still one scan-side expression per row
    val n = tokens.getOrElse(tokenCount(col(textCol))).cast("long")
    df.rollup(col(groupCol))
      .agg(
        grouping(col(groupCol)).cast("int").as("is_total"),
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col(textCol))).as("n_unique_texts"),
        sum(n).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        min(n).as("min_doc_tokens"),
        max(n).as("max_doc_tokens"),
        (sum(n).cast("double") / count(lit(1))).as("avg_doc_tokens"))
  }

  /** [[corpusProfile]]'s 100 TB twin: identical report, but the one
    * column whose exact form shuffles a row-scale key set —
    * `n_unique_texts`, a `countDistinct` over text fingerprints —
    * is replaced by `n_unique_texts_approx`, a [[graft.functions
    * .KmvSketch]] estimate. The k-minimum-values sketch partial-
    * aggregates map-side and ships k longs per task instead of every
    * distinct fingerprint; relative error ~ 1/sqrt(k-2) (k=1024 →
    * ~3.1%), degrading to EXACT whenever a stratum holds fewer than k
    * distinct texts. Everything else in the profile is the same
    * single-pass rollup aggregation. */
  def corpusProfileApprox(df: DataFrame, groupCol: String = "source",
      textCol: String = "text", tokens: Option[Column] = None,
      k: Int = 1024,
      hasher: Column => Column = graft.functions.KmvSketch.hash52): DataFrame = {
    import graft.functions.KmvSketch
    val n = tokens.getOrElse(tokenCount(col(textCol))).cast("long")
    // fingerprint hashed below the aggregate (codegen'd projection),
    // not as the aggregate's child — see ngramNoveltyApprox
    df.withColumn("__h", hasher(col(textCol)))
      .rollup(col(groupCol))
      .agg(
        grouping(col(groupCol)).cast("int").as("is_total"),
        count(lit(1)).as("n_docs"),
        round(KmvSketch.estimate(
          KmvSketch.sketch(col("__h"), k), k), 3)
          .as("n_unique_texts_approx"),
        sum(n).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        min(n).as("min_doc_tokens"),
        max(n).as("max_doc_tokens"),
        (sum(n).cast("double") / count(lit(1))).as("avg_doc_tokens"))
  }

  /** N-gram novelty between two snapshots — the content-level drift
    * signal [[profileDiff]]'s counts can't see: a refresh can hold
    * document and token counts steady while swapping half the actual
    * phrasing (a crawler suddenly hitting a template farm, a source
    * silently switching language or dropping its long tail). One row:
    * distinct n-gram counts of each side, how many of the new side's
    * n-grams were never seen in the old (`n_novel_ngrams`,
    * `novelty_rate`) and how many of the old side's disappeared
    * (`n_lost_ngrams`, `lost_rate`). Healthy refreshes show moderate
    * novelty; ~0 means the "new" crawl is a rerun, ~1 means the source
    * changed identity.
    *
    * Cost: one distinct per side over the [[graft.functions.Shingles]]
    * kernel's exploded n-grams (map-side combined — only distinct
    * n-grams shuffle), one full-outer join on the n-gram key, one
    * global aggregate. Nothing document-scale moves twice. */
  def ngramNovelty(oldDf: DataFrame, newDf: DataFrame, n: Int = 3,
      textCol: String = "text"): DataFrame = {
    require(n >= 1, s"ngramNovelty wants n >= 1, got $n")
    def grams(df: DataFrame) = df
      .select(explode(
        graft.functions.Shingles.shingles(col(textCol), n)).as("ngram"))
      .distinct()
    val o = grams(oldDf).withColumn("__o", lit(1L))
    val nw = grams(newDf).withColumn("__n", lit(1L))
    o.join(nw, Seq("ngram"), "full_outer")
      .agg(
        sum(coalesce(col("__o"), lit(0L))).as("n_old_ngrams"),
        sum(coalesce(col("__n"), lit(0L))).as("n_new_ngrams"),
        sum(when(col("__n").isNotNull && col("__o").isNull, 1L)
          .otherwise(0L)).as("n_novel_ngrams"),
        sum(when(col("__o").isNotNull && col("__n").isNull, 1L)
          .otherwise(0L)).as("n_lost_ngrams"))
      .withColumn("novelty_rate", round(
        when(col("n_new_ngrams") === 0, 0.0)
          .otherwise(col("n_novel_ngrams").cast("double") / col("n_new_ngrams")), 6))
      .withColumn("lost_rate", round(
        when(col("n_old_ngrams") === 0, 0.0)
          .otherwise(col("n_lost_ngrams").cast("double") / col("n_old_ngrams")), 6))
  }

  /** [[ngramNovelty]]'s 100 TB twin: the exact path moves every
    * distinct n-gram through a shuffle twice (one distinct per side,
    * one full-outer join on the gram key) — viable while map-side
    * combine holds, but a snapshot-over-snapshot check on a 100 TB
    * corpus has a distinct-gram set in the tens of billions. This
    * variant aggregates each side to ONE [[graft.functions.KmvSketch]]
    * (k longs per scan task ride the exchange; nothing gram-scale ever
    * moves) and derives the same four counts from sketch set algebra
    * (Beyer et al., SIGMOD'07): the k smallest of the two sketches'
    * union is a valid union sketch, the fraction of it present in both
    * sides estimates the Jaccard, and intersection = Jaccard x union.
    * Per-side counts carry ~1/sqrt(k-2) relative error (k=1024 →
    * ~3.1%); the derived novel/lost counts inherit roughly the union
    * estimate's error over the rate difference, so treat rates below
    * a few percent as "no drift" rather than as a measured small
    * number — the exact operator is the magnifying glass, this is the
    * always-on monitor. All estimates degrade to exact when a side has
    * fewer than k distinct grams. Deterministic given the hash: the
    * DuckDB oracle replays sketches and estimator bit-for-bit. */
  def ngramNoveltyApprox(oldDf: DataFrame, newDf: DataFrame, n: Int = 3,
      textCol: String = "text", k: Int = 1024,
      hasher: Column => Column = graft.functions.KmvSketch.hash52): DataFrame = {
    import graft.functions.KmvSketch
    require(n >= 1, s"ngramNoveltyApprox wants n >= 1, got $n")
    // hash in a SELECT below the aggregate: an expression passed as
    // the aggregate's child evaluates INTERPRETED inside every
    // update() call (ObjectHashAggregate children skip whole-stage
    // codegen), which measured 2x the whole exact path at 10M docs —
    // hashed as a codegen'd projection, the agg's child is a plain
    // field read
    // built-in hashers fuse shingling+hashing into ONE kernel pass
    // ([[graft.functions.ShingleHash]] — no gram strings are ever
    // materialized; distinct-by-hash is sketch-equivalent to the
    // unfused distinct-by-gram pipeline, OpsSpec-pinned): the unfused
    // path built ~80 gram strings per document only to hash them,
    // ~10s of pure allocation per snapshot side at 10M docs. Custom
    // hashers keep the general formulation.
    def sk(df: DataFrame, alias: String) =
      if ((hasher eq KmvSketch.hash52Fast) || (hasher eq KmvSketch.hash52)) df
        .select(explode(graft.functions.ShingleHash.of(
          col(textCol), n, md5Mode = hasher eq KmvSketch.hash52)).as("__h"))
        .agg(KmvSketch.sketch(col("__h"), k).as(alias))
      else df
        .select(explode(
          graft.functions.Shingles.shingles(col(textCol), n)).as("ngram"))
        .select(hasher(col("ngram")).as("__h"))
        .agg(KmvSketch.sketch(col("__h"), k).as(alias))
    val withU = sk(oldDf, "so").crossJoin(sk(newDf, "sn"))
      .withColumn("u", slice(array_sort(array_union(col("so"), col("sn"))), 1, k))
    val dOld = KmvSketch.estimate(col("so"), k)
    val dNew = KmvSketch.estimate(col("sn"), k)
    val dU = KmvSketch.estimate(col("u"), k)
    val interHits =
      size(array_intersect(array_intersect(col("u"), col("so")), col("sn")))
    val rho = when(size(col("u")) === 0, 0.0)
      .otherwise(interHits.cast("double") / size(col("u")).cast("double"))
    val dInt = rho * dU
    val novel = greatest(dNew - dInt, lit(0.0))
    val lost = greatest(dOld - dInt, lit(0.0))
    withU.select(
      round(dOld, 3).as("n_old_ngrams_est"),
      round(dNew, 3).as("n_new_ngrams_est"),
      round(novel, 3).as("n_novel_ngrams_est"),
      round(lost, 3).as("n_lost_ngrams_est"),
      when(dNew === 0.0, 0.0).otherwise(round(novel / dNew, 6))
        .as("novelty_rate"),
      when(dOld === 0.0, 0.0).otherwise(round(lost / dOld, 6))
        .as("lost_rate"))
  }

  /** Token-distribution drift between two snapshots — the
    * DISTRIBUTION-level member of the drift family ([[profileDiff]]
    * sees counts, [[ngramNovelty]] sees set membership; neither sees a
    * source whose token mix quietly shifted — a crawler drifting into
    * another register, a template flooding one phrase, a language mix
    * change below the lang-id threshold). Per token of the UNION
    * vocabulary: occurrence counts per side, add-one-smoothed
    * probabilities (smoothing over the union vocab, so a token absent
    * from one side gets a finite, size-aware floor instead of a
    * division blowup), and the probability delta. Returns the top-k
    * MOVERS by |delta| — the actionable slice; ties break toward the
    * lexicographically smaller token, probabilities rounded to 9dp so
    * the ranking replays bit-exactly across engines.
    *
    * Plan shape at scale: one map-side-combined token count per side
    * (only distinct tokens shuffle — vocabulary-scale, the inherent
    * floor), a full-outer join on the token key, totals attached as a
    * broadcast 1-row cross join (never a driver action), and the
    * top-k cut plans as TakeOrderedAndProject — corpus-wide counts are
    * never globally sorted. */
  def tokenDrift(oldDf: DataFrame, newDf: DataFrame,
      textCol: String = "text", k: Int = 50): DataFrame = {
    require(k >= 1, s"tokenDrift wants k >= 1, got $k")
    def counts(df: DataFrame, as: String) = df
      .select(explode(graft.functions.WsTokens.lowerOf(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as(as))
    val joined = counts(oldDf, "old_cnt")
      .join(counts(newDf, "new_cnt"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("old_cnt"), lit(0L)).as("old_cnt"),
        coalesce(col("new_cnt"), lit(0L)).as("new_cnt"))
    val totals = joined.agg(
      sum(col("old_cnt")).as("old_total"),
      sum(col("new_cnt")).as("new_total"),
      count(lit(1)).as("vocab"))
    val oldP = (col("old_cnt") + 1L).cast("double") /
      (col("old_total") + col("vocab")).cast("double")
    val newP = (col("new_cnt") + 1L).cast("double") /
      (col("new_total") + col("vocab")).cast("double")
    joined.crossJoin(broadcast(totals))
      .select(col("token"), col("old_cnt"), col("new_cnt"),
        round(oldP, 9).as("old_p"),
        round(newP, 9).as("new_p"),
        round(newP - oldP, 9).as("delta_p"))
      .orderBy(abs(col("delta_p")).desc, col("token").asc)
      .limit(k)
  }

  /** Snapshot-over-snapshot corpus drift report — the governance
    * check a RECURRING pipeline runs between refreshes: per `groupCol`
    * stratum (plus the rollup total, `is_total = 1`), document /
    * token / distinct-text counts of the old and new snapshots side
    * by side with deltas, the token growth ratio, and a status verdict
    * (`added` / `removed` / `grown` / `shrunk` / `stable`). Catches
    * the failure modes counts alone hide: a source that silently
    * vanished from a crawl, a stratum that doubled and will now
    * dominate mixing weights, a dedup change that halved unique texts.
    *
    * Cost: one [[corpusProfile]] aggregation per snapshot (each a
    * single scan) + a full-outer join of two STRATUM-sized frames —
    * nothing row-scale moves. The join is null-safe on `groupCol`
    * (the rollup total keys on NULL; a genuine null stratum is
    * disambiguated by `is_total`). */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame,
      groupCol: String = "source", textCol: String = "text",
      tokens: Option[Column] = None): DataFrame = {
    def side(df: DataFrame, p: String) =
      corpusProfile(df, groupCol, textCol, tokens)
        .select(col(groupCol).as(s"${p}_g"), col("is_total").as(s"${p}_t"),
          col("n_docs").as(s"${p}_docs"),
          col("n_unique_texts").as(s"${p}_unique_texts"),
          col("n_tokens").as(s"${p}_tokens"))
    val o = side(oldDf, "old")
    val n = side(newDf, "new")
    o.join(n,
        col("old_g") <=> col("new_g") && col("old_t") === col("new_t"),
        "full_outer")
      .select(
        coalesce(col("old_g"), col("new_g")).as(groupCol),
        coalesce(col("old_t"), col("new_t")).as("is_total"),
        coalesce(col("old_docs"), lit(0L)).as("old_docs"),
        coalesce(col("new_docs"), lit(0L)).as("new_docs"),
        (coalesce(col("new_docs"), lit(0L))
          - coalesce(col("old_docs"), lit(0L))).as("delta_docs"),
        coalesce(col("old_unique_texts"), lit(0L)).as("old_unique_texts"),
        coalesce(col("new_unique_texts"), lit(0L)).as("new_unique_texts"),
        coalesce(col("old_tokens"), lit(0L)).as("old_tokens"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"),
        (coalesce(col("new_tokens"), lit(0L))
          - coalesce(col("old_tokens"), lit(0L))).as("delta_tokens"),
        when(coalesce(col("old_tokens"), lit(0L)) === 0L, lit(null).cast("double"))
          .otherwise(coalesce(col("new_tokens"), lit(0L)).cast("double")
            / col("old_tokens")).as("token_ratio"),
        when(col("old_docs").isNull, "added")
          .when(col("new_docs").isNull, "removed")
          .when(coalesce(col("new_tokens"), lit(0L))
            > coalesce(col("old_tokens"), lit(0L)), "grown")
          .when(coalesce(col("new_tokens"), lit(0L))
            < coalesce(col("old_tokens"), lit(0L)), "shrunk")
          .otherwise("stable").as("status"))
  }

  /** Compression-ratio quality signal (`deflated_bytes / raw_utf8_bytes`
    * — the RedPajama-v2-family heuristic): natural prose lands roughly
    * in 0.3–0.7; template/keyword-stuffed repetition falls far below,
    * high-entropy junk (minified blobs, encoded binaries) sits near or
    * above 1 (deflate overhead can exceed 1 on short strings — filter
    * on length first, as every deployment of this signal does). One
    * codegen'd kernel call per row ([[graft.functions.TextZip]]),
    * deterministic, no model. Null on null or empty text. */
  def compressionRatio(text: Column): Column = {
    val raw = octet_length(text)
    when(text.isNull || raw === 0, lit(null).cast("double"))
      .otherwise(graft.functions.TextZip.deflateSizeCol(text).cast("double") / raw)
  }

  /** Repair UTF-8-decoded-as-Windows-1252 mojibake ("Ã©" → "é",
    * "â€™" → "'"): a chain of codegen'd replace()s over the derived
    * artifact table ([[graft.functions.Mojibake.Pairs]]). `passes = 2`
    * also unwinds double-encoded text. Pure scan-side map work. */
  def fixMojibake(text: Column, passes: Int = 1): Column =
    graft.functions.Mojibake.fix(text, passes)

  /** Characters removed by mojibake repair — 0 for clean text; a
    * cheap per-document corruption-severity signal. */
  def mojibakeChars(text: Column, passes: Int = 1): Column =
    graft.functions.Mojibake.removedChars(text, passes)

  /** Readability statistics: struct(n_sentences, n_words,
    * n_syllables, flesch, fk_grade).
    *
    * Flesch reading ease and Flesch–Kincaid grade from the classic
    * published formulas, with the standard public heuristics for the
    * two fuzzy counts: sentences = non-blank runs between terminal
    * punctuation ([.!?]+), syllables = vowel-group count per word
    * ([aeiouy]+ runs, minimum 1 per word). Everything is one
    * projection over higher-order array functions — no shuffle, no
    * UDF — and every step is integer/regex math a SQL oracle can
    * replay. Scores are null for wordless documents; sentence count
    * floors at 1 once words exist (unpunctuated synthetic text is one
    * long sentence).
    */
  def readabilityStats(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val words = filter(tokens(lower(t)), w => length(w) > 0)
    val nWords = size(words).cast("long")
    val nSentences = when(nWords === 0, lit(0L)).otherwise(
      greatest(lit(1L), size(filter(split(t, "[.!?]+"),
        s => length(trim(s)) > 0)).cast("long")))
    val nSyllables = aggregate(
      transform(words, w =>
        greatest(lit(1),
          size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))))),
      lit(0L), (acc, x) => acc + x)
    val wps = nWords.cast("double") / nSentences.cast("double")
    val spw = nSyllables.cast("double") / nWords.cast("double")
    val flesch = lit(206.835) - lit(1.015) * wps - lit(84.6) * spw
    val fk = lit(0.39) * wps + lit(11.8) * spw - lit(15.59)
    struct(
      nSentences.as("n_sentences"),
      nWords.as("n_words"),
      when(nWords === 0, lit(null).cast("long"))
        .otherwise(nSyllables).as("n_syllables"),
      when(nWords === 0, lit(null).cast("double"))
        .otherwise(round(flesch, 6)).as("flesch"),
      when(nWords === 0, lit(null).cast("double"))
        .otherwise(round(fk, 6)).as("fk_grade"))
  }

  /** Corpus token-distribution health: vocabulary size, total token
    * count, and a power-law (Zipf) fit over the top-`k` tokens —
    * slope/intercept/R² of ln(freq) on ln(rank). Natural corpora fit
    * slope ≈ −1 with high R²; template-stuffed or deduplicated-to-
    * death corpora bend away from it, so the single row is a cheap
    * drift/regression gate between corpus snapshots.
    *
    * Scale shape: one wordcount aggregation (map-side partial before
    * the token-keyed exchange — the canonical 100 TB shape), a
    * TakeOrdered top-k (never a global sort), and a k-row regression;
    * the vocab totals reuse the same exchange (ReusedExchange). Rank
    * ties break on token order, so membership and fit are
    * deterministic.
    */
  def zipfStats(df: DataFrame, textCol: String = "text",
      k: Int = 100): DataFrame = {
    require(k >= 2, s"k must be >= 2 to fit a line, got $k")
    val counts = df
      .select(explode(filter(tokens(lower(col(textCol))),
        w => length(w) > 0)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      count(lit(1)).as("vocab_size"),
      // coalesce: sum over ZERO count rows (empty / all-null corpus)
      // is null, which would NPE a Row.getLong consumer
      coalesce(sum("cnt"), lit(0L)).as("total_tokens"))
    // the unpartitioned window runs AFTER the limit, over at most k
    // rows — WindowExec's single-partition warning is about row-scale
    // inputs and does not apply here (a literal partition spec would
    // be constant-folded away, so it cannot silence it)
    val topk = counts
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("token"))))
    val fit = topk.agg(
      round(regr_slope(ln(col("cnt")), ln(col("rank"))), 6)
        .as("zipf_slope"),
      round(regr_intercept(ln(col("cnt")), ln(col("rank"))), 6)
        .as("zipf_intercept"),
      round(regr_r2(ln(col("cnt")), ln(col("rank"))), 6)
        .as("zipf_r2"))
    totals.crossJoin(fit)
  }

  /** Unicode script (writing-system) ranges for [[detectScript]]:
    * (name, char-class). The classes are built from LITERAL range
    * characters (not \\uXXXX escapes) because Java regex and RE2
    * spell escapes differently (\\uXXXX vs \\x{XXXX}) but both accept
    * raw UTF-8 pattern characters — so the oracle replays the SAME
    * pattern strings byte-for-byte. BMP ranges only. Order =
    * tie-break priority.
    */
  private def scriptClass(ranges: Seq[(Int, Int)]): String =
    ranges.map { case (a, b) => s"${a.toChar}-${b.toChar}" }
      .mkString("[", "", "]")

  /** The structured range source both renderings derive from: the
    * regex classes below (byte-identical to the previous literal
    * spelling — 'A'-'Z' renders as "A-Z") and the
    * [[graft.functions.ScriptDetect]] kernel's integer tables, so the
    * two can never drift. */
  private[graft] val ScriptRangeData: Seq[(String, Seq[(Int, Int)])] = Seq(
    "latin" -> Seq((0x41, 0x5A), (0x61, 0x7A), (0x00C0, 0x024F)),
    "cyrillic" -> Seq((0x0400, 0x04FF)),
    "greek" -> Seq((0x0370, 0x03FF)),
    "arabic" -> Seq((0x0600, 0x06FF), (0x0750, 0x077F)),
    "hebrew" -> Seq((0x0590, 0x05FF)),
    "devanagari" -> Seq((0x0900, 0x097F)),
    "thai" -> Seq((0x0E00, 0x0E7F)),
    "cjk" -> Seq((0x3400, 0x4DBF), (0x4E00, 0x9FFF)),
    "kana" -> Seq((0x3040, 0x30FF)),
    "hangul" -> Seq((0x1100, 0x11FF), (0xAC00, 0xD7AF)))

  private[graft] val ScriptRanges: Seq[(String, String)] =
    ScriptRangeData.map { case (n, rs) => n -> scriptClass(rs) }

  /** Dominant writing system of a document: count characters in each
    * script's Unicode ranges, return the argmax (ties break on
    * [[ScriptRanges]] order), `und` when no script character occurs.
    *
    * The cheap routing signal in a multilingual pipeline: script
    * detection is an order of magnitude cheaper than rank-profile
    * language ID, so at 100 TB it runs first and routes documents to
    * per-script strata (only Latin-script text needs the 30-language
    * Latin disambiguation; CJK/Hangul/Thai are near-decided here).
    * One scan-side projection of regexp_count calls — no shuffle, no
    * UDF. BMP ranges only (supplementary-plane CJK extensions are not
    * counted; crawl text beyond the BMP is negligible and the oracle
    * replays the exact same ranges).
    */
  def detectScript(text: Column): Column =
    // one codegen'd kernel pass over the code points instead of ten
    // regexp_count columns folded through a when-chain whose
    // accumulator appeared TWICE per level — a 2^10-node expression
    // tree that cost ~1.8s of pure planning/codegen per query on a
    // 21-row input. Counts and the strict->/earlier-wins tie-break are
    // identical (kernel tables derive from the same ScriptRangeData
    // the oracle's regex classes render from; OpsSpec pins the kernel
    // against the regexp_count fold).
    graft.functions.ScriptDetect.of(coalesce(text, lit("")),
      ScriptRangeData)

  /** One-pass enrichment of a document frame. `extended = true` adds
    * the heavier r16 signals — rank-profile language ID, Flesch
    * reading ease, and the mojibake-corruption count — still one
    * scan-side projection (the default column set is unchanged, so
    * existing callers keep their schema).
    */
  def analyze(df: DataFrame, textCol: String = "text",
      extended: Boolean = false): DataFrame = {
    val t = col(textCol)
    val base = df.withColumns(Map(
      "n_tokens" -> tokenCount(t),
      "n_tokens_bpe" -> bpeTokenCount(t),
      "punct_ratio" -> punctRatio(t),
      "stopword_ratio" -> stopwordRatio(t),
      "mean_word_len" -> meanWordLength(t),
      "lang_id" -> langId(t),
      "quality" -> qualityScore(t),
      "fingerprint" -> fingerprint(t)
    ))
    if (!extended) base
    else base.withColumns(Map(
      "lang_id_profiles" -> langIdProfiles(t),
      "flesch" -> readabilityStats(t).getField("flesch"),
      "mojibake_chars" -> mojibakeChars(t)
    ))
  }
}
