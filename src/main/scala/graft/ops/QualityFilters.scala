package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality filters for large-scale training-data pipelines:
  * Gopher-style document rules (Rae et al. 2021, appendix A1.1),
  * C4-style line filtering (Raffel et al. 2020, §2.2) and URL
  * canonicalization / dedup — the standard pre-training hygiene passes.
  *
  * Like [[TextAnalysis]], everything here is a pure Column expression
  * over built-in functions: embarrassingly parallel, zero shuffle
  * (except the final dedup groupBy, which is map-side combined), full
  * column pruning. At 100 TB these run at parquet-scan speed. Every
  * regex sticks to constructs with identical semantics in Java regex
  * and RE2 (char classes, alternation, bounded repeats — no
  * lookarounds, no backrefs) so the DuckDB oracles replay bit-exactly.
  */
object QualityFilters {

  import TextAnalysis.{tokenCount, tokens, meanWordLength}

  // ---- Gopher document-quality rules ---------------------------------

  /** Thresholds from the Gopher paper's quality pipeline; every bound
    * is overridable because each corpus tunes them. */
  final case class GopherConfig(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopwordKinds: Int = 2)

  /** The Gopher stop list: a document must contain at least
    * `minStopwordKinds` distinct words of this set to pass. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Fraction of whitespace tokens containing at least one ASCII
    * letter. Prose sits near 1; tables, code dumps and non-Latin
    * scripts fall off. Counted by the codegen kernel
    * ([[graft.functions.TextStats.alphaWordCount]]) so the projection
    * stays in whole-stage codegen. */
  def alphaWordRatio(text: Column): Column =
    when(tokenCount(text) === 0, 0.0).otherwise(
      graft.functions.TextStats.alphaWordCountOf(text).cast("double")
        / tokenCount(text))

  /** Hash marks and ellipses per word — the Gopher "symbol ratio". */
  def symbolWordRatio(text: Column): Column =
    when(tokenCount(text) === 0, 0.0).otherwise(
      size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0))).cast("double")
        / tokenCount(text))

  /** Reference (HOF) formulation of the non-blank-line list — kept for
    * [[c4KeptLines]]; the production ratios below use the one-pass
    * codegen kernel ([[graft.functions.TextStats.lineStats]]) instead,
    * because a HOF lambda evicts the whole projection from whole-stage
    * codegen. */
  private[graft] def nonBlankLines(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  /** Fraction of non-blank lines starting with a bullet marker. */
  def bulletLineRatio(text: Column): Column = {
    val ls = graft.functions.TextStats.lineStatsOf(text)
    when(ls.getField("non_blank") === 0, 0.0).otherwise(
      ls.getField("bullet").cast("double") / ls.getField("non_blank"))
  }

  /** Fraction of non-blank lines ending in an ellipsis. */
  def ellipsisLineRatio(text: Column): Column = {
    val ls = graft.functions.TextStats.lineStatsOf(text)
    when(ls.getField("non_blank") === 0, 0.0).otherwise(
      ls.getField("ellipsis").cast("double") / ls.getField("non_blank"))
  }

  /** Number of DISTINCT [[GopherStopwords]] present as (lowercased)
    * tokens — sum of membership tests, so it stays in codegen. */
  def stopwordKinds(text: Column): Column = {
    val toks = tokens(lower(text))
    GopherStopwords
      .map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** The full Gopher keep decision over one text column. */
  def gopherKeep(text: Column, cfg: GopherConfig = GopherConfig()): Column =
    tokenCount(text).between(cfg.minWords, cfg.maxWords) &&
      meanWordLength(text).between(cfg.minMeanWordLen, cfg.maxMeanWordLen) &&
      symbolWordRatio(text) < cfg.maxSymbolRatio &&
      bulletLineRatio(text) < cfg.maxBulletRatio &&
      ellipsisLineRatio(text) < cfg.maxEllipsisRatio &&
      alphaWordRatio(text) >= cfg.minAlphaWordRatio &&
      stopwordKinds(text) >= cfg.minStopwordKinds

  /** One-pass enrichment: every signal plus the keep flag. */
  def gopherSignals(df: DataFrame, textCol: String = "text",
      cfg: GopherConfig = GopherConfig()): DataFrame = {
    val t = col(textCol)
    df.withColumns(Map(
      "n_words" -> tokenCount(t),
      "mean_word_len" -> round(meanWordLength(t), 6),
      "symbol_ratio" -> round(symbolWordRatio(t), 6),
      "bullet_ratio" -> round(bulletLineRatio(t), 6),
      "ellipsis_ratio" -> round(ellipsisLineRatio(t), 6),
      "alpha_word_ratio" -> round(alphaWordRatio(t), 6),
      "stopword_kinds" -> stopwordKinds(t),
      "gopher_keep" -> gopherKeep(t, cfg)
    ))
  }

  /** Drop documents failing the Gopher rules. */
  def gopherFilter(df: DataFrame, textCol: String = "text",
      cfg: GopherConfig = GopherConfig()): DataFrame =
    // the verdict kernel, gopher stage only: gopherKeep's conjunction
    // re-tokenizes per conjunct inside a Filter (no cross-conjunct
    // subexpression elimination in codegen) — the kernel is one pass.
    // minQuality = 0 makes the always-on quality stage a constant pass.
    df.filter(hygieneVerdict(col(textCol), c4 = None, gopher = Some(cfg),
      repetition = None, minQuality = 0.0, languages = Nil)
      === graft.functions.Hygiene.PassVerdict)

  // ---- Gopher repetition rules (A1.1, second table) ------------------

  /** Thresholds from Gopher appendix A1.1: duplicate line fraction,
    * top n-gram character fraction (n = 2..4) and duplicated n-gram
    * character fraction (n = 5..10). Empty maps disable a family. */
  final case class RepetitionConfig(
      maxDupLineRatio: Double = 0.30,
      maxTopNgramFrac: Map[Int, Double] =
        Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      maxDupNgramFrac: Map[Int, Double] =
        Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10))

  /** All configured n-gram fractions in ONE codegen'd pass (see
    * [[graft.functions.NgramRepetition]] — one tokenization per
    * document instead of one interpreted sorted fold per n). */
  private def ngramStats(text: Column, cfg: RepetitionConfig): Column =
    graft.functions.NgramRepetition.ngramRepetitionStats(text,
      topNs = cfg.maxTopNgramFrac.keys.toSeq.sorted,
      dupNs = cfg.maxDupNgramFrac.keys.toSeq.sorted)

  /** The full Gopher repetition keep decision in a single projection
    * over the scan — shuffle-free; the nine n-gram fractions come from
    * the one-pass kernel, whose semantics are pinned to the
    * Column-algebra reference ([[TextAnalysis.topNgramCharFraction]])
    * by OpsSpec and the q_ngram_repetition DuckDB oracle. */
  /** Both n-gram families disabled (documented contract: "Empty maps
    * disable a family") → no kernel expression to build. */
  private def ngramFamiliesOff(cfg: RepetitionConfig): Boolean =
    cfg.maxTopNgramFrac.isEmpty && cfg.maxDupNgramFrac.isEmpty

  def repetitionKeep(text: Column,
      cfg: RepetitionConfig = RepetitionConfig()): Column = {
    val lineOk = graft.functions.NgramRepetition.dupLineRatioFast(text) <= cfg.maxDupLineRatio
    if (ngramFamiliesOff(cfg)) lineOk
    else {
      val stats = ngramStats(text, cfg)
      val topOk = cfg.maxTopNgramFrac.toSeq.sortBy(_._1).map { case (n, th) =>
        stats.getField(s"top_${n}gram_frac") <= th }
      val dupOk = cfg.maxDupNgramFrac.toSeq.sortBy(_._1).map { case (n, th) =>
        stats.getField(s"dup_${n}gram_frac") <= th }
      (lineOk +: (topOk ++ dupOk)).reduce(_ && _)
    }
  }

  /** One-pass enrichment: every repetition signal plus the keep flag. */
  def repetitionSignals(df: DataFrame, textCol: String = "text",
      cfg: RepetitionConfig = RepetitionConfig()): DataFrame = {
    val t = col(textCol)
    val ngramCols =
      if (ngramFamiliesOff(cfg)) Seq.empty[(String, Column)]
      else {
        val stats = ngramStats(t, cfg)
        cfg.maxTopNgramFrac.keys.toSeq.sorted.map(n =>
          s"top_${n}gram_frac" -> round(stats.getField(s"top_${n}gram_frac"), 6)) ++
          cfg.maxDupNgramFrac.keys.toSeq.sorted.map(n =>
            s"dup_${n}gram_frac" -> round(stats.getField(s"dup_${n}gram_frac"), 6))
      }
    val all = Seq("dup_line_ratio" ->
      round(graft.functions.NgramRepetition.dupLineRatioFast(t), 6)) ++
      ngramCols :+ ("repetition_keep" -> repetitionKeep(t, cfg))
    df.withColumns(all.toMap)
  }

  /** Drop documents failing the Gopher repetition rules. */
  def repetitionFilter(df: DataFrame, textCol: String = "text",
      cfg: RepetitionConfig = RepetitionConfig()): DataFrame =
    // verdict kernel, repetition stage only: repetitionKeep reads one
    // struct field per configured n, and each getField carries its own
    // copy of the ngram-stats kernel inside a Filter — 9 kernel
    // evaluations per row under the default config, one here
    df.filter(hygieneVerdict(col(textCol), c4 = None, gopher = None,
      repetition = Some(cfg), minQuality = 0.0, languages = Nil)
      === graft.functions.Hygiene.PassVerdict)

  // ---- C4 line filtering ---------------------------------------------

  /** C4 keeps a line iff it ends in terminal punctuation AND has at
    * least `minWordsPerLine` words. Reference (HOF) formulation — kept
    * as the kernel equivalence pin; production paths below use
    * [[graft.functions.TextStats.c4LineFilter]]. */
  private[graft] def c4KeptLines(text: Column, minWordsPerLine: Int = 5): Column =
    filter(nonBlankLines(text), l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minWordsPerLine)

  /** Kept text + kept-line count + sentence proxy in ONE codegen'd
    * pass over the lines. */
  private def c4Stats(text: Column, minWordsPerLine: Int): Column =
    graft.functions.TextStats.c4LineFilterOf(text, minWordsPerLine)

  /** The document text after C4 line filtering, lines rejoined. */
  def c4Text(text: Column, minWordsPerLine: Int = 5): Column =
    c4Stats(text, minWordsPerLine).getField("kept_text")

  /** Terminal-punctuation marks in the kept text — C4's sentence
    * proxy (it requires at least 3). */
  def c4SentenceCount(text: Column, minWordsPerLine: Int = 5): Column =
    c4Stats(text, minWordsPerLine).getField("n_sentences")

  def hasLoremIpsum(text: Column): Column = lower(text).contains("lorem ipsum")

  /** C4 drops any page containing a curly brace (code marker). */
  def hasCurlyBrace(text: Column): Column = text.contains("{")

  /** The C4 page-level keep decision. */
  def c4Keep(text: Column, minSentences: Int = 3,
      minWordsPerLine: Int = 5): Column =
    c4SentenceCount(text, minWordsPerLine) >= minSentences &&
      !hasLoremIpsum(text) && !hasCurlyBrace(text)

  /** One-pass enrichment: line/sentence counts, flags, keep. */
  def c4Signals(df: DataFrame, textCol: String = "text",
      minSentences: Int = 3, minWordsPerLine: Int = 5): DataFrame = {
    val t = col(textCol)
    val c4 = c4Stats(t, minWordsPerLine)
    df.withColumns(Map(
      "n_lines" -> graft.functions.TextStats.lineStatsOf(t).getField("non_blank"),
      "n_kept_lines" -> c4.getField("n_kept"),
      "n_sentences" -> c4.getField("n_sentences"),
      "has_lorem" -> hasLoremIpsum(t),
      "has_brace" -> hasCurlyBrace(t),
      "c4_keep" -> c4Keep(t, minSentences, minWordsPerLine)
    ))
  }

  /** C4 cleaning: drop rejected pages, replace text with kept lines. */
  def c4Clean(df: DataFrame, textCol: String = "text",
      minSentences: Int = 3, minWordsPerLine: Int = 5): DataFrame =
    df.filter(c4Keep(col(textCol), minSentences, minWordsPerLine))
      .withColumn(textCol, c4Text(col(textCol), minWordsPerLine))

  // ---- one-pass hygiene verdict (the curation scan's 100 TB path) ----

  /** Assemble the flat parameter block for the one-pass verdict kernel
    * from the stage configs. `c4` is (minSentences, minWordsPerLine);
    * None disables a stage (it auto-passes). */
  def hygieneSpec(
      c4: Option[(Int, Int)],
      gopher: Option[GopherConfig],
      repetition: Option[RepetitionConfig],
      minQuality: Double,
      languages: Seq[String]): graft.functions.HygieneSpec = {
    val g = gopher.getOrElse(GopherConfig())
    val r = repetition.getOrElse(RepetitionConfig())
    val topNs = r.maxTopNgramFrac.keys.toArray.sorted
    val dupNs = r.maxDupNgramFrac.keys.toArray.sorted
    val langs = TextAnalysis.StopwordLists.toSeq.sortBy(_._1)
    graft.functions.HygieneSpec(
      c4Enabled = c4.isDefined,
      c4MinSentences = c4.map(_._1).getOrElse(3),
      c4MinWordsPerLine = c4.map(_._2).getOrElse(5),
      gopherEnabled = gopher.isDefined,
      gMinWords = g.minWords,
      gMaxWords = g.maxWords,
      gMinMeanWordLen = g.minMeanWordLen,
      gMaxMeanWordLen = g.maxMeanWordLen,
      gMaxSymbolRatio = g.maxSymbolRatio,
      gMaxBulletRatio = g.maxBulletRatio,
      gMaxEllipsisRatio = g.maxEllipsisRatio,
      gMinAlphaWordRatio = g.minAlphaWordRatio,
      gMinStopwordKinds = g.minStopwordKinds,
      gStopwords = GopherStopwords.toArray,
      repEnabled = repetition.isDefined,
      repMaxDupLineRatio = r.maxDupLineRatio,
      repTopNs = topNs,
      repTopThresholds = topNs.map(r.maxTopNgramFrac),
      repDupNs = dupNs,
      repDupThresholds = dupNs.map(r.maxDupNgramFrac),
      minQuality = minQuality,
      languages = languages.toArray,
      langCodes = langs.map(_._1).toArray,
      langWords = langs.map(_._2.toArray).toArray,
      enStopwords = TextAnalysis.StopwordLists("en").toArray)
  }

  /** First-failing-stage verdict (0 = keep; 1=c4, 2=gopher,
    * 3=repetition, 4=quality, 5=language — canonical indices, stable
    * across configs) in ONE codegen'd kernel call per document.
    * Semantically identical to evaluating `c4Keep(text)`,
    * `gopherKeep(clean)`, `repetitionKeep(clean)`,
    * `qualityScore(clean) >= minQuality`, `langId(clean) isin
    * languages` in that order over `clean = c4Text(text)` — but where
    * that conjunction re-evaluates the C4 line filter and re-tokenizes
    * once PER SIGNAL (expression trees are trees, and Spark's codegen
    * has no cross-conjunct subexpression elimination: measured
    * 2.1 ms/doc), the kernel cleans and tokenizes once and shares the
    * arrays across all stages (~30x). This is what
    * [[graft.ops.Curation.curate]]'s scan pass runs at corpus scale. */
  def hygieneVerdict(text: Column,
      c4: Option[(Int, Int)],
      gopher: Option[GopherConfig],
      repetition: Option[RepetitionConfig],
      minQuality: Double,
      languages: Seq[String]): Column =
    graft.functions.Hygiene.hygieneVerdictOf(text,
      hygieneSpec(c4, gopher, repetition, minQuality, languages))

  // ---- blocklist ("bad words") page filter ---------------------------

  /** Occurrences of blocklist words among the lowercased whitespace
    * tokens — the C4 recipe's remaining page rule (Raffel et al. 2020
    * §2.2 drops any page with a word from the "bad words" list; the
    * canonical list is not embeddable, so corpora supply their own).
    * One pass of the stopword-counts codegen kernel, zero shuffle.
    * Matching is exact token equality on `tokens(lower(text))`; a
    * blocked word with punctuation attached ("word,") does not match —
    * pre-normalize the text (e.g. strip punctuation to spaces) before
    * calling if the corpus needs that strictness. */
  def blocklistHits(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "blocklistHits wants a non-empty word list")
    graft.functions.TextStats
      .stopwordCountsOf(text, Seq("hits" -> words)).getField("hits")
  }

  /** Keep decision: true iff no blocklist word appears. */
  def blocklistKeep(text: Column, words: Seq[String]): Column =
    blocklistHits(text, words) === 0

  /** Drop pages containing any blocklist word. */
  def blocklistFilter(df: DataFrame, words: Seq[String],
      textCol: String = "text"): DataFrame =
    df.filter(blocklistKeep(col(textCol), words))

  // ---- URL canonicalization + dedup ----------------------------------

  /** Canonical URL form for dedup keys:
    *   1. trim; drop the `#fragment`;
    *   2. lowercase the scheme://authority head (path and query keep
    *      their case — they are case-significant per RFC 3986);
    *   3. drop an explicit default port for its OWN scheme only
    *      (`http://…:80`, `https://…:443` — `https://host:80` is a
    *      genuinely different origin and stays distinct);
    *   4. drop `utm_*` tracking params: a run of them at the head of
    *      the query hands its `?` to whatever param follows, the rest
    *      drop whole. The repair is bound to an actual utm removal so
    *      a literal `&` in a path (legal sub-delim, e.g. `/q&a`) is
    *      never promoted to `?`;
    *   5. strip trailing `?`, `&` and `/`.
    * Pure regexp chain, no lookarounds — replays in DuckDB with `\1`
    * group syntax in place of Java's `$1`. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    // lowercase scheme://host[:port] only
    val head = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(head), noFrag.substr(length(head) + lit(1), length(noFrag)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80(/|\\?|$)", "$1$2"),
      "^(https://[^/:?#]+):443(/|\\?|$)", "$1$2")
    val leadUtm = regexp_replace(noPort, "\\?(utm_[A-Za-z_]+=[^&]*&)+", "?")
    val noUtm = regexp_replace(leadUtm, "[?&]utm_[A-Za-z_]+=[^&]*", "")
    regexp_replace(regexp_replace(noUtm, "[?&]+$", ""), "/+$", "")
  }

  /** Registrable-host extraction from a CANONICAL url: the authority
    * minus port and a leading `www.`. */
  def urlDomain(canonicalUrl: Column): Column =
    regexp_replace(
      regexp_extract(canonicalUrl, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1),
      "^www\\.", "")

  /** URL-level exact dedup: one group per canonical URL with the
    * lowest id as the keeper — the same (map-side-combined, single
    * shuffle) shape as [[Dedup.exactGroups]], keyed on the canonical
    * form instead of a content hash. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("canonical_url"), col(idCol))
      .groupBy("canonical_url")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  // ---- statistical (CCNet-style) quality scoring -----------------------

  /** Unigram language model estimated from a reference corpus: one row
    * per distinct (lowercased) token with its count — the cheap LM of
    * the CCNet recipe (Wenzek et al. 2020), which scores web pages by
    * LM perplexity and keeps the best tertiles. One map-side-combined
    * aggregation; at 100 TB the model frame is ~vocabulary-sized
    * (tens of millions of rows), far smaller than the corpus. */
  def unigramModel(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))

  /** Mean token log-probability of each document under `model`
    * (defaults to a model estimated from the corpus itself — the
    * self-scoring variant that flags statistical outliers:
    * gibberish, boilerplate, wrong-language contamination).
    *
    * Plan shape: explode → hash join on token (both sides shuffle on
    * the token key; the model side is vocabulary-sized) → one
    * map-side-combined per-doc aggregation. No global sort, no
    * broadcast of anything document-scaled. Tokens absent from the
    * model (impossible when self-scoring) contribute `ln(1/total)`
    * via the coalesce floor, an add-nothing smoothing choice that
    * keeps the score total. */
  def unigramLogProbs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", model: Option[DataFrame] = None): DataFrame = {
    val m = model.getOrElse(unigramModel(df, textCol))
    val total = m.agg(sum("cnt").cast("double").as("__total"))
    val toks = df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
    toks
      .join(m, Seq("token"), "left")
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(log(coalesce(col("cnt").cast("double"), lit(1.0)) / col("__total")))
          .as("mean_log_prob"))
  }

  /** Persist a [[unigramModel]] frame as parquet so a reference-corpus
    * LM can score a DIFFERENT corpus — the actual CCNet setup (Wenzek
    * et al. 2020 score Common Crawl under a Wikipedia-trained LM).
    * Types are normalized on write so any engine reads it back
    * unambiguously. */
  def saveUnigramModel(model: DataFrame, path: String): Unit =
    model.select(col("token").cast("string").as("token"),
        col("cnt").cast("long").as("cnt"))
      .write.mode("overwrite").parquet(path)

  /** Load a persisted unigram model, validating the (token, cnt)
    * contract before anything joins against it. */
  def loadUnigramModel(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(Set("token", "cnt").subsetOf(df.columns.toSet),
      s"unigram model at $path must have (token, cnt) columns, " +
        s"found: ${df.columns.mkString(", ")}")
    df.select(col("token").cast("string").as("token"),
      col("cnt").cast("long").as("cnt"))
  }

  /** CCNet-style quality buckets: ntile over the (rounded) score,
    * best scores in bucket 1. EXACT global ranking — a single-node
    * sort of one row per document, fine up to ~1e9 docs on a driver
    * plan but a deliberate bottleneck; the 100 TB path is
    * [[qualityBucketsApprox]]. Scores are rounded before ranking so
    * last-ulp float noise cannot flip a tie across engines/runs. */
  def qualityBuckets(scored: DataFrame, idCol: String = "doc_id",
      scoreCol: String = "mean_log_prob", buckets: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(round(col(scoreCol), 6).desc, col(idCol).asc)
    scored.withColumn("quality_bucket", ntile(buckets).over(w))
  }

  /** Scale path for bucketing: approximate score cutoffs from
    * `approxQuantile` (one pass, fixed-size sketch), then a scan-side
    * comparison — no global sort, no single-partition window. Bucket
    * boundaries are approximate by `relErr`; bucket 1 is best. */
  def qualityBucketsApprox(scored: DataFrame, scoreCol: String = "mean_log_prob",
      buckets: Int = 3, relErr: Double = 0.001): DataFrame = {
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    // descending score order: the (1 - q) quantile closes bucket q·n
    val cuts = scored.stat.approxQuantile(scoreCol, qs.map(1.0 - _).toArray, relErr)
    // test the highest cutoff first: the chain is built inside-out, so
    // reverse before folding
    val bucket = cuts.zipWithIndex.reverse.foldLeft(lit(buckets): Column) {
      case (acc, (cut, i)) => when(col(scoreCol) >= cut, i + 1).otherwise(acc)
    }
    scored.withColumn("quality_bucket", bucket)
  }

  // ---- bigram LM perplexity (CCNet's actual scoring model) -------------

  /** Out-of-vocabulary token sentinel for the bigram LM. */
  val UnkToken = "<unk>"

  /** A trained bigram language model: `vocab` (one `token` column,
    * tokens seen at least `minCount` times) and `bigrams`
    * (`prev`, `tok`, `cnt` counts over UNK-mapped token pairs).
    * Context totals and the smoothing vocabulary size are derived
    * lazily at scoring time — both are model-sized aggregations. */
  final case class BigramLm(vocab: DataFrame, bigrams: DataFrame)

  /** Consecutive (prev, tok) token pairs of each document, built
    * scan-side from the token array (two slices zipped — no
    * posexplode/window, no shuffle). Documents with fewer than two
    * tokens contribute nothing. */
  private def bigramPairs(df: DataFrame, textCol: String,
      keep: Seq[Column]): DataFrame = {
    val t = tokens(lower(col(textCol)))
    val pair = explode(arrays_zip(
      slice(t, lit(1), size(t) - 1).as("prev"),
      slice(t, lit(2), size(t) - 1).as("tok"))).as("__p")
    df.filter(size(t) >= 2)
      .select(keep :+ pair: _*)
      .select(keep :+ col("__p.prev").as("prev") :+ col("__p.tok").as("tok"): _*)
  }

  /** Map a raw token column to itself-or-[[UnkToken]] by a broadcast
    * membership join against `vocab`. */
  private def unkMap(df: DataFrame, vocab: DataFrame, tokCol: String,
      broadcastVocab: Boolean): DataFrame = {
    val marked = vocab.select(col("token").as(tokCol), lit(1).as(s"__in_$tokCol"))
    val side = if (broadcastVocab) broadcast(marked) else marked
    df.join(side, Seq(tokCol), "left")
      .withColumn(tokCol,
        when(col(s"__in_$tokCol") === 1, col(tokCol)).otherwise(lit(UnkToken)))
      .drop(s"__in_$tokCol")
  }

  /** Train a bigram LM (Wenzek et al. 2020 score pages under a KenLM
    * n-gram model; this is the n=2 member of that family, expressed
    * as three map-side-combined aggregations). Vocabulary = tokens
    * with unigram count >= `minCount`; everything rarer becomes
    * [[UnkToken]] BEFORE bigram counting, so the sentinel has real
    * statistics. At 100 TB the model frames are vocabulary-sized,
    * orders of magnitude smaller than the corpus. */
  def bigramModel(train: DataFrame, textCol: String = "text",
      minCount: Long = 2, broadcastVocab: Boolean = true): BigramLm = {
    // both model frames are vocabulary-sized and fan out to several
    // consumers (vocab: two UNK joins at train time, two more at
    // scoring, plus the V count; bigrams: the scoring join and the
    // context totals) — cacheOnce collapses what would otherwise be
    // one full corpus aggregation per consumer
    val vocab = Dedup.cacheOnce(unigramModel(train, textCol)
      .filter(col("cnt") >= minCount).select("token"))
    val raw = bigramPairs(train, textCol, Seq.empty)
    val mapped = unkMap(unkMap(raw, vocab, "prev", broadcastVocab),
      vocab, "tok", broadcastVocab)
    BigramLm(vocab,
      Dedup.cacheOnce(mapped.groupBy("prev", "tok").agg(count(lit(1)).as("cnt"))))
  }

  /** Mean bigram log-probability (and perplexity) of each document
    * under `model` (defaults to a model trained on the corpus itself;
    * pass a model trained on a clean reference corpus for the real
    * CCNet setup). Prefer the reference model when hunting gibberish:
    * under a self-trained model, rare tokens collapse into the single
    * [[UnkToken]] state, so an all-rare-token document is scored
    * against its own aggregated UNK mass and can look fluent. Add-alpha
    * smoothing over the UNK-closed vocabulary:
    *
    *   P(t|p) = (c(p,t) + alpha) / (c(p) + alpha * V)
    *
    * with V = |vocab| + 1 (the UNK row). Documents with fewer than two
    * tokens are absent from the result.
    *
    * Plan shape: the corpus stream is scan-side pairs → four broadcast
    * hash joins against model-sized frames → ONE map-side-combined
    * per-document aggregation. The corpus is never shuffled before the
    * partial agg; with `broadcastModel=false` the joins fall back to
    * shuffle joins for vocabulary sizes past broadcast limits. */
  def bigramLogProbs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", model: Option[BigramLm] = None,
      alpha: Double = 0.4, broadcastModel: Boolean = true): DataFrame = {
    require(alpha > 0.0, s"bigram smoothing wants alpha > 0, got $alpha")
    val m = model.getOrElse(bigramModel(df, textCol, broadcastVocab = broadcastModel))
    def side(d: DataFrame) = if (broadcastModel) broadcast(d) else d
    val vsize = m.vocab.agg((count(lit(1)) + 1L).cast("double").as("__v"))
    val prevTotals = m.bigrams.groupBy("prev").agg(sum("cnt").as("prev_cnt"))
    val raw = bigramPairs(df, textCol, Seq(col(idCol)))
    val mapped = unkMap(unkMap(raw, m.vocab, "prev", broadcastModel),
      m.vocab, "tok", broadcastModel)
    val logp = log(
      (coalesce(col("cnt"), lit(0L)).cast("double") + lit(alpha)) /
        (coalesce(col("prev_cnt"), lit(0L)).cast("double") + lit(alpha) * col("__v")))
    mapped
      .join(side(m.bigrams), Seq("prev", "tok"), "left")
      .join(side(prevTotals), Seq("prev"), "left")
      .crossJoin(broadcast(vsize))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(logp).as("mean_log_prob"))
      .withColumn("perplexity", exp(-col("mean_log_prob")))
  }

  /** Persist a [[BigramLm]] (vocab + bigrams parquet side by side),
    * types normalized on write like [[saveUnigramModel]]. */
  def saveBigramModel(model: BigramLm, path: String): Unit = {
    model.vocab.select(col("token").cast("string").as("token"))
      .write.mode("overwrite").parquet(s"$path/vocab")
    model.bigrams.select(col("prev").cast("string").as("prev"),
        col("tok").cast("string").as("tok"), col("cnt").cast("long").as("cnt"))
      .write.mode("overwrite").parquet(s"$path/bigrams")
  }

  /** Load a persisted bigram model, validating both frame contracts. */
  def loadBigramModel(spark: org.apache.spark.sql.SparkSession,
      path: String): BigramLm = {
    val vocab = spark.read.parquet(s"$path/vocab")
    val bigrams = spark.read.parquet(s"$path/bigrams")
    require(vocab.columns.contains("token"),
      s"bigram model vocab at $path/vocab must have a token column, " +
        s"found: ${vocab.columns.mkString(", ")}")
    require(Set("prev", "tok", "cnt").subsetOf(bigrams.columns.toSet),
      s"bigram model at $path/bigrams must have (prev, tok, cnt) columns, " +
        s"found: ${bigrams.columns.mkString(", ")}")
    BigramLm(
      vocab.select(col("token").cast("string").as("token")),
      bigrams.select(col("prev").cast("string").as("prev"),
        col("tok").cast("string").as("tok"), col("cnt").cast("long").as("cnt")))
  }
}
