package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a 100 TB training-data
  * pipeline actually runs — C4 line cleaning → Gopher document rules →
  * repetition rules → quality/language filter → URL dedup → exact
  * dedup → CCNet unigram/bigram LM bucketing → near-dup dedup — with
  * per-stage drop accounting so nothing is silently lost.
  *
  * Stage order is deliberate: the cheap scan-side filters (C4, Gopher,
  * repetition, quality, language) run FIRST and shrink the corpus
  * before any shuffle; the whole scan-side ledger is ONE kernel call
  * per row (the first-failing-stage hygiene verdict) grouped into a
  * map-side-combined <=7-row aggregate, so it costs a single corpus
  * read. The shuffle stages follow cheapest-first: URL dedup and
  * exact dedup are one map-side-combined aggregation each, unigram
  * scoring is one token-keyed join, and the pair-generating near-dup
  * stage — the most expensive — runs last over the smallest surviving
  * frame.
  */
object Curation {

  /** Ordered per-stage survivor counts. `stages` holds (name, rows
    * surviving through that stage) in execution order; only stages
    * that actually ran appear. */
  final case class CurationStats(input: Long, stages: Vector[(String, Long)]) {
    /** Rows surviving through stage `name`. */
    def after(name: String): Long =
      stages.collectFirst { case (`name`, n) => n }.getOrElse(
        throw new NoSuchElementException(
          s"no curation stage '$name' ran; stages: ${stages.map(_._1).mkString(", ")}"))

    /** Rows each stage dropped, keyed by stage name. */
    def dropped: Map[String, Long] = {
      val before = input +: stages.map(_._2)
      stages.zip(before).map { case ((n, after), b) => n -> (b - after) }.toMap
    }

    def output: Long = stages.lastOption.map(_._2).getOrElse(input)
  }

  /** `release()` unpersists the pipeline's internal caches once the
    * caller is DONE with `df` (has written or collected it). It is NOT
    * called automatically: the returned frame's lineage reads those
    * caches, and Spark's non-cascading uncache would rebuild/discard
    * dependent entries — releasing before consumption re-executes the
    * whole pipeline on the next action. Skipping release leaks up to
    * ~6 corpus-scale MEMORY_AND_DISK entries per curate() call in a
    * long-lived session (LRU-evicted under pressure, but CacheManager
    * metadata and spill space grow until cleared). */
  final case class CurationResult(df: DataFrame, stats: CurationStats,
      private[graft] val cached: Seq[DataFrame] = Nil) {
    def release(): Unit = cached.foreach(_.unpersist())
  }

  /** Near-dup pair generation strategy for the final stage. */
  sealed trait NearDup
  object NearDup {
    /** Exact n-gram Jaccard over the (maxDf-bounded) shingle self-join:
      * the complete >=threshold pair set. Right up to mid-size corpora;
      * the self-join's shuffle grows with corpus x shingle volume. */
    case object NgramExact extends NearDup
    /** MinHash signatures + LSH banding calibrated to the threshold via
      * [[Dedup.lshParamsFor]], pairs kept by estimated Jaccard — the
      * 100 TB path: per-doc work is k hashes, candidate generation
      * touches only same-bucket pairs, recall < 1 by construction. */
    case object MinhashLsh extends NearDup
  }

  /** C4 page-cleaning stage parameters (Raffel et al. 2020 §2.2). */
  final case class C4Config(minSentences: Int = 3, minWordsPerLine: Int = 5)

  /** CCNet-style unigram bucketing stage (Wenzek et al. 2020): score
    * every surviving document under `model` (self-estimated when
    * None), bucket with the approxQuantile scale path, keep the best
    * `keepBuckets` of `buckets`. Runs AFTER dedup like the CCNet
    * recipe, so duplicate pages cannot skew the LM toward themselves. */
  final case class UnigramConfig(
      buckets: Int = 3,
      keepBuckets: Int = 2,
      model: Option[DataFrame] = None,
      relErr: Double = 0.001)

  /** CCNet-with-the-real-LM stage: score every surviving document's
    * mean bigram log-probability under `model` (self-trained when
    * None — but prefer a clean-reference model, see the
    * [[QualityFilters.bigramLogProbs]] UNK caveat), bucket with the
    * approxQuantile scale path, keep the best `keepBuckets`. Like
    * [[UnigramConfig]] it runs post-dedup. Note that documents with
    * fewer than two tokens have no bigrams, score nothing, and are
    * dropped by this stage — run it only on corpora where
    * sub-two-token pages are junk by definition (web text). */
  final case class BigramConfig(
      buckets: Int = 3,
      keepBuckets: Int = 2,
      model: Option[QualityFilters.BigramLm] = None,
      alpha: Double = 0.4,
      minCount: Long = 2,
      relErr: Double = 0.001)

  /** Optional corpus-hygiene stages around the core quality → language
    * → dedup spine. Everything defaults OFF; enabling a stage adds its
    * (name, survivors) entry to the ledger. `urlCol` names a column of
    * raw page URLs; when set, canonical-URL dedup runs before content
    * dedup (cheaper key, catches mirror fetches exact dedup misses
    * only after the heavier text hash). */
  final case class HygieneConfig(
      c4: Option[C4Config] = None,
      gopher: Option[QualityFilters.GopherConfig] = None,
      repetition: Option[QualityFilters.RepetitionConfig] = None,
      urlCol: Option[String] = None,
      unigram: Option[UnigramConfig] = None,
      bigram: Option[BigramConfig] = None)

  def curate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.3,
      languages: Seq[String] = Seq("en"),
      nearDupThreshold: Double = 0.8,
      shingleSize: Int = 3,
      nearDup: NearDup = NearDup.NgramExact,
      hygiene: HygieneConfig = HygieneConfig(),
      hasher: (Column, Int) => Column = Dedup.md5Hash
  ): CurationResult = {
    val t = col(textCol)
    // C4 rewrites the text (line filtering); every later scan-side rule
    // evaluates the CLEANED text, exactly like the recipe's own order.
    val cleanText = hygiene.c4.map(c => QualityFilters.c4Text(t, c.minWordsPerLine))
      .getOrElse(t)

    // ---- scan-side stages: ONE kernel call per row computes the whole
    // verdict (first failing stage, canonical indices 1=c4..5=language;
    // 0 = keep). The previous progressive-conjunction formulation
    // re-evaluated the C4 line filter and re-tokenized once per signal
    // — Spark's codegen eliminates common subexpressions inside
    // projections but NOT across filter conjuncts or aggregate update
    // expressions, and expression trees are trees (every signal holds
    // its own c4Text copy) — measured 2.1 ms/doc at 1M docs. The
    // verdict kernel cleans + tokenizes once and short-circuits, and
    // grouping BY the verdict evaluates it once per row with a
    // map-side-combined <=7-group aggregate.
    val verdictRaw = QualityFilters.hygieneVerdict(t,
      hygiene.c4.map(c => (c.minSentences, c.minWordsPerLine)),
      hygiene.gopher, hygiene.repetition, minQuality, languages)
    // null text never reaches the kernel (null-intolerant expression):
    // it fails the FIRST enabled stage, like the old conjunction where
    // a null predicate dropped the row at its first evaluation
    val firstStage =
      if (hygiene.c4.isDefined) graft.functions.Hygiene.C4Stage
      else if (hygiene.gopher.isDefined) graft.functions.Hygiene.GopherStage
      else if (hygiene.repetition.isDefined) graft.functions.Hygiene.RepetitionStage
      else graft.functions.Hygiene.QualityStage
    val verdict = coalesce(verdictRaw, lit(firstStage))

    val tracked = Vector.newBuilder[DataFrame]
    def cacheTracked(df: DataFrame): DataFrame = {
      val c = Dedup.cacheOnce(df)
      tracked += c
      c
    }
    val sc = docs.sparkSession.sparkContext
    def staged[A](name: String)(body: => A): A = {
      sc.setJobDescription(s"graft curate: $name")
      try body finally sc.setJobDescription(null)
    }

    val vCounts = staged("scan ledger")(docs.groupBy(verdict.as("__verdict"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val input = vCounts.values.sum
    // survivors through stage i = rows passing every enabled stage <= i
    // = verdict == 0 (passed everything) or verdict > i (first failure
    // comes later); disabled stages never appear as verdicts
    val stageIdx: Seq[(String, Int)] =
      hygiene.c4.map(_ => "c4" -> graft.functions.Hygiene.C4Stage).toSeq ++
        hygiene.gopher.map(_ => "gopher" -> graft.functions.Hygiene.GopherStage).toSeq ++
        hygiene.repetition.map(_ =>
          "repetition" -> graft.functions.Hygiene.RepetitionStage).toSeq ++
        Seq("quality" -> graft.functions.Hygiene.QualityStage,
          "language" -> graft.functions.Hygiene.LanguageStage)
    val scanCounts = stageIdx.map { case (name, idx) =>
      name -> vCounts.collect { case (v, n) if v == 0 || v > idx => n }.sum }

    // cacheOnce: the scan-filtered frame feeds the URL-dedup self-join
    // AND the downstream dedup chain — cache it once here so a repeated
    // identical curate call (bench reps) reuses the live entry instead
    // of re-issuing cache() against the same plan.
    val scanKept = cacheTracked(
      docs.filter(verdict === graft.functions.Hygiene.PassVerdict)
        .withColumn(textCol, cleanText))

    var ledger = Vector.newBuilder[(String, Long)]
    ledger ++= scanCounts

    // ---- URL dedup: one map-side-combined group + a semi join --------
    val urlKept = hygiene.urlCol match {
      case Some(u) =>
        // rows with no usable URL (null or empty after canonicalization)
        // pass through untouched: grouping them would collapse every
        // URL-less document into ONE group and silently delete all but
        // one unrelated page under the url_dup label
        val canon = QualityFilters.canonicalizeUrl(col(u))
        val usable = col(u).isNotNull && length(canon) > 0
        val keepers = QualityFilters.dedupByUrl(scanKept.filter(usable), u, idCol)
          .select(col("keep_id").as(idCol))
        // cached: the next stage (exactDedup) consumes its input TWICE
        // (fingerprint groupBy + the keeper semi join), and this frame
        // carries a union, a join and the URL-canonicalization regex
        // chain — without the cache all of it executes twice
        val kept = cacheTracked(scanKept.filter(!usable)
          .unionByName(scanKept.filter(usable).join(keepers, Seq(idCol), "left_semi")))
        ledger += ("url_dup" -> staged("url dedup")(kept.count()))
        kept
      case None => scanKept
    }

    // ---- exact content dedup -----------------------------------------
    val exactKept = cacheTracked(Dedup.exactDedup(urlKept, textCol, idCol))
    val afterExact = staged("exact dedup")(exactKept.count())
    ledger += ("exact_dup" -> afterExact)

    // ---- CCNet unigram bucketing (post-dedup, approx scale path) -----
    val uniKept = hygiene.unigram match {
      case Some(u) =>
        // cached: qualityBucketsApprox's approxQuantile is an eager
        // action over the scored frame, and the bucket filter below
        // consumes it AGAIN — without the cache the corpus-scale LM
        // scoring plan executes twice per stage
        val scored = cacheTracked(
          QualityFilters.unigramLogProbs(exactKept, idCol, textCol, u.model))
        val bucketed = QualityFilters.qualityBucketsApprox(
          scored, buckets = u.buckets, relErr = u.relErr)
        val keepIds = bucketed.filter(col("quality_bucket") <= u.keepBuckets)
          .select(col(idCol))
        val kept = cacheTracked(exactKept.join(keepIds, Seq(idCol), "left_semi"))
        ledger += ("unigram" -> staged("unigram buckets")(kept.count()))
        kept
      case None => exactKept
    }

    // ---- bigram LM perplexity bucketing (the CCNet scoring model
    // proper; also post-dedup) ------------------------------------------
    val lmKept = hygiene.bigram match {
      case Some(b) =>
        val model = b.model.getOrElse(
          QualityFilters.bigramModel(uniKept, textCol, b.minCount))
        // same double-execution guard as the unigram stage above
        val scored = cacheTracked(QualityFilters.bigramLogProbs(
          uniKept, idCol, textCol, Some(model), b.alpha))
        val bucketed = QualityFilters.qualityBucketsApprox(
          scored, buckets = b.buckets, relErr = b.relErr)
        val keepIds = bucketed.filter(col("quality_bucket") <= b.keepBuckets)
          .select(col(idCol))
        val kept = cacheTracked(uniKept.join(keepIds, Seq(idCol), "left_semi"))
        ledger += ("bigram" -> staged("bigram buckets")(kept.count()))
        kept
      case None => uniKept
    }

    // ---- near-dup dedup: the expensive stage runs over the smallest
    // surviving frame ---------------------------------------------------
    val pairs = nearDup match {
      case NearDup.NgramExact =>
        Dedup.ngramJaccardPairs(lmKept, idCol, textCol,
          shingleSize, nearDupThreshold)
      case NearDup.MinhashLsh =>
        val (k, bands) = Dedup.lshParamsFor(nearDupThreshold)
        Dedup.minhashJaccardPairs(lmKept, idCol, textCol,
          k = k, bands = bands, n = shingleSize, threshold = nearDupThreshold,
          hasher = hasher)
    }
    val curated = Dedup.dedupByPairs(lmKept, idCol, pairs)
    ledger += ("near_dup" -> staged("near-dup dedup")(curated.count()))

    // the caches deliberately stay resident: unpersisting any of them
    // here would make the CacheManager REBUILD every dependent entry
    // (and through them the RETURNED frame's lineage), so the caller's
    // first action over the result would re-execute the whole pipeline
    // from the parquet scan. The caller releases them AFTER consuming
    // df, via CurationResult.release().
    CurationResult(curated, CurationStats(input, ledger.result()),
      tracked.result())
  }
}
