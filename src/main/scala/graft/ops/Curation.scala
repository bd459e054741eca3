package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a 100 TB training-data
  * pipeline actually runs — C4 line cleaning → within-doc line dedup →
  * Gopher document rules →
  * repetition rules → quality/language filter → blocklist → URL dedup
  * → corpus boilerplate removal → exact dedup → C4 span dedup →
  * ExactSubstr passage removal → CCNet unigram/bigram LM bucketing →
  * classifier quality filter →
  * benchmark decontamination → near-dup dedup → SemDeDup → DSIR
  * target selection — with per-stage drop accounting so nothing is
  * silently lost.
  *
  * Stage order is deliberate: the cheap scan-side filters (C4, Gopher,
  * repetition, quality, language, blocklist) run FIRST and shrink the
  * corpus before any shuffle; the whole scan-side ledger is ONE kernel
  * call per row (the first-failing-stage hygiene verdict) grouped into
  * a map-side-combined <=7-row aggregate, so it costs a single corpus
  * read. The shuffle stages follow cheapest-first: URL dedup, exact
  * dedup and the boilerplate/span text rewrites are one-to-two
  * map-side-combined aggregations each, LM scoring is one token-keyed
  * join, decontamination is a broadcast anti-join, and the
  * pair-generating stages — lexical near-dup, then semantic
  * SemDeDup — run last over the smallest surviving frame.
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
    * called automatically: with the caches gone, a later action over
    * `df` recomputes their plans. `cached` holds EVERY frame the
    * pipeline registered, including the ones library calls create
    * internally (near-dup signature/bucket frames, LM model frames,
    * boilerplate line positions, semantic clusters — captured via
    * [[graft.util.Caching.tracking]]), so release() is complete.
    * Skipping it leaks those MEMORY_AND_DISK entries per curate() call
    * in a long-lived session (LRU-evicted under pressure, but
    * CacheManager metadata and spill space grow until cleared).
    *
    * STAGE outputs are not in `cached`: they are lazy localCheckpoints
    * (see `stageCp` in [[curate]]), whose blocks the ContextCleaner
    * reclaims once the result (and `df`) become unreachable — the same
    * lifecycle [[Dedup.connectedComponents]] uses for its per-round
    * frames. They are deliberately NOT unpersisted here: a checkpoint
    * truncates lineage, so dropping its blocks while `df` is still
    * referenced would make the next action FAIL rather than recompute. */
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

  /** Image near-dup stage for multimodal corpora: `hashCol` holds a
    * precomputed 64-bit perceptual hash per document (e.g.
    * [[Multimodal.imageDHashes]] joined onto the docs frame, or any
    * other 64-bit locality key); documents whose hashes sit within
    * `maxHamming` bits form components that keep only the minimum-id
    * member ([[Dedup.hammingPairs64]] pigeonhole banding +
    * [[Dedup.dedupByPairs]] — never all-pairs). Rows with a null hash
    * (no image) pass through untouched. */
  final case class ImageDupConfig(hashCol: String, maxHamming: Int = 2,
      bands: Int = 4, maxBucket: Int = 100000)

  /** Corpus-level boilerplate line removal stage
    * ([[Dedup.stripBoilerplate]]): lines whose normalized form appears
    * in more than `maxDocFreq` distinct documents are deleted
    * everywhere. `dropEmptied` also drops documents whose text is
    * blank after stripping (a page that was ALL nav/banner). */
  final case class BoilerplateConfig(maxDocFreq: Long = 10,
      dropEmptied: Boolean = true)

  /** C4 cross-document span dedup stage ([[Dedup.spanDedup]]): runs of
    * `span` consecutive sentences survive only at their first corpus
    * occurrence. Sentence segmentation needs terminal punctuation, and
    * documents are REASSEMBLED from their sentences — terminator-free
    * text (code, tables, logs) has no sentences and comes back blank,
    * so with `dropEmptied` those documents are dropped. This stage is
    * for punctuated web prose; use [[Dedup.exactSubstrDedup]] (token
    * windows, no punctuation assumption) for mixed corpora. */
  final case class SpanDedupConfig(span: Int = 3,
      dropEmptied: Boolean = true)

  /** ExactSubstr duplicate-passage removal stage
    * ([[Dedup.exactSubstrDedup]]): runs of `k` consecutive whitespace
    * tokens duplicated anywhere in the corpus survive only at their
    * first occurrence — the terminator-free complement of
    * [[SpanDedupConfig]] for code, tables and logs. `dropEmptied`
    * drops documents left blank by the removal. */
  final case class ExactSubstrConfig(k: Int = 20, dropEmptied: Boolean = true)

  /** fastText-style classifier quality stage
    * ([[QualityClassifier]]): score every surviving document under a
    * logistic model trained positive-vs-negative and keep those at or
    * above `minProb`. `model` skips training (the train-once
    * score-every-drop shape); otherwise positives come from
    * `positives` (a small reference corpus) and negatives from a
    * deterministic `negativeRate` hash-sample of the CURRENT
    * survivors. Runs with the other statistical quality stages —
    * post-dedup, so duplicates cannot skew the fit. */
  final case class ClassifierConfig(
      positives: Option[DataFrame] = None,
      minProb: Double = 0.5,
      negativeRate: Double = 0.01,
      buckets: Int = 65536,
      model: Option[QualityClassifier.Model] = None) {
    require(model.isDefined || positives.isDefined,
      "ClassifierConfig needs a trained model or a positives corpus")
  }

  /** Benchmark-decontamination stage ([[Dedup.decontaminate]]): drop
    * every surviving document sharing an `n`-gram with `eval`. The
    * eval shingle set is broadcast (`broadcastEval = false` for an
    * oversized eval corpus → shuffled join); the training side is
    * scanned once and never shuffled. */
  final case class DecontaminateConfig(eval: DataFrame, n: Int = 8,
      broadcastEval: Boolean = true, bloom: Boolean = false)

  /** SemDeDup stage ([[Similarity.semDedup]]): semantic near-dup
    * removal over `vecCol` (an embedding array column that must be
    * present on the input frame — join your embedding table on before
    * calling curate). Runs LAST, over the smallest surviving frame:
    * it catches paraphrases the lexical stages cannot. */
  final case class SemDeDupConfig(vecCol: String,
      threshold: Double = 0.95,
      nlist: Int = 16,
      refineIters: Int = 0,
      keepFarthestFromCentroid: Boolean = true,
      maxCluster: Int = 100000)

  /** DSIR target-selection stage ([[Dsir]]): keep the `k` surviving
    * documents that look most like `target` (Gumbel top-k without
    * replacement under hashed-n-gram importance weights). Runs LAST of
    * everything — selection should see only clean, deduplicated
    * survivors, and the distributions it fits should describe them. */
  final case class DsirConfig(target: DataFrame, k: Int,
      buckets: Int = 65536, alpha: Double = 1.0,
      temperature: Double = 1.0, seed: Int = 42)

  /** Per-domain quota stage ([[Sampling.bestKPerStratum]]): cap each
    * `stratumCol` group (source, registered domain, crawl snapshot) at
    * its `k` best surviving documents by `orderCol` descending —
    * RefinedWeb's "no domain dominates the mixture" rule, applied
    * AFTER every dedup (quota capacity is not wasted on duplicates)
    * and BEFORE DSIR selection (the target draw sees the capped
    * mixture). Skew-immune two-phase window — see bestKPerStratum. */
  final case class DomainCapConfig(stratumCol: String, k: Int,
      orderCol: String)

  /** Optional corpus-hygiene stages around the core quality → language
    * → dedup spine. Everything defaults OFF; enabling a stage adds its
    * (name, survivors) entry to the ledger. `blocklist` drops pages
    * containing any listed word (scan-side, fused into the same corpus
    * read as the verdict kernel). `urlCol` names a column of raw page
    * URLs; when set, canonical-URL dedup runs before content dedup
    * (cheaper key, catches mirror fetches exact dedup misses only
    * after the heavier text hash). `boilerplate` and `spanDedup` are
    * corpus-level text rewrites; `decontaminate` and `semDedup` run
    * after the lexical dedups, cheapest-first; `dsir` selection runs
    * last of all. */
  final case class HygieneConfig(
      c4: Option[C4Config] = None,
      gopher: Option[QualityFilters.GopherConfig] = None,
      repetition: Option[QualityFilters.RepetitionConfig] = None,
      /** Within-document duplicate-line removal
        * ([[graft.functions.LineDedup]]): a pure text REWRITE fused into
        * the same scan as the verdict kernel — no extra corpus read,
        * no ledger row (it never drops documents; it normalizes
        * survivors so the later hash dedups catch pages differing
        * only in how often a line repeats). The quality verdict
        * deliberately sees the PRE-rewrite text: within-document
        * repetition is itself a quality signal. */
      lineDedup: Boolean = false,
      /** Mojibake repair passes ([[graft.functions.Mojibake]]); 0 =
        * off. Unlike lineDedup, the repair runs BEFORE the quality
        * verdict: encoding corruption is transport damage, not a
        * content-quality signal, and unrepaired artifacts both
        * depress quality scores (inflated symbol ratios) and split
        * dedup clusters (a corrupted twin hashes differently from its
        * clean original). Fused into the same scan — the replace
        * chain is codegen'd map work on the corpus read. */
      mojibakePasses: Int = 0,
      blocklist: Option[Seq[String]] = None,
      urlCol: Option[String] = None,
      imageDup: Option[ImageDupConfig] = None,
      boilerplate: Option[BoilerplateConfig] = None,
      spanDedup: Option[SpanDedupConfig] = None,
      exactSubstr: Option[ExactSubstrConfig] = None,
      unigram: Option[UnigramConfig] = None,
      bigram: Option[BigramConfig] = None,
      classifier: Option[ClassifierConfig] = None,
      decontaminate: Option[DecontaminateConfig] = None,
      semDedup: Option[SemDeDupConfig] = None,
      domainCap: Option[DomainCapConfig] = None,
      dsir: Option[DsirConfig] = None,
      softQuality: Option[SoftQualityConfig] = None)

  /** Soft quality stage ([[Sampling.softSample]]): score-proportional
    * keep instead of (or after) the verdict kernel's hard `minQuality`
    * floor — each scan survivor keeps with probability
    * min(1, (qualityScore/pivot)^sharpness), deterministically decided
    * by the salted unit hash. Runs right after the scan, before any
    * dedup pays for documents the soft filter would have dropped. */
  final case class SoftQualityConfig(
      pivot: Double,
      sharpness: Double = 1.0,
      seed: Int = 42)

  /** Opt-in stage-level resume store for [[curate]]: each completed
    * stage's surviving frame persists as `<dir>/<stage>/` parquet
    * (atomic `_SUCCESS`-guarded), the scan ledger as a side JSON, and
    * the curation parameters as `_params.json`. A re-run against the
    * same dir skips every completed stage — the thunks are never
    * forced — and recomputes from the first missing one, so a
    * multi-hour 100 TB curation run survives driver loss at the cost
    * of one parquet write per stage. The params pin refuses a dir
    * written under a DIFFERENT config (changed configs shift stage
    * semantics); the input corpus and any auxiliary frames (eval sets,
    * classifier positives, DSIR targets) are NOT fingerprinted —
    * standard checkpoint-dir semantics: one dir per (input, config)
    * pair is the caller's contract. */
  private final class StageStore(dir: String, params: String) {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(dir))
    private val paramsPath = Paths.get(dir, "_params.json")
    if (Files.exists(paramsPath)) {
      val prior = Files.readString(paramsPath)
      if (prior != params) throw graft.errors.Errors.config(
        s"resume dir $dir was written under different curation parameters.",
        "use a fresh resume dir (or delete this one) when the config changes")
    } else Files.writeString(paramsPath, params)

    private def path(stage: String) = s"$dir/$stage"
    def isDone(stage: String): Boolean =
      Files.exists(Paths.get(path(stage), "_SUCCESS"))
    /** Completed stages must form a PREFIX of the enabled pipeline:
      * stage N's checkpoint was computed FROM stage N-1's frame, so a
      * manually deleted (or partially cleaned) intermediate checkpoint
      * with later checkpoints still present would resume those later
      * stages against upstream data recomputed from a different input
      * state. Any done stage after the first missing one is
      * invalidated here (its `_SUCCESS` removed — `write` overwrites
      * the rest) so the pipeline self-heals by recomputing the suffix
      * instead of silently mixing two runs. */
    def validatePrefix(orderedStages: Seq[String]): Unit = {
      val firstMissing = orderedStages.indexWhere(!isDone(_))
      if (firstMissing >= 0)
        orderedStages.drop(firstMissing + 1).filter(isDone).foreach { st =>
          System.err.println(s"[graft] resume dir $dir: checkpoint for " +
            s"stage '$st' follows missing stage " +
            s"'${orderedStages(firstMissing)}' — invalidating it (the " +
            "suffix recomputes from the first missing stage)")
          Files.delete(Paths.get(path(st), "_SUCCESS"))
        }
    }
    def read(spark: org.apache.spark.sql.SparkSession, stage: String): DataFrame =
      spark.read.parquet(path(stage))
    def write(stage: String, df: DataFrame): DataFrame = {
      df.write.mode("overwrite").parquet(path(stage))
      df.sparkSession.read.parquet(path(stage))
    }
    def readSide(stage: String): Map[String, Long] =
      graft.util.Jsons.parse(Files.readString(Paths.get(dir, s"_$stage.json")))
        .collect { case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].map {
            case (k, v: Long) => k -> v
            case (k, v: Number) => k -> v.longValue()
            case (k, v) => throw new IllegalStateException(
              s"non-numeric side entry $k=$v in resume dir $dir")
          }
        }.getOrElse(throw new IllegalStateException(
          s"unreadable side file for stage $stage in resume dir $dir"))
    def writeSide(stage: String, counts: Seq[(String, Long)]): Unit =
      Files.writeString(Paths.get(dir, s"_$stage.json"),
        graft.util.Jsons.obj(counts.map { case (k, v) => k -> (v: Any) }: _*))
  }

  /** Run the pipeline. `hasher` (used by the MinHash/LSH near-dup
    * stage) hits the codegen'd signature kernel only when it IS
    * `Dedup.md5Hash` or `Dedup.xxHash` by reference — pass the `val`s
    * themselves, not a wrapping lambda (see [[Dedup.signatures]]).
    * `resume` names a stage-checkpoint directory (see [[StageStore]]):
    * completed stages are read back instead of recomputed, making the
    * composed pipeline restartable after driver loss. */
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
      hasher: (Column, Int) => Column = Dedup.md5Hash,
      resume: Option[String] = None,
      /** Near-dup representative choice: name a score column and each
        * duplicate cluster keeps its HIGHEST-scoring member (ties to
        * min id) via [[Dedup.dedupByPairsBest]] — the RefinedWeb-style
        * "keep the best page of the cluster" instead of the default
        * keep-min-id (whatever was ingested first). */
      nearDupKeepCol: Option[String] = None
  ): CurationResult = {
    // Mojibake repair is a pre-transform of the corpus itself: the
    // verdict kernel, the hash dedups, and every rewrite see the
    // REPAIRED text, so a corrupted twin re-joins its clean
    // duplicate's cluster instead of hashing apart. The replace chain
    // fuses into the same codegen'd corpus scan as the verdict.
    val corpus =
      if (hygiene.mojibakePasses > 0)
        docs.withColumn(textCol,
          graft.functions.Mojibake.fix(col(textCol), hygiene.mojibakePasses))
      else docs
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
    // tracking: EVERY cacheOnce fired while the pipeline is built —
    // including the ones inside Dedup / QualityFilters / Similarity
    // (signature frames, bounded buckets, LM models, boilerplate line
    // positions, semantic clusters) — lands in `tracked`, so
    // CurationResult.release() owns the full cache set, not just the
    // frames this function registered directly.
    graft.util.Caching.tracking(tracked += _) {
    def cacheTracked(df: DataFrame): DataFrame = Dedup.cacheOnce(df)
    // Stage-boundary lineage truncation. Every stage output is
    // materialized anyway (its ledger count); a lazy localCheckpoint
    // makes that materialization ALSO cut the logical plan to a flat
    // LogicalRDD. Without the cut, each stage's plan embeds its
    // input's plan at every reference (the reassembly/dedup stages
    // reference their input 2-4 times: probe side + winner side +
    // rejoin), and although execution dedupes through the block store,
    // the plan DAG prints as a TREE — explain strings, AQE
    // plan-change events and UI SparkPlanInfo all expand it, so a
    // composed 9-stage pipeline spent MINUTES of driver CPU and tens
    // of GB rendering exponentially nested plans (observed: the
    // full-hygiene spec hung >19 min in generateTreeString). Storage
    // cost is the same MEMORY_AND_DISK footprint the per-stage cache
    // paid; blocks are reclaimed by the ContextCleaner once the
    // result is dropped (the connectedComponents lifecycle).
    def stageCp(df: DataFrame): DataFrame = df.localCheckpoint(false)
    val sc = docs.sparkSession.sparkContext
    def staged[A](name: String)(body: => A): A = {
      sc.setJobDescription(s"graft curate: $name")
      try body finally sc.setJobDescription(null)
    }

    // ---- opt-in stage resume (see StageStore). The params pin covers
    // every SCALAR knob; DataFrame-valued config (decontaminate eval,
    // classifier positives, DSIR target) and the input corpus itself
    // are deliberately outside it — checkpoint-dir semantics.
    val store = resume.map { dir =>
      val h = hygiene
      val hasherName =
        if (hasher eq Dedup.md5Hash) "md5"
        else if (hasher eq Dedup.xxHash) "xx"
        else "custom"
      new StageStore(dir, graft.util.Jsons.obj(
        "id" -> idCol, "text" -> textCol, "minQuality" -> minQuality,
        "languages" -> languages, "nearDupThreshold" -> nearDupThreshold,
        "nearDupKeepCol" -> nearDupKeepCol,
        "shingleSize" -> shingleSize, "nearDup" -> nearDup.toString,
        "hasher" -> hasherName,
        "c4" -> h.c4.map(_.toString), "gopher" -> h.gopher.map(_.toString),
        "repetition" -> h.repetition.map(_.toString),
        "lineDedup" -> h.lineDedup,
        "mojibakePasses" -> h.mojibakePasses,
        "blocklist" -> h.blocklist.map(_.mkString(",")),
        "urlCol" -> h.urlCol,
        "imageDup" -> h.imageDup.map(_.toString),
        "boilerplate" -> h.boilerplate.map(_.toString),
        "spanDedup" -> h.spanDedup.map(_.toString),
        "exactSubstr" -> h.exactSubstr.map(_.toString),
        "unigram" -> h.unigram.map(u =>
          s"${u.buckets}:${u.keepBuckets}:${u.model.isDefined}:${u.relErr}"),
        "bigram" -> h.bigram.map(b =>
          s"${b.buckets}:${b.keepBuckets}:${b.model.isDefined}:${b.alpha}:${b.minCount}:${b.relErr}"),
        "classifier" -> h.classifier.map(c =>
          s"${c.minProb}:${c.negativeRate}:${c.buckets}:${c.model.isDefined}"),
        // bloom is deliberately NOT part of the pin: it changes the
        // plan, never the rows, so a resume may switch it freely
        "decontaminate" -> h.decontaminate.map(d => s"${d.n}:${d.broadcastEval}"),
        "semDedup" -> h.semDedup.map(_.toString),
        "domainCap" -> h.domainCap.map(_.toString),
        "dsir" -> h.dsir.map(d =>
          s"${d.k}:${d.buckets}:${d.alpha}:${d.temperature}:${d.seed}"),
        "softQuality" -> h.softQuality.map(c =>
          s"${c.pivot}:${c.sharpness}:${c.seed}")))
    }
    // enabled stage keys in pipeline order, for the prefix check (the
    // names must match the stageOut keys below)
    store.foreach(_.validatePrefix(Seq("scan") ++
      hygiene.softQuality.map(_ => "soft_quality") ++
      hygiene.urlCol.map(_ => "url_dup") ++
      hygiene.imageDup.map(_ => "image_dup") ++
      hygiene.boilerplate.map(_ => "boilerplate") ++
      Seq("exact_dup") ++
      hygiene.spanDedup.map(_ => "span_dup") ++
      hygiene.exactSubstr.map(_ => "exact_substr") ++
      hygiene.unigram.map(_ => "unigram") ++
      hygiene.bigram.map(_ => "bigram") ++
      hygiene.classifier.map(_ => "classifier") ++
      hygiene.decontaminate.map(_ => "contaminated") ++
      Seq("near_dup") ++
      hygiene.semDedup.map(_ => "semantic_dup") ++
      hygiene.domainCap.map(_ => "domain_capped") ++
      hygiene.dsir.map(_ => "dsir_selected")))
    // One stage boundary: under resume, a completed stage's frame is
    // READ BACK (the thunk is never forced — no refit, no reshuffles);
    // an incomplete stage computes, persists atomically and reads
    // back, so the surviving lineage is a flat parquet scan either
    // way. Without resume, the lazy localCheckpoint keeps the historic
    // behavior byte-for-byte. The returned count doubles as the ledger
    // row (parquet counts are metadata-cheap on the resumed path).
    def stageOut(key: String, desc: String)(compute: => DataFrame): (DataFrame, Long) =
      store match {
        case Some(st) if st.isDone(key) =>
          val df = st.read(docs.sparkSession, key)
          (df, staged(s"$desc (resumed)")(df.count()))
        case Some(st) =>
          val df = staged(desc)(st.write(key, compute))
          (df, staged(desc)(df.count()))
        case None =>
          val df = stageCp(compute)
          (df, staged(desc)(df.count()))
      }

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

    // the scan stage resumes as a unit: its per-rule ledger comes from
    // the verdict AGGREGATE over the raw input (a full corpus read),
    // so the counts ride a side JSON next to the persisted frame —
    // resuming must skip the aggregate too, not just the filter
    val (scanKept, input, scanCounts): (DataFrame, Long, Seq[(String, Long)]) =
      store match {
        case Some(st) if st.isDone("scan") =>
          val df = st.read(docs.sparkSession, "scan")
          val side = st.readSide("scan")
          (df, side("__input"), stageIdx.map { case (n, _) => n -> side(n) })
        case _ =>
          val vCounts = staged("scan ledger")(corpus.groupBy(verdict.as("__verdict"))
            .agg(count(lit(1)).as("__n"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
          val inputN = vCounts.values.sum
          val counts = stageIdx.map { case (name, idx) =>
            name -> vCounts.collect { case (v, n) if v == 0 || v > idx => n }.sum }
          // cacheOnce: the scan-filtered frame feeds the URL-dedup
          // self-join AND the downstream dedup chain — cache it once
          // here so a repeated identical curate call (bench reps)
          // reuses the live entry instead of re-issuing cache()
          // against the same plan. The blocklist filter (when enabled)
          // fuses into the SAME whole-stage-codegen scan as the
          // verdict filter — no extra corpus read — and evaluates the
          // CLEANED text like every other post-C4 rule. The line-dedup
          // kernel composes INSIDE the same codegen span as the
          // verdict filter and C4 rewrite — one corpus read, cleanText
          // evaluated once per document as the kernel's child.
          val scanFiltered =
            corpus.filter(verdict === graft.functions.Hygiene.PassVerdict)
              .withColumn(textCol,
                if (hygiene.lineDedup) graft.functions.LineDedup.of(cleanText)
                else cleanText)
          val frame = hygiene.blocklist match {
            case Some(words) =>
              scanFiltered.filter(QualityFilters.blocklistKeep(col(textCol), words))
            case None => scanFiltered
          }
          val df = store match {
            case Some(st) =>
              // side JSON FIRST: a crash between the two writes then
              // leaves counts without a _SUCCESS-committed frame — the
              // next run recomputes the stage and overwrites both.
              // The reverse order would leave a committed frame whose
              // resume fails hard on the missing side file.
              st.writeSide("scan", counts :+ ("__input" -> inputN))
              staged("scan filter")(st.write("scan", frame))
            case None => stageCp(frame)
          }
          (df, inputN, counts)
      }

    var ledger = Vector.newBuilder[(String, Long)]
    ledger ++= scanCounts
    hygiene.blocklist.foreach { _ =>
      ledger += ("blocklist" -> staged("blocklist")(scanKept.count()))
    }

    // ---- soft quality: score-proportional keep, the probabilistic
    // alternative to the verdict kernel's hard minQuality floor —
    // placed FIRST so no dedup stage pays for documents the soft
    // filter was going to drop anyway ---------------------------------
    val softKept = hygiene.softQuality match {
      case Some(sq) =>
        val (kept, n) = stageOut("soft_quality", "soft quality") {
          Sampling.softSample(scanKept, idCol,
            TextAnalysis.qualityScore(col(textCol)),
            sq.pivot, sq.sharpness, sq.seed).drop("keep_prob")
        }
        ledger += ("soft_quality" -> n)
        kept
      case None => scanKept
    }

    // ---- URL dedup: one map-side-combined group + a semi join --------
    val urlKept = hygiene.urlCol match {
      case Some(u) =>
        // checkpointed (stageOut): the next stage (exactDedup) consumes
        // its input TWICE (fingerprint groupBy + the keeper semi join),
        // and this frame carries a union, a join and the URL-
        // canonicalization regex chain — without materialization all
        // of it executes twice
        val (kept, n) = stageOut("url_dup", "url dedup") {
          // rows with no usable URL (null or empty after
          // canonicalization) pass through untouched: grouping them
          // would collapse every URL-less document into ONE group and
          // silently delete all but one unrelated page
          val canon = QualityFilters.canonicalizeUrl(col(u))
          val usable = col(u).isNotNull && length(canon) > 0
          val keepers = QualityFilters.dedupByUrl(softKept.filter(usable), u, idCol)
            .select(col("keep_id").as(idCol))
          softKept.filter(!usable)
            .unionByName(softKept.filter(usable).join(keepers, Seq(idCol), "left_semi"))
        }
        ledger += ("url_dup" -> n)
        kept
      case None => softKept
    }

    // ---- image near-dup dedup: 8-byte perceptual-hash key, the
    // multimodal sibling of URL dedup (cheap key first — a mirror
    // page re-serving the same hero image dies here before the text
    // machinery pays for it); hashless rows pass through exactly like
    // URL-less rows above ------------------------------------------------
    val imgKept = hygiene.imageDup match {
      case Some(ic) =>
        val (kept, n) = stageOut("image_dup", "image dedup") {
          val withHash = urlKept.filter(col(ic.hashCol).isNotNull)
          val pairs = Dedup.hammingPairs64(
            withHash.select(col(idCol), col(ic.hashCol)), idCol, ic.hashCol,
            ic.maxHamming, ic.bands, ic.maxBucket)
          urlKept.filter(col(ic.hashCol).isNull)
            .unionByName(Dedup.dedupByPairs(withHash, idCol, pairs))
        }
        ledger += ("image_dup" -> n)
        kept
      case None => urlKept
    }

    // ---- corpus-level boilerplate line removal -----------------------
    // BEFORE exact dedup: two mirror pages differing only in their nav
    // menus become byte-identical once the menus are stripped, so the
    // cheap hash dedup catches them. stripBoilerplate caches its own
    // (id, pos, fingerprint) frame internally (tracked); the rewritten
    // corpus is cached here because exact dedup consumes it twice.
    val boilKept = hygiene.boilerplate match {
      case Some(bc) =>
        val (kept, n) = stageOut("boilerplate", "boilerplate strip") {
          val stripped = Dedup.stripBoilerplate(imgKept, idCol, textCol, bc.maxDocFreq)
          if (bc.dropEmptied) stripped.filter(length(trim(col(textCol))) > 0)
          else stripped
        }
        ledger += ("boilerplate" -> n)
        kept
      case None => imgKept
    }

    // ---- exact content dedup -----------------------------------------
    val (exactKept, afterExact) = stageOut("exact_dup", "exact dedup")(
      Dedup.exactDedup(boilKept, textCol, idCol))
    ledger += ("exact_dup" -> afterExact)

    // ---- C4 cross-document span dedup --------------------------------
    // AFTER exact dedup (whole-document duplicates are gone for one
    // cheap shuffle; the span machinery then only pays for partial
    // overlaps). Rewrites text, so it must precede the LM scoring
    // stages — scores should describe the text that survives.
    val spanKept = hygiene.spanDedup match {
      case Some(sp) =>
        val (kept, n) = stageOut("span_dup", "span dedup") {
          val deduped = Dedup.spanDedup(exactKept, idCol, textCol, sp.span)
          if (sp.dropEmptied) deduped.filter(length(trim(col(textCol))) > 0)
          else deduped
        }
        ledger += ("span_dup" -> n)
        kept
      case None => exactKept
    }

    // ---- ExactSubstr duplicate-passage removal -----------------------
    // the token-window complement of span dedup, same position in the
    // pipeline for the same reasons (post exact dedup, pre LM scoring)
    val substrKept = hygiene.exactSubstr match {
      case Some(es) =>
        val (kept, n) = stageOut("exact_substr", "exactsubstr dedup") {
          val deduped = Dedup.exactSubstrDedup(spanKept, idCol, textCol, es.k)
          if (es.dropEmptied) deduped.filter(length(trim(col(textCol))) > 0)
          else deduped
        }
        ledger += ("exact_substr" -> n)
        kept
      case None => spanKept
    }

    // ---- CCNet unigram bucketing (post-dedup, approx scale path) -----
    val uniKept = hygiene.unigram match {
      case Some(u) =>
        val (kept, n) = stageOut("unigram", "unigram buckets") {
          // cached: qualityBucketsApprox's approxQuantile is an eager
          // action over the scored frame, and the bucket filter below
          // consumes it AGAIN — without the cache the corpus-scale LM
          // scoring plan executes twice per stage
          val scored = cacheTracked(
            QualityFilters.unigramLogProbs(substrKept, idCol, textCol, u.model))
          val bucketed = QualityFilters.qualityBucketsApprox(
            scored, buckets = u.buckets, relErr = u.relErr)
          val keepIds = bucketed.filter(col("quality_bucket") <= u.keepBuckets)
            .select(col(idCol))
          substrKept.join(keepIds, Seq(idCol), "left_semi")
        }
        ledger += ("unigram" -> n)
        kept
      case None => substrKept
    }

    // ---- bigram LM perplexity bucketing (the CCNet scoring model
    // proper; also post-dedup) ------------------------------------------
    val lmKept = hygiene.bigram match {
      case Some(b) =>
        val (kept, n) = stageOut("bigram", "bigram buckets") {
          val model = b.model.getOrElse(
            QualityFilters.bigramModel(uniKept, textCol, b.minCount))
          // same double-execution guard as the unigram stage above
          val scored = cacheTracked(QualityFilters.bigramLogProbs(
            uniKept, idCol, textCol, Some(model), b.alpha))
          val bucketed = QualityFilters.qualityBucketsApprox(
            scored, buckets = b.buckets, relErr = b.relErr)
          val keepIds = bucketed.filter(col("quality_bucket") <= b.keepBuckets)
            .select(col(idCol))
          uniKept.join(keepIds, Seq(idCol), "left_semi")
        }
        ledger += ("bigram" -> n)
        kept
      case None => uniKept
    }

    // ---- classifier quality stage (post-dedup, with the other
    // statistical quality stages): train on bounded frames, score the
    // survivors scan-side through the bucket kernel ------------------
    val clsKept = hygiene.classifier match {
      case Some(cc) =>
        val (kept, n) = stageOut("classifier", "classifier filter") {
          val model = cc.model.getOrElse {
            val negatives = Sampling.hashSample(lmKept, idCol, cc.negativeRate)
            staged("classifier fit")(QualityClassifier.train(
              cc.positives.get, negatives, textCol, cc.buckets))
          }
          QualityClassifier.filterByQuality(lmKept, model, cc.minProb, textCol)
        }
        ledger += ("classifier" -> n)
        kept
      case None => lmKept
    }

    // ---- benchmark decontamination ------------------------------------
    // a cheap broadcast anti-join (train side never shuffles) that
    // shrinks the input to the expensive pair-generating stages below
    val decontKept = hygiene.decontaminate match {
      case Some(dc) =>
        val (kept, n) = stageOut("contaminated", "decontaminate")(
          // bloom: the eval-set-past-broadcast-size path — train
          // shingles filter scan-side, only suspects join (results
          // bit-identical either way)
          if (dc.bloom)
            Dedup.decontaminateBloom(clsKept, dc.eval, idCol, textCol, dc.n)
          else Dedup.decontaminate(
            clsKept, dc.eval, idCol, textCol, dc.n, dc.broadcastEval))
        ledger += ("contaminated" -> n)
        kept
      case None => clsKept
    }

    // ---- near-dup dedup: the expensive stage runs over the smallest
    // surviving frame ---------------------------------------------------
    def nearDeduped: DataFrame = {
      val pairs = nearDup match {
        case NearDup.NgramExact =>
          Dedup.ngramJaccardPairs(decontKept, idCol, textCol,
            shingleSize, nearDupThreshold)
        case NearDup.MinhashLsh =>
          val (k, bands) = Dedup.lshParamsFor(nearDupThreshold)
          Dedup.minhashJaccardPairs(decontKept, idCol, textCol,
            k = k, bands = bands, n = shingleSize, threshold = nearDupThreshold,
            hasher = hasher)
      }
      nearDupKeepCol match {
        case Some(sc) => Dedup.dedupByPairsBest(decontKept, idCol, pairs, col(sc))
        case None     => Dedup.dedupByPairs(decontKept, idCol, pairs)
      }
    }

    // ---- SemDeDup: paraphrase-level dedup over the embedding column —
    // it sees only what every lexical stage kept ------------------------
    val preSelect = hygiene.semDedup match {
      case Some(sd) =>
        // the near-dup survivors feed clustering, the pair join AND the
        // final dedup — checkpoint them (the None branch keeps the
        // historic count-then-return shape instead: one extra tail
        // execution, no corpus-scale materialization — unless DSIR
        // follows, whose fit + scoring re-read the frame)
        val (nd, nN) = stageOut("near_dup", "near-dup dedup")(nearDeduped)
        ledger += ("near_dup" -> nN)
        val (kept, n) = stageOut("semantic_dup", "semantic dedup")(
          Similarity.semDedup(nd, idCol, sd.vecCol,
            sd.threshold, sd.nlist, sd.refineIters,
            sd.keepFarthestFromCentroid, sd.maxCluster))
        ledger += ("semantic_dup" -> n)
        kept
      case None =>
        store match {
          case Some(_) =>
            val (nd, nN) = stageOut("near_dup", "near-dup dedup")(nearDeduped)
            ledger += ("near_dup" -> nN)
            nd
          case None =>
            val nd =
              if (hygiene.dsir.isDefined) stageCp(nearDeduped) else nearDeduped
            ledger += ("near_dup" -> staged("near-dup dedup")(nd.count()))
            nd
        }
    }

    // ---- Per-domain quota: cap each domain at its k best survivors —
    // after every dedup (capacity is not spent on duplicates), before
    // DSIR selection (the target draw sees the capped mixture) --------
    val preDsir = hygiene.domainCap match {
      case Some(cap) =>
        val (kept, n) = stageOut("domain_capped", "domain cap")(
          Sampling.bestKPerStratum(preSelect, cap.stratumCol,
            cap.orderCol, cap.k, idCol))
        ledger += ("domain_capped" -> n)
        kept
      case None => preSelect
    }

    // ---- DSIR target selection: last of all — the distributions fit
    // on (and the draw selects from) exactly the surviving corpus -----
    val curated = hygiene.dsir match {
      case Some(dc) =>
        val (kept, n) = stageOut("dsir_selected", "dsir selection") {
          val scored = staged("dsir fit")(Dsir.importanceWeights(
            preDsir, dc.target, textCol, dc.buckets, dc.alpha))
          Dsir.resampleTopK(scored, dc.k, idCol,
              seed = dc.seed, temperature = dc.temperature)
            .drop("dsir_logw", "dsir_key")
        }
        ledger += ("dsir_selected" -> n)
        kept
      case None => preDsir
    }

    // the tracked caches deliberately stay resident: unpersisting any
    // of them here would make the CacheManager REBUILD dependent
    // entries mid-pipeline. The caller releases them AFTER consuming
    // df, via CurationResult.release(); the stage checkpoints are
    // GC-reclaimed (see CurationResult doc).
    CurationResult(curated, CurationStats(input, ledger.result()),
      tracked.result())
    }
  }
}
