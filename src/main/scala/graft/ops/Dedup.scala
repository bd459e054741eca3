package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact (hash-groupBy),
  * MinHash+LSH banding, n-gram Jaccard, and embedding-cosine near-dup
  * (via [[Similarity]]).
  *
  * Scale notes (the interesting part at 100 TB):
  *  - exact dedup is ONE shuffle on the fingerprint; partial
  *    aggregation (map-side combine) collapses duplicates before the
  *    exchange, so shuffle volume ~ distinct docs, not total docs.
  *  - MinHash/LSH replaces the O(n²) pair space with band-bucket
  *    joins: shuffle keyed on (band index, band hash). Hot buckets are
  *    bounded by `maxBucket` — the classic guard against a degenerate
  *    bucket producing |bucket|² candidate pairs on one executor.
  *  - n-gram Jaccard's shared-shingle join explodes on stop-shingles;
  *    `maxDf` drops shingles occurring in more than that many docs
  *    (an IDF cut), which is what keeps the join linear-ish in corpus
  *    size.
  */
object Dedup {

  /** See [[graft.util.Caching.cacheOnce]]: a second query over the
    * same corpus with the same parameters reuses the first query's
    * InMemoryRelation instead of re-issuing `cache()`. */
  private[ops] def cacheOnce(df: DataFrame): DataFrame = graft.util.Caching.cacheOnce(df)

  /** Distinct word n-grams ("shingles") of a text column. Guarded for
    * texts shorter than n words (Spark's `sequence(1, k)` would count
    * DOWN for k < 1). */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.Shingles.shingles(text, n)

  /** The pre-kernel SQL formulation of [[shingles]] — kept for the
    * equivalence pin in ExtensionsSpec. Re-tokenizes per element_at
    * lambda call (no CSE inside lambdas): ~20x slower, do not use in
    * operators. */
  private[graft] def shinglesSql(text: Column, n: Int): Column = {
    val w = split(trim(text), "\\s+")
    val grams = transform(
      sequence(lit(1), size(w) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j))): _*))
    when(size(w) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Exact duplicate groups keyed on a fingerprint of `textCol`:
    * (fingerprint, keep_id = min id, n_dups). One shuffle, map-side
    * combined. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep exactly one row (min id) per distinct text. Implemented as a
    * semi-join against the winner ids rather than a global window —
    * the winner frame is one narrow column (and already aggregated),
    * so the semi-join shuffles ids, not documents. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.join(
      exactGroups(df, textCol, idCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Incremental exact dedup for a recurring corpus refresh: drop new
    * documents whose fingerprint already exists in `store` (the
    * fingerprint set of everything ingested in previous batches) and
    * keep one winner (min id) per fingerprint WITHIN the new batch.
    * Returns the surviving rows of `df` with their original columns.
    *
    * Plan shape: batch winners are one map-side-combined shuffle;
    * the store is anti-joined on the fingerprint key and deliberately
    * NOT broadcast-hinted — at 100 TB of history the store is itself
    * large, and the join keys are hashes, so both sides hash-partition
    * evenly (persist the store bucketed by `fingerprint` to make the
    * refresh exchange-free on the store side). The final semi-join
    * carries ids only, never document payloads. */
  def incrementalDedup(df: DataFrame, store: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      storeFpCol: String = "fingerprint"): DataFrame = {
    val winners = df
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
    val fresh = winners
      .join(store.select(col(storeFpCol).as("__fp")), Seq("__fp"), "left_anti")
    df.join(fresh.select(idCol), Seq(idCol), "left_semi")
  }

  /** The store delta for [[incrementalDedup]]: distinct fingerprints
    * of a (surviving) batch, to append to the store for the next
    * refresh. */
  def fingerprintStore(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint")).distinct()

  /** [[incrementalDedup]] with a Bloom pre-filter over the store —
    * bit-identical results (the shared oracle row pins it), different
    * plan at 100 TB of history. The plain path hash-partitions BOTH
    * sides of the batch-vs-store anti-join; here the batch winners are
    * probed scan-side against a [[Bloom]] filter of the store's
    * fingerprints, and because a Bloom filter has no false negatives,
    * every `mightContain = false` winner is PROVEN fresh with no join
    * at all. Only the suspects (true dups + an fpp fraction of false
    * positives — batch-sized at worst, typically tiny) reach the exact
    * check, which runs as a broadcast semi-join INTO the store: the
    * history is scanned once and never shuffled, whatever its layout.
    *
    * Pass `bloom` (built once via [[Bloom.build]] over the store's
    * fingerprint column, persisted with [[Bloom.save]], appended to
    * with [[Bloom.merge]] as the store grows) to skip the build scan;
    * omitted, it is built here from `store` (one extra scan +
    * count — still cheaper than shuffling the store whenever the
    * batch is much smaller than history, which is what "incremental"
    * means). Null-fingerprint winners (null text) take the fresh path,
    * exactly like the anti-join's null-never-matches semantics. */
  def incrementalDedupBloom(df: DataFrame, store: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      storeFpCol: String = "fingerprint",
      bloom: Option[Array[Byte]] = None, fpp: Double = 0.03): DataFrame = {
    val winners = cacheOnce(df
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol)))
    val bytes = bloom.getOrElse {
      val n = math.max(1L, store.count())
      Bloom.build(store, col(storeFpCol), n, fpp)
    }
    // broadcast, never a literal: the filter is store-sized (MBs to
    // hundreds of MBs) and must ship once per executor, not once per task
    val bc = Bloom.broadcastFilter(df.sparkSession, bytes)
    val suspects = winners
      .filter(coalesce(Bloom.mightContain(bc, col("__fp")), lit(false)))
      .select("__fp")
    // which suspects ARE in the store: history scanned once, suspects
    // broadcast — no exchange on the store side regardless of its size
    val hits = store.select(col(storeFpCol).as("__fp"))
      .join(broadcast(suspects), Seq("__fp"), "left_semi").distinct()
    val fresh = winners.join(broadcast(hits), Seq("__fp"), "left_anti")
    df.join(fresh.select(idCol), Seq(idCol), "left_semi")
  }

  /** Per-batch-document best MinHash-estimated Jaccard against a
    * prior-corpus signature store — the candidate-generation half of
    * [[incrementalNearDedup]]. LSH banding on BOTH sides means only
    * same-bucket (batch, store) pairs are ever compared: the store is
    * signature-sized (one row per historical doc), both sides shuffle
    * on the (band, bucket) key, and `maxBucket` caps degenerate
    * buckets on each side independently. Returns (idCol, best_est);
    * batch docs with no bucket collision are absent (no evidence of
    * near-duplication). */
  def nearDupStoreHits(batchSigs: DataFrame, storeSigs: DataFrame,
      idCol: String = "doc_id", k: Int = 16, bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    // both signature frames feed TWO consumers (bucketing + the
    // estimation join) — cacheOnce them so the k-hashes-per-shingle
    // signature pass runs once per side, not twice (measured 3x on
    // the contract query at sf0.1)
    val bSigs = cacheOnce(batchSigs)
    val sSigs = cacheOnce(storeSigs)
    val cands = boundedBuckets(bSigs, idCol, k, bands, maxBucket)
      .select(col("band"), col("bucket"), col(idCol).as("__ba"))
      .join(boundedBuckets(sSigs, idCol, k, bands, maxBucket)
        .select(col("band"), col("bucket"), col(idCol).as("__sb")),
        Seq("band", "bucket"))
      .select("__ba", "__sb").distinct()
    cands
      .join(bSigs.select(col(idCol).as("__ba"), col("sig").as("__siga")), "__ba")
      .join(sSigs.select(col(idCol).as("__sb"), col("sig").as("__sigb")), "__sb")
      .groupBy(col("__ba").as(idCol))
      .agg(max(
        size(filter(zip_with(col("__siga"), col("__sigb"), (x, y) => x === y), p => p))
          .cast("double") / k).as("best_est"))
  }

  /** Incremental NEAR-dup dedup, the fuzzy sibling of
    * [[incrementalDedup]]: drop batch documents whose estimated
    * Jaccard against ANY prior-corpus document reaches `threshold`
    * (via [[nearDupStoreHits]]), then near-dedup the survivors against
    * each other with the standard LSH pair + connected-components
    * path. The store is a persisted [[signatures]] frame
    * ([[saveSignatureStore]] / [[loadSignatureStore]]); append the
    * survivors' signatures after each refresh. Returns surviving batch
    * rows with their original columns. */
  def incrementalNearDedup(batch: DataFrame, storeSigs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 16, bands: Int = 4, n: Int = 3, threshold: Double = 0.5,
      hasher: (Column, Int) => Column = md5Hash,
      maxBucket: Int = 1000): DataFrame = {
    val batchSigs = cacheOnce(signatures(batch, idCol, textCol, k, n, hasher))
    val hits = nearDupStoreHits(batchSigs, storeSigs, idCol, k, bands, maxBucket)
      .filter(col("best_est") >= threshold)
      .select(idCol)
    val fresh = batch.join(hits, Seq(idCol), "left_anti")
    // intra-batch pairs reuse the CACHED batch signatures (semi-joined
    // down to the survivors) — recomputing them from text would pay
    // the k-hashes-per-shingle pass a second time for ~the whole batch
    val freshSigs = batchSigs.join(fresh.select(idCol), Seq(idCol), "left_semi")
    val pairs = minhashJaccardPairsFromSigs(freshSigs, idCol, k, bands,
      threshold, maxBucket)
    dedupByPairs(fresh, idCol, pairs)
  }

  /** Persist a [[signatures]] frame as the near-dup store. The sig
    * column is normalized to array<string> like the other stores; the
    * id column keeps ITS OWN type — casting it (say, to long) would
    * silently null out string ids (UUIDs, URL hashes) and turn every
    * later store join into a no-op. */
  def saveSignatureStore(sigs: DataFrame, idCol: String, path: String): Unit =
    sigs.select(col(idCol),
        col("sig").cast("array<string>").as("sig"))
      .write.mode("overwrite").parquet(path)

  /** Load a persisted signature store, validating the contract. */
  def loadSignatureStore(spark: org.apache.spark.sql.SparkSession,
      idCol: String, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(Set(idCol, "sig").subsetOf(df.columns.toSet),
      s"signature store at $path must have ($idCol, sig) columns, " +
        s"found: ${df.columns.mkString(", ")}")
    df.select(col(idCol), col("sig").cast("array<string>").as("sig"))
  }

  /** Sentence segmentation for [[spanDedup]]: maximal runs ending in
    * terminal punctuation, trimmed, empties dropped. Deliberately
    * lookaround-free so the DuckDB oracle replays it with the same
    * regex. Trailing text without a terminator is not a sentence (C4's
    * "end in terminal punctuation" rule, Raffel et al. 2020 §2.2). */
  def spanSentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit("[^.!?]+[.!?]"), lit(0)),
        s => trim(s)),
      s => length(s) > 0)

  /** C4's corpus-wide span rule (Raffel et al. 2020 §2.2): any run of
    * `span` consecutive sentences occurring more than once in the
    * corpus survives only at its first occurrence — min (id, start),
    * matching C4's keep-one semantics deterministically — and every
    * other occurrence has those sentences deleted; documents are then
    * reassembled from the surviving sentences (single-space joined,
    * which also normalizes inter-sentence whitespace for untouched
    * docs).
    *
    * Scale shape: span hashes are md5 over the whitespace-normalized
    * lowercased span, so the wide text column never shuffles — only
    * (id, start, hash) rows do. The winner aggregation is the
    * [[exactGroups]] shape (one map-side-combined shuffle on the
    * hash); hashes seen once are dropped BEFORE the probe join, so at
    * corpus scale the join's build side holds only actually-duplicated
    * spans; removed-index sets ride a second narrow aggregation keyed
    * on id. No all-pairs path exists at any size. */
  def spanDedup(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", span: Int = 3): DataFrame = {
    require(span >= 1, s"spanDedup wants span >= 1, got $span")
    val sents = col("__sents")
    val withSents = df.withColumn("__sents", spanSentences(col(textCol)))
    val spanHashes = withSents.select(col(idCol),
      posexplode(
        when(size(sents) >= span,
          transform(sequence(lit(0), size(sents) - span),
            i => md5(lower(regexp_replace(
              array_join(slice(sents, i + 1, lit(span)), " "),
              "\\s+", " ")))))
        .otherwise(array().cast("array<string>")))
        .as(Seq("__start", "__h")))
    // count-first, same rationale as [[exactSubstrDedup]]: the
    // corpus-wide aggregation stays a hash-aggregable long count; the
    // SortAggregate-only min(struct) winner choice runs over just the
    // duplicated span occurrences
    val dupHashes = spanHashes.groupBy("__h")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select("__h")
    val dupSpans = cacheOnce(spanHashes.join(dupHashes, "__h"))
    val winners = dupSpans.groupBy("__h")
      .agg(min(struct(col(idCol), col("__start"))).as("__w"))
    val removed = dupSpans.join(winners, "__h")
      .filter(struct(col(idCol), col("__start")) =!= col("__w"))
      .select(col(idCol),
        explode(sequence(col("__start"), col("__start") + (span - 1)))
          .as("__ridx"))
      .groupBy(idCol).agg(collect_set("__ridx").as("__removed"))
    withSents.join(removed, Seq(idCol), "left")
      .withColumn(textCol, array_join(
        filter(sents, (s, i) => !array_contains(
          coalesce(col("__removed"), array().cast("array<int>")), i)),
        " "))
      .drop("__sents", "__removed")
  }

  // ---- corpus-level boilerplate line removal -------------------------

  /** Normalized line fingerprint shared by [[boilerplateLines]] and
    * [[stripBoilerplate]]: md5 of the lowercased, whitespace-collapsed
    * trimmed line (the [[TextAnalysis.fingerprint]] normal form at
    * line granularity). */
  private def lineFingerprint(line: Column): Column =
    md5(regexp_replace(lower(trim(line)), "\\s+", " "))

  /** (line fingerprints, example text, doc frequency) of lines whose
    * normalized form appears in MORE than `maxDocFreq` distinct
    * documents — nav menus, cookie banners, footers: the
    * RefinedWeb-style cross-document boilerplate signal (per-document
    * repetition is [[graft.ops.QualityFilters.repetitionFilter]]'s
    * territory). One distinct + one map-side-combined count; blank
    * lines never count. */
  def boilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, s"boilerplateLines wants maxDocFreq >= 1, got $maxDocFreq")
    df.select(col(idCol), explode(split(col(textCol), "\n")).as("__l"))
      .filter(length(trim(col("__l"))) > 0)
      .select(col(idCol), col("__l"), lineFingerprint(col("__l")).as("line_fp"))
      .groupBy(col("line_fp"))
      .agg(count_distinct(col(idCol)).as("n_docs"), min(col("__l")).as("example"))
      .filter(col("n_docs") > maxDocFreq)
      .select("line_fp", "example", "n_docs")
  }

  /** Remove corpus-level boilerplate lines from EVERY document: any
    * non-blank line whose normalized form exceeds `maxDocFreq`
    * distinct documents is dropped; blank lines and everything else
    * keep their order. Reassembly follows the [[spanDedup]] shape —
    * only the REMOVED (doc, position) pairs shuffle, never document
    * payloads; the boilerplate fingerprint set is tiny by construction
    * (each surviving fingerprint is shared by >maxDocFreq docs). */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, s"stripBoilerplate wants maxDocFreq >= 1, got $maxDocFreq")
    val lines = col("__lines")
    val withLines = df.withColumn("__lines", split(col(textCol), "\n"))
    // ONE explode+fingerprint of the text column feeds BOTH the corpus
    // frequency aggregation and the removed-position probe. cacheOnce:
    // the two consumers would otherwise each re-read and re-hash the
    // whole corpus (a full extra 100 TB scan per call). The cached
    // frame is (id, pos, fp) — fingerprint-narrow, a fraction of the
    // text it derives from, and spills to disk under pressure. Inside
    // [[graft.ops.Curation.curate]] the cache is owned and released by
    // CurationResult; standalone callers keep one narrow resident
    // entry (LRU-evicted) per distinct input plan.
    val positioned = cacheOnce(withLines.select(col(idCol),
      posexplode(lines).as(Seq("__pos", "__l")))
      .filter(length(trim(col("__l"))) > 0)
      .select(col(idCol), col("__pos"), lineFingerprint(col("__l")).as("line_fp")))
    val boiler = positioned.groupBy("line_fp")
      .agg(count_distinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > maxDocFreq)
      .select("line_fp")
    val removed = positioned.join(boiler, "line_fp")
      .groupBy(idCol).agg(collect_set("__pos").as("__removed"))
    withLines.join(removed, Seq(idCol), "left")
      .withColumn(textCol, array_join(
        filter(lines, (l, i) => !array_contains(
          coalesce(col("__removed"), array().cast("array<int>")), i)),
        "\n"))
      .drop("__lines", "__removed")
  }

  /** WITHIN-document duplicate-line removal (the per-document leg of
    * line hygiene — Dolma/RefinedWeb apply it before any corpus-level
    * pass): every repeated non-blank line keeps only its FIRST
    * occurrence inside the document; blank lines keep the document's
    * structure and are never deduped. Exact line equality — the
    * corpus-level normalized-fingerprint rule is
    * [[stripBoilerplate]]'s job.
    *
    * Entirely scan-side: ONE codegen'd kernel call per row
    * ([[graft.functions.LineDedup]] — split, seen-set filter, rejoin
    * in a single O(lines) pass), NO shuffle, NO join — the cheapest
    * possible place in a pipeline, which is why it runs first in
    * hygiene stacks. */
  def dedupLinesInDoc(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, graft.functions.LineDedup.of(col(textCol)))

  // ---- ExactSubstr duplicate-passage removal -------------------------

  /** ExactSubstr-style duplicate-passage removal (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): any
    * run of `k` consecutive whitespace tokens occurring more than once
    * in the corpus survives only at its FIRST occurrence — min
    * (id, start), deterministic — and every other occurrence has the
    * covered tokens deleted; documents are reassembled from their
    * surviving tokens (single-space joined, which also normalizes
    * intra-document whitespace for untouched docs, mirroring
    * [[spanDedup]]'s reassembly). Unlike [[spanDedup]] this assumes no
    * sentence terminators, so duplicated code, tables, chat logs and
    * other punctuation-free passages are caught.
    *
    * Scale shape mirrors [[spanDedup]]: only (id, start, window-hash)
    * rows shuffle — the wide text column never does; hashes seen once
    * are dropped BEFORE the probe join, so the join's build side holds
    * only actually-duplicated windows; removed-index sets ride a
    * second narrow aggregation keyed on id. The paper's suffix array
    * is a single-machine construction; the stride-1 sliding-window
    * hash join is its shuffle-native equivalent for runs >= k (what
    * the paper removes), at O(tokens) shuffled rows.
    *
    * The default window hash is the one-pass rolling kernel
    * ([[graft.functions.WindowHash]]): O(tokens) long arithmetic,
    * 8-byte hashes on the wire, identical results modulo its
    * documented 2^-64 window-collision rate. `portableHash = true`
    * switches to md5 over the lowercased space-joined run — O(tokens
    * x k) and ~3.5x slower end-to-end — byte-replayable in DuckDB
    * (the q_exactsubstr oracle path) and collision-free in practice. */
  def exactSubstrDedup(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 20,
      portableHash: Boolean = false): DataFrame = {
    require(k >= 1, s"exactSubstrDedup wants k >= 1, got $k")
    val toks = col("__toks")
    // ws_tokens kernel == filter(split(trim(text), "\\s+"), len > 0)
    // (PropertySpec-pinned) but codegen'd: this projection runs over
    // the corpus THREE times (window pass, probe pass, reassembly)
    val withToks = df.withColumn("__toks",
      graft.functions.WsTokens.of(col(textCol)))
    val windowHash =
      if (portableHash)
        when(size(toks) >= k,
          transform(sequence(lit(0), size(toks) - k),
            i => md5(lower(array_join(slice(toks, i + 1, lit(k)), " ")))))
          .otherwise(array().cast("array<string>"))
      else graft.functions.WindowHash.of(toks, k)
    val winHashes = withToks.select(col(idCol),
      posexplode(windowHash).as(Seq("__start", "__h")))
    // count-first: Spark can only SortAggregate a min(struct(...)) —
    // struct buffers aren't hash-aggregable — which at corpus scale
    // means SORTING every window occurrence. The count aggregation is
    // a pure long buffer (HashAggregate, map-side combined), shrinks
    // to just the duplicated hashes, and the order-sensitive
    // winner min runs over ONLY those occurrences (cached: the same
    // small frame feeds the winner agg and the removal probe).
    val dupHashes = winHashes.groupBy("__h")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select("__h")
    val dupWins = cacheOnce(winHashes.join(dupHashes, "__h"))
    val winners = dupWins.groupBy("__h")
      .agg(min(struct(col(idCol), col("__start"))).as("__w"))
    val removed = dupWins.join(winners, "__h")
      .filter(struct(col(idCol), col("__start")) =!= col("__w"))
      .select(col(idCol),
        explode(sequence(col("__start"), col("__start") + (k - 1)))
          .as("__ridx"))
      .groupBy(idCol).agg(collect_set("__ridx").as("__removed"))
    withToks.join(removed, Seq(idCol), "left")
      .withColumn(textCol, array_join(
        filter(toks, (t, i) => !array_contains(
          coalesce(col("__removed"), array().cast("array<int>")), i)),
        " "))
      .drop("__toks", "__removed")
  }

  /** Portable per-shingle hash: lexicographic min over
    * `md5(seed:shingle)` strings. Identical in DuckDB — used by the
    * oracle-checked queries. */
  val md5Hash: (Column, Int) => Column =
    (shingle, seed) => md5(concat(lit(s"$seed:"), shingle))

  /** Fast numeric variant for production scale. Both built-in hashers
    * are `val`s so [[minhashSignatureFromShingles]] can recognize them
    * by reference and dispatch to the one-pass signature kernel. */
  val xxHash: (Column, Int) => Column =
    (shingle, seed) => xxhash64(lit(seed), shingle)

  /** MinHash signature from an ALREADY-PROJECTED shingle array column:
    * array of k per-seed minima. Computed entirely inside the row (no
    * shuffle; codegen'd higher-order functions). Take the shingle
    * column, not the text — referencing `shingles(text)` here would
    * clone that subtree k times. */
  def minhashSignatureFromShingles(sh: Column, k: Int = 16,
      hasher: (Column, Int) => Column = md5Hash): Column =
    // the two built-in hashers run as ONE codegen'd kernel pass (the
    // k-HOF Column formulation is interpreted per element and measured
    // ~10x slower at k=60 — see functions/MinHashSig.scala); custom
    // hashers keep the general formulation
    if (hasher eq md5Hash) graft.functions.MinHashSig.md5SigOf(sh, k)
    else if (hasher eq xxHash) graft.functions.MinHashSig.xxSigOf(sh, k)
    else array((0 until k).map(seed => array_min(transform(sh, s => hasher(s, seed)))): _*)

  /** Convenience single-column form — only for ad-hoc use on narrow
    * data; the df-level operators project shingles first. */
  def minhashSignature(text: Column, k: Int = 16, n: Int = 3,
      hasher: (Column, Int) => Column = md5Hash): Column =
    minhashSignatureFromShingles(shingles(text, n), k, hasher)

  /** LSH band buckets: split the k-length signature into `bands` bands
    * of k/bands rows; one output row per (doc, band) with the band's
    * bucket hash.
    *
    * The signature is materialized as a projected column FIRST and the
    * band hashes reference that column — inlining the signature
    * expression once per band would multiply an already-wide expression
    * tree by `bands` and blow up Catalyst/codegen time.
    */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3,
      hasher: (Column, Int) => Column = md5Hash): DataFrame =
    lshBucketsFromSigs(signatures(df, idCol, textCol, k, n, hasher), idCol, k, bands)

  /** (id, sig) signature frame — compute ONCE and share between
    * bucketing and estimation; the signature is the expensive part
    * (k hashes per shingle).
    *
    * `hasher` dispatches to the one-pass codegen'd kernel by REFERENCE
    * equality on [[md5Hash]]/[[xxHash]]: pass those `val`s themselves.
    * An eta-expanded or wrapped-but-identical lambda silently takes
    * the interpreted k-HOF path (~10x slower at k=60) — a custom
    * hasher is assumed to MEAN custom semantics, so there is no
    * content-based detection. */
  def signatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, n: Int = 3,
      hasher: (Column, Int) => Column = md5Hash): DataFrame =
    df.select(col(idCol), shingles(col(textCol), n).as("__sh"))
      .select(col(idCol), minhashSignatureFromShingles(col("__sh"), k, hasher).as("sig"))

  /** Pick (k, bands) for a target Jaccard threshold: among signature
    * sizes up to `maxK` and their divisors, minimize the S-curve's
    * miss+false-positive mass around `threshold` — the integral of
    * 1 - P(collide | j) for j above the threshold (misses) plus
    * P(collide | j) below it (false candidates), where
    * P(collide | j) = 1 - (1 - j^rows)^bands. This is the standard
    * banding calibration (Mining of Massive Datasets §3.4); callers
    * who hand-pick stay on the explicit-parameter overloads. */
  def lshParamsFor(threshold: Double, maxK: Int = 64): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    val steps = 200
    def cost(k: Int, bands: Int): Double = {
      val rows = k / bands
      (1 to steps).map { i =>
        val j = i.toDouble / (steps + 1)
        val p = 1.0 - math.pow(1.0 - math.pow(j, rows.toDouble), bands.toDouble)
        if (j >= threshold) (1.0 - p) else p
      }.sum / steps
    }
    val cands = for {
      k <- 4 to maxK
      bands <- 1 to k if k % bands == 0
    } yield (k, bands)
    // ties (same cost) break toward the SMALLEST signature: k is the
    // per-shingle hash bill, the dominant cost of the whole pipeline
    cands.minBy { case (k, b) => (cost(k, b), k, b) }
  }

  def lshBucketsFromSigs(sigs: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val rows = k / bands
    val banded = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", slice(col("sig"), b * rows + 1, rows))).as("bucket"))
    }
    // a shingle-less doc's signature is [null × k] (array_min of an
    // empty transform is null for every seed — first element null iff
    // ALL are); concat_ws skips nulls, so every such doc would land in
    // the md5("") bucket of every band and generate up to maxBucket²
    // spurious candidate pairs. No shingles = no similarity evidence:
    // drop them from bucketing entirely (the DuckDB replays do the
    // same via their `len(w) >= n` guard).
    sigs.filter(element_at(col("sig"), 1).isNotNull)
      .select(col(idCol), explode(array(banded: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** The shared degenerate-bucket guard: band buckets capped at
    * `maxBucket` members per (band, bucket). */
  private def boundedBuckets(sigs: DataFrame, idCol: String, k: Int,
      bands: Int, maxBucket: Int): DataFrame =
    lshBucketsFromSigs(sigs, idCol, k, bands)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("__n") <= maxBucket)
      .drop("__n")

  /** Candidate near-dup pairs from LSH banding: distinct (a, b) doc-id
    * pairs sharing at least one band bucket. `maxBucket` bounds the
    * blow-up from degenerate buckets. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3,
      maxBucket: Int = 1000,
      hasher: (Column, Int) => Column = md5Hash): DataFrame =
    candidatesFromSigs(signatures(df, idCol, textCol, k, n, hasher),
      idCol, k, bands, maxBucket)

  def candidatesFromSigs(sigs: DataFrame, idCol: String, k: Int, bands: Int,
      maxBucket: Int): DataFrame = {
    // cached: both sides of the pair join consume this frame — without
    // it the k×|shingles| hash computation runs twice
    val bounded = cacheOnce(boundedBuckets(sigs, idCol, k, bands, maxBucket))
    val a = bounded.select(col("band"), col("bucket"), col(idCol).as("a"))
    val b = bounded.select(col("band"), col("bucket"), col(idCol).as("b"))
    a.join(b, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing at least
    * one (document-frequency-bounded) shingle, filtered to
    * `threshold`. Output: (a, b, jaccard). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 10000): DataFrame = {
    // cached: the exploded shingle frame feeds three consumers (sizes +
    // both sides of the self-join) — recomputing the explode+window per
    // consumer doubles the heaviest stage
    val sh = cacheOnce(df.select(col(idCol).as("__id"),
      explode(shingles(col(textCol), n)).as("s")))
    val bounded = cacheOnce(sh
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("__df") <= maxDf)
      .drop("__df"))
    // sizes from the SAME bounded frame as the intersection: mixing the
    // unfiltered sizes with a bounded intersection would systematically
    // underestimate jaccard whenever maxDf actually cuts (pairs sharing
    // mostly-common shingles would silently score below threshold) —
    // with the cut active this is consistent "bounded jaccard" over the
    // surviving shingle sets
    val sizes = bounded.groupBy("__id").agg(count(lit(1)).as("n"))
    val inter = bounded.as("x")
      .join(bounded.as("y"), col("x.s") === col("y.s") && col("x.__id") < col("y.__id"))
      .groupBy(col("x.__id").as("a"), col("y.__id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("__id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit fingerprints (custom Catalyst
    * expression, [[graft.functions.SimHash]]) blocked into `bands`
    * 16-bit bands — a pair within Hamming distance h collides on at
    * least one band when h < bands (pigeonhole), so banding is
    * recall-complete for maxHamming < bands. One shuffle keyed on
    * (band, band-bits); the Hamming check is `bit_count(a^b)`, pure
    * codegen.
    *
    * BEHAVIOR CHANGE (0.3): maxHamming >= bands is now rejected at
    * call time instead of silently returning incomplete recall —
    * callers who want a lossy sweep must widen bands or lower
    * maxHamming explicitly. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4, maxBucket: Int = 100000): DataFrame =
    hammingPairs64(
      df.select(col(idCol).as("__id"),
        graft.functions.SimHash.simhash64(split(trim(col(textCol)), "\\s+")).as("sig")),
      "__id", "sig", maxHamming, bands, maxBucket)

  /** Near-dup pairs among PRECOMPUTED 64-bit fingerprints — text
    * simhash, image dHash ([[Multimodal.imageDHashes]]), any 64-bit
    * locality key. Pigeonhole banding: a pair within `maxHamming <
    * bands` differs in at most maxHamming bands, so it MUST agree on
    * at least one — candidate generation is recall-complete, then the
    * exact popcount filter keeps true pairs. `maxBucket` bounds the
    * degenerate-bucket blowup (e.g. the all-zero fingerprint of blank
    * inputs) by dropping over-full (band, bits) buckets WHOLE — pairs
    * whose only shared band was a dropped bucket are silently missed,
    * so recall-completeness holds only while no bucket exceeds the
    * cap. Returns (a, b, hamming). */
  def hammingPairs64(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3, bands: Int = 4, maxBucket: Int = 100000): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"pigeonhole completeness needs maxHamming < bands (got $maxHamming >= $bands)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val banded = sigs.select(col(idCol).as("__id"), col(sigCol).as("__sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col(sigCol), b * width).bitwiseAND(lit(mask)).as("bits"))): _*))
        .as("bb"))
      .select(col("__id"), col("__sig"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    val bounded = banded
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("band", "bits")))
      .filter(col("__n") <= maxBucket).drop("__n")
    val a = bounded.select(col("band"), col("bits"), col("__id").as("a"), col("__sig").as("__sa"))
    val b = bounded.select(col("band"), col("bits"), col("__id").as("b"), col("__sig").as("__sb"))
    a.join(b, Seq("band", "bits")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Per-batch-row best (lowest) Hamming distance against a prior
    * corpus's 64-bit fingerprint store — the candidate-generation half
    * of [[incrementalHammingDedup]], mirroring [[nearDupStoreHits]]
    * for hash keys. Pigeonhole banding on BOTH sides: only same-band
    * (batch, store) rows are compared, the store is hash-sized (one
    * 8-byte key per historical row), and for `maxHamming < bands`
    * every qualifying pair collides on at least one band, so the
    * filtered hits equal the brute-force hit set — UNLESS `maxBucket`
    * cuts: a (band, bits) bucket holding more than `maxBucket` rows on
    * EITHER side is dropped whole (the degenerate-fingerprint guard —
    * e.g. solid-color images all hashing to dHash 0), and pairs whose
    * only collision was that bucket are silently missed, so
    * [[incrementalHammingDedup]] retains their batch rows. That is the
    * same deliberate recall-for-boundedness trade every banded
    * generator here makes; raise `maxBucket` (or pre-filter the
    * degenerate sigs) when exactness over pathological inputs matters.
    * Returns (idCol, best_hamming); batch rows with no band collision
    * are absent. */
  def hammingStoreHits(batchSigs: DataFrame, storeSigs: DataFrame,
      idCol: String, sigCol: String, bands: Int = 4,
      maxBucket: Int = 100000): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    def banded(df: DataFrame, id: String, sig: String) = {
      val b = df.select(col(idCol).as(id), col(sigCol).as(sig),
        explode(array((0 until bands).map(k =>
          struct(lit(k).as("band"),
            shiftrightunsigned(col(sigCol), k * width).bitwiseAND(lit(mask))
              .as("bits"))): _*)).as("bb"))
        .select(col(id), col(sig),
          col("bb.band").as("band"), col("bb.bits").as("bits"))
      b.withColumn("__n", count(lit(1)).over(Window.partitionBy("band", "bits")))
        .filter(col("__n") <= maxBucket).drop("__n")
    }
    banded(batchSigs, "__ba", "__siga")
      .join(banded(storeSigs, "__sb", "__sigb"), Seq("band", "bits"))
      .groupBy(col("__ba").as(idCol))
      .agg(min(bit_count(col("__siga").bitwiseXOR(col("__sigb"))))
        .as("best_hamming"))
  }

  /** Incremental 64-bit-fingerprint near-dup dedup — the Hamming
    * sibling of [[incrementalNearDedup]], for recurring corpus drops
    * keyed on image dHashes ([[Multimodal.imageDHashes]]), audio
    * fingerprints, SimHash, or any 64-bit locality key: drop batch
    * rows whose `sigCol` sits within `maxHamming` bits of ANY stored
    * hash, then near-dedup the survivors against each other
    * ([[hammingPairs64]] + min-id components). Rows with a NULL sig
    * (undecodable media) pass through untouched, like the curation
    * stage. The store is a persisted (id, sig) frame
    * ([[saveHashStore]] / [[loadHashStore]]); append the survivors'
    * hashes after each refresh. Returns surviving batch rows with
    * their original columns. */
  def incrementalHammingDedup(batch: DataFrame, storeSigs: DataFrame,
      idCol: String, sigCol: String, maxHamming: Int = 2, bands: Int = 4,
      maxBucket: Int = 100000): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole completeness needs maxHamming < bands (got $maxHamming >= $bands)")
    val withSig = batch.filter(col(sigCol).isNotNull)
    val hits = hammingStoreHits(withSig.select(col(idCol), col(sigCol)),
        storeSigs, idCol, sigCol, bands, maxBucket)
      .filter(col("best_hamming") <= maxHamming)
      .select(idCol)
    val fresh = withSig.join(hits, Seq(idCol), "left_anti")
    val pairs = hammingPairs64(fresh.select(col(idCol), col(sigCol)),
      idCol, sigCol, maxHamming, bands, maxBucket)
    dedupByPairs(fresh, idCol, pairs)
      .unionByName(batch.filter(col(sigCol).isNull))
  }

  /** Persist a 64-bit fingerprint store for [[incrementalHammingDedup]].
    * The sig column is normalized to long; the id column keeps its own
    * type (the [[saveSignatureStore]] contract). */
  def saveHashStore(sigs: DataFrame, idCol: String, sigCol: String,
      path: String): Unit =
    sigs.select(col(idCol), col(sigCol).cast("long").as(sigCol))
      .write.mode("overwrite").parquet(path)

  /** Load a persisted fingerprint store, validating the contract. */
  def loadHashStore(spark: org.apache.spark.sql.SparkSession,
      idCol: String, sigCol: String, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(Set(idCol, sigCol).subsetOf(df.columns.toSet),
      s"hash store at $path must have ($idCol, $sigCol) columns, " +
        s"found: ${df.columns.mkString(", ")}")
    df.select(col(idCol), col(sigCol).cast("long").as(sigCol))
  }

  /** Portable SimHash near-dup pairs: 60-bit fingerprints whose token
    * hash is the first 15 hex chars of md5 — `('0x'||hex)::BIGINT` in
    * DuckDB reproduces the exact value, so the whole pipeline
    * (votes -> fingerprint -> 4x15-bit bands -> hamming<=h) replays in
    * the oracle. The production path stays [[simhashPairs]] (murmur3
    * `SimHash64Expr`, codegen'd kernel — strictly faster); this
    * variant exists for cross-engine verification and engine
    * migration checks.
    *
    * The fingerprint is one codegen'd pass over the token array
    * ([[graft.functions.SimHashMd5Expr]]) — the earlier formulation
    * (60 per-bit `aggregate()` higher-order functions over a projected
    * hash array) stayed interpreted and re-walked the array 60 times,
    * measured 5-10x slower at sf0.1.
    */
  def simhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4, maxBucket: Int = 100000): DataFrame = {
    val totalBits = 60
    require(totalBits % bands == 0, "bands must divide 60")
    val width = totalBits / bands
    val mask = (1L << width) - 1
    val sigs = df.select(col(idCol).as("__id"),
      graft.functions.SimHash.simhash60md5(split(trim(col(textCol)), "\\s+")).as("sig"))
    val banded = sigs.select(col("__id"), col("sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * width).bitwiseAND(lit(mask)).as("bits"))): _*))
        .as("bb"))
      .select(col("__id"), col("sig"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    val bounded = banded
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("band", "bits")))
      .filter(col("__n") <= maxBucket).drop("__n")
    val a = bounded.select(col("band"), col("bits"), col("__id").as("a"), col("sig").as("__sa"))
    val b = bounded.select(col("band"), col("bits"), col("__id").as("b"), col("sig").as("__sb"))
    a.join(b, Seq("band", "bits")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Benchmark decontamination: training documents sharing at least
    * one word n-gram with the eval corpus. The eval side is tiny
    * relative to 100 TB of training data — its distinct shingle set is
    * broadcast by default, so the training corpus is SCANNED ONCE with
    * a broadcast semi-join and never shuffled; set
    * `broadcastEval = false` for an oversized eval set to fall back to
    * a shuffled join. Returns the distinct contaminated id column. */
  def contaminatedIds(train: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, n: Int = 8, broadcastEval: Boolean = true): DataFrame = {
    val trainSh = train.select(col(idCol),
      explode(shingles(col(textCol), n)).as("__s"))
    val evalSh = evalDf.select(explode(shingles(col(textCol), n)).as("__s")).distinct()
    val evalSide = if (broadcastEval) broadcast(evalSh) else evalSh
    trainSh.join(evalSide, Seq("__s"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Drop every training document that shares an n-gram with the eval
    * corpus — the standard guard against benchmark leakage into a
    * training set. */
  def decontaminate(train: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, n: Int = 8, broadcastEval: Boolean = true): DataFrame =
    train.join(contaminatedIds(train, evalDf, idCol, textCol, n, broadcastEval),
      Seq(idCol), "left_anti")

  /** [[contaminatedIds]] for an eval set too big to broadcast — the
    * case the plain path's `broadcastEval = false` escape handles by
    * SHUFFLING every exploded training shingle (rows × n-grams-per-doc
    * exchange: the single most expensive plan a 100 TB decontamination
    * can pick). Here a [[Bloom]] filter of the eval shingle set rides
    * the training scan instead: no false negatives means every
    * `mightContain = false` shingle is proven clean and never leaves
    * its partition, so only suspect shingles (true contamination + an
    * fpp sliver) reach the exact semi-join against the eval set.
    * Results are bit-identical to [[contaminatedIds]] (the oracle row
    * pins it); the exchange shrinks from the training corpus to the
    * suspects. `expectedShingles` skips the sizing count when the
    * caller knows the eval set's distinct shingle count. */
  def contaminatedIdsBloom(train: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, n: Int = 8, expectedShingles: Option[Long] = None,
      fpp: Double = 0.03): DataFrame = {
    val evalSh = cacheOnce(
      evalDf.select(explode(shingles(col(textCol), n)).as("__s")).distinct())
    val items = math.max(1L, expectedShingles.getOrElse(evalSh.count()))
    val bc = Bloom.broadcastFilter(train.sparkSession,
      Bloom.build(evalSh, col("__s"), items, fpp))
    val trainSh = train.select(col(idCol),
        explode(shingles(col(textCol), n)).as("__s"))
      .filter(coalesce(Bloom.mightContain(bc, col("__s")), lit(false)))
    trainSh.join(evalSh, Seq("__s"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** [[decontaminate]] over [[contaminatedIdsBloom]] — the hard guard
    * for eval sets past broadcast size, training corpus still scanned
    * exactly once. */
  def decontaminateBloom(train: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, n: Int = 8, expectedShingles: Option[Long] = None,
      fpp: Double = 0.03): DataFrame =
    train.join(
      contaminatedIdsBloom(train, evalDf, idCol, textCol, n, expectedShingles, fpp),
      Seq(idCol), "left_anti")

  /** Graded contamination instead of the boolean: per training
    * document, the NUMBER of distinct eval n-grams it shares and the
    * FRACTION of its own distinct n-grams that are contaminated —
    * the report a threshold policy (e.g. "drop above 5%, flag above
    * 1%") reads, where [[decontaminate]] is the hard guard. Same plan
    * shape: eval shingles broadcast, train scanned once, one
    * map-side-combined aggregation; shingle-less documents score 0. */
  def contaminationScores(train: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, n: Int = 8, broadcastEval: Boolean = true): DataFrame = {
    val trainSh = train.select(col(idCol),
      explode_outer(shingles(col(textCol), n)).as("__s"))
    val evalSh = evalDf.select(explode(shingles(col(textCol), n)).as("__s")).distinct()
      .withColumn("__hit", lit(1))
    val evalSide = if (broadcastEval) broadcast(evalSh) else evalSh
    trainSh.join(evalSide, Seq("__s"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("contaminated_ngrams"),
        sum(when(col("__s").isNotNull, 1L).otherwise(0L)).as("total_ngrams"))
      .select(col(idCol), col("contaminated_ngrams"), col("total_ngrams"),
        when(col("total_ngrams") === 0L, 0.0)
          .otherwise(col("contaminated_ngrams").cast("double") / col("total_ngrams"))
          .as("contamination_frac"))
  }

  /** Connected components over near-duplicate pairs — the step that
    * turns pairwise similarity into dedup decisions. Iterative
    * min-label propagation: every node's component label converges to
    * the smallest id reachable from it. Each iteration is one
    * edge-join + one aggregation (both shuffle on node id, AQE-sized);
    * iterations needed = graph diameter, which for near-dup clusters
    * is tiny (dup groups are dense). `maxIter` bounds runaway chains.
    * Returns (id, component) for every node appearing in `pairs`.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // cache a DEFENSIVE projection of the pair frame BEFORE the
    // symmetric union: both union branches read it, so without this the
    // (expensive) pair-producing plan executes twice just to build the
    // edge list. Projecting first means the caller's own frame is never
    // mutated into a cached state behind their back.
    val p = pairs.select(col("a"), col("b")).cache()
    val edges = p.select(col("a").as("x"), col("b").as("y"))
      .union(p.select(col("b").as("x"), col("a").as("y")))
      .cache()
    // Initialization FUSED with round 1: comp(x) = min(x, min neighbor)
    // directly from one groupBy over the symmetric edges (every node
    // appears as x). Seeding comp = id and looping would spend one
    // whole extra distinct-shuffle pass to reach this same state — and
    // near-dup graphs are star/clique-shaped, so this fused pass IS
    // most of the convergence.
    //
    // Rounds are materialized as LOCAL CHECKPOINTS, not cache() entries.
    // A cached round lives in the CacheManager keyed by its logical
    // plan, and unpersisting ANY plan it depends on — the previous
    // round, p, edges — makes the manager REBUILD the dependent entry,
    // discarding its materialized data (Spark's non-cascading uncache
    // recompiles dependents). The earlier cache()-based loop therefore
    // re-executed the ENTIRE iteration chain on every post-loop action
    // (measured ~60s per downstream count at 300k docs, vs ~1s
    // checkpointed). RDD-backed checkpoints sit outside the
    // CacheManager — nothing invalidates them — lineage is truncated
    // every round instead of every 3rd, and dropped rounds are
    // reclaimed by the ContextCleaner once unreferenced.
    var labels = edges.groupBy(col("x"))
      .agg(min(col("y")).as("__m"))
      .select(col("x").as("id"), least(col("x"), col("__m")).as("comp"))
      .localCheckpoint(false)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate label per node: min over own label and neighbors'
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "y").withColumnRenamed("comp", "ncomp"), "y")
        .groupBy(col("x").as("id"))
        .agg(min(col("ncomp")).as("mincomp"))
      // keep the old label alongside the new one: the convergence check
      // below is a scan of this checkpointed frame, not a second join
      // job. (A pointer-jumping variant — comp := comp(comp) per round —
      // was measured SLOWER here: near-dup components are clique-shaped
      // and converge in ~2 rounds, so the extra per-round join never
      // pays for the iterations it would save on long chains.)
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("comp").as("__old"),
          least(col("comp"), coalesce(col("mincomp"), col("comp"))).as("comp"))
      val nextMat = next.localCheckpoint(false)
      changed = nextMat.filter(col("comp") =!= col("__old")).count()
      labels = nextMat.select("id", "comp")
      iter += 1
    }
    // release the internal scaffolding: the returned labels frame is
    // an RDD-backed checkpoint that never needs p/edges again, and
    // being outside the CacheManager it is IMMUNE to the dependent-
    // entry invalidation these unpersists trigger. The in-loop count()
    // materialized every round's checkpoint; if the loop never ran
    // (maxIter <= 0) force-materialize the seed frame first, else the
    // caller's first action would recompute the pair-producing plan
    // twice through the symmetric union.
    if (iter == 0) labels.count()
    edges.unpersist()
    p.unpersist()
    labels
  }

  /** Full near-dup dedup decision: given the corpus and a pair frame
    * (from any of the similarity operators), keep the minimum id of
    * each duplicate component plus every untouched document. */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 10): DataFrame = {
    val comps = connectedComponents(pairs, maxIter)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dedupByPairs]] with an explicit representative choice: per
    * duplicate component keep the member with the best `score`
    * (highest by default; lowest with `ascending = true`), ties broken
    * by minimum id. Min-id keeps whatever happened to be ingested
    * first; real pipelines keep the best-quality page of a cluster
    * (pass e.g. [[TextAnalysis.qualityScore]]) or — SemDeDup's choice
    * — the member farthest from its cluster centroid. One extra
    * component-keyed window over the (small) component membership;
    * untouched documents never shuffle. */
  def dedupByPairsBest(df: DataFrame, idCol: String, pairs: DataFrame,
      score: Column, ascending: Boolean = false,
      maxIter: Int = 10): DataFrame = {
    val comps = connectedComponents(pairs, maxIter)
    val members = df.select(col(idCol), score.as("__score"))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol))
    val ord = if (ascending) col("__score").asc else col("__score").desc
    val w = Window.partitionBy(col("comp")).orderBy(ord, col(idCol).asc)
    val losers = members
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") > 1)
      .select(col(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** MinHash-estimated Jaccard for candidate pairs (signature
    * agreement fraction), the scale path that skips exact set
    * intersection entirely: candidates from LSH, similarity from
    * signatures, no second pass over the corpus. */
  def minhashJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3, threshold: Double = 0.5,
      hasher: (Column, Int) => Column = md5Hash,
      maxBucket: Int = 1000): DataFrame =
    minhashJaccardPairsFromSigs(signatures(df, idCol, textCol, k, n, hasher),
      idCol, k, bands, threshold, maxBucket)

  /** [[minhashJaccardPairs]] from an ALREADY-COMPUTED signature frame
    * — callers who hold signatures (e.g. [[incrementalNearDedup]], a
    * loaded store) skip the k-hashes-per-shingle pass entirely. */
  def minhashJaccardPairsFromSigs(sigsIn: DataFrame, idCol: String,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    // signatures cached and shared by the bucketing pass and both
    // sides of the estimation join. maxBucket guards the
    // degenerate-bucket blowup like every other LSH entry point.
    val sigs = cacheOnce(sigsIn.withColumnRenamed(idCol, "__id"))
    val cands = candidatesFromSigs(sigs.withColumnRenamed("__id", idCol),
      idCol, k, bands, maxBucket = maxBucket)
    cands
      .join(sigs.select(col("__id").as("a"), col("sig").as("siga")), "a")
      .join(sigs.select(col("__id").as("b"), col("sig").as("sigb")), "b")
      .select(col("a"), col("b"),
        (size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), b => b))
          .cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }
}
