package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): pick the raw-corpus documents whose hashed
  * n-gram distribution most resembles a (small) target corpus.
  *
  * The recipe: featurize every document as a bag of hashed unigram +
  * bigram buckets; fit two smoothed multinomials over the `buckets`
  * bucket ids — `p` from the target corpus, `q` from the raw corpus —
  * and weight each raw document by `log w = Σ_g λ[bucket(g)]` where
  * `λ[b] = log p_b − log q_b`; then resample without replacement
  * proportionally to `w` via the Gumbel top-k trick.
  *
  * Scale shape (the 100 TB contract):
  *  - Featurization is scan-side: tokens → gram buckets inside the
  *    row, no shuffle of document payloads, ever.
  *  - Each distribution is ONE map-side-combined aggregation whose
  *    output is at most `buckets` rows (bounded ≤ 2^20); both fit on
  *    the driver by construction, so λ is built once driver-side and
  *    rides the plan — scoring then needs NO join and NO shuffle: one
  *    codegen'd kernel call per row ([[graft.functions.DsirScore]])
  *    under either hasher.
  *  - Selection is `ORDER BY key DESC LIMIT k` — Spark plans
  *    TakeOrderedAndProject (per-partition top-k, driver merge of k
  *    rows per partition), never a global sort.
  *
  * Two bucket hashers, same dispatch convention as
  * [[Dedup.minhashSignatureFromShingles]]:
  *  - `portableHash = true`: top-60-bits-of-md5 mod `buckets` —
  *    byte-replayable in DuckDB (the q_dsir_* oracle path).
  *  - default: the [[graft.functions.WindowHash]] rolling kernel at
  *    k=1 and k=2 — one xx64 hash per token, O(tokens) long
  *    arithmetic, no per-gram string materialization (the bigram
  *    surface form is never built). Statistically equivalent bucket
  *    assignment, ~an order of magnitude cheaper at corpus scale.
  *
  * Determinism: both hashers and the Gumbel noise
  * ([[Sampling.unitHash]] under the "dsir" salt) are pure functions
  * of the input, so a 100 TB selection replays identically across
  * runs, engines and cluster layouts.
  */
object Dsir {

  /** Hard ceiling on the bucket count: both distributions and the λ
    * literal must stay driver-bounded (2^20 doubles = 8 MB of plan). */
  val MaxBuckets: Int = 1 << 20

  /** Lowercased whitespace tokens — the shared corpus tokenization
    * (same normal form as the bigram LM / unigram scorers). */
  private[ops] def toks(text: Column): Column =
    graft.functions.WsTokens.lowerOf(text)

  /** Unigram + bigram surface forms of a document (DSIR's feature
    * set). Only materialized by the reference formulation
    * [[bucketsByFold]] — both kernels hash tokens directly and never
    * build the bigram strings. */
  def grams(text: Column): Column = {
    val t = toks(text)
    concat(t,
      when(size(t) >= 2,
        transform(sequence(lit(0), size(t) - 2),
          i => concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2))))
        .otherwise(array().cast("array<string>")))
  }

  /** Array of bucket ids (one per unigram and bigram occurrence,
    * duplicates preserved — DSIR is a bag-of-grams model). Both
    * hashers run as one-pass codegen'd kernels
    * ([[graft.functions.DsirScore]]): the fast path xx64-hashes each
    * token once and rolls bigram hashes from the token hashes; the
    * portable path streams md5 over the gram bytes (bucket =
    * top-60-bits-of-md5 mod B, replayed in DuckDB as
    * `('0x'||substr(md5(g),1,15))::BIGINT % B`). Each is
    * bit-identical to its Column formulation [[bucketsByFold]]
    * (OpsSpec-pinned). */
  def bucketsOf(text: Column, buckets: Int, portableHash: Boolean): Column = {
    require(buckets >= 1 && buckets <= MaxBuckets,
      s"buckets must be in [1, $MaxBuckets], got $buckets")
    graft.functions.DsirScore.bucketsOf(toks(text), buckets, md5 = portableHash)
  }

  /** Reference Column formulations of [[bucketsOf]] (md5 over the
    * gram strings / WindowHash at k=1 and k=2, through interpreted
    * transform/pmod) — kept for the kernel-equivalence pins; not used
    * on any production path. */
  def bucketsByFold(text: Column, buckets: Int,
      portableHash: Boolean = false): Column =
    if (portableHash)
      transform(grams(text), g =>
        pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)).cast("int"))
    else {
      val t = toks(text)
      transform(
        concat(graft.functions.WindowHash.of(t, 1),
          graft.functions.WindowHash.of(t, 2)),
        h => pmod(h, lit(buckets.toLong)).cast("int"))
    }

  /** (bucket, cnt) gram-occurrence distribution of a corpus: one
    * map-side-combined shuffle of (bucket, partial-count) rows; output
    * bounded by `buckets`. */
  def bucketDistribution(df: DataFrame, textCol: String, buckets: Int,
      portableHash: Boolean = false): DataFrame =
    df.select(explode(bucketsOf(col(textCol), buckets, portableHash)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Persist a bucket distribution as parquet — fit the (small)
    * target corpus once and reuse it across raw-corpus refreshes via
    * [[importanceWeightsFromTarget]] (the [[QualityFilters]] LM
    * save/load pattern). The saved frame is ≤ `buckets` rows. Record
    * the (buckets, hasher) pair out of band: a distribution only
    * composes with a raw corpus fit under the SAME pair (loading
    * against a different bucket count fails fast in the λ build). */
  def saveDistribution(dist: DataFrame, path: String): Unit =
    dist.write.mode("overwrite").parquet(path)

  def loadDistribution(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(df.columns.toSet == Set("bucket", "cnt"),
      s"$path is not a DSIR bucket distribution " +
        s"(want columns [bucket, cnt], got [${df.columns.mkString(", ")}])")
    df
  }

  /** Collect a bucket distribution into a dense driver-side array —
    * bounded by `buckets` rows (≤ [[MaxBuckets]]) by construction. */
  private def dense(dist: DataFrame, buckets: Int): Array[Long] = {
    val arr = new Array[Long](buckets)
    dist.select(col("bucket").cast("int"), col("cnt").cast("long"))
      .collect().foreach { r =>
        val b = r.getInt(0)
        require(b >= 0 && b < buckets,
          s"bucket id $b outside [0, $buckets) — was this distribution " +
            "fit with a different bucket count or hasher?")
        arr(b) = r.getLong(1)
      }
    arr
  }

  /** Score every raw document with its DSIR log importance weight
    * (appended as `weightCol`): `Σ_g [log p̂(bucket(g)) − log
    * q̂(bucket(g))]` with add-`alpha` smoothing over `buckets` buckets,
    * `p̂` fit on `target`, `q̂` on `raw`. Documents with no grams score
    * 0.0 (the empty product).
    *
    * Runs the two bounded distribution aggregations eagerly (two jobs,
    * each collecting ≤ `buckets` rows), then returns a SCAN-SIDE
    * scored frame: λ rides the plan as a literal, so downstream
    * filtering/selection adds no join and the raw corpus never
    * shuffles (PlanSpec-pinned). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      textCol: String = "text", buckets: Int = 8192, alpha: Double = 1.0,
      portableHash: Boolean = false,
      weightCol: String = "dsir_logw"): DataFrame =
    importanceWeightsFromTarget(raw,
      bucketDistribution(target, textCol, buckets, portableHash),
      textCol, buckets, alpha, portableHash, weightCol)

  /** [[importanceWeights]] against an ALREADY-FIT target distribution
    * (from [[bucketDistribution]], typically persisted via
    * [[saveDistribution]]): the recurring-refresh shape — the target
    * never changes between corpus drops, so only the raw distribution
    * is refit. The distribution must have been fit under the SAME
    * (buckets, portableHash) pair. */
  def importanceWeightsFromTarget(raw: DataFrame, targetDist: DataFrame,
      textCol: String = "text", buckets: Int = 8192, alpha: Double = 1.0,
      portableHash: Boolean = false,
      weightCol: String = "dsir_logw"): DataFrame = {
    require(alpha > 0, s"alpha must be > 0 (smoothing), got $alpha")
    val tgt = dense(targetDist, buckets)
    val rawD = dense(bucketDistribution(raw, textCol, buckets, portableHash), buckets)
    val tTot = tgt.sum.toDouble
    val rTot = rawD.sum.toDouble
    // exact expression order matters for the cross-engine oracle:
    // ln((c_t + α) / (T_t + αB)) − ln((c_r + α) / (T_r + αB)),
    // division-then-ln, replayed verbatim in DuckDB (round-6 absorbs
    // the last-ulp libm differences, same discipline as the LM oracles)
    val lam = Array.tabulate(buckets) { b =>
      math.log((tgt(b) + alpha) / (tTot + alpha * buckets)) -
        math.log((rawD(b) + alpha) / (rTot + alpha * buckets))
    }
    raw.withColumn(weightCol,
      graft.functions.DsirScore.of(toks(col(textCol)), lam, md5 = portableHash))
  }

  /** Reference Column formulation of the per-doc score: an interpreted
    * HOF fold over [[bucketsByFold]]. Both production paths dispatch
    * to the one-pass [[graft.functions.DsirScore]] kernels,
    * bit-identical to this fold under the matching hasher
    * (OpsSpec-pinned, including the unigrams-then-bigrams summation
    * order); kept for that pin only. */
  def scoreByFold(text: Column, lam: Array[Double], buckets: Int,
      portableHash: Boolean): Column = {
    val lamLit = typedLit(lam)
    aggregate(bucketsByFold(text, buckets, portableHash), lit(0.0),
      (acc, b) => acc + element_at(lamLit, b + 1))
  }

  /** Gumbel top-k resampling WITHOUT replacement: taking the k
    * largest `logw/temperature + Gumbel(0,1)` keys draws exactly k
    * documents without replacement with inclusion probabilities
    * proportional to `w^(1/temperature)` (Vieira 2014's Gumbel-max
    * generalization; `temperature` → ∞ approaches uniform, → 0
    * approaches deterministic top-k by weight). Noise is
    * hash-seeded ([[Sampling.unitHash]], "dsir" salt) so the draw is
    * reproducible and DuckDB-replayable; keys are rounded to 6dp with
    * a doc-id tie-break so ranking is stable cross-engine.
    *
    * Plans as TakeOrderedAndProject — per-partition top-k, no global
    * sort, no shuffle of the corpus. */
  def resampleTopK(scored: DataFrame, k: Int, idCol: String = "doc_id",
      weightCol: String = "dsir_logw", seed: Int = 42,
      temperature: Double = 1.0, keyCol: String = "dsir_key"): DataFrame = {
    require(k >= 1, s"resampleTopK wants k >= 1, got $k")
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val u = (Sampling.unitHash(col(idCol), seed, "dsir").cast("double") + 0.5) /
      lit(Sampling.UnitRange.toDouble)
    val key = round(col(weightCol) / temperature - log(-log(u)), 6)
    scored.withColumn(keyCol, key)
      .orderBy(desc(keyCol), col(idCol))
      .limit(k)
  }
}
