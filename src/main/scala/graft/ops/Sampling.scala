package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing for training-data
  * pipelines. Every decision is a pure function of (seed, id), so a
  * sample is reproducible across runs, engines and cluster layouts —
  * the property `df.sample()` (partition-RNG-based) cannot give you —
  * and re-running a 100 TB curation job yields the identical corpus.
  *
  * All operators here are scan-side filters/projections: no shuffle,
  * no state, trivially parallel at any scale. The unit hash is the
  * top 60 bits of md5 (same construction as
  * [[graft.ops.Dedup.simhashPairsPortable]]), which DuckDB reproduces
  * via `('0x'||substr(md5(x),1,15))::BIGINT`, so every sampling
  * decision replays bit-for-bit in the cross-engine oracle.
  */
object Sampling {

  /** 2^60 — the unit-hash range. Thresholds are precomputed to Long
    * so both engines compare integers (no float rounding at the
    * boundary). */
  val UnitRange: Long = 1L << 60

  /** Uniform hash of (salt, seed, id) into [0, 2^60). The operator
    * salt decorrelates decisions ACROSS operators sharing a seed: a
    * 10% `hashSample` must not select exactly the 10% `assignSplits`
    * marked as test (eval leakage), so each operator hashes under its
    * own prefix; within one operator the hash is shared so nested-rate
    * and moving-boundary properties hold. */
  def unitHash(id: Column, seed: Int, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt:$seed:"), id.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Threshold for `rate` as an exact Long — inline the SAME literal
    * in oracle SQL. */
  def rateThreshold(rate: Double): Long =
    math.min(UnitRange, math.max(0L, (rate * UnitRange).toLong))

  /** Deterministic Bernoulli sample: keep a row iff
    * hash(seed, id) < rate * 2^60.
    *
    * DELIBERATELY shares the "sample" salt with [[stratifiedSample]]:
    * they are two rate policies over ONE sampling decision, so a
    * stratified sample with every stratum at rate r selects exactly
    * `hashSample(r)`, and tightening per-stratum rates always yields a
    * subset — the nested-rate property users rely on when downsampling
    * an already-sampled corpus. Decorrelation (each operator under its
    * own prefix) applies across DIFFERENT decisions: sample vs split
    * vs mix, which use distinct salts (test-pinned). */
  def hashSample(df: DataFrame, idCol: String, rate: Double, seed: Int = 42): DataFrame =
    df.filter(unitHash(col(idCol), seed, "sample") < lit(rateThreshold(rate)))

  /** Score-proportional ("soft") sampling — the middle ground between
    * keeping everything and a hard quality threshold that discards
    * every borderline document: each row keeps with probability
    * p = min(1, (max(score, 0) / pivot)^sharpness) — 1 at and above
    * `pivot`, decaying below it, `sharpness` shaping how hard the
    * knee cuts (1 = proportional, higher = closer to a hard
    * threshold). The decision is the deterministic unit hash under its
    * own salt (decorrelated from sample/split/mix — a soft-filtered
    * corpus must not accidentally be the eval split), so output is a
    * pure function of (ids, scores, pivot, sharpness, seed):
    * replayable, layout-independent, and MONOTONE — a row kept at
    * score s is kept at any higher score under the same seed (same
    * hash, higher threshold), so re-scoring upward never drops
    * survivors. `keep_prob` rides the output for downstream loss
    * weighting (importance-correct training on the soft sample).
    * p is rounded to 6 decimals before the threshold (cross-engine
    * `pow` ulp defense) and the threshold floors to an exact Long, so
    * the boundary comparison is integer-exact in both engines. */
  def softSample(df: DataFrame, idCol: String, score: Column,
      pivot: Double, sharpness: Double = 1.0, seed: Int = 42): DataFrame = {
    require(pivot > 0, s"softSample wants pivot > 0, got $pivot")
    require(sharpness > 0, s"softSample wants sharpness > 0, got $sharpness")
    val p = round(
      least(lit(1.0), pow(greatest(score, lit(0.0)) / pivot, sharpness)), 6)
    df.withColumn("keep_prob", p)
      .filter(unitHash(col(idCol), seed, "softsample") <
        floor(col("keep_prob") * lit(UnitRange.toDouble)).cast("long"))
  }

  /** Per-stratum Bernoulli rates (e.g. per language / per source),
    * `default` for strata not in the map. The rate lookup is an
    * inlined CASE chain — strata counts are small (languages,
    * sources), and a literal expression keeps this a pure scan-side
    * filter with no broadcast join. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], default: Double = 0.0, seed: Int = 42): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (stratum, rate)) =>
        acc.when(col(stratumCol) === stratum, lit(rateThreshold(rate)))
      }
      .otherwise(lit(rateThreshold(default)))
    df.filter(unitHash(col(idCol), seed, "sample") < threshold)
  }

  /** Deterministic train/validation/test assignment: `fractions` maps
    * split name -> fraction; rows falling past the summed fractions
    * get `defaultSplit`. Returns the frame with a `split` column.
    * Assignment is by half-open hash intervals, so splits are disjoint
    * and exhaustive, and growing one fraction only MOVES the boundary
    * (ids keep their relative position — stable assignment under
    * re-configuration). */
  def assignSplits(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], defaultSplit: String = "train",
      seed: Int = 42): DataFrame = {
    require(fractions.forall(_._2 >= 0.0),
      "split fractions must be non-negative")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions sum to ${fractions.map(_._2).sum} > 1 — the " +
        s"'$defaultSplit' default would silently receive no rows")
    val h = unitHash(col(idCol), seed, "split")
    val (expr0, _) = fractions.foldLeft((when(lit(false), lit("")), 0.0)) {
      case ((acc, cum), (name, frac)) =>
        val hi = cum + frac
        (acc.when(h < lit(rateThreshold(hi)), lit(name)), hi)
    }
    df.withColumn("split", expr0.otherwise(lit(defaultSplit)))
  }

  /** Corpus mixing by per-stratum weight: weight 2.5 repeats every
    * row of the stratum twice plus a deterministic 50% chance of a
    * third copy (fractional part resolved by the unit hash — exactly
    * the oversampling a training-mix spec like "2.5 epochs of
    * wikipedia" asks for). Weight 0.4 keeps 40% of rows once.
    * Output gains `rep_idx` (0-based copy index), making each copy a
    * distinct row downstream shufflers/writers can address.
    *
    * Scan-side: repeats = integer column, copies via posexplode of a
    * repeated-unit array. No shuffle; output size = sum of weights x
    * stratum sizes, produced streaming per input partition. */
  def mixByWeight(df: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Double], default: Double = 1.0,
      seed: Int = 42): DataFrame = {
    require((weights.values ++ Seq(default)).forall(_ >= 0.0),
      "mix weights must be non-negative (0 drops the stratum)")
    def wholeOf(w: Double): Long = math.floor(w).toLong
    def fracThresholdOf(w: Double): Long = rateThreshold(w - math.floor(w))
    val whole = weights.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (stratum, w)) =>
        acc.when(col(stratumCol) === stratum, lit(wholeOf(w)))
      }.otherwise(lit(wholeOf(default)))
    val fracThreshold = weights.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (stratum, w)) =>
        acc.when(col(stratumCol) === stratum, lit(fracThresholdOf(w)))
      }.otherwise(lit(fracThresholdOf(default)))
    require(!df.columns.contains("rep_idx"),
      "mixByWeight adds a rep_idx column; rename the existing one first")
    val reps = (whole +
      when(unitHash(col(idCol), seed, "mix") < fracThreshold, 1L).otherwise(0L))
      .cast("int")
    // posexplode's outputs are aliased explicitly — its default names
    // (pos, col) would silently collide with user columns of the same
    // name (drop("col") would remove the user's data column)
    val exploded = df.withColumn("__reps", reps)
      .filter(col("__reps") > 0)
      .select(col("*"),
        posexplode(array_repeat(lit(1), col("__reps"))).as(Seq("rep_idx", "__one")))
    exploded.drop("__one", "__reps")
  }

  /** Temperature-scaled mixing (the multilingual/multi-source recipe
    * of mBERT/XLM-R and data-mix papers): stratum sampling probability
    * ∝ size^alpha, normalized so the LARGEST stratum keeps weight 1.0
    * and small-stratum up-weights are capped at `maxWeight` — alpha =
    * 1 reproduces the natural corpus exactly, alpha → 0 approaches
    * uniform over strata (small strata get UP-sampled relative to
    * their size). Weights are computed from one tiny
    * per-stratum count aggregate (collected — strata are languages or
    * sources, thousands at most) and applied with [[mixByWeight]]'s
    * deterministic fractional oversampling. Returns the mixed frame;
    * inspect the chosen weights with [[temperatureWeights]]. */
  def mixByTemperature(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double, maxWeight: Double = 4.0, seed: Int = 42): DataFrame =
    mixByWeight(df, idCol, stratumCol,
      temperatureWeights(df, stratumCol, alpha, maxWeight),
      default = 0.0, seed = seed)

  /** The per-stratum weights [[mixByTemperature]] applies: with
    * stratum fractions p_i = n_i / N, the target mix is
    * q_i ∝ p_i^alpha; the per-ROW repetition weight is
    * w_i ∝ q_i / p_i = p_i^(alpha-1), normalized so the LARGEST
    * stratum gets weight 1.0 (it is never repeated or dropped) and
    * capped at `maxWeight` — the standard temperature-sampling
    * convention: alpha = 1 reproduces the natural corpus exactly
    * (every weight 1.0, no volume inflation), alpha → 0 up-samples
    * small strata toward uniform until the cap bites. The cap trades
    * mix fidelity for bounded repetition of tiny strata (a 1000x
    * up-weight would repeat a tiny stratum 1000 times); strata at the
    * cap sit below their q_i target. */
  def temperatureWeights(df: DataFrame, stratumCol: String,
      alpha: Double, maxWeight: Double = 4.0): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    require(maxWeight > 0.0, s"maxWeight > 0, got $maxWeight")
    // null strata carry no name to weight — they fall to mixByWeight's
    // default (0.0 here: an unnamed stratum is dropped, not guessed)
    val counts = df.groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().flatMap(r =>
        Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    require(counts.nonEmpty, "temperatureWeights needs at least one non-null stratum")
    val total = counts.values.sum.toDouble
    // w ∝ p^alpha / p = p^(alpha-1); the largest stratum has the
    // SMALLEST raw weight, so dividing by min(raw) pins it to 1.0
    val raw = counts.map { case (s, n) => s -> math.pow(n / total, alpha - 1.0) }
    val base = raw.values.min
    raw.map { case (s, w) => s -> math.min(maxWeight, w / base) }
  }

  /** Exactly k rows per stratum (eval-set construction): the k rows
    * with the smallest unit hash in each stratum, ties broken by id —
    * deterministic across runs/engines/layouts like everything here,
    * under its own "exactk" salt. Unlike the rate-based samplers this
    * is NOT grow-stable (a new doc can hash below an earlier pick and
    * displace it) and it costs one shuffle on the stratum key plus a
    * per-stratum window — fine for eval-sized k over bounded strata
    * (languages, sources); for proportional subsets of web-scale
    * strata use [[stratifiedSample]], which stays scan-side. */
  def exactKPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, seed: Int = 42): DataFrame = {
    require(k >= 1, s"exactKPerStratum wants k >= 1, got $k")
    require(!df.columns.contains("__rn"),
      "exactKPerStratum uses a __rn working column; rename the existing one first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(unitHash(col(idCol), seed, "exactk").asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-stratum quota by QUALITY (the RefinedWeb/Dolma "cap documents
    * per domain" stage): keep the `k` BEST rows of each stratum by
    * `orderCol` descending, ties to the smaller `idCol` — so the head
    * domains stop drowning the mixture but each domain contributes its
    * highest-scoring documents, not a random sample (that is
    * [[exactKPerStratum]]'s job).
    *
    * Skew — one hot domain funneling through one task — is the scale
    * hazard of a per-stratum window, and on this Spark the OPTIMIZER
    * already owns the fix: a `row_number <= k` filter over a window
    * plans a PARTIAL `WindowGroupLimit` BEFORE the exchange, capping
    * every input task's contribution at k rows per stratum, then a
    * final group-limit + window over those ≤ k·P survivors — exactly
    * the salted two-phase rewrite, done by Catalyst (pinned in
    * PlanSpec, measured as the domaincap_10m bench pair against the
    * optimization disabled). A hand-rolled two-phase version was
    * measured strictly slower: it pays a second full window over what
    * the group-limit already bounded. Deterministic and
    * layout-independent: row_number over (score desc, id asc) is a
    * total order. */
  def bestKPerStratum(df: DataFrame, stratumCol: String, orderCol: String,
      k: Int, idCol: String): DataFrame = {
    require(k >= 1, s"bestKPerStratum wants k >= 1, got $k")
    require(!df.columns.contains("__rn"),
      "bestKPerStratum uses a __rn working column; rename the existing one first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Token-ID-level chunking of a [[packSequences]] frame — the actual
    * trainer export: every output row is one training sequence of
    * exactly `seqLen` token ids (the last sequence of a pack may be
    * shorter unless `dropPartial`), sliced from the pack-order
    * concatenation of per-document id arrays with `boundaries`
    * bookkeeping identical to [[chunkPacks]]. Ids are concatenated
    * with NO separator — for a byte-level BPE
    * ([[graft.ops.Tokenizer]]) decoding a pack's sequences in order
    * reproduces the pack's documents byte-for-byte, which is the
    * contract oracle (q_bpe_chunk_roundtrip).
    *
    * Same scale shape as [[chunkPacks]]: one window over the existing
    * pack partitioning for the true running offset, explode one row
    * per (document, overlapped sequence), and a partial-aggregable
    * groupBy reassembly — id slices shuffle, never whole packs. */
  def chunkPackedIds(assigned: DataFrame, idCol: String = "doc_id",
      idsCol: String = "token_ids", seqLen: Int = 2048,
      dropPartial: Boolean = false): DataFrame = {
    require(seqLen >= 1, s"chunkPackedIds wants seqLen >= 1, got $seqLen")
    val needed = Seq("pack_group", "pack_id", "pack_offset", idsCol)
      .filterNot(assigned.columns.contains)
    require(needed.isEmpty,
      s"chunkPackedIds wants a packSequences frame with $idsCol; " +
        s"missing ${needed.mkString(", ")}")
    val clobbered = Seq("seq_idx", "n_tokens", "boundaries")
      .filter(assigned.columns.contains)
    require(clobbered.isEmpty,
      s"chunkPackedIds writes ${clobbered.mkString(", ")}; rename the existing column(s) first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_group"), col("pack_id"))
      .orderBy(col("pack_offset").asc, col(idCol).asc)
    val withOff = assigned
      .withColumn("__n", size(col(idsCol)).cast("long"))
      .withColumn("__off", sum(col("__n")).over(w) - col("__n"))
    val sliced = withOff
      .filter(col("__n") > 0)
      .select(col("pack_group"), col("pack_id"), col(idCol),
        col(idsCol), col("__n"), col("__off"),
        explode(sequence(
          floor(col("__off") / seqLen),
          floor((col("__off") + col("__n") - 1) / seqLen))).as("seq_idx"))
      .withColumn("__tokStart",
        greatest(lit(0L), col("seq_idx") * seqLen - col("__off")))
      .withColumn("__tokEnd",
        least(col("__n"), (col("seq_idx") + 1) * seqLen - col("__off")))
      .withColumn("__begin",
        col("__off") + col("__tokStart") - col("seq_idx") * seqLen)
      .select(col("pack_group"), col("pack_id"), col("seq_idx"), col(idCol),
        col("__begin"),
        (col("__begin") + col("__tokEnd") - col("__tokStart")).as("__end"),
        slice(col(idsCol), (col("__tokStart") + 1).cast("int"),
          (col("__tokEnd") - col("__tokStart")).cast("int")).as("__ids"))
    val chunks = sliced
      .groupBy("pack_group", "pack_id", "seq_idx")
      .agg(
        sum(col("__end") - col("__begin")).as("n_tokens"),
        array_sort(collect_list(struct(col("__begin"), col(idCol).as("__id"),
          col("__end"), col("__ids")))).as("__parts"))
      .withColumn(idsCol,
        flatten(transform(col("__parts"), x => x.getField("__ids"))))
      .withColumn("boundaries", transform(col("__parts"),
        x => struct(x.getField("__id").as(idCol),
          x.getField("__begin").as("begin_token"),
          x.getField("__end").as("end_token"))))
      .drop("__parts")
    if (dropPartial) chunks.filter(col("n_tokens") === seqLen.toLong) else chunks
  }

  /** Deterministic corpus shuffle (training-order randomization): sort
    * by the unit hash of (seed, id) under the "shuffle" salt. The same
    * id always lands at the same position regardless of cluster
    * layout, partition count, or input file order — re-running the
    * export reproduces the byte-identical training order, and a new
    * seed is a fresh permutation. Plans as ONE range exchange + sort
    * (Spark's scalable total order: sampled range boundaries, no
    * single-partition funnel). The hash key is kept as `keyCol` so
    * downstream stages (sharded writers, [[globalOrderIndex]]) can
    * reuse the order without recomputing md5. */
  def shuffleDeterministic(df: DataFrame, idCol: String, seed: Int = 42,
      keyCol: String = "shuffle_key"): DataFrame = {
    require(!df.columns.contains(keyCol),
      s"shuffleDeterministic writes $keyCol; rename the existing column first")
    df.withColumn(keyCol, shuffleKeyOf(col(idCol), seed))
      .orderBy(col(keyCol).asc, col(idCol).asc)
  }

  /** The shuffle-order key itself (no sort): callers that range-
    * partition into shards or feed a writer can build the key once
    * and skip [[shuffleDeterministic]]'s global sort. */
  def shuffleKeyOf(id: Column, seed: Int = 42): Column =
    unitHash(id, seed, "shuffle")

  /** Contiguous 0-based global position of every row in
    * [[shuffleDeterministic]] order — the "shuffled row number" a
    * training-data exporter stamps on each sample so any sequence
    * range maps to a deterministic corpus slice.
    *
    * Spark has no scalable global row_number (a global window funnels
    * through ONE partition), so this uses the two-job zipWithIndex
    * shape kept entirely in DataFrames: range-partition + sort on the
    * shuffle key, stamp `monotonically_increasing_id` (partition id in
    * the high bits, per-partition position in the low 33), pin the
    * sorted layout with a lazy localCheckpoint, then (job 1) collect
    * per-partition row counts — ONE small row per partition — and
    * (job 2) add each partition's prefix offset back via a broadcast
    * join. The index is a pure function of the total (key, id) order,
    * so partition boundaries, AQE coalescing and executor count cannot
    * change any row's index. Cost: one range shuffle, materialized
    * once, read by two jobs. */
  def globalOrderIndex(df: DataFrame, idCol: String, seed: Int = 42,
      indexCol: String = "global_idx", keyCol: String = "shuffle_key"): DataFrame = {
    val clobbered = (Seq(indexCol, keyCol) ++ Seq("__mid", "__pid", "__offset"))
      .filter(df.columns.contains)
    require(clobbered.isEmpty,
      s"globalOrderIndex writes ${clobbered.mkString(", ")}; rename the existing column(s) first")
    val keyed = df.withColumn(keyCol, shuffleKeyOf(col(idCol), seed))
    // monotonically_increasing_id = partitionId * 2^33 + position, and
    // the projection runs ABOVE the sort in the same stage, so the low
    // 33 bits are the row's position in (key, id) order within its
    // range partition
    val sorted = keyed
      .repartitionByRange(col(keyCol), col(idCol))
      .sortWithinPartitions(col(keyCol).asc, col(idCol).asc)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(false) // pin ONE materialization for both jobs
    val pid = shiftright(col("__mid"), 33)
    val counts = sorted.groupBy(pid.as("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((-1L, 0L)) { case ((_, acc), (p, n)) =>
      (p, acc + n)
    }.sliding(2).collect { case Array((_, off), (p, _)) => (p, off) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toDF("__pid", "__offset")
    sorted
      .join(broadcast(offsetsDf), pid === col("__pid"))
      .withColumn(indexCol,
        col("__offset") + (col("__mid").bitwiseAND(lit((1L << 33) - 1))))
      .drop("__mid", "__pid", "__offset")
  }

  /** Deterministic contiguous shard assignment on top of
    * [[globalOrderIndex]]: shard = global_idx div ceil(total/nShards),
    * so shard membership (and the order within each shard) is a pure
    * function of the (seed, id) permutation — re-running the export
    * reproduces byte-identical shards regardless of cluster layout.
    * The total comes from one max() over the layout the index already
    * pinned (no extra shuffle). Integer `div` (not double /): a
    * float quotient could round a boundary row into the next shard at
    * large indices. Output schema = input columns + `indexCol` +
    * `shardCol`; the internal shuffle key [[globalOrderIndex]] sorts on
    * is dropped here (it is derivable as [[shuffleKeyOf]](id, seed) —
    * callers who want it should call globalOrderIndex directly). */
  def shardByOrder(df: DataFrame, idCol: String, nShards: Int, seed: Int = 42,
      shardCol: String = "shard", indexCol: String = "global_idx"): DataFrame = {
    require(nShards >= 1, s"nShards >= 1, got $nShards")
    require(!df.columns.contains(shardCol),
      s"shardByOrder writes $shardCol; rename the existing column first")
    val indexed = globalOrderIndex(df, idCol, seed, indexCol)
      .drop("shuffle_key") // globalOrderIndex's default keyCol
    val total = indexed.agg(max(col(indexCol))).collect().head match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0) + 1L
    }
    val perShard = math.max(1L, (total + nShards - 1) / nShards)
    indexed.withColumn(shardCol,
      least(expr(s"`$indexCol` div $perShard"), lit(nShards - 1L)).cast("int"))
  }

  /** The per-stratum repetition weights [[mixByTokenBudget]] applies:
    * with per-stratum token totals T_s (one bounded map-side-combined
    * aggregate), the weight is `min(maxWeight, budget x frac_s / T_s)`
    * — i.e. each stratum is down- or up-sampled so its expected token
    * volume hits its share of the budget, with up-sampling capped
    * (repeating a tiny stratum hundreds of times degrades training
    * more than missing its quota). Strata absent from `fractions` or
    * with zero tokens get no weight (dropped by the mix default). */
  def tokenBudgetWeights(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], tokenBudget: Long,
      textCol: String = "text", tokenCount: Option[Column] = None,
      maxWeight: Double = 10.0): Map[String, Double] = {
    require(tokenBudget >= 1, s"tokenBudget >= 1, got $tokenBudget")
    require(fractions.values.forall(_ >= 0.0), "fractions must be non-negative")
    require(maxWeight > 0.0, s"maxWeight > 0, got $maxWeight")
    val n = tokenCount.getOrElse(TextAnalysis.tokenCount(col(textCol))).cast("long")
    val totals = df.groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(sum(n).as("__t"))
      .collect().flatMap(r =>
        Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    fractions.flatMap { case (s, frac) =>
      totals.get(s).filter(_ > 0L).map { t =>
        // operand order mirrors the oracle SQL bit-for-bit:
        // (budget * frac) / t, all IEEE double ops
        s -> math.min(maxWeight, tokenBudget * frac / t.toDouble)
      }
    }
  }

  /** Corpus mixing by TOKEN budget — the unit trainers actually
    * allocate ("300B tokens: 50% web, 30% code, 20% books"), not
    * document counts: compute [[tokenBudgetWeights]] from one bounded
    * per-stratum token aggregate, then apply them with
    * [[mixByWeight]]'s deterministic fractional oversampling (under
    * the shared "mix" salt). Expected output token volume per stratum
    * is `min(budget x frac, maxWeight x T_s)`; strata not named in
    * `fractions` are dropped. Scan-side after the one aggregate. */
  def mixByTokenBudget(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], tokenBudget: Long,
      textCol: String = "text", tokenCount: Option[Column] = None,
      maxWeight: Double = 10.0, seed: Int = 42): DataFrame =
    mixByWeight(df, idCol, stratumCol,
      tokenBudgetWeights(df, stratumCol, fractions, tokenBudget, textCol,
        tokenCount, maxWeight),
      default = 0.0, seed = seed)

  /** Deterministic training-sequence packing: assign every document a
    * (pack_group, pack_id, pack_offset) so documents of a pack are
    * consecutive in hash order and their token counts fill roughly
    * `tokenBudget` tokens per pack — the standard "concatenate docs up
    * to the context length" step before tokenize-and-chunk. Greedy bin
    * packing is inherently sequential, so the distributed form packs
    * WITHIN `groups` hash-partitioned streams: a cumulative token sum
    * over each group's (hash, id) order opens pack `b` where the
    * document STARTS (`b = floor(start_tokens / budget)`), so a pack
    * can overshoot the budget by less than one document — the
    * approximation every distributed packer makes. `pack_offset` is
    * the token position where the document starts within its pack.
    *
    * One shuffle on the group key + a per-group running-sum window;
    * `groups` bounds the window partition size (set it ≈ cluster
    * parallelism × a few). Deterministic across runs/engines under the
    * "pack" salt — reshuffling the cluster cannot change any pack.
    *
    * `tokenCount` overrides the budget unit: pass
    * [[TextAnalysis.bpeTokenCount]]`(col(textCol))` for the BPE-ish
    * estimate, or a precomputed column from a REAL tokenizer — packs
    * then track the counts your training job will actually see
    * (whitespace counts drift from BPE counts without bound on
    * code/CJK/punctuation-heavy text). Default: whitespace tokens. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      tokenBudget: Long, groups: Int = 1024, seed: Int = 42,
      tokenCount: Option[Column] = None): DataFrame = {
    require(tokenBudget >= 1, s"packSequences wants tokenBudget >= 1, got $tokenBudget")
    require(groups >= 1, s"packSequences wants groups >= 1, got $groups")
    val clobbered = Seq("pack_group", "pack_id", "pack_offset", "__start")
      .filter(df.columns.contains)
    require(clobbered.isEmpty,
      s"packSequences writes ${clobbered.mkString(", ")}; rename the existing column(s) first")
    val h = unitHash(col(idCol), seed, "pack")
    val n = tokenCount.getOrElse(TextAnalysis.tokenCount(col(textCol))).cast("long")
    // pack_group is materialized BEFORE the window and the window
    // partitions by the COLUMN, not the expression: the window's
    // output partitioning is then hashpartitioning(pack_group)
    // itself, so every downstream consumer keyed on a (pack_group,
    // ...) superset — the materialize/stats aggregations, chunkPacks'
    // within-pack window — reuses THIS exchange instead of
    // re-shuffling the corpus (PlanSpec pins the family's exchange
    // counts). Partitioning by the raw pmod expression is the same
    // grouping, but Spark cannot prove the later pack_group alias
    // equal to the window's internally-extracted partition attribute.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_group"))
      .orderBy(h.asc, col(idCol).asc)
    // the running sum is materialized ONCE: deriving pack_id and
    // pack_offset from it in later projections (instead of repeating
    // `sum().over(w)` per column) keeps the plan at a single Window
    // operator over a single group-keyed exchange (PlanSpec-pinned)
    df.withColumn("pack_group", pmod(h, lit(groups.toLong)).cast("int"))
      .withColumn("__start", sum(n).over(w) - n) // tokens before this doc
      .withColumn("pack_id", floor(col("__start") / tokenBudget))
      .withColumn("pack_offset",
        col("__start") - floor(col("__start") / tokenBudget) * tokenBudget)
      .drop("__start")
  }

  /** Materialize [[packSequences]] assignments into actual training
    * sequences: one row per pack with its documents concatenated in
    * pack order (pack_offset, then id for the zero-token ties). One
    * map-side-combinable aggregation keyed on (pack_group, pack_id);
    * collect_list is order-unstable under retries, so the struct array
    * is sorted IN the aggregation row before joining — the output is
    * bit-deterministic like the assignment itself. */
  def materializePacks(assigned: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sep: String = " "): DataFrame =
    assigned
      .groupBy("pack_group", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("pack_offset"), col(idCol).as("__id"), col(textCol).as("__t")))),
            x => x.getField("__t")),
          sep).as(textCol))

  /** Packing-efficiency stats, one row per pack — the numbers a
    * trainer reads BEFORE launching: how many documents and tokens
    * each [[packSequences]] assembly carries, how many fixed-length
    * sequences chunking at `seqLen` will cut from it, and how many pad
    * tokens its final partial sequence will waste (= tokens LOST if
    * `dropPartial` instead). Count tokens with the SAME `tokenCount`
    * the assignment was budgeted with. A pack's token total can exceed
    * its budget: a document belongs wholly to the pack where its first
    * token lands, so the last document spills past the boundary rather
    * than splitting — chunk/pad numbers therefore account against
    * `seqLen`, not the budget. One aggregation keyed
    * (pack_group, pack_id), the same map-side-combinable shape as
    * [[materializePacks]]. */
  def packStats(assigned: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", seqLen: Int = 2048,
      tokenCount: Option[Column] = None): DataFrame = {
    require(seqLen >= 1, s"packStats wants seqLen >= 1, got $seqLen")
    val needed = Seq("pack_group", "pack_id")
      .filterNot(assigned.columns.contains)
    require(needed.isEmpty,
      s"packStats wants a packSequences frame; missing ${needed.mkString(", ")}")
    val n = tokenCount.getOrElse(TextAnalysis.tokenCount(col(textCol))).cast("long")
    assigned
      .groupBy("pack_group", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(n).as("n_tokens"))
      // integer `div`, not `/`: Column./ is double division and a
      // float quotient could mis-round at large token counts
      .withColumn("n_chunks",
        expr(s"(n_tokens + ${seqLen - 1}L) div ${seqLen}L"))
      .withColumn("pad_tokens",
        (lit(seqLen.toLong) - pmod(col("n_tokens"), lit(seqLen.toLong)))
          % seqLen.toLong)
  }

  /** The corpus-level rollup of [[packStats]], ONE row: pack/doc/token
    * totals, mean fill against the assignment's `tokenBudget`, and the
    * padded-training utilization at `seqLen`
    * (total / (total + pad) — the fraction of trained-on positions
    * that are real data). Sum/count division, no float accumulation;
    * one bounded aggregate over the per-pack frame. */
  def packReport(assigned: DataFrame, tokenBudget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      seqLen: Int = 2048, tokenCount: Option[Column] = None): DataFrame = {
    require(tokenBudget >= 1, s"packReport wants tokenBudget >= 1, got $tokenBudget")
    packStats(assigned, idCol, textCol, seqLen, tokenCount)
      .agg(
        count(lit(1)).as("n_packs"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chunks")).as("total_chunks"),
        sum(col("pad_tokens")).as("pad_tokens"))
      .select(col("n_packs"), col("n_docs"), col("total_tokens"),
        col("total_chunks"), col("pad_tokens"),
        (col("total_tokens").cast("double") / (col("n_packs") * tokenBudget))
          .as("mean_fill"),
        (col("total_tokens").cast("double")
          / (col("total_tokens") + col("pad_tokens"))).as("utilization"))
  }

  /** Slice [[packSequences]] assignments into fixed-length training
    * sequences of EXACTLY `seqLen` whitespace tokens (the last chunk
    * of each pack may be shorter; `dropPartial` discards it) with
    * doc-boundary bookkeeping: each output row carries `boundaries`,
    * an array of (id, begin_token, end_token) in chunk-local token
    * coordinates recording which document contributed which token
    * span — what a loss-masking / attention-separation training setup
    * reads. A document whose tokens straddle a chunk edge is split
    * across both chunks, like the real concatenate-then-chunk step.
    *
    * Token coordinates are WHITESPACE-token positions — the only
    * tokenization expressible engine-side. When the assignment was
    * budgeted with a real-tokenizer `tokenCount`, treat these chunks
    * as pre-chunks for the tokenizer-side slicer; the budget then
    * tracks real counts but exact slicing must happen where the
    * tokenizer lives. Zero-token documents contribute no tokens and
    * appear in no chunk's boundaries.
    *
    * Cost: one exchange keyed (pack_group, pack_id) feeding the
    * within-pack offset window; the per-chunk reassembly aggregation
    * reuses that partitioning (its keys are a superset), so no second
    * exchange — same two-exchange total as assignment +
    * [[materializePacks]]. Only token-sliced rows shuffle, and each
    * document explodes into at most ceil(n/seqLen)+1 chunk slices. */
  def chunkPacks(assigned: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", seqLen: Int = 2048, sep: String = " ",
      dropPartial: Boolean = false): DataFrame = {
    require(seqLen >= 1, s"chunkPacks wants seqLen >= 1, got $seqLen")
    val needed = Seq("pack_group", "pack_id", "pack_offset")
      .filterNot(assigned.columns.contains)
    require(needed.isEmpty,
      s"chunkPacks wants a packSequences frame; missing ${needed.mkString(", ")}")
    val clobbered = Seq("seq_idx", "n_tokens", "boundaries")
      .filter(assigned.columns.contains)
    require(clobbered.isEmpty,
      s"chunkPacks writes ${clobbered.mkString(", ")}; rename the existing column(s) first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_group"), col("pack_id"))
      .orderBy(col("pack_offset").asc, col(idCol).asc)
    // concatenation-order offset within the pack: pack_offset is a
    // budget-relative coordinate (an overshooting document shifts its
    // successors into the next pack at a nonzero offset), so the
    // chunk math needs the true running sum in pack order
    val withOff = assigned
      .withColumn("__toks", graft.functions.WsTokens.of(col(textCol)))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__off", sum(col("__n")).over(w) - col("__n"))
    val sliced = withOff
      .filter(col("__n") > 0)
      .select(col("pack_group"), col("pack_id"), col(idCol),
        col("__toks"), col("__n"), col("__off"),
        explode(sequence(
          floor(col("__off") / seqLen),
          floor((col("__off") + col("__n") - 1) / seqLen))).as("seq_idx"))
      .withColumn("__tokStart",
        greatest(lit(0L), col("seq_idx") * seqLen - col("__off")))
      .withColumn("__tokEnd",
        least(col("__n"), (col("seq_idx") + 1) * seqLen - col("__off")))
      .withColumn("__begin",
        col("__off") + col("__tokStart") - col("seq_idx") * seqLen)
      .select(col("pack_group"), col("pack_id"), col("seq_idx"), col(idCol),
        col("__begin"),
        (col("__begin") + col("__tokEnd") - col("__tokStart")).as("__end"),
        array_join(slice(col("__toks"), (col("__tokStart") + 1).cast("int"),
          (col("__tokEnd") - col("__tokStart")).cast("int")), sep).as("__t"))
    // struct field order begin-first: array_sort orders slices by their
    // chunk position (begins are distinct — slices never overlap)
    val chunks = sliced
      .groupBy("pack_group", "pack_id", "seq_idx")
      .agg(
        sum(col("__end") - col("__begin")).as("n_tokens"),
        array_sort(collect_list(struct(col("__begin"), col(idCol).as("__id"),
          col("__end"), col("__t")))).as("__parts"))
      .withColumn(textCol,
        array_join(transform(col("__parts"), x => x.getField("__t")), sep))
      .withColumn("boundaries", transform(col("__parts"),
        x => struct(x.getField("__id").as(idCol),
          x.getField("__begin").as("begin_token"),
          x.getField("__end").as("end_token"))))
      .drop("__parts")
    if (dropPartial) chunks.filter(col("n_tokens") === seqLen.toLong) else chunks
  }
}
