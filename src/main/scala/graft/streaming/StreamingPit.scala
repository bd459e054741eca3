package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming extensions of the point-in-time engine — beyond the
  * batch-only reference (SURVEY §2.9), using Structured Streaming:
  *
  *  - [[leakMonitor]]: a continuous temporal audit — watermarked
  *    windowed counts of invariant violations on an event stream that
  *    carries both label_time and feature_time.
  *  - [[StreamingAsOf.enrich]]: stateful streaming as-of join via
  *    `flatMapGroupsWithState` — per key, keep the latest feature
  *    values in state; each arriving label event is enriched with the
  *    newest feature whose `feature_time < label_time - embargo`.
  *    State holds a bounded buffer (not just the latest row) so a
  *    feature that is still embargoed for one label can serve a later
  *    one; entries older than `retention` are pruned on every update.
  *  - [[streamingQualityGate]]: the batch curation scan's one-pass
  *    hygiene verdict kernel on a live stream — stateless, shuffle-
  *    free, verdicts bit-identical to the batch pipeline.
  *  - [[streamingExactDedup]]: watermark-bounded exact dedup of a
  *    document stream (`dropDuplicatesWithinWatermark` on the content
  *    fingerprint).
  *  - [[streamingNearDupHits]]: MinHash/LSH near-dup detection on a
  *    live ingest feed — the batch banding made incremental with
  *    per-bucket state, a maxBucket degenerate guard, and event-time
  *    eviction.
  *
  * Caveat (documented, tested): within a micro-batch, arrival order
  * inside a key group is the event order Spark hands the group — the
  * operator sorts each group's batch by event time before folding, so
  * out-of-order arrival WITHIN a batch is handled; late data across
  * batches beyond `retention` is dropped, the same trade every
  * watermarked stateful op makes.
  */
object StreamingPit {

  /** Windowed violation counts: one row per (window, feature) with the
    * number of rows where feature_time >= label_time. Append-safe with
    * the given watermark. */
  def leakMonitor(
      events: DataFrame,
      labelTimeCol: String,
      featureTimeCol: String,
      watermark: String = "10 minutes",
      window: String = "5 minutes"
  ): DataFrame =
    events
      .withWatermark(labelTimeCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(labelTimeCol), window))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(featureTimeCol).isNotNull &&
          col(featureTimeCol) >= col(labelTimeCol), 1L).otherwise(0L))
          .as("n_leaky"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_rows"), col("n_leaky"))

  /** Streaming corpus-hygiene gate: the SAME one-pass verdict kernel
    * the batch curation scan runs ([[graft.ops.QualityFilters.hygieneSpec]]
    * → the codegen hygiene_verdict expression), applied to an
    * unbounded document stream. The kernel is a stateless scan-side
    * expression, so the gate adds NO streaming state, needs no
    * watermark, and causes no shuffle — every micro-batch pays exactly
    * the batch scan cost, and verdicts are bit-identical to what the
    * batch pipeline assigns the same text (first-failing-stage code,
    * 0 = passed everything). Returns all rows annotated with
    * `hygiene_verdict`; with `passedOnly` (default) failing rows are
    * dropped — keep them by passing false and routing on the verdict
    * (e.g. a dead-letter sink per failed stage). */
  def streamingQualityGate(
      docs: DataFrame,
      textCol: String,
      c4: Option[(Int, Int)] = None,
      gopher: Option[graft.ops.QualityFilters.GopherConfig] = None,
      repetition: Option[graft.ops.QualityFilters.RepetitionConfig] = None,
      minQuality: Double = 0.0,
      languages: Seq[String] = Nil,
      passedOnly: Boolean = true): DataFrame = {
    val spec = graft.ops.QualityFilters.hygieneSpec(
      c4, gopher, repetition, minQuality, languages)
    val out = docs.withColumn("hygiene_verdict",
      graft.functions.Hygiene.hygieneVerdictOf(col(textCol), spec))
    if (passedOnly)
      out.filter(col("hygiene_verdict") === graft.functions.Hygiene.PassVerdict)
    else out
  }

  /** Streaming exact dedup: drop documents whose content fingerprint
    * was already seen, with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` — state for a fingerprint is
    * held only while late arrivals could still reference it; the
    * unbounded-state alternative is exactly what kills streaming dedup
    * at scale). `eventTimeCol` must be an event-time column. */
  def streamingExactDedup(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      watermark: String = "1 hour"
  ): DataFrame = {
    val fp = docs
      .withColumn("__fp", graft.ops.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
    // NULL-text rows have a NULL fingerprint, and dropDuplicates*
    // treats NULL keys as EQUAL — without the split, 100 distinct
    // image-only docs in a mixed corpus would collapse to one. They
    // carry no content to dedup on, so they pass through unchanged.
    fp.filter(col("__fp").isNotNull).dropDuplicatesWithinWatermark("__fp")
      .union(fp.filter(col("__fp").isNull))
      .drop("__fp")
  }

  final case class BandedDoc(
      band: Int, bucket: String, id: Long, sig: Seq[String], eventTime: Timestamp)

  final case class BucketMembers(
      ids: List[Long], sigs: List[List[String]], newestMs: Long)

  /** One near-dup sighting: `id` collided with prior document
    * `against` in (band, bucket) with MinHash-estimated Jaccard
    * `best_est` >= the query's threshold. Grain is (id, band) — a
    * document similar on several bands reports once per colliding
    * band; consumers needing distinct ids dedup downstream. */
  final case class NearDupHit(
      id: Long, band: Int, bucket: String, best_est: Double, against: Long)

  /** Streaming near-duplicate detection — the MinHash/LSH monitor for
    * a live ingest feed: each arriving document's signature is checked
    * against the PRIOR members of every LSH bucket it lands in, and a
    * [[NearDupHit]] is emitted when the estimated Jaccard reaches
    * `threshold`. The batch operator's banding exactly
    * ([[graft.ops.Dedup.lshBucketsFromSigs]]' md5-of-band-slice
    * buckets, shingle-less documents dropped — no similarity
    * evidence), made incremental: state per (band, bucket) holds the
    * bucket's member signatures, capped at `maxBucket` (the
    * degenerate-bucket guard — past the cap new members are compared
    * against the retained prefix but not added, so per-event work
    * stays bounded on pathological buckets), and evicted by an
    * EVENT-TIME timer once the watermark passes the bucket's newest
    * arrival plus `retention` — state is bounded by buckets ACTIVE
    * within the horizon, not buckets ever seen.
    *
    * "Prior" = earlier (eventTime, id) within a micro-batch, arrival
    * order across batches — the same guarantee streaming exact dedup
    * gives. `idCol` must be castable to long (hash string ids first).
    */
  def streamingNearDupHits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      eventTimeCol: String,
      k: Int = 16,
      bands: Int = 4,
      n: Int = 3,
      threshold: Double = 0.5,
      watermark: String = "1 hour",
      retention: Duration = Duration.ofHours(1),
      maxBucket: Int = 1000
  ): Dataset[NearDupHit] = {
    require(k % bands == 0, "k must divide into equal bands")
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    val sigCol = graft.ops.Dedup.minhashSignatureFromShingles(
      graft.ops.Dedup.shingles(col(textCol), n), k)
    val bandStructs = array(
      (0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          md5(
            concat_ws("|",
              slice(col("__sig"), b * rows + 1, rows)))
            .as("bucket"))
      }: _*)
    // the watermark is applied to the KEPT timestamp column after the
    // projections — tagging the input column and then projecting it
    // away would leave the stateful operator with no event-time column
    val banded = docs
      .select(col(idCol).cast("long").as("id"),
        col(eventTimeCol).cast("timestamp").as("eventTime"), sigCol.as("__sig"))
      // no shingles -> null signature -> no similarity evidence (the
      // batch operator drops these from bucketing identically)
      .filter(element_at(col("__sig"), 1).isNotNull)
      .select(explode(bandStructs).as("__b"),
        col("id"), col("__sig").as("sig"), col("eventTime"))
      .select(col("__b.band").as("band"), col("__b.bucket").as("bucket"),
        col("id"), col("sig"), col("eventTime"))
      .withWatermark("eventTime", watermark)
      .as[BandedDoc]
    val retentionMs = retention.toMillis
    banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, String), events: Iterator[BandedDoc],
         state: GroupState[BucketMembers]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketMembers(Nil, Nil, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
            events.toArray.sortBy(d => (d.eventTime.getTime, d.id)).foreach { d =>
              val sigList = d.sig.toList
              var bestEst = -1.0
              var bestId = Long.MaxValue
              st.ids.zip(st.sigs).foreach { case (pid, psig) =>
                var eq = 0
                var i = 0
                while (i < k) { if (sigList(i) == psig(i)) eq += 1; i += 1 }
                val est = eq.toDouble / k
                if (est > bestEst || (est == bestEst && pid < bestId)) {
                  bestEst = est; bestId = pid
                }
              }
              if (bestEst >= threshold)
                out += NearDupHit(d.id, key._1, key._2, bestEst, bestId)
              val newest = math.max(st.newestMs, d.eventTime.getTime)
              st =
                if (st.ids.size < maxBucket)
                  BucketMembers(d.id :: st.ids, sigList :: st.sigs, newest)
                else st.copy(newestMs = newest)
            }
            state.update(st)
            if (st.newestMs > Long.MinValue) {
              val target = math.max(st.newestMs + retentionMs,
                state.getCurrentWatermarkMs() + 1)
              state.setTimeoutTimestamp(target)
            }
            out.iterator
          }
        })
  }

  final case class Event(
      key: Long,
      eventTime: Timestamp,
      isLabel: Boolean,
      value: Double)

  final case class Enriched(
      key: Long,
      labelTime: Timestamp,
      featureTime: Option[Timestamp],
      value: Option[Double])

  final case class FeatureState(times: List[Long], values: List[Double])

  object StreamingAsOf {

    /** Fold one key group's new events (sorted by time) into state,
      * emitting one enriched row per label event. A key whose newest
      * event falls `retention` behind the watermark has its state
      * evicted by an EVENT-TIME timer — without this, state grows
      * monotonically with every key EVER seen (the per-event retention
      * prune only runs when that key receives another feature event,
      * which a dead key never does). Event-time (not processing-time)
      * timers: they fire as the watermark advances with the data, so
      * replays evict identically and an idle query schedules no
      * busy-loop batches. */
    def processGroup(embargoMs: Long, retentionMs: Long)(
        key: Long,
        events: Iterator[Event],
        state: GroupState[FeatureState]): Iterator[Enriched] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      var st = state.getOption.getOrElse(FeatureState(Nil, Nil))
      val out = scala.collection.mutable.ArrayBuffer.empty[Enriched]
      val sorted = events.toArray.sortBy(e => (e.eventTime.getTime, e.isLabel))
      // features before labels at equal time in the fold; the strict
      // `< label_time - embargo` bound still excludes the tie itself
      sorted.foreach { e =>
        if (e.isLabel) {
          val bound = e.eventTime.getTime - embargoMs
          // state is kept newest-first, so the first hit is the
          // newest feature strictly before the bound
          val idx = st.times.indexWhere(_ < bound)
          if (idx >= 0)
            out += Enriched(key, e.eventTime,
              Some(new Timestamp(st.times(idx))), Some(st.values(idx)))
          else out += Enriched(key, e.eventTime, None, None)
        } else {
          val cutoff = e.eventTime.getTime - retentionMs
          val kept = ((e.eventTime.getTime, e.value) :: st.times.zip(st.values))
            .filter(_._1 >= cutoff)
            .sortBy(-_._1) // newest-first even under cross-batch disorder
          st = FeatureState(kept.map(_._1), kept.map(_._2))
        }
      }
      state.update(st)
      // evict once the watermark passes the newest event this key has
      // seen plus the retention window — by then nothing in this state
      // could still match a label. Event-time (not processing-time)
      // timers: they fire as the watermark advances with the data, so
      // replays evict identically and an idle query schedules no
      // busy-loop batches (a processing-time timer keeps the query
      // triggering and processAllAvailable never quiesces).
      val newest = (st.times.headOption.toList ++
        sorted.map(_.eventTime.getTime)).maxOption
      newest.foreach { t =>
        // a timeout at-or-before the current watermark is rejected by
        // Spark — clamp forward one ms (the timer then fires on the
        // next batch, which is the right eviction moment anyway)
        val target = math.max(t + retentionMs, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(target)
      }
      out.iterator
    }

    /** Streaming as-of enrichment. `stream` is a Dataset[Event] mixing
      * feature rows (isLabel=false) and label rows (isLabel=true).
      * `watermarkDelay` is the allowed event lateness; a key's state is
      * evicted when the watermark passes its newest event plus
      * `retention` (a later label for it then joins as no-match — the
      * same answer the retention window gives), so state is bounded by
      * keys ACTIVE within the retention horizon, not keys ever seen. */
    def enrich(
        spark: SparkSession,
        stream: Dataset[Event],
        embargo: Duration = Duration.ZERO,
        retention: Duration = Duration.ofDays(365),
        watermarkDelay: Duration = Duration.ofHours(1)
    ): Dataset[Enriched] = {
      import spark.implicits._
      stream
        .withWatermark("eventTime", s"${watermarkDelay.getSeconds} seconds")
        .groupByKey(_.key)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          processGroup(embargo.toMillis, retention.toMillis))
    }
  }
}
