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
