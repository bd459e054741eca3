package graft

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.operators.AsOfJoin.{Spec, Strategy}

class AsOfJoinSpec extends SparkFunSuite {
  import spark.implicits._

  // labels: 3 users, various times; rowid pre-assigned
  private lazy val labels: DataFrame = Seq(
    (1L, 1L, "2024-01-10 00:00:00"),
    (2L, 1L, "2024-01-20 00:00:00"),
    (3L, 2L, "2024-01-05 00:00:00"),
    (4L, 3L, "2024-01-15 00:00:00") // user 3 has no features
  ).toDF(AsOfJoin.RowIdCol, "user_id", "lt")
    .withColumn("lt", $"lt".cast("timestamp"))

  private lazy val features: DataFrame = Seq(
    (1L, "2024-01-01 00:00:00", 10.0),
    (1L, "2024-01-10 00:00:00", 20.0), // exactly at label 1's time
    (1L, "2024-01-15 00:00:00", 30.0),
    (2L, "2023-01-01 00:00:00", 99.0) // > lookback for label 3 w/ short lookback
  ).toDF("user_id", "ft", "value")
    .withColumn("ft", $"ft".cast("timestamp"))

  private def spec(
      inclusive: Boolean = false,
      embargo: Duration = Duration.ZERO,
      lookback: Option[Duration] = Some(Duration.ofDays(365)),
      staleness: Option[Duration] = None) =
    Spec(Seq("user_id"), Seq("user_id"), "lt", "ft", Seq("value"),
      inclusive, embargo, lookback, staleness)

  private def run(s: Spec, strat: Strategy): Map[Long, (Option[java.sql.Timestamp], Option[Double])] =
    AsOfJoin.join(labels, features, s, strat)
      .collect()
      .map { r =>
        val id = r.getLong(r.fieldIndex(AsOfJoin.RowIdCol))
        val ft = Option(r.getAs[java.sql.Timestamp]("feature_time"))
        val v = Option(r.getAs[Any]("value")).map(_.asInstanceOf[Double])
        id -> (ft, v)
      }.toMap

  for (strat <- Seq(Strategy.RowNumber, Strategy.UnionAsOf)) {
    val n = strat.toString

    test(s"$n: strict excludes feature at exactly label_time") {
      val r = run(spec(), strat)
      assert(r(1L) == (Some(ts("2024-01-01 00:00:00")), Some(10.0)))
    }

    test(s"$n: inclusive includes feature at exactly label_time") {
      val r = run(spec(inclusive = true), strat)
      assert(r(1L) == (Some(ts("2024-01-10 00:00:00")), Some(20.0)))
    }

    test(s"$n: picks latest prior, not first") {
      val r = run(spec(), strat)
      assert(r(2L) == (Some(ts("2024-01-15 00:00:00")), Some(30.0)))
    }

    test(s"$n: embargo shifts the upper bound") {
      val r = run(spec(embargo = Duration.ofDays(6)), strat)
      // label 2 at 01-20, embargo 6d -> bound 01-14 -> latest is 01-10
      assert(r(2L) == (Some(ts("2024-01-10 00:00:00")), Some(20.0)))
    }

    test(s"$n: unmatched labels survive with nulls") {
      val r = run(spec(), strat)
      assert(r(4L) == (None, None))
      assert(r.size == 4)
    }

    test(s"$n: lookback floors the window") {
      val r = run(spec(lookback = Some(Duration.ofDays(30))), strat)
      // label 3 (user 2, 2024-01-05): only feature is 2023-01-01 (370d prior)
      // -> out of window at 30d (and even at the 365d default)
      assert(r(3L) == (None, None))
      val rDefault = run(spec(), strat)
      assert(rDefault(3L) == (None, None))
      // a 400d lookback admits it
      val r2 = run(spec(lookback = Some(Duration.ofDays(400))), strat)
      assert(r2(3L) == (Some(ts("2023-01-01 00:00:00")), Some(99.0)))
    }

    test(s"$n: staleness floors tighter than lookback") {
      val r = run(spec(staleness = Some(Duration.ofDays(3))), strat)
      // label 2 at 01-20 with 3d staleness: latest feature 01-15 is too old
      assert(r(2L) == (None, None))
    }

    test(s"$n: strict at zero embargo with duplicate label rows") {
      // two labels same (user, time) must each get a row
      val dup = labels.union(labels.filter(col(AsOfJoin.RowIdCol) === 1L)
        .withColumn(AsOfJoin.RowIdCol, lit(99L)))
      val out = AsOfJoin.join(dup, features, spec(), strat)
      assert(out.count() == 5)
    }
  }

  test("null label times keep their rows with null features (all strategies)") {
    val lblWithNull = labels.union(
      Seq((50L, 1L, null.asInstanceOf[String]))
        .toDF(AsOfJoin.RowIdCol, "user_id", "lt")
        .withColumn("lt", $"lt".cast("timestamp")))
    for (strat <- Seq(Strategy.RowNumber, Strategy.UnionAsOf,
        Strategy.UnionAsOfSegmented(Duration.ofDays(1)))) {
      val out = AsOfJoin.join(lblWithNull, features, spec(), strat).collect()
      assert(out.length == 5)
      val nullRow = out.find(_.getLong(0) == 50L).get
      assert(nullRow.isNullAt(nullRow.fieldIndex("feature_time")))
      assert(nullRow.isNullAt(nullRow.fieldIndex("value")))
    }
  }

  test("strategies agree on a randomized frame") {
    val n = 2000
    val feats = spark.range(n).select(
      (col("id") % 37).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 7919L * 1000000L).as("ft"),
      (col("id") * 13 % 101).cast("double").as("value"))
    val lbls = spark.range(300).select(
      col("id").as(AsOfJoin.RowIdCol),
      (col("id") % 41).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 104729L * 1000000L).as("lt"))
    val s = spec(embargo = Duration.ofHours(12), staleness = Some(Duration.ofDays(30)))
    val a = AsOfJoin.join(lbls, feats, s, Strategy.RowNumber)
      .select(AsOfJoin.RowIdCol, "feature_time", "value")
    val b = AsOfJoin.join(lbls, feats, s, Strategy.UnionAsOf)
      .select(AsOfJoin.RowIdCol, "feature_time", "value")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == 300)
  }

  test("segmented union as-of equals plain union as-of, including a hot key") {
    // one hot key (90% of rows) + long tail; unique times per key
    val feats = spark.range(5000).select(
      when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 37 + 2).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 977L * 1000000L).as("ft"),
      (col("id") % 101).cast("double").as("value"))
    val lbls = spark.range(400).select(
      col("id").as(AsOfJoin.RowIdCol),
      when(col("id") % 5 =!= 0, lit(1L)).otherwise(col("id") % 41 + 2).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 13441L * 1000000L).as("lt"))
    for (bucketHours <- Seq(1L, 24L, 24L * 365)) {
      val s = spec(embargo = Duration.ofHours(3), staleness = Some(Duration.ofDays(7)))
      val plain = AsOfJoin.unionAsOf(lbls, feats, s)
        .select(AsOfJoin.RowIdCol, "feature_time", "value")
      val seg = AsOfJoin.unionAsOfSegmented(lbls, feats, s,
        Duration.ofHours(bucketHours))
        .select(AsOfJoin.RowIdCol, "feature_time", "value")
      assert(seg.count() == 400)
      assert(plain.exceptAll(seg).isEmpty && seg.exceptAll(plain).isEmpty,
        s"bucket=${bucketHours}h diverged")
    }
  }

  test("segmented multi carry equals plain multi carry, including a hot key") {
    // two right sides with distinct value types; one hot key in each
    val f1 = spark.range(4000).select(
      when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 37 + 2).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 977L * 1000000L).as("t1"),
      (col("id") % 101).cast("double").as("v1"))
    val f2 = spark.range(2500).select(
      when(col("id") % 8 =!= 0, lit(1L)).otherwise(col("id") % 29 + 2).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1381L * 1000000L).as("t2"),
      concat(lit("s"), (col("id") % 13).cast("string")).as("v2"))
    val lbls = spark.range(400).select(
      col("id").as(AsOfJoin.RowIdCol),
      when(col("id") % 5 =!= 0, lit(1L)).otherwise(col("id") % 41 + 2).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 13441L * 1000000L).as("lt"))
    val s = spec(embargo = Duration.ofHours(3), staleness = Some(Duration.ofDays(7)))
      .copy(valueCols = Nil)
    val rights = Seq(
      AsOfJoin.MultiRight(f1, Seq("user_id"), "t1", Seq("v1"), Seq("ft1")),
      AsOfJoin.MultiRight(f2, Seq("user_id"), "t2", Seq("v2"), Seq("ft2")))
    val plain = AsOfJoin.unionAsOfMulti(lbls, rights, s)
    for (bucketHours <- Seq(1L, 24L, 24L * 365)) {
      val seg = AsOfJoin.unionAsOfMultiSegmented(lbls, rights, s,
        Duration.ofHours(bucketHours))
      assert(seg.count() == 400)
      assert(plain.exceptAll(seg).isEmpty && seg.exceptAll(plain).isEmpty,
        s"bucket=${bucketHours}h diverged from plain multi carry")
    }
    // the multi probe sees the hot key across the unioned sides
    val probing = AsOfJoin.AutoConfig(probeMinBytes = 0L, probeFraction = 1.0,
      skewRowsPerKey = 2000L, targetRowsPerBucket = 500L)
    AsOfJoin.autoStrategyMulti(rights, probing) match {
      case Strategy.UnionAsOfSegmented(_) => // expected
      case other => fail(s"expected segmented from the multi probe, got $other")
    }
    // default config: size gate skips the probe for small batches
    assert(AsOfJoin.autoStrategyMulti(rights) == Strategy.UnionAsOf)
  }

  test("Auto probes the key histogram and escapes a hot key to segmented") {
    // 1 key = 90% of rows, spread over ~20000s; cold keys take the rest
    val feats = spark.range(20000).select(
      when(col("id") < 18000, lit(7L)).otherwise(col("id") % 50 + 100).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L).as("ft"),
      (col("id") % 101).cast("double").as("value"))
    val lbls = spark.range(300).select(
      col("id").as(AsOfJoin.RowIdCol),
      when(col("id") % 2 === 0, lit(7L)).otherwise(col("id") % 50 + 100).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 67L * 1000000L).as("lt"))
    val s = spec(staleness = Some(Duration.ofDays(7)))
    val probing = AsOfJoin.AutoConfig(probeMinBytes = 0L, probeFraction = 1.0,
      skewRowsPerKey = 5000L, targetRowsPerBucket = 1000L)

    // decision: hot key (18000 rows > 5000) -> segmented, bucket sized
    // from the hot key's span so ~targetRowsPerBucket rows per bucket
    AsOfJoin.autoStrategy(feats, s, probing) match {
      case Strategy.UnionAsOfSegmented(b) =>
        assert(b.toMillis >= 500000L && b.toMillis <= 2000000L,
          s"bucket $b not sized from the 17999s hot-key span / 18 buckets")
      case other => fail(s"expected segmented for the hot key, got $other")
    }
    // a uniform key histogram stays on the plain carry
    val uniform = feats.withColumn("user_id", col("value").cast("long") * 7919)
    assert(AsOfJoin.autoStrategy(uniform, s, probing) == Strategy.UnionAsOf)
    // default config skips the probe entirely for a small side
    assert(AsOfJoin.autoStrategy(feats, s) == Strategy.UnionAsOf)

    // end-to-end: Auto output is identical to the plain union carry
    val auto = AsOfJoin.join(lbls, feats, s, Strategy.Auto, probing)
      .select(AsOfJoin.RowIdCol, "feature_time", "value")
    val plain = AsOfJoin.unionAsOf(lbls, feats, s)
      .select(AsOfJoin.RowIdCol, "feature_time", "value")
    assert(auto.count() == 300)
    assert(plain.exceptAll(auto).isEmpty && auto.exceptAll(plain).isEmpty,
      "Auto (segmented) diverged from unionAsOf")
  }

  test("Auto probe decision is memoized: repeated joins of one frame run one probe") {
    // a caller looping single Auto joins over one large frame (or an
    // audit rebuilding N features from one source) must pay ONE sampled
    // histogram job per distinct plan, not one per call
    val feats = spark.range(30000).select(
      when(col("id") < 27000, lit(7L)).otherwise(col("id") % 50 + 100).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 990000L).as("ft"),
      (col("id") % 101).cast("double").as("value"))
    val s = spec(staleness = Some(Duration.ofDays(7)))
    // distinct config (seed) so earlier suites' memo entries can't alias
    val probing = AsOfJoin.AutoConfig(probeMinBytes = 0L, probeFraction = 1.0,
      skewRowsPerKey = 5000L, targetRowsPerBucket = 1000L, probeSeed = 0xC0FFEE)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // the listener bus delivers asynchronously (and is private[spark]):
    // poll the counter until it holds still before reading it
    def settled(): Int = {
      var last = -1
      var same = 0
      var waited = 0
      while (same < 3 && waited < 10000) {
        Thread.sleep(100); waited += 100
        val v = jobs.get()
        if (v == last) same += 1 else { same = 0; last = v }
      }
      last
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val first = AsOfJoin.autoStrategy(feats, s, probing)
      val afterFirst = settled()
      assert(afterFirst > 0, "probing config on a hot frame must run the probe job")
      val repeats = (1 to 3).map(_ => AsOfJoin.autoStrategy(feats, s, probing))
      assert(settled() == afterFirst,
        s"repeated Auto resolution re-ran the probe: ${jobs.get()} jobs vs $afterFirst")
      assert(repeats.forall(_ == first), "memoized decision diverged")
      // clearProbeMemo drops the decision: the next resolution re-probes
      // (the escape hatch for sessions that rewrite a joined source)
      AsOfJoin.clearProbeMemo()
      assert(AsOfJoin.autoStrategy(feats, s, probing) == first)
      assert(settled() > afterFirst,
        "clearProbeMemo must force a fresh probe job on the next resolution")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("Auto hot-key escape works on TIMESTAMP_NTZ sort columns") {
    // NTZ is a first-class input (DuckDB-written parquet); the probe
    // marks it bucketable, so the segmented carry it escapes to must
    // bucket it without crashing (unix_micros alone rejects NTZ —
    // bucketMicros casts first). Regression: pre-fix this threw
    // DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE from the DEFAULT strategy.
    val feats = spark.range(20000).select(
      when(col("id") < 18000, lit(7L)).otherwise(col("id") % 50 + 100).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L)
        .cast("timestamp_ntz").as("ft"),
      (col("id") % 101).cast("double").as("value"))
    val lbls = spark.range(300).select(
      col("id").as(AsOfJoin.RowIdCol),
      when(col("id") % 2 === 0, lit(7L)).otherwise(col("id") % 50 + 100).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 67L * 1000000L)
        .cast("timestamp_ntz").as("lt"))
    val s = spec(staleness = Some(Duration.ofDays(7)))
    val probing = AsOfJoin.AutoConfig(probeMinBytes = 0L, probeFraction = 1.0,
      skewRowsPerKey = 5000L, targetRowsPerBucket = 1000L)
    // the probe still sees the hot key through NTZ values
    AsOfJoin.autoStrategy(feats, s, probing) match {
      case Strategy.UnionAsOfSegmented(_) => // expected
      case other => fail(s"expected segmented for the NTZ hot key, got $other")
    }
    // end-to-end: Auto (segmented, NTZ-bucketed) equals the plain carry
    val auto = AsOfJoin.join(lbls, feats, s, Strategy.Auto, probing)
      .select(AsOfJoin.RowIdCol, "feature_time", "value")
    val plain = AsOfJoin.unionAsOf(lbls, feats, s)
      .select(AsOfJoin.RowIdCol, "feature_time", "value")
    assert(auto.count() == 300)
    assert(plain.exceptAll(auto).isEmpty && auto.exceptAll(plain).isEmpty,
      "Auto (segmented over NTZ) diverged from unionAsOf")
  }

  test("all-null feature values are carried as null (not skipped back)") {
    val f2 = Seq(
      (1L, "2024-01-01 00:00:00", Some(7.0)),
      (1L, "2024-01-09 00:00:00", None: Option[Double])
    ).toDF("user_id", "ft", "value").withColumn("ft", $"ft".cast("timestamp"))
    for (strat <- Seq(Strategy.RowNumber, Strategy.UnionAsOf)) {
      val out = AsOfJoin.join(labels.filter(col(AsOfJoin.RowIdCol) === 1L), f2, spec(), strat)
      val row = out.collect().head
      // latest row (01-09) wins even though its value is null
      assert(row.getAs[java.sql.Timestamp]("feature_time") == ts("2024-01-09 00:00:00"))
      assert(row.isNullAt(row.fieldIndex("value")))
    }
  }
}
