package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, QualityFilters}

/** Dev tool: attribute the composed curation pass's wall clock to its
  * stages. `sbt "runMain graft.CurateProbe [nDocs]"` */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(300000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cp = BenchAccess.corpus(spark, nDocs)
    val docs = spark.read.parquet(cp)

    // per-job-description wall clock (curate labels its stage actions)
    val byDesc = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(j.properties.getProperty("spark.job.description")).getOrElse("?")
        starts.put(j.jobId, (d, System.nanoTime()))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null)
          byDesc.merge(s._1, (System.nanoTime() - s._2) / 1e9, (a, b) => a + b)
      }
    })
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val dur = (for {
          a <- s.stageInfo.submissionTime; b <- s.stageInfo.completionTime
        } yield (b - a) / 1000.0).getOrElse(-1.0)
        val cpu = s.stageInfo.taskMetrics.executorCpuTime / 1e9
        if (dur > 1.0)
          println(f"[curateprobe]   >> stage ${s.stageInfo.stageId} " +
            f"(${s.stageInfo.numTasks}t) wall=$dur%.1fs cpu=$cpu%.1fs " +
            s.stageInfo.name.take(90))
      }
    })
    def dumpDesc(): Unit = {
      import scala.jdk.CollectionConverters._
      byDesc.asScala.toSeq.sortBy(-_._2).foreach { case (d, t) =>
        println(f"[curateprobe]   $d%-40s ${t}%.2fs")
      }
      byDesc.clear()
    }
    def timed(label: String)(body: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = body
      println(f"[curateprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$r")
      dumpDesc()
    }
    def run(h: Curation.HygieneConfig, nd: Curation.NearDup = Curation.NearDup.MinhashLsh) =
      Curation.curate(docs, minQuality = 0.3, languages = Seq("en"),
        nearDupThreshold = 0.8, nearDup = nd, hygiene = h,
        hasher = Dedup.xxHash).stats.output

    timed("base (scan+exact+neardup)")(run(Curation.HygieneConfig(
      c4 = Some(Curation.C4Config()),
      gopher = Some(QualityFilters.GopherConfig()),
      repetition = Some(QualityFilters.RepetitionConfig()))))
    timed("+url")(run(Curation.HygieneConfig(
      c4 = Some(Curation.C4Config()),
      gopher = Some(QualityFilters.GopherConfig()),
      repetition = Some(QualityFilters.RepetitionConfig()),
      urlCol = Some("url"))))
    timed("+url+unigram (=bench row)")(run(Curation.HygieneConfig(
      c4 = Some(Curation.C4Config()),
      gopher = Some(QualityFilters.GopherConfig()),
      repetition = Some(QualityFilters.RepetitionConfig()),
      urlCol = Some("url"),
      unigram = Some(Curation.UnigramConfig()))))
    // step-by-step replica of curate's full bench-row config with
    // explicit wall timing per stage (job-description attribution is
    // unreliable: broadcast-pool threads inherit stale descriptions)
    locally {
      spark.catalog.clearCache()
      def step[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[curateprobe] step $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      val t = col("text")
      val vcol = QualityFilters.hygieneVerdict(t, Some((3, 5)),
        Some(QualityFilters.GopherConfig()), Some(QualityFilters.RepetitionConfig()),
        0.3, Seq("en"))
      val clean = QualityFilters.c4Text(t, 5)
      step("scan ledger")(docs.groupBy(vcol.as("__v")).count().collect())
      val scanKept = docs.filter(vcol === 0).withColumn("text", clean).cache()
      step("scanKept materialize")(scanKept.count())
      val canon = QualityFilters.canonicalizeUrl(col("url"))
      val usable = col("url").isNotNull && length(canon) > 0
      val keepers = QualityFilters.dedupByUrl(scanKept.filter(usable), "url", "doc_id")
        .select(col("keep_id").as("doc_id"))
      val urlKept = scanKept.filter(!usable)
        .unionByName(scanKept.filter(usable).join(keepers, Seq("doc_id"), "left_semi"))
      step("url dedup count")(urlKept.count())
      val exactKept = Dedup.exactDedup(urlKept, "text", "doc_id").cache()
      step("exact dedup count")(exactKept.count())
      val scored = QualityFilters.unigramLogProbs(exactKept, "doc_id", "text", None).cache()
      val bucketed = step("approxQuantile (scored materialize)")(
        QualityFilters.qualityBucketsApprox(scored, buckets = 3, relErr = 0.001))
      val keepIds = bucketed.filter(col("quality_bucket") <= 2).select(col("doc_id"))
      val uniKept = exactKept.join(keepIds, Seq("doc_id"), "left_semi").cache()
      step("unigram kept count")(uniKept.count())
      val (kk, bb) = Dedup.lshParamsFor(0.8)
      val pairs = Dedup.minhashJaccardPairs(uniKept, "doc_id", "text",
        k = kk, bands = bb, n = 3, threshold = 0.8, hasher = Dedup.xxHash).cache()
      step("pairs materialize")(pairs.count())
      val comps = step("components")(Dedup.connectedComponents(pairs))
      step("components count")(comps.count())
      val losers = comps.filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
      step("losers count")(losers.count())
      val curated = uniKept.join(losers, Seq("doc_id"), "left_anti")
      step("final count")(curated.count())
      step("final count again")(curated.count())
    }

    // near-dup pair generation alone over the scan survivors
    val verdict = QualityFilters.hygieneVerdict(col("text"),
      Some((3, 5)), Some(QualityFilters.GopherConfig()),
      Some(QualityFilters.RepetitionConfig()), 0.3, Seq("en"))
    val survivors = docs.filter(verdict === 0)
    val (k, bands) = Dedup.lshParamsFor(0.8)
    println(s"[curateprobe] lshParamsFor(0.8) = ($k, $bands)")
    timed("neardup pairs alone (k=" + k + ")")(
      Dedup.minhashJaccardPairs(survivors, "doc_id", "text",
        k = k, bands = bands, n = 3, threshold = 0.8, hasher = Dedup.xxHash).count())
    timed("neardup pairs alone (k=24,b=4)")(
      Dedup.minhashJaccardPairs(survivors, "doc_id", "text",
        k = 24, bands = 4, n = 3, threshold = 0.8, hasher = Dedup.xxHash).count())
    timed("exact dedup alone")(
      Dedup.exactDedup(survivors, "text", "doc_id").count())
    timed("unigram scoring alone") {
      val scored = QualityFilters.unigramLogProbs(survivors, "doc_id", "text", None)
      QualityFilters.qualityBucketsApprox(scored, buckets = 3, relErr = 0.001)
        .filter(col("quality_bucket") <= 2).count()
    }
    spark.stop()
  }
}
