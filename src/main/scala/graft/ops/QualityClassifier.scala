package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fastText-style quality classifier — the classifier leg of the
  * standard curation quartet (rule-based Gopher/C4, LM perplexity
  * bucketing, DSIR importance resampling, and this): logistic
  * regression over hashed unigram+bigram bucket counts, trained
  * positive-vs-negative — a small reference corpus against a sample of
  * the raw corpus, the GPT-3 / LLaMA-style recipe — then applied as a
  * per-document keep probability.
  *
  * Scale shape (the 100 TB contract):
  *  - TRAINING runs on BOUNDED frames: positives are the (small)
  *    reference corpus; negatives a deterministic
  *    [[Sampling.hashSample]] of the raw corpus. Feature vectors are
  *    sparse bucket-count vectors built under the SAME bucketing
  *    kernel the scorer uses ([[graft.functions.DsirScore]]), fit
  *    with spark.ml's LogisticRegression (distributed LBFGS). The
  *    vector materialization and ml machinery never touch the full
  *    corpus.
  *  - SCORING never touches spark.ml: the trained model is just
  *    (weights[B], intercept), and `w·x + b` over bucket COUNTS is
  *    exactly `Σ_gram w[bucket(gram)] + b` — the [[graft.functions.
  *    DsirScore]] kernel sum — so corpus scoring is ONE codegen'd
  *    kernel call per row plus a sigmoid, no join, no shuffle, no
  *    vector objects (PlanSpec-pinned scan-side like DSIR scoring).
  *  - The model persists as a one-row parquet (weights, intercept,
  *    hasher flag) via [[save]]/[[load]] — train once on the reference
  *    pair, score every future corpus drop.
  *
  * No DuckDB oracle exists for LBFGS, so the contract query is
  * rows-only and the behavior is pinned by OpsSpec instead: planted
  * separation, scoring-kernel equivalence against spark.ml's own
  * `transform` probabilities, save/load round-trip, and determinism
  * across refits.
  */
object QualityClassifier {

  /** A trained classifier: per-bucket log-odds weights + intercept.
    * `portableHash` records which bucketing the model was trained
    * under — scoring must use the same. */
  final case class Model(weights: Array[Double], intercept: Double,
      portableHash: Boolean) {
    require(weights.nonEmpty, "empty weight vector")
    def buckets: Int = weights.length
  }

  /** Sparse bucket-count feature vectors + binary labels for the
    * spark.ml fit. */
  private def labeled(df: DataFrame, textCol: String, buckets: Int,
      portableHash: Boolean, label: Double): DataFrame = {
    // null text ⇒ bucketsOf returns null ⇒ the udf receives null; map
    // it to the empty vector instead of NPEing the whole fit (JSONL
    // corpora with missing text fields hit this)
    val toVec = udf { (ids: Seq[Int]) =>
      val counts = scala.collection.mutable.TreeMap.empty[Int, Double]
      if (ids != null) ids.foreach(b => counts(b) = counts.getOrElse(b, 0.0) + 1.0)
      org.apache.spark.ml.linalg.Vectors.sparse(
        buckets, counts.keys.toArray, counts.values.toArray)
    }
    df.select(lit(label).as("label"),
      toVec(graft.functions.DsirScore.bucketsOf(
        Dsir.toks(col(textCol)), buckets, md5 = portableHash)).as("features"))
  }

  /** Train on a positive (reference) corpus vs a negative (raw
    * sample) corpus. Both frames should be bounded — sample the raw
    * corpus first ([[Sampling.hashSample]]); class imbalance is the
    * caller's policy. `standardization = false` keeps the weights in
    * raw bucket-count space so the scoring kernel can apply them
    * directly. */
  def train(positives: DataFrame, negatives: DataFrame,
      textCol: String = "text", buckets: Int = 65536,
      maxIter: Int = 100, regParam: Double = 1e-4, tol: Double = 1e-5,
      portableHash: Boolean = false): Model = {
    require(buckets >= 1 && buckets <= Dsir.MaxBuckets,
      s"buckets must be in [1, ${Dsir.MaxBuckets}], got $buckets")
    val data = labeled(positives, textCol, buckets, portableHash, 1.0)
      .unionByName(labeled(negatives, textCol, buckets, portableHash, 0.0))
    // every LBFGS knob pinned EXPLICITLY (maxIter, tol, regParam): the
    // fit's iteration count — hence its wall-clock and the model it
    // converges to — must not float with a spark.ml default change
    // between versions. tol 1e-5 (vs spark's 1e-6 default) stops the
    // long convergence tail: the scoring kernel quantizes probabilities
    // through a sigmoid, where a 1e-5-scale objective wobble is
    // invisible, and it bounds the fit's bench variance.
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter)
      .setTol(tol)
      .setRegParam(regParam)
      .setStandardization(false)
    val fit = lr.fit(data)
    Model(fit.coefficients.toArray, fit.intercept, portableHash)
  }

  /** Append `probCol` = P(quality | doc) — sigmoid of the kernel sum
    * plus intercept. Pure scan-side: no join, no shuffle. */
  def score(df: DataFrame, model: Model, textCol: String = "text",
      probCol: String = "quality_prob"): DataFrame = {
    val margin = graft.functions.DsirScore.of(
      Dsir.toks(col(textCol)), model.weights, md5 = model.portableHash) +
      lit(model.intercept)
    df.withColumn(probCol, lit(1.0) / (lit(1.0) + exp(-margin)))
  }

  /** Keep documents scoring at least `minProb`. */
  def filterByQuality(df: DataFrame, model: Model, minProb: Double,
      textCol: String = "text"): DataFrame =
    score(df, model, textCol).filter(col("quality_prob") >= minProb)
      .drop("quality_prob")

  /** One-row parquet model store (same contract style as the
    * unigram/bigram LM stores). */
  def save(model: Model, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    Seq((model.weights, model.intercept, model.portableHash))
      .toDF("weights", "intercept", "portable_hash")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Model = {
    val df = spark.read.parquet(path)
    require(df.columns.toSet == Set("weights", "intercept", "portable_hash"),
      s"$path is not a quality-classifier model " +
        s"(want [weights, intercept, portable_hash], got [${df.columns.mkString(", ")}])")
    val r = df.collect() match {
      case Array(row) => row
      case rows => throw new IllegalArgumentException(
        s"$path holds ${rows.length} rows; a classifier model is one row")
    }
    Model(r.getAs[Seq[Double]]("weights").toArray,
      r.getAs[Double]("intercept"), r.getAs[Boolean]("portable_hash"))
  }
}
