package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeVocab}

/** Corpus-trained byte-level BPE tokenization — the step that turns
  * "token budget" from a whitespace guess into the unit the trainer
  * actually consumes. See [[graft.functions.Bpe]] for the kernel and
  * the scale design (bounded-aggregate training, scan-side encoding,
  * lossless byte-alphabet round trip).
  *
  * Typical pipeline:
  * {{{
  *   val vocab = Tokenizer.train(corpus, vocabSize = 8192)
  *   Tokenizer.save(vocab, "s3a://.../vocab", spark)   // once
  *   val withIds = Tokenizer.tokenize(corpus, vocab)   // array<int> ids
  *   Sampling.packSequences(corpus, "doc_id", "text", 2048,
  *     tokenCount = Some(Tokenizer.tokenCount(col("text"), vocab)))
  * }}}
  */
object Tokenizer {

  /** Train a BPE vocab from the corpus. ONE map-side-combined
    * frequency aggregate cut to the `maxWordTypes` most frequent
    * pre-tokens (TakeOrdered — ties broken on the pre-token string, so
    * the cut is deterministic), then the driver-side merge loop over
    * that bounded table. The tail beyond the cut only loses frequency
    * mass that could not have changed early merges; this is the
    * standard frequency-table BPE trainer shape and is what keeps
    * training a single pass at 100 TB. */
  def train(df: DataFrame, textCol: String = "text",
      vocabSize: Int = 8192, maxWordTypes: Int = 200000,
      specialTokens: Seq[String] = Nil): BpeVocab = {
    require(maxWordTypes >= 1, s"maxWordTypes >= 1, got $maxWordTypes")
    require(vocabSize - specialTokens.size >= 256,
      s"vocabSize $vocabSize leaves < 256 ids after ${specialTokens.size} specials")
    // Loud degradation guard: on a pathological corpus (no whitespace,
    // highly unique text) the maxWordTypes cut can silently discard
    // most of the frequency mass and train merges on an
    // unrepresentative sliver. The total occurrence count rides the
    // SAME scan as the frequency aggregate via an Observation — zero
    // extra jobs (a second corpus scan here would double the dominant
    // cost of train() at web scale, where the cut is the normal case).
    val obs = org.apache.spark.sql.Observation()
    val freqs = df
      .select(explode(Bpe.preTokensOf(col(textCol))).as("__w"))
      .observe(obs, count(lit(1)).as("__total"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w").asc)
      .limit(maxWordTypes)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    if (freqs.length == maxWordTypes) {
      val total = obs.get("__total").asInstanceOf[Long]
      val covered =
        if (total <= 0L) 1.0
        else freqs.iterator.map(_._2).sum.toDouble / total
      if (covered < 0.9)
        Console.err.println(
          f"[tokenizer] WARNING: the maxWordTypes=$maxWordTypes cut covers " +
            f"only ${covered * 100}%.1f%% of pre-token occurrences — the " +
            "corpus has a heavy word-type tail (no-whitespace or highly " +
            "unique text?); raise maxWordTypes or pre-normalize the text")
    }
    // specials reserve id slots INSIDE vocabSize (GPT-2: 50257 =
    // 256 bytes + 50000 merges + <|endoftext|>)
    withSpecialTokens(Bpe.learn(freqs, vocabSize - specialTokens.size),
      specialTokens)
  }

  /** Fraction of the corpus's pre-token occurrences covered by a
    * frequency table holding `keptMass` occurrences: keptMass / total,
    * 1.0 for an empty corpus. The standalone diagnostic twin of
    * [[train]]'s cut guard (which rides the SAME scan via an
    * Observation instead of paying this one's extra aggregate). */
  private[graft] def cutCoverage(df: DataFrame, textCol: String,
      keptMass: Long): Double = {
    val total = df.select(sum(size(Bpe.preTokensOf(col(textCol)))))
      .collect().head match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    if (total <= 0L) 1.0 else keptMass.toDouble / total
  }

  /** Attach reserved control tokens (EOS/BOS/PAD) to a trained vocab:
    * ids after the merge range, decoded as their literal text, never
    * produced by encode — [[packToSequences]] and friends insert them
    * programmatically. Encoding the literal text of a special yields
    * ordinary ids (the GPT-2 convention without special-token
    * splitting); round trips stay lossless either way. */
  def withSpecialTokens(vocab: BpeVocab, specialTokens: Seq[String]): BpeVocab = {
    if (specialTokens.isEmpty) vocab
    else {
      require(specialTokens.distinct == specialTokens,
        s"duplicate special tokens: ${specialTokens.mkString(", ")}")
      require(vocab.specials.isEmpty,
        "vocab already has special tokens; build from the bare vocab")
      vocab.copy(specials = specialTokens.map(
        _.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)
    }
  }

  /** The id of a special token attached at train/load time. */
  def specialId(vocab: BpeVocab, token: String): Int = {
    val b = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val i = vocab.specials.indexWhere(java.util.Arrays.equals(_, b))
    require(i >= 0, s"'$token' is not a special token of this vocab " +
      s"(has ${vocab.specials.map(new String(_, "UTF-8")).mkString(", ")})")
    vocab.tokens.length + i
  }

  /** Persist a vocab: one parquet row per token id (merge pairs on the
    * merged token's row; base-byte rows have null pairs). Readable by
    * anything that speaks parquet — the model IS its table. */
  def save(vocab: BpeVocab, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    val rows = (0 until vocab.size).map { id =>
      if (id < 256) (id, vocab.tokenBytes(id), None: Option[Int], None: Option[Int])
      else if (id < vocab.tokens.length) (id, vocab.tokenBytes(id),
        Some(vocab.mergeLeft(id - 256)), Some(vocab.mergeRight(id - 256)))
      // specials: trailing rows with null pairs (ids > every merge)
      else (id, vocab.tokenBytes(id), None: Option[Int], None: Option[Int])
    }
    rows.toDF("id", "token", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): BpeVocab = {
    val df = spark.read.parquet(path)
    require(df.columns.toSet == Set("id", "token", "left", "right"),
      s"$path is not a BPE vocab " +
        s"(want [id, token, left, right], got [${df.columns.mkString(", ")}])")
    val rows = df.collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1),
      if (r.isNullAt(2)) -1 else r.getInt(2),
      if (r.isNullAt(3)) -1 else r.getInt(3))).sortBy(_._1)
    require(rows.length >= 256 && rows.zipWithIndex.forall { case (r, i) => r._1 == i },
      s"$path: vocab ids must be contiguous from 0, got ${rows.length} rows")
    // merges are the null-pair-free prefix of ids >= 256; anything
    // after the first null-pair row is a special (and must all be)
    val tail = rows.drop(256)
    val nMerges = tail.indexWhere(r => r._3 < 0 || r._4 < 0) match {
      case -1 => tail.length
      case k  => k
    }
    val (merges, specials) = tail.splitAt(nMerges)
    require(specials.forall(r => r._3 < 0 && r._4 < 0),
      s"$path: merge rows may not appear after special-token rows")
    BpeVocab(rows.take(256 + nMerges).map(_._2),
      merges.map(_._3), merges.map(_._4), specials.map(_._2))
  }

  /** array<int> token ids for a text column (scan-side kernel). */
  def encode(text: Column, vocab: BpeVocab): Column = Bpe.encodeOf(text, vocab)

  /** Exact encoded length (same kernel + cache, no id array). */
  def tokenCount(text: Column, vocab: BpeVocab): Column = Bpe.countOf(text, vocab)

  /** Inverse of [[encode]]: ids -> the original text, byte-exact. */
  def decode(ids: Column, vocab: BpeVocab): Column = Bpe.decodeOf(ids, vocab)

  /** The full text -> trainer-sequences pipeline: tokenize, assign
    * packs under the EXACT encoded counts, slice into fixed `seqLen`
    * id sequences ([[Sampling.chunkPackedIds]]) with per-document
    * boundary bookkeeping. `dropPartial = true` (the default) emits
    * ready-to-train rows of exactly `seqLen` ids. `eos` names a
    * special token ([[withSpecialTokens]]/`train(specialTokens=)`)
    * appended to every document's ids before packing — the
    * document-separator convention (GPT-2's `<|endoftext|>`); its id
    * counts toward the budget and rides the slices like any other id,
    * so decoding a pack's sequences yields the documents each
    * terminated by the separator text. One group-keyed exchange
    * (packing window) + one reassembly aggregate; the encode kernel
    * runs once per document, materialized through the shuffle. */
  def packToSequences(df: DataFrame, vocab: BpeVocab,
      idCol: String = "doc_id", textCol: String = "text",
      seqLen: Int = 2048, groups: Int = 1024, seed: Int = 42,
      dropPartial: Boolean = true, eos: Option[String] = None,
      pad: Option[String] = None): DataFrame = {
    val tokenized = eos.map(specialId(vocab, _)) match {
      case None => tokenize(df, vocab, textCol)
      case Some(id) => tokenize(df, vocab, textCol)
        .withColumn("token_ids", concat(col("token_ids"), array(lit(id))))
        .withColumn("n_tokens", col("n_tokens") + 1)
    }
    val assigned = Sampling.packSequences(tokenized, idCol, textCol,
      tokenBudget = seqLen.toLong, groups = groups, seed = seed,
      tokenCount = Some(col("n_tokens")))
    // n_tokens did its job (the pack budget); chunkPackedIds re-emits
    // a per-sequence n_tokens of its own
    val chunked = Sampling.chunkPackedIds(assigned.drop("n_tokens"),
      idCol, "token_ids", seqLen, dropPartial)
    // pad the (kept) partial final sequences to a fixed seqLen ids —
    // n_tokens keeps the REAL length, so the trainer's loss mask is
    // `position < n_tokens`; full sequences are untouched
    pad.map(specialId(vocab, _)) match {
      case None => chunked
      case Some(pid) => chunked.withColumn("token_ids",
        concat(col("token_ids"), array_repeat(lit(pid),
          (lit(seqLen) - size(col("token_ids"))).cast("int"))))
    }
  }

  /** Corpus tokenization: adds `idsCol` (array<int>) and `nTokensCol`
    * (int, = size of ids without re-encoding). Scan-side — the frame's
    * partitioning and pushdowns are untouched. */
  def tokenize(df: DataFrame, vocab: BpeVocab, textCol: String = "text",
      idsCol: String = "token_ids", nTokensCol: String = "n_tokens"): DataFrame = {
    val clobbered = Seq(idsCol, nTokensCol).filter(df.columns.contains)
    require(clobbered.isEmpty,
      s"tokenize writes ${clobbered.mkString(", ")}; rename the existing column(s) first")
    df.withColumn(idsCol, encode(col(textCol), vocab))
      .withColumn(nTokensCol, size(col(idsCol)))
  }
}
