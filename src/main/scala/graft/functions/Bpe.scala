package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE (Sennrich et al. 2016 merges, GPT-2-style byte
  * alphabet + pre-tokenization): the real-tokenizer leg of training
  * prep. Reference semantics: timefence has no tokenizer — this is
  * beyond-reference surface for token-exact packing and budgeting.
  *
  * Design for 100 TB:
  *  - TRAINING never sees the corpus twice: pre-token frequencies are
  *    ONE map-side-combined aggregate cut to a bounded top-N
  *    (TakeOrdered), and the merge loop runs driver-side over that
  *    bounded word-frequency table — exactly how SentencePiece/GPT-2
  *    style trainers work (merges depend on words only through their
  *    frequencies).
  *  - ENCODING is scan-side: the model rides into generated code as a
  *    plan reference object (no join, no shuffle), and a per-thread
  *    LRU keyed by pre-token skips the merge loop for the ~Zipfian
  *    bulk of natural text (a web corpus re-encodes the same few
  *    thousand words almost all the time).
  *  - The byte alphabet (ids 0..255 = the raw byte) makes every
  *    encoding total and losslessly invertible: no UNK, any UTF-8
  *    (or non-UTF-8) byte sequence round-trips decode(encode(s)) == s.
  *    That identity is the corpus-scale oracle (q_bpe_roundtrip).
  *
  * Determinism: merge learning breaks count ties on the smaller
  * (left, right) id pair, the frequency cut orders by (count desc,
  * word asc), and encoding always merges the lowest-rank pair,
  * leftmost first — same inputs, same model, same ids, everywhere.
  */
/** The trained model: `tokens(id)` = the token's bytes (ids 0..255 are
  * the single raw byte; id 256+r is merge rank r), and the merge at
  * rank r fused `(mergeLeft(r), mergeRight(r))`. `specials` are
  * reserved control tokens (EOS/BOS/PAD) appended AFTER the merge
  * range: id `tokens.length + s` decodes to `specials(s)`'s bytes but
  * is NEVER produced by encode — the pipeline inserts it
  * programmatically (document separators in packed sequences), the
  * GPT-2 convention. Top-level (not nested in [[Bpe]]) so generated
  * Java can name the type. Arrays are plan data — compared by
  * reference in expression equality, like [[DsirScore]]'s weights. */
case class BpeVocab(tokens: Array[Array[Byte]],
    mergeLeft: Array[Int], mergeRight: Array[Int],
    specials: Array[Array[Byte]] = Array.empty) extends Serializable {
  require(tokens.length == 256 + mergeLeft.length &&
    mergeLeft.length == mergeRight.length,
    s"inconsistent vocab: ${tokens.length} tokens, ${mergeLeft.length}/" +
      s"${mergeRight.length} merges")

  /** Total id space: merge range + specials. */
  def size: Int = tokens.length + specials.length

  /** The bytes for ANY valid id, special or not. */
  def tokenBytes(id: Int): Array[Byte] =
    if (id < tokens.length) tokens(id) else specials(id - tokens.length)

  /** pair (left << 32 | right) -> rank; merged id is 256 + rank. */
  @transient private[functions] lazy val ranks: java.util.HashMap[java.lang.Long, Integer] = {
    val m = new java.util.HashMap[java.lang.Long, Integer](mergeLeft.length * 2)
    var r = 0
    while (r < mergeLeft.length) {
      m.put(Bpe.pairKey(mergeLeft(r), mergeRight(r)), r)
      r += 1
    }
    m
  }

  /** Per-thread pre-token -> ids LRU. Thread-local because encode runs
    * concurrently on every task thread of local[32]; bounded so
    * adversarial high-cardinality pre-tokens (random hex, urls) can't
    * grow it past ~tens of MB per thread. */
  @transient private[functions] lazy val cache:
      ThreadLocal[java.util.LinkedHashMap[String, Array[Int]]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, Array[Int]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[Int]]): Boolean =
          this.size() > 65536
      })
}

object Bpe {

  /** GPT-2-shaped pre-tokenizer: contractions, space-prefixed
    * letter/digit/punctuation runs, interior whitespace runs keeping
    * their last space for the next word, trailing whitespace whole.
    * Every character of the input lands in exactly one pre-token
    * (each alternative consumes >= 1 char and the classes are
    * exhaustive), so concatenating pre-tokens reproduces the input —
    * the first half of the round-trip guarantee. Merges never cross
    * pre-token boundaries. */
  private val preTokenPattern = java.util.regex.Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")

  private[functions] def pairKey(left: Int, right: Int): Long =
    (left.toLong << 32) | (right.toLong & 0xffffffffL)

  /** Learn `vocabSize - 256` merges (fewer if no pair repeats) from a
    * bounded (word, frequency) table. Incremental pair bookkeeping:
    * each merge touches only the words that contain the fused pair, so
    * the loop is O(affected-word length) per merge, not O(table). */
  def learn(wordFreqs: Array[(String, Long)], vocabSize: Int): BpeVocab = {
    require(vocabSize >= 256, s"byte-level BPE wants vocabSize >= 256, got $vocabSize")
    val words = wordFreqs.map { case (w, _) =>
      val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val ids = new Array[Int](b.length)
      var i = 0
      while (i < b.length) { ids(i) = b(i) & 0xff; i += 1 }
      ids
    }
    val freqs = wordFreqs.map(_._2)
    val pairCounts = new java.util.HashMap[java.lang.Long, Long]()
    val pairWords = new java.util.HashMap[java.lang.Long, java.util.BitSet]()
    def addPairs(ids: Array[Int], w: Int, sign: Long): Unit = {
      var i = 0
      while (i < ids.length - 1) {
        val k = pairKey(ids(i), ids(i + 1))
        val n = pairCounts.getOrDefault(k, 0L) + sign * freqs(w)
        if (n <= 0L) pairCounts.remove(k) else pairCounts.put(k, n)
        if (sign > 0)
          pairWords.computeIfAbsent(k, _ => new java.util.BitSet()).set(w)
        i += 1
      }
    }
    var w = 0
    while (w < words.length) { addPairs(words(w), w, 1L); w += 1 }

    val tokens = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    (0 until 256).foreach(b => tokens += Array(b.toByte))
    val mergeLeft = scala.collection.mutable.ArrayBuffer.empty[Int]
    val mergeRight = scala.collection.mutable.ArrayBuffer.empty[Int]

    while (tokens.length < vocabSize && !pairCounts.isEmpty) {
      // best = max count, ties to the smaller (left, right) pair id —
      // a full scan of the pair table per merge; the table is bounded
      // by total distinct adjacent pairs in the top-N words (~1e5-1e6)
      var bestKey = 0L
      var bestCount = 0L
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey.longValue()
        val c = e.getValue
        if (c > bestCount || (c == bestCount && java.lang.Long.compareUnsigned(k, bestKey) < 0)) {
          bestKey = k; bestCount = c
        }
      }
      if (bestCount < 2) return BpeVocab(tokens.toArray, mergeLeft.toArray, mergeRight.toArray)
      val left = (bestKey >>> 32).toInt
      val right = (bestKey & 0xffffffffL).toInt
      val newId = tokens.length
      tokens += (tokens(left) ++ tokens(right))
      mergeLeft += left
      mergeRight += right

      val affected = pairWords.remove(bestKey)
      if (affected != null) {
        var wi = affected.nextSetBit(0)
        while (wi >= 0) {
          val old = words(wi)
          // re-derive rather than patch: subtract every old adjacent
          // pair, apply the merge left-to-right, add every new pair
          addPairs(old, wi, -1L)
          val merged = applyMerge(old, left, right, newId)
          words(wi) = merged
          addPairs(merged, wi, 1L)
          wi = affected.nextSetBit(wi + 1)
        }
      }
    }
    BpeVocab(tokens.toArray, mergeLeft.toArray, mergeRight.toArray)
  }

  /** Replace every non-overlapping (left, right) occurrence with
    * newId, leftmost first — the same order encoding uses. */
  private def applyMerge(ids: Array[Int], left: Int, right: Int, newId: Int): Array[Int] = {
    val out = new Array[Int](ids.length)
    var i = 0
    var o = 0
    while (i < ids.length) {
      if (i < ids.length - 1 && ids(i) == left && ids(i + 1) == right) {
        out(o) = newId; i += 2
      } else {
        out(o) = ids(i); i += 1
      }
      o += 1
    }
    java.util.Arrays.copyOf(out, o)
  }

  /** Encode one pre-token (cache miss path): start from raw bytes,
    * repeatedly fuse the lowest-rank adjacent pair until none of the
    * remaining pairs is in the merge table. */
  private def encodeWord(word: String, v: BpeVocab): Array[Int] = {
    val b = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var ids = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { ids(i) = b(i) & 0xff; i += 1 }
    while (ids.length >= 2) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < ids.length - 1) {
        val r = v.ranks.get(pairKey(ids(j), ids(j + 1)))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) return ids
      ids = applyMerge(ids, v.mergeLeft(bestRank), v.mergeRight(bestRank), 256 + bestRank)
    }
    ids
  }

  private def cachedEncode(word: String, v: BpeVocab): Array[Int] = {
    val c = v.cache.get()
    var ids = c.get(word)
    if (ids == null) {
      ids = encodeWord(word, v)
      c.put(word, ids)
    }
    ids
  }

  /** Also called from generated code: full token-id sequence. */
  def encode(text: UTF8String, v: BpeVocab): ArrayData = {
    val s = text.toString
    val m = preTokenPattern.matcher(s)
    val buf = new java.util.ArrayList[Array[Int]]()
    var total = 0
    while (m.find()) {
      val ids = cachedEncode(m.group(), v)
      buf.add(ids)
      total += ids.length
    }
    val out = new Array[Int](total)
    var o = 0
    var i = 0
    while (i < buf.size()) {
      val ids = buf.get(i)
      System.arraycopy(ids, 0, out, o, ids.length)
      o += ids.length
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Also called from generated code: encoded length only (same merge
    * loop + cache, no output array). */
  def count(text: UTF8String, v: BpeVocab): Int = {
    val m = preTokenPattern.matcher(text.toString)
    var n = 0
    while (m.find()) n += cachedEncode(m.group(), v).length
    n
  }

  /** Also called from generated code: ids -> original byte stream.
    * Unknown ids throw — a decode fed ids from a different vocab is a
    * caller bug worth failing loudly on. */
  def decode(ids: ArrayData, v: BpeVocab): UTF8String = {
    val n = ids.numElements()
    var len = 0
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      require(id >= 0 && id < v.size,
        s"token id $id outside vocab of ${v.size}")
      len += v.tokenBytes(id).length
      i += 1
    }
    val out = new Array[Byte](len)
    var o = 0
    i = 0
    while (i < n) {
      val t = v.tokenBytes(ids.getInt(i))
      System.arraycopy(t, 0, out, o, t.length)
      o += t.length
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Also called from generated code: the pre-token strings (for the
    * training frequency aggregate). */
  def preTokens(text: UTF8String): ArrayData = {
    val m = preTokenPattern.matcher(text.toString)
    val buf = new java.util.ArrayList[UTF8String]()
    while (m.find()) buf.add(UTF8String.fromString(m.group()))
    ArrayData.toArrayData(buf.toArray)
  }

  /** Column API: array<int> token ids. */
  def encodeOf(text: Column, v: BpeVocab): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), v))
  }

  /** Column API: int token count. */
  def countOf(text: Column, v: BpeVocab): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(text), v))
  }

  /** Column API: string from array<int> token ids. */
  def decodeOf(ids: Column, v: BpeVocab): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BpeDecodeExpr(ColumnBridge.expression(ids), v))
  }

  /** Column API: array<string> pre-tokens. */
  def preTokensOf(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BpePreTokensExpr(ColumnBridge.expression(text)))
  }
}

/** See [[Bpe.encode]]. */
case class BpeEncodeExpr(child: Expression, vocab: BpeVocab)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs string, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.encode(input.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, "graft.functions.BpeVocab")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encode($c, $v)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}

/** See [[Bpe.count]]. */
case class BpeCountExpr(child: Expression, vocab: BpeVocab)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count needs string, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.count(input.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, "graft.functions.BpeVocab")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.count($c, $v)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_count"
}

/** See [[Bpe.decode]]. */
case class BpeDecodeExpr(child: Expression, vocab: BpeVocab)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode needs array<int>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.decode(input.asInstanceOf[ArrayData], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, "graft.functions.BpeVocab")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.decode($c, $v)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeDecodeExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_decode"
}

/** See [[Bpe.preTokens]]. */
case class BpePreTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_pre_tokens needs string, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.preTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.preTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): BpePreTokensExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_pre_tokens"
}
