package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.ops.Tokenizer

class TokenizerSpec extends SparkFunSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("merge learning follows Sennrich order with deterministic ties") {
    // byte-level take on the classic example. Weighted pair counts:
    // (e,s) and (s,t) both 9 — tie goes to the smaller (left, right),
    // so "es" first, then ("es","t") at 9, then (l,o)/(o,w) tie at 7.
    val freqs = Array("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val v = Bpe.learn(freqs, vocabSize = 256 + 4)
    def tok(id: Int) = new String(v.tokens(id), "UTF-8")
    assert((tok(v.mergeLeft(0)), tok(v.mergeRight(0))) == ("e", "s"))
    assert((tok(v.mergeLeft(1)), tok(v.mergeRight(1))) == ("es", "t"))
    assert((tok(v.mergeLeft(2)), tok(v.mergeRight(2))) == ("l", "o"))
    assert((tok(v.mergeLeft(3)), tok(v.mergeRight(3))) == ("lo", "w"))
    assert(tok(256 + 1) == "est" && tok(256 + 3) == "low")
    // training is deterministic end-to-end
    val v2 = Bpe.learn(freqs, vocabSize = 256 + 4)
    assert(v.tokens.map(_.toSeq).toSeq == v2.tokens.map(_.toSeq).toSeq)
  }

  test("learning stops early when no pair repeats") {
    val v = Bpe.learn(Array("ab" -> 1L, "cd" -> 1L), vocabSize = 10000)
    assert(v.size == 256, "every pair is unique -> no merge is worth making")
  }

  test("encode applies lowest-rank merges; count and decode agree") {
    val freqs = Array("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val v = Bpe.learn(freqs, vocabSize = 256 + 4)
    val out = Seq((1L, "lowest"), (2L, "low low"), (3L, ""))
      .toDF("id", "text")
      .select(col("id"), Tokenizer.encode(col("text"), v).as("ids"),
        Tokenizer.tokenCount(col("text"), v).as("n"),
        Tokenizer.decode(Tokenizer.encode(col("text"), v), v).as("back"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getInt(2), r.getString(3)))).toMap
    // "lowest" -> es, est, lo, low -> [low][est]
    assert(out(1L)._1 == Seq(256 + 3, 256 + 1), s"got ${out(1L)._1}")
    // " low" is a DIFFERENT pre-token than "low": space byte stays
    // unmerged (no training mass), then l,o->lo->low applies
    assert(out(2L)._1 == Seq(256 + 3, ' '.toInt, 256 + 3), s"got ${out(2L)._1}")
    assert(out.forall { case (_, (ids, n, _)) => ids.length == n })
    assert(out(1L)._3 == "lowest" && out(2L)._3 == "low low" && out(3L)._3 == "")
  }

  test("byte alphabet round-trips anything: unicode, emoji, whitespace runs, raw punctuation") {
    val v = Bpe.learn(Array("the" -> 10L, "of" -> 8L), vocabSize = 300)
    val tricky = Seq(
      "héllo wörld",
      "日本語のテキスト",
      "mixed 🎉 emoji 🚀 text",
      "tabs\tand\nnewlines\r\n  double  spaces ",
      "   leading and trailing   ",
      "it's can't we're I'll they'd you've I'm",
      "a-b_c.d,e;f:g!h?i(j)k[l]m{n}o<p>q",
      "1234 5,678.90 1e-9 0xFF",
      "")
    val out = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        Tokenizer.decode(Tokenizer.encode(col("text"), v), v).as("back"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    tricky.zipWithIndex.foreach { case (t, i) =>
      assert(out(i.toLong) == t, s"round trip broke for <$t>: <${out(i.toLong)}>")
    }
  }

  test("corpus-trained vocab compresses the corpus it was trained on") {
    val v = Tokenizer.train(docs, vocabSize = 1024, maxWordTypes = 50000)
    assert(v.size > 256, "a natural-language corpus must yield merges")
    val stats = Tokenizer.tokenize(docs, v)
      .agg(sum(col("n_tokens")).as("bpe"),
        sum(length(col("text"))).as("chars"),
        sum(graft.ops.TextAnalysis.tokenCount(col("text"))).as("words"))
      .collect().head
    val (bpe, chars, words) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    // tokens-per-byte must beat the 1-token-per-byte floor by a wide
    // margin, and a subword vocab always yields >= the word count
    assert(bpe < chars / 2, s"bpe=$bpe chars=$chars: no compression happened")
    assert(bpe >= words, s"bpe=$bpe words=$words: fewer tokens than words")
  }

  test("save/load round-trips the model bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    val v = Tokenizer.train(docs.limit(200), vocabSize = 512, maxWordTypes = 20000)
    Tokenizer.save(v, s"$dir/vocab", spark)
    val l = Tokenizer.load(spark, s"$dir/vocab")
    assert(l.tokens.map(_.toSeq).toSeq == v.tokens.map(_.toSeq).toSeq)
    assert(l.mergeLeft.toSeq == v.mergeLeft.toSeq &&
      l.mergeRight.toSeq == v.mergeRight.toSeq)
    val a = docs.limit(50).select(Tokenizer.encode(col("text"), v).as("ids"))
      .collect().map(_.getSeq[Int](0)).toSeq
    val b = docs.limit(50).select(Tokenizer.encode(col("text"), l).as("ids"))
      .collect().map(_.getSeq[Int](0)).toSeq
    assert(a == b, "loaded vocab must encode identically")
  }

  test("packToSequences: exact-length id sequences, boundaries kept, packs decode back") {
    val v = Tokenizer.train(docs, vocabSize = 512, maxWordTypes = 20000)
    val seqs = Tokenizer.packToSequences(docs, v, seqLen = 128, groups = 4,
      dropPartial = false)
    val rows = seqs.select("pack_group", "pack_id", "seq_idx", "n_tokens")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every sequence except possibly the LAST of each pack is full
    val byPack = rows.groupBy(t => (t._1, t._2))
    byPack.foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == sorted.indices.map(_.toLong).toSeq,
        "seq_idx must be contiguous from 0")
      sorted.dropRight(1).foreach(t => assert(t._4 == 128L, s"non-final short seq: $t"))
      assert(sorted.last._4 <= 128L && sorted.last._4 > 0L)
    }
    // ids actually have n_tokens elements, boundaries cover them
    val shape = seqs.select(size(col("token_ids")).as("k"), col("n_tokens"),
        aggregate(transform(col("boundaries"),
          b => b.getField("end_token") - b.getField("begin_token")),
          lit(0L), (a, x) => a + x).as("covered"))
      .collect()
    assert(shape.forall(r => r.getInt(0).toLong == r.getLong(1) &&
      r.getLong(2) == r.getLong(1)), "boundaries must tile each sequence")
    // dropPartial keeps only full sequences
    val full = Tokenizer.packToSequences(docs, v, seqLen = 128, groups = 4)
    assert(full.filter(col("n_tokens") =!= 128L).count() == 0)
    // reassembling a pack's sequences and decoding reproduces the
    // pack's documents concatenated in pack order
    val packText = seqs.groupBy("pack_group", "pack_id")
      .agg(array_sort(collect_list(struct(col("seq_idx"),
        col("token_ids").as("__ids")))).as("p"))
      .select(col("pack_group"), col("pack_id"),
        Tokenizer.decode(flatten(transform(col("p"), x => x.getField("__ids"))), v)
          .as("back"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2)).toMap
    val expected = graft.ops.Sampling.packSequences(
        graft.ops.Tokenizer.tokenize(docs, v).drop("n_tokens"),
        "doc_id", "text", tokenBudget = 128, groups = 4,
        tokenCount = Some(size(col("token_ids"))))
      .filter(length(col("text")) > 0)
      .groupBy("pack_group", "pack_id")
      .agg(concat_ws("", array_sort(collect_list(struct(col("pack_offset"),
        col("doc_id"), col("text").as("__t")))).getField("__t")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(packText == expected, "pack reassembly must decode to the pack text")
  }

  test("special tokens: reserved ids decode to literals, encode never emits them, save/load keeps them") {
    val v = Tokenizer.train(docs, vocabSize = 512, maxWordTypes = 20000,
      specialTokens = Seq("<|endoftext|>", "<|pad|>"))
    // specials reserve slots INSIDE vocabSize (the merge loop may
    // stop early on a small corpus, so pin structure, not the total)
    assert(v.size <= 512 && v.specials.length == 2 &&
      v.tokens.length == v.size - 2)
    val eos = Tokenizer.specialId(v, "<|endoftext|>")
    val pad = Tokenizer.specialId(v, "<|pad|>")
    assert(eos == v.tokens.length && pad == v.tokens.length + 1)
    intercept[IllegalArgumentException](Tokenizer.specialId(v, "<|bos|>"))
    // decode emits the literal text; mixing specials with ordinary ids works
    val out = Seq(("hello world", 0)).toDF("text", "i")
      .select(Tokenizer.decode(
        concat(Tokenizer.encode(col("text"), v),
          array(lit(eos))), v).as("back"))
      .head().getString(0)
    assert(out == "hello world<|endoftext|>")
    // encode of the separator's literal text yields ORDINARY ids only
    val ids = Seq(Tuple1("a<|endoftext|>b")).toDF("text")
      .select(Tokenizer.encode(col("text"), v)).head().getSeq[Int](0)
    assert(!ids.contains(eos) && !ids.contains(pad),
      s"encode must never produce special ids, got $ids")
    // round trip still lossless THROUGH the separator text
    val back = Seq(Tuple1("a<|endoftext|>b")).toDF("text")
      .select(Tokenizer.decode(Tokenizer.encode(col("text"), v), v))
      .head().getString(0)
    assert(back == "a<|endoftext|>b")
    // save/load preserves specials bit-exactly
    val dir = java.nio.file.Files.createTempDirectory("vocab_sp").toString
    Tokenizer.save(v, s"$dir/m", spark)
    val lv = Tokenizer.load(spark, s"$dir/m")
    assert(lv.specials.map(_.toSeq).toSeq == v.specials.map(_.toSeq).toSeq)
    assert(Tokenizer.specialId(lv, "<|endoftext|>") == eos)
    assert(lv.tokens.map(_.toSeq).toSeq == v.tokens.map(_.toSeq).toSeq)
  }

  test("packToSequences with eos: every document ends with the separator, decode keeps it") {
    val v = Tokenizer.train(docs, vocabSize = 512, maxWordTypes = 20000,
      specialTokens = Seq("<|endoftext|>"))
    val eos = Tokenizer.specialId(v, "<|endoftext|>")
    val seqs = Tokenizer.packToSequences(docs, v, seqLen = 128, groups = 4,
      dropPartial = false, eos = Some("<|endoftext|>"))
    // every in-sequence document boundary whose end is INSIDE the
    // sequence... simpler invariant: reassembled pack ids contain
    // exactly one eos per document, at each document's last position
    val packs = seqs.groupBy("pack_group", "pack_id")
      .agg(array_sort(collect_list(struct(col("seq_idx"),
        col("token_ids").as("__ids"), col("boundaries").as("__b")))).as("p"))
      .select(
        flatten(transform(col("p"), x => x.getField("__ids"))).as("ids"),
        Tokenizer.decode(flatten(transform(col("p"), x => x.getField("__ids"))), v)
          .as("back"),
        size(flatten(transform(col("p"), x => x.getField("__b")))).as("nparts"))
      .collect()
    assert(packs.nonEmpty)
    val sep = "<|endoftext|>"
    packs.foreach { r =>
      val ids = r.getSeq[Int](0)
      val back = r.getString(1)
      assert(ids.last == eos, "every pack ends in eos")
      // decoded pack text ends with the separator and the eos count
      // equals the separator occurrences in the text
      assert(back.endsWith(sep))
      assert(ids.count(_ == eos) == back.sliding(sep.length).count(_ == sep))
    }
    // budget accounting: eos counts toward seqLen (all-full sequences
    // under dropPartial are exactly 128 ids including separators)
    val full = Tokenizer.packToSequences(docs, v, seqLen = 128, groups = 4,
      eos = Some("<|endoftext|>"))
    assert(full.filter(size(col("token_ids")) =!= 128).count() == 0)
  }

  test("packToSequences with pad: partial finals fill to seqLen, n_tokens keeps the real length") {
    val v = Tokenizer.train(docs, vocabSize = 512, maxWordTypes = 20000,
      specialTokens = Seq("<|endoftext|>", "<|pad|>"))
    val padId = Tokenizer.specialId(v, "<|pad|>")
    val seqs = Tokenizer.packToSequences(docs, v, seqLen = 128, groups = 4,
      dropPartial = false, eos = Some("<|endoftext|>"), pad = Some("<|pad|>"))
      .select(col("token_ids"), col("n_tokens")).collect()
    assert(seqs.nonEmpty)
    assert(seqs.exists(_.getLong(1) < 128L), "test wants at least one partial final")
    seqs.foreach { r =>
      val ids = r.getSeq[Int](0)
      val n = r.getLong(1).toInt
      assert(ids.length == 128, "every sequence pads to exactly seqLen ids")
      assert(ids.take(n).forall(_ != padId), "pad never appears before n_tokens")
      assert(ids.drop(n).forall(_ == padId), "everything after n_tokens is pad")
    }
  }

  test("token-exact packing: budget drift is zero under the bpe count") {
    val v = Tokenizer.train(docs, vocabSize = 512, maxWordTypes = 20000)
    val packed = graft.ops.Sampling.packSequences(docs, "doc_id", "text",
      tokenBudget = 512, groups = 8,
      tokenCount = Some(Tokenizer.tokenCount(col("text"), v)))
    val check = packed
      .withColumn("n", Tokenizer.tokenCount(col("text"), v).cast("long"))
      .groupBy("pack_group", "pack_id")
      .agg(min("pack_offset").as("first_off"), sum("n").as("tokens"))
    // every pack starts where the previous one's spill ended (offset
    // of its first doc < budget) — the packing invariant under the
    // EXACT same count the trainer would compute
    assert(check.filter(col("first_off") >= 512).count() == 0)
    assert(check.count() > 0)
  }

  test("maxWordTypes cut: loud warning when a pathological corpus drops mass") {
    // no-whitespace corpus: every doc is ONE unique all-letter
    // pre-token (digits would split under the GPT-2 pattern), so a
    // maxWordTypes=5 cut keeps 5 of 50 occurrences (10% coverage)
    val weird = (0 until 50).map(i =>
      "zq" + ('a' + i / 26).toChar + ('a' + i % 26).toChar + "xjvkqwpbdfghm")
      .toDF("text")
    val errCap = new java.io.ByteArrayOutputStream()
    val v = Console.withErr(new java.io.PrintStream(errCap)) {
      Tokenizer.train(weird, vocabSize = 300, maxWordTypes = 5)
    }
    assert(v.size >= 256, "training still yields a usable vocab")
    assert(errCap.toString.contains("WARNING"),
      s"expected a coverage warning, got: '${errCap.toString}'")
    // the diagnostic itself: 5 kept singletons over 50 total
    assert(math.abs(Tokenizer.cutCoverage(weird, "text", 5L) - 0.1) < 1e-9)
    // a corpus whose types fit under the cut warns nothing
    val clean = (1 to 50).map(_ => "the cat sat on the mat").toDF("text")
    val errCap2 = new java.io.ByteArrayOutputStream()
    Console.withErr(new java.io.PrintStream(errCap2)) {
      Tokenizer.train(clean, vocabSize = 300, maxWordTypes = 1000)
    }
    assert(!errCap2.toString.contains("WARNING"), errCap2.toString)
  }
}
