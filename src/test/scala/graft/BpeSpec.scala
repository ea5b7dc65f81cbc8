package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

class BpeSpec extends AnyFunSuite with SparkTestBase {

  test("pretokenize == the q25 regex on representative inputs") {
    val re = java.util.regex.Pattern.compile("\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]")
    def viaRegex(t: String): Seq[String] = {
      val m = re.matcher(t)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toSeq
    }
    val cases = Seq(
      "hello world", "a1b2c3", "  tabs\tand\nnewlines\f\r  ",
      "punct,.:;!?-- x", "", "123 456x", "mixedCASE Words99",
      "unicode: café αβγ Ⅳ ½", // é, greek, Ⅳ (Nl), ½ (No)
      "a", ".", "7")
    // plus 200 random ASCII strings
    val r = new graft.gen.TranscriptGen.Rng(4242L)
    val alphabet = "abcZ019 .,\t\n-#"
    val random = (0 until 200).map { _ =>
      (0 until r.nextInt(40)).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
    }
    (cases ++ random).foreach { t =>
      assert(Bpe.pretokenize(t).toSeq === viaRegex(t), s"input: ${t.take(60)}")
    }
  }

  test("train: weighted counts, lexicographic tie-break, dry-out stop") {
    // vocab: "abab" x3, "abcd" x2 -> pair counts: (a,b)=8, (b,a)=3, (b,c)=2,
    // (c,d)=2. Round 1 merges (a,b). Then ("ab","ab")=3, ("ab","cd")? no:
    // abcd -> ab,c,d: pairs ("ab",c)=2, (c,d)=2 -> tie broken toward
    // ("ab","c") < ("c","d") lexicographically... "ab"<"c" so ("ab","c").
    val merges = Bpe.train(
      Seq(("abab", 3L), ("abcd", 2L)), Bpe.Config(nMerges = 3))
    assert(merges.take(2) === Seq(("a", "b"), ("ab", "ab")))
    // round 3: abab fully merged; abcd = ab,c,d -> ("ab",c)=2,(c,d)=2 ->
    // lexicographic tie-break picks ("ab","c")
    assert(merges(2) === (("ab", "c")))
    // nMerges=0 trains nothing
    assert(Bpe.train(Seq(("abab", 3L)), Bpe.Config(nMerges = 0)) === Seq())
  }

  test("incremental trainer == naive full-recount reference, many vocabularies") {
    // random vocabularies engineered for heavy tie-breaking and overlap
    // (repeated letters make (x,x) pairs where left-to-right non-overlap
    // application matters)
    val r = new graft.gen.TranscriptGen.Rng(31337L)
    val alphabet = "aabbc" // tiny alphabet -> dense pair collisions
    (0 until 30).foreach { trial =>
      val vocab = (0 until (3 + r.nextInt(40))).map { _ =>
        val w = (0 until (1 + r.nextInt(8)))
          .map(_ => alphabet(r.nextInt(alphabet.length))).mkString
        (w, 1L + r.nextInt(9))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val cfg = Bpe.Config(nMerges = 1 + r.nextInt(30))
      assert(Bpe.train(vocab, cfg) === Bpe.trainReference(vocab, cfg),
        s"trial $trial diverged, vocab=$vocab nMerges=${cfg.nMerges}")
    }
  }

  test("distributed learnEncode == driver-side first-principles reference") {
    import spark.implicits._
    val r = new graft.gen.TranscriptGen.Rng(7777L)
    val vocabWords = Seq("spark", "shuffle", "partition", "join", "scan",
      "agg", "sort", "hash", "merge", "batch", "row", "column", "12345", "x9")
    val docs = (0L until 120L).map { i =>
      val n = 5 + r.nextInt(20)
      val t = (0 until n).map(_ => vocabWords(r.nextInt(vocabWords.length)))
        .mkString(" ") + (if (i % 7 == 0) " ,.;" else "")
      (i, t)
    } ++ Seq((500L, ""), (501L, "zzz-unseen-at-train-time??"))
    val df = docs.toDF("doc_id", "text")
    val cfg = Bpe.Config(nMerges = 25)

    val got = Bpe.learnEncode(spark, df, "doc_id", "text", cfg)
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq

    // driver reference: same contract, straight-line code over the corpus
    val wc = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, t) =>
      Bpe.pretokenize(t).foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1) }
    val merges = Bpe.train(wc.toSeq, cfg)
    assert(merges.size === 25) // corpus is rich enough to not dry out early
    val ranks = new java.util.HashMap[String, Integer]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      ranks.put(a + " " + b, Integer.valueOf(i)) }
    val want = docs.map { case (id, t) =>
      val toks = Bpe.pretokenize(t).flatMap(w => Bpe.encodeWord(w, ranks))
      (id, toks.length, toks.mkString(" "))
    }.sortBy(_._1)
    assert(got === want)
    // encoding genuinely merges: fewer tokens than characters, more than words
    val full = got.filter(_._1 < 500L)
    assert(full.forall(_._2 > 0))
    // the unseen word still encodes (to whatever partial merges apply)
    assert(got.find(_._1 == 501L).get._3.nonEmpty)
  }

  test("training shuffles only the vocabulary, never the corpus") {
    import spark.implicits._
    // ~4 MB of text drawn from a tiny vocabulary: the (word,count)
    // aggregation's exchange must be vocab-sized, not corpus-sized
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val r = new graft.gen.TranscriptGen.Rng(99L)
    val docs = (0L until 2000L).map { i =>
      (i, (0 until 300).map(_ => words(r.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text").repartition(8).localCheckpoint(true)

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val merges =
      try {
        val m = Bpe.learn(spark, docs, "text", Bpe.Config(nMerges = 10))
        Thread.sleep(1000) // let straggler task-end events drain
        m
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(merges.nonEmpty)
    // corpus ~4 MB; the vocab exchange (6 words + partial-agg rows) must be
    // orders of magnitude smaller
    assert(shuffleWrite.get() < 256 * 1024,
      s"BPE training shuffled ${shuffleWrite.get()} bytes — the corpus must " +
        "be reduced to (word,count) map-side before the exchange")
  }

  test("encoding is map-side only: zero exchanges in the executed plan") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, "spark shuffle spark scan"))
      .toDF("doc_id", "text").localCheckpoint(true)
    val enc = Bpe.encode(spark, docs, "doc_id", "text",
      Seq(("s", "p"), ("sp", "a")), extraCols = Nil)
    enc.collect()
    val plan = enc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"),
      s"BPE encode must be a narrow projection, plan:\n$plan")
  }

  test("extraCols ride through encode without a re-join") {
    import spark.implicits._
    val docs = Seq((1L, "src_a", "ab ab"), (2L, "src_b", "cd"))
      .toDF("doc_id", "source", "text")
    val out = Bpe.encode(spark, docs, "doc_id", "text",
      Seq(("a", "b")), extraCols = Seq("source"))
    assert(out.columns.toSeq ===
      Seq("doc_id", "source", "n_bpe_tokens", "bpe_text"))
    val rows = out.as[(Long, String, Int, String)].collect().sortBy(_._1)
    assert(rows(0) === ((1L, "src_a", 2, "ab ab")))
    assert(rows(1) === ((2L, "src_b", 2, "c d")))
  }

  test("vocabulary budget guard fails loudly, frequency floor restores it") {
    import spark.implicits._
    // index encoded in LETTERS: a digit suffix would pre-tokenize into its
    // own digit-run token, and two-digit runs appear twice per i (once in
    // each word), surviving the minWordCount=2 floor
    def letters(i: Long) = "" + ('a' + i / 26).toChar + ('a' + i % 26).toChar
    val docs = (0L until 50L)
      .map(i => (i, s"unique${letters(i)} token${letters(i)} shared"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.learn(spark, docs, "text", Bpe.Config(maxVocab = 10))
    }
    assert(e.getMessage.contains("minWordCount"))
    // the floor drops the unique tail below the cap: only "shared" (and
    // the per-doc words appear once each) survives minWordCount=2
    val merges = Bpe.learn(spark, docs, "text",
      Bpe.Config(maxVocab = 10, minWordCount = 2))
    // vocab collapses to {"shared": 50}: every adjacent pair counts 50 and
    // the lexicographic tie-break picks (a,r) first
    assert(merges.head === (("a", "r")))
  }
}
