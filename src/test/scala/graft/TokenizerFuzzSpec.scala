package graft

import graft.functions.{BpeSupport, UnigramSupport}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based UNICODE fuzz of the tokenizer/text family (round-16
  * verdict item): r15's review sweep found surrogate-pair splitting, `\s`
  * class drift, and invalid-UTF-8 minting BY EYEBALL — this suite finds
  * the next class mechanically. Seed-pinned ScalaCheck generators cover
  * astral-plane codepoints (emoji), combining marks, CJK, non-ASCII
  * whitespace (U+3000/U+00A0 — word-INTERNAL under the ASCII boundary),
  * vertical tab (ASCII boundary RE2's \s misses), NULs, and truncated
  * multibyte byte streams; every law is checked against an INDEPENDENT
  * in-JVM reference (the Java regex splitter, raw UTF-8 byte comparison,
  * the JDK's strict UTF-8 decoder, a brute-force Viterbi) — the same
  * differential discipline check.py applies via DuckDB, runnable per
  * commit. ≥1k samples per law.
  */
class TokenizerFuzzSpec extends SparkSpec {

  private def gen[A](g: Gen[A], seed: Long, fallback: A): A =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(fallback)

  // ---- generators -------------------------------------------------------

  /** One non-whitespace "word" codepoint, weighted across the classes that
    * have historically diverged: ASCII, Latin-1, combining marks, CJK,
    * non-ASCII spaces (NOT boundaries!), astral plane, NUL.
    */
  private val genWordCp: Gen[Int] = Gen.frequency(
    8 -> Gen.choose('a'.toInt, 'z'.toInt),
    2 -> Gen.choose(0x00C0, 0x00FF), // Latin-1 letters (2-byte UTF-8)
    2 -> Gen.choose(0x0300, 0x036F), // combining marks
    2 -> Gen.choose(0x4E00, 0x4EFF), // CJK (3-byte UTF-8)
    1 -> Gen.oneOf(0x3000, 0x00A0, 0x2028, 0x2029), // unicode "spaces": word-INTERNAL
    2 -> Gen.choose(0x1F300, 0x1F64F), // astral plane (surrogate pairs, 4-byte UTF-8)
    1 -> Gen.const(0x0000) // NUL inside a word
  )

  private val genWord: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cps <- Gen.listOfN(n, genWordCp)
  } yield {
    val sb = new java.lang.StringBuilder()
    cps.foreach(sb.appendCodePoint)
    sb.toString
  }

  /** The ASCII boundary class — including U+000B vertical tab, the char
    * RE2's \s omits (the r15 oracle-drift bug class).
    */
  private val genSep: Gen[String] = for {
    n <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'))
  } yield cs.mkString

  private val genText: Gen[String] = for {
    nWords <- Gen.choose(0, 10)
    words <- Gen.listOfN(nWords, genWord)
    seps <- Gen.listOfN(nWords + 1, Gen.oneOf(genSep, Gen.const("")))
  } yield seps.zipAll(words, "", "").map { case (s, w) => s + w }.mkString

  /** INDEPENDENT reference splitter: the Java regex class the oracles pin
    * (`[ \\t\\n\\u000B\\f\\r]+`), not the engine's hand-rolled iterator.
    */
  private def refWords(s: String): Seq[String] =
    s.split("[ \\t\\n\\u000B\\f\\r]+").toSeq.filter(_.nonEmpty)

  // a small trained byte-level merges table, so the laws run over REAL
  // merge structure (multi-byte characters merging from byte pieces), not
  // the degenerate no-merges case
  private lazy val byteRanks: BpeSupport.Ranks = {
    import spark.implicits._
    val corpus = (0 until 400).map { i =>
      gen(genText, 900000L + i, "fallback text")
    }.toDF("text")
    val merges = graft.operators.BpeTrainer.trainMerges(corpus, "text", 80, byteLevel = true)
    BpeSupport.validate(merges)
    new BpeSupport.Ranks(merges.toArray)
  }

  private lazy val charRanks: BpeSupport.Ranks = {
    import spark.implicits._
    // char-level merges may not contain NUL (the rank-table key separator,
    // rejected by validate) -- strip NULs from the TRAINING corpus only;
    // the property inputs keep them (lookup misses are safe)
    val corpus = (0 until 400).map(i =>
      gen(genText, 910000L + i, "fallback text").replace("\u0000", "")).toDF("text")
    val merges = graft.operators.BpeTrainer.trainMerges(corpus, "text", 80, byteLevel = false)
    BpeSupport.validate(merges)
    new BpeSupport.Ranks(merges.toArray)
  }

  // ---- BPE laws ----------------------------------------------------------

  test("BPE byte-level: merges are byte-lossless and encode/decode round-trips (1k samples)") {
    (0 until 1000).foreach { i =>
      val text = gen(genText, 1000L + i, "a b")
      val words = refWords(text)
      // per-word: token symbols reassemble to EXACTLY the word's UTF-8 bytes
      words.foreach { w =>
        val toks = BpeSupport.tokenizeWordBytes(w, byteRanks)
        val bytes = toks.mkString.map(c => BpeSupport.CharToByte(c.toInt).toByte).toArray
        assert(java.util.Arrays.equals(bytes, w.getBytes("UTF-8")),
          s"sample $i: byte-level merge lost bytes for word ${w.codePoints().toArray.toSeq}")
      }
      // whole-doc: ids under a covering vocab decode back to the words
      // (the id stream carries no separators by contract)
      val vocab = words.flatMap(w => BpeSupport.tokenizeWordBytes(w, byteRanks)).distinct.toArray
      if (vocab.nonEmpty) {
        val ids = BpeSupport.tokenIdsBytes(
          UTF8String.fromString(text), byteRanks, BpeSupport.vocabMap(vocab.toSeq))
        val decoded = BpeSupport.decodeIds(ids, vocab, byteLevel = true)
        assert(decoded != null, s"sample $i: covering-vocab decode must not be NULL")
        assert(decoded.toString == words.mkString(""),
          s"sample $i: round-trip diverged for ${text.codePoints().toArray.toSeq}")
      }
    }
  }

  test("BPE char-level: tokens never split a surrogate pair and reassemble exactly (1k samples)") {
    (0 until 1000).foreach { i =>
      val w = gen(genWord, 2000L + i, "ab")
      val toks = BpeSupport.tokenizeWord(w, charRanks)
      assert(toks.mkString == w, s"sample $i: char-level merge lost content")
      toks.foreach { t =>
        assert(!Character.isLowSurrogate(t.charAt(0)),
          s"sample $i: token starts mid-surrogate-pair (the r15 atomization bug class)")
        assert(!Character.isHighSurrogate(t.charAt(t.length - 1)),
          s"sample $i: token ends on an unpaired high surrogate")
      }
    }
  }

  test("BPE decode: truncated/corrupt id streams yield NULL or a VALID-UTF-8 prefix, never mojibake (1k samples)") {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    var truncatedHit = 0
    (0 until 1000).foreach { i =>
      val w = gen(genWord.suchThat(_.getBytes("UTF-8").length >= 2), 3000L + i, "éx")
      val atoms = BpeSupport.byteAtoms(w)
      val vocab = atoms.distinct
      val vmap = BpeSupport.vocabMap(vocab.toSeq)
      val ids = atoms.map(a => vmap.get(a).intValue())
      val k = gen(Gen.choose(0, ids.length), 3500L + i, 0)
      val prefixIds = new GenericArrayData(ids.take(k).map(Integer.valueOf).toArray[Any])
      val decoded = BpeSupport.decodeIds(prefixIds, vocab, byteLevel = true)
      val prefixBytes = w.getBytes("UTF-8").take(k)
      val refValid =
        try { dec.reset(); dec.decode(java.nio.ByteBuffer.wrap(prefixBytes)); true }
        catch { case _: java.nio.charset.CharacterCodingException => false }
      if (refValid)
        assert(decoded != null && decoded.toString == new String(prefixBytes, "UTF-8"),
          s"sample $i: valid prefix must decode exactly")
      else {
        assert(decoded == null,
          s"sample $i: a truncated multibyte stream must decode to NULL, " +
            s"got '${decoded}' for bytes ${prefixBytes.toSeq}")
        truncatedHit += 1
      }
      // out-of-range and null-slot ids: NULL, never a throw or id-0 alias
      assert(BpeSupport.decodeIds(
        new GenericArrayData(Array[Any](Integer.valueOf(vocab.length))), vocab, byteLevel = true) == null)
      assert(BpeSupport.decodeIds(
        new GenericArrayData(Array[Any](null)), vocab, byteLevel = true) == null)
    }
    assert(truncatedHit >= 50, s"generator must actually exercise invalid truncations, hit $truncatedHit")
  }

  // ---- shared word iterator ----------------------------------------------

  test("word iterator parity: BPE and Viterbi doc counts equal the Java-regex reference split (1k samples)") {
    val m = UnigramSupport.model(Seq("ab" -> 10L, "a" -> 7L, "b" -> 9L, "一丁" -> 3L), 100L)
    (0 until 1000).foreach { i =>
      val text = gen(genText, 4000L + i, "a\u000Bb")
      val words = refWords(text)
      val u = UTF8String.fromString(text)
      val bpeDoc = BpeSupport.countTokensBytes(u, byteRanks)
      val bpeRef = words.map(w => BpeSupport.tokenizeWordBytes(w, byteRanks).length).sum
      assert(bpeDoc == bpeRef,
        s"sample $i: BPE doc count $bpeDoc != per-reference-word sum $bpeRef " +
          s"(iterator drift on ${text.codePoints().toArray.toSeq})")
      val vitDoc = UnigramSupport.countTokens(u, m)
      val vitRef = words.map(w => UnigramSupport.countTokens(UTF8String.fromString(w), m)).sum
      assert(vitDoc == vitRef, s"sample $i: Viterbi doc count diverges from reference split")
    }
  }

  // ---- Viterbi laws --------------------------------------------------------

  /** Pieces derived from generated words by CODEPOINT substrings (1-4 cp),
    * so multi-codepoint pieces cross astral/combining boundaries — plus
    * every law below checked against the emitted segmentation.
    */
  private def genModel(seed: Long): UnigramSupport.Model = {
    val pieces = (0 until 40).flatMap { j =>
      val w = gen(genWord, seed + j, "ab")
      val cps = w.codePoints().toArray
      val start = gen(Gen.choose(0, math.max(0, cps.length - 1)), seed + 100 + j, 0)
      val len = gen(Gen.choose(1, 4), seed + 200 + j, 1)
      val end = math.min(cps.length, start + len)
      if (end > start) Some(new String(cps, start, end - start)) else None
    }.distinct
    val costs = pieces.zipWithIndex.map { case (p, j) =>
      p -> (1L + gen(Gen.choose(1L, 9999L), seed + 300 + j, 5L))
    }
    UnigramSupport.model(costs, unkCost = 12345L)
  }

  test("Viterbi: segmentation covers exactly; cost/count laws agree with the emitted tokens (1k samples)") {
    (0 until 1000).foreach { i =>
      val m = genModel(500000L + (i % 10) * 1000L)
      val text = gen(genText, 5000L + i, "ab")
      val u = UTF8String.fromString(text)
      val toks = UnigramSupport.tokens(u, m).toArray[UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
      // coverage: concatenated tokens == concatenated words, codepoint-exact
      assert(toks.mkString("") == refWords(text).mkString(""),
        s"sample $i: segmentation must cover the words exactly")
      // count law
      assert(UnigramSupport.countTokens(u, m) == toks.length)
      // cost law: totalCost equals the sum of the emitted pieces' costs
      val expected = toks.map { t =>
        val c = m.costs.get(t)
        if (c != null) c.longValue()
        else {
          assert(t.codePointCount(0, t.length) == 1,
            s"sample $i: an out-of-vocab token must be a single codepoint (unk), got '$t'")
          m.unkCost
        }
      }.sum
      assert(UnigramSupport.totalCost(u, m) == expected,
        s"sample $i: totalCost diverges from the emitted segmentation's cost")
    }
  }

  test("Viterbi optimality: DP cost equals brute-force minimum over all segmentations (1k short words)") {
    def bruteMin(w: String, m: UnigramSupport.Model): Long = {
      val cps = w.codePoints().toArray
      val memo = new java.util.HashMap[Int, java.lang.Long]()
      def best(from: Int): Long = {
        if (from == cps.length) return 0L
        val cached = memo.get(from)
        if (cached != null) return cached.longValue()
        var b = Long.MaxValue
        for (to <- (from + 1) to cps.length) {
          val piece = new String(cps, from, to - from)
          val c0 = m.costs.get(piece)
          val c: java.lang.Long = if (c0 == null && to - from == 1) m.unkCost else c0
          if (c != null) {
            val rest = best(to)
            if (rest != Long.MaxValue) b = math.min(b, c.longValue() + rest)
          }
        }
        memo.put(from, java.lang.Long.valueOf(b))
        b
      }
      best(0)
    }
    (0 until 1000).foreach { i =>
      val m = genModel(600000L + (i % 10) * 1000L)
      val w0 = gen(genWord, 6000L + i, "ab")
      val cps = w0.codePoints().toArray
      val w = new String(cps, 0, math.min(cps.length, 6)) // keep brute force tractable
      val got = UnigramSupport.totalCost(UTF8String.fromString(w), m)
      assert(got == bruteMin(w, m),
        s"sample $i: DP cost $got != brute-force minimum for ${w.codePoints().toArray.toSeq}")
    }
  }
}
