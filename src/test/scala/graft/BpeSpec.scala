package graft

import graft.functions.{BpeExprs, BpeSupport}
import org.apache.spark.sql.functions._

/** BPE tokenization: the GPT-2 merge loop, its rank-sequential/replace-chain
  * equivalence (what lets the DuckDB oracle be an unrolled expression), and
  * the Spark expression surface.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val merges = graft.operators.SamplingQueries.BpeMerges
  private def ranks(m: Seq[(String, String)]) = new BpeSupport.Ranks(m.toArray)

  test("hand-computed fixture parity (the GPT-2 walk)") {
    val r = ranks(merges)
    // "the": t h e -> (t,h)@0 -> th e -> (th,e)@1 -> the
    assert(BpeSupport.tokenizeWord("the", r).toSeq == Seq("the"))
    // "thin": t h i n -> th i n -> th in
    assert(BpeSupport.tokenizeWord("thin", r).toSeq == Seq("th", "in"))
    // "and": a n d -> an d -> and
    assert(BpeSupport.tokenizeWord("and", r).toSeq == Seq("and"))
    // "round": r o u n d -> (o,u)@9 -> r ou n d -> no (ou,n)/(r,ou)/(n,d) -> 4
    assert(BpeSupport.tokenizeWord("round", r).toSeq == Seq("r", "ou", "n", "d"))
    assert(BpeSupport.tokenizeWord("x", r).toSeq == Seq("x"))
    assert(BpeSupport.tokenizeWord("", r).isEmpty)
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeSupport.countTokens(UTF8String.fromString("the thin and"), r) == 4)
    assert(BpeSupport.countTokens(UTF8String.fromString("  the  "), r) == 1)
    assert(BpeSupport.countTokens(null, r) == 0)
  }

  /** The oracle's per-word computation, replayed in Scala: rank-sequential,
    * each rank applied as TWO left-to-right string replaces over the
    * space-separated symbol encoding — char-for-char what the DuckDB SQL
    * does.
    */
  private def replayOracleWord(word: String, m: Seq[(String, String)]): Int = {
    if (word.isEmpty) return 0
    var s = " " + word.map(c => s"$c ").mkString // ' ' + "a b c "
    for ((a, b) <- m) {
      val pat = s" $a $b "
      val rep = s" $a$b "
      s = s.replace(pat, rep).replace(pat, rep)
    }
    s.trim.split(" ").length
  }

  test("min-rank loop == the oracle's rank-sequential replace chain (randomized, well-formed tables)") {
    val rnd = new scala.util.Random(7)
    val atoms = "abcd"
    for (round <- 1 to 200) {
      // grow a well-formed table: each merge draws from atoms + prior outputs
      var symbols = atoms.map(_.toString).toVector
      val table = scala.collection.mutable.ArrayBuffer[(String, String)]()
      val used = scala.collection.mutable.HashSet[(String, String)]()
      while (table.size < 8) {
        val a = symbols(rnd.nextInt(symbols.size))
        val b = symbols(rnd.nextInt(symbols.size))
        // duplicates are invalid BPE tables (validate rejects them);
        // self-pairs are valid for the ENGINE but outside the SQL replay's
        // contract (see duckWordCountSql), so the equivalence property
        // draws from the replay's domain
        if (a != b && used.add((a, b))) {
          table += ((a, b))
          symbols :+= (a + b)
        }
      }
      BpeSupport.validate(table.toSeq)
      val r = ranks(table.toSeq)
      for (_ <- 1 to 20) {
        val w = Seq.fill(1 + rnd.nextInt(12))(atoms(rnd.nextInt(atoms.length))).mkString
        val viaLoop = BpeSupport.tokenizeWord(w, r).length
        val viaChain = replayOracleWord(w, table.toSeq)
        assert(viaLoop == viaChain,
          s"divergence on word '$w' with table $table: loop=$viaLoop chain=$viaChain")
      }
    }
  }

  test("codepoint atoms: astral-plane characters are ONE atom, never surrogate halves") {
    import org.apache.spark.unsafe.types.UTF8String
    val r = ranks(merges)
    val emoji = new String(Character.toChars(0x1F600)) // U+1F600, 2 UTF-16 units
    // char-level: one codepoint atom — the oracle's '(.)' atomization
    // counts codepoints, and a charAt walk read TWO (the surrogate pair),
    // diverging the gate and emitting lone-surrogate symbols UTF8String
    // mangles to '?'
    assert(BpeSupport.tokenizeWord(emoji, r).toSeq == Seq(emoji))
    assert(BpeSupport.countTokens(UTF8String.fromString(s"the $emoji"), r) == 2)
    // adjacent pairs over a mixed word never contain a lone surrogate
    val syms = BpeSupport.tokenizeWord(s"a$emoji", r)
    assert(syms.toSeq == Seq("a", emoji))
    assert(!syms.exists(s0 => s0.length == 1 && Character.isSurrogate(s0.charAt(0))))
    // byte-level path was always codepoint-safe (UTF-8 bytes): 4 atoms
    assert(BpeSupport.byteAtoms(emoji).length == 4)
  }

  test("whitespace boundary is exactly Java \\s (incl. U+000B), matching the oracle's explicit class") {
    import org.apache.spark.unsafe.types.UTF8String
    val r = ranks(merges)
    // x<VT>y: two words on the engine side; the generated oracle now
    // splits on '[ \t\n\v\f\r]+' (RE2's bare \s OMITS \v, so the old
    // oracle kept one word and the counts silently diverged)
    assert(BpeSupport.countTokens(UTF8String.fromString("x\u000By"), r) == 2)
    assert(BpeSupport.duckDocCountSql("text", merges).contains("""[ \t\n\v\f\r]+"""),
      "the oracle must spell the Java-\\s class explicitly")
  }

  test("self-pairs follow GPT-2's symbol-pairwise walk (engine semantics beyond the SQL replay)") {
    val r = ranks(Seq(("a", "a"), ("aa", "aa")))
    assert(BpeSupport.tokenizeWord("aaaaaa", r).toSeq == Seq("aaaa", "aa"),
      "6-run: pairwise (aa,aa,aa) then (aaaa, aa)")
    assert(BpeSupport.tokenizeWord("aaaaa", r).toSeq == Seq("aaaa", "a"))
    assert(BpeSupport.tokenizeWord("aaa", r).toSeq == Seq("aa", "a"))
    // and the SQL replay refuses the table instead of silently diverging
    intercept[IllegalArgumentException] {
      BpeSupport.duckWordCountSql("w", Seq(("a", "a")))
    }
  }

  test("malformed tables are rejected (compound symbol with no producing rank)") {
    intercept[IllegalArgumentException] {
      BpeSupport.validate(Seq(("ab", "c"), ("a", "b"))) // "ab" used before produced
    }
    intercept[IllegalArgumentException] {
      BpeSupport.validate(Seq(("a", " "))) // whitespace symbol
    }
    // NUL is the rank-table key separator: ("a\u0000","b") would alias
    // ("a","\u0000b")'s key and silently corrupt rank lookup
    intercept[IllegalArgumentException] {
      BpeSupport.validate(Seq(("a\u0000", "b")))
    }
    intercept[IllegalArgumentException] {
      BpeSupport.validate(Seq(("a", "\u0000b")))
    }
    BpeSupport.validate(Seq(("a", "b"), ("ab", "c"))) // well-formed passes
  }

  test("bytes_to_unicode is the published GPT-2 bijection (hand-computed anchors)") {
    val t = BpeSupport.ByteToChar
    assert(t.length == 256 && t.distinct.length == 256, "must be a bijection")
    // printable bytes map to themselves
    assert(t('!') == '!' && t('A') == 'A' && t('z') == 'z' && t(126) == '~')
    assert(t(161) == '¡' && t(172) == '¬' && t(174) == '®' && t(255) == 'ÿ')
    // shifted bytes take 256+n in byte order — the well-known GPT-2 chars:
    // space is Ġ (U+0120 = 256+32), newline is Ċ (U+010A = 256+10), NUL is Ā
    assert(t(32) == 'Ġ', "byte 32 (space) must be Ġ — the GPT-2 word-boundary symbol")
    assert(t(10) == 'Ċ', "byte 10 (LF) must be Ċ")
    assert(t(0) == 'Ā' && t(127) == (256 + 33).toChar && t(173) == (256 + 67).toChar)
  }

  test("byte atoms split multi-byte characters into remapped byte pieces") {
    assert(BpeSupport.byteAtoms("é").toSeq == Seq("Ã", "©")) // C3 A9, both printable
    assert(BpeSupport.byteAtoms("ä").toSeq == Seq("Ã", "¤")) // C3 A4
    assert(BpeSupport.byteAtoms("the").toSeq == Seq("t", "h", "e")) // ASCII = identity
    // soft hyphen U+00AD = C2 AD: C2 printable, AD (173) shifted
    assert(BpeSupport.byteAtoms("­").toSeq == Seq("Â", (256 + 67).toChar.toString))
  }

  test("byte-level walk merges across rebuilt multi-byte characters (hand-computed)") {
    val byteMerges = graft.operators.SamplingQueries.BpeByteMerges
    val r = ranks(byteMerges)
    // "thé": t h Ã © -> (Ã,©)@1 -> t h Ã© -> (t,h)@2 -> th Ã© -> (th,Ã©)@3
    assert(BpeSupport.tokenizeWordBytes("thé", r).toSeq == Seq("thÃ©"))
    // "än": Ã ¤ n -> (Ã,¤)@0 -> Ã¤ n -> (Ã¤,n)@5
    assert(BpeSupport.tokenizeWordBytes("än", r).toSeq == Seq("Ã¤n"))
    // ASCII words behave like the char-level walk under ASCII-only merges
    assert(BpeSupport.tokenizeWordBytes("thing", r).toSeq == Seq("th", "ing"))
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeSupport.countTokensBytes(UTF8String.fromString("thé än thing"), r) == 4)
    assert(BpeSupport.countTokensBytes(null, r) == 0)
  }

  test("byte-level expression surface: Column parity with the support walk") {
    val byteMerges = graft.operators.SamplingQueries.BpeByteMerges
    val df = Seq((1L, "thé thing où"), (2L, "plain words")).toDF("id", "t")
      .select($"id", BpeExprs.bpeByteTokenCount($"t", byteMerges).as("n"),
        BpeExprs.bpeByteTokenIds($"t", byteMerges, Seq("thÃ©", "oÃ¹", "th", "ing")).as("ids"))
      .orderBy($"id").collect()
    // "où" = o Ã ¹ (F9? no: ù = C3 B9 -> Ã ¹); (o,u) never fires on remapped ù
    val r = ranks(byteMerges)
    import org.apache.spark.unsafe.types.UTF8String
    assert(df(0).getInt(1) == BpeSupport.countTokensBytes(UTF8String.fromString("thé thing où"), r))
    assert(df(0).getSeq[Int](2).head == 0, "thé -> vocab id 0")
    assert(df(1).getInt(1) == BpeSupport.countTokensBytes(UTF8String.fromString("plain words"), r))
  }

  test("token ids index the vocabulary; OOV is -1") {
    val vocab = Seq("the", "th", "in", "and") // no atom entries
    val df = Seq((1L, "the thin and xyz")).toDF("id", "t")
      .select(BpeExprs.bpeTokenIds($"t", merges, vocab).as("ids"))
    // the -> [the]; thin -> [th, in]; and -> [and]; xyz -> x,y,z all OOV
    assert(df.head.getSeq[Int](0) == Seq(0, 1, 2, 3, -1, -1, -1))
  }

  test("decode(encode(word)) == word: the round-trip law over generated unicode words") {
    import graft.operators.BpeTrainer
    // a word generator spanning ASCII, accented latin (2-byte UTF-8), CJK
    // (3-byte), and an emoji (4-byte, surrogate pair in UTF-16) — the byte
    // path must reassemble every multi-byte character from its atoms
    val pieces = Array("ab", "ring", "é", "中", "😀", "zz", "qx7", "ß")
    val rnd = new scala.util.Random(11)
    val words = (1 to 120).map { _ =>
      (1 to (1 + rnd.nextInt(4))).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
    }.distinct
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    // train a real table on the words themselves, then build TOTAL
    // vocabularies (all atoms + every compound), so encode never emits -1
    val byteMerges = BpeTrainer.trainMerges(docs, "w", numMerges = 12, byteLevel = true)
    val byteVocab = (0 until 256).map(b => String.valueOf(BpeSupport.ByteToChar(b))) ++
      byteMerges.map { case (a, b) => a + b }
    val br = docs.select(
      $"w",
      BpeExprs.bpeByteDecodeIds(
        BpeExprs.bpeByteTokenIds($"w", byteMerges, byteVocab), byteVocab).as("back"))
      .collect()
    br.foreach(r => assert(r.getString(1) == r.getString(0),
      s"byte-level round trip broke: '${r.getString(0)}' -> '${r.getString(1)}'"))
    // char-level: same law, alphabet = the corpus's characters
    val charMerges = BpeTrainer.trainMerges(docs, "w", numMerges = 8)
    val charVocab = words.flatMap(_.toCharArray).distinct.map(String.valueOf(_)) ++
      charMerges.map { case (a, b) => a + b }
    val cr = docs.select(
      $"w",
      BpeExprs.bpeDecodeIds(
        BpeExprs.bpeTokenIds($"w", charMerges, charVocab), charVocab).as("back"))
      .collect()
    cr.foreach(r => assert(r.getString(1) == r.getString(0),
      s"char-level round trip broke: '${r.getString(0)}' -> '${r.getString(1)}'"))
  }

  test("decode NULL rule: OOV marker, out-of-range id, and non-alphabet symbol chars") {
    val vocab = Seq("a", "b", "ab")
    val ids = Seq(
      (1L, Seq(0, 2)),    // fine: "a" + "ab"
      (2L, Seq(0, -1)),   // encoder's OOV marker: no text to decode
      (3L, Seq(0, 3)),    // out of range
      (4L, Seq.empty[Int]) // empty ids decode to the empty string
    ).toDF("id", "ids")
    val out = ids.select($"id", BpeExprs.bpeDecodeIds($"ids", vocab).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("aab") && out(2L).isEmpty && out(3L).isEmpty && out(4L).contains(""))
    // a NULL ELEMENT inside the array: ArrayData.getInt on an unset slot
    // reads 0, so without the isNullAt guard a corrupt id stream would
    // silently decode to vocab(0)'s text instead of the contract's NULL
    val nullElem = Seq(1L).toDF("id")
      .select($"id", expr("array(0, CAST(NULL AS INT))").as("ids"))
      .select(BpeExprs.bpeDecodeIds($"ids", vocab).as("t"))
      .collect()
    assert(nullElem.head.isNullAt(0), "a NULL id element must decode to NULL, not vocab(0)")
    // byte-level: a vocab symbol carrying a char OUTSIDE the remapped
    // alphabet cannot be inverted to a byte — NULL, not an exception
    val badVocab = Seq("a", "☃") // snowman is not in bytes_to_unicode's image
    val bout = Seq((1L, Seq(0)), (2L, Seq(1))).toDF("id", "ids")
      .select($"id", BpeExprs.bpeByteDecodeIds($"ids", badVocab).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(bout(1L).contains("a") && bout(2L).isEmpty)
    // byte-level: an id stream whose ASSEMBLED bytes are not UTF-8 (a lead
    // byte with no continuation — every symbol individually passes the
    // alphabet check) must decode to NULL, never mint a malformed
    // UTF8String (the SQL mirror errors on the same input)
    val leadOnly = Seq(String.valueOf(BpeSupport.ByteToChar(0xC3))) // lone 0xC3
    val mout = Seq((1L, Seq(0))).toDF("id", "ids")
      .select(BpeExprs.bpeByteDecodeIds($"ids", leadOnly).as("t"))
      .collect()
    assert(mout.head.isNullAt(0), "truncated multi-byte sequence must decode to NULL")
    // and a VALID multi-byte assembly still round-trips
    val okVocab = Seq(BpeSupport.byteAtoms("é").mkString) // "Ã©" merged symbol
    val vout = Seq((1L, Seq(0))).toDF("id", "ids")
      .select(BpeExprs.bpeByteDecodeIds($"ids", okVocab).as("t"))
      .collect()
    assert(vout.head.getString(0) == "é")
  }

  test("oracle SQL escapes apostrophes in merge symbols; Ranks equality is structural") {
    // ("'", "s") is a legitimate English char-level merge: the generated
    // replace() literals must escape the quote or the oracle SQL is
    // malformed (the byte-level twin's rule)
    val sql = BpeSupport.duckWordSymbolsSql("w", Seq(("'", "s")))
    assert(sql.contains("' '' s '") && sql.contains("' ''s '"), s"unescaped quote in: $sql")
    // structural equality: identical merges must compare equal so CSE and
    // cached-plan matching can unify two expressions over the same table
    val a = new BpeSupport.Ranks(Array(("a", "b"), ("ab", "c")))
    val b = new BpeSupport.Ranks(Array(("a", "b"), ("ab", "c")))
    assert(a == b && a.hashCode == b.hashCode)
    assert(a != new BpeSupport.Ranks(Array(("a", "b"))))
  }

  test("expression surface: codegen placement, determinism, and Column parity") {
    // range-derived strings: a Seq-literal LocalRelation would be folded
    // whole by ConvertToLocalRelation and leave no codegen to assert
    val docs = spark.range(1, 201)
      .select($"id", concat(lit("the thing number "), $"id", lit(" rounds on and on")).as("t"))
    val counted = docs.select($"id", BpeExprs.bpeTokenCount(lower($"t"), merges).as("n"))
    val line = counted.queryExecution.executedPlan.toString
      .linesIterator.find(_.toLowerCase.contains("bpetokencount")).getOrElse("")
    assert(line.trim.matches("""^(\+- )?\*\(\d+\) (Project|Filter) .*"""),
      s"bpe count must stay inside codegen, got: $line")
    val a = counted.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val b = docs.repartition(13)
      .select($"id", BpeExprs.bpeTokenCount(lower($"t"), merges).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
