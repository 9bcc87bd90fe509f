package graft

import graft.functions.{UnigramExprs, UnigramSupport}
import graft.operators.UnigramTrainer
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization ([[graft.functions.UnigramSupport]]) — Viterbi
  * exactness against hand-solved DPs, coverage/tie laws, and trainer
  * determinism + strategy parity.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // pieces chosen so greedy-longest is WRONG for "abc": greedy takes "ab"
  // (cost 4) + "c" (5) = 9; Viterbi finds "a" (3) + "bc" (2) = 5
  private val pieces = Seq(
    ("a", 3L), ("b", 4L), ("c", 5L), ("ab", 4L), ("bc", 2L), ("abc", 6L))
  private val unk = 100L

  private def toks(s: String): Seq[String] =
    Seq(Tuple1(s)).toDF("t")
      .select(UnigramExprs.unigramTokens($"t", pieces, unk).as("x"))
      .head().getSeq[String](0)

  private def count(s: String): Int =
    Seq(Tuple1(s)).toDF("t")
      .select(UnigramExprs.unigramCount($"t", pieces, unk)).head().getInt(0)

  private def cost(s: String): Long =
    Seq(Tuple1(s)).toDF("t")
      .select(UnigramExprs.unigramCost($"t", pieces, unk)).head().getLong(0)

  test("Viterbi beats greedy-longest where the grammar demands it") {
    assert(toks("abc") == Seq("a", "bc") && cost("abc") == 5L)
    // "abc" as one piece costs 6 > 5; two pieces with equal cost would
    // have lost to fewer-tokens first
  }

  test("cost ties break to fewer tokens, then to the longer final piece") {
    // "ab" as piece costs 4 (1 token); "a"+"b" costs 7 — piece wins on cost
    assert(toks("ab") == Seq("ab"))
    // equal cost AND count: "aa" via ("a","a") only — no tie available; use
    // a crafted model where ("xy") == ("x","y") in cost: 1-token wins
    val tie = Seq(("x", 1L), ("y", 1L), ("xy", 2L))
    val got = Seq(Tuple1("xy")).toDF("t")
      .select(UnigramExprs.unigramTokens($"t", tie, 9L).as("k")).head().getSeq[String](0)
    assert(got == Seq("xy"), "equal cost must prefer fewer tokens")
  }

  test("unknown characters always segment at unkCost (full coverage)") {
    assert(toks("azb") == Seq("a", "z", "b"))
    assert(cost("azb") == 3L + 100L + 4L)
    assert(count("") == 0 && cost("") == 0L)
    assert(count("   ") == 0)
    assert(count("ab cb") == 3) // "ab" + "c","b" (no piece spans the space)
  }

  test("astral-plane characters price as ONE unk codepoint, not two surrogate halves") {
    // the DuckDB replay's substr/len are codepoint-indexed; a code-unit
    // DP priced an emoji as TWO unk tokens and diverged (n_tokens, cost)
    val emoji = new String(Character.toChars(0x1F600))
    assert(count(s"a$emoji") == 2, "piece 'a' + one unk codepoint")
    assert(cost(s"a$emoji") == 3L + unk)
    assert(toks(s"a$emoji") == Seq("a", emoji), "the unk token is the WHOLE codepoint")
    assert(count(emoji) == 1 && cost(emoji) == unk)
  }

  test("trainer: deterministic across runs, singles never pruned, vocab size hit") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps again and again",
      "quick brown foxes are the quickest of the quick"
    ).toDF("text")
    val (p1, unk1) = UnigramTrainer.train(docs, "text", vocabSize = 40)
    val (p2, unk2) = UnigramTrainer.train(docs, "text", vocabSize = 40)
    assert(p1 == p2 && unk1 == unk2, "training must be bit-reproducible")
    val singles = p1.map(_._1).filter(_.length == 1).toSet
    val corpusChars = docs.as[String].collect().flatMap(_.replaceAll("\\s", "")).map(_.toString).toSet
    assert(corpusChars.subsetOf(singles), "every corpus char survives pruning")
    assert(p1.size <= 40 || singles.size > 40)
    // frequent substrings made the cut
    assert(p1.exists { case (p, _) => p.length > 1 && "quick".contains(p) || p == "the" })
  }

  test("trainer: driver-local and distributed E-steps agree") {
    val docs = Seq(
      "aa bb aa cc aa bb",
      "aa bb cc dd aa"
    ).toDF("text")
    val local = UnigramTrainer.train(docs, "text", vocabSize = 8, maxDriverWords = 1000000L)
    val dist = UnigramTrainer.train(docs, "text", vocabSize = 8, maxDriverWords = 0L)
    assert(local == dist, s"strategy parity broke:\n$local\nvs\n$dist")
  }

  test("Unicode whitespace is word-INTERNAL (ASCII boundary only) and training survives it") {
    // the pre-tokenizer boundary is ASCII \s, matching the trainer's
    // split and the DuckDB replay (RE2 \s is ASCII-only): U+3000 inside
    // a word is a legal piece char, and the model's whitespace guard must
    // use the SAME class — a broad Character.isWhitespace check used to
    // make training on CJK text throw from its own single-char seeds
    import graft.operators.UnigramTrainer
    val docs = Seq((1L, "ab\u3000cd ab\u3000cd plain words here")).toDF("id", "text")
    val (pieces, unk) = UnigramTrainer.train(docs, "text", vocabSize = 20, rounds = 2)
    assert(pieces.nonEmpty && unk > 0L) // no throw = the regression
    assert(pieces.exists(_._1 == "\u3000"), "U+3000 must be a coverage single")
  }

  test("the generated DuckDB oracle SQL is well-formed (parse smoke)") {
    val sql = UnigramSupport.duckDocOracleSql(
      "documents", "doc_id", "lower(text)", pieces, unk, maxLen = 12)
    assert(sql.contains("dp12") && !sql.contains("dp13"))
    assert(sql.contains("COALESCE") && sql.contains("list_value"))
  }
}
