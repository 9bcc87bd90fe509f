package graft

import graft.functions.{BpeExprs, BpeSupport}
import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

/** In-engine BPE training ([[BpeTrainer.trainMerges]]): hand-derived table
  * parity on a tiny corpus, determinism across partitionings, validate
  * round-trip, and the byte-level alphabet.
  */
@org.scalatest.tags.Slow
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("trained merges reproduce the hand-derived table on a tiny fixture") {
    // corpus pair counts, round by round (hand-computed):
    //   "the the the cat" + "then that" + "chat"
    // round 1 atoms: t h e (x3), c a t, t h e n, t h a t, c h a t
    //   (t,h): the x3 + then + that = 5   <- max
    //   (h,e): 3+1=4; (h,a): that+chat=2; (a,t): cat+that+chat=3; (c,a):1 (c,h):1 (e,n):1
    // round 2 with th: (th,e): 4  <- max  ((a,t) 3, (h,a) 1 now only chat... )
    // round 3: (a,t): cat+th|at+ch|at = 3 <- max ((the,?) none adjacent x3... "the" standalone)
    val docs = Seq(
      (1L, "the the the cat"),
      (2L, "then that"),
      (3L, "chat")
    ).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(docs, "text", numMerges = 3)
    assert(merges == Seq(("t", "h"), ("th", "e"), ("a", "t")),
      s"hand-derived table mismatch: $merges")
    // the trained table drives the tokenizer: "that" -> th at
    val r = new BpeSupport.Ranks(merges.toArray)
    assert(BpeSupport.tokenizeWord("that", r).toSeq == Seq("th", "at"))
    assert(BpeSupport.tokenizeWord("the", r).toSeq == Seq("the"))
  }

  test("training is deterministic under any partition layout") {
    val docs = (1L to 60L).map { i =>
      (i, s"alpha beta gamma delta word$i repeat repeat alpha${i % 7}")
    }.toDF("doc_id", "text")
    val a = BpeTrainer.trainMerges(docs.repartition(1), "text", numMerges = 8)
    val b = BpeTrainer.trainMerges(docs.repartition(13), "text", numMerges = 8)
    assert(a == b, s"partitioning changed the trained table:\n$a\n$b")
    assert(a.size == 8)
  }

  test("trained table round-trips validate and feeds the count expression") {
    val docs = Seq((1L, "rolling rolls rolled roll"), (2L, "roll rolling")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(docs, "text", numMerges = 6)
    BpeSupport.validate(merges) // must not throw (trainMerges also validates)
    val counted = docs.select(BpeExprs.bpeTokenCount($"text", merges).as("n"))
      .agg(sum($"n")).head.getLong(0)
    assert(counted > 0)
  }

  test("early stop: no pair reaches minPairCount") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every adjacent pair occurs exactly once; minPairCount=2 stops at 0
    assert(BpeTrainer.trainMerges(docs, "text", numMerges = 5).isEmpty)
    // minPairCount=1 learns singleton pairs deterministically (lexicographic)
    val one = BpeTrainer.trainMerges(docs, "text", numMerges = 1, minPairCount = 1L)
    assert(one == Seq(("a", "b")), s"lexicographic tie-break expected (a,b), got $one")
  }

  test("byte-level training rebuilds multi-byte characters from their byte pieces first") {
    // é (C3 A9 -> Ã ©) dominates: its byte pair is the most frequent
    val docs = Seq((1L, "éé éé éé"), (2L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(docs, "text", numMerges = 2, byteLevel = true)
    assert(merges.head == (("Ã", "©")),
      s"first byte-level merge must rebuild é from its bytes, got $merges")
    // the trained table round-trips through the byte-level walk
    val r = new BpeSupport.Ranks(merges.toArray)
    assert(BpeSupport.tokenizeWordBytes("é", r).toSeq == Seq("Ã©"))
  }

  test("word-frequency form ≡ per-occurrence rescan form (the scale-shape parity law)") {
    // the production trainer runs V rounds over the word-frequency table;
    // the reference form re-scans the corpus per round. Same corpus must
    // yield the identical table — counts, tie-breaks, early stop and all —
    // across repetition-heavy, unicode, self-pair-run, and sparse corpora
    val corpora = Seq(
      Seq("the the the cat", "then that", "chat"),
      Seq("éé éé ab", "éé ab ab", "zz"),
      Seq("aaaa aaaa", "aaab aaab aaab"),
      (1L to 40L).map(i => s"alpha beta word$i alpha${i % 5} beta")
    )
    for (texts <- corpora; byteLevel <- Seq(false, true)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // default path: driver-local incremental loop over the collected table
      val local = BpeTrainer.trainMerges(docs, "text", numMerges = 6, byteLevel = byteLevel)
      // maxDriverWords=0 forces the distributed word-frequency rounds
      val dist = BpeTrainer.trainMerges(
        docs, "text", numMerges = 6, byteLevel = byteLevel, maxDriverWords = 0L)
      val ref = BpeTrainer.trainMergesRescan(docs, "text", numMerges = 6, byteLevel = byteLevel)
      assert(local == ref, s"byteLevel=$byteLevel corpus=$texts:\n local=$local\n ref=$ref")
      assert(dist == ref, s"byteLevel=$byteLevel corpus=$texts:\n dist=$dist\n ref=$ref")
    }
  }

  test("driver-local loop at a real vocabulary depth: 300 merges match the distributed form") {
    // a deeper run than the 6-merge parity sweep: enough rounds that the
    // incremental maintenance (resume-walk, count deltas, lazy PQ) goes
    // through many create/invalidate cycles, including merges that chain
    // into earlier-rank pairs. 300 distributed rounds are already slow —
    // this is exactly the wall the driver-local form removes.
    val docs = (1L to 300L).map { i =>
      (i, s"prefix${i % 17}mid${i % 7} common${i % 3} suffix${i % 29}tail word$i repeat repeat")
    }.toDF("doc_id", "text")
    val local = BpeTrainer.trainMerges(docs, "text", numMerges = 300)
    val dist = BpeTrainer.trainMerges(docs, "text", numMerges = 300, maxDriverWords = 0L)
    assert(local == dist, "incremental driver-local loop diverged from the distributed rounds")
    // the corpus exhausts (every remaining pair below minPairCount) at 242
    // merges — deep enough to exercise chained merges and early stop, and
    // both forms must agree on the exhaustion point too
    assert(local.length == 242, s"expected exhaustion at 242 merges, got ${local.length}")
  }

  test("count ties among non-ASCII symbols break in Spark's UTF-8 order on both forms") {
    // \u00E9 (UTF-8 C3 A9) vs \uE000 (UTF-8 EE 80 80): every round-1 pair
    // count ties at 2, so the ORDER is pure tie-break. The driver-local
    // comparator must follow Spark's UTF8String order (unsigned UTF-8
    // bytes = code points), NOT String.compareTo's UTF-16 code units --
    // equivalent on these BMP symbols (the contract's range; supplementary
    // chars are documented out of char-level scope), pinned here so the
    // comparator can never drift from the distributed form.
    val docs = Seq((1L, "\u00E9z \uE000z"), (2L, "\u00E9z \uE000z")).toDF("doc_id", "text")
    val local = BpeTrainer.trainMerges(docs, "text", numMerges = 2)
    val dist = BpeTrainer.trainMerges(docs, "text", numMerges = 2, maxDriverWords = 0L)
    assert(local == dist, s"tie-break diverged: local=$local dist=$dist")
    assert(local == Seq(("\u00E9", "z"), ("\uE000", "z")),
      s"expected UTF-8 order (C3 A9 before EE 80 80), got $local")
  }

  test("self-pair runs train and walk with GPT-2 semantics (beyond the SQL replay)") {
    val docs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(docs, "text", numMerges = 2)
    assert(merges == Seq(("a", "a"), ("aa", "aa")), s"got $merges")
    val r = new BpeSupport.Ranks(merges.toArray)
    assert(BpeSupport.tokenizeWord("aaaa", r).toSeq == Seq("aaaa"))
  }
}
