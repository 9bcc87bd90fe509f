package graft

import graft.operators.{TextAnalysis, TfIdf}
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple banana durian"),
    (3L, "xylophone zebra quartz"),
    (4L, "apple banana cherry") // exact dup of 1
  ).toDF("doc_id", "text")

  test("nearest neighbor of a duplicated doc is its copy, disjoint docs stay unrelated") {
    val top = TfIdf.topKSimilar(docs, "doc_id", "text", k = 2, maxDfFrac = 1.0)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(top((1L, 1))._1 == 4L && math.abs(top((1L, 1))._2 - 1.0) < 1e-12)
    assert(top((4L, 1))._1 == 1L)
    // doc 3 shares no term with anyone → appears in no pair at all
    assert(!top.keys.exists(_._1 == 3L))
    // doc 2 is nearer to 1/4 (2 shared terms) than anything else
    assert(Set(1L, 4L).contains(top((2L, 1))._1))
  }

  test("df cap drops ubiquitous terms from the index") {
    // 'apple banana' in 3 of 4 docs = df 0.75 > cap 0.5 → only cherry/durian/... carry weight
    val w = TfIdf.weights(docs, "doc_id", "text", maxDfFrac = 0.5)
      .select($"term").distinct().collect().map(_.getString(0)).toSet
    assert(!w.contains("apple") && !w.contains("banana"))
    assert(w.contains("cherry") && w.contains("durian"))
  }

  test("absolute df bound binds where the relative cut does not (LEAST composition)") {
    // apple/banana have df 3 of 4: the relative cut at 1.0 keeps them, the
    // absolute Luhn bound at 2 drops them — posting-list length is capped
    // whatever the corpus size (the sf1 blow-up control)
    val w = TfIdf.weights(docs, "doc_id", "text", maxDfFrac = 1.0, maxDfCount = 2L)
      .select($"term").distinct().collect().map(_.getString(0)).toSet
    assert(!w.contains("apple") && !w.contains("banana"))
    assert(w.contains("cherry") && w.contains("durian")) // df 2 survives
  }

  test("weights are exact integers (the determinism contract)") {
    val types = TfIdf.weights(docs, "doc_id", "text", 1.0).schema("w").dataType
    assert(types == org.apache.spark.sql.types.LongType)
  }

  test("tokenChunks covers every token with the right starts and tail") {
    val txt = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Seq((1L, txt)).toDF("id", "t")
      .select(explode(TextAnalysis.tokenChunks($"t", 64, 48)).as("c"))
      .select($"c.start", $"c.ntok", $"c.chunk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(out.map(c => (c._1, c._2)).toSeq == Seq((0, 64), (48, 52)))
    assert(out(0)._3.startsWith("w1 w2 ") && out(0)._3.endsWith(" w64"))
    assert(out(1)._3.startsWith("w49 ") && out(1)._3.endsWith(" w100"))
  }

  test("short doc yields exactly itself as one chunk") {
    val out = Seq((1L, "a b c")).toDF("id", "t")
      .select(explode(TextAnalysis.tokenChunks($"t", 64, 48)).as("c"))
      .select($"c.start", $"c.ntok", $"c.chunk").collect()
    assert(out.length == 1 && out(0).getInt(0) == 0 && out(0).getInt(1) == 3 && out(0).getString(2) == "a b c")
  }

  test("boundary: doc of exactly chunkSize+1 tokens gets a 1-token tail") {
    val txt = (1 to 65).map(i => s"w$i").mkString(" ")
    val out = Seq((1L, txt)).toDF("id", "t")
      .select(explode(TextAnalysis.tokenChunks($"t", 64, 48)).as("c"))
      .select($"c.start", $"c.ntok").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(out == Seq((0, 64), (48, 17)))
  }

  test("fimTransform: PSM pieces reassemble to the original; selection and cuts deterministic") {
    import graft.operators.TextAnalysis
    val docs = (1L to 60L).map(i => (i, ("word" + i + " ") * 20)).toDF("id", "body")
    val out = TextAnalysis.fimTransform(docs, "id", "body", numerator = 1, denominator = 2,
      minChars = 10)
    val rows = out.select($"id", $"body", $"fim", $"fim_text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getString(3)))
    assert(rows.exists(_._3) && rows.exists(!_._3), "the band must split the corpus")
    rows.foreach { case (id, body, fim, ft) =>
      if (!fim) assert(ft == body, s"doc $id outside the band must pass through")
      else {
        // <PRE>prefix<SUF>suffix<MID>middle — reassembly is prefix+middle+suffix
        val m = "(?s)^<PRE>(.*)<SUF>(.*)<MID>(.*)$".r
        ft match {
          case m(p, s2, mid) => assert(p + mid + s2 == body, s"doc $id pieces do not reassemble")
          case _ => fail(s"doc $id: bad PSM layout: $ft")
        }
      }
    }
    // short docs never transform even inside the band
    val short = TextAnalysis.fimTransform(
      Seq((2L, "tiny")).toDF("id", "body"), "id", "body", 1, 1, minChars = 10)
    assert(!short.head.getAs[Boolean]("fim") && short.head.getAs[String]("fim_text") == "tiny")
    // partition-layout invariance
    val again = TextAnalysis.fimTransform(docs.repartition(7), "id", "body", 1, 2, 10)
      .select($"id", $"fim_text").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { case (id, _, _, ft) => assert(again(id) == ft) }
  }

  test("c4LineFilter: short and bad-phrase lines drop; counts exact; blank lines never count words") {
    import graft.operators.TextAnalysis
    val body = "a good line with five words\nshort line\n  \n" +
      "this one mentions JavaScript stuff here\nanother fine line of text"
    val out = TextAnalysis.c4LineFilter(
      Seq((1L, body)).toDF("id", "body"), "body", minWordsPerLine = 4,
      badPhrases = Seq("javascript")).head
    assert(out.getAs[Int]("n_lines") == 5)
    assert(out.getAs[Int]("n_kept_lines") == 2)
    assert(out.getAs[String]("kept_text") ==
      "a good line with five words\nanother fine line of text")
    // output-column clobber guard
    intercept[IllegalArgumentException] {
      TextAnalysis.c4LineFilter(Seq((1L, "x", "y")).toDF("id", "body", "kept_text"), "body")
    }
    // config validation: phrases must be lowercase (matching lowers the line)
    intercept[IllegalArgumentException] {
      TextAnalysis.c4LineFilter(Seq((1L, "x")).toDF("id", "body"), "body",
        badPhrases = Seq("JavaScript"))
    }
  }

  test("sentenceChunks: boundary convention by hand; sentences never split; overflow allowed") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "one two three. four five six seven. eight")).toDF("id", "body")
    val out = TextAnalysis.sentenceChunks(docs, "id", "body", maxTokens = 5)
      .orderBy($"sent_idx")
      .collect().map(r => (r.getInt(1), r.getAs[Long]("n_tokens"), r.getAs[Long]("chunk_id"),
        r.getAs[String]("sentence")))
    // cums 3,7,8 -> chunk = (cum - tok) DIV 5 = 0, 0, 1: sentence 1 starts
    // before the boundary so it OVERFLOWS chunk 0 (never split), and
    // sentence 2 opens chunk 1
    assert(out.toSeq == Seq(
      (0, 3L, 0L, "one two three"),
      (1, 4L, 0L, "four five six seven"),
      (2, 1L, 1L, "eight")))
    // a single over-long sentence owns its chunk rather than being cut
    val long = TextAnalysis.sentenceChunks(
      Seq((2L, "a b c d e f g")).toDF("id", "body"), "id", "body", maxTokens = 3).collect()
    assert(long.length == 1 && long(0).getAs[Long]("chunk_id") == 0L)
    // output-column clobber guard (same rule as c4LineFilter/gopherRules)
    intercept[IllegalArgumentException] {
      TextAnalysis.sentenceChunks(
        Seq((3L, "x", 1L)).toDF("id", "body", "n_tokens"), "id", "body", maxTokens = 3)
    }
  }

  test("gopherRules: hand-derived permilles; each planted violation trips its own rule") {
    import graft.operators.TextAnalysis
    val good = ("word " * 20).trim // 20 words x 4 chars -> mean 4000
    val docs = Seq(
      (1L, good),
      (2L, good + " # # #"), // 3 of 23 words symbolic -> 130 permille
      (3L, "- one two three four five\n- six seven eight nine ten"), // all lines bulleted
      (4L, "one two three four five...\nsix seven eight nine ten...") // all lines ellipsed
    ).toDF("id", "body")
    val out = TextAnalysis.gopherRules(docs, "body", minWords = 10)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Long]("n_words") == 20 &&
      out(1L).getAs[Long]("mean_len_permille") == 4000 &&
      out(1L).getAs[Boolean]("gopher_pass"))
    assert(out(2L).getAs[Long]("symbol_permille") == 3000 / 23 &&
      !out(2L).getAs[Boolean]("gopher_pass"))
    assert(out(3L).getAs[Long]("bullet_permille") == 1000 &&
      !out(3L).getAs[Boolean]("gopher_pass"))
    assert(out(4L).getAs[Long]("ellipsis_permille") == 1000 &&
      !out(4L).getAs[Boolean]("gopher_pass"))
    // too few words fails the floor; empty text is all-zeros, not a crash
    val tiny = TextAnalysis.gopherRules(Seq((9L, "only three words"), (10L, "")).toDF("id", "body"),
      "body", minWords = 10).collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(!tiny(9L).getAs[Boolean]("gopher_pass"))
    assert(tiny(10L).getAs[Long]("n_words") == 0 && tiny(10L).getAs[Long]("mean_len_permille") == 0)
  }

  test("corpusCard: hand-derived per-source rollup with planted dups and a non-English doc") {
    import graft.operators.Profile
    val en = "the cat sat on the mat and the dog ran to the park in the warm morning sun today"
    val de = "der hund und die katze ist nicht da und der tag ist lang und gut heute ja wirklich"
    val docs = Seq(
      (1L, en, "a"), (2L, en, "a"), // exact dup pair in source a
      (3L, de, "a"),
      (4L, "tiny words here", "b")
    ).toDF("doc_id", "text", "source")
    val card = Profile.corpusCard(docs, "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = card("a")
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("n_exact_dup_docs") == 1)
    assert(a.getAs[Long]("n_en_docs") == 2, "the German doc must not count as English")
    assert(a.getAs[Long]("n_tokens") == 19 * 2 + 18) // 19-word en doc twice + 18-word de doc
    assert(a.getAs[Long]("mean_tokens_permille") == (19 * 2 + 18) * 1000L / 3)
    val b = card("b")
    assert(b.getAs[Long]("n_docs") == 1 && b.getAs[Long]("n_exact_dup_docs") == 0)
  }

  test("fimTransform and canonicalUrlDedup refuse inputs carrying their output columns") {
    import graft.operators.{TextAnalysis, UrlOps}
    intercept[IllegalArgumentException] {
      TextAnalysis.fimTransform(
        Seq((1L, "x", true)).toDF("id", "body", "fim"), "id", "body", 1, 2, 10)
    }
    intercept[IllegalArgumentException] {
      UrlOps.canonicalUrlDedup(
        Seq((1L, "http://a.com", "z")).toDF("id", "url", "canonical_url"),
        "id", $"url", lit(1))
    }
  }

  test("bm25TopK: hand-computed exact score on a 3-doc corpus") {
    // N=3, S=3+2+4=9; query 'x': df=1, idf=(3-1+1)*1000 div 2 = 1500;
    // doc 1 (tf=2, dl=3): num = 1500*2*44*9 = 1,188,000
    //                     den = 20*9*2 + 6*9 + 18*3*3 = 576
    //                     w = 1188000 div 576 = 2062
    val corpus = Seq((1L, "x x y"), (2L, "y z"), (3L, "z z z z")).toDF("doc_id", "text")
    val out = TfIdf.bm25TopK(corpus, "doc_id", "text", terms = Seq("x"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, 2062L, 1)))
  }

  test("bm25TopK: length normalization ranks the shorter doc higher at equal tf") {
    val corpus = Seq(
      (1L, "q filler filler filler filler filler filler"),
      (2L, "q filler")
    ).toDF("doc_id", "text")
    val ranked = TfIdf.bm25TopK(corpus, "doc_id", "text", terms = Seq("q"), k = 2)
      .orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    assert(ranked == Seq(2L, 1L), "same tf, shorter dl must score higher (b > 0)")
  }

  test("bm25TopK edges: uppercase query terms match; empty corpus yields empty, not a crash") {
    val corpus = Seq((1L, "Widget assembly guide")).toDF("doc_id", "text")
    assert(TfIdf.bm25TopK(corpus, "doc_id", "text", Seq("WIDGET"), k = 1).count() == 1)
    val empty = corpus.filter($"doc_id" < 0)
    val out = TfIdf.bm25TopK(empty, "doc_id", "text", Seq("x"), k = 5)
    assert(out.count() == 0 && out.columns.toSeq == Seq("doc_id", "score", "rank"))
  }

  test("rrfFuse: hand-computed fusion — consensus doc wins over single-list leaders") {
    import graft.operators.Similarity
    // doc 3 is rank 2 in BOTH lists: 1000/62 + 1000/62 = 16+16 = 32,
    // beating each list's own #1 (1000/61 = 16) — the RRF consensus effect
    val a = Seq((1L, 1), (3L, 2), (4L, 3)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2), (5L, 3)).toDF("doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sortBy(_._3)
    assert(out.head == ((3L, 32L, 1)), s"consensus doc must fuse to the top, got ${out.head}")
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
    // absent-from-one-list docs got exactly one contribution
    assert(out.find(_._1 == 1L).get._2 == 1000L / 61)
  }

  test("hashedLinearScore: deterministic, order-sensitive via bigrams, safe on empty text") {
    import graft.operators.TextAnalysis
    val w = Array.tabulate(64)(i => (i * 37 % 201).toLong - 100L)
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"), // same unigrams, different bigrams
      (3L, "alpha beta gamma"),
      (4L, "")
    ).toDF("id", "t")
    val got = df.select($"id", TextAnalysis.hashedLinearScore($"t", w).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(3L), "identical text must score identically")
    assert(got(1L) != got(2L), "bigram features must distinguish word order")
    assert(got.contains(4L), "empty text must score (single empty token), not crash")
    // unigram-only mode ignores order
    val uni = df.select($"id", TextAnalysis.hashedLinearScore($"t", w, maxNgram = 1).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(uni(1L) == uni(2L), "maxNgram=1 must be bag-of-words")
  }

  test("noveltyReport: unique trigrams count as rare, shared ones don't; duplicates score 0") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a b c d"),       // trigrams: "a b c", "b c d" — both shared with doc 2
      (2L, "a b c d"),       // exact dup → rare_frac 0 for both
      (3L, "x y z w")        // trigrams unique corpus-wide → rare_frac 1
    ).toDF("id", "t")
    val out = TextAnalysis.noveltyReport(df, "id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)) && out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((2L, 2L, 1.0)))
  }

  test("noveltyReport plan: gram df is an aggregate + join-back, never a gram window") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("id", "t")
    val plan = TextAnalysis.noveltyReport(df, "id", "t")
      .queryExecution.executedPlan.toString
    // a count window over gram buffers the hottest gram's whole partition
    // in one un-splittable task; the aggregate form partial-combines it
    // map-side and the join-back is a shuffle join AQE can skew-split
    assert(!plan.contains("Window"), s"window found in:\n$plan")
    assert(plan.contains("partial_count"), s"no partial (map-side) count in:\n$plan")
  }

  test("noveltyVsReference: seen grams don't count as new; bloom bound never overcounts") {
    import graft.operators.TextAnalysis
    import graft.functions.BloomExprs
    val ref = Seq((100L, "a b c d e")).toDF("id", "t") // ref trigrams: "a b c","b c d","c d e"
    val docs = Seq(
      (1L, "a b c d"),   // trigrams "a b c","b c d" — both seen → new_frac 0
      (2L, "x y z w"),   // both unseen → new_frac 1
      (3L, "a b c x y")  // "a b c" seen; "b c x","c x y" new → 2/3
    ).toDF("id", "t")
    val out = TextAnalysis.noveltyVsReference(docs, ref, "id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((2L, 0L)), 2L -> ((2L, 2L)), 3L -> ((3L, 2L))))

    // bloom lower bound: <= exact n_new for every doc, == with a roomy bloom
    val h = (g: org.apache.spark.sql.Column) =>
      conv(substring(md5(g), 1, 15), 16, 10).cast("long")
    val refHashes = ref.select(explode(graft.functions.HashExprs.wordNGrams($"t", 3)).as("g"))
      .select(h($"g").as("k")).distinct()
    def bound(bytes: Int, hashes: Int) = {
      val bits = refHashes.agg(BloomExprs.bloomAgg($"k", bytes, hashes)).head.getAs[Array[Byte]](0)
      docs.select($"id", TextAnalysis.bloomNoveltyLowerBound($"t", bits).as("lb"))
        .as[(Long, Int)].collect().toMap
    }
    val tight = bound(16, 2) // 64 usable bits — false positives likely
    assert(tight.forall { case (id, lb) => lb <= out(id)._2 },
      s"bloom bound overcounted novelty: $tight vs exact ${out.view.mapValues(_._2).toMap}")
    val roomy = bound(4096, 5)
    assert(roomy == out.view.mapValues(_._2.toInt).toMap,
      s"roomy bloom should equal exact here, got $roomy")
  }

  test("bm25TopK: rare term outweighs a common term despite lower tf") {
    // 'common' in every doc (df=4 → tiny idf), 'rare' only in doc 4
    val corpus = Seq(
      (1L, "common common common a"),
      (2L, "common common common b"),
      (3L, "common common common c"),
      (4L, "common rare d e")
    ).toDF("doc_id", "text")
    val top = TfIdf.bm25TopK(corpus, "doc_id", "text", terms = Seq("common", "rare"), k = 1)
      .select($"doc_id").as[Long].head()
    assert(top == 4L)
  }

  test("null text/id is total across the per-row text stages (no -1 counts, no phantom chunks)") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "a real line with plenty of words here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "t")
    // tokenChunks: NULL text -> NULL array -> explode drops it (the old
    // behavior minted a phantom {start:0, ntok:-1, chunk:""} chunk)
    val chunks = df.select($"doc_id", explode(TextAnalysis.tokenChunks($"t", 4, 4)).as("c"))
    assert(chunks.filter($"doc_id" === 2L).count() == 0)
    assert(chunks.filter($"c.ntok" < 0).count() == 0)
    // c4LineFilter / gopherRules: null text behaves like empty text,
    // never negative counts
    val c4 = TextAnalysis.c4LineFilter(df, "t").filter($"doc_id" === 2L).head()
    assert(c4.getAs[Int]("n_lines") >= 0 && c4.getAs[Int]("n_kept_lines") == 0)
    val g = TextAnalysis.gopherRules(df, "t").filter($"doc_id" === 2L).head()
    assert(g.getAs[Long]("n_words") == 0L && !g.getAs[Boolean]("gopher_pass"))
    // fimTransform: fim is FALSE (not NULL) so the row lands in the
    // non-fim branch of a split instead of vanishing from both
    val fim = TextAnalysis.fimTransform(df, "doc_id", "t", 1, 2, minChars = 4)
    assert(fim.filter($"fim".isNull).count() == 0)
    assert(fim.filter(!$"fim").count() + fim.filter($"fim").count() == 2)
  }

  test("sentenceChunks rejects an idCol that collides with its outputs") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "one sentence. two sentence.")).toDF("chunk_id", "t")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.sentenceChunks(df, "chunk_id", "t", 8)
    }
    assert(e.getMessage.contains("chunk_id"),
      "the old carve-out let the withColumn silently overwrite the document key")
  }
}
