package graft

import graft.lake.Lake
import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._

@org.scalatest.tags.Slow
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val long = "the quick brown fox jumps over the lazy dog and then runs far away to the hills again"

  private def corpus = Seq(
    (1L, long), // kept
    (2L, "tiny doc"), // too_short
    (3L, "der hund und die katze ist nicht da und der tag ist lang und gut heute ja"), // wrong_lang
    (4L, long), // exact_dup of 1
    (5L, long + " tonight"), // near_dup of 1
    (6L, "zz qq ww rr tt uu ii oo pp kk") // low_quality (no stopwords, short tokens)
  ).toDF("doc_id", "text")

  test("annotate assigns the expected drop reasons") {
    val got = CorpusPipeline
      .annotate(corpus, "doc_id", "text")
      .select($"doc_id", $"drop_reason")
      .as[(Long, Option[String])]
      .collect()
      .toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains("too_short"))
    assert(got(3L).contains("wrong_lang"))
    assert(got(4L).contains("exact_dup"))
    assert(got(5L).contains("near_dup"))
    assert(got(6L).contains("low_quality"))
  }

  test("clean keeps only the surviving docs; report aggregates reasons") {
    assert(CorpusPipeline.clean(corpus, "doc_id", "text").select($"doc_id").as[Long].collect().toSeq == Seq(1L))
    val rep = CorpusPipeline.report(corpus, "doc_id", "text").as[(String, Long)].collect().toMap
    assert(rep == Map("kept" -> 1L, "too_short" -> 1L, "wrong_lang" -> 1L,
      "exact_dup" -> 1L, "near_dup" -> 1L, "low_quality" -> 1L))
  }

  test("classifier gate drops below-threshold docs with its own reason, after the heuristics") {
    import graft.operators.TextAnalysis
    val w = Array.tabulate(128)(i => (i * 53 % 101).toLong - 50L)
    // threshold above doc 1's own score → the classifier would drop doc 1;
    // verify precedence by checking doc 6 still reads low_quality (the
    // heuristic fires first), while doc 1 gets classifier_low
    val s1 = corpus.filter($"doc_id" === 1L)
      .select(TextAnalysis.hashedLinearScore($"text", w)).as[Long].head()
    val cfg = CorpusPipeline.Config(classifier = Some((w, s1 + 1)))
    val got = CorpusPipeline.annotate(corpus, "doc_id", "text", cfg)
      .select($"doc_id", $"drop_reason").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("classifier_low"))
    assert(got(6L).contains("low_quality"), "heuristic gates fire before the classifier")
    // with the threshold at the doc's own score, it survives again
    val keep = CorpusPipeline.Config(classifier = Some((w, s1)))
    val kept = CorpusPipeline.clean(corpus, "doc_id", "text", keep)
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  // ---- per-domain token cap stage ----

  /** Mutually non-near-dup English docs (three varying content words spread
    * through the sentence kill enough trigrams to stay far under the 0.8
    * Jaccard gate) with a planted over-represented domain: ids 1..8 live on
    * big.example.com, 9..10 on small.org.
    */
  private def cappedCorpus = {
    val animals = Seq("otter", "badger", "falcon", "marten", "heron", "lynx", "stoat", "osprey",
      "weasel", "curlew")
    val places = Seq("harbor", "meadow", "quarry", "orchard", "marsh", "valley", "summit",
      "thicket", "estuary", "moor")
    (1L to 10L).map { i =>
      val a = animals((i - 1).toInt)
      val p = places((i - 1).toInt)
      val url =
        if (i <= 8) s"https://big.example.com/posts/$i" else s"https://small.org/notes/$i"
      (i, s"the small $a walked to the $p and found $i shiny stones by the water before " +
        s"the evening came and the $a went home", url)
    }.toDF("doc_id", "text", "url")
  }

  test("domain cap drops over-budget docs as domain_over_cap, exactly the q109 selection") {
    import graft.operators.{Sampling, TextAnalysis, UrlOps}
    val cap = 60L // ~24 tokens/doc: big.example.com keeps ~3 docs of 8
    val cfg = CorpusPipeline.Config(
      domainCap = Some(CorpusPipeline.DomainCap("url", capTokens = cap, numShards = 4)))
    val ann = CorpusPipeline.annotate(cappedCorpus, "doc_id", "text", cfg)
    val reasons = ann.select($"doc_id", $"drop_reason").as[(Long, Option[String])].collect().toMap
    val overCap = reasons.collect { case (id, Some("domain_over_cap")) => id }.toSet
    assert(overCap.nonEmpty, "the over-represented domain must lose docs to the cap")
    assert(overCap.forall(_ <= 8L), "small.org is under budget — only big.example.com drops")
    assert((1L to 10L).forall(id => reasons(id).forall(_ == "domain_over_cap")),
      "every fixture doc passes the quality gates; the only drop reason is the cap")

    // equivalence with the STANDALONE q109 selection: the same budget
    // machinery, run directly over the pre-cap survivors with the same
    // token counts, must pick the identical docs
    val survivors = cappedCorpus // every doc survives the other gates here
      .withColumn("__tok", TextAnalysis.tokenCount($"text"))
    val standalone = Sampling
      .tokenBudgetMixture(
        survivors,
        group = UrlOps.registeredDomain(UrlOps.canonicalizeUrl($"url")),
        key = $"doc_id",
        tokens = $"__tok",
        budgets = Map.empty,
        numShards = 4,
        defaultBudget = Some(cap))
      .select($"doc_id").as[Long].collect().toSet
    val pipelineKept = reasons.collect { case (id, None) => id }.toSet
    assert(pipelineKept == standalone,
      s"pipeline cap and standalone selection disagree: $pipelineKept vs $standalone")
    // and the audit table shows the cap's row
    val rep = CorpusPipeline.report(cappedCorpus, "doc_id", "text", cfg)
      .as[(String, Long)].collect().toMap
    assert(rep("domain_over_cap") == overCap.size && rep("kept") == pipelineKept.size)
  }

  test("docs dropped by earlier gates never consume their domain's budget") {
    import graft.operators.TextAnalysis
    // plant EXACT DUPS of doc 1 on the big domain with larger ids: they drop
    // as exact_dup, and the cap must select among true survivors as if the
    // dups were never there
    val base = cappedCorpus
    val dupTexts = base.filter($"doc_id" === 1L).select($"text").as[String].head()
    val withDups = base.union(Seq(
      (101L, dupTexts, "https://big.example.com/copy/1"),
      (102L, dupTexts, "https://big.example.com/copy/2")
    ).toDF("doc_id", "text", "url"))
    val cap = 60L
    val cfg = CorpusPipeline.Config(
      domainCap = Some(CorpusPipeline.DomainCap("url", capTokens = cap, numShards = 4)))
    val withDupReasons = CorpusPipeline.annotate(withDups, "doc_id", "text", cfg)
      .select($"doc_id", $"drop_reason").as[(Long, Option[String])].collect().toMap
    assert(withDupReasons(101L).contains("exact_dup") && withDupReasons(102L).contains("exact_dup"))
    val baseline = CorpusPipeline.annotate(base, "doc_id", "text", cfg)
      .select($"doc_id", $"drop_reason").as[(Long, Option[String])].collect().toMap
    assert((1L to 10L).forall(id => withDupReasons(id) == baseline(id)),
      "exact-dup rows changed the cap selection — they must not consume budget")
  }

  test("domain cap groups by the PSL domain when rules are supplied") {
    // two gob.mx agencies: the compact heuristic pools them under gob.mx
    // (one shared budget), the PSL rules split them into separate domains
    // (each under budget). Distinguishable by what survives.
    val docs = (1L to 6L).map { i =>
      val host = if (i % 2 == 0) "portal.hacienda.gob.mx" else "tramites.sat.gob.mx"
      val a = Seq("otter", "badger", "falcon", "marten", "heron", "lynx")((i - 1).toInt)
      (i, s"the small $a walked to the harbor and found $i shiny stones by the water before " +
        s"the evening came and the $a went home", s"https://$host/doc/$i")
    }.toDF("doc_id", "text", "url")
    val cap = 80L // ~3 docs' tokens: pooled → drops some; split → both fit
    def keptWith(rules: Option[Seq[String]]) = CorpusPipeline
      .clean(docs, "doc_id", "text",
        CorpusPipeline.Config(domainCap =
          Some(CorpusPipeline.DomainCap("url", cap, pslRules = rules, numShards = 4))))
      .count()
    assert(keptWith(None) < 6L, "heuristic pools gob.mx into one over-budget bucket")
    assert(keptWith(Some(Seq("mx", "gob.mx"))) == 6L,
      "PSL rules split the agencies into separate under-budget domains")
  }

  test("domain cap: NULL registered domain (single-label host) is capped, not silently dropped") {
    // the round-10 ADVICE high finding: under pslRules a single-label host
    // (e.g. an intranet name) has NO registered domain — those docs must be
    // budgeted together as the NULL bucket, not vanish into domain_over_cap
    // via a null-unsafe join regardless of budget
    val docs = (1L to 4L).map { i =>
      val a = Seq("otter", "badger", "falcon", "marten")((i - 1).toInt)
      (i, s"the small $a walked to the harbor and found $i shiny stones by the water before " +
        s"the evening came and the $a went home", s"https://intranet/doc/$i")
    }.toDF("doc_id", "text", "url")
    val cfg = CorpusPipeline.Config(
      domainCap = Some(CorpusPipeline.DomainCap(
        "url", capTokens = 10000L, pslRules = Some(Seq("com")), numShards = 4)))
    val reasons = CorpusPipeline.annotate(docs, "doc_id", "text", cfg)
      .select($"doc_id", $"drop_reason").as[(Long, Option[String])].collect().toMap
    assert((1L to 4L).forall(reasons(_).isEmpty),
      s"NULL-domain docs under a generous budget must ALL survive: $reasons")
    // and the cap still binds on the NULL bucket when the budget is tight
    val tight = cfg.copy(domainCap = Some(CorpusPipeline.DomainCap(
      "url", capTokens = 30L, pslRules = Some(Seq("com")), numShards = 4)))
    val tightReasons = CorpusPipeline.annotate(docs, "doc_id", "text", tight)
      .select($"doc_id", $"drop_reason").as[(Long, Option[String])].collect().toMap
    val dropped = tightReasons.count(_._2.contains("domain_over_cap"))
    assert(dropped > 0 && dropped < 4, s"tight NULL-bucket budget keeps a prefix: $tightReasons")
  }

  test("applyDomainCap refuses an input already carrying its reserved helper columns") {
    // house-style guard (Scd/Streams/TextAnalysis siblings): a caller's
    // __cap_tokens would be silently clobbered before the budget math
    val dc = CorpusPipeline.DomainCap("url", capTokens = 100L, numShards = 4)
    val clash = Seq((1L, "some text", "https://a.com/1", 5L))
      .toDF("doc_id", "text", "url", "__cap_tokens")
    val e = intercept[IllegalArgumentException](
      CorpusPipeline.applyDomainCap(clash, "doc_id", "text", dc))
    assert(e.getMessage.contains("__cap_tokens"), e.getMessage)
    val clash2 = Seq((1L, "some text", "https://a.com/1", 5L))
      .toDF("doc_id", "text", "url", "__cap_keep")
    intercept[IllegalArgumentException](
      CorpusPipeline.applyDomainCap(clash2, "doc_id", "text", dc))
  }

  test("compactPartitioned merges files per partition and preserves the layout") {
    val root = tmpDir("plake")
    (1 to 5).foreach { i =>
      Lake.appendPartitioned(
        Seq(("2024-01-01", i.toLong, s"a$i"), ("2024-01-02", (100 + i).toLong, s"b$i"))
          .toDF("day", "pid", "v"),
        root, "s", "t", Seq("day"))
    }
    def files(day: String) =
      new java.io.File(s"$root/s/t/day=$day").listFiles().count(_.getName.endsWith(".parquet"))
    assert(files("2024-01-01") == 5)
    Lake.compactPartitioned(spark, root, "s", "t", minFilesPerPartition = 4)
    assert(files("2024-01-01") == 1 && files("2024-01-02") == 1)
    val back = spark.read.parquet(Lake.tablePath(root, "s", "t"))
    assert(back.count() == 10)
    assert(back.filter($"day" === "2024-01-02").count() == 5) // partition column intact
  }

  test("partitioned lake append prunes partitions at file-listing time") {
    val root = tmpDir("plake")
    val df = Seq(
      ("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 3L, "c"), ("2024-01-03", 4L, "d")
    ).toDF("day", "pid", "v")
    Lake.appendPartitioned(df, root, "s", "events", Seq("day"))
    val read = spark.read.parquet(Lake.tablePath(root, "s", "events")).filter($"day" === "2024-01-02")
    assert(read.count() == 1)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-02"), plan)
    // directory layout is hive-style
    assert(new java.io.File(s"$root/s/events/day=2024-01-02").exists())
  }
}
