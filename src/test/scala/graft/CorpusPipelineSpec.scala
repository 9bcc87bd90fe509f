package graft

import graft.lake.Lake
import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._

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
