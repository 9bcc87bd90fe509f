package graft

import graft.operators.{Decontaminate, Pii}
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "the quick brown fox jumps over the lazy dog near the river bank today"

  private def corpus = Seq(
    (1L, s"intro words then $benchText and some trailing content here"), // embedded contamination
    (2L, "completely unrelated text about spark catalyst optimizer internals and shuffles"),
    (3L, benchText),                                                     // verbatim copy
    (4L, "short overlap near the river maybe but nothing substantial beyond that phrase")
  ).toDF("doc_id", "text")

  private def bench = Seq((100L, benchText)).toDF("doc_id", "text")

  test("flags embedded and verbatim contamination, not incidental short overlap") {
    val flagged = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text", minShared = 5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(flagged == Seq(1L, 3L))
  }

  test("clean drops exactly the contaminated docs") {
    val kept = Decontaminate
      .clean(corpus, bench, "doc_id", "text", minShared = 5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L))
  }

  test("overlap evidence grows with shared substring length") {
    val o = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text", minShared = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shared")).toMap
    assert(o(3L) >= o(1L))      // full copy shares at least as much as embedded
    assert(o.getOrElse(4L, 0L) < o(1L))
  }

  test("corpus side of the plan has no shuffle before the benchmark probe") {
    val fpsPlan = Decontaminate
      .overlaps(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(fpsPlan.contains("BroadcastHashJoin") || fpsPlan.contains("BroadcastExchange"))
  }
}

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("counts and scrubs emails and phones, leaves clean text alone") {
    val df = Seq(
      (1L, "mail a.b-c_d%x+1@sub.example.co.uk and call 555-123-4567 twice 555-000-1111"),
      (2L, "no pii here at all"),
      (3L, "edge: not-a-phone 12-345-6789 and half@email@ and a@b.io")
    ).toDF("id", "t")
    val out = df.select(
      $"id",
      Pii.emailCount($"t").as("e"),
      Pii.phoneCount($"t").as("p"),
      Pii.scrub($"t").as("s")
    ).orderBy($"id").collect()

    assert(out(0).getAs[Int]("e") == 1 && out(0).getAs[Int]("p") == 2)
    assert(out(0).getAs[String]("s") == "mail <EMAIL> and call <PHONE> twice <PHONE>")
    assert(out(1).getAs[Int]("e") == 0 && out(1).getAs[Int]("p") == 0)
    assert(out(1).getAs[String]("s") == "no pii here at all")
    // "half@email@" has no TLD; "a@b.io" qualifies; 12-345-6789 is not a NANP shape
    assert(out(2).getAs[Int]("e") == 1 && out(2).getAs[Int]("p") == 0)
    assert(out(2).getAs[String]("s") == "edge: not-a-phone 12-345-6789 and half@email@ and <EMAIL>")
  }

  test("scrub is idempotent") {
    val df = Seq((1L, "x y@z.com 555-123-4567")).toDF("id", "t")
    val once = df.select(Pii.scrub($"t").as("s"))
    val twice = once.select(Pii.scrub($"s").as("s"))
    assert(once.head.getString(0) == twice.head.getString(0))
  }
}
