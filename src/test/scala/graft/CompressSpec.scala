package graft

import graft.functions.{CompressExprs, CompressSupport}
import graft.operators.{CorpusPipeline, TextAnalysis}
import org.apache.spark.sql.functions._

/** Deflate-based redundancy signal and its pipeline gate. */
class CompressSpec extends SparkSpec {
  import spark.implicits._

  test("deflate separates boilerplate from prose from noise, deterministically") {
    val boiler = ("all work and no play makes jack a dull boy " * 50).getBytes("UTF-8")
    val prose = ("the harbor master keeps a careful record of tides and cargo while small boats" +
      " drift through morning fog and gulls argue over scraps near the pier").getBytes("UTF-8")
    val noise = Array.tabulate[Byte](2000)(i => graft.functions.BloomSupport.mix(i.toLong).toByte)
    val rb = CompressSupport.deflatedSize(boiler, 6).toDouble / boiler.length
    val rp = CompressSupport.deflatedSize(prose, 6).toDouble / prose.length
    val rn = CompressSupport.deflatedSize(noise, 6).toDouble / noise.length
    assert(rb < 0.1, s"boilerplate ratio $rb")
    assert(rp > rb && rp < 1.0, s"prose ratio $rp")
    assert(rn > 0.95, s"mixed-bits noise must not compress, got $rn")
    assert(CompressSupport.deflatedSize(boiler, 6) == CompressSupport.deflatedSize(boiler, 6))
    assert(CompressSupport.deflatedSize(Array.emptyByteArray, 6) >= 0)
  }

  test("compressionPermille: exact integer permille, NULL on empty text") {
    val df = Seq(
      (1L, "spam " * 200),
      (2L, "")
    ).toDF("id", "t")
      .select($"id", TextAnalysis.compressionPermille($"t").as("pm"))
      .orderBy($"id")
      .collect()
    assert(df(0).getLong(1) < 100L, s"got ${df(0)}")
    assert(df(1).isNullAt(1), "empty text has no ratio")
  }

  test("pipeline gate: too_compressible fires on boilerplate, spares prose") {
    val docs = Seq(
      (1L, "the fine morning market sells fresh bread and warm butter to the early visitors" +
        " while the village bakery fills the square with a pleasant smell of the day"),
      (2L, "the same spam line repeats here " * 20)
    ).toDF("doc_id", "text")
    val reasons = CorpusPipeline
      .annotate(docs, "doc_id", "text",
        CorpusPipeline.Config(minCompressionPermille = Some(250L)))
      .select($"doc_id", $"drop_reason")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(reasons(1L).isEmpty, s"prose must pass, got $reasons")
    assert(reasons(2L).contains("too_compressible"), s"boilerplate must drop, got $reasons")
  }

  test("the deflate expression stays inside whole-stage codegen") {
    val df = spark.range(1, 100)
      .select($"id", encode(concat(lit("text body "), $"id"), "UTF-8").as("b"))
      .select($"id", CompressExprs.deflatedSize($"b").as("z"))
      .filter($"z" > 0)
    val line = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.toLowerCase.contains("deflatedsize")).getOrElse("")
    assert(line.trim.matches("""^(\+- )?\*\(\d+\) (Project|Filter) .*"""),
      s"deflate must stay inside codegen, got: $line")
    assert(df.count() == 99)
  }
}
