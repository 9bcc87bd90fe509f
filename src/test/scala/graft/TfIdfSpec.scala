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
}
