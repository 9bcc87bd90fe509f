package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Exact corpus vocabulary and the Count-Min approximate heavy-hitter path
  * (one-sided error bound, mergeability across sources).
  */
class VocabularySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog ate the cat food"),
    (3L, "a mat and a cat")
  ).toDF("doc_id", "text")

  test("vocabulary: exact tf and df") {
    val v = TextAnalysis
      .vocabulary(docs, "doc_id", "text")
      .as[(String, Long, Long)]
      .collect()
      .map(t => t._1 -> (t._2, t._3))
      .toMap
    assert(v("the") == (4L, 2L)) // 2+2 occurrences across docs 1,2
    assert(v("cat") == (3L, 3L))
    assert(v("mat") == (2L, 2L))
    assert(v("a") == (2L, 1L)) // twice, both in doc 3
    assert(v("food") == (1L, 1L))
  }

  test("count-min sketch: estimates dominate true counts within eps*N") {
    val sketch = TextAnalysis.heavyHittersSketch(docs, "text", eps = 0.01, confidence = 0.99)
    val truth = TextAnalysis
      .vocabulary(docs, "doc_id", "text")
      .as[(String, Long, Long)]
      .collect()
    val n = truth.map(_._2).sum
    truth.foreach { case (term, tf, _) =>
      val est = sketch.estimateCount(term)
      assert(est >= tf, s"$term: CMS estimate $est below true $tf")
      assert(est <= tf + (0.01 * n).ceil.toLong + 1, s"$term: estimate $est too loose")
    }
  }

  test("count-min sketches merge losslessly across sources") {
    val bySource = Seq(
      docs.filter($"doc_id" <= 1),
      docs.filter($"doc_id" > 1)
    ).map(d => TextAnalysis.heavyHittersSketch(d, "text", eps = 0.01, confidence = 0.99))
    val merged = bySource.head.mergeInPlace(bySource(1))
    val whole = TextAnalysis.heavyHittersSketch(docs, "text", eps = 0.01, confidence = 0.99)
    Seq("the", "cat", "mat", "a", "food").foreach { term =>
      assert(merged.estimateCount(term) == whole.estimateCount(term), term)
    }
  }
}
