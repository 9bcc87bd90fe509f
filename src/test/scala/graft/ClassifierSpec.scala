package graft

import graft.operators.{Classifier, CorpusPipeline, TextAnalysis}
import org.apache.spark.sql.functions._

/** In-engine training of the hashed linear quality classifier. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val goodWords = Vector("bread", "butter", "market", "harvest", "garden", "letter",
    "weather", "morning", "river", "journey", "supper", "village")
  private val badWords = Vector("jackpot", "casino", "bonus", "winner", "prize", "scheme",
    "clickbait", "lottery", "gambit", "voucher", "spamlet", "hustle")

  /** English-shaped sentence from a vocab, deterministic per seed; carries
    * enough stopwords/length to clear the heuristic gates.
    */
  private def doc(vocab: Vector[String], seed: Int): String = {
    val pick = (i: Int) => vocab((seed * 7 + i * 3) % vocab.size)
    s"the ${pick(0)} and the ${pick(1)} of the ${pick(2)} with a ${pick(3)} near the ${pick(4)}" +
      s" and some ${pick(5)} for the ${pick(6)} in the ${pick(7)}"
  }

  private def labeled(n: Int) = (
    (1 to n).map(i => (i.toLong, doc(goodWords, i), true)) ++
      (1 to n).map(i => (1000L + i, doc(badWords, i), false))
  ).toDF("doc_id", "text", "label")

  test("trained weights separate a planted quality split, including held-out docs") {
    val train = labeled(40)
    val w = Classifier.trainHashedPerceptron(train, "doc_id", "text", "label", numBuckets = 1 << 12)
    // held-out: seeds the trainer never saw (vocab mixes differ per seed)
    val heldOut = (
      (1 to 15).map(i => (5000L + i, doc(goodWords, 100 + i), true)) ++
        (1 to 15).map(i => (6000L + i, doc(badWords, 100 + i), false))
    ).toDF("doc_id", "text", "label")
    val scored = heldOut
      .select($"label", (TextAnalysis.hashedLinearScore($"text", w) >= 0).as("keep"))
      .collect()
    val wrong = scored.count(r => r.getBoolean(0) != r.getBoolean(1))
    assert(wrong == 0, s"$wrong of ${scored.length} held-out docs misclassified")
  }

  test("a NULL id/text/label in the labeled set is rejected loudly, not an executor NPE") {
    // WordNGrams is nullIntolerant: a NULL text used to surface as an
    // opaque NPE at buckets.foreach deep in mapGroups after task retries
    val dirty = labeled(5).unionByName(
      Seq((9999L, null.asInstanceOf[String], true)).toDF("doc_id", "text", "label"))
    val e = intercept[IllegalArgumentException](
      Classifier.trainHashedPerceptron(dirty, "doc_id", "text", "label", numBuckets = 1 << 8))
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }

  test("determinism: same data and config yield the identical integer table, any partitioning") {
    val train = labeled(30)
    val w1 = Classifier.trainHashedPerceptron(train.repartition(3), "doc_id", "text", "label", 1 << 10)
    val w2 = Classifier.trainHashedPerceptron(train.repartition(17), "doc_id", "text", "label", 1 << 10)
    val w3 = Classifier.trainHashedPerceptron(train.orderBy($"text"), "doc_id", "text", "label", 1 << 10)
    assert(java.util.Arrays.equals(w1, w2), "partitioning changed the trained table")
    assert(java.util.Arrays.equals(w1, w3), "input order changed the trained table")
    assert(w1.exists(_ != 0L), "training must actually move weights")
  }

  test("the pipeline quality gate accepts the trained table (classifier_low fires on planted junk)") {
    val train = labeled(40)
    val w = Classifier.trainHashedPerceptron(train, "doc_id", "text", "label", 1 << 12)
    val corpus = Seq(
      (1L, doc(goodWords, 201)),
      (2L, doc(badWords, 202)),
      (3L, doc(goodWords, 203))
    ).toDF("doc_id", "text")
    val annotated = CorpusPipeline.annotate(
      corpus, "doc_id", "text",
      CorpusPipeline.Config(classifier = Some((w, 0L))))
    val reasons = annotated.select($"doc_id", $"drop_reason")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(reasons(1L).isEmpty && reasons(3L).isEmpty, s"good docs must pass, got $reasons")
    assert(reasons(2L).contains("classifier_low"), s"junk doc must fall to the classifier, got $reasons")
  }

  test("an empty labeled set is rejected, not silently trained to zeros") {
    intercept[IllegalArgumentException] {
      Classifier.trainHashedPerceptron(
        labeled(5).filter($"doc_id" < 0), "doc_id", "text", "label", 1 << 10)
    }
  }

  test("trainAndScore: one call trains on the labeled slice and gates the corpus") {
    val train = labeled(30)
    val corpus = Seq((10L, doc(goodWords, 301)), (11L, doc(badWords, 302))).toDF("doc_id", "text")
    val (w, scored) = Classifier.trainAndScore(train, corpus, "doc_id", "text", "label", 1 << 12)
    assert(w.length == (1 << 12))
    val kept = scored.filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(10L))
  }
}
