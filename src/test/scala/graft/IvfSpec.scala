package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

import scala.util.Random

/** IVF ANN over a CLUSTERED synthetic corpus (where quantization-based ANN
  * is supposed to shine, unlike the uniform driver corpus).
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated cluster centers in 16-d; 50 points each
  private def clustered: Seq[(Long, Seq[Float])] = {
    val rnd = new Random(7)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    (0 until 200).map { i =>
      val c = centers(i % 4)
      val v = c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat)
      (i.toLong, v.toSeq)
    }
  }

  test("IVF with nProbe=1 finds same-cluster neighbors; identical vector ranks first") {
    val corpus = clustered.toDF("vec_id", "embedding")
    // vec 999 duplicates vec 0 exactly
    val withDup = corpus.unionByName(
      corpus.filter($"vec_id" === 0).select(lit(999L).as("vec_id"), $"embedding"))

    val (indexed, centroids) = Similarity.ivfIndex(withDup, k = 4)
    assert(centroids.length == 4)
    // cluster sizes roughly balanced (4 x ~50)
    val sizes = indexed.groupBy($"cluster").count().as[(Int, Long)].collect().toMap
    assert(sizes.size == 4 && sizes.values.forall(n => n >= 40 && n <= 60))

    val queries = withDup.filter($"vec_id" === 0).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val top = Similarity.ivfTopK(queries, indexed, centroids, nProbe = 1, k = 5)
    val ranked = top.orderBy($"rank").select($"vec_id", $"cos").as[(Long, Double)].collect()
    assert(ranked.head._1 == 999L) // the exact duplicate
    assert(ranked.head._2 > 0.9999)
    // all neighbors are same-cluster members (ids ≡ 0 mod 4, or the dup)
    assert(ranked.forall { case (id, _) => id == 999L || id % 4 == 0 })
  }

  test("nearestCentroids(1) agrees with the builder's k-means assignment") {
    // VectorIndex.append assigns new vectors via nearestCentroids while
    // build used KMeans.transform — both are argmin ||x−c||², but this
    // proves it on data so a drift in either would fail loudly
    val corpus = clustered.toDF("vec_id", "embedding")
    val (assigned, centroids) = Similarity.ivfIndex(corpus, k = 4)
    val mismatch = assigned
      .withColumn("alt", element_at(Similarity.nearestCentroids($"embedding", centroids, 1), 1))
      .filter($"cluster" =!= $"alt")
      .count()
    assert(mismatch == 0L, s"$mismatch vectors assigned differently by the two argmin paths")
  }

  test("training is a pure function of (data, seed): rebuilds are bit-identical") {
    // Seeded spark.ml KMeans alone does NOT guarantee this — treeAggregate
    // merges partial float sums in task-completion order, so a loaded host
    // can land in a different local optimum run-to-run. trainingSample's
    // single sorted partition fixes the merge order; this encodes the law.
    val corpus = clustered.toDF("vec_id", "embedding").repartition(8)
    val c1 = Similarity.ivfIndex(corpus, k = 4)._2
    val c2 = Similarity.ivfIndex(corpus, k = 4)._2
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "IVF centroids differ across rebuilds")

    val b1 = Similarity.pqTrainKMeans(corpus, "embedding", m = 4, ksub = 8)
    val b2 = Similarity.pqTrainKMeans(corpus, "embedding", m = 4, ksub = 8)
    assert(
      b1.map(_.map(_.toSeq).toSeq).toSeq == b2.map(_.map(_.toSeq).toSeq).toSeq,
      "PQ codebooks differ across rebuilds")
  }

  test("bounded training sample still learns the cluster geometry") {
    // 64 of 200 rows (hash-selected, deterministic) must cover all 4
    // planted clusters — centroids trained on the sample assign the FULL
    // corpus into the same balanced 4 x ~50 lists as full-corpus training.
    val corpus = clustered.toDF("vec_id", "embedding")
    val (indexed, centroids) = Similarity.ivfIndex(corpus, k = 4, trainSampleSize = 64)
    assert(centroids.length == 4)
    val sizes = indexed.groupBy($"cluster").count().as[(Int, Long)].collect().toMap
    assert(sizes.size == 4 && sizes.values.forall(n => n >= 40 && n <= 60),
      s"sample-trained lists unbalanced: $sizes")
  }

  test("nProbe=4 (all clusters) equals brute force") {
    val corpus = clustered.toDF("vec_id", "embedding")
    val (indexed, centroids) = Similarity.ivfIndex(corpus, k = 4)
    val queries = corpus.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val ivf = Similarity.ivfTopK(queries, indexed, centroids, nProbe = 4, k = 5)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(queries, corpus, 5)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(ivf == bf)
  }
}
