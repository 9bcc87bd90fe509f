package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

import scala.util.Random

/** Product quantization: encode correctness against a naive Scala argmin,
  * the zero-reconstruction-error exactness property, and trained-codebook
  * recall on clustered data (the production path).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4
  private val ksub = 8
  private val dsub = 4 // dim 16

  test("pqCodebook is deterministic and shaped (m × ksub × dsub) in [-1, 1)") {
    val a = Similarity.pqCodebook(m, ksub, dsub)
    val b = Similarity.pqCodebook(m, ksub, dsub)
    assert(a.length == m && a(0).length == ksub && a(0)(0).length == dsub)
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
    assert(a.flatten.flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("pqEncode matches a naive per-subspace argmin") {
    val cb = Similarity.pqCodebook(m, ksub, dsub)
    val rnd = new Random(11)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(m * dsub)(rnd.nextFloat() * 2 - 1)))
    val encoded = vecs.toDF("vec_id", "embedding")
    val got = Similarity
      .pqEncode(encoded, "embedding", cb)
      .select($"vec_id", $"codes")
      .as[(Long, Seq[Int])]
      .collect()
      .toMap
    vecs.foreach { case (id, v) =>
      val expect = (0 until m).map { s =>
        val sub = v.slice(s * dsub, (s + 1) * dsub).map(_.toDouble)
        (0 until ksub).minBy { j =>
          val c = cb(s)(j)
          // same formula as the operator: ||c||² - 2·x·c (ties → smallest j)
          c.map(x => x * x).sum - 2.0 * sub.zip(c).map { case (a, b) => a * b }.sum
        }
      }
      assert(got(id) == expect, s"vec $id")
    }
  }

  test("ADC distance is exact (and pqTopK ≡ L2 brute force) when vectors sit on centroids") {
    val cb = Similarity.pqCodebook(m, ksub, dsub)
    val rnd = new Random(23)
    // every vector is a concatenation of codebook centroids → reconstruction
    // error is zero, so ADC = exact squared L2 distance
    val vecs = (0L until 60L).map { i =>
      val v = (0 until m).flatMap(s => cb(s)(rnd.nextInt(ksub)).map(_.toFloat))
      (i, v)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val encoded = Similarity.pqEncode(corpus, "embedding", cb).select($"vec_id", $"codes")
    val queries = corpus.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val adc = Similarity
      .pqTopK(queries, encoded, cb, 5)
      .select($"qid", $"vec_id", $"adist")
      .as[(Long, Long, Double)]
      .collect()
    val byId = vecs.toMap
    adc.foreach { case (qid, vid, adist) =>
      val exact = byId(qid).zip(byId(vid)).map { case (a, b) => val d = a.toDouble - b.toDouble; d * d }.sum
      // not bit-zero: the stored vectors are float32, so each coordinate is
      // the centroid rounded to float — a ~1e-7-relative quantization the
      // double-precision ADC table doesn't share
      assert(math.abs(adist - exact) < 1e-5, s"($qid,$vid): adc=$adist exact=$exact")
    }
  }

  test("PQ expressions reject wrong input types at ANALYSIS, not eval") {
    import graft.functions.HashExprs
    import org.apache.spark.sql.functions.col
    val cb = Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val ints = Seq((1L, Seq(1, 2))).toDF("id", "v") // array<int>: would misread buffers
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(HashExprs.pqAssignCodes(col("v"), cb)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      // codes must be array<int>; array<double> codes must fail analysis
      Seq((1L, Seq(0.5), Seq(Seq(1.0)))).toDF("id", "codes", "t")
        .select(HashExprs.pqAdcDistance(col("codes"), col("t"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(HashExprs.pqQueryTable(col("v"), cb)).collect()
    }
  }

  test("dot/LSH/intersect expressions reject wrong input types at ANALYSIS, not eval") {
    // same unsafe-buffer hazard as the PQ family: an array<int> child used
    // to pass analysis and getDouble/getLong silently misread the buffer
    import graft.functions.HashExprs
    import org.apache.spark.sql.functions.col
    val ints = Seq((1L, Seq(1, 2), Seq(3, 4))).toDF("id", "a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(HashExprs.arrayDot(col("a"), col("b"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(HashExprs.lshBucket(col("a"), Seq(Array(1.0, -1.0)))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(HashExprs.sortedIntersectSize(col("a"), col("b"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      // array<struct<int,int>> must fail the struct variant (needs bigints)
      Seq((1L, Seq((1, 2)), Seq((3, 4)))).toDF("id", "a", "b")
        .select(HashExprs.sortedStructIntersectSize(col("a"), col("b"))).collect()
    }
    // the valid shapes still pass analysis and evaluate
    val ok = Seq((Seq(1.0f, 2.0f), Seq(0.5, 0.5), Seq(1L, 2L, 5L), Seq(2L, 5L, 9L)))
      .toDF("f", "d", "sa", "sb")
    val row = ok.select(
      HashExprs.arrayDot(col("f"), col("d")).as("dot"),
      HashExprs.sortedIntersectSize(col("sa"), col("sb")).as("n")).head()
    assert(math.abs(row.getDouble(0) - 1.5) < 1e-12 && row.getLong(1) == 2L)
  }

  test("dot fails LOUDLY on dimension mismatch; LSH expressions are structurally equal") {
    import graft.functions.HashExprs
    import org.apache.spark.sql.functions.col
    // a truncated embedding must throw, not score a plausible prefix cosine
    val mixed = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      mixed.select(HashExprs.arrayDot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null || e.getCause != null) // surfaced, not silent
    // two expressions built from FRESH hyperplanes() calls over the same
    // child must be equal — Array-typed planes compared by reference and
    // defeated CSE/cache reuse (the child is shared: an attribute's Origin
    // carries source-location context that legitimately differs per line)
    import org.apache.spark.sql.graftshim.ColumnShim
    val child = ColumnShim.expression(col("e"))
    val p1 = graft.functions.LshBucket(child, Similarity.hyperplanes(8, 16).map(_.toSeq))
    val p2 = graft.functions.LshBucket(child, Similarity.hyperplanes(8, 16).map(_.toSeq))
    assert(p1 == p2, "identical LshBucket expressions must compare equal")
  }

  test("trained codebook: ADC top-1 recall ≥ 0.9 on clustered data") {
    val rnd = new Random(7)
    val centers = Seq.fill(5)(Array.fill(16)(rnd.nextGaussian() * 5))
    val vecs = (0L until 200L).map { i =>
      (i, centers((i % 5).toInt).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrainKMeans(corpus, "embedding", m, ksub)
    val encoded = Similarity.pqEncode(corpus, "embedding", cb).select($"vec_id", $"codes")
    val queries = corpus.filter($"vec_id" < 20).select($"vec_id".as("qid"), $"embedding".as("qe"))
    // ADC ranks by L2; on tightly clustered data the nearest neighbor is a
    // same-cluster point for both L2 and the quantized distance
    val adcTop = Similarity
      .pqTopK(queries, encoded, cb, 1)
      .select($"qid", $"vec_id")
      .as[(Long, Long)]
      .collect()
      .toMap
    val hits = adcTop.count { case (q, v) => q % 5 == v % 5 }
    assert(hits >= 18, s"same-cluster top-1 hits: $hits/20")
  }
}
