package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Laws of [[Sampling.similarityOrderedPack]] — cluster contiguity, shard
  * integrity, the packing prefix law, and determinism.
  */
class SimilarityPackSpec extends SparkSpec {
  import spark.implicits._

  // 30 docs; pairs chain {1,2,3} and {10,11}, plus a pair {20,21}
  private def docs = (1L to 30L).map(i => (i, 10L + i % 7)).toDF("doc_id", "tok")
  private def pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("doc_a", "doc_b")

  private def packed = Sampling
    .similarityOrderedPack(docs, "doc_id", $"tok", pairs, numShards = 4, maxTokens = 64L)

  test("every relatedness cluster is contiguous in its shard's order (the in-context law)") {
    val rows = packed.select($"doc_id", $"comp", $"shard", $"pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    for (comp <- Seq(1L, 10L, 20L)) {
      val members = rows.filter(_._2 == comp)
      assert(members.map(_._3).distinct.length == 1, s"cluster $comp split across shards")
      val ps = members.map(_._4).sorted
      assert(ps.last - ps.head == ps.length - 1, s"cluster $comp not contiguous: ${ps.toSeq}")
    }
  }

  test("positions are a permutation per shard; singletons keep their own id as comp") {
    val rows = packed.select($"shard", $"pos", $"doc_id", $"comp").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"shard $shard pos gap")
    }
    val singleton = rows.find(_._3 == 25L).get
    assert(singleton._4 == 25L)
  }

  test("bins obey the exact prefix law over the similarity order") {
    val rows = packed.select($"shard", $"pos", $"n_tokens", $"bin")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, _, n, bin) =>
        assert(bin == cum / 64L, s"bin law broken at cum=$cum n=$n bin=$bin")
        cum += n
      }
    }
  }

  test("deterministic under repartitioning") {
    def run(parts: Int) = Sampling
      .similarityOrderedPack(docs.repartition(parts), "doc_id", $"tok", pairs, 4, 64L)
      .select($"doc_id", $"shard", $"pos", $"bin")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(run(2) == run(11))
  }
}
