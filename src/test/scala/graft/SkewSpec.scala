package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 10k rows for key 1, a handful elsewhere
  private def skewed = (Seq.fill(10000)(1) ++ Seq(2, 2, 3)).zipWithIndex
    .map { case (k, i) => (k.toLong, i.toLong) }
    .toDF("k", "v")
  private def dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"), (4L, "unused")).toDF("k", "name")

  test("saltedJoin returns exactly the plain-join result") {
    val plain = skewed.join(dim, Seq("k")).groupBy($"k", $"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8).groupBy($"k", $"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val a = plain.orderBy($"k").collect().toSeq
    val b = salted.orderBy($"k").collect().toSeq
    assert(a == b)
  }

  test("saltedSumCount equals plain aggregation") {
    val plain = skewed.groupBy($"k".as("key")).agg(sum($"v").as("total"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(skewed, $"k", $"v", salts = 8)
    assert(plain.orderBy($"key").collect().toSeq == salted.orderBy($"key").collect().toSeq)
  }

  test("left join preserves unmatched rows through salting") {
    val extra = (skewed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq :+ (99L, 0L)).toDF("k", "v")
    val plain = extra.join(dim, Seq("k"), "left").count()
    val salted = Skew.saltedJoin(extra, dim, "k", salts = 4, joinType = "left").count()
    assert(plain == salted)
  }
}
