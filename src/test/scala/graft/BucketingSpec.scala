package graft

import graft.lake.Lake
import graft.scd.Scd
import org.apache.spark.sql.functions._

/** Proves the 100 TB lake design claim: SCD windows and self-joins over a
  * key-bucketed table plan WITHOUT any Exchange — co-location is paid once
  * at write time.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("currentState over a uuid-bucketed table has no Exchange in the plan") {
    val path = tmpDir("bucketed")
    val rows = (1 to 100).flatMap { i =>
      Seq((s"u$i", 1, s"h$i-1", i * 10.0), (s"u$i", 2, s"h$i-2", i * 11.0))
    }.toDF("uuid", "t", "row_hash", "value")
    Lake.writeBucketed(rows, "props_bucketed_test", s"$path/t", "uuid", 4)

    val t = spark.table("props_bucketed_test")
    val cur = Scd.currentState(t, $"uuid", $"t")
    assert(cur.count() == 100)
    val plan = cur.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")

    // contrast: the same window over the plain parquet DOES shuffle
    val plain = rows
    val curPlain = Scd.currentState(plain, $"uuid", $"t")
    curPlain.count()
    assert(curPlain.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("bucketed self-join on the bucket key has no shuffle Exchange") {
    // disable broadcast so the join must co-locate both sides — bucketing
    // provides the distribution, so no ShuffleExchange appears
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("props_bucketed_test")
      val joined = t.as("a").join(t.as("b"), "uuid").groupBy($"uuid").agg(count(lit(1)).as("n"))
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
