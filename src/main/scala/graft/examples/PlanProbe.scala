package graft.examples

import graft.{GraftSession, SparkEntry}

/** Micro-bench one named SparkEntry query in isolation: 3 timed reps after a
  * warm-up, then the formatted plan — the iterate-on-`.explain` loop the
  * project uses to audit hot queries (`runMain graft.examples.PlanProbe q18_json_extract`).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q18_json_extract")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the canonical rig (not a hand-rolled twin that drifts from it — and
    // local() also registers the graft_* SQL functions a probed query may use)
    val spark = GraftSession.local(cores = 32, shufflePartitions = 32)
    import org.apache.spark.sql.functions._
    spark.range(1000000).agg(sum(col("id"))).collect() // warm
    val fn = SparkEntry.queries(name)
    for (i <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[probe] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
