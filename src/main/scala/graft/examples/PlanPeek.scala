package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Plan inspection tool: run one named `SparkEntry` query against an SF dir
  * and print its post-execution (AQE-final) physical plan — the loop the
  * "explain, then iterate until it's the plan you'd want" discipline runs
  * on. `runMain graft.examples.PlanPeek <sfDir> <queryName> [formatted]`.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanPeek <sfDir> <queryName> [formatted]")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    // collect() drives THIS df's QueryExecution (count() would clone one),
    // so the printed plan is the AQE-final one with reuse markers resolved
    val n = df.collect().length
    println(s"== $n rows ==")
    if (args.length > 2) df.explain(args(2)) else println(df.queryExecution.executedPlan)
  }
}
