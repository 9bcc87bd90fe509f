package graft.examples

import graft.{GraftSession, SparkEntry}

/** Prints formatted physical plans for representative queries so the scan
  * pushdown / broadcast / codegen properties can be eyeballed and asserted.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q02_filter_project", "q04_brand_revenue", "q01_pricing_summary", "q11_current_state")
    val spark = GraftSession.local(8, 8)
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
