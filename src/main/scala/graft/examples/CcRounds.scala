package graft.examples
import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Graph}
object CcRounds {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val T = Tables(spark, dir)
    val edges = Dedup.minhashClusterEdges(T.documents, "doc_id", "text", 5, 12, 4)
    val n = Graph.connectedComponents(edges, "doc_a", "doc_b").count()
    println(s"[ccrounds] rows=$n rounds=${Graph.lastRounds}")
    spark.stop()
  }
}
