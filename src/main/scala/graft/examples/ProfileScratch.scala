package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Graph}

/** Dev scratchpad: stage-by-stage timing of the near-dup cluster path. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val T = Tables(spark, dir)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val pairsLazy = Dedup.minhashClusterEdges(T.documents, "doc_id", "text", 5, 12, 4)
    time("pairs (lazy recompute)")(pairsLazy.count())
    val pairs = pairsLazy.localCheckpoint(true)

    // instrumented round-by-round timing of the CC loop
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.DataFrame
      def largeStar(e: DataFrame): DataFrame = {
        val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
        val mins = sym.groupBy("a").agg(min("b").as("mb"))
          .select(col("a"), least(col("mb"), col("a")).as("m"))
        sym.join(mins, "a").filter(col("b") > col("a"))
          .select(col("b").as("a"), col("m").as("b"))
      }
      def smallStar(e: DataFrame): DataFrame = {
        val oriented = e.select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
          .filter(col("a") =!= col("b"))
        val mins = oriented.groupBy("a").agg(min("b").as("m"))
        oriented.join(mins, "a").select(col("b").as("v"), col("m"))
          .filter(col("v") =!= col("m")).select(col("v").as("a"), col("m").as("b"))
          .unionByName(mins.select(col("a"), col("m").as("b"))).distinct()
      }
      var e = pairs.select(greatest(col("doc_a"), col("doc_b")).as("a"), least(col("doc_a"), col("doc_b")).as("b"))
        .filter(col("a") =!= col("b")).distinct().localCheckpoint(false)
      def sig(d: DataFrame): (Long, Long) = {
        val r = d.agg(count(lit(1)), sum(xxhash64(col("a"), col("b")))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      var t = System.nanoTime()
      var prev = sig(e)
      println(f"  round 0 (init): ${(System.nanoTime() - t) / 1e9}%.2f s, ${prev._1} edges")
      var converged = false
      var it = 0
      while (!converged && it < 50) {
        t = System.nanoTime()
        e = smallStar(largeStar(e)).localCheckpoint(false)
        val cur = sig(e)
        println(f"  round ${it + 1}: ${(System.nanoTime() - t) / 1e9}%.2f s, ${cur._1} edges")
        converged = cur == prev
        prev = cur
        it += 1
      }
    }
    time("cc on checkpointed pairs")(Graph.connectedComponents(pairs, "doc_a", "doc_b").count())
    time("cc again (warm)")(Graph.connectedComponents(pairs, "doc_a", "doc_b").count())
    time("full q62 shape") {
      Graph
        .connectedComponents(
          Dedup.minhashClusterEdges(T.documents, "doc_id", "text", 5, 12, 4),
          "doc_a",
          "doc_b"
        )
        .count()
    }
    spark.stop()
  }
}
