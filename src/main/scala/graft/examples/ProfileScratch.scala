package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.{CorpusPipeline, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Dev scratchpad: stage-by-stage timing of the near-dup path. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val T = Tables(spark, dir)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = T.documents.select($"doc_id", $"text")
    time("count docs")(docs.count())
    time("gates only") {
      docs
        .withColumn("__tokens", TextAnalysis.tokenCount($"text"))
        .withColumn("__quality", TextAnalysis.qualityScore($"text"))
        .withColumn("__lang", TextAnalysis.langId($"text"))
        .filter($"__tokens" >= 10).count()
    }
    val grams = docs
      .select($"doc_id", explode(array_distinct(Dedup.wordTrigrams($"text"))).as("gs"))
      .select($"doc_id", conv(substring(md5($"gs"), 1, 15), 16, 10).cast("long").as("g"))
      .persist()
    time("grams build")(grams.count())
    val freq = grams.groupBy($"g").agg(count(lit(1)).as("df"))
    val ranked = grams.join(freq, "g").groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"df", $"g"))).as("ranked"),
           sort_array(collect_list($"g")).as("gsort"))
      .select($"doc_id", $"ranked", $"gsort", size($"gsort").as("sz"))
      .persist()
    time("docs rank build")(ranked.count())
    val tCand = 0.2 - 5e-5 - 1e-9
    val prefixLen = greatest(($"sz" - ceil($"sz" * tCand) + 1).cast("int"), lit(1))
    val prefixes = ranked
      .select($"doc_id", $"sz", explode(slice($"ranked", lit(1), prefixLen)).as("pg"))
      .select($"doc_id", $"sz", $"pg.g".as("g"))
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.sz"), col("b.sz")) >= greatest(col("a.sz"), col("b.sz")) * tCand)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().persist()
    time("candidates t=0.2")(cand.count())
    time("verify t=0.2") {
      cand.join(ranked.as("da"), $"doc_a" === col("da.doc_id"))
        .join(ranked.as("db"), $"doc_b" === col("db.doc_id"))
        .select($"doc_a", $"doc_b",
          graft.functions.HashExprs.sortedIntersectSize(col("da.gsort"), col("db.gsort")).as("inter"),
          col("da.sz").as("sa"), col("db.sz").as("sb"))
        .filter(round($"inter" / ($"sa" + $"sb" - $"inter"), 4) >= 0.2).count()
    }
    time("full q41")(CorpusPipeline.report(T.documents, "doc_id", "text").count())
    spark.stop()
  }
}
