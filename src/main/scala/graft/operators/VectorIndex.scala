package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ vector index — the index-as-artifact lifecycle a real
  * ANN deployment runs, as opposed to the per-query computation of
  * [[Similarity.ivfTopK]]/[[Similarity.pqTopK]]:
  *
  *  - BUILD once: k-means posting lists ([[Similarity.ivfIndex]]) + PQ
  *    codebooks ([[Similarity.pqTrainKMeans]]); the corpus is stored as
  *    m-byte PQ codes in a parquet table PARTITIONED BY posting list.
  *  - OPEN anywhere: centroids and codebooks are tiny parquet artifacts
  *    (k·d + m·ksub·dsub doubles) read back into plan literals — no
  *    driver-side model objects, any session can reopen the index.
  *  - QUERY: each query probes its nProbe nearest lists; because `cluster`
  *    is a PARTITION column of the postings table and the probe side is a
  *    broadcast join key, Spark's dynamic partition pruning skips every
  *    unprobed posting file — the scan reads nProbe/kLists of the index,
  *    which is the entire point at 100 TB (VectorIndexSpec asserts the
  *    dynamicpruning expression in the plan). Ranking is PQ/ADC table
  *    lookups over the codes; no d-dim arithmetic, no shuffle before the
  *    per-query top-k window.
  *
  * Codes quantize the raw vectors (IVF-Flat-PQ); re-encoding residuals
  * against each list's centroid (classic IVF-PQ, Jégou et al. TPAMI'11
  * §IV) is the recall upgrade when lists are tight — the layout and probe
  * path do not change.
  */
object VectorIndex {

  final case class Handle(
      dir: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]
  )

  /** Build and persist the index under `dir`. Returns an open handle. */
  def build(
      corpus: DataFrame, // (idCol, vecCol: array<float>)
      idCol: String,
      vecCol: String,
      dir: String,
      kLists: Int = 8,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L
  ): Handle = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val std = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val (assigned, centroids) = Similarity.ivfIndex(std, kLists, seed)
    val codebooks = Similarity.pqTrainKMeans(std, "embedding", m, ksub, seed)
    Similarity
      .pqEncode(assigned, "embedding", codebooks)
      .select($"vec_id", $"cluster", $"codes")
      .write
      .mode("overwrite")
      .partitionBy("cluster")
      .parquet(s"$dir/postings")
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toSeq
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/centroids")
    (for { s <- codebooks.indices; j <- codebooks(s).indices }
      yield (s, j, codebooks(s)(j).toSeq)).toDF("s", "j", "c")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/codebooks")
    Handle(dir, centroids, codebooks)
  }

  /** Reopen a persisted index: the metadata artifacts are tiny and land in
    * plan literals, exactly like a fresh build's.
    */
  def open(spark: SparkSession, dir: String): Handle = {
    import spark.implicits._
    val centroids = spark.read
      .parquet(s"$dir/centroids")
      .select($"cluster", $"centroid")
      .as[(Int, Seq[Double])]
      .collect()
      .sortBy(_._1)
      .map(_._2.toArray)
    val cbRows = spark.read
      .parquet(s"$dir/codebooks")
      .select($"s", $"j", $"c")
      .as[(Int, Int, Seq[Double])]
      .collect()
    require(
      centroids.nonEmpty && cbRows.nonEmpty,
      s"VectorIndex.open: no centroid/codebook rows under $dir — missing or partially-built index")
    val m = cbRows.map(_._1).max + 1
    val ksub = cbRows.map(_._2).max + 1
    val codebooks = Array.ofDim[Array[Double]](m, ksub)
    cbRows.foreach { case (s, j, c) => codebooks(s)(j) = c.toArray }
    // a ragged artifact (some (s,j) rows missing) would otherwise surface
    // as an NPE deep inside query-table construction
    require(
      codebooks.forall(sub => sub != null && sub.forall(_ != null)),
      s"VectorIndex.open: ragged codebook under $dir (expected $m×$ksub dense rows)")
    Handle(dir, centroids, codebooks)
  }

  /** ADC top-k over the persisted index: probe nProbe lists per query.
    * Returns (qid, vec_id, rank, adist), rank 1 = nearest by quantized L2.
    *
    * @param excludeSelf drop candidates whose `vec_id` equals the query's
    *        `qid` — correct when queries are drawn from the corpus itself
    *        (the default, matching the in-memory top-k operators); set
    *        false for an EXTERNAL query set, where a coincidental id
    *        collision must not silently delete a true neighbor.
    *
    * Dynamic partition pruning fires when `queries` carries a selective
    * predicate over a real source (the standard shape: a filtered scan of
    * a query table) — the optimizer then derives the postings partition
    * filter from the broadcast probe side at runtime. A purely in-memory
    * literal query set is constant-folded into a LocalRelation, which
    * leaves no predicate for the DPP rule to key on; the probe still
    * works, it just scans every posting file.
    */
  def query(
      h: Handle,
      queries: DataFrame, // (qid, qe: array<float>)
      nProbe: Int,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probed = queries
      // the ADC table is built BEFORE the probe explode — one m×ksub table
      // per query, duplicated (not recomputed) across its nProbe rows
      .withColumn("__qt", Similarity.pqQueryTable(col("qe"), h.codebooks))
      .withColumn("cluster", explode(Similarity.nearestCentroids(col("qe"), h.centroids, nProbe)))
      .select(col("qid"), col("cluster"), col("__qt"))
    val postings = queries.sparkSession.read.parquet(s"${h.dir}/postings")
    val scored = postings
      // the broadcast keeps the probe side tiny AND makes `cluster` a DPP
      // candidate: the partition filter on the postings scan is derived at
      // runtime from the probed cluster set
      .join(broadcast(probed), Seq("cluster"))
      .filter(if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(
        col("qid"),
        col("vec_id"),
        graft.functions.HashExprs.pqAdcDistance(col("codes"), col("__qt")).as("adist")
      )
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
