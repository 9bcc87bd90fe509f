package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  * Sign-bit LSH follows Charikar's hyperplane-rounding scheme (STOC 2002);
  * the broadcast-query brute-force baseline is the standard distributed
  * top-k pattern (cf. the top-k similarity-search literature in PAPERS.md).
  *
  * Two paths:
  *  - brute-force: broadcast the (small) query set against the corpus scan —
  *    exact, O(|Q|·|C|·d), the right baseline and the verifier for ANN.
  *  - LSH (random ±1 hyperplanes): bucket both sides by sign-bit sketch and
  *    only rank within buckets — the 100 TB path: the corpus is hashed once
  *    (pure map), candidates come from an equi-join on the bucket id, and
  *    each bucket holds ~|C|/2^planes rows.
  *
  * All arithmetic is explicit float→double widening with sequential
  * accumulation so results are bit-identical to the DuckDB oracle.
  */
object Similarity {

  /** Native codegen dot product (sequential double accumulation — matches
    * the SQL oracle's index-order sum exactly; see
    * [[graft.functions.DotSupport]]).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.HashExprs.arrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** NULL — not NaN — when either vector has zero norm or NaN components.
    * Spark orders NaN ABOVE every double, so a single zero embedding in the
    * corpus (a failed-embedding row, routine in production) would otherwise
    * compute cos = 0/0 = NaN and rank 1 for EVERY query in all desc-ordered
    * top-k paths; NULL sorts last under desc, so degenerate vectors simply
    * never make a top-k.
    */
  def cosine(a: Column, b: Column): Column =
    // nanvl, not when(!isnan(c), c): one evaluation of the dot/norm tree
    // instead of two copies in the expression DAG
    nanvl(dot(a, b) / (norm(a) * norm(b)), lit(null).cast("double"))

  /** Deterministic ±1.0 hyperplanes derived from md5("plane:h:i") — the same
    * planes are reproducible in any engine (used to build the SQL oracle).
    */
  def hyperplanes(planes: Int, dim: Int): Seq[Array[Double]] = {
    val mdAlg = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { h =>
      Array.tabulate(dim) { i =>
        val d = mdAlg.digest(s"plane:$h:$i".getBytes("UTF-8"))
        if ((d(0) & 0x80) != 0) 1.0 else -1.0
      }
    }
  }

  /** Sign-bit LSH bucket: bit h set iff dot(e, plane_h) > 0 — single native
    * expression over all planes (one pass, small generated code).
    */
  def lshBucket(e: Column, planeVecs: Seq[Array[Double]]): Column =
    graft.functions.HashExprs.lshBucket(e, planeVecs)

  /** Scale-safe band width: the smallest bits-per-band in [8, 28] such
    * that `targetOccupancy · 2^bits ≥ n` — i.e. bits ≈ log₂(n / occupancy),
    * floored at the fixture-scale default of 8. Fixed-geometry sign-bit
    * LSH has candidate pairs ∝ n²/2^bits (per-bucket occupancy n/2^bits
    * rises linearly, pairs quadratically — measured exactly quadratic in
    * the `lsh_knob` A/B: 146k → 131M candidates at 30× with bits pinned
    * at 8); holding occupancy constant holds candidates-per-doc constant,
    * so the derived width is the geometry a 100 TB corpus needs BY
    * DEFAULT, not as a hand-tuned knob. The price is recall on the margin
    * (a planted-pair recall ≥ 0.997 at 1×/10×/30× in the same A/B —
    * ~0.2% under the fixed-width 0.9995), pinned in DedupSpec.
    *
    * Integer-exact on purpose: the comparison is `(occupancy << b) >= n`
    * in Long arithmetic, replayable verbatim in any engine — a
    * float ceil(log₂) could round differently across runtimes exactly at
    * the power-of-two boundaries. Clamp at 28 keeps the per-band bucket
    * id well inside a Long for any corpus this side of 2^33 vectors.
    */
  def bitsPerBand(n: Long, targetOccupancy: Long = 32L): Int =
    (8 to 28).find(b => (targetOccupancy << b) >= n).getOrElse(28)

  /** The default geometry for the embedding near-dup family: `bands`
    * bands of [[bitsPerBand]]-wide sign-bit buckets, planes derived by
    * the same deterministic md5 scheme as [[hyperplanes]] (so a count-
    * then-derive caller — or an oracle replaying the count in SQL — sees
    * identical planes). `hyperplanes(k)` is a prefix of `hyperplanes(k')`
    * for k < k', which is what lets an oracle render the max-width plane
    * set as literals once and select the derived prefix at query time.
    */
  def planesFor(
      n: Long,
      dim: Int,
      bands: Int = 4,
      targetOccupancy: Long = 32L
  ): Seq[Array[Double]] =
    hyperplanes(bands * bitsPerBand(n, targetOccupancy), dim)

  /** Exact top-k cosine neighbors for each query vector. `excludeSelf`
    * (default true, the in-corpus-query convention) matches the flag on
    * ivfTopK/pqTopK/VectorIndex.query: an EXTERNAL query set whose qid
    * coincidentally equals a corpus vec_id must pass false, or the baseline
    * silently deletes a true neighbor — and, as the recall verifier for the
    * ANN paths, then reports spurious misses against an index that kept it.
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qe: array<float>)
      corpus: DataFrame, // (vec_id, embedding: array<float>)
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(
        col("qid"),
        col("vec_id"),
        cosine(col("qe"), col("embedding")).as("cos")
      )
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Multi-probe ANN: each query also probes the buckets at hamming
    * distance 1 from its own (flip each of the `planes` bits) — the
    * standard recall lever for sign-bit LSH: candidates grow ~(planes+1)×
    * while staying ~(planes+1)/2^planes of the corpus.
    */
  def annTopKMultiProbe(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planeVecs: Seq[Array[Double]],
      excludeSelf: Boolean = true
  ): DataFrame = {
    val nPlanes = planeVecs.length
    val qb = queries
      .withColumn("__b", lshBucket(col("qe"), planeVecs))
      .withColumn(
        "bucket",
        explode(array((col("__b") +: (0 until nPlanes).map(h => col("__b").bitwiseXOR(lit(1L << h)))): _*))
      )
      .drop("__b")
    val cb = corpus.withColumn("bucket", lshBucket(col("embedding"), planeVecs))
    // dedup the (qid, vec_id) pairs BEFORE scoring: a candidate matching a
    // query in several probe buckets would otherwise pay the full d-dim
    // cosine once per matching probe (up to planes+1×) only for
    // dropDuplicates to discard the identical copies
    val scored = cb
      .join(broadcast(qb), Seq("bucket"))
      .filter(if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(col("qid"), col("vec_id"), col("qe"), col("embedding"))
      .dropDuplicates("qid", "vec_id")
      .select(col("qid"), col("vec_id"), cosine(col("qe"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic bounded training sample for k-means: the lowest-`n`
    * rows by a content hash of the vector, gathered by per-partition
    * top-n + driver merge (RDD `takeOrdered` — NOT `orderBy(...).limit`,
    * which Catalyst plans as a FULL GLOBAL SORT of the corpus once the
    * limit exceeds `topKSortFallbackThreshold`, 10k by default; a training
    * sample is 64k+). The corpus is never shuffled; the driver holds at
    * most n × (8B + serialized vector) ≈ tens of MB. Two properties, both
    * load-bearing at 100 TB:
    *
    *  - BOUNDED COST: quantizer training never k-means the full corpus —
    *    the standard IVF/PQ practice (FAISS trains on a ~10⁵-10⁶ sample);
    *    training cost is O(sample), independent of corpus size, while
    *    assignment/encoding stay fully distributed scans.
    *  - BIT-REPRODUCIBLE: spark.ml KMeans is seeded but NOT timing-stable
    *    on a multi-partition input — treeAggregate merges partial float
    *    sums in task-completion order, so a loaded host can converge to a
    *    different local optimum run-to-run. The merged sample lands in ONE
    *    partition in one deterministic order, fixing the aggregation
    *    order and making centroids (and therefore index geometry and
    *    measured recall) a pure function of (data, seed) — rebuilding an
    *    index yields the same index.
    *
    * Hash ties are broken by the serialized vector itself; equal vectors
    * are interchangeable, so the sample content is fully deterministic.
    * The JSON round-trip is exact: Jackson renders floats/doubles via
    * `toString`, which is shortest-round-trip in Java.
    */
  private def trainingSample(df: DataFrame, vecCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecType = df.schema(vecCol).dataType
    val top = df
      // drop null embeddings up front: to_json(null) is null, two null __j
      // rows tie on the hash and NPE inside takeOrdered's tuple Ordering —
      // an opaque driver crash deep in the per-partition merge, where the
      // rest of the engine treats degenerate embeddings as ignorable
      // (cosine → NULL). Nulls carry no geometry to train on anyway.
      .filter(col(vecCol).isNotNull)
      .select(to_json(col(vecCol)).as("__j"))
      .select(xxhash64($"__j").as("__h"), $"__j")
      .as[(Long, String)]
      .rdd
      .takeOrdered(n)
    spark
      .createDataset(top.toIndexedSeq)
      .toDF("__h", "__j")
      // ONE partition: fixed KMeans aggregation order. Side effect: KMeans
      // tasks over this local dataset carry the whole sample in their
      // closure (the "task of very large size" warning in q42/q53 benches)
      // — bounded by trainSampleSize (~1.5 MB at 2^16 × 64 dims), NOT by
      // corpus size, so it is benign at any scale and the price of
      // bit-reproducible training.
      .coalesce(1)
      .select(from_json($"__j", vecType).as(vecCol))
  }

  /** IVF (inverted-file) index: k-means centroids over the corpus; each
    * vector is assigned to its nearest centroid's posting list. Queries
    * probe the `nProbe` nearest centroids and rank only those lists —
    * the standard quantization-based ANN scale path, complementing the
    * hash-based LSH variant. Built on spark.ml KMeans over a
    * deterministic bounded sample ([[trainingSample]] — FAISS-style
    * train-on-sample, bit-reproducible); at 100 TB the assignment is a
    * broadcast of k centroid vectors against the corpus scan, and posting
    * lists are just a `cluster` column the bucket-join groups by.
    */
  def ivfIndex(
      corpus: DataFrame,
      k: Int,
      seed: Long = 42L,
      maxIter: Int = 8,
      trainSampleSize: Int = 1 << 16
  ): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featurized = corpus.withColumn("features", array_to_vector(col("embedding")))
    // maxIter trades index-build time against posting-list balance (probe
    // recall), never result correctness: probe-everything top-k is exact for
    // ANY centroids, and the nProbe<k path's recall is a tuning knob every
    // IVF deployment sizes empirically. 8 iterations is where movement
    // plateaus on embedding-shaped data; raise it when building a long-lived
    // index whose build cost amortizes across many queries.
    val trainSet = trainingSample(corpus.select(col("embedding")), "embedding", trainSampleSize)
      .select(array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("features").fit(trainSet)
    val assigned = model.transform(featurized).withColumnRenamed("prediction", "cluster").drop("features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** The `nProbe` nearest centroid ids for a query vector, as an array
    * column — shared by the in-memory IVF probe and the persistent
    * [[VectorIndex]] (whose partition-pruned read wants the cluster list
    * as a column to explode).
    */
  def nearestCentroids(qe: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    val centroidDists = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        (lit(sumSq(c)) - lit(2.0) * dot(qe, array(c.map(lit): _*))).as("d"),
        lit(i).as("cluster")
      )
    }
    slice(array_sort(array(centroidDists: _*)), 1, nProbe).getField("cluster")
  }

  /** Probe the nProbe nearest centroids per query, then exact-rank within
    * the probed posting lists.
    */
  def ivfTopK(
      queries: DataFrame, // (qid, qe)
      indexed: DataFrame, // (vec_id, embedding, cluster) from ivfIndex
      centroids: Array[Array[Double]],
      nProbe: Int,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val probed = queries
      .withColumn("cluster", explode(nearestCentroids(col("qe"), centroids, nProbe)))
    val scored = indexed
      .join(broadcast(probed), Seq("cluster"))
      // excludeSelf=false for external query sets: a coincidental qid/vec_id
      // collision must not delete a true neighbor there
      .filter(if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(col("qid"), col("vec_id"), cosine(col("qe"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def sumSq(a: Array[Double]): Double = a.map(x => x * x).sum

  // ---------------------------------------------------------------------
  // Product quantization (Jégou, Douze & Schmid, "Product Quantization for
  // Nearest Neighbor Search", IEEE TPAMI 2011) — the memory-bound ANN scale
  // path that complements the hash-based (LSH) and partition-based (IVF)
  // variants above. The d-dim vector is split into m subvectors; each
  // subvector is quantized to one of ksub sub-centroids, so a vector is
  // stored as m small codes (d=64 float32 → m=8 byte codes = 32×
  // compression). Query-time ranking is ADC (asymmetric distance
  // computation): the query precomputes an m×ksub table of exact
  // subvector→centroid distances ONCE, and every corpus row's approximate
  // distance is just m table lookups over its codes — no decode and no
  // d-dim arithmetic on the corpus side. At 100 TB that is the whole point:
  // the scan reads m bytes per row instead of 4·d, the query table is a
  // broadcast, and there is no shuffle anywhere in the probe.
  // ---------------------------------------------------------------------

  /** Deterministic data-independent PQ codebook: values derived from
    * md5("pq:s:j:i") mapped into [-1, 1) — reproducible in any engine, which
    * is what makes the ADC pipeline oracle-checkable end to end (the same
    * trick as [[hyperplanes]]). For quality on a real corpus train the
    * codebook instead ([[pqTrainKMeans]]); every downstream operator takes
    * the codebook as a value and works with either.
    *
    * @return codebooks(s)(j) = sub-centroid j of subspace s (dsub doubles)
    */
  def pqCodebook(m: Int, ksub: Int, dsub: Int): Array[Array[Array[Double]]] = {
    val mdAlg = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(m, ksub, dsub) { (s, j, i) =>
      val d = mdAlg.digest(s"pq:$s:$j:$i".getBytes("UTF-8"))
      val u = ((d(0) & 0xffL) << 24 | (d(1) & 0xffL) << 16 | (d(2) & 0xffL) << 8 | (d(3) & 0xffL)).toDouble / (1L << 32).toDouble
      u * 2.0 - 1.0
    }
  }

  /** Data-trained PQ codebook: one seeded k-means per subspace over the
    * corpus's subvectors (m passes over one cached projection — index-build
    * cost, amortized across every query the index ever serves). Trains on
    * a deterministic bounded sample ([[trainingSample]]): codebooks are a
    * pure function of (data, seed) and training cost is independent of
    * corpus size. The m fits are independent, so they run as CONCURRENT
    * Spark jobs over the shared cached sample — the scheduler interleaves
    * their stages across the cluster instead of leaving it idle between
    * sequential fits (results are per-subspace and seeded, so concurrency
    * cannot change them).
    */
  def pqTrainKMeans(
      corpus: DataFrame,
      vecCol: String,
      m: Int,
      ksub: Int,
      seed: Long = 42L,
      maxIter: Int = 8,
      trainSampleSize: Int = 1 << 16
  ): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import scala.collection.parallel.CollectionConverters._
    val dim = corpus
      .select(size(col(vecCol)).as("__d"))
      .filter(col("__d") > 0)
      .head(1)
      .headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"pqTrainKMeans: corpus is empty or '$vecCol' has no non-empty vectors"))
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val cached = trainingSample(corpus.select(col(vecCol)), vecCol, trainSampleSize).cache()
    try {
      // materialize the cache ONCE before fanning out: concurrent first
      // touches would each recompute the projection into the cache
      cached.count()
      (0 until m).par.map { s =>
        val sub = cached.select(array_to_vector(slice(col(vecCol), s * dsub + 1, dsub)).as("features"))
        val model = new KMeans().setK(ksub).setSeed(seed + s).setMaxIter(maxIter).fit(sub)
        val centers = model.clusterCenters.map(_.toArray)
        // k-means returns fewer than k centers when a subspace has fewer
        // distinct subvectors — a ragged codebook breaks every downstream
        // consumer (codes index into ksub entries), so fail loudly here
        require(
          centers.length == ksub,
          s"pqTrainKMeans: subspace $s yielded ${centers.length} < $ksub centers " +
            "(too few distinct subvectors); lower ksub or m")
        centers
      }.toArray
    } finally cached.unpersist()
  }

  /** PQ-encode the corpus: `codes(s) = argmin_j ||x_s - C[s][j]||²`, computed
    * as `argmin_j (||C[s][j]||² - 2·x_s·C[s][j])` (the `||x_s||²` term is
    * constant across j), ties broken by smallest j. A pure scan-side map —
    * one native codegen expression ([[graft.functions.PqAssignCodes]]; an
    * m×ksub array_sort-of-structs composition is 100+ subexpressions for
    * Janino and falls off whole-stage codegen), nothing shuffles.
    */
  def pqEncode(corpus: DataFrame, vecCol: String, codebooks: Array[Array[Array[Double]]]): DataFrame =
    corpus.withColumn("codes", graft.functions.HashExprs.pqAssignCodes(col(vecCol), codebooks))

  /** Per-query ADC distance table: `table(s)(j) = ||q_s - C[s][j]||²`,
    * evaluated on the small query side only — the corpus never touches
    * d-dim math. One native codegen expression
    * ([[graft.functions.PqQueryTableExpr]]) with the codebook as a
    * reference object: the previous plan-expression composition inlined
    * m·ksub·dsub codebook literals into the tree, and the seconds of
    * analysis + Janino compilation per query plan dominated the persisted-
    * index probe path. Arithmetic is term-for-term identical (sequential
    * dots, precomputed norms), so the q85 oracle still matches
    * bit-for-bit.
    */
  def pqQueryTable(qe: Column, codebooks: Array[Array[Array[Double]]]): Column =
    graft.functions.HashExprs.pqQueryTable(qe, codebooks)

  /** ADC top-k over a PQ-encoded corpus: rank by approximate squared L2
    * distance `Σ_s ||q_s - C[s][codes_s]||²`. The per-query distance table
    * is built as plan expressions on the (small, broadcast) query side; the
    * corpus side does only native table lookups + a left-fold sum —
    * sequential and deterministic, so the oracle reproduces it bit-for-bit.
    * Candidates with `vec_id == qid` are excluded (queries drawn from the
    * corpus don't match themselves).
    *
    * @return (qid, vec_id, rank, adist) — rank 1 = nearest by ADC
    */
  def pqTopK(
      queries: DataFrame, // (qid, qe: array<float>)
      encoded: DataFrame, // (vec_id, codes: array<int>) from pqEncode
      codebooks: Array[Array[Array[Double]]],
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val qt = queries.withColumn("__qt", pqQueryTable(col("qe"), codebooks))
    val scored = encoded
      // excludeSelf=false for external query sets (mirrors VectorIndex.query)
      .join(broadcast(qt), if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(
        col("qid"),
        col("vec_id"),
        // native table-lookup fold (same accumulation order as the oracle's
        // ordered list_sum); the corpus-side per-row cost is m lookups
        graft.functions.HashExprs.pqAdcDistance(col("codes"), col("__qt")).as("adist")
      )
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Approximate top-k: rank only within the query's LSH bucket.
    *
    * Recall caveat (observed on the synthetic corpus): on uniform random
    * unit vectors sign-bit LSH has near-zero top-k recall — there is no
    * cluster structure for the buckets to exploit, and a query's true
    * neighbors land in other buckets. On real embedding corpora (which are
    * strongly clustered) recall is far higher; increase recall by probing
    * neighboring buckets (multi-probe: flip 1-2 bucket bits) or unioning
    * several independent plane sets.
    */
  def annTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planeVecs: Seq[Array[Double]],
      excludeSelf: Boolean = true
  ): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucket(col("qe"), planeVecs))
    val cb = corpus.withColumn("bucket", lshBucket(col("embedding"), planeVecs))
    val scored = cb
      .join(broadcast(qb), Seq("bucket"))
      .filter(if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
      .select(col("qid"), col("vec_id"), cosine(col("qe"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal rank
    * fusion outperforms Condorcet and individual rank learning methods",
    * SIGIR 2009) — the standard hybrid-retrieval combiner: each ranked
    * list contributes `scale div (rrfK + rank)` to a doc's fused score and
    * absence contributes zero, so lexical (BM25) and dense (cosine top-k)
    * retrievers merge without score calibration. Contributions are kept as
    * SCALED INTEGERS (floor division — the repo's exactness pattern), so
    * the fused score is a BIGINT sum: order-independent under distributed
    * aggregation and bit-reproducible by the SQL oracle.
    *
    * Scale shape: the inputs are already top-k lists (tiny); the fuse is
    * one union + hash aggregate over ≤ Σkᵢ rows and a TakeOrdered —
    * nothing here ever touches corpus-scale data.
    *
    * @param ranked (idCol, rank) frames — each a retriever's top-k
    * @return (idCol, rrf_score, rank), rank 1..k by descending fused
    *         score, ties broken by ascending id
    */
  def rrfFuse(
      ranked: Seq[DataFrame],
      idCol: String,
      k: Int,
      rrfK: Int = 60,
      scale: Int = 1000
  ): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranked list")
    require(rrfK >= 0 && scale > 0, s"bad rrf constants ($rrfK, $scale)")
    val contributions = ranked
      .map(df =>
        df.select(
          col(idCol).as("__id"),
          expr(s"CAST($scale div ($rrfK + CAST(rank AS BIGINT)) AS BIGINT)").as("__c")
        ))
      .reduce(_ unionByName _)
    val scored = contributions.groupBy(col("__id")).agg(sum(col("__c")).as("rrf_score"))
    val top = scored.orderBy(col("rrf_score").desc, col("__id").asc).limit(k)
    top
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("rrf_score").desc, col("__id").asc)).cast("int"))
      .select(col("__id").as(idCol), col("rrf_score"), col("rank"))
  }
}
