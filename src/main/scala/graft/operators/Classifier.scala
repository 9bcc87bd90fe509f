package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine trainer for the hashed linear quality classifier
  * ([[TextAnalysis.hashedLinearScore]] — the fastText-shaped scorer behind
  * q98 and [[CorpusPipeline.Config.classifier]]).
  *
  * Algorithm: the exact-integer perceptron with ITERATIVE PARAMETER MIXING
  * (McDonald, Hall & Mann, "Distributed Training Strategies for the
  * Structured Perceptron", NAACL 2010): the labeled set is hash-sharded,
  * each epoch trains an independent local perceptron per shard from the
  * current mixed weights, and the epoch ends by averaging the shard
  * weights element-wise (integer floor division). Chosen over spark.ml
  * logistic regression for determinism-by-construction — the repo's house
  * style: every quantity is a Long, shard membership and within-shard
  * visit order are portable-hash-derived, and the mix is an exact integer
  * sum followed by one floorDiv — so the SAME (data, config) yields the
  * IDENTICAL weight table on any cluster, any partitioning, any rerun
  * (spark.ml's LBFGS over doubles is none of those things).
  *
  * Features are EXACTLY [[TextAnalysis.hashedLinearScore]]'s: word
  * {1..maxNgram}-grams, md5-prefix-hashed into `numBuckets` buckets (with
  * multiplicity) — the trained table drops straight into the scorer and
  * into [[CorpusPipeline.Config.classifier]].
  *
  * Scale shape: feature extraction is one scan-side projection; each epoch
  * is one hash shuffle of the LABELED set (labeled sets are orders of
  * magnitude smaller than the corpus they gate) plus a driver-side mix of
  * numShards × numBuckets longs. A shard trains inside one task and sorts
  * in memory — size numShards so a shard's labeled slice fits, exactly
  * like [[Sampling.shard]]'s contract.
  */
object Classifier {

  /** @param labelCol boolean column: true = keep-quality document
    * @return weight table for [[TextAnalysis.hashedLinearScore]], length
    *         `numBuckets`
    */
  def trainHashedPerceptron(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      numBuckets: Int,
      maxNgram: Int = 2,
      epochs: Int = 5,
      numShards: Int = 8
  ): Array[Long] = {
    require(numBuckets > 0 && epochs > 0 && numShards > 0, "need positive sizes")
    val spark = docs.sparkSession
    import spark.implicits._

    // one extra pass over the (small, labeled) training set: a single NULL
    // text/id/label otherwise dies deep in the typed mapGroups path as an
    // opaque executor NPE/encoder error after task retries
    val dirty = docs
      .filter(col(idCol).isNull || col(textCol).isNull || col(labelCol).isNull)
      .count()
    require(dirty == 0L,
      s"trainHashedPerceptron: $dirty labeled rows have a NULL id/text/label — " +
        "clean or filter them explicitly; silently dropping training signal is not a default")
    // the SHARED feature/bucket definitions (TextAnalysis) — train/score
    // bit-parity rests on them being one copy
    val feats = TextAnalysis.hashedNgramFeatures(col(textCol), maxNgram)
    val bucketOf = (f: org.apache.spark.sql.Column) => TextAnalysis.featureBucket(f, numBuckets)
    val h = Sampling.hash60(col(idCol))
    val prepared = docs
      .select(
        pmod(h, lit(numShards)).cast("int").as("shard"),
        h.as("ord"),
        col(idCol).cast("string").as("tie"),
        col(labelCol).cast("boolean").as("label"),
        transform(feats, bucketOf).as("buckets")
      )
      .as[(Int, Long, String, Boolean, Seq[Int])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try {
      require(!prepared.isEmpty,
        "trainHashedPerceptron needs a non-empty labeled set — an empty one would " +
          "silently return an all-zero table that keeps everything")
      var w = new Array[Long](numBuckets)
      for (_ <- 1 to epochs) {
        val bcast = spark.sparkContext.broadcast(w)
        // one local perceptron pass per shard, deterministic visit order
        val shardWeights: Array[(Int, Array[Long])] = prepared
          .groupByKey(_._1)
          .mapGroups { (shard, it) =>
            val rows = it.toArray.sortBy(r => (r._2, r._3))
            val lw = bcast.value.clone()
            var i = 0
            while (i < rows.length) {
              val buckets = rows(i)._5
              var score = 0L
              buckets.foreach(b => score += lw(b))
              val predict = score >= 0L
              if (predict != rows(i)._4) {
                val delta = if (rows(i)._4) 1L else -1L
                buckets.foreach(b => lw(b) += delta)
              }
              i += 1
            }
            (shard, lw)
          }
          .collect()
        bcast.destroy()
        // parameter mixing: exact integer sum over PRESENT shards, one
        // floor division (empty shards contribute nothing rather than
        // dragging the mix toward the stale broadcast)
        val present = shardWeights.length
        val mixed = new Array[Long](numBuckets)
        if (present > 0) {
          shardWeights.foreach { case (_, sw) =>
            var i = 0
            while (i < numBuckets) { mixed(i) += sw(i); i += 1 }
          }
          var i = 0
          while (i < numBuckets) { mixed(i) = Math.floorDiv(mixed(i), present.toLong); i += 1 }
        }
        w = mixed
      }
      w
    } finally {
      prepared.unpersist()
    }
  }

  /** Convenience: train and score in one call — the labeled slice trains,
    * the full corpus gets (score, keep) under the trained table.
    */
  def trainAndScore(
      labeled: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      numBuckets: Int,
      maxNgram: Int = 2,
      epochs: Int = 5,
      numShards: Int = 8,
      minScore: Long = 0L
  ): (Array[Long], DataFrame) = {
    val w = trainHashedPerceptron(labeled, idCol, textCol, labelCol, numBuckets, maxNgram, epochs, numShards)
    val scored = corpus
      .withColumn("score", TextAnalysis.hashedLinearScore(col(textCol), w, maxNgram))
      .withColumn("keep", col("score") >= minScore)
    (w, scored)
  }
}
