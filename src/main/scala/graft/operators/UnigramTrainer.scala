package graft.operators

import graft.functions.{UnigramExprs, UnigramSupport}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINING (Kudo 2018 shape, hard-EM variant): seed
  * a large candidate vocabulary from frequent substrings, then iterate
  * (segment the corpus under current costs → recount piece usage →
  * re-derive costs → prune the least-used pieces) until the target
  * vocabulary size — the SentencePiece loop with Viterbi (hard) counts in
  * place of full forward–backward expectations, which keeps every
  * statistic an exact integer (the house rule: costs are the
  * [[LmScore]] rational surrogate `(T + V)·1000 DIV (cnt + 1)`, usage
  * counts are BIGINT sums, prune order is (usage desc, piece asc) — a
  * total order, so training is bit-reproducible on any cluster).
  *
  * Two E-step strategies, the [[BpeTrainer]] discipline:
  *  - DRIVER-LOCAL when the distinct-word table fits `maxDriverWords`:
  *    segment distinct words once per round, weighted by word count —
  *    O(distinct words), corpus size irrelevant (natural-language
  *    vocabulary is Zipf-bounded).
  *  - DISTRIBUTED otherwise: one corpus scan per round through the
  *    [[graft.functions.UnigramTokensOf]] codegen expression + a piece
  *    count aggregate whose output is vocabulary-bounded (driver-safe
  *    collect). Same per-word segmentation, same totals — parity
  *    spec-pinned (UnigramSpec).
  *
  * Single characters are never pruned (coverage: the DP must always
  * complete); the returned model's `unkCost` is the full smoothed maximum,
  * the [[LmScore]] OOV contract.
  */
object UnigramTrainer {

  /** Seeding always sees at least this many top words even when
    * `maxDriverWords` forces the E-step distributed — ~tens of MB on the
    * driver, and Zipf puts ~all substring mass in the top slice.
    */
  val SeedWordFloor = 1000000L

  /** Train piece costs. @return (pieces with costs, unkCost). */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 6,
      seedMultiplier: Int = 4,
      rounds: Int = 4,
      maxDriverWords: Long = 4000000L
  ): (Seq[(String, Long)], Long) = {
    require(vocabSize > 0 && maxPieceLen >= 2 && rounds >= 1 && seedMultiplier >= 1,
      "need positive vocabSize, maxPieceLen >= 2, rounds >= 1, seedMultiplier >= 1")
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nWords = words.count()
    require(nWords > 0, "unigram training needs a non-empty corpus")
    val driverLocal = nWords <= maxDriverWords
    // SEEDING always works from a BOUNDED word slice: the top
    // maxDriverWords words by (count desc, word asc) — a TakeOrdered, no
    // global sort, and no driver-OOM when the E-step has already been
    // forced distributed because the full word table is too big to
    // collect (seeding from the full table would defeat exactly the
    // guard that routed the E-step off the driver). Zipf makes the top
    // slice carry ~all substring mass, so seeds are insensitive to the
    // cut; both E-step strategies seed from the same slice, which is
    // what keeps them output-identical (the parity spec's law).
    val seedLimit =
      math.min(math.max(maxDriverWords, SeedWordFloor), Int.MaxValue.toLong).toInt
    val wc: Array[(String, Long)] = words
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(seedLimit)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    words.unpersist(blocking = false)

    // seed: every substring of length 2..maxPieceLen, usage-weighted by
    // word count; top seedMultiplier × vocabSize by (usage desc, piece asc)
    val seedUsage = new java.util.HashMap[String, Long]()
    wc.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 2
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val p = w.substring(i, j)
          seedUsage.merge(p, c, (a, b) => a + b)
          j += 1
        }
        i += 1
      }
    }
    val singles: Seq[String] = wc.flatMap(_._1.toCharArray).map(_.toString).distinct.sorted.toSeq
    var multi: Seq[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      seedUsage.entrySet().asScala.toSeq
        .map(e => (e.getKey, e.getValue.longValue()))
        .sortBy { case (p, u) => (-u, p) }
        .take(math.max(0, seedMultiplier * vocabSize - singles.size))
    }
    val singleUsage = {
      val m = new java.util.HashMap[String, Long]()
      wc.foreach { case (w, c) => w.foreach(ch => m.merge(ch.toString, c, (a, b) => a + b)) }
      m
    }

    def costsOf(usage: Seq[(String, Long)]): (Seq[(String, Long)], Long) = {
      val t = usage.map(_._2).sum
      val v = usage.size.toLong
      // division-form guard (the UnigramExprs rule — a multiply-form check
      // can itself wrap): t is a CORPUS-scale token total, and at ~1e16
      // occurrences (t + v) * 1000 silently overflows Long, corrupting
      // every cost and the unkCost ceiling with it
      require(t >= 0 && t <= Long.MaxValue / 1000L - v,
        s"usage total $t too large for exact milli-cost arithmetic")
      val pieces = usage.map { case (p, u) => (p, (t + v) * 1000L / (u + 1L)) }
      (pieces, (t + v) * 1000L)
    }

    var round = 0
    var model: UnigramSupport.Model = null
    var current: Seq[(String, Long)] = // (piece, usage) — seeds first
      (singles.map(s => (s, singleUsage.getOrDefault(s, 0L))) ++ multi)
    while (round < rounds) {
      val (pieces, unk) = costsOf(current)
      model = UnigramSupport.model(pieces, unk)
      // E-step: Viterbi usage counts under the current model
      val usage: Map[String, Long] =
        if (driverLocal) {
          val m = new java.util.HashMap[String, Long]()
          wc.foreach { case (w, c) =>
            val toks = UnigramSupport
              .tokens(org.apache.spark.unsafe.types.UTF8String.fromString(w), model)
            var i = 0
            while (i < toks.numElements()) {
              m.merge(toks.getUTF8String(i).toString, c, (a, b) => a + b)
              i += 1
            }
          }
          import scala.jdk.CollectionConverters._
          m.asScala.map { case (k, v) => (k, v.longValue()) }.toMap
        } else {
          df.select(explode(UnigramExprs.unigramTokens(col(textCol), model)).as("p"))
            .groupBy("p")
            .agg(count(lit(1)).as("u"))
            .collect()
            .map(r => (r.getString(0), r.getLong(1)))
            .toMap
        }
      // M-step + prune: singles always survive; multi-char pieces keep the
      // top slots by (usage desc, piece asc), shrinking 25% per round
      // toward the target
      val multiNow = current.collect { case (p, _) if p.length > 1 => p }
      val target = math.max(vocabSize - singles.size, 0)
      val keep = math.max(target, multiNow.size - math.max(multiNow.size / 4, 1))
      val rankedMulti = multiNow
        .map(p => (p, usage.getOrElse(p, 0L)))
        .sortBy { case (p, u) => (-u, p) }
        .take(keep)
      current = singles.map(s => (s, usage.getOrElse(s, 0L))) ++ rankedMulti
      round += 1
    }
    // the shrink schedule may not have reached the target in `rounds`
    // passes — clamp to the final vocabulary size by the same total order
    val clampedMulti = current
      .collect { case (p, u) if p.length > 1 => (p, u) }
      .sortBy { case (p, u) => (-u, p) }
      .take(math.max(vocabSize - singles.size, 0))
    costsOf(singles.map(s => (s, current.collectFirst {
      case (p, u) if p == s => u
    }.getOrElse(0L))) ++ clampedMulti)
  }
}
