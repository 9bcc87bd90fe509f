package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis over an event stream.
  *
  * A user reaches stage i when their earliest step-i event at-or-after
  * their stage-(i-1) time exists — the classic conversion funnel, which is
  * NOT expressible as independent per-step counts (ordering matters: a
  * purchase before signup must not count).
  *
  * Scale shape: ONE hash shuffle on the user key. Each user's per-step
  * event times are gathered into arrays and the chain is folded with array
  * expressions — per-user work, no self-joins over the event table (the
  * naive k-step formulation is k joins of the full stream). The per-user
  * arrays hold only the matching steps' timestamps; for a pathological user
  * with millions of step events, pre-aggregate per (user, step, coarse
  * bucket) min first — the chain fold is unchanged.
  */
object Funnel {

  /** Users per funnel stage reached (1-based; users with no step-0 event
    * are excluded). With `maxGap` set, each step must also occur within
    * `maxGap` time units of the previous step (the "converted within N
    * days" form). @return (stage, users) one row per non-empty stage.
    */
  def stages(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxGap: Option[Long] = None
  ): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val aggs = steps.zipWithIndex.map { case (s, i) =>
      collect_list(when(col(typeCol) === s, col(tsCol))).as(s"ts_$i")
    }
    val g = events.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
    val reached: Seq[Column] = maxGap match {
      case None =>
        // no gap: greedy earliest-next-step is provably optimal — fold
        // t0 = min step-0 time; t_i = min step-i time >= t_{i-1}. A null
        // t_{i-1} nulls the filter lambda -> empty array -> null t_i, so
        // the chain shorts out exactly where the funnel breaks.
        val t0 = array_min(col("ts_0"))
        steps.indices.drop(1).foldLeft(Seq(t0)) { (acc, i) =>
          acc :+ array_min(filter(col(s"ts_$i"), x => x >= acc.last))
        }.map(_.isNotNull)
      case Some(gap) =>
        // WITH a gap, greedy-earliest UNDERCOUNTS: picking the earliest
        // step-(i-1) time can strand step i outside its window when a
        // later in-window step-(i-1) event would have chained (A@0, B@1,
        // B@9, C@15 with gap 10 converts via B@9 — min-B@1 misses it).
        // "Converted" means A CHAIN EXISTS, so track every ACHIEVABLE
        // step-i completion time: step-i events within the gap after SOME
        // achievable step-(i-1) time. Per-user cost is |ts_i|·|ach_{i-1}|
        // array work — bounded by per-user step events (the pathological-
        // user pre-aggregation note above applies unchanged).
        steps.indices.drop(1).foldLeft(Seq(col("ts_0"))) { (acc, i) =>
          val prev = acc.last
          acc :+ filter(col(s"ts_$i"),
            x => exists(prev, p => x >= p && x <= p + lit(gap)))
        }.map(size(_) > 0)
    }
    val stage: Column = reached.zipWithIndex.foldLeft(lit(0)) { case (acc, (ok, i)) =>
      when(ok, i + 1).otherwise(acc)
    }
    g.select(stage.as("stage"))
      .filter(col("stage") >= 1)
      .groupBy("stage")
      .agg(count(lit(1)).as("users"))
  }
}
