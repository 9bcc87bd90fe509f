package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins at scale.
  *
  * Spark plans a plain non-equi predicate (`p.ts BETWEEN i.start AND i.end`)
  * as BroadcastNestedLoopJoin — O(points × intervals), a scale-killer the
  * moment the interval side outgrows a broadcast. The standard fix is
  * bucketization: quantize time into fixed-width buckets, explode each
  * interval onto the buckets it covers, map each point to its single
  * bucket, equi-join on the bucket and re-check the exact predicate. Cost
  * becomes O(points + Σ interval-bucket copies + candidate matches),
  * shuffled on the bucket key like any equi-join — AQE/skew handling and
  * all.
  */
object RangeJoin {

  /** Join `points` (numeric `pointCol`, e.g. unix micros) to `intervals`
    * rows whose `[startCol, endCol]` (inclusive both ends) contain the
    * point, via `bucketWidth`-wide buckets.
    *
    * Pick `bucketWidth` near the p95 interval length: an interval explodes
    * to `(end-start)/width + 1..2` bucket copies, so much-longer-than-width
    * intervals multiply the interval side, and a much-wider width inflates
    * candidate pairs per bucket. Columns must be non-negative (integer DIV
    * truncation = floor there); the two inputs must not share column names.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty, s"point/interval column collision: ${dup.mkString(", ")}")
    val pts = points.withColumn("__bucket", expr(s"`$pointCol` DIV $bucketWidth"))
    val ivs = intervals.withColumn(
      "__bucket",
      explode(sequence(expr(s"`$startCol` DIV $bucketWidth"), expr(s"`$endCol` DIV $bucketWidth")))
    )
    pts
      .join(ivs, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: pairs (l, r) with
    * `[lStart,lEnd] ∩ [rStart,rEnd] ≠ ∅` (inclusive ends), bucketized like
    * [[pointInInterval]]. Both sides explode onto the buckets they cover
    * and equi-join on the bucket; a pair sharing several buckets is emitted
    * exactly once — only at the FIRST bucket both intervals cover
    * (`bucket = max(lStart, rStart) DIV width`), which replaces the
    * distinct-shuffle a naive dedup would need. Same sizing rule: pick
    * `bucketWidth` near the p95 interval length. Columns must be
    * non-negative integers; the two inputs must not share column names.
    */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"left/right column collision: ${dup.mkString(", ")}")
    def exploded(df: DataFrame, s: String, e: String) = df.withColumn(
      "__bucket",
      explode(sequence(expr(s"`$s` DIV $bucketWidth"), expr(s"`$e` DIV $bucketWidth")))
    )
    exploded(left, lStart, lEnd)
      .join(exploded(right, rStart, rEnd), Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") === expr(s"greatest(`$lStart`, `$rStart`) DIV $bucketWidth"))
      .drop("__bucket")
  }
}
