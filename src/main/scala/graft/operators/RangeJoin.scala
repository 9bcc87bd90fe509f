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

  /** True floor division as an integer-only plan expression:
    * `(x - pmod(x, w)) DIV w`. `pmod` makes the remainder non-negative, so
    * the subtraction lands exactly on the bucket's floor multiple — unlike
    * raw `x DIV w`, which truncates toward zero and mis-buckets negatives.
    */
  private def floorDiv(sqlCol: String, w: Long) =
    expr(s"($sqlCol - pmod($sqlCol, ${w}L)) DIV ${w}L")

  /** Join `points` (numeric `pointCol`, e.g. unix micros) to `intervals`
    * rows whose `[startCol, endCol]` (inclusive both ends) contain the
    * point, via `bucketWidth`-wide buckets.
    *
    * Pick `bucketWidth` near the p95 interval length: an interval explodes
    * to `(end-start)/width + 1..2` bucket copies, so much-longer-than-width
    * intervals multiply the interval side, and a much-wider width inflates
    * candidate pairs per bucket. Negative values are safe: bucket
    * assignment uses true floor division, not SQL DIV's toward-zero
    * truncation (which would merge buckets -1 and 0 and drop/duplicate
    * pairs). The two inputs must not share column names.
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
    val pts = points.withColumn("__bucket", floorDiv(s"`$pointCol`", bucketWidth))
    // inverted intervals (end < start) generate NOTHING — the SQL oracle's
    // generate_series contract — where a bare sequence() auto-steps -1 and
    // exploded a corrupt row into O(interval/width) DESCENDING buckets.
    // NOTE the remaining envelope: a genuinely open-ended interval (e.g. an
    // end = Long.MaxValue validity sentinel) wants buckets ~ range/width,
    // which sequence() refuses past the array limit — clamp sentinel ends
    // to the points' max before calling, that is the semantics you meant.
    val ivs = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn(
        "__bucket",
        explode(sequence(floorDiv(s"`$startCol`", bucketWidth), floorDiv(s"`$endCol`", bucketWidth)))
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
    * (`bucket = floor(max(lStart, rStart) / width)`), which replaces the
    * distinct-shuffle a naive dedup would need. Same sizing rule: pick
    * `bucketWidth` near the p95 interval length. Negative bounds are safe
    * (true floor division throughout); the two inputs must not share
    * column names.
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
      explode(sequence(floorDiv(s"`$s`", bucketWidth), floorDiv(s"`$e`", bucketWidth)))
    )
    exploded(left, lStart, lEnd)
      .join(exploded(right, rStart, rEnd), Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") === floorDiv(s"greatest(`$lStart`, `$rStart`)", bucketWidth))
      .drop("__bucket")
  }
}
