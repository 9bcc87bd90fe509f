package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) joins at scale.
  *
  * An as-of join attaches to each left row the single most recent right row
  * at-or-before it (per key) — the temporal-alignment primitive behind
  * "state as of this event" queries. Spark has no built-in; a raw
  * `r.ts <= l.ts` join plans as BroadcastNestedLoopJoin + a top-1 window
  * over the O(L×R-per-key) intermediate, a scale-killer.
  *
  * This is the union+window formulation instead: tag both sides, sort each
  * key group ONCE by (ts, side, tiebreak) and carry the latest right payload
  * forward with `last(ignoreNulls)`. Exactly one hash shuffle on the key —
  * the same cost as any window query — and no quadratic intermediate, so it
  * survives 100 TB wherever a plain window does. Right rows sort BEFORE left
  * rows at equal timestamps (inclusive at-or-before semantics); ties among
  * right rows at the same timestamp resolve to the greatest tiebreak value
  * (native type, NULL ties lowest), then to the payload's content hash —
  * one stable winner on any partitioning. NULL-keyed rows follow equi-join
  * semantics: a null-keyed left row attaches nothing, a null-keyed right
  * row matches nothing.
  */
object AsOfJoin {

  /** Backward as-of join (the common direction).
    *
    * @param left      probe side; all its columns pass through
    * @param right     reference side; every non-key column is attached to
    *                  the output (NULL when no right row precedes the left
    *                  row). Must share ONLY `keys` with `left` — rename
    *                  payload columns on the way in.
    * @param keys      equi-join key columns present on both sides
    * @param leftTs    left ordering column (any orderable numeric/timestamp)
    * @param rightTs   right ordering column, same type as `leftTs`
    * @param rightTie  right column breaking ties among equal `rightTs` rows
    *                  (greatest wins) — required for a deterministic result
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightTie: String
  ): DataFrame = {
    val payload = right.columns.filterNot(keys.contains)
    val overlap = left.columns.toSet.intersect(payload.toSet)
    require(overlap.isEmpty, s"left/right column collision: ${overlap.mkString(", ")}")
    require(payload.contains(rightTs) && payload.contains(rightTie), "rightTs/rightTie must be right columns")
    require(
      right.schema(rightTie).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"rightTie '$rightTie' must be numeric: a lossy cast would NULL the tiebreak and make " +
        "equal-timestamp picks partition-layout-dependent")

    val tieType = right.schema(rightTie).dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      // left rows already sort after every equal-ts right row via __side;
      // their tie value is inert (typed null, no magic constant needed)
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__th", lit(0L))
      .withColumn("__p", lit(null).cast(org.apache.spark.sql.types.StructType(
        right.select(payload.map(col): _*).schema.fields)))
    val r = right
      // a NULL-timestamped right row is at-or-before nothing (matching the
      // inequality-join semantics); dropped here, NOT sorted nulls-first
      // where it would wrongly attach to every left row. NULL-KEYED right
      // rows likewise: SQL equi-joins never match NULL = NULL, and the
      // window's partitionBy WOULD group them with null-keyed left rows —
      // silently attaching unrelated reference rows.
      .filter(col(rightTs).isNotNull)
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      // the tiebreak keeps its NATIVE type: the old cast("long") truncated
      // fractional ties (2.9 and 2.1 both -> 2), making equal-timestamp
      // picks partition-layout-dependent — the exact nondeterminism the
      // numeric require exists to prevent
      .withColumn("__tie", col(rightTie))
      .withColumn("__p", struct(payload.map(col): _*))
      // content hash as the FINAL disambiguator (the upsert tie rule):
      // several right rows tied on (ts, tie) — or tied at NULL tie — must
      // still resolve to ONE stable winner across partitionings
      .withColumn("__th", xxhash64(to_json(col("__p"))))
      .drop(payload: _*)

    // Same column order on both union legs.
    val cols = keys ++ Seq("__ts", "__side", "__tie", "__th", "__p")
    val leftCarry = left.columns.filterNot(cols.contains)
    val lRows = l.select((cols ++ leftCarry).map(col): _*)
    val rRows = r.select(cols.map(col): _*)
      .withColumns(leftCarry.map(c => c -> lit(null).cast(l.schema(c).dataType)).toMap)
      .select((cols ++ leftCarry).map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc,
        col("__tie").asc_nulls_first, col("__th").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lRows
      .unionByName(rRows)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = (left.columns.map(col) ++ payload.map(c => col(s"__last.$c").as(c))).toSeq
    matched.select(out: _*)
  }
}
