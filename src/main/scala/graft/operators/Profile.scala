package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the pre-flight audit of any pipeline input.
  *
  * One aggregation pass over the table produces a long-format profile row
  * per column (null rate, exact distinct count, numeric range). Wide-table
  * profiling at 100 TB is scan-bound: all per-column aggregates run in the
  * same partial-aggregation pass, and only the k-row melted result moves.
  * (Exact multi-column count-distinct plans through Spark's Expand — one
  * scan, k× row amplification pre-aggregation; swap in
  * approx_count_distinct when a ±2% answer is acceptable.)
  */
object Profile {

  /** Profile `cols` (numeric or castable-to-double) of `df`:
    * (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val).
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap(c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c")
      )
    ) :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `nn_$c`, `nd_$c`, `mn_$c`, `mx_$c`")
      .mkString(", ")
    one
      .select(
        col("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_val, max_val)")
      )
      .select(
        col("col_name"),
        col("n_rows"),
        col("n_nonnull"),
        col("n_distinct"),
        col("min_val"),
        col("max_val")
      )
  }
}
