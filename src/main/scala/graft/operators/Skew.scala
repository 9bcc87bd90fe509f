package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join/aggregate operators (SURVEY.md §4 physical notes;
  * AQE's skew-join split handles sort-merge skew at runtime, but broadcast-
  * infeasible skewed-key joins and hot-key aggregations still need explicit
  * salting at extreme scale).
  */
object Skew {

  /** Salted equi-join for a skewed LEFT side: left rows get a random salt
    * in [0, salts); the right side is replicated across all salts so every
    * (key, salt) partition joins locally. Results are identical to the
    * plain join — verified by SkewSpec — while the hot key's rows spread
    * over `salts` partitions instead of one straggler.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"
  ): DataFrame = {
    // right/full outer would emit one null-extended row PER SALT for
    // unmatched right keys — refuse rather than silently duplicate
    val ok = Set("inner", "left", "left_outer", "leftouter")
    require(
      ok.contains(joinType.toLowerCase.replace("_", "")) || ok.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only (got $joinType): the replicated right side would duplicate unmatched right rows"
    )
    val salted = left.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val replicated = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase salted aggregation for hot grouping keys: partial aggregate
    * on (key, salt), then final aggregate on key. `partial` must be an
    * algebraic aggregate (sum/count/min/max) expressed twice — the partial
    * form and the merge form.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      salts: Int
  ): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))
}
