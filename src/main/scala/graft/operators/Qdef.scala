package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One oracle-checked query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB SQL string the driver runs
  * over the same parquet tables.
  *
  * Determinism contract (driver hash-compares results): every query ends in a
  * total ORDER BY, aliases match between Spark and SQL, and floating-point
  * aggregation is done in EXACT integer arithmetic (cents) before a final
  * division+round — so both engines produce bit-identical doubles regardless
  * of partial-aggregation order. This matters at any scale: at 100 TB the
  * combine order of a distributed sum is nondeterministic run-to-run, so
  * exactness-by-construction is the only way to get stable results.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

object Qh {
  /** Exact integer cents from a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact integer percent from a 2-decimal fraction column (0.05 -> 5). */
  def pct(c: Column): Column = round(c * 100, 0).cast("long")

  def ts(s: String): Column = to_timestamp(lit(s))
}
