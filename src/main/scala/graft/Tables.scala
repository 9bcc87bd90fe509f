package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the test-lake tables (TPC-H-ish star schema + events stream +
  * documents/embeddings corpora; see /root/repo/TESTDATA.md).
  *
  * Each table is a plain parquet directory/file — reads go through the
  * DataSource V2 parquet scan so Catalyst pushes filters and prunes columns
  * into the scan (visible as PushedFilters/ReadSchema in explain output).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong it arrives as a long which we
    * truncate to microseconds (matching DuckDB's ns→µs truncation).
    */
  def events: DataFrame =
    t("events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
