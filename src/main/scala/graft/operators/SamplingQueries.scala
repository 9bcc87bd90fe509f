package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Oracle-checked queries for the deterministic samplers in [[Sampling]].
  *
  * Both queries hash a stable business key (never partition/offset state), so
  * the exact same rows are selected on any cluster size, any partition
  * layout, and even by a different engine — the DuckDB oracle reproduces the
  * membership decision bit-for-bit from the same md5-prefix hash. That
  * portability is the point: a training corpus' held-out split must survive
  * re-runs and engine migrations without leakage.
  */
object SamplingQueries {

  /** 60-bit md5-prefix hash, DuckDB side (same value as [[Sampling.hash60]]). */
  private def duckHash(k: String): String =
    s"('0x' || substr(md5(CAST($k AS VARCHAR)), 1, 15))::BIGINT"

  /** Deterministic 10% Bernoulli sample of the documents corpus. Pure map —
    * the membership filter runs at the scan with no shuffle, so this costs a
    * single pass regardless of corpus size.
    */
  private val q60 = Q(
    "q60_sample_bernoulli",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .bernoulli(T.documents, $"doc_id", 10, 100)
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, lang, source, n_chars
      FROM documents
      WHERE ${duckHash("doc_id")} % 100 < 10
      ORDER BY doc_id
    """.trim)
  )

  /** Deterministic stratified sample: exactly 20 orders per priority class,
    * drawn uniformly without replacement by smallest key hash. One hash
    * shuffle on the strata column — window-query cost shape.
    */
  private val q61 = Q(
    "q61_sample_stratified",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Sampling
        .stratified(T.orders, Seq($"o_orderpriority"), $"o_orderkey", 20)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"o_orderkey")
    },
    Some(s"""
      SELECT o_orderpriority, o_orderkey, o_totalprice
      FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (
                 PARTITION BY o_orderpriority
                 ORDER BY ${duckHash("o_orderkey")}, o_orderkey
               ) AS rn
        FROM orders
      )
      WHERE rn <= 20
      ORDER BY o_orderpriority, o_orderkey
    """.trim)
  )

  val all: Seq[Q] = Seq(q60, q61)
}
