package graft.operators

import graft.Tables
import graft.functions.Canonical
import org.apache.spark.sql.functions._

/** Scalar-function coverage (SURVEY.md §2.7): money parsing (F1), string
  * cleaning/normalization (F4/F6), JSON extract/encode (F9/F10), canonical
  * content hash (F7) and deterministic UUID (F8).
  *
  * Everything here is built-in-function composition — no UDFs — so the whole
  * pipeline stays inside WholeStageCodegen.
  */
object FunctionQueries {

  /** F10 — JSON field extraction from the events `props` payload, then
    * re-aggregate. get_json_object is codegen'd; no parse-per-row UDF.
    */
  private val q18 = Q(
    "q18_json_extract",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.events
        .select(get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy($"k")
        .agg(count(lit(1)).as("n"))
        .orderBy($"k")
    },
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS n
      FROM events
      GROUP BY 1
      ORDER BY k
    """.trim)
  )

  /** F4/F6/F12 — string cleaning and header-style normalization over part. */
  private val q19 = Q(
    "q19_string_clean",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.part
        .select(
          $"p_partkey",
          upper($"p_name").as("name_upper"),
          regexp_extract($"p_name", "(\\w+)", 1).as("first_word"),
          length($"p_name").as("name_len"),
          Canonical.normalizeNameCol($"p_type").as("type_norm")
        )
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
             upper(p_name) AS name_upper,
             regexp_extract(p_name, '(\w+)', 1) AS first_word,
             CAST(length(p_name) AS INT) AS name_len,
             regexp_replace(regexp_replace(regexp_replace(lower(p_type), '&', 'and', 'g'), '\s+', '_', 'g'), ':', '', 'g') AS type_norm
      FROM part
      ORDER BY p_partkey
    """.trim)
  )

  /** F1 — money round-trip: render o_totalprice as a display money string
    * ($1,234.56, built from exact integer cents) and parse it back with the
    * engine's money parser. Proves strip-$/comma + cast semantics match the
    * reference (/root/reference/scrapers/vgsi/source.py:134-145).
    */
  private val q20 = Q(
    "q20_money_roundtrip",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val centsCol = round($"o_totalprice" * 100, 0).cast("long")
      val dollars = (centsCol / 100).cast("long")
      val rem = centsCol % 100
      val moneyStr = concat(
        lit("$"),
        format_number(dollars, 0),
        lit("."),
        lpad(rem.cast("string"), 2, "0")
      )
      T.orders
        .select($"o_orderkey", moneyStr.as("money_str"))
        .withColumn("parsed", round(Canonical.money($"money_str"), 2))
        .orderBy($"o_orderkey")
    },
    Some("""
      WITH c AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS cents FROM orders
      )
      SELECT o_orderkey,
             '$' || format('{:,}', cents // 100) || '.' || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS money_str,
             ROUND(TRY_CAST(regexp_replace('$' || format('{:,}', cents // 100) || '.' || lpad(CAST(cents % 100 AS VARCHAR), 2, '0'), '[$,]', '', 'g') AS DOUBLE), 2) AS parsed
      FROM c
      ORDER BY o_orderkey
    """.trim)
  )

  /** F7/F8 — canonical content hash + deterministic UUID. The canonical form
    * (sorted keys, nulls dropped, stringified values, compact JSON) is the
    * engine's documented hashing contract; the oracle rebuilds the identical
    * JSON by concatenation.
    */
  private val q21 = Q(
    "q21_canonical_hash",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val li = T.lineitem.filter($"l_orderkey" < 100)
      val canon = Canonical.canonicalJsonOf(
        "l_orderkey" -> $"l_orderkey",
        "l_linenumber" -> $"l_linenumber",
        "l_quantity" -> $"l_quantity",
        "l_returnflag" -> $"l_returnflag"
      )
      li.select(
          $"l_orderkey",
          $"l_linenumber",
          canon.as("canon"),
          md5(canon).as("row_hash"),
          Canonical.uuidFromHex(md5(canon)).as("uuid")
        )
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      WITH c AS (
        SELECT l_orderkey, l_linenumber,
               '{"l_linenumber":"' || CAST(l_linenumber AS VARCHAR) ||
               '","l_orderkey":"'  || CAST(l_orderkey AS VARCHAR) ||
               '","l_quantity":"'  || CAST(l_quantity AS VARCHAR) ||
               '","l_returnflag":"'|| l_returnflag || '"}' AS canon
        FROM lineitem WHERE l_orderkey < 100
      )
      SELECT l_orderkey, l_linenumber, canon, md5(canon) AS row_hash,
             substr(md5(canon),1,8) || '-' || substr(md5(canon),9,4) || '-' ||
             substr(md5(canon),13,4) || '-' || substr(md5(canon),17,4) || '-' ||
             substr(md5(canon),21,12) AS uuid
      FROM c
      ORDER BY l_orderkey, l_linenumber
    """.trim)
  )

  val all: Seq[Q] = Seq(q18, q19, q20, q21)
}
